"""Multi-device signature-table annotation (the ``apply --mesh`` path).

Streams genome batches across the ``data`` axis of a (data, table) mesh and
runs one of the sharded apply steps from ``parallel.mesh``:

* ``replicated`` — table copied per chip, genomes fanned over ``data``;
* ``pmax``      — table hash-sharded over ``table``, token batch broadcast,
                  per-position hits merged with pmax;
* ``routed``    — table hash-sharded AND kmers routed to their owner shard
                  with one all_to_all (§5.8 large-table mode, the default
                  whenever the table axis is >1).

Per-genome results are identical to the single-device ``KmerApplyEngine``
(asserted by tests/test_mesh_apply.py down to report bytes).  Genomes are
grouped into chunks of ``n_data`` consecutive rows sharing one bucketed
shape, so XLA compiles a handful of programs per run regardless of genome
sizes; chunk rows beyond the last genome are padding.

A ``capacity_factor`` < worst-case trades routing-buffer size for a rare
retry: the routed step reports a single overflow scalar, and an overflowed
chunk is transparently re-run at the provably-safe capacity — results stay
exact either way.

The full feature matrix composes here (BASELINE configs 2/3/5):

* ``weighted=True`` — packed (fp16 weight, role) payloads; replicated and
  pmax modes vote after the local/pmax merge, the routed mode psum-merges
  PARTIAL dense weight tallies over the table axis before the argmax.
* DNA tables — ``DnaMeshApplyEngine`` shards the two-strand contig window
  streams over ``data`` and (optionally) the table over ``table`` with the
  per-position pmax merge; hits are clustered on the host exactly like the
  single-device ``DnaApplyEngine`` (weighted clustering included).
"""

from __future__ import annotations

import logging
from typing import Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..genome.gto import Genome, Feature
from ..ops.encode import DNA_PAD, PROT_PAD
from ..parallel.mesh import (make_mesh, replicated_apply_step,
                             replicated_probe_step, routed_apply_step,
                             shard_signature_table, sharded_apply_step,
                             sharded_probe_step,
                             split_tokens_for_table_axis)
from .apply_engine import FlatBatch, _bucket
from .dna_apply import DnaContigBatch, cluster_calls
from .signature import SignatureTable

log = logging.getLogger(__name__)


def parse_mesh_spec(spec: str) -> tuple[int, int]:
    """'DxT' → (n_data, n_table); 'D' → (D, 1)."""
    parts = spec.lower().replace("×", "x").split("x")
    try:
        if len(parts) == 1:
            return int(parts[0]), 1
        if len(parts) == 2:
            return int(parts[0]), int(parts[1])
    except ValueError:
        pass
    raise ValueError(f"bad mesh spec {spec!r}; expected DATAxTABLE, e.g. 4x2")


class _MeshPlumbing:
    """Shared (data, table) mesh + multi-process array plumbing.

    Each process feeds process-LOCAL shards into global jax.Arrays (a plain
    numpy array into shard_map only works single-process), encodes only the
    data rows its devices own, and reads results back via a host allgather.
    """

    def __init__(self, n_data: int, n_table: int):
        self.n_data = n_data
        self.n_table = n_table
        self.mesh = make_mesh(n_data, n_table)
        self.n_proc = jax.process_count()
        grid = self.mesh.devices
        if self.n_proc > 1:
            row_proc = []
            for i in range(n_data):
                procs = {d.process_index for d in grid[i]}
                if len(procs) != 1:
                    raise ValueError(
                        "multi-process meshes must keep each data row's "
                        "table axis within one process "
                        f"(row {i} spans processes {sorted(procs)})")
                row_proc.append(procs.pop())
            me = jax.process_index()
            self.rows_mine = [i for i, p in enumerate(row_proc) if p == me]
            first = self.rows_mine[0] if self.rows_mine else 0
            if self.rows_mine != list(range(first,
                                            first + len(self.rows_mine))):
                raise ValueError("this process's data rows must be "
                                 "contiguous in the mesh")
        else:
            self.rows_mine = list(range(n_data))
        self._steps: dict = {}

    def _global(self, local: np.ndarray, spec: P) -> jax.Array:
        """Assemble a global device array from this process's local data.
        Single-process: a plain device_put.  Multi-process: every process
        contributes its addressable shards (the full array for replicated
        or table-sharded specs; its own data rows for data-sharded specs).
        """
        sharding = NamedSharding(self.mesh, spec)
        if self.n_proc == 1:
            return jax.device_put(local, sharding)
        dims = spec + (None,) * (local.ndim - len(spec))
        global_shape = tuple(
            n * self.n_data // len(self.rows_mine)
            if d == "data" else n
            for n, d in zip(local.shape, dims))
        return jax.make_array_from_process_local_data(
            sharding, local, global_shape)

    def _host(self, arr: jax.Array) -> np.ndarray:
        """Global device array → full host array on every process."""
        if self.n_proc == 1:
            return np.asarray(arr)
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(
            arr, tiled=True))


class MeshApplyEngine(_MeshPlumbing):
    """Annotates genome streams on a (data, table) device mesh.

    weighted=True swaps the unanimity vote for the weighted best-tally
    vote (packed payloads) — composes with every mode including the
    routed large-table path.  Results match KmerApplyEngine(weighted=True)
    up to float32 summation order: the routed path psum-merges per-shard
    partial tallies, so a tally within 1 ulp of a tie can call a
    different (equally-tallied) role than the single-device dense vote
    depending on shard count (ADVICE r3).  The unanimity vote is exact
    in every mode (integer min/max/sum are order-free).
    """

    def __init__(self, signatures: SignatureTable, n_data: int,
                 n_table: int = 1, min_hits: int = 5, mode: str = "auto",
                 capacity_factor: float | None = None,
                 weighted: bool = False, min_weight: float | None = None):
        if mode == "auto":
            mode = "replicated" if n_table == 1 else "routed"
        if n_table == 1 and mode != "replicated":
            raise ValueError("sharded modes need a table axis > 1")
        super().__init__(n_data, n_table)
        self.mode = mode
        self.k = signatures.k
        self.alphabet = signatures.alphabet
        self.min_hits = min_hits
        self.weighted = weighted
        self.min_weight = float(min_hits if min_weight is None
                                else min_weight)
        self.capacity_factor = capacity_factor
        self.role_ids = signatures.role_ids
        if mode == "replicated":
            table_np, self.max_probes = signatures.device_table_np(
                packed_weights=weighted)
        else:
            table_np, self.max_probes = shard_signature_table(
                signatures.key_lo, signatures.key_hi,
                signatures._payloads(weighted), n_table)
        self.table = self._global(
            table_np, P() if mode == "replicated" else P("table"))

    def _thresh(self):
        return (jnp.float32(self.min_weight) if self.weighted
                else jnp.int32(self.min_hits))

    # ----- step-compile cache (keyed on static shape args) -----

    def _step(self, n_seqs: int, capacity: int | None):
        key = (self.mode, n_seqs, capacity)
        fn = self._steps.get(key)
        if fn is None:
            kw = dict(k=self.k, max_probes=self.max_probes, n_seqs=n_seqs,
                      weighted=self.weighted, n_roles=len(self.role_ids),
                      alphabet=self.alphabet)
            if self.mode == "replicated":
                fn = replicated_apply_step(self.mesh, **kw)
            elif self.mode == "pmax":
                fn = sharded_apply_step(self.mesh, **kw)
            else:
                fn = routed_apply_step(self.mesh, capacity=capacity, **kw)
            self._steps[key] = fn
        return fn

    # ----- one chunk of ≤ n_data genomes -----

    def _run_chunk(self, chunk: list[tuple[Genome, list[Feature]]]
                   ) -> list[list[tuple[Feature, str, int]]]:
        prots = [[f.protein_translation for f in pegs]
                 for _, pegs in chunk]
        # bucketed shapes are computed over the WHOLE chunk so every
        # process agrees on the compiled program; only this process's own
        # data rows are encoded (the expensive host work is partitioned)
        width = _bucket(max((sum(map(len, p)) for p in prots), default=1),
                        16384)
        n_seqs = _bucket(max((len(p) for p in prots), default=1), 256)
        n_local = len(self.rows_mine)
        codes = np.full((n_local, width), PROT_PAD, np.uint8)
        seg_ids = np.full((n_local, width), n_seqs, np.int32)
        valid = np.zeros((n_local, width), bool)
        for j, i in enumerate(self.rows_mine):
            if i < len(prots):
                b = FlatBatch(prots[i], self.k, min_tokens=width,
                              min_seqs=n_seqs)
                codes[j], seg_ids[j], valid[j] = b.codes, b.seg_ids, b.valid

        if self.mode == "routed":
            roles, hits = self._run_routed(codes, seg_ids, valid, n_seqs)
        else:
            step = self._step(n_seqs, None)
            r, h = step(self.table, self._global(codes, P("data")),
                        self._global(seg_ids, P("data")),
                        self._global(valid, P("data")), self._thresh())
            roles, hits = self._host(r), self._host(h)

        conv = (lambda h: round(float(h), 4)) if self.weighted else int
        out = []
        for i, (_, pegs) in enumerate(chunk):
            out.append([(feat, self.role_ids[r], conv(h))
                        for feat, r, h in zip(pegs, roles[i], hits[i])
                        if r >= 0])
        return out

    def _run_routed(self, codes, seg_ids, valid, n_seqs):
        rows = [split_tokens_for_table_axis(
                    codes[j], seg_ids[j], valid[j], self.n_table, self.k,
                    n_seqs, PROT_PAD)
                for j in range(codes.shape[0])]
        spec = P("data", "table")
        sc = self._global(np.stack([r[0] for r in rows]), spec)
        ss = self._global(np.stack([r[1] for r in rows]), spec)
        sv = self._global(np.stack([r[2] for r in rows]), spec)
        tc = sc.shape[-1]
        capacity = None
        if self.capacity_factor is not None:
            capacity = min(tc, int(np.ceil(
                tc / self.n_table * self.capacity_factor)))
        step = self._step(n_seqs, capacity)
        r, h, ovf = step(self.table, sc, ss, sv, self._thresh())
        if capacity is not None and int(ovf):
            log.info("Routing capacity %d overflowed; re-running chunk at "
                     "the safe bound %d.", capacity, tc)
            r, h, ovf = self._step(n_seqs, None)(
                self.table, sc, ss, sv, self._thresh())
        assert int(ovf) == 0
        return self._host(r), self._host(h)

    # ----- streaming driver -----

    def call_genomes(self, genomes: Iterable[Genome]
                     ) -> Iterator[tuple[Genome, list]]:
        """Yield (genome, [(feature, role_id, hits), …]) in input order,
        grouping ``n_data`` genomes per device step."""
        chunk: list[tuple[Genome, list[Feature]]] = []

        def flush():
            if not chunk:
                return
            for (genome, _), calls in zip(chunk, self._run_chunk(chunk)):
                yield genome, calls
            chunk.clear()

        for genome in genomes:
            pegs = [f for f in genome.pegs if f.protein_translation]
            chunk.append((genome, pegs))
            if len(chunk) == self.n_data:
                yield from flush()
        yield from flush()


class DnaMeshApplyEngine(_MeshPlumbing):
    """DNA-mode annotation on a (data, table) mesh.

    Each data row carries one genome's two-strand contig window stream
    (``DnaContigBatch``); the probe returns per-WINDOW payloads because
    DNA hits are clustered by position on the host (dna_apply semantics).
    n_table == 1 replicates the table; n_table > 1 hash-shards it and
    merges per-position results with pmax (``sharded_probe_step``) — the
    positional analogue of the routed vote (which discards positions and
    therefore cannot serve clustering).  Composes with weighted tables:
    packed payloads come back per window and the host clustering thresholds
    on summed hit weight.
    """

    def __init__(self, signatures: SignatureTable, n_data: int,
                 n_table: int = 1, min_hits: int = 5, max_gap: int = 500,
                 weighted: bool = False, min_weight: float | None = None):
        if signatures.alphabet != "dna":
            raise ValueError("DnaMeshApplyEngine requires a DNA table")
        super().__init__(n_data, n_table)
        self.k = signatures.k
        self.min_hits = min_hits
        self.max_gap = max_gap
        self.weighted = weighted
        self.min_weight = float(min_hits if min_weight is None
                                else min_weight)
        self.role_ids = signatures.role_ids
        if n_table == 1:
            table_np, self.max_probes = signatures.device_table_np(
                packed_weights=weighted)
        else:
            table_np, self.max_probes = shard_signature_table(
                signatures.key_lo, signatures.key_hi,
                signatures._payloads(weighted), n_table)
        self.table = self._global(
            table_np, P() if n_table == 1 else P("table"))

    def _step(self, width: int):
        key = width
        fn = self._steps.get(key)
        if fn is None:
            kw = dict(k=self.k, max_probes=self.max_probes, alphabet="dna")
            fn = (replicated_probe_step(self.mesh, **kw)
                  if self.n_table == 1
                  else sharded_probe_step(self.mesh, **kw))
            self._steps[key] = fn
        return fn

    def _run_chunk(self, chunk: list[tuple[Genome, DnaContigBatch]]
                   ) -> list[list[tuple[Feature, str, int | float]]]:
        width = _bucket(max((len(b.codes) for _, b in chunk), default=1),
                        1 << 16)
        n_local = len(self.rows_mine)
        codes = np.full((n_local, width), DNA_PAD, np.uint8)
        valid = np.zeros((n_local, width), bool)
        for j, i in enumerate(self.rows_mine):
            if i < len(chunk):
                b = chunk[i][1]
                codes[j, : len(b.codes)] = b.codes
                valid[j, : len(b.valid)] = b.valid
        vals = self._host(self._step(width)(
            self.table, self._global(codes, P("data")),
            self._global(valid, P("data"))))
        out = []
        for i, (genome, batch) in enumerate(chunk):
            out.append(cluster_calls(
                genome, batch, vals[i], self.k, self.max_gap,
                self.min_hits, self.role_ids, weighted=self.weighted,
                min_weight=self.min_weight))
        return out

    def call_genomes(self, genomes: Iterable[Genome]
                     ) -> Iterator[tuple[Genome, list]]:
        """Yield (genome, [(region feature, role_id, hits), …]) in input
        order, grouping ``n_data`` genomes per device step."""
        chunk: list[tuple[Genome, DnaContigBatch]] = []

        def flush():
            if not chunk:
                return
            for (genome, _), calls in zip(chunk, self._run_chunk(chunk)):
                yield genome, calls
            chunk.clear()

        for genome in genomes:
            batch = DnaContigBatch(
                [(c.id, c.sequence) for c in genome.contigs], self.k)
            chunk.append((genome, batch))
            if len(chunk) == self.n_data:
                yield from flush()
        yield from flush()
