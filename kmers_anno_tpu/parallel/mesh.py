"""Device-mesh sharding of the apply pipeline.

Two table layouts (SURVEY.md §5.8):

* **Replicated table** — one copy per chip; the probe is a local gather and
  the only collective is metric reduction.  Right up to ~100M entries
  (1.6 GB at 16 B/slot with load factor 0.5 fits HBM comfortably).
* **Sharded table** — keys are partitioned host-side by
  ``mix_kmer(key) % n_shards`` into per-shard open-addressing tables of
  identical size, stacked (n_shards, S, 4) and laid out along the ``table``
  mesh axis.  Each shard probes the (replicated-over-table) token batch
  against its local sub-table; because exactly one shard owns any key, a
  ``jax.lax.pmax`` over the table axis merges per-position role hits
  (miss = -1 loses the max).  The segmented unanimous vote then runs on the
  merged roles.  This keeps the whole batch resident per chip but divides
  the table memory by n_shards — the right trade on TPU, where ICI
  bandwidth is plentiful and the batch is tiny next to the table.

Both steps are built with ``jax.shard_map`` over an explicit Mesh so the
driver can compile them on a virtual CPU mesh (tests) and on real chips
unchanged.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.hashing import mix_kmer
from ..ops.hashtable import EMPTY, build_table, probe_table, table_size_for
from ..ops.kmers import pack_kmer_windows

_INT32_MAX = 2**31 - 1


def make_mesh(n_data: int, n_table: int = 1,
              devices: list | None = None) -> Mesh:
    """A (data, table) mesh over the first n_data*n_table devices."""
    if devices is None:
        devices = jax.devices()
    need = n_data * n_table
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    grid = np.array(devices[:need]).reshape(n_data, n_table)
    return Mesh(grid, ("data", "table"))


# ---------------------------------------------------------------------------
# table sharding (host side)
# ---------------------------------------------------------------------------

def shard_signature_table(key_lo: np.ndarray, key_hi: np.ndarray,
                          values: np.ndarray, n_shards: int,
                          load_factor: float = 0.5):
    """Partition keys by hash and build one bucketed table per shard.

    returns (tables (n_shards, B, 24) uint32 np array, max_probes int)
    All shard tables share the bucket count of the largest shard so the
    stack is rectangular (required for a sharded device array).
    """
    h = mix_kmer(key_lo.astype(np.uint32), key_hi.astype(np.uint32), np)
    owner = (h % np.uint32(n_shards)).astype(np.int64)
    counts = np.bincount(owner, minlength=n_shards)
    n_buckets = table_size_for(int(counts.max()), load_factor)
    tables = np.zeros((n_shards,), object)
    max_probes = 1
    for s in range(n_shards):
        mask = owner == s
        tbl, probes = build_table(key_lo[mask], key_hi[mask],
                                  values[mask].astype(np.uint32),
                                  n_buckets=n_buckets)
        tables[s] = tbl
        max_probes = max(max_probes, probes)
    return np.stack(list(tables)), max_probes


# ---------------------------------------------------------------------------
# device steps
# ---------------------------------------------------------------------------

def _vote(roles, valid, seg_ids, min_hits, n_seqs):
    hit = valid & (roles >= 0)
    seg = jnp.where(hit, seg_ids, n_seqs)
    n_hits = jax.ops.segment_sum(
        hit.astype(jnp.int32), seg, num_segments=n_seqs + 1)[:-1]
    rmin = jax.ops.segment_min(
        jnp.where(hit, roles, _INT32_MAX), seg, num_segments=n_seqs + 1)[:-1]
    rmax = jax.ops.segment_max(
        jnp.where(hit, roles, -1), seg, num_segments=n_seqs + 1)[:-1]
    unanimous = (n_hits > 0) & (rmin == rmax)
    called = unanimous & (n_hits >= min_hits)
    return jnp.where(called, rmax, -1), jnp.where(called, n_hits, 0)


def replicated_apply_step(mesh: Mesh, *, k: int, max_probes: int,
                          n_seqs: int):
    """Jitted apply step: table replicated, token batch sharded on ``data``.

    Returned fn signature: (table (S,4), codes (D, T), seg_ids (D, T),
    valid (D, T), min_hits) → (roles (D, n_seqs), hits (D, n_seqs)) where D
    is the data-axis size (one flat token stream per data shard).
    """
    def step(table, codes, seg_ids, valid, min_hits):
        lo, hi = pack_kmer_windows(codes, k)
        roles = probe_table(table, lo, hi, valid, max_probes)
        return _vote(roles, valid, seg_ids, min_hits, n_seqs)

    sharded = jax.shard_map(
        jax.vmap(step, in_axes=(None, 0, 0, 0, None)),
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P()),
        out_specs=(P("data"), P("data")),
        check_vma=False)
    return jax.jit(sharded)


def sharded_apply_step(mesh: Mesh, *, k: int, max_probes: int, n_seqs: int):
    """Jitted apply step with the table sharded over the ``table`` axis.

    Returned fn signature: (tables (n_shards, S, 4), codes (D, T),
    seg_ids (D, T), valid (D, T), min_hits) → (roles (D, n_seqs),
    hits (D, n_seqs)).  Probe hits merge across shards with pmax; the vote
    runs on the merged roles (replicated over the table axis).
    """
    def step(tables, codes, seg_ids, valid, min_hits):
        # local shapes: tables (1, S, 4); codes/seg/valid (D/data, T)
        table = tables[0]
        def one(codes1, seg1, valid1):
            lo, hi = pack_kmer_windows(codes1, k)
            local = probe_table(table, lo, hi, valid1, max_probes)
            merged = jax.lax.pmax(local, "table")
            return _vote(merged, valid1, seg1, min_hits, n_seqs)
        return jax.vmap(one)(codes, seg_ids, valid)

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P("table"), P("data"), P("data"), P("data"), P()),
        out_specs=(P("data"), P("data")),
        check_vma=False)
    return jax.jit(sharded)
