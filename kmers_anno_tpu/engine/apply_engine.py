"""Signature-table annotation engine (the ``apply`` hot path).

Replicates ApplyKmerProcessor.java:113-155 with the TPU-native dataflow of
the BASELINE north star:

    host: concatenate a genome's proteins into ONE flat uint8 token stream
          (with segment ids), padded to a static block size
    device (one jitted program):
          pack kmer windows → hash-probe the flat table → segmented
          unanimous vote (Q9) → (called role, hit count) per protein

The Java inner loop walks kmers sequentially and aborts on the first
conflicting role hit; the outcome is order-free (SURVEY.md §2c Q9), so the
device reduction uses segmented min/max/sum — no scan, no data-dependent
control flow, everything lands on the VPU with static shapes.

Batch shapes are bucketed (token stream length and segment count rounded up
to power-of-two-ish buckets) so XLA compiles a handful of programs per run
regardless of genome sizes.
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import native
from ..genome.gto import Genome, Feature
from ..ops.encode import PROT_PAD, encode_protein
from ..ops.hashtable import probe_table
from ..ops.kmers import pack_kmer_windows
from ..ops.sliced_probe import probe_table_sliced
from ..ops.vote import pick_weighted_vote, split_packed_payload
from .signature import SignatureTable

log = logging.getLogger(__name__)

_INT32_MAX = 2**31 - 1


def _bucket(n: int, minimum: int) -> int:
    """Round up to the next power of two (≥ minimum) to bound recompiles."""
    n = max(n, minimum)
    return 1 << (n - 1).bit_length()


@partial(jax.jit, static_argnames=("k", "max_probes", "n_seqs", "sliced"))
def apply_flat(table, codes, seg_ids, valid, min_hits, *,
               k: int, max_probes: int, n_seqs: int, sliced: bool = False):
    """The fused apply step over a flat token stream.

    table:    (B, 24) uint32 bucketed signature table — or, when
              ``sliced`` is True, the (B, 24·max_probes) probe-window
              layout served by the sort-and-stream big-table probe
              (ops.sliced_probe; ~19× on HBM-resident tables)
    codes:    (T,) uint8 concatenated protein codes (PROT_PAD padding)
    seg_ids:  (T,) int32 protein index per token (padding → n_seqs)
    valid:    (T,) bool — kmer window starting here stays inside one protein
    min_hits: int32 scalar — minimum unanimous hits to call a role

    returns (role (n_seqs,) int32 — called role index or -1,
             hits (n_seqs,) int32 — unanimous hit count, 0 if uncalled)
    """
    lo, hi = pack_kmer_windows(codes, k)
    probe = probe_table_sliced if sliced else probe_table
    roles = probe(table, lo, hi, valid, max_probes)
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


@partial(jax.jit, static_argnames=("k", "max_probes", "n_seqs", "n_roles",
                                   "sliced"))
def apply_weighted_flat(table, codes, seg_ids, valid, min_weight, *,
                        k: int, max_probes: int, n_seqs: int,
                        n_roles: int, sliced: bool = False):
    """Weighted-vote apply step (north-star config 2): same pack + probe
    as apply_flat, but payloads carry packed (weight, role) and the vote
    is a best-tally reduction instead of unanimity.

    The vote is always a dense tally — one (n_seqs, n_roles) matrix when
    it fits DENSE_VOTE_LIMIT, a fori_loop over role blocks otherwise
    (ops.vote.pick_weighted_vote); no input shape reaches the slow
    sort-based path."""
    lo, hi = pack_kmer_windows(codes, k)
    probe = probe_table_sliced if sliced else probe_table
    val = probe(table, lo, hi, valid, max_probes)
    roles, weights = split_packed_payload(val)
    vote = pick_weighted_vote(n_seqs, n_roles)
    return vote(roles, weights, seg_ids, valid, min_weight)


class FlatBatch:
    """A flat token-stream batch of protein sequences (host side)."""

    __slots__ = ("codes", "seg_ids", "valid", "n_seqs")

    def __init__(self, proteins: list[str], k: int,
                 min_tokens: int = 16384, min_seqs: int = 256):
        n = len(proteins)
        total = sum(map(len, proteins))
        width = _bucket(total, min_tokens)
        self.n_seqs = _bucket(n, min_seqs)
        got = native.flat_batch(proteins, k, width, self.n_seqs)
        if got is not None:  # C++ data loader (kan_host.cpp)
            self.codes, self.seg_ids, self.valid = got
            return
        codes = np.full(width, PROT_PAD, np.uint8)
        seg_ids = np.full(width, self.n_seqs, np.int32)
        valid = np.zeros(width, bool)
        pos = 0
        for i, prot in enumerate(proteins):
            ln = len(prot)
            codes[pos: pos + ln] = encode_protein(prot)
            seg_ids[pos: pos + ln] = i
            if ln >= k:
                valid[pos: pos + ln - k + 1] = True
            pos += ln
        self.codes = codes
        self.seg_ids = seg_ids
        self.valid = valid


class KmerApplyEngine:
    """Annotates genomes against a packed signature table.

    weighted=False (default) is the reference-exact unanimity vote
    (ApplyKmerProcessor.java:122-147); weighted=True enables the
    north-star weighted best-tally vote, calling a role when its summed
    hit weights reach ``min_weight`` (default: min_hits)."""

    def __init__(self, signatures: SignatureTable, min_hits: int = 5,
                 weighted: bool = False, min_weight: float | None = None):
        self.signatures = signatures
        self.k = signatures.k
        self.min_hits = min_hits
        self.weighted = weighted
        self.min_weight = float(min_hits if min_weight is None
                                else min_weight)
        self.table, self.max_probes, self.sliced = (
            signatures.device_probe_table(packed_weights=weighted))
        self.role_ids = signatures.role_ids

    def _device_step(self, batch: "FlatBatch"):
        args = (self.table, jnp.asarray(batch.codes),
                jnp.asarray(batch.seg_ids), jnp.asarray(batch.valid))
        kw = dict(k=self.k, max_probes=self.max_probes, n_seqs=batch.n_seqs,
                  sliced=self.sliced)
        if self.weighted:
            return apply_weighted_flat(
                *args, jnp.float32(self.min_weight),
                n_roles=len(self.role_ids), **kw)
        return apply_flat(*args, jnp.int32(self.min_hits), **kw)

    def call_proteins(self, proteins: list[str]
                      ) -> list[tuple[str, int] | None]:
        """Per protein: (role_id, unanimous hit count) or None when no role
        is called (miss / conflicting hits / below min_hits)."""
        if not proteins:
            return []
        batch = FlatBatch(proteins, self.k)
        role, hits = self._device_step(batch)
        role = np.asarray(role)[: len(proteins)]
        hits = np.asarray(hits)[: len(proteins)]
        conv = (lambda h: round(float(h), 4)) if self.weighted else int
        return [(self.role_ids[r], conv(h)) if r >= 0 else None
                for r, h in zip(role, hits)]

    def prepare(self, genome: Genome
                ) -> tuple[list[Feature], FlatBatch | None]:
        """Host-side prep (peg selection + flat-batch encode) — GIL-light,
        safe to run in a prefetch worker thread."""
        pegs = [f for f in genome.pegs if f.protein_translation]
        if not pegs:
            return pegs, None
        return pegs, FlatBatch([f.protein_translation for f in pegs], self.k)

    def call_prepared(self, pegs: list[Feature], batch: FlatBatch | None
                      ) -> list[tuple[Feature, str, int]]:
        """Device step + decode on a prepared batch."""
        if batch is None:
            return []
        role, hits = self._device_step(batch)
        role = np.asarray(role)[: len(pegs)]
        hits = np.asarray(hits)[: len(pegs)]
        conv = (lambda h: round(float(h), 4)) if self.weighted else int
        return [(feat, self.role_ids[r], conv(h))
                for feat, r, h in zip(pegs, role, hits) if r >= 0]

    def call_genome(self, genome: Genome
                    ) -> list[tuple[Feature, str, int]]:
        """All called (feature, role_id, hits) triples of a genome's pegs,
        in peg order (ApplyKmerProcessor.java:122-147)."""
        return self.call_prepared(*self.prepare(genome))
