"""DNA-mode annotation over raw contigs (BASELINE config 3).

The reference's ``apply`` is protein-only (ApplyKmerProcessor.java:113-155);
this engine is the north-star DNA extension: a nucleotide signature table
(k ≤ 15, built by ``build --dna`` from coding-strand CDS DNA) is probed
against **every window of both strands of every raw contig** — no gene
calls needed — and hits are clustered into called regions.

Dataflow (same architecture as the protein apply path):

    host:   encode contigs once (uint8 codes), append the reverse
            complement of each contig as its own stream entry, compute
            window validity (no ambiguous base, window inside the entry)
    device: pack 2-bit kmer windows → bucketed hash probe  (one jitted op)
    host:   cluster hit windows into regions — consecutive same-role hits
            at most ``max_gap`` window-starts apart merge; a cluster with
            ≥ min_hits hits is called as a region feature

Region coordinates are reported 1-based on the forward strand; a hit at
reverse-complement window start w of a length-L contig covers forward
positions [L−w−k+1, L−w].  Clustering by (role, proximity) is this
engine's own convention (the reference has no DNA mode to match).
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..genome.gto import Feature, Genome
from ..ops.dna_kmers import dna_valid_np, pack_dna_windows
from ..ops.encode import DNA_PAD, encode_dna, reverse_complement_codes
from ..ops.hashtable import probe_table
from .signature import SignatureTable

log = logging.getLogger(__name__)


def _bucket(n: int, minimum: int) -> int:
    n = max(n, minimum)
    return 1 << (n - 1).bit_length()


@partial(jax.jit, static_argnames=("k", "max_probes"))
def probe_dna_flat(table, codes, valid, *, k: int, max_probes: int):
    """Probe every valid DNA kmer window of a flat code stream.

    table: (B, 24) uint32 bucketed signature table
    codes: (T,) uint8 DNA codes (DNA_PAD padding)
    valid: (T,) bool window-start validity
    returns (T,) int32 — role index per window, -1 on miss/invalid
    """
    lo, hi = pack_dna_windows(codes, k)
    return probe_table(table, lo, hi, valid, max_probes)


class DnaContigBatch:
    """Flat two-strand token stream of one genome's contigs (host side).

    entries: list of (contig_id, strand, offset, length) — one per
    (contig, strand); ``offset`` indexes into the flat ``codes`` array.
    """

    __slots__ = ("codes", "valid", "entries")

    def __init__(self, contigs: list[tuple[str, str]], k: int,
                 min_tokens: int = 1 << 16):
        parts: list[np.ndarray] = []
        valids: list[np.ndarray] = []
        self.entries: list[tuple[str, str, int, int]] = []
        pos = 0
        for cid, seq in contigs:
            fwd = encode_dna(seq)
            for strand, codes in (("+", fwd),
                                  ("-", reverse_complement_codes(fwd))):
                n = len(codes)
                v = np.zeros(n, bool)
                if n >= k:
                    v[: n - k + 1] = dna_valid_np(codes, k)
                self.entries.append((cid, strand, pos, n))
                parts.append(codes)
                valids.append(v)
                pos += n
        width = _bucket(pos, min_tokens)
        self.codes = np.full(width, DNA_PAD, np.uint8)
        self.valid = np.zeros(width, bool)
        if parts:
            flat = np.concatenate(parts)
            self.codes[: len(flat)] = flat
            self.valid[: len(flat)] = np.concatenate(valids)


def cluster_hits(roles: np.ndarray, k: int, max_gap: int, min_hits: int
                 ) -> list[tuple[int, int, int, int]]:
    """Cluster hit windows of ONE stream entry.

    roles: (W,) int32 — role per window start, -1 = miss
    returns [(first_window, last_window, role_idx, n_hits), ...] for
    clusters with ≥ min_hits same-role hits, window starts ascending.
    """
    hp = np.flatnonzero(roles >= 0)
    if len(hp) == 0:
        return []
    hr = roles[hp]
    brk = np.flatnonzero((np.diff(hp) > max_gap) | (np.diff(hr) != 0))
    starts = np.concatenate([[0], brk + 1])
    ends = np.concatenate([brk, [len(hp) - 1]])
    out = []
    for s, e in zip(starts, ends):
        n = int(e - s + 1)
        if n >= min_hits:
            out.append((int(hp[s]), int(hp[e]), int(hr[s]), n))
    return out


class DnaApplyEngine:
    """Annotates raw contigs against a DNA signature table."""

    def __init__(self, signatures: SignatureTable, min_hits: int = 5,
                 max_gap: int = 500):
        if signatures.alphabet != "dna":
            raise ValueError("DnaApplyEngine requires a DNA signature table")
        self.signatures = signatures
        self.k = signatures.k
        self.min_hits = min_hits
        self.max_gap = max_gap
        self.table, self.max_probes = signatures.device_table()
        self.role_ids = signatures.role_ids

    def prepare(self, genome: Genome) -> DnaContigBatch:
        """Host-side encode (safe to run in a prefetch worker thread)."""
        return DnaContigBatch(
            [(c.id, c.sequence) for c in genome.contigs], self.k)

    def call_prepared(self, genome: Genome, batch: DnaContigBatch
                      ) -> list[tuple[Feature, str, int]]:
        """Device probe + host clustering on a prepared batch; returns
        (region feature, role_id, hits) triples in contig order."""
        roles = np.asarray(probe_dna_flat(
            self.table, jnp.asarray(batch.codes), jnp.asarray(batch.valid),
            k=self.k, max_probes=self.max_probes))
        calls: list[tuple[Feature, str, int]] = []
        n = 0
        for cid, strand, off, length in batch.entries:
            w = max(length - self.k + 1, 0)
            for w0, w1, ridx, hits in cluster_hits(
                    roles[off: off + w], self.k, self.max_gap,
                    self.min_hits):
                if strand == "+":
                    left, right = w0 + 1, w1 + self.k
                else:
                    left = length - w1 - self.k + 1
                    right = length - w0
                n += 1
                feat = Feature.create(
                    f"fig|{genome.id}.region.{n}", "", cid, strand,
                    left, right, ftype="region")
                calls.append((feat, self.role_ids[ridx], hits))
        return calls

    def call_genome(self, genome: Genome) -> list[tuple[Feature, str, int]]:
        """All called (region, role_id, hits) triples over both strands of
        the genome's raw contigs."""
        return self.call_prepared(genome, self.prepare(genome))
