"""ORF-projection annotation engine (the ``kmers``/``batch`` flagship path,
KmerProcessor.annotateGenome — KmerProcessor.java:166-287).

Pipeline, re-architected for the device:

1. **Contig kmer index** (hot loop #1): 6-frame device translation + window
   packing (ops.contig_kmers) over the new genome's contigs; the HashMap of
   kmer→locations becomes a device sort-based CSR (unique keys → location
   ranges) fronted by the bucketed probe table.  STRICT mode drops
   multi-location kmers (KmerFactory.java:64-68); AGGRESSIVE keeps all.
2. **Peg singleton kmers** per close genome (hot loop #2): flat-stream
   window packing + device sort; kmers occurring exactly once survive
   (Q5 — CountMap.getSingletons, KmerProcessor.java:319-327).
3. **Matching** (hot loop #3): one device probe of all singleton kmers
   against the contig table; hits expand through the CSR to
   (peg, contig-location) pairs.
4. **Window scan** (hot loop #4): pairs bucket by (peg, frame) — frame =
   strand + codon phase of the location (FramedLocationLists semantics) —
   and each bucket's sorted location list is scanned for evidence windows
   (Q6), feeding the proposal list (Q3 strength/3, Q7 ORF dedup).
5. Surviving proposals become features in numbering order (Q8), with
   start-aware translation and the two annotation-history strings.
"""

from __future__ import annotations

import logging
from collections import OrderedDict
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import native
from ..genome.dna import DnaTranslator
from ..genome.gto import Feature, Genome
from ..genome.locations import Location
from ..ops.contig_kmers import extract_contig_kmers
from ..ops.encode import PROT_PAD, encode_dna, encode_protein
from ..ops.hashtable import (MAX_DEVICE_PROBES, build_table,
                             build_table_device, device_table_buckets,
                             probe_table)
from ..ops.kmers import pack_kmer_windows
from ..ops.widetable import (build_wide_table, build_wide_table_device,
                             probe_wide, wide_rows_for)
from .apply_engine import _bucket
from .proposals import PegProposalList

log = logging.getLogger(__name__)

TOOL_NAME = "kmers.anno"


# ---------------------------------------------------------------------------
# device group-by: unique keys with counts (shared by index + singletons)
# ---------------------------------------------------------------------------

@jax.jit
def _sort_with_payload(lo, hi, payload):
    """Sort (hi, lo) keys carrying one int32 payload; returns sorted arrays
    plus first-of-segment flags and per-position segment ids."""
    shi, slo, spay = jax.lax.sort((hi, lo, payload), num_keys=2)
    prev_hi = jnp.concatenate([shi[:1] ^ jnp.uint32(1), shi[:-1]])
    prev_lo = jnp.concatenate([slo[:1], slo[:-1]])
    first = (shi != prev_hi) | (slo != prev_lo)
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    counts = jax.ops.segment_sum(jnp.ones_like(seg), seg,
                                 num_segments=lo.shape[0])
    return slo, shi, spay, first, seg, counts


# ---------------------------------------------------------------------------
# contig kmer index
# ---------------------------------------------------------------------------

@dataclass
class ContigKmerIndex:
    """Device-probed kmer → location-list index over a genome's contigs.

    CSR layout: unique keys (in the probe table, value = rank) own the
    location range locs[starts[rank] : starts[rank] + counts[rank]].
    """

    k: int
    table: jnp.ndarray          # (B, 24) device probe table (key → rank)
    max_probes: int
    ukey_lo: np.ndarray         # (U,) uint32 — unique packed keys
    ukey_hi: np.ndarray         # (U,) uint32
    starts: np.ndarray          # (U,) int64
    counts: np.ndarray          # (U,) int32
    loc_contig: np.ndarray      # (N,) int32  — contig index
    loc_strand: np.ndarray      # (N,) int8   — 0='+', 1='-'
    loc_left: np.ndarray        # (N,) int32  — 1-based left edge
    contig_ids: list            # contig index → id
    n_unique: int

    @classmethod
    def build(cls, genome: Genome, k: int = 8,
              strict: bool = False) -> "ContigKmerIndex":
        parts = []
        contig_ids = []
        for ci, contig in enumerate(genome.contigs):
            got = extract_contig_kmers(contig.sequence, k,
                                       genome.genetic_code)
            got["contig"] = np.full(len(got["lo"]), ci, np.int32)
            parts.append(got)
            contig_ids.append(contig.id)
        lo = np.concatenate([p["lo"] for p in parts])
        hi = np.concatenate([p["hi"] for p in parts])
        left = np.concatenate([p["left"] for p in parts])
        strand = np.concatenate([p["strand"] for p in parts])
        contig = np.concatenate([p["contig"] for p in parts])
        n = len(lo)
        if n == 0:
            raise ValueError("genome has no contig kmers")

        got = native.groupby(lo, hi)
        if got is not None:
            # host C++ group-by (kan_groupby): one sort, zero device
            # round-trips — device pulls cost ~40ms/MB over a tunnel
            sidx, ustarts = got
            starts_all = ustarts
            ukey_lo = lo[sidx[ustarts]]
            ukey_hi = hi[sidx[ustarts]]
            ucounts = np.diff(np.append(ustarts, n)).astype(np.int32)
        else:
            # device sort by key; payload = original row index
            idx = np.arange(n, dtype=np.int32)
            slo, shi, sidx, first, seg, counts = _sort_with_payload(
                jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(idx))
            slo = np.asarray(slo)
            shi = np.asarray(shi)
            sidx = np.asarray(sidx)
            first = np.asarray(first)
            counts = np.asarray(counts)

            starts_all = np.flatnonzero(first)          # (U,)
            ukey_lo = slo[starts_all]
            ukey_hi = shi[starts_all]
            ucounts = counts[: len(starts_all)]
        if strict:
            keep = ucounts == 1                      # STRICT: unique only
            ukey_lo, ukey_hi = ukey_lo[keep], ukey_hi[keep]
            starts_all, ucounts = starts_all[keep], ucounts[keep]
        table, max_probes = build_table(
            ukey_lo, ukey_hi, np.arange(len(ukey_lo), dtype=np.uint32))
        return cls(
            k=k, table=jnp.asarray(table), max_probes=max_probes,
            ukey_lo=ukey_lo, ukey_hi=ukey_hi,
            starts=starts_all.astype(np.int64),
            counts=ucounts.astype(np.int32),
            loc_contig=contig[sidx], loc_strand=strand[sidx],
            loc_left=left[sidx], contig_ids=contig_ids,
            n_unique=len(ukey_lo))


# ---------------------------------------------------------------------------
# device-resident stream window index (the TPU fast path)
# ---------------------------------------------------------------------------

def _bucket_blocks(n: int) -> int:
    """Round a block count to {2^m, 3·2^(m-1)} to bound recompiles."""
    n = max(n, 1)
    p = 1 << (n - 1).bit_length()
    if p * 3 // 4 >= n:
        return p * 3 // 4
    return p


_combine_mask = jax.jit(lambda m, b: m & (b == 0))


@jax.jit
def _strict_window_mask(d_lo, d_hi, d_valid):
    """STRICT mode (KmerFactory.java:64-68) on the window stream: keep
    only windows whose kmer occurs exactly once among valid windows."""
    n = d_lo.shape[0]
    sent = jnp.int32(1 << 30)              # > any packed hi (≤ 30 bits)
    key_hi = jnp.where(d_valid, d_hi, sent)
    pos = jnp.arange(n, dtype=jnp.int32)
    shi, slo, spos = jax.lax.sort((key_hi, d_lo, pos), num_keys=2)
    prev_hi = jnp.concatenate([shi[:1] ^ 1, shi[:-1]])
    prev_lo = jnp.concatenate([slo[:1], slo[:-1]])
    first = (shi != prev_hi) | (slo != prev_lo)
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    counts = jax.ops.segment_sum(jnp.ones(n, jnp.int32), seg,
                                 num_segments=n)
    keep = (counts[seg] == 1) & (shi != sent)
    return jnp.zeros(n, bool).at[spos].set(keep)


@partial(jax.jit, static_argnames=("n_buckets",))
def _build_singleton_table(s_lo, s_hi, s_peg, n_buckets: int):
    """Device build of one close genome's singleton table (cacheable)."""
    return build_table_device(s_lo, s_hi, s_peg, n_buckets)


@partial(jax.jit, static_argnames=("n_rows",))
def _build_singleton_wide(s_lo, s_hi, s_peg, n_rows: int):
    """Device wide-bucket build (salt 0; bad flag on any walk)."""
    return build_wide_table_device(s_lo, s_hi, s_peg, n_rows)


_PROBE_CHUNK = 1 << 19     # windows per probe step: the gathered row
                           # buffer is the memory hot spot (72 words per
                           # window); chunking keeps it at ~150 MB even
                           # when several genome bodies overlap in one
                           # XLA program (10 unchunked bodies OOM'd HBM)


def _chunked_pay(table, d_lo, d_hi, d_valid, max_probes: int, salt):
    """Probe the whole stream in _PROBE_CHUNK slices (jit-composable)."""

    def probe(cl, ch, cv):
        if salt is None:                     # 8-slot bucketed layout
            return probe_table(table, cl.astype(jnp.uint32),
                               ch.astype(jnp.uint32), cv, max_probes)
        return probe_wide(table, cl.astype(jnp.uint32),
                          ch.astype(jnp.uint32), cv,
                          jnp.uint32(salt), max_probes=max_probes)

    n = d_lo.shape[0]
    if n <= _PROBE_CHUNK:
        return probe(d_lo, d_hi, d_valid)
    pad = -n % _PROBE_CHUNK
    lo_p = jnp.concatenate([d_lo, jnp.zeros(pad, d_lo.dtype)])
    hi_p = jnp.concatenate([d_hi, jnp.zeros(pad, d_hi.dtype)])
    v_p = jnp.concatenate([d_valid, jnp.zeros(pad, bool)])

    def step(i, out):
        s = i * _PROBE_CHUNK
        pv = probe(jax.lax.dynamic_slice(lo_p, (s,), (_PROBE_CHUNK,)),
                   jax.lax.dynamic_slice(hi_p, (s,), (_PROBE_CHUNK,)),
                   jax.lax.dynamic_slice(v_p, (s,), (_PROBE_CHUNK,)))
        return jax.lax.dynamic_update_slice(out, pv, (s,))

    out = jax.lax.fori_loop(0, (n + pad) // _PROBE_CHUNK, step,
                            jnp.full(n + pad, -1, jnp.int32))
    return out[:n]


def _rle_body(table, d_lo, d_hi, d_valid, cap: int, rcap: int,
              max_probes: int, salt=None):
    """Probe the window stream against a singleton table and return the
    hits RUN-LENGTH ENCODED (jit-composable body).

    Matched windows are overwhelmingly CONSECUTIVE stream positions with
    the same peg (a projected gene body matches at every window until a
    mismatch breaks the run), so (start, length, peg) triples compress
    the host pull by one to two orders of magnitude — and host↔device
    transfers, not compute, dominate this path on a tunneled device.

    returns (starts (rcap,), pegs (rcap,), lens (rcap,) int32,
             n_runs, n_hits int32 scalars)
    Results are ONLY valid when n_hits <= cap and n_runs <= rcap —
    callers must retry with bigger caps otherwise.
    """
    # an oversized cap must clamp to the true stream length, or ps (a
    # clamped slice) and idx (arange(cap)) would disagree in shape and
    # crash the jitted probe at trace time (ADVICE r4)
    cap = min(cap, int(d_lo.shape[0]))
    rcap = min(rcap, cap)
    pay = _chunked_pay(table, d_lo, d_hi, d_valid, max_probes, salt)
    hit = pay >= 0
    n_hits = jnp.sum(hit.astype(jnp.int32))
    miss = jnp.where(hit, jnp.int8(0), jnp.int8(1))
    pos = jnp.arange(pay.shape[0], dtype=jnp.int32)
    # stable sort-compaction keeps hits in stream order
    _, pos_s, pay_s = jax.lax.sort((miss, pos, pay), num_keys=2)
    ps = pos_s[:cap]
    gs = pay_s[:cap]
    idx = jnp.arange(cap, dtype=jnp.int32)
    ok = idx < n_hits
    brk = jnp.concatenate([
        jnp.ones(1, bool),
        (ps[1:] != ps[:-1] + 1) | (gs[1:] != gs[:-1])]) & ok
    n_runs = jnp.sum(brk.astype(jnp.int32))
    rid = jnp.cumsum(brk.astype(jnp.int32)) - 1
    seg = jnp.where(ok, rid, cap)
    lens = jax.ops.segment_sum(ok.astype(jnp.int32), seg,
                               num_segments=cap + 1)[:cap]
    nbrk = jnp.where(brk, jnp.int8(0), jnp.int8(1))
    _, bidx = jax.lax.sort((nbrk, idx), num_keys=1)
    return (ps[bidx][:rcap], gs[bidx][:rcap], lens[:rcap],
            n_runs, n_hits)


@partial(jax.jit, static_argnames=("cap", "rcap", "max_probes", "salt"))
def _probe_rle(table, d_lo, d_hi, d_valid, *,
               cap: int, rcap: int, max_probes: int, salt=None):
    """One-genome RLE probe (see _rle_body)."""
    return _rle_body(table, d_lo, d_hi, d_valid, cap, rcap, max_probes,
                     salt)


@partial(jax.jit, static_argnames=("cap", "rcap", "meta"))
def _probe_rle_multi(tables, d_lo, d_hi, d_valid, *,
                     cap: int, rcap: int, meta: tuple):
    """ALL close genomes in one device call against their (cached,
    possibly differently-sized) tables; outputs stacked (G, rcap).

    meta: per-genome static (max_probes, salt-or-None) — salt present
    means the table uses the wide-bucket single-gather layout.

    One dispatch + one result set for the whole close-genome loop: on a
    tunneled device each eager op / pull costs ~0.15-0.6 s of latency
    regardless of size, so per-genome calls would pay ~10× that.
    """
    outs = [_rle_body(t, d_lo, d_hi, d_valid, cap, rcap, mp, salt)
            for t, (mp, salt) in zip(tables, meta)]
    return tuple(jnp.stack([o[i] for o in outs]) for i in range(5))


@dataclass
class StreamWindowIndex:
    """Device-resident contig window keys (base-major stream order).

    Inverts the probe direction of ContigKmerIndex: instead of building a
    genome-size hash table over contig kmers and probing peg singletons
    into it (CSR expansion of location lists), the contig windows STAY on
    device as one packed stream and each close genome's (small) singleton
    set becomes the table — a window hit directly IS a (peg, location)
    pair.  Eliminates the megabyte host pulls and the host table build
    that dominate the host-index path (KmerReference.getContigKmers /
    KmerProcessor.java:197-207 semantics, identical pair multiset).
    """

    k: int
    gc: int
    d_lo: jnp.ndarray           # (N,) int32 device window keys
    d_hi: jnp.ndarray
    d_valid: jnp.ndarray        # (N,) bool device
    seg_start: np.ndarray       # (S,) int64 stream offset per segment
    seg_contig: np.ndarray      # (S,) int32
    seg_strand: np.ndarray      # (S,) int8
    seg_len: np.ndarray         # (S,) int64 contig length
    contig_ids: list
    n_windows: int

    @classmethod
    def build(cls, genome: Genome, k: int = 8, strict: bool = False,
              interpret: bool | None = None) -> "StreamWindowIndex":
        from ..ops.encode import DNA_AMBIG, reverse_complement_codes
        from ..ops.pallas_contig import LANES, ROWS, scan_stream_device

        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        k3 = 3 * k
        gap = k3                          # ≥ 3k-1: no window crosses
        parts, meta = [], []
        pos = 0
        for ci, contig in enumerate(genome.contigs):
            codes = encode_dna(contig.sequence)
            length = len(codes)
            for strand, arr in ((0, codes),
                                (1, reverse_complement_codes(codes))):
                meta.append((ci, strand, pos, length))
                parts.append(arr)
                parts.append(np.full(gap, DNA_AMBIG, np.uint8))
                pos += length + gap
        # pad the stream so the scan's block count lands on a bucket
        blk = ROWS * LANES
        n_blocks = _bucket_blocks(-(-max(pos - k3 + 1, 1) // blk))
        want = n_blocks * blk + k3 - 1
        if want > pos:
            parts.append(np.full(want - pos, DNA_AMBIG, np.uint8))
        stream = np.concatenate(parts)
        d_lo, d_hi, d_bad, n_pad = scan_stream_device(
            stream, k, genome.genetic_code, interpret=interpret)

        # Q1 validity per segment (strict drop-last, KmerReference
        # .java:186-187); Q2 ambiguity lives in the device ``bad`` flags
        mask = np.zeros(n_pad, bool)
        for ci, strand, start, length in meta:
            if length < k3:
                continue
            n_out = length - k3 + 1
            p = np.arange(n_out)
            flen = (length - p % 3) // 3
            mask[start: start + n_out] = (p // 3) < (flen - k)
        d_valid = _combine_mask(jnp.asarray(mask), d_bad)
        if strict:
            d_valid = _strict_window_mask(d_lo, d_hi, d_valid)
        return cls(
            k=k, gc=genome.genetic_code, d_lo=d_lo, d_hi=d_hi,
            d_valid=d_valid,
            seg_start=np.array([m[2] for m in meta], np.int64),
            seg_contig=np.array([m[0] for m in meta], np.int32),
            seg_strand=np.array([m[1] for m in meta], np.int8),
            seg_len=np.array([m[3] for m in meta], np.int64),
            contig_ids=[c.id for c in genome.contigs],
            n_windows=int(mask.sum()))

    def locate(self, pos: np.ndarray):
        """Stream positions → (contig idx, strand, 1-based left edge)."""
        seg = np.searchsorted(self.seg_start, pos, side="right") - 1
        local = pos - self.seg_start[seg]
        strand = self.seg_strand[seg]
        length = self.seg_len[seg]
        k3 = 3 * self.k
        left = np.where(strand == 0, local + 1,
                        (length - k3 + 1) - local)
        return (self.seg_contig[seg], strand.astype(np.int8),
                left.astype(np.int32))


# ---------------------------------------------------------------------------
# close-genome peg singleton kmers
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("k",))
def _flat_kmers(codes, lengths_bcast, pos_in_seq, k: int):
    """Packed kmers + peg-path validity over a flat protein token stream:
    Q1 (drop the final kmer: pos < len - k, strict) and Q2 peg path
    ('X'-only rejection — KmerReference.java:134-139)."""
    from ..ops.encode import PROT_X
    from ..ops.kmers import window_any
    lo, hi = pack_kmer_windows(codes, k)
    bad = (codes == PROT_X) | (codes >= PROT_PAD)
    has_bad = window_any(bad, k)
    valid = (pos_in_seq < lengths_bcast - k) & ~has_bad
    return lo, hi, valid


def peg_singleton_kmers(genome: Genome, k: int = 8):
    """Unique peg kmers of a genome: (lo, hi, peg_index) arrays plus the
    peg list (Q5 — only kmers occurring exactly once genome-wide)."""
    pegs = [f for f in genome.pegs if f.protein_translation]
    if not pegs:
        return (np.zeros(0, np.uint32), np.zeros(0, np.uint32),
                np.zeros(0, np.int32), pegs)
    proteins = [f.protein_translation for f in pegs]
    lengths = np.array([len(p) for p in proteins], np.int64)
    total = int(lengths.sum())
    width = _bucket(total, 4096)
    got = native.flat_peg_batch(proteins, width, -1)
    if got is not None:  # C++ data loader (kan_host.cpp)
        codes, peg_of, pos_in_seq, len_bcast = got
    else:
        codes = np.full(width, PROT_PAD, np.uint8)
        peg_of = np.full(width, -1, np.int32)
        len_bcast = np.zeros(width, np.int32)
        pos_in_seq = np.zeros(width, np.int32)
        pos = 0
        for i, f in enumerate(pegs):
            ln = lengths[i]
            codes[pos: pos + ln] = encode_protein(f.protein_translation)
            peg_of[pos: pos + ln] = i
            len_bcast[pos: pos + ln] = ln
            pos_in_seq[pos: pos + ln] = np.arange(ln)
            pos += ln
    if native.available():
        # host fast path: vectorized NumPy pack + C++ group-by — no
        # device round-trips (Q1 strict drop-last, Q2 'X'-only rejection)
        from ..ops.encode import PROT_X
        from .signature import pack_kmers_np
        lo, hi = pack_kmers_np(codes, k)
        nw = len(lo)
        bad = (codes == PROT_X) | (codes >= PROT_PAD)
        has_bad = np.zeros(nw, bool)
        for j in range(k):
            has_bad |= bad[j: j + nw]
        valid = ((pos_in_seq[:nw] < len_bcast[:nw] - k) & ~has_bad)
        lo, hi, peg_idx = lo[valid], hi[valid], peg_of[:nw][valid]
        order, ustarts = native.groupby(lo, hi)
        counts = np.diff(np.append(ustarts, len(lo)))
        sel = order[ustarts[counts == 1]]
        return lo[sel], hi[sel], peg_idx[sel], pegs

    lo, hi, valid = _flat_kmers(jnp.asarray(codes), jnp.asarray(len_bcast),
                                jnp.asarray(pos_in_seq), k)
    valid = np.asarray(valid)
    lo = np.asarray(lo)[valid]
    hi = np.asarray(hi)[valid]
    peg_idx = peg_of[valid]

    # singletons via device sort group-by
    slo, shi, spay, first, seg, counts = _sort_with_payload(
        jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(peg_idx))
    first = np.asarray(first)
    counts = np.asarray(counts)
    starts = np.flatnonzero(first)
    singles = counts[: len(starts)] == 1
    sel = starts[singles]
    return (np.asarray(slo)[sel], np.asarray(shi)[sel],
            np.asarray(spay)[sel], pegs)


# ---------------------------------------------------------------------------
# the annotator
# ---------------------------------------------------------------------------

class _PegInfo(NamedTuple):
    """The slice of a close-genome Feature the window scan needs (kept
    in the device-table cache instead of whole Genome objects)."""

    id: str
    function: str
    protein_length: int


class ProjectionAnnotator:
    """Annotates genomes by projecting close-genome proteins onto ORFs."""

    def __init__(self, min_strength: float = 0.50, max_fuzz: float = 1.5,
                 min_fuzz: float = 0.8, max_genomes: int = 10,
                 min_evidence: int = 10, k: int = 8,
                 algorithm: str = "AGGRESSIVE",
                 trace_function: str | None = None,
                 engine: str = "auto",
                 table_cache_bytes: int = 4 << 30):
        if engine not in ("auto", "device", "host"):
            raise ValueError(f"unknown projection engine {engine!r}")
        if min_strength >= 1.0:
            raise ValueError("Minimum strength must be less than 1.")
        if max_fuzz <= 1.0:
            raise ValueError("Max length factor must be greater than 1.")
        if min_fuzz > 1.0:
            raise ValueError(
                "Min length factor must be less than or equal to 1.")
        self.min_strength = min_strength
        self.max_fuzz = max_fuzz
        self.min_fuzz = min_fuzz
        self.max_genomes = max_genomes
        self.min_evidence = min_evidence
        self.k = k
        self.strict = algorithm.upper() == "STRICT"
        self.trace_function = trace_function
        self.engine = engine
        self.table_cache_bytes = table_cache_bytes
        self._table_cache: "OrderedDict[tuple, tuple]" = OrderedDict()

    def _use_stream_index(self) -> bool:
        """Device stream path on accelerators; host index on plain CPU
        (where the interpreter-mode Pallas scan would dominate)."""
        if self.engine != "auto":
            return self.engine == "device"
        return jax.default_backend() != "cpu"

    def annotate_genome(self, genome: Genome, close_loader) -> dict:
        """Annotate in place; close_loader(genome_id) → Genome | None.

        Returns the proposal statistics dict.
        """
        k = self.k
        log.info("Annotating proposed genome %s: %s", genome.id, genome.name)
        real_strength = self.min_strength / 3          # Q3
        proposals = PegProposalList(genome, real_strength,
                                    self.min_evidence)
        if self._use_stream_index():
            index = StreamWindowIndex.build(genome, k, strict=self.strict)
            log.info("%d kmer windows found in genome.", index.n_windows)
        else:
            index = ContigKmerIndex.build(genome, k, strict=self.strict)
            log.info("%d kmers found in genome.", index.n_unique)
        close = genome.close_genomes
        log.info("%d close genomes available from input.", len(close))
        i_genome = 1
        loaded = []
        for cg in close:
            if i_genome > self.max_genomes:
                break
            log.info("Retrieving close genome #%d %s: %s.", i_genome,
                     cg.genome_id, cg.genome_name)
            old_genome = close_loader(cg.genome_id)
            if old_genome is None:
                log.warning("Genome %s not found-- skipping.", cg.genome_id)
                continue
            i_genome += 1
            loaded.append(old_genome)
        if isinstance(index, StreamWindowIndex):
            self._project_all_stream(loaded, index, proposals)
        else:
            for old_genome in loaded:
                self._project_from(old_genome, index, proposals)
        log.info("%d proposals made, %d merged, %d rejected, %d too weak, "
                 "%d too little evidence, %d kept.", proposals.made,
                 proposals.merged, proposals.rejected, proposals.weak,
                 proposals.small, proposals.count)
        # emit features in numbering order (Q8)
        peg_count = 0
        xlator = DnaTranslator(genome.genetic_code)
        for prop in proposals:
            peg_count += 1
            self._make_feature(prop, genome, peg_count, xlator)
        log.info("Processing complete. %d features in genome.", peg_count)
        return {
            "made": proposals.made, "merged": proposals.merged,
            "rejected": proposals.rejected, "weak": proposals.weak,
            "small": proposals.small, "kept": proposals.count,
            "pegs": peg_count,
        }

    # ----- per close genome -----

    # ----- close-genome singleton tables (device-resident, cached) -----

    def _close_table(self, old_genome: Genome):
        """Device singleton table for one close genome, LRU-cached by
        (genome id, k).

        The reference recounts peg kmers per (new genome x close genome)
        pair (KmerProcessor.java:195); a batch run reuses the same ~10
        close genomes for every input genome, so memoizing the built
        table removes both the singleton recount AND the host-to-device
        push from the steady state (semantically identical: the table
        depends only on the close genome, and transfers -- not compute --
        dominate this path on a tunneled device).
        """
        key = (old_genome.id, self.k)
        got = self._table_cache.get(key)
        if got is not None:
            self._table_cache.move_to_end(key)
            return got
        lo, hi, peg_idx, pegs = peg_singleton_kmers(old_genome, self.k)
        peg_info = [_PegInfo(f.id, f.function, f.protein_length)
                    for f in pegs]
        n = len(lo)
        if n == 0:
            got = (None, 0, None, 0, peg_info)
        else:
            n_pad = _bucket(n, 4096)
            s_lo = np.full(n_pad, 0xFFFFFFFF, np.uint32)
            s_hi = np.full(n_pad, 0xFFFFFFFF, np.uint32)
            s_peg = np.zeros(n_pad, np.uint32)
            s_lo[:n] = lo
            s_hi[:n] = hi
            s_peg[:n] = peg_idx
            d_args = (jnp.asarray(s_lo), jnp.asarray(s_hi),
                      jnp.asarray(s_peg))
            n_rows = wide_rows_for(n_pad)
            if n_rows is not None:
                # wide-bucket layout: rows stay in the fast-gather zone
                # and every stream lookup is ONE row gather
                table, bad = _build_singleton_wide(*d_args, n_rows)
                if bool(bad):
                    # one-in-hundreds salt failure: host salt-retry build
                    log.info("device wide build of %d keys overflowed; "
                             "host salt-retry build", n)
                    htab, hsalt, hmp = build_wide_table(
                        lo, hi, peg_idx.astype(np.uint32))
                    got = (jnp.asarray(htab), hmp, hsalt, n, peg_info)
                else:
                    got = (table, 1, 0, n, peg_info)
            else:
                # huge singleton set: 8-slot bucketed device build
                table, bad = _build_singleton_table(
                    *d_args, device_table_buckets(n_pad))
                if bool(bad):
                    log.warning("device singleton-table build overflowed "
                                "(%d keys); using the host build", n)
                    htable, mp = build_table(lo, hi,
                                             peg_idx.astype(np.uint32))
                    got = (jnp.asarray(htable), mp, None, n, peg_info)
                else:
                    got = (table, MAX_DEVICE_PROBES, None, n, peg_info)
        self._table_cache[key] = got
        total = sum(e[0].nbytes for e in self._table_cache.values()
                    if e[0] is not None)
        while total > self.table_cache_bytes and len(self._table_cache) > 1:
            _, e = self._table_cache.popitem(last=False)
            if e[0] is not None:
                total -= e[0].nbytes
        return got

    def _project_all_stream(self, olds: list, index: StreamWindowIndex,
                            proposals: PegProposalList) -> None:
        """Project every close genome through ONE multi-table device call
        (_probe_rle_multi) against the cached singleton tables, then
        expand RLE hits and scan/propose per genome in order -- proposal
        insertion order matches the sequential reference loop
        (KmerProcessor.java:183-270) exactly."""
        n_stream = index.d_lo.shape[0]
        entries = [self._close_table(og) for og in olds]
        for og, entry in zip(olds, entries):
            log.info("%d unique peg kmers in %s.", entry[3], og.id)
        live = [e for e in entries if e[0] is not None]
        if not live:
            return
        max_single = max(e[3] for e in live)
        # clamp to the TRUE stream length, not its power-of-two bucket:
        # n_stream can be 3·2^(m-1)·8192 and a pow2 clamp could exceed
        # it, tripping the shape guard in _rle_body (ADVICE r4)
        cap = min(_bucket(2 * max_single + 4096, 1 << 14), n_stream)
        rcap = min(_bucket(max(max_single // 8, 1), 1 << 14), cap)
        tables = tuple(e[0] for e in live)
        meta = tuple((e[1], e[2]) for e in live)
        while True:
            starts_b, pegs_b, lens_b, n_runs_d, n_hits_d = _probe_rle_multi(
                tables, index.d_lo, index.d_hi, index.d_valid,
                cap=cap, rcap=rcap, meta=meta)
            n_hits_a = np.asarray(n_hits_d)
            n_runs_a = np.asarray(n_runs_d)
            if int(n_hits_a.max()) <= cap and int(n_runs_a.max()) <= rcap:
                break
            cap = min(max(cap * 2, _bucket(int(n_hits_a.max()), 1 << 14)),
                      n_stream)
            rcap = min(max(rcap * 2,
                           _bucket(max(int(n_runs_a.max()), 1), 1 << 14)),
                       cap)
        starts_all = np.asarray(starts_b)          # (G, rcap): ONE pull
        pegs_all = np.asarray(pegs_b)
        lens_all = np.asarray(lens_b)
        for j, (_, _, _, _, peg_info) in enumerate(live):
            n_hits = int(n_hits_a[j])
            n_runs = int(n_runs_a[j])
            log.info("%d matching kmers found.", n_hits)
            if n_hits == 0:
                continue
            starts = starts_all[j, :n_runs].astype(np.int64)
            lens = lens_all[j, :n_runs].astype(np.int64)
            run_peg = pegs_all[j, :n_runs]
            base = np.repeat(np.cumsum(lens) - lens, lens)
            pos = np.repeat(starts, lens) + np.arange(n_hits) - base
            pair_peg = np.repeat(run_peg, lens).astype(np.int32)
            l_contig, l_strand, l_left = index.locate(pos)
            self._scan_and_propose(l_contig, l_strand, l_left, pair_peg,
                                   peg_info, index.contig_ids, proposals)

    def _project_from(self, old_genome: Genome, index: ContigKmerIndex,
                      proposals: PegProposalList) -> None:
        k = self.k
        lo, hi, peg_idx, pegs = peg_singleton_kmers(old_genome, k)
        log.info("%d unique peg kmers in %s.", len(lo), old_genome.id)
        if not len(lo):
            return
        got = self._match_host_index(index, lo, hi, peg_idx)
        if got is None:
            return
        l_contig, l_strand, l_left, pair_peg = got
        log.info("%d matching kmers found.", len(l_left))
        self._scan_and_propose(l_contig, l_strand, l_left, pair_peg,
                               pegs, index.contig_ids, proposals)

    def _match_host_index(self, index: ContigKmerIndex, lo, hi, peg_idx):
        """Probe singletons into the host contig index + CSR expansion."""
        ranks = np.asarray(probe_table(
            index.table, jnp.asarray(lo), jnp.asarray(hi),
            jnp.ones(len(lo), bool), index.max_probes))
        hit = ranks >= 0
        ranks = ranks[hit]
        peg_hit = peg_idx[hit]
        if not len(ranks):
            return None
        # CSR expansion: each (peg, rank) pair fans out to counts[rank] locs
        counts = index.counts[ranks]
        starts = index.starts[ranks]
        total = int(counts.sum())
        offs = np.arange(total) - np.repeat(np.cumsum(counts) - counts,
                                            counts)
        loc_idx = np.repeat(starts, counts) + offs
        pair_peg = np.repeat(peg_hit, counts)
        return (index.loc_contig[loc_idx], index.loc_strand[loc_idx],
                index.loc_left[loc_idx], pair_peg)

    def _scan_and_propose(self, l_contig, l_strand, l_left, pair_peg,
                          pegs, contig_ids, proposals) -> None:
        """Shared window-scan tail (Q6/Q7): identical for both match
        paths — the (frame, peg, contig, left) sort fully determines
        candidate order, so the pair source order never matters."""
        k = self.k
        l_right = l_left + 3 * k - 1                 # Q4: span 3K bases

        # frame of each location: '+' → P(left%3), '-' → M(right%3)
        frame = np.where(l_strand == 0, 3 + l_left % 3, l_right % 3)
        # group by (frame, peg): matches FramedLocationLists bucketing.
        # A single packed-key argsort is ~2-3× faster than the 4-key
        # lexsort; fall back when the packed key would not fit 63 bits.
        bits_peg = max(int(pair_peg.max(initial=0)), 1).bit_length()
        bits_con = max(int(l_contig.max(initial=0)), 1).bit_length()
        bits_left = max(int(l_left.max(initial=0)), 1).bit_length()
        if 3 + bits_peg + bits_con + bits_left <= 63:
            key = (((frame.astype(np.int64) << bits_peg
                     | pair_peg) << bits_con | l_contig)
                   << bits_left) | l_left
            order = np.argsort(key, kind="stable")
        else:
            order = np.lexsort((l_left, l_contig, pair_peg, frame))
        g_frame = frame[order]
        g_peg = pair_peg[order]
        boundary = np.flatnonzero(
            (g_frame[1:] != g_frame[:-1]) | (g_peg[1:] != g_peg[:-1]))
        group_starts = np.concatenate([[0], boundary + 1])
        group_ends = np.concatenate([boundary + 1, [len(order)]])

        # ---- vectorized window scan (Q6, KmerProcessor.java:240-254) ----
        # Group rows are sorted by (contig, left) and every location spans
        # exactly 3K-1 bases, so within a (group, contig) run the rights are
        # monotone: each start's evidence window [i+1, ub) is contiguous and
        # ub comes from ONE global searchsorted, its best edge is rights[ub-1].
        # This turns the reference's O(n^2) per-frame scan into O(n log n)
        # over all groups at once, preserving candidate order exactly.
        m = len(order)
        s_contig = l_contig[order]
        s_left = l_left[order].astype(np.int64)
        s_right = l_right[order].astype(np.int64)
        group_id = np.zeros(m, np.int64)
        group_id[group_starts[1:]] = 1
        group_id = np.cumsum(group_id)
        run_first = np.ones(m, bool)
        run_first[1:] = ((group_id[1:] != group_id[:-1])
                         | (s_contig[1:] != s_contig[:-1]))
        run_id = np.cumsum(run_first) - 1

        n_groups = len(group_starts)
        sizes = group_ends - group_starts
        plen3 = np.fromiter((p.protein_length for p in pegs),
                            np.int64, len(pegs)) * 3
        peg_lens = plen3[g_peg[group_starts]]
        max_lens = (peg_lens * self.max_fuzz + 1).astype(np.int64)
        min_lens = (peg_lens * self.min_fuzz).astype(np.int64)
        min_kmers = (peg_lens * (self.min_strength / 3)).astype(np.int64)
        group_ok = min_kmers <= sizes
        pegs_found = n_groups
        low_kmer = int((~group_ok).sum())

        # per-element candidacy: i_local <= size - min_kmers, group viable
        i_local = np.arange(m) - np.repeat(group_starts, sizes)
        cand = group_ok[group_id] & (
            i_local <= (sizes - min_kmers)[group_id])
        # segmented searchsorted via run-offset keys (contig edges < 2^34)
        OFF = np.int64(1) << 40
        keys = run_id * OFF + s_right
        max_edge = s_left + max_lens[group_id]
        ub = np.searchsorted(keys, run_id * OFF + max_edge, side="left")
        evidence_v = np.maximum(ub - np.arange(m) - 1, 0) + 1
        best_edge_v = s_right[np.maximum(ub - 1, np.arange(m))]
        min_edge = s_left + min_lens[group_id]
        short = cand & (best_edge_v < min_edge)
        too_short = int(short.sum())
        live = np.flatnonzero(cand & ~short)

        proposal_count = len(live)
        # one vectorized extend+filter+dedup pass over all live candidates
        # (counter- and result-identical to per-candidate propose calls)
        cand_peg = g_peg[group_starts][group_id[live]]
        peg_funcs = [f.function for f in pegs]
        stored = proposals.propose_batch(
            s_contig[live].astype(np.int64), contig_ids,
            l_strand[order[live]].astype(np.int64),
            s_left[live], best_edge_v[live], evidence_v[live],
            cand_peg, peg_funcs)
        if self.trace_function is not None:
            for ci, prop in stored:
                if prop.function != self.trace_function:
                    continue
                gi = live[ci]
                peg = pegs[cand_peg[ci]]
                whole = Location(contig_ids[int(s_contig[gi])],
                                 "+" if l_strand[order[gi]] == 0 else "-",
                                 int(s_left[gi]), int(best_edge_v[gi]))
                log.info("Proposal stored using %s at location %s with "
                         "evidence %d and strength %s.", peg.id, whole,
                         int(evidence_v[gi]), prop.strength)
        log.info("%d peg/frame pairs examined, %d had too few kmers, "
                 "%d were too short, %d proposals were made.",
                 pegs_found, low_kmer, too_short, proposal_count)

    # ----- feature emission (Q8) -----

    @staticmethod
    def _make_feature(proposal, genome: Genome, peg_num: int,
                      xlator: DnaTranslator) -> None:
        fid = f"fig|{genome.id}.peg.{peg_num}"
        loc = proposal.loc
        feat = Feature.create(fid, proposal.function, loc.contig_id,
                              loc.strand, loc.left, loc.right)
        dna = genome.get_dna(loc)
        prot = xlator.peg_translate(dna, 1, len(dna) - 3)
        feat.protein_translation = prot
        feat.add_annotation(
            "Annotated with evidence %d and strength %2.4f"
            % (proposal.evidence, proposal.strength), TOOL_NAME)
        feat.add_annotation("Set function to " + proposal.function,
                            TOOL_NAME)
        genome.add_feature(feat)
