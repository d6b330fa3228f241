"""Device 6-frame contig k-mer extraction (KmerReference.getContigKmers,
KmerReference.java:157-203).

The reference translates each strand frame by frame through per-codon string
loops and inserts every kmer substring into a HashMap.  Here the whole
contig is translated at every codon start in one LUT gather
(ops.translate.sliding_translate), the three frame proteins are stride-3
slices, and kmers are packed/validated as vectorized windows — one jitted
program per padded contig width.

Semantics preserved exactly:

* Q1 — the final possible kmer of each frame protein is dropped
  (loop bound ``i < frameLen - K``, KmerReference.java:186-187);
* Q2 — kmers containing 'X' or '*' are rejected (KmerReference.java:190);
* coordinates — plus-strand left = pos*3 + frame (1-based frame 1..3,
  KmerPosition.java:60-62); minus-strand left = (contigLen − 3K + 2) −
  (pos*3 + frame) (KmerPosition.java:78-86, Q11); every location spans
  3K bases (Q4).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .encode import DNA_PAD, encode_dna
from .kmers import kmer_valid_mask, pack_kmer_windows
from .translate import codon_lut, sliding_translate


def _bucket_width(n: int, minimum: int = 4096) -> int:
    n = max(n, minimum)
    return 1 << (n - 1).bit_length()


@partial(jax.jit, static_argnames=("k",))
def _strand_frame_kmers(dna_codes, length, k: int, lut):
    """All frame kmers of ONE strand sequence (already in reading order).

    dna_codes: (W,) uint8 padded with DNA_PAD; length: true length scalar.
    returns per frame f∈{0,1,2} (stacked axis 0, shape (3, FW)):
      lo, hi   — packed kmer keys at frame-protein position p
      valid    — Q1/Q2 validity
    FW = (W - 2) // 3 + 1 positions per frame (padded).
    """
    aa = sliding_translate(dna_codes, lut)           # (W-2,)
    n_aa = aa.shape[0]
    fw = (n_aa + 2) // 3
    los, his, valids = [], [], []
    for f in range(3):
        prot = aa[f::3]
        prot = jnp.pad(prot, (0, fw - prot.shape[0]), constant_values=31)
        # frame protein true length: floor((L - f) / 3)
        flen = jnp.maximum((length - f) // 3, 0)
        lo, hi = pack_kmer_windows(prot, k)
        valid = kmer_valid_mask(prot, flen, k, reject_stop=True,
                                drop_last=True)
        los.append(lo)
        his.append(hi)
        valids.append(valid)
    return jnp.stack(los), jnp.stack(his), jnp.stack(valids)


def _use_pallas() -> bool:
    """Fused Pallas scanner on real TPUs; XLA elsewhere (KAN_PALLAS=1/0
    overrides)."""
    import os
    flag = os.environ.get("KAN_PALLAS")
    if flag in ("0", "1"):
        return flag == "1"
    import jax
    return jax.default_backend() not in ("cpu",)


def extract_contig_kmers_fused(contig_seq: str, k: int, gc: int,
                               interpret: bool = False):
    """extract_contig_kmers via the fused Pallas scanner
    (ops.pallas_contig) — identical output set, base-major order."""
    from .pallas_contig import strand_kmers_pallas

    codes = encode_dna(contig_seq)
    length = len(codes)
    rc_codes = np.where(codes < 4, codes ^ 2, codes)[::-1].copy()
    out_lo, out_hi, out_left, out_strand = [], [], [], []
    for strand, seq in ((0, codes), (1, rc_codes)):
        lo, hi, bad = strand_kmers_pallas(seq, k, gc, interpret=interpret)
        p = np.arange(len(lo), dtype=np.int64)
        f = p % 3                       # 0-based frame
        flen = (length - f) // 3        # frame protein length
        valid = ((p // 3) < flen - k) & ~bad        # Q1 strict drop-last
        v = np.flatnonzero(valid)
        # KmerPosition: plus left = pos*3 + frame1 = p + 1 (Java 60-62);
        # minus left = (L - 3K + 2) - (p + 1) (Java 78-86, Q11)
        left = v + 1 if strand == 0 else (length - 3 * k + 1) - v
        out_lo.append(lo[v])
        out_hi.append(hi[v])
        out_left.append(left.astype(np.int32))
        out_strand.append(np.full(len(v), strand, np.int8))
    return {
        "lo": np.concatenate(out_lo),
        "hi": np.concatenate(out_hi),
        "left": np.concatenate(out_left),
        "strand": np.concatenate(out_strand),
    }


def extract_contig_kmers(contig_seq: str, k: int, gc: int):
    """All valid (kmer, left, strand) tuples of one contig, both strands.

    returns dict with np arrays lo, hi, left (1-based), strand ('+'=0,
    '-'=1), all shape (N,).
    """
    if _use_pallas():
        import jax
        return extract_contig_kmers_fused(
            contig_seq, k, gc, interpret=jax.default_backend() == "cpu")
    codes = encode_dna(contig_seq)
    length = len(codes)
    width = _bucket_width(length)
    padded = np.full(width, DNA_PAD, np.uint8)
    padded[:length] = codes
    # minus strand: reverse complement in code space
    rc = np.full(width, DNA_PAD, np.uint8)
    rc_codes = np.where(codes < 4, codes ^ 2, codes)[::-1]
    rc[:length] = rc_codes
    lut = jnp.asarray(codon_lut(gc))
    d_len = jnp.int32(length)

    out_lo, out_hi, out_left, out_strand = [], [], [], []
    for strand, seq in ((0, padded), (1, rc)):
        lo, hi, valid = _strand_frame_kmers(jnp.asarray(seq), d_len, k, lut)
        lo = np.asarray(lo)
        hi = np.asarray(hi)
        valid = np.asarray(valid)
        fw = lo.shape[1]
        pos = np.arange(fw, dtype=np.int64)
        for f in range(3):
            v = valid[f]
            p = pos[v]
            # KmerPosition: frame argument is 1-based
            if strand == 0:
                left = p * 3 + (f + 1)
            else:
                left = (length - 3 * k + 2) - (p * 3 + (f + 1))
            out_lo.append(lo[f][v])
            out_hi.append(hi[f][v])
            out_left.append(left.astype(np.int32))
            out_strand.append(np.full(v.sum(), strand, np.int8))
    return {
        "lo": np.concatenate(out_lo),
        "hi": np.concatenate(out_hi),
        "left": np.concatenate(out_left),
        "strand": np.concatenate(out_strand),
    }
