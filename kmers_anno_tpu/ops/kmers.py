"""K-mer window packing and validity masks (device).

A protein k-mer is identified by its *text* (KmerReference.java:76-102), so
kmers are packed losslessly: 5 bits per character, chars 0..5 in a ``lo``
uint32 word and chars 6..11 in ``hi`` (K ≤ 12).  Two kmers are equal iff
their (lo, hi) pairs are equal — bit-identical to string equality.

Validity masks encode the reference's exact drop rules (SURVEY.md §2c):

* Q1 — the in-repo extractors drop the final possible kmer (loop bound
  ``i < len - K``, KmerReference.java:134-136, 186-187); the external
  ProteinKmers iterator used by build/apply is assumed to keep it
  (``drop_last`` parameter selects the behavior).
* Q2 — peg kmers reject only 'X' (code 23); contig-frame kmers reject 'X'
  and '*' (codes 23, 26).
"""

from __future__ import annotations

import jax.numpy as jnp

from .encode import PROT_PAD, PROT_STOP, PROT_X

MAX_K = 12


def pack_kmer_windows(codes: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pack every length-k window of a protein-code array.

    codes: (..., L) uint8
    returns (lo, hi): (..., L) uint32 — position i packs codes[i : i+k]
    (positions past L-k wrap in padding garbage; mask with a validity mask).
    """
    if k > MAX_K:
        raise ValueError(f"kmer size {k} > {MAX_K} not supported by 2x32-bit packing")
    length = codes.shape[-1]
    c = codes.astype(jnp.uint32)
    pad = jnp.full(codes.shape[:-1] + (k,), PROT_PAD, jnp.uint32)
    cp = jnp.concatenate([c, pad], axis=-1)
    lo = jnp.zeros(codes.shape, jnp.uint32)
    hi = jnp.zeros(codes.shape, jnp.uint32)
    for j in range(k):
        w = cp[..., j: j + length]
        if j < 6:
            lo = lo | (w << (5 * j))
        else:
            hi = hi | (w << (5 * (j - 6)))
    return lo, hi


def window_any(flags: jnp.ndarray, k: int) -> jnp.ndarray:
    """OR-reduce each length-k window: out[i] = any(flags[i : i+k])."""
    length = flags.shape[-1]
    pad = jnp.zeros(flags.shape[:-1] + (k,), jnp.bool_)
    fp = jnp.concatenate([flags, pad], axis=-1)
    out = jnp.zeros(flags.shape, jnp.bool_)
    for j in range(k):
        out = out | fp[..., j: j + length]
    return out


def kmer_valid_mask(codes: jnp.ndarray, lengths: jnp.ndarray, k: int,
                    reject_stop: bool, drop_last: bool) -> jnp.ndarray:
    """Validity of each kmer start position.

    codes:   (..., L) uint8 protein codes
    lengths: (...,) int32 true sequence lengths
    reject_stop: True for the contig path (Q2: 'X' and '*'), False for the
                 peg path ('X' only)
    drop_last:   True for the in-repo extractors (Q1: last kmer dropped)
    """
    length = codes.shape[-1]
    bad = codes == PROT_X
    if reject_stop:
        bad = bad | (codes == PROT_STOP)
    bad = bad | (codes >= PROT_PAD)
    has_bad = window_any(bad, k)
    pos = jnp.arange(length, dtype=jnp.int32)
    limit = lengths[..., None] - k
    in_range = pos < limit if drop_last else pos <= limit
    return in_range & ~has_bad
