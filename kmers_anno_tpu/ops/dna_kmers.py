"""Nucleotide k-mer window packing and validity masks (device + host).

DNA-mode annotation (BASELINE config 3: "k=15 nucleotide kmers on raw
contigs, strand-aware extraction") packs each k-mer into 2 bits/base —
t,c,a,g → 0..3 (the ops.encode DNA code order) — plus a **marker bit at
position 2k**, all inside the ``lo`` key word:

    lo = (1 << 2k) | sum(base[i] << 2i),   hi = 0

The marker bit makes the packing collision-free against the hash-table
conventions shared with the protein path (ops.hashtable):

* ``lo`` < 2^31 for k ≤ 15, so a packed DNA key can never equal the EMPTY
  slot sentinel (0xFFFFFFFF) — a poly-G 16-mer *would*, which is why K is
  capped at 15 here;
* the top two bits of ``lo`` are never both set, preserving the routed-mesh
  padding invariant (parallel/mesh.py);
* keys of different k never compare equal (different marker position).

Two k-mers are equal iff their (lo, hi) pairs are equal — bit-identical to
nucleotide string equality, so the same bucketed open-addressing table,
probe kernel, vote reducers and all_to_all routing serve both alphabets.

The reference has no DNA-mode engine (its build/apply are protein-only,
BuildKmerProcessor.java:137-223); strand handling follows the contig
extractor's both-strand convention (KmerReference.java:157-203): the
reverse complement in code space is ``code XOR 2``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .encode import DNA_AMBIG

DNA_MIN_K = 4
DNA_MAX_K = 15


def _check_k(k: int) -> None:
    if not DNA_MIN_K <= k <= DNA_MAX_K:
        raise ValueError(
            f"DNA kmer size {k} outside supported range "
            f"{DNA_MIN_K}..{DNA_MAX_K} (2-bit packing + marker bit)")


def pack_dna_windows(codes: jnp.ndarray, k: int
                     ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pack every length-k window of a DNA-code array (device).

    codes: (..., L) uint8 — 2-bit-safe only where codes < 4; windows
    touching ambiguous bases must be masked off via ``dna_valid_mask``.
    returns (lo, hi): (..., L) uint32 — position i packs codes[i : i+k];
    hi is all zeros (kept for hash/probe API compatibility).
    """
    _check_k(k)
    length = codes.shape[-1]
    c = (codes & jnp.uint8(3)).astype(jnp.uint32)
    pad = jnp.zeros(codes.shape[:-1] + (k,), jnp.uint32)
    cp = jnp.concatenate([c, pad], axis=-1)
    lo = jnp.full(codes.shape, jnp.uint32(1 << (2 * k)))
    for j in range(k):
        lo = lo | (cp[..., j: j + length] << jnp.uint32(2 * j))
    return lo, jnp.zeros_like(lo)


def pack_dna_np(codes: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Host mirror of pack_dna_windows over all L-k+1 full windows.

    codes: (L,) uint8 DNA codes; returns (lo, hi): (L-k+1,) uint32 each,
    bit-identical to the device packing.  Windows containing ambiguous
    bases are still packed (codes folded & 3); filter with
    ``dna_valid_np`` before use.
    """
    _check_k(k)
    n = len(codes) - k + 1
    if n <= 0:
        z = np.zeros(0, np.uint32)
        return z, z
    lo = np.full(n, np.uint32(1 << (2 * k)), np.uint32)
    c = (codes & np.uint8(3)).astype(np.uint32)
    for j in range(k):
        lo |= c[j: j + n] << np.uint32(2 * j)
    return lo, np.zeros(n, np.uint32)


def unpack_dna_np(lo: np.ndarray, hi: np.ndarray, k: int) -> np.ndarray:
    """Inverse of pack_dna_np: (N,) lo → (N, k) uint8 DNA codes."""
    _check_k(k)
    n = len(lo)
    out = np.zeros((n, k), np.uint8)
    for j in range(k):
        out[:, j] = (np.asarray(lo, np.uint32) >> np.uint32(2 * j)) & 3
    return out


def dna_valid_np(codes: np.ndarray, k: int) -> np.ndarray:
    """Host validity of each full window start: True iff no ambiguous/pad
    base in codes[i : i+k].  Returns (L-k+1,) bool."""
    n = len(codes) - k + 1
    if n <= 0:
        return np.zeros(0, bool)
    bad = np.concatenate([[0], np.cumsum(codes >= DNA_AMBIG)])
    return (bad[k:] - bad[:-k][: n]) == 0


def dna_valid_mask(codes: jnp.ndarray, lengths: jnp.ndarray, k: int
                   ) -> jnp.ndarray:
    """Device validity of each window start position.

    codes:   (..., L) uint8 DNA codes
    lengths: (...,) int32 true sequence lengths
    No Q1 drop-last quirk: DNA mode is a north-star extension, not a
    reference behavior, so all L-k+1 windows count.
    """
    length = codes.shape[-1]
    bad = (codes >= DNA_AMBIG).astype(jnp.int32)
    cs = jnp.cumsum(bad, axis=-1)
    zero = jnp.zeros(codes.shape[:-1] + (1,), jnp.int32)
    cs = jnp.concatenate([zero, cs], axis=-1)
    # bad count in window [i, i+k) = cs[i+k] - cs[i]; windows reading past
    # L are bounded by the in_range test below
    pad = jnp.broadcast_to(cs[..., -1:], codes.shape[:-1] + (k,))
    cse = jnp.concatenate([cs, pad], axis=-1)
    win_bad = cse[..., k: k + length] - cse[..., :length]
    pos = jnp.arange(length, dtype=jnp.int32)
    in_range = pos <= (lengths[..., None] - k)
    return in_range & (win_bad == 0)


def reverse_complement_device(codes: jnp.ndarray) -> jnp.ndarray:
    """Reverse complement in code space (device): complement = code ^ 2
    for unambiguous codes, ambiguity/pad preserved; order reversed."""
    comp = jnp.where(codes < 4, codes ^ 2, codes)
    return jnp.flip(comp, axis=-1)
