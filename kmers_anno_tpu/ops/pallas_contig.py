"""Fused Pallas contig scanner: codon LUT translate + k-mer pack, one pass.

The 6-frame contig extraction (KmerReference.java:157-203) is the hot op of
the ORF-projection engine (~2 kmers per base, megabases per genome).  The
XLA path (ops.contig_kmers) runs it as a chain of elementwise ops per
strand-frame; this kernel fuses the whole strand — codon index, genetic-code
LUT, k-mer window packing, ambiguity mask — into ONE VMEM pass at *base*
granularity, so the sliding translation and the k shifted window reads never
round-trip through HBM.

Mosaic building blocks (all verified to lower on TPU v5e):

* halo'd blocks via manual HBM→VMEM DMA (`make_async_copy` + `pl.ds`) —
  BlockSpec index maps are block-granular, so overlapping reads need
  explicit copies;
* element shifts across the (rows, 128) tile layout from `pltpu.roll`
  (lane roll) + a two-row lane select — Mosaic has no misaligned reshape;
* the 64-entry codon LUT via `jnp.take_along_axis` along lanes (the only
  dynamic gather Mosaic supports: per-lane indices < 128).

Base-granularity output: position p of a strand holds the k-mer whose
amino acids sit at codon starts p, p+3, …, p+3(k-1):

    lo/hi[p] = packed 5-bit AA codes           (== ops.kmers packing)
    bad[p]   = any AA in the window is 'X'/'*'/ambiguous

Frame/position bookkeeping (Q1 drop-last, KmerPosition left-edge math) is
plain vectorized NumPy in the caller — p is frame (p%3), frame position
(p//3), so plus-strand left is simply p+1 (KmerPosition.java:60-62).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .encode import PROT_PAD, PROT_STOP, PROT_X
from .translate import codon_lut

LANES = 128
ROWS = 64               # output rows per grid step (64*128 = 8192 bases)
HALO_ROWS = 2           # covers max shift 3*(k-1)+2 ≤ 35 for k ≤ 12


def _shift2d(x, s: int, rows: int):
    """y[r, l] = flat(x)[r*128 + l + s] — static element shift over the
    tiled layout (roll + two-row lane select)."""
    q, p = divmod(s, LANES)
    if p == 0:
        return x[q: q + rows]
    rolled = pltpu.roll(x, shift=LANES - p, axis=1)
    a = rolled[q: q + rows]
    b = rolled[q + 1: q + 1 + rows]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    return jnp.where(lane < LANES - p, a, b)


def _kernel(k: int, dna_hbm, lut_ref, lo_ref, hi_ref, bad_ref):
    i = pl.program_id(0)

    def body(scratch, sem):
        dma = pltpu.make_async_copy(
            dna_hbm.at[pl.ds(i * ROWS, ROWS + HALO_ROWS)], scratch, sem)
        dma.start()
        dma.wait()
        x = scratch[:]
        # sliding translation on ROWS+1 rows so kmer shifts stay in-block
        ext = ROWS + 1
        c0 = x[:ext]
        c1 = _shift2d(x, 1, ext)
        c2 = _shift2d(x, 2, ext)
        amb = (c0 > 3) | (c1 > 3) | (c2 > 3)
        idx = jnp.where(amb, 64, c0 * 16 + c1 * 4 + c2)
        lut = jnp.broadcast_to(lut_ref[:], (ext, LANES))
        aa = jnp.take_along_axis(lut, idx, axis=1)

        lo = jnp.zeros((ROWS, LANES), jnp.int32)
        hi = jnp.zeros((ROWS, LANES), jnp.int32)
        bad = jnp.zeros((ROWS, LANES), jnp.bool_)
        for j in range(k):
            aaj = _shift2d(aa, 3 * j, ROWS)
            if j < 6:
                lo = lo | (aaj << (5 * j))
            else:
                hi = hi | (aaj << (5 * (j - 6)))
            bad = bad | (aaj == PROT_X) | (aaj == PROT_STOP) | (
                aaj >= PROT_PAD)
        lo_ref[:] = lo
        hi_ref[:] = hi
        bad_ref[:] = bad.astype(jnp.int32)

    pl.run_scoped(body,
                  scratch=pltpu.VMEM((ROWS + HALO_ROWS, LANES), jnp.int32),
                  sem=pltpu.SemaphoreType.DMA(()))


@partial(jax.jit, static_argnames=("k", "n_blocks", "interpret"))
def _scan_device(dna2d, lut128, k: int, n_blocks: int, interpret: bool):
    out_rows = n_blocks * ROWS
    shape = (out_rows, LANES)
    return pl.pallas_call(
        partial(_kernel, k),
        grid=(n_blocks,),
        out_shape=(jax.ShapeDtypeStruct(shape, jnp.int32),
                   jax.ShapeDtypeStruct(shape, jnp.int32),
                   jax.ShapeDtypeStruct(shape, jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),) * 3,
        interpret=interpret,
    )(dna2d, lut128)


_LUT128: dict[int, np.ndarray] = {}


def _lut128(gc: int) -> np.ndarray:
    if gc not in _LUT128:
        lut = np.full((1, LANES), PROT_PAD, np.int32)
        lut[0, :65] = codon_lut(gc)
        _LUT128[gc] = lut
    return _LUT128[gc]


def scan_stream_device(stream: np.ndarray, k: int, gc: int,
                       interpret: bool = False):
    """Device-resident scan of a concatenated DNA stream.

    Like :func:`strand_kmers_pallas` but returns DEVICE arrays (no host
    pull) — the projection engine keeps the window keys on device and
    probes them in place (the host pull of megabase-scale key arrays is
    the single largest cost of the host-index path over a tunnel).

    stream: (L,) uint8/int32 DNA codes; segments should be separated by
            ≥ 3k-1 ambiguity codes (value ≥ 4) so no window crosses one.
    returns (d_lo, d_hi, d_bad, n_pad) — flat device arrays of padded
    length ``n_pad`` (multiple of ROWS*LANES); entries past
    ``L - 3k + 1`` are garbage the caller must mask.
    """
    L = len(stream)
    n_out = max(L - 3 * k + 1, 0)
    blk = ROWS * LANES
    n_blocks = max((n_out + blk - 1) // blk, 1)
    width = n_blocks * blk + HALO_ROWS * LANES
    padded = np.full(width, 4, np.int32)           # DNA_AMBIG padding
    padded[:L] = stream
    dna2d = jnp.asarray(padded.reshape(-1, LANES))
    lo, hi, bad = _scan_device(dna2d, jnp.asarray(_lut128(gc)), k,
                               n_blocks, interpret)
    n_pad = n_blocks * blk
    return (lo.reshape(-1), hi.reshape(-1), bad.reshape(-1), n_pad)


def strand_kmers_pallas(codes: np.ndarray, k: int, gc: int,
                        interpret: bool = False):
    """Base-granularity (lo, hi, bad) for ONE strand's code array.

    codes: (L,) uint8 DNA codes in reading order.
    returns np arrays (lo, hi, bad) of length max(L - 3k + 2, 0) — one entry
    per base position that fits a whole k-mer window (bad marks windows
    containing ambiguity/stop codes).
    """
    L = len(codes)
    n_out = max(L - 3 * k + 1, 0)
    if n_out == 0:
        z = np.zeros(0, np.uint32)
        return z, z.copy(), np.zeros(0, bool)
    blk = ROWS * LANES
    n_blocks = (n_out + blk - 1) // blk
    width = n_blocks * blk + HALO_ROWS * LANES
    padded = np.full(width, 4, np.int32)           # DNA_AMBIG padding
    padded[:L] = codes
    dna2d = jnp.asarray(padded.reshape(-1, LANES))
    lo, hi, bad = _scan_device(dna2d, jnp.asarray(_lut128(gc)), k,
                               n_blocks, interpret)
    lo = np.asarray(lo).reshape(-1)[:n_out].astype(np.uint32)
    hi = np.asarray(hi).reshape(-1)[:n_out].astype(np.uint32)
    bad = np.asarray(bad).reshape(-1)[:n_out] != 0
    return lo, hi, bad
