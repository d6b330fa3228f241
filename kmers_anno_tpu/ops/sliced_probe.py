"""Bucket-sorted sliced probe: full-bandwidth lookups on HBM-size tables.

``ops.hashtable.probe_table`` expresses the bucket walk as one XLA row
gather.  Measured on TPU v5e (r4, host-synced chained-batch timing): the
gather is latency-bound at ~166 M rows/s regardless of row width for
tables of ≤ ~262k rows, then collapses to ~54 M rows/s at 524k+ rows
(BASELINE config 4: 10M entries ≈ 0.4 GB) — every random access pays
full HBM latency once the row count leaves the fast zone.

Two latency-hiding designs were evaluated on hardware:

* per-query async DMA (a Pallas kernel, r2): dead end — DMA descriptors
  issue from the scalar core at tens of M/s, i.e. no faster than the XLA
  gather it was meant to replace;
* THIS design: convert random HBM access into sequential HBM streaming +
  random on-chip access.  Sort queries by home bucket, then scan the
  table in on-chip-size slices; each slice is one big sequential read
  and each query gathers its bucket row from the *slice*, which runs at
  the fast small-row-count gather rate.

Honest r3/r4 numbers (host-synced chained-batch timing; the r1/r2 docs
here claimed ~450 M lookups/s / ~19×, which came from async timing that
overstated throughput ~20-30×): on a 10M-entry windowed table (~0.8 GB)
the sliced path measures ~72 M lookups/s vs ~26 M for the plain walk —
~2.7×, dominated by the two 4M-element device sorts (a 2.4M-element sort
measures ~8.4 ms on v5e).  On mid-size tables (≤ ~75 MB, ≤ 262k rows)
the plain gather is already latency-bound at ~166 M rows/s and the wide-
bucket single-gather layout (ops.widetable) beats both — this module is
the ≥ ~4M-key fallback only.

The probe walk (up to ``max_probes`` consecutive buckets, wrapping mod B)
is folded into the row width instead of extra gathers: ``windowed_table``
materializes row b as the concatenation of buckets b..b+P-1 (mod B), so
one gather resolves the whole walk and a slice is self-contained.

Skew safety: queries are assigned to slices by hash, so slice populations
concentrate tightly around n/G; the per-slice query window is padded to
``qwin`` ≈ 2× the mean (power of two).  If an adversarial/duplicate-heavy
batch overflows a window, the kernel detects it and falls back to the
plain full-table gather walk *inside* jit (lax.cond) — always correct,
slow only on inputs no real proteome produces.

Reference analogue: the HashMap walk in ApplyKmerProcessor.java:122-145.
There is no Java equivalent of this memory-system shaping — that is the
point of the TPU build.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .hashing import mix_kmer
from .hashtable import BUCKET

ROW = 3 * BUCKET          # uint32 words per bucket row
MAX_SLICE_ROWS = 1 << 16  # 65536 rows/slice: 12.6 MB at max_probes 2,
                          # the top of the measured fast-gather zone
# tables larger than this probe faster through the sliced path.
# Measured on v5e (r4): the plain gather holds ~166M rows/s up to ~262k
# rows (25 MB at 8 slots), drops to ~54M rows/s by 524k rows; the sliced
# path is a flat ~72M lookups/s (sort-dominated).  Tables small enough
# for the wide-bucket layout (ops.widetable, ≤ ~3M keys) never get here.
SLICED_THRESHOLD_BYTES = 48 << 20


def windowed_table(table: np.ndarray, max_probes: int) -> np.ndarray:
    """(B, 24) bucket table → (B, 24·P) probe-window table where row b
    holds buckets b..b+P-1 (mod B): one row gather covers the whole walk."""
    table = np.asarray(table)
    if max_probes <= 1:
        return np.ascontiguousarray(table)
    return np.ascontiguousarray(np.concatenate(
        [np.roll(table, -i, axis=0) for i in range(max_probes)], axis=1))


def _pow2(n: int) -> int:
    return 1 << max(0, int(n - 1).bit_length())


def _compare_window(rows, ql, qh, max_probes: int):
    """Vectorized early-stop compare over a gathered (Q, 24·P) window.
    Payloads are viewed as int32 (bit-identical: packed payloads keep bit
    31 clear, and Mosaic/TPU reductions over unsigned ints are unsupported
    anyway)."""
    val = jnp.full(rows.shape[:-1], -1, jnp.int32)
    for i in range(max_probes):
        tlo = rows[..., i * ROW + 0 * BUCKET: i * ROW + 1 * BUCKET]
        thi = rows[..., i * ROW + 1 * BUCKET: i * ROW + 2 * BUCKET]
        tv = rows[..., i * ROW + 2 * BUCKET: i * ROW + 3 * BUCKET].astype(
            jnp.int32)
        hit = (tlo == ql[..., None]) & (thi == qh[..., None])
        hv = jnp.sum(jnp.where(hit, tv, 0), axis=-1)
        val = jnp.where((val < 0) & jnp.any(hit, axis=-1), hv, val)
    return val


@partial(jax.jit, static_argnames=("max_probes",))
def probe_windowed(wtable, key_lo, key_hi, valid, max_probes: int):
    """Plain gather walk on a windowed table (one gather per query).
    Used directly for mid-size tables and as the sliced path's overflow
    fallback; bit-identical to ops.hashtable.probe_table."""
    nb = wtable.shape[0]
    mask = jnp.uint32(nb - 1)
    shape = key_lo.shape
    lo = key_lo.reshape(-1)
    hi = key_hi.reshape(-1)
    b = (mix_kmer(lo, hi, jnp) & mask).astype(jnp.int32)
    val = _compare_window(wtable[b], lo, hi, max_probes)
    return jnp.where(valid.reshape(-1), val, -1).reshape(shape)


MXU_SLICE_ROWS = 512      # rows per one-hot matmul slice


def _mxu_gather(slab_bytes, lb, s_rows: int):
    """Gather rows from a VMEM-size slab with an MXU one-hot matmul.

    The XLA row gather issues one descriptor per row (~166M rows/s,
    latency-bound); a (Q, R) one-hot × (R, 4·W) byte-plane matmul moves
    the same rows through the systolic array at MXU rates instead.
    Measured on v5e (r4, host-synced): end-to-end NEUTRAL vs the slice
    gather (72.9 vs 72.8 M lookups/s on the 10M-entry shape) — the
    sliced probe is bounded by its two 4M-element sorts and the
    per-slice loop overhead, not by the row gather, so the MXU path is
    kept as an option (``mxu=``) but buys nothing until the sort cost
    is attacked.  Exactness: the one-hot is exact in bf16, each byte
    plane value ≤ 255 is exact in bf16, and each output element has
    exactly one nonzero product term, so the f32 accumulation is exact.

    slab_bytes: (R, 4·W) bf16 byte planes (plane-major: byte b of word
                w sits at column b·W + w)
    lb:         (Q,) int32 row index per query (clipped to [0, R))
    returns     (Q, W) uint32 reassembled rows
    """
    w4 = slab_bytes.shape[1]
    w = w4 // 4
    onehot = (lb[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, s_rows), 1)).astype(jnp.bfloat16)
    planes = jax.lax.dot_general(
        onehot, slab_bytes, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    p = [planes[:, i * w: (i + 1) * w].astype(jnp.uint32)
         for i in range(4)]
    return (p[0] | (p[1] << 8) | (p[2] << 16) | (p[3] << 24))


@partial(jax.jit, static_argnames=("max_probes", "mxu"))
def probe_table_sliced(wtable, key_lo, key_hi, valid, max_probes: int,
                       mxu: bool = False, payload=None):
    """Sort-and-stream probe of a windowed table (the big-table hot path).

    wtable: (B, 24·max_probes) uint32 from ``windowed_table`` (device-
            resident; B a power of two)
    key_lo/key_hi: (N,) uint32 query keys
    valid:  (N,) bool — invalid queries return -1
    mxu:    gather slice rows through the one-hot matmul (_mxu_gather)
            instead of the XLA row gather (measured neutral — see
            _mxu_gather; the probe is sort-bound)
    payload: optional (N,) int32 rider (e.g. segment ids).  When given,
            the restore sort is SKIPPED and the return is
            (values, payload) in bucket-sorted order — the right mode
            for order-free consumers (segment votes), saving one of the
            two big sorts that bound this path.
    returns (N,) int32 — stored payload, or -1 on miss/invalid — or the
            (values, payload) pair in sorted order when payload is given
    """
    n = key_lo.shape[0]
    nb = wtable.shape[0]
    roww = wtable.shape[1]
    # the one-hot matmul only pays when each slice sees a full MXU tile
    # of queries; thin batches keep the plain slice gather
    mxu = mxu and n // max(nb // MXU_SLICE_ROWS, 1) >= 512
    s_rows = min(nb, MXU_SLICE_ROWS if mxu else MAX_SLICE_ROWS)
    n_slices = nb // s_rows
    # hash-uniform slice populations concentrate at n/G with std ~sqrt:
    # 1.25× the mean is a huge margin, and every padded row is a wasted
    # gather (the dominant cost), so keep the window tight
    qwin = -(-max(1024, (5 * n) // (4 * n_slices)) // 1024) * 1024
    mask = jnp.uint32(nb - 1)
    b = (mix_kmer(key_lo, key_hi, jnp) & mask).astype(jnp.int32)
    pos = jnp.arange(n, dtype=jnp.int32)
    if payload is None:
        b_s, lo_s, hi_s, pos_s = jax.lax.sort(
            (b, key_lo, key_hi, pos), num_keys=1)
    else:
        vmask = jnp.where(valid, jnp.int32(0), jnp.int32(-1))
        b_s, lo_s, hi_s, vmask_s, pay_s, pos_s = jax.lax.sort(
            (b, key_lo, key_hi, vmask, payload, pos), num_keys=1)
    # pad reads to n+qwin: dynamic_slice CLAMPS a start near the end,
    # which would shift the read window against the write position
    b_p = jnp.concatenate([b_s, jnp.full(qwin, nb, jnp.int32)])
    lo_p = jnp.concatenate([lo_s, jnp.zeros(qwin, jnp.uint32)])
    hi_p = jnp.concatenate([hi_s, jnp.zeros(qwin, jnp.uint32)])
    bounds = jnp.arange(n_slices + 1, dtype=jnp.int32) * s_rows
    starts = jnp.searchsorted(b_s, bounds).astype(jnp.int32)
    overflow = jnp.any(starts[1:] - starts[:-1] > qwin)

    def fast(_):
        def step(g, out):
            start = starts[g]
            lb = jax.lax.dynamic_slice(b_p, (start,), (qwin,)) - g * s_rows
            ql = jax.lax.dynamic_slice(lo_p, (start,), (qwin,))
            qh = jax.lax.dynamic_slice(hi_p, (start,), (qwin,))
            sl = jax.lax.dynamic_slice(wtable, (g * s_rows, 0),
                                       (s_rows, roww))
            lbc = jnp.clip(lb, 0, s_rows - 1)
            if mxu:
                sl_b = jnp.concatenate(
                    [(sl >> jnp.uint32(8 * i)) & jnp.uint32(0xFF)
                     for i in range(4)], axis=1).astype(jnp.bfloat16)
                rows = _mxu_gather(sl_b, lbc, s_rows)
            else:
                rows = sl[lbc]
            val = _compare_window(rows, ql, qh, max_probes)
            # windows overlap forward only: garbage tail beyond this
            # slice's real count is rewritten by later (higher-g) steps
            return jax.lax.dynamic_update_slice(out, val, (start,))

        out_pad = jax.lax.fori_loop(
            0, n_slices, step, jnp.full(n + qwin, -1, jnp.int32))
        if payload is not None:
            return out_pad[:n]                 # stays in sorted order
        # restore original query order
        _, out = jax.lax.sort((pos_s, out_pad[:n]), num_keys=1)
        return out

    def slow(_):
        # qwin overflow (pathological duplicate skew): full gather walk
        vals = _compare_window(wtable[b], key_lo, key_hi, max_probes)
        if payload is not None:
            # permute into the same sorted order as the fast path
            return vals[pos_s]
        return vals

    out = jax.lax.cond(overflow, slow, fast, None)
    if payload is not None:
        return jnp.where(vmask_s == 0, out, -1), pay_s
    return jnp.where(valid, out, -1)


def pick_probe(table_bytes: int):
    """True when a table of this size should use the sliced probe."""
    return table_bytes > SLICED_THRESHOLD_BYTES
