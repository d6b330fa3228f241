"""Pallas HBM-gather probe: pipelined per-bucket DMAs for big tables.

``ops.hashtable.probe_table`` expresses the bucket walk as an XLA row
gather.  For tables that fit on-chip memory that runs at >10 G lookups/s,
but on an HBM-resident table (BASELINE config 4: 10M+ entries ≈ 0.4 GB)
XLA's dynamic gather collapses to ~27 M lookups/s on v5e — each random
row access pays full latency with no pipelining.

This kernel is the latency-hiding version: per grid step it takes a block
of queries, reads their home-bucket indices from SMEM, and issues ONE
async DMA per query — ``max_probes`` consecutive bucket rows, contiguous
96·P bytes — into VMEM scratch, with every DMA in the block in flight at
once.  The compare/select is then one vectorized VMEM pass.

Correctness equals probe_table's early-stopping walk: the build invariant
(ops.hashtable) guarantees a key placed r buckets from home implies all
earlier buckets on its walk are full, so "key ∈ first max_probes buckets"
⇔ "the sequential walk finds it".  Wraparound is removed by extending the
table with a copy of its first max_probes-1 buckets (``extend_table``),
so every DMA is a plain contiguous slice.

The reference's analogue is the HashMap walk in
ApplyKmerProcessor.java:122-145; there is no Java equivalent of this
memory-system shaping — that is the point of the TPU build.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hashing import mix_kmer
from .hashtable import BUCKET

Q_BLK = 512             # queries per grid step = DMAs in flight per step


def extend_table(table: np.ndarray, max_probes: int) -> np.ndarray:
    """Append the first max_probes-1 buckets so probe walks never wrap."""
    if max_probes <= 1:
        return table
    return np.concatenate([table, table[: max_probes - 1]], axis=0)


def _kernel(p: int, qb_ref, qlo_ref, qhi_ref, table_hbm, out_ref,
            rows, sems):
    """One grid step: gather P consecutive bucket rows per query, compare.

    qb_ref:  (Q_BLK,) int32 home buckets in SMEM (scalar-readable)
    qlo/qhi: (Q_BLK,) uint32 query keys in VMEM
    table_hbm: (B + P - 1, 3*BUCKET) uint32, stays in HBM
    rows:    (Q_BLK, P, 3*BUCKET) uint32 VMEM scratch
    sems:    (Q_BLK,) DMA semaphores
    """
    def issue(j, _):
        b = qb_ref[j]
        pltpu.make_async_copy(
            table_hbm.at[pl.ds(b, p)], rows.at[j], sems.at[j]).start()
        return 0

    def wait(j, _):
        pltpu.make_async_copy(
            table_hbm.at[pl.ds(qb_ref[j], p)], rows.at[j],
            sems.at[j]).wait()
        return 0

    jax.lax.fori_loop(0, Q_BLK, issue, 0)
    jax.lax.fori_loop(0, Q_BLK, wait, 0)

    r = rows[:]                                      # (Q_BLK, P, 24)
    tlo = r[:, :, 0 * BUCKET: 1 * BUCKET]
    thi = r[:, :, 1 * BUCKET: 2 * BUCKET]
    tval = r[:, :, 2 * BUCKET: 3 * BUCKET]
    qlo = qlo_ref[:][:, None, None]
    qhi = qhi_ref[:][:, None, None]
    hit = (tlo == qlo) & (thi == qhi)                # ≤ 1 slot matches
    val = jnp.sum(jnp.where(hit, tval, 0), axis=(1, 2)).astype(jnp.int32)
    found = jnp.any(hit, axis=(1, 2))
    out_ref[:] = jnp.where(found, val, -1)


@partial(jax.jit, static_argnames=("max_probes", "interpret"))
def probe_table_pallas(table_ext, key_lo, key_hi, valid, max_probes: int,
                       interpret: bool = False):
    """Drop-in equivalent of probe_table for HBM-resident tables.

    table_ext: (B + max_probes - 1, 24) uint32 — pass through
               ``extend_table(table, max_probes)`` once
    key_lo/key_hi: (N,) uint32 query keys, N a multiple of Q_BLK is
               fastest (padded internally otherwise)
    valid:     (N,) bool — invalid queries return -1
    """
    n = key_lo.shape[0]
    n_buckets = table_ext.shape[0] - (max_probes - 1)
    mask = jnp.uint32(n_buckets - 1)
    npad = -n % Q_BLK
    lo = jnp.pad(key_lo, (0, npad))
    hi = jnp.pad(key_hi, (0, npad))
    qb = (mix_kmer(lo, hi, jnp) & mask).astype(jnp.int32)
    grid = (lo.shape[0] // Q_BLK,)
    blk = lambda i: (i,)
    out = pl.pallas_call(
        partial(_kernel, max_probes),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Q_BLK,), blk, memory_space=pltpu.SMEM),
            pl.BlockSpec((Q_BLK,), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((Q_BLK,), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((Q_BLK,), blk, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lo.shape[0],), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((Q_BLK, max_probes, 3 * BUCKET), jnp.uint32),
            pltpu.SemaphoreType.DMA((Q_BLK,)),
        ],
        interpret=interpret,
    )(qb, lo, hi, table_ext)
    return jnp.where(valid, out[:n], -1)
