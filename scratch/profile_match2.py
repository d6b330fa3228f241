"""Honest (value-pull-synced) timing of _probe_compact stages on TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from kmers_anno_tpu.ops.hashtable import (MAX_DEVICE_PROBES,
                                          build_table_device,
                                          device_table_buckets,
                                          probe_table)

rng = np.random.default_rng(0)
N = 2359296
S = 131072

s_lo = rng.integers(0, 1 << 30, S).astype(np.uint32)
s_hi = rng.integers(0, 1 << 10, S).astype(np.uint32)
s_peg = rng.integers(0, 700, S).astype(np.uint32)
d_lo = rng.integers(0, 1 << 30, N).astype(np.int32)
d_hi = rng.integers(0, 1 << 10, N).astype(np.int32)
sel = rng.integers(0, S, N // 10)
idx = rng.integers(0, N, N // 10)
d_lo[idx] = s_lo[sel].astype(np.int32)
d_hi[idx] = s_hi[sel].astype(np.int32)
valid = np.ones(N, bool)
NB = device_table_buckets(S)
CAP = 1 << 19

dj_lo, dj_hi, dj_val = map(jnp.asarray, (d_lo, d_hi, valid))
sj_lo, sj_hi, sj_peg = map(jnp.asarray, (s_lo, s_hi, s_peg))


def timeit(name, fn, n=5):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1000:8.2f} ms")


@partial(jax.jit, static_argnames=("nb",))
def build_only(a, b, c, nb):
    t, bad = build_table_device(a, b, c, nb)
    return jnp.sum(t[:, 0].astype(jnp.int32)), bad


@partial(jax.jit, static_argnames=("nb", "mp"))
def build_probe(a, b, c, lo, hi, v, nb, mp):
    t, bad = build_table_device(a, b, c, nb)
    pay = probe_table(t, lo.astype(jnp.uint32), hi.astype(jnp.uint32),
                      v, mp)
    return jnp.sum(pay), bad


@partial(jax.jit, static_argnames=("nb", "mp", "cap"))
def full_scatter(a, b, c, lo, hi, v, nb, mp, cap):
    t, bad = build_table_device(a, b, c, nb)
    pay = probe_table(t, lo.astype(jnp.uint32), hi.astype(jnp.uint32),
                      v, mp)
    hit = pay >= 0
    rank = jnp.cumsum(hit.astype(jnp.int32)) - 1
    n_hits = jnp.sum(hit.astype(jnp.int32))
    idxs = jnp.where(hit, jnp.minimum(rank, cap), cap)
    pos = jnp.arange(pay.shape[0], dtype=jnp.int32)
    pos_buf = jnp.zeros(cap + 1, jnp.int32).at[idxs].set(pos)[:cap]
    peg_buf = jnp.zeros(cap + 1, jnp.int32).at[idxs].set(pay)[:cap]
    return pos_buf, peg_buf, n_hits, bad


@partial(jax.jit, static_argnames=("nb", "mp", "cap"))
def full_sort(a, b, c, lo, hi, v, nb, mp, cap):
    t, bad = build_table_device(a, b, c, nb)
    pay = probe_table(t, lo.astype(jnp.uint32), hi.astype(jnp.uint32),
                      v, mp)
    hit = pay >= 0
    n_hits = jnp.sum(hit.astype(jnp.int32))
    key = jnp.where(hit, jnp.int8(0), jnp.int8(1))
    pos = jnp.arange(pay.shape[0], dtype=jnp.int32)
    _, pos_s, pay_s = jax.lax.sort((key, pos, pay), num_keys=2)
    return pos_s[:cap], pay_s[:cap], n_hits, bad


timeit("build_only -> int",
       lambda: int(build_only(sj_lo, sj_hi, sj_peg, NB)[0]))
timeit("build+probe -> int",
       lambda: int(build_probe(sj_lo, sj_hi, sj_peg, dj_lo, dj_hi, dj_val,
                               NB, MAX_DEVICE_PROBES)[0]))
timeit("full scatter -> int(n)",
       lambda: int(full_scatter(sj_lo, sj_hi, sj_peg, dj_lo, dj_hi,
                                dj_val, NB, MAX_DEVICE_PROBES, CAP)[2]))
timeit("full sort -> int(n)",
       lambda: int(full_sort(sj_lo, sj_hi, sj_peg, dj_lo, dj_hi,
                             dj_val, NB, MAX_DEVICE_PROBES, CAP)[2]))


def whole():
    o = full_scatter(sj_lo, sj_hi, sj_peg, dj_lo, dj_hi, dj_val,
                     NB, MAX_DEVICE_PROBES, CAP)
    n = int(o[2])
    bad = bool(o[3])
    a = np.asarray(o[0][:n])
    b = np.asarray(o[1][:n])
    return a, b


timeit("whole incl push+pulls",
       lambda: (jnp.asarray(s_lo), jnp.asarray(s_hi), jnp.asarray(s_peg),
                whole()))
