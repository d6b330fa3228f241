"""Micro-profile of _probe_compact internals on TPU."""
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
N = 2359296            # ~2.3M stream windows (bench shape)
S = 131072             # padded singleton count

s_lo = rng.integers(0, 1 << 30, S).astype(np.uint32)
s_hi = rng.integers(0, 1 << 10, S).astype(np.uint32)
s_peg = rng.integers(0, 700, S).astype(np.uint32)
# stream windows: ~10% hits
d_lo = rng.integers(0, 1 << 30, N).astype(np.int32)
d_hi = rng.integers(0, 1 << 10, N).astype(np.int32)
sel = rng.integers(0, S, N // 10)
idx = rng.integers(0, N, N // 10)
d_lo[idx] = s_lo[sel].astype(np.int32)
d_hi[idx] = s_hi[sel].astype(np.int32)
valid = np.ones(N, bool)
NB = device_table_buckets(S)
CAP = 1 << 19


def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    print(f"{name:28s} {(time.perf_counter()-t0)/5*1000:8.2f} ms")
    return out


dj_lo, dj_hi, dj_val = map(jnp.asarray, (d_lo, d_hi, valid))
sj_lo, sj_hi, sj_peg = map(jnp.asarray, (s_lo, s_hi, s_peg))


@partial(jax.jit, static_argnames=("nb",))
def build_only(a, b, c, nb):
    return build_table_device(a, b, c, nb)


@partial(jax.jit, static_argnames=("nb", "mp"))
def build_probe(a, b, c, lo, hi, v, nb, mp):
    t, bad = build_table_device(a, b, c, nb)
    return probe_table(t, lo.astype(jnp.uint32), hi.astype(jnp.uint32),
                       v, mp), bad


@partial(jax.jit, static_argnames=("nb", "mp", "cap"))
def full_scatter(a, b, c, lo, hi, v, nb, mp, cap):
    t, bad = build_table_device(a, b, c, nb)
    pay = probe_table(t, lo.astype(jnp.uint32), hi.astype(jnp.uint32),
                      v, mp)
    hit = pay >= 0
    rank = jnp.cumsum(hit.astype(jnp.int32)) - 1
    n_hits = jnp.sum(hit.astype(jnp.int32))
    idx = jnp.where(hit, jnp.minimum(rank, cap), cap)
    pos = jnp.arange(pay.shape[0], dtype=jnp.int32)
    pos_buf = jnp.zeros(cap + 1, jnp.int32).at[idx].set(pos)[:cap]
    peg_buf = jnp.zeros(cap + 1, jnp.int32).at[idx].set(pay)[:cap]
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


timeit("build_only", build_only, sj_lo, sj_hi, sj_peg, NB)
timeit("build+probe", build_probe, sj_lo, sj_hi, sj_peg,
       dj_lo, dj_hi, dj_val, NB, MAX_DEVICE_PROBES)
o1 = timeit("full (scatter compact)", full_scatter, sj_lo, sj_hi, sj_peg,
            dj_lo, dj_hi, dj_val, NB, MAX_DEVICE_PROBES, CAP)
o2 = timeit("full (sort compact)", full_sort, sj_lo, sj_hi, sj_peg,
            dj_lo, dj_hi, dj_val, NB, MAX_DEVICE_PROBES, CAP)

# host-side push / pull costs
t0 = time.perf_counter()
for _ in range(5):
    jnp.asarray(s_lo).block_until_ready()
    jnp.asarray(s_hi).block_until_ready()
    jnp.asarray(s_peg).block_until_ready()
print(f"{'push 3x 0.5MB':28s} {(time.perf_counter()-t0)/5*1000:8.2f} ms")

n = int(o1[2])
t0 = time.perf_counter()
for _ in range(5):
    a = np.asarray(o1[0][:n])
    b = np.asarray(o1[1][:n])
print(f"{'slice-pull 2x n={}'.format(n):28s} "
      f"{(time.perf_counter()-t0)/5*1000:8.2f} ms")
t0 = time.perf_counter()
for _ in range(5):
    nn = int(o1[2])
    bb = bool(o1[3])
print(f"{'2 scalar pulls':28s} {(time.perf_counter()-t0)/5*1000:8.2f} ms")
EOF_CHECK = int(o1[2]) == int(o2[2])
print("sort/scatter agree:", EOF_CHECK,
      bool((np.sort(np.asarray(o1[0][:n])) ==
            np.sort(np.asarray(o2[0][:n]))).all()))
