"""Raw gather rate vs table size + sort cost, on this chip."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from bench import _chain_time

N_Q = 2_400_000
N_BATCH = 8
rng = np.random.default_rng(0)

print("rows x width -> gather rate")
for n_rows, width in [(32768, 24), (65536, 24), (131072, 24),
                      (262144, 24), (524288, 24), (262144, 48),
                      (131072, 48), (65536, 48), (1048576, 24)]:
    mb = n_rows * width * 4 / 1e6
    table = jnp.asarray(rng.integers(0, 2**31, (n_rows, width),
                                     dtype=np.int64).astype(np.uint32))
    idx = jnp.asarray(np.stack([
        rng.integers(0, n_rows, N_Q).astype(np.int32)
        for _ in range(N_BATCH)]))

    def step(t, i):
        return (jnp.sum(t[i], axis=-1),)
    dt = _chain_time(step, (idx,), N_BATCH, consts=(table,))
    print(f"{n_rows:8d} x {width} ({mb:7.1f} MB): {N_Q/dt/1e6:8.1f} M rows/s"
          f"  {N_Q*width*4/dt/1e9:7.1f} GB/s touched")

# sort cost: 4-tuple sort of N_Q as in sliced probe
b = jnp.asarray(np.stack([rng.integers(0, 262144, N_Q).astype(np.int32)
                          for _ in range(N_BATCH)]))
lo = jnp.asarray(np.stack([rng.integers(0, 2**31, N_Q, dtype=np.int64)
                           .astype(np.uint32) for _ in range(N_BATCH)]))
pos = jnp.arange(N_Q, dtype=jnp.int32)

def sort4(pos1, b1, lo1):
    bs, ls, hs, ps = jax.lax.sort((b1, lo1, lo1, pos1), num_keys=1)
    return (bs, ps)
dt = _chain_time(sort4, (b, lo), N_BATCH, consts=(pos,))
print(f"sort 4-tuple {N_Q}: {dt*1e3:.2f} ms")

def sort2(pos1, b1):
    bs, ps = jax.lax.sort((b1, pos1), num_keys=1)
    return (bs, ps)
dt = _chain_time(sort2, (b,), N_BATCH, consts=(pos,))
print(f"sort 2-tuple {N_Q}: {dt*1e3:.2f} ms")

# argsort via sort of (key<<22 | pos) single uint64? try single-array sort
comb = (b.astype(jnp.int64) << 22) | pos[None, :]
def sort1(c1):
    return (jax.lax.sort(c1),)
dt = _chain_time(sort1, (comb,), N_BATCH)
print(f"sort 1x int64 {N_Q}: {dt*1e3:.2f} ms")

# 3-bit partition key only (8 groups)
g = b >> 15
def sortg(pos1, g1):
    gs, ps = jax.lax.sort((g1, pos1), num_keys=1)
    return (gs, ps)
dt = _chain_time(sortg, (g,), N_BATCH, consts=(pos,))
print(f"sort 3-bit key 2-tuple: {dt*1e3:.2f} ms")
