"""Locate the gather cliff; test scoped-vmem flag; transposed compare."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from bench import _chain_time

N_Q = 2_400_000
N_BATCH = 8
rng = np.random.default_rng(0)

for n_rows, width in [(131072, 72), (131072, 96), (98304, 72),
                      (131072, 128), (262144, 72), (262144, 96)]:
    mb = n_rows * width * 4 / 1e6
    table = jnp.asarray(rng.integers(0, 2**31, (n_rows, width),
                                     dtype=np.int64).astype(np.uint32))
    idx = jnp.asarray(np.stack([
        rng.integers(0, n_rows, N_Q).astype(np.int32)
        for _ in range(N_BATCH)]))

    def step(t, i):
        return (jnp.sum(t[i].astype(jnp.int32), axis=-1),)
    dt = _chain_time(step, (idx,), N_BATCH, consts=(table,))
    print(f"{n_rows:8d} x {width:3d} ({mb:7.1f} MB): "
          f"{N_Q/dt/1e6:8.1f} M rows/s", flush=True)

# transposed compare: gather (Q,72) -> reshape (Q/128,128,72) -> swap ->
# compares on lanes
n_rows, width = 131072, 72
SLOTS = width // 3
table = jnp.asarray(rng.integers(0, 2**31, (n_rows, width),
                                 dtype=np.int64).astype(np.uint32))
idx = jnp.asarray(np.stack([rng.integers(0, n_rows, N_Q).astype(np.int32)
                            for _ in range(N_BATCH)]))
qlo = jnp.asarray(np.stack([rng.integers(0, 2**31, N_Q, dtype=np.int64)
                            .astype(np.uint32) for _ in range(N_BATCH)]))

def probe_T(t, i, lo1):
    rows = t[i]                                   # (Q, 72)
    r3 = rows.reshape(N_Q // 128, 128, width)
    rt = jnp.swapaxes(r3, 1, 2)                   # (QB, 72, 128)
    lo3 = lo1.reshape(N_Q // 128, 1, 128)
    tlo = rt[:, 0 * SLOTS:1 * SLOTS, :]
    thi = rt[:, 1 * SLOTS:2 * SLOTS, :]
    tv = rt[:, 2 * SLOTS:3 * SLOTS, :].astype(jnp.int32)
    hit = (tlo == lo3) & (thi == lo3)
    anyhit = jnp.any(hit, axis=1)
    val = jnp.sum(jnp.where(hit, tv, 0), axis=1)
    return (jnp.where(anyhit, val, -1).reshape(N_Q),)
dt = _chain_time(probe_T, (idx, qlo), N_BATCH, consts=(table,))
print(f"probe_transposed 24-slot: {dt*1e3:8.2f} ms  "
      f"{N_Q/dt/1e6:6.1f} M lookups/s", flush=True)

def probe_noT(t, i, lo1):
    rows = t[i]
    tlo = rows[:, 0 * SLOTS:1 * SLOTS]
    thi = rows[:, 1 * SLOTS:2 * SLOTS]
    tv = rows[:, 2 * SLOTS:3 * SLOTS].astype(jnp.int32)
    hit = (tlo == lo1[:, None]) & (thi == lo1[:, None])
    anyhit = jnp.any(hit, axis=1)
    val = jnp.sum(jnp.where(hit, tv, 0), axis=1)
    return (jnp.where(anyhit, val, -1),)
dt = _chain_time(probe_noT, (idx, qlo), N_BATCH, consts=(table,))
print(f"probe_slotminor 24-slot: {dt*1e3:8.2f} ms  "
      f"{N_Q/dt/1e6:6.1f} M lookups/s", flush=True)
