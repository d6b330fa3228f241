"""Probe-layout shootout on the 1M-entry table (25 MB base)."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from bench import (K, N_ROLES, N_PROTEINS, N_BATCH, make_workload,
                   make_proteins, _flat_stream, _chain_time)
from kmers_anno_tpu.ops.hashtable import build_table, probe_table, BUCKET
from kmers_anno_tpu.ops.sliced_probe import (windowed_table, probe_windowed,
                                             probe_table_sliced)
from kmers_anno_tpu.ops.kmers import pack_kmer_windows
from kmers_anno_tpu.ops.hashing import mix_kmer


def main():
    rng = np.random.default_rng(seed=7)
    protos, key_lo, key_hi, roles = make_workload(rng)
    batches = [make_proteins(rng, protos, N_PROTEINS,
                             rng.integers(0, N_ROLES, size=N_PROTEINS))
               for _ in range(N_BATCH)]
    streams = [_flat_stream(p) for p in batches]
    d_valid = jnp.asarray(streams[0][2])

    lo_b, hi_b = [], []
    pk = jax.jit(lambda c: pack_kmer_windows(c, K))
    for s in streams:
        lo, hi = pk(jnp.asarray(s[0]))
        lo_b.append(np.asarray(lo))
        hi_b.append(np.asarray(hi))
    d_lo = jnp.asarray(np.stack(lo_b))
    d_hi = jnp.asarray(np.stack(hi_b))
    n_lookups = int(streams[0][2].sum())

    results = {}

    # variant 1: current plain probe, load 0.5 (25 MB)
    table, mp = build_table(key_lo, key_hi, roles.astype(np.uint32))
    d_table = jnp.asarray(table)
    print(f"plain: {table.nbytes/1e6:.1f} MB max_probes={mp}",
          file=sys.stderr)

    def plain(t, v, lo1, hi1):
        return (probe_table(t, lo1, hi1, v, mp),)
    results[f"plain_lf0.5_mp{mp}"] = _chain_time(
        plain, (d_lo, d_hi), N_BATCH, consts=(d_table, d_valid))

    # variant 2: windowed single-gather (50 MB)
    wt = windowed_table(table, mp)
    d_wt = jnp.asarray(wt)
    def wind(t, v, lo1, hi1):
        return (probe_windowed(t, lo1, hi1, v, mp),)
    results[f"windowed_{wt.nbytes>>20}MB"] = _chain_time(
        wind, (d_lo, d_hi), N_BATCH, consts=(d_wt, d_valid))

    # variant 3: sliced sort-and-stream on windowed
    def sliced(t, v, lo1, hi1):
        return (probe_table_sliced(t, lo1, hi1, v, mp),)
    results["sliced"] = _chain_time(
        sliced, (d_lo, d_hi), N_BATCH, consts=(d_wt, d_valid))

    # variant 4: high load factor, 12.6 MB table
    t85, mp85 = build_table(key_lo, key_hi, roles.astype(np.uint32),
                            n_buckets=131072)
    d_t85 = jnp.asarray(t85)
    print(f"lf0.95: {t85.nbytes/1e6:.1f} MB max_probes={mp85}",
          file=sys.stderr)
    def hi_load(t, v, lo1, hi1):
        return (probe_table(t, lo1, hi1, v, mp85),)
    results[f"plain_lf0.95_mp{mp85}"] = _chain_time(
        hi_load, (d_lo, d_hi), N_BATCH, consts=(d_t85, d_valid))

    # variant 5: split planes — keys-only gather (16 B/slot row of 16 words)
    # then a value gather only where hit.
    keys_tab = np.ascontiguousarray(table[:, :2 * BUCKET])   # (B,16)
    vals_tab = np.ascontiguousarray(table[:, 2 * BUCKET:])   # (B,8)
    d_kt = jnp.asarray(keys_tab)
    d_vt = jnp.asarray(vals_tab)
    nb = table.shape[0]

    def split(kt, vt, v, lo1, hi1):
        mask = jnp.uint32(nb - 1)
        b = (mix_kmer(lo1, hi1, jnp) & mask).astype(jnp.int32)
        out = jnp.full(lo1.shape, -1, jnp.int32)
        hitb = jnp.full(lo1.shape, -1, jnp.int32)   # bucket of hit
        hitslot = jnp.zeros(lo1.shape, jnp.int32)
        active = v
        for _ in range(mp):
            rows = kt[b]
            tlo = rows[:, :BUCKET]
            thi = rows[:, BUCKET:]
            hitmask = (tlo == lo1[:, None]) & (thi == hi1[:, None])
            anyhit = jnp.any(hitmask, axis=-1)
            slot = jnp.argmax(hitmask, axis=-1).astype(jnp.int32)
            newhit = active & anyhit
            hitb = jnp.where(newhit, b, hitb)
            hitslot = jnp.where(newhit, slot, hitslot)
            full_ = jnp.all(tlo != jnp.uint32(0xFFFFFFFF), axis=-1)
            active = active & ~anyhit & full_
            b = (b + 1) & jnp.int32(nb - 1)
        val = vt[jnp.maximum(hitb, 0), hitslot].astype(jnp.int32)
        return (jnp.where(hitb >= 0, val, -1),)
    results["split_planes"] = _chain_time(
        split, (d_lo, d_hi), N_BATCH, consts=(d_kt, d_vt, d_valid))

    # variant 6: windowed high-load (12.6MB*mp85... probably too big)
    wt85 = windowed_table(t85, mp85)
    d_wt85 = jnp.asarray(wt85)
    def wind85(t, v, lo1, hi1):
        return (probe_windowed(t, lo1, hi1, v, mp85),)
    results[f"windowed_lf0.95_{wt85.nbytes>>20}MB"] = _chain_time(
        wind85, (d_lo, d_hi), N_BATCH, consts=(d_wt85, d_valid))

    for name, dt in results.items():
        print(f"{name:28s} {dt*1e3:8.2f} ms/batch "
              f"{n_lookups/dt/1e6:8.1f} M lookups/s")


if __name__ == "__main__":
    main()
