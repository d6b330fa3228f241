"""Stage-level profile of the fused apply step on real TPU.

Times (chained-batch, host-synced, same harness as bench.py):
  - pack only
  - probe only (on prepacked keys)
  - vote only (segment ops on precomputed roles)
  - full fused step
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from bench import (K, N_KEYS, N_ROLES, N_PROTEINS, PROT_LEN, MIN_HITS,
                   N_BATCH, make_workload, make_proteins, _flat_stream,
                   _chain_time)
from kmers_anno_tpu.engine.apply_engine import apply_flat
from kmers_anno_tpu.ops.hashtable import build_table, probe_table
from kmers_anno_tpu.ops.kmers import pack_kmer_windows

_INT32_MAX = 2**31 - 1


def main():
    rng = np.random.default_rng(seed=7)
    protos, key_lo, key_hi, roles = make_workload(rng)
    batches = [make_proteins(rng, protos, N_PROTEINS,
                             rng.integers(0, N_ROLES, size=N_PROTEINS))
               for _ in range(N_BATCH)]
    streams = [_flat_stream(p) for p in batches]
    d_codes = jnp.asarray(np.stack([s[0] for s in streams]))
    seg_ids = jnp.asarray(streams[0][1])
    d_valid = jnp.asarray(streams[0][2])

    table, max_probes = build_table(key_lo, key_hi, roles.astype(np.uint32))
    d_table = jnp.asarray(table)
    print(f"table: {table.nbytes/1e6:.1f} MB, max_probes={max_probes}",
          file=sys.stderr)

    T = d_codes.shape[1]
    n_seqs = N_PROTEINS

    # full fused
    def full(table1, seg1, valid1, codes1):
        return apply_flat(table1, codes1, seg1, valid1,
                          jnp.int32(MIN_HITS), k=K, max_probes=max_probes,
                          n_seqs=n_seqs)
    dt_full = _chain_time(full, (d_codes,), N_BATCH,
                          consts=(d_table, seg_ids, d_valid))

    # pack only
    def pack_only(codes1):
        lo, hi = pack_kmer_windows(codes1, K)
        return (lo, hi)
    dt_pack = _chain_time(pack_only, (d_codes,), N_BATCH)

    # probe only: prepack on host side (device arrays of keys)
    lo_b, hi_b = [], []
    for s in streams:
        lo, hi = jax.jit(lambda c: pack_kmer_windows(c, K))(jnp.asarray(s[0]))
        lo_b.append(np.asarray(lo))
        hi_b.append(np.asarray(hi))
    d_lo = jnp.asarray(np.stack(lo_b))
    d_hi = jnp.asarray(np.stack(hi_b))

    def probe_only(table1, valid1, lo1, hi1):
        return (probe_table(table1, lo1, hi1, valid1, max_probes),)
    dt_probe = _chain_time(probe_only, (d_lo, d_hi), N_BATCH,
                           consts=(d_table, d_valid))

    # vote only: precomputed roles
    roles_b = []
    for i in range(N_BATCH):
        r = jax.jit(lambda l, h: probe_table(d_table, l, h, d_valid,
                                             max_probes))(d_lo[i], d_hi[i])
        roles_b.append(np.asarray(r))
    d_roles = jnp.asarray(np.stack(roles_b))

    def vote_only(seg1, valid1, roles1):
        hit = valid1 & (roles1 >= 0)
        seg = jnp.where(hit, seg1, n_seqs)
        n_hits = jax.ops.segment_sum(
            hit.astype(jnp.int32), seg, num_segments=n_seqs + 1)[:-1]
        rmin = jax.ops.segment_min(
            jnp.where(hit, roles1, _INT32_MAX), seg,
            num_segments=n_seqs + 1)[:-1]
        rmax = jax.ops.segment_max(
            jnp.where(hit, roles1, -1), seg, num_segments=n_seqs + 1)[:-1]
        unanimous = (n_hits > 0) & (rmin == rmax)
        called = unanimous & (n_hits >= MIN_HITS)
        return (jnp.where(called, rmax, -1), jnp.where(called, n_hits, 0))
    dt_vote = _chain_time(vote_only, (d_roles,), N_BATCH,
                          consts=(seg_ids, d_valid))

    # 2D vote alternative: reshape to (n_seqs, PROT_LEN) since fixed len
    def vote2d(valid1, roles1):
        r2 = roles1.reshape(n_seqs, PROT_LEN)
        v2 = valid1.reshape(n_seqs, PROT_LEN)
        hit = v2 & (r2 >= 0)
        n_hits = jnp.sum(hit, axis=1, dtype=jnp.int32)
        rmin = jnp.min(jnp.where(hit, r2, _INT32_MAX), axis=1)
        rmax = jnp.max(jnp.where(hit, r2, -1), axis=1)
        unanimous = (n_hits > 0) & (rmin == rmax)
        called = unanimous & (n_hits >= MIN_HITS)
        return (jnp.where(called, rmax, -1), jnp.where(called, n_hits, 0))
    dt_vote2d = _chain_time(vote2d, (d_roles,), N_BATCH, consts=(d_valid,))

    lookups = int(streams[0][2].sum())
    print(f"tokens/batch={T}, lookups/batch={lookups}")
    for name, dt in [("full", dt_full), ("pack", dt_pack),
                     ("probe", dt_probe), ("vote_seg", dt_vote),
                     ("vote_2d", dt_vote2d)]:
        print(f"{name:10s} {dt*1e3:8.2f} ms/batch  "
              f"{lookups/dt/1e6:8.1f} M lookups/s  "
              f"{N_PROTEINS/dt:10.0f} proteins/s")


if __name__ == "__main__":
    main()
