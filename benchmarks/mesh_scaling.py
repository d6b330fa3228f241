"""Mesh scaling harness: strong + weak scaling and the routed-vs-
replicated crossover, on a virtual 8-device CPU mesh.

bench.py launches this with JAX_PLATFORMS=cpu and
--xla_force_host_platform_device_count=8.  Virtual devices share the
host's physical cores, so ABSOLUTE throughput means nothing; every
section reports TIME RATIOS against its own 1-device (or replicated)
baseline, which isolate the compiled program's sharding/collective
overhead — the measurable stand-in for the BASELINE ≥80 % scaling
target until a multi-chip pod is available (parallel/mesh.py is the
same code either way).  Honest-reporting notes (r3 verdict):

* strong (fixed TOTAL work, sharded n ways): devices share cores, so
  the ideal ratio t(n)/t(1) is 1.0; above 1.0 = sharding overhead.
  Ratios slightly below 1.0 are host-scheduling noise, not speedup.
* weak (fixed work PER device): total work grows n×, all of it lands on
  the same shared cores, so the pure-compute ideal for t(n)/t(1) is n×
  core-count effects; the column to read is weak_overhead_n =
  t(n) / (n·t(1)) — 1.0 means the sharded program added nothing over
  running the work n times, > 1.0 is collective/partition overhead.
* routed vs replicated: same work on a (data, table) mesh — the
  all_to_all-routed sharded-table step vs the replicated-table step.
  ratio > 1.0 = routing costs more than replication at that table size
  (expected for small tables; the routed mode exists for tables too big
  to replicate — SURVEY §5.8).

Prints one JSON line with sections {"strong": …, "weak": …,
"routed_vs_replicated": …}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 8
N_PROT = 1024
PLEN = 300
N_BATCH = 4


def make_table(rng, n_roles, pad_to=None):
    from kmers_anno_tpu.engine.signature import pack_kmers_np
    from kmers_anno_tpu.ops.hashtable import build_table

    protos = rng.integers(0, 20, size=(n_roles, 120)).astype(np.uint8)
    lo_all, hi_all, role_all = [], [], []
    for r in range(n_roles):
        lo, hi = pack_kmers_np(protos[r], K)
        lo_all.append(lo)
        hi_all.append(hi)
        role_all.append(np.full(len(lo), r, np.int32))
    if pad_to:
        fill = rng.integers(0, 20, size=pad_to + K - 1).astype(np.uint8)
        flo, fhi = pack_kmers_np(fill, K)
        lo_all.append(flo)
        hi_all.append(fhi)
        role_all.append(rng.integers(0, n_roles, len(flo)).astype(np.int32))
    lo = np.concatenate(lo_all)
    hi = np.concatenate(hi_all)
    role = np.concatenate(role_all)
    _, idx = np.unique((hi.astype(np.uint64) << np.uint64(32)) | lo,
                       return_index=True)
    table, max_probes = build_table(lo[idx], hi[idx],
                                    role[idx].astype(np.uint32))
    return protos, lo[idx], hi[idx], role[idx], table, max_probes


def genome_stream(rng, protos, n_roles, n_rows):
    prot = rng.integers(0, 20, size=(n_rows, N_PROT, PLEN)).astype(np.uint8)
    prot[:, :, 100:220] = protos[
        rng.integers(0, n_roles, size=(n_rows, N_PROT))]
    codes = prot.reshape(n_rows, -1)
    seg = np.broadcast_to(
        np.repeat(np.arange(N_PROT, dtype=np.int32), PLEN),
        codes.shape).copy()
    valid = np.ones(codes.shape, bool)
    for i in range(1, N_PROT + 1):
        valid[:, i * PLEN - K + 1: i * PLEN] = False
    return codes, seg, valid


def time_groups(step, d_table, groups):
    import jax.numpy as jnp

    def run_all():
        acc = 0
        for args in groups:
            out = step(d_table, *args, jnp.int32(5))
            acc += int(jnp.sum(out[1]))
        return acc

    assert run_all() > 0  # compile + warm + sanity
    t0 = time.perf_counter()
    run_all()
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp

    from kmers_anno_tpu.parallel.mesh import (
        make_mesh, replicated_apply_step, routed_apply_step,
        shard_signature_table, sharded_apply_step,
        split_tokens_for_table_axis)

    assert len(jax.devices()) >= 8, jax.devices()
    rng = np.random.default_rng(11)
    protos, key_lo, key_hi, roles, table, max_probes = make_table(rng, 200)
    d_table = jnp.asarray(table)

    # ---- strong scaling: fixed total work (8 rows), sharded n ways ----
    strong = {}
    total_rows = 8
    batches = [genome_stream(rng, protos, 200, total_rows)
               for _ in range(N_BATCH)]
    for n_data in (1, 2, 4, 8):
        mesh = make_mesh(n_data, 1)
        step = replicated_apply_step(mesh, k=K, max_probes=max_probes,
                                     n_seqs=N_PROT)
        groups = []
        for c, s, v in batches:
            for i in range(0, total_rows, n_data):
                groups.append(tuple(jnp.asarray(a[i: i + n_data])
                                    for a in (c, s, v)))
        strong[str(n_data)] = time_groups(step, d_table, groups)
    strong_out = {
        f"t{n}_over_t1": round(strong[str(n)] / strong["1"], 3)
        for n in (2, 4, 8)}
    strong_out["ideal"] = 1.0
    strong_out["note"] = ("fixed total work on shared host cores; "
                          "> 1.0 = sharding overhead")

    # ---- weak scaling: fixed work PER device (2 rows each) ----
    weak = {}
    per_dev = 2
    for n_data in (1, 2, 4, 8):
        mesh = make_mesh(n_data, 1)
        step = replicated_apply_step(mesh, k=K, max_probes=max_probes,
                                     n_seqs=N_PROT)
        groups = []
        for _ in range(N_BATCH):
            c, s, v = genome_stream(rng, protos, 200, per_dev * n_data)
            groups.append(tuple(jnp.asarray(a) for a in (c, s, v)))
        weak[str(n_data)] = time_groups(step, d_table, groups)
    weak_out = {
        f"overhead_{n}": round(weak[str(n)] / (n * weak["1"]), 3)
        for n in (2, 4, 8)}
    weak_out["ideal"] = 1.0
    weak_out["note"] = ("fixed work per device on shared host cores: "
                        "t(n)/(n*t(1)); 1.0 = the sharded program adds "
                        "nothing over running the work n times; the "
                        "deficit below 1.0 is host-core parallelism")

    # ---- routed vs replicated at two table sizes (4 data x 2 table) ----
    rvr = {}
    n_data, n_table = 4, 2
    mesh = make_mesh(n_data, n_table)
    for label, pad_to in (("24k_keys", None), ("300k_keys", 280_000)):
        p2, lo2, hi2, r2, tab2, mp2 = make_table(
            np.random.default_rng(17), 200, pad_to=pad_to)
        c, s, v = genome_stream(np.random.default_rng(19), p2, 200, n_data)

        rstep = replicated_apply_step(mesh, k=K, max_probes=mp2,
                                      n_seqs=N_PROT)
        t_rep = time_groups(rstep, jnp.asarray(tab2),
                            [tuple(jnp.asarray(a) for a in (c, s, v))]
                            * N_BATCH)

        tables, mp_sh = shard_signature_table(lo2, hi2, r2, n_table)
        rows = [split_tokens_for_table_axis(
            c[i], s[i], v[i], n_table, K, N_PROT, 31)
            for i in range(n_data)]
        sc = jnp.asarray(np.stack([r[0] for r in rows]))
        ss = jnp.asarray(np.stack([r[1] for r in rows]))
        sv = jnp.asarray(np.stack([r[2] for r in rows]))
        tstep = routed_apply_step(mesh, k=K, max_probes=mp_sh,
                                  n_seqs=N_PROT)

        def time_routed():
            def run_all():
                acc = 0
                for _ in range(N_BATCH):
                    ro, h, ovf = tstep(jnp.asarray(tables), sc, ss, sv,
                                       jnp.int32(5))
                    assert int(ovf) == 0
                    acc += int(jnp.sum(h))
                return acc

            assert run_all() > 0
            t0 = time.perf_counter()
            run_all()
            return time.perf_counter() - t0

        t_rt = time_routed()
        rvr[label] = {"routed_over_replicated": round(t_rt / t_rep, 3),
                      "table_mb": round(tab2.nbytes / 1e6, 1)}
    rvr["note"] = ("(data=4, table=2) mesh; > 1.0 = all_to_all routing "
                   "costs more than replication at that table size — "
                   "routing pays off only when the table cannot be "
                   "replicated")

    print(json.dumps({"strong": strong_out, "weak": weak_out,
                      "routed_vs_replicated": rvr,
                      "platform": "cpu-virtual-8"}))


if __name__ == "__main__":
    main()
