"""Mesh scaling harness: replicated-table apply at data = 1, 2, 4, 8.

Runs on a virtual 8-device CPU mesh (bench.py launches it with
JAX_PLATFORMS=cpu and --xla_force_host_platform_device_count=8); measures
how the fused apply step scales along the ``data`` axis with everything
else fixed.  Virtual CPU devices share the host's cores, so absolute
numbers mean nothing — the EFFICIENCY column is the harness's product:
it exposes sharding/collective overhead in the compiled program (the
BASELINE ≥80 % scaling target's measurable stand-in until a multi-chip
pod is available; see parallel/mesh.py for the real-chip path, which is
the same code).

Prints one JSON line: {"1": proteins_per_s, ..., "efficiency_8": f}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from kmers_anno_tpu.engine.signature import pack_kmers_np
    from kmers_anno_tpu.ops.hashtable import build_table
    from kmers_anno_tpu.parallel.mesh import (make_mesh,
                                              replicated_apply_step)

    assert len(jax.devices()) >= 8, jax.devices()

    k = 8
    n_roles = 200
    n_prot = 1024
    plen = 300
    n_batch = 4
    rng = np.random.default_rng(11)

    protos = rng.integers(0, 20, size=(n_roles, 120)).astype(np.uint8)
    lo_all, hi_all, role_all = [], [], []
    for r in range(n_roles):
        lo, hi = pack_kmers_np(protos[r], k)
        lo_all.append(lo)
        hi_all.append(hi)
        role_all.append(np.full(len(lo), r, np.int32))
    lo = np.concatenate(lo_all)
    hi = np.concatenate(hi_all)
    role = np.concatenate(role_all)
    _, idx = np.unique((hi.astype(np.uint64) << np.uint64(32)) | lo,
                       return_index=True)
    table, max_probes = build_table(lo[idx], hi[idx],
                                    role[idx].astype(np.uint32))
    d_table = jnp.asarray(table)

    def genome_stream(n_rows):
        prot = rng.integers(0, 20, size=(n_rows, n_prot, plen)).astype(
            np.uint8)
        prot[:, :, 100:220] = protos[
            rng.integers(0, n_roles, size=(n_rows, n_prot))]
        codes = prot.reshape(n_rows, -1)
        seg = np.broadcast_to(
            np.repeat(np.arange(n_prot, dtype=np.int32), plen),
            codes.shape).copy()
        valid = np.ones(codes.shape, bool)
        for i in range(1, n_prot + 1):
            valid[:, i * plen - k + 1: i * plen] = False
        return codes, seg, valid

    # FIXED total work (8 genomes), sharded n_data ways: virtual devices
    # share the host's cores, so overhead-free sharding keeps wall time
    # constant; t(1)/t(n) below 1.0 is mesh/collective/sharding overhead.
    total_rows = 8
    all_batches = [genome_stream(total_rows) for _ in range(n_batch)]
    out = {}
    for n_data in (1, 2, 4, 8):
        mesh = make_mesh(n_data, 1)
        step = replicated_apply_step(mesh, k=k, max_probes=max_probes,
                                     n_seqs=n_prot)
        groups = []
        for c, s, v in all_batches:
            for i in range(0, total_rows, n_data):
                groups.append(tuple(jnp.asarray(a[i: i + n_data])
                                    for a in (c, s, v)))

        def run_all():
            acc = 0
            for c, s, v in groups:
                r, h = step(d_table, c, s, v, jnp.int32(5))
                acc += int(jnp.sum(h))
            return acc

        run_all()  # compile + warm
        t0 = time.perf_counter()
        checksum = run_all()
        dt = time.perf_counter() - t0
        assert checksum > 0
        out[str(n_data)] = round(n_batch * total_rows * n_prot / dt, 1)

    out["overhead_efficiency_8"] = round(out["8"] / out["1"], 3)
    out["note"] = ("cpu-virtual, fixed total work: devices share host "
                   "cores, so 1.0 = zero sharding overhead")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
