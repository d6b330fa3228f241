"""Config-5 scale path, structurally end to end (SURVEY §5.8, §7 step 6):
hash-SHARDED distributed signature build → routed mesh apply, with calls
byte-identical to the single-device engine.  Runs at a CI-sized key count
on the 8-virtual-device CPU mesh; bench (benchmarks/mesh_scaling.py
``config5`` section) exercises the same code at 100M entries."""

import numpy as np
import pytest

K = 8
N_SHARDS = 2
N_DATA = 4


def _occurrences(rng, n_occ, n_roles=50):
    from kmers_anno_tpu.engine.signature import pack_kmers_np

    blob = rng.integers(0, 20, size=n_occ + K - 1).astype(np.uint8)
    lo, hi = pack_kmers_np(blob, K)
    role = rng.integers(0, n_roles, len(lo)).astype(np.int32)
    return lo, hi, role


def _shard_owner(lo, hi, n_shards):
    from kmers_anno_tpu.ops.hashing import mix_kmer

    h = mix_kmer(lo.astype(np.uint32), hi.astype(np.uint32), np)
    return (h % np.uint32(n_shards)).astype(np.int64)


def test_sharded_streaming_build_matches_unsharded():
    """Partitioning the candidate/kill streams by the routing hash and
    running one StreamingTableBuilder per shard must reproduce the
    unsharded build exactly (the distributed-build demonstration: each
    shard's group-by is independent because equal keys share a hash)."""
    from kmers_anno_tpu.engine.signature import StreamingTableBuilder

    rng = np.random.default_rng(23)
    lo, hi, role = _occurrences(rng, 200_000)
    klo, khi, _ = _occurrences(rng, 5_000)

    ref = StreamingTableBuilder()
    ref.add_candidates(lo, hi, role)
    ref.add_kills(klo, khi)
    rlo, rhi, rrole, rstats = ref.finish()

    own = _shard_owner(lo, hi, N_SHARDS)
    kown = _shard_owner(klo, khi, N_SHARDS)
    parts = []
    for s in range(N_SHARDS):
        b = StreamingTableBuilder()
        m = own == s
        b.add_candidates(lo[m], hi[m], role[m])
        km = kown == s
        b.add_kills(klo[km], khi[km])
        parts.append(b.finish())
    mlo = np.concatenate([p[0] for p in parts])
    mhi = np.concatenate([p[1] for p in parts])
    mrole = np.concatenate([p[2] for p in parts])
    order = np.lexsort((mlo, mhi))
    assert np.array_equal(mlo[order], rlo)
    assert np.array_equal(mhi[order], rhi)
    assert np.array_equal(mrole[order], rrole)
    assert sum(len(p[0]) for p in parts) == len(rlo)
    # per-shard unique/killed stats sum to the unsharded build's
    assert sum(p[3]["unique"] for p in parts) == rstats["unique"]
    assert sum(p[3]["killed"] for p in parts) == rstats["killed"]


def test_sharded_build_feeds_routed_apply_byte_identical():
    """Sharded build output → shard_signature_table → routed mesh apply:
    per-protein calls equal the single-device row engine's."""
    import jax
    import jax.numpy as jnp

    from kmers_anno_tpu.engine.signature import StreamingTableBuilder
    from kmers_anno_tpu.parallel.mesh import (make_mesh,
                                              routed_apply_step,
                                              shard_signature_table,
                                              split_tokens_for_table_axis)

    if len(jax.devices()) < N_DATA * N_SHARDS:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(29)
    lo, hi, role = _occurrences(rng, 400_000, n_roles=64)
    b = StreamingTableBuilder()
    b.add_candidates(lo, hi, role)
    blo, bhi, brole, _ = b.finish()

    # proteins with planted role segments so calls actually happen
    n_prot, plen = 256, 200
    protos = rng.integers(0, 20, size=(64, 120)).astype(np.uint8)
    # reuse table keys: plant windows that exist in the table
    from kmers_anno_tpu.engine.signature import pack_kmers_np
    prot = rng.integers(0, 20, size=(N_DATA, n_prot, plen)).astype(np.uint8)
    prot[:, :, 50:170] = protos[rng.integers(0, 64, (N_DATA, n_prot))]
    # rebuild the table INCLUDING the proto kmers so hits exist
    plo_all, phi_all, prole_all = [], [], []
    for r in range(64):
        plo, phi = pack_kmers_np(protos[r], K)
        plo_all.append(plo)
        phi_all.append(phi)
        prole_all.append(np.full(len(plo), r, np.int32))
    b2 = StreamingTableBuilder()
    b2.add_candidates(np.concatenate([blo] + plo_all),
                      np.concatenate([bhi] + phi_all),
                      np.concatenate([brole] + prole_all))
    blo, bhi, brole, _ = b2.finish()

    codes = prot.reshape(N_DATA, -1)
    seg = np.broadcast_to(
        np.repeat(np.arange(n_prot, dtype=np.int32), plen),
        codes.shape).copy()
    valid = np.ones(codes.shape, bool)
    for i in range(1, n_prot + 1):
        valid[:, i * plen - K + 1: i * plen] = False

    mesh = make_mesh(N_DATA, N_SHARDS)
    tables, mp = shard_signature_table(blo, bhi, brole, N_SHARDS)
    rows = [split_tokens_for_table_axis(codes[i], seg[i], valid[i],
                                        N_SHARDS, K, n_prot, 31)
            for i in range(N_DATA)]
    sc = jnp.asarray(np.stack([r[0] for r in rows]))
    ss = jnp.asarray(np.stack([r[1] for r in rows]))
    sv = jnp.asarray(np.stack([r[2] for r in rows]))
    step = routed_apply_step(mesh, k=K, max_probes=mp, n_seqs=n_prot)
    roles_m, hits_m, ovf = step(jnp.asarray(tables), sc, ss, sv,
                                jnp.int32(5))
    assert int(ovf) == 0
    roles_m = np.asarray(roles_m).reshape(N_DATA, n_prot)
    hits_m = np.asarray(hits_m).reshape(N_DATA, n_prot)

    # single-device reference: flat-stream apply on each data row
    from kmers_anno_tpu.engine.apply_engine import apply_flat
    from kmers_anno_tpu.ops.hashtable import build_table
    ftab, fmp = build_table(blo, bhi, brole.astype(np.uint32))
    d_ftab = jnp.asarray(ftab)
    for i in range(N_DATA):
        r1, h1 = apply_flat(d_ftab, jnp.asarray(codes[i]),
                            jnp.asarray(seg[i]), jnp.asarray(valid[i]),
                            jnp.int32(5), k=K, max_probes=fmp,
                            n_seqs=n_prot)
        assert np.array_equal(np.asarray(r1), roles_m[i])
        assert np.array_equal(np.asarray(h1), hits_m[i])
    assert (roles_m >= 0).sum() > 0
