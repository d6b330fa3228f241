"""Wide-bucket single-gather table + row-layout apply engine tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from kmers_anno_tpu.ops.widetable import (build_wide_table, fits_wide,
                                          probe_wide, wide_rows_for, SLOTS)
from kmers_anno_tpu.ops.vote import (weighted_vote_dense,
                                     weighted_vote_rows)


def _rand_keys(rng, n):
    key = np.unique(rng.integers(0, 1 << 59, n * 2, dtype=np.uint64))[:n]
    lo = (key & np.uint64(0x3FFFFFFF)).astype(np.uint32)
    hi = (key >> np.uint64(30)).astype(np.uint32)
    return lo, hi


def test_build_probe_roundtrip():
    rng = np.random.default_rng(0)
    lo, hi = _rand_keys(rng, 5000)
    vals = rng.integers(0, 1000, len(lo)).astype(np.uint32)
    table, salt, mp = build_wide_table(lo, hi, vals)
    assert mp == 1  # salt retry should find an overflow-free placement
    got = np.asarray(probe_wide(
        jnp.asarray(table), jnp.asarray(lo), jnp.asarray(hi),
        jnp.ones(len(lo), bool), jnp.uint32(salt), max_probes=mp))
    assert (got == vals.astype(np.int32)).all()

    # missing keys return -1; invalid queries return -1
    mlo, mhi = _rand_keys(np.random.default_rng(1), 2000)
    key = (hi.astype(np.uint64) << np.uint64(32)) | lo
    mkey = (mhi.astype(np.uint64) << np.uint64(32)) | mlo
    fresh = ~np.isin(mkey, key)
    got = np.asarray(probe_wide(
        jnp.asarray(table), jnp.asarray(mlo), jnp.asarray(mhi),
        jnp.ones(len(mlo), bool), jnp.uint32(salt), max_probes=mp))
    assert (got[fresh] == -1).all()
    got = np.asarray(probe_wide(
        jnp.asarray(table), jnp.asarray(lo), jnp.asarray(hi),
        jnp.zeros(len(lo), bool), jnp.uint32(salt), max_probes=mp))
    assert (got == -1).all()


def test_overflow_walk_still_correct():
    """Forced overflow (tiny row count) falls back to a bucket walk."""
    rng = np.random.default_rng(0)
    lo, hi = _rand_keys(rng, 48)
    vals = np.arange(48, dtype=np.uint32)
    # max_salts=1 + 48 keys on 2 rows: seed 0 overflows the home buckets
    table, salt, mp = build_wide_table(lo, hi, vals, n_rows=2, max_salts=1)
    assert mp >= 2
    got = np.asarray(probe_wide(
        jnp.asarray(table), jnp.asarray(lo), jnp.asarray(hi),
        jnp.ones(48, bool), jnp.uint32(salt), max_probes=mp))
    assert (got == vals.astype(np.int32)).all()


def test_capacity_limits():
    assert wide_rows_for(1_000_000) == 1 << 17
    assert fits_wide(3_000_000)
    assert not fits_wide(4_000_000)
    with pytest.raises(ValueError):
        build_wide_table(*_rand_keys(np.random.default_rng(3), 30),
                         np.arange(30, dtype=np.uint32), n_rows=1)


def test_weighted_vote_rows_matches_dense():
    rng = np.random.default_rng(4)
    B, L, R = 64, 96, 17
    roles = rng.integers(-1, R, (B, L)).astype(np.int32)
    weights = rng.random((B, L)).astype(np.float32)
    valid = rng.random((B, L)) < 0.8
    flat_seg = np.repeat(np.arange(B, dtype=np.int32), L)
    want_r, want_t = weighted_vote_dense(
        jnp.asarray(roles.reshape(-1)), jnp.asarray(weights.reshape(-1)),
        jnp.asarray(flat_seg), jnp.asarray(valid.reshape(-1)),
        jnp.float32(0.5), n_seqs=B, n_roles=R)
    got_r, got_t = weighted_vote_rows(
        jnp.asarray(roles), jnp.asarray(weights), jnp.asarray(valid),
        jnp.float32(0.5))
    assert (np.asarray(got_r) == np.asarray(want_r)).all()
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               rtol=1e-5)


def test_row_engine_mixed_lengths():
    """Wide/row engine == flat engine on wildly mixed protein lengths."""
    from kmers_anno_tpu.engine.apply_engine import (KmerApplyEngine,
                                                    make_row_batches)
    from kmers_anno_tpu.engine.signature import SignatureTable
    from kmers_anno_tpu.ops import widetable

    rng = np.random.default_rng(5)
    aa = "ACDEFGHIKLMNPQRSTVWY"
    protos = ["".join(aa[c] for c in rng.integers(0, 20, 40))
              for _ in range(20)]
    from kmers_anno_tpu.engine.signature import pack_kmers_np
    from kmers_anno_tpu.ops.encode import encode_protein
    los, his, roles = [], [], []
    for r, p in enumerate(protos):
        l_, h_ = pack_kmers_np(encode_protein(p), 8)
        los.append(l_)
        his.append(h_)
        roles.append(np.full(len(l_), r, np.int32))
    lo, hi, role = map(np.concatenate, (los, his, roles))
    key = (hi.astype(np.uint64) << np.uint64(32)) | lo
    _, idx = np.unique(key, return_index=True)
    sig = SignatureTable(k=8, key_lo=lo[idx], key_hi=hi[idx],
                         role_idx=role[idx],
                         role_ids=[f"R{i}" for i in range(20)])

    prots = []
    for i, ln in enumerate([3, 9, 41, 70, 120, 350, 801, 1500, 4000]):
        body = "".join(aa[c] for c in rng.integers(0, 20, max(ln, 40)))
        p = (body[:ln] if ln < 45
             else body[: ln - 40] + protos[i % 20])[:ln]
        prots.append(p)
    prots *= 8  # enough rows to form batches

    wide_eng = KmerApplyEngine(sig, min_hits=5)
    assert wide_eng.mode == "wide"
    got = wide_eng.call_proteins(prots)

    import pytest
    mp = pytest.MonkeyPatch()
    try:
        mp.setattr(widetable, "MAX_MU", 0.0)
        flat_eng = KmerApplyEngine(sig, min_hits=5)
        assert flat_eng.mode == "flat"
        want = flat_eng.call_proteins(prots)
    finally:
        mp.undo()
    assert got == want
    assert any(c is not None for c in got)

    # batches cover every protein exactly once
    batches = make_row_batches(prots, 8)
    seen = np.concatenate([b.idx for b in batches])
    assert sorted(seen) == list(range(len(prots)))
