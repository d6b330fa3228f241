"""Sort-and-stream big-table probe vs the XLA gather probe.

The sliced probe must be bit-identical to ops.hashtable.probe_table on
every input — including miss-heavy batches, invalid masks, duplicate-key
skew (the qwin-overflow fallback), tiny tables (one slice) and the
engine-level auto-selection path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from kmers_anno_tpu.ops import sliced_probe
from kmers_anno_tpu.ops.hashtable import build_table, probe_table
from kmers_anno_tpu.ops.sliced_probe import (pick_probe, probe_table_sliced,
                                             probe_windowed, windowed_table)


def _mk(n_keys, seed):
    rng = np.random.default_rng(seed)
    combined = np.unique(rng.integers(0, 1 << 59, n_keys + 1000,
                                      dtype=np.uint64))[:n_keys]
    lo = (combined & np.uint64(0x3FFFFFFF)).astype(np.uint32)
    hi = (combined >> np.uint64(30)).astype(np.uint32)
    vals = rng.integers(0, 5000, n_keys, dtype=np.int64).astype(np.uint32)
    return lo, hi, vals


def _queries(lo, hi, n, seed, miss_frac=0.3):
    rng = np.random.default_rng(seed)
    q = rng.integers(0, len(lo), n)
    qlo, qhi = lo[q].copy(), hi[q].copy()
    flip = rng.random(n) < miss_frac
    qlo[flip] ^= np.uint32(0x5)
    valid = np.ones(n, bool)
    valid[::17] = False
    return qlo, qhi, valid


@pytest.mark.parametrize("n_keys,n_q", [(40_000, 10_000), (300_000, 50_000),
                                        (1_000, 333)])
def test_matches_plain_probe(n_keys, n_q):
    lo, hi, vals = _mk(n_keys, 3)
    table, max_probes = build_table(lo, hi, vals)
    wt = windowed_table(table, max_probes)
    qlo, qhi, valid = _queries(lo, hi, n_q, seed=4)
    want = np.asarray(probe_table(
        jnp.asarray(table), jnp.asarray(qlo), jnp.asarray(qhi),
        jnp.asarray(valid), max_probes))
    got = np.asarray(probe_table_sliced(
        jnp.asarray(wt), jnp.asarray(qlo), jnp.asarray(qhi),
        jnp.asarray(valid), max_probes))
    goww = np.asarray(probe_windowed(
        jnp.asarray(wt), jnp.asarray(qlo), jnp.asarray(qhi),
        jnp.asarray(valid), max_probes))
    assert (got == want).all()
    assert (goww == want).all()


def test_duplicate_skew_overflow_fallback():
    """Every query identical → one slice owns all queries → qwin overflow
    → the in-jit fallback must still produce exact results."""
    lo, hi, vals = _mk(200_000, 7)
    table, max_probes = build_table(lo, hi, vals)
    wt = windowed_table(table, max_probes)
    n = 50_000
    qlo = np.full(n, lo[123], np.uint32)
    qhi = np.full(n, hi[123], np.uint32)
    valid = np.ones(n, bool)
    got = np.asarray(probe_table_sliced(
        jnp.asarray(wt), jnp.asarray(qlo), jnp.asarray(qhi),
        jnp.asarray(valid), max_probes))
    assert (got == np.int32(vals[123])).all()


def test_windowed_table_wraps():
    """Probe walks that wrap past the last bucket must still resolve."""
    lo, hi, vals = _mk(3_000, 11)
    # overfill to force longer walks and wraparound
    table, max_probes = build_table(lo, hi, vals, load_factor=0.9)
    assert max_probes >= 2
    wt = windowed_table(table, max_probes)
    valid = np.ones(len(lo), bool)
    want = np.asarray(probe_table(
        jnp.asarray(table), jnp.asarray(lo), jnp.asarray(hi),
        jnp.asarray(valid), max_probes))
    got = np.asarray(probe_table_sliced(
        jnp.asarray(wt), jnp.asarray(lo), jnp.asarray(hi),
        jnp.asarray(valid), max_probes))
    assert (want == vals.astype(np.int32)).all()
    assert (got == want).all()


def test_engine_auto_selects_sliced(monkeypatch, tmp_path):
    """KmerApplyEngine over a forced-sliced table calls the same roles."""
    from kmers_anno_tpu.engine.apply_engine import KmerApplyEngine
    from kmers_anno_tpu.engine.signature import SignatureTable

    rng = np.random.default_rng(5)
    aa = "ACDEFGHIKLMNPQRSTVWY"
    protos = ["".join(aa[c] for c in rng.integers(0, 20, size=60))
              for _ in range(40)]
    from kmers_anno_tpu.engine.signature import pack_kmers_np
    from kmers_anno_tpu.ops.encode import encode_protein
    los, his, roles = [], [], []
    for r in range(40):
        l_, h_ = pack_kmers_np(encode_protein(protos[r]), 8)
        los.append(l_)
        his.append(h_)
        roles.append(np.full(len(l_), r, np.int32))
    lo = np.concatenate(los)
    hi = np.concatenate(his)
    role = np.concatenate(roles)
    key = (hi.astype(np.uint64) << np.uint64(32)) | lo
    _, idx = np.unique(key, return_index=True)
    sig = SignatureTable(
        k=8, key_lo=lo[idx], key_hi=hi[idx], role_idx=role[idx],
        role_ids=[f"R{i}" for i in range(40)])

    prots = []
    for i in range(64):
        body = "".join(aa[c] for c in rng.integers(0, 20, size=120))
        prots.append(body[:20] + protos[i % 40] + body[80:])

    plain = KmerApplyEngine(sig, min_hits=5).call_proteins(prots)
    assert plain[0] is not None  # wide path sanity

    from kmers_anno_tpu.ops import widetable
    monkeypatch.setattr(widetable, "MAX_MU", 0.0)  # disable the wide path
    monkeypatch.setattr(sliced_probe, "SLICED_THRESHOLD_BYTES", 0)
    eng = KmerApplyEngine(sig, min_hits=5)
    assert eng.mode == "flat" and eng.sliced
    assert eng.call_proteins(prots) == plain
    assert sum(c is not None for c in plain) == 64


def test_pick_probe_threshold():
    assert not pick_probe(1 << 20)
    assert pick_probe(1 << 30)


def test_payload_mode_matches_sorted():
    """payload mode returns the same (value per query) multiset, paired
    with its rider, without the restore sort."""
    import jax.numpy as jnp

    from kmers_anno_tpu.ops.hashtable import build_table
    from kmers_anno_tpu.ops.sliced_probe import (probe_table_sliced,
                                                 windowed_table)

    rng = np.random.default_rng(17)
    n_keys, n_q = 300_000, 100_000
    keys = np.unique(rng.integers(0, 1 << 59, n_keys + 9000,
                                  dtype=np.uint64))[:n_keys]
    lo = (keys & np.uint64(0x3FFFFFFF)).astype(np.uint32)
    hi = (keys >> np.uint64(30)).astype(np.uint32)
    vals = rng.integers(0, 1000, n_keys).astype(np.uint32)
    table, mp = build_table(lo, hi, vals)
    wt = jnp.asarray(windowed_table(table, mp))
    qi = rng.integers(0, n_keys, n_q)
    qlo = np.where(rng.random(n_q) < 0.7, lo[qi],
                   rng.integers(0, 1 << 30, n_q)).astype(np.uint32)
    qhi = hi[qi]
    valid = rng.random(n_q) < 0.9
    ref = np.asarray(probe_table_sliced(
        wt, jnp.asarray(qlo), jnp.asarray(qhi), jnp.asarray(valid), mp))
    got_v, got_p = probe_table_sliced(
        wt, jnp.asarray(qlo), jnp.asarray(qhi), jnp.asarray(valid), mp,
        payload=jnp.arange(n_q, dtype=jnp.int32))
    got_v, got_p = np.asarray(got_v), np.asarray(got_p)
    # rider == original position here, so scatter-back must equal ref
    back = np.full(n_q, -2, np.int32)
    back[got_p] = got_v
    assert np.array_equal(back, ref)
