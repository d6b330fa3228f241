"""Pallas HBM-gather probe (interpret mode) vs the XLA probe_table."""

import jax.numpy as jnp
import numpy as np

from kmers_anno_tpu.ops.hashtable import build_table, probe_table
from kmers_anno_tpu.ops.pallas_probe import extend_table, probe_table_pallas


def _mk(n_keys, seed):
    rng = np.random.default_rng(seed)
    combined = np.unique(rng.integers(0, 1 << 59, n_keys + 1000,
                                      dtype=np.uint64))[:n_keys]
    lo = (combined & np.uint64(0x3FFFFFFF)).astype(np.uint32)
    hi = (combined >> np.uint64(30)).astype(np.uint32)
    vals = rng.integers(0, 5000, n_keys, dtype=np.int64).astype(np.uint32)
    return lo, hi, vals


def test_matches_xla_probe():
    lo, hi, vals = _mk(40_000, 3)
    table, max_probes = build_table(lo, hi, vals)
    text = extend_table(table, max_probes)
    rng = np.random.default_rng(4)
    # half hits, half misses
    q = rng.integers(0, len(lo), 4096)
    qlo = np.concatenate([lo[q], rng.integers(0, 1 << 30, 4096,
                                              dtype=np.int64)
                          .astype(np.uint32)])
    qhi = np.concatenate([hi[q], rng.integers(0, 1 << 30, 4096,
                                              dtype=np.int64)
                          .astype(np.uint32)])
    valid = np.ones(len(qlo), bool)
    valid[::17] = False
    want = probe_table(jnp.asarray(table), jnp.asarray(qlo),
                       jnp.asarray(qhi), jnp.asarray(valid), max_probes)
    got = probe_table_pallas(jnp.asarray(text), jnp.asarray(qlo),
                             jnp.asarray(qhi), jnp.asarray(valid),
                             max_probes, interpret=True)
    assert (np.asarray(got) == np.asarray(want)).all()


def test_non_multiple_of_block():
    lo, hi, vals = _mk(5_000, 9)
    table, max_probes = build_table(lo, hi, vals)
    text = extend_table(table, max_probes)
    qlo, qhi = lo[:777], hi[:777]  # not a Q_BLK multiple
    valid = np.ones(777, bool)
    got = probe_table_pallas(jnp.asarray(text), jnp.asarray(qlo),
                             jnp.asarray(qhi), jnp.asarray(valid),
                             max_probes, interpret=True)
    assert (np.asarray(got) == np.asarray(vals[:777]).astype(np.int32)).all()
