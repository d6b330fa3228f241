"""Mesh-sharded apply steps on the 8-device virtual CPU mesh: replicated
and hash-sharded table layouts must agree with the single-device engine."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kmers_anno_tpu.engine.apply_engine import FlatBatch, apply_flat
from kmers_anno_tpu.engine.signature import build_signatures
from kmers_anno_tpu.parallel.mesh import (make_mesh, replicated_apply_step,
                                          shard_signature_table,
                                          sharded_apply_step)

from fixtures import ROLE_DEFS, make_genome, make_role_map

K = 8
GOOD_ROLES = {rid for rid, _ in ROLE_DEFS[:4]}


@pytest.fixture(scope="module")
def setup():
    genomes = [make_genome(f"200{i}.1", seed=100 + i) for i in range(4)]
    table = build_signatures(genomes, make_role_map(), GOOD_ROLES, k=K,
                             progress=False)
    # 4 token streams (one per genome), identical static bucket shapes
    batches = [FlatBatch([f.protein_translation for f in g.pegs
                          if f.protein_translation], K) for g in genomes]
    width = max(len(b.codes) for b in batches)
    n_seqs = max(b.n_seqs for b in batches)
    assert all(len(b.codes) == width and b.n_seqs == n_seqs
               for b in batches), "fixture genomes must bucket identically"
    codes = np.stack([b.codes for b in batches])
    seg_ids = np.stack([b.seg_ids for b in batches])
    valid = np.stack([b.valid for b in batches])
    return table, codes, seg_ids, valid, n_seqs


def _single_device_expected(table, codes, seg_ids, valid, n_seqs):
    dev_table, max_probes = table.device_table()
    roles, hits = [], []
    for i in range(codes.shape[0]):
        r, h = apply_flat(dev_table, jnp.asarray(codes[i]),
                          jnp.asarray(seg_ids[i]), jnp.asarray(valid[i]),
                          jnp.int32(1), k=K, max_probes=max_probes,
                          n_seqs=n_seqs)
        roles.append(np.asarray(r))
        hits.append(np.asarray(h))
    return np.stack(roles), np.stack(hits)


def test_replicated_apply(setup):
    table, codes, seg_ids, valid, n_seqs = setup
    want_roles, want_hits = _single_device_expected(
        table, codes, seg_ids, valid, n_seqs)
    mesh = make_mesh(4, 2)
    dev_table, max_probes = table.device_table()
    step = replicated_apply_step(mesh, k=K, max_probes=max_probes,
                                 n_seqs=n_seqs)
    roles, hits = step(dev_table, jnp.asarray(codes), jnp.asarray(seg_ids),
                       jnp.asarray(valid), jnp.int32(1))
    np.testing.assert_array_equal(np.asarray(roles), want_roles)
    np.testing.assert_array_equal(np.asarray(hits), want_hits)


@pytest.mark.parametrize("n_table", [2, 4])
def test_sharded_apply(setup, n_table):
    table, codes, seg_ids, valid, n_seqs = setup
    want_roles, want_hits = _single_device_expected(
        table, codes, seg_ids, valid, n_seqs)
    n_data = 8 // n_table
    mesh = make_mesh(n_data, n_table)
    tables, max_probes = shard_signature_table(
        table.key_lo, table.key_hi, table.role_idx, n_table)
    # replicate data rows onto the data axis size
    reps = -(-codes.shape[0] // n_data) if codes.shape[0] % n_data else 1
    assert codes.shape[0] % n_data == 0
    step = sharded_apply_step(mesh, k=K, max_probes=max_probes,
                              n_seqs=n_seqs)
    roles, hits = step(jnp.asarray(tables), jnp.asarray(codes),
                       jnp.asarray(seg_ids), jnp.asarray(valid),
                       jnp.int32(1))
    np.testing.assert_array_equal(np.asarray(roles), want_roles)
    np.testing.assert_array_equal(np.asarray(hits), want_hits)


def test_shard_partition_covers_all_keys(setup):
    table = setup[0]
    tables, _ = shard_signature_table(table.key_lo, table.key_hi,
                                      table.role_idx, 4)
    from kmers_anno_tpu.ops.hashtable import BUCKET, EMPTY
    n_stored = int((tables[:, :, :BUCKET] != EMPTY).sum())
    assert n_stored == len(table)
