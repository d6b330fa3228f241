"""Round-5 gap closures: loud PATRIC cache-less enumeration, the
ProteinKmers drop-last window fence (SURVEY §2c Q1 / §7 hard part 4),
and the RLE-probe cap clamp (ADVICE r4 medium)."""

import numpy as np
import pytest

from tests.fixtures import make_genome


# ---------------------------------------------------------------------------
# PATRIC enumeration must fail loudly without a cache or ID file
# ---------------------------------------------------------------------------

def test_patric_cacheless_ids_raises():
    from kmers_anno_tpu.genome.sources import PatricGenomeSource

    src = PatricGenomeSource(None)
    with pytest.raises(RuntimeError, match="genome-ID file or a cache"):
        src.ids()


def test_patric_id_file_and_cache_still_enumerate(tmp_path):
    from kmers_anno_tpu.genome.sources import PatricGenomeSource

    idf = tmp_path / "ids.tbl"
    idf.write_text("genome_id\n100.1\n200.2\n")
    assert PatricGenomeSource(str(idf)).ids() == ["100.1", "200.2"]
    cache = tmp_path / "cache"
    cache.mkdir()
    make_genome("300.3", seed=1).save(str(cache / "300.3.gto"))
    assert PatricGenomeSource(str(cache)).ids() == ["300.3"]


# ---------------------------------------------------------------------------
# drop-last window fence
# ---------------------------------------------------------------------------

@pytest.fixture
def drop_last_on():
    from kmers_anno_tpu.engine.protein_kmers import set_drop_last

    set_drop_last(True)
    yield
    set_drop_last(False)


def test_protein_kmers_window_count_default():
    from kmers_anno_tpu.engine.protein_kmers import ProteinKmers

    prot = "MKLVANQRST"                       # L=10, K=8 → 3 windows
    assert len(ProteinKmers(prot, 8)) == 3
    assert "LVANQRST" in ProteinKmers(prot, 8).kmers  # the final window


def test_protein_kmers_window_count_drop_last(drop_last_on):
    from kmers_anno_tpu.engine.protein_kmers import ProteinKmers

    prot = "MKLVANQRST"
    pk = ProteinKmers(prot, 8)
    assert len(pk) == 2                       # L−K windows
    assert "LVANQRST" not in pk.kmers
    # a protein of exactly K letters yields nothing in drop-last mode
    assert len(ProteinKmers("MKLVANQR", 8)) == 0


def test_flat_protein_keys_drop_last(drop_last_on):
    from kmers_anno_tpu.engine.signature import _flat_protein_keys

    prots = ["MKLVANQRST", "MKLVANQR", "ACDEFGHIKLMN"]
    lo, hi, seg = _flat_protein_keys(prots, 8)
    # L−K windows per protein: 2, 0, 4
    assert list(np.bincount(seg, minlength=3)) == [2, 0, 4]


def test_flat_protein_keys_default_keeps_last():
    from kmers_anno_tpu.engine.signature import _flat_protein_keys

    prots = ["MKLVANQRST", "MKLVANQR", "ACDEFGHIKLMN"]
    lo, hi, seg = _flat_protein_keys(prots, 8)
    assert list(np.bincount(seg, minlength=3)) == [3, 1, 5]


def test_apply_batches_drop_last(drop_last_on):
    from kmers_anno_tpu.engine.apply_engine import FlatBatch, RowBatch

    prots = ["MKLVANQRST", "ACDEFGHIKLMN"]
    fb = FlatBatch(prots, 8)
    assert int(fb.valid.sum()) == 2 + 4
    rb = RowBatch(prots, 8, np.arange(2))
    assert int(rb.valid.sum()) == 2 + 4
    assert list(rb.valid[:2, :5].sum(axis=1)) == [2, 4]  # rows pad to 8


def test_apply_drop_last_row_semantics(drop_last_on):
    from kmers_anno_tpu.engine.protein_kmers import apply_drop_last

    valid = np.array([[1, 1, 1, 0, 0], [1, 0, 0, 0, 0]], dtype=bool)
    out = apply_drop_last(valid)
    assert out.tolist() == [[1, 1, 0, 0, 0], [0, 0, 0, 0, 0]]


def test_build_apply_drop_last_end_to_end(tmp_path, drop_last_on):
    """build → apply under drop-last still calls the planted roles (the
    toggle shifts window counts consistently on both sides)."""
    from kmers_anno_tpu.commands.app import main
    from tests.fixtures import write_role_files

    role_map_file, role_id_file = write_role_files(tmp_path)
    gto_dir = tmp_path / "gtos"
    gto_dir.mkdir()
    for gid, seed in (("100.1", 1), ("200.2", 2)):
        make_genome(gid, seed=seed).save(str(gto_dir / f"{gid}.gto"))
    db = str(tmp_path / "kmerdb.tbl")
    assert main(["build", "--dropLast", "-o", db, role_map_file,
                 role_id_file, str(gto_dir)]) == 0
    out = str(tmp_path / "verify.tbl")
    assert main(["apply", "--dropLast", "--format", "VERIFY", "-m", "3",
                 "-o", out, db, role_id_file, str(gto_dir)]) == 0
    lines = open(out).read().strip().splitlines()
    assert len(lines) > 1                      # header + real calls


# ---------------------------------------------------------------------------
# RLE probe cap clamp (ADVICE r4 medium)
# ---------------------------------------------------------------------------

def test_probe_rle_cap_exceeding_stream_length():
    """cap/rcap larger than the stream must clamp instead of crashing
    the jitted probe with a broadcast shape mismatch."""
    import jax.numpy as jnp

    from kmers_anno_tpu.engine.projection import _probe_rle
    from kmers_anno_tpu.ops.hashtable import MAX_DEVICE_PROBES, build_table

    keys_lo = np.arange(4, dtype=np.uint32)
    keys_hi = np.arange(4, dtype=np.uint32) + 100
    table, mp = build_table(keys_lo, keys_hi,
                            np.arange(4, dtype=np.uint32))
    n = 24                                    # stream length, not pow2
    d_lo = jnp.asarray(np.resize(keys_lo, n))
    d_hi = jnp.asarray(np.resize(keys_hi, n))
    d_valid = jnp.ones(n, bool)
    starts, pegs, lens, n_runs, n_hits = _probe_rle(
        jnp.asarray(table), d_lo, d_hi, d_valid,
        cap=64, rcap=64, max_probes=mp)       # cap > stream length
    assert int(n_hits) == n
    total = int(np.asarray(lens)[: int(n_runs)].sum())
    assert total == n
