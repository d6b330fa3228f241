"""Build→apply end-to-end: device engines vs the pure-Python oracle."""

import random

import numpy as np
import pytest

from kmers_anno_tpu.engine.apply_engine import KmerApplyEngine
from kmers_anno_tpu.engine.signature import (SignatureTable, build_signatures,
                                             pack_kmers_np, unpack_kmer_np)
from kmers_anno_tpu.ops.encode import encode_protein, decode_protein

from fixtures import (ROLE_DEFS, make_genome, make_role_map, random_protein,
                       write_role_files)
from oracle import oracle_apply_protein, oracle_build, protein_kmers

GOOD_ROLES = {rid for rid, _ in ROLE_DEFS[:4]}
K = 8


@pytest.fixture(scope="module")
def genomes():
    shared = random_protein(random.Random(999), 70)
    return [make_genome(f"100{i}.1", seed=i, shared_protein=shared if i == 0 else None)
            for i in range(3)]


@pytest.fixture(scope="module")
def role_map():
    return make_role_map()


@pytest.fixture(scope="module")
def oracle_db(genomes, role_map):
    return oracle_build(genomes, role_map, GOOD_ROLES, k=K)


@pytest.fixture(scope="module")
def built(genomes, role_map):
    return build_signatures(genomes, role_map, GOOD_ROLES, k=K,
                            progress=False)


def test_pack_roundtrip():
    prot = "MKVLAWYCDEFGHINPQRST"
    codes = encode_protein(prot)
    lo, hi = pack_kmers_np(codes, K)
    texts = [decode_protein(row) for row in unpack_kmer_np(lo, hi, K)]
    assert texts == protein_kmers(prot, K)


def test_build_matches_oracle(built, oracle_db):
    device_db = dict(zip(built.kmer_texts(),
                         (built.role_ids[r] for r in built.role_idx)))
    assert device_db == oracle_db


def test_build_has_all_branches(genomes, role_map, oracle_db):
    """The fixture must exercise prune + kill; otherwise the test is weak."""
    stats_table = build_signatures(genomes, role_map, GOOD_ROLES, k=K,
                                   progress=False)
    assert stats_table.stats["pruned"] > 0, "no non-unanimous kmers generated"
    assert stats_table.stats["killed"] > 0, "no kill-list overlap generated"
    assert len(oracle_db) > 100


def test_save_load_roundtrip(built, tmp_path):
    path = str(tmp_path / "kmerdb.tbl")
    built.save(path)
    loaded = SignatureTable.load(path)
    assert loaded.k == K
    orig = dict(zip(built.kmer_texts(),
                    (built.role_ids[r] for r in built.role_idx)))
    back = dict(zip(loaded.kmer_texts(),
                    (loaded.role_ids[r] for r in loaded.role_idx)))
    assert back == orig


@pytest.mark.parametrize("min_hits", [1, 5])
def test_apply_matches_oracle(built, oracle_db, genomes, min_hits):
    engine = KmerApplyEngine(built, min_hits=min_hits)
    for genome in genomes:
        pegs = [f for f in genome.pegs if f.protein_translation]
        got = engine.call_proteins([f.protein_translation for f in pegs])
        want = [oracle_apply_protein(oracle_db, f.protein_translation, K,
                                     min_hits) for f in pegs]
        assert got == want
        # sanity: at least one call and one non-call in the fixture
    engine5 = KmerApplyEngine(built, min_hits=1)
    calls = engine5.call_proteins(
        [f.protein_translation for g in genomes for f in g.pegs
         if f.protein_translation])
    assert any(c is not None for c in calls)
    assert any(c is None for c in calls)


def test_apply_conflicting_protein(built, oracle_db):
    """A chimera of two roles' proteins must be voted bad (Q9)."""
    by_role = {}
    for km, rid in oracle_db.items():
        by_role.setdefault(rid, []).append(km)
    rids = sorted(by_role)[:2]
    chimera = by_role[rids[0]][0] + by_role[rids[1]][0]
    engine = KmerApplyEngine(built, min_hits=1)
    assert oracle_apply_protein(oracle_db, chimera, K, 1) is None
    assert engine.call_proteins([chimera]) == [None]


def test_apply_empty_and_short(built):
    engine = KmerApplyEngine(built, min_hits=1)
    assert engine.call_proteins(["MKV"]) == [None]   # shorter than K
    assert engine.call_proteins([]) == []


def test_cli_build_apply(genomes, role_map, oracle_db, tmp_path, capsys):
    """End-to-end through the CLI: build a DB file, apply in both formats."""
    from kmers_anno_tpu.commands.app import main

    gto_dir = tmp_path / "gtos"
    gto_dir.mkdir()
    for g in genomes:
        g.save(str(gto_dir / f"{g.id}.gto"))
    role_file, use_file = write_role_files(tmp_path)
    db_file = str(tmp_path / "kmerdb.tbl")

    rc = main(["build", "-K", str(K), "-o", db_file, role_file, use_file,
               str(gto_dir)])
    assert rc == 0
    db_lines = {tuple(line.split("\t"))
                for line in open(db_file).read().splitlines()}
    assert db_lines == set(oracle_db.items())

    out_file = str(tmp_path / "verify.tbl")
    rc = main(["apply", "--format", "VERIFY", "-m", "1", "-o", out_file,
               db_file, use_file, str(gto_dir)])
    assert rc == 0
    lines = open(out_file).read().splitlines()
    assert lines[0] == "genome_id\tpeg_id\trole\thits\tfunction"
    # oracle expectation
    want = []
    for g in sorted(genomes, key=lambda g: g.id):
        for f in g.pegs:
            call = oracle_apply_protein(oracle_db, f.protein_translation,
                                        K, 1)
            if call:
                want.append(f"{g.id}\t{f.id}\t{call[0]}\t{call[1]}\t"
                            f"{f.function}")
    assert lines[1:] == want

    train_file = str(tmp_path / "train.tbl")
    rc = main(["apply", "-m", "1", "-o", train_file, db_file, use_file,
               str(gto_dir)])
    assert rc == 0
    train = open(train_file).read().splitlines()
    # no header; one row per genome; counts in roles.to.use order
    assert len(train) == len(genomes)
    role_order = [rid for rid, _ in ROLE_DEFS[:4]]
    for row, g in zip(train, sorted(genomes, key=lambda g: g.id)):
        fields = row.split("\t")
        assert fields[0] == g.id
        counts = [0] * len(role_order)
        for f in g.pegs:
            call = oracle_apply_protein(oracle_db, f.protein_translation,
                                        K, 1)
            if call and call[0] in role_order:
                counts[role_order.index(call[0])] += 1
        assert fields[1:] == [str(c) for c in counts]
