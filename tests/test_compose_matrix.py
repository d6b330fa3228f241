"""The feature matrix composes (r2 verdict item 3): --weighted × --mesh,
DNA × --mesh, and --weighted × DNA must each match their single-device /
unweighted counterparts on the 8-device virtual CPU mesh."""

import random

import pytest

from kmers_anno_tpu.commands.app import main
from kmers_anno_tpu.engine.apply_engine import KmerApplyEngine
from kmers_anno_tpu.engine.dna_apply import DnaApplyEngine
from kmers_anno_tpu.engine.mesh_apply import (DnaMeshApplyEngine,
                                              MeshApplyEngine)
from kmers_anno_tpu.engine.signature import build_signatures

from fixtures import ROLE_DEFS, make_genome, make_role_map, write_role_files
from test_dna_mode import make_dna_genome, random_dna

K = 8
GOOD = {rid for rid, _ in ROLE_DEFS[:4]}
N_GENOMES = 6


# ---------------------------------------------------------------------------
# weighted × mesh (protein)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def genomes():
    return [make_genome(f"310{i}.1", seed=900 + i) for i in range(N_GENOMES)]


@pytest.fixture(scope="module")
def wtable(genomes):
    return build_signatures(genomes, make_role_map(), GOOD, k=K,
                            progress=False, weight_mode="balance")


@pytest.fixture(scope="module")
def wexpected(genomes, wtable):
    engine = KmerApplyEngine(wtable, min_hits=1, weighted=True,
                             min_weight=0.5)
    return [[(f.id, role, hits) for f, role, hits in engine.call_genome(g)]
            for g in genomes]


@pytest.mark.parametrize("n_data,n_table,mode", [
    (8, 1, "auto"),      # replicated
    (4, 2, "pmax"),      # broadcast-sharded, payload pmax merge
    (4, 2, "routed"),    # psum weighted-tally merge
    (1, 8, "routed"),
])
def test_weighted_mesh_matches_single_device(genomes, wtable, wexpected,
                                             n_data, n_table, mode):
    engine = MeshApplyEngine(wtable, n_data, n_table, min_hits=1,
                             mode=mode, weighted=True, min_weight=0.5)
    got = []
    for genome, calls in engine.call_genomes(genomes):
        got.append([(f.id, role, hits) for f, role, hits in calls])
    assert got == wexpected


def test_weighted_routed_capacity_retry_is_exact(genomes, wtable, wexpected):
    engine = MeshApplyEngine(wtable, 2, 4, min_hits=1, mode="routed",
                             weighted=True, min_weight=0.5,
                             capacity_factor=0.01)
    got = []
    for genome, calls in engine.call_genomes(genomes):
        got.append([(f.id, role, hits) for f, role, hits in calls])
    assert got == wexpected


# ---------------------------------------------------------------------------
# DNA × mesh (+ weighted × DNA, + weighted × DNA × mesh)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def dna_genomes():
    gs = []
    for i in range(5):
        specs = [(name, 300 + 30 * j, "+" if (i + j) % 2 else "-")
                 for j, (rid, name) in enumerate(ROLE_DEFS[:4])]
        gs.append(make_dna_genome(f"88{i}.1", seed=700 + i,
                                  cds_specs=specs))
    return gs


@pytest.fixture(scope="module")
def dna_table(dna_genomes):
    return build_signatures(dna_genomes, make_role_map(), GOOD, k=K,
                            progress=False, alphabet="dna")


@pytest.fixture(scope="module")
def dna_wtable(dna_genomes):
    return build_signatures(dna_genomes, make_role_map(), GOOD, k=K,
                            progress=False, alphabet="dna",
                            weight_mode="balance")


def _dna_calls(engine, genomes):
    if isinstance(engine, DnaApplyEngine):
        return [[(f.id, f.location.strand, f.location.left,
                  f.location.right, role, hits)
                 for f, role, hits in engine.call_genome(g)]
                for g in genomes]
    out = []
    for genome, calls in engine.call_genomes(genomes):
        out.append([(f.id, f.location.strand, f.location.left,
                     f.location.right, role, hits)
                    for f, role, hits in calls])
    return out


@pytest.mark.parametrize("n_data,n_table", [
    (8, 1),   # replicated table, contig streams over data
    (4, 2),   # table pmax-sharded, per-position merge
    (1, 8),
])
def test_dna_mesh_matches_single_device(dna_genomes, dna_table,
                                        n_data, n_table):
    single = _dna_calls(DnaApplyEngine(dna_table, min_hits=3), dna_genomes)
    meshed = _dna_calls(
        DnaMeshApplyEngine(dna_table, n_data, n_table, min_hits=3),
        dna_genomes)
    assert meshed == single
    assert any(single)   # the comparison is not vacuous


def test_weighted_dna_uniform_equals_unweighted_counts(dna_genomes,
                                                       dna_genomes2=None):
    # with uniform weights every hit weighs 1.0, so the weighted score of
    # each cluster equals its hit count and thresholds coincide
    table_u = build_signatures(dna_genomes, make_role_map(), GOOD, k=K,
                               progress=False, alphabet="dna",
                               weight_mode="uniform")
    plain = _dna_calls(DnaApplyEngine(table_u, min_hits=3), dna_genomes)
    weighted = _dna_calls(
        DnaApplyEngine(table_u, min_hits=3, weighted=True, min_weight=3.0),
        dna_genomes)
    assert [[(*c[:5], float(c[5])) for c in g] for g in plain] == weighted


@pytest.mark.parametrize("n_data,n_table", [(8, 1), (4, 2)])
def test_weighted_dna_mesh_matches_single_device(dna_genomes, dna_wtable,
                                                 n_data, n_table):
    single = _dna_calls(
        DnaApplyEngine(dna_wtable, min_hits=3, weighted=True,
                       min_weight=1.0), dna_genomes)
    meshed = _dna_calls(
        DnaMeshApplyEngine(dna_wtable, n_data, n_table, min_hits=3,
                           weighted=True, min_weight=1.0), dna_genomes)
    assert meshed == single
    assert any(single)


# ---------------------------------------------------------------------------
# CLI: the three formerly-rejected combinations run end-to-end
# ---------------------------------------------------------------------------

def test_cli_weighted_mesh(genomes, tmp_path):
    gto_dir = tmp_path / "gtos"
    gto_dir.mkdir()
    for g in genomes:
        g.save(str(gto_dir / f"{g.id}.gto"))
    role_file, use_file = write_role_files(tmp_path)
    db = str(tmp_path / "kmerdb.tbl")
    assert main(["build", "-K", str(K), "-o", db, "--weights", "balance",
                 role_file, use_file, str(gto_dir)]) == 0

    single = str(tmp_path / "single.tbl")
    assert main(["apply", "--format", "VERIFY", "-m", "1", "--weighted",
                 "--min-weight", "0.5", "-o", single, db, use_file,
                 str(gto_dir)]) == 0
    for mesh in (["--mesh", "8x1"], ["--mesh", "4x2"],
                 ["--mesh", "4x2", "--table-mode", "pmax"]):
        meshed = str(tmp_path / "mesh.tbl")
        assert main(["apply", "--format", "VERIFY", "-m", "1", "--weighted",
                     "--min-weight", "0.5", "-o", meshed, db, use_file,
                     str(gto_dir)] + mesh) == 0
        assert open(meshed, "rb").read() == open(single, "rb").read()


def test_cli_dna_mesh(dna_genomes, tmp_path):
    gto_dir = tmp_path / "gtos"
    gto_dir.mkdir()
    for g in dna_genomes:
        g.save(str(gto_dir / f"{g.id}.gto"))
    role_file, use_file = write_role_files(tmp_path)
    db = str(tmp_path / "kmerdb.tbl")
    assert main(["build", "-K", str(K), "-o", db, "--dna",
                 role_file, use_file, str(gto_dir)]) == 0

    single = str(tmp_path / "single.tbl")
    assert main(["apply", "--format", "VERIFY", "-m", "3", "-o", single,
                 db, use_file, str(gto_dir)]) == 0
    for mesh in (["--mesh", "8x1"], ["--mesh", "4x2"]):
        meshed = str(tmp_path / "mesh.tbl")
        assert main(["apply", "--format", "VERIFY", "-m", "3", "-o", meshed,
                     db, use_file, str(gto_dir)] + mesh) == 0
        assert open(meshed, "rb").read() == open(single, "rb").read()
