"""The mesh-wired apply pipeline: ``apply --mesh DxT`` must produce reports
byte-identical to the single-device path on the 8-device virtual CPU mesh,
across every table layout (replicated / pmax-broadcast / all_to_all-routed),
and the routed step's capacity-overflow retry must stay exact."""

import numpy as np
import pytest

from kmers_anno_tpu.commands.app import main
from kmers_anno_tpu.engine.apply_engine import KmerApplyEngine
from kmers_anno_tpu.engine.mesh_apply import MeshApplyEngine, parse_mesh_spec
from kmers_anno_tpu.engine.signature import build_signatures

from fixtures import ROLE_DEFS, make_genome, make_role_map, write_role_files

K = 8
GOOD_ROLES = {rid for rid, _ in ROLE_DEFS[:4]}
N_GENOMES = 6   # deliberately not divisible by any mesh data-axis size


@pytest.fixture(scope="module")
def genomes():
    return [make_genome(f"300{i}.1", seed=500 + i) for i in range(N_GENOMES)]


@pytest.fixture(scope="module")
def table(genomes):
    return build_signatures(genomes, make_role_map(), GOOD_ROLES, k=K,
                            progress=False)


@pytest.fixture(scope="module")
def expected(genomes, table):
    engine = KmerApplyEngine(table, min_hits=1)
    return [[(f.id, role, hits) for f, role, hits in engine.call_genome(g)]
            for g in genomes]


def _mesh_calls(table, genomes, n_data, n_table, **kw):
    engine = MeshApplyEngine(table, n_data, n_table, min_hits=1, **kw)
    out = []
    for genome, calls in engine.call_genomes(genomes):
        out.append([(f.id, role, hits) for f, role, hits in calls])
    return out


@pytest.mark.parametrize("n_data,n_table,mode", [
    (8, 1, "auto"),          # replicated, data-parallel
    (4, 2, "auto"),          # routed (default for table axis > 1)
    (4, 2, "pmax"),          # broadcast-sharded
    (2, 4, "routed"),
    (1, 8, "routed"),        # pure table parallelism
])
def test_mesh_engine_matches_single_device(genomes, table, expected,
                                           n_data, n_table, mode):
    got = _mesh_calls(table, genomes, n_data, n_table, mode=mode)
    assert got == expected


def test_routed_capacity_retry_is_exact(genomes, table, expected):
    # an absurdly small capacity factor forces the overflow → safe re-run
    got = _mesh_calls(table, genomes, 2, 4, mode="routed",
                      capacity_factor=0.01)
    assert got == expected


def test_parse_mesh_spec():
    assert parse_mesh_spec("4x2") == (4, 2)
    assert parse_mesh_spec("8") == (8, 1)
    assert parse_mesh_spec("2X4") == (2, 4)
    with pytest.raises(ValueError):
        parse_mesh_spec("axb")
    with pytest.raises(ValueError):
        parse_mesh_spec("1x2x3")


@pytest.mark.parametrize("mesh_args", [
    ["--mesh", "8x1"],
    ["--mesh", "4x2"],
    ["--mesh", "4x2", "--table-mode", "pmax"],
    ["--mesh", "2x4", "--capacity-factor", "1.5"],
])
def test_cli_mesh_report_byte_identical(genomes, tmp_path, mesh_args):
    gto_dir = tmp_path / "gtos"
    gto_dir.mkdir()
    for g in genomes:
        g.save(str(gto_dir / f"{g.id}.gto"))
    role_file, use_file = write_role_files(tmp_path)
    db_file = str(tmp_path / "kmerdb.tbl")
    assert main(["build", "-K", str(K), "-o", db_file, role_file, use_file,
                 str(gto_dir)]) == 0

    single = str(tmp_path / "single.tbl")
    assert main(["apply", "--format", "VERIFY", "-m", "1", "-o", single,
                 db_file, use_file, str(gto_dir)]) == 0
    meshed = str(tmp_path / "mesh.tbl")
    assert main(["apply", "--format", "VERIFY", "-m", "1", "-o", meshed,
                 db_file, use_file, str(gto_dir)] + mesh_args) == 0
    assert open(meshed, "rb").read() == open(single, "rb").read()
