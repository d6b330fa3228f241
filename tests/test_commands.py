"""End-to-end tests for the host-side command family: merge, seqCheck,
genes, compare, funMap, funApply, updateJson, buildGtos."""

import copy
import json
import os

import pytest

from kmers_anno_tpu.commands.app import main
from kmers_anno_tpu.genome.gto import Genome
from kmers_anno_tpu.genome.roles import role_checksum

from fixtures import ROLE_DEFS, make_genome


@pytest.fixture()
def genome():
    return make_genome("600.1", seed=11)


def test_merge(tmp_path):
    d = tmp_path
    (d / "roles.to.use").write_text("R1\nR2\nR3\n")
    (d / "training.tbl").write_text(
        "genome\tR1\tR2\tR3\n100.1\t1\t2\t3\n100.2\t4\t5\t6\n")
    (d / "testing.tbl").write_text("200.1\t7\t0\t9\n200.2\t1\t0\t0\n")
    rc = main(["merge", str(d)])
    assert rc == 0
    # R2's testing column is all zero → dropped everywhere
    assert (d / "training.tbl").read_text() == (
        "genome\tR1\tR3\n200.1\t7\t9\n200.2\t1\t0\n"
        "100.1\t1\t3\n100.2\t4\t6\n")
    assert (d / "roles.to.use").read_text() == "R1\nR3\n"
    # originals backed up
    assert (d / "Backup" / "training.tbl").exists()
    assert (d / "Backup" / "roles.to.use").exists()


def test_seq_check(genome, tmp_path, capsys):
    g = copy.deepcopy(genome)
    # two pegs with identical protein but different functions
    pegs = g.pegs
    pegs[1].protein_translation = pegs[0].protein_translation
    pegs[1].function = "a different story"
    gdir = tmp_path / "gtos"
    gdir.mkdir()
    g.save(str(gdir / f"{g.id}.gto"))
    out = str(tmp_path / "seqcheck.tbl")
    rc = main(["seqCheck", "-o", out, str(gdir)])
    assert rc == 0
    lines = open(out).read().splitlines()
    assert lines[0] == "num\tfid\tfunction\tinteresting"
    body = [ln for ln in lines[1:] if ln]
    assert {ln.split("\t")[1] for ln in body} == {pegs[0].id, pegs[1].id}


def test_genes(genome, tmp_path):
    source = copy.deepcopy(genome)
    target = copy.deepcopy(genome)
    src_peg = source.pegs[0]
    src_peg.add_alias("gene_name", "abcX")
    for f in target.pegs:
        f.raw["aliases"] = []
    sf = str(tmp_path / "source.gto")
    tf = str(tmp_path / "target.gto")
    of = str(tmp_path / "out.gto")
    source.save(sf)
    target.save(tf)
    rc = main(["genes", sf, tf, of])
    assert rc == 0
    out = Genome.load(of)
    got = out.get_feature(src_peg.id)
    assert ["gene_name", "abcX"] in got.raw["aliases"]


def test_compare_and_funmap(genome, tmp_path):
    old = copy.deepcopy(genome)
    new = copy.deepcopy(genome)
    # change two functions in the new genome
    changed = new.pegs[:2]
    for f in changed:
        f.function = "Renamed " + f.function
    old_dir = tmp_path / "old"
    new_dir = tmp_path / "new"
    old_dir.mkdir()
    new_dir.mkdir()
    old.save(str(old_dir / f"{old.id}.gto"))
    new.save(str(new_dir / f"{new.id}.gto"))

    out = str(tmp_path / "compare.tbl")
    rc = main(["compare", "-o", out, str(old_dir), str(new_dir)])
    assert rc == 0
    lines = open(out).read().splitlines()
    assert lines[0] == "reference\tnew"
    ref_row = lines[1].split("\t")
    assert ref_row[0] == old.id
    n_pegs = len(old.pegs)
    expected_pct = (n_pegs - 2) * 100.0 / n_pegs
    assert ref_row[1] == "%8.4f" % expected_pct
    assert lines[-1].startswith("TOTAL\t")

    out2 = str(tmp_path / "funmap.tbl")
    rc = main(["funMap", "-o", out2, str(old_dir), str(new_dir)])
    assert rc == 0
    lines2 = open(out2).read().splitlines()
    assert lines2[0].startswith("old_function\tnew_function")
    # funMap passes the NEW genome first, so old_function column holds the
    # new names (FunctionCompareProcessor.java:103 quirk)
    assert any("Renamed" in ln for ln in lines2[1:])


def test_fun_apply(genome, tmp_path):
    g = copy.deepcopy(genome)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    g.save(str(in_dir / f"{g.id}.gto"))
    target_fn = g.pegs[0].function
    mapping = tmp_path / "mapping.tbl"
    mapping.write_text(
        "patric_function\tcore_function\tgood\n"
        f"{target_fn}\tBrand new core function\tY\n"
        "something else\tignored\t\n")
    out_dir = str(tmp_path / "out")
    rc = main(["funApply", str(mapping), str(in_dir), out_dir])
    assert rc == 0
    updated = Genome.load(os.path.join(out_dir, f"{g.id}.gto"))
    assert updated.pegs[0].function == "Brand new core function"
    assert updated.raw["subsystems"] == []


def test_update_json(genome, tmp_path):
    g = copy.deepcopy(genome)
    # give the genome a subsystem binding the first peg
    peg = g.pegs[0]
    g.raw["subsystems"] = [{
        "name": "Test subsystem",
        "variant_code": "active",
        "classification": ["Metabolism", "Energy"],
        "role_bindings": [{"role_id": peg.function,
                           "features": [peg.id]}],
    }]
    g = Genome(g.raw)  # rebuild indices
    gto_dir = tmp_path / "gtos"
    gto_dir.mkdir()
    g.save(str(gto_dir / f"{g.id}.gto"))
    # JSON dump input: one genome dir with genome_feature.json + a copy file
    json_in = tmp_path / "json_in"
    gdir = json_in / g.id
    gdir.mkdir(parents=True)
    feats = [{"patric_id": f.id, "product": "old product",
              "genome_id": g.id, "start": 1, "end": 10,
              "public": True} for f in g.pegs[:3]]
    (gdir / "genome_feature.json").write_text(json.dumps(feats))
    (gdir / "genome.json").write_text(json.dumps([{"genome_id": g.id}]))
    roles_file = tmp_path / "roles.in.subsystems"
    with open(roles_file, "w") as fh:
        for rid, name in ROLE_DEFS:
            fh.write(f"{rid}\t{role_checksum(name)}\t{name}\n")
    json_out = tmp_path / "json_out"
    rc = main(["updateJson", "-R", str(roles_file), str(json_in),
               str(gto_dir), str(json_out)])
    assert rc == 0
    out_feats = json.loads(
        (json_out / g.id / "genome_feature.json").read_text())
    assert len(out_feats) == 3
    by_fid = {f["patric_id"]: f for f in out_feats}
    assert by_fid[g.pegs[0].id]["product"] == g.pegs[0].function
    assert (json_out / g.id / "genome.json").exists()
    subs = json.loads((json_out / g.id / "subsystem.json").read_text())
    assert subs and subs[0]["subsystem_name"] == "Test subsystem"
    assert subs[0]["patric_id"] == peg.id
    assert subs[0]["role_name"] == peg.function
    assert subs[0]["superclass"] == "Metabolism"


def test_build_gtos(genome, tmp_path):
    g = copy.deepcopy(genome)
    gto_dir = tmp_path / "gtos_in"
    gto_dir.mkdir()
    g.save(str(gto_dir / f"{g.id}.gto"))
    pegs = g.pegs
    in_dir = tmp_path / "annofiles"
    in_dir.mkdir()
    (in_dir / "calls").write_text(
        f"{pegs[0].id}\tCalled function one\t\t\n"
        f"{pegs[1].id}\tCalled function two\t\t\n"
        "fig|9999.9.peg.1\tbogus\t\t\n")
    (in_dir / "local.family.defs").write_text(
        "17\tFamily function seventeen\t\t\t\t\n")
    (in_dir / "local.family.members.expanded").write_text(
        f"17\t{pegs[1].id}\tx\tx\tgenA\n")
    out_dir = str(tmp_path / "gtos_out")
    rc = main(["buildGtos", "-D", out_dir, "-t", "DIR", "1234",
               str(in_dir), str(gto_dir)])
    assert rc == 0
    out = Genome.load(os.path.join(out_dir, f"{g.id}.gto"))
    assert out.get_feature(pegs[0].id).function == "Called function one"
    f1 = out.get_feature(pegs[1].id)
    # family function overrides the call; PLF id is genus + zero-padded idx
    assert f1.function == "Family function seventeen"
    assert f1.plfam == "PLF_1234_00000017"
    assert f1.gene_name == "genA"
    # untouched proteins were cleared to hypothetical
    assert out.get_feature(pegs[2].id).function == "hypothetical protein"
