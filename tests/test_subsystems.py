"""SubsystemRuleProjector tests (funApply --project —
FunctionApplyProcessor.java:91, 172-174)."""

import copy
import os

import pytest

from kmers_anno_tpu.genome.gto import Genome
from kmers_anno_tpu.genome.subsystems import (RuleError,
                                              SubsystemRuleProjector,
                                              SubsystemSpec, _Parser)
from tests.fixtures import ROLE_DEFS, make_genome

PROJECTOR = """\
# test projector
SUBSYSTEM\tTranslation machinery core
CLASS\tProtein Processing\tTranslation
ROLE\tPhen\tPhenylalanyl-tRNA synthetase alpha chain
ROLE\tSery\tSeryl-tRNA synthetase
ROLE\tMiss\tSome role no genome has
RULE\tfull\tPhen and Sery and Miss
RULE\tactive\t2 of (Phen, Sery, Miss)
RULE\t0\tPhen or Sery or Miss
//
SUBSYSTEM\tImpossible machine
ROLE\tMiss2\tAnother role nobody has
RULE\tactive\tMiss2
//
SUBSYSTEM\tNegative control
ROLE\tPhen\tPhenylalanyl-tRNA synthetase alpha chain
ROLE\tMiss\tSome role no genome has
RULE\tactive\tPhen and not Miss
//
"""


def _parse(text, abbrs):
    return _Parser(text, set(abbrs)).parse()


def test_rule_expressions():
    fn = _parse("A and (B or C)", "ABC")
    assert fn({"A", "B"}) and fn({"A", "C"})
    assert not fn({"A"}) and not fn({"B", "C"})
    fn = _parse("not A", "A")
    assert fn(set()) and not fn({"A"})
    fn = _parse("2 of (A, B, C and D)", "ABCD")
    assert fn({"A", "B"})
    assert fn({"A", "C", "D"})
    assert not fn({"A", "C"})  # C without D: only 1 of 3
    with pytest.raises(RuleError):
        _parse("A and Zz", "A")  # unknown abbreviation
    with pytest.raises(RuleError):
        _parse("A and (B", "AB")  # unclosed paren
    with pytest.raises(RuleError):
        _parse("A B", "AB")  # trailing token


def test_spec_rule_order_first_match_wins():
    spec = SubsystemSpec(
        name="S", roles=[("A", "Role A"), ("B", "Role B")],
        rules=[("big", "A and B"), ("small", "A or B")])
    spec.compile()
    assert spec.variant_of({"A", "B"}) == "big"
    assert spec.variant_of({"B"}) == "small"
    assert spec.variant_of(set()) is None


def test_project_onto_genome(tmp_path):
    pf = tmp_path / "projector.tbl"
    pf.write_text(PROJECTOR)
    projector = SubsystemRuleProjector.load(str(pf))
    g = make_genome("300.7", seed=11)
    n = projector.project(g, active_only=True)
    rows = {s.name: s for s in g.subsystems}
    # 2-of rule matches (Phen + Sery present): variant "active"
    assert "Translation machinery core" in rows
    row = rows["Translation machinery core"]
    assert row.variant_code == "active"
    assert row.classifications == ["Protein Processing", "Translation"]
    # bindings only for present roles, pointing at the right features
    bound = {b["role_id"]: b["features"] for b in row.role_bindings}
    assert set(bound) == {"Phenylalanyl-tRNA synthetase alpha chain",
                          "Seryl-tRNA synthetase"}
    phen_fids = {f.id for f in g.features
                 if f.function == ROLE_DEFS[0][1]
                 or f.function.startswith(ROLE_DEFS[0][1] + " / ")}
    assert set(bound["Phenylalanyl-tRNA synthetase alpha chain"]) \
        == phen_fids
    # no-roles subsystem is not projected; "not Miss" one is
    assert "Impossible machine" not in rows
    assert "Negative control" in rows
    assert n == 2


def test_project_active_only_filter(tmp_path):
    pf = tmp_path / "projector.tbl"
    # only rule is variant 0 (inactive)
    pf.write_text("SUBSYSTEM\tHalf a machine\n"
                  "ROLE\tPhen\tPhenylalanyl-tRNA synthetase alpha chain\n"
                  "RULE\t0\tPhen\n//\n")
    projector = SubsystemRuleProjector.load(str(pf))
    g = make_genome("300.8", seed=12)
    assert projector.project(g, active_only=True) == 0
    assert projector.project(g, active_only=False) == 1
    assert g.subsystems[0].variant_code == "0"
    assert not g.subsystems[0].is_active


def test_fun_apply_project_cli(tmp_path):
    """funApply --project replaces subsystems instead of clearing them,
    and projection sees the CONVERTED functions."""
    from kmers_anno_tpu.commands.app import main

    g = make_genome("300.9", seed=13)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    g.save(str(in_dir / f"{g.id}.gto"))
    # rename the widget function onto a projector role
    mapping = tmp_path / "mapping.tbl"
    mapping.write_text(
        "patric_function\tcore_function\tgood\n"
        "totally unknown widget\tBrand new projected role\tY\n")
    pf = tmp_path / "projector.tbl"
    pf.write_text("SUBSYSTEM\tWidget system\n"
                  "ROLE\tWid\tBrand new projected role\n"
                  "RULE\tactive\tWid\n//\n")
    out_dir = str(tmp_path / "out")
    rc = main(["funApply", "--project", str(pf), str(mapping),
               str(in_dir), out_dir])
    assert rc == 0
    updated = Genome.load(os.path.join(out_dir, f"{g.id}.gto"))
    rows = {s.name for s in updated.subsystems}
    assert rows == {"Widget system"}
    wid = updated.subsystems[0]
    fids = wid.feature_ids()
    assert fids == {f.id for f in updated.features
                    if f.function == "Brand new projected role"}
    assert len(fids) == 1


def test_fun_apply_bad_projector_rejected(tmp_path):
    from kmers_anno_tpu.commands.app import main

    g = make_genome("300.10", seed=14)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    g.save(str(in_dir / f"{g.id}.gto"))
    mapping = tmp_path / "mapping.tbl"
    mapping.write_text("patric_function\tcore_function\tgood\n")
    pf = tmp_path / "bad.tbl"
    pf.write_text("SUBSYSTEM\tBroken\nROLE\tA\tRole A\n"
                  "RULE\tactive\tA and (B\n//\n")
    rc = main(["funApply", "--project", str(pf), str(mapping),
               str(in_dir), str(tmp_path / "out")])
    assert rc == 2
