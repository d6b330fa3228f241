"""Parity of the r5 fused union-probe/device-scan projection path against
the r4 RLE path (and through it the host oracle): identical proposal
counters, features, and --trace candidate stream on a multi-close-genome
workload with merges."""

import numpy as np
import pytest

from tests.fixtures import make_projection_pair


def _workload():
    """New genome + THREE close genomes (same pegs, distinct ids) so the
    ORF dedup exercises cross-genome merges; minus-strand genes included
    by the fixture."""
    new_g, olds = make_projection_pair(seed=11, n_genes=16,
                                       old_id="300.1")
    # truncate the FIRST genome's proteins so later genomes carry more
    # evidence for the same ORFs and win better_than merges
    for f in olds["300.1"].raw["features"]:
        f["protein_translation"] = f["protein_translation"][:-15]
    for gid in ("301.1", "302.1"):
        _, extra = make_projection_pair(seed=11, n_genes=16, old_id=gid)
        olds.update(extra)
        new_g.raw["close_genomes"].append(
            {"genome": gid, "genome_name": "Oldus referencius",
             "closeness_measure": 99.0})
    return new_g, olds


def _annotate(force_rle: bool):
    from kmers_anno_tpu.engine.projection import ProjectionAnnotator

    new_g, olds = _workload()
    annot = ProjectionAnnotator(k=8, engine="device")
    if force_rle:
        annot._close_set = lambda olds_: None
    stats = annot.annotate_genome(new_g, olds.get)
    feats = [(f.id, f.function, f.location.contig_id, f.location.strand,
              f.location.left, f.location.right, f.protein_translation,
              tuple(a[0] for a in f.raw.get("annotations", [])))
             for f in new_g.features]
    return stats, feats


def test_fused_matches_rle_path():
    s_fused, f_fused = _annotate(force_rle=False)
    s_rle, f_rle = _annotate(force_rle=True)
    assert s_fused == s_rle
    assert f_fused == f_rle
    assert s_fused["pegs"] > 0 and s_fused["merged"] > 0


def test_fused_path_is_taken():
    from kmers_anno_tpu.engine import projection as P

    new_g, olds = _workload()
    annot = P.ProjectionAnnotator(k=8, engine="device")
    called = {}
    orig = P._scan_genomes

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    P._scan_genomes = spy
    try:
        annot.annotate_genome(new_g, olds.get)
    finally:
        P._scan_genomes = orig
    assert called.get("yes")


def test_fused_close_set_cached_across_genomes():
    from kmers_anno_tpu.engine.projection import ProjectionAnnotator

    new_g, olds = _workload()
    annot = ProjectionAnnotator(k=8, engine="device")
    annot.annotate_genome(new_g, olds.get)
    assert len(annot._closeset_cache) == 1
    new_g2, _ = _workload()
    stats = annot.annotate_genome(new_g2, olds.get)
    assert len(annot._closeset_cache) == 1      # reused, not rebuilt
    assert stats["pegs"] > 0


def test_fused_trace_matches_rle(caplog):
    import logging

    from kmers_anno_tpu.engine.projection import ProjectionAnnotator

    lines = {}
    for mode in ("fused", "rle"):
        new_g, olds = _workload()
        annot = ProjectionAnnotator(
            k=8, engine="device",
            trace_function="Projected role number 3")
        if mode == "rle":
            annot._close_set = lambda olds_: None
        with caplog.at_level(logging.INFO,
                             logger="kmers_anno_tpu.engine.projection"):
            caplog.clear()
            annot.annotate_genome(new_g, olds.get)
        lines[mode] = [r.message for r in caplog.records
                       if "Proposal stored" in r.message]
    assert lines["fused"] == lines["rle"]
    assert lines["fused"]                       # trace actually fired


def _batch_setup(tmp_path, tag):
    """Genome dir + in/out list file for a 6-genome batch run."""
    import os

    d = tmp_path / tag
    d.mkdir()
    cache = d / "cache"
    cache.mkdir()
    jobs = []
    for i in range(6):
        new_g, olds = make_projection_pair(seed=100 + i, n_genes=8,
                                           new_id=f"40{i}.1",
                                           old_id=f"30{i}.1")
        gin = d / f"in{i}.gto"
        new_g.save(str(gin))
        for gid, og in olds.items():
            og.save(str(cache / f"{gid}.gto"))
        jobs.append((f"in{i}.gto", f"out{i}.gto"))
    listing = d / "batch.tbl"
    listing.write_text("".join(f"{a}\t{b}\n" for a, b in jobs))
    return d, cache, [str(d / b) for _, b in jobs]


def test_batch_data_parallel_byte_identical(tmp_path):
    """``batch --data-parallel 3`` on the 8-virtual-device mesh writes
    byte-identical GTOs to the sequential run (SURVEY §2d DP row for the
    projection engine)."""
    import jax

    from kmers_anno_tpu.commands.app import main

    assert len(jax.devices()) >= 3
    d1, cache1, outs1 = _batch_setup(tmp_path, "seq")
    rc = main(["batch", "--cache", str(cache1), str(d1 / "batch.tbl")])
    assert rc == 0
    d2, cache2, outs2 = _batch_setup(tmp_path, "par")
    rc = main(["batch", "--cache", str(cache2), "--data-parallel", "3",
               str(d2 / "batch.tbl")])
    assert rc == 0
    import json

    def normalized(path):
        d = json.load(open(path))
        for f in d["features"]:
            for a in f.get("annotations", []):
                a[2] = 0  # the epoch timestamp is the one run-varying field
        return d

    for a, b in zip(outs1, outs2):
        assert normalized(a) == normalized(b)


def _multi_contig_workload():
    """Two-contig new genome + 2 close genomes; the second contig's
    genes sit near the edges so extension failures can occur."""
    import json

    a, olds_a = make_projection_pair(seed=41, n_genes=10, old_id="310.1")
    b, olds_b = make_projection_pair(seed=43, n_genes=10, old_id="311.1")
    raw = a.raw
    c2 = dict(b.raw["contigs"][0])
    c2["id"] = "newcon2"
    raw["contigs"].append(c2)
    raw["close_genomes"].append(
        {"genome": "311.1", "genome_name": "Oldus",
         "closeness_measure": 98.0})
    from kmers_anno_tpu.genome.gto import Genome

    olds = {**olds_a, **olds_b}
    return Genome(json.loads(json.dumps(raw))), olds


@pytest.mark.parametrize("params", [
    dict(),                                     # defaults
    dict(min_strength=0.9, min_evidence=60),    # weak + small exercised
    dict(min_fuzz=1.0, max_fuzz=1.1),           # tight length windows
])
def test_fused_matches_rle_filters_multicontig(params):
    from kmers_anno_tpu.engine.projection import ProjectionAnnotator

    stats = {}
    feats = {}
    for mode in ("fused", "rle"):
        new_g, olds = _multi_contig_workload()
        annot = ProjectionAnnotator(k=8, engine="device", **params)
        if mode == "rle":
            annot._close_set = lambda olds_: None
        stats[mode] = annot.annotate_genome(new_g, olds.get)
        feats[mode] = [(f.id, f.function, f.location.contig_id,
                        f.location.strand, f.location.left,
                        f.location.right, f.protein_translation)
                       for f in new_g.features]
    assert stats["fused"] == stats["rle"]
    assert feats["fused"] == feats["rle"]


def test_fused_strict_weak_counts_nonzero():
    """The strict-parameter variant must actually exercise the weak
    filter so the float64-exact device threshold table is load-bearing."""
    from kmers_anno_tpu.engine.projection import ProjectionAnnotator

    new_g, olds = _multi_contig_workload()
    annot = ProjectionAnnotator(k=8, engine="device",
                                min_strength=0.9, min_evidence=60)
    stats = annot.annotate_genome(new_g, olds.get)
    assert stats["weak"] > 0 or stats["small"] > 0
