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
