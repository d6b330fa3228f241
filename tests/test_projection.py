"""ORF-projection engine vs the pure-Python oracle transcription."""

import copy
import json

import numpy as np
import pytest

from kmers_anno_tpu.engine.projection import (ContigKmerIndex,
                                              ProjectionAnnotator,
                                              peg_singleton_kmers)
from kmers_anno_tpu.engine.signature import unpack_kmer_np
from kmers_anno_tpu.ops.encode import decode_protein

from fixtures import make_projection_pair
from oracle import (oracle_annotate, oracle_contig_kmers,
                    oracle_peg_singletons)

K = 8


@pytest.fixture(scope="module")
def pair():
    return make_projection_pair()


def _index_as_dict(index: ContigKmerIndex):
    """ContigKmerIndex → {kmer text: set of (contig, strand, left)}."""
    texts = [decode_protein(row) for row in
             unpack_kmer_np(index.ukey_lo, index.ukey_hi, index.k)]
    out = {}
    for rank, text in enumerate(texts):
        s, c = index.starts[rank], index.counts[rank]
        locs = set()
        for j in range(s, s + c):
            locs.add((index.contig_ids[index.loc_contig[j]],
                      "+" if index.loc_strand[j] == 0 else "-",
                      int(index.loc_left[j])))
        out[text] = locs
    return out


@pytest.mark.parametrize("strict", [False, True])
def test_contig_index_matches_oracle(pair, strict):
    new_genome, _ = pair
    index = ContigKmerIndex.build(new_genome, K, strict=strict)
    got = _index_as_dict(index)
    want = {t: {(l.contig_id, l.strand, l.left) for l in v}
            for t, v in oracle_contig_kmers(new_genome, K,
                                            strict=strict).items()}
    assert got == want


def test_peg_singletons_match_oracle(pair):
    _, olds = pair
    old = next(iter(olds.values()))
    lo, hi, peg_idx, pegs = peg_singleton_kmers(old, K)
    texts = [decode_protein(row) for row in unpack_kmer_np(lo, hi, K)]
    got = {t: pegs[i].id for t, i in zip(texts, peg_idx)}
    assert got == oracle_peg_singletons(old, K)


def test_peg_singletons_on_reference_fixture(small_gto):
    lo, hi, peg_idx, pegs = peg_singleton_kmers(small_gto, K)
    texts = [decode_protein(row) for row in unpack_kmer_np(lo, hi, K)]
    got = {t: pegs[i].id for t, i in zip(texts, peg_idx)}
    assert got == oracle_peg_singletons(small_gto, K)


def test_annotate_matches_oracle(pair):
    new_genome, olds = pair
    want_props, want_stats = oracle_annotate(
        copy.deepcopy(new_genome), olds, k=K)
    genome = copy.deepcopy(new_genome)
    annot = ProjectionAnnotator(k=K)
    stats = annot.annotate_genome(genome, olds.get)
    for key, val in want_stats.items():
        assert stats[key] == val, f"stat {key}: {stats[key]} != {val}"
    # every surviving proposal became a numbered feature in order
    feats = genome.pegs
    assert len(feats) == len(want_props) == stats["pegs"]
    assert stats["kept"] == len(want_props)
    for n, (feat, prop) in enumerate(zip(feats, want_props), 1):
        assert feat.id == f"fig|{genome.id}.peg.{n}"
        loc = feat.location
        assert (loc.contig_id, loc.strand, loc.left, loc.right) == (
            prop.loc.contig_id, prop.loc.strand, prop.loc.left,
            prop.loc.right)
        assert feat.function == prop.function
        assert feat.protein_translation  # non-empty translation
    # the projected functions recover the close genome's annotations
    assert {f.function for f in feats} <= {
        f"Projected role number {i}" for i in range(1, 9)}
    assert len(feats) >= 6  # most genes should be recovered


def test_annotate_finds_planted_genes(pair):
    """Recovered features must coincide with the planted ORFs."""
    new_genome, olds = pair
    genome = copy.deepcopy(new_genome)
    ProjectionAnnotator(k=K).annotate_genome(genome, olds.get)
    planted = {}
    old = next(iter(olds.values()))
    for f in genome.pegs:
        # translation must match the source protein of the same function
        src = next(p for p in old.pegs if p.function == f.function)
        assert f.protein_translation == src.protein_translation, \
            f"{f.function}: translation drift"


def test_cli_kmers_roundtrip(pair, tmp_path):
    from kmers_anno_tpu.commands.app import main

    new_genome, olds = pair
    cache = tmp_path / "cache"
    cache.mkdir()
    for gid, g in olds.items():
        g.save(str(cache / f"{gid}.gto"))
    in_file = str(tmp_path / "new.gto")
    out_file = str(tmp_path / "annotated.gto")
    copy.deepcopy(new_genome).save(in_file)
    rc = main(["kmers", "-K", str(K), "--cache", str(cache),
               "-i", in_file, "-o", out_file])
    assert rc == 0
    result = json.load(open(out_file))
    fns = [f["function"] for f in result["features"]]
    assert fns and all(fn.startswith("Projected role") for fn in fns)

    # batch command: de-annotates then re-annotates
    batch_in = str(tmp_path / "list.tbl")
    out2 = "batchout.gto"
    with open(batch_in, "w") as fh:
        fh.write("new.gto\t" + out2 + "\n")
    rc = main(["batch", "-K", str(K), "--cache", str(cache), batch_in])
    assert rc == 0
    result2 = json.load(open(str(tmp_path / out2)))
    assert [f["function"] for f in result2["features"]] == fns
