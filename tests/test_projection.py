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


@pytest.mark.parametrize("engine", ["host", "device"])
def test_annotate_matches_oracle(pair, engine):
    new_genome, olds = pair
    want_props, want_stats = oracle_annotate(
        copy.deepcopy(new_genome), olds, k=K)
    genome = copy.deepcopy(new_genome)
    annot = ProjectionAnnotator(k=K, engine=engine)
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


def _rand_gene(rng, n_cod):
    body = "".join("tcag"[c] for c in rng.integers(0, 4, 3 * n_cod))
    codons = [body[j: j + 3] for j in range(0, len(body), 3)]
    codons = [c for c in codons if c not in ("taa", "tag", "tga")]
    return "atg" + "".join(codons) + "taa"


@pytest.mark.parametrize("algo", ["AGGRESSIVE", "STRICT"])
def test_stream_engine_matches_host_engine(algo):
    """Device stream path ≡ host index path on a genome with duplicated
    genes (multi-location kmers exercise STRICT), two contigs, and
    mixed strands — features and counters must be identical."""
    from kmers_anno_tpu.genome.dna import (DnaTranslator,
                                           reverse_complement)
    from kmers_anno_tpu.genome.gto import Genome

    rng = np.random.default_rng(3)
    xl = DnaTranslator(11)
    genes = [_rand_gene(rng, int(rng.integers(40, 120)))
             for _ in range(12)]
    genes.append(genes[0])                      # duplicate gene

    def spacer(n):
        return "".join("acgt"[c] for c in rng.integers(0, 4, n))

    c1, c2 = [spacer(40)], [spacer(25)]
    for i, g in enumerate(genes):
        tgt = c1 if i % 3 else c2
        tgt.append(g if i % 2 == 0 else reverse_complement(g))
        tgt.append(spacer(int(rng.integers(10, 60))))
    c1.append(genes[1])                         # repeat on other contig

    def old_genome(gid, shuffle):
        feats = []
        idxs = list(range(len(genes)))
        if shuffle:
            rng.shuffle(idxs)
        for n, i in enumerate(idxs):
            prot = xl.peg_translate(genes[i], 1, len(genes[i]) - 3)
            feats.append({
                "id": f"fig|{gid}.peg.{n + 1}", "type": "CDS",
                "function": f"Role {i}",
                "location": [["oc", str(1000 * n + 1), "+",
                              len(genes[i])]],
                "protein_translation": prot, "annotations": [],
                "aliases": []})
        return Genome({"id": gid, "scientific_name": "O",
                       "genetic_code": 11, "domain": "Bacteria",
                       "features": feats,
                       "contigs": [{"id": "oc", "dna": "acgt" * 30}],
                       "close_genomes": [], "subsystems": []})

    olds = {f"31{i}.1": old_genome(f"31{i}.1", i) for i in range(3)}
    base = Genome({
        "id": "401.1", "scientific_name": "N", "genetic_code": 11,
        "domain": "Bacteria", "features": [],
        "contigs": [{"id": "nc1", "dna": "".join(c1),
                     "genetic_code": 11},
                    {"id": "nc2", "dna": "".join(c2),
                     "genetic_code": 11}],
        "close_genomes": [{"genome": g, "genome_name": "O",
                           "closeness_measure": 99.0} for g in olds],
        "subsystems": []})

    res = {}
    for engine in ("host", "device"):
        g = copy.deepcopy(base)
        stats = ProjectionAnnotator(
            k=K, engine=engine, algorithm=algo).annotate_genome(
                g, olds.get)
        feats = [(f.id, f.function, f.location.contig_id,
                  f.location.strand, f.location.left, f.location.right,
                  f.protein_translation) for f in g.pegs]
        res[engine] = (stats, feats)
    assert res["host"] == res["device"]
    assert res["host"][0]["kept"] > 0


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
