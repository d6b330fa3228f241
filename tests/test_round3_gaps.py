"""Round-3 gap closures: LIST/DNAFASTA genome targets, the kmers.anno.log
file appender, the unknown-genetic-code hard error, and PATRIC fetch
payload validation (r2 VERDICT items 5 and 9)."""

import io
import json
import os

import pytest

from tests.fixtures import make_genome


def _anno_setup(tmp_path):
    """One genome dir + one anno dir renaming its second peg."""
    g = make_genome("100.1", seed=7)
    gto_dir = tmp_path / "gtos"
    gto_dir.mkdir()
    g.save(str(gto_dir / "100.1.gto"))
    anno_dir = tmp_path / "annos"
    anno_dir.mkdir()
    pegs = [f for f in g.pegs if f.protein_translation]
    with open(anno_dir / "100.1.anno.tbl", "w") as fh:
        fh.write("fid\tscore\tnew_annotation\told_annotation\n")
        fh.write(f"{pegs[1].id}\t0.95\tShiny new function\t"
                 f"{pegs[1].peg_function}\n")
    return g, str(gto_dir), str(anno_dir)


def test_apply_anno_list_target(tmp_path):
    from kmers_anno_tpu.commands.app import main

    g, gto_dir, anno_dir = _anno_setup(tmp_path)
    out = str(tmp_path / "genomes.list")
    rc = main(["applyAnno", "--target", "LIST", anno_dir, gto_dir, out])
    assert rc == 0
    assert open(out).read() == f"{g.id}\t{g.name}\n"
    # without --clear a second run appends (file target semantics)
    rc = main(["applyAnno", "--target", "LIST", anno_dir, gto_dir, out])
    assert rc == 0
    assert open(out).read().count("\n") == 2
    # --clear truncates
    rc = main(["applyAnno", "--target", "LIST", "--clear",
               anno_dir, gto_dir, out])
    assert rc == 0
    assert open(out).read() == f"{g.id}\t{g.name}\n"


def test_apply_anno_dnafasta_target(tmp_path):
    from kmers_anno_tpu.commands.app import main
    from kmers_anno_tpu.utils.io import FastaReader

    g, gto_dir, anno_dir = _anno_setup(tmp_path)
    out = str(tmp_path / "genomes.fna")
    rc = main(["applyAnno", "--target", "DNAFASTA", "--clear",
               anno_dir, gto_dir, out])
    assert rc == 0
    with FastaReader(out) as fr:
        seqs = list(fr)
    contigs = {c.id: c.sequence for c in g.contigs}
    assert {s.label for s in seqs} == set(contigs)
    for s in seqs:
        assert s.sequence == contigs[s.label]
        assert s.comment.startswith(g.id)


def test_apply_anno_bad_target_rejected(tmp_path):
    from kmers_anno_tpu.commands.app import main

    _, gto_dir, anno_dir = _anno_setup(tmp_path)
    rc = main(["applyAnno", "--target", "BOGUS", anno_dir, gto_dir,
               str(tmp_path / "x")])
    assert rc == 2


def test_log_file_appender(tmp_path, monkeypatch):
    """The CLI writes kmers.anno.log alongside stderr (logback.xml:4-16)."""
    from kmers_anno_tpu.commands.app import main

    log_path = str(tmp_path / "kmers.anno.log")
    monkeypatch.setenv("KMERS_ANNO_LOG", log_path)
    _, gto_dir, anno_dir = _anno_setup(tmp_path)
    rc = main(["applyAnno", anno_dir, gto_dir, str(tmp_path / "out_gtos")])
    assert rc == 0
    text = open(log_path).read()
    assert "genomes processed" in text and "INFO" in text


def test_unknown_genetic_code_raises():
    from kmers_anno_tpu.genome.dna import DnaTranslator, GeneticCode

    with pytest.raises(ValueError, match="genetic code"):
        GeneticCode.get(99)
    with pytest.raises(ValueError, match="genetic code"):
        DnaTranslator(25)
    # supported codes still come back
    assert GeneticCode.get(11).gc == 11
    assert GeneticCode.get(4).is_stop("taa")


def test_patric_fetch_validates_gto_shape(monkeypatch, tmp_path):
    """A non-GTO legacy payload (flat genome record) falls through to the
    data-api path, and an unreachable API returns None like P3Genome.load's
    null (KmerProcessor.java:189-191); a GTO payload wraps and caches."""
    from kmers_anno_tpu.genome import p3api, sources

    responses = {}

    def fake_http_json(url, timeout=30.0):
        if url not in responses:
            raise OSError(f"no route to {url}")
        return responses[url]

    monkeypatch.setattr(p3api, "_http_json", fake_http_json)

    cache = tmp_path / "cache"
    cache.mkdir()
    src = sources.PatricGenomeSource(str(cache))

    # flat record on the legacy endpoint + unreachable data api → None
    responses[p3api.LEGACY_GTO_URL + "11.1"] = {
        "genome_id": "11.1", "genome_name": "Recordus flatus"}
    assert src.get("11.1") is None
    assert not os.path.exists(cache / "11.1.gto")

    # real GTO shape → Genome, written back to the cache
    responses[p3api.LEGACY_GTO_URL + "22.2"] = {
        "id": "22.2", "scientific_name": "Gto realus", "genetic_code": 11,
        "features": [], "contigs": [{"id": "c1", "dna": "acgt"}]}
    g = src.get("22.2")
    assert g is not None and g.id == "22.2"
    assert os.path.isfile(cache / "22.2.gto")
    # second get comes from the cache (no network)
    del responses[p3api.LEGACY_GTO_URL + "22.2"]
    assert src.get("22.2").id == "22.2"
