"""BV-BRC data-api client: paged queries, GTO assembly, ID-file source.

All network I/O is injected through p3api._http_json; no sockets."""

import urllib.parse

import pytest

from kmers_anno_tpu.genome import p3api
from kmers_anno_tpu.genome.p3api import (Details, P3Connection, P3Genome)
from kmers_anno_tpu.genome.sources import GenomeSource, PatricGenomeSource


@pytest.fixture
def fake_api(monkeypatch):
    """Dict url → response; unknown urls raise like a dead network."""
    responses = {}

    def fake_http_json(url, timeout=30.0):
        if url not in responses:
            raise OSError(f"no route to {url}")
        return responses[url]

    monkeypatch.setattr(p3api, "_http_json", fake_http_json)
    return responses


def test_query_pages_through_results(fake_api):
    p3 = P3Connection(api_url="fake://api", page_size=2)
    base = "eq(genome_id,9.9)&select(a)"
    fake_api[f"fake://api/core/?{base}&limit(2,0)"] = [{"a": 1}, {"a": 2}]
    fake_api[f"fake://api/core/?{base}&limit(2,2)"] = [{"a": 3}]
    got = list(p3.query("core", p3.eq("genome_id", "9.9"), select=["a"]))
    assert got == [{"a": 1}, {"a": 2}, {"a": 3}]


def test_eq_quotes_values():
    assert P3Connection.eq("product", "a b/c") == "eq(product,a%20b%2Fc)"


def _plant_genome(fake_api, p3, gid, with_dna=True, with_aa=True):
    fake_api[f"{p3.api_url}/genome/?" + p3.eq("genome_id", gid)
             + "&select(genome_id,genome_name,taxon_id,superkingdom,"
               "genetic_code)&limit(2500,0)"] = [{
                   "genome_id": gid, "genome_name": "Fakus apius",
                   "taxon_id": 123, "superkingdom": "Bacteria",
                   "genetic_code": 11}]
    select = ("patric_id,feature_id,feature_type,product,sequence_id,"
              "start,end,strand,plfam_id")
    if with_aa:
        select += ",aa_sequence"
    feat = {"patric_id": f"fig|{gid}.peg.1", "feature_type": "CDS",
            "product": "Some role", "sequence_id": "c1",
            "start": 10, "end": 21, "strand": "+",
            "plfam_id": "PLF_1_00000001"}
    if with_aa:
        feat["aa_sequence"] = "MKVA"
    fake_api[f"{p3.api_url}/genome_feature/?" + p3.eq("genome_id", gid)
             + "&" + p3.eq("annotation", "PATRIC")
             + f"&select({select})&limit(2500,0)"] = [feat]
    if with_dna:
        fake_api[f"{p3.api_url}/genome_sequence/?"
                 + p3.eq("genome_id", gid)
                 + "&select(sequence_id,sequence)&limit(2500,0)"] = [
                     {"sequence_id": "c1", "sequence": "ACGT" * 6}]


def test_p3genome_assembles_from_cores(fake_api, tmp_path):
    p3 = P3Connection(api_url="fake://api")
    _plant_genome(fake_api, p3, "33.3")
    g = P3Genome.load(p3, "33.3", Details.FULL, str(tmp_path))
    assert g is not None and g.id == "33.3"
    assert g.genetic_code == 11
    [feat] = g.features
    assert feat.id == "fig|33.3.peg.1"
    assert feat.protein_translation == "MKVA"
    assert feat.location.left == 10 and feat.location.right == 21
    [contig] = g.contigs
    assert contig.id == "c1" and contig.sequence == "acgt" * 6
    # written back to the cache; reload does not touch the network
    fake_api.clear()
    assert P3Genome.load(p3, "33.3", Details.FULL,
                         str(tmp_path)).id == "33.3"


def test_p3genome_proteins_level_skips_dna(fake_api, tmp_path):
    p3 = P3Connection(api_url="fake://api")
    _plant_genome(fake_api, p3, "44.4", with_dna=False)
    g = P3Genome.load(p3, "44.4", Details.PROTEINS, cache_dir=None)
    assert g is not None
    assert [f.protein_translation for f in g.features] == ["MKVA"]
    assert len(g.contigs) == 0


def test_p3genome_not_found(fake_api):
    p3 = P3Connection(api_url="fake://api")
    assert P3Genome.load(p3, "55.5", Details.PROTEINS, None) is None


def test_patric_source_id_file(fake_api, tmp_path, monkeypatch):
    ids = tmp_path / "genomes.tbl"
    ids.write_text("genome_id\tname\n66.6\tSixus\n77.7\tSevenus\n")
    src = GenomeSource.create("PATRIC", str(ids))
    assert src.ids() == ["66.6", "77.7"]
    assert len(src) == 2
    # the default P3Connection targets the real API; patch query URLs in
    p3 = P3Connection()
    _plant_genome(fake_api, p3, "66.6")
    assert src.get("66.6").id == "66.6"
    assert src.get("77.7") is None  # loud miss, not an exception


def test_patric_source_bad_path(tmp_path):
    with pytest.raises(FileNotFoundError):
        PatricGenomeSource(str(tmp_path / "nope"))
