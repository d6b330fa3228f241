"""Self-consistency oracles on the real reference fixture (small.gto),
ported from the reference's own test strategy (AppTest.java:109-161):
every extracted contig kmer must re-translate from its claimed Location."""

import numpy as np
import pytest

from kmers_anno_tpu.engine.projection import ContigKmerIndex
from kmers_anno_tpu.engine.signature import unpack_kmer_np
from kmers_anno_tpu.genome.dna import DnaTranslator
from kmers_anno_tpu.genome.locations import Location
from kmers_anno_tpu.ops.encode import decode_protein

K = 8


@pytest.fixture(scope="module")
def index(small_gto):
    return ContigKmerIndex.build(small_gto, K)


def test_contig_kmers_retranslate(small_gto, index):
    """Sampled kmers must equal the translation of their claimed location
    (the testKmerContigCounts oracle, AppTest.java:109-126)."""
    xlator = DnaTranslator(small_gto.genetic_code)
    rng = np.random.default_rng(0)
    n = index.n_unique
    sample = rng.choice(n, size=min(2000, n), replace=False)
    texts = {int(r): decode_protein(row) for r, row in zip(
        sample, unpack_kmer_np(index.ukey_lo[sample],
                               index.ukey_hi[sample], K))}
    checked = 0
    for rank in sample:
        rank = int(rank)
        start, count = index.starts[rank], index.counts[rank]
        for j in range(start, start + count):
            contig_id = index.contig_ids[index.loc_contig[j]]
            strand = "+" if index.loc_strand[j] == 0 else "-"
            left = int(index.loc_left[j])
            loc = Location(contig_id, strand, left, left + 3 * K - 1)
            dna = small_gto.get_dna(loc)
            assert xlator.translate(dna) == texts[rank], (
                f"kmer {texts[rank]} at {loc} mistranslates")
            checked += 1
    assert checked >= 2000


def test_contig_kmer_volume(small_gto, index):
    """2 strands x 3 frames each yield ~L/3 - K kmers, so the ceiling is
    ~2L total; '*'/'X' windows are dropped (Q2), which removes roughly a
    third of off-frame windows. Sanity-check the totals land in that band."""
    genome_len = small_gto.length
    total_locs = len(index.loc_left)
    assert 0.5 * 2 * genome_len < total_locs <= 2 * genome_len


def test_strict_mode_unique(small_gto):
    strict = ContigKmerIndex.build(small_gto, K, strict=True)
    assert (strict.counts == 1).all()
    full = ContigKmerIndex.build(small_gto, K, strict=False)
    # STRICT keeps exactly the unique subset of the full map
    assert strict.n_unique == int((full.counts == 1).sum())


def test_fixture_shape(small_gto):
    """The fixture parses to the documented shape (SURVEY.md §4)."""
    assert small_gto.id == "97478.30"
    assert len(small_gto.features) == 761
    assert len(small_gto.contigs) == 5
    assert len(small_gto.pegs) == 712
    assert small_gto.genetic_code == 11
    assert small_gto.close_genomes == []
