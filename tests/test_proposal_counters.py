"""Exact proposal-counter oracle (AppTest.java:168-277 reconstruction).

The reference pins the PegProposal / PegProposalList behavior against a
fixture ``test.gto`` that is MISSING from its own repo (SURVEY.md §4).
This module rebuilds an equivalent fixture: a 1 Mb single-contig genome
whose DNA is all-'c' (start-free, stop-free in every frame) with start /
stop codons planted at exactly the coordinates AppTest exercises, so the
reference-pinned extensions — (+,1249,1302) → [1216,1422] strength
0.4155, (+,1261,1320) → [1252,1422] strength 0.5029 — hold bit-exactly,
and the made/rejected/weak/small/merged counter sequence and survivor
iteration order of AppTest.testProposalLists:220-277 replay verbatim.

One documented deviation (kmers_anno_tpu/genome/locations.py module
docstring): extension of a location whose length is not a codon multiple
fails.  AppTest's small-function location (-,100,110) has length 11; here
it is (-,100,111) — same scenario, same counter path.  The invalid
location keeps AppTest's exact (+,983222,983349) coordinates (length 128
≢ 0 mod 3 → rejected).
"""

import pytest

from kmers_anno_tpu.engine.proposals import PegProposal, PegProposalList
from kmers_anno_tpu.genome.gto import Genome
from kmers_anno_tpu.genome.locations import Location

TEST_CONTIG = "51203.13.con.0001"
CONTIG_LEN = 1_000_000


def _plant(seq: bytearray, pos1: int, codon: str) -> None:
    """Write a codon at a 1-based position."""
    seq[pos1 - 1: pos1 + 2] = codon.encode()


@pytest.fixture(scope="module")
def test_gto() -> Genome:
    dna = bytearray(b"c" * CONTIG_LEN)
    # prop1/prop2 ORF (AppTest:171-214): starts at 1216 and 1252, stop
    # codon 1420-1422 -> shared end 1422
    _plant(dna, 1216, "atg")
    _plant(dna, 1252, "atg")
    _plant(dna, 1420, "taa")
    # small function (-,100,111): reverse stop (revcomp 'taa' = 'tta') at
    # 94-96, reverse start (revcomp 'atg' = 'cat') at 118-120
    _plant(dna, 94, "tta")
    _plant(dna, 118, "cat")
    # minus protein (-,777932,779122): stop below the left edge, start at
    # the begin codon itself
    _plant(dna, 777929, "tta")
    _plant(dna, 779120, "cat")
    # far protein (+,825851,825853): start at begin, stop right after end
    _plant(dna, 825851, "atg")
    _plant(dna, 825854, "taa")
    # weak function (+,905257,905415): start at begin, stop far enough
    # that strength 61/219 drops below 0.5
    _plant(dna, 905257, "atg")
    _plant(dna, 905473, "taa")
    # minus 1104 (-,914899,916002)
    _plant(dna, 914896, "tta")
    _plant(dna, 916000, "cat")
    return Genome({
        "id": "51203.13", "scientific_name": "Testus proposalis",
        "domain": "Bacteria", "genetic_code": 11, "features": [],
        "contigs": [{"id": TEST_CONTIG, "dna": dna.decode()}],
        "close_genomes": [], "subsystems": []})


def test_peg_proposals(test_gto):
    """AppTest.testPegProposals:168-214 — extension pins, equality,
    better-than, merge, invalid → None."""
    prop1 = PegProposal.create(
        test_gto, Location.create(TEST_CONTIG, "+", 1249, 1302),
        "hypothetical protein", 86)
    assert prop1.function == "hypothetical protein"
    assert prop1.strength == pytest.approx(0.4155, abs=0.0001)
    loc = prop1.loc
    assert loc.contig_id == TEST_CONTIG and loc.dir == "+"
    assert loc.end == 1422 and loc.right == 1422
    assert loc.left <= 1294
    assert test_gto.get_contig(TEST_CONTIG).sequence[
        loc.begin - 1: loc.begin + 2].lower() in ("ttg", "ctg", "atg")

    prop2 = PegProposal.create(
        test_gto, Location.create(TEST_CONTIG, "+", 1261, 1320),
        "serious protein", 86)
    assert prop2.strength == pytest.approx(0.5029, abs=0.0001)
    loc = prop2.loc
    assert loc.end == 1422 and loc.right == 1422 and loc.begin == 1252
    # same ORF, same evidence: equal; prop1 is longer -> better
    assert prop1.orf_key() == prop2.orf_key()
    assert prop1.better_than(prop2)
    assert not prop2.better_than(prop1)
    prop1.merge(prop2)
    assert prop1.loc.end == 1422 and prop1.loc.begin == 1252
    assert prop1.function == "serious protein"
    assert prop1.strength == pytest.approx(0.5029, abs=0.0001)
    # non-codon-multiple length: extension impossible
    assert PegProposal.create(
        test_gto, Location.create(TEST_CONTIG, "+", 1261, 1463),
        "invalid protein", 0) is None


def test_proposal_lists(test_gto):
    """AppTest.testProposalLists:220-277 — the exact counter sequence and
    survivor iteration order."""
    proposals = PegProposalList(test_gto, 0.50, 80)
    # First test -- too weak (69/207 < 0.5)
    proposals.propose(Location.create(TEST_CONTIG, "+", 1249, 1302),
                      "long function", 69)
    assert proposals.weak == 1
    assert proposals.count == 0
    assert proposals.made == 1
    # More evidence, will be stored
    proposals.propose(Location.create(TEST_CONTIG, "+", 1249, 1302),
                      "long function", 138)
    assert proposals.count == 1
    assert proposals.made == 2
    # Shorter with same strength, will not be stored
    proposals.propose(Location.create(TEST_CONTIG, "+", 1261, 1320),
                      "short function", 114)
    assert proposals.count == 1
    assert proposals.merged == 0
    assert proposals.made == 3
    # Shorter with more strength, gets merged
    proposals.propose(Location.create(TEST_CONTIG, "+", 1261, 1320),
                      "short function", 141)
    assert proposals.count == 1
    assert proposals.merged == 1
    assert proposals.made == 4
    assert proposals.small == 0
    # Min-evidence filter
    proposals.propose(Location.create(TEST_CONTIG, "-", 100, 111),
                      "small function", 75)
    assert proposals.count == 1
    assert proposals.merged == 1
    assert proposals.made == 5
    assert proposals.small == 1
    proposals.propose(Location.create(TEST_CONTIG, "-", 100, 111),
                      "small function", 85)
    assert proposals.count == 2
    assert proposals.merged == 1
    assert proposals.made == 6
    assert proposals.small == 1
    # Some more for variety
    proposals.propose(Location.create(TEST_CONTIG, "+", 825851, 825853),
                      "far protein", 163)
    proposals.propose(Location.create(TEST_CONTIG, "-", 777932, 779122),
                      "minus protein", 600)
    proposals.propose(Location.create(TEST_CONTIG, "-", 914899, 916002),
                      "minus 1104", 800)
    # One to reject (length 128 not a codon multiple)
    proposals.propose(Location.create(TEST_CONTIG, "+", 983222, 983349),
                      "invalid function", 60)
    # One last weak one (61/219 < 0.5)
    proposals.propose(Location.create(TEST_CONTIG, "+", 905257, 905415),
                      "weak function", 61)
    # Final counts (AppTest:262-267)
    assert proposals.count == 5
    assert proposals.merged == 1
    assert proposals.weak == 2
    assert proposals.rejected == 1
    assert proposals.small == 1
    assert proposals.made == 11
    # Survivor iteration order (AppTest:269-276)
    assert [p.function for p in proposals] == [
        "small function", "short function", "minus protein",
        "far protein", "minus 1104"]
