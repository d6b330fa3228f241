"""Location / Frame / proposal-adjacent coordinate-math tests, modeled on
the reference's oracles (AppTest.java:69-102, 282-343)."""

import pytest

from kmers_anno_tpu.genome import Genome, Location, Frame
from kmers_anno_tpu.genome.locations import FramedLocationLists, SortedLocationList


def test_location_basics():
    # Mirrors testKmerReferences (AppTest.java:69-102): a kmer location has
    # length 3K even in protein space (Q4).
    loc = Location.create("contig1", "+", 10, 10 + 23)
    assert loc.left == 10 and loc.begin == 10 and loc.length == 24
    assert loc.dir == "+"
    locm = Location.create("contig1", "-", 100, 100 + 23)
    assert locm.left == 100 and locm.end == 100 and locm.begin == 123
    assert locm.dir == "-"


def test_set_begin():
    loc = Location.create("c", "+", 100, 200)
    loc.set_begin(90)
    assert loc.left == 90 and loc.right == 200
    locm = Location.create("c", "-", 100, 200)
    locm.set_begin(230)
    assert locm.left == 100 and locm.right == 230


def test_frames():
    assert Location.create("c", "+", 99, 200).frame == Frame.P0
    assert Location.create("c", "+", 100, 200).frame == Frame.P1
    assert Location.create("c", "+", 101, 200).frame == Frame.P2
    assert Location.create("c", "-", 10, 99).frame == Frame.M0
    assert Location.create("c", "-", 10, 100).frame == Frame.M1
    assert Location.create("c", "-", 10, 101).frame == Frame.M2


def test_framed_location_lists():
    # Modeled on testFramedLocations (AppTest.java:282-343).
    framer = FramedLocationLists()
    plus = [Location.create("c1", "+", 100 + i, 200 + i) for i in range(6)]
    minus = [Location.create("c1", "-", 100 + i, 200 + i) for i in range(6)]
    t1 = [plus[0], plus[3], minus[0], minus[3]]
    t2 = [plus[1], plus[4], minus[1], minus[4], plus[2], minus[2]]
    for loc in t1:
        framer.connect("t1", loc)
    for loc in t2:
        framer.connect("t2", loc)
    assert framer.size() == 10
    found = []
    for target, loclist in framer:
        assert target in ("t1", "t2")
        frames = {loc.frame for loc in loclist}
        assert len(frames) == 1  # all one frame per report
        src = t1 if target == "t1" else t2
        for loc in loclist:
            assert loc in src
            found.append(loc)
    assert len(found) == 10
    framer.clear()
    assert framer.size() == 0
    assert list(iter(framer)) == []


def test_sorted_location_list_contig_range():
    sl = SortedLocationList()
    for left in (300, 100, 200):
        sl.add(Location.create("c1", "+", left, left + 23))
    sl.add(Location.create("c2", "+", 150, 173))
    assert [l.left for l in sl] == [100, 200, 300, 150]
    # contig_range excludes the anchor index and stops at the contig edge.
    assert [l.left for l in sl.contig_range(0)] == [200, 300]
    assert [l.left for l in sl.contig_range(2)] == []


@pytest.fixture(scope="module")
def orf_genome():
    """Tiny synthetic genome with a known ORF layout, replacing the
    reference's missing test.gto fixture (SURVEY.md §4)."""
    #           1         11        21        31        41
    # plus:     atg aaa ... with a start at 10 and stop at 31
    #      0-based:  contig: pad(9) + atg aaa ccc gga ggg ttt taa + pad
    dna = ("ccccccccc" +            # 1..9 padding (no starts/stops in frame)
           "atgaaacccggagggttttaa" +  # 10..30: ORF, stop ends at 30
           "cccccccccc")             # 31..40 padding
    raw = {
        "id": "9.9", "scientific_name": "Test organism", "genetic_code": 11,
        "contigs": [{"id": "c1", "dna": dna, "genetic_code": 11}],
        "features": [], "close_genomes": [], "subsystems": [],
    }
    return Genome(raw)


def test_extend_plus(orf_genome):
    # Interior codon-aligned slice of the ORF: begin snaps back to the atg
    # at 10, end extends to the stop at 30.
    loc = Location.create("c1", "+", 16, 24)
    ext = loc.extend(orf_genome)
    assert ext is not None
    assert (ext.left, ext.right) == (10, 30)
    # Non-codon-multiple proposals are invalid (AppTest.java:212: length
    # 203 proposal -> null).
    assert Location.create("c1", "+", 16, 25).extend(orf_genome) is None
    # A region whose upstream scan hits a stop first fails.
    assert Location.create("c1", "+", 34, 39).extend(orf_genome) is None


def test_extend_minus():
    # Minus-strand ORF: revcomp of atg...taa placed forward in the contig.
    # contig = pad(9) + ttaaaaccctccggtttcat + pad  (revcomp reads
    # atg aaa ccg gag ggt ttt aa..)
    from kmers_anno_tpu.genome.dna import reverse_complement
    orf = "atgaaacccggagggttttaa"
    dna = "ggggggggg" + reverse_complement(orf) + "gggggggggg"
    raw = {
        "id": "9.8", "genetic_code": 11,
        "contigs": [{"id": "c1", "dna": dna, "genetic_code": 11}],
        "features": [],
    }
    g = Genome(raw)
    # The ORF occupies 10..30 on the minus strand; begin (atg) is at
    # genome position 30 reading leftward, stop codon at 12..10.
    loc = Location.create("c1", "-", 16, 24)
    ext = loc.extend(g)
    assert ext is not None
    assert (ext.left, ext.right) == (10, 30)
    assert ext.strand == "-"
    # Sanity: the extended region translates to the ORF protein + stop.
    dna_read = g.get_dna(ext)
    from kmers_anno_tpu.genome.dna import DnaTranslator
    assert DnaTranslator(11).translate(dna_read) == "MKPGGF*"
