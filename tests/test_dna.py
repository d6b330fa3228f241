"""Host DNA translation tests, including the self-consistency oracle the
reference uses (AppTest.java:131-138): every translated region must
round-trip through the genome's DNA."""

import numpy as np

from kmers_anno_tpu.genome.dna import DnaTranslator, GeneticCode, reverse_complement


def test_reverse_complement():
    assert reverse_complement("acgt") == "acgt"
    assert reverse_complement("aaTTg") == "cAAtt"
    assert reverse_complement("acgtn") == "nacgt"


def test_translate_basic():
    x = DnaTranslator(11)
    # atg gaa taa -> M E *
    assert x.translate("atggaataa") == "ME*"
    assert x.translate("ATGGAATAA") == "ME*"
    # frame 2
    assert x.translate("catggaataa", 2, 9) == "ME*"
    # truncation to whole codons
    assert x.translate("atggaat") == "ME"
    # ambiguity
    assert x.translate("atngaataa") == "XE*"


def test_peg_translate_start_codons():
    x = DnaTranslator(11)
    # ttg and ctg are starts -> M; gtg is NOT in the reference's start set
    # (AppTest.java:169).
    assert x.peg_translate("ttggaataa", 1, 6) == "ME"
    assert x.peg_translate("ctggaataa", 1, 6) == "ME"
    assert x.peg_translate("atggaataa", 1, 6) == "ME"
    assert x.peg_translate("gtggaataa", 1, 6) == "VE"


def test_genetic_code_4():
    # tga -> W in genetic code 4
    assert DnaTranslator(4).translate("tga") == "W"
    assert DnaTranslator(11).translate("tga") == "*"
    assert GeneticCode.get(4).stops == {"taa", "tag"}
    assert GeneticCode.get(11).stops == {"taa", "tag", "tga"}


def test_codon_table_standard_spots():
    x = DnaTranslator(11)
    assert x.translate("tttctgatgtggtag") == "FLMW*"


def test_aa_lut_matches_translator():
    code = GeneticCode.get(11)
    lut = code.aa_lut()
    assert lut.shape == (65,)
    assert chr(lut[64]) == "X"
    x = DnaTranslator(11)
    bases = "tcag"
    for i in range(64):
        codon = bases[i // 16] + bases[(i // 4) % 4] + bases[i % 4]
        assert chr(lut[i]) == x.translate(codon)
