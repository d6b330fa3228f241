"""OrfExtender (precomputed scans) vs Location.extend (codon walker)."""

import numpy as np
import pytest

from kmers_anno_tpu.genome.gto import Genome
from kmers_anno_tpu.genome.locations import Location
from kmers_anno_tpu.ops.orf import OrfExtender


def _genome_of(seq: str, gc: int = 11) -> Genome:
    return Genome({
        "id": "1.1", "scientific_name": "t", "genetic_code": gc,
        "domain": "B", "contigs": [{"id": "c1", "dna": seq}],
        "features": [],
    })


def _compare_all(genome, n_random=4000, seed=0):
    ext = OrfExtender(genome)
    seq_len = genome.contigs[0].length
    rng = np.random.default_rng(seed)
    checked = agreed_some = 0
    for _ in range(n_random):
        left = int(rng.integers(1, max(seq_len - 3, 2)))
        length = int(rng.integers(1, 40)) * 3
        right = min(left + length - 1, seq_len)
        if (right - left + 1) % 3:
            right = left + ((right - left + 1) // 3) * 3 - 1
        if right < left:
            continue
        for strand in "+-":
            loc = Location("c1", strand, left, right)
            want = loc.extend(genome)
            got = ext.extend(loc)
            if want is None:
                assert got is None, f"{loc}: walker None, scans {got}"
            else:
                assert got == (want.left, want.right), \
                    f"{loc}: walker {(want.left, want.right)}, scans {got}"
                agreed_some += 1
            checked += 1
    assert checked > 1000 and agreed_some > 50
    return agreed_some


def test_random_sequence_gc11():
    rng = np.random.default_rng(1)
    seq = "".join("tcag"[c] for c in rng.integers(0, 4, size=5000))
    _compare_all(_genome_of(seq))


def test_random_sequence_gc4():
    rng = np.random.default_rng(2)
    seq = "".join("tcag"[c] for c in rng.integers(0, 4, size=5000))
    _compare_all(_genome_of(seq, gc=4))


def test_ambiguous_bases():
    rng = np.random.default_rng(3)
    chars = np.array(list("tcagn"))
    seq = "".join(chars[rng.integers(0, 5, size=4000)])
    _compare_all(_genome_of(seq))


def test_contig_edges():
    rng = np.random.default_rng(4)
    seq = "".join("tcag"[c] for c in rng.integers(0, 4, size=100))
    g = _genome_of(seq)
    ext = OrfExtender(g)
    for left in range(1, 98):
        for length in (3, 6, 9):
            right = left + length - 1
            if right > 100:
                continue
            for strand in "+-":
                loc = Location("c1", strand, left, right)
                want = loc.extend(g)
                got = ext.extend(loc)
                if want is None:
                    assert got is None, f"{loc}"
                else:
                    assert got == (want.left, want.right), f"{loc}"


def test_on_fixture(small_gto):
    ext = OrfExtender(small_gto)
    rng = np.random.default_rng(5)
    contig = small_gto.contigs[0]
    for _ in range(800):
        left = int(rng.integers(1, contig.length - 100))
        right = left + int(rng.integers(1, 34)) * 3 - 1
        for strand in "+-":
            loc = Location(contig.id, strand, left, right)
            want = loc.extend(small_gto)
            got = ext.extend(loc)
            if want is None:
                assert got is None, f"{loc}"
            else:
                assert got == (want.left, want.right), f"{loc}"


def test_invalid_inputs(small_gto):
    ext = OrfExtender(small_gto)
    cid = small_gto.contigs[0].id
    assert ext.extend(Location(cid, "+", 10, 13)) is None  # length % 3
    assert ext.extend(Location("nope", "+", 10, 12)) is None
