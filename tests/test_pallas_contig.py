"""Fused Pallas contig scanner (interpret mode) vs the XLA path."""

import numpy as np
import pytest

from kmers_anno_tpu.ops.contig_kmers import (extract_contig_kmers,
                                             extract_contig_kmers_fused)

K = 8


def _as_set(d):
    return set(zip(d["lo"].tolist(), d["hi"].tolist(),
                   d["left"].tolist(), d["strand"].tolist()))


@pytest.mark.parametrize("k", [8, 12])
def test_fused_matches_xla_random(k):
    rng = np.random.default_rng(3)
    seq = "".join("tcag"[c] for c in rng.integers(0, 4, size=2000))
    want = extract_contig_kmers(seq, k, 11)
    got = extract_contig_kmers_fused(seq, k, 11, interpret=True)
    assert len(got["lo"]) == len(want["lo"])
    assert _as_set(got) == _as_set(want)


def test_fused_matches_xla_ambiguous():
    rng = np.random.default_rng(4)
    chars = np.array(list("tcagn"))
    seq = "".join(chars[rng.integers(0, 5, size=1500)])
    want = extract_contig_kmers(seq, K, 11)
    got = extract_contig_kmers_fused(seq, K, 11, interpret=True)
    assert _as_set(got) == _as_set(want)


def test_fused_matches_on_fixture_contig(small_gto):
    seq = small_gto.contigs[0].sequence[:30000]
    want = extract_contig_kmers(seq, K, small_gto.genetic_code)
    got = extract_contig_kmers_fused(seq, K, small_gto.genetic_code,
                                     interpret=True)
    assert len(got["lo"]) == len(want["lo"])
    assert _as_set(got) == _as_set(want)


def test_fused_short_and_empty():
    for seq in ("", "tcag", "t" * (3 * K - 1)):
        got = extract_contig_kmers_fused(seq, K, 11, interpret=True)
        want = extract_contig_kmers(seq, K, 11)
        assert _as_set(got) == _as_set(want)
