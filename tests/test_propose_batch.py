"""Vectorized proposal tail vs the scalar path.

``OrfExtender.extend_batch`` must be element-wise identical to ``extend``;
``PegProposalList.propose_batch`` must be counter- and state-identical to
calling ``propose`` per candidate, including merges against incumbents
stored by EARLIER batches (the per-close-genome call pattern).
"""

import random

import numpy as np

from kmers_anno_tpu.engine.proposals import PegProposal, PegProposalList
from kmers_anno_tpu.genome.gto import Genome
from kmers_anno_tpu.genome.locations import Location
from kmers_anno_tpu.ops.orf import OrfExtender


def _genome(seed: int = 5, n: int = 6000) -> Genome:
    rng = random.Random(seed)
    seq = "".join(rng.choice("acgt") for _ in range(n))
    return Genome({
        "id": "99.1", "scientific_name": "t", "genetic_code": 11,
        "domain": "B", "contigs": [{"id": "c1", "dna": seq},
                                   {"id": "c2", "dna": seq[::-1]}],
        "features": []})


def _candidates(genome, n_cand, seed):
    rng = np.random.default_rng(seed)
    sizes = [c.length for c in genome.contigs]
    contig_idx = rng.integers(0, len(sizes), n_cand)
    strands = rng.integers(0, 2, n_cand)
    lefts = np.empty(n_cand, np.int64)
    rights = np.empty(n_cand, np.int64)
    for i in range(n_cand):
        ln = int(rng.integers(1, 60)) * 3
        left = int(rng.integers(1, max(sizes[contig_idx[i]] - ln, 2)))
        lefts[i] = left
        rights[i] = left + ln - 1
    evidence = rng.integers(1, 60, n_cand).astype(np.int64)
    func_idx = rng.integers(0, 4, n_cand)
    return contig_idx, strands, lefts, rights, evidence, func_idx


def test_extend_batch_matches_scalar():
    genome = _genome()
    ext = OrfExtender(genome)
    contig_idx, strands, lefts, rights, _, _ = _candidates(genome, 3000, 1)
    ids = [c.id for c in genome.contigs]
    bl, br, ok = ext.extend_batch(contig_idx, ids, strands, lefts, rights)
    for i in range(len(lefts)):
        loc = Location(ids[contig_idx[i]], "+-"[strands[i]],
                       int(lefts[i]), int(rights[i]))
        want = ext.extend(loc)
        if want is None:
            assert not ok[i], (i, loc, (bl[i], br[i]))
        else:
            assert ok[i] and (bl[i], br[i]) == want, (i, loc)


def _snapshot(plist: PegProposalList):
    return (plist.made, plist.rejected, plist.weak, plist.small,
            plist.merged,
            {k: (p.loc.left, p.loc.right, p.function, p.evidence)
             for k, p in plist._by_orf.items()})


def test_propose_batch_matches_scalar_stream():
    genome = _genome()
    ids = [c.id for c in genome.contigs]
    functions = [f"fun {i}" for i in range(4)]
    want = PegProposalList(genome, 0.12, 8)
    got = PegProposalList(genome, 0.12, 8)
    all_stored_scalar = []
    all_stored_batch = []
    for batch in range(4):  # later batches merge against incumbents
        cand = _candidates(genome, 800, 10 + batch)
        contig_idx, strands, lefts, rights, evidence, func_idx = cand
        for i in range(len(lefts)):
            loc = Location(ids[contig_idx[i]], "+-"[strands[i]],
                           int(lefts[i]), int(rights[i]))
            p = want.propose(loc, functions[func_idx[i]], int(evidence[i]))
            if p is not None:
                all_stored_scalar.append(
                    (batch, i, p.loc.left, p.loc.right, p.function,
                     p.evidence))
        stored = got.propose_batch(contig_idx, ids, strands, lefts, rights,
                                   evidence, func_idx, functions)
        for ci, p in stored:
            all_stored_batch.append(
                (batch, ci, p.loc.left, p.loc.right, p.function,
                 p.evidence))
    assert _snapshot(got) == _snapshot(want)
    # the stored-proposal sequence (trace parity): same candidates stored
    assert ([t[:2] for t in all_stored_batch]
            == [t[:2] for t in all_stored_scalar])
    # final iteration order identical
    assert ([p.sort_key() for p in got] == [p.sort_key() for p in want])


def test_propose_batch_empty():
    genome = _genome()
    plist = PegProposalList(genome, 0.1, 5)
    out = plist.propose_batch(
        np.zeros(0, np.int64), ["c1"], np.zeros(0, np.int64),
        np.zeros(0, np.int64), np.zeros(0, np.int64),
        np.zeros(0, np.int64), np.zeros(0, np.int64), [])
    assert out == [] and plist.count == 0 and plist.made == 0
