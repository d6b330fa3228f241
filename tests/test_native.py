"""Native C++ host runtime vs the pure-NumPy fallbacks (same outputs)."""

import numpy as np
import pytest

from kmers_anno_tpu import native
from kmers_anno_tpu.ops.encode import (PROT_PAD, encode_dna, encode_protein)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")

PROTS = ["MKTAYIAKQR", "ACDEFGHIKLMNPQRSTVWY", "MX*LOWerCase", "SHORT",
         "A", "", "MKVLAAGITGRPLX"]


def test_encoders_match():
    for s in PROTS + ["acgtACGTnryswkmbdhvNu"]:
        assert (native.encode_protein(s) == encode_protein(s)).all()
    for s in ["acgtACGTnryswkmbdhvu", "tcag", ""]:
        assert (native.encode_dna(s) == encode_dna(s)).all()


def test_flat_batch_matches_python():
    from kmers_anno_tpu.engine.apply_engine import FlatBatch
    import kmers_anno_tpu.native as nat

    k = 8
    fb = FlatBatch(PROTS, k)                       # native path
    lib, nat._lib, nat._tried = nat._lib, None, True
    try:
        ref = FlatBatch(PROTS, k)                  # forced Python path
    finally:
        nat._lib, nat._tried = lib, True
    assert (fb.codes == ref.codes).all()
    assert (fb.seg_ids == ref.seg_ids).all()
    assert (fb.valid == ref.valid).all()
    assert fb.n_seqs == ref.n_seqs


def test_flat_peg_batch():
    width = 64
    got = native.flat_peg_batch(["MKTAYIAK", "QR"], width, -1)
    assert got is not None
    codes, seg, pos, lens = got
    assert (codes[:8] == encode_protein("MKTAYIAK")).all()
    assert (codes[8:10] == encode_protein("QR")).all()
    assert (codes[10:] == PROT_PAD).all()
    assert list(seg[:10]) == [0] * 8 + [1] * 2 and (seg[10:] == -1).all()
    assert list(pos[:10]) == list(range(8)) + [0, 1] and (pos[10:] == 0).all()
    assert list(lens[:10]) == [8] * 8 + [2] * 2 and (lens[10:] == 0).all()


def test_fasta_native_matches_python(tmp_path):
    from kmers_anno_tpu.utils.io import FastaReader

    text = (">seq1 first comment here\nMKTAYI\nAKQR\n"
            ">seq2\nACDEFG\n\n>seq3 x\nWY\n")
    p = tmp_path / "t.fa"
    p.write_text(text)
    got = native.read_fasta(str(p))
    import io as _io
    want = [(s.label, s.comment, s.sequence)
            for s in FastaReader(_io.StringIO(text))]
    assert got == want
    # and the FastaReader path-source route agrees too
    assert [(s.label, s.comment, s.sequence)
            for s in FastaReader(str(p))] == want


def test_fasta_crlf_and_missing(tmp_path):
    p = tmp_path / "crlf.fa"
    p.write_bytes(b">a c1\r\nMKT\r\nAYI\r\n>b\r\nQR\r\n")
    assert native.read_fasta(str(p)) == [("a", "c1", "MKTAYI"), ("b", "", "QR")]
    with pytest.raises(FileNotFoundError):
        native.read_fasta(str(tmp_path / "nope.fa"))


def test_java_dataflow_baseline_matches_dict_loop():
    """kan_java_* (string-keyed map walk) must reproduce the reference's
    unanimity vote exactly (ApplyKmerProcessor.java:122-147)."""
    import numpy as np
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    k, n_kmers = 8, 4000
    alpha = "ACDEFGHIKLMNPQRSTVWY"
    kmers = list({"".join(alpha[c] for c in rng.integers(0, 20, k))
                  for _ in range(n_kmers)})
    roles = rng.integers(0, 50, len(kmers)).astype(np.int32)
    db = dict(zip(kmers, (int(r) for r in roles)))
    jb = native.JavaDataflowBaseline(kmers, roles, k)
    prots = []
    for _ in range(300):
        p = "".join(alpha[c] for c in rng.integers(0, 20, 60))
        which = rng.integers(0, len(kmers), 3)
        # plant some db kmers to force hits/conflicts
        for j, w in enumerate(which):
            p = p[: 10 + j * 15] + kmers[w] + p[10 + j * 15 + k:]
        prots.append(p)
    got = jb.apply(prots, k, 2)
    jb.close()
    for prot, r in zip(prots, got):
        role, count, bad = None, 0, False
        for i in range(len(prot) - k + 1):
            v = db.get(prot[i: i + k])
            if v is not None:
                if role is None:
                    role, count = v, 1
                elif v == role:
                    count += 1
                else:
                    bad = True
                    break
        want = role if (not bad and role is not None and count >= 2) else -1
        assert r == want


def test_java_projection_baseline_matches_packed():
    """kan_jproj (string-keyed Java dataflow) must produce the same
    pair/group/candidate counters as kan_proj (packed keys)."""
    from kmers_anno_tpu import native
    from kmers_anno_tpu.ops.encode import encode_dna
    from kmers_anno_tpu.ops.translate import codon_lut
    from tests.fixtures import make_projection_pair

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    new_g, olds = make_projection_pair(seed=21, n_genes=12)
    codes = [encode_dna(c.sequence) for c in new_g.contigs]
    lut = np.asarray(codon_lut(new_g.genetic_code), np.uint8)
    prots = [f.protein_translation for f in olds["300.1"].pegs
             if f.protein_translation]
    pb = native.ProjectionBaseline(codes, lut, 8)
    jb = native.JavaProjectionBaseline(codes, lut, 8)
    try:
        assert jb.map_size() == pb.map_size()
        got_p = pb.match(prots, 0.50, 1.5, 0.8)
        got_j = jb.match(prots, 0.50, 1.5, 0.8)
        assert got_j == got_p
        assert got_p[0] > 0 and got_p[2] > 0
    finally:
        pb.close()
        jb.close()


def test_hashanno_baseline_matches_device_engine():
    """kan_hash (sequential compiled loop) must produce the same best
    similarities/annotations as the device hashAnno engine."""
    import random

    from kmers_anno_tpu import native
    from kmers_anno_tpu.engine.hashanno import (GenomeProteinKmers,
                                                Prototype)
    from tests.fixtures import random_protein

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    rng = random.Random(31)
    proteins = [random_protein(rng, rng.randint(40, 120))
                for _ in range(60)]
    protos = []
    for i in range(40):
        src = proteins[rng.randrange(len(proteins))]
        mut = list(src)
        for _ in range(rng.randint(0, 6)):
            mut[rng.randrange(len(mut))] = rng.choice("ACDEFGHIKLMNPQRST")
        protos.append(Prototype("".join(mut), f"Role {i}"))
    protos.extend(Prototype(random_protein(rng, 80), f"Noise {i}")
                  for i in range(20))

    gk = GenomeProteinKmers(8, 0.0125)
    for i, p in enumerate(proteins):
        gk.add_protein(f"fig|1.1.peg.{i}", p, f"old {i}")
    gk.process_proposals(list(protos))

    hb = native.HashAnnoBaseline(proteins, 8, 0.0125)
    try:
        assert hb.n_kmers() == gk.n_kmers
        hb.score([p.protein for p in protos])
        sim, win = hb.best()
    finally:
        hb.close()
    assert np.allclose(sim, gk.best_sim, rtol=0, atol=0)  # exact f64
    for i in range(len(proteins)):
        want = protos[win[i]].annotation if win[i] >= 0 else f"old {i}"
        assert gk.best_anno[i] == want
    assert (sim > 0).any()


def test_dna_baseline_matches_device_probe():
    from kmers_anno_tpu import native
    from kmers_anno_tpu.engine.dna_apply import probe_dna_flat
    from kmers_anno_tpu.ops.dna_kmers import pack_dna_np
    from kmers_anno_tpu.ops.hashtable import build_table
    import jax.numpy as jnp

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    k = 15
    seq = rng.integers(0, 4, size=40_000).astype(np.uint8)
    lo, hi = pack_dna_np(seq[:20_000], k)
    key = (hi.astype(np.uint64) << np.uint64(32)) | lo
    _, idx = np.unique(key, return_index=True)
    vals = rng.integers(0, 100, len(idx)).astype(np.uint32)
    table, mp = build_table(lo[idx], hi[idx], vals)
    from kmers_anno_tpu.ops.dna_kmers import dna_valid_np

    contig = seq.copy()
    contig[1000] = 4                      # an ambiguous base
    valid = np.zeros(len(contig), bool)
    valid[: len(contig) - k + 1] = dna_valid_np(contig, k)
    got_dev = np.asarray(probe_dna_flat(
        jnp.asarray(table), jnp.asarray(contig),
        jnp.asarray(valid), k=k, max_probes=mp))
    dev_hits = int((got_dev >= 0).sum())
    cpp_hits = native.dna_baseline(contig, table, mp, k)
    assert cpp_hits == dev_hits > 0
