"""Device ops tests (run on CPU JAX): encoding, translation, kmer packing,
hash table build/probe, voting.  Includes the reference's self-consistency
oracle: every contig kmer must re-translate from its claimed location
(AppTest.java:109-138)."""

import numpy as np
import jax.numpy as jnp
import pytest

from kmers_anno_tpu.genome.dna import DnaTranslator, reverse_complement
from kmers_anno_tpu.ops import encode
from kmers_anno_tpu.ops.translate import codon_lut, sliding_translate, frame_protein
from kmers_anno_tpu.ops.kmers import pack_kmer_windows, kmer_valid_mask, window_any
from kmers_anno_tpu.ops.hashing import mix_kmer
from kmers_anno_tpu.ops.hashtable import build_table, probe_table, table_size_for, EMPTY
from kmers_anno_tpu.ops.vote import unanimous_vote


# ----- encode -----

def test_protein_roundtrip():
    s = "MNFLKLLIKINWIYSGKRKSSW"
    codes = encode.encode_protein(s)
    assert encode.decode_protein(codes) == s
    assert codes.dtype == np.uint8


def test_protein_special_codes():
    codes = encode.encode_protein("AX*z-")
    assert codes[0] == 0
    assert codes[1] == encode.PROT_X
    assert codes[2] == encode.PROT_STOP
    assert codes[3] == 25
    assert codes[4] == encode.PROT_OTHER


def test_protein_batch():
    codes, lengths = encode.encode_protein_batch(["ABC", "DE"], pad_to=5)
    assert codes.shape == (2, 5)
    assert list(lengths) == [3, 2]
    assert codes[1, 2] == encode.PROT_PAD


def test_dna_roundtrip_and_rc():
    s = "acgtn"
    codes = encode.encode_dna(s)
    assert encode.decode_dna(codes) == s
    rc = encode.reverse_complement_codes(codes)
    assert encode.decode_dna(rc) == reverse_complement(s)


# ----- translate -----

def test_sliding_translate_matches_host():
    dna = "atggaataacgtacgtnacgtagctagg"
    x = DnaTranslator(11)
    codes = jnp.asarray(encode.encode_dna(dna))
    lut = jnp.asarray(codon_lut(11))
    aa = np.asarray(sliding_translate(codes, lut))
    for frame in range(3):
        host = x.translate(dna, frame + 1, len(dna))
        dev = encode.decode_protein(np.asarray(frame_protein(jnp.asarray(aa), frame)))
        assert dev[: len(host)] == host


# ----- kmer packing -----

def test_pack_kmer_text_identity():
    # Equal kmer text <=> equal packed key, regardless of position.
    s = "ABCDEFGHABCDEFGH"
    codes = jnp.asarray(encode.encode_protein(s))[None, :]
    lo, hi = pack_kmer_windows(codes, 8)
    lo, hi = np.asarray(lo)[0], np.asarray(hi)[0]
    assert lo[0] == lo[8] and hi[0] == hi[8]
    assert (lo[0], hi[0]) != (lo[1], hi[1])


def test_pack_kmer_unpack():
    # Manual unpack must reproduce the text for K spanning both words.
    s = "MKTAYIAKQR"
    k = 10
    codes = jnp.asarray(encode.encode_protein(s))[None, :]
    lo, hi = pack_kmer_windows(codes, k)
    lo0, hi0 = int(np.asarray(lo)[0, 0]), int(np.asarray(hi)[0, 0])
    chars = []
    for j in range(k):
        if j < 6:
            chars.append((lo0 >> (5 * j)) & 31)
        else:
            chars.append((hi0 >> (5 * (j - 6))) & 31)
    assert encode.decode_protein(np.array(chars, dtype=np.uint8)) == s


def test_window_any():
    flags = jnp.asarray(np.array([[0, 0, 1, 0, 0, 0]], dtype=bool))
    out = np.asarray(window_any(flags, 3))[0]
    assert list(out) == [True, True, True, False, False, False]


def test_valid_mask_q1_q2():
    # Protein of length 12, K=8: positions 0..4 valid with drop_last=False,
    # 0..3 with drop_last=True (Q1).  An X at position 9 kills windows 2..9.
    prot = "ABCDEFGHIXKL"
    codes, lengths = encode.encode_protein_batch([prot])
    codes, lengths = jnp.asarray(codes), jnp.asarray(lengths)
    m_all = np.asarray(kmer_valid_mask(codes, lengths, 8, False, False))[0]
    m_drop = np.asarray(kmer_valid_mask(codes, lengths, 8, False, True))[0]
    assert list(np.nonzero(m_all)[0]) == [0, 1]   # 2..4 contain the X
    assert list(np.nonzero(m_drop)[0]) == [0, 1]
    # Without the X all of 0..4 (resp. 0..3) are valid.
    prot2 = "ABCDEFGHIJKL"
    codes2, lengths2 = encode.encode_protein_batch([prot2])
    m2 = np.asarray(kmer_valid_mask(jnp.asarray(codes2), jnp.asarray(lengths2), 8, False, False))[0]
    m2d = np.asarray(kmer_valid_mask(jnp.asarray(codes2), jnp.asarray(lengths2), 8, False, True))[0]
    assert list(np.nonzero(m2)[0]) == [0, 1, 2, 3, 4]
    assert list(np.nonzero(m2d)[0]) == [0, 1, 2, 3]
    # Q2: contig path also rejects '*'.
    prot3 = "ABCDEFGHI*KLMNOPQR"
    codes3, lengths3 = encode.encode_protein_batch([prot3])
    m3 = np.asarray(kmer_valid_mask(jnp.asarray(codes3), jnp.asarray(lengths3), 8, True, True))[0]
    assert not m3[2:10].any()
    m3peg = np.asarray(kmer_valid_mask(jnp.asarray(codes3), jnp.asarray(lengths3), 8, False, True))[0]
    assert m3peg[2:10].all()


# ----- hash table -----

def _random_keys(n, seed=0):
    rng = np.random.default_rng(seed)
    # Emulate packed kmers: 8 chars x 5 bits, values < 26.
    chars = rng.integers(0, 26, size=(n, 8), dtype=np.uint32)
    lo = np.zeros(n, np.uint32)
    hi = np.zeros(n, np.uint32)
    for j in range(8):
        if j < 6:
            lo |= chars[:, j] << (5 * j)
        else:
            hi |= chars[:, j] << (5 * (j - 6))
    # Deduplicate.
    packed = (lo.astype(np.uint64) << 32) | hi.astype(np.uint64)
    _, idx = np.unique(packed, return_index=True)
    return lo[idx], hi[idx]


def test_hash_mix_host_device_agree():
    lo, hi = _random_keys(1000)
    h_np = mix_kmer(lo, hi, np)
    h_jnp = np.asarray(mix_kmer(jnp.asarray(lo), jnp.asarray(hi), jnp))
    assert (h_np == h_jnp).all()


def test_table_build_probe_roundtrip():
    lo, hi = _random_keys(5000)
    n = lo.shape[0]
    values = np.arange(n, dtype=np.int32) % 7
    table, max_probes = build_table(lo, hi, values)
    assert table.shape[0] == table_size_for(n)
    assert max_probes >= 1
    # Every inserted key must probe back to its value.
    got = np.asarray(probe_table(table, jnp.asarray(lo), jnp.asarray(hi),
                                 jnp.ones(n, bool), max_probes))
    assert (got == values).all()
    # Unseen keys miss.
    lo2, hi2 = _random_keys(2000, seed=1)
    packed = set(zip(lo.tolist(), hi.tolist()))
    fresh = np.array([(l, h) not in packed for l, h in zip(lo2.tolist(), hi2.tolist())])
    got2 = np.asarray(probe_table(table, jnp.asarray(lo2), jnp.asarray(hi2),
                                  jnp.ones(lo2.shape[0], bool), max_probes))
    assert (got2[fresh] == -1).all()
    # Invalid queries return -1 without probing.
    got3 = np.asarray(probe_table(table, jnp.asarray(lo), jnp.asarray(hi),
                                  jnp.zeros(n, bool), max_probes))
    assert (got3 == -1).all()


def test_table_slot_count_power_of_two():
    # bucket counts: 100 keys / (0.5 load × 8 slots) = 25 → 32 buckets
    assert table_size_for(100, 0.5) == 32
    assert table_size_for(1, 0.5) == 2


# ----- vote -----

def test_unanimous_vote_semantics():
    # Row 0: unanimous role 3, 4 hits -> called with count 4.
    # Row 1: conflicting roles -> bad peg, not called (Q9).
    # Row 2: unanimous but below min_hits -> not called, count still 2.
    # Row 3: no hits -> not called.
    roles = jnp.asarray(np.array([
        [3, -1, 3, 3, 3, -1],
        [2, 2, 2, 2, 5, 2],
        [1, -1, -1, 1, -1, -1],
        [-1, -1, -1, -1, -1, -1],
    ], dtype=np.int32))
    valid = jnp.ones(roles.shape, bool)
    role, count = unanimous_vote(roles, valid, jnp.int32(3))
    assert list(np.asarray(role)) == [3, -1, -1, -1]
    assert list(np.asarray(count)) == [4, 0, 2, 0]
    # Invalid positions are ignored even if they carry a conflicting role.
    valid2 = jnp.asarray(np.array([[True] * 5 + [False]] * 4))
    role2, count2 = unanimous_vote(roles[1:2], valid2[:1], jnp.int32(3))
    assert list(np.asarray(role2)) == [-1]  # conflict at index 4 still valid
