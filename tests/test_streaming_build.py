"""Streaming signature build (bounded memory) + binary table format."""

import numpy as np
import pytest

from kmers_anno_tpu.engine.signature import (CONFLICT, SignatureTable,
                                             StreamingTableBuilder,
                                             build_signatures)

from fixtures import ROLE_DEFS, make_genome, make_role_map

GOOD = {rid for rid, _ in ROLE_DEFS[:4]}


def _synthetic(n, seed, n_roles=50):
    rng = np.random.default_rng(seed)
    lo = rng.integers(0, 2**31, n, dtype=np.int64).astype(np.uint32)
    hi = rng.integers(0, 2**20, n, dtype=np.int64).astype(np.uint32)
    role = rng.integers(0, n_roles, n, dtype=np.int64).astype(np.int32)
    return lo, hi, role


def oracle_resolve(chunks, kills):
    seen = {}
    for lo, hi, role in chunks:
        for a, b, r in zip(lo.tolist(), hi.tolist(), role.tolist()):
            key = (a, b)
            if key in seen and seen[key] != r:
                seen[key] = int(CONFLICT)
            elif key not in seen:
                seen[key] = r
    killset = set()
    for lo, hi in kills:
        killset.update(zip(lo.tolist(), hi.tolist()))
    return {k: r for k, r in seen.items()
            if r != CONFLICT and k not in killset}


@pytest.mark.parametrize("backend", ["auto", "device"])
def test_streaming_flushes_match_oracle(backend):
    chunks = [_synthetic(4000, s) for s in range(5)]
    # force real conflicts: chunk 0's keys reappear with different roles
    lo0, hi0, r0 = chunks[0]
    chunks.append((lo0[:500], hi0[:500], (r0[:500] + 1) % 50))
    # and real duplicates with the SAME role (must not conflict)
    chunks.append((lo0[500:900], hi0[500:900], r0[500:900]))
    kills = [(lo0[900:1000], hi0[900:1000])]

    b = StreamingTableBuilder(chunk_entries=2048, backend=backend)
    for lo, hi, role in chunks:
        b.add_candidates(lo, hi, role)
    for lo, hi in kills:
        b.add_kills(lo, hi)
    lo, hi, role, stats = b.finish()

    expect = oracle_resolve(chunks, kills)
    got = dict(zip(zip(lo.tolist(), hi.tolist()), role.tolist()))
    assert got == expect
    assert stats["pruned"] > 0 and stats["killed"] > 0
    # sorted unique output
    key = hi.astype(np.uint64) << np.uint64(32) | lo.astype(np.uint64)
    assert (np.diff(key.astype(np.int64)) > 0).all()


def test_native_matches_device_builder():
    """The C++ merge builder and the device sort group-by produce the
    identical (keys, roles, stats) table on the same stream."""
    from kmers_anno_tpu import native
    if not native.available():
        pytest.skip("native builder unavailable")
    chunks = [_synthetic(6000, 20 + s) for s in range(4)]
    lo0, hi0, r0 = chunks[0]
    chunks.append((lo0[:700], hi0[:700], (r0[:700] + 3) % 50))
    kills = [(lo0[800:1200], hi0[800:1200]), (chunks[1][0][:50],
                                              chunks[1][1][:50])]
    outs = []
    for backend in ("native", "device"):
        b = StreamingTableBuilder(chunk_entries=4096, backend=backend)
        for lo, hi, role in chunks:
            b.add_candidates(lo, hi, role)
        for lo, hi in kills:
            b.add_kills(lo, hi)
        outs.append(b.finish())
    (nlo, nhi, nrole, nstats), (dlo, dhi, drole, dstats) = outs
    assert (nlo == dlo).all() and (nhi == dhi).all()
    assert (nrole == drole).all()
    assert nstats == dstats


def test_streaming_memory_bounded():
    """Feeding the same chunk repeatedly must not grow the state."""
    lo, hi, role = _synthetic(10000, 3)
    b = StreamingTableBuilder(chunk_entries=4096, backend="device")
    for _ in range(8):
        b.add_candidates(lo, hi, role)
        b._flush()
        assert len(b.state[0]) <= 10000
    out_lo, _, _, stats = b.finish()
    assert stats["unique"] <= 10000


def test_binary_roundtrip(tmp_path):
    genomes = [make_genome(f"500{i}.1", seed=60 + i) for i in range(2)]
    t = build_signatures(genomes, make_role_map(), GOOD, k=8,
                         progress=False, weight_mode="balance")
    path = str(tmp_path / "db.kdb")
    t.save(path)  # extension routes to binary
    with open(path, "rb") as fh:
        assert fh.read(4) == b"PK\x03\x04"
    loaded = SignatureTable.load(path)  # magic routes to binary loader
    assert loaded.k == t.k and loaded.alphabet == t.alphabet
    assert (loaded.key_lo == t.key_lo).all()
    assert (loaded.key_hi == t.key_hi).all()
    assert (loaded.role_idx == t.role_idx).all()
    assert loaded.role_ids == t.role_ids
    np.testing.assert_allclose(loaded.weights, t.weights)


def test_binary_unweighted_roundtrip(tmp_path):
    genomes = [make_genome("600.1", seed=81)]
    t = build_signatures(genomes, make_role_map(), GOOD, k=8,
                         progress=False)
    path = str(tmp_path / "db.npz")
    t.save(path)
    loaded = SignatureTable.load(path)
    assert loaded.weights is None
    assert sorted(loaded.kmer_texts()) == sorted(t.kmer_texts())


@pytest.mark.slow
def test_streaming_build_large():
    """~8M occurrences through a 1M-entry chunk budget (12 flushes)."""
    b = StreamingTableBuilder(chunk_entries=1 << 20)
    total = 0
    for s in range(8):
        lo, hi, role = _synthetic(1 << 20, 100 + s, n_roles=500)
        b.add_candidates(lo, hi, role)
        total += 1 << 20
    lo, hi, role, stats = b.finish()
    assert stats["unique"] > 4_000_000
    assert len(lo) == stats["unique"] - stats["pruned"]
