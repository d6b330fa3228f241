"""Benchmark: signature-table annotation throughput on one chip.

Three workloads:

1. BASELINE config 2/4 shape — a 1M-entry discriminating-kmer table probed
   by a stream of synthetic proteins through the full fused device step
   (pack → bucketed open-addressing probe → segmented unanimous vote), and
   the same stream through the weighted best-tally vote (config 2:
   "weighted voting enabled").
2. Single-core baselines for the reference architecture
   (ApplyKmerProcessor.java:122-147): a compiled C++ loop over the same
   bucketed table (kan_apply_baseline — the honest stand-in for
   single-core Java; a Java HashMap<String,String> walk does strictly
   more work per probe) and the pure-Python dict loop (for context).
   ``vs_baseline`` is the COMPILED multiple.
3. BASELINE config 4 scale — a 10M-entry table (≈1 GB of bucket rows,
   HBM-resident, far beyond cache) probed with device-resident key
   batches; reports achieved gather bandwidth as a fraction of the chip's
   HBM peak (bytes counted conservatively: one 96 B bucket row per probe
   round actually executed).

Prints ONE json line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": R, ...}
"""

from __future__ import annotations

import json
import time

import numpy as np

K = 8
N_KEYS = 1_000_000
N_ROLES = 2000
N_PROTEINS = 8192
PROT_LEN = 300
MIN_HITS = 5
AA = "ACDEFGHIKLMNPQRSTVWY"

BIG_KEYS = 10_000_000
BIG_QUERIES = 4_000_000

# HBM peak bytes/s by device kind substring (public spec sheets)
HBM_PEAK = [("v5 lite", 819e9), ("v5e", 819e9), ("v5p", 2765e9),
            ("v4", 1228e9), ("v6", 1640e9)]


def make_workload(rng: np.random.Generator):
    """Synthetic proteins with planted role segments + a kmer→role table."""
    from kmers_anno_tpu.engine.signature import pack_kmers_np

    # role "prototype" proteins; every bench protein embeds one prototype
    # window so probes actually hit (hit-rate matters for bandwidth).
    protos = rng.integers(0, 20, size=(N_ROLES, 120)).astype(np.uint8)
    proteins = rng.integers(0, 20, size=(N_PROTEINS, PROT_LEN)).astype(
        np.uint8)
    which = rng.integers(0, N_ROLES, size=N_PROTEINS)
    proteins[:, 100:220] = protos[which]

    lo_all, hi_all, role_all = [], [], []
    for r in range(N_ROLES):
        lo, hi = pack_kmers_np(protos[r], K)
        lo_all.append(lo)
        hi_all.append(hi)
        role_all.append(np.full(len(lo), r, np.int32))
    # plus random filler keys up to N_KEYS
    n_proto = sum(len(x) for x in lo_all)
    n_fill = max(0, N_KEYS - n_proto)
    fill = rng.integers(0, 20, size=(n_fill + K - 1,)).astype(np.uint8)
    flo, fhi = pack_kmers_np(fill, K)
    lo_all.append(flo)
    hi_all.append(fhi)
    role_all.append(rng.integers(0, N_ROLES, size=len(flo)).astype(np.int32))
    lo = np.concatenate(lo_all)
    hi = np.concatenate(hi_all)
    role = np.concatenate(role_all)
    # dedup (first occurrence wins, like HashMap.computeIfAbsent)
    uniq, idx = np.unique(np.stack([hi, lo], 1), axis=0, return_index=True)
    del uniq
    return proteins, lo[np.sort(idx)], hi[np.sort(idx)], role[np.sort(idx)]


def _flat_stream(proteins):
    n, plen = proteins.shape
    codes = proteins.reshape(-1)
    seg_ids = np.repeat(np.arange(n, dtype=np.int32), plen)
    valid = np.ones(n * plen, bool)
    for i in range(n):
        valid[(i + 1) * plen - K + 1: (i + 1) * plen] = False
    return codes, seg_ids, valid


def _time_device(run, n_iter=20):
    out = run()  # compile + warm
    out[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = run()
    out[0].block_until_ready()
    return (time.perf_counter() - t0) / n_iter, out


def bench_device(proteins, key_lo, key_hi, roles):
    import jax
    import jax.numpy as jnp
    from kmers_anno_tpu.engine.apply_engine import (apply_flat,
                                                    apply_weighted_flat)
    from kmers_anno_tpu.ops.hashtable import build_table

    n, plen = proteins.shape
    codes, seg_ids, valid = _flat_stream(proteins)

    table, max_probes = build_table(key_lo, key_hi, roles.astype(np.uint32))
    d_table = jnp.asarray(table)  # device-resident: never re-uploaded
    d_codes = jnp.asarray(codes)
    d_seg = jnp.asarray(seg_ids)
    d_valid = jnp.asarray(valid)

    def run():
        return apply_flat(d_table, d_codes, d_seg, d_valid,
                          jnp.int32(MIN_HITS), k=K, max_probes=max_probes,
                          n_seqs=n)

    dt, (role_out, _) = _time_device(run)

    # weighted best-tally vote over the same stream (config 2 shape)
    wbits = np.uint32(np.float16(1.0).view(np.uint16)) << np.uint32(16)
    wvals = wbits | roles.astype(np.uint32)
    wtable, wmax_probes = build_table(key_lo, key_hi, wvals)
    d_wtable = jnp.asarray(wtable)

    def run_weighted():
        return apply_weighted_flat(d_wtable, d_codes, d_seg, d_valid,
                                   jnp.float32(MIN_HITS), k=K,
                                   max_probes=wmax_probes, n_seqs=n,
                                   n_roles=N_ROLES)

    wdt, _ = _time_device(run_weighted)

    called = int((np.asarray(role_out) >= 0).sum())
    lookups = int(valid.sum())
    return dict(seconds=dt, proteins_per_s=n / dt, lookups_per_s=lookups / dt,
                weighted_proteins_per_s=n / wdt, called=called,
                table=table, max_probes=max_probes,
                platform=jax.devices()[0].platform,
                device=str(jax.devices()[0]),
                device_kind=jax.devices()[0].device_kind)


def bench_cpp_baseline(proteins, table, max_probes):
    """Single-core compiled loop over the same table (stand-in for
    single-core Java — see kan_apply_baseline in native/kan_host.cpp)."""
    from kmers_anno_tpu import native

    roles = native.apply_baseline(proteins, table, max_probes, K, MIN_HITS)
    if roles is None:
        return None
    t0 = time.perf_counter()
    roles = native.apply_baseline(proteins, table, max_probes, K, MIN_HITS)
    dt = time.perf_counter() - t0
    return dict(proteins_per_s=len(proteins) / dt,
                called=int((roles >= 0).sum()))


def bench_python_baseline(proteins, key_lo, key_hi, roles, sample=256):
    """Single-core dict loop (context only; Python is far slower than the
    Java the reference actually runs)."""
    from kmers_anno_tpu.engine.signature import unpack_kmer_np
    from kmers_anno_tpu.ops.encode import decode_protein

    texts = [decode_protein(row)
             for row in unpack_kmer_np(key_lo, key_hi, K)]
    db = dict(zip(texts, (int(r) for r in roles)))
    prots = ["".join(AA[c] for c in p) for p in proteins[:sample]]
    t0 = time.perf_counter()
    n_called = 0
    for prot in prots:
        role_id = None
        count = 0
        bad = False
        for i in range(len(prot) - K + 1):
            possible = db.get(prot[i: i + K])
            if possible is not None:
                if role_id is None:
                    role_id = possible
                    count = 1
                elif possible == role_id:
                    count += 1
                else:
                    bad = True
                    break
        if role_id is not None and not bad and count >= MIN_HITS:
            n_called += 1
    dt = time.perf_counter() - t0
    return dict(proteins_per_s=len(prots) / dt, called=n_called,
                sample=len(prots))


def bench_big_table(rng, device_kind):
    """10M-entry HBM-resident table: achieved probe bandwidth vs HBM peak."""
    import jax.numpy as jnp
    from kmers_anno_tpu.ops.hashtable import build_table, probe_table

    combined = np.unique(rng.integers(0, 1 << 59, BIG_KEYS + 200_000,
                                      dtype=np.uint64))[:BIG_KEYS]
    key_lo = (combined & np.uint64(0x3FFFFFFF)).astype(np.uint32)
    key_hi = (combined >> np.uint64(30)).astype(np.uint32)
    vals = rng.integers(0, N_ROLES, len(key_lo), dtype=np.int64)
    table, max_probes = build_table(key_lo, key_hi, vals.astype(np.uint32))
    q = rng.integers(0, len(key_lo), BIG_QUERIES)
    d_table = jnp.asarray(table)
    d_qlo = jnp.asarray(key_lo[q])
    d_qhi = jnp.asarray(key_hi[q])
    d_valid = jnp.ones(BIG_QUERIES, bool)

    def run():
        return (probe_table(d_table, d_qlo, d_qhi, d_valid, max_probes),)

    dt, (out,) = _time_device(run)
    assert int((np.asarray(out) >= 0).sum()) == BIG_QUERIES  # all hits
    lookups_per_s = BIG_QUERIES / dt
    # conservative traffic: every probe executes max_probes unrolled
    # rounds of one 96 B bucket-row gather each
    bytes_per_s = lookups_per_s * 96 * max_probes
    peak = next((v for s, v in HBM_PEAK if s in device_kind.lower()), None)
    return dict(
        table_entries=len(key_lo), table_bytes=int(table.nbytes),
        max_probes=max_probes,
        lookups_per_s=round(lookups_per_s, 0),
        gather_bytes_per_s=round(bytes_per_s, 0),
        hbm_peak_bytes_per_s=peak,
        hbm_fraction=round(bytes_per_s / peak, 3) if peak else None)


def main():
    rng = np.random.default_rng(seed=7)
    proteins, key_lo, key_hi, roles = make_workload(rng)
    dev = bench_device(proteins, key_lo, key_hi, roles)
    cpp = bench_cpp_baseline(proteins, dev["table"], dev["max_probes"])
    py = bench_python_baseline(proteins, key_lo, key_hi, roles)
    big = bench_big_table(rng, dev["device_kind"])

    vs_cpp = (dev["proteins_per_s"] / cpp["proteins_per_s"]) if cpp else None
    vs_py = dev["proteins_per_s"] / py["proteins_per_s"]
    print(json.dumps({
        "metric": "protein sequences/s/chip annotated (1M-entry table)",
        "value": round(dev["proteins_per_s"], 1),
        "unit": "proteins/s",
        # the honest multiple: vs a compiled single-core loop over the
        # same table (stand-in for single-core Java, BASELINE.md:24-27)
        "vs_baseline": round(vs_cpp, 2) if vs_cpp else round(vs_py, 2),
        "vs_compiled_core": round(vs_cpp, 2) if vs_cpp else None,
        "vs_python_core": round(vs_py, 2),
        "weighted_proteins_per_s": round(dev["weighted_proteins_per_s"], 1),
        "kmer_lookups_per_s": round(dev["lookups_per_s"], 0),
        "compiled_core_proteins_per_s":
            round(cpp["proteins_per_s"], 1) if cpp else None,
        "python_core_proteins_per_s": round(py["proteins_per_s"], 1),
        "platform": dev["platform"],
        "device_kind": dev["device_kind"],
        "n_table_keys": int(len(key_lo)),
        "called_device": dev["called"],
        "called_compiled": cpp["called"] if cpp else None,
        "big_table": big,
    }))


if __name__ == "__main__":
    main()
