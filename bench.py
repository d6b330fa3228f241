"""Benchmark: signature-table annotation throughput on one chip.

Workload (BASELINE.json config 2/4 shape): a 1M-entry discriminating-kmer
table probed by a stream of synthetic proteins; the full fused device step
(pack → open-addressing probe → segmented unanimous vote).

Baseline: the reference architecture is a single-threaded HashMap loop
(ApplyKmerProcessor.java:122-147).  The same workload is run through the
pure-Python dict transcription of that loop on a sample and extrapolated
per-protein; ``vs_baseline`` = device proteins/s ÷ single-core proteins/s.

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
    uniq, idx = np.unique(np.stack([hi, lo], 1), axis=1 - 1,
                          return_index=True)
    return proteins, lo[np.sort(idx)], hi[np.sort(idx)], role[np.sort(idx)]


def bench_device(proteins, key_lo, key_hi, roles):
    import jax
    import jax.numpy as jnp
    from kmers_anno_tpu.engine.apply_engine import apply_flat
    from kmers_anno_tpu.ops.hashtable import build_table

    n, plen = proteins.shape
    codes = proteins.reshape(-1)
    seg_ids = np.repeat(np.arange(n, dtype=np.int32), plen)
    valid = np.ones(n * plen, bool)
    for i in range(n):
        valid[(i + 1) * plen - K + 1: (i + 1) * plen] = False

    table, max_probes = build_table(key_lo, key_hi, roles.astype(np.uint32))
    table = jnp.asarray(table)  # device-resident: never re-uploaded
    d_codes = jnp.asarray(codes)
    d_seg = jnp.asarray(seg_ids)
    d_valid = jnp.asarray(valid)

    def run():
        return apply_flat(table, d_codes, d_seg, d_valid,
                          jnp.int32(MIN_HITS), k=K, max_probes=max_probes,
                          n_seqs=n)

    role_out, hits = run()  # compile + warm
    role_out.block_until_ready()
    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        role_out, hits = run()
    role_out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iter
    called = int((np.asarray(role_out) >= 0).sum())
    lookups = int(valid.sum())
    return dict(seconds=dt, proteins_per_s=n / dt, lookups_per_s=lookups / dt,
                called=called, platform=jax.devices()[0].platform,
                device=str(jax.devices()[0]))


def bench_python_baseline(proteins, key_lo, key_hi, roles, sample=256):
    """Single-core dict loop (the reference's HashMap architecture)."""
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


def main():
    rng = np.random.default_rng(seed=7)
    proteins, key_lo, key_hi, roles = make_workload(rng)
    dev = bench_device(proteins, key_lo, key_hi, roles)
    base = bench_python_baseline(proteins, key_lo, key_hi, roles)
    vs = dev["proteins_per_s"] / base["proteins_per_s"]
    print(json.dumps({
        "metric": "protein sequences/s/chip annotated (1M-entry table)",
        "value": round(dev["proteins_per_s"], 1),
        "unit": "proteins/s",
        "vs_baseline": round(vs, 2),
        "kmer_lookups_per_s": round(dev["lookups_per_s"], 0),
        "baseline_proteins_per_s": round(base["proteins_per_s"], 1),
        "platform": dev["platform"],
        "n_table_keys": int(len(key_lo)),
        "called_device": dev["called"],
    }))


if __name__ == "__main__":
    main()
