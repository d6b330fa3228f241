"""Benchmark: signature-table annotation throughput on one chip.

TIMING METHODOLOGY (r3, honest): on the axon tunnel ``block_until_ready``
returns before the device finishes, so r1/r2 device numbers measured async
dispatch and overstated throughput ~20-30×.  Every device measurement here
chains N DISTINCT batches through one jitted ``lax.scan`` whose carry folds
each result into a checksum (a real data dependence XLA cannot hoist or
CSE), then pulls the checksum to the host; elapsed/N is the per-batch
time.  r1/r2 JSON is NOT comparable to r3+.

Workloads:

1. BASELINE config 2/4 shape — a 1M-entry discriminating-kmer table probed
   by a stream of synthetic proteins through the full fused device step
   (pack → bucketed open-addressing probe → segmented unanimous vote), and
   the same stream through the weighted best-tally vote (config 2).
2. Single-core baselines (ApplyKmerProcessor.java:122-147): a compiled C++
   loop over the same bucketed table (the honest stand-in for single-core
   Java) and the pure-Python dict loop.  ``vs_baseline`` is the COMPILED
   multiple, or null when the native library is unavailable (never the
   Python multiple).
3. BASELINE config 4 scale — a 10M-entry HBM-resident table (~0.4 GB)
   probed through BOTH the plain gather walk and the sort-and-stream
   sliced probe (ops.sliced_probe), reporting the speedup and achieved
   bandwidth vs HBM peak.
4. DNA mode (config 3): contig bases/s through the two-strand window probe.
5. Signature build at scale: a timed 50M-occurrence streaming build.
6. Mesh scaling: subprocess harness on a virtual 8-device CPU mesh at
   data = 1, 2, 4, 8 (collective/sharding overhead; cpu-virtual numbers).

Prints ONE json line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": R, ...}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

# persistent XLA compilation cache: compiles over the axon tunnel cost
# ~25-30 s per big kernel (measured r5), and the projection/apply jits
# contain many; cached binaries make warm-up across bench runs ~free
def _enable_compile_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


_enable_compile_cache()

K = 8
N_KEYS = 1_000_000
N_ROLES = 2000
N_PROTEINS = 8192
PROT_LEN = 300
MIN_HITS = 5
N_BATCH = 32          # distinct batches chained per timing call: the
                      # per-call tunnel sync (~24 ms measured r5) is
                      # amortized across the chain, so longer chains
                      # measure steady-state throughput more honestly
AA = "ACDEFGHIKLMNPQRSTVWY"

BIG_KEYS = 10_000_000
BIG_QUERIES = 4_000_000
BIG_BATCH = 4

# HBM peak bytes/s by device kind substring (public spec sheets)
HBM_PEAK = [("v5 lite", 819e9), ("v5e", 819e9), ("v5p", 2765e9),
            ("v4", 1228e9), ("v6", 1640e9)]


REPS = 5              # timed repetitions per device section (medians)


def _spread(times):
    """Per-section repetition record: median is the quoted number."""
    import statistics

    return dict(median=statistics.median(times), min=min(times),
                max=max(times), reps=len(times))


def _chain_time(step_fn, stacked_inputs, n_batch, consts=(), reps=REPS):
    """Time n_batch DISTINCT batches inside one jit with a dependence
    chain, ``reps`` times; returns the per-batch seconds spread dict
    (host-synced by pulling the carry).  The quoted value is the MEDIAN
    over reps — single measurements on a tunneled chip scatter by tens
    of percent (r4 VERDICT weak #4).

    ``consts``: device arrays used by every batch (tables etc.) — passed
    as jit ARGUMENTS, never closed over: closure constants are inlined
    into the HLO and a multi-MB table blows the compile payload."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(consts_, *stacked):
        def it(c, xs):
            out = step_fn(*consts_, *xs)
            folded = sum(jnp.sum(o.astype(jnp.int32))
                         if o.dtype != jnp.float32 else
                         jnp.sum(o).astype(jnp.int32) for o in out)
            return c + folded, None

        c, _ = jax.lax.scan(it, jnp.int32(0), stacked)
        return c

    int(run(consts, *stacked_inputs))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        int(run(consts, *stacked_inputs))
        times.append((time.perf_counter() - t0) / n_batch)
    return _spread(times)


def make_proteins(rng, protos, n, which):
    proteins = rng.integers(0, 20, size=(n, PROT_LEN)).astype(np.uint8)
    proteins[:, 100:220] = protos[which]
    return proteins


def make_workload(rng: np.random.Generator):
    """Synthetic proteins with planted role segments + a kmer→role table."""
    from kmers_anno_tpu.engine.signature import pack_kmers_np

    protos = rng.integers(0, 20, size=(N_ROLES, 120)).astype(np.uint8)
    lo_all, hi_all, role_all = [], [], []
    for r in range(N_ROLES):
        lo, hi = pack_kmers_np(protos[r], K)
        lo_all.append(lo)
        hi_all.append(hi)
        role_all.append(np.full(len(lo), r, np.int32))
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
    _, idx = np.unique(np.stack([hi, lo], 1), axis=0, return_index=True)
    return protos, lo[np.sort(idx)], hi[np.sort(idx)], role[np.sort(idx)]


def _flat_stream(proteins):
    n, plen = proteins.shape
    codes = proteins.reshape(-1)
    seg_ids = np.repeat(np.arange(n, dtype=np.int32), plen)
    valid = np.ones(n * plen, bool)
    valid[np.arange(K - 1)[None, :] + (np.arange(1, n + 1) * plen
                                       - K + 1)[:, None]] = False
    return codes, seg_ids, valid


def bench_device(rng, protos, key_lo, key_hi, roles):
    """The r4 row-layout fused step (engine.apply_engine.apply_rows):
    pack → single-gather wide-bucket probe → row-reduce vote."""
    import jax
    import jax.numpy as jnp
    from kmers_anno_tpu.engine.apply_engine import (apply_rows,
                                                    apply_rows_weighted)
    from kmers_anno_tpu.ops.encode import PROT_PAD
    from kmers_anno_tpu.ops.hashtable import build_table
    from kmers_anno_tpu.ops.widetable import build_wide_table

    width = 320  # PROT_LEN=300 bucketed (engine._bucket_width)
    batches = [make_proteins(rng, protos, N_PROTEINS,
                             rng.integers(0, N_ROLES, size=N_PROTEINS))
               for _ in range(N_BATCH)]
    codes2d = np.full((N_BATCH, N_PROTEINS, width), PROT_PAD, np.uint8)
    codes2d[:, :, :PROT_LEN] = np.stack(batches)
    valid2d = np.zeros((N_PROTEINS, width), bool)
    valid2d[:, : PROT_LEN - K + 1] = True
    d_codes = jnp.asarray(codes2d)
    d_valid = jnp.asarray(valid2d)

    wtab, salt, max_probes = build_wide_table(key_lo, key_hi,
                                              roles.astype(np.uint32))
    d_wtab = jnp.asarray(wtab)
    d_salt = jnp.uint32(salt)

    def step(table1, salt1, valid1, codes1):
        return apply_rows(table1, salt1, codes1, valid1,
                          jnp.int32(MIN_HITS), k=K, max_probes=max_probes)

    sp = _chain_time(step, (d_codes,), N_BATCH,
                     consts=(d_wtab, d_salt, d_valid))
    dt = sp["median"]

    # called-count check on one batch (drives correctness + C++ parity)
    role_out, _ = apply_rows(d_wtab, d_salt, d_codes[0], d_valid,
                             jnp.int32(MIN_HITS), k=K,
                             max_probes=max_probes)
    called = int((np.asarray(role_out) >= 0).sum())

    # weighted best-tally vote over the same rows (config 2 shape)
    wbits = np.uint32(np.float16(1.0).view(np.uint16)) << np.uint32(16)
    wvals = wbits | roles.astype(np.uint32)
    wwtab, wsalt, wmax_probes = build_wide_table(key_lo, key_hi, wvals)
    d_wwtab = jnp.asarray(wwtab)
    d_wsalt = jnp.uint32(wsalt)

    def wstep(table1, salt1, valid1, codes1):
        return apply_rows_weighted(table1, salt1, codes1, valid1,
                                   jnp.float32(MIN_HITS), k=K,
                                   max_probes=wmax_probes)

    wdt = _chain_time(wstep, (d_codes,), N_BATCH,
                      consts=(d_wwtab, d_wsalt, d_valid))["median"]

    # the C++ single-core baseline probes the classic 8-slot layout
    # (the compiled stand-in for Java's HashMap walk)
    table8, max_probes8 = build_table(key_lo, key_hi,
                                      roles.astype(np.uint32))

    lookups = N_PROTEINS * (PROT_LEN - K + 1)
    return dict(seconds=dt, seconds_spread=sp,
                proteins_per_s=N_PROTEINS / dt,
                lookups_per_s=lookups / dt,
                padded_lookups=int(N_PROTEINS * width),
                weighted_proteins_per_s=N_PROTEINS / wdt, called=called,
                table=table8, max_probes=max_probes8, proteins=batches[0],
                wide_table_mb=round(wtab.nbytes / 1e6, 1),
                wide_max_probes=max_probes,
                platform=jax.devices()[0].platform,
                device_kind=jax.devices()[0].device_kind)


def bench_cpp_baseline(proteins, table, max_probes):
    """Single-core compiled loop over the same table (stand-in for
    single-core Java — see kan_apply_baseline in native/kan_host.cpp)."""
    from kmers_anno_tpu import native

    roles = native.apply_baseline(proteins, table, max_probes, K, MIN_HITS)
    if roles is None:
        return None
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        roles = native.apply_baseline(proteins, table, max_probes, K,
                                      MIN_HITS)
        times.append(time.perf_counter() - t0)
    dt = _spread(times)["median"]
    return dict(proteins_per_s=len(proteins) / dt,
                seconds_spread=_spread(times),
                called=int((roles >= 0).sum()))


def bench_java_baseline(proteins, key_lo, key_hi, roles):
    """Single-core string-keyed hash-map walk (kan_java_*): reproduces the
    reference's ACTUAL Java dataflow — string kmer keys, per-lookup
    substring + character hash (ApplyKmerProcessor.java:101-110, 122-145)
    — where bench_cpp_baseline's packed-integer loop is a strict floor."""
    from kmers_anno_tpu import native
    from kmers_anno_tpu.engine.signature import unpack_kmer_np
    from kmers_anno_tpu.ops.encode import decode_protein

    if not native.available():
        return None
    texts = [decode_protein(row)
             for row in unpack_kmer_np(key_lo, key_hi, K)]
    jb = native.JavaDataflowBaseline(texts, roles.astype(np.int32), K)
    prots = [decode_protein(p) for p in proteins]
    jb.apply(prots[:256], K, MIN_HITS)   # warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jb.apply(prots, K, MIN_HITS)
        times.append(time.perf_counter() - t0)
    dt = _spread(times)["median"]
    jb.close()
    return dict(proteins_per_s=len(prots) / dt,
                seconds_spread=_spread(times),
                called=int((out >= 0).sum()))


def bench_python_baseline(proteins, key_lo, key_hi, roles, sample=256):
    """Single-core dict loop (context only; Python is far slower than the
    Java the reference actually runs)."""
    from kmers_anno_tpu.engine.signature import unpack_kmer_np
    from kmers_anno_tpu.ops.encode import decode_protein

    texts = [decode_protein(row)
             for row in unpack_kmer_np(key_lo, key_hi, K)]
    db = dict(zip(texts, (int(r) for r in roles)))
    # decode with the SAME code->char map as the db texts (an r4 fix: the
    # r1-r3 bench decoded via the 20-letter AA alphabet, so the dict loop
    # never hit and timed a miss-only walk)
    prots = [decode_protein(p) for p in proteins[:sample]]
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
    """10M-entry HBM-resident table: plain gather walk vs sliced probe."""
    import jax.numpy as jnp
    from kmers_anno_tpu.ops.hashtable import build_table, probe_table
    from kmers_anno_tpu.ops.sliced_probe import (probe_table_sliced,
                                                 windowed_table)

    combined = np.unique(rng.integers(0, 1 << 59, BIG_KEYS + 200_000,
                                      dtype=np.uint64))[:BIG_KEYS]
    key_lo = (combined & np.uint64(0x3FFFFFFF)).astype(np.uint32)
    key_hi = (combined >> np.uint64(30)).astype(np.uint32)
    vals = rng.integers(0, N_ROLES, len(key_lo), dtype=np.int64)
    table, max_probes = build_table(key_lo, key_hi, vals.astype(np.uint32))
    qs = [rng.integers(0, len(key_lo), BIG_QUERIES) for _ in range(BIG_BATCH)]
    d_qlo = jnp.asarray(np.stack([key_lo[q] for q in qs]))
    d_qhi = jnp.asarray(np.stack([key_hi[q] for q in qs]))
    d_valid = jnp.ones(BIG_QUERIES, bool)
    d_table = jnp.asarray(table)
    d_wt = jnp.asarray(windowed_table(table, max_probes))

    def plain(table1, valid1, lo1, hi1):
        return (probe_table(table1, lo1, hi1, valid1, max_probes),)

    def sliced(table1, valid1, lo1, hi1):
        return (probe_table_sliced(table1, lo1, hi1, valid1, max_probes),)

    d_seg = jnp.asarray(np.arange(BIG_QUERIES, dtype=np.int32) >> 6)

    def sliced_pay(table1, valid1, seg1, lo1, hi1):
        # payload mode: riders replace the restore sort (the consumer
        # shape of the big-table apply path — order-free segment votes)
        v, p = probe_table_sliced(table1, lo1, hi1, valid1, max_probes,
                                  payload=seg1)
        return (v, p)

    dt_plain = _chain_time(plain, (d_qlo, d_qhi), BIG_BATCH,
                           consts=(d_table, d_valid))["median"]
    sp_sliced = _chain_time(sliced, (d_qlo, d_qhi), BIG_BATCH,
                            consts=(d_wt, d_valid))
    dt_sliced = sp_sliced["median"]
    dt_pay = _chain_time(sliced_pay, (d_qlo, d_qhi), BIG_BATCH,
                         consts=(d_wt, d_valid, d_seg))["median"]

    peak = next((v for s, v in HBM_PEAK if s in device_kind.lower()), None)
    lps = BIG_QUERIES / dt_sliced
    bytes_per_s = lps * 96 * max_probes  # what random access would move
    return dict(
        table_entries=len(key_lo), table_bytes=int(table.nbytes),
        max_probes=max_probes, seconds_spread=sp_sliced,
        lookups_per_s=round(lps, 0),
        payload_mode_lookups_per_s=round(BIG_QUERIES / dt_pay, 0),
        plain_lookups_per_s=round(BIG_QUERIES / dt_plain, 0),
        sliced_speedup=round(dt_plain / dt_sliced, 2),
        gather_bytes_per_s=round(bytes_per_s, 0),
        hbm_peak_bytes_per_s=peak,
        hbm_fraction=round(bytes_per_s / peak, 4) if peak else None)


def bench_dna(rng):
    """DNA mode (config 3): contig bases/s through the window probe."""
    import jax.numpy as jnp
    from kmers_anno_tpu.engine.dna_apply import probe_dna_flat
    from kmers_anno_tpu.ops.dna_kmers import pack_dna_np
    from kmers_anno_tpu.ops.hashtable import build_table

    k = 15
    n_keys = 2_000_000
    seq = rng.integers(0, 4, size=n_keys + k - 1).astype(np.uint8)
    lo, hi = pack_dna_np(seq, k)
    key = (hi.astype(np.uint64) << np.uint64(32)) | lo
    _, idx = np.unique(key, return_index=True)
    vals = rng.integers(0, N_ROLES, len(idx)).astype(np.uint32)
    table, max_probes = build_table(lo[idx], hi[idx], vals)
    d_table = jnp.asarray(table)

    bases = 4_000_000
    contigs = [rng.integers(0, 4, size=bases).astype(np.uint8)
               for _ in range(BIG_BATCH)]
    d_codes = jnp.asarray(np.stack(contigs))
    d_valid = jnp.ones(bases, bool)

    def step(table1, valid1, codes1):
        return (probe_dna_flat(table1, codes1, valid1, k=k,
                               max_probes=max_probes),)

    sp = _chain_time(step, (d_codes,), BIG_BATCH,
                     consts=(d_table, d_valid))
    dt = sp["median"]

    # single-core compiled baseline over the same contigs + table
    from kmers_anno_tpu import native

    cpp = None
    if native.available():
        native.dna_baseline(contigs[0], table, max_probes, k)  # warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            hits = native.dna_baseline(contigs[0], table, max_probes, k)
            times.append(time.perf_counter() - t0)
        cpp = dict(contig_bases_per_s=round(bases / _spread(times)["median"], 0),
                   hits=hits)
    return dict(k=k, table_entries=len(idx), seconds_spread=sp,
                contig_bases_per_s=round(bases / dt, 0),
                compiled_core_bases_per_s=(cpp["contig_bases_per_s"]
                                           if cpp else None),
                vs_compiled=(round(bases / dt
                                   / cpp["contig_bases_per_s"], 2)
                             if cpp else None))


def bench_build(rng):
    """Timed 50M-occurrence streaming signature build (SURVEY §7 hard
    part 5; BuildKmerProcessor.java:137-223 at scale).

    Times the FULL build pipeline on real protein text: flat-stream
    encode (C++ loader) → vectorized window pack → bounded-memory
    streaming sort group-by, i.e. the same stages ``build`` runs per
    genome (engine.signature._flat_protein_keys + StreamingTableBuilder).
    """
    from kmers_anno_tpu.engine.signature import (StreamingTableBuilder,
                                                 _flat_protein_keys)

    prot_len = 400
    n_prots = 125_000               # ≥ 50M kmer windows of text
    n_occ = n_prots * (prot_len - K + 1)
    # synthetic proteome as one byte blob sliced into strings (untimed)
    aa = np.frombuffer(AA.encode(), np.uint8)
    blob = aa[rng.integers(0, len(aa), n_prots * prot_len)].tobytes()
    prots = [blob[i * prot_len:(i + 1) * prot_len].decode()
             for i in range(n_prots)]
    prot_role = rng.integers(0, N_ROLES, n_prots).astype(np.int32)

    chunk = 10_000                  # proteins per streamed genome batch
    t0 = time.perf_counter()
    b = StreamingTableBuilder()
    for i in range(0, n_prots, chunk):
        batch = prots[i: i + chunk]
        lo, hi, seg = _flat_protein_keys(batch, K)
        b.add_candidates(lo, hi, prot_role[i: i + chunk][seg])
    klo, khi, _ = _flat_protein_keys(prots[:chunk], K)  # kill pass sample
    b.add_kills(klo, khi)
    lo, hi, role, stats = b.finish()
    t_build = time.perf_counter() - t0

    # binary table save + load round-trip at scale
    from kmers_anno_tpu.engine.signature import SignatureTable
    import tempfile
    table = SignatureTable(k=K, key_lo=lo, key_hi=hi, role_idx=role,
                           role_ids=[f"Role{r}" for r in range(N_ROLES)])
    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        t1 = time.perf_counter()
        table.save_binary(f.name)
        t_save = time.perf_counter() - t1
        t1 = time.perf_counter()
        SignatureTable.load(f.name)
        t_load = time.perf_counter() - t1
    return dict(occurrences=n_occ, unique=stats["unique"],
                survivors=len(lo), build_s=round(t_build, 1),
                occurrences_per_s=round(n_occ / t_build, 0),
                save_s=round(t_save, 2), load_s=round(t_load, 2),
                pipeline="encode+pack+stream-groupby (C++ loader)")


def _make_projection_workload(rng, n_genes, n_close, lo_cod=60,
                              hi_cod=500):
    """Synthetic genome with planted clean ORFs + close genomes carrying
    the source proteins (untimed generation)."""
    from kmers_anno_tpu.genome.dna import (DnaTranslator,
                                           reverse_complement)
    from kmers_anno_tpu.genome.gto import Genome

    xl = DnaTranslator(11)
    parts = ["".join("acgt"[c] for c in rng.integers(0, 4, 50))]
    genes = []
    for i in range(n_genes):
        n_cod = int(rng.integers(lo_cod, hi_cod))
        body = "".join("tcag"[c] for c in rng.integers(0, 4, 3 * n_cod))
        # force a clean ORF: atg + stop-free frame + taa
        codons = [body[j: j + 3] for j in range(0, len(body), 3)]
        codons = [c for c in codons if c not in ("taa", "tag", "tga")]
        gene = "atg" + "".join(codons) + "taa"
        strand = "+" if i % 2 == 0 else "-"
        parts.append(gene if strand == "+" else reverse_complement(gene))
        parts.append("".join("acgt"[c] for c in rng.integers(0, 4, 30)))
        genes.append(gene)
    dna = "".join(parts)

    prots = [xl.peg_translate(g, 1, len(g) - 3) for g in genes]

    def old_genome(gid):
        feats = []
        for i, gene in enumerate(genes):
            feats.append({
                "id": f"fig|{gid}.peg.{i + 1}", "type": "CDS",
                "function": f"Projected role number {i + 1}",
                "location": [["oc", str(1000 * i + 1), "+", len(gene)]],
                "protein_translation": prots[i],
                "annotations": [], "aliases": []})
        return Genome({
            "id": gid, "scientific_name": "Oldus", "genetic_code": 11,
            "domain": "Bacteria", "features": feats,
            "contigs": [{"id": "oc", "dna": "acgt" * 50}],
            "close_genomes": [], "subsystems": []})

    olds = {f"30{i}.1": old_genome(f"30{i}.1") for i in range(n_close)}

    def new_genome():
        return Genome({
            "id": "400.1", "scientific_name": "Novus",
            "genetic_code": 11, "domain": "Bacteria", "features": [],
            "contigs": [{"id": "nc", "dna": dna, "genetic_code": 11}],
            "close_genomes": [
                {"genome": gid, "genome_name": "Oldus",
                 "closeness_measure": 99.0} for gid in olds],
            "subsystems": []})

    return dna, olds, new_genome


def _cpp_projection_baseline(new_genome, olds, k, cls=None):
    """Single-core hot-loop time: contig map build + per-close-genome
    singleton/probe/window-scan — the compiled stand-in for single-core
    Java annotateGenome (KmerProcessor.java:166-287).  ``cls`` selects
    the packed-key floor (ProjectionBaseline, default) or the
    string-keyed Java-dataflow model (JavaProjectionBaseline).
    Returns (seconds, total pairs) or None."""
    from kmers_anno_tpu import native
    from kmers_anno_tpu.ops.encode import encode_dna
    from kmers_anno_tpu.ops.translate import codon_lut

    if not native.available():
        return None
    if cls is None:
        cls = native.ProjectionBaseline
    g = new_genome()
    prot_sets = [[f.protein_translation for f in og.pegs
                  if f.protein_translation] for og in olds.values()]
    codes = [encode_dna(c.sequence) for c in g.contigs]
    lut = np.asarray(codon_lut(g.genetic_code), np.uint8)
    times = []
    for _ in range(3):                  # the reference rebuilds per
        t0 = time.perf_counter()        # genome; each rep does too
        pb = cls(codes, lut, k)
        pairs = 0
        for prots in prot_sets:
            p, _, _ = pb.match(prots, 0.50, 1.5, 0.8)
            pairs += p
        pb.close()
        times.append(time.perf_counter() - t0)
    return _spread(times)["median"], pairs


def bench_projection(rng):
    """ORF-projection (`kmers`) seconds/genome, warm (the metric
    BatchKmerProcessor.java:76 logs), at two scales:

    * small: ~0.6 Mb contig, 700 planted genes, 3 close genomes
    * realistic: ~3.7 Mb contig, 3500 genes, 10 close genomes
      (KmerProcessor.java:144 nGenomes=10), with the single-core
      compiled hot-loop baseline (kan_proj_*) for vs_compiled
    """
    from kmers_anno_tpu.engine.projection import ProjectionAnnotator

    from kmers_anno_tpu import native

    out = {}
    dna, olds, new_genome = _make_projection_workload(rng, 700, 3)
    annot = ProjectionAnnotator(k=K)
    stats = annot.annotate_genome(new_genome(), olds.get)  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        stats = annot.annotate_genome(new_genome(), olds.get)
        times.append(time.perf_counter() - t0)
    out.update(contig_bases=len(dna), genes_planted=700,
               close_genomes=len(olds), pegs_called=stats["pegs"],
               seconds_per_genome=round(_spread(times)["median"], 3),
               seconds_spread=_spread(times))

    dna, olds, new_genome = _make_projection_workload(rng, 3500, 10)
    annot = ProjectionAnnotator(k=K)
    stats = annot.annotate_genome(new_genome(), olds.get)  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        stats = annot.annotate_genome(new_genome(), olds.get)
        times.append(time.perf_counter() - t0)
    dt = _spread(times)["median"]
    cpp = _cpp_projection_baseline(new_genome, olds, K)
    jv = _cpp_projection_baseline(
        new_genome, olds, K,
        cls=native.JavaProjectionBaseline if native.available() else None)
    out["realistic"] = dict(
        contig_bases=len(dna), genes_planted=3500, close_genomes=len(olds),
        pegs_called=stats["pegs"], seconds_per_genome=round(dt, 3),
        seconds_spread=_spread(times),
        compiled_core_seconds=round(cpp[0], 3) if cpp else None,
        vs_compiled=round(cpp[0] / dt, 2) if cpp else None,
        java_dataflow_core_seconds=round(jv[0], 3) if jv else None,
        vs_java_dataflow=round(jv[0] / dt, 2) if jv else None,
        baseline_pairs=cpp[1] if cpp else None,
        java_pairs=jv[1] if jv else None,
        note=("engine time is warm steady state (close-genome tables "
              "cached on device, as in a batch run); both single-core "
              "baselines cover hot loops 1-4 only (contig map, "
              "singletons, probe, window scan) and rebuild per genome "
              "like the reference — kan_proj is the packed-key floor, "
              "kan_jproj the string-keyed Java-dataflow model"))
    return out


def bench_hashanno(rng):
    """hashAnno engine throughput (config: 4 genomes × 1500 proteins,
    4096 prototypes) vs the single-core compiled GenomeProteinKmers loop
    (kan_hash_*; HashAnnotationProcessor.java:233-263 semantics).

    The device path scores ALL genomes through one combined index
    (annotate_genomes_batched's design); the baseline builds one hash
    per genome and walks prototypes sequentially, like the reference's
    per-genome threads do on one core."""
    from kmers_anno_tpu import native
    from kmers_anno_tpu.engine.hashanno import (GenomeProteinKmers,
                                                Prototype, PrototypeSet)

    n_genomes, n_prot, n_proto = 4, 1500, 32768
    plen = 250
    min_score = 0.0125
    aa = np.frombuffer(AA.encode(), np.uint8)
    pool = ["".join(chr(c) for c in aa[rng.integers(0, len(aa), plen)])
            for _ in range(n_prot)]
    genomes = []
    for g in range(n_genomes):
        prots = []
        for p in pool:
            b = list(p)
            for _ in range(3):          # per-genome point mutations
                b[int(rng.integers(0, len(b)))] = AA[
                    int(rng.integers(0, len(AA)))]
            prots.append("".join(b))
        genomes.append(prots)
    protos = []
    for i in range(n_proto):
        src = pool[int(rng.integers(0, len(pool)))]
        b = list(src)
        for _ in range(int(rng.integers(0, 8))):
            b[int(rng.integers(0, len(b)))] = AA[
                int(rng.integers(0, len(AA)))]
        protos.append(Prototype("".join(b), f"Role {i}"))
    pset = PrototypeSet(protos, K)
    pset.chunks(4096)                   # pack once (cached, as in a run)

    def run_device():
        # ONE combined index for the whole genome batch — the CLI's
        # annotate_genomes_batched design (a protein's best proposal
        # depends only on its sequence)
        gk = GenomeProteinKmers(K, min_score)
        for gi, prots in enumerate(genomes):
            for i, p in enumerate(prots):
                gk.add_protein(f"fig|g{gi}.peg.{i}", p,
                               "hypothetical protein")
        gk.process_proposals(pset)
        return int((gk.best_sim > 0).sum()), gk

    run_device()                        # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        called_dev, gk = run_device()
        times.append(time.perf_counter() - t0)
    sp = _spread(times)
    dt = sp["median"]

    cpp = None
    if native.available():
        from kmers_anno_tpu.genome.gto import protein_md5

        texts = [p.protein for p in protos]
        ctimes = []
        for _ in range(3):
            t0 = time.perf_counter()
            called_cpp = 0
            sims_cpp = []
            for prots in genomes:           # per-genome, like the
                hb = native.HashAnnoBaseline(  # reference's thread
                    prots, K, min_score)    # fan-out run on one core
                hb.score(texts)
                sim, _ = hb.best()
                called_cpp += int((sim > 0).sum())
                sims_cpp.append(sim)
                hb.close()
            ctimes.append(time.perf_counter() - t0)
        cpp = dict(seconds=_spread(ctimes)["median"],
                   called=called_cpp)
        # engine parity: identical best similarity per protein sequence
        for prots, sim in zip(genomes, sims_cpp):
            dev = np.array([gk.best_sim[gk._md5_of[protein_md5(p)]]
                            for p in prots])
            assert np.array_equal(dev, sim)
    pg = n_proto * n_genomes
    return dict(
        genomes=n_genomes, proteins_per_genome=n_prot,
        prototypes=n_proto, seconds=round(dt, 3), seconds_spread=sp,
        proto_genome_pairs_per_s=round(pg / dt, 0),
        called_device=called_dev,
        compiled_core_seconds=round(cpp["seconds"], 3) if cpp else None,
        called_compiled=cpp["called"] if cpp else None,
        vs_compiled=round(cpp["seconds"] / dt, 2) if cpp else None)


def bench_mesh_scaling():
    """Replicated-table mesh apply on a virtual 8-device CPU mesh at
    data = 1, 2, 4, 8 (sharding/collective overhead harness; these are
    cpu-virtual numbers, not chip throughput)."""
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "benchmarks", "mesh_scaling.py")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # 8 device threads share 2 physical cores at config5 scale: the
    # default 40 s collective-rendezvous watchdog kills the 100M-entry
    # routed step mid-run (scheduling skew, not a hang)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8"
                        + " --xla_cpu_collective_call_terminate_timeout_"
                          "seconds=1200")
    try:
        out = subprocess.run([sys.executable, script], env=env,
                             capture_output=True, text=True, timeout=1500)
        if out.returncode != 0:
            return {"error": out.stderr.strip()[-400:]}
        return json.loads(out.stdout.strip().splitlines()[-1])
    except Exception as e:  # never kill the bench over the harness
        return {"error": str(e)[:400]}


def main():
    import threading

    # the mesh harness is a CPU-only subprocess: run it concurrently
    # with the TPU sections (it does not touch the chip)
    mesh_out = {}
    mesh_thread = threading.Thread(
        target=lambda: mesh_out.update(r=bench_mesh_scaling()),
        daemon=True)  # a wedged harness must not block process exit
    mesh_thread.start()

    rng = np.random.default_rng(seed=7)
    protos, key_lo, key_hi, roles = make_workload(rng)
    # device-only sections overlap the CPU-only mesh subprocess; every
    # SINGLE-CORE baseline runs after the join so the mesh harness's
    # core contention cannot inflate the vs_compiled multiples
    dev = bench_device(rng, protos, key_lo, key_hi, roles)
    big = bench_big_table(rng, dev["device_kind"])
    mesh_thread.join(timeout=1600)
    mesh = mesh_out.get("r", {"error": "mesh harness did not finish"})
    build = bench_build(rng)
    cpp = bench_cpp_baseline(dev["proteins"], dev["table"],
                             dev["max_probes"])
    jv = bench_java_baseline(dev["proteins"], key_lo, key_hi, roles)
    py = bench_python_baseline(dev["proteins"], key_lo, key_hi, roles)
    dna = bench_dna(rng)
    hashanno = bench_hashanno(rng)
    proj = bench_projection(rng)

    vs_cpp = (dev["proteins_per_s"] / cpp["proteins_per_s"]) if cpp else None
    vs_py = dev["proteins_per_s"] / py["proteins_per_s"]
    dev.pop("proteins", None)
    dev.pop("table", None)
    full = {
        "metric": "protein sequences/s/chip annotated (1M-entry table)",
        "value": round(dev["proteins_per_s"], 1),
        "unit": "proteins/s",
        # the honest multiple: vs a compiled single-core loop over the
        # same table (stand-in for single-core Java, BASELINE.md:24-27);
        # null when the native baseline is unavailable (ADVICE r2)
        "vs_baseline": round(vs_cpp, 2) if vs_cpp else None,
        "vs_compiled_core": round(vs_cpp, 2) if vs_cpp else None,
        "vs_python_core": round(vs_py, 2),
        "timing_note": ("r5: every quoted number is the MEDIAN over "
                        "repeated device-synced chained-batch timings "
                        "(seconds_spread records min/max); r1/r2 timed "
                        "async dispatch and are NOT comparable"),
        "weighted_proteins_per_s": round(dev["weighted_proteins_per_s"], 1),
        "kmer_lookups_per_s": round(dev["lookups_per_s"], 0),
        "compiled_core_proteins_per_s":
            round(cpp["proteins_per_s"], 1) if cpp else None,
        # the Java-dataflow stand-in (string-keyed map, substring+hash per
        # lookup): closest model of what the reference actually runs
        "vs_java_dataflow":
            round(dev["proteins_per_s"] / jv["proteins_per_s"], 2)
            if jv else None,
        "java_dataflow_core_proteins_per_s":
            round(jv["proteins_per_s"], 1) if jv else None,
        "called_java_dataflow": jv["called"] if jv else None,
        "python_core_proteins_per_s": round(py["proteins_per_s"], 1),
        "platform": dev["platform"],
        "device_kind": dev["device_kind"],
        "n_table_keys": int(len(key_lo)),
        "called_device": dev["called"],
        "called_compiled": cpp["called"] if cpp else None,
        "apply_spread": dev.get("seconds_spread"),
        "big_table": big,
        "dna": dna,
        "build": build,
        "hashanno": hashanno,
        "projection": proj,
        "mesh_scaling_cpu_virtual": mesh,
    }
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_full.json")
    with open(out_path, "w") as fh:
        json.dump(full, fh, indent=1)
    rp = proj.get("realistic", {})
    # ONE compact line so the driver's record parses (r4's line was so
    # long only a tail survived); the full record is bench_full.json
    print(json.dumps({
        "metric": full["metric"],
        "value": full["value"],
        "unit": "proteins/s",
        "vs_baseline": full["vs_baseline"],
        "vs_compiled_core": full["vs_compiled_core"],
        "vs_java_dataflow": full["vs_java_dataflow"],
        "calls_agree": (dev["called"] == (cpp or {}).get("called")
                        == (jv or {}).get("called")),
        "kmer_lookups_per_s": full["kmer_lookups_per_s"],
        "projection_s_per_genome": rp.get("seconds_per_genome"),
        "projection_vs_compiled": rp.get("vs_compiled"),
        "projection_vs_java_dataflow": rp.get("vs_java_dataflow"),
        "hashanno_vs_compiled": hashanno.get("vs_compiled"),
        "big_table_lookups_per_s": big.get("lookups_per_s"),
        "big_table_hbm_fraction": big.get("hbm_fraction"),
        "dna_vs_compiled": dna.get("vs_compiled"),
        "build_occurrences_per_s": build.get("occurrences_per_s"),
        "platform": full["platform"],
        "device_kind": full["device_kind"],
        "full_record": "bench_full.json",
    }))


if __name__ == "__main__":
    main()
