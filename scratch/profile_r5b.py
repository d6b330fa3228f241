"""Fine-grained residual breakdown: device wait vs pulls vs host expand."""
import importlib.util
import sys
import time

import numpy as np

sys.argv = ["bench"]
spec = importlib.util.spec_from_file_location("benchmod",
                                              "/root/repo/bench.py")
B = importlib.util.module_from_spec(spec)
spec.loader.exec_module(B)


def main():
    rng = np.random.default_rng(seed=7)
    import kmers_anno_tpu.engine.projection as P

    dna, olds, new_genome = B._make_projection_workload(rng, 3500, 10)
    annot = P.ProjectionAnnotator(k=8)
    g = new_genome()
    # build index + tables once (warm)
    index = P.StreamWindowIndex.build(g, 8, strict=False)
    entries = [annot._close_table(og) for og in olds.values()]
    live = [e for e in entries if e[0] is not None]
    n_stream = index.d_lo.shape[0]
    max_single = max(e[3] for e in live)
    cap = min(P._bucket(2 * max_single + 4096, 1 << 14), n_stream)
    rcap = min(P._bucket(max(max_single // 8, 1), 1 << 14), cap)
    print(f"n_stream={n_stream} max_single={max_single} "
          f"cap={cap} rcap={rcap}", flush=True)
    tables = tuple(e[0] for e in live)
    meta = tuple((e[1], e[2]) for e in live)

    t0 = time.perf_counter()
    out = P._probe_rle_multi(tables, index.d_lo, index.d_hi,
                             index.d_valid, cap=cap, rcap=rcap, meta=meta)
    print(f"compile+run: {time.perf_counter()-t0:.1f}s", flush=True)

    for trial in range(3):
        t0 = time.perf_counter()
        starts_b, pegs_b, lens_b, n_runs_d, n_hits_d = P._probe_rle_multi(
            tables, index.d_lo, index.d_hi, index.d_valid,
            cap=cap, rcap=rcap, meta=meta)
        t_disp = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_hits_a = np.asarray(n_hits_d)
        n_runs_a = np.asarray(n_runs_d)
        t_sync = time.perf_counter() - t0
        t0 = time.perf_counter()
        starts_all = np.asarray(starts_b)
        pegs_all = np.asarray(pegs_b)
        lens_all = np.asarray(lens_b)
        t_pull = time.perf_counter() - t0
        t0 = time.perf_counter()
        tot = 0
        for j in range(len(live)):
            n_hits = int(n_hits_a[j])
            n_runs = int(n_runs_a[j])
            starts = starts_all[j, :n_runs].astype(np.int64)
            lens = lens_all[j, :n_runs].astype(np.int64)
            run_peg = pegs_all[j, :n_runs]
            base = np.repeat(np.cumsum(lens) - lens, lens)
            pos = np.repeat(starts, lens) + np.arange(n_hits) - base
            pair_peg = np.repeat(run_peg, lens).astype(np.int32)
            tot += n_hits
        t_expand = time.perf_counter() - t0
        print(f"trial{trial}: dispatch={t_disp*1e3:.0f}ms "
              f"sync(scalars)={t_sync*1e3:.0f}ms pull={t_pull*1e3:.0f}ms "
              f"expand={t_expand*1e3:.0f}ms total_hits={tot}", flush=True)
    print(f"runs={n_runs_a.tolist()}")
    print(f"hits={n_hits_a.tolist()}")


if __name__ == "__main__":
    main()
