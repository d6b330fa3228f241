"""Round-5 stage profile of the realistic (2.9Mb/10-close) projection."""
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

    t = {}

    def timed(name, fn):
        def wrap(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            t[name] = t.get(name, 0.0) + time.perf_counter() - t0
            return out
        return wrap

    t_gen0 = time.perf_counter()
    dna, olds, new_genome = B._make_projection_workload(rng, 3500, 10)
    print(f"generation: {time.perf_counter()-t_gen0:.1f}s, "
          f"{len(dna)} bases", flush=True)

    P.StreamWindowIndex.build = classmethod(
        timed("index_build", P.StreamWindowIndex.build.__func__))
    from kmers_anno_tpu.ops import pallas_contig as PC
    PC.scan_stream_device = timed("  scan_stream", PC.scan_stream_device)
    P.peg_singleton_kmers = timed("singletons", P.peg_singleton_kmers)

    orig_multi = P._probe_rle_multi

    def probe_wrap(*a, **k):
        t0 = time.perf_counter()
        out = orig_multi(*a, **k)
        t["probe_dispatch"] = t.get("probe_dispatch", 0.) + (
            time.perf_counter() - t0)
        return out
    P._probe_rle_multi = probe_wrap

    # split _project_all_stream internals: time the np.asarray pulls
    orig_project = P.ProjectionAnnotator._project_all_stream

    P.StreamWindowIndex.locate = timed("locate",
                                       P.StreamWindowIndex.locate)
    P.ProjectionAnnotator._scan_and_propose = timed(
        "scan_propose", P.ProjectionAnnotator._scan_and_propose)
    from kmers_anno_tpu.engine import proposals as PR
    PR.PegProposalList.propose_batch = timed(
        "  propose_batch", PR.PegProposalList.propose_batch)
    P.ProjectionAnnotator._project_all_stream = timed(
        "project_all(total)", orig_project)
    P.ProjectionAnnotator._make_feature = staticmethod(
        timed("make_features", P.ProjectionAnnotator._make_feature))

    annot = P.ProjectionAnnotator(k=8)
    t_w0 = time.perf_counter()
    annot.annotate_genome(new_genome(), olds.get)   # warm
    print(f"warm run: {time.perf_counter()-t_w0:.1f}s", flush=True)
    t.clear()
    t0 = time.perf_counter()
    annot.annotate_genome(new_genome(), olds.get)
    total = time.perf_counter() - t0
    for k, v in t.items():
        print(f"{k:20s} {v*1000:9.1f} ms  {100*v/total:5.1f}%")
    print(f"{'TOTAL':20s} {total*1000:9.1f} ms")
    resid = (t["project_all(total)"] - t.get("probe_dispatch", 0)
             - t.get("locate", 0) - t.get("scan_propose", 0))
    print(f"{'  (expand+pull resid)':22s} {resid*1000:9.1f} ms")


if __name__ == "__main__":
    main()
