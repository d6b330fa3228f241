"""Run only bench_device + cpp baseline from bench.py (fast check)."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import bench

rng = np.random.default_rng(seed=7)
protos, key_lo, key_hi, roles = bench.make_workload(rng)
dev = bench.bench_device(rng, protos, key_lo, key_hi, roles)
cpp = bench.bench_cpp_baseline(dev["proteins"], dev["table"],
                               dev["max_probes"])
print({k: v for k, v in dev.items()
       if k not in ("table", "proteins")})
print("cpp:", cpp)
if cpp:
    print("vs_baseline:", round(dev["proteins_per_s"] / cpp["proteins_per_s"], 2))
