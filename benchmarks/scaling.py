#!/usr/bin/env python
"""K-sweep scaling benchmark: steady-state E-step docs/s per config.

Covers the BASELINE.json config families on one chip:
  K in {25, 50, 100, 200} at V=10k (the pod-scale K-sweep, single-chip
  per-K throughput), plus the K=100/V=50k "scaled synthetic" shape.
Writes benchmarks/results_scaling.json.
"""

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/strutopy_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

HERE = (os.path.dirname(os.path.abspath(__file__))
        if "__file__" in globals() and "<" not in str(__file__)
        else os.path.join(os.getcwd(), "benchmarks"))
sys.path.insert(0, HERE)
from bench_common import corpus, time_estep, warmed_state  # noqa: E402,F401

OUT = os.path.join(HERE, "results_scaling.json")


def measure(K, V, N=4096, n_words=300, batch=256):
    # large K: VMEM-resident-Hessian CG kernel (ops/pallas_stages.py,
    # +14% at K=200, bit-identical bound).  All K: two-pass difficulty
    # schedule (ops/estep.py::_two_pass_estep) — +33%/+24% at K=100/200
    # steady state with identical bounds (results_twopass_K{100,200}.json)
    cfg_kw = dict(pallas_cg=K > 150, pallas_block=32,
                  newton_pass1_iters=6, newton_straggler_frac=0.25)
    state, data, pc, design, make_cfg = warmed_state(
        K, V, N, n_words, batch, cfg_kw
    )
    dps, _bound = time_estep(state, data, make_cfg())
    return dps


def main():
    results = {}
    grid = [(25, 10_000), (50, 10_000), (100, 10_000), (200, 10_000), (100, 50_000)]
    if len(sys.argv) > 1:  # subset: e.g. "25,50"
        keep = {int(x) for x in sys.argv[1].split(",")}
        grid = [g for g in grid if g[0] in keep]
    for K, V in grid:
        # measured r2: at K=200 the (B, K, L) working set wants smaller
        # chunks (B=64 beats 256 by ~11%); K<=100 is fastest at 256
        dps = measure(K, V, batch=128 if K > 150 else 256)
        results[f"K{K}_V{V}"] = {"docs_per_sec": round(dps, 1)}
        print(f"K={K} V={V}: {dps:.0f} docs/s", flush=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
