#!/usr/bin/env python
"""A/B the Armijo sweep width (newton_max_backtracks).

The parallel line-search sweep is the FLOP hog of the Newton body on
paper (2*B*T*K*L for T=12 candidates); measured round 2, the width
barely moves wall time (results_linesearch.json) — kept for
re-measurement on new hardware/toolchains.

Usage: linesearch_ab.py [K]  ->  benchmarks/results_linesearch.json
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
from bench_common import time_estep, warmed_state  # noqa: E402


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    V, N, n_words = 10_000, 4096, 300
    B = 128 if K > 150 else 256
    common = dict(pallas_cg=K > 150, pallas_block=32,
                  newton_pass1_iters=6, newton_straggler_frac=0.25)

    state, data, pc, design, make_cfg = warmed_state(
        K, V, N, n_words, B, common
    )
    results = {}
    for T in (12, 8, 6, 4):
        dps, bound = time_estep(state, data, make_cfg(newton_max_backtracks=T))
        results[f"T{T}"] = {"docs_per_sec": round(dps, 1), "bound": bound}
        print(f"T={T}: {dps:.0f} docs/s  bound={bound:.2f}", flush=True)
    with open(os.path.join(HERE, "results_linesearch.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
