#!/usr/bin/env python
"""A/B the two-pass difficulty schedule (VERDICT r1 #6).

Baseline: single-pass while_loop per chunk.  Variants sweep
newton_pass1_iters / straggler budget; the schedule is per-doc
path-identical (tests/test_two_pass.py), so any speedup must come with
an identical bound — every variant measures on the SAME warmed state
so bounds are directly comparable.

Usage: twopass_ab.py [K]   ->  benchmarks/results_twopass_K{K}.json
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
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    V, N, n_words = 10_000, 4096, 300
    B = 128 if K > 150 else 256
    common = dict(pallas_cg=K > 150, pallas_block=32)

    state, data, pc, design, make_cfg = warmed_state(
        K, V, N, n_words, B, common
    )

    variants = {
        "base": {},
        "p1=4_frac.50": dict(newton_pass1_iters=4, newton_straggler_frac=0.50),
        "p1=6_frac.25": dict(newton_pass1_iters=6, newton_straggler_frac=0.25),
        "p1=6_frac.50": dict(newton_pass1_iters=6, newton_straggler_frac=0.50),
        "p1=8_frac.25": dict(newton_pass1_iters=8, newton_straggler_frac=0.25),
    }
    results = {}
    for name, kw in variants.items():
        dps, bound = time_estep(state, data, make_cfg(**kw))
        results[name] = {"docs_per_sec": round(dps, 1), "bound": bound}
        print(f"{name}: {dps:.0f} docs/s  bound={bound:.2f}", flush=True)
    with open(os.path.join(HERE, f"results_twopass_K{K}.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
