#!/usr/bin/env python
"""A/B the E-step chunk size under the two-pass schedule.

Pre-two-pass, B=128-256 won at K=100 because a chunk's while_loop runs
to its worst doc (larger chunks couple more stragglers).  The two-pass
schedule removes that coupling from pass 1 (fixed iteration cap), so
larger chunks — fewer, bigger ops against the op-granularity limit the
roofline analysis exposed — may now win.

Usage: batch_ab.py [K]  ->  benchmarks/results_batch_K{K}.json
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
    B0 = 128 if K > 150 else 256
    common = dict(pallas_cg=K > 150, pallas_block=32,
                  newton_pass1_iters=6, newton_straggler_frac=0.25)

    state, data, pc, design, make_cfg = warmed_state(
        K, V, N, n_words, B0, common
    )
    # the pallas_cg kernel holds a (B, K-1, K-1) Hessian block pipeline
    # in VMEM: at K=200 batches above ~64 exceed the scoped-vmem limit
    # (clean compile error) — sweep smaller B there
    sweep = (32, 48, 64, 96, 128) if K > 150 else (64, 128, 256, 512, 1024)
    results = {}
    for B in sweep:
        try:
            dps, bound = time_estep(state, data, make_cfg(batch_size=B))
        except Exception as e:  # VMEM OOM etc.: record, keep sweeping
            results[f"B{B}"] = {"error": str(e).splitlines()[0][:200]}
            print(f"B={B}: failed ({type(e).__name__})", flush=True)
            continue
        results[f"B{B}"] = {"docs_per_sec": round(dps, 1), "bound": bound}
        print(f"B={B}: {dps:.0f} docs/s  bound={bound:.2f}", flush=True)
    with open(os.path.join(HERE, f"results_batch_K{K}.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
