#!/usr/bin/env python
"""A/B the finalize factorization: nu_method chol vs ns vs blocked.

The (B, K-1, K-1) Cholesky + triangular inverse is the finalize hot
spot (44 + 10 of 173 ms at K=100 — results_ablate_K100_V10000.json):
XLA lowers both to P-step sequential loops.  "blocked" rebuilds them
from straight-line batched einsums (ops/linalg.py::blocked_cholesky,
tri_lower_inverse) with identical math.

Usage: nu_ab.py [K]  ->  benchmarks/results_nu_K{K}.json
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
    for nm in ("chol", "ns", "blocked"):
        dps, bound = time_estep(state, data, make_cfg(nu_method=nm))
        results[nm] = {"docs_per_sec": round(dps, 1), "bound": bound}
        print(f"nu_method={nm}: {dps:.0f} docs/s  bound={bound:.2f}",
              flush=True)
    with open(os.path.join(HERE, f"results_nu_K{K}.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
