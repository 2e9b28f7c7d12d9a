#!/usr/bin/env python
"""A/B the fused-finalize two-pass schedule (round 3).

_two_pass_fused_estep computes nu/bound/phi inside the same scan chunk
that already holds the gathered beta_doc, removing pass 3's full
(B, K, L) beta_doc re-gather — the third full HBM sweep — at the cost
of re-finalizing the straggler fraction.  Newton trajectories are
identical to the unfused schedule (tests/test_two_pass.py), so the A/B
must show the same bound to f32 summation-order tolerance; every
variant measures on the SAME warmed state.

Usage: fused_ab.py [K]   ->  benchmarks/results_fused_K{K}.json
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
    # the bench.py headline shape (K=100): N=8192, 300 tokens/doc
    V, N, n_words = 10_000, 8192, 300
    B = 128 if K > 150 else 256
    common = dict(pallas_cg=K > 150, pallas_block=32)

    state, data, pc, design, make_cfg = warmed_state(
        K, V, N, n_words, B, common
    )

    two_pass = dict(newton_pass1_iters=6, newton_straggler_frac=0.25)
    variants = {
        "single_pass": {},
        "two_pass": two_pass,
        "fused": dict(two_pass, two_pass_fused=True),
        "fused_frac.50": dict(
            newton_pass1_iters=6, newton_straggler_frac=0.50,
            two_pass_fused=True,
        ),
        "fused_p1=8": dict(
            newton_pass1_iters=8, newton_straggler_frac=0.25,
            two_pass_fused=True,
        ),
    }
    results = {}
    for name, kw in variants.items():
        dps, bound = time_estep(state, data, make_cfg(**kw))
        results[name] = {"docs_per_sec": round(dps, 1), "bound": bound}
        print(f"{name}: {dps:.0f} docs/s  bound={bound:.2f}", flush=True)
    with open(os.path.join(HERE, f"results_fused_K{K}.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
