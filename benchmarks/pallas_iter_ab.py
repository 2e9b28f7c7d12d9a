#!/usr/bin/env python
"""A/B the fused whole-iteration Pallas kernel (pallas_iter).

One kernel per Newton iteration fuses f/g/H + Jacobi-CG + the Armijo
sweep + the eta update, so the (B, K, L) beta_doc block is read from
HBM once per iteration instead of twice and the dozens of in-loop XLA
ops collapse to one Mosaic program (the roofline says the E-step is
op-granularity-bound — results_roofline.json).  The Newton while_loop
stays in XLA (the whole-loop kernel crashes the remote Mosaic
compiler — TODO.md).

Usage: pallas_iter_ab.py [K] [block]  ->  benchmarks/results_pallas_iter.json
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
    blocks = ([int(sys.argv[2])] if len(sys.argv) > 2 else [8, 16, 32])
    V, N, n_words = 10_000, 4096, 300
    B = 128 if K > 150 else 256
    common = dict(newton_pass1_iters=6, newton_straggler_frac=0.25)

    state, data, pc, design, make_cfg = warmed_state(
        K, V, N, n_words, B, common
    )
    results = {}
    dps, bound = time_estep(
        state, data, make_cfg(pallas_cg=K > 150, pallas_block=32))
    results["xla"] = {"docs_per_sec": round(dps, 1), "bound": bound}
    print(f"baseline: {dps:.0f} docs/s  bound={bound:.2f}", flush=True)
    for blk in blocks:
        try:
            dps, bound = time_estep(
                state, data, make_cfg(pallas_iter=True, pallas_block=blk))
        except Exception as e:  # Mosaic compile failures are data too
            results[f"iter_b{blk}"] = {"error": repr(e)[:300]}
            print(f"pallas_iter block={blk}: FAILED {e!r}"[:200], flush=True)
            continue
        results[f"iter_b{blk}"] = {"docs_per_sec": round(dps, 1),
                                   "bound": bound}
        print(f"pallas_iter block={blk}: {dps:.0f} docs/s  "
              f"bound={bound:.2f}", flush=True)
    with open(os.path.join(HERE, f"results_pallas_iter_K{K}.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
