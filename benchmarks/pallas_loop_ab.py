#!/usr/bin/env python
"""Whole-Newton-loop Pallas kernel A/B (round 3: it finally COMPILES).

Rounds 1-2: the kernel crashed the remote Mosaic compiler with no
diagnostics.  The round-3 probe surfaced the real error (scf.yield of
1-D i1/i32 vector loop carries) and the f32-carry fix in
ops/estep.py::_batched_newton legalized it at every block size.

Measures, on the same warmed state at the headline config:
  * XLA single-pass (the kernel's apples-to-apples comparison),
  * XLA two-pass (the production recipe),
  * use_pallas=True at blocks 8/16/32 (single-pass by construction),
with bound parity against the XLA single-pass bound.

Usage: pallas_loop_ab.py [K] -> benchmarks/results_pallas_loop_K{K}.json
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/strutopy_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__)) if "__file__" in globals() and "<" not in str(globals().get("__file__")) else "benchmarks"

K = int(sys.argv[1]) if len(sys.argv) > 1 else 100
V, N, N_WORDS = 10_000, 8_192, 300
BATCH = 256 if K < 200 else 128
OUT = os.path.join(HERE, f"results_pallas_loop_K{K}.json")


def main():
    import bench_common as bc

    state, data, pc, design, make_cfg = bc.warmed_state(
        K, V, N, N_WORDS, BATCH, {}
    )

    results = {"config": {"K": K, "V": V, "N": N, "batch": BATCH}}

    cfg_xla = make_cfg()
    dps, bound_ref = bc.time_estep(state, data, cfg_xla)
    results["xla_single_pass"] = {"docs_per_sec": round(dps, 1),
                                  "bound": float(bound_ref)}
    print(f"xla single-pass: {dps:.0f} docs/s", flush=True)

    cfg_tp = make_cfg(newton_pass1_iters=6, newton_straggler_frac=0.25)
    dps_tp, bound_tp = bc.time_estep(state, data, cfg_tp)
    results["xla_two_pass"] = {
        "docs_per_sec": round(dps_tp, 1), "bound": float(bound_tp),
        "bound_rel_diff": abs(bound_tp - bound_ref) / abs(bound_ref),
    }
    print(f"xla two-pass: {dps_tp:.0f} docs/s", flush=True)

    for block in (8, 16, 32):
        cfg_p = make_cfg(use_pallas=True, pallas_block=block)
        try:
            t0 = time.time()
            dps_p, bound_p = bc.time_estep(state, data, cfg_p)
            results[f"pallas_block_{block}"] = {
                "docs_per_sec": round(dps_p, 1),
                "bound": float(bound_p),
                "bound_rel_diff": abs(bound_p - bound_ref) / abs(bound_ref),
                "compile_plus_run_s": round(time.time() - t0, 1),
            }
            print(f"pallas block {block}: {dps_p:.0f} docs/s "
                  f"(bound rel {abs(bound_p-bound_ref)/abs(bound_ref):.1e})",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — record toolchain failures
            results[f"pallas_block_{block}"] = {
                "error": str(e).splitlines()[0][:300]
            }
            print(f"pallas block {block}: FAILED {str(e).splitlines()[0][:160]}",
                  flush=True)

    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
