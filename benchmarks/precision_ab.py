#!/usr/bin/env python
"""Price the round-5 einsum-precision fix on the headline E-step
(VERDICT r4 weak #8 follow-through: bench.py double-ran at 62.6k/62.0k
docs/s vs the 64.3k-69.2k recorded band, so the drop must be bisected,
not attributed to tunnel variance).

The fix (ops/linalg.py::_PREC, ops/estep.py::_FINALIZE_PREC) is the
only E-step code change since round 4 — this A/B isolates its cost by
component and measures the cheaper-but-still-correct alternative:

  prod          linalg HIGHEST  + finalize HIGHEST   (shipped fix)
  r4_default    linalg DEFAULT  + finalize DEFAULT   (pre-fix code;
                 NaNs at N=1M — timing reference only)
  chol_highest  linalg HIGHEST  + finalize DEFAULT
  chol_high     linalg HIGH     + finalize DEFAULT
  high_high     linalg HIGH     + finalize HIGH

Correctness floor per the on-TPU fixture probe (RESULTS.md round 5):
DEFAULT NaNs the dumped barely-PD Hessians, HIGH is finite with
6.7e-4 max err (20x margin to the 0.014 repaired eig floor), HIGHEST
is finite at 1.4e-5.  So linalg must be >= HIGH; the finalize terms
(loglik t_l, quad, final Hessian) were DEFAULT for rounds 1-4 without
incident and only shape the REPORTED bound / the repaired H's input.

Protocol: bench.py's cell (K=100, V=10k, N=8,192, B=256, two-pass
p1=6/frac=0.25), ONE warmed state, per-variant patched trace-time
constants + jax.clear_caches() (the round-3 vchunk lesson), median of
5 timed E-steps.  Run on a QUIET host.

Usage:  python benchmarks/precision_ab.py     (cwd = repo root, TPU)
Writes benchmarks/results_precision_ab.json.
"""

import json
import os
import statistics
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/strutopy_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

HERE = (os.path.dirname(os.path.abspath(__file__))
        if "__file__" in globals() and "<" not in str(globals().get("__file__"))
        else os.path.join(os.getcwd(), "benchmarks"))
sys.path.insert(0, HERE)
OUT = os.path.join(HERE, "results_precision_ab.json")

K, V, N, NW, B = 100, 10_000, 8_192, 300, 256


def main():
    import jax

    import strutopy_tpu.ops.estep as E
    import strutopy_tpu.ops.linalg as LA
    from bench_common import warmed_state
    from strutopy_tpu.models.em import local_estep_stats

    P = jax.lax.Precision
    VARIANTS = (
        ("prod", P.HIGHEST, P.HIGHEST),
        ("r4_default", P.DEFAULT, P.DEFAULT),
        ("chol_highest", P.HIGHEST, P.DEFAULT),
        ("chol_high", P.HIGH, P.DEFAULT),
        ("high_high", P.HIGH, P.HIGH),
    )

    state, data, pc, design, make_cfg = warmed_state(
        K, V, N, NW, B,
        dict(newton_pass1_iters=6, newton_straggler_frac=0.25), warmup=5)
    cfg = make_cfg()

    results = {"config": {"K": K, "V": V, "N": N, "tokens": NW, "batch": B,
                          "schedule": "two-pass p1=6 frac=0.25, steady "
                                      "state, median of 5"},
               "variants": {}}
    for name, lap, finp in VARIANTS:
        LA._PREC = lap
        E._FINALIZE_PREC = finp
        jax.clear_caches()
        estep = jax.jit(lambda s, d: local_estep_stats(s, d, cfg)[0].bound)
        bound = float(np.asarray(estep(state, data)))  # compile + warm
        times = []
        for _ in range(5):
            t0 = time.time()
            float(np.asarray(estep(state, data)))
            times.append(time.time() - t0)
        med = statistics.median(times)
        rec = {"docs_per_sec": round(N / med, 1),
               "median_seconds": round(med, 5),
               "all_seconds": [round(t, 5) for t in times],
               "bound": bound}
        results["variants"][name] = rec
        print(name, json.dumps(rec), flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)

    LA._PREC = P.HIGH
    E._FINALIZE_PREC = P.HIGH
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
