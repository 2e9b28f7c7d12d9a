"""K=400 finalize-wall sweep: chol_block and nu_method (round 5).

The K=400 ablation (results_ablate_K400.json) located the cliff's wall
in the finalize (K-1)^3 factorization/inverse: the blocked-Cholesky
stage costs 0.93 s of the 1.17 s iteration at B=128, and B=64 +
pallas_cg is the throughput optimum (7,651 docs/s).  The blocked path
has two knobs that were only ever swept at K<=200, where they measured
within noise (TODO.md) — but both change the latency/MXU trade in the
K=400 regime:

  chol_block — blocked_cholesky panel size.  P=399 means 25 sequential
    block steps at 16 vs 13 at 32 vs 7 at 64; bigger panels mean fewer
    sequential rounds of bigger einsums (MXU-friendlier) at the cost of
    a longer unrolled _small_chol per panel (b sequential column steps).
  nu_method="ns" — XLA's native Cholesky for L (detTerm only needs
    diag L) + Newton-Schulz inverse for nu: ~36 batched (B,399,399)
    matmuls, pure MXU, no triangular substitution at all.  ~55x the
    FLOPs of the blocked inverse but zero sequential-depth latency;
    known ~1e-3 sigma error (off by default, TODO.md).

All variants time the SAME warmed state (5 warm-up EM iterations,
two-pass schedule) at the K=400 optimum recipe B=64 + pallas_cg block 8.
Each variant's cfg is a distinct trace-time constant -> its own graph.

Usage:  python benchmarks/k400_finalize_ab.py    (cwd = repo root, TPU)
Writes benchmarks/results_k400_finalize.json.
"""

import json
import os
import sys
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/strutopy_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

HERE = (os.path.dirname(os.path.abspath(__file__))
        if "__file__" in globals() and "<" not in str(__file__)
        else os.path.join(os.getcwd(), "benchmarks"))
sys.path.insert(0, HERE)
from bench_common import time_estep, warmed_state  # noqa: E402

OUT = os.path.join(HERE, "results_k400_finalize.json")

K, V, N, L = 400, 10_000, 4096, 300


def main():
    cfg_kw = dict(newton_pass1_iters=6, newton_straggler_frac=0.25)
    state, data, pc, design, make_cfg = warmed_state(K, V, N, L, 64, cfg_kw)

    base = dict(batch_size=64, pallas_cg=True, pallas_block=8)
    variants = [
        ("blocked_b16_prod", dict(base, nu_method="blocked", chol_block=16)),
        ("blocked_b32", dict(base, nu_method="blocked", chol_block=32)),
        ("blocked_b64", dict(base, nu_method="blocked", chol_block=64)),
        ("chol_xla_native", dict(base, nu_method="chol")),
        ("ns_inverse", dict(base, nu_method="ns")),
    ]
    results = {"config": {
        "K": K, "V": V, "N": N, "tokens_per_doc": L,
        "schedule": ("two-pass p1=6 frac=0.25, steady state, B=64 + "
                     "pallas_cg block 8 (the results_ablate_K400.json "
                     "optimum), best-of-3 per variant"),
    }}
    for name, over in variants:
        try:
            dps, bound = time_estep(state, data, make_cfg(**over))
            results[name] = {"docs_per_sec": round(dps, 1),
                             "bound": round(float(bound), 3)}
            print(f"{name}: {dps:,.0f} docs/s (bound {bound:.3f})",
                  flush=True)
        except Exception as e:
            results[name] = {"compile_failed":
                             f"{type(e).__name__}: {str(e)[:300]}"}
            print(f"{name}: FAILED — {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            traceback.print_exc(limit=2)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
