"""K=400 cliff diagnosis (VERDICT r3 next #5).

The K-sweep records a ~4.8x throughput drop from K=200 (36.7k docs/s)
to K=400 (6.4-7.7k), with the E-step forced to B=64 because the remote
Mosaic compiler HTTP-500s on pallas_cg at B>=128.  Round 4 adds
``cg_chunk_docs`` (ops/estep.py): lax.map the pallas_cg call over
64-doc sub-chunks so the E-step batch can grow back to 128/256 (bigger
batches feed the MXU better everywhere outside the CG solve) while
each pallas_call keeps the input size the compiler accepts.

This sweep times, on the SAME warmed K=400 state (5 warm-up EM
iterations, two-pass production schedule):

  B=64 :  XLA CG | pallas_cg block 8          (the round-3 recipe)
  B=128:  XLA CG | pallas_cg straight (expect compile fail, recorded)
          | pallas_cg + cg_chunk_docs=64
  B=256:  XLA CG | pallas_cg + cg_chunk_docs=64

plus stage shares from ablate_estep.py run separately (see
results_ablate_K400_V10000.json).

Usage:  python - < benchmarks/k400_ab.py   (cwd = repo root)
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

OUT = os.path.join(HERE, "results_ablate_K400.json")

K, V, N, L = 400, 10_000, 4096, 300


def main():
    # warm at the round-3 recipe (B=64, pallas off during warm-up so the
    # warmed state is variant-neutral; two-pass schedule as the K-sweep)
    cfg_kw = dict(newton_pass1_iters=6, newton_straggler_frac=0.25)
    state, data, pc, design, make_cfg = warmed_state(K, V, N, L, 64, cfg_kw)

    variants = [
        ("B64_xla", dict(batch_size=64)),
        ("B64_pallas_cg8", dict(batch_size=64, pallas_cg=True,
                                pallas_block=8)),
        ("B128_xla", dict(batch_size=128)),
        ("B128_pallas_cg8_straight", dict(batch_size=128, pallas_cg=True,
                                          pallas_block=8)),
        ("B128_pallas_cg8_chunk64", dict(batch_size=128, pallas_cg=True,
                                         pallas_block=8, cg_chunk_docs=64)),
        ("B256_xla", dict(batch_size=256)),
        ("B256_pallas_cg8_chunk64", dict(batch_size=256, pallas_cg=True,
                                         pallas_block=8, cg_chunk_docs=64)),
    ]
    results = {"config": {"K": K, "V": V, "N": N, "tokens_per_doc": L,
                          "schedule": "two-pass p1=6 frac=0.25, steady state"}}
    for name, over in variants:
        try:
            dps, bound = time_estep(state, data, make_cfg(**over))
            results[name] = {"docs_per_sec": round(dps, 1),
                             "bound": round(float(bound), 3)}
            print(f"{name}: {dps:,.0f} docs/s (bound {bound:.3f})",
                  flush=True)
        except Exception as e:  # remote Mosaic 500s surface as errors
            results[name] = {"compile_failed":
                             f"{type(e).__name__}: {str(e)[:300]}"}
            print(f"{name}: COMPILE/RUN FAILED — {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            traceback.print_exc(limit=2)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)
    print("wrote", OUT, flush=True)


main()
