"""Device A/B of the spectral-init fit (round-5 spectral h2h follow-up).

The spectral h2h measured ours at wiki heldout -9.353 on TPU, but a
CPU replay of the IDENTICAL protocol from the bit-identical init
(spectral_init_diag.py) scored -6.985 — a ~2.4-nat device discrepancy
that dwarfs the h2h gap itself (the reference scored -8.564).  This
script runs the exact `quality_h2h_spectral.fit_ours_spectral` wiki
config per (platform, gram_norm) cell so the defect can be attributed:

  cpu_l1    — CPU, the pre-fix l1-normalized Q (what phase 1's init was
              on TPU); expected ~-6.98 per the diag cross-fit
  cpu_none  — CPU, the fixed reference-parity unnormalized Q
  tpu_l1    — TPU, pre-fix init (the phase-1 reading was -9.353)
  tpu_none  — TPU, fixed init

Writes benchmarks/results_spectral_device_ab.json incrementally.

Usage: python benchmarks/spectral_device_ab.py <cell> [<cell> ...]
"""

import json
import os
import sys
import time

import numpy as np

HERE = os.path.join(os.path.abspath(os.getcwd()), "benchmarks")
sys.path.insert(0, HERE)

OUT = os.path.join(HERE, "results_spectral_device_ab.json")
K = 50
ITERS = 25


def run_cell(cell):
    platform, norm = cell.split("_")
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from quality_h2h import load_wiki, score, split_completion
    from quality_h2h_spectral import fit_ours_spectral

    import strutopy_tpu.ops.spectral as spec_mod

    # pin the gram normalization for this cell (the production default
    # is "none"; "l1" replays the pre-fix pipeline)
    orig = spec_mod.spectral_init

    def patched(corpus, K, V=None, **kw):
        kw["gram_norm"] = norm
        return orig(corpus, K, V, **kw)

    import strutopy_tpu.models.stm as stm_mod

    stm_mod.spectral_init = patched

    docs, vocab, X = load_wiki()
    train, test, test_1, test_2 = split_completion(docs)
    docs_beta, docs_theta = train + test, train + test_1

    t0 = time.perf_counter()
    beta, theta_t1, times = fit_ours_spectral(
        docs_beta, docs_theta, vocab, X, K, ITERS, len(test_1))
    entry = dict(times, **score(beta, theta_t1, test_2, docs_beta))
    entry["wall_seconds"] = round(time.perf_counter() - t0, 1)
    entry["platform"] = platform
    entry["gram_norm"] = norm
    return entry


def main():
    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    cells = sys.argv[1:] or ["cpu_l1", "cpu_none"]
    for cell in cells:
        if cell in results:
            print(f"{cell}: cached ({results[cell]['heldout_ll']:.4f})",
                  flush=True)
            continue
        print(f"=== {cell} ===", flush=True)
        results[cell] = run_cell(cell)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)
        print(f"{cell}: heldout {results[cell]['heldout_ll']:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
