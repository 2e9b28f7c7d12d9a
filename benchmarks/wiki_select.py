"""select_model on the REAL wiki corpus: R-stm selectModel's
multi-random-restart protocol on the reference's own data.

The reference pins one seed per fit (src/modules/stm.py:425-428) and
never runs restarts; R-stm's selectModel is the standard answer to
random-init variance.  This casts `runs` random initializations for
`cast_iters` EM iterations at the reference's wiki config (K=20),
keeps the top fraction by bound, runs the survivors to convergence,
and records each survivor's bound + mean semantic coherence +
exclusivity (the plotModels frontier, saved next to the JSON).

Also records spectral init's bound at the same iteration count — the
restart protocol is exactly the baseline spectral init should beat.

Run from the repo root:  python - < benchmarks/wiki_select.py
(add `--platform cpu` to force CPU)
"""

import json
import os
import sys

import numpy as np

WIKI = "/root/reference/src/artifacts/wiki_data"
_DIR = os.path.join(os.path.abspath(os.getcwd()), "benchmarks")
OUT = os.path.join(_DIR, "results_wiki_select.json")
PLOT = os.path.join(_DIR, "wiki_select.png")


def main():
    import time

    import jax

    from strutopy_tpu.corpus.io import read_mm
    from strutopy_tpu.models.stm import STM
    from strutopy_tpu.pipeline import select_model

    docs = read_mm(os.path.join(WIKI, "BoW_corpus.mm"))
    assert len(docs) == 1015

    K, max_em_iter = 20, 30
    t0 = time.monotonic()
    res = select_model(
        docs,
        K=K,
        runs=8,
        cast_iters=4,
        keep=3,
        max_em_iter=max_em_iter,
        seed=123456,
        return_models=False,
    )
    sweep_s = time.monotonic() - t0

    # the spectral-init baseline at the same iteration budget
    spec = STM(docs, K=K, init_type="spectral", max_em_iter=max_em_iter,
               seed=123456)
    spec.expectation_maximization(saving=False)

    import matplotlib

    matplotlib.use("Agg")
    from strutopy_tpu.eval.plots import plot_select_model

    plot_select_model(res, path=PLOT)

    rec = {
        "config": {
            "corpus": "reference wiki BoW_corpus.mm (N=1015, V=13852)",
            "K": K,
            "runs": 8,
            "cast_iters": 4,
            "keep": 3,
            "max_em_iter": max_em_iter,
            "platform": jax.devices()[0].platform,
        },
        "sweep_seconds": sweep_s,
        "runs": res["runs"],
        "kept": res["kept"],
        "selected": res["selected"],
        "selected_bound": res["runs"][res["selected"]]["bound"],
        "spectral_bound": float(spec.last_bounds[-1]),
        "spectral_iters": len(spec.last_bounds),
    }
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec, indent=2))


if __name__ == "__main__":
    if "--platform" in sys.argv:
        import jax

        jax.config.update(
            "jax_platforms", sys.argv[sys.argv.index("--platform") + 1]
        )
    main()
