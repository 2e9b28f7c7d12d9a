"""Topic stability across restarts on the REAL wiki corpus (the
multiSTM-analog demo; pairs with wiki_select.py).

Fits three random restarts of the reference wiki config (K=20), aligns
runs 1-2 to run 0 with Hungarian matching on Jensen-Shannon topic
dissimilarity (eval/align.py), and records per-topic stability — which
of the 20 topics reappear across restarts and which are seed
artifacts.  Labels the most and least stable topics with their FREX
words so the stability number is readable.

Run from the repo root:  python - < benchmarks/wiki_align.py
"""

import json
import os

import numpy as np

WIKI = "/root/reference/src/artifacts/wiki_data"
_DIR = os.path.join(os.path.abspath(os.getcwd()), "benchmarks")
OUT = os.path.join(_DIR, "results_wiki_align.json")
PLOT = os.path.join(_DIR, "wiki_align.png")


def main():
    import time

    import jax

    jax.config.update("jax_platforms", "cpu")

    from strutopy_tpu.corpus.io import read_gensim_dictionary, read_mm
    from strutopy_tpu.eval.align import align_models, plot_alignment
    from strutopy_tpu.eval.diagnostics import label_topics
    from strutopy_tpu.models.stm import STM

    docs = read_mm(os.path.join(WIKI, "BoW_corpus.mm"))
    vocab = read_gensim_dictionary(os.path.join(WIKI, "dictionary.mm"))

    K, iters, seeds = 20, 15, (101, 202, 303)
    t0 = time.perf_counter()
    models = []
    for s in seeds:
        m = STM(docs, K=K, init_type="random", model_type="CTM",
                max_em_iter=iters, seed=s)
        m.expectation_maximization(saving=False)
        models.append(m)
        print(f"seed {s}: bound {m.last_bounds[-1]:.0f}")
    fit_s = time.perf_counter() - t0

    out = align_models(models, metric="js")
    plot_alignment(out, run_labels=[f"seed {s}" for s in seeds], path=PLOT)

    stability = out["stability"]
    order = np.argsort(stability)
    _, frexlabels = label_topics(models[0].beta, vocab, n=5)
    most = [{"topic": int(k), "js": float(stability[k]),
             "frex": frexlabels[k]} for k in order[:3]]
    least = [{"topic": int(k), "js": float(stability[k]),
              "frex": frexlabels[k]} for k in order[-3:][::-1]]

    res = {
        "config": {"corpus": f"reference wiki BoW_corpus.mm (N={len(docs)}, "
                             f"V={len(vocab)})", "K": K, "max_em_iter": iters,
                   "seeds": list(seeds), "metric": "js",
                   "platform": "cpu"},
        "fit_seconds": fit_s,
        "bounds": [float(m.last_bounds[-1]) for m in models],
        "run_distance": [float(x) for x in out["run_distance"]],
        "stability_mean_js": float(stability.mean()),
        "stability_per_topic": [float(x) for x in stability],
        "most_stable": most,
        "least_stable": least,
    }
    with open(OUT, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps({k: res[k] for k in
                      ("run_distance", "stability_mean_js")}, indent=2))
    print("most stable:", most)
    print("least stable:", least)
    print("wrote", OUT, "and", PLOT)


main()
