"""LDAvis export demo on the REAL wiki corpus: the toLDAvis payload
with the reference's actual vocabulary (read via the gensim-dictionary
reader), written as a standard createJSON-schema artifact a stock
``ldavis.js`` front end can serve directly.

Run from the repo root:  python - < benchmarks/wiki_ldavis.py
"""

import json
import os

import numpy as np

WIKI = "/root/reference/src/artifacts/wiki_data"
_DIR = os.path.join(os.path.abspath(os.getcwd()), "benchmarks")
OUT = os.path.join(_DIR, "wiki_ldavis.json")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from strutopy_tpu.corpus.io import read_gensim_dictionary, read_mm
    from strutopy_tpu.eval.ldavis import to_ldavis
    from strutopy_tpu.models.stm import STM

    docs = read_mm(os.path.join(WIKI, "BoW_corpus.mm"))
    vocab = read_gensim_dictionary(os.path.join(WIKI, "dictionary.mm"))

    model = STM(docs, K=20, init_type="spectral", model_type="CTM",
                max_em_iter=15, seed=0)
    model.expectation_maximization(saving=False)

    doc_lengths = np.array([sum(c for _, c in d) for d in docs])
    payload = to_ldavis(model.beta, model.theta, doc_lengths, vocab,
                        R=30, path=OUT)

    # print the overview so the artifact is human-checkable: the top
    # saliency terms and the top-3 topics' top relevance terms
    tinfo = payload["tinfo"]
    default_terms = [t for t, c in zip(tinfo["Term"], tinfo["Category"])
                     if c == "Default"][:12]
    print("top salient terms:", ", ".join(default_terms))
    for topic in ("Topic1", "Topic2", "Topic3"):
        rows = [(t, lp) for t, c, lp in
                zip(tinfo["Term"], tinfo["Category"], tinfo["logprob"])
                if c == topic]
        rows.sort(key=lambda r: -r[1])
        print(topic, "top terms:", ", ".join(t for t, _ in rows[:8]))
    print("wrote", OUT, f"({os.path.getsize(OUT)} bytes,",
          f"{len(tinfo['Term'])} tinfo rows)")


main()
