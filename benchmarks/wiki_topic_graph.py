"""Topic graph on the real wiki K=50 fit — both topicCorr methods.

Runs eval/graph.py's simple (sigma-threshold) and huge (nonparanormal
MB + StARS) estimators on the committed wiki reference fit
(artifacts/wiki_reference_model/50, N=1015), labels the strongest
edges with each endpoint's top words, and writes
results_wiki_graph.json + wiki_topic_graph.png.

Run from the repo root:  python - < benchmarks/wiki_topic_graph.py
"""

import json
import os
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from strutopy_tpu.corpus.io import read_gensim_dictionary  # noqa: E402
from strutopy_tpu.eval.graph import (  # noqa: E402
    plot_topic_graph,
    topic_graph,
    topic_graph_huge,
)

ROOT = os.getcwd()  # stdin-run needs cwd=repo root (like scaling.py)
HERE = os.path.join(ROOT, "benchmarks")
FIT = os.path.join(ROOT, "artifacts", "wiki_reference_model", "50")
REF_DICT = "/root/reference/src/artifacts/wiki_data/dictionary.mm"

theta = np.load(os.path.join(FIT, "theta_hat.npy"))
sigma = np.load(os.path.join(FIT, "sigma_hat.npy"))
beta = np.load(os.path.join(FIT, "beta_hat.npy"))
if beta.ndim == 3:
    beta = beta[0]
K = theta.shape[1]

vocab = None
if os.path.exists(REF_DICT):
    vocab = read_gensim_dictionary(REF_DICT)


def top_words(k, n=4):
    idx = np.argsort(-beta[k])[:n]
    if vocab is None:
        return [str(i) for i in idx]
    return [vocab[int(i)] for i in idx]


t0 = time.time()
adj_simple, edges_simple = topic_graph(sigma, cutoff=0.01)
t_simple = time.time() - t0

t0 = time.time()
huge = topic_graph_huge(theta, n_subsamples=20, seed=0)
t_huge = time.time() - t0

labeled = [
    {
        "edge": [int(i), int(j)],
        "topic_i_words": top_words(i),
        "topic_j_words": top_words(j),
    }
    for i, j in huge["edges"][:20]
]

out = {
    "config": {"K": K, "N": int(theta.shape[0]), "source": "wiki K=50 fit"},
    "simple_edges": len(edges_simple),
    "huge_edges": len(huge["edges"]),
    "huge_lambda": huge["lambda"],
    "huge_instability_path": [float(x) for x in huge["instability"]],
    "seconds_simple": round(t_simple, 3),
    "seconds_huge": round(t_huge, 3),
    "huge_edges_labeled_top20": labeled,
}
with open(os.path.join(HERE, "results_wiki_graph.json"), "w") as f:
    json.dump(out, f, indent=2)
plot_topic_graph(graph=huge, path=os.path.join(HERE, "wiki_topic_graph.png"))
print(json.dumps({k: v for k, v in out.items()
                  if k != "huge_edges_labeled_top20"}, indent=2))
for e in labeled[:8]:
    print(e["edge"], "|", " ".join(e["topic_i_words"]), "<->",
          " ".join(e["topic_j_words"]))
