"""Plotting utilities: the reference's matplotlib surfaces.

Covers CorpusCreation.display_props (generate_docs.py:353-379), the
convergence plot drawn from lower_bound.pickle
(06_example_application.py:226-246) and the heldout-by-K model
selection plot (06_example_application.py:198-224).  All functions
return the matplotlib Figure and only import matplotlib lazily.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def display_props(theta: np.ndarray, path: Optional[str] = None):
    """Stacked horizontal bars of per-document topic proportions
    (reference display_props, generate_docs.py:353-379, generalized
    beyond K=3)."""
    plt = _plt()
    theta = np.asarray(theta)
    N, K = theta.shape
    fig, ax = plt.subplots(figsize=(8, max(3, N * 0.12)))
    left = np.zeros(N)
    for k in range(K):
        ax.barh(range(N), theta[:, k], left=left, label=f"p(k={k + 1})")
        left += theta[:, k]
    ax.set_title(f"Topic Distribution for {N} sample documents ({K} topics)")
    ax.legend(loc="upper right", fontsize="small")
    if path:
        fig.savefig(path, bbox_inches="tight")
    return fig


def plot_convergence(bounds: Sequence[float], path: Optional[str] = None):
    """ELBO trajectory over EM iterations
    (reference 06_example_application.py:226-246)."""
    plt = _plt()
    fig, ax = plt.subplots()
    ax.plot(range(len(bounds)), bounds, marker="o")
    ax.set_xlabel("EM iteration")
    ax.set_ylabel("approximate ELBO")
    ax.set_title("Convergence of the variational bound")
    if path:
        fig.savefig(path, bbox_inches="tight")
    return fig


def plot_heldout_by_k(results: Mapping, path: Optional[str] = None):
    """Heldout log-likelihood per K per model — the find-K selection
    plot (reference 06_example_application.py:198-224).  ``results``
    is the dict returned by pipeline.find_k."""
    plt = _plt()
    fig, ax = plt.subplots()
    for model_type, by_k in results.items():
        ks = sorted(by_k)
        ax.plot(ks, [by_k[k] for k in ks], marker="o", label=model_type)
    ax.set_xlabel("number of topics K")
    ax.set_ylabel("heldout log-likelihood")
    ax.set_title("Document-completion heldout by K")
    ax.legend()
    if path:
        fig.savefig(path, bbox_inches="tight")
    return fig
