"""Topic correlation graph.

The reference README promises a "topic graph" whose only trace is a
networkx prototype in notebooks/graph.ipynb (SURVEY.md §2.4).  The
principled version — the R stm package's ``topicCorr`` — derives topic
correlations from the fitted logistic-normal covariance and thresholds
them into an adjacency structure; implemented here without a graph
library dependency.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def topic_correlations(sigma: np.ndarray) -> np.ndarray:
    """(K, K) correlation matrix of the logistic-normal prevalence.

    sigma is the fitted (K-1, K-1) covariance of the K-1 free eta
    coordinates; the pinned K-th topic is mapped through the softmax
    basis (covariance of [eta, 0] differences), matching R stm's
    simple correlation on the expanded covariance.
    """
    sigma = np.asarray(sigma, np.float64)
    Km1 = sigma.shape[0]
    K = Km1 + 1
    # expand to K x K THROUGH the softmax basis: e = [eta, 0] centered
    # (log-ratio representation, invariant to the pinned coordinate).
    # cov(e - mean(e) 1) = A [[sigma, 0], [0, 0]] A^T with
    # A = I - (1/K) 1 1^T.  A plain zero-pad would give the pinned
    # K-th topic structurally zero correlation with every other topic
    # — an always-isolated node in the graph.
    pad = np.zeros((K, K))
    pad[:Km1, :Km1] = sigma
    A = np.eye(K) - np.full((K, K), 1.0 / K)
    full = A @ pad @ A.T
    d = np.sqrt(np.maximum(np.diagonal(full), 1e-12))
    corr = full / np.outer(d, d)
    np.fill_diagonal(corr, 1.0)
    return corr


def topic_graph(sigma: np.ndarray, cutoff: float = 0.01):
    """Threshold positive correlations into an edge list.

    Returns (adjacency (K, K) bool, edges [(i, j, corr), ...]) —
    the structure R stm's ``topicCorr(model, method="simple")`` plots.
    """
    corr = topic_correlations(sigma)
    K = corr.shape[0]
    adj = np.zeros((K, K), bool)
    edges = []
    for i in range(K):
        for j in range(i + 1, K):
            if corr[i, j] > cutoff:
                adj[i, j] = adj[j, i] = True
                edges.append((i, j, float(corr[i, j])))
    return adj, edges


def plot_topic_graph(sigma: np.ndarray, cutoff: float = 0.01, path: Optional[str] = None):
    """Spring-ish layout plot of the topic graph (matplotlib only)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    K = np.asarray(sigma).shape[0] + 1
    _, edges = topic_graph(sigma, cutoff)
    # circular layout (deterministic, dependency-free)
    ang = 2 * np.pi * np.arange(K) / K
    xy = np.c_[np.cos(ang), np.sin(ang)]
    fig, ax = plt.subplots(figsize=(6, 6))
    for i, j, w in edges:
        ax.plot(
            [xy[i, 0], xy[j, 0]], [xy[i, 1], xy[j, 1]],
            lw=0.5 + 4 * w, color="tab:blue", alpha=0.6,
        )
    ax.scatter(xy[:, 0], xy[:, 1], s=200, color="tab:orange", zorder=3)
    for k in range(K):
        ax.annotate(str(k), xy[k], ha="center", va="center", zorder=4)
    ax.set_axis_off()
    ax.set_title(f"Topic correlation graph (cutoff {cutoff})")
    if path:
        fig.savefig(path, bbox_inches="tight")
    return fig
