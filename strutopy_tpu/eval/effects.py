"""Metadata-effect estimation on topic proportions.

The reference README promises "Metadata estimates ... visualised w.r.t.
their effect on the expected topic proportions" (README.md §5); its
code only prints raw gamma differences (06_example_application.py:
343-351).  This module provides the R-stm ``estimateEffect``-style
analysis: per-topic OLS of theta on a covariate design with
normal-approximation confidence intervals, plus the effect plot.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def estimate_effect(
    theta: np.ndarray,
    D: np.ndarray,
    topics: Optional[Sequence[int]] = None,
    add_intercept: bool = True,
):
    """Per-topic OLS of theta[:, k] on the covariate design.

    Returns a dict with ``coef`` (K_sel, P), ``se`` (K_sel, P) and
    ``ci`` ((K_sel, P, 2), 95% normal approx).
    """
    theta = np.asarray(theta, np.float64)
    D = np.asarray(D, np.float64)
    if D.ndim == 1:
        D = D[:, None]
    if add_intercept:
        D = np.c_[np.ones(len(D)), D]
    N, P = D.shape
    topics = range(theta.shape[1]) if topics is None else topics

    DtD_inv = np.linalg.pinv(D.T @ D)
    H = DtD_inv @ D.T
    coefs, ses = [], []
    for k in topics:
        y = theta[:, k]
        b = H @ y
        resid = y - D @ b
        dof = max(N - P, 1)
        s2 = float(resid @ resid) / dof
        se = np.sqrt(np.maximum(np.diagonal(DtD_inv) * s2, 0.0))
        coefs.append(b)
        ses.append(se)
    coef = np.asarray(coefs)
    se = np.asarray(ses)
    ci = np.stack([coef - 1.96 * se, coef + 1.96 * se], axis=-1)
    return {"coef": coef, "se": se, "ci": ci, "topics": list(topics)}


def plot_effect(
    effect: dict,
    covariate: int = 1,
    path: Optional[str] = None,
):
    """Point estimates + 95% CIs of one covariate's effect per topic."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    coef = effect["coef"][:, covariate]
    ci = effect["ci"][:, covariate]
    topics = effect["topics"]
    fig, ax = plt.subplots(figsize=(6, 0.35 * len(topics) + 1))
    y = np.arange(len(topics))
    ax.errorbar(
        coef, y,
        xerr=np.stack([coef - ci[:, 0], ci[:, 1] - coef]),
        fmt="o", capsize=3,
    )
    ax.axvline(0.0, color="gray", lw=1, ls="--")
    ax.set_yticks(y)
    ax.set_yticklabels([f"topic {k}" for k in topics])
    ax.set_xlabel("effect on expected topic proportion")
    ax.set_title("Covariate effect on topic prevalence (95% CI)")
    if path:
        fig.savefig(path, bbox_inches="tight")
    return fig
