#!/usr/bin/env python
"""Poliblogs-style content-covariate demo (BASELINE.json config #3).

Generates a corpus whose word usage depends on a binary aspect (e.g.
blog side) on top of shared topics, then fits STM with content=True,
K=20 — exercising the kappa Poisson regressions and topic-aspect betas.
Checks that the fitted per-aspect betas actually separate the planted
aspect vocabularies.  Writes benchmarks/results_content.json.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/strutopy_jax_cache")

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__)) if "__file__" in globals() and "<" not in str(globals().get("__file__")) else "benchmarks"
OUT = os.path.join(HERE, "results_content.json")

K, V, N, N_WORDS, A = 20, 3000, 4000, 200, 2


def main():
    rng = np.random.default_rng(0)
    # shared topics + aspect-specific word boosts on disjoint marker sets
    base = rng.dirichlet(np.full(V, 0.05), size=K)
    markers0 = np.arange(0, 100)  # aspect-0 marker words
    markers1 = np.arange(100, 200)
    beta_a = np.stack([base.copy(), base.copy()])
    beta_a[0][:, markers0] += 0.004
    beta_a[1][:, markers1] += 0.004
    beta_a /= beta_a.sum(axis=2, keepdims=True)

    aspect = rng.integers(0, A, N)
    eta = rng.normal(0, 1.0, (N, K - 1))
    ef = np.concatenate([eta, np.zeros((N, 1))], axis=1)
    theta = np.exp(ef - ef.max(axis=1, keepdims=True))
    theta /= theta.sum(axis=1, keepdims=True)

    docs = []
    for d in range(N):
        p = theta[d] @ beta_a[aspect[d]]
        draw = rng.multinomial(N_WORDS, p)
        ids = np.nonzero(draw)[0]
        docs.append(list(zip(ids.tolist(), draw[ids].tolist())))

    from strutopy_tpu.models.stm import STM

    t0 = time.time()
    m = STM(
        documents=docs,
        K=K,
        X=aspect.astype(np.float64),
        content=True,
        A=A,
        beta_index=aspect,
        kappa_interactions=True,
        lda_beta=False,
        max_em_iter=8,
        init_type="random",
        model_type="STM",
    )
    m.expectation_maximization(saving=False)
    fit_s = time.time() - t0

    beta = m.beta  # (A, K, V)
    # aspect separation: do the fitted aspect betas put more mass on
    # their own markers than on the other aspect's?
    m0_own = beta[0][:, markers0].sum(axis=1).mean()
    m0_other = beta[0][:, markers1].sum(axis=1).mean()
    m1_own = beta[1][:, markers1].sum(axis=1).mean()
    m1_other = beta[1][:, markers0].sum(axis=1).mean()

    result = {
        "config": {"K": K, "V": V, "N": N, "A": A},
        "fit_seconds": round(fit_s, 1),
        "final_bound": m.last_bounds[-1],
        "kappa_shape": list(m.kappa.shape),
        "aspect0_own_marker_mass": float(m0_own),
        "aspect0_other_marker_mass": float(m0_other),
        "aspect1_own_marker_mass": float(m1_own),
        "aspect1_other_marker_mass": float(m1_other),
        "separation_ok": bool(m0_own > m0_other and m1_own > m1_other),
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
