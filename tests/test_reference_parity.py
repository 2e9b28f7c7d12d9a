"""Direct component parity against the REFERENCE'S OWN code.

Imports /root/reference/src/modules (read-only, with stub modules for
its unavailable deps gensim/qpsolvers) and compares our implementations
against the reference functions on identical inputs:

  * hessian / lower_bound / update_z (phi)  — must match exactly
    (these reference paths are bug-free and we reproduce them);
  * eval_heldout, ecdf/frex                 — must match to <=1e-5
    (the BASELINE.json eval-parity requirement);
  * the objective f                          — must match (the
    reference's *gradient* is deliberately not compared: it is buggy,
    see PARITY_NOTES.md #1).
"""

import os
import sys
import types

import numpy as np
import pytest

REF_SRC = "/root/reference/src"

pytestmark = [
    pytest.mark.smoke,
    pytest.mark.skipif(
        not os.path.isdir(REF_SRC), reason="reference source not mounted"
    ),
]


# ref_modules fixture lives in conftest.py (shared with
# test_artifact_parity.py)


def _ref_stm_instance(ref_stm, K=5, siginv=None, sigmaentropy=None):
    """Bare STM carcass exposing the per-doc math without __init__."""
    inst = object.__new__(ref_stm.STM)
    inst.K = K
    inst.siginv = siginv
    inst.sigmaentropy = sigmaentropy
    return inst


def _doc(seed=0, K=5, L=12, V=60):
    rng = np.random.default_rng(seed)
    words = rng.choice(V, size=L, replace=False)
    counts = rng.integers(1, 5, size=L).astype(np.float64)
    beta = rng.dirichlet(np.ones(V), size=K)
    beta_doc = beta[:, words]
    eta = rng.normal(0, 0.4, K - 1)
    mu = rng.normal(0, 0.3, K - 1)
    sigma = np.diag(np.full(K - 1, 2.0)) + 0.3
    siginv = np.linalg.inv(sigma)
    sigent = float(np.log(np.diag(np.linalg.cholesky(sigma))).sum())
    return words, counts, beta_doc, eta, mu, sigma, siginv, sigent


def test_objective_f_matches_reference(ref_modules):
    ref_stm, _ = ref_modules
    import jax.numpy as jnp
    from strutopy_tpu.ops.estep import _f_g_H

    for seed in range(3):
        _, c, beta_doc, eta, mu, _, siginv, _ = _doc(seed)
        inst = _ref_stm_instance(ref_stm, K=5, siginv=siginv)
        # reference f is defined inside optimize_eta; evaluate via a
        # zero-iteration minimize call surrogate: rebuild it exactly
        K = 5
        eta_full = np.insert(eta, K - 1, 0)
        Ndoc = int(np.sum(c))
        ref_f = float(
            0.5 * (eta_full[:-1] - mu).T @ siginv @ (eta_full[:-1] - mu)
            - (
                np.dot(c, eta_full.max() + np.log(np.exp(eta_full - eta_full.max()) @ beta_doc))
                - Ndoc * __import__("scipy.special", fromlist=["logsumexp"]).logsumexp(eta_full)
            )
        )
        f, *_ = _f_g_H(
            jnp.asarray(eta, jnp.float32),
            jnp.asarray(beta_doc, jnp.float32),
            jnp.asarray(c, jnp.float32),
            jnp.asarray(mu, jnp.float32),
            jnp.asarray(siginv, jnp.float32),
            jnp.asarray(c.sum(), jnp.float32),
        )
        np.testing.assert_allclose(float(f), ref_f, rtol=5e-5)


def test_hessian_matches_reference(ref_modules):
    ref_stm, _ = ref_modules
    import jax.numpy as jnp
    from strutopy_tpu.ops.estep import _f_g_H

    from strutopy_tpu.ops.linalg import make_pd

    for seed in range(3):
        _, c, beta_doc, eta, mu, _, siginv, _ = _doc(seed)
        inst = _ref_stm_instance(ref_stm, K=5, siginv=siginv)
        ref_H = inst.hessian(eta=eta, word_count=c, beta_doc_kv=beta_doc)
        _, _, H, _, _ = _f_g_H(
            jnp.asarray(eta, jnp.float32),
            jnp.asarray(beta_doc, jnp.float32),
            jnp.asarray(c, jnp.float32),
            jnp.asarray(mu, jnp.float32),
            jnp.asarray(siginv, jnp.float32),
            jnp.asarray(c.sum(), jnp.float32),
        )
        H = np.asarray(H, np.float64)
        # the reference repairs non-PD Hessians INSIDE hessian()
        # (stm.py:1017-1021); replicate its decision before comparing
        if not np.all(np.linalg.eigvals(H) > 0):
            import jax.numpy as jnp2

            H = np.asarray(make_pd(jnp2.asarray(H)))
            if not np.all(np.linalg.eigvals(H) > 0):
                H = H + 1e-5 * np.eye(H.shape[0])
        np.testing.assert_allclose(H, ref_H, rtol=2e-3, atol=2e-3)


def test_phi_and_bound_match_reference(ref_modules):
    ref_stm, _ = ref_modules
    import jax.numpy as jnp
    from strutopy_tpu.ops.estep import NewtonConfig, _doc_estep
    from strutopy_tpu.ops.linalg import precompute_sigma

    _, c, beta_doc, eta, mu, sigma, siginv, sigent = _doc(seed=7)
    K = 5
    inst = _ref_stm_instance(ref_stm, K=K, siginv=siginv, sigmaentropy=sigent)

    # run OUR solver, then evaluate the REFERENCE's phi/bound at our eta
    eta_ours, theta, nu, bound, phi, _ = _doc_estep(
        jnp.asarray(beta_doc, jnp.float32),
        jnp.asarray(c, jnp.float32),
        jnp.asarray(mu, jnp.float32),
        jnp.zeros(K - 1, jnp.float32),
        jnp.asarray(1.0, jnp.float32),
        jnp.asarray(siginv, jnp.float32),
        jnp.asarray(sigent, jnp.float32),
        NewtonConfig(),
    )
    eta_np = np.asarray(eta_ours, np.float64)

    inst.update_z(eta=eta_np, beta_doc_kv=beta_doc, word_count=c)
    ref_phi = inst.phi * c  # reference phi is per-sqrt-count scaled:
    # update_z computes b*sqrt(c) twice => a*c/s, identical to ours
    np.testing.assert_allclose(np.asarray(phi), inst.phi, rtol=1e-4, atol=1e-5)

    ref_H = inst.hessian(eta=eta_np, word_count=c, beta_doc_kv=beta_doc)
    L = inst.decompose_hessian(ref_H, approx=None)
    ref_bound = float(
        inst.lower_bound(L, mu=mu, word_count=c, beta_doc_kv=beta_doc, eta=eta_np)
    )
    np.testing.assert_allclose(float(bound), ref_bound, rtol=1e-4, atol=1e-3)

    ref_nu = inst.optimize_nu(L)
    np.testing.assert_allclose(np.asarray(nu), ref_nu, rtol=2e-2, atol=2e-3)


def test_eval_heldout_matches_reference(ref_modules):
    _, ref_heldout = ref_modules
    from strutopy_tpu.eval.heldout import eval_heldout

    rng = np.random.default_rng(42)
    K, V, N = 4, 30, 8
    beta = rng.dirichlet(np.ones(V), size=K)
    theta = rng.dirichlet(np.ones(K), size=N)
    docs = []
    for _ in range(N):
        words = rng.choice(V, size=10)
        u, ct = np.unique(words, return_counts=True)
        docs.append(list(zip(u.tolist(), ct.tolist())))
    ours = eval_heldout(docs, theta, beta)
    ref = ref_heldout.eval_heldout(docs, theta, beta)
    np.testing.assert_allclose(ours, ref, rtol=1e-10)


def test_frex_and_ecdf_match_reference(ref_modules):
    ref_stm, _ = ref_modules
    from strutopy_tpu.eval.diagnostics import ecdf, frex

    rng = np.random.default_rng(3)
    beta = rng.dirichlet(np.ones(40), size=5)

    inst = object.__new__(ref_stm.STM)
    inst.beta = beta
    ref_frex = inst.frex(w=0.5)
    np.testing.assert_allclose(frex(beta, w=0.5), ref_frex, rtol=1e-10)

    x = rng.normal(size=37)
    np.testing.assert_allclose(ecdf(x), inst.ecdf(x), rtol=1e-12)


def test_make_pd_matches_reference(ref_modules):
    ref_stm, _ = ref_modules
    import jax.numpy as jnp
    from strutopy_tpu.ops.linalg import make_pd

    rng = np.random.default_rng(9)
    M = rng.normal(size=(6, 6))
    M = 0.5 * (M + M.T)
    inst = object.__new__(ref_stm.STM)
    ref = inst.make_pd(M.copy())
    ours = np.asarray(make_pd(jnp.asarray(M)))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)
