"""E-step math validation against a float64 NumPy/SciPy oracle.

The oracle re-derives the reference's objective/Hessian/bound/phi
contract (reference src/modules/stm.py:920-944, :986-1026, :1068-1118)
in float64 — with the gradient's missing e^eta scaling fixed (see
PARITY_NOTES.md) — and checks the batched TPU-native Newton solver
reaches the same optimum as scipy's line-searched BFGS.
"""

import numpy as np
import pytest
import scipy.optimize
import scipy.special

pytestmark = pytest.mark.smoke

import jax
import jax.numpy as jnp

from strutopy_tpu.ops.estep import NewtonConfig, _doc_estep, _f_g_H
from strutopy_tpu.ops.linalg import precompute_sigma


def _oracle_f(eta, c, beta_doc, mu, siginv):
    K = beta_doc.shape[0]
    eta_full = np.append(eta, 0.0)
    Nd = c.sum()
    s = np.exp(eta_full) @ beta_doc
    diff = eta - mu
    return (
        0.5 * diff @ siginv @ diff
        - (c @ np.log(s) - Nd * scipy.special.logsumexp(eta_full))
    )


def _oracle_grad(eta, c, beta_doc, mu, siginv):
    eta_full = np.append(eta, 0.0)
    Nd = c.sum()
    e = np.exp(eta_full)
    a = e[:, None] * beta_doc
    s = a.sum(axis=0)
    theta = e / e.sum()
    g_full = Nd * theta - (a / s) @ c
    return siginv @ (eta - mu) + g_full[:-1]


def _oracle_hess(eta, c, beta_doc, mu, siginv):
    K = beta_doc.shape[0]
    eta_full = np.append(eta, 0.0)
    Nd = c.sum()
    e = np.exp(eta_full)
    a = e[:, None] * beta_doc
    s = a.sum(axis=0)
    phi_hat = a / s
    theta = e / e.sum()
    B = phi_hat * np.sqrt(c)
    q = phi_hat @ c
    H = B @ B.T - Nd * np.outer(theta, theta) + np.diag(Nd * theta - q)
    return H[: K - 1, : K - 1] + siginv


def _random_doc(rng, K=5, L=12, V=40):
    words = rng.choice(V, size=L, replace=False).astype(np.int32)
    counts = rng.integers(1, 6, size=L).astype(np.float64)
    beta = rng.dirichlet(np.ones(V), size=K)
    beta_doc = beta[:, words]
    mu = rng.normal(0, 0.5, K - 1)
    sigma = np.diag(np.full(K - 1, 2.0)) + 0.3
    siginv = np.linalg.inv(sigma)
    return counts, beta_doc, mu, sigma, siginv


def test_gradient_matches_finite_difference():
    rng = np.random.default_rng(0)
    c, beta_doc, mu, _, siginv = _random_doc(rng)
    eta = rng.normal(0, 0.5, len(mu))
    g = _oracle_grad(eta, c, beta_doc, mu, siginv)
    g_fd = scipy.optimize.approx_fprime(
        eta, _oracle_f, 1e-7, c, beta_doc, mu, siginv
    )
    np.testing.assert_allclose(g, g_fd, rtol=1e-4, atol=1e-6)


def test_hessian_matches_finite_difference():
    rng = np.random.default_rng(1)
    c, beta_doc, mu, _, siginv = _random_doc(rng)
    eta = rng.normal(0, 0.3, len(mu))
    H = _oracle_hess(eta, c, beta_doc, mu, siginv)
    for i in range(len(eta)):
        def gi(x):
            return _oracle_grad(x, c, beta_doc, mu, siginv)[i]
        row_fd = scipy.optimize.approx_fprime(eta, gi, 1e-6)
        np.testing.assert_allclose(H[i], row_fd, rtol=1e-3, atol=1e-5)


def test_jax_f_g_H_matches_oracle():
    rng = np.random.default_rng(2)
    c, beta_doc, mu, _, siginv = _random_doc(rng)
    eta = rng.normal(0, 0.4, len(mu))
    f, g, H, theta, _ = _f_g_H(
        jnp.asarray(eta, jnp.float32),
        jnp.asarray(beta_doc, jnp.float32),
        jnp.asarray(c, jnp.float32),
        jnp.asarray(mu, jnp.float32),
        jnp.asarray(siginv, jnp.float32),
        jnp.asarray(c.sum(), jnp.float32),
    )
    np.testing.assert_allclose(float(f), _oracle_f(eta, c, beta_doc, mu, siginv), rtol=5e-5)
    np.testing.assert_allclose(np.asarray(g), _oracle_grad(eta, c, beta_doc, mu, siginv), rtol=1e-3, atol=2e-4)
    # Hessian entries scale with Nd; float32 assembly tolerance is absolute
    np.testing.assert_allclose(np.asarray(H), _oracle_hess(eta, c, beta_doc, mu, siginv), rtol=2e-3, atol=2e-2)
    e = np.exp(np.append(eta, 0.0))
    np.testing.assert_allclose(np.asarray(theta), e / e.sum(), rtol=1e-5)


def test_newton_reaches_bfgs_optimum():
    """Our fixed-shape Newton must match scipy's converged optimum."""
    rng = np.random.default_rng(3)
    for trial in range(5):
        c, beta_doc, mu, sigma, siginv = _random_doc(rng, K=6, L=15, V=60)
        res = scipy.optimize.minimize(
            _oracle_f,
            np.zeros(len(mu)),
            args=(c, beta_doc, mu, siginv),
            jac=_oracle_grad,
            method="BFGS",
            options={"gtol": 1e-8},
        )
        sig_ent = float(np.log(np.diag(np.linalg.cholesky(sigma))).sum())
        eta, theta, nu, bound, phi, iters = _doc_estep(
            jnp.asarray(beta_doc, jnp.float32),
            jnp.asarray(c, jnp.float32),
            jnp.asarray(mu, jnp.float32),
            jnp.zeros(len(mu), jnp.float32),
            jnp.asarray(1.0, jnp.float32),
            jnp.asarray(siginv, jnp.float32),
            jnp.asarray(sig_ent, jnp.float32),
            NewtonConfig(),
        )
        f_ours = _oracle_f(np.asarray(eta, np.float64), c, beta_doc, mu, siginv)
        # must reach the same optimum value; eta may wander along flat
        # directions at float32 resolution
        assert f_ours <= res.fun + 1e-4, (trial, f_ours, res.fun)
        np.testing.assert_allclose(np.asarray(eta), res.x, atol=2e-2)

        # nu is the inverse of the (PD) Hessian at our converged eta
        eta_np = np.asarray(eta, np.float64)
        H = _oracle_hess(eta_np, c, beta_doc, mu, siginv)
        np.testing.assert_allclose(np.asarray(nu), np.linalg.inv(H), rtol=5e-2, atol=5e-3)

        # bound matches the reference lower_bound formula (stm.py:1068-1101)
        eta_full = np.append(eta_np, 0.0)
        e = np.exp(eta_full)
        th = e / e.sum()
        L = np.linalg.cholesky(H)
        diff = eta_np - mu
        expected = (
            c @ np.log(th @ (beta_doc * e[:, None]))
            - np.log(np.diag(L)).sum()
            - 0.5 * diff @ siginv @ diff
            - np.log(np.diag(np.linalg.cholesky(sigma))).sum()
        )
        np.testing.assert_allclose(float(bound), expected, rtol=2e-3, atol=2e-2)

        # phi: expected token-topic counts, columns sum to the word counts
        np.testing.assert_allclose(np.asarray(phi).sum(axis=0), c, rtol=1e-4)


def test_dummy_doc_contributes_zero():
    """Padding documents must not pollute sufficient statistics."""
    K, L = 4, 8
    beta_doc = jnp.full((K, L), 0.01, jnp.float32)
    counts = jnp.zeros((L,), jnp.float32)
    mu = jnp.zeros((K - 1,), jnp.float32)
    sigma = 2.0 * jnp.eye(K - 1, dtype=jnp.float32)
    siginv, sigent = precompute_sigma(sigma)
    eta, theta, nu, bound, phi, _ = _doc_estep(
        beta_doc, counts, mu, mu, jnp.asarray(0.0, jnp.float32),
        siginv, sigent, NewtonConfig(),
    )
    assert float(jnp.abs(nu).sum()) == 0.0
    assert float(bound) == 0.0
    assert float(jnp.abs(phi).sum()) == 0.0


def test_ns_inverse_matches_cholesky_inverse():
    """nu_method="ns" (Newton-Schulz, MXU-only) must reproduce the
    Cholesky inverse of the repaired Hessian to ~1e-4."""
    import jax
    import jax.numpy as jnp

    from strutopy_tpu.ops import estep as es
    from strutopy_tpu.ops.linalg import cho_inverse

    rng = np.random.default_rng(3)
    B, K = 16, 40
    A = rng.normal(size=(B, K, 3 * K))
    H = jnp.asarray(A @ np.transpose(A, (0, 2, 1)) / (3 * K)
                    + 0.1 * np.eye(K), jnp.float32)
    L = es._chol_pd_batched(H)
    nu_chol = jax.vmap(cho_inverse)(L)
    H_pd = jnp.einsum("bij,bkj->bik", L, L)
    nu_ns = es._ns_inverse(H_pd)
    scale = np.abs(np.asarray(nu_chol)).max()
    assert np.abs(np.asarray(nu_ns) - np.asarray(nu_chol)).max() / scale < 2e-4


def test_likelihood_temper_shrinks_toward_prior():
    """likelihood_temper < 1 (VERDICT r4 #3): the Newton search solves
    the TEMPERED objective quad + temper*(-loglik) — verified against a
    scipy BFGS solve of that exact objective — so eta lands strictly
    closer to the prior mean in the siginv metric, while the finalize
    pass still evaluates the TRUE model at the tempered optimum."""
    rng = np.random.default_rng(11)
    c, beta_doc, mu, sigma, siginv = _random_doc(rng, K=6, L=15, V=60)
    sig_ent = float(np.log(np.diag(np.linalg.cholesky(sigma))).sum())

    def solve(temper):
        return _doc_estep(
            jnp.asarray(beta_doc, jnp.float32),
            jnp.asarray(c, jnp.float32),
            jnp.asarray(mu, jnp.float32),
            jnp.zeros(len(mu), jnp.float32),
            jnp.asarray(1.0, jnp.float32),
            jnp.asarray(siginv, jnp.float32),
            jnp.asarray(sig_ent, jnp.float32),
            NewtonConfig(likelihood_temper=temper),
        )

    eta1, _, _, bound1, phi1, _ = solve(1.0)
    eta5, _, _, bound5, phi5, _ = solve(0.5)

    # tempered optimum == BFGS optimum of the tempered objective
    # (objective is linear in counts, so tempering == scaling counts)
    res = scipy.optimize.minimize(
        _oracle_f, np.zeros(len(mu)), args=(0.5 * c, beta_doc, mu, siginv),
        jac=_oracle_grad, method="BFGS", options={"gtol": 1e-8},
    )
    np.testing.assert_allclose(np.asarray(eta5), res.x, atol=2e-2)

    # strict shrinkage toward mu in the prior metric
    def prior_dist(eta):
        d = np.asarray(eta, np.float64) - mu
        return d @ siginv @ d
    assert prior_dist(eta5) < prior_dist(eta1)

    # the finalize pass evaluates the TRUE model (real counts): phi
    # columns still sum to the actual word counts under tempering
    np.testing.assert_allclose(np.asarray(phi5).sum(axis=0), c, rtol=1e-4)

    # temper=1.0 is the exact MAP path (same optimum as before)
    res1 = scipy.optimize.minimize(
        _oracle_f, np.zeros(len(mu)), args=(c, beta_doc, mu, siginv),
        jac=_oracle_grad, method="BFGS", options={"gtol": 1e-8},
    )
    np.testing.assert_allclose(np.asarray(eta1), res1.x, atol=2e-2)
