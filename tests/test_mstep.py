"""M-step updates validated against sklearn (the reference's engine)."""

import numpy as np
import pytest
import jax.numpy as jnp
import sklearn.linear_model

from strutopy_tpu.ops import mstep

pytestmark = pytest.mark.smoke


def _moments(D, eta):
    return mstep.EtaMoments(
        Dt_eta=jnp.asarray(D.T @ eta, jnp.float32),
        eta_sum=jnp.asarray(eta.sum(axis=0), jnp.float32),
    )


def _design(D):
    return mstep.PrevalenceDesign(
        DtD=jnp.asarray(D.T @ D, jnp.float32),
        pen_mask=jnp.asarray(np.r_[0.0, np.ones(D.shape[1] - 1)], jnp.float32),
        n_docs=jnp.asarray(float(D.shape[0]), jnp.float32),
    )


@pytest.fixture
def reg_data():
    rng = np.random.default_rng(0)
    N, P, K = 200, 3, 4
    X = rng.normal(size=(N, P))
    W = rng.normal(size=(P, K - 1))
    eta = X @ W + 0.1 * rng.normal(size=(N, K - 1)) + 0.5
    D = np.c_[np.ones(N), X]
    return D, X, eta


def test_ols_matches_sklearn(reg_data):
    D, X, eta = reg_data
    gamma, _ = mstep.update_prevalence(_moments(D, eta), _design(D), "STM", "ols")
    ref = sklearn.linear_model.LinearRegression(fit_intercept=True).fit(X, eta)
    np.testing.assert_allclose(np.asarray(gamma)[:, 0], ref.intercept_, rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gamma)[:, 1:], ref.coef_, rtol=5e-3, atol=1e-3)


def test_ridge_matches_sklearn(reg_data):
    D, X, eta = reg_data
    gamma, _ = mstep.update_prevalence(
        _moments(D, eta), _design(D), "STM", "ridge", ridge_alpha=0.1
    )
    ref = sklearn.linear_model.Ridge(alpha=0.1, fit_intercept=True).fit(X, eta)
    np.testing.assert_allclose(np.asarray(gamma)[:, 0], ref.intercept_, rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gamma)[:, 1:], ref.coef_, rtol=5e-3, atol=1e-3)


def test_lasso_matches_sklearn(reg_data):
    D, X, eta = reg_data
    gamma, _ = mstep.update_prevalence(
        _moments(D, eta), _design(D), "STM", "lasso", lasso_alpha=0.05
    )
    ref = sklearn.linear_model.Lasso(alpha=0.05, fit_intercept=True).fit(X, eta)
    np.testing.assert_allclose(np.asarray(gamma)[:, 1:], ref.coef_, rtol=1e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gamma)[:, 0], ref.intercept_, rtol=1e-2, atol=2e-3)


def test_ctm_mu_is_column_mean(reg_data):
    D, _, eta = reg_data
    gamma, mu_mean = mstep.update_prevalence(_moments(D, eta), _design(D), "CTM", "ols")
    np.testing.assert_allclose(np.asarray(mu_mean), eta.mean(axis=0), rtol=1e-4, atol=1e-5)
    assert np.asarray(gamma).sum() == 0.0


def test_update_sigma_matches_direct(reg_data):
    D, X, eta = reg_data
    N = D.shape[0]
    design = _design(D)
    mom = _moments(D, eta)
    gamma, _ = mstep.update_prevalence(mom, design, "STM", "ols")
    mu = D @ np.asarray(gamma, np.float64).T
    nu_sum = np.eye(eta.shape[1]) * 3.0
    resid = mstep.residual_moment(
        jnp.asarray(eta, jnp.float32), jnp.asarray(mu, jnp.float32)
    )
    sig = mstep.update_sigma(
        resid, jnp.asarray(nu_sum, jnp.float32), design.n_docs, 0.0
    )
    expected = ((eta - mu).T @ (eta - mu) + nu_sum) / N
    np.testing.assert_allclose(np.asarray(sig), expected, rtol=2e-3, atol=2e-4)

    # shrinkage
    sig2 = mstep.update_sigma(
        resid, jnp.asarray(nu_sum, jnp.float32), design.n_docs, 0.3
    )
    expected2 = np.diag(np.diag(expected)) * 0.3 + 0.7 * expected
    np.testing.assert_allclose(np.asarray(sig2), expected2, rtol=2e-3, atol=2e-4)


def test_update_beta_lda():
    ss = jnp.asarray([[1.0, 3.0], [0.0, 0.0]], jnp.float32)
    beta = mstep.update_beta_lda(ss)
    np.testing.assert_allclose(np.asarray(beta), [[0.25, 0.75], [0.0, 0.0]])


def test_kappa_design_shapes():
    X = mstep.build_kappa_design(3, 2, True)
    assert X.shape == (6, 3 + 2 + 6)
    # each row: one topic, one aspect, one interaction indicator
    np.testing.assert_allclose(X.sum(axis=1), 3.0)
    X1 = mstep.build_kappa_design(4, 1, False)
    np.testing.assert_allclose(X1, np.eye(4))


def test_poisson_regression_matches_sklearn():
    rng = np.random.default_rng(5)
    K, A = 3, 2
    Xd = mstep.build_kappa_design(K, A, True)
    n = Xd.shape[0]
    w_true = rng.normal(0, 0.5, Xd.shape[1])
    offset = rng.normal(0, 0.2, n)
    m_v = -2.0
    lam = np.exp(m_v + offset + Xd @ w_true)
    y = rng.poisson(lam * 50) / 50.0

    from strutopy_tpu.ops.mstep import _poisson_newton_word

    w = _poisson_newton_word(
        jnp.asarray(y, jnp.float32),
        jnp.asarray(m_v, jnp.float32),
        jnp.asarray(Xd, jnp.float32),
        jnp.asarray(offset, jnp.float32),
        jnp.asarray(1.0, jnp.float32),
        jnp.asarray(float(n), jnp.float32),
        60,
    )
    # sklearn PoissonRegressor has no offset support; emulate via sample
    # weights identity trick is messy — instead verify the optimality
    # condition of our objective directly: gradient ~ 0.
    z = m_v + offset + Xd @ np.asarray(w, np.float64)
    g = Xd.T @ (np.exp(z) - y) / n + 1.0 * np.asarray(w, np.float64)
    assert np.abs(g).max() < 1e-4

    # and against sklearn in the no-offset case
    clf = sklearn.linear_model.PoissonRegressor(
        fit_intercept=False, alpha=1.0, tol=1e-8, max_iter=10000
    )
    clf.fit(Xd, y)
    w2 = _poisson_newton_word(
        jnp.asarray(y, jnp.float32),
        jnp.asarray(0.0, jnp.float32),
        jnp.asarray(Xd, jnp.float32),
        jnp.zeros(n, jnp.float32),
        jnp.asarray(1.0, jnp.float32),
        jnp.asarray(float(n), jnp.float32),
        60,
    )
    np.testing.assert_allclose(np.asarray(w2), clf.coef_, atol=5e-3)


def test_update_beta_content_shapes_and_simplex():
    rng = np.random.default_rng(6)
    K, A, V = 3, 2, 50
    beta_ss = jnp.asarray(rng.gamma(1.0, 1.0, (A, K, V)), jnp.float32)
    wcounts = jnp.asarray(rng.integers(1, 100, V), jnp.float32)
    Xd = mstep.build_kappa_design(K, A, True)
    beta, kappa = mstep.update_beta_content(
        beta_ss, wcounts, jnp.asarray(Xd, jnp.float32), alpha=250.0, iters=30,
    )
    assert beta.shape == (A, K, V)
    assert kappa.shape == (Xd.shape[1], V)
    np.testing.assert_allclose(np.asarray(beta).sum(axis=-1), 1.0, atol=1e-4)
    assert np.all(np.asarray(beta) >= 0)


@pytest.mark.parametrize("offset,tol", [(10.0, 1e-3), (50.0, 1e-2), (200.0, 1e-2)])
def test_ols_ill_conditioned_matches_sklearn(offset, tol):
    """f64 host-precomputed solve operator (VERDICT r1 #9): designs with
    wildly different column scales (kappa(DtD) 1e6..1e13) must still
    predict like sklearn.  The old on-device float32 pinv gives ~1e-2
    relative prediction error already at kappa ~ 1e6 and O(1) beyond."""
    rng = np.random.default_rng(1)
    N, K = 400, 4
    x = rng.normal(offset, 1.0, N)  # offset -> near-collinear with intercept
    X = np.c_[x, x**2 / offset]
    W = np.array([[0.5, -0.2, 0.1], [0.01, 0.02, -0.01]])
    eta = X @ W + 0.1 * rng.normal(size=(N, K - 1))
    doc_ok = np.ones(N, bool)
    D, design = mstep.make_prevalence_design(X, doc_ok)
    moments = _moments(D.astype(np.float64), eta)  # f32 moments, as on device
    gamma, _ = mstep.update_prevalence(moments, design, "STM", "ols")
    ref = sklearn.linear_model.LinearRegression(fit_intercept=True).fit(X, eta)
    pred_ours = np.c_[np.ones(N), X] @ np.asarray(gamma, np.float64).T
    pred_ref = ref.predict(X)
    # compare predictions (coefs are non-identifiable at this conditioning)
    scale = np.abs(pred_ref).max()
    assert np.abs(pred_ours - pred_ref).max() / scale < tol


def test_ridge_precomputed_alpha_guard(reg_data):
    """inv_ridge bakes in its alpha; a different runtime alpha must fall
    back to the on-device solve, not silently use the wrong operator."""
    D, X, eta = reg_data
    _, design = mstep.make_prevalence_design(X, np.ones(len(X), bool),
                                             ridge_alpha=0.1)
    gamma, _ = mstep.update_prevalence(
        _moments(D, eta), design, "STM", "ridge", ridge_alpha=5.0
    )
    ref = sklearn.linear_model.Ridge(alpha=5.0, fit_intercept=True).fit(X, eta)
    np.testing.assert_allclose(np.asarray(gamma)[:, 1:], ref.coef_,
                               rtol=5e-3, atol=1e-3)


def test_kappa_ftol_rel_skip_preserves_solution():
    """Delta-magnitude convergence skip (VERDICT r4 #5): ftol_rel
    freezes words whose accepted Newton step improves the objective by
    less than the relative threshold.  ftol_rel=0 must be bit-identical
    to the default exit; a noise-floor-scale threshold must reach the
    same beta to solver tolerance."""
    rng = np.random.default_rng(9)
    K, A, V = 3, 2, 50
    beta_ss = jnp.asarray(rng.gamma(1.0, 1.0, (A, K, V)), jnp.float32)
    wcounts = jnp.asarray(rng.integers(1, 100, V), jnp.float32)
    Xd = jnp.asarray(mstep.build_kappa_design(K, A, True), jnp.float32)

    beta0, kappa0 = mstep.update_beta_content(
        beta_ss, wcounts, Xd, alpha=250.0, iters=30)
    beta_z, kappa_z = mstep.update_beta_content(
        beta_ss, wcounts, Xd, alpha=250.0, iters=30, ftol_rel=0.0)
    np.testing.assert_array_equal(np.asarray(beta0), np.asarray(beta_z))
    np.testing.assert_array_equal(np.asarray(kappa0), np.asarray(kappa_z))

    beta_f, _ = mstep.update_beta_content(
        beta_ss, wcounts, Xd, alpha=250.0, iters=30, ftol_rel=1e-6)
    np.testing.assert_allclose(
        np.asarray(beta_f), np.asarray(beta0), atol=2e-4)
