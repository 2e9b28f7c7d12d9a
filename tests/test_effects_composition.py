"""Method-of-composition effect estimation (R-stm estimateEffect with
uncertainty="Global"): theta draws from each document's variational
posterior N(eta_d, nu_d), per-draw OLS, Rubin's-rules combination.

The sampler recomputes the per-doc Hessian at the converged eta (the
fit only retains sum_d nu_d); the draw covariance is checked here
against a direct inverse of the same Hessian, which pins the
L^{-T} z triangular-solve parameterization.
"""

import numpy as np
import pytest

from strutopy_tpu.eval.effects import (
    estimate_effect,
    estimate_effect_composition,
    simulate_theta,
)
from strutopy_tpu.models.stm import STM


@pytest.fixture(scope="module")
def fitted_model(toy_corpus, toy_dictionary, toy_metadata):
    train = toy_corpus.train_docs
    model = STM(
        documents=train, dictionary=toy_dictionary, K=3,
        X=toy_metadata[: len(train)], max_em_iter=4,
        init_type="random", model_type="STM", seed=11,
    )
    model.expectation_maximization(saving=False)
    return model


def test_eta_draw_covariance_matches_posterior_nu(fitted_model):
    """Empirical covariance of the eta draws for one document must match
    nu_d = H_d^{-1} computed independently (direct np.linalg.inv of the
    same Hessian the E-step finalize uses)."""
    import jax.numpy as jnp

    from strutopy_tpu.ops.estep import _f_g_H_batched

    model = fitted_model
    corpus = model._corpus
    # pick the longest doc (best-conditioned Hessian)
    d = int(np.argmax((corpus.counts > 0).sum(axis=1)))

    beta = np.asarray(model.beta, np.float32)
    eta_d = np.asarray(model.eta[d], np.float32)
    mu_d = np.asarray(model.mu[d], np.float32)
    siginv = np.linalg.inv(np.asarray(model.sigma, np.float64)).astype(
        np.float32
    )
    beta_doc = beta[:, corpus.words[d]][None]
    counts = corpus.counts[d][None].astype(np.float32)
    _f, _g, H, _t, _p = _f_g_H_batched(
        jnp.asarray(eta_d[None]), jnp.asarray(beta_doc), jnp.asarray(counts),
        jnp.asarray(mu_d[None]), jnp.asarray(siginv),
        jnp.asarray(counts.sum(axis=1)), bf16=False,
    )
    nu = np.linalg.inv(np.asarray(H[0], np.float64))

    S = 6000
    draws = simulate_theta(model, n_draws=S, seed=3, chunk=16,
                           return_eta=True)
    x = np.asarray(draws[:, d, :], np.float64)
    emp_mean = x.mean(axis=0)
    emp_cov = np.cov(x.T)

    # mean error ~ sqrt(nu_ii / S); cov entry error ~ sqrt(2/S)*scale
    sd = np.sqrt(np.diag(nu))
    np.testing.assert_allclose(emp_mean, eta_d, atol=float(5 * sd.max() / np.sqrt(S)))
    scale = float(np.abs(nu).max())
    np.testing.assert_allclose(emp_cov, nu, atol=0.1 * scale)


def test_composition_widens_ols_uncertainty(fitted_model):
    model = fitted_model
    ols = estimate_effect(model.theta, model.X)
    comp = estimate_effect_composition(model, n_draws=20, seed=0, chunk=16)

    assert comp["topics"] == ols["topics"]
    assert comp["coef"].shape == ols["coef"].shape
    # posterior draws jitter theta, so composition coefs stay near the
    # OLS point estimates but cannot be tighter than them
    assert np.all(np.abs(comp["coef"] - ols["coef"]) < 5 * ols["se"] + 0.05)
    assert np.all(comp["between"] > 0)
    assert comp["se"].mean() > ols["se"].mean()
    assert np.all(comp["ci"][..., 0] <= comp["coef"])
    assert np.all(comp["ci"][..., 1] >= comp["coef"])


def test_composition_requires_covariates(toy_corpus, toy_dictionary):
    train = toy_corpus.train_docs
    model = STM(
        documents=train, dictionary=toy_dictionary, K=3,
        max_em_iter=2, init_type="random", model_type="CTM", seed=1,
    )
    model.expectation_maximization(saving=False)
    with pytest.raises(ValueError, match="without covariates"):
        estimate_effect_composition(model, n_draws=2)
    # explicit D works even for a CTM fit
    rng = np.random.default_rng(0)
    out = estimate_effect_composition(
        model, D=rng.integers(0, 2, len(train)), n_draws=3, chunk=16
    )
    assert np.all(np.isfinite(out["coef"]))


def test_simulate_theta_content_model(toy_corpus, toy_dictionary,
                                      toy_metadata):
    """The (A, K, V) per-aspect beta path: draws are valid simplex rows."""
    train = toy_corpus.train_docs
    rng = np.random.default_rng(5)
    aspects = rng.integers(0, 2, len(train))
    model = STM(
        documents=train, dictionary=toy_dictionary, K=3,
        X=toy_metadata[: len(train)], max_em_iter=2,
        init_type="random", model_type="STM", seed=7,
        content=True, beta_index=aspects,
    )
    model.expectation_maximization(saving=False)
    thetas = simulate_theta(model, n_draws=3, seed=0, chunk=16)
    assert thetas.shape == (3, len(train), 3)
    assert np.all(np.isfinite(thetas))
    np.testing.assert_allclose(thetas.sum(axis=-1), 1.0, atol=1e-5)


def test_composition_on_streamed_fit(toy_corpus, toy_dictionary,
                                     toy_metadata):
    """A streamed (stream_parts>1) fit exposes the same full eta/mu
    state as an in-memory fit (models/stm.py re-concatenates part
    states), so composition effects must work and agree."""
    train = toy_corpus.train_docs
    kwargs = dict(
        documents=train, dictionary=toy_dictionary, K=3,
        X=toy_metadata[: len(train)], max_em_iter=3,
        init_type="random", model_type="STM", seed=11,
    )
    m1 = STM(**kwargs)
    m1.expectation_maximization(saving=False)
    ms = STM(**kwargs, stream_parts=2)
    ms.expectation_maximization(saving=False)

    c1 = estimate_effect_composition(m1, n_draws=5, seed=0, chunk=16)
    cs = estimate_effect_composition(ms, n_draws=5, seed=0, chunk=16)
    # same draws seed + float32-identical fits: coefs agree tightly
    np.testing.assert_allclose(cs["coef"], c1["coef"], atol=5e-3)
    np.testing.assert_allclose(cs["se"], c1["se"], atol=5e-3)


def test_composition_drops_empty_documents(toy_corpus, toy_dictionary,
                                           toy_metadata):
    """Empty docs' theta draws are pure prior noise; regressing them
    against real covariate rows would bias coefficients toward zero."""
    docs = list(toy_corpus.train_docs)
    docs[2] = []  # make one doc empty (keeps X row count aligned)
    model = STM(
        documents=docs, dictionary=toy_dictionary, K=3,
        X=toy_metadata[: len(docs)], max_em_iter=2,
        init_type="random", model_type="STM", seed=5,
    )
    model.expectation_maximization(saving=False)
    out = estimate_effect_composition(model, n_draws=3, chunk=16)
    assert np.all(np.isfinite(out["coef"]))
    # the OLS ran over n_real = N - 1 rows: reproduce it directly from
    # the same draws restricted to real docs
    thetas = simulate_theta(model, n_draws=3, seed=0, chunk=16)
    ok = model._corpus.doc_ok
    D = np.c_[np.ones(ok.sum()), np.asarray(toy_metadata[: len(docs)],
                                            np.float64)[ok]]
    b0, _ = __import__(
        "strutopy_tpu.eval.effects", fromlist=["_ols_fit"]
    )._ols_fit(np.asarray(thetas[0][ok], np.float64), D, out["topics"])
    assert b0.shape == out["coef"].shape
