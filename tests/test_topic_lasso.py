"""topicLasso (eval/predict.py) vs sklearn oracles + recovery."""

import numpy as np
import pytest

from strutopy_tpu.eval.predict import (
    _cd_gaussian,
    _fista_binomial,
    plot_topic_lasso,
    topic_lasso,
)


def _theta(N=300, K=8, seed=0):
    rng = np.random.default_rng(seed)
    return rng.dirichlet(np.ones(K) * 0.5, size=N), rng


def test_cd_gaussian_matches_sklearn_lasso():
    from sklearn.linear_model import Lasso

    rng = np.random.default_rng(1)
    N, P = 200, 10
    X = rng.normal(size=(N, P))
    X = (X - X.mean(0)) / X.std(0)
    y = X[:, 0] * 0.8 - X[:, 3] * 0.5 + 0.1 * rng.normal(size=N)
    yc = y - y.mean()
    for lam in (0.01, 0.1, 0.3):
        b = _cd_gaussian(X, yc, lam, np.ones(P), np.zeros(P))
        ref = Lasso(alpha=lam, fit_intercept=True, tol=1e-12,
                    max_iter=100000).fit(X, y)
        np.testing.assert_allclose(b, ref.coef_, atol=1e-6)


def test_fista_binomial_matches_sklearn_logistic_l1():
    from sklearn.linear_model import LogisticRegression

    rng = np.random.default_rng(2)
    N, P = 400, 6
    X = rng.normal(size=(N, P))
    X = (X - X.mean(0)) / X.std(0)
    y = (X[:, 1] - X[:, 4] + 0.5 * rng.normal(size=N) > 0).astype(float)
    lam = 0.02
    b, c = _fista_binomial(X, y, lam, np.ones(P), np.zeros(P), 0.0,
                           n_iter=50000, tol=1e-15)
    # saga objective: C*sum(logloss) + ||w||_1 with an UNPENALIZED
    # intercept == ours with C = 1/(N*lam)  (liblinear would penalize
    # the intercept and land at a different optimum)
    ref = LogisticRegression(
        penalty="l1", C=1.0 / (N * lam), solver="saga", tol=1e-10,
        max_iter=200000, fit_intercept=True,
    ).fit(X, y)
    np.testing.assert_allclose(b, ref.coef_[0], atol=1e-5)
    np.testing.assert_allclose(c, ref.intercept_[0], atol=1e-5)


def test_topic_lasso_recovers_planted_topics():
    theta, rng = _theta(N=500, K=8, seed=3)
    y = 3.0 * theta[:, 2] - 2.5 * theta[:, 5] + 0.05 * rng.normal(size=500)
    res = topic_lasso(theta, y, nlambda=40, nfolds=5, seed=0)
    sel = set(res["selected_topics"])
    assert "topic 2" in sel and "topic 5" in sel
    # the path starts all-zero at lambda_max
    assert np.all(res["coef_path"][0] == 0.0)
    # signs at lambda_min are right
    tc = res["lambda_min"]["topic_coef"]
    assert tc[2] > 0 and tc[5] < 0
    # cv machinery is coherent
    assert res["lambda_1se"]["lambda"] >= res["lambda_min"]["lambda"]
    assert res["cv_mean"].shape == (40,) and np.all(res["cv_se"] >= 0)


def test_topic_lasso_unpenalized_covariates_absorb_confounder():
    theta, rng = _theta(N=500, K=6, seed=4)
    z = rng.normal(size=500)  # confounder drives y, correlates topic 0
    theta = theta.copy()
    # tilt topic 0 with z, renormalize
    theta[:, 0] = np.clip(theta[:, 0] + 0.1 * (z > 0), 1e-4, None)
    theta /= theta.sum(1, keepdims=True)
    y = 2.0 * z + 0.05 * rng.normal(size=500)
    with_cov = topic_lasso(theta, y, covariates=z, nlambda=30, nfolds=5)
    no_cov = topic_lasso(theta, y, nlambda=30, nfolds=5)
    # without the covariate the lasso is fooled into topic 0; with it,
    # z (unpenalized) absorbs the signal and topic 0 drops out
    # (compare at lambda_min: the conservative 1se rule may select
    # nothing at all in the no-covariate fit, which is also fine)
    assert "topic 0" in set(no_cov["lambda_min"]["selected"])
    assert "topic 0" not in set(with_cov["lambda_min"]["selected"])
    # the unpenalized coefficient is live at every lambda (incl. max)
    assert abs(with_cov["coef_path"][0, 0]) > 0.5


def test_topic_lasso_binomial_family():
    theta, rng = _theta(N=600, K=5, seed=5)
    logit = 8.0 * (theta[:, 1] - theta[:, 3])
    y = (rng.uniform(size=600) < 1 / (1 + np.exp(-logit))).astype(float)
    res = topic_lasso(theta, y, family="binomial", nlambda=25, nfolds=4)
    sel = set(res["lambda_min"]["selected"])
    assert "topic 1" in sel and "topic 3" in sel
    tc = res["lambda_min"]["topic_coef"]
    assert tc[1] > 0 and tc[3] < 0


def test_topic_lasso_validation_and_plot(tmp_path):
    theta, rng = _theta(N=100, K=4, seed=6)
    y = rng.normal(size=100)
    with pytest.raises(ValueError, match="family"):
        topic_lasso(theta, y, family="poisson")
    with pytest.raises(ValueError, match="0/1"):
        topic_lasso(theta, y, family="binomial")
    with pytest.raises(ValueError, match="entries"):
        topic_lasso(theta, y[:50])
    with pytest.raises(ValueError, match="topic_names"):
        topic_lasso(theta, y, topic_names=["a"])
    res = topic_lasso(theta, y, nlambda=15, nfolds=3,
                      topic_names=[f"T{k}" for k in range(4)])
    assert set(res["selected_topics"]) <= {"T0", "T1", "T2", "T3"}
    plot_topic_lasso(res, path=str(tmp_path / "tl.png"))
    assert (tmp_path / "tl.png").stat().st_size > 0
