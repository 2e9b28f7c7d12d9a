"""Multinomial dispersion diagnostic (eval/residuals.py).

The statistic's calibration anchor: on documents sampled EXACTLY from
Multinomial(m, theta @ beta), Pearson dispersion must be ~1; a
misspecified model (unigram on multi-topic data) must be clearly
overdispersed.  R-stm calls this checkResiduals (Taddy 2012); the
reference has no counterpart.
"""

import numpy as np
import pytest

from strutopy_tpu.eval.residuals import check_residuals


def _multinomial_corpus(rng, theta, beta, m):
    P = theta @ beta
    docs = []
    for i in range(P.shape[0]):
        x = rng.multinomial(m, P[i])
        ids = np.nonzero(x)[0]
        docs.append([(int(w), int(x[w])) for w in ids])
    return docs


@pytest.fixture(scope="module")
def calibrated():
    rng = np.random.default_rng(0)
    K, V, N, m = 5, 300, 400, 80
    beta = rng.dirichlet(np.full(V, 0.05), size=K)
    theta = rng.dirichlet(np.full(K, 0.5), size=N)
    docs = _multinomial_corpus(rng, theta, beta, m)
    return docs, theta, beta


def test_true_model_dispersion_near_one(calibrated):
    docs, theta, beta = calibrated
    r = check_residuals(docs, theta, beta)
    assert 0.9 < r["dispersion"] < 1.1
    assert r["df"] > 1000
    assert r["n_docs"] == 400


def test_true_model_dispersion_stable_in_tol(calibrated):
    docs, theta, beta = calibrated
    for tol in (0.001, 0.1, 0.5):
        r = check_residuals(docs, theta, beta, tol=tol)
        assert 0.85 < r["dispersion"] < 1.15, (tol, r)


def test_misspecified_unigram_is_overdispersed(calibrated):
    docs, theta, beta = calibrated
    tot = np.zeros(beta.shape[1])
    for d in docs:
        for w, c in d:
            tot[w] += c
    beta1 = (tot / tot.sum())[None, :]
    theta1 = np.ones((len(docs), 1))
    r = check_residuals(docs, theta1, beta1)
    assert r["dispersion"] > 1.3  # clearly above the true model's ~1


def test_content_model_beta_with_aspects(calibrated):
    # two aspects with different betas; docs sampled per-aspect must be
    # calibrated only when scored against their own aspect's beta
    rng = np.random.default_rng(1)
    K, V, N, m = 4, 250, 300, 60
    beta = rng.dirichlet(np.full(V, 0.05), size=(2, K))
    theta = rng.dirichlet(np.full(K, 0.5), size=N)
    aspect = rng.integers(0, 2, size=N)
    docs = []
    for i in range(N):
        x = rng.multinomial(m, theta[i] @ beta[aspect[i]])
        ids = np.nonzero(x)[0]
        docs.append([(int(w), int(x[w])) for w in ids])
    r = check_residuals(docs, theta, beta, aspect=aspect)
    assert 0.85 < r["dispersion"] < 1.15
    # scoring every doc against aspect 0 alone is misspecified
    r_wrong = check_residuals(docs, theta, beta[0])
    assert r_wrong["dispersion"] > r["dispersion"] * 1.2


def test_input_validation(calibrated):
    docs, theta, beta = calibrated
    with pytest.raises(ValueError, match="aspect"):
        check_residuals(docs, theta, np.stack([beta, beta]))
    with pytest.raises(ValueError, match="aspect"):
        check_residuals(docs, theta, beta, aspect=np.zeros(len(docs), int))
    with pytest.raises(ValueError, match="rows"):
        check_residuals(docs, theta[:10], beta)
