"""Topic alignment across restarts (eval/align.py, R-stm multiSTM
analog) and findTopic/cloud/theta-hist surfaces."""

import numpy as np
import pytest

from strutopy_tpu.eval.align import (
    align_topics,
    plot_alignment,
    topic_dissimilarity,
)
from strutopy_tpu.eval.diagnostics import find_topic


def _random_beta(K=6, V=50, seed=0):
    rng = np.random.default_rng(seed)
    g = rng.gamma(0.2, 1.0, (K, V))
    return g / g.sum(axis=1, keepdims=True)


# ---------------------------------------------------------------- align


def test_permuted_copy_aligns_exactly():
    beta = _random_beta()
    rng = np.random.default_rng(1)
    perm = rng.permutation(beta.shape[0])
    out = align_topics([beta, beta[perm]], metric="js")
    # run 1's topic perm[i]... alignment must invert the permutation:
    # beta1[out_perm][i] == beta[i], i.e. out_perm == argsort-free inverse
    realigned = beta[perm][out["perms"][1]]
    np.testing.assert_allclose(realigned, beta, atol=0)
    assert np.all(out["matched"][1] < 1e-12)
    assert np.all(out["stability"] < 1e-12)
    # reference row is identity / zero by construction
    np.testing.assert_array_equal(out["perms"][0], np.arange(beta.shape[0]))
    assert np.all(out["matched"][0] == 0.0)


@pytest.mark.parametrize("metric", ["js", "l1", "cosine"])
def test_metrics_zero_diag_and_bounded(metric):
    beta = _random_beta(K=4, V=30, seed=2)
    D = topic_dissimilarity(beta, beta, metric=metric)
    assert np.all(np.abs(np.diag(D)) < 1e-10)
    assert np.all(D >= -1e-12)
    if metric == "js":
        assert np.all(D <= np.log(2) + 1e-9)
    if metric == "l1":
        assert np.all(D <= 1.0 + 1e-9)


def test_noisy_restarts_rank_stability():
    """A topic perturbed much harder than the others must come out
    least stable, and perturbed runs sit farther than the clean one."""
    beta = _random_beta(K=5, V=80, seed=3)
    rng = np.random.default_rng(4)
    runs = [beta]
    for _ in range(3):
        noisy = beta.copy()
        noisy += 0.02 * rng.gamma(0.2, 1.0, beta.shape) / beta.shape[1]
        noisy[2] = rng.dirichlet(np.full(beta.shape[1], 0.2))  # destroyed
        runs.append(noisy / noisy.sum(axis=1, keepdims=True))
    out = align_topics(runs, metric="js")
    assert np.argmax(out["stability"]) == 2
    assert out["run_distance"][0] == 0.0
    assert np.all(out["run_distance"][1:] > 0.0)


def test_align_validation_and_plot(tmp_path):
    beta = _random_beta(K=3, V=20)
    with pytest.raises(ValueError, match="at least two"):
        align_topics([beta])
    with pytest.raises(ValueError, match="vocab sizes differ"):
        topic_dissimilarity(beta, beta[:, :10])
    with pytest.raises(ValueError, match="unknown metric"):
        topic_dissimilarity(beta, beta, metric="euclid")
    out = align_topics([beta, beta], metric="l1")
    p = tmp_path / "align.png"
    plot_alignment(out, path=str(p))
    assert p.exists() and p.stat().st_size > 0


def test_content_beta_marginalizes():
    beta = _random_beta(K=4, V=30, seed=5)
    content = np.stack([beta, beta])  # (A=2, K, V), aspects identical
    out = align_topics([content, beta], metric="l1")
    assert np.all(out["matched"][1] < 1e-12)


# ------------------------------------------------------------ find_topic


def test_find_topic_prob_ranks_planted_words():
    beta = _random_beta(K=5, V=40, seed=6)
    vocab = [f"w{i}" for i in range(40)]
    beta = beta.copy()
    beta[3, [7, 11]] += 0.5          # topic 3 owns the query words
    beta /= beta.sum(axis=1, keepdims=True)
    out = find_topic(beta, ["w7", "w11"], vocab, n=3, weighting="prob")
    assert out["topics"][0] == 3
    assert out["scores"][0] > out["scores"][1]
    assert out["ranks"].shape == (3, 2)


def test_find_topic_lift_and_frex_and_errors():
    beta = _random_beta(K=4, V=30, seed=7)
    vocab = [f"w{i}" for i in range(30)]
    wcounts = np.arange(1, 31, dtype=float)
    for weighting in ("frex", "lift"):
        out = find_topic(beta, "w3", vocab, weighting=weighting,
                         wcounts=wcounts)
        assert len(out["topics"]) == 4
        assert np.all((out["scores"] > 0) & (out["scores"] <= 1.0))
    with pytest.raises(ValueError, match="not in vocab"):
        find_topic(beta, ["nope"], vocab)
    with pytest.raises(ValueError, match="needs wcounts"):
        find_topic(beta, "w3", vocab, weighting="lift")
    with pytest.raises(ValueError, match="unknown weighting"):
        find_topic(beta, "w3", vocab, weighting="score")
    with pytest.raises(ValueError, match="at least one word"):
        find_topic(beta, [], vocab)


# ------------------------------------------------------------ plots


def test_plot_cloud_and_theta_hist(tmp_path):
    from strutopy_tpu.eval.plots import plot_cloud, plot_theta_hist

    beta = _random_beta(K=2, V=60, seed=8)
    vocab = [f"word{i}" for i in range(60)]
    p = tmp_path / "cloud.png"
    plot_cloud(beta[0], vocab, max_words=40, path=str(p))
    assert p.exists() and p.stat().st_size > 0
    with pytest.raises(ValueError, match="no positive mass"):
        plot_cloud(np.zeros(10), vocab[:10])

    rng = np.random.default_rng(9)
    theta = rng.dirichlet(np.ones(5), size=40)
    p2 = tmp_path / "hist.png"
    plot_theta_hist(theta, path=str(p2))
    assert p2.exists() and p2.stat().st_size > 0


def test_stm_find_topic_and_align_on_fitted_models(toy_corpus):
    """End-to-end: two fitted restarts align, and STM.find_topic uses
    the model's own dictionary/wcounts."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from strutopy_tpu.eval.align import align_models
    from strutopy_tpu.models.stm import STM

    models = []
    for seed in (1, 2):
        m = STM(toy_corpus.documents, K=3, init_type="random",
                model_type="CTM", max_em_iter=2, seed=seed)
        m.expectation_maximization(saving=False)
        models.append(m)
    out = align_models(models, metric="l1")
    assert out["perms"].shape == (2, 3)
    assert out["run_distance"][0] == 0.0

    word = models[0].dictionary[int(np.argmax(models[0].beta[0]))]
    res = models[0].find_topic([word], n=2, weighting="lift")
    assert len(res["topics"]) == 2


def test_plot_topic_summary(tmp_path):
    from strutopy_tpu.eval.plots import plot_topic_summary

    rng = np.random.default_rng(10)
    beta = _random_beta(K=6, V=40, seed=10)
    theta = rng.dirichlet(np.ones(6), size=30)
    vocab = [f"w{i}" for i in range(40)]
    p = tmp_path / "summary.png"
    plot_topic_summary(theta, beta, vocab, path=str(p))
    assert p.exists() and p.stat().st_size > 0
    # subset + content beta
    plot_topic_summary(theta, np.stack([beta, beta]), vocab,
                       topics=[0, 2], path=str(p))
