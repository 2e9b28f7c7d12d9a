"""FREX / labels / thoughts / coherence / exclusivity tests.

The reference has NO tests for these (SURVEY.md §4 lists them as
untested gaps); ecdf/frex are checked against scipy.stats.rankdata —
the exact machinery the reference uses (stm.py:1257-1259)."""

import numpy as np
import scipy.special
import scipy.stats

from strutopy_tpu.eval import diagnostics
from strutopy_tpu.corpus.bow import Vocabulary


def test_ecdf_matches_scipy_rankdata():
    rng = np.random.default_rng(0)
    x = rng.normal(size=50)
    x[5] = x[10]  # force a tie
    expected = scipy.stats.rankdata(x, method="max") / x.size
    np.testing.assert_allclose(diagnostics.ecdf(x), expected)


def test_frex_matches_reference_formula():
    rng = np.random.default_rng(1)
    beta = rng.dirichlet(np.ones(30), size=4)
    w = 0.5
    got = diagnostics.frex(beta, w=w)

    logbeta = np.log(beta)
    log_excl = logbeta - scipy.special.logsumexp(logbeta, axis=0)
    excl_ecdf = np.apply_along_axis(
        lambda a: scipy.stats.rankdata(a, method="max") / a.size, 1, log_excl
    )
    freq_ecdf = np.apply_along_axis(
        lambda a: scipy.stats.rankdata(a, method="max") / a.size, 1, logbeta
    )
    expected = 1.0 / (w / excl_ecdf + (1 - w) / freq_ecdf)
    np.testing.assert_allclose(got, expected)


def test_label_topics():
    rng = np.random.default_rng(2)
    beta = rng.dirichlet(np.ones(20), size=3)
    vocab = Vocabulary([f"w{i}" for i in range(20)])
    prob, fx = diagnostics.label_topics(beta, vocab, n=5)
    assert len(prob) == 3 and len(fx) == 3
    assert all(len(p) == 5 for p in prob)
    # highest-prob labels really are the argmax words
    assert prob[0][0] == f"w{np.argmax(beta[0])}"


def test_find_thoughts():
    theta = np.array([[0.9, 0.1], [0.2, 0.8], [0.6, 0.4], [0.1, 0.9]])
    idx = diagnostics.find_thoughts(theta, topics=[0], n=2)
    np.testing.assert_array_equal(idx, [0, 2])
    res = diagnostics.find_thoughts(theta, topics=[0, 1], n=2, threshold=0.85)
    np.testing.assert_array_equal(res[0], [0])
    np.testing.assert_array_equal(res[1], [3])


def test_exclusivity_range():
    rng = np.random.default_rng(3)
    beta = rng.dirichlet(np.ones(50), size=4)
    ex = diagnostics.exclusivity(beta, M=10, w=0.7)
    assert ex.shape == (4,)
    assert np.all(ex > 0) and np.all(ex <= 10.0)


def test_semantic_coherence():
    # a topic whose top words always co-occur scores higher than one
    # whose top words never do
    docs_co = [[(0, 1), (1, 1)]] * 10 + [[(2, 1)], [(3, 1)]] * 5
    beta = np.array(
        [
            [0.45, 0.45, 0.05, 0.05],  # words 0,1 co-occur everywhere
            [0.05, 0.05, 0.45, 0.45],  # words 2,3 never co-occur
        ]
    )
    scores = diagnostics.semantic_coherence(beta, docs_co, M=2)
    assert scores[0] > scores[1]


def test_sage_labels_per_aspect():
    """sage_labels (round 3): per-aspect top words must reflect planted
    aspect-specific boosts that the marginal labels average away."""
    import numpy as np

    from strutopy_tpu.eval.diagnostics import sage_labels
    from strutopy_tpu.ops.mstep import build_kappa_design

    rng = np.random.default_rng(0)
    A, K, V = 2, 3, 30
    base = rng.dirichlet(np.ones(V), size=K)
    beta = np.stack([base, base.copy()])
    beta[1, :, 0] *= 50.0  # word 0 is an aspect-1 marker in every topic
    beta /= beta.sum(axis=-1, keepdims=True)
    vocab = [f"w{i}" for i in range(V)]

    out = sage_labels(beta, vocab, n=5)
    assert len(out["marginal"]) == K
    assert len(out["by_aspect"]) == A and len(out["by_aspect"][1]) == K
    # w0 tops every aspect-1 topic list
    for k in range(K):
        assert "w0" in out["by_aspect"][1][k]

    # kappa aspect block: aspect-1 column loads on w0
    Xd = build_kappa_design(K, A, True)
    kappa = np.zeros((Xd.shape[1], V))
    kappa[K + 1, 0] = 3.0  # aspect-1 indicator coefficient for w0
    out2 = sage_labels(beta, vocab, kappa=kappa, kappa_design=Xd, n=3)
    assert out2["kappa_aspect"][1][0] == "w0"


def test_topic_quality_combines_both_metrics(tmp_path):
    docs = [[(0, 1), (1, 1)]] * 10 + [[(2, 1)], [(3, 1)]] * 5
    beta = np.array(
        [
            [0.45, 0.45, 0.05, 0.05],
            [0.05, 0.05, 0.45, 0.45],
        ]
    )
    q = diagnostics.topic_quality(beta, docs, M=2)
    np.testing.assert_array_equal(
        q["semantic_coherence"], diagnostics.semantic_coherence(beta, docs, M=2)
    )
    np.testing.assert_array_equal(
        q["exclusivity"], diagnostics.exclusivity(beta, M=2, w=0.7)
    )
    # content-model (A, K, V) beta marginalizes aspects
    q3 = diagnostics.topic_quality(np.stack([beta, beta]), docs, M=2)
    np.testing.assert_allclose(
        q3["semantic_coherence"], q["semantic_coherence"]
    )
    # plot renders and saves
    out = tmp_path / "tq.png"
    theta = np.full((4, 2), 0.5)
    fig = diagnostics.plot_topic_quality(beta, docs, M=2, path=str(out),
                                         theta=theta)
    assert out.exists() and out.stat().st_size > 0
    import matplotlib.pyplot as plt

    plt.close(fig)
