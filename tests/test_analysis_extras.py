"""Plots, perplexity, topic graph, chunking — the long-tail surfaces."""

import numpy as np

from strutopy_tpu.eval.perplexity import perplexity
from strutopy_tpu.eval.graph import topic_correlations, topic_graph, plot_topic_graph
from strutopy_tpu.eval import plots
from strutopy_tpu.utils.chunk_it import chunk_it


def test_perplexity_prefers_true_model():
    rng = np.random.default_rng(0)
    K, V, N = 3, 50, 40
    beta = rng.dirichlet(np.ones(V), size=K)
    theta = rng.dirichlet(np.ones(K), size=N)
    docs = []
    for i in range(N):
        p = theta[i] @ beta
        draw = rng.multinomial(60, p)
        ids = np.nonzero(draw)[0]
        docs.append(list(zip(ids.tolist(), draw[ids].tolist())))
    ppl_true = perplexity(docs, theta, beta)
    ppl_rand = perplexity(
        docs, rng.dirichlet(np.ones(K), size=N), rng.dirichlet(np.ones(V), size=K)
    )
    assert 1.0 < ppl_true < ppl_rand


def test_topic_correlations_shape_and_diag():
    sigma = np.array([[2.0, 0.8], [0.8, 1.5]])
    corr = topic_correlations(sigma)
    assert corr.shape == (3, 3)
    np.testing.assert_allclose(np.diagonal(corr), 1.0)
    # centered-log-ratio expansion: full = A [[sigma,0],[0,0]] A^T with
    # A = I - (1/K) 1 1^T — compute the oracle directly
    K = 3
    pad = np.zeros((K, K))
    pad[:2, :2] = sigma
    A = np.eye(K) - np.full((K, K), 1.0 / K)
    full = A @ pad @ A.T
    d = np.sqrt(np.diagonal(full))
    np.testing.assert_allclose(corr, full / np.outer(d, d), atol=1e-12)
    # the pinned K-th topic must NOT be structurally uncorrelated (the
    # old zero-pad made it an always-isolated node in every graph)
    assert np.abs(corr[2, :2]).max() > 0.1


def test_topic_graph_edges():
    sigma = np.array([[1.0, 0.9], [0.9, 1.0]])
    adj, edges = topic_graph(sigma, cutoff=0.3)
    # topics 0/1 co-vary positively; both anti-correlate with the
    # pinned topic 2 under the centered expansion (no 0-2/1-2 edge)
    assert adj[0, 1] and not adj[0, 2] and not adj[1, 2]
    assert len(edges) == 1 and edges[0][:2] == (0, 1)


def test_topic_graph_huge_recovers_chain_structure():
    """R-stm topicCorr(method='huge') analogue: MB neighborhood
    selection with StARS recovers a planted chain graphical model —
    every chain edge present, false-positive edges rare — and the
    rank-based copula transform makes the result invariant to a
    monotone distortion of the margins."""
    from strutopy_tpu.eval.graph import topic_graph_huge

    rng = np.random.default_rng(0)
    K, n = 6, 600
    omega = np.eye(K)
    for i in range(K - 1):
        omega[i, i + 1] = omega[i + 1, i] = -0.45
    X = rng.multivariate_normal(np.zeros(K), np.linalg.inv(omega), size=n)

    res = topic_graph_huge(X, n_subsamples=8, seed=1)
    chain = {(i, i + 1) for i in range(K - 1)}
    got = set(res["edges"])
    assert chain <= got, f"missing chain edges: {chain - got}"
    assert len(got - chain) <= 2, f"too many spurious edges: {got - chain}"
    assert res["adjacency"].shape == (K, K)
    assert 0 < res["lambda"] <= res["lambdas"][0]

    # monotone marginal distortion (exp) leaves the copula graph intact
    res2 = topic_graph_huge(np.exp(X), n_subsamples=8, seed=1)
    assert chain <= set(res2["edges"])

    # R-stm posadj semantics: a negatively-associated pair is found by
    # MB selection (adjacency_raw) but masked out of the reported graph
    Y = rng.multivariate_normal(
        np.zeros(3), [[1, -0.8, 0], [-0.8, 1, 0], [0, 0, 1]], size=400
    )
    res3 = topic_graph_huge(Y, n_subsamples=8, seed=2)
    assert res3["adjacency_raw"][0, 1]
    assert not res3["adjacency"][0, 1]
    assert (0, 1) not in res3["edges"]

    # plot.topicCorr renders both methods; exactly one input required
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "huge.png")
        plot_topic_graph(graph=res, path=p)
        assert os.path.getsize(p) > 0
    with np.testing.assert_raises(ValueError):
        plot_topic_graph()


def test_stm_topic_corr_method(toy_corpus, toy_dictionary):
    """STM.topic_corr mirrors R-stm topicCorr's method switch on a
    fitted model: 'simple' thresholds the fitted sigma, 'huge' runs
    the copula MB/StARS graph on theta."""
    from strutopy_tpu.models.stm import STM

    m = STM(documents=toy_corpus.train_docs, dictionary=toy_dictionary,
            K=3, model_type="CTM", init_type="random", max_em_iter=3,
            seed=7)
    m.expectation_maximization(saving=False)

    adj, edges = m.topic_corr()
    assert adj.shape == (3, 3) and isinstance(edges, list)
    res = m.topic_corr(method="huge", n_subsamples=5)
    assert res["adjacency"].shape == (3, 3)
    with np.testing.assert_raises(ValueError):
        m.topic_corr(method="nope")


def test_plots_render(tmp_path):
    theta = np.random.default_rng(1).dirichlet(np.ones(3), size=10)
    plots.display_props(theta, path=str(tmp_path / "props.png"))
    plots.plot_convergence([-100, -50, -48], path=str(tmp_path / "conv.png"))
    plots.plot_heldout_by_k(
        {"STM": {10: -7.1, 20: -6.9}}, path=str(tmp_path / "hk.png")
    )
    plot_topic_graph(np.eye(2) + 0.5, path=str(tmp_path / "graph.png"))
    for f in ("props.png", "conv.png", "hk.png", "graph.png"):
        assert (tmp_path / f).stat().st_size > 0


def test_chunk_it():
    out = chunk_it(list(range(10)), 3)
    assert sum(len(c) for c in out) == 10
    assert [x for c in out for x in c] == list(range(10))


def test_content_effect_recovers_planted_contrast(tmp_path):
    """estimate_content_effect (round 3, reference README.md:44-45
    'topical content' estimates): a word planted to be hot in aspect 1
    must top the z-ranking, and rare words must carry large se."""
    import numpy as np

    from strutopy_tpu.eval.effects import (
        estimate_content_effect,
        plot_content_effect,
    )

    rng = np.random.default_rng(0)
    A, K, V, N = 2, 3, 40, 200
    base = rng.dirichlet(np.ones(V), size=K)  # (K, V)
    beta = np.stack([base, base.copy()])  # (A, K, V)
    beta[1, 0, 0] *= 8.0  # word 0 strongly favors aspect 1 in topic 0
    beta[1, 0, 1] /= 8.0  # word 1 favors aspect 0
    beta /= beta.sum(axis=-1, keepdims=True)

    theta = rng.dirichlet(np.ones(K), size=N)
    lengths = np.full(N, 200.0)
    aspect = rng.integers(0, A, N)
    vocab = [f"w{i}" for i in range(V)]

    eff = estimate_content_effect(
        beta, theta, lengths, aspect, aspects=(0, 1), n=5, vocab=vocab
    )
    assert eff["contrast"].shape == (K, V)
    top0 = eff["top"][0]
    assert top0["favoring_a1"][0][0] == "w0"
    assert top0["favoring_a0"][0][0] == "w1"
    assert top0["favoring_a1"][0][3] > 2.0  # decisive z
    # a topic with no planted contrast: no |z| should be extreme
    z1 = np.abs(eff["z"][1])
    assert z1.max() < np.abs(eff["z"][0]).max()

    p = tmp_path / "content_effect.png"
    plot_content_effect(eff, topic_pos=0, path=str(p))
    assert p.exists() and p.stat().st_size > 0


def test_check_beta_flags_degenerate_topics():
    from strutopy_tpu.eval.diagnostics import check_beta

    rng = np.random.default_rng(0)
    beta = rng.dirichlet(np.ones(20), size=4)
    res = check_beta(beta)
    assert res["ok"] and res["problem"] == []
    # plant a collapsed topic: all mass on word 7
    beta[2] = 0.0
    beta[2, 7] = 1.0
    res = check_beta(beta, vocab=[f"w{v}" for v in range(20)])
    assert not res["ok"]
    assert res["problem"] == [(0, 2, "w7", 1.0)]
    assert res["topic_totals"][2] == 1 and res["topic_totals"].sum() == 1
    # content-model (A, K, V) form reports the aspect index
    beta3 = np.stack([rng.dirichlet(np.ones(20), size=4), beta])
    res = check_beta(beta3)
    assert [p[:2] for p in res["problem"]] == [(1, 2)]


def test_plot_quote_renders(tmp_path):
    from strutopy_tpu.eval.plots import plot_quote

    fig = plot_quote("a short doc " * 30, path=str(tmp_path / "q1.png"))
    assert fig is not None and (tmp_path / "q1.png").stat().st_size > 0
    plot_quote(["first document text", "x" * 2000],
               maxlen=100, path=str(tmp_path / "q2.png"))
    assert (tmp_path / "q2.png").stat().st_size > 0
