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
    assert abs(corr[0, 1] - 0.8 / np.sqrt(2.0 * 1.5)) < 1e-12


def test_topic_graph_edges():
    sigma = np.array([[1.0, 0.9], [0.9, 1.0]])
    adj, edges = topic_graph(sigma, cutoff=0.5)
    assert adj[0, 1] and not adj[0, 2]
    assert len(edges) == 1 and edges[0][:2] == (0, 1)


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
