"""Edge-case hardening: tiny/degenerate corpora, K=2, empty docs."""

import numpy as np
import pytest

from strutopy_tpu.models.stm import STM
from strutopy_tpu.corpus.bow import pad_corpus


def test_k2_minimum_topics():
    docs = [[(i % 7, 1), ((i + 3) % 7, 2)] for i in range(20)]
    m = STM(documents=docs, K=2, max_em_iter=2, init_type="random",
            model_type="CTM")
    m.expectation_maximization(saving=False)
    assert m.sigma.shape == (1, 1)
    assert np.isfinite(m.last_bounds).all()
    np.testing.assert_allclose(m.theta.sum(axis=1), 1.0, atol=1e-4)


def test_corpus_with_empty_documents():
    docs = [[(0, 2), (1, 1)], [], [(2, 3)], [], [(1, 1), (3, 2)]]
    m = STM(documents=docs, K=3, max_em_iter=2, init_type="random",
            model_type="CTM")
    m.expectation_maximization(saving=False)
    assert np.isfinite(m.last_bounds).all()
    # empty docs keep prior-uniform theta rows and contribute nothing
    assert m.theta.shape[0] == 5


def test_single_word_documents():
    docs = [[(i % 5, 1)] for i in range(16)]
    m = STM(documents=docs, K=3, max_em_iter=2, init_type="random",
            model_type="CTM")
    m.expectation_maximization(saving=False)
    assert np.isfinite(m.last_bounds).all()


def test_tiny_corpus_fewer_docs_than_batch():
    docs = [[(0, 1), (1, 2)], [(2, 1)], [(1, 1), (3, 1)]]
    m = STM(documents=docs, K=2, max_em_iter=1, init_type="random",
            model_type="CTM", batch_size=4096)
    m.expectation_maximization(saving=False)
    assert np.isfinite(m.last_bounds).all()


def test_heavily_repeated_counts():
    docs = [[(0, 10_000), (1, 1)], [(1, 5_000), (2, 2)]]
    m = STM(documents=docs, K=2, max_em_iter=2, init_type="random",
            model_type="CTM")
    m.expectation_maximization(saving=False)
    assert np.isfinite(m.last_bounds).all()


def test_config_json_roundtrip():
    from strutopy_tpu.models.config import STMConfig

    cfg = STMConfig(K=7, mode="ridge", content=True, A=3,
                    kappa_interactions=True, lda_beta=False)
    cfg2 = STMConfig.from_json(cfg.to_json())
    assert cfg == cfg2


def test_spectral_with_duplicate_heavy_vocab():
    # spectral init on a corpus whose vocab is tiny relative to maxV
    rng = np.random.default_rng(0)
    docs = []
    for _ in range(40):
        ids = rng.choice(12, size=6, replace=False)
        docs.append([(int(w), int(rng.integers(1, 3))) for w in sorted(ids)])
    m = STM(documents=docs, K=3, max_em_iter=1, init_type="spectral",
            model_type="CTM")
    m.expectation_maximization(saving=False)
    assert np.isfinite(m.last_bounds).all()


def test_empty_docs_get_their_own_state_rows():
    """Regression: empty docs must not alias another document's
    posterior (they get prior-uniform theta, not doc 0's)."""
    docs = [[(0, 5), (1, 1)], [], [(2, 3), (3, 4)]]
    m = STM(documents=docs, K=3, max_em_iter=2, init_type="random",
            model_type="CTM")
    m.expectation_maximization(saving=False)
    theta = m.theta
    assert not np.allclose(theta[1], theta[0])
    assert not np.allclose(theta[1], theta[2])
    # empty doc: eta stays at its (zero) start -> near-uniform theta
    np.testing.assert_allclose(theta[1], 1.0 / 3, atol=0.05)


def test_non_front_packed_padded_corpus_keeps_tokens():
    """Regression: bucketing must not drop tokens of user-built
    PaddedCorpus rows whose nonzeros are not front-packed."""
    L = 256
    words = np.zeros((3, L), np.int32)
    counts = np.zeros((3, L), np.float32)
    # doc 0: tokens at the very end of the padded row
    words[0, 250:255] = np.arange(5)
    counts[0, 250:255] = 2.0
    words[1, :3] = [5, 6, 7]
    counts[1, :3] = 1.0
    words[2, :2] = [1, 2]
    counts[2, :2] = 3.0
    from strutopy_tpu.corpus.bow import PaddedCorpus
    from strutopy_tpu.corpus.bucketing import make_bucket_plan, split_corpus_by_plan

    pc = PaddedCorpus(words=words, counts=counts,
                      doc_ok=np.ones(3, bool), V=10)
    plan = make_bucket_plan(pc, batch_size=8)
    buckets = split_corpus_by_plan(pc, plan)
    total_in = counts.sum()
    total_out = sum(b.counts.sum() for b in buckets)
    assert total_in == total_out


def test_masked_doc_with_nonzero_counts_is_inert():
    """Regression: doc_ok=False rows with leftover counts must behave
    exactly like padding (uniform theta, no stat contributions)."""
    from strutopy_tpu.corpus.bow import PaddedCorpus

    words = np.zeros((4, 128), np.int32)
    counts = np.zeros((4, 128), np.float32)
    words[0, :3] = [0, 1, 2]; counts[0, :3] = 2
    words[1, :2] = [3, 4]; counts[1, :2] = 1
    words[2, :50] = np.arange(50); counts[2, :50] = 5  # masked, counts set
    words[3, :2] = [1, 5]; counts[3, :2] = 3
    pc = PaddedCorpus(words=words, counts=counts,
                      doc_ok=np.array([True, True, False, True]), V=60)
    m = STM(documents=pc, K=3, max_em_iter=2, init_type="random",
            model_type="CTM")
    m.expectation_maximization(saving=False)
    np.testing.assert_allclose(m.theta[2], 1.0 / 3, atol=0.05)
    assert not np.allclose(m.theta[2], m.theta[0])


def test_json_array_with_leading_whitespace(tmp_path):
    import json as _json

    from strutopy_tpu.corpus.acquire import load_texts_json

    p = tmp_path / "a.json"
    p.write_text("\n  " + _json.dumps([{"text": "x"}, {"text": "y"}], indent=2))
    texts, _ = load_texts_json(str(p))
    assert texts == ["x", "y"]


def test_small_vocab_plots(tmp_path):
    from strutopy_tpu.corpus.bow import Vocabulary
    from strutopy_tpu.eval.plots import plot_topic_words, plot_word_frequencies

    rng = np.random.default_rng(0)
    beta = rng.dirichlet(np.ones(8), size=3)  # V=8 < default n
    vocab = Vocabulary([f"w{i}" for i in range(8)])
    docs = [[(int(i), 1) for i in range(5)]]
    plot_topic_words(beta, vocab, path=str(tmp_path / "a.png"))
    plot_word_frequencies(docs, vocab, path=str(tmp_path / "b.png"))
    assert (tmp_path / "a.png").stat().st_size > 0


def test_content_model_three_aspects_recovers_markers():
    """A=3 content model (the reference hardcodes A=2,
    /root/reference/src/modules/stm.py:749-766): per-aspect marker
    words planted in a 3-aspect corpus must end up with higher beta
    mass in their OWN aspect than in the other two."""
    rng = np.random.default_rng(5)
    V, K, n = 90, 2, 120
    aspect = rng.integers(0, 3, n)
    markers = {a: range(60 + 10 * a, 70 + 10 * a) for a in range(3)}
    docs = []
    for i in range(n):
        p = np.full(V, 1.0)
        p[list(markers[int(aspect[i])])] += 20.0
        p /= p.sum()
        x = rng.multinomial(60, p)
        ids = np.nonzero(x)[0]
        docs.append([(int(w), int(x[w])) for w in ids])
    m = STM(documents=docs, K=K, content=True, A=3, beta_index=aspect,
            model_type="CTM", init_type="random", max_em_iter=6,
            batch_size=8)
    m.expectation_maximization(saving=False)
    assert np.isfinite(m.last_bounds).all()
    beta = m.beta  # (3, K, V)
    assert beta.shape == (3, K, V)
    for a in range(3):
        own = beta[a][:, list(markers[a])].sum()
        others = [beta[b][:, list(markers[a])].sum() for b in range(3) if b != a]
        assert own > max(others), (a, own, others)
    # the aspect-aware residual path runs on a real fitted model
    r = m.check_residuals()
    assert r["dispersion"] > 0
    # sage labels cover all three aspects
    labels = m.sage_labels(n=4)
    assert len(labels) == 3
