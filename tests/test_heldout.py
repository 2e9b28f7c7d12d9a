"""Heldout-likelihood tests mirroring reference tests/test_heldout.py,
plus parity between the host float64 and device implementations."""

import numpy as np
import jax.numpy as jnp

from strutopy_tpu.corpus.bow import pad_corpus
from strutopy_tpu.eval.heldout import cut_in_half, eval_heldout, eval_heldout_jax, split_corpus


def _random_setup(seed=99, K=3, V=20, N=5):
    rng = np.random.default_rng(seed)
    beta = rng.dirichlet(np.ones(V), size=K)
    theta = rng.dirichlet(np.ones(K), size=N)
    docs = []
    for _ in range(N):
        words = rng.choice(V, size=10)
        unique, counts = np.unique(words, return_counts=True)
        docs.append(list(zip(unique.tolist(), counts.tolist())))
    return docs, theta, beta


def test_eval_heldout_finite_negative():
    docs, theta, beta = _random_setup()
    result = eval_heldout(docs, theta, beta)
    assert np.isfinite(result)
    assert result < 0


def test_eval_heldout_jax_matches_host():
    docs, theta, beta = _random_setup(seed=123, V=50, N=8)
    host = eval_heldout(docs, theta, beta)
    corpus = pad_corpus(docs, V=50)
    dev = float(
        eval_heldout_jax(
            jnp.asarray(corpus.words),
            jnp.asarray(corpus.counts),
            jnp.asarray(corpus.doc_ok),
            jnp.asarray(theta, jnp.float32),
            jnp.asarray(beta, jnp.float32),
        )
    )
    np.testing.assert_allclose(dev, host, rtol=1e-5)


def test_cut_in_half_splits_correctly():
    docs = [
        [(0, 1), (1, 2), (2, 3), (3, 4)],
        [(4, 1), (5, 2), (6, 3)],
    ]
    first, second = cut_in_half(docs)
    assert list(first[0]) == [(0, 1), (2, 3)]
    assert list(first[1]) == [(4, 1), (6, 3)]
    assert list(second[0]) == [(1, 2), (3, 4)]
    assert list(second[1]) == [(5, 2)]


def test_split_corpus():
    docs = [[(i, 1)] for i in range(10)]
    out = split_corpus(docs, proportion=0.8)
    assert len(out["train"]) == 8
    assert len(out["test"]) == 2
    assert len(out["test_1"]) == 2
    out2 = split_corpus(docs, proportion=0.8, validation_set=True)
    assert len(out2["test"]) == 1 and len(out2["validate"]) == 1


def test_eval_heldout_jax_rejects_oov_word_ids():
    """jnp.take clamps out-of-range ids; the wrapper must raise like the
    numpy parity anchor instead of silently scoring wrong rows."""
    import pytest
    from strutopy_tpu.eval.heldout import eval_heldout_jax

    theta = np.full((2, 3), 1 / 3)
    beta = np.full((3, 5), 0.2)
    words = np.array([[0, 6], [1, 2]])  # 6 >= V=5
    counts = np.ones((2, 2))
    with pytest.raises(ValueError, match="word id 6"):
        eval_heldout_jax(words, counts, np.ones(2, bool), theta, beta)
