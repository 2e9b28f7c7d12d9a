"""DGP tests mirroring the reference tests/test_generate_docs.py."""

import numpy as np

from strutopy_tpu.dgp.corpus_creation import CorpusCreation


def test_corpus_length(toy_corpus):
    assert len(toy_corpus.documents) == 50


def test_theta_shape(toy_corpus):
    assert toy_corpus.theta.shape == (50, 3)


def test_theta_rows_sum_to_one(toy_corpus):
    np.testing.assert_allclose(toy_corpus.theta.sum(axis=1), 1.0, atol=1e-6)


def test_beta_shape(toy_corpus):
    assert toy_corpus.beta.shape == (3, 200)


def test_documents_are_bow(toy_corpus):
    for doc in toy_corpus.documents:
        assert isinstance(doc, list)
        for item in doc:
            assert isinstance(item, tuple) and len(item) == 2
            assert isinstance(item[0], (int, np.integer))
            assert isinstance(item[1], (int, np.integer))


def test_train_test_split_sizes(toy_corpus):
    assert len(toy_corpus.train_docs) == 40
    assert len(toy_corpus.test_docs) == 10


def test_lda_dgp():
    c = CorpusCreation(
        n_topics=4, n_docs=20, n_words=30, V=100, level=1, dgp="LDA", seed=7
    )
    c.generate_documents()
    assert len(c.documents) == 20
    np.testing.assert_allclose(c.theta.sum(axis=1), 1.0, atol=1e-8)


def test_treatment_modes():
    c = CorpusCreation(
        n_topics=3, n_docs=10, n_words=20, V=50, level=1, dgp="LDA",
        treatment=True, alpha_treatment="auto-linear", seed=3,
    )
    np.testing.assert_allclose(c.alpha_treatment, np.flip(c.alpha))
    c.generate_documents()
    assert len(c.documents) == 10


def test_infrequent_term_removal_compacts_vocab(toy_corpus):
    ids = {w for doc in toy_corpus.documents for (w, _) in doc}
    assert ids == set(range(toy_corpus.V))
