"""Length bucketing: plan correctness and bucketed-vs-single equivalence."""

import numpy as np
import pytest
import jax

from strutopy_tpu.corpus.bow import pad_corpus
from strutopy_tpu.corpus.bucketing import make_bucket_plan, split_corpus_by_plan
from strutopy_tpu.models.stm import STM
from strutopy_tpu.parallel.mesh import make_mesh


def _skewed_docs(n=120, seed=0):
    """Corpus with strongly skewed doc lengths (unique terms 5..300)."""
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(n):
        n_terms = int(rng.choice([5, 20, 60, 250], p=[0.4, 0.3, 0.2, 0.1]))
        ids = rng.choice(400, size=n_terms, replace=False)
        docs.append([(int(w), int(rng.integers(1, 4))) for w in sorted(ids)])
    return docs


def test_bucket_plan_partitions_all_docs():
    docs = _skewed_docs()
    corpus = pad_corpus(docs)
    plan = make_bucket_plan(corpus, batch_size=32, n_devices=1)
    all_ids = np.concatenate(plan.doc_ids)
    assert sorted(all_ids.tolist()) == list(range(len(docs)))
    assert plan.n_buckets >= 2  # skewed corpus should split
    # every doc fits its bucket's L
    lens = (corpus.counts > 0).sum(axis=1)
    for ids, L in zip(plan.doc_ids, plan.Ls):
        assert lens[ids].max() <= L
    # padded area strictly better than single-bucket padding
    single = plan.n_storage * max(plan.Ls)
    assert plan.padded_area() < single


def test_storage_index_roundtrip_multidevice():
    docs = _skewed_docs()
    corpus = pad_corpus(docs)
    plan = make_bucket_plan(corpus, batch_size=16, n_devices=4)
    # indices are unique and within range
    idx = plan.storage_index[: corpus.N]
    assert len(set(idx.tolist())) == corpus.N
    assert idx.max() < plan.n_storage
    # every bucket's size divides evenly across devices
    for s, B in zip(plan.sizes, plan.batch_sizes):
        assert s % (4 * B) == 0
    # storage rows reconstruct the original docs: check via split corpora
    buckets = split_corpus_by_plan(corpus, plan)
    shard = plan.n_storage // 4
    flat_words = {}
    off_local = 0
    for b, bucket in enumerate(buckets):
        per_dev = bucket.N // 4
        for r in range(bucket.N):
            d, j = divmod(r, per_dev)
            flat_words[d * shard + off_local + j] = (b, r)
        off_local += per_dev
    for i in range(corpus.N):
        b, r = flat_words[idx[i]]
        got = buckets[b]
        mask = got.counts[r] > 0
        doc = list(zip(got.words[r, mask].tolist(), got.counts[r, mask].astype(int).tolist()))
        assert doc == docs[i]


def test_bucketed_fit_matches_single_bucket(toy_corpus, toy_dictionary, toy_metadata):
    """auto_bucket on/off must produce the same fit (toy corpus is short
    so both use one bucket; the skewed corpus exercises >1)."""
    docs = _skewed_docs(n=96, seed=3)
    X = np.random.default_rng(1).integers(0, 2, 96)

    def fit(auto_bucket):
        m = STM(
            documents=docs,
            K=4,
            X=X,
            max_em_iter=3,
            init_type="random",
            model_type="STM",
            seed=123456,
        )
        if not auto_bucket:
            # rebuild with bucketing disabled
            from strutopy_tpu.models.config import STMConfig

            m = STM(
                documents=docs, K=4, X=X, max_em_iter=3,
                init_type="random", model_type="STM", seed=123456,
                config=STMConfig(
                    K=4, model_type="STM", init_type="random",
                    max_em_iter=3, seed=123456, auto_bucket=False,
                ),
            )
        m.expectation_maximization(saving=False)
        return m

    m_b = fit(True)
    m_s = fit(False)
    assert m_b._plan.n_buckets > 1
    assert m_s._plan.n_buckets == 1
    np.testing.assert_allclose(m_b.last_bounds, m_s.last_bounds, rtol=2e-4)
    np.testing.assert_allclose(m_b.beta, m_s.beta, atol=2e-4)
    np.testing.assert_allclose(m_b.theta, m_s.theta, atol=2e-3)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual devices")
def test_bucketed_fit_on_mesh():
    docs = _skewed_docs(n=96, seed=5)
    X = np.random.default_rng(2).integers(0, 2, 96)
    mesh = make_mesh(4)
    m1 = STM(documents=docs, K=4, X=X, max_em_iter=3, init_type="random",
             model_type="STM", seed=123456)
    m1.expectation_maximization(saving=False)
    m4 = STM(documents=docs, K=4, X=X, max_em_iter=3, init_type="random",
             model_type="STM", seed=123456, mesh=mesh)
    m4.expectation_maximization(saving=False)
    assert m4._plan.n_buckets > 1
    np.testing.assert_allclose(m4.last_bounds, m1.last_bounds, rtol=5e-4)
    np.testing.assert_allclose(m4.theta, m1.theta, atol=5e-3)
