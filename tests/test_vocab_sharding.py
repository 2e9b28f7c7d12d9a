"""Vocabulary-sharded EM: 2-D (docs, vocab) mesh must match 1 device.

SURVEY.md §2.5's "V-sharding for large K×V": beta/beta_ss shard their
vocab dimension over the VOCAB mesh axis (per-chip K*V memory drops by
the vocab mesh size), the E-step assembles per-chunk beta_doc blocks
with one vocab-axis psum, and the M-step beta row sums psum over the
vocab axis.  Runs on the 8 virtual CPU devices forced in conftest.py.
"""

import numpy as np
import pytest
import jax

from strutopy_tpu.models.stm import STM
from strutopy_tpu.parallel.mesh import VOCAB_AXIS, make_mesh_2d

needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _padded_dictionary(toy_dictionary):
    """Vocab mesh axes need V % n_vocab_shards == 0; pad the dictionary
    to a multiple of 8 (shared by both fits so comparisons are exact)."""
    words = list(toy_dictionary)
    while len(words) % 8:
        words.append(f"__pad_{len(words)}")
    return words


def _fit_kwargs(toy_corpus, toy_dictionary, toy_metadata):
    train_docs = toy_corpus.train_docs
    return dict(
        documents=train_docs,
        dictionary=_padded_dictionary(toy_dictionary),
        K=3,
        X=toy_metadata[: len(train_docs)],
        max_em_iter=3,
        init_type="random",
        model_type="STM",
        seed=123456,
    )


@needs8
@pytest.mark.parametrize("n_docs,n_vocab", [(2, 4), (4, 2)])
def test_vocab_sharded_matches_single_device(
    toy_corpus, toy_dictionary, toy_metadata, n_docs, n_vocab
):
    kwargs = _fit_kwargs(toy_corpus, toy_dictionary, toy_metadata)
    m1 = STM(**kwargs)
    m1.expectation_maximization(saving=False)

    mesh = make_mesh_2d(n_docs, n_vocab)
    assert mesh.shape[VOCAB_AXIS] == n_vocab
    mv = STM(**kwargs, mesh=mesh)
    # beta must actually be sharded over the vocab axis
    beta_sharding = mv._state.beta.sharding
    assert beta_sharding.spec[-1] == VOCAB_AXIS
    mv.expectation_maximization(saving=False)

    np.testing.assert_allclose(
        np.asarray(mv.last_bounds), np.asarray(m1.last_bounds), rtol=2e-4
    )
    np.testing.assert_allclose(mv.beta, m1.beta, atol=2e-4)
    np.testing.assert_allclose(mv.sigma, m1.sigma, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(mv.theta, m1.theta, atol=2e-3)


@needs8
def test_vocab_sharded_with_smoothing(toy_corpus, toy_dictionary, toy_metadata):
    """beta_smoothing adds per-cell pseudocounts; the vocab-psummed row
    sums must still normalize rows to exactly 1 across shards."""
    kwargs = _fit_kwargs(toy_corpus, toy_dictionary, toy_metadata)
    kwargs["max_em_iter"] = 2
    m1 = STM(**kwargs, beta_smoothing=0.05)
    m1.expectation_maximization(saving=False)
    mv = STM(**kwargs, beta_smoothing=0.05, mesh=make_mesh_2d(2, 4))
    mv.expectation_maximization(saving=False)
    np.testing.assert_allclose(mv.beta.sum(axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(mv.beta, m1.beta, atol=2e-4)


@needs8
def test_vocab_sharded_two_pass(toy_corpus, toy_dictionary, toy_metadata):
    """Two-pass straggler schedule under a vocab-sharded mesh: the
    pass-1/2 gathers psum over the vocab axis per chunk, the argsort
    straggler selection replicates across vocab shards (eta is
    replicated), and results must still match the single-device fit."""
    from strutopy_tpu.models.config import STMConfig

    kwargs = _fit_kwargs(toy_corpus, toy_dictionary, toy_metadata)
    cfg = STMConfig(
        K=3, model_type="STM", init_type="random", max_em_iter=3,
        newton_pass1_iters=5, newton_straggler_frac=1.0,
        newton_warmup_iters=0,
    )
    m1 = STM(**kwargs)
    m1.expectation_maximization(saving=False)
    mv = STM(**{k: v for k, v in kwargs.items()
               if k in ("documents", "dictionary", "X")},
             config=cfg, mesh=make_mesh_2d(2, 4))
    mv.expectation_maximization(saving=False)
    np.testing.assert_allclose(
        np.asarray(mv.last_bounds), np.asarray(m1.last_bounds), rtol=2e-4
    )
    np.testing.assert_allclose(mv.beta, m1.beta, atol=2e-4)


@needs8
def test_vocab_sharded_multi_bucket(toy_metadata):
    """Regression: on a 2-D mesh the bucket plan must be sized by the
    DOC-axis extent, not the total device count — otherwise P(docs)
    state shards are not bucket-contiguous and eta/mu rows silently
    pair with the wrong documents (theta diverged by 0.42 before the
    fix)."""
    rng = np.random.default_rng(0)
    V = 360  # divisible by the 4-way vocab axis
    docs = []
    for _ in range(32):  # short docs -> bucket 0 (L=128)
        ids = rng.choice(200, 10, replace=False)
        docs.append([(int(i), int(rng.integers(1, 4))) for i in sorted(ids)])
    for _ in range(32):  # long docs -> bucket 1 (L=256)
        ids = rng.choice(V, 140, replace=False)
        docs.append([(int(i), int(rng.integers(1, 3))) for i in sorted(ids)])
    words = [f"w{i}" for i in range(V)]
    X = rng.integers(0, 2, len(docs))
    kwargs = dict(
        documents=docs, dictionary=words, K=3, X=X, max_em_iter=3,
        init_type="random", model_type="STM", seed=123456,
    )
    m1 = STM(**kwargs)
    assert m1._plan.n_buckets >= 2  # the corpus must actually bucket
    m1.expectation_maximization(saving=False)
    mv = STM(**kwargs, mesh=make_mesh_2d(2, 4))
    mv.expectation_maximization(saving=False)
    np.testing.assert_allclose(
        np.asarray(mv.last_bounds), np.asarray(m1.last_bounds), rtol=2e-4
    )
    np.testing.assert_allclose(mv.theta, m1.theta, atol=2e-3)
    np.testing.assert_allclose(mv.beta, m1.beta, atol=2e-4)


@needs8
def test_vocab_sharded_content_model(toy_corpus, toy_dictionary):
    """Content model under a 2-D (docs, vocab) mesh (round 3): the
    per-word kappa GLMs are shard-local; the cross-shard quantities are
    the offset row totals and the beta softmax row max/normalizer (two
    (A*K)-sized vocab-axis collectives) — the fit must match the
    single-device content fit."""
    train_docs = toy_corpus.train_docs
    n = len(train_docs)
    beta_index = np.random.default_rng(0).integers(0, 2, n)
    kwargs = dict(
        documents=train_docs,
        dictionary=_padded_dictionary(toy_dictionary),
        K=3,
        X=beta_index.astype(float),
        content=True,
        A=2,
        beta_index=beta_index,
        lda_beta=False,
        kappa_interactions=True,
        max_em_iter=2,
        init_type="random",
        model_type="CTM",
        seed=123456,
    )
    m1 = STM(**kwargs)
    m1.expectation_maximization(saving=False)

    mesh = make_mesh_2d(2, 4)
    mv = STM(**kwargs, mesh=mesh)
    assert mv._state.beta.sharding.spec[-1] == VOCAB_AXIS
    assert mv._state.kappa.sharding.spec[-1] == VOCAB_AXIS
    mv.expectation_maximization(saving=False)

    np.testing.assert_allclose(
        np.asarray(mv.last_bounds), np.asarray(m1.last_bounds), rtol=2e-4
    )
    np.testing.assert_allclose(mv.beta, m1.beta, atol=2e-4)
    np.testing.assert_allclose(mv.kappa, m1.kappa, atol=2e-3)


def test_make_mesh_2d_raises_on_insufficient_devices():
    with pytest.raises(ValueError, match="needs 1024 devices"):
        make_mesh_2d(32, 32)


@needs8
def test_vocab_sharded_fused_two_pass(toy_corpus, toy_dictionary, toy_metadata):
    """Fused finalize under a 2-D mesh: the overflow lax.cond's gather
    psums over the vocab axis, so the predicate must be replicated
    along it (Newton runs on the psum-assembled beta_doc — done flags
    agree across vocab shards); results must match single-device."""
    from strutopy_tpu.models.config import STMConfig

    kwargs = _fit_kwargs(toy_corpus, toy_dictionary, toy_metadata)
    cfg = STMConfig(
        K=3, model_type="STM", init_type="random", max_em_iter=3,
        newton_pass1_iters=5, newton_straggler_frac=1.0,
        newton_warmup_iters=0, two_pass_fused=True,
    )
    m1 = STM(**kwargs)
    m1.expectation_maximization(saving=False)
    mv = STM(**{k: v for k, v in kwargs.items()
               if k in ("documents", "dictionary", "X")},
             config=cfg, mesh=make_mesh_2d(2, 4))
    mv.expectation_maximization(saving=False)
    np.testing.assert_allclose(
        np.asarray(mv.last_bounds), np.asarray(m1.last_bounds), rtol=2e-4
    )
    np.testing.assert_allclose(mv.beta, m1.beta, atol=2e-4)


@needs8
def test_vocab_sharded_fused_with_overflow(toy_corpus, toy_dictionary,
                                           toy_metadata):
    """Force the overflow fallback to actually RUN under the mesh (a
    1-doc straggler budget at pass1=1): the cond branch's vocab-axis
    psum must not deadlock, and the fit must match the single-device
    fit with the identical (overflowing) schedule."""
    from strutopy_tpu.models.config import STMConfig

    kwargs = _fit_kwargs(toy_corpus, toy_dictionary, toy_metadata)
    base = dict(
        K=3, model_type="STM", init_type="random", max_em_iter=2,
        newton_pass1_iters=1, newton_straggler_frac=0.01,
        newton_warmup_iters=0, two_pass_fused=True,
    )
    m1 = STM(**{k: v for k, v in kwargs.items()
               if k in ("documents", "dictionary", "X")},
             config=STMConfig(**base))
    m1.expectation_maximization(saving=False)
    mv = STM(**{k: v for k, v in kwargs.items()
               if k in ("documents", "dictionary", "X")},
             config=STMConfig(**base), mesh=make_mesh_2d(2, 4))
    mv.expectation_maximization(saving=False)
    np.testing.assert_allclose(
        np.asarray(mv.last_bounds), np.asarray(m1.last_bounds), rtol=2e-4
    )
    np.testing.assert_allclose(mv.beta, m1.beta, atol=2e-4)


@needs8
def test_vocab_sharded_serving_matches_single_device(
    toy_corpus, toy_dictionary, toy_metadata
):
    """Serving under a 2-D docs x vocab mesh (VERDICT r3 next #6): the
    shard_map inference path — beta vocab-sharded, one vocab-axis psum
    per beta_doc gather, exactly training's recipe — must reproduce
    the single-device theta/eta, including with multiple length
    buckets and a prevalence prior."""
    from strutopy_tpu.models.serving import infer_theta
    from strutopy_tpu.parallel.mesh import make_mesh

    kwargs = _fit_kwargs(toy_corpus, toy_dictionary, toy_metadata)
    m = STM(**kwargs)
    m.expectation_maximization(saving=False)

    docs = toy_corpus.test_docs if hasattr(toy_corpus, "test_docs") else None
    if not docs:
        docs = kwargs["documents"]
    beta = np.asarray(m.beta, np.float32)
    sigma = np.asarray(m.sigma, np.float32)
    gamma = np.asarray(m.gamma, np.float64)
    X = np.asarray(toy_metadata[: len(docs)], np.float64)
    mu = (np.c_[np.ones(len(docs)), X] @ gamma.T).astype(np.float32)

    t1, e1 = infer_theta(beta, sigma, mu, docs, m.config)
    t2d, e2d = infer_theta(beta, sigma, mu, docs, m.config,
                           mesh=make_mesh_2d(2, 4))
    np.testing.assert_allclose(t2d, t1, atol=1e-5)
    np.testing.assert_allclose(e2d, e1, atol=1e-4)

    # parity with the 1-D mesh path too (different storage layouts)
    t1d, _ = infer_theta(beta, sigma, mu, docs, m.config, mesh=make_mesh(8))
    np.testing.assert_allclose(t2d, t1d, atol=1e-5)

    # indivisible vocab fails loudly, not with a silent gather-clamp
    with pytest.raises(ValueError, match="divisible"):
        infer_theta(beta[:, :-1], sigma, mu,
                    [[(0, 1)]], m.config, mesh=make_mesh_2d(2, 4))
