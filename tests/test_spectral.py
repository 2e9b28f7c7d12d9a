"""Spectral initialization tests, incl. NNLS-vs-scipy parity for RecoverL2."""

import numpy as np
import pytest
import scipy.optimize
import jax.numpy as jnp

from strutopy_tpu.ops.spectral import fast_anchor, recover_l2, spectral_init


def test_recover_l2_matches_scipy_nnls():
    """Our FISTA NNLS must match scipy.optimize.nnls per word (the
    reference's quadprog QP with the sign flip is exactly NNLS —
    see ops/spectral.py docstring)."""
    rng = np.random.default_rng(0)
    Vp, K = 30, 4
    Q = rng.dirichlet(np.ones(Vp), size=Vp).astype(np.float64)
    anchor = np.array([3, 11, 19, 27], np.int32)

    beta = np.asarray(
        recover_l2(jnp.asarray(Q, jnp.float32), jnp.asarray(anchor), jnp.asarray(Q.sum(1) / Q.sum(), jnp.float32), iters=2000)
    )

    M = Q[anchor]
    wprob = Q.sum(1) / Q.sum()
    weights = np.zeros((Vp, K))
    for i in range(Vp):
        if i in anchor:
            weights[i, list(anchor).index(i)] = 1.0
        else:
            z, _ = scipy.optimize.nnls(M.T, Q[i])
            weights[i] = z
    A = weights * wprob[:, None]
    A = A / A.sum(axis=0, keepdims=True)
    expected = A.T
    np.testing.assert_allclose(beta, expected, atol=2e-3)


def test_fast_anchor_picks_distinct_rows():
    rng = np.random.default_rng(1)
    Vp = 40
    Q = rng.dirichlet(np.ones(Vp), size=Vp).astype(np.float32)
    anchors = np.asarray(fast_anchor(jnp.asarray(Q), 5))
    assert len(set(anchors.tolist())) == 5


def test_spectral_init_properties(toy_corpus):
    beta = spectral_init(toy_corpus.train_docs, K=3, V=toy_corpus.V)
    assert beta.shape == (3, toy_corpus.V)
    assert np.all(beta > 0)  # pseudocount floor
    np.testing.assert_allclose(beta.sum(axis=1), 1.0, atol=1e-8)
    # deterministic
    beta2 = spectral_init(toy_corpus.train_docs, K=3, V=toy_corpus.V)
    np.testing.assert_allclose(beta, beta2)


def test_spectral_init_in_stm(toy_corpus, toy_dictionary, toy_metadata):
    from strutopy_tpu.models.stm import STM

    train = toy_corpus.train_docs
    m = STM(
        documents=train,
        dictionary=toy_dictionary,
        K=3,
        X=toy_metadata[: len(train)],
        max_em_iter=2,
        init_type="spectral",
        model_type="STM",
    )
    m.expectation_maximization(saving=False)
    assert np.isfinite(m.last_bounds).all()
    # spectral init starts near a good optimum, so the trajectory is
    # roughly flat rather than jumping; require it stays in the same range
    assert abs(m.last_bounds[-1] - m.last_bounds[0]) < 0.5 * abs(m.last_bounds[0])


def test_spectral_init_sharded_matches_single_device():
    """Document-sharded Gram accumulation (round 3, VERDICT r2 next #5):
    partial (Vp, Vp) sums psum over the doc mesh; the resulting beta
    must match the single-device spectral init to float32 reduction
    order."""
    import jax

    from strutopy_tpu.ops.spectral import spectral_init
    from strutopy_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 (virtual) devices")

    rng = np.random.default_rng(3)
    K, V, N = 4, 300, 160
    beta_true = rng.dirichlet(np.full(V, 0.05), size=K)
    docs = []
    for _ in range(N):
        th = rng.dirichlet(np.ones(K))
        draw = rng.multinomial(60, th @ beta_true)
        ids = np.nonzero(draw)[0]
        docs.append([(int(i), int(draw[i])) for i in ids])

    b1 = spectral_init(docs, K, V)
    b8 = spectral_init(docs, K, V, mesh=make_mesh(8))
    # the greedy anchor argmax could in principle tie-break differently
    # under reordered f32 sums; with a real corpus signal it does not
    np.testing.assert_allclose(b8, b1, atol=5e-5)


def test_fast_anchor_matches_reference_exactly(ref_modules):
    """Pin anchor selection to the reference's fastAnchor on the same Q.

    The reference ranks candidates by COLUMN squared sums
    (`Q.power(2).sum(axis=0)`, stm.py:175 — its variable is named
    row_squared_sum but scipy's axis=0 sums columns) while normalizing
    and projecting ROWS.  That deviates from R-stm's rowSums(Q^2), and
    this framework preserves the reference's actual behavior
    (PARITY_NOTES.md); this test fails if either side changes axis.
    """
    import jax.numpy as jnp
    import scipy.sparse as sp

    ref_stm, _ = ref_modules
    rng = np.random.default_rng(7)
    V, K = 40, 6
    Q = rng.gamma(1.0, 1.0, (V, V))
    Q = Q / Q.sum(axis=1, keepdims=True)  # row-normalized like _gram_finish

    # csr_matrix, not csr_array: the reference's row indexing (Q[maxind,])
    # only keeps 2-D semantics under the legacy matrix API it was run with
    ref_anchor = ref_stm.fastAnchor(sp.csr_matrix(Q.copy()), K, verbose=False)
    ours = np.asarray(fast_anchor(jnp.asarray(Q, jnp.float32), K))
    np.testing.assert_array_equal(ours, ref_anchor.astype(np.int64))


def test_gram_matches_reference_exactly(ref_modules):
    """Pin the Gram matrix INCLUDING its (non-)normalization.

    The reference's `gram` (stm.py:122-157) says "row normalized" but
    its Q is CSC, so sklearn `normalize(Q, copy=False)` normalizes a
    converted csr COPY whose return value is discarded — the Q it
    actually hands to fastAnchor/recover_l2 is UNNORMALIZED.  With
    row-sum (l1) normalization instead, the end-to-end spectral fits
    measured 0.8-1.1 nats worse heldout
    (results_quality_h2h_spectral.json; max |Q_l1 - Q_ref| = 0.68,
    13/50 different wiki anchors — results_spectral_init_diag.json).
    gram_norm="none" must reproduce the reference's Q to f32 rounding;
    this test fails if either side's normalization changes.
    """
    import jax.numpy as jnp

    from strutopy_tpu.ops.spectral import _gram_scan

    ref_stm, _ = ref_modules
    rng = np.random.default_rng(11)
    N, V, L = 60, 25, 12
    docs = []
    for _ in range(N):
        n_terms = rng.integers(3, L)
        words = rng.choice(V, n_terms, replace=False)
        counts = rng.integers(1, 5, n_terms)
        docs.append([[int(w), int(c)] for w, c in zip(words, counts)])
    dtm = ref_stm.create_dtm(corpus=docs)
    if dtm.shape[1] < V:
        import scipy.sparse as sp
        dtm = sp.csr_matrix((dtm.data, dtm.indices, dtm.indptr),
                            shape=(dtm.shape[0], V))
    Q_ref = np.asarray(ref_stm.gram(dtm).todense())

    words_p = np.zeros((N, L), np.int32)
    counts_p = np.zeros((N, L), np.float32)
    for i, doc in enumerate(docs):
        for j, (w, c) in enumerate(doc):
            words_p[i, j] = w
            counts_p[i, j] = c
    Q_none, _ = _gram_scan(jnp.asarray(words_p), jnp.asarray(counts_p),
                           n_chunks=1, Vp=V, norm="none")
    np.testing.assert_allclose(np.asarray(Q_none), Q_ref, atol=2e-6)

    # the normalized variants must NOT match (guards against the
    # reference's dead normalize call ever coming alive — e.g. scipy
    # changing the product format to csr would make copy=False mutate)
    for norm in ("l1", "l2"):
        Q_n, _ = _gram_scan(jnp.asarray(words_p), jnp.asarray(counts_p),
                            n_chunks=1, Vp=V, norm=norm)
        assert np.abs(np.asarray(Q_n) - Q_ref).max() > 1e-3
