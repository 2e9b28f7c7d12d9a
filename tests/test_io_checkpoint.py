"""Matrix-Market I/O, artifact loading, and checkpoint/resume tests."""

import numpy as np

from strutopy_tpu.corpus.io import read_mm, write_mm, load_model_artifacts
from strutopy_tpu.models.stm import STM


def test_mm_roundtrip(tmp_path):
    corpus = [[(0, 2), (3, 1)], [(1, 4)], [(2, 1), (3, 2), (4, 1)]]
    p = str(tmp_path / "c.mm")
    write_mm(p, corpus)
    back = read_mm(p)
    assert back == corpus


def test_mm_handles_empty_docs(tmp_path):
    corpus = [[(0, 1)], [], [(2, 3)]]
    p = str(tmp_path / "c.mm")
    write_mm(p, corpus)
    assert read_mm(p) == corpus


def test_mm_roundtrip_preserves_padded_corpus_vocab(tmp_path):
    """Regression: write_mm inferred n_terms from the max OCCURRING id,
    so a PaddedCorpus whose highest dictionary ids never occur came back
    with a shrunken V — misaligning any refit against the dictionary."""
    from strutopy_tpu.corpus.bow import pad_corpus

    pc = pad_corpus([[(0, 2)], [(3, 1)]], V=10)
    p = str(tmp_path / "c.mm")
    write_mm(p, pc)
    _docs, V = read_mm(p, return_V=True)
    assert V == 10
    # explicit n_terms smaller than an occurring id must error
    import pytest

    with pytest.raises(ValueError, match="n_terms"):
        write_mm(str(tmp_path / "d.mm"), [[(7, 1)]], n_terms=5)


def test_mm_corruption_reports_physical_line_numbers(tmp_path):
    """Comment lines between header and size line must not shift the
    reported line number of a corrupt entry."""
    import pytest

    p = tmp_path / "c.mm"
    p.write_text(
        "%%MatrixMarket matrix coordinate real general\n"
        "% a comment\n"
        "% another\n"
        "2 3 2\n"
        "1 1 1\n"
        "9 1 1\n"  # physical line 6, doc id out of range
    )
    with pytest.raises(ValueError, match=r"c\.mm:6"):
        read_mm(str(p))


def test_artifact_loading_refuses_embedded_objects(tmp_path):
    """Model artifact directories are pure data: a pickled-object .npy
    or a pickle smuggling a non-numeric global must be refused, never
    executed."""
    import pickle

    import pytest

    d = tmp_path / "m"
    d.mkdir()
    np.save(d / "beta_hat.npy", np.ones((3, 5), np.float32))
    np.save(d / "sigma_hat.npy", np.eye(2, dtype=np.float32))
    # a list of plain floats (what save_model writes) loads fine
    with open(d / "lower_bound.pickle", "wb") as f:
        pickle.dump([-10.0, -9.5], f)
    art = load_model_artifacts(str(d))
    assert art["lower_bound"] == [-10.0, -9.5]
    # numpy float64 scalars (what the reference pickles) load fine too
    with open(d / "lower_bound.pickle", "wb") as f:
        pickle.dump([np.float64(-10.0)], f)
    assert float(load_model_artifacts(str(d))["lower_bound"][0]) == -10.0
    # a pickle carrying an arbitrary global is refused
    with open(d / "lower_bound.pickle", "wb") as f:
        pickle.dump(type("E", (), {"__reduce__": lambda s: (print, ("x",))})(), f)
    with pytest.raises(pickle.UnpicklingError, match="refusing"):
        load_model_artifacts(str(d))
    (d / "lower_bound.pickle").unlink()
    # an object-array .npy is refused with a clear message
    np.save(d / "theta_hat.npy", np.array([{"a": 1}], dtype=object),
            allow_pickle=True)
    with pytest.raises(ValueError, match="pickled Python objects"):
        load_model_artifacts(str(d))


def test_load_reference_artifacts_if_present():
    """Read the reference's committed K=50 wiki artifacts (data fixtures,
    not code) and sanity-check our eval stack against their scale."""
    import os

    ref_dir = "/root/reference/src/artifacts/reference_model/50"
    if not os.path.isdir(ref_dir):
        import pytest

        pytest.skip("reference artifacts not mounted")
    art = load_model_artifacts(ref_dir)
    assert "theta" in art and "sigma" in art and "eta" in art
    N, K = art["theta"].shape
    assert N == 1015 and K == 50
    assert art["sigma"].shape == (K - 1, K - 1)
    assert len(art["lower_bound"]) == 25
    np.testing.assert_allclose(art["lower_bound"][-1], -472991.13, atol=1.0)
    # theta rows are probabilities
    np.testing.assert_allclose(art["theta"].sum(axis=1), 1.0, atol=1e-4)


def test_checkpoint_resume(tmp_path, toy_corpus, toy_dictionary, toy_metadata):
    """A fit interrupted at iteration 2 and resumed must reach the same
    final state as an uninterrupted fit."""
    train = toy_corpus.train_docs
    X = toy_metadata[: len(train)]
    kw = dict(
        documents=train, dictionary=toy_dictionary, K=3, X=X,
        init_type="random", model_type="CTM", seed=123456,
    )
    ckpt = str(tmp_path / "state.npz")

    m1 = STM(max_em_iter=4, **kw)
    m1.expectation_maximization(saving=False)

    m2a = STM(max_em_iter=2, **kw)
    m2a.expectation_maximization(saving=False, checkpoint_path=ckpt)
    m2b = STM(max_em_iter=4, **kw)
    m2b.expectation_maximization(saving=False, checkpoint_path=ckpt, resume=True)

    assert len(m2b.last_bounds) == len(m1.last_bounds)
    np.testing.assert_allclose(m2b.last_bounds, m1.last_bounds, rtol=1e-5)
    np.testing.assert_allclose(m2b.beta, m1.beta, atol=1e-5)
    np.testing.assert_allclose(m2b.theta, m1.theta, atol=1e-5)


def _resume_matches_uninterrupted(tmp_path, toy_corpus, toy_dictionary,
                                  toy_metadata, **extra_kw):
    """Shared body: a fit interrupted at iteration 2 and resumed must
    reproduce the uninterrupted fit's trajectory bit-for-bit (the
    resume invariant: each Newton step is a pure function of state, the
    .npz round-trip is exact for f32, and re-sharding restores the
    identical placement)."""
    train = toy_corpus.train_docs
    kw = dict(
        documents=train, dictionary=toy_dictionary, K=3,
        X=toy_metadata[: len(train)], init_type="random",
        model_type="CTM", seed=123456, **extra_kw,
    )
    ckpt = str(tmp_path / "state.npz")

    m1 = STM(max_em_iter=4, **kw)
    m1.expectation_maximization(saving=False)

    m2a = STM(max_em_iter=2, **kw)
    m2a.expectation_maximization(saving=False, checkpoint_path=ckpt)
    m2b = STM(max_em_iter=4, **kw)
    m2b.expectation_maximization(saving=False, checkpoint_path=ckpt, resume=True)

    assert len(m2b.last_bounds) == len(m1.last_bounds)
    np.testing.assert_array_equal(
        np.asarray(m2b.last_bounds), np.asarray(m1.last_bounds)
    )
    np.testing.assert_array_equal(m2b.beta, m1.beta)
    np.testing.assert_array_equal(m2b.theta, m1.theta)
    return m2b


def test_checkpoint_resume_under_mesh(tmp_path, toy_corpus, toy_dictionary,
                                      toy_metadata):
    """Resume of a document-sharded fit (VERDICT r3 next #3): the
    restored host state must re-shard onto the mesh and continue the
    sharded trajectory bit-identically."""
    import jax

    from strutopy_tpu.parallel.mesh import DOC_AXIS, make_mesh

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 (virtual) devices")
    mesh = make_mesh(8)
    m = _resume_matches_uninterrupted(
        tmp_path, toy_corpus, toy_dictionary, toy_metadata, mesh=mesh
    )
    # the resumed state really lives on the mesh, not a single device
    assert m._state.eta.sharding.spec[0] == DOC_AXIS


def test_checkpoint_resume_streaming_mesh(tmp_path, toy_corpus,
                                          toy_dictionary, toy_metadata):
    """Resume composed with streaming x 1-D mesh (VERDICT r3 next #3):
    the restored full state must slice back into per-part shards and
    continue bit-identically."""
    import jax

    from strutopy_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 4:
        import pytest

        pytest.skip("needs 4 (virtual) devices")
    _resume_matches_uninterrupted(
        tmp_path, toy_corpus, toy_dictionary, toy_metadata,
        stream_parts=2, mesh=make_mesh(4),
    )


def test_ldac_roundtrip(tmp_path):
    from strutopy_tpu.corpus.io import read_ldac, write_ldac

    docs = [[(0, 2), (5, 1)], [], [(3, 4)]]
    vocab = [f"w{i}" for i in range(6)]
    p = tmp_path / "corpus.ldac"
    write_ldac(str(p), docs, vocab=vocab)
    back, vback = read_ldac(str(p), vocab_path=str(p) + ".vocab")
    assert back == docs
    assert vback == vocab
    # without vocab: just the docs
    assert read_ldac(str(p)) == docs


def test_from_dtm_inverts_create_dtm():
    """R-stm readCorpus(type="dtm") analogue: dense and scipy-sparse
    DTMs round-trip back to BoW documents, empty rows included."""
    import pytest

    from strutopy_tpu.corpus.bow import create_dtm, from_dtm

    docs = [[(0, 2), (5, 1)], [], [(3, 4), (4, 1)]]
    dtm = create_dtm(docs, V=6)
    assert from_dtm(dtm) == docs

    scipy_sparse = pytest.importorskip("scipy.sparse")
    assert from_dtm(scipy_sparse.csr_matrix(dtm)) == docs
    assert from_dtm(scipy_sparse.coo_matrix(dtm)) == docs

    with pytest.raises(ValueError, match="2-D"):
        from_dtm(np.zeros(4))

    # fractional entries round first: (0, 0.5] drops (banker's rounding
    # sends 0.5 -> 0), so no zero-count tokens leak downstream
    frac = np.array([[0.4, 1.6, 0.5]])
    assert from_dtm(frac) == [[(1, 2)]]
    assert from_dtm(scipy_sparse.csr_matrix(frac)) == [[(1, 2)]]

    # negative entries raise in both paths (a DTM is a count matrix)
    with pytest.raises(ValueError, match="negative"):
        from_dtm(np.array([[1.0, -1.0]]))
    with pytest.raises(ValueError, match="negative"):
        from_dtm(scipy_sparse.csr_matrix(np.array([[1.0, -1.0]])))

    # non-canonical sparse input (duplicate entries for one word) is
    # summed, matching create_dtm's output, and the input not mutated
    coo = scipy_sparse.coo_matrix(
        (np.array([1.0, 2.0]), (np.array([0, 0]), np.array([3, 3]))), shape=(1, 6)
    )
    dup_csr = coo.tocsr()  # keeps duplicates until sum_duplicates()
    dup_csr.sort_indices()
    nnz_before = dup_csr.nnz
    assert from_dtm(dup_csr) == [[(3, 3)]]
    assert dup_csr.nnz == nnz_before


def test_ldac_rejects_malformed(tmp_path):
    import pytest

    from strutopy_tpu.corpus.io import read_ldac

    p = tmp_path / "bad.ldac"
    p.write_text("2 0:1\n")  # declared 2 pairs, has 1
    with pytest.raises(ValueError, match="declared 2"):
        read_ldac(str(p))
    p.write_text("1 0:abc\n")
    with pytest.raises(ValueError, match="malformed"):
        read_ldac(str(p))
    p.write_text("1 0:0\n")
    with pytest.raises(ValueError, match="counts positive"):
        read_ldac(str(p))


def test_ldac_float_counts_round_and_fractional_reject(tmp_path):
    import pytest

    from strutopy_tpu.corpus.bow import pad_corpus
    from strutopy_tpu.corpus.io import read_ldac, write_ldac

    # PaddedCorpus counts are float32: integral floats must round-trip
    pc = pad_corpus([[(0, 2), (3, 1)], [(1, 4)]], V=5)
    p = tmp_path / "f.ldac"
    write_ldac(str(p), pc)
    assert read_ldac(str(p)) == [[(0, 2), (3, 1)], [(1, 4)]]
    # genuinely fractional counts are an error, not silent corruption
    with pytest.raises(ValueError, match="integer counts"):
        write_ldac(str(tmp_path / "g.ldac"), [[(0, 2.5)]])
