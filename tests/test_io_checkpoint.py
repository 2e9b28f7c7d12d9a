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
