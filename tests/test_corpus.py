import numpy as np

from strutopy_tpu.corpus.bow import PaddedCorpus, Vocabulary, create_dtm, pad_corpus, to_bow


def test_create_dtm():
    """create_dtm matches the reference semantics (stm.py:87-119)."""
    docs = [
        [(0, 2), (1, 3)],
        [(1, 1), (2, 5)],
    ]
    dtm = create_dtm(docs)
    assert dtm.shape == (2, 3)
    assert dtm[0, 0] == 2
    assert dtm[0, 1] == 3
    assert dtm[1, 1] == 1
    assert dtm[1, 2] == 5


def test_pad_roundtrip():
    docs = [[(0, 2), (5, 3)], [(1, 1)], [(2, 4), (3, 1), (7, 2)]]
    corpus = pad_corpus(docs)
    assert corpus.V == 8
    assert corpus.N == 3
    assert corpus.L % 128 == 0
    assert to_bow(corpus) == docs
    assert corpus.doc_ok.all()


def test_pad_merges_duplicates():
    corpus = pad_corpus([[(3, 1), (3, 2)]])
    assert to_bow(corpus) == [[(3, 3)]]


def test_word_counts():
    docs = [[(0, 2), (1, 3)], [(1, 1), (2, 5)]]
    corpus = pad_corpus(docs)
    np.testing.assert_allclose(corpus.word_counts(), [2, 4, 5])


def test_pad_docs_to_masks_dummies():
    corpus = pad_corpus([[(0, 1)]]).pad_docs_to(4)
    assert corpus.N == 4
    assert corpus.doc_ok.tolist() == [True, False, False, False]
    assert corpus.counts[1:].sum() == 0


def test_vocabulary():
    v = Vocabulary.from_corpus([[(0, 1), (4, 2)]])
    assert len(v) == 5
    assert v[3] == "3"


def test_read_mm_rejects_out_of_range_entries(tmp_path):
    """Truncated/corrupt .mm files must error, not silently shrink the
    corpus or pass out-of-vocabulary word ids downstream (ADVICE r1)."""
    import pytest
    from strutopy_tpu.corpus.io import read_mm

    p = tmp_path / "bad.mm"
    p.write_text(
        "%%MatrixMarket matrix coordinate real general\n3 5 2\n1 2 1\n9 1 4\n"
    )
    with pytest.raises(ValueError, match="outside the declared"):
        read_mm(str(p))
    p2 = tmp_path / "badterm.mm"
    p2.write_text(
        "%%MatrixMarket matrix coordinate real general\n3 5 2\n1 2 1\n2 6 4\n"
    )
    with pytest.raises(ValueError, match="outside the declared"):
        read_mm(str(p2))


def test_read_mm_detects_line_boundary_truncation(tmp_path):
    """Whole trailing lines lost pass every per-entry check; the header's
    declared nnz is the only witness."""
    import pytest
    from strutopy_tpu.corpus.io import read_mm

    p = tmp_path / "trunc.mm"
    p.write_text(
        "%%MatrixMarket matrix coordinate real general\n3 5 3\n1 2 1\n2 3 4\n"
    )
    with pytest.raises(ValueError, match="declares 3 entries"):
        read_mm(str(p))


def test_read_mm_return_V_honors_header(tmp_path):
    """The declared term count can exceed max observed id + 1 (a pruned
    dictionary keeps its id range); return_V exposes it so both ingest
    paths agree on shapes."""
    from strutopy_tpu.corpus.io import read_mm

    p = tmp_path / "sparse_tail.mm"
    p.write_text(
        "%%MatrixMarket matrix coordinate real general\n2 9 2\n1 2 1\n2 3 4\n"
    )
    bow, V = read_mm(str(p), return_V=True)
    assert V == 9
    assert bow == [[(1, 1)], [(2, 4)]]


def test_pad_corpus_rejects_out_of_vocab_ids():
    """A caller-supplied V smaller than the corpus's id range must error:
    on device the beta gather clamps ids to V-1 (silent corruption)."""
    import pytest
    from strutopy_tpu.corpus.bow import pad_corpus

    docs = [[(0, 1), (7, 2)]]
    with pytest.raises(ValueError, match="does not cover"):
        pad_corpus(docs, V=5)
    assert pad_corpus(docs, V=8).V == 8


def test_native_readers_reject_corrupt_inputs(tmp_path):
    """The native fast path must agree with the python reader on what is
    an error (truncation, malformed lines, OOV COO word ids)."""
    import pytest
    from strutopy_tpu.corpus import native

    if not native.available():
        pytest.skip("native toolchain unavailable")

    p = tmp_path / "trunc.mm"
    p.write_text(
        "%%MatrixMarket matrix coordinate real general\n3 5 3\n1 2 1\n2 3 4\n"
    )
    with pytest.raises(ValueError, match="declares 3"):
        native.read_mm_padded(str(p))

    p2 = tmp_path / "garbage.mm"
    p2.write_text(
        "%%MatrixMarket matrix coordinate real general\n3 5 2\n1 2 1\nxx yy\n"
    )
    with pytest.raises(ValueError, match="unparseable"):
        native.read_mm_padded(str(p2))

    import numpy as np

    with pytest.raises(ValueError, match="word ids outside"):
        native.pack_coo_padded(
            np.array([0, 1]), np.array([0, 9], np.int32),
            np.array([1.0, 2.0], np.float32), n_docs=2, V=5,
        )
