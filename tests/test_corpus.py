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
