"""Native C++ ingest library tests (built on demand with make/g++)."""

import numpy as np
import pytest

from strutopy_tpu.corpus import native
from strutopy_tpu.corpus.io import write_mm, read_mm


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_native_mm_matches_python(tmp_path):
    corpus = [[(0, 2), (3, 1)], [(1, 4)], [], [(2, 1), (3, 2), (4, 7)]]
    p = str(tmp_path / "c.mm")
    write_mm(p, corpus)

    padded = native.read_mm_padded(p)
    assert padded is not None
    assert padded.N == 4
    assert padded.V == 5
    assert padded.doc_ok.tolist() == [True, True, False, True]

    from strutopy_tpu.corpus.bow import to_bow

    assert to_bow(padded) == corpus
    # python reader agrees
    assert read_mm(p) == corpus


def test_native_pack_coo():
    doc_idx = np.array([0, 0, 2, 1], np.int64)
    word_idx = np.array([5, 1, 3, 2], np.int32)
    count = np.array([2.0, 1.0, 4.0, 3.0], np.float32)
    padded = native.pack_coo_padded(doc_idx, word_idx, count, n_docs=3, V=6)
    assert padded is not None
    from strutopy_tpu.corpus.bow import to_bow

    bow = to_bow(padded)
    assert sorted(bow[0]) == [(1, 1), (5, 2)]
    assert bow[1] == [(2, 3)]
    assert bow[2] == [(3, 4)]


def test_native_pack_coo_grows_L():
    n = 200  # force L beyond one lane width
    doc_idx = np.zeros(n, np.int64)
    word_idx = np.arange(n, dtype=np.int32)
    count = np.ones(n, np.float32)
    padded = native.pack_coo_padded(doc_idx, word_idx, count, n_docs=1, V=n)
    assert padded is not None
    assert padded.L >= n
    assert int(padded.counts.sum()) == n


def test_native_rejects_out_of_range_entries(tmp_path):
    """stm_mm_open bounds-checks file-supplied indices (ADVICE r1
    medium): an out-of-range doc id previously scattered out of bounds
    (heap corruption); a term id > n_terms propagated ids >= V into the
    fit path where XLA's clamped gather silently corrupts results."""
    import pytest
    from strutopy_tpu.corpus import native

    if not native.available():
        pytest.skip("native lib not built")
    p = tmp_path / "bad.mm"
    p.write_text(
        "%%MatrixMarket matrix coordinate real general\n3 5 2\n1 2 1\n9 1 4\n"
    )
    with pytest.raises(Exception, match="outside the declared"):
        native.read_mm_padded(str(p))
