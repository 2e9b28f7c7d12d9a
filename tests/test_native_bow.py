"""Native C++ BoW builder (native/bow.cpp) vs the python path.

Exact-parity contract: identical vocabulary (tokens AND order) and
identical per-doc (idx, count) lists for any input, including unicode
text, unicode whitespace, stopwords, empty docs, and the document-
frequency pruning knobs.
"""

import numpy as np
import pytest

from strutopy_tpu.corpus import native
from strutopy_tpu.corpus.preprocess import DEFAULT_STOPWORDS, build_corpus

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)

TEXTS = [
    "The quick brown fox; jumps over 42 lazy dogs!!",
    "Fox news: the lazy-dog's QUICK jump (again) -- truly quick.",
    "",
    "naïve café déjà-vu — ÉLAN élan straße",  # unicode case + punct
    "word with nbsp and\ttabs\nnewlines",  # unicode whitespace
    "a ab abc a1b2c3 don't can't it's",  # min_len + apostrophes
    "repeat repeat repeat unique",
    "  only   spaces   ",
]


def _both(**kw):
    nat = build_corpus(TEXTS, use_native=True, **kw)
    py = build_corpus(TEXTS, use_native=False, **kw)
    return nat, py


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"stopwords": None},
        {"min_doc_freq": 2},
        {"max_doc_frac": 0.4},
        {"min_doc_freq": 2, "max_doc_frac": 0.6},
    ],
)
def test_native_bow_matches_python(kw):
    (bow_n, vocab_n), (bow_p, vocab_p) = _both(**kw)
    assert list(vocab_n) == list(vocab_p)
    assert len(bow_n) == len(bow_p)
    for dn, dp in zip(bow_n, bow_p):
        assert [(int(i), int(c)) for i, c in dn] == [
            (int(i), int(c)) for i, c in dp
        ]


def test_native_bow_large_random_corpus():
    rng = np.random.default_rng(0)
    words = [f"tok{i}" for i in range(500)]
    texts = [
        " ".join(rng.choice(words, rng.integers(5, 80)))
        for _ in range(300)
    ]
    nat = build_corpus(texts, use_native=True, min_doc_freq=2)
    py = build_corpus(texts, use_native=False, min_doc_freq=2)
    assert list(nat[1]) == list(py[1])
    assert nat[0] == py[0]


def test_native_bow_stopwords_applied():
    bow, vocab = build_corpus(["the fox and the dog"], use_native=True)
    toks = list(vocab)
    assert "the" not in toks and "and" not in toks
    assert set(toks) == {"fox", "dog"}
    assert "the" in DEFAULT_STOPWORDS


def test_native_bow_unicode_fuzz_parity():
    """Randomized parity: documents assembled from random codepoints
    across ASCII, punctuation, digits, Latin-1, Greek, CJK, emoji and
    exotic whitespace must produce IDENTICAL BoW + vocab in both
    implementations (the contract native/bow.cpp declares)."""
    rng = np.random.default_rng(42)
    pools = [
        [chr(c) for c in range(ord("a"), ord("z") + 1)],
        [chr(c) for c in range(ord("A"), ord("Z") + 1)],
        list("0123456789"),
        list("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"),
        ["à", "é", "ß", "ñ", "ü", "Æ", "ç", "Ø"],
        ["α", "β", "Ω", "λ"],
        ["中", "文", "字"],
        ["😀", "🚀"],
        [" ", "\t", "\n", " ", " ", "　"],  # whitespace zoo
    ]
    weights = np.array([8, 2, 2, 2, 2, 1, 1, 1, 4], np.float64)
    weights /= weights.sum()
    for trial in range(6):
        texts = []
        for _ in range(40):
            n = int(rng.integers(0, 200))
            pick = rng.choice(len(pools), size=n, p=weights)
            texts.append("".join(
                pools[int(j)][int(rng.integers(len(pools[int(j)])))]
                for j in pick
            ))
        for mdf in (1, 2):
            nat = build_corpus(texts, use_native=True, min_doc_freq=mdf)
            py = build_corpus(texts, use_native=False, min_doc_freq=mdf)
            assert list(nat[1]) == list(py[1]), f"vocab diverged (trial {trial})"
            assert nat[0] == py[0], f"bow diverged (trial {trial}, mdf {mdf})"
