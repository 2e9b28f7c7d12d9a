"""ctypes bindings for the native C++ ingest library (native/ingest.cpp).

Auto-builds with ``make`` on first use if g++ is available; every entry
point has a pure-python fallback in corpus/bow.py and corpus/io.py, so
the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

from strutopy_tpu.corpus.bow import _round_up

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libstm_ingest.so")
_lib = None
_tried = False


def _stale() -> bool:
    """Rebuild when any source is newer than the built library."""
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    for f in os.listdir(_NATIVE_DIR):
        if f.endswith(".cpp") and os.path.getmtime(
            os.path.join(_NATIVE_DIR, f)
        ) > lib_mtime:
            return True
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if _stale():
        makefile = os.path.join(_NATIVE_DIR, "Makefile")
        if os.path.exists(makefile):
            try:
                # serialize concurrent builders: without the lock, two
                # processes can run make on the same .so while a third
                # dlopens a half-written file
                import fcntl

                with open(os.path.join(_NATIVE_DIR, ".build.lock"), "w") as lk:
                    fcntl.flock(lk, fcntl.LOCK_EX)
                    if _stale():  # may have been rebuilt while we waited
                        subprocess.run(
                            ["make", "-C", _NATIVE_DIR, "-B"], check=True,
                            capture_output=True, timeout=120,
                        )
            except Exception as e:  # no toolchain — fall back to python
                logger.debug("native ingest build failed: %s", e)
                return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.stm_mm_open.restype = ctypes.c_void_p
    lib.stm_mm_open.argtypes = [ctypes.c_char_p]
    lib.stm_corpus_n_docs.restype = ctypes.c_int64
    lib.stm_corpus_n_docs.argtypes = [ctypes.c_void_p]
    lib.stm_corpus_n_terms.restype = ctypes.c_int64
    lib.stm_corpus_n_terms.argtypes = [ctypes.c_void_p]
    lib.stm_corpus_max_len.restype = ctypes.c_int64
    lib.stm_corpus_max_len.argtypes = [ctypes.c_void_p]
    lib.stm_corpus_error.restype = ctypes.c_char_p
    lib.stm_corpus_error.argtypes = [ctypes.c_void_p]
    lib.stm_corpus_pad.restype = ctypes.c_int32
    lib.stm_corpus_pad.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.stm_corpus_free.argtypes = [ctypes.c_void_p]
    lib.stm_pack_coo.restype = ctypes.c_int64
    lib.stm_pack_coo.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
    ]
    # BoW builder (native/bow.cpp)
    lib.stm_bow_build.restype = ctypes.c_void_p
    lib.stm_bow_build.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_char_p, ctypes.c_int32, ctypes.c_int64, ctypes.c_double,
    ]
    lib.stm_bow_error.restype = ctypes.c_char_p
    lib.stm_bow_error.argtypes = [ctypes.c_void_p]
    lib.stm_bow_vocab_size.restype = ctypes.c_int64
    lib.stm_bow_vocab_size.argtypes = [ctypes.c_void_p]
    lib.stm_bow_vocab_blob_len.restype = ctypes.c_int64
    lib.stm_bow_vocab_blob_len.argtypes = [ctypes.c_void_p]
    lib.stm_bow_vocab_copy.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.stm_bow_nnz.restype = ctypes.c_int64
    lib.stm_bow_nnz.argtypes = [ctypes.c_void_p]
    lib.stm_bow_doc_offsets.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)
    ]
    lib.stm_bow_entries.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.stm_bow_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def read_mm_padded(path: str, lane: int = 128):
    """Parse a MatrixMarket corpus directly into a PaddedCorpus via the
    native library.  Returns None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    h = lib.stm_mm_open(path.encode())
    if not h:
        raise FileNotFoundError(path)
    try:
        err = lib.stm_corpus_error(h)
        if err:
            raise ValueError(f"{path}: {err.decode()}")
        n_docs = lib.stm_corpus_n_docs(h)
        n_terms = lib.stm_corpus_n_terms(h)
        max_len = lib.stm_corpus_max_len(h)
        L = _round_up(max(int(max_len), lane), lane)
        words = np.zeros((n_docs, L), np.int32)
        counts = np.zeros((n_docs, L), np.float32)
        doc_ok = np.zeros(n_docs, np.uint8)
        rc = lib.stm_corpus_pad(
            h, L,
            words.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            doc_ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc != 0:
            raise RuntimeError("native pad failed")
    finally:
        lib.stm_corpus_free(h)

    from strutopy_tpu.corpus.bow import PaddedCorpus

    return PaddedCorpus(
        words=words, counts=counts, doc_ok=doc_ok.astype(bool), V=int(n_terms)
    )


def pack_coo_padded(doc_idx, word_idx, count, n_docs: int, V: int, lane: int = 128):
    """Pack COO triples into a PaddedCorpus via the native library.
    Returns None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    doc_idx = np.ascontiguousarray(doc_idx, np.int64)
    word_idx = np.ascontiguousarray(word_idx, np.int32)
    count = np.ascontiguousarray(count, np.float32)
    nnz = len(doc_idx)
    # first pass with a guess; native returns needed L if too small
    L = lane
    while True:
        words = np.zeros((n_docs, L), np.int32)
        counts = np.zeros((n_docs, L), np.float32)
        doc_ok = np.zeros(n_docs, np.uint8)
        rc = lib.stm_pack_coo(
            doc_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            word_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            count.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            nnz, n_docs, V, L,
            words.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            doc_ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc == -2:
            raise ValueError(f"COO word ids outside [0, V={V})")
        if rc < 0:
            raise ValueError("bad doc indices in COO input")
        if rc <= L:
            break
        L = _round_up(int(rc), lane)

    from strutopy_tpu.corpus.bow import PaddedCorpus

    return PaddedCorpus(
        words=words, counts=counts, doc_ok=doc_ok.astype(bool), V=V
    )


_WS_RE = None


def build_bow(texts, stopwords, min_len: int = 2, min_doc_freq: int = 1,
              max_doc_frac: float = 1.0):
    """Native BoW construction (native/bow.cpp): the hot loop of
    corpus/preprocess.py::build_corpus.  Returns (bow, vocab_tokens) or
    None if the library is unavailable.

    Unicode handling split: python lowercases and normalizes unicode
    whitespace to ' ' (both C-speed, case tables stay out of C++); the
    native side strips ASCII punctuation/digits (python's regex is also
    ASCII-only), splits, filters stopwords/min_len (codepoints) and
    counts.  Exact-parity contract tested in tests/test_native_bow.py.
    """
    lib = _load()
    if lib is None:
        return None
    global _WS_RE
    if _WS_RE is None:
        import re

        _WS_RE = re.compile(r"\s")
    if stopwords and any("\n" in w for w in stopwords):
        # the stopword blob is newline-delimited; an embedded newline
        # would silently split one stopword into two — use the python
        # path, which matches whole tokens only
        return None
    encs = [_WS_RE.sub(" ", t.lower()).encode("utf-8") for t in texts]
    n = len(encs)
    offs = np.zeros(n + 1, np.int64)
    if n:
        np.cumsum([len(e) for e in encs], out=offs[1:])
    blob = b"".join(encs)
    stop_blob = ("\n".join(sorted(stopwords)) if stopwords else "").encode("utf-8")

    h = lib.stm_bow_build(
        blob, offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
        stop_blob, min_len, min_doc_freq, float(max_doc_frac),
    )
    try:
        err = lib.stm_bow_error(h)
        if err:
            raise ValueError(f"native bow: {err.decode()}")
        blob_len = lib.stm_bow_vocab_blob_len(h)
        buf = ctypes.create_string_buffer(int(blob_len))
        lib.stm_bow_vocab_copy(h, buf)
        vocab_tokens = (
            buf.raw[: int(blob_len)].decode("utf-8").split("\n")
            if blob_len
            else []
        )
        doc_offs = np.zeros(n + 1, np.int64)
        lib.stm_bow_doc_offsets(
            h, doc_offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        )
        nnz = int(lib.stm_bow_nnz(h))
        idx = np.zeros(nnz, np.int32)
        cnt = np.zeros(nnz, np.float32)
        if nnz:
            lib.stm_bow_entries(
                h,
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
    finally:
        lib.stm_bow_free(h)

    cnt_i = cnt.astype(np.int64)
    bow = [
        list(zip(idx[a:b].tolist(), cnt_i[a:b].tolist()))
        for a, b in zip(doc_offs[:-1].tolist(), doc_offs[1:].tolist())
    ]
    return bow, vocab_tokens
