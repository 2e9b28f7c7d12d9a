"""Document-completion heldout likelihood and corpus splitting.

Reference: src/modules/heldout.py:70-97 (eval_heldout, cut_in_half) and
the split in src/modules/generate_docs.py:381-417.  The float64 numpy
implementation is the parity anchor (must match the reference to
<=1e-5 given identical theta/beta); the jax version is the batched
on-device variant used inside find-K sweeps.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from strutopy_tpu.corpus.bow import PaddedCorpus, to_bow


def eval_heldout(heldout, theta, beta) -> float:
    """Mean per-document, count-weighted log p(w | theta_d, beta).

    Exactly the reference's eval_heldout (heldout.py:88-97): per doc,
    sum_v c_v * log(theta_d @ beta[:, v]) / sum_v c_v, then the mean
    over documents.  float64 on host for parity.
    """
    theta = np.asarray(theta, np.float64)
    beta = np.asarray(beta, np.float64)
    if isinstance(heldout, PaddedCorpus):
        heldout = to_bow(heldout)
    doc_ll = []
    for i, doc in enumerate(heldout):
        if len(doc) == 0:
            continue
        ids = np.asarray([w for w, _ in doc], dtype=np.int64)
        cts = np.asarray([c for _, c in doc], dtype=np.float64)
        p = theta[i] @ beta[:, ids]
        with np.errstate(divide="ignore"):
            word_ll = cts * np.log(p)
        doc_ll.append(np.sum(word_ll) / np.sum(cts))
    return float(np.mean(doc_ll))


@jax.jit
def _eval_heldout_jax_core(words, counts, doc_ok, theta, beta):
    p = jnp.einsum("nk,knl->nl", theta, jnp.take(beta, words, axis=1))
    mask = counts > 0
    logp = jnp.where(mask, jnp.log(jnp.maximum(p, 1e-35)), 0.0)
    doc_tot = jnp.sum(counts * logp, axis=1)
    doc_n = jnp.maximum(jnp.sum(counts, axis=1), 1e-30)
    per_doc = doc_tot / doc_n
    w = doc_ok.astype(per_doc.dtype)
    return jnp.sum(per_doc * w) / jnp.maximum(jnp.sum(w), 1.0)


def eval_heldout_jax(words, counts, doc_ok, theta, beta):
    """Batched heldout likelihood on device.

    words/counts: (N, L) padded heldout halves; theta (N, K) from the
    completion fit; beta (K, V) from the full fit.

    Word ids are validated against beta's vocabulary on the host first:
    ``jnp.take`` CLAMPS out-of-range ids, which would silently score a
    mis-encoded heldout set on wrong probabilities — the numpy parity
    anchor (:func:`eval_heldout`) raises on the same input.
    """
    V = beta.shape[-1]
    live = np.asarray(counts) > 0
    wh = np.asarray(words)
    max_id = int(wh[live].max()) if live.any() else -1
    if max_id >= V:
        raise ValueError(
            f"heldout contains word id {max_id} but beta has only {V} "
            "terms — encoded with a different vocabulary?"
        )
    return _eval_heldout_jax_core(words, counts, doc_ok, theta, beta)


def cut_in_half(doc_set):
    """Even/odd unique-term split of each document (heldout.py:70-85)."""
    if isinstance(doc_set, PaddedCorpus):
        doc_set = to_bow(doc_set)
    first, second = [], []
    for doc in doc_set:
        first.append(list(doc[0::2]))
        second.append(list(doc[1::2]))
    return first, second


def split_corpus(
    documents: Sequence,
    proportion: float = 0.8,
    validation_set: bool = False,
    document_completion: bool = True,
):
    """Sequential train/test(/validate) split + document-completion halves.

    Mirrors CorpusCreation.split_corpus (generate_docs.py:381-417):
    returns a dict with train/test (and test_1/test_2, validate).
    """
    if isinstance(documents, PaddedCorpus):
        documents = to_bow(documents)
    documents = list(documents)
    n = len(documents)
    test_idx = int(proportion * n)
    out = {"train": documents[:test_idx]}
    if validation_set:
        val_idx = int((proportion + (1 - proportion) / 2) * n)
        out["test"] = documents[test_idx:val_idx]
        out["validate"] = documents[val_idx:]
    else:
        out["test"] = documents[test_idx:]
    if document_completion:
        out["test_1"], out["test_2"] = cut_in_half(out["test"])
    return out
