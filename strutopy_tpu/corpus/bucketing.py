"""Length bucketing for ragged corpora.

Documents are bags of unique terms with skewed lengths (the reference
wiki corpus: p50=51 unique terms, max=234 — padding all docs to the
global max wastes ~3.9x E-step compute; SURVEY.md §5 "length
bucketing/padding of ragged documents").  Buckets partition documents
by unique-term count into a few lane-aligned length classes; the E-step
runs per bucket at its own (static) L.

Storage layout: device-major, bucket-minor.  Each bucket is padded so
its per-device shard is a multiple of its scan batch; a device's slice
of the full state array holds its contiguous piece of every bucket, in
bucket order.  Inside the (possibly shard_map'ed) EM step the bucket
offsets therefore derive purely from local shapes, making the same code
correct with and without a mesh.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from strutopy_tpu.corpus.bow import LANE, PaddedCorpus, _round_up



def plan_bounds(
    lens: np.ndarray,
    lane: int = LANE,
    max_buckets: int = 4,
    min_frac: float = 0.04,
) -> List[int]:
    """Choose bucket length bounds (multiples of ``lane``): start from
    all lane multiples covering the data, merge under-filled buckets
    upward, keep at most ``max_buckets``."""
    lens = np.asarray(lens)
    max_len = max(int(lens.max()), 1)
    bounds = [lane * i for i in range(1, _round_up(max_len, lane) // lane + 1)]
    n = len(lens)
    while len(bounds) > 1:
        counts = []
        lo = 0
        for b in bounds:
            counts.append(int(((lens > lo) & (lens <= b)).sum()))
            lo = b
        mergeable = [(c, i) for i, c in enumerate(counts[:-1]) if c < min_frac * n]
        if not mergeable and len(bounds) <= max_buckets:
            break
        if mergeable:
            _, i = min(mergeable)
        else:
            _, i = min((c, i) for i, c in enumerate(counts[:-1]))
        bounds.pop(i)
    return bounds


@dataclasses.dataclass(frozen=True)
class BucketPlan:
    """Assignment of documents to length buckets (device-major storage).

    Per (non-empty) bucket: its max length ``Ls[b]``, the user doc ids
    ``doc_ids[b]``, the padded total size ``sizes[b]`` (multiple of
    n_devices * batch_sizes[b]) and the per-device scan batch.
    ``storage_index[i]`` maps user doc i to its row in the
    device-major-concatenated state arrays.
    """

    Ls: Tuple[int, ...]
    doc_ids: Tuple[np.ndarray, ...]
    sizes: Tuple[int, ...]
    batch_sizes: Tuple[int, ...]
    storage_index: np.ndarray
    n_storage: int
    n_devices: int

    @property
    def n_buckets(self) -> int:
        return len(self.Ls)

    def padded_area(self) -> int:
        """Total words-slots the bucketed E-step processes."""
        return sum(s * L for s, L in zip(self.sizes, self.Ls))


def make_bucket_plan(
    corpus: PaddedCorpus,
    batch_size: int,
    n_devices: int = 1,
    lane: int = LANE,
    max_buckets: int = 4,
) -> BucketPlan:
    # bucket by the LAST nonzero column + 1 (not the nonzero count), so
    # trimming a bucket to its L is safe even for user-built
    # PaddedCorpus rows that are not front-packed.  doc_ok=False rows
    # count as empty (their counts are zeroed in split_corpus_by_plan),
    # so every user doc lands in bucket 0 and owns a storage row.
    L = corpus.L
    nz = (corpus.counts > 0) & corpus.doc_ok[:, None]
    last_nz = np.where(nz.any(axis=1), L - np.argmax(nz[:, ::-1], axis=1), 0)
    lens = np.maximum(last_nz, 1)
    bounds = plan_bounds(lens[corpus.doc_ok] if corpus.doc_ok.any() else lens,
                         lane=lane, max_buckets=max_buckets)

    Ls, doc_ids, sizes, batches = [], [], [], []
    lo = 0
    for b in bounds:
        ids = np.nonzero((lens > lo) & (lens <= b))[0]
        lo = b
        if len(ids) == 0:
            continue
        per_dev = -(-len(ids) // n_devices)
        B = min(batch_size, _round_up(per_dev, 8))
        per_dev_pad = _round_up(per_dev, B)
        Ls.append(min(b, corpus.L))
        doc_ids.append(ids)
        sizes.append(per_dev_pad * n_devices)
        batches.append(B)

    n_storage = sum(sizes)
    shard = n_storage // n_devices
    storage_index = np.zeros(corpus.N, np.int64)
    off_local = 0
    for ids, size in zip(doc_ids, sizes):
        per_dev = size // n_devices
        r = np.arange(len(ids))
        d = r // per_dev
        j = r % per_dev
        storage_index[ids] = d * shard + off_local + j
        off_local += per_dev
    return BucketPlan(
        Ls=tuple(Ls),
        doc_ids=tuple(doc_ids),
        sizes=tuple(sizes),
        batch_sizes=tuple(batches),
        storage_index=storage_index,
        n_storage=n_storage,
        n_devices=n_devices,
    )


def split_corpus_by_plan(corpus: PaddedCorpus, plan: BucketPlan) -> List[PaddedCorpus]:
    """Per-bucket PaddedCorpus, trimmed to the bucket's L and padded to
    the planned size with dummy docs.

    doc_ok=False rows get their counts zeroed: masked documents must
    behave exactly like padding (eta frozen at 0, no contribution to
    any statistic) even if a user-built PaddedCorpus left counts in
    masked rows.
    """
    out = []
    for ids, L, size in zip(plan.doc_ids, plan.Ls, plan.sizes):
        ok = corpus.doc_ok[ids]
        sub = PaddedCorpus(
            words=np.ascontiguousarray(corpus.words[ids][:, :L]),
            counts=np.ascontiguousarray(corpus.counts[ids][:, :L])
            * ok[:, None].astype(corpus.counts.dtype),
            doc_ok=ok,
            V=corpus.V,
        ).pad_docs_to(size)
        out.append(sub)
    return out


def gather_per_bucket(values: np.ndarray, plan: BucketPlan, fill=0):
    """Split a user-ordered per-doc array into padded per-bucket arrays."""
    out = []
    for ids, size in zip(plan.doc_ids, plan.sizes):
        shape = (size,) + values.shape[1:]
        arr = np.full(shape, fill, dtype=values.dtype)
        arr[: len(ids)] = values[ids]
        out.append(arr)
    return out
