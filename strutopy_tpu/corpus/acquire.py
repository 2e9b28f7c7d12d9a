"""Data acquisition: the reference's wiki-scraper contract.

Reference src/01_get_wiki_docs.py scrapes Wikipedia summaries for the
"Statistics" and "Machine learning" link graphs and writes
``wiki_corpus.csv`` with columns (pageid, text, title, statistics, ml).
This environment has no network egress, so the scraper is provided as a
contract-compatible loader: any CSV/dataframe with a text column (and
optional label columns) enters the same downstream pipeline
(``corpus.preprocess.build_corpus`` -> STM).
"""

from __future__ import annotations

import csv
from typing import Sequence

from strutopy_tpu.corpus.preprocess import build_corpus


def load_texts_csv(path: str, text_column: str = "text", label_columns: Sequence[str] = ()):
    """Load (texts, labels) from a CSV with the wiki_corpus.csv layout."""
    texts, labels = [], []
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            texts.append(row[text_column])
            labels.append({c: row.get(c) for c in label_columns})
    return texts, labels


def load_texts_json(path: str, text_field: str = "text", label_fields: Sequence[str] = ()):
    """Load (texts, labels) from JSON: a list of objects, or JSON-lines.

    Covers the README-promised "Text Reading for various filetypes
    (*.csv, *.json)".
    """
    import json

    with open(path) as f:
        # skip leading whitespace/BOM before dispatching array vs lines
        head = ""
        while True:
            ch = f.read(1)
            if not ch:
                break
            if not ch.isspace() and ch != "﻿":
                head = ch
                break
        f.seek(0)
        if head == "[":
            records = json.load(f)
        else:  # JSON lines
            records = [json.loads(line) for line in f if line.strip()]
    texts = [r[text_field] for r in records]
    labels = [{c: r.get(c) for c in label_fields} for r in records]
    return texts, labels


def corpus_from_csv(
    path: str,
    text_column: str = "text",
    label_columns: Sequence[str] = (),
    min_doc_freq: int = 2,
    max_doc_frac: float = 0.5,
):
    """CSV -> (bow, vocabulary, labels): the 01->02 pipeline in one call.

    Mirrors the reference's preprocessing defaults (punctuation/digit
    stripping + stopword removal, src/02_create_corpus.py:23-35).
    """
    texts, labels = load_texts_csv(path, text_column, label_columns)
    bow, vocab = build_corpus(
        texts, min_doc_freq=min_doc_freq, max_doc_frac=max_doc_frac
    )
    return bow, vocab, labels


def get_wiki_docs(*args, **kwargs):
    """The reference's scraper entry point (src/01_get_wiki_docs.py).

    Requires network access to wikipedia.org, which this environment
    does not have; use :func:`corpus_from_csv` on a pre-downloaded
    ``wiki_corpus.csv`` instead.
    """
    raise RuntimeError(
        "get_wiki_docs needs network access to wikipedia.org; this "
        "environment has no egress. Load a pre-scraped CSV with "
        "corpus_from_csv(path) instead."
    )
