"""Stemming, n-grams, JSON reading, new plots, estimate_effect."""

import json

import numpy as np
import pytest

from strutopy_tpu.corpus.stem import porter_stem, stem_tokens
from strutopy_tpu.corpus.ngrams import apply_bigrams, learn_bigrams, ngram_docs
from strutopy_tpu.corpus.preprocess import build_corpus
from strutopy_tpu.corpus.acquire import load_texts_json
from strutopy_tpu.corpus.bow import Vocabulary
from strutopy_tpu.eval.effects import estimate_effect, plot_effect
from strutopy_tpu.eval import plots


def test_porter_stemmer_classic_cases():
    cases = {
        "caresses": "caress", "ponies": "poni", "ties": "ti",
        "caress": "caress", "cats": "cat", "agreed": "agre",
        "plastered": "plaster", "motoring": "motor", "sing": "sing",
        "conflated": "conflat", "troubling": "troubl", "sized": "size",
        "hopping": "hop", "relational": "relat", "conditional": "condit",
        "vietnamization": "vietnam", "predication": "predic",
        "triplicate": "triplic", "formative": "form", "formalize": "formal",
        "revival": "reviv", "allowance": "allow", "inference": "infer",
        "probate": "probat", "rate": "rate", "cease": "ceas",
        "controll": "control", "roll": "roll",
    }
    for word, want in cases.items():
        assert porter_stem(word) == want, (word, porter_stem(word), want)


def test_bigram_learning_and_merge():
    docs = [["new", "york", "city"]] * 20 + [["old", "york"]] * 2
    merges = learn_bigrams(docs, min_count=5, threshold=1.0)
    assert ("new", "york") in merges
    merged = apply_bigrams(["new", "york", "is", "big"], merges)
    assert merged[0] == "new_york"
    out, m = ngram_docs(docs, min_count=5, threshold=1.0)
    assert out[0][0] == "new_york"


def test_build_corpus_with_stem_and_ngrams():
    texts = ["the running dogs kept running fast"] * 6 + [
        "machine learning models machine learning" for _ in range(6)
    ]
    bow, vocab = build_corpus(texts, stem=True, ngrams=True,
                              ngram_min_count=3, ngram_threshold=1.0)
    toks = set(vocab)
    # bigram collocations detected and merged, then stemmed
    assert "machine_learn" in toks
    # plain tokens are stemmed ("learning" -> "learn")
    assert "learn" in toks


def test_load_texts_json(tmp_path):
    recs = [{"text": "alpha beta", "y": 1}, {"text": "gamma", "y": 0}]
    p1 = tmp_path / "a.json"
    p1.write_text(json.dumps(recs))
    texts, labels = load_texts_json(str(p1), label_fields=("y",))
    assert texts == ["alpha beta", "gamma"]
    assert labels[0]["y"] == 1
    p2 = tmp_path / "b.jsonl"
    p2.write_text("\n".join(json.dumps(r) for r in recs))
    texts2, _ = load_texts_json(str(p2))
    assert texts2 == texts


def test_estimate_effect_recovers_planted_effect():
    rng = np.random.default_rng(0)
    N, K = 400, 3
    x = rng.integers(0, 2, N).astype(float)
    theta = np.zeros((N, K))
    theta[:, 0] = 0.2 + 0.3 * x + 0.02 * rng.normal(size=N)
    theta[:, 1] = 0.5 - 0.3 * x + 0.02 * rng.normal(size=N)
    theta[:, 2] = 1.0 - theta[:, 0] - theta[:, 1]
    eff = estimate_effect(theta, x)
    np.testing.assert_allclose(eff["coef"][0, 1], 0.3, atol=0.02)
    np.testing.assert_allclose(eff["coef"][1, 1], -0.3, atol=0.02)
    # CI excludes zero for planted effects
    assert eff["ci"][0, 1, 0] > 0
    assert eff["ci"][1, 1, 1] < 0


def test_effect_curve_and_difference_methods(tmp_path):
    """R-stm plot.estimateEffect 'continuous'/'difference' analogs:
    evaluated on a planted linear model, the curve reproduces the
    analytic line, the difference reproduces the slope times the gap,
    and the delta-method CI matches the coefficient CI where they
    coincide (binary 0->1 contrast in a single-covariate design)."""
    from strutopy_tpu.eval.effects import (
        effect_curve,
        effect_difference,
        plot_effect_continuous,
        plot_effect_difference,
    )

    rng = np.random.default_rng(3)
    N = 600
    x = rng.normal(size=N)
    theta = np.zeros((N, 3))
    theta[:, 0] = 0.3 + 0.10 * x + 0.01 * rng.normal(size=N)
    theta[:, 1] = 0.4 - 0.05 * x + 0.01 * rng.normal(size=N)
    theta[:, 2] = 1.0 - theta[:, 0] - theta[:, 1]
    eff = estimate_effect(theta, x)
    assert eff["vcov"].shape == (3, 2, 2)

    grid = np.linspace(-2, 2, 9)
    curve = effect_curve(eff, covariate=1, values=grid)
    assert curve["mean"].shape == (3, 9)
    np.testing.assert_allclose(curve["mean"][0], 0.3 + 0.10 * grid, atol=0.01)
    np.testing.assert_allclose(curve["mean"][1], 0.4 - 0.05 * grid, atol=0.01)
    # bands are ordered and contain the mean
    assert np.all(curve["ci"][..., 0] <= curve["mean"])
    assert np.all(curve["mean"] <= curve["ci"][..., 1])

    diff = effect_difference(eff, covariate=1, v0=0.0, v1=1.0)
    np.testing.assert_allclose(diff["diff"][0], 0.10, atol=0.01)
    # a 0->1 contrast IS the slope coefficient: same se
    np.testing.assert_allclose(diff["se"], eff["se"][:, 1], rtol=1e-10)

    # topic selection + `at` overrides flow through
    sub = effect_curve(eff, covariate=1, values=[0.0], topics=[2],
                       at={0: 1.0})
    assert sub["topics"] == [2] and sub["mean"].shape == (1, 1)
    with pytest.raises(ValueError, match="out of range"):
        effect_curve(eff, covariate=5, values=[0.0])

    plot_effect_continuous(eff, 1, grid, path=str(tmp_path / "cont.png"))
    plot_effect_difference(eff, 1, 0.0, 1.0, path=str(tmp_path / "diff.png"))
    for f in ("cont.png", "diff.png"):
        assert (tmp_path / f).stat().st_size > 0


def test_effect_pointestimate_method(tmp_path):
    """R-stm plot.estimateEffect 'pointestimate' analog: expected
    proportions AT discrete covariate levels — level means on a planted
    binary design, with the level-0/level-1 gap equal to the slope and
    consistent with effect_difference."""
    from strutopy_tpu.eval.effects import (
        effect_difference,
        effect_point_estimates,
        plot_effect_pointestimate,
    )

    rng = np.random.default_rng(7)
    N = 800
    x = rng.integers(0, 2, N).astype(float)
    theta = np.zeros((N, 3))
    theta[:, 0] = 0.25 + 0.12 * x + 0.01 * rng.normal(size=N)
    theta[:, 1] = 0.45 - 0.08 * x + 0.01 * rng.normal(size=N)
    theta[:, 2] = 1.0 - theta[:, 0] - theta[:, 1]
    eff = estimate_effect(theta, x)

    pts = effect_point_estimates(eff, covariate=1, values=[0.0, 1.0])
    assert pts["mean"].shape == (3, 2) and pts["ci"].shape == (3, 2, 2)
    np.testing.assert_allclose(pts["mean"][0], [0.25, 0.37], atol=0.01)
    np.testing.assert_allclose(pts["mean"][1], [0.45, 0.37], atol=0.01)
    # the level gap IS the difference method's contrast
    diff = effect_difference(eff, covariate=1, v0=0.0, v1=1.0)
    np.testing.assert_allclose(
        pts["mean"][:, 1] - pts["mean"][:, 0], diff["diff"], rtol=1e-10
    )
    assert np.all(pts["ci"][..., 0] <= pts["mean"])
    assert np.all(pts["mean"] <= pts["ci"][..., 1])

    fig = plot_effect_pointestimate(
        eff, 1, [0.0, 1.0], topics=[0, 1],
        value_labels=["control", "treated"],
        path=str(tmp_path / "pt.png"),
    )
    assert fig is not None and (tmp_path / "pt.png").stat().st_size > 0


def test_new_plots_render(tmp_path):
    rng = np.random.default_rng(1)
    beta = rng.dirichlet(np.ones(30), size=4)
    vocab = Vocabulary([f"w{i}" for i in range(30)])
    docs = []
    for _ in range(25):
        ids = rng.choice(30, size=8, replace=False)
        docs.append([(int(w), 1) for w in sorted(ids)])

    plots.plot_topic_words(beta, vocab, n=6, path=str(tmp_path / "tw.png"))
    plots.plot_word_frequencies(docs, vocab, n=10, path=str(tmp_path / "wf.png"))
    plots.plot_tsne_tfidf(docs, labels=rng.integers(0, 2, 25),
                          path=str(tmp_path / "ts.png"))
    eff = estimate_effect(rng.dirichlet(np.ones(3), 25), rng.integers(0, 2, 25))
    plot_effect(eff, path=str(tmp_path / "ef.png"))
    for f in ("tw.png", "wf.png", "ts.png", "ef.png"):
        assert (tmp_path / f).stat().st_size > 0


def test_get_wiki_docs_with_stubbed_fetch(tmp_path):
    """Scraper contract end-to-end on a stubbed MediaWiki API
    (reference src/01_get_wiki_docs.py:10-184): link fetch + pagination,
    prefix filtering, per-seed labels, multi-seed pages keep all labels,
    wiki_corpus.csv column layout."""
    import csv
    import json
    import urllib.parse

    from strutopy_tpu.corpus.acquire import get_wiki_docs

    PAGES = {
        "Statistics": ["Mean", "List of statistics articles", "Bayes"],
        "Machine learning": ["Bayes", "Perceptron"],
    }
    SUMMARIES = {
        "Mean": (11, "Mean", "The mean is an average."),
        "Bayes": (12, "Bayes", "Bayes was a statistician."),
        "Perceptron": (13, "Perceptron", "A perceptron is a model."),
    }

    def fetch(url):
        q = dict(urllib.parse.parse_qsl(urllib.parse.urlsplit(url).query))
        title = q["titles"]
        if q.get("prop") == "links":
            links = [{"title": t} for t in PAGES[title]]
            return json.dumps(
                {"query": {"pages": [{"links": links}]}}
            ).encode()
        if title in SUMMARIES:
            pid, t, text = SUMMARIES[title]
            return json.dumps(
                {"query": {"pages": [{"pageid": pid, "title": t,
                                      "extract": text}]}}
            ).encode()
        return json.dumps({"query": {"pages": [{"missing": True}]}}).encode()

    rows = get_wiki_docs(output_dir=str(tmp_path), fetch=fetch)
    by_title = {r["title"]: r for r in rows}
    assert set(by_title) == {"Mean", "Bayes", "Perceptron"}  # List of... filtered
    assert by_title["Mean"]["statistics"] == 1 and by_title["Mean"]["machine"] == 0
    assert by_title["Perceptron"]["machine"] == 1
    # page reachable from both seeds carries both labels (reference :171-173)
    assert by_title["Bayes"]["statistics"] == 1 and by_title["Bayes"]["machine"] == 1

    with open(tmp_path / "wiki_corpus.csv", newline="") as f:
        header = next(csv.reader(f))
    assert header == ["", "pageid", "text", "title", "statistics", "machine"]

    # and the CSV feeds the existing 01->02 pipeline loader
    from strutopy_tpu.corpus.acquire import load_texts_csv

    texts, labels = load_texts_csv(
        str(tmp_path / "wiki_corpus.csv"),
        label_columns=("statistics", "machine"),
    )
    assert len(texts) == 3 and all(t for t in texts)


def test_removed_by_threshold_counts_exactly():
    from strutopy_tpu.corpus.preprocess import removed_by_threshold

    # term document frequencies by construction (stopwords disabled):
    #   "aaa" in 3 docs (6 tokens), "bbb" in 2 (2), "ccc" in 1 (3)
    texts = ["aaa aaa bbb", "aaa ccc ccc ccc", "aaa aaa aaa bbb"]
    stats = removed_by_threshold(texts, thresholds=[1, 2, 3, 4], stopwords=None)
    assert stats["threshold"] == [1, 2, 3, 4]
    assert stats["words_removed"] == [0, 1, 2, 3]
    assert stats["tokens_removed"] == [0, 3, 5, 11]
    # doc 2 contains only aaa+ccc: survives until aaa drops at thr=4
    assert stats["docs_removed"] == [0, 0, 0, 3]


def test_plot_removed_renders(tmp_path):
    from strutopy_tpu.corpus.preprocess import removed_by_threshold

    texts = ["aaa aaa bbb", "aaa ccc ccc", "aaa bbb ddd"]
    stats = removed_by_threshold(texts, thresholds=[1, 2, 3], stopwords=None)
    plots.plot_removed(stats, path=str(tmp_path / "rm.png"))
    assert (tmp_path / "rm.png").stat().st_size > 0


def test_align_corpus_encodes_against_fitted_vocab():
    from strutopy_tpu.corpus.preprocess import align_corpus, build_corpus

    train_texts = [
        "alpha beta gamma alpha", "beta gamma delta",
        "alpha delta delta gamma", "gamma beta alpha",
    ]
    bow, vocab = build_corpus(train_texts, stopwords=None)
    new_bow, report = align_corpus(
        ["alpha alpha zeta beta", "zeta zeta eta"], vocab, stopwords=None
    )
    # first doc: alpha x2 + beta, zeta dropped
    ids = {t: i for i, t in enumerate(vocab)}
    assert new_bow[0] == sorted([(ids["alpha"], 2), (ids["beta"], 1)])
    # second doc: fully OOV
    assert new_bow[1] == []
    assert report == {"tokens_dropped": 4, "oov_types": 2, "docs_emptied": 1}
    # pre-tokenized input works too
    tok_bow, _ = align_corpus([["alpha", "beta"]], vocab)
    assert tok_bow[0] == sorted([(ids["alpha"], 1), (ids["beta"], 1)])


def test_plot_perspectives_renders(tmp_path):
    rng = np.random.default_rng(2)
    beta = rng.dirichlet(np.ones(40), size=3)
    vocab = Vocabulary([f"w{i}" for i in range(40)])
    plots.plot_perspectives(beta, vocab, topics=(0, 2), n=15,
                            path=str(tmp_path / "p2.png"))
    beta3 = rng.dirichlet(np.ones(40), size=(2, 3))
    plots.plot_perspectives(beta3, vocab, topics=1, aspects=(0, 1), n=15,
                            path=str(tmp_path / "p3.png"))
    for f in ("p2.png", "p3.png"):
        assert (tmp_path / f).stat().st_size > 0
    import pytest

    with pytest.raises(ValueError, match="aspects"):
        plots.plot_perspectives(beta3, vocab, topics=(0, 1))


def test_plot_search_k_renders(tmp_path):
    results = {
        5: {"heldout": -7.1, "dispersion": 1.4, "coherence": -80.0,
            "bound": -1e5, "exclusivity": 9.0, "fit_seconds": 1.0},
        "10": {"heldout": -7.0, "dispersion": 1.2, "coherence": -85.0,
               "bound": -9e4, "exclusivity": 9.2, "fit_seconds": 1.2},
    }
    plots.plot_search_k(results, path=str(tmp_path / "sk.png"))
    assert (tmp_path / "sk.png").stat().st_size > 0


def test_align_corpus_native_matches_python():
    from strutopy_tpu.corpus.preprocess import align_corpus, build_corpus

    rng = np.random.default_rng(7)
    words = [f"tok{i}" for i in range(300)] + ["naïve", "café", "中文"]
    train = [" ".join(rng.choice(words, 40)) for _ in range(50)]
    _, vocab = build_corpus(train)
    reqs = [" ".join(rng.choice(words + ["zzz", "qqq"], 30)) for _ in range(80)]
    reqs.append("the and of")   # all stopwords
    reqs.append("zzz qqq zzz")  # fully OOV
    b_nat, r_nat = align_corpus(reqs, vocab, use_native=True)
    b_py, r_py = align_corpus(reqs, vocab, use_native=False)
    assert b_nat == b_py
    assert r_nat == r_py
    assert r_py["oov_types"] >= 2 and r_py["docs_emptied"] >= 1
