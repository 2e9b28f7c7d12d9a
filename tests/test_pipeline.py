"""Pipeline-layer tests: synth-corpora grid, heldout harness, find-K, CLI."""

import json
import os
import pickle

import numpy as np
import pytest

from strutopy_tpu import pipeline


def test_create_synthetic_corpora(tmp_path):
    out = pipeline.create_synthetic_corpora(
        K=3, gamma_factors=(1, 5), n_corpora=2, n_docs=30, n_words=40, V=120,
        output_dir=str(tmp_path),
    )
    assert set(out.keys()) == {1, 5}
    assert len(out[1]) == 2
    cc = out[1][0]
    assert len(cc.train_docs) == 24 and len(cc.test_docs) == 6
    d = tmp_path / "K3_gf1" / "0"
    for name in ("train_docs", "test_docs", "test_1_docs", "test_2_docs"):
        assert (d / f"{name}.pickle").exists()
    assert (d / "theta_true.npy").exists()


def test_train_and_eval_heldout(toy_corpus, toy_metadata):
    ll, mb, mt = pipeline.train_and_eval_heldout(
        toy_corpus.train_docs,
        toy_corpus.test_docs,
        K=3,
        X=toy_metadata,
        model_type="CTM",
        init_type="random",
        max_em_iter=2,
    )
    assert ll < 0  # may be -inf with random init, like the reference
    assert mb.beta.shape[0] == 3


def test_find_k(toy_corpus, toy_metadata):
    res = pipeline.find_k(
        toy_corpus.documents,
        K_candidates=[3, 4],
        X=toy_metadata,
        model_types=("CTM",),
        init_type="random",
        max_em_iter=2,
    )
    assert set(res["CTM"].keys()) == {3, 4}
    for v in res["CTM"].values():
        assert v < 0


def test_search_k_full_diagnostics(toy_corpus):
    res = pipeline.search_k(
        toy_corpus.documents,
        K_candidates=[3],
        init_type="random",
        max_em_iter=2,
        model_type="CTM",
    )
    row = res[3]
    assert set(row) == {"heldout", "bound", "coherence", "exclusivity",
                        "dispersion", "fit_seconds"}
    assert row["heldout"] < 0 and row["coherence"] < 0
    assert row["dispersion"] > 0 and row["fit_seconds"] > 0


def test_select_model_cast_out_protocol(toy_corpus, toy_metadata):
    """R-stm selectModel analog: runs random restarts, keeps the top
    fraction by bound, continues survivors, reports the frontier."""
    res = pipeline.select_model(
        toy_corpus.documents,
        K=3,
        runs=4,
        X=toy_metadata,
        cast_iters=2,
        keep=2,
        max_em_iter=4,
        seed=7,
    )
    assert len(res["runs"]) == 4
    assert len(res["kept"]) == 2 and len(res["models"]) == 2
    assert res["selected"] in res["kept"]
    cast = [r["cast_bound"] for r in res["runs"]]
    # the kept runs are exactly the top-2 by stage-1 bound
    assert sorted(res["kept"]) == sorted(
        sorted(range(4), key=lambda i: -cast[i])[:2]
    )
    for i, r in enumerate(res["runs"]):
        assert r["kept"] == (i in res["kept"])
        if r["kept"]:
            assert np.isfinite(r["bound"])
            assert len(r["semcoh_topics"]) == 3
            assert len(r["exclusivity_topics"]) == 3
        else:
            assert "bound" not in r

    # continuity: the two-phase (cast + continue) trajectory is the
    # SAME EM run as a single uninterrupted fit from that seed — the
    # Laplace bound need not be monotone, but it must be identical
    sel = res["selected"]
    from strutopy_tpu.models.stm import STM

    direct = STM(
        toy_corpus.documents, K=3, X=toy_metadata, init_type="random",
        max_em_iter=4, seed=res["runs"][sel]["seed"],
    )
    direct.expectation_maximization(saving=False)
    assert direct.last_bounds[-1] == res["runs"][sel]["bound"]
    # the returned models are independent fitted snapshots
    m0, m1 = res["models"]
    assert m0.beta.shape == m1.beta.shape == (3, m0.V)
    assert not np.allclose(m0.beta, m1.beta)
    assert float(m0.last_bounds[-1]) == res["runs"][res["kept"][0]]["bound"]
    # bounds list: cast_iters + continued iterations, one per EM iter
    assert len(m0.last_bounds) >= 3

    # the frontier plot renders from the result dict
    import matplotlib

    matplotlib.use("Agg")
    from strutopy_tpu.eval.plots import plot_select_model

    fig = plot_select_model(res)
    assert fig is not None


def test_select_model_reproducible_and_guards(toy_corpus):
    r1 = pipeline.select_model(
        toy_corpus.documents, K=3, runs=2, cast_iters=1, keep=1,
        max_em_iter=2, seed=11, return_models=False,
    )
    r2 = pipeline.select_model(
        toy_corpus.documents, K=3, runs=2, cast_iters=1, keep=1,
        max_em_iter=2, seed=11, return_models=False,
    )
    assert r1["runs"] == r2["runs"] and r1["models"] == []
    with pytest.raises(ValueError, match="cast_iters"):
        pipeline.select_model(
            toy_corpus.documents, K=3, runs=2, cast_iters=3, max_em_iter=3,
        )


def test_many_topics_selects_per_K_best(toy_corpus):
    out = pipeline.many_topics(
        toy_corpus.documents, K_candidates=[3, 4], runs=2, cast_iters=1,
        keep=1, max_em_iter=2, seed=3,
    )
    assert set(out) == {3, 4}
    for K, row in out.items():
        assert row["model"].beta.shape[0] == K
        assert np.isfinite(row["bound"]) and row["coherence"] < 0


def test_reinitialize_requires_random_init(toy_corpus):
    from strutopy_tpu.models.stm import STM

    m = STM(toy_corpus.documents, K=3, init_type="spectral", max_em_iter=1)
    with pytest.raises(ValueError, match="init_type='random'"):
        m.reinitialize(1)
    # random-init model: reinitialize with the construction seed
    # reproduces the construction state exactly
    m2 = STM(toy_corpus.documents, K=3, init_type="random",
             max_em_iter=1, seed=5)
    beta0 = np.asarray(m2._state.beta).copy()
    m2.reinitialize(99)
    assert not np.allclose(np.asarray(m2._state.beta), beta0)
    m2.reinitialize(5)
    np.testing.assert_array_equal(np.asarray(m2._state.beta), beta0)


def test_fit_model_saves_artifacts(tmp_path, toy_corpus, toy_metadata):
    model = pipeline.fit_model(
        toy_corpus.train_docs,
        K=3,
        X=toy_metadata[: len(toy_corpus.train_docs)],
        output_dir=str(tmp_path),
        max_em_iter=2,
        init_type="random",
    )
    assert (tmp_path / "beta_hat.npy").exists()
    assert (tmp_path / "fit_config.json").exists()
    with open(tmp_path / "fit_config.json") as f:
        cfg = json.load(f)
    assert cfg["num_topics"] == 3
    assert np.isfinite(cfg["final_bound"])


def test_cli_synth_and_train_eval(tmp_path):
    from strutopy_tpu.cli import main

    out = tmp_path / "synth"
    main([
        "synth", "--K", "3", "--n-corpora", "1", "--n-docs", "30",
        "--n-words", "40", "--V", "120", "--gamma-factors", "1",
        "--out", str(out),
    ])
    corpus_dir = out / "K3_gf1.0" / "0"
    if not corpus_dir.exists():
        corpus_dir = out / "K3_gf1" / "0"
    assert corpus_dir.exists()
    main([
        "train-eval", "--corpus-dir", str(corpus_dir), "--K", "3",
        "--model", "CTM", "--init", "random", "--max-em-iter", "1",
    ])


def test_cli_select_model(tmp_path, toy_corpus):
    import contextlib
    import io
    import json as _json

    from strutopy_tpu.cli import main

    corpus_path = tmp_path / "c.pickle"
    with open(corpus_path, "wb") as f:
        pickle.dump(toy_corpus.documents, f)
    plot_path = tmp_path / "frontier.png"
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(["select", "--corpus", str(corpus_path), "--K", "3",
              "--runs", "2", "--cast-iters", "1", "--keep", "1",
              "--max-em-iter", "2", "--plot", str(plot_path)])
    out = _json.loads(buf.getvalue()[buf.getvalue().index("{"):])
    assert len(out["runs"]) == 2 and len(out["kept"]) == 1
    assert out["selected"] in out["kept"]
    assert plot_path.exists()


def test_preprocess_build_corpus():
    from strutopy_tpu.corpus.preprocess import build_corpus, tokenize

    toks = tokenize("The quick brown Fox, 42 jumps!")
    assert "the" not in toks and "42" not in toks
    assert "quick" in toks and "fox" in toks

    bow, vocab = build_corpus([
        "statistics is the study of data",
        "machine learning learns from data",
    ])
    assert len(vocab) > 0
    assert all(isinstance(w, int) and c >= 1 for doc in bow for (w, c) in doc)
    # shared term "data" appears in both docs
    data_id = [i for i, t in enumerate(vocab) if t == "data"][0]
    assert all(any(w == data_id for (w, _) in doc) for doc in bow)


def test_train_and_eval_heldout_fast(toy_corpus, toy_metadata):
    """fast=True (single-fit transform completion) agrees in sign and
    rough magnitude with the two-fit reference method."""
    ll_slow, _, _ = pipeline.train_and_eval_heldout(
        toy_corpus.train_docs, toy_corpus.test_docs, K=3,
        X=toy_metadata, model_type="STM", init_type="random", max_em_iter=3,
    )
    ll_fast, mb, mt = pipeline.train_and_eval_heldout(
        toy_corpus.train_docs, toy_corpus.test_docs, K=3,
        X=toy_metadata, model_type="STM", init_type="random", max_em_iter=3,
        fast=True,
    )
    assert mb is mt  # single fit
    assert ll_fast < 0
    assert abs(ll_fast - ll_slow) < 1.0


def test_cli_search_k_and_infer_text(tmp_path, toy_corpus):
    """CLI smoke: search-k prints the diagnostics table; fit + raw-text
    infer round-trip through the saved vocab.json."""
    import json as _json
    import pickle

    from strutopy_tpu.cli import main

    corpus_path = tmp_path / "c.pickle"
    with open(corpus_path, "wb") as f:
        pickle.dump(toy_corpus.documents, f)

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(["search-k", "--corpus", str(corpus_path), "--K", "3",
              "--max-em-iter", "1"])
    table = _json.loads(buf.getvalue()[buf.getvalue().index("{"):])
    assert set(table["3"]) >= {"heldout", "dispersion", "coherence"}

    fit_dir = tmp_path / "fit"
    main(["fit", "--corpus", str(corpus_path), "--K", "3", "--model",
          "CTM", "--init", "random", "--max-em-iter", "1",
          "--out", str(fit_dir)])
    # vocab.json written -> raw-text infer works; toy vocab ids are
    # synthetic strings, so request those tokens directly
    vocab = _json.load(open(fit_dir / "vocab.json"))
    reqs = tmp_path / "reqs.txt"
    reqs.write_text(" ".join(vocab[:5]) + "\n")
    theta_path = tmp_path / "theta.npy"
    main(["infer", "--model-dir", str(fit_dir), "--text", str(reqs),
          "--out", str(theta_path)])
    theta = np.load(theta_path)
    assert theta.shape == (1, 3)
    np.testing.assert_allclose(theta.sum(axis=1), 1.0, atol=1e-5)


def test_load_corpus_mm_native_matches_python(tmp_path, toy_corpus):
    """CLI .mm ingest prefers the C++ parser; both paths must yield the
    same documents (to_bow) and V."""
    from strutopy_tpu.cli import _load_corpus
    from strutopy_tpu.corpus import native
    from strutopy_tpu.corpus.bow import pad_corpus, to_bow
    from strutopy_tpu.corpus.io import read_mm, write_mm

    p = tmp_path / "c.mm"
    write_mm(str(p), toy_corpus.documents)
    loaded = _load_corpus(str(p))
    bow, V = read_mm(str(p), return_V=True)
    ref = pad_corpus(bow, V=V)
    assert loaded.V == ref.V
    # entry order within a doc is parser-dependent (native preserves
    # file order, pad_corpus sorts) and semantically irrelevant
    assert [sorted(d) for d in to_bow(loaded)] == \
           [sorted(d) for d in to_bow(ref)]
    if not native.available():
        import pytest

        pytest.skip("native lib unavailable: fallback path exercised only")


def test_select_model_padded_corpus_and_mesh(toy_corpus, toy_metadata):
    """The CLI's .mm loader hands select_model a PaddedCorpus, and under
    a mesh the stage-2 restore must re-shard the host-parked states —
    both paths must agree with the plain list-docs/no-mesh run."""
    from strutopy_tpu.corpus.bow import pad_corpus
    from strutopy_tpu.parallel.mesh import make_mesh

    kw = dict(K=3, runs=3, X=toy_metadata, cast_iters=2, keep=2,
              max_em_iter=4, seed=11, return_models=False)
    base = pipeline.select_model(toy_corpus.documents, **kw)
    padded = pipeline.select_model(pad_corpus(toy_corpus.documents), **kw)
    meshed = pipeline.select_model(toy_corpus.documents,
                                   mesh=make_mesh(2), **kw)
    for other in (padded, meshed):
        assert other["kept"] == base["kept"]
        assert other["selected"] == base["selected"]
        for a, b in zip(base["runs"], other["runs"]):
            np.testing.assert_allclose(b["cast_bound"], a["cast_bound"],
                                       rtol=1e-4)
            if "bound" in a:
                np.testing.assert_allclose(b["bound"], a["bound"], rtol=1e-4)
