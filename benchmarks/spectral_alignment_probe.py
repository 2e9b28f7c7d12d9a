"""Cross-model alignment probe for the completion-heldout protocol.

The reference's completion protocol (05_train.py) scores beta from one
fit against theta from ANOTHER fit — it implicitly rewards topic
alignment between the two models.  The round-5 decomposition showed
that with artificially aligned inits our fit scores -6.98/-7.03 on
wiki (spectral_init_diag.py cross fits), while the real per-model
spectral inits score -9.37/-9.66 (spectral_device_ab.py) vs the
reference's -8.56 — so the h2h gap is an ALIGNMENT gap, not a
fit-quality gap.  This script measures where the alignment is lost:

  A. init alignment: anchor overlap + greedy cosine matching between
     the docs_beta-init and docs_theta-init betas, ours (gram_norm
     none/l1) vs the reference's exact pipeline;
  B. fit drift: for each pipeline, greedy cosine matching between the
     two FITTED betas (ours CPU fits; the reference's fits are hours —
     reuse its h2h artifacts when present);
  C. the candidate fix: ours with likelihood_temper (the round-4
     shrinkage capability) — does tempering keep the two fits aligned
     the way the reference's damped-gradient bug keeps its?

Writes benchmarks/results_spectral_alignment.json incrementally.
CPU-only.

Usage (cwd must be the repo root):
  python benchmarks/spectral_alignment_probe.py [stageA|stageB|stageC|stageD|stageDsynth]

stageD / stageDsynth measure the init_beta capability: spectral init
computed once on the shared train docs, injected into both fits via
the public STM kwarg (wiki K=50 / the h2h synth config).
"""

import json
import os
import sys
import time

import numpy as np

HERE = os.path.join(os.path.abspath(os.getcwd()), "benchmarks")
sys.path.insert(0, HERE)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

OUT = os.path.join(HERE, "results_spectral_alignment.json")
K = 50
ITERS = 25


def greedy_match(beta_a, beta_b):
    """Greedy cosine matching of rows; returns mean matched cosine and
    the fraction of pairs above 0.8."""
    a = beta_a / np.linalg.norm(beta_a, axis=1, keepdims=True)
    b = beta_b / np.linalg.norm(beta_b, axis=1, keepdims=True)
    S = a @ b.T
    S = S.copy()
    sims = []
    for _ in range(S.shape[0]):
        i, j = np.unravel_index(np.argmax(S), S.shape)
        sims.append(float(S[i, j]))
        S[i, :] = -np.inf
        S[:, j] = -np.inf
    sims = np.array(sims)
    return float(sims.mean()), float((sims > 0.8).mean())


def load():
    from quality_h2h import load_wiki, split_completion

    docs, vocab, X = load_wiki()
    train, test, test_1, test_2 = split_completion(docs)
    return (docs, vocab, X, train + test, train + test_1,
            len(test_1), test_2)


def stage_a(results):
    from spectral_init_diag import ours_init_stepwise, ref_init_stepwise

    docs, vocab, X, docs_beta, docs_theta, n_test1, test_2 = load()
    V = len(vocab)
    out = {}
    inits = {}
    for name, fn in (
        ("ours_none", lambda d: ours_init_stepwise(d, V, gram_norm="none")),
        ("ours_l1", lambda d: ours_init_stepwise(d, V, gram_norm="l1")),
        ("ref_exact", lambda d: ref_init_stepwise(d, V)),
    ):
        t0 = time.perf_counter()
        a = fn(docs_beta)
        b = fn(docs_theta)
        inits[name] = a
        overlap = len(set(a["anchors"].tolist()) & set(b["anchors"].tolist()))
        mean_cos, frac08 = greedy_match(a["beta"], b["beta"])
        out[name] = {
            "anchor_overlap_beta_vs_theta": overlap,
            "init_beta_mean_matched_cosine": mean_cos,
            "init_beta_frac_cos_gt_0.8": frac08,
            "seconds": round(time.perf_counter() - t0, 1),
        }
        print(name, json.dumps(out[name]), flush=True)
    # ours-vs-ref on the same corpus (parity check of the fixed init)
    a_ours, a_ref = inits["ours_none"], inits["ref_exact"]
    out["ours_none_vs_ref_same_corpus"] = {
        "anchor_overlap": len(set(a_ours["anchors"].tolist())
                              & set(a_ref["anchors"].tolist())),
        "mean_matched_cosine": greedy_match(a_ours["beta"], a_ref["beta"])[0],
    }
    results["stageA_init_alignment"] = out
    return results


def _fit(corpus, vocab, X, temper, seed, gram_norm="none"):
    from strutopy_tpu.models.config import STMConfig
    from strutopy_tpu.models.stm import STM

    from quality_h2h import SEED

    import strutopy_tpu.models.stm as stm_mod
    import strutopy_tpu.ops.spectral as spec_mod

    def patched(corpus_, K_, V_=None, **kw):
        kw["gram_norm"] = gram_norm
        return spec_mod.spectral_init(corpus_, K_, V_, **kw)

    stm_mod.spectral_init = patched

    # mirror the STM kwargs path's defaults (two-pass on at >=10 iters)
    # so the untempered cell reproduces spectral_device_ab's fits
    cfg = STMConfig(
        K=K, model_type="STM", mode="ols", init_type="spectral",
        max_em_iter=ITERS, convergence_threshold=1e-5,
        newton_pass1_iters=6, newton_straggler_frac=0.25,
        newton_warmup_iters=2,
        likelihood_temper=1.0 if temper is None else temper,
        seed=SEED if seed is None else seed,
    )
    m = STM(documents=corpus, dictionary=vocab, X=X[: len(corpus)],
            config=cfg)
    m.expectation_maximization(saving=False)
    return (np.asarray(m.beta, np.float64), np.asarray(m.theta, np.float64))


def stage_bc(results, cells=((None, "none"), (0.6, "none"), (0.45, "none"),
                             (0.3, "none"), (0.6, "l1"), (0.45, "l1"))):
    from quality_h2h import score

    docs, vocab, X, docs_beta, docs_theta, n_test1, test_2 = load()
    for temper, norm in cells:
        tag = ("untempered" if temper is None else f"temper_{temper}") + (
            "" if norm == "none" else f"_{norm}")
        key = f"stageBC_fit_{tag}"
        if key in results:
            continue
        t0 = time.perf_counter()
        beta_b, _ = _fit(docs_beta, vocab, X, temper, None, norm)
        beta_t, theta_t = _fit(docs_theta, vocab, X, temper, None, norm)
        mean_cos, frac08 = greedy_match(beta_b, beta_t)
        entry = {
            "fitted_beta_mean_matched_cosine": mean_cos,
            "fitted_beta_frac_cos_gt_0.8": frac08,
            "seconds": round(time.perf_counter() - t0, 1),
        }
        entry.update(score(beta_b, theta_t[-n_test1:], test_2, docs_beta))
        results[key] = entry
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)
        print(key, json.dumps(entry), flush=True)
    return results


def stage_d(results):
    """The capability cell: spectral init computed ONCE on the shared
    `train` docs (both protocol corpora contain them; no completion-half
    leakage), injected into BOTH fits via the public STM init_beta
    kwarg.  This is what the reference cannot do without code edits —
    its init is internal to STM.__init__ (stm.py:420-434) and recomputed
    per corpus, so its two fits only stay aligned by virtue of the
    damped-gradient bug freezing them near their (partially agreeing)
    inits."""
    from quality_h2h import SEED, score

    from strutopy_tpu.models.stm import STM
    from strutopy_tpu.ops.spectral import spectral_init

    docs, vocab, X, docs_beta, docs_theta, n_test1, test_2 = load()
    V = len(vocab)
    # docs_beta = train + test, docs_theta = train + test_1 (same order)
    train = docs_beta[: len(docs_theta) - n_test1]
    key = "stageD_shared_train_init"
    if key in results:
        return results
    t0 = time.perf_counter()
    beta0 = np.asarray(spectral_init(train, K, V), np.float64)
    init_s = time.perf_counter() - t0
    betas, thetas = {}, {}
    for tag, corpus in (("beta", docs_beta), ("theta", docs_theta)):
        m = STM(documents=corpus, dictionary=vocab, X=X[: len(corpus)],
                K=K, model_type="STM", mode="ols", init_beta=beta0,
                max_em_iter=ITERS, convergence_threshold=1e-5, seed=SEED)
        m.expectation_maximization(saving=False)
        betas[tag] = np.asarray(m.beta, np.float64)
        thetas[tag] = np.asarray(m.theta, np.float64)
    mean_cos, frac08 = greedy_match(betas["beta"], betas["theta"])
    entry = {
        "init_seconds": round(init_s, 1),
        "fitted_beta_mean_matched_cosine": mean_cos,
        "fitted_beta_frac_cos_gt_0.8": frac08,
        "seconds": round(time.perf_counter() - t0, 1),
    }
    entry.update(score(betas["beta"], thetas["theta"][-n_test1:], test_2,
                       docs_beta))
    results[key] = entry
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print(key, json.dumps(entry), flush=True)
    return results


def stage_d_synth(results, tempers=(None, 0.6, 0.45, 0.3)):
    """stage_d at the h2h's synth config (K=100, V=10k, N=4,096) — the
    config where the per-corpus-init spectral h2h lost by 1.11 nats.
    Also measures temper on top of the shared init (the two responses
    compose: shared init supplies alignment at iteration 0, tempering
    preserves it through the fit)."""
    from quality_h2h import SEED, make_synth, score, split_completion

    from strutopy_tpu.models.config import STMConfig
    from strutopy_tpu.models.stm import STM
    from strutopy_tpu.ops.spectral import spectral_init

    k_synth = 100
    docs, vocab, X = make_synth()
    train, test, test_1, test_2 = split_completion(docs)
    docs_beta, docs_theta = train + test, train + test_1
    n_test1 = len(test_1)
    V = len(vocab)
    t0 = time.perf_counter()
    beta0 = np.asarray(spectral_init(train, k_synth, V), np.float64)
    init_s = time.perf_counter() - t0
    for temper in tempers:
        key = "stageD_shared_train_init_synth" + (
            "" if temper is None else f"_temper_{temper}")
        if key in results:
            continue
        t1 = time.perf_counter()
        betas, thetas = {}, {}
        cfg = STMConfig(
            K=k_synth, model_type="STM", mode="ols",
            max_em_iter=ITERS, convergence_threshold=1e-5,
            newton_pass1_iters=6, newton_straggler_frac=0.25,
            newton_warmup_iters=2,
            likelihood_temper=1.0 if temper is None else temper,
            seed=SEED)
        for tag, corpus in (("beta", docs_beta), ("theta", docs_theta)):
            m = STM(documents=corpus, dictionary=vocab, X=X[: len(corpus)],
                    config=cfg, init_beta=beta0)
            m.expectation_maximization(saving=False)
            betas[tag] = np.asarray(m.beta, np.float64)
            thetas[tag] = np.asarray(m.theta, np.float64)
        mean_cos, frac08 = greedy_match(betas["beta"], betas["theta"])
        entry = {
            "init_seconds": round(init_s, 1),
            "fitted_beta_mean_matched_cosine": mean_cos,
            "fitted_beta_frac_cos_gt_0.8": frac08,
            "seconds": round(time.perf_counter() - t1, 1),
        }
        entry.update(score(betas["beta"], thetas["theta"][-n_test1:], test_2,
                           docs_beta))
        results[key] = entry
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)
        print(key, json.dumps(entry), flush=True)
    return results


def main():
    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    stages = sys.argv[1:] or ["stageA", "stageB"]
    if "stageA" in stages and "stageA_init_alignment" not in results:
        results = stage_a(results)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)
    if "stageB" in stages or "stageC" in stages:
        results = stage_bc(results)
    if "stageD" in stages:
        results = stage_d(results)
    if "stageDsynth" in stages:
        results = stage_d_synth(results)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
