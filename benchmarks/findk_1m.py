#!/usr/bin/env python
"""Heldout model selection at N=1M on ONE chip (VERDICT r3 next #4 —
BASELINE config #5's selection clause at its actual scale, with the
selection protocol hardened beyond a single-seed argmax).

Recipe (composes three previously-validated pieces):
  * corpus: on-device DGP at N=1M, V=50k, count-1 entry layout
    (million_docs.py — host->device transfers stay under the tunnel's
    1 GB crash line), with PLANTED K_true=50 and peaked Dirichlet(0.1)
    thetas (selection needs per-doc signal, findk_100k.py);
  * fits: streamed EM (models/streaming.py), spectral init from a
    100k-doc subsample (the Gram statistic is a mean over documents —
    a 10% uniform subsample estimates the same matrix; fetching the
    full corpus back to host would cross the tunnel's transfer limit),
    2 cold + 8 two-pass iterations;
  * completion: the reference's even/odd split of the LAST 100k docs'
    entries (heldout.py:70-85); theta for the first halves via the
    fast transform (models/serving.py::infer_theta, one E-step under
    the fitted beta/sigma/gamma); float64 per-doc scoring of the
    second halves.

Selection protocol (VERDICT r3 weak #3):
  * per-K heldout MEAN and per-doc STANDARD ERROR (n=100k docs);
  * the 1-SE rule: smallest K whose mean is within one SE of the best
    (the flat-region tie-break findk_100k lacked);
  * semantic coherence (100k-doc subsample) + exclusivity per K as the
    qualitative tie-break columns;
  * seed sensitivity in the flat region: one random-init refit at
    K in {25, 50} (spectral init is deterministic, so restarts only
    make sense off the spectral path).

Writes benchmarks/results_findk_1m.json incrementally (crash-safe).
Usage:  python benchmarks/findk_1m.py   (cwd = repo root; ~1.5-2h)
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/strutopy_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

N, V, N_WORDS, K_TRUE = 1_000_000, 50_000, 300, 50
N_TEST = 100_000
N_SUB = 100_000  # spectral-init / coherence subsample
K_GRID = (25, 50, 100, 200)
N_PARTS = 4
GEN_CHUNK = 5_000
ITERS, WARMUP = 10, 2
HERE = (os.path.dirname(os.path.abspath(__file__))
        if "__file__" in globals() and "<" not in str(globals().get("__file__"))
        else os.path.join(os.getcwd(), "benchmarks"))
OUT = os.path.join(
    HERE,
    "results_findk_1m.json"
    if os.environ.get("FINDK_INIT", "spectral") == "spectral"
    else f"results_findk_1m_{os.environ['FINDK_INIT']}.json")


def gen_corpus():
    """On-device corpus: (word_parts, X) with planted K_true structure."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    beta_true = jnp.asarray(
        rng.dirichlet(np.full(V, 0.02), size=K_TRUE), jnp.float32
    )

    @jax.jit
    def gen_chunk(key, beta_true):
        k1, k2 = jax.random.split(key)
        # peaked Dirichlet(0.1) thetas: normalized Gamma(0.1, 1) draws
        g = jax.random.gamma(k1, 0.1, (GEN_CHUNK, K_TRUE), jnp.float32)
        theta = g / jnp.maximum(jnp.sum(g, axis=1, keepdims=True), 1e-30)
        p = theta @ beta_true
        cdf = jnp.cumsum(p, axis=1)
        cdf = cdf / cdf[:, -1:]
        u = jax.random.uniform(k2, (GEN_CHUNK, N_WORDS), jnp.float32)
        words = jax.vmap(jnp.searchsorted)(cdf, u)
        return jnp.minimum(words, V - 1).astype(jnp.int32)

    n_part = N // N_PARTS
    keys = jax.random.split(jax.random.PRNGKey(7), N // GEN_CHUNK)
    word_parts = []
    for p in range(N_PARTS):
        parts = [
            gen_chunk(keys[p * (n_part // GEN_CHUNK) + i], beta_true)
            for i in range(n_part // GEN_CHUNK)
        ]
        word_parts.append(jnp.concatenate(parts, axis=0))
        word_parts[-1].block_until_ready()
    X = rng.integers(0, 2, N).astype(np.float64)
    return word_parts, X


def heldout_lls(theta, beta, w2, c2, chunk=1024):
    """float64 per-doc completion log-likelihoods (for mean AND SE)."""
    beta = np.asarray(beta, np.float64)
    lls = []
    for s in range(0, len(w2), chunk):
        th = np.asarray(theta[s:s + chunk], np.float64)
        w = w2[s:s + chunk]
        c = np.asarray(c2[s:s + chunk], np.float64)
        bg = beta[:, w]  # (K, b, Lh)
        p = np.einsum("bk,kbl->bl", th, bg)
        ll = np.sum(c * np.log(np.maximum(p, 1e-30)), axis=1)
        tot = np.maximum(np.sum(c, axis=1), 1e-30)
        ok = tot > 1e-30
        lls.append((ll / tot)[ok])
    return np.concatenate(lls)


def main():
    import jax
    import jax.numpy as jnp

    from strutopy_tpu.corpus.bow import PaddedCorpus
    from strutopy_tpu.eval.diagnostics import exclusivity, semantic_coherence
    from strutopy_tpu.models.config import STMConfig
    from strutopy_tpu.models.serving import infer_theta
    from strutopy_tpu.models.state import init_state
    from strutopy_tpu.models.streaming import StreamedEM
    from strutopy_tpu.ops import mstep
    from strutopy_tpu.ops.spectral import spectral_init

    n_part = N // N_PARTS
    t0 = time.time()
    word_parts, X = gen_corpus()
    print(f"on-device corpus generated in {time.time()-t0:.0f}s", flush=True)

    D_np, design = mstep.make_prevalence_design(X, np.ones(N, bool))
    D_parts = [
        jnp.asarray(D_np[p * n_part:(p + 1) * n_part], jnp.float32)
        for p in range(N_PARTS)
    ]
    aspects = jnp.zeros(n_part, jnp.int32)
    doc_ok = jnp.ones(n_part, bool)

    def provider(p):
        return (word_parts[p], jnp.ones((n_part, N_WORDS), jnp.float32),
                aspects, doc_ok, D_parts[p])

    # host-side subsample (120 MB fetch) for spectral init + coherence
    w_sub = np.asarray(word_parts[0][:N_SUB])
    sub_pc = PaddedCorpus(w_sub, np.ones_like(w_sub, np.float32),
                          np.ones(N_SUB, bool), V)
    sub_bow = [[(int(w), 1) for w in row[:40]] for row in w_sub[:50_000]]

    # completion halves of the LAST N_TEST docs (fetched once, 120 MB)
    w_test = np.asarray(word_parts[-1][-N_TEST:])
    w1, w2 = w_test[:, 0::2].copy(), w_test[:, 1::2].copy()
    c1 = np.ones_like(w1, np.float32)
    c2 = np.ones_like(w2, np.float32)
    test1 = PaddedCorpus(w1, c1, np.ones(N_TEST, bool), V)
    D_test = D_np[-N_TEST:]

    results = {"config": {
        "N": N, "V": V, "K_true": K_TRUE, "n_test": N_TEST,
        "K_grid": list(K_GRID), "em_iters": ITERS,
        "protocol": "streamed fits (2 cold + 8 two-pass iters), "
                    + ("spectral init from a 100k subsample"
                       if os.environ.get("FINDK_INIT", "spectral")
                       == "spectral" else "random init (seed 0)")
                    + ", fast-transform completion, f64 per-doc scoring",
    }, "by_K": {}}

    def fit_and_score(K, beta0, tag, seed=0):
        batch = 125 if K >= 200 else 250
        cfg = STMConfig(K=K, model_type="STM", init_type="random",
                        batch_size=batch, sort_by_difficulty=False,
                        newton_pass1_iters=6, newton_straggler_frac=0.25)
        sem = StreamedEM(cfg, design, provider, n_parts=N_PARTS,
                         prefetch=False)
        sem_cold = StreamedEM(cfg.replace(newton_pass1_iters=0), design,
                              provider, n_parts=N_PARTS, prefetch=False)
        part_states = sem.init_parts(jax.random.PRNGKey(seed), K=K, V=V)
        shared = init_state(jax.random.PRNGKey(seed), K=K, V=V, N=n_part,
                            P=D_np.shape[1],
                            beta_init=None if beta0 is None
                            else jnp.asarray(beta0))
        t0 = time.time()
        bounds = []
        for it in range(ITERS):
            stepper = sem_cold if it < WARMUP else sem
            shared, part_states = stepper.em_iteration(shared, part_states)
            bounds.append(float(np.asarray(shared.bound)))
        fit_s = time.time() - t0
        print(f"  [{tag}] fit {fit_s:.0f}s "
              f"({N * ITERS / fit_s:,.0f} docs/s/iter-avg), "
              f"final bound {bounds[-1]:.3e}", flush=True)

        beta = np.asarray(shared.beta, np.float32)
        sigma = np.asarray(shared.sigma, np.float32)
        gamma = np.asarray(shared.gamma, np.float64)
        mu_test = (D_test @ gamma.T).astype(np.float32)
        t0 = time.time()
        theta1, _ = infer_theta(beta, sigma, mu_test, test1, cfg)
        tr_s = time.time() - t0
        lls = heldout_lls(theta1, beta, w2, c2)
        mean, se = float(lls.mean()), float(lls.std() / np.sqrt(len(lls)))
        coh = float(np.mean(semantic_coherence(beta, sub_bow, M=10)))
        excl = float(np.mean(exclusivity(beta, M=10, w=0.7)))
        print(f"  [{tag}] heldout {mean:.4f} (se {se:.5f}), "
              f"coherence {coh:.2f}, exclusivity {excl:.2f}, "
              f"transform {tr_s:.0f}s", flush=True)
        return {"heldout_mean": round(mean, 5), "heldout_se": round(se, 6),
                "coherence": round(coh, 3), "exclusivity": round(excl, 3),
                "fit_seconds": round(fit_s, 1),
                "transform_seconds": round(tr_s, 1),
                "final_bound": bounds[-1]}

    # FINDK_INIT=random: the first (spectral) pass found the
    # 100k-subsample spectral init at K<=100 produces DAMAGED fits on
    # this peaked-theta corpus (bound=nan, heldout 0.015-0.06 nats
    # below a random-init fit of the same K, 8x slower transforms), so
    # the grid must be comparable-health: random init everywhere.
    init_mode = os.environ.get("FINDK_INIT", "spectral")
    for K in K_GRID:
        print(f"=== K={K} ===", flush=True)
        if init_mode == "spectral":
            t0 = time.time()
            beta0 = spectral_init(sub_pc, K, V)
            print(f"  spectral init (100k subsample): {time.time()-t0:.0f}s",
                  flush=True)
        else:
            beta0 = None
        results["by_K"][str(K)] = fit_and_score(
            K, beta0, f"K{K}/{init_mode}")
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)

    # selection: argmax + the 1-SE rule (smallest K within one SE of
    # the best mean) with coherence as the qualitative tie-break column
    means = {int(k): v["heldout_mean"] for k, v in results["by_K"].items()}
    ses = {int(k): v["heldout_se"] for k, v in results["by_K"].items()}
    best = max(means, key=means.get)
    thresh = means[best] - ses[best]
    one_se = min(k for k in means if means[k] >= thresh)
    results["selected_K_argmax"] = int(best)
    results["selected_K_1se"] = int(one_se)
    results["one_se_threshold"] = round(thresh, 5)

    # seed sensitivity in the flat region (random-init refits)
    results["seed_sensitivity"] = {}
    for K in (25, 50):
        r = fit_and_score(K, None, f"K{K}/random-seed777", seed=777)
        results["seed_sensitivity"][str(K)] = r
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)

    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v for k, v in results.items() if k != "config"},
                     indent=2), flush=True)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
