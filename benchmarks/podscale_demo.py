#!/usr/bin/env python
"""Scaled-synthetic demo: full EM at N=100k docs, K=100, V=50k on one chip.

The BASELINE.json "Scaled synthetic" configuration ("full vmapped
E-step batching on one v5e chip").  Generates an STM-DGP corpus,
runs full EM iterations (E-step + prevalence/sigma/beta M-step), and
reports per-iteration wall-clock + docs/s.  Writes
benchmarks/results_podscale.json.

Run from the repo root: python - < benchmarks/podscale_demo.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/strutopy_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

N, K, V, N_WORDS = 100_000, 100, 50_000, 300
if len(sys.argv) > 1:
    N = int(sys.argv[1])
ITERS = 5
HERE = os.path.dirname(os.path.abspath(__file__)) or "benchmarks"
OUT = os.path.join(
    HERE,
    "results_podscale.json" if N == 100_000 else f"results_{N // 1000}k.json",
)


def main():
    rng = np.random.default_rng(0)
    t0 = time.time()
    beta_true = rng.dirichlet(np.full(V, 0.02), size=K).astype(np.float64)
    eta = rng.normal(0.0, 1.0, (N, K - 1))
    ef = np.concatenate([eta, np.zeros((N, 1))], axis=1)
    theta = np.exp(ef - ef.max(axis=1, keepdims=True))
    theta /= theta.sum(axis=1, keepdims=True)
    X = rng.integers(0, 2, N).astype(np.float64)

    # chunked sampling to bound memory: p (B, V) blocks
    L_guess = 256
    words = np.zeros((N, L_guess), np.int32)
    counts = np.zeros((N, L_guess), np.float32)
    B = 2048
    max_len = 0
    for s in range(0, N, B):
        e = min(s + B, N)
        p = theta[s:e] @ beta_true  # (b, V)
        for i in range(e - s):
            draw = rng.multinomial(N_WORDS, p[i])
            ids = np.nonzero(draw)[0]
            m = len(ids)
            max_len = max(max_len, m)
            if m > L_guess:
                ids = ids[:L_guess]
                m = L_guess
            words[s + i, :m] = ids
            counts[s + i, :m] = draw[ids]
    print(f"corpus generated in {time.time()-t0:.0f}s (max unique terms {max_len})",
          flush=True)

    import jax
    import jax.numpy as jnp

    from strutopy_tpu.corpus.bow import PaddedCorpus
    from strutopy_tpu.models.config import STMConfig
    from strutopy_tpu.models.em import CorpusData, make_em_step
    from strutopy_tpu.models.state import init_state
    from strutopy_tpu.ops import mstep

    pc = PaddedCorpus(words=words, counts=counts,
                      doc_ok=np.ones(N, bool), V=V)
    # two-pass straggler schedule after 2 cold iterations
    cfg = STMConfig(K=K, model_type="STM", init_type="random", batch_size=250,
                    newton_pass1_iters=6, newton_straggler_frac=0.25)
    cfg_cold = cfg.replace(newton_pass1_iters=0)
    WARMUP = 2
    # N=100k = 400 chunks of 250
    D_np, design = mstep.make_prevalence_design(X, pc.doc_ok)
    data = CorpusData.single(
        words=jnp.asarray(pc.words),
        counts=jnp.asarray(pc.counts),
        aspects=jnp.zeros(pc.N, jnp.int32),
        doc_ok=jnp.asarray(pc.doc_ok),
        D=jnp.asarray(D_np, jnp.float32),
    )
    state = init_state(jax.random.PRNGKey(0), K=K, V=V, N=pc.N, P=D_np.shape[1])
    em = make_em_step(cfg, design, None, pc.word_counts())
    em_cold = make_em_step(cfg_cold, design, None, pc.word_counts())

    times, bounds = [], []
    for it in range(ITERS):
        t0 = time.time()
        state = (em_cold if it < WARMUP else em)(state, data)
        b = float(np.asarray(state.bound))
        dt = time.time() - t0
        times.append(dt)
        bounds.append(b)
        print(f"EM iter {it}: {dt:.2f}s  {N/dt:.0f} docs/s  bound={b:.0f}", flush=True)

    result = {
        "config": {"N": N, "K": K, "V": V, "n_words": N_WORDS},
        "em_iter_seconds": [round(t, 2) for t in times],
        "steady_docs_per_sec": round(N / min(times[1:]), 1),
        "bounds": bounds,
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
