#!/usr/bin/env python
"""K-sweep scaling benchmark: steady-state E-step docs/s per config.

Covers the BASELINE.json config families on one chip:
  K in {25, 50, 100, 200} at V=10k (the pod-scale K-sweep, single-chip
  per-K throughput), plus the K=100/V=50k "scaled synthetic" shape.
Writes benchmarks/results_scaling.json.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/strutopy_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

HERE = (os.path.dirname(os.path.abspath(__file__))
        if "__file__" in globals() and "<" not in str(__file__)
        else os.path.join(os.getcwd(), "benchmarks"))
OUT = os.path.join(HERE, "results_scaling.json")


def corpus(K, V, N, n_words, seed=0):
    rng = np.random.default_rng(seed)
    beta = rng.dirichlet(np.full(V, 0.05), size=K)
    eta = rng.normal(0.0, 1.0, (N, K - 1))
    ef = np.concatenate([eta, np.zeros((N, 1))], axis=1)
    theta = np.exp(ef - ef.max(axis=1, keepdims=True))
    theta /= theta.sum(axis=1, keepdims=True)
    p = theta @ beta
    docs = []
    for d in range(N):
        draw = rng.multinomial(n_words, p[d])
        ids = np.nonzero(draw)[0]
        docs.append(list(zip(ids.tolist(), draw[ids].tolist())))
    X = rng.integers(0, 2, N).astype(np.float64)
    return docs, X


def measure(K, V, N=4096, n_words=300, batch=256):
    import jax
    import jax.numpy as jnp

    from strutopy_tpu.corpus.bow import pad_corpus
    from strutopy_tpu.models.config import STMConfig
    from strutopy_tpu.models.em import CorpusData, make_em_step, local_estep_stats
    from strutopy_tpu.models.state import init_state
    from strutopy_tpu.ops import mstep

    docs, X = corpus(K, V, N, n_words)
    pc = pad_corpus(docs, V=V)
    # large K: VMEM-resident-Hessian CG kernel (ops/pallas_stages.py,
    # +14% at K=200, bit-identical bound).  All K: two-pass difficulty
    # schedule (ops/estep.py::_two_pass_estep) — +33%/+24% at K=100/200
    # steady state with identical bounds (results_twopass_K{100,200}.json)
    cfg = STMConfig(K=K, model_type="STM", init_type="random", batch_size=batch,
                    pallas_cg=K > 150, pallas_block=32,
                    newton_pass1_iters=6, newton_straggler_frac=0.25)
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
    # 5 warm-up EM iterations: steady-state warm starts, the regime a
    # production fit (20-100 iterations) actually spends its time in
    # (after only 1 iteration the Newton-iteration distribution is still
    # cold and straggler budgets starve)
    for _ in range(5):
        state = em(state, data)
    jax.block_until_ready(state.bound)

    estep = jax.jit(lambda s, d: local_estep_stats(s, d, cfg)[0].bound)
    float(np.asarray(estep(state, data)))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(estep(state, data)))
        best = min(best, time.time() - t0)
    return pc.N / best


def main():
    results = {}
    grid = [(25, 10_000), (50, 10_000), (100, 10_000), (200, 10_000), (100, 50_000)]
    if len(sys.argv) > 1:  # subset: e.g. "25,50"
        keep = {int(x) for x in sys.argv[1].split(",")}
        grid = [g for g in grid if g[0] in keep]
    for K, V in grid:
        # measured r2: at K=200 the (B, K, L) working set wants smaller
        # chunks (B=64 beats 256 by ~11%); K<=100 is fastest at 256
        dps = measure(K, V, batch=64 if K > 150 else 256)
        results[f"K{K}_V{V}"] = {"docs_per_sec": round(dps, 1)}
        print(f"K={K} V={V}: {dps:.0f} docs/s", flush=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
