#!/usr/bin/env python
"""1M-document full-EM run on ONE chip (pod-scale config, single-chip slice).

BASELINE.json config #5 is N=1M sharded over v5e-64; only one chip is
reachable here, so this measures the per-chip slice at full 1M-doc
scale (the document-sharded EM's per-chip work is independent of the
mesh size; cross-chip cost is three psums of ~25 MB/iter over ICI).
Corpus = the 100k-doc scaled-synthetic corpus tiled 10x (throughput is
data-independent).  Writes benchmarks/results_million.json.

CAVEAT (this environment): the axon TPU tunnel's worker crashed on the
full 1M-doc transfer (~2 GB host->device in one put); 400k docs ran
fine (benchmarks/results_400k.json).  On directly-attached chips, or
with per-shard transfers on a real v5e-64 mesh (each chip receives
1/64th), the full configuration is within memory budgets.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/strutopy_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

N_BASE, TILE, K, V, N_WORDS = 100_000, 10, 100, 50_000, 300
ITERS = 3
if "__file__" in globals() and "<" not in str(__file__):
    HERE = os.path.dirname(os.path.abspath(__file__))
else:  # run via stdin
    HERE = os.path.join(os.getcwd(), "benchmarks")
os.makedirs(HERE, exist_ok=True)
OUT = os.path.join(HERE, "results_million.json")


def main():
    rng = np.random.default_rng(0)
    t0 = time.time()
    beta_true = rng.dirichlet(np.full(V, 0.02), size=K).astype(np.float64)
    eta = rng.normal(0.0, 1.0, (N_BASE, K - 1))
    ef = np.concatenate([eta, np.zeros((N_BASE, 1))], axis=1)
    theta = np.exp(ef - ef.max(axis=1, keepdims=True))
    theta /= theta.sum(axis=1, keepdims=True)

    L = 256
    words = np.zeros((N_BASE, L), np.int32)
    counts = np.zeros((N_BASE, L), np.float32)
    B = 2048
    for s in range(0, N_BASE, B):
        e = min(s + B, N_BASE)
        p = theta[s:e] @ beta_true
        for i in range(e - s):
            draw = rng.multinomial(N_WORDS, p[i])
            ids = np.nonzero(draw)[0][:L]
            words[s + i, : len(ids)] = ids
            counts[s + i, : len(ids)] = draw[ids]
    words = np.tile(words, (TILE, 1))
    counts = np.tile(counts, (TILE, 1))
    N = N_BASE * TILE
    X = rng.integers(0, 2, N).astype(np.float64)
    print(f"corpus built in {time.time()-t0:.0f}s: N={N}", flush=True)

    import jax
    import jax.numpy as jnp

    from strutopy_tpu.corpus.bow import PaddedCorpus
    from strutopy_tpu.models.config import STMConfig
    from strutopy_tpu.models.em import CorpusData, make_em_step
    from strutopy_tpu.models.state import init_state
    from strutopy_tpu.ops import mstep

    pc = PaddedCorpus(words=words, counts=counts, doc_ok=np.ones(N, bool), V=V)
    cfg = STMConfig(K=K, model_type="STM", init_type="random", batch_size=250)
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

    times, bounds = [], []
    for it in range(ITERS):
        t0 = time.time()
        state = em(state, data)
        b = float(np.asarray(state.bound))
        dt = time.time() - t0
        times.append(dt)
        bounds.append(b)
        print(f"EM iter {it}: {dt:.2f}s  {N/dt:.0f} docs/s  bound={b:.0f}", flush=True)

    result = {
        "config": {"N": N, "K": K, "V": V, "n_words": N_WORDS},
        "em_iter_seconds": [round(t, 2) for t in times],
        "steady_docs_per_sec": round(N / min(times[1:]), 1) if len(times) > 1 else None,
        "bounds": bounds,
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
