#!/usr/bin/env python
"""A/B the Armijo sweep width (newton_max_backtracks) at the headline
config.

The parallel line-search sweep is the FLOP hog of the Newton body:
2*B*T*K*L for T=12 candidates vs ~3*2*B*K*L for f/g/H.  Candidates are
a halving ladder 1, 1/2, ..., 2^-(T-1); at steady state nearly every
doc accepts the full step, so a shorter ladder should cost nothing in
quality — but a doc that fails ALL T candidates stops (done-by-failure)
with a worse eta, so the bound drift must be measured, not assumed.

Measured on the SAME post-warm-up state for every variant.
Writes benchmarks/results_linesearch.json.
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
OUT = os.path.join(HERE, "results_linesearch.json")

sys.path.insert(0, os.path.dirname(HERE))
from scaling import corpus  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from strutopy_tpu.corpus.bow import pad_corpus
    from strutopy_tpu.models.config import STMConfig
    from strutopy_tpu.models.em import CorpusData, make_em_step, local_estep_stats
    from strutopy_tpu.models.state import init_state
    from strutopy_tpu.ops import mstep

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    V, N, n_words = 10_000, 4096, 300
    B = 64 if K > 150 else 256
    common = dict(
        pallas_cg=K > 150, pallas_block=32,
        newton_pass1_iters=6, newton_straggler_frac=0.25,
    )

    docs, X = corpus(K, V, N, n_words)
    pc = pad_corpus(docs, V=V)
    base_cfg = STMConfig(K=K, model_type="STM", init_type="random",
                         batch_size=B, **common)
    D_np, design = mstep.make_prevalence_design(X, pc.doc_ok)
    data = CorpusData.single(
        words=jnp.asarray(pc.words),
        counts=jnp.asarray(pc.counts),
        aspects=jnp.zeros(pc.N, jnp.int32),
        doc_ok=jnp.asarray(pc.doc_ok),
        D=jnp.asarray(D_np, jnp.float32),
    )
    state = init_state(jax.random.PRNGKey(0), K=K, V=V, N=pc.N, P=D_np.shape[1])
    em = make_em_step(base_cfg, design, None, pc.word_counts())
    for _ in range(5):
        state = em(state, data)
    jax.block_until_ready(state.bound)

    results = {}
    for T in (12, 8, 6, 4):
        cfg = STMConfig(K=K, model_type="STM", init_type="random",
                        batch_size=B, newton_max_backtracks=T, **common)
        estep = jax.jit(lambda s, d, c=cfg: local_estep_stats(s, d, c)[0].bound)
        bound = float(np.asarray(estep(state, data)))
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            float(np.asarray(estep(state, data)))
            best = min(best, time.time() - t0)
        results[f"T{T}"] = {"docs_per_sec": round(pc.N / best, 1), "bound": bound}
        print(f"T={T}: {pc.N/best:.0f} docs/s  bound={bound:.2f}", flush=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
