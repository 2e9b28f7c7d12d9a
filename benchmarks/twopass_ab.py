#!/usr/bin/env python
"""A/B the two-pass difficulty schedule at K=200 (VERDICT r1 #6).

Baseline: the round-2 K=200 recipe (cg6 + B=64 + pallas_cg blk32,
14.3k docs/s).  Variants sweep newton_pass1_iters; the schedule is
per-doc path-identical (tests/test_two_pass.py), so any speedup is
free of quality drift (modulo f32 scatter order).

Writes benchmarks/results_twopass.json.
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
OUT_TMPL = os.path.join(HERE, "results_twopass_K{}.json")

sys.path.insert(0, os.path.dirname(HERE))
from scaling import corpus  # noqa: E402  (same synthetic corpus)


def main():
    import jax
    import jax.numpy as jnp

    from strutopy_tpu.corpus.bow import pad_corpus
    from strutopy_tpu.models.config import STMConfig
    from strutopy_tpu.models.em import CorpusData, make_em_step, local_estep_stats
    from strutopy_tpu.models.state import init_state
    from strutopy_tpu.ops import mstep

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    V, N, n_words = 10_000, 4096, 300
    B = 64 if K > 150 else 256
    common = dict(pallas_cg=K > 150, pallas_block=32)

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
    # steady-state warm starts under the BASE config, shared by every
    # variant, so the measured E-steps see the exact same state and
    # their bounds are directly comparable (quality check)
    for _ in range(5):
        state = em(state, data)
    jax.block_until_ready(state.bound)

    variants = {
        "base": {},
        "p1=4_frac.50": dict(newton_pass1_iters=4, newton_straggler_frac=0.50),
        "p1=6_frac.25": dict(newton_pass1_iters=6, newton_straggler_frac=0.25),
        "p1=6_frac.50": dict(newton_pass1_iters=6, newton_straggler_frac=0.50),
        "p1=8_frac.25": dict(newton_pass1_iters=8, newton_straggler_frac=0.25),
    }
    results = {}
    for name, kw in variants.items():
        cfg = STMConfig(K=K, model_type="STM", init_type="random",
                        batch_size=B, **common, **kw)
        estep = jax.jit(lambda s, d, c=cfg: local_estep_stats(s, d, c)[0].bound)
        bound = float(np.asarray(estep(state, data)))
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            float(np.asarray(estep(state, data)))
            best = min(best, time.time() - t0)
        dps = pc.N / best
        results[name] = {"docs_per_sec": round(dps, 1), "bound": bound}
        print(f"{name}: {dps:.0f} docs/s  bound={bound:.2f}", flush=True)
    with open(OUT_TMPL.format(K), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
