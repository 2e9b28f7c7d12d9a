#!/usr/bin/env python
"""Roofline placement of the steady-state E-step.

Uses XLA's own cost model (compiled.cost_analysis(): flops + bytes
accessed) and the measured wall time to place the E-step against the
v5e roofline (peak ~197 bf16 TFLOP/s MXU, ~819 GB/s HBM).  Answers
"how far from speed-of-light are we, and which wall are we near?" —
the question that decides whether the next lever is a fusion/Pallas
kernel (HBM-bound) or algorithmic (FLOP-bound).

Writes benchmarks/results_roofline.json.
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
OUT = os.path.join(HERE, "results_roofline.json")

sys.path.insert(0, os.path.dirname(HERE))
from scaling import corpus  # noqa: E402

V5E_PEAK_BF16_TFLOPS = 197.0
V5E_PEAK_HBM_GBS = 819.0


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

    docs, X = corpus(K, V, N, n_words)
    pc = pad_corpus(docs, V=V)
    cfg = STMConfig(K=K, model_type="STM", init_type="random", batch_size=B,
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
    for _ in range(5):
        state = em(state, data)
    jax.block_until_ready(state.bound)

    estep = jax.jit(lambda s, d: local_estep_stats(s, d, cfg)[0].bound)
    lowered = estep.lower(state, data)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    float(np.asarray(estep(state, data)))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(estep(state, data)))
        best = min(best, time.time() - t0)

    tflops_achieved = flops / best / 1e12
    gbs_achieved = bytes_acc / best / 1e9
    result = {
        "config": {"K": K, "V": V, "N": N, "batch": B},
        "seconds": round(best, 4),
        "docs_per_sec": round(pc.N / best, 1),
        "xla_flops": flops,
        "xla_bytes_accessed": bytes_acc,
        "achieved_tflops": round(tflops_achieved, 2),
        "achieved_hbm_gbs": round(gbs_achieved, 1),
        "pct_peak_bf16_mxu": round(100 * tflops_achieved / V5E_PEAK_BF16_TFLOPS, 1),
        "pct_peak_hbm": round(100 * gbs_achieved / V5E_PEAK_HBM_GBS, 1),
        "arithmetic_intensity_flops_per_byte": round(flops / max(bytes_acc, 1), 2),
        "note": ("bytes accessed is XLA's pre-fusion estimate and "
                 "overcounts HBM traffic that fusion keeps in "
                 "registers/VMEM; pct_peak_hbm is an upper bound on "
                 "actual HBM pressure"),
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
