#!/usr/bin/env python
"""Roofline placement of the steady-state E-step.

Uses XLA's own cost model (compiled.cost_analysis(): flops + bytes
accessed) and the measured wall time to place the E-step against the
v5e roofline (peak ~197 bf16 TFLOP/s MXU, ~819 GB/s HBM).  Answers
"how far from speed-of-light are we, and which wall are we near?" —
the question that decides whether the next lever is a fusion/Pallas
kernel (HBM-bound) or algorithmic (FLOP-bound).

Usage: roofline.py [K]  ->  benchmarks/results_roofline.json
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
sys.path.insert(0, HERE)
from bench_common import warmed_state  # noqa: E402

V5E_PEAK_BF16_TFLOPS = 197.0
V5E_PEAK_HBM_GBS = 819.0


def main():
    import jax

    from strutopy_tpu.models.em import local_estep_stats

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    V, N, n_words = 10_000, 4096, 300
    B = 128 if K > 150 else 256
    cfg_kw = dict(pallas_cg=K > 150, pallas_block=32,
                  newton_pass1_iters=6, newton_straggler_frac=0.25)

    state, data, pc, design, make_cfg = warmed_state(
        K, V, N, n_words, B, cfg_kw
    )
    cfg = make_cfg()
    # XLA's cost model counts while_loop bodies ONCE; the Newton loop
    # runs ~mean_iters times, so scale flops/bytes by the measured mean
    # (approximate: the loop body dominates the E-step's cost)
    iters = jax.jit(
        lambda s, d: local_estep_stats(s, d, cfg)[3].mean()
    )(state, data)
    mean_iters = float(np.asarray(iters))
    estep = jax.jit(lambda s, d: local_estep_stats(s, d, cfg)[0].bound)
    compiled = estep.lower(state, data).compile()
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

    # loop-scaled estimates: multiply the one-body cost by mean iters
    # (lower bound on work actually executed; finalize/gather amortize)
    scale = max(mean_iters, 1.0)
    tflops_achieved = flops * scale / best / 1e12
    gbs_achieved = bytes_acc * scale / best / 1e9
    result = {
        "config": {"K": K, "V": V, "N": N, "batch": B},
        "seconds": round(best, 4),
        "docs_per_sec": round(pc.N / best, 1),
        "mean_newton_iters": round(mean_iters, 2),
        "xla_flops_one_loop_body": flops,
        "xla_bytes_one_loop_body": bytes_acc,
        "achieved_tflops_loop_scaled": round(tflops_achieved, 2),
        "achieved_hbm_gbs_loop_scaled": round(gbs_achieved, 1),
        "pct_peak_bf16_mxu": round(100 * tflops_achieved / V5E_PEAK_BF16_TFLOPS, 1),
        "pct_peak_hbm": round(100 * gbs_achieved / V5E_PEAK_HBM_GBS, 1),
        "arithmetic_intensity_flops_per_byte": round(flops / max(bytes_acc, 1), 2),
        "note": ("XLA's cost model counts while_loop bodies once, so "
                 "flops/bytes are scaled by the measured mean Newton "
                 "iterations; bytes accessed is also the PRE-fusion "
                 "estimate and overcounts HBM traffic that fusion keeps "
                 "in registers/VMEM — pct_peak_hbm is an upper bound"),
    }
    with open(os.path.join(HERE, "results_roofline.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
