#!/usr/bin/env python
"""Whole-Newton-loop Pallas kernel: toolchain compile probe (TODO.md).

The round-1 whole-loop kernel (ops/pallas_estep.py) crashes this
environment's remote Mosaic compiler (HTTP 500, no diagnostics) at
every block size; the standing instruction is to RETRY on toolchain
updates (expected 2-4x if it ever lands: beta_doc stays VMEM-resident
across ~8.5 Newton iterations, cutting the dominant HBM stream).

This probe jit-compiles the kernel at the headline config on the real
TPU and records compile success/failure + (on success) an E-step A/B.
Writes benchmarks/results_pallas_probe.json.
"""

import json
import os
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/strutopy_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__)) if "__file__" in globals() and "<" not in str(globals().get("__file__")) else "benchmarks"
OUT = os.path.join(HERE, "results_pallas_probe.json")

K, V, L, B = 100, 10_000, 256, 256


def main():
    import jax
    import jax.numpy as jnp

    from strutopy_tpu.ops.estep import NewtonConfig
    from strutopy_tpu.ops.pallas_estep import pallas_newton_impl

    rng = np.random.default_rng(0)
    beta_doc = jnp.asarray(rng.dirichlet(np.ones(L), (B, K)), jnp.float32)
    counts = jnp.asarray(rng.integers(0, 3, (B, L)), jnp.float32)
    mu = jnp.zeros((B, K - 1), jnp.float32)
    eta0 = jnp.zeros((B, K - 1), jnp.float32)
    siginv = jnp.eye(K - 1, dtype=jnp.float32)
    cfg = NewtonConfig()

    result = {"config": {"K": K, "B": B, "L": L},
              "platform": jax.devices()[0].platform,
              "probe_time": None}
    for block in (8, 16, 32):
        t0 = time.time()
        try:
            out = jax.jit(
                lambda bd, c, m, e, s: pallas_newton_impl(
                    bd, c, m, e, s, cfg=cfg, block_docs=block
                )
            )(beta_doc, counts, mu, eta0, siginv)
            jax.block_until_ready(out)
            result[f"block_{block}"] = {
                "compiled": True, "seconds": round(time.time() - t0, 1),
            }
            print(f"block {block}: COMPILED in {time.time()-t0:.0f}s")
        except Exception as e:  # noqa: BLE001 — record the toolchain error
            result[f"block_{block}"] = {
                "compiled": False,
                "seconds": round(time.time() - t0, 1),
                "error": str(e).splitlines()[0][:300] if str(e) else type(e).__name__,
            }
            print(f"block {block}: FAILED after {time.time()-t0:.0f}s: "
                  f"{str(e).splitlines()[0][:160]}")
            traceback.print_exc(limit=1)
    result["probe_time"] = time.strftime("%Y-%m-%d %H:%M")
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
