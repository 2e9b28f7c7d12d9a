#!/usr/bin/env python
"""1M-document full-EM run on ONE chip (pod-scale config, single-chip slice).

BASELINE.json config #5 is N=1M sharded over v5e-64; only one chip is
reachable here, so this runs the full 1M-doc corpus on the single chip
(a real v5e-64 holds 1/64th per chip, so this over-stresses memory by
64x relative to the pod deployment).

Round-1 CAVEAT resolved (VERDICT r1 #7): the axon tunnel worker crashed
on multi-GB host->device transfers, so the corpus is generated ON
DEVICE: per-chunk, theta ~ softmax(N(0,1)) and 300 token draws per doc
via inverse-CDF sampling over p = theta @ beta_true.  Each sampled
token is stored as its own count-1 entry (words (N, 300), counts all 1)
— mathematically identical for the E-step to the merged-count layout
(the likelihood/phi sums are linear in per-entry counts).

Round-2 finding: even fully on-device, the monolithic EM step crashes
the tunnel worker between N=500k (works, 15.4k docs/s) and N=750k —
the (N, 300) counts array plus per-doc state and transient copies
exceed what the worker tolerates.  So this run uses the streamed EM
driver (strutopy_tpu/models/streaming.py): words stay device-resident
(1.2 GB int32), the all-ones counts materialize per 250k-doc part
(300 MB, freed after the part's E-step), and sufficient statistics
accumulate across parts before one M-step — math identical to the
monolithic step (tests/test_streaming.py).

Writes benchmarks/results_1m.json.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/strutopy_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

N, K, V, N_WORDS = 1_000_000, 100, 50_000, 300
if len(sys.argv) > 1:
    N = int(sys.argv[1])
# --two-pass: enable the straggler schedule after 2 cold iterations.
# Off by default: at N=1M the extra compiled graph pair made the
# tunnel worker hang twice in round 2 (the single-graph config is the
# recorded results_1m.json); re-measure when the worker is fresh.
TWO_PASS = "--two-pass" in sys.argv
N_PARTS = max(N // 250_000, 1)
GEN_CHUNK = 5_000  # docs per on-device sampling step ((chunk, V) probs = 1 GB)
ITERS = 5  # 2 cold + 3 two-pass iterations
if "__file__" in globals() and "<" not in str(__file__):
    HERE = os.path.dirname(os.path.abspath(__file__))
else:  # run via stdin
    HERE = os.path.join(os.getcwd(), "benchmarks")
os.makedirs(HERE, exist_ok=True)
OUT = os.path.join(HERE, "results_1m.json")


def main():
    import jax
    import jax.numpy as jnp

    from strutopy_tpu.models.config import STMConfig
    from strutopy_tpu.models.state import init_state
    from strutopy_tpu.models.streaming import StreamedEM
    from strutopy_tpu.ops import mstep

    if N % N_PARTS or (N // N_PARTS) % GEN_CHUNK:
        raise SystemExit(
            f"N={N} must be divisible by n_parts={N_PARTS} and the part "
            f"size by GEN_CHUNK={GEN_CHUNK} (otherwise the remainder docs "
            "would be silently dropped while design.n_docs counts them)"
        )
    n_part = N // N_PARTS

    rng = np.random.default_rng(0)
    beta_true = jnp.asarray(
        rng.dirichlet(np.full(V, 0.02), size=K), jnp.float32
    )  # 20 MB, the largest host->device transfer

    @jax.jit
    def gen_chunk(key, beta_true):
        k1, k2 = jax.random.split(key)
        eta = jax.random.normal(k1, (GEN_CHUNK, K - 1), jnp.float32)
        ef = jnp.concatenate([eta, jnp.zeros((GEN_CHUNK, 1), jnp.float32)], axis=1)
        theta = jax.nn.softmax(ef, axis=1)
        p = theta @ beta_true  # (chunk, V)
        # inverse-CDF sampling: a categorical() here would materialize a
        # (chunk, N_WORDS, V) Gumbel tensor (hundreds of GB); instead one
        # (chunk, V) cumsum + batched binary search per draw
        cdf = jnp.cumsum(p, axis=1)
        cdf = cdf / cdf[:, -1:]
        u = jax.random.uniform(k2, (GEN_CHUNK, N_WORDS), jnp.float32)
        words = jax.vmap(jnp.searchsorted)(cdf, u)
        return jnp.minimum(words, V - 1).astype(jnp.int32)

    t0 = time.time()
    keys = jax.random.split(jax.random.PRNGKey(7), N // GEN_CHUNK)
    word_parts = []
    for p in range(N_PARTS):
        parts = [
            gen_chunk(keys[p * (n_part // GEN_CHUNK) + i], beta_true)
            for i in range(n_part // GEN_CHUNK)
        ]
        word_parts.append(jnp.concatenate(parts, axis=0))  # (n_part, 300)
        word_parts[-1].block_until_ready()
    print(f"on-device corpus generated in {time.time()-t0:.0f}s", flush=True)

    X = rng.integers(0, 2, N).astype(np.float64)
    D_np, design = mstep.make_prevalence_design(X, np.ones(N, bool))
    D_parts = [
        jnp.asarray(D_np[p * n_part:(p + 1) * n_part], jnp.float32)
        for p in range(N_PARTS)
    ]
    aspects = jnp.zeros(n_part, jnp.int32)
    doc_ok = jnp.ones(n_part, bool)

    def provider(p):
        # counts are all 1 by construction (count-1 entry layout): they
        # materialize per part (300 MB) and free after the E-step
        return (word_parts[p], jnp.ones((n_part, N_WORDS), jnp.float32),
                aspects, doc_ok, D_parts[p])

    # two-pass straggler schedule from iteration 2 (cold iterations run
    # the single-pass graph — RESULTS.md "Two-pass straggler schedule")
    cfg = STMConfig(
        K=K, model_type="STM", init_type="random", batch_size=250,
        sort_by_difficulty=False,
        newton_pass1_iters=6 if TWO_PASS else 0,
        newton_straggler_frac=0.25,
    )
    WARMUP = 2 if TWO_PASS else 0
    # prefetch=False: the parts are device-generated (nothing to
    # overlap) and double-buffering the 300 MB counts part would eat
    # into the tunnel worker's fragile memory envelope (CLAUDE.md)
    sem = StreamedEM(cfg, design, provider, n_parts=N_PARTS,
                     prefetch=False)
    sem_cold = (
        StreamedEM(cfg.replace(newton_pass1_iters=0), design,
                   provider, n_parts=N_PARTS, prefetch=False)
        if TWO_PASS
        else sem
    )
    part_states = sem.init_parts(jax.random.PRNGKey(0), K=K, V=V)
    shared = init_state(jax.random.PRNGKey(0), K=K, V=V, N=n_part,
                        P=D_np.shape[1])

    times, bounds = [], []
    for it in range(ITERS):
        t0 = time.time()
        stepper = sem_cold if it < WARMUP else sem
        shared, part_states = stepper.em_iteration(shared, part_states)
        b = float(np.asarray(shared.bound))
        dt = time.time() - t0
        times.append(dt)
        bounds.append(b)
        print(f"EM iter {it}: {dt:.2f}s  {N/dt:.0f} docs/s  bound={b:.0f}", flush=True)

    result = {
        "config": {"N": N, "K": K, "V": V, "n_words": N_WORDS,
                   "n_parts": N_PARTS, "two_pass": TWO_PASS,
                   "layout": "count-1 entries, on-device DGP, streamed EM"},
        "em_iter_seconds": [round(t, 2) for t in times],
        "steady_docs_per_sec": round(N / min(times[1:]), 1) if len(times) > 1 else None,
        "bounds": bounds,
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
