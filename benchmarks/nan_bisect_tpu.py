"""TPU bisect of the N=1M spectral-init bound=nan (VERDICT r4 #1).

Symptoms (benchmarks/results_findk_1m.json): streamed spectral-init
fits at K<=25/50/100 report final bound=nan on TPU while theta, beta,
sigma and heldout stay finite, transforms run ~8x slower than after
random-init fits, and heldout lands 0.015-0.31 nats BELOW random init.
K=200 spectral is healthy and beats random.  All CPU reproductions are
finite (findk_nan_probe.py).

Working hypothesis: a subset of documents' eta diverges to f32-overflow
scale during the streamed fit; softmax(eta) stays finite (one-hot), the
Hessian at one-hot theta stays finite (so nu/sigma/beta are clean), but
the bound's quadratic term (eta-mu)^T siginv (eta-mu) hits +/-inf with
sign mixing and the per-part f32 sum goes nan.  That single mechanism
explains every symptom including the slow transforms (docs started at
extreme eta burn the full Newton budget).

This probe reruns the findk_1m recipe at reduced N (env NB_N, default
250k — same V=50k, NW=300, peaked thetas, streamed parts, 10% spectral
subsample) and instruments every EM iteration with host-fetched
  * the psummed bound,
  * per-part max |eta| and eta-finiteness,
  * the f64-recomputed quad term on a 1024-doc probe slice (vs f32),
then ablates (env NB_MODE):
  spectral   — the failing config (default)
  random     — control
  f32mm      — spectral under jax.default_matmul_precision('float32')
               (TPU bf16 matmul inputs are the main CPU/TPU difference)
  maxv10k    — spectral with maxV=10000 (denser anchor vocabulary)

Usage:  python benchmarks/nan_bisect_tpu.py       (cwd = repo root)
        NB_N=1000000 NB_MODE=spectral python benchmarks/nan_bisect_tpu.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/strutopy_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

HERE = (os.path.dirname(os.path.abspath(__file__))
        if "__file__" in globals() and "<" not in str(globals().get("__file__"))
        else os.path.join(os.getcwd(), "benchmarks"))

N = int(os.environ.get("NB_N", 250_000))
V, N_WORDS, K_TRUE = 50_000, 300, 50
K = int(os.environ.get("NB_K", 50))
N_PARTS = int(os.environ.get("NB_PARTS", max(2, N // 250_000)))
N_SUB = int(os.environ.get("NB_SUB", N // 10))
GEN_CHUNK = min(5_000, N // max(1, int(os.environ.get("NB_PARTS", max(2, N // 250_000)))))
ITERS, WARMUP = int(os.environ.get("NB_ITERS", 10)), 2
MODE = os.environ.get("NB_MODE", "spectral")
OUT = os.path.join(HERE, f"results_nan_bisect_{MODE}_N{N}_K{K}.json")


def gen_corpus():
    """findk_1m.py::gen_corpus at size N (same seed stream structure)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    beta_true = jnp.asarray(
        rng.dirichlet(np.full(V, 0.02), size=K_TRUE), jnp.float32
    )

    @jax.jit
    def gen_chunk(key, beta_true):
        k1, k2 = jax.random.split(key)
        g = jax.random.gamma(k1, 0.1, (GEN_CHUNK, K_TRUE), jnp.float32)
        theta = g / jnp.maximum(jnp.sum(g, axis=1, keepdims=True), 1e-30)
        p = theta @ beta_true
        cdf = jnp.cumsum(p, axis=1)
        cdf = cdf / cdf[:, -1:]
        u = jax.random.uniform(k2, (GEN_CHUNK, N_WORDS), jnp.float32)
        words = jax.vmap(jnp.searchsorted)(cdf, u)
        return jnp.minimum(words, V - 1).astype(jnp.int32)

    n_part = N // N_PARTS
    keys = jax.random.split(jax.random.PRNGKey(7), N // GEN_CHUNK)
    word_parts = []
    for p in range(N_PARTS):
        parts = [
            gen_chunk(keys[p * (n_part // GEN_CHUNK) + i], beta_true)
            for i in range(n_part // GEN_CHUNK)
        ]
        word_parts.append(jnp.concatenate(parts, axis=0))
        word_parts[-1].block_until_ready()
    X = rng.integers(0, 2, N).astype(np.float64)
    return word_parts, X


def main():
    import jax
    import jax.numpy as jnp

    from strutopy_tpu.corpus.bow import PaddedCorpus
    from strutopy_tpu.models.config import STMConfig
    from strutopy_tpu.models.state import init_state
    from strutopy_tpu.models.streaming import StreamedEM
    from strutopy_tpu.ops import mstep
    from strutopy_tpu.ops.linalg import precompute_sigma
    from strutopy_tpu.ops.spectral import spectral_init

    n_part = N // N_PARTS
    t0 = time.time()
    word_parts, X = gen_corpus()
    print(f"corpus N={N} generated in {time.time()-t0:.0f}s", flush=True)

    D_np, design = mstep.make_prevalence_design(X, np.ones(N, bool))
    D_parts = [
        jnp.asarray(D_np[p * n_part:(p + 1) * n_part], jnp.float32)
        for p in range(N_PARTS)
    ]
    aspects = jnp.zeros(n_part, jnp.int32)
    doc_ok = jnp.ones(n_part, bool)

    def provider(p):
        return (word_parts[p], jnp.ones((n_part, N_WORDS), jnp.float32),
                aspects, doc_ok, D_parts[p])

    beta0 = None
    maxV = 10_000 if MODE == "maxv10k" else 5_000
    if MODE != "random":
        w_sub = np.asarray(word_parts[0][:N_SUB])
        sub_pc = PaddedCorpus(w_sub, np.ones_like(w_sub, np.float32),
                              np.ones(N_SUB, bool), V)
        t0 = time.time()
        beta0 = spectral_init(sub_pc, K, V, maxV=maxV)
        print(f"spectral init ({N_SUB} subsample, maxV={maxV}): "
              f"{time.time()-t0:.0f}s; beta min={beta0.min():.2e} "
              f"max={beta0.max():.2e}", flush=True)

    batch = 125 if K >= 200 else 250
    cfg = STMConfig(K=K, model_type="STM", init_type="random",
                    batch_size=batch, sort_by_difficulty=False,
                    newton_pass1_iters=6, newton_straggler_frac=0.25)
    sem = StreamedEM(cfg, design, provider, n_parts=N_PARTS, prefetch=False)
    sem_cold = StreamedEM(cfg.replace(newton_pass1_iters=0), design,
                          provider, n_parts=N_PARTS, prefetch=False)
    part_states = sem.init_parts(jax.random.PRNGKey(0), K=K, V=V)
    shared = init_state(jax.random.PRNGKey(0), K=K, V=V, N=n_part,
                        P=D_np.shape[1],
                        beta_init=None if beta0 is None
                        else jnp.asarray(beta0))

    results = {"config": {
        "N": N, "V": V, "K": K, "mode": MODE, "n_parts": N_PARTS,
        "subsample": N_SUB, "maxV": maxV, "iters": ITERS,
    }, "iterations": []}

    from contextlib import nullcontext
    prec_ctx = (jax.default_matmul_precision("float32")
                if MODE == "f32mm" else nullcontext())

    with prec_ctx:
        for it in range(ITERS):
            stepper = sem_cold if it < WARMUP else sem
            t0 = time.time()
            shared, part_states = stepper.em_iteration(shared, part_states)
            dt = time.time() - t0
            bound = float(np.asarray(shared.bound))

            # per-part eta forensics (fetch max-abs + finiteness only)
            eta_stats = []
            for ps in part_states:
                eta = ps.eta
                eta_stats.append({
                    "max_abs": float(np.asarray(jnp.max(jnp.abs(eta)))),
                    "finite": bool(np.asarray(
                        jnp.all(jnp.isfinite(eta)))),
                    "n_huge": int(np.asarray(jnp.sum(
                        jnp.max(jnp.abs(eta), axis=1) > 1e6))),
                })

            # 1024-doc probe slice: f64 vs f32 quad term
            eta_p = np.asarray(part_states[0].eta[:1024], np.float64)
            mu_p = np.asarray(part_states[0].mu[:1024], np.float64)
            siginv64 = np.linalg.inv(np.asarray(shared.sigma, np.float64))
            diff = eta_p - mu_p
            quad64 = 0.5 * np.einsum("bi,ij,bj->b", diff, siginv64, diff)
            diff32 = diff.astype(np.float32)
            sdiff32 = diff32 @ siginv64.astype(np.float32)
            quad32 = 0.5 * np.sum(diff32 * sdiff32, axis=1)

            rec = {
                "iter": it, "bound": bound, "seconds": round(dt, 1),
                "eta_parts": eta_stats,
                "probe_quad_f64_max": float(quad64.max()),
                "probe_quad_f32_nonfinite": int(
                    (~np.isfinite(quad32)).sum()),
                "sigma_finite": bool(
                    np.isfinite(np.asarray(shared.sigma)).all()),
                "beta_min": float(np.asarray(jnp.min(shared.beta))),
            }
            results["iterations"].append(rec)
            print(json.dumps(rec), flush=True)
            with open(OUT, "w") as f:
                json.dump(results, f, indent=2)

    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
