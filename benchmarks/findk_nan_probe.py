"""Miniature CPU reproduction of the nan bound seen in findk_1m.py
(every K's streamed fit reports final bound nan while heldout,
coherence, exclusivity, and theta are all finite and sensible).

Mirrors the findk_1m flow at toy scale: count-1 on-device corpus with
PLANTED topics and peaked Dirichlet(0.1) thetas, streamed EM with 2
cold + N two-pass iterations, spectral init from a subsample.
Ablates: peaked vs uniform-ish thetas, spectral vs random init.

Usage: python benchmarks/findk_nan_probe.py
"""

import os
import sys

import numpy as np

HERE = os.path.join(os.path.abspath(os.getcwd()), "benchmarks")
sys.path.insert(0, HERE)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

def _env(name, default):
    return int(os.environ.get(name, default))


N, V, NW = _env("NP_N", 4000), _env("NP_V", 2000), _env("NP_NW", 60)
K_TRUE, K = _env("NP_KTRUE", 20), _env("NP_K", 10)
PARTS, ITERS, WARM = _env("NP_PARTS", 2), _env("NP_ITERS", 8), 2
ABLATE = os.environ.get("NP_ABLATE", "1") == "1"


def gen(theta_alpha):
    rng = np.random.default_rng(0)
    beta_true = rng.dirichlet(np.full(V, 0.02), size=K_TRUE)
    g = rng.gamma(theta_alpha, 1.0, (N, K_TRUE))
    theta = g / np.maximum(g.sum(axis=1, keepdims=True), 1e-30)
    p = theta @ beta_true
    cdf = np.cumsum(p, axis=1)
    cdf /= cdf[:, -1:]
    u = rng.random((N, NW))
    words = np.minimum(
        np.array([np.searchsorted(cdf[i], u[i]) for i in range(N)]),
        V - 1).astype(np.int32)
    return words


def run(words, init):
    from strutopy_tpu.corpus.bow import PaddedCorpus
    from strutopy_tpu.models.config import STMConfig
    from strutopy_tpu.models.state import init_state
    from strutopy_tpu.models.streaming import StreamedEM
    from strutopy_tpu.ops import mstep
    from strutopy_tpu.ops.spectral import spectral_init

    n_part = N // PARTS
    X = np.random.default_rng(1).integers(0, 2, N).astype(np.float64)
    D_np, design = mstep.make_prevalence_design(X, np.ones(N, bool))
    wp = [jnp.asarray(words[p * n_part:(p + 1) * n_part]) for p in range(PARTS)]
    Dp = [jnp.asarray(D_np[p * n_part:(p + 1) * n_part], jnp.float32)
          for p in range(PARTS)]
    aspects = jnp.zeros(n_part, jnp.int32)
    ok = jnp.ones(n_part, bool)

    def provider(p):
        return (wp[p], jnp.ones((n_part, NW), jnp.float32), aspects, ok, Dp[p])

    beta0 = None
    if init == "spectral":
        pc = PaddedCorpus(words[:2000], np.ones((2000, NW), np.float32),
                          np.ones(2000, bool), V)
        beta0 = jnp.asarray(spectral_init(pc, K, V))
    cfg = STMConfig(K=K, model_type="STM", init_type="random",
                    batch_size=250, sort_by_difficulty=False,
                    newton_pass1_iters=6, newton_straggler_frac=0.25)
    sem = StreamedEM(cfg, design, provider, n_parts=PARTS, prefetch=False)
    sem_cold = StreamedEM(cfg.replace(newton_pass1_iters=0), design,
                          provider, n_parts=PARTS, prefetch=False)
    ps = sem.init_parts(jax.random.PRNGKey(0), K=K, V=V)
    shared = init_state(jax.random.PRNGKey(0), K=K, V=V, N=n_part,
                        P=D_np.shape[1], beta_init=beta0)
    bounds = []
    for it in range(ITERS):
        stepper = sem_cold if it < WARM else sem
        shared, ps = stepper.em_iteration(shared, ps)
        bounds.append(float(np.asarray(shared.bound)))
    beta = np.asarray(shared.beta)
    return bounds, dict(
        beta_nan=bool(np.isnan(beta).any()),
        beta_zero_cols=int((beta.sum(0) == 0).sum()),
        sigma_nan=bool(np.isnan(np.asarray(shared.sigma)).any()),
    )


CASES = (((0.1, "spectral"), (0.1, "random"), (1.0, "spectral"))
         if ABLATE else ((0.1, "spectral"),))
for alpha, init in CASES:
    b, info = run(gen(alpha), init)
    print(f"N={N} V={V} NW={NW} K={K} alpha={alpha} init={init}: "
          f"bounds={['%.3e' % x for x in b]} {info}", flush=True)
