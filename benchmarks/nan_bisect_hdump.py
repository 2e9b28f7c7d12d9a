"""Phase 3 of the spectral-nan bisect: dump the failing docs' Hessians.

Phase 2 (results_nan_bisect_doc_N250000_K50.json) found ~1 doc in 25k
where the finalize Cholesky returns NaN on a FINITE Hessian — i.e. the
PD-repair ladder (ops/estep.py::_chol_pd_batched) fails through all
three rungs — at an eta the TPU search path (bf16 in-loop Hessian)
converges to but the CPU f32 path does not.  This probe regenerates
the identified documents, reruns the TPU Newton to the same eta,
fetches (eta, H) to host, and analyzes: f64 eigenvalues, f32
factorization by XLA cholesky vs blocked_cholesky, make_pd+jitter
behavior — to decide whether H is indefinite (ladder escalation
needed) or PD-but-blocked-fails (blocked robustness bug).

Usage:  python benchmarks/nan_bisect_hdump.py   (cwd = repo root)
"""

import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/strutopy_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

HERE = (os.path.dirname(os.path.abspath(__file__))
        if "__file__" in globals() and "<" not in str(globals().get("__file__"))
        else os.path.join(os.getcwd(), "benchmarks"))

N, V, N_WORDS, K_TRUE, K = 250_000, 50_000, 300, 50, 50
N_PARTS, N_SUB, GEN_CHUNK, B = 2, 25_000, 5_000, 250
BAD = [(21, 91), (228, 217), (250, 14), (394, 158), (426, 89)]
OUT = os.path.join(HERE, "results_nan_bisect_hdump.json")
NPZ = os.path.join(HERE, "nan_bisect_H.npz")


def main():
    import jax
    import jax.numpy as jnp

    from strutopy_tpu.corpus.bow import PaddedCorpus
    from strutopy_tpu.models.config import STMConfig
    from strutopy_tpu.models.em import _newton_cfg
    from strutopy_tpu.ops import estep as E
    from strutopy_tpu.ops.linalg import precompute_sigma
    from strutopy_tpu.ops.spectral import spectral_init

    rng = np.random.default_rng(0)
    beta_true = jnp.asarray(
        rng.dirichlet(np.full(V, 0.02), size=K_TRUE), jnp.float32)

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
    words0 = jnp.concatenate(
        [gen_chunk(keys[i], beta_true) for i in range(n_part // GEN_CHUNK)],
        axis=0)
    w_sub = np.asarray(words0[:N_SUB])
    sub_pc = PaddedCorpus(w_sub, np.ones_like(w_sub, np.float32),
                          np.ones(N_SUB, bool), V)
    beta0 = spectral_init(sub_pc, K, V)
    beta = jnp.asarray(beta0, jnp.float32)

    cfg = STMConfig(K=K, model_type="STM", init_type="random",
                    batch_size=B, sort_by_difficulty=False,
                    newton_pass1_iters=6, newton_straggler_frac=0.25)
    ncfg = _newton_cfg(cfg.replace(newton_pass1_iters=0))
    sigma0 = 20.0 * jnp.eye(K - 1, dtype=jnp.float32)
    siginv, sigent = precompute_sigma(sigma0)

    @jax.jit
    def newton_H(w):
        c = jnp.ones_like(w, jnp.float32)
        bd = E._gather_beta(beta, w, jnp.zeros(w.shape[0], jnp.int32), None)
        mu = jnp.zeros((w.shape[0], K - 1), jnp.float32)
        eta0 = jnp.zeros((w.shape[0], K - 1), jnp.float32)
        eta, n_iters, _ = E._batched_newton(bd, c, mu, eta0, siginv, ncfg)
        Nd = jnp.sum(c, axis=1)
        _f, _g, H, theta, _ph = E._f_g_H_batched(
            eta, bd, c, mu, siginv, Nd, bf16=False)
        return eta, H, theta

    etas, Hs = [], []
    for bi, d in BAD:
        w = words0[bi * B:(bi + 1) * B]
        eta, H, theta = newton_H(w)
        etas.append(np.asarray(eta[d], np.float64))
        Hs.append(np.asarray(H[d], np.float64))
    np.savez(NPZ, etas=np.stack(etas), Hs=np.stack(Hs))

    # ---- host analysis ----
    from strutopy_tpu.ops.linalg import blocked_cholesky

    report = []
    for i, ((bi, d), H64) in enumerate(zip(BAD, Hs)):
        H32 = H64.astype(np.float32)
        ev = np.linalg.eigvalsh(H64)
        rec = {"batch": bi, "idx": d,
               "eig_min": float(ev[0]), "eig_max": float(ev[-1]),
               "diag_min": float(np.diag(H64).min()),
               "maxabs": float(np.abs(H64).max())}
        # f32 XLA cholesky on CPU
        Lx = np.linalg.cholesky(H64) if ev[0] > 0 else None
        rec["pd_in_f64"] = bool(ev[0] > 0)
        ch32 = jnp.linalg.cholesky(jnp.asarray(H32))
        rec["xla_f32_chol_finite"] = bool(
            np.isfinite(np.asarray(ch32)).all())
        bl32 = blocked_cholesky(jnp.asarray(H32)[None])[0]
        rec["blocked_f32_chol_finite"] = bool(
            np.isfinite(np.asarray(bl32)).all())
        # ladder rungs
        Hb = jnp.asarray(H32)[None]
        H2 = E._make_pd_batched(Hb)
        for name, M in (("make_pd", H2),
                        ("make_pd_jitter",
                         H2 + 1e-5 * jnp.eye(K - 1)[None])):
            blo = blocked_cholesky(M)[0]
            xlo = jnp.linalg.cholesky(M[0])
            ev2 = np.linalg.eigvalsh(np.asarray(M[0], np.float64))
            rec[name] = {
                "eig_min": float(ev2[0]),
                "blocked_finite": bool(np.isfinite(np.asarray(blo)).all()),
                "xla_finite": bool(np.isfinite(np.asarray(xlo)).all()),
            }
        report.append(rec)
        print(json.dumps(rec), flush=True)

    with open(OUT, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", OUT, "and", NPZ, flush=True)


if __name__ == "__main__":
    main()
