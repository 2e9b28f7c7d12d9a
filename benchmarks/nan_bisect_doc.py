"""Per-document bisect of the spectral-init first-E-step nan
(phase 2 of nan_bisect_tpu.py; VERDICT r4 #1).

Phase-1 finding (results_nan_bisect_spectral_N250000_K50.json): the nan
is born in EM ITERATION 0 — the very first E-step on the spectral init
(sigma=20I, eta=0) already returns bound=nan and non-finite sigma_ss;
every later E-step line-search fails instantly against the nan siginv
(eta frozen at its iter-0 value, 2 s/iter no-op iterations).  So the
streamed/1M setting is incidental — the defect is per-document in the
first E-step on spectral beta.

This probe regenerates part 0 of the same corpus and the same spectral
beta, then runs the first E-step batch by batch (Newton + finalize at
the init state), fetching per-doc finiteness of the bound and its
components (loglik / detTerm / quad / nu).  On the first bad batch it
dumps the worst document's forensics and re-runs that single document
on CPU (same f32 code) and in float64 (numpy) for the toolchain
cross-check.

Usage:  python benchmarks/nan_bisect_doc.py    (cwd = repo root)
Env:    ND_N (default 250000) — phase-1 corpus size (part 0 is N/2)
        ND_K (default 50)
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

N = int(os.environ.get("ND_N", 250_000))
V, N_WORDS, K_TRUE = 50_000, 300, 50
K = int(os.environ.get("ND_K", 50))
N_PARTS = 2
N_SUB = N // 10
GEN_CHUNK = min(5_000, N // N_PARTS)
B = 250
OUT = os.path.join(HERE, f"results_nan_bisect_doc_N{N}_K{K}.json")


def main():
    import jax
    import jax.numpy as jnp

    from strutopy_tpu.corpus.bow import PaddedCorpus
    from strutopy_tpu.models.config import STMConfig
    from strutopy_tpu.models.em import _newton_cfg
    from strutopy_tpu.ops import estep as E
    from strutopy_tpu.ops.linalg import precompute_sigma
    from strutopy_tpu.ops.spectral import spectral_init

    # ---- regenerate part 0 + the spectral beta (phase-1 seeds) ----
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
    words0.block_until_ready()
    print(f"part 0 ({n_part} docs) generated", flush=True)

    w_sub = np.asarray(words0[:N_SUB])
    sub_pc = PaddedCorpus(w_sub, np.ones_like(w_sub, np.float32),
                          np.ones(N_SUB, bool), V)
    beta0 = spectral_init(sub_pc, K, V)
    print(f"spectral beta: min={beta0.min():.2e} max={beta0.max():.2e}",
          flush=True)
    beta = jnp.asarray(beta0, jnp.float32)

    cfg = STMConfig(K=K, model_type="STM", init_type="random",
                    batch_size=B, sort_by_difficulty=False,
                    newton_pass1_iters=6, newton_straggler_frac=0.25)
    # iteration 0 of the fit ran the COLD config (single-pass Newton)
    ncfg = _newton_cfg(cfg.replace(newton_pass1_iters=0))
    sigma0 = 20.0 * jnp.eye(K - 1, dtype=jnp.float32)
    siginv, sigent = precompute_sigma(sigma0)

    @jax.jit
    def probe_batch(w):
        c = jnp.ones_like(w, jnp.float32)
        bd = E._gather_beta(beta, w, jnp.zeros(w.shape[0], jnp.int32), None)
        mu = jnp.zeros((w.shape[0], K - 1), jnp.float32)
        eta0 = jnp.zeros((w.shape[0], K - 1), jnp.float32)
        eta, n_iters, _ = E._batched_newton(bd, c, mu, eta0, siginv, ncfg)
        Nd = jnp.sum(c, axis=1)
        theta, nu, bound_d, phi = E._finalize_chunk(
            eta, bd, c, mu, jnp.ones(w.shape[0], jnp.float32), siginv,
            sigent, Nd, nu_method=ncfg.nu_method, chol_block=ncfg.chol_block)
        # component re-computation (mirrors _finalize_chunk's bound)
        _f, _g, H, th2, _ph = E._f_g_H_batched(
            eta, bd, c, mu, siginv, Nd, bf16=False)
        from strutopy_tpu.ops.linalg import blocked_cholesky
        import functools
        L = E._chol_pd_batched(
            H, chol_fn=functools.partial(
                blocked_cholesky, block=ncfg.chol_block))
        detTerm = -jnp.sum(jnp.log(jnp.diagonal(L, axis1=1, axis2=2)),
                           axis=1)
        eta_full = E._pad_eta(eta)
        m = jnp.max(eta_full, axis=1, keepdims=True)
        e = jnp.exp(eta_full - m)
        t_l = jnp.einsum("bk,bkl->bl", theta * e, bd)
        t_l = jnp.maximum(t_l, jnp.asarray(1e-35, eta.dtype))
        loglik = jnp.sum(c * (jnp.log(t_l) + m), axis=1)
        diff = eta
        quad = 0.5 * jnp.sum((diff @ siginv) * diff, axis=1)
        nu_bad = ~jnp.all(jnp.isfinite(nu.reshape(nu.shape[0], -1)), axis=1)
        H_bad = ~jnp.all(jnp.isfinite(H.reshape(H.shape[0], -1)), axis=1)
        L_diag_min = jnp.min(jnp.diagonal(L, axis1=1, axis2=2), axis=1)
        return (bound_d, loglik, detTerm, quad, nu_bad, H_bad, L_diag_min,
                eta, n_iters)

    n_batches = n_part // B
    results = {"config": {"N": N, "K": K, "B": B}, "bad_batches": []}
    first_bad = None
    t0 = time.time()
    for bi in range(n_batches):
        out = probe_batch(words0[bi * B:(bi + 1) * B])
        bound_d = np.asarray(out[0])
        if not np.isfinite(bound_d).all():
            (bound_d, loglik, detTerm, quad, nu_bad, H_bad, L_diag_min,
             eta, n_iters) = (np.asarray(x) for x in out)
            bad = np.where(~np.isfinite(bound_d))[0]
            rec = {
                "batch": bi, "n_bad": int(len(bad)),
                "docs": [{
                    "idx_in_batch": int(d),
                    "bound": float(bound_d[d]),
                    "loglik": float(loglik[d]),
                    "detTerm": float(detTerm[d]),
                    "quad": float(quad[d]),
                    "nu_bad": bool(nu_bad[d]),
                    "H_bad": bool(H_bad[d]),
                    "L_diag_min": float(L_diag_min[d]),
                    "eta_max_abs": float(np.abs(eta[d]).max()),
                    "eta_finite": bool(np.isfinite(eta[d]).all()),
                    "newton_iters": int(n_iters[d]),
                } for d in bad[:8]],
            }
            results["bad_batches"].append(rec)
            print(json.dumps(rec), flush=True)
            if first_bad is None:
                first_bad = (bi, int(bad[0]))
            if len(results["bad_batches"]) >= 5:
                break
        if bi % 100 == 0:
            print(f"batch {bi}/{n_batches} clean so far "
                  f"({time.time()-t0:.0f}s)", flush=True)
    results["n_batches_scanned"] = bi + 1

    # ---- single-doc cross-check: TPU vs CPU (f32) vs numpy f64 ----
    if first_bad is not None:
        bi, d = first_bad
        w_doc = np.asarray(words0[bi * B + d])
        results["crosscheck_doc"] = {"batch": bi, "idx": d}

        # CPU re-run of the same single-doc computation (f32 jax)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            w1 = jnp.asarray(w_doc[None])
            c1 = jnp.ones_like(w1, jnp.float32)
            bd1 = jnp.asarray(beta0[:, w_doc][None], jnp.float32)
            mu1 = jnp.zeros((1, K - 1), jnp.float32)
            sig1 = jnp.asarray(np.asarray(siginv), jnp.float32)
            se1 = jnp.asarray(float(np.asarray(sigent)), jnp.float32)
            eta_c, it_c, _ = E._batched_newton(
                bd1, c1, mu1, jnp.zeros((1, K - 1), jnp.float32), sig1, ncfg)
            th_c, nu_c, bound_c, phi_c = E._finalize_chunk(
                eta_c, bd1, c1, mu1, jnp.ones(1, jnp.float32), sig1, se1,
                jnp.sum(c1, axis=1), nu_method=ncfg.nu_method,
                chol_block=ncfg.chol_block)
        results["crosscheck_doc"]["cpu_f32"] = {
            "bound": float(np.asarray(bound_c[0])),
            "eta_max_abs": float(np.abs(np.asarray(eta_c)).max()),
            "newton_iters": int(np.asarray(it_c[0])),
            "nu_finite": bool(np.isfinite(np.asarray(nu_c)).all()),
        }
        print("cpu_f32:", results["crosscheck_doc"]["cpu_f32"], flush=True)

    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
