"""Batched variational E-step: the hot kernel of the framework.

Reference semantics (src/modules/stm.py:489-597): for every document,
minimize over the variational mean ``eta`` (K-1 free coordinates, the
K-th pinned to 0)

    f(eta) = 0.5 (eta-mu)^T Sigma^{-1} (eta-mu)
             - sum_l c_l log( sum_k e^{eta_k} beta_{k, w_l} )
             + N_d * logsumexp(eta~)

then compute the analytic Hessian (stm.py:986-1026), its Cholesky
factor, the variational covariance ``nu = H^{-1}`` (stm.py:1052-1066),
the per-document ELBO (stm.py:1068-1101) and the token-topic sufficient
statistics ``phi`` (stm.py:1103-1118), accumulating

    sigma_ss += nu        beta_ss[:, w_d] += phi_d      bound += bound_d

TPU-native design (replaces the reference's serial python loop over
documents with per-doc ``scipy.optimize.minimize(BFGS)``):

  * documents are processed in fixed-size chunks via ``lax.scan``; each
    chunk is a ``jax.vmap`` over a damped-Newton solver in a
    ``lax.while_loop`` (fixed shapes, data-independent control flow);
  * Newton uses the exact analytic Hessian — it is needed for ``nu``
    anyway — with Armijo backtracking; quadratic convergence makes it
    both faster and more accurate than the reference's BFGS (whose
    analytic gradient is, additionally, evaluated without the e^eta
    scaling — a reference bug we deliberately fix; see PARITY_NOTES.md);
  * beta gathers/contractions are (B, K, L) batched matmuls on the MXU;
  * phi scatter-adds land in one fused XLA scatter per chunk.

Everything here is shape-polymorphic in (B, K, L) and free of host
callbacks, so the same function runs under ``shard_map`` with a final
``psum`` over the document mesh axis (see strutopy_tpu/parallel).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from strutopy_tpu.ops.linalg import chol_pd, cho_inverse


class NewtonConfig(NamedTuple):
    max_iters: int = 24
    grad_tol: float = 1e-5
    max_backtracks: int = 12
    cg_iters: int = 24  # inner CG iterations for the Newton direction
    bf16_hessian: bool = True  # bf16 MXU matmuls for the *in-loop* Hessian


class EStepResult(NamedTuple):
    beta_ss: jax.Array  # (K, V) or (A, K, V)
    sigma_ss: jax.Array  # (K-1, K-1)
    bound: jax.Array  # scalar, f64-accumulated on host side of the scan
    eta: jax.Array  # (N, K-1)
    theta: jax.Array  # (N, K)
    newton_iters: jax.Array  # (N,) int32 diagnostics


# ---------------------------------------------------------------------------
# per-document pieces (vmapped over the chunk)
# ---------------------------------------------------------------------------


def _f_g_H(eta, beta_doc, counts, mu, siginv, Nd, bf16: bool = False):
    """Objective, gradient and Hessian of f at eta, sharing one pass.

    beta_doc: (K, L); counts: (L,); eta/mu: (K-1,).
    Math per reference f/df/hessian (stm.py:920-958, :986-1026) with the
    gradient's missing e^eta scaling fixed (PARITY_NOTES.md).

    ``bf16=True`` runs the dominant B @ B^T contraction in bfloat16 with
    float32 accumulation — used only for the *in-loop* Hessian (the
    Newton direction tolerates it); the final Hessian that defines nu
    and the bound's log-det is always float32.
    """
    K = beta_doc.shape[0]
    eta_full = jnp.concatenate([eta, jnp.zeros((1,), eta.dtype)])
    m = jnp.max(eta_full)
    e = jnp.exp(eta_full - m)  # (K,)
    sum_e = jnp.sum(e)
    theta = e / sum_e  # (K,)

    a = e[:, None] * beta_doc  # (K, L), shifted by e^{-m}
    s = jnp.sum(a, axis=0)  # (L,)
    s_safe = jnp.maximum(s, jnp.asarray(1e-35, s.dtype))
    cmask = counts > 0
    # sum_l c_l * log sum_k e^{eta_k} beta_kl  (shift m re-added)
    ll = jnp.sum(jnp.where(cmask, counts * (jnp.log(s_safe) + m), 0.0))
    lse = m + jnp.log(sum_e)
    diff = eta - mu
    sdiff = siginv @ diff
    f = 0.5 * jnp.dot(diff, sdiff) - ll + Nd * lse

    phi_hat = a / s_safe[None, :]  # (K, L) token-topic responsibilities
    phi_hat = jnp.where(cmask[None, :], phi_hat, 0.0)
    q = phi_hat @ counts  # (K,) expected topic counts
    g_full = Nd * theta - q  # (K,)
    g = sdiff + g_full[:-1]

    # Hessian: B B^T - diag(q) + Nd diag(theta) - Nd theta theta^T
    B = phi_hat * jnp.sqrt(jnp.maximum(counts, 0.0))[None, :]  # (K, L)
    if bf16:
        Bm = B.astype(jnp.bfloat16)
        Hll = jnp.dot(Bm, Bm.T, preferred_element_type=jnp.float32)
    else:
        Hll = jnp.dot(B, B.T, preferred_element_type=jnp.float32)
    Hll = Hll - Nd * jnp.outer(theta, theta)
    Hll = Hll + jnp.diag(Nd * theta - q)
    H = Hll[: K - 1, : K - 1] + siginv
    return f, g, H, theta, phi_hat


def _cg_direction(H, g, iters: int):
    """Newton direction p ~ -H^{-1} g by Steihaug truncated CG.

    Replaces the batched Cholesky + triangular solves inside the Newton
    loop: CG is pure (K-1)-sized matvecs, which batch onto the MXU far
    better than factorization (measured ~6x faster at K=100, B=1024 on
    v5e).  The objective is non-convex away from the optimum, so H can
    be indefinite: CG freezes at the first negative-curvature direction
    (Steihaug), which guarantees the returned step is still a descent
    direction; if negative curvature hits on the very first iteration,
    the caller's steepest-descent fallback takes over.  Jacobi
    preconditioned (abs-diagonal, safe for indefinite H).
    """
    dinv = 1.0 / jnp.maximum(jnp.abs(jnp.diagonal(H)), 1e-20)

    def body(_, st):
        x, r, p, rz, active = st
        Ap = H @ p
        pAp = jnp.dot(p, Ap)
        active = jnp.logical_and(active, pAp > 1e-30)
        alpha = rz / jnp.where(pAp > 1e-30, pAp, 1.0)
        x = jnp.where(active, x + alpha * p, x)
        r = jnp.where(active, r - alpha * Ap, r)
        z = dinv * r
        rz_new = jnp.dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = jnp.where(active, z + beta * p, p)
        rz = jnp.where(active, rz_new, rz)
        return (x, r, p, rz, active)

    r0 = -g
    z0 = dinv * r0
    x, _, _, _, _ = jax.lax.fori_loop(
        0,
        iters,
        body,
        (jnp.zeros_like(g), r0, z0, jnp.dot(r0, z0), jnp.bool_(True)),
    )
    return x


def _f_only(eta, beta_doc, counts, mu, siginv, Nd):
    eta_full = jnp.concatenate([eta, jnp.zeros((1,), eta.dtype)])
    m = jnp.max(eta_full)
    e = jnp.exp(eta_full - m)
    s = jnp.maximum(e @ beta_doc, jnp.asarray(1e-35, eta.dtype))
    cmask = counts > 0
    ll = jnp.sum(jnp.where(cmask, counts * (jnp.log(s) + m), 0.0))
    lse = m + jnp.log(jnp.sum(e))
    diff = eta - mu
    return 0.5 * jnp.dot(diff, siginv @ diff) - ll + Nd * lse


def _doc_newton(beta_doc, counts, mu, siginv, cfg: NewtonConfig, eta0):
    """Damped Newton for one document. Returns (eta, n_iters)."""
    Nd = jnp.sum(counts)
    dtype = eta0.dtype

    def cond(state):
        _, it, done = state
        return jnp.logical_and(~done, it < cfg.max_iters)

    def body(state):
        eta, it, _ = state
        f, g, H, _, _ = _f_g_H(
            eta, beta_doc, counts, mu, siginv, Nd, bf16=cfg.bf16_hessian
        )
        gnorm = jnp.max(jnp.abs(g))
        converged = gnorm <= cfg.grad_tol

        p = _cg_direction(H, g, cfg.cg_iters)
        gTp = jnp.dot(g, p)
        # fall back to steepest descent if the direction is not a descent
        # direction (possible when H is indefinite far from the optimum)
        bad_dir = gTp >= 0
        p = jnp.where(bad_dir, -g, p)
        gTp = jnp.where(bad_dir, -jnp.dot(g, g), gTp)

        # Armijo backtracking: t in {1, 1/2, 1/4, ...}
        def ls_cond(ls):
            t, fnew, j = ls
            insufficient = fnew > f + 1e-4 * t * gTp
            return jnp.logical_and(insufficient, j < cfg.max_backtracks)

        def ls_body(ls):
            t, _, j = ls
            t = 0.5 * t
            fnew = _f_only(eta + t * p, beta_doc, counts, mu, siginv, Nd)
            return (t, fnew, j + 1)

        t0 = jnp.asarray(1.0, dtype)
        f1 = _f_only(eta + t0 * p, beta_doc, counts, mu, siginv, Nd)
        t, fnew, _ = jax.lax.while_loop(ls_cond, ls_body, (t0, f1, 0))
        accepted = fnew <= f + 1e-4 * t * gTp
        stuck = ~accepted

        new_eta = jnp.where(jnp.logical_or(converged, stuck), eta, eta + t * p)
        done = jnp.logical_or(converged, stuck)
        return (new_eta, it + 1, done)

    eta, it, _ = jax.lax.while_loop(cond, body, (eta0, jnp.int32(0), jnp.bool_(False)))
    return eta, it


def _doc_estep(beta_doc, counts, mu, eta0, doc_w, siginv, sigmaentropy, cfg: NewtonConfig):
    """Full E-step for one document (vmapped over a chunk).

    Returns (eta, theta, nu, bound, phi, n_iters); dummy documents
    (doc_w == 0) contribute zeros to all sufficient statistics.
    """
    Nd = jnp.sum(counts)
    eta, n_iters = _doc_newton(beta_doc, counts, mu, siginv, cfg, eta0)

    # final Hessian with the reference's exact repair ladder -> nu, bound
    _, _, H, theta, phi_hat = _f_g_H(eta, beta_doc, counts, mu, siginv, Nd)
    L = chol_pd(H)
    nu = cho_inverse(L)

    # per-doc ELBO, reference lower_bound (stm.py:1068-1101):
    #   log(theta @ (beta_doc * e^eta)) @ c - sum log diag L
    #   - 0.5 (eta-mu)^T siginv (eta-mu) - sigmaentropy
    eta_full = jnp.concatenate([eta, jnp.zeros((1,), eta.dtype)])
    m = jnp.max(eta_full)
    e = jnp.exp(eta_full - m)
    t_l = jnp.maximum((theta * e) @ beta_doc, jnp.asarray(1e-35, eta.dtype))
    cmask = counts > 0
    loglik = jnp.sum(jnp.where(cmask, counts * (jnp.log(t_l) + m), 0.0))
    detTerm = -jnp.sum(jnp.log(jnp.diagonal(L)))
    diff = eta - mu
    bound = loglik + detTerm - 0.5 * jnp.dot(diff, siginv @ diff) - sigmaentropy

    # phi sufficient statistics: expected token-topic counts c_l * phi_hat
    phi = phi_hat * counts[None, :]  # (K, L)

    nu = doc_w * nu
    bound = doc_w * bound
    phi = doc_w * phi
    return eta, theta, nu, bound, phi, n_iters


# ---------------------------------------------------------------------------
# chunked scan over the (local shard of the) corpus
# ---------------------------------------------------------------------------


def _gather_beta(beta, words, aspects):
    """Gather per-doc topic-word slices.

    beta (K, V) or (A, K, V); words (B, L); aspects (B,).
    Returns (B, K, L).
    """
    if beta.ndim == 2:
        return jnp.transpose(jnp.take(beta, words, axis=1), (1, 0, 2))
    gathered = jax.vmap(lambda a, w: jnp.take(beta[a], w, axis=1))(aspects, words)
    return gathered


def _scatter_phi(beta_ss, phi, words, aspects):
    """beta_ss[(aspect,) :, words] += phi for a whole chunk at once.

    beta_ss (K, V) or (A, K, V); phi (B, K, L); words (B, L).
    """
    B, K, L = phi.shape
    phi_flat = jnp.transpose(phi, (1, 0, 2)).reshape(K, B * L)
    if beta_ss.ndim == 2:
        idx = words.reshape(B * L)
        return beta_ss.at[:, idx].add(phi_flat)
    A, _, V = beta_ss.shape
    flat = jnp.transpose(beta_ss, (1, 0, 2)).reshape(K, A * V)
    idx = (aspects[:, None] * V + words).reshape(B * L)
    flat = flat.at[:, idx].add(phi_flat)
    return jnp.transpose(flat.reshape(K, A, V), (1, 0, 2))


@functools.partial(jax.jit, static_argnames=("cfg", "batch_size"))
def run_estep(
    beta,
    mu,
    eta0,
    siginv,
    sigmaentropy,
    words,
    counts,
    aspects,
    doc_ok,
    cfg: NewtonConfig = NewtonConfig(),
    batch_size: int = 1024,
) -> EStepResult:
    """E-step over a (shard of a) corpus.

    Args:
      beta: (K, V) or (A, K, V) topic-word distributions.
      mu: (N, K-1) prior means; eta0: (N, K-1) warm starts.
      siginv, sigmaentropy: from :func:`precompute_sigma`.
      words/counts: (N, L) padded corpus arrays (device).
      aspects: (N,) int32 content-covariate levels (zeros if unused).
      doc_ok: (N,) bool mask; False rows are padding documents.
      batch_size: docs per scan chunk; N must be a multiple
        (callers pad with dummy docs).
    """
    N, L = words.shape
    B = min(batch_size, N)
    if N % B != 0:
        raise ValueError(f"N={N} must be a multiple of batch_size={B}; pad the corpus")
    C = N // B
    K = beta.shape[-2]

    chunks = (
        words.reshape(C, B, L),
        counts.reshape(C, B, L),
        mu.reshape(C, B, K - 1),
        eta0.reshape(C, B, K - 1),
        aspects.reshape(C, B),
        doc_ok.reshape(C, B),
    )

    beta_ss0 = jnp.zeros(beta.shape, beta.dtype)
    sigma_ss0 = jnp.zeros((K - 1, K - 1), beta.dtype)

    doc_fn = jax.vmap(
        _doc_estep, in_axes=(0, 0, 0, 0, 0, None, None, None)
    )

    def chunk_fn(carry, chunk):
        beta_ss, sigma_ss = carry
        w, c, mu_c, eta_c, asp, ok = chunk
        doc_w = ok.astype(beta.dtype)
        beta_doc = _gather_beta(beta, w, asp)
        eta, theta, nu, bound_d, phi, iters = doc_fn(
            beta_doc, c, mu_c, eta_c, doc_w, siginv, sigmaentropy, cfg
        )
        beta_ss = _scatter_phi(beta_ss, phi, w, asp)
        sigma_ss = sigma_ss + jnp.sum(nu, axis=0)
        return (beta_ss, sigma_ss), (eta, theta, jnp.sum(bound_d), iters)

    (beta_ss, sigma_ss), (eta, theta, bounds, iters) = jax.lax.scan(
        chunk_fn, (beta_ss0, sigma_ss0), chunks
    )
    return EStepResult(
        beta_ss=beta_ss,
        sigma_ss=sigma_ss,
        bound=jnp.sum(bounds),
        eta=eta.reshape(N, K - 1),
        theta=theta.reshape(N, K),
        newton_iters=iters.reshape(N),
    )
