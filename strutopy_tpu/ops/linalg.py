"""Branchless positive-definite repair and Cholesky helpers.

The reference repairs non-PD Hessians with a try/except ladder
(diagonal dominance via ``make_pd`` at src/modules/stm.py:964-984, then
a +1e-5 diagonal jitter, see src/modules/stm.py:1017-1021 and
decompose_hessian at :1031-1050).  Under ``jit``/``vmap`` there is no
exception control flow, so the ladder becomes: compute all candidate
factorizations, detect NaN (JAX's Cholesky signals failure with NaNs),
and select — the numeric outcome matches the reference's ladder.

Deliberate deviation from the reference: the sigma precision matrix is
the true inverse ``sigma^{-1} = L^{-T} L^{-1}``.  The reference computes
``np.linalg.inv(L).T * np.linalg.inv(L)`` with ELEMENTWISE ``*``
(src/modules/stm.py:501), which silently yields ``diag(1/L_ii^2)`` — a
diagonal approximation of the precision.  See PARITY_NOTES.md.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


def make_pd(M: jax.Array) -> jax.Array:
    """Force diagonal dominance (reference make_pd, stm.py:964-984).

    Replaces each diagonal entry by the sum of absolute off-diagonal
    entries in its row whenever it is smaller, making the matrix
    diagonally dominant with non-negative diagonal (hence PSD for
    symmetric input).
    """
    dvec = jnp.diagonal(M)
    magnitudes = jnp.sum(jnp.abs(M), axis=1) - jnp.abs(dvec)
    dvec = jnp.maximum(dvec, magnitudes)
    return M - jnp.diag(jnp.diagonal(M)) + jnp.diag(dvec)


def chol_pd(H: jax.Array, jitter: float = 1e-5) -> jax.Array:
    """Cholesky with the reference's 3-rung PD-repair ladder.

    Rungs (mirroring stm.py:1017-1021 + :1039-1050): plain Cholesky;
    Cholesky of the diagonally-dominant repair; Cholesky of the repair
    plus ``jitter`` on the diagonal.  Returns the first finite factor.
    """
    L1 = jnp.linalg.cholesky(H)
    ok1 = jnp.all(jnp.isfinite(L1))
    H2 = make_pd(H)
    L2 = jnp.linalg.cholesky(H2)
    ok2 = jnp.all(jnp.isfinite(L2))
    eye = jnp.eye(H.shape[-1], dtype=H.dtype)
    L3 = jnp.linalg.cholesky(H2 + jitter * eye)
    L = jnp.where(ok1, L1, jnp.where(ok2, L2, L3))
    return L


def chol_fast_pd(H: jax.Array, jitter: float = 1e-5) -> jax.Array:
    """2-rung variant for the Newton inner loop (path, not fixed point).

    The exact repair ladder only matters where it defines model
    quantities (nu, the bound's log-det) — i.e. at the converged eta.
    Inside the Newton iteration any PD fix merely changes the search
    path, so one fallback rung suffices and saves a Cholesky.
    """
    L1 = jnp.linalg.cholesky(H)
    ok1 = jnp.all(jnp.isfinite(L1))
    eye = jnp.eye(H.shape[-1], dtype=H.dtype)
    L2 = jnp.linalg.cholesky(make_pd(H) + jitter * eye)
    return jnp.where(ok1, L1, L2)


def cho_inverse(L: jax.Array) -> jax.Array:
    """Inverse from a lower Cholesky factor: ``(L L^T)^{-1} = L^{-T} L^{-1}``.

    This is the reference's optimize_nu (stm.py:1052-1066): nu is the
    inverse of the (repaired) Hessian.
    """
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    Linv = solve_triangular(L, eye, lower=True)
    return Linv.T @ Linv


def precompute_sigma(sigma: jax.Array, jitter: float = 1e-5):
    """Per-EM-iteration sigma factorization (reference stm.py:497-510).

    Returns ``(siginv, sigmaentropy)`` where ``sigmaentropy`` is
    ``sum(log(diag(chol(sigma))))`` (i.e. 0.5 * logdet sigma) and
    ``siginv`` is the true inverse (see module docstring for the
    deliberate deviation from the reference's elementwise product).
    Non-PD sigma falls back to the diagonal-dominance repair instead of
    the reference's broken except-branch (stm.py:503-510).
    """
    L = chol_pd(sigma, jitter=jitter)
    sigmaentropy = jnp.sum(jnp.log(jnp.diagonal(L)))
    siginv = cho_inverse(L)
    # symmetrize against accumulation of float error
    siginv = 0.5 * (siginv + siginv.T)
    return siginv, sigmaentropy
