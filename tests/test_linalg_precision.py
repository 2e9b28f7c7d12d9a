"""TPU einsum-precision regression: the N=1M ``bound=nan`` root cause.

At N=1M, streamed spectral-init fits reported ``bound=nan`` on TPU
(VERDICT r4 weak #1, ``results_findk_1m_r4_nanbug.json``).  The bisect
(benchmarks/nan_bisect_{tpu,doc,hdump}.py) landed on ~1 doc in 25k whose
finalize Hessian is factored fine by XLA's cholesky but NaN'd by
``blocked_cholesky`` ON TPU ONLY: TPU's DEFAULT einsum precision reads
f32 operands at bfloat16, and the resulting ~eps_bf16 * ||H|| (~0.1 at
||H||~20-54) perturbation of the Schur complements exceeds the smallest
eigenvalues the PD-repair ladder produces (0.014-0.05 on the five dumped
documents), driving pivots negative -> NaN factors.  CPU was always
finite (its DEFAULT einsum is true f32) — which is why the defect only
surfaced at part scale on hardware.

Fix under test (two independent halves):

1. Every product in the blocked factorization/inverse path
   (ops/linalg.py::_PREC) and the finalize-stage model quantities
   (ops/estep.py::_FINALIZE_PREC) requests ``Precision.HIGH`` or above.
   On TPU, HIGH = bf16x3 passes (~1e-5 relative — measured 6.7e-4 max
   factor error on the fixtures, 20x margin to the repaired-eig floor,
   and throughput-free where HIGHEST costs 2.2-2.6%:
   results_precision_ab.json); on CPU HIGH executes as true f32.
2. ``_chol_pd_batched`` gains a scale-aware terminal rung (rel_jitter x
   per-doc max|H|): the reference ladder's fixed 1e-5 jitter is 1000x
   below the product error at matrix scale ~50, so the pre-fix ladder
   could exhaust all rungs and return NaN.

CPU cannot reproduce TPU's reduced-precision products natively (it
ignores matmul precision), so these tests EMULATE them at the einsum
level: DEFAULT casts f32 operands through bfloat16; HIGH decomposes
each operand into bf16 hi+lo halves and sums the three cross products
(exactly TPU's bf16x3 scheme).  Under DEFAULT-emulation the pre-fix
code NaNs (proving the fixture exercises the failure); under
HIGH-emulation the shipped code stays finite and close to the true
factor.

Fixture: tests/fixtures/nan_bisect_H.npz — the five (eta, H) pairs
dumped from the real N=250k spectral-init repro on v5e
(benchmarks/nan_bisect_hdump.py, results_nan_bisect_hdump.json).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import strutopy_tpu.ops.estep as estep_mod
import strutopy_tpu.ops.linalg as linalg_mod
from strutopy_tpu.ops.linalg import blocked_cho_inverse, blocked_cholesky

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "nan_bisect_H.npz")

_REAL_EINSUM = jnp.einsum
_P = jax.lax.Precision


def _bf16(x):
    return x.astype(jnp.bfloat16).astype(jnp.float32)


def _emulated_einsum(force=None):
    """Emulate TPU matmul precision semantics for f32 operands.

    DEFAULT: operands read at bf16 (1 pass).  HIGH: bf16x3 — each
    operand split into bf16 hi+lo halves, three cross products summed
    (the a_lo*b_lo term is dropped, as on hardware).  HIGHEST: true
    f32.  ``force`` overrides the per-call precision (models code that
    never asks for higher precision)."""

    def einsum(subscripts, *ops, precision=None, **kw):
        p = force if force is not None else precision
        is32 = [hasattr(o, "dtype") and o.dtype == jnp.float32 for o in ops]
        if p == _P.HIGHEST or not all(is32) or len(ops) != 2:
            return _REAL_EINSUM(subscripts, *ops, precision=_P.HIGHEST, **kw)
        a, b = ops
        if p == _P.HIGH:
            ah, bh = _bf16(a), _bf16(b)
            al, bl = a - ah, b - bh
            return (_REAL_EINSUM(subscripts, ah, bh, **kw)
                    + _REAL_EINSUM(subscripts, ah, bl, **kw)
                    + _REAL_EINSUM(subscripts, al, bh, **kw))
        return _REAL_EINSUM(subscripts, _bf16(a), _bf16(b), **kw)

    return einsum


@pytest.fixture(scope="module")
def repaired_H():
    """The five dumped Hessians after the production PD-repair rung."""
    Hs = np.load(FIXTURE)["Hs"].astype(np.float32)  # (5, 49, 49)
    return estep_mod._make_pd_batched(jnp.asarray(Hs))


def test_production_precision_is_high_or_better():
    assert linalg_mod._PREC in (_P.HIGH, _P.HIGHEST)
    assert estep_mod._FINALIZE_PREC in (_P.HIGH, _P.HIGHEST)


def test_fixture_is_barely_pd(repaired_H):
    # the regime that distinguishes f32/bf16x3 from bf16: eig_min far
    # below eps_bf16 * ||H|| (the perturbation TPU-DEFAULT introduces)
    ev = np.linalg.eigvalsh(np.asarray(repaired_H, np.float64))
    assert (ev[:, 0] > 0).all()
    assert (ev[:, 0] < 0.008 * np.abs(ev).max(axis=1)).all()


def test_blocked_cholesky_finite_under_tpu_high_emulation(
        repaired_H, monkeypatch):
    # reference factor with the true einsum (XLA cholesky uses no einsum)
    L_ref = np.asarray(jnp.linalg.cholesky(repaired_H))
    assert np.isfinite(L_ref).all()

    # honor each call's requested precision — the shipped code asks for
    # >= HIGH everywhere on the contract path, so nothing truncates to
    # 1-pass bf16
    monkeypatch.setattr(jnp, "einsum", _emulated_einsum())
    L = np.asarray(blocked_cholesky(repaired_H))
    assert np.isfinite(L).all(), (
        "blocked_cholesky NaN'd under TPU precision emulation: a "
        "product in ops/linalg.py lost its >=HIGH precision annotation"
    )
    # bf16x3 ~ 1e-5 relative: the on-TPU fixture probe measured 6.7e-4
    # max abs error vs the XLA factor; allow 2x that here
    np.testing.assert_allclose(np.tril(L), np.tril(L_ref),
                               rtol=2e-3, atol=1.5e-3)
    Hinv = np.asarray(blocked_cho_inverse(jnp.asarray(L)))
    assert np.isfinite(Hinv).all()


def test_default_truncation_reproduces_the_tpu_nan(repaired_H, monkeypatch):
    # force 1-pass bf16 operand reads on EVERY product (the pre-fix TPU
    # behavior): the barely-PD fixture must break, or it would not be
    # guarding anything
    monkeypatch.setattr(jnp, "einsum", _emulated_einsum(force=_P.DEFAULT))
    L = np.asarray(blocked_cholesky(repaired_H))
    assert not np.isfinite(L).all(), (
        "fixture no longer exercises the bf16-truncation failure mode"
    )


def test_ladder_terminal_rung_catches_rung3_failures():
    """Rung 4 (scale-aware jitter) factors documents where the fixed
    1e-5 rung-3 jitter fails — the N=1M ladder-exhaustion mode.  A
    chol_fn stub fails any matrix whose diagonal boost is below the
    rung-4 level, simulating precision-induced pivot flips."""
    rng = np.random.default_rng(0)
    B, K = 3, 16
    A = rng.normal(size=(B, K, K)).astype(np.float32)
    H = jnp.asarray(A @ np.transpose(A, (0, 2, 1)) + 30.0 * np.eye(K))
    H2 = estep_mod._make_pd_batched(H)  # == H here (already dominant)
    maxabs = jnp.max(jnp.abs(H2), axis=(1, 2))
    # fails rungs 1-3 (diag boost < 1e-3*maxabs), succeeds on rung 4
    thresh = jnp.diagonal(H2, axis1=1, axis2=2).sum(axis=1) \
        + 0.5e-3 * maxabs * K

    def flaky_chol(M):
        tr = jnp.diagonal(M, axis1=1, axis2=2).sum(axis=1)
        L = jnp.linalg.cholesky(M)
        bad = jnp.full_like(L, jnp.nan)
        return jnp.where((tr > thresh)[:, None, None], L, bad)

    L = estep_mod._chol_pd_batched(H, chol_fn=flaky_chol)
    assert np.isfinite(np.asarray(L)).all(), (
        "ladder returned NaN where the scale-aware terminal rung "
        "should have factored"
    )
    # the rung-4 factor is the Cholesky of H2 + 1e-3*max|H2|*I
    want = np.asarray(jnp.linalg.cholesky(
        H2 + (1e-3 * maxabs)[:, None, None] * jnp.eye(K)))
    np.testing.assert_allclose(np.asarray(L), want, rtol=1e-5, atol=1e-6)


def test_finalize_bmm_outer_f32_is_truncation_immune(monkeypatch):
    rng = np.random.default_rng(3)
    Bm = jnp.asarray(rng.normal(0, 1, (4, 16, 64)), jnp.float32)
    want = np.asarray(estep_mod._bmm_outer(Bm, mosaic_safe=False))

    monkeypatch.setattr(jnp, "einsum", _emulated_einsum())
    got = np.asarray(estep_mod._bmm_outer(Bm, mosaic_safe=False))
    # f32 operands (the finalize Hessian) must run at >= HIGH: bf16x3
    # error ~1e-5 relative, vs ~1e-2 if the annotation regressed to
    # DEFAULT.  bf16 operands (the in-loop Hessian) keep DEFAULT by
    # design — not asserted here.
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
