"""TPU einsum-precision regression: the N=1M ``bound=nan`` root cause.

At N=1M, streamed spectral-init fits reported ``bound=nan`` on TPU
(VERDICT r4 weak #1, ``results_findk_1m.json``).  The bisect
(benchmarks/nan_bisect_{tpu,doc,hdump}.py) landed on ~1 doc in 25k whose
finalize Hessian is factored fine by XLA's cholesky but NaN'd by
``blocked_cholesky`` ON TPU ONLY: TPU's DEFAULT einsum precision reads
f32 operands at bfloat16, and the resulting ~eps_bf16 * ||H|| (~0.1 at
||H||~20-50) perturbation of the Schur complements exceeds the smallest
eigenvalues the PD-repair ladder produces (0.014-0.05 on the five dumped
documents), driving pivots negative -> NaN factors.  CPU was always
finite (its DEFAULT einsum is true f32) — which is why the defect only
surfaced at part scale on hardware.

Fix under test: every product in the blocked factorization/inverse path
(ops/linalg.py::_HIGHEST) and the finalize-stage model quantities
(ops/estep.py: the f32 ``_bmm_outer``, the bound's loglik/quad einsums,
``_ns_inverse``) requests ``Precision.HIGHEST`` explicitly.

CPU cannot reproduce TPU's truncation natively (it ignores matmul
precision), so these tests EMULATE it: a patched ``jnp.einsum`` casts
f32 operands through bfloat16 unless the call asks for HIGHEST.  Under
that emulation the current code must stay finite and exact (it asks for
HIGHEST everywhere on the contract path); forcing truncation on every
call must reproduce the NaN — proving the fixture matrices actually
exercise the failure mode and the test is not vacuous.

Fixture: tests/fixtures/nan_bisect_H.npz — the five (eta, H) pairs
dumped from the real N=250k spectral-init repro on v5e
(benchmarks/nan_bisect_hdump.py, results_nan_bisect_hdump.json).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from strutopy_tpu.ops.linalg import blocked_cho_inverse, blocked_cholesky

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "nan_bisect_H.npz")

_REAL_EINSUM = jnp.einsum


def _emulated_einsum(truncate_all: bool):
    """TPU-DEFAULT-precision emulator: f32 operands read at bf16.

    ``truncate_all=False`` emulates the real TPU rule (HIGHEST is
    honored, everything else truncates); ``truncate_all=True`` models
    the pre-fix behavior (no call asked for HIGHEST)."""

    def einsum(subscripts, *ops, precision=None, **kw):
        if truncate_all or precision != jax.lax.Precision.HIGHEST:
            ops = tuple(
                o.astype(jnp.bfloat16).astype(jnp.float32)
                if hasattr(o, "dtype") and o.dtype == jnp.float32 else o
                for o in ops
            )
        return _REAL_EINSUM(subscripts, *ops, precision=precision, **kw)

    return einsum


@pytest.fixture(scope="module")
def repaired_H():
    """The five dumped Hessians after the production PD-repair rung."""
    from strutopy_tpu.ops.estep import _make_pd_batched

    Hs = np.load(FIXTURE)["Hs"].astype(np.float32)  # (5, 49, 49)
    return _make_pd_batched(jnp.asarray(Hs))


def test_fixture_is_barely_pd(repaired_H):
    # the regime that distinguishes f32 from bf16: eig_min far below
    # eps_bf16 * ||H|| (the perturbation TPU-DEFAULT introduces)
    ev = np.linalg.eigvalsh(np.asarray(repaired_H, np.float64))
    assert (ev[:, 0] > 0).all()
    assert (ev[:, 0] < 0.008 * np.abs(ev).max(axis=1)).all()


def test_blocked_cholesky_finite_under_tpu_default_emulation(
        repaired_H, monkeypatch):
    # reference factor with the true einsum (XLA cholesky uses no einsum)
    L_ref = np.asarray(jnp.linalg.cholesky(repaired_H))
    assert np.isfinite(L_ref).all()

    monkeypatch.setattr(jnp, "einsum", _emulated_einsum(truncate_all=False))
    L = np.asarray(blocked_cholesky(repaired_H))
    assert np.isfinite(L).all(), (
        "blocked_cholesky NaN'd under TPU-DEFAULT einsum emulation: a "
        "product in ops/linalg.py lost its Precision.HIGHEST annotation"
    )
    # HIGHEST == true f32 products: exact to f32 rounding vs XLA
    np.testing.assert_allclose(np.tril(L), np.tril(L_ref),
                               rtol=2e-4, atol=2e-5)
    Hinv = np.asarray(blocked_cho_inverse(jnp.asarray(L)))
    assert np.isfinite(Hinv).all()


def test_truncation_reproduces_the_tpu_nan(repaired_H, monkeypatch):
    # force bf16 operand reads on EVERY product (the pre-fix TPU
    # behavior): the barely-PD fixture must break, or it would not be
    # guarding anything
    monkeypatch.setattr(jnp, "einsum", _emulated_einsum(truncate_all=True))
    L = np.asarray(blocked_cholesky(repaired_H))
    assert not np.isfinite(L).all(), (
        "fixture no longer exercises the bf16-truncation failure mode"
    )


def test_finalize_bmm_outer_f32_is_truncation_immune(monkeypatch):
    from strutopy_tpu.ops.estep import _bmm_outer

    rng = np.random.default_rng(3)
    Bm = jnp.asarray(rng.normal(0, 1, (4, 16, 64)), jnp.float32)
    want = np.asarray(_bmm_outer(Bm, mosaic_safe=False))

    monkeypatch.setattr(jnp, "einsum", _emulated_einsum(truncate_all=False))
    got = np.asarray(_bmm_outer(Bm, mosaic_safe=False))
    # f32 operands (the finalize Hessian) must run at HIGHEST: bit-equal
    # under emulation.  bf16 operands (the in-loop Hessian) keep DEFAULT
    # by design — not asserted here.
    np.testing.assert_array_equal(got, want)
