"""Interpret-mode parity of the reduced-scope Pallas stage kernels
(ops/pallas_stages.py) against the XLA E-step stages they replace."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from strutopy_tpu.ops import estep
from strutopy_tpu.ops.pallas_stages import (
    HAVE_PALLAS,
    pallas_cg_impl,
    pallas_fgh_impl,
    pallas_linesearch_impl,
)

pytestmark = pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")


def _chunk(seed=0, B=16, K=13, L=128):
    rng = np.random.default_rng(seed)
    beta = rng.dirichlet(np.ones(400), size=K)
    words = np.stack([rng.choice(400, L, replace=False) for _ in range(B)])
    beta_doc = jnp.asarray(np.stack([beta[:, w] for w in words]), jnp.float32)
    counts = np.zeros((B, L), np.float32)
    counts[:, :40] = rng.integers(1, 5, (B, 40))
    eta = jnp.asarray(rng.normal(0, 0.4, (B, K - 1)), jnp.float32)
    mu = jnp.asarray(rng.normal(0, 0.3, (B, K - 1)), jnp.float32)
    sig = np.diag(np.full(K - 1, 2.0)) + 0.3
    siginv = jnp.asarray(np.linalg.inv(sig), jnp.float32)
    Nd = jnp.sum(jnp.asarray(counts), axis=1)
    return beta_doc, jnp.asarray(counts), eta, mu, siginv, Nd


@pytest.mark.parametrize("bf16", [False, True])
def test_fgh_kernel_matches_xla(bf16):
    beta_doc, counts, eta, mu, siginv, Nd = _chunk()
    f0, g0, H0, _, _ = estep._f_g_H_batched(eta, beta_doc, counts, mu, siginv,
                                            Nd, bf16=bf16)
    f1, g1, H1 = pallas_fgh_impl(eta, beta_doc, counts, mu, siginv, bf16=bf16,
                                 interpret=True)
    np.testing.assert_allclose(f1, f0, rtol=1e-6)
    np.testing.assert_allclose(g1, g0, rtol=1e-5, atol=1e-6)
    tol = 2e-2 if bf16 else 1e-5
    np.testing.assert_allclose(H1, H0, rtol=tol, atol=tol)


def test_cg_kernel_matches_xla():
    beta_doc, counts, eta, mu, siginv, Nd = _chunk(seed=1)
    _f, g, H, _, _ = estep._f_g_H_batched(eta, beta_doc, counts, mu, siginv,
                                          Nd, bf16=False)
    x0 = estep._cg_batched(H, g, iters=8, bf16=False)
    x1 = pallas_cg_impl(H, g, iters=8, bf16=False, interpret=True)
    # dot vs einsum reduction order: f32 associativity noise only
    np.testing.assert_allclose(x1, x0, rtol=2e-4, atol=1e-5)


def test_cg_chunked_matches_unchunked():
    """cg_chunk_docs (ops/estep.py): lax.map-ing pallas_cg over doc
    sub-chunks must be bit-identical to one whole-batch call — it is
    the same per-block kernel, just fewer docs per pallas_call (the
    K>=400 remote-Mosaic-ceiling workaround)."""
    beta_doc, counts, eta, mu, siginv, Nd = _chunk(seed=3)
    _f, g, H, _, _ = estep._f_g_H_batched(eta, beta_doc, counts, mu, siginv,
                                          Nd, bf16=False)
    whole = pallas_cg_impl(H, g, iters=8, bf16=False, interpret=True)
    B, Km1 = g.shape
    ck = B // 2
    chunked = jax.lax.map(
        lambda hg: pallas_cg_impl(hg[0], hg[1], iters=8, bf16=False,
                                  interpret=True),
        (H.reshape(2, ck, Km1, Km1), g.reshape(2, ck, Km1)),
    ).reshape(B, Km1)
    np.testing.assert_array_equal(np.asarray(chunked), np.asarray(whole))

    # and the config knob routes through the full E-step dispatch
    # (pallas kernels auto-interpret off-TPU): chunked == unchunked
    from strutopy_tpu.ops.estep import NewtonConfig, run_estep
    from strutopy_tpu.ops.linalg import precompute_sigma

    rng = np.random.default_rng(6)
    B2, K2, L2, V2 = 32, 9, 64, 300
    beta2 = jnp.asarray(rng.dirichlet(np.ones(V2), size=K2), jnp.float32)
    words2 = jnp.asarray(
        np.stack([rng.choice(V2, L2, replace=False) for _ in range(B2)]),
        jnp.int32)
    counts2 = jnp.asarray(rng.integers(1, 4, (B2, L2)), jnp.float32)
    mu2 = jnp.asarray(rng.normal(0, 0.3, (B2, K2 - 1)), jnp.float32)
    sig2 = jnp.asarray(np.eye(K2 - 1) + 0.1, jnp.float32)
    siginv2, sent2 = precompute_sigma(sig2)
    args = (beta2, mu2, jnp.zeros((B2, K2 - 1), jnp.float32), siginv2, sent2,
            words2, counts2, jnp.zeros(B2, jnp.int32), jnp.ones(B2, bool))
    base = NewtonConfig(bf16_hessian=False, pallas_cg=True, pallas_block=8)
    one = run_estep(*args, cfg=base, batch_size=16)
    two = run_estep(*args, cfg=base._replace(cg_chunk_docs=8), batch_size=16)
    np.testing.assert_array_equal(np.asarray(two.eta), np.asarray(one.eta))
    assert float(two.bound) == float(one.bound)


def test_linesearch_kernel_matches_xla():
    beta_doc, counts, eta, mu, siginv, Nd = _chunk(seed=2)
    _f, g, H, _, _ = estep._f_g_H_batched(eta, beta_doc, counts, mu, siginv,
                                          Nd, bf16=False)
    p = -g
    ts = jnp.exp2(-jnp.arange(12, dtype=jnp.float32))
    fs0 = estep._f_multi(eta, p, ts, beta_doc, counts, mu, siginv, Nd)
    fs1 = pallas_linesearch_impl(eta, p, ts, beta_doc, counts, mu, siginv,
                                 interpret=True)
    np.testing.assert_allclose(fs1, fs0, rtol=1e-5, atol=1e-5)


def test_iter_kernel_matches_one_xla_iteration():
    """ONE fused-kernel iteration == ONE XLA Newton-body iteration to
    f32 rounding (same eta update, same done flags).  Full-trajectory
    iteration counts are NOT comparable across the two paths: a ~2e-5
    first-step rounding difference (different contraction orderings)
    amplifies through the Armijo step selection, and near grad_tol the
    convergence test is at the f32 noise floor — the end-to-end
    contract is the bound-parity test below."""
    from strutopy_tpu.ops.estep import (
        NewtonConfig, _cg_batched, _f_g_H_batched, _f_multi)
    from strutopy_tpu.ops.pallas_stages import pallas_iter_impl

    beta_doc, counts, eta0, mu, siginv, Nd = _chunk(seed=3)
    B = eta0.shape[0]
    cfg = NewtonConfig(bf16_hessian=False)
    cg_iters = min(cfg.cg_iters, beta_doc.shape[1] - 1)
    ts = jnp.exp2(-jnp.arange(cfg.max_backtracks, dtype=eta0.dtype))
    # take 3 XLA iterations first so the comparison starts from a
    # non-trivial eta, then compare one more step on each path
    eta = eta0
    done = jnp.zeros(B, bool)
    for _ in range(4):
        f, g, H, _, _ = _f_g_H_batched(
            eta, beta_doc, counts, mu, siginv, Nd, False, False)
        conv = jnp.max(jnp.abs(g), axis=1) <= cfg.grad_tol
        p = _cg_batched(H, g, cg_iters, bf16=False)
        gTp = jnp.sum(g * p, axis=1)
        bad = gTp >= 0
        p = jnp.where(bad[:, None], -g, p)
        gTp = jnp.where(bad, -jnp.sum(g * g, axis=1), gTp)
        fs = _f_multi(eta, p, ts, beta_doc, counts, mu, siginv, Nd, False)
        ok = fs <= f[:, None] + 1e-4 * ts[None, :] * gTp[:, None]
        any_ok = jnp.any(ok, axis=1)
        t = jnp.max(jnp.where(ok, ts[None, :], 0.0), axis=1)
        step = jnp.logical_and(jnp.logical_and(~done, ~conv), any_ok)
        eta_prev, done_prev = eta, done
        eta = jnp.where(step[:, None], eta + t[:, None] * p, eta)
        done = jnp.logical_or(done, jnp.logical_or(conv, ~any_ok))
    e_p, d_p, adv = pallas_iter_impl(
        eta_prev, beta_doc, counts, mu, siginv, ts, done_prev,
        grad_tol=cfg.grad_tol, cg_iters=cg_iters, bf16=False,
        block_docs=8, interpret=True)
    np.testing.assert_allclose(np.asarray(e_p), np.asarray(eta),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(d_p), np.asarray(done))
    np.testing.assert_array_equal(
        np.asarray(adv), np.asarray(jnp.logical_and(~done_prev, ~conv)))


def test_iter_kernel_full_estep_bound():
    """run_estep with pallas_iter matches the XLA bound."""
    from strutopy_tpu.ops.estep import NewtonConfig, run_estep
    from strutopy_tpu.ops.linalg import precompute_sigma

    rng = np.random.default_rng(5)
    B, K, L, V = 32, 9, 64, 300
    beta = jnp.asarray(rng.dirichlet(np.ones(V), size=K), jnp.float32)
    words = jnp.asarray(
        np.stack([rng.choice(V, L, replace=False) for _ in range(B)]), jnp.int32
    )
    counts = jnp.asarray(rng.integers(1, 4, (B, L)), jnp.float32)
    mu = jnp.asarray(rng.normal(0, 0.3, (B, K - 1)), jnp.float32)
    eta0 = jnp.zeros((B, K - 1), jnp.float32)
    sigma = jnp.asarray(np.eye(K - 1) + 0.1, jnp.float32)
    siginv, sent = precompute_sigma(sigma)
    asp = jnp.zeros(B, jnp.int32)
    ok = jnp.ones(B, bool)
    one = run_estep(beta, mu, eta0, siginv, sent, words, counts, asp, ok,
                    cfg=NewtonConfig(bf16_hessian=False), batch_size=16)
    two = run_estep(beta, mu, eta0, siginv, sent, words, counts, asp, ok,
                    cfg=NewtonConfig(bf16_hessian=False, pallas_iter=True,
                                     pallas_block=8),
                    batch_size=16)
    np.testing.assert_allclose(float(two.bound), float(one.bound), rtol=1e-5)
    # converged etas agree to grad_tol-level wiggle (trajectories
    # diverge by rounding; the bound above is the model contract)
    np.testing.assert_allclose(np.asarray(two.eta), np.asarray(one.eta),
                               atol=5e-3)


def test_gather_rows_kernel_matches_take():
    from strutopy_tpu.ops.pallas_stages import pallas_gather_beta

    rng = np.random.default_rng(7)
    V, K, B, L = 500, 12, 16, 40
    beta_T = jnp.asarray(rng.normal(0, 1, (V, K)), jnp.float32)
    words = jnp.asarray(rng.integers(0, V, (B, L)), jnp.int32)
    out = pallas_gather_beta(beta_T, words, rows_per_program=64,
                             interpret=True)
    ref = jnp.take(beta_T, words.reshape(-1), axis=0).reshape(B, L, K)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
