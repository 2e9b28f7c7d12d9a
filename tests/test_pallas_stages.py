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
