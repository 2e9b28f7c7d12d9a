"""Pallas fused Newton kernel: interpret-mode parity with the XLA path.

Runs on CPU via ``interpret=True`` (the kernel's Mosaic compilation is
exercised on real TPU hardware by bench.py / perf scripts)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from strutopy_tpu.ops.estep import NewtonConfig, _batched_newton
from strutopy_tpu.ops.linalg import precompute_sigma

pallas_estep = pytest.importorskip("strutopy_tpu.ops.pallas_estep")


def _problem(B=32, K=8, L=128, V=300, seed=0):
    rng = np.random.default_rng(seed)
    beta = rng.dirichlet(np.ones(V), size=K)
    words = rng.integers(0, V, (B, L))
    beta_doc = jnp.asarray(
        np.take(beta, words, axis=1).transpose(1, 0, 2), jnp.float32
    )
    counts = jnp.asarray(
        np.where(np.arange(L) < 20, rng.integers(1, 4, (B, L)), 0), jnp.float32
    )
    mu = jnp.asarray(rng.normal(0, 0.3, (B, K - 1)), jnp.float32)
    eta0 = jnp.zeros((B, K - 1), jnp.float32)
    siginv, _ = precompute_sigma(2.0 * jnp.eye(K - 1) + 0.2)
    return beta_doc, counts, mu, eta0, siginv


def test_pallas_newton_matches_xla_interpret():
    beta_doc, counts, mu, eta0, siginv = _problem()
    cfg = NewtonConfig()
    eta_x, it_x, _ = _batched_newton(beta_doc, counts, mu, eta0, siginv, cfg)
    eta_p, it_p = pallas_estep.pallas_newton(
        beta_doc, counts, mu, eta0, siginv, cfg=cfg, block_docs=16, interpret=True
    )
    # the mosaic-safe lowering rounds matvecs differently (f32
    # lane-reduction vs bf16 einsum), so paths can diverge within
    # float tolerance; optima must agree
    np.testing.assert_allclose(np.asarray(eta_p), np.asarray(eta_x), atol=5e-3)


def test_pallas_run_estep_path_interpret(monkeypatch):
    """run_estep(use_pallas=True) agrees with the XLA path end-to-end."""
    import strutopy_tpu.ops.pallas_estep as pe
    from strutopy_tpu.ops import estep

    # force interpret mode inside the scan (CPU test environment)
    orig = pe.pallas_newton_impl

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pe, "pallas_newton_impl", interp)

    rng = np.random.default_rng(1)
    K, V, L, N = 5, 200, 128, 64
    beta = jnp.asarray(rng.dirichlet(np.ones(V), size=K), jnp.float32)
    words = jnp.asarray(rng.integers(0, V, (N, L)), jnp.int32)
    counts = jnp.asarray(
        np.where(np.arange(L) < 15, rng.integers(1, 3, (N, L)), 0), jnp.float32
    )
    mu = jnp.zeros((N, K - 1), jnp.float32)
    eta0 = jnp.zeros((N, K - 1), jnp.float32)
    aspects = jnp.zeros(N, jnp.int32)
    doc_ok = jnp.ones(N, bool)
    siginv, se = precompute_sigma(20.0 * jnp.eye(K - 1))

    args = (beta, mu, eta0, siginv, se, words, counts, aspects, doc_ok)
    r_x = estep.run_estep(*args, batch_size=32)
    r_p = estep.run_estep(*args, batch_size=32, use_pallas=True, pallas_block=16)
    np.testing.assert_allclose(np.asarray(r_p.eta), np.asarray(r_x.eta), atol=5e-3)
    np.testing.assert_allclose(float(r_p.bound), float(r_x.bound), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(r_p.beta_ss), np.asarray(r_x.beta_ss), atol=2e-3
    )
