"""Fused Pallas TPU kernel for the E-step Newton solve.

The XLA path (ops/estep.py) re-reads the gathered ``beta_doc`` block
and re-materializes (B, K, L) intermediates from HBM on every Newton
iteration — ~15 HBM passes per iteration.  This kernel pins one block
of documents in VMEM and runs the ENTIRE damped-Newton loop there:
``beta_doc`` is read from HBM exactly once per document per E-step,
all intermediates (phi_hat, H, line-search candidates) live on-chip,
and Mosaic double-buffers the next block's DMA against the current
block's compute.

The math is literally the same code as the XLA path — the kernel body
calls :func:`strutopy_tpu.ops.estep._batched_newton` on VMEM-resident
values (it was written Pallas-safe: no gathers, no iota, constant step
ladder) — so there is one implementation of the solver semantics with
two execution strategies.

Use via ``STMConfig(use_pallas=True)``.

STATUS (round 1): the kernel is verified bit-equivalent to the XLA
path in interpret mode (tests/test_pallas.py).  On the real-TPU Mosaic
toolchain in this environment, compilation progresses past several
documented constraints (no batched dot_general, no dynamic_slice on
values, no 1-D/float iota, no captured host constants — all handled by
the ``mosaic_safe`` strategy in ops/estep.py) but the remote
tpu_compile_helper then crashes (HTTP 500, subprocess exit 1, no
diagnostics) on the full Newton-loop kernel, for both bf16 and f32
variants and block sizes 8-64.  The XLA path (23.9k docs/s at K=100 on
v5e, 621x the scipy baseline) remains the default; this kernel is the
starting point for a future Mosaic-toolchain retry.

STATUS (round 2): retried 2026-08-16 — the whole-loop kernel STILL
crashes the remote compile helper identically (HTTP 500, exit 1, for
fixed_iters both on and off, blocks 8-32), while the three
reduced-scope stage kernels in ops/pallas_stages.py (f/g/H, CG,
line-search — the same math split at the Newton-stage boundaries) all
compile and run on the same toolchain.  The crash is therefore
specific to the combined loop body size/structure, not to any single
documented constraint.  Minimal repro: STMConfig(use_pallas=True) on
any fit, or tests/test_pallas.py with interpret=False on a TPU.

STATUS (round 3, 2026-08-17): RESOLVED and MEASURED.  The round-3
probe (benchmarks/pallas_loop_probe.py) surfaced the real Mosaic
diagnostic — `failed to legalize operation 'scf.yield'` on the Newton
while_loop's 1-D i1/i32 vector carries — and the f32-carry fix in
ops/estep.py::_batched_newton (mosaic_safe path carries f32
surrogates for done/n_iters) legalizes the kernel at every block
size.  Measured on real v5e at K=100 and K=200
(benchmarks/results_pallas_loop_K{100,200}.json): the kernel runs
with bound parity ~2e-7 but LOSES to the XLA path — ~24.5k docs/s vs
41.5k XLA single-pass (68.9k two-pass) at K=100 — the same
op-granularity-vs-batching tradeoff pallas_iter measured: the
mosaic-safe per-doc 2-D dots keep the MXU far less busy than XLA's
batched (B, K, L) einsums, and that costs more than the VMEM
residency of beta_doc saves in HBM traffic.  The flag stays off; the
production recipe remains XLA everywhere + pallas_cg at K>=200.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from strutopy_tpu.ops.estep import NewtonConfig, _batched_newton

try:  # pallas imports fail gracefully on unsupported backends
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _newton_kernel(siginv_ref, beta_doc_ref, counts_ref, mu_ref, eta0_ref,
                   eta_out_ref, iters_out_ref, *, cfg: NewtonConfig):
    beta_doc = beta_doc_ref[:]
    counts = counts_ref[:]
    mu = mu_ref[:]
    eta0 = eta0_ref[:]
    siginv = siginv_ref[:]
    # Mosaic cannot lower batched dot_general: run the same math with
    # per-doc 2D dots / lane-reduction matvecs
    kcfg = cfg._replace(mosaic_safe=True)
    eta, n_iters, _ = _batched_newton(beta_doc, counts, mu, eta0, siginv, kcfg)
    eta_out_ref[:] = eta
    iters_out_ref[:] = n_iters.astype(jnp.int32)[:, None]


def pallas_newton_impl(
    beta_doc,  # (B, K, L)
    counts,  # (B, L)
    mu,  # (B, K-1)
    eta0,  # (B, K-1)
    siginv,  # (K-1, K-1)
    cfg: NewtonConfig = NewtonConfig(),
    block_docs: int = 16,
    interpret: bool = False,
):
    """Fused Newton solve: returns (eta (B, K-1), n_iters (B,))."""
    B, K, L = beta_doc.shape
    Km1 = K - 1
    Bb = min(block_docs, B)
    if B % Bb != 0:
        raise ValueError(f"B={B} must be a multiple of block_docs={Bb}")
    grid = (B // Bb,)

    kernel = functools.partial(_newton_kernel, cfg=cfg)
    eta, iters = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Km1, Km1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, K, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, Km1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, Km1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Bb, Km1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            # rank-1 outputs need 128-multiple blocks on TPU; use (Bb, 1)
            pl.BlockSpec((Bb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Km1), beta_doc.dtype),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        interpret=interpret,
    )(siginv, beta_doc, counts, mu, eta0)
    return eta, iters[:, 0]


pallas_newton = jax.jit(
    pallas_newton_impl, static_argnames=("cfg", "block_docs", "interpret")
)
