"""One EM iteration as a single jitted / sharded function.

The reference runs E and M as separate host-side phases with a serial
document loop in between (src/modules/stm.py:855-880).  Here the whole
iteration — sigma factorization, batched E-step, moment reduction,
prevalence/sigma/beta updates — is one pure function of
``(state, data)`` so XLA compiles it once and, under ``shard_map``,
inserts exactly three logical collectives per iteration: the psums of
``beta_ss``, ``sigma_ss``+bound, and the eta moments (see
strutopy_tpu/parallel/sharding.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from strutopy_tpu.models.config import STMConfig
from strutopy_tpu.models.state import STMState
from strutopy_tpu.ops.estep import NewtonConfig, run_estep
from strutopy_tpu.ops.linalg import precompute_sigma
from strutopy_tpu.ops import mstep


class CorpusData(NamedTuple):
    """Device-resident corpus shard + covariate design."""

    words: jax.Array  # (N, L) int32
    counts: jax.Array  # (N, L) float
    aspects: jax.Array  # (N,) int32
    doc_ok: jax.Array  # (N,) bool
    D: jax.Array  # (N, P) prevalence design (zero rows for padding)


class GlobalStats(NamedTuple):
    """Psummed cross-shard sufficient statistics."""

    beta_ss: jax.Array
    sigma_ss: jax.Array
    bound: jax.Array
    Dt_eta: jax.Array
    eta_sum: jax.Array


def local_estep_stats(state: STMState, data: CorpusData, cfg: STMConfig):
    """E-step on the local shard -> (stats to psum, sharded eta/theta/iters)."""
    siginv, sigmaentropy = precompute_sigma(state.sigma)
    ncfg = NewtonConfig(
        max_iters=cfg.newton_max_iters,
        grad_tol=cfg.newton_grad_tol,
        max_backtracks=cfg.newton_max_backtracks,
        cg_iters=cfg.newton_cg_iters,
        bf16_hessian=cfg.newton_bf16_hessian,
    )
    res = run_estep(
        state.beta,
        state.mu,
        state.eta,
        siginv,
        sigmaentropy,
        data.words,
        data.counts,
        data.aspects,
        data.doc_ok,
        cfg=ncfg,
        batch_size=cfg.batch_size,
        use_pallas=cfg.use_pallas,
    )
    mom = mstep.eta_moments(data.D, res.eta)
    stats = GlobalStats(
        beta_ss=res.beta_ss,
        sigma_ss=res.sigma_ss,
        bound=res.bound,
        Dt_eta=mom.Dt_eta,
        eta_sum=mom.eta_sum,
    )
    return stats, res.eta, res.theta, res.newton_iters


def em_iteration(
    state: STMState,
    data: CorpusData,
    design: mstep.PrevalenceDesign,
    kappa_design,
    wcounts,
    cfg: STMConfig,
    psum,
):
    """One full EM iteration; ``psum`` reduces per-shard statistics
    (identity on a single device, ``lax.psum`` under shard_map).

    The sigma residual moment (eta - mu)^T (eta - mu) is computed on the
    local shard *after* mu is materialized from the new gamma — the
    numerically-direct form of reference update_sigma (stm.py:723) —
    and psummed; everything else in the M-step is replicated compute on
    already-psummed stats.
    """
    stats, eta, theta, _iters = local_estep_stats(state, data, cfg)
    stats = GlobalStats(*psum(tuple(stats)))

    mom = mstep.EtaMoments(Dt_eta=stats.Dt_eta, eta_sum=stats.eta_sum)
    gamma, mu_mean = mstep.update_prevalence(
        mom,
        design,
        cfg.model_type,
        cfg.mode,
        ridge_alpha=cfg.ridge_alpha,
        lasso_alpha=cfg.lasso_alpha,
    )
    mu = mstep.compute_mu(data.D, gamma, mu_mean, data.doc_ok, cfg.model_type)

    resid = psum(mstep.residual_moment(eta, mu))
    sigma = mstep.update_sigma(resid, stats.sigma_ss, design.n_docs, cfg.sigma_prior)

    if cfg.lda_beta:
        beta = mstep.update_beta_lda(stats.beta_ss)
        kappa = state.kappa
    else:
        beta, kappa = mstep.update_beta_content(
            stats.beta_ss,
            wcounts,
            kappa_design,
            alpha=cfg.kappa_l2,
            A=cfg.A,
            interactions=True,
            iters=cfg.kappa_newton_iters,
        )
    return STMState(
        beta=beta,
        mu=mu,
        sigma=sigma,
        eta=eta,
        theta=theta,
        gamma=gamma,
        kappa=kappa,
        bound=stats.bound,
    )


def make_em_step(
    cfg: STMConfig,
    design: mstep.PrevalenceDesign,
    kappa_design,
    wcounts,
):
    """Build the single-device jitted EM step: state, data -> state."""

    @jax.jit
    def em_step(state: STMState, data: CorpusData) -> STMState:
        return em_iteration(
            state, data, design, kappa_design, wcounts, cfg, psum=lambda x: x
        )

    return em_step
