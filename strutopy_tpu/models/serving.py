"""Standalone serving: theta inference from saved model artifacts.

Production path the reference lacks entirely: load a fitted model's
artifact directory (the reference-compatible ``*_hat.npy`` set written
by ``STM.save_model``) and infer topic proportions for new documents
with one batched E-step — no refit, no STM instance, no training
corpus.

    theta, eta = infer_from_artifacts("artifacts/fit", new_docs, X=X_new)
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np


def infer_theta(
    beta: np.ndarray,
    sigma: np.ndarray,
    mu_user: np.ndarray,
    documents,
    cfg,
    aspects_user: Optional[np.ndarray] = None,
):
    """One batched E-step under fixed (beta, sigma) with per-doc prior
    means ``mu_user`` -> (theta, eta) in document order."""
    import jax.numpy as jnp

    from strutopy_tpu.corpus.bow import PaddedCorpus, pad_corpus
    from strutopy_tpu.corpus.bucketing import (
        gather_per_bucket,
        make_bucket_plan,
        split_corpus_by_plan,
    )
    from strutopy_tpu.models.em import CorpusData, local_estep_stats
    from strutopy_tpu.models.state import STMState

    V = beta.shape[-1]
    if isinstance(documents, PaddedCorpus):
        corpus = documents
    else:
        corpus = pad_corpus(documents, V=V)
    live = (corpus.counts > 0) & corpus.doc_ok[:, None]
    max_id = int(corpus.words[live].max()) if live.any() else -1
    if max_id >= V:
        raise ValueError(
            f"documents contain word id {max_id} but the model vocabulary "
            f"has only {V} terms — were they encoded with a different "
            "vocabulary? (a silent gather-clamp would produce wrong theta)"
        )
    if corpus.V != V:
        corpus = PaddedCorpus(corpus.words, corpus.counts, corpus.doc_ok, V)
    N_new = corpus.N
    K = beta.shape[-2]

    plan = make_bucket_plan(
        corpus, cfg.batch_size,
        max_buckets=cfg.max_buckets if cfg.auto_bucket else 1,
    )
    buckets = split_corpus_by_plan(corpus, plan)
    N_pad = plan.n_storage

    mu_storage = np.concatenate(
        gather_per_bucket(np.asarray(mu_user, np.float32), plan), axis=0
    )

    if aspects_user is None:
        aspects_user = np.zeros(N_new, np.int32)
    aspect_buckets = gather_per_bucket(np.asarray(aspects_user, np.int32), plan)

    data = CorpusData(
        words=tuple(jnp.asarray(b.words) for b in buckets),
        counts=tuple(jnp.asarray(b.counts) for b in buckets),
        aspects=tuple(jnp.asarray(a) for a in aspect_buckets),
        doc_ok=tuple(jnp.asarray(b.doc_ok) for b in buckets),
        D=tuple(jnp.zeros((b.N, 1), jnp.float32) for b in buckets),
    )
    state = STMState(
        beta=jnp.asarray(beta, jnp.float32),
        mu=jnp.asarray(mu_storage),
        sigma=jnp.asarray(sigma, jnp.float32),
        eta=jnp.asarray(mu_storage),  # warm start at the prior mean
        theta=jnp.zeros((N_pad, K), jnp.float32),
        gamma=jnp.zeros((K - 1, 1), jnp.float32),
        kappa=jnp.zeros((0, V), jnp.float32),
        bound=jnp.asarray(0.0, jnp.float32),
        opt_iters=jnp.zeros((N_pad,), jnp.int32),
    )
    _stats, eta, theta, _iters = local_estep_stats(
        state, data, cfg, plan.batch_sizes
    )
    idx = plan.storage_index[:N_new]
    return np.asarray(theta)[idx], np.asarray(eta)[idx]


def infer_from_artifacts(
    model_dir: str,
    documents,
    X=None,
    beta_index=None,
):
    """Load ``*_hat.npy`` artifacts + config and infer theta for new docs."""
    from strutopy_tpu.corpus.io import load_model_artifacts
    from strutopy_tpu.models.config import STMConfig

    art = load_model_artifacts(model_dir)
    if "beta" not in art or "sigma" not in art:
        raise FileNotFoundError(
            f"{model_dir} does not contain beta_hat.npy/sigma_hat.npy — "
            "is it a model artifact directory written by save_model?"
        )
    cfg_path = os.path.join(model_dir, "stm_config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            raw = f.read()
        try:
            cfg = STMConfig.from_json(raw)
        except TypeError:
            # foreign config (e.g. the reference's): fall back to shape-derived
            cfg = STMConfig(K=art["beta"].shape[-2])
    else:
        cfg = STMConfig(K=art["beta"].shape[-2])

    beta = np.asarray(art["beta"], np.float32)
    sigma = np.asarray(art["sigma"], np.float32)
    K = beta.shape[-2]
    if isinstance(documents, (list, tuple)):
        N_new = len(documents)
    else:
        N_new = documents.N

    if beta.ndim == 3 and beta_index is None:
        raise ValueError(
            "this is a content-covariate model (per-aspect beta); pass "
            "beta_index for the new documents"
        )

    gamma = art.get("gamma")
    if gamma is not None and X is not None:
        Xa = np.asarray(X, np.float64)
        if Xa.ndim == 1:
            Xa = Xa[:, None]
        P = gamma.shape[1]
        if Xa.shape[1] == P - 1:  # intercept column expected
            D = np.c_[np.ones(N_new), Xa]
        elif Xa.shape[1] == P:
            D = Xa
        else:
            raise ValueError(
                f"X has {Xa.shape[1]} column(s) but gamma_hat expects a "
                f"{P}-column design; if the model was fit with a "
                "categorical covariate, pass the SAME one-hot encoding "
                "used at training (build_design one-hot encodes 1-D "
                "non-binary covariates)"
            )
        mu_user = D @ np.asarray(gamma, np.float64).T
    elif gamma is not None and gamma.shape[1] == 1 and cfg.fit_intercept:
        # intercept-only prevalence (STM fit without covariates)
        mu_user = np.tile(np.asarray(gamma, np.float64)[:, 0], (N_new, 1))
    elif gamma is not None and np.abs(gamma).sum() > 0:
        raise ValueError(
            "the model was fit with prevalence covariates (gamma_hat "
            "present); pass X for the new documents"
        )
    elif "eta" in art:
        mu_user = np.tile(np.asarray(art["eta"]).mean(axis=0), (N_new, 1))
    else:
        mu_user = np.zeros((N_new, K - 1))

    return infer_theta(beta, sigma, mu_user.astype(np.float32), documents, cfg,
                       aspects_user=beta_index)
