"""M-step: global parameter updates from psummed sufficient statistics.

Reference semantics (src/modules/stm.py:622-853):
  * update_mu  — prevalence regression of eta on covariates
    (sklearn OLS/Ridge(0.1)/Lasso(1), stm.py:636-711),
  * update_sigma — covariance + shrinkage (stm.py:713-728),
  * update_beta  — row normalization (LDA-style) or the topical-content
    model: V independent Poisson regressions (mnreg, stm.py:749-853).

TPU-native design: every update is expressed in terms of small, dense
*moment* statistics (D^T eta, D^T D, eta^T eta, sum eta, beta_ss,
sigma_ss) that are psummed over the document mesh axis, so the M-step
itself runs replicated as a handful of (K|P)-sized linear-algebra ops:
  * OLS/ridge -> one posdef solve of the normal equations,
  * lasso     -> FISTA on the same moments (prox-gradient),
  * mnreg     -> one vmapped damped-Newton GLM over the V words
    (replacing the reference's python loop of sklearn PoissonRegressor
    fits — and fixing its per-word column bug (stm.py:825: uses
    counts[:, [1]] for every word) and its A=2 hardcode (stm.py:762)).

Deviations from the reference (see PARITY_NOTES.md): the fitted
intercept is *used* in mu (the reference computes it and then
unconditionally discards it, stm.py:697-704), and the kappa design
matrix drops the reference's dead all-zero column (stm.py:777).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class PrevalenceDesign(NamedTuple):
    """Static (small, replicated) design info for the prevalence regression.

    The full (N, P) design matrix itself is per-document data and lives
    sharded in ``CorpusData.D``; it includes the intercept column (if
    fit_intercept) and has all-zero rows for padding documents so they
    drop out of every moment.
    """

    DtD: jax.Array  # (P, P)
    pen_mask: jax.Array  # (P,) 1.0 where penalized (0.0 on intercept)
    n_docs: jax.Array  # scalar: number of real documents
    # Normal-equation solve operators, precomputed ONCE on the host in
    # float64 (DtD is static across EM iterations; the device solve is
    # then a single well-conditioned (P,P)@(P,K-1) matmul).  A float32
    # on-device pinv of DtD loses ~kappa(D)^2 digits on ill-conditioned
    # user designs (VERDICT r1 weak #6); the f64 host precompute matches
    # sklearn to f32 representation error regardless of conditioning.
    # None -> fall back to the on-device f32 solve (hand-built designs).
    pinv_ols: Optional[jax.Array] = None  # (P, P) = pinv(DtD)
    inv_ridge: Optional[jax.Array] = None  # (P, P) = inv(DtD + a*diag(pen))
    built_ridge_alpha: Optional[float] = None  # alpha baked into inv_ridge


class EtaMoments(NamedTuple):
    Dt_eta: jax.Array  # (P, K-1)
    eta_sum: jax.Array  # (K-1,)


def build_design(
    X: Optional[np.ndarray],
    doc_ok: np.ndarray,
    fit_intercept: bool = True,
    one_hot_threshold: bool = True,
) -> np.ndarray:
    """Host-side design matrix construction.

    Mirrors reference update_mu's input handling (stm.py:657-671):
    non-boolean 1-D covariates are one-hot encoded; boolean/numeric
    arrays pass through.  Appends an intercept column, and zeroes the
    rows of padding documents.
    """
    N = len(doc_ok)
    cols = []
    if X is not None:
        X = np.asarray(X)
        if X.ndim == 1:
            X = X[:, None]
        if X.ndim > 2:
            X = X.reshape(X.shape[0], -1)
        X = X.astype(np.float64)
        is_binary = np.all((X == 0) | (X == 1))
        if not is_binary and one_hot_threshold and X.shape[1] == 1:
            # infer levels from REAL documents only: bucket-padding rows
            # are zero-filled (corpus/bucketing.py::gather_per_bucket),
            # and a spurious level-0 column would desynchronize gamma's
            # columns from the user's own encoding of X
            real = doc_ok.astype(bool)
            levels = np.unique(X[real, 0]) if real.any() else np.unique(X[:, 0])
            if 0 < len(levels) <= 32:  # categorical -> one-hot (reference stm.py:669-671)
                X = (X[:, :1] == levels[None, :]).astype(np.float64)
        cols.append(X)
    if fit_intercept or not cols:
        cols.insert(0, np.ones((N, 1)))
    D = np.concatenate(cols, axis=1)
    D = D * doc_ok[:, None].astype(np.float64)
    return D


def encode_new_covariates(
    X_new: np.ndarray,
    X_train: Optional[np.ndarray],
    doc_ok_train: np.ndarray,
) -> Optional[np.ndarray]:
    """Re-encode NEW documents' covariates exactly as :func:`build_design`
    encoded the training X, or return None when training used no one-hot
    encoding (binary/numeric/multi-column X passes through unchanged).

    Without this, a model fit on a 1-D categorical covariate (one-hot
    encoded at fit time, so gamma has one column per level) cannot
    transform/serve new documents from the raw covariate values — and
    inferring the levels from the NEW batch alone would silently
    misalign gamma's columns whenever a level is absent from it.
    """
    if X_train is None:
        return None
    Xt = np.asarray(X_train, np.float64)
    if Xt.ndim == 1:
        Xt = Xt[:, None]
    if Xt.ndim > 2:
        Xt = Xt.reshape(Xt.shape[0], -1)
    if Xt.shape[1] != 1 or np.all((Xt == 0) | (Xt == 1)):
        return None  # build_design passed it through unencoded
    real = np.asarray(doc_ok_train, bool)
    levels = np.unique(Xt[real, 0]) if real.any() else np.unique(Xt[:, 0])
    if not (0 < len(levels) <= 32):
        return None  # too many levels: build_design kept it numeric
    Xn = np.asarray(X_new, np.float64)
    if Xn.ndim == 1:
        Xn = Xn[:, None]
    if Xn.shape[1] == len(levels):
        return Xn  # caller already passed the one-hot encoding
    if Xn.shape[1] != 1:
        raise ValueError(
            f"the model was fit on a 1-column categorical covariate "
            f"({len(levels)} levels); pass new X as the raw 1-column "
            f"values or as the {len(levels)}-column one-hot encoding, "
            f"got {Xn.shape[1]} columns"
        )
    unseen = ~np.isin(Xn[:, 0], levels)
    if unseen.any():
        raise ValueError(
            f"new documents carry covariate value(s) "
            f"{np.unique(Xn[unseen, 0]).tolist()} not among the training "
            f"levels {levels.tolist()}; the fitted gamma has no "
            "coefficient for them"
        )
    return (Xn[:, :1] == levels[None, :]).astype(np.float64)


def make_prevalence_design(
    X: Optional[np.ndarray],
    doc_ok: np.ndarray,
    fit_intercept: bool = True,
    dtype=jnp.float32,
    ridge_alpha: float = 0.1,
):
    """Returns (D (N,P) numpy, PrevalenceDesign with replicated stats).

    The OLS pseudoinverse and ridge inverse of the normal equations are
    computed here in float64 (reference update_mu solves in f64 via
    sklearn, stm.py:673-694) so the in-jit device solve stays accurate
    on ill-conditioned designs.
    """
    D = build_design(X, doc_ok, fit_intercept=fit_intercept)
    P = D.shape[1]
    pen = np.ones(P)
    if fit_intercept or X is None:
        pen[0] = 0.0
    DtD = D.T @ D  # float64 on host
    design = PrevalenceDesign(
        DtD=jnp.asarray(DtD, dtype),
        pen_mask=jnp.asarray(pen, dtype),
        n_docs=jnp.asarray(float(doc_ok.sum()), dtype),
        # rcond matched to the float32 moment precision: singular values
        # below ~f32 eps carry only noise from the on-device f32 Dt_eta
        # accumulation — inverting them amplifies that noise (measured:
        # a plain f64 pinv is WORSE than f32 at cond > 1e9).
        pinv_ols=jnp.asarray(np.linalg.pinv(DtD, rcond=1e-7), dtype),
        inv_ridge=jnp.asarray(
            np.linalg.inv(DtD + ridge_alpha * np.diag(pen)), dtype
        ),
        built_ridge_alpha=float(ridge_alpha),
    )
    return D.astype(np.float32 if dtype == jnp.float32 else np.float64), design


def eta_moments(D: jax.Array, eta: jax.Array) -> EtaMoments:
    """Per-shard moment statistics of eta (psum these across shards)."""
    return EtaMoments(
        Dt_eta=D.T @ eta,
        eta_sum=jnp.sum(eta, axis=0),
    )


# ---------------------------------------------------------------------------
# prevalence regression (gamma, mu)
# ---------------------------------------------------------------------------


def _fista_lasso(DtD, Dty, pen_mask, n, alpha, iters: int = 600):
    """FISTA for the sklearn Lasso objective on normal-equation moments:
    (1/(2n))||y - D w||^2 + alpha * ||w_pen||_1, jointly over targets.

    DtD (P, P); Dty (P, T); returns W (P, T).
    """
    P, T = Dty.shape
    # Lipschitz constant of the smooth part: lambda_max(DtD)/n via power iter
    def power_body(_, v):
        v = DtD @ v
        return v / jnp.maximum(jnp.linalg.norm(v), 1e-30)

    v0 = jnp.ones((P,), DtD.dtype) / jnp.sqrt(P)
    v = jax.lax.fori_loop(0, 64, power_body, v0)
    lam_max = jnp.dot(v, DtD @ v)
    Lc = jnp.maximum(lam_max / n, 1e-12)
    step = 1.0 / Lc
    thresh = step * alpha * pen_mask[:, None]

    def body(_, carry):
        w, z, t = carry
        grad = (DtD @ z - Dty) / n
        w_new = z - step * grad
        w_new = jnp.sign(w_new) * jnp.maximum(jnp.abs(w_new) - thresh, 0.0)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        z_new = w_new + ((t - 1.0) / t_new) * (w_new - w)
        return (w_new, z_new, t_new)

    w0 = jnp.zeros((P, T), DtD.dtype)
    w, _, _ = jax.lax.fori_loop(0, iters, body, (w0, w0, jnp.asarray(1.0, DtD.dtype)))
    return w


def update_prevalence(
    moments: EtaMoments,
    design: PrevalenceDesign,
    model_type: str,
    mode: str,
    ridge_alpha: float = 0.1,
    lasso_alpha: float = 1.0,
):
    """Solve for gamma; returns (gamma (K-1, P), mu_fn inputs).

    CTM (reference stm.py:648-651): mu is the column mean of eta.
    STM: regression of eta on the design (reference stm.py:654-706).
    """
    if model_type == "CTM":
        P = design.DtD.shape[0]
        Km1 = moments.eta_sum.shape[0]
        gamma = jnp.zeros((Km1, P), design.DtD.dtype)
        mu_mean = moments.eta_sum / jnp.maximum(design.n_docs, 1.0)
        return gamma, mu_mean

    if mode == "ols":
        if design.pinv_ols is not None:  # f64 host-precomputed operator
            gammaT = design.pinv_ols @ moments.Dt_eta  # min-norm, (P, K-1)
        else:
            gammaT = jnp.linalg.pinv(design.DtD) @ moments.Dt_eta
    elif mode == "ridge":
        # only trust the precomputed inverse when its baked-in alpha is
        # known (a concrete float, not a tracer) and matches
        if design.inv_ridge is not None and (
            isinstance(design.built_ridge_alpha, float)
            and design.built_ridge_alpha == ridge_alpha
        ):
            gammaT = design.inv_ridge @ moments.Dt_eta
        else:
            A = design.DtD + ridge_alpha * jnp.diag(design.pen_mask)
            gammaT = jnp.linalg.solve(A, moments.Dt_eta)
    elif mode == "lasso":
        gammaT = _fista_lasso(
            design.DtD,
            moments.Dt_eta,
            design.pen_mask,
            jnp.maximum(design.n_docs, 1.0),
            lasso_alpha,
        )
    else:
        raise ValueError(f"unknown prevalence mode {mode}")
    return gammaT.T, None


def compute_mu(D, gamma, mu_mean, doc_ok, model_type: str):
    """Materialize per-document mu on the local shard."""
    if model_type == "CTM":
        mu = jnp.broadcast_to(mu_mean[None, :], (D.shape[0], mu_mean.shape[0]))
        return mu * doc_ok[:, None].astype(mu.dtype)
    return D @ gamma.T  # padding rows of D are zero -> mu 0 for dummies


# ---------------------------------------------------------------------------
# sigma update
# ---------------------------------------------------------------------------


def residual_moment(eta: jax.Array, mu: jax.Array) -> jax.Array:
    """Per-shard (eta - mu)^T (eta - mu) — computed on residuals
    directly (not by moment expansion, which cancels catastrophically in
    float32 when mu explains most of eta's variance).  psum across
    shards.
    """
    r = eta - mu
    return r.T @ r


def update_sigma(
    resid: jax.Array,
    sigma_ss: jax.Array,
    n_docs: jax.Array,
    sigma_prior: float,
):
    """sigma = ((eta-mu)^T (eta-mu) + sum nu) / N + diagonal shrinkage
    (reference stm.py:713-728)."""
    n = jnp.maximum(n_docs, 1.0)
    sigma = (resid + sigma_ss) / n
    sigma = 0.5 * (sigma + sigma.T)
    return jnp.diag(jnp.diagonal(sigma)) * sigma_prior + (1.0 - sigma_prior) * sigma


# ---------------------------------------------------------------------------
# beta update: LDA-style or content model (kappa)
# ---------------------------------------------------------------------------


def update_beta_lda(beta_ss, smoothing: float = 0.0, row_psum=None):
    """Row-normalize the phi sufficient statistics (reference stm.py:739-745).

    ``smoothing`` adds a pseudocount per (topic, word) cell first —
    off by default to match the reference exactly (whose bare
    normalization zeroes unseen words, making heldout -inf on any
    out-of-training word; see STMConfig.beta_smoothing).

    ``row_psum`` reduces the per-row sums across vocab shards when
    beta_ss is vocab-sharded (a (K, 1) psum — the only M-step vocab
    collective); the per-cell normalization stays local.
    """
    if smoothing and smoothing > 0.0:
        beta_ss = beta_ss + jnp.asarray(smoothing, beta_ss.dtype)
    row_sums = jnp.sum(beta_ss, axis=-1, keepdims=True)
    if row_psum is not None:
        row_sums = row_psum(row_sums)
    return jnp.where(row_sums > 0, beta_ss / jnp.maximum(row_sums, 1e-30), 0.0)


def build_kappa_design(K: int, A: int, interactions: bool) -> np.ndarray:
    """Dense covariate design for the content model, ((A*K), P).

    Rows are (aspect a, topic k) in a-major order, matching the
    reference's concat of per-aspect beta_ss (stm.py:762-764, but with
    dynamic A).  Columns: K topic indicators, A aspect indicators, and
    A*K interaction indicators when requested (reference stm.py:767-790,
    without its dead always-zero column).
    """
    if A == 1:
        return np.eye(K)
    rows = A * K
    a_idx = np.repeat(np.arange(A), K)
    k_idx = np.tile(np.arange(K), A)
    P = K + A + (A * K if interactions else 0)
    X = np.zeros((rows, P))
    X[np.arange(rows), k_idx] = 1.0
    X[np.arange(rows), K + a_idx] = 1.0
    if interactions:
        X[np.arange(rows), K + A + np.arange(rows)] = 1.0
    return X


def _poisson_newton_batch(Y, m, Xd, offset, alpha, n, iters, W0,
                          tol=1e-6, lp_clip=30.0, ftol_rel=0.0):
    """Batched damped Newton for a chunk of penalized Poisson regressions.

    One word's sklearn PoissonRegressor objective (fit_intercept=False):
      (1/n) sum_r [exp(z_r) - y_r z_r] + (alpha/2)||w||^2,
      z = m_v + offset + X w.
    All Vc words of the chunk solve together as batched MXU work:
      * gradient: one (P, R) @ (R, Vc) matmul,
      * Hessians: one einsum -> (Vc, P, P),
      * solves: blocked Cholesky + divide-and-conquer triangular
        inverse (ops/linalg.py) — straight-line batched einsums instead
        of the P-step sequential While loops XLA lowers LU/Cholesky to
        on TPU (the same fix as the E-step finalize, RESULTS.md),
      * line search: 6 halving steps evaluated for every word at once.
    The while_loop exits when every word's gradient max-norm is below
    ``tol`` (the reference fits each word to sklearn tol=1e-5,
    stm.py:820) — warm-started solves (kappa0 from the previous EM
    iteration) typically finish in 2-4 iterations instead of the fixed
    cold-start budget.

    Y (R, Vc); m (Vc,); Xd (R, P); offset (R,); W0 (P, Vc).
    Returns (W (P, Vc), n_newton_iters scalar).
    """
    from strutopy_tpu.ops.linalg import blocked_cholesky, tri_lower_inverse

    R, P = Xd.shape
    dtype = Xd.dtype
    eyeP = alpha * jnp.eye(P, dtype=dtype)
    base = m[None, :] + offset[:, None]  # (R, Vc)
    ts = jnp.asarray([1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125], dtype)

    def obj(W):
        Z = jnp.clip(base + Xd @ W, -lp_clip, lp_clip)
        return (
            jnp.sum(jnp.exp(Z) - Y * Z, axis=0) / n
            + 0.5 * alpha * jnp.sum(W * W, axis=0)
        )  # (Vc,)

    def cond(carry):
        _, _, it, done = carry
        return (it < iters) & ~jnp.all(done)

    def body(carry):
        W, F, it, done = carry
        Z = jnp.clip(base + Xd @ W, -lp_clip, lp_clip)
        lam = jnp.exp(Z)  # (R, Vc)
        G = Xd.T @ ((lam - Y) / n) + alpha * W  # (P, Vc)
        H = (
            jnp.einsum("rp,rv,rq->vpq", Xd, lam, Xd,
                       preferred_element_type=dtype) / n
            + eyeP[None]
        )  # (Vc, P, P), SPD
        L = blocked_cholesky(H, block=16)
        Wi = tri_lower_inverse(L)  # L^{-1}; H^{-1} = Wi^T Wi
        U = jnp.einsum("vpq,qv->vp", Wi, G, preferred_element_type=dtype)
        D = -jnp.einsum("vqp,vq->pv", Wi, U,
                        preferred_element_type=dtype)  # (P, Vc)

        # halving line search, all (step, word) pairs at once; the
        # candidate objectives are evaluated on W + t*D directly (not
        # incrementally from XW + t*XD) so accepted steps agree with
        # the next iteration's fresh evaluation to the last f32 bit
        Ws = W[None] + ts[:, None, None] * D[None]  # (T, P, Vc)
        Zs = jnp.clip(
            base[None] + jnp.einsum("rp,tpv->trv", Xd, Ws,
                                    preferred_element_type=dtype),
            -lp_clip, lp_clip,
        )  # (T, R, Vc)
        Fs = (
            jnp.sum(jnp.exp(Zs) - Y[None] * Zs, axis=1) / n
            + 0.5 * alpha * jnp.sum(Ws * Ws, axis=1)
        )  # (T, Vc)
        best = jnp.argmin(Fs, axis=0)  # (Vc,)
        t_best = ts[best]
        f_new = jnp.min(Fs, axis=0)
        improved = f_new < F
        gnorm = jnp.max(jnp.abs(G), axis=0)  # (Vc,)
        step = improved & ~done
        W = jnp.where(step[None, :], W + t_best[None, :] * D, W)
        F = jnp.where(step, f_new, F)
        # a word is done when its gradient meets tol, the line search
        # stalls (no halving step improves a convex objective only at
        # the f32 noise floor), or — with ftol_rel > 0 — the accepted
        # step's relative improvement is below the threshold: at the f32
        # cancellation floor the objective difference is noise, so
        # gnorm may never meet tol while further iterations only churn
        # (the delta-magnitude convergence skip; the round-4
        # cancellation-free line search measured a 1.85x REGRESSION —
        # freezing such words is the cheap exit, not sharper deltas).
        # ftol_rel=0 reproduces the old exit exactly (improving words
        # have rel_impr > 0; non-improving ones are caught by ~improved)
        rel_impr = (F - f_new) / jnp.maximum(jnp.abs(F), 1e-30)
        done = done | (gnorm < tol) | ~improved | (rel_impr < ftol_rel)
        return (W, F, it + 1, done)

    # pre-loop convergence check: words whose warm start already meets
    # tol skip the whole body (one gradient eval is ~10x cheaper than a
    # body iteration's Hessian build + Cholesky + line search); at
    # steady state most words are already converged, so whole chunks
    # exit the while_loop with zero iterations
    Z0 = jnp.clip(base + Xd @ W0, -lp_clip, lp_clip)
    G0 = Xd.T @ ((jnp.exp(Z0) - Y) / n) + alpha * W0
    done0 = jnp.max(jnp.abs(G0), axis=0) < tol
    W, _, n_it, _ = jax.lax.while_loop(
        cond, body, (W0, obj(W0), jnp.zeros((), jnp.int32), done0)
    )
    return W, n_it


def _poisson_newton_word(y, m_v, Xd, offset, alpha, n, iters,
                         w0=None, tol=1e-7, lp_clip=30.0):
    """Single-word wrapper over :func:`_poisson_newton_batch` (tests)."""
    dtype = Xd.dtype
    if w0 is None:
        w0 = jnp.zeros((Xd.shape[1],), dtype)
    W, _ = _poisson_newton_batch(
        y[:, None], jnp.reshape(m_v, (1,)), Xd, offset, alpha, n, iters,
        w0[:, None], tol=tol, lp_clip=lp_clip,
    )
    return W[:, 0]


def _kappa_vchunk(V: int, P: int, budget_floats: int = 16_000_000) -> int:
    """Words per scan chunk.  Two constraints, both measured at the
    P=302 stress shape (benchmarks/results_kappa_ab.json, v5e):

    * the (Vc, P, P) Hessian workspace must stay VMEM/HBM-friendly;
    * SMALLER chunks win outright under the frequency-sorted layout
      (each chunk's while_loop exits at its own worst word): 128 beats
      256 by ~31% warm and ~36% cold, while 1024/2048 are ~2x slower.
      64 collapses warm (+187%) — scan overhead takes over.

    The 16M-float budget maps P=302 to the measured winner (128) and
    leaves small-P configs (which bind on min(V, .) anyway) unchanged.
    """
    c = max(128, budget_floats // max(P * P, 1))
    c = 1 << (c.bit_length() - 1)  # round down to a power of two
    return min(V, c)


@functools.partial(
    jax.jit, static_argnames=("iters", "vocab_psum", "vocab_pmax")
)
def update_beta_content(
    beta_ss,  # (A, K, V) or (K, V) — the LOCAL shard when vocab-sharded
    wcounts,  # (V,) corpus-wide word counts (local shard when sharded)
    kappa_design,  # ((A*K), P) from build_kappa_design (encodes A/interactions)
    alpha: float = 250.0,
    iters: int = 40,
    kappa0=None,  # (P, V) warm start (previous EM iteration's kappa)
    tol: float = 1e-6,
    vocab_psum=None,  # sum-reduce over the vocab mesh axis (sharded)
    vocab_pmax=None,  # max-reduce over the vocab mesh axis (sharded)
    wcounts_total=None,  # scalar sum over the FULL vocab (sharded)
    ftol_rel: float = 0.0,  # delta-magnitude convergence skip (see
    # _poisson_newton_batch): freeze words whose accepted Newton step
    # improves the objective by less than ftol_rel relative; 0 = off
):
    """Content model: V parallel Poisson regressions -> (beta, kappa).

    Reference mnreg (stm.py:749-853): counts ((A*K), V) = stacked
    beta_ss; fixed intercept m = log relative word frequency; offset =
    log row totals; per-word sklearn PoissonRegressor(alpha=250);
    predictions row-softmaxed into beta.  Here the V fits run as
    word-chunked batched damped Newton (:func:`_poisson_newton_batch`)
    scanned over chunks, warm-started from ``kappa0`` — the previous EM
    iteration's kappa makes steady-state updates converge in a few
    Newton steps instead of the reference's cold per-word refits.

    Vocab sharding: the per-word solves are independent, so each device
    fits only the words of its shard; the cross-shard quantities are
    three (A*K)-sized reductions — the offset row totals
    (``vocab_psum``), the row max and the row normalizer of the final
    softmax (``vocab_pmax`` + ``vocab_psum``) — plus the scalar
    ``wcounts_total``.
    """
    dtype = beta_ss.dtype
    if beta_ss.ndim == 3:
        counts = beta_ss.reshape(-1, beta_ss.shape[-1])  # ((A*K), V)
    else:
        counts = beta_ss
    R, V = counts.shape
    n = jnp.asarray(R, dtype)

    wc_total = jnp.sum(wcounts) if wcounts_total is None else wcounts_total
    m = jnp.log(jnp.maximum(wcounts, 1e-10)) - jnp.log(jnp.maximum(wc_total, 1e-10))
    m = m.astype(dtype)
    row_tot = jnp.sum(counts, axis=1)  # ((A*K),)
    if vocab_psum is not None:
        row_tot = vocab_psum(row_tot)
    offset = jnp.log(jnp.maximum(row_tot, 1e-10))  # ((A*K),)
    Xd = jnp.asarray(kappa_design, dtype)
    P = Xd.shape[1]
    if kappa0 is None:
        kappa0 = jnp.zeros((P, V), dtype)

    # difficulty-sort words by corpus frequency before chunking (the
    # E-step's difficulty-sorted-chunking trick applied to words): each
    # chunk's while_loop runs to ITS words' worst Newton count, and
    # solve difficulty tracks word frequency, so grouping rare words
    # together lets their chunks exit early instead of riding every
    # chunk to the hardest word's count.  The permutation is a pure
    # relabeling of independent solves — results are bitwise-identical
    # per word.
    order = jnp.argsort(wcounts[:V])
    inv_order = jnp.argsort(order)
    m_user = m  # unsorted: the final linpred indexes words in user order
    counts = counts[:, order]
    m = m[order]
    kappa0 = kappa0[:, order]

    Vc = _kappa_vchunk(V, P)
    nc = -(-V // Vc)
    Vp = nc * Vc
    if Vp != V:
        # pad with silent words (count 0, vanishing frequency): their
        # solves sit at the converged w=0 point immediately
        counts = jnp.pad(counts, ((0, 0), (0, Vp - V)))
        m = jnp.pad(m, (0, Vp - V), constant_values=jnp.log(1e-10))
        kappa0 = jnp.pad(kappa0, ((0, 0), (0, Vp - V)))

    Yc = counts.reshape(R, nc, Vc).transpose(1, 0, 2)  # (nc, R, Vc)
    mc = m.reshape(nc, Vc)
    W0c = kappa0.reshape(P, nc, Vc).transpose(1, 0, 2)  # (nc, P, Vc)
    alpha_ = jnp.asarray(alpha, dtype)

    def chunk_fn(it_max, chunk):
        Y, mv, W0 = chunk
        W, n_it = _poisson_newton_batch(
            Y, mv, Xd, offset, alpha_, n, iters, W0, tol=tol,
            ftol_rel=ftol_rel,
        )
        return jnp.maximum(it_max, n_it), W

    kappa_iters, Wc = jax.lax.scan(
        chunk_fn, jnp.zeros((), jnp.int32), (Yc, mc, W0c)
    )
    kappa = Wc.transpose(1, 0, 2).reshape(P, Vp)[:, :V][:, inv_order]

    linpred = m_user[None, :V] + Xd @ kappa  # ((A*K), V)
    mx = jnp.max(linpred, axis=1, keepdims=True)
    if vocab_pmax is not None:
        mx = vocab_pmax(mx)
    expl = jnp.exp(linpred - mx)
    norm = jnp.sum(expl, axis=1, keepdims=True)
    if vocab_psum is not None:
        norm = vocab_psum(norm)
    beta = expl / norm
    if beta_ss.ndim == 3:
        beta = beta.reshape(beta_ss.shape)
    return beta, kappa
