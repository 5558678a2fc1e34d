"""Emulator validation diagnostics and posterior sampling.

The reference ships no validation tooling — emulator quality was checked by
eye against toy problems (SURVEY.md §4) — yet leave-one-out diagnostics and
posterior draws are exactly what the MADAI calibration workflow needs to
trust an emulator before running MCMC against it. This module adds both,
TPU-first (everything jit-able / vmappable over the PCA-component axis):

  * Closed-form leave-one-out cross-validation for the universal-kriging
    (GLS mean) GP. No N refits: with the projected precision
        P = C^-1 - W A^-1 W^T,   W = C^-1 H,  A = H^T C^-1 H
    the model trained on the other N-1 points (with beta re-estimated by
    GLS on those points) predicts point i with
        residual_i = (P y)_i / P_ii = alpha_i / P_ii
        variance_i = 1 / P_ii
    (Dubrule 1983's kriging LOO identity; P y = alpha because beta is the
    GLS maximizer). Cost: one factorization + one triangular inversion —
    MXU GEMMs, not an N-fold refit loop.
  * Standard validation summaries (RMSE, standardized-error moments,
    central-interval coverage, log pseudo-likelihood) for LOO or an
    external test set.
  * Full posterior covariance over a query block and exact joint posterior
    sampling (eigendecomposition-based, robust to the rank deficiency a GP
    posterior covariance always has when m > N).
  * Multivariate (PCA) variants: vmapped per-component LOO rotated back to
    observable space, and joint observable-space samples that preserve both
    cross-observable correlation (shared PCs) and cross-point correlation
    (GP posterior covariance).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from madaiemulator_tpu.models.gp import (
    GPData,
    GPPosteriorState,
    _factor,
    regression_basis,
)
from madaiemulator_tpu.ops import kernels, linalg
from madaiemulator_tpu.ops.kernels import GPParams
from madaiemulator_tpu.utils.config import GPConfig


class LOOResult(NamedTuple):
    """Leave-one-out predictions for each training point.

    mean/variance are the LOO predictive distribution of the OBSERVED value
    y_i (they include the nugget: the diagonal of C does), residual is
    y_i - mean_i, standardized is residual_i / sqrt(variance_i) — ~N(0,1)
    when the emulator's error model is calibrated.
    """

    mean: jax.Array  # (N,)
    variance: jax.Array  # (N,)
    residual: jax.Array  # (N,)
    standardized: jax.Array  # (N,)
    ok: jax.Array  # scalar bool: factorization succeeded


def _projected_precision_diag(st: GPPosteriorState) -> jax.Array:
    """diag(P) with P = C^-1 - W A^-1 W^T from a factorization state."""
    L = st.L
    hi = jax.lax.Precision.HIGHEST
    n = L.shape[0]
    if L.dtype == jnp.float64:
        Linv = jax.lax.linalg.triangular_solve(
            L, jnp.eye(n, dtype=L.dtype), left_side=True, lower=True
        )
    else:
        Linv = linalg.tri_inv_block(L, precision=hi)
    cinv_diag = jnp.sum(Linv * Linv, axis=0)  # diag(L^-T L^-1)
    # W = C^-1 H = L^-T (L^-1 H);  diag(W A^-1 W^T) = sum(W * (A^-1 W^T)^T)
    W = jax.lax.linalg.triangular_solve(
        L, st.Linv_H, left_side=True, lower=True, transpose_a=True
    )
    Z = linalg.cho_solve(st.LA, W.T)  # (p, N) = A^-1 W^T
    return cinv_diag - jnp.sum(W * Z.T, axis=1)


def _loo_from_state(st: GPPosteriorState, y: jax.Array) -> LOOResult:
    """LOO predictions from an existing factorization state (no refactor)."""
    pdiag = _projected_precision_diag(st)
    # SPD C + full-rank H (N > p) guarantee pdiag > 0; the floor only
    # guards the gated-failure branch (ok=False) from dividing by ~0.
    tiny = jnp.asarray(jnp.finfo(pdiag.dtype).tiny, pdiag.dtype)
    pdiag = jnp.maximum(pdiag, tiny)
    resid = st.alpha / pdiag
    var = 1.0 / pdiag
    nan = jnp.asarray(jnp.nan, pdiag.dtype)
    return LOOResult(
        mean=jnp.where(st.ok, y - resid, nan),
        variance=jnp.where(st.ok, var, nan),
        residual=jnp.where(st.ok, resid, nan),
        standardized=jnp.where(st.ok, resid / jnp.sqrt(var), nan),
        ok=st.ok,
    )


def loo_cv(
    params: GPParams, data: GPData, config: GPConfig
) -> LOOResult:
    """Closed-form leave-one-out cross-validation (see module docstring).

    Equivalent to refitting the GLS mean on each size-(N-1) subset and
    predicting the held-out point (hyperparameters held fixed, as is
    standard for LOO model checking); pinned against the brute-force
    N-refit loop in tests/test_diagnostics.py. jit-able and vmappable
    over a component/ensemble axis.
    """
    if data.dY is not None:
        raise ValueError(
            "loo_cv does not support gradient-enhanced data: leaving out a "
            "value row while keeping its gradient rows is not a "
            "leave-one-POINT-out validation; drop dY (refit values-only) "
            "to cross-validate"
        )
    return _loo_from_state(_factor(data, params, config), data.y)


def validation_summary(
    mean, variance, y_true, interval: float = 0.95
) -> Dict[str, float]:
    """Host-side calibration summary of predictive (mean, variance) vs truth.

    Returns rmse / mae, moments of the standardized errors (target: 0 / 1),
    fraction of truths inside the central `interval` (target: `interval`),
    and the Gaussian log predictive density per point (the LOO
    pseudo-likelihood when fed LOOResult fields).
    """
    mean = np.asarray(mean, dtype=np.float64).ravel()
    var = np.asarray(variance, dtype=np.float64).ravel()
    y = np.asarray(y_true, dtype=np.float64).ravel()
    err = y - mean
    std = np.sqrt(np.maximum(var, np.finfo(np.float64).tiny))
    zed = err / std
    # central interval half-width in sigmas (no scipy in the base image):
    # Phi^-1((1+p)/2) via the rational approximation of Acklam (|rel err|
    # < 1.2e-9 — far below sampling noise at any realistic N)
    zcrit = _norm_ppf(0.5 * (1.0 + interval))
    return {
        "n": int(y.size),
        "rmse": float(np.sqrt(np.mean(err**2))),
        "mae": float(np.mean(np.abs(err))),
        "standardized_mean": float(np.mean(zed)),
        "standardized_std": float(np.std(zed)),
        "coverage": float(np.mean(np.abs(zed) <= zcrit)),
        "coverage_target": float(interval),
        # use the floored std (not the raw variance) so an exact-zero
        # variance (e.g. nugget-free interpolation at a training point)
        # cannot emit -inf / a numpy warning while the other summaries
        # degrade gracefully
        "log_pseudo_likelihood": float(
            np.sum(-0.5 * np.log(2.0 * np.pi) - np.log(std) - 0.5 * zed**2)
        ),
    }


def _norm_ppf(p: float) -> float:
    """Standard-normal quantile (Acklam's rational approximation)."""
    a = [-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00]
    plow, phigh = 0.02425, 1 - 0.02425
    if not 0.0 < p < 1.0:
        raise ValueError("p must be in (0, 1)")
    if p < plow:
        q = np.sqrt(-2.0 * np.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q
                + c[5]) / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    if p > phigh:
        return -_norm_ppf(1.0 - p)
    q = p - 0.5
    r = q * q
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r
            + a[5]) * q / (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r
                            + b[4]) * r + 1)


def loo_summary(res: LOOResult, y: jax.Array, **kw) -> Dict[str, float]:
    """validation_summary of a LOOResult against the training vector."""
    return validation_summary(res.mean, res.variance, y, **kw)


# ---------------------------------------------------------------------------
# Full posterior covariance + sampling
# ---------------------------------------------------------------------------


def posterior_covariance(
    state: GPPosteriorState,
    params: GPParams,
    data: GPData,
    Xs: jax.Array,
    config: GPConfig,
) -> Tuple[jax.Array, jax.Array]:
    """Posterior mean (m,) and FULL covariance (m, m) over a query block.

    Same math as models/gp._predict_core but keeping the cross terms:
        Sigma = K** - V^T V + W^T W,  V = L^-1 K*,  W = LA^-1 G.
    With config.predict_variance_includes_nugget the nugget is added to the
    diagonal (the covariance of noisy observations rather than latent f).
    The full m x m matrix is materialized: keep query blocks to a few
    thousand points (sampling is O(m^3) anyway).
    """
    Ks = kernels.cross_covariance(data.X, Xs, params, config)  # (N, m)
    Hs = regression_basis(Xs, config.regression_order)  # (m, p)
    hi = jax.lax.Precision.HIGHEST
    mean = jnp.dot(Hs, state.beta, precision=hi) + jnp.dot(
        Ks.T, state.alpha, precision=hi
    )
    Kss = kernels.cross_covariance(Xs, Xs, params, config)
    Kss = 0.5 * (Kss + Kss.T)
    V = linalg.solve_lower(state.L, Ks)  # (N, m)
    cov = Kss - jnp.dot(V.T, V, preferred_element_type=V.dtype, precision=hi)
    G = Hs.T - jnp.dot(state.Linv_H.T, V, precision=hi)  # (p, m)
    W = linalg.solve_lower(state.LA, G)  # (p, m)
    cov = cov + jnp.dot(W.T, W, preferred_element_type=W.dtype, precision=hi)
    if config.predict_variance_includes_nugget:
        cov = cov + jnp.exp(params.log_nugget) * jnp.eye(
            Xs.shape[0], dtype=cov.dtype
        )
    # a state whose factorization failed (ok=False) carries placeholder
    # factors — the algebra above would return a confidently-wrong matrix;
    # gate to NaN so downstream draws are visibly invalid, matching loo_cv
    nan = jnp.asarray(jnp.nan, mean.dtype)
    return jnp.where(state.ok, mean, nan), jnp.where(state.ok, cov, nan)


def _eigh_draws(
    mean: jax.Array, cov: jax.Array, key: jax.Array, num_samples: int
) -> jax.Array:
    """Exact joint draws from N(mean, cov): (S, m).

    Factorizes by symmetric eigendecomposition with negative eigenvalues
    clamped to zero — a GP posterior covariance is exactly rank-deficient
    whenever m > N (m - N zero directions), so a Cholesky + jitter ladder
    is the wrong tool; eigh handles the degeneracy natively and keeps the
    draws exact in the positive subspace. The single draw implementation
    shared by the dense and matrix-free sampling paths."""
    lam, U = jnp.linalg.eigh(cov)
    scale = jnp.sqrt(jnp.maximum(lam, 0.0))
    z = jax.random.normal(key, (num_samples, mean.shape[0]), dtype=mean.dtype)
    return mean[None, :] + jnp.dot(
        z * scale[None, :], U.T, preferred_element_type=mean.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


def _rotate_pc_draws(Zs: jax.Array, pca) -> jax.Array:
    """PC-space joint draws (r, S, m) -> observable space (S, m, t):
    y[s, q, j] = ybar_j + s_j * sum_i sqrt(lam_i) U_ji z_i[s, q]. Shared by
    the dense and matrix-free multivariate samplers."""
    sqrt_lam = jnp.sqrt(pca.eigenvalues.astype(Zs.dtype))
    U = pca.U.astype(Zs.dtype)
    Y = jnp.einsum("rsm,jr->smj", Zs * sqrt_lam[:, None, None], U)
    return pca.ymean[None, None, :] + Y * pca.ystd[None, None, :]


def sample_posterior(
    state: GPPosteriorState,
    params: GPParams,
    data: GPData,
    Xs: jax.Array,
    config: GPConfig,
    key: jax.Array,
    num_samples: int,
) -> jax.Array:
    """`num_samples` exact joint draws from the GP posterior at Xs: (S, m)
    (see _eigh_draws for the rank-deficiency-safe factorization)."""
    mean, cov = posterior_covariance(state, params, data, Xs, config)
    return _eigh_draws(mean, cov, key, num_samples)


# ---------------------------------------------------------------------------
# Multivariate (PCA) variants
# ---------------------------------------------------------------------------


def loo_cv_multivariate(emu) -> Tuple[LOOResult, jax.Array, jax.Array]:
    """Per-component LOO (vmapped) + observable-space LOO (mean, variance).

    Returns (component LOOResult with (r, N) leading axes,
    loo_mean (N, t), loo_var (N, t)). The observable-space numbers are the
    PCA reconstruction of the per-PC LOO predictions — compare them against
    the emulator's own training targets (reconstruct_training_outputs) to
    isolate GP error from PCA truncation error, or against the raw Y to
    include it.
    """
    from madaiemulator_tpu.models.multivariate import reconstruct_observables

    if getattr(emu, "dZ", None) is not None:
        raise ValueError(
            "closed-form LOO is not defined for gradient-enhanced "
            "emulators: removing a design point must remove its value AND "
            "gradient rows together, which the per-row Dubrule identity "
            "cannot express. Validate with a holdout refit instead."
        )
    # reuse the emulator's OWN factorization states rather than refactoring
    # with the base-config jitter: a component the serve-time jitter rescue
    # saved (multivariate._vmapped_states) would refactor non-SPD here and
    # NaN out, and the states already hold everything the Dubrule identity
    # needs — this validates exactly the model being served, at zero extra
    # factorization cost. Matrix-free emulators (build_states=False loads)
    # carry no states; they refactor densely as before.
    states = getattr(emu, "states", None)
    if states is not None:
        res = jax.vmap(_loo_from_state)(states, emu.Z.T)  # fields (r, N)
    else:
        def one(p, z, nz):
            return loo_cv(p, GPData(X=emu.X, y=z, noise=nz), emu.config)

        # getattr: duck-typed emulator stands-ins may predate the noise
        # field (same convention as the `states` probe above)
        noise = getattr(emu, "noise", None)
        if noise is None:
            res = jax.vmap(lambda p, z: one(p, z, None))(
                emu.params, emu.Z.T
            )  # fields (r, N)
        else:
            res = jax.vmap(one)(emu.params, emu.Z.T, noise.T)
    loo_mean, loo_var = reconstruct_observables(
        res.mean, res.variance, emu.pca
    )  # (N, t) each
    return res, loo_mean, loo_var


def reconstruct_training_outputs(emu) -> jax.Array:
    """The training outputs as the retained-r PCA subspace represents them,
    (N, t): ybar + ystd * (Z sqrt(lam)) U^T. The natural ground truth for
    loo_cv_multivariate when PCA truncation error should be excluded."""
    pca = emu.pca
    Z = emu.Z
    sqrt_lam = jnp.sqrt(pca.eigenvalues.astype(Z.dtype))
    return pca.ymean[None, :] + jnp.matmul(
        Z * sqrt_lam[None, :], pca.U.T,
        precision=jax.lax.Precision.HIGHEST,
    ) * pca.ystd[None, :]


def loo_summary_multivariate(
    emu, Y_true: Optional[jax.Array] = None, **kw
) -> Dict[str, float]:
    """Observable-space LOO calibration summary for a multivariate emulator.

    Y_true defaults to the retained-subspace reconstruction of the training
    outputs (GP error only); pass the raw Y matrix (N, t) to include PCA
    truncation error in the residuals (its variance is NOT in the emulator's
    error bars, so expect coverage to drop if truncation is material).
    """
    res, loo_mean, loo_var = loo_cv_multivariate(emu)
    ok = np.asarray(res.ok)
    if not ok.all():
        bad = np.flatnonzero(~ok).tolist()
        raise ValueError(
            f"LOO unavailable: component(s) {bad} have no valid "
            "factorization (non-SPD even after the jitter rescue) — their "
            "LOO fields are NaN and would silently poison the summary"
        )
    if Y_true is None:
        Y_true = reconstruct_training_outputs(emu)
    return validation_summary(loo_mean, loo_var, Y_true, **kw)


def holdout_cv_multivariate(
    emu,
    key: jax.Array,
    n_holdout: int,
    rank: int = 64,
    cg_tol: float = 1e-6,
    cg_max_iters: int = 256,
    jitter: Optional[float] = None,
    query_chunk: int = 128,
    row_chunk: int = 2048,
) -> Tuple[np.ndarray, jax.Array, jax.Array]:
    """Held-out validation at matrix-free scale: (indices, mean, var).

    Validation needs the CALIBRATED (exact-PCG) variance, so the holdout
    predict keeps variance_method="exact" but runs it `query_chunk`=128
    right-hand sides at a time — wide-RHS PCG is the documented TPU-worker
    crash family at large N (docs/ROUND3.md).

    Exact LOO (loo_cv_multivariate) needs diag(C^-1) — a dense-only
    quantity. Past dense-HBM N the standard substitute is holdout
    validation: sample `n_holdout` training points, rebuild the matrix-free
    serving state on the remaining N-m points (training SOLVES only —
    hyperparameters stay fixed, exactly like LOO's convention), and predict
    the held-out block. Works for both IterativeMultivariateEmulator and
    dense MultivariateEmulator (same per-component engine either way); cost
    is one preconditioner + PCG training solve per component on N-m points
    plus one predict.

    Returns (held-out indices (m,), observable-space mean (m, t),
    variance (m, t)).
    """
    from madaiemulator_tpu.models.iterative import (
        precompute_iterative_predictor,
        predict_iterative_from_state,
    )
    from madaiemulator_tpu.models.multivariate import reconstruct_observables

    N = emu.X.shape[0]
    if getattr(emu, "dZ", None) is not None:
        raise ValueError(
            "holdout_cv_multivariate rebuilds a matrix-free serving state, "
            "which has no joint value+gradient operator; refit the held-in "
            "subset with fit_multivariate(gradients=...) instead"
        )
    if not 0 < n_holdout < N:
        raise ValueError(f"n_holdout={n_holdout} must lie in (0, {N})")
    perm = np.asarray(jax.device_get(jax.random.permutation(key, N)))
    hold, keep = perm[:n_holdout], perm[n_holdout:]
    Xk, Xh = emu.X[keep], emu.X[hold]
    ms, vs = [], []
    for i in range(emu.n_components):
        p = jax.tree.map(lambda a: a[i], emu.params)
        d = GPData(
            X=Xk, y=emu.Z[keep, i],
            noise=None if emu.noise is None else emu.noise[keep, i],
        )
        st = precompute_iterative_predictor(
            p, d, emu.config, rank=rank, cg_tol=cg_tol,
            cg_max_iters=cg_max_iters, jitter=jitter, row_chunk=row_chunk,
        )
        m_i, v_i = predict_iterative_from_state(
            st, d, Xh, query_chunk=query_chunk, row_chunk=row_chunk,
        )
        ms.append(m_i)
        vs.append(v_i)
    mean, var = reconstruct_observables(
        jnp.stack(ms), jnp.stack(vs), emu.pca
    )  # (m, t)
    return hold, mean, var


def holdout_summary_multivariate(
    emu,
    key: jax.Array,
    n_holdout: int,
    Y_true: Optional[jax.Array] = None,
    interval: float = 0.95,
    **kw,
) -> Dict[str, float]:
    """Observable-space holdout calibration summary (matrix-free scale).

    Y_true semantics match loo_summary_multivariate: defaults to the
    retained-subspace reconstruction (GP error only); pass the raw (N, t)
    training Y to include PCA truncation error. kw forwards to
    holdout_cv_multivariate (rank, cg_tol, cg_max_iters, jitter,
    query_chunk, row_chunk).
    """
    hold, mean, var = holdout_cv_multivariate(emu, key, n_holdout, **kw)
    if Y_true is None:
        Y_true = reconstruct_training_outputs(emu)
    Y_true = jnp.asarray(Y_true)[hold]
    return validation_summary(mean, var, Y_true, interval=interval)


def loo_cv_multifidelity(emu) -> list:
    """Per-level closed-form LOO for a recursive co-kriging emulator.

    Under Le Gratiet's recursive decoupling (models/multifidelity.py) each
    level k is an ORDINARY GP regression of y_k whose GLS basis carries the
    lower level's values as one extra column, so the exact Dubrule LOO
    identity applies level by level: leaving out point i of level k
    re-estimates (beta, rho_k) by GLS on the remaining points and predicts
    y_k(x_i) — with the lower-level basis column held FIXED (i.e.
    conditioned on the lower levels, the standard convention for
    co-kriging cross-validation; lower levels are validated by their own
    rows of this list). Levels are small by construction, so this is one
    tiny factorization reuse per level — the states are already built.

    Returns a list of n_levels LOOResult, index k in level-k target units
    (level 0: y_0; level k>=1: y_k, NOT the delta process).
    """
    out = []
    for lv in emu.levels:
        out.append(_loo_from_state(lv.state, lv.data.y))
    return out


def loo_summary_multifidelity(emu, interval: float = 0.95) -> list:
    """validation_summary per level (see loo_cv_multifidelity)."""
    return [
        validation_summary(r.mean, r.variance, lv.data.y, interval=interval)
        for r, lv in zip(loo_cv_multifidelity(emu), emu.levels)
    ]


def loo_cv_multifidelity_mv(emu) -> list:
    """Per-level LOO for a MULTIVARIATE multi-fidelity emulator: the
    Dubrule identity applies per level per component (lower-level basis
    columns held fixed, exactly as in loo_cv_multifidelity), vmapped over
    the component axis, then rotated to observable space.

    Returns n_levels entries (LOOResult with (r, N_k) fields,
    loo_mean (N_k, t), loo_var (N_k, t)). Ground truth for level k is the
    PCA representation of its stored targets:
    reconstruct_level_targets_mv(emu, k)."""
    from madaiemulator_tpu.models.multivariate import reconstruct_observables

    out = []
    for lv in emu.levels:
        res = jax.vmap(_loo_from_state)(lv.states, lv.Z.T)  # (r, N_k)
        loo_mean, loo_var = reconstruct_observables(
            res.mean, res.variance, emu.pca
        )
        out.append((res, loo_mean, loo_var))
    return out


def reconstruct_level_targets_mv(emu, k: int) -> jax.Array:
    """Level k's training targets as the retained-r shared PCA subspace
    represents them, (N_k, t) — the truncation-free ground truth for
    loo_cv_multifidelity_mv (see reconstruct_training_outputs)."""
    pca = emu.pca
    Z = emu.levels[k].Z
    sqrt_lam = jnp.sqrt(pca.eigenvalues.astype(Z.dtype))
    return pca.ymean[None, :] + jnp.matmul(
        Z * sqrt_lam[None, :], pca.U.T,
        precision=jax.lax.Precision.HIGHEST,
    ) * pca.ystd[None, :]


def training_residuals_sparse(
    emu, X_raw, query_chunk: int = 4096
) -> Tuple[jax.Array, jax.Array]:
    """Posterior (mean, variance) of a sparse emulator at its own training
    inputs, chunked so the (chunk, m) cross-kernel never scales with N.

    Unlike a dense GP — which interpolates its training data, making
    training residuals vacuous — an SGPR posterior has only m << N
    effective degrees of freedom, so training-point residuals measure real
    out-of-subspace error and the standardized residuals check the
    calibration of the variance (Titsias bound variance >= exact-GP
    variance, so coverage should be AT OR ABOVE target). The serve
    distillate keeps no training arrays (models/sparse.py), hence the
    caller supplies X_raw (and compares against its own Y).

    All chunks share one compiled program: the trailing partial chunk is
    padded to `query_chunk` rows and sliced after.
    """
    from madaiemulator_tpu.models.sparse import predict_multivariate_sparse

    X_raw = np.asarray(X_raw)
    N = X_raw.shape[0]
    chunk = int(min(query_chunk, N))
    ms, vs = [], []
    for s in range(0, N, chunk):
        blk = X_raw[s : s + chunk]
        pad = chunk - blk.shape[0]
        if pad:
            blk = np.concatenate([blk, blk[-1:].repeat(pad, axis=0)])
        m_b, v_b = predict_multivariate_sparse(emu, blk)
        if pad:
            m_b, v_b = m_b[:-pad], v_b[:-pad]
        ms.append(m_b)
        vs.append(v_b)
    return jnp.concatenate(ms), jnp.concatenate(vs)


def training_summary_sparse(
    emu, X_raw, Y, interval: float = 0.95, query_chunk: int = 4096
) -> Dict[str, float]:
    """Calibration summary of a sparse emulator on its training set.

    Y is the raw (N, t) training output block (e.g. from the model file);
    see training_residuals_sparse for why these residuals are meaningful
    for SGPR.
    """
    mean, var = training_residuals_sparse(emu, X_raw, query_chunk)
    return validation_summary(mean, var, Y, interval=interval)


def posterior_covariance_iterative(
    state, data: GPData, Xs: jax.Array, col_chunk: int = 128,
    row_chunk: int = 2048,
) -> Tuple[jax.Array, jax.Array]:
    """Matrix-free posterior mean (m,) + FULL covariance (m, m).

    Same algebra as `posterior_covariance` but every N-dimensional solve
    goes through the cached IterativePosteriorState's PCG instead of a
    dense factorization: Sigma = K** − K*ᵀ C⁻¹K* + Gᵀ A⁻¹ G with
    G = Hsᵀ − CiHᵀ K*. Only the m x m result is materialized — the N-side
    never builds an N x N buffer, so joint draws work at N past dense HBM.
    The C⁻¹K* solve runs `col_chunk` right-hand sides at a time (wide-RHS
    PCG is a known TPU-worker crash trigger at large N — docs/ROUND3.md);
    `row_chunk` bounds the matvec kernel tiles (<= 1024 at N >= 131k, the
    documented worker envelope).
    """
    from madaiemulator_tpu.models.iterative import _matvec_for, pcg_solve

    params, config = state.params, state.config
    Ks = kernels.cross_covariance(data.X, Xs, params, config)  # (N, m)
    Hs = regression_basis(Xs, config.regression_order)  # (m, p)
    hi = jax.lax.Precision.HIGHEST
    mean = jnp.dot(Hs, state.beta, precision=hi) + jnp.dot(
        Ks.T, state.alpha, precision=hi
    )
    mv = _matvec_for(params, data, config, None, row_chunk)
    m = Xs.shape[0]
    chunk = min(col_chunk, m)
    pad = (-m) % chunk
    Ksp = jnp.pad(Ks, ((0, 0), (0, pad))) if pad else Ks

    def solve_cols(B):
        S, _, _ = pcg_solve(
            mv, B, state.pre, tol=state.cg_tol,
            max_iters=state.cg_max_iters,
        )
        return S

    CiKs = jax.lax.map(
        solve_cols, jnp.moveaxis(Ksp.reshape(Ks.shape[0], -1, chunk), 1, 0)
    )  # (n_chunks, N, chunk)
    CiKs = jnp.moveaxis(CiKs, 0, 1).reshape(Ks.shape[0], -1)[:, :m]
    Kss = kernels.cross_covariance(Xs, Xs, params, config)
    cov = Kss - jnp.dot(Ks.T, CiKs, preferred_element_type=Ks.dtype,
                        precision=hi)
    G = Hs.T - jnp.dot(state.CiH.T, Ks, precision=hi)  # (p, m)
    W = jax.lax.linalg.triangular_solve(
        state.LA, G, left_side=True, lower=True
    )
    cov = cov + jnp.dot(W.T, W, preferred_element_type=W.dtype, precision=hi)
    cov = 0.5 * (cov + cov.T)
    if config.predict_variance_includes_nugget:
        cov = cov + jnp.exp(params.log_nugget) * jnp.eye(m, dtype=cov.dtype)
    return mean, cov


def sample_multivariate_posterior_iterative(
    emu, states, Xs_raw: jax.Array, key: jax.Array, num_samples: int,
    col_chunk: int = 128, row_chunk: int = 2048,
) -> jax.Array:
    """Matrix-free joint observable-space posterior draws: (S, m, t).

    The matrix-free twin of `sample_multivariate_posterior`: per-PC
    posterior covariances come from posterior_covariance_iterative (cached
    serving states, PCG solves; col_chunk/row_chunk bound the solve
    footprint at large N), the m x m eigh-based sampling and the PCA
    rotation are the shared helpers. Keep m to a few thousand (the draw
    itself is O(m^3)); N is unconstrained by dense memory.
    """
    from madaiemulator_tpu.utils.designs import apply_scaling

    Xs = apply_scaling(jnp.asarray(Xs_raw, dtype=emu.X.dtype), emu.scaling)
    keys = jax.random.split(key, emu.n_components)
    Zs = []
    for i in range(emu.n_components):
        mean, cov = posterior_covariance_iterative(
            states[i], emu.component_data(i), Xs,
            col_chunk=col_chunk, row_chunk=row_chunk,
        )
        Zs.append(_eigh_draws(mean, cov, keys[i], num_samples))
    return _rotate_pc_draws(jnp.stack(Zs), emu.pca)


def sample_multivariate_posterior(
    emu, Xs_raw: jax.Array, key: jax.Array, num_samples: int
) -> jax.Array:
    """Joint observable-space posterior draws: (S, m, t).

    Each retained PC is sampled from its full GP posterior over the query
    block (independent across PCs — exactly the emulator's model), then
    rotated: y[s, q, j] = ybar_j + s_j * sum_i sqrt(lam_i) U_ji z_i[s, q].
    Draws therefore carry cross-observable correlation (shared PC weights)
    and cross-point correlation (GP covariance) that the marginal
    predict_multivariate variances cannot express.
    """
    from madaiemulator_tpu.utils.designs import apply_scaling

    Xs = apply_scaling(jnp.asarray(Xs_raw, dtype=emu.X.dtype), emu.scaling)
    r = emu.n_components
    keys = jax.random.split(key, r)

    def one(st, p, z, k):
        return sample_posterior(
            st, p, GPData(X=emu.X, y=z), Xs, emu.config, k, num_samples
        )

    Zs = jax.vmap(one)(emu.states, emu.params, emu.Z.T, keys)  # (r, S, m)
    return _rotate_pc_draws(Zs, emu.pca)
