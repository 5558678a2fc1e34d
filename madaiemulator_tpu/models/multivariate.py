"""Multivariate-output emulation via PCA projection + per-component GPs.

TPU-native replacement for the reference's multivariate stack (ref:
src/multi_modelstruct.c alloc/dump/load_multi_modelstruct,
src/multivar_support.c estimate_multi / emulate_point_multi; mount empty this
round — SURVEY.md §0). Pipeline [B]:

  1. standardize each output column (subtract mean; optionally divide by std);
  2. eigendecompose the output covariance, sort eigenvalues descending with a
     deterministic eigenvector sign convention;
  3. retain the top-r components covering `pca_variance` of total variance;
  4. project training outputs to r unit-variance PC scores
     z_i = u_i^T (y - ybar) / (s * sqrt(lambda_i));
  5. fit r independent scalar GPs — `vmap`ed over the component axis (the
     reference loops serially; here one batched fit on the MXU);
  6. predict: per-PC (m_i, v_i) then rotate back:
        mean_j = ybar_j + s_j * sum_i sqrt(lambda_i) U_ji m_i
        var_j  = s_j^2  * sum_i lambda_i  U_ji^2 v_i

The retained rank r is decided host-side (it changes array shapes); all
device work below is shape-static and jit/vmap-friendly.
"""

from __future__ import annotations

import functools
import logging
from typing import NamedTuple, Optional, Tuple

logger = logging.getLogger("madaiemulator_tpu")

import jax
import jax.numpy as jnp
import numpy as np

from madaiemulator_tpu.models.fit import FitResult, fit_gp
from madaiemulator_tpu.models.gp import (
    GPData,
    GPPosteriorState,
    precompute_predictor,
    predict_from_precomputed,
)
from madaiemulator_tpu.ops.kernels import GPParams
from madaiemulator_tpu.utils.config import GPConfig
from madaiemulator_tpu.utils.designs import DesignScaling, apply_scaling, fit_scaling


class PCAState(NamedTuple):
    ymean: jax.Array  # (t,)
    ystd: jax.Array  # (t,) ones when standardize=False
    eigenvalues: jax.Array  # (r,) retained, descending
    U: jax.Array  # (t, r) retained eigenvectors (columns)


class MultivariateEmulator(NamedTuple):
    """A trained multivariate emulator (snapshot payload + serving cache).

    `noise` (optional, (N, r)) holds per-point observation-noise variances
    PROJECTED to PC-score space (see project_noise) — the training-side
    heteroscedastic diagonal each component's factorization was built with.

    `dZ` (optional, (N, d, r)) holds gradient observations PROJECTED to
    PC-score space in SCALED design coordinates (see project_gradients) —
    when present every component is a gradient-enhanced (joint value +
    gradient) GP, and the snapshot persists the block (format version 3).
    `dZ_noise` carries known per-partial gradient-noise variances in the
    same layout.
    """

    scaling: DesignScaling
    X: jax.Array  # (N, d) scaled design
    Z: jax.Array  # (N, r) PC scores (training targets)
    pca: PCAState
    params: GPParams  # batched (r, ...) per-component hyperparameters
    states: GPPosteriorState  # batched (r, ...) posterior factorizations
    config: GPConfig
    restart_log_likelihoods: Optional[jax.Array] = None  # (r, R)
    noise: Optional[jax.Array] = None  # (N, r) PC-space noise variances
    dZ: Optional[jax.Array] = None  # (N, d, r) PC-space gradient obs
    dZ_noise: Optional[jax.Array] = None  # (N, d, r) gradient-noise vars

    @property
    def n_components(self) -> int:
        return self.Z.shape[1]

    @property
    def n_outputs(self) -> int:
        return self.pca.ymean.shape[0]

    def component_data(self, i: int) -> GPData:
        """GPData of component i, incl. its PC-space noise/gradient blocks."""
        nz = None if self.noise is None else self.noise[:, i]
        dz = None if self.dZ is None else self.dZ[:, :, i]
        dznz = None if self.dZ_noise is None else self.dZ_noise[:, :, i]
        return GPData(X=self.X, y=self.Z[:, i], noise=nz, dY=dz,
                      dY_noise=dznz)


def pca_decompose(
    Y: jax.Array, pca_variance: float, standardize: bool = True
) -> Tuple[PCAState, jax.Array]:
    """Host-side PCA of training outputs; returns (state, Z scores (N, r)).

    Deterministic eigenvector sign: the entry of largest magnitude in each
    retained eigenvector is made positive (the reference's GSL eigensolver
    sign is arbitrary; snapshots pin whatever was stored).
    """
    Y = np.asarray(Y)
    n, t = Y.shape
    ymean = Y.mean(axis=0)
    ystd = Y.std(axis=0, ddof=1) if standardize else np.ones(t, Y.dtype)
    ystd = np.maximum(ystd, np.finfo(Y.dtype).tiny)
    Yc = (Y - ymean) / ystd
    cov = (Yc.T @ Yc) / max(n - 1, 1)
    lam, U = np.linalg.eigh(cov)  # ascending
    lam = lam[::-1]
    U = U[:, ::-1]
    lam = np.maximum(lam, 0.0)
    total = lam.sum()
    if total <= 0:
        r = 1
    else:
        frac = np.cumsum(lam) / total
        r = int(np.searchsorted(frac, pca_variance - 1e-12) + 1)
        r = min(max(r, 1), t)
    lam_r, U_r = lam[:r].copy(), U[:, :r].copy()
    # sign convention
    for i in range(r):
        j = np.argmax(np.abs(U_r[:, i]))
        if U_r[j, i] < 0:
            U_r[:, i] = -U_r[:, i]
    denom = np.sqrt(np.maximum(lam_r, np.finfo(Y.dtype).tiny))
    Z = (Yc @ U_r) / denom[None, :]
    state = PCAState(
        ymean=jnp.asarray(ymean),
        ystd=jnp.asarray(ystd),
        eigenvalues=jnp.asarray(lam_r),
        U=jnp.asarray(U_r),
    )
    return state, jnp.asarray(Z)


def project_scores(Y, pca: PCAState, dtype=None) -> jnp.ndarray:
    """PC scores of NEW output rows under an existing PCA basis:
    z = ((y - ymean) / ystd) @ U / sqrt(lambda), the same map
    pca_decompose bakes into its returned Z. Used by the multivariate
    multi-fidelity path, where every fidelity level's outputs project
    through ONE shared basis (models/multifidelity.py)."""
    Y = jnp.asarray(Y)
    if dtype is not None:
        Y = Y.astype(dtype)
    t = pca.ymean.shape[0]
    if Y.ndim != 2 or Y.shape[1] != t:
        raise ValueError(f"outputs must be (N, t={t}); got {Y.shape}")
    lam = jnp.maximum(
        pca.eigenvalues.astype(Y.dtype), jnp.finfo(Y.dtype).tiny
    )
    Yc = (Y - pca.ymean.astype(Y.dtype)[None, :]) / pca.ystd.astype(Y.dtype)[None, :]
    return jnp.matmul(
        Yc, pca.U.astype(Y.dtype), precision=jax.lax.Precision.HIGHEST
    ) / jnp.sqrt(lam)[None, :]


def project_noise(noise, pca: PCAState, dtype=None) -> jnp.ndarray:
    """Per-PC observation-noise variances from per-point output noise.

    noise: (N,) — one variance per design point, applied to every output
    in ORIGINAL y units — or (N, t) per-output variances. z-scoring maps
    sigma_z,ti^2 = sigma_ti^2 / ystd_t^2, and the PC score
    z_k = u_k^T y_z / sqrt(lambda_k) (orthonormal u_k) gives

        Var(z_k,i) = sum_t U_tk^2 sigma_z,ti^2 / lambda_k.

    Cross-PC noise covariances (sum_t U_tk U_tl sigma_z,ti^2) are dropped;
    they are EXACTLY zero when sigma_z,i is isotropic across outputs —
    the same independent-component approximation the PCA emulator already
    makes for the posterior. Returns (N, r), the layout of Z.
    """
    t = pca.ymean.shape[0]
    noise = jnp.asarray(noise)
    if dtype is not None:
        noise = noise.astype(dtype)
    if noise.ndim == 1:
        noise = noise[:, None] * jnp.ones((1, t), noise.dtype)
    if noise.shape[1] != t:
        raise ValueError(
            f"noise must be (N,) or (N, t={t}); got {noise.shape}"
        )
    ystd = pca.ystd.astype(noise.dtype)
    lam = jnp.maximum(
        pca.eigenvalues.astype(noise.dtype),
        jnp.finfo(noise.dtype).tiny,
    )
    U2 = (pca.U.astype(noise.dtype)) ** 2  # (t, r)
    return jnp.matmul(
        noise / ystd[None, :] ** 2, U2,
        precision=jax.lax.Precision.HIGHEST,
    ) / lam[None, :]


def project_gradients(
    dY, pca: PCAState, scaling: DesignScaling, dtype=None
) -> jnp.ndarray:
    """PC-space gradient observations from raw output gradients.

    dY: (N, d, t) — dY[i, a, u] = observed d f_u / d x_a at design point i,
    w.r.t. the RAW (unscaled) inputs. Two linear maps stack exactly:

      - design scaling X_s = (x - mins) / ranges gives
        d/dX_s,a = ranges_a * d/dx_a;
      - the PC score z_k = u_k^T (y - ymean) / (ystd * sqrt(lambda_k)) is
        linear in y, so gradients project with the same weights:
        dz_k/dX_s,a = ranges_a * sum_u dY[:, a, u] U_uk / (ystd_u sqrt(l_k)).

    Unlike the posterior independence approximation, this projection is
    EXACT (gradients of a linear map). Returns (N, d, r), the layout of
    MultivariateEmulator.dZ. For t == 1, dY may be (N, d).
    """
    t = pca.ymean.shape[0]
    dY = jnp.asarray(dY)
    if dtype is not None:
        dY = dY.astype(dtype)
    if dY.ndim == 2 and t == 1:
        dY = dY[:, :, None]
    if dY.ndim != 3 or dY.shape[2] != t:
        raise ValueError(f"gradients must be (N, d, t={t}); got {dY.shape}")
    lam = jnp.maximum(
        pca.eigenvalues.astype(dY.dtype), jnp.finfo(dY.dtype).tiny
    )
    W = pca.U.astype(dY.dtype) / (
        pca.ystd.astype(dY.dtype)[:, None] * jnp.sqrt(lam)[None, :]
    )  # (t, r)
    dZ = jnp.einsum("nat,tr->nar", dY, W)
    return dZ * scaling.ranges.astype(dY.dtype)[None, :, None]


def project_gradient_noise(
    dY_noise, pca: PCAState, scaling: DesignScaling, dtype=None
) -> jnp.ndarray:
    """PC-space gradient-noise VARIANCES from raw per-partial variances
    (N, d, t) (or (N, d) when t == 1): variances map through the squared
    weights of project_gradients; cross-PC covariances are dropped under
    the same independent-component approximation as project_noise."""
    t = pca.ymean.shape[0]
    dY_noise = jnp.asarray(dY_noise)
    if dtype is not None:
        dY_noise = dY_noise.astype(dtype)
    if dY_noise.ndim == 2 and t == 1:
        dY_noise = dY_noise[:, :, None]
    if dY_noise.ndim != 3 or dY_noise.shape[2] != t:
        raise ValueError(
            f"gradient noise must be (N, d, t={t}); got {dY_noise.shape}"
        )
    lam = jnp.maximum(
        pca.eigenvalues.astype(dY_noise.dtype),
        jnp.finfo(dY_noise.dtype).tiny,
    )
    W2 = (
        pca.U.astype(dY_noise.dtype)
        / (pca.ystd.astype(dY_noise.dtype)[:, None] * jnp.sqrt(lam)[None, :])
    ) ** 2  # (t, r)
    v = jnp.einsum("nat,tr->nar", dY_noise, W2)
    return v * (scaling.ranges.astype(dY_noise.dtype) ** 2)[None, :, None]


def _component_batch(X, Z, noise_pc=None, dZ=None, dZ_noise=None, H_pc=None):
    """(batched GPData, vmap in_axes spec) over the component axis: every
    optional field is either absent (axis None) or batched on axis 0.

    H_pc (N, r), when given, is a PER-COMPONENT extra GLS basis column
    (the multivariate multi-fidelity lower-level mean): component i trains
    with h_extra = H_pc[:, i:i+1]."""
    data = GPData(
        X=X,
        y=Z.T,
        noise=None if noise_pc is None else noise_pc.T,
        h_extra=None if H_pc is None else H_pc.T[:, :, None],
        dY=None if dZ is None else jnp.moveaxis(dZ, 2, 0),
        dY_noise=None if dZ_noise is None else jnp.moveaxis(dZ_noise, 2, 0),
    )
    axes = GPData(
        X=None,
        y=0,
        noise=None if noise_pc is None else 0,
        h_extra=None if H_pc is None else 0,
        dY=None if dZ is None else 0,
        dY_noise=None if dZ_noise is None else 0,
    )
    return data, axes


def _vmapped_fit(
    key, X, Z, config: GPConfig, restart_chunk: Optional[int] = None,
    noise_pc=None, dZ=None, dZ_noise=None, H_pc=None, **fit_kwargs,
) -> FitResult:
    r = Z.shape[1]
    keys = jax.random.split(key, r)
    data, axes = _component_batch(X, Z, noise_pc, dZ, dZ_noise, H_pc)
    return jax.vmap(
        lambda k, d: fit_gp(k, d, config, restart_chunk=restart_chunk,
                            **fit_kwargs),
        in_axes=(0, axes),
    )(keys, data)


@functools.partial(jax.jit, static_argnames=("config",))
def _vmapped_states_jit(
    params: GPParams, X, Z, config: GPConfig, noise_pc=None, dZ=None,
    dZ_noise=None, H_pc=None,
) -> GPPosteriorState:
    data, axes = _component_batch(X, Z, noise_pc, dZ, dZ_noise, H_pc)
    return jax.vmap(
        lambda p, d: precompute_predictor(p, d, config), in_axes=(0, axes)
    )(params, data)


def _vmapped_states(
    params: GPParams, X, Z, config: GPConfig, noise_pc=None, dZ=None,
    dZ_noise=None, H_pc=None,
) -> GPPosteriorState:
    """Per-component serving factorizations with a host-level jitter-rescue
    (memory-flat: the in-graph ladder inside precompute_predictor only runs
    at small N; here failed components are refactored with larger jitter,
    merged per component)."""
    import dataclasses as _dc

    states = _vmapped_states_jit(params, X, Z, config, noise_pc, dZ,
                                 dZ_noise, H_pc)
    if X.dtype == jnp.float64 or bool(jnp.all(states.ok)):
        return states
    for frac in (1e-4, 1e-2):
        cfg2 = _dc.replace(config, jitter=frac)
        states2 = _vmapped_states_jit(params, X, Z, cfg2, noise_pc, dZ,
                                      dZ_noise, H_pc)
        ok = states.ok  # (r,)
        states = jax.tree.map(
            lambda a, b: jnp.where(
                ok.reshape((-1,) + (1,) * (a.ndim - 1)), a, b
            ),
            states,
            states2,
        )
        if bool(jnp.all(states.ok)):
            break
    if not bool(jnp.all(states.ok)):
        logger.warning(
            "serving precompute: %d/%d components remain non-SPD after "
            "jitter rescue; their predictions fall back to the regression "
            "mean surface",
            int((~np.asarray(states.ok)).sum()), states.ok.shape[0],
        )
    return states


def fit_multivariate(
    key: jax.Array,
    X_raw: jax.Array,
    Y: jax.Array,
    config: GPConfig,
    pca_variance: float = 0.95,
    standardize: bool = True,
    param_ranges: Optional[Tuple[jax.Array, jax.Array]] = None,
    restart_chunk: Optional[int] = None,
    alpha_grid: Optional[Tuple[float, ...]] = None,
    alpha_refine: int = 0,
    noise=None,
    gradients=None,
    gradient_noise=None,
) -> MultivariateEmulator:
    """Train a multivariate emulator (the `estimate_thetas` multivariate path).

    X_raw is the unscaled design; Y is (N, t) observables. The per-component
    GP fits run as ONE vmapped batch over (component x restart) — the
    reference's serial loop over r pthreaded estimations collapses into a
    single device program.

    noise: optional per-point observation-noise variances — (N,) in
    original y units applied to every output, or (N, t) per-output; see
    project_noise for the PC-space mapping baked into every component's
    training covariance.

    gradients: optional observed output gradients (N, d, t) w.r.t. the RAW
    inputs ((N, d) when t == 1) — every component then trains as a joint
    value+gradient GP (gradient-enhanced emulation; needs a twice-
    differentiable kernel: power_exponential alpha=2 or matern52[_ard]).
    The PCA projection of gradients is exact (see project_gradients).
    gradient_noise: known per-partial gradient-noise variances, same shape.

    alpha_grid (power-exponential only) profiles the kernel exponent: the
    whole vmapped fit runs once per grid value and the emulator with the
    best TOTAL log likelihood (sum over components — one shared alpha, as
    a shared-kernel-family model implies) wins. See models.fit.fit_gp_alpha
    for why alpha is gridded rather than jointly optimized. alpha_refine > 0
    adds that many golden-section probes of the continuous profile around
    the grid winner (models.fit._golden_refine_alpha).
    """
    if alpha_grid:
        import dataclasses as _dc
        import math as _math

        from madaiemulator_tpu.models.fit import _golden_refine_alpha
        from madaiemulator_tpu.utils.config import CovarianceFamily

        if config.covariance is not CovarianceFamily.POWER_EXPONENTIAL:
            raise ValueError(
                "alpha_grid applies to the power-exponential family only"
            )
        emus: dict = {}

        def eval_alpha(a: float) -> float:
            cfg_a = _dc.replace(config, power_exp_alpha=float(a))
            emu_a = fit_multivariate(
                key, X_raw, Y, cfg_a, pca_variance=pca_variance,
                standardize=standardize, param_ranges=param_ranges,
                restart_chunk=restart_chunk, noise=noise,
                gradients=gradients, gradient_noise=gradient_noise,
            )
            lls = np.asarray(emu_a.restart_log_likelihoods)
            total = float(
                np.sum(np.max(np.where(np.isfinite(lls), lls, -np.inf), axis=1))
            )
            logger.info("alpha_grid: alpha=%g total best logL=%.6g", a, total)
            emus[round(float(a), 6)] = emu_a
            return total

        evals: dict = {}
        best_a, best_total = None, -_math.inf
        for a in alpha_grid:
            a = round(float(a), 6)
            evals[a] = eval_alpha(a)
            if best_a is None or (
                _math.isfinite(evals[a]) and evals[a] > best_total
            ):
                best_a, best_total = a, evals[a]
        if alpha_refine > 0 and _math.isfinite(best_total):
            best_a = _golden_refine_alpha(
                eval_alpha, evals, best_a, alpha_refine
            )
            logger.info("alpha_refine: winner alpha=%g", best_a)
        return emus[best_a]
    scaling = fit_scaling(X_raw, ranges=param_ranges)
    X = apply_scaling(jnp.asarray(X_raw), scaling)
    pca, Z = pca_decompose(Y, pca_variance, standardize=standardize)
    Z = Z.astype(X.dtype)
    noise_pc = (
        None if noise is None else project_noise(noise, pca, dtype=X.dtype)
    )
    dZ = (
        None if gradients is None
        else project_gradients(gradients, pca, scaling, dtype=X.dtype)
    )
    dZ_noise = (
        None if gradient_noise is None
        else project_gradient_noise(gradient_noise, pca, scaling,
                                    dtype=X.dtype)
    )
    if dZ_noise is not None and dZ is None:
        raise ValueError("gradient_noise given without gradients")
    logger.info(
        "fit_multivariate: N=%d d=%d t=%d -> r=%d components (pca_variance=%g)",
        X.shape[0], X.shape[1], Y.shape[1], Z.shape[1], pca_variance,
    )
    fit = _vmapped_fit(key, X, Z, config, restart_chunk=restart_chunk,
                       noise_pc=noise_pc, dZ=dZ, dZ_noise=dZ_noise)
    states = _vmapped_states(fit.params, X, Z, config, noise_pc=noise_pc,
                             dZ=dZ, dZ_noise=dZ_noise)
    import numpy as _np

    lls = _np.asarray(fit.restart_log_likelihoods)
    for i in range(Z.shape[1]):
        finite = _np.isfinite(lls[i])
        if not finite.any():
            # the jitted fit cannot warn from inside the graph; surface the
            # all-dead condition here (same honesty rule as fit_gp_host)
            logger.warning(
                "fit_multivariate: component %d/%d has NO feasible restart "
                "(every LML = -inf) — its thetas are an unoptimized "
                "fallback and its predictions will be garbage.",
                i, Z.shape[1],
            )
        elif logger.isEnabledFor(logging.INFO):
            logger.info(
                "  component %d: best logL %.6g (%d/%d restarts finite)",
                i, float(lls[i][finite].max()), int(finite.sum()),
                lls.shape[1],
            )
    return MultivariateEmulator(
        scaling=scaling,
        X=X,
        Z=Z,
        pca=pca,
        params=fit.params,
        states=states,
        config=config,
        restart_log_likelihoods=fit.restart_log_likelihoods,
        noise=noise_pc,
        dZ=dZ,
        dZ_noise=dZ_noise,
    )


@functools.partial(jax.jit, static_argnames=("config",))
def _predict_components(
    states: GPPosteriorState,
    params: GPParams,
    X: jax.Array,
    Z: jax.Array,
    Xs: jax.Array,
    config: GPConfig,
    dZ=None,
):
    # noise only enters the stored factorization, but dZ changes the
    # cross-covariance ROWS (joint value+gradient serving) so it must ride
    # along with the data
    data, axes = _component_batch(X, Z, dZ=dZ)
    return jax.vmap(
        lambda st, p, d: predict_from_precomputed(st, p, d, Xs, config),
        in_axes=(0, 0, axes),
    )(states, params, data)  # means, vars: (r, m)


def reconstruct_observables(
    m_pc: jax.Array, v_pc: jax.Array, pca: PCAState
) -> Tuple[jax.Array, jax.Array]:
    """Rotate per-PC (mean, variance), each (r, m), back to observable
    space (m, t) [B]:
        mean_j = ybar_j + s_j * sum_i sqrt(lam_i) U_ji m_i
        var_j  = s_j^2  * sum_i lam_i  U_ji^2 v_i
    """
    lam = pca.eigenvalues.astype(m_pc.dtype)
    U = pca.U.astype(m_pc.dtype)  # (t, r)
    ymean = pca.ymean.astype(m_pc.dtype)
    ystd = pca.ystd.astype(m_pc.dtype)
    sqrt_lam = jnp.sqrt(lam)
    hi = jax.lax.Precision.HIGHEST
    # rotation pinned: user-facing observable means/variances should not
    # pick up bf16 rounding when this runs on the TPU (see gp._factor note)
    mean = ymean[None, :] + jnp.matmul(
        m_pc.T * sqrt_lam[None, :], U.T, precision=hi
    ) * ystd[None, :]
    var = jnp.matmul(
        v_pc.T * lam[None, :], U.T ** 2, precision=hi
    ) * (ystd[None, :] ** 2)
    return mean, var


def predict_multivariate(
    emu: MultivariateEmulator, Xs_raw: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Posterior mean and variance in observable space: (m, t), (m, t).

    Equivalent of the reference's emulate_point_multi / EmuPlusPlus
    QueryEmulator, batched over query points.
    """
    Xs = apply_scaling(jnp.asarray(Xs_raw, dtype=emu.X.dtype), emu.scaling)
    m_pc, v_pc = _predict_components(
        emu.states, emu.params, emu.X, emu.Z, Xs, emu.config, dZ=emu.dZ
    )  # (r, m) each
    return reconstruct_observables(m_pc, v_pc, emu.pca)


@functools.partial(jax.jit, static_argnames=("config",))
def _predict_gradient_components(states, params, X, Z, Xs, config, dZ=None):
    from madaiemulator_tpu.models.gp import predict_gradient

    data, axes = _component_batch(X, Z, dZ=dZ)
    return jax.vmap(
        lambda st, p, d: predict_gradient(st, p, d, Xs, config),
        in_axes=(0, 0, axes),
    )(states, params, data)  # means, vars: (r, m, d)


def predict_multivariate_gradient(
    emu: MultivariateEmulator, Xs_raw: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Posterior mean and marginal variance of the observable gradients
    d f_u / d x_a w.r.t. the RAW inputs: ((m, d, t), (m, d, t)).

    Chains the per-PC gradient posteriors (models/gp.predict_gradient)
    back through the two linear maps of project_gradients — the PCA
    reconstruction (means via sqrt(lambda) U, variances via lambda U^2,
    the usual independent-component approximation) and the design scaling
    (divide by ranges; variances by ranges^2). Needs a twice-
    differentiable kernel; works for values-only and gradient-enhanced
    emulators alike. Beyond-reference: the reference serves values only
    [SURVEY §3.2].
    """
    Xs = apply_scaling(jnp.asarray(Xs_raw, dtype=emu.X.dtype), emu.scaling)
    gm_pc, gv_pc = _predict_gradient_components(
        emu.states, emu.params, emu.X, emu.Z, Xs, emu.config, dZ=emu.dZ
    )  # (r, m, d) each
    pca = emu.pca
    lam = pca.eigenvalues.astype(gm_pc.dtype)
    U = pca.U.astype(gm_pc.dtype)  # (t, r)
    ystd = pca.ystd.astype(gm_pc.dtype)
    Wm = U * jnp.sqrt(lam)[None, :] * ystd[:, None]  # (t, r) mean weights
    mean = jnp.einsum("rma,tr->mat", gm_pc, Wm)
    var = jnp.einsum("rma,tr->mat", gv_pc, (U ** 2) * lam[None, :]
                     * (ystd ** 2)[:, None])
    inv_rng = 1.0 / emu.scaling.ranges.astype(gm_pc.dtype)  # d/dx = d/dXs / rng
    return (
        mean * inv_rng[None, :, None],
        var * (inv_rng ** 2)[None, :, None],
    )


def precompute_fast_multivariate(emu: MultivariateEmulator):
    """Batched (r, ...) FastPredictorState: explicit per-component
    triangular inverses so multivariate serving is GEMM-only
    (models/gp.predict_fast). One-time O(r N^3/3) on top of the STORED
    factorizations — no refactorization."""
    from madaiemulator_tpu.models.gp import fast_predictor_from_state

    if emu.dZ is not None:
        raise ValueError(
            "fast (GEMM-only) serving does not support gradient-enhanced "
            "emulators; use predict_multivariate (the joint cross build "
            "dominates, not the solves)"
        )
    return jax.vmap(fast_predictor_from_state)(emu.states)


@functools.partial(jax.jit, static_argnames=("config",))
def _predict_components_fast(fast_states, params, X, Z, Xs, config):
    from madaiemulator_tpu.models.gp import predict_fast

    def one(fp, p, z):
        return predict_fast(fp, p, GPData(X=X, y=z), Xs, config)

    return jax.vmap(one)(fast_states, params, Z.T)  # (r, m) each


def predict_multivariate_fast(
    emu: MultivariateEmulator, fast_states, Xs_raw: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """GEMM-only multivariate serving (see precompute_fast_multivariate)."""
    Xs = apply_scaling(jnp.asarray(Xs_raw, dtype=emu.X.dtype), emu.scaling)
    m_pc, v_pc = _predict_components_fast(
        fast_states, emu.params, emu.X, emu.Z, Xs, emu.config
    )
    return reconstruct_observables(m_pc, v_pc, emu.pca)


class IterativeMultivariateEmulator(NamedTuple):
    """A trained multivariate emulator with NO dense serving cache: both
    fitting and serving run matrix-free (models/iterative.py), so N is
    bounded by O(N * (rank + probes)) instead of r * N^2. The PCA pipeline,
    theta layout and reconstruction math are identical to
    `MultivariateEmulator` — only the per-component GP engine differs."""

    scaling: DesignScaling
    X: jax.Array  # (N, d) scaled design
    Z: jax.Array  # (N, r) PC scores
    pca: PCAState
    params: GPParams  # batched (r, ...) per-component hyperparameters
    config: GPConfig
    restart_log_likelihoods: Optional[jax.Array] = None  # (r, R)
    noise: Optional[jax.Array] = None  # (N, r) PC-space noise variances

    @property
    def n_components(self) -> int:
        return self.Z.shape[1]

    @property
    def n_outputs(self) -> int:
        return self.pca.ymean.shape[0]

    def component_data(self, i: int) -> GPData:
        """GPData of component i, incl. its PC-space noise column."""
        nz = None if self.noise is None else self.noise[:, i]
        return GPData(X=self.X, y=self.Z[:, i], noise=nz)


def fit_multivariate_iterative(
    key: jax.Array,
    X_raw: jax.Array,
    Y: jax.Array,
    config: GPConfig,
    pca_variance: float = 0.95,
    standardize: bool = True,
    param_ranges: Optional[Tuple[jax.Array, jax.Array]] = None,
    noise=None,
    **iter_kwargs,
) -> IterativeMultivariateEmulator:
    """Matrix-free multivariate training (the estimate_thetas path past
    dense-HBM N). Components fit sequentially on host — at the N where this
    path matters, ONE component's solves already fill the chip, so the
    dense path's vmap-over-components holds no advantage. iter_kwargs
    forward to models.iterative.fit_gp_iterative (rank, probes,
    lanczos_iters, cg_tol, cg_max_iters, seed, vg_batch). `noise` is per-
    point observation-noise variance, (N,) or (N, t) — see project_noise."""
    from madaiemulator_tpu.models.iterative import fit_gp_iterative

    scaling = fit_scaling(X_raw, ranges=param_ranges)
    X = apply_scaling(jnp.asarray(X_raw), scaling)
    pca, Z = pca_decompose(Y, pca_variance, standardize=standardize)
    Z = Z.astype(X.dtype)
    noise_pc = (
        None if noise is None else project_noise(noise, pca, dtype=X.dtype)
    )
    r = Z.shape[1]
    keys = jax.random.split(key, r)
    logger.info(
        "fit_multivariate_iterative: N=%d d=%d t=%d -> r=%d components",
        X.shape[0], X.shape[1], Y.shape[1], r,
    )
    ckpt = iter_kwargs.pop("checkpoint_path", None)

    def kw(i):
        # one checkpoint file per component: sequential fits must not
        # clobber (or wrongly resume from) each other's optimizer state
        if ckpt is None:
            return iter_kwargs
        return {**iter_kwargs, "checkpoint_path": f"{ckpt}.c{i}"}

    fits = [
        fit_gp_iterative(
            keys[i],
            GPData(
                X=X, y=Z[:, i],
                noise=None if noise_pc is None else noise_pc[:, i],
            ),
            config, **kw(i),
        )
        for i in range(r)
    ]
    for i, f in enumerate(fits):
        if not bool(jnp.isfinite(f.log_likelihood)):
            logger.warning(
                "fit_multivariate_iterative: component %d/%d has NO feasible "
                "restart (best LML = -inf) — its thetas are an unoptimized "
                "fallback and its predictions will be garbage. See the "
                "fit_gp_host warning above for remedies.", i, r,
            )
    params = jax.tree.map(lambda *a: jnp.stack(a), *[f.params for f in fits])
    lls = jnp.stack([f.restart_log_likelihoods for f in fits])
    return IterativeMultivariateEmulator(
        scaling=scaling, X=X, Z=Z, pca=pca, params=params, config=config,
        restart_log_likelihoods=lls, noise=noise_pc,
    )


def precompute_iterative_multivariate(
    emu: IterativeMultivariateEmulator,
    rank: int = 64,
    cg_tol: float = 1e-6,
    cg_max_iters: int = 256,
    jitter: Optional[float] = None,
    row_chunk: int = 2048,
):
    """Per-component IterativePosteriorState list: the matrix-free serving
    cache (preconditioner + training solves), built once per loaded
    snapshot so query batches cost one variance solve each (the iterative
    twin of precompute_fast_multivariate; VERDICT r2 weak #1). row_chunk
    bounds the training-solve kernel tiles (<= 1024 at N >= 131k, the
    documented worker envelope)."""
    from madaiemulator_tpu.models.iterative import (
        precompute_iterative_predictor,
    )

    return [
        precompute_iterative_predictor(
            jax.tree.map(lambda a: a[i], emu.params),
            emu.component_data(i),
            emu.config,
            rank=rank, cg_tol=cg_tol, cg_max_iters=cg_max_iters,
            jitter=jitter, row_chunk=row_chunk,
        )
        for i in range(emu.n_components)
    ]


def predict_multivariate_iterative(
    emu: IterativeMultivariateEmulator,
    Xs_raw: jax.Array,
    states=None,
    **iter_kwargs,
) -> Tuple[jax.Array, jax.Array]:
    """Matrix-free multivariate serving (per-component PCG solves); same
    observable-space reconstruction as the dense path. Pass `states` from
    precompute_iterative_multivariate to serve repeated batches without
    re-running the training solves; without it, each call precomputes from
    scratch (one-shot use). iter_kwargs forward to
    models.iterative.predict_iterative (rank, cg_tol, cg_max_iters,
    query_chunk, jitter)."""
    from madaiemulator_tpu.models.iterative import (
        predict_iterative,
        predict_iterative_from_state,
    )

    Xs = apply_scaling(jnp.asarray(Xs_raw, dtype=emu.X.dtype), emu.scaling)
    r = emu.n_components
    ms, vs = [], []
    for i in range(r):
        d = emu.component_data(i)
        if states is not None:
            # forward the serving knobs the from-state path understands —
            # in particular variance_method: silently dropping it once made
            # a pool screen run a 1024-wide-RHS PCG (the TPU-worker crash
            # family) when the caller had asked for the PCG-free path
            state_kw = {
                k: v for k, v in iter_kwargs.items()
                if k in ("query_chunk", "with_variance", "variance_method",
                         "row_chunk", "variance_rhs")
            }
            m_i, v_i = predict_iterative_from_state(
                states[i], d, Xs, **state_kw
            )
        else:
            p = jax.tree.map(lambda a: a[i], emu.params)
            m_i, v_i = predict_iterative(p, d, Xs, emu.config, **iter_kwargs)
        ms.append(m_i)
        vs.append(v_i)
    return reconstruct_observables(
        jnp.stack(ms), jnp.stack(vs), emu.pca
    )
