"""Covariance kernels and Gram/cross-matrix builders.

TPU-native replacement for the reference's kernel evaluators and covariance
builders (ref: src/libEmu/emulator.c — covariance_fn_gaussian,
covariance_fn_matern_three, covariance_fn_matern_five, makeCovMatrix,
makeKVector; mount empty this round, see SURVEY.md §0).

Design notes (TPU-first):
  * The reference builds C(theta) with an O(N^2 d) scalar double loop. Here
    the pairwise scaled squared distance is computed with the matmul trick
    ||u||^2 + ||v||^2 - 2 u v^T on pre-scaled points, so the O(N^2 d) work is
    a single MXU matmul; the kernel transform (exp / Matérn polynomial) is an
    elementwise epilogue XLA fuses into the matmul consumer.
  * Everything is a pure function of (X, params) so it vmaps over restart /
    PCA-component / ensemble batch axes and differentiates exactly (the
    reference uses finite differences).
  * Parameters travel in log-space (`GPParams`) for unconstrained smooth
    optimization; `thetas_to_params` / `params_to_thetas` convert to the
    reference's natural theta vector [amp, nugget, ell...] for snapshots.

Precision: accumulation dtype follows the input dtype (f64 under
jax_enable_x64 for parity runs, f32 on TPU perf runs).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from madaiemulator_tpu.utils.config import CovarianceFamily, GPConfig


class GPParams(NamedTuple):
    """Trainable kernel hyperparameters, in log space.

    log_ls has shape (d,) for POWER_EXPONENTIAL (ARD) and (1,) for Matérn
    (isotropic), matching the reference's theta counts.
    """

    log_amp: jax.Array  # scalar
    log_nugget: jax.Array  # scalar
    log_ls: jax.Array  # (num_length_scales,)


def params_to_thetas(params: GPParams) -> jax.Array:
    """Natural-space theta vector [amp, nugget, ell_1..ell_k] (reference layout)."""
    return jnp.concatenate(
        [
            jnp.exp(params.log_amp)[None],
            jnp.exp(params.log_nugget)[None],
            jnp.exp(params.log_ls),
        ]
    )


def thetas_to_params(thetas: jax.Array) -> GPParams:
    log_t = jnp.log(thetas)
    return GPParams(log_amp=log_t[0], log_nugget=log_t[1], log_ls=log_t[2:])


def _scaled(X: jax.Array, params: GPParams, config: GPConfig) -> jax.Array:
    """Divide each input dimension by its length scale (broadcast isotropic)."""
    ls = jnp.exp(params.log_ls)
    if config.num_length_scales == 1:
        return X / ls[0]
    return X / ls[None, :]


def _sqdist(U: jax.Array, V: jax.Array) -> jax.Array:
    """Pairwise squared distances via one MXU matmul; clipped at 0.

    Two precision safeguards (without them the TPU's DEFAULT matmul
    precision computes the cross term with bf16 inputs, the error makes the
    Gram matrix indefinite, and Cholesky NaNs — observed on v5e):
      * translation-invariance: center both point sets by the same offset so
        ||u||^2 terms stay small and the uu+vv-2uv cancellation is mild;
      * Precision.HIGHEST on the cross-term matmul (full f32 on the MXU).
    """
    c = jnp.mean(U, axis=0, keepdims=True)
    U = U - c
    V = V - c
    acc = U.dtype  # f32 accumulation on TPU, f64 under x64
    uu = jnp.sum(U * U, axis=-1)
    vv = jnp.sum(V * V, axis=-1)
    uv = jnp.dot(
        U, V.T, preferred_element_type=acc, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.maximum(uu[:, None] + vv[None, :] - 2.0 * uv, 0.0)


def _abs_power_dist(U: jax.Array, V: jax.Array, alpha: float) -> jax.Array:
    """sum_d |u_d - v_d|^alpha for alpha != 2 (no matmul form; VPU-bound)."""
    diff = jnp.abs(U[:, None, :] - V[None, :, :])
    return jnp.sum(diff**alpha, axis=-1)


def _apply_family(
    dist2_or_power: jax.Array, amp: jax.Array, config: GPConfig
) -> jax.Array:
    fam = config.covariance
    if fam is CovarianceFamily.POWER_EXPONENTIAL:
        # input is sum_d |dx/ell|^alpha (== scaled sqdist when alpha == 2)
        return amp * jnp.exp(-0.5 * dist2_or_power)
    # Matérn families take the scaled *squared* distance; derive r carefully
    # (sqrt has infinite grad at 0 — add a tiny floor inside, exact at r=0 in value).
    r = jnp.sqrt(dist2_or_power + jnp.asarray(1e-36, dist2_or_power.dtype))
    if fam is CovarianceFamily.MATERN32:
        s = jnp.sqrt(jnp.asarray(3.0, r.dtype)) * r
        return amp * (1.0 + s) * jnp.exp(-s)
    if fam is CovarianceFamily.MATERN52:
        s = jnp.sqrt(jnp.asarray(5.0, r.dtype)) * r
        return amp * (1.0 + s + s * s / 3.0) * jnp.exp(-s)
    raise ValueError(f"unknown covariance family {fam}")


def cross_covariance(
    X1: jax.Array, X2: jax.Array, params: GPParams, config: GPConfig
) -> jax.Array:
    """k(X1, X2): (n1, n2) cross-covariance, NO nugget (distinct points).

    Replaces the reference's makeKVector loop (one k-vector per query point)
    with a single batched build for all query points at once.
    """
    U = _scaled(X1, params, config)
    V = _scaled(X2, params, config)
    amp = jnp.exp(params.log_amp)
    if (
        config.covariance is CovarianceFamily.POWER_EXPONENTIAL
        and config.power_exp_alpha != 2.0
    ):
        d = _abs_power_dist(U, V, config.power_exp_alpha)
    else:
        d = _sqdist(U, V)
    return _apply_family(d, amp, config)


def gram_matrix(X: jax.Array, params: GPParams, config: GPConfig) -> jax.Array:
    """C(theta) = k(X, X) + (nugget + jitter) * I, symmetrized.

    Replaces makeCovMatrix. The nugget enters on the diagonal only, matching
    the reference's same-point branch of covariance_fn_* [U-hi].
    """
    K = cross_covariance(X, X, params, config)
    K = 0.5 * (K + K.T)  # kill matmul-order asymmetry before Cholesky
    n = X.shape[0]
    if config.jitter is None:
        # auto: none for f64 parity runs; eps-scale relative floor otherwise
        jitter_frac = 0.0 if K.dtype == jnp.float64 else 1e-6
    else:
        jitter_frac = config.jitter
    amp = jnp.exp(params.log_amp)
    diag_add = jnp.exp(params.log_nugget) + jitter_frac * amp
    return K + diag_add * jnp.eye(n, dtype=K.dtype)


def kdiag(Xs: jax.Array, params: GPParams, config: GPConfig) -> jax.Array:
    """k(x*, x*) for each query point: amplitude (+ nugget if configured).

    All supported kernels are stationary, so k(x,x) = amp; the reference's
    covariance_fn adds the nugget at coincident points, which the predictive
    variance inherits (config.predict_variance_includes_nugget).
    """
    amp = jnp.exp(params.log_amp)
    val = amp + (
        jnp.exp(params.log_nugget)
        if config.predict_variance_includes_nugget
        else 0.0
    )
    return jnp.full((Xs.shape[0],), 1.0, dtype=Xs.dtype) * val
