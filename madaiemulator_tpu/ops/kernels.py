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

import functools
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


# Cap on the (chunk, n2, d) difference-tensor footprint of the alpha != 2
# power distance: 2^25 f32 elements = 128 MB. Above it the rows of U are
# processed in sequential lax.map chunks, so the path scales to N=16k
# (where the unchunked tensor would be ~8 TB) instead of OOMing.
_POWER_DIST_MAX_ELEMS = 1 << 25


def _abs_power_dist(U: jax.Array, V: jax.Array, alpha: float) -> jax.Array:
    """sum_d |u_d - v_d|^alpha for alpha != 2 (no matmul form; VPU-bound).

    Memory-bounded: the (n1, n2, d) difference tensor is materialized at
    most _POWER_DIST_MAX_ELEMS elements at a time (lax.map over row chunks
    of U), keeping the exotic-alpha path usable at large N. Differentiates
    through lax.map, so fits with alpha != 2 stay exact-gradient.
    """
    n1, d = U.shape
    n2 = V.shape[0]

    # jax.checkpoint: without it, differentiating through the lax.map
    # stacks every chunk's (chunk, n2, d) diff tensor as a residual —
    # rebuilding exactly the full tensor this chunking exists to avoid
    # (same trap as models/iterative.gram_matvec).
    @jax.checkpoint
    def block(ug):
        diff = jnp.abs(ug[:, None, :] - V[None, :, :])
        return jnp.sum(diff**alpha, axis=-1)

    if n1 * n2 * d <= _POWER_DIST_MAX_ELEMS:
        return block(U)
    chunk = max(1, _POWER_DIST_MAX_ELEMS // (n2 * d))
    pad = (-n1) % chunk
    Up = jnp.pad(U, ((0, pad), (0, 0)), mode="edge") if pad else U
    out = jax.lax.map(block, Up.reshape(-1, chunk, d))
    return out.reshape(-1, n2)[:n1]


def _apply_family(
    dist2_or_power: jax.Array, amp: jax.Array, config: GPConfig
) -> jax.Array:
    fam = config.covariance
    if fam is CovarianceFamily.POWER_EXPONENTIAL:
        # input is sum_d |dx/ell|^alpha (== scaled sqdist when alpha == 2)
        return amp * jnp.exp(-0.5 * dist2_or_power)
    # Matérn families take the scaled *squared* distance; derive r carefully
    # (sqrt has infinite grad at 0 — add a tiny floor inside, exact at r=0 in
    # value). The ARD variants differ only in how the distance was scaled
    # (per-dimension, via _scaled) — the polynomial is identical.
    r = jnp.sqrt(dist2_or_power + jnp.asarray(1e-36, dist2_or_power.dtype))
    if fam in (CovarianceFamily.MATERN32, CovarianceFamily.MATERN32_ARD):
        s = jnp.sqrt(jnp.asarray(3.0, r.dtype)) * r
        return amp * (1.0 + s) * jnp.exp(-s)
    if fam in (CovarianceFamily.MATERN52, CovarianceFamily.MATERN52_ARD):
        s = jnp.sqrt(jnp.asarray(5.0, r.dtype)) * r
        return amp * (1.0 + s + s * s / 3.0) * jnp.exp(-s)
    raise ValueError(f"unknown covariance family {fam}")


def _cross_xla(
    U: jax.Array, V: jax.Array, amp: jax.Array, config: GPConfig
) -> jax.Array:
    """XLA-path cross covariance from pre-scaled points (no nugget)."""
    if (
        config.covariance is CovarianceFamily.POWER_EXPONENTIAL
        and config.power_exp_alpha != 2.0
    ):
        d = _abs_power_dist(U, V, config.power_exp_alpha)
    else:
        d = _sqdist(U, V)
    return _apply_family(d, amp, config)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _pallas_cross_vjp(U, V, amp, config: GPConfig):
    """Fused-Pallas cross covariance with exact XLA-math gradients.

    Forward: one fused kernel per output tile (ops/pallas/pairwise.py) —
    the pairwise distance, kernel transform and amplitude never round-trip
    HBM. Backward: jax.vjp of the identical XLA-level math `_cross_xla`
    (same function to f32 rounding), so fits that route the hot Gram build
    through Pallas keep exact autodiff gradients [BASELINE north_star:
    covariance as a Pallas pairwise-kernel op in the product path].
    """
    from madaiemulator_tpu.ops.pallas.pairwise import pairwise_covariance

    return pairwise_covariance(
        U,
        V,
        amp,
        jnp.zeros((), U.dtype),
        family=_pallas_family(config),
        add_diag=False,
        interpret=config.pallas_interpret,
    )


def _pallas_cross_fwd(U, V, amp, config):
    return _pallas_cross_vjp(U, V, amp, config), (U, V, amp)


def _pallas_cross_bwd(config, res, Kbar):
    U, V, amp = res
    _, vjp = jax.vjp(lambda u, v, a: _cross_xla(u, v, a, config), U, V, amp)
    return vjp(Kbar)


_pallas_cross_vjp.defvjp(_pallas_cross_fwd, _pallas_cross_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _pallas_gram_vjp(U, amp, diag_add, config: GPConfig):
    """Fused-Pallas Gram build: k(U, U) + diag_add * I in ONE kernel.

    The nugget lands on the diagonal inside the tile epilogue, so the Gram
    matrix hits HBM exactly once. Backward differentiates the identical
    XLA-level math (see _pallas_cross_vjp docstring for the design).
    """
    from madaiemulator_tpu.ops.pallas.pairwise import pairwise_covariance

    return pairwise_covariance(
        U,
        U,
        amp,
        diag_add,
        family=_pallas_family(config),
        add_diag=True,
        interpret=config.pallas_interpret,
    )


def _pallas_gram_fwd(U, amp, diag_add, config):
    return _pallas_gram_vjp(U, amp, diag_add, config), (U, amp, diag_add)


def _pallas_gram_bwd(config, res, Kbar):
    U, amp, diag_add = res

    def gram_xla(u, a, d):
        K = _cross_xla(u, u, a, config)
        K = 0.5 * (K + K.T)
        return K + d * jnp.eye(u.shape[0], dtype=u.dtype)

    _, vjp = jax.vjp(gram_xla, U, amp, diag_add)
    return vjp(Kbar)


_pallas_gram_vjp.defvjp(_pallas_gram_fwd, _pallas_gram_bwd)


def _pallas_family(config: GPConfig) -> str:
    """Pallas tile-epilogue name: ARD Matérn shares the isotropic epilogue
    (the per-dimension scaling happened on the inputs)."""
    return {
        CovarianceFamily.MATERN32_ARD: "matern32",
        CovarianceFamily.MATERN52_ARD: "matern52",
    }.get(config.covariance, config.covariance.value)


def _pallas_eligible(config: GPConfig, dtype) -> bool:
    """The fused Pallas builder covers f32 alpha=2 / Matérn operands."""
    if config.gram_method != "pallas" or dtype == jnp.float64:
        return False
    if (
        config.covariance is CovarianceFamily.POWER_EXPONENTIAL
        and config.power_exp_alpha != 2.0
    ):
        return False
    return True


def cross_covariance(
    X1: jax.Array, X2: jax.Array, params: GPParams, config: GPConfig
) -> jax.Array:
    """k(X1, X2): (n1, n2) cross-covariance, NO nugget (distinct points).

    Replaces the reference's makeKVector loop (one k-vector per query point)
    with a single batched build for all query points at once. With
    config.gram_method="pallas" (and an eligible operand) the build runs as
    one fused Pallas kernel; gradients stay exact via _pallas_cross_vjp.
    """
    U = _scaled(X1, params, config)
    V = _scaled(X2, params, config)
    amp = jnp.exp(params.log_amp)
    if _pallas_eligible(config, X1.dtype):
        return _pallas_cross_vjp(U, V, amp, config)
    return _cross_xla(U, V, amp, config)


def effective_jitter_frac(n: int, dtype, config: GPConfig) -> float:
    """Stability-floor fraction added to the Gram diagonal (times amp).

    Auto policy (config.jitter is None): none for f64 parity runs. At f32
    the floor must beat the Gram BUILD's own rounding noise, whose spectral
    norm grows like sqrt(N)*eps*amp — with only a flat 1e-6, matrices that
    are borderline-SPD (smooth-kernel thetas, the common optimum for smooth
    simulators) come out truly indefinite and the fit sees -inf walls
    exactly at the good basins. Measured on TPU v5e (round 2): N=30 smooth
    operand needs >= 5e-6; with this floor the end-to-end multivariate fit
    error dropped from ~20% to ~0.3%.
    """
    if config.jitter is not None:
        return config.jitter
    if dtype == jnp.float64:
        return 0.0
    eps = float(jnp.finfo(jnp.float32).eps)
    return max(1e-6, 12.0 * (n ** 0.5) * eps)


def gram_matrix(X: jax.Array, params: GPParams, config: GPConfig) -> jax.Array:
    """C(theta) = k(X, X) + (nugget + jitter) * I, symmetrized.

    Replaces makeCovMatrix. The nugget enters on the diagonal only, matching
    the reference's same-point branch of covariance_fn_* [U-hi].

    On the Pallas path no explicit symmetrization is needed: tile (i, j)
    and tile (j, i) contract the same vectors in the same reduction order,
    so K is bitwise symmetric by construction; the XLA matmul-trick path
    keeps its 0.5 * (K + K^T) guard.
    """
    n = X.shape[0]
    jitter_frac = effective_jitter_frac(n, X.dtype, config)
    amp = jnp.exp(params.log_amp)
    diag_add = jnp.exp(params.log_nugget) + jitter_frac * amp
    if _pallas_eligible(config, X.dtype):
        U = _scaled(X, params, config)
        return _pallas_gram_vjp(U, amp, diag_add, config)
    K = cross_covariance(X, X, params, config)
    K = 0.5 * (K + K.T)  # kill matmul-order asymmetry before Cholesky
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


# --- Derivative-observation (gradient-enhanced) covariance blocks ----------
#
# Gradient-enhanced GP emulation ("GEK"): the joint Gaussian prior over
# (f(X), grad f(X)) for radial kernels of the form k = amp * g(s) with
# s = sum_d ((x_d - x'_d) / ell_d)^2 the scaled squared distance. The blocks
# follow from differentiating k through s (delta = x - x'):
#
#   Cov(f(x),         df/dx'_b(x'))  = -2 amp g'(s) delta_b / ell_b^2
#   Cov(df/dx_a(x),   df/dx'_b(x'))  = -4 amp g''(s) delta_a delta_b
#                                        / (ell_a^2 ell_b^2)
#                                      - 2 amp g'(s) 1[a==b] / ell_b^2
#
# This requires g twice differentiable in s at 0: POWER_EXPONENTIAL with
# alpha == 2 (g = exp(-s/2)) and Matérn-5/2 (g'' (0) finite) qualify;
# Matérn-3/2 does NOT (g''(s) ~ 1/sqrt(s): its sample paths are only
# once-differentiable, so gradient observations have no finite prior
# variance). The reference has no gradient-observation support at all
# [SURVEY §2 — beyond-reference widening]; the natural producers are
# adjoint-capable simulators that return (y, grad y) per run.
#
# TPU-native layout: everything is built from the ONE MXU scaled-sqdist
# matmul (S), elementwise radial profiles g/g'/g'' fused by XLA, and
# broadcastered (n1, n2, d[, d]) difference slabs — no scalar loops; the
# joint matrix vmaps over restart/component axes and differentiates exactly
# (the closed-form LML VJP in models/gp.py contracts its cotangent against
# this builder via one jax.vjp).

_GRAD_OK_FAMILIES = (
    CovarianceFamily.POWER_EXPONENTIAL,
    CovarianceFamily.MATERN52,
    CovarianceFamily.MATERN52_ARD,
)


def _require_grad_family(config: GPConfig) -> None:
    fam = config.covariance
    if fam not in _GRAD_OK_FAMILIES or (
        fam is CovarianceFamily.POWER_EXPONENTIAL
        and config.power_exp_alpha != 2.0
    ):
        raise ValueError(
            "gradient observations need a radial profile twice "
            "differentiable at zero distance: power_exponential with "
            "alpha=2 or matern52/matern52_ard; got "
            f"{fam.value}"
            + (
                f" (alpha={config.power_exp_alpha})"
                if fam is CovarianceFamily.POWER_EXPONENTIAL
                else ""
            )
        )


def _g012(S: jax.Array, config: GPConfig):
    """(g, g', g'') of the radial profile at scaled sqdist S (amp excluded).

    Only defined for the grad-capable families; every call path must be
    guarded by _require_grad_family first (joint_cross does this
    unconditionally before reaching here) — other families would silently
    get the Matérn-5/2 profile below.
    """
    fam = config.covariance
    if fam not in _GRAD_OK_FAMILIES:
        raise ValueError(
            f"_g012: family {fam.value} has no twice-differentiable radial "
            "profile (caller must run _require_grad_family first)"
        )
    if fam is CovarianceFamily.POWER_EXPONENTIAL:
        g = jnp.exp(-0.5 * S)
        return g, -0.5 * g, 0.25 * g
    # Matérn-5/2 (isotropic or ARD — scaling already happened in S):
    # g(s) = (1 + sqrt(5) r + 5 s / 3) e^{-sqrt(5) r}, r = sqrt(s)
    # g'(s) = -(5/6) (1 + sqrt(5) r) e^{-sqrt(5) r}
    # g''(s) = (25/12) e^{-sqrt(5) r}        — all smooth at s = 0
    r = jnp.sqrt(S + jnp.asarray(1e-36, S.dtype))
    sq5 = jnp.sqrt(jnp.asarray(5.0, S.dtype))
    e = jnp.exp(-sq5 * r)
    g = (1.0 + sq5 * r + (5.0 / 3.0) * S) * e
    g1 = -(5.0 / 6.0) * (1.0 + sq5 * r) * e
    g2 = (25.0 / 12.0) * e
    return g, g1, g2


def grad_prior_scale(config: GPConfig) -> float:
    """c_g = -2 g'(0): prior Var(df/dx_a) = amp * c_g / ell_a^2."""
    _require_grad_family(config)
    if config.covariance is CovarianceFamily.POWER_EXPONENTIAL:
        return 1.0
    return 5.0 / 3.0  # Matérn-5/2


def _ell_vec(params: GPParams, config: GPConfig, d: int) -> jax.Array:
    ls = jnp.exp(params.log_ls)
    if config.num_length_scales == 1:
        return jnp.broadcast_to(ls[0], (d,))
    return ls


def joint_cross(
    X1: jax.Array,
    X2: jax.Array,
    params: GPParams,
    config: GPConfig,
    *,
    grad_rows: bool = False,
    grad_cols: bool = False,
    value_cols: bool = True,
) -> jax.Array:
    """Cross covariance between (value | gradient) observation sets.

    Rows index X1 (n1 value rows, then n1*d gradient rows in row-major
    (point, dim) order when grad_rows); columns index X2 likewise
    (n2 value columns when value_cols, then n2*d gradient columns when
    grad_cols — value_cols=False skips the value blocks, so gradient-only
    serving never materializes columns it would immediately discard). NO
    nugget/jitter (distinct points); `gram_joint` adds the diagonal.
    """
    if not (grad_rows or grad_cols):
        # value-only request: the plain cross kernel is correct for EVERY
        # family (the _g012 profiles below only cover the grad-capable
        # ones — ADVICE r3: don't let e.g. Matérn-3/2 silently fall
        # through to the Matérn-5/2 branch)
        if not value_cols:
            raise ValueError("joint_cross: nothing requested")
        return cross_covariance(X1, X2, params, config)
    if not (value_cols or grad_cols):
        raise ValueError("joint_cross: no columns requested")
    _require_grad_family(config)
    n1, d = X1.shape
    n2 = X2.shape[0]
    amp = jnp.exp(params.log_amp)
    U = _scaled(X1, params, config)
    V = _scaled(X2, params, config)
    S = _sqdist(U, V)
    g, g1, g2 = _g012(S, config)
    blocks_vv = amp * g
    ell = _ell_vec(params, config, d)
    inv2 = 1.0 / (ell * ell)  # (d,)
    # Dw[i, j, a] = (x1_i - x2_j)_a / ell_a^2
    Dw = (X1[:, None, :] - X2[None, :, :]) * inv2[None, None, :]
    top_blocks = [blocks_vv] if value_cols else []
    if grad_cols:
        # Cov(f(x1_i), df/dx_b(x2_j)) = -2 amp g' Dw  -> (n1, n2*d)
        vg = (-2.0 * amp) * g1[:, :, None] * Dw
        top_blocks.append(vg.reshape(n1, n2 * d))
    top = top_blocks[0] if len(top_blocks) == 1 else jnp.concatenate(
        top_blocks, axis=1
    )
    if not grad_rows:
        return top
    bottom_blocks = []
    if value_cols:
        # Cov(df/dx_a(x1_i), f(x2_j)) = +2 amp g' Dw  -> (n1*d, n2)
        gv = (2.0 * amp) * g1[:, :, None] * Dw
        bottom_blocks.append(gv.transpose(0, 2, 1).reshape(n1 * d, n2))
    if grad_cols:
        # Cov(df/dx_a(x1_i), df/dx_b(x2_j))
        gg = (-4.0 * amp) * g2[:, :, None, None] * (
            Dw[:, :, :, None] * Dw[:, :, None, :]
        ) - (2.0 * amp) * g1[:, :, None, None] * (
            jnp.eye(d, dtype=S.dtype) * inv2[None, :]
        )[None, None, :, :]
        bottom_blocks.append(gg.transpose(0, 2, 1, 3).reshape(n1 * d, n2 * d))
    bottom = (
        bottom_blocks[0] if len(bottom_blocks) == 1
        else jnp.concatenate(bottom_blocks, axis=1)
    )
    return jnp.concatenate([top, bottom], axis=0)


def gram_joint(
    X: jax.Array,
    params: GPParams,
    config: GPConfig,
    noise: jax.Array | None = None,
    grad_noise: jax.Array | None = None,
) -> jax.Array:
    """Joint Gram of (f(X), grad f(X)): (N(1+d), N(1+d)), with diagonal.

    Value rows get the usual nugget + jitter (gram_matrix convention);
    gradient rows get the SAME relative regularization expressed in
    gradient units, (nugget + jitter*amp) * c_g / ell_a^2 — i.e. scaled by
    the ratio of the prior gradient variance to the prior value variance,
    so the joint matrix stays uniformly well-conditioned across length
    scales. noise / grad_noise are known per-observation variances
    ((N,) and (N, d)) appended to the respective diagonals.
    """
    n, d = X.shape
    K = joint_cross(X, X, params, config, grad_rows=True, grad_cols=True)
    K = 0.5 * (K + K.T)
    amp = jnp.exp(params.log_amp)
    jitter_frac = effective_jitter_frac(n * (1 + d), X.dtype, config)
    base = jnp.exp(params.log_nugget) + jitter_frac * amp
    ell = _ell_vec(params, config, d)
    cg = jnp.asarray(grad_prior_scale(config), X.dtype)
    diag_v = jnp.full((n,), 1.0, X.dtype) * base
    if noise is not None:
        diag_v = diag_v + noise.astype(X.dtype)
    diag_g = jnp.tile(base * cg / (ell * ell), (n,))  # (n*d,)
    if grad_noise is not None:
        diag_g = diag_g + grad_noise.astype(X.dtype).reshape(n * d)
    diag = jnp.concatenate([diag_v, diag_g])
    idx = jnp.arange(n * (1 + d))
    return K.at[idx, idx].add(diag)
