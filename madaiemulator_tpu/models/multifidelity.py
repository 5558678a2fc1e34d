"""Multi-fidelity emulation: Kennedy-O'Hagan AR(1) co-kriging, recursive form.

Widens the reference (single-fidelity only — SURVEY.md §2; mount empty) with
the standard multi-level simulator setup: many cheap low-fidelity runs plus
a few expensive high-fidelity runs, linked by the autoregressive model

    y_k(x) = rho_k * y_{k-1}(x) + delta_k(x),      delta_k ~ GP

(Kennedy & O'Hagan 2000). We use Le Gratiet's recursive decoupling: with the
lower level's value at the level-k design available (observed on nested
designs, or the trained lower-level emulator's mean otherwise), level k is
an ORDINARY GP regression of y_k whose GLS basis gains one extra column —
that column's coefficient IS rho_k. This maps exactly onto the existing
machinery (GPData.h_extra + the GLS envelope in the closed-form LML VJP):

  - rho_k and the polynomial-trend beta are profiled out in closed form
    inside every likelihood evaluation (exact joint MLE, no new optimizer);
  - each level fits with the same vmapped multi-restart LBFGS on the MXU;
  - prediction recurses: the mean uses the lower level's mean as the query
    basis column, and the variance adds rho_k^2 * var_{k-1} (the propagated
    lower-level uncertainty) to level k's own GP variance, whose GLS
    correction already carries the (beta, rho) estimation uncertainty.

TPU notes: every level is a standard dense GP here (the expensive levels
are small by construction — that is the point of multi-fidelity); the cheap
level can be arbitrarily large via the usual dense/iterative machinery at
fit time, but serving stays dense per level (one cross-covariance GEMM +
two TRSMs per level per query batch, all inside one jit).
"""

from __future__ import annotations

import logging
from typing import List, NamedTuple, Optional, Sequence, Tuple

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
from madaiemulator_tpu.utils.designs import (
    DesignScaling,
    apply_scaling,
    fit_scaling,
)


class FidelityLevel(NamedTuple):
    """One trained level: its (scaled) data, hyperparameters, serving
    factorization, and — for levels >= 1 — the fitted AR(1) scale rho
    (the GLS coefficient of the lower-fidelity basis column)."""

    data: GPData
    params: GPParams
    state: GPPosteriorState
    rho: jax.Array  # scalar; 0 for level 0 (no lower level)


class MultiFidelityEmulator(NamedTuple):
    scaling: DesignScaling  # shared design scaling across all levels
    levels: Tuple[FidelityLevel, ...]
    config: GPConfig

    @property
    def n_levels(self) -> int:
        return len(self.levels)

    @property
    def rho(self) -> jax.Array:
        """AR(1) scales (n_levels - 1,): rho[k] links level k+1 to k."""
        return jnp.stack([lv.rho for lv in self.levels[1:]])


def _predict_level(
    lv: FidelityLevel,
    Xs: jax.Array,
    config: GPConfig,
    lower_mean: Optional[jax.Array],
) -> Tuple[jax.Array, jax.Array]:
    hs = None if lower_mean is None else lower_mean[:, None]
    return predict_from_precomputed(
        lv.state, lv.params, lv.data, Xs, config, hs_extra=hs
    )


def fit_multifidelity(
    key: jax.Array,
    designs: Sequence[jax.Array],
    targets: Sequence[jax.Array],
    config: GPConfig,
    lower_values: Optional[Sequence[Optional[jax.Array]]] = None,
    noise: Optional[Sequence[Optional[jax.Array]]] = None,
    param_ranges: Optional[Tuple[jax.Array, jax.Array]] = None,
    **fit_kwargs,
) -> MultiFidelityEmulator:
    """Train an AR(1) co-kriging emulator over fidelity levels 0..L-1
    (level 0 cheapest/largest; level L-1 the target fidelity).

    designs[k]: (N_k, d) raw design of level k; targets[k]: (N_k,) outputs.
    lower_values[k-1] (optional, per level >= 1): the OBSERVED level-(k-1)
    output at designs[k] — exact recursive co-kriging on nested designs.
    When absent, the trained lower levels' recursive mean at designs[k] is
    used instead (the standard approximation for non-nested designs; its
    error is the lower emulator's interpolation error). noise[k] gives
    per-point observation-noise variances per level (GPData.noise).
    fit_kwargs forward to models.fit.fit_gp (n_restarts, max_steps,
    restart_chunk).

    The reference has no multi-fidelity capability; this is a
    beyond-reference subsystem (COMPONENTS.md "Beyond-reference additions").
    """
    L = len(designs)
    if len(targets) != L:
        raise ValueError(f"designs/targets length mismatch: {L} vs {len(targets)}")
    if L < 1:
        raise ValueError("need at least one fidelity level")
    lower_values = list(lower_values or [None] * (L - 1))
    if len(lower_values) != L - 1:
        raise ValueError(
            f"lower_values must have {L - 1} entries (levels 1..{L - 1})"
        )
    noise = list(noise or [None] * L)
    if len(noise) != L:
        raise ValueError(f"noise must have {L} entries")

    # one scaling over the union: every level lives in the same [0,1]^d
    allX = jnp.concatenate([jnp.asarray(X) for X in designs], axis=0)
    scaling = fit_scaling(allX, ranges=param_ranges)
    dtype = jnp.asarray(targets[0]).dtype

    levels: List[FidelityLevel] = []
    keys = jax.random.split(key, L)
    for k in range(L):
        Xk = apply_scaling(jnp.asarray(designs[k], dtype=dtype), scaling)
        yk = jnp.asarray(targets[k], dtype=dtype)
        nz = None if noise[k] is None else jnp.asarray(noise[k], dtype=dtype)
        if k == 0:
            h = None
        else:
            lv_obs = lower_values[k - 1]
            if lv_obs is not None:
                h = jnp.asarray(lv_obs, dtype=dtype)
            else:
                # recursive mean of the already-trained levels 0..k-1
                h, _ = _predict_recursive(levels, Xk, config)
            h = h[:, None]  # (N_k, 1) basis column; its GLS coef = rho_k
        data = GPData(X=Xk, y=yk, noise=nz, h_extra=h)
        fit: FitResult = fit_gp(keys[k], data, config, **fit_kwargs)
        state = precompute_predictor(fit.params, data, config)
        rho = state.beta[-1] if k > 0 else jnp.asarray(0.0, dtype)
        levels.append(
            FidelityLevel(data=data, params=fit.params, state=state, rho=rho)
        )
    return MultiFidelityEmulator(
        scaling=scaling, levels=tuple(levels), config=config
    )


def _predict_recursive(
    levels: Sequence[FidelityLevel], Xs: jax.Array, config: GPConfig
) -> Tuple[jax.Array, jax.Array]:
    """Recursive mean/variance through trained levels at SCALED queries:
    mean_k = H beta + rho_k mean_{k-1} + k*^T alpha (rho inside the basis);
    var_k = rho_k^2 var_{k-1} + varGP_k."""
    mean, var = _predict_level(levels[0], Xs, config, None)
    for lv in levels[1:]:
        m_k, v_k = _predict_level(lv, Xs, config, mean)
        mean = m_k
        var = lv.rho ** 2 * var + v_k
    return mean, var


def predict_multifidelity(
    emu: MultiFidelityEmulator,
    Xs_raw: jax.Array,
    level: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Posterior mean and variance of fidelity `level` (default: highest)
    at raw query points (m, d) -> ((m,), (m,))."""
    L = emu.n_levels
    level = L - 1 if level is None else level
    if not 0 <= level < L:
        raise ValueError(f"level {level} out of range [0, {L})")
    dtype = emu.levels[0].data.X.dtype
    Xs = apply_scaling(jnp.asarray(Xs_raw, dtype=dtype), emu.scaling)
    return _predict_recursive(emu.levels[: level + 1], Xs, emu.config)


# --- Multivariate (t > 1) multi-fidelity -------------------------------------
#
# The reference's flagship configuration is PCA emulation of many
# observables (SURVEY §2 "Multivariate emulator"; mount empty). The
# multivariate multi-fidelity emulator runs that pipeline across fidelity
# levels: ONE shared PCA basis is fit on the pooled (z-scored) outputs of
# every level, each level's outputs project to PC scores under that basis,
# and each retained component then runs the scalar AR(1) recursion above.
# Sharing the basis is what makes the recursion well-posed: the AR(1) link
# y_k = rho y_{k-1} + delta is affine, PC projection is linear, so the
# link holds componentwise in score space (the affine offset is absorbed
# by the GLS constant term that every component's trend already carries).
# Per-level fits vmap over the component axis — one batched LBFGS program
# per level on the MXU, with the lower-level mean riding as a batched
# h_extra GLS column exactly as in the scalar path.


class MVFidelityLevel(NamedTuple):
    """One trained level of a multivariate MF emulator: the component axis
    (r) is batched — params/states are stacked pytrees, Z/H/noise carry r
    as their trailing axis."""

    X: jax.Array  # (N_k, d) scaled design
    Z: jax.Array  # (N_k, r) per-component PC-score targets
    H: Optional[jax.Array]  # (N_k, r) lower-level mean columns; None at k=0
    noise: Optional[jax.Array]  # (N_k, r) PC-space noise variances
    params: GPParams  # batched (r, ...)
    states: GPPosteriorState  # batched (r, ...)
    rho: jax.Array  # (r,) AR(1) scales; zeros at level 0


class MultivariateMultiFidelityEmulator(NamedTuple):
    scaling: DesignScaling  # shared across levels
    pca: "PCAState"  # ONE basis shared by every level
    levels: Tuple[MVFidelityLevel, ...]
    config: GPConfig
    restart_log_likelihoods: Optional[Tuple[jax.Array, ...]] = None

    @property
    def n_levels(self) -> int:
        return len(self.levels)

    @property
    def n_components(self) -> int:
        return self.levels[0].Z.shape[1]

    @property
    def n_outputs(self) -> int:
        return self.pca.ymean.shape[0]

    @property
    def rho(self) -> jax.Array:
        """AR(1) scales (n_levels - 1, r): rho[k, i] links level k+1 to
        level k in component i's score space."""
        return jnp.stack([lv.rho for lv in self.levels[1:]])


def _predict_level_components(
    lv: MVFidelityLevel, Xs: jax.Array, config: GPConfig,
    lower_mean: Optional[jax.Array],
) -> Tuple[jax.Array, jax.Array]:
    """(r, m) mean/variance of one level's components; lower_mean (r, m)
    feeds each component's h_extra query column."""
    if lower_mean is None:
        def one(st, p, z):
            return predict_from_precomputed(
                st, p, GPData(X=lv.X, y=z), Xs, config
            )

        return jax.vmap(one)(lv.states, lv.params, lv.Z.T)

    def one(st, p, z, h, lm):
        data = GPData(X=lv.X, y=z, h_extra=h)
        return predict_from_precomputed(
            st, p, data, Xs, config, hs_extra=lm[:, None]
        )

    return jax.vmap(one)(
        lv.states, lv.params, lv.Z.T, lv.H.T[:, :, None], lower_mean
    )


def _predict_recursive_mv(
    levels: Sequence[MVFidelityLevel], Xs: jax.Array, config: GPConfig
) -> Tuple[jax.Array, jax.Array]:
    """Componentwise recursion: (r, m) score-space mean/variance through
    the level chain (same algebra as _predict_recursive, batched over r)."""
    mean, var = _predict_level_components(levels[0], Xs, config, None)
    for lv in levels[1:]:
        m_k, v_k = _predict_level_components(lv, Xs, config, mean)
        mean = m_k
        var = lv.rho[:, None] ** 2 * var + v_k
    return mean, var


def fit_multivariate_multifidelity(
    key: jax.Array,
    designs: Sequence[jax.Array],
    targets: Sequence[jax.Array],
    config: GPConfig,
    pca_variance: float = 0.95,
    standardize: bool = True,
    lower_values: Optional[Sequence[Optional[jax.Array]]] = None,
    noise: Optional[Sequence[Optional[jax.Array]]] = None,
    param_ranges: Optional[Tuple[jax.Array, jax.Array]] = None,
    restart_chunk: Optional[int] = None,
    **fit_kwargs,
) -> MultivariateMultiFidelityEmulator:
    """Train a multivariate AR(1) co-kriging emulator: targets[k] is
    (N_k, t) observables at fidelity k (cheapest first).

    The PCA basis is fit ONCE on the pooled rows of every level (each
    z-scored with the pooled mean/std): the pooled covariance sees the
    most samples — the top level alone is typically far smaller than t —
    and a SHARED basis is required for the componentwise AR(1) recursion
    to be meaningful (see module section comment). lower_values[k-1]
    (optional): OBSERVED level-(k-1) outputs (N_k, t) at level k's design
    (nested designs); otherwise the trained lower levels' recursive mean
    is used. noise[k]: per-point observation-noise variances, (N_k,) or
    (N_k, t), projected per component (models/multivariate.project_noise).
    """
    from madaiemulator_tpu.models.multivariate import (
        _vmapped_fit,
        _vmapped_states,
        pca_decompose,
        project_noise,
        project_scores,
    )

    L = len(designs)
    if len(targets) != L:
        raise ValueError(f"designs/targets length mismatch: {L} vs {len(targets)}")
    if L < 1:
        raise ValueError("need at least one fidelity level")
    lower_values = list(lower_values or [None] * (L - 1))
    if len(lower_values) != L - 1:
        raise ValueError(
            f"lower_values must have {L - 1} entries (levels 1..{L - 1})"
        )
    noise = list(noise or [None] * L)
    if len(noise) != L:
        raise ValueError(f"noise must have {L} entries")
    t = np.asarray(targets[0]).shape[1] if np.asarray(targets[0]).ndim == 2 else 1
    for k, Yk in enumerate(targets):
        Yk = np.asarray(Yk)
        if Yk.ndim != 2 or Yk.shape[1] != t:
            raise ValueError(
                f"targets[{k}] must be (N_{k}, t={t}); got {Yk.shape}"
            )

    allX = jnp.concatenate([jnp.asarray(X) for X in designs], axis=0)
    scaling = fit_scaling(allX, ranges=param_ranges)
    dtype = jnp.asarray(targets[0]).dtype

    # one basis over the pooled outputs; per-level scores under that basis
    Y_pool = np.concatenate([np.asarray(Yk) for Yk in targets], axis=0)
    pca, _ = pca_decompose(Y_pool, pca_variance, standardize=standardize)
    r = pca.U.shape[1]
    logger.info(
        "fit_multivariate_multifidelity: L=%d levels, t=%d -> r=%d "
        "components (pca_variance=%g; pooled basis over %d rows)",
        L, t, r, pca_variance, Y_pool.shape[0],
    )

    levels: List[MVFidelityLevel] = []
    lls: List[jax.Array] = []
    keys = jax.random.split(key, L)
    for k in range(L):
        Xk = apply_scaling(jnp.asarray(designs[k], dtype=dtype), scaling)
        Zk = project_scores(targets[k], pca, dtype=dtype)  # (N_k, r)
        nz = (
            None if noise[k] is None
            else project_noise(noise[k], pca, dtype=dtype)
        )
        if k == 0:
            H = None
        else:
            lv_obs = lower_values[k - 1]
            if lv_obs is not None:
                H = project_scores(lv_obs, pca, dtype=dtype)  # (N_k, r)
            else:
                Hm, _ = _predict_recursive_mv(levels, Xk, config)  # (r, N_k)
                H = Hm.T
        fit = _vmapped_fit(
            keys[k], Xk, Zk, config, restart_chunk=restart_chunk,
            noise_pc=nz, H_pc=H, **fit_kwargs,
        )
        states = _vmapped_states(
            fit.params, Xk, Zk, config, noise_pc=nz, H_pc=H
        )
        rho = (
            states.beta[:, -1] if k > 0
            else jnp.zeros((r,), dtype)
        )
        levels.append(MVFidelityLevel(
            X=Xk, Z=Zk, H=H, noise=nz, params=fit.params, states=states,
            rho=rho,
        ))
        lls.append(fit.restart_log_likelihoods)
        ll_np = np.asarray(fit.restart_log_likelihoods)
        for i in range(r):
            if not np.isfinite(ll_np[i]).any():
                logger.warning(
                    "fit_multivariate_multifidelity: level %d component "
                    "%d/%d has NO feasible restart — predictions through "
                    "this component will be garbage.", k, i, r,
                )
    return MultivariateMultiFidelityEmulator(
        scaling=scaling, pca=pca, levels=tuple(levels), config=config,
        restart_log_likelihoods=tuple(lls),
    )


def predict_multivariate_multifidelity(
    emu: MultivariateMultiFidelityEmulator,
    Xs_raw: jax.Array,
    level: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Observable-space posterior mean and variance of fidelity `level`
    (default: highest) at raw queries: (m, d) -> ((m, t), (m, t)).

    Componentwise recursion in score space, then the usual PCA
    reconstruction (models/multivariate.reconstruct_observables) with its
    independent-component variance approximation."""
    from madaiemulator_tpu.models.multivariate import reconstruct_observables

    L = emu.n_levels
    level = L - 1 if level is None else level
    if not 0 <= level < L:
        raise ValueError(f"level {level} out of range [0, {L})")
    dtype = emu.levels[0].X.dtype
    Xs = apply_scaling(jnp.asarray(Xs_raw, dtype=dtype), emu.scaling)
    m_pc, v_pc = _predict_recursive_mv(
        emu.levels[: level + 1], Xs, emu.config
    )
    return reconstruct_observables(m_pc, v_pc, emu.pca)
