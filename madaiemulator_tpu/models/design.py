"""Sequential (adaptive) experimental design over a trained emulator.

The reference's workflow starts from a fixed space-filling design (Latin
hypercube — utils/designs.py) and never revisits it; every further
simulator run is chosen by hand. This module closes the loop TPU-first:
given a fitted emulator, choose the next batch of simulator runs by

  * **active variance learning** (`active_variance_design`): put new runs
    where the emulator is least certain — greedy batch selection from a
    space-filling candidate pool, scored by total predictive variance and
    spaced by a maximin distance factor so a batch does not collapse onto
    one uncertainty peak;
  * **history-matching waves** (`nroy_wave_design`): put new runs inside
    the NROY ("not ruled out yet") region — candidates are screened by the
    implausibility statistic (models/calibrate.py) and the batch is chosen
    maximin space-filling *within* NROY. Iterating simulate → refit →
    rescreen is the classic wave design that shrinks the viable parameter
    region before a full-Bayes calibration.

Everything hot is one jit-compiled program per call: candidate scoring is
the emulator's batched predict (cross-covariance GEMMs on the MXU over the
whole pool at once) and the greedy batch selection is a `lax.fori_loop`
over running minimum distances — no Python loop over candidates.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from madaiemulator_tpu.models.calibrate import implausibility_from_moments
from madaiemulator_tpu.models.multivariate import (
    MultivariateEmulator,
    _predict_components,
    reconstruct_observables,
)
from madaiemulator_tpu.utils.designs import latin_hypercube, unapply_scaling


class DesignProposal(NamedTuple):
    """A proposed batch of new simulator runs.

    points: (n_new, d) NATURAL-space parameter points to run next
    scores: (n_new,) the acquisition value of each pick (selection order)
    pool_fraction_viable: scalar — fraction of the candidate pool passing
        the screen (1.0 for pure variance designs; the NROY fraction for
        history-matching waves — the number to watch shrink across waves)
    """

    points: np.ndarray
    scores: np.ndarray
    pool_fraction_viable: float


def _greedy_maximin(
    points: jax.Array, weights: jax.Array, n_new: int
) -> Tuple[jax.Array, jax.Array]:
    """Greedy weighted-maximin batch selection, in-graph.

    Picks argmax(weight), then repeatedly argmax(weight * min-sq-distance
    to everything already picked). Zero-weight candidates are never picked
    while any positive-weight candidate remains; a picked point's distance
    factor drops to 0 so it cannot repeat. Returns (indices, pick scores).
    """
    p, d = points.shape

    def body(i, state):
        mind, sel, scr = state
        dist_factor = jnp.where(i == 0, 1.0, mind)
        score = weights * dist_factor
        idx = jnp.argmax(score)
        d2 = jnp.sum((points - points[idx]) ** 2, axis=1)
        mind = jnp.minimum(mind, d2)
        sel = sel.at[i].set(idx.astype(sel.dtype))
        scr = scr.at[i].set(score[idx])
        return mind, sel, scr

    mind0 = jnp.full((p,), float(d), points.dtype)  # max sq-dist on [0,1]^d
    sel0 = jnp.zeros((n_new,), jnp.int32)
    scr0 = jnp.zeros((n_new,), points.dtype)
    _, sel, scr = jax.lax.fori_loop(0, n_new, body, (mind0, sel0, scr0))
    return sel, scr


def _variance_weights(var: jax.Array, ystd: jax.Array) -> jax.Array:
    """Acquisition weight for active variance learning: total predictive
    variance normalized per-observable by its training-output scale (ystd,
    (t,) — pca.ystd for PCA emulators, the top level's target spread for
    multi-fidelity), so no single large-magnitude observable dominates.
    THE single definition — every emulator-family branch calls it, so the
    acquisition can never diverge between them. var: (P, t) -> (P,)."""
    w = jnp.maximum(ystd.astype(var.dtype), jnp.finfo(var.dtype).tiny)
    return jnp.sum(var / (w[None, :] ** 2), axis=-1)


def _nroy_weights(
    imp: jax.Array, threshold: float, dtype
) -> Tuple[jax.Array, jax.Array]:
    """Blended NROY selection weights from implausibilities (single
    definition for the dense and matrix-free branches). Inside NROY: pure
    space-filling (weight 1); outside: a small least-implausible-first
    fallback weight. The blend (rather than a hard 0/1 switch) matters when
    0 < #viable < n_new: once every viable candidate is picked their
    distance factor is 0, and with 0/1 weights every remaining greedy score
    would tie at 0 — argmax would then return duplicate copies of pool[0].
    With the blend the remaining picks fall through to well-spaced
    least-implausible points; eps is small enough that a viable candidate
    beats every fallback one. Returns (weights (P,), viable fraction)."""
    viable = imp <= threshold
    frac = jnp.mean(viable.astype(dtype))
    weights = viable.astype(dtype) + 1e-6 / (1.0 + imp)
    return weights, frac


@functools.partial(jax.jit, static_argnames=("config", "n_new"))
def _variance_select(emu_states, emu_params, X, Z, pca, config, pool, n_new,
                     dZ=None):
    m_pc, v_pc = _predict_components(emu_states, emu_params, X, Z, pool,
                                     config, dZ=dZ)
    _, var = reconstruct_observables(m_pc, v_pc, pca)  # (P, t)
    return _greedy_maximin(pool, _variance_weights(var, pca.ystd), n_new)


def _pool_moments_iterative(emu, pool: jax.Array, states, iter_kwargs):
    """Observable-space (mean, var) over a scaled candidate pool for a
    matrix-free (no dense states) emulator; the acquisition math downstream
    is identical to the dense path's.

    Defaults to the PCG-free Woodbury variance: a pool is thousands of
    points, and a pool-wide exact-PCG variance solve is both slow and the
    documented wide-RHS TPU-worker crash trigger (it took down an N=32k
    4096-point screen). Acquisition only RANKS points, so the lower-bound
    variance is the right default; pass variance_method="exact" to
    override at small N.
    """
    from madaiemulator_tpu.models.multivariate import (
        predict_multivariate_iterative,
    )

    kw = dict(iter_kwargs or {})
    kw.setdefault("variance_method", "precond")
    return predict_multivariate_iterative(
        emu, unapply_scaling(pool, emu.scaling), states=states, **kw
    )


def _pool_moments_sparse(emu, pool: jax.Array):
    """Observable-space (mean, var) over a scaled pool for a sparse (SGPR)
    emulator — O(P m) against the stored serve state
    (models/sparse.predict_multivariate_sparse)."""
    from madaiemulator_tpu.models.sparse import predict_multivariate_sparse

    return predict_multivariate_sparse(emu, unapply_scaling(pool, emu.scaling))


def _is_sparse(emu) -> bool:
    from madaiemulator_tpu.models.sparse import is_sparse

    return is_sparse(emu)


def _is_mf(emu) -> bool:
    from madaiemulator_tpu.models.multifidelity import (
        MultiFidelityEmulator,
        MultivariateMultiFidelityEmulator,
    )

    return isinstance(
        emu, (MultiFidelityEmulator, MultivariateMultiFidelityEmulator)
    )


def _is_mf_mv(emu) -> bool:
    from madaiemulator_tpu.models.multifidelity import (
        MultivariateMultiFidelityEmulator,
    )

    return isinstance(emu, MultivariateMultiFidelityEmulator)


def _pool_moments_mf(emu, pool: jax.Array):
    """Observable-space (mean, var) over a scaled candidate pool for a
    multi-fidelity emulator: the recursive co-kriging predict at the
    HIGHEST fidelity ((P, 1) scalar / (P, t) multivariate). Designing
    where the top level's recursive variance is largest targets new
    HIGH-fidelity runs; lower levels are refined by their own
    single-fidelity designs."""
    if _is_mf_mv(emu):
        from madaiemulator_tpu.models.multifidelity import (
            _predict_recursive_mv,
        )
        from madaiemulator_tpu.models.multivariate import (
            reconstruct_observables,
        )

        m_pc, v_pc = _predict_recursive_mv(emu.levels, pool, emu.config)
        return reconstruct_observables(m_pc, v_pc, emu.pca)
    from madaiemulator_tpu.models.multifidelity import _predict_recursive

    m, v = _predict_recursive(emu.levels, pool, emu.config)
    return m[:, None], v[:, None]


def _mf_ystd(emu) -> jax.Array:
    """Output-scale normalizer: pca.ystd for multivariate MF; the top
    level's target spread for scalar MF (whose targets are stored in raw
    units — models/multifidelity.py)."""
    if _is_mf_mv(emu):
        return emu.pca.ystd
    return jnp.std(emu.levels[-1].data.y).reshape(1)


def _design_array(emu) -> jax.Array:
    """The scaled points that set the pool's dtype/dimension: training
    design (dense/matrix-free), inducing set (sparse), or the top level's
    design (multi-fidelity)."""
    if _is_sparse(emu):
        return emu.Z
    if _is_mf_mv(emu):
        return emu.levels[-1].X
    if _is_mf(emu):
        return emu.levels[-1].data.X
    return emu.X


_greedy_maximin_jit = jax.jit(_greedy_maximin, static_argnames=("n_new",))


def active_variance_design(
    key: jax.Array,
    emu: MultivariateEmulator,
    n_new: int,
    pool_size: int = 4096,
    pool: Optional[jax.Array] = None,
    states=None,
    **iter_kwargs,
) -> DesignProposal:
    """Next `n_new` simulator runs by batch active learning (max variance).

    A Latin-hypercube candidate pool over the scaled design cube (or a
    caller-supplied `pool`, scaled coords) is scored by total normalized
    predictive variance in one batched predict; the batch is then chosen
    greedily with a maximin spacing factor. Returns natural-space points.

    Also accepts an IterativeMultivariateEmulator (matrix-free, N past
    dense HBM): pool moments then come from the PCG serving path — pass
    `states` from precompute_iterative_multivariate to reuse the training
    solves across waves; iter_kwargs forward to the iterative predict.
    """
    design = _design_array(emu)
    if pool is None:
        pool = latin_hypercube(key, pool_size, design.shape[1],
                               dtype=design.dtype)
    pool = jnp.asarray(pool, dtype=design.dtype)
    if _is_mf(emu):
        _, var = _pool_moments_mf(emu, pool)
        sel, scr = _greedy_maximin_jit(
            pool, _variance_weights(var, _mf_ystd(emu)), n_new=int(n_new)
        )
    elif _is_sparse(emu):
        _, var = _pool_moments_sparse(emu, pool)
        sel, scr = _greedy_maximin_jit(
            pool, _variance_weights(var, emu.pca.ystd), n_new=int(n_new)
        )
    elif getattr(emu, "states", None) is not None:
        sel, scr = _variance_select(
            emu.states, emu.params, emu.X, emu.Z, emu.pca, emu.config, pool,
            int(n_new), dZ=emu.dZ,
        )
    else:
        _, var = _pool_moments_iterative(emu, pool, states, iter_kwargs)
        sel, scr = _greedy_maximin_jit(
            pool, _variance_weights(var, emu.pca.ystd), n_new=int(n_new)
        )
    pts = unapply_scaling(pool[sel], emu.scaling)
    return DesignProposal(
        points=np.asarray(pts),
        scores=np.asarray(scr),
        pool_fraction_viable=1.0,
    )


@functools.partial(
    jax.jit, static_argnames=("config", "n_new", "threshold")
)
def _nroy_select(
    emu_states, emu_params, X, Z, pca, config, y_exp, exp_var, pool,
    n_new, threshold, dZ=None,
):
    m_pc, v_pc = _predict_components(emu_states, emu_params, X, Z, pool,
                                     config, dZ=dZ)
    mean, var = reconstruct_observables(m_pc, v_pc, pca)  # (P, t)
    imp = implausibility_from_moments(mean, var, y_exp, exp_var)
    weights, frac = _nroy_weights(imp, threshold, pool.dtype)
    sel, scr = _greedy_maximin(pool, weights, n_new)
    return sel, scr, frac, imp


def nroy_wave_design(
    key: jax.Array,
    emu: MultivariateEmulator,
    y_exp,
    exp_var,
    n_new: int,
    threshold: float = 3.0,
    pool_size: int = 8192,
    pool: Optional[jax.Array] = None,
    states=None,
    **iter_kwargs,
) -> DesignProposal:
    """Next wave of simulator runs for history matching.

    Screens a space-filling candidate pool by implausibility I(theta)
    (max-observable, 3-sigma rule by default) and picks `n_new` maximin
    space-filling points INSIDE the NROY region — the design that most
    efficiently improves the emulator exactly where the data still allows
    the simulator to live. If the pool contains no viable point (the wave
    has converged, or the threshold is tight), falls back to the
    least-implausible points and reports pool_fraction_viable=0.

    Also accepts an IterativeMultivariateEmulator (matrix-free) — see
    active_variance_design for the `states` / iter_kwargs contract.
    """
    design = _design_array(emu)
    if pool is None:
        pool = latin_hypercube(key, pool_size, design.shape[1],
                               dtype=design.dtype)
    pool = jnp.asarray(pool, dtype=design.dtype)
    exp_var = jnp.asarray(exp_var, design.dtype)
    if exp_var.ndim == 2:
        exp_var = jnp.diagonal(exp_var)
    y_exp = jnp.asarray(y_exp, design.dtype)
    if _is_mf(emu):
        mean, var = _pool_moments_mf(emu, pool)
        imp = implausibility_from_moments(mean, var, y_exp, exp_var)
        weights, frac = _nroy_weights(imp, float(threshold), pool.dtype)
        sel, scr = _greedy_maximin_jit(pool, weights, n_new=int(n_new))
    elif _is_sparse(emu):
        mean, var = _pool_moments_sparse(emu, pool)
        imp = implausibility_from_moments(mean, var, y_exp, exp_var)
        weights, frac = _nroy_weights(imp, float(threshold), pool.dtype)
        sel, scr = _greedy_maximin_jit(pool, weights, n_new=int(n_new))
    elif getattr(emu, "states", None) is not None:
        sel, scr, frac, _ = _nroy_select(
            emu.states, emu.params, emu.X, emu.Z, emu.pca, emu.config,
            y_exp, exp_var, pool, int(n_new), float(threshold), dZ=emu.dZ,
        )
    else:
        mean, var = _pool_moments_iterative(emu, pool, states, iter_kwargs)
        imp = implausibility_from_moments(mean, var, y_exp, exp_var)
        weights, frac = _nroy_weights(imp, float(threshold), pool.dtype)
        sel, scr = _greedy_maximin_jit(pool, weights, n_new=int(n_new))
    pts = unapply_scaling(pool[sel], emu.scaling)
    return DesignProposal(
        points=np.asarray(pts),
        scores=np.asarray(scr),
        pool_fraction_viable=float(frac),
    )
