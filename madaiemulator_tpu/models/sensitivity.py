"""Variance-based global sensitivity analysis over the emulator.

Sobol indices and main-effect curves — the standard companion analysis of
GP emulation (Oakley & O'Hagan 2004; Saltelli et al. 2010): once a cheap
emulator of the simulator exists, "which inputs drive the output variance"
is answered by Monte Carlo OVER THE EMULATOR at zero simulator cost. The
reference has no sensitivity tooling at all — MADAI users exported samples
and post-processed externally [SURVEY §3.2: the pipe protocol is the only
analysis surface]. Here the whole estimator is in-graph: the Saltelli
design is built on device, every evaluation is one batched emulator
predict (GEMMs on the MXU), and the index arithmetic is a handful of
reductions — one jit, no host round-trips per pick-freeze block.

Estimators (Saltelli et al. 2010 recommendations):
  first-order  S_i = mean(f_B (f_ABi - f_A)) / V
  total        T_i = mean((f_A - f_ABi)^2) / (2 V)
with A, B two independent uniform designs on [0,1]^d and AB_i = A with
column i swapped from B; V = Var over the pooled A/B evaluations.

predict_fn contracts: (m, d) -> (m,) scalar mean, or (m, t) multivariate
means — indices then come out per-observable, vectorized over t.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class SobolResult(NamedTuple):
    """first[i] / total[i]: Sobol indices with the input-dimension axis
    LEADING — (d,) scalar, or (d, t) with a trailing observable axis when
    predict_fn returns (m, t). mean/variance: the emulator-output moments
    the indices are normalized by."""

    first: jax.Array  # (d,) or (d, t)
    total: jax.Array  # (d,) or (d, t)
    mean: jax.Array  # () or (t,)
    variance: jax.Array  # () or (t,)


def _eval_chunked(predict_fn, X: jax.Array, chunk: Optional[int]):
    """Evaluate predict_fn over rows of X in bounded chunks (lax.map)."""
    m = X.shape[0]
    if chunk is None or m <= chunk:
        return predict_fn(X)
    pad = (-m) % chunk
    Xp = jnp.concatenate([X, X[:pad]], axis=0) if pad else X
    out = jax.lax.map(predict_fn, Xp.reshape(-1, chunk, X.shape[1]))
    return out.reshape((-1,) + out.shape[2:])[:m]


def sobol_indices(
    predict_fn: Callable[[jax.Array], jax.Array],
    d: int,
    key: jax.Array,
    n: int = 4096,
    query_chunk: Optional[int] = 4096,
    dtype=jnp.float32,
) -> SobolResult:
    """Sobol first-order and total indices of predict_fn on [0,1]^d.

    n(d + 2) emulator evaluations total, batched. Indices are clipped to
    [0, 1] only in the report sense — raw estimator noise can leave tiny
    negatives; callers get the raw values (test against tolerance, not
    sign). jit-able when predict_fn is.
    """
    ka, kb = jax.random.split(key)
    A = jax.random.uniform(ka, (n, d), dtype=dtype)
    B = jax.random.uniform(kb, (n, d), dtype=dtype)
    # One query matrix: [A; B; AB_0; ...; AB_{d-1}] -> (n (d+2), d)
    AB = jnp.tile(A[None], (d, 1, 1))
    AB = AB.at[jnp.arange(d), :, jnp.arange(d)].set(B.T)
    X = jnp.concatenate([A, B, AB.reshape(d * n, d)], axis=0)
    f = _eval_chunked(predict_fn, X, query_chunk)
    f = f.astype(jnp.promote_types(f.dtype, jnp.float32))
    fA, fB = f[:n], f[n : 2 * n]
    fAB = f[2 * n :].reshape((d, n) + f.shape[1:])
    pooled = jnp.concatenate([fA, fB], axis=0)
    mean = jnp.mean(pooled, axis=0)
    V = jnp.var(pooled, axis=0)
    Vsafe = jnp.where(V > 0, V, 1.0)
    first = jnp.mean(fB[None] * (fAB - fA[None]), axis=1) / Vsafe
    total = jnp.mean((fA[None] - fAB) ** 2, axis=1) / (2.0 * Vsafe)
    zero = jnp.zeros_like(first)
    first = jnp.where(V > 0, first, zero)
    total = jnp.where(V > 0, total, zero)
    return SobolResult(first=first, total=total, mean=mean, variance=V)


def main_effects(
    predict_fn: Callable[[jax.Array], jax.Array],
    d: int,
    key: jax.Array,
    grid: int = 33,
    n: int = 2048,
    query_chunk: Optional[int] = 4096,
    dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """Main-effect curves E[f | x_i = v] on a uniform grid of v in [0,1].

    Returns (grid_values (grid,), effects (d, grid[, t])): for each input
    dimension, the emulator mean averaged over the other inputs — the
    Oakley–O'Hagan "main effect" plot, the first thing a calibration study
    looks at. d * grid * n emulator evaluations, batched and chunked.
    """
    base = jax.random.uniform(key, (n, d), dtype=dtype)
    gv = jnp.linspace(0.0, 1.0, grid, dtype=dtype)
    # (d, grid, n, d): base with column i pinned to gv[j]
    X = jnp.tile(base[None, None], (d, grid, 1, 1))
    X = X.at[jnp.arange(d)[:, None], :, :, jnp.arange(d)[:, None]].set(
        gv[None, :, None]
    )
    f = _eval_chunked(predict_fn, X.reshape(d * grid * n, d), query_chunk)
    f = f.reshape((d, grid, n) + f.shape[1:])
    return gv, jnp.mean(f.astype(jnp.promote_types(f.dtype, jnp.float32)),
                        axis=2)


def gp_mean_fn(params, data, config, state=None):
    """Adapter: a trained scalar GP as a (m, d) -> (m,) predict_fn.

    Factors once (or reuses a caller-supplied GPPosteriorState) and closes
    over it, so each sensitivity evaluation batch is pure serving work.
    """
    from madaiemulator_tpu.models.gp import (
        precompute_predictor,
        predict_from_precomputed,
    )

    if state is None:
        state = precompute_predictor(params, data, config)

    def fn(Xs):
        mean, _ = predict_from_precomputed(state, params, data, Xs, config)
        return mean

    return fn


def multivariate_mean_fn(emu):
    """Adapter: a MultivariateEmulator as a (m, d) -> (m, t) predict_fn —
    Sobol indices and main effects come out per-observable.

    The sampler works in the SCALED [0,1]^d space; queries are mapped back
    to the emulator's raw parameter box before predicting. Sobol indices
    are invariant under that per-dimension affine map, so "fraction of
    variance from parameter i over its design range" reads off directly.
    """
    from madaiemulator_tpu.models.multivariate import predict_multivariate
    from madaiemulator_tpu.utils.designs import unapply_scaling

    def fn(Xs):
        mean, _ = predict_multivariate(emu, unapply_scaling(Xs, emu.scaling))
        return mean

    return fn
