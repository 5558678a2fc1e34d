"""Ensembles of independent emulators, sharded over a TPU device mesh.

The reference has no distributed computing at all (SURVEY.md §2: its only
concurrency is pthreads over optimizer restarts); MCMC calibration runs many
*separate process invocations* of the emulator. The TPU-native design makes
"many independent emulators" a first-class batch axis [B, BASELINE config 5]:

  * `fit_ensemble`    — fit E emulators at once: one program, batch axes
    (ensemble, restart) vmapped and sharded over a `jax.sharding.Mesh`.
    Each (e, r) cell is one LBFGS trajectory; XLA partitions the batch
    axes over chips, no collectives needed on the hot path (the work is
    embarrassingly parallel — the layout rides pure data parallelism,
    with the cross-restart argmax as the only cross-shard reduction,
    which XLA lowers to tiny ICI traffic).
  * `predict_ensemble` — batched posterior prediction for E emulators.

Arrays are laid out (ensemble, restart, ...) exactly so that scaling past
one chip is a sharding annotation, not a rewrite (SURVEY.md §5, "distributed
communication backend").
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from madaiemulator_tpu.models.fit import (
    FitResult,
    _bounds_arrays,
    _u_to_params,
    fit_one_start,
    sample_restarts,
)
from madaiemulator_tpu.models.gp import GPData, gp_posterior
from madaiemulator_tpu.ops.kernels import GPParams
from madaiemulator_tpu.utils.config import GPConfig

ENSEMBLE_AXIS = "ensemble"
RESTART_AXIS = "restart"


def make_mesh(
    n_devices: Optional[int] = None,
    restart_shards: int = 1,
) -> Mesh:
    """A (ensemble, restart) mesh over the first n_devices devices.

    restart_shards divides the restart batch axis over devices too (useful
    when E is small but R is large); default 1 = pure ensemble sharding.
    """
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    if restart_shards < 1 or n % restart_shards != 0:
        raise ValueError(
            f"make_mesh: n_devices={n} is not divisible by "
            f"restart_shards={restart_shards}"
        )
    devs = np.asarray(devs[:n]).reshape(n // restart_shards, restart_shards)
    return Mesh(devs, (ENSEMBLE_AXIS, RESTART_AXIS))


def _fit_batched(u0: GPParams, Xb, yb, config: GPConfig, max_steps: int):
    """(E, R, ...) starts -> per-ensemble best params + LML. Pure function of
    its array args; shard annotations go on the caller's jit."""
    run_r = jax.vmap(
        lambda u, X, y: fit_one_start(u, X, y, config, max_steps),
        in_axes=(0, None, None),
    )  # over restarts
    run_er = jax.vmap(run_r, in_axes=(0, 0, 0))  # over ensemble members
    best_u, best_negll = run_er(u0, Xb, yb)  # (E, R, ...), (E, R)
    lls = -best_negll
    lls = jnp.where(jnp.isfinite(lls), lls, -jnp.inf)
    i = jnp.argmax(lls, axis=1)  # (E,)
    dtype = yb.dtype
    lo, hi = _bounds_arrays(config, dtype)
    params_all = jax.vmap(jax.vmap(lambda u: _u_to_params(u, lo, hi)))(best_u)
    take = lambda a: jnp.take_along_axis(
        a, i.reshape((-1,) + (1,) * (a.ndim - 1)), axis=1
    )[:, 0]
    best_params = jax.tree.map(take, params_all)
    best_ll = jnp.take_along_axis(lls, i[:, None], axis=1)[:, 0]
    return FitResult(
        params=best_params,
        log_likelihood=best_ll,
        restart_log_likelihoods=lls,
        restart_params=params_all,
    )


@functools.partial(jax.jit, static_argnames=("config", "max_steps"))
def fit_ensemble_from_starts(
    u0: GPParams, Xb: jax.Array, yb: jax.Array, config: GPConfig, max_steps: int
) -> FitResult:
    """Fit from explicit (E, R, ...) starts. Callers control sharding by
    placing u0 with P(ensemble, restart) and Xb/yb with P(ensemble); the jit
    inherits input shardings and XLA partitions every batched intermediate."""
    return _fit_batched(u0, Xb, yb, config, max_steps)


@functools.partial(
    jax.jit,
    static_argnames=("config", "n_restarts", "max_steps", "ensemble_chunk"),
)
def _fit_ensemble_jit(
    key, Xb, yb, config, n_restarts, max_steps, ensemble_chunk=None
):
    E = Xb.shape[0]
    dtype = yb.dtype
    keys = jax.random.split(key, E)
    u0 = jax.vmap(
        lambda k: sample_restarts(k, config, n_restarts, dtype=dtype)
    )(keys)  # (E, R, ...)
    if ensemble_chunk is None or ensemble_chunk >= E:
        return _fit_batched(u0, Xb, yb, config, max_steps)
    # Chunk the ensemble axis (same pattern as fit.fit_gp's restart_chunk):
    # lax.map over sequential groups, vmap within. Bounds the number of
    # concurrently-live LBFGS linesearch cells — an E=2048 x R=4 (8192-cell)
    # vmapped zoom-linesearch program reproducibly crashed the TPU worker
    # (ROADMAP.md); chunks of <= 4096 cells are stable and lose nothing on
    # throughput because each chunk already saturates the chip.
    chunk = ensemble_chunk
    if E % chunk != 0:
        raise ValueError(
            f"ensemble size E={E} not divisible by ensemble_chunk={chunk}"
        )
    groups = E // chunk

    def regroup(a):
        return a.reshape((groups, chunk) + a.shape[1:])

    u0g = jax.tree.map(regroup, u0)
    Xg, yg = regroup(Xb), regroup(yb)

    def run_group(args):
        ug, Xc, yc = args
        return _fit_batched(ug, Xc, yc, config, max_steps)

    res_g = jax.lax.map(run_group, (u0g, Xg, yg))
    return jax.tree.map(
        lambda a: a.reshape((E,) + a.shape[2:]), res_g
    )


def _merge_fit_results(parts) -> FitResult:
    """Merge sequential restart batches of the same ensemble: concatenate
    the restart axis, re-argmax per ensemble member."""
    lls = jnp.concatenate(
        [p.restart_log_likelihoods for p in parts], axis=1
    )  # (E, R_total)
    rparams = jax.tree.map(
        lambda *a: jnp.concatenate(a, axis=1), *[p.restart_params for p in parts]
    )
    safe = jnp.where(jnp.isfinite(lls), lls, -jnp.inf)
    best = jnp.argmax(safe, axis=1)  # (E,)
    params = jax.tree.map(
        lambda a: jax.vmap(lambda row, i: row[i])(a, best), rparams
    )
    return FitResult(
        params=params,
        log_likelihood=jnp.max(safe, axis=1),
        restart_log_likelihoods=lls,
        restart_params=rparams,
    )


def _is_tpu_backend() -> bool:
    """True when the default JAX backend runs on TPU hardware (including the
    axon relay, whose platform string differs but whose devices are TPUs)."""
    try:
        dev = jax.devices()[0]
    except Exception:  # pragma: no cover - no backend at all
        return False
    return dev.platform == "tpu" or "TPU" in getattr(dev, "device_kind", "")


def _auto_restart_split(R: int) -> Optional[int]:
    """Default restart_split policy: cap at 2 restarts per device program on
    TPU backends. An R>2 restart-axis vmapped zoom-linesearch program
    reproducibly crashes the TPU worker (ROADMAP.md: E=2048 x R=4 crashed at
    every ensemble_chunk tried; R=2 programs are stable), so the safe split
    is on by default rather than opt-in. Pass restart_split=R to force a
    single R-wide program."""
    if R > 2 and _is_tpu_backend():
        return 2
    return None


def fit_ensemble(
    key: jax.Array,
    Xb: jax.Array,  # (E, N, d)
    yb: jax.Array,  # (E, N)
    config: GPConfig,
    mesh: Optional[Mesh] = None,
    n_restarts: Optional[int] = None,
    max_steps: Optional[int] = None,
    ensemble_chunk: Optional[int] = None,
    restart_split: Optional[int] = None,
) -> FitResult:
    """Fit E independent scalar GPs as one sharded program (config 5 [B]).

    With a mesh, training data and every batched intermediate (restart
    states, Gram matrices, Cholesky factors) are sharded over the
    `ensemble` mesh axis; without one, everything runs on one device.

    ensemble_chunk runs the ensemble axis in sequential groups of that size
    (lax.map over groups, vmap within): use it to cap the number of live
    optimizer cells when E*R is very large.

    restart_split caps how many restarts run per device program: restarts
    beyond it run as additional sequential programs (fresh key folds) and
    the results merge by per-member argmax — mathematically identical to
    one R-wide batch. On TPU backends this DEFAULTS to 2 when R > 2: the
    REPRODUCIBLE R=4 vmapped-linesearch TPU worker crash (ROADMAP.md:
    E=2048 x R=4 crashed at every ensemble_chunk tried, down to 512; R=2
    programs are stable at E=2048) makes a wide restart axis unsafe.
    Pass restart_split=R explicitly to force one R-wide program.
    """
    R = config.n_restarts if n_restarts is None else n_restarts
    steps = config.max_opt_steps if max_steps is None else max_steps
    if restart_split is None:
        restart_split = _auto_restart_split(R)
    if mesh is not None:
        sh = NamedSharding(mesh, P(ENSEMBLE_AXIS))
        Xb = jax.device_put(Xb, sh)
        yb = jax.device_put(yb, sh)
    if restart_split is None or restart_split >= R:
        return _fit_ensemble_jit(key, Xb, yb, config, R, steps, ensemble_chunk)
    parts = []
    done = 0
    i = 0
    while done < R:
        r_i = min(restart_split, R - done)
        parts.append(
            _fit_ensemble_jit(
                jax.random.fold_in(key, i), Xb, yb, config, r_i, steps,
                ensemble_chunk,
            )
        )
        done += r_i
        i += 1
    return _merge_fit_results(parts)


@functools.partial(jax.jit, static_argnames=("config",))
def _predict_ensemble_jit(params, Xb, yb, Xsb, config):
    def one(p, X, y, Xs):
        return gp_posterior(p, GPData(X=X, y=y), Xs, config)

    return jax.vmap(one)(params, Xb, yb, Xsb)


def predict_queries_sharded(
    emu,
    Xs_raw: jax.Array,
    mesh: Optional[Mesh] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Shard a huge query batch of ONE trained multivariate emulator over the
    mesh's ensemble axis (serving-scale path: each device computes the
    cross-kernel matmul + solves for its slice of the queries; the trained
    state is replicated). Pads the batch to the axis size and slices back.
    """
    from madaiemulator_tpu.models.multivariate import predict_multivariate

    if mesh is None:
        return predict_multivariate(emu, Xs_raw)
    axis = mesh.shape[ENSEMBLE_AXIS]
    m = Xs_raw.shape[0]
    pad = (-m) % axis
    if pad:
        # pad may exceed m (e.g. 2 queries on an 8-wide axis): wrap indices
        # so the padded batch is always an exact axis multiple
        idx = jnp.arange(pad) % m
        Xs_raw = jnp.concatenate([Xs_raw, Xs_raw[idx]], axis=0)
    Xs_raw = jax.device_put(
        Xs_raw, NamedSharding(mesh, P(ENSEMBLE_AXIS, None))
    )
    emu = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P()))
        if hasattr(a, "ndim")
        else a,
        emu,
    )
    mean, var = predict_multivariate(emu, Xs_raw)
    return mean[:m], var[:m]


def predict_ensemble(
    params: GPParams,  # batched (E, ...)
    Xb: jax.Array,
    yb: jax.Array,
    Xsb: jax.Array,  # (E, m, d) query points per member
    config: GPConfig,
    mesh: Optional[Mesh] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Batched posterior (means, variances): (E, m) each."""
    if mesh is not None:
        sh = NamedSharding(mesh, P(ENSEMBLE_AXIS))
        Xb, yb, Xsb = (jax.device_put(a, sh) for a in (Xb, yb, Xsb))
        params = jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P(ENSEMBLE_AXIS))),
            params,
        )
    return _predict_ensemble_jit(params, Xb, yb, Xsb, config)
