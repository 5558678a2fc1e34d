"""Hyperparameter estimation: multi-restart LBFGS over the exact-gradient LML.

TPU-native replacement for the reference's estimation stack (ref:
src/libEmu/estimate_threaded.c estimate_thetas_threaded,
src/libEmu/maxmultimin.c GSL Nelder-Mead/BFGS wrappers; mount empty this
round — SURVEY.md §0). Design mapping [B]:

  reference                         | here
  ----------------------------------+------------------------------------
  pthreads over random restarts     | `vmap` over the restart batch axis
  mutex-guarded best-result update  | argmax over per-restart best LML
  GSL NM/BFGS, finite-diff grads    | optax LBFGS + zoom linesearch, exact
                                    |   autodiff gradients (1 fwd+bwd per
                                    |   step vs (ntheta+1) full likelihoods)
  box theta ranges                  | smooth sigmoid reparametrization into
                                    |   the same [lo, hi] boxes

Restarts are drawn log-uniform inside the configured theta boxes from an
explicit PRNG key (deterministic; the reference seeds gsl_rng from time()).
A restart whose covariance goes non-SPD gets LML = -inf at that point and a
NaN gradient afterwards; per-restart best-so-far tracking keeps its best
finite iterate, and the cross-restart argmax ignores bad trajectories —
the branchless analog of the reference's failed-Cholesky backoff.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from madaiemulator_tpu.models.gp import GPData, log_marginal_likelihood
from madaiemulator_tpu.ops.kernels import GPParams
from madaiemulator_tpu.utils.config import GPConfig


class FitResult(NamedTuple):
    params: GPParams  # best-of-restarts hyperparameters (log space)
    log_likelihood: jax.Array  # its LML
    restart_log_likelihoods: jax.Array  # (R,) per-restart best LML
    restart_params: GPParams  # (R, ...) per-restart best params


def _bounds_arrays(config: GPConfig, dtype) -> Tuple[GPParams, GPParams]:
    """(lo, hi) as GPParams pytrees of log-bounds."""
    k = config.num_length_scales

    def arr(v):
        return jnp.asarray(jnp.log(v), dtype=dtype)

    lo = GPParams(
        log_amp=arr(config.amp_bounds[0]),
        log_nugget=arr(config.nugget_bounds[0]),
        log_ls=jnp.full((k,), jnp.log(config.length_scale_bounds[0]), dtype=dtype),
    )
    hi = GPParams(
        log_amp=arr(config.amp_bounds[1]),
        log_nugget=arr(config.nugget_bounds[1]),
        log_ls=jnp.full((k,), jnp.log(config.length_scale_bounds[1]), dtype=dtype),
    )
    return lo, hi


def _u_to_params(u: GPParams, lo: GPParams, hi: GPParams) -> GPParams:
    """Unconstrained u -> log-theta via sigmoid into the [lo, hi] log-box."""
    return jax.tree.map(
        lambda uu, l, h: l + (h - l) * jax.nn.sigmoid(uu), u, lo, hi
    )


def _params_to_u(p: GPParams, lo: GPParams, hi: GPParams) -> GPParams:
    def inv(pp, l, h):
        s = jnp.clip((pp - l) / (h - l), 1e-6, 1.0 - 1e-6)
        return jnp.log(s) - jnp.log1p(-s)

    return jax.tree.map(inv, p, lo, hi)


def sample_restarts(
    key: jax.Array, config: GPConfig, n_restarts: int, dtype=jnp.float32
) -> GPParams:
    """Draw restart thetas log-uniform in the boxes (batched leading axis R).

    Returned in unconstrained u-space, ready for the optimizer.
    """
    lo, hi = _bounds_arrays(config, dtype)
    k_amp, k_nug, k_ls = jax.random.split(key, 3)
    # uniform in (margin, 1-margin) of the box, then logit
    def draw(k, shape):
        s = jax.random.uniform(k, shape, dtype=dtype, minval=0.05, maxval=0.95)
        return jnp.log(s) - jnp.log1p(-s)

    return GPParams(
        log_amp=draw(k_amp, (n_restarts,)),
        log_nugget=draw(k_nug, (n_restarts,)),
        log_ls=draw(k_ls, (n_restarts, config.num_length_scales)),
    )


def _run_lbfgs(u0, objective, max_steps: int, linesearch: str = "zoom"):
    """Fixed-length LBFGS loop with best-so-far tracking; scan-based so it
    vmaps cleanly over the restart axis."""
    if linesearch == "zoom":
        opt = optax.lbfgs()
    elif linesearch == "backtracking":
        opt = optax.lbfgs(
            linesearch=optax.scale_by_backtracking_linesearch(
                max_backtracking_steps=25, store_grad=True
            )
        )
    else:
        raise ValueError(f"unknown linesearch {linesearch!r}")
    value_and_grad = optax.value_and_grad_from_state(objective)
    state0 = opt.init(u0)
    v0 = objective(u0)
    big = jnp.asarray(jnp.inf, dtype=v0.dtype)

    def step(carry, _):
        u, st, best_u, best_v = carry
        v, g = value_and_grad(u, state=st)
        better = jnp.isfinite(v) & (v < best_v)
        best_u = jax.tree.map(
            lambda a, b: jnp.where(better, a, b), u, best_u
        )
        best_v = jnp.where(better, v, best_v)
        updates, st = opt.update(
            g, st, u, value=v, grad=g, value_fn=objective
        )
        u = optax.apply_updates(u, updates)
        # optax linesearch scalars are f64 under x64; pin the iterate dtype
        # so mixed-precision data (f32 fits with x64 enabled) stays stable
        u = jax.tree.map(lambda a, b: a.astype(b.dtype), u, u0)
        return (u, st, best_u, best_v), None

    (u_f, _, best_u, best_v), _ = jax.lax.scan(
        step, (u0, state0, u0, big), None, length=max_steps
    )
    # final iterate may beat the last tracked best
    v_f = objective(u_f)
    better = jnp.isfinite(v_f) & (v_f < best_v)
    best_u = jax.tree.map(lambda a, b: jnp.where(better, a, b), u_f, best_u)
    best_v = jnp.where(better, v_f, best_v)
    return best_u, best_v


def fit_one_start(
    u0: GPParams,
    X: jax.Array,
    y: jax.Array,
    config: GPConfig,
    max_steps: int,
) -> Tuple[GPParams, jax.Array]:
    """Run one LBFGS trajectory from one unconstrained start.

    The composable unit for batching: `fit_gp` vmaps it over restarts;
    parallel.ensemble double-vmaps it over (ensemble, restart) and shards
    both axes over a device mesh. Returns (best_u, best_neg_loglik).
    """
    dtype = y.dtype
    lo, hi = _bounds_arrays(config, dtype)
    data = GPData(X=X, y=y)

    def objective(u):
        # the zoom linesearch probes value_fn at u + t*d with an f64 t under
        # x64, promoting u; pin the compute dtype at the boundary
        u = jax.tree.map(lambda a: a.astype(dtype), u)
        return -log_marginal_likelihood(_u_to_params(u, lo, hi), data, config)

    return _run_lbfgs(u0, objective, max_steps, linesearch=config.linesearch)


def fit_gp_host(
    key: jax.Array,
    data: GPData,
    config: GPConfig,
    n_restarts: int | None = None,
    max_steps: int | None = None,
    m_history: int = 10,
    gtol: float = 1e-5,
) -> FitResult:
    """Host-loop LBFGS for very large N (BASELINE config 4 driver).

    The fully-jitted `fit_gp` compiles the whole optimizer loop (scan +
    linesearch) into one program; at N=16k that graph crashes this
    environment's TPU compile helper. Here only ONE graph compiles — the
    exact value-and-gradient of the log-marginal likelihood (gram + Cholesky
    + solves fwd/bwd, the same shapes bench.py compiles fine) — and the
    two-loop LBFGS recursion + Armijo backtracking run on host in numpy.
    Device work dominates wall-clock, so the host loop costs ~nothing.
    """
    import numpy as np

    R = config.n_restarts if n_restarts is None else n_restarts
    steps = config.max_opt_steps if max_steps is None else max_steps
    dtype = data.y.dtype
    lo, hi = _bounds_arrays(config, dtype)

    import jax.flatten_util

    u0_all = sample_restarts(key, config, R, dtype=dtype)

    def objective(u):
        return -log_marginal_likelihood(_u_to_params(u, lo, hi), data, config)

    single = jax.tree.map(lambda a: a[0], u0_all)
    _, unravel = jax.flatten_util.ravel_pytree(single)
    _vg = jax.jit(jax.value_and_grad(lambda flat: objective(unravel(flat))))

    def vg(x_host: "np.ndarray"):
        return _vg(jnp.asarray(x_host, dtype=dtype))

    def run_one(x0: np.ndarray):
        x = x0.copy()
        f, g = vg(x)
        f, g = float(f), np.asarray(g, dtype=np.float64)
        best_x, best_f = x.copy(), f if np.isfinite(f) else np.inf
        s_hist, y_hist, rho = [], [], []
        for _ in range(steps):
            if not np.isfinite(f) or not np.isfinite(g).all():
                break
            if np.linalg.norm(g) < gtol:
                break
            # two-loop recursion
            q = g.copy()
            alphas = []
            for s, yv, r in zip(reversed(s_hist), reversed(y_hist), reversed(rho)):
                a = r * s.dot(q)
                alphas.append(a)
                q -= a * yv
            if y_hist:
                gamma = s_hist[-1].dot(y_hist[-1]) / y_hist[-1].dot(y_hist[-1])
                q *= gamma
            for s, yv, r, a in zip(s_hist, y_hist, rho, reversed(alphas)):
                b = r * yv.dot(q)
                q += s * (a - b)
            d = -q
            gtd = g.dot(d)
            if gtd >= 0:  # not a descent direction; restart memory
                d, gtd = -g, -g.dot(g)
                s_hist, y_hist, rho = [], [], []
            # Armijo backtracking
            t = 1.0
            for _bt in range(30):
                f_new, g_new = vg(x + t * d)
                f_new = float(f_new)
                if np.isfinite(f_new) and f_new <= f + 1e-4 * t * gtd:
                    break
                t *= 0.5
            else:
                break
            x_new = x + t * d
            g_new = np.asarray(g_new, dtype=np.float64)
            s, yv = x_new - x, g_new - g
            sy = s.dot(yv)
            if sy > 1e-10:
                s_hist.append(s)
                y_hist.append(yv)
                rho.append(1.0 / sy)
                if len(s_hist) > m_history:
                    s_hist.pop(0)
                    y_hist.pop(0)
                    rho.pop(0)
            x, f, g = x_new, f_new, g_new
            if f < best_f:
                best_x, best_f = x.copy(), f
        if f < best_f and np.isfinite(f):
            best_x, best_f = x.copy(), f
        return best_x, best_f

    flats = [
        np.asarray(
            jax.flatten_util.ravel_pytree(jax.tree.map(lambda a: a[i], u0_all))[0],
            dtype=np.float64,
        )
        for i in range(R)
    ]
    results = [run_one(x0) for x0 in flats]
    lls = np.array([-f for _, f in results])
    lls = np.where(np.isfinite(lls), lls, -np.inf)
    best_i = int(np.argmax(lls))
    params_all = [
        _u_to_params(unravel(jnp.asarray(x, dtype=dtype)), lo, hi)
        for x, _ in results
    ]
    stacked = jax.tree.map(lambda *a: jnp.stack(a), *params_all)
    return FitResult(
        params=params_all[best_i],
        log_likelihood=jnp.asarray(lls[best_i], dtype=dtype),
        restart_log_likelihoods=jnp.asarray(lls, dtype=dtype),
        restart_params=stacked,
    )


@functools.partial(
    jax.jit,
    static_argnames=("config", "n_restarts", "max_steps", "restart_chunk"),
)
def fit_gp(
    key: jax.Array,
    data: GPData,
    config: GPConfig,
    n_restarts: int | None = None,
    max_steps: int | None = None,
    restart_chunk: int | None = None,
) -> FitResult:
    """Estimate hyperparameters: the `estimate_thetas` equivalent.

    jit-able end to end; restarts run as one vmapped batch (batched Gram
    builds and Choleskys on the MXU), replacing the reference's pthread pool.

    restart_chunk bounds peak memory for large N: restarts run in sequential
    groups of that size (lax.map over groups, vmap within). At N=16k one
    restart's live set is ~2 N^2 f32 buffers (~2 GB), so restart_chunk=1..4
    keeps a 16 GB chip comfortable (BASELINE config 4).
    """
    R = config.n_restarts if n_restarts is None else n_restarts
    steps = config.max_opt_steps if max_steps is None else max_steps
    dtype = data.y.dtype
    lo, hi = _bounds_arrays(config, dtype)

    u0 = sample_restarts(key, config, R, dtype=dtype)

    def objective(u):
        u = jax.tree.map(lambda a: a.astype(dtype), u)
        return -log_marginal_likelihood(_u_to_params(u, lo, hi), data, config)

    # Rescue dead draws: in f32 a smooth-kernel Gram is only factorable in
    # part of theta space (long length scales -> cond > 1/eps -> -inf and a
    # NaN gradient that kills the whole trajectory). One batched objective
    # eval finds dead starts; they are remapped to stratified moment-matched
    # fallbacks (amp = var(y), short length scales, real nuggets) that
    # factor at working precision. The linesearch then keeps trajectories
    # out of the -inf region on its own (an inf candidate step is rejected).
    v0 = jax.vmap(objective)(u0)
    amp_fb = jnp.clip(
        jnp.var(data.y), config.amp_bounds[0] * 10, config.amp_bounds[1] / 10
    )
    frac = (jnp.arange(R, dtype=dtype) + 0.5) / R
    ls_fb = jnp.exp(
        jnp.log(0.05) + frac * (jnp.log(0.5) - jnp.log(0.05))
    )  # (R,) log-spaced in [0.05, 0.5]
    nug_fb = jnp.exp(jnp.log(1e-4) + frac * (jnp.log(1e-1) - jnp.log(1e-4)))
    fb_params = GPParams(
        log_amp=jnp.full((R,), jnp.log(amp_fb), dtype=dtype),
        log_nugget=jnp.log(nug_fb * amp_fb).astype(dtype),
        log_ls=jnp.tile(
            jnp.log(ls_fb)[:, None], (1, config.num_length_scales)
        ).astype(dtype),
    )
    u_fb = jax.vmap(lambda p: _params_to_u(p, lo, hi))(fb_params)
    alive = jnp.isfinite(v0)
    u0 = jax.tree.map(
        lambda a, b: jnp.where(
            alive.reshape((-1,) + (1,) * (a.ndim - 1)), a, b
        ),
        u0,
        u_fb,
    )

    run = jax.vmap(lambda u: fit_one_start(u, data.X, data.y, config, steps))
    if restart_chunk is None or restart_chunk >= R:
        best_u, best_negll = run(u0)
    else:
        chunk = restart_chunk
        if R % chunk != 0:
            raise ValueError(f"n_restarts={R} not divisible by restart_chunk={chunk}")
        groups = R // chunk
        u0g = jax.tree.map(
            lambda a: a.reshape((groups, chunk) + a.shape[1:]), u0
        )
        best_ug, best_negllg = jax.lax.map(run, u0g)
        best_u = jax.tree.map(
            lambda a: a.reshape((R,) + a.shape[2:]), best_ug
        )
        best_negll = best_negllg.reshape(R)

    best_params_all = jax.vmap(lambda u: _u_to_params(u, lo, hi))(best_u)
    lls = -best_negll  # (R,)
    i = jnp.argmax(jnp.where(jnp.isfinite(lls), lls, -jnp.inf))
    best = jax.tree.map(lambda a: a[i], best_params_all)
    return FitResult(
        params=best,
        log_likelihood=lls[i],
        restart_log_likelihoods=lls,
        restart_params=best_params_all,
    )
