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
    # host-loop drivers (fit_gp_host) attach a wall-clock breakdown here:
    # {n_vg_calls, first_vg_wall_s (compile+run), vg_wall_s (the rest),
    #  n_steps, fit_wall_s} — None on the fully-jitted paths (a dict is
    # not a device value; inside jit this field stays None)
    stats: dict | None = None


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
    noise: jax.Array | None = None,
    h_extra: jax.Array | None = None,
    dY: jax.Array | None = None,
    dY_noise: jax.Array | None = None,
) -> Tuple[GPParams, jax.Array]:
    """Run one LBFGS trajectory from one unconstrained start.

    The composable unit for batching: `fit_gp` vmaps it over restarts;
    parallel.ensemble double-vmaps it over (ensemble, restart) and shards
    both axes over a device mesh. Returns (best_u, best_neg_loglik).
    `noise` is an optional (N,) per-point observation-noise variance
    vector (GPData.noise); `h_extra` optional (N, q) extra GLS basis
    columns (GPData.h_extra); `dY`/`dY_noise` optional (N, d) gradient
    observations (GPData.dY) — EVERY optional GPData field must be
    forwarded here, or the vmapped fit would silently optimize a
    different model than the one served (pinned by
    test_gradients.test_fit_reports_the_joint_likelihood).
    """
    dtype = y.dtype
    lo, hi = _bounds_arrays(config, dtype)
    data = GPData(
        X=X, y=y, noise=noise, h_extra=h_extra, dY=dY, dY_noise=dY_noise
    )

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
    vg_batch: int | None = None,
    lml_fn=None,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 5,
    value_linesearch: bool | None = None,
) -> FitResult:
    """Host-loop LBFGS for very large N (BASELINE config 4 driver).

    The fully-jitted `fit_gp` compiles the whole optimizer loop (scan +
    linesearch) into one program; at N=16k that graph crashes this
    environment's TPU compile helper. Here only ONE graph compiles — the
    exact value-and-gradient of the log-marginal likelihood (gram + Cholesky
    + solves fwd/bwd) vmapped over a (B, ntheta) restart batch — and the
    two-loop LBFGS recursion + Armijo backtracking run on host in numpy,
    vectorized over restarts. All restarts step in lock-step: every device
    call evaluates the whole batch (direction evals and each backtracking
    round are ONE dispatch for all restarts, not R sequential dispatches —
    VERDICT r1 weak #4), with converged/dead restarts masked out of the
    update on host. vg_batch caps how many restarts share one device call
    when R Gram matrices + Cholesky backward temps would not fit HBM
    (at N=16k each restart's live set is a few GB on a 16 GB chip).

    lml_fn overrides the objective: any (params, data, config) -> scalar
    log-likelihood with a JAX-differentiable value (e.g. the matrix-free
    `models.iterative.lml_iterative`, see `fit_gp_iterative`).

    checkpoint_path enables mid-optimization checkpoint/resume (absent
    upstream; for the multi-minute large-N fits): every `checkpoint_every`
    LBFGS steps the full host optimizer state (iterates, gradients, LBFGS
    ring buffers, best-so-far) is written atomically as .npz; a fresh call
    with the same path resumes from the saved step. Delete the file to
    restart from scratch. The state is keyed to (R, P, steps) — a mismatch
    is rejected rather than silently misused.

    value_linesearch runs the Armijo backtracking rounds on a VALUE-ONLY
    compiled objective (no gradient), then evaluates ONE value+grad at the
    accepted points. Config-4 profiling (bench/profile_fit.py) measured
    ~5 backtracking rounds per step with the gradient ~4x the value cost —
    value-only rounds cut the per-step device math ~2x at the price of one
    extra compiled program. None (default) enables it when the run is long
    enough to amortize that compile (steps >= 25).
    """
    import numpy as np

    R = config.n_restarts if n_restarts is None else n_restarts
    steps = config.max_opt_steps if max_steps is None else max_steps
    dtype = data.y.dtype
    lo, hi = _bounds_arrays(config, dtype)
    B = R if vg_batch is None else max(1, min(vg_batch, R))

    import jax.flatten_util

    u0_all = sample_restarts(key, config, R, dtype=dtype)
    if lml_fn is None:
        lml_fn = log_marginal_likelihood

    def objective(u):
        return -lml_fn(_u_to_params(u, lo, hi), data, config)

    single = jax.tree.map(lambda a: a[0], u0_all)
    _, unravel = jax.flatten_util.ravel_pytree(single)
    if B == 1:
        # NO vmap wrapper at batch 1: vmapped while_loop programs are the
        # axon worker's crash family (the R=4 restart-axis crash, and at
        # N=131k even a B=1 vmapped iterative value+grad kills the worker
        # while the unvmapped identical program runs fine — measured).
        _vg_one = jax.jit(
            jax.value_and_grad(lambda flat: objective(unravel(flat)))
        )

        def _vg_batched(batch):
            f, g = _vg_one(batch[0])
            return f[None], g[None]

    else:
        _vg_batched = jax.jit(
            jax.vmap(jax.value_and_grad(lambda flat: objective(unravel(flat))))
        )
    if value_linesearch is None:
        value_linesearch = steps >= 25
    if not value_linesearch:
        _v_batched = None
    elif B == 1:
        _v_one = jax.jit(lambda flat: objective(unravel(flat)))

        def _v_batched(batch):
            return _v_one(batch[0])[None]

    else:
        _v_batched = jax.jit(jax.vmap(lambda flat: objective(unravel(flat))))

    import time as _time

    stats = {
        "n_vg_calls": 0, "first_vg_wall_s": 0.0, "vg_wall_s": 0.0,
        "n_v_calls": 0, "v_wall_s": 0.0,
        "n_steps": 0, "fit_wall_s": 0.0,
    }
    _t_fit0 = _time.perf_counter()

    def vg(X_host: "np.ndarray"):
        """(R, P) -> (R,), (R, P): batched value+grad, chunked to vg_batch."""
        outs_f, outs_g = [], []
        t0 = _time.perf_counter()
        for i in range(0, R, B):
            chunk = X_host[i : i + B]
            pad = B - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, chunk[-1:].repeat(pad, 0)], 0)
            f, g = jax.device_get(_vg_batched(jnp.asarray(chunk, dtype=dtype)))
            f = np.asarray(f, dtype=np.float64)
            g = np.asarray(g, dtype=np.float64)
            outs_f.append(f[: B - pad] if pad else f)
            outs_g.append(g[: B - pad] if pad else g)
        dt = _time.perf_counter() - t0
        if stats["n_vg_calls"] == 0:
            stats["first_vg_wall_s"] = dt  # compile + first run
        else:
            stats["vg_wall_s"] += dt
        stats["n_vg_calls"] += 1
        return np.concatenate(outs_f), np.concatenate(outs_g)

    def v_only(X_host: "np.ndarray"):
        """(R, P) -> (R,): batched objective values, chunked to vg_batch."""
        outs_f = []
        t0 = _time.perf_counter()
        for i in range(0, R, B):
            chunk = X_host[i : i + B]
            pad = B - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, chunk[-1:].repeat(pad, 0)], 0)
            f = np.asarray(
                jax.device_get(_v_batched(jnp.asarray(chunk, dtype=dtype))),
                dtype=np.float64,
            )
            outs_f.append(f[: B - pad] if pad else f)
        stats["v_wall_s"] += _time.perf_counter() - t0
        stats["n_v_calls"] += 1
        return np.concatenate(outs_f)

    P = int(
        jax.flatten_util.ravel_pytree(single)[0].shape[0]
    )

    def _flatten_batch(tree) -> "np.ndarray":
        """(R, ...) pytree -> (R, P) host matrix, row i == ravel_pytree of
        element i (leaf order + per-leaf ravel). ONE host fetch per leaf —
        per-restart ravel_pytree loops cost a device round-trip each, which
        at the axon relay's dispatch floor added ~10 s of pure overhead to
        a 10-step fit (measured, bench/profile_fit.py)."""
        return np.concatenate(
            [
                np.asarray(leaf, dtype=np.float64).reshape(R, -1)
                for leaf in jax.tree.leaves(tree)
            ],
            axis=1,
        )

    X = _flatten_batch(u0_all)  # (R, P)

    F, G = vg(X)
    # Dead-start rescue: draws whose objective OR gradient is non-finite —
    # unfactorable Grams in the dense path, non-converging solves under the
    # iterative lml_fn's feasibility gate — are remapped to stratified
    # moment-matched fallbacks before LBFGS starts, so infeasible init
    # regions cost a redraw, not a lane. The f32-feasible theta region
    # depends on which path evaluates the objective AND on the design
    # density: the dense path dies at LONG length scales (cond(C) > 1/eps,
    # unfactorable), while the iterative path at a dense design (large N,
    # low d) dies at SHORT length scales (the Gram has a wide non-low-rank
    # spectrum no rank-k preconditioner can capture; PCG stalls above the
    # gate — measured at N=32,768 d=4: ls=0.09 leaves rel=2e-2 after 512
    # iterations, while ls~1 converges in ~40). No single fallback window
    # serves both, so the rescue SWEEPS windows from short-ls (dense-path
    # remedy) toward long-ls + heavier nugget (iterative remedy) until the
    # lane revives.
    amp_fb = float(
        np.clip(
            np.var(np.asarray(data.y)),
            config.amp_bounds[0] * 10,
            config.amp_bounds[1] / 10,
        )
    )
    ls_top = float(config.length_scale_bounds[1])
    rescue_windows = [
        (0.05, 0.5, 1e-4, 1e-1),
        (0.2, min(2.0, ls_top * 0.8), 1e-3, 0.3),
        (0.5, ls_top * 0.9, 1e-2, 1.0),
    ]
    for ls_lo_w, ls_hi_w, nug_lo_w, nug_hi_w in rescue_windows:
        dead = ~(np.isfinite(F) & np.isfinite(G).all(axis=1))
        if not dead.any():
            break
        frac = (np.arange(R) + 0.5) / R
        ls_fb = np.exp(np.log(ls_lo_w) + frac * (np.log(ls_hi_w) - np.log(ls_lo_w)))
        nug_fb = np.exp(
            np.log(nug_lo_w) + frac * (np.log(nug_hi_w) - np.log(nug_lo_w))
        )
        fb = GPParams(
            log_amp=jnp.full((R,), np.log(amp_fb), dtype=dtype),
            log_nugget=jnp.asarray(np.log(nug_fb * amp_fb), dtype=dtype),
            log_ls=jnp.asarray(
                np.tile(np.log(ls_fb)[:, None], (1, config.num_length_scales)),
                dtype=dtype,
            ),
        )
        u_fb = jax.vmap(lambda p: _params_to_u(p, lo, hi))(fb)
        X_fb = _flatten_batch(u_fb)
        X = np.where(dead[:, None], X_fb, X)
        F, G = vg(X)
    dead = ~(np.isfinite(F) & np.isfinite(G).all(axis=1))
    if dead.all():
        import logging

        logging.getLogger(__name__).warning(
            "fit_gp_host: ALL %d restarts are infeasible (non-finite "
            "objective or gradient) after %d rescue windows — the optimizer "
            "cannot take a single step and the returned thetas are the last "
            "fallback, NOT a fit. At large N this usually means the CG "
            "budget (cg_tol/cg_max_iters) cannot solve the system anywhere "
            "in the theta box; raise cg_max_iters, the nugget bounds, or "
            "the rank.", R, len(rescue_windows),
        )
    best_X = X.copy()
    best_F = np.where(np.isfinite(F), F, np.inf)
    # per-restart LBFGS memory: (m, R, P) ring buffers + validity counts
    S_h = np.zeros((m_history, R, P))
    Y_h = np.zeros((m_history, R, P))
    RHO = np.zeros((m_history, R))
    hlen = np.zeros(R, dtype=int)  # valid history entries per restart
    active = np.isfinite(F) & np.isfinite(G).all(axis=1)
    step0 = 0

    if checkpoint_path is not None:
        import os

        if os.path.exists(checkpoint_path):
            ck = np.load(checkpoint_path)
            if ck["X"].shape != (R, P):
                raise ValueError(
                    f"checkpoint {checkpoint_path}: saved shape "
                    f"{ck['X'].shape} != expected {(R, P)}"
                )
            # theta shapes are N-independent, so shape alone cannot tell a
            # stale checkpoint from another problem apart — also key on the
            # data size (older checkpoints without the field still load)
            if "n_data" in ck and int(ck["n_data"]) != data.y.shape[0]:
                raise ValueError(
                    f"checkpoint {checkpoint_path}: saved for "
                    f"N={int(ck['n_data'])}, current data has "
                    f"N={data.y.shape[0]} — delete it to start fresh"
                )
            X, F, G = ck["X"], ck["F"], ck["G"]
            S_h, Y_h, RHO = ck["S_h"], ck["Y_h"], ck["RHO"]
            hlen = ck["hlen"]
            active = ck["active"]
            best_X, best_F = ck["best_X"], ck["best_F"]
            step0 = int(ck["step"])

    def _save_checkpoint(step):
        if checkpoint_path is None:
            return
        import os

        tmp = checkpoint_path + ".tmp.npz"
        np.savez(
            tmp.removesuffix(".npz"), X=X, F=F, G=G, S_h=S_h, Y_h=Y_h,
            RHO=RHO, hlen=hlen, active=active, best_X=best_X, best_F=best_F,
            step=step, n_data=data.y.shape[0],
        )
        os.replace(tmp, checkpoint_path)

    _step = step0 - 1
    for _step in range(step0, steps):
        active &= np.linalg.norm(G, axis=1) >= gtol
        if not active.any():
            break
        # vectorized two-loop recursion (history loop is over m <= 10 on
        # host; every op inside is (R, P)-vectorized numpy)
        Q = G.copy()
        alphas = np.zeros((m_history, R))
        for k in range(m_history - 1, -1, -1):
            valid = k < hlen  # (R,)
            a = RHO[k] * np.einsum("rp,rp->r", S_h[k], Q)
            a = np.where(valid, a, 0.0)
            alphas[k] = a
            Q -= a[:, None] * Y_h[k]
        has_hist = hlen > 0
        last = np.maximum(hlen - 1, 0)
        s_last = S_h[last, np.arange(R)]
        y_last = Y_h[last, np.arange(R)]
        gamma = np.einsum("rp,rp->r", s_last, y_last) / np.maximum(
            np.einsum("rp,rp->r", y_last, y_last), 1e-300
        )
        Q *= np.where(has_hist, gamma, 1.0)[:, None]
        for k in range(m_history):
            valid = k < hlen
            b = RHO[k] * np.einsum("rp,rp->r", Y_h[k], Q)
            corr = (alphas[k] - np.where(valid, b, 0.0))[:, None] * S_h[k]
            Q += np.where(valid[:, None], corr, 0.0)
        D = -Q
        GTD = np.einsum("rp,rp->r", G, D)
        # non-descent directions: restart that lane's memory, use -G
        bad = GTD >= 0
        if bad.any():
            D[bad] = -G[bad]
            GTD[bad] = -np.einsum("rp,rp->r", G[bad], G[bad])
            hlen[bad] = 0
        # lock-step Armijo backtracking: one batched eval per round. Lanes
        # with no LBFGS history yet (first step / after a direction reset)
        # take a gradient-normalized first trial — a raw -G step at large
        # ||G|| wastes ~5 halving rounds before anything accepts (measured,
        # bench/profile_fit.py).
        t = np.where(
            hlen > 0,
            1.0,
            np.minimum(1.0, 1.0 / np.maximum(np.linalg.norm(D, axis=1), 1e-30)),
        )
        accepted = ~active  # inactive lanes are "done" immediately
        F_new, G_new = F.copy(), G.copy()
        X_cand = X.copy()
        for _bt in range(30):
            trial = np.where(
                accepted[:, None], X_cand, X + t[:, None] * D
            )
            if value_linesearch:
                f_t = v_only(trial)
                g_t = None
            else:
                f_t, g_t = vg(trial)
            ok = (
                np.isfinite(f_t)
                & (f_t <= F + 1e-4 * t * GTD)
                & ~accepted
            )
            X_cand = np.where(ok[:, None], trial, X_cand)
            F_new = np.where(ok, f_t, F_new)
            if g_t is not None:
                G_new = np.where(ok[:, None], g_t, G_new)
            accepted |= ok
            t = np.where(accepted, t, t * 0.5)
            if accepted.all():
                break
        if value_linesearch and (accepted & active).any():
            # ONE value+grad at the accepted points (value-only rounds have
            # no gradient); lanes that never accepted keep their old state
            f_full, g_full = vg(X_cand)
            took_ls = accepted & active & np.isfinite(f_full)
            F_new = np.where(took_ls, f_full, F_new)
            G_new = np.where(took_ls[:, None], g_full, G_new)
        # lanes whose linesearch never accepted go inactive (keep their
        # current x/f as final)
        active &= accepted
        stepped = active
        S = X_cand - X
        Yv = G_new - G
        SY = np.einsum("rp,rp->r", S, Yv)
        keep = stepped & (SY > 1e-10)
        # append to per-restart ring buffers (shift when full)
        for r in np.nonzero(keep)[0]:
            if hlen[r] == m_history:
                S_h[:-1, r] = S_h[1:, r]
                Y_h[:-1, r] = Y_h[1:, r]
                RHO[:-1, r] = RHO[1:, r]
                hlen[r] -= 1
            S_h[hlen[r], r] = S[r]
            Y_h[hlen[r], r] = Yv[r]
            RHO[hlen[r], r] = 1.0 / SY[r]
            hlen[r] += 1
        X = np.where(stepped[:, None], X_cand, X)
        F = np.where(stepped, F_new, F)
        G = np.where(stepped[:, None], G_new, G)
        better = stepped & np.isfinite(F) & (F < best_F)
        best_X = np.where(better[:, None], X, best_X)
        best_F = np.where(better, F, best_F)
        if checkpoint_path is not None and (_step + 1) % checkpoint_every == 0:
            _save_checkpoint(_step + 1)

    lls = np.where(np.isfinite(best_F), -best_F, -np.inf)
    best_i = int(np.argmax(lls))
    # ONE batched device call for the whole u -> params transform (the
    # per-restart unravel loop paid a dispatch round-trip per restart)
    stacked = jax.vmap(lambda flat: _u_to_params(unravel(flat), lo, hi))(
        jnp.asarray(best_X, dtype=dtype)
    )
    params_best = jax.tree.map(lambda a: a[best_i], stacked)
    stats["n_steps"] = _step + 1 - step0
    stats["fit_wall_s"] = _time.perf_counter() - _t_fit0
    return FitResult(
        params=params_best,
        log_likelihood=jnp.asarray(lls[best_i], dtype=dtype),
        restart_log_likelihoods=jnp.asarray(lls, dtype=dtype),
        restart_params=stacked,
        stats=stats,
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

    run = jax.vmap(
        lambda u: fit_one_start(u, data.X, data.y, config, steps,
                                noise=data.noise, h_extra=data.h_extra,
                                dY=data.dY, dY_noise=data.dY_noise)
    )
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


class AlphaFitResult(NamedTuple):
    """Result of the power-exponent profile search (fit_gp_alpha)."""

    result: FitResult  # the winning alpha's full fit
    alpha: float  # the winning exponent
    alphas: Tuple[float, ...]  # every exponent evaluated (grid + refinement)
    alpha_log_likelihoods: Tuple[float, ...]  # best LML per evaluated alpha


# Valid exponent range for the power-exponential kernel: alpha in (0, 2].
# 2.0 (Gaussian) is attainable; below ~0.1 the kernel is so rough that the
# Gram matrix is numerically diagonal and the profile LML flat — treat it
# as the search floor rather than chase it.
_ALPHA_MIN, _ALPHA_MAX = 0.1, 2.0


def _golden_refine_alpha(eval_fn, evals: dict, best_alpha: float, iters: int):
    """Continuous refinement of the profile-likelihood winner.

    Golden-section search MAXIMIZING eval_fn over the bracket formed by the
    winning grid point's neighbors (the profile LML over alpha is smooth and
    locally unimodal around a grid winner even though it is globally
    ridge-shaped jointly with the length scales — which is why the OUTER
    search is a grid, see fit_gp_alpha). Each probe is one full multi-restart
    fit; results land in `evals` (alpha -> best LML). Returns the best alpha
    after refinement.
    """
    import math as _math

    grid = sorted(evals)
    i = grid.index(best_alpha)
    lo = grid[i - 1] if i > 0 else max(_ALPHA_MIN, best_alpha - (grid[1] - grid[0] if len(grid) > 1 else 0.3))
    hi = grid[i + 1] if i + 1 < len(grid) else min(_ALPHA_MAX, best_alpha + (grid[-1] - grid[-2] if len(grid) > 1 else 0.3))
    if hi - lo < 1e-6:
        return best_alpha
    g = (_math.sqrt(5.0) - 1.0) / 2.0

    def probe(a):
        a = round(float(a), 6)
        if a not in evals:
            evals[a] = eval_fn(a)
        return evals[a]

    x1 = hi - g * (hi - lo)
    x2 = lo + g * (hi - lo)
    f1, f2 = probe(x1), probe(x2)
    for _ in range(max(0, iters - 2)):
        if f1 < f2:  # maximum is in [x1, hi]
            lo, x1, f1 = x1, x2, f2
            x2 = lo + g * (hi - lo)
            f2 = probe(x2)
        else:  # maximum is in [lo, x2]
            hi, x2, f2 = x2, x1, f1
            x1 = hi - g * (hi - lo)
            f1 = probe(x1)
    finite = {a: v for a, v in evals.items() if _math.isfinite(v)}
    return max(finite, key=finite.get) if finite else best_alpha


def fit_gp_alpha(
    key: jax.Array,
    data: GPData,
    config: GPConfig,
    alphas: Tuple[float, ...] = (1.2, 1.5, 1.8, 2.0),
    refine_iters: int = 0,
    **fit_kwargs,
) -> AlphaFitResult:
    """Fit with a TRAINABLE power-exponential exponent via profile
    likelihood over a grid (widen-past-reference: the upstream pins alpha
    fixed, SURVEY.md §2 [B]).

    alpha is notoriously weakly identified jointly with the length scales
    (the likelihood surface is ridge-shaped in (alpha, ell)), so a smooth
    joint optimization adds a near-flat direction to every restart; the
    profile approach instead runs the full multi-restart fit per grid
    point and keeps the best — each alpha is a static config (a separate
    compiled program), which also keeps the alpha != 2 distance path's
    chunked kernel (ops/kernels._abs_power_dist) intact. The same PRNG
    key is reused per grid point so grid points differ only in alpha.

    refine_iters > 0 continues with that many golden-section probes of the
    CONTINUOUS profile likelihood inside the winning grid point's bracket
    (each probe is one full multi-restart fit), so alpha is trainable to
    arbitrary resolution, not just to the grid.

    Only meaningful for CovarianceFamily.POWER_EXPONENTIAL (raises
    otherwise). fit_kwargs forward to fit_gp (n_restarts, max_steps,
    restart_chunk).
    """
    import dataclasses

    from madaiemulator_tpu.utils.config import CovarianceFamily

    if config.covariance is not CovarianceFamily.POWER_EXPONENTIAL:
        raise ValueError(
            "fit_gp_alpha applies to the power-exponential family only; "
            f"got {config.covariance}"
        )
    import math as _math

    results: dict = {}

    def eval_alpha(a: float) -> float:
        cfg_a = dataclasses.replace(config, power_exp_alpha=float(a))
        res = fit_gp(key, data, cfg_a, **fit_kwargs)
        results[round(float(a), 6)] = res
        return float(res.log_likelihood)

    evals: dict = {}
    best_alpha, best_ll = None, -_math.inf
    for a in alphas:
        a = round(float(a), 6)
        evals[a] = eval_alpha(a)
        if best_alpha is None or (
            _math.isfinite(evals[a]) and evals[a] > best_ll
        ):
            best_alpha, best_ll = a, evals[a]
    if refine_iters > 0 and _math.isfinite(best_ll):
        best_alpha = _golden_refine_alpha(
            eval_alpha, evals, best_alpha, refine_iters
        )
    order = sorted(evals)
    return AlphaFitResult(
        result=results[best_alpha],
        alpha=best_alpha,
        alphas=tuple(order),
        alpha_log_likelihoods=tuple(evals[a] for a in order),
    )
