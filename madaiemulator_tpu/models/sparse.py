"""Sparse variational GP regression (SGPR): one-chip training past the
exact-GP envelope.

The dense path factors an (N, N) Gram — the measured one-chip limit is
N=65,536 end-to-end (docs/ROUND3.md); the matrix-free PCG path stretches
components to N~131k but every likelihood evaluation still touches all
N^2 kernel entries. SGPR (Titsias 2009, collapsed variational bound)
replaces the Gram with an m-point inducing summary: every ELBO
evaluation is ONE (m, N) cross-kernel + one (m, N)x(N, m) GEMM — O(N m^2)
FLOPs that tile perfectly onto the MXU — plus O(m^3) factorizations of
m x m matrices. At N=1e6, m=1024 the dominant operand is a 4 GB f32
cross-kernel: a single 16 GB chip trains N = ONE MILLION points directly,
15x past the exact envelope. The reference (SURVEY.md §2; mount empty)
has no approximate-inference capability at all — its N ceiling is its
dense Cholesky.

Model: the SAME universal-kriging GP the rest of the framework serves
(polynomial GLS trend, stationary kernel, nugget + optional per-point
noise), approximated with inducing points Z (m, d):

    ELBO = log N(y | H beta, Q_nn + D) - 1/2 sum_i (k_ii - q_ii) / D_i
    Q_nn = K_nm K_mm^-1 K_mn ,   D = diag(nugget + noise_i)

beta is GLS-profiled under Q_nn + D exactly as the dense path profiles it
under K_nn + D (models/gp.py _lml_value); config.reml adds the same
-1/2 log|H^T Sigma^-1 H| envelope. All Sigma^-1 products use the Woodbury
identity through two small Choleskys (Lm of K_mm, LB of I + A A^T with
A = Lm^-1 K_mn D^-1/2) — nothing (N, N) is ever materialized.

Serving needs NO training-set arrays: SGPRServeState is O(m^2 + m p)
(inducing factorizations + GLS operators), so a trained N=1M emulator
serves from a few MB. The predictive variance includes the same
GLS trend-estimation correction as the dense path (the ||LA^-1 g||^2
term), with the model cross-covariance Q_*n in place of K_*n.

TPU notes: the ELBO is plain-autodiff differentiable (the Choleskys are
m x m — backward through them is cheap; no closed-form VJP needed), jits
end-to-end, and vmaps over restarts and PCA components exactly like the
dense fit. Inducing locations come from the in-graph greedy-maximin
selector (models/design.py) and can optionally be refined jointly with
the hyperparameters by Adam on the ELBO (`inducing_opt_steps`).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from madaiemulator_tpu.models.fit import (
    _bounds_arrays,
    _run_lbfgs,
    _u_to_params,
    sample_restarts,
)
from madaiemulator_tpu.models.gp import (
    GPData,
    regression_basis,
    regression_basis_grad,
)
from madaiemulator_tpu.ops import kernels, linalg
from madaiemulator_tpu.ops.kernels import GPParams
from madaiemulator_tpu.utils.config import GPConfig


class SGPRServeState(NamedTuple):
    """Serve-time distillate of an SGPR fit — O(m^2), no N-sized arrays.

    mean(x*) = h(x*) beta + v2^T c,  v1 = Lm^-1 k_m(x*), v2 = LB^-1 v1
    var(x*)  = k** - ||v1||^2 + ||v2||^2 + ||LA^-1 (h - E^T v1)||^2
    """

    Z: jax.Array      # (m, d) inducing points, scaled design space
    Lm: jax.Array     # (m, m) chol(K_mm + jitter I)
    LB: jax.Array     # (m, m) chol(I + A A^T)
    c: jax.Array      # (m,)  = LB^-1 A D^-1/2 (y - H beta)
    beta: jax.Array   # (p,)  GLS trend coefficients
    LA: jax.Array     # (p, p) chol(H^T Sigma^-1 H)
    E: jax.Array      # (m, p) = A D^1/2 Sigma^-1 H  (GLS variance operator)
    ok: jax.Array     # scalar bool: all three factorizations succeeded


class SGPRFitResult(NamedTuple):
    params: GPParams          # best-of-restarts hyperparameters (log space)
    Z: jax.Array              # (m, d) inducing points actually used
    elbo: jax.Array           # its ELBO value
    restart_elbos: jax.Array  # (R,)
    state: SGPRServeState     # ready-to-serve distillate


def is_sparse(emu) -> bool:
    """True iff `emu` is a sparse (SGPR) container — the single isinstance
    helper every dispatch site shares (CLI, calibrate, design)."""
    return isinstance(emu, SparseMultivariateEmulator)


def _mm_jitter(dtype) -> float:
    # K_mm has no nugget; a small relative jitter keeps the m x m
    # factorization SPD at working precision (standard SGPR practice).
    return 1e-6 if dtype == jnp.float64 else 1e-5


class _SGPRSystem(NamedTuple):
    """N-free distillate of the whole SGPR linear algebra.

    Every quantity the ELBO and the serve state need reduces to
    block-accumulable summaries of the whitened operands
    A = Lm^-1 K_mn D^-1/2, H_w = D^-1/2 H, y_w = D^-1/2 y:

        B    = I + A A^T                 (m, m)
        G_AH = A H_w                     (m, p)
        g_Ay = A y_w                     (m,)
        S_HH = H_w^T H_w,  S_Hy = H_w^T y_w,  S_yy = y_w^T y_w
        tr_AA = ||A||_F^2,  sum_logD,  sum_ampD = sum_i amp / D_i

    from which (Woodbury throughout, LB = chol(B)):
        H^T Sigma^-1 H = S_HH - G_AH^T B^-1 G_AH        -> LA, beta
        quad = r^T Sigma^-1 r  (expanded in beta)
        logdet Sigma = 2 sum log diag LB + sum_logD
        trace corr   = sum_ampD - tr_AA
        c = LB^-1 (g_Ay - G_AH beta),   E = B^-1 G_AH

    so the N axis can be streamed in fixed-size chunks (row_chunk) with
    jax.checkpoint rematerializing each chunk's cross-kernel in the
    backward pass — live memory is O(m * row_chunk), flat in N. The
    one-shot path (row_chunk=None) computes the same summaries with a
    single (m, N) operand.
    """

    Lm: jax.Array
    LB: jax.Array
    LA: jax.Array
    beta: jax.Array
    c: jax.Array
    E: jax.Array
    quad: jax.Array
    logdet: jax.Array
    trace: jax.Array
    ok: jax.Array


def _sgpr_system(
    params: GPParams,
    data: GPData,
    config: GPConfig,
    Z: jax.Array,
    row_chunk: Optional[int] = None,
) -> _SGPRSystem:
    X, y = data.X, data.y
    n = X.shape[0]
    d = X.shape[1]
    dtype = y.dtype
    HI = jax.lax.Precision.HIGHEST
    amp = jnp.exp(params.log_amp)
    m = Z.shape[0]
    has_grad = data.dY is not None
    if has_grad and data.h_extra is not None:
        raise ValueError(
            "h_extra and dY cannot be combined (same rule as the dense "
            "path: the extra regression columns have no derivative rows)"
        )
    Kmm = kernels.cross_covariance(Z, Z, params, config)
    Kmm = 0.5 * (Kmm + Kmm.T) + (
        _mm_jitter(dtype) * amp
    ) * jnp.eye(m, dtype=dtype)
    Lm = linalg.xla_cholesky(Kmm)
    ok = linalg.chol_ok(Lm)
    Lm = jnp.where(ok, Lm, jnp.eye(m, dtype=dtype))
    D = jnp.exp(params.log_nugget) + (
        data.noise.astype(dtype) if data.noise is not None
        else jnp.zeros((n,), dtype)
    )
    rsD = jax.lax.rsqrt(D)
    # D-dependent scalars never need padding games: they are O(n) cheap
    sum_logD = jnp.sum(jnp.log(D))
    sum_kD = jnp.sum(amp / D)
    if has_grad:
        # Gradient observations join the likelihood as extra rows whose
        # cross-covariance to the inducing VALUES is the derivative
        # kernel (ops/kernels.joint_cross) — the inducing set stays m
        # value points, so the serve state's shape and the snapshot
        # grammar are untouched. Gradient rows carry the same RELATIVE
        # noise floor as the dense joint Gram (gram_joint): the nugget
        # expressed in gradient units, nugget * c_g / ell_a^2, plus any
        # known per-partial noise. Prior diag of a gradient row is
        # amp * c_g / ell_a^2 (grad_prior_scale), which feeds the
        # Titsias trace term.
        cg = jnp.asarray(kernels.grad_prior_scale(config), dtype)
        ell = kernels._ell_vec(params, config, d)
        grad_unit = cg / (ell * ell)  # (d,)
        Dg = jnp.exp(params.log_nugget) * grad_unit[None, :] + (
            data.dY_noise.astype(dtype) if data.dY_noise is not None
            else jnp.zeros((n, d), dtype)
        )  # (n, d)
        rsDg = jax.lax.rsqrt(Dg)
        sum_logD = sum_logD + jnp.sum(jnp.log(Dg))
        sum_kD = sum_kD + jnp.sum((amp * grad_unit)[None, :] / Dg)
    p = 1 + config.regression_order * X.shape[1]
    if data.h_extra is not None:
        p = p + data.h_extra.shape[1]

    def block_summaries(Xb, yb, rsDb, hb, dYb=None, rsDgb=None):
        if dYb is None:
            Kb = kernels.cross_covariance(Z, Xb, params, config)  # (m, cb)
            Hb = regression_basis(Xb, config.regression_order)
            if hb is not None:
                Hb = jnp.concatenate([Hb, hb.astype(dtype)], axis=1)
            rsJ, yJ = rsDb, yb
        else:
            cb = Xb.shape[0]
            # (m, cb(1+d)): value columns then gradient columns in the
            # (point, dim) row-major order of dY.reshape(-1)
            Kb = kernels.joint_cross(
                Z, Xb, params, config, grad_cols=True
            )
            Hb = jnp.concatenate([
                regression_basis(Xb, config.regression_order),
                regression_basis_grad(Xb, config.regression_order),
            ], axis=0)
            rsJ = jnp.concatenate([rsDb, rsDgb.reshape(cb * d)])
            yJ = jnp.concatenate([yb, dYb.reshape(cb * d)])
        Ab = linalg.solve_lower(Lm, Kb) * rsJ[None, :]
        Hw = rsJ[:, None] * Hb
        yw = rsJ * yJ
        dot = lambda a, b: jnp.dot(a, b, preferred_element_type=dtype,
                                   precision=HI)
        return (
            dot(Ab, Ab.T),            # -> B - I
            dot(Ab, Hw),              # -> G_AH
            dot(Ab, yw),              # -> g_Ay
            dot(Hw.T, Hw),            # -> S_HH
            dot(Hw.T, yw),            # -> S_Hy
            jnp.dot(yw, yw, precision=HI),
            jnp.sum(Ab * Ab),         # -> tr_AA
        )

    if row_chunk is None or n <= row_chunk:
        he = data.h_extra
        AAT, G_AH, g_Ay, S_HH, S_Hy, S_yy, tr_AA = block_summaries(
            X, y, rsD, he,
            data.dY.astype(dtype) if has_grad else None,
            rsDg if has_grad else None,
        )
    else:
        # pad with rsD = 0 rows: whitened operands vanish, so every
        # summary is unchanged (the D-scalars above used the real D)
        pad = (-n) % row_chunk
        Xp = jnp.concatenate([X, jnp.zeros((pad, X.shape[1]), dtype)])
        yp = jnp.concatenate([y, jnp.zeros((pad,), dtype)])
        rp = jnp.concatenate([rsD, jnp.zeros((pad,), dtype)])
        blocks = n // row_chunk + (1 if pad else 0)
        Xg = Xp.reshape(blocks, row_chunk, X.shape[1])
        yg = yp.reshape(blocks, row_chunk)
        rg = rp.reshape(blocks, row_chunk)
        if data.h_extra is not None:
            hp = jnp.concatenate([
                data.h_extra.astype(dtype),
                jnp.zeros((pad, data.h_extra.shape[1]), dtype),
            ])
            hg = hp.reshape(blocks, row_chunk, -1)
        else:
            hg = None
        if has_grad:
            dYp = jnp.concatenate([
                data.dY.astype(dtype), jnp.zeros((pad, d), dtype)
            ])
            rgp = jnp.concatenate([rsDg, jnp.zeros((pad, d), dtype)])
            dYg = dYp.reshape(blocks, row_chunk, d)
            rgg = rgp.reshape(blocks, row_chunk, d)
        else:
            dYg = rgg = None

        @jax.checkpoint
        def body_fn(carry, blk):
            it = iter(blk)
            Xb, yb, rb = next(it), next(it), next(it)
            hb = next(it) if hg is not None else None
            dYb = next(it) if dYg is not None else None
            rgb = next(it) if rgg is not None else None
            parts = block_summaries(Xb, yb, rb, hb, dYb, rgb)
            return tuple(ca + pa for ca, pa in zip(carry, parts)), None

        init = (
            jnp.zeros((m, m), dtype), jnp.zeros((m, p), dtype),
            jnp.zeros((m,), dtype), jnp.zeros((p, p), dtype),
            jnp.zeros((p,), dtype), jnp.zeros((), dtype),
            jnp.zeros((), dtype),
        )
        xs = [Xg, yg, rg]
        if hg is not None:
            xs.append(hg)
        if dYg is not None:
            xs.extend([dYg, rgg])
        (AAT, G_AH, g_Ay, S_HH, S_Hy, S_yy, tr_AA), _ = jax.lax.scan(
            body_fn, init, tuple(xs)
        )

    B = jnp.eye(m, dtype=dtype) + 0.5 * (AAT + AAT.T)
    LB = linalg.xla_cholesky(B)
    ok = jnp.logical_and(ok, linalg.chol_ok(LB))
    LB = jnp.where(ok, LB, jnp.eye(m, dtype=dtype))
    # H^T Sigma^-1 H and friends via Woodbury on the summaries
    T_H = linalg.cho_solve(LB, G_AH)          # B^-1 G_AH  (m, p) — also E
    t_y = linalg.cho_solve(LB, g_Ay)          # B^-1 g_Ay  (m,)
    HSH = S_HH - jnp.dot(G_AH.T, T_H, preferred_element_type=dtype,
                         precision=HI)
    HSy = S_Hy - jnp.dot(G_AH.T, t_y, precision=HI)
    ySy = S_yy - jnp.dot(g_Ay, t_y, precision=HI)
    HSH = 0.5 * (HSH + HSH.T)
    LA = linalg.xla_cholesky(HSH)
    ok = jnp.logical_and(ok, linalg.chol_ok(LA))
    LA = jnp.where(ok, LA, jnp.eye(p, dtype=dtype))
    beta = linalg.cho_solve(LA, HSy)
    quad = ySy - 2.0 * jnp.dot(beta, HSy, precision=HI) + jnp.dot(
        beta, jnp.dot(HSH, beta, precision=HI), precision=HI
    )
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(LB))) + sum_logD
    trace = sum_kD - tr_AA
    c = linalg.solve_lower(LB, g_Ay - jnp.dot(G_AH, beta, precision=HI))
    return _SGPRSystem(Lm=Lm, LB=LB, LA=LA, beta=beta, c=c, E=T_H,
                       quad=quad, logdet=logdet, trace=trace, ok=ok)


def elbo(
    params: GPParams,
    data: GPData,
    config: GPConfig,
    Z: jax.Array,
    row_chunk: Optional[int] = None,
) -> jax.Array:
    """Collapsed SGPR evidence lower bound with GLS-profiled trend.

    -inf when any factorization fails (the fit treats it like the dense
    path treats a non-SPD Gram). Plain autodiff gives exact gradients in
    (params, Z) — every Cholesky is m x m or p x p. row_chunk streams the
    N axis in fixed-size chunks (jax.checkpoint per chunk): live memory
    O(m * row_chunk), flat in N — the million-point path.
    """
    sys = _sgpr_system(params, data, config, Z, row_chunk=row_chunk)
    n = data.y.shape[0]
    if data.dY is not None:
        n = n * (1 + data.X.shape[1])  # joint value+gradient rows
    ll = (
        -0.5 * sys.quad - 0.5 * sys.logdet
        - 0.5 * n * math.log(2.0 * math.pi) - 0.5 * sys.trace
    )
    if config.reml:
        ll = ll - 0.5 * linalg.logdet_from_chol(sys.LA)
    neg_inf = jnp.asarray(-jnp.inf, dtype=ll.dtype)
    ll = jnp.where(jnp.isfinite(ll), ll, neg_inf)
    return jnp.where(sys.ok, ll, neg_inf)


def sgpr_precompute(
    params: GPParams,
    data: GPData,
    config: GPConfig,
    Z: jax.Array,
    row_chunk: Optional[int] = None,
) -> SGPRServeState:
    """Build the O(m^2) serve state (training arrays are NOT retained)."""
    sys = _sgpr_system(params, data, config, Z, row_chunk=row_chunk)
    return SGPRServeState(Z=Z, Lm=sys.Lm, LB=sys.LB, c=sys.c,
                          beta=sys.beta, LA=sys.LA, E=sys.E, ok=sys.ok)


def predict_sgpr(
    state: SGPRServeState,
    params: GPParams,
    config: GPConfig,
    Xs: jax.Array,
    hs_extra: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Posterior mean/variance at SCALED queries (s, d) -> ((s,), (s,)).

    Pure O(s m) work per query batch — the million training points are
    folded into the state. Variance = Titsias posterior variance + the
    GLS trend-estimation correction (same structure as the dense
    predict_from_precomputed)."""
    Hs = regression_basis(Xs, config.regression_order)
    if hs_extra is not None:
        Hs = jnp.concatenate([Hs, hs_extra.astype(Hs.dtype)], axis=1)
    Ksm = kernels.cross_covariance(state.Z, Xs, params, config)  # (m, s)
    v1 = linalg.solve_lower(state.Lm, Ksm)
    v2 = linalg.solve_lower(state.LB, v1)
    hi = jax.lax.Precision.HIGHEST
    # precision pinned (models/gp._factor note): batched lowering makes
    # DEFAULT dots bf16 on the MXU
    mean = jnp.dot(Hs, state.beta, precision=hi) + jnp.dot(
        v2.T, state.c, precision=hi
    )
    kss = kernels.kdiag(Xs, params, config)
    var = kss - jnp.sum(v1 * v1, axis=0) + jnp.sum(v2 * v2, axis=0)
    G = Hs.T - jnp.dot(state.E.T, v1, precision=hi)  # (p, s)
    W = linalg.solve_lower(state.LA, G)
    var = var + jnp.sum(W * W, axis=0)
    return mean, jnp.maximum(var, 0.0)


def select_inducing(X: jax.Array, m: int) -> jax.Array:
    """Greedy maximin inducing subset of the (scaled) design — in-graph,
    deterministic (models/design.py selector with uniform weights)."""
    from madaiemulator_tpu.models.design import _greedy_maximin

    if m >= X.shape[0]:
        return X
    idx, _ = _greedy_maximin(
        X, jnp.ones((X.shape[0],), X.dtype), m
    )
    return X[idx]


def fit_sgpr(
    key: jax.Array,
    data: GPData,
    config: GPConfig,
    inducing: int | jax.Array = 512,
    n_restarts: int | None = None,
    max_steps: int | None = None,
    inducing_opt_steps: int = 0,
    inducing_lr: float = 1e-2,
    restart_chunk: int | None = None,
    row_chunk: int | None = None,
) -> SGPRFitResult:
    """Sparse fit: vmapped multi-restart LBFGS on the ELBO.

    inducing: either m (greedy-maximin subset of the design) or an
    explicit (m, d) scaled array. inducing_opt_steps > 0 appends a joint
    Adam refinement of (hyperparameters, Z) on the ELBO — inducing
    locations are continuous parameters here, something the dense path
    has no analogue of. restart_chunk bounds peak memory like
    models/fit.fit_gp: one restart's live set is dominated by the (m, N)
    whitened cross-kernel (~2 GB at N=1e6, m=512 f32), so chunking keeps
    million-point fits on a 16 GB chip. row_chunk streams the N axis in
    fixed-size chunks inside every ELBO evaluation (jax.checkpoint remat
    per chunk — see _SGPRSystem): live memory O(m * row_chunk), flat in
    N. At N=1e6 use row_chunk=65536 and restart_chunk=1.

    jit-able end to end; restarts vmap exactly like models/fit.fit_gp
    (same bounded reparameterization, same dead-start semantics via -inf).
    """
    R = config.n_restarts if n_restarts is None else n_restarts
    steps = config.max_opt_steps if max_steps is None else max_steps
    dtype = data.y.dtype
    Z = (
        select_inducing(data.X, int(inducing))
        if isinstance(inducing, int)
        else jnp.asarray(inducing, dtype)
    )
    lo, hi = _bounds_arrays(config, dtype)
    u0 = sample_restarts(key, config, R, dtype=dtype)

    def objective(u):
        u = jax.tree.map(lambda a: a.astype(dtype), u)
        return -elbo(_u_to_params(u, lo, hi), data, config, Z,
                     row_chunk=row_chunk)

    def one(u):
        return _run_lbfgs(u, objective, steps, linesearch=config.linesearch)

    run = jax.vmap(one)
    if restart_chunk is None or restart_chunk >= R:
        best_u, best_neg = run(u0)
    else:
        if R % restart_chunk != 0:
            raise ValueError(
                f"n_restarts={R} not divisible by restart_chunk="
                f"{restart_chunk}"
            )
        groups = R // restart_chunk
        u0g = jax.tree.map(
            lambda a: a.reshape((groups, restart_chunk) + a.shape[1:]), u0
        )
        best_ug, best_negg = jax.lax.map(run, u0g)
        best_u = jax.tree.map(
            lambda a: a.reshape((R,) + a.shape[2:]), best_ug
        )
        best_neg = best_negg.reshape(R)
    elbos = -best_neg
    i = jnp.argmax(jnp.where(jnp.isfinite(elbos), elbos, -jnp.inf))
    u_best = jax.tree.map(lambda a: a[i], best_u)

    if inducing_opt_steps > 0:
        opt = optax.adam(inducing_lr)

        def joint_obj(carry):
            u, Zc = carry
            u = jax.tree.map(lambda a: a.astype(dtype), u)
            return -elbo(_u_to_params(u, lo, hi), data, config, Zc,
                         row_chunk=row_chunk)

        st0 = opt.init((u_best, Z))

        def step(carry, _):
            (u, Zc), st, bu, bZ, bv = carry
            v, g = jax.value_and_grad(joint_obj)((u, Zc))
            better = jnp.isfinite(v) & (v < bv)
            bu = jax.tree.map(lambda a, b: jnp.where(better, a, b), u, bu)
            bZ = jnp.where(better, Zc, bZ)
            bv = jnp.where(better, v, bv)
            up, st = opt.update(g, st)
            u, Zc = optax.apply_updates((u, Zc), up)
            return ((u, Zc), st, bu, bZ, bv), None

        big = jnp.asarray(jnp.inf, dtype)
        (_, _, u_best, Z, neg_best), _ = jax.lax.scan(
            step, ((u_best, Z), st0, u_best, Z, big), None,
            length=inducing_opt_steps,
        )
        best_elbo = -neg_best
    else:
        best_elbo = elbos[i]

    params = _u_to_params(
        jax.tree.map(lambda a: a.astype(dtype), u_best), lo, hi
    )
    state = sgpr_precompute(params, data, config, Z, row_chunk=row_chunk)
    return SGPRFitResult(
        params=params, Z=Z, elbo=best_elbo, restart_elbos=elbos, state=state
    )


def fit_sgpr_host(
    key: jax.Array,
    data: GPData,
    config: GPConfig,
    inducing: int | jax.Array = 512,
    n_restarts: int | None = None,
    max_steps: int | None = None,
    row_chunk: int | None = None,
    **host_kwargs,
) -> SGPRFitResult:
    """Host-loop sparse fit for the million-point scale.

    The fully-jitted `fit_sgpr` compiles the whole LBFGS loop into one
    program; on the axon environment big whole-loop graphs are a
    documented TPU-worker crash family (ROADMAP "environment issues" —
    the dense path hit the same wall and grew `fit_gp_host`). Here only
    the streamed ELBO value+grad compiles; the LBFGS recursion,
    backtracking, dead-start rescue, checkpoint/resume, and vg_batch
    memory capping all come from models/fit.fit_gp_host (host_kwargs
    forward to it — vg_batch=1 is the right setting at N ~ 1e6).
    """
    from madaiemulator_tpu.models.fit import fit_gp_host

    dtype = data.y.dtype
    Z = (
        select_inducing(data.X, int(inducing))
        if isinstance(inducing, int)
        else jnp.asarray(inducing, dtype)
    )

    def lml_fn(p, d, c):
        return elbo(p, d, c, Z, row_chunk=row_chunk)

    res = fit_gp_host(
        key, data, config, n_restarts=n_restarts, max_steps=max_steps,
        lml_fn=lml_fn, **host_kwargs,
    )
    state = sgpr_precompute(res.params, data, config, Z,
                            row_chunk=row_chunk)
    return SGPRFitResult(
        params=res.params, Z=Z, elbo=res.log_likelihood,
        restart_elbos=res.restart_log_likelihoods, state=state,
    )


# --- multivariate (PCA) sparse emulator -------------------------------------


class SparseMultivariateEmulator(NamedTuple):
    """PCA multivariate emulator with per-component SGPR posteriors.

    The structural twin of MultivariateEmulator at the million-point
    scale: same PCA container, same reconstruction, but each PC score is
    a sparse GP whose serve state is O(m^2) — the emulator keeps NO
    training-set arrays at all (design, targets, noise are folded into
    the states at fit time). Z (the inducing set) is shared across
    components; hyperparameters are per-component.
    """

    scaling: "DesignScaling"          # design scaling (raw -> [0,1]^d)
    pca: "PCAState"
    Z: jax.Array                      # (m, d) shared inducing points
    params: GPParams                  # batched over components (r, ...)
    states: SGPRServeState            # batched over components
    config: GPConfig

    @property
    def n_components(self) -> int:
        return self.pca.eigenvalues.shape[0]

    @property
    def n_outputs(self) -> int:
        return self.pca.ymean.shape[0]


def fit_multivariate_sparse(
    key: jax.Array,
    X_raw: jax.Array,
    Y: jax.Array,
    config: GPConfig,
    pca_variance: float = 0.95,
    standardize: bool = True,
    param_ranges=None,
    inducing: int | jax.Array = 512,
    n_restarts: int | None = None,
    max_steps: int | None = None,
    inducing_opt_steps: int = 0,
    inducing_lr: float = 1e-2,
    restart_chunk: int | None = None,
    row_chunk: int | None = None,
    noise=None,
    gradients=None,
    gradient_noise=None,
) -> SparseMultivariateEmulator:
    """Sparse multivariate fit: PCA -> per-PC SGPR (shared inducing set).

    The components run as a host loop over ONE jitted per-component fit
    (identical shapes -> one compile, reused r times; unlike the dense
    path the per-component live set is O(N m), so sequencing components
    is the memory-sane default at N ~ 1e6). noise is (N,) or (N, t)
    per-point observation variances, projected to PC space exactly as the
    dense path (models/multivariate.project_noise).

    gradients: optional observed output gradients (N, d, t) w.r.t. the
    RAW inputs ((N, d) when t == 1) — every component then trains on the
    joint (value, gradient) likelihood against the m inducing VALUES
    (see _sgpr_system), the exact sparse counterpart of the dense
    gradient-enhanced path. The serve state's shape is unchanged, so
    snapshots/pipe/C++ serve gradient-trained emulators as-is.
    gradient_noise: known per-partial variances, same shape.
    """
    from madaiemulator_tpu.models.multivariate import (
        pca_decompose,
        project_gradient_noise,
        project_gradients,
        project_noise,
    )
    from madaiemulator_tpu.utils.designs import apply_scaling, fit_scaling

    X_raw = jnp.asarray(X_raw)
    Y = jnp.asarray(Y)
    if Y.ndim == 1:
        Y = Y[:, None]
    dtype = Y.dtype
    scaling = fit_scaling(X_raw, ranges=param_ranges)
    Xs = apply_scaling(X_raw.astype(dtype), scaling)
    pca, Zsc = pca_decompose(Y, pca_variance, standardize=standardize)
    Zsc = Zsc.astype(dtype)
    r = Zsc.shape[1]
    noise_pc = (
        None if noise is None
        else project_noise(noise, pca, dtype=dtype)
    )
    dZ = (
        None if gradients is None
        else project_gradients(gradients, pca, scaling, dtype=dtype)
    )  # (N, d, r) in SCALED design coordinates
    dZ_noise = (
        None if gradient_noise is None
        else project_gradient_noise(gradient_noise, pca, scaling,
                                    dtype=dtype)
    )
    if dZ_noise is not None and dZ is None:
        raise ValueError("gradient_noise given without gradients")
    Zi = (
        select_inducing(Xs, int(inducing))
        if isinstance(inducing, int)
        else jnp.asarray(inducing, dtype)
    )

    def fit_component(k, y_c, nz_c, dY_c, dYn_c):
        data_c = GPData(X=Xs, y=y_c, noise=nz_c, dY=dY_c, dY_noise=dYn_c)
        return fit_sgpr(
            k, data_c, config, inducing=Zi,
            n_restarts=n_restarts, max_steps=max_steps,
            inducing_opt_steps=inducing_opt_steps,
            inducing_lr=inducing_lr, restart_chunk=restart_chunk,
            row_chunk=row_chunk,
        )

    # optional-field presence is trace-static: bind ONE jitted callable
    # over the present fields so all r components reuse a single compile
    present = (noise_pc is not None, dZ is not None, dZ_noise is not None)

    def fit_jit_args(c):
        return (
            noise_pc[:, c] if present[0] else None,
            dZ[:, :, c] if present[1] else None,
            dZ_noise[:, :, c] if present[2] else None,
        )

    fit_jit = jax.jit(
        lambda k, y, nz, dY, dYn: fit_component(k, y, nz, dY, dYn),
        static_argnames=(),
    )
    keys = jax.random.split(key, r)
    results = []
    for c in range(r):
        nz_c, dY_c, dYn_c = fit_jit_args(c)
        results.append(fit_jit(keys[c], Zsc[:, c], nz_c, dY_c, dYn_c))
    params = jax.tree.map(lambda *a: jnp.stack(a), *[f.params for f in results])
    states = jax.tree.map(lambda *a: jnp.stack(a), *[f.state for f in results])
    return SparseMultivariateEmulator(
        scaling=scaling, pca=pca, Z=Zi, params=params, states=states,
        config=config,
    )


def predict_multivariate_sparse(
    emu: SparseMultivariateEmulator, Xs_raw: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Observable-space posterior mean/variance: (s, t), (s, t).

    One vmapped per-component sparse predict + the shared PCA
    reconstruction — identical output contract to predict_multivariate.
    """
    from madaiemulator_tpu.models.multivariate import reconstruct_observables
    from madaiemulator_tpu.utils.designs import apply_scaling

    dtype = emu.Z.dtype
    Xs = apply_scaling(jnp.asarray(Xs_raw, dtype=dtype), emu.scaling)
    m_pc, v_pc = jax.vmap(
        lambda st, p: predict_sgpr(st, p, emu.config, Xs)
    )(emu.states, emu.params)  # (r, s) each
    return reconstruct_observables(m_pc, v_pc, emu.pca)
