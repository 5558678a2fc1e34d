"""In-process model calibration: MCMC over a trained emulator, on-device.

The reference's calibration story is a *process pipe*: `interactive_mode`
serves posterior (mean, variance) over stdin/stdout to the MADAI MCMC
framework, one host round-trip per proposal batch (SURVEY.md §3.2 — ref:
src/interactive_emulator.c + the external madai-stat consumer; mount empty
this round, SURVEY.md §0). This module is the TPU-native completion of that
workflow: the likelihood, the proposal mechanics, and the emulator's
posterior predict all live in ONE compiled program —

  * the whole chain is a `lax.scan` over steps: a 2,000-step run costs one
    device dispatch, not 2,000 crossings of the ~25 ms relay floor;
  * walkers are a batch axis: every log-posterior evaluation is a batched
    cross-covariance GEMM + triangular solves on the MXU, vmapped over the
    PCA-component axis exactly like serving;
  * samplers are the affine-invariant ensemble ("stretch move", Goodman &
    Weare 2010 — self-tuning, the community standard for emulator
    posteriors), adaptive random-walk Metropolis (Robbins-Monro step
    adaptation toward a target acceptance rate) as the simple baseline,
    parallel tempering for multimodal posteriors, and Hamiltonian Monte
    Carlo — exact autodiff gradients through the emulator's predict, a
    sampler the reference's pipe architecture structurally cannot offer
    (gradients across a process pipe = d+1 round-trips per proposal).

Chains run in the emulator's scaled [0,1]^d coordinates (isotropic
proposals are natural there — the fitted length scales already absorbed the
anisotropy); results are returned in natural parameter space. Convergence
diagnostics (split-chain Gelman-Rubin R-hat, autocorrelation-based ESS) are
computed host-side from the returned chains.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from madaiemulator_tpu.models.multivariate import (
    MultivariateEmulator,
    _predict_components,
    reconstruct_observables,
)
from madaiemulator_tpu.utils.designs import unapply_scaling


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


def _design_points(emu):
    """Scaled in-cube points that locate the emulator: the training design
    for dense/matrix-free emulators, the inducing set for sparse ones
    (the SGPR serve state keeps no training arrays — models/sparse.py),
    and the union of all level designs for multi-fidelity (every level
    shares one scaled cube; the cheap level's dense coverage makes the
    best walker-seed pool)."""
    if _is_sparse(emu):
        return emu.Z
    if _is_mf_mv(emu):
        return jnp.concatenate([lv.X for lv in emu.levels], axis=0)
    if _is_mf(emu):
        return jnp.concatenate([lv.data.X for lv in emu.levels], axis=0)
    return emu.X


class CalibrationResult(NamedTuple):
    """MCMC output in NATURAL parameter space.

    samples: (n_kept, n_walkers, d) post-burn-in, thinned draws
    log_posterior: (n_kept, n_walkers)
    acceptance: scalar — mean acceptance rate over the whole run
    rhat: (d[+1],) split-chain Gelman-Rubin statistic (≈1 at convergence);
        when a discrepancy scale was sampled its R-hat is the last entry
    ess: (d[+1],) effective sample size across all kept draws
    discrepancy: (n_kept, n_walkers) posterior draws of the sampled
        model-discrepancy scale (fraction of each observable's training
        standard deviation), or None when calibrated without one
    """

    samples: np.ndarray
    log_posterior: np.ndarray
    acceptance: float
    rhat: np.ndarray
    ess: np.ndarray
    discrepancy: Optional[np.ndarray] = None

    def summary(self) -> Dict[str, np.ndarray]:
        """Per-coordinate posterior statistics. When a discrepancy scale
        was sampled, its statistics are appended as the LAST entry of every
        vector so all keys stay index-aligned with `rhat`/`ess`."""
        flat = self.samples.reshape(-1, self.samples.shape[-1])
        if self.discrepancy is not None:
            flat = np.concatenate(
                [flat, self.discrepancy.reshape(-1, 1)], axis=1
            )
        return {
            "mean": flat.mean(axis=0),
            "std": flat.std(axis=0),
            "q05": np.quantile(flat, 0.05, axis=0),
            "q50": np.quantile(flat, 0.50, axis=0),
            "q95": np.quantile(flat, 0.95, axis=0),
            "rhat": self.rhat,
            "ess": self.ess,
            "acceptance": np.asarray(self.acceptance),
        }


# ---------------------------------------------------------------------------
# Log-posterior factory
# ---------------------------------------------------------------------------


def make_log_posterior(
    emu: MultivariateEmulator,
    y_exp,
    exp_cov,
    log_prior: Optional[Callable[[jax.Array], jax.Array]] = None,
    discrepancy: bool = False,
    discrepancy_prior: Optional[Callable[[jax.Array], jax.Array]] = None,
    states=None,
    variance_method: str = "precond",
    query_chunk: int = 4096,
    row_chunk: int = 2048,
) -> Callable[[jax.Array], jax.Array]:
    """Batched log-posterior over SCALED coordinates: (W, d[+1]) -> (W,).

    Gaussian measurement model marginalized over the emulator's own
    predictive uncertainty (the standard calibration likelihood):

        y_exp | theta ~ N( m(theta),  diag(v(theta)) + Sigma_exp [+ D(s)] )

    where (m, v) are the emulator's observable-space posterior mean and
    variance. `exp_cov` is either a (t,) vector of experimental variances
    (diagonal noise — the common case; the combined covariance stays
    diagonal and the likelihood is a fused elementwise reduction) or a full
    (t, t) covariance (correlated systematics — a batched t x t Cholesky
    per walker; t is small so this stays cheap).

    `discrepancy=True` turns on a Kennedy-O'Hagan-style MODEL DISCREPANCY
    scale sampled jointly with theta: the walker state grows one trailing
    coordinate s = log(sigma_delta), and D(s) = exp(2 s) * diag(ystd^2)
    inflates the covariance by a discrepancy of sigma_delta training
    standard deviations on every observable. When the simulator is biased,
    exp(s) absorbs the bias instead of letting the theta posterior
    overconcentrate on a wrong value. `discrepancy_prior` is a traceable
    log-density on s (default: Normal(log 0.05, 1.5) — weakly informative,
    proper, so switching the term on never yields an improper posterior).

    The box prior on the scaled design cube [0,1]^d is always enforced on
    the theta block (outside the design the emulator extrapolates and must
    not be trusted); s is unconstrained. `log_prior` adds an optional
    traceable log-density evaluated on NATURAL theta coordinates on top.
    Returns -inf outside the box.

    Matrix-free emulators (IterativeMultivariateEmulator, N past dense
    HBM) are calibrated in-graph too: pass `states` from
    precompute_iterative_multivariate and every walker-batch moment
    evaluation becomes cached-state GEMMs — mean exactly as served, and
    (default `variance_method="precond"`) the preconditioner's Woodbury
    variance, which is PCG-free so the whole chain still compiles to one
    scan. The precond variance is a LOWER bound on the emulator's
    predictive variance (tightens with preconditioner rank) whenever the
    preconditioner ridge is the plain nugget+jitter diagonal — see the
    conditioning-floor caveat in predict_iterative_from_state — so the
    marginalized likelihood is slightly overconfident about the emulator;
    acceptable for MCMC where emulator variance is a smoothing term.
    `variance_method="exact"` runs the per-step PCG solve instead (small-N
    only: wide-RHS PCG at large N is both slow inside a chain and a known
    TPU-worker crash trigger, docs/ROUND3.md). `query_chunk` bounds the
    per-evaluation cross-covariance footprint (walker batches larger than
    it are served in chunks); `row_chunk` bounds the exact-variance PCG's
    kernel-tile rows (use <= 1024 at N >= 131k, the documented worker
    envelope).
    """
    _dtype = _design_points(emu).dtype
    y_exp = jnp.asarray(y_exp, dtype=_dtype)
    exp_cov = jnp.asarray(exp_cov, dtype=_dtype)
    t = y_exp.shape[0]
    if exp_cov.ndim not in (1, 2):
        raise ValueError("exp_cov must be (t,) variances or (t, t) covariance")
    if exp_cov.shape[0] != t or (exp_cov.ndim == 2 and exp_cov.shape[1] != t):
        raise ValueError(f"exp_cov shape {exp_cov.shape} mismatches y_exp ({t},)")
    log2pi = float(np.log(2.0 * np.pi))
    d_theta = _design_points(emu).shape[1]
    if _is_mf_mv(emu):
        if t != emu.n_outputs:
            raise ValueError(
                f"y_exp has {t} observables but this multivariate "
                f"multi-fidelity emulator predicts {emu.n_outputs}"
            )
        ystd2 = (emu.pca.ystd.astype(_dtype)) ** 2  # (t,)
    elif _is_mf(emu):
        # scalar-output MF emulators store raw-unit targets; the top
        # level's spread is the discrepancy-scale analogue of pca.ystd
        if t != 1:
            raise ValueError(
                f"y_exp has {t} observables but a scalar multi-fidelity "
                "emulator predicts exactly 1 output — broadcasting the "
                "same prediction against every observable would produce "
                "a silently wrong posterior"
            )
        ystd2 = jnp.std(emu.levels[-1].data.y).reshape(1) ** 2
    else:
        ystd2 = (emu.pca.ystd.astype(_dtype)) ** 2  # (t,)

    if _is_mf_mv(emu):
        # highest fidelity, componentwise recursion + PCA reconstruction
        from madaiemulator_tpu.models.multifidelity import (
            _predict_recursive_mv,
        )

        def moments(xq):
            m_pc, v_pc = _predict_recursive_mv(emu.levels, xq, emu.config)
            return reconstruct_observables(m_pc, v_pc, emu.pca)

    elif _is_mf(emu):
        # calibrate the HIGHEST fidelity: the recursive co-kriging predict
        # is a chain of dense GP predicts (predict_from_precomputed), so
        # the whole chain — including HMC gradients — compiles to one scan
        from madaiemulator_tpu.models.multifidelity import _predict_recursive

        def moments(xq):
            m, v = _predict_recursive(emu.levels, xq, emu.config)
            return m[:, None], v[:, None]  # (W, 1) each

    elif _is_sparse(emu):
        # million-point calibration: every walker-batch moment evaluation
        # is O(W m) against the O(m^2) serve state — the WHOLE chain still
        # compiles to one scan (models/sparse.predict_sgpr)
        from madaiemulator_tpu.models.sparse import predict_sgpr

        def moments(xq):
            m_pc, v_pc = jax.vmap(
                lambda st, pp: predict_sgpr(st, pp, emu.config, xq)
            )(emu.states, emu.params)
            return reconstruct_observables(m_pc, v_pc, emu.pca)

    elif getattr(emu, "states", None) is not None:

        def moments(xq):
            m_pc, v_pc = _predict_components(
                emu.states, emu.params, emu.X, emu.Z, xq, emu.config,
                dZ=emu.dZ,
            )
            return reconstruct_observables(m_pc, v_pc, emu.pca)

    else:
        if states is None:
            raise ValueError(
                "matrix-free calibration needs the serving cache: pass "
                "states=precompute_iterative_multivariate(emu, ...)"
            )
        from madaiemulator_tpu.models.gp import GPData
        from madaiemulator_tpu.models.iterative import (
            predict_iterative_from_state,
        )

        def moments(xq):
            ms, vs = [], []
            for i in range(emu.n_components):
                m_i, v_i = predict_iterative_from_state(
                    states[i], emu.component_data(i), xq,
                    query_chunk=query_chunk,
                    variance_method=variance_method,
                    row_chunk=row_chunk,
                )
                ms.append(m_i)
                vs.append(v_i)
            return reconstruct_observables(
                jnp.stack(ms), jnp.stack(vs), emu.pca
            )
    if discrepancy_prior is None:
        _loc, _scale = float(np.log(0.05)), 1.5

        def discrepancy_prior(s):
            return -0.5 * ((s - _loc) / _scale) ** 2

    def log_post(theta_scaled: jax.Array) -> jax.Array:
        x_full = jnp.atleast_2d(theta_scaled)  # (W, d[+1])
        x = x_full[:, :d_theta]
        inbox = jnp.all((x >= 0.0) & (x <= 1.0), axis=-1)  # (W,)
        # evaluate the emulator at in-box points only in spirit: clip the
        # query (keeps the math finite everywhere) and gate with -inf below.
        xq = jnp.clip(x, 0.0, 1.0)
        mean, var = moments(xq)  # (W, t)
        if discrepancy:
            s = x_full[:, d_theta]  # (W,)
            var = var + jnp.exp(2.0 * s)[:, None] * ystd2[None, :]
        resid = mean - y_exp[None, :]
        if exp_cov.ndim == 1:
            tot = var + exp_cov[None, :]
            tot = jnp.maximum(tot, jnp.finfo(tot.dtype).tiny)
            ll = -0.5 * jnp.sum(
                resid * resid / tot + jnp.log(tot) + log2pi, axis=-1
            )
        else:
            # C_w = diag(var_w) + Sigma_exp, batched Cholesky over walkers
            C = exp_cov[None, :, :] + jax.vmap(jnp.diag)(var)  # (W, t, t)
            L = jax.lax.linalg.cholesky(C)
            sol = jax.lax.linalg.triangular_solve(
                L, resid[..., None], left_side=True, lower=True
            )[..., 0]
            logdet = 2.0 * jnp.sum(
                jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1
            )
            ll = -0.5 * (jnp.sum(sol * sol, axis=-1) + logdet + t * log2pi)
        if log_prior is not None:
            ll = ll + log_prior(unapply_scaling(xq, emu.scaling))
        if discrepancy:
            ll = ll + discrepancy_prior(x_full[:, d_theta])
        neg_inf = jnp.asarray(-jnp.inf, ll.dtype)
        out = jnp.where(inbox, ll, neg_inf)
        return out if theta_scaled.ndim > 1 else out[0]

    return log_post


# ---------------------------------------------------------------------------
# Samplers (in-graph; one compiled scan per run)
# ---------------------------------------------------------------------------


def _shard_walkers(x0, mesh, axis_name=None, axis=0):
    """Partition the walker axis of `x0` over a device mesh.

    Every log-posterior evaluation is batched over walkers, so sharding
    that axis data-parallelizes the emulator's cross-covariance GEMMs over
    chips; GSPMD inserts the gather the stretch move's cross-half partner
    lookup needs. The emulator arrays captured in the log_post closure are
    jit constants and replicate automatically."""
    if mesh is None:
        return x0
    from jax.sharding import NamedSharding, PartitionSpec

    name = axis_name or mesh.axis_names[0]
    spec = [None] * x0.ndim
    spec[axis] = name
    return jax.device_put(x0, NamedSharding(mesh, PartitionSpec(*spec)))


def _accept_step(key, x, lp, x_prop, lp_prop, log_extra=0.0):
    """Metropolis accept: returns (x', lp', accepted_mask)."""
    w = x.shape[0]
    log_u = jnp.log(
        jax.random.uniform(key, (w,), dtype=lp.dtype, minval=jnp.finfo(lp.dtype).tiny)
    )
    ratio = lp_prop - lp + log_extra
    # lp may be -inf only before any in-support state is found; treat a
    # finite proposal against a -inf current state as an automatic accept.
    ratio = jnp.where(jnp.isneginf(lp) & jnp.isfinite(lp_prop), jnp.inf, ratio)
    acc = log_u < ratio
    x_new = jnp.where(acc[:, None], x_prop, x)
    lp_new = jnp.where(acc, lp_prop, lp)
    return x_new, lp_new, acc


@functools.partial(
    jax.jit, static_argnames=("log_post", "n_steps", "a")
)
def _emcee_scan(key, log_post, x0, n_steps: int, a: float):
    w, d = x0.shape
    half = w // 2
    lp0 = log_post(x0)

    def stretch_half(key, movers, movers_lp, others):
        """Goodman-Weare stretch move for one half against the other."""
        k_z, k_pick, k_acc = jax.random.split(key, 3)
        u = jax.random.uniform(k_z, (half,), dtype=x0.dtype)
        z = (u * (a - 1.0) + 1.0) ** 2 / a  # g(z) ∝ 1/sqrt(z) on [1/a, a]
        pick = jax.random.randint(k_pick, (half,), 0, half)
        partners = others[pick]  # (half, d)
        prop = partners + z[:, None] * (movers - partners)
        lp_prop = log_post(prop)
        return _accept_step(
            k_acc, movers, movers_lp, prop, lp_prop,
            log_extra=(d - 1) * jnp.log(z),
        )

    def step(carry, key):
        x, lp = carry
        kA, kB = jax.random.split(key)
        xA, lpA = x[:half], lp[:half]
        xB, lpB = x[half:], lp[half:]
        xA, lpA, accA = stretch_half(kA, xA, lpA, xB)
        xB, lpB, accB = stretch_half(kB, xB, lpB, xA)
        x = jnp.concatenate([xA, xB], axis=0)
        lp = jnp.concatenate([lpA, lpB], axis=0)
        acc = jnp.concatenate([accA, accB], axis=0)
        return (x, lp), (x, lp, jnp.mean(acc.astype(x.dtype)))

    keys = jax.random.split(key, n_steps)
    (_, _), (xs, lps, accs) = jax.lax.scan(step, (x0, lp0), keys)
    return xs, lps, jnp.mean(accs)


def run_emcee(
    key: jax.Array,
    log_post: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    n_steps: int,
    a: float = 2.0,
    mesh=None,
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Affine-invariant ensemble sampler; returns (chain, logp, acceptance).

    chain (n_steps, W, d) / logp (n_steps, W) in the coordinates of `x0`
    (for emulator posteriors: scaled space). W must be even and should be
    >= 2 d + 2 so each half spans the parameter space. The entire run is
    one compiled scan — per-step cost is one batched emulator predict.
    `mesh` shards the walker axis over devices (see `_shard_walkers`);
    results are identical to the single-device run.
    """
    x0 = jnp.asarray(x0)
    w, d = x0.shape
    if w % 2 or w < 4:
        raise ValueError(f"n_walkers must be even and >= 4, got {w}")
    if w < 2 * d + 2:
        raise ValueError(
            f"n_walkers={w} too few for d={d}: need >= {2 * d + 2}"
        )
    x0 = _shard_walkers(x0, mesh, axis_name)
    return _emcee_scan(key, log_post, x0, int(n_steps), float(a))


@functools.partial(
    jax.jit, static_argnames=("log_post", "n_steps", "n_adapt", "target")
)
def _rwm_scan(key, log_post, x0, step0, n_steps: int, n_adapt: int, target: float):
    lp0 = log_post(x0)
    log_s0 = jnp.log(jnp.asarray(step0, x0.dtype))

    def step(carry, inp):
        x, lp, log_s = carry
        i, key = inp
        k_prop, k_acc = jax.random.split(key)
        prop = x + jnp.exp(log_s) * jax.random.normal(
            k_prop, x.shape, dtype=x.dtype
        )
        lp_prop = log_post(prop)
        x, lp, acc = _accept_step(k_acc, x, lp, prop, lp_prop)
        # Robbins-Monro on log-step toward the target acceptance rate,
        # frozen after n_adapt steps (keeps the kept chain Markovian).
        gamma = (i + 1.0) ** -0.6
        adapt = (i < n_adapt).astype(x.dtype)
        log_s = log_s + adapt * gamma * (
            jnp.mean(acc.astype(x.dtype)) - target
        )
        return (x, lp, log_s), (x, lp, jnp.mean(acc.astype(x.dtype)))

    keys = jax.random.split(key, n_steps)
    idx = jnp.arange(n_steps, dtype=x0.dtype)
    (_, _, log_s), (xs, lps, accs) = jax.lax.scan(
        step, (x0, lp0, log_s0), (idx, keys)
    )
    return xs, lps, jnp.mean(accs), jnp.exp(log_s)


def run_rwm(
    key: jax.Array,
    log_post: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    n_steps: int,
    step_size: float = 0.05,
    n_adapt: Optional[int] = None,
    target_acceptance: float = 0.234,
    mesh=None,
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Adaptive random-walk Metropolis; returns (chain, logp, acceptance,
    final_step). Chains are independent (one proposal scale shared across
    walkers, adapted from their pooled acceptance rate during the first
    `n_adapt` steps — default half the run; the `calibrate()` driver
    instead passes n_adapt=burn_in so every kept draw is post-adaptation,
    i.e. from the frozen, Markovian kernel)."""
    x0 = _shard_walkers(jnp.asarray(x0), mesh, axis_name)
    if n_adapt is None:
        n_adapt = n_steps // 2
    return _rwm_scan(
        key, log_post, x0, step_size, int(n_steps), int(n_adapt),
        float(target_acceptance),
    )


def _lp_and_grad(log_post, x):
    """Per-walker log posterior (W,) AND its gradient (W, d) in one
    forward + one backward pass (walkers are independent, so the vjp
    against ones recovers each row's own gradient). Non-finite gradient
    components (possible only at -inf states outside the support gate) are
    zeroed — Metropolis rejection handles those states; the gradient must
    never inject NaNs into the leapfrog."""
    lp, vjp = jax.vjp(log_post, x)
    (g,) = vjp(jnp.ones_like(lp))
    g = jnp.where(jnp.isfinite(g), g, 0.0)
    return lp, g


@functools.partial(
    jax.jit,
    static_argnames=(
        "log_post", "n_leapfrog", "n_steps", "n_adapt", "target",
        "adapt_mass",
    ),
)
def _hmc_scan(
    key, log_post, x0, step0, n_leapfrog: int, n_steps: int, n_adapt: int,
    target: float, adapt_mass: bool,
):
    lp0, g0 = _lp_and_grad(log_post, x0)
    log_s0 = jnp.log(jnp.asarray(step0, x0.dtype))
    d = x0.shape[-1]
    dtype = x0.dtype
    # mass-matrix warmup (Stan-style two-phase, VERDICT r3 weak #5):
    # phase 1 (steps < n_half): identity mass, accumulate walker moments;
    # at n_half: freeze inv_mass = normalized posterior-variance estimate;
    # phase 2 (n_half..n_adapt): Robbins-Monro re-tunes the step size for
    # the new metric; after n_adapt everything is frozen (Markovian tail).
    n_half = n_adapt // 2 if adapt_mass else n_steps + 1

    def leapfrog(x, p, g, eps, inv_mass):
        """n_leapfrog velocity-Verlet steps with diagonal mass
        M = diag(1/inv_mass) (identity when inv_mass == 1); carries the
        gradient so each step costs exactly one lp+grad evaluation."""
        p = p + 0.5 * eps * g

        def body(carry, i):
            x, p = carry
            x = x + eps * inv_mass * p  # M^-1 p
            lp, g = _lp_and_grad(log_post, x)
            # final sub-step closes with a half kick
            kick = jnp.where(i == n_leapfrog - 1, 0.5, 1.0)
            p = p + kick * eps * g
            return (x, p), (lp, g)

        (x, p), (lps, gs) = jax.lax.scan(
            body, (x, p), jnp.arange(n_leapfrog)
        )
        return x, p, lps[-1], gs[-1]

    def step(carry, inp):
        x, lp, g, log_s, s1, s2, cnt, inv_mass = carry
        i, key = inp
        k_mom, k_jit, k_acc = jax.random.split(key, 3)
        # momentum p ~ N(0, M): std = sqrt(M) = 1/sqrt(inv_mass)
        p = jax.random.normal(k_mom, x.shape, dtype=x.dtype) / jnp.sqrt(
            inv_mass
        )
        # jitter the step size +-20% to break leapfrog resonances; the
        # jitter is state-independent so the kernel stays valid even after
        # adaptation freezes
        eps = jnp.exp(log_s) * jax.random.uniform(
            k_jit, (), dtype=x.dtype, minval=0.8, maxval=1.2
        )
        xn, pn, lpn, gn = leapfrog(x, p, g, eps, inv_mass)
        # kinetic energy 0.5 p^T M^-1 p
        ke = 0.5 * jnp.sum(p * p * inv_mass, axis=-1)
        ken = 0.5 * jnp.sum(pn * pn * inv_mass, axis=-1)
        # Metropolis on the Hamiltonian: log ratio = (lp' - ke') - (lp - ke)
        x2, lp2, acc = _accept_step(
            k_acc, x, lp, xn, lpn, log_extra=ke - ken
        )
        g2 = jnp.where(acc[:, None], gn, g)
        # Robbins-Monro on log-step toward the target acceptance rate,
        # frozen after n_adapt steps (keeps the kept chain Markovian)
        gamma = (i + 1.0) ** -0.6
        adapt = (i < n_adapt).astype(x.dtype)
        log_s = log_s + adapt * gamma * (
            jnp.mean(acc.astype(x.dtype)) - target
        )
        # accumulate walker moments during phase 1 only
        in_phase1 = (i < n_half).astype(x.dtype)
        s1 = s1 + in_phase1 * jnp.sum(x2, axis=0)
        s2 = s2 + in_phase1 * jnp.sum(x2 * x2, axis=0)
        cnt = cnt + in_phase1 * x2.shape[0]
        # at the phase boundary: inv_mass = posterior-variance estimate,
        # normalized to geometric mean 1 (overall scale stays in the step
        # size) and floored (a collapsed dimension must not zero the mass)
        mu = s1 / jnp.maximum(cnt, 1.0)
        var = jnp.maximum(s2 / jnp.maximum(cnt, 1.0) - mu * mu, 1e-10)
        var = var / jnp.exp(jnp.mean(jnp.log(var)))
        inv_mass = jnp.where(i == n_half - 1, var, inv_mass)
        return (
            (x2, lp2, g2, log_s, s1, s2, cnt, inv_mass),
            (x2, lp2, jnp.mean(acc.astype(x.dtype))),
        )

    keys = jax.random.split(key, n_steps)
    idx = jnp.arange(n_steps, dtype=dtype)
    carry0 = (
        x0, lp0, g0, log_s0,
        jnp.zeros((d,), dtype), jnp.zeros((d,), dtype),
        jnp.zeros((), dtype), jnp.ones((d,), dtype),
    )
    (_, _, _, log_s, _, _, _, inv_mass), (xs, lps, accs) = jax.lax.scan(
        step, carry0, (idx, keys)
    )
    return xs, lps, jnp.mean(accs), jnp.exp(log_s), inv_mass


def run_hmc(
    key: jax.Array,
    log_post: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    n_steps: int,
    step_size: float = 0.1,
    n_leapfrog: int = 8,
    n_adapt: Optional[int] = None,
    target_acceptance: float = 0.75,
    mesh=None,
    axis_name: Optional[str] = None,
    adapt_mass: bool = True,
    return_mass: bool = False,
) -> Tuple[jax.Array, ...]:
    """Hamiltonian Monte Carlo; returns (chain, logp, acceptance,
    final_step) — plus the adapted diagonal inverse-mass vector when
    return_mass=True.

    The gradient-based sampler the reference's architecture cannot offer:
    upstream, the emulator lives behind a stdin/stdout pipe and gradients
    would need finite differences (d+1 pipe round-trips per walker per
    step). Here the log posterior is a compiled JAX function, so each HMC
    step's `n_leapfrog` gradient evaluations are exact autodiff through
    the emulator's predict GEMMs — the whole run is still ONE compiled
    scan. Per step this costs n_leapfrog batched predict+grad evaluations
    (vs 1 for emcee/rwm), repaid by distant, decorrelated proposals:
    dimension-for-dimension HMC needs far fewer posterior evaluations per
    effective sample on smooth targets like GP-emulator posteriors.

    Mass matrix (adapt_mass=True, the default): a Stan-style two-phase
    warmup inside the SAME compiled scan — the first half of the
    adaptation window runs identity mass while accumulating walker
    moments; at its end the diagonal inverse mass freezes to the
    posterior-variance estimate (normalized to geometric mean 1, floored)
    and the second half re-tunes the step size for the new metric. On the
    correlated/anisotropic posteriors calibration-with-discrepancy
    produces, identity-mass HMC wastes its gradient advantage
    (VERDICT r3 weak #5); the adapted metric restores it at zero extra
    evaluations per step. The step size adapts by Robbins-Monro toward
    `target_acceptance` (0.75, the HMC-optimal 0.65 plus margin for the
    +-20% step jitter) during the first `n_adapt` steps (default half the
    run; `calibrate()` passes burn_in) and then freezes so kept draws come
    from a fixed kernel. Walkers are independent chains; `mesh` shards the
    walker axis (gradients shard with the forward pass under GSPMD)."""
    x0 = _shard_walkers(jnp.asarray(x0), mesh, axis_name)
    if n_adapt is None:
        n_adapt = n_steps // 2
    if n_leapfrog < 1:
        raise ValueError(f"n_leapfrog must be >= 1, got {n_leapfrog}")
    xs, lps, acc, step, inv_mass = _hmc_scan(
        key, log_post, x0, step_size, int(n_leapfrog), int(n_steps),
        int(n_adapt), float(target_acceptance), bool(adapt_mass),
    )
    if return_mass:
        return xs, lps, acc, step, inv_mass
    return xs, lps, acc, step


@functools.partial(
    jax.jit, static_argnames=("log_post", "n_steps", "a")
)
def _pt_scan(key, log_post, x0, betas, n_steps: int, a: float):
    """Parallel-tempered ensemble scan. x0: (K, W, d), betas: (K,) with
    betas[0] == 1 (the cold rung whose chain is returned)."""
    k_rungs, w, d = x0.shape
    half = w // 2
    lp0 = log_post(x0.reshape(-1, d)).reshape(k_rungs, w)  # UNtempered

    def stretch_half(key, movers, movers_lp, others):
        """Tempered stretch move, vmapped over rungs via one flat predict.
        movers/others: (K, half, d); movers_lp: (K, half)."""
        k_z, k_pick, k_acc = jax.random.split(key, 3)
        u = jax.random.uniform(k_z, (k_rungs, half), dtype=x0.dtype)
        z = (u * (a - 1.0) + 1.0) ** 2 / a
        pick = jax.random.randint(k_pick, (k_rungs, half), 0, half)
        partners = jnp.take_along_axis(others, pick[..., None], axis=1)
        prop = partners + z[..., None] * (movers - partners)
        lp_prop = log_post(prop.reshape(-1, d)).reshape(k_rungs, half)
        log_u = jnp.log(
            jax.random.uniform(
                k_acc, (k_rungs, half), dtype=lp_prop.dtype,
                minval=jnp.finfo(lp_prop.dtype).tiny,
            )
        )
        ratio = (d - 1) * jnp.log(z) + betas[:, None] * (lp_prop - movers_lp)
        ratio = jnp.where(
            jnp.isneginf(movers_lp) & jnp.isfinite(lp_prop), jnp.inf, ratio
        )
        acc = log_u < ratio
        movers = jnp.where(acc[..., None], prop, movers)
        movers_lp = jnp.where(acc, lp_prop, movers_lp)
        return movers, movers_lp, acc

    def step(carry, inp):
        x, lp = carry
        i, key = inp
        kA, kB, k_su = jax.random.split(key, 3)
        xA, lpA, accA = stretch_half(kA, x[:, :half], lp[:, :half], x[:, half:])
        xB, lpB, accB = stretch_half(kB, x[:, half:], lp[:, half:], xA)
        x = jnp.concatenate([xA, xB], axis=1)
        lp = jnp.concatenate([lpA, lpB], axis=1)
        acc = jnp.concatenate([accA, accB], axis=1)
        # replica exchange between adjacent rungs, walker-wise, alternating
        # even/odd pairs each step (detailed-balance-preserving sweep)
        delta_beta = betas[:-1] - betas[1:]  # (K-1,)
        delta_lp = lp[1:] - lp[:-1]  # (K-1, W)
        swap_ratio = delta_beta[:, None] * delta_lp
        # -inf - -inf = NaN: never swap two out-of-support walkers
        swap_ratio = jnp.where(jnp.isnan(swap_ratio), -jnp.inf, swap_ratio)
        log_u = jnp.log(
            jax.random.uniform(
                k_su, swap_ratio.shape, dtype=lp.dtype,
                minval=jnp.finfo(lp.dtype).tiny,
            )
        )
        parity = jnp.asarray(i % 2, jnp.int32)
        pair_on = (jnp.arange(k_rungs - 1) % 2) == parity  # (K-1,)
        do_swap = (log_u < swap_ratio) & pair_on[:, None]  # (K-1, W)
        # build the permutation: rung k swaps with k+1 where do_swap
        up = jnp.pad(do_swap, ((0, 1), (0, 0)))  # swap with rung below me
        dn = jnp.pad(do_swap, ((1, 0), (0, 0)))  # swap with rung above me
        x_next = jnp.roll(x, -1, axis=0)
        x_prev = jnp.roll(x, 1, axis=0)
        lp_next = jnp.roll(lp, -1, axis=0)
        lp_prev = jnp.roll(lp, 1, axis=0)
        x = jnp.where(up[..., None], x_next, jnp.where(dn[..., None], x_prev, x))
        lp = jnp.where(up, lp_next, jnp.where(dn, lp_prev, lp))
        swap_frac = jnp.sum(do_swap.astype(x.dtype)) / jnp.maximum(
            jnp.sum(pair_on.astype(x.dtype)) * w, 1.0
        )
        return (x, lp), (
            x[0], lp[0], jnp.mean(acc[0].astype(x.dtype)), swap_frac
        )

    keys = jax.random.split(key, n_steps)
    idx = jnp.arange(n_steps)
    (_, _), (xs, lps, accs, swaps) = jax.lax.scan(
        step, (x0, lp0), (idx, keys)
    )
    return xs, lps, jnp.mean(accs), jnp.mean(swaps)


def run_parallel_tempering(
    key: jax.Array,
    log_post: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    n_steps: int,
    n_rungs: int = 6,
    beta_min: float = 0.05,
    a: float = 2.0,
    init_spread: float = 0.1,
    mesh=None,
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Replica-exchange ensemble sampler for multimodal posteriors.

    `n_rungs` tempered copies of the ensemble run the stretch move against
    log-densities beta_k * log_post (beta geometric from 1 to `beta_min`);
    adjacent rungs exchange walkers Metropolis-style each step. Hot rungs
    roam between modes the cold rung cannot cross, and exchanges carry
    those states down — the standard fix for the mode-trapping that
    emulator calibration exhibits wherever high-predictive-variance
    regions preserve posterior mass (see docs/ROUND3.md).

    x0 is the (W, d) COLD start; hotter rungs start at x0 plus Gaussian
    jitter of scale `init_spread` (they decorrelate within their own rung
    quickly). Returns (cold chain (n_steps, W, d), cold logp, cold in-rung
    acceptance, swap acceptance). Cost per step ~ n_rungs x one ensemble
    step, still a single compiled scan with all K*W walkers in each batched
    predict.
    """
    x0 = jnp.asarray(x0)
    w, d = x0.shape
    if w % 2 or w < max(4, 2 * d + 2):
        raise ValueError(
            f"n_walkers={w} must be even and >= {max(4, 2 * d + 2)}"
        )
    if n_rungs < 2:
        raise ValueError("n_rungs must be >= 2 (use run_emcee for 1)")
    betas = jnp.asarray(
        np.geomspace(1.0, beta_min, n_rungs), dtype=x0.dtype
    )
    keys = jax.random.split(jnp.asarray(key), 2)
    jit0 = jax.random.normal(
        keys[0], (n_rungs - 1, w, d), dtype=x0.dtype
    ) * init_spread
    x0_k = jnp.concatenate(
        [x0[None], x0[None] + jit0], axis=0
    )  # (K, W, d)
    x0_k = _shard_walkers(x0_k, mesh, axis_name, axis=1)
    return _pt_scan(keys[1], log_post, x0_k, betas, int(n_steps), float(a))


# ---------------------------------------------------------------------------
# Convergence diagnostics (host-side)
# ---------------------------------------------------------------------------


def gelman_rubin(chains: np.ndarray) -> np.ndarray:
    """Split-chain R-hat per dimension. chains: (S, W, d) -> (d,)."""
    c = np.asarray(chains, dtype=np.float64)
    s, w, d = c.shape
    half = s // 2
    if half < 2:
        return np.full(d, np.nan)
    # split each walker chain in two -> 2W chains of length half
    c = np.concatenate([c[:half], c[half : 2 * half]], axis=1)  # (half, 2W, d)
    n, m = half, 2 * w
    chain_mean = c.mean(axis=0)  # (m, d)
    chain_var = c.var(axis=0, ddof=1)  # (m, d)
    W_ = chain_var.mean(axis=0)
    B = n * chain_mean.var(axis=0, ddof=1)
    var_hat = (n - 1) / n * W_ + B / n
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.sqrt(var_hat / np.maximum(W_, np.finfo(np.float64).tiny))


def effective_sample_size(chains: np.ndarray) -> np.ndarray:
    """ESS per dimension via Geyer's initial-monotone-sequence estimator on
    the walker-averaged autocorrelation. chains: (S, W, d) -> (d,)."""
    c = np.asarray(chains, dtype=np.float64)
    s, w, d = c.shape
    if s < 4:
        return np.full(d, float(s * w))
    c = c - c.mean(axis=0, keepdims=True)
    # FFT autocovariance per (walker, dim), averaged over walkers
    nfft = 1 << (2 * s - 1).bit_length()
    f = np.fft.rfft(c, n=nfft, axis=0)
    acov = np.fft.irfft(f * np.conj(f), n=nfft, axis=0)[:s].real  # (S, W, d)
    acov /= np.arange(s, 0, -1)[:, None, None]
    rho = acov.mean(axis=1)  # (S, d)
    var0 = np.maximum(rho[0], np.finfo(np.float64).tiny)
    rho = rho / var0
    ess = np.empty(d)
    for j in range(d):
        # sum of adjacent pairs until a pair goes non-positive (Geyer); if
        # every pair stays positive the whole window contributes (the
        # slowly-mixing case must not get its tail truncated, or ESS is
        # overreported exactly when the convergence warning matters)
        pair = rho[: (s // 2) * 2, j].reshape(-1, 2).sum(axis=1)
        tau = -1.0 + 2.0 * np.cumsum(np.maximum(pair, 0.0))
        stop = np.argmax(pair <= 0.0) if np.any(pair <= 0.0) else pair.size
        tau_f = max(tau[stop - 1], 1e-12) if stop > 0 else max(tau[0], 1.0)
        ess[j] = s * w / max(tau_f, 1.0)
    return np.minimum(ess, float(s * w))


# ---------------------------------------------------------------------------
# End-to-end driver
# ---------------------------------------------------------------------------


def init_walkers(
    key: jax.Array,
    emu: MultivariateEmulator,
    log_post: Callable[[jax.Array], jax.Array],
    n_walkers: int,
    n_best: int = 8,
    jitter: float = 0.02,
    extra0: Optional[jax.Array] = None,
) -> jax.Array:
    """Walker starts in scaled space, clustered on the best design points.

    The training design is the only prior knowledge of where posterior mass
    lives; seeding at its highest-posterior points is the standard warm
    start (and keeps every walker inside the box prior's support). `extra0`
    appends unconstrained trailing coordinates (e.g. the sampled
    discrepancy log-scale) initialized at the given values plus jitter."""
    k_sub, key = jax.random.split(jnp.asarray(key))
    design = _design_points(emu)  # sparse: the inducing set (in-cube)
    N = design.shape[0]
    score_cap = 2048
    if N > score_cap:
        # scoring every design point costs an (N, t) moments pass — at
        # matrix-free N that is an N x N cross-covariance; a random subset
        # locates high-posterior seeds just as well
        sub = jax.random.choice(k_sub, N, shape=(score_cap,), replace=False)
        X_seed = design[sub]
    else:
        X_seed = design
    if extra0 is not None:
        extra0 = jnp.asarray(extra0, design.dtype).reshape(-1)  # (e,)
        X_score = jnp.concatenate(
            [X_seed, jnp.broadcast_to(extra0, (X_seed.shape[0],) + extra0.shape)],
            axis=1,
        )
    else:
        X_score = X_seed
    lp_design = log_post(X_score)  # (n_score,)
    k = min(n_best, X_seed.shape[0])
    _, top = jax.lax.top_k(lp_design, k)
    k_pick, k_jit, k_ex = jax.random.split(key, 3)
    pick = jax.random.choice(k_pick, top, shape=(n_walkers,))
    x0 = X_seed[pick] + jitter * jax.random.normal(
        k_jit, (n_walkers, design.shape[1]), dtype=design.dtype
    )
    x0 = jnp.clip(x0, 1e-6, 1.0 - 1e-6)
    if extra0 is not None:
        ex = extra0[None, :] + 0.3 * jax.random.normal(
            k_ex, (n_walkers, extra0.shape[0]), dtype=design.dtype
        )
        x0 = jnp.concatenate([x0, ex], axis=1)
    return x0


def calibrate(
    key: jax.Array,
    emu: MultivariateEmulator,
    y_exp,
    exp_cov,
    n_walkers: int = 64,
    n_steps: int = 1000,
    burn_in: Optional[int] = None,
    thin: int = 1,
    sampler: str = "emcee",
    log_prior: Optional[Callable[[jax.Array], jax.Array]] = None,
    discrepancy: bool = False,
    discrepancy_prior: Optional[Callable[[jax.Array], jax.Array]] = None,
    states=None,
    variance_method: str = "precond",
    precompute_kwargs: Optional[dict] = None,
    query_chunk: int = 4096,
    row_chunk: int = 2048,
    **sampler_kwargs,
) -> CalibrationResult:
    """Calibrate simulator parameters against observations `y_exp`.

    One call replaces the reference's estimate → snapshot → pipe → external
    MCMC loop: builds the marginalized Gaussian log-posterior over the
    trained emulator, seeds `n_walkers` at the best design points, runs the
    chosen in-graph sampler, and returns natural-space draws with R-hat /
    ESS convergence diagnostics. `exp_cov`: (t,) variances or (t, t)
    covariance of the measurement; `log_prior`: optional extra traceable
    log-density on natural coordinates (the scaled design box is always
    enforced as the support). `discrepancy=True` samples a
    Kennedy-O'Hagan-style model-discrepancy scale jointly with theta (see
    `make_log_posterior`); its draws come back in `result.discrepancy` as
    fractions of each observable's training standard deviation, and its
    R-hat/ESS are the last entries of the diagnostics vectors.

    Multi-chip: pass `mesh=<jax.sharding.Mesh>` in `sampler_kwargs` to
    shard the walker axis over devices (every sampler supports it); the
    chain is identical to the single-device run.

    Matrix-free: an IterativeMultivariateEmulator calibrates in-graph too —
    the serving cache is built once (auto with `precompute_kwargs`
    forwarded to precompute_iterative_multivariate — rank, cg_tol,
    cg_max_iters, row_chunk — or pass `states` to reuse one) and each
    step's walker-batch moments are cached-state GEMMs with the PCG-free
    Woodbury variance (see make_log_posterior on `variance_method`;
    `query_chunk`/`row_chunk` bound the in-chain serving footprint — at
    N >= 131k set row_chunk <= 1024, the documented worker envelope). The
    reference's pipe architecture is the only alternative at this N, and
    it pays two host round-trips per step.
    """
    if burn_in is None:
        burn_in = n_steps // 4
    if not 0 <= burn_in < n_steps:
        raise ValueError(f"burn_in={burn_in} must lie in [0, n_steps)")
    if sampler in ("rwm", "hmc"):
        # adapt only during burn-in: the samplers' own default
        # (n_steps // 2) would leave step-size adaptation running into the
        # kept draws, making the kept chain non-Markovian
        sampler_kwargs.setdefault("n_adapt", burn_in)
    if (
        getattr(emu, "states", None) is None
        and states is None
        and not _is_mf(emu)  # MF levels carry their own dense states
    ):
        from madaiemulator_tpu.models.multivariate import (
            precompute_iterative_multivariate,
        )

        states = precompute_iterative_multivariate(
            emu, **(precompute_kwargs or {})
        )
    log_post = make_log_posterior(
        emu, y_exp, exp_cov, log_prior=log_prior, discrepancy=discrepancy,
        discrepancy_prior=discrepancy_prior, states=states,
        variance_method=variance_method, query_chunk=query_chunk,
        row_chunk=row_chunk,
    )
    k_init, k_run = jax.random.split(jnp.asarray(key))
    extra0 = jnp.asarray([np.log(0.05)]) if discrepancy else None
    x0 = init_walkers(k_init, emu, log_post, n_walkers, extra0=extra0)
    if sampler == "emcee":
        chain, lps, acc = run_emcee(
            k_run, log_post, x0, n_steps, **sampler_kwargs
        )
    elif sampler == "pt":
        chain, lps, acc, _swap = run_parallel_tempering(
            k_run, log_post, x0, n_steps, **sampler_kwargs
        )
    elif sampler == "rwm":
        chain, lps, acc, _ = run_rwm(
            k_run, log_post, x0, n_steps, **sampler_kwargs
        )
    elif sampler == "hmc":
        chain, lps, acc, _ = run_hmc(
            k_run, log_post, x0, n_steps, **sampler_kwargs
        )
    else:
        raise ValueError(f"unknown sampler {sampler!r} (emcee|pt|rwm|hmc)")
    kept = np.asarray(chain)[burn_in::thin]  # (S, W, d[+1]) scaled
    kept_lp = np.asarray(lps)[burn_in::thin]
    d_theta = _design_points(emu).shape[1]
    theta_kept = kept[..., :d_theta]
    natural = np.asarray(
        unapply_scaling(
            jnp.asarray(theta_kept.reshape(-1, d_theta)), emu.scaling
        )
    ).reshape(theta_kept.shape)
    disc = np.exp(kept[..., d_theta]) if discrepancy else None
    diag_chain = (
        np.concatenate([natural, disc[..., None]], axis=-1)
        if discrepancy
        else natural
    )
    return CalibrationResult(
        samples=natural,
        log_posterior=kept_lp,
        acceptance=float(np.asarray(acc)),
        rhat=gelman_rubin(diag_chain),
        ess=effective_sample_size(diag_chain),
        discrepancy=disc,
    )


# ---------------------------------------------------------------------------
# History matching (implausibility)
# ---------------------------------------------------------------------------


def implausibility_from_moments(
    mean: jax.Array, var: jax.Array, y_exp: jax.Array, s2: jax.Array
) -> jax.Array:
    """I = max_j |mean_j - y_j| / sqrt(var_j + s2_j) from predictive
    moments. The single definition of the implausibility statistic —
    `implausibility` and the NROY design screen (models/design.py) both
    call it, so the screen can never diverge from the reported statistic.
    mean/var: (W, t); y_exp/s2: (t,); returns (W,). Traceable."""
    tot = jnp.maximum(var + s2[None, :], jnp.finfo(mean.dtype).tiny)
    return jnp.max(jnp.abs(mean - y_exp[None, :]) / jnp.sqrt(tot), axis=-1)


def implausibility(
    emu: MultivariateEmulator, y_exp, exp_cov, thetas_scaled: jax.Array,
    states=None,
    **iter_kwargs,
) -> jax.Array:
    """Max-over-observables implausibility I(theta) for history matching.

        I(theta) = max_j |m_j(theta) - y_j| / sqrt(v_j(theta) + s_j^2)

    Points with I > 3 are conventionally ruled implausible (Pukelsheim's
    3-sigma rule); iterating design refinement on the NROY ("not ruled out
    yet") region is the wave-based history-matching loop that typically
    precedes full-Bayes calibration on expensive simulators. Batched and
    jittable: (W, d) scaled -> (W,). Matrix-free emulators screen with the
    PCG-free Woodbury variance by default (variance_method="precond", the
    same choice as the NROY design screens — wide-RHS serve-time PCG over a
    big pool is the documented TPU-worker crash family at large N; pass
    variance_method="exact" for small-N exactness) and forward any other
    iter_kwargs (query_chunk, row_chunk, rank, ...) to
    predict_multivariate_iterative; pass `states` to reuse a serving cache
    across waves."""
    _dtype = _design_points(emu).dtype
    y_exp = jnp.asarray(y_exp, dtype=_dtype)
    exp_cov = jnp.asarray(exp_cov, dtype=_dtype)
    s2 = jnp.diagonal(exp_cov) if exp_cov.ndim == 2 else exp_cov
    xq = jnp.atleast_2d(thetas_scaled)
    if _is_mf_mv(emu):
        if y_exp.shape[0] != emu.n_outputs:
            raise ValueError(
                f"y_exp has {y_exp.shape[0]} observables but this "
                f"multivariate multi-fidelity emulator predicts "
                f"{emu.n_outputs}"
            )
        from madaiemulator_tpu.models.multifidelity import (
            _predict_recursive_mv,
        )

        m_pc, v_pc = _predict_recursive_mv(emu.levels, xq, emu.config)
        mean, var = reconstruct_observables(m_pc, v_pc, emu.pca)
    elif _is_mf(emu):
        if y_exp.shape[0] != 1:
            raise ValueError(
                f"y_exp has {y_exp.shape[0]} observables but a scalar "
                "multi-fidelity emulator predicts exactly 1 output"
            )
        from madaiemulator_tpu.models.multifidelity import _predict_recursive

        m, v = _predict_recursive(emu.levels, xq, emu.config)
        mean, var = m[:, None], v[:, None]
    elif _is_sparse(emu):
        from madaiemulator_tpu.models.sparse import predict_sgpr

        m_pc, v_pc = jax.vmap(
            lambda st, pp: predict_sgpr(st, pp, emu.config, xq)
        )(emu.states, emu.params)
        mean, var = reconstruct_observables(m_pc, v_pc, emu.pca)
    elif getattr(emu, "states", None) is not None:
        if iter_kwargs:
            raise TypeError(
                f"iter_kwargs {sorted(iter_kwargs)} apply to matrix-free "
                "emulators only (a dense emulator would silently ignore "
                "them)"
            )
        m_pc, v_pc = _predict_components(
            emu.states, emu.params, emu.X, emu.Z, xq, emu.config, dZ=emu.dZ
        )
        mean, var = reconstruct_observables(m_pc, v_pc, emu.pca)
    else:
        from madaiemulator_tpu.models.multivariate import (
            predict_multivariate_iterative,
        )

        iter_kwargs.setdefault("variance_method", "precond")
        mean, var = predict_multivariate_iterative(
            emu, unapply_scaling(xq, emu.scaling), states=states,
            **iter_kwargs,
        )
    return implausibility_from_moments(mean, var, y_exp, s2)
