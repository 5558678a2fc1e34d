"""End-to-end hyperparameter fitting on BASELINE.json configs 1 and 2
(1D sin toy; 4D Matérn-3/2 multi-restart). SURVEY.md §3.5 / §4."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madaiemulator_tpu.models.fit import fit_gp, sample_restarts, _bounds_arrays, _u_to_params
from madaiemulator_tpu.models.gp import GPData, gp_posterior, log_marginal_likelihood
from madaiemulator_tpu.utils.config import CovarianceFamily, GPConfig


def test_restart_sampling_in_box():
    cfg = GPConfig(nparams=3, n_restarts=16)
    u = sample_restarts(jax.random.key(0), cfg, 16, dtype=jnp.float64)
    lo, hi = _bounds_arrays(cfg, jnp.float64)
    p = jax.vmap(lambda uu: _u_to_params(uu, lo, hi))(u)
    amp = np.exp(np.asarray(p.log_amp))
    assert np.all(amp >= cfg.amp_bounds[0]) and np.all(amp <= cfg.amp_bounds[1])
    nug = np.exp(np.asarray(p.log_nugget))
    assert np.all(nug >= cfg.nugget_bounds[0]) and np.all(nug <= cfg.nugget_bounds[1])
    ls = np.exp(np.asarray(p.log_ls))
    assert ls.shape == (16, 3)
    assert np.all(ls >= cfg.length_scale_bounds[0])


def test_fit_1d_sin_toy():
    """Config 1: 25-point sin() design, power-exponential kernel, MLE + predict."""
    cfg = GPConfig(nparams=1, regression_order=1, n_restarts=4, max_opt_steps=60)
    X = np.linspace(0.0, 1.0, 25)[:, None]
    y = np.sin(2 * np.pi * X[:, 0])
    data = GPData(X=jnp.asarray(X), y=jnp.asarray(y))
    res = fit_gp(jax.random.key(1), data, cfg)
    assert np.isfinite(float(res.log_likelihood))
    # the fitted model must beat every restart's initial draw and interpolate
    Xs = np.linspace(0.02, 0.98, 101)[:, None]
    mean, var = gp_posterior(res.params, data, jnp.asarray(Xs), cfg)
    rmse = float(jnp.sqrt(jnp.mean((mean - jnp.sin(2 * jnp.pi * Xs[:, 0])) ** 2)))
    assert rmse < 1e-3, rmse
    assert np.all(np.asarray(var) >= 0)


def test_fit_beats_random_params():
    cfg = GPConfig(nparams=1, regression_order=1, n_restarts=4, max_opt_steps=40)
    X = np.linspace(0.0, 1.0, 25)[:, None]
    y = np.sin(2 * np.pi * X[:, 0])
    data = GPData(X=jnp.asarray(X), y=jnp.asarray(y))
    res = fit_gp(jax.random.key(2), data, cfg)
    u0 = sample_restarts(jax.random.key(3), cfg, 8, dtype=jnp.float64)
    lo, hi = _bounds_arrays(cfg, jnp.float64)
    for i in range(8):
        p0 = _u_to_params(jax.tree.map(lambda a: a[i], u0), lo, hi)
        ll0 = float(log_marginal_likelihood(p0, data, cfg))
        assert float(res.log_likelihood) >= ll0 - 1e-9


def test_fit_gp_host_checkpoint_resume(tmp_path):
    """Interrupted-and-resumed host LBFGS must reproduce the uninterrupted
    run exactly (same arithmetic path, state round-tripped through .npz)."""
    from madaiemulator_tpu.models.fit import fit_gp_host

    cfg = GPConfig(nparams=1, regression_order=1, n_restarts=3)
    X = np.linspace(0.0, 1.0, 25)[:, None]
    y = np.sin(2 * np.pi * X[:, 0])
    data = GPData(X=jnp.asarray(X), y=jnp.asarray(y))
    ck = str(tmp_path / "fit_ck.npz")
    res_full = fit_gp_host(jax.random.key(4), data, cfg, max_steps=6)
    # phase 1: run only 3 steps, checkpointing every step
    fit_gp_host(
        jax.random.key(4), data, cfg, max_steps=3,
        checkpoint_path=ck, checkpoint_every=1,
    )
    import os

    assert os.path.exists(ck)
    # phase 2: resume to the full 6 steps
    res_resumed = fit_gp_host(
        jax.random.key(4), data, cfg, max_steps=6,
        checkpoint_path=ck, checkpoint_every=1,
    )
    np.testing.assert_allclose(
        np.asarray(res_resumed.restart_log_likelihoods),
        np.asarray(res_full.restart_log_likelihoods),
        rtol=1e-12,
    )
    # shape-mismatched checkpoints are rejected, not silently misused
    cfg2 = GPConfig(nparams=2, regression_order=1, n_restarts=3)
    X2 = np.random.default_rng(0).uniform(size=(20, 2))
    data2 = GPData(X=jnp.asarray(X2), y=jnp.asarray(np.sin(X2[:, 0])))
    with pytest.raises(ValueError, match="checkpoint"):
        fit_gp_host(
            jax.random.key(4), data2, cfg2, max_steps=2, checkpoint_path=ck
        )
    # SAME theta shapes but different data size: also rejected (theta
    # shapes are N-independent, so shape alone cannot catch a stale
    # checkpoint from another problem — round-3 64k/128k footgun)
    X3 = np.linspace(0.0, 1.0, 30)[:, None]
    data3 = GPData(X=jnp.asarray(X3), y=jnp.asarray(np.sin(2 * np.pi * X3[:, 0])))
    with pytest.raises(ValueError, match="delete it"):
        fit_gp_host(
            jax.random.key(4), data3, cfg, max_steps=2, checkpoint_path=ck
        )


def test_fit_4d_matern_multirestart():
    """Config 2: 4D scalar emulation, Matérn-3/2, multi-restart LBFGS."""
    rng = np.random.default_rng(7)
    d, n = 4, 60
    cfg = GPConfig(
        nparams=d,
        covariance=CovarianceFamily.MATERN32,
        regression_order=1,
        n_restarts=4,
        max_opt_steps=50,
    )
    X = rng.uniform(size=(n, d))
    y = (
        np.sin(3 * X[:, 0])
        + X[:, 1] ** 2
        - 0.5 * X[:, 2] * X[:, 3]
        + 0.01 * rng.standard_normal(n)
    )
    data = GPData(X=jnp.asarray(X), y=jnp.asarray(y))
    res = fit_gp(jax.random.key(4), data, cfg)
    assert np.isfinite(float(res.log_likelihood))
    assert res.restart_log_likelihoods.shape == (4,)
    # held-out accuracy sanity
    Xs = rng.uniform(size=(200, d))
    ys = np.sin(3 * Xs[:, 0]) + Xs[:, 1] ** 2 - 0.5 * Xs[:, 2] * Xs[:, 3]
    mean, _ = gp_posterior(res.params, data, jnp.asarray(Xs), cfg)
    rmse = float(np.sqrt(np.mean((np.asarray(mean) - ys) ** 2)))
    assert rmse < 0.15, rmse


def test_restart_chunking_matches_full_vmap():
    cfg = GPConfig(nparams=1, n_restarts=4, max_opt_steps=15)
    X = np.linspace(0, 1, 12)[:, None]
    y = np.sin(4 * X[:, 0])
    data = GPData(X=jnp.asarray(X), y=jnp.asarray(y))
    full = fit_gp(jax.random.key(6), data, cfg)
    chunked = fit_gp(jax.random.key(6), data, cfg, restart_chunk=2)
    # identical starts; trajectories may diverge slightly when batch fusion
    # changes reduction order, but the optima must agree
    np.testing.assert_allclose(
        np.asarray(full.restart_log_likelihoods),
        np.asarray(chunked.restart_log_likelihoods),
        rtol=1e-3,
    )
    np.testing.assert_allclose(
        float(full.log_likelihood), float(chunked.log_likelihood), rtol=1e-6
    )
    with pytest.raises(ValueError):
        fit_gp(jax.random.key(6), data, cfg, restart_chunk=3)


def test_backtracking_linesearch_fits():
    cfg = GPConfig(
        nparams=1, regression_order=1, n_restarts=3, max_opt_steps=60,
        linesearch="backtracking",
    )
    X = np.linspace(0.0, 1.0, 25)[:, None]
    y = np.sin(2 * np.pi * X[:, 0])
    data = GPData(X=jnp.asarray(X), y=jnp.asarray(y))
    res = fit_gp(jax.random.key(8), data, cfg)
    assert np.isfinite(float(res.log_likelihood))
    Xs = np.linspace(0.02, 0.98, 50)[:, None]
    mean, _ = gp_posterior(res.params, data, jnp.asarray(Xs), cfg)
    rmse = float(np.sqrt(np.mean((np.asarray(mean) - np.sin(2 * np.pi * Xs[:, 0])) ** 2)))
    assert rmse < 5e-3, rmse


def test_fit_gp_host_matches_jitted_quality():
    """The host-loop LBFGS (large-N driver) must reach the same optimum
    quality as the fully-jitted fit on a small problem."""
    from madaiemulator_tpu.models.fit import fit_gp_host

    cfg = GPConfig(nparams=1, regression_order=1, n_restarts=3, max_opt_steps=60)
    X = np.linspace(0.0, 1.0, 25)[:, None]
    y = np.sin(2 * np.pi * X[:, 0])
    data = GPData(X=jnp.asarray(X), y=jnp.asarray(y))
    res_j = fit_gp(jax.random.key(9), data, cfg)
    res_h = fit_gp_host(jax.random.key(9), data, cfg)
    assert np.isfinite(float(res_h.log_likelihood))
    # same starts, different linesearch details: optima agree to ~1%
    assert float(res_h.log_likelihood) > float(res_j.log_likelihood) * 0.98 - 1.0
    Xs = np.linspace(0.02, 0.98, 50)[:, None]
    mean, _ = gp_posterior(res_h.params, data, jnp.asarray(Xs), cfg)
    rmse = float(np.sqrt(np.mean((np.asarray(mean) - np.sin(2 * np.pi * Xs[:, 0])) ** 2)))
    assert rmse < 5e-3, rmse


def test_fit_gp_host_vg_batch_chunking_matches():
    """Chunking the batched value+grad (vg_batch) must not change results:
    the lock-step host LBFGS sees identical numbers either way."""
    from madaiemulator_tpu.models.fit import fit_gp_host

    cfg = GPConfig(nparams=1, regression_order=1, n_restarts=3, max_opt_steps=25)
    X = np.linspace(0.0, 1.0, 20)[:, None]
    y = np.sin(2 * np.pi * X[:, 0])
    data = GPData(X=jnp.asarray(X), y=jnp.asarray(y))
    res_full = fit_gp_host(jax.random.key(11), data, cfg)
    res_chunk = fit_gp_host(jax.random.key(11), data, cfg, vg_batch=2)
    np.testing.assert_allclose(
        np.asarray(res_full.restart_log_likelihoods),
        np.asarray(res_chunk.restart_log_likelihoods),
        rtol=1e-10,
    )
    # vg_batch=1 takes the UNVMAPPED program branch (axon crash workaround;
    # round 3). The unvmapped program fuses/reduces in a different order,
    # so trajectories drift at rounding scale — optima agree, not bits
    # (same class as the batched-vs-solo note in test_ensemble).
    res_one = fit_gp_host(jax.random.key(11), data, cfg, vg_batch=1)
    np.testing.assert_allclose(
        np.asarray(res_full.restart_log_likelihoods),
        np.asarray(res_one.restart_log_likelihoods),
        rtol=1e-4,
    )


def test_fit_gp_host_value_linesearch_quality_and_stats():
    """Value-only backtracking (round-3 overhead fix) must reach the same
    optimum quality as gradient-carrying rounds, populate the stats
    breakdown, and actually use the value-only program."""
    from madaiemulator_tpu.models.fit import fit_gp_host

    cfg = GPConfig(nparams=1, regression_order=1, n_restarts=3, max_opt_steps=40)
    X = np.linspace(0.0, 1.0, 25)[:, None]
    y = np.sin(2 * np.pi * X[:, 0])
    data = GPData(X=jnp.asarray(X), y=jnp.asarray(y))
    res_v = fit_gp_host(jax.random.key(9), data, cfg, value_linesearch=True)
    res_g = fit_gp_host(jax.random.key(9), data, cfg, value_linesearch=False)
    assert np.isfinite(float(res_v.log_likelihood))
    assert float(res_v.log_likelihood) >= float(res_g.log_likelihood) - 1.0
    assert res_v.stats["n_v_calls"] > 0
    assert res_g.stats["n_v_calls"] == 0
    assert res_v.stats["n_steps"] > 0
    assert res_v.stats["fit_wall_s"] > 0


def test_fit_gp_alpha_recovers_exponent(rng):
    """Profile-likelihood grid over the power-exponential exponent
    (widen-past-reference; the upstream pins alpha fixed): data drawn from
    an alpha=1.4 kernel must prefer the rough grid point over alpha=2."""
    from madaiemulator_tpu.models.fit import fit_gp_alpha
    from madaiemulator_tpu.ops.kernels import GPParams, gram_matrix

    d, n = 1, 60
    X = np.sort(rng.uniform(size=(n, d)), axis=0)
    cfg_true = GPConfig(
        nparams=d, regression_order=0, power_exp_alpha=1.4,
        n_restarts=4, max_opt_steps=40,
    )
    p_true = GPParams(
        log_amp=jnp.asarray(0.0),
        log_nugget=jnp.asarray(np.log(1e-4)),
        log_ls=jnp.asarray([np.log(0.15)]),
    )
    C = np.asarray(gram_matrix(jnp.asarray(X), p_true, cfg_true))
    L = np.linalg.cholesky(C)
    y = L @ rng.standard_normal(n)
    data = GPData(X=jnp.asarray(X), y=jnp.asarray(y))

    out = fit_gp_alpha(
        jax.random.key(0), data, cfg_true, alphas=(1.4, 2.0)
    )
    assert out.alphas == (1.4, 2.0)
    assert len(out.alpha_log_likelihoods) == 2
    assert out.alpha == 1.4, out.alpha_log_likelihoods
    assert np.isfinite(float(out.result.log_likelihood))
    # wrong family rejected
    import dataclasses
    from madaiemulator_tpu.utils.config import CovarianceFamily

    with pytest.raises(ValueError, match="power-exponential"):
        fit_gp_alpha(
            jax.random.key(0), data,
            dataclasses.replace(cfg_true, covariance=CovarianceFamily.MATERN32),
        )


def test_fit_gp_alpha_continuous_refinement(rng):
    """refine_iters probes the CONTINUOUS alpha profile inside the winning
    grid bracket via golden-section search: the refined result must (a) add
    off-grid evaluations, (b) never be worse than the grid winner, and (c)
    return the fit whose LML is the max over every evaluated alpha."""
    from madaiemulator_tpu.models.fit import fit_gp_alpha
    from madaiemulator_tpu.ops.kernels import GPParams, gram_matrix

    d, n = 1, 50
    X = np.sort(rng.uniform(size=(n, d)), axis=0)
    cfg_true = GPConfig(
        nparams=d, regression_order=0, power_exp_alpha=1.4,
        n_restarts=2, max_opt_steps=25,
    )
    p_true = GPParams(
        log_amp=jnp.asarray(0.0),
        log_nugget=jnp.asarray(np.log(1e-4)),
        log_ls=jnp.asarray([np.log(0.15)]),
    )
    C = np.asarray(gram_matrix(jnp.asarray(X), p_true, cfg_true))
    y = np.linalg.cholesky(C) @ rng.standard_normal(n)
    data = GPData(X=jnp.asarray(X), y=jnp.asarray(y))

    grid = (1.0, 1.6, 2.0)
    base = fit_gp_alpha(jax.random.key(0), data, cfg_true, alphas=grid)
    out = fit_gp_alpha(
        jax.random.key(0), data, cfg_true, alphas=grid, refine_iters=3
    )
    assert len(out.alphas) > len(grid)  # off-grid probes happened
    assert any(a not in grid for a in out.alphas)
    lls = dict(zip(out.alphas, out.alpha_log_likelihoods))
    finite = {a: v for a, v in lls.items() if np.isfinite(v)}
    # the returned fit IS the argmax over every evaluated alpha
    assert out.alpha == max(finite, key=finite.get)
    assert float(out.result.log_likelihood) == lls[out.alpha]
    # refinement never loses to the pure grid
    assert lls[out.alpha] >= float(base.result.log_likelihood) - 1e-9
    # probes stay inside the valid exponent range
    assert all(0.1 <= a <= 2.0 for a in out.alphas)


def test_fit_is_deterministic():
    cfg = GPConfig(nparams=1, n_restarts=2, max_opt_steps=20)
    X = np.linspace(0, 1, 10)[:, None]
    y = np.sin(4 * X[:, 0])
    data = GPData(X=jnp.asarray(X), y=jnp.asarray(y))
    r1 = fit_gp(jax.random.key(5), data, cfg)
    r2 = fit_gp(jax.random.key(5), data, cfg)
    assert float(r1.log_likelihood) == float(r2.log_likelihood)
    for a, b in zip(r1.params, r2.params):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_rescue_sweeps_to_long_ls_window():
    """The dead-start rescue must revive lanes when the feasible theta
    region is LONG length scales only — the iterative path's situation at
    dense designs (N=32k d=4: short-ls systems are unsolvable in f32, so
    a short-ls-only fallback ladder left every lane dead and the fit
    silently returned an unoptimized fallback; measured 2026-08-18)."""
    from madaiemulator_tpu.models.fit import fit_gp_host

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(16, 2)), jnp.float32)
    y = jnp.asarray(rng.standard_normal(16), jnp.float32)
    cfg = GPConfig(nparams=2, n_restarts=2, max_opt_steps=8)

    def gated_lml(params, data, config):
        # feasible iff every length scale > 0.3 (the smooth region);
        # smooth bowl with its optimum at ls = 1, amp = nugget*1e3 = 1
        ll = -(
            jnp.sum(params.log_ls**2)
            + params.log_amp**2
            + (params.log_nugget + 6.9) ** 2
        )
        ok = jnp.min(params.log_ls) > jnp.log(0.3)
        return jnp.where(ok, ll, -jnp.inf)

    res = fit_gp_host(
        jax.random.key(123), GPData(X=X, y=y), cfg, lml_fn=gated_lml
    )
    assert np.isfinite(float(res.log_likelihood))
    ls = np.exp(np.asarray(res.params.log_ls))
    assert np.all(ls > 0.3)
    # the optimizer actually moved toward the bowl's optimum
    assert float(res.log_likelihood) > -2.0


def test_all_dead_restarts_warn_loudly(caplog):
    """A fit where NO theta is feasible must warn, not silently return a
    fallback as if it were a fit."""
    import logging

    from madaiemulator_tpu.models.fit import fit_gp_host

    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.uniform(size=(8, 2)), jnp.float32)
    y = jnp.asarray(rng.standard_normal(8), jnp.float32)
    cfg = GPConfig(nparams=2, n_restarts=2, max_opt_steps=4)

    def dead_lml(params, data, config):
        return jnp.asarray(-jnp.inf, jnp.float32) * jnp.sum(params.log_ls) ** 0

    with caplog.at_level(logging.WARNING, logger="madaiemulator_tpu.models.fit"):
        res = fit_gp_host(
            jax.random.key(5), GPData(X=X, y=y), cfg, lml_fn=dead_lml
        )
    assert not np.isfinite(float(res.log_likelihood))
    assert any("infeasible" in r.message for r in caplog.records)
