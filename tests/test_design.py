"""Sequential design: greedy maximin selection, variance acquisition,
history-matching NROY waves."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madaiemulator_tpu.models import design
from madaiemulator_tpu.models.calibrate import implausibility
from madaiemulator_tpu.models.multivariate import fit_multivariate
from madaiemulator_tpu.utils.config import GPConfig
from madaiemulator_tpu.utils.designs import apply_scaling


def simulator(theta):
    a, b = theta[..., 0], theta[..., 1]
    return np.stack([a * np.sin(3 * b), a + b**2, np.cos(a * b)], axis=-1)


def fit_emu(X, rng, param_ranges=None, **cfg_kw):
    Y = simulator(X) + 0.01 * rng.standard_normal((X.shape[0], 3))
    cfg = GPConfig(nparams=2, regression_order=1, n_restarts=2,
                   max_opt_steps=25, **cfg_kw)
    return fit_multivariate(
        jax.random.key(0), jnp.asarray(X), jnp.asarray(Y), cfg,
        pca_variance=0.999, param_ranges=param_ranges,
    )


def test_greedy_maximin_properties():
    pts = jnp.asarray(
        [[0.0, 0.0], [0.1, 0.0], [1.0, 1.0], [0.0, 1.0], [0.5, 0.5]]
    )
    w = jnp.asarray([1.0, 0.9, 0.8, 0.7, 0.0])
    sel, scr = design._greedy_maximin(pts, w, 4)
    sel = np.asarray(sel)
    # first pick is the heaviest; no duplicates; zero-weight never chosen
    assert sel[0] == 0
    assert len(set(sel.tolist())) == 4
    assert 4 not in sel
    # second pick trades weight for distance: (1,1) at w=0.8 d2=2 beats
    # (0.1,0) at w=0.9 d2=0.01
    assert sel[1] == 2
    assert np.all(np.asarray(scr) >= 0)


def test_active_variance_targets_gaps(rng):
    # train only on the [0, 0.5]^2 quadrant of the DECLARED [0,1]^2 box
    # (the candidate pool spans the declared box, not the data hull)...
    X = rng.uniform(0.0, 0.5, size=(30, 2))
    emu = fit_emu(
        X, rng, param_ranges=(np.zeros(2), np.ones(2))
    )
    prop = design.active_variance_design(
        jax.random.key(1), emu, n_new=8, pool_size=2048
    )
    assert prop.points.shape == (8, 2)
    assert prop.pool_fraction_viable == 1.0
    # ...so acquisition must concentrate outside the trained quadrant
    # (most picks — the maximin spacing factor legitimately spends a
    # couple of picks spreading through moderately-uncertain areas)
    outside = np.any(prop.points > 0.55, axis=1)
    assert outside.mean() >= 0.6, prop.points
    # and picks sit farther from the training data than random pool points
    def nearest(a, b):
        return np.sqrt(
            (((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)).min(axis=1)
        )
    rng2 = np.random.default_rng(0)
    base = nearest(rng2.uniform(size=(512, 2)), X).mean()
    assert nearest(prop.points, X).mean() > 1.3 * base
    # batch is spread out, not collapsed on one variance peak
    d2 = ((prop.points[:, None, :] - prop.points[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    assert np.sqrt(d2.min()) > 0.02


def test_active_variance_custom_pool(rng):
    X = rng.uniform(size=(25, 2))
    emu = fit_emu(X, rng)
    pool = jnp.asarray(rng.uniform(size=(256, 2)), dtype=emu.X.dtype)
    prop = design.active_variance_design(
        jax.random.key(2), emu, n_new=4, pool=pool
    )
    # picks come from the supplied pool (natural space == scaled here since
    # the training design spans ~[0,1])
    assert prop.points.shape == (4, 2)


def test_nroy_wave_respects_implausibility(rng):
    X = rng.uniform(0.0, 2.0, size=(40, 2))
    emu = fit_emu(X, rng)
    theta_true = np.array([1.1, 0.6])
    y_exp = simulator(theta_true)
    exp_var = np.full(3, 0.05**2)
    prop = design.nroy_wave_design(
        jax.random.key(3), emu, y_exp, exp_var, n_new=6, pool_size=4096
    )
    assert prop.points.shape == (6, 2)
    assert 0.0 < prop.pool_fraction_viable < 1.0
    # every pick is genuinely NROY under the library's own statistic
    xs = apply_scaling(jnp.asarray(prop.points, emu.X.dtype), emu.scaling)
    I = np.asarray(implausibility(emu, y_exp, exp_var, xs))
    assert np.all(I <= 3.0 + 1e-4), I
    # full-covariance exp_var is accepted (diagonal used)
    prop2 = design.nroy_wave_design(
        jax.random.key(3), emu, y_exp, np.diag(exp_var), n_new=6,
        pool_size=4096,
    )
    np.testing.assert_allclose(prop2.points, prop.points)


def test_nroy_fallback_when_nothing_viable(rng):
    X = rng.uniform(0.0, 2.0, size=(40, 2))
    emu = fit_emu(X, rng)
    y_exp = simulator(np.array([1.0, 1.0]))
    tiny_var = np.full(3, 1e-12)  # nothing can match this precisely
    prop = design.nroy_wave_design(
        jax.random.key(4), emu, y_exp, tiny_var, n_new=5, pool_size=1024,
        threshold=0.01,
    )
    assert prop.pool_fraction_viable == 0.0
    assert prop.points.shape == (5, 2)
    # fallback picks are the least-implausible region: better than random
    xs = apply_scaling(jnp.asarray(prop.points, emu.X.dtype), emu.scaling)
    I_sel = np.asarray(implausibility(emu, y_exp, tiny_var, xs))
    pool = jax.random.uniform(jax.random.key(9), (512, 2), dtype=emu.X.dtype)
    I_pool = np.asarray(implausibility(emu, y_exp, tiny_var, pool))
    assert I_sel.mean() < np.median(I_pool)


def test_wave_loop_shrinks_nroy(rng):
    """One refinement wave: adding NROY-targeted runs and refitting must
    not grow the NROY fraction (it concentrates as the emulator sharpens
    where it matters)."""
    X = rng.uniform(0.0, 2.0, size=(25, 2))
    emu = fit_emu(X, rng)
    theta_true = np.array([0.9, 0.8])
    y_exp = simulator(theta_true)
    exp_var = np.full(3, 0.08**2)
    pool = jax.random.uniform(jax.random.key(7), (4096, 2), dtype=emu.X.dtype)
    prop = design.nroy_wave_design(
        jax.random.key(5), emu, y_exp, exp_var, n_new=15, pool=pool
    )
    frac0 = prop.pool_fraction_viable
    X2 = np.concatenate([X, prop.points], axis=0)
    emu2 = fit_emu(X2, rng)
    prop2 = design.nroy_wave_design(
        jax.random.key(6), emu2, y_exp, exp_var, n_new=15, pool=pool
    )
    assert prop2.pool_fraction_viable <= frac0 * 1.5 + 0.02, (
        frac0, prop2.pool_fraction_viable)


def test_nroy_partial_viable_no_duplicates(rng):
    """0 < #viable < n_new: the viable points are picked first and the
    remaining picks fall through to DISTINCT well-spaced least-implausible
    points (regression: 0/1 weights made every post-viable greedy score tie
    at 0, so argmax returned duplicate copies of pool[0])."""
    X = rng.uniform(0.0, 2.0, size=(40, 2))
    emu = fit_emu(X, rng)
    y_exp = simulator(np.array([1.1, 0.6]))
    exp_var = np.full(3, 0.05**2)
    pool = jax.random.uniform(jax.random.key(11), (512, 2), dtype=emu.X.dtype)
    xs_pool = pool  # already scaled coords
    I_pool = np.asarray(implausibility(emu, y_exp, exp_var, xs_pool))
    # threshold admitting exactly the 2 least-implausible pool points
    srt = np.sort(I_pool)
    thr = float(0.5 * (srt[1] + srt[2]))
    prop = design.nroy_wave_design(
        jax.random.key(5), emu, y_exp, exp_var, n_new=6, pool=pool,
        threshold=thr,
    )
    assert np.isclose(prop.pool_fraction_viable, 2.0 / 512.0)
    pts = prop.points
    assert pts.shape == (6, 2)
    # no duplicate picks
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    assert d2.min() > 1e-10, pts
    # both viable pool points are in the batch
    viable_idx = np.argsort(I_pool)[:2]
    sel_scaled = np.asarray(
        apply_scaling(jnp.asarray(pts, emu.X.dtype), emu.scaling)
    )
    for i in viable_idx:
        gap = ((sel_scaled - np.asarray(pool)[i]) ** 2).sum(-1).min()
        assert gap < 1e-10, (i, gap)
    # the fall-through picks favor low implausibility vs the pool at large
    I_sel = np.asarray(implausibility(emu, y_exp, exp_var,
                                      jnp.asarray(sel_scaled, emu.X.dtype)))
    assert I_sel.mean() < np.median(I_pool)


def test_design_matrix_free_matches_dense(rng):
    """Both acquisitions accept an IterativeMultivariateEmulator: at tight
    CG tolerance the matrix-free pool moments reproduce the dense ones, so
    the selected batches are identical."""
    from madaiemulator_tpu.models.multivariate import (
        IterativeMultivariateEmulator,
    )

    X = rng.uniform(0.0, 1.0, size=(40, 2))
    emu = fit_emu(X, rng)
    it = IterativeMultivariateEmulator(
        scaling=emu.scaling, X=emu.X, Z=emu.Z, pca=emu.pca,
        params=emu.params, config=emu.config,
    )
    pool = jax.random.uniform(jax.random.key(3), (256, 2), dtype=emu.X.dtype)
    # exact-PCG variance for the parity pin (the default is the PCG-free
    # precond lower bound, exercised separately below)
    kw = dict(rank=16, cg_tol=1e-12, cg_max_iters=512,
              variance_method="exact")
    pd = design.active_variance_design(jax.random.key(1), emu, n_new=5, pool=pool)
    pi = design.active_variance_design(
        jax.random.key(1), it, n_new=5, pool=pool, **kw
    )
    np.testing.assert_allclose(pi.points, pd.points, rtol=1e-7, atol=1e-9)
    # the default (precond variance) also yields a full-rank-identical
    # batch: at rank == N the preconditioner IS the covariance
    kw_full = dict(rank=40, cg_tol=1e-12, cg_max_iters=512)
    pp = design.active_variance_design(
        jax.random.key(1), it, n_new=5, pool=pool, **kw_full
    )
    np.testing.assert_allclose(pp.points, pd.points, rtol=1e-6, atol=1e-8)
    y_exp = simulator(np.array([0.6, 0.4]))
    exp_var = np.full(3, 0.05**2)
    pdn = design.nroy_wave_design(
        jax.random.key(2), emu, y_exp, exp_var, n_new=5, pool=pool
    )
    pin = design.nroy_wave_design(
        jax.random.key(2), it, y_exp, exp_var, n_new=5, pool=pool, **kw
    )
    # the cached-states path with the default (precond) variance matches
    # dense at full preconditioner rank — and proves variance_method is
    # actually forwarded through predict_multivariate_iterative(states=...)
    # (a dropped kwarg once resurrected the wide-RHS PCG crash at N=32k)
    from madaiemulator_tpu.models.multivariate import (
        precompute_iterative_multivariate,
    )

    st40 = precompute_iterative_multivariate(
        it, rank=40, cg_tol=1e-12, cg_max_iters=512
    )
    pst = design.nroy_wave_design(
        jax.random.key(2), it, y_exp, exp_var, n_new=5, pool=pool,
        states=st40,
    )
    np.testing.assert_allclose(pst.points, pdn.points, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(pin.points, pdn.points, rtol=1e-7, atol=1e-9)
    assert np.isclose(pin.pool_fraction_viable, pdn.pool_fraction_viable)
