"""Sparse variational GP regression (models/sparse.py): SGPR correctness
against the exact dense path, the multivariate layer, the snapshot
grammar, and the CLI surface. Beyond-reference: the reference (SURVEY.md
§2; mount empty) has no approximate-inference capability — its N ceiling
is its dense Cholesky."""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madaiemulator_tpu.models import sparse
from madaiemulator_tpu.models.gp import (
    GPData,
    gp_posterior,
    log_marginal_likelihood,
)
from madaiemulator_tpu.ops.kernels import GPParams
from madaiemulator_tpu.utils.config import CovarianceFamily, GPConfig

CLI = [sys.executable, "-m", "madaiemulator_tpu.cli"]


def _params(d, ls=0.3, nugget=1e-2, amp=1.0):
    return GPParams(
        log_amp=jnp.log(jnp.asarray(amp)),
        log_nugget=jnp.log(jnp.asarray(nugget)),
        log_ls=jnp.log(jnp.full((d,), ls)),
    )


def _toy(rng, n=60, d=2):
    X = jnp.asarray(rng.uniform(0, 1, (n, d)))
    y = (
        jnp.sin(3 * X[:, 0]) + 0.5 * X[:, 1]
        + 0.01 * jnp.asarray(rng.normal(size=n))
    )
    return GPData(X=X, y=y)


@pytest.mark.parametrize("reml", [False, True])
def test_elbo_equals_lml_when_inducing_is_full(rng, reml):
    """Z = X makes Q_nn = K_nn: the collapsed bound IS the exact GLS
    log-marginal likelihood (up to the m x m jitter)."""
    data = _toy(rng)
    cfg = GPConfig(nparams=2, regression_order=1, reml=reml)
    p = _params(2)
    lml = float(log_marginal_likelihood(p, data, cfg))
    el = float(sparse.elbo(p, data, cfg, data.X))
    assert abs(lml - el) < 1e-2 * abs(lml) + 0.2, (lml, el)


def test_elbo_is_a_lower_bound_and_monotone_in_m(rng):
    data = _toy(rng, n=80)
    cfg = GPConfig(nparams=2, regression_order=1)
    p = _params(2)
    lml = float(log_marginal_likelihood(p, data, cfg))
    els = [
        float(sparse.elbo(p, data, cfg, sparse.select_inducing(data.X, m)))
        for m in (10, 25, 50, 80)
    ]
    for el in els:
        assert el <= lml + 1e-6
    # greedy-maximin nesting is not exact, but the trend must hold
    assert els[-1] > els[0]


def test_predictions_match_dense_at_full_inducing(rng):
    data = _toy(rng)
    cfg = GPConfig(nparams=2, regression_order=1)
    p = _params(2)
    st = sparse.sgpr_precompute(p, data, cfg, data.X)
    Xq = jnp.asarray(rng.uniform(0.1, 0.9, (17, 2)))
    m_s, v_s = sparse.predict_sgpr(st, p, cfg, Xq)
    m_d, v_d = gp_posterior(p, data, Xq, cfg)
    # both differ from dense by O(jitter_m) = 1e-6 * amp (the K_mm
    # stabilizer the dense path does not have)
    np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_d),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_d),
                               rtol=1e-4, atol=1e-5)


def test_variance_includes_nugget_flag(rng):
    data = _toy(rng)
    p = _params(2)
    Xq = jnp.asarray(rng.uniform(0.1, 0.9, (5, 2)))
    outs = []
    for flag in (True, False):
        cfg = GPConfig(nparams=2, regression_order=1,
                       predict_variance_includes_nugget=flag)
        st = sparse.sgpr_precompute(p, data, cfg, data.X[:20])
        outs.append(sparse.predict_sgpr(st, p, cfg, Xq)[1])
    np.testing.assert_allclose(
        np.asarray(outs[0] - outs[1]), np.exp(float(p.log_nugget)),
        rtol=1e-9,
    )


def test_fit_sgpr_recovers_function_past_dense_default(rng):
    """N=2000, m=40: sub-noise-floor recovery of a smooth 2-d surface."""
    n = 2000
    X = jnp.asarray(rng.uniform(0, 1, (n, 2)))
    f = lambda X: jnp.sin(4 * X[:, 0]) * jnp.cos(2 * X[:, 1]) + X[:, 1]
    y = f(X) + 0.05 * jnp.asarray(rng.normal(size=n))
    cfg = GPConfig(nparams=2, regression_order=1)
    res = sparse.fit_sgpr(jax.random.key(1), GPData(X=X, y=y), cfg,
                          inducing=40, n_restarts=3, max_steps=50)
    assert bool(res.state.ok)
    Xq = jnp.asarray(rng.uniform(0.05, 0.95, (300, 2)))
    m, v = sparse.predict_sgpr(res.state, res.params, cfg, Xq)
    rmse = float(jnp.sqrt(jnp.mean((m - f(Xq)) ** 2)))
    assert rmse < 0.05, rmse
    assert bool(jnp.all(v >= 0))


@pytest.mark.parametrize("noise", [False, True])
def test_streamed_row_chunk_matches_one_shot(rng, noise):
    """The block-accumulated summary path (row_chunk; jax.checkpoint per
    chunk — the memory-flat N=1e6 route) reproduces the one-shot ELBO,
    its gradient, AND the serve state exactly, including a padded tail
    (700 % 128 != 0)."""
    n = 700
    X = jnp.asarray(rng.uniform(0, 1, (n, 2)))
    y = jnp.sin(3 * X[:, 0]) + 0.5 * X[:, 1]
    nz = jnp.asarray(10.0 ** rng.uniform(-4, -2, size=n)) if noise else None
    data = GPData(X=X, y=y, noise=nz)
    cfg = GPConfig(nparams=2, regression_order=2, reml=True)
    p = _params(2)
    Z = sparse.select_inducing(X, 30)
    e_full = sparse.elbo(p, data, cfg, Z)
    e_chunk = sparse.elbo(p, data, cfg, Z, row_chunk=128)
    np.testing.assert_allclose(float(e_chunk), float(e_full), rtol=1e-9)
    g_full = jax.grad(lambda q: sparse.elbo(q, data, cfg, Z))(p)
    g_chunk = jax.grad(
        lambda q: sparse.elbo(q, data, cfg, Z, row_chunk=128)
    )(p)
    for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_chunk)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-9)
    st_f = sparse.sgpr_precompute(p, data, cfg, Z)
    st_c = sparse.sgpr_precompute(p, data, cfg, Z, row_chunk=128)
    for a, b in zip(jax.tree.leaves(st_f)[:-1], jax.tree.leaves(st_c)[:-1]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-7, atol=1e-8)


def test_restart_chunk_matches_unchunked(rng):
    data = _toy(rng)
    cfg = GPConfig(nparams=2, regression_order=1)
    r1 = sparse.fit_sgpr(jax.random.key(0), data, cfg, inducing=15,
                         n_restarts=4, max_steps=20)
    r2 = sparse.fit_sgpr(jax.random.key(0), data, cfg, inducing=15,
                         n_restarts=4, max_steps=20, restart_chunk=2)
    # lax.map-over-groups vs one vmap differ only in reduction order;
    # through 20 LBFGS steps that drifts O(1e-8) relative, not more
    np.testing.assert_allclose(np.asarray(r1.restart_elbos),
                               np.asarray(r2.restart_elbos), rtol=1e-6)


def test_fit_sgpr_host_matches_jitted_quality(rng):
    """The host-loop driver (fit_gp_host machinery with the streamed ELBO
    objective — the million-point route) reaches a comparable optimum and
    a servable state."""
    n = 800
    X = jnp.asarray(rng.uniform(0, 1, (n, 2)))
    f = lambda X: jnp.sin(4 * X[:, 0]) * jnp.cos(2 * X[:, 1]) + X[:, 1]
    y = f(X) + 0.05 * jnp.asarray(rng.normal(size=n))
    cfg = GPConfig(nparams=2, regression_order=1)
    data = GPData(X=X, y=y)
    jitted = sparse.fit_sgpr(jax.random.key(3), data, cfg, inducing=30,
                             n_restarts=2, max_steps=30)
    host = sparse.fit_sgpr_host(jax.random.key(3), data, cfg, inducing=30,
                                n_restarts=2, max_steps=30, row_chunk=256)
    assert bool(host.state.ok)
    assert float(host.elbo) > float(jitted.elbo) - 10.0
    Xq = jnp.asarray(rng.uniform(0.05, 0.95, (200, 2)))
    m, v = sparse.predict_sgpr(host.state, host.params, cfg, Xq)
    rmse = float(jnp.sqrt(jnp.mean((m - f(Xq)) ** 2)))
    assert rmse < 0.08, rmse
    assert bool(jnp.all(v >= 0))


def test_inducing_optimization_improves_bad_init(rng):
    """Adam on (hypers, Z) rescues inducing points clustered in a corner
    — inducing locations as continuous trainables, no dense analogue."""
    n = 1200
    X = jnp.asarray(rng.uniform(0, 1, (n, 2)))
    f = lambda X: jnp.sin(4 * X[:, 0]) * jnp.cos(2 * X[:, 1]) + X[:, 1]
    y = f(X) + 0.05 * jnp.asarray(rng.normal(size=n))
    cfg = GPConfig(nparams=2, regression_order=1)
    data = GPData(X=X, y=y)
    Z0 = jnp.asarray(rng.uniform(0, 0.3, (15, 2)))
    fixed = sparse.fit_sgpr(jax.random.key(2), data, cfg, inducing=Z0,
                            n_restarts=2, max_steps=30)
    opt = sparse.fit_sgpr(jax.random.key(2), data, cfg, inducing=Z0,
                          n_restarts=2, max_steps=30,
                          inducing_opt_steps=200, inducing_lr=3e-2)
    assert float(opt.elbo) > float(fixed.elbo) + 1.0


def test_heteroscedastic_noise_downweights_noisy_points(rng):
    """A point with huge declared noise must not bend the posterior."""
    n = 200
    X = jnp.asarray(np.linspace(0, 1, n))[:, None]
    y = jnp.sin(4 * X[:, 0])
    y = y.at[100].add(2.0)  # corrupted observation
    nz = jnp.full((n,), 1e-6).at[100].set(25.0)
    cfg = GPConfig(nparams=1, regression_order=0)
    res = sparse.fit_sgpr(jax.random.key(0), GPData(X=X, y=y, noise=nz),
                          cfg, inducing=25, n_restarts=2, max_steps=40)
    Xq = jnp.asarray([[100.0 / (n - 1)]])
    m, _ = sparse.predict_sgpr(res.state, res.params, cfg, Xq)
    # the posterior follows sin, not the outlier
    assert abs(float(m[0]) - float(jnp.sin(4 * Xq[0, 0]))) < 0.1


# --- Gradient-enhanced SGPR --------------------------------------------------
#
# Gradient observations join the joint likelihood as extra rows against the
# m inducing VALUES (models/sparse._sgpr_system) — the sparse counterpart
# of the dense joint path. The serve state's shape is unchanged, so the
# snapshot grammar / pipe / C++ serve gradient-trained emulators as-is.


def _grad_toy(rng, n=14, d=2):
    X = jnp.asarray(rng.uniform(0, 1, (n, d)))
    y = jnp.sin(3 * X[:, 0]) + 0.5 * X[:, 1] ** 2
    dY = jnp.stack([3 * jnp.cos(3 * X[:, 0]), X[:, 1]], axis=1)
    return GPData(X=X, y=y, dY=dY)


def test_sgpr_gradient_elbo_streamed_and_bounded(rng):
    """Joint-rows ELBO: streamed (row_chunk) equals one-shot exactly, and
    the Titsias bound sits below the dense JOINT value+gradient LML."""
    data = _grad_toy(rng, n=30)
    cfg = GPConfig(nparams=2, regression_order=1)
    p = _params(2, ls=0.4, nugget=1e-4)
    Z = data.X[:10]
    e1 = float(sparse.elbo(p, data, cfg, Z))
    e2 = float(sparse.elbo(p, data, cfg, Z, row_chunk=8))
    np.testing.assert_allclose(e1, e2, rtol=1e-10)
    lml_joint = float(log_marginal_likelihood(p, data, cfg))
    assert e1 <= lml_joint + 1e-6, (e1, lml_joint)
    # gradients change the fit: value-only ELBO is a different quantity
    e_v = float(sparse.elbo(p, GPData(X=data.X, y=data.y), cfg, Z))
    assert not np.isclose(e1, e_v)


def test_sgpr_gradients_beat_value_only_on_scarce_design(rng):
    """On a scarce design, (value, gradient) observations per run carry
    ~(1+d)x the information: the gradient fit must beat the value-only
    fit at the SAME inducing budget."""
    data = _grad_toy(rng, n=14)
    cfg = GPConfig(nparams=2, regression_order=1)
    fit_g = sparse.fit_sgpr(jax.random.key(0), data, cfg, inducing=14,
                            n_restarts=3, max_steps=60)
    fit_v = sparse.fit_sgpr(jax.random.key(0),
                            GPData(X=data.X, y=data.y), cfg, inducing=14,
                            n_restarts=3, max_steps=60)
    Xq = jnp.asarray(rng.uniform(0.05, 0.95, (300, 2)))
    truth = jnp.sin(3 * Xq[:, 0]) + 0.5 * Xq[:, 1] ** 2
    mg, vg = sparse.predict_sgpr(fit_g.state, fit_g.params, cfg, Xq)
    mv, _ = sparse.predict_sgpr(fit_v.state, fit_v.params, cfg, Xq)
    rg = float(jnp.sqrt(jnp.mean((mg - truth) ** 2)))
    rv = float(jnp.sqrt(jnp.mean((mv - truth) ** 2)))
    assert rg < rv, (rg, rv)
    assert bool(jnp.all(vg >= 0))


def test_sgpr_gradient_noise_and_rejections(rng):
    """Known per-partial gradient noise flows into the joint D; h_extra
    cannot combine with dY (same rule as the dense path); Matern-3/2 has
    no gradient prior and is rejected by the kernel layer."""
    data = _grad_toy(rng)
    cfg = GPConfig(nparams=2, regression_order=1)
    dn = jnp.full(data.dY.shape, 1e-4)
    fit = sparse.fit_sgpr(jax.random.key(0), data._replace(dY_noise=dn),
                          cfg, inducing=10, n_restarts=2, max_steps=30)
    assert np.isfinite(float(fit.elbo))
    p = _params(2)
    with pytest.raises(ValueError, match="h_extra and dY"):
        sparse.elbo(p, data._replace(h_extra=jnp.ones((14, 1))), cfg,
                    data.X[:5])
    cfg32 = GPConfig(nparams=2,
                     covariance=CovarianceFamily.MATERN32)
    with pytest.raises(ValueError, match="differentiab"):
        sparse.elbo(p, data, cfg32, data.X[:5])


def test_multivariate_sparse_with_gradients_round_trips(rng, tmp_path):
    """fit_multivariate_sparse(gradients=...): exact PC-space gradient
    projection + per-component joint SGPR; the resulting emulator beats
    its value-only twin and — because the serve state is unchanged —
    persists through the EXISTING sparse snapshot grammar."""
    from madaiemulator_tpu.io.snapshot import (
        read_snapshot_auto,
        write_snapshot_auto,
    )

    n = 16
    X = rng.uniform(1.0, 3.0, (n, 2))
    g1 = np.sin(2 * X[:, 0]) + X[:, 1]
    g2 = X[:, 0] * X[:, 1]
    Y = np.stack([g1, g2], axis=1)
    dY = np.stack([
        np.stack([2 * np.cos(2 * X[:, 0]), np.ones(n)], axis=1),
        np.stack([X[:, 1], X[:, 0]], axis=1),
    ], axis=2)  # (n, d, t) raw-input gradients
    cfg = GPConfig(nparams=2, regression_order=1)
    emu_g = sparse.fit_multivariate_sparse(
        jax.random.key(0), X, Y, cfg, pca_variance=0.999, inducing=n,
        n_restarts=3, max_steps=60, gradients=dY,
    )
    emu_v = sparse.fit_multivariate_sparse(
        jax.random.key(0), X, Y, cfg, pca_variance=0.999, inducing=n,
        n_restarts=3, max_steps=60,
    )
    Xq = rng.uniform(1.1, 2.9, (200, 2))
    truth = np.stack([np.sin(2 * Xq[:, 0]) + Xq[:, 1],
                      Xq[:, 0] * Xq[:, 1]], axis=1)
    mg, vgv = sparse.predict_multivariate_sparse(emu_g, jnp.asarray(Xq))
    mv, _ = sparse.predict_multivariate_sparse(emu_v, jnp.asarray(Xq))
    rg = float(np.sqrt(np.mean((np.asarray(mg) - truth) ** 2)))
    rv = float(np.sqrt(np.mean((np.asarray(mv) - truth) ** 2)))
    assert rg < rv, (rg, rv)
    assert bool(jnp.all(vgv >= 0))
    # serve state is inducing-space only -> the existing grammar persists
    # a gradient-trained emulator unchanged
    path = str(tmp_path / "g.txt")
    write_snapshot_auto(path, emu_g, ["a", "b"], ["o0", "o1"])
    emu2, _, _ = read_snapshot_auto(path)
    m2, v2 = sparse.predict_multivariate_sparse(emu2, jnp.asarray(Xq))
    np.testing.assert_allclose(np.asarray(m2), np.asarray(mg), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(vgv), rtol=1e-7,
                               atol=1e-14)


def _mv_problem(rng, n=500):
    X = rng.uniform(1.0, 3.0, (n, 2))
    g1 = np.sin(2 * X[:, 0]) + X[:, 1]
    g2 = X[:, 0] * X[:, 1]
    Y = np.stack([g1, g2, g1 - g2], axis=1) + 0.02 * rng.normal(size=(n, 3))
    return jnp.asarray(X), jnp.asarray(Y)


def _mv_truth(Xq):
    t1 = np.sin(2 * Xq[:, 0]) + Xq[:, 1]
    t2 = Xq[:, 0] * Xq[:, 1]
    return np.stack([t1, t2, t1 - t2], axis=1)


def test_multivariate_sparse_accuracy_and_noise(rng):
    X, Y = _mv_problem(rng)
    cfg = GPConfig(nparams=2, regression_order=1)
    emu = sparse.fit_multivariate_sparse(
        jax.random.key(0), X, Y, cfg, pca_variance=0.999, inducing=40,
        n_restarts=2, max_steps=40,
    )
    Xq = rng.uniform(1.2, 2.8, (100, 2))
    m, v = sparse.predict_multivariate_sparse(emu, jnp.asarray(Xq))
    rmse = float(np.sqrt(np.mean((np.asarray(m) - _mv_truth(Xq)) ** 2)))
    # output scale is O(1-9); m=40 inducing over N=500 with a 0.02 noise
    # floor and a short restart budget lands ~0.01-0.06 across seeds
    assert rmse < 0.08, rmse
    assert bool(jnp.all(v >= 0))
    # noise path accepts (N,) and (N, t)
    emu2 = sparse.fit_multivariate_sparse(
        jax.random.key(0), X, Y, cfg, pca_variance=0.999, inducing=40,
        n_restarts=2, max_steps=30,
        noise=jnp.asarray(10.0 ** rng.uniform(-4, -2, size=X.shape[0])),
    )
    m2, _ = sparse.predict_multivariate_sparse(emu2, jnp.asarray(Xq))
    assert float(np.sqrt(np.mean((np.asarray(m2) - _mv_truth(Xq)) ** 2))) < 0.08


def test_training_summary_sparse(rng):
    """The public calibration-summary helper on the training set: an SGPR
    posterior has m << N effective dof, so training residuals are real
    out-of-subspace error and the Titsias-bound variance should give
    coverage at or above the interval target."""
    from madaiemulator_tpu.models.diagnostics import training_summary_sparse

    X, Y = _mv_problem(rng)
    cfg = GPConfig(nparams=2, regression_order=1)
    emu = sparse.fit_multivariate_sparse(
        jax.random.key(0), X, Y, cfg, pca_variance=0.999, inducing=40,
        n_restarts=2, max_steps=40,
    )
    s = training_summary_sparse(emu, X, jnp.asarray(Y), interval=0.95,
                                query_chunk=128)  # force multi-chunk path
    assert s["rmse"] < 0.1, s
    assert s["coverage"] >= 0.9, s  # conservative bound => at/above target
    # chunking must not change the answer
    s1 = training_summary_sparse(emu, X, jnp.asarray(Y), interval=0.95,
                                 query_chunk=4096)
    np.testing.assert_allclose(s["rmse"], s1["rmse"], rtol=1e-10)
    np.testing.assert_allclose(s["coverage"], s1["coverage"], rtol=1e-12)


def test_sparse_emulator_calibrates_in_graph(rng):
    """Million-point-capable calibration: the MCMC chain walks against the
    O(m^2) SGPR serve state in-graph and recovers the true parameters."""
    from madaiemulator_tpu.models.calibrate import calibrate, implausibility

    X, Y = _mv_problem(rng, n=600)
    cfg = GPConfig(nparams=2, regression_order=1)
    emu = sparse.fit_multivariate_sparse(
        jax.random.key(0), X, Y, cfg, pca_variance=0.999, inducing=40,
        n_restarts=2, max_steps=40,
    )
    theta_true = np.array([1.8, 2.4])
    y_exp = _mv_truth(theta_true[None, :])[0]
    exp_var = np.full(3, 1e-3)
    res = calibrate(
        jax.random.key(1), emu, y_exp, exp_var, n_walkers=32,
        n_steps=400, burn_in=200,
    )
    post_mean = res.samples.reshape(-1, 2).mean(axis=0)
    np.testing.assert_allclose(post_mean, theta_true, atol=0.15)
    # implausibility screens against the same state: the truth is NROY,
    # a far corner is ruled out
    from madaiemulator_tpu.utils.designs import DesignScaling, apply_scaling

    pts = jnp.asarray(
        apply_scaling(jnp.asarray([[1.8, 2.4], [2.9, 1.05]]), emu.scaling)
    )
    I = np.asarray(implausibility(emu, y_exp, exp_var, pts))
    assert I[0] < 3.0 < I[1], I


def test_elbo_sharded_matches_single_device(rng):
    """Data-parallel SGPR on the 8-virtual-device mesh: row-sharding the
    training set and letting GSPMD insert the summary reductions must
    reproduce the single-device ELBO (and its gradient path compiles)."""
    from madaiemulator_tpu.parallel.sparse_sharded import (
        elbo_sharded,
        make_rows_mesh,
        shard_data_rows,
    )

    n = 640  # divides 8
    X = jnp.asarray(rng.uniform(0, 1, (n, 2)))
    y = jnp.sin(3 * X[:, 0]) + 0.5 * X[:, 1]
    nz = jnp.asarray(10.0 ** rng.uniform(-4, -2, size=n))
    cfg = GPConfig(nparams=2, regression_order=1)
    p = _params(2)
    Z = sparse.select_inducing(X, 25)
    mesh = make_rows_mesh(8)
    for noise in (None, nz):
        data = GPData(X=X, y=y, noise=noise)
        e_ref = float(sparse.elbo(p, data, cfg, Z))
        e_sh = float(elbo_sharded(p, data, cfg, Z, mesh))
        np.testing.assert_allclose(e_sh, e_ref, rtol=1e-9)
    # gradients flow through the sharded graph
    data = GPData(X=X, y=y)
    dsh = shard_data_rows(data, mesh)
    g = jax.jit(jax.grad(lambda pp: sparse.elbo(pp, dsh, cfg, Z)))(p)
    g_ref = jax.grad(lambda pp: sparse.elbo(pp, data, cfg, Z))(p)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-10)
    # gradient-observation (joint-row) data shards too: dY/dY_noise ride
    # row-sharded and the summary collectives reproduce the joint ELBO
    dY = jnp.stack([3 * jnp.cos(3 * X[:, 0]),
                    0.5 * jnp.ones((n,), X.dtype)], axis=1)
    data_g = GPData(X=X, y=y, dY=dY)
    e_ref = float(sparse.elbo(p, data_g, cfg, Z))
    e_sh = float(elbo_sharded(p, data_g, cfg, Z, mesh))
    np.testing.assert_allclose(e_sh, e_ref, rtol=1e-9)


def test_sparse_emulator_drives_sequential_design(rng):
    """Both design acquisitions run against the sparse serve state:
    active-variance proposals avoid the training-dense region, and the
    NROY wave screens with the same implausibility as calibrate."""
    from madaiemulator_tpu.models.design import (
        active_variance_design,
        nroy_wave_design,
    )

    X, Y = _mv_problem(rng, n=400)
    cfg = GPConfig(nparams=2, regression_order=1)
    emu = sparse.fit_multivariate_sparse(
        jax.random.key(0), X, Y, cfg, pca_variance=0.999, inducing=30,
        n_restarts=2, max_steps=30,
    )
    prop = active_variance_design(jax.random.key(1), emu, n_new=5)
    assert prop.points.shape == (5, 2)
    assert np.all(prop.points >= 1.0) and np.all(prop.points <= 3.0)
    theta_true = np.array([1.8, 2.4])
    y_exp = _mv_truth(theta_true[None, :])[0]
    wave = nroy_wave_design(
        jax.random.key(2), emu, y_exp, np.full(3, 1e-3), n_new=5,
    )
    assert wave.points.shape == (5, 2)
    assert 0.0 < wave.pool_fraction_viable < 0.5  # data constrains theta
    # proposed points are themselves not ruled out
    from madaiemulator_tpu.models.calibrate import implausibility
    from madaiemulator_tpu.utils.designs import apply_scaling

    I = np.asarray(implausibility(
        emu, y_exp, np.full(3, 1e-3),
        apply_scaling(jnp.asarray(wave.points), emu.scaling),
    ))
    assert np.all(I <= 3.0), I


def test_sparse_snapshot_refuses_failed_factorizations(rng, tmp_path):
    """A state with ok=False carries identity placeholder factors
    (_sgpr_system's non-SPD fallback); persisting it would serve silent
    garbage — both writers must refuse."""
    from madaiemulator_tpu.io.snapshot import (
        write_snapshot_sparse,
        write_snapshot_sparse_npz,
    )

    X, Y = _mv_problem(rng, n=200)
    cfg = GPConfig(nparams=2, regression_order=1)
    emu = sparse.fit_multivariate_sparse(
        jax.random.key(0), X, Y, cfg, pca_variance=0.999, inducing=20,
        n_restarts=2, max_steps=15,
    )
    bad = emu._replace(
        states=emu.states._replace(
            ok=jnp.zeros_like(emu.states.ok)
        )
    )
    for writer, path in (
        (write_snapshot_sparse, str(tmp_path / "bad.txt")),
        (write_snapshot_sparse_npz, str(tmp_path / "bad.npz")),
    ):
        with pytest.raises(ValueError, match="FAILED factorizations"):
            writer(path, bad)


@pytest.mark.parametrize("ext", ["txt", "npz"])
def test_sparse_snapshot_round_trip(rng, tmp_path, ext):
    from madaiemulator_tpu.io.snapshot import (
        read_snapshot_auto,
        write_snapshot_auto,
    )

    X, Y = _mv_problem(rng, n=300)
    cfg = GPConfig(nparams=2, regression_order=1,
                   covariance=CovarianceFamily.MATERN52)
    emu = sparse.fit_multivariate_sparse(
        jax.random.key(0), X, Y, cfg, pca_variance=0.999, inducing=25,
        n_restarts=2, max_steps=25,
    )
    path = str(tmp_path / f"s.{ext}")
    write_snapshot_auto(path, emu, param_names=["a", "b"],
                        output_names=["o0", "o1", "o2"])
    emu2, pn, on = read_snapshot_auto(path)
    assert isinstance(emu2, sparse.SparseMultivariateEmulator)
    assert pn == ["a", "b"] and on == ["o0", "o1", "o2"]
    Xq = jnp.asarray(rng.uniform(1.2, 2.8, (20, 2)))
    m0, v0 = sparse.predict_multivariate_sparse(emu, Xq)
    m1, v1 = sparse.predict_multivariate_sparse(emu2, Xq)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                               rtol=1e-12, atol=1e-14)


def test_cli_sparse_train_serve_print_convert(rng, tmp_path):
    """--inducing routes estimate_thetas to SGPR; the snapshot serves via
    pipe in parity with the library, prints thetas, and converts."""
    from madaiemulator_tpu.io.modelfile import write_model_file
    from madaiemulator_tpu.io.snapshot import read_snapshot_auto

    X = rng.uniform(0, 1, (400, 2))
    Y = np.stack(
        [np.sin(4 * X[:, 0]) + X[:, 1], X[:, 0] * X[:, 1]], axis=1
    ) + 0.02 * rng.normal(size=(400, 2))
    model = tmp_path / "model.txt"
    state = tmp_path / "state.txt"
    write_model_file(str(model), X, Y, ["a", "b"], ["o0", "o1"])
    r = subprocess.run(
        CLI + [
            "estimate_thetas", str(model), str(state), "--inducing=30",
            "--regression_order=1", "--restarts=2", "--steps=30", "--quiet",
        ],
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr
    assert open(state).readline().split()[0] == (
        "MADAIEMULATOR_TPU_SNAPSHOT_SGPR"
    )
    emu, _, _ = read_snapshot_auto(str(state))
    Xq = np.array([[0.3, 0.6], [0.8, 0.2]])
    m_lib, v_lib = sparse.predict_multivariate_sparse(emu, jnp.asarray(Xq))
    r = subprocess.run(
        CLI + ["interactive_mode", str(state)],
        input="0.3 0.6\n0.8 0.2\n", capture_output=True, text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    assert lines[0] == "2" and lines[3] == "4"
    vals = np.asarray([float(v) for v in lines[8:]]).reshape(2, 4)
    np.testing.assert_allclose(vals[:, :2], np.asarray(m_lib), rtol=1e-8)
    np.testing.assert_allclose(vals[:, 2:], np.asarray(v_lib), rtol=1e-6)
    # print_thetas: one row per component
    r = subprocess.run(
        CLI + ["print_thetas", str(state)],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    rows = [l for l in r.stdout.splitlines() if l and not l.startswith("#")]
    assert len(rows) == emu.n_components
    # convert to npz and back
    npz = tmp_path / "state.npz"
    r = subprocess.run(
        CLI + ["convert", str(state), str(npz)],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0 and "sparse (SGPR)" in r.stderr
    emu3, _, _ = read_snapshot_auto(str(npz))
    m3, _ = sparse.predict_multivariate_sparse(emu3, jnp.asarray(Xq))
    np.testing.assert_allclose(np.asarray(m3), np.asarray(m_lib),
                               rtol=1e-12)


def test_cli_sparse_rejections(rng, tmp_path):
    from madaiemulator_tpu.io.modelfile import write_model_file

    X = rng.uniform(0, 1, (60, 2))
    Y = np.stack([np.sin(3 * X[:, 0]), X[:, 1]], axis=1)
    model = tmp_path / "model.txt"
    state = tmp_path / "state.txt"
    write_model_file(str(model), X, Y, ["a", "b"], ["o0", "o1"])
    # incompatible flag combinations fail fast
    r = subprocess.run(
        CLI + ["estimate_thetas", str(model), str(state), "--inducing=10",
               "--fit_method=iterative", "--quiet"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 2 and "sparse" in r.stderr
    # train a real one, then check workflow rejections
    r = subprocess.run(
        CLI + ["estimate_thetas", str(model), str(state), "--inducing=10",
               "--restarts=2", "--steps=15", "--quiet"],
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr
    exp = tmp_path / "exp.txt"
    exp.write_text("2\n0.5 0.01\n1.0 0.01\n")
    # calibrate WORKS on sparse snapshots (walks the chain against the
    # O(m^2) state in-graph) — but rejects --matrix_free
    r = subprocess.run(
        CLI + ["calibrate", str(state), str(exp), "--n_steps=50",
               "--n_walkers=16", "--quiet", "--output", str(tmp_path / "d")],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        CLI + ["calibrate", str(state), str(exp), "--n_steps=10",
               "--matrix_free", "--quiet"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 2 and "matrix_free" in r.stderr
    # validate: a bare sparse snapshot has no training arrays to score
    # against, so it demands --model_file; with one it runs the
    # training-residual validation and succeeds.
    r = subprocess.run(CLI + ["validate", str(state)], capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 2 and "requires --model_file" in r.stderr
    r = subprocess.run(
        CLI + ["validate", str(state), "--model_file", str(model)],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    assert "sparse training-residual validation" in r.stdout
    # a model file whose parameter dimension disagrees with the snapshot
    # is rejected with a clean diagnostic, not a shape-error traceback
    bad_model = tmp_path / "bad_model.txt"
    X3 = rng.uniform(0, 1, (60, 3))
    write_model_file(str(bad_model), X3, Y, ["a", "b", "c"], ["o0", "o1"])
    r = subprocess.run(
        CLI + ["validate", str(state), "--model_file", str(bad_model)],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 2 and "parameter" in r.stderr
    r = subprocess.run(
        CLI + ["interactive_mode", str(state), "--serve_method=iterative"],
        input="0.5 0.5\n", capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 2 and "O(m^2)" in r.stderr


def test_cli_sparse_with_gradients(rng, tmp_path):
    """--inducing composes with --gradients_file: the CLI trains a
    gradient-enhanced sparse fit and the ordinary SGPR snapshot serves
    it through the pipe."""
    from madaiemulator_tpu.io.modelfile import write_model_file

    n = 16
    X = rng.uniform(0, 1, (n, 2))
    y = np.sin(3 * X[:, 0]) + 0.5 * X[:, 1] ** 2
    dY = np.stack([3 * np.cos(3 * X[:, 0]), X[:, 1]], axis=1)
    model = tmp_path / "model.txt"
    grads = tmp_path / "grads.txt"
    state = tmp_path / "state.txt"
    write_model_file(str(model), X, y[:, None], ["a", "b"], ["f"])
    with open(grads, "w") as f:
        for i in range(n):
            f.write(f"{dY[i, 0]:.17g} {dY[i, 1]:.17g}\n")
    r = subprocess.run(
        CLI + ["estimate_thetas", str(model), str(state), "--inducing=16",
               "--regression_order=1", "--restarts=3", "--steps=60",
               f"--gradients_file={grads}", "--quiet"],
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr
    assert "SGPR" in open(state).readline()
    r = subprocess.run(
        CLI + ["interactive_mode", str(state)],
        input="0.5 0.5\n", capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    mean = float(lines[-2])
    want = float(np.sin(1.5) + 0.5 * 0.25)
    assert abs(mean - want) < 0.05, (mean, want)
    # a once-differentiable kernel is rejected cleanly, not a traceback
    r = subprocess.run(
        CLI + ["estimate_thetas", str(model), str(state), "--inducing=16",
               "--covariance_fn=matern32", f"--gradients_file={grads}",
               "--quiet"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 2 and "differentiab" in r.stderr
