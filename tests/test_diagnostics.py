"""Validation diagnostics: closed-form LOO vs brute-force refits, posterior
covariance/sampling moments, multivariate variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madaiemulator_tpu.models import diagnostics
from madaiemulator_tpu.models.gp import (
    GPData,
    _factor,
    precompute_predictor,
    predict_from_precomputed,
)
from madaiemulator_tpu.ops.kernels import GPParams
from madaiemulator_tpu.utils.config import CovarianceFamily, GPConfig


def make_problem(rng, n=24, d=2, order=1, nugget=1e-2,
                 family=CovarianceFamily.POWER_EXPONENTIAL):
    cfg = GPConfig(nparams=d, covariance=family, regression_order=order)
    X = jnp.asarray(rng.uniform(size=(n, d)))
    nls = cfg.num_length_scales
    p = GPParams(
        log_amp=jnp.asarray(0.3),
        log_nugget=jnp.asarray(np.log(nugget)),
        log_ls=jnp.full((nls,), np.log(0.5)),
    )
    # draw y from the prior so the model is well-specified
    C = np.asarray(
        jax.jit(
            lambda: __import__(
                "madaiemulator_tpu.ops.kernels", fromlist=["gram_matrix"]
            ).gram_matrix(X, p, cfg)
        )()
    )
    y = jnp.asarray(np.linalg.cholesky(C) @ rng.standard_normal(n))
    return cfg, GPData(X=X, y=y), p


@pytest.mark.parametrize("order", [0, 1, 2])
def test_loo_matches_bruteforce_refits(rng, order):
    """The closed-form LOO equals actually refitting the GLS mean on each
    size-(N-1) subset and predicting the held-out OBSERVED value."""
    cfg, data, p = make_problem(rng, n=20, d=2, order=order)
    res = diagnostics.loo_cv(p, data, cfg)
    assert bool(res.ok)
    n = data.y.shape[0]
    for i in range(n):
        keep = np.arange(n) != i
        sub = GPData(X=data.X[keep], y=data.y[keep])
        st = _factor(sub, p, cfg)
        m_i, v_i = predict_from_precomputed(
            st, p, sub, data.X[i][None, :], cfg
        )
        np.testing.assert_allclose(
            float(res.mean[i]), float(m_i[0]), rtol=1e-8, atol=1e-10
        )
        np.testing.assert_allclose(
            float(res.variance[i]), float(v_i[0]), rtol=1e-8, atol=1e-10
        )


def test_loo_matern_isotropic(rng):
    """LOO identity holds for the isotropic Matérn family too."""
    cfg, data, p = make_problem(
        rng, n=16, d=3, order=1, family=CovarianceFamily.MATERN32
    )
    res = diagnostics.loo_cv(p, data, cfg)
    i = 7
    keep = np.arange(data.y.shape[0]) != i
    sub = GPData(X=data.X[keep], y=data.y[keep])
    st = _factor(sub, p, cfg)
    m_i, v_i = predict_from_precomputed(st, p, sub, data.X[i][None, :], cfg)
    np.testing.assert_allclose(float(res.mean[i]), float(m_i[0]), rtol=1e-8)
    np.testing.assert_allclose(
        float(res.variance[i]), float(v_i[0]), rtol=1e-8
    )


def test_loo_gated_on_failed_factorization(rng):
    """A non-SPD theta yields ok=False and NaN diagnostics, not garbage."""
    cfg, data, _ = make_problem(rng, n=12, d=2)
    bad = GPParams(
        log_amp=jnp.asarray(0.0),
        log_nugget=jnp.asarray(np.log(1e-300)),
        log_ls=jnp.full((2,), np.log(1e4)),  # constant kernel, no nugget
    )
    res = diagnostics.loo_cv(bad, data, cfg)
    if not bool(res.ok):
        assert np.all(np.isnan(np.asarray(res.mean)))


def test_loo_summary_calibrated(rng):
    """Well-specified model: standardized errors ~N(0,1), coverage ~95%."""
    cfg, data, p = make_problem(rng, n=64, d=2, nugget=0.05)
    res = diagnostics.loo_cv(p, data, cfg)
    s = diagnostics.loo_summary(res, data.y)
    assert s["n"] == 64
    assert abs(s["standardized_mean"]) < 0.6
    assert 0.5 < s["standardized_std"] < 1.8
    assert 0.80 <= s["coverage"] <= 1.0
    assert np.isfinite(s["log_pseudo_likelihood"])


def test_norm_ppf():
    # pinned to scipy.stats.norm.ppf values
    np.testing.assert_allclose(
        diagnostics._norm_ppf(0.975), 1.959963984540054, rtol=1e-8
    )
    np.testing.assert_allclose(
        diagnostics._norm_ppf(0.5), 0.0, atol=1e-12
    )
    np.testing.assert_allclose(
        diagnostics._norm_ppf(0.005), -2.575829303548901, rtol=1e-7
    )


def test_posterior_covariance_diag_matches_predict(rng):
    """diag of the full posterior covariance == the marginal variances; the
    mean matches predict_from_precomputed."""
    cfg, data, p = make_problem(rng, n=24, d=2)
    st = precompute_predictor(p, data, cfg)
    Xs = jnp.asarray(rng.uniform(size=(15, 2)))
    m_ref, v_ref = predict_from_precomputed(st, p, data, Xs, cfg)
    mean, cov = diagnostics.posterior_covariance(st, p, data, Xs, cfg)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(m_ref), rtol=1e-10)
    np.testing.assert_allclose(
        np.diag(np.asarray(cov)), np.asarray(v_ref), rtol=1e-8, atol=1e-12
    )
    # symmetric PSD (up to rounding)
    C = np.asarray(cov)
    np.testing.assert_allclose(C, C.T, atol=1e-12)
    assert np.linalg.eigvalsh(C).min() > -1e-9


def test_sample_posterior_moments(rng):
    """Sample mean/covariance converge to the analytic posterior; the
    degenerate m > N case (rank-deficient covariance) runs cleanly."""
    cfg, data, p = make_problem(rng, n=12, d=2, nugget=1e-3)
    st = precompute_predictor(p, data, cfg)
    Xs = jnp.asarray(rng.uniform(size=(20, 2)))  # m > N: degenerate cov
    mean, cov = diagnostics.posterior_covariance(st, p, data, Xs, cfg)
    S = 20000
    draws = diagnostics.sample_posterior(
        st, p, data, Xs, cfg, jax.random.key(0), S
    )
    assert draws.shape == (S, 20)
    d = np.asarray(draws)
    emp_mean = d.mean(axis=0)
    emp_cov = np.cov(d.T)
    sd = np.sqrt(np.diag(np.asarray(cov)))
    np.testing.assert_allclose(
        emp_mean, np.asarray(mean), atol=4.5 * sd.max() / np.sqrt(S) + 1e-12
    )
    # covariance entries to MC accuracy (loose: 5 sigma_ii scale / sqrt(S))
    scale = np.outer(sd, sd).max() + 1e-12
    assert np.max(np.abs(emp_cov - np.asarray(cov))) < 6 * scale / np.sqrt(S) + 5e-3 * scale


def make_multivariate(rng, n=40, d=3, t=6):
    from madaiemulator_tpu.models.multivariate import fit_multivariate

    cfg = GPConfig(nparams=d, regression_order=1, n_restarts=2,
                   max_opt_steps=25)
    X = rng.uniform(size=(n, d))
    grid = rng.standard_normal((t, 3))
    F = np.stack(
        [np.sin(2 * X @ g[:d] if d <= 3 else X[:, 0]) for g in grid], axis=1
    )
    Y = F + 0.01 * rng.standard_normal((n, t))
    emu = fit_multivariate(
        jax.random.key(1), jnp.asarray(X), jnp.asarray(Y), cfg,
        pca_variance=0.99,
    )
    return emu, X, Y


def test_multivariate_loo_and_summary(rng):
    emu, X, Y = make_multivariate(rng)
    res, loo_mean, loo_var = diagnostics.loo_cv_multivariate(emu)
    r, n = emu.n_components, emu.X.shape[0]
    assert res.mean.shape == (r, n)
    assert loo_mean.shape == (n, emu.n_outputs)
    assert np.all(np.asarray(loo_var) >= 0)
    # component 0's LOO must equal the scalar loo_cv on that component
    res0 = diagnostics.loo_cv(
        jax.tree.map(lambda a: a[0], emu.params),
        GPData(X=emu.X, y=emu.Z[:, 0]),
        emu.config,
    )
    np.testing.assert_allclose(
        np.asarray(res.mean[0]), np.asarray(res0.mean), rtol=1e-10
    )
    s = diagnostics.loo_summary_multivariate(emu)
    assert s["n"] == n * emu.n_outputs
    assert np.isfinite(s["rmse"])
    # vs raw Y includes the PCA truncation error: rmse can only grow
    s_raw = diagnostics.loo_summary_multivariate(emu, Y_true=jnp.asarray(Y))
    assert s_raw["rmse"] >= s["rmse"] - 1e-12


def test_reconstruct_training_outputs_roundtrip(rng):
    """With pca_variance=1 - eps retaining everything, the retained-subspace
    reconstruction reproduces Y to rounding."""
    from madaiemulator_tpu.models.multivariate import pca_decompose

    Y = rng.standard_normal((30, 4))
    pca, Z = pca_decompose(jnp.asarray(Y), pca_variance=1.0 - 1e-15)

    class Stub:
        pass

    emu = Stub()
    emu.pca, emu.Z = pca, Z
    if pca.U.shape[1] == 4:  # retained everything
        Yr = diagnostics.reconstruct_training_outputs(emu)
        np.testing.assert_allclose(np.asarray(Yr), Y, rtol=1e-8, atol=1e-8)


def test_sample_multivariate_moments(rng):
    emu, X, Y = make_multivariate(rng, n=30, t=4)
    from madaiemulator_tpu.models.multivariate import predict_multivariate

    Xq = rng.uniform(size=(8, 3))
    m_ref, v_ref = predict_multivariate(emu, jnp.asarray(Xq))
    S = 8000
    draws = diagnostics.sample_multivariate_posterior(
        emu, jnp.asarray(Xq), jax.random.key(3), S
    )
    assert draws.shape == (S, 8, emu.n_outputs)
    d = np.asarray(draws)
    sd = np.sqrt(np.asarray(v_ref))
    np.testing.assert_allclose(
        d.mean(axis=0), np.asarray(m_ref),
        atol=5 * sd.max() / np.sqrt(S) + 1e-10,
    )
    np.testing.assert_allclose(
        d.var(axis=0), np.asarray(v_ref),
        rtol=0.2, atol=5e-3 * float(np.max(v_ref)) + 1e-12,
    )


def test_validation_summary_zero_variance_is_finite():
    """An exact-zero predictive variance (nugget-free interpolation at a
    training point) must not emit -inf: the floored std feeds the log
    density too."""
    s = diagnostics.validation_summary(
        mean=np.array([0.0, 1.0]),
        variance=np.array([0.0, 1.0]),
        y_true=np.array([0.0, 1.0]),
    )
    assert np.isfinite(s["log_pseudo_likelihood"])
    assert s["rmse"] == 0.0


def test_posterior_covariance_gated_on_failed_state(rng):
    """A state whose factorization failed returns NaN mean/cov/draws, not
    confidently-wrong numbers from the placeholder factors."""
    cfg, data, p = make_problem(rng, n=12, d=2)
    st = _factor(data, p, cfg)
    assert bool(st.ok)
    bad = st._replace(ok=jnp.asarray(False))
    Xq = data.X[:4]
    mean, cov = diagnostics.posterior_covariance(bad, p, data, Xq, cfg)
    assert np.all(np.isnan(np.asarray(mean)))
    assert np.all(np.isnan(np.asarray(cov)))
    draws = diagnostics.sample_posterior(
        bad, p, data, Xq, cfg, jax.random.key(0), 3
    )
    assert np.all(np.isnan(np.asarray(draws)))
    # and the healthy state stays healthy
    mean_ok, cov_ok = diagnostics.posterior_covariance(st, p, data, Xq, cfg)
    assert np.all(np.isfinite(np.asarray(mean_ok)))
    assert np.all(np.isfinite(np.asarray(cov_ok)))


def test_loo_summary_multivariate_raises_on_failed_component(rng):
    """A component with no valid factorization must fail loudly, not
    silently NaN the pooled summary."""
    emu, X, Y = make_multivariate(rng, n=25, t=4)
    ok = np.asarray(emu.states.ok).copy()
    ok[0] = False
    bad = emu._replace(states=emu.states._replace(ok=jnp.asarray(ok)))
    with pytest.raises(ValueError, match="no valid factorization"):
        diagnostics.loo_summary_multivariate(bad)


def test_loo_multivariate_validates_served_states(rng):
    """loo_cv_multivariate consumes the emulator's own serving states — a
    component the jitter rescue saved is validated as served (and no extra
    factorization runs for healthy ones). Pinned by equality with the
    per-component states here (no rescue in this healthy problem)."""
    emu, X, Y = make_multivariate(rng, n=25, t=4)
    res, _, _ = diagnostics.loo_cv_multivariate(emu)
    ref = jax.vmap(diagnostics._loo_from_state)(emu.states, emu.Z.T)
    np.testing.assert_allclose(
        np.asarray(res.mean), np.asarray(ref.mean), rtol=1e-12
    )
    # matrix-free emulators (no .states) still get LOO via refactoring
    class NoStates:
        pass

    ns = NoStates()
    ns.X, ns.Z, ns.params, ns.config, ns.pca = (
        emu.X, emu.Z, emu.params, emu.config, emu.pca
    )
    res2, loo_mean2, _ = diagnostics.loo_cv_multivariate(ns)
    np.testing.assert_allclose(
        np.asarray(res2.mean), np.asarray(res.mean), rtol=1e-7, atol=1e-9
    )


def test_holdout_cv_matches_dense_subset_predictions(rng):
    """Matrix-free holdout validation == dense predict-from-subset at tight
    CG tolerance: the held-out moments are the same math, solved
    iteratively. Exercised through an IterativeMultivariateEmulator (no
    dense states anywhere on the path)."""
    from madaiemulator_tpu.models.multivariate import (
        IterativeMultivariateEmulator,
        reconstruct_observables,
    )

    emu, X, Y = make_multivariate(rng, n=30, t=4)
    it = IterativeMultivariateEmulator(
        scaling=emu.scaling, X=emu.X, Z=emu.Z, pca=emu.pca,
        params=emu.params, config=emu.config,
    )
    hold, mean, var = diagnostics.holdout_cv_multivariate(
        it, jax.random.key(0), 6, rank=16, cg_tol=1e-12, cg_max_iters=512,
    )
    assert hold.shape == (6,) and len(np.unique(hold)) == 6
    keep = np.setdiff1d(np.arange(30), hold)
    ms, vs = [], []
    for i in range(emu.n_components):
        p = jax.tree.map(lambda a: a[i], emu.params)
        sub = GPData(X=emu.X[keep], y=emu.Z[keep, i])
        st = _factor(sub, p, emu.config)
        m_i, v_i = predict_from_precomputed(
            st, p, sub, emu.X[hold], emu.config
        )
        ms.append(m_i)
        vs.append(v_i)
    mean_ref, var_ref = reconstruct_observables(
        jnp.stack(ms), jnp.stack(vs), emu.pca
    )
    np.testing.assert_allclose(
        np.asarray(mean), np.asarray(mean_ref), rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(var), np.asarray(var_ref), rtol=1e-4, atol=1e-10
    )


def test_holdout_summary_multivariate(rng):
    """Summary scores the held-out block only; Y_true=raw includes PCA
    truncation; bad n_holdout rejected."""
    from madaiemulator_tpu.models.multivariate import (
        IterativeMultivariateEmulator,
    )

    emu, X, Y = make_multivariate(rng, n=30, t=4)
    it = IterativeMultivariateEmulator(
        scaling=emu.scaling, X=emu.X, Z=emu.Z, pca=emu.pca,
        params=emu.params, config=emu.config,
    )
    s = diagnostics.holdout_summary_multivariate(
        it, jax.random.key(1), 5, rank=16, cg_tol=1e-10, cg_max_iters=512,
    )
    assert s["n"] == 5 * 4
    assert np.isfinite(s["rmse"]) and np.isfinite(s["log_pseudo_likelihood"])
    s2 = diagnostics.holdout_summary_multivariate(
        it, jax.random.key(1), 5, Y_true=jnp.asarray(Y),
        rank=16, cg_tol=1e-10, cg_max_iters=512,
    )
    assert s2["n"] == 5 * 4 and np.isfinite(s2["rmse"])
    with pytest.raises(ValueError, match="n_holdout"):
        diagnostics.holdout_cv_multivariate(it, jax.random.key(0), 0)
    with pytest.raises(ValueError, match="n_holdout"):
        diagnostics.holdout_cv_multivariate(it, jax.random.key(0), 30)


def test_posterior_covariance_iterative_matches_dense(rng):
    """Matrix-free posterior covariance over a query block == the dense one
    at tight CG tolerance (same algebra, PCG solves instead of a
    factorization); col_chunk padding path exercised with m % chunk != 0."""
    from madaiemulator_tpu.models.iterative import (
        precompute_iterative_predictor,
    )

    cfg, data, p = make_problem(rng, n=24, d=2)
    st_dense = _factor(data, p, cfg)
    Xq = jnp.asarray(rng.uniform(size=(7, 2)))
    m_ref, c_ref = diagnostics.posterior_covariance(
        st_dense, p, data, Xq, cfg
    )
    st_it = precompute_iterative_predictor(
        p, data, cfg, rank=12, cg_tol=1e-12, cg_max_iters=512
    )
    m_it, c_it = diagnostics.posterior_covariance_iterative(
        st_it, data, Xq, col_chunk=3
    )
    np.testing.assert_allclose(
        np.asarray(m_it), np.asarray(m_ref), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(c_it), np.asarray(c_ref), rtol=1e-6, atol=1e-9
    )


def test_sample_multivariate_posterior_iterative_moments(rng):
    """Matrix-free joint draws reproduce the emulator's own predictive
    moments (through an IterativeMultivariateEmulator and its serving
    cache — no dense states anywhere)."""
    from madaiemulator_tpu.models.multivariate import (
        IterativeMultivariateEmulator,
        precompute_iterative_multivariate,
        predict_multivariate,
    )
    from madaiemulator_tpu.utils.designs import unapply_scaling

    emu, X, Y = make_multivariate(rng, n=25, t=4)
    it = IterativeMultivariateEmulator(
        scaling=emu.scaling, X=emu.X, Z=emu.Z, pca=emu.pca,
        params=emu.params, config=emu.config,
    )
    states = precompute_iterative_multivariate(
        it, rank=16, cg_tol=1e-12, cg_max_iters=512
    )
    Xq_scaled = jnp.asarray(rng.uniform(0.1, 0.9, size=(6, 3)))
    Xq = unapply_scaling(Xq_scaled, emu.scaling)
    draws = diagnostics.sample_multivariate_posterior_iterative(
        it, states, Xq, jax.random.key(2), 4000, col_chunk=4
    )
    assert draws.shape == (4000, 6, 4)
    m_ref, v_ref = predict_multivariate(emu, Xq)
    d = np.asarray(draws)
    np.testing.assert_allclose(
        d.mean(axis=0), np.asarray(m_ref), rtol=5e-2,
        atol=3e-2 * float(np.max(np.abs(np.asarray(m_ref)))),
    )
    np.testing.assert_allclose(
        d.var(axis=0), np.asarray(v_ref),
        rtol=0.2, atol=5e-3 * float(np.max(np.asarray(v_ref))) + 1e-12,
    )
