"""Gradient-enhanced GP ("GEK") tests: joint covariance blocks, LML VJP
parity, fit/predict acceptance, derivative serving, and guards.

Beyond-reference capability (the reference has no derivative support
anywhere — SURVEY.md §2); correctness is pinned against autodiff of the
scalar kernel and against a dense values-only GP on a known function.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madaiemulator_tpu import (
    GPConfig,
    CovarianceFamily,
    GPData,
    fit_gp,
    gp_posterior,
    precompute_predictor,
    predict_fast,
    predict_from_precomputed,
    predict_gradient,
)
from madaiemulator_tpu.models.gp import (
    _factor,
    log_marginal_likelihood,
    log_marginal_likelihood_ad,
    regression_basis_grad,
    training_basis,
)
from madaiemulator_tpu.ops import kernels
from madaiemulator_tpu.ops.kernels import GPParams


def _params(d_ls, rng):
    return GPParams(
        log_amp=jnp.asarray(0.2),
        log_nugget=jnp.asarray(-7.0),
        log_ls=jnp.asarray(rng.uniform(-1.2, -0.2, size=(d_ls,))),
    )


@pytest.mark.parametrize(
    "fam",
    [
        CovarianceFamily.POWER_EXPONENTIAL,
        CovarianceFamily.MATERN52,
        CovarianceFamily.MATERN52_ARD,
    ],
)
def test_joint_blocks_match_autodiff(fam):
    """Every derivative block equals autodiff of the scalar kernel."""
    rng = np.random.default_rng(3)
    n1, n2, d = 4, 3, 2
    X1 = jnp.asarray(rng.uniform(size=(n1, d)))
    X2 = jnp.asarray(rng.uniform(size=(n2, d)))
    cfg = GPConfig(nparams=d, covariance=fam)
    p = _params(cfg.num_length_scales, rng)

    def k(u, v):
        return kernels.cross_covariance(u[None], v[None], p, cfg)[0, 0]

    J = kernels.joint_cross(X1, X2, p, cfg, grad_rows=True, grad_cols=True)
    assert J.shape == (n1 * (1 + d), n2 * (1 + d))
    for i in range(n1):
        for j in range(n2):
            kv = k(X1[i], X2[j])
            np.testing.assert_allclose(J[i, j], kv, rtol=1e-12)
            g2 = jax.grad(k, argnums=1)(X1[i], X2[j])
            np.testing.assert_allclose(
                J[i, n2 + j * d : n2 + (j + 1) * d], g2, atol=1e-12
            )
            g1 = jax.grad(k, argnums=0)(X1[i], X2[j])
            np.testing.assert_allclose(
                J[n1 + i * d : n1 + (i + 1) * d, j], g1, atol=1e-12
            )
            # [b, a] jacobian of dk/dx2 wrt x1 -> transpose to [a, b]
            gg = jax.jacfwd(jax.grad(k, argnums=1), argnums=0)(X1[i], X2[j])
            blk = J[
                n1 + i * d : n1 + (i + 1) * d, n2 + j * d : n2 + (j + 1) * d
            ]
            np.testing.assert_allclose(blk, np.asarray(gg).T, atol=1e-12)


@pytest.mark.parametrize(
    "fam", [CovarianceFamily.POWER_EXPONENTIAL, CovarianceFamily.MATERN52]
)
def test_gram_joint_spd_and_symmetric(fam):
    rng = np.random.default_rng(4)
    n, d = 7, 3
    X = jnp.asarray(rng.uniform(size=(n, d)))
    cfg = GPConfig(nparams=d, covariance=fam)
    p = _params(cfg.num_length_scales, rng)
    C = kernels.gram_joint(X, p, cfg)
    C = np.asarray(C)
    np.testing.assert_allclose(C, C.T, atol=1e-14)
    assert np.linalg.eigvalsh(C).min() > 0


def _sin_data(n=6, noise=None):
    """1D toy: y = sin(3x), dy = 3 cos(3x) at n points in [0, 1]."""
    x = jnp.linspace(0.05, 0.95, n)[:, None]
    y = jnp.sin(3.0 * x[:, 0])
    dy = 3.0 * jnp.cos(3.0 * x)
    return GPData(X=x, y=y, dY=dy)


def test_lml_closed_form_vjp_matches_autodiff():
    """The closed-form LML VJP is exact for the joint (GEK) Gram too."""
    rng = np.random.default_rng(5)
    n, d = 6, 2
    X = jnp.asarray(rng.uniform(size=(n, d)))
    y = jnp.asarray(rng.standard_normal(n))
    dY = jnp.asarray(rng.standard_normal((n, d)))
    for reml in (False, True):
        cfg = GPConfig(nparams=d, regression_order=1, reml=reml)
        data = GPData(X=X, y=y, dY=dY)
        p = _params(d, rng)
        v1, g1 = jax.value_and_grad(log_marginal_likelihood)(p, data, cfg)
        v2, g2 = jax.value_and_grad(log_marginal_likelihood_ad)(p, data, cfg)
        np.testing.assert_allclose(v1, v2, rtol=1e-12)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-10)


def test_gradient_data_improves_fit():
    """6 points + gradients beats 6 points alone on sin(3x), and the
    posterior interpolates the observed derivatives."""
    data_g = _sin_data(6)
    data_v = GPData(X=data_g.X, y=data_g.y)
    cfg = GPConfig(nparams=1, regression_order=0)
    key = jax.random.PRNGKey(0)
    xs = jnp.linspace(0.0, 1.0, 201)[:, None]
    truth = jnp.sin(3.0 * xs[:, 0])

    res_g = fit_gp(key, data_g, cfg, n_restarts=8, max_steps=60)
    res_v = fit_gp(key, data_v, cfg, n_restarts=8, max_steps=60)
    m_g, v_g = gp_posterior(res_g.params, data_g, xs, cfg)
    m_v, _ = gp_posterior(res_v.params, data_v, xs, cfg)
    rmse_g = float(jnp.sqrt(jnp.mean((m_g - truth) ** 2)))
    rmse_v = float(jnp.sqrt(jnp.mean((m_v - truth) ** 2)))
    assert rmse_g < 0.5 * rmse_v, (rmse_g, rmse_v)
    assert rmse_g < 5e-3
    assert float(jnp.min(v_g)) >= 0.0

    # derivative serving: posterior gradient reproduces the observed dY
    st = _factor(data_g, res_g.params, cfg)
    gm, gv = predict_gradient(st, res_g.params, data_g, data_g.X, cfg)
    np.testing.assert_allclose(gm, data_g.dY, atol=5e-2)
    assert float(jnp.min(gv)) >= 0.0


def test_fit_reports_the_joint_likelihood():
    """Regression: fit_gp must optimize (and report) the JOINT
    value+gradient likelihood when data carries dY. The original wiring
    rebuilt GPData inside the vmapped restart unit and silently dropped
    the gradient fields — the fit matched a values-only fit exactly while
    the predict path used the joint model (caught by the on-TPU drive)."""
    data_g = _sin_data(5)
    data_v = GPData(X=data_g.X, y=data_g.y)
    cfg = GPConfig(nparams=1, regression_order=0)
    key = jax.random.PRNGKey(1)
    res_g = fit_gp(key, data_g, cfg, n_restarts=4, max_steps=40)
    res_v = fit_gp(key, data_v, cfg, n_restarts=4, max_steps=40)
    # the reported best LML is the joint LML at the fitted params
    ll = float(log_marginal_likelihood(res_g.params, data_g, cfg))
    np.testing.assert_allclose(float(res_g.log_likelihood), ll, rtol=1e-10)
    # and the two fits genuinely differ (joint objective != values-only)
    assert not np.allclose(
        np.asarray(res_g.params.log_ls), np.asarray(res_v.params.log_ls)
    ) or not np.isclose(
        float(res_g.log_likelihood), float(res_v.log_likelihood)
    )


def test_predict_gradient_values_only_matches_fd():
    """Sensitivity serving works for plain (values-only) GPs: the posterior
    gradient mean equals the finite-difference slope of the posterior
    mean, and the variance is finite and nonnegative."""
    rng = np.random.default_rng(6)
    n, d = 25, 2
    X = jnp.asarray(rng.uniform(size=(n, d)))
    y = jnp.sin(3.0 * X[:, 0]) + jnp.cos(2.0 * X[:, 1])
    data = GPData(X=X, y=y)
    cfg = GPConfig(nparams=d, regression_order=1)
    p = GPParams(
        log_amp=jnp.asarray(0.0),
        log_nugget=jnp.asarray(-9.0),
        log_ls=jnp.asarray([-0.7, -0.7]),
    )
    st = precompute_predictor(p, data, cfg)
    Xs = jnp.asarray(rng.uniform(0.2, 0.8, size=(5, d)))
    gm, gv = predict_gradient(st, p, data, Xs, cfg)
    eps = 1e-6
    for a in range(d):
        shift = jnp.zeros((1, d)).at[0, a].set(eps)
        mp, _ = predict_from_precomputed(st, p, data, Xs + shift, cfg)
        mm, _ = predict_from_precomputed(st, p, data, Xs - shift, cfg)
        fd = (mp - mm) / (2 * eps)
        np.testing.assert_allclose(gm[:, a], fd, rtol=1e-4, atol=1e-6)
    assert float(jnp.min(gv)) >= 0.0


def test_gradient_noise_downweights_bad_gradient():
    """A corrupted gradient observation with honest dY_noise barely moves
    the posterior; the same corruption without noise does."""
    data = _sin_data(6)
    bad = data.dY.at[2, 0].add(25.0)
    xs = jnp.linspace(0.0, 1.0, 101)[:, None]
    truth = jnp.sin(3.0 * xs[:, 0])
    cfg = GPConfig(nparams=1, regression_order=0)
    p = GPParams(
        log_amp=jnp.asarray(0.0),
        log_nugget=jnp.asarray(-9.0),
        log_ls=jnp.asarray([-1.0]),
    )
    noisy = GPData(
        X=data.X, y=data.y, dY=bad,
        dY_noise=jnp.zeros_like(bad).at[2, 0].set(1e3),
    )
    plain = GPData(X=data.X, y=data.y, dY=bad)
    m_n, _ = gp_posterior(p, noisy, xs, cfg)
    m_p, _ = gp_posterior(p, plain, xs, cfg)
    rmse_n = float(jnp.sqrt(jnp.mean((m_n - truth) ** 2)))
    rmse_p = float(jnp.sqrt(jnp.mean((m_p - truth) ** 2)))
    assert rmse_n < 0.2 * rmse_p, (rmse_n, rmse_p)


def test_training_basis_gradient_rows():
    """dH/dx rows: constant column zero, power-q blocks diagonal."""
    rng = np.random.default_rng(7)
    X = jnp.asarray(rng.uniform(size=(4, 3)))
    G = regression_basis_grad(X, order=2)
    assert G.shape == (12, 1 + 2 * 3)
    # row i*d + a vs analytic
    for i in range(4):
        for a in range(3):
            row = np.asarray(G[i * 3 + a])
            expect = np.zeros(7)
            expect[1 + a] = 1.0
            expect[4 + a] = 2.0 * float(X[i, a])
            np.testing.assert_allclose(row, expect, atol=1e-14)
    # joint H through training_basis
    data = GPData(X=X, y=jnp.zeros(4), dY=jnp.zeros((4, 3)))
    cfg = GPConfig(nparams=3, regression_order=2)
    H = training_basis(data, cfg)
    assert H.shape == (16, 7)


def test_guards():
    rng = np.random.default_rng(8)
    X = jnp.asarray(rng.uniform(size=(5, 2)))
    data = GPData(
        X=X, y=jnp.zeros(5), dY=jnp.asarray(rng.standard_normal((5, 2)))
    )
    p = _params(1, rng)
    # Matérn-3/2 is not differentiable enough for gradient observations
    cfg32 = GPConfig(nparams=2, covariance=CovarianceFamily.MATERN32)
    with pytest.raises(ValueError, match="twice"):
        kernels.gram_joint(X, p, cfg32)
    # alpha != 2 power-exponential likewise
    cfg15 = GPConfig(nparams=2, power_exp_alpha=1.5)
    p2 = _params(2, rng)
    with pytest.raises(ValueError, match="alpha"):
        kernels.gram_joint(X, p2, cfg15)
    # h_extra + dY is rejected
    cfg = GPConfig(nparams=2)
    bad = data._replace(h_extra=jnp.ones((5, 1)))
    with pytest.raises(ValueError, match="h_extra"):
        training_basis(bad, cfg)
    # predict_fast refuses gradient data
    st = _factor(data, p2, cfg)
    from madaiemulator_tpu.models.gp import fast_predictor_from_state

    fp = fast_predictor_from_state(st)
    with pytest.raises(ValueError, match="gradient"):
        predict_fast(fp, p2, data, X, cfg)
    # matrix-free path refuses gradient data
    from madaiemulator_tpu.models.iterative import (
        lml_iterative,
        precompute_iterative_predictor,
    )

    with pytest.raises(ValueError, match="matrix-free"):
        lml_iterative(p2, data, cfg)
    with pytest.raises(ValueError, match="matrix-free"):
        precompute_iterative_predictor(p2, data, cfg)
    # loo_cv refuses gradient data
    from madaiemulator_tpu.models.diagnostics import loo_cv

    with pytest.raises(ValueError, match="gradient-enhanced"):
        loo_cv(p2, data, cfg)


def test_query_chunked_predict_matches_unchunked():
    """The lax.map query-chunked path produces identical results for
    gradient-enhanced states (joint _train_rows drives the chunk policy)."""
    import dataclasses

    rng = np.random.default_rng(9)
    data = _sin_data(8)
    cfg = GPConfig(nparams=1, regression_order=1)
    p = GPParams(
        log_amp=jnp.asarray(0.0),
        log_nugget=jnp.asarray(-8.0),
        log_ls=jnp.asarray([-1.0]),
    )
    st = _factor(data, p, cfg)
    Xs = jnp.asarray(rng.uniform(size=(13, 1)))
    m1, v1 = predict_from_precomputed(st, p, data, Xs, cfg)
    cfg2 = dataclasses.replace(cfg, predict_query_chunk=4)
    m2, v2 = predict_from_precomputed(st, p, data, Xs, cfg2)
    np.testing.assert_allclose(m1, m2, rtol=1e-12)
    np.testing.assert_allclose(v1, v2, rtol=1e-10, atol=1e-12)
