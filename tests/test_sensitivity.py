"""Sensitivity analysis: Saltelli estimators vs analytic Sobol indices,
main-effect curves, and the emulator adapters (beyond-reference — the
reference has no sensitivity tooling; SURVEY §3.2)."""

import jax
import jax.numpy as jnp
import numpy as np

from madaiemulator_tpu import GPConfig, GPData, fit_gp
from madaiemulator_tpu.models.sensitivity import (
    gp_mean_fn,
    main_effects,
    multivariate_mean_fn,
    sobol_indices,
)


def _ishigami(U):
    """Ishigami on [0,1]^3 mapped to [-pi, pi]^3 (a=7, b=0.1)."""
    X = (U - 0.5) * (2.0 * jnp.pi)
    return (
        jnp.sin(X[:, 0])
        + 7.0 * jnp.sin(X[:, 1]) ** 2
        + 0.1 * X[:, 2] ** 4 * jnp.sin(X[:, 0])
    )


def test_sobol_ishigami_analytic():
    """Estimator correctness against the Ishigami closed forms."""
    a, b = 7.0, 0.1
    pi = np.pi
    V1 = 0.5 * (1 + b * pi**4 / 5) ** 2
    V2 = a**2 / 8
    V13 = b**2 * pi**8 * (1 / 18 - 1 / 50)
    V = V1 + V2 + V13
    S = np.array([V1 / V, V2 / V, 0.0])
    T = np.array([(V1 + V13) / V, V2 / V, V13 / V])

    res = sobol_indices(
        _ishigami, 3, jax.random.PRNGKey(0), n=32768, dtype=jnp.float64
    )
    np.testing.assert_allclose(np.asarray(res.first), S, atol=0.02)
    np.testing.assert_allclose(np.asarray(res.total), T, atol=0.02)
    np.testing.assert_allclose(float(res.variance), V, rtol=0.05)


def test_sobol_chunked_matches_unchunked():
    r1 = sobol_indices(
        _ishigami, 3, jax.random.PRNGKey(1), n=2048, query_chunk=None
    )
    r2 = sobol_indices(
        _ishigami, 3, jax.random.PRNGKey(1), n=2048, query_chunk=500
    )
    for a, b in zip(r1, r2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_sobol_through_fitted_gp():
    """End-to-end: additive linear truth f = 2 x1 + x2 has S = (0.8, 0.2);
    the fitted emulator's indices recover it."""
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(40, 2)))
    y = 2.0 * X[:, 0] + X[:, 1]
    data = GPData(X=X, y=y)
    cfg = GPConfig(nparams=2, regression_order=0)
    res = fit_gp(jax.random.PRNGKey(2), data, cfg, n_restarts=6, max_steps=50)
    fn = gp_mean_fn(res.params, data, cfg)
    out = sobol_indices(fn, 2, jax.random.PRNGKey(3), n=8192,
                        dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(out.first), [0.8, 0.2], atol=0.03)
    np.testing.assert_allclose(np.asarray(out.total), [0.8, 0.2], atol=0.03)


def test_main_effects_linear():
    """E[f | x0 = v] = 2 v + 0.5 for f = 2 x0 + x1 on [0,1]^2."""

    def f(U):
        return 2.0 * U[:, 0] + U[:, 1]

    gv, eff = main_effects(f, 2, jax.random.PRNGKey(4), grid=11, n=20000,
                           dtype=jnp.float64)
    np.testing.assert_allclose(
        np.asarray(eff[0]), 2.0 * np.asarray(gv) + 0.5, atol=0.02
    )
    np.testing.assert_allclose(
        np.asarray(eff[1]), np.asarray(gv) + 1.0, atol=0.02
    )


def test_multivariate_adapter():
    """Per-observable indices through a fitted MultivariateEmulator: the
    first observable depends only on x0, the second only on x1."""
    from madaiemulator_tpu.models.multivariate import fit_multivariate

    rng = np.random.default_rng(5)
    X_raw = rng.uniform(0.0, 10.0, size=(30, 2))  # raw (unscaled) box
    Y = np.stack(
        [np.sin(0.3 * X_raw[:, 0]), 0.1 * X_raw[:, 1] ** 1.5], axis=1
    )
    cfg = GPConfig(
        nparams=2, regression_order=1, n_restarts=4, max_opt_steps=40
    )
    emu = fit_multivariate(
        jax.random.PRNGKey(6), jnp.asarray(X_raw), jnp.asarray(Y), cfg,
        pca_variance=1.0,
    )
    fn = multivariate_mean_fn(emu)
    out = sobol_indices(fn, 2, jax.random.PRNGKey(7), n=4096,
                        dtype=jnp.float64)
    first = np.asarray(out.first)  # (d, t)
    assert first.shape == (2, 2)
    # observable 0 driven by x0, observable 1 by x1
    assert first[0, 0] > 0.9 and first[1, 0] < 0.1
    assert first[1, 1] > 0.9 and first[0, 1] < 0.1
