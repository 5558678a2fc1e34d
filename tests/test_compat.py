"""R-binding-equivalent array API (SURVEY.md §3.4)."""

import numpy as np
import pytest

from madaiemulator_tpu.compat import call_emulate_at_list, call_estimate


def test_call_estimate_and_emulate(rng):
    X = np.linspace(0, 10, 30)[:, None]  # unscaled on purpose
    y = np.sin(X[:, 0])
    thetas = call_estimate(X, y, n_restarts=3, max_steps=40, seed=1)
    assert thetas.shape == (3,)  # amp, nugget, ls for d=1 power-exp
    assert np.all(thetas > 0)
    pts = np.linspace(0.5, 9.5, 20)[:, None]
    means, variances = call_emulate_at_list(X, y, thetas, pts)
    assert means.shape == (20,) and variances.shape == (20,)
    rmse = np.sqrt(np.mean((means - np.sin(pts[:, 0])) ** 2))
    assert rmse < 1e-2, rmse
    assert np.all(variances >= 0)


def test_call_estimate_matern(rng):
    X = rng.uniform(size=(25, 3))
    y = X @ np.array([1.0, -2.0, 0.5]) + 0.1 * np.sin(5 * X[:, 0])
    thetas = call_estimate(
        X, y, covariance="matern32", n_restarts=2, max_steps=30
    )
    assert thetas.shape == (3,)  # amp, nugget, single isotropic ls


def test_call_estimate_shape_errors():
    with pytest.raises(ValueError):
        call_estimate(np.zeros((5, 2)), np.zeros(4))
