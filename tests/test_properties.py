"""Property tests (SURVEY.md §4c): invariances and structural guarantees."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madaiemulator_tpu.models import gp
from madaiemulator_tpu.models.gp import GPData
from madaiemulator_tpu.ops import kernels
from madaiemulator_tpu.ops.kernels import GPParams
from madaiemulator_tpu.utils.config import CovarianceFamily, GPConfig


def mk(rng, n=18, d=2, nugget=1e-3):
    cfg = GPConfig(nparams=d, regression_order=1)
    X = rng.uniform(size=(n, d))
    y = np.sin(2 * X[:, 0]) + X[:, 1]
    p = GPParams(
        log_amp=jnp.asarray(np.log(1.4)),
        log_nugget=jnp.asarray(np.log(nugget)),
        log_ls=jnp.asarray(np.log([0.5, 0.8])),
    )
    return cfg, GPData(X=jnp.asarray(X), y=jnp.asarray(y)), p


def test_lml_invariant_under_point_permutation(rng):
    cfg, data, p = mk(rng)
    ll1 = float(gp.log_marginal_likelihood(p, data, cfg))
    perm = rng.permutation(data.X.shape[0])
    data2 = GPData(X=data.X[perm], y=data.y[perm])
    ll2 = float(gp.log_marginal_likelihood(p, data2, cfg))
    assert np.isclose(ll1, ll2, rtol=1e-10)


def test_posterior_invariant_under_point_permutation(rng):
    cfg, data, p = mk(rng)
    Xs = jnp.asarray(rng.uniform(size=(6, 2)))
    m1, v1 = gp.gp_posterior(p, data, Xs, cfg)
    perm = rng.permutation(data.X.shape[0])
    m2, v2 = gp.gp_posterior(p, GPData(X=data.X[perm], y=data.y[perm]), Xs, cfg)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-8)


@pytest.mark.parametrize(
    "fam", [CovarianceFamily.POWER_EXPONENTIAL, CovarianceFamily.MATERN32,
            CovarianceFamily.MATERN52]
)
def test_gram_matrices_are_psd(rng, fam):
    d = 3
    cfg = GPConfig(nparams=d, covariance=fam)
    X = jnp.asarray(rng.uniform(size=(30, d)))
    p = GPParams(
        log_amp=jnp.asarray(0.4),
        log_nugget=jnp.asarray(np.log(1e-6)),
        log_ls=jnp.asarray(np.log(np.full(cfg.num_length_scales, 0.3))),
    )
    C = np.asarray(kernels.gram_matrix(X, p, cfg))
    w = np.linalg.eigvalsh(C)
    assert w.min() > 0, w.min()


def test_likelihood_decreases_with_wrong_scale(rng):
    """amp far off the data scale must score worse than the moment-matched amp."""
    cfg, data, p = mk(rng)
    ll_good = float(gp.log_marginal_likelihood(p, data, cfg))
    p_bad = p._replace(log_amp=jnp.asarray(np.log(1e4)))
    ll_bad = float(gp.log_marginal_likelihood(p_bad, data, cfg))
    assert ll_good > ll_bad


def test_variance_shrinks_with_more_data(rng):
    cfg, data, p = mk(rng, n=24)
    Xs = jnp.asarray([[0.5, 0.5]])
    _, v_full = gp.gp_posterior(p, data, Xs, cfg)
    half = GPData(X=data.X[:8], y=data.y[:8])
    _, v_half = gp.gp_posterior(p, half, Xs, cfg)
    assert float(v_full[0]) <= float(v_half[0]) + 1e-12


def test_profiler_trace_and_timed(rng, tmp_path):
    """utils.profiling smoke: trace context writes events; timed syncs."""
    from madaiemulator_tpu.utils.profiling import timed, trace

    cfg, data, p = mk(rng)
    f = jax.jit(lambda pp: gp.log_marginal_likelihood(pp, data, cfg))
    logdir = str(tmp_path / "trace")
    with trace(logdir):
        f(p)
    import pathlib

    files = list(pathlib.Path(logdir).rglob("*"))
    assert any(x.is_file() for x in files), "no trace files written"
    t, out = timed(f, p)
    assert t > 0 and np.isfinite(float(out))


def test_mean_exact_for_polynomial_data(rng):
    """With y exactly in the regression span, the GLS mean reproduces it
    everywhere (GP correction vanishes at the residual level)."""
    d = 2
    cfg = GPConfig(nparams=d, regression_order=1)
    X = rng.uniform(size=(20, d))
    beta = np.array([0.7, -1.2, 2.5])
    y = beta[0] + X @ beta[1:]
    p = GPParams(
        log_amp=jnp.asarray(np.log(1.0)),
        log_nugget=jnp.asarray(np.log(1e-8)),
        log_ls=jnp.asarray(np.log([0.5, 0.5])),
    )
    Xs = rng.uniform(size=(10, d))
    mean, _ = gp.gp_posterior(
        p, GPData(X=jnp.asarray(X), y=jnp.asarray(y)), jnp.asarray(Xs), cfg
    )
    want = beta[0] + Xs @ beta[1:]
    np.testing.assert_allclose(np.asarray(mean), want, rtol=1e-6, atol=1e-8)
