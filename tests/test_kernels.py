"""Kernel/Gram builders vs closed-form scalar evaluation (SURVEY.md §4a)."""

import jax.numpy as jnp
import numpy as np
import pytest

from madaiemulator_tpu.ops import kernels
from madaiemulator_tpu.ops.kernels import GPParams, params_to_thetas, thetas_to_params
from madaiemulator_tpu.utils.config import CovarianceFamily, GPConfig


def make_params(amp, nugget, ls):
    ls = np.atleast_1d(ls).astype(np.float64)
    return GPParams(
        log_amp=jnp.asarray(np.log(amp)),
        log_nugget=jnp.asarray(np.log(nugget)),
        log_ls=jnp.asarray(np.log(ls)),
    )


def scalar_powerexp(x, y, amp, ls, alpha):
    return amp * np.exp(-0.5 * np.sum((np.abs(x - y) / ls) ** alpha))


def scalar_matern(x, y, amp, ls, nu):
    r = np.linalg.norm((x - y) / ls)
    if nu == 1.5:
        s = np.sqrt(3.0) * r
        return amp * (1 + s) * np.exp(-s)
    s = np.sqrt(5.0) * r
    return amp * (1 + s + s * s / 3.0) * np.exp(-s)


@pytest.mark.parametrize("alpha", [2.0, 1.9])
def test_power_exponential_matches_scalar(rng, alpha):
    d = 3
    cfg = GPConfig(nparams=d, power_exp_alpha=alpha)
    X = rng.uniform(size=(7, d))
    Y = rng.uniform(size=(5, d))
    ls = rng.uniform(0.3, 2.0, size=d)
    p = make_params(1.7, 1e-3, ls)
    K = np.asarray(kernels.cross_covariance(jnp.asarray(X), jnp.asarray(Y), p, cfg))
    for i in range(7):
        for j in range(5):
            expect = scalar_powerexp(X[i], Y[j], 1.7, ls, alpha)
            assert np.isclose(K[i, j], expect, rtol=1e-10), (i, j)


def test_power_dist_chunked_matches_unchunked(rng, monkeypatch):
    """The alpha != 2 path must give identical results (and exact gradients)
    when the memory cap forces lax.map row chunking."""
    import jax

    d = 3
    cfg = GPConfig(nparams=d, power_exp_alpha=1.7)
    X = rng.uniform(size=(13, d))
    Y = rng.uniform(size=(5, d))
    ls = rng.uniform(0.3, 2.0, size=d)
    p = make_params(1.1, 1e-3, ls)
    K_full = np.asarray(
        kernels.cross_covariance(jnp.asarray(X), jnp.asarray(Y), p, cfg)
    )
    g_full = np.asarray(
        jax.grad(
            lambda ll: jnp.sum(
                kernels.cross_covariance(
                    jnp.asarray(X), jnp.asarray(Y), p._replace(log_ls=ll), cfg
                )
            )
        )(p.log_ls)
    )
    # force chunking: cap fits only 4 rows of (n2=5, d=3) at a time
    monkeypatch.setattr(kernels, "_POWER_DIST_MAX_ELEMS", 4 * 5 * 3)
    K_chunk = np.asarray(
        kernels.cross_covariance(jnp.asarray(X), jnp.asarray(Y), p, cfg)
    )
    g_chunk = np.asarray(
        jax.grad(
            lambda ll: jnp.sum(
                kernels.cross_covariance(
                    jnp.asarray(X), jnp.asarray(Y), p._replace(log_ls=ll), cfg
                )
            )
        )(p.log_ls)
    )
    np.testing.assert_allclose(K_chunk, K_full, rtol=1e-12)
    np.testing.assert_allclose(g_chunk, g_full, rtol=1e-12)


@pytest.mark.parametrize(
    "fam,nu",
    [(CovarianceFamily.MATERN32, 1.5), (CovarianceFamily.MATERN52, 2.5)],
)
def test_matern_matches_scalar(rng, fam, nu):
    d = 4
    cfg = GPConfig(nparams=d, covariance=fam)
    X = rng.uniform(size=(6, d))
    Y = rng.uniform(size=(4, d))
    p = make_params(2.3, 1e-4, 0.7)  # isotropic
    K = np.asarray(kernels.cross_covariance(jnp.asarray(X), jnp.asarray(Y), p, cfg))
    for i in range(6):
        for j in range(4):
            expect = scalar_matern(X[i], Y[j], 2.3, 0.7, nu)
            assert np.isclose(K[i, j], expect, rtol=1e-8, atol=1e-12), (i, j)


@pytest.mark.parametrize(
    "fam,nu",
    [
        (CovarianceFamily.MATERN32_ARD, 1.5),
        (CovarianceFamily.MATERN52_ARD, 2.5),
    ],
)
def test_matern_ard_matches_scalar(rng, fam, nu):
    """ARD Matérn (per-dimension length scales; extension past the
    reference's isotropic Matérn): r^2 = sum_d (dx_d/ell_d)^2 feeds the same
    Matérn polynomial. scalar_matern's broadcast handles vector ls."""
    d = 3
    cfg = GPConfig(nparams=d, covariance=fam)
    assert cfg.num_length_scales == d
    X = rng.uniform(size=(6, d))
    Y = rng.uniform(size=(4, d))
    ls = np.array([0.4, 0.9, 1.7])
    p = make_params(2.3, 1e-4, ls)
    K = np.asarray(kernels.cross_covariance(jnp.asarray(X), jnp.asarray(Y), p, cfg))
    for i in range(6):
        for j in range(4):
            expect = scalar_matern(X[i], Y[j], 2.3, ls, nu)
            assert np.isclose(K[i, j], expect, rtol=1e-8, atol=1e-12), (i, j)
    # equal length scales must reduce exactly to the isotropic family
    iso = CovarianceFamily.MATERN32 if nu == 1.5 else CovarianceFamily.MATERN52
    cfg_iso = GPConfig(nparams=d, covariance=iso)
    p_ard = make_params(2.3, 1e-4, [0.7, 0.7, 0.7])
    p_iso = make_params(2.3, 1e-4, 0.7)
    K_ard = np.asarray(kernels.cross_covariance(jnp.asarray(X), jnp.asarray(Y), p_ard, cfg))
    K_iso = np.asarray(kernels.cross_covariance(jnp.asarray(X), jnp.asarray(Y), p_iso, cfg_iso))
    np.testing.assert_allclose(K_ard, K_iso, rtol=1e-12)


def test_gram_adds_nugget_and_is_symmetric(rng):
    d = 2
    cfg = GPConfig(nparams=d)
    X = rng.uniform(size=(10, d))
    p = make_params(1.0, 0.25, [0.5, 1.5])
    C = np.asarray(kernels.gram_matrix(jnp.asarray(X), p, cfg))
    assert np.allclose(C, C.T)
    Kxx = np.asarray(
        kernels.cross_covariance(jnp.asarray(X), jnp.asarray(X), p, cfg)
    )
    assert np.allclose(np.diag(C), np.diag(Kxx) + 0.25, rtol=1e-12)


def test_theta_vector_round_trip():
    p = make_params(3.0, 1e-2, [0.4, 0.9])
    th = params_to_thetas(p)
    assert np.allclose(np.asarray(th), [3.0, 1e-2, 0.4, 0.9])
    p2 = thetas_to_params(th)
    for a, b in zip(p, p2):
        assert np.allclose(np.asarray(a), np.asarray(b))


def test_kdiag_includes_nugget_policy(rng):
    d = 2
    X = rng.uniform(size=(3, d))
    p = make_params(2.0, 0.1, [1.0, 1.0])
    cfg_with = GPConfig(nparams=d, predict_variance_includes_nugget=True)
    cfg_without = GPConfig(nparams=d, predict_variance_includes_nugget=False)
    assert np.allclose(np.asarray(kernels.kdiag(jnp.asarray(X), p, cfg_with)), 2.1)
    assert np.allclose(np.asarray(kernels.kdiag(jnp.asarray(X), p, cfg_without)), 2.0)
