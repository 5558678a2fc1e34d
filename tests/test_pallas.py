"""Pallas pairwise-covariance kernel vs the XLA builders (interpret mode on
CPU; the same kernel compiles on TPU — exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madaiemulator_tpu.ops import kernels
from madaiemulator_tpu.ops.kernels import GPParams
from madaiemulator_tpu.ops.pallas.pairwise import pairwise_covariance
from madaiemulator_tpu.utils.config import CovarianceFamily, GPConfig


def params_for(d, amp=1.3, nugget=1e-3, ls=0.4, k=None):
    k = d if k is None else k
    return GPParams(
        log_amp=jnp.asarray(np.log(amp), jnp.float32),
        log_nugget=jnp.asarray(np.log(nugget), jnp.float32),
        log_ls=jnp.full((k,), np.log(ls), jnp.float32),
    )


@pytest.mark.parametrize(
    "family,cov",
    [
        ("power_exponential", CovarianceFamily.POWER_EXPONENTIAL),
        ("matern32", CovarianceFamily.MATERN32),
        ("matern52", CovarianceFamily.MATERN52),
    ],
)
def test_pairwise_matches_xla_cross(rng, family, cov):
    d = 3
    cfg = GPConfig(nparams=d, covariance=cov)
    p = params_for(d, k=cfg.num_length_scales)
    X1 = jnp.asarray(rng.uniform(size=(70, d)), jnp.float32)
    X2 = jnp.asarray(rng.uniform(size=(33, d)), jnp.float32)
    want = kernels.cross_covariance(X1, X2, p, cfg)
    ls = jnp.exp(p.log_ls)
    U = X1 / (ls if cfg.num_length_scales == d else ls[0])
    V = X2 / (ls if cfg.num_length_scales == d else ls[0])
    got = pairwise_covariance(
        U, V, jnp.exp(p.log_amp), 0.0, family=family,
        bm=16, bn=16, interpret=True,
    )
    # two f32 implementations (different centering) — f32-level agreement
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_pairwise_gram_diag_add(rng):
    d = 2
    cfg = GPConfig(nparams=d)
    p = params_for(d)
    X = jnp.asarray(rng.uniform(size=(40, d)), jnp.float32)
    ls = jnp.exp(p.log_ls)
    got = pairwise_covariance(
        X / ls, X / ls, jnp.exp(p.log_amp), 0.25,
        family="power_exponential", add_diag=True, bm=16, bn=16,
        interpret=True,
    )
    got = np.asarray(got)
    assert np.allclose(got, got.T, atol=1e-7)
    off = got - np.diag(np.diag(got))
    want_off = np.asarray(
        kernels.cross_covariance(X, X, p, cfg)
    )
    want_off = want_off - np.diag(np.diag(want_off))
    np.testing.assert_allclose(off, want_off, rtol=2e-6, atol=1e-7)
    # diagonal got amp + 0.25
    np.testing.assert_allclose(
        np.diag(got), np.exp(np.float32(np.log(1.3))) + 0.25, rtol=1e-6
    )


def test_pallas_cholesky_matches_numpy(rng):
    from madaiemulator_tpu.ops.pallas.cholesky import pallas_cholesky

    n = 256
    A = rng.standard_normal((n, n)).astype(np.float32)
    A = A @ A.T + n * np.eye(n, dtype=np.float32)
    L = np.asarray(pallas_cholesky(jnp.asarray(A), panel=64, interpret=True))
    L64 = np.linalg.cholesky(A.astype(np.float64))
    assert np.abs(L - L64).max() < 1e-3 * np.abs(L64).max()


def test_pallas_cholesky_vmaps(rng):
    from madaiemulator_tpu.ops.pallas.cholesky import pallas_cholesky

    n, B = 128, 3
    As = []
    for _ in range(B):
        A = rng.standard_normal((n, n)).astype(np.float32)
        As.append(A @ A.T + n * np.eye(n, dtype=np.float32))
    Ab = jnp.asarray(np.stack(As))
    Lb = jax.vmap(lambda a: pallas_cholesky(a, panel=64, interpret=True))(Ab)
    for i in range(B):
        L64 = np.linalg.cholesky(As[i].astype(np.float64))
        assert np.abs(np.asarray(Lb[i]) - L64).max() < 1e-3 * np.abs(L64).max()


def test_pallas_cholesky_rejects_bad_size(rng):
    from madaiemulator_tpu.ops.pallas.cholesky import pallas_cholesky

    with pytest.raises(ValueError):
        pallas_cholesky(jnp.eye(100), panel=64, interpret=True)


def test_pairwise_rejects_unknown_family(rng):
    X = jnp.zeros((8, 2), jnp.float32)
    with pytest.raises(ValueError):
        pairwise_covariance(X, X, 1.0, 0.0, family="cauchy", interpret=True)
