"""SPD linear algebra vs numpy references on random SPD matrices (SURVEY.md §4a/4d)."""

import jax.numpy as jnp
import numpy as np
import pytest

from madaiemulator_tpu.ops import linalg


def random_spd(rng, n, dtype=np.float64):
    A = rng.standard_normal((n, n)).astype(dtype)
    return A @ A.T + n * np.eye(n, dtype=dtype)


def test_unblocked_cholesky_matches_numpy(rng):
    A = random_spd(rng, 24)
    L = np.asarray(linalg._unblocked_cholesky(jnp.asarray(A)))
    assert np.allclose(L, np.linalg.cholesky(A), rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("n,block", [(64, 16), (96, 32), (256, 64), (128, 128)])
def test_blocked_cholesky_matches_numpy(rng, n, block):
    A = random_spd(rng, n)
    L = np.asarray(linalg.blocked_cholesky(jnp.asarray(A), block=block))
    assert np.allclose(L, np.linalg.cholesky(A), rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("block", [32, 64])
@pytest.mark.parametrize("prec", ["high", "highest"])
def test_blocked_cholesky_opt_matches_numpy(rng, block, prec):
    A = random_spd(rng, 128)
    L = np.asarray(
        linalg.blocked_cholesky_opt(
            jnp.asarray(A), block=block, update_precision=prec
        )
    )
    assert np.allclose(L, np.linalg.cholesky(A), rtol=1e-9, atol=1e-9)


def test_blocked_cholesky_opt_gradient_matches_xla(rng):
    """The custom VJP must reproduce XLA's cholesky gradient exactly
    (O(n^2) memory is the point; correctness checked here)."""
    import jax

    A = jnp.asarray(random_spd(rng, 96))

    def f_xla(M):
        L = linalg.xla_cholesky(M)
        return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(L * jnp.cos(L))

    def f_blk(M):
        L = linalg.blocked_cholesky_opt(M, block=32)
        return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(L * jnp.cos(L))

    g1 = np.asarray(jax.grad(f_xla)(A))
    g2 = np.asarray(jax.grad(f_blk)(A))
    np.testing.assert_allclose(g1, g2, rtol=1e-8, atol=1e-10)


def test_pallas_cholesky_diff_gradient_matches_xla(rng):
    """The Pallas kernel's custom VJP reproduces XLA's cholesky gradient
    (interpret mode; the kernel itself is TPU-compiled in production)."""
    import jax

    A = jnp.asarray(random_spd(rng, 128, dtype=np.float32))

    def f_xla(M):
        L = linalg.xla_cholesky(M)
        return jnp.sum(jnp.log(jnp.diagonal(L)))

    def f_pallas(M):
        L = linalg.pallas_cholesky_diff(M, panel=64, interpret=True)
        return jnp.sum(jnp.log(jnp.diagonal(L)))

    g1 = np.asarray(jax.grad(f_xla)(A))
    g2 = np.asarray(jax.grad(f_pallas)(A))
    np.testing.assert_allclose(g1, g2, rtol=1e-3, atol=1e-5)


def test_blocked_cholesky_opt_f32_accuracy(rng):
    """f32 + HIGH-precision updates must stay at f32-level error vs f64."""
    A = random_spd(rng, 256)
    L64 = np.linalg.cholesky(A)
    L32 = np.asarray(
        linalg.blocked_cholesky_opt(jnp.asarray(A, dtype=jnp.float32), block=64)
    )
    rel = np.abs(L32 - L64) / (np.abs(L64).max())
    assert rel.max() < 1e-5, rel.max()


@pytest.mark.parametrize("n,block", [(96, 32), (256, 64), (128, 128)])
def test_left_cholesky_matches_numpy_f64(rng, n, block):
    A = random_spd(rng, n)
    L = np.asarray(linalg.left_cholesky(jnp.asarray(A), block=block))
    assert np.allclose(L, np.linalg.cholesky(A), rtol=1e-9, atol=1e-9)
    assert np.allclose(np.triu(L, 1), 0.0)


@pytest.mark.parametrize("prec", ["high", "highest"])
def test_left_cholesky_f32(rng, prec):
    A = random_spd(rng, 192)
    L64 = np.linalg.cholesky(A)
    L32 = np.asarray(
        linalg.left_cholesky(
            jnp.asarray(A, dtype=jnp.float32), block=64, update_precision=prec
        )
    )
    rel = np.abs(L32 - L64) / np.abs(L64).max()
    assert rel.max() < (1e-5 if prec == "highest" else 1e-3), rel.max()


def test_left_cholesky_gradient_matches_xla(rng):
    """Murray custom VJP through the left-looking factorization."""
    import jax

    A = jnp.asarray(random_spd(rng, 96))

    def f_xla(M):
        L = linalg.xla_cholesky(M)
        return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(L * jnp.cos(L))

    def f_left(M):
        L = linalg.left_cholesky(M, block=32)
        return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(L * jnp.cos(L))

    g1 = np.asarray(jax.grad(f_xla)(A))
    g2 = np.asarray(jax.grad(f_left)(A))
    np.testing.assert_allclose(g1, g2, rtol=1e-8, atol=1e-10)


def test_left_cholesky_sharded_distributes_and_matches(rng):
    """Row-sharded execution over the 8-virtual-device mesh: result must be
    laid out across all devices and match numpy exactly."""
    import jax
    from jax.sharding import Mesh

    n = 256
    A = random_spd(rng, n)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("rows",))
    L = linalg.left_cholesky_sharded(jnp.asarray(A), mesh, block=64)
    assert len(L.sharding.device_set) == 8
    assert np.allclose(np.asarray(L), np.linalg.cholesky(A), rtol=1e-9)


def test_choose_update_precision_thresholds():
    assert linalg.choose_update_precision(1e2) == "high"
    assert linalg.choose_update_precision(1e4) == "high"
    assert linalg.choose_update_precision(1e5) == "highest"
    assert linalg.choose_update_precision(1e7) == "highest"
    # GP bound: amp is the variance amplitude, nugget_eff the diagonal add
    k = linalg.gp_kappa_bound(16384, 1.0, 1e-2)
    assert k == pytest.approx(1.0 + 16384 / 1e-2)


def test_logdet_and_cho_solve(rng):
    A = random_spd(rng, 40)
    b = rng.standard_normal(40)
    L = linalg.xla_cholesky(jnp.asarray(A))
    sign, logdet = np.linalg.slogdet(A)
    assert sign > 0
    assert np.isclose(float(linalg.logdet_from_chol(L)), logdet, rtol=1e-10)
    x = np.asarray(linalg.cho_solve(L, jnp.asarray(b)))
    assert np.allclose(x, np.linalg.solve(A, b), rtol=1e-8)
    B = rng.standard_normal((40, 3))
    Xs = np.asarray(linalg.cho_solve(L, jnp.asarray(B)))
    assert np.allclose(Xs, np.linalg.solve(A, B), rtol=1e-8)


def test_chol_ok_flags_non_spd(rng):
    A = np.eye(8)
    A[3, 3] = -1.0  # not SPD
    L = linalg.xla_cholesky(jnp.asarray(A))
    assert not bool(linalg.chol_ok(L))
    L2 = linalg.xla_cholesky(jnp.asarray(random_spd(rng, 8)))
    assert bool(linalg.chol_ok(L2))


def test_pad_spd_identity_tail(rng):
    A = random_spd(rng, 10)
    Ap, n = linalg.pad_spd(jnp.asarray(A), 8)
    assert Ap.shape == (16, 16) and n == 10
    Lp = np.asarray(linalg.xla_cholesky(Ap))
    assert np.allclose(Lp[:10, :10], np.linalg.cholesky(A), rtol=1e-10)
    # identity tail contributes nothing to the logdet
    assert np.isclose(
        float(linalg.logdet_from_chol(jnp.asarray(Lp))),
        np.linalg.slogdet(A)[1],
        rtol=1e-10,
    )
