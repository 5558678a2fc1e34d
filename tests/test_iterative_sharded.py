"""Mesh-sharded matrix-free inference vs the dense/unsharded paths, on the
8-virtual-device CPU mesh (conftest provisions the devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madaiemulator_tpu.models import iterative
from madaiemulator_tpu.models.gp import GPData
from madaiemulator_tpu.ops import kernels
from madaiemulator_tpu.ops.kernels import GPParams
from madaiemulator_tpu.parallel import iterative_sharded as its
from madaiemulator_tpu.utils.config import GPConfig


def setup_problem(rng, n=52, d=2, nugget=1e-2):
    cfg = GPConfig(nparams=d, regression_order=1)
    X = rng.uniform(size=(n, d))
    p = GPParams(
        log_amp=jnp.asarray(np.log(1.3)),
        log_nugget=jnp.asarray(np.log(nugget)),
        log_ls=jnp.asarray(np.log(np.array([0.6, 0.9][:d]))),
    )
    return cfg, jnp.asarray(X), p


@pytest.mark.parametrize("n", [52, 64])  # 52: needs row padding (52 % 8 != 0)
def test_sharded_matvec_matches_dense(rng, n):
    cfg, X, p = setup_problem(rng, n=n)
    mesh = its.make_rows_mesh(8)
    C = np.asarray(kernels.gram_matrix(X, p, cfg))
    V = rng.standard_normal((n, 3))
    got = np.asarray(
        its.sharded_gram_matvec(X, p, cfg, jnp.asarray(V), mesh, row_chunk=4)
    )
    np.testing.assert_allclose(got, C @ V, rtol=1e-9, atol=1e-12)
    # vector RHS, and under jit
    f = jax.jit(lambda v: its.sharded_gram_matvec(X, p, cfg, v, mesh))
    got1 = np.asarray(f(jnp.asarray(V[:, 0])))
    np.testing.assert_allclose(got1, C @ V[:, 0], rtol=1e-9, atol=1e-12)


def test_sharded_matvec_with_noise_matches_dense(rng):
    """Per-point noise shards with the rows (incl. the padded-rows case)."""
    n = 52
    cfg, X, p = setup_problem(rng, n=n)
    mesh = its.make_rows_mesh(8)
    noise = 10.0 ** rng.uniform(-3, -1, size=n)
    C = np.asarray(kernels.gram_matrix(X, p, cfg)) + np.diag(noise)
    V = rng.standard_normal((n, 3))
    got = np.asarray(
        its.sharded_gram_matvec(
            X, p, cfg, jnp.asarray(V), mesh, row_chunk=4,
            noise=jnp.asarray(noise),
        )
    )
    np.testing.assert_allclose(got, C @ V, rtol=1e-9, atol=1e-12)


def test_sharded_pcg_matches_direct(rng):
    cfg, X, p = setup_problem(rng, n=56)
    mesh = its.make_rows_mesh(8)
    C = np.asarray(kernels.gram_matrix(X, p, cfg))
    B = rng.standard_normal((56, 2))
    Xs, rel, iters = its.pcg_solve_sharded(
        X, p, cfg, jnp.asarray(B), mesh, precond_rank=20, tol=1e-11,
        max_iters=300, row_chunk=7,
    )
    np.testing.assert_allclose(
        np.asarray(Xs), np.linalg.solve(C, B), rtol=1e-6, atol=1e-8
    )


def test_sharded_slq_exact_mode(rng):
    cfg, X, p = setup_problem(rng, n=32)
    mesh = its.make_rows_mesh(8)
    C = np.asarray(kernels.gram_matrix(X, p, cfg))
    est = float(
        its.slq_logdet_sharded(
            X, p, cfg, mesh, jax.random.key(0), probes=32, lanczos_iters=32,
        )
    )
    assert np.isclose(est, np.linalg.slogdet(C)[1], rtol=1e-6)


def test_lml_iterative_sharded_matches_unsharded(rng):
    """lml_iterative(mesh=...) — the multi-chip fit objective — computes
    the same value and gradient as the single-device layout."""
    cfg, X, p = setup_problem(rng, n=40)
    y = jnp.asarray(rng.standard_normal(40))
    data = GPData(X=X, y=y)
    mesh = its.make_rows_mesh(8)
    kw = dict(seed=0, rank=20, probes=12, lanczos_iters=24,
              cg_tol=1e-11, cg_max_iters=300)
    v0 = float(iterative.lml_iterative(p, data, cfg, **kw))
    v1 = float(iterative.lml_iterative(p, data, cfg, mesh=mesh, **kw))
    assert np.isclose(v1, v0, rtol=1e-8), (v1, v0)
    g0 = jax.grad(lambda pp: iterative.lml_iterative(pp, data, cfg, **kw))(p)
    g1 = jax.grad(
        lambda pp: iterative.lml_iterative(pp, data, cfg, mesh=mesh, **kw)
    )(p)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-6)


def test_sharded_matvec_uses_all_devices(rng):
    """The row axis must actually shard: check the output sharding spec."""
    cfg, X, p = setup_problem(rng, n=64)
    mesh = its.make_rows_mesh(8)
    V = jnp.asarray(rng.standard_normal((64, 2)))
    out = jax.jit(lambda v: its.sharded_gram_matvec(X, p, cfg, v, mesh))(V)
    assert len(out.sharding.device_set) == 8
