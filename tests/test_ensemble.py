"""Ensemble fitting sharded over a virtual 8-device mesh (BASELINE config 5;
SURVEY.md §2 parallelism table)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madaiemulator_tpu.models.fit import fit_gp, sample_restarts
from madaiemulator_tpu.models.gp import GPData
from madaiemulator_tpu.parallel.ensemble import (
    fit_ensemble,
    fit_ensemble_from_starts,
    make_mesh,
    predict_ensemble,
)
from madaiemulator_tpu.utils.config import GPConfig


def make_batch(E=8, N=16, d=2, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    Xb = rng.uniform(size=(E, N, d))
    freqs = rng.uniform(1.0, 4.0, size=(E, 1))
    yb = np.sin(freqs * Xb[..., 0]) + Xb[..., 1]
    return jnp.asarray(Xb, dtype), jnp.asarray(yb, dtype)


def test_requires_8_devices():
    assert len(jax.devices()) >= 8  # conftest forces 8 virtual CPU devices


def test_fit_ensemble_unsharded_matches_shapes():
    cfg = GPConfig(nparams=2, n_restarts=2, max_opt_steps=10)
    Xb, yb = make_batch(E=4)
    res = fit_ensemble(jax.random.key(0), Xb, yb, cfg)
    assert res.log_likelihood.shape == (4,)
    assert res.restart_log_likelihoods.shape == (4, 2)
    assert res.params.log_ls.shape == (4, 2)
    assert np.all(np.isfinite(np.asarray(res.log_likelihood)))


def test_sharded_lml_eval_matches_unsharded():
    """The deterministic invariant: a likelihood evaluation must be
    bit-for-bit comparable sharded vs not (no optimizer branches involved)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from madaiemulator_tpu.models.fit import _bounds_arrays, _u_to_params
    from madaiemulator_tpu.models.gp import log_marginal_likelihood

    cfg = GPConfig(nparams=2)
    Xb, yb = make_batch(E=8, dtype=jnp.float64)
    lo, hi = _bounds_arrays(cfg, jnp.float64)
    u = sample_restarts(jax.random.key(9), cfg, 8, dtype=jnp.float64)
    p = jax.vmap(lambda uu: _u_to_params(uu, lo, hi))(u)

    f = jax.jit(
        jax.vmap(lambda pp, X, y: log_marginal_likelihood(pp, GPData(X, y), cfg))
    )
    local = f(p, Xb, yb)
    mesh = make_mesh(8)
    sh = NamedSharding(mesh, P("ensemble"))
    p_sh = jax.tree.map(lambda a: jax.device_put(a, sh), p)
    sharded = f(p_sh, jax.device_put(Xb, sh), jax.device_put(yb, sh))
    np.testing.assert_allclose(np.asarray(local), np.asarray(sharded), rtol=1e-12)


def test_fit_ensemble_sharded_matches_unsharded():
    """In f64, per-member math is reduction-order stable, so sharding must
    not move the optima (in f32 this comparison is chaotic: a ~1-ulp fusion
    difference can flip a zoom-linesearch branch and diverge one member's
    trajectory — observed as a 10% LML outlier in round 2)."""
    cfg = GPConfig(nparams=2, n_restarts=2, max_opt_steps=10)
    Xb, yb = make_batch(E=8, dtype=jnp.float64)
    mesh = make_mesh(8)
    res_sharded = fit_ensemble(jax.random.key(1), Xb, yb, cfg, mesh=mesh)
    res_local = fit_ensemble(jax.random.key(1), Xb, yb, cfg)
    np.testing.assert_allclose(
        np.asarray(res_sharded.log_likelihood),
        np.asarray(res_local.log_likelihood),
        rtol=1e-6,
    )


def test_fit_ensemble_chunked_matches_unchunked():
    """ensemble_chunk must change only scheduling, not results: groups are
    whole ensemble members, each fit from the same per-member PRNG starts."""
    cfg = GPConfig(nparams=2, n_restarts=2, max_opt_steps=10)
    Xb, yb = make_batch(E=8, dtype=jnp.float64)
    res_full = fit_ensemble(jax.random.key(5), Xb, yb, cfg)
    res_chunk = fit_ensemble(jax.random.key(5), Xb, yb, cfg, ensemble_chunk=2)
    np.testing.assert_allclose(
        np.asarray(res_full.log_likelihood),
        np.asarray(res_chunk.log_likelihood),
        rtol=1e-8,
    )
    assert res_chunk.restart_log_likelihoods.shape == (8, 2)
    with pytest.raises(ValueError, match="not divisible"):
        fit_ensemble(jax.random.key(5), Xb, yb, cfg, ensemble_chunk=3)


def test_fit_ensemble_restart_split_merges_correctly():
    """restart_split runs restarts as sequential programs; the merged result
    must have the full restart axis, a consistent argmax, and a best-ll at
    least as good as either half (it IS one of the halves' bests)."""
    cfg = GPConfig(nparams=2, n_restarts=4, max_opt_steps=10)
    Xb, yb = make_batch(E=4, dtype=jnp.float64)
    res = fit_ensemble(jax.random.key(7), Xb, yb, cfg, restart_split=2)
    assert res.restart_log_likelihoods.shape == (4, 4)
    assert res.params.log_ls.shape == (4, 2)
    lls = np.asarray(res.restart_log_likelihoods)
    best = np.asarray(res.log_likelihood)
    np.testing.assert_allclose(
        best, np.max(np.where(np.isfinite(lls), lls, -np.inf), axis=1)
    )
    # the selected params reproduce the reported best likelihood
    from madaiemulator_tpu.models.gp import log_marginal_likelihood

    for e in range(4):
        p_e = jax.tree.map(lambda a: a[e], res.params)
        ll_e = float(
            log_marginal_likelihood(p_e, GPData(Xb[e], yb[e]), cfg)
        )
        assert np.isclose(ll_e, best[e], rtol=1e-8), (e, ll_e, best[e])


def test_fit_ensemble_auto_restart_split_on_tpu(monkeypatch):
    """On TPU backends, R>2 must auto-split into <=2-restart programs (the
    R=4 restart-axis program reproducibly crashes the TPU worker; VERDICT r2
    weak #3 made the opt-in workaround a default). The auto-split must be a
    pure scheduling change: results match an explicit restart_split=2 run."""
    import madaiemulator_tpu.parallel.ensemble as ens

    assert ens._auto_restart_split(2) is None  # R<=2 never splits
    monkeypatch.setattr(ens, "_is_tpu_backend", lambda: False)
    assert ens._auto_restart_split(4) is None  # CPU/GPU: no crash, no split
    monkeypatch.setattr(ens, "_is_tpu_backend", lambda: True)
    assert ens._auto_restart_split(4) == 2

    cfg = GPConfig(nparams=2, n_restarts=4, max_opt_steps=10)
    Xb, yb = make_batch(E=4, dtype=jnp.float64)
    res_auto = fit_ensemble(jax.random.key(7), Xb, yb, cfg)
    res_explicit = fit_ensemble(jax.random.key(7), Xb, yb, cfg, restart_split=2)
    np.testing.assert_allclose(
        np.asarray(res_auto.restart_log_likelihoods),
        np.asarray(res_explicit.restart_log_likelihoods),
        rtol=1e-12,
    )
    # explicit restart_split=R forces the single wide program (opt-out)
    res_wide = fit_ensemble(jax.random.key(7), Xb, yb, cfg, restart_split=4)
    assert res_wide.restart_log_likelihoods.shape == (4, 4)


def test_make_mesh_validates_restart_shards():
    with pytest.raises(ValueError, match="not divisible"):
        make_mesh(8, restart_shards=3)


def test_predict_queries_sharded_fewer_queries_than_axis(rng):
    """Regression (ADVICE r1): m < mesh axis used to pad with only m rows."""
    from madaiemulator_tpu.models.multivariate import (
        fit_multivariate,
        predict_multivariate,
    )
    from madaiemulator_tpu.parallel.ensemble import predict_queries_sharded

    X = rng.uniform(size=(20, 2))
    Y = np.stack([np.sin(3 * X[:, 0]), X[:, 1] ** 2], axis=1)
    cfg = GPConfig(nparams=2, n_restarts=2, max_opt_steps=15)
    emu = fit_multivariate(
        jax.random.key(8), jnp.asarray(X), jnp.asarray(Y), cfg, pca_variance=0.999
    )
    Xq = rng.uniform(0.1, 0.9, size=(2, 2))  # 2 queries on an 8-wide axis
    m_local, v_local = predict_multivariate(emu, jnp.asarray(Xq))
    m_sh, v_sh = predict_queries_sharded(emu, jnp.asarray(Xq), mesh=make_mesh(8))
    assert m_sh.shape == m_local.shape
    np.testing.assert_allclose(np.asarray(m_local), np.asarray(m_sh), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(v_local), np.asarray(v_sh), rtol=1e-8)


def test_fit_ensemble_2d_sharding_runs():
    cfg = GPConfig(nparams=2, n_restarts=4, max_opt_steps=5)
    Xb, yb = make_batch(E=8)
    mesh = make_mesh(8, restart_shards=2)
    from jax.sharding import NamedSharding, PartitionSpec as P

    keys = jax.random.split(jax.random.key(2), 8)
    u0 = jax.vmap(lambda k: sample_restarts(k, cfg, 4, dtype=jnp.float32))(keys)
    u0 = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("ensemble", "restart"))),
        u0,
    )
    Xb = jax.device_put(Xb, NamedSharding(mesh, P("ensemble")))
    yb = jax.device_put(yb, NamedSharding(mesh, P("ensemble")))
    res = fit_ensemble_from_starts(u0, Xb, yb, cfg, max_steps=5)
    assert res.log_likelihood.shape == (8,)
    assert np.all(np.isfinite(np.asarray(res.log_likelihood)))


def test_ensemble_member_matches_single_fit():
    """Member e of the ensemble must equal a solo fit with the same start."""
    cfg = GPConfig(nparams=2, n_restarts=3, max_opt_steps=15)
    Xb, yb = make_batch(E=3, dtype=jnp.float64)
    keys = jax.random.split(jax.random.key(3), 3)
    u0 = jax.vmap(lambda k: sample_restarts(k, cfg, 3, dtype=jnp.float64))(keys)
    res = fit_ensemble_from_starts(u0, Xb, yb, cfg, max_steps=15)
    from madaiemulator_tpu.models.fit import fit_one_start

    for e in range(3):
        best = -np.inf
        for r in range(3):
            u = jax.tree.map(lambda a: a[e, r], u0)
            _, negll = fit_one_start(u, Xb[e], yb[e], cfg, 15)
            best = max(best, float(-negll))
        # batched and solo trajectories differ in reduction order; optima agree
        assert np.isclose(best, float(res.log_likelihood[e]), rtol=1e-5), e


def test_predict_ensemble_shapes_and_values():
    cfg = GPConfig(nparams=2, n_restarts=3, max_opt_steps=40)
    Xb, yb = make_batch(E=4, N=32)
    res = fit_ensemble(jax.random.key(4), Xb, yb, cfg)
    mesh = make_mesh(4)
    means, variances = predict_ensemble(res.params, Xb, yb, Xb, cfg, mesh=mesh)
    assert means.shape == yb.shape
    assert np.all(np.asarray(variances) >= 0)
    # training-point predictions track the data (MLE may keep a smoothing
    # nugget on sparse 2D designs, so this is a tracking bound, not exact
    # interpolation)
    rmse = float(np.sqrt(np.mean((np.asarray(means) - np.asarray(yb)) ** 2)))
    assert rmse < 0.1, rmse


def test_predict_queries_sharded_matches_local(rng):
    from madaiemulator_tpu.models.multivariate import (
        fit_multivariate,
        predict_multivariate,
    )
    from madaiemulator_tpu.parallel.ensemble import predict_queries_sharded

    X = rng.uniform(size=(25, 2))
    Y = np.stack([np.sin(3 * X[:, 0]), X[:, 1] ** 2], axis=1)
    cfg = GPConfig(nparams=2, n_restarts=2, max_opt_steps=20)
    emu = fit_multivariate(
        jax.random.key(7), jnp.asarray(X), jnp.asarray(Y), cfg, pca_variance=0.999
    )
    Xq = rng.uniform(0.1, 0.9, size=(19, 2))  # deliberately not % 8
    m_local, v_local = predict_multivariate(emu, jnp.asarray(Xq))
    mesh = make_mesh(8)
    m_sh, v_sh = predict_queries_sharded(emu, jnp.asarray(Xq), mesh=mesh)
    np.testing.assert_allclose(np.asarray(m_local), np.asarray(m_sh), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(v_local), np.asarray(v_sh), rtol=1e-8)


def test_graft_entry_contract():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    means, variances = out
    assert np.all(np.isfinite(np.asarray(means)))
    mod.dryrun_multichip(8)
