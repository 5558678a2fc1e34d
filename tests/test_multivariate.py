"""Multivariate PCA emulation: decomposition round-trip, vmapped fits,
observable-space reconstruction (BASELINE config 3; SURVEY.md §2 L4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madaiemulator_tpu.models.multivariate import (
    IterativeMultivariateEmulator,
    fit_multivariate,
    fit_multivariate_iterative,
    pca_decompose,
    predict_multivariate,
    predict_multivariate_iterative,
)
from madaiemulator_tpu.utils.config import GPConfig


def make_heavy_ion_like(rng, n=40, d=3, t=8):
    """Synthetic multivariate observables with low-rank structure."""
    X = rng.uniform(size=(n, d))
    latent = np.stack(
        [
            np.sin(2 * X[:, 0]) + X[:, 1],
            np.cos(3 * X[:, 1]) * X[:, 2],
        ],
        axis=1,
    )  # (n, 2) true rank-2
    W = rng.standard_normal((2, t))
    Y = latent @ W + 0.01 * rng.standard_normal((n, t))
    offsets = rng.uniform(5, 10, size=t)
    scales = rng.uniform(0.5, 3.0, size=t)
    return X, Y * scales + offsets


def test_pca_round_trip(rng):
    X, Y = make_heavy_ion_like(rng)
    state, Z = pca_decompose(jnp.asarray(Y), pca_variance=1.0 - 1e-12)
    t = Y.shape[1]
    r = Z.shape[1]
    assert r <= t
    # reconstruct: y = ymean + ystd * (U @ (sqrt(lam) * z))
    rec = np.asarray(state.ymean) + np.asarray(state.ystd) * (
        (np.asarray(Z) * np.sqrt(np.asarray(state.eigenvalues)))
        @ np.asarray(state.U).T
    )
    assert np.allclose(rec, Y, atol=1e-8)


def test_pca_variance_fraction_truncates(rng):
    X, Y = make_heavy_ion_like(rng)
    state, Z = pca_decompose(jnp.asarray(Y), pca_variance=0.95)
    # true structure is rank 2 (+ tiny noise): 95% must be covered by <= 3 PCs
    assert Z.shape[1] <= 3
    lam = np.asarray(state.eigenvalues)
    assert np.all(np.diff(lam) <= 1e-12)  # descending


def test_pca_sign_convention(rng):
    _, Y = make_heavy_ion_like(rng)
    state, _ = pca_decompose(jnp.asarray(Y), pca_variance=0.99)
    U = np.asarray(state.U)
    for i in range(U.shape[1]):
        j = np.argmax(np.abs(U[:, i]))
        assert U[j, i] > 0


def test_fit_and_predict_multivariate(rng):
    X, Y = make_heavy_ion_like(rng)
    cfg = GPConfig(nparams=3, regression_order=1, n_restarts=3, max_opt_steps=40)
    emu = fit_multivariate(
        jax.random.key(0), jnp.asarray(X), jnp.asarray(Y), cfg, pca_variance=0.99
    )
    mean, var = predict_multivariate(emu, jnp.asarray(X))
    assert mean.shape == Y.shape and var.shape == Y.shape
    assert np.all(np.asarray(var) >= 0)
    # at training points the emulator must reproduce observables well
    rel = np.abs(np.asarray(mean) - Y) / (np.abs(Y).mean(axis=0, keepdims=True))
    assert float(np.median(rel)) < 0.02, float(np.median(rel))


def test_multivariate_iterative_matches_dense_serving(rng):
    """The matrix-free multivariate serving path reproduces the dense path
    when given the SAME hyperparameters (exact-probe solves)."""
    X, Y = make_heavy_ion_like(rng, n=36)
    cfg = GPConfig(nparams=3, regression_order=1, n_restarts=2, max_opt_steps=30)
    emu = fit_multivariate(
        jax.random.key(0), jnp.asarray(X), jnp.asarray(Y), cfg, pca_variance=0.99
    )
    it_emu = IterativeMultivariateEmulator(
        scaling=emu.scaling, X=emu.X, Z=emu.Z, pca=emu.pca,
        params=emu.params, config=emu.config,
    )
    m_d, v_d = predict_multivariate(emu, jnp.asarray(X))
    m_i, v_i = predict_multivariate_iterative(
        it_emu, jnp.asarray(X), rank=36, cg_tol=1e-12, cg_max_iters=400,
    )
    np.testing.assert_allclose(np.asarray(m_i), np.asarray(m_d), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(v_i), np.asarray(v_d), rtol=1e-4, atol=1e-9)


def test_multivariate_iterative_cached_states_match(rng):
    """precompute_iterative_multivariate + states= serving reproduces the
    per-call path exactly and never rebuilds the preconditioner per batch
    (VERDICT r2 weak #1)."""
    from madaiemulator_tpu.models import iterative
    from madaiemulator_tpu.models.multivariate import (
        precompute_iterative_multivariate,
    )

    X, Y = make_heavy_ion_like(rng, n=32)
    cfg = GPConfig(nparams=3, regression_order=1, n_restarts=2, max_opt_steps=20)
    emu = fit_multivariate_iterative(
        jax.random.key(0), jnp.asarray(X), jnp.asarray(Y), cfg,
        pca_variance=0.99, rank=32, probes=32, lanczos_iters=32,
        cg_tol=1e-10, cg_max_iters=300,
    )
    m_ref, v_ref = predict_multivariate_iterative(
        emu, jnp.asarray(X), rank=32, cg_tol=1e-10, cg_max_iters=300,
    )
    states = precompute_iterative_multivariate(
        emu, rank=32, cg_tol=1e-10, cg_max_iters=300
    )
    calls = {"pc": 0}
    orig_pc = iterative.pivoted_cholesky

    def counting_pc(*a, **k):
        calls["pc"] += 1
        return orig_pc(*a, **k)

    iterative.pivoted_cholesky = counting_pc
    try:
        m_s, v_s = predict_multivariate_iterative(
            emu, jnp.asarray(X), states=states
        )
    finally:
        iterative.pivoted_cholesky = orig_pc
    assert calls["pc"] == 0
    np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_ref), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_ref), rtol=1e-10)


def test_project_noise_formula_and_isotropic_exactness(rng):
    from madaiemulator_tpu.models.multivariate import project_noise

    X, Y = make_heavy_ion_like(rng)
    pca, Z = pca_decompose(jnp.asarray(Y), pca_variance=0.999)
    n, t = Y.shape
    r = Z.shape[1]
    # general (N, t) case vs brute force: Var(z_k,i) = sum_t U^2 s_z^2 / lam
    noise = 10.0 ** rng.uniform(-4, -1, size=(n, t))
    got = np.asarray(project_noise(jnp.asarray(noise), pca))
    U = np.asarray(pca.U)
    lam = np.asarray(pca.eigenvalues)
    ystd = np.asarray(pca.ystd)
    want = (noise / ystd[None, :] ** 2) @ (U**2) / lam[None, :]
    np.testing.assert_allclose(got, want, rtol=1e-12)
    assert got.shape == (n, r)
    # isotropic-in-z-space noise projects EXACTLY (columns orthonormal):
    # sigma_ti^2 = c_i * ystd_t^2  =>  Var(z_k,i) = c_i / lam_k, and the
    # dropped cross-PC covariances are exactly zero
    c = 10.0 ** rng.uniform(-3, -1, size=n)
    iso = c[:, None] * ystd[None, :] ** 2
    got_iso = np.asarray(project_noise(jnp.asarray(iso), pca))
    np.testing.assert_allclose(got_iso, c[:, None] / lam[None, :], rtol=1e-12)
    cross = np.einsum("tk,tl,it->ikl", U, U, iso / ystd[None, :] ** 2)
    off = cross - np.einsum("ikk->ik", cross)[:, :, None] * np.eye(r)
    assert np.abs(off - np.triu(np.tril(off))).max() < 1e-10  # off-diag ~ 0
    # (N,) convenience: same variance per output in original units
    one = np.asarray(project_noise(jnp.asarray(c), pca))
    want_one = (c[:, None] / (ystd**2)[None, :]) @ (U**2) / lam[None, :]
    np.testing.assert_allclose(one, want_one, rtol=1e-12)


def test_fit_multivariate_with_noise(rng, tmp_path):
    """End-to-end heteroscedastic multivariate: a known-noisy corrupted
    point is downweighted in OBSERVABLE space, and the noise block
    round-trips through both snapshot formats (version 2)."""
    from madaiemulator_tpu.io.snapshot import (
        read_snapshot, read_snapshot_npz, write_snapshot, write_snapshot_npz,
    )

    X, Y = make_heavy_ion_like(rng, n=30)
    j = 11
    Yc = Y.copy()
    Yc[j] += 30.0 * np.sign(rng.standard_normal(Y.shape[1]))  # corrupted run
    noise = np.full(30, 1e-9)
    noise[j] = 1e6  # honestly-huge known variance for the corrupted run
    cfg = GPConfig(nparams=3, regression_order=1, n_restarts=2,
                   max_opt_steps=25)
    emu = fit_multivariate(
        jax.random.key(0), jnp.asarray(X), jnp.asarray(Yc), cfg,
        pca_variance=0.999, noise=jnp.asarray(noise),
    )
    assert emu.noise is not None and emu.noise.shape == (30, emu.n_components)
    mean, var = predict_multivariate(emu, jnp.asarray(X))
    # the corrupted observation must not drag the posterior: prediction at
    # x_j lands near the CLEAN observables, far from the corrupted ones
    err_clean = np.abs(np.asarray(mean)[j] - Y[j])
    err_corr = np.abs(np.asarray(mean)[j] - Yc[j])
    assert np.median(err_clean) < 0.2 * np.median(err_corr)
    # snapshot round-trip (text + npz), version 2, exact noise payload
    for path, wr, rd in [
        (str(tmp_path / "s.txt"), write_snapshot, read_snapshot),
        (str(tmp_path / "s.npz"), write_snapshot_npz, read_snapshot_npz),
    ]:
        wr(path, emu)
        emu2, _, _ = rd(path)
        assert emu2.noise is not None
        np.testing.assert_allclose(
            np.asarray(emu2.noise), np.asarray(emu.noise), rtol=1e-15
        )
        m2, v2 = predict_multivariate(emu2, jnp.asarray(X))
        np.testing.assert_allclose(np.asarray(m2), np.asarray(mean),
                                   rtol=1e-10, atol=1e-12)
    with open(str(tmp_path / "s.txt")) as f:
        assert f.readline().strip().endswith(" 2")  # version-2 header
    # matrix-free twin: same noise contract through the iterative engine
    emu_it = fit_multivariate_iterative(
        jax.random.key(0), jnp.asarray(X), jnp.asarray(Yc), cfg,
        pca_variance=0.999, noise=jnp.asarray(noise),
        n_restarts=1, max_steps=8, rank=30, probes=30, cg_tol=1e-10,
    )
    assert emu_it.noise is not None
    m_it, _ = predict_multivariate_iterative(emu_it, jnp.asarray(X))
    err_clean_it = np.abs(np.asarray(m_it)[j] - Y[j])
    err_corr_it = np.abs(np.asarray(m_it)[j] - Yc[j])
    assert np.median(err_clean_it) < 0.2 * np.median(err_corr_it)


def test_fit_multivariate_alpha_grid(rng):
    """One shared power exponent profiled over a grid: the winner carries
    the best TOTAL logL and its config records the winning alpha."""
    import dataclasses

    from madaiemulator_tpu.ops.kernels import GPParams, gram_matrix
    from madaiemulator_tpu.utils.config import CovarianceFamily

    n, d = 50, 2
    X = rng.uniform(size=(n, d))
    cfg14 = GPConfig(
        nparams=d, regression_order=0, power_exp_alpha=1.4,
        n_restarts=2, max_opt_steps=25,
    )
    p_true = GPParams(
        log_amp=jnp.asarray(0.0), log_nugget=jnp.asarray(np.log(1e-4)),
        log_ls=jnp.asarray(np.log([0.2, 0.25])),
    )
    C = np.asarray(gram_matrix(jnp.asarray(X), p_true, cfg14))
    L = np.linalg.cholesky(C)
    Y = np.stack([L @ rng.standard_normal(n) for _ in range(2)], axis=1)
    emu = fit_multivariate(
        jax.random.key(0), jnp.asarray(X), jnp.asarray(Y), cfg14,
        pca_variance=0.999, alpha_grid=(1.4, 2.0),
    )
    assert emu.config.power_exp_alpha == 1.4
    # continuous refinement probes off-grid alphas and returns an emulator
    # whose exponent is inside the winning bracket (here [1.4, 2.0) since
    # 1.4 won the grid and is the left endpoint of the searched grid)
    emu_r = fit_multivariate(
        jax.random.key(0), jnp.asarray(X), jnp.asarray(Y), cfg14,
        pca_variance=0.999, alpha_grid=(1.4, 2.0), alpha_refine=2,
    )
    assert 1.0 <= emu_r.config.power_exp_alpha <= 2.0
    lls = np.asarray(emu_r.restart_log_likelihoods)
    lls0 = np.asarray(emu.restart_log_likelihoods)
    tot = lambda a: float(np.where(np.isfinite(a), a, -np.inf).max(1).sum())
    assert tot(lls) >= tot(lls0) - 1e-9
    with pytest.raises(ValueError, match="power-exponential"):
        fit_multivariate(
            jax.random.key(0), jnp.asarray(X), jnp.asarray(Y),
            dataclasses.replace(cfg14, covariance=CovarianceFamily.MATERN32),
            alpha_grid=(1.4, 2.0),
        )


def test_predict_multivariate_fast_matches_dense(rng):
    """GEMM-only multivariate serving vs the TRSM path."""
    from madaiemulator_tpu.models.multivariate import (
        precompute_fast_multivariate,
        predict_multivariate_fast,
    )

    X, Y = make_heavy_ion_like(rng, n=36)
    cfg = GPConfig(nparams=3, regression_order=1, n_restarts=2, max_opt_steps=25)
    emu = fit_multivariate(
        jax.random.key(0), jnp.asarray(X), jnp.asarray(Y), cfg, pca_variance=0.99
    )
    fast = precompute_fast_multivariate(emu)
    m_d, v_d = predict_multivariate(emu, jnp.asarray(X))
    m_f, v_f = predict_multivariate_fast(emu, fast, jnp.asarray(X))
    np.testing.assert_allclose(np.asarray(m_f), np.asarray(m_d), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(v_f), np.asarray(v_d), rtol=1e-6, atol=1e-10
    )


def test_fit_multivariate_iterative_end_to_end(rng):
    X, Y = make_heavy_ion_like(rng, n=32)
    cfg = GPConfig(nparams=3, regression_order=1, n_restarts=2, max_opt_steps=20)
    emu = fit_multivariate_iterative(
        jax.random.key(0), jnp.asarray(X), jnp.asarray(Y), cfg,
        pca_variance=0.99, rank=32, probes=32, lanczos_iters=32,
        cg_tol=1e-10, cg_max_iters=300,
    )
    mean, var = predict_multivariate_iterative(
        emu, jnp.asarray(X), rank=32, cg_tol=1e-10, cg_max_iters=300,
    )
    assert mean.shape == Y.shape and np.all(np.asarray(var) >= 0)
    rel = np.abs(np.asarray(mean) - Y) / (np.abs(Y).mean(axis=0, keepdims=True))
    assert float(np.median(rel)) < 0.03, float(np.median(rel))


def test_predict_multivariate_off_design(rng):
    X, Y = make_heavy_ion_like(rng, n=50)
    cfg = GPConfig(nparams=3, regression_order=1, n_restarts=3, max_opt_steps=40)
    emu = fit_multivariate(
        jax.random.key(1), jnp.asarray(X), jnp.asarray(Y), cfg, pca_variance=0.999
    )
    Xs = rng.uniform(0.1, 0.9, size=(20, 3))
    mean, var = predict_multivariate(emu, jnp.asarray(Xs))
    assert mean.shape == (20, Y.shape[1])
    assert np.all(np.isfinite(np.asarray(mean)))
    assert np.all(np.asarray(var) >= 0)
