"""Multi-fidelity AR(1) co-kriging (models/multifidelity.py) and the
GPData.h_extra GLS plumbing it rides on. Beyond-reference subsystem
(COMPONENTS.md); the classic Forrester benchmark is the acceptance case."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madaiemulator_tpu.models import gp
from madaiemulator_tpu.models.gp import GPData
from madaiemulator_tpu.models.multifidelity import (
    fit_multifidelity,
    predict_multifidelity,
)
from madaiemulator_tpu.ops import kernels
from madaiemulator_tpu.ops.kernels import GPParams
from madaiemulator_tpu.utils.config import GPConfig


def numpy_lml_augmented(X, y, p, cfg, h_extra):
    """Dense-numpy GLS LML with extra regression columns appended."""
    C = np.asarray(kernels.gram_matrix(jnp.asarray(X), p, cfg))
    H = np.asarray(gp.regression_basis(jnp.asarray(X), cfg.regression_order))
    H = np.concatenate([H, h_extra], axis=1)
    Ci = np.linalg.inv(C)
    A = H.T @ Ci @ H
    beta = np.linalg.solve(A, H.T @ Ci @ y)
    r = y - H @ beta
    _, logdet = np.linalg.slogdet(C)
    ll = -0.5 * r @ Ci @ r - 0.5 * logdet - 0.5 * len(y) * np.log(2 * np.pi)
    if cfg.reml:
        ll -= 0.5 * np.linalg.slogdet(A)[1]
    return ll, beta


def setup_problem(rng, n=22, d=2):
    cfg = GPConfig(nparams=d, regression_order=1)
    X = rng.uniform(size=(n, d))
    y = np.sin(3 * X[:, 0]) + 0.5 * X[:, 1] + 0.05 * rng.standard_normal(n)
    p = GPParams(
        log_amp=jnp.asarray(np.log(1.3)),
        log_nugget=jnp.asarray(np.log(1e-3)),
        log_ls=jnp.asarray(np.log(np.array([0.6, 0.9]))),
    )
    return cfg, X, y, p


@pytest.mark.parametrize("reml", [False, True])
def test_lml_with_h_extra_matches_numpy(rng, reml):
    cfg, X, y, p = setup_problem(rng)
    cfg = GPConfig(nparams=2, regression_order=1, reml=reml)
    h = rng.standard_normal((len(y), 2))
    data = GPData(X=jnp.asarray(X), y=jnp.asarray(y), h_extra=jnp.asarray(h))
    got = float(gp.log_marginal_likelihood(p, data, cfg))
    want, beta = numpy_lml_augmented(X, y, p, cfg, h)
    assert np.isclose(got, want, rtol=1e-9), (got, want)
    # the GLS solution includes the extra-column coefficients
    st = gp.precompute_predictor(p, data, cfg)
    np.testing.assert_allclose(np.asarray(st.beta), beta, rtol=1e-7)


@pytest.mark.parametrize("reml", [False, True])
def test_h_extra_closed_form_vjp_matches_autodiff(rng, reml):
    """The GLS envelope holds for ANY fixed basis — incl. extra columns —
    so the closed-form VJP must equal autodiff exactly."""
    cfg, X, y, p = setup_problem(rng)
    cfg = GPConfig(nparams=2, regression_order=1, reml=reml)
    h = rng.standard_normal((len(y), 1))
    data = GPData(X=jnp.asarray(X), y=jnp.asarray(y), h_extra=jnp.asarray(h))
    g_cf = jax.grad(lambda pp: gp.log_marginal_likelihood(pp, data, cfg))(p)
    g_ad = jax.grad(lambda pp: gp.log_marginal_likelihood_ad(pp, data, cfg))(p)
    for a, b in zip(jax.tree.leaves(g_cf), jax.tree.leaves(g_ad)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-10)


def test_predict_requires_matching_hs_extra(rng):
    cfg, X, y, p = setup_problem(rng)
    h = rng.standard_normal((len(y), 1))
    data = GPData(X=jnp.asarray(X), y=jnp.asarray(y), h_extra=jnp.asarray(h))
    st = gp.precompute_predictor(p, data, cfg)
    Xq = jnp.asarray(rng.uniform(size=(5, 2)))
    with pytest.raises(ValueError, match="hs_extra"):
        gp.predict_from_precomputed(st, p, data, Xq, cfg)
    plain = GPData(X=data.X, y=data.y)
    st2 = gp.precompute_predictor(p, plain, cfg)
    with pytest.raises(ValueError, match="hs_extra"):
        gp.predict_from_precomputed(
            st2, p, plain, Xq, cfg, hs_extra=jnp.ones((5, 1))
        )


def test_predict_h_extra_chunked_matches_unchunked(rng):
    import dataclasses

    cfg, X, y, p = setup_problem(rng, n=30)
    h = rng.standard_normal((30, 1))
    data = GPData(X=jnp.asarray(X), y=jnp.asarray(y), h_extra=jnp.asarray(h))
    st = gp.precompute_predictor(p, data, cfg)
    Xq = jnp.asarray(rng.uniform(size=(23, 2)))
    hq = jnp.asarray(rng.standard_normal((23, 1)))
    m1, v1 = gp.predict_from_precomputed(st, p, data, Xq, cfg, hs_extra=hq)
    cfg2 = dataclasses.replace(cfg, predict_query_chunk=7)
    m2, v2 = gp.predict_from_precomputed(st, p, data, Xq, cfg2, hs_extra=hq)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), rtol=1e-10)


def forrester(x):
    """Forrester et al. (2007) high-fidelity 1D benchmark."""
    return (6 * x - 2) ** 2 * np.sin(12 * x - 4)


def forrester_low(x):
    """Its standard low-fidelity companion: 0.5 y_H + 10(x - 0.5) - 5."""
    return 0.5 * forrester(x) + 10 * (x - 0.5) - 5


def test_multifidelity_beats_single_fidelity_on_forrester(rng):
    """The acceptance benchmark of every co-kriging implementation: 4
    high-fidelity points + 21 cheap points must reconstruct the Forrester
    curve far better than the 4 points alone."""
    x_lo = np.linspace(0, 1, 21)
    x_hi = np.array([0.0, 0.4, 0.6, 1.0])
    cfg = GPConfig(nparams=1, regression_order=1, n_restarts=4,
                   max_opt_steps=40)
    emu = fit_multifidelity(
        jax.random.key(0),
        [x_lo[:, None], x_hi[:, None]],
        [forrester_low(x_lo), forrester(x_hi)],
        cfg,
        lower_values=[forrester_low(x_hi)],  # nested: exact recursion
    )
    xq = np.linspace(0, 1, 101)
    m_mf, v_mf = predict_multifidelity(emu, xq[:, None])
    truth = forrester(xq)
    rmse_mf = float(np.sqrt(np.mean((np.asarray(m_mf) - truth) ** 2)))
    # single-fidelity GP on the same 4 high-fi points
    from madaiemulator_tpu.models.fit import fit_gp
    from madaiemulator_tpu.utils.designs import apply_scaling

    Xh = apply_scaling(jnp.asarray(x_hi[:, None]), emu.scaling)
    dh = GPData(X=Xh, y=jnp.asarray(forrester(x_hi)))
    res = fit_gp(jax.random.key(0), dh, cfg)
    Xq = apply_scaling(jnp.asarray(xq[:, None]), emu.scaling)
    m_sf, _ = gp.gp_posterior(res.params, dh, Xq, cfg)
    rmse_sf = float(np.sqrt(np.mean((np.asarray(m_sf) - truth) ** 2)))
    assert rmse_mf < 0.3 * rmse_sf, (rmse_mf, rmse_sf)
    assert rmse_mf < 0.5  # curve range is ~[-6, 16]
    assert np.all(np.asarray(v_mf) >= 0)
    # rho recovery: the generative link is y_H = 2 (y_L + 5 - 10(x-.5))
    # i.e. rho_true = 2 given the linear trend absorbs the rest
    assert abs(float(emu.rho[0]) - 2.0) < 0.2, float(emu.rho[0])
    # interpolation at the high-fidelity design
    m_at_hi, _ = predict_multifidelity(emu, x_hi[:, None])
    np.testing.assert_allclose(np.asarray(m_at_hi), forrester(x_hi),
                               atol=5e-2)


def test_multifidelity_nonnested_uses_recursive_mean(rng):
    """Without lower_values the lower emulator's mean fills the basis
    column — on a dense low-fi design the result is near the nested one."""
    x_lo = np.linspace(0, 1, 25)
    x_hi = np.array([0.1, 0.35, 0.65, 0.9])  # NOT a subset of x_lo
    cfg = GPConfig(nparams=1, regression_order=1, n_restarts=3,
                   max_opt_steps=40)
    emu = fit_multifidelity(
        jax.random.key(1),
        [x_lo[:, None], x_hi[:, None]],
        [forrester_low(x_lo), forrester(x_hi)],
        cfg,
    )
    xq = np.linspace(0.05, 0.95, 61)
    m_mf, _ = predict_multifidelity(emu, xq[:, None])
    rmse = float(np.sqrt(np.mean((np.asarray(m_mf) - forrester(xq)) ** 2)))
    assert rmse < 1.0, rmse


def test_multifidelity_three_levels_and_level_arg(rng):
    """Three-level chain; predict_multifidelity(level=k) returns each
    stage, and level 0 equals a plain single-fidelity fit of level 0."""
    x0 = np.linspace(0, 1, 21)
    x1 = np.linspace(0, 1, 11)
    x2 = np.array([0.0, 0.3, 0.7, 1.0])
    f0, f1, f2 = (
        lambda x: np.sin(2 * np.pi * x),
        lambda x: 1.5 * np.sin(2 * np.pi * x) + 0.3 * x,
        lambda x: 3.0 * np.sin(2 * np.pi * x) + 0.6 * x - 0.2,
    )
    cfg = GPConfig(nparams=1, regression_order=1, n_restarts=2,
                   max_opt_steps=30)
    emu = fit_multifidelity(
        jax.random.key(2),
        [x0[:, None], x1[:, None], x2[:, None]],
        [f0(x0), f1(x1), f2(x2)],
        cfg,
        lower_values=[f0(x1), f1(x2)],
    )
    assert emu.n_levels == 3 and emu.rho.shape == (2,)
    xq = np.linspace(0, 1, 41)
    m2, v2 = predict_multifidelity(emu, xq[:, None])
    rmse2 = float(np.sqrt(np.mean((np.asarray(m2) - f2(xq)) ** 2)))
    assert rmse2 < 0.15, rmse2
    m0, _ = predict_multifidelity(emu, xq[:, None], level=0)
    rmse0 = float(np.sqrt(np.mean((np.asarray(m0) - f0(xq)) ** 2)))
    assert rmse0 < 0.05, rmse0
    with pytest.raises(ValueError, match="out of range"):
        predict_multifidelity(emu, xq[:, None], level=3)


def test_multifidelity_with_noise(rng):
    """Per-point noise composes with the multifidelity basis column."""
    x_lo = np.linspace(0, 1, 21)
    x_hi = np.linspace(0, 1, 9)
    y_hi = forrester(x_hi)
    noise_hi = np.full(9, 1e-8)
    j = 4
    y_hi_c = y_hi.copy()
    y_hi_c[j] += 20.0
    noise_hi[j] = 1e5
    cfg = GPConfig(nparams=1, regression_order=1, n_restarts=3,
                   max_opt_steps=40)
    emu = fit_multifidelity(
        jax.random.key(3),
        [x_lo[:, None], x_hi[:, None]],
        [forrester_low(x_lo), y_hi_c],
        cfg,
        lower_values=[forrester_low(x_hi)],
        noise=[None, noise_hi],
    )
    m, _ = predict_multifidelity(emu, x_hi[:, None])
    assert abs(float(m[j]) - y_hi[j]) < 0.25 * abs(y_hi_c[j] - y_hi[j])


def test_loo_cv_multifidelity_matches_bruteforce(rng):
    """Per-level closed-form LOO == refitting each level's GLS mean (incl.
    the rho basis column) on the size-(N-1) subset and predicting the
    held-out point, with the lower-level basis column held fixed."""
    from madaiemulator_tpu.models.diagnostics import loo_cv_multifidelity
    from madaiemulator_tpu.models.gp import (
        _factor,
        predict_from_precomputed,
    )

    x_lo = np.linspace(0, 1, 15)
    x_hi = np.linspace(0.05, 0.95, 7)
    cfg = GPConfig(nparams=1, regression_order=1, n_restarts=2,
                   max_opt_steps=25)
    emu = fit_multifidelity(
        jax.random.key(5),
        [x_lo[:, None], x_hi[:, None]],
        [forrester_low(x_lo), forrester(x_hi)],
        cfg,
        lower_values=[forrester_low(x_hi)],
    )
    results = loo_cv_multifidelity(emu)
    assert len(results) == 2
    lv = emu.levels[1]
    n = int(lv.data.y.shape[0])
    for i in range(n):
        keep = np.arange(n) != i
        sub = GPData(
            X=lv.data.X[keep],
            y=lv.data.y[keep],
            h_extra=lv.data.h_extra[keep],
        )
        st = _factor(sub, lv.params, cfg)
        m_i, v_i = predict_from_precomputed(
            st, lv.params, sub, lv.data.X[i][None, :], cfg,
            hs_extra=lv.data.h_extra[i][None, :],
        )
        np.testing.assert_allclose(
            float(results[1].mean[i]), float(m_i[0]), rtol=1e-7, atol=1e-9
        )
        np.testing.assert_allclose(
            float(results[1].variance[i]), float(v_i[0]), rtol=1e-7,
            atol=1e-9,
        )
    # level 0 is an ordinary GP: its row must equal plain loo_cv
    from madaiemulator_tpu.models.diagnostics import loo_cv

    r0 = loo_cv(emu.levels[0].params, emu.levels[0].data, cfg)
    np.testing.assert_allclose(np.asarray(results[0].mean),
                               np.asarray(r0.mean), rtol=1e-12)

    # and the summary helper returns one calibrated block per level
    from madaiemulator_tpu.models.diagnostics import loo_summary_multifidelity

    sums = loo_summary_multifidelity(emu)
    assert len(sums) == 2
    for s in sums:
        assert set(s) >= {"rmse", "coverage", "standardized_std"}
        assert np.isfinite(s["rmse"])


def _monotone_mf_emulator(key=7):
    """1D strictly-monotone MF pair (identifiable posterior):
    hi = 2x + sin(2x), hi' = 2 + 2cos(2x) > 0 on [0, 1]."""
    def hi(x):
        return 2.0 * x + np.sin(2.0 * x)

    def lo(x):
        return 0.5 * hi(x) + 0.3 * x - 0.1

    x_lo = np.linspace(0, 1, 19)
    x_hi = np.linspace(0, 1, 7)
    cfg = GPConfig(nparams=1, regression_order=1, n_restarts=2,
                   max_opt_steps=30)
    emu = fit_multifidelity(
        jax.random.key(key),
        [x_lo[:, None], x_hi[:, None]],
        [lo(x_lo), hi(x_hi)],
        cfg,
        lower_values=[lo(x_hi)],
    )
    return emu, hi


def test_multifidelity_calibrates_in_graph(rng):
    """calibrate() runs MCMC against the recursive co-kriging predict
    in-graph and concentrates the posterior at the true parameter."""
    from madaiemulator_tpu.models.calibrate import calibrate, implausibility

    emu, hi = _monotone_mf_emulator()
    theta_true = 0.55
    y_exp = np.array([hi(np.array([theta_true]))[0]])
    exp_var = np.array([1e-4])
    res = calibrate(
        jax.random.key(1), emu, y_exp, exp_var,
        n_walkers=16, n_steps=300, burn_in=150,
    )
    post_mean = float(res.samples.mean())
    assert abs(post_mean - theta_true) < 0.05, post_mean
    assert res.samples.std() < 0.1
    # implausibility: small at truth, large far away (scaled coords ==
    # natural here: the union design spans [0, 1])
    imp = implausibility(
        emu, y_exp, exp_var,
        jnp.asarray([[theta_true], [0.05]]),
    )
    assert float(imp[0]) < 3.0 < float(imp[1]), np.asarray(imp)
    # multi-observable y_exp against a scalar MF emulator is rejected
    # loudly (silent broadcasting would produce a wrong posterior)
    from madaiemulator_tpu.models.calibrate import make_log_posterior

    with pytest.raises(ValueError, match="1 output"):
        make_log_posterior(emu, np.array([1.0, 2.0]), np.array([1e-4, 1e-4]))
    with pytest.raises(ValueError, match="1 output"):
        implausibility(emu, np.array([1.0, 2.0]), np.array([1e-4, 1e-4]),
                       jnp.asarray([[theta_true]]))


def test_multifidelity_sequential_design(rng):
    """Both acquisitions run over an MF emulator: active-variance picks
    in-bounds points; an NROY wave concentrates near the truth."""
    from madaiemulator_tpu.models.design import (
        active_variance_design,
        nroy_wave_design,
    )

    emu, hi = _monotone_mf_emulator()
    prop = active_variance_design(jax.random.key(2), emu, n_new=4,
                                  pool_size=256)
    assert prop.points.shape == (4, 1)
    assert np.all((prop.points >= 0.0) & (prop.points <= 1.0))

    theta_true = 0.55
    y_exp = np.array([hi(np.array([theta_true]))[0]])
    wave = nroy_wave_design(
        jax.random.key(3), emu, y_exp, np.array([1e-4]), n_new=4,
        pool_size=512,
    )
    assert wave.points.shape == (4, 1)
    assert 0.0 < wave.pool_fraction_viable < 0.5
    # every proposed point is itself not ruled out
    from madaiemulator_tpu.models.calibrate import implausibility

    imp = implausibility(emu, y_exp, np.array([1e-4]),
                         jnp.asarray(wave.points))
    assert np.all(np.asarray(imp) <= 3.0), np.asarray(imp)


# --- Multivariate (t > 1) multi-fidelity -------------------------------------


def _mv_obs(f, x):
    """Three observables driven by one latent curve + independent pieces —
    a multivariate Forrester-style family whose AR(1) link holds exactly
    per observable."""
    b = f(x)
    return np.stack([b, 0.5 * b + 3 * x, -b + x ** 2], axis=1)


def _mv_mf_emulator(key=0, noise=None):
    from madaiemulator_tpu.models.multifidelity import (
        fit_multivariate_multifidelity,
    )

    x_lo = np.linspace(0, 1, 40)
    x_hi = np.array([0.0, 0.15, 0.3, 0.45, 0.6, 0.75, 0.9, 1.0])
    cfg = GPConfig(nparams=1, regression_order=1)
    emu = fit_multivariate_multifidelity(
        jax.random.key(key),
        [x_lo[:, None], x_hi[:, None]],
        [_mv_obs(forrester_low, x_lo), _mv_obs(forrester, x_hi)],
        cfg, pca_variance=0.999, n_restarts=4, max_steps=60, noise=noise,
    )
    return emu, x_lo, x_hi


def test_mv_multifidelity_beats_single_fidelity(rng):
    """The flagship-configuration acceptance test: a t=3 observable block
    emulated across two fidelities through ONE shared PCA basis must beat
    the single-fidelity multivariate emulator fit on the scarce
    high-fidelity runs alone."""
    from madaiemulator_tpu.models.multifidelity import (
        predict_multivariate_multifidelity,
    )
    from madaiemulator_tpu.models.multivariate import (
        fit_multivariate,
        predict_multivariate,
    )

    emu, x_lo, x_hi = _mv_mf_emulator()
    assert emu.n_outputs == 3
    xq = np.linspace(0.02, 0.98, 200)
    truth = _mv_obs(forrester, xq)
    m, v = predict_multivariate_multifidelity(emu, xq[:, None])
    assert m.shape == (200, 3) and v.shape == (200, 3)
    rmse_mf = float(np.sqrt(np.mean((np.asarray(m) - truth) ** 2)))
    cfg = GPConfig(nparams=1, regression_order=1)
    emu_sf = fit_multivariate(
        jax.random.key(0), x_hi[:, None], _mv_obs(forrester, x_hi), cfg,
        pca_variance=0.999,
    )
    m_sf, _ = predict_multivariate(emu_sf, xq[:, None])
    rmse_sf = float(np.sqrt(np.mean((np.asarray(m_sf) - truth) ** 2)))
    assert rmse_mf < 0.3 * rmse_sf, (rmse_mf, rmse_sf)
    assert rmse_mf < 0.2, rmse_mf  # observable range is ~[-16, 16]
    assert np.all(np.asarray(v) >= 0)
    # the generative AR(1) scale (hi = 2*lo + linear trend) is recovered
    # in EVERY component's score space (the shared basis preserves it)
    assert np.allclose(np.asarray(emu.rho[0]), 2.0, atol=0.2), emu.rho
    # level=0 predicts the LOW fidelity observables
    m0, _ = predict_multivariate_multifidelity(emu, xq[:, None], level=0)
    rmse0 = float(np.sqrt(np.mean(
        (np.asarray(m0) - _mv_obs(forrester_low, xq)) ** 2)))
    assert rmse0 < 0.2, rmse0
    with pytest.raises(ValueError, match="out of range"):
        predict_multivariate_multifidelity(emu, xq[:, None], level=2)


def test_mv_multifidelity_snapshot_round_trip(rng, tmp_path):
    from madaiemulator_tpu.io.snapshot import (
        read_snapshot_auto,
        write_snapshot_auto,
    )
    from madaiemulator_tpu.models.multifidelity import (
        MultivariateMultiFidelityEmulator,
        predict_multivariate_multifidelity,
    )

    # noise on the cheap level exercises the has_noise block
    emu, x_lo, _ = _mv_mf_emulator(noise=[np.full(40, 1e-8), None])
    xq = np.linspace(0.02, 0.98, 50)
    m0, v0 = predict_multivariate_multifidelity(emu, xq[:, None])
    for ext in ("txt", "npz"):
        path = str(tmp_path / f"state.{ext}")
        write_snapshot_auto(path, emu, ["x"], ["a", "b", "c"])
        emu2, pn, on = read_snapshot_auto(path)
        assert isinstance(emu2, MultivariateMultiFidelityEmulator)
        assert pn == ["x"] and on == ["a", "b", "c"]
        assert emu2.levels[0].noise is not None
        m1, v1 = predict_multivariate_multifidelity(emu2, xq[:, None])
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                                   rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                                   rtol=1e-7, atol=1e-14)
        np.testing.assert_allclose(np.asarray(emu2.rho),
                                   np.asarray(emu.rho), rtol=1e-12)


def test_mv_multifidelity_model_file_round_trip(tmp_path):
    from madaiemulator_tpu.io.modelfile import (
        is_multifidelity_model_file,
        read_multifidelity_model_file,
        write_multifidelity_model_file,
    )

    x_lo = np.linspace(0, 1, 9)
    x_hi = np.linspace(0, 1, 4)
    Y_lo = _mv_obs(forrester_low, x_lo)
    Y_hi = _mv_obs(forrester, x_hi)
    low_at_hi = _mv_obs(forrester_low, x_hi)
    path = str(tmp_path / "model_mv.txt")
    write_multifidelity_model_file(
        path, [x_lo[:, None], x_hi[:, None]], [Y_lo, Y_hi],
        lower_values=[low_at_hi], param_names=["x"],
        output_names=["a", "b", "c"],
    )
    assert is_multifidelity_model_file(path)
    mf = read_multifidelity_model_file(path)
    assert mf.noutputs == 3 and mf.output_names == ["a", "b", "c"]
    assert mf.nlevels == 2 and mf.nparams == 1
    np.testing.assert_allclose(mf.targets[0], Y_lo, rtol=1e-15)
    np.testing.assert_allclose(mf.targets[1], Y_hi, rtol=1e-15)
    np.testing.assert_allclose(mf.lower_values[0], low_at_hi, rtol=1e-15)
    # scalar writers stay byte-compatible: no noutputs header for t=1
    p2 = str(tmp_path / "model_s.txt")
    write_multifidelity_model_file(
        p2, [x_lo[:, None]], [Y_lo[:, 0]], param_names=["x"],
        output_name="f",
    )
    assert "noutputs" not in open(p2).read()
    assert read_multifidelity_model_file(p2).noutputs == 1


def test_mv_multifidelity_calibrate_and_design(rng):
    """The full workflow layer runs over a multivariate MF emulator:
    in-graph MCMC recovers the true parameter, implausibility separates
    truth from far points, both acquisitions propose in-bounds points."""
    from madaiemulator_tpu.models.calibrate import (
        calibrate,
        implausibility,
        make_log_posterior,
    )
    from madaiemulator_tpu.models.design import (
        active_variance_design,
        nroy_wave_design,
    )

    emu, _, _ = _mv_mf_emulator()
    theta_true = 0.55
    y_exp = _mv_obs(forrester, np.array([theta_true]))[0]
    exp_var = np.full(3, 1e-4)
    res = calibrate(
        jax.random.key(1), emu, y_exp, exp_var,
        n_walkers=16, n_steps=300, burn_in=150,
    )
    post_mean = float(res.samples.mean())
    assert abs(post_mean - theta_true) < 0.05, post_mean
    # history matching with a realistic experimental scale (std 0.1 vs
    # the emulator's ~0.03 rmse on the steep Forrester observables):
    # truth survives the 3-sigma rule, a far point is ruled out
    hm_var = np.full(3, 1e-2)
    imp = implausibility(emu, y_exp, hm_var,
                         jnp.asarray([[theta_true], [0.05]]))
    assert float(imp[0]) < 3.0 < float(imp[1]), np.asarray(imp)
    # wrong observable count is rejected loudly
    with pytest.raises(ValueError, match="predicts 3"):
        make_log_posterior(emu, y_exp[:2], exp_var[:2])
    with pytest.raises(ValueError, match="predicts 3"):
        implausibility(emu, y_exp[:2], exp_var[:2],
                       jnp.asarray([[theta_true]]))
    prop = active_variance_design(jax.random.key(2), emu, n_new=4,
                                  pool_size=256)
    assert prop.points.shape == (4, 1)
    assert np.all((prop.points >= 0.0) & (prop.points <= 1.0))
    wave = nroy_wave_design(jax.random.key(3), emu, y_exp, hm_var,
                            n_new=4, pool_size=512)
    assert wave.points.shape == (4, 1)
    imp_w = implausibility(emu, y_exp, hm_var, jnp.asarray(wave.points))
    assert np.all(np.asarray(imp_w) <= 3.0), np.asarray(imp_w)


def test_mv_multifidelity_loo(rng):
    """Per-level per-component LOO: finite, calibrated against the
    shared-PCA representation of the stored targets."""
    from madaiemulator_tpu.models.diagnostics import (
        loo_cv_multifidelity_mv,
        reconstruct_level_targets_mv,
        validation_summary,
    )

    emu, _, _ = _mv_mf_emulator()
    results = loo_cv_multifidelity_mv(emu)
    assert len(results) == emu.n_levels
    for k, (res, loo_mean, loo_var) in enumerate(results):
        assert bool(np.asarray(res.ok).all())
        Y_true = reconstruct_level_targets_mv(emu, k)
        assert loo_mean.shape == Y_true.shape
        s = validation_summary(loo_mean, loo_var, Y_true)
        assert np.isfinite(s["rmse"]) and s["rmse"] < 2.0, (k, s)
