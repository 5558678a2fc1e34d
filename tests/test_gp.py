"""Scalar-GP core: likelihood vs direct numpy, exact autodiff gradients vs
finite differences, GLS regression vs lstsq, posterior properties (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madaiemulator_tpu.models import gp
from madaiemulator_tpu.models.gp import GPData
from madaiemulator_tpu.ops import kernels
from madaiemulator_tpu.ops.kernels import GPParams
from madaiemulator_tpu.utils.config import CovarianceFamily, GPConfig


def setup_problem(rng, n=20, d=2, order=1):
    cfg = GPConfig(nparams=d, regression_order=order)
    X = rng.uniform(size=(n, d))
    y = np.sin(3 * X[:, 0]) + 0.5 * X[:, 1] + 0.05 * rng.standard_normal(n)
    p = GPParams(
        log_amp=jnp.asarray(np.log(1.3)),
        log_nugget=jnp.asarray(np.log(1e-3)),
        log_ls=jnp.asarray(np.log(np.array([0.6, 0.9]))),
    )
    return cfg, GPData(X=jnp.asarray(X), y=jnp.asarray(y)), p


def numpy_lml(X, y, p, cfg, noise=None):
    """Direct dense-numpy GLS log-marginal likelihood."""
    C = np.asarray(kernels.gram_matrix(jnp.asarray(X), p, cfg))
    if noise is not None:
        C = C + np.diag(np.asarray(noise))
    H = np.asarray(gp.regression_basis(jnp.asarray(X), cfg.regression_order))
    Ci = np.linalg.inv(C)
    A = H.T @ Ci @ H
    beta = np.linalg.solve(A, H.T @ Ci @ y)
    r = y - H @ beta
    _, logdet = np.linalg.slogdet(C)
    ll = -0.5 * r @ Ci @ r - 0.5 * logdet - 0.5 * len(y) * np.log(2 * np.pi)
    if cfg.reml:
        ll -= 0.5 * np.linalg.slogdet(A)[1]
    return ll


@pytest.mark.parametrize("order", [0, 1, 2])
@pytest.mark.parametrize("reml", [False, True])
def test_lml_matches_numpy(rng, order, reml):
    cfg, data, p = setup_problem(rng, order=order)
    cfg = GPConfig(
        nparams=cfg.nparams, regression_order=order, reml=reml
    )
    got = float(gp.log_marginal_likelihood(p, data, cfg))
    want = numpy_lml(np.asarray(data.X), np.asarray(data.y), p, cfg)
    assert np.isclose(got, want, rtol=1e-9), (got, want)


def test_autodiff_gradient_matches_finite_differences(rng):
    cfg, data, p = setup_problem(rng)
    f = lambda pp: gp.log_marginal_likelihood(pp, data, cfg)
    g = jax.grad(f)(p)
    eps = 1e-6
    flat, unravel = jax.flatten_util.ravel_pytree(p)
    gflat, _ = jax.flatten_util.ravel_pytree(g)
    for i in range(flat.shape[0]):
        e = jnp.zeros_like(flat).at[i].set(eps)
        fd = (f(unravel(flat + e)) - f(unravel(flat - e))) / (2 * eps)
        assert np.isclose(float(gflat[i]), float(fd), rtol=1e-4, atol=1e-7), i


@pytest.mark.parametrize("reml", [False, True])
@pytest.mark.parametrize("order", [0, 2])
def test_closed_form_vjp_matches_autodiff(rng, reml, order):
    """The production LML's closed-form VJP (Rasmussen 5.9 + GLS envelope;
    never differentiates through the Cholesky) must match plain autodiff
    through the factorization graph to f64 tightness, and must vmap."""
    import dataclasses

    cfg, data, p = setup_problem(rng, order=order)
    cfg = dataclasses.replace(cfg, reml=reml)
    g_closed = jax.grad(lambda pp: gp.log_marginal_likelihood(pp, data, cfg))(p)
    g_ad = jax.grad(lambda pp: gp.log_marginal_likelihood_ad(pp, data, cfg))(p)
    for a, b in zip(jax.tree.leaves(g_ad), jax.tree.leaves(g_closed)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-8, atol=1e-12
        )
    # vmapped gradient (the fit path's shape): same answer per lane
    pb = jax.tree.map(lambda a: jnp.stack([a, a]), p)
    gb = jax.vmap(
        jax.grad(lambda pp: gp.log_marginal_likelihood(pp, data, cfg))
    )(pb)
    for a, b in zip(jax.tree.leaves(g_closed), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(b[0]), np.asarray(a), rtol=1e-10)


def test_closed_form_vjp_matern_isotropic(rng):
    """Closed-form VJP across a non-default kernel family (isotropic
    Matern-5/2: single shared length scale exercises the reduced log_ls
    cotangent shape)."""
    from madaiemulator_tpu.utils.config import CovarianceFamily

    cfg, data, _ = setup_problem(rng)
    cfg = GPConfig(
        nparams=2, regression_order=1, covariance=CovarianceFamily.MATERN52
    )
    p = GPParams(
        log_amp=jnp.asarray(np.log(1.1)),
        log_nugget=jnp.asarray(np.log(1e-3)),
        log_ls=jnp.asarray(np.log(np.array([0.7]))),
    )
    g_closed = jax.grad(lambda pp: gp.log_marginal_likelihood(pp, data, cfg))(p)
    g_ad = jax.grad(lambda pp: gp.log_marginal_likelihood_ad(pp, data, cfg))(p)
    for a, b in zip(jax.tree.leaves(g_ad), jax.tree.leaves(g_closed)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-8)


def test_bwd_follows_high_update_tier(rng):
    """When the factorization runs at the "high" (bf16x3) update tier, the
    closed-form VJP's two O(N^3) terms follow it (measured lever: 0.182 s
    of a 0.487 s N=16k vg call, bench/profile_vg16k.py). The gradient at
    the high tier must still match plain autodiff on a benign operand —
    on CPU the tiers coincide (wiring check); on TPU this bounds the
    tier's gradient divergence at the conditioning the tier is rated for."""
    import dataclasses

    cfg, data, p = setup_problem(rng)
    cfg_high = dataclasses.replace(
        cfg, cholesky_method="left", cholesky_block=8,
        cholesky_update_precision="high",
    )
    g_high = jax.grad(
        lambda pp: gp.log_marginal_likelihood(pp, data, cfg_high)
    )(p)
    g_ad = jax.grad(
        lambda pp: gp.log_marginal_likelihood_ad(pp, data, cfg)
    )(p)
    for a, b in zip(jax.tree.leaves(g_ad), jax.tree.leaves(g_high)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-7
        )


def test_non_spd_gives_neg_inf(rng):
    cfg, data, p = setup_problem(rng)
    # an absurd negative-nugget-like setup can't happen (log space), so force
    # non-SPD via a huge length scale + zero nugget at float32: instead check
    # the gate directly with duplicated points and nugget -> 0.
    X = jnp.concatenate([data.X, data.X], axis=0)  # exactly singular kernel
    y = jnp.concatenate([data.y, data.y])
    p0 = p._replace(log_nugget=jnp.asarray(np.log(1e-300)))
    ll = gp.log_marginal_likelihood(p0, GPData(X=X, y=y), cfg)
    assert not np.isfinite(float(ll)) or float(ll) < -1e10


def test_posterior_interpolates_training_points(rng):
    cfg, data, p = setup_problem(rng)
    p = p._replace(log_nugget=jnp.asarray(np.log(1e-12)))
    cfg = GPConfig(
        nparams=cfg.nparams,
        regression_order=1,
        predict_variance_includes_nugget=False,
    )
    mean, var = gp.gp_posterior(p, data, data.X, cfg)
    assert np.allclose(np.asarray(mean), np.asarray(data.y), atol=1e-6)
    assert np.all(np.asarray(var) >= 0)
    assert np.all(np.asarray(var) < 1e-5)


@pytest.mark.parametrize("reml", [False, True])
def test_lml_with_pointwise_noise_matches_numpy(rng, reml):
    """GPData.noise adds known per-point variances to the diagonal only."""
    cfg, data, p = setup_problem(rng, order=1)
    cfg = GPConfig(nparams=cfg.nparams, regression_order=1, reml=reml)
    noise = 10.0 ** rng.uniform(-4, -1, size=data.y.shape[0])
    nd = data._replace(noise=jnp.asarray(noise))
    got = float(gp.log_marginal_likelihood(p, nd, cfg))
    want = numpy_lml(np.asarray(data.X), np.asarray(data.y), p, cfg, noise)
    assert np.isclose(got, want, rtol=1e-9), (got, want)
    # zero noise vector is exactly the no-noise path
    z = data._replace(noise=jnp.zeros_like(data.y))
    assert float(gp.log_marginal_likelihood(p, z, cfg)) == float(
        gp.log_marginal_likelihood(p, data, cfg)
    )


@pytest.mark.parametrize("reml", [False, True])
def test_noise_closed_form_vjp_matches_autodiff(rng, reml):
    """The closed-form LML VJP treats noise as constant data — gradients
    must match plain autodiff through the noisy factorization exactly."""
    cfg, data, p = setup_problem(rng, order=1)
    cfg = GPConfig(nparams=cfg.nparams, regression_order=1, reml=reml)
    noise = jnp.asarray(10.0 ** rng.uniform(-4, -1, size=data.y.shape[0]))
    nd = data._replace(noise=noise)
    g_cf = jax.grad(lambda pp: gp.log_marginal_likelihood(pp, nd, cfg))(p)
    g_ad = jax.grad(lambda pp: gp.log_marginal_likelihood_ad(pp, nd, cfg))(p)
    for a, b in zip(jax.tree.leaves(g_cf), jax.tree.leaves(g_ad)):
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10)


def test_noisy_point_is_downweighted(rng):
    """A point with huge known noise must not drag the posterior: the mean
    at its location recovers the clean signal from its neighbors."""
    d = 1
    X = np.linspace(0, 1, 25)[:, None]
    f = np.sin(3 * X[:, 0])
    y = f.copy()
    j = 12
    y[j] += 5.0  # corrupted observation...
    noise = np.zeros(25)
    noise[j] = 1e4  # ...with honestly-huge known variance
    cfg = GPConfig(
        nparams=d, regression_order=0, predict_variance_includes_nugget=False
    )
    p = GPParams(
        log_amp=jnp.asarray(0.0),
        log_nugget=jnp.asarray(np.log(1e-8)),
        log_ls=jnp.asarray(np.log(np.array([0.08]))),
    )
    nd = GPData(X=jnp.asarray(X), y=jnp.asarray(y), noise=jnp.asarray(noise))
    mean, var = gp.gp_posterior(p, nd, nd.X, cfg)
    assert abs(float(mean[j]) - f[j]) < 0.05  # recovers sin, not sin+5
    # and the un-corrupted points still interpolate
    mask = np.arange(25) != j
    assert np.allclose(np.asarray(mean)[mask], f[mask], atol=1e-3)
    # losing point j's observation raises the latent variance there
    # (ordering vs the fully-clean factorization is the invariant)
    clean = GPData(X=nd.X, y=nd.y)
    _, var_clean = gp.gp_posterior(p, clean, nd.X, cfg)
    assert float(var[j]) > 10 * float(var_clean[j])


def test_fit_gp_accepts_noise(rng):
    """End-to-end: the vmapped multi-restart fit runs with GPData.noise and
    the fitted nugget captures only the residual homogeneous part."""
    from madaiemulator_tpu.models.fit import fit_gp

    n, d = 40, 2
    X = rng.uniform(size=(n, d))
    f = np.sin(3 * X[:, 0]) + X[:, 1]
    noise = np.full(n, 0.25)  # big known noise, tiny true residual
    y = f + np.sqrt(noise) * rng.standard_normal(n)
    cfg = GPConfig(nparams=d, regression_order=1, n_restarts=2,
                   max_opt_steps=25)
    data = GPData(X=jnp.asarray(X), y=jnp.asarray(y),
                  noise=jnp.asarray(noise))
    res = fit_gp(jax.random.key(0), data, cfg)
    assert np.isfinite(float(res.log_likelihood))
    # with the 0.25 variance explained by `noise`, the fitted nugget should
    # stay well below it (it only models what the known noise does not)
    assert float(jnp.exp(res.params.log_nugget)) < 0.1


def test_variance_grows_away_from_data(rng):
    cfg, data, p = setup_problem(rng)
    far = jnp.asarray(np.full((1, 2), 25.0))
    near = data.X[:1]
    _, v_far = gp.gp_posterior(p, data, far, cfg)
    _, v_near = gp.gp_posterior(p, data, near, cfg)
    assert float(v_far[0]) > float(v_near[0])
    # far from data, variance approaches prior amp (+nugget) + regression term
    assert float(v_far[0]) >= float(jnp.exp(p.log_amp))


def test_blocked_cholesky_backend_matches_xla(rng):
    cfg, data, p = setup_problem(rng, n=100)
    ll_xla = float(gp.log_marginal_likelihood(p, data, cfg))
    cfg_blocked = GPConfig(
        nparams=cfg.nparams,
        regression_order=cfg.regression_order,
        cholesky_method="blocked",
        cholesky_block=32,
    )
    ll_blk = float(gp.log_marginal_likelihood(p, data, cfg_blocked))
    assert np.isclose(ll_xla, ll_blk, rtol=1e-10), (ll_xla, ll_blk)
    mean1, var1 = gp.gp_posterior(p, data, data.X[:5], cfg)
    mean2, var2 = gp.gp_posterior(p, data, data.X[:5], cfg_blocked)
    assert np.allclose(np.asarray(mean1), np.asarray(mean2), rtol=1e-10)
    assert np.allclose(np.asarray(var1), np.asarray(var2), rtol=1e-8, atol=1e-12)


def test_left_cholesky_backend_matches_xla(rng):
    cfg, data, p = setup_problem(rng, n=100)
    ll_xla = float(gp.log_marginal_likelihood(p, data, cfg))
    cfg_left = GPConfig(
        nparams=cfg.nparams,
        regression_order=cfg.regression_order,
        cholesky_method="left",
        cholesky_block=32,
        cholesky_update_precision="auto",  # traced fallback -> highest
    )
    ll_left = float(gp.log_marginal_likelihood(p, data, cfg_left))
    assert np.isclose(ll_xla, ll_left, rtol=1e-10), (ll_xla, ll_left)
    mean1, var1 = gp.gp_posterior(p, data, data.X[:5], cfg)
    mean2, var2 = gp.gp_posterior(p, data, data.X[:5], cfg_left)
    assert np.allclose(np.asarray(mean1), np.asarray(mean2), rtol=1e-10)
    assert np.allclose(np.asarray(var1), np.asarray(var2), rtol=1e-8, atol=1e-12)


def test_predict_fast_matches_substitution(rng):
    """GEMM-only serving (explicit triangular inverses) vs the TRSM path."""
    cfg, data, p = setup_problem(rng, n=80)
    Xs = jnp.asarray(rng.uniform(size=(17, 2)))
    st = gp.precompute_predictor(p, data, cfg)
    m1, v1 = gp.predict_from_precomputed(st, p, data, Xs, cfg)
    fp = gp.precompute_fast_predictor(p, data, cfg)
    m2, v2 = gp.predict_fast(fp, p, data, Xs, cfg)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(v2), np.asarray(v1), rtol=1e-7, atol=1e-12
    )


def test_resolve_update_precision_auto(rng):
    cfg, data, p = setup_problem(rng, n=20)
    cfg_auto = GPConfig(
        nparams=cfg.nparams,
        cholesky_method="left",
        cholesky_update_precision="auto",
    )
    # n=20, amp=1.3, nugget=1e-3 (f64: no jitter floor):
    # kappa bound = 1 + 20*1.3/1e-3 = 26001 -> "highest"
    r1 = gp.resolve_update_precision(p, 20, cfg_auto)
    assert r1.cholesky_update_precision == "highest"
    # large nugget -> tiny bound -> "high"
    p2 = p._replace(log_nugget=jnp.asarray(np.log(0.5)))
    r2 = gp.resolve_update_precision(p2, 20, cfg_auto)
    assert r2.cholesky_update_precision == "high"
    # non-auto configs pass through untouched
    r3 = gp.resolve_update_precision(p, 20, cfg)
    assert r3 is cfg
    # the safe precompute path accepts "auto" end-to-end
    st = gp.precompute_predictor_safe(p, data, cfg_auto)
    assert bool(st.ok)


def test_auto_tier_choice_is_safe_for_its_gram(rng):
    """Integration of the mixed-precision tier rule: whatever tier the
    resolver picks for concrete hyperparameters, factoring THAT Gram at
    THAT tier must produce a residual-accurate factor (f32)."""
    from madaiemulator_tpu.ops import kernels, linalg

    d = 2
    X = jnp.asarray(rng.uniform(size=(192, d)), jnp.float32)
    for nugget, expect_tier in [(0.5, "high"), (1e-6, "highest")]:
        p = GPParams(
            log_amp=jnp.asarray(0.0, jnp.float32),
            log_nugget=jnp.asarray(np.log(nugget), jnp.float32),
            log_ls=jnp.asarray(np.log([0.5, 0.8]), jnp.float32),
        )
        cfg_auto = GPConfig(
            nparams=d, cholesky_method="left", cholesky_block=64,
            cholesky_update_precision="auto",
        )
        rcfg = gp.resolve_update_precision(p, 192, cfg_auto)
        assert rcfg.cholesky_update_precision == expect_tier, nugget
        C = kernels.gram_matrix(X, p, cfg_auto)
        Lf = linalg.left_cholesky(
            jnp.asarray(np.asarray(C), jnp.float32), block=64,
            update_precision=rcfg.cholesky_update_precision,
        )
        R = np.asarray(C) - np.tril(np.asarray(Lf)) @ np.tril(np.asarray(Lf)).T
        rel = np.abs(R).max() / np.abs(np.asarray(C)).max()
        assert rel < 1e-5, (nugget, rcfg.cholesky_update_precision, rel)


def test_chunked_predict_matches_unchunked(rng):
    cfg, data, p = setup_problem(rng, n=30)
    Xs = jnp.asarray(rng.uniform(size=(23, 2)))  # deliberately not % chunk
    m1, v1 = gp.gp_posterior(p, data, Xs, cfg)
    cfg_c = GPConfig(
        nparams=cfg.nparams, regression_order=cfg.regression_order,
        predict_query_chunk=8,
    )
    m2, v2 = gp.gp_posterior(p, data, Xs, cfg_c)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-10)


def test_gls_beta_reduces_to_ols_for_identity_cov(rng):
    # with amp tiny and nugget 1, C ~= I so GLS beta ~= OLS beta
    d = 2
    cfg = GPConfig(nparams=d, regression_order=1)
    X = rng.uniform(size=(30, d))
    y = 2.0 + 3.0 * X[:, 0] - 1.0 * X[:, 1] + 0.01 * rng.standard_normal(30)
    p = GPParams(
        log_amp=jnp.asarray(np.log(1e-8)),
        log_nugget=jnp.asarray(np.log(1.0)),
        log_ls=jnp.asarray(np.log(np.ones(d))),
    )
    st = gp.precompute_predictor(p, GPData(X=jnp.asarray(X), y=jnp.asarray(y)), cfg)
    H = np.concatenate([np.ones((30, 1)), X], axis=1)
    beta_ols, *_ = np.linalg.lstsq(H, y, rcond=None)
    assert np.allclose(np.asarray(st.beta), beta_ols, atol=1e-5)


def test_f32_auto_jitter_keeps_smooth_optimum_reachable(rng):
    """Regression (round 2, TPU v5e): at the flat 1e-6 jitter floor, the
    Gram matrix at smooth-kernel thetas (long length scales, tiny nugget —
    the LML optimum for smooth data) came out TRULY indefinite from f32
    build noise, so the fit objective was -inf exactly at its best basins
    and TPU fits landed 100x worse optima. The auto floor now scales as
    12*sqrt(N)*eps; this operand must produce a finite LML at f32."""
    X = jnp.asarray(rng.uniform(size=(30, 2)), jnp.float32)
    y = jnp.asarray(np.sin(3 * np.asarray(X)[:, 0]), jnp.float32)
    cfg = GPConfig(nparams=2, regression_order=1)
    p = GPParams(
        log_amp=jnp.asarray(np.log(5.449), jnp.float32),
        log_nugget=jnp.asarray(np.log(1.046e-9), jnp.float32),
        log_ls=jnp.asarray(np.log([0.7728, 1.605]), jnp.float32),
    )
    ll = gp.log_marginal_likelihood(p, GPData(X=X, y=y), cfg)
    assert np.isfinite(float(ll)), float(ll)
    # and the f64 parity path still uses NO jitter (exact reference math)
    ll64 = gp.log_marginal_likelihood(
        jax.tree.map(lambda a: jnp.asarray(np.asarray(a), jnp.float64), p),
        GPData(X=X.astype(jnp.float64), y=y.astype(jnp.float64)),
        cfg,
    )
    assert np.isfinite(float(ll64))


def test_vmapped_serve_matches_unvmapped_at_high_condition(rng):
    """Batched (vmapped) precompute+predict must agree with the unbatched
    program at an ill-conditioned operating point.

    Round-5 TPU finding: with matmul precision UNPINNED, the small GLS dots
    in _factor (resid = y - H beta, the beta rhs) lower to exact VPU ops
    when unbatched but to bf16 MXU ops when the same program is vmapped
    over a component axis — a ~9e-3 resid error that the cond~1e7 solve
    amplified into a garbage alpha (serve mean off by 5.8 on an O(0.7)
    target, SAME Cholesky factor). All such dots are now pinned HIGHEST;
    this pins the vmapped==unvmapped contract (exact on CPU, tight on TPU).
    """
    n, d, r = 96, 2, 3
    X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    # SMOOTH targets: the tiny-nugget GP then interpolates a well-posed
    # surface (alpha is huge but the prediction itself is determined);
    # noise targets at this conditioning are f32-indeterminate and would
    # make the contract vacuous
    Xn = np.asarray(X)
    Z = jnp.asarray(
        np.stack(
            [
                np.sin(4 * Xn[:, 0]) + Xn[:, 1],
                (Xn[:, 1] - 0.3) ** 2 + 0.5 * Xn[:, 0],
                np.cos(3 * Xn[:, 0]) * Xn[:, 1],
            ],
            axis=1,
        ),
        jnp.float32,
    )
    Xq = jnp.asarray(rng.uniform(size=(24, d)), jnp.float32)
    cfg = GPConfig(nparams=d, regression_order=1)
    # near-noiseless smooth optimum: amp O(0.1), nugget ~ 3e-8 (the MV-MF
    # repro's fitted component-0 values -> kappa bound ~ 7e6 at f32)
    params_b = GPParams(
        log_amp=jnp.log(jnp.asarray([0.15, 0.36, 1.5], jnp.float32)),
        log_nugget=jnp.log(jnp.asarray([3e-8, 2e-7, 1e-6], jnp.float32)),
        log_ls=jnp.log(
            jnp.asarray([[0.73, 0.45], [0.45, 0.71], [0.56, 0.49]],
                        jnp.float32)
        ),
    )

    def serve_one(p, y, q):
        data = GPData(X=X, y=y)
        st = gp.precompute_predictor(p, data, cfg)
        return gp.predict_from_precomputed(st, p, data, q, cfg)

    p0 = jax.tree.map(lambda a: a[0], params_b)
    m_u, v_u = jax.jit(lambda p, y, q: serve_one(p, y, q))(p0, Z[:, 0], Xq)
    m_b, v_b = jax.jit(
        jax.vmap(serve_one, in_axes=(0, 1, None))
    )(params_b, Z, Xq)
    # CPU: bit-identical algebra; TPU: pinned-precision ops, tight agreement
    np.testing.assert_allclose(
        np.asarray(m_b[0]), np.asarray(m_u), rtol=0, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(v_b[0]), np.asarray(v_u), rtol=1e-2, atol=5e-3
    )
