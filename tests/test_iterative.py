"""Matrix-free (iterative) GP inference vs the dense path (SURVEY.md §5
"long-context analog": the growth path past dense-HBM N; PAPERS.md BBMM)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madaiemulator_tpu.models import gp, iterative
from madaiemulator_tpu.models.gp import GPData
from madaiemulator_tpu.ops import kernels
from madaiemulator_tpu.ops.kernels import GPParams
from madaiemulator_tpu.utils.config import GPConfig


def setup_problem(rng, n=48, d=2, nugget=1e-2):
    cfg = GPConfig(nparams=d, regression_order=1)
    X = rng.uniform(size=(n, d))
    y = np.sin(3 * X[:, 0]) + 0.5 * X[:, 1] + 0.05 * rng.standard_normal(n)
    p = GPParams(
        log_amp=jnp.asarray(np.log(1.3)),
        log_nugget=jnp.asarray(np.log(nugget)),
        log_ls=jnp.asarray(np.log(np.array([0.6, 0.9][:d]))),
    )
    return cfg, GPData(X=jnp.asarray(X), y=jnp.asarray(y)), p


def test_gram_matvec_matches_dense(rng):
    cfg, data, p = setup_problem(rng, n=37)
    C = np.asarray(kernels.gram_matrix(data.X, p, cfg))
    V = rng.standard_normal((37, 3))
    got = np.asarray(iterative.gram_matvec(data.X, p, cfg, jnp.asarray(V), row_chunk=8))
    np.testing.assert_allclose(got, C @ V, rtol=1e-9, atol=1e-12)
    # vector form
    got1 = np.asarray(iterative.gram_matvec(data.X, p, cfg, jnp.asarray(V[:, 0])))
    np.testing.assert_allclose(got1, C @ V[:, 0], rtol=1e-9, atol=1e-12)


def test_pivoted_cholesky_converges(rng):
    cfg, data, p = setup_problem(rng, n=40)
    K = np.asarray(kernels.cross_covariance(data.X, data.X, p, cfg))
    K = 0.5 * (K + K.T)
    for rank, tol in [(10, 0.5), (40, 1e-6)]:
        Lk = np.asarray(iterative.pivoted_cholesky(data.X, p, cfg, rank))
        err = np.abs(K - Lk @ Lk.T).max() / np.abs(K).max()
        assert err < tol, (rank, err)


def test_pcg_matches_direct_solve(rng):
    cfg, data, p = setup_problem(rng, n=45)
    C = np.asarray(kernels.gram_matrix(data.X, p, cfg))
    B = rng.standard_normal((45, 4))
    Lk = iterative.pivoted_cholesky(data.X, p, cfg, 20)
    da = float(np.exp(np.asarray(p.log_nugget)))
    pre = iterative.make_preconditioner(Lk, jnp.asarray(da))
    mv = lambda V: iterative.gram_matvec(data.X, p, cfg, V)
    X, rel, iters = iterative.pcg_solve(mv, jnp.asarray(B), pre, tol=1e-10)
    np.testing.assert_allclose(np.asarray(X), np.linalg.solve(C, B), rtol=1e-6, atol=1e-8)
    assert float(np.max(np.asarray(rel))) < 1e-9
    # preconditioning must beat unpreconditioned iteration count
    X2, rel2, iters2 = iterative.pcg_solve(mv, jnp.asarray(B), None, tol=1e-10)
    assert int(iters) <= int(iters2)


def test_pcg_freezes_on_indefinite_preconditioner_apply(rng):
    """An indefinite APPLIED P-inverse makes rz = r^T P^-1 r <= 0; alpha =
    rz/pap would then be a finite wrong-direction step that grows the
    residual for the whole budget without tripping the isfinite checks.
    pcg_solve must treat rz <= 0 as breakdown: freeze the column at its
    last (here: initial) iterate with rel >> tol so callers gate on it."""
    n = 16
    A = np.eye(n) * 2.0
    B = rng.standard_normal((n, 3))
    # lie about the Woodbury capacitance: Lk Lk^T = 2 I, true M = (1 + 2) I,
    # but M_chol = sqrt(0.5) I => solve(V) = V - 2 * (1/0.5) V = -3 V,
    # a negative-definite apply => rz0 < 0 for every column
    Lk = jnp.asarray(np.sqrt(2.0) * np.eye(n))
    lying = iterative.Preconditioner(
        Lk=Lk,
        sigma2=jnp.asarray(1.0),
        M_chol=jnp.asarray(np.sqrt(0.5) * np.eye(n)),
    )
    mv = lambda V: 2.0 * V
    X, rel, iters = iterative.pcg_solve(
        mv, jnp.asarray(B), lying, tol=1e-10, max_iters=64
    )
    # every column frozen at the initial iterate (no wrong-direction steps)
    np.testing.assert_allclose(np.asarray(X), 0.0)
    assert np.all(np.asarray(rel) >= 0.99)  # visibly unconverged
    assert int(iters) <= 2  # froze immediately, not after the full budget


def test_preconditioner_solve_and_logdet(rng):
    n, k = 30, 8
    Lk = rng.standard_normal((n, k)) * 0.7
    s2 = 0.3
    P = Lk @ Lk.T + s2 * np.eye(n)
    pre = iterative.make_preconditioner(jnp.asarray(Lk), jnp.asarray(s2))
    V = rng.standard_normal((n, 2))
    np.testing.assert_allclose(
        np.asarray(pre.solve(jnp.asarray(V))), np.linalg.solve(P, V),
        rtol=1e-8, atol=1e-10,
    )
    assert np.isclose(float(pre.logdet()), np.linalg.slogdet(P)[1], rtol=1e-10)


def test_slq_logdet_exact_mode(rng):
    cfg, data, p = setup_problem(rng, n=32)
    C = np.asarray(kernels.gram_matrix(data.X, p, cfg))
    mv = lambda V: iterative.gram_matvec(data.X, p, cfg, V)
    est = float(
        iterative.slq_logdet(
            lambda v: mv(v), 32, jax.random.key(0), probes=32, lanczos_iters=32,
            dtype=jnp.float64,
        )
    )
    exact = np.linalg.slogdet(C)[1]
    assert np.isclose(est, exact, rtol=1e-6), (est, exact)


def test_slq_logdet_stochastic_reasonable(rng):
    cfg, data, p = setup_problem(rng, n=60)
    C = np.asarray(kernels.gram_matrix(data.X, p, cfg))
    mv = lambda V: iterative.gram_matvec(data.X, p, cfg, V)
    est = float(
        iterative.slq_logdet(
            mv, 60, jax.random.key(3), probes=32, lanczos_iters=40,
            dtype=jnp.float64,
        )
    )
    exact = np.linalg.slogdet(C)[1]
    # stochastic: generous tolerance, but must be in the right ballpark
    assert abs(est - exact) < 0.05 * max(abs(exact), 10.0), (est, exact)


@pytest.mark.parametrize("reml", [False, True])
def test_lml_iterative_matches_dense_exact_mode(rng, reml):
    import dataclasses

    cfg, data, p = setup_problem(rng, n=36)
    cfg = dataclasses.replace(cfg, reml=reml)
    ll_dense = float(gp.log_marginal_likelihood(p, data, cfg))
    ll_iter = float(
        iterative.lml_iterative(
            p, data, cfg, seed=0, rank=36, probes=36, lanczos_iters=36,
            cg_tol=1e-12, cg_max_iters=400,
        )
    )
    assert np.isclose(ll_iter, ll_dense, rtol=1e-5, atol=1e-4), (ll_iter, ll_dense)


def test_gram_matvec_with_noise_matches_dense(rng):
    cfg, data, p = setup_problem(rng, n=31)
    noise = 10.0 ** rng.uniform(-3, -1, size=31)
    C = np.asarray(kernels.gram_matrix(data.X, p, cfg)) + np.diag(noise)
    V = rng.standard_normal((31, 3))
    got = np.asarray(
        iterative.gram_matvec(
            data.X, p, cfg, jnp.asarray(V), row_chunk=8,
            noise=jnp.asarray(noise),
        )
    )
    np.testing.assert_allclose(got, C @ V, rtol=1e-9, atol=1e-12)


def test_vector_ridge_preconditioner_matches_dense(rng):
    """P = Lk Lk^T + diag(d): Woodbury apply and Sylvester logdet vs numpy."""
    cfg, data, p = setup_problem(rng, n=33)
    Lk = np.asarray(iterative.pivoted_cholesky(data.X, p, cfg, 12))
    d = 10.0 ** rng.uniform(-3, 0, size=33)
    pre = iterative.make_preconditioner(jnp.asarray(Lk), jnp.asarray(d))
    P = Lk @ Lk.T + np.diag(np.asarray(pre.sigma2))
    B = rng.standard_normal((33, 4))
    got = np.asarray(pre.solve(jnp.asarray(B)))
    np.testing.assert_allclose(got, np.linalg.solve(P, B), rtol=1e-8,
                               atol=1e-10)
    np.testing.assert_allclose(
        float(pre.logdet()), np.linalg.slogdet(P)[1], rtol=1e-10
    )


@pytest.mark.parametrize("reml", [False, True])
def test_lml_iterative_with_noise_matches_dense(rng, reml):
    """GPData.noise flows through the matvec, the vector-ridge
    preconditioner, and the Hutchinson VJP — value AND gradient must match
    the dense noisy path at exact-probe settings."""
    import dataclasses

    cfg, data, p = setup_problem(rng, n=30)
    cfg = dataclasses.replace(cfg, reml=reml)
    noise = jnp.asarray(10.0 ** rng.uniform(-3, -1, size=30))
    nd = data._replace(noise=noise)
    ll_dense = float(gp.log_marginal_likelihood(p, nd, cfg))
    f_iter = lambda pp: iterative.lml_iterative(
        pp, nd, cfg, seed=0, rank=30, probes=30, lanczos_iters=30,
        cg_tol=1e-12, cg_max_iters=400,
    )
    assert np.isclose(float(f_iter(p)), ll_dense, rtol=1e-5, atol=1e-4)
    g_dense = jax.grad(lambda pp: gp.log_marginal_likelihood(pp, nd, cfg))(p)
    g_iter = jax.grad(f_iter)(p)
    for a, b in zip(jax.tree.leaves(g_dense), jax.tree.leaves(g_iter)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-6
        )


def test_predict_iterative_with_noise_matches_dense(rng):
    """Cached-state serving with per-point noise == dense posterior with
    the same noisy training covariance."""
    cfg, data, p = setup_problem(rng, n=34)
    noise = jnp.asarray(10.0 ** rng.uniform(-3, -1, size=34))
    nd = data._replace(noise=noise)
    Xs = jnp.asarray(rng.uniform(size=(17, 2)))
    m_d, v_d = gp.gp_posterior(p, nd, Xs, cfg)
    st = iterative.precompute_iterative_predictor(
        p, nd, cfg, rank=34, cg_tol=1e-12, cg_max_iters=400
    )
    m_i, v_i = iterative.predict_iterative_from_state(st, nd, Xs)
    np.testing.assert_allclose(np.asarray(m_i), np.asarray(m_d), rtol=1e-6,
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(v_i), np.asarray(v_d), rtol=1e-5,
                               atol=1e-7)


@pytest.mark.parametrize("reml", [False, True])
def test_lml_iterative_gradient_matches_dense_exact_mode(rng, reml):
    """Exact-probe settings: the iterative VJP (incl. the REML log|A| term,
    VERDICT r2 weak #6 — previously dropped) must match dense autodiff."""
    import dataclasses

    cfg, data, p = setup_problem(rng, n=30)
    cfg = dataclasses.replace(cfg, reml=reml)
    g_dense = jax.grad(lambda pp: gp.log_marginal_likelihood(pp, data, cfg))(p)
    g_iter = jax.grad(
        lambda pp: iterative.lml_iterative(
            pp, data, cfg, seed=0, rank=30, probes=30, lanczos_iters=30,
            cg_tol=1e-12, cg_max_iters=400,
        )
    )(p)
    for a, b in zip(jax.tree.leaves(g_dense), jax.tree.leaves(g_iter)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-6
        )


def test_predict_iterative_matches_dense(rng):
    cfg, data, p = setup_problem(rng, n=42)
    Xs = jnp.asarray(rng.uniform(size=(11, 2)))
    m_d, v_d = gp.gp_posterior(p, data, Xs, cfg)
    m_i, v_i = iterative.predict_iterative(
        p, data, Xs, cfg, rank=42, cg_tol=1e-12, cg_max_iters=400,
        query_chunk=4,
    )
    np.testing.assert_allclose(np.asarray(m_i), np.asarray(m_d), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(v_i), np.asarray(v_d), rtol=1e-4, atol=1e-8)


def test_predict_iterative_from_state_matches_oneshot(rng):
    """The cached-state serving path must agree exactly with the one-shot
    path (same solves, just hoisted), and the cache must NOT rebuild the
    preconditioner or training solves per query batch (VERDICT r2 weak #1:
    iterative serving used to pay fit-grade solves per batch)."""
    cfg, data, p = setup_problem(rng, n=42)
    Xs1 = jnp.asarray(rng.uniform(size=(9, 2)))
    Xs2 = jnp.asarray(rng.uniform(size=(5, 2)))
    m_ref, v_ref = iterative.predict_iterative(
        p, data, Xs1, cfg, rank=32, cg_tol=1e-10, cg_max_iters=300,
        query_chunk=4,
    )
    state = iterative.precompute_iterative_predictor(
        p, data, cfg, rank=32, cg_tol=1e-10, cg_max_iters=300
    )
    calls = {"pc": 0}
    orig_pc = iterative.pivoted_cholesky

    def counting_pc(*a, **k):
        calls["pc"] += 1
        return orig_pc(*a, **k)

    iterative.pivoted_cholesky = counting_pc
    try:
        m1, v1 = iterative.predict_iterative_from_state(
            state, data, Xs1, query_chunk=4
        )
        m2, v2 = iterative.predict_iterative_from_state(
            state, data, Xs2, query_chunk=4
        )
    finally:
        iterative.pivoted_cholesky = orig_pc
    assert calls["pc"] == 0, "serving from state must not rebuild the preconditioner"
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m_ref), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v_ref), rtol=1e-12)
    assert m2.shape == (5,) and np.all(np.asarray(v2) >= 0)
    # passing state= through the one-shot wrapper uses the cache too
    m3, v3 = iterative.predict_iterative(
        p, data, Xs1, cfg, query_chunk=4, state=state
    )
    np.testing.assert_allclose(np.asarray(m3), np.asarray(m_ref), rtol=1e-12)


def test_lml_iterative_row_chunk_invariant(rng):
    """row_chunk (the matvec tile bound, plumbed in round 3 for the 131k
    worker envelope) is a scheduling knob: value and gradient must not
    change with it."""
    cfg, data, p = setup_problem(rng, n=36)
    kw = dict(seed=0, rank=36, probes=36, lanczos_iters=36,
              cg_tol=1e-12, cg_max_iters=400)
    f_ref = lambda pp: iterative.lml_iterative(pp, data, cfg, **kw)
    f_chk = lambda pp: iterative.lml_iterative(pp, data, cfg, row_chunk=8, **kw)
    np.testing.assert_allclose(float(f_chk(p)), float(f_ref(p)), rtol=1e-10)
    g_ref = jax.grad(f_ref)(p)
    g_chk = jax.grad(f_chk)(p)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_chk)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-8)


def test_predict_iterative_precond_variance(rng):
    """variance_method='precond' (Woodbury apply instead of PCG): exact at
    full preconditioner rank; a lower bound that is still close at reduced
    rank (P <= C => reported variance <= exact variance)."""
    cfg, data, p = setup_problem(rng, n=40)
    Xs = jnp.asarray(rng.uniform(size=(13, 2)))
    st_full = iterative.precompute_iterative_predictor(
        p, data, cfg, rank=40, cg_tol=1e-12, cg_max_iters=400
    )
    m_e, v_e = iterative.predict_iterative_from_state(
        st_full, data, Xs, query_chunk=5
    )
    m_p, v_p = iterative.predict_iterative_from_state(
        st_full, data, Xs, query_chunk=5, variance_method="precond"
    )
    np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_e), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(v_p), np.asarray(v_e), rtol=1e-6, atol=1e-10
    )
    # reduced rank: mean still exact, variance a (close) lower bound
    st_lo = iterative.precompute_iterative_predictor(
        p, data, cfg, rank=20, cg_tol=1e-12, cg_max_iters=400
    )
    m_l, v_l = iterative.predict_iterative_from_state(
        st_lo, data, Xs, query_chunk=5, variance_method="precond"
    )
    np.testing.assert_allclose(np.asarray(m_l), np.asarray(m_e), rtol=1e-8)
    assert np.all(np.asarray(v_l) <= np.asarray(v_e) + 1e-8)
    with pytest.raises(ValueError, match="variance_method"):
        iterative.predict_iterative_from_state(
            st_full, data, Xs, variance_method="bogus"
        )


def test_mbcg_quadrature_matches_lanczos(rng):
    """CG-derived tridiagonals (mBCG, no preconditioner) must reproduce the
    direct Lanczos quadrature z^T log(A) z for the same probes."""
    cfg, data, p = setup_problem(rng, n=40)
    C = np.asarray(kernels.gram_matrix(data.X, p, cfg))
    mv = lambda V: iterative.gram_matvec(data.X, p, cfg, V)
    Z = np.where(rng.uniform(size=(40, 4)) < 0.5, -1.0, 1.0)
    Zj = jnp.asarray(Z)
    # direct Lanczos quadrature
    m = 40
    alphas, betas = iterative._lanczos_tridiag_batched(mv, Zj, m)

    def lq(a, b, z):
        T = np.diag(np.asarray(a)) + np.diag(np.asarray(b), 1) + np.diag(np.asarray(b), -1)
        ev, evec = np.linalg.eigh(T)
        return float((evec[0] ** 2) @ np.log(np.maximum(ev, 1e-30)) * (z @ z))

    direct = np.array([lq(alphas[:, i], betas[:, i], Z[:, i]) for i in range(4)])
    # mBCG: CG on the same probes, no preconditioner, full iterations
    _, _, _, (At, Bt, steps) = iterative.pcg_solve(
        mv, Zj, None, tol=1e-30, max_iters=m, track_tridiag=True
    )
    weights = jnp.asarray((Z * Z).sum(axis=0))  # z^T I^-1 z
    quads = np.asarray(iterative.mbcg_quadrature(At, Bt, steps, weights))
    np.testing.assert_allclose(quads, direct, rtol=1e-6)
    # and both must sum-estimate the true trace of log(C) reasonably
    exact = np.linalg.slogdet(C)[1]
    assert abs(np.mean(quads) - exact) < 0.15 * max(abs(exact), 10.0)


def test_lml_iterative_mbcg_close_to_dense(rng):
    cfg, data, p = setup_problem(rng, n=60)
    ll_dense = float(gp.log_marginal_likelihood(p, data, cfg))
    ll_mbcg = float(
        iterative.lml_iterative(
            p, data, cfg, seed=3, rank=40, probes=24, logdet_method="mbcg",
            cg_tol=1e-11, cg_max_iters=300,
        )
    )
    # stochastic logdet estimate: generous but meaningful tolerance
    assert abs(ll_mbcg - ll_dense) < 0.05 * max(abs(ll_dense), 20.0), (
        ll_mbcg, ll_dense,
    )


def test_fit_gp_iterative_improves_likelihood(rng):
    """End-to-end matrix-free fit: exact-probe objective, small n; the
    fitted params must beat the best random start by a clear margin and
    land near the dense-path optimum's quality."""
    cfg, data, p = setup_problem(rng, n=32)
    cfg = GPConfig(nparams=2, regression_order=1, n_restarts=3,
                   max_opt_steps=25)
    res = iterative.fit_gp_iterative(
        jax.random.key(0), data, cfg, seed=0, rank=32, probes=32,
        lanczos_iters=32, cg_tol=1e-10, cg_max_iters=300,
    )
    assert np.isfinite(float(res.log_likelihood))
    # cross-check the winner against the dense likelihood
    ll_dense = float(gp.log_marginal_likelihood(res.params, data, cfg))
    assert np.isclose(float(res.log_likelihood), ll_dense, rtol=1e-4, atol=1e-3)
    # must beat the fixed reasonable params p by optimization
    assert ll_dense >= float(gp.log_marginal_likelihood(p, data, cfg)) - 1e-6


def test_lml_iterative_data_as_jit_argument(rng):
    """data must be passable as a TRACED jit argument (it is a
    differentiable custom_vjp arg with zero cotangent, not a static one)."""
    cfg, data, p = setup_problem(rng, n=24)
    f = jax.jit(
        lambda pp, dd: iterative.lml_iterative(
            pp, dd, cfg, seed=1, rank=8, probes=4, lanczos_iters=12
        )
    )
    v = float(f(p, data))
    assert np.isfinite(v)
    g = jax.jit(
        jax.grad(
            lambda pp, dd: iterative.lml_iterative(
                pp, dd, cfg, seed=1, rank=8, probes=4, lanczos_iters=12
            )
        )
    )(p, data)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


def test_lml_iterative_jits(rng):
    cfg, data, p = setup_problem(rng, n=24)
    f = jax.jit(
        lambda pp: iterative.lml_iterative(
            pp, data, cfg, seed=1, rank=8, probes=4, lanczos_iters=12,
        )
    )
    v1 = float(f(p))
    v2 = float(f(p))
    assert np.isfinite(v1) and v1 == v2


def test_preconditioner_conditioning_floor_smooth_kernel():
    """At smooth-kernel thetas (ls ~ domain size, small nugget) the f32
    Woodbury capacitance reaches cond ~1e6+ and its factor error used to
    make the applied P-inverse indefinite — PCG then DIVERGED (measured
    rel 6.3 at N=32k where unpreconditioned reached 8e-3), every theta
    gated to -inf, and fits silently returned their fallback starts. The
    conditioning-safe ridge floor must keep the preconditioner a
    preconditioner: converge, and beat the unpreconditioned iteration
    count."""
    from madaiemulator_tpu.models import iterative as it
    from madaiemulator_tpu.models.gp import GPData

    rng = np.random.default_rng(0)
    n, d = 2048, 4
    X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    p = GPParams(
        log_amp=jnp.asarray(0.0, jnp.float32),
        log_nugget=jnp.asarray(np.log(5e-3), jnp.float32),
        log_ls=jnp.asarray(np.log([0.65, 0.93, 1.7, 1.3]), jnp.float32),
    )
    cfg = GPConfig(nparams=d, regression_order=1)
    data = GPData(X=X, y=jnp.asarray(rng.standard_normal(n), jnp.float32))
    da = it._diag_add(n, p, cfg, jnp.float32)
    Lk = it.pivoted_cholesky(X, p, cfg, 64)
    pre = it.make_preconditioner(Lk, da)
    # the floor engaged: ridge well above the raw diagonal
    assert float(pre.sigma2) > float(da)
    mv = it._matvec_for(p, data, cfg, None, 2048)
    B = data.y[:, None]
    S_p, rel_p, it_p = it.pcg_solve(mv, B, pre, tol=1e-4, max_iters=256)
    S_n, rel_n, it_n = it.pcg_solve(mv, B, None, tol=1e-4, max_iters=256)
    assert float(rel_p[0]) < 1e-3, float(rel_p[0])
    assert int(it_p) < int(it_n), (int(it_p), int(it_n))
    # and the LML is finite (the -inf wall was the user-visible symptom)
    ll = it.lml_iterative(
        p, data, cfg, rank=64, probes=8, lanczos_iters=32,
        cg_tol=1e-4, cg_max_iters=256, seed=0, logdet_method="mbcg",
    )
    assert np.isfinite(float(ll)), float(ll)


def test_preconditioner_floor_inactive_on_benign_problems():
    """On well-conditioned operands the floor must not engage: sigma2
    passes through untouched and full-rank parity with the dense path is
    preserved (the existing parity tests rely on P == C at rank n)."""
    from madaiemulator_tpu.models import iterative as it

    rng = np.random.default_rng(1)
    n, d = 64, 2
    X = jnp.asarray(rng.uniform(size=(n, d)))
    p = GPParams(
        log_amp=jnp.asarray(0.0),
        log_nugget=jnp.asarray(np.log(1e-2)),
        log_ls=jnp.full((d,), np.log(0.4)),
    )
    cfg = GPConfig(nparams=d, regression_order=0)
    da = it._diag_add(n, p, cfg, X.dtype)
    Lk = it.pivoted_cholesky(X, p, cfg, 16)
    pre = it.make_preconditioner(Lk, da)
    np.testing.assert_allclose(float(pre.sigma2), float(da), rtol=1e-12)


def test_predict_from_state_variance_rhs_strip_mining(rng):
    """Strip-mined exact variance (VERDICT r3 next #3): sub-batching the
    PCG right-hand sides must not change the answers — each column's
    Krylov solve is independent. Checks an uneven split (padding columns
    are zero-RHS no-ops) and variance_rhs == 1."""
    cfg, data, p = setup_problem(rng, n=40)
    Xs = jnp.asarray(rng.uniform(size=(11, 2)))
    state = iterative.precompute_iterative_predictor(
        p, data, cfg, rank=32, cg_tol=1e-10, cg_max_iters=300
    )
    m_ref, v_ref = iterative.predict_iterative_from_state(
        state, data, Xs, query_chunk=11, variance_rhs=11
    )
    for rhs in (4, 3, 1):  # 11/4 and 11/3 exercise the column padding
        m, v = iterative.predict_iterative_from_state(
            state, data, Xs, query_chunk=11, variance_rhs=rhs
        )
        np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                                   rtol=1e-9, atol=1e-12)


def test_predict_iterative_host_matches_in_graph(rng):
    """predict_iterative_host (host-side chunk loop — the exact-variance
    route at the 64k serving scale, where the nested in-graph chunked
    program is a measured TPU-worker crash trigger) is exactly the
    in-graph serve, including an uneven tail chunk."""
    cfg, data, p = setup_problem(rng, n=40)
    Xs = jnp.asarray(rng.uniform(size=(23, 2)))
    state = iterative.precompute_iterative_predictor(
        p, data, cfg, rank=32, cg_tol=1e-10, cg_max_iters=300
    )
    m_ref, v_ref = iterative.predict_iterative_from_state(
        state, data, Xs, query_chunk=23
    )
    for chunk in (23, 8, 5):  # 23/8, 23/5 exercise the padded tail
        m, v = iterative.predict_iterative_host(
            state, data, Xs, chunk=chunk
        )
        np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                                   rtol=1e-11)
        np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                                   rtol=1e-8, atol=1e-12)
    # with_variance=False path
    m, v = iterative.predict_iterative_host(
        state, data, Xs, chunk=8, with_variance=False
    )
    assert v is None
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref), rtol=1e-11)
