"""Itemize the N=16,384 LML value+grad call into per-term device times.

VERDICT r4 weak #4: the steady vg call costs ~1.04 s — 16x the 65 ms
factorization — and no one ever measured where it goes. The closed-form
VJP (models/gp.py _lml_dense_bwd) has five candidate sinks:

  fwd:  gram build (O(N^2 d) kernel evals), Cholesky, TRSM solves;
  bwd:  tri_inv_block(L) (~N^3/3 at HIGHEST), Cinv = Linv^T Linv
        (2 N^3 GEMM at HIGHEST — 8.8 TFLOP, suspicious prime suspect),
        gram VJP contraction against Mbar (O(N^2 d) bandwidth-bound).

Every term is chained x4 IN-GRAPH (lax.scan, carry perturbs the operand,
full result feeds the carry) so times are floor-free and DCE-proof —
the same protocol as bench.py's device-side metrics. The HIGH-precision
variants of the two N^3 backward terms are measured alongside to price
the precision lever before touching library code.

Run:  python bench/profile_vg16k.py [N] [d]
One JSON line per term.
"""

import json
import sys
import time

import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax
    import jax.numpy as jnp

    from madaiemulator_tpu.utils.compile_cache import enable_compile_cache

    cache = enable_compile_cache()
    emit(compile_cache=cache)

    from madaiemulator_tpu.models.fit import (
        _bounds_arrays,
        _u_to_params,
        sample_restarts,
    )
    from madaiemulator_tpu.models.gp import (
        GPData,
        log_marginal_likelihood,
        training_basis,
        training_gram,
    )
    from madaiemulator_tpu.ops import linalg
    from madaiemulator_tpu.utils.config import GPConfig
    from madaiemulator_tpu.utils.profiling import sync, timed

    dtype = jnp.float32
    dev = jax.devices()[0]
    emit(device=f"{dev.platform} {getattr(dev, 'device_kind', '?')}",
         n=n, d=d)

    # relay probe
    t0 = time.perf_counter()
    x = jnp.ones((2048, 2048), dtype)
    sync(jnp.dot(x, x))
    t_probe = time.perf_counter() - t0
    emit(metric="relay_probe_s", value=round(t_probe, 2),
         healthy=bool(t_probe < 10.0))

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(n, d)), dtype)
    y = jnp.asarray(
        np.sin(3 * np.asarray(X[:, 0])) + np.asarray(X[:, 1]) ** 2, dtype
    )
    cfg = GPConfig(
        nparams=d, regression_order=1, cholesky_method="xla",
        linesearch="backtracking",
    )
    data = GPData(X=X, y=y)

    # same operating point as profile_fit.py (mid-box restart draw)
    lo, hi = _bounds_arrays(cfg, dtype)
    u0 = sample_restarts(jax.random.key(0), cfg, 1, dtype=dtype)
    p = _u_to_params(jax.tree.map(lambda a: a[0], u0), lo, hi)

    K = 4
    hi_prec = jax.lax.Precision.HIGHEST
    high_prec = jax.lax.Precision.HIGH

    def chain(body0):
        """jit a x-K lax.scan chain; body0(carry_scalar) -> new scalar."""

        @jax.jit
        def run():
            def body(c, _):
                return body0(c), None
            return jax.lax.scan(
                body, jnp.asarray(0.0, dtype), None, length=K
            )[0]

        return run

    def bench(name, body0, **extra):
        fn = chain(body0)
        t_first0 = time.perf_counter()
        sync(fn())
        t_first = time.perf_counter() - t_first0
        t, _ = timed(fn, reps=2, warmup=0)
        emit(metric=name, per_call_s=round(t / K, 4),
             chain_s=round(t, 3), compile_s=round(t_first - t, 1), **extra)
        return t / K

    def perturb_params(c):
        return jax.tree.map(lambda a: a + c.astype(a.dtype) * 1e-30, p)

    # ---- reference: full value+grad ------------------------------------
    vg = jax.value_and_grad(
        lambda pp: log_marginal_likelihood(pp, data, cfg)
    )

    def vg_body(c):
        v, g = vg(perturb_params(c))
        return v * jnp.asarray(1e-30, dtype) + sum(
            jnp.sum(le) for le in jax.tree.leaves(g)
        ) * jnp.asarray(1e-30, dtype) + c

    t_vg = bench("vg_full", vg_body)

    # ---- forward value only ---------------------------------------------
    def v_body(c):
        v = log_marginal_likelihood(perturb_params(c), data, cfg)
        return v * jnp.asarray(1e-30, dtype) + c

    t_v = bench("fwd_value_only", v_body)

    # ---- fwd terms ------------------------------------------------------
    def gram_body(c):
        C = training_gram(data, perturb_params(c), cfg)
        return jnp.max(jnp.abs(C)) * jnp.asarray(1e-30, dtype) + c

    t_gram = bench("fwd_gram_build", gram_body)

    C0 = jax.jit(lambda pp: training_gram(data, pp, cfg))(p)
    sync(C0)
    L0 = jax.jit(linalg.xla_cholesky)(C0)
    sync(L0)
    H = training_basis(data, cfg)
    pdim = H.shape[1]

    def chol_body(c):
        L = linalg.xla_cholesky(C0 + c * jnp.asarray(1e-30, dtype))
        return jnp.max(jnp.abs(L)) * jnp.asarray(1e-30, dtype) + c

    t_chol = bench("fwd_cholesky_xla", chol_body, p=pdim)

    def trsm_body(c):
        Lc = L0 + c * jnp.asarray(1e-30, dtype)
        Linv_H = linalg.solve_lower(Lc, H)
        Linv_y = linalg.solve_lower(Lc, y)
        return (jnp.max(jnp.abs(Linv_H)) + jnp.max(jnp.abs(Linv_y))) * \
            jnp.asarray(1e-30, dtype) + c

    t_trsm = bench("fwd_trsm_H_y", trsm_body)

    # ---- bwd terms ------------------------------------------------------
    def triinv_body_at(prec):
        def body(c):
            Lc = L0 + c * jnp.asarray(1e-30, dtype) * jnp.eye(n, dtype=dtype)
            Linv = linalg.tri_inv_block(Lc, precision=prec)
            return jnp.max(jnp.abs(Linv)) * jnp.asarray(1e-30, dtype) + c
        return body

    t_triinv = bench("bwd_tri_inv_highest", triinv_body_at(hi_prec))
    t_triinv_high = bench("bwd_tri_inv_high", triinv_body_at(high_prec))

    Linv0 = jax.jit(lambda L: linalg.tri_inv_block(L, precision=hi_prec))(L0)
    sync(Linv0)

    def cinv_body_at(prec):
        def body(c):
            Li = Linv0 + c * jnp.asarray(1e-30, dtype)
            Cinv = jnp.dot(Li.T, Li, preferred_element_type=dtype,
                           precision=prec)
            return jnp.max(jnp.abs(Cinv)) * jnp.asarray(1e-30, dtype) + c
        return body

    t_cinv = bench("bwd_cinv_gemm_highest", cinv_body_at(hi_prec))
    t_cinv_high = bench("bwd_cinv_gemm_high", cinv_body_at(high_prec))

    # gram VJP contraction against a dense cotangent
    Mbar0 = jax.jit(
        lambda Li: -0.5 * jnp.dot(Li.T, Li, preferred_element_type=dtype,
                                  precision=hi_prec)
    )(Linv0)
    sync(Mbar0)

    def gramvjp_body(c):
        _, vjp = jax.vjp(lambda pp: training_gram(data, pp, cfg),
                         perturb_params(c))
        g = vjp(Mbar0)[0]
        return sum(jnp.sum(le) for le in jax.tree.leaves(g)) * \
            jnp.asarray(1e-30, dtype) + c

    t_gramvjp = bench("bwd_gram_vjp_contraction", gramvjp_body)

    known = t_gram + t_chol + t_trsm + t_triinv + t_cinv + t_gramvjp
    emit(
        metric="vg16k_budget",
        vg_full_s=round(t_vg, 4),
        fwd_value_s=round(t_v, 4),
        gram_s=round(t_gram, 4),
        cholesky_s=round(t_chol, 4),
        trsm_s=round(t_trsm, 4),
        tri_inv_s=round(t_triinv, 4),
        cinv_gemm_s=round(t_cinv, 4),
        gram_vjp_s=round(t_gramvjp, 4),
        sum_terms_s=round(known, 4),
        unattributed_s=round(t_vg - known, 4),
        lever_tri_inv_high_s=round(t_triinv_high, 4),
        lever_cinv_high_s=round(t_cinv_high, 4),
        lever_saving_if_high_s=round(
            (t_triinv - t_triinv_high) + (t_cinv - t_cinv_high), 4),
    )


if __name__ == "__main__":
    main()
