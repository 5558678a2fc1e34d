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

Run:  python bench/profile_vg16k.py [N] [d] [terms]
One JSON line per term.  `terms` is a comma-separated subset of
{vg,value,gram,chol,trsm,triinv,cinv,gramvjp} (default: all); the
N=16k chained-cholesky compile can crash the axon remote-compile helper
(ROADMAP "environment issues"), so run each term in its OWN process and
a crash loses one term, not the queue.
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
    terms = set(
        sys.argv[3].split(",") if len(sys.argv) > 3
        else ["vg", "value", "gram", "chol", "trsm", "triinv", "cinv",
              "gramvjp"]
    )

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
        """jit a x-K lax.scan chain; body0(carry_scalar, *ops) -> scalar.

        Large device operands MUST be passed through *ops (jit arguments):
        a closed-over 1 GB array is embedded as a constant in the program
        and blows the axon remote-compile request past its length limit
        (observed: HTTP 413 for every term closing over an (n, n) operand).
        Same rule as bench.py's device-side protocol.
        """

        @jax.jit
        def run(*ops):
            def body(c, _):
                return body0(c, *ops), None
            return jax.lax.scan(
                body, jnp.asarray(0.0, dtype), None, length=K
            )[0]

        return run

    def bench(name, body0, *ops, **extra):
        fn = chain(body0)
        t_first0 = time.perf_counter()
        sync(fn(*ops))
        t_first = time.perf_counter() - t_first0
        t, _ = timed(fn, *ops, reps=2, warmup=0)
        emit(metric=name, per_call_s=round(t / K, 4),
             chain_s=round(t, 3), compile_s=round(t_first - t, 1), **extra)
        return t / K

    def perturb_params(c):
        return jax.tree.map(lambda a: a + c.astype(a.dtype) * 1e-30, p)

    t_vg = t_v = t_gram = t_chol = t_trsm = None
    t_triinv = t_triinv_high = t_cinv = t_cinv_high = t_gramvjp = None

    # ---- reference: full value+grad ------------------------------------
    if "vg" in terms:
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
    if "value" in terms:
        def v_body(c):
            v = log_marginal_likelihood(perturb_params(c), data, cfg)
            return v * jnp.asarray(1e-30, dtype) + c

        t_v = bench("fwd_value_only", v_body)

    # ---- fwd terms ------------------------------------------------------
    if "gram" in terms:
        def gram_body(c):
            C = training_gram(data, perturb_params(c), cfg)
            return jnp.max(jnp.abs(C)) * jnp.asarray(1e-30, dtype) + c

        t_gram = bench("fwd_gram_build", gram_body)

    need_ops = terms & {"chol", "trsm", "triinv", "cinv", "gramvjp"}
    if need_ops:
        C0 = jax.jit(lambda pp: training_gram(data, pp, cfg))(p)
        sync(C0)
        L0 = jax.jit(linalg.xla_cholesky)(C0)
        sync(L0)
        H = training_basis(data, cfg)
        pdim = H.shape[1]

    if "chol" in terms:
        def chol_body(c, C):
            L = linalg.xla_cholesky(C * (jnp.asarray(1.0, dtype)
                                         + c * jnp.asarray(1e-30, dtype)))
            return jnp.max(jnp.abs(L)) * jnp.asarray(1e-30, dtype) + c

        t_chol = bench("fwd_cholesky_xla", chol_body, C0, p=pdim)

    if "trsm" in terms:
        def trsm_body(c, L):
            Lc = L * (jnp.asarray(1.0, dtype) + c * jnp.asarray(1e-30, dtype))
            Linv_H = linalg.solve_lower(Lc, H)
            Linv_y = linalg.solve_lower(Lc, y)
            return (jnp.max(jnp.abs(Linv_H)) + jnp.max(jnp.abs(Linv_y))) * \
                jnp.asarray(1e-30, dtype) + c

        t_trsm = bench("fwd_trsm_H_y", trsm_body, L0)

    # ---- bwd terms ------------------------------------------------------
    if "triinv" in terms:
        def triinv_body_at(prec):
            def body(c, L):
                # scale-perturb keeps L triangular with no n x n constant
                Lc = L * (jnp.asarray(1.0, dtype)
                          + c * jnp.asarray(1e-30, dtype))
                Linv = linalg.tri_inv_block(Lc, precision=prec)
                return jnp.max(jnp.abs(Linv)) * jnp.asarray(1e-30, dtype) + c
            return body

        t_triinv = bench("bwd_tri_inv_highest", triinv_body_at(hi_prec), L0)
        t_triinv_high = bench("bwd_tri_inv_high", triinv_body_at(high_prec),
                              L0)

    if terms & {"cinv", "gramvjp"}:
        Linv0 = jax.jit(
            lambda L: linalg.tri_inv_block(L, precision=hi_prec))(L0)
        sync(Linv0)

    if "cinv" in terms:
        def cinv_body_at(prec):
            def body(c, Li0):
                Li = Li0 + c * jnp.asarray(1e-30, dtype)
                Cinv = jnp.dot(Li.T, Li, preferred_element_type=dtype,
                               precision=prec)
                return jnp.max(jnp.abs(Cinv)) * jnp.asarray(1e-30, dtype) + c
            return body

        t_cinv = bench("bwd_cinv_gemm_highest", cinv_body_at(hi_prec), Linv0)
        t_cinv_high = bench("bwd_cinv_gemm_high", cinv_body_at(high_prec),
                            Linv0)

    if "gramvjp" in terms:
        # gram VJP contraction against a dense cotangent
        Mbar0 = jax.jit(
            lambda Li: -0.5 * jnp.dot(Li.T, Li, preferred_element_type=dtype,
                                      precision=hi_prec)
        )(Linv0)
        sync(Mbar0)

        def gramvjp_body(c, Mb):
            _, vjp = jax.vjp(lambda pp: training_gram(data, pp, cfg),
                             perturb_params(c))
            g = vjp(Mb)[0]
            return sum(jnp.sum(le) for le in jax.tree.leaves(g)) * \
                jnp.asarray(1e-30, dtype) + c

        t_gramvjp = bench("bwd_gram_vjp_contraction", gramvjp_body, Mbar0)

    parts = [t_gram, t_chol, t_trsm, t_triinv, t_cinv, t_gramvjp]
    if all(t is not None for t in parts + [t_vg, t_v]):
        known = sum(parts)
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
