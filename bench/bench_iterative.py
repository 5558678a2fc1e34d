"""Matrix-free (iterative) path benchmarks: the beyond-dense-HBM story.

Run: python bench/bench_iterative.py [N] [d] [probes]
Prints a JSON line per phase: batched kernel matvec rate, preconditioned
solve, and one lml value+grad evaluation (the fit-step unit cost).
"""

import json
import sys
import time

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    probes = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import jax
    import jax.numpy as jnp

    from madaiemulator_tpu.models import iterative
    from madaiemulator_tpu.models.gp import GPData
    from madaiemulator_tpu.ops.kernels import GPParams
    from madaiemulator_tpu.utils.config import GPConfig
    from madaiemulator_tpu.utils.profiling import sync

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    y = jnp.asarray(
        np.sin(3 * np.asarray(X)[:, 0]) + 0.05 * rng.standard_normal(n),
        jnp.float32,
    )
    cfg = GPConfig(nparams=d, regression_order=1)
    data = GPData(X, y)
    # representative FITTED-model hyperparameters: enough noise floor that
    # the rank-64 preconditioned system converges (a 1e-2 nugget with
    # ls=0.4 at N=32k is genuinely beyond rank-64 preconditioning — the
    # library correctly walls that region with -inf during fits)
    p = GPParams(
        log_amp=jnp.asarray(0.0, jnp.float32),
        log_nugget=jnp.asarray(np.log(0.1), jnp.float32),
        log_ls=jnp.full((d,), np.log(0.35), jnp.float32),
    )

    def timed(fn, *args, reps=3):
        out = fn(*args)
        sync(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            sync(out)
            best = min(best, time.perf_counter() - t0)
        return best, out

    # 1. batched kernel matvec (the inner loop of everything)
    m_rhs = 16
    V = jnp.asarray(rng.standard_normal((n, m_rhs)), jnp.float32)
    mv = jax.jit(lambda v: iterative.gram_matvec(X, p, cfg, v))
    t_mv, _ = timed(mv, V)
    # flops: kernel tile build ~ n^2*d MACs + product n^2*m
    flops = 2.0 * n * n * (d + m_rhs)
    print(json.dumps({
        "metric": "iterative_matvec",
        "value": round(t_mv * 1e3, 2), "unit": "ms",
        "N": n, "rhs": m_rhs,
        "effective_tflops": round(flops / t_mv / 1e12, 2),
    }), flush=True)

    # 2. preconditioned solve of [y | H] to 1e-5
    solve = jax.jit(
        lambda: iterative._solve_C(
            p, data, cfg, 64, (1e-5, 200),
            jnp.concatenate([y[:, None]], axis=1),
        )
    )
    t_solve, (S, rel, iters) = timed(lambda: solve())
    print(json.dumps({
        "metric": "iterative_pcg_solve",
        "value": round(t_solve, 3), "unit": "s",
        "N": n, "rank": 64,
        "cg_iters": int(jax.device_get(iters)),
        "rel_residual": float(jax.device_get(jnp.max(rel))),
    }), flush=True)

    # 3. one lml value+grad (the fit-step unit), slq and mbcg
    for method in ("slq", "mbcg"):
        vg = jax.jit(jax.value_and_grad(
            lambda pp: iterative.lml_iterative(
                pp, data, cfg, seed=0, rank=64, probes=probes,
                lanczos_iters=20, cg_tol=1e-4, cg_max_iters=120,
                logdet_method=method,
            )
        ))
        t_vg, (val, g) = timed(vg, p)
        print(json.dumps({
            "metric": f"iterative_lml_value_and_grad_{method}",
            "value": round(t_vg, 3), "unit": "s",
            "N": n, "probes": probes,
            "ll": round(float(jax.device_get(val)), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
