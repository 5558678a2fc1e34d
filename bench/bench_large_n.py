"""BASELINE config 4: fit + predict a GP at N=16k training points on one chip.

The reference cannot practically run this (serial GSL: each finite-difference
gradient costs (ntheta+1) x O(N^3) on one core — hours per optimizer step at
N=16k). Here: exact-gradient LBFGS with the blocked MXU Cholesky, restarts
chunked to bound HBM.

Run:  python bench/bench_large_n.py [N] [steps] [restarts]
Prints a JSON line per phase to stdout.
"""

import json
import sys
import time

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    restarts = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    method = sys.argv[4] if len(sys.argv) > 4 else "xla"  # blocked OOMs the compiler inside the linesearch at 16k
    linesearch = sys.argv[5] if len(sys.argv) > 5 else "backtracking"  # zoom's graph SIGSEGVs the remote compiler at 16k

    import jax
    import jax.numpy as jnp

    from madaiemulator_tpu.models.fit import fit_gp, fit_gp_host
    from madaiemulator_tpu.models.gp import (
        GPData,
        precompute_predictor_safe,
        predict_from_precomputed,
    )
    from madaiemulator_tpu.utils.config import GPConfig
    from madaiemulator_tpu.utils.profiling import sync, timed

    d = 8
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    y = jnp.asarray(
        np.sin(3 * np.asarray(X[:, 0])) + np.asarray(X[:, 1]) ** 2, jnp.float32
    )
    cfg = GPConfig(
        nparams=d,
        regression_order=1,
        n_restarts=restarts,
        max_opt_steps=steps,
        cholesky_method=method,
        cholesky_block=512,
        linesearch=linesearch,
        predict_query_chunk=1024 if n > 8192 else None,
    )
    data = GPData(X=X, y=y)

    t0 = time.perf_counter()
    if n > 8192:
        # whole-loop fit graphs above ~8k crash this environment's TPU
        # compile helper; the host-loop driver compiles only value+grad
        res = fit_gp_host(jax.random.key(0), data, cfg)
    else:
        res = fit_gp(jax.random.key(0), data, cfg, restart_chunk=1)
    sync(res.log_likelihood)
    t_fit = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": f"fit_wallclock_n{n}",
                "value": round(t_fit, 2),
                "unit": "s",
                "logL": float(res.log_likelihood),
                "steps": steps,
                "restarts": restarts,
            }
        ),
        flush=True,
    )

    st = precompute_predictor_safe(res.params, data, cfg)
    sync(st)
    m = 8192
    Xs = jnp.asarray(rng.uniform(size=(m, d)), jnp.float32)
    pred = jax.jit(
        lambda s, p, q: predict_from_precomputed(s, p, data, q, cfg)
    )
    t_pred, out = timed(pred, st, res.params, Xs)
    print(
        json.dumps(
            {
                "metric": f"predict_throughput_n{n}",
                "value": round(m / t_pred),
                "unit": "pts/s",
                "batch": m,
                "ms": round(t_pred * 1e3, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
