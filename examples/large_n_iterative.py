"""Large-N matrix-free GP emulation (the growth path past dense-HBM scale).

The dense path (left-looking blocked Cholesky) carries N=16k on one TPU
chip; past that, `models/iterative.py` keeps everything matrix-free: the
Gram matrix exists only as a row-chunked matvec, solves run through
preconditioned CG, and log|C| comes from stochastic Lanczos quadrature.
This example fits and serves an emulator at a size you pick (default 20k)
without ever allocating an N x N buffer.

Run: python examples/large_n_iterative.py [N]
  (CPU f64 by default for a quick small-N check; on TPU unset JAX_PLATFORMS
   guards and use N=32768+)
"""

import os
import sys
import time

import jax

# default to CPU (quick small-N demo); pass --tpu to run on the chip.
# NOTE the env var alone is not enough on axon-relay machines — the site
# hook pins the platform, so force it through the config API.
if "--tpu" in sys.argv:
    sys.argv.remove("--tpu")
else:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from madaiemulator_tpu import GPConfig, GPData
from madaiemulator_tpu.models.iterative import (
    fit_gp_iterative,
    predict_iterative,
)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    d = 4
    rng = np.random.default_rng(0)
    X = rng.uniform(size=(n, d)).astype(np.float32)
    y = (
        np.sin(3 * X[:, 0]) + X[:, 1] ** 2 + 0.3 * X[:, 2]
        + 0.05 * rng.standard_normal(n)
    ).astype(np.float32)

    cfg = GPConfig(nparams=d, regression_order=1, n_restarts=2, max_opt_steps=6)
    data = GPData(X=jnp.asarray(X), y=jnp.asarray(y))

    t0 = time.perf_counter()
    res = fit_gp_iterative(
        jax.random.key(0), data, cfg,
        rank=min(64, n), probes=8, lanczos_iters=min(24, n),
        cg_tol=1e-4, cg_max_iters=150,
    )
    print(f"fit N={n}: {time.perf_counter() - t0:.1f}s, "
          f"logL={float(res.log_likelihood):.1f}")

    Xs = jnp.asarray(rng.uniform(size=(256, d)).astype(np.float32))
    mean, var = predict_iterative(
        res.params, data, Xs, cfg, rank=min(64, n), query_chunk=256
    )
    Xs_np = np.asarray(Xs)
    truth = np.sin(3 * Xs_np[:, 0]) + Xs_np[:, 1] ** 2 + 0.3 * Xs_np[:, 2]
    rmse = float(np.sqrt(np.mean((np.asarray(mean) - truth) ** 2)))
    print(f"predict rmse vs truth: {rmse:.3e} (noise floor 0.05); "
          f"var range [{float(jnp.min(var)):.2e}, {float(jnp.max(var)):.2e}]")


if __name__ == "__main__":
    main()
