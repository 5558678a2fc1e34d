"""One-chip N=1,000,000 training capability via SGPR (models/sparse.py).

The exact-GP one-chip envelope is N=65,536 end-to-end (dense; docs/ROUND3)
with 131k components proven matrix-free. SGPR's collapsed bound costs
O(N m^2) per ELBO evaluation with an (m, N) whitened cross-kernel as the
dominant live operand — at N=1e6, m=512 f32 that is 2 GB, so a single
16 GB v5e trains ONE MILLION points directly: 15x past the exact
envelope, with an O(m^2) serving distillate at the end.

Emits one JSON line per stage (same contract as capability_64k.py).
Run AFTER a relay health probe (ROADMAP protocol).

Usage:
  python bench/capability_1m.py [N] [m] [restarts] [steps]   # one config
  python bench/capability_1m.py sweep [N] [restarts] [steps] # m in
      {256, 512, 1024}: ELBO / fit wall / serve rmse convergence table
      (VERDICT r4 weak #5 — the 1M claim gets the same evidentiary
      standard as the 16k Cholesky). Data is generated once and shared.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf[(slice(0, 1),) * leaf.ndim]))


def make_problem(n, d, dtype):
    """Synthetic smooth target generated ON DEVICE (no 1M-point host
    transfer): anisotropic sines + an interaction, noise sigma=0.05."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def make_data(key):
        kx, ke = jax.random.split(key)
        X = jax.random.uniform(kx, (n, d), dtype=dtype)
        f = (
            jnp.sin(4.0 * X[:, 0])
            + 0.5 * jnp.cos(3.0 * X[:, 1])
            + X[:, 2] * X[:, 3]
        )
        y = f + 0.05 * jax.random.normal(ke, (n,), dtype=dtype)
        return X, y, f

    t0 = time.perf_counter()
    X, y, f_true = make_data(jax.random.key(0))
    sync(y)
    log(f"data on device: {time.perf_counter() - t0:.1f} s")
    return X, y, f_true


def run_one(n, m, restarts, steps, X, y):
    """Fit + serve one (n, m) configuration; returns the summary row."""
    import jax
    import jax.numpy as jnp

    from madaiemulator_tpu.models import sparse
    from madaiemulator_tpu.models.gp import GPData
    from madaiemulator_tpu.utils.config import GPConfig

    d = X.shape[1]
    dtype = X.dtype
    cfg = GPConfig(
        nparams=d, regression_order=1, n_restarts=restarts,
        max_opt_steps=steps, linesearch="backtracking",
    )
    data = GPData(X=X, y=y)

    # Host-loop fit (models/sparse.fit_sgpr_host -> models/fit.fit_gp_host):
    # only the streamed ELBO value+grad compiles — the whole-fit jit (an
    # LBFGS scan of scans) is a member of the axon worker's documented
    # whole-loop crash family (ROADMAP "environment issues"). vg_batch=1:
    # one restart's streamed live set (~O(m * 64k) with jax.checkpoint
    # remat per block) is the memory unit.
    t0 = time.perf_counter()
    fit = sparse.fit_sgpr_host(
        jax.random.key(1), data, cfg, inducing=m, row_chunk=65536,
        vg_batch=1,
    )
    sync(fit.state.c)
    t_fit = time.perf_counter() - t0
    elbo = float(fit.elbo)
    n_finite = int(np.isfinite(np.asarray(fit.restart_elbos)).sum())
    log(f"fit m={m}: {t_fit:.1f} s  elbo={elbo:.6g}  "
        f"({n_finite}/{restarts} restarts finite)")
    emit(
        metric=f"sgpr_fit_n{n}_m{m}",
        value=round(t_fit, 1), unit="s", elbo=round(elbo, 1),
        restarts_finite=n_finite, steps=steps, dtype="float32",
    )

    # serve: 4096 queries from the O(m^2) state, rmse vs the noiseless truth
    nq = 4096

    @jax.jit
    def queries(key):
        kq, _ = jax.random.split(key)
        Xq = jax.random.uniform(kq, (nq, d), dtype=dtype)
        fq = (
            jnp.sin(4.0 * Xq[:, 0])
            + 0.5 * jnp.cos(3.0 * Xq[:, 1])
            + Xq[:, 2] * Xq[:, 3]
        )
        return Xq, fq

    Xq, fq = queries(jax.random.key(7))
    serve = jax.jit(
        lambda q: sparse.predict_sgpr(fit.state, fit.params, cfg, q)
    )
    mq, vq = serve(Xq)
    sync(mq)  # compile + first run
    t0 = time.perf_counter()
    mq, vq = serve(Xq + 0.0)
    sync(mq)
    t_serve = time.perf_counter() - t0
    rmse = float(jnp.sqrt(jnp.mean((mq - fq) ** 2)))
    mean_sd = float(jnp.mean(jnp.sqrt(jnp.maximum(vq, 0.0))))
    log(f"serve {nq}: {t_serve*1e3:.1f} ms  rmse={rmse:.4g} "
        f"(noise floor 0.05/sqrt(density))  mean posterior sd={mean_sd:.4g}")
    emit(
        metric=f"sgpr_serve_n{n}_m{m}_q{nq}",
        value=round(nq / t_serve), unit="pts/s",
        wall_ms=round(t_serve * 1e3, 1), rmse=round(rmse, 5),
        mean_posterior_sd=round(mean_sd, 5),
    )
    return {
        "m": m, "fit_s": round(t_fit, 1), "elbo": round(elbo, 1),
        "serve_rmse": round(rmse, 5), "serve_ms": round(t_serve * 1e3, 1),
        "restarts_finite": n_finite,
    }


def main():
    import jax

    from madaiemulator_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    sweep = len(sys.argv) > 1 and sys.argv[1] == "sweep"
    if sweep:
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
        restarts = int(sys.argv[3]) if len(sys.argv) > 3 else 3
        steps = int(sys.argv[4]) if len(sys.argv) > 4 else 40
        ms = (256, 512, 1024)
    else:
        n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
        ms = (int(sys.argv[2]) if len(sys.argv) > 2 else 512,)
        restarts = int(sys.argv[3]) if len(sys.argv) > 3 else 3
        steps = int(sys.argv[4]) if len(sys.argv) > 4 else 40
    d = 4
    import jax.numpy as jnp

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}; "
        f"N={n} m={list(ms)} restarts={restarts} steps={steps} d={d}")

    # relay probe (ROADMAP protocol)
    t0 = time.perf_counter()
    x = jnp.ones((2048, 2048), jnp.float32)
    sync(jnp.dot(x, x))
    t_probe = time.perf_counter() - t0
    emit(metric="relay_probe_s", value=round(t_probe, 2),
         healthy=bool(t_probe < 10.0))

    X, y, _ = make_problem(n, d, jnp.float32)

    rows = [run_one(n, m, restarts, steps, X, y) for m in ms]
    if len(rows) > 1:
        emit(metric=f"sgpr_m_sweep_n{n}", rows=rows,
             note="ELBO should increase with m; rmse should converge")


if __name__ == "__main__":
    main()
