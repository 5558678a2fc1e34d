"""Calibration throughput at BASELINE config-3 scale (heavy-ion-style).

Measures the in-graph ensemble sampler (models/calibrate.py) over a trained
multivariate emulator: MCMC steps/s and emulator evaluations/s at
N=512/t=15/d=6, compile-included wall for a full calibrate() call, and the
dispatch-floor cost a pipe-architecture consumer (the reference's design)
would pay for the same chain. The log-posterior evaluation is r batched
cross-covariance GEMMs per step — MXU work, so walkers are nearly free up
to VMEM limits.

Run:  python bench/bench_calibrate.py [N] [t] [d] [n_walkers] [n_steps]
Prints one JSON line per phase.
"""

import json
import sys
import time

import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    t_out = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    n_walkers = int(sys.argv[4]) if len(sys.argv) > 4 else 128
    n_steps = int(sys.argv[5]) if len(sys.argv) > 5 else 2000

    import os

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_multivariate import make_heavy_ion_like
    from madaiemulator_tpu.models.calibrate import (
        calibrate,
        init_walkers,
        make_log_posterior,
        run_emcee,
    )
    from madaiemulator_tpu.models.multivariate import fit_multivariate
    from madaiemulator_tpu.utils.config import GPConfig
    from madaiemulator_tpu.utils.profiling import sync

    dev = jax.devices()[0]
    emit(device=f"{dev.platform} {getattr(dev, 'device_kind', '?')}",
         n=n, t=t_out, d=d, n_walkers=n_walkers, n_steps=n_steps)

    rng = np.random.default_rng(0)
    X, Y = make_heavy_ion_like(rng, n, d, t_out)
    dtype = jnp.float32
    cfg = GPConfig(nparams=d, regression_order=1, n_restarts=2,
                   max_opt_steps=30)
    emu = fit_multivariate(
        jax.random.key(0), jnp.asarray(X, dtype), jnp.asarray(Y, dtype),
        cfg, pca_variance=0.99,
    )
    sync(emu.params.log_amp)
    r = emu.n_components

    # synthetic experiment at a design point + noise
    y_exp = Y[7] + 0.05 * rng.standard_normal(t_out)
    exp_var = np.full(t_out, 0.05**2)

    # full driver, compile included (what a user pays once)
    t0 = time.perf_counter()
    res = calibrate(
        jax.random.key(1), emu, y_exp, exp_var,
        n_walkers=n_walkers, n_steps=n_steps,
    )
    t_total = time.perf_counter() - t0
    emit(metric=f"calibrate_total_w{n_walkers}_s{n_steps}",
         value=round(t_total, 2), unit="s", components=r,
         acceptance=round(res.acceptance, 3),
         max_rhat=round(float(res.rhat.max()), 3),
         min_ess=round(float(res.ess.min())),
         note="compile + run + diagnostics")

    # steady-state sampler throughput (compiled scan reused)
    lp = make_log_posterior(emu, y_exp, exp_var)
    x0 = init_walkers(jax.random.key(2), emu, lp, n_walkers)
    chain, _, _ = run_emcee(jax.random.key(3), lp, x0, n_steps)
    sync(chain)
    t0 = time.perf_counter()
    chain, _, _ = run_emcee(jax.random.key(4), lp, x0, n_steps)
    sync(chain)
    t_run = time.perf_counter() - t0
    emit(metric=f"mcmc_steps_per_s_w{n_walkers}",
         value=round(n_steps / t_run, 1), unit="steps/s",
         emulator_evals_per_s=round(n_steps * n_walkers / t_run),
         wall_s=round(t_run, 3))
    # the reference's architecture: >= 2 pipe round-trips per step
    # (propose-half A, propose-half B), each paying the dispatch floor
    floor_s = n_steps * 2 * 0.025
    emit(metric="pipe_architecture_floor_equivalent",
         value=round(floor_s, 1), unit="s",
         speedup=round(floor_s / t_run, 1),
         note="~25 ms/dispatch x 2 per step; emulator math excluded")


if __name__ == "__main__":
    main()
