"""BASELINE config 5: vmapped GP ensemble — thousands of independent
emulators fit in parallel for MCMC calibration.

The reference fits one emulator per process invocation; here E emulators x R
restarts are one device program (sharded over a mesh when more chips exist).

Run: python bench/bench_ensemble.py [E] [N] [steps] [restarts] [chunk]
"""

import json
import sys
import time

import numpy as np


def main():
    E = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    restarts = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    # Cap concurrent optimizer cells at 2048: a 4096-cell program
    # (E=2048 x R=2 unchunked) crashed the TPU worker in the round-5
    # retest — the envelope tightened from round 2 (ROADMAP.md); chunking
    # the ensemble axis is the documented workaround.
    if len(sys.argv) > 5:
        chunk = int(sys.argv[5]) or None
    else:
        chunk = max(1, 2048 // restarts) if E * restarts > 2048 else None
        if chunk is not None and E % chunk != 0:
            # largest divisor of E not exceeding the cap (a power-of-two
            # round-down is NOT a divisor when E isn't a power of two)
            chunk = max(c for c in range(1, chunk + 1) if E % c == 0)

    import jax
    import jax.numpy as jnp

    from madaiemulator_tpu.parallel.ensemble import fit_ensemble, predict_ensemble
    from madaiemulator_tpu.utils.config import GPConfig
    from madaiemulator_tpu.utils.profiling import sync

    d = 4
    rng = np.random.default_rng(0)
    Xb = jnp.asarray(rng.uniform(size=(E, n, d)), jnp.float32)
    freqs = rng.uniform(1.0, 4.0, size=(E, 1)).astype(np.float32)
    yb = jnp.asarray(
        np.sin(freqs * np.asarray(Xb)[..., 0]) + np.asarray(Xb)[..., 1] ** 2,
        jnp.float32,
    )
    cfg = GPConfig(nparams=d, regression_order=1, n_restarts=restarts, max_opt_steps=steps)

    # R > 2 per program reproducibly crashes the TPU worker (vmapped zoom
    # linesearch; ROADMAP.md) — split the restart axis into stable R<=2
    # programs merged by argmax (mathematically identical).
    rsplit = 2 if restarts > 2 else None
    t0 = time.perf_counter()
    res = fit_ensemble(jax.random.key(0), Xb, yb, cfg, ensemble_chunk=chunk,
                       restart_split=rsplit)
    sync(res.log_likelihood)
    t_fit = time.perf_counter() - t0
    lls = np.asarray(res.log_likelihood)
    print(
        json.dumps(
            {
                "metric": "ensemble_fit_rate",
                "value": round(E / t_fit, 1),
                "unit": "emulators/s",
                "E": E,
                "N": n,
                "restarts": restarts,
                "steps": steps,
                "ensemble_chunk": chunk,
                "restart_split": rsplit,
                "wallclock_s": round(t_fit, 2),
                "finite_fraction": float(np.isfinite(lls).mean()),
            }
        ),
        flush=True,
    )

    m = 256
    Xsb = jnp.asarray(rng.uniform(size=(E, m, d)), jnp.float32)
    t0 = time.perf_counter()
    means, variances = predict_ensemble(res.params, Xb, yb, Xsb, cfg)
    sync(means)
    t_pred = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "ensemble_predict_rate",
                "value": round(E * m / t_pred),
                "unit": "pts/s",
                "wallclock_s": round(t_pred, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
