"""BASELINE config 3: multivariate-output emulator (PCA + per-component GPs).

Heavy-ion-style problem shape (BASELINE.json configs[2]): t~15 correlated
observables over a d=6 design, N~512 training runs, retained rank r set by
--pca_variance. Measures fit wall-clock and serving throughput for the
dense and GEMM-only (fast) paths — the only BASELINE config that had no
recorded performance artifact through round 2 (VERDICT r2 missing #3).

Run:  python bench/bench_multivariate.py [N] [t] [d] [pca_variance]
Prints one JSON line per phase.
"""

import json
import sys
import time

import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


def make_heavy_ion_like(rng, n, d, t):
    """Correlated smooth observables: a few latent response surfaces mixed
    into t outputs (mimics flow harmonics / spectra sharing physics)."""
    X = rng.uniform(size=(n, d))
    k_lat = 4
    latents = np.stack(
        [
            np.sin(2.5 * X[:, i % d] + 0.7 * i) + (X[:, (i + 1) % d] - 0.4) ** 2
            for i in range(k_lat)
        ],
        axis=1,
    )  # (n, k)
    mix = rng.standard_normal((k_lat, t)) * np.geomspace(1.0, 0.2, k_lat)[:, None]
    Y = latents @ mix + 0.01 * rng.standard_normal((n, t))
    return X, Y


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    t_out = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    pca_variance = float(sys.argv[4]) if len(sys.argv) > 4 else 0.99

    import jax
    import jax.numpy as jnp

    from madaiemulator_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # same default as every CLI invocation

    from madaiemulator_tpu.models.multivariate import (
        fit_multivariate,
        precompute_fast_multivariate,
        predict_multivariate,
        predict_multivariate_fast,
    )
    from madaiemulator_tpu.utils.config import GPConfig
    from madaiemulator_tpu.utils.profiling import sync, timed

    dev = jax.devices()[0]
    emit(device=f"{dev.platform} {getattr(dev, 'device_kind', '?')}",
         n=n, t=t_out, d=d, pca_variance=pca_variance)

    rng = np.random.default_rng(0)
    X, Y = make_heavy_ion_like(rng, n, d, t_out)
    dtype = jnp.float32
    cfg = GPConfig(
        nparams=d, regression_order=1, n_restarts=4, max_opt_steps=40,
    )

    t0 = time.perf_counter()
    emu = fit_multivariate(
        jax.random.key(0), jnp.asarray(X, dtype), jnp.asarray(Y, dtype),
        cfg, pca_variance=pca_variance,
    )
    sync(emu.params.log_amp)
    t_fit = time.perf_counter() - t0
    r = emu.n_components
    emit(
        metric=f"multivariate_fit_wallclock_n{n}_t{t_out}",
        value=round(t_fit, 2), unit="s", retained_components=r,
        restarts=cfg.n_restarts, steps=cfg.max_opt_steps,
    )

    # training-point reconstruction quality (sanity: the emulator works)
    mean, _ = predict_multivariate(emu, jnp.asarray(X, dtype))
    rel = np.abs(np.asarray(mean) - Y) / np.abs(Y).mean(axis=0, keepdims=True)
    emit(metric="train_reconstruction_median_rel_err",
         value=float(np.median(rel)))

    # serving throughput: dense (TRSM) and fast (GEMM-only) paths, single
    # batch wall (incl. dispatch floor) + floor-amortized in-graph reps
    m = 2048
    Xq = jnp.asarray(rng.uniform(size=(m, d)), dtype)
    t_d, _ = timed(lambda q: predict_multivariate(emu, q), Xq)
    emit(metric=f"multivariate_predict_wall_m{m}", value=round(m / t_d),
         unit="pts/s", ms=round(t_d * 1e3, 2), components=r)

    fast = precompute_fast_multivariate(emu)
    t_f, _ = timed(lambda q: predict_multivariate_fast(emu, fast, q), Xq)
    emit(metric=f"multivariate_predict_fast_wall_m{m}", value=round(m / t_f),
         unit="pts/s", ms=round(t_f * 1e3, 2))

    R = 16

    def reps(q0):
        def body(c, _):
            mm, vv = predict_multivariate_fast(
                emu, fast, q0 + c * jnp.asarray(1e-12, dtype)
            )
            return jnp.sum(mm) + jnp.sum(vv), None

        return jax.lax.scan(body, jnp.asarray(0.0, dtype), None, length=R)[0]

    t_r, _ = timed(jax.jit(reps), Xq)
    emit(metric=f"multivariate_predict_fast_device_m{m}",
         value=round(m * R / t_r), unit="pts/s",
         note=f"x{R} in-graph, dispatch floor amortized")


if __name__ == "__main__":
    main()
