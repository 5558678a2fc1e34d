"""Full matrix-free workflow capability run at N=32,768 (one TPU chip).

Every stage of the MADAI workflow — fit, validation, sequential design,
Bayesian calibration, joint posterior draws — executed against a single
emulator whose dense representation cannot exist on the chip
(r * N^2 f32 Gram storage alone = 12 GB at r=3): the per-stage numbers
are the proof that the workflow layer genuinely runs matrix-free, not
just the serving path.

Usage: python bench/bench_workflow_32k.py [N] [state.npz] (default
32768). When a state path is given, the fitted emulator is cached there:
an existing file skips the (long) fit stage so interrupted capability
runs resume at the workflow stages. Emits one timing line per stage to
stderr and a final JSON summary line to stdout.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def lg(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import madaiemulator_tpu as mt
    from madaiemulator_tpu.models.calibrate import calibrate
    from madaiemulator_tpu.models.design import nroy_wave_design
    from madaiemulator_tpu.models.diagnostics import (
        holdout_summary_multivariate,
        sample_multivariate_posterior_iterative,
    )
    from madaiemulator_tpu.models.multivariate import (
        fit_multivariate_iterative,
        precompute_iterative_multivariate,
    )

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    d, t = 4, 3
    noise = 0.05
    rng = np.random.default_rng(0)
    X = rng.uniform(0.0, 1.0, size=(N, d)).astype(np.float32)

    def simulator(x):
        a, b, c, e = (x[..., i] for i in range(4))
        return np.stack(
            [
                np.sin(3 * a) * np.cos(2 * b) + 0.5 * c,
                a + b**2 - 0.3 * np.exp(-e),
                np.cos(a * b * 2) + 0.2 * (c - e),
            ],
            axis=-1,
        )

    Y = (simulator(X) + noise * rng.standard_normal((N, t))).astype(
        np.float32
    )
    stages = {}
    t0 = time.time()

    import os

    state_path = sys.argv[2] if len(sys.argv) > 2 else None
    if state_path and os.path.exists(state_path):
        from madaiemulator_tpu.io.snapshot import read_snapshot_npz

        emu, _, _ = read_snapshot_npz(
            state_path, dtype=jnp.float32, build_states=False
        )
        stages["fit_s"] = 0.0
        lg(f"fit: reused cached snapshot {state_path} "
           f"(r={emu.n_components})")
    else:
        # 40 steps x 2 restarts: at 15 steps x 1 restart two of three
        # components never left their initialization (measured at N=4096:
        # truth-rmse 0.048 -> 0.0045 going to this budget)
        cfg = mt.GPConfig(
            nparams=d, regression_order=1, n_restarts=2, max_opt_steps=40,
            linesearch="backtracking",
        )
        emu = fit_multivariate_iterative(
            jax.random.key(0), jnp.asarray(X), jnp.asarray(Y), cfg,
            pca_variance=0.99, rank=64, probes=8, lanczos_iters=32,
            cg_tol=1e-4, cg_max_iters=128, logdet_method="mbcg", vg_batch=1,
            value_linesearch=True,
            checkpoint_path=(state_path + ".fit.ckpt") if state_path else None,
        )
        stages["fit_s"] = round(time.time() - t0, 1)
        lg(f"fit: r={emu.n_components} components in {stages['fit_s']}s")
        if state_path:
            from madaiemulator_tpu.io.snapshot import write_snapshot_npz

            write_snapshot_npz(state_path, emu)
            lg(f"fit snapshot cached at {state_path}")

    t1 = time.time()
    states = precompute_iterative_multivariate(
        emu, rank=64, cg_tol=1e-5, cg_max_iters=192
    )
    for st in states:
        np.asarray(jax.device_get(st.alpha[0:1]))
    stages["serving_cache_s"] = round(time.time() - t1, 1)
    lg(f"serving cache: {stages['serving_cache_s']}s")

    t2 = time.time()
    s = holdout_summary_multivariate(
        emu, jax.random.key(1), 512, rank=64, cg_tol=1e-5, cg_max_iters=192
    )
    s_truth = holdout_summary_multivariate(
        emu, jax.random.key(1), 512, Y_true=jnp.asarray(simulator(X)),
        rank=64, cg_tol=1e-5, cg_max_iters=192,
    )
    stages["validate_s"] = round(time.time() - t2, 1)
    stages["holdout_rmse_noisy"] = round(s["rmse"], 4)
    stages["holdout_rmse_truth"] = round(s_truth["rmse"], 4)
    stages["holdout_coverage"] = round(s["coverage"], 3)
    lg(
        f"validate (512-pt holdout): rmse={s['rmse']:.4f} vs noisy targets "
        f"(floor {noise}), {s_truth['rmse']:.4f} vs truth; "
        f"coverage={s['coverage']:.2f} in {stages['validate_s']}s"
    )

    theta_true = np.array([0.62, 0.41, 0.55, 0.33], dtype=np.float32)
    y_exp = simulator(theta_true)
    exp_var = np.full(t, noise**2)

    t3 = time.time()
    wave = nroy_wave_design(
        jax.random.key(2), emu, y_exp, exp_var, n_new=16, pool_size=4096,
        states=states,
    )
    stages["design_s"] = round(time.time() - t3, 1)
    stages["nroy_fraction"] = round(wave.pool_fraction_viable, 4)
    lg(
        f"design (NROY wave, 4096-pool): {100*wave.pool_fraction_viable:.1f}%"
        f" viable, 16 points in {stages['design_s']}s"
    )

    t4 = time.time()
    res = calibrate(
        jax.random.key(3), emu, y_exp, exp_var, n_walkers=64,
        n_steps=1000, burn_in=300, states=states,
    )
    stages["calibrate_s"] = round(time.time() - t4, 1)
    summ = res.summary()
    err = np.abs(summ["mean"] - theta_true)
    stages["calib_max_err_sigma"] = round(
        float(np.max(err / np.maximum(summ["std"], 1e-9))), 2
    )
    lg(
        f"calibrate (1000x64): {stages['calibrate_s']}s  "
        f"max |err|/sigma = {stages['calib_max_err_sigma']}"
    )

    t5 = time.time()
    draws = sample_multivariate_posterior_iterative(
        emu, states, jnp.asarray(rng.uniform(0.1, 0.9, (64, d)), jnp.float32),
        jax.random.key(4), 256, col_chunk=64,
    )
    np.asarray(jax.device_get(draws[0:1, 0:1, 0:1]))
    stages["joint_draws_s"] = round(time.time() - t5, 1)
    lg(f"joint draws (256 x 64 pts x {t} obs): {stages['joint_draws_s']}s")

    stages["total_s"] = round(time.time() - t0, 1)
    print(json.dumps({"workflow_n": N, **stages}))


if __name__ == "__main__":
    main()
