"""The complete MADAI-style workflow in one script, entirely in-process.

The reference spreads this loop across four tools (estimate binary → text
snapshot → pipe server → external MCMC → hand-chosen follow-up runs); here
every stage is a library call and the hot parts are compiled device
programs:

    1. space-filling design + simulator runs        (utils/designs)
    2. fit a multivariate emulator                  (models/multivariate)
    3. validate it (closed-form LOO)                (models/diagnostics)
    4. history-match: NROY wave of new runs         (models/design)
    5. refit on the augmented design
    6. full-Bayes calibration MCMC                  (models/calibrate)

Runs in ~2-4 min: `--dtype=float64` (default) forces the CPU backend for
reference-grade numerics, `--dtype=float32` keeps whatever accelerator is
configured — the same convention as the CLI.
"""

import argparse

import jax

_args = argparse.ArgumentParser()
_args.add_argument("--dtype", choices=["float64", "float32"],
                   default="float64")
DTYPE = _args.parse_args().dtype
if DTYPE == "float64":
    # the site hook may pin an accelerator platform; the config API wins
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import madaiemulator_tpu as mt
from madaiemulator_tpu.models.calibrate import calibrate
from madaiemulator_tpu.models.design import nroy_wave_design
from madaiemulator_tpu.models.diagnostics import loo_summary_multivariate
from madaiemulator_tpu.models.multivariate import fit_multivariate
from madaiemulator_tpu.utils.designs import latin_hypercube


def simulator(theta):
    """Stand-in for an expensive simulation: 2 inputs -> 3 observables."""
    a, b = theta[..., 0], theta[..., 1]
    return np.stack(
        [a * np.sin(2 * b), a + b, np.cos(b) * (1 + 0.5 * a)], axis=-1
    )


def main():
    rng = np.random.default_rng(0)
    theta_true = np.array([1.2, 0.7])
    noise = 0.03

    # -- 1. initial space-filling design ---------------------------------
    lo, hi = np.zeros(2), np.array([2.0, 2.0])
    X = np.asarray(latin_hypercube(jax.random.key(0), 30, 2)) * (hi - lo) + lo
    Y = simulator(X) + noise * rng.standard_normal((30, 3))

    # -- 2. fit -----------------------------------------------------------
    cfg = mt.GPConfig(
        nparams=2, regression_order=1, n_restarts=4, max_opt_steps=40
    )
    emu = fit_multivariate(
        jax.random.key(1), jnp.asarray(X), jnp.asarray(Y), cfg,
        pca_variance=0.999, param_ranges=(lo, hi),
    )
    print(f"fit wave 0: N={X.shape[0]}, r={emu.n_components} components")

    # -- 3. validate ------------------------------------------------------
    s = loo_summary_multivariate(emu)
    print(
        f"LOO: rmse={s['rmse']:.2e}  coverage={s['coverage']:.2f} "
        f"(target {s['coverage_target']:.2f})"
    )

    # -- 4. history-match: one NROY wave of new simulator runs -----------
    y_exp = simulator(theta_true) + noise * rng.standard_normal(3)
    exp_var = np.full(3, noise**2)
    wave = nroy_wave_design(
        jax.random.key(2), emu, y_exp, exp_var, n_new=10, pool_size=4096
    )
    print(
        f"NROY wave: {100 * wave.pool_fraction_viable:.1f}% of parameter "
        f"space not ruled out; running {wave.points.shape[0]} new points"
    )

    # -- 5. refit on the augmented design ---------------------------------
    X2 = np.concatenate([X, wave.points], axis=0)
    Y2 = np.concatenate(
        [Y, simulator(wave.points)
         + noise * rng.standard_normal((wave.points.shape[0], 3))], axis=0
    )
    emu2 = fit_multivariate(
        jax.random.key(3), jnp.asarray(X2), jnp.asarray(Y2), cfg,
        pca_variance=0.999, param_ranges=(lo, hi),
    )
    s2 = loo_summary_multivariate(emu2)
    print(f"fit wave 1: N={X2.shape[0]}  LOO rmse={s2['rmse']:.2e}")

    # -- 6. calibrate ------------------------------------------------------
    res = calibrate(
        jax.random.key(4), emu2, y_exp, exp_var,
        n_walkers=32, n_steps=1500, burn_in=500,
    )
    summ = res.summary()
    print(f"truth:     {theta_true}")
    print(f"posterior: {summ['mean']} +- {summ['std']}")
    print(f"90% CI:    [{summ['q05']}, {summ['q95']}]")
    print(f"rhat:      {res.rhat}  (acceptance {res.acceptance:.2f})")
    err = np.abs(summ["mean"] - theta_true)
    assert np.all(err < 4 * summ["std"] + 0.05), (err, summ["std"])
    print("calibration recovered the truth within its posterior spread")


if __name__ == "__main__":
    main()
