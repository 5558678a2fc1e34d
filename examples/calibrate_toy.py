"""End-to-end emulation + calibration example (the reference's primary use
case: MADAI-style model calibration against multivariate observables).

1. "Run" an expensive simulator on a Latin-hypercube-ish design (toy here).
2. Validate the emulator with closed-form leave-one-out diagnostics.
3. Calibrate the simulator parameters against a noisy "experimental"
   observation with the in-graph ensemble sampler (models/calibrate.py) —
   the whole MCMC (likelihood, emulator predict, proposals) is ONE compiled
   device program, replacing the reference's stdin/stdout pipe to an
   external C MCMC framework.

Run: python examples/calibrate_toy.py  (CPU f64 by default; --tpu for chip)
"""

import sys

import jax

# default to CPU f64 (the example's parity-grade mode); pass --tpu to run
# on the chip. NOTE the env var alone is not enough on axon-relay machines —
# the site hook pins the platform, so force it through the config API.
if "--tpu" in sys.argv:
    sys.argv.remove("--tpu")
else:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import logging

import jax.numpy as jnp
import numpy as np

from madaiemulator_tpu import (
    GPConfig,
    calibrate,
    fit_multivariate,
    implausibility,
    loo_summary_multivariate,
)
from madaiemulator_tpu.utils.designs import apply_scaling

logging.basicConfig(level=logging.INFO, format="%(message)s")


def simulator(theta):
    """Toy 'heavy-ion model': 3 parameters -> 6 observables."""
    a, b, c = theta[..., 0], theta[..., 1], theta[..., 2]
    obs = [
        a * np.sin(2 * b) + c,
        a**2 + 0.5 * c,
        np.cos(b) * (1 + a),
        a * b * c,
        np.exp(-a) + b,
        0.3 * a + 0.7 * b - 0.2 * c,
    ]
    return np.stack(obs, axis=-1)


def main():
    rng = np.random.default_rng(0)
    # design + training runs
    n_design, d = 80, 3
    X = rng.uniform(0.0, 2.0, size=(n_design, d))
    Y = simulator(X)

    # fit the emulator
    cfg = GPConfig(nparams=d, regression_order=1, n_restarts=4, max_opt_steps=60)
    emu = fit_multivariate(
        jax.random.key(0), jnp.asarray(X), jnp.asarray(Y), cfg, pca_variance=0.99
    )
    print(f"emulator: {emu.n_components} PCs for {Y.shape[1]} observables")

    # validate before trusting it (the reference had no tooling for this)
    val = loo_summary_multivariate(emu)
    print(
        f"LOO validation: rmse {val['rmse']:.4f}, "
        f"coverage {val['coverage']:.2f} (target {val['coverage_target']})"
    )

    # "experiment": simulator at hidden truth + noise
    theta_true = np.array([1.2, 0.7, 1.5])
    sigma_exp = 0.15
    y_exp = simulator(theta_true) + rng.normal(0, sigma_exp, size=Y.shape[1])
    exp_var = np.full(Y.shape[1], sigma_exp**2)

    # history matching first: how much of the design box is ruled out?
    grid = rng.uniform(0.0, 2.0, size=(4096, d))
    I = np.asarray(
        implausibility(
            emu, y_exp, exp_var,
            apply_scaling(jnp.asarray(grid, dtype=emu.X.dtype), emu.scaling),
        )
    )
    print(f"history matching: {100 * (I <= 3).mean():.1f}% of the box is NROY")

    # full-Bayes calibration: in-graph affine-invariant ensemble sampler
    res = calibrate(
        jax.random.key(1), emu, y_exp, exp_var,
        n_walkers=64, n_steps=1500, burn_in=500,
    )
    s = res.summary()
    print(f"acceptance: {res.acceptance:.2f}  max R-hat: {res.rhat.max():.3f}")
    print(f"truth:          {theta_true}")
    print(
        f"posterior mean: {np.round(s['mean'], 3)} +- {np.round(s['std'], 3)}"
    )
    err = np.abs(s["mean"] - theta_true)
    assert np.all(err < 5 * s["std"] + 0.2), (err, s["std"])
    print("calibration recovered the truth within uncertainty")


if __name__ == "__main__":
    main()
