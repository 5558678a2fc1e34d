"""End-to-end emulation + calibration example (the reference's primary use
case: MADAI-style model calibration against multivariate observables).

1. "Run" an expensive simulator on a Latin-hypercube-ish design (toy here).
2. Fit a multivariate PCA emulator (vmapped per-component GPs).
3. Serve posterior predictions to a toy MCMC that calibrates the simulator
   parameters against a noisy "experimental" observation.

Run: python examples/calibrate_toy.py  (CPU f64 by default; works on TPU f32)
"""

import os
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

from madaiemulator_tpu import GPConfig, fit_multivariate, predict_multivariate

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

    # "experiment": simulator at hidden truth + noise
    theta_true = np.array([1.2, 0.7, 1.5])
    sigma_exp = 0.15
    y_exp = simulator(theta_true) + rng.normal(0, sigma_exp, size=Y.shape[1])

    # toy random-walk MCMC over the emulator (this is the pipe-protocol
    # consumer's role in the reference; here in-process and batched)
    def log_post(thetas):  # (m, d) batched
        mean, var = predict_multivariate(emu, jnp.asarray(thetas))
        resid = np.asarray(mean) - y_exp
        tot_var = np.asarray(var) + sigma_exp**2
        return -0.5 * np.sum(resid**2 / tot_var + np.log(tot_var), axis=-1)

    n_steps, n_chains = 800, 64
    # seed chains at the best design points (standard practice: the design
    # is the only prior knowledge of where the posterior mass lives)
    design_lp = log_post(X)
    best = np.argsort(design_lp)[-8:]
    theta = X[rng.choice(best, size=n_chains)] + rng.normal(0, 0.02, size=(n_chains, d))
    theta = np.clip(theta, 0.0, 2.0)
    lp = log_post(theta)
    accepts = 0
    for _ in range(n_steps):
        prop = theta + rng.normal(0, 0.03, size=theta.shape)
        prop = np.clip(prop, 0.0, 2.0)
        lp_prop = log_post(prop)
        u = rng.uniform(size=n_chains)
        take = np.log(u) < (lp_prop - lp)
        theta[take] = prop[take]
        lp[take] = lp_prop[take]
        accepts += take.mean()
    post_mean = theta.mean(axis=0)
    post_std = theta.std(axis=0)
    print(f"acceptance: {accepts/n_steps:.2f}")
    print(f"truth:          {theta_true}")
    print(f"posterior mean: {np.round(post_mean, 3)} +- {np.round(post_std, 3)}")
    err = np.abs(post_mean - theta_true)
    assert np.all(err < 5 * post_std + 0.2), (err, post_std)
    print("calibration recovered the truth within uncertainty")


if __name__ == "__main__":
    main()
