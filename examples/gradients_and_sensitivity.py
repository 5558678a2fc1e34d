"""Gradient-enhanced emulation + global sensitivity analysis, end to end.

Scenario: an adjoint-capable simulator returns (y, grad y) per run. Train
a joint value+gradient GP on few runs, serve values AND sensitivities with
uncertainty, then ask which inputs drive the output variance (Sobol
indices + main-effect curves) by Monte Carlo over the emulator.

Run: python examples/gradients_and_sensitivity.py   (CPU or TPU)
"""

import jax
import jax.numpy as jnp
import numpy as np

from madaiemulator_tpu import (
    GPConfig,
    GPData,
    fit_gp,
    gp_posterior,
    main_effects,
    precompute_predictor,
    predict_gradient,
    sobol_indices,
)
from madaiemulator_tpu.models.sensitivity import gp_mean_fn
from madaiemulator_tpu.utils.designs import latin_hypercube


def simulator(X):
    """Toy 'simulator' with an adjoint: f and df/dx per run."""

    def f(x):
        return jnp.sin(3.0 * x[0]) + 0.5 * x[1] ** 2

    return jax.vmap(f)(X), jax.vmap(jax.grad(f))(X)


def main():
    key = jax.random.PRNGKey(0)
    d = 2
    X = latin_hypercube(key, 10, d)  # 10 runs is enough WITH gradients
    y, dY = simulator(X)

    cfg = GPConfig(nparams=d, regression_order=0)
    data = GPData(X=X, y=y, dY=dY)
    res = fit_gp(jax.random.PRNGKey(1), data, cfg, n_restarts=8, max_steps=60)
    print(f"joint fit: lml={float(res.log_likelihood):.3f}")

    # value serving + accuracy vs truth
    Xs = latin_hypercube(jax.random.PRNGKey(2), 400, d)
    truth, _ = simulator(Xs)
    mean, var = gp_posterior(res.params, data, Xs, cfg)
    rmse = float(jnp.sqrt(jnp.mean((mean - truth) ** 2)))
    print(f"held-out rmse from 10 runs: {rmse:.2e} (var >= 0: "
          f"{bool(jnp.all(var >= 0))})")

    # sensitivity serving: df/dx with posterior uncertainty
    st = precompute_predictor(res.params, data, cfg)
    gmean, gvar = predict_gradient(st, res.params, data, Xs[:5], cfg)
    print("served gradients (mean +- sd) at 5 points:")
    for i in range(5):
        terms = ", ".join(
            f"d/dx{a}={float(gmean[i, a]):+.2f}+-{float(jnp.sqrt(gvar[i, a])):.2f}"
            for a in range(d)
        )
        print(f"  x={np.asarray(Xs[i]).round(2)}: {terms}")

    # which inputs matter: Sobol indices + main effects over the emulator
    fn = gp_mean_fn(res.params, data, cfg, state=st)
    sob = sobol_indices(fn, d, jax.random.PRNGKey(3), n=4096)
    print("Sobol first-order:", np.asarray(sob.first).round(3),
          " total:", np.asarray(sob.total).round(3))
    gv, eff = main_effects(fn, d, jax.random.PRNGKey(4), grid=5, n=2048)
    print("main effect of x0 over grid", np.asarray(gv).round(2), ":",
          np.asarray(eff[0]).round(2))


if __name__ == "__main__":
    main()
