"""Generate golden parity fixtures under tests/golden/.

Each golden case is a directory with:
    model.txt      — training data (io.modelfile format)
    state.txt      — trained snapshot (io.snapshot format)
    queries.txt    — m rows of d floats (raw, unscaled query points)
    expected.txt   — m rows of 2t floats: t means then t variances

The parity harness (tests/test_golden.py) is DATA-DRIVEN: it never imports
this generator. These fixtures are currently produced by our own f64 CPU
path (reference mount empty this round — SURVEY.md §0); once the reference
is available, regenerate state/expected files by running ITS
estimate_thetas/interactive_mode on the same model/queries files and the
harness becomes a true cross-implementation parity check at 1e-6 rtol
(BASELINE.json north-star).

Run: python tools/make_goldens.py
"""

import os
import pathlib
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from madaiemulator_tpu.io.modelfile import write_model_file
from madaiemulator_tpu.io.snapshot import write_snapshot
from madaiemulator_tpu.models.multivariate import fit_multivariate, predict_multivariate
from madaiemulator_tpu.utils.config import CovarianceFamily, GPConfig

GOLDEN_DIR = pathlib.Path(__file__).resolve().parent.parent / "tests" / "golden"


def make_case(name, X, Y, cfg, queries, pca_variance=0.99, seed=0):
    d = GOLDEN_DIR / name
    d.mkdir(parents=True, exist_ok=True)
    write_model_file(str(d / "model.txt"), X, Y)
    emu = fit_multivariate(
        jax.random.key(seed), jnp.asarray(X), jnp.asarray(Y), cfg,
        pca_variance=pca_variance,
    )
    write_snapshot(str(d / "state.txt"), emu)
    mean, var = predict_multivariate(emu, jnp.asarray(queries))
    with open(d / "queries.txt", "w") as f:
        for row in np.atleast_2d(queries):
            f.write(" ".join(f"{v:.17g}" for v in row) + "\n")
    with open(d / "expected.txt", "w") as f:
        for m, v in zip(np.asarray(mean), np.asarray(var)):
            f.write(" ".join(f"{x:.17g}" for x in list(m) + list(v)) + "\n")
    print(f"golden {name}: N={X.shape[0]} d={X.shape[1]} t={Y.shape[1]} "
          f"r={emu.n_components}")


def main():
    rng = np.random.default_rng(42)

    # case 1: 1D sin, power-exponential (BASELINE config 1)
    X = np.linspace(0.0, 1.0, 25)[:, None]
    Y = np.sin(2 * np.pi * X)
    make_case(
        "sin1d_powerexp",
        X, Y,
        GPConfig(nparams=1, regression_order=1, n_restarts=4, max_opt_steps=80),
        np.linspace(0.05, 0.95, 11)[:, None],
    )

    # case 2: 4D scalar, Matérn-3/2 (BASELINE config 2)
    X = rng.uniform(size=(50, 4))
    y = np.sin(3 * X[:, 0]) + X[:, 1] ** 2 - 0.5 * X[:, 2] * X[:, 3]
    make_case(
        "scalar4d_matern32",
        X, y[:, None],
        GPConfig(
            nparams=4, covariance=CovarianceFamily.MATERN32,
            regression_order=1, n_restarts=4, max_opt_steps=60,
        ),
        rng.uniform(0.1, 0.9, size=(8, 4)),
    )

    # case 2b: 3D scalar, ARD Matérn-5/2 (extension family; pins the
    # per-dimension theta layout through snapshot round-trips)
    X = rng.uniform(size=(40, 3))
    y = np.sin(4 * X[:, 0]) + 0.3 * X[:, 1] - X[:, 2] ** 2
    make_case(
        "scalar3d_matern52_ard",
        X, y[:, None],
        GPConfig(
            nparams=3, covariance=CovarianceFamily.MATERN52_ARD,
            regression_order=1, n_restarts=4, max_opt_steps=60,
        ),
        rng.uniform(0.1, 0.9, size=(8, 3)),
    )

    # case 3: multivariate PCA, order-2 regression (BASELINE config 3)
    X = rng.uniform(1.0, 2.0, size=(40, 3))
    latent = np.stack(
        [np.sin(2 * X[:, 0]) * X[:, 2], np.cos(X[:, 1]) + X[:, 0]], axis=1
    )
    Y = latent @ rng.standard_normal((2, 6)) + rng.uniform(3, 8, size=6)
    make_case(
        "multivar_pca",
        X, Y,
        GPConfig(nparams=3, regression_order=2, n_restarts=3, max_opt_steps=60),
        rng.uniform(1.1, 1.9, size=(6, 3)),
        pca_variance=0.999,
    )


if __name__ == "__main__":
    main()
