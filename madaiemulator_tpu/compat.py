"""Array-in/array-out convenience API mirroring the reference's R bindings.

The reference exposes `.C()`-callable wrappers so R users can estimate and
query emulators with plain arrays (ref: src/libRbind/rbind.c —
callEstimate / callEmulateAtList, plus EmuRbind.R; mount empty this round,
SURVEY.md §0). The TPU-native equivalent is this module: the same
"flat arrays + options in, flat arrays out" contract, callable from any
Python FFI consumer (and from R via reticulate), with the heavy lifting on
the library's jitted paths.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from madaiemulator_tpu.models.fit import fit_gp
from madaiemulator_tpu.models.gp import GPData, gp_posterior
from madaiemulator_tpu.ops.kernels import params_to_thetas, thetas_to_params
from madaiemulator_tpu.utils.config import COVARIANCE_CLI_NAMES, GPConfig
from madaiemulator_tpu.utils.designs import apply_scaling, fit_scaling


def _config(
    nparams: int, covariance: str, regression_order: int, **kw
) -> GPConfig:
    return GPConfig(
        nparams=nparams,
        covariance=COVARIANCE_CLI_NAMES[covariance],
        regression_order=regression_order,
        **kw,
    )


def _default_dtype(dtype):
    """f64 when x64 is live; otherwise f32 EXPLICITLY (requesting f64 without
    x64 silently truncates and, on TPU, degrades fits — observed: thetas
    pinned at box bounds)."""
    if dtype is not None:
        return dtype
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def call_estimate(
    design,
    y,
    covariance: str = "power_exponential",
    regression_order: int = 1,
    n_restarts: int = 8,
    max_steps: int = 100,
    seed: int = 0,
    dtype=None,
) -> np.ndarray:
    """Estimate hyperparameters for one scalar output; returns the natural
    theta vector [amp, nugget, length_scales...] (callEstimate equivalent).

    The design is scaled internally to [0,1]^d like the reference; thetas
    refer to the scaled design.
    """
    X = np.asarray(design, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64).ravel()
    if X.ndim != 2 or X.shape[0] != y.shape[0]:
        raise ValueError(f"design {X.shape} vs y {y.shape}")
    cfg = _config(
        X.shape[1], covariance, regression_order,
        n_restarts=n_restarts, max_opt_steps=max_steps,
    )
    dtype = _default_dtype(dtype)
    scaling = fit_scaling(jnp.asarray(X, dtype=dtype))
    Xs = apply_scaling(jnp.asarray(X, dtype=dtype), scaling)
    res = fit_gp(
        jax.random.key(seed), GPData(X=Xs, y=jnp.asarray(y, dtype=dtype)), cfg
    )
    return np.asarray(params_to_thetas(res.params))


def call_emulate_at_list(
    design,
    y,
    thetas,
    points,
    covariance: str = "power_exponential",
    regression_order: int = 1,
    dtype=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Posterior (means, variances) at a list of points given fitted thetas
    (callEmulateAtList equivalent)."""
    X = np.asarray(design, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64).ravel()
    pts = np.atleast_2d(np.asarray(points, dtype=np.float64))
    cfg = _config(X.shape[1], covariance, regression_order)
    dtype = _default_dtype(dtype)
    scaling = fit_scaling(jnp.asarray(X, dtype=dtype))
    Xs = apply_scaling(jnp.asarray(X, dtype=dtype), scaling)
    Ps = apply_scaling(jnp.asarray(pts, dtype=dtype), scaling)
    params = thetas_to_params(jnp.asarray(thetas, dtype=dtype))
    mean, var = gp_posterior(
        params, GPData(X=Xs, y=jnp.asarray(y, dtype=dtype)), Ps, cfg
    )
    return np.asarray(mean), np.asarray(var)
