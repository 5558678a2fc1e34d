"""Design-matrix scaling helpers.

The reference scales the design to the unit hypercube before fitting (ref:
src/useful.c / model setup in src/modelstruct.c [U-med]; mount empty this
round — SURVEY.md §0). Scaling state (per-dimension min and range) is part of
the trained-emulator snapshot so queries are mapped identically at serve time.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class DesignScaling(NamedTuple):
    mins: jax.Array  # (d,)
    ranges: jax.Array  # (d,) max - min, floored at tiny to avoid 0-division


def fit_scaling(
    X: jax.Array, ranges: Optional[Tuple[jax.Array, jax.Array]] = None
) -> DesignScaling:
    """Scaling from data min/max, or from explicit (mins, maxs) param ranges."""
    if ranges is not None:
        mins, maxs = ranges
        mins = jnp.asarray(mins, dtype=X.dtype)
        maxs = jnp.asarray(maxs, dtype=X.dtype)
    else:
        mins = jnp.min(X, axis=0)
        maxs = jnp.max(X, axis=0)
    rng = jnp.maximum(maxs - mins, jnp.asarray(1e-300 if X.dtype == jnp.float64 else 1e-30, X.dtype))
    return DesignScaling(mins=mins, ranges=rng)


def apply_scaling(X: jax.Array, s: DesignScaling) -> jax.Array:
    return (X - s.mins[None, :]) / s.ranges[None, :]


def unapply_scaling(Xs: jax.Array, s: DesignScaling) -> jax.Array:
    return Xs * s.ranges[None, :] + s.mins[None, :]


def latin_hypercube(
    key: jax.Array, n: int, d: int, dtype=jnp.float64
) -> jax.Array:
    """Latin hypercube sample on [0,1]^d: one point per axis-stratum,
    independently permuted per dimension (the standard space-filling design
    generator for emulator training runs)."""
    k_perm, k_u = jax.random.split(key)
    perms = jax.vmap(
        lambda k: jax.random.permutation(k, n)
    )(jax.random.split(k_perm, d))  # (d, n)
    u = jax.random.uniform(k_u, (d, n), dtype=dtype)
    pts = (perms.astype(dtype) + u) / n
    return pts.T  # (n, d)
