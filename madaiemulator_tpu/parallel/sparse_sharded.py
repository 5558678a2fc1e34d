"""Mesh-sharded SGPR: the multi-chip growth path for the million-point fit.

The streamed summary algebra of models/sparse._sgpr_system is embarrassingly
data-parallel over the N axis: every summary (B - I = A A^T, A H_w, A y_w,
the H_w/y_w Grams, the trace terms) is a SUM over training rows, and the
inducing-side operands (Z, Lm) are tiny and replicated. Sharding X/y/noise
row-wise over a `jax.sharding.Mesh` therefore turns each summary GEMM into
a per-device partial + ONE psum-shaped collective that XLA inserts
automatically from the output sharding constraint (the scaling-book recipe:
annotate shardings, let GSPMD place the all-reduce on ICI). Everything
downstream of the summaries is O(m^2)/O(p^2) and replicated.

No manual collectives, no shard_map: `elbo_sharded` is
models/sparse.elbo evaluated on sharded operands with a replicated-output
constraint — bitwise-comparable to the single-device value up to reduction
order (pinned on the 8-virtual-device CPU mesh in tests/test_sparse.py).

Scaling shape: per-device FLOPs O((N/devices) m^2); the only cross-device
traffic is one (m, m) + (m, p) + (p, p) partial-sum reduction per ELBO
evaluation — a few MB at m = 512 — riding ICI once per optimizer step.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from madaiemulator_tpu.models.gp import GPData
from madaiemulator_tpu.models.sparse import elbo
from madaiemulator_tpu.ops.kernels import GPParams
from madaiemulator_tpu.utils.config import GPConfig

ROWS_AXIS = "rows"


def make_rows_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    return Mesh(devs[:n], (ROWS_AXIS,))


def shard_data_rows(data: GPData, mesh: Mesh) -> GPData:
    """Place the training rows row-sharded on the mesh (N must divide the
    device count; pad upstream with noise=inf rows if it does not —
    rsqrt(inf) = 0 rows are exact no-ops in every summary)."""
    row = NamedSharding(mesh, P(ROWS_AXIS))
    mat = NamedSharding(mesh, P(ROWS_AXIS, None))
    return GPData(
        X=jax.device_put(data.X, mat),
        y=jax.device_put(data.y, row),
        noise=None if data.noise is None else jax.device_put(data.noise, row),
        h_extra=None if data.h_extra is None
        else jax.device_put(data.h_extra, mat),
        dY=None if data.dY is None else jax.device_put(data.dY, mat),
        dY_noise=None if data.dY_noise is None
        else jax.device_put(data.dY_noise, mat),
    )


def elbo_sharded(
    params: GPParams,
    data: GPData,
    config: GPConfig,
    Z: jax.Array,
    mesh: Mesh,
) -> jax.Array:
    """Data-parallel SGPR ELBO over a row-sharded training set.

    jit-compiles the SAME math as models/sparse.elbo with GSPMD layout
    constraints: rows stay sharded, the scalar output is replicated, and
    the summary reductions become ICI collectives. Differentiable in
    (params, Z) like the single-device version (the backward pass reuses
    the same shardings). Use inside an optimizer exactly like `elbo`:
    the compiled program is cached per (config, mesh), so repeated eager
    calls do not re-trace.
    """
    data = shard_data_rows(data, mesh)
    rep = NamedSharding(mesh, P())
    Z = jax.device_put(Z, rep)
    return _elbo_jit(config, mesh)(params, data, Z)


@functools.lru_cache(maxsize=32)
def _elbo_jit(config: GPConfig, mesh: Mesh):
    """One compiled sharded ELBO per (config, mesh) — a fresh jit-wrapped
    lambda per call would re-trace the streamed-summary graph on EVERY
    eager invocation (jax.jit caches on function identity)."""
    rep = NamedSharding(mesh, P())
    return jax.jit(
        lambda p, d, z: jax.lax.with_sharding_constraint(
            elbo(p, d, config, z), rep
        )
    )
