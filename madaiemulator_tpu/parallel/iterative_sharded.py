"""Mesh-sharded matrix-free GP inference: the multi-chip large-N growth path.

SURVEY.md §5 names JAX collectives over ICI as the scaling story this
workload earns only at large N; this module is that story for the
matrix-free path (models/iterative.py). The training rows shard over a
1-D device mesh: each device builds only its own row block of the kernel
matvec C @ V (row-chunked, so per-device memory stays O(chunk * N)), and
XLA's sharding propagation inserts the gathers where the CG vector algebra
needs global views. PCG, SLQ logdet and the differentiable LML consume the
sharded matvec unchanged — they are written against a matvec closure.

Communication per matvec: one all-gather of the (N, m) RHS block per
iteration (rides ICI), nothing else — the row blocks are embarrassingly
parallel, matching the workload's structure (SURVEY.md §2 parallelism
table: "within one large-N factorization" -> ICI-sharded only past one
chip).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from madaiemulator_tpu.models import iterative
from madaiemulator_tpu.ops import kernels
from madaiemulator_tpu.ops.kernels import GPParams
from madaiemulator_tpu.utils.config import GPConfig

ROWS_AXIS = "rows"


def make_rows_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = np.asarray(jax.devices())
    n = len(devs) if n_devices is None else n_devices
    if n > len(devs):
        raise ValueError(
            f"make_rows_mesh: need {n} devices, found {len(devs)}"
        )
    return Mesh(devs[:n], (ROWS_AXIS,))


def sharded_gram_matvec(
    X: jax.Array,
    params: GPParams,
    config: GPConfig,
    V: jax.Array,
    mesh: Mesh,
    row_chunk: int = 2048,
    noise: Optional[jax.Array] = None,
) -> jax.Array:
    """C(theta) @ V with the row dimension sharded over `mesh`.

    Each device computes its row block against the full (replicated) X and
    RHS, in sequential chunks of `row_chunk` rows; results concatenate back
    to the global (n, m) product. Callable under jit with `mesh` static.
    `noise` is an optional (n,) per-point observation-noise variance
    vector (GPData.noise); it shards with the rows like the RHS diagonal
    term.
    """
    n, d = X.shape
    vec = V.ndim == 1
    V2 = V[:, None] if vec else V
    ndev = mesh.devices.size
    pad = (-n) % ndev
    Xp = jnp.pad(X, ((0, pad), (0, 0))) if pad else X
    Vp = jnp.pad(V2, ((0, pad), (0, 0))) if pad else V2
    da = iterative._diag_add(n, params, config, X.dtype)
    # per-point noise rides the sharded diagonal add; a zero vector keeps
    # the shard_map signature static across the noise/no-noise cases
    dl = jnp.zeros((n,), X.dtype) if noise is None else noise.astype(X.dtype)
    dlp = jnp.pad(dl, (0, pad)) if pad else dl

    local = (n + pad) // ndev
    chunk = min(row_chunk, local)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(ROWS_AXIS, None),  # local row block of X
            P(None, None),       # full X (replicated)
            P(None, None),       # full RHS (replicated)
            P(ROWS_AXIS, None),  # local row block of RHS (diagonal term)
            P(ROWS_AXIS),        # local row block of the noise diagonal
            jax.tree.map(lambda _: P(), params),
        ),
        out_specs=P(ROWS_AXIS, None),
    )
    def mv(Xl, Xf, Vf, Vl, dll, prm):
        nl = Xl.shape[0]
        cpad = (-nl) % chunk
        Xlp = jnp.pad(Xl, ((0, cpad), (0, 0))) if cpad else Xl

        # rematerialize the kernel tile in any backward pass (see the
        # matching jax.checkpoint note in models/iterative.gram_matvec)
        @jax.checkpoint
        def block(xc):
            Kc = kernels.cross_covariance(xc, Xf, prm, config)
            return jnp.dot(
                Kc, Vf, preferred_element_type=Vf.dtype,
                precision=lax.Precision.HIGHEST,
            )

        out = lax.map(block, Xlp.reshape(-1, chunk, d)).reshape(-1, Vf.shape[1])
        return out[:nl] + (da + dll)[:, None] * Vl

    out = mv(Xp, X, V2, Vp, dlp, params)[:n]
    return out[:, 0] if vec else out


def make_sharded_matvec(
    X: jax.Array,
    params: GPParams,
    config: GPConfig,
    mesh: Mesh,
    row_chunk: int = 2048,
    noise: Optional[jax.Array] = None,
) -> Callable[[jax.Array], jax.Array]:
    """Matvec closure for models/iterative primitives (pcg_solve,
    slq_logdet) running row-sharded over `mesh`."""
    return lambda V: sharded_gram_matvec(
        X, params, config, V, mesh, row_chunk=row_chunk, noise=noise
    )


def pcg_solve_sharded(
    X: jax.Array,
    params: GPParams,
    config: GPConfig,
    B: jax.Array,
    mesh: Mesh,
    precond_rank: int = 64,
    tol: float = 1e-6,
    max_iters: int = 256,
    row_chunk: int = 2048,
    noise: Optional[jax.Array] = None,
):
    """Sharded C^-1 B: pivoted-Cholesky preconditioner (built once,
    O(N k (k + d)), replicated) + batched PCG over the sharded matvec."""
    da = iterative._diag_add(X.shape[0], params, config, X.dtype)
    if noise is not None:
        da = da + noise.astype(X.dtype)
    Lk = iterative.pivoted_cholesky(X, params, config, precond_rank)
    pre = iterative.make_preconditioner(Lk, da)
    mv = make_sharded_matvec(X, params, config, mesh, row_chunk, noise=noise)
    return iterative.pcg_solve(mv, B, pre, tol=tol, max_iters=max_iters)


def slq_logdet_sharded(
    X: jax.Array,
    params: GPParams,
    config: GPConfig,
    mesh: Mesh,
    key: jax.Array,
    probes: int = 16,
    lanczos_iters: int = 32,
    row_chunk: int = 2048,
) -> jax.Array:
    """log|C| by stochastic Lanczos quadrature over the sharded matvec."""
    mv = make_sharded_matvec(X, params, config, mesh, row_chunk)
    return iterative.slq_logdet(
        mv, X.shape[0], key, probes=probes, lanczos_iters=lanczos_iters,
        dtype=X.dtype,
    )
