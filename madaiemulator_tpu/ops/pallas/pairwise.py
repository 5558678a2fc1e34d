"""Pallas TPU kernel: fused pairwise covariance (Gram / cross) builder.

The north-star maps the reference's makeCovMatrix / makeKVector scalar loops
(ref: src/libEmu/emulator.c; mount empty — SURVEY.md §0) to a "vmapped/Pallas
pairwise-kernel op" [BASELINE.json]. This kernel computes, per (bm, bn) output
tile entirely in VMEM:

    d2[i,j] = ||u_i||^2 + ||v_j||^2 - 2 u_i.v_j      (MXU dot, f32 accum)
    out[i,j] = family_epilogue(d2) (+ diag_add on the true diagonal)

i.e. one HBM write of the finished covariance tile — the distance matrix,
the kernel transform and the nugget never exist as separate HBM tensors.

Inputs are pre-scaled by length scales (O(nd), done by the caller), so one
kernel serves ARD power-exponential (alpha=2) and isotropic Matérn families.
Covers the jit-compiled TPU path; `interpret=True` keeps it testable on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FAMILIES = ("power_exponential", "matern32", "matern52")


def _epilogue(d2, amp, family: str):
    if family == "power_exponential":
        return amp * jnp.exp(-0.5 * d2)
    r = jnp.sqrt(d2 + jnp.asarray(1e-36, d2.dtype))
    if family == "matern32":
        s = jnp.sqrt(jnp.asarray(3.0, r.dtype)) * r
        return amp * (1.0 + s) * jnp.exp(-s)
    if family == "matern52":
        s = jnp.sqrt(jnp.asarray(5.0, r.dtype)) * r
        return amp * (1.0 + s + s * s / 3.0) * jnp.exp(-s)
    raise ValueError(family)


def _pairwise_kernel(scalars_ref, u_ref, v_ref, out_ref, *, family: str,
                     bm: int, bn: int, add_diag: bool):
    amp = scalars_ref[0]
    diag_add = scalars_ref[1]
    u = u_ref[:]  # (bm, D)
    v = v_ref[:]  # (bn, D)
    uu = jnp.sum(u * u, axis=-1)[:, None]  # (bm, 1)
    vv = jnp.sum(v * v, axis=-1)[None, :]  # (1, bn)
    uv = jax.lax.dot_general(
        u, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d2 = jnp.maximum(uu + vv - 2.0 * uv, 0.0)
    out = _epilogue(d2, amp, family)
    if add_diag:
        i = pl.program_id(0)
        j = pl.program_id(1)
        rows = i * bm + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0)
        cols = j * bn + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1)
        out = jnp.where(rows == cols, out + diag_add, out)
    out_ref[:] = out


def _pad_rows(A, m):
    pad = (-A.shape[0]) % m
    if pad == 0:
        return A
    return jnp.concatenate(
        [A, jnp.zeros((pad, A.shape[1]), dtype=A.dtype)], axis=0
    )


def _pad_cols(A, m):
    pad = (-A.shape[1]) % m
    if pad == 0:
        return A
    return jnp.concatenate(
        [A, jnp.zeros((A.shape[0], pad), dtype=A.dtype)], axis=1
    )


@functools.partial(
    jax.jit,
    static_argnames=("family", "add_diag", "bm", "bn", "interpret"),
)
def pairwise_covariance(
    U: jax.Array,  # (n1, d) pre-scaled points
    V: jax.Array,  # (n2, d)
    amp: jax.Array,  # scalar amplitude
    diag_add: jax.Array,  # scalar added on the true diagonal (nugget+jitter)
    family: str = "power_exponential",
    add_diag: bool = False,
    bm: int = 256,
    bn: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Fused covariance matrix: k(U, V) (+ diag_add * I when add_diag)."""
    if family not in _FAMILIES:
        raise ValueError(f"family {family!r} not supported by the Pallas op")
    n1, n2 = U.shape[0], V.shape[0]
    dtype = jnp.float32
    Up = _pad_cols(_pad_rows(U.astype(dtype), bm), 128)
    Vp = _pad_cols(_pad_rows(V.astype(dtype), bn), 128)
    m1, m2 = Up.shape[0], Vp.shape[0]
    D = Up.shape[1]
    scalars = jnp.stack(
        [jnp.asarray(amp, dtype), jnp.asarray(diag_add, dtype)]
    )
    kernel = functools.partial(
        _pairwise_kernel, family=family, bm=bm, bn=bn, add_diag=add_diag
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m1 // bm, m2 // bn),
            in_specs=[
                pl.BlockSpec((bm, D), lambda i, j, s: (i, 0)),
                pl.BlockSpec((bn, D), lambda i, j, s: (j, 0)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, s: (i, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((m1, m2), dtype),
        interpret=interpret,
    )(scalars, Up, Vp)
    return out[:n1, :n2]
