"""Pallas TPU kernel: VMEM-resident blocked Cholesky.

The north-star moves the reference's GSL/LAPACK factorization to a "blocked
Pallas Cholesky on the MXU" [BASELINE.json]. This kernel factors a matrix
that fits VMEM (N <= ~1024 f32) in ONE pallas_call: the matrix is loaded
once, all panel factorizations / TRSMs / SYRK updates happen on-chip, and
only the finished factor is written back — no HBM round-trips between
panels (XLA's lowering runs a while loop over HBM-resident panels).

Per 128-wide panel (static Python loop — every ref slice has static bounds,
and the fori-loop inner kernels are mask-based because Mosaic does not lower
dynamic_slice/scatter on values):
  1. diagonal block: unblocked rank-1 Cholesky (fori over columns, VPU);
  2. panel TRSM: exact triangular inversion of the diagonal factor (fori
     substitution) + one MXU dot;
  3. trailing SYRK: one MXU dot.

This is the fit-hot-path size class (Gram matrices of N <= 1k training
points, vmapped over restarts/components/ensembles). Large N uses
ops/linalg.blocked_cholesky_opt (HBM-blocked) behind the same `cholesky`
interface; `ops/linalg.pallas_cholesky_diff` wraps this kernel with the
Murray custom VJP. Cites ref: src/libEmu/emulator.c + GSL
gsl_linalg_cholesky_decomp usage (mount empty this round — SURVEY.md §0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _unblocked_chol_block(A, b):
    """Rank-1 unblocked lower Cholesky of a (b, b) value.

    Shapes stay 2D throughout: Mosaic rejects value slicing/scatter and
    mis-lays-out 1D vectors inside loop bodies, so column j is extracted as
    a (b, 1) via an exact masked row-sum, the outer product is that column
    times its (1, b) transpose, and all writes are masks.
    """
    rows = lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols = lax.broadcasted_iota(jnp.int32, (b, b), 1)

    def body(j, L):
        colmask = cols == j
        pivot = jnp.sum(jnp.where(colmask & (rows == j), L, 0.0))
        Cj = jnp.where(colmask, L, 0.0)  # only column j nonzero
        # column j as a (b, 1): Cj has exactly one nonzero per row, so a
        # keepdims row-sum extracts it EXACTLY (a ones-matmul broadcast ran
        # on the MXU at bf16 input precision and cost 4e-3 factor error)
        colB = jnp.sum(Cj, axis=1, keepdims=True) / jnp.sqrt(pivot)
        ridx = lax.broadcasted_iota(jnp.int32, (b, 1), 0)
        colB = jnp.where(ridx >= j, colB, 0.0)  # (b, 1)
        rowB = lax.transpose(colB, (1, 0))  # (1, b): rowB[0, k] = colj[k]
        L = L - jnp.where(cols > j, colB * rowB, 0.0)
        L = jnp.where(colmask, colB, L)
        return L

    L = lax.fori_loop(0, b, body, A)
    return jnp.where(rows >= cols, L, 0.0)


def _tri_inv_block(T, b):
    """Forward-substitution inverse of a (b, b) lower-triangular value.

    2D-only like _unblocked_chol_block: row i of T is isolated with a mask;
    one MXU dot produces that row's substitution update with every other
    row zero, so the masked write needs no vector extraction.
    """
    rows = lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols = lax.broadcasted_iota(jnp.int32, (b, b), 1)

    def body(i, X):
        rowmask = rows == i
        tii = jnp.sum(jnp.where(rowmask & (cols == i), T, 0.0))
        Ri = jnp.where(rowmask, T, 0.0)  # only row i nonzero
        contrib = jnp.dot(
            Ri, X, preferred_element_type=T.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        eiB = jnp.where(rowmask & (cols == i), 1.0, 0.0)
        xiB = (eiB - contrib) / tii  # zero outside row i
        X = jnp.where(rowmask, xiB, X)
        return X

    return lax.fori_loop(0, b, body, jnp.zeros_like(T))


def _chol_kernel(a_ref, out_ref, *, n: int, panel: int):
    out_ref[:] = a_ref[:]
    nb = n // panel
    for k in range(nb):
        kb = k * panel
        Lkk = _unblocked_chol_block(out_ref[kb : kb + panel, kb : kb + panel], panel)
        out_ref[kb : kb + panel, kb : kb + panel] = Lkk
        if kb + panel < n:
            A21 = out_ref[kb + panel :, kb : kb + panel]  # (m, panel)
            invK = _tri_inv_block(Lkk, panel)
            # standard (1,),(0,) contractions only — Mosaic's dot lowering
            # rejects transposed dimension_numbers; transpose the values
            L21 = jnp.dot(
                A21, invK.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            out_ref[kb + panel :, kb : kb + panel] = L21
            U = jnp.dot(
                L21, L21.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            out_ref[kb + panel :, kb + panel :] = (
                out_ref[kb + panel :, kb + panel :] - U
            )
    out_ref[:] = jnp.tril(out_ref[:])


def _panel_factor_kernel(a_ref, l_ref, inv_ref, *, b: int, panel: int):
    """Fused panel factorization: L = chol(A) AND inv(L), one VMEM kernel.

    Stage 1 is the blocked factorization of `_chol_kernel`; stage 2 inverts
    the factor blockwise (per-128-block substitution inverse + MXU dots for
    the off-diagonal blocks), so the left-looking large-N driver gets both
    the diagonal factor and the TRSM operand from ONE kernel launch with no
    HBM round-trip between them.
    """
    HI = jax.lax.Precision.HIGHEST
    l_ref[:] = a_ref[:]
    nb = b // panel
    for k in range(nb):
        kb = k * panel
        Lkk = _unblocked_chol_block(l_ref[kb : kb + panel, kb : kb + panel], panel)
        l_ref[kb : kb + panel, kb : kb + panel] = Lkk
        if kb + panel < b:
            A21 = l_ref[kb + panel :, kb : kb + panel]
            invK = _tri_inv_block(Lkk, panel)
            L21 = jnp.dot(
                A21, invK.T, preferred_element_type=jnp.float32, precision=HI
            )
            l_ref[kb + panel :, kb : kb + panel] = L21
            U = jnp.dot(
                L21, L21.T, preferred_element_type=jnp.float32, precision=HI
            )
            l_ref[kb + panel :, kb + panel :] = (
                l_ref[kb + panel :, kb + panel :] - U
            )
    l_ref[:] = jnp.tril(l_ref[:])

    # stage 2: inv(L) blockwise. inv_ref starts as zeros (upper stays zero).
    inv_ref[:] = jnp.zeros_like(inv_ref)
    diag_invs = []
    for i in range(nb):
        ib = i * panel
        di = _tri_inv_block(l_ref[ib : ib + panel, ib : ib + panel], panel)
        diag_invs.append(di)
        inv_ref[ib : ib + panel, ib : ib + panel] = di
    for j in range(nb):
        jb = j * panel
        for i in range(j + 1, nb):
            ib = i * panel
            acc = jnp.zeros((panel, panel), dtype=jnp.float32)
            for k in range(j, i):
                kb = k * panel
                acc = acc + jnp.dot(
                    l_ref[ib : ib + panel, kb : kb + panel],
                    inv_ref[kb : kb + panel, jb : jb + panel],
                    preferred_element_type=jnp.float32,
                    precision=HI,
                )
            inv_ref[ib : ib + panel, jb : jb + panel] = -jnp.dot(
                diag_invs[i], acc, preferred_element_type=jnp.float32,
                precision=HI,
            )


@functools.partial(jax.jit, static_argnames=("panel", "interpret"))
def pallas_panel_factor(
    A: jax.Array, panel: int = 128, interpret: bool = False
):
    """(chol(A), inv(chol(A))) of a VMEM-sized SPD block in ONE Pallas kernel.

    The building block that keeps Pallas in the production N=16k path: the
    left-looking blocked Cholesky (ops/linalg.left_cholesky, diag="pallas")
    factors every diagonal panel AND obtains its triangular inverse (the
    TRSM operand) from this single launch. b must be a multiple of `panel`
    and small enough for three (b, b) f32 buffers to fit VMEM (b <= 1024).
    """
    b = A.shape[0]
    if b % panel != 0:
        raise ValueError(f"pallas_panel_factor: b={b} not a multiple of {panel}")
    kernel = functools.partial(_panel_factor_kernel, b=b, panel=panel)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, b), jnp.float32),
            jax.ShapeDtypeStruct((b, b), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(A.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("panel", "interpret"))
def pallas_cholesky(
    A: jax.Array, panel: int = 128, interpret: bool = False
) -> jax.Array:
    """Lower Cholesky of a VMEM-sized SPD matrix, one Pallas kernel.

    N must be a multiple of `panel` (use ops.linalg.pad_spd otherwise) and
    small enough for the matrix + scratch to fit VMEM (~1024 at f32).
    """
    n = A.shape[0]
    if n % panel != 0:
        raise ValueError(f"pallas_cholesky: N={n} not a multiple of {panel}")
    kernel = functools.partial(_chol_kernel, n=n, panel=panel)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(A.astype(jnp.float32))
