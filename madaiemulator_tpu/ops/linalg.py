"""Dense symmetric-positive-definite linear algebra for the GP core.

TPU-native replacement for the reference's GSL/LAPACK usage (ref:
gsl_linalg_cholesky_decomp / gsl_linalg_cholesky_solve calls in
src/libEmu/estimator.c and src/libEmu/emulator.c; mount empty this round —
SURVEY.md §0). One interface, multiple implementations:

  * "xla"     — jax.lax.linalg.cholesky: correct everywhere, f64-capable on
                CPU for parity runs; XLA's own blocked TPU lowering.
  * "blocked" — right-looking blocked Cholesky written at the JAX level:
                per-panel unblocked factorization + TRSM, with the O(N^3)
                trailing SYRK update expressed as a plain matmul so it lands
                on the MXU with f32 accumulation. This is the large-N path
                (BASELINE.json north-star: N=16k near roofline); a Pallas
                panel kernel can replace the small factorization later
                without changing this interface.

Failure semantics: the reference treats a failed (non-SPD) factorization by
returning a huge negative log-likelihood so the optimizer backs off
[SURVEY.md §5]. Inside jit we do the branchless equivalent: `chol_ok` detects
non-finite entries in L and callers `jnp.where(ok, logL, -inf)`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def xla_cholesky(A: jax.Array) -> jax.Array:
    """Lower Cholesky via XLA's native lowering."""
    return lax.linalg.cholesky(A)


def _unblocked_cholesky(A: jax.Array) -> jax.Array:
    """Unblocked lower Cholesky of a small (b, b) block, via lax.fori_loop.

    Column-at-a-time right-looking update; used for diagonal panels of the
    blocked algorithm. O(b^3) VPU work — keep b modest (<= 256).
    """
    b = A.shape[0]
    idx = jnp.arange(b)

    def body(j, L):
        col = L[:, j]
        pivot = jnp.sqrt(col[j])
        colj = jnp.where(idx >= j, col / pivot, 0.0)
        # rank-1 trailing update of columns > j: A[:, k] -= colj * colj[k]
        L = L - jnp.where(idx[None, :] > j, colj[:, None] * colj[None, :], 0.0)
        L = L.at[:, j].set(colj)
        return L

    return jnp.tril(lax.fori_loop(0, b, body, A))


@functools.partial(jax.jit, static_argnames=("block",))
def blocked_cholesky(A: jax.Array, block: int = 256) -> jax.Array:
    """Right-looking blocked lower Cholesky.

    For step k over column panels of width `block`:
      1. factor the (b,b) diagonal block          (unblocked, VPU)
      2. TRSM the (N-kb-b, b) sub-panel           (triangular_solve)
      3. SYRK-update the trailing matrix          (one MXU matmul)

    N must be a multiple of `block` (callers pad; the GP layer pads the Gram
    matrix with an identity tail which factors exactly).
    """
    n = A.shape[0]
    assert n % block == 0, f"blocked_cholesky: N={n} not a multiple of {block}"
    nb = n // block

    # Python loop (static under jit): every step's slices have static shapes,
    # so the trailing SYRK is an exact (n-kb-b)^2 x b matmul — no masked
    # full-size work. nb is small (64 at N=16k, b=256), so unrolling is cheap.
    M = A
    panels = []
    for k in range(nb):
        kb = k * block
        Lkk = _unblocked_cholesky(M[kb : kb + block, kb : kb + block])
        col = jnp.zeros((n, block), dtype=A.dtype)
        col = lax.dynamic_update_slice(col, Lkk, (kb, 0))
        if kb + block < n:
            A21 = M[kb + block :, kb : kb + block]
            # L21 solves L21 @ Lkk^T = A21
            L21 = lax.linalg.triangular_solve(
                Lkk, A21, left_side=False, lower=True, transpose_a=True
            )
            T = M[kb + block :, kb + block :]
            T = T - jnp.dot(
                L21,
                L21.T,
                preferred_element_type=A.dtype,
                precision=lax.Precision.HIGHEST,
            )
            M = M.at[kb + block :, kb + block :].set(T)
            col = col.at[kb + block :].set(L21)
        panels.append(col)
    return jnp.concatenate(panels, axis=1)


def cholesky(A: jax.Array, method: str = "xla", block: int = 256) -> jax.Array:
    if method == "xla":
        return xla_cholesky(A)
    if method == "blocked":
        return blocked_cholesky(A, block=block)
    raise ValueError(f"unknown cholesky method {method!r}")


def chol_ok(L: jax.Array) -> jax.Array:
    """Scalar bool: factorization produced finite entries (SPD input)."""
    return jnp.all(jnp.isfinite(L))


def logdet_from_chol(L: jax.Array) -> jax.Array:
    """log|A| = 2 * sum(log diag L)."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))


def solve_lower(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve L x = B (forward substitution); B may be a vector or matrix."""
    b2d = B if B.ndim == 2 else B[:, None]
    x = lax.linalg.triangular_solve(L, b2d, left_side=True, lower=True)
    return x if B.ndim == 2 else x[:, 0]


def solve_upper_t(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve L^T x = B (back substitution with the lower factor)."""
    b2d = B if B.ndim == 2 else B[:, None]
    x = lax.linalg.triangular_solve(
        L, b2d, left_side=True, lower=True, transpose_a=True
    )
    return x if B.ndim == 2 else x[:, 0]


def cho_solve(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve A x = B given A = L L^T."""
    return solve_upper_t(L, solve_lower(L, B))


def pad_spd(A: jax.Array, multiple: int) -> Tuple[jax.Array, int]:
    """Pad an SPD matrix to a multiple of `multiple` with an identity tail.

    The padded matrix is block-diagonal [[A, 0], [0, I]], still SPD, whose
    Cholesky factor is [[L, 0], [0, I]] — padding adds zero to the logdet and
    does not perturb solves restricted to the first n rows.
    """
    n = A.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return A, n
    Ap = jnp.zeros((n + pad, n + pad), dtype=A.dtype)
    Ap = Ap.at[:n, :n].set(A)
    Ap = Ap.at[jnp.arange(n, n + pad), jnp.arange(n, n + pad)].set(1.0)
    return Ap, n
