"""Decompose the N=16,384 left_cholesky wall into its three cost streams.

The sweep (sweep_chol16k.py) showed the wall is flat across block sizes and
the fused Pallas panel does not help — so attribute the time directly:
  A. history GEMMs only:  Pa_j = A[cj:, cj:cj+b] - L[cj:, :cj] @ L[cj:cj+b, :cj]^T
     for all panels, chained so XLA cannot reorder/parallelize away.
  B. panel chain only:    16 x (chol(1024) + tri_inv + L21 GEMM), chained.
  C. full factorization (reference point).
A + B + data movement should reconstruct C; whichever stream dominates is
the latency story for the VERDICT #5 writeup.
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(out):
    import jax
    import numpy as _np

    leaf = jax.tree_util.tree_leaves(out)[0]
    _np.asarray(jax.device_get(leaf[(slice(0, 1),) * leaf.ndim]))


def timeit(fn, *args, reps=3, warmup=1):
    out = None
    for _ in range(warmup):
        out = fn(*args)
        sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from madaiemulator_tpu.ops import linalg
    from madaiemulator_tpu.ops.linalg import tri_inv_block

    n, b = 16384, 1024
    nb = n // b
    dtype = jnp.float32
    prec = jax.lax.Precision.HIGH
    key = jax.random.key(0)

    @jax.jit
    def make_spd(key):
        A = jax.random.normal(key, (n, n), dtype=dtype) / np.sqrt(n)
        return jnp.eye(n, dtype=dtype) * 4.0 + jnp.dot(
            A, A.T, preferred_element_type=dtype
        )

    C = make_spd(key)
    sync(C)

    # health probe
    t0 = time.perf_counter()
    x = jnp.ones((2048, 2048), jnp.float32)
    sync(jnp.dot(x, x))
    log(f"probe: {time.perf_counter() - t0:.1f} s")

    # reference factor (for stream A/B operands)
    L = jax.jit(lambda M: linalg.left_cholesky(M, block=b,
                                               update_precision="high"))(C)
    sync(L)

    # C. full factorization
    t_full, _ = timeit(
        jax.jit(lambda M: linalg.left_cholesky(M, block=b,
                                               update_precision="high")), C)
    log(f"C full left_cholesky: {t_full*1e3:.1f} ms")

    # A. history GEMMs only, chained via a scalar carry
    @jax.jit
    def gemms_only(A, Lf):
        acc = jnp.asarray(0.0, dtype)
        for j in range(1, nb):
            cj = j * b
            Pa = A[cj:, cj:cj + b] - jnp.dot(
                Lf[cj:, :cj] + acc, Lf[cj:cj + b, :cj].T,
                preferred_element_type=dtype, precision=prec,
            )
            acc = jnp.max(jnp.abs(Pa)) * jnp.asarray(1e-30, dtype)
        return acc

    t_gemm, _ = timeit(gemms_only, C, L)
    log(f"A history GEMMs only: {t_gemm*1e3:.1f} ms")

    # B. panel chain only: chol + tri_inv + TRSM-GEMM per panel, chained
    @jax.jit
    def panels_only(A, Lf):
        acc = jnp.asarray(0.0, dtype)
        for j in range(nb):
            cj = j * b
            blk = Lf[cj:cj + b, cj:cj + b]
            D = jnp.dot(blk, blk.T, preferred_element_type=dtype,
                        precision=jax.lax.Precision.HIGHEST)
            Lkk = lax.linalg.cholesky(D + acc)
            invK = tri_inv_block(Lkk, precision=prec)
            if cj + b < n:
                L21 = jnp.dot(A[cj + b:, cj:cj + b], invK.T,
                              preferred_element_type=dtype, precision=prec)
                acc = jnp.max(jnp.abs(L21)) * jnp.asarray(1e-30, dtype)
            else:
                acc = jnp.max(jnp.abs(invK)) * jnp.asarray(1e-30, dtype)
        return acc

    t_pan, _ = timeit(panels_only, C, L)
    log(f"B panel chain only (chol+inv+L21, incl. {nb} SPD rebuilds): "
        f"{t_pan*1e3:.1f} ms")

    # B2. just the 16 chol custom-calls, chained
    @jax.jit
    def chols_only(Lf):
        acc = jnp.asarray(0.0, dtype)
        for j in range(nb):
            cj = j * b
            blk = Lf[cj:cj + b, cj:cj + b]
            D = jnp.dot(blk, blk.T, preferred_element_type=dtype,
                        precision=jax.lax.Precision.HIGHEST)
            Lkk = lax.linalg.cholesky(D + acc)
            acc = jnp.max(jnp.abs(Lkk)) * jnp.asarray(1e-30, dtype)
        return acc

    t_chol, _ = timeit(chols_only, L)
    log(f"B2 {nb} x chol(1024) (+SPD rebuild GEMMs): {t_chol*1e3:.1f} ms")

    # B3. just the 16 tri_inv chains
    @jax.jit
    def invs_only(Lf):
        acc = jnp.asarray(0.0, dtype)
        for j in range(nb):
            cj = j * b
            blk = jnp.tril(Lf[cj:cj + b, cj:cj + b]) + acc * jnp.eye(b, dtype=dtype)
            invK = tri_inv_block(blk, precision=prec)
            acc = jnp.max(jnp.abs(invK)) * jnp.asarray(1e-30, dtype)
        return acc

    t_inv, _ = timeit(invs_only, L)
    log(f"B3 {nb} x tri_inv(1024): {t_inv*1e3:.1f} ms")

    # D. data movement: concatenate + dynamic_update_slice stream
    @jax.jit
    def dus_only(Lf):
        out = jnp.zeros_like(Lf)
        for j in range(nb):
            cj = j * b
            col = jnp.concatenate(
                [Lf[cj:cj + b, cj:cj + b], Lf[cj + b:, cj:cj + b]], axis=0)
            out = lax.dynamic_update_slice(out, col, (cj, cj))
        return out

    t_dus, _ = timeit(dus_only, L)
    log(f"D concat+update_slice stream: {t_dus*1e3:.1f} ms")

    log(f"reconstruction: A {t_gemm*1e3:.1f} + B {t_pan*1e3:.1f} + "
        f"D {t_dus*1e3:.1f} = {(t_gemm + t_pan + t_dus)*1e3:.1f} ms "
        f"vs C {t_full*1e3:.1f} ms")


if __name__ == "__main__":
    main()
