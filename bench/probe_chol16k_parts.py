"""Decompose the N=16,384 left_cholesky wall into its three cost streams.

The sweep (sweep_chol16k.py) showed the wall is flat across block sizes and
the fused Pallas panel does not help — so attribute the time directly:
  A. history GEMMs only:  Pa_j = A[cj:, cj:cj+b] - L[cj:, :cj] @ L[cj:cj+b, :cj]^T
     for all panels, chained so XLA cannot reorder/parallelize away.
  B. panel chain only:    16 x (chol(1024) + tri_inv + L21 GEMM), chained.
  C. full factorization (reference point).
A + B + data movement should reconstruct C; whichever stream dominates is
the latency story for the VERDICT #5 writeup.

Round-5 addition: every stream is ALSO measured x4 in-graph (outer
lax.scan whose carry scales the operands by (1 + c*1e-30) and consumes
each iteration's result) — the single-dispatch walls above carry the
~25-30 ms relay floor, which at these sizes is the same order as the
device math itself (B2/B3/D walls of 27-30 ms are floor-dominated).
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

    one = jnp.asarray(1.0, dtype)
    tiny = jnp.asarray(1e-30, dtype)

    # ---- stream bodies: body(c, C, L) -> scalar; the carry c perturbs
    # the operands so an outer x4 scan can neither CSE nor skip ----------

    def full_body(c, A, Lf):
        Lr = linalg.left_cholesky(A * (one + c * tiny), block=b,
                                  update_precision="high")
        return jnp.max(jnp.abs(Lr)) * tiny + c

    def gemms_body(c, A, Lf):
        acc = c * tiny
        for j in range(1, nb):
            cj = j * b
            Pa = A[cj:, cj:cj + b] - jnp.dot(
                Lf[cj:, :cj] + acc, Lf[cj:cj + b, :cj].T,
                preferred_element_type=dtype, precision=prec,
            )
            acc = jnp.max(jnp.abs(Pa)) * tiny
        return acc + c

    def panels_body(c, A, Lf):
        acc = c * tiny
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
                acc = jnp.max(jnp.abs(L21)) * tiny
            else:
                acc = jnp.max(jnp.abs(invK)) * tiny
        return acc + c

    def chols_body(c, A, Lf):
        acc = c * tiny
        for j in range(nb):
            cj = j * b
            blk = Lf[cj:cj + b, cj:cj + b]
            D = jnp.dot(blk, blk.T, preferred_element_type=dtype,
                        precision=jax.lax.Precision.HIGHEST)
            Lkk = lax.linalg.cholesky(D + acc)
            acc = jnp.max(jnp.abs(Lkk)) * tiny
        return acc + c

    def invs_body(c, A, Lf):
        acc = c * tiny
        for j in range(nb):
            cj = j * b
            blk = jnp.tril(Lf[cj:cj + b, cj:cj + b]) * (one + acc)
            invK = tri_inv_block(blk, precision=prec)
            acc = jnp.max(jnp.abs(invK)) * tiny
        return acc + c

    def dus_body(c, A, Lf):
        out = jnp.zeros_like(Lf)
        Lp = Lf * (one + c * tiny)
        for j in range(nb):
            cj = j * b
            col = jnp.concatenate(
                [Lp[cj:cj + b, cj:cj + b], Lp[cj + b:, cj:cj + b]], axis=0)
            out = lax.dynamic_update_slice(out, col, (cj, cj))
        return jnp.max(jnp.abs(out)) * tiny + c

    K = 4

    def measure(name, body):
        single = jax.jit(
            lambda A, Lf: body(jnp.asarray(0.0, dtype), A, Lf))
        t1, _ = timeit(single, C, L)

        @jax.jit
        def chained(A, Lf):
            def step(c, _):
                return body(c, A, Lf), None
            return lax.scan(step, jnp.asarray(0.0, dtype), None,
                            length=K)[0]

        tk, _ = timeit(chained, C, L, reps=2)
        log(f"{name}: wall {t1*1e3:.1f} ms | device (x{K} in-graph) "
            f"{tk/K*1e3:.1f} ms | implied floor {t1*1e3 - tk/K*1e3:.1f} ms")
        return tk / K

    t_full = measure("C  full left_cholesky", full_body)
    t_gemm = measure("A  history GEMMs only", gemms_body)
    t_pan = measure(f"B  panel chain (chol+inv+L21, {nb} SPD rebuilds)",
                    panels_body)
    t_chol = measure(f"B2 {nb} x chol(1024)+SPD-rebuild", chols_body)
    t_inv = measure(f"B3 {nb} x tri_inv(1024)", invs_body)
    t_dus = measure("D  concat+update_slice stream", dus_body)

    log(f"device reconstruction: A {t_gemm*1e3:.1f} + B {t_pan*1e3:.1f} + "
        f"D {t_dus*1e3:.1f} = {(t_gemm + t_pan + t_dus)*1e3:.1f} ms "
        f"vs C {t_full*1e3:.1f} ms "
        f"(B2 chol-only {t_chol*1e3:.1f}, B3 inv-only {t_inv*1e3:.1f})")


if __name__ == "__main__":
    main()
