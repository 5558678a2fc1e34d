"""Resolve the N=16k Cholesky dispatch floor (VERDICT r3 next #5, part 2).

probe_chol16k_parts.py measured THREE different 16-op streams (chol chain,
tri_inv chain, update-slice stream) at an identical 31.2 ms wall — the
signature of the axon relay's per-call dispatch floor, not of device time.
If the floor is ~25-31 ms, the 64 ms single-call wall at 16k is ~half
dispatch overhead and the device-side factorization rate is far above the
22.7 TFLOP/s wall number (and the 16k-vs-24k "efficiency gap" is mostly
the floor amortizing over a 3.4x longer kernel).

Measures: (1) the floor itself (trivial jitted op, same sync protocol);
(2) K chained left_cholesky factorizations inside ONE program (lax.scan,
carry-perturbed operand so iterations can neither fuse nor CSE) -> the
device-side per-factorization time; (3) same at N=24,576 for the ratio.
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
    from madaiemulator_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    dtype = jnp.float32
    key = jax.random.key(0)

    # (1) dispatch floor: trivial op through the same timing protocol
    tiny = jnp.ones((8, 8), dtype)
    t_floor, _ = timeit(jax.jit(lambda x: x + 1.0), tiny, reps=5)
    log(f"dispatch floor (8x8 add): {t_floor*1e3:.1f} ms")

    for n, K in ((16384, 4),):
        @jax.jit
        def make_spd(key, n=n):
            A = jax.random.normal(key, (n, n), dtype=dtype) / np.sqrt(n)
            return jnp.eye(n, dtype=dtype) * 4.0 + jnp.dot(
                A, A.T, preferred_element_type=dtype
            )

        C = make_spd(key)
        sync(C)

        # single-call wall (the round-3 headline protocol)
        f1 = jax.jit(lambda M: linalg.left_cholesky(
            M, block=1024, update_precision="high"))
        t1, L1 = timeit(f1, C)
        flops = n**3 / 3.0
        log(f"N={n} single-call wall: {t1*1e3:.1f} ms  "
            f"{flops/t1/1e12:.2f} TFLOP/s")

        # K factorizations in ONE program; operand perturbed by the carry so
        # iterations are sequential and cannot fuse/CSE/DCE. C is a jit
        # ARGUMENT, never a closure: a closed-over 1 GB device constant sends
        # XLA into host-side constant folding (observed: >27 min compile).
        def body(c, _, n=n):
            M = c[1] + c[0] * jnp.eye(n, dtype=dtype)
            L = linalg.left_cholesky(M, block=1024, update_precision="high")
            return (jnp.abs(L[0, 0]) * jnp.asarray(1e-30, dtype), c[1]), None

        reps_fn = jax.jit(lambda M: lax.scan(
            body, (jnp.asarray(0.0, dtype), M), None, length=K)[0][0])
        tK, _ = timeit(reps_fn, C)
        per = tK / K
        log(f"N={n} x{K} in-graph: {tK*1e3:.1f} ms total, {per*1e3:.1f} ms "
            f"per factorization (+eye add)  {flops/per/1e12:.2f} TFLOP/s "
            f"device-side")
        del C, L1


if __name__ == "__main__":
    main()
