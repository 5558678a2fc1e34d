"""VERDICT r3 next #5: close the N=16,384 Cholesky latency gap.

Round-3 diagnosis: the same left_cholesky(block=1024, "high") code hits
22.7 TFLOP/s at N=16,384 but 35.8 at N=24,576 — the 16k wall is dominated
by the sequential per-panel fixed cost (XLA chol custom-call + log-depth
triangular inversion), which bigger trailing GEMMs amortize at 24k.
Fitting t(N) = (N^3/3)/X + nb*c to the round-3 pair gives GEMM rate
X ~ 66 TFLOP/s and per-panel cost c ~ 2.6 ms — i.e. 42 of the 64.5 ms at
16k is panel overhead, not GEMM.

This sweep measures every lever VERDICT names:
  * block in {512, 1024, 2048} (fewer, costlier panels vs more, cheaper);
  * diag="pallas": the fused pallas_panel_factor kernel (factor + inverse
    in ONE launch instead of chol custom-call + log-depth inversion chain)
    — VMEM-bound to block <= 1024;
  * the raw matmul roofline at both precision tiers, so bench.py can
    report achieved fraction-of-roofline alongside TFLOP/s.

Run on the axon relay AFTER the health probe (ROADMAP protocol: trivial-op
probe must come back in single-digit seconds before any timing counts).
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

    from madaiemulator_tpu.ops import linalg

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    # ---- relay health probe (ROADMAP protocol) ----
    t0 = time.perf_counter()
    x = jnp.ones((2048, 2048), jnp.float32)
    sync(jnp.dot(x, x))
    probe = time.perf_counter() - t0
    log(f"probe: trivial 2k matmul incl. compile = {probe:.1f} s "
        f"({'HEALTHY' if probe < 10 else 'DEGRADED - numbers suspect'})")

    n = 16384
    dtype = jnp.float32
    key = jax.random.key(0)

    @jax.jit
    def make_spd(key):
        A = jax.random.normal(key, (n, n), dtype=dtype) / np.sqrt(n)
        return jnp.eye(n, dtype=dtype) * 4.0 + jnp.dot(
            A, A.T, preferred_element_type=dtype
        )

    C = make_spd(key)
    sync(C)
    flops = n**3 / 3.0

    @jax.jit
    def residual(L, M):
        R = M - jnp.dot(
            jnp.tril(L), jnp.tril(L).T,
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.max(jnp.abs(R)) / jnp.max(jnp.abs(M))

    # ---- raw matmul roofline at both tiers (square 16k GEMM) ----
    for tier, prec in (("high", jax.lax.Precision.HIGH),
                       ("highest", jax.lax.Precision.HIGHEST)):
        f = jax.jit(lambda M, p=prec: jnp.dot(
            M, M.T, preferred_element_type=dtype, precision=p))
        t, _ = timeit(f, C)
        log(f"matmul 16k x 16k ({tier}): {t*1e3:.1f} ms  "
            f"{2 * n**3 / t / 1e12:.1f} TFLOP/s")

    # ---- the sweep ----
    results = []
    variants = []
    for block in (512, 1024, 2048):
        variants.append((f"left({block},high,xla)", block, "xla"))
    for block in (512, 1024):  # pallas panel is VMEM-bound to b <= 1024
        variants.append((f"left({block},high,pallas)", block, "pallas"))

    # Each variant is measured two ways: single-call wall (carries the
    # relay's ~25-31 ms dispatch floor — ~40% of a 65 ms call at this N)
    # and K=4 factorizations chained in ONE program (lax.scan,
    # carry-perturbed full-matrix dependence so iterations can neither
    # fuse nor DCE) — the device-side rate that decides which variant to
    # ship. Same protocol as bench.py.
    K = 4
    for name, block, diag in variants:
        try:
            f = jax.jit(lambda M, b=block, dg=diag: linalg.left_cholesky(
                M, block=b, update_precision="high", diag=dg))
            t, L = timeit(f, C)
            r = float(jax.device_get(residual(L, C)))
            ok = r < 1e-5
            tf = flops / t / 1e12

            def chain_fn(M, b=block, dg=diag):
                def body(c, _):
                    L = linalg.left_cholesky(c, block=b,
                                             update_precision="high", diag=dg)
                    return M + jnp.asarray(1e-30, dtype) * L, None
                return jax.lax.scan(body, M, None, length=K)[0]

            tK, _ = timeit(jax.jit(chain_fn), C)
            tf_dev = flops / (tK / K) / 1e12
            log(f"{name}: wall {t*1e3:.1f} ms {tf:.2f} TFLOP/s  "
                f"device x{K} {tK/K*1e3:.1f} ms {tf_dev:.2f} TFLOP/s  "
                f"residual={r:.2e}"
                f"{'' if ok else '  [FAILED residual]'}")
            results.append((name, tf, tf_dev, r, ok))
        except Exception as e:
            log(f"{name} failed: {type(e).__name__}: {e}")

    good = [(nm, tf, tfd) for nm, tf, tfd, _, ok in results if ok]
    if good:
        best = max(good, key=lambda p: p[2])
        log(f"best verified (device-side): {best[0]}  {best[2]:.2f} TFLOP/s "
            f"(wall {best[1]:.2f})")


if __name__ == "__main__":
    main()
