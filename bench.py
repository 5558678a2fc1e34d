"""Benchmark entry point (driver contract: print ONE JSON line to stdout).

Headline metric: Cholesky TFLOP/s at N=16384 in float32 on the attached
TPU — the north-star hot kernel (BASELINE.md: the reference's GSL/LAPACK
factorization is single-core GFLOP/s class; BASELINE.json asks for "near MXU
roofline" via a blocked implementation).

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
baseline is the analytic serial-CPU estimate for the C code's factorization:
10 GFLOP/s (optimistic single-core LAPACK dpotrf on a modern x86;
GSL's own unblocked Cholesky is slower). vs_baseline = achieved / 0.01 TFLOP/s.

Secondary diagnostics (fit wall-clock, predict throughput, both Cholesky
implementations) go to stderr so stdout stays a single machine-readable line.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, reps=3, warmup=1):
    """(best wall-clock, last output), synchronizing via a host fetch.

    jax.block_until_ready alone does not block on the axon relay backend
    (observed: 0.0 ms for a 16k Cholesky), so force a tiny device->host copy
    that depends on the full result.
    """
    import jax
    import numpy as _np

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        _np.asarray(jax.device_get(leaf[(slice(0, 1),) * leaf.ndim]))

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
    log(f"bench device: {dev.platform} {dev.device_kind}")

    n = 16384
    dtype = jnp.float32
    # SPD operand built on-device: C = I*n + A A^T from a fixed PRNG
    key = jax.random.key(0)

    @jax.jit
    def make_spd(key):
        A = jax.random.normal(key, (n, n), dtype=dtype) / np.sqrt(n)
        return jnp.eye(n, dtype=dtype) * 4.0 + jnp.dot(
            A, A.T, preferred_element_type=dtype
        )

    C = jax.block_until_ready(make_spd(key))
    flops = n**3 / 3.0

    @jax.jit
    def residual(L, M):
        # LINPACK-style check: ||M - L L^T||_max / ||M||_max
        R = M - jnp.dot(
            jnp.tril(L), jnp.tril(L).T,
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.max(jnp.abs(R)) / jnp.max(jnp.abs(M))

    def verified(name, fn):
        t, out = timeit(fn, C)
        r = float(jax.device_get(residual(out, C)))
        ok = r < 1e-5
        log(
            f"{name} cholesky N={n}: {t*1e3:.1f} ms  {flops/t/1e12:.2f} TFLOP/s"
            f"  residual={r:.2e}{'' if ok else '  [FAILED residual check]'}"
        )
        return t, ok

    # every variant must pass the residual check to count; the headline is
    # the fastest verified factorization (bf16x3 "high" passes on
    # well-conditioned operands like this one; see linalg docstring for the
    # conditioning limits that make "highest" the library default)
    t_xla, ok = verified("xla", jax.jit(linalg.xla_cholesky))
    best_t, best_name = (t_xla, "xla") if ok else (float("inf"), "none")
    for block, prec in ((512, "highest"), (1024, "highest"), (1024, "high"), (512, "high")):
        try:
            f = jax.jit(
                lambda M, b=block, p=prec: linalg.blocked_cholesky_opt(
                    M, block=b, update_precision=p
                )
            )
            t_b, ok = verified(f"blocked_opt({block},{prec})", f)
            if ok and t_b < best_t:
                best_t, best_name = t_b, f"blocked_opt({block},{prec})"
        except Exception as e:  # keep the bench alive if one variant fails
            log(f"blocked_opt({block},{prec}) failed: {type(e).__name__}: {e}")

    if best_name == "none":
        # no variant produced a verifiable factorization: emit an explicit
        # error record (never a plausible-looking 0.0 headline) and fail
        print(
            json.dumps(
                {
                    "metric": "cholesky_tflops_n16k_f32",
                    "value": 0.0,
                    "unit": "TFLOP/s",
                    "vs_baseline": 0.0,
                    "error": "no Cholesky variant passed the residual check",
                }
            )
        )
        sys.exit(1)
    tflops = flops / best_t / 1e12
    log(f"best: {best_name}  {tflops:.2f} TFLOP/s")

    # secondary: predict throughput at N=4096 (batched posterior)
    try:
        from madaiemulator_tpu.models.gp import GPData, precompute_predictor, \
            predict_from_precomputed
        from madaiemulator_tpu.ops.kernels import GPParams
        from madaiemulator_tpu.utils.config import GPConfig

        d, m = 8, 4096
        cfg = GPConfig(nparams=d, regression_order=1)
        rng = np.random.default_rng(0)
        X = jnp.asarray(rng.uniform(size=(4096, d)), dtype)
        y = jnp.asarray(rng.standard_normal(4096), dtype)
        p = GPParams(
            log_amp=jnp.asarray(0.0, dtype),
            log_nugget=jnp.asarray(np.log(1e-4), dtype),
            log_ls=jnp.full((d,), np.log(0.4), dtype),
        )
        st = jax.jit(
            lambda pp: precompute_predictor(pp, GPData(X, y), cfg)
        )(p)
        jax.block_until_ready(st)
        Xs = jnp.asarray(rng.uniform(size=(m, d)), dtype)
        pred = jax.jit(
            lambda s, pp, q: predict_from_precomputed(s, pp, GPData(X, y), q, cfg)
        )
        t_pred, _ = timeit(pred, st, p, Xs)
        log(f"predict N=4096 m={m}: {t_pred*1e3:.2f} ms  {m/t_pred:,.0f} pts/s")
    except Exception as e:
        log(f"predict bench failed: {type(e).__name__}: {e}")

    print(
        json.dumps(
            {
                "metric": "cholesky_tflops_n16k_f32",
                "value": round(tflops, 3),
                "unit": "TFLOP/s",
                "vs_baseline": round(tflops / 0.01, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
