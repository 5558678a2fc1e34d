"""One-chip N=65,536 matrix-free fit + serve (SURVEY.md §5 long-context analog).

Round 2 proved N=32,768 on one 16 GB chip; this doubles it (VERDICT r2 next
#3). Everything is O(N * (rank + probes)) memory — the Gram matrix never
exists. Pipeline:

  1. synthesize a d=8 design with a known smooth truth + iid noise floor;
  2. fit_gp_iterative (mbcg logdet, vg_batch=1, checkpointed) — the
     lock-step host LBFGS drives batched PCG + quadrature evaluations;
  3. precompute_iterative_predictor ONCE (round-3 serving cache), then
     memory-flat chunked predictions;
  4. report rmse vs truth against the noise floor (fit quality evidence).

Run:  python bench/capability_64k.py [N] [steps] [restarts]
"""

import json
import sys
import time

import numpy as np

NOISE = 0.05


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    restarts = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    import jax
    import jax.numpy as jnp

    from madaiemulator_tpu.models.gp import GPData
    from madaiemulator_tpu.models.iterative import (
        fit_gp_iterative,
        precompute_iterative_predictor,
        predict_iterative_from_state,
    )
    from madaiemulator_tpu.utils.config import GPConfig
    from madaiemulator_tpu.utils.profiling import sync

    d = 8
    rng = np.random.default_rng(0)
    Xh = rng.uniform(size=(n, d)).astype(np.float32)

    def truth(A):
        return np.sin(3 * A[:, 0]) + A[:, 1] ** 2 + 0.5 * np.cos(2 * A[:, 2])

    yh = truth(Xh) + NOISE * rng.standard_normal(n).astype(np.float32)
    X = jnp.asarray(Xh)
    y = jnp.asarray(yh, jnp.float32)
    data = GPData(X=X, y=y)
    cfg = GPConfig(
        nparams=d, regression_order=1, n_restarts=restarts,
        max_opt_steps=steps,
    )
    dev = jax.devices()[0]
    emit(device=f"{dev.platform} {getattr(dev, 'device_kind', '?')}",
         n=n, steps=steps, restarts=restarts)

    t0 = time.perf_counter()
    # tile limits measured on the axon worker: (1024, 131072) f32 (512 MB)
    # still crashes it; (512, 131072) (256 MB) runs — keep tiles <= 256 MB
    row_chunk = 2048 if n <= 65536 else max(256, (1 << 26) // n)
    res = fit_gp_iterative(
        jax.random.key(1), data, cfg, seed=0, rank=64, probes=8,
        lanczos_iters=20, cg_tol=1e-4, cg_max_iters=200, vg_batch=1,
        logdet_method="mbcg", checkpoint_path="/tmp/cap64k.ckpt",
        value_linesearch=True, row_chunk=row_chunk,
    )
    t_fit = time.perf_counter() - t0
    s = res.stats or {}
    emit(
        metric=f"iterative_fit_wallclock_n{n}", value=round(t_fit, 1),
        unit="s", logL=float(res.log_likelihood),
        breakdown={
            "compile_plus_first_eval_s": round(s.get("first_vg_wall_s", 0), 1),
            "steady_vg_wall_s": round(s.get("vg_wall_s", 0), 1),
            "n_vg_calls": s.get("n_vg_calls", 0),
            "n_steps": s.get("n_steps", 0),
        },
    )

    # serving: cache built once; chunked memory-flat predictions
    t0 = time.perf_counter()
    state = precompute_iterative_predictor(
        res.params, data, cfg, rank=64, cg_tol=1e-5, cg_max_iters=200,
        row_chunk=row_chunk,
    )
    sync(state.alpha)
    t_pre = time.perf_counter() - t0
    emit(metric="iterative_precompute_s", value=round(t_pre, 2))

    # Serve-time PCG programs (a (n, chunk)-RHS while_loop nested in the
    # query lax.map) crash the axon TPU worker at N=64k (observed at chunk
    # 1024 AND 256) — the same program-shape crash class as the R=4
    # restart-axis fit (ROADMAP). The 64k serve path therefore uses the
    # PCG-free routes: the mean is pure GEMMs (alpha is cached), and the
    # variance comes from the cached preconditioner's Woodbury apply
    # (variance_method="precond"). Exact-variance serving is cross-checked
    # on a small batch below.
    m = 2048
    Xq = jnp.asarray(rng.uniform(size=(m, d)), jnp.float32)
    t0 = time.perf_counter()
    mean, var = predict_iterative_from_state(
        state, data, Xq, query_chunk=256, variance_method="precond",
        row_chunk=row_chunk,
    )
    sync(mean)
    t_q = time.perf_counter() - t0
    rmse = float(np.sqrt(np.mean((np.asarray(mean) - truth(np.asarray(Xq))) ** 2)))
    emit(
        metric=f"iterative_predict_n{n}_m{m}", value=round(m / t_q),
        unit="pts/s", wall_s=round(t_q, 2),
        rmse_vs_truth=round(rmse, 4), noise_floor=NOISE,
        mean_var=float(np.mean(np.asarray(var))),
        variance_method="precond",
    )
    # a second batch must be CHEAP (no training solves — VERDICT r2 weak #1)
    t0 = time.perf_counter()
    mean2, _ = predict_iterative_from_state(
        state, data, Xq, query_chunk=256, variance_method="precond",
        row_chunk=row_chunk,
    )
    sync(mean2)
    emit(metric="iterative_predict_repeat_s", value=round(time.perf_counter() - t0, 2))

    # exact-variance cross-check on a small batch (PCG with few RHS is the
    # same program class the fit already runs safely)
    m_small = 64
    t0 = time.perf_counter()
    m_e, v_e = predict_iterative_from_state(
        state, data, Xq[:m_small], query_chunk=m_small,
        variance_method="exact", row_chunk=row_chunk,
    )
    sync(m_e)
    emit(
        metric="iterative_predict_exactvar_check",
        wall_s=round(time.perf_counter() - t0, 2), m=m_small,
        max_dmean=float(np.max(np.abs(np.asarray(m_e) - np.asarray(mean)[:m_small]))),
        precond_var_over_exact=float(
            np.mean(np.asarray(var)[:m_small]) / max(np.mean(np.asarray(v_e)), 1e-30)
        ),
    )

    # EXACT-variance serve at scale (VERDICT r3 next #3): 1024 queries via
    # predict_iterative_host — HOST-side chunk loop, one narrow single-PCG
    # program per 64-query call. The in-graph multi-chunk route (nested
    # lax.map x while_loop) crashes the axon worker at EVERY chunking
    # tried at this N, down to (qc=64, rhs=32) — measured,
    # bench/probe_exactvar_64k.py. Parity is pinned against the narrow
    # single-call check above (same math, chunk-by-chunk identical).
    from madaiemulator_tpu.models.iterative import predict_iterative_host

    m_big = 1024
    t0 = time.perf_counter()
    m_x, v_x = predict_iterative_host(
        state, data, Xq[:m_big], chunk=64,
        variance_method="exact", row_chunk=row_chunk,
    )
    t_x = time.perf_counter() - t0
    emit(
        metric=f"iterative_predict_exactvar_n{n}_m{m_big}",
        value=round(m_big / t_x, 1), unit="pts/s", wall_s=round(t_x, 2),
        variance_method="exact", host_chunk=64,
        max_dvar_vs_narrow=float(
            np.max(np.abs(np.asarray(v_x)[:m_small] - np.asarray(v_e)))
        ),
        max_dmean_vs_narrow=float(
            np.max(np.abs(np.asarray(m_x)[:m_small] - np.asarray(m_e)))
        ),
        mean_var=float(np.mean(np.asarray(v_x))),
    )


if __name__ == "__main__":
    main()
