"""Map the exact-variance serving envelope at N=65,536 (VERDICT r3 #3).

capability_64k's new exact-variance stage (1024 queries, query_chunk=256,
variance_rhs=128) crashed the TPU worker even though the 128-column strips
sit below the ≥256-wide-RHS crash threshold measured in round 3 — so the
envelope needs mapping at SERVE scale, not assumed from the solver-level
number. Fixed thetas (no fit): build the IterativePosteriorState once,
then try (query_chunk, variance_rhs) pairs from the capability setting
downward, one SUBPROCESS per attempt so a worker crash is an attempt
outcome, not the end of the probe.

Run: python bench/probe_exactvar_64k.py          (orchestrator)
     python bench/probe_exactvar_64k.py one QC RHS   (single attempt)
"""

import json
import subprocess
import sys
import time

import numpy as np

N, D, M = 65536, 8, 1024


def one(qc: int, rhs: int) -> None:
    import jax
    import jax.numpy as jnp

    from madaiemulator_tpu.models.gp import GPData
    from madaiemulator_tpu.models.iterative import (
        precompute_iterative_predictor,
        predict_iterative_from_state,
    )
    from madaiemulator_tpu.ops.kernels import GPParams
    from madaiemulator_tpu.utils.config import GPConfig
    from madaiemulator_tpu.utils.profiling import sync

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(N, D)).astype(np.float32))
    y = jnp.asarray(
        (np.sin(3 * np.asarray(X[:, 0])) + 0.05
         * rng.standard_normal(N)).astype(np.float32))
    data = GPData(X=X, y=y)
    cfg = GPConfig(nparams=D, regression_order=1)
    p = GPParams(
        log_amp=jnp.asarray(0.0, jnp.float32),
        log_nugget=jnp.asarray(np.log(3e-3), jnp.float32),
        log_ls=jnp.log(jnp.full((D,), 0.6, jnp.float32)),
    )
    t0 = time.perf_counter()
    st = precompute_iterative_predictor(p, data, cfg, rank=64)
    sync(st)
    print(f"# state built: {time.perf_counter() - t0:.1f} s",
          file=sys.stderr, flush=True)
    Xq = jnp.asarray(rng.uniform(size=(M, D)).astype(np.float32))
    t0 = time.perf_counter()
    m_x, v_x = predict_iterative_from_state(
        st, data, Xq, query_chunk=qc, variance_method="exact",
        variance_rhs=rhs, row_chunk=2048,
    )
    sync(m_x)
    wall = time.perf_counter() - t0
    print(json.dumps({
        "qc": qc, "rhs": rhs, "ok": True, "wall_s": round(wall, 1),
        "mean_var": float(np.mean(np.asarray(v_x))),
    }), flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        one(int(sys.argv[2]), int(sys.argv[3]))
        return
    for qc, rhs in [(256, 128), (128, 128), (128, 64), (64, 32)]:
        r = subprocess.run(
            [sys.executable, __file__, "one", str(qc), str(rhs)],
            capture_output=True, text=True, timeout=3000,
        )
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        if r.returncode == 0 and line.startswith("{"):
            print(line, flush=True)
            print(f"# ENVELOPE: qc={qc} rhs={rhs} works", flush=True)
            break
        err = (r.stderr.strip().splitlines() or ["?"])[-1]
        print(json.dumps({"qc": qc, "rhs": rhs, "ok": False,
                          "error": err[-160:]}), flush=True)


if __name__ == "__main__":
    main()
