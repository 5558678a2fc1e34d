"""Million-point emulation on one chip with sparse variational GPs.

Scenario: a cheap-but-noisy simulator (or a huge archive of runs) produced
far more training points than any exact GP can factor — the dense one-chip
envelope is N=65,536 (docs/ROUND3.md). SGPR (models/sparse.py) compresses
the million-point likelihood through m inducing points: every training
step streams the N axis in fixed-size chunks (memory flat in N), and the
trained emulator is an O(m^2) state that serves from a few MB.

1. Generate N=50,000 noisy training points (1e6 on a real chip — the
   --tpu path below; the CPU default sizes down to finish in minutes).
2. Fit with m=128 inducing points, streaming in 8k-row chunks.
3. Serve + check accuracy against the noiseless truth.
4. Persist to a sparse snapshot and reload — the file holds the serve
   state, not the (huge) training set.

Run: python examples/million_point_sparse.py   (CPU f64; --tpu for chip —
on the chip raise N to 1_000_000, m to 512, row_chunk to 65536)
"""

import sys

import jax

if "--tpu" in sys.argv:
    sys.argv.remove("--tpu")
    N, M, CHUNK = 1_000_000, 512, 65_536
else:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    N, M, CHUNK = 50_000, 128, 8_192

import numpy as np
import jax.numpy as jnp

from madaiemulator_tpu import (
    GPConfig,
    GPData,
    fit_sgpr,
    predict_sgpr,
)
from madaiemulator_tpu.io.snapshot import read_snapshot_auto

d = 3
cfg = GPConfig(nparams=d, regression_order=1, n_restarts=2,
               max_opt_steps=30, linesearch="backtracking")

key = jax.random.key(0)
kx, ke, kq = jax.random.split(key, 3)
X = jax.random.uniform(kx, (N, d))


def truth(X):
    return jnp.sin(4 * X[:, 0]) + 0.5 * jnp.cos(3 * X[:, 1]) + X[:, 2] ** 2


y = truth(X) + 0.1 * jax.random.normal(ke, (N,))

print(f"fitting SGPR: N={N:,}, m={M}, row_chunk={CHUNK:,} ...")
res = fit_sgpr(jax.random.key(1), GPData(X=X, y=y), cfg, inducing=M,
               restart_chunk=1, row_chunk=CHUNK)
print(f"  elbo = {float(res.elbo):,.1f}  (state ok: {bool(res.state.ok)})")

Xq = jax.random.uniform(kq, (2000, d))
mean, var = predict_sgpr(res.state, res.params, cfg, Xq)
rmse = float(jnp.sqrt(jnp.mean((mean - truth(Xq)) ** 2)))
print(f"  serve rmse vs noiseless truth: {rmse:.4f} "
      f"(observation noise was 0.1)")
assert rmse < 0.05

# persistence: the snapshot is the O(m^2) distillate, not the data.
# (Scalar outputs persist through the multivariate container exactly like
# the dense path: one PCA component.)
from madaiemulator_tpu import fit_multivariate_sparse, predict_multivariate_sparse

emu = fit_multivariate_sparse(jax.random.key(1), X, y[:, None], cfg,
                              inducing=M, restart_chunk=1, row_chunk=CHUNK)
from madaiemulator_tpu.io.snapshot import write_snapshot_sparse_npz

write_snapshot_sparse_npz("/tmp/million.npz", emu, ["x0", "x1", "x2"], ["f"])
emu2, _, _ = read_snapshot_auto("/tmp/million.npz")
m2, _ = predict_multivariate_sparse(emu2, Xq)
print(f"  snapshot round-trip max |dmean| = "
      f"{float(jnp.max(jnp.abs(m2[:, 0] - predict_multivariate_sparse(emu, Xq)[0][:, 0]))):.2e}")
print("done.")
