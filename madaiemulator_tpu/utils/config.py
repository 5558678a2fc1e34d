"""Run configuration for the emulator.

TPU-native replacement for the reference's `optstruct` (ref: src/optstruct.c/.h
— mount empty this round, see SURVEY.md §0) and its CLI flags
(--regression_order, --covariance_fn, --pca_variance; ref:
src/interactive_emulator.c). One frozen dataclass consumed by fit / predict /
CLI alike, hashable so it can be a static argument under `jax.jit`.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Tuple


class CovarianceFamily(enum.Enum):
    """Covariance function families of the reference.

    POWER_EXPONENTIAL is the reference's "gaussian" covariance (ref:
    src/libEmu/emulator.c covariance_fn_gaussian): amplitude * exp(-0.5 *
    sum_d |dx_d / ell_d|^alpha) with per-dimension length scales.
    MATERN32 / MATERN52 are isotropic Matérn (single length scale), matching
    covariance_fn_matern_three / covariance_fn_matern_five.
    """

    POWER_EXPONENTIAL = "power_exponential"
    MATERN32 = "matern32"
    MATERN52 = "matern52"
    # ARD Matérn (per-dimension length scales) — an extension past the
    # reference's isotropic Matérn (ROADMAP feature): the scaled distance
    # r^2 = sum_d (dx_d / ell_d)^2 feeds the same Matérn polynomial.
    MATERN32_ARD = "matern32_ard"
    MATERN52_ARD = "matern52_ard"

    def num_length_scales(self, nparams: int) -> int:
        if self in (
            CovarianceFamily.POWER_EXPONENTIAL,
            CovarianceFamily.MATERN32_ARD,
            CovarianceFamily.MATERN52_ARD,
        ):
            return nparams  # ARD: one length scale per input dimension
        return 1  # isotropic Matérn, as in the reference

    def num_thetas(self, nparams: int) -> int:
        # theta layout (reference convention [U-hi]):
        #   theta[0] = amplitude, theta[1] = nugget, theta[2:] = length scales
        return 2 + self.num_length_scales(nparams)


# Reference CLI names for --covariance_fn (ref: src/interactive_emulator.c).
COVARIANCE_CLI_NAMES = {
    "power_exponential": CovarianceFamily.POWER_EXPONENTIAL,
    "gaussian": CovarianceFamily.POWER_EXPONENTIAL,
    "matern32": CovarianceFamily.MATERN32,
    "matern_three": CovarianceFamily.MATERN32,
    "matern52": CovarianceFamily.MATERN52,
    "matern_five": CovarianceFamily.MATERN52,
    # extensions (not in the reference)
    "matern32_ard": CovarianceFamily.MATERN32_ARD,
    "matern52_ard": CovarianceFamily.MATERN52_ARD,
}


@dataclasses.dataclass(frozen=True)
class GPConfig:
    """Static configuration of one scalar-GP emulation problem.

    Everything shape- or trace-relevant is here, so a `GPConfig` instance can
    be passed as a static arg to jitted functions. Trainable values (thetas)
    live in `madaiemulator_tpu.models.gp.GPParams` instead.
    """

    nparams: int
    covariance: CovarianceFamily = CovarianceFamily.POWER_EXPONENTIAL
    regression_order: int = 1  # polynomial mean order 0..3 (reference default 0 [U-med]; we default 1 like upstream docs recommend)
    power_exp_alpha: float = 2.0  # alpha of the power-exponential kernel [U-med: verify against reference]
    # Box bounds for optimization, in natural-parameter space. The reference
    # draws restarts uniformly inside per-theta ranges (ref:
    # src/libEmu/estimate_threaded.c / maxmultimin.c setup_optimization_ranges).
    amp_bounds: Tuple[float, float] = (1e-4, 1e4)
    nugget_bounds: Tuple[float, float] = (1e-9, 1.0)
    # Designs are scaled to [0,1]^d, so length scales far above the domain
    # size make C an all-ones matrix (cond ~ N*amp/jitter — unfactorable in
    # f32; restarts drawn there die with -inf). 10x the domain is already
    # "effectively constant"; widen explicitly for f64 runs if needed.
    length_scale_bounds: Tuple[float, float] = (1e-2, 1e1)
    # Stability floor added to the Gram diagonal on top of the nugget,
    # as a fraction of the kernel amplitude. None = auto: 0 in float64
    # (parity runs); at float32 max(1e-6, 12*sqrt(N)*eps) — the floor must
    # dominate the Gram build's own rounding noise (spectral norm ~
    # sqrt(N)*eps*amp) or borderline matrices at smooth-kernel thetas come
    # out truly indefinite and the fit objective walls off its best basins
    # with -inf (measured on TPU v5e: the flat 1e-6 floor cost ~100x fit
    # quality on smooth data; SURVEY.md §7 hard part 2: precision policy).
    jitter: float | None = None
    # Number of random restarts for hyperparameter fitting (pthreads fan-out
    # in the reference; a vmapped batch axis here).
    n_restarts: int = 8
    max_opt_steps: int = 100
    # Include the nugget in the predictive variance at new points (the
    # reference's covariance_fn adds the nugget when evaluating k(x*, x*)).
    predict_variance_includes_nugget: bool = True
    # Use the GLS profile (REML-style) extra term -0.5 log|H^T C^-1 H|.
    reml: bool = False
    # Gram/cross covariance builder: "xla" (matmul trick + fused epilogue;
    # works on every backend and dtype) or "pallas" (ops/pallas/pairwise.py:
    # one fused kernel per output tile — distance, kernel transform and
    # nugget never round-trip HBM). The Pallas path is f32, TPU-first
    # (interpretable on CPU via pallas_interpret), covers alpha=2
    # power-exponential and both Matérn families, and falls back to "xla"
    # for anything it does not cover (f64 parity runs, alpha != 2).
    # Gradients on the Pallas path are exact: a custom VJP differentiates
    # the identical XLA-level math (ops/kernels.py _pallas_cross_vjp).
    gram_method: str = "xla"
    # SPD factorization backend: "xla" (default; compiles small — use it for
    # fits, especially large N: the blocked kernel's unrolled panel loop
    # embedded in the optimizer linesearch can OOM the TPU compiler),
    # "left" (left-looking blocked, ops/linalg.left_cholesky — the fastest
    # large-N path: 22.4 TFLOP/s "high" / 15.9 "highest" at N=16k v5e, one
    # wide history GEMM per panel; best for serve-time precompute, direct
    # factorizations and the bench), "blocked" (right-looking
    # triangle-restricted SYRK; kept for comparison/compat), or "pallas"
    # (ops/pallas/cholesky.py: whole factorization VMEM-resident in ONE
    # kernel — the fit-hot-path size class N <= pallas_cholesky_max_n;
    # larger operands fall back to "left").
    cholesky_method: str = "xla"
    cholesky_block: int = 512
    # Largest N routed to the VMEM-resident Pallas Cholesky (matrix +
    # scratch must fit ~16 MB VMEM: 1024^2 f32 = 4 MB, comfortable).
    pallas_cholesky_max_n: int = 1024
    # Run Pallas kernels in interpreter mode (CPU testing of the Pallas
    # product routing; never set on real TPU runs).
    pallas_interpret: bool = False
    # matmul precision of the blocked SYRK/history updates. "highest" (full
    # f32) is the safe tier: left-looking factor error 1.9e-5 at cond 1e5
    # (N=4096 f32 vs f64). "high" (bf16x3) is ~40% faster but degrades to
    # 4.6e-4 at cond 1e5 and NaNs near cond 1e7 — safe only when the operand
    # conditioning is bounded. "auto" picks the tier per factorization from
    # the analytic GP bound kappa <= 1 + N*amp/nugget_eff
    # (ops/linalg.choose_update_precision); host-level callers resolve it
    # from concrete hyperparameters, traced callers fall back to "highest".
    cholesky_update_precision: str = "highest"
    # Batched predictions process queries in sequential chunks of this size
    # (None = all at once). At N=16k, an 8k-query predict holds ~24 GB of
    # XLA TriangularSolve temporaries — chunking to ~1k keeps temps ~100x
    # smaller while each chunk still fills the MXU.
    predict_query_chunk: int | None = None
    # LBFGS linesearch: "zoom" (strong-Wolfe, default) or "backtracking"
    # (Armijo; ~half the compiled objective instances — use for very large N
    # where compile size/time dominates).
    linesearch: str = "zoom"

    def __post_init__(self):
        if self.regression_order not in (0, 1, 2, 3):
            raise ValueError(
                f"regression_order must be 0..3, got {self.regression_order}"
            )
        if self.nparams < 1:
            raise ValueError(f"nparams must be >= 1, got {self.nparams}")
        if self.gram_method not in ("xla", "pallas"):
            raise ValueError(f"unknown gram_method {self.gram_method!r}")
        if self.cholesky_method not in ("xla", "left", "blocked", "pallas"):
            raise ValueError(
                f"unknown cholesky_method {self.cholesky_method!r}"
            )
        if self.cholesky_update_precision not in (
            "auto", "default", "high", "highest",
        ):
            raise ValueError(
                "unknown cholesky_update_precision "
                f"{self.cholesky_update_precision!r}"
            )

    @property
    def num_thetas(self) -> int:
        return self.covariance.num_thetas(self.nparams)

    @property
    def num_length_scales(self) -> int:
        return self.covariance.num_length_scales(self.nparams)

    @property
    def num_regression_fns(self) -> int:
        # Per-dimension pure powers, no cross terms (ref: src/libEmu/
        # regression.c makeHVector [U-med]): 1 + order * nparams columns.
        return 1 + self.regression_order * self.nparams
