"""madaiemulator_tpu — a TPU-native Gaussian-process emulator framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of MADAI/MADAIEmulator
(the Gaussian-process emulator library of the MADAI collaboration): GP
hyperparameter estimation by maximizing the log-marginal likelihood,
power-exponential / Matérn covariance over scaled design points, polynomial
regression mean functions (GLS), multivariate outputs via PCA projection with
independent per-component GPs, text-snapshot persistence, and an interactive
stdin/stdout serving protocol.

Architecture is TPU-first, not a translation:
  * covariance (Gram) construction is a batched MXU matmul (scaled-sqdist
    trick) rather than an O(N^2 d) scalar loop;
  * Cholesky / triangular solves / logdet run through one `linalg` interface
    with XLA and blocked (MXU-tiled) implementations;
  * likelihood gradients are exact (autodiff), replacing the reference's
    finite differences;
  * multi-restart optimization is `vmap`ed over the restart axis, replacing
    pthreads; PCA components and whole emulator ensembles are additional
    `vmap`/`shard_map` batch axes sharded over a `jax.sharding.Mesh`.

Reference provenance: /root/reference was EMPTY this round (see SURVEY.md §0);
behavioral claims follow BASELINE.json's north-star contract [B] and upstream
knowledge of github.com/MADAI/MADAIEmulator [U-*]. Expected upstream files are
cited per-module as `ref: src/...` without line numbers; re-attach real
file:line citations once the mount is populated.
"""

from madaiemulator_tpu.utils.config import GPConfig, CovarianceFamily
from madaiemulator_tpu.models.gp import (
    GPData,
    log_marginal_likelihood,
    log_marginal_likelihood_ad,
    gp_posterior,
    precompute_predictor,
    precompute_fast_predictor,
    predict_fast,
    predict_from_precomputed,
    predict_gradient,
)
from madaiemulator_tpu.models.fit import (
    AlphaFitResult,
    FitResult,
    fit_gp,
    fit_gp_alpha,
    fit_gp_host,
)
from madaiemulator_tpu.models.iterative import (
    IterativePosteriorState,
    fit_gp_iterative,
    lml_iterative,
    precompute_iterative_predictor,
    predict_iterative,
    predict_iterative_from_state,
)
from madaiemulator_tpu.models.multivariate import (
    MultivariateEmulator,
    fit_multivariate,
    predict_multivariate,
    predict_multivariate_gradient,
    project_gradients,
    project_noise,
)
from madaiemulator_tpu.models.multifidelity import (
    MultiFidelityEmulator,
    MultivariateMultiFidelityEmulator,
    fit_multifidelity,
    fit_multivariate_multifidelity,
    predict_multifidelity,
    predict_multivariate_multifidelity,
)
from madaiemulator_tpu.models.sparse import (
    SparseMultivariateEmulator,
    fit_multivariate_sparse,
    fit_sgpr,
    fit_sgpr_host,
    predict_multivariate_sparse,
    predict_sgpr,
)
from madaiemulator_tpu.utils.compile_cache import enable_compile_cache
from madaiemulator_tpu.models.calibrate import (
    CalibrationResult,
    calibrate,
    implausibility,
    make_log_posterior,
    run_emcee,
    run_hmc,
    run_parallel_tempering,
    run_rwm,
)
from madaiemulator_tpu.models.sensitivity import (
    SobolResult,
    gp_mean_fn,
    main_effects,
    multivariate_mean_fn,
    sobol_indices,
)
from madaiemulator_tpu.models.design import (
    DesignProposal,
    active_variance_design,
    nroy_wave_design,
)
from madaiemulator_tpu.models.diagnostics import (
    holdout_cv_multivariate,
    holdout_summary_multivariate,
    posterior_covariance_iterative,
    sample_multivariate_posterior_iterative,
    LOOResult,
    loo_cv,
    loo_cv_multivariate,
    loo_summary,
    loo_summary_multivariate,
    posterior_covariance,
    sample_multivariate_posterior,
    sample_posterior,
    validation_summary,
)

__version__ = "0.1.0"

__all__ = [
    "GPConfig",
    "CovarianceFamily",
    "GPData",
    "log_marginal_likelihood",
    "log_marginal_likelihood_ad",
    "gp_posterior",
    "precompute_predictor",
    "precompute_fast_predictor",
    "predict_fast",
    "predict_gradient",
    "SobolResult",
    "gp_mean_fn",
    "main_effects",
    "multivariate_mean_fn",
    "sobol_indices",
    "predict_from_precomputed",
    "fit_gp",
    "fit_gp_alpha",
    "fit_gp_host",
    "AlphaFitResult",
    "IterativePosteriorState",
    "fit_gp_iterative",
    "lml_iterative",
    "precompute_iterative_predictor",
    "predict_iterative",
    "predict_iterative_from_state",
    "FitResult",
    "MultivariateEmulator",
    "fit_multivariate",
    "project_noise",
    "enable_compile_cache",
    "project_gradients",
    "predict_multivariate_gradient",
    "MultiFidelityEmulator",
    "MultivariateMultiFidelityEmulator",
    "fit_multifidelity",
    "fit_multivariate_multifidelity",
    "predict_multifidelity",
    "predict_multivariate_multifidelity",
    "SparseMultivariateEmulator",
    "fit_multivariate_sparse",
    "fit_sgpr",
    "fit_sgpr_host",
    "predict_multivariate_sparse",
    "predict_sgpr",
    "predict_multivariate",
    "CalibrationResult",
    "calibrate",
    "implausibility",
    "make_log_posterior",
    "run_emcee",
    "run_hmc",
    "run_parallel_tempering",
    "run_rwm",
    "DesignProposal",
    "active_variance_design",
    "nroy_wave_design",
    "LOOResult",
    "holdout_cv_multivariate",
    "holdout_summary_multivariate",
    "posterior_covariance_iterative",
    "sample_multivariate_posterior_iterative",
    "loo_cv",
    "loo_cv_multivariate",
    "loo_summary",
    "loo_summary_multivariate",
    "posterior_covariance",
    "sample_posterior",
    "sample_multivariate_posterior",
    "validation_summary",
    "__version__",
]
