"""Mesh-sharded ensembles and sharded serving."""

from madaiemulator_tpu.parallel.ensemble import (
    fit_ensemble,
    fit_ensemble_from_starts,
    make_mesh,
    predict_ensemble,
    predict_queries_sharded,
)

__all__ = [
    "fit_ensemble",
    "fit_ensemble_from_starts",
    "make_mesh",
    "predict_ensemble",
    "predict_queries_sharded",
]
