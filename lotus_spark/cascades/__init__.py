from lotus_spark.cascades.utils import (
    CascadeArgs,
    importance_sampling,
    calibrate_scores,
    learn_filter_thresholds,
)

__all__ = [
    "CascadeArgs",
    "importance_sampling",
    "calibrate_scores",
    "learn_filter_thresholds",
]
