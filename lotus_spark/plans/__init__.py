from lotus_spark.plans.lazyframe import LazyFrame
from lotus_spark.plans.optimizers import (
    DEFAULT_OPTIMIZERS,
    OPTIMIZABLE_PARAMS,
    CascadePrewarmOptimizer,
    GEPAOptimizer,
    InstructionSearchOptimizer,
    ParamPath,
    PredicatePushdownOptimizer,
    discover_params,
)

__all__ = [
    "LazyFrame",
    "DEFAULT_OPTIMIZERS",
    "OPTIMIZABLE_PARAMS",
    "PredicatePushdownOptimizer",
    "CascadePrewarmOptimizer",
    "InstructionSearchOptimizer",
    "GEPAOptimizer",
    "ParamPath",
    "discover_params",
]
