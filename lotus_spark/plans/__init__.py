from lotus_spark.plans.lazyframe import LazyFrame
from lotus_spark.plans.optimizers import (
    DEFAULT_OPTIMIZERS,
    OPTIMIZABLE_PARAMS,
    CalibrationStore,
    CascadePrewarmOptimizer,
    GEPAOptimizer,
    InstructionSearchOptimizer,
    ParamPath,
    FilterReorderOptimizer,
    PredicatePushdownOptimizer,
    discover_params,
)

__all__ = [
    "LazyFrame",
    "DEFAULT_OPTIMIZERS",
    "OPTIMIZABLE_PARAMS",
    "FilterReorderOptimizer",
    "PredicatePushdownOptimizer",
    "CalibrationStore",
    "CascadePrewarmOptimizer",
    "InstructionSearchOptimizer",
    "GEPAOptimizer",
    "ParamPath",
    "discover_params",
]
