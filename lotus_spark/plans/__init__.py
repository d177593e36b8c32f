from lotus_spark.plans.lazyframe import LazyFrame
from lotus_spark.plans.optimizers import (
    DEFAULT_OPTIMIZERS,
    CascadePrewarmOptimizer,
    InstructionSearchOptimizer,
    PredicatePushdownOptimizer,
)

__all__ = [
    "LazyFrame",
    "DEFAULT_OPTIMIZERS",
    "PredicatePushdownOptimizer",
    "CascadePrewarmOptimizer",
    "InstructionSearchOptimizer",
]
