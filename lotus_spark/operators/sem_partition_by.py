"""sem_partition_by — attach a semantic partition id.

Reference semantics (``lotus/sem_ops/sem_partition_by.py:60-67``): apply a
``partition_fn(df) -> assignments`` (typically clustering) and store
``_lotus_partition_id``, later consumed by ``sem_agg``'s fold ordering.

Spark design: the partition fn is any DataFrame → DataFrame transformation
that appends ``_lotus_partition_id`` (default: ``sem_cluster_by``). We then
``repartition`` by the id so each semantic partition is physically co-located
— the grouped-aggregation fold reads its group without a second shuffle.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PARTITION_COL = "_lotus_partition_id"


def sem_partition_by(
    df: DataFrame,
    partition_fn: Optional[Callable[[DataFrame], DataFrame]] = None,
    col: Optional[str] = None,
    ncentroids: int = 2,
    rm: Any = None,
    repartition: bool = True,
) -> DataFrame:
    if partition_fn is not None:
        out = partition_fn(df)
        if PARTITION_COL not in out.columns:
            raise ValueError(f"partition_fn must add a {PARTITION_COL!r} column")
    else:
        if col is None:
            raise ValueError("pass either partition_fn or col")
        from lotus_spark.operators.sem_cluster_by import sem_cluster_by

        out = sem_cluster_by(df, col, ncentroids, rm=rm, cluster_col=PARTITION_COL)
    if repartition:
        out = out.repartition(F.col(PARTITION_COL))
    return out
