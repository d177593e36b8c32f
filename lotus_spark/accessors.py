"""DataFrame method injection — the pandas-accessor feel on pyspark.

The reference registers semantic ops as pandas DataFrame accessors
(``lotus/sem_ops/sem_map.py:121`` etc.). pyspark has no accessor registry, so
``install()`` monkey-patches the operator functions as ``DataFrame`` methods:

    import lotus_spark; lotus_spark.accessors.install()
    df.sem_filter("{Text} is positive")

Functional style (``lotus_spark.sem_filter(df, ...)``) always works; install
is optional sugar and is idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

import lotus_spark as ls

_METHODS = {
    "sem_map": ls.sem_map,
    "sem_filter": ls.sem_filter,
    "sem_extract": ls.sem_extract,
    "sem_join": ls.sem_join,
    "sem_agg": ls.sem_agg,
    "sem_topk": ls.sem_topk,
    "sem_index": ls.sem_index,
    "load_sem_index": ls.load_sem_index,
    "sem_search": ls.sem_search,
    "sem_sim_join": ls.sem_sim_join,
    "sem_cluster_by": ls.sem_cluster_by,
    "sem_dedup": ls.sem_dedup,
    "sem_partition_by": ls.sem_partition_by,
    "llm_as_judge": ls.llm_as_judge,
    "pairwise_judge": ls.pairwise_judge,
}


def install() -> None:
    for name, fn in _METHODS.items():
        if not hasattr(DataFrame, name):
            setattr(DataFrame, name, fn)


def uninstall() -> None:
    for name in _METHODS:
        if hasattr(DataFrame, name):
            delattr(DataFrame, name)
