"""Partitioning helpers shared by UDF-heavy operators.

The semantic operators run row-at-a-time LLM work inside Arrow-batched
pandas UDFs — their wall-clock is (rows / cores) bound, so a
single-partition input (one compacted parquet file, a small createDataFrame)
would serialize the whole stage onto one core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin repartition to cluster parallelism — but ONLY when the
    input has fewer partitions than cores.

    Why: a small/compacted parquet table (one file, one row group) arrives
    as ONE partition, so an expensive per-row stage (shingle hashing, a
    pandas-UDF LLM call) would run on a single core (measured 1.5-5x slower
    end-to-end at sf0.1). At 100 TB the input already has thousands of
    partitions and this is a no-op — no gratuitous shuffle on the scale path.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
