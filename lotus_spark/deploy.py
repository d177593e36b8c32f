"""Cluster deployment sizing for the engine (the 100 TB arithmetic).

Separate from ``session.py`` on purpose: ``get_spark`` is the local/test
entry point every operator assumes; this module is the DEPLOYMENT story
— the conf a real 1000-executor job ships with, derived from cluster
shape and input size instead of folklore. Nothing imports it at query
time.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def cluster_conf(
    total_cores: int,
    input_bytes: int | None = None,
    executor_memory_gb: int = 16,
    target_partition_bytes: int = 128 << 20,
) -> dict[str, str]:
    """Recommended Spark conf for a REAL cluster deployment of this
    engine (e.g. 1000 executors × 4 cores reading ~100 TB), with the
    sizing arithmetic in one audited place:

    - ``spark.sql.shuffle.partitions`` (doubling as AQE's
      ``initialPartitionNum``): ``max(2 × total_cores, input_bytes /
      target_partition_bytes, 32)`` — enough granularity that no
      post-shuffle partition exceeds ``target_partition_bytes`` on the
      biggest stage, and at least two waves per core so one straggler
      doesn't idle the fleet. AQE *coalesces* downward at runtime
      (cheap); recovering from too FEW partitions needs a re-shuffle
      (expensive) — so err high. At 100 TB / 128 MB that's ~800k
      initial partitions, which AQE collapses to the real post-filter
      sizes stage by stage.
    - ``spark.sql.adaptive.advisoryPartitionSizeInBytes`` = 64 MB: the
      post-coalesce target; spills rarely at ``executor_memory_gb /
      cores_per_executor`` headroom.
    - ``spark.sql.files.maxPartitionBytes`` = 256 MB: scan-side split
      size — parquet is columnar+compressed, so a 256 MB split
      decompresses to roughly the working set of a 64 MB shuffle
      partition.
    - ``spark.sql.autoBroadcastJoinThreshold`` = 256 MB: with ≥ 16 GB
      executors a dimension table up to this size broadcasts instead of
      shuffling the fact side (operators also hint ``broadcast()``
      where the dim is known-small, and bytes-guard their own
      driver-side broadcasts).
    - skew join stays on with Spark's factor/threshold defaults: the
      dedup/join operators here are deliberately AQE-splittable
      (aggregate + semi-join instead of hot-key windows), which is what
      makes this flag effective.
    - Arrow batch 10k rows bounds per-batch memory of the pandas-UDF
      stages (embedding/LM/multimodal) regardless of row width.

    Returns plain strings usable via ``apply_cluster_conf``,
    ``spark-submit --conf``, or a cluster template. local[N] tests use
    the same shapes with partitions sized to the box
    (``session.get_spark``).
    """
    if total_cores < 1:
        raise ValueError("total_cores must be >= 1")
    if executor_memory_gb < 1:
        raise ValueError("executor_memory_gb must be >= 1")
    parts = 2 * total_cores
    if input_bytes:
        parts = max(parts, input_bytes // target_partition_bytes)
    parts = max(parts, 32)
    return {
        "spark.sql.shuffle.partitions": str(parts),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum": str(parts),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(64 << 20),
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.files.maxPartitionBytes": str(256 << 20),
        "spark.sql.autoBroadcastJoinThreshold": str(256 << 20),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        "spark.sql.session.timeZone": "UTC",
        "spark.executor.memory": f"{executor_memory_gb}g",
    }


def apply_cluster_conf(
    builder: SparkSession.Builder, conf: dict[str, str]
) -> SparkSession.Builder:
    """Fold a ``cluster_conf`` dict into a SparkSession builder."""
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder
