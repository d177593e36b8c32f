"""Bucketed-table storage: shuffle-free co-located joins and aggregations.

The missing piece between "one-shot query" and "table queried all day":
a big⋈big equi-join shuffles BOTH sides on the key every time it runs —
at 100 TB that is the dominant cost of every repeat join. Spark's bucketed
tables (``DataFrameWriter.bucketBy``; Hive bucketing spec) pay that shuffle
ONCE at write time: rows are hash-distributed into a fixed number of bucket
files per partition, the layout is recorded in the catalog, and any later
equi-join or aggregation on the bucket key between tables with compatible
bucket counts reads co-located buckets directly — ``SortMergeJoin`` with
NO Exchange on either side (pinned in ``tests/test_plan_shapes.py``).

This is the storage-layer analog of what ``functions/joins.py`` does at
query time (broadcast / salting): amortize the shuffle across every future
query instead of optimizing a single plan. The standard 100 TB pattern:
fact and dimension-of-record tables bucketed on the join key (orders and
lineitem on orderkey; documents and embeddings on doc id), ``sortBy`` the
same key so merge-join input order is also free.

Reference parity note: the reference engine exposes persisted sorted/
partitioned table layouts through its catalog (lotus's own data lives in
pandas frames; the Spark-first analog of "keep the corpus organized for
the next query" is exactly a bucketed+sorted table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str] | str,
    n_buckets: int,
    sort_cols: list[str] | str | None = None,
    path: str | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) catalog table.

    ``n_buckets`` sizing at scale: buckets are PER PARTITION FILES and the
    join-time task count, so pick roughly (table size / executor-digestible
    split) — e.g. ~100 TB / 256 MB ≈ 400k is too many tasks, so bucket the
    JOIN KEY space instead: 4096-32768 buckets keeps each bucket in the
    GB range and joins at full cluster width. Both join sides need equal
    (or integer-multiple, with ``spark.sql.bucketing.coalesceBucketsInJoin
    .enabled``) bucket counts on the same key.

    ``path`` makes the table EXTERNAL (data at ``path``, metadata in the
    session catalog) — pass it in tests/ephemeral runs so nothing lands in
    the default warehouse directory.
    """
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    if isinstance(sort_cols, str):
        sort_cols = [sort_cols]
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    w = (
        df.write.format(fmt).mode(mode)
        .bucketBy(n_buckets, bucket_cols[0], *bucket_cols[1:])
    )
    if sort_cols:
        w = w.sortBy(sort_cols[0], *sort_cols[1:])
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Catalog read of a bucketed table. The bucket layout only drives
    planning through the catalog — ``spark.read.parquet(path)`` on the
    same files would NOT know the bucketing — so co-located consumers
    must read via the table name."""
    return spark.table(name)


def drop_bucketed(spark: SparkSession, name: str) -> None:
    """Drop the catalog entry (external table data is left in place)."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
