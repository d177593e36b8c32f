"""Training-export sharding: deterministic global corpus shuffle.

The last step of a curation pipeline before a training job reads the
corpus: assign every row a ``(shard, pos)`` coordinate so data loaders
can stream shards independently in a reproducible pseudo-random order
(the WebDataset / tar-shard layout). Lives in its own module (not
``sampling.py``) so the sampling operators' registry rotation state is
untouched; shares the content-hash bucket via import — one hash
definition, mirrored by the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lotus_spark.functions.sampling import _content_bucket


def shard_for_training(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: int = 0,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic global corpus shuffle + sharding for training
    export: every row gets a ``(shard, pos)`` coordinate where ``shard``
    is a content-hash residue (map-only, zero shuffle) and ``pos`` ranks
    the shard's rows by an INDEPENDENT content hash — a reproducible
    pseudo-random total order under ``ORDER BY shard, pos`` with no
    correlation between a row's shard and its position. Training jobs
    then read shards in any subset/order and stream rows by ``pos``,
    which is what data loaders actually need from "shuffle the corpus".

    Scale: the only exchange is the per-shard ``row_number`` window —
    and the partition key is the hash-uniform ``shard`` column, so the
    window CANNOT be skew-hot (contrast a global
    ``row_number() OVER (ORDER BY rand())``: ONE task sorts the
    corpus). Rows-per-shard ~ n/n_shards by hash uniformity; pick
    n_shards so a shard fits an executor (1k-100k shards at 100 TB),
    the same sizing rule as bucketed tables. Assignment and order are
    pure functions of (id, seed): partition-layout-independent,
    retry-stable, and SQL-replayable (oracle ``shard_for_training``);
    ``seed`` re-shuffles between epochs/exports.

    NULL ids all hash identically (see ``sampling.hash_split``) and
    land in one shard ordered by the id tiebreak; fix your ids.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    shard = F.pmod(_content_bucket(id_col, salt=f":s{seed}"),
                   F.lit(n_shards))
    okey = _content_bucket(id_col, salt=f":o{seed}")
    w = Window.partitionBy(shard_col).orderBy("__okey", id_col)
    return (
        df.withColumn(shard_col, shard)
        .withColumn("__okey", okey)
        .withColumn(pos_col, F.row_number().over(w))
        .drop("__okey")
    )


def write_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    seed: int = 0,
    shard_col: str = "shard",
    pos_col: str = "pos",
    fmt: str = "parquet",
) -> None:
    """Materialize :func:`shard_for_training`'s layout: ONE file per
    shard directory, rows physically ordered by ``pos`` inside it — the
    on-disk contract data loaders stream (open shard, read rows in
    order, no further sort). The plan is repartition-by-shard (each
    shard lands in exactly ONE task, keys hash-uniform so no hot task)
    → ``sortWithinPartitions(shard, pos)`` → ``partitionBy(shard)``
    write: a single shuffle end-to-end — the ``pos`` window already
    hash-partitions by shard, so no further repartition is added and
    the within-task sort IS the shard order; each task streams its
    shards out already sorted.

    At 100 TB: shards ≈ corpus/n_shards bytes each; size ``n_shards``
    so one shard fits an executor's write buffer comfortably (the same
    1k-100k guidance as :func:`shard_for_training`). Determinism: the
    file CONTENT (row order included) is a pure function of (data, id,
    seed); only parquet metadata (e.g. created-by timestamps) varies
    between runs.
    """
    out = shard_for_training(df, id_col, n_shards, seed=seed,
                             shard_col=shard_col, pos_col=pos_col)
    (
        out.sortWithinPartitions(shard_col, pos_col)
        .write.partitionBy(shard_col).mode("error").format(fmt)
        .save(path)
    )
