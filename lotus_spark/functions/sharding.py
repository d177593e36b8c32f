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
