"""sem_cluster_by — KMeans clustering of a column's embeddings.

Reference semantics (``lotus/sem_ops/sem_cluster_by.py:57-86``,
``lotus/utils.py:14-72``): KMeans (FAISS, ``niter`` iterations) over the
indexed column's vectors; appends ``cluster_id``.

Spark design: MLlib ``KMeans`` (distributed Lloyd's) on the embedding column
(``array<float>`` → ml vector via ``array_to_vector``); ``prediction`` →
``cluster_id``. Seeded for reproducibility. MLlib trains on a sampled/cached
vector column and scales to arbitrary row counts — no driver materialization.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lotus_spark.operators.sem_index import _resolve_rm, with_embeddings


def sem_cluster_by(
    df: DataFrame,
    col: str,
    ncentroids: int,
    rm: Any = None,
    niter: int = 20,
    seed: int = 42,
    cluster_col: str = "cluster_id",
    emb_col: Optional[str] = None,
    method: str = "mllib",
    id_col: Optional[str] = None,
    train_sample: Optional[tuple] = None,
    max_train_rows: Optional[int] = 1_000_000,
) -> DataFrame:
    """``method="mllib"`` (default): MLlib KMeans — float treeAggregate,
    fastest, but reduction-order-dependent (not reproducible across
    engines/topologies). ``method="deterministic"``: integer-quantized
    Lloyd's (``functions/kmeans.py``) — bit-identical assignments on any
    topology and SQL-oracle-checkable; requires a numeric ``id_col`` for
    the seeded init.

    Centroid TRAINING is sample-bounded when ``id_col`` is given
    (``train_sample=(seed, threshold)`` pins an explicit hash sample;
    otherwise an auto sample kicks in above ``max_train_rows`` — see
    ``functions/ann.py::_resolve_train_filter``): Lloyd's iterations
    aggregate over the sample, cluster ASSIGNMENT still covers every
    row. At 100 TB the niter full-table passes dominate a full-corpus
    fit; centroids need a representative sample, not the corpus."""
    if method not in ("mllib", "deterministic"):
        raise ValueError(f"unknown method {method!r}")
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    scored = df
    ecol = emb_col
    if ecol is None:
        model = _resolve_rm(rm)
        scored = with_embeddings(scored, col, model, "__emb")
        ecol = "__emb"

    train_filter = None
    if id_col is not None:
        from lotus_spark.functions.ann import _resolve_train_filter

        train_filter = _resolve_train_filter(
            scored, id_col, seed, train_sample, max_train_rows)
    elif train_sample is not None:
        raise ValueError("train_sample requires id_col")

    if method == "deterministic":
        if id_col is None:
            raise ValueError("method='deterministic' requires id_col")
        from lotus_spark.functions.kmeans import deterministic_kmeans

        out, _ = deterministic_kmeans(
            scored, ecol, id_col, ncentroids, iters=niter,
            seed=seed, cluster_col=cluster_col, train_filter=train_filter,
        )
        if emb_col is None:
            out = out.drop("__emb")
        return out

    vec_df = scored.withColumn("__features", array_to_vector(F.col(ecol).cast("array<double>")))
    train_df = vec_df.filter(train_filter) if train_filter is not None else vec_df
    km = KMeans(k=ncentroids, maxIter=niter, seed=seed, featuresCol="__features",
                predictionCol=cluster_col)
    fitted = km.fit(train_df)
    out = fitted.transform(vec_df).drop("__features")
    if emb_col is None:
        out = out.drop("__emb")
    return out.withColumn(cluster_col, F.col(cluster_col).cast("int"))
