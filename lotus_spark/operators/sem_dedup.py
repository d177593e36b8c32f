"""sem_dedup — semantic near-duplicate removal.

Reference semantics (``lotus/sem_ops/sem_dedup.py:32-91``): self sim-join,
keep pairs with ``_scores > threshold``, build the duplicate graph, connected
components, drop all but one representative (minimum id) per component.

Spark design: embeddings → pair generation (full self-join for the exact
tier; cluster-blocked at scale) → JVM-side cosine threshold → connected
components. Components are computed by driver union-find when the edge set is
small (duplicate edges are sparse by construction), else by iterative min-
label propagation over DataFrames (each round is one join + groupBy; loops
until a fixpoint — the standard large-scale CC algorithm without GraphFrames).
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lotus_spark.functions.vectors import pair_cosine
from lotus_spark.operators.sem_index import _resolve_rm, with_embeddings

_DRIVER_CC_MAX_EDGES = 1_000_000


def connected_components_edges(edges: DataFrame, max_driver_edges: int = _DRIVER_CC_MAX_EDGES) -> DataFrame:
    """(src, dst) edge df → (id, component) df, component = min reachable id."""
    n_edges = edges.count()
    if n_edges == 0:
        return edges.sparkSession.createDataFrame([], "id long, component long")
    if n_edges <= max_driver_edges:
        rows = edges.collect()
        parent: dict = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in rows:
            a, b = find(r["src"]), find(r["dst"])
            if a != b:
                parent[max(a, b)] = min(a, b)
        data = [(x, find(x)) for x in list(parent)]
        return edges.sparkSession.createDataFrame(data, "id long, component long")

    # distributed min-label propagation
    und = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    labels = (
        und.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    spark = edges.sparkSession
    for _ in range(50):  # diameter bound; duplicates cluster tightly
        nbr = (
            und.join(labels, und.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr, labels.id == nbr.src, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint()
        changed = (
            labels.alias("a")
            .join(new_labels.alias("b"), "id")
            .filter(F.col("a.component") != F.col("b.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def sem_dedup(
    df: DataFrame,
    col: str,
    threshold: float,
    rm: Any = None,
    id_col: Optional[str] = None,
    emb_col: Optional[str] = None,
) -> DataFrame:
    """Remove semantic near-duplicates of ``col`` at cosine > ``threshold``.

    Keeps the minimum-id representative of each duplicate component.
    ``id_col`` should be a stable unique long column; if absent one is
    derived (and the df persisted so ids stay consistent across the plan).
    """
    work = df
    own_id = id_col is None
    if own_id:
        id_col = "__dedup_id"
        work = work.withColumn(id_col, F.monotonically_increasing_id())
        work = work.localCheckpoint()  # freeze ids across the self-join
    ecol = emb_col
    if ecol is None:
        work = with_embeddings(work, col, _resolve_rm(rm), "__emb")
        ecol = "__emb"

    a = work.select(F.col(id_col).alias("src"), F.col(ecol).alias("__ea"))
    b = work.select(F.col(id_col).alias("dst"), F.col(ecol).alias("__eb"))
    pairs = a.join(b, a.src < b.dst)  # i<j halves the pair space
    edges = (
        pairs.withColumn("__s", pair_cosine(F.col("__ea"), F.col("__eb")))
        .filter(F.col("__s") > threshold)
        .select("src", "dst")
    )
    comps = connected_components_edges(edges)
    # representative = min id per component; drop every other member
    removal = (
        comps.groupBy("component")
        .agg(F.min("id").alias("keep"))
        .join(comps, "component")
        .filter(F.col("id") != F.col("keep"))
        .select(F.col("id").alias(id_col))
    )
    out = work.join(removal, id_col, "left_anti")
    drops = []
    if emb_col is None:
        drops.append("__emb")
    if own_id:
        drops.append(id_col)
    return out.drop(*drops) if drops else out
