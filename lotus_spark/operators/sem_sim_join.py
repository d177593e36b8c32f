"""sem_sim_join — embedding K-NN left join.

Reference semantics (``lotus/sem_ops/sem_sim_join.py:84-166``): for each left
row, the K most-similar right rows by embedding similarity of
``left_on``/``right_on``; appends ``_scores``.

Spark design (exact tier): embed both sides → join → JVM-side cosine →
``row_number() OVER (PARTITION BY left_id ORDER BY score DESC, tie)`` ≤ K.
The right side gets a broadcast hint when small (dimension-table shaped), so
the pair generation is a broadcast nested-loop with no shuffle of the big
left side; the only shuffle is the window partition by left_id (AQE coalesces
it). Scale path for huge right sides: cluster/LSH blocking before the pair
join (``sem_cluster_by`` ids as block keys) bounds candidates per left row.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


from lotus_spark.operators.sem_index import _resolve_rm, with_embeddings

SCORE_COL = "_scores"


def sem_sim_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    K: int = 1,
    rm: Any = None,
    lsuffix: str = "",
    rsuffix: str = "_right",
    return_scores: bool = True,
    broadcast_right: bool = True,
    left_emb_col: Optional[str] = None,
    right_emb_col: Optional[str] = None,
    tie_break: Optional[str] = None,
    strategy: str = "crossjoin",
) -> DataFrame:
    """``strategy``: ``"crossjoin"`` (exact tier — JVM cosine + window) or
    ``"broadcast_ann"`` (speed tier — right side collected into a
    :class:`~lotus_spark.models.vs.BroadcastVectorIndex`, probed per Arrow
    batch with numpy/FAISS; right side must fit in executor memory)."""
    if strategy not in ("crossjoin", "broadcast_ann"):
        raise ValueError(
            f"unknown strategy {strategy!r}; pick 'crossjoin' or 'broadcast_ann'"
        )
    model = None
    if left_emb_col is None or right_emb_col is None:
        model = _resolve_rm(rm)

    l = left
    if left_emb_col is None:
        l = with_embeddings(l, left_on, model, "__l_emb")
        left_emb_col = "__l_emb"
    r = right
    if right_emb_col is None:
        r = with_embeddings(r, right_on, model, "__r_emb")
        right_emb_col = "__r_emb"

    # rename colliding right columns (pandas-join suffix semantics)
    collisions = [c for c in r.columns if c in l.columns]
    for c in collisions:
        r = r.withColumnRenamed(c, f"{c}{rsuffix}")
        if c == right_emb_col:
            right_emb_col = f"{c}{rsuffix}"
        if c == right_on:
            right_on = f"{c}{rsuffix}"

    if strategy == "broadcast_ann":
        # speed tier (SURVEY §2.4 VS): index the right side once, probe each
        # left Arrow batch with a vectorized matmul — zero shuffle, no
        # n_left × n_right row explosion through the JVM. Exact same top-K
        # as the crossjoin tier (ids break score ties when tie_break is the
        # right id; otherwise ordering among exact ties may differ).
        from lotus_spark.models.vs import BroadcastVectorIndex, ann_join

        ridx = r.withColumn("__r_id", F.monotonically_increasing_id())
        index = BroadcastVectorIndex.build(ridx, "__r_id", right_emb_col)
        matched = ann_join(
            l, index, left_emb_col, K, id_out="__r_id", score_out=SCORE_COL
        )
        out = matched.join(F.broadcast(ridx.drop(right_emb_col)), "__r_id") \
                     .drop("__r_id", "_rank")
        for c in ("__l_emb", "__r_emb", f"__l_emb{rsuffix}", f"__r_emb{rsuffix}"):
            if c in out.columns:
                out = out.drop(c)
        if not return_scores:
            out = out.drop(SCORE_COL)
        return out

    # normalize each side per ROW so the per-PAIR work is one dot
    # (identical score; 3x less arithmetic than cosine-per-pair)
    from lotus_spark.functions.vectors import unit_vector

    l = l.withColumn("__l_unit", unit_vector(F.col(left_emb_col)))
    r = r.withColumn("__r_unit", unit_vector(F.col(right_emb_col)))
    l = l.withColumn("__l_id", F.monotonically_increasing_id())
    pairs = l.join(F.broadcast(r) if broadcast_right else r, how="cross")
    from lotus_spark.functions.vectors import pair_dot

    pairs = pairs.withColumn(
        SCORE_COL, pair_dot(F.col("__l_unit"), F.col("__r_unit"))
    ).drop("__l_unit", "__r_unit")
    order = [F.desc(SCORE_COL)]
    if tie_break is not None:
        order.append(F.asc(tie_break))
    w = Window.partitionBy("__l_id").orderBy(*order)
    out = (
        pairs.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= K)
        .drop("__rank", "__l_id")
    )
    for c in ("__l_emb", "__r_emb", f"__l_emb{rsuffix}", f"__r_emb{rsuffix}"):
        if c in out.columns:
            out = out.drop(c)
    if not return_scores:
        out = out.drop(SCORE_COL)
    return out
