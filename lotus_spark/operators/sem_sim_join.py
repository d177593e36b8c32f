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


def _fold_unit_rows(M):
    """Row-normalize a matrix with the sequential-fold norm (dim-ordered
    accumulation); zero-norm rows pass through — value-identical to
    ``functions.vectors.unit_vector``."""
    import numpy as np

    acc = np.zeros(M.shape[0])
    for j in range(M.shape[1]):
        acc = acc + M[:, j] * M[:, j]
    n = np.sqrt(acc)
    safe = np.where(n == 0.0, 1.0, n)
    U = M / safe[:, None]
    U[n == 0.0] = M[n == 0.0]
    return U


def _broadcast_exact_join(l, r, left_emb_col, right_emb_col, K, tie_break):
    """Exact top-K join with the right side broadcast: scores are computed
    with dim-ordered rank-1 accumulation (bit-identical to the sequential
    fold the DuckDB oracle runs), ranked ``score DESC NULLS LAST,
    tie_break ASC`` — the same total order as the crossjoin tier's window.
    One mapInPandas stage, zero shuffle; left streams at any scale, right
    must fit in task memory (the reference's single-node FAISS constraint,
    ``lotus/vector_store/faiss_vs.py:14``)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    r_cols = [c for c in r.columns if c != right_emb_col]
    r_pdf = r.toPandas()
    n_r = len(r_pdf)
    # fold-exact unit vectors for the collected side, built once on the driver
    if n_r:
        r_valid = r_pdf[right_emb_col].notna().to_numpy()
        RU = np.full((n_r, 0), 0.0)
        if r_valid.any():
            R = np.stack(
                r_pdf.loc[r_valid, right_emb_col].map(
                    lambda v: np.asarray(v, dtype=np.float64)
                ).to_list()
            )
            RU = np.zeros((n_r, R.shape[1]))
            RU[r_valid] = _fold_unit_rows(R)
    else:
        r_valid = np.zeros(0, dtype=bool)
        RU = np.zeros((0, 0))
    # pre-sort the collected side by the tie key once: a *stable* per-row
    # argsort on -score alone then yields ties in tie-ASC order, so ranking
    # in the UDF is fully vectorized
    if tie_break is not None and n_r:
        perm = np.argsort(r_pdf[tie_break].to_numpy(), kind="stable")
        r_pdf = r_pdf.iloc[perm].reset_index(drop=True)
        RU = RU[perm]
        r_valid = r_valid[perm]
    r_rows = r_pdf[r_cols]
    sc = l.sparkSession.sparkContext
    bc = sc.broadcast((r_rows, RU, r_valid))

    out_schema = StructType(
        l.schema.fields
        + [r.schema[c] for c in r_cols]
        + [StructField(SCORE_COL, DoubleType())]
    )
    l_emb_name = left_emb_col

    def run(batches):
        r_rows, RU, r_valid = bc.value
        nr = len(r_rows)
        k = min(K, nr)
        for pdf in batches:
            if not len(pdf) or k == 0:
                continue
            # fold-exact scores in left sub-chunks so the score block stays
            # bounded (~64 MB) regardless of batch size
            chunk = max(1, 8_000_000 // max(nr, 1))
            outs = []
            for s in range(0, len(pdf), chunk):
                part = pdf.iloc[s : s + chunk]
                nl = len(part)
                S = np.full((nl, nr), np.nan)
                l_valid = part[l_emb_name].notna().to_numpy()
                if l_valid.any() and r_valid.any() and RU.shape[1]:
                    L = np.stack(
                        part.loc[l_valid, l_emb_name].map(
                            lambda v: np.asarray(v, dtype=np.float64)
                        ).to_list()
                    )
                    LU = _fold_unit_rows(L)
                    RV = RU[r_valid]
                    # dim-ordered rank-1 updates: per-pair op order is the
                    # sequential fold's, bit-for-bit
                    acc = np.zeros((LU.shape[0], RV.shape[0]))
                    for j in range(LU.shape[1]):
                        acc = acc + LU[:, j : j + 1] * RV[:, j]
                    S[np.ix_(np.nonzero(l_valid)[0], np.nonzero(r_valid)[0])] = acc
                # score DESC with NaN last; stable sort keeps equal scores
                # (and NaNs) in the pre-sorted tie-ASC order
                order = np.argsort(-S, axis=1, kind="stable")[:, :k]
                scores = np.take_along_axis(S, order, axis=1).ravel()
                left_rep = part.iloc[np.repeat(np.arange(nl), k)].reset_index(
                    drop=True
                )
                right_sel = r_rows.iloc[order.ravel()].reset_index(drop=True)
                merged = pd.concat([left_rep, right_sel], axis=1)
                merged[SCORE_COL] = pd.Series(scores).where(
                    ~np.isnan(scores), None
                )
                outs.append(merged)
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return l.mapInPandas(run, schema=out_schema)


def _require_right_tie(tie_break, r, strategy):
    """The pq/ivf tiers thread tie_break into the RIGHT-side rerank
    relation, so it must name a right column (post collision-rename —
    e.g. ``"doc_id_right"`` when both sides carry ``doc_id``). The
    crossjoin/exact tiers rank over the joined pair, where either
    side's column works; here a left-only name would either crash
    deep inside the join or silently bind to the wrong side."""
    if tie_break is not None and tie_break not in r.columns:
        raise ValueError(
            f"strategy={strategy!r} needs tie_break to name a RIGHT-side "
            f"column (after collision rename); {tie_break!r} is not in "
            f"{sorted(r.columns)}"
        )


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
    strategy: str = "auto",
    broadcast_max_rows: int = 200_000,
    pq_candidates: Optional[int] = None,
    pq_nbits: int = 4,
    ivf_n_cells: int | str = "auto",
    ivf_n_probe: int = 8,
    ivfpq_rerank: int | None | str = "auto",
    auto_approx: bool = False,
) -> DataFrame:
    """``strategy``:

    - ``"auto"`` (default): ONE bounded count of the right side (at
      most ``64 * broadcast_max_rows + 1`` rows scanned) decides
      ``broadcast_exact`` (raw vectors fit the broadcast); only on the
      escalation path is the embedding dim probed (skipping NULLs) to
      size the PQ tier by the measured exact/PQ bytes-per-row quotient
      (``(d*4+8)/(m+8)``, capped at 64): ``broadcast_pq`` when the
      uint8 codes fit that budget, else ``crossjoin``. Kills the silent
      pair-shuffle footgun without ever executing the full right
      subtree to decide. Auto never picks an APPROXIMATE tier — for
      right sides beyond even the code budget, opt into
      ``"ivf_cells"`` explicitly.
    - ``"broadcast_exact"`` (exact tier when the right side fits in
      executor memory): the right side is collected once and broadcast; one
      ``mapInPandas`` over the left computes fold-order-exact cosine scores
      (dim-ordered rank-1 accumulation — bit-identical to the sequential
      fold) and takes top-K per left row ordered ``(score DESC NULLS LAST,
      tie_break ASC)``. Zero shuffle, one Python stage; the left side
      streams at any scale.
    - ``"crossjoin"``: pair explosion through the JVM (broadcast
      nested-loop) + window ``row_number``. Same values; the fallback when
      the right side is too big to collect (pairs then shuffle).
    - ``"broadcast_ann"`` (speed tier): right side collected into a
      :class:`~lotus_spark.models.vs.BroadcastVectorIndex`, probed per Arrow
      batch with a float32 numpy/FAISS matmul — fastest, but scores are
      float32 (not fold-exact).
    - ``"broadcast_pq"`` (compressed tier, 32-64x more right-side reach):
      the right side is PQ-encoded once (``functions.ann.pq_index``,
      sample-bounded training) and only the CODES + codebooks broadcast
      (:class:`~lotus_spark.models.vs.BroadcastPQIndex`); each left task
      generates approximate candidates by ADC, then a distributed
      exact-cosine rerank keeps the true top-K (``ann_join_pq``) — scores
      are exact, the candidate SET is approximate (recall tunes via
      ``pq_candidates``). Use when the raw right matrix no longer fits
      the broadcast but its PQ codes do.
    - ``"ivf_cells"`` (no-broadcast scale tier): NEITHER side ships
      anywhere — the right side is IVF-indexed (deterministic Lloyd's,
      sample-bounded training, ``ivf_n_cells="auto"`` = ~sqrt(n)), each
      left row probes its ``ivf_n_probe`` nearest cells against the
      tiny centroid matrix, and ONE cell equi-join scores exact cosine
      within the probed cells (``functions.ann.ann_join_ivf``). The
      right side can be arbitrarily large, but full d-dim vectors ride
      the cell join as payload. APPROXIMATE (recall rises with
      ``ivf_n_probe``), so auto never silently picks it.
    - ``"ivfpq"`` (ladder top, both index halves —
      ``functions.ann.ann_join_ivfpq``): the cell equi-join of
      ``ivf_cells`` but carrying m-byte PQ codes instead of raw
      vectors (~64x less right payload at d=64/m=8), ADC scoring
      inside the probed cells, then an exact-cosine rerank of the ADC
      top ``ivfpq_rerank`` by id (``"auto"`` = ``auto_rerank_k(K,
      join=True)`` = max(32K, 320)) — FAISS's billion-to-billion join
      shape as two bounded shuffles. Exact at full knobs
      (``ivf_n_probe >= n_cells`` and ``ivfpq_rerank`` covering the
      scanned rows); APPROXIMATE otherwise (recall
      curves: ``BENCH_joinrecall.json``). Ties beyond the score break
      on the internal right id (generation order), so ``tie_break``
      must be None for this tier.

    ``auto_approx=True`` lets ``"auto"`` escalate PAST the PQ broadcast
    budget to ``"ivfpq"`` instead of the exact-but-pair-exploding
    ``"crossjoin"`` — the scale default for corpus-vs-corpus joins
    where approximate recall is the documented trade. The default
    (False) preserves the exact-answers invariant: auto never silently
    picks an approximate tier."""
    if strategy not in ("auto", "crossjoin", "broadcast_ann",
                        "broadcast_exact", "broadcast_pq", "ivf_cells",
                        "ivfpq"):
        raise ValueError(
            f"unknown strategy {strategy!r}; pick 'auto', 'crossjoin', "
            "'broadcast_exact', 'broadcast_ann', 'broadcast_pq', "
            "'ivf_cells' or 'ivfpq'"
        )
    if strategy == "auto":
        # Size the PQ tier from ACTUAL bytes/row, not a fixed multiple:
        # the exact tier ships d*4+8 bytes/row (raw float32 + id), the
        # PQ tier ships m+8 (uint8 codes, m<=8, + int64 id). The ratio
        # of those two is how much further the same broadcast budget
        # reaches, capped at 64x. ONE bounded count at the 64x ceiling
        # decides the exact tier; d is probed (skipping NULL embeddings
        # — F.size(NULL) is NULL) only on the escalation path, so the
        # common fits-in-broadcast case costs a single action.
        cap_max = 64 * broadcast_max_rows
        n_bounded = right.limit(cap_max + 1).count()
        if n_bounded <= broadcast_max_rows:
            strategy = "broadcast_exact"
        else:
            if right_emb_col is not None:
                # bound the probe: scan at most the cap_max+1 prefix the
                # count above already read, so a mostly-NULL embedding
                # column can't turn this into a full-table scan. An
                # all-NULL prefix falls back to the conservative d=64
                # assumption (same as the not-yet-embedded branch), NOT
                # d=0: d=0 forced ratio=1, silently demoting to
                # crossjoin. Since the bounded count caps at the same
                # prefix, an all-NULL prefix here means the whole
                # (bounded) table is NULL-embedded — under d=64 that
                # now picks the PQ tier, whose quantizer training
                # RAISES loudly on zero usable rows instead of silently
                # cross-joining garbage NULL-score pairs.
                row0 = (right.limit(cap_max + 1)
                        .select(F.size(right_emb_col).alias("d"))
                        .filter(F.col("d").isNotNull()).first())
                d_probe = int(row0["d"]) if row0 is not None else 64
            else:
                # embeddings not yet computed: assume the HashRM
                # default d=64 — conservative enough that the
                # codes+ids broadcast at the ceiling stays ~100 MB
                d_probe = 64
            pq_bytes = 8 + 8  # m<=8 uint8 codes + int64 id
            ratio = max(1, min(64, (d_probe * 4 + 8) // pq_bytes))
            if n_bounded <= ratio * broadcast_max_rows:
                strategy = "broadcast_pq"
            else:
                # beyond even the code broadcast: the exact answer is
                # the pair-exploding crossjoin; with auto_approx the
                # caller accepts IVFPQ recall for a bounded-shuffle plan
                strategy = "ivfpq" if auto_approx else "crossjoin"
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

    if strategy == "broadcast_exact":
        out = _broadcast_exact_join(
            l, r, left_emb_col, right_emb_col, K, tie_break
        )
        for c in ("__l_emb", "__r_emb", f"__l_emb{rsuffix}", f"__r_emb{rsuffix}"):
            if c in out.columns:
                out = out.drop(c)
        if not return_scores:
            out = out.drop(SCORE_COL)
        return out

    if strategy == "broadcast_pq":
        import math

        from lotus_spark.functions.ann import pq_index
        from lotus_spark.models.vs import BroadcastPQIndex, ann_join_pq

        _require_right_tie(tie_break, r, "broadcast_pq")

        # pin the generated right ids: monotonically_increasing_id is
        # partition-layout-dependent, so the encode and the rerank join
        # must see ONE materialization of it
        ridx = r.withColumn(
            "__r_id", F.monotonically_increasing_id()
        ).localCheckpoint()
        # skip NULL embeddings in the dim probe (F.size(NULL) is NULL —
        # a NULL first row gave d=None and a TypeError at d % m); no
        # non-NULL row at all means the quantizer has nothing to train
        # on, so say that instead of crashing deeper in pq_index
        first = (ridx.select(F.size(right_emb_col).alias("d"))
                 .filter(F.col("d").isNotNull()).first())
        if first is None:
            raise ValueError(
                "broadcast_pq: right side has no non-NULL embeddings — "
                "nothing is indexable")
        d = first["d"]
        m = next(mm for mm in (8, 4, 2, 1) if d % mm == 0)
        n_r = ridx.count()
        nbits = max(1, min(pq_nbits, int(math.log2(max(n_r, 2)))))
        enc, books = pq_index(ridx.select("__r_id", right_emb_col),
                              right_emb_col, "__r_id", m=m, nbits=nbits,
                              seed=42)
        index = BroadcastPQIndex.build(enc, "__r_id", "pq_codes", books)
        l2 = l.withColumn("__l_id", F.monotonically_increasing_id())
        rerank_cols = ["__r_id", right_emb_col]
        if tie_break is not None and tie_break not in rerank_cols:
            rerank_cols.append(tie_break)
        matched = ann_join_pq(
            l2, ridx.select(*rerank_cols), index,
            "__l_id", left_emb_col, "__r_id", right_emb_col, K,
            candidates=pq_candidates, id_out="__r_id",
            score_out=SCORE_COL, tie_col=tie_break,
        )
        # re-attach the right side's payload columns (narrow id join —
        # the right table is too big to broadcast by assumption)
        out = matched.join(ridx.drop(right_emb_col), "__r_id") \
                     .drop("__r_id", "__l_id", "_rank")
        for c in ("__l_emb", "__r_emb", f"__l_emb{rsuffix}",
                  f"__r_emb{rsuffix}"):
            if c in out.columns:
                out = out.drop(c)
        if not return_scores:
            out = out.drop(SCORE_COL)
        return out

    if strategy == "ivf_cells":
        from lotus_spark.functions.ann import ann_join_ivf

        # validate BEFORE the eager checkpoint: a misconfigured
        # (left-only) tie_break must not pay a full materialization of
        # the arbitrarily-large right table just to raise
        _require_right_tie(tie_break, r, "ivf_cells")
        # pin the generated right ids (partition-layout-dependent), same
        # contract as broadcast_pq: the cell assignment and the payload
        # re-attachment must see ONE materialization
        ridx = r.withColumn(
            "__r_id", F.monotonically_increasing_id()
        ).localCheckpoint()
        l2 = l.withColumn("__l_id", F.monotonically_increasing_id())
        rcols = ["__r_id", right_emb_col]
        if tie_break is not None and tie_break not in rcols:
            rcols.append(tie_break)
        matched = ann_join_ivf(
            l2, ridx.select(*rcols), "__l_id",
            left_emb_col, "__r_id", right_emb_col, K,
            n_cells=ivf_n_cells, n_probe=ivf_n_probe,
            id_out="__r_id", score_out=SCORE_COL, tie_col=tie_break,
        )
        out = matched.join(ridx.drop(right_emb_col), "__r_id") \
                     .drop("__r_id", "__l_id", "_rank")
        for c in ("__l_emb", "__r_emb", f"__l_emb{rsuffix}",
                  f"__r_emb{rsuffix}"):
            if c in out.columns:
                out = out.drop(c)
        if not return_scores:
            out = out.drop(SCORE_COL)
        return out

    if strategy == "ivfpq":
        from lotus_spark.functions.ann import ann_join_ivfpq

        if tie_break is not None:
            raise ValueError(
                "strategy='ivfpq' breaks score ties on the internal "
                "right id (ann_join_ivfpq has no tie column); use "
                "'ivf_cells' if a caller-visible tie_break is required")
        # pin the generated right ids (partition-layout-dependent), same
        # contract as the pq/ivf tiers: the encode and the payload
        # re-attachment must see ONE materialization
        ridx = r.withColumn(
            "__r_id", F.monotonically_increasing_id()
        ).localCheckpoint()
        # pick the PQ subspace count from the embedding dim, skipping
        # NULLs (same probe as broadcast_pq)
        first = (ridx.select(F.size(right_emb_col).alias("d"))
                 .filter(F.col("d").isNotNull()).first())
        if first is None:
            raise ValueError(
                "ivfpq: right side has no non-NULL embeddings — "
                "nothing is indexable")
        d = first["d"]
        m = next(mm for mm in (8, 4, 2, 1) if d % mm == 0)
        l2 = l.withColumn("__l_id", F.monotonically_increasing_id())
        matched = ann_join_ivfpq(
            l2, ridx.select("__r_id", right_emb_col), "__l_id",
            left_emb_col, "__r_id", right_emb_col, K,
            n_cells=ivf_n_cells, n_probe=ivf_n_probe, m=m,
            nbits=pq_nbits, rerank_k=ivfpq_rerank,
            id_out="__r_id", score_out=SCORE_COL,
        )
        out = matched.join(ridx.drop(right_emb_col), "__r_id") \
                     .drop("__r_id", "__l_id", "_rank")
        for c in ("__l_emb", "__r_emb", f"__l_emb{rsuffix}",
                  f"__r_emb{rsuffix}"):
            if c in out.columns:
                out = out.drop(c)
        if not return_scores:
            out = out.drop(SCORE_COL)
        return out

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
