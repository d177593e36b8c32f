"""Time-series rollups (hypertable-style continuous-aggregate shape).

``time_rollup`` computes the same aggregates at several time
granularities in one pass. The naive plans both scale badly: per-grain
re-scans read the fact table G times, and GROUPING SETS plans go through
Spark's Expand operator, which replicates every input row once per
grouping set *before* the shuffle (G× shuffle volume on the raw data).

The scalable shape is the rollup cascade: aggregate the raw table once
at the FINEST grain (the only shuffle that sees raw rows), then derive
each coarser grain by re-aggregating the previous level's partial
aggregates — inputs shrink by orders of magnitude after the first level,
so levels 2..G are near-free. Exact for algebraic aggregates
(count/sum/min/max, avg as sum÷count), which is why the agg spec is a
closed vocabulary rather than arbitrary expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# coarser-to-the-right; a rollup must request grains in ascending coarseness
_GRAIN_ORDER = ["minute", "hour", "day", "week", "month", "year"]

_PARTIAL = {
    "count": ("sum", lambda c: F.count(c)),   # partial counts merge by sum
    "sum": ("sum", lambda c: F.sum(c)),
    "min": ("min", lambda c: F.min(c)),
    "max": ("max", lambda c: F.max(c)),
}


def time_rollup(
    df: DataFrame,
    ts_col: str,
    aggs: dict[str, tuple[str, str]],
    grains: tuple[str, ...] = ("hour", "day"),
    by: list[str] | str | None = None,
) -> DataFrame:
    """Multi-granularity rollup of ``df`` over timestamp ``ts_col``.

    ``aggs`` maps output column name -> ``(input_col, fn)`` with ``fn`` in
    ``count | sum | min | max | avg``; ``grains`` are ``date_trunc`` units
    ordered finest-first (each must be coarser than the last). Returns the
    long format ``(grain STRING, bucket TIMESTAMP, *by, *aggs)`` — one row
    per (grain, bucket, by-keys).
    """
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    order = [g for g in _GRAIN_ORDER if g in grains]
    if list(grains) != order or len(set(grains)) != len(grains):
        raise ValueError(
            f"grains must be unique and finest-first, one of {_GRAIN_ORDER}"
        )
    bad = [f for _, (_, f) in aggs.items()
           if f not in ("count", "sum", "min", "max", "avg")]
    if bad:
        raise ValueError(f"unsupported agg fns {bad}; "
                         "use count/sum/min/max/avg")

    # partial-aggregate plan: avg carries (sum, count) until final emit
    partials: dict[str, tuple[str, object]] = {}   # pcol -> (merge_fn, first_agg)
    emit: dict[str, object] = {}                   # out_name -> fn(pcols)->Column
    for name, (col, fn) in aggs.items():
        if fn == "avg":
            partials[f"__{name}_s"] = ("sum", F.sum(col))
            partials[f"__{name}_c"] = ("sum", F.count(col))
            emit[name] = (lambda s=f"__{name}_s", c=f"__{name}_c":
                          F.col(s) / F.col(c))
        else:
            merge, first = _PARTIAL[fn]
            partials[f"__{name}"] = (merge, first(col))
            emit[name] = (lambda p=f"__{name}": F.col(p))

    finest = order[0]
    if finest == "week" and len(order) > 1:
        # week boundaries cross month/year boundaries — coarser grains are
        # not derivable from week-truncated buckets
        raise ValueError("cannot roll up coarser grains from 'week'; "
                         "use a finer finest grain (day/hour/minute)")
    base = df.groupBy(
        *keys, F.date_trunc(finest, F.col(ts_col)).alias("bucket")
    ).agg(*[first.alias(p) for p, (_, first) in partials.items()])
    # every coarser grain re-aggregates the (small) finest-level partials,
    # never the raw table: truncating an already-truncated bucket is exact
    # because minute/hour/day/month all nest, and week nests in day
    base = base.persist()

    def _emit(lv: DataFrame, grain: str) -> DataFrame:
        return lv.select(
            F.lit(grain).alias("grain"), "bucket", *keys,
            *[fn().alias(name) for name, fn in emit.items()],
        )

    out = _emit(base, finest)
    for grain in order[1:]:
        level = base.groupBy(
            *keys, F.date_trunc(grain, F.col("bucket")).alias("bucket")
        ).agg(*[
            getattr(F, merge)(p).alias(p) for p, (merge, _) in partials.items()
        ])
        out = out.unionByName(_emit(level, grain))
    return out


def sessionize(
    df: DataFrame,
    ts_col: str,
    by: str | list[str],
    gap: str = "30 minutes",
    session_col: str = "session_id",
    tiebreak: str | None = None,
    salt_sessions: int | None = None,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event of the same key exceeds ``gap``.

    The classic event-pipeline operator (absent from the reference's
    pandas surface; a first-class need for training-data event logs).
    Plan: one shuffle on the key (window partition), ``lag`` + conditional
    cumulative sum — no self-join, no driver state. ``session_id`` is the
    per-key session ordinal (0-based); ``session_start`` tags each row
    with its session's first timestamp so downstream aggs can group by
    (key, session_start) without a second pass.

    At 100 TB: a single hash shuffle on the by-key; per-key rows sort
    within partition (spillable). Skewed keys (one bot user with a
    billion events) would exceed a task's sort budget — pass
    ``salt_sessions=N`` to pre-split every key's timeline into N
    time-range blocks, sessionize each block locally, and stitch the
    block-boundary sessions back together with a second window over the
    tiny per-(key, block) summary table. The salted result is identical
    to the unsalted one (property-tested); it trades one extra small
    shuffle for bounded per-task sort size.
    """
    keys = [by] if isinstance(by, str) else list(by)
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    if salt_sessions is not None and salt_sessions > 1:
        # TIMESTAMP_NTZ does not cast to double directly; route through
        # TIMESTAMP (identity under a UTC session) for the numeric probe
        ts_num = F.col(ts_col).cast("timestamp").cast("double")
        lo, hi = df.select(F.min(ts_num), F.max(ts_num)).first()
        if lo is not None and hi > lo:
            return _sessionize_salted(
                df, ts_col, keys, order, gap, session_col,
                salt_sessions, lo, hi,
            )
    w = Window.partitionBy(*keys).orderBy(*order)
    gap_expr = F.expr(f"INTERVAL {gap}")
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev.isNull() | (F.col(ts_col) > prev + gap_expr), F.lit(1)
    ).otherwise(F.lit(0))
    out = df.withColumn("__new", is_new).withColumn(
        session_col,
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ) - F.lit(1),
    ).drop("__new")
    sess_w = Window.partitionBy(*keys, session_col)
    return out.withColumn("session_start", F.min(ts_col).over(sess_w))


def _sessionize_salted(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    order: list,
    gap: str,
    session_col: str,
    n_blocks: int,
    lo: float,
    hi: float,
) -> DataFrame:
    """Skew-safe sessionize: time-range blocking + boundary merge.

    1. Split the global time range into ``n_blocks`` equal blocks; each
       (key, block) sessionizes independently — the big window sorts at
       most 1/N of a hot key's rows per task.
    2. A per-(key, block) summary (first/last ts, local session count) —
       N rows per key, tiny — decides which block-boundary sessions
       merge (first event of block b within ``gap`` of last event of
       block b-1) and assigns each block a cumulative session-id offset.
    3. Join the offsets back on (key, block) — the big side is already
       hash-partitioned on exactly those columns from the window, so the
       join adds no raw-row shuffle (AQE broadcasts when small) — and
       renumber.
    """
    gap_expr = F.expr(f"INTERVAL {gap}")
    width = (hi - lo) / n_blocks
    ts_num = F.col(ts_col).cast("timestamp").cast("double")
    blk = F.least(
        F.floor((ts_num - F.lit(lo)) / F.lit(width)),
        F.lit(n_blocks - 1),
    ).cast("int")
    local = df.withColumn("__blk", blk)

    w = Window.partitionBy(*keys, "__blk").orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev.isNull() | (F.col(ts_col) > prev + gap_expr), F.lit(1)
    ).otherwise(F.lit(0))
    local = local.withColumn("__new", is_new).withColumn(
        "__lsid",
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ) - F.lit(1),
    ).drop("__new")
    # both the summary agg and the final join consume the windowed
    # `local`; materialize so the heavy per-(key, block) sort/lag/cumsum —
    # the very work salting exists to bound — computes once, not twice.
    # localCheckpoint (not persist): its RDD-level cache is released by
    # Spark's ContextCleaner when the result DataFrame is dropped, so
    # repeated calls don't pin partitions for the application lifetime
    # (persist() entries live in the CacheManager until an explicit
    # unpersist nobody can issue from inside a lazy builder). Trade-off:
    # lineage is truncated, so a lost executor partition fails the job
    # instead of recomputing — acceptable for a cached intermediate that
    # exists only within one action.
    local = local.localCheckpoint(eager=False)

    # summary: N rows per key — the only data the merge pass touches
    meta = local.groupBy(*keys, "__blk").agg(
        F.min(ts_col).alias("__first_ts"),
        F.max(ts_col).alias("__last_ts"),
        (F.max("__lsid") + 1).alias("__nsess"),
    )
    w2 = Window.partitionBy(*keys).orderBy("__blk")
    prev_last = F.lag("__last_ts").over(w2)
    merge = F.when(
        prev_last.isNotNull()
        & (F.col("__first_ts") <= prev_last + gap_expr),
        F.lit(1),
    ).otherwise(F.lit(0))
    meta = meta.withColumn("__merge", merge)
    # offset for block b = sessions in earlier blocks minus merges so far
    cum_n = F.coalesce(
        F.sum("__nsess").over(
            w2.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    cum_m = F.sum("__merge").over(
        w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = meta.withColumn("__adj", cum_n - cum_m).select(
        *keys, "__blk", "__adj"
    )

    out = local.join(offsets, on=[*keys, "__blk"]).withColumn(
        session_col, (F.col("__lsid") + F.col("__adj")).cast("long")
    ).drop("__blk", "__lsid", "__adj")
    sess_w = Window.partitionBy(*keys, session_col)
    return out.withColumn("session_start", F.min(ts_col).over(sess_w))
