"""Skew-mitigation join/aggregation helpers (salting).

AQE's skew-join splitting (enabled in ``get_spark``) handles most skew at
runtime; these explicit helpers are for the cases AQE can't fix — a single
hot key in a shuffle *aggregation*, or a join where the skewed side must be
salted at write time. Pattern (task brief: "skewed keys hurt ... salting for
skew"):

- ``salted_join``: left rows get a deterministic salt in [0, salt); the
  (small) right side is replicated ``salt`` times, so one hot key's rows
  spread over ``salt`` reducers instead of one.
- ``salted_agg``: two-phase aggregation — partial by (key, salt), final by
  key. Each phase's biggest partition shrinks ~salt-fold for hot keys.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"

_MERGE = {
    "count": F.sum,   # partial counts re-combine by sum
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with the left side salted and the right side replicated.

    Use when the LEFT side has hot keys and the RIGHT side is small enough
    to replicate ``salt`` × (its shuffle volume multiplies). Results are
    identical to a plain join for 'inner'/'left' joins on ``on``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left' "
                         "(right/outer would duplicate unmatched rows)")
    l = left.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                      F.lit(salt)).cast("int")
    )
    r = right.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return l.join(r, keys + [_SALT], how).drop(_SALT)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str | None = None,
    direction: str = "backward",
    tolerance: Optional[int] = None,
    rsuffix: str = "_right",
) -> DataFrame:
    """As-of join — for each left row, the single right row with the
    largest ``on`` ≤ left's (``direction="backward"``, inclusive) or the
    smallest ``on`` ≥ left's (``"forward"``), optionally matching ``by``
    keys, optionally within ``tolerance`` (same units as ``on``).

    Spark has no native as-of join; the scalable pattern here is
    union-the-sides + one window pass: tag rows, sort by
    ``(by, on, side)`` inside a single shuffle, and carry the latest right
    payload forward with ``last(ignorenulls)`` — O(n log n) in the
    partition, no per-row subquery, no range-explosion. Right rows sort
    before left rows at equal ``on`` so the match is inclusive. Exactly
    DuckDB's ``ASOF LEFT JOIN`` semantics (the oracle), which resolves
    duplicate right timestamps to the last row in ``(on, tie)`` order —
    dedupe the right side first if that matters.

    ``on`` must be numeric-ordered (epoch ns, long). All left rows are
    kept; unmatched left rows carry nulls (left-join shape).
    """
    from pyspark.sql import Window

    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))

    r_payload_cols = [c for c in right.columns if c not in keys]
    payload = F.struct(*[F.col(c) for c in r_payload_cols])
    r_tagged = right.select(
        *[F.col(c) for c in keys],
        F.col(on).alias("__on"),
        F.lit(0).alias("__side"),
        payload.alias("__rp"),
    )
    l_tagged = left.select(
        "*",
        F.col(on).alias("__on"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_tagged.schema["__rp"].dataType).alias("__rp"),
    )
    # align schemas: left carries its own columns; right rows carry nulls
    for c in left.columns:
        if c not in keys and c != "__on":
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=False)

    asc = direction == "backward"
    order = [F.col("__on").asc() if asc else F.col("__on").desc(),
             F.col("__side").asc()]
    w = (
        Window.partitionBy(*keys).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        unioned.withColumn("__match", F.last("__rp", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        .drop("__side", "__rp")
    )
    if tolerance is not None:
        delta = (F.col("__on") - F.col(f"__match.{on}")) if asc else (
            F.col(f"__match.{on}") - F.col("__on"))
        matched = matched.withColumn(
            "__match",
            F.when(delta <= F.lit(tolerance), F.col("__match")),
        )
    out = matched
    for c in r_payload_cols:
        name = f"{c}{rsuffix}" if c in out.columns or c == on else c
        out = out.withColumn(name, F.col(f"__match.{c}"))
    return out.drop("__match", "__on")


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    lo: str,
    hi: str,
    by: list[str] | str | None = None,
    bucket_width: Optional[int] = None,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join: left rows whose ``point`` lies in a right
    row's ``[lo, hi]`` (inclusive both ends), optionally also matching
    ``by`` keys.

    A naive ``l.join(r, (l.point >= r.lo) & (l.point <= r.hi))`` has no
    equi-keys, so Spark plans BroadcastNestedLoopJoin — O(|L|·|R|) and a
    full broadcast of one side; unusable at scale. The scalable pattern is
    bucketization: chop the domain into width-``w`` buckets, explode each
    right interval into every bucket it covers (``(hi-lo)/w + 1`` rows),
    tag each left point with its single bucket, equi-join on
    ``(by, bucket)`` — a plain shuffled hash join Catalyst/AQE can
    optimize — then re-check the exact predicate. Each (left, right)
    match meets in exactly one bucket (the point's), so no dedup pass.

    ``bucket_width`` defaults to the sampled median interval width (so a
    typical interval explodes into ~2 buckets); pass it explicitly in
    production jobs. ``point``/``lo``/``hi`` must be integer-ordered
    (epoch ns/µs, long). ``how`` is 'inner' or 'left' (unmatched left
    rows keep nulls).
    """
    if how not in ("inner", "left"):
        raise ValueError("range_join supports how='inner'|'left'")
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    overlap = set(left.columns) & set(right.columns) - set(keys)
    if overlap:
        raise ValueError(
            f"ambiguous non-key columns on both sides: {sorted(overlap)}; "
            "rename before joining"
        )
    if bucket_width is None:
        # one aggregation over a sample decides the bucket size; median
        # width keeps replication ~2 rows/interval without a user knob
        med = (
            right.sample(0.1, seed=7).select(
                F.expr(f"percentile_approx({hi} - {lo}, 0.5)").alias("m"))
            .first()["m"]
        )
        if med is None:  # sample may be empty at tiny sizes
            med = right.select(
                F.expr(f"percentile_approx({hi} - {lo}, 0.5)").alias("m")
            ).first()["m"]
        bucket_width = max(int(med or 0) + 1, 1)
    w = F.lit(int(bucket_width))
    r_exp = right.withColumn(
        "__bkt",
        F.explode(F.sequence(F.floor(F.col(lo) / w), F.floor(F.col(hi) / w))),
    )
    l_tag = left.withColumn("__bkt", F.floor(F.col(point) / w))
    cond = [l_tag[k] == r_exp[k] for k in keys] + [
        l_tag["__bkt"] == r_exp["__bkt"],
        l_tag[point] >= r_exp[lo],
        l_tag[point] <= r_exp[hi],
    ]
    joined = l_tag.join(r_exp, cond, how)
    out_cols = [l_tag[c] for c in left.columns] + [
        r_exp[c] for c in right.columns if c not in keys
    ]
    return joined.select(*out_cols)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps column → one of count|sum|min|max; output columns are
    named ``{fn}_{col}``. Exactly equals the direct groupBy result.
    """
    bad = {fn for fn in aggs.values() if fn not in _MERGE}
    if bad:
        raise ValueError(f"unsupported agg fns: {sorted(bad)} "
                         f"(supported: {sorted(_MERGE)})")
    salted = df.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                      F.lit(salt)).cast("int")
    )
    partial = salted.groupBy(*keys, _SALT).agg(*[
        getattr(F, fn)(c).alias(f"__p_{fn}_{c}") for c, fn in aggs.items()
    ])
    return partial.groupBy(*keys).agg(*[
        _MERGE[fn](f"__p_{fn}_{c}").alias(f"{fn}_{c}")
        for c, fn in aggs.items()
    ])
