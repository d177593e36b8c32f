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
