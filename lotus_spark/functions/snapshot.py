"""Corpus snapshot diffing (CDC between two immutable snapshot tables).

A recurring 100 TB-pipeline primitive the reference doesn't have: crawl
and curation corpora are delivered as immutable daily/weekly snapshots,
and every downstream incremental job (re-embed, re-index, re-train
slice) starts from "what changed since the last snapshot?". This module
answers that with ONE id-keyed join — not a row-hash shuffle of both
full tables.

Scale design: both sides are column-pruned to ``id + compare_cols``
BEFORE the join, so only the compared bytes ride the exchange; the join
is a single sort-merge shuffle on the (unique) id with AQE handling
size skew. If the snapshots are written bucketed by the id
(``sources/bucketed.py``), the diff is exchange-free on both sides.
Value comparison is null-safe per column (no serialization round-trip,
no row hashing — Catalyst compares natively, and columns not in
``compare_cols`` can't cause false positives).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    compare_cols: list[str] | None = None,
    change_col: str = "change",
    include_unchanged: bool = False,
) -> DataFrame:
    """Diff two snapshots keyed by ``id_col``: rows only in ``new`` are
    ``added``, only in ``old`` are ``removed``, present in both with any
    ``compare_cols`` value differing (null-safe) are ``changed``;
    identical rows are dropped unless ``include_unchanged``.

    ``compare_cols`` defaults to every shared non-id column. Returns
    ``(id_col, change_col)`` — join back to whichever snapshot you need
    payloads from (keeps this diff narrow on the wire). Ids must be
    unique per snapshot (the snapshot contract); NULL ids never match
    across sides, so a NULL-id row shows up as added/removed rather than
    comparing.
    """
    if compare_cols is None:
        compare_cols = [
            c for c in new.columns if c != id_col and c in old.columns
        ]
    if not compare_cols:
        raise ValueError("no compare columns (snapshots share only the id?)")
    missing = [c for c in compare_cols
               if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"compare_cols missing from a snapshot: {missing}")

    o = old.select(
        F.col(id_col).alias("__oid"),
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
    )
    n = new.select(
        F.col(id_col).alias("__nid"),
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
    )
    j = o.join(n, F.col("__oid") == F.col("__nid"), "full_outer")
    differs = reduce(
        lambda a, b: a | b,
        [~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
         for c in compare_cols],
    )
    change = (
        F.when(F.col("__oid").isNull(), F.lit("added"))
        .when(F.col("__nid").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        F.coalesce(F.col("__nid"), F.col("__oid")).alias(id_col),
        change.alias(change_col),
    )
    if not include_unchanged:
        out = out.filter(F.col(change_col) != "unchanged")
    return out
