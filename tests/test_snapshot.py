"""Snapshot CDC diff (functions/snapshot.py)."""
import pytest
from pyspark.sql import functions as F

from lotus_spark.functions.snapshot import snapshot_diff


def _frames(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "id long, t string, v int",
    )
    new = spark.createDataFrame(
        [(1, "a", 10),        # unchanged
         (2, "B", 20),        # changed (t)
         (4, None, 41),       # changed (v; null t compares null-safe equal)
         (5, "e", 50)],       # added; 3 removed
        "id long, t string, v int",
    )
    return old, new


def test_snapshot_diff_labels(spark):
    old, new = _frames(spark)
    got = {r["id"]: r["change"]
           for r in snapshot_diff(old, new, "id").collect()}
    assert got == {2: "changed", 3: "removed", 4: "changed", 5: "added"}


def test_snapshot_diff_include_unchanged_and_schema(spark):
    old, new = _frames(spark)
    out = snapshot_diff(old, new, "id", include_unchanged=True)
    assert out.columns == ["id", "change"]
    got = {r["id"]: r["change"] for r in out.collect()}
    assert got[1] == "unchanged" and len(got) == 5


def test_snapshot_diff_compare_cols_subset(spark):
    old, new = _frames(spark)
    # only compare t: id 4's v-only change becomes invisible
    got = {r["id"]: r["change"]
           for r in snapshot_diff(old, new, "id", ["t"]).collect()}
    assert got == {2: "changed", 3: "removed", 5: "added"}


def test_snapshot_diff_null_safe_both_null(spark):
    old = spark.createDataFrame([(1, None)], "id long, t string")
    new = spark.createDataFrame([(1, None)], "id long, t string")
    assert snapshot_diff(old, new, "id").count() == 0  # NULL == NULL


def test_snapshot_diff_rejects_bad_compare_cols(spark):
    old, new = _frames(spark)
    with pytest.raises(ValueError):
        snapshot_diff(old, new, "id", ["nope"])
    with pytest.raises(ValueError):
        snapshot_diff(old.select("id"), new.select("id"), "id")


def test_snapshot_diff_plan_prunes_payload(spark):
    """Columns outside compare_cols must not ride the join exchange."""
    old, new = _frames(spark)
    wide_old = old.withColumn("payload", F.repeat(F.lit("x"), 100))
    wide_new = new.withColumn("payload", F.repeat(F.lit("x"), 100))
    plan = (
        snapshot_diff(wide_old, wide_new, "id", ["t"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "payload" not in plan
