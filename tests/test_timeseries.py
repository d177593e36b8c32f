import datetime as dt

import pytest
from pyspark.sql import functions as F

from lotus_spark.functions.timeseries import time_rollup


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def facts(spark):
    rows = [
        ("a", _ts("2024-01-31 23:10:00"), 1.0),
        ("a", _ts("2024-01-31 23:40:00"), 3.0),
        ("a", _ts("2024-02-01 00:05:00"), 5.0),
        ("b", _ts("2024-02-01 00:05:00"), 7.0),
        ("b", _ts("2024-02-04 12:00:00"), 9.0),  # Sunday; week starts Mon 1-29
    ]
    return spark.createDataFrame(rows, ["k", "ts", "v"])


def test_time_rollup_grains_and_aggs(facts):
    out = time_rollup(
        facts, "ts",
        {"n": ("v", "count"), "sv": ("v", "sum"),
         "mx": ("v", "max"), "av": ("v", "avg")},
        grains=("hour", "day", "month"), by="k",
    ).collect()
    g = {(r["grain"], str(r["bucket"]), r["k"]):
         (r["n"], r["sv"], r["mx"], r["av"]) for r in out}
    assert g[("hour", "2024-01-31 23:00:00", "a")] == (2, 4.0, 3.0, 2.0)
    assert g[("day", "2024-01-31 00:00:00", "a")] == (2, 4.0, 3.0, 2.0)
    assert g[("day", "2024-02-01 00:00:00", "b")] == (1, 7.0, 7.0, 7.0)
    assert g[("month", "2024-02-01 00:00:00", "a")] == (1, 5.0, 5.0, 5.0)
    assert g[("month", "2024-02-01 00:00:00", "b")] == (2, 16.0, 9.0, 8.0)
    # row count: hours 4 distinct (23h-a, 00h-a, 00h-b, 12h-b) + days 4 + months 3
    assert len(out) == 4 + 4 + 3


def test_time_rollup_week_nests_in_day_not_month(facts):
    # week alongside month is fine when the finest grain is day or finer
    out = time_rollup(facts, "ts", {"n": ("v", "count")},
                      grains=("day", "week", "month")).collect()
    wk = {str(r["bucket"]): r["n"] for r in out if r["grain"] == "week"}
    # ISO weeks: Jan-29 week holds the two Jan-31 rows + three Feb rows
    assert wk == {"2024-01-29 00:00:00": 5}
    # but week as the FINEST grain cannot produce coarser levels
    with pytest.raises(ValueError, match="week"):
        time_rollup(facts, "ts", {"n": ("v", "count")},
                    grains=("week", "month"))


def test_time_rollup_rejects_bad_specs(facts):
    with pytest.raises(ValueError, match="finest-first"):
        time_rollup(facts, "ts", {"n": ("v", "count")},
                    grains=("day", "hour"))
    with pytest.raises(ValueError, match="unsupported"):
        time_rollup(facts, "ts", {"n": ("v", "median")})


def test_time_rollup_matches_per_grain_rescan(facts):
    # the cascade must equal the naive per-grain re-aggregation exactly
    out = time_rollup(facts, "ts", {"sv": ("v", "sum")},
                      grains=("minute", "hour", "day"), by="k")
    for grain in ("minute", "hour", "day"):
        naive = {
            (str(r["bucket"]), r["k"]): r["sv"]
            for r in facts.groupBy(
                "k", F.date_trunc(grain, "ts").alias("bucket"))
            .agg(F.sum("v").alias("sv")).collect()
        }
        got = {(str(r["bucket"]), r["k"]): r["sv"]
               for r in out.filter(F.col("grain") == grain).collect()}
        assert got == naive, grain
