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


# ---------------------------------------------------------------- sessionize

from lotus_spark.functions.timeseries import sessionize  # noqa: E402


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user u1: two sessions split by a >30min gap; boundary event at
        # exactly gap (same session) and gap+1s (new session)
        ("u1", _ts("2024-03-01 10:00:00"), "a"),
        ("u1", _ts("2024-03-01 10:30:00"), "b"),   # exactly 30min: same
        ("u1", _ts("2024-03-01 11:00:01"), "c"),   # 30min+1s: NEW session
        # user u2: single event (its own session)
        ("u2", _ts("2024-03-01 09:00:00"), "d"),
        # user u1 much later: third session
        ("u1", _ts("2024-03-02 10:00:00"), "e"),
    ]
    return spark.createDataFrame(rows, ["user", "ts", "ev"])


def test_sessionize_gap_boundary(events):
    out = sessionize(events, "ts", "user", gap="30 minutes").collect()
    sid = {r["ev"]: r["session_id"] for r in out}
    assert sid["a"] == 0 and sid["b"] == 0          # <= gap stays
    assert sid["c"] == 1                            # > gap splits
    assert sid["e"] == 2
    assert sid["d"] == 0                            # single-event session
    start = {r["ev"]: str(r["session_start"]) for r in out}
    assert start["b"] == "2024-03-01 10:00:00"
    assert start["c"] == "2024-03-01 11:00:01"
    assert start["d"] == "2024-03-01 09:00:00"


def test_sessionize_multi_key_and_tiebreak(spark):
    rows = [
        ("u", "web", _ts("2024-01-01 00:00:00"), 2),
        ("u", "web", _ts("2024-01-01 00:00:00"), 1),  # tie → tiebreak col
        ("u", "app", _ts("2024-01-01 02:00:00"), 3),  # other key: own sid 0
    ]
    df = spark.createDataFrame(rows, ["user", "chan", "ts", "seq"])
    out = sessionize(df, "ts", ["user", "chan"], gap="1 hour",
                     tiebreak="seq").collect()
    by_seq = {r["seq"]: r for r in out}
    assert by_seq[1]["session_id"] == 0 and by_seq[2]["session_id"] == 0
    assert by_seq[3]["session_id"] == 0  # separate (user, chan) key
    assert str(by_seq[3]["session_start"]) == "2024-01-01 02:00:00"


def test_sessionize_salted_equals_unsalted(spark):
    import random
    rng = random.Random(7)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(400):
        user = f"u{rng.randrange(5)}"
        t = base + dt.timedelta(seconds=rng.randrange(0, 7 * 86400))
        rows.append((user, t, i))
    df = spark.createDataFrame(rows, ["user", "ts", "seq"])
    # cover both timestamp types: events.parquet is TIMESTAMP_NTZ, which
    # does not cast to double directly (regression guard)
    for typed in (df, df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))):
        plain = sessionize(typed, "ts", "user", gap="45 minutes",
                           tiebreak="seq")
        a = {(r["user"], r["seq"]): (r["session_id"], str(r["session_start"]))
             for r in plain.collect()}
        for n in (2, 3, 8):
            salted = sessionize(typed, "ts", "user", gap="45 minutes",
                                tiebreak="seq", salt_sessions=n)
            b = {(r["user"], r["seq"]): (r["session_id"],
                                         str(r["session_start"]))
                 for r in salted.collect()}
            assert a == b, f"salt_sessions={n}"


def test_sessionize_salted_degenerate_range(spark):
    # all events at one instant → falls back to unsalted path
    t = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("u", t, 0), ("u", t, 1)], ["user", "ts", "seq"])
    out = sessionize(df, "ts", "user", tiebreak="seq",
                     salt_sessions=4).collect()
    assert {r["session_id"] for r in out} == {0}
