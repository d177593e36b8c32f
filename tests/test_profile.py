import pytest

from lotus_spark.functions.profile import profile_columns


@pytest.fixture(scope="module")
def table(spark):
    rows = [
        (1, 10.0, "a"),
        (2, 20.0, "b"),
        (3, None, "a"),
        (4, 40.0, None),
    ]
    return spark.createDataFrame(rows, ["id", "v", "s"])


def test_profile_exact_stats(table):
    out = {r["column"]: r.asDict() for r in profile_columns(table).collect()}
    assert set(out) == {"id", "v", "s"}
    v = out["v"]
    assert (v["n_rows"], v["n_nulls"], v["n_distinct"]) == (4, 1, 3)
    assert (v["min"], v["max"]) == (10.0, 40.0)
    assert v["mean"] == pytest.approx(70.0 / 3)
    assert v["p50"] == 20.0          # exact interpolated median of 3 values
    s = out["s"]
    assert (s["n_nulls"], s["n_distinct"]) == (1, 2)
    assert s["min"] is None and s["p50"] is None  # non-numeric
    i = out["id"]
    assert (i["n_nulls"], i["n_distinct"], i["p50"]) == (0, 4, 2.5)


def test_profile_approx_tier_and_errors(table):
    out = {r["column"]: r.asDict()
           for r in profile_columns(table, ["v"], approx=True).collect()}
    v = out["v"]
    assert v["n_distinct"] == 3                  # HLL exact at tiny n
    assert v["p50"] in (10.0, 20.0)              # approx percentile: a sample value
    with pytest.raises(ValueError, match="unknown columns"):
        profile_columns(table, ["nope"])
