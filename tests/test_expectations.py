"""Data-quality expectations (functions/expectations.py): the whole
suite evaluates in one aggregate pass; counts match brute force; the
gate raises with a complete failure listing."""
import pytest

from lotus_spark.functions.expectations import (
    check_expectations,
    enforce_expectations,
)


def _frame(spark):
    rows = [
        (1, "O", 10.0, "a@x.com"),
        (2, "F", -5.0, "b@x.com"),       # range violation
        (3, "Z", 20.0, None),            # set violation, null email
        (3, "O", 30.0, "bad-email"),     # dup id, pattern violation
        (None, "O", None, "c@x.com"),    # null id; null price (no viol)
    ]
    return spark.createDataFrame(
        rows, "id long, status string, price double, email string")


SUITE = [
    {"check": "not_null", "col": "id"},
    {"check": "unique", "col": "id"},
    {"check": "in_range", "col": "price", "min": 0.0, "max": 25.0},
    {"check": "in_set", "col": "status", "values": ["O", "F"]},
    {"check": "matches", "col": "email", "pattern": r"^[^@]+@[^@]+$"},
    {"check": "null_frac_at_most", "col": "email", "frac": 0.5},
    {"check": "expr", "name": "price_vs_id", "sql": "price >= id"},
]


def test_report_counts_match_brute_force(spark):
    got = {r["check"]: (r["violations"], r["n_rows"], r["passed"])
           for r in check_expectations(_frame(spark), SUITE).collect()}
    assert got["not_null(id)"] == (1, 5, False)
    assert got["unique(id)"] == (1, 5, False)          # id 3 twice
    # -5 below min, 30 above max; NULL price not a violation
    assert got["in_range(price,0.0,25.0)"] == (2, 5, False)
    assert got["in_set(status)"] == (1, 5, False)      # Z
    assert got["matches(email)"] == (1, 5, False)      # bad-email
    assert got["null_frac_at_most(email,0.5)"] == (1, 5, True)  # 1/5
    # price>=id: rows (2,-5) and... id 3 price 20>=3 ok, id 3 price 30 ok,
    # NULLs (id or price) skipped -> exactly one violation
    assert got["expr(price_vs_id)"] == (1, 5, False)


def test_report_is_suite_ordered_and_single_pass(spark):
    report = check_expectations(_frame(spark), SUITE)
    checks = [r["check"] for r in report.collect()]
    assert checks[0] == "not_null(id)" and checks[-1] == "expr(price_vs_id)"
    # one aggregate: the plan has no join and exactly one source scan
    plan = report._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_enforce_gate(spark):
    df = _frame(spark)
    with pytest.raises(ValueError, match=r"unique\(id\): 1/5"):
        enforce_expectations(df, SUITE)
    clean = [{"check": "null_frac_at_most", "col": "email", "frac": 0.5}]
    assert enforce_expectations(df, clean) is df


def test_validation_errors(spark):
    df = _frame(spark)
    with pytest.raises(ValueError, match="empty constraint suite"):
        check_expectations(df, [])
    with pytest.raises(ValueError, match="not in frame"):
        check_expectations(df, [{"check": "not_null", "col": "nope"}])
    with pytest.raises(ValueError, match="unknown check"):
        check_expectations(df, [{"check": "wat", "col": "id"}])
    with pytest.raises(ValueError, match="need min and/or max"):
        check_expectations(df, [{"check": "in_range", "col": "id"}])
    with pytest.raises(ValueError, match="missing 'col'"):
        check_expectations(df, [{"check": "unique"}])


def test_real_table_suite(spark):
    """The shipped-table shape: a suite over orders at sf0.001 passes
    its true invariants and counts a planted failure exactly."""
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    suite = [
        {"check": "not_null", "col": "o_orderkey"},
        {"check": "unique", "col": "o_orderkey"},
        {"check": "in_set", "col": "o_orderstatus",
         "values": ["O", "F", "P"]},
        {"check": "in_range", "col": "o_totalprice", "min": 0},
        {"check": "matches", "col": "o_orderpriority",
         "pattern": r"^[1-5]-"},
    ]
    report = check_expectations(orders, suite).collect()
    assert all(r["passed"] for r in report), report
    tight = [{"check": "in_range", "col": "o_totalprice", "max": 1000.0}]
    r = check_expectations(orders, tight).collect()[0]
    brute = orders.filter("o_totalprice > 1000.0").count()
    assert r["violations"] == brute and not r["passed"]
