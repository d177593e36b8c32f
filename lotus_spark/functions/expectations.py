"""Data-quality expectations: declarative constraints checked in ONE
aggregate pass, with a machine-readable report and a hard enforcement
gate.

Every production table load runs constraint checks (the dbt-tests /
Great-Expectations slot); a 100 TB pipeline cannot afford one job per
constraint, so the whole suite folds into a single scan: each
constraint contributes a conditional-count expression to one global
aggregate (map-side combined, whole-stage codegen — no UDFs), and the
wide result row unpivots into one report row per constraint. Uniqueness
rides the same aggregate as a distinct-count (Spark plans multiple
count-distincts via a single expand).

Constraint spec — a JSON-able list of dicts, so suites live in config:

    {"check": "not_null",          "col": c}
    {"check": "unique",            "col": c}            # over non-NULLs
    {"check": "in_range",          "col": c, "min": x, "max": y}
    {"check": "in_set",            "col": c, "values": [...]}
    {"check": "matches",           "col": c, "pattern": rlike_regex}
    {"check": "null_frac_at_most", "col": c, "frac": f}
    {"check": "expr", "name": n,   "sql": "<boolean SQL over the row>"}

NULL semantics (the Great-Expectations convention): value checks
(in_range / in_set / matches / expr) do not count NULLs as violations —
``not_null`` is its own constraint; compose both when you mean both.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_VALUE_CHECKS = {"in_range", "in_set", "matches", "expr"}


def _violation_expr(c: dict):
    """(violation-count expression, label) for one constraint."""
    kind = c.get("check")
    col = c.get("col")
    if kind == "not_null":
        return F.count_if(F.col(col).isNull()), f"not_null({col})"
    if kind == "unique":
        # rows beyond each non-NULL value's first occurrence
        nn = F.count(F.col(col))
        return nn - F.count_distinct(F.col(col)), f"unique({col})"
    if kind == "in_range":
        lo, hi = c.get("min"), c.get("max")
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (F.col(col) < F.lit(lo))
        if hi is not None:
            cond = cond | (F.col(col) > F.lit(hi))
        if lo is None and hi is None:
            raise ValueError(f"in_range({col}): need min and/or max")
        return (F.count_if(F.col(col).isNotNull() & cond),
                f"in_range({col},{lo},{hi})")
    if kind == "in_set":
        vals = c.get("values")
        if not vals:
            raise ValueError(f"in_set({col}): empty values")
        return (
            F.count_if(F.col(col).isNotNull()
                       & ~F.col(col).isin(list(vals))),
            f"in_set({col})",
        )
    if kind == "matches":
        pat = c.get("pattern")
        if not pat:
            raise ValueError(f"matches({col}): empty pattern")
        return (
            F.count_if(F.col(col).isNotNull()
                       & ~F.col(col).rlike(pat)),
            f"matches({col})",
        )
    if kind == "expr":
        sql = c.get("sql")
        name = c.get("name") or sql
        if not sql:
            raise ValueError("expr constraint needs 'sql'")
        e = F.expr(sql)
        # NULL result (e.g. NULL operand) is not a violation, per the
        # module NULL convention
        return F.count_if(~F.coalesce(e, F.lit(True))), f"expr({name})"
    if kind == "null_frac_at_most":
        # handled by the caller (needs the row count); label only
        return None, f"null_frac_at_most({col},{c.get('frac')})"
    raise ValueError(f"unknown check kind: {kind!r}")


def check_expectations(
    df: DataFrame, constraints: list[dict],
) -> DataFrame:
    """Evaluate every constraint in one aggregate pass. Returns a report
    frame ``(check, violations, n_rows, passed)`` with one row per
    constraint, in suite order. ``violations`` for ``null_frac_at_most``
    is the null count (the threshold comparison uses the row count from
    the same pass). Deterministic and SQL-replayable — the
    ``data_quality_report`` oracle row hash-checks it against DuckDB."""
    if not constraints:
        raise ValueError("empty constraint suite")
    for c in constraints:
        if c.get("check") != "expr" and not c.get("col"):
            raise ValueError(f"constraint missing 'col': {c}")
        missing = (c.get("check") != "expr"
                   and c["col"] not in df.columns)
        if missing:
            raise ValueError(
                f"constraint column {c['col']!r} not in frame "
                f"(columns: {df.columns})")

    aggs = [F.count(F.lit(1)).alias("__n")]
    labels = []
    for i, c in enumerate(constraints):
        if c["check"] == "null_frac_at_most":
            _, label = _violation_expr(c)
            aggs.append(
                F.count_if(F.col(c["col"]).isNull()).alias(f"__v{i}"))
        else:
            expr, label = _violation_expr(c)
            aggs.append(expr.alias(f"__v{i}"))
        labels.append(label)
    wide = df.agg(*aggs)

    rows = []
    for i, c in enumerate(constraints):
        v = F.col(f"__v{i}")
        if c["check"] == "null_frac_at_most":
            passed = v <= F.col("__n") * F.lit(float(c["frac"]))
        else:
            passed = v == F.lit(0)
        rows.append(F.struct(
            F.lit(labels[i]).alias("check"),
            v.cast("long").alias("violations"),
            F.col("__n").cast("long").alias("n_rows"),
            passed.alias("passed"),
        ))
    return (
        wide.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.check", "r.violations", "r.n_rows", "r.passed")
    )


def enforce_expectations(
    df: DataFrame, constraints: list[dict],
) -> DataFrame:
    """The hard gate: evaluate the suite and RAISE (listing every failed
    constraint with its violation count) if any constraint fails;
    return ``df`` unchanged otherwise. One aggregate job either way —
    run it at load boundaries, not per-operator."""
    report = check_expectations(df, constraints).collect()
    failed = [r for r in report if not r["passed"]]
    if failed:
        lines = ", ".join(
            f"{r['check']}: {r['violations']}/{r['n_rows']}"
            for r in failed)
        raise ValueError(
            f"enforce_expectations: {len(failed)} constraint(s) failed — "
            f"{lines}")
    return df
