"""One-pass column profiling for pipeline data QA.

``profile_columns`` computes per-column stats (rows, nulls, distinct,
min/max/mean/median) for many columns in a SINGLE aggregation over the
table — one scan, one shuffle — and unpivots the one-row result into the
long ``(column, ...stats)`` shape dashboards want. The unpivot is an
``explode`` of a literal-built array, so it adds no second pass.

Exact tier (default) uses ``count(distinct)`` and exact interpolated
``percentile`` — oracle-checkable, but ``count(distinct)`` over many
columns multiplies shuffle volume (Spark expands one copy of the input
per distinct-aggregate). The ``approx=True`` tier swaps in
``approx_count_distinct`` (HLL) and ``percentile_approx`` — single
expand-free pass, the right choice at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """Profile ``cols`` (default: all) → one row per column with
    ``n_rows, n_nulls, n_distinct, min, max, mean, p50`` (numeric stats
    null for non-numeric columns; distinct/null counts apply to every
    type)."""
    cols = list(cols) if cols is not None else df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    types = {f.name: f.dataType for f in df.schema.fields}

    def _is_numeric(c):
        return isinstance(types[c], NumericType)

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        nd = (F.approx_count_distinct(c) if approx
              else F.countDistinct(c))
        aggs += [F.count(c).alias(f"{c}__nn"), nd.alias(f"{c}__d")]
        if _is_numeric(c):
            p50 = (F.expr(f"percentile_approx(`{c}`, 0.5)") if approx
                   else F.expr(f"percentile(`{c}`, 0.5)"))
            aggs += [
                F.min(c).cast("double").alias(f"{c}__mn"),
                F.max(c).cast("double").alias(f"{c}__mx"),
                # cast the (exact, for decimal/int inputs) sum to double
                # BEFORE dividing: one well-defined float op, identical in
                # any engine — decimal division would round at an
                # engine-specific scale first
                (F.sum(c).cast("double") / F.count(c)).alias(f"{c}__avg"),
                p50.cast("double").alias(f"{c}__p50"),
            ]
    row = df.agg(*aggs)

    null_d = F.lit(None).cast("double")
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"{c}__nn")).alias("n_nulls"),
            F.col(f"{c}__d").alias("n_distinct"),
            *(
                [F.col(f"{c}__mn").alias("min"),
                 F.col(f"{c}__mx").alias("max"),
                 F.col(f"{c}__avg").alias("mean"),
                 F.col(f"{c}__p50").alias("p50")]
                if _is_numeric(c)
                else [null_d.alias("min"), null_d.alias("max"),
                      null_d.alias("mean"), null_d.alias("p50")]
            ),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*structs)).alias("s")).select("s.*")
