"""Join cascade: embedding-similarity prefilter + learned thresholds + oracle.

Reference flow (``lotus/sem_ops/sem_join.py:180-341,424-544``): instead of
evaluating the LM on the full |L×R| product, score every pair with a cheap
proxy (the ``search_filter`` plan: embedding similarity of the joined
columns), learn (τ⁺, τ⁻) on an oracle-labeled sample, accept/reject the
confident pairs and route only the gray zone through the oracle LM. The
cascade activates above ``min_join_cascade_size`` pairs (``types.py:182``).
(The reference also considers a ``map_search_filter`` plan — sem_map the left
value first, then sim-score; plan selection picks fewer oracle calls. That
plan is a future extension here.)

Spark design: pair scoring is a broadcast pair join + JVM-side cosine — no
Python per pair. Sampling/threshold learning mirror the filter cascade
(quantile buckets, stratified sample, Hoeffding-corrected search). Only the
gray zone runs the Arrow-batched oracle UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lotus_spark.cascades.utils import CascadeArgs, learn_filter_thresholds
from lotus_spark.functions.vectors import cosine_sim
from lotus_spark.operators import prompts
from lotus_spark.operators.postprocessors import parse_bool
from lotus_spark.operators.sem_index import _resolve_rm, with_embeddings
from lotus_spark.serialization import docs_from_pdf
from lotus_spark.session import settings

SCORE = "__pair_score"


def sem_join_cascade(
    left: DataFrame,
    right: DataFrame,
    instruction: str,
    lcols: list[str],
    rcols: list[str],
    rename_map: dict[str, str],
    oracle_lm,
    cascade_args: CascadeArgs,
    fmt: str,
    rm=None,
    **model_kwargs,
) -> DataFrame:
    model_rm = _resolve_rm(rm)

    l = with_embeddings(left, lcols[0], model_rm, "__le")
    r = with_embeddings(right, rcols[0], model_rm, "__re")
    pairs = l.crossJoin(F.broadcast(r))
    pairs = pairs.withColumn(SCORE, cosine_sim(F.col("__le"), F.col("__re")))
    pairs = pairs.drop("__le", "__re").localCheckpoint()

    n_total = pairs.count()
    doc_cols = lcols + rcols

    def serialize(pdf: pd.DataFrame) -> list[str]:
        disp = pdf.rename(columns=rename_map)
        dcols = [rename_map.get(c, c) for c in doc_cols]
        return docs_from_pdf(disp, dcols, fmt)

    def oracle_label(pdf: pd.DataFrame) -> list[bool]:
        docs = serialize(pdf)
        msgs = [prompts.filter_messages(d, instruction, ("True", "False")) for d in docs]
        outs = oracle_lm(msgs, **model_kwargs).outputs
        return [parse_bool(o, False) for o in outs]

    # quantile bucketing of pair scores (distributed)
    n_q = cascade_args.cascade_num_calibration_quantiles
    qs = [i / n_q for i in range(1, n_q)]
    boundaries = pairs.approxQuantile(SCORE, qs, 0.001)
    bucket_expr = F.lit(0)
    for b, edge in enumerate(boundaries):
        bucket_expr = F.when(F.col(SCORE) > edge, b + 1).otherwise(bucket_expr)
    bucketed = pairs.withColumn("__bucket", bucket_expr)

    target = int(
        np.clip(
            round(n_total * cascade_args.sampling_percentage),
            min(cascade_args.min_sample_size, n_total),
            min(cascade_args.max_sample_size, n_total),
        )
    )
    w = cascade_args.cascade_IS_weight
    bucket_scores = np.array([(b + 1) / n_q for b in range(n_q)])
    prop = np.sqrt(bucket_scores) / np.sqrt(bucket_scores).sum()
    mix = w * prop + (1.0 - w) / n_q
    per_bucket_n = n_total / n_q
    fractions = {
        b: float(min(1.0, target * mix[b] / max(per_bucket_n, 1.0))) for b in range(n_q)
    }
    sample_pdf = (
        bucketed.sampleBy("__bucket", fractions, seed=42)
        .select("__bucket", *doc_cols)
        .toPandas()
    )
    if len(sample_pdf) == 0:
        sample_pdf = bucketed.select("__bucket", *doc_cols).limit(
            cascade_args.min_sample_size
        ).toPandas()

    labels = np.array(oracle_label(sample_pdf))
    cal_sample = (sample_pdf["__bucket"].to_numpy() + 1) / n_q
    corr = np.array(
        [1.0 / max(fractions.get(int(b), 1.0), 1e-9) for b in sample_pdf["__bucket"]]
    )
    tau_pos, tau_neg = learn_filter_thresholds(
        cal_sample, labels, corr,
        cascade_args.recall_target,
        cascade_args.precision_target,
        cascade_args.failure_probability,
    )
    k_accept = int(np.ceil(tau_pos * n_q)) - 1 if tau_pos <= 1.0 else n_q + 1
    k_reject = int(np.floor(tau_neg * n_q)) - 1 if tau_neg > 0.0 else -1
    k_reject = min(k_reject, k_accept - 1)

    accepted = bucketed.filter(F.col("__bucket") >= k_accept)
    gray = bucketed.filter(
        (F.col("__bucket") > k_reject) & (F.col("__bucket") < k_accept)
    )

    from lotus_spark.operators.sem_filter import _OUT_SCHEMA

    @F.pandas_udf(_OUT_SCHEMA)
    def _oracle_udf(batch: pd.DataFrame) -> pd.DataFrame:
        docs = serialize(batch)
        msgs = [prompts.filter_messages(d, instruction, ("True", "False")) for d in docs]
        raw = oracle_lm(msgs, **model_kwargs).outputs
        return pd.DataFrame(
            {
                "label": [parse_bool(o, False) for o in raw],
                "explanation": [None] * len(raw),
                "raw": raw,
            }
        )

    struct_col = F.struct(*[F.col(f"`{c}`") for c in doc_cols])
    gray_kept = (
        gray.withColumn("__o", _oracle_udf(struct_col))
        .filter(F.col("__o.label"))
        .drop("__o")
    )
    return accepted.unionByName(gray_kept).drop(SCORE, "__bucket")
