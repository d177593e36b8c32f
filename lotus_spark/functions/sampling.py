"""Training-data mixing ops: deterministic sampling + sequence packing.

Reference scope: the reference (lotus) has no sampling/packing operators —
these belong to the "large-scale training-data pipeline" surface the task
brief asks for beyond reference parity.

Why not ``df.sampleBy(seed=...)``: Bernoulli sampling keys the RNG on
(seed, partition-id, position), so the *same row* flips in/out when the
upstream partitioning changes, a task retries, or the table is re-read
with a different split — poison for resumable 100 TB pipelines and for
keeping a sampled `documents` consistent with its sampled `embeddings`.
``stratified_sample`` instead hashes row CONTENT (a stable id), so
membership is a pure deterministic function of the row: rerun-stable,
join-consistent across derived tables, and a narrow no-shuffle filter.

``pack_sequences`` implements concat-and-chunk packing (GPT-style: lay
all documents on one token tape in a deterministic order, cut every
``capacity`` tokens). The core is a global running token offset — a scan.
A naive ``Window.orderBy(order_col)`` with no partition key collapses to
ONE task; here the scan is distributed: range-partition by the order
column, per-partition cumulative sums, then add each partition's
exclusive prefix total (tiny driver collect, one number per partition).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import shingle_hash

_BUCKETS = 1_000_003   # prime
_MIX = 2654435761      # Knuth multiplicative constant (odd)



def _content_bucket(id_col: str, salt: str | None = None):
    """The shared content-hash bucket: ``pmod(hash(id [+ salt]) * _MIX,
    _BUCKETS)``. The multiply-mod finalizer matters: the raw polynomial
    fold of SHORT id strings is small and structured (parity/digit
    patterns), so without it per-stratum rates skew badly; multiplying
    by an odd constant mod a prime is a residue bijection that scatters
    those clusters (hash*_MIX stays < 2^63 because the fold is < 1e9+7).
    NULL ids hash as the empty string (bucket 0) — deterministic, and
    callers document where such rows land. Mirrored by the DuckDB
    oracles in __spark_entry__; change all or none.
    """
    s = F.coalesce(F.col(id_col).cast("string"), F.lit(""))
    if salt is not None:
        s = F.concat(s, F.lit(salt))
    return F.pmod(shingle_hash(s) * F.lit(_MIX), F.lit(_BUCKETS))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    default: float | None = None,
) -> DataFrame:
    """Keep a deterministic ``fractions[stratum]`` share of each stratum.

    A row survives iff ``(hash(id) * 2654435761) % 1000003 < fraction *
    1000003`` — membership depends only on the row's id, never on
    partitioning, task retries, or a seed. The multiply-mod finalizer
    matters: the raw polynomial fold of SHORT id strings is small and
    structured (parity/digit patterns), so without it per-stratum rates
    skew badly; multiplication by an odd constant mod a prime is a
    residue bijection that scatters those clusters (hash*_MIX stays
    < 2^63 because the fold is < 1e9+7). Strata absent from ``fractions`` keep rate ``default`` (drop
    all when None). Rates outside [0, 1] are rejected.
    """
    rates = dict(fractions)
    if default is not None:
        rates["__default__"] = default
    for k, v in rates.items():
        if not (0.0 <= v <= 1.0):
            raise ValueError(f"fraction for {k!r} must be in [0,1], got {v}")
    bucket = _content_bucket(id_col)
    if fractions:
        rate_map = F.create_map(
            *[x for k, v in fractions.items()
              for x in (F.lit(k), F.lit(int(round(v * _BUCKETS))))]
        )
        cut = rate_map[F.col(strata_col)]
    else:
        cut = F.lit(None).cast("long")
    if default is not None:
        cut = F.coalesce(cut, F.lit(int(round(default * _BUCKETS))))
    return df.filter(bucket < cut)


def pack_sequences(
    df: DataFrame,
    token_col: str,
    capacity: int,
    order_col: str,
    partitions: int | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing metadata.

    Documents are laid end-to-end on a token tape in ``order_col`` order
    (must be unique and non-null — it defines the tape; NULL keys raise
    a ValueError from the same aggregation that collects segment
    totals); sequences are the tape cut every ``capacity`` tokens.
    Appends:

    - ``seq_id``     — sequence holding the document's FIRST token
    - ``seq_offset`` — the first token's position within that sequence
    - ``n_seqs``     — how many sequences the document spans (≥ 1;
      documents straddle cuts, exactly like GPT-style pretraining packing)

    Distributed scan, not a global window: the tape is cut into ~equal
    SEGMENTS by ``order_col`` range → per-segment cumsum window → add
    exclusive per-segment prefix totals (one long per segment via the
    driver). Zero-token docs occupy no tape but still get the position
    they would start at.

    Segment membership is a pure FUNCTION OF THE VALUE: range boundaries
    are collected once (``approxQuantile``) and baked into the plan as
    literals. The previous implementation derived segments from
    ``repartitionByRange`` + ``spark_partition_id()`` — but the range
    partitioner SAMPLES with an RDD-id-dependent seed, so the totals
    collect and the caller's later action could execute the exchange
    with DIFFERENT boundaries than the baked prefix map (observed at
    sf0.1/local[8]: whole segments offset by thousands of tokens).
    Value-based ids make every execution of the plan agree by
    construction, whatever the physical partitioning does.

    Numeric ``order_col`` only (the tape orders by it; approxQuantile
    needs numeric). A non-numeric order column falls back to ONE segment
    — correct but a single-task window; re-key the tape (e.g.
    ``xxhash64``-free monotonic id) for scale.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    try:
        probs = [i / n for i in range(1, n)]
        bounds = sorted(set(
            df.stat.approxQuantile(order_col, probs, 1.0 / max(n * 10, 100))
        )) if n > 1 else []
    except Exception:  # non-numeric order col: single-segment fallback
        import warnings

        warnings.warn(
            "pack_sequences: non-numeric order_col — falling back to a "
            "single-task global window; use a numeric tape key at scale",
            stacklevel=2,
        )
        bounds = []
    pid = F.lit(0)
    for b in bounds:
        # NULL order keys would make the comparison (and __pid) NULL —
        # coalesce pins them to segment 0 so the totals collect below can
        # DETECT them (same aggregation, zero extra jobs) and raise: a
        # NULL tape key has no position, violating the unique-order
        # contract, and must fail loudly rather than pack arbitrarily
        pid = pid + F.coalesce(
            (F.col(order_col) > F.lit(b)).cast("int"), F.lit(0)
        )
    d = df.withColumn("__pid", pid)
    w = (
        Window.partitionBy("__pid").orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("__cum", F.sum(F.col(token_col).cast("long")).over(w))
    total_rows = (
        d.groupBy("__pid")
        .agg(
            F.max("__cum").alias("t"),
            F.sum(F.col(order_col).isNull().cast("long")).alias("nulls"),
        )
        .collect()
    )
    if any(r["nulls"] for r in total_rows):
        raise ValueError(
            f"pack_sequences: order_col {order_col!r} contains NULLs — "
            "the tape key must be unique and non-null (a NULL has no "
            "tape position); filter or re-key those rows first"
        )
    totals = {r["__pid"]: r["t"] for r in total_rows}
    prefix, acc = {}, 0
    for pid in sorted(totals):
        prefix[pid] = acc
        acc += totals[pid] or 0
    off_map = F.create_map(
        *[x for pid, p in prefix.items() for x in (F.lit(pid), F.lit(p))]
    )
    end = F.col("__cum") + off_map.getItem(F.col("__pid"))
    start = end - F.col(token_col)
    last = F.when(F.col(token_col) > 0, end - 1).otherwise(start)
    # integer `div`, not double division: tape offsets stay exact past 2^53
    return (
        d.withColumn("__start", start).withColumn("__last", last)
        .withColumn("seq_id", F.expr(f"__start div {int(capacity)}"))
        .withColumn("seq_offset", F.expr(f"__start % {int(capacity)}"))
        .withColumn(
            "n_seqs",
            F.expr(f"__last div {int(capacity)} - __start div {int(capacity)} + 1"),
        )
        .drop("__pid", "__cum", "__start", "__last")
    )


def quantile_filter(
    df: DataFrame,
    score_col: str,
    keep_frac: float,
    by: str | list[str] | None = None,
    ascending: bool = False,
    tiebreak: str | None = None,
) -> DataFrame:
    """Keep the best ``keep_frac`` fraction of rows by ``score_col``,
    optionally per group — the quality-quantile gate every corpus
    pipeline runs after scoring ("keep the top 30% by quality per
    language").

    Exact rank semantics (``percent_rank``), not an approximate-quantile
    threshold: membership is deterministic and reproducible across runs
    and partitionings, which approx_percentile cutoffs are not. A row is
    kept iff ``percent_rank <= keep_frac`` over the (group-wise) ordering
    — best score first by default (``ascending=False``). ``tiebreak``
    should make the ordering TOTAL (e.g. a unique id): with duplicate
    (score, tiebreak) pairs straddling the cutoff, which of the tied rows
    survive is arbitrary (and the global fast path keeps exactly k where
    the window path keeps every tied row).

    At 100 TB: one hash shuffle on the group key. The GLOBAL path
    (``by=None``) with a ``tiebreak`` (total order) never runs a
    single-task window: rank-cutoff membership is identical to keeping
    the first ``floor(keep_frac·(n−1))+1`` rows of the total order, so
    it executes as count + ``orderBy().limit(k)`` — a distributed
    TakeOrderedAndProject (only k rows per partition cross the final
    shuffle); for k above ``topKSortFallbackThreshold`` Catalyst itself
    switches to a range-partitioned full sort + GlobalLimit, still fully
    distributed. Without a tiebreak the global path falls back to the
    single-partition window — logged as a warning, since boundary ties
    are order-dependent either way and a tiebreak makes the plan fully
    distributed. Rows never widen; the filter composes with pushdown.
    """
    if not (0.0 < keep_frac <= 1.0):
        raise ValueError("keep_frac must be in (0, 1]")
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    order = [
        F.col(score_col).asc() if ascending else F.col(score_col).desc()
    ]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    if not keys and tiebreak is not None:
        n = df.count()
        if n == 0:
            return df
        if n == 1:
            return df  # single row: percent_rank 0 is always kept
        # exact replica of percent_rank's double comparison i/(n-1) <= f,
        # so the limit cutoff matches the window path bit-for-bit
        k = int(keep_frac * (n - 1)) + 1
        while k < n and k / (n - 1) <= keep_frac:
            k += 1
        while k > 1 and (k - 1) / (n - 1) > keep_frac:
            k -= 1
        return df.orderBy(*order).limit(k)
    if not keys:
        # global percent_rank without a tiebreak = ONE task sorts the
        # whole input; fine for samples, a wall at scale — say so loudly
        import logging

        logging.getLogger(__name__).warning(
            "quantile_filter: global path without tiebreak runs a "
            "single-partition window (one task sorts ALL rows). Pass "
            "tiebreak=<unique col> for a fully distributed rank-cutoff "
            "plan."
        )
    w = (Window.partitionBy(*keys) if keys else Window.partitionBy()).orderBy(*order)
    return (
        df.withColumn("__pr", F.percent_rank().over(w))
        .filter(F.col("__pr") <= keep_frac)
        .drop("__pr")
    )


def cap_per_key(
    df: DataFrame,
    key: str | list[str],
    max_rows: int,
    order_by: str | None = None,
    ascending: bool = False,
    tiebreak: str | None = None,
) -> DataFrame:
    """Cap every key at ``max_rows`` rows, keeping the best by
    ``order_by`` — domain-mix rebalancing ("at most N documents per
    domain so one crawl host can't dominate the mixture").

    Plan: one hash shuffle on the key, ``row_number`` within, filter —
    the standard top-N-per-group shape Spark executes with a partial
    window sort (rows beyond the cap never leave the exchange in the
    AQE-optimized plan). Deterministic given a total ``order_by``;
    without one, ties fall back to the score-free arrival order within
    the key (pass an id column for reproducibility).
    """
    if max_rows < 1:
        raise ValueError("max_rows must be >= 1")
    keys = [key] if isinstance(key, str) else list(key)
    if order_by is not None:
        order = [F.col(order_by).asc() if ascending else F.col(order_by).desc()]
        if tiebreak is not None:
            order.append(F.col(tiebreak).asc())
    elif tiebreak is not None:
        # no score, but the caller asked for determinism: honor it
        order = [F.col(tiebreak).asc()]
    else:
        order = [F.monotonically_increasing_id().asc()]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_rows)
        .drop("__rn")
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: every row gets exactly one
    label from ``weights`` (e.g. ``{"train": .98, "val": .01, "test":
    .01}``), chosen by content hash of its id — a pure map-side column
    expression (zero shuffle) whose assignment is independent of
    partitioning, task retries, and read order, and consistent across
    derived tables sharing the id (sample the ``documents`` split and the
    matching ``embeddings`` rows land in the same split). ``seed``
    decorrelates independent splits over the same ids. Weights are
    normalized; labels partition the hash space by cumulative boundaries
    in dict order. NULL ids all hash identically (as the empty string,
    salted with ``:{seed}``) and so land together in ONE label's bucket
    — deterministic but seed-dependent (whichever bucket
    ``hash(":<seed>")`` falls in, not necessarily the first label). Fix
    your ids: a null id also breaks the cross-table consistency
    property, which joins on the id.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(v < 0 for v in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError("weights must be non-negative and sum > 0")
    norm = sum(weights.values())
    bucket = _content_bucket(id_col, salt=f":{seed}")
    labels = list(weights)
    cum, bounds = 0.0, []
    for name in labels:
        cum += weights[name] / norm
        bounds.append(int(round(cum * _BUCKETS)))
    expr = F.lit(labels[-1])  # last label absorbs rounding slack
    for name, hi in zip(reversed(labels[:-1]), reversed(bounds[:-1])):
        expr = F.when(bucket < hi, F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def largest_remainder_quotas(
    weights: dict[str, float], total: int
) -> dict[str, int]:
    """Integer quotas summing exactly to ``total``, proportional to
    ``weights`` by largest-remainder rounding (ties broken by key asc) —
    shared by ``mix_to_weights`` and its oracle."""
    norm = sum(weights.values())
    raw = {k: total * v / norm for k, v in weights.items()}
    quota = {k: int(raw[k]) for k in raw}
    short = total - sum(quota.values())
    for k in sorted(raw, key=lambda k: (-(raw[k] - quota[k]), k))[:short]:
        quota[k] += 1
    return quota


def mix_to_weights(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    total: int,
    id_col: str,
) -> DataFrame:
    """Deterministic domain-mix resample: draw EXACTLY ``total`` rows (when
    available) distributed across ``key_col`` domains per ``weights`` —
    the "rebalance the crawl so code:web:papers is 2:7:1" step of a
    pretraining mixture. Per-key quotas use largest-remainder rounding
    (quotas sum exactly to ``total``); within a key, rows are ranked by
    content hash of ``id_col`` (ties by id) so the draw is a deterministic
    function of the data — rerun-stable, and within a key, a smaller
    quota's rows are always a prefix (subset) of a larger quota's. Note
    the per-KEY guarantee does not lift to ``total``: largest-remainder
    rounding is non-monotone in the total (the Alabama paradox — a key's
    quota can DROP by one when the total grows), so comparing draws at
    two totals can differ by one row per affected key. NULL ids rank
    first within their key (they hash as the empty string) —
    deterministic, but fix your ids. Keys absent from
    ``weights`` are dropped; a key with fewer rows than its quota
    contributes what it has (the shortfall is reported by comparing
    counts, not silently rebalanced — explicit beats surprising for
    mixture audits).

    Plan: ONE hash shuffle on ``key_col`` + ``row_number`` partial window
    sort (the cap_per_key shape) against a broadcast quota map; no
    driver-side data collection.
    """
    if total < 0:
        raise ValueError("total must be >= 0")
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(v < 0 for v in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError("weights must be non-negative and sum > 0")
    quota = largest_remainder_quotas(weights, total)
    quota_map = F.create_map(
        *[x for k, v in quota.items() for x in (F.lit(k), F.lit(v))]
    )
    rank_key = _content_bucket(id_col)
    w = Window.partitionBy(key_col).orderBy(
        rank_key.asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__q", quota_map[F.col(key_col)])
        .filter(F.col("__q").isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col("__q"))
        .drop("__q", "__rn")
    )


def perplexity_bucket(
    df: DataFrame,
    col: str,
    id_col: str,
    group_col: str | None = None,
    n_buckets: int = 3,
    score_col: str = "logppl",
    bucket_col: str = "ppl_bucket",
) -> DataFrame:
    """CCNet-style perplexity bucketing: score every document by the
    cross-entropy of a unigram language model and split each group
    (typically the language) into ``n_buckets`` quality tiers — bucket 1
    = lowest perplexity ("head"), the split CCNet keeps/weights by. The
    LM is SELF-TRAINED on the corpus (CCNet trains on Wikipedia; with no
    external corpus in scope, corpus self-statistics are the standard
    fallback and the plan is identical — to score against a reference
    corpus, union it in for the counting stage and filter it out after).

    score = ln(T) − mean_tokens(ln(count(token)))  — exactly the unigram
    cross-entropy in nats, where T is the corpus token total (collected
    once as a scalar literal, like pack_sequences' boundaries). Scores
    are rounded to 6 decimals BEFORE ranking so the bucket assignment is
    robust to float summation order (Spark and the DuckDB oracle may add
    per-token logs in different orders; agreement is ~1e-13, far inside
    the rounding quantum). Bucket = ``ntile`` over (score asc, id asc) —
    a total order, so assignment is deterministic.

    NULL text is treated as the empty string (tokenizes to the ``''``
    token, same as a blank doc), so null/empty docs get a real score and
    land wherever the corpus frequency of blank docs puts them — never
    silently promoted to bucket 1 by NULLS-FIRST ordering, and never a
    null-sort-order divergence from the SQL oracle.

    At 100 TB: token counting is one hash aggregate (map-side combine
    collapses stopword-grade hot tokens to one row per map task);
    scoring is a narrow (id, token) shuffle join against the count
    relation — AQE skew-join splits the hot-token probe partitions. NOT
    a per-token count window: ``Window.partitionBy(token)`` would put
    every occurrence of 'the' (~5% of a natural-language corpus) into
    ONE task, and window partitions cannot be AQE-split — the straggler
    outweighs the scan the window would save. The count relation is
    pinned with ``localCheckpoint`` before the scalar ``T`` collect so
    the corpus tokenization runs twice (count build + score probe), not
    three times. The ntile window runs ONE task per group — fine when
    groups are languages (bounded count, each holding rank-sortable
    narrow rows); for ungrouped bucketing of a whole 100 TB corpus,
    pre-shard the group key or gate on a score threshold from
    ``quantile_filter``'s distributed path instead.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    from lotus_spark.functions.text import tokens

    grp = [group_col] if group_col else []
    text = F.coalesce(F.col(col), F.lit(""))
    toks = df.select(
        F.col(id_col).alias("__did"),
        F.explode(tokens(text)).alias("__tok"),
    )
    # localCheckpoint (lazy): the vocab-sized count relation is consumed
    # twice (scalar T + the score join); RDD-level cache is released on
    # GC, the same no-unpersist-hook trade as _sessionize_salted
    counts = (
        toks.groupBy("__tok").agg(F.count("*").alias("__c"))
        .localCheckpoint(eager=False)
    )
    total = counts.agg(F.sum("__c")).first()[0] or 1
    scores = (
        toks.join(counts, "__tok")
        .groupBy("__did")
        .agg(
            F.round(
                F.lit(float(math.log(total)))
                - F.sum(F.log("__c")) / F.count("*"),
                6,
            ).alias(score_col)
        )
    )
    out = df.join(scores, df[id_col] == scores["__did"], "left").drop("__did")
    w = Window.partitionBy(*grp).orderBy(
        F.col(score_col).asc(), F.col(id_col).asc()
    )
    return out.withColumn(bucket_col, F.ntile(n_buckets).over(w))


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, derandomized — "draw n
    documents with probability proportional to quality score", the
    upweighting step of a curated pretraining mixture.

    Efraimidis–Spirakis A-ES: each row gets key ``u^(1/w)`` for a
    uniform ``u`` in (0,1); the n largest keys are a without-replacement
    weighted sample. Here ``u`` derives from the content hash of
    ``id_col`` (salted by ``seed``) instead of an RNG, so the draw is a
    pure deterministic function of the data: rerun-stable, partitioning-
    independent, and nested across seeds like the other sampling ops.

    Plan: map-side key expression + ``orderBy(key DESC, id).limit(n)``
    — a TakeOrderedAndProject, so only n rows per partition ever cross
    the shuffle; no window, no skew surface. Rows with NULL,
    zero or negative weight are excluded (they have probability 0;
    excluding beats a NaN key silently winning the sort).

    Ties in ``u`` across seeds are fine (different salt → different u);
    ties in the KEY are broken by id ascending, making the result a
    total deterministic function of (data, seed, n).
    """
    if n < 0:
        raise ValueError("n must be >= 0")
    if n == 0:
        return df.limit(0)
    # u in (0,1): (bucket + 1) / (_BUCKETS + 1) — never exactly 0 or 1,
    # so ln(u) is finite and u^(1/w) is strictly inside (0,1)
    u = (_content_bucket(id_col, salt=f":w{seed}") + F.lit(1)).cast(
        "double") / F.lit(float(_BUCKETS + 1))
    w = F.col(weight_col).cast("double")
    key = F.pow(u, F.lit(1.0) / w)
    # NaN must be excluded explicitly: Spark orders NaN ABOVE every
    # finite double, so `w > 0` passes NaN and pow(u, 1/NaN) = NaN
    # would silently win the descending sort.
    eligible = df.filter(w.isNotNull() & ~F.isnan(w) & (w > 0))
    return (
        eligible.withColumn("__wkey", key)
        .orderBy(F.desc("__wkey"), F.asc(id_col))
        .limit(n)
        .drop("__wkey")
    )
