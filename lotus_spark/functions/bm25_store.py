"""Persisted BM25 inverted index: the lexical-retrieval serving path.

``functions/bm25.py`` computes its three relations per call — right for
one-shot queries, wasteful when a corpus is queried all day. This
module persists them with the same lifecycle discipline as the other
two corpus indexes (MinHash-LSH, IVF-PQ): write once, append daily,
serve many queries, each query reading a BOUNDED slice of the index.
The reference's retrieval surface is embedding-only
(lotus/sem_ops/sem_search.py); a lexical serving index is built here
Spark-first because production retrieval stacks cannot run without one.

Layout (the inverted-list idea expressed as parquet partitioning):

- ``{path}/postings`` — one row per (term, doc): ``(term, id, tf, dl)``
  written ``partitionBy(bucket)`` where ``bucket = pmod(xxhash64(term),
  n_buckets)``. The doc length ``dl`` is DENORMALIZED into the posting
  (computed map-side before the explode), so scoring never joins the
  doc-lengths table — a query touches |query terms| buckets' worth of
  postings and NOTHING else. Partition pruning is the inverted-list
  lookup, done by the storage layer (same trick as the IVF-PQ cell
  layout).
- ``{path}/termdf`` — ``(term, df)``, bucket-partitioned the same way
  (vocabulary-sized; rewritten on append since term frequencies change).
- ``{path}/doclens`` — ``(id, dl)``: maintenance-only (append overlap
  guard, CDC deletes); queries never read it.
- ``{path}/_bm25_meta.json`` — pinned ``id_col``/``text_col``/
  ``n_buckets`` plus the corpus stats ``(n_docs, total_dl)``, so N and
  avgdl are literals at query time instead of a per-query aggregate
  over the doc-lengths relation. Pinned convention: the stats count
  docs with AT LEAST ONE token — exactly the population
  ``bm25.bm25_scores`` and the DuckDB oracle compute N/avgdl over —
  so indexing a corpus with empty or NULL texts scores identically to
  the one-shot path. Token-empty docs still get doclens rows (dl=0;
  the append overlap guard and CDC deletes must see every id) but
  contribute no postings and no stats.

Scoring is byte-identical to ``bm25.bm25_search`` / its DuckDB oracle:
the same Okapi expressions, per-(doc, term) partials rounded to 9
decimals and summed as DECIMAL (order-independent) — pinned by a parity
test and the ``bm25_index_search`` oracle row.

Single-writer maintenance (write/append/compact-by-delete), like every
other index in this engine. CDC delete + snapshot upsert live in
``functions/index_cdc.py``.
"""
from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, functions as F

from lotus_spark.functions.text import tokens

_META = "_bm25_meta.json"


def _encode(df: DataFrame, text_col: str, id_col: str,
            n_buckets: int) -> tuple[DataFrame, DataFrame]:
    """(postings, doclens) for ``df`` — the single encode definition
    shared by write and append. ``dl`` is computed map-side on the token
    array (before the explode) and rides each posting row; tokenization
    and the empty-token filter match ``bm25.bm25_index`` exactly."""
    from lotus_spark.partitioning import ensure_parallelism

    # NULL text tokenizes to NULL whose size() is -1; coalesce to an
    # empty array so a NULL-text doc indexes as dl=0 like an empty one
    arr = F.coalesce(F.array_remove(tokens(F.col(text_col)), ""),
                     F.array().cast("array<string>"))
    base = ensure_parallelism(df).select(
        F.col(id_col).alias("id"), arr.alias("__toks"),
    ).withColumn("dl", F.size("__toks"))
    postings = (
        base.select("id", "dl", F.explode("__toks").alias("term"))
        .groupBy("term", "id", "dl").agg(F.count("*").alias("tf"))
        .withColumn("bucket",
                    F.pmod(F.xxhash64("term"), F.lit(n_buckets)))
        .select("term", "id", "tf", "dl", "bucket")
    )
    doclens = base.select("id", "dl")
    return postings, doclens


def _termdf(postings: DataFrame) -> DataFrame:
    return postings.groupBy("term", "bucket").agg(
        F.count("*").alias("df")).select("term", "df", "bucket")


def _corpus_stats(doclens: DataFrame) -> tuple[int, int]:
    """(n_docs, total_dl) over docs with >= 1 token — the pinned stats
    convention (module docstring): matches the population
    ``bm25.bm25_scores`` / the DuckDB oracle average over."""
    s = doclens.filter(F.col("dl") > 0).agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum("dl"), F.lit(0)).alias("t")).first()
    return int(s["n"]), int(s["t"])


def write_bm25_index(
    df: DataFrame,
    path: str,
    text_col: str,
    id_col: str,
    n_buckets: int = 64,
) -> None:
    """Build and persist the BM25 serving index: one tokenize/explode
    pass over the corpus (the index build's only full-data read), three
    parquet tables + the stats sidecar. At 100 TB choose ``n_buckets``
    so one bucket's postings are a few hundred MB (buckets are the
    query-time read unit). NULL ids are rejected loudly."""
    if df.filter(F.col(id_col).isNull()).count():
        raise ValueError("write_bm25_index: NULL ids are not indexable")
    postings, doclens = _encode(df, text_col, id_col, n_buckets)
    n_docs, total_dl = _corpus_stats(doclens)
    if n_docs == 0:
        # an all-empty corpus would write an empty partitioned postings
        # layout, which is unreadable — fail BEFORE any write
        raise ValueError(
            "write_bm25_index: no document has a single token — nothing "
            "to index")
    postings = postings.persist()
    postings.write.partitionBy("bucket").parquet(f"{path}/postings")
    _termdf(postings).write.partitionBy("bucket").parquet(f"{path}/termdf")
    doclens.write.parquet(f"{path}/doclens")
    from lotus_spark.functions.ann import _fs_write_json

    _fs_write_json(df.sparkSession, f"{path}/{_META}", {
        "id_col": id_col, "text_col": text_col,
        "n_buckets": int(n_buckets),
        "n_docs": n_docs,
        "total_dl": total_dl,
        # the query tables' exact read schemas (captured by inference
        # ONCE here, at build time) so every serving query can skip the
        # per-call footer-inference job (~0.1s of fixed driver latency
        # per table per query at sf0.1 — guide §7.3). The lifecycle
        # verbs (append/compact/CDC delete) rewrite tables
        # schema-preserving and carry the meta dict forward; sidecars
        # written before this field existed fall back to inference in
        # _read_index_table.
        "table_schemas": {
            t: df.sparkSession.read.parquet(f"{path}/{t}").schema.json()
            for t in ("postings", "termdf")
        },
    })
    postings.unpersist()


def read_bm25_meta(spark, path: str) -> dict:
    from lotus_spark.functions.ann import _fs_read_json

    meta = _fs_read_json(spark, f"{path}/{_META}")
    if meta is None:
        raise FileNotFoundError(
            f"no {_META} sidecar at {path} — not a BM25 index "
            "(write_bm25_index creates it)")
    return meta


def _read_index_table(spark, path: str, table: str, meta: dict) -> DataFrame:
    """One of the index's parquet query tables, with the schema PINNED
    from the sidecar when recorded there (``write_bm25_index``):
    ``spark.read.parquet`` otherwise runs a footer-inference job before
    a serving query reads a single posting — pure fixed driver latency
    (guide §7.3). Partition discovery (the bucket pruning) is
    unchanged; pre-r14 sidecars lack the field and fall back to
    inference. Maintenance verbs keep reading with inference — their
    guards should see the files as they are, not as the sidecar says
    they should be."""
    import json as _json

    from pyspark.sql.types import StructType

    sch = (meta.get("table_schemas") or {}).get(table)
    reader = spark.read
    if sch:
        reader = reader.schema(StructType.fromJson(_json.loads(sch)))
    return reader.parquet(f"{path}/{table}")


def _bm25_partial_sql(n: float, avgdl: float, k1: float, b: float) -> str:
    """SQL text of the per-(doc, term) Okapi partial over the posting
    columns (tf, dl) and the broadcast term df, with the sidecar corpus
    stats folded in as literals — parsed in ONE ``F.expr`` call where
    the per-Column assembly paid ~300 py4j round trips per query
    (guide §7.3; the r14 ADC-serving precedent). The parse yields the
    IDENTICAL expression tree — same association, same double literals
    (``repr`` is the shortest round-trip form and Spark parses it with
    Java ``parseDouble``, bit-exact) — pinned by
    tests/test_bm25_store.py::test_bm25_partial_sql_tree_matches_columns,
    so the decimal partials stay byte-identical to ``bm25.bm25_search``
    and the DuckDB oracle."""
    d = "{!r}D".format  # D-suffixed double literal, parseDouble-exact
    idf = (f"LN({d(1.0)} + ({d(float(n))} - df + {d(0.5)})"
           f" / (df + {d(0.5)}))")
    # operand order mirrors the former Column build exactly (Python's
    # __rmul__/__radd__ put the Column first), so the analyzed tree is
    # byte-identical, not merely value-identical
    partial = (f"{idf} * (tf * {d(1.0 + k1)})"
               f" / (tf + (dl * {d(float(b))} / {d(float(avgdl))}"
               f" + {d(1.0 - b)}) * {d(float(k1))})")
    return f"CAST(round({partial}, 9) AS DECIMAL(28,10))"


_BUCKET_CACHE: dict[tuple[str, int], int] = {}
_BUCKET_CACHE_MAX = 1_000_000  # entries; a serving vocabulary bound


def _term_buckets(spark, terms: list[str], n_buckets: int) -> list[int]:
    """Bucket ids for the query terms via the SAME JVM xxhash64 the
    writer used (one tiny local job — driver-side replication of
    Spark's hash would be a parity bug waiting to happen). The
    (term, n_buckets) → bucket mapping is a pure deterministic hash, so
    it caches process-wide: a serving process answering many queries
    over a shared vocabulary pays the mini-job only for never-seen
    terms (r11 verdict: ~1.4s fixed per-query overhead at sf0.1,
    amortized — BENCH_bm25.json stored_query_warm)."""
    if len(_BUCKET_CACHE) > _BUCKET_CACHE_MAX:
        _BUCKET_CACHE.clear()  # unbounded vocab: reset, never grow past
    missing = sorted({t for t in terms
                      if (t, n_buckets) not in _BUCKET_CACHE})
    if missing:
        df = spark.createDataFrame([(t,) for t in missing], "term string")
        for r in df.select(
            "term",
            F.pmod(F.xxhash64("term"), F.lit(n_buckets)).alias("b"),
        ).collect():
            _BUCKET_CACHE[(r["term"], n_buckets)] = int(r["b"])
    return sorted({_BUCKET_CACHE[(t, n_buckets)] for t in terms})


def bm25_search_index(
    spark,
    path: str,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` lexical search against the persisted index. Plan: the
    query terms' buckets prune the postings scan (PartitionFilters —
    pinned in tests/test_plan_shapes.py), the term IN-filter pushes into
    it, term df joins as a broadcast, N/avgdl fold in as sidecar
    literals, and the decimal score accumulation + top-k match
    ``bm25.bm25_search`` bit for bit. Nothing proportional to corpus or
    vocabulary size is read, shuffled, or collected."""
    meta = read_bm25_meta(spark, path)
    if not int(meta["n_docs"]):
        raise ValueError("bm25_search_index: the index is empty")
    terms = sorted(set(query.strip().lower().split()))
    if not terms:
        raise ValueError("empty query")
    buckets = _term_buckets(spark, terms, meta["n_buckets"])

    posts = (
        _read_index_table(spark, path, "postings", meta)
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
    )
    tdf = (
        _read_index_table(spark, path, "termdf", meta)
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
        .select("term", "df")
    )
    n = float(meta["n_docs"])
    avgdl = float(meta["total_dl"]) / float(meta["n_docs"])
    hits = posts.join(F.broadcast(tdf), "term")
    return (
        hits.withColumn("p", F.expr(_bm25_partial_sql(n, avgdl, k1, b)))
        .groupBy("id").agg(F.sum("p").cast("double").alias("score"))
        .orderBy(F.desc("score"), F.asc("id")).limit(k)
        .withColumnRenamed("id", meta["id_col"])
    )


def bm25_search_index_batch(
    spark,
    path: str,
    queries: dict,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    query_col: str = "query_id",
) -> DataFrame:
    """Batched lexical serving: answer MANY queries in ONE pass over the
    UNION of the batch's term buckets, per-query identical to
    :func:`bm25_search_index` (parity-pinned in tests and the
    ``hybrid_search_stored_batch`` oracle row). ``queries`` maps a query
    id (stringified into ``query_col``) to its query text; returns
    ``(query_col, id_col, score)`` with up to ``k`` rows per query (a
    query whose terms hit no document contributes no rows, exactly as
    the single call returns an empty frame).

    Why batch: the single-query path's wall at serving time is dominated
    by FIXED per-job overhead (bucket lookup + postings read + termdf
    broadcast + top-k — several small Spark jobs per query,
    BENCH_serving.json), not by the bounded bytes it reads. Concurrent
    queries' bucket sets overlap (popular terms), so one scan of the
    bucket UNION serves the whole batch: each posting row fans out to
    the queries containing its term via a broadcast of the tiny
    (query, term) membership relation, scores accumulate per
    ``(query, id)`` with the SAME rounded-decimal partials as the
    single path, and the per-query top-k is one window over a bounded
    relation. Q queries cost ONE job of scheduling instead of Q — the
    lexical twin of ``ann.knn_topk_ivfpq_batch``, and the same reason
    production BM25 stacks batch their query traffic."""
    meta = read_bm25_meta(spark, path)
    if not int(meta["n_docs"]):
        raise ValueError("bm25_search_index_batch: the index is empty")
    if not queries:
        raise ValueError("queries must be non-empty")
    if len({str(qid) for qid in queries}) != len(queries):
        raise ValueError(
            "bm25_search_index_batch: query ids collide after str() — "
            f"{sorted(str(q) for q in queries)}; use distinct string ids")
    qterms: dict[str, list[str]] = {}
    for qid, text in queries.items():
        terms = sorted(set(str(text).strip().lower().split()))
        if not terms:
            raise ValueError(f"empty query for id {qid!r}")
        qterms[str(qid)] = terms
    all_terms = sorted({t for ts in qterms.values() for t in ts})
    buckets = _term_buckets(spark, all_terms, meta["n_buckets"])

    posts = (
        _read_index_table(spark, path, "postings", meta)
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(all_terms))
    )
    tdf = (
        _read_index_table(spark, path, "termdf", meta)
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(all_terms))
        .select("term", "df")
    )
    # the (query, term) membership relation as an inline VALUES table
    # (LocalRelation), not createDataFrame: the latter plans a
    # Python-RDD scan, so EVERY execution of the broadcast spun up a
    # Python worker just to emit these few rows — this keeps the
    # lexical serving path entirely JVM-side (guide §4: eliminate the
    # boundary) and parses in one call
    from lotus_spark.functions.ann import _sql_str

    rows = ",".join(f"({_sql_str(qid)}, {_sql_str(t)})"
                    for qid, ts in qterms.items() for t in ts)
    membership = spark.sql(
        f"SELECT * FROM VALUES {rows} AS t(`{query_col}`, term)")
    n = float(meta["n_docs"])
    avgdl = float(meta["total_dl"]) / float(meta["n_docs"])
    hits = (posts.join(F.broadcast(tdf), "term")
            .join(F.broadcast(membership), "term"))
    scored = (
        hits.withColumn("p", F.expr(_bm25_partial_sql(n, avgdl, k1, b)))
        .groupBy(query_col, "id")
        .agg(F.sum("p").cast("double").alias("score"))
    )
    return (
        scored.withColumn("__rk", F.expr(
            f"row_number() OVER (PARTITION BY `{query_col}`"
            f" ORDER BY score DESC, id ASC)"))
        .filter(F.col("__rk") <= k)
        .select(query_col, F.col("id").alias(meta["id_col"]), "score")
    )


def append_bm25_index(
    spark, path: str, new_df: DataFrame,
    text_col: str | None = None, id_col: str | None = None,
) -> None:
    """Grow the index with new docs: one map-only encode pass, doclens
    appended FIRST, then postings, then the vocabulary-sized termdf
    REWRITTEN (term frequencies change — the rewrite is swap-installed,
    verified first), sidecar stats updated last. Already-indexed ids
    are rejected loudly (re-appending would double-count their
    postings); column names default to the sidecar-pinned ones. The
    grown index answers every query identically to a from-scratch write
    of the union (pinned in tests and the ``bm25_index_search`` oracle
    row).

    Crash/retry contract: the append is NOT atomic across its four
    updates. doclens is written before anything else precisely so a
    retry of a partially applied append FAILS LOUDLY on the
    doclens-based duplicate check above (appending postings first
    would let the retry silently double-count tf). Recovery from any
    mid-append crash is ``index_cdc.delete_from_bm25_index`` of the
    increment's ids, then re-run the append — the delete rewrites
    postings/doclens, recomputes termdf from the surviving postings,
    and refreshes the sidecar stats, healing every partial state."""
    from lotus_spark.functions.ann import _fs_write_json

    meta = read_bm25_meta(spark, path)
    text_col = text_col or meta["text_col"]
    id_col = id_col or meta["id_col"]
    if new_df.filter(F.col(id_col).isNull()).count():
        raise ValueError("append_bm25_index: NULL ids are not indexable")
    existing = spark.read.parquet(f"{path}/doclens").select("id")
    dup = (
        new_df.select(F.col(id_col).alias("id"))
        .join(existing, "id", "semi").limit(3).collect()
    )
    if dup:
        raise ValueError(
            f"append_bm25_index: ids already indexed "
            f"(e.g. {[r['id'] for r in dup]}) — delete them first "
            "(functions/index_cdc.py) for replace-style updates")

    postings, doclens = _encode(new_df, text_col, id_col,
                                meta["n_buckets"])
    postings = postings.persist()
    # doclens FIRST: the dup check above reads it, so a crash anywhere
    # past this line makes a blind retry fail loudly instead of
    # double-appending postings (see the docstring's recovery contract)
    doclens.write.mode("append").parquet(f"{path}/doclens")
    postings.write.mode("append").partitionBy("bucket") \
        .parquet(f"{path}/postings")

    # termdf rewrite: old + delta, verified, swap-installed
    merged = (
        spark.read.parquet(f"{path}/termdf")
        .unionByName(_termdf(postings))
        .groupBy("term", "bucket").agg(F.sum("df").alias("df"))
        .select("term", "df", "bucket")
    )
    _swap_rewrite_table(spark, f"{path}/termdf", merged,
                        "append_bm25_index")

    inc_n, inc_t = _corpus_stats(doclens)
    meta["n_docs"] = int(meta["n_docs"]) + inc_n
    meta["total_dl"] = int(meta["total_dl"]) + inc_t
    _fs_write_json(spark, f"{path}/{_META}", meta)
    postings.unpersist()


def compact_bm25_index(spark, path: str) -> None:
    """Small-files maintenance: daily appends add files under every
    touched bucket directory until scans are file-open bound — the same
    pathology ``compact_ivfpq_index`` fixes for the vector index.
    Rewrites postings and termdf to ONE file per bucket
    (hash-repartition on the bucket id) and doclens to byte-sized file
    counts, verifies row counts, swaps the whole directory in with the
    usual two renames. Single-writer; row sets unchanged (a query
    answers identically — pinned in tests). Deletes already compact as
    a side effect, so schedule this only on append-heavy indexes."""
    import math
    import uuid as _uuid

    from lotus_spark.functions.ann import _fs_write_json

    from lotus_spark.functions.index_cdc import _assert_no_unknown_siblings

    # refuse rather than silently destroy anything co-located (the
    # whole-dir swap carries only the three tables + sidecar — r12)
    _assert_no_unknown_siblings(
        spark, path, ("postings", "termdf", "doclens"), _META,
        "compact_bm25_index")
    meta = read_bm25_meta(spark, path)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()

    def p(s):
        return jvm.org.apache.hadoop.fs.Path(s)

    fs = p(path).getFileSystem(conf)
    tmp = f"{path}.compact-{_uuid.uuid4().hex[:8]}"

    counts = {}
    for table in ("postings", "termdf"):
        df = spark.read.parquet(f"{path}/{table}")
        counts[table] = df.count()
        (df.repartition(F.col("bucket"))
         .write.partitionBy("bucket").parquet(f"{tmp}/{table}"))
    dl = spark.read.parquet(f"{path}/doclens")
    counts["doclens"] = dl.count()
    n_bytes = fs.getContentSummary(p(f"{path}/doclens")).getLength()
    dl.repartition(max(1, math.ceil(n_bytes / (128 << 20)))) \
        .write.parquet(f"{tmp}/doclens")
    _fs_write_json(spark, f"{tmp}/{_META}", meta)

    for table in ("postings", "termdf", "doclens"):
        n_after = spark.read.parquet(f"{tmp}/{table}").count()
        if n_after != counts[table]:
            fs.delete(p(tmp), True)
            raise RuntimeError(
                f"compact_bm25_index: compacted {table} has {n_after} "
                f"rows, expected {counts[table]}; original untouched")
    old = f"{path}.old-{_uuid.uuid4().hex[:8]}"
    if not fs.rename(p(path), p(old)):
        fs.delete(p(tmp), True)
        raise RuntimeError(f"compact_bm25_index: could not move {path}")
    if not fs.rename(p(tmp), p(path)):
        if not fs.rename(p(old), p(path)):  # roll back
            raise RuntimeError(
                f"compact_bm25_index: could not install compacted index "
                f"AND the rollback failed — data intact at {old} and "
                f"{tmp}; rename one back to {path} by hand")
        fs.delete(p(tmp), True)
        raise RuntimeError(
            "compact_bm25_index: could not install compacted index; "
            "original restored")
    fs.delete(p(old), True)


def _swap_rewrite_table(spark, table_path: str, new_df: DataFrame,
                        who: str) -> None:
    """Rewrite ONE parquet table via the verify-then-two-renames
    discipline every index maintainer here uses."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()

    def p(s):
        return jvm.org.apache.hadoop.fs.Path(s)

    fs = p(table_path).getFileSystem(conf)
    n_want = new_df.count()
    tmp = f"{table_path}.rw-{uuid.uuid4().hex[:8]}"
    new_df.write.partitionBy("bucket").parquet(tmp)
    n_got = spark.read.parquet(tmp).count()
    if n_got != n_want:
        fs.delete(p(tmp), True)
        raise RuntimeError(
            f"{who}: rewrite has {n_got} rows, expected {n_want}")
    old = f"{table_path}.old-{uuid.uuid4().hex[:8]}"
    if not fs.rename(p(table_path), p(old)):
        fs.delete(p(tmp), True)
        raise RuntimeError(f"{who}: could not move {table_path}")
    if not fs.rename(p(tmp), p(table_path)):
        if not fs.rename(p(old), p(table_path)):
            raise RuntimeError(
                f"{who}: install AND rollback failed — data intact at "
                f"{old} and {tmp}; rename one back to {table_path}")
        fs.delete(p(tmp), True)
        raise RuntimeError(f"{who}: could not install rewrite; "
                           "original restored")
    fs.delete(p(old), True)
