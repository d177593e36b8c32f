"""Runnable walkthrough: a crawl day, from WARC shards to clean docs.

The front half of the 100 TB pipeline (examples/curation_pipeline.py is
the back half): crawl dumps arrive as per-record-gzip WARC shards, get
parsed with file-level parallelism, HTTP-split, text-extracted, quality
gated, and dedup-gated against the persisted corpus index — all before
a single document is considered "new data".

    python examples/crawl_ingest.py [sf_dir]   # default sf0.001

The shard here is synthesized from the documents table (no network in
this container); swap the path for s3a://commoncrawl/... in production.
"""

from __future__ import annotations

import gzip
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _synthesize_shard(rows, path: str) -> None:
    """One .warc.gz with a per-record gzip member per doc — the Common
    Crawl layout — wrapping each text in a minimal HTML page."""
    members = []
    for r in rows:
        html = (f"<html><head><title>doc {r['doc_id']}</title>"
                f"<style>p {{margin: 0}}</style></head>"
                f"<body><p>{r['text']}</p></body></html>")
        payload = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                   + html.encode())
        rec = (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:doc:{r['doc_id']}>\r\n"
            f"WARC-Target-URI: http://synth.example/{r['doc_id']}\r\n"
            f"Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode() + payload + b"\r\n\r\n"
        members.append(gzip.compress(rec))
    with open(path, "wb") as f:
        f.write(b"".join(members))


def main() -> None:
    from pyspark.sql import functions as F

    from lotus_spark.functions.dedup_index import (
        dedup_against_index, write_minhash_index,
    )
    from lotus_spark.functions.text import gopher_keep
    from lotus_spark.session import get_spark
    from lotus_spark.sources.warc import html_to_text, load_warc

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    workdir = tempfile.mkdtemp(prefix="crawl_ingest_")

    # today's "crawl": 150 pages, 50 of which duplicate the corpus
    crawl_rows = docs.filter("doc_id < 150").select("doc_id", "text") \
        .orderBy("doc_id").collect()
    shard = f"{workdir}/CC-SYNTH-00000.warc.gz"
    _synthesize_shard(crawl_rows, shard)

    # the already-curated corpus index (docs 100..499 stand in)
    idx = f"{workdir}/corpus_index"
    write_minhash_index(docs.filter("doc_id >= 100"), idx,
                        "text", "doc_id", n_hashes=16, bands=4)

    # 1. PARSE: one task per shard file; strict framing; HTTP split
    pages = load_warc(spark, shard, parse_http=True)
    n_pages = pages.count()

    # 2. EXTRACT: body bytes -> text, all JVM-side expressions
    extracted = pages.select(
        F.regexp_extract("target_uri", r"/(\d+)$", 1).cast("long")
         .alias("doc_id"),
        html_to_text(F.decode(F.col("body"), "UTF-8")).alias("text"),
    ).filter(F.col("http_status") == 200)

    # 3. QUALITY gate (Gopher heuristics, codegen)
    gated = extracted.filter(gopher_keep(F.col("text")))
    n_gated = gated.count()

    # 4. CORPUS dedup gate: only pages novel vs the persisted index
    # survive (one band equi-join against the narrow buckets table —
    # the corpus text is never read)
    novel = dedup_against_index(spark, idx, gated, "text", "doc_id",
                                threshold=0.5)
    n_novel = novel.count()

    # 5. EXPORT: re-publish the curated survivors as WARC shards
    # (WET-style "conversion" records — the interchange format the
    # day's data arrived in; shard count follows the partitioning)
    from lotus_spark.sources.warc import write_warc

    shards = write_warc(
        novel.withColumn("uri", F.concat(F.lit("doc://"), "doc_id"))
             .repartition(2, "doc_id"),
        f"{workdir}/curated", "text", uri_col="uri",
        warc_type="conversion",
    )

    print(f"crawl day: {n_pages} pages -> {n_gated} past quality -> "
          f"{n_novel} novel vs the corpus index -> re-exported as "
          f"{len(shards)} WARC shard(s), "
          f"{sum(n for _, n in shards)} records")
    print(f"(the ~{n_gated - n_novel} drops near-duplicate indexed docs; "
          "survivors flow into examples/curation_pipeline.py)")


if __name__ == "__main__":
    main()
