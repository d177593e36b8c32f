"""Streaming maintenance of a persisted IVF-PQ index.

Completes the train-once/add-many story (`ann.append_ivfpq_index`) for
the ingest path: files land, Structured Streaming picks them up, and
every micro-batch is encoded with the index's EXISTING quantizers and
appended to the partitioned layout — the index stays queryable and
fresh without retraining or rebuilding, which is how a 100 TB corpus
index actually absorbs a live feed.

Lives in its own module (not ``streaming/ops.py``) so the streaming
operators' registry rotation state is untouched this round.

Exactly-once: ``foreachBatch`` replays a failed epoch with the SAME
batch_id, so the sink records committed batch ids in a
``_stream_batches.json`` sidecar next to the index metadata and skips
any batch id at or below the high-water mark — a replayed epoch appends
nothing twice. Single-writer (one streaming query per index path), the
normal topology for an index feed.

Contract boundaries, stated plainly:

- **Batch ids are checkpoint-scoped.** With the SAME checkpoint dir,
  ids increase monotonically across restarts and the sidecar gives
  exactly-once. Starting a FRESH checkpoint re-reads the source from
  scratch with ids restarting at 0 — safe as a full-replay backfill
  (every low id is an already-appended epoch, skipped), but NOT safe
  if the source also gained NEW files since the original run: their
  epochs would reuse low ids and be wrongly skipped. Resuming with new
  data means reusing the original checkpoint (the normal operation) or
  deleting the sidecar alongside the checkpoint.
- **The append and the sidecar write are two steps.** A crash between
  them replays that one epoch's append (at-least-once for exactly the
  crashed epoch). Downstream exact-dedup by id, or accepting duplicate
  index entries (search returns the same vector twice; rerank output
  unaffected beyond the duplicate id), covers the residue.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame


def _sidecar_path(spark, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{path}/_stream_batches.json")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return p, fs, jvm


def _read_high_water(spark, path: str) -> int:
    p, fs, jvm = _sidecar_path(spark, path)
    if not fs.exists(p):
        return -1
    stream = fs.open(p)
    try:
        baos = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 65536, False)
        return int(json.loads(bytes(baos.toByteArray()).decode())["last_batch_id"])
    finally:
        stream.close()


def _write_high_water(spark, path: str, batch_id: int) -> None:
    p, fs, jvm = _sidecar_path(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(json.dumps({"last_batch_id": int(batch_id)}).encode()))
    finally:
        out.close()


def stream_append_ivfpq(
    stream: DataFrame,
    index_path: str,
    emb_col: str = "embedding",
    checkpoint_dir: str | None = None,
    available_now: bool = False,
):
    """Start a streaming query that appends every micro-batch to the
    IVF-PQ index at ``index_path`` (which must already exist —
    ``write_ivfpq_index`` creates it; quantizers are never retrained
    here). Rows with NULL ``emb_col`` are dropped per batch (a stream
    must not crash on one bad row; the batch-path
    ``append_ivfpq_index`` raises instead — both documented).

    Returns the started ``StreamingQuery``. ``available_now=True``
    drains the current backlog and stops (the deterministic test/
    backfill trigger); otherwise the query runs until stopped.
    """
    from pyspark.sql import functions as F

    from lotus_spark.functions.ann import append_ivfpq_index

    if not stream.isStreaming:
        raise ValueError("stream_append_ivfpq expects a streaming "
                         "DataFrame; use append_ivfpq_index for batches")

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_id <= _read_high_water(spark, index_path):
            return  # replayed epoch after failure: already appended
        clean = batch_df.filter(F.col(emb_col).isNotNull())
        if clean.isEmpty():
            _write_high_water(spark, index_path, batch_id)
            return
        append_ivfpq_index(spark, index_path, clean, emb_col=emb_col)
        _write_high_water(spark, index_path, batch_id)

    w = stream.writeStream.foreachBatch(_append).outputMode("append")
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
