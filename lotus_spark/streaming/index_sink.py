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
normal topology for an index feed. The sidecar write goes through
``ann._fs_write_json`` (temp + rename), so a crash mid-write leaves it
missing-or-previous, never truncated mid-json — a consumer can always
parse what it finds.

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

from pyspark.sql import DataFrame


def _read_high_water(spark, path: str) -> int:
    from lotus_spark.functions.ann import _fs_read_json

    meta = _fs_read_json(spark, f"{path}/_stream_batches.json")
    return -1 if meta is None else int(meta["last_batch_id"])


def _write_high_water(spark, path: str, batch_id: int) -> None:
    from lotus_spark.functions.ann import _fs_write_json

    _fs_write_json(spark, f"{path}/_stream_batches.json",
                   {"last_batch_id": int(batch_id)})


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

    Hot-path cost: the quantizers/meta are read ONCE when the first
    batch arrives and cached in the closure (single-writer: nothing
    else mutates them mid-run; a compaction between runs preserves the
    sidecar, see ``compact_ivfpq_index``), so each epoch is one encode+
    append job over the micro-batch plus the sidecar write — no
    per-batch meta re-read, no redundant NULL recount.

    Returns the started ``StreamingQuery``. ``available_now=True``
    drains the current backlog and stops (the deterministic test/
    backfill trigger); otherwise the query runs until stopped.
    """
    from pyspark.sql import functions as F

    from lotus_spark.functions.ann import (
        _fs_read_json, encode_ivfpq, read_ivfpq_index,
    )

    if not stream.isStreaming:
        raise ValueError("stream_append_ivfpq expects a streaming "
                         "DataFrame; use append_ivfpq_index for batches")

    cached: dict = {}

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_id <= _read_high_water(spark, index_path):
            return  # replayed epoch after failure: already appended
        if not cached:
            stored, cents, books, cell_col = read_ivfpq_index(
                spark, index_path)
            meta = _fs_read_json(
                spark, f"{index_path}/_ivfpq_meta.json") or {}
            cached.update(
                columns=stored.columns, cents=cents, books=books,
                cell_col=cell_col,
                code_col=meta.get("code_col", "pq_codes"))
        enc = encode_ivfpq(
            batch_df.filter(F.col(emb_col).isNotNull()),
            emb_col, cached["cents"], cached["books"],
            cell_col=cached["cell_col"], code_col=cached["code_col"],
        ).select(*cached["columns"])
        # an empty epoch appends zero files — no isEmpty pre-check job
        enc.write.partitionBy(cached["cell_col"]).mode("append").parquet(
            index_path)
        _write_high_water(spark, index_path, batch_id)

    w = stream.writeStream.foreachBatch(_append).outputMode("append")
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
