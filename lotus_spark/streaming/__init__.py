from lotus_spark.streaming.ops import (
    read_parquet_stream,
    sem_filter_stream,
    sem_map_stream,
    streaming_dedup,
    streaming_heavy_hitters,
    streaming_neardup,
    streaming_neardup_minhash,
    running_doc_stats,
    windowed_doc_stats,
)

__all__ = [
    "read_parquet_stream",
    "sem_filter_stream",
    "sem_map_stream",
    "streaming_dedup",
    "streaming_heavy_hitters",
    "streaming_neardup",
    "streaming_neardup_minhash",
    "running_doc_stats",
    "windowed_doc_stats",
]
