from nt_data_pipelines_spark.streaming.incremental import (
    ann_index_foreach_batch,
    dedup_foreach_batch,
    minhash_foreach_batch,
    run_available_now,
    search_ann_index,
    streaming_dedup_ids,
    streaming_dup_groups,
    streaming_enrich,
    streaming_event_counts,
    streaming_sessions,
    streaming_stream_join,
    upsert_foreach_batch,
)
from nt_data_pipelines_spark.streaming.stateful import (
    streaming_drawdown,
    streaming_ewma,
    streaming_rsi,
)

__all__ = [
    "ann_index_foreach_batch",
    "dedup_foreach_batch",
    "minhash_foreach_batch",
    "run_available_now",
    "search_ann_index",
    "streaming_dedup_ids",
    "streaming_drawdown",
    "streaming_dup_groups",
    "streaming_enrich",
    "streaming_event_counts",
    "streaming_ewma",
    "streaming_rsi",
    "streaming_sessions",
    "streaming_stream_join",
    "upsert_foreach_batch",
]
