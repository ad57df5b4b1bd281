from nt_data_pipelines_spark.streaming.incremental import (
    ann_index_foreach_batch,
    dedup_foreach_batch,
    minhash_foreach_batch,
    run_available_now,
    streaming_dup_groups,
    search_ann_index,
    streaming_enrich,
    streaming_event_counts,
    streaming_stream_join,
    upsert_foreach_batch,
)

__all__ = [
    "ann_index_foreach_batch",
    "search_ann_index",
    "streaming_event_counts",
    "streaming_enrich",
    "streaming_stream_join",
    "upsert_foreach_batch",
    "run_available_now",
    "dedup_foreach_batch",
    "minhash_foreach_batch",
    "streaming_dup_groups",
]
