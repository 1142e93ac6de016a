from pyspark_etl_project_spark.streaming.ingest import (
    stream_events,
    windowed_event_agg,
    run_stream_to_memory,
    foreach_batch_scd2,
    scd2_merge_batch,
    scd2_route_arrivals,
    band_index_batch,
    kmv_batch,
)

__all__ = [
    "stream_events",
    "windowed_event_agg",
    "run_stream_to_memory",
    "foreach_batch_scd2",
    "scd2_merge_batch",
    "scd2_route_arrivals",
    "band_index_batch",
    "kmv_batch",
]
