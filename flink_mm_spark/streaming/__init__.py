from flink_mm_spark.streaming.events import (  # noqa: F401
    events_stream,
    session_aggregate,
    sliding_aggregate,
    streaming_dedup,
    tumbling_aggregate,
)
