from noaa_ais_glue_lakehouse_spark.streaming.sessions import (
    latest_state,
    read_event_stream,
    sessionized_stats,
    start_partitioned_stream_sink,
    stateful_sessionize,
)

__all__ = [
    "latest_state",
    "read_event_stream",
    "sessionized_stats",
    "start_partitioned_stream_sink",
    "stateful_sessionize",
]
