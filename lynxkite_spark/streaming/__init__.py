from lynxkite_spark.streaming.events import (
    sessionize,
    streaming_event_counts,
    windowed_event_counts,
)

__all__ = ["sessionize", "streaming_event_counts", "windowed_event_counts"]
