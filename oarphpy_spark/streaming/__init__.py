from oarphpy_spark.streaming.windows import (  # noqa: F401
    sessionized_stream,
    sliding_counts_stream,
    stream_events,
    tumbling_counts_stream,
)
