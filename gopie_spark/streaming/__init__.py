"""Structured Streaming surface: micro-batch sketch builds."""

from gopie_spark.streaming.microbatch import (StreamingSketch,
                                              windowed_stream_counts)

__all__ = ["StreamingSketch", "windowed_stream_counts"]
