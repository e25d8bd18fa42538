"""Structured Streaming surface: micro-batch sketch builds."""

from gopie_spark.streaming.microbatch import (StreamingSketch,
                                              windowed_stream_counts)
from gopie_spark.streaming.stateful import streaming_hll_estimates

__all__ = ["StreamingSketch", "windowed_stream_counts",
           "streaming_hll_estimates"]
