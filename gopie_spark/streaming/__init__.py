"""Structured Streaming surface: micro-batch sketch builds, dedup,
latest-N conflation, pubsub-style fan-out."""

from gopie_spark.streaming.conflate import LatestNConflate, latest_n
from gopie_spark.streaming.dedup import (BloomStreamingDedup,
                                         sharded_bloom_streaming_dedup,
                                         streaming_exact_dedup)
from gopie_spark.streaming.microbatch import (StreamingSketch,
                                              fanout_foreach_batch,
                                              windowed_stream_counts)
from gopie_spark.streaming.sessions import StreamingSessions
from gopie_spark.streaming.stateful import (streaming_heavy_hitters,
                                            streaming_hll_estimates)

__all__ = ["StreamingSketch", "windowed_stream_counts",
           "streaming_hll_estimates", "streaming_heavy_hitters",
           "BloomStreamingDedup",
           "streaming_exact_dedup", "sharded_bloom_streaming_dedup",
           "latest_n", "LatestNConflate",
           "fanout_foreach_batch", "StreamingSessions"]
