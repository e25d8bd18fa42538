"""Streaming deduplication over micro-batches.

Two tiers, mirroring the batch dedup trade-off at unbounded input:

- :func:`streaming_exact_dedup` — exact: normalized content digest +
  ``dropDuplicates`` on the digest.  Spark's state store keeps one entry
  per distinct digest, so state grows with the number of distinct
  documents ever seen; bound it with a watermark (pass ``ts_col`` +
  ``within``) when late duplicates only matter inside a horizon.
- :class:`BloomStreamingDedup` — bounded-state: a scalable Bloom filter
  (kernels/bloom.py, tightening-FPR levels) accumulated across batches
  via ``foreachBatch``.  State is O(bits) regardless of stream length;
  the price is a false-positive rate <= p of *unique* docs wrongly
  dropped (never the reverse — a doc that passes the filter is always
  genuinely first-seen among retained docs).  This is the only shape
  that survives an unbounded 10^12-doc stream without a state-store
  the size of the corpus.

Within a micro-batch, duplicates are removed exactly (digest groupBy)
before the filter is consulted, so results do not depend on row order
inside a batch.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from gopie_spark.kernels import BloomScalable


def content_digest(text_col: str = "text") -> "F.Column":
    """The batch-tier digest (operators/dedup.py) — same normalization,
    so streaming and batch dedup agree on what 'duplicate' means."""
    return F.md5(F.lower(F.regexp_replace(F.col(text_col), r"\s+", " ")))


def streaming_exact_dedup(stream_df: DataFrame, text_col: str = "text",
                          ts_col: Optional[str] = None,
                          within: Optional[str] = None) -> DataFrame:
    """Exact streaming dedup by content digest.

    With ``ts_col`` + ``within`` (e.g. ``"1 hour"``), uses a watermark +
    ``dropDuplicatesWithinWatermark`` so the digest state store is
    bounded by the horizon instead of the corpus."""
    df = stream_df.withColumn("_fp", content_digest(text_col))
    if ts_col is not None and within is not None:
        return (df.withWatermark(ts_col, within)
                .dropDuplicatesWithinWatermark(["_fp"]).drop("_fp"))
    return df.dropDuplicates(["_fp"]).drop("_fp")


class BloomStreamingDedup:
    """Bounded-state streaming dedup: accumulate digests in a scalable
    Bloom filter across micro-batches; first occurrence (by the min of
    ``order_col``) of each digest survives, later ones are dropped.

    Use via ``stream.writeStream.foreachBatch(d.process_batch)`` — the
    survivors of each batch are appended to ``out_dir`` as parquet.
    The filter lives on the driver (KBs..MBs for billions of keys at
    modest p) and each batch's membership probe is a broadcast of the
    serialized filter, not a shuffle against all history.
    """

    def __init__(self, spark, out_dir: str, text_col: str = "text",
                 order_col: str = "doc_id", n0: int = 1 << 16,
                 p: float = 1e-6):
        self.spark = spark
        self.out_dir = out_dir
        self.text_col = text_col
        self.order_col = order_col
        self.bloom = BloomScalable(n0=n0, p=p)
        self.state = self.bloom.zero()

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        cols = batch_df.columns
        rep = F.struct(F.col(self.order_col),
                       *[F.col(c) for c in cols if c != self.order_col])
        in_batch = (batch_df
                    .withColumn("_fp", content_digest(self.text_col))
                    .groupBy("_fp").agg(F.min(rep).alias("_rep"))
                    .select("_fp", *[F.col(f"_rep.{c}").alias(c)
                                     for c in cols]))
        # probe the accumulated filter executor-side via a broadcast of
        # the serialized state (tiny), keep only unseen digests
        blob = self.bloom.serialize(self.state)
        bc = self.spark.sparkContext.broadcast(blob)
        bloom = self.bloom

        @F.pandas_udf("boolean")
        def _seen(fps):
            import pandas as pd
            st = bloom.deserialize(bytes(bc.value))
            return pd.Series(bloom.exist(st, fps.tolist()))

        survivors = in_batch.filter(~_seen(F.col("_fp")))
        survivors.persist()
        try:
            survivors.select(*cols).write.mode("append") \
                .parquet(self.out_dir)
            # fold this batch's new digests into the filter (driver-side:
            # the digest list per batch is bounded by the batch size)
            new_fps = [r["_fp"] for r in survivors.select("_fp").collect()]
            if new_fps:
                self.bloom.update(self.state, new_fps)
        finally:
            survivors.unpersist()
            bc.unpersist()  # one broadcast per batch; don't accumulate
