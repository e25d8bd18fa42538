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
- :class:`CuckooWindowedStreamingDedup` — bounded-state AND bounded
  memory of the past: dedup against a sliding window of the last W
  micro-batches, with exact state expiry via the cuckoo filter's
  strict subtract (a Bloom filter cannot unset bits, so its streams
  must remember forever or rebuild).

Within a micro-batch, duplicates are removed exactly (digest groupBy)
before the filter is consulted, so results do not depend on row order
inside a batch.
"""

from __future__ import annotations

import os
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


def sharded_bloom_streaming_dedup(stream_df: DataFrame,
                                  text_col: str = "text",
                                  order_col: str = "doc_id",
                                  n_shards: int = 64,
                                  n0: int = 1 << 12,
                                  p: float = 1e-6) -> DataFrame:
    """Bounded-state streaming dedup with the Bloom filter SHARDED
    across Spark's streaming state store — the fully executor-resident
    sibling of :class:`BloomStreamingDedup` (which holds one global
    filter on the driver).

    Each digest routes to ``pmod(xxhash64(digest), n_shards)``; the
    shard's scalable-Bloom blob lives as that group's state-store entry
    (RocksDB/HDFS-backed in production), so filter memory spreads over
    executors, per-trigger state I/O is only the touched shards, and
    restart recovery comes from Spark's own checkpoint — no driver
    state, no custom state_dir, no replay bookkeeping (the state store
    commits per batch).  Dedup decisions are per digest, so sharding
    never changes the outcome.  Size ``n_shards`` >= executor-core
    count for parallelism; each shard grows from ``n0`` capacity.

    Returns an Append-mode streaming DataFrame with the input columns:
    the FIRST occurrence (min ``order_col`` within its arrival batch,
    earliest batch across triggers) of each digest, later duplicates
    dropped — with false-positive rate <= ``p`` of uniques wrongly
    dropped, never the reverse.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)
    from pyspark.sql.types import BinaryType, StructField, StructType

    bloom = BloomScalable(n0=n0, p=p)
    cols = stream_df.columns
    out_schema = stream_df.schema
    state_schema = StructType([StructField("blob", BinaryType(), True)])
    order_first = [order_col] + [c for c in cols if c != order_col]

    def update_fn(key, pdfs, state: GroupState):
        st = bloom.deserialize(bytes(state.get[0])) if state.exists \
            else bloom.zero()
        batch = pd.concat(list(pdfs), ignore_index=True)
        # in-batch exact dedup: deterministic first = min (order, rest)
        batch = batch.sort_values(order_first, kind="mergesort") \
            .drop_duplicates("_fp", keep="first")
        unseen = ~bloom.exist(st, batch["_fp"].tolist())
        survivors = batch[unseen]
        if len(survivors):
            bloom.update(st, survivors["_fp"].tolist())
            state.update((bloom.serialize(st),))
        elif not state.exists:
            state.update((bloom.serialize(st),))
        yield survivors[cols]

    routed = (stream_df
              .withColumn("_fp", content_digest(text_col))
              .withColumn("_shard",
                          F.pmod(F.xxhash64(F.col("_fp")),
                                 F.lit(n_shards))))
    return (routed.groupBy("_shard")
            .applyInPandasWithState(update_fn, out_schema, state_schema,
                                    "append",
                                    GroupStateTimeout.NoTimeout))


class BloomStreamingDedup:
    """Bounded-state streaming dedup: accumulate digests in a scalable
    Bloom filter across micro-batches; first occurrence (by the min of
    ``order_col``) of each digest survives, later ones are dropped.

    Use via ``stream.writeStream.foreachBatch(d.process_batch)`` — each
    batch's survivors land in ``<out_dir>/batch_id=<N>/`` (parquet;
    ``spark.read.parquet(out_dir)`` sees them all, plus a ``batch_id``
    partition column).  The filter lives on the driver (KBs..MBs for
    billions of keys at modest p); each batch's membership probe is a
    broadcast of the serialized filter, not a shuffle against history.

    Scale + fault tolerance contracts:

    - **Executor-side state fold**: the batch's new digests are folded
      into a scalable-Bloom state via the distributed ``global_sketch``
      partial-merge (per-partition partials, associative level-OR
      merge); the driver receives ONE serialized filter blob — O(bits)
      — and merges it into its state.  Never an O(survivors) collect,
      so a 10^7-row micro-batch costs the driver the same bytes as a
      10^3-row one.
    - **Idempotent replay**: Structured Streaming re-invokes
      ``foreachBatch`` with the same ``batch_id`` after a failure.
      Output is an overwrite of the batch-id-keyed subdir (replay
      rewrites, never duplicates), and with ``state_dir`` set the
      filter is rewound to the newest persisted state with id <
      ``batch_id`` before reprocessing, so the replay sees exactly the
      pre-batch filter.  Without ``state_dir``, a replay of an
      already-folded batch is skipped (its output dir is already
      written; the in-memory filter cannot rewind).
    - **Restart resume**: with ``state_dir``, the newest persisted
      filter is loaded at construction, so a restarted stream drops
      documents already seen before the restart.  Blobs are written
      atomically (tmp + rename) per committed batch; point it at
      driver-local or shared storage as the deployment requires.
    """

    def __init__(self, spark, out_dir: str, text_col: str = "text",
                 order_col: str = "doc_id", n0: int = 1 << 16,
                 p: float = 1e-6, state_dir: Optional[str] = None):
        self.spark = spark
        self.out_dir = out_dir
        self.text_col = text_col
        self.order_col = order_col
        self.bloom = BloomScalable(n0=n0, p=p)
        self.state_dir = state_dir
        self.state = self.bloom.zero()
        self._state_bid: Optional[int] = None
        if state_dir is not None:
            os.makedirs(state_dir, exist_ok=True)
            self._load_newest_state(before=None)

    # -- persisted filter state ------------------------------------------

    def _blob_path(self, bid: int) -> str:
        return os.path.join(self.state_dir, f"state_{bid:09d}.blob")

    def _saved_bids(self):
        import re
        out = []
        for name in os.listdir(self.state_dir):
            m = re.fullmatch(r"state_(\d+)\.blob", name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _load_newest_state(self, before: Optional[int]) -> None:
        """Restore the newest persisted filter (optionally restricted to
        batch ids < ``before``); zero state if none qualifies."""
        bids = [b for b in self._saved_bids()
                if before is None or b < before]
        if not bids:
            self.state = self.bloom.zero()
            self._state_bid = None
            return
        with open(self._blob_path(bids[-1]), "rb") as fh:
            self.state = self.bloom.deserialize(fh.read())
        self._state_bid = bids[-1]

    def _save_state(self, bid: int) -> None:
        tmp = self._blob_path(bid) + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(self.bloom.serialize(self.state))
        os.replace(tmp, self._blob_path(bid))

    # -- the foreachBatch hook -------------------------------------------

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from gopie_spark.operators.sketch_agg import global_sketch

        if self._state_bid is not None and batch_id <= self._state_bid:
            if self.state_dir is None:
                # already folded, cannot rewind in-memory state: the
                # keyed output dir from the earlier attempt stands
                return
            self._load_newest_state(before=batch_id)
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
            survivors.select(*cols).write.mode("overwrite") \
                .parquet(f"{self.out_dir}/batch_id={batch_id}")
            # fold the batch's new digests executor-side: distributed
            # partial filters, one merged blob back to the driver
            batch_state = global_sketch(survivors.select("_fp"), "_fp",
                                        self.bloom)
            self.state = self.bloom.merge(self.state, batch_state)
            self._state_bid = batch_id
            if self.state_dir is not None:
                self._save_state(batch_id)
        finally:
            survivors.unpersist()
            bc.unpersist()  # one broadcast per batch; don't accumulate


class CuckooWindowedStreamingDedup:
    """Bounded-state streaming dedup over a SLIDING WINDOW of the last
    ``window`` micro-batches, with EXACT state expiry — the semantic a
    Bloom filter cannot support (bits cannot be unset; a scalable-Bloom
    stream must either remember forever or rebuild).  The cuckoo
    filter's strict sub-multiset ``subtract`` (kernels/cuckoo.py) makes
    expiry a kernel call:

        rolling <- subtract(rolling, state[b - window - 1])   # expire
        rolling <- merge(rolling, state[b])                   # admit

    so a document is dropped iff a copy of it was EMITTED within the
    last ``window`` batches (suppressed duplicates do not refresh the
    clock — TTL-cache-without-refresh semantics), and a duplicate
    arriving after that copy expires is re-emitted — count-based
    dropDuplicatesWithinWatermark semantics at O(window-keys x ~6 B)
    driver state, any stream length.

    Same scale/fault contracts as :class:`BloomStreamingDedup`: the
    batch's digests fold executor-side (``global_sketch`` partials, one
    blob to the driver), probes ride a broadcast of the rolling state,
    output is overwrite-by-batch-id, and with ``state_dir`` both the
    rolling state and the per-batch entry states persist atomically so
    replay rewinds exactly and restarts resume mid-window.  False
    positives (<= p within the window) drop uniques, never the reverse;
    false negatives do not exist.

    ``n_window`` sizes the filter for the expected DISTINCT digests per
    window; exceeding ~0.95 occupancy raises (resize, don't guess).
    """

    def __init__(self, spark, out_dir: str, window: int,
                 text_col: str = "text", order_col: str = "doc_id",
                 n_window: int = 1 << 16, p: float = 1e-6,
                 state_dir: Optional[str] = None):
        from gopie_spark.kernels import CuckooFilter
        if window < 1:
            raise ValueError("window must be >= 1 batch")
        self.spark = spark
        self.out_dir = out_dir
        self.window = window
        self.text_col = text_col
        self.order_col = order_col
        self.cf = CuckooFilter.from_guess(max(n_window, 64), p)
        self.state_dir = state_dir
        self.rolling = self.cf.zero()
        self._batch_states: dict = {}     # bid -> serialized entry state
        self._state_bid: Optional[int] = None
        if state_dir is not None:
            os.makedirs(state_dir, exist_ok=True)
            self._load_newest(before=None)

    # -- persisted state ---------------------------------------------------

    def _path(self, kind: str, bid: int) -> str:
        return os.path.join(self.state_dir, f"{kind}_{bid:09d}.blob")

    def _saved(self, kind: str):
        import re
        out = []
        for name in os.listdir(self.state_dir):
            m = re.fullmatch(rf"{kind}_(\d+)\.blob", name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _write(self, kind: str, bid: int, blob: bytes) -> None:
        tmp = self._path(kind, bid) + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, self._path(kind, bid))

    def _load_newest(self, before: Optional[int]) -> None:
        bids = [b for b in self._saved("rolling")
                if before is None or b < before]
        if not bids:
            self.rolling = self.cf.zero()
            self._state_bid = None
            return
        bid = bids[-1]
        with open(self._path("rolling", bid), "rb") as fh:
            self.rolling = self.cf.deserialize(fh.read())
        self._state_bid = bid

    def _batch_state(self, bid: int):
        blob = self._batch_states.get(bid)
        if blob is None and self.state_dir is not None:
            path = self._path("batch", bid)
            if os.path.exists(path):
                with open(path, "rb") as fh:
                    blob = fh.read()
        if blob is None:
            return None
        return self.cf.deserialize(blob)

    # -- the foreachBatch hook ----------------------------------------------

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from gopie_spark.operators.sketch_agg import global_sketch

        if self._state_bid is not None and batch_id <= self._state_bid:
            if self.state_dir is None:
                return                      # cannot rewind in-memory
            self._load_newest(before=batch_id)
        # expire the batch leaving the suppression horizon: the probe of
        # batch b must see exactly the `window` PRECEDING batches
        # [b-window, b-1], so the state leaving is b - window - 1 (exact
        # subtract of the recorded sub-multiset; no-op early on)
        old = self._batch_state(batch_id - self.window - 1)
        if old is not None:
            self.rolling = self.cf.subtract(self.rolling, old)

        cols = batch_df.columns
        rep = F.struct(F.col(self.order_col),
                       *[F.col(c) for c in cols if c != self.order_col])
        in_batch = (batch_df
                    .withColumn("_fp", content_digest(self.text_col))
                    .groupBy("_fp").agg(F.min(rep).alias("_rep"))
                    .select("_fp", *[F.col(f"_rep.{c}").alias(c)
                                     for c in cols]))
        blob = self.cf.serialize(self.rolling)
        bc = self.spark.sparkContext.broadcast(blob)
        cf = self.cf

        @F.pandas_udf("boolean")
        def _seen(fps):
            import pandas as pd
            st = cf.deserialize(bytes(bc.value))
            return pd.Series(cf.exist(st, fps.tolist()))

        survivors = in_batch.filter(~_seen(F.col("_fp")))
        survivors.persist()
        try:
            survivors.select(*cols).write.mode("overwrite") \
                .parquet(f"{self.out_dir}/batch_id={batch_id}")
            batch_state = global_sketch(survivors.select("_fp"), "_fp",
                                        self.cf)
            bblob = self.cf.serialize(batch_state)
            self._batch_states[batch_id] = bblob
            self._batch_states.pop(batch_id - self.window - 1, None)
            self.rolling = self.cf.merge(self.rolling, batch_state)
            self._state_bid = batch_id
            if self.state_dir is not None:
                self._write("batch", batch_id, bblob)
                self._write("rolling", batch_id,
                            self.cf.serialize(self.rolling))
        finally:
            survivors.unpersist()
            bc.unpersist()
