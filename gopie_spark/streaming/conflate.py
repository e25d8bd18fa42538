"""Latest-N conflation — keep only the newest N values per key.

Capability parity: the reference's ``latest`` package conflates a
channel to its newest value (``latest.New``) or newest N values
(``latest.NewN`` ring buffer, /root/reference/pkg/latest/latest.go:34-66)
so a slow receiver sees fresh data instead of a backlog.  On Spark the
same idea is a keyed top-N by an ordering column:

- :func:`latest_n` — batch operator.  NOT a window sort: a two-level
  salted capped aggregation (same shape as the dedup pair expansion)
  keeps per-buffer state bounded at ``n`` structs per (key, salt), so a
  hot key with 10^9 rows never materializes its group in one buffer or
  sorts it — partial-aggregable, map-side combinable.
- :class:`LatestNConflate` — streaming form via ``foreachBatch``:
  per micro-batch, conflate the batch and merge with the running state
  (union -> :func:`latest_n` again — the operation is associative), so
  the state parquet always holds exactly the newest N rows per key
  seen so far ("Update mode with a ring buffer per key").

Ordering is by ``order_col`` descending; ties break by the remaining
columns' values descending (struct comparison) — deterministic for a
given input set, which makes the operator oracle-checkable.
"""

from __future__ import annotations

import os
import shutil
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F


def latest_n(df: DataFrame, keys: Sequence[str], order_col: str,
             n: int, agg_salts: int = 16) -> DataFrame:
    """Newest ``n`` rows per key by ``order_col`` (descending), original
    column order preserved.

    Two-level capped aggregation (same shape as the dedup tier's
    ``_bucket_pairs``): level 1 groups by (keys, salt from the order
    value) and keeps each salt's newest ``n`` structs — a hot key's
    rows spread across ``agg_salts`` buffers, so any one aggregation
    buffer holds ~M/agg_salts of a key's M rows (its partition-local
    share of one salt), never the whole key, and is sliced to ``n``
    before the second shuffle; level 2 merges the <= ``agg_salts * n``
    survivors per key and re-caps.  Every global-top-``n`` row survives
    its own salt's level-1 cap, so the result is identical to the
    single-level window row_number plan (including its null-ordering:
    desc puts null order values last) while staying partial-aggregable
    (map-side ``partial_collect_list``, plan-tested) and avoiding the
    per-key full sort a window imposes.
    """
    if n < 1:
        raise ValueError("n must be positive")
    keys = list(keys)
    rest = [c for c in df.columns if c not in keys and c != order_col]
    item = F.struct(F.col(order_col), *[F.col(c) for c in rest])
    newest = lambda col: F.slice(F.reverse(F.array_sort(col)), 1, n)
    salt = F.pmod(F.xxhash64(F.col(order_col)), F.lit(agg_salts))
    lvl1 = (df.withColumn("_salt", salt)
            .groupBy(*keys, "_salt")
            .agg(newest(F.collect_list(item)).alias("_top")))
    lvl2 = lvl1.groupBy(*keys).agg(
        newest(F.flatten(F.collect_list("_top"))).alias("_top"))
    out = lvl2.select(*keys, F.explode("_top").alias("_it")) \
        .select(*keys, F.col(f"_it.{order_col}").alias(order_col),
                *[F.col(f"_it.{c}").alias(c) for c in rest])
    return out.select(*df.columns)


class LatestNConflate:
    """Streaming latest-N conflation via ``foreachBatch``: the state
    parquet under ``<state_dir>/current`` always holds the newest N
    rows per key across everything consumed so far.

    Each micro-batch is conflated first (so state merge cost is
    O(keys_in_batch * n), not batch size), unioned with the previous
    state, re-conflated, and atomically swapped in — the same
    current/ swap discipline as StreamingSketch, so readers never see
    a half-written state.
    """

    def __init__(self, spark: SparkSession, keys: Sequence[str],
                 order_col: str, n: int, state_dir: str):
        self.spark = spark
        self.keys = list(keys)
        self.order_col = order_col
        self.n = n
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    @property
    def _current(self) -> str:
        return os.path.join(self.state_dir, "current")

    def current(self) -> Optional[DataFrame]:
        if not os.path.exists(self._current):
            return None
        return self.spark.read.parquet(self._current)

    def committed_batch_id(self) -> Optional[int]:
        marker = os.path.join(self._current, "_batch_id")
        if not os.path.exists(marker):
            return None
        with open(marker) as fh:
            return int(fh.read().strip())

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # replay guard: a re-delivered batch would union its rows into
        # the state a second time and the newest-N would hold duplicate
        # rows — the batch id commits atomically with the state (marker
        # written into the tmp dir before the swap) and replays skip
        last = self.committed_batch_id()
        if last is not None and batch_id <= last:
            return
        conflated = latest_n(batch_df, self.keys, self.order_col, self.n)
        prev = self.current()
        if prev is not None:
            conflated = latest_n(conflated.unionByName(prev),
                                 self.keys, self.order_col, self.n)
        tmp = os.path.join(self.state_dir, f"_tmp_batch_{batch_id}")
        conflated.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, "_batch_id"), "w") as fh:
            fh.write(str(batch_id))
        bak = os.path.join(self.state_dir, f"_old_{batch_id}")
        if os.path.exists(self._current):
            os.rename(self._current, bak)
        os.rename(tmp, self._current)
        if os.path.exists(bak):
            shutil.rmtree(bak)

    def attach(self, stream_df: DataFrame,
               checkpoint_dir: Optional[str] = None,
               available_now: bool = True):
        writer = (stream_df.writeStream
                  .foreachBatch(self.process_batch)
                  .option("checkpointLocation",
                          checkpoint_dir or
                          os.path.join(self.state_dir, "_stream_ckpt")))
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def latest_snapshot(df: DataFrame, key_cols: Sequence[str] = ("url",),
                    ts_col: str = "warc_ts",
                    agg_salts: int = 16) -> DataFrame:
    """Recrawl conflation: newest snapshot per key (url) by ``ts_col``
    — the merge step when consecutive Common-Crawl dumps overlap.
    :func:`latest_n` with n=1, so it inherits the two-level salted
    capped aggregation (partial-aggregable, no per-key window sort over
    the corpus; a hot URL's snapshots never sit in one buffer)."""
    return latest_n(df, list(key_cols), ts_col, 1, agg_salts=agg_salts)
