"""Streaming sessionization — the custom stateful operator over
micro-batches, with the same durable-parquet state + replay-guard
architecture as StreamingSketch (streaming/microbatch.py).

Semantics match the batch operator (operators/sessions.sessionize)
exactly: a session breaks when the whole-second gap to the user's
previous event exceeds ``gap_s``; session ids are '<user>:<ordinal>'.
Each micro-batch:

1. folds the batch's events per user (applyInPandas over user groups —
   the designated Arrow path for custom stateful logic; groups are
   batch-sized),
2. stitches the user's first batch session onto the carried OPEN
   session when the boundary gap allows, else closes the carried one,
3. EMITS closed sessions (append-only ``closed/batch=<id>/`` parquet)
   and atomically replaces the open-session state.

Replay safety: the ``_batch_id`` marker commits with the state swap
(same protocol as StreamingSketch), and closed-session emission is
idempotent per batch id (``closed/batch=<id>`` is overwritten, never
appended twice).

Ordering contract: each user's events must arrive in event-time order
ACROSS batches (within a batch any order is fine — the fold sorts).
That is the standard contract of a watermarkless streaming
sessionizer: an event older than the user's carried ``last_ts`` would
have belonged to an already-emitted session.  File streams of
time-partitioned logs satisfy it by construction; otherwise buffer by
watermark upstream.

At scale: state is one row per user with an OPEN session — bounded by
active users, not events; each batch shuffles only that batch plus the
open-state join.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from gopie_spark.streaming.swap import recover, swap_in

_STATE_SCHEMA = ("user_id long, ordinal long, session_start timestamp, "
                 "last_ts timestamp, n_events long")
_OUT_SCHEMA = ("user_id long, kind string, ordinal long, "
               "session_start timestamp, session_end timestamp, "
               "n_events long")


def _sec(ts) -> int:
    return int(ts.value // 1_000_000_000)  # pandas ns -> whole seconds


class StreamingSessions:
    """Gap-timeout sessionization over a stream via foreachBatch."""

    def __init__(self, spark: SparkSession, state_dir: str,
                 user_col: str = "user_id", ts_col: str = "ts",
                 gap_s: int = 1800):
        self.spark = spark
        self.state_dir = state_dir
        self.user_col = user_col
        self.ts_col = ts_col
        self.gap_s = gap_s
        os.makedirs(state_dir, exist_ok=True)
        # heal a crash that landed between the swap's two renames
        recover(state_dir, "open")

    # -- state plumbing (StreamingSketch protocol) ---------------------------
    @property
    def _open(self) -> str:
        return os.path.join(self.state_dir, "open")

    def open_sessions(self) -> Optional[DataFrame]:
        if not os.path.exists(self._open):
            return None
        return self.spark.read.parquet(self._open)

    def closed_sessions(self) -> Optional[DataFrame]:
        root = os.path.join(self.state_dir, "closed")
        if not os.path.isdir(root) or not os.listdir(root):
            return None
        return self.spark.read.parquet(os.path.join(root, "batch=*"))

    def committed_batch_id(self) -> Optional[int]:
        marker = os.path.join(self._open, "_batch_id")
        if not os.path.exists(marker):
            return None
        with open(marker) as fh:
            return int(fh.read().strip())

    # -- the stateful fold ----------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        last = self.committed_batch_id()
        if last is not None and batch_id <= last:
            return
        gap = self.gap_s
        ucol, tcol = self.user_col, self.ts_col

        ev = batch_df.select(F.col(ucol).cast("long").alias("user_id"),
                             F.col(tcol).alias("ts")) \
            .withColumn("kind", F.lit("ev")) \
            .withColumn("ordinal", F.lit(None).cast("long")) \
            .withColumn("session_start", F.lit(None).cast("timestamp")) \
            .withColumn("n_events", F.lit(None).cast("long"))
        prev = self.open_sessions()
        if prev is not None:
            carry = prev.select(
                "user_id", F.col("last_ts").alias("ts"),
                F.lit("open").alias("kind"), "ordinal",
                "session_start", "n_events")
            ev = ev.unionByName(carry)

        def fold(pdf: pd.DataFrame) -> pd.DataFrame:
            out = []
            for uid, g in pdf.groupby("user_id", sort=False):
                carried = g[g["kind"] == "open"]
                events = g[g["kind"] == "ev"].sort_values("ts")
                if carried.empty:
                    ordinal, start, last_ts, n = -1, None, None, 0
                else:
                    c = carried.iloc[0]
                    ordinal = int(c["ordinal"])
                    start, last_ts = c["session_start"], c["ts"]
                    n = int(c["n_events"])
                for ts in events["ts"]:
                    if last_ts is None:
                        ordinal, start, last_ts, n = 0, ts, ts, 1
                    elif _sec(ts) - _sec(last_ts) > gap:
                        out.append((uid, "closed", ordinal, start,
                                    last_ts, n))
                        ordinal += 1
                        start, last_ts, n = ts, ts, 1
                    else:
                        last_ts = ts
                        n += 1
                if last_ts is not None:
                    out.append((uid, "open", ordinal, start, last_ts, n))
            return pd.DataFrame(out, columns=[
                "user_id", "kind", "ordinal", "session_start",
                "session_end", "n_events"])

        folded = ev.groupBy("user_id").applyInPandas(fold, _OUT_SCHEMA) \
            .localCheckpoint()

        closed = folded.filter(F.col("kind") == "closed").select(
            "user_id",
            F.concat_ws(":", F.col("user_id").cast("string"),
                        F.col("ordinal").cast("string"))
            .alias("session_id"),
            F.col("n_events"), "session_start",
            F.col("session_end"))
        closed.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, "closed", f"batch={batch_id}"))

        new_open = folded.filter(F.col("kind") == "open").select(
            "user_id", "ordinal", "session_start",
            F.col("session_end").alias("last_ts"), "n_events")
        tmp = os.path.join(self.state_dir, f"_tmp_batch_{batch_id}")
        new_open.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, "_batch_id"), "w") as fh:
            fh.write(str(batch_id))
        swap_in(self.state_dir, "open", tmp, batch_id)

    # -- views ---------------------------------------------------------------
    def sessions_view(self) -> Optional[DataFrame]:
        """Closed sessions ∪ the still-open ones (stamped the same way)
        — comparable row-for-row with batch session_stats over the same
        events."""
        parts = []
        closed = self.closed_sessions()
        if closed is not None:
            parts.append(closed)
        op = self.open_sessions()
        if op is not None:
            parts.append(op.select(
                "user_id",
                F.concat_ws(":", F.col("user_id").cast("string"),
                            F.col("ordinal").cast("string"))
                .alias("session_id"),
                "n_events", "session_start",
                F.col("last_ts").alias("session_end")))
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.withColumn(
            "duration_s",
            F.unix_timestamp("session_end") -
            F.unix_timestamp("session_start"))

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
