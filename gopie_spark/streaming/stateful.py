"""Custom stateful streaming sketches via applyInPandasWithState.

The foreachBatch path (microbatch.py) persists merged state to parquet;
this path keeps the sketch state INSIDE Spark's streaming state store
(RocksDB/HDFS-backed in production) — the engine analog of the
reference's per-subscription accumulating state (pkg/pubsub +
pkg/batch): each key's sketch lives as a binary blob in the state store,
updated per micro-batch with the vectorized kernel, and the operator
emits the running estimate per key every trigger (Update mode =
Latest-conflation, pkg/latest analog).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (BinaryType, LongType, StringType, StructField,
                               StructType)


def streaming_hll_estimates(stream_df: DataFrame, key_col: str,
                            value_col: str, p: int = 14,
                            output_mode: str = "update") -> DataFrame:
    """Per-key running HLL distinct estimates over a streaming DataFrame.

    Returns a streaming DataFrame[key, approx_distinct, n_batches] that
    re-emits a key's row whenever new data arrives for it (Update mode).
    State = the serialized HLL blob in the state store.
    """
    from gopie_spark.kernels import HLL
    hll = HLL(p=p)

    out_schema = StructType([
        StructField(key_col, StringType(), False),
        StructField("approx_distinct", LongType(), False),
        StructField("n_batches", LongType(), False),
    ])
    state_schema = StructType([
        StructField("blob", BinaryType(), True),
        StructField("n_batches", LongType(), True),
    ])

    def update_fn(key: Tuple[Any, ...],
                  pdfs: Iterator[pd.DataFrame],
                  state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            blob, n_batches = state.get
            st = hll.deserialize(bytes(blob))
        else:
            st, n_batches = hll.zero(), 0
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            if len(vals):
                st = hll.update(st, vals)
        n_batches += 1
        state.update((hll.serialize(st), n_batches))
        yield pd.DataFrame({key_col: [key[0]],
                            "approx_distinct": [hll.count(st)],
                            "n_batches": [n_batches]})

    return (stream_df.groupBy(key_col)
            .applyInPandasWithState(update_fn, out_schema, state_schema,
                                    output_mode,
                                    GroupStateTimeout.NoTimeout))


def streaming_heavy_hitters(stream_df: DataFrame, key_col: str,
                            value_col: str, k: int = 16, top_n: int = 5,
                            output_mode: str = "update") -> DataFrame:
    """Per-key running heavy-hitter values over a streaming DataFrame —
    the frequency twin of :func:`streaming_hll_estimates`.

    State = one serialized Misra-Gries summary (k counters — O(k)
    regardless of stream length) per key in the state store; every
    trigger that touches a key re-emits its current top-``top_n``
    values with their lower-bound counts (Update mode = Latest
    conflation of the running answer).  The MG guarantee carries over:
    any value with true frequency > n_key/k is guaranteed present, and
    each reported count is within ``err`` (also emitted) of the truth.
    """
    from gopie_spark.kernels import MisraGries
    mg = MisraGries(k=k)

    out_schema = StructType([
        StructField(key_col, StringType(), False),
        StructField("value", StringType(), False),
        StructField("est_count", LongType(), False),
        StructField("err", LongType(), False),
        StructField("rank", LongType(), False),
    ])
    state_schema = StructType([StructField("blob", BinaryType(), True)])

    def update_fn(key: Tuple[Any, ...],
                  pdfs: Iterator[pd.DataFrame],
                  state: GroupState) -> Iterator[pd.DataFrame]:
        st = mg.deserialize(bytes(state.get[0])) if state.exists \
            else mg.zero()
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            if len(vals):
                st = mg.update(st, vals.astype(str).tolist())
        state.update((mg.serialize(st),))
        err = int(mg.error_bound(st))
        top_keys, top_counts = mg.topk(st, top_n)
        n_out = len(top_keys)
        yield pd.DataFrame({
            key_col: [key[0]] * n_out,
            "value": [str(v) for v in top_keys],
            "est_count": [int(c) for c in top_counts],
            "err": [err] * n_out,
            "rank": list(range(1, n_out + 1)),
        })

    return (stream_df.groupBy(key_col)
            .applyInPandasWithState(update_fn, out_schema, state_schema,
                                    output_mode,
                                    GroupStateTimeout.NoTimeout))
