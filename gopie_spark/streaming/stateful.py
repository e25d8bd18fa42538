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
