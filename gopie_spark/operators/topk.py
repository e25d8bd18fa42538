"""Grouped top-k with map-side pruning — "top N items per key" without
sorting whole groups.

Spark's built-in answers are a per-group window sort (rank over
partitionBy(key) — shuffles and sorts EVERY row of every group) or
global TakeOrderedAndProject (top-k overall, no grouping).  The
scalable grouped form is the classic two-level reduction the reference
applies globally with quickselect (pkg/quickselect/quickselect.go —
select k without a full sort): keep only each partition's local top-k
per key (an Arrow-batched bounded fold — at most k rows per key per
partition survive), THEN rank the ≤ k x partitions survivors per key.
The final window sort runs on k x partitions rows per key instead of
the group's full row count — at 10^9-row groups and k=10 that is the
difference between sorting 10^9 rows and sorting a few thousand.

Determinism: ties on the order column break by ascending ``id_col``,
mirrored in the DuckDB oracle.
"""
from __future__ import annotations

from typing import List, Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def grouped_topk(df: DataFrame, keys: Sequence[str], order_col: str,
                 k: int, id_col: str, extra_cols: Sequence[str] = (),
                 out_rank: str = "rank") -> DataFrame:
    """Top ``k`` rows per ``keys`` by ``order_col`` DESC (ties: ``id_col``
    ASC).  Output: keys + id_col + order_col + extra_cols + rank."""
    keys = list(keys)
    cols = keys + [id_col, order_col] + list(extra_cols)
    src = df.select(*cols)
    pruned = src.mapInPandas(_prune_iter(keys, order_col, id_col, k),
                             src.schema)
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc(),
                                          F.col(id_col).asc())
    return (pruned.withColumn(out_rank, F.row_number().over(w))
            .filter(F.col(out_rank) <= k))


def _prune_iter(keys: List[str], order_col: str, id_col: str, k: int):
    """mapInPandas fn: fold the partition's batches keeping top-k per
    key — memory bounded by k x distinct-keys-in-partition."""

    def fn(batches):
        acc = None
        for pdf in batches:
            if pdf[order_col].isna().any():
                # Spark orders NULL (last under desc) and NaN (first)
                # differently; pandas conflates them, so a silent prune
                # here could disagree with the final window.  Filter or
                # coalesce upstream — refusing beats a wrong top-k.
                raise ValueError(
                    f"grouped_topk: null/NaN in order column "
                    f"{order_col!r}; filter or coalesce first")
            both = pdf if acc is None else pd.concat([acc, pdf],
                                                     ignore_index=True)
            # dropna=False keeps NULL-key groups (pandas would silently
            # drop them, diverging from the window's PARTITION BY)
            both = both.sort_values([order_col, id_col],
                                    ascending=[False, True],
                                    kind="mergesort")
            acc = both.groupby(keys, sort=False, dropna=False).head(k)
        if acc is not None and len(acc):
            yield acc

    return fn
