"""Persisted sketch cube: scan once, answer distinct/quantile/frequency
rollups forever by merge-only reads (the hypertable/OLAP-rollup
pattern, e.g. TimescaleDB continuous aggregates and the Druid/
DataSketches "sketch column" design — public literature; the reference
has no cube, this is the north-rule "windowed/rollup sketches"
production shape).

Why it matters at 10^12 docs: the raw table is ~100 TB and every
ad-hoc "distinct urls for lang X over date range Y" would rescan it.
A cube keyed on (lang, day) holds |langs| x |days| KB-sized mergeable
states — a few MB total — and ANY rollup over any dim subset or day
range is a merge over that tiny table.  Mergeability (associative,
order-free) is exactly what makes the precomputation lossless: for
register-max sketches (HLL) and min-k sketches (Theta) the rolled-up
state is BYTE-IDENTICAL to the state a direct scan at the coarser
grain would have built, so precision is not a function of grain.

Layout on disk:

    <path>/cells/            parquet of (dims..., sketch_state),
                             partitionBy(partition_dim) when given, so
                             day-range rollups statically prune files
    <path>/_cube_meta.json   dims, value_col, sketch kind + a hex
                             zero-state blob — the cube is
                             self-describing (kernels.sketch_from_blob)

Scale notes: the build is one two-level sketch_agg (partial per input
partition, merge per cell) — the same shuffle a plain groupBy-distinct
would need, except the reduced rows are constant-size states.  Rollups
shuffle only cube cells (thousands), never raw rows.  A skewed hot
cell salts exactly like any sketch_agg key (``salt=``).
"""
from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from gopie_spark.operators.sketch_agg import (STATE_COL, merge_partials,
                                              sketch_agg)

_META = "_cube_meta.json"
_CELLS = "cells"


def build_sketch_cube(df: DataFrame, dims: Sequence[str], value_col: str,
                      sketch, path: Optional[str] = None,
                      partition_dim: Optional[str] = None,
                      salt: int = 0) -> DataFrame:
    """Build (and optionally persist) the cube of per-``dims`` sketch
    states over ``value_col``.  Returns the cells DataFrame."""
    dims = list(dims)
    if partition_dim is not None and partition_dim not in dims:
        raise ValueError(f"partition_dim {partition_dim!r} not in dims")
    cells = sketch_agg(df.select(*dims, F.col(value_col).alias("v")),
                       dims, "v", sketch, salt=salt)
    if path is None:
        return cells
    w = cells.write.mode("overwrite")
    if partition_dim:
        w = w.partitionBy(partition_dim)
    w.parquet(os.path.join(path, _CELLS))
    meta = {
        "dims": dims,
        "value_col": value_col,
        "partition_dim": partition_dim,
        "zero_blob_hex": sketch.serialize(sketch.zero()).hex(),
    }
    tmp = os.path.join(path, _META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, _META))
    return cells


def load_sketch_cube(spark: SparkSession, path: str) \
        -> Tuple[DataFrame, object, List[str]]:
    """Reopen a persisted cube: (cells, kernel, dims).  The kernel is
    reconstructed from the self-describing zero-state blob — no
    out-of-band schema needed."""
    from gopie_spark.kernels import sketch_from_blob
    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    sketch = sketch_from_blob(bytes.fromhex(meta["zero_blob_hex"]))
    cells = spark.read.parquet(os.path.join(path, _CELLS))
    return cells, sketch, list(meta["dims"])


def register_cube_view(spark: SparkSession, path: str,
                       view_name: str) -> Tuple[object, List[str]]:
    """Expose a persisted cube to plain SQL: the cells relation becomes
    a temp view and the sketch SQL surface (incl. the
    ``gopie_sketch_merge`` grouped aggregate) is registered, so any
    dim-subset / cell-range rollup is one SQL statement::

        SELECT lang, gopie_hll_estimate(gopie_sketch_merge(sketch_state))
        FROM cube_v WHERE day >= '2026-01-01' GROUP BY lang

    A predicate on the cube's partition dim prunes files exactly as in
    :func:`rollup` (the view is the hive-partitioned parquet scan), and
    the GROUP BY shuffles only KB-sized cell blobs — never raw rows.
    Returns (kernel, dims) for callers that also want the operator path.
    """
    from gopie_spark.functions.sql import register_sql_functions
    cells, sketch, dims = load_sketch_cube(spark, path)
    register_sql_functions(spark)
    cells.createOrReplaceTempView(view_name)
    return sketch, dims


def rollup(cells: DataFrame, keep_dims: Sequence[str], sketch,
           where=None, salt: int = 0) -> DataFrame:
    """Merge cube cells up to ``keep_dims`` (any subset of the cube's
    dims, [] for a single global state).  ``where`` (a Column) filters
    cells BEFORE merging — a predicate on the cube's partition dim
    statically prunes files.  Precision is grain-independent: for
    register-max / min-k sketches the merged state is byte-identical
    to a direct build at this grain."""
    keep = list(keep_dims)
    missing = [d for d in keep if d not in cells.columns]
    if missing:
        raise ValueError(f"keep_dims not in cube: {missing}")
    if where is not None:
        cells = cells.filter(where)
    return merge_partials(cells.select(*keep, STATE_COL), keep, sketch,
                          salt=salt)


def merge_cubes(a: DataFrame, b: DataFrame, dims: Sequence[str],
                sketch, salt: int = 0) -> DataFrame:
    """Cell-wise merge of two cubes with the same dims/kernel — the
    incremental-build path: cube(day N's crawl) ⊎ cube(history) ==
    cube(all data), exactly, by merge associativity.  History is never
    rescanned; the shuffle carries only cube cells."""
    dims = list(dims)
    cols = dims + [STATE_COL]
    return merge_partials(a.select(*cols).unionByName(b.select(*cols)),
                          dims, sketch, salt=salt)


def local_rollup(path: str, keep_dims: Sequence[str], filters=None):
    """Serve a rollup from a persisted cube with ZERO Spark.

    The scale asymmetry the cube exists for: the corpus is ~100 TB but
    the cells table is |cells| KB-sized states — a few MB — so once the
    cube is built on the cluster, ANY dim-subset rollup is a laptop-size
    merge.  This is the serving twin of :func:`rollup` (same semantics,
    byte-identical states by merge order-independence): pyarrow reads
    the cells — ``filters`` in pyarrow DNF form prune hive-partitioned
    ``partition_dim`` directories before any IO — and the states merge
    in NumPy.  Returns ``(kernel, {keep_dims_tuple: merged_state})``
    (the key is ``()`` when ``keep_dims`` is empty).

    Complements operators/store.py's SketchStore: that serves the fixed
    build_sketches artifact set; this serves any persisted cube.
    """
    import pyarrow.parquet as pq
    from gopie_spark.kernels import sketch_from_blob

    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    kernel = sketch_from_blob(bytes.fromhex(meta["zero_blob_hex"]))
    keep = list(keep_dims)
    missing = [d for d in keep if d not in meta["dims"]]
    if missing:
        raise ValueError(f"keep_dims not in cube: {missing}")
    t = pq.read_table(os.path.join(path, _CELLS),
                      columns=keep + [STATE_COL], filters=filters)
    blobs = t.column(STATE_COL).to_pylist()
    if keep:
        keys = list(zip(*(t.column(d).to_pylist() for d in keep)))
    else:
        keys = [()] * len(blobs)
    out: dict = {}
    for k, b in zip(keys, blobs):
        st = kernel.deserialize(bytes(b))
        out[k] = st if k not in out else kernel.merge(out[k], st)
    return kernel, out


def rollup_estimates(cells: DataFrame, keep_dims: Sequence[str], sketch,
                     where=None, out_col: str = "estimate") -> DataFrame:
    """rollup + the kernel's scalar finalizer as a column (estimate()
    for HLL/Theta/AMS, count() fallback)."""
    from pyspark.sql.functions import pandas_udf

    merged = rollup(cells, keep_dims, sketch, where=where)
    final = getattr(sketch, "estimate", None) or sketch.count

    @pandas_udf("double")
    def fin(blobs: pd.Series) -> pd.Series:
        return blobs.map(
            lambda b: float(final(sketch.deserialize(bytes(b)))))

    return merged.withColumn(out_col, fin(F.col(STATE_COL)))
