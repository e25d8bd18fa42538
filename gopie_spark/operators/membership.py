"""Sharded Bloom membership — the distributed-filter design for web scale.

A single Bloom filter for 10^12 keys at p=0.001 is ~1.7 TB of bits; it can
never live in one task or be merged through one reducer.  The scale design
shards the key space by hash: shard i holds an independently-sized filter
over its keys, built entirely inside shard i's task after one hash
shuffle.  Properties:

- build: one shuffle of the key column; each shard's filter is built
  vectorized and never leaves its task (no merge tail at all — the
  "merge" of the global structure is the union of disjoint shards);
- query: rows route to shards by the same hash; membership is evaluated
  per shard via a cogrouped applyInPandas — no broadcast of the filter;
- semantics: identical FPR per shard (each shard sized from its expected
  key share); zero false negatives, like the unsharded kernel;
- incremental: per-shard states are ordinary mergeable BloomBit states,
  so day-2 data merges shard-by-shard (bit-OR) with checkpoint lineage;
- deletable: pass ``filter_cls=kernels.CuckooFilter`` to build the same
  sharded structure over cuckoo states, then :func:`shards_subtract`
  applies distributed removals shard-locally (strict sub-multiset
  semantics from the kernel) — sharded membership with DELETE, no
  broadcast, no concentration.

The unsharded ``bloom_build``/``bloom_filter`` (sketch_agg.py) remains the
right tool when the filter fits a broadcast (<= ~100 MB).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import BooleanType, StructField, StructType

from gopie_spark.kernels.bloom import BloomBit

SHARD_COL = "bloom_shard"
STATE_COL = "sketch_state"


def _shard_expr(col: str, shards: int):
    # xxhash64 is Spark-native (stays in codegen); stable across runs
    return F.pmod(F.xxhash64(F.col(col).cast("string")), F.lit(shards)) \
        .alias(SHARD_COL)


def bloom_shards_build(df: DataFrame, value_col: str, n: int, p: float,
                       shards: int = 64,
                       filter_cls=BloomBit) -> DataFrame:
    """Build DataFrame[bloom_shard, sketch_state] over ``df[value_col]``.

    ``n`` is the expected total key count; each shard is sized for its
    share (n/shards) at the same per-shard FPR ``p``.

    ``filter_cls`` is any membership kernel with the uniform
    ``from_guess/zero/update/merge/serialize/deserialize/exist``
    lifecycle — BloomBit (default) for pure membership,
    ``kernels.CuckooFilter`` when the sharded structure must also
    support DELETE (:func:`shards_subtract`).

    Memory-bounded at any key volume: the input is hash-repartitioned so
    each task owns whole shards, then the two-level aggregation streams
    Arrow batches through the task — at no point does a shard's key set
    materialize at once (a plain ``groupBy(shard).applyInPandas`` would
    load 10^12/shards keys into one pandas frame and OOM).  A task holds
    only the ~1-2 shard states routed to its partition (the filter bits),
    never the keys; co-location means stage B merges ~one blob per shard.
    """
    per_shard = filter_cls.from_guess(max(n // shards, 64), p)
    from gopie_spark.operators.sketch_agg import (build_partials,
                                                  merge_partials)
    keyed = df.select(_shard_expr(value_col, shards),
                      F.col(value_col).cast("string").alias(value_col)) \
        .repartition(shards, SHARD_COL)
    partials = build_partials(keyed, [SHARD_COL], value_col, per_shard)
    return merge_partials(partials, [SHARD_COL], per_shard)


def bloom_shards_filter(spark: SparkSession, shard_states: DataFrame,
                        df: DataFrame, value_col: str,
                        n: Optional[int] = None,
                        p: Optional[float] = None,
                        shards: int = 64,
                        out_col: Optional[str] = None,
                        keep: bool = True,
                        filter_cls=BloomBit) -> DataFrame:
    """Membership-test ``df[value_col]`` against sharded filters via a
    cogrouped join — the filter never concentrates on one node.

    ``n``/``p`` re-derive the builder's per-shard geometry; pass
    ``n=None`` to decode each shard blob self-describingly instead
    (kernels.sketch_from_blob) — robust when the caller only has the
    states, not the sizing they were built with."""
    per_shard = None if n is None else \
        filter_cls.from_guess(max(n // shards, 64), p)
    probe = df.withColumn(SHARD_COL, _shard_expr(value_col, shards))
    out_schema = StructType(probe.schema.fields +
                            [StructField("_maybe_member", BooleanType(), False)])

    def test(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return left.assign(_maybe_member=pd.Series([], dtype=bool))
        if right.empty:
            return left.assign(_maybe_member=False)
        blob = bytes(right[STATE_COL].iloc[0])
        if per_shard is None:
            from gopie_spark.kernels import sketch_from_blob
            kern = sketch_from_blob(blob)
        else:
            kern = per_shard
        st = kern.deserialize(blob)
        vals = left[value_col].fillna("").astype(str)
        return left.assign(_maybe_member=kern.exist(st, vals))

    flagged = (probe.groupBy(SHARD_COL)
               .cogroup(shard_states.groupBy(SHARD_COL))
               .applyInPandas(test, out_schema))
    if out_col:
        return flagged.withColumnRenamed("_maybe_member", out_col) \
            .drop(SHARD_COL)
    cond = F.col("_maybe_member") if keep else ~F.col("_maybe_member")
    return flagged.filter(cond).drop("_maybe_member", SHARD_COL)


def shards_subtract(added: DataFrame, removed: DataFrame, n: int, p: float,
                    shards: int = 64, filter_cls=None) -> DataFrame:
    """Per-shard distributed DELETE: subtract the ``removed`` shard
    states from the ``added`` shard states (both built by
    :func:`bloom_shards_build` with the SAME n/p/shards/filter_cls).

    The deletable tier at web scale: with ``filter_cls=CuckooFilter``
    the global structure supports remove without any single node ever
    holding more than its shards' states — removals are themselves
    built distributed (one hash shuffle), and the subtraction is a
    shard-local kernel call on co-partitioned blobs.  Strictness is the
    kernel's: CuckooFilter.subtract RAISES unless the removals are a
    sub-multiset of the additions (per shard).

    Shards with no removals pass through unchanged; a removal shard
    with no matching addition shard is an error (nothing to subtract
    from)."""
    if filter_cls is None:
        from gopie_spark.kernels import CuckooFilter as filter_cls
    per_shard = filter_cls.from_guess(max(n // shards, 64), p)
    out_schema = StructType(added.schema.fields)

    def sub(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            if not right.empty:
                raise ValueError(
                    "shards_subtract: removal shard has no addition "
                    "shard to subtract from")
            return left
        if right.empty:
            return left
        a = per_shard.deserialize(bytes(left[STATE_COL].iloc[0]))
        b = per_shard.deserialize(bytes(right[STATE_COL].iloc[0]))
        out = per_shard.subtract(a, b)
        return left.assign(**{STATE_COL: [per_shard.serialize(out)]})

    return (added.groupBy(SHARD_COL)
            .cogroup(removed.groupBy(SHARD_COL))
            .applyInPandas(sub, out_schema))
