"""SQL-registered sketch functions — query sketch states from spark.sql.

The reference has no query language (SURVEY.md §2.6); the Spark-first
engine's natural SQL surface is: sketch *states* live in tables as binary
blobs (the ``sketch_state`` column every aggregation produces), and these
registered functions finalize/probe them from plain SQL:

    states.createOrReplaceTempView("lang_sketches")
    spark.sql("SELECT lang, gopie_hll_estimate(sketch_state) AS n "
              "FROM lang_sketches ORDER BY n DESC")

All functions are Arrow-batched pandas UDFs; each blob carries its own
parameters (p / d x w / m,k / delta / k) in the TLV header, so the kernel
is reconstructed per blob via ``from_blob`` — states of different sizes
can share a column.  Probe arguments (quantile, value) are ordinary
columns, not just literals.

Registered names (idempotent to re-register):

- ``gopie_hll_estimate(state) -> bigint``
- ``gopie_cms_estimate(state, value) -> bigint``
- ``gopie_cms_total(state) -> bigint``
- ``gopie_bloom_exist(state, value) -> boolean``   (bit variant)
- ``gopie_cuckoo_exist(state, value) -> boolean``
- ``gopie_sliding_hll_estimate(state, cutoff_epoch) -> bigint``
  (distinct over the suffix window [cutoff, now]; NULL cutoff = all)
- ``gopie_window_cms_estimate(state, value, window_ticks) -> bigint``
  (frequency over the trailing window; NULL window = whole horizon)
- ``gopie_tdigest_quantile(state, q) -> double``
- ``gopie_kll_quantile(state, q) -> double``
- ``gopie_ddsketch_quantile(state, q) -> double``
- ``gopie_tdigest_rank(state, value) -> double``   (CDF)
- ``gopie_kll_rank(state, value) -> double``       (CDF)
- ``gopie_mg_estimate(state, value) -> bigint``    (Misra–Gries lower bound)
- ``gopie_theta_estimate(state) -> bigint``        (KMV distinct)
- ``gopie_theta_union(a, b) -> double``            (|A ∪ B| estimate)
- ``gopie_theta_intersect(a, b) -> double``        (|A ∩ B| estimate)
- ``gopie_theta_jaccard(a, b) -> double``
- ``gopie_ams_join(a, b) -> double``            (equi-join size est.)

One AGGREGATE is registered alongside the scalar probes —

- ``gopie_sketch_merge(state) -> binary`` (grouped-agg pandas UDF):
  merge the group's state blobs into one blob, so ANY persisted
  partial-state relation (a sketch cube's cells, a store's per-lang
  rows, per-shard partials) rolls up in plain SQL::

      SELECT lang, gopie_hll_estimate(gopie_sketch_merge(state))
      FROM cells GROUP BY lang

  The blob is self-describing, so one function serves every kernel;
  mixed kinds inside a group are refused, geometry mismatches are
  refused by the kernel's own merge.  Scale note: inputs to this
  aggregate are O(cells) KB-sized blobs — the raw corpus never flows
  through it (the build side stays on the two-level
  ``operators/sketch_agg`` path); grouped-agg pandas UDFs run in
  complete mode, which is exactly right for a blob relation and wrong
  for raw rows.  Merge-order independence comes from each kernel's
  commutative/associative merge (gated in test_merge_associativity).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import SparkSession


def register_sql_functions(spark: SparkSession,
                           prefix: str = "gopie_") -> None:
    """Register the sketch SQL surface on this session."""
    from pyspark.sql.functions import pandas_udf
    from gopie_spark.kernels import (CMS, HLL, KLL, BloomBit, MisraGries,
                                     TDigest)

    def _hll_estimate(blobs):
        out = np.zeros(len(blobs), dtype=np.int64)
        for i, b in enumerate(blobs):
            if b is None:
                continue
            hll = HLL.from_blob(bytes(b))
            out[i] = int(hll.count(hll.deserialize(bytes(b))))
        return pd.Series(out)

    def _cms_estimate(blobs, values):
        out = np.zeros(len(blobs), dtype=np.int64)
        for i, (b, v) in enumerate(zip(blobs, values)):
            if b is None or v is None:
                continue
            cms = CMS.from_blob(bytes(b))
            out[i] = int(cms.estimate(cms.deserialize(bytes(b)),
                                      [str(v)])[0])
        return pd.Series(out)

    def _cms_total(blobs):
        out = np.zeros(len(blobs), dtype=np.int64)
        for i, b in enumerate(blobs):
            if b is None:
                continue
            cms = CMS.from_blob(bytes(b))
            out[i] = int(cms.count(cms.deserialize(bytes(b))))
        return pd.Series(out)

    def _bloom_exist(blobs, values):
        from gopie_spark.kernels import BloomCounting, BloomScalable
        from gopie_spark.kernels import codec
        out = np.zeros(len(blobs), dtype=bool)
        for i, (b, v) in enumerate(zip(blobs, values)):
            if b is None or v is None:
                continue
            b = bytes(b)
            kind, _ = codec.unpack(b)
            if kind == codec.KIND_BLOOM_BIT:
                bf = BloomBit.from_blob(b)
            elif kind == codec.KIND_BLOOM_COUNTING:
                bf = BloomCounting.from_blob(b)
            elif kind == codec.KIND_BLOOM_SCALABLE:
                bf = BloomScalable.from_blob(b)
            else:
                raise ValueError(f"not a bloom state (kind {kind})")
            out[i] = bool(bf.exist(bf.deserialize(b), [str(v)])[0])
        return pd.Series(out)

    def _cuckoo_exist(blobs, values):
        from gopie_spark.kernels import CuckooFilter
        out = np.zeros(len(blobs), dtype=bool)
        # one kicked placement per distinct blob, not per row: the
        # deserialized state (with its cached table) is memoized on the
        # blob bytes — a column of N probes against one filter places once
        memo = {}
        for i, (b, v) in enumerate(zip(blobs, values)):
            if b is None or v is None:
                continue
            b = bytes(b)
            got = memo.get(b)
            if got is None:
                cf = CuckooFilter.from_blob(b)
                got = memo[b] = (cf, cf.deserialize(b))
            cf, st = got
            out[i] = bool(cf.exist(st, [str(v)])[0])
        return pd.Series(out)

    def _sliding_hll_estimate(blobs, cutoffs):
        from gopie_spark.kernels import SlidingHLL
        out = np.zeros(len(blobs), dtype=np.int64)
        for i, (b, c) in enumerate(zip(blobs, cutoffs)):
            if b is None:
                continue
            sh = SlidingHLL.from_blob(bytes(b))
            st = sh.deserialize(bytes(b))
            cut = None if c is None or (isinstance(c, float)
                                        and np.isnan(c)) else float(c)
            out[i] = int(sh.count(st, cut))
        return pd.Series(out)

    def _window_cms_estimate(blobs, vals, windows):
        from gopie_spark.kernels import WindowCMS
        out = np.zeros(len(blobs), dtype=np.int64)
        for i, (b, v, w) in enumerate(zip(blobs, vals, windows)):
            if b is None or v is None:
                continue
            wc = WindowCMS.from_blob(bytes(b))
            st = wc.deserialize(bytes(b))
            win = None if w is None or (isinstance(w, float)
                                        and np.isnan(w)) else int(w)
            out[i] = int(wc.estimate(st, [str(v)],
                                     window_ticks=win)[0])
        return pd.Series(out)

    def _tdigest_quantile(blobs, qs):
        out = np.full(len(blobs), np.nan)
        for i, (b, q) in enumerate(zip(blobs, qs)):
            if b is None or q is None:
                continue
            td = TDigest.from_blob(bytes(b))
            out[i] = float(td.quantile(td.deserialize(bytes(b)),
                                       [float(q)])[0])
        return pd.Series(out)

    def _tdigest_rank(blobs, vs):
        out = np.full(len(blobs), np.nan)
        for i, (b, v) in enumerate(zip(blobs, vs)):
            if b is None or v is None:
                continue
            td = TDigest.from_blob(bytes(b))
            out[i] = float(td.rank(td.deserialize(bytes(b)),
                                   [float(v)])[0])
        return pd.Series(out)

    def _kll_rank(blobs, vs):
        out = np.full(len(blobs), np.nan)
        for i, (b, v) in enumerate(zip(blobs, vs)):
            if b is None or v is None:
                continue
            kll = KLL.from_blob(bytes(b))
            out[i] = float(kll.rank(kll.deserialize(bytes(b)),
                                    [float(v)])[0])
        return pd.Series(out)

    def _kll_quantile(blobs, qs):
        out = np.full(len(blobs), np.nan)
        for i, (b, q) in enumerate(zip(blobs, qs)):
            if b is None or q is None:
                continue
            kll = KLL.from_blob(bytes(b))
            out[i] = float(kll.quantile(kll.deserialize(bytes(b)),
                                        [float(q)])[0])
        return pd.Series(out)

    def _ddsketch_quantile(blobs, qs):
        from gopie_spark.kernels import DDSketch
        out = np.full(len(blobs), np.nan)
        for i, (b, q) in enumerate(zip(blobs, qs)):
            if b is None or q is None:
                continue
            dd = DDSketch.from_blob(bytes(b))
            out[i] = float(dd.quantile(dd.deserialize(bytes(b)),
                                       [float(q)])[0])
        return pd.Series(out)

    def _mg_estimate(blobs, values):
        out = np.zeros(len(blobs), dtype=np.int64)
        for i, (b, v) in enumerate(zip(blobs, values)):
            if b is None or v is None:
                continue
            mg = MisraGries.from_blob(bytes(b))
            out[i] = int(mg.estimate(mg.deserialize(bytes(b)),
                                     [str(v)])[0])
        return pd.Series(out)


    def _theta_estimate(blobs):
        from gopie_spark.kernels import Theta
        out = np.zeros(len(blobs), dtype=np.int64)
        for i, b in enumerate(blobs):
            if b is None:
                continue
            th = Theta.from_blob(bytes(b))
            out[i] = int(round(th.estimate(th.deserialize(bytes(b)))))
        return pd.Series(out)

    def _theta_pairwise(op):
        from gopie_spark.kernels import Theta

        def fn(a_blobs, b_blobs):
            # NULL input -> NULL output (0.0 is a legitimate estimate
            # for disjoint sets, so a missing sketch must stay distinct)
            out = np.full(len(a_blobs), np.nan, dtype=np.float64)
            for i, (a, b) in enumerate(zip(a_blobs, b_blobs)):
                if a is None or b is None:
                    continue
                th = Theta.from_blob(bytes(a))
                sa = th.deserialize(bytes(a))
                sb = th.deserialize(bytes(b))
                out[i] = float(getattr(th, op)(sa, sb))
            return pd.Series(out)

        return fn

    def _ams_join(a_blobs, b_blobs):
        from gopie_spark.kernels import AMS
        out = np.full(len(a_blobs), np.nan, dtype=np.float64)
        for i, (a, b) in enumerate(zip(a_blobs, b_blobs)):
            if a is None or b is None:
                continue
            ams = AMS.from_blob(bytes(a))
            out[i] = ams.inner_product(ams.deserialize(bytes(a)),
                                       ams.deserialize(bytes(b)))
        return pd.Series(out)

    def _ams_f2(blobs):
        from gopie_spark.kernels import AMS
        out = np.zeros(len(blobs), dtype=np.float64)
        for i, b in enumerate(blobs):
            if b is None:
                continue
            ams = AMS.from_blob(bytes(b))
            out[i] = ams.estimate(ams.deserialize(bytes(b)))
        return pd.Series(out)

    def _countsketch_estimate(blobs, values):
        from gopie_spark.kernels import CountSketch
        out = np.full(len(blobs), np.nan, dtype=np.float64)
        for i, (b, v) in enumerate(zip(blobs, values)):
            if b is None or v is None:
                continue
            cs = CountSketch.from_blob(bytes(b))
            out[i] = float(cs.estimate(cs.deserialize(bytes(b)),
                                       [str(v)])[0])
        return pd.Series(out)

    def _countsketch_f2(blobs):
        from gopie_spark.kernels import CountSketch
        out = np.full(len(blobs), np.nan, dtype=np.float64)
        for i, b in enumerate(blobs):
            if b is None:
                continue
            cs = CountSketch.from_blob(bytes(b))
            out[i] = cs.f2_estimate(cs.deserialize(bytes(b)))
        return pd.Series(out)

    def _wmh_jaccard(a_blobs, b_blobs):
        from gopie_spark.kernels import WeightedMinHash
        out = np.full(len(a_blobs), np.nan, dtype=np.float64)
        for i, (a, b) in enumerate(zip(a_blobs, b_blobs)):
            if a is None or b is None:
                continue
            wmh = WeightedMinHash.from_blob(bytes(a))
            sa = wmh.deserialize(bytes(a))
            sb = wmh.deserialize(bytes(b))
            out[i] = wmh.estimate((sa["feat"], sa["t"]),
                                  (sb["feat"], sb["t"]))
        return pd.Series(out)

    def _sketch_merge(blobs: pd.Series) -> bytes:
        from gopie_spark.kernels import codec, sketch_from_blob
        kernel = None
        acc = None
        acc_kind = None
        for b in blobs:
            if b is None:
                continue
            b = bytes(b)
            kind, _ = codec.unpack(b)
            if acc is None:
                kernel = sketch_from_blob(b)
                acc = kernel.deserialize(b)
                acc_kind = kind
            else:
                if kind != acc_kind:
                    raise ValueError(
                        f"gopie_sketch_merge: mixed sketch kinds in one "
                        f"group ({acc_kind} vs {kind})")
                acc = kernel.merge(acc, kernel.deserialize(b))
        if acc is None:
            return None
        return bytes(kernel.serialize(acc))

    spark.udf.register(f"{prefix}sketch_merge",
                       pandas_udf(_sketch_merge, "binary"))
    spark.udf.register(f"{prefix}mg_estimate",
                       pandas_udf(_mg_estimate, "long"))
    spark.udf.register(f"{prefix}hll_estimate",
                       pandas_udf(_hll_estimate, "long"))
    spark.udf.register(f"{prefix}cms_estimate",
                       pandas_udf(_cms_estimate, "long"))
    spark.udf.register(f"{prefix}cms_total",
                       pandas_udf(_cms_total, "long"))
    spark.udf.register(f"{prefix}bloom_exist",
                       pandas_udf(_bloom_exist, "boolean"))
    spark.udf.register(f"{prefix}cuckoo_exist",
                       pandas_udf(_cuckoo_exist, "boolean"))
    spark.udf.register(f"{prefix}sliding_hll_estimate",
                       pandas_udf(_sliding_hll_estimate, "long"))
    spark.udf.register(f"{prefix}window_cms_estimate",
                       pandas_udf(_window_cms_estimate, "long"))
    spark.udf.register(f"{prefix}ams_f2",
                       pandas_udf(_ams_f2, "double"))
    spark.udf.register(f"{prefix}ams_join",
                       pandas_udf(_ams_join, "double"))
    spark.udf.register(f"{prefix}theta_estimate",
                       pandas_udf(_theta_estimate, "long"))
    spark.udf.register(f"{prefix}theta_union",
                       pandas_udf(_theta_pairwise("union_estimate"),
                                  "double"))
    spark.udf.register(f"{prefix}theta_intersect",
                       pandas_udf(_theta_pairwise("intersect_estimate"),
                                  "double"))
    spark.udf.register(f"{prefix}theta_jaccard",
                       pandas_udf(_theta_pairwise("jaccard_estimate"),
                                  "double"))
    spark.udf.register(f"{prefix}tdigest_quantile",
                       pandas_udf(_tdigest_quantile, "double"))
    spark.udf.register(f"{prefix}kll_quantile",
                       pandas_udf(_kll_quantile, "double"))
    spark.udf.register(f"{prefix}tdigest_rank",
                       pandas_udf(_tdigest_rank, "double"))
    spark.udf.register(f"{prefix}kll_rank",
                       pandas_udf(_kll_rank, "double"))
    spark.udf.register(f"{prefix}ddsketch_quantile",
                       pandas_udf(_ddsketch_quantile, "double"))
    spark.udf.register(f"{prefix}countsketch_estimate",
                       pandas_udf(_countsketch_estimate, "double"))
    spark.udf.register(f"{prefix}countsketch_f2",
                       pandas_udf(_countsketch_f2, "double"))
    spark.udf.register(f"{prefix}wmh_jaccard",
                       pandas_udf(_wmh_jaccard, "double"))
