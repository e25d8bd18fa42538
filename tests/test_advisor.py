"""Sketch-driven plan advisor: ExactStats kernel properties, one-scan
profile anchors, advice rules (broadcast threshold, bounded-load salt,
shuffle width), persist/load parity, and the param-mismatch guard.

Gates mirror the kernels' own certificates: exact fields are EXACT
(count/bytes equal Spark aggregates), distinct is exact under theta k,
the AMS join-size estimate sits within its 4-sigma bound of the true
join cardinality, and the MG hot-key bracket ``est <= max <= est+err``
holds on planted skew.
"""
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from gopie_spark.kernels import ExactStats
from gopie_spark.plans.advisor import (agg_advice, build_join_profile,
                                       default_row_bytes, join_advice,
                                       load_join_profile,
                                       persist_join_profile)


# --------------------------------------------------------------------------
# ExactStats kernel
# --------------------------------------------------------------------------

def test_exactstats_kernel_counts_and_merge():
    import pyarrow as pa
    k = ExactStats()
    a = k.zero()
    k.update(a, pa.array([3, 4, 5], type=pa.int64()))
    k.update(a, np.array([10], dtype=np.int64))
    assert (k.count(a), k.total(a)) == (4, 22)
    # weighted (pre-aggregated) path
    b = k.zero()
    k.update(b, np.array([2, 7]), counts=np.array([3, 1]))
    assert (k.count(b), k.total(b)) == (4, 13)
    # merge is addition; blob roundtrip preserves both fields
    m = k.merge(k.deserialize(k.serialize(a)),
                k.deserialize(k.serialize(b)))
    assert (k.count(m), k.total(m)) == (8, 35)
    # self-describing blob reopens through the registry
    from gopie_spark.kernels import sketch_from_blob
    assert isinstance(sketch_from_blob(k.serialize(a)), ExactStats)


def test_exactstats_split_merge_byte_equal_serial():
    # the repo-wide merge gate, numeric edition: any split order ==
    # serial, byte-equal (both fields are plain sums)
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 1000, size=5000).astype(np.int64)
    k = ExactStats()
    serial = k.serialize(k.update(k.zero(), vals))
    for n_parts in (2, 3, 8, 32):
        states = [k.update(k.zero(), c)
                  for c in np.array_split(vals, n_parts)]
        merged = states[0]
        for s in states[1:]:
            merged = k.merge(merged, s)
        assert k.serialize(merged) == serial
    a, b, c = (k.update(k.zero(), ch) for ch in np.array_split(vals, 3))
    left = k.merge(k.merge(k.deserialize(k.serialize(a)),
                           k.deserialize(k.serialize(b))),
                   k.deserialize(k.serialize(c)))
    assert k.serialize(left) == serial


def test_exactstats_empty_batch_is_noop():
    k = ExactStats()
    st = k.zero()
    k.update(st, np.array([], dtype=np.int64))
    assert (k.count(st), k.total(st)) == (0, 0)


# --------------------------------------------------------------------------
# Profile build: exact anchors + one-scan co-build
# --------------------------------------------------------------------------

def _orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def _customer(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/customer.parquet")


def test_profile_exact_fields_match_spark_aggregates(spark, sf_dir):
    orders = _orders(spark, sf_dir)
    bexpr = (F.octet_length("o_orderstatus")
             + F.octet_length("o_orderpriority") + F.lit(32))
    prof = build_join_profile(orders, "o_custkey", bytes_expr=bexpr)
    row = orders.filter(F.col("o_custkey").isNotNull()) \
        .agg(F.count("*").alias("n"), F.sum(bexpr).alias("b")).collect()[0]
    assert prof.n_rows == row["n"]
    assert prof.total_bytes == row["b"]
    # distinct custkeys < theta k -> the estimate is EXACT
    exact_d = orders.select("o_custkey").distinct().count()
    assert prof.distinct_est == pytest.approx(exact_d)
    # MG bracket holds for the true hottest key
    exact_max = orders.groupBy("o_custkey").count() \
        .agg(F.max("count")).collect()[0][0]
    _, est, upper = prof.hot_key()
    assert est <= exact_max <= upper


def test_default_row_bytes_matches_manual_expr(spark):
    df = spark.createDataFrame(
        [(1, "ab", bytearray(b"xyz"), 2.0), (2, None, None, None)],
        "id long, s string, b binary, v double")
    got = df.select(default_row_bytes(df).alias("x")) \
        .orderBy("id").collect()
    # id(8) + len(s) + len(b) + v(8): nulls in s/b count 0, numeric
    # columns price 8 regardless of null (fixed-width storage)
    assert [r["x"] for r in got] == [8 + 2 + 3 + 8, 8 + 0 + 0 + 8]
    # projection pricing: only the named columns count
    got2 = df.select(default_row_bytes(df, ["s"]).alias("x")) \
        .orderBy("id").collect()
    assert [r["x"] for r in got2] == [2, 0]


def test_join_advice_bounds_and_broadcast_rule(spark, sf_dir):
    orders, cust = _orders(spark, sf_dir), _customer(spark, sf_dir)
    po = build_join_profile(orders, "o_custkey")
    pc = build_join_profile(cust, "c_custkey")
    adv = join_advice(po, pc)
    # the dim side is tiny -> broadcast_right, no salt, no shuffle
    assert adv["plan"]["strategy"] == "broadcast_right"
    assert adv["plan"]["build_side"] == "right"
    assert adv["plan"]["salt"] == 1
    # AMS join-size estimate within its own 4-sigma bound of the truth
    exact_join = orders.join(
        cust, orders.o_custkey == cust.c_custkey).count()
    est, bound = (adv["join"]["join_rows_est"],
                  adv["join"]["join_rows_bound"])
    assert abs(est - exact_join) <= bound
    # forcing the threshold to zero flips the plan to shuffle and the
    # partition count follows total bytes / target
    adv0 = join_advice(po, pc, broadcast_bytes=0,
                       target_partition_bytes=1 << 16)
    assert adv0["plan"]["strategy"] == "shuffle"
    want = math.ceil((po.total_bytes + pc.total_bytes) / float(1 << 16))
    assert adv0["plan"]["shuffle_partitions"] == want


def test_planted_skew_drives_salt(spark):
    # 60% of rows share one key; uniform tail.  On the shuffle path the
    # bounded-load rule must split the hot key; the uniform frame must
    # not be salted.
    n = 4000
    skewed = spark.range(n).select(
        F.when(F.col("id") % 10 < 6, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 97).cast("string")))
        .alias("k"),
        F.lit("x").alias("payload"))
    uniform = spark.range(n).select(
        (F.col("id") % 400).cast("string").alias("k"),
        F.lit("y").alias("payload"))
    ps = build_join_profile(skewed, "k")
    pu = build_join_profile(uniform, "k")
    adv = join_advice(ps, pu, broadcast_bytes=0)
    assert adv["left"]["salt"] > 1
    assert adv["right"]["salt"] == 1
    assert adv["plan"]["salt"] == adv["left"]["salt"]
    # the hot-key bracket really covers the planted count
    _, est, upper = ps.hot_key()
    assert est <= n * 6 // 10 <= upper


def test_advice_salt_dominates_exact_suggest_salt(spark):
    # the advisor's bounded-load salt uses the MG UPPER bound, so it can
    # only over-split relative to the exact-count rule (never under-salt
    # a hot key), and by no more than the MG error term
    from gopie_spark.operators.sketch_agg import suggest_salt
    n = 4000
    skewed = spark.range(n).select(
        F.when(F.col("id") % 10 < 6, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 97).cast("string")))
        .alias("k"))
    prof = build_join_profile(skewed, "k")
    adv_salt = join_advice(prof, prof, broadcast_bytes=0)["left"]["salt"]
    exact_salt = suggest_salt(skewed, ["k"], factor=1.25)
    assert adv_salt >= exact_salt
    _, _, upper = prof.hot_key()
    avg = prof.n_rows / prof.distinct_est
    assert adv_salt <= math.ceil(upper / (avg * 1.25))


def test_broadcast_advice_matches_physical_plan(spark, sf_dir):
    # following the advice produces the plan it names: the dim side fits
    # the threshold -> hinting it broadcasts (BroadcastHashJoin), and the
    # advised shuffle width is what a shuffle plan would need
    orders, cust = _orders(spark, sf_dir), _customer(spark, sf_dir)
    adv = join_advice(build_join_profile(orders, "o_custkey"),
                      build_join_profile(cust, "c_custkey"))
    assert adv["plan"]["strategy"] == "broadcast_right"
    joined = orders.join(F.broadcast(cust),
                         orders.o_custkey == cust.c_custkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_agg_advice_reduction_and_partitions(spark, sf_dir):
    orders = _orders(spark, sf_dir)
    prof = build_join_profile(orders, "o_custkey")
    adv = agg_advice(prof, target_rows_per_task=100)
    exact_d = orders.select("o_custkey").distinct().count()
    assert adv["combine_reduction"] == pytest.approx(
        prof.n_rows / exact_d)
    assert adv["post_agg_partitions"] == math.ceil(exact_d / 100)


def test_profile_persist_load_advice_identical(spark, sf_dir, tmp_path):
    orders, cust = _orders(spark, sf_dir), _customer(spark, sf_dir)
    po = build_join_profile(orders, "o_custkey")
    pc = build_join_profile(cust, "c_custkey")
    persist_join_profile(po, str(tmp_path / "o"))
    persist_join_profile(pc, str(tmp_path / "c"))
    lo, lc = (load_join_profile(str(tmp_path / "o")),
              load_join_profile(str(tmp_path / "c")))
    assert lo.key_col == "o_custkey"
    # advice is a pure function of the states: live == reloaded, field
    # by field (floats included — the blobs are byte-stable)
    assert join_advice(po, pc) == join_advice(lo, lc)
    assert agg_advice(po) == agg_advice(lo)


def test_param_mismatch_refused(spark, sf_dir):
    orders, cust = _orders(spark, sf_dir), _customer(spark, sf_dir)
    po = build_join_profile(orders, "o_custkey", ams_means=64)
    pc = build_join_profile(cust, "c_custkey", ams_means=256)
    with pytest.raises(ValueError, match="AMS params"):
        join_advice(po, pc)
    po2 = build_join_profile(orders, "o_custkey", theta_k=1024)
    pc2 = build_join_profile(cust, "c_custkey", theta_k=4096)
    with pytest.raises(ValueError, match="theta k"):
        join_advice(po2, pc2)


def test_exactstats_null_values_price_zero():
    import pyarrow as pa
    k = ExactStats()
    st = k.zero()
    k.update(st, pa.array([5, None, 7], type=pa.int64()))
    assert (k.count(st), k.total(st)) == (3, 12)


def test_default_row_bytes_nested_types(spark, sf_dir):
    # array<float> must price element-wise (embeddings-table shape);
    # nothing may silently price at 0 and flip a broadcast decision
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(5)
    got = emb.select(default_row_bytes(emb, ["embedding"]).alias("x")) \
        .collect()
    dims = emb.select(F.size("embedding").alias("d")).collect()
    assert [r["x"] for r in got] == [8 * r["d"] for r in dims]
    df = spark.createDataFrame(
        [(["ab", "cde"], {"k": 1}), (None, None)],
        "tags array<string>, m map<string,int>")
    got2 = df.select(default_row_bytes(df).alias("x")).collect()
    # strings price their bytes; the map prices its JSON length; null
    # complex values price ~0 (a null map still pays the "{}" JSON
    # scaffolding — overcounting is the safe direction for broadcast
    # gating)
    assert got2[0]["x"] >= 5
    assert got2[1]["x"] <= 4


def test_profile_null_payload_bytes_price_zero(spark):
    df = spark.createDataFrame(
        [("a", "xx"), ("b", None), ("c", "yyyy")], "k string, s string")
    prof = build_join_profile(df, "k",
                              bytes_expr=F.octet_length(F.col("s")))
    assert prof.n_rows == 3          # null payload is NOT a dropped row
    assert prof.total_bytes == 6     # 2 + 0 + 4


def test_null_keys_excluded(spark):
    df = spark.createDataFrame(
        [("a", 1), (None, 2), ("b", 3), (None, 4)], "k string, v long")
    prof = build_join_profile(df, "k")
    assert prof.n_rows == 2
    assert prof.distinct_est == pytest.approx(2.0)
