"""Spark two-level sketch aggregation: distributed path == serial kernel path.

The strongest possible check: the final merged state produced by the
mapInPandas/applyInPandas pipeline must be BYTE-EQUAL to a serial
single-threaded kernel build over the same rows (merge associativity makes
partitioning invisible), and estimates must clear the published bounds
against exact Spark aggregates.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gopie_spark.kernels import CMS, HLL, KLL, BloomBit, TDigest
from gopie_spark.operators import (bloom_build, bloom_filter, cms_build,
                                   cms_estimate_map, global_sketch,
                                   hll_count_distinct, kll_quantiles,
                                   sketch_agg, tdigest_quantiles)
from gopie_spark.operators.sketch_agg import STATE_COL


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_global_hll_state_byte_equal_serial(spark, docs):
    hll = HLL(p=12)
    ids = [r[0] for r in docs.select(F.col("doc_id").cast("string")).collect()]
    serial = hll.zero()
    hll.update(serial, ids)

    df = docs.select(F.col("doc_id").cast("string").alias("v")).repartition(8)
    dist = global_sketch(df, "v", hll)
    assert hll.serialize(dist) == hll.serialize(serial)


def test_grouped_hll_states_byte_equal_serial(spark, docs):
    hll = HLL(p=12)
    df = docs.select("lang", F.col("doc_id").cast("string").alias("v")) \
             .repartition(8)
    got = {r["lang"]: bytes(r[STATE_COL])
           for r in sketch_agg(df, ["lang"], "v", hll).collect()}

    rows = docs.select("lang", F.col("doc_id").cast("string")).collect()
    by_lang = {}
    for lang, v in rows:
        by_lang.setdefault(lang, []).append(v)
    for lang, vals in by_lang.items():
        st = hll.zero()
        hll.update(st, vals)
        assert got[lang] == hll.serialize(st), f"lang={lang}"


def test_salted_merge_equals_unsalted(spark, docs):
    hll = HLL(p=12)
    df = docs.select("lang", F.col("doc_id").cast("string").alias("v")) \
             .repartition(16)
    plain = {r["lang"]: bytes(r[STATE_COL])
             for r in sketch_agg(df, ["lang"], "v", hll, salt=0).collect()}
    salted = {r["lang"]: bytes(r[STATE_COL])
              for r in sketch_agg(df, ["lang"], "v", hll, salt=4).collect()}
    assert plain == salted


def test_suggest_salt_detects_zipf_skew(spark, docs):
    """Bounded-load salting (ringhash analog): the Zipf lang key (en ~45%
    of docs) must demand salting; a uniform key must not; and running the
    aggregation with the suggested salt cannot change results."""
    from gopie_spark.operators import suggest_salt
    s = suggest_salt(docs, ["lang"])
    assert s > 1
    uniform = docs.withColumn("_u", F.pmod(F.col("doc_id"), F.lit(8)))
    assert suggest_salt(uniform, ["_u"]) == 1
    assert suggest_salt(docs, []) == 1
    hll = HLL(p=12)
    df = docs.select("lang", F.col("doc_id").cast("string").alias("v")) \
             .repartition(16)
    plain = {r["lang"]: bytes(r[STATE_COL])
             for r in sketch_agg(df, ["lang"], "v", hll, salt=0).collect()}
    salted = {r["lang"]: bytes(r[STATE_COL])
              for r in sketch_agg(df, ["lang"], "v", hll, salt=s).collect()}
    assert plain == salted


def test_hll_count_distinct_within_bound(spark, docs):
    p = 14
    got = {r["lang"]: r["approx_distinct"]
           for r in hll_count_distinct(docs, "doc_id", keys=["lang"], p=p)
           .collect()}
    exact = {r["lang"]: r["exact"]
             for r in docs.groupBy("lang")
             .agg(F.countDistinct("doc_id").alias("exact")).collect()}
    bound = 3 * 1.04 / np.sqrt(2 ** p)
    for lang in exact:
        rel = abs(got[lang] - exact[lang]) / exact[lang]
        assert rel <= bound, (lang, got[lang], exact[lang])


def test_cms_matches_exact_counts_low_load(spark, events):
    cms, state = cms_build(events, "event_type")
    exact = dict(events.groupBy("event_type").count().collect())
    est = cms.estimate(state, list(exact))
    assert est.tolist() == list(exact.values())
    assert cms.count(state) == events.count()


def test_cms_estimate_map_column(spark, events):
    cms, state = cms_build(events, "event_type")
    out = cms_estimate_map(spark, cms, state, events, "event_type")
    rows = out.groupBy("event_type", "cms_estimate").count().collect()
    exact = dict(events.groupBy("event_type").count().collect())
    for r in rows:
        assert r["cms_estimate"] == exact[r["event_type"]]


def test_bloom_semi_join_no_false_negatives(spark, events, docs):
    target = events.filter(F.col("event_type") == "click")
    n = target.count() or 1
    bloom, state = bloom_build(
        target.select(F.col("user_id").cast("string").alias("u")), "u",
        n=max(n, 100), p=1e-6)
    member_ids = {r[0] for r in target.select("user_id").distinct().collect()}

    flagged = bloom_filter(spark, bloom, state, events, "user_id",
                           out_col="maybe_member")
    got = flagged.select("user_id", "maybe_member").collect()
    for uid, flag in got:
        if uid in member_ids:
            assert flag, f"false negative for {uid}"


def test_tdigest_quantiles_close_to_exact(spark, docs):
    out = tdigest_quantiles(docs, "n_chars", [0.5, 0.9]).collect()[0]
    exact = docs.selectExpr(
        "percentile(n_chars, 0.5) as p50", "percentile(n_chars, 0.9) as p90"
    ).collect()[0]
    n = docs.count()
    vals = np.array([r[0] for r in docs.select("n_chars").collect()],
                    dtype=float)
    for est, q in [(out["q0_5"], 0.5), (out["q0_9"], 0.9)]:
        rank = np.searchsorted(np.sort(vals), est, side="right") / n
        assert abs(rank - q) <= 0.03


def test_kll_quantiles_grouped(spark, events):
    out = kll_quantiles(events, "value", [0.5], keys=["event_type"]).collect()
    vals = {}
    for r in events.select("event_type", "value").collect():
        vals.setdefault(r[0], []).append(r[1])
    for row in out:
        data = np.sort(np.array(vals[row["event_type"]], dtype=float))
        rank = np.searchsorted(data, row["q0_5"], side="right") / len(data)
        assert abs(rank - 0.5) <= 0.05, row["event_type"]


def test_empty_input(spark):
    hll = HLL(p=10)
    df = spark.createDataFrame([], "v string")
    st = global_sketch(df, "v", hll)
    assert hll.count(st) == 0


def test_nulls_ignored_for_string_sketches(spark):
    hll = HLL(p=10)
    df = spark.createDataFrame([("a",), (None,), ("b",), (None,)],
                               "v string")
    st = global_sketch(df, "v", hll)
    serial = hll.zero()
    hll.update(serial, ["a", "b"])
    assert hll.serialize(st) == hll.serialize(serial)


def test_misra_gries_distributed_heavy_hitters(spark, docs):
    """MG through the two-level aggregation over a Zipf token column: the
    distributed merge keeps the heavy-hitter guarantee (est <= true <=
    est + err, every key with count > err tracked)."""
    import collections
    from gopie_spark.kernels import MisraGries
    from gopie_spark.operators import global_sketch
    toks = docs.select(F.explode(F.split(F.lower("text"), r"\s+"))
                       .alias("v")).filter(F.col("v") != "")
    mg = MisraGries(k=128)
    st = global_sketch(toks, "v", mg)
    true = collections.Counter(
        t for r in docs.select("text").collect()
        for t in r["text"].lower().split())
    n = sum(true.values())
    err = mg.error_bound(st)
    assert mg.count(st) == n
    assert err <= n // 129 + 1
    est = {k: int(c) for k, c in zip(st["keys"], st["counts"])}
    for key, cnt in true.items():
        if cnt > err:
            assert key in est, (key, cnt, err)
        if key in est:
            assert est[key] <= cnt <= est[key] + err
