"""Regression tests for the round-4d code-review findings."""
import datetime as dt
import os

import pytest
from pyspark.sql import functions as F


def test_swap_recovers_from_mid_crash(spark, tmp_path):
    """Kill between the swap's two renames: 'open' missing, backup
    present.  A fresh instance heals the state and the committed batch
    id + carried sessions survive."""
    from gopie_spark.streaming.sessions import StreamingSessions

    def df(rows):
        base = dt.datetime(2024, 1, 1)
        return spark.createDataFrame(
            [(u, base + dt.timedelta(seconds=s)) for u, s in rows],
            "user_id long, ts timestamp")

    state = str(tmp_path / "st")
    ss = StreamingSessions(spark, state, gap_s=100)
    ss.process_batch(df([(1, 0), (1, 50)]), 0)
    before = sorted(map(tuple, ss.open_sessions().collect()))
    # simulate the crash window: current renamed away, new never moved in
    os.rename(os.path.join(state, "open"), os.path.join(state, "_old_1"))
    ss2 = StreamingSessions(spark, state, gap_s=100)
    assert ss2.committed_batch_id() == 0
    assert sorted(map(tuple, ss2.open_sessions().collect())) == before


def test_topk_null_keys_kept_null_order_refused(spark):
    from gopie_spark.operators.topk import grouped_topk
    df = spark.createDataFrame(
        [("a", 1, 3.0), (None, 2, 5.0), (None, 3, 4.0), (None, 4, 1.0)],
        "k string, id long, v double")
    got = {(r["k"], r["rank"]): r["id"] for r in
           grouped_topk(df, ["k"], "v", 2, "id").collect()}
    assert got == {("a", 1): 1, (None, 1): 2, (None, 2): 3}
    bad = spark.createDataFrame([("a", 1, None)],
                                "k string, id long, v double")
    with pytest.raises(Exception, match="null/NaN in order column"):
        grouped_topk(bad, ["k"], "v", 1, "id").collect()


def test_retention_rejects_variable_periods(spark, sf_dir):
    from gopie_spark.operators.sessions import retention_cohorts
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    with pytest.raises(ValueError, match="day.*week"):
        retention_cohorts(ev, period="month")


def test_matrix_refuses_null_embeddings(spark):
    from gopie_spark.kernels import FreqDir
    from gopie_spark.operators.matrix import freqdir_global
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None)],
        "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="null embedding"):
        freqdir_global(df, "embedding", FreqDir(ell=4, d=2))


def test_theta_pairwise_null_is_null(spark, sf_dir):
    from gopie_spark.functions.sql import register_sql_functions
    from gopie_spark.kernels import Theta
    from gopie_spark.operators.sketch_agg import sketch_agg
    register_sql_functions(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = Theta(k=64)
    states = sketch_agg(docs.select(
        "source", F.col("doc_id").cast("string").alias("v")),
        ["source"], "v", t).limit(1)
    states.createOrReplaceTempView("tnull")
    row = spark.sql(
        "SELECT gopie_theta_jaccard(sketch_state, NULL) AS j, "
        "gopie_theta_union(NULL, sketch_state) AS u FROM tnull"
    ).collect()[0]
    assert row["j"] is None and row["u"] is None


def test_dsir_min_weight_requires_target(spark, sf_dir):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "jobs"))
    from filter_corpus import curate
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(SystemExit, match="dsir-target"):
        curate(spark, docs, near_dedup=False, dsir_min_weight=0.0)


def test_streaming_sketch_swap_recovery(spark, tmp_path):
    """Same mid-swap crash window for StreamingSketch: a fresh instance
    restores the backup, keeps the committed batch id, and the replayed
    batch stays a no-op (byte-equal state)."""
    from pyspark.sql import functions as F2
    from gopie_spark.kernels import HLL
    from gopie_spark.streaming import StreamingSketch

    state = str(tmp_path / "sk")
    hll = HLL(p=10)
    ss = StreamingSketch(spark, hll, ["lang"], "v", state)
    batch = spark.createDataFrame(
        [("en", str(i)) for i in range(50)], "lang string, v string")
    ss.process_batch(batch, 0)
    before = {r["lang"]: bytes(r["sketch_state"])
              for r in ss.current_states().collect()}
    os.rename(os.path.join(state, "current"),
              os.path.join(state, "_old_7"))
    ss2 = StreamingSketch(spark, hll, ["lang"], "v", state)
    assert ss2.committed_batch_id() == 0
    ss2.process_batch(batch, 0)  # replay: no-op
    after = {r["lang"]: bytes(r["sketch_state"])
             for r in ss2.current_states().collect()}
    assert after == before


def test_novelty_preflight_estimates(spark, sf_dir, tmp_path):
    """Two-batch crawl with a planted 60% overlap: the theta novelty
    pre-flight reports batch/new/overlap distincts within the sketch
    bound, and the persisted store sketch accumulates associatively."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "jobs"))
    from dedup_corpus import novelty_preflight

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .filter(F.col("text").isNotNull())
    sig = str(tmp_path / "sig")
    b1 = docs.filter(F.col("doc_id") < 300)
    r1 = novelty_preflight(b1, "text", sig)
    # distinct digests can be < rows (the corpus has planted dups)
    n1 = b1.selectExpr(
        "md5(lower(regexp_replace(text, '\\\\s+', ' '))) d") \
        .distinct().count()
    assert r1["batch_distinct_est"] == n1  # < k: exact tier
    assert r1["overlap_with_store_est"] == 0
    assert r1["store_distinct_est"] == n1

    b2 = docs.filter((F.col("doc_id") >= 120) & (F.col("doc_id") < 420))
    r2 = novelty_preflight(b2, "text", sig)
    union = docs.filter(F.col("doc_id") < 420).selectExpr(
        "md5(lower(regexp_replace(text, '\\\\s+', ' '))) d") \
        .distinct().count()
    assert r2["store_distinct_est"] == union  # merge == full rebuild
    assert 0 < r2["overlap_with_store_est"] <= r2["batch_distinct_est"]
    assert r2["new_distinct_est"] + r2["overlap_with_store_est"] == \
        r2["batch_distinct_est"]
