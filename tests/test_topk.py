"""Grouped top-k with map-side pruning (operators/topk.py).

Gates: equals the window-rank reference exactly (incl. deterministic
tie-break), the pruned pre-stage emits at most k rows per key per
partition, groups smaller than k come back whole, and the plan's
window input is the pruned mapInPandas stage (never the raw scan)."""
import pytest
from pyspark.sql import Window, functions as F

from gopie_spark.operators.topk import grouped_topk


def _reference(df, keys, order_col, k, id_col):
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc(),
                                          F.col(id_col).asc())
    return df.select(*keys, id_col, order_col) \
        .withColumn("rank", F.row_number().over(w)) \
        .filter(F.col("rank") <= k)


def test_grouped_topk_matches_window_reference(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = sorted(map(tuple, grouped_topk(
        ev, ["event_type"], "value", 5, "event_id").collect()))
    want = sorted(map(tuple, _reference(
        ev, ["event_type"], "value", 5, "event_id").collect()))
    assert got == want and len(got) == 25


def test_grouped_topk_ties_and_small_groups(spark):
    rows = [("a", 1, 7.0), ("a", 2, 7.0), ("a", 3, 7.0), ("a", 4, 1.0),
            ("b", 5, 2.0)]
    df = spark.createDataFrame(rows, "k string, id long, v double")
    got = [(r["k"], r["rank"], r["id"]) for r in
           grouped_topk(df, ["k"], "v", 2, "id")
           .orderBy("k", "rank").collect()]
    # ties break by id ASC; group b (size 1 < k) comes back whole
    assert got == [("a", 1, 1), ("a", 2, 2), ("b", 1, 5)]


def test_prune_stage_bounded_per_partition(spark, sf_dir):
    """The map-side fold emits <= k rows per key per partition."""
    from gopie_spark.operators.topk import _prune_iter
    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .select("event_type", "event_id", "value").repartition(4)
    pruned = ev.mapInPandas(
        _prune_iter(["event_type"], "value", "event_id", 3), ev.schema)
    # count survivors: <= 3 keys*... per partition per key
    counts = pruned.groupBy(F.spark_partition_id().alias("p"),
                            "event_type").count().collect()
    assert counts and all(r["count"] <= 3 for r in counts)
    total = pruned.count()
    assert total <= 4 * 5 * 3  # partitions x keys x k


def test_window_input_is_pruned_stage(spark, sf_dir):
    """Plan gate: the window's child chain contains the Python map
    stage (pruning happened BEFORE the per-key sort), and the full
    scan row count never reaches the window."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = grouped_topk(ev, ["event_type"], "value", 3, "event_id") \
        ._jdf.queryExecution().executedPlan().toString()
    w = plan.index("Window")
    assert "MapInPandas" in plan[w:], plan[:800]
