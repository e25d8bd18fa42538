"""Deterministic sampling operators (operators/sampling.py)."""

import io
from contextlib import redirect_stdout

import pytest

from pyspark.sql import Row, functions as F

from gopie_spark.operators.sampling import (
    hash_sample,
    hash_sample_fraction,
    priority_sample,
    priority_threshold,
    sample_key,
    stratified_hash_sample,
    uniform01,
)

SF = "/root/testdata/sf0.01"


def _plan(df, mode="simple"):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_hash_sample_deterministic_across_partitionings(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = [r["doc_id"] for r in
         hash_sample(docs, 20, seed=3).orderBy("doc_id").collect()]
    b = [r["doc_id"] for r in
         hash_sample(docs.repartition(17, "lang"), 20, seed=3)
         .orderBy("doc_id").collect()]
    assert a == b and len(a) == 20
    c = [r["doc_id"] for r in
         hash_sample(docs, 20, seed=4).orderBy("doc_id").collect()]
    assert a != c  # a different seed draws a different sample


def test_hash_sample_plans_take_ordered(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert "TakeOrderedAndProject" in _plan(hash_sample(docs, 10))
    assert "TakeOrderedAndProject" in _plan(
        priority_sample(docs, "n_chars", 10))


def test_fraction_split_is_partition_and_consistent(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    train = hash_sample_fraction(docs, 0.8, seed=5)
    val = docs.join(train.select("doc_id"), "doc_id", "anti")
    n, nt, nv = docs.count(), train.count(), val.count()
    assert nt + nv == n
    # Bernoulli(0.8) over n=500: expect within 5 sigma
    import math
    sigma = math.sqrt(n * 0.8 * 0.2)
    assert abs(nt - 0.8 * n) < 5 * sigma
    # consistency: filtering a projected copy keeps the same ids
    again = {r["doc_id"] for r in
             hash_sample_fraction(docs.select("doc_id"), 0.8, seed=5)
             .collect()}
    assert again == {r["doc_id"] for r in train.select("doc_id").collect()}


def test_fraction_plan_is_pure_filter(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(hash_sample_fraction(docs, 0.5), "simple")
    assert "Exchange" not in plan  # no shuffle: a scan + filter


def test_stratified_sample_counts_and_membership(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = stratified_hash_sample(docs, ["lang"], 5, seed=7)
    per = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    avail = {r["lang"]: r["n"] for r in
             docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(per) == set(avail)
    for lang, n in per.items():
        assert n == min(5, avail[lang])
    # sample rows are real rows (semi join preserved all columns)
    assert out.columns == docs.columns


def test_stratified_equals_window_reference(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(r["doc_id"] for r in
                 stratified_hash_sample(docs, ["lang"], 4, seed=9)
                 .collect())
    from pyspark.sql import Window
    w = Window.partitionBy("lang").orderBy(
        sample_key("doc_id", 9).asc(), F.col("doc_id").desc())
    want = sorted(r["doc_id"] for r in
                  docs.withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") <= 4).collect())
    assert got == want


def test_priority_sample_favors_heavy_rows(spark):
    # weights 1 vs 1000: the heavy minority must dominate the sample
    rows = [Row(doc_id=i, w=1000 if i < 50 else 1) for i in range(2000)]
    df = spark.createDataFrame(rows)
    picked = priority_sample(df, "w", 40, seed=1, id_col="doc_id")
    heavy = picked.filter(F.col("doc_id") < 50).count()
    assert heavy >= 30  # E[heavy] ~= 40 * (50k/(50k+~2k)) ~ 38


def test_priority_threshold_and_ht_estimate(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    k = 50
    tau = priority_threshold(docs, "n_chars", k, seed=2)
    picked = priority_sample(docs, "n_chars", k, seed=2)
    assert picked.count() == k
    # Horvitz-Thompson: sum(max(w, tau)) over the sample estimates the
    # population total; with k=50 of 500 this lands within ~35%
    est = picked.select(
        F.sum(F.greatest(F.col("n_chars").cast("double"), F.lit(tau)))
        .alias("s")).collect()[0]["s"]
    total = docs.select(F.sum("n_chars").alias("s")).collect()[0]["s"]
    assert abs(est - total) / total < 0.35


def test_sampling_argument_validation(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with pytest.raises(ValueError):
        hash_sample(docs, 0)
    with pytest.raises(ValueError):
        priority_sample(docs, "n_chars", 0)
    with pytest.raises(ValueError):
        hash_sample_fraction(docs, 1.5)


def test_uniform01_in_open_interval(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    row = docs.select(F.min(uniform01("doc_id")).alias("lo"),
                      F.max(uniform01("doc_id")).alias("hi")).collect()[0]
    assert 0.0 < row["lo"] and row["hi"] < 1.0
