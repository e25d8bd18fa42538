"""Independent cross-checks against Spark's own approximate built-ins.

SURVEY.md §4.2: Catalyst's native sketches (approx_count_distinct =
HLL++, percentile_approx = GK/KLL-style) are *independent
implementations* of the same estimators — agreement within combined
error bounds is strong evidence against a shared systematic bug in our
kernels (different hash, different register layout, different merge
path, same answer)."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_hll_agrees_with_spark_hllpp(spark, events):
    from gopie_spark.kernels import HLL
    from gopie_spark.operators import global_sketch
    hll = HLL(p=14)
    st = global_sketch(
        events.select(F.col("user_id").cast("string").alias("v")), "v", hll)
    ours = hll.count(st)
    row = events.agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("spark_est"),
        F.countDistinct("user_id").alias("exact")).collect()[0]
    exact = row["exact"]
    assert abs(ours - exact) <= 3 * hll.std_err * exact + 2
    assert abs(row["spark_est"] - exact) <= 0.03 * exact + 2
    # the two independent estimators must therefore also agree closely
    assert abs(ours - row["spark_est"]) <= (3 * hll.std_err + 0.03) * exact + 4


def test_quantiles_agree_with_percentile_approx(spark, docs):
    from gopie_spark.kernels import KLL, TDigest
    from gopie_spark.operators import global_sketch
    qs = [0.25, 0.5, 0.75]
    spark_qs = docs.agg(
        F.percentile_approx("n_chars", qs, 10000).alias("p")).collect()[0]["p"]
    n = docs.count()
    for sketch in (TDigest(delta=100.0), KLL(k=200)):
        st = global_sketch(
            docs.select(F.col("n_chars").cast("double").alias("v")), "v",
            sketch)
        ours = sketch.quantile(st, qs)
        for q, ov, sv in zip(qs, ours, spark_qs):
            # both estimates' true ranks must be within eps of q, so their
            # rank gap is <= 2*eps; assert via rank positions
            lo = docs.filter(F.col("n_chars") <= float(min(ov, sv))).count()
            hi = docs.filter(F.col("n_chars") <= float(max(ov, sv))).count()
            assert (hi - lo) / n <= 0.06, \
                f"{type(sketch).__name__} q={q}: ours={ov} spark={sv}"
