"""Leakage-safe splits + deterministic training order.

Certifies: (a) split is a pure function of the unit column (all rows of
a host share one split — the leakage-safety invariant), (b) split mass
tracks the requested fractions over distinct units, (c) DuckDB mirrors
reproduce the assignments byte-identically, (d) training_order is a
permutation (each shard's positions are 0..k-1), stable across
partitionings, reshuffled by seed, and (e) plan shapes: assign_split is
zero-shuffle; training_order has exactly one Exchange.
"""
import duckdb
import pytest
from pyspark.sql import functions as F

from gopie_spark.operators.split import (assign_split, host_split,
                                         oracle_assign_split_sql,
                                         oracle_training_order_sql,
                                         split_bounds, training_order)

FR = {"train": 0.8, "val": 0.1, "test": 0.1}


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = (spark.read.parquet(f"{sf_dir}/documents.parquet")
          .withColumn("host", F.concat(F.lit("h"),
                                       (F.col("doc_id") % 97)
                                       .cast("string"))))
    df.persist().count()
    yield df
    df.unpersist()


def test_split_bounds_normalize():
    b = split_bounds({"a": 2, "b": 1, "c": 1})
    assert [l for l, _ in b] == ["a", "b", "c"]
    assert b[-1][1] == 1.0
    assert abs(b[0][1] - 0.5) < 1e-12
    with pytest.raises(ValueError):
        split_bounds({})
    with pytest.raises(ValueError):
        split_bounds({"a": -1, "b": 2})


def test_host_split_leakage_safe_and_fractions(docs):
    out = host_split(docs, FR, seed=7)
    per_host = (out.groupBy("host")
                .agg(F.countDistinct("split").alias("k")))
    assert per_host.filter(F.col("k") != 1).count() == 0
    # mass over distinct UNITS tracks fractions (97 hosts, wide tolerance)
    units = (out.select("host", "split").distinct()
             .groupBy("split").count().collect())
    got = {r["split"]: r["count"] for r in units}
    n = sum(got.values())
    assert n == 97
    assert got.get("train", 0) / n > 0.6
    for lab in ("val", "test"):
        assert 0 < got.get(lab, 0) / n < 0.3


def test_assign_split_matches_duckdb_oracle(docs, sf_dir):
    got = {(r["doc_id"], r["split"])
           for r in assign_split(docs, FR, unit_col="host", seed=7)
           .select("doc_id", "split").collect()}
    case = oracle_assign_split_sql(
        "concat('h', CAST(doc_id % 97 AS VARCHAR))", FR, seed=7)
    want = set(duckdb.sql(
        f"SELECT doc_id, {case} AS split FROM "
        f"'{sf_dir}/documents.parquet'").fetchall())
    assert got == want


def test_assign_split_zero_shuffle(docs):
    plan = assign_split(docs, FR, unit_col="host")._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_training_order_permutation_and_oracle(docs, sf_dir):
    out = training_order(docs, n_shards=8, seed=42)
    rows = out.select("doc_id", "shard", "pos").collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps))), shard
    key, shard, win = oracle_training_order_sql("doc_id", 8, seed=42)
    want = set(duckdb.sql(
        f"SELECT doc_id, {shard} AS shard, "
        f"ROW_NUMBER() OVER ({win}) - 1 AS pos "
        f"FROM '{sf_dir}/documents.parquet'").fetchall())
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in rows} == want


def test_training_order_partitioning_invariant_and_seed(docs):
    a = training_order(docs, n_shards=4, seed=1)
    b = training_order(docs.repartition(13), n_shards=4, seed=1)
    assert (a.select("doc_id", "shard", "pos").exceptAll(
        b.select("doc_id", "shard", "pos")).count() == 0)
    c = training_order(docs, n_shards=4, seed=2)
    moved = (a.select("doc_id", "shard", "pos")
             .exceptAll(c.select("doc_id", "shard", "pos")).count())
    assert moved > 300  # a new seed is a genuinely new epoch order


def test_training_order_single_exchange(docs):
    plan = training_order(docs, n_shards=8)._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "rangepartitioning" not in plan.lower()  # never a global sort


def test_write_training_shards_physical_order(docs, tmp_path):
    """Each shard=K dir holds files whose PHYSICAL row order is pos
    order (what a sequential data-loader reads), and the union over
    shards is exactly the corpus."""
    import glob
    import pyarrow.parquet as pq
    from gopie_spark.operators.split import write_training_shards
    out = str(tmp_path / "epoch0")
    write_training_shards(docs.select("doc_id"), out, n_shards=4,
                          seed=3)
    seen = []
    for k in range(4):
        files = sorted(glob.glob(f"{out}/shard={k}/*.parquet"))
        assert len(files) == 1  # one task per shard -> one file
        t = pq.read_table(files[0]).to_pydict()
        assert t["pos"] == sorted(t["pos"])
        assert t["pos"] == list(range(len(t["pos"])))
        seen += t["doc_id"]
    assert sorted(seen) == sorted(
        r["doc_id"] for r in docs.select("doc_id").collect())
