"""Persisted SimHash chunk index (operators/dedup.build_chunk_index) —
the SimHash twin of the band index's LSM base+delta shape:

- probe WITH the index == probe WITHOUT it, base-only AND with store
  partitions folded after the index build (deltas merged bucket-wise
  under the shared cap);
- both persisted layouts scan their at-rest buckets with exactly ONE
  Exchange (the probe side) — plan-pinned;
- day-partitioned store updates are idempotent (batch overwrite);
- parameter / layout mismatches are refused.
"""

import os

import pytest
from pyspark.sql import functions as F

from gopie_spark.operators.dedup import (build_chunk_index,
                                         incremental_simhash_dedup,
                                         load_chunk_index)


def _docs(spark, lo, n, prefix="d"):
    return (spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
            .orderBy("doc_id").offset(lo).limit(n)
            .select(F.concat(F.lit(f"http://{prefix}.example/"),
                             F.col("doc_id").cast("string")).alias("url"),
                    "text"))


def _ids(df):
    return sorted(r["url"] for r in df.select("url").collect())


@pytest.fixture(scope="module")
def indexed_fp_store(tmp_path_factory, spark):
    root = tmp_path_factory.mktemp("chunkidx")
    store = str(root / "fps")
    incremental_simhash_dedup(_docs(spark, 0, 60), store, id_col="url",
                              store_partition="d1")
    idx = str(root / "index")
    meta = build_chunk_index(spark, store, idx, max_bucket=256,
                             index_buckets=8)
    assert meta["covered_batches"] == ["d1"]
    assert meta["fp_table"]
    return store, idx


def test_index_probe_equals_plain_probe(spark, indexed_fp_store):
    store, idx = indexed_fp_store
    # day 2 = 40 fresh docs + 15 exact re-crawls of stored day-1 docs
    # under new urls (Hamming 0 -> must die against the INDEXED history)
    recrawl = _docs(spark, 0, 15).select(
        F.concat(F.lit("http://re.example/"),
                 F.xxhash64("url").cast("string")).alias("url"), "text")
    day2 = _docs(spark, 60, 40).unionByName(recrawl)
    with_idx = incremental_simhash_dedup(
        day2, store, id_col="url", update_store=False, chunk_index=idx)
    without = incremental_simhash_dedup(
        day2, store, id_col="url", update_store=False)
    got = _ids(with_idx)
    assert got == _ids(without)
    assert not any(u.startswith("http://re.example/") for u in got)


def test_index_probe_with_deltas(spark, indexed_fp_store):
    store, idx = indexed_fp_store
    # fold day 2 WITHOUT rebuilding the index -> d2 becomes a delta
    incremental_simhash_dedup(_docs(spark, 60, 40), store, id_col="url",
                              store_partition="d2", chunk_index=idx)
    recrawl = _docs(spark, 60, 20).select(
        F.concat(F.lit("http://re3.example/"),
                 F.xxhash64("url").cast("string")).alias("url"), "text")
    day3 = _docs(spark, 100, 30).unionByName(recrawl)
    with_idx = incremental_simhash_dedup(
        day3, store, id_col="url", update_store=False, chunk_index=idx)
    without = incremental_simhash_dedup(
        day3, store, id_col="url", update_store=False)
    got = _ids(with_idx)
    assert got == _ids(without)
    assert not any(u.startswith("http://re3.example/") for u in got)


def test_both_layouts_scan_bucketed_one_exchange(spark, indexed_fp_store):
    store, idx = indexed_fp_store
    from gopie_spark.sources.bucketed import read_bucketed
    members, meta = load_chunk_index(spark, idx)
    chunk_probe = spark.range(200).select(
        (F.col("id") % 4).cast(members.schema["chunk"].dataType)
        .alias("chunk"),
        (F.xxhash64("id") % 65536)
        .cast(members.schema["cv"].dataType).alias("cv"))
    fp_probe = spark.range(200).select(
        F.concat(F.lit("http://d.example/"),
                 F.col("id").cast("string")).alias("_id"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for df, probe, on in (
                (members, chunk_probe, ["chunk", "cv"]),
                (read_bucketed(spark, meta["fp_table"]), fp_probe,
                 ["_id"])):
            plan = df.join(probe, on, "left_semi") \
                ._jdf.queryExecution().executedPlan().toString()
            assert "Bucketed: true" in plan, plan[:2000]
            assert plan.count("Exchange") == 1, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_partitioned_update_idempotent(spark, indexed_fp_store,
                                       tmp_path):
    # re-running a crashed batch overwrites its own partition instead
    # of appending duplicate fingerprint rows
    store = str(tmp_path / "fps")
    incremental_simhash_dedup(_docs(spark, 0, 30), store, id_col="url",
                              store_partition="d1")
    n1 = spark.read.parquet(store).count()
    incremental_simhash_dedup(_docs(spark, 0, 30), store, id_col="url",
                              store_partition="d1")
    assert spark.read.parquet(store).count() == n1


def test_refusals(spark, indexed_fp_store, tmp_path):
    store, idx = indexed_fp_store
    with pytest.raises(ValueError, match="already folded"):
        incremental_simhash_dedup(_docs(spark, 0, 5), store,
                                  id_col="url", store_partition="d1",
                                  chunk_index=idx)
    with pytest.raises(ValueError, match="rebuild the index"):
        incremental_simhash_dedup(_docs(spark, 0, 5), store,
                                  id_col="url", update_store=False,
                                  chunk_index=idx, max_bucket=64)
    # plain-layout store: no index build, no index probe, no layout mix
    plain = str(tmp_path / "plain_fps")
    incremental_simhash_dedup(_docs(spark, 0, 10), plain, id_col="url")
    with pytest.raises(ValueError, match="day-partitioned"):
        build_chunk_index(spark, plain, str(tmp_path / "pidx"))
    with pytest.raises(ValueError, match="day-partitioned"):
        incremental_simhash_dedup(_docs(spark, 10, 5), plain,
                                  id_col="url", update_store=False,
                                  chunk_index=idx)
    with pytest.raises(ValueError, match="mixing the layouts"):
        incremental_simhash_dedup(_docs(spark, 10, 5), plain,
                                  id_col="url", store_partition="d9")


def test_rebuild_is_versioned(spark, tmp_path):
    """Chunk-index rebuilds commit as atomic versions too: the
    superseded version's dirs (incl. the fps- layout) and catalog
    entries are collected, and the rebuilt index serves a probe."""
    from gopie_spark.operators.dedup import build_chunk_index

    store = str(tmp_path / "fps")
    incremental_simhash_dedup(_docs(spark, 0, 25), store, id_col="url",
                              store_partition="d1")
    idx = str(tmp_path / "idx")
    m1 = build_chunk_index(spark, store, idx, index_buckets=8)
    incremental_simhash_dedup(_docs(spark, 25, 15), store, id_col="url",
                              store_partition="d2")
    m2 = build_chunk_index(spark, store, idx, index_buckets=8)
    assert m2["covered_batches"] == ["d1", "d2"]
    names = set(os.listdir(idx))
    assert os.path.basename(m2["fp_path"]) in names
    assert os.path.basename(m1["data_path"]) not in names
    assert os.path.basename(m1["fp_path"]) not in names
    assert not spark.catalog.tableExists(m1["table"])
    assert not spark.catalog.tableExists(m1["fp_table"])
    rec = _docs(spark, 0, 8).select(
        F.concat(F.lit("http://re.example/"),
                 F.xxhash64("url").cast("string")).alias("url"), "text")
    got = _ids(incremental_simhash_dedup(
        _docs(spark, 40, 10).unionByName(rec), store, id_col="url",
        update_store=False, chunk_index=idx))
    assert not any(u.startswith("http://re.example/") for u in got)
