"""Persisted band-bucket index (operators/dedup.build_band_index) — the
LSM base+delta shape that keeps daily incremental dedup from
re-shuffling the whole signature store:

- probe WITH the index == probe WITHOUT it, both when the index covers
  the whole store and when store partitions were folded AFTER the
  index build (deltas merged bucket-wise under the same cap);
- the index side of the probe join is a bucketed scan with ZERO
  Exchange (plan-pinned) — the at-scale point of the structure;
- the catalog entry survives loss (re-registered from the files);
- parameter / layout mismatches are refused.
"""

import os

import pytest
from pyspark.sql import functions as F

from gopie_spark.operators.dedup import (build_band_index,
                                         incremental_minhash_dedup,
                                         load_band_index)


def _docs(spark, lo, n, prefix="d"):
    return (spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
            .orderBy("doc_id").offset(lo).limit(n)
            .select(F.concat(F.lit(f"http://{prefix}.example/"),
                             F.col("doc_id").cast("string")).alias("url"),
                    "text"))


@pytest.fixture(scope="module")
def indexed_store(tmp_path_factory, spark):
    root = tmp_path_factory.mktemp("bandidx")
    store = str(root / "sigs")
    incremental_minhash_dedup(_docs(spark, 0, 60), store, id_col="url",
                              store_partition="d1")
    idx = str(root / "index")
    meta = build_band_index(spark, store, idx, k=128, bands=32,
                            max_bucket=64, index_buckets=8)
    assert meta["covered_batches"] == ["d1"]
    return store, idx


def _ids(df):
    return sorted(r["url"] for r in df.select("url").collect())


def test_index_probe_equals_plain_probe(spark, indexed_store):
    store, idx = indexed_store
    # day 2 = 40 fresh docs + 15 re-crawls of stored day-1 docs under
    # new urls (must die against the INDEXED history)
    stored_texts = _docs(spark, 0, 15).select(
        F.concat(F.lit("http://re.example/"),
                 F.xxhash64("url").cast("string")).alias("url"), "text")
    day2 = _docs(spark, 60, 40).unionByName(stored_texts)
    with_idx = incremental_minhash_dedup(
        day2, store, id_col="url", update_store=False, band_index=idx)
    without = incremental_minhash_dedup(
        day2, store, id_col="url", update_store=False)
    got = _ids(with_idx)
    assert got == _ids(without)
    assert not any(u.startswith("http://re.example/") for u in got)


def test_index_probe_with_deltas(spark, indexed_store):
    store, idx = indexed_store
    # fold day 2 into the store WITHOUT rebuilding the index -> d2 is a
    # delta partition the probe must explode fresh and merge in
    incremental_minhash_dedup(_docs(spark, 60, 40), store, id_col="url",
                              store_partition="d2", band_index=idx)
    # day 3 re-crawls DELTA docs (day-2 texts, new urls): a probe that
    # ignored deltas would let them all survive
    recrawl = _docs(spark, 60, 20).select(
        F.concat(F.lit("http://re3.example/"),
                 F.xxhash64("url").cast("string")).alias("url"), "text")
    day3 = _docs(spark, 100, 30).unionByName(recrawl)
    with_idx = incremental_minhash_dedup(
        day3, store, id_col="url", update_store=False, band_index=idx)
    without = incremental_minhash_dedup(
        day3, store, id_col="url", update_store=False)
    got = _ids(with_idx)
    assert got == _ids(without)
    assert not any(u.startswith("http://re3.example/") for u in got)


def test_index_scan_is_bucketed_zero_exchange(spark, indexed_store):
    store, idx = indexed_store
    members, meta = load_band_index(spark, idx)
    # probe keys must carry the index's exact types: a cast on the
    # bucketed side's join key would defeat the bucketing (real probes
    # share _band_explode, so types always line up)
    probe = (spark.range(500)
             .select((F.col("id") % meta["bands"])
                     .cast(members.schema["band"].dataType).alias("band"),
                     F.xxhash64("id")
                     .cast(members.schema["bh"].dataType).alias("bh")))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = members.join(probe, ["band", "bh"], "left_semi")
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # the index side scans its at-rest buckets; the ONLY Exchange is
    # the (small) probe side being shuffled to match
    assert "Bucketed: true" in plan, plan[:2000]
    assert plan.count("Exchange") == 1, plan[:2000]


def test_sig_fetch_is_bucketed_zero_exchange(spark, indexed_store):
    """The index's second layout: candidate signature fetch semi-joins
    the day's id set against signatures bucketed on _id — the store
    side scans its at-rest buckets with no Exchange even when the
    probe is too big to broadcast (the at-scale daily case)."""
    store, idx = indexed_store
    from gopie_spark.sources.bucketed import read_bucketed
    _, meta = load_band_index(spark, idx)
    assert meta["sig_table"]
    sigs = read_bucketed(spark, meta["sig_table"])
    probe = spark.range(300).select(
        F.concat(F.lit("http://d.example/"),
                 F.col("id").cast("string")).alias("_id"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = sigs.join(probe, "_id", "left_semi")
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Bucketed: true" in plan, plan[:2000]
    assert plan.count("Exchange") == 1, plan[:2000]


def test_legacy_index_without_sig_layout(spark, indexed_store, tmp_path):
    """Indexes built before the _id-bucketed signature layout carry no
    sig_table in their meta — the probe falls back to fetching from the
    raw store and still equals the index-free path."""
    import json
    import shutil

    store, idx = indexed_store
    legacy = str(tmp_path / "legacy_index")
    shutil.copytree(idx, legacy)
    mp = os.path.join(legacy, "_index_meta.json")
    with open(mp) as fh:
        meta = json.load(fh)
    meta.pop("sig_table", None)
    meta.pop("sig_path", None)
    with open(mp, "w") as fh:
        json.dump(meta, fh)
    day = _docs(spark, 140, 20).unionByName(
        _docs(spark, 0, 8).select(
            F.concat(F.lit("http://leg.example/"),
                     F.xxhash64("url").cast("string")).alias("url"),
            "text"))
    with_idx = incremental_minhash_dedup(
        day, store, id_col="url", update_store=False, band_index=legacy)
    without = incremental_minhash_dedup(
        day, store, id_col="url", update_store=False)
    got = _ids(with_idx)
    assert got == _ids(without)
    assert not any(u.startswith("http://leg.example/") for u in got)


def test_catalog_entry_recreated_after_loss(spark, indexed_store):
    store, idx = indexed_store
    _, meta = load_band_index(spark, idx)
    spark.sql(f"DROP TABLE IF EXISTS `{meta['table']}`")
    spark.sql(f"DROP TABLE IF EXISTS `{meta['sig_table']}`")
    members, _ = load_band_index(spark, idx)  # re-registers from files
    assert members.count() > 0
    assert spark.catalog.tableExists(meta["sig_table"])
    # and the re-created entry still carries the bucket spec
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        probe = spark.range(100).select(
            (F.col("id") % 32)
            .cast(members.schema["band"].dataType).alias("band"),
            F.xxhash64("id")
            .cast(members.schema["bh"].dataType).alias("bh"))
        plan = members.join(probe, ["band", "bh"], "left_semi") \
            ._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Bucketed: true" in plan


def test_index_refusals(spark, indexed_store, tmp_path):
    store, idx = indexed_store
    # re-running a batch the index already covers would desync the
    # persisted layouts from the store
    with pytest.raises(ValueError, match="already folded"):
        incremental_minhash_dedup(_docs(spark, 0, 5), store,
                                  id_col="url", store_partition="d1",
                                  band_index=idx)
    with pytest.raises(ValueError, match="rebuild the index"):
        incremental_minhash_dedup(_docs(spark, 0, 5), store,
                                  id_col="url", update_store=False,
                                  band_index=idx, k=64, bands=16)
    # plain-layout store cannot carry an index (deltas unidentifiable)
    plain = str(tmp_path / "plain_sigs")
    incremental_minhash_dedup(_docs(spark, 0, 10), plain, id_col="url")
    with pytest.raises(ValueError, match="day-partitioned"):
        build_band_index(spark, plain, str(tmp_path / "pidx"))
    with pytest.raises(ValueError, match="day-partitioned"):
        incremental_minhash_dedup(_docs(spark, 10, 5), plain,
                                  id_col="url", update_store=False,
                                  band_index=idx)


def test_rebuild_is_versioned_and_crash_safe(spark, tmp_path):
    """An in-place rebuild writes a NEW version committed only by the
    atomic meta swap: half-written orphan dirs from a crashed attempt
    are collected, the superseded version's dirs and catalog entries
    go away, and the probe keeps working across the rebuild."""
    from gopie_spark.operators.dedup import build_band_index

    store = str(tmp_path / "sigs")
    incremental_minhash_dedup(_docs(spark, 0, 30), store, id_col="url",
                              store_partition="d1")
    idx = str(tmp_path / "idx")
    m1 = build_band_index(spark, store, idx, index_buckets=8)
    # simulate a crashed rebuild attempt: an orphan version dir
    os.makedirs(os.path.join(idx, "data-deadbeef"))
    incremental_minhash_dedup(_docs(spark, 30, 20), store, id_col="url",
                              store_partition="d2")
    m2 = build_band_index(spark, store, idx, index_buckets=8)
    assert m2["covered_batches"] == ["d1", "d2"]
    assert m2["data_path"] != m1["data_path"]
    names = set(os.listdir(idx))
    assert os.path.basename(m2["data_path"]) in names
    assert os.path.basename(m2["sig_path"]) in names
    assert os.path.basename(m1["data_path"]) not in names  # superseded
    assert "data-deadbeef" not in names                    # orphan gc'd
    assert not spark.catalog.tableExists(m1["table"])
    assert not spark.catalog.tableExists(m1["sig_table"])
    # the new version serves a probe end to end
    got = _ids(incremental_minhash_dedup(
        _docs(spark, 50, 10), store, id_col="url", update_store=False,
        band_index=idx))
    assert got == _ids(incremental_minhash_dedup(
        _docs(spark, 50, 10), store, id_col="url", update_store=False))


def test_uncommitted_partition_is_not_covered(spark, tmp_path):
    """A batch= dir left by a crashed write (no committed data file)
    is not a partition: it must not enter covered_batches — that
    would wedge the documented crashed-day re-run behind the
    already-folded refusal."""
    from gopie_spark.operators.dedup import (_list_batch_partitions,
                                             build_band_index)

    store = str(tmp_path / "sigs")
    incremental_minhash_dedup(_docs(spark, 0, 20), store, id_col="url",
                              store_partition="d1")
    os.makedirs(os.path.join(store, "batch=d2", "_temporary"))
    assert _list_batch_partitions(spark, store) == ["d1"]
    idx = str(tmp_path / "idx")
    meta = build_band_index(spark, store, idx, index_buckets=8)
    assert meta["covered_batches"] == ["d1"]
    # the crashed day re-runs cleanly through the index
    out = incremental_minhash_dedup(_docs(spark, 20, 10), store,
                                    id_col="url", store_partition="d2",
                                    band_index=idx)
    assert out.count() > 0


def test_bbit_indexed_probe_equals_bbit_plain(spark, tmp_path):
    """b-bit verification diet through the LSM path: an index built
    with bbit= stores packed words alongside the signatures, and a
    probe with the same bbit= must equal the index-free bbit probe
    doc-for-doc (same estimator both sides), with exact re-crawls
    still dying (packed words of identical signatures are identical,
    so the b-bit estimate is exactly 1)."""
    store = str(tmp_path / "sigs")
    incremental_minhash_dedup(_docs(spark, 0, 60), store, id_col="url",
                              store_partition="d1")
    idx = str(tmp_path / "index")
    meta = build_band_index(spark, store, idx, k=128, bands=32,
                            max_bucket=64, index_buckets=8, bbit=1)
    assert meta["bbit"] == 1
    recrawl = _docs(spark, 0, 15).select(
        F.concat(F.lit("http://re.example/"),
                 F.xxhash64("url").cast("string")).alias("url"), "text")
    day2 = _docs(spark, 60, 40).unionByName(recrawl)
    with_idx = incremental_minhash_dedup(
        day2, store, id_col="url", update_store=False, band_index=idx,
        bbit=1)
    without = incremental_minhash_dedup(
        day2, store, id_col="url", update_store=False, bbit=1)
    got = _ids(with_idx)
    assert got == _ids(without)
    assert not any(u.startswith("http://re.example/") for u in got)
    # delta partitions (packed on the fly) keep the equality too
    incremental_minhash_dedup(_docs(spark, 60, 40), store, id_col="url",
                              store_partition="d2", band_index=idx)
    recrawl3 = _docs(spark, 60, 20).select(
        F.concat(F.lit("http://re3.example/"),
                 F.xxhash64("url").cast("string")).alias("url"), "text")
    day3 = _docs(spark, 100, 30).unionByName(recrawl3)
    wi = incremental_minhash_dedup(
        day3, store, id_col="url", update_store=False, band_index=idx,
        bbit=1)
    wo = incremental_minhash_dedup(
        day3, store, id_col="url", update_store=False, bbit=1)
    assert _ids(wi) == _ids(wo)
    assert not any(u.startswith("http://re3.example/")
                   for u in _ids(wi))


def test_bbit_mismatched_index_packs_post_fetch(spark, indexed_store):
    """A bbit probe against an index whose sigs layout has NO packed
    words must still work (full signatures fetched, packed post-fetch)
    and equal the index-free bbit probe."""
    store, idx = indexed_store
    _, imeta = load_band_index(spark, idx)
    assert imeta.get("bbit") is None
    recrawl = _docs(spark, 0, 10).select(
        F.concat(F.lit("http://reb.example/"),
                 F.xxhash64("url").cast("string")).alias("url"), "text")
    day = _docs(spark, 140, 20).unionByName(recrawl)
    wi = incremental_minhash_dedup(
        day, store, id_col="url", update_store=False, band_index=idx,
        bbit=2)
    wo = incremental_minhash_dedup(
        day, store, id_col="url", update_store=False, bbit=2)
    assert _ids(wi) == _ids(wo)
    assert not any(u.startswith("http://reb.example/") for u in _ids(wi))


def test_bbit_fetch_reads_only_packed_column(spark, tmp_path):
    """With a matching-bbit index, the candidate signature fetch must
    PRUNE the full signature column at the scan — the 64x fetch
    reduction is real only if the k-slot arrays never leave disk."""
    from gopie_spark.sources.bucketed import read_bucketed
    store = str(tmp_path / "sigs")
    incremental_minhash_dedup(_docs(spark, 0, 40), store, id_col="url",
                              store_partition="d1")
    idx = str(tmp_path / "index")
    meta = build_band_index(spark, store, idx, k=128, bands=32,
                            max_bucket=64, index_buckets=4, bbit=1)
    probe = spark.range(50).select(
        F.concat(F.lit("http://d.example/"),
                 F.col("id").cast("string")).alias("_id"))
    fetched = read_bucketed(spark, meta["sig_table"]) \
        .select("_id", "minhash_bbit").join(probe, "_id", "left_semi")
    plan = fetched._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.index("Scan parquet"):]
    schema_line = [ln for ln in scan.splitlines()
                   if "ReadSchema" in ln][0]
    assert "minhash_bbit" in schema_line
    assert "minhash:" not in schema_line and \
        "minhash," not in schema_line.replace("minhash_bbit", ""), \
        schema_line
