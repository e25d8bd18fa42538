"""Persisted paragraph/sentence key index (operators/dedup.
build_pk_index) — the span-key twin of the band index:

- probe WITH the index == probe WITHOUT it, base-only AND with store
  partitions folded after the index build (probed as delta anti-joins);
- the history anti-join scans the at-rest _pk buckets with exactly ONE
  Exchange (the batch side) — plan-pinned;
- day-partitioned store updates are idempotent: the probe excludes the
  batch's OWN partition, so a crashed-then-re-run day neither vetoes
  its own keys nor appends duplicates;
- parameter / layout / covered-batch-re-run mismatches are refused.
"""

import os

import pytest
from pyspark.sql import functions as F

from gopie_spark.operators.dedup import (build_pk_index,
                                         incremental_paragraph_dedup,
                                         load_pk_index)


def _docs(spark, lo, n, prefix="d"):
    return (spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
            .orderBy("doc_id").offset(lo).limit(n)
            .select(F.concat(F.lit(f"http://{prefix}.example/"),
                             F.col("doc_id").cast("string")).alias("url"),
                    "text"))


def _out(df):
    return sorted((r["url"], r["clean_text"], r["n_paras_kept"])
                  for r in df.select("url", "clean_text",
                                     "n_paras_kept").collect())


@pytest.fixture(scope="module")
def indexed_pk_store(tmp_path_factory, spark):
    root = tmp_path_factory.mktemp("pkidx")
    store = str(root / "pks")
    incremental_paragraph_dedup(_docs(spark, 0, 60), store, id_col="url",
                                store_partition="d1")
    idx = str(root / "index")
    meta = build_pk_index(spark, store, idx, index_buckets=8)
    assert meta["covered_batches"] == ["d1"]
    assert meta["pk_type"] == "bigint"
    return store, idx


def test_index_probe_equals_plain_probe(spark, indexed_pk_store):
    store, idx = indexed_pk_store
    # day 2 = fresh docs + docs whose paragraphs repeat day-1 content
    # (same text under new urls -> every paragraph must be cut by the
    # INDEXED history, leaving empty clean_text)
    rep = _docs(spark, 0, 10).select(
        F.concat(F.lit("http://re.example/"),
                 F.xxhash64("url").cast("string")).alias("url"), "text")
    day2 = _docs(spark, 60, 30).unionByName(rep)
    with_idx = incremental_paragraph_dedup(
        day2, store, id_col="url", update_store=False, pk_index=idx)
    without = incremental_paragraph_dedup(
        day2, store, id_col="url", update_store=False)
    got = _out(with_idx)
    assert got == _out(without)
    reps = [t for t in got if t[0].startswith("http://re.example/")]
    assert reps and all(t[2] == 0 for t in reps)


def test_index_probe_with_deltas(spark, indexed_pk_store):
    store, idx = indexed_pk_store
    # fold day 2 WITHOUT rebuilding -> d2 is a delta partition
    incremental_paragraph_dedup(_docs(spark, 60, 30), store,
                                id_col="url", store_partition="d2",
                                pk_index=idx)
    rep = _docs(spark, 60, 10).select(
        F.concat(F.lit("http://re3.example/"),
                 F.xxhash64("url").cast("string")).alias("url"), "text")
    day3 = _docs(spark, 90, 20).unionByName(rep)
    with_idx = incremental_paragraph_dedup(
        day3, store, id_col="url", update_store=False, pk_index=idx)
    without = incremental_paragraph_dedup(
        day3, store, id_col="url", update_store=False)
    got = _out(with_idx)
    assert got == _out(without)
    reps = [t for t in got if t[0].startswith("http://re3.example/")]
    assert reps and all(t[2] == 0 for t in reps)


def test_anti_join_is_bucketed_one_exchange(spark, indexed_pk_store):
    store, idx = indexed_pk_store
    base, meta = load_pk_index(spark, idx)
    probe = spark.range(500).select(F.xxhash64("id").alias("_pk"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = probe.join(base, "_pk", "left_anti") \
            ._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Bucketed: true" in plan, plan[:2000]
    assert plan.count("Exchange") == 1, plan[:2000]


def test_partitioned_rerun_idempotent(spark, tmp_path):
    # re-running a crashed batch: own partial partition must not veto
    # the batch's keys, and the overwrite must not duplicate rows
    store = str(tmp_path / "pks")
    d1 = _docs(spark, 0, 25)
    first = _out(incremental_paragraph_dedup(d1, store, id_col="url",
                                             store_partition="d1"))
    n1 = spark.read.parquet(store).count()
    again = _out(incremental_paragraph_dedup(d1, store, id_col="url",
                                             store_partition="d1"))
    assert again == first
    assert spark.read.parquet(store).count() == n1
    # and a SECOND day still dedups against day 1
    rep = _docs(spark, 0, 5).select(
        F.concat(F.lit("http://re.example/"),
                 F.xxhash64("url").cast("string")).alias("url"), "text")
    out2 = _out(incremental_paragraph_dedup(rep, store, id_col="url",
                                            store_partition="d2"))
    assert all(t[2] == 0 for t in out2)


def test_dedup_corpus_job_with_indexes(spark, tmp_path):
    """jobs/dedup_corpus.py --batch-date/--band-index/--paragraph-index
    as a black box: day 1 builds the partitioned stores, indexes are
    built in THIS session (the job's own session must re-register the
    bucketed catalog entries from the files), day 2 probes through
    both indexes and the planted re-crawl docs die."""
    import glob
    import json
    import subprocess
    import sys

    import duckdb

    from gopie_spark.operators.dedup import (build_band_index,
                                             build_pk_index)

    src = "/root/testdata/sf0.001/documents.parquet"
    d1, d2 = str(tmp_path / "day1.parquet"), str(tmp_path / "day2.parquet")
    duckdb.sql(f"COPY (SELECT * FROM '{src}' ORDER BY doc_id LIMIT 300) "
               f"TO '{d1}' (FORMAT PARQUET)")
    # day 2: 50 re-crawls of day-1 docs (250-299) + 200 fresh, new ids
    duckdb.sql(f"COPY (SELECT doc_id + 10000 AS doc_id, "
               f"* EXCLUDE (doc_id) FROM '{src}' "
               f"ORDER BY doc_id LIMIT 250 OFFSET 250) "
               f"TO '{d2}' (FORMAT PARQUET)")
    sig, pstore = str(tmp_path / "sigs"), str(tmp_path / "pstore")
    env = dict(os.environ, SPARK_GRAFT_CPUS="8", PYTHONPATH="/root/repo")

    def run(inp, date, extra):
        r = subprocess.run(
            [sys.executable, "jobs/dedup_corpus.py", "--input", inp,
             "--output", str(tmp_path / f"out_{date}"),
             "--sig-dir", sig, "--incremental",
             "--paragraph-store", pstore, "--batch-date", date] + extra,
            capture_output=True, text=True, cwd="/root/repo", env=env,
            timeout=400)
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    run(d1, "d1", [])
    bidx, pidx = str(tmp_path / "bidx"), str(tmp_path / "pidx")
    build_band_index(spark, sig, bidx, index_buckets=8)
    build_pk_index(spark, pstore, pidx, index_buckets=8)
    rep = run(d2, "d2", ["--band-index", bidx,
                         "--paragraph-index", pidx])
    assert rep["band_index"] == bidx and rep["paragraph_index"] == pidx
    assert rep["batch_date"] == "d2"
    # the 50 re-crawls lose every paragraph to the indexed history
    assert rep["after_paragraph_dedup"] <= 200
    out = glob.glob(str(tmp_path / "out_d2") + "/*.parquet")
    assert out
    kept = duckdb.sql(
        f"SELECT min(doc_id) FROM read_parquet({out!r})").fetchone()[0]
    assert kept is None or kept >= 10300  # no re-crawl survived


def test_bad_batch_labels_refused(spark, tmp_path):
    """Labels partition-type inference would re-type (and read back as
    a DIFFERENT string) are refused up front — a silent mismatch would
    turn the own-partition exclusion into data loss on re-run."""
    from gopie_spark.operators.dedup import _check_batch_label
    for bad in ("2026-8-1", "007", "1.50", "2e3", "bad/label", ""):
        with pytest.raises(ValueError):
            _check_batch_label(bad)
    for ok in ("2026-08-21", "d1", "7", "base", "v1.2.3", "1-2-3-4"):
        assert _check_batch_label(ok) == ok
    store = str(tmp_path / "pks")
    with pytest.raises(ValueError, match="non-canonical date"):
        incremental_paragraph_dedup(_docs(spark, 0, 5), store,
                                    id_col="url",
                                    store_partition="2026-8-1")


def test_accepted_labels_survive_spark_inference(spark, tmp_path):
    """Empirical pin for _check_batch_label against Spark itself: every
    ACCEPTED label, written as its own homogeneous partition column,
    reads back as the identical string — and a refused label really
    does come back different (the documented threat)."""
    from gopie_spark.operators.dedup import _check_batch_label
    for i, lab in enumerate(["2026-08-21", "d1", "7", "base", "v1.2.3",
                             "x_y-z.w", "20260821", "1-2-3-4"]):
        _check_batch_label(lab)
        p = str(tmp_path / f"s{i}")
        spark.range(1).write.parquet(f"{p}/batch={lab}")
        got = str(spark.read.parquet(p).select("batch").first()["batch"])
        assert got == lab, (lab, got)
    # the refused numeric classes really are re-typed by inference
    for j, (lab, reread) in enumerate((("007", "7"), ("1.50", "1.5"),
                                       ("2e3", "2000"))):
        bad = str(tmp_path / f"bad{j}")
        spark.range(1).write.parquet(f"{bad}/batch={lab}")
        got = str(spark.read.parquet(bad).select("batch").first()["batch"])
        assert got == reread and got != lab, (lab, got)


def test_refusals(spark, indexed_pk_store, tmp_path):
    store, idx = indexed_pk_store
    # a covered batch is refused even READ-ONLY: its keys sit in the
    # bucketed base where no probe can exclude them
    with pytest.raises(ValueError, match="already folded"):
        incremental_paragraph_dedup(_docs(spark, 0, 5), store,
                                    id_col="url", store_partition="d1",
                                    pk_index=idx)
    with pytest.raises(ValueError, match="already folded"):
        incremental_paragraph_dedup(_docs(spark, 0, 5), store,
                                    id_col="url", store_partition="d1",
                                    update_store=False, pk_index=idx)
    # raw-string keys against a hashed index
    with pytest.raises(ValueError, match="must not mix"):
        incremental_paragraph_dedup(_docs(spark, 0, 5), store,
                                    id_col="url", update_store=False,
                                    hash_keys=False, pk_index=idx)
    # plain-layout store: no index build, no index probe, no layout mix
    plain = str(tmp_path / "plain_pks")
    incremental_paragraph_dedup(_docs(spark, 0, 10), plain, id_col="url")
    with pytest.raises(ValueError, match="day-partitioned"):
        build_pk_index(spark, plain, str(tmp_path / "pidx"))
    with pytest.raises(ValueError, match="day-partitioned"):
        incremental_paragraph_dedup(_docs(spark, 10, 5), plain,
                                    id_col="url", update_store=False,
                                    pk_index=idx)
    with pytest.raises(ValueError, match="mixing the layouts"):
        incremental_paragraph_dedup(_docs(spark, 10, 5), plain,
                                    id_col="url", store_partition="d9")
