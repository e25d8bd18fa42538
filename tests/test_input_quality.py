"""Input-contract hardening (sources/quality.py + build_sketches
--quarantine): malformed crawl rows are classified, persisted with
reasons, and excluded from every sketch build — and the sketch outputs
of a quarantined dirty corpus are BYTE-EQUAL to running the plain job
on the clean rows alone."""

import json
import os
import shutil
import subprocess
import sys



from pyspark.sql import functions as F

from gopie_spark.sources.quality import (input_quality_aggs,
                                         quarantine_reason,
                                         split_quarantine)

ROWS = [
    # (url, text, lang) — warc_ts/html filled in by the helpers
    ("http://ok.example.com/a", "fine text content here", "en"),
    (None, "text but no url", "en"),                      # null_url
    ("", "text but empty url", "de"),                     # null_url
    ("http://ok.example.com/b", None, "en"),              # null_text
    ("http://ok.example.com/c", "", "fr"),                # empty_text
    (None, None, None),                                   # null_url wins
    ("http://ok.example.com/d", "x" * 500, "en"),         # oversize @ 100
    ("http://ok.example.com/e", "lang unknown is FINE", None),  # kept
]


def _df(spark):
    rows = [(u, None, None, t, lang) for u, t, lang in ROWS]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, "
              "text string, lang string")


def test_reason_precedence_and_null_lang_kept(spark):
    out = _df(spark).select(
        "url", "text", "lang",
        quarantine_reason(max_text_len=100).alias("r")).collect()
    want = [None, "null_url", "null_url", "null_text", "empty_text",
            "null_url", "oversize_text", None]
    assert [r["r"] for r in out] == want


def test_split_is_an_exact_partition(spark):
    df = _df(spark)
    clean, bad = split_quarantine(df, max_text_len=100)
    assert clean.count() + bad.count() == df.count()
    assert clean.count() == 2  # the ok row + the null-lang row
    assert {r["_reason"] for r in bad.collect()} == {
        "null_url", "null_text", "empty_text", "oversize_text"}
    # without the oversize tier the 500-char row is clean
    clean2, _ = split_quarantine(df)
    assert clean2.count() == 3


def test_quality_aggs_ride_one_scan(spark):
    row = _df(spark).agg(
        F.count("*").alias("rows"),
        *input_quality_aggs(max_text_len=100)).collect()[0]
    assert row["rows"] == 8
    assert row["rows_null_url"] == 3       # None, "", (None, None)
    assert row["rows_null_text"] == 2      # null-text row + all-null row
    assert row["rows_empty_text"] == 1
    assert row["rows_oversize_text"] == 1
    assert row["rows_null_lang"] == 2      # all-null row + kept row
    assert row["rows_null_ts"] == 8


def test_job_quarantine_equals_clean_run(spark, tmp_path):
    """Black box: build_sketches --quarantine on a dirty corpus produces
    the SAME hll/cms/bloom outputs as the plain job on the clean files,
    plus the quarantine parquet and per-reason counts."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from gopie_spark.sources.pages import generate_pages

    dirty = str(tmp_path / "dirty")
    cleansrc = str(tmp_path / "clean")
    generate_pages(dirty, 600, n_files=3, seed=23)
    shutil.copytree(dirty, cleansrc)

    # plant a bad file in the dirty copy only (schema-matched via the
    # first generated file)
    schema = pq.read_schema(os.path.join(dirty, "part-00000.parquet"))
    bad_rows = {
        "url": [None, "", "http://bad.example.com/big"],
        "warc_ts": [None, None, None],
        "html": [None, None, None],
        "text": ["orphan text", "another orphan", "y" * 100_000],
        "lang": ["en", "de", "en"],
    }
    pq.write_table(
        pa.Table.from_pydict(bad_rows).cast(schema),
        os.path.join(dirty, "part-00099.parquet"))

    env = dict(os.environ, SPARK_GRAFT_CPUS="8", PYTHONPATH="/root/repo")

    def run(src, out, ckpt, extra):
        r = subprocess.run(
            [sys.executable, "jobs/build_sketches.py", "--input", src,
             "--checkpoint", ckpt, "--output", out, "--hll-p", "11",
             "--n-buckets", "8", "--salt", "0"] + extra,
            capture_output=True, text=True, cwd="/root/repo", env=env,
            timeout=500)
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    rep_q = run(dirty, str(tmp_path / "out_q"), str(tmp_path / "ck_q"),
                ["--quarantine", "--max-text-len", "50000"])
    rep_c = run(cleansrc, str(tmp_path / "out_c"), str(tmp_path / "ck_c"),
                [])

    # summary: counts the builds saw are identical; quarantine reported
    assert rep_q["rows"] == rep_c["rows"] == 600
    assert rep_q["quarantined"] == {
        "null_url": 2, "oversize_text": 1}
    assert rep_q["input_quality"]["rows_null_url"] == 2
    assert rep_q["input_quality"]["rows_oversize_text"] == 1
    assert "quarantine" in rep_q["outputs"]
    assert rep_c["input_quality"]["rows_null_url"] == 0

    # quarantine parquet holds exactly the planted rows, with reasons
    q = spark.read.parquet(str(tmp_path / "out_q" / "quarantine"))
    got = {(r["url"], r["_reason"]) for r in q.collect()}
    assert got == {(None, "null_url"), ("", "null_url"),
                   ("http://bad.example.com/big", "oversize_text")}

    # sketch outputs byte-equal to the clean-corpus plain run
    with open(tmp_path / "out_q" / "cms_tokens.bin", "rb") as fh:
        cq = fh.read()
    with open(tmp_path / "out_c" / "cms_tokens.bin", "rb") as fh:
        cc = fh.read()
    assert cq == cc

    def states(out, name, key):
        df = spark.read.parquet(str(tmp_path / out / name))
        return sorted((r[key], bytes(r["sketch_state"]))
                      for r in df.collect())

    assert states("out_q", "hll_lang_url", "lang") == \
        states("out_c", "hll_lang_url", "lang")
    assert states("out_q", "bloom_url_shards", "bloom_shard") == \
        states("out_c", "bloom_url_shards", "bloom_shard")


def test_quarantine_reason_without_url_col(spark):
    """url_col=None: text rules only — tables without a url column."""
    df = spark.createDataFrame(
        [("a", "fine"), ("b", None), ("c", "")], "doc_id string, text string")
    clean, bad = split_quarantine(df, url_col=None)
    assert clean.count() == 1  # null AND empty text both quarantined
    assert {r["_reason"] for r in bad.collect()} == {"null_text",
                                                     "empty_text"}


def test_exact_dedup_null_text_rows_survive(spark):
    """Null-text rows must NOT collapse into one null-digest group:
    each keeps its own sentinel digest and survives exact_dedup."""
    from gopie_spark.operators.dedup import exact_dedup
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, None), (4, None),
         (5, None), (6, "other")],
        "doc_id long, text string")
    out = exact_dedup(df)
    ids = sorted(r["doc_id"] for r in out.collect())
    # one survivor of the real dup pair; ALL null rows survive
    assert ids == [1, 3, 4, 5, 6]


def test_filter_corpus_job_quarantine(spark, tmp_path):
    """filter_corpus --quarantine: violators split off before stage 0,
    persisted with reasons next to the output, counted in the report;
    survivors match the clean-source run exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from gopie_spark.sources.pages import generate_pages

    dirty = str(tmp_path / "dirty")
    generate_pages(dirty, 300, n_files=2, seed=31)
    schema = pq.read_schema(os.path.join(dirty, "part-00000.parquet"))
    bad_rows = {
        "url": [None, "http://x.com/nulltext"],
        "warc_ts": [None, None], "html": [None, None],
        "text": ["orphan text with enough tokens to pass quality " * 3,
                 None],
        "lang": ["en", "en"],
    }
    pq.write_table(pa.Table.from_pydict(bad_rows).cast(schema),
                   os.path.join(dirty, "part-00055.parquet"))

    env = dict(os.environ, SPARK_GRAFT_CPUS="8", PYTHONPATH="/root/repo")
    out = str(tmp_path / "curated")
    r = subprocess.run(
        [sys.executable, "jobs/filter_corpus.py", "--input", dirty,
         "--output", out, "--no-dedup", "--min-tokens", "5",
         "--quarantine"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=500)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["quarantined"] == {"null_url": 1, "null_text": 1}
    assert rep["input_rows"] == 300  # stages saw only clean rows

    q = spark.read.parquet(out + ".quarantine")
    assert {(r["url"], r["_reason"]) for r in q.collect()} == {
        (None, "null_url"), ("http://x.com/nulltext", "null_text")}
