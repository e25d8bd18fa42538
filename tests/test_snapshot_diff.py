"""Persisted drift states + the Spark-free snapshot diff
(operators/drift.py persist/load/from-states, jobs/snapshot_diff.py,
jobs/build_sketches.py --drift-states): two snapshots persisted once
are compared forever after with zero Spark and zero corpus reads, and
the persisted-states report is IDENTICAL to the live drift_report."""
import json
import os
import subprocess
import sys

import pytest

from pyspark.sql import functions as F

from gopie_spark.operators.drift import (drift_report,
                                         drift_report_from_states,
                                         load_drift_states,
                                         persist_drift_states)


def _snapshots(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (d.filter(F.pmod(F.col("doc_id"), F.lit(10)) < 7),
            d.filter(F.pmod(F.col("doc_id"), F.lit(10)) >= 3))


def test_persisted_states_report_equals_live(spark, sf_dir, tmp_path):
    """The from-states report over persisted directories must equal the
    live drift_report over the raw frames — same builds, same algebra,
    one shared formatter (documents has no url column, so the report
    exercises the graceful no-urls degradation on both paths)."""
    df_a, df_b = _snapshots(spark, sf_dir)
    dir_a, dir_b = str(tmp_path / "a"), str(tmp_path / "b")
    wrote_a = persist_drift_states(df_a, dir_a)
    wrote_b = persist_drift_states(df_b, dir_b)
    # no url column in documents -> no theta blob; lang persisted
    assert "theta" not in wrote_a and "lang" in wrote_a

    live = drift_report(df_a, df_b, lang_col="lang")
    from_states = drift_report_from_states(load_drift_states(dir_a),
                                           load_drift_states(dir_b))
    assert from_states == live
    assert "urls" not in from_states and "languages" in from_states


def test_persisted_states_url_section(spark, tmp_path):
    """With a url column the theta blob is persisted and the report's
    URL-set algebra matches the live path exactly."""
    from gopie_spark.sources.pages import generate_pages

    src = str(tmp_path / "pages")
    generate_pages(src, 600, n_files=2, seed=23)
    pages = spark.read.parquet(src)
    df_a = pages.filter(F.crc32(F.col("url")) % 10 < 7)
    df_b = pages.filter(F.crc32(F.col("url")) % 10 >= 3)
    dir_a, dir_b = str(tmp_path / "a"), str(tmp_path / "b")
    persist_drift_states(df_a, dir_a)
    persist_drift_states(df_b, dir_b)

    live = drift_report(df_a, df_b, url_col="url")
    from_states = drift_report_from_states(load_drift_states(dir_a),
                                           load_drift_states(dir_b))
    assert from_states == live
    assert from_states["urls"]["n_union_est"] > 0


def test_param_mismatch_refused(spark, sf_dir, tmp_path):
    """Snapshots persisted with different kernel parameters must be
    refused with the offending section + parameter named — BEFORE any
    algebra runs (misaligned cells would otherwise produce silently
    wrong deltas for Misra-Gries, whose states merge at any k)."""
    df_a, df_b = _snapshots(spark, sf_dir)
    dir_a, dir_b = str(tmp_path / "a"), str(tmp_path / "b")
    persist_drift_states(df_a, dir_a, cs_width=4096)
    persist_drift_states(df_b, dir_b, cs_width=8192)
    with pytest.raises(ValueError, match="cs: width mismatch"):
        drift_report_from_states(load_drift_states(dir_a),
                                 load_drift_states(dir_b))
    dir_c, dir_d = str(tmp_path / "c"), str(tmp_path / "d")
    persist_drift_states(df_a, dir_c, mg_k=128)
    persist_drift_states(df_b, dir_d, mg_k=256)
    with pytest.raises(ValueError, match="mg: k mismatch"):
        drift_report_from_states(load_drift_states(dir_c),
                                 load_drift_states(dir_d))


def test_snapshot_diff_job_is_spark_free(spark, sf_dir, tmp_path):
    """jobs/snapshot_diff.py as a black box, run with JAVA_HOME pointed
    at a nonexistent directory — any attempt to start a JVM would fail,
    so a green run PROVES the diff needs no Spark.  Its output must
    equal the in-process from-states report byte-for-byte."""
    df_a, df_b = _snapshots(spark, sf_dir)
    dir_a, dir_b = str(tmp_path / "a"), str(tmp_path / "b")
    persist_drift_states(df_a, dir_a)
    persist_drift_states(df_b, dir_b)
    out = str(tmp_path / "report.json")

    env = dict(os.environ, PYTHONPATH="/root/repo",
               JAVA_HOME=str(tmp_path / "no_jvm_here"),
               SPARK_HOME=str(tmp_path / "no_spark_here"))
    r = subprocess.run(
        [sys.executable, "jobs/snapshot_diff.py",
         "--a", dir_a, "--b", dir_b, "--out", out],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads(r.stdout.strip().splitlines()[-1])
    with open(out) as fh:
        assert json.load(fh) == report

    expected = drift_report_from_states(load_drift_states(dir_a),
                                        load_drift_states(dir_b))
    assert report == json.loads(json.dumps(expected))


def test_build_sketches_drift_states_flag(spark, tmp_path):
    """--drift-states persists a diffable directory; the states are
    byte-equal to direct persist_drift_states over the same input."""
    from gopie_spark.sources.pages import generate_pages

    src = str(tmp_path / "pages")
    generate_pages(src, 500, n_files=2, seed=29)
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    env = dict(os.environ, SPARK_GRAFT_CPUS="8", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "jobs/build_sketches.py", "--input", src,
         "--checkpoint", ckpt, "--output", out, "--hll-p", "11",
         "--n-buckets", "8", "--drift-states"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=500)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert "drift" in rep["outputs"]

    direct = str(tmp_path / "direct")
    persist_drift_states(spark.read.parquet(src), direct)
    for fname in os.listdir(direct):
        with open(os.path.join(direct, fname), "rb") as fh:
            want = fh.read()
        with open(os.path.join(out, "drift", fname), "rb") as fh:
            assert fh.read() == want, fname
