"""Resume gate (BASELINE.md): interrupted + resumed build is byte-identical
to an uninterrupted one, with per-bucket lineage and metrics."""

import json
import os

import pytest

from gopie_spark.kernels import HLL
from gopie_spark.operators.sketch_agg import STATE_COL, sketch_agg
from gopie_spark.plans.checkpoint import SketchCheckpoint
from gopie_spark.sources.pages import generate_pages


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages")
    return generate_pages(str(d), 3000, n_files=8, seed=3)


def _states(df):
    return {tuple(r[k] for k in df.columns if k != STATE_COL):
            bytes(r[STATE_COL]) for r in df.collect()}


def test_resume_byte_identical(spark, pages_dir, tmp_path):
    hll = HLL(p=12)
    # uninterrupted direct build (no checkpointing)
    direct = sketch_agg(spark.read.parquet(pages_dir)
                        .select("lang", "url"), ["lang"], "url", hll)
    want = _states(direct)

    # interrupted: process only 3 buckets, "crash", then resume fully
    ckpt = SketchCheckpoint(str(tmp_path / "ck"), hll, ["lang"], "url",
                            n_buckets=8)
    n1 = ckpt.run_partials(spark, pages_dir, max_buckets=3)
    assert 0 < n1 <= 3
    done_after_crash = ckpt.done_buckets(spark)
    assert len(done_after_crash) == n1

    ckpt.run_until_complete(spark, pages_dir)
    got = _states(ckpt.finalize(spark))
    assert got == want

    # resume on completed checkpoint is a no-op
    assert ckpt.run_partials(spark, pages_dir) == 0


def test_lineage_and_metrics_written(spark, pages_dir, tmp_path):
    hll = HLL(p=10)
    ckpt = SketchCheckpoint(str(tmp_path / "ck2"), hll, [], "url",
                            n_buckets=4)
    ckpt.run_until_complete(spark, pages_dir)
    runs = open(str(tmp_path / "ck2" / "MANIFEST")).read().split()
    assert runs
    lineage_files = os.listdir(str(tmp_path / "ck2" / "lineage"))
    assert len(lineage_files) == len(runs)
    lin = json.load(open(str(tmp_path / "ck2" / "lineage" /
                             f"run={runs[0]}.json")))
    assert lin["rows"] > 0 and lin["buckets"] and lin["files"]
    metrics = [json.loads(l) for l in
               open(str(tmp_path / "ck2" / "metrics.jsonl"))]
    import glob
    files = sorted(glob.glob(f"{pages_dir}/*.parquet"))
    n_used_buckets = len(set(ckpt.bucket_of_files(files).values()))
    assert sum(m["n_buckets"] for m in metrics) == n_used_buckets


def test_bucket_assignment_stable(spark, pages_dir, tmp_path):
    hll = HLL(p=10)
    a = SketchCheckpoint(str(tmp_path / "a"), hll, [], "url", n_buckets=16)
    b = SketchCheckpoint(str(tmp_path / "b"), hll, [], "url", n_buckets=16)
    import glob
    files = sorted(glob.glob(f"{pages_dir}/*.parquet"))
    assert a.bucket_of_files(files) == b.bucket_of_files(files)


def test_resume_over_rewritten_input_refused(spark, tmp_path):
    """Resuming a checkpoint after the input dir was REWRITTEN (fresh
    part-file names) must be refused: new files can hash to 'done'
    bucket ids (rows silently skipped) while committed partials still
    carry the old files' rows (double count at finalize)."""
    from pyspark.sql import functions as F
    hll = HLL(p=12)
    src = str(tmp_path / "in")
    df = (spark.range(2000)
          .select(F.concat(F.lit("u"), "id").alias("url"),
                  (F.col("id") % 3).cast("string").alias("lang")))
    df.repartition(6).write.mode("overwrite").parquet(src)

    ckpt = SketchCheckpoint(str(tmp_path / "ck"), hll, ["lang"], "url",
                            n_buckets=4)
    assert ckpt.run_partials(spark, src, max_buckets=2) > 0

    # same rows, rewritten dir -> new part-file basenames
    df.repartition(6).write.mode("overwrite").parquet(src)
    with pytest.raises(ValueError, match="different input listing"):
        ckpt.run_partials(spark, src)

    # an UNCHANGED listing still resumes (control)
    ck2 = SketchCheckpoint(str(tmp_path / "ck2"), hll, ["lang"], "url",
                           n_buckets=4)
    assert ck2.run_partials(spark, src, max_buckets=2) > 0
    ck2.run_until_complete(spark, src)
    assert ck2.run_partials(spark, src) == 0
