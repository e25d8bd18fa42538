"""DSIR importance weights (operators/dsir.py).

Gates: one-pass flagged variant == two-corpus variant exactly; weights
recomputed by a serial NumPy/Python reference over the same md5 bucket
rule; direction sanity (target-lang docs score higher on average);
composition with priority_sample; plan gates (count aggregation is
partial-aggregable + text-only scan; scoring adds no Exchange)."""
import hashlib
import math
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from gopie_spark.operators.dsir import (bucket_counts,
                                        dsir_weights,
                                        dsir_weights_within)

B, SEED = 512, 0


def _ref_bucket(feature: str) -> int:
    h = hashlib.md5(f"{SEED}|{feature}".encode()).hexdigest()
    return int(h[:15], 16) % B


def _ref_features(text: str):
    toks = [t for t in text.strip().lower().split() if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _ref_weights(rows, target_langs):
    """rows: (doc_id, text, lang).  Returns {doc_id: logweight}."""
    raw_c, tgt_c = Counter(), Counter()
    feats = {}
    for did, text, lang in rows:
        if text is None:
            continue
        bs = [_ref_bucket(f) for f in _ref_features(text)]
        feats[did] = bs
        raw_c.update(bs)
        if lang in target_langs:
            tgt_c.update(bs)
    t_tot = sum(tgt_c.values()) + B
    r_tot = sum(raw_c.values()) + B
    out = {}
    for did, text, lang in rows:
        bs = feats.get(did, [])
        out[did] = sum(
            math.log(tgt_c[b] + 1.0) - math.log(t_tot)
            - math.log(raw_c[b] + 1.0) + math.log(r_tot) for b in bs)
    return out


def test_weights_match_serial_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {r["doc_id"]: r["dsir_logweight"] for r in
           dsir_weights_within(docs, F.col("lang") == "en",
                               n_buckets=B, seed=SEED).collect()}
    rows = [(r["doc_id"], r["text"], r["lang"]) for r in docs.collect()]
    want = _ref_weights(rows, {"en"})
    assert set(got) == set(want)
    for did in got:
        assert abs(got[did] - want[did]) < 1e-9, did


def test_flagged_equals_two_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    one = {r["doc_id"]: r["dsir_logweight"] for r in
           dsir_weights_within(docs, F.col("lang") == "en",
                               n_buckets=B, seed=SEED).collect()}
    two = {r["doc_id"]: r["dsir_logweight"] for r in
           dsir_weights(docs, docs.filter(F.col("lang") == "en"),
                        n_buckets=B, seed=SEED).collect()}
    assert one == two


def test_direction_and_resampling(spark, sf_dir):
    """en docs average weight > non-en (the whole point); resampling by
    exp(weight) via the existing priority sampler over-represents en."""
    from gopie_spark.operators.sampling import priority_sample
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .filter(F.col("text").isNotNull())
    w = dsir_weights_within(docs, F.col("lang") == "en",
                            n_buckets=B, seed=SEED)
    means = {r["l"]: r["m"] for r in w.groupBy(
        (F.col("lang") == "en").alias("l"))
        .agg(F.avg("dsir_logweight").alias("m")).collect()}
    assert means[True] > means[False]
    n_en_all = docs.filter(F.col("lang") == "en").count()
    n_all = docs.count()
    picked = priority_sample(
        w.withColumn("_w", F.exp(F.col("dsir_logweight"))),
        "_w", 100, seed=11)
    n_en = picked.filter(F.col("lang") == "en").count()
    assert n_en / 100 > n_en_all / n_all  # over-represented


def test_null_and_empty_text(spark):
    docs = spark.createDataFrame(
        [(1, "hello world", "en"), (2, None, "de"), (3, "   ", "de"),
         (4, "guten tag welt", "de")],
        "doc_id long, text string, lang string")
    w = {r["doc_id"]: r["dsir_logweight"] for r in
         dsir_weights_within(docs, F.col("lang") == "en",
                             n_buckets=B, seed=SEED).collect()}
    assert w[2] == 0.0 and w[3] == 0.0
    assert w[1] > 0.0 > w[4]  # target-like up, off-target down


def test_curate_dsir_stage(spark, sf_dir):
    """curate(dsir_target=...) stamps dsir_logweight on survivors and
    (with a threshold) cuts + counts the stage; the baseline stage
    counts are unchanged by the stamp-only mode."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "jobs"))
    from filter_corpus import curate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .withColumn("url", F.concat(F.lit("https://h"),
                                    (F.col("doc_id") % 7).cast("string"),
                                    F.lit(".example.com/"),
                                    F.col("doc_id").cast("string")))
    base, base_rep = curate(spark, docs, near_dedup=False)
    stamped, rep = curate(spark, docs, near_dedup=False,
                          dsir_target="lang = 'en'", dsir_buckets=512)
    assert "dsir_logweight" in stamped.columns
    assert rep["after_exact_dedup"] == base_rep["after_exact_dedup"]
    assert stamped.count() == base.count()  # stamp-only: no cut
    cut, rep2 = curate(spark, docs, near_dedup=False,
                       dsir_target="lang = 'en'", dsir_buckets=512,
                       dsir_min_weight=0.0)
    assert rep2["after_dsir"] == rep2["output_rows"] <= \
        rep["output_rows"]
    assert cut.filter(F.col("dsir_logweight") < 0.0).count() == 0
    # the kept set over-represents the target lang vs pre-cut
    frac = (cut.filter(F.col("lang") == "en").count() /
            max(rep2["after_dsir"], 1))
    frac0 = (stamped.filter(F.col("lang") == "en").count() /
             max(stamped.count(), 1))
    assert frac >= frac0


def test_dsir_plan_gates(spark, sf_dir):
    """Count agg: partial-aggregable, text-only scan.  Scoring: no
    Exchange below the pandas UDF (zero-shuffle)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = bucket_counts(docs, n_buckets=B)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "partial" in plan.lower()
    scan = plan[plan.index("Scan parquet"):]
    rs = [ln for ln in scan.splitlines() if "ReadSchema" in ln][0]
    assert "text" in rs and "lang" not in rs and "doc_id" not in rs
    scored = dsir_weights_within(docs, F.col("lang") == "en",
                                 n_buckets=B, seed=SEED)
    plan2 = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan2
