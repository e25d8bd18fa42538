"""DSIR-style importance weights for domain mixing — hashed-n-gram
importance resampling per Xie, Santurkar, Ma, Liang, "Data Selection
for Language Models via Importance Resampling" (NeurIPS 2023) — public
literature; the reference has no selection tier.

The question it answers at corpus scale: given a small TARGET sample
(the domain you want more of — curated text, a benchmark's training
split, a vertical) and the RAW web corpus, score every raw document by
how target-like it is, then resample by weight.  DSIR's estimator is a
bag-of-hashed-n-grams multinomial likelihood ratio:

    logw(x) = sum_{f in features(x)} [ ln p_hat(bucket(f))
                                       - ln q_hat(bucket(f)) ]

with features = word unigrams + bigrams, hashed into ``n_buckets``
buckets, and p_hat / q_hat the add-one-smoothed bucket frequencies of
the target / raw corpora.

Scale design (three tiers, mirroring the BPE split):

1. bucket counting (CLUSTER): one Generate + one partial-aggregable
   groupBy per corpus — the shuffle carries (bucket, partial count)
   rows, bounded by ``n_buckets``, never the corpus.
2. the log-ratio table (DRIVER): ``n_buckets`` floats (80 KB at the
   paper's 10k buckets), broadcast in the scoring UDF's closure.
3. scoring (CLUSTER, ZERO-shuffle): per-doc bucket arrays stay JVM
   (tokens -> unigram+bigram buckets via the repo's md5 key rule), the
   Arrow-batched pandas UDF does one np.take + segment-sum per batch —
   no O(n_buckets) Catalyst expression (the add_lm_score isin lesson),
   no join, no per-row Python.

Determinism: bucket ids use the same md5/conv construction as
operators/sampling.py, so DuckDB recomputes identical buckets and the
oracle re-derives the full weight (ln is IEEE double in both engines;
certificates quantize at e4 where the engines' last-ulp ln differences
are ~9 orders of magnitude below the step).  Resampling = compose with
the existing priority_sample (Efraimidis–Spirakis) on exp(logw).
"""
from __future__ import annotations

import math
from typing import Tuple

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

_WS = r"\s+"


def _tokens(text_col: str) -> Column:
    return F.filter(F.split(F.lower(F.trim(F.col(text_col))), _WS),
                    lambda t: t != "")


def _bucket_of(feature: Column, n_buckets: int, seed: int) -> Column:
    """md5-derived bucket id — byte-identical in DuckDB via
    ('0x' || substr(md5(...), 1, 15))::BIGINT % n_buckets.  The 60-bit
    key rule is sampling.sample_key — ONE source for the cross-engine
    hash contract."""
    from gopie_spark.operators.sampling import sample_key
    return F.pmod(sample_key(feature, seed), F.lit(n_buckets))


def doc_feature_buckets(df: DataFrame, text_col: str = "text",
                        n_buckets: int = 10_000,
                        seed: int = 0) -> DataFrame:
    """Adds ``_buckets`` (array<long>): hashed unigram + bigram bucket
    ids per doc, entirely JVM-side."""
    toks = _tokens(text_col)
    base = df.withColumn("_toks", toks)
    unis = F.transform(F.col("_toks"), lambda t:
                       _bucket_of(t, n_buckets, seed))
    n_bi = F.size(F.col("_toks")) - 1
    bis = F.when(
        n_bi >= 1,
        F.transform(F.sequence(F.lit(1), n_bi),
                    lambda i: _bucket_of(
                        F.concat_ws(" ",
                                    F.element_at(F.col("_toks"), i),
                                    F.element_at(F.col("_toks"), i + 1)),
                        n_buckets, seed))
    ).otherwise(F.array().cast("array<bigint>"))
    return base.withColumn("_buckets", F.concat(unis, bis)) \
        .drop("_toks")


def _doc_features(df: DataFrame, text_col: str) -> Column:
    """array<string> of unigram + bigram feature STRINGS per doc."""
    toks = _tokens(text_col)
    base = F.col("_toks")
    n_bi = F.size(base) - 1
    bis = F.when(
        n_bi >= 1,
        F.transform(F.sequence(F.lit(1), n_bi),
                    lambda i: F.concat_ws(
                        " ", F.element_at(base, i),
                        F.element_at(base, i + 1)))
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(base, bis)


def _exploded_features(df: DataFrame, text_col: str,
                       extra_cols: tuple = ()) -> DataFrame:
    toks = _tokens(text_col)
    return (df.filter(F.col(text_col).isNotNull())
            .withColumn("_toks", toks)
            .select(*extra_cols,
                    F.explode(_doc_features(df, text_col)).alias("_f")))


def bucket_counts(df: DataFrame, text_col: str = "text",
                  n_buckets: int = 10_000, seed: int = 0) -> DataFrame:
    """(bucket, cnt) histogram of hashed features.

    Hash-per-DISTINCT-feature, not per instance: the feature strings
    go through a partial-aggregable count first (map-side combine
    collapses the Zipf head before the shuffle — the same wordcount
    pre-agg the token CMS uses), and md5 runs on the reduced distinct
    rows only.  At web scale distinct n-grams are orders of magnitude
    fewer than instances; on the sf0.1 bench this cut the md5 work
    ~7000x."""
    per_feature = (_exploded_features(df, text_col)
                   .groupBy("_f").agg(F.count("*").alias("cnt")))
    return (per_feature
            .select(_bucket_of(F.col("_f"), n_buckets, seed)
                    .alias("bucket"), "cnt")
            .groupBy("bucket").agg(F.sum("cnt").alias("cnt")))


def _log_prob_table(counts: DataFrame, n_buckets: int) -> np.ndarray:
    """Driver-side smoothed log-probability vector (add-one)."""
    vec = np.zeros(n_buckets, dtype=np.float64)
    for r in counts.collect():
        vec[int(r["bucket"])] = float(r["cnt"])
    total = vec.sum() + n_buckets
    return np.log(vec + 1.0) - math.log(total)


def dsir_weights(raw: DataFrame, target: DataFrame,
                 text_col: str = "text", n_buckets: int = 10_000,
                 seed: int = 0,
                 out_col: str = "dsir_logweight") -> DataFrame:
    """raw + ``out_col``: per-document log importance weight
    ln p_target(x) - ln q_raw(x) under the hashed-n-gram multinomials.
    Positive = more target-like than raw-average."""
    logp = _log_prob_table(
        bucket_counts(target, text_col, n_buckets, seed), n_buckets)
    logq = _log_prob_table(
        bucket_counts(raw, text_col, n_buckets, seed), n_buckets)
    ratio = logp - logq

    @F.pandas_udf("double")
    def score(buckets: pd.Series) -> pd.Series:
        r = ratio

        def one(b):
            if b is None or len(b) == 0:
                return 0.0
            return float(np.take(r, np.asarray(b, dtype=np.int64)).sum())

        return buckets.map(one)

    scored = doc_feature_buckets(raw, text_col, n_buckets, seed)
    return scored.withColumn(out_col, score(F.col("_buckets"))) \
        .drop("_buckets")


def dsir_weights_within(df: DataFrame, target_cond: Column,
                        text_col: str = "text",
                        n_buckets: int = 10_000, seed: int = 0,
                        out_col: str = "dsir_logweight") -> DataFrame:
    """One-pass variant for the common case target ⊆ raw (the target
    is a labeled subset of the same corpus, e.g. lang/source/quality
    flag): ONE feature-hash aggregation computes both histograms
    (count(*) and count_if(target)), halving the md5 work of the
    two-corpus path.  Identical weights to
    ``dsir_weights(df, df.filter(target_cond))``."""
    per_feature = (_exploded_features(
        df.withColumn("_is_tgt", target_cond), text_col, ("_is_tgt",))
        .groupBy("_f")
        .agg(F.count("*").alias("rc"),
             F.count(F.when(F.col("_is_tgt"), 1)).alias("tc")))
    both = (per_feature
            .select(_bucket_of(F.col("_f"), n_buckets, seed)
                    .alias("bucket"), "rc", "tc")
            .groupBy("bucket")
            .agg(F.sum("rc").alias("raw_cnt"),
                 F.sum("tc").alias("tgt_cnt")))
    raw_vec = np.zeros(n_buckets, dtype=np.float64)
    tgt_vec = np.zeros(n_buckets, dtype=np.float64)
    for r in both.collect():
        raw_vec[int(r["bucket"])] = float(r["raw_cnt"])
        tgt_vec[int(r["bucket"])] = float(r["tgt_cnt"])
    logq = np.log(raw_vec + 1.0) - math.log(raw_vec.sum() + n_buckets)
    logp = np.log(tgt_vec + 1.0) - math.log(tgt_vec.sum() + n_buckets)
    ratio = logp - logq

    @F.pandas_udf("double")
    def score(buckets: pd.Series) -> pd.Series:
        r = ratio

        def one(b):
            if b is None or len(b) == 0:
                return 0.0
            return float(np.take(r, np.asarray(b, dtype=np.int64)).sum())

        return buckets.map(one)

    scored = doc_feature_buckets(df, text_col, n_buckets, seed)
    return scored.withColumn(out_col, score(F.col("_buckets"))) \
        .drop("_buckets")


def oracle_dsir_sql(raw_where: str, target_where: str,
                    n_buckets: int = 10_000, seed: int = 0,
                    table: str = "documents",
                    id_sql: str = "doc_id") -> Tuple[str, str]:
    """(CTE prelude, weight expression) for the DuckDB oracle — bucket
    ids, smoothed log tables, and the per-doc sum re-derived from the
    same md5 rule.  Returns SQL that yields (doc_id, logweight)."""
    feats = f"""
        toks AS (
            SELECT {id_sql} AS _id,
                   list_filter(string_split_regex(lower(trim(text)),
                                                  '\\s+'),
                               x -> x <> '') AS t,
                   {raw_where} AS _is_raw, {target_where} AS _is_tgt
            FROM {table} WHERE text IS NOT NULL
        ), feats AS (
            SELECT _id, _is_raw, _is_tgt, t[i] AS f
            FROM toks, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) g
            UNION ALL
            SELECT _id, _is_raw, _is_tgt, t[i] || ' ' || t[i + 1]
            FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) g
        ), fb AS (
            SELECT _id, _is_raw, _is_tgt,
                   (('0x' || substr(md5('{seed}|' || f), 1, 15))::BIGINT)
                   % {n_buckets} AS bucket
            FROM feats
        ), tgt AS (
            SELECT bucket, count(*) AS c FROM fb WHERE _is_tgt
            GROUP BY bucket
        ), raw AS (
            SELECT bucket, count(*) AS c FROM fb WHERE _is_raw
            GROUP BY bucket
        ), totals AS (
            SELECT (SELECT coalesce(sum(c), 0) FROM tgt) + {n_buckets}
                       AS tgt_total,
                   (SELECT coalesce(sum(c), 0) FROM raw) + {n_buckets}
                       AS raw_total
        )"""
    weight = f"""(
        SELECT sum(ln(coalesce(tgt.c, 0) + 1.0)
                   - ln((SELECT tgt_total FROM totals))
                   - ln(coalesce(raw.c, 0) + 1.0)
                   + ln((SELECT raw_total FROM totals)))
        FROM fb
        LEFT JOIN tgt ON tgt.bucket = fb.bucket
        LEFT JOIN raw ON raw.bucket = fb.bucket
        WHERE fb._id = d._id AND fb._is_raw
    )"""
    return feats, weight
