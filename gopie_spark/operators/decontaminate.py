"""Eval-set decontamination: flag training documents that share word
n-grams with a (small) evaluation/benchmark set.

The standard LLM-training-pipeline contamination check (n-gram overlap a
la GPT-3 appendix C / Dolma): the eval set is tiny (10^3..10^6 docs),
the training corpus is the 10^12-doc table — so the only scale-correct
shape is

1. build ONE small Bloom filter over the eval set's shingle hashes
   (distributed flat-batch build, one blob to the driver, broadcast);
2. probe every training doc's shingle hashes against the broadcast blob
   in a single scan — no shuffle, no join, no gram strings materialized;
   Bloom has no false negatives, so the surviving candidate set is a
   strict superset of the truly contaminated docs;
3. exact-verify ONLY the candidates (normally a vanishing fraction):
   explode their n-gram *strings* JVM-side (Catalyst transform/slice/
   array_join — no Python) and broadcast-join against the distinct eval
   gram strings, counting distinct matched grams per doc.

The result is exactly equal to the all-exact computation (step 2 never
drops a true match; step 3 removes every Bloom/hash-collision false
positive), which is what the DuckDB oracle recomputes.

Tokenization contract (mirrored by the oracle SQL): whitespace-split of
``lower(trim(text))``; a doc with fewer than ``n`` tokens has no
n-grams.  The Bloom gate hashes shingles of the *same* lowercased token
stream (pyarrow ``utf8_lower`` — ASCII-identical to Spark's ``lower``;
exotic non-ASCII case folds could differ only toward extra candidates,
never lost matches, because both gate sides use the same fold).

No reference analog (gopie has no corpus ops); the Bloom kernel is
`kernels/bloom.py` (reference parity per /root/reference/pkg/bloom/).
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (BinaryType, LongType, StructField,
                               StructType)

from gopie_spark.kernels.bloom import BloomBit
from gopie_spark.kernels.minhash import shingle_hashes_flat

STATE_COL = "sketch_state"


def _lower_flat_token_hashes(texts: pd.Series):
    """``dedup._flat_token_hashes`` over ``lower(trim(text))``: one Arrow
    lowercase pass, one regex split, one vectorized FNV pass — no
    per-document Python."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from gopie_spark.kernels.hashes import fnv1_64_values

    arr = pc.utf8_lower(pa.Array.from_pandas(texts.fillna("")))
    tok = pc.split_pattern_regex(arr, r"\s+")
    flat = pc.list_flatten(tok)
    lens = pc.list_value_length(tok).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    hashes = fnv1_64_values(flat)[nonempty]
    doc_of = np.repeat(np.arange(len(texts)), lens)
    ne_lens = np.bincount(doc_of[nonempty], minlength=len(texts)) \
        .astype(np.int64)
    return hashes, ne_lens


def _strict_gram_hashes(texts: pd.Series, n: int):
    """Flat shingle hashes + per-doc counts, STRICT n-grams only (docs
    shorter than ``n`` tokens contribute nothing — matching the exact
    tier; ``shingle_hashes_flat``'s short-doc single-shingle convention
    is masked out)."""
    tok_h, lens = _lower_flat_token_hashes(texts)
    sh, sh_lens = shingle_hashes_flat(tok_h, lens, n)
    short = lens < n
    if short.any():
        keep = np.repeat(~short, sh_lens)
        sh = sh[keep]
        sh_lens = np.where(short, 0, sh_lens)
    return sh, sh_lens


def ngram_strings(text_col, n: int):
    """``array<string>`` of word n-grams of ``lower(trim(text))`` — pure
    Catalyst (split/transform/slice/array_join), no Python.  Empty array
    when the doc has fewer than ``n`` tokens."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    t = F.split(F.lower(F.trim(c)), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - n + 1),
        lambda i: F.array_join(F.slice(t, i, n), " "))
    return F.when(F.size(t) >= n, grams) \
        .otherwise(F.array().cast("array<string>"))


def build_eval_gram_filter(eval_df: DataFrame, text_col: str = "text",
                           n: int = 8, p: float = 1e-6,
                           expected_grams: Optional[int] = None,
                           ) -> Tuple[BloomBit, bytes]:
    """Distributed Bloom build over the eval set's strict-n-gram shingle
    hashes: one partial blob per partition batch, merged to one state.

    Sizing: ``expected_grams`` or a one-pass JVM aggregate of
    ``max(tokens - n + 1, 0)`` over the eval set (footer-cheap at eval
    scale).  Returns ``(kernel, serialized state)`` — the blob is what
    you broadcast.
    """
    if expected_grams is None:
        from gopie_spark.operators.textstats import token_count
        row = eval_df.select(
            F.sum(F.greatest(token_count(text_col) - n + 1, F.lit(0)))
            .alias("g")).collect()
        expected_grams = int(row[0]["g"] or 0)
    sketch = BloomBit.from_guess(max(expected_grams, 64), p)
    schema = StructType([StructField(STATE_COL, BinaryType(), False)])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state = None
        for pdf in batches:
            if pdf.empty:
                continue
            sh, _ = _strict_gram_hashes(pdf[text_col], n)
            if sh.size == 0:
                continue
            if state is None:
                state = sketch.zero()
            sketch.update(state, sh)
        if state is not None:
            yield pd.DataFrame({STATE_COL: [sketch.serialize(state)]})

    partials = eval_df.select(text_col).mapInPandas(fn, schema).collect()
    state = sketch.zero()
    for row in partials:
        state = sketch.merge(state, sketch.deserialize(bytes(row[0])))
    return sketch, sketch.serialize(state)


def add_contamination_hits(train_df: DataFrame, sketch: BloomBit,
                           state_blob: bytes, text_col: str = "text",
                           n: int = 8,
                           out_col: str = "bloom_gram_hits") -> DataFrame:
    """One-scan Bloom gate: per doc, how many of its shingle-hash
    occurrences hit the broadcast eval filter.  A doc with ``m`` distinct
    truly-matching grams always reports ``>= m`` (no false negatives),
    so ``filter(out_col >= min_hits)`` is a sound candidate gate."""
    spark = train_df.sparkSession
    bc = spark.sparkContext.broadcast(state_blob)
    schema = StructType(train_df.schema.fields +
                        [StructField(out_col, LongType(), False)])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state = sketch.deserialize(bc.value)
        for pdf in batches:
            if pdf.empty:
                yield pdf.assign(**{out_col: pd.Series([], dtype="int64")})
                continue
            sh, sh_lens = _strict_gram_hashes(pdf[text_col], n)
            hits = np.zeros(len(pdf), dtype=np.int64)
            if sh.size:
                member = sketch.exist(state, sh)
                doc_of = np.repeat(np.arange(len(pdf)), sh_lens)
                hits = np.bincount(doc_of, weights=member,
                                   minlength=len(pdf)).astype(np.int64)
            out = pdf.copy()
            out[out_col] = pd.Series(hits, index=pdf.index, dtype="int64")
            yield out

    return train_df.mapInPandas(fn, schema)


def decontaminate(train_df: DataFrame, eval_df: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 8, min_hits: int = 1,
                  p: float = 1e-6) -> DataFrame:
    """Contaminated-doc report: ``DataFrame[id_col, n_matched]`` where
    ``n_matched`` = COUNT(DISTINCT n-grams shared with the eval set),
    filtered to ``n_matched >= min_hits`` — exactly equal to the
    all-exact n-gram join (Bloom gate is superset; exact verify removes
    its false positives)."""
    sketch, blob = build_eval_gram_filter(eval_df, text_col, n=n, p=p)
    cand = add_contamination_hits(train_df, sketch, blob, text_col, n=n) \
        .filter(F.col("bloom_gram_hits") >= min_hits)
    eval_grams = eval_df.select(
        F.explode(ngram_strings(text_col, n)).alias("g")).distinct()
    cand_grams = cand.select(
        F.col(id_col), F.explode(ngram_strings(text_col, n)).alias("g"))
    return (cand_grams
            .join(F.broadcast(eval_grams), "g")
            .groupBy(id_col)
            .agg(F.countDistinct("g").alias("n_matched"))
            .filter(F.col("n_matched") >= min_hits))


def decontaminate_keep(train_df: DataFrame, eval_df: DataFrame,
                       id_col: str = "doc_id", text_col: str = "text",
                       n: int = 8, min_hits: int = 1,
                       p: float = 1e-6) -> DataFrame:
    """Training docs that SURVIVE decontamination (left-anti join against
    the flagged ids — broadcastable: the flagged set is candidate-sized)."""
    flagged = decontaminate(train_df, eval_df, id_col, text_col,
                            n=n, min_hits=min_hits, p=p) \
        .select(id_col)
    return train_df.join(F.broadcast(flagged), id_col, "left_anti")


def contamination_overlap(train_df: DataFrame, eval_df: DataFrame,
                          id_col: str = "doc_id", text_col: str = "text",
                          n: int = 8, p: float = 1e-6) -> DataFrame:
    """Per-document n-gram overlap REPORT vs the eval set — the
    fuzzy-decontamination measure (GPT-3 appendix C / Dolma style): for
    every training doc,

    - ``n_grams``  = COUNT(DISTINCT word n-grams of the doc), and
    - ``n_matched`` = how many of those appear in the eval set,

    so ``n_matched / n_grams`` is the contaminated fraction a threshold
    policy filters on (:func:`decontaminate_overlap_keep`).  Exactly
    equal to the all-exact computation at any Bloom size.

    Scale shape: ``n_grams`` is per-row Catalyst
    (``array_size(array_distinct(...))`` — zero shuffle for 10^12
    docs); ``n_matched`` reuses the broadcast-Bloom gate + exact-verify
    pipeline of :func:`decontaminate`, so the distinct-count
    aggregation runs only over the (normally vanishing) candidate set;
    the final report is a broadcast left join of the candidate counts
    back onto the train table.
    """
    sketch, blob = build_eval_gram_filter(eval_df, text_col, n=n, p=p)
    cand = add_contamination_hits(train_df, sketch, blob, text_col,
                                  n=n).filter(F.col("bloom_gram_hits") >= 1)
    eval_grams = eval_df.select(
        F.explode(ngram_strings(text_col, n)).alias("g")).distinct()
    matched = (cand.select(F.col(id_col),
                           F.explode(ngram_strings(text_col, n))
                           .alias("g"))
               .join(F.broadcast(eval_grams), "g")
               .groupBy(id_col)
               .agg(F.countDistinct("g").alias("n_matched")))
    base = train_df.select(
        F.col(id_col),
        F.coalesce(F.array_size(F.array_distinct(
            ngram_strings(text_col, n))), F.lit(0)).cast("long")
        .alias("n_grams"))
    return (base.join(F.broadcast(matched), id_col, "left")
            .withColumn("n_matched",
                        F.coalesce("n_matched", F.lit(0)).cast("long")))


def decontaminate_overlap_keep(train_df: DataFrame, eval_df: DataFrame,
                               max_frac: float = 0.1,
                               id_col: str = "doc_id",
                               text_col: str = "text", n: int = 8,
                               p: float = 1e-6) -> DataFrame:
    """Training docs surviving the overlap-fraction policy: drop a doc
    when ``n_matched / n_grams >= max_frac`` (docs with no n-grams have
    nothing to match and always survive).  The complement of the exact
    threshold rule — a strictly weaker cut than :func:`decontaminate_keep`
    with ``min_hits=1`` and the knob real pipelines tune."""
    ov = contamination_overlap(train_df, eval_df, id_col, text_col,
                               n=n, p=p)
    flagged = (ov.filter((F.col("n_grams") > 0)
                         & (F.col("n_matched")
                            >= F.lit(max_frac) * F.col("n_grams")))
               .select(id_col))
    return train_df.join(F.broadcast(flagged), id_col, "left_anti")
