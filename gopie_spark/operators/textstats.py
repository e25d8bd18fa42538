"""Text analysis operators for training-data pipelines.

All hot-path expressions are Spark built-ins (whole-stage codegen);
language-ID is the one Arrow-batched pandas UDF (character n-gram
heuristic — inherently not a SQL expression).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import StringType

# -- token counting ----------------------------------------------------------

_WS = r"\s+"
# BPE-ish word/number/punct segmentation (public GPT-2-style pattern family,
# simplified to RE2-compatible syntax)
_BPE_ISH = r"[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]+"


def token_count(col, pattern: str = _WS) -> Column:
    """Whitespace token count — pure built-ins.

    Uses regexp_count(separators)+1 instead of size(split(...)): counting
    separators never materializes the token array, which matters when the
    text column is hundreds of bytes x 10^12 rows."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)) \
        .otherwise(F.regexp_count(trimmed, F.lit(pattern)) + 1)


def bpe_ish_token_count(col) -> Column:
    """Sub-word-ish token count via regexp segmentation (built-in
    regexp_count — stays JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(_BPE_ISH))


# -- quality scoring ----------------------------------------------------------

STOPWORDS = ["the", "of", "and", "to", "in", "a", "is", "that", "for", "it",
             "was", "on", "are", "as", "with", "at", "be", "by", "this"]


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds length/punctuation/stopword/alpha features — all built-ins:

    - n_chars_calc, n_tokens, mean_token_len
    - punct_ratio:   punctuation chars / chars
    - alpha_ratio:   alphabetic chars / chars
    - stopword_ratio: stopword tokens / tokens (lowercased)
    - quality_score: monotone combination in [0,1]
    """
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = token_count(text_col)
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()\[\]{}-]", ""))
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    lower_toks = F.split(F.lower(F.trim(c)), _WS)
    stop_hits = F.size(F.filter(lower_toks, lambda t: t.isin(STOPWORDS)))
    safe_tokens = F.greatest(n_tokens, F.lit(1))
    safe_chars = F.greatest(n_chars, F.lit(1))
    punct_ratio = punct / safe_chars
    alpha_ratio = alpha / safe_chars
    stop_ratio = stop_hits / safe_tokens
    mean_tok = n_chars / safe_tokens
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.3
        + F.least(alpha_ratio * F.lit(1.25), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(4.0), F.lit(1.0))) * 0.2
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.1
    )
    return (df.withColumn("n_chars_calc", n_chars)
            .withColumn("n_tokens", n_tokens)
            .withColumn("mean_token_len", mean_tok)
            .withColumn("punct_ratio", punct_ratio)
            .withColumn("alpha_ratio", alpha_ratio)
            .withColumn("stopword_ratio", stop_ratio)
            .withColumn("quality_score", score))


# -- document fingerprinting ---------------------------------------------------

def content_fingerprint(col) -> Column:
    """Normalized-content digest (md5 of lowercased, whitespace-collapsed
    text) — the exact-dedup key; SQL-expressible on both Spark and DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.regexp_replace(c, r"\s+", " ")))


def rolling_fingerprint(df: DataFrame, text_col: str = "text",
                        out_col: str = "rolling_fp",
                        window: int = 8) -> DataFrame:
    """Winnowing-style rolling-hash fingerprint: min uint64 over the
    hashes of all token ``window``-grams (robust to local edits — a
    suffix edit perturbs only the windows that overlap it).

    No per-document Python: tokenization + hashing + rolling window
    hashes come from the batch-flat kernels (one Arrow split, one FNV
    pass, ``window-1`` vectorized combine passes), and the per-document
    min is one ``np.minimum.reduceat``."""
    from pyspark.sql.types import LongType, StructField, StructType
    from gopie_spark.kernels.hashes import mix64
    from gopie_spark.kernels.minhash import shingle_hashes_flat
    from gopie_spark.operators.dedup import _flat_token_hashes

    schema = StructType(df.schema.fields +
                        [StructField(out_col, LongType(), False)])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                yield pdf.assign(**{out_col: pd.Series([], dtype="int64")})
                continue
            tok_h, lens = _flat_token_hashes(pdf[text_col])
            win_h, w_lens = shingle_hashes_flat(mix64(tok_h), lens, window)
            fps = np.zeros(len(pdf), dtype=np.int64)
            nz = np.nonzero(w_lens > 0)[0]
            if nz.size:
                starts = np.concatenate([[0], np.cumsum(w_lens[nz])[:-1]])
                fps[nz] = np.minimum.reduceat(win_h, starts) \
                    .astype(np.int64)
            out = pdf.copy()
            out[out_col] = pd.Series(fps, index=pdf.index, dtype="int64")
            yield out

    return df.mapInPandas(fn, schema)


# -- vocabulary building -------------------------------------------------------

def vocab_top_tokens(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", v: int = 30000) -> DataFrame:
    """Exact top-``v`` vocabulary: ``DataFrame[token, cnt, doc_freq]``
    ordered by collection frequency (ties by token) — the vocab/IDF
    build of a tokenizer-training pipeline.

    Pure built-ins end to end: explode(split) -> two-level aggregate.
    ``cnt`` partials combine map-side; ``doc_freq`` (documents
    containing the token) is exact via count(DISTINCT id) — Spark
    plans it as the standard two-phase distinct expansion, still fully
    distributed.  The final order-by-limit is TakeOrderedAndProject,
    so no global sort even at 10^8 distinct tokens."""
    c = F.col(text_col)
    tok = F.explode(F.split(F.lower(F.trim(c)), _WS)).alias("token")
    pairs = df.select(F.col(id_col), tok).filter(F.col("token") != "")
    return (pairs.groupBy("token")
            .agg(F.count("*").alias("cnt"),
                 F.countDistinct(id_col).alias("doc_freq"))
            .orderBy(F.desc("cnt"), "token")
            .limit(v))


def tfidf_top_terms(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", v: int = 30000, k: int = 5,
                    vocab: DataFrame | None = None) -> DataFrame:
    """Top-``k`` TF-IDF terms per document over the exact top-``v``
    vocabulary: ``DataFrame[id_col, token, tf, score_e6]`` — the
    relevance/keyword-extraction primitive of a text pipeline.

    ``score = tf * ln(n_docs / doc_freq)``, reported as
    ``floor(score*1e6 + 0.5)`` so the certificate compares integers,
    not engine-specific float formatting.

    Scale shape: term frequencies are one partial-aggregable
    explode->groupBy (map-side combine); the vocabulary (<= ``v`` rows,
    ~1 MB at v=30k) joins via an explicit ``broadcast`` so the big side
    never shuffles for the join; ``n_docs`` rides the same broadcast
    (cross-joined 1-row aggregate — no driver collect); the final
    per-document top-k is a window over the (id, token) aggregate,
    bounded at ``min(v, doc_len)`` rows per document."""
    from pyspark.sql import Window

    if vocab is None:
        vocab = vocab_top_tokens(df, text_col, id_col, v)
    n_docs = df.select(F.count("*").cast("double").alias("n_docs"))

    c = F.col(text_col)
    tok = F.explode(F.split(F.lower(F.trim(c)), _WS)).alias("token")
    tf = (df.select(F.col(id_col), tok)
          .filter(F.col("token") != "")
          .groupBy(id_col, "token")
          .agg(F.count("*").alias("tf")))
    scored = (tf.join(F.broadcast(vocab.select("token", "doc_freq")), "token")
              .join(F.broadcast(n_docs))
              .withColumn("score",
                          F.col("tf") * F.log(F.col("n_docs") /
                                              F.col("doc_freq"))))
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), "token")
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select(id_col, "token", "tf",
                    F.floor(F.col("score") * 1e6 + F.lit(0.5))
                    .cast("long").alias("score_e6")))


# -- repetition / fluff detection ---------------------------------------------

def _run_length_max(arr: Column) -> Column:
    """Longest run in a *sorted* array == count of its most frequent
    element — a per-row JVM fold (``aggregate``), no explode, no
    shuffle."""
    start = F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                     F.lit(0).alias("best"))

    def step(acc, x):
        run = F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1))
        return F.struct(x.alias("prev"), run.alias("run"),
                        F.greatest(acc.best, run).alias("best"))

    return F.aggregate(arr, start, step, lambda acc: acc.best)


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition features, entirely per-row (zero
    shuffle — the plan is a single codegen'd projection, which is the
    shape you want for a 10^12-row quality-filter pass):

    - ``n_tokens``, ``n_distinct_tokens``
    - ``ttr_e6``: type-token ratio * 1e6 (low => repetitive)
    - ``top_token_e6``: most-frequent-token share * 1e6
    - ``top_bigram_e6``: most-frequent-bigram share * 1e6

    Mode counts come from sort + longest-run fold per row
    (O(L log L) in the JVM) instead of explode + groupBy (a full
    (doc,token) shuffle) — repetition is a per-document property, so
    it should never cost a shuffle.  Ratios are null for docs with no
    tokens (no bigram => null ``top_bigram_e6``)."""
    c = F.col(text_col)
    split = F.filter(F.split(F.lower(F.trim(c)), _WS), lambda t: t != "")
    toks = F.col("_toks")
    n = F.size(toks)
    pref = F.slice(toks, 1, F.greatest(n - 1, F.lit(0)))
    suff = F.slice(toks, 2, F.greatest(n - 1, F.lit(0)))
    bigrams = F.zip_with(pref, suff,
                         lambda a, b: F.concat_ws(" ", a, b))

    def e6(num, den):
        return F.when(den > 0, F.floor(num * F.lit(1e6) / den + F.lit(0.5))
                      .cast("long"))

    n_distinct = F.size(F.array_distinct(toks))
    return (df.withColumn("_toks", split)
            .withColumn("n_tokens", n)
            .withColumn("n_distinct_tokens", n_distinct)
            .withColumn("ttr_e6", e6(n_distinct, n))
            .withColumn("top_token_e6",
                        e6(_run_length_max(F.array_sort(toks)), n))
            .withColumn("top_bigram_e6",
                        e6(_run_length_max(F.array_sort(bigrams)), n - 1))
            .drop("_toks"))


# -- language identification ---------------------------------------------------

# tiny per-language character-trigram profiles (top distinctive trigrams,
# public linguistic knowledge); heuristic by design — the operator contract
# is the Spark plumbing, the profile table is swappable.
_LANG_PROFILES: Dict[str, List[str]] = {
    "en": ["the", " th", "he ", "ing", "and", " an", "nd ", " of", "of ", "ion"],
    "es": [" de", "de ", "os ", " la", "la ", "ión", "es ", " es", "ción", "as "],
    "de": ["en ", "er ", " de", "der", "ie ", " di", "die", "ein", "ch ", "sch"],
    "fr": [" de", "de ", "es ", " le", "le ", "ent", "ion", " la", "la ", "que"],
    "pt": [" de", "de ", "os ", " co", "ão ", "ção", "as ", " qu", "que", "ent"],
    "it": [" di", "di ", "to ", " co", "re ", "la ", " la", "ion", "one", "che"],
    "nl": ["en ", " de", "de ", "an ", "van", " va", "et ", "een", " ee", "er "],
    "ru": [" и ", "ого", " на", "ть ", " по", "ени", " не", "ост", "ние", " пр"],
    "ja": ["の", "に", "を", "は", "た", "が", "て", "と", "し", "で"],
    "zh": ["的", "是", "在", "了", "不", "和", "有", "大", "这", "中"],
}


def add_lang_id(df: DataFrame, text_col: str = "text",
                out_col: str = "lang_pred") -> DataFrame:
    """Character n-gram language-ID heuristic (Arrow-batched pandas UDF:
    per-language profile hit-rate on lowercased text, argmax; 'und' when
    nothing matches).

    Per-byte cost: the profile grams are *literals*, so each one is a
    single ``pyarrow.compute.count_substring`` C++ substring scan over
    the batch (no Python regex engine), grams shared between language
    profiles (" de", "ion", ...) are counted once and reused, and the
    lowercase pass happens once per batch in Arrow.  This replaced ~100
    ``Series.str.count`` regex passes per batch — previously the
    heaviest per-byte cost in the repo."""
    unique_grams = sorted({g for grams in _LANG_PROFILES.values()
                           for g in grams})

    @F.pandas_udf(StringType())
    def lang_id(texts: pd.Series) -> pd.Series:
        import pyarrow as pa
        import pyarrow.compute as pc
        low = pc.utf8_lower(pa.Array.from_pandas(texts.fillna("")))
        gram_counts = {
            g: pc.count_substring(low, g).to_numpy(zero_copy_only=False)
            .astype(np.float64)
            for g in unique_grams
        }
        scores = np.zeros((len(low), len(_LANG_PROFILES)), dtype=np.float64)
        for j, grams in enumerate(_LANG_PROFILES.values()):
            for g in grams:
                scores[:, j] += gram_counts[g]
        lens = pc.utf8_length(low).to_numpy(zero_copy_only=False) \
            .astype(np.float64) + 1.0
        scores /= lens[:, None]
        best = scores.argmax(axis=1)
        langs = np.array(list(_LANG_PROFILES))
        out = np.where(scores[np.arange(len(low)), best] > 0,
                       langs[best], "und")
        return pd.Series(out)

    return df.withColumn(out_col, lang_id(F.col(text_col)))


# -- corpus-level duplicated-n-gram fraction ----------------------------------

def dup_ngram_stats(df: DataFrame, n: int = 10, id_col: str = "doc_id",
                    text_col: str = "text",
                    hash_grams: bool = False, min_count: int = 2,
                    cms_gate: bool = False,
                    gate_epsilon: float = 1e-5,
                    gate_delta: float = 1e-3) -> DataFrame:
    """Per-document fraction of word n-gram instances that occur more
    than once in the whole corpus (the train-set-level duplication
    signal of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better" — used to decide boilerplate-heavy docs).

    Built-ins only: tokens -> strict n-gram strings via
    ``transform(sequence)/slice/array_join`` (JVM, no Python), one
    Generate (explode), then two partial-aggregable hash aggregations
    (gram totals; per-doc dup counts).  Docs with fewer than ``n``
    tokens get ``n_grams = 0`` and a null fraction.

    This is the exact tier; the (doc, gram) explode shuffles
    O(tokens) rows.  ``hash_grams=True`` is the 100-TB variant: grams
    are xxhash64'ed before the shuffle, so the shuffle rows carry 8
    bytes instead of ~n words each (collisions at 2^-64 — at 10^13
    grams, ~0.003 expected collisions; results pytest-pinned equal to
    the string tier).  ``min_count`` raises the duplication threshold
    (count >= min_count), and ``cms_gate=True`` pre-filters the gram
    stream through :func:`cms_gram_gate` so sub-threshold grams never
    shuffle — exact at any sketch size, worthwhile in the
    boilerplate-threshold regime ``min_count >> gate_epsilon * N``.

    Output: ``df`` + ``n_grams`` (long), ``dup_frac_e6`` (long, null
    when no grams).
    """
    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), _WS),
                    lambda t: t != "")
    n_sh = F.greatest(F.size(F.col("_toks")) - F.lit(n - 1), F.lit(0))
    grams = F.when(
        n_sh >= 1,
        F.transform(F.sequence(F.lit(1), n_sh),
                    lambda i: F.array_join(
                        F.slice(F.col("_toks"), i, n), " "))
    ).otherwise(F.array().cast("array<string>"))
    gram_col = F.col("gram")
    if hash_grams:
        gram_col = F.xxhash64(F.col("gram"))
    exploded = (df.select(id_col, toks.alias("_toks"))
                .select(id_col, F.explode(grams).alias("gram"))
                .select(id_col, gram_col.alias("g")))
    if cms_gate:
        # heavy-hitter regime (min_count >> gate_epsilon * N): the CMS
        # gate keeps sub-threshold grams out of the count shuffle and
        # the join entirely; per-doc n_grams still counts every
        # instance (one partial-aggregable groupBy, no join).  Exact
        # for any sketch size — see cms_gram_gate.
        gated = cms_gram_gate(exploded, "g", min_count,
                              gate_epsilon, gate_delta)
        heavy = (gated.groupBy("g").agg(F.count("*").alias("_tot"))
                 .filter(F.col("_tot") >= min_count).select("g"))
        counts = exploded.groupBy(id_col) \
            .agg(F.count("*").alias("n_grams"))
        dups = (gated.join(heavy, "g").groupBy(id_col)
                .agg(F.count("*").alias("_n_dup")))
        per_doc = counts.join(dups, id_col, "left") \
            .withColumn("_n_dup", F.coalesce("_n_dup", F.lit(0)))
    else:
        totals = exploded.groupBy("g").agg(F.count("*").alias("_tot"))
        per_doc = (exploded.join(totals, "g")
                   .groupBy(id_col)
                   .agg(F.count("*").alias("n_grams"),
                        F.sum(F.when(F.col("_tot") >= min_count, 1)
                              .otherwise(0)).alias("_n_dup")))
    return (df.join(per_doc, id_col, "left")
            .withColumn("n_grams", F.coalesce("n_grams", F.lit(0)))
            .withColumn("dup_frac_e6",
                        F.when(F.col("n_grams") > 0,
                               F.floor(F.col("_n_dup") * F.lit(1e6)
                                       / F.col("n_grams") + F.lit(0.5))
                               .cast("long")))
            .drop("_n_dup"))


# -- composed C4/Gopher-style quality filter ----------------------------------

QUALITY_FILTER_FLAGS = ["short", "long", "mean_tok", "alpha",
                        "stopword", "ttr", "top_token"]


def quality_filter(df: DataFrame, text_col: str = "text",
                   min_tokens: int = 20, max_tokens: int = 100000,
                   min_mean_tok: float = 2.0, max_mean_tok: float = 12.0,
                   min_alpha_ratio: float = 0.5,
                   min_stopword_ratio: float = 0.01,
                   min_ttr_e6: int = 100000,
                   max_top_token_e6: int = 200000) -> DataFrame:
    """Composed document-quality filter (C4 + Gopher rule families):
    every rule is a boolean flag, ``drop_reasons`` is the bitmask in
    QUALITY_FILTER_FLAGS order, ``keep`` = no flag set.

    Entirely per-row built-ins layered on :func:`quality_features` and
    :func:`repetition_stats` — the combined plan is still a zero-shuffle
    scan+project, so filtering 10^12 rows costs one pass.  Flags rather
    than a bare boolean because at corpus scale you audit *why* docs
    drop (per-reason counts are one partial-aggregable groupBy away).
    """
    feats = repetition_stats(quality_features(df, text_col), text_col)
    flags = {
        "short": F.col("n_tokens") < min_tokens,
        "long": F.col("n_tokens") > max_tokens,
        "mean_tok": (F.col("mean_token_len") < min_mean_tok)
        | (F.col("mean_token_len") > max_mean_tok),
        "alpha": F.col("alpha_ratio") < min_alpha_ratio,
        "stopword": F.col("stopword_ratio") < min_stopword_ratio,
        "ttr": F.coalesce(F.col("ttr_e6"), F.lit(0)) < min_ttr_e6,
        "top_token": F.coalesce(F.col("top_token_e6"), F.lit(0))
        > max_top_token_e6,
    }
    out = feats
    mask = F.lit(0)
    for i, name in enumerate(QUALITY_FILTER_FLAGS):
        out = out.withColumn(f"flag_{name}", flags[name])
        mask = mask + F.when(flags[name], F.lit(1 << i)).otherwise(0)
    return (out.withColumn("drop_reasons", mask.cast("long"))
            .withColumn("keep", F.col("drop_reasons") == 0))


# -- bigram language-model corpus-fit score -----------------------------------

UNK = "<unk>"


def add_lm_score(df: DataFrame, v: int = 10000, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """KenLM-lite corpus-fit score (the CCNet-style quality signal —
    CCNet ranks Common-Crawl docs by LM perplexity; here the LM is a
    word-bigram model with add-one smoothing trained on the corpus
    itself, so a low score marks docs atypical of the collection):

    - vocabulary = exact top-``v`` tokens (:func:`vocab_top_tokens`);
      everything else maps to ``<unk>``;
    - model: ``P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + v + 1)``;
    - per-doc output: ``n_bigrams`` (long), ``sum_logp_e6`` (long),
      ``avg_logp_e6`` (long, null when no bigrams).

    Every per-bigram log-probability is floored to integer micro-units
    BEFORE the per-doc sum, so the aggregate is an integer sum —
    associative and therefore bit-identical regardless of partitioning
    or aggregation order (a raw double sum would not be), which is what
    lets a DuckDB oracle reproduce it exactly.

    Scale shape: vocab membership and the unigram/bigram count tables
    are all vocabulary-bounded (<= v rows, <= v+1 and <= (v+1)^2 rows —
    broadcastable for any practical v), so the corpus streams once
    through the bigram explode and only broadcast joins (vocab mapping
    included — never a v-literal isin expression, which would bloat
    every serialized task plan at v=30k); the only corpus-sized
    shuffles are the two count aggregations, both partial-aggregable.
    (No reference analog — training-data tier.)
    """
    # vocab membership via a broadcast LEFT join of the exploded tokens
    # against the vocab table ('<unk>' as the fallback) — NOT a
    # v-literal isin expression: at v=30k the In/InSet literal list
    # bloats every serialized plan/task, while the broadcast table costs
    # one small exchange and keeps the token stream unshuffled
    vocab_df = vocab_top_tokens(df, text_col, id_col, v).select("token")
    v1 = vocab_df.select(F.col("token").alias("_w1r"),
                         F.lit(True).alias("_in1"))
    v2 = vocab_df.select(F.col("token").alias("_w2r"),
                         F.lit(True).alias("_in2"))
    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), _WS),
                    lambda t: t != "")
    base = df.select(F.col(id_col), toks.alias("_t"))
    n = F.size(F.col("_t"))
    pref = F.slice(F.col("_t"), 1, F.greatest(n - 1, F.lit(0)))
    suff = F.slice(F.col("_t"), 2, F.greatest(n - 1, F.lit(0)))
    doc_bi = (base
              .select(id_col, F.explode(
                  F.zip_with(pref, suff, lambda a, b:
                             F.struct(a.alias("w1"), b.alias("w2"))))
                  .alias("_bg"))
              .select(id_col, F.col("_bg.w1").alias("_w1r"),
                      F.col("_bg.w2").alias("_w2r"))
              .join(F.broadcast(v1), "_w1r", "left")
              .join(F.broadcast(v2), "_w2r", "left")
              .select(id_col,
                      F.when(F.col("_in1"), F.col("_w1r"))
                      .otherwise(F.lit(UNK)).alias("w1"),
                      F.when(F.col("_in2"), F.col("_w2r"))
                      .otherwise(F.lit(UNK)).alias("w2")))
    uni = (base.select(F.explode("_t").alias("_w1r"))
           .join(F.broadcast(v1), "_w1r", "left")
           .select(F.when(F.col("_in1"), F.col("_w1r"))
                   .otherwise(F.lit(UNK)).alias("w1"))
           .groupBy("w1").agg(F.count("*").alias("_cu")))
    bi = (doc_bi.groupBy("w1", "w2").agg(F.count("*").alias("_cb")))
    logp_e6 = F.floor(
        F.log((F.col("_cb") + F.lit(1.0)) /
              (F.col("_cu") + F.lit(float(v + 1)))) * F.lit(1e6)
    ).cast("long")
    per_doc = (doc_bi
               .join(F.broadcast(bi), ["w1", "w2"])
               .join(F.broadcast(uni), "w1")
               .withColumn("_lp", logp_e6)
               .groupBy(id_col)
               .agg(F.count("*").alias("n_bigrams"),
                    F.sum("_lp").alias("sum_logp_e6")))
    return (df.join(per_doc, id_col, "left")
            .withColumn("n_bigrams", F.coalesce("n_bigrams", F.lit(0)))
            .withColumn("avg_logp_e6",
                        F.when(F.col("n_bigrams") > 0,
                               F.floor(F.col("sum_logp_e6") /
                                       F.col("n_bigrams")).cast("long"))))


# -- context-window chunking -----------------------------------------------------

def chunk_documents(df: DataFrame, max_tokens: int = 512,
                    id_col: str = "doc_id", text_col: str = "text",
                    out_col: str = "chunk_text") -> DataFrame:
    """Split every document into consecutive ``max_tokens``-token chunks
    — the context-window chunking step that turns a curated corpus into
    training-sequence-sized pieces (the last chunk keeps the remainder;
    empty/null docs produce no chunks).

    Output: ``DataFrame[id_col, chunk_idx (long, 0-based), chunk_text,
    n_chunk_tokens (long)]``.

    Entirely per-row Catalyst (split/filter -> transform(sequence) ->
    slice/array_join -> one posexplode): zero shuffle, so chunking
    10^12 documents costs one scan — the Generate multiplies rows, not
    bytes (each input byte lands in exactly one chunk).  Deterministic
    and SQL-expressible, so the exact chunk set is oracle-checkable.
    """
    if max_tokens < 1:
        raise ValueError("max_tokens must be positive")
    toks = F.filter(F.split(F.trim(F.col(text_col)), _WS),
                    lambda t: t != "")
    base = df.select(F.col(id_col), toks.alias("_ct"))
    n = F.size(F.col("_ct"))
    n_chunks = F.ceil(n / F.lit(max_tokens)).cast("int")
    chunks = F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.slice(F.col("_ct"), i * max_tokens + 1,
                              max_tokens))
    ).otherwise(F.array().cast("array<array<string>>"))
    return (base.select(id_col, F.posexplode(chunks)
                        .alias("chunk_idx", "_chunk"))
            .select(F.col(id_col),
                    F.col("chunk_idx").cast("long").alias("chunk_idx"),
                    F.array_join(F.col("_chunk"), " ").alias(out_col),
                    F.size(F.col("_chunk")).cast("long")
                    .alias("n_chunk_tokens")))


def assign_packed_bins(df: DataFrame, seq_len: int,
                       order_cols=("doc_id", "chunk_idx"),
                       tok_col: str = "n_chunk_tokens",
                       out_col: str = "bin_id") -> DataFrame:
    """Assign each chunk to its training-sequence bin by GLOBAL token
    prefix sum: in the deterministic ``order_cols`` order, chunk c with
    ``P(c)`` tokens before it lands in ``bin_id = floor(P(c) /
    seq_len)`` — the packing step that turns curated chunks into
    fixed-token training sequences (bins straddle document boundaries,
    exactly like concat-and-chop pretraining pipelines).

    Scale shape — the classic two-phase distributed prefix sum, NOT a
    single-partition window: range-repartition on the order key, a
    per-partition window cumsum (parallel — each task sorts only its
    range), a tiny per-partition-totals aggregate collected to the
    driver (numPartitions rows), and a broadcast offset join.  The
    result is a pure function of the total order, so it is identical
    for ANY partitioning/boundary sampling — byte-stable across runs
    and cluster sizes, and a DuckDB window oracle can recompute it.
    """
    from pyspark.sql import Window
    if seq_len < 1:
        raise ValueError("seq_len must be positive")
    order_cols = list(order_cols)
    # localCheckpoint pins the range boundaries: the frame is consumed
    # by TWO actions (totals collect + the result), and a recomputed
    # repartitionByRange may resample different boundaries — the output
    # would still be correct only if both executions agreed on _pid,
    # so materialize once instead of hoping
    ranged = df.repartitionByRange(*order_cols) \
        .withColumn("_pid", F.spark_partition_id()) \
        .localCheckpoint()
    w = Window.partitionBy("_pid").orderBy(*order_cols) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = ranged.withColumn(
        "_local_after", F.sum(F.col(tok_col).cast("long")).over(w))
    # per-partition totals: numPartitions rows — driver-tiny at any
    # corpus size (one row per task, not per chunk)
    totals = {r["_pid"]: r["_t"] for r in
              ranged.groupBy("_pid")
              .agg(F.sum(F.col(tok_col).cast("long")).alias("_t"))
              .collect()}
    offset = {}
    acc = 0
    for pid in sorted(totals):
        offset[pid] = acc
        acc += totals[pid]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offset.items()],
        "_pid int, _off long")
    before = (F.col("_off") + F.col("_local_after")
              - F.col(tok_col).cast("long"))
    return (local.join(F.broadcast(off_df), "_pid")
            .withColumn(out_col,
                        F.floor(before / F.lit(seq_len)).cast("long"))
            .drop("_pid", "_local_after", "_off"))


# -- CMS-gated heavy-gram counting ---------------------------------------------

def cms_gram_gate(exploded: DataFrame, gram_col: str = "_g",
                  min_count: int = 2, epsilon: float = 1e-5,
                  delta: float = 1e-3) -> DataFrame:
    """Count-Min pre-filter for a gram stream: keep only rows whose gram's
    CMS estimate reaches ``min_count`` — the sketch-core x pipeline-tier
    composition that makes heavy-gram counting affordable past the
    exact tier's reach.

    Two passes over the stream, NO full shuffle in either: pass 1 builds
    one global CMS via the standard two-level partial-state aggregation
    (`operators/sketch_agg.global_sketch` — per-partition update, tiny
    state merge); pass 2 probes every row against the broadcast state
    (vectorized `CMS.estimate` per Arrow batch) and drops sub-threshold
    grams BEFORE they reach any aggregation or join.  CMS never
    undercounts, so every truly-heavy gram survives — downstream
    exact-counting of the survivors removes the overcount false
    positives, making gated results EXACTLY equal to ungated ones at
    any parameters.

    When the gate *saves* anything is a sizing question: overcounts are
    bounded by ``epsilon * N`` (N = total gram instances), so the gate
    only prunes meaningfully when ``min_count >> epsilon * N`` — the
    boilerplate-span regime (e.g. min_count=100 at N=10^9 with
    epsilon=1e-8, a ~1.4 GB state), NOT the count>=2 dedup regime,
    where distinguishing 1 from 2 inherently needs the exact
    aggregation.  State size is ``depth x width x 8 B`` with
    ``width = ceil(e/epsilon)``, ``depth = ceil(ln(1/delta))`` — it is
    broadcast, so budget executor memory accordingly."""
    from gopie_spark.kernels.cms import CMS
    from gopie_spark.operators.sketch_agg import global_sketch

    cms = CMS.from_guess(epsilon, delta)
    state = global_sketch(
        exploded.select(F.col(gram_col).cast("string").alias("v")), "v",
        cms)
    bc = exploded.sparkSession.sparkContext.broadcast(cms.serialize(state))
    schema = exploded.schema

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        st = cms.deserialize(bc.value)
        for pdf in batches:
            if pdf.empty:
                yield pdf
                continue
            est = cms.estimate(st, pdf[gram_col].astype(str))
            yield pdf[est >= min_count]

    return exploded.mapInPandas(fn, schema)


# -- duplicated-span removal --------------------------------------------------

def remove_duplicate_spans(df: DataFrame, n: int = 20, min_count: int = 2,
                           id_col: str = "doc_id", text_col: str = "text",
                           out_col: str = "clean_text",
                           hash_grams: bool = True,
                           cms_gate: bool = False,
                           gate_epsilon: float = 1e-5,
                           gate_delta: float = 1e-3) -> DataFrame:
    """Cut corpus-duplicated token spans OUT of each document — the
    substring-level dedup transform (Lee et al. 2022 remove duplicated
    substrings outright rather than dropping whole docs; this is the
    token-n-gram-span form of that):

    1. every token ``n``-gram occurring >= ``min_count`` times in the
       corpus (case-folded key) is a *duplicated span start*;
    2. a token is removed when any duplicated span covers its position;
    3. ``out_col`` = the surviving tokens joined by single spaces (a
       doc that is entirely duplicated text becomes the empty string).

    Plan shape: one Generate (posexplode of gram keys), one
    partial-aggregable gram-count aggregation, one join of the per-doc
    gram stream against the heavy-gram set, one per-doc
    ``collect_list`` of span starts (bounded by tokens-per-doc), then a
    per-row JVM fold (``transform``/``exists``/``array_join`` — no
    Python) that rebuilds the text.  The (doc, gram) stream shuffles
    O(tokens) rows; at 10^12 rows run the heavy-gram count once and
    reuse it (it is the same aggregation as :func:`dup_ngram_stats`).

    ``hash_grams=True`` (the default — this is the 100-TB shape) keys
    the count aggregation AND the heavy-gram join on ``xxhash64`` of
    the gram string, so every shuffled row carries 8 bytes instead of
    ~``n`` words (~120+ bytes at n=20): >10x less shuffle volume for
    the same answer.  The caveat is the standard 64-bit-collision one —
    two distinct grams hashing equal would merge their counts and could
    over-remove a span; at 10^13 corpus grams the expected number of
    colliding pairs is ~0.003 (birthday bound), negligible against the
    fuzziness of the span heuristic itself.  ``hash_grams=False`` keeps
    the raw-string keys (byte-identical output, pytest-pinned equal).

    ``cms_gate=True`` additionally pre-filters the gram stream through
    :func:`cms_gram_gate` before the count aggregation AND the heavy
    join — exact at any parameters (the gate never drops a truly-heavy
    gram; the exact count removes its false positives), and it pays
    when ``min_count >> gate_epsilon * total_grams``: the
    boilerplate-removal regime (min_count in the hundreds), where
    sub-threshold grams — the overwhelming majority — never enter a
    shuffle at all.
    """
    raw_toks = F.filter(F.split(F.trim(F.col(text_col)), _WS),
                        lambda t: t != "")
    base = df.select(F.col(id_col), raw_toks.alias("_rt"))
    low = F.transform(F.col("_rt"), F.lower)
    n_sh = F.greatest(F.size(F.col("_rt")) - F.lit(n - 1), F.lit(0))
    # gram key per start position (0-based): lowercased n tokens
    grams = F.when(
        n_sh >= 1,
        F.transform(F.sequence(F.lit(1), n_sh),
                    lambda i: F.array_join(F.slice(low, i, n), " "))
    ).otherwise(F.array().cast("array<string>"))
    doc_grams = (base.select(id_col,
                             F.posexplode(grams).alias("_pos", "_g")))
    if hash_grams:
        # 8-byte shuffle keys: hash BEFORE the aggregation and the join
        # so neither ever moves a raw n-token string
        doc_grams = doc_grams.select(id_col, "_pos",
                                     F.xxhash64("_g").alias("_g"))
    if cms_gate:
        # both the count and the join consume only the gated stream —
        # heavy-gram instances all survive the gate, so this is exact
        doc_grams = cms_gram_gate(doc_grams, "_g", min_count,
                                  gate_epsilon, gate_delta)
        # one gate pass, not one per consumer: route both downstream
        # consumers (heavy count + probe join) through a single
        # AQE-materialized exchange of the gated stream.  The gated
        # stream is small by construction (sub-threshold grams are
        # already gone), so shuffling it once beats re-running the
        # explode + Python gate per consumer at any scale (measured
        # -32% on the sf0.1 boilerplate query, identical output).
        doc_grams = doc_grams.repartition("_g")
    heavy = (doc_grams.groupBy("_g")
             .agg(F.count("*").alias("_c"))
             .filter(F.col("_c") >= min_count)
             .select("_g"))
    starts = (doc_grams.join(heavy, "_g")
              .groupBy(id_col)
              .agg(F.collect_list("_pos").alias("_starts")))
    joined = base.join(starts, id_col, "left") \
        .withColumn("_starts", F.coalesce(
            "_starts", F.array().cast("array<int>")))
    keep_tok = F.filter(
        F.zip_with(F.col("_rt"),
                   F.sequence(F.lit(0),
                              F.greatest(F.size(F.col("_rt")) - 1,
                                         F.lit(0))),
                   lambda t, p: F.struct(t.alias("t"), p.alias("p"))),
        lambda s: ~F.exists(
            F.col("_starts"),
            lambda st: (s["p"] >= st) & (s["p"] < st + F.lit(n))))
    cleaned = joined.withColumn(
        out_col, F.array_join(F.transform(keep_tok, lambda s: s["t"]),
                              " ")).select(id_col, out_col)
    return df.join(cleaned, id_col, "left")


def compression_ratio(df: DataFrame, text_col: str = "text",
                      out_col: str = "compression_ratio") -> DataFrame:
    """zlib-compressed bytes / raw UTF-8 bytes per document — the
    standard cheap repetition/boilerplate signal (highly repetitive or
    templated docs compress far below prose; level 6, the zlib
    default, deterministic across platforms by spec).  Arrow-batched
    pandas UDF (compression is the one per-doc step Catalyst cannot
    express); zero shuffle, NULL/empty text → NULL.

    Typical gates: prose lands ~0.3-0.7; ratio < ~0.2 flags repetition
    (use alongside :func:`repetition_stats`, which localizes WHAT
    repeats), > ~0.9 flags binary-ish/low-redundancy noise."""
    import pandas as pd
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def _ratio(texts: pd.Series) -> pd.Series:
        import zlib

        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return len(zlib.compress(raw, 6)) / len(raw)
        return texts.map(one)

    return df.withColumn(out_col, _ratio(F.col(text_col)))


def normalize_text(df: DataFrame, text_col: str = "text",
                   out_col: str = "norm_text", form: str = "NFC",
                   lowercase: bool = False,
                   strip_accents: bool = False) -> DataFrame:
    """Unicode normalization (CCNet-style pre-dedup canonicalization):
    apply ``form`` (NFC/NFKC/NFD/NFKD), then optional lowercasing and
    accent stripping (drop combining marks after NFD) — so visually
    identical texts in different encodings share one dedup digest.

    Arrow-batched pandas UDF, zero shuffle (Unicode normalization is
    the one string step Catalyst has no expression for); NULL → NULL.
    The NFC path is oracle-exact against DuckDB's ``nfc_normalize``
    (driver cert ``normalize_gate``); the option paths are pinned by
    pytest parity on planted multi-script text."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form: {form}")
    import pandas as pd
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def _norm(texts: pd.Series) -> pd.Series:
        import unicodedata

        def one(t):
            if t is None:
                return None
            s = unicodedata.normalize(form, t)
            if strip_accents:
                s = "".join(c for c in unicodedata.normalize("NFD", s)
                            if not unicodedata.combining(c))
                s = unicodedata.normalize(form, s)
            if lowercase:
                s = s.lower()
            return s
        return texts.map(one)

    return df.withColumn(out_col, _norm(F.col(text_col)))


# sentence boundary: terminal punctuation run followed by whitespace.
# Kept in the RE2 ∩ Java subset so the DuckDB oracle runs the same
# pattern text; the replacement syntax differs per engine ($1 vs \1),
# which oracle_split_sentences_sql handles.
SENTENCE_BOUNDARY_RE = r"([.!?]+)\s+"
_SENT_SEP = "\x1e"


def split_sentences(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """``DataFrame[id_col, sent_idx (int, 0-based), sentence]`` — one
    row per sentence, split on terminal punctuation + whitespace (the
    deterministic, oracle-checkable segmenter; plug a model-based one
    into the same contract if needed).  Sentences are trimmed; empty
    pieces drop; NULL/empty docs produce no rows.

    Per-row Catalyst only (regexp_replace marker + split + filter +
    posexplode): zero shuffle, the Generate multiplies rows not bytes.
    Feeds sentence-level decontamination and quality stats.
    """
    marked = F.regexp_replace(F.col(text_col), SENTENCE_BOUNDARY_RE,
                              "$1" + _SENT_SEP)
    parts = F.filter(
        F.transform(F.split(marked, _SENT_SEP), lambda p: F.trim(p)),
        lambda p: p != "")
    return (df.select(F.col(id_col), parts.alias("_parts"))
            .select(id_col, F.posexplode("_parts")
                    .alias("sent_idx", "sentence")))


def oracle_split_sentences_sql(table: str, id_sql: str = "doc_id",
                               text_sql: str = "text") -> str:
    """DuckDB mirror of :func:`split_sentences` (same boundary pattern
    text; DuckDB replacement syntax + explicit global flag)."""
    pat = SENTENCE_BOUNDARY_RE
    return f"""
        WITH m AS (
            SELECT {id_sql} AS _id,
                   list_filter(
                       list_transform(
                           string_split(
                               regexp_replace({text_sql}, '{pat}',
                                              '\\1' || chr(30), 'g'),
                               chr(30)),
                           p -> trim(p)),
                       p -> p <> '') AS parts
            FROM {table}
        )
        SELECT _id AS {id_sql}, CAST(i - 1 AS INT) AS sent_idx,
               parts[i] AS sentence
        FROM m, unnest(generate_series(1, len(parts))) AS u(i)
    """


def token_entropy(df: DataFrame, keys: Sequence[str] | None = None,
                  text_col: str = "text") -> DataFrame:
    """Shannon entropy (bits/token) of the token frequency distribution
    per key group — the corpus-diversity report a data-mixing pass
    reads next to the dup-ngram fraction (low entropy = concentrated /
    templated corpus slice; the uniform-distribution max is
    log2(n_distinct_tokens)).

    Output: ``DataFrame[keys..., n_tokens, n_distinct, entropy_bits]``.

    Exact, two partial-aggregable hash aggregations (token counts, then
    the per-group fold of ``-Σ (c/N)·log2(c/N)`` computed as
    ``log2(N) - Σ c·log2(c) / N`` so the second agg needs only
    ``sum(c·log2 c)``, ``sum(c)``, ``count`` — no second pass over the
    corpus, no window).  SQL-expressible, so the driver cert recomputes
    it exactly.
    """
    keys = list(keys or [])
    toks = df.select(*keys,
                     F.explode(F.filter(
                         F.split(F.lower(F.trim(F.col(text_col))), _WS),
                         lambda t: t != "")).alias("_t"))
    counts = toks.groupBy(*keys, "_t").agg(F.count("*").alias("_c"))
    n = F.sum("_c")
    return (counts.groupBy(*keys)
            .agg(n.cast("long").alias("n_tokens"),
                 F.count("*").cast("long").alias("n_distinct"),
                 ((F.log2(n) - F.sum(F.col("_c") * F.log2("_c")) / n))
                 .alias("entropy_bits"))
            )
