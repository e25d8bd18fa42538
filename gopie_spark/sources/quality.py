"""Input-contract hardening for pages tables.

A 10^12-document crawl ALWAYS contains malformed rows — null/empty
urls from redirect loops, empty extractions, multi-hundred-MB decoded
texts from binary-mislabelled responses.  A production sketch job must
neither die on them nor silently fold them into estimates.  This
module gives the two tools the jobs use:

- :func:`quarantine_reason` / :func:`split_quarantine` — classify rows
  that violate the pages input contract (``url:string, warc_ts:ts,
  html:binary, text:string, lang:string``; BASELINE input_hint) and
  split them off WITH the reason, so they can be persisted for triage
  instead of dropped on the floor.  Null ``lang`` is deliberately NOT
  quarantined: it is a legitimate "language unknown" group key and
  every keyed aggregation here handles null groups.
- :func:`input_quality_aggs` — quality counters as plain Catalyst
  aggregate expressions, designed to RIDE an existing full scan
  (``df.agg(F.count('*'), *input_quality_aggs())``): at corpus scale
  the report costs zero extra passes.

Everything is pure Catalyst (when/length/sum of casts) — no Python,
filters push down to the parquet scan.
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import DataFrame, functions as F

#: classification order matters: the first matching reason wins, so a
#: row with a null url AND empty text reports ``null_url``.
REASONS = ("null_url", "null_text", "empty_text", "oversize_text")


def quarantine_reason(url_col: Optional[str] = "url",
                      text_col: str = "text",
                      max_text_len: Optional[int] = None):
    """Column expression: the quarantine reason, or NULL for rows that
    honour the input contract.  ``max_text_len`` (characters) adds the
    oversize tier — decoded-binary garbage pages otherwise dominate
    tokenizer and shingle costs by orders of magnitude.  Pass
    ``url_col=None`` for tables without a url column (text rules
    only)."""
    if url_col is not None:
        r = F.when(F.col(url_col).isNull() | (F.length(url_col) == 0),
                   F.lit("null_url"))
        r = r.when(F.col(text_col).isNull(), F.lit("null_text"))
    else:
        r = F.when(F.col(text_col).isNull(), F.lit("null_text"))
    r = r.when(F.length(text_col) == 0, F.lit("empty_text"))
    if max_text_len is not None:
        r = r.when(F.length(text_col) > max_text_len,
                   F.lit("oversize_text"))
    return r.otherwise(F.lit(None).cast("string"))


def split_quarantine(df: DataFrame, url_col: Optional[str] = "url",
                     text_col: str = "text",
                     max_text_len: Optional[int] = None,
                     reason_col: str = "_reason"
                     ) -> Tuple[DataFrame, DataFrame]:
    """(clean, quarantined) — quarantined carries ``reason_col``.

    Both sides are lazy filters over the same scan; neither is
    materialized here, so callers pay only for the sides they use."""
    reason = quarantine_reason(url_col, text_col, max_text_len)
    clean = df.filter(reason.isNull())
    bad = df.withColumn(reason_col, reason).filter(
        F.col(reason_col).isNotNull())
    return clean, bad


def input_quality_aggs(url_col: str = "url", text_col: str = "text",
                       lang_col: str = "lang",
                       ts_col: Optional[str] = "warc_ts",
                       max_text_len: Optional[int] = None):
    """Aggregate expressions for the quality report — append them to an
    agg that already scans the table.  Returns a list of aliased
    columns: rows_{null_url, null_text, empty_text, oversize_text,
    null_lang, null_ts}.  ``ts_col=None`` omits the timestamp counter —
    ``warc_ts`` is optional in the pages contract (callers pass
    ``"warc_ts" if "warc_ts" in df.columns else None``)."""

    def cnt(cond, name):
        return F.sum(cond.cast("long")).alias(name)

    url, text = F.col(url_col), F.col(text_col)
    out = [
        cnt(url.isNull() | (F.length(url) == 0), "rows_null_url"),
        cnt(text.isNull(), "rows_null_text"),
        cnt(text.isNotNull() & (F.length(text) == 0), "rows_empty_text"),
        cnt(F.col(lang_col).isNull(), "rows_null_lang"),
    ]
    if ts_col is not None:
        out.append(cnt(F.col(ts_col).isNull(), "rows_null_ts"))
    if max_text_len is not None:
        out.insert(3, cnt(text.isNotNull() & (F.length(text) > max_text_len),
                          "rows_oversize_text"))
    return out


def quarantine_to_dir(df: DataFrame, out_dir: str,
                      max_text_len: Optional[int] = None
                      ) -> Tuple[DataFrame, dict]:
    """Split off contract-violating rows, persist them WITH reasons to
    ``out_dir`` (parquet, overwritten — re-run idempotent), and return
    ``(clean, per_reason_counts)``.  The counts are read back from the
    persisted parquet so the quarantine side is scanned exactly once;
    the clean side stays a lazy filter for the caller's builds.  One
    tested implementation for every job that quarantines
    (jobs/build_sketches.py, jobs/daily_update.py)."""
    clean, bad = split_quarantine(df, max_text_len=max_text_len)
    bad.write.mode("overwrite").parquet(out_dir)
    counts = {r["_reason"]: int(r["n"]) for r in
              df.sparkSession.read.parquet(out_dir)
              .groupBy("_reason").agg(F.count("*").alias("n")).collect()}
    return clean, counts
