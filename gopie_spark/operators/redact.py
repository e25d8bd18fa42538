"""PII detection and redaction for web-text training pipelines.

Common-Crawl-scale corpora must be scrubbed of obvious personal
identifiers (emails, phone numbers, IP addresses) before training.
Everything here is Spark built-in regexp expressions — whole-stage
codegen, zero Python in the hot path, and the patterns are deliberately
RE2-compatible (no lookarounds, no backrefs) so the same pattern text
runs verbatim in DuckDB for the correctness oracle.

At 10^12 rows the plan is a pure scan+project: no shuffle, no UDF, and
column pruning keeps the scan to the text column plus whatever the
caller selects.  (No analog in the reference — gopie is a sketch
library; this is part of the training-data tier the brief adds.)
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from pyspark.sql import Column, DataFrame, functions as F

# Pattern order matters for redaction: emails contain digit runs that a
# phone pattern could clip, so emails are replaced first.  Each pattern
# is RE2-safe and anchored on non-word boundaries where cheap.
PII_PATTERNS: List[Tuple[str, str, str]] = [
    # (kind, pattern, replacement token)
    ("email",
     r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\.[A-Za-z0-9-]+)+",
     "<EMAIL>"),
    ("ipv4",
     r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b",
     "<IP>"),
    # Phone numbers, three RE2-safe shapes (alternation order = match
    # preference, identical leftmost-first semantics in Java regex and
    # RE2/DuckDB): +CC-prefixed international runs, (NPA)-grouped North
    # American numbers, and fully dash-grouped NNN-NNN-NNNN runs.  Kept
    # conservative — a +, a paren group, or dashes throughout — so bare
    # digit runs (ids, years, quantities) are never eaten.
    ("phone",
     r"\+[0-9]{1,3}[ -]?[0-9]{3}[ -]?[0-9]{3,4}([ -]?[0-9]{3,4})?"
     r"|\([0-9]{3}\)[ -]?[0-9]{3}[ -]?[0-9]{4}"
     r"|\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b",
     "<PHONE>"),
]


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_counts(col) -> Dict[str, Column]:
    """Per-kind match-count expressions (``regexp_count`` — codegen).

    Returns ``{kind: Column}``; callers attach with ``withColumns`` or
    aggregate directly.  Counting never materializes the match array.
    """
    c = _c(col)
    return {kind: F.regexp_count(c, F.lit(pat))
            for kind, pat, _ in PII_PATTERNS}


def redact_pii(col) -> Column:
    """Replace every PII match with its placeholder token.

    A chain of three ``regexp_replace`` built-ins — one fused codegen
    stage, order fixed (emails first, see PII_PATTERNS).  Idempotent:
    placeholder tokens contain no PII-shaped substrings.
    """
    c = _c(col)
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach per-row PII counts + total.

    Output adds ``n_email``, ``n_ipv4``, ``n_phone``, ``n_pii``.
    Scan-shaped: no shuffle, prunes to the caller's columns + text.
    """
    counts = pii_counts(text_col)
    out = df
    for kind, expr in counts.items():
        out = out.withColumn(f"n_{kind}", expr)
    total = None
    for kind in counts:
        t = F.col(f"n_{kind}")
        total = t if total is None else total + t
    return out.withColumn("n_pii", total)


def scrub(df: DataFrame, text_col: str = "text",
          out_col: str | None = None) -> DataFrame:
    """Return ``df`` with ``text_col`` redacted (in place by default).

    The per-row invariant is exact string equality with the oracle's
    chained replace, so downstream digests (dedup keys, fingerprints)
    stay byte-stable across engines.
    """
    return df.withColumn(out_col or text_col, redact_pii(text_col))


def oracle_redact_sql(col_sql: str) -> str:
    """The DuckDB expression equivalent to :func:`redact_pii` — built
    from the same PII_PATTERNS tuples so the two engines cannot drift.
    DuckDB needs the 'g' flag for global replace (Spark's
    regexp_replace is global by default)."""
    expr = col_sql
    for _, pat, repl in PII_PATTERNS:
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{repl}', 'g')"
    return expr


def oracle_count_sql(col_sql: str, kind: str) -> str:
    """DuckDB match-count expression for one PII kind
    (len(regexp_extract_all(...)) — DuckDB has no regexp_count)."""
    pat = {k: p for k, p, _ in PII_PATTERNS}[kind].replace("'", "''")
    return f"len(regexp_extract_all({col_sql}, '{pat}'))"
