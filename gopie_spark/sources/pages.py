"""Synthetic Common-Crawl-style ``pages`` table + deterministic HTML→text.

The north-rule input (BASELINE.json ``input_hint``): columns
``url:string, warc_ts:timestamp, html:binary, text:string, lang:string``.
Synthesis is fully deterministic (seeded PCG64, no wall clock, no external
data) per FIXTURES.md F6:

- url: ``https://h{host}.example.org/{base58(doc_id)}`` with Zipf host
  skew (1 000 hosts) and ~2% exact duplicate urls; doc ids from a
  collision-free quadratic-residue permutation;
- warc_ts: fixed epoch 2026-01-01 + id-derived offset (snowflake-style);
- text: Zipf tokens from a 50 000-word vocabulary (plus entity-bearing
  tokens like ``r&d`` to exercise escaping), lognormal length;
- html: deterministic wrapper of the escaped text;
- lang: Zipf over 10 languages (en ≈ 45% — the skewed grouping key).

Per-row invariant (the correctness gate): ``extract_text(html) == text``
byte-identical, for both the serial scalar path and the Spark vectorized
path.
"""

from __future__ import annotations

import html as _html
import math
import os
import re
from typing import Iterator, Optional

import numpy as np
import pandas as pd

from gopie_spark.functions.base58 import base58_encode
from gopie_spark.functions.randomsequence import permuted_ids

LANGS = ["en", "zh", "es", "de", "fr", "ja", "ru", "pt", "it", "nl"]
LANG_PROBS = [0.45, 0.18, 0.10, 0.08, 0.06, 0.05, 0.03, 0.02, 0.02, 0.01]
N_HOSTS = 1000
VOCAB_SIZE = 50_000
EPOCH_MS = 1_767_225_600_000  # 2026-01-01T00:00:00Z

_ENTITY_TOKENS = ["r&d", "a<b", "x>y", 'say"hi"', "it's", "&copy", "<tag>"]

# -- HTML -> text ------------------------------------------------------------
# Decode order matters: named/numeric entities first, &amp; LAST, so
# "&amp;lt;" round-trips as the literal "&lt;".
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]
_RE_HEAD = re.compile(r"<head\b.*?</head>", re.S | re.I)
_RE_SCRIPT = re.compile(r"<script\b.*?</script>", re.S | re.I)
_RE_STYLE = re.compile(r"<style\b.*?</style>", re.S | re.I)
_RE_COMMENT = re.compile(r"<!--.*?-->", re.S)
_RE_TAG = re.compile(r"<[^>]*>")
_RE_WS = re.compile(r"\s+")


def extract_text(html_bytes: bytes) -> str:
    """Serial scalar oracle: single-pass deterministic tag stripper.

    Drops <head>/<script>/<style>/comments, strips remaining tags,
    decodes the fixed entity table, collapses whitespace.
    """
    s = html_bytes.decode("utf-8", errors="replace")
    s = _RE_HEAD.sub(" ", s)
    s = _RE_SCRIPT.sub(" ", s)
    s = _RE_STYLE.sub(" ", s)
    s = _RE_COMMENT.sub(" ", s)
    s = _RE_TAG.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return _RE_WS.sub(" ", s).strip()


def extract_text_series(html_series: pd.Series) -> pd.Series:
    """Vectorized pandas path — same pipeline via Series.str (C regex loop),
    byte-identical to :func:`extract_text` per row."""
    s = html_series.map(lambda b: bytes(b).decode("utf-8", errors="replace"))
    s = s.astype("string")
    s = s.str.replace(_RE_HEAD, " ", regex=True)
    s = s.str.replace(_RE_SCRIPT, " ", regex=True)
    s = s.str.replace(_RE_STYLE, " ", regex=True)
    s = s.str.replace(_RE_COMMENT, " ", regex=True)
    s = s.str.replace(_RE_TAG, " ", regex=True)
    for ent, ch in _ENTITIES:
        s = s.str.replace(ent, ch, regex=False)
    return s.str.replace(_RE_WS, " ", regex=True).str.strip().astype(object)


def with_extracted_text(df, html_col: str = "html",
                        out_col: str = "extracted_text"):
    """Spark surface: add the extracted-text column via an Arrow-batched
    pandas UDF (no per-row Python at the Spark API layer)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def _extract(html: pd.Series) -> pd.Series:
        return extract_text_series(html)

    return df.withColumn(out_col, _extract(F.col(html_col)))


# -- synthesis ---------------------------------------------------------------

def _escape(s: pd.Series) -> pd.Series:
    s = s.str.replace("&", "&amp;", regex=False)
    s = s.str.replace("<", "&lt;", regex=False)
    s = s.str.replace(">", "&gt;", regex=False)
    s = s.str.replace('"', "&quot;", regex=False)
    return s


def _vocab(rng: np.random.Generator) -> np.ndarray:
    letters = "abcdefghijklmnopqrstuvwxyz"
    lens = rng.integers(2, 11, size=VOCAB_SIZE)
    flat = rng.integers(0, 26, size=int(lens.sum()))
    words = []
    pos = 0
    for ln in lens:
        words.append("".join(letters[c] for c in flat[pos:pos + ln]))
        pos += ln
    for i, tok in enumerate(_ENTITY_TOKENS):
        words[(i + 1) * 997] = tok  # sprinkle entity-bearing tokens
    return np.array(words, dtype=object)


def pages_schema() -> str:
    return ("url string, warc_ts timestamp, html binary, "
            "text string, lang string")


def _chunk(rng: np.random.Generator, vocab: np.ndarray, start: int,
           n: int) -> pd.DataFrame:
    doc_ids = permuted_ids(start + 1, n)
    host_ids = rng.zipf(1.2, size=n) % N_HOSTS
    paths = base58_encode(doc_ids)
    urls = np.array([f"https://h{h}.example.org/{p}"
                     for h, p in zip(host_ids, paths)], dtype=object)
    # ~2% exact duplicate urls (re-crawls)
    dup_mask = rng.random(n) < 0.02
    dup_src = rng.integers(0, n, size=n)
    urls[dup_mask] = urls[dup_src[dup_mask]]

    lang = rng.choice(len(LANGS), size=n, p=LANG_PROBS)
    n_tokens = np.clip(rng.lognormal(4.2, 1.0, size=n), 5, 1500).astype(int)
    total = int(n_tokens.sum())
    tok_ids = rng.zipf(1.15, size=total) % VOCAB_SIZE
    words = vocab[tok_ids]
    bounds = np.concatenate([[0], np.cumsum(n_tokens)])
    texts = [" ".join(words[bounds[i]:bounds[i + 1]]) for i in range(n)]
    text_s = pd.Series(texts, dtype=object)

    body = _escape(text_s.astype("string"))
    title = pd.Series([f"t{d}" for d in doc_ids], dtype="string")
    html = ("<html><head><title>" + title
            + '</title><meta charset="utf-8"/><style>p{margin:0}</style>'
            + "</head><body><p>" + body
            + '</p><script>var a=1;</script></body></html>')
    ts = pd.to_datetime(EPOCH_MS + (doc_ids % np.uint64(86_400_000)).astype(np.int64)
                        + np.arange(start, start + n, dtype=np.int64),
                        unit="ms").astype("datetime64[us]")  # Spark can't read TIMESTAMP(NANOS)
    return pd.DataFrame({
        "url": urls,
        "warc_ts": ts,
        "html": html.astype(object).map(lambda s: s.encode("utf-8")),
        "text": text_s,
        "lang": np.array(LANGS, dtype=object)[lang],
    })


def generate_pages(out_dir: str, n_rows: int, n_files: int = 16,
                   seed: int = 42, row_group_rows: int = 50_000) -> str:
    """Write the deterministic pages table as ``n_files`` parquet files.

    Driver-side numpy synthesis (no Spark needed) — the table is the
    *input* to the engine, so generating it serially keeps the invariant
    oracle trivially serial too.  Skips work if the directory already has
    the marker for (n_rows, seed).
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    marker = os.path.join(out_dir, f"_GENERATED_{n_rows}_{seed}")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)
    per_file = math.ceil(n_rows / n_files)
    start = 0
    for f in range(n_files):
        n = min(per_file, n_rows - start)
        if n <= 0:
            break
        pdf = _chunk(rng, vocab, start, n)
        table = pa.Table.from_pandas(pdf, preserve_index=False)
        pq.write_table(table, os.path.join(out_dir, f"part-{f:05d}.parquet"),
                       row_group_size=row_group_rows)
        start += n
    with open(marker, "w") as fh:
        fh.write("ok")
    return out_dir
