"""BPE tokenizer learning over a corpus — the distributed/driver split
a 100-TB tokenizer build actually uses.

Algorithm: byte-pair encoding per Sennrich, Haddow, Birch ("Neural
Machine Translation of Rare Words with Subword Units", ACL 2016) —
public literature; the reference has no tokenizer.  Word-internal BPE
(words from the repo's standard ``\\s+`` tokenization are the merge
boundary; no end-of-word marker), deterministic tie-break: highest
count, then lexicographically smallest pair.

Scale design — the three tiers and where each runs:

1. ``word_freqs`` (CLUSTER, the only corpus-scale pass): one
   partial-aggregable groupBy over the tokenized corpus.  At 10^12
   docs the shuffle carries (word, partial-count) rows — the word
   vocabulary, not the corpus.
2. ``learn_bpe`` (DRIVER, on the collected top-``v_words`` histogram):
   the merge loop is inherently sequential (merge r+1 depends on the
   counts AFTER merge r), so no engine can usefully distribute it —
   the standard architecture (SentencePiece, HF tokenizers) counts in
   parallel and learns on the bounded histogram, exactly like this
   repo's IVF/PQ codebook training.  The cap is by (freq desc, word)
   so it is deterministic; the dropped tail's mass is reported.
3. ``apply_bpe`` (CLUSTER, zero-shuffle): encode every doc with the
   broadcast merge ranks via an Arrow-batched pandas UDF that memoizes
   encodings per distinct word within each batch (Zipf makes the hit
   rate ~99%).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

_WS = r"\s+"


def _words_col(text_col: str) -> Column:
    return F.filter(F.split(F.lower(F.trim(F.col(text_col))), _WS),
                    lambda t: t != "")


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — one Generate + one
    partial-aggregable hash aggregation."""
    return (df.filter(F.col(text_col).isNotNull())
            .select(F.explode(_words_col(text_col)).alias("word"))
            .groupBy("word").agg(F.count("*").alias("freq")))


def bpe_pair_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Iteration-0 pair statistics: (pair, cnt) of adjacent CHARACTER
    pairs inside words, weighted by word frequency — the distributed
    half of the first BPE merge decision, JVM-only (substring over a
    sequence, no Python).  argmax(cnt) IS merge #1."""
    wf = word_freqs(df, text_col)
    chars = F.split(F.col("word"), "(?!^)")
    pairs = F.when(
        F.length("word") >= 2,
        F.transform(F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.concat(F.element_at(chars, i),
                                       F.element_at(chars, i + 1)))
    ).otherwise(F.array().cast("array<string>"))
    return (wf.select("freq", F.explode(pairs).alias("pair"))
            .groupBy("pair").agg(F.sum("freq").alias("cnt")))


# ---------------------------------------------------------------------------
# driver-side learning on the bounded histogram
# ---------------------------------------------------------------------------

def _merge_word(syms: Tuple[str, ...], a: str, b: str) -> Tuple[str, ...]:
    """Left-to-right non-overlapping merge of (a,b) -> a+b."""
    out: List[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def learn_bpe_from_freqs(freqs: Sequence[Tuple[str, int]],
                         n_merges: int) -> List[Tuple[str, str]]:
    """The sequential merge loop on a (word, freq) histogram.  Plain
    recount-per-round implementation (O(V*L) per merge) — fine for the
    bounded histogram; determinism is the contract: ties break to the
    lexicographically smallest pair."""
    words: List[List] = [[tuple(w), int(f)] for w, f in freqs if len(w)]
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        counts: Dict[Tuple[str, str], int] = {}
        for syms, f in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        top = max(counts.values())
        best = min(p for p, c in counts.items() if c == top)
        merges.append(best)
        a, b = best
        for rec in words:
            if a in rec[0] and b in rec[0]:
                rec[0] = _merge_word(rec[0], a, b)
    return merges


def learn_bpe(df: DataFrame, n_merges: int, text_col: str = "text",
              v_words: int = 100_000) -> Tuple[List[Tuple[str, str]], dict]:
    """Distributed count + driver learn.  Returns (merges, report);
    report carries the coverage accounting of the v_words cap (the
    only approximation — dropped-tail token mass is reported, never
    silent)."""
    wf = word_freqs(df, text_col)
    top = (wf.orderBy(F.col("freq").desc(), "word").limit(v_words)
           .collect())
    totals = wf.agg(F.sum("freq").alias("t"),
                    F.count("*").alias("v")).collect()[0]
    kept_mass = sum(r["freq"] for r in top)
    merges = learn_bpe_from_freqs([(r["word"], r["freq"]) for r in top],
                                  n_merges)
    report = {
        "n_merges": len(merges),
        "vocab_words_total": int(totals["v"] or 0),
        "vocab_words_kept": len(top),
        "token_mass_total": int(totals["t"] or 0),
        "token_mass_kept": int(kept_mass),
    }
    return merges, report


# ---------------------------------------------------------------------------
# cluster-side encoding
# ---------------------------------------------------------------------------

def encode_word(word: str, ranks: Dict[Tuple[str, str], int]) -> List[str]:
    """Standard BPE encode: repeatedly merge the lowest-rank adjacent
    pair until none applies."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def apply_bpe(df: DataFrame, merges: Sequence[Tuple[str, str]],
              text_col: str = "text",
              out_col: str = "bpe_tokens") -> DataFrame:
    """Zero-shuffle encode: Arrow-batched pandas UDF over the text
    column, merge ranks broadcast via closure, per-batch memo over
    distinct words (Zipf hit rate makes this ~O(distinct words), not
    O(tokens)).  Adds ``out_col`` (array<string>)."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        memo: Dict[str, List[str]] = {}

        def one(t: Optional[str]):
            if t is None:
                return None
            out: List[str] = []
            for w in t.strip().lower().split():
                got = memo.get(w)
                if got is None:
                    got = memo[w] = encode_word(w, ranks)
                out.extend(got)
            return out

        return texts.map(one)

    return df.withColumn(out_col, enc(F.col(text_col)))
