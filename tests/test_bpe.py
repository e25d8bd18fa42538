"""BPE learner (operators/bpe.py): distributed count + driver learn +
zero-shuffle encode.

Oracle strategy: an INDEPENDENT naive reference implementation below
(regex-free, string-slice based, written separately from the operator)
learns and encodes the same corpus; merge sequences and encodings must
be identical.  Plus invariants: encode-concat == word (lossless),
pair-count argmax == merge #1, plan gates (pair counts partial-
aggregable; apply_bpe adds no Exchange).
"""
from collections import Counter

import pytest
from pyspark.sql import functions as F

from gopie_spark.operators.bpe import (apply_bpe, bpe_pair_counts,
                                       encode_word, learn_bpe,
                                       learn_bpe_from_freqs, word_freqs)


# -- independent reference (deliberately different structure) ---------------

def _ref_pairs(word_freq):
    c = Counter()
    for w, f in word_freq.items():
        for a, b in zip(w, w[1:]):
            c[(a, b)] += f
    return c


def _ref_learn(word_freq, n_merges):
    """Reference learner over a dict {word: freq}; symbols tracked as
    space-joined strings (vs the operator's tuples)."""
    seqs = {w: " ".join(w) for w in word_freq}
    merges = []
    for _ in range(n_merges):
        c = Counter()
        for w, s in seqs.items():
            parts = s.split(" ")
            for a, b in zip(parts, parts[1:]):
                c[(a, b)] += word_freq[w]
        if not c:
            break
        top = max(c.values())
        pair = min(p for p, n in c.items() if n == top)
        merges.append(pair)
        frm, to = " ".join(pair), "".join(pair)
        for w in seqs:
            # left-to-right non-overlapping on the spaced form
            out, toks = [], seqs[w].split(" ")
            i = 0
            while i < len(toks):
                if i + 1 < len(toks) and (toks[i], toks[i + 1]) == pair:
                    out.append(to)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            seqs[w] = " ".join(out)
        del frm
    return merges


def _ref_encode(word, merges):
    s = " ".join(word)
    for pair in merges:
        toks, out, i = s.split(" "), [], 0
        while i < len(toks):
            if i + 1 < len(toks) and (toks[i], toks[i + 1]) == pair:
                out.append(toks[i] + toks[i + 1])
                i += 2
            else:
                out.append(toks[i])
                i += 1
        s = " ".join(out)
    return s.split(" ") if word else []


CORPUS = {
    "low": 5, "lower": 2, "newest": 6, "widest": 3, "new": 4,
    "bannana": 2, "an": 9, "a": 7, "estimate": 1, "west": 2,
}


def test_learner_matches_reference():
    got = learn_bpe_from_freqs(list(CORPUS.items()), 40)
    want = _ref_learn(CORPUS, 40)
    assert got == want
    assert len(got) >= 10  # the toy corpus supports a real merge run


def test_encode_matches_reference_and_is_lossless():
    merges = learn_bpe_from_freqs(list(CORPUS.items()), 25)
    ranks = {m: i for i, m in enumerate(merges)}
    for w in list(CORPUS) + ["unseen", "lowest", "q", ""]:
        enc = encode_word(w, ranks)
        assert "".join(enc) == w  # lossless
        if w:
            assert enc == _ref_encode(w, merges), w


def test_spark_learn_and_apply(spark, sf_dir):
    """End-to-end over the real documents table: distributed word_freqs
    -> driver learn == reference learn on the collected histogram;
    apply_bpe encodings == reference encodings; token mass accounting
    is exact when v_words covers the vocabulary."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges, report = learn_bpe(docs, n_merges=30, v_words=10_000)
    wf = {r["word"]: r["freq"] for r in word_freqs(docs).collect()}
    assert report["vocab_words_kept"] == report["vocab_words_total"] \
        == len(wf)
    assert report["token_mass_kept"] == report["token_mass_total"]
    assert merges == _ref_learn(wf, 30)

    out = apply_bpe(docs.filter(F.col("doc_id") < 40), merges)
    rows = out.select("doc_id", "text", "bpe_tokens").collect()
    assert rows
    for r in rows:
        if r["text"] is None:
            assert r["bpe_tokens"] is None
            continue
        want = []
        for w in r["text"].strip().lower().split():
            want.extend(_ref_encode(w, merges))
        assert list(r["bpe_tokens"]) == want, r["doc_id"]


def test_pair_counts_argmax_is_first_merge(spark, sf_dir):
    """Distributed iteration-0 pair counts: argmax == the learner's
    merge #1 (same tie-break), and counts match a serial recount."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pc = {r["pair"]: r["cnt"] for r in bpe_pair_counts(docs).collect()}
    wf = {r["word"]: r["freq"] for r in word_freqs(docs).collect()}
    want = {a + b: c for (a, b), c in _ref_pairs(wf).items()}
    assert pc == want
    top = max(pc.values())
    first = min(p for p, c in pc.items() if c == top)
    merges = learn_bpe_from_freqs(list(wf.items()), 1)
    assert "".join(merges[0]) == first


def test_bpe_plan_gates(spark, sf_dir):
    """pair counts: two partial-aggregable hash aggregations (word,
    then pair), no window/sort; apply_bpe adds ZERO Exchange."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = bpe_pair_counts(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "partial_count" in plan or "partial" in plan.lower()
    assert "Window" not in plan and "Sort" not in plan
    plan2 = apply_bpe(docs, [("a", "b")])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan2


def test_learn_tokenizer_job(spark, sf_dir, tmp_path):
    """jobs/learn_tokenizer.py end-to-end: merges.json round-trips into
    apply_bpe; fertility < 1 BPE-token-per-CHAR sanity band and > 1
    token per word only when merges stop early; report accounting."""
    import json
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "jobs"))
    from learn_tokenizer import learn_and_report

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "tok")
    rep = learn_and_report(spark, docs, out, n_merges=40,
                           v_words=10_000, sample_docs=100,
                           id_col="doc_id")
    assert rep["n_merges"] == 40
    assert rep["token_mass_kept"] == rep["token_mass_total"]
    assert rep["fertility_sample_docs"] == 100
    assert rep["fertility_tokens_per_word"] >= 1.0  # can't beat 1/word
    merges = [tuple(m) for m in
              json.load(open(os.path.join(out, "merges.json")))]
    assert len(merges) == 40
    enc = apply_bpe(docs.filter(F.col("doc_id") < 5), merges)
    row = enc.filter(F.col("text").isNotNull()).first()
    assert "".join(row["bpe_tokens"]).replace("", "")  # non-empty
    # fewer merges -> higher (or equal) fertility on the same sample
    rep2 = learn_and_report(spark, docs, str(tmp_path / "tok2"),
                            n_merges=5, v_words=10_000,
                            sample_docs=100, id_col="doc_id")
    assert rep2["fertility_tokens_per_word"] >= \
        rep["fertility_tokens_per_word"]


def test_empty_and_degenerate():
    assert learn_bpe_from_freqs([], 5) == []
    assert learn_bpe_from_freqs([("a", 3)], 5) == []  # no pairs
    assert encode_word("", {}) == []
