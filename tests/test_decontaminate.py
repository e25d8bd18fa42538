"""Eval-set decontamination (operators/decontaminate.py).

The contract under test: the Bloom-gated two-stage pipeline equals the
all-exact n-gram join — the gate may only ADD candidates (superset), the
exact verify removes every one of them.
"""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import Row, functions as F

from gopie_spark.operators.decontaminate import (
    add_contamination_hits,
    build_eval_gram_filter,
    decontaminate,
    decontaminate_keep,
    ngram_strings,
)


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t)
                                  for i, t in enumerate(rows)])


def _exact_flags(spark, train, eval_df, n, min_hits):
    """All-exact reference: explode every gram of both sides, join."""
    eg = eval_df.select(F.explode(ngram_strings("text", n)).alias("g")) \
        .distinct()
    tg = train.select("doc_id", F.explode(ngram_strings("text", n))
                      .alias("g"))
    return (tg.join(eg, "g").groupBy("doc_id")
            .agg(F.countDistinct("g").alias("n_matched"))
            .filter(F.col("n_matched") >= min_hits)
            .orderBy("doc_id"))


VOCAB = [f"w{i}" for i in range(40)]


def _synth_corpus(seed=7, n_docs=120, dup_every=9):
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n_docs):
        toks = rng.choice(VOCAB, size=int(rng.integers(4, 30)))
        texts.append(" ".join(toks))
    # plant exact shared spans: doc i copies a 10-token span of doc i-dup
    for i in range(dup_every, n_docs, dup_every):
        src = texts[i - dup_every].split()
        if len(src) >= 10:
            texts[i] = texts[i] + " " + " ".join(src[:10])
    return texts


@pytest.mark.parametrize("n,min_hits", [(5, 1), (5, 3), (8, 1)])
def test_decontaminate_equals_exact_join(spark, n, min_hits):
    texts = _synth_corpus()
    docs = _docs(spark, texts)
    ev = docs.filter(F.pmod("doc_id", F.lit(4)) == 0)
    tr = docs.filter(F.pmod("doc_id", F.lit(4)) != 0)
    got = decontaminate(tr, ev, n=n, min_hits=min_hits).orderBy("doc_id")
    want = _exact_flags(spark, tr, ev, n, min_hits)
    assert [tuple(r) for r in got.collect()] == \
        [tuple(r) for r in want.collect()]


def test_bloom_gate_is_superset_of_exact(spark):
    texts = _synth_corpus(seed=11)
    docs = _docs(spark, texts)
    ev = docs.filter(F.col("doc_id") < 30)
    tr = docs.filter(F.col("doc_id") >= 30)
    sketch, blob = build_eval_gram_filter(ev, n=5)
    gated = add_contamination_hits(tr, sketch, blob, n=5)
    gate_hits = {r["doc_id"]: r["bloom_gram_hits"]
                 for r in gated.collect()}
    exact = {r["doc_id"]: r["n_matched"]
             for r in _exact_flags(spark, tr, ev, 5, 1).collect()}
    for doc_id, m in exact.items():
        assert gate_hits[doc_id] >= m, \
            f"gate dropped true match doc={doc_id}"


def test_short_docs_and_empty_text_contribute_nothing(spark):
    docs = _docs(spark, ["a b c", "", "   ", "a b c d e f g h",
                         "a b c d e f g h extra tail"])
    ev = docs.filter(F.col("doc_id") <= 2)     # all shorter than n=8
    tr = docs.filter(F.col("doc_id") > 2)
    out = decontaminate(tr, ev, n=8).collect()
    assert out == []
    # and an 8-token eval doc does flag its 8-gram copies
    ev2 = docs.filter(F.col("doc_id") == 3)
    tr2 = docs.filter(F.col("doc_id") == 4)
    out2 = decontaminate(tr2, ev2, n=8).collect()
    assert [(r["doc_id"], r["n_matched"]) for r in out2] == [(4, 1)]


def test_case_and_whitespace_normalization(spark):
    base = " ".join(f"t{i}" for i in range(12))
    docs = _docs(spark, [base.upper(), "  " + base.replace(" ", "   ")])
    ev = docs.filter(F.col("doc_id") == 0)
    tr = docs.filter(F.col("doc_id") == 1)
    out = decontaminate(tr, ev, n=8).collect()
    assert len(out) == 1 and out[0]["n_matched"] == 5  # 12-8+1 grams


def test_decontaminate_keep_is_complement(spark):
    texts = _synth_corpus(seed=3)
    docs = _docs(spark, texts)
    ev = docs.filter(F.pmod("doc_id", F.lit(4)) == 0)
    tr = docs.filter(F.pmod("doc_id", F.lit(4)) != 0)
    flagged = {r["doc_id"]
               for r in decontaminate(tr, ev, n=5).collect()}
    kept = {r["doc_id"]
            for r in decontaminate_keep(tr, ev, n=5).collect()}
    all_train = {r["doc_id"] for r in tr.select("doc_id").collect()}
    assert kept == all_train - flagged
    assert flagged  # corpus has planted spans — gate must fire


def test_filter_sizing_and_fpr_bound():
    # the built filter's projected FPR at its sizing n stays <= p
    sketch = None
    from gopie_spark.kernels.bloom import BloomBit
    sketch = BloomBit.from_guess(10_000, 1e-6)
    assert sketch.guess_false_positive(10_000) <= 1e-6 * 1.0001
