"""Round-3 late additions: PII redaction, host analytics, duplicated
n-gram fraction, and the composed quality filter."""

import pytest
from pyspark.sql import functions as F

from gopie_spark.operators.hoststats import (extract_domain, extract_host,
                                             filter_blocklist,
                                             host_budget_sample, host_stats)
from gopie_spark.operators.redact import (pii_counts, pii_stats, redact_pii,
                                          scrub)
from gopie_spark.operators.textstats import (QUALITY_FILTER_FLAGS,
                                             dup_ngram_stats, quality_filter)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# -- redact -------------------------------------------------------------------

def test_redact_known_strings(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b+c@foo.example.org now"),
         (2, "call +44 123 4567 890 or +1-555-0100"),
         (3, "server at 192.168.0.1 and 10.0.0.255."),
         (4, "version 1.2 costs 3.4.5 dollars"),  # not an IP (needs 4 octets)
         (5, "no pii here")],
        "id long, text string")
    out = {r["id"]: r for r in
           pii_stats(df).withColumn("red", redact_pii("text")).collect()}
    assert out[1]["n_email"] == 1 and out[1]["red"] == "mail <EMAIL> now"
    assert out[2]["n_phone"] == 2 and "<PHONE>" in out[2]["red"]
    assert out[3]["n_ipv4"] == 2
    assert out[3]["red"] == "server at <IP> and <IP>."
    assert out[4]["n_pii"] == 0 and out[4]["red"] == out[4]["text"]
    assert out[5]["n_pii"] == 0


def test_redact_idempotent(spark, docs):
    planted = docs.withColumn(
        "text", F.concat(F.col("text"), F.lit(" x@y.zz 1.2.3.4 +1 222 3333")))
    once = scrub(planted).select("doc_id", F.col("text").alias("t1"))
    twice = scrub(scrub(planted)).select("doc_id", F.col("text").alias("t2"))
    joined = once.join(twice, "doc_id")
    assert joined.filter(F.col("t1") != F.col("t2")).count() == 0


def test_redact_plan_no_shuffle(spark, docs):
    plan = scrub(pii_stats(docs))._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# -- hoststats ----------------------------------------------------------------

def _urls(docs):
    return docs.withColumn("url", F.concat(
        F.lit("https://"), F.col("source"), F.lit("-"),
        F.pmod(F.col("doc_id"), F.lit(3)).cast("string"),
        F.lit(".Example.COM/page/"), F.col("doc_id").cast("string")))


def test_extract_host_and_domain(spark):
    df = spark.createDataFrame(
        [("https://A.b.Example.com:8080/x?q=1",),
         ("http://example.org/",),
         ("ftp://files.example.net",),
         ("not a url",)], "url string")
    rows = df.select(extract_host("url").alias("h"),
                     extract_domain("url").alias("d")).collect()
    assert [(r["h"], r["d"]) for r in rows] == [
        ("a.b.example.com", "example.com"),
        ("example.org", "example.org"),
        ("files.example.net", "example.net"),
        ("", "")]


def test_blocklist_host_and_domain(spark, docs):
    d = _urls(docs)
    n = d.count()
    kept = filter_blocklist(d, ["src0-1.example.com"])
    blocked_n = d.filter(
        extract_host("url") == "src0-1.example.com").count()
    assert kept.count() == n - blocked_n and blocked_n > 0
    # domain match blocks every synthetic host
    assert filter_blocklist(d, ["example.com"], match_domain=True) \
        .count() == 0
    # blocklist join is broadcast — corpus side never exchanges
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_host_budget_cap_and_determinism(spark, docs):
    d = _urls(docs)
    out = host_budget_sample(d, 2, seed=3)
    per_host = (out.withColumn("h", extract_host("url"))
                .groupBy("h").count().collect())
    assert per_host and all(r["count"] <= 2 for r in per_host)
    again = host_budget_sample(d.repartition(7), 2, seed=3)
    assert sorted(r["doc_id"] for r in out.select("doc_id").collect()) == \
        sorted(r["doc_id"] for r in again.select("doc_id").collect())


def test_host_stats_counts(spark, docs):
    d = _urls(docs)
    total = sum(r["n_docs"] for r in host_stats(d).collect())
    assert total == d.count()


# -- dup-ngram fraction -------------------------------------------------------

def test_dup_ngram_planted(spark):
    # doc 1 and 2 share their full 5 tokens -> every 4-gram duplicated;
    # doc 3 disjoint -> 0; doc 4 too short -> no grams, null frac.
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "p q r s t u"),
         (4, "x y z")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in dup_ngram_stats(df, n=4).collect()}
    assert rows[1]["n_grams"] == 2 and rows[1]["dup_frac_e6"] == 1000000
    assert rows[2]["dup_frac_e6"] == 1000000
    assert rows[3]["n_grams"] == 3 and rows[3]["dup_frac_e6"] == 0
    assert rows[4]["n_grams"] == 0 and rows[4]["dup_frac_e6"] is None


def test_dup_ngram_hash_tier_equal(spark, docs):
    a = dup_ngram_stats(docs, n=4).select(
        "doc_id", "n_grams", "dup_frac_e6")
    b = dup_ngram_stats(docs, n=4, hash_grams=True).select(
        "doc_id", "n_grams", "dup_frac_e6")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# -- composed quality filter --------------------------------------------------

def test_quality_filter_planted(spark):
    long_good = ("the quick brown fox jumps over a lazy dog and then "
                 "runs far away to find some more interesting things "
                 "that it can chase in the big wide world every day")
    df = spark.createDataFrame(
        [(1, long_good),
         (2, "tiny doc"),                      # short
         (3, ("spam " * 40).strip()),          # repetitive: ttr + top_token
         (4, "1 2 3 4 5 6 7 8 9 0 " * 3)],     # no alpha, no stopwords
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in quality_filter(df).collect()}
    assert rows[1]["keep"] and rows[1]["drop_reasons"] == 0
    assert not rows[2]["keep"] and rows[2]["flag_short"]
    assert not rows[3]["keep"]
    assert rows[3]["flag_ttr"] and rows[3]["flag_top_token"]
    assert not rows[4]["keep"] and rows[4]["flag_alpha"]
    # bitmask agrees with the flags
    for r in rows.values():
        mask = sum(1 << i for i, nm in enumerate(QUALITY_FILTER_FLAGS)
                   if r[f"flag_{nm}"])
        assert r["drop_reasons"] == mask


def test_quality_filter_plan_zero_shuffle(spark, docs):
    plan = quality_filter(docs)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Exchange" not in plan and "Generate" not in plan


# -- product quantization -----------------------------------------------------

def test_pq_codebooks_deterministic(spark, sf_dir):
    from gopie_spark.operators.similarity import train_pq_codebooks
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    b1 = train_pq_codebooks(emb, m=8, n_codes=16)
    b2 = train_pq_codebooks(emb, m=8, n_codes=16)
    assert b1.shape == (8, 16, 8)
    assert (b1 == b2).all()
    with pytest.raises(ValueError):
        train_pq_codebooks(emb, m=7)
    with pytest.raises(ValueError):  # uint8 code cap, fail fast
        train_pq_codebooks(emb, m=8, n_codes=300)
    with pytest.raises(ValueError):
        from gopie_spark.operators.similarity import pq_encode
        import numpy as np
        pq_encode(emb, np.zeros((8, 300, 8)))


def test_pq_encode_shape_and_range(spark, sf_dir):
    from gopie_spark.operators.similarity import (pq_encode,
                                                  train_pq_codebooks)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = train_pq_codebooks(emb, m=8, n_codes=16)
    rows = pq_encode(emb, books).select("vec_id", "pq_code").collect()
    assert len(rows) == emb.count()
    assert all(len(r["pq_code"]) == 8 for r in rows)
    assert all(max(r["pq_code"]) < 16 for r in rows)
    # byte-stable across partitionings
    again = {r["vec_id"]: bytes(r["pq_code"]) for r in
             pq_encode(emb.repartition(5), books)
             .select("vec_id", "pq_code").collect()}
    assert all(again[r["vec_id"]] == bytes(r["pq_code"]) for r in rows)


def test_pq_topk_recall_vs_exact(spark, sf_dir):
    from pyspark.sql import functions as SF
    from gopie_spark.operators.similarity import (brute_force_topk,
                                                  pq_topk)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(SF.col("vec_id") < 10)
    exact = {(r["query_id"], r["match_id"])
             for r in brute_force_topk(spark, emb, q, k=5).collect()}
    approx = pq_topk(spark, emb, q, k=5, m=8, n_codes=16, refine=10)
    got = {(r["query_id"], r["match_id"]) for r in approx.collect()}
    assert len(exact & got) / len(exact) >= 0.75
    # exact refinement: every returned cosine is the true cosine and
    # per-query result count is k
    per_q = {}
    for qid, _ in got:
        per_q[qid] = per_q.get(qid, 0) + 1
    assert all(v == 5 for v in per_q.values()) and len(per_q) == 10


def test_pq_index_roundtrip(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as SF
    from gopie_spark.operators.similarity import (build_pq_index,
                                                  load_pq_codebooks,
                                                  pq_topk, pq_topk_indexed)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(SF.col("vec_id") < 5)
    idx = str(tmp_path / "pqidx")
    books = build_pq_index(emb, idx, m=8, n_codes=16)
    assert (load_pq_codebooks(spark, idx) == books).all()
    inline = sorted(map(tuple,
                        pq_topk(spark, emb, q, k=5, refine=10,
                                codebooks=books)
                        .select("query_id", "match_id", "rank").collect()))
    stored = sorted(map(tuple,
                        pq_topk_indexed(spark, idx, emb, q, k=5, refine=10)
                        .select("query_id", "match_id", "rank").collect()))
    assert inline == stored and len(inline) == 25


# -- end-to-end curation job --------------------------------------------------

def test_filter_corpus_curate(spark, docs):
    import sys
    sys.path.insert(0, "/root/repo/jobs")
    from filter_corpus import curate
    d = _urls(docs)
    ev = docs.filter(F.pmod("doc_id", F.lit(50)) == 0) \
        .select("doc_id", "text")
    out, rep = curate(spark, d, blocklist=["src0-1.example.com"],
                      per_host_cap=20, eval_df=ev)
    # monotone per-stage accounting down to the output
    stages = ["input_rows", "after_quality", "after_blocklist",
              "after_host_budget", "after_exact_dedup",
              "after_near_dedup", "after_decontaminate"]
    vals = [rep[s] for s in stages]
    assert vals == sorted(vals, reverse=True)
    assert rep["output_rows"] == vals[-1] == out.count()
    assert sum(rep["quality_drop_reasons"].values()) >= \
        rep["input_rows"] - rep["after_quality"]
    # survivors: no blocked host, budget respected, text scrubbed
    assert out.filter(
        extract_host("url") == "src0-1.example.com").count() == 0
    per_host = out.groupBy(extract_host("url").alias("h")).count()
    assert all(r["count"] <= 20 for r in per_host.collect())
    assert set(d.columns) <= set(out.columns)
    # the per-stage report must not recompute the pipeline per count:
    # the survivors frame comes back persisted (each counted stage
    # caches itself and releases its predecessor)
    assert out.storageLevel.useMemory or out.storageLevel.useDisk
    out.unpersist()


# -- bigram LM corpus-fit score -----------------------------------------------

def test_lm_score_planted(spark):
    from gopie_spark.operators.textstats import add_lm_score
    common = "the cat sat on the mat"
    df = spark.createDataFrame(
        [(i, common) for i in range(1, 9)] +
        [(9, "zq xv qj kw pz vb"), (10, "one"), (11, "")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in add_lm_score(df, v=20).collect()}
    # the repeated doc's bigrams are corpus-frequent -> higher mean
    # log-prob than the one-off gibberish doc
    assert rows[1]["avg_logp_e6"] > rows[9]["avg_logp_e6"]
    assert rows[1]["avg_logp_e6"] == rows[8]["avg_logp_e6"]
    # <2 tokens -> no bigrams -> null score
    assert rows[10]["n_bigrams"] == 0 and rows[10]["avg_logp_e6"] is None
    assert rows[11]["n_bigrams"] == 0


def test_lm_score_partitioning_invariant(spark, docs):
    from gopie_spark.operators.textstats import add_lm_score
    cols = ("doc_id", "n_bigrams", "sum_logp_e6", "avg_logp_e6")
    a = sorted(map(tuple, add_lm_score(docs, v=30)
                   .select(*cols).collect()))
    b = sorted(map(tuple, add_lm_score(docs.repartition(13), v=30)
                   .select(*cols).collect()))
    assert a == b


# -- mixture sampling ---------------------------------------------------------

def test_mixture_sample_quotas(spark, docs):
    from gopie_spark.operators.sampling import mixture_sample
    targets = {"en": 10, "de": 4, "zh": 2}
    out = mixture_sample(docs, targets, "lang", seed=5)
    got = {r["lang"]: r["count"]
           for r in out.groupBy("lang").count().collect()}
    assert got == targets
    # deterministic across partitionings
    again = mixture_sample(docs.repartition(9), targets, "lang", seed=5)
    assert sorted(r["doc_id"] for r in out.select("doc_id").collect()) == \
        sorted(r["doc_id"] for r in again.select("doc_id").collect())
    # quota larger than the stratum takes it whole; absent strata empty
    big = mixture_sample(docs, {"de": 10**6, "xx": 3}, "lang")
    n_de = docs.filter(F.col("lang") == "de").count()
    assert big.count() == n_de
    with pytest.raises(ValueError):
        mixture_sample(docs, {}, "lang")
    with pytest.raises(ValueError):
        mixture_sample(docs, {"en": -1}, "lang")


def test_lm_plan_broadcast_counts_no_python(spark, docs):
    from gopie_spark.operators.textstats import add_lm_score
    plan = add_lm_score(docs, v=20)._jdf.queryExecution() \
        .executedPlan().toString()
    # vocab-bounded count tables join via explicit broadcast; the whole
    # pipeline stays JVM-side
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_canonical_url_cases(spark):
    from gopie_spark.operators.hoststats import canonical_url
    cases = {
        "HTTPS://Ex.COM:443/A/B/?utm_source=x&q=1#f": "https://ex.com/A/B?q=1",
        "http://ex.com:80/": "http://ex.com",
        "https://ex.com/p?utm_a=1&utm_b=2&c=3": "https://ex.com/p?c=3",
        "https://ex.com/p?c=3&utm_a=1": "https://ex.com/p?c=3",
        # a long RUN of adjacent tracked params must vanish in ONE
        # global pass (a per-param pattern only removes alternating
        # params per pass — regression for the fixed-4-iteration bug)
        "https://ex.com/p?" + "&".join(
            f"utm_{chr(97 + i)}=x" for i in range(20)) + "&q=1":
            "https://ex.com/p?q=1",
        "https://ex.com/p?q=1&" + "&".join(
            f"utm_{chr(97 + i)}=x" for i in range(20)):
            "https://ex.com/p?q=1",
        "https://ex.com/p?fbclid=z": "https://ex.com/p",
        "https://ex.com/p/": "https://ex.com/p",
        "http://ex.com:8080/x": "http://ex.com:8080/x",
        "not a url": "not a url",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r["url"]: r["c"] for r in
           df.select("url", canonical_url("url").alias("c")).collect()}
    assert got == cases
    # idempotent
    df2 = df.select(canonical_url("url").alias("url"))
    twice = {r["url"]: r["c"] for r in
             df2.select("url", canonical_url("url").alias("c")).collect()}
    assert all(k == v for k, v in twice.items())


# -- bucketed co-location -----------------------------------------------------

def test_bucketed_join_no_shuffle(spark, docs, tmp_path):
    from gopie_spark.sources.bucketed import (co_located_join,
                                              write_bucketed)
    sigs = docs.select("doc_id", F.md5("text").alias("digest"))
    write_bucketed(docs, "t_docs_b", ["doc_id"], 8,
                   path=str(tmp_path / "docs_b"))
    write_bucketed(sigs, "t_sigs_b", ["doc_id"], 8,
                   path=str(tmp_path / "sigs_b"))
    try:
        # groupBy on the bucket column: no shuffle at all
        agg_plan = (spark.table("t_docs_b").groupBy("doc_id").count()
                    ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in agg_plan
        # join of two same-bucketed tables: SortMergeJoin with zero
        # shuffle (disable broadcast so toy-scale AQE can't hide the
        # property being pinned)
        with_conf = spark.conf
        old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = co_located_join(spark, "t_docs_b", "t_sigs_b",
                                ["doc_id"])
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan
            assert j.count() == docs.count()
        finally:
            with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_docs_b")
        spark.sql("DROP TABLE IF EXISTS t_sigs_b")


# -- duplicated-span removal --------------------------------------------------

def test_remove_duplicate_spans_planted(spark):
    from gopie_spark.operators.textstats import remove_duplicate_spans
    df = spark.createDataFrame(
        [(1, "aa bb cc dd unique1 tail1"),
         (2, "aa bb cc dd unique2 tail2"),
         (3, "solo words only here"),
         (4, "x y"),                       # shorter than n: untouched
         (5, ""),
         (6, None),
         (7, "AA BB CC DD case folded key")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["clean_text"] for r in
           remove_duplicate_spans(df, n=4, min_count=2).collect()}
    assert out[1] == "unique1 tail1" and out[2] == "unique2 tail2"
    assert out[3] == "solo words only here"
    assert out[4] == "x y" and out[5] == "" and out[6] is None
    # case-folded span key, original-case survivors
    assert out[7] == "case folded key"


def test_remove_duplicate_spans_overlap_and_idempotence(spark):
    from gopie_spark.operators.textstats import remove_duplicate_spans
    # overlapping duplicated spans merge: "a b c d e" appears twice
    # with one-token offsets -> whole overlap region removed
    df = spark.createDataFrame(
        [(1, "p a b c d e q"), (2, "r a b c d e s")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["clean_text"] for r in
           remove_duplicate_spans(df, n=4, min_count=2).collect()}
    assert out[1] == "p q" and out[2] == "r s"
    # second pass removes nothing further (the dup spans are gone)
    again = remove_duplicate_spans(
        df.sparkSession.createDataFrame(
            [(k, v) for k, v in out.items()], "doc_id long, text string"),
        n=4, min_count=2)
    assert {r["doc_id"]: r["clean_text"] for r in again.collect()} == out


# -- token-budget sampling ----------------------------------------------------

def test_token_budget_sample(spark, docs):
    from gopie_spark.operators.sampling import token_budget_sample
    out = token_budget_sample(docs, 20000, "n_chars", ["lang"], seed=3)
    # nesting: a larger budget keeps a superset (checkpointed cuts nest)
    bigger = token_budget_sample(docs, 40000, "n_chars", ["lang"], seed=3)
    small_ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    big_ids = {r["doc_id"] for r in bigger.select("doc_id").collect()}
    assert small_ids <= big_ids
    # a stratum below budget is kept whole
    totals = {r["lang"]: r["t"] for r in
              docs.groupBy("lang").agg(F.sum("n_chars").alias("t"))
              .collect()}
    huge = token_budget_sample(docs, 10**9, "n_chars", ["lang"])
    assert huge.count() == docs.count()
    # sampled weight lands near budget for strata above it
    got = {r["lang"]: r["w"] for r in
           bigger.groupBy("lang").agg(F.sum("n_chars").alias("w"))
           .collect()}
    for lang, t in totals.items():
        if t > 80000:  # well above budget -> concentration check
            assert abs(got[lang] - 40000) < 0.35 * 40000
    with pytest.raises(ValueError):
        token_budget_sample(docs, 0, "n_chars")


def test_token_budget_sample_null_stratum(spark):
    # a NULL stratum value is a real group: the totals join must be
    # null-safe or the row silently vanishes even at keep-prob 1
    from gopie_spark.operators.sampling import token_budget_sample
    df = spark.createDataFrame(
        [(1, "en", 10), (2, "en", 10), (3, None, 10)],
        "doc_id int, lang string, n_chars int")
    out = token_budget_sample(df, 10**6, "n_chars", ["lang"], seed=1)
    assert {r["doc_id"] for r in out.collect()} == {1, 2, 3}
    assert set(out.columns) == {"doc_id", "lang", "n_chars"}
