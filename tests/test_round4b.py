"""Round-4b additions: paragraph-level keep-first dedup, semantic
(k-means-cell) embedding dedup, overlap-fraction decontamination, and
the t-digest quantile gate."""

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def plan_text(df, mode="formatted"):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode)


# -- paragraph dedup ----------------------------------------------------------

@pytest.fixture(scope="module")
def para_docs(spark):
    """The corpus re-lined: every 12 tokens become one newline-separated
    paragraph, so paragraph-level ops have real cross-doc duplicates to
    chew on (the synthetic text itself has no newlines)."""
    from gopie_spark.operators.textstats import chunk_documents
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    chunks = chunk_documents(docs, max_tokens=12, out_col="para")
    return (chunks.groupBy("doc_id")
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("chunk_idx", "para"))),
                    lambda s: s["para"]),
                "\n").alias("text"))
            .localCheckpoint())


def test_dedup_paragraphs_keep_first_semantics(spark):
    """Corpus-wide first occurrence wins — across docs, within a doc,
    and for the doc whose every paragraph appeared earlier (rebuilds to
    the empty string, CCNet convention)."""
    from gopie_spark.operators.dedup import dedup_paragraphs
    rows = [
        (1, "alpha beta\ncommon para\nunique one"),
        (2, "common para\ngamma delta"),
        (3, "common para"),
        (4, ""),
        (5, "alpha beta\nalpha beta"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["clean_text"], r["n_paras"], r["n_paras_kept"])
           for r in dedup_paragraphs(df).collect()}
    assert got[1] == ("alpha beta\ncommon para\nunique one", 3, 3)
    assert got[2] == ("gamma delta", 2, 1)
    assert got[3] == ("", 1, 0)
    assert got[4] == ("", 0, 0)
    assert got[5] == ("", 2, 0)
    assert got[6] == ("", 0, 0)


def test_dedup_paragraphs_trim_keeps_digits(spark):
    """Regression: the split callback must be a 1-arg lambda — a bare
    F.trim in transform() would receive the element INDEX as a trim
    character set and silently strip digits from paragraph edges."""
    from gopie_spark.operators.dedup import dedup_paragraphs
    df = spark.createDataFrame([(1, "0 leading digit\n1 also digits 1")],
                               "doc_id long, text string")
    out = dedup_paragraphs(df).collect()[0]
    assert out["clean_text"] == "0 leading digit\n1 also digits 1"


def test_dedup_paragraphs_hash_tier_byte_equal(spark, para_docs):
    """hash_keys=True (8-byte xxhash64 shuffle keys) must be
    byte-identical to the raw-string tier on real data, and only the
    hash tier's plan may contain xxhash64."""
    from gopie_spark.operators.dedup import dedup_paragraphs
    cols = ["doc_id", "clean_text", "n_paras", "n_paras_kept"]
    hashed = dedup_paragraphs(para_docs, hash_keys=True).select(cols)
    strings = dedup_paragraphs(para_docs, hash_keys=False).select(cols)
    assert hashed.exceptAll(strings).count() == 0
    assert strings.exceptAll(hashed).count() == 0
    assert "xxhash64" in plan_text(hashed, "extended")
    assert "xxhash64" not in plan_text(strings, "extended")


def test_dedup_paragraphs_exploded_plan_no_window(spark, para_docs):
    """The keep-first winner selection must be the partial-aggregable
    min(struct) groupBy + join-back — never a row_number window (which
    would shuffle every occurrence AND sort every group)."""
    from gopie_spark.operators.dedup import dedup_paragraphs_exploded
    exploded = para_docs.select(
        "doc_id", F.posexplode(F.split("text", "\n"))
        .alias("para_idx", "para"))
    kept = dedup_paragraphs_exploded(exploded)
    plan = plan_text(kept, "simple")
    assert "Window" not in plan
    # min(struct) lowers to SortAggregate, but the property that matters
    # at 10^12 paragraphs is the map-side combine: a partial_min must
    # run BEFORE the exchange so the shuffle carries ~one row per
    # distinct paragraph per partition
    pre_exchange = plan.split("Exchange hashpartitioning(_pk")[1]
    assert "partial_min" in pre_exchange
    # dedup must actually drop the later copies on this corpus
    assert kept.count() < exploded.count()


# -- overlap-fraction decontamination -----------------------------------------

def test_contamination_overlap_fractions(spark):
    """Planted overlap: doc 1 shares half its 2-grams with eval, doc 2
    none, doc 3 all; the report must be exact and the threshold policy
    must cut exactly the docs at/above max_frac."""
    from gopie_spark.operators.decontaminate import (
        contamination_overlap, decontaminate_overlap_keep)
    ev = spark.createDataFrame([(100, "a b c")],
                               "doc_id long, text string")
    tr = spark.createDataFrame(
        [(1, "a b x y"),        # grams {a b, b x, x y}; matched {a b}
         (2, "p q r s"),        # no overlap
         (3, "a b c"),          # grams {a b, b c} both in eval
         (4, "tiny")],          # fewer than n tokens -> 0 grams
        "doc_id long, text string")
    ov = {r["doc_id"]: (r["n_grams"], r["n_matched"])
          for r in contamination_overlap(tr, ev, n=2).collect()}
    assert ov == {1: (3, 1), 2: (3, 0), 3: (2, 2), 4: (0, 0)}
    kept = {r["doc_id"] for r in
            decontaminate_overlap_keep(tr, ev, max_frac=0.5, n=2)
            .collect()}
    assert kept == {1, 2, 4}  # doc 3 (frac 1.0) cut; doc 1 (1/3) kept
    kept_strict = {r["doc_id"] for r in
                   decontaminate_overlap_keep(tr, ev, max_frac=0.3, n=2)
                   .collect()}
    assert kept_strict == {2, 4}


def test_contamination_overlap_equals_allexact(spark):
    """On the real corpus the Bloom-gated report must equal the exact
    n-gram join recomputed via the ngram_strings surface (gate is a
    superset + exact verify: equality is the designed invariant)."""
    from gopie_spark.operators.decontaminate import (contamination_overlap,
                                                     ngram_strings)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    tr = docs.filter(F.col("doc_id") % 10 != 0)
    got = contamination_overlap(tr, ev, n=6).select(
        "doc_id", "n_grams", "n_matched")
    eg = ev.select(F.explode(ngram_strings("text", 6)).alias("g")).distinct()
    tg = tr.select("doc_id",
                   F.explode(ngram_strings("text", 6)).alias("g")).distinct()
    exact = (tr.select("doc_id")
             .join(tg.groupBy("doc_id").agg(F.count("*").alias("n_grams")),
                   "doc_id", "left")
             .join(tg.join(eg, "g").groupBy("doc_id")
                   .agg(F.count("*").alias("n_matched")), "doc_id", "left")
             .select("doc_id",
                     F.coalesce("n_grams", F.lit(0)).cast("long")
                     .alias("n_grams"),
                     F.coalesce("n_matched", F.lit(0)).cast("long")
                     .alias("n_matched")))
    assert got.exceptAll(exact).count() == 0
    assert exact.exceptAll(got).count() == 0


def test_contamination_overlap_plan_shape(spark):
    """The train-sized report side must be a pure scan (per-row n_grams
    expression, no Exchange); matched counts arrive via broadcast —
    the corpus itself never shuffles for the report."""
    from gopie_spark.operators.decontaminate import contamination_overlap
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    tr = docs.filter(F.col("doc_id") % 10 != 0)
    plan = plan_text(contamination_overlap(tr, ev, n=8), "simple")
    assert "SortMergeJoin" not in plan
    train_side = plan.split("BroadcastExchange")[0]
    assert "Exchange" not in train_side
    assert "array_distinct" in train_side  # n_grams computed per-row


# -- semantic (k-means-cell) embedding dedup -----------------------------------

@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _exact_cosine_pairs(emb, tau):
    e = emb.select(F.col("vec_id").alias("_id"),
                   F.col("embedding").alias("_v"))
    a, b = e.alias("a"), e.alias("b")
    pairs = a.join(b, F.col("a._id") < F.col("b._id")) \
        .select(F.col("a._id").alias("id_a"),
                F.col("b._id").alias("id_b"),
                F.col("a._v").alias("_va"), F.col("b._v").alias("_vb"))
    dot = F.aggregate(F.zip_with("_va", "_vb",
                                 lambda x, y: x.cast("double") * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(
        F.transform("_va", lambda x: x.cast("double") * x),
        F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(
        F.transform("_vb", lambda x: x.cast("double") * x),
        F.lit(0.0), lambda acc, v: acc + v))
    return {(r["id_a"], r["id_b"]) for r in
            pairs.withColumn("_c", dot / (na * nb))
            .filter(F.col("_c") >= tau).select("id_a", "id_b").collect()}


def test_semantic_dedup_pairs_precision_and_recall(spark, emb):
    """Cell blocking + exact verify: pairs must be a strict subset of
    the exact cosine pairs (precision is a theorem) with recall >= 0.85
    at k=8/spill=3 on the near-uniform embeddings (measured ~0.96)."""
    from gopie_spark.operators.similarity import semantic_dedup_pairs
    exact = _exact_cosine_pairs(emb, 0.3)
    got = {(r["id_a"], r["id_b"]) for r in
           semantic_dedup_pairs(spark, emb, threshold=0.3, n_centroids=8,
                                spill=3, max_bucket=10**6).collect()}
    assert got <= exact
    assert len(got & exact) >= 0.85 * len(exact)
    plan = plan_text(
        semantic_dedup_pairs(spark, emb, threshold=0.3, n_centroids=8,
                             spill=3), "simple")
    assert "CartesianProduct" not in plan


def test_semantic_dedup_single_cell_equals_exact_cc(spark, emb):
    """With one cell the blocking is complete, so semantic_dedup must
    reproduce the exact transitive-closure dedup: survivors = component
    roots of the exact pair graph."""
    from gopie_spark.operators.graph import connected_components
    from gopie_spark.operators.similarity import semantic_dedup
    exact = _exact_cosine_pairs(emb, 0.3)
    pairs_df = spark.createDataFrame(
        [(a, b) for a, b in exact], "id_a long, id_b long")
    comp = connected_components(pairs_df)
    losers = {r["id"] for r in
              comp.filter(F.col("id") != F.col("component")).collect()}
    all_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    want = all_ids - losers
    got = {r["vec_id"] for r in
           semantic_dedup(spark, emb, threshold=0.3, n_centroids=1,
                          spill=1, max_bucket=10**6).collect()}
    assert got == want


def test_semantic_dedup_spill_never_duplicates_pairs(spark, emb):
    """A pair sharing several spill cells must be reported once."""
    from gopie_spark.operators.similarity import semantic_dedup_pairs
    out = semantic_dedup_pairs(spark, emb, threshold=0.3, n_centroids=4,
                               spill=4, max_bucket=10**6)
    assert out.count() == out.select("id_a", "id_b").distinct().count()


# -- sketch-gated quantile band filter ----------------------------------------

def test_quantile_gate_keeps_band(spark):
    """Per-group thresholds must sit within rank error of the target
    quantiles and the kept set must be exactly value-between-thresholds
    (the gate's defining property)."""
    from gopie_spark.operators import quantile_gate
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    kept = quantile_gate(docs, "n_chars", keys=["lang"],
                         q_lo=0.1, q_hi=0.9)
    thr = {r["lang"]: (r["q_lo_val"], r["q_hi_val"])
           for r in kept.select("lang", "q_lo_val", "q_hi_val")
           .distinct().collect()}
    rows = docs.select("lang", "n_chars").collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["n_chars"])
    eps = 0.02
    kept_ids = {(r["lang"], r["doc_id"]) for r in kept.collect()}
    for lang, vals in by_lang.items():
        lo, hi = thr[lang]
        n = len(vals)
        for target, t in ((0.1, lo), (0.9, hi)):
            lt = sum(v < t for v in vals) / n
            le = sum(v <= t for v in vals) / n
            assert lt - eps <= target <= le + eps, (lang, target, lt, le)
    want = {(r["lang"], r["doc_id"]) for r in docs.collect()
            if thr[r["lang"]][0] <= r["n_chars"] <= thr[r["lang"]][1]}
    assert kept_ids == want


def test_quantile_gate_kll_and_global(spark):
    """KLL method + the global (no keys) path both gate sanely: kept
    fraction ~ (q_hi - q_lo) within rank + tie slack."""
    from gopie_spark.operators import quantile_gate
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    kept = quantile_gate(docs, "n_chars", q_lo=0.25, q_hi=0.75,
                         method="kll").count()
    assert 0.3 * n <= kept <= 0.7 * n
    with pytest.raises(ValueError):
        quantile_gate(docs, "n_chars", method="nope")


def test_quantile_gate_plan_broadcasts_thresholds(spark):
    """The gate must broadcast the tiny threshold table onto the corpus
    scan — never shuffle or sort the corpus itself."""
    from gopie_spark.operators import quantile_gate
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    kept = quantile_gate(docs, "n_chars", keys=["lang"])
    plan = plan_text(kept, "simple")
    corpus_side = plan.split("BroadcastExchange")[0]
    assert "BroadcastHashJoin" in plan
    assert "Sort" not in corpus_side


# -- curate(): new optional stages --------------------------------------------

def test_curate_new_stages(spark):
    """length_band + paragraph_dedup + overlap-fraction decontamination
    compose into the pipeline with monotone per-stage accounting, and
    paragraph dedup replaces text with the surviving paragraphs."""
    import sys
    sys.path.insert(0, "/root/repo/jobs")
    from filter_corpus import curate
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ev = docs.filter(F.pmod("doc_id", F.lit(50)) == 0) \
        .select("doc_id", "text")
    out, rep = curate(spark, docs.select("doc_id", "text", "lang"),
                      min_tokens=5, near_dedup=False, eval_df=ev,
                      decontam_max_frac=0.2, paragraph_dedup=True,
                      length_band=(0.05, 0.95))
    stages = ["input_rows", "after_quality", "after_length_band",
              "after_paragraph_dedup", "after_exact_dedup",
              "after_decontaminate"]
    vals = [rep[s] for s in stages]
    assert vals == sorted(vals, reverse=True)
    assert rep["output_rows"] == vals[-1] == out.count()
    # the fraction policy is weaker than exact min_hits=1: strictly
    # more docs survive than under the default policy
    out2, rep2 = curate(spark, docs.select("doc_id", "text", "lang"),
                        min_tokens=5, near_dedup=False, eval_df=ev,
                        paragraph_dedup=True, length_band=(0.05, 0.95))
    assert rep["after_decontaminate"] >= rep2["after_decontaminate"]
    # schema stable; no helper columns leak
    assert out.columns == ["doc_id", "text", "lang"]
    out.unpersist()
    out2.unpersist()


# -- temperature-scaled mixture sampling ---------------------------------------

def test_temperature_quotas_math():
    """Integer-exact quota rule: totals always hit exactly (largest
    remainder), T=1 ~ proportional, large T ~ uniform, errors raise."""
    from gopie_spark.operators.sampling import temperature_quotas
    counts = {"en": 8100, "de": 900, "fr": 100}
    q1 = temperature_quotas(counts, 91, temperature=1.0)
    assert sum(q1.values()) == 91
    assert q1["en"] == 81 and q1["de"] == 9 and q1["fr"] == 1
    q2 = temperature_quotas(counts, 130, temperature=2.0)
    assert sum(q2.values()) == 130
    assert q2 == {"en": 90, "de": 30, "fr": 10}  # sqrt ratio 9:3:1
    qinf = temperature_quotas(counts, 30, temperature=1e9)
    assert sum(qinf.values()) == 30
    assert max(qinf.values()) - min(qinf.values()) <= 1
    import pytest as _pt
    with _pt.raises(ValueError):
        temperature_quotas(counts, -1)
    with _pt.raises(ValueError):
        temperature_quotas(counts, 10, temperature=0)
    with _pt.raises(ValueError):
        temperature_quotas({}, 10)


def test_temperature_mixture_sample_determinism_and_exhaustion(spark):
    """Sample is byte-deterministic across calls; a stratum smaller
    than its quota is taken whole (realized total falls short)."""
    from gopie_spark.operators.sampling import (temperature_mixture_sample,
                                                temperature_quotas)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = sorted(r["doc_id"] for r in
               temperature_mixture_sample(docs, "lang", 50, 2.0,
                                          seed=3).collect())
    b = sorted(r["doc_id"] for r in
               temperature_mixture_sample(docs, "lang", 50, 2.0,
                                          seed=3).collect())
    assert a == b and len(a) == 50
    counts = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    big_total = sum(counts.values()) * 2
    got = temperature_mixture_sample(docs, "lang", big_total, 2.0)
    # every stratum exhausts: the whole corpus comes back, no more
    assert got.count() == sum(counts.values())
    q = temperature_quotas(counts, big_total, 2.0)
    assert sum(q.values()) == big_total  # quotas uncapped by design


def test_semantic_preflight_report(spark, emb):
    """Pre-flight numbers must be internally consistent and flag a
    planted megacluster (all vectors in one cell at n_centroids=1)."""
    from gopie_spark.operators.similarity import semantic_preflight_report
    rep = semantic_preflight_report(emb, n_centroids=8, spill=2,
                                    max_bucket=64)
    n = emb.count()
    assert rep["n_cells"] <= 8
    # spilled assignment: every vector appears in exactly `spill` cells
    total = rep["uncapped_pair_work"]
    assert rep["est_candidate_pairs"] <= total
    assert rep["max_cell_size"] <= n
    assert rep["n_capped"] >= 1  # 500 vecs x2 over 8 cells must cap at 64
    viral = semantic_preflight_report(emb, n_centroids=1, spill=1,
                                      max_bucket=64)
    assert viral["n_cells"] == 1 and viral["max_cell_size"] == n
    assert viral["uncapped_pair_work"] == n * (n - 1) // 2
    assert viral["est_candidate_pairs"] == 64 * 63 // 2


def test_incremental_paragraph_dedup_equals_full_batch(spark, para_docs):
    """Two-phase (history -> store -> new batch) must EXACTLY equal the
    full-batch dedup restricted to the new docs when store ids precede
    new ids, and the store must accumulate each paragraph once."""
    import shutil
    import tempfile
    from gopie_spark.operators.dedup import (dedup_paragraphs,
                                             incremental_paragraph_dedup)
    cols = ["doc_id", "clean_text", "n_paras", "n_paras_kept"]
    old = para_docs.filter(F.col("doc_id") < 250)
    new = para_docs.filter(F.col("doc_id") >= 250)
    store = tempfile.mkdtemp(prefix="para_store_") + "/store"
    try:
        phase1 = incremental_paragraph_dedup(old, store)
        got = incremental_paragraph_dedup(new, store).select(cols)
        full = dedup_paragraphs(para_docs) \
            .filter(F.col("doc_id") >= 250).select(cols)
        assert got.exceptAll(full).count() == 0
        assert full.exceptAll(got).count() == 0
        # phase 1 == plain self-dedup of the history slice
        p1 = phase1.select(cols)
        h = dedup_paragraphs(old).select(cols)
        assert p1.exceptAll(h).count() == 0 and h.exceptAll(p1).count() == 0
        # store: one row per distinct paragraph ever kept, no dups
        st = spark.read.parquet(store)
        assert st.count() == st.distinct().count()
        total_kept = (phase1.agg(F.sum("n_paras_kept")).collect()[0][0]
                      + got.agg(F.sum("n_paras_kept")).collect()[0][0])
        assert st.count() == total_kept
    finally:
        shutil.rmtree(store.rsplit("/", 1)[0], ignore_errors=True)


def test_dedup_corpus_job_paragraph_store_mode(tmp_path):
    """jobs/dedup_corpus.py --paragraph-store as a black box: the
    paragraph stage runs first, its count lands in the report, and the
    store materializes."""
    import glob
    import json
    import os
    import subprocess
    import sys
    out = str(tmp_path / "out")
    pstore = str(tmp_path / "pstore")
    env = dict(os.environ, SPARK_GRAFT_CPUS="8", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "jobs/dedup_corpus.py",
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--output", out, "--paragraph-store", pstore],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=400)
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads(r.stdout.strip().splitlines()[-1])
    assert report["rows_in"] == 500
    assert report["paragraph_store"] == pstore
    assert 0 < report["after_paragraph_dedup"] <= 500
    assert report["after_exact_dedup"] <= report["after_paragraph_dedup"]
    assert glob.glob(f"{out}/*.parquet") and glob.glob(f"{pstore}/*.parquet")


def test_quantile_gate_null_group_kept(spark):
    """A NULL group value is a real group: its rows must gate against
    their own thresholds, not silently vanish in the join."""
    from gopie_spark.operators import quantile_gate
    rows = ([(i, "en", i) for i in range(100)]
            + [(1000 + i, None, i) for i in range(100)])
    df = spark.createDataFrame(rows, "doc_id long, lang string, v long")
    kept = quantile_gate(df, "v", keys=["lang"], q_lo=0.1, q_hi=0.9)
    by = {r["lang"]: 0 for r in kept.collect()}
    for r in kept.collect():
        by[r["lang"]] = by.get(r["lang"], 0) + 1
    assert by.get(None, 0) > 0, "NULL-group rows were dropped"
    assert 60 <= by[None] <= 100 and 60 <= by["en"] <= 100


# -- exact containment pairs ---------------------------------------------------

def test_ngram_containment_catches_subsumption(spark):
    """A short doc quoted whole inside a long one: containment 1.0,
    Jaccard well under a dedup threshold — the pair the symmetric
    measure misses."""
    from gopie_spark.operators.dedup import (ngram_containment_pairs,
                                             ngram_jaccard_pairs)
    short = "the quick brown fox jumps over the lazy dog"
    long = ("completely unrelated opening words here and then " + short
            + " followed by much more unrelated trailing content after")
    df = spark.createDataFrame(
        [(1, long), (2, short), (3, "nothing in common at all here")],
        "doc_id long, text string")
    cont = {(r["id_a"], r["id_b"]): r["containment"]
            for r in ngram_containment_pairs(df, width=3,
                                             threshold=0.9).collect()}
    assert (1, 2) in cont and cont[(1, 2)] >= 0.99
    jac = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(df, width=3,
                                        threshold=0.0).collect()}
    assert jac[(1, 2)] < 0.5  # Jaccard dilutes what containment catches
