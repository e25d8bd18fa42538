"""Physical-plan quality gates.

The engine's scale story rests on specific plan shapes, not just correct
answers.  These tests pin them so a refactor that silently degrades the
plan (full-column scans, lost pushdown, window sorts creeping back into
the dedup path) fails CI even though results stay correct.
"""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def plan_text(df, mode="formatted"):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_sketch_scan_prunes_columns(spark):
    """Stage A of the two-level sketch agg must read ONLY the key+value
    columns — a text-column read on a 100 TB pages table is the
    difference between scanning 2% and 100% of the bytes."""
    from gopie_spark.kernels import HLL
    from gopie_spark.operators.sketch_agg import build_partials
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    partials = build_partials(docs, ["lang"], "doc_id", HLL(p=12))
    plan = plan_text(partials)
    scan = plan[plan.index("Scan parquet"):]
    read_schema = [ln for ln in scan.splitlines()
                   if ln.startswith("ReadSchema")][0]
    assert "doc_id" in read_schema and "lang" in read_schema
    assert "text" not in read_schema and "n_chars" not in read_schema


def test_filter_pushdown_reaches_scan(spark):
    """A filter ahead of the sketch build must land in PushedFilters on
    the parquet scan (partition/row-group pruning at scale)."""
    from gopie_spark.kernels import HLL
    from gopie_spark.operators.sketch_agg import build_partials
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .filter(F.col("lang") == "en")
    partials = build_partials(docs, [], "doc_id", HLL(p=12))
    plan = plan_text(partials)
    pushed = [ln for ln in plan.splitlines()
              if ln.startswith("PushedFilters")][0]
    assert "EqualTo(lang,en)" in pushed


def test_exact_dedup_is_partial_aggregable(spark):
    """exact_dedup must plan as partial+final aggregate (map-side combine
    before the shuffle) with no window operator."""
    from gopie_spark.operators.dedup import exact_dedup
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_text(exact_dedup(docs), "extended")
    assert "partial_min" in plan
    assert "Window" not in plan


def test_lsh_candidates_have_no_window(spark):
    """Bucket-pair generation must not plan a window sort; the cap lives
    inside the (partially aggregable) collect_set aggregate."""
    from gopie_spark.operators.dedup import (minhash_lsh_candidates,
                                             simhash_candidates)
    from gopie_spark.operators.similarity import cosine_dedup_pairs
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(50)
    for df in (minhash_lsh_candidates(docs, k=16, bands=4),
               simhash_candidates(docs),
               cosine_dedup_pairs(spark, emb)):
        assert "Window" not in plan_text(df, "extended")


def test_topk_plans_take_ordered(spark):
    """Exact top-k must plan as TakeOrderedAndProject (distributed
    per-partition top-k + merge), never a global sort."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    df = orders.orderBy(F.desc("o_totalprice")).limit(10)
    assert "TakeOrderedAndProject" in plan_text(df, "simple")


def test_builtin_textstats_stay_in_codegen(spark):
    """token_count / quality_features / fingerprints claim 'built-ins
    only' — their plans must contain no Python evaluation node (the whole
    pipeline stays in whole-stage codegen)."""
    from gopie_spark.operators.textstats import (content_fingerprint,
                                                 quality_features,
                                                 token_count)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plans = [
        plan_text(docs.select(token_count("text").alias("n")), "simple"),
        plan_text(quality_features(docs), "simple"),
        plan_text(docs.select(content_fingerprint("text").alias("fp")),
                  "simple"),
    ]
    for p in plans:
        assert "EvalPython" not in p  # Batch/ArrowEvalPython both absent


def test_cms_jvm_preagg_shuffles_counts_not_rows(spark):
    """The JVM pre-agg CMS path must plan a partial HashAggregate below
    the exchange: the shuffle carries (value, partial count), not rows."""
    events = spark.read.parquet(f"{SF}/events.parquet")
    counted = (events.select(F.col("event_type").alias("v"))
               .groupBy("v").agg(F.count("*").alias("cnt")))
    plan = plan_text(counted, "extended")
    assert "partial_count" in plan


def test_cc_star_round_is_partial_aggregable(spark):
    """One large-star round must plan its neighborhood min as a
    partial+final aggregate (map-side combine) — the property that lets a
    viral component's neighborhood reduce before the shuffle — and no
    window operator anywhere."""
    from gopie_spark.operators.graph import _canon, _star
    edges = _canon(spark.range(100).select(
        F.col("id").alias("_u"), (F.col("id") + 1).alias("_v")))
    plan = plan_text(_star(edges, large=True), "extended")
    assert "partial_min" in plan
    assert "Window" not in plan


def test_salted_probe_join_no_cartesian(spark):
    """The salted ANN probe join must stay an equi-join on
    (bucket, salt) — never a cartesian/broadcast-nested-loop."""
    from gopie_spark.operators.similarity import (_salted_probe_join,
                                                  add_hyperplane_bucket)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    bucketed = add_hyperplane_bucket(emb, "embedding", 6) \
        .select(F.col("vec_id").alias("match_id"),
                F.col("embedding").alias("_cvec"), "lsh_bucket")
    probes = add_hyperplane_bucket(emb.limit(5), "embedding", 6) \
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("_qvec"), "lsh_bucket")
    plan = plan_text(
        _salted_probe_join(probes, bucketed, "lsh_bucket", "match_id", 8),
        "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_scan_prunes_to_id_and_vector(spark):
    """The brute-force ANN corpus scan must read only (id, vector) —
    embeddings tables often carry wide metadata columns."""
    from gopie_spark.operators.similarity import brute_force_topk
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = brute_force_topk(spark, emb, emb.limit(3), k=5)
    plan = plan_text(out)
    scan = plan[plan.index("Scan parquet"):]
    read_schema = [ln for ln in scan.splitlines()
                   if ln.startswith("ReadSchema")][0]
    assert "vec_id" in read_schema and "embedding" in read_schema


def test_latest_n_plan_is_partial_aggregable_no_window_sort(spark):
    """latest_n must compile to two salted ObjectHashAggregate levels
    with map-side partial_collect_list — and NO window sort: at 10^12
    rows a per-key row_number sort is the plan we specifically avoid."""
    from gopie_spark.streaming.conflate import latest_n
    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = plan_text(latest_n(ev, ["user_id"], "ts", 3), "extended")
    assert "partial_collect_list" in plan          # map-side combine
    assert plan.count("Exchange hashpartitioning") == 2  # two levels
    assert "_salt" in plan                          # hot-key salting
    assert "Window" not in plan and "row_number" not in plan


def test_repetition_stats_has_zero_shuffle(spark):
    """repetition_stats is a per-document property — its plan must be a
    pure projection over the scan: NO Exchange, NO aggregate, NO
    explode.  At 10^12 rows this is the difference between a
    scan-speed quality-filter pass and a (doc,token) shuffle."""
    from gopie_spark.operators.textstats import repetition_stats
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_text(repetition_stats(docs))
    assert "Exchange" not in plan
    assert "Generate" not in plan          # no explode
    assert "Aggregate" not in plan.replace("aggregate(", "")  # row fold ok


def test_tfidf_vocab_join_is_broadcast(spark):
    """tfidf_top_terms joins the big (doc,token) side against the <=v-row
    vocabulary — that join must be broadcast (no SortMergeJoin / no
    shuffle of the big side for the join), and the doc-count must ride
    a broadcast nested loop, not a driver collect."""
    from gopie_spark.operators.textstats import tfidf_top_terms
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_text(tfidf_top_terms(docs, v=50, k=3))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_token_budget_sample_corpus_side_never_shuffles(spark):
    """token_budget_sample's corpus side must stay shuffle-free: the
    only Exchange in the plan belongs to the tiny per-stratum totals
    aggregation (partial-aggregable), which then broadcasts back onto
    the scan.  A SortMergeJoin here would shuffle the whole 100-TB
    corpus to apply what is logically a scan-side filter."""
    from gopie_spark.operators.sampling import token_budget_sample
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_text(token_budget_sample(docs, 40000, "n_chars",
                                         ["lang"], seed=7), "extended")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan          # null-safe equi-join keys
    # exactly the totals agg's partial+final pair — nothing else
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" not in plan


def test_canonical_url_is_pure_codegen_scan(spark):
    """canonical_url is chained regexp_replace over the url column —
    zero shuffle, zero Python, one projection over the scan."""
    from gopie_spark.operators.hoststats import canonical_url
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = docs.select(canonical_url(F.concat(
        F.lit("https://h.example.com/p?utm_a=1&q="),
        F.col("doc_id").cast("string"))).alias("u"))
    plan = plan_text(df)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "codegen id" in plan            # whole-stage codegen active


def test_remove_duplicate_spans_no_window_no_cartesian(spark):
    """Substring-level dedup must keep the exact-tier cost contract:
    the heavy-gram join is an equi-join (never cartesian), per-doc span
    starts come from partial-aggregable collect_list (no window sort
    over the corpus), and text rebuild stays JVM-side."""
    from gopie_spark.operators.textstats import remove_duplicate_spans
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_text(remove_duplicate_spans(docs, n=10), "extended")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan
    assert "partial_collect_list" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_quality_filter_is_zero_shuffle_scan(spark):
    """The C4/Gopher rule stack is a per-document predicate — its plan
    must be a pure projection+filter over the scan with no Exchange,
    no Generate, and no Python: at 100 TB this stage runs at scan
    speed or it dominates the whole curation job."""
    from gopie_spark.operators.textstats import quality_filter
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_text(quality_filter(docs))
    assert "Exchange" not in plan
    assert "Generate" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mirror_host_pairs_broadcasts_sizes_no_cartesian(spark):
    """Mirror detection joins on the content digest (work bounded by
    actual duplication): no cartesian/NL join anywhere, host-size
    joins ride broadcasts, and the pair expansion is JVM-side (no
    Python in the plan)."""
    from gopie_spark.operators.hoststats import mirror_host_pairs
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .withColumn("url", F.concat(F.lit("https://h"),
                                    (F.col("doc_id") % 20)
                                    .cast("string"),
                                    F.lit(".example.com/p")))
    plan = plan_text(mirror_host_pairs(docs), "extended")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # both size joins
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sentence_dedup_no_window_hash_keys(spark):
    """Sentence dedup inherits the paragraph tier's shape: no window
    sort over occurrences, partial-aggregable winner agg, xxhash64
    8-byte join keys, no Python."""
    from gopie_spark.operators.dedup import dedup_sentences
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_text(dedup_sentences(docs), "extended")
    assert "Window" not in plan
    assert "xxhash64" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_split_sentences_zero_shuffle_generate(spark):
    """Segmentation is scan-shaped: one Generate, no Exchange, no
    Python."""
    from gopie_spark.operators.textstats import split_sentences
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_text(split_sentences(docs))
    assert "Exchange" not in plan
    assert "Generate" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_token_entropy_two_hash_aggregates_no_window(spark):
    """The entropy fold is two partial-aggregable hash aggregations —
    no window, no extra corpus pass, no Python."""
    from gopie_spark.operators.textstats import token_entropy
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_text(token_entropy(docs, keys=["lang"]), "extended")
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 4  # partial+final x 2 aggs
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pane_engine_plan_two_exchanges_no_row_explode(spark):
    """The pane-based sliding engine's plan: exactly TWO shuffles (the
    pane partial-state aggregation and the window state merge) and the
    Generate (explode) sits ABOVE the first aggregation — it explodes
    pane STATES, never event rows.  The explode engine's plan, by
    contrast, generates below its aggregation (row explode is its
    defining cost)."""
    from gopie_spark.kernels import HLL
    from gopie_spark.operators.windows import windowed_sketch_agg
    events = spark.read.parquet(f"{SF}/events.parquet")
    hll = HLL(p=12)
    panes = windowed_sketch_agg(events, "ts", "user_id", hll,
                                width_s=3600, slide_s=900,
                                engine="panes")
    plan = plan_text(panes, "simple")
    assert plan.count("Exchange") == 2, plan[:3000]
    # the generate feeds off the pane-merge output (binary state col),
    # not the raw events scan: its input carries sketch_state
    gen_at = plan.find("Generate")
    assert gen_at != -1
    explode_sec = plan[gen_at:gen_at + 400]
    assert "window_start" in explode_sec
    exp = windowed_sketch_agg(events, "ts", "user_id", hll,
                              width_s=3600, slide_s=900,
                              engine="explode")
    # the explode engine does all its work below ONE shuffle: rows
    # explode r-fold into the in-partition partial build, then one
    # exchange merges per-window partials.  That row multiplication is
    # its defining map-side cost — the pane engine trades it for the
    # second (window-count-bounded) state shuffle pinned above.
    ep = plan_text(exp, "simple")
    assert ep.count("Exchange") == 1, ep[:3000]
    assert "Generate" in ep
