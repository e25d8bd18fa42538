"""Round-2 feature tests: connected components, salted probe joins,
two-level capped bucket collection, deterministic IVF sampling,
distributed counting-Bloom subtract, single-pass lang-ID, catalog file
listing."""

import numpy as np
import pytest

from pyspark.sql import functions as F


# -- connected components ----------------------------------------------------

def test_cc_chain_and_clusters(spark):
    """Adversarial chain A~B~C~D plus separate pairs: roots must be the
    true component minima (requires transitive closure, not greedy)."""
    from gopie_spark.operators.graph import connected_components
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20)],
        "id_a long, id_b long")
    got = {r["id"]: r["component"]
           for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_cc_long_chain_log_convergence(spark):
    """A 200-hop chain converges inside the round cap (log-convergent
    large-star/small-star — naive min-propagation would need 200
    rounds)."""
    from gopie_spark.operators.graph import connected_components
    chain = spark.createDataFrame([(i, i + 1) for i in range(200)],
                                  "id_a long, id_b long")
    out = connected_components(chain, max_iter=12,
                               local_threshold=0).collect()
    assert len(out) == 201
    assert {r["component"] for r in out} == {0}


def test_cc_dedup_strategy_chain(spark):
    """cc strategy keeps exactly one survivor (the min id) per
    near-duplicate cluster, including across chains."""
    from gopie_spark.operators.dedup import minhash_lsh_dedup
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            * 8)
    rows = [(0, base + "one"), (1, base + "one two"),
            (2, base + "one two three"),
            (50, "completely different text " * 20)]
    ddf = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in
                  minhash_lsh_dedup(ddf, threshold=0.7, strategy="cc")
                  .select("doc_id").collect())
    assert kept == [0, 50]
    with pytest.raises(ValueError):
        minhash_lsh_dedup(ddf, strategy="bogus")


# -- salted probe joins -------------------------------------------------------

def _viral_corpus(spark, n=400, dim=8):
    """Near-identical vectors -> every row lands in ONE lsh bucket."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal(dim)
    rows = [(i, (base + 1e-6 * rng.standard_normal(dim)).tolist())
            for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_lsh_topk_salted_equals_unsalted_on_viral_bucket(spark):
    from gopie_spark.operators.similarity import (add_hyperplane_bucket,
                                                  lsh_topk)
    corpus = _viral_corpus(spark)
    # precondition: the bucket really is viral
    nb = add_hyperplane_bucket(corpus, "embedding", 8) \
        .select("lsh_bucket").distinct().count()
    assert nb == 1
    q = corpus.filter(F.col("vec_id") < 3)
    salted = sorted((r["query_id"], r["rank"], r["match_id"]) for r in
                    lsh_topk(spark, corpus, q, k=5, bucket_salts=8)
                    .collect())
    plain = sorted((r["query_id"], r["rank"], r["match_id"]) for r in
                   lsh_topk(spark, corpus, q, k=5, bucket_salts=1)
                   .collect())
    assert salted == plain and len(salted) == 15


def test_salted_probe_join_bounds_per_key_fanin(spark):
    """The viral bucket's candidate stream must arrive under
    bucket_salts distinct join keys (work divides across tasks instead
    of one)."""
    from gopie_spark.operators.similarity import (_salted_probe_join,
                                                  add_hyperplane_bucket)
    corpus = _viral_corpus(spark)
    bucketed = add_hyperplane_bucket(corpus, "embedding", 8) \
        .select(F.col("vec_id").alias("match_id"),
                F.col("embedding").alias("_cvec"), "lsh_bucket")
    probes = add_hyperplane_bucket(corpus.filter(F.col("vec_id") < 2),
                                   "embedding", 8) \
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("_qvec"), "lsh_bucket")
    salted = corpus.withColumn(
        "_bsalt", F.pmod(F.xxhash64("vec_id"), F.lit(8)).cast("int"))
    per_salt = salted.groupBy("_bsalt").count().collect()
    assert len(per_salt) == 8           # all 8 salt keys materialize
    assert max(r["count"] for r in per_salt) < 400  # no salt holds all
    out = _salted_probe_join(probes, bucketed, "lsh_bucket", "match_id", 8)
    assert out.count() == 2 * 400       # exact candidate multiset kept


# -- two-level capped bucket collection ---------------------------------------

def test_bucket_pairs_two_level_equals_single_level(spark):
    from gopie_spark.operators.dedup import _bucket_pairs
    rng = np.random.default_rng(3)
    rows = [(int(rng.integers(0, 1000)), int(b))
            for b in range(20) for _ in range(int(rng.integers(2, 60)))]
    df = spark.createDataFrame(rows, "_id long, bh long").distinct()
    got = _bucket_pairs(df, ["bh"], max_bucket=16, agg_salts=16)
    # reference: single-level plan (agg_salts=1 degenerates to it)
    ref = _bucket_pairs(df, ["bh"], max_bucket=16, agg_salts=1)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, ref.collect()))
    assert got.count() > 0


# -- deterministic IVF sampling ----------------------------------------------

def test_ivf_codebook_covers_clusters_on_sorted_corpus(spark):
    """A corpus SORTED by cluster (the limit()-bias killer: the first
    partitions hold only one cluster) must still train a codebook whose
    cells separate every planted cluster."""
    from gopie_spark.operators.similarity import (add_ivf_cell,
                                                  train_ivf_centroids)
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((4, 16)) * 4
    rows = []
    vid = 0
    for c in range(4):                    # cluster-major order
        for _ in range(250):
            rows.append((vid, c,
                         (centers[c] + 0.05 * rng.standard_normal(16))
                         .tolist()))
            vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, cluster int, embedding array<double>") \
        .repartitionByRange(8, "vec_id")  # partition = cluster slices
    cents = train_ivf_centroids(df, n_centroids=4, sample_rows=200)
    assigned = add_ivf_cell(df, cents, "embedding")
    cells = (assigned.groupBy("cluster")
             .agg(F.countDistinct("ivf_cell").alias("n"),
                  F.first("ivf_cell").alias("cell")).collect())
    # every planted cluster maps to exactly one cell, all 4 distinct
    assert all(r["n"] == 1 for r in cells)
    assert len({r["cell"] for r in cells}) == 4
    # byte-stable across physical orderings
    c2 = train_ivf_centroids(df.orderBy(F.desc("vec_id")),
                             n_centroids=4, sample_rows=200)
    assert np.array_equal(cents, c2)


# -- distributed counting-Bloom subtract --------------------------------------

def test_bloom_counting_subtract_matches_sequential_remove():
    from gopie_spark.kernels import BloomCounting
    bf = BloomCounting.from_guess(256, 1e-6)
    keys = [f"k{i}" for i in range(200)]
    rm = keys[::3]
    seq = bf.zero()
    bf.update(seq, keys)
    bf.remove(seq, rm)
    # distributed shape: two partial add-states + a removal state
    a1, a2, b = bf.zero(), bf.zero(), bf.zero()
    bf.update(a1, keys[:100])
    bf.update(a2, keys[100:])
    merged = bf.merge(a1, a2)
    bf.update(b, rm)
    got = bf.subtract(merged, b)
    assert np.array_equal(got["counters"], seq["counters"])
    assert got["n"][0] == seq["n"][0]
    keep = [k for k in keys if k not in set(rm)]
    assert bf.exist(got, keep).all()


def test_bloom_counting_subtract_refuses_non_submultiset():
    from gopie_spark.kernels import BloomCounting
    bf = BloomCounting.from_guess(64, 1e-6)
    a, b = bf.zero(), bf.zero()
    bf.update(a, ["x"])
    bf.update(b, ["x", "y"])
    with pytest.raises(ValueError):
        bf.subtract(a, b)


# -- lang-ID: planted-profile identification + batch totals -------------------

def test_lang_id_identifies_planted_profiles(spark):
    from gopie_spark.operators.textstats import _LANG_PROFILES, add_lang_id
    planted = spark.createDataFrame(
        [(lang, " ".join(grams * 12))
         for lang, grams in _LANG_PROFILES.items()],
        "true_lang string, text string")
    out = add_lang_id(planted).collect()
    assert all(r["lang_pred"] == r["true_lang"] for r in out)


def test_lang_id_handles_null_and_empty(spark):
    from gopie_spark.operators.textstats import add_lang_id
    df = spark.createDataFrame([(1, None), (2, ""), (3, "zzz qqq")],
                               "i long, text string")
    out = {r["i"]: r["lang_pred"] for r in add_lang_id(df).collect()}
    assert out[1] == "und" and out[2] == "und" and out[3] == "und"


# -- catalog file listing ------------------------------------------------------

def test_list_data_files_parquet(spark, sf_dir):
    from gopie_spark.sources.catalog import list_data_files
    files = list_data_files(spark, sf_dir)
    assert files and all(f.endswith(".parquet") for f in files)
    assert files == sorted(files)


def test_list_data_files_iceberg_requires_runtime(spark):
    from gopie_spark.sources.catalog import (iceberg_available,
                                             list_data_files)
    if iceberg_available(spark):
        pytest.skip("iceberg runtime present")
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        list_data_files(spark, "lake.db.pages", "iceberg")


# -- streaming dedup -----------------------------------------------------------

def _dup_docs_files(spark, base, n_files=3):
    """Parquet files with in-file and cross-file duplicate texts."""
    rows = []
    did = 0
    for f in range(n_files):
        for i in range(30):
            text = f"shared duplicate text number {i % 10}" if i % 3 == 0 \
                else f"unique text f{f} i{i} " * 3
            rows.append((did, text, f))
            did += 1
    import os
    os.makedirs(base, exist_ok=True)
    df = spark.createDataFrame(rows, "doc_id long, text string, f int")
    for f in range(n_files):
        df.filter(F.col("f") == f).coalesce(1).write.mode("overwrite") \
            .parquet(f"{base}/part{f}")
    return [f"{base}/part{f}" for f in range(n_files)]


def test_bloom_streaming_dedup_equals_batch_exact(spark, tmp_path):
    """Bloom-gated streaming dedup over micro-batches == batch
    exact_dedup (at tiny p there are no false positives, so the bounded
    -state path is exact here), regardless of batch boundaries."""
    from gopie_spark.operators.dedup import exact_dedup
    from gopie_spark.streaming.dedup import BloomStreamingDedup

    paths = _dup_docs_files(spark, str(tmp_path / "src"))
    all_df = spark.read.parquet(*paths).drop("f")
    want = sorted(r["doc_id"] for r in exact_dedup(all_df).collect())

    out_dir = str(tmp_path / "out")
    d = BloomStreamingDedup(spark, out_dir, p=1e-9)
    # feed files as separate micro-batches, in order
    for bid, p in enumerate(paths):
        d.process_batch(spark.read.parquet(p).drop("f"), bid)
    got = sorted(r["doc_id"] for r in
                 spark.read.parquet(out_dir).collect())
    assert got == want


def test_streaming_exact_dedup_drained(spark, tmp_path):
    """streaming_exact_dedup over a file stream: every digest survives
    exactly once after draining with availableNow."""
    from gopie_spark.streaming.dedup import content_digest, \
        streaming_exact_dedup

    base = str(tmp_path / "ssrc")
    _dup_docs_files(spark, base)
    static = spark.read.parquet(f"{base}/part*")
    stream = spark.readStream.schema(static.schema) \
        .option("maxFilesPerTrigger", 1).parquet(f"{base}/part*")
    out = streaming_exact_dedup(stream, "text")
    q = (out.writeStream.format("parquet")
         .option("path", str(tmp_path / "sout"))
         .option("checkpointLocation", str(tmp_path / "sckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "sout"))
    n_digests = static.select(content_digest("text").alias("d")) \
        .distinct().count()
    assert got.count() == n_digests
    assert got.select(content_digest("text")).distinct().count() \
        == n_digests


def test_ivf_kmeanspp_separates_many_clusters(spark):
    """16 well-separated clusters, 16 centroids: k-means++ seeding must
    give every cluster its own cell (plain random seeding frequently
    drops several seeds into one cluster and merges others)."""
    from gopie_spark.operators.similarity import (add_ivf_cell,
                                                  train_ivf_centroids)
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((16, 24)) * 6
    rows = [(c * 60 + i, c,
             (centers[c] + 0.05 * rng.standard_normal(24)).tolist())
            for c in range(16) for i in range(60)]
    df = spark.createDataFrame(
        rows, "vec_id long, cluster int, embedding array<double>")
    cents = train_ivf_centroids(df, n_centroids=16, sample_rows=960)
    assigned = add_ivf_cell(df, cents, "embedding")
    per = (assigned.groupBy("cluster")
           .agg(F.countDistinct("ivf_cell").alias("n"),
                F.first("ivf_cell").alias("cell")).collect())
    assert all(r["n"] == 1 for r in per)
    assert len({r["cell"] for r in per}) == 16


def test_minhash_sig_path_materialization(spark, tmp_path):
    """sig_path materializes signatures to parquet and yields the same
    pairs as the cached path."""
    from gopie_spark.operators.dedup import minhash_lsh_candidates
    base = "omega psi chi phi upsilon tau sigma rho pi omicron " * 6
    rows = [(0, base + "a"), (1, base + "a b"), (2, "other words " * 30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    p = str(tmp_path / "sigs")
    got = sorted((r["id_a"], r["id_b"]) for r in
                 minhash_lsh_candidates(df, k=64, bands=16,
                                        sig_path=p).collect())
    ref = sorted((r["id_a"], r["id_b"]) for r in
                 minhash_lsh_candidates(df, k=64, bands=16).collect())
    assert got == ref and got
    import glob
    assert glob.glob(f"{p}/*.parquet")


def test_bucket_cap_stats(spark):
    from gopie_spark.operators.dedup import bucket_cap_stats
    rows = [(i, 0) for i in range(50)] + [(i, 1) for i in range(5)] \
        + [(99, 2)]
    df = spark.createDataFrame(rows, "_id long, bh long")
    r = bucket_cap_stats(df, ["bh"], max_bucket=16).collect()[0]
    assert (r["n_buckets"], r["n_capped"], r["max_bucket_size"]) \
        == (3, 1, 50)


def test_streaming_exact_dedup_watermark_path(spark, tmp_path):
    """The bounded-state watermark variant: duplicates inside the
    horizon are dropped; the digest state store is horizon-bounded."""
    import os
    from gopie_spark.streaming.dedup import streaming_exact_dedup
    base = str(tmp_path / "wsrc")
    os.makedirs(base)
    rows = [(i, f"text {i % 7}", f"2026-01-01 00:{i % 50:02d}:00")
            for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string, ts_s string") \
        .select("doc_id", "text", F.to_timestamp("ts_s").alias("ts"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{base}/p0")
    stream = spark.readStream.schema(
        spark.read.parquet(f"{base}/p0").schema).parquet(f"{base}/p0")
    out = streaming_exact_dedup(stream, "text", ts_col="ts",
                                within="10 minutes")
    q = (out.writeStream.format("parquet")
         .option("path", str(tmp_path / "wout"))
         .option("checkpointLocation", str(tmp_path / "wckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "wout"))
    # 7 distinct texts; every text's occurrences fall inside the
    # horizon in this batch -> exactly one survivor per digest
    assert got.select("text").distinct().count() == 7
    assert got.count() == 7


def test_dedup_corpus_job_end_to_end(tmp_path):
    """jobs/dedup_corpus.py as a black box (own SparkSession in a
    subprocess): removes the known near-dup clusters from the documents
    table, materializes signatures, prints one JSON report line."""
    import json
    import os
    import subprocess
    import sys
    out = str(tmp_path / "out")
    sigs = str(tmp_path / "sigs")
    env = dict(os.environ, SPARK_GRAFT_CPUS="8",
               PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "jobs/dedup_corpus.py",
         "--input", "/root/testdata/sf0.01/documents.parquet",
         "--output", out, "--sig-dir", sigs],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=400)
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads(r.stdout.strip().splitlines()[-1])
    assert report["rows_in"] == 500
    assert report["near_dups_removed"] > 0
    assert report["after_near_dedup"] \
        == report["rows_in"] - report["exact_dups_removed"] \
        - report["near_dups_removed"]
    import glob
    assert glob.glob(f"{out}/*.parquet") and glob.glob(f"{sigs}/*.parquet")


# -- persisted IVF index with partition-pruned probing ------------------------

def test_ivf_index_prunes_partitions_and_matches_inline(spark, tmp_path,
                                                        sf_dir):
    """ivf_topk_indexed == ivf_topk with the same codebook, AND the
    probed scan reads only the probed cell partitions (static partition
    pruning visible in the plan)."""
    import io
    from contextlib import redirect_stdout
    from gopie_spark.operators.similarity import (build_ivf_index,
                                                  ivf_topk,
                                                  ivf_topk_indexed)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "ivf_idx")
    cents = build_ivf_index(emb, idx, n_centroids=8)
    q = emb.filter(F.col("vec_id") < 5)
    got = ivf_topk_indexed(spark, idx, q, k=5, nprobe=3)
    want = ivf_topk(spark, emb, q, k=5, nprobe=3, centroids=cents)
    assert sorted(map(tuple, got.select("query_id", "match_id", "rank")
                      .collect())) == \
        sorted(map(tuple, want.select("query_id", "match_id", "rank")
                   .collect()))
    buf = io.StringIO()
    with redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    scan = plan[plan.index("Scan parquet"):]
    assert "PartitionFilters" in scan
    assert "ivf_cell" in scan.split("PartitionFilters", 1)[1].split("\n")[0]


def test_lsh_index_prunes_partitions_and_matches_inline(spark, tmp_path,
                                                        sf_dir):
    import io
    from contextlib import redirect_stdout
    from gopie_spark.operators.similarity import (build_lsh_index,
                                                  lsh_topk,
                                                  lsh_topk_indexed)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "lsh_idx")
    build_lsh_index(emb, idx, n_planes=6)
    q = emb.filter(F.col("vec_id") < 5)
    got = lsh_topk_indexed(spark, idx, q, k=5, multiprobe=1)
    want = lsh_topk(spark, emb, q, k=5, n_planes=6, multiprobe=1)
    assert sorted(map(tuple, got.select("query_id", "match_id", "rank")
                      .collect())) == \
        sorted(map(tuple, want.select("query_id", "match_id", "rank")
                   .collect()))
    buf = io.StringIO()
    with redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    pf_lines = [ln for ln in plan.splitlines()
                if "PartitionFilters" in ln and "lsh_bucket" in ln]
    assert pf_lines, f"no lsh_bucket PartitionFilters in plan:\n{plan}"
    with pytest.raises(ValueError):
        build_lsh_index(emb, idx, n_planes=15)
