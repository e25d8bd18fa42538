"""SketchStore serving layer: build once with Spark, answer with ZERO
Spark and ZERO corpus access (operators/store.py), plus the local
Spark-parity xxhash64 that makes shard-routed point probes possible."""

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

from gopie_spark.kernels import HLL
from gopie_spark.kernels.hashes import spark_shard_of, xxh64_values
from gopie_spark.operators import (SketchStore, StoreMiss, bloom_shards_build,
                                   update_store_meta, write_store_bin)
from gopie_spark.operators.sketch_agg import sketch_agg


# --------------------------------------------------------------------------
# local xxhash64 parity — the hash that routes probes to shards
# --------------------------------------------------------------------------

def test_xxh64_spark_parity(spark):
    import random
    import string
    random.seed(11)
    vals = [""]
    for length in list(range(1, 40)) + [63, 64, 65, 96, 97, 255, 1000]:
        vals.append("".join(random.choice(string.printable)
                            for _ in range(length)))
    vals += ["héllo wörld ☃ 中文テスト" * 3, "a" * 31, "b" * 32, "c" * 33,
             "日本語", "https://example.com/path?q=1"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    want = [r[0] for r in df.select(F.xxhash64("v")).collect()]
    got = xxh64_values(vals).view(np.int64).tolist()
    assert got == want

    sh_want = [r[0] for r in df.select(
        F.pmod(F.xxhash64(F.col("v").cast("string")), F.lit(64))).collect()]
    assert spark_shard_of(vals, 64).tolist() == sh_want


def test_xxh64_empty_batch():
    assert xxh64_values([]).shape == (0,)


# --------------------------------------------------------------------------
# store build + zero-Spark answers
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def built_store(spark, sf_dir, tmp_path_factory):
    """A store persisted from the documents table, with exact anchors
    captured at build time.  The corpus parquet is COPIED and then
    DELETED after the build, so any answer that touched it would fail —
    the strongest zero-corpus-access proof available in-process."""
    out = str(tmp_path_factory.mktemp("store"))
    corpus = str(tmp_path_factory.mktemp("corpus_copy")) + "/docs"
    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select(F.col("doc_id").cast("string").alias("url"),
                    "lang", "text"))
    docs.write.mode("overwrite").parquet(corpus)
    docs = spark.read.parquet(corpus)

    hll = HLL(p=13)
    sketch_agg(docs.select("lang", F.col("url").alias("v")),
               ["lang"], "v", hll) \
        .write.mode("overwrite").parquet(f"{out}/hll_lang_url")
    from gopie_spark.operators import cms_tokens_build
    cms, cms_state = cms_tokens_build(docs.select("text"), "text")
    write_store_bin(out, "cms_tokens.bin", cms, cms_state)
    n = docs.count()
    shards = 16
    bloom_shards_build(docs.select("url"), "url", n=n, p=0.001,
                       shards=shards) \
        .write.mode("overwrite").parquet(f"{out}/bloom_url_shards")
    from gopie_spark.operators.drift import persist_drift_states
    persist_drift_states(docs, f"{out}/drift")
    update_store_meta(out, bloom_shards=shards, bloom_n=n, bloom_p=0.001,
                      hll_key_col="lang", rows=n)

    exact = {
        "distinct": docs.select("url").distinct().count(),
        "per_lang": {r["lang"]: r["n"] for r in
                     docs.groupBy("lang")
                     .agg(F.countDistinct("url").alias("n")).collect()},
        "tokens": {r["tok"]: r["c"] for r in
                   docs.select(F.explode(F.split("text", r"\s+"))
                               .alias("tok"))
                   .filter(F.col("tok") != "")
                   .groupBy("tok").agg(F.count("*").alias("c"))
                   .orderBy(F.desc("c"), "tok").limit(10).collect()},
        "urls_present": [r["url"] for r in docs.select("url")
                         .orderBy("url").limit(8).collect()],
    }
    shutil.rmtree(corpus)  # corpus gone: answers below CANNOT re-scan it
    return out, exact


def test_store_distinct_urls_all_and_subset(built_store):
    out, exact = built_store
    store = SketchStore(out)
    ans = store.distinct_urls()
    assert ans.kind == "hll" and ans.bytes_read > 0
    assert abs(ans.value - exact["distinct"]) <= ans.bound * exact["distinct"]
    assert ans.states_merged == len(exact["per_lang"])

    langs = sorted(exact["per_lang"])[:2]
    sub = store.distinct_urls(langs)
    sub_exact = sum(exact["per_lang"][l] for l in langs)
    assert abs(sub.value - sub_exact) <= sub.bound * sub_exact
    with pytest.raises(KeyError):
        store.distinct_urls(["no-such-lang"])


def test_store_token_freq_within_bound(built_store):
    out, exact = built_store
    store = SketchStore(out)
    toks = list(exact["tokens"])
    ans = store.token_freq(toks)
    assert ans.bound_kind == "additive_overcount"
    for t in toks:
        got, want = ans.value[t], exact["tokens"][t]
        assert want <= got <= want + ans.bound  # CMS one-sided overcount


def test_store_membership_probe_prunes(built_store):
    out, exact = built_store
    store = SketchStore(out)
    present = exact["urls_present"]
    absent = [f"never-crawled-{i}" for i in range(8)]
    ans = store.maybe_contains_urls(present + absent)
    # zero false negatives: every present url answers True
    assert all(ans.value[u] for u in present)
    # FPR 0.001 over 8 probes: all absent answer False w.p. ~0.992
    assert sum(ans.value[u] for u in absent) <= 1
    # pruning: only the probed shards' states were read
    assert ans.detail["shards_probed"] < ans.detail["shards_total"]
    assert ans.states_merged <= ans.detail["shards_probed"]


def test_store_drift_tier_answers(built_store):
    out, exact = built_store
    store = SketchStore(out)
    top = store.top_tokens(5)
    # MG undercount bound: estimates within [exact - err, exact]
    inter = set(top.value) & set(exact["tokens"])
    assert inter, "MG top-5 should intersect the exact top-10"
    for t in inter:
        assert exact["tokens"][t] - top.bound <= top.value[t] \
            <= exact["tokens"][t]
    q = store.token_length_quantiles([0.5])
    assert q.value[0.5] > 0 and q.bound_kind == "rank_error"
    hist = store.lang_histogram()
    assert hist.bound == 0.0
    assert sum(hist.value.values()) == store.meta["rows"]


def test_store_miss_names_remedy(built_store):
    out, _ = built_store
    store = SketchStore(out)
    with pytest.raises(StoreMiss) as ei:
        store.distinct_urls_since(0.0)
    assert "--time-windows" in ei.value.remedy
    with pytest.raises(StoreMiss):
        store.token_freq(["x"], window_ticks=3)


def test_store_requires_meta_for_probe(built_store, tmp_path):
    out, exact = built_store
    # a store without meta cannot route probes and must say why
    alt = tmp_path / "nometa"
    alt.mkdir()
    os.symlink(f"{out}/bloom_url_shards", alt / "bloom_url_shards")
    with pytest.raises(ValueError, match="bloom_shards"):
        SketchStore(str(alt)).maybe_contains_urls(["u"])


def test_store_module_never_imports_spark():
    """The serving layer must stay runnable on a box without a JVM:
    operators/store.py may not import pyspark at any level."""
    import gopie_spark.operators.store as mod
    src = open(mod.__file__).read()
    assert "pyspark" not in src


def test_query_sketches_cli(built_store):
    out, exact = built_store
    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, "jobs/query_sketches.py", "--store", out,
         "distinct-urls"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    est = rep["answer"]["value"]
    bound = rep["answer"]["bound"]
    assert abs(est - exact["distinct"]) <= bound * exact["distinct"]

    r = subprocess.run(
        [sys.executable, "jobs/query_sketches.py", "--store", out,
         "coverage"], capture_output=True, text=True, cwd="/root/repo",
        env=env, timeout=120)
    cov = json.loads(r.stdout)["answer"]
    assert cov["hll_lang_url"]["present"]
    assert not cov["sliding_hll_url.bin"]["present"]

    # a miss exits 3 and names the build flag
    r = subprocess.run(
        [sys.executable, "jobs/query_sketches.py", "--store", out,
         "distinct-urls", "--since", "2026-01-01"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=120)
    assert r.returncode == 3
    assert "--time-windows" in json.loads(r.stdout)["remedy"]


def test_build_sketches_output_is_a_store(spark, sf_dir, tmp_path):
    """jobs/build_sketches.py --output IS a SketchStore: run the real
    job end-to-end at tiny scale, then serve from it with no Spark."""
    src = str(tmp_path / "pages")
    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select(F.col("doc_id").cast("string").alias("url"),
                    F.current_timestamp().alias("warc_ts"),
                    F.lit(b"").alias("html"), "text", "lang").limit(400))
    docs.write.mode("overwrite").parquet(src)
    written = spark.read.parquet(src)
    exact_distinct = written.select("url").distinct().count()
    two_urls = [r["url"] for r in
                written.select("url").orderBy("url").limit(2).collect()]
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, "jobs/build_sketches.py", "--input", src,
         "--checkpoint", ckpt, "--output", out, "--hll-p", "11",
         "--n-buckets", "4", "--salt", "0", "--time-windows",
         "--window-resolution", "86400", "--window-horizon", "32"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    store = SketchStore(out)
    assert store.meta["bloom_shards"] == 256
    ans = store.distinct_urls()
    assert abs(ans.value - exact_distinct) <= ans.bound * exact_distinct
    since = store.distinct_urls_since(0.0)  # all rows are after epoch 0
    assert abs(since.value - exact_distinct) \
        <= since.bound * exact_distinct
    probe = store.maybe_contains_urls(two_urls + ["definitely-absent-url"])
    assert all(probe.value[u] for u in two_urls)


# --------------------------------------------------------------------------
# store merge: the incremental-crawl shape at the artifact level
# --------------------------------------------------------------------------

def _mini_store(spark, docs, out, n_total, shards=8):
    """Persist the standard artifact set for a corpus slice.  n_total is
    the UNION size so both slices get identical Bloom geometry (the
    merge contract)."""
    from gopie_spark.operators import cms_tokens_build, sliding_hll_build
    from gopie_spark.operators.drift import persist_drift_states
    hll = HLL(p=12)
    sketch_agg(docs.select("lang", F.col("url").alias("v")),
               ["lang"], "v", hll) \
        .write.mode("overwrite").parquet(f"{out}/hll_lang_url")
    cms, st = cms_tokens_build(docs.select("text"), "text")
    write_store_bin(out, "cms_tokens.bin", cms, st)
    bloom_shards_build(docs.select("url"), "url", n=n_total, p=0.001,
                       shards=shards) \
        .write.mode("overwrite").parquet(f"{out}/bloom_url_shards")
    sh, sh_state = sliding_hll_build(
        docs.withColumn("ts", (F.crc32("url") % 100000).cast("double")),
        "url", "ts", p=12)
    write_store_bin(out, "sliding_hll_url.bin", sh, sh_state)
    persist_drift_states(docs, f"{out}/drift")
    update_store_meta(out, bloom_shards=shards, bloom_n=n_total,
                      bloom_p=0.001, hll_key_col="lang",
                      rows=docs.count())


@pytest.fixture(scope="module")
def split_stores(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("merge")
    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select(F.col("doc_id").cast("string").alias("url"),
                    "lang", "text"))
    n = docs.count()
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    for name, d in (("a", half_a), ("b", half_b), ("full", docs)):
        _mini_store(spark, d, str(base / name), n_total=n)
    present = [r["url"] for r in docs.select("url")
               .orderBy("url").limit(6).collect()]
    return base, present


def test_merge_stores_byte_equal_on_linear_artifacts(split_stores):
    from gopie_spark.operators.store import merge_stores
    base, present = split_stores
    report = merge_stores(str(base / "a"), str(base / "b"),
                          str(base / "m"))
    assert report["hll_lang_url"] == "merged"

    full, merged = SketchStore(str(base / "full")), \
        SketchStore(str(base / "m"))
    # lattice/linear artifacts: byte-identical to the from-scratch build
    assert merged._hll_states() == full._hll_states()
    for name in ("cms_tokens.bin", "sliding_hll_url.bin",
                 "drift/theta_url.bin", "drift/cs_tokens.bin",
                 "drift/lang_counts.json"):
        with open(os.path.join(str(base / "m"), name), "rb") as fh:
            got = fh.read()
        with open(os.path.join(str(base / "full"), name), "rb") as fh:
            want = fh.read()
        assert got == want, name
    # Bloom shards: bit-OR of halves == full build (probe-for-probe AND
    # byte-for-byte via the answers)
    pm = merged.maybe_contains_urls(present + ["zz-nope"])
    pf = full.maybe_contains_urls(present + ["zz-nope"])
    assert pm.value == pf.value
    # meta sums
    assert merged.meta["rows"] == full.meta["rows"]


def test_merge_stores_bounds_hold_on_nonlinear(split_stores, spark,
                                               sf_dir):
    """MG/KLL merge to valid (not byte-equal) states: served answers
    still satisfy their published bounds vs the union-corpus exact."""
    from gopie_spark.operators.textstats import token_count
    base, _ = split_stores
    merged = SketchStore(str(base / "m"))
    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("text"))
    exact_top = {r["tok"]: r["c"] for r in
                 docs.select(F.explode(F.split("text", r"\s+"))
                             .alias("tok"))
                 .filter(F.col("tok") != "")
                 .groupBy("tok").agg(F.count("*").alias("c"))
                 .orderBy(F.desc("c"), "tok").limit(10).collect()}
    top = merged.top_tokens(5)
    inter = set(top.value) & set(exact_top)
    assert inter
    for t in inter:
        assert exact_top[t] - top.bound <= top.value[t] <= exact_top[t]

    q = merged.token_length_quantiles([0.5])
    med, eps = q.value[0.5], q.bound
    tl = docs.select(token_count("text").alias("tl"))
    n = tl.count()
    assert tl.filter(F.col("tl") <= med).count() / n >= 0.5 - eps
    assert tl.filter(F.col("tl") < med).count() / n <= 0.5 + eps


def test_merge_stores_refusals_and_drops(split_stores, tmp_path):
    from gopie_spark.operators.store import merge_stores
    base, _ = split_stores
    # one-sided artifact: dropped from the merge, reported, and the
    # merged store refuses to answer from it
    import shutil as sh
    b2 = tmp_path / "b2"
    sh.copytree(str(base / "b"), b2)
    os.remove(b2 / "cms_tokens.bin")
    report = merge_stores(str(base / "a"), str(b2), str(tmp_path / "m2"))
    assert report["cms_tokens.bin"] == "dropped_one_sided"
    with pytest.raises(StoreMiss):
        SketchStore(str(tmp_path / "m2")).token_freq(["x"])

    # mismatched shard routing: refused
    b3 = tmp_path / "b3"
    sh.copytree(str(base / "b"), b3)
    update_store_meta(str(b3), bloom_shards=32)
    with pytest.raises(ValueError, match="shard counts differ"):
        merge_stores(str(base / "a"), str(b3), str(tmp_path / "m3"))


def test_merge_stores_cli(split_stores, tmp_path):
    base, present = split_stores
    out = str(tmp_path / "cli_merged")
    r = subprocess.run(
        [sys.executable, "jobs/merge_stores.py", "--a", str(base / "a"),
         "--b", str(base / "b"), "--out", out],
        capture_output=True, text=True, cwd="/root/repo", timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout)
    assert rep["artifacts"]["hll_lang_url"] == "merged"
    ans = SketchStore(out).maybe_contains_urls(present)
    assert all(ans.value.values())


# --------------------------------------------------------------------------
# review-hardening regressions (round-4l code review findings)
# --------------------------------------------------------------------------

def test_windowed_token_freq_serves(spark, sf_dir, tmp_path):
    """A successful trailing-window answer (not just the miss path):
    bound holds vs the exact window substream count."""
    from gopie_spark.operators import window_cms_tokens_build
    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("text")
            .withColumn("ts", (F.monotonically_increasing_id() % 100
                               * 86400).cast("double")))
    wc, st = window_cms_tokens_build(docs, text_col="text", ts_col="ts",
                                     resolution=86400.0, n_ticks=128)
    out = str(tmp_path / "wstore")
    write_store_bin(out, "window_cms_tokens.bin", wc, st)
    store = SketchStore(out)
    newest = int(docs.agg(F.max(F.floor(F.col("ts") / 86400.0)))
                 .collect()[0][0])
    w = 10
    exact = {r["tok"]: r["c"] for r in
             docs.filter((F.floor(F.col("ts") / 86400.0) > newest - w)
                         & (F.floor(F.col("ts") / 86400.0) <= newest))
             .select(F.explode(F.split("text", r"\s+")).alias("tok"))
             .filter(F.col("tok") != "")
             .groupBy("tok").agg(F.count("*").alias("c"))
             .orderBy(F.desc("c"), "tok").limit(5).collect()}
    ans = store.token_freq(list(exact), window_ticks=w, at_tick=newest)
    for t, c in exact.items():
        assert c <= ans.value[t] <= c + ans.bound, (t, c, ans.value[t])
    assert ans.detail["window_ticks"] == w


def test_merged_bloom_preserves_row_group_pruning(split_stores):
    """After a merge the shard table must keep one row group per shard
    (a single spanning row group would turn every point probe into a
    full-table read)."""
    import glob
    base, _ = split_stores
    import pyarrow.parquet as pq
    files = glob.glob(os.path.join(str(base / "m"),
                                   "bloom_url_shards", "*.parquet"))
    assert files
    n_groups = sum(pq.ParquetFile(f).num_row_groups for f in files)
    n_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    assert n_groups == n_rows  # one shard state per row group


def test_merge_stores_grouped_drift_tier(spark, sf_dir, tmp_path):
    """Grouped drift states merge per group (one-sided groups pass
    through — they ARE the union state for that group); mismatched
    group_col refuses."""
    import shutil as sh
    from gopie_spark.kernels import sketch_from_blob
    from gopie_spark.operators.drift import persist_drift_states
    from gopie_spark.operators.store import merge_stores
    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select(F.col("doc_id").cast("string").alias("url"),
                    "lang", "text"))
    langs = sorted(r["lang"] for r in docs.select("lang")
                   .distinct().collect())
    # side A: all langs; side B: all but the first (one-sided group)
    a, b, full = (str(tmp_path / x) for x in ("a", "b", "full"))
    ha = docs.filter(F.col("doc_id") % 2 == 0)
    hb = docs.filter((F.col("doc_id") % 2 == 1)
                     & (F.col("lang") != langs[0]))
    persist_drift_states(ha, f"{a}/drift", group_col="lang")
    persist_drift_states(hb, f"{b}/drift", group_col="lang")
    persist_drift_states(ha.unionByName(hb), f"{full}/drift",
                         group_col="lang")
    report = merge_stores(a, b, str(tmp_path / "m"))
    assert report["drift/grouped/groups.json"] == "merged"
    # theta per group: byte-equal to the union build (min-k lattice)
    mdir = str(tmp_path / "m")
    with open(os.path.join(mdir, "drift/grouped/groups.json")) as fh:
        man = json.load(fh)
    with open(os.path.join(full, "drift/grouped/groups.json")) as fh:
        man_full = json.load(fh)
    by_g = {e["group"]: e for e in man["groups"]}
    assert set(by_g) == {e["group"] for e in man_full["groups"]}
    for ef in man_full["groups"]:
        with open(os.path.join(mdir, "drift/grouped",
                               by_g[ef["group"]]["theta"]), "rb") as fh:
            got = fh.read()
        with open(os.path.join(full, "drift/grouped",
                               ef["theta"]), "rb") as fh:
            want = fh.read()
        assert got == want, ef["group"]

    # mismatched group_col refuses
    b2 = str(tmp_path / "b2")
    sh.copytree(b, b2)
    with open(os.path.join(b2, "drift/grouped/groups.json")) as fh:
        m2 = json.load(fh)
    m2["group_col"] = "host"
    with open(os.path.join(b2, "drift/grouped/groups.json"), "w") as fh:
        json.dump(m2, fh)
    with pytest.raises(ValueError, match="group_col"):
        merge_stores(a, b2, str(tmp_path / "m2"))


def test_merge_stores_one_sided_meta_dropped(split_stores, tmp_path):
    import shutil as sh
    from gopie_spark.operators.store import merge_stores
    base, _ = split_stores
    b4 = tmp_path / "b4"
    sh.copytree(str(base / "b"), b4)
    meta_path = b4 / "_store_meta.json"
    meta = json.loads(meta_path.read_text())
    del meta["rows"]
    meta_path.write_text(json.dumps(meta))
    report = merge_stores(str(base / "a"), str(b4), str(tmp_path / "m4"))
    assert report["meta:rows"] == "dropped_one_sided"
    assert "rows" not in SketchStore(str(tmp_path / "m4")).meta


def test_query_sketches_cli_bad_requests(built_store):
    out, _ = built_store
    # --since + --langs is an argparse usage error (exit 2)
    r = subprocess.run(
        [sys.executable, "jobs/query_sketches.py", "--store", out,
         "distinct-urls", "--langs", "en", "--since", "0"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120)
    assert r.returncode == 2
    assert "--since" in r.stderr
    # unknown lang: JSON bad_request, exit 4 (not a traceback)
    r = subprocess.run(
        [sys.executable, "jobs/query_sketches.py", "--store", out,
         "distinct-urls", "--langs", "no-such-lang"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120)
    assert r.returncode == 4, (r.returncode, r.stderr[-500:])
    assert json.loads(r.stdout)["error"] == "bad_request"


def test_top_tokens_refined_unbiased(built_store):
    """MG candidates re-ranked by CountSketch: estimates inside the
    two-sided 3-sigma band around the exact counts."""
    out, exact = built_store
    store = SketchStore(out)
    top = store.top_tokens(5, refine=True)
    assert top.bound_kind == "two_sided_3sigma" and top.states_merged == 2
    inter = set(top.value) & set(exact["tokens"])
    assert inter
    for t in inter:
        assert abs(top.value[t] - exact["tokens"][t]) <= top.bound, t
