"""Round-4c additions: URL hygiene filter (and friends added late in
round 4).  DuckDB parity uses the module's own oracle generators so
pattern text cannot drift between engines.
"""
import duckdb
import pytest
from pyspark.sql import functions as F

from gopie_spark.operators.hoststats import (URL_FILTER_RULES,
                                             filter_urls,
                                             oracle_url_flag_sql,
                                             url_filter_flags)

PLANTED = [
    (0, "https://ok.example.com/article/about-cats", True),
    (1, "https://cdn.example.com/img/banner.jpg", False),          # binary_ext
    (2, "https://cdn.example.com/app.js?v=3", False),              # binary_ext
    (3, "https://best-casino.example.com/play", False),            # spam_word
    (4, "http://203.0.113.9/index.html", False),                   # ip_host
    (5, "https://shop.example.com/p?" + "a=1&" * 40, False),       # long_query
    (6, "https://trap.example.com" + "/x" * 12, False),            # deep_path
    (7, None, True),                                               # null keeps
    (8, "https://ok.example.com/jpg-history", True),  # 'jpg' not an ext hit
]


@pytest.fixture(scope="module")
def urls(spark):
    return spark.createDataFrame(
        [(i, u) for i, u, _ in PLANTED], "doc_id int, url string")


def test_url_filter_planted(urls):
    got = {r["doc_id"]: r["url_keep"]
           for r in url_filter_flags(urls).collect()}
    want = {i: k for i, _, k in PLANTED}
    assert got == want
    kept = filter_urls(urls)
    assert kept.columns == ["doc_id", "url"]
    assert {r["doc_id"] for r in kept.collect()} \
        == {i for i, _, k in PLANTED if k}


def test_url_filter_each_rule_fires_once(urls):
    rows = {r["doc_id"]: r for r in url_filter_flags(urls).collect()}
    fired = {name: [i for i in rows
                    if rows[i][f"flag_{name}"]]
             for name, _ in URL_FILTER_RULES}
    assert fired["binary_ext"] == [1, 2]
    assert fired["spam_word"] == [3]
    assert fired["ip_host"] == [4]
    assert fired["long_query"] == [5]
    assert fired["deep_path"] == [6]


def test_url_filter_duckdb_parity(urls):
    got = sorted(
        tuple(r) for r in url_filter_flags(urls)
        .select("doc_id",
                *[f"flag_{n}" for n, _ in URL_FILTER_RULES],
                "url_keep").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id INT, url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(i, u) for i, u, _ in PLANTED])
    flag_sqls = [oracle_url_flag_sql("url", p) for _, p in URL_FILTER_RULES]
    keep = "NOT (" + " OR ".join(flag_sqls) + ")"
    want = sorted(tuple(r) for r in con.execute(
        "SELECT doc_id, " + ", ".join(flag_sqls) + f", {keep} "
        "FROM t ORDER BY doc_id").fetchall())
    assert got == want


def test_url_filter_zero_shuffle(urls):
    plan = url_filter_flags(urls)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


# -- curate(): url_rules stage 0 + leakage-safe split stamp --------------------

def test_curate_url_rules_and_split_stamp(spark, sf_dir):
    """url_rules drops rule-flagged URLs BEFORE any text stage; the
    split stamp adds a host-keyed split column to the survivors, whole
    hosts staying within one split, and per-split counts land in the
    report."""
    import sys
    sys.path.insert(0, "/root/repo/jobs")
    from filter_corpus import curate
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    url = F.when(d % 10 == 0,
                 F.concat(F.lit("https://cdn.example.com/x"),
                          d.cast("string"), F.lit(".zip"))) \
        .otherwise(F.concat(F.lit("https://h"),
                            (d % 23).cast("string"),
                            F.lit(".example.com/a/"), d.cast("string")))
    pages = docs.select("doc_id", "text", "lang", url.alias("url"))
    out, rep = curate(spark, pages, min_tokens=5, near_dedup=False,
                      url_rules=True,
                      split_fractions={"train": 0.8, "val": 0.2})
    assert rep["after_url_rules"] == rep["input_rows"] - 50
    assert "split" in out.columns
    per_host = (out.withColumn("_h", F.regexp_extract(
        "url", r"^https://([^/]+)/", 1))
        .groupBy("_h").agg(F.countDistinct("split").alias("k")))
    assert per_host.filter(F.col("k") != 1).count() == 0
    assert sum(rep["split_rows"].values()) == rep["output_rows"]
    assert rep["with_split"] == rep["output_rows"]
    out.unpersist()
