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


# -- recrawl conflation: newest snapshot per url -------------------------------

def test_latest_snapshot_recrawl(spark):
    """Two overlapping 'dumps' of the same urls conflate to the newest
    snapshot per url, equal to the window row_number plan."""
    from gopie_spark.sources.warc import write_warc_file
    from gopie_spark.sources.catalog import load_table
    from gopie_spark.streaming.conflate import latest_snapshot
    import tempfile, os
    d = tempfile.mkdtemp()
    recs = lambda dump, ids: [
        {"url": f"https://h.example.com/p/{i}",
         "date": f"2026-0{dump}-02T00:00:00Z",
         "body": f"<html><body><p>dump {dump} doc {i}</p></body></html>"
         .encode()} for i in ids]
    write_warc_file(os.path.join(d, "crawl1.warc.gz"), recs(1, range(10)))
    write_warc_file(os.path.join(d, "crawl2.warc.gz"), recs(2, range(5, 15)))
    pages = load_table(spark, d + "/*", "warc")
    got = latest_snapshot(pages.select("url", "warc_ts", "text"))
    rows = {r["url"]: (r["warc_ts"].month, r["text"]) for r in got.collect()}
    assert len(rows) == 15
    for i in range(15):
        u = f"https://h.example.com/p/{i}"
        want_dump = 2 if i >= 5 else 1
        assert rows[u][0] == want_dump
        assert f"dump {want_dump} doc {i}" in rows[u][1]


# -- make_epochs job ------------------------------------------------------------

def test_make_epochs_distinct_deterministic(spark, sf_dir, tmp_path):
    """Each epoch is a different permutation; rerunning an epoch with
    the same seed reproduces it byte-for-byte."""
    import glob
    import pyarrow.parquet as pq
    import sys
    sys.path.insert(0, "/root/repo/jobs")
    from make_epochs import make_epochs
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    out = str(tmp_path / "ep")
    rep = make_epochs(docs, out, n_shards=4, epochs=2, seed0=11)
    assert rep["input_rows"] == 500 and len(rep["epochs"]) == 2

    def order(epoch):
        seq = []
        for k in range(4):
            for f in sorted(glob.glob(f"{out}/epoch={epoch}/shard={k}/*.parquet")):
                seq += pq.read_table(f).to_pydict()["doc_id"]
        return seq

    e0, e1 = order(0), order(1)
    assert sorted(e0) == sorted(e1) == list(range(500))
    assert e0 != e1  # different seeds -> different permutations
    rep2 = make_epochs(docs, str(tmp_path / "ep2"), n_shards=4,
                       epochs=1, seed0=11)
    out2 = str(tmp_path / "ep2")
    seq2 = []
    for k in range(4):
        for f in sorted(glob.glob(f"{out2}/epoch=0/shard={k}/*.parquet")):
            seq2 += pq.read_table(f).to_pydict()["doc_id"]
    assert seq2 == e0  # same seed -> identical epoch


# -- driver-window ordering guard ----------------------------------------------

def test_priority_queries_inside_driver_window():
    """The driver's correctness pass has historically covered only the
    FIRST 50 queries() entries; every query without a driver-green row
    in CORRECTNESS_r01-r03 must sit inside that window."""
    import json
    import __spark_entry__ as entrymod
    names = list(entrymod.queries())
    certified = set()
    for rnd in (1, 2, 3, 4):
        try:
            rows = json.load(
                open(f"/root/repo/CORRECTNESS_r0{rnd}.json"))
        except FileNotFoundError:
            continue
        # a recorded row only certifies when it actually PASSED
        # (rows+schema+hash, no err) — r4's repetition_stats hash-fail
        # must stay windowed
        for name, rec in rows.items():
            if not isinstance(rec, dict):
                certified.add(name)
            elif not rec.get("err") and rec.get("rows_match") and \
                    rec.get("schema_match") and \
                    rec.get("hash_match", True):
                certified.add(name)
    uncertified = [n for n in names if n not in certified]
    window = names[:50]
    if len(uncertified) <= 50:
        # everything uncertified fits — it must ALL be inside the window
        assert set(uncertified) <= set(window), \
            sorted(set(uncertified) - set(window))
    else:
        # more uncertified queries than window slots (rounds 4f+): the
        # window must be FULLY spent on uncertified queries; the overflow
        # rotates into the next round's window
        assert all(n in set(uncertified) for n in window), \
            [n for n in window if n not in set(uncertified)]


# -- compression-ratio quality signal -------------------------------------------

def test_compression_ratio_signal(spark, sf_dir):
    """Repetitive text compresses far below prose; random-ish hex far
    above; NULL/empty -> NULL; zero shuffle; deterministic rerun."""
    from gopie_spark.operators.textstats import compression_ratio
    import hashlib
    hexes = " ".join(hashlib.sha256(str(i).encode()).hexdigest()
                     for i in range(40))
    rows = [(0, "spam " * 400),
            (1, "The quick brown fox jumps over the lazy dog. " * 8
                + "It was the best of times, it was the worst of times, "
                  "a tale of two cities in plain English prose."),
            (2, hexes), (3, None), (4, "")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r["compression_ratio"]
           for r in compression_ratio(df).collect()}
    assert out[0] < 0.05          # pure repetition
    assert 0.2 < out[1] < 0.8     # prose
    assert out[2] > out[1]        # low-redundancy noise
    assert out[3] is None and out[4] is None
    plan = compression_ratio(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    again = {r["doc_id"]: r["compression_ratio"]
             for r in compression_ratio(df.repartition(5)).collect()}
    assert again == out


def test_make_epochs_chunk_level(spark, sf_dir, tmp_path):
    """--chunk-tokens shuffles context-window chunks: every chunk of
    every doc appears exactly once per epoch, and a long doc's chunks
    scatter instead of arriving consecutively."""
    import glob
    import pyarrow.parquet as pq
    import sys
    sys.path.insert(0, "/root/repo/jobs")
    from make_epochs import make_epochs
    from gopie_spark.operators.textstats import chunk_documents
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").filter(F.col("doc_id") < 100)
    want_chunks = {(r["doc_id"], r["chunk_idx"]) for r in
                   chunk_documents(docs, max_tokens=16).collect()}
    out = str(tmp_path / "cep")
    rep = make_epochs(docs, out, n_shards=2, epochs=1, seed0=5,
                      chunk_tokens=16)
    assert rep["input_rows"] == len(want_chunks) > 150
    seq, got = [], set()
    for k in range(2):
        for f in sorted(glob.glob(f"{out}/epoch=0/shard={k}/*.parquet")):
            t = pq.read_table(f).to_pydict()
            seq += t["chunk_id"]
            got |= {tuple(map(int, c.split("#"))) for c in t["chunk_id"]}
    assert got == want_chunks
    # scatter: consecutive chunks of one doc are rarely adjacent
    adjacent = sum(
        1 for a, b in zip(seq, seq[1:])
        if a.split("#")[0] == b.split("#")[0])
    assert adjacent < len(seq) * 0.1


# -- unicode normalization -------------------------------------------------------

def test_normalize_text(spark):
    """NFC composes decomposed accents; options casefold/strip accents;
    NULL passes through; zero shuffle; bad form raises."""
    from gopie_spark.operators.textstats import normalize_text
    rows = [(0, "café ﬁn Ａ"), (1, None)]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r["norm_text"]
           for r in normalize_text(d, form="NFC").collect()}
    assert out[0] == "café ﬁn Ａ"  # composed; compat kept
    assert out[1] is None
    nfkc = {r["doc_id"]: r["norm_text"]
            for r in normalize_text(d, form="NFKC").collect()}
    assert nfkc[0] == "café fin A"  # compat chars folded
    strip = {r["doc_id"]: r["norm_text"]
             for r in normalize_text(d, form="NFC", lowercase=True,
                                     strip_accents=True).collect()}
    assert strip[0] == "cafe ﬁn Ａ".lower()
    plan = normalize_text(d)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    import pytest as _pt
    with _pt.raises(ValueError):
        normalize_text(d, form="NFX")


# -- mirror-host detection -------------------------------------------------------

def test_mirror_host_pairs(spark):
    """Planted mirror (m1/m2 share 4 of 5 docs) is found with the right
    counts; unrelated hosts are not paired; universal boilerplate
    shared by many hosts is excluded by the digest cap."""
    from gopie_spark.operators.hoststats import mirror_host_pairs
    rows = []
    for i in range(5):
        rows.append((f"https://m1.example.com/p{i}", f"mirrored doc {i}"))
    for i in range(4):
        rows.append((f"https://m2.example.com/q{i}", f"mirrored doc {i}"))
    rows.append(("https://m2.example.com/q9", "unique to m2"))
    for h in range(8):
        rows.append((f"https://u{h}.example.com/a", f"unique {h}"))
        rows.append((f"https://u{h}.example.com/b", "universal boilerplate"))
    df = spark.createDataFrame(rows, "url string, text string")
    got = mirror_host_pairs(df, min_shared=2, min_overlap=0.5,
                            max_hosts_per_digest=5).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["host_a"], r["host_b"]) == ("m1.example.com",
                                          "m2.example.com")
    assert r["n_shared"] == 4 and r["size_a"] == 5 and r["size_b"] == 5
    assert abs(r["overlap"] - 0.8) < 1e-12
    # raising the cap past 8 pairs the boilerplate hosts
    loose = mirror_host_pairs(df, min_shared=1, min_overlap=0.4,
                              max_hosts_per_digest=20).count()
    assert loose > 1


# -- sentence segmentation -------------------------------------------------------

def test_split_sentences(spark):
    """Boundary kinds (., !, ?, runs), trimming, empty/NULL docs, and
    the zero-shuffle plan."""
    from gopie_spark.operators.textstats import split_sentences
    rows = [(0, "One. Two!  Three?? Four... no stop"),
            (1, "   "), (2, None), (3, "Single")]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    got = {}
    for r in split_sentences(d).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["sent_idx"], r["sentence"]))
    # an ellipsis run followed by space is a boundary by the rule
    assert got[0] == [(0, "One."), (1, "Two!"), (2, "Three??"),
                      (3, "Four..."), (4, "no stop")]
    assert 1 not in got and 2 not in got
    assert got[3] == [(0, "Single")]
    plan = split_sentences(d)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


# -- sentence-level keep-first dedup ---------------------------------------------

def test_dedup_sentences(spark):
    """A disclaimer sentence repeated across docs keeps exactly its
    first occurrence; rebuild preserves order; hash and string key
    tiers agree byte-for-byte."""
    from gopie_spark.operators.dedup import dedup_sentences
    disclaimer = "All rights reserved."
    rows = [(0, f"Intro zero. {disclaimer} Body zero!"),
            (1, f"Intro one. {disclaimer} Body one!"),
            (2, f"{disclaimer}"),
            (3, "Unique text only.")]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: (r["clean_text"], r["n_sents"],
                         r["n_sents_kept"])
           for r in dedup_sentences(d).collect()}
    assert out[0] == (f"Intro zero. {disclaimer} Body zero!", 3, 3)
    assert out[1] == ("Intro one. Body one!", 3, 2)
    assert out[2] == ("", 1, 0)
    assert out[3] == ("Unique text only.", 1, 1)
    a = dedup_sentences(d, hash_keys=True).collect()
    b = dedup_sentences(d, hash_keys=False).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_curate_sentence_dedup_and_mirror_report(spark, sf_dir):
    """sentence_dedup composes as a counted stage (monotone accounting,
    repeated planted disclaimers cut); mirror_report embeds the planted
    mirror pair without dropping rows."""
    import sys
    sys.path.insert(0, "/root/repo/jobs")
    from filter_corpus import curate
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    # two mirror hosts serve identical texts for doc_id<40 (20 each)
    url = F.concat(F.lit("https://m"), (d % 2).cast("string"),
                   F.lit(".example.com/p/"), d.cast("string"))
    # class = d % 5 so every class has members of both host parities
    text = F.when(d < 40,
                  F.concat(F.lit("Shared page body number "),
                           (d % 5).cast("string"),
                           F.lit(" with plenty of the and of words. "
                                 "It is here so that the filter keeps "
                                 "it in the corpus for the test."))) \
        .otherwise(F.concat(F.col("text"),
                            F.lit(". Disclaimer number "),
                            (d % 7).cast("string"), F.lit(" applies!")))
    pages = docs.select("doc_id", text.alias("text"), "lang",
                        url.alias("url"))
    out, rep = curate(spark, pages, min_tokens=5, dedup=False,
                      sentence_dedup=True, mirror_report=3)
    assert rep["after_sentence_dedup"] <= rep["after_quality"]
    assert rep["output_rows"] == rep["after_sentence_dedup"] \
        == out.count()
    pairs = {(m["host_a"], m["host_b"]) for m in rep["mirror_pairs"]}
    assert ("m0.example.com", "m1.example.com") in pairs
    # the planted disclaimer survives exactly once corpus-wide
    n_disc = out.filter(F.col("text").contains(
        "Disclaimer number 3 applies!")).count()
    assert n_disc == 1
    out.unpersist()


# -- incremental sentence dedup vs a sentence-key store --------------------------

def test_incremental_sentence_dedup_equals_full_batch(spark, sf_dir,
                                                      tmp_path):
    """Two-phase (history then new batch via the store) == full-batch
    dedup_sentences restricted to the new docs; store never re-reads
    history text."""
    from gopie_spark.operators.dedup import (dedup_sentences,
                                             incremental_sentence_dedup)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    planted = F.concat(F.col("text"), F.lit(". Disclaimer number "),
                       (F.col("doc_id") % 7).cast("string"),
                       F.lit(" applies!"))
    corpus = docs.select("doc_id", planted.alias("text"))
    hist = corpus.filter(F.col("doc_id") < 250)
    new = corpus.filter(F.col("doc_id") >= 250)
    store = str(tmp_path / "sent_store")
    incremental_sentence_dedup(hist, store).collect()  # phase 1
    got = {r["doc_id"]: (r["clean_text"], r["n_sents_kept"])
           for r in incremental_sentence_dedup(new, store).collect()}
    full = {r["doc_id"]: (r["clean_text"], r["n_sents_kept"])
            for r in dedup_sentences(corpus).collect()
            if r["doc_id"] >= 250}
    assert got == full
    # every later copy of each disclaimer was cut in phase 2
    assert all("Disclaimer" not in t for t, _ in got.values())


# -- corpus card -----------------------------------------------------------------

def test_corpus_card(spark, sf_dir):
    """The card composes the certified operators into one dict: exact
    token totals, entropy per lang, t-digest quantiles bracketing the
    true median, duplicate fraction of a planted duplicate, host
    sections, quality rates in [0,1]."""
    import sys
    sys.path.insert(0, "/root/repo/jobs")
    from corpus_report import corpus_card
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    url = F.concat(F.lit("https://h"), (d % 20).cast("string"),
                   F.lit(".example.com/p/"), d.cast("string"))
    # plant 50 exact duplicates (doc_id 450+ copy doc 0's text)
    text = F.when(d >= 450, F.lit("the shared duplicate body text")) \
        .otherwise(F.col("text"))
    pages = docs.select("doc_id", text.alias("text"), "lang",
                        url.alias("url"))
    card = corpus_card(spark, pages)
    assert card["n_docs"] == 500 and card["n_hosts"] == 20
    assert card["distinct_urls_est"] == 500  # < k=4096: exact tier
    assert set(card["languages"]) == {r["lang"] for r in
                                      docs.select("lang").distinct()
                                      .collect()}
    assert card["n_tokens"] == sum(
        v["n_tokens"] for v in card["languages"].values())
    assert card["exact_duplicate_fraction"] == round(49 / 500, 6)
    q = card["token_length_quantiles"]
    assert q["0.01"] <= q["0.5"] <= q["0.99"]
    assert all(0.0 <= v <= 1.0
               for v in card["quality_flag_rates"].values())
