"""SQL surface: sketch states queryable from spark.sql via registered
Arrow-batched functions; each blob self-describes its parameters."""

import pytest
from pyspark.sql import functions as F

from gopie_spark.functions.sql import register_sql_functions
from gopie_spark.kernels import HLL, KLL, DDSketch, TDigest
from gopie_spark.operators.sketch_agg import STATE_COL, sketch_agg

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def registered(spark):
    register_sql_functions(spark)
    return spark


def test_hll_estimate_from_sql(registered, spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    hll = HLL(p=12)
    states = sketch_agg(docs.selectExpr("lang", "cast(doc_id as string) v"),
                        ["lang"], "v", hll)
    states.createOrReplaceTempView("lang_states")
    got = {r["lang"]: r["n"] for r in spark.sql(
        "SELECT lang, gopie_hll_estimate(sketch_state) AS n "
        "FROM lang_states").collect()}
    direct = {r["lang"]: hll.count(hll.deserialize(bytes(r[STATE_COL])))
              for r in states.collect()}
    assert got == direct


def test_hll_sql_handles_mixed_p_blobs(registered, spark):
    """Blob-driven parameterization: states of different p in one column
    both finalize correctly (no fixed-shape assumption in the SQL fn)."""
    vals = [str(i) for i in range(3000)]
    rows = []
    for p in (10, 14):
        h = HLL(p=p)
        st = h.zero()
        h.update(st, vals)
        rows.append((p, bytearray(h.serialize(st))))
    df = spark.createDataFrame(rows, "p int, sketch_state binary")
    df.createOrReplaceTempView("mixed_states")
    got = {r["p"]: r["n"] for r in spark.sql(
        "SELECT p, gopie_hll_estimate(sketch_state) AS n "
        "FROM mixed_states").collect()}
    for p, n in got.items():
        assert abs(n - 3000) <= 3 * (1.04 / 2 ** (p / 2)) * 3000 + 5


def test_quantile_fns_from_sql(registered, spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for kernel, fn in ((TDigest(), "gopie_tdigest_quantile"),
                       (KLL(k=200), "gopie_kll_quantile"),
                       (DDSketch(alpha=0.01), "gopie_ddsketch_quantile")):
        states = sketch_agg(
            docs.selectExpr("lang", "cast(n_chars as double) v"),
            ["lang"], "v", kernel)
        states.createOrReplaceTempView("q_states")
        rows = spark.sql(
            f"SELECT lang, {fn}(sketch_state, 0.5) AS med "
            "FROM q_states").collect()
        med = {r["lang"]: r["med"] for r in rows}
        exact = {r["lang"]: r["m"] for r in docs.groupBy("lang").agg(
            F.expr("percentile(n_chars, 0.5)").alias("m")).collect()}
        for lang in exact:
            assert abs(med[lang] - exact[lang]) / max(exact[lang], 1) < 0.25


def test_cms_and_bloom_from_sql(registered, spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    from gopie_spark.operators import bloom_build, cms_build
    cms, cst = cms_build(ev, "event_type", jvm_pre_aggregate=True)
    bloom, bst = bloom_build(
        ev.selectExpr("cast(user_id as string) u"), "u",
        n=ev.count(), p=1e-6)
    types = [r[0] for r in ev.select("event_type").distinct().collect()]
    probe = spark.createDataFrame(
        [(bytearray(cms.serialize(cst)), bytearray(bloom.serialize(bst)), t)
         for t in types] +
        [(bytearray(cms.serialize(cst)), bytearray(bloom.serialize(bst)),
          "no-such-type")],
        "cms binary, bloom binary, probe string")
    probe.createOrReplaceTempView("probe")
    rows = spark.sql(
        "SELECT probe, gopie_cms_estimate(cms, probe) AS est, "
        "gopie_cms_total(cms) AS total FROM probe").collect()
    exact = dict(ev.groupBy("event_type").count().collect())
    for r in rows:
        want = exact.get(r["probe"], 0)
        assert r["est"] == want  # exact at low load
        assert r["total"] == sum(exact.values())
    hits = spark.sql(
        "SELECT gopie_bloom_exist(bloom, cast(501 as string)) AS h "
        "FROM probe LIMIT 1").collect()
    # membership of an actual user id must be True (no false negatives)
    uid = str(ev.select("user_id").first()[0])
    hit = spark.sql(
        f"SELECT gopie_bloom_exist(bloom, '{uid}') AS h FROM probe LIMIT 1"
    ).collect()[0]["h"]
    assert hit is True


def test_bloom_exist_dispatches_all_variants(registered, spark):
    """gopie_bloom_exist sniffs the blob kind: bit, counting, and
    scalable states all answer membership from SQL."""
    from gopie_spark.kernels import BloomBit, BloomCounting, BloomScalable
    keys = [f"k{i}" for i in range(500)]
    rows = []
    for name, bf in (("bit", BloomBit.from_guess(500, 1e-6)),
                     ("counting", BloomCounting.from_guess(500, 1e-6)),
                     ("scalable", BloomScalable(n0=64, p=1e-6))):
        st = bf.zero()
        bf.update(st, keys)
        rows.append((name, bytearray(bf.serialize(st))))
    df = spark.createDataFrame(rows, "variant string, state binary")
    df.createOrReplaceTempView("blooms")
    hit = spark.sql("SELECT variant, gopie_bloom_exist(state, 'k7') AS h, "
                    "gopie_bloom_exist(state, 'absent-xyz') AS miss "
                    "FROM blooms").collect()
    assert len(hit) == 3
    for r in hit:
        assert r["h"] is True, r["variant"]
        assert r["miss"] is False, r["variant"]


def test_suggest_salt_sampling_path(spark):
    """suggest_salt(sample_fraction=...) detects the same Zipf skew from a
    uniform sample (key shares converge on samples)."""
    from gopie_spark.operators import suggest_salt
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    full = suggest_salt(docs, ["lang"])
    sampled = suggest_salt(docs, ["lang"], sample_fraction=0.5)
    assert full > 1 and sampled >= 1
    assert abs(sampled - full) <= 1  # shares converge; off-by-one slack


def test_rank_functions_invert_quantiles_from_sql(registered, spark):
    """gopie_*_rank are the CDF inverses of the quantile functions."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for q_fn, r_fn, kernel in (
            ("gopie_tdigest_quantile", "gopie_tdigest_rank", TDigest()),
            ("gopie_kll_quantile", "gopie_kll_rank", KLL(k=200))):
        states = sketch_agg(
            docs.selectExpr("lang", "cast(n_chars as double) v"),
            ["lang"], "v", kernel)
        states.createOrReplaceTempView("r_states")
        rows = spark.sql(
            f"SELECT lang, {r_fn}(sketch_state, "
            f"{q_fn}(sketch_state, 0.5)) AS r FROM r_states").collect()
        for r in rows:
            assert abs(r["r"] - 0.5) < 0.08, (q_fn, r["lang"], r["r"])


def test_mg_estimate_from_sql(registered, spark):
    from gopie_spark.kernels import MisraGries
    from gopie_spark.operators import global_sketch
    ev = spark.read.parquet(f"{SF}/events.parquet")
    mg = MisraGries(k=64)
    st = global_sketch(ev.selectExpr("event_type AS v"), "v", mg)
    types = [r[0] for r in ev.select("event_type").distinct().collect()]
    df = spark.createDataFrame(
        [(bytearray(mg.serialize(st)), t) for t in types + ["absent"]],
        "state binary, probe string")
    df.createOrReplaceTempView("mg_probe")
    got = {r["probe"]: r["est"] for r in spark.sql(
        "SELECT probe, gopie_mg_estimate(state, probe) AS est "
        "FROM mg_probe").collect()}
    exact = dict(ev.groupBy("event_type").count().collect())
    for t in types:
        assert got[t] == exact[t]  # exact: capacity covers universe
    assert got["absent"] == 0


def test_ams_f2_from_sql(registered, spark):
    """Grouped AMS states finalize from spark.sql; each group's F2
    estimate within the kernel bound of its exact self-join size."""
    from gopie_spark.kernels import AMS
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ams = AMS(n_means=64, n_medians=5)
    sk = sketch_agg(docs.select("lang", F.col("source").alias("v")),
                    ["lang"], "v", ams)
    sk.createOrReplaceTempView("ams_states")
    got = {r["lang"]: r["f2"] for r in spark.sql(
        f"SELECT lang, gopie_ams_f2({STATE_COL}) AS f2 "
        "FROM ams_states").collect()}
    exact = {r["lang"]: r["f2"] for r in
             docs.groupBy("lang", "source").count()
             .groupBy("lang")
             .agg(F.sum(F.col("count") * F.col("count")).alias("f2"))
             .collect()}
    assert set(got) == set(exact)
    for lang in got:
        assert abs(got[lang] - exact[lang]) \
            <= 4 * ams.rel_err * exact[lang], lang


def test_countsketch_from_sql(registered, spark):
    """CountSketch states finalize from spark.sql: point estimates for
    the exact top tokens within the 3-sigma sqrt(F2/w) band, and the
    state's own F2 estimate near the exact F2."""
    from gopie_spark.operators import countsketch_tokens_build
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cs, state = countsketch_tokens_build(docs.select("text"), "text",
                                         width=2048, depth=7)
    counted = (docs.select(F.explode(F.split(F.col("text"), r"\s+"))
                           .alias("tok"))
               .filter(F.col("tok") != "")
               .groupBy("tok").agg(F.count("*").alias("cnt")))
    f2 = counted.agg(F.sum(F.col("cnt") * F.col("cnt"))).collect()[0][0]
    top = counted.orderBy(F.desc("cnt"), F.asc("tok")).limit(10).collect()
    blob = bytearray(cs.serialize(state))
    df = spark.createDataFrame(
        [(blob, r["tok"], int(r["cnt"])) for r in top],
        "state binary, tok string, cnt long")
    df.createOrReplaceTempView("cs_probe")
    rows = spark.sql(
        "SELECT tok, cnt, gopie_countsketch_estimate(state, tok) AS est, "
        "gopie_countsketch_f2(state) AS f2 FROM cs_probe").collect()
    for r in rows:
        assert abs(r["est"] - r["cnt"]) \
            <= cs.error_bound(float(f2), float(r["cnt"])), r["tok"]
        assert abs(r["f2"] - f2) / f2 < 0.1


def test_wmh_jaccard_from_sql(registered, spark):
    """Weighted-MinHash pairwise estimate from spark.sql over two
    serialized states: doubled weights estimate J_w ~ 1/2; NULL in ->
    NULL out."""
    import numpy as np
    from gopie_spark.kernels import WeightedMinHash
    rng = np.random.default_rng(9)
    wmh = WeightedMinHash(k=512)
    feats = rng.integers(1, 2 ** 63, 60).astype(np.uint64)
    w = rng.uniform(1, 3, 60)
    sa = wmh.update_weighted(wmh.zero(), feats, w)
    sb = wmh.update_weighted(wmh.zero(), feats, 2 * w)
    df = spark.createDataFrame(
        [(bytearray(wmh.serialize(sa)), bytearray(wmh.serialize(sb))),
         (bytearray(wmh.serialize(sa)), None)],
        "a binary, b binary")
    df.createOrReplaceTempView("wmh_probe")
    rows = spark.sql(
        "SELECT gopie_wmh_jaccard(a, b) AS j FROM wmh_probe").collect()
    ests = [r["j"] for r in rows]
    import math
    half = [e for e in ests if e is not None]
    assert len(half) == 1
    assert abs(half[0] - 0.5) <= 3 * math.sqrt(0.25 / 512)
    assert any(e is None for e in ests)


def test_sliding_hll_estimate_from_sql(registered, spark):
    """gopie_sliding_hll_estimate(state, cutoff): NULL cutoff = whole
    history (== plain-HLL band); a mid-span cutoff counts only the
    suffix; a cutoff past the last event counts ~0."""
    import math
    from gopie_spark.kernels import SlidingHLL
    sh = SlidingHLL(p=12)
    st = sh.zero()
    # two epochs: 4000 ids at t=100, 2000 NEW ids at t=200
    st = sh.update(st, ([f"old{i}" for i in range(4000)], [100.0] * 4000))
    st = sh.update(st, ([f"new{i}" for i in range(2000)], [200.0] * 2000))
    df = spark.createDataFrame(
        [(bytearray(sh.serialize(st)),)], "state binary")
    df.createOrReplaceTempView("shll_probe")
    row = spark.sql(
        "SELECT gopie_sliding_hll_estimate(state, NULL) AS full, "
        "gopie_sliding_hll_estimate(state, 150.0) AS recent, "
        "gopie_sliding_hll_estimate(state, 999.0) AS empty "
        "FROM shll_probe").collect()[0]
    band = 3 * 1.04 / math.sqrt(sh.m)
    assert abs(row["full"] - 6000) <= band * 6000 + 5
    assert abs(row["recent"] - 2000) <= band * 2000 + 5
    assert row["empty"] <= band * 100  # nothing past t=200


def test_window_cms_estimate_from_sql(registered, spark):
    """gopie_window_cms_estimate(state, value, window): NULL window =
    whole horizon; a 1-tick window counts only the newest tick; never
    undercounts and obeys the epsilon bound on the probes."""
    from gopie_spark.kernels import WindowCMS
    wc = WindowCMS(width=2719, depth=7, resolution=10.0, n_ticks=50)
    st = wc.zero()
    st = wc.update(st, ["a"] * 300 + ["b"] * 100, [5.0] * 400)   # tick 0
    st = wc.update(st, ["a"] * 50, [15.0] * 50)                  # tick 1
    df = spark.createDataFrame(
        [(bytearray(wc.serialize(st)),)], "state binary")
    df.createOrReplaceTempView("wcms_probe")
    row = spark.sql(
        "SELECT gopie_window_cms_estimate(state, 'a', NULL) AS a_all, "
        "gopie_window_cms_estimate(state, 'a', 1) AS a_new, "
        "gopie_window_cms_estimate(state, 'b', 1) AS b_new "
        "FROM wcms_probe").collect()[0]
    assert 350 <= row["a_all"] <= 350 + 3 * wc.epsilon * 450
    assert 50 <= row["a_new"] <= 50 + 3 * wc.epsilon * 50
    assert row["b_new"] <= 3 * wc.epsilon * 50  # b absent from tick 1


# --------------------------------------------------------------------------
# gopie_sketch_merge: the SQL AGGREGATE (grouped-agg pandas UDF) that rolls
# up persisted partial-state relations in plain SQL
# --------------------------------------------------------------------------

def test_sketch_merge_rollup_equals_operator_merge(registered, spark):
    """SQL GROUP-BY merge of fine-grain HLL cells is BYTE-EQUAL to the
    operator path's coarse build (register-max is order-independent), so
    the SQL surface and operators/sketch_agg cannot drift."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    hll = HLL(p=12)
    src = docs.selectExpr("lang", "pmod(xxhash64(doc_id), 8) AS bucket",
                          "cast(doc_id as string) v")
    fine = sketch_agg(src, ["lang", "bucket"], "v", hll)
    fine.createOrReplaceTempView("hll_cells")
    rolled = {r["lang"]: bytes(r["state"]) for r in spark.sql(
        "SELECT lang, gopie_sketch_merge(sketch_state) AS state "
        "FROM hll_cells GROUP BY lang").collect()}
    coarse = {r["lang"]: bytes(r[STATE_COL]) for r in sketch_agg(
        src, ["lang"], "v", hll).collect()}
    assert rolled == coarse


def test_sketch_merge_composes_with_probes_one_statement(registered, spark):
    """Merge + finalize in ONE SQL statement; estimate within the HLL
    band of the exact per-group distinct."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    hll = HLL(p=13)
    src = docs.selectExpr("lang", "pmod(xxhash64(doc_id), 16) AS bucket",
                          "cast(doc_id as string) v")
    sketch_agg(src, ["lang", "bucket"], "v", hll) \
        .createOrReplaceTempView("hll_cells13")
    got = {r["lang"]: r["est"] for r in spark.sql(
        "SELECT lang, gopie_hll_estimate(gopie_sketch_merge(sketch_state))"
        " AS est FROM hll_cells13 GROUP BY lang").collect()}
    exact = {r["lang"]: r["n"] for r in
             docs.groupBy("lang").agg(
                 F.countDistinct("doc_id").alias("n")).collect()}
    band = 4 * 1.04 / (2 ** 6.5)  # 4 sigma at m=2^13
    for lang, n in exact.items():
        assert abs(got[lang] - n) <= band * n + 5


def test_sketch_merge_global_aggregate_cms_linear(registered, spark):
    """Global (no GROUP BY) merge; CMS merge is counter-ADD so the SQL
    rollup of per-bucket states is byte-equal to one direct build."""
    from gopie_spark.kernels import CMS
    events = spark.read.parquet(f"{SF}/events.parquet")
    cms = CMS(width=2048, depth=5)
    src = events.selectExpr("pmod(xxhash64(user_id), 8) AS bucket",
                            "event_type v")
    sketch_agg(src, ["bucket"], "v", cms) \
        .createOrReplaceTempView("cms_cells")
    rolled = bytes(spark.sql(
        "SELECT gopie_sketch_merge(sketch_state) AS state FROM cms_cells"
    ).collect()[0]["state"])
    direct = bytes(sketch_agg(src, [], "v", cms).collect()[0][STATE_COL])
    assert rolled == direct
    # and the merged state probes correctly from SQL too
    spark.createDataFrame([(bytearray(rolled),)], "state binary") \
        .createOrReplaceTempView("cms_rolled")
    est = spark.sql("SELECT gopie_cms_estimate(state, 'click') AS n "
                    "FROM cms_rolled").collect()[0]["n"]
    exact = events.where("event_type = 'click'").count()
    assert exact <= est <= exact + 3 * cms.epsilon * events.count()


def test_sketch_merge_skips_nulls_and_all_null_is_null(registered, spark):
    hll = HLL(p=10)
    st = hll.zero()
    hll.update(st, [str(i) for i in range(500)])
    blob = bytearray(hll.serialize(st))
    df = spark.createDataFrame(
        [("a", blob), ("a", None), ("b", None)],
        "g string, sketch_state binary")
    df.createOrReplaceTempView("nullish_cells")
    rows = {r["g"]: r for r in spark.sql(
        "SELECT g, gopie_sketch_merge(sketch_state) AS state, "
        "gopie_hll_estimate(gopie_sketch_merge(sketch_state)) AS est "
        "FROM nullish_cells GROUP BY g").collect()}
    assert bytes(rows["a"]["state"]) == bytes(blob)
    assert abs(rows["a"]["est"] - 500) <= 0.1 * 500
    assert rows["b"]["state"] is None


def test_sketch_merge_mixed_kinds_refused(registered, spark):
    from gopie_spark.kernels import CMS
    hll = HLL(p=10)
    hst = hll.zero()
    hll.update(hst, ["x"])
    cms = CMS(width=64, depth=3)
    cst = cms.zero()
    cms.update(cst, ["x"])
    df = spark.createDataFrame(
        [(bytearray(hll.serialize(hst)),), (bytearray(cms.serialize(cst)),)],
        "sketch_state binary")
    df.createOrReplaceTempView("mixed_kind_cells")
    with pytest.raises(Exception, match="mixed sketch kinds"):
        spark.sql("SELECT gopie_sketch_merge(sketch_state) AS s "
                  "FROM mixed_kind_cells").collect()
