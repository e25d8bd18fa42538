"""Corpus snapshot drift (operators/drift.py): kernel linearity,
set-algebra bands, KS bands, from-states twins, report structure."""
import numpy as np
import pytest

from pyspark.sql import functions as F

from gopie_spark.kernels import KLL, CountSketch, MisraGries, Theta
from gopie_spark.operators.drift import (drift_report, kll_eps,
                                         ks_from_states, lang_share_drift,
                                         length_drift, token_drift,
                                         token_drift_from_states,
                                         url_set_drift,
                                         url_set_drift_from_states)
from gopie_spark.operators.sketch_agg import (global_sketch,
                                              global_sketch_multi,
                                              tokens_sketch_build,
                                              tokens_sketch_build_multi)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _snapshots(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return (d.filter(F.pmod(F.col("doc_id"), F.lit(10)) < 7),
            d.filter(F.pmod(F.col("doc_id"), F.lit(10)) >= 3))


# --------------------------------------------------------------------------
# CountSketch.subtract (kernel-level)
# --------------------------------------------------------------------------

def test_cs_subtract_estimates_frequency_difference():
    rng = np.random.default_rng(7)
    vocab = np.array([f"tok{i}" for i in range(200)], dtype=object)
    fa = rng.integers(0, 50, size=vocab.size)
    fb = fa.copy()
    fb[:10] += np.arange(100, 200, 10)   # ten heavy movers
    cs = CountSketch(width=4096, depth=7)
    sa, sb = cs.zero(), cs.zero()
    cs.update(sa, vocab, fa)
    cs.update(sb, vocab, fb)
    diff = cs.subtract({"matrix": sb["matrix"].copy(),
                        "count": sb["count"].copy()}, sa)
    est = cs.estimate(diff, vocab)
    true = (fb - fa).astype(float)
    f2 = float((true ** 2).sum())
    bound = cs.error_bound(f2)
    assert np.all(np.abs(est - true) <= bound + 1e-9)
    assert diff["count"][0] == fb.sum() - fa.sum()


def test_cs_subtract_inverts_merge_exactly():
    cs = CountSketch(width=512, depth=5)
    a, b = cs.zero(), cs.zero()
    cs.update(a, np.array(["x", "y"], dtype=object), np.array([3, 4]))
    cs.update(b, np.array(["y", "z"], dtype=object), np.array([1, 9]))
    orig = a["matrix"].copy()
    merged = cs.merge(a, b)          # in place on a
    back = cs.subtract(merged, b)
    assert np.array_equal(back["matrix"], orig)   # integer counters: exact


def test_cs_subtract_shape_refusal():
    with pytest.raises(ValueError):
        CountSketch(width=512, depth=5).subtract(
            CountSketch(width=512, depth=5).zero(),
            CountSketch(width=256, depth=5).zero())


# --------------------------------------------------------------------------
# URL-set drift
# --------------------------------------------------------------------------

def test_url_set_drift_bands_and_states_twin(spark):
    # overlapping integer key sets with known exact algebra
    a = spark.range(0, 700).select(
        F.concat(F.lit("k"), F.col("id")).alias("url"))
    b = spark.range(400, 1100).select(
        F.concat(F.lit("k"), F.col("id")).alias("url"))
    theta = Theta(k=128)
    st_a = global_sketch(a.select(F.col("url").alias("v")), "v", theta)
    st_b = global_sketch(b.select(F.col("url").alias("v")), "v", theta)
    u = url_set_drift_from_states(theta, st_a, st_b)
    band = 4.0 * theta.rel_err
    assert abs(u["n_a_est"] - 700) <= band * 700
    assert abs(u["n_b_est"] - 700) <= band * 700
    assert abs(u["n_common_est"] - 300) <= u["common_bound"]
    assert abs(u["n_new_b_est"] - 400) <= u["new_b_bound"]
    assert abs(u["n_union_est"] - 1100) <= u["union_bound"]
    # full-path twin returns the same numbers (same deterministic hashes)
    full = url_set_drift(a, b, url_col="url", k=128)
    assert full == u


# --------------------------------------------------------------------------
# Token drift
# --------------------------------------------------------------------------

def test_token_drift_top_mover_within_bound(spark, sf_dir):
    df_a, df_b = _snapshots(spark, sf_dir)
    t = token_drift(df_a, df_b, mg_k=256, width=8192, depth=7, top=5)
    # exact per-token deltas
    def counts(df):
        rows = (df.select(F.explode(
            F.split(F.trim(F.col("text")), r"\s+")).alias("t"))
            .filter(F.col("t") != "")
            .groupBy("t").count().collect())
        return {r["t"]: r["count"] for r in rows}
    ca, cb = counts(df_a), counts(df_b)
    deltas = {tok: cb.get(tok, 0) - ca.get(tok, 0)
              for tok in set(ca) | set(cb)}
    f2 = float(sum(d * d for d in deltas.values()))
    cs = CountSketch(width=8192, depth=7)
    for tok, est in t["movers"]:
        true = deltas.get(tok, 0)
        assert abs(est - true) <= cs.error_bound(f2, f=float(true)) + 1e-9
    # movers sorted by |delta| descending
    mags = [abs(d) for _, d in t["movers"]]
    assert mags == sorted(mags, reverse=True)
    assert t["n_candidates"] > 0


def test_token_drift_from_states_twin(spark, sf_dir):
    df_a, df_b = _snapshots(spark, sf_dir)
    cs = CountSketch(width=2048, depth=5)
    mg = MisraGries(k=64)
    cs_a = tokens_sketch_build(df_a, cs, "text", counts_dtype=np.int64)
    cs_b = tokens_sketch_build(df_b, cs, "text", counts_dtype=np.int64)
    mg_a = tokens_sketch_build(df_a, mg, "text", counts_dtype=np.int64)
    mg_b = tokens_sketch_build(df_b, mg, "text", counts_dtype=np.int64)
    via_states = token_drift_from_states(cs, cs_a, cs_b, mg, mg_a, mg_b,
                                         top=10)
    full = token_drift(df_a, df_b, mg_k=64, width=2048, depth=5, top=10)
    assert full["movers"] == via_states["movers"]
    assert full["f2_diff_est"] == via_states["f2_diff_est"]


def test_multi_build_matches_single_builds(spark, sf_dir):
    """CS + MG from ONE wordcount stream == two separate builds.

    CountSketch is a linear (order-insensitive) kernel so byte-equality
    is exact by construction; Misra-Gries is compared on the drift
    surface it feeds (retained keys and their estimates), which is what
    token_drift_from_states consumes."""
    df_a, _ = _snapshots(spark, sf_dir)
    cs = CountSketch(width=2048, depth=5)
    mg = MisraGries(k=64)
    cs_multi, mg_multi = tokens_sketch_build_multi(
        df_a, (cs, mg), "text", counts_dtype=np.int64)
    cs_single = tokens_sketch_build(df_a, cs, "text", counts_dtype=np.int64)
    mg_single = tokens_sketch_build(df_a, mg, "text", counts_dtype=np.int64)
    assert cs.serialize(cs_multi) == cs.serialize(cs_single)
    keys_m = set(mg_multi["keys"].astype(str))
    keys_s = set(mg_single["keys"].astype(str))
    assert keys_m == keys_s
    cand = np.array(sorted(keys_m), dtype=object)
    est_m = mg.estimate(mg_multi, cand)
    est_s = mg.estimate(mg_single, cand)
    np.testing.assert_array_equal(est_m, est_s)


def test_global_sketch_multi_matches_single_builds(spark, sf_dir):
    """Theta (string column) + KLL (numeric column) from ONE raw scan
    == two separate global_sketch scans, byte-for-byte: theta is a KMV
    union (order-insensitive) and both paths fold partials in the same
    partition order, so the KLL compactions replay identically."""
    from gopie_spark.operators.textstats import token_count
    from gopie_spark.kernels import KLL, Theta
    df, _ = _snapshots(spark, sf_dir)
    proj = df.select(F.col("doc_id").cast("string").alias("_u"),
                     token_count("text").cast("double").alias("_v"))
    theta, kll = Theta(k=512), KLL(k=128)
    st_u, st_v = global_sketch_multi(proj, [("_u", theta), ("_v", kll)])
    st_u1 = global_sketch(proj.select("_u"), "_u", theta)
    st_v1 = global_sketch(proj.select("_v"), "_v", kll)
    assert theta.serialize(st_u) == theta.serialize(st_u1)
    assert kll.serialize(st_v) == kll.serialize(st_v1)


# --------------------------------------------------------------------------
# Length drift (KS)
# --------------------------------------------------------------------------

def test_ks_identical_states_is_zero():
    kll = KLL(k=200)
    st = kll.zero()
    kll.update(st, np.arange(1000, dtype=float))
    assert ks_from_states(kll, st, st) == 0.0


def test_ks_known_shift_within_band():
    # two uniform distributions offset by half their support:
    # exact KS = 0.5
    kll = KLL(k=200)
    a, b = kll.zero(), kll.zero()
    rng = np.random.default_rng(3)
    xa = rng.permutation(np.arange(0, 2000, dtype=float))
    xb = rng.permutation(np.arange(1000, 3000, dtype=float))
    kll.update(a, xa)
    kll.update(b, xb)
    assert abs(ks_from_states(kll, a, b) - 0.5) <= 2 * kll_eps(200)


def test_length_drift_vs_exact(spark, sf_dir):
    from gopie_spark.operators.textstats import token_count
    df_a, df_b = _snapshots(spark, sf_dir)
    ln = length_drift(df_a, df_b)

    def lens(df):
        return np.array([r["v"] for r in
                         df.select(token_count("text").alias("v"))
                         .collect()], dtype=float)
    la, lb = np.sort(lens(df_a)), np.sort(lens(df_b))
    grid = np.union1d(la, lb)
    fa = np.searchsorted(la, grid, side="right") / la.size
    fb = np.searchsorted(lb, grid, side="right") / lb.size
    exact = float(np.max(np.abs(fa - fb)))
    assert abs(ln["ks_est"] - exact) <= ln["ks_band"]
    assert ln["n_a"] == la.size and ln["n_b"] == lb.size
    # quantile shifts are plausible values from the data's range
    for q, (va, vb) in ln["quantile_shift"].items():
        assert la.min() <= va <= la.max()
        assert lb.min() <= vb <= lb.max()


# --------------------------------------------------------------------------
# Composed report
# --------------------------------------------------------------------------

def test_drift_report_sections(spark, sf_dir):
    df_a, df_b = _snapshots(spark, sf_dir)
    with_url = df_a.withColumn("url", F.concat(F.lit("u"), F.col("doc_id")))
    r = drift_report(with_url,
                     df_b.withColumn("url",
                                     F.concat(F.lit("u"), F.col("doc_id"))),
                     url_col="url", theta_k=64, top=5)
    assert set(r) == {"urls", "tokens", "length", "languages"}
    assert len(r["tokens"]["movers"]) <= 5
    # no url column requested -> no urls section
    r2 = drift_report(df_a, df_b, lang_col=None)
    assert set(r2) == {"tokens", "length"}


def test_corpus_report_compare_flag(spark, sf_dir, tmp_path, monkeypatch):
    """jobs/corpus_report.py --compare adds a drift section: the job
    runs end-to-end through main(), and comparing a snapshot against
    ITSELF reports near-zero drift (Jaccard ~1 within the theta band,
    KS == 0 on identical states, every mover delta within the CS band
    of 0)."""
    import sys
    sys.path.insert(0, "/root/repo/jobs")
    import json
    import corpus_report
    out = tmp_path / "card.json"
    monkeypatch.setattr(sys, "argv", [
        "corpus_report.py", "--input", f"{sf_dir}/documents.parquet",
        "--output", str(out), "--compare",
        f"{sf_dir}/documents.parquet", "--mirror-top", "0"])
    # the job builds its own session via get_spark — it reuses the active
    # one, so neuter its end-of-job stop() to keep the fixture alive
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    corpus_report.main()
    card = json.loads(out.read_text())
    d = card["drift"]
    assert set(d) >= {"tokens", "length", "languages"}
    assert d["length"]["ks_est"] == 0.0
    assert d["languages"]["l1"] == 0.0
    assert all(abs(delta) <= d["tokens"]["delta_bound"]
               for _, delta in d["tokens"]["movers"])


def test_lang_share_drift_exact(spark):
    a = spark.createDataFrame(
        [("en",)] * 3 + [("de",)], "lang string")
    b = spark.createDataFrame(
        [("en",)] * 2 + [("fr",)] * 2, "lang string")
    ls = lang_share_drift(a, b)
    assert ls["shares"]["en"] == (0.75, 0.5)
    assert ls["shares"]["de"] == (0.25, 0.0)
    assert ls["shares"]["fr"] == (0.0, 0.5)
    assert ls["l1"] == pytest.approx(1.0)


# --------------------------------------------------------------------------
# Grouped (per-lang) drift
# --------------------------------------------------------------------------

def test_grouped_states_equal_per_slice_global_builds(spark, sf_dir):
    # the one-scan keyed co-build must produce, per group, byte-identical
    # states to running the global co-build on that group's slice
    from pyspark.sql import functions as F
    from gopie_spark.kernels import KLL, Theta
    from gopie_spark.operators.drift import (_raw_sketch_states,
                                             grouped_drift_states)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "url", F.concat(F.lit("u"), F.col("doc_id").cast("string")))
    theta, kll = Theta(k=512), KLL(k=200)
    grouped = grouped_drift_states(docs, "lang", url_col="url",
                                   theta=theta, kll=kll)
    for lg in grouped:
        st_u, st_v = _raw_sketch_states(
            docs.filter(F.col("lang") == lg), KLL(k=200), "text",
            Theta(k=512), "url")
        assert theta.serialize(grouped[lg][0]) == theta.serialize(st_u)
        assert kll.serialize(grouped[lg][1]) == kll.serialize(st_v)


def test_grouped_report_missing_group_conventions(spark, sf_dir):
    # a group present in only one snapshot: KS = 1.0 (full mass moved),
    # the empty side's quantiles are None, distinct estimate 0
    from pyspark.sql import functions as F
    from gopie_spark.operators.drift import grouped_drift_report
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "url", F.concat(F.lit("u"), F.col("doc_id").cast("string")))
    a = docs
    b = docs.filter(F.col("lang") != "zh")
    rep = grouped_drift_report(a, b, group_col="lang", url_col="url")
    zh = rep["zh"]
    assert zh["length"]["ks_est"] == 1.0
    assert zh["length"]["n_b"] == 0
    assert all(pair[1] is None
               for pair in zh["length"]["quantile_shift"].values())
    assert zh["urls"]["n_b_est"] == 0.0
    # strict JSON (no NaN) round-trips
    import json
    json.loads(json.dumps(rep, allow_nan=False))


def test_ks_empty_state_conventions():
    from gopie_spark.kernels import KLL
    from gopie_spark.operators.drift import ks_from_states
    import numpy as np
    kll = KLL(k=200)
    empty = kll.zero()
    full = kll.update(kll.zero(), np.arange(100, dtype=np.float64))
    assert ks_from_states(kll, empty, kll.zero()) == 0.0
    assert ks_from_states(kll, empty, full) == 1.0
    assert ks_from_states(kll, full, empty) == 1.0


def test_keyed_sketch_multi_null_group_key(spark):
    from pyspark.sql import functions as F
    from gopie_spark.kernels import Theta
    from gopie_spark.operators.sketch_agg import keyed_sketch_multi
    df = spark.createDataFrame(
        [("en", "u1"), (None, "u2"), (None, "u3"), ("en", "u4")],
        "g string, v string")
    out = keyed_sketch_multi(df, "g", [("v", Theta(k=64))])
    assert set(out) == {"en", None}
    t = Theta(k=64)
    assert t.estimate(out[None][0]) == 2.0
    assert t.estimate(out["en"][0]) == 2.0


def test_grouped_persist_load_diff_equals_live(spark, sf_dir, tmp_path):
    # persist two snapshots with the grouped tier, diff with zero Spark,
    # and the "groups" section must equal the live grouped report
    from pyspark.sql import functions as F
    from gopie_spark.operators.drift import (drift_report_from_states,
                                             grouped_drift_report,
                                             load_drift_states,
                                             persist_drift_states)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "url", F.concat(F.lit("u"), F.col("doc_id").cast("string")))
    a = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) < 7)
    b = docs.filter((F.pmod(F.col("doc_id"), F.lit(10)) >= 3)
                    & (F.col("lang") != "zh"))
    wa = persist_drift_states(a, str(tmp_path / "a"), group_col="lang")
    wb = persist_drift_states(b, str(tmp_path / "b"), group_col="lang")
    assert "grouped" in wa and "grouped" in wb
    rep = drift_report_from_states(load_drift_states(str(tmp_path / "a")),
                                   load_drift_states(str(tmp_path / "b")))
    live = grouped_drift_report(a, b, group_col="lang", url_col="url")
    assert rep["groups"] == live
    assert rep["groups"]["zh"]["length"]["ks_est"] == 1.0


def test_grouped_from_states_param_mismatch_refused(spark, sf_dir,
                                                    tmp_path):
    import pytest as _pytest
    from pyspark.sql import functions as F
    from gopie_spark.operators.drift import (
        grouped_drift_report_from_states, load_drift_states,
        persist_drift_states)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "url", F.concat(F.lit("u"), F.col("doc_id").cast("string")))
    persist_drift_states(docs, str(tmp_path / "a"), group_col="lang",
                         kll_k=200)
    persist_drift_states(docs, str(tmp_path / "b"), group_col="lang",
                         kll_k=100)
    ga = load_drift_states(str(tmp_path / "a"))["grouped"]
    gb = load_drift_states(str(tmp_path / "b"))["grouped"]
    with _pytest.raises(ValueError, match="kll k mismatch"):
        grouped_drift_report_from_states(ga, gb)
