"""DDSketch: kernel bound/merge properties + the fully-Catalyst build.

The relative-error contract under test (VLDB 2019 paper, PAPERS.md):
for quantile q over n items, the estimate e and the true rank-
``floor(q*(n-1))+1`` item x_k satisfy |e - x_k| <= alpha * |x_k|.
"""

import functools

import numpy as np
import pytest

from pyspark.sql import functions as F

from gopie_spark.kernels import DDSketch, sketch_from_blob

ALPHA = 0.01
QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999]


def _mixed_values(seed=7, n_pos=20_000, n_neg=3_000, n_zero=500):
    rng = np.random.default_rng(seed)
    x = np.concatenate([rng.lognormal(5.0, 2.0, n_pos),
                        -rng.lognormal(2.0, 1.0, n_neg),
                        np.zeros(n_zero)])
    rng.shuffle(x)
    return x


def _assert_bound(est, qs, values, alpha=ALPHA):
    xs = np.sort(values)
    n = xs.size
    for q, e in zip(qs, est):
        xk = xs[int(np.floor(q * (n - 1)))]
        if abs(xk) > 1e-9:
            assert abs(e - xk) <= alpha * abs(xk) + 1e-12, (q, e, xk)
        else:
            assert abs(e) <= 1e-9, (q, e, xk)


class TestKernel:
    def test_relative_error_bound_serial(self):
        x = _mixed_values()
        sk = DDSketch(alpha=ALPHA)
        st = sk.update(sk.zero(), x)
        _assert_bound(sk.quantile(st, QS), QS, x)
        assert sk.count(st) == x.size

    @pytest.mark.parametrize("n_parts", [2, 3, 8, 32])
    def test_split_equals_serial_byte_equal(self, n_parts):
        x = _mixed_values()
        sk = DDSketch(alpha=ALPHA)
        serial = sk.serialize(sk.update(sk.zero(), x))
        parts = np.array_split(x, n_parts)
        states = [sk.update(sk.zero(), p) for p in parts]
        merged = functools.reduce(sk.merge, states)
        assert sk.serialize(merged) == serial

    def test_merge_order_independent_under_collapse(self):
        # collapse is live (max_bins tiny) and the fold target
        # monotonically rises toward the final cut bucket, so any merge
        # order lands the folded mass in the same bucket: byte-equal
        x = _mixed_values(seed=13)
        sk = DDSketch(alpha=0.001, max_bins=64)
        parts = np.array_split(x, 5)
        states = [sk.update(sk.zero(), p) for p in parts]

        def run(order):
            blobs = [sk.deserialize(sk.serialize(states[i])) for i in order]
            return sk.serialize(functools.reduce(sk.merge, blobs))

        assert run([0, 1, 2, 3, 4]) == run([4, 3, 2, 1, 0]) \
            == run([2, 0, 4, 1, 3])
        st = sk.deserialize(run([0, 1, 2, 3, 4]))
        assert st["pos_b"].size <= 64 and st["neg_b"].size <= 64
        # above the collapse floor (the lowest kept bucket, where folded
        # mass accumulates) the alpha guarantee survives collapse: check
        # it for every probed quantile whose true item clears the floor
        xs = np.sort(x)
        floor = sk.value(st["pos_b"][0]) * (1 + sk.alpha)
        checked = 0
        for q in (0.9, 0.99, 0.999):
            xk = xs[int(np.floor(q * (x.size - 1)))]
            if xk <= floor:
                continue
            e = sk.quantile(st, [q])[0]
            assert abs(e - xk) <= 0.001 * abs(xk) + 1e-12
            checked += 1
        assert checked >= 1  # the probe set must actually exercise this

    def test_serialize_roundtrip_and_kind_dispatch(self):
        sk = DDSketch(alpha=0.02, max_bins=512, min_value=1e-6)
        st = sk.update(sk.zero(), _mixed_values(seed=3, n_pos=500))
        blob = sk.serialize(st)
        assert blob == sk.serialize(sk.deserialize(blob))
        sk2 = sketch_from_blob(blob)
        assert (sk2.alpha, sk2.max_bins, sk2.min_value) == \
            (0.02, 512, 1e-6)
        with pytest.raises(ValueError):
            DDSketch(alpha=0.05).deserialize(blob)

    def test_extremes_and_empty(self):
        sk = DDSketch(alpha=ALPHA)
        st = sk.zero()
        assert np.isnan(sk.quantile(st, [0.5])[0])
        sk.update(st, np.array([3.0, 7.0, np.nan]))
        assert sk.count(st) == 2
        assert sk.quantile(st, [0.0])[0] == 3.0   # q<=0 -> exact min
        assert sk.quantile(st, [1.0])[0] == 7.0   # q>=1 -> exact max


@pytest.mark.usefixtures("spark")
class TestCatalyst:
    @pytest.fixture(scope="class")
    def df(self, spark):
        rng = np.random.default_rng(11)
        rows = []
        for lang, mu in [("en", 5.0), ("de", 4.0), ("fr", 6.0)]:
            rows += [(lang, float(v)) for v in rng.lognormal(mu, 1.5, 6000)]
        rows += [("en", float(v)) for v in -rng.lognormal(2, 1, 800)]
        rows += [("de", 0.0)] * 150
        rows += [("fr", None)]
        self_rows = rows
        return (spark.createDataFrame(self_rows, "lang string, v double")
                .repartition(8)), rows

    def test_grouped_bound_vs_exact(self, df):
        from gopie_spark.operators import ddsketch_quantiles
        frame, rows = df
        qs = [0.1, 0.5, 0.9, 0.99]
        got = {r["lang"]: r
               for r in ddsketch_quantiles(frame, "v", qs,
                                           keys=["lang"]).collect()}
        by_lang = {}
        for lang, v in rows:
            if v is not None:
                by_lang.setdefault(lang, []).append(v)
        for lang, vs in by_lang.items():
            est = [got[lang][f"q{str(q).replace('.', '_')}"] for q in qs]
            _assert_bound(est, qs, np.array(vs))

    def test_global_matches_kernel_build(self, df):
        # the Catalyst path and the kernel use the same closed-form
        # bucket mapping, so the two estimates agree exactly
        from gopie_spark.operators import ddsketch_quantiles
        frame, rows = df
        vals = np.array([v for _, v in rows if v is not None])
        sk = DDSketch(alpha=ALPHA)
        st = sk.update(sk.zero(), vals)
        want = sk.quantile(st, [0.5, 0.9])
        got = ddsketch_quantiles(frame, "v", [0.5, 0.9]).collect()[0]
        assert got["q0_5"] == pytest.approx(float(want[0]), rel=1e-12)
        assert got["q0_9"] == pytest.approx(float(want[1]), rel=1e-12)

    def test_generic_blob_path_equals_kernel(self, df, spark):
        """DDSketch routes through the generic two-level blob aggregation
        (build_partials -> merge_partials) as a numeric kernel — the
        protocol path streaming state and checkpoints use — and the
        merged state is byte-equal to the serial kernel build."""
        from gopie_spark.operators import sketch_agg
        from gopie_spark.operators.sketch_agg import STATE_COL
        frame, rows = df
        sk = DDSketch(alpha=0.01)
        got = {r["lang"]: bytes(r[STATE_COL])
               for r in sketch_agg(frame, ["lang"], "v", sk).collect()}
        by_lang = {}
        for lang, v in rows:
            if v is not None:
                by_lang.setdefault(lang, []).append(v)
        for lang, vs in by_lang.items():
            want = sk.serialize(sk.update(sk.zero(), np.array(vs)))
            assert got[lang] == want, lang

    def test_streaming_equals_batch(self, df, spark, tmp_path):
        """Micro-batch-merged streaming state == one-shot batch state
        byte-for-byte (DDSketch is a counter sketch; replay safety is
        StreamingSketch's committed-batch-id guard, tested generically
        in test_round3/test_round4d_fixes)."""
        from gopie_spark.operators import global_sketch
        from gopie_spark.streaming import StreamingSketch
        frame, _ = df
        src = str(tmp_path / "dd_stream")
        frame.select(F.col("v")).repartition(3).write.parquet(src)
        df_all = spark.read.parquet(src)
        sk = DDSketch(alpha=0.01)
        want = global_sketch(df_all, "v", sk)
        ss = StreamingSketch(spark, sk, [], "v", str(tmp_path / "st"))
        q = ss.attach(spark.readStream.schema(df_all.schema).parquet(src))
        q.awaitTermination(120)
        from gopie_spark.operators.sketch_agg import STATE_COL
        got = bytes(ss.current_states().collect()[0][STATE_COL])
        assert got == sk.serialize(want)

    def test_quantile_gate_ddsketch_method(self, df):
        """quantile_gate(method='ddsketch'): thresholds within the alpha
        relative band of the exact per-group quantile items; the gate
        keeps exactly the rows inside [lo, hi]."""
        from gopie_spark.operators import ddsketch_quantiles, quantile_gate
        frame, rows = df
        pos = frame.filter(F.col("v") > 0)
        kept = quantile_gate(pos, "v", keys=["lang"], q_lo=0.1, q_hi=0.9,
                             method="ddsketch").collect()
        thr = {r["lang"]: (r["q0_1"], r["q0_9"])
               for r in ddsketch_quantiles(pos, "v", [0.1, 0.9],
                                           keys=["lang"]).collect()}
        by_lang = {}
        for lang, v in rows:
            if v is not None and v > 0:
                by_lang.setdefault(lang, []).append(v)
        # thresholds honor the relative bound vs the exact rank item
        for lang, vs in by_lang.items():
            xs = np.sort(vs)
            n = xs.size
            for q, e in zip((0.1, 0.9), thr[lang]):
                xk = xs[int(np.floor(q * (n - 1)))]
                assert abs(e - xk) <= ALPHA * abs(xk) + 1e-12, (lang, q)
        # the gate is exactly the [lo, hi] band filter
        want_n = sum(1 for lang, vs in by_lang.items() for v in vs
                     if thr[lang][0] <= v <= thr[lang][1])
        assert len(kept) == want_n
        for r in kept:
            lo, hi = thr[r["lang"]]
            assert lo <= r["v"] <= hi
            assert (r["q_lo_val"], r["q_hi_val"]) == (lo, hi)

    def test_plan_no_python_and_partial_agg(self, df):
        from gopie_spark.operators import (ddsketch_buckets,
                                           ddsketch_quantiles)
        frame, _ = df
        full = ddsketch_quantiles(frame, "v", [0.5], keys=["lang"]) \
            ._jdf.queryExecution().executedPlan().toString()
        # zero Python in the whole pipeline (build AND finalize)
        for marker in ("BatchEvalPython", "ArrowEval", "InPandas"):
            assert marker not in full, marker
        build = ddsketch_buckets(frame, "v", ["lang"]) \
            ._jdf.queryExecution().executedPlan().toString()
        # map-side combine: partial_count below the exchange
        assert "partial_count" in build
        assert build.index("partial_count") > build.index("Exchange")


class TestWindowed:
    """ddsketch_window_quantiles: query-time trailing windows, one
    corpus scan, per-window DDSketch guarantee on that window's
    substream."""

    def test_window_band_vs_exact(self, spark, sf_dir):
        from gopie_spark.operators import ddsketch_window_quantiles
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        qs = [0.5, 0.99]
        got = {r["window_ticks"]: (r["q0_5"], r["q0_99"])
               for r in ddsketch_window_quantiles(
                   ev, "value", "ts", qs, [1, 7, 30],
                   resolution=86400.0, alpha=ALPHA).collect()}
        rows = ev.select(
            F.col("value").cast("double").alias("v"),
            F.floor(F.col("ts").cast("timestamp").cast("double")
                    / 86400.0).cast("long").alias("t")).collect()
        v = np.array([r["v"] for r in rows])
        t = np.array([r["t"] for r in rows])
        at = t.max()
        for w in (1, 7, 30):
            vals = v[(t <= at) & (t > at - w)]
            _assert_bound(got[w], qs, vals)

    def test_whole_horizon_equals_unwindowed(self, spark, sf_dir):
        from gopie_spark.operators import (ddsketch_quantiles,
                                           ddsketch_window_quantiles)
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        qs = [0.25, 0.5, 0.9]
        huge = 10 ** 9        # covers every tick present
        win = ddsketch_window_quantiles(
            ev, "value", "ts", qs, [huge]).drop("window_ticks") \
            .collect()[0]
        plain = ddsketch_quantiles(ev, "value", qs).collect()[0]
        assert win.asDict() == plain.asDict()

    def test_grouped_windows(self, spark, sf_dir):
        from gopie_spark.operators import ddsketch_window_quantiles
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        out = ddsketch_window_quantiles(
            ev, "value", "ts", [0.5], [7, 30],
            keys=["event_type"]).collect()
        types = {r[0] for r in
                 ev.select("event_type").distinct().collect()}
        seen = {(r["window_ticks"], r["event_type"]) for r in out}
        # every (window, type) pair present in the trailing 7/30 days
        rows = ev.select(
            "event_type",
            F.floor(F.col("ts").cast("timestamp").cast("double")
                    / 86400.0).cast("long").alias("t")).collect()
        at = max(r["t"] for r in rows)
        for w in (7, 30):
            want = {r["event_type"] for r in rows
                    if at - w < r["t"] <= at}
            assert {ty for (ww, ty) in seen if ww == w} == want

    def test_still_no_python_in_plan(self, spark, sf_dir):
        from gopie_spark.operators import ddsketch_window_quantiles
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        plan = ddsketch_window_quantiles(
            ev, "value", "ts", [0.5], [7])._jdf.queryExecution() \
            .executedPlan().toString()
        for marker in ("BatchEvalPython", "ArrowEval", "InPandas"):
            assert marker not in plan, marker


def test_window_quantiles_empty_corpus_and_empty_windows(spark):
    """An empty (or all-null) corpus yields the SQL global-agg result —
    one row per window with NULL quantiles, exactly like the unwindowed
    ddsketch_quantiles — not a NoneType crash; windows=[] is an explicit
    error."""
    import pytest as _pytest
    from gopie_spark.operators import ddsketch_window_quantiles
    ev = spark.createDataFrame([], "value double, ts timestamp")
    rows = ddsketch_window_quantiles(ev, "value", "ts", [0.5], [7],
                                     resolution=86400.0).collect()
    assert [(r["window_ticks"], r["q0_5"]) for r in rows] == [(7, None)]
    with _pytest.raises(ValueError):
        ddsketch_window_quantiles(ev, "value", "ts", [0.5], [],
                                  resolution=86400.0)
