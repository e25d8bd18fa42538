"""As-of join and interval-overlap join (operators/temporal.py).

Gates: asof matches pandas ``merge_asof`` on every direction/exactness
combination plus tolerance; unmatched left rows survive with NULLs;
ties on (key, right_ts) resolve deterministically; the plan has no
join operator (union + window only).  Interval overlap equals the
brute-force quadratic reference, is bin-width invariant, and emits
every pair exactly once (no distinct); the plan's only join is an
EQUI join on the bin key (no cartesian / nested-loop)."""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gopie_spark.operators.temporal import (asof_join, interval_bin_stats,
                                            interval_overlap_join,
                                            session_intervals)


@pytest.fixture(scope="module")
def frames(spark):
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 300
    lpd = pd.DataFrame({"k": rng.integers(0, 5, n_l),
                        "ts": rng.integers(0, 1000, n_l).astype("float"),
                        "lid": np.arange(n_l)})
    rpd = pd.DataFrame({"k": rng.integers(0, 5, n_r),
                        "ts": rng.integers(0, 1000, n_r).astype("float"),
                        "rv": rng.integers(0, 100, n_r),
                        "rid": np.arange(n_r)})
    # collapse right ties so merge_asof (which keeps the later input
    # row) and our max-payload tie-break agree on a single ground truth
    rpd = (rpd.sort_values(["k", "ts", "rv", "rid"])
           .groupby(["k", "ts"], as_index=False).last())
    return lpd, rpd, spark.createDataFrame(lpd), spark.createDataFrame(rpd)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("exact", [True, False])
def test_asof_matches_merge_asof(frames, direction, exact):
    lpd, rpd, l, r = frames
    got = (asof_join(l, r, ["k"], "ts", direction=direction,
                     allow_exact=exact)
           .toPandas().sort_values("lid").reset_index(drop=True))
    exp = (pd.merge_asof(lpd.sort_values("ts"), rpd.sort_values("ts"),
                         on="ts", by="k", direction=direction,
                         allow_exact_matches=exact, suffixes=("", "_r"))
           .sort_values("lid").reset_index(drop=True))
    assert len(got) == len(lpd)  # every left row survives
    assert (got["rv"].fillna(-1).values ==
            exp["rv"].fillna(-1).values).all()


def test_asof_tolerance(frames):
    lpd, rpd, l, r = frames
    got = (asof_join(l, r, ["k"], "ts", tolerance_s=50)
           .toPandas().sort_values("lid").reset_index(drop=True))
    exp = (pd.merge_asof(lpd.sort_values("ts"), rpd.sort_values("ts"),
                         on="ts", by="k", direction="backward",
                         tolerance=50.0, suffixes=("", "_r"))
           .sort_values("lid").reset_index(drop=True))
    assert (got["rv"].fillna(-1).values ==
            exp["rv"].fillna(-1).values).all()


def test_asof_tie_break_is_deterministic(spark):
    l = spark.createDataFrame([(1, 10.0, "x")], "k long, ts double, lv string")
    r = spark.createDataFrame(
        [(1, 10.0, 3), (1, 10.0, 9), (1, 10.0, 5)],
        "k long, ts double, rv long")
    for parts in (1, 2, 8):
        got = asof_join(l, r.repartition(parts), ["k"], "ts").collect()
        assert len(got) == 1 and got[0]["rv"] == 9  # max payload wins


def test_asof_unmatched_and_empty_right(spark):
    l = spark.createDataFrame([(1, 5.0), (2, 7.0)], "k long, ts double")
    r = spark.createDataFrame([(1, 6.0, 1)], "k long, ts double, rv long")
    got = {row["k"]: row["rv"]
           for row in asof_join(l, r, ["k"], "ts").collect()}
    assert got == {1: None, 2: None}  # 6.0 > 5.0 and key 2 absent
    got_f = {row["k"]: row["rv"] for row in
             asof_join(l, r, ["k"], "ts", direction="forward").collect()}
    assert got_f == {1: 1, 2: None}


def test_asof_plan_has_no_join(frames):
    _, _, l, r = frames
    plan = asof_join(l, r, ["k"], "ts")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in plan  # union + window formulation
    assert plan.count("Exchange hashpartitioning") <= 2  # union sides


@pytest.fixture(scope="module")
def intervals(spark):
    rng = np.random.default_rng(11)
    a = pd.DataFrame({"s": rng.integers(0, 500, 120).astype("float")})
    a["e"] = a["s"] + rng.integers(0, 80, 120)
    a["ida"] = np.arange(120)
    b = pd.DataFrame({"s": rng.integers(0, 500, 150).astype("float")})
    b["e"] = b["s"] + rng.integers(0, 80, 150)
    b["idb"] = np.arange(150)
    exp = {(ra.ida, rb.idb)
           for _, ra in a.iterrows() for _, rb in b.iterrows()
           if ra.s < rb.e and rb.s < ra.e}
    return (spark.createDataFrame(a), spark.createDataFrame(b), exp)


@pytest.mark.parametrize("bin_s", [7, 64, 1000])
def test_interval_overlap_matches_bruteforce(intervals, bin_s):
    A, B, exp = intervals
    got = interval_overlap_join(A, B, "s", "e", "s", "e",
                                bin_s=bin_s).collect()
    pairs = {(r["a_ida"], r["b_idb"]) for r in got}
    assert pairs == exp
    assert len(got) == len(pairs)  # exactly-once, no distinct needed


def test_interval_overlap_zero_length_and_pred(spark):
    A = spark.createDataFrame([(0.0, 0.0, 1), (0.0, 10.0, 2)],
                              "s double, e double, ida long")
    got = interval_overlap_join(
        A, A, "s", "e", "s", "e", bin_s=4,
        extra_pred=F.col("a_ida") < F.col("b_ida")).collect()
    # zero-length [0,0) overlaps nothing under the half-open predicate
    assert [(r["a_ida"], r["b_idb"] if "b_idb" in r else r["b_ida"])
            for r in got] == []


def test_interval_join_is_equi_join_on_bin(intervals):
    A, B, _ = intervals
    plan = interval_overlap_join(A, B, "s", "e", "s", "e", bin_s=64) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    assert "_bin" in plan  # the equi key is the bin


def test_interval_bin_stats(spark):
    A = spark.createDataFrame([(0.0, 10.0), (2.0, 3.0), (100.0, 101.0)],
                              "s double, e double")
    rows = {(r["_bin"], r["n_intervals"])
            for r in interval_bin_stats(A, "s", "e", 4).collect()}
    assert (25, 1) in rows and (0, 2) in rows


def test_session_intervals_match_sessionize(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    iv = session_intervals(ev).collect()
    assert all(r["session_start"] <= r["session_end"] for r in iv)
    n_sessions = ev.sparkSession.createDataFrame(
        [(len(iv),)], "n long").collect()[0]["n"]
    from gopie_spark.operators.sessions import sessionize
    assert n_sessions == sessionize(ev).select("session_id").distinct().count()
