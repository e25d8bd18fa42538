"""Sessionization + retention cohorts (operators/sessions.py).

Gates: hand-built boundary fixture (exact gap == gap_s stays in the
session; gap_s+1 splits; tied timestamps share a session), per-session
stats vs a serial recount, plan gate (ONE user-keyed Exchange, no
global sort), retention matrix vs serial recount, HLL variant within
bound on every cell."""
import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from gopie_spark.operators.sessions import (retention_cohorts,
                                            session_stats, sessionize)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s))
         for u, s in rows], "user_id long, ts timestamp")


def test_session_boundaries(spark):
    rows = [(1, 0), (1, 100), (1, 100 + 1800),      # gap == gap_s: same
            (1, 100 + 1800 + 1801),                 # gap_s+1: new
            (2, 50),                                # other user
            (3, 10), (3, 10)]                       # tied ts: same
    out = {(r["user_id"], int(r["ts"].timestamp() - 1704067200)):
           r["session_id"]
           for r in sessionize(_ev(spark, rows), gap_s=1800).collect()}
    assert out[(1, 0)] == out[(1, 100)] == out[(1, 1900)] == "1:0"
    assert out[(1, 3701)] == "1:1"
    assert out[(2, 50)] == "2:0"
    assert out[(3, 10)] == "3:0"


def test_session_stats_match_serial(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    gap = 21600
    got = {(r["user_id"], r["session_id"]):
           (r["n_events"], r["duration_s"])
           for r in session_stats(ev, gap_s=gap).collect()}
    # serial recount
    per_user = {}
    for r in ev.select("user_id", "ts").collect():
        per_user.setdefault(r["user_id"], []).append(r["ts"])
    want = {}
    for u, tss in per_user.items():
        tss.sort()
        sid = -1
        prev = None
        for t in tss:
            te = int(t.timestamp())
            if prev is None or te - prev > gap:
                sid += 1
                want[(u, f"{u}:{sid}")] = [0, te, te]
            rec = want[(u, f"{u}:{sid}")]
            rec[0] += 1
            rec[2] = te
            prev = te
    want = {k: (v[0], v[2] - v[1]) for k, v in want.items()}
    assert got == want


def test_sessionize_plan_single_user_exchange(spark, sf_dir):
    """Exactly one hashpartitioning Exchange (on the user column) and
    the sort is the window's per-partition sort, not a global one."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = sessionize(ev)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_retention_exact_and_hll(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {(r["cohort"], r["offset"]): r["n_users"]
           for r in retention_cohorts(ev, period="week").collect()}
    # serial recount
    firsts, cells = {}, {}
    rows = ev.select("user_id", F.date_trunc("week", "ts").alias("w")) \
        .collect()
    for r in rows:
        u, w = r["user_id"], r["w"]
        if u not in firsts or w < firsts[u]:
            firsts[u] = w
    for r in rows:
        u, w = r["user_id"], r["w"]
        off = int((w - firsts[u]).total_seconds() // 604800)
        cells.setdefault((firsts[u], off), set()).add(u)
    want = {k: len(v) for k, v in cells.items()}
    assert got == want
    # HLL variant within bound on every cell
    bound = 3 * 1.04 / np.sqrt(2 ** 14)
    hll = {(r["cohort"], r["offset"]): r["n_users"]
           for r in retention_cohorts(ev, period="week",
                                      approx=14).collect()}
    assert set(hll) == set(want)
    for k, est in hll.items():
        assert abs(est - want[k]) <= max(bound * want[k], 1.0), k


def test_funnel_fixture_and_monotone(spark, sf_dir):
    """Hand-built funnel: strict ordering required (same-ts step does
    NOT convert); monotone non-increasing counts on the real table."""
    from gopie_spark.operators.sessions import funnel
    rows = [
        (1, "view", 0), (1, "click", 10), (1, "purchase", 20),  # full
        (2, "view", 0), (2, "click", 5),                        # partial
        (3, "click", 0), (3, "view", 10),   # wrong order: view only
        (4, "view", 0), (4, "click", 0),    # tie: strict > fails
    ]
    df = spark.createDataFrame(
        [(u, t, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s))
         for u, t, s in rows],
        "user_id long, event_type string, ts timestamp")
    got = {r["step"]: r["n_users"]
           for r in funnel(df, ["view", "click", "purchase"]).collect()}
    assert got == {"view": 4, "click": 2, "purchase": 1}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ns = [r["n_users"] for r in
          funnel(ev, ["view", "click", "purchase"])
          .orderBy("step_idx").collect()]
    assert all(a >= b for a, b in zip(ns, ns[1:])) and ns[0] > 0


def test_retention_offsets_non_negative(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    offs = [r["offset"] for r in
            retention_cohorts(ev, period="day").collect()]
    assert min(offs) == 0 and len(offs) > 1
