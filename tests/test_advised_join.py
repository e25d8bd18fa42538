"""Advised join executor (plans/joiner.py): the decision step is a
pure function of the advice, every physical path (broadcast hint,
Bloom semi-join prefilter, bounded-load salting) produces output
multiset-equal to the plain join, the broadcast advice really becomes
a BroadcastHashJoin, and the prefilter really prunes the big side
before its shuffle.
"""
import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from gopie_spark.plans.advisor import build_join_profile, join_advice
from gopie_spark.plans.joiner import advised_join, plan_execution


def plan_text(df, mode="formatted"):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture(scope="module")
def sides(spark):
    # fact: 20k rows, keys 0..999; dim: keys 0..99 only (10% of the
    # fact's key space matches -> the prefilter threshold engages)
    fact = (spark.range(20_000)
            .select((F.col("id") % 1000).cast("long").alias("k"),
                    (F.col("id") * 7 % 31).alias("v")))
    dim = (spark.range(100)
           .select(F.col("id").cast("long").alias("dk"),
                   F.concat(F.lit("d"), F.col("id")).alias("name")))
    return fact, dim


def _advice(fact, dim, **kw):
    pf = build_join_profile(fact, "k")
    pd_ = build_join_profile(dim, "dk")
    return join_advice(pf, pd_, **kw)


# --------------------------------------------------------------------------
# plan_execution: pure decision step
# --------------------------------------------------------------------------

def test_plan_execution_pure_decisions(spark, sides):
    fact, dim = sides
    adv = _advice(fact, dim)
    # dim is tiny -> broadcast advice passes straight through
    assert adv["plan"]["strategy"] == "broadcast_right"
    p = plan_execution(adv)
    assert p["path"] == "broadcast_right" and p["prefilter_side"] is None

    # force the shuffle path: the big side (fact) gets the prefilter,
    # sized from the dim side's distinct estimate
    adv2 = _advice(fact, dim, broadcast_bytes=1)
    p2 = plan_execution(adv2)
    assert p2["path"] == "shuffle"
    assert p2["prefilter_side"] == "left"
    assert p2["bloom_n"] >= 100
    assert 0 < p2["match_frac_est"] <= 0.5
    assert p2["bloom_bytes"] > 0

    # a left_semi join whose big side is the RIGHT side must not
    # prefilter (only the probe side of a semi join may be filtered)
    pr = build_join_profile(fact, "k")
    pl = build_join_profile(dim, "dk")
    adv3 = join_advice(pl, pr, broadcast_bytes=1)
    p3 = plan_execution(adv3, how="left_semi")
    assert p3["prefilter_side"] is None

    # high matching fraction -> no prefilter
    p4 = plan_execution(adv2, prefilter_max_frac=0.01)
    assert p4["prefilter_side"] is None

    # filter too large for the byte budget -> no prefilter
    p5 = plan_execution(adv2, bloom_max_bytes=8)
    assert p5["prefilter_side"] is None


# --------------------------------------------------------------------------
# equality gates: every path == the plain join
# --------------------------------------------------------------------------

def test_broadcast_path_equals_plain_join_and_plan(spark, sides):
    fact, dim = sides
    adv = _advice(fact, dim)
    rep = {}
    out = advised_join(fact, dim, ("k", "dk"), adv, report=rep)
    assert rep["path"] == "broadcast_right"
    assert "BroadcastHashJoin" in plan_text(out)
    plain = fact.join(dim, fact.k == dim.dk)
    cols = ["k", "v", "dk", "name"]
    assert _rows(out, cols) == _rows(plain, cols)


def test_bloom_prefilter_path_equals_plain_join(spark, sides):
    fact, dim = sides
    adv = _advice(fact, dim, broadcast_bytes=1)
    rep = {}
    out = advised_join(fact, dim, ("k", "dk"), adv, report=rep)
    assert rep["path"] == "shuffle" and rep["prefilter_side"] == "left"
    plain = fact.join(dim, fact.k == dim.dk)
    cols = ["k", "v", "dk", "name"]
    assert _rows(out, cols) == _rows(plain, cols)
    # the prefilter must appear in the plan (Arrow-batched membership
    # probe on the fact side, below its exchange)
    assert "ArrowEvalPython" in plan_text(out)


def test_left_semi_prefilter_equals_plain_semi(spark, sides):
    fact, dim = sides
    adv = _advice(fact, dim, broadcast_bytes=1)
    rep = {}
    out = advised_join(fact, dim, ("k", "dk"), adv, how="left_semi",
                       report=rep)
    assert rep["prefilter_side"] == "left"
    plain = fact.join(dim, fact.k == dim.dk, "left_semi")
    assert _rows(out, ["k", "v"]) == _rows(plain, ["k", "v"])
    assert out.columns == ["k", "v"]


def test_salted_path_equals_plain_join(spark):
    # planted skew: one viral key carries half the fact side
    fact = (spark.range(8_000)
            .select(F.when(F.col("id") % 2 == 0, 7)
                    .otherwise(F.col("id") % 500).cast("long").alias("k"),
                    F.col("id").alias("v")))
    other = (spark.range(500)
             .select(F.col("id").cast("long").alias("ok"),
                     (F.col("id") * 3).alias("w")))
    pf = build_join_profile(fact, "k")
    po = build_join_profile(other, "ok")
    adv = join_advice(pf, po, broadcast_bytes=1)
    assert adv["plan"]["salt"] > 1            # MG saw the viral key
    # widen the prefilter threshold so BOTH levers engage together
    rep = {}
    out = advised_join(fact, other, ("k", "ok"), adv,
                       prefilter_max_frac=1.0, report=rep)
    assert 1 < rep["salt"] <= 64        # advised, capped at max_salt
    assert rep["salt"] == min(adv["plan"]["salt"], 64)
    assert rep["salt_side"] == "left"
    plain = fact.join(other, fact.k == other.ok)
    cols = ["k", "v", "ok", "w"]
    assert _rows(out, cols) == _rows(plain, cols)
    # the salt column never leaks into the result
    assert "_gopie_join_salt" not in out.columns
    # salting is inner-only: the semi path must not salt
    p_semi = plan_execution(adv, how="left_semi")
    assert p_semi["salt"] == 1


def test_prefilter_never_drops_a_match_and_prunes(spark, sides):
    """The Bloom has no false negatives (every matching fact row
    survives) and really prunes: survivors are far fewer than the fact
    rows when only 10% of keys match."""
    from gopie_spark.operators.sketch_agg import bloom_build, bloom_filter
    fact, dim = sides
    bloom, state = bloom_build(dim.select("dk"), "dk", 200, 0.01)
    surv = bloom_filter(spark, bloom, state, fact, "k")
    n_surv, n_fact = surv.count(), fact.count()
    n_match = fact.join(dim, fact.k == dim.dk, "left_semi").count()
    assert n_match <= n_surv            # no false negatives
    assert n_surv <= n_fact * 0.2       # ~10% match + FPR slack


def test_advised_join_rejects_outer(spark, sides):
    fact, dim = sides
    adv = _advice(fact, dim)
    with pytest.raises(ValueError):
        advised_join(fact, dim, ("k", "dk"), adv, how="left")


# --------------------------------------------------------------------------
# CLI: profile -> advise (zero Spark) -> execute, one job surface
# --------------------------------------------------------------------------

def test_plan_advice_execute_cli(spark, tmp_path):
    import json
    import os
    import subprocess
    import sys

    fact_p = str(tmp_path / "fact")
    dim_p = str(tmp_path / "dim")
    (spark.range(6_000)
     .select(F.when(F.col("id") % 2 == 0, 3)
             .otherwise(F.col("id") % 300).cast("long").alias("k"),
             F.col("id").alias("v"))
     .write.parquet(fact_p))
    (spark.range(300).filter(F.col("id") % 10 == 3)
     .select(F.col("id").cast("long").alias("dk"),
             (F.col("id") * 2).alias("w"))
     .write.parquet(dim_p))
    out = str(tmp_path / "joined")
    env = dict(os.environ, SPARK_GRAFT_CPUS="8", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "jobs/plan_advice.py", "execute",
         "--left-table", fact_p, "--left-key", "k",
         "--right-table", dim_p, "--right-key", "dk",
         "--out", out, "--broadcast-mb", "0", "--max-salt", "16"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=500)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    # viral key 3 matches the dim (3 % 10 == 3): both levers engage
    assert rep["execution"]["prefilter_side"] == "left"
    assert 1 < rep["execution"]["salt"] <= 16
    # the written result equals the plain join
    fact = spark.read.parquet(fact_p)
    dim = spark.read.parquet(dim_p)
    plain = fact.join(dim, fact.k == dim.dk)
    got = spark.read.parquet(out)
    cols = ["k", "v", "dk", "w"]
    assert rep["rows"] == plain.count()
    assert _rows(got, cols) == _rows(plain, cols)
