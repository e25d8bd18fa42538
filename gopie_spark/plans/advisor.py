"""Sketch-driven physical-plan advisor — pick the join strategy, salt
factor, and shuffle width from KB-sized sketch states, never the data.

At 10^12 rows the questions that decide a join's fate — how big is
each side, how many distinct keys, how skewed is the hottest key, how
many rows will the join emit — are exactly the questions this repo's
sketch kernels answer within published bounds.  This module packages
them as a *planner*:

1. :func:`build_join_profile` profiles a table's join key in **one
   corpus scan** (``sketch_agg.global_sketch_multi`` co-builds all
   four states):

   - :class:`~gopie_spark.kernels.theta.Theta` — distinct keys, with
     set algebra against the other side (matching-key mass);
   - :class:`~gopie_spark.kernels.misragries.MisraGries` — the hot
     keys: for ANY key ``est <= f <= est + err``, so ``top1_est + err``
     upper-bounds the heaviest key's row count (the salting input);
   - :class:`~gopie_spark.kernels.ams.AMS` — F2 / join-size: the
     shared-sign-function inner product estimates the equi-join output
     cardinality (Alon–Gibbons–Matias–Szegedy, PODS 1999);
   - :class:`~gopie_spark.kernels.exactstats.ExactStats` — exact row
     count + payload bytes, riding the same scan.

2. :func:`join_advice` / :func:`agg_advice` are **pure functions of
   the states** — no DataFrames, no Spark session — so profiles
   persisted once (:func:`persist_join_profile`) advise every later
   job for free, exactly like the drift tier's persisted snapshots
   (``jobs/plan_advice.py`` is the zero-Spark CLI).

What the advice encodes (the knobs a 1000-executor job must set):

- **strategy**: broadcast the side whose exact payload bytes fit the
  driver/executor budget; otherwise shuffle on the key.
- **salt**: the reference's bounded-load rule (ringhash.go:135-162 —
  no node exceeds ``ceil(avg * factor)``) applied to shuffle tasks:
  hot-key upper bound vs the average rows per key, from the MG state
  alone (``operators.sketch_agg.suggest_salt`` is the exact-count
  twin of this estimate-only rule).
- **shuffle_partitions**: total exact bytes / target partition bytes.
- **join_rows_est** (+ 4-sigma bound): whether the OUTPUT explodes —
  the number that decides if the join is safe to run at all.

Certified by the driver query ``join_plan_advice``
(``__spark_entry__.py``): every estimate the advice uses is anchored
to the DuckDB-exact value within its kernel's bound at sf0.01.
"""
from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass
from typing import Dict, Optional, Sequence

from pyspark.sql import DataFrame, Column, functions as F
from pyspark.sql.types import (ArrayType, BinaryType, NumericType,
                               StringType, TimestampType)

from gopie_spark.kernels import AMS, ExactStats, MisraGries, Theta

# profile directory layout: self-describing TLV blobs + a tiny header
_PROFILE_FILES = {"theta": "theta_key.bin", "mg": "mg_key.bin",
                  "ams": "ams_key.bin", "stats": "stats.bin"}
_META_FILE = "profile.json"


def default_row_bytes(df: DataFrame,
                      cols: Optional[Sequence[str]] = None) -> Column:
    """JVM-side per-row payload-byte estimate: ``octet_length`` of
    string/binary columns, 8 per numeric/timestamp column, element
    pricing for numeric/string arrays (the embeddings-table shape), and
    a JSON-size proxy for any other nested type — so no column ever
    silently prices at 0 bytes and flips a broadcast decision (nulls
    count 0).  Pass ``cols`` to size a projection instead of the full
    row — broadcast decisions should price what the join actually
    carries."""
    fields = [f for f in df.schema.fields
              if cols is None or f.name in set(cols)]
    expr = F.lit(0)
    for f in fields:
        c = F.col(f.name)
        if isinstance(f.dataType, (StringType, BinaryType)):
            expr = expr + F.coalesce(F.octet_length(c), F.lit(0))
        elif isinstance(f.dataType, (NumericType, TimestampType)):
            expr = expr + F.lit(8)
        elif (isinstance(f.dataType, ArrayType)
              and isinstance(f.dataType.elementType, NumericType)):
            expr = expr + F.coalesce(F.size(c) * 8, F.lit(0))
        elif (isinstance(f.dataType, ArrayType)
              and isinstance(f.dataType.elementType, StringType)):
            expr = expr + F.coalesce(
                F.aggregate(c, F.lit(0),
                            lambda acc, s: acc + F.coalesce(
                                F.octet_length(s), F.lit(0))),
                F.lit(0))
        else:
            # struct / map / nested arrays: JSON length is a
            # conservative (over-)estimate — safe for broadcast gating
            expr = expr + F.coalesce(
                F.octet_length(F.to_json(F.struct(c))), F.lit(0))
    return expr


@dataclass
class JoinProfile:
    """One table-side planner profile: four mergeable states + params.

    ``n_rows`` / ``total_bytes`` are EXACT (ExactStats rode the same
    scan); everything else carries its kernel's published bound.
    """

    key_col: str
    theta: Theta
    theta_state: dict
    mg: MisraGries
    mg_state: dict
    ams: AMS
    ams_state: dict
    stats: ExactStats
    stats_state: dict

    @property
    def n_rows(self) -> int:
        return self.stats.count(self.stats_state)

    @property
    def total_bytes(self) -> int:
        return self.stats.total(self.stats_state)

    @property
    def distinct_est(self) -> float:
        return self.theta.estimate(self.theta_state)

    def hot_key(self):
        """(key, est, upper) for the heaviest tracked key — ``upper =
        est + err`` bounds the TRUE heaviest key's count (even an
        untracked one: est(x) >= f(x) - err for all x, and untracked
        keys have f <= err)."""
        keys, counts = self.mg.topk(self.mg_state, 1)
        err = self.mg.error_bound(self.mg_state)
        if keys.size == 0:
            return None, 0, err
        return str(keys[0]), int(counts[0]), int(counts[0]) + err


def build_join_profile(df: DataFrame, key_col: str,
                       bytes_expr: Optional[Column] = None, *,
                       bytes_cols: Optional[Sequence[str]] = None,
                       theta_k: int = 4096, mg_k: int = 256,
                       ams_means: int = 64,
                       ams_medians: int = 5) -> JoinProfile:
    """Profile one side of a prospective equi-join in ONE corpus scan.

    Null join keys never match, so they are excluded up front (both
    the exact counts and the sketches see the same non-null stream —
    document joins that need null semantics separately).  All four
    states co-build via ``global_sketch_multi``: at 100 TB the scan is
    the cost and it is paid once, column-pruned to the key plus the
    byte expression's inputs.

    ``ams_means=64`` (relative SE ``sqrt(2/64)`` ~ 18% per mean group,
    tightened by the median-of-5) is the planner default — the sign
    matrix is the profile's dominant compute (k x batch int8 GEMV per
    batch), and measured 7x cheaper than 256 at the same scan; raise it
    when the join-size bound must be tight rather than decision-grade.
    """
    from gopie_spark.operators.sketch_agg import global_sketch_multi

    if bytes_expr is None:
        bytes_expr = default_row_bytes(df, bytes_cols)
    theta = Theta(k=theta_k)
    mg = MisraGries(k=mg_k)
    ams = AMS(n_means=ams_means, n_medians=ams_medians)
    stats = ExactStats()
    # null payload prices 0 — and must never reach the exact-sum kernel
    # (Arrow nulls round-trip to NaN through NumPy and corrupt int sums)
    proj = (df.filter(F.col(key_col).isNotNull())
            .select(F.col(key_col).cast("string").alias("_k"),
                    F.coalesce(bytes_expr.cast("long"), F.lit(0))
                    .alias("_b")))
    st_t, st_m, st_a, st_s = global_sketch_multi(
        proj, [("_k", theta), ("_k", mg), ("_k", ams), ("_b", stats)])
    return JoinProfile(key_col=key_col, theta=theta, theta_state=st_t,
                       mg=mg, mg_state=st_m, ams=ams, ams_state=st_a,
                       stats=stats, stats_state=st_s)


def _side_summary(prof: JoinProfile, load_factor: float) -> dict:
    distinct = max(prof.distinct_est, 1.0)
    avg = prof.n_rows / distinct
    hot_key, hot_est, hot_upper = prof.hot_key()
    salt = 1
    if prof.n_rows > 0 and avg > 0:
        salt = max(1, int(math.ceil(hot_upper / (avg * load_factor))))
    return {
        "key_col": prof.key_col,
        "n_rows": prof.n_rows,
        "total_bytes": prof.total_bytes,
        "distinct_est": distinct,
        "distinct_rel_err": prof.theta.rel_err,
        "avg_rows_per_key": avg,
        "hot_key": hot_key,
        "hot_rows_est": hot_est,
        "hot_rows_upper": hot_upper,
        "skew_ratio": (hot_upper / avg) if avg > 0 else 0.0,
        "salt": salt,
    }


def join_advice(left: JoinProfile, right: JoinProfile, *,
                broadcast_bytes: int = 10 << 20,
                target_partition_bytes: int = 128 << 20,
                load_factor: float = 1.25) -> dict:
    """Physical-plan advice for ``left JOIN right`` on the profiled
    keys — a pure function of the two profiles (no Spark session).

    Keys must be profiled with the SAME AMS parameters (shared sign
    functions are what make the inner product a join-size estimator);
    mismatches raise up front, like the drift tier's snapshot guard.
    """
    if (left.ams.n_means, left.ams.n_medians) != (right.ams.n_means,
                                                  right.ams.n_medians):
        raise ValueError("AMS params differ between profiles "
                         f"({left.ams} vs {right.ams})")
    if left.theta.k != right.theta.k:
        raise ValueError("theta k differs between profiles "
                         f"({left.theta.k} vs {right.theta.k})")
    l, r = (_side_summary(left, load_factor),
            _side_summary(right, load_factor))
    join_rows = left.ams.inner_product(left.ams_state, right.ams_state)
    join_bound = left.ams.inner_product_bound(left.ams_state,
                                              right.ams_state)
    matching = left.theta.intersect_estimate(left.theta_state,
                                             right.theta_state)
    matching_bound = left.theta.intersect_bound(left.theta_state,
                                                right.theta_state)
    if right.total_bytes <= broadcast_bytes:
        strategy, build_side = "broadcast_right", "right"
    elif left.total_bytes <= broadcast_bytes:
        strategy, build_side = "broadcast_left", "left"
    else:
        strategy, build_side = "shuffle", None
    shuffle_partitions = max(1, int(math.ceil(
        (left.total_bytes + right.total_bytes)
        / float(target_partition_bytes))))
    # a broadcast join never shuffles, so salting only matters on the
    # shuffle path; the recommended salt is the worse side's
    salt = max(l["salt"], r["salt"]) if strategy == "shuffle" else 1
    return {
        "left": l,
        "right": r,
        "join": {
            "matching_keys_est": matching,
            "matching_keys_bound": matching_bound,
            "join_rows_est": join_rows,
            "join_rows_bound": join_bound,
        },
        "plan": {
            "strategy": strategy,
            "build_side": build_side,
            "shuffle_partitions": shuffle_partitions,
            "salt": salt,
            "broadcast_bytes_threshold": broadcast_bytes,
            "target_partition_bytes": target_partition_bytes,
            "load_factor": load_factor,
        },
    }


def agg_advice(prof: JoinProfile, *,
               target_rows_per_task: int = 4_000_000,
               load_factor: float = 1.25) -> dict:
    """GroupBy planning from one profile: the map-side-combine payoff
    (rows in / distinct groups out), the post-shuffle width, and the
    bounded-load salt for the hottest group — all from the states."""
    side = _side_summary(prof, load_factor)
    distinct = side["distinct_est"]
    return {
        "side": side,
        "combine_reduction": (prof.n_rows / distinct
                              if distinct > 0 else 1.0),
        "post_agg_partitions": max(1, int(math.ceil(
            distinct / float(target_rows_per_task)))),
        "salt": side["salt"],
    }


# --------------------------------------------------------------------------
# Persisted profiles: profile once per table, advise forever after
# --------------------------------------------------------------------------

def persist_join_profile(prof: JoinProfile, out_dir: str) -> Dict[str, str]:
    """Write one profile as KB-sized self-describing blobs + a header.
    Two directories persisted this way feed ``jobs/plan_advice.py``'s
    zero-Spark advise step."""
    os.makedirs(out_dir, exist_ok=True)
    written: Dict[str, str] = {}
    pairs = {"theta": (prof.theta, prof.theta_state),
             "mg": (prof.mg, prof.mg_state),
             "ams": (prof.ams, prof.ams_state),
             "stats": (prof.stats, prof.stats_state)}
    for name, (kernel, state) in pairs.items():
        path = os.path.join(out_dir, _PROFILE_FILES[name])
        with open(path, "wb") as fh:
            fh.write(kernel.serialize(state))
        written[name] = path
    meta = os.path.join(out_dir, _META_FILE)
    with open(meta, "w") as fh:
        json.dump({"key_col": prof.key_col}, fh, sort_keys=True)
    written["meta"] = meta
    return written


def load_join_profile(state_dir: str) -> JoinProfile:
    """Reopen a :func:`persist_join_profile` directory — pure file IO
    plus blob decode (``sketch_from_blob`` recovers each kernel with
    its parameters), no Spark session."""
    from gopie_spark.kernels import sketch_from_blob

    with open(os.path.join(state_dir, _META_FILE)) as fh:
        meta = json.load(fh)
    loaded = {}
    for name, fname in _PROFILE_FILES.items():
        with open(os.path.join(state_dir, fname), "rb") as fh:
            blob = fh.read()
        kernel = sketch_from_blob(blob)
        loaded[name] = (kernel, kernel.deserialize(blob))
    return JoinProfile(key_col=meta["key_col"],
                       theta=loaded["theta"][0],
                       theta_state=loaded["theta"][1],
                       mg=loaded["mg"][0], mg_state=loaded["mg"][1],
                       ams=loaded["ams"][0], ams_state=loaded["ams"][1],
                       stats=loaded["stats"][0],
                       stats_state=loaded["stats"][1])
