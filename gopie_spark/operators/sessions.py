"""Sessionization and retention cohorts — the event-analytics pair
every OLAP engine ships and the reference (a sketch/utility library)
leaves to its caller.  Built entirely from Spark window/aggregate
built-ins; both are exactly SQL-expressible, so their driver
certificates are full DuckDB value matches, not bound checks.

Scale shapes:

- ``sessionize``: ONE shuffle keyed on the user column, then a per-user
  time sort inside the window operator.  This is the canonical
  "gap > timeout starts a new session" algorithm (lag + cumulative
  sum of boundary flags) and the per-user sort is the honest cost —
  each task sorts only its users' events (years of events for one user
  fit any executor), never a global sort.  Skewed power users are a
  data fact; a user's events must meet to be sessionized, so the
  mitigation at 10^12 events is time-bucketed pre-splitting upstream,
  not a different plan.
- ``session_stats``: partial-aggregable rollup of the sessionized
  stream — no second sort, reuses the sessionize shuffle partitioning
  when Spark can (same key prefix).
- ``retention_cohorts``: cohort = each user's first-activity period;
  the (cohort, offset) matrix is two partial-aggregable aggregations
  (first-touch per user, then distinct users per cell) — the classic
  triangle retention table.  For 10^12-user streams swap the exact
  ``countDistinct`` for the HLL variant (``approx=p``) — same plan,
  constant-size states.
"""
from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(df: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_s: int = 1800,
               out_col: str = "session_id") -> DataFrame:
    """Assign a session id per event: a session breaks when the gap to
    the user's previous event exceeds ``gap_s`` seconds.  ``out_col``
    is '<user>:<n>' with n the user's 0-based session ordinal —
    deterministic, join-friendly, and identical in the SQL oracle."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    new_sess = (prev.isNull() |
                ((F.unix_timestamp(F.col(ts_col)) -
                  F.unix_timestamp(prev)) > gap_s)).cast("long")
    ordinal = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, 0)) - 1
    return df.withColumn(
        out_col,
        F.concat_ws(":", F.col(user_col).cast("string"),
                    ordinal.cast("string")))


def session_stats(df: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", gap_s: int = 1800) -> DataFrame:
    """Per-session rollup: (user, session_id, n_events, start, end,
    duration_s).  One window pass + one partial-aggregable groupBy."""
    s = sessionize(df, user_col, ts_col, gap_s)
    return (s.groupBy(user_col, "session_id")
            .agg(F.count("*").alias("n_events"),
                 F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"))
            .withColumn(
                "duration_s",
                F.unix_timestamp("session_end") -
                F.unix_timestamp("session_start")))


def retention_cohorts(df: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts", period: str = "week",
                      approx: Optional[int] = None) -> DataFrame:
    """Triangle retention: (cohort, offset, n_users) where cohort is
    the user's first-activity period start and offset counts periods
    since.  ``approx=p`` swaps exact countDistinct for the repo's
    mergeable HLL (same two-aggregation plan, constant-size states) —
    the 10^12-user path."""
    if period not in ("day", "week"):
        # fixed-length periods only: the offset is a seconds division,
        # which is wrong for variable-length months/years
        raise ValueError(
            f"retention_cohorts: period must be 'day' or 'week', "
            f"got {period!r}")
    trunc = F.date_trunc(period, F.col(ts_col))
    firsts = (df.groupBy(user_col)
              .agg(F.min(trunc).alias("_cohort")))
    per = 7 * 86400 if period == "week" else 86400
    joined = (df.select(user_col, trunc.alias("_period"))
              .join(firsts, user_col)
              .select(
                  user_col, "_cohort",
                  ((F.unix_timestamp("_period") -
                    F.unix_timestamp("_cohort")) / per)
                  .cast("long").alias("offset")))
    if approx is None:
        return (joined.groupBy(F.col("_cohort").alias("cohort"), "offset")
                .agg(F.countDistinct(user_col).alias("n_users")))
    from gopie_spark.operators.sketch_agg import hll_count_distinct
    return hll_count_distinct(
        joined.select(F.col("_cohort").alias("cohort"), "offset",
                      F.col(user_col).cast("string").alias("v")),
        "v", keys=["cohort", "offset"], p=approx
    ).withColumnRenamed("approx_distinct", "n_users")


def funnel(df: DataFrame, steps: Sequence[str],
           user_col: str = "user_id", type_col: str = "event_type",
           ts_col: str = "ts") -> DataFrame:
    """Ordered conversion funnel: for steps [s1, s2, ...], a user
    converts through step i when their FIRST s_i event strictly
    follows their first s_{i-1} event.  Returns (step, step_idx,
    n_users) with n_users monotonically non-increasing.

    Plan: one partial-aggregable pivot aggregation (min ts per user per
    step — conditional MIN columns, no explode, no join) + one count
    aggregation over the conjunctions.  At 10^12 events that is one
    shuffle keyed on the user column; nothing else moves."""
    steps = list(steps)
    firsts = df.filter(F.col(type_col).isin(steps)).groupBy(user_col) \
        .agg(*[F.min(F.when(F.col(type_col) == s, F.col(ts_col)))
               .alias(f"_t{i}") for i, s in enumerate(steps)])
    conv = None
    counts = []
    for i in range(len(steps)):
        here = F.col(f"_t{i}").isNotNull()
        if i > 0:
            here = here & (F.col(f"_t{i}") > F.col(f"_t{i-1}"))
        conv = here if conv is None else (conv & here)
        counts.append(F.count(F.when(conv, 1)).alias(f"_c{i}"))
    row = firsts.agg(*counts).collect()[0]
    spark = df.sparkSession
    return spark.createDataFrame(
        [(steps[i], i, int(row[f"_c{i}"])) for i in range(len(steps))],
        "step string, step_idx long, n_users long")


def oracle_sessionize_sql(table: str = "events",
                          user_sql: str = "user_id",
                          ts_sql: str = "ts", gap_s: int = 1800) -> str:
    """DuckDB mirror of sessionize's session-id rule, as a CTE body
    yielding (..., session_id) — generated here so both engines share
    one boundary definition.  ``floor(epoch(...))`` mirrors Spark's
    whole-second ``unix_timestamp`` truncation (DuckDB's epoch() keeps
    microseconds; a fractional gap straddling the threshold would
    otherwise split sessions differently)."""
    sec = "CAST(floor(epoch({})) AS BIGINT)"
    gap = f"{sec.format(ts_sql)} - {sec.format('prev_ts')}"
    return f"""
        SELECT *,
               CAST({user_sql} AS VARCHAR) || ':' || CAST(
                   sum(CASE WHEN prev_ts IS NULL
                            OR {gap} > {gap_s}
                       THEN 1 ELSE 0 END)
                   OVER (PARTITION BY {user_sql} ORDER BY {ts_sql}
                         ROWS UNBOUNDED PRECEDING) - 1
                   AS VARCHAR) AS session_id
        FROM (
            SELECT *, lag({ts_sql}) OVER (PARTITION BY {user_sql}
                                          ORDER BY {ts_sql}) AS prev_ts
            FROM {table}
        )
    """
