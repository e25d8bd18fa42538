"""Temporal joins — as-of join and interval-overlap join.

Neither exists in the reference (a sketch/utility library) nor as a
Spark built-in; both are named by the build brief as the canonical
"custom operator Spark lacks" and both are implemented as compositions
of existing DataFrame ops (SURVEY.md §2.6 strategy (a)) — no Pandas
UDF, no cartesian, no per-row Python anywhere.

Scale shapes (the whole point of these formulations):

- ``asof_join``: the naive plan is a range join (``l.ts >= r.ts`` +
  greatest-per-key), which Spark executes as a broadcast-nested-loop or
  sort-merge with an O(n*m) per-key tail — unusable at 10^12 events.
  This implementation is the *union + running-last* formulation: tag
  both sides, union, ONE shuffle on the join keys, one per-key time
  sort inside a window operator, and ``last(payload, ignorenulls)``
  carries the most recent right row forward onto every left row.  Cost
  is exactly one Exchange + one in-partition sort of n+m rows — the
  same shape as sessionization, linear in data, no pair blow-up, and
  per-key skew is bounded by that key's own event count (a power user's
  events must meet anyway; mitigate upstream with time-bucketed keys).
- ``interval_overlap_join``: the naive overlap predicate
  ``a.start < b.end AND b.start < a.end`` is a cartesian for Spark.
  This is the binned formulation: each interval explodes to the fixed
  time bins it touches (JVM-side ``sequence``), the join becomes an
  EQUI-join on (keys..., bin), and the overlap predicate refines the
  bin-collisions.  Each surviving pair is emitted exactly once — only
  in the bin containing ``greatest(a.start, b.start)`` — so no
  ``distinct`` pass is needed.  Row expansion is ``len/bin_s + 1`` per
  interval; pick ``bin_s`` near the median interval length so the
  explode stays ~2x and every bin's population is small.  Work per bin
  is |A_bin| x |B_bin| — the bucket-cap story of the LSH tier applies
  (``events_per_bin`` stats below; salt or split hot bins upstream).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["asof_join", "interval_overlap_join", "session_intervals",
           "interval_bin_stats"]


def _is_time(df: DataFrame, col: str) -> bool:
    return dict(df.dtypes)[col].startswith("timestamp")


def _time_scale(df: DataFrame, col: str) -> float:
    """Units-per-second of :func:`_axis`'s output for ``col``."""
    return 1e6 if _is_time(df, col) else 1.0


def _micros(c: Column) -> Column:
    # unix_micros wants TIMESTAMP; NTZ values cast via the session tz
    # (pinned UTC by plans.get_spark, matching DuckDB's epoch_us)
    return F.unix_micros(c.cast("timestamp"))


def _axis(df: DataFrame, col: str) -> Column:
    """``col`` on a totally-ordered numeric axis: exact integer epoch
    MICROSECONDS for timestamps (``unix_micros`` — no float rounding,
    Spark 4 forbids the timestamp->double cast anyway), the value
    itself (as double) for numerics.  Epoch-us integers stay exact in
    the double (< 2^53 until year ~2255).  Callers rescale
    second-denominated parameters by :func:`_time_scale`."""
    if _is_time(df, col):
        return _micros(F.col(col)).cast("double")
    return F.col(col).cast("double")


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_ts: str = "ts", right_ts: Optional[str] = None,
              right_cols: Optional[Sequence[str]] = None,
              direction: str = "backward", allow_exact: bool = True,
              tolerance_s: Optional[float] = None,
              suffix: str = "_r") -> DataFrame:
    """For every left row, attach the single right row with the
    greatest ``right_ts <= left_ts`` (direction='backward') or smallest
    ``right_ts >= left_ts`` ('forward') within the same ``on`` keys —
    pandas ``merge_asof`` semantics, left rows always kept (unmatched
    rows carry NULLs).

    ``allow_exact=False`` makes the comparison strict.  ``tolerance_s``
    nulls out matches farther than that many seconds.  ``right_cols``
    limits which right columns are attached (default: all non-key
    columns); each lands as ``<name><suffix>`` where it would collide
    with a left column, verbatim otherwise.

    Determinism: ties on (keys, right_ts) are broken by the packed
    right payload struct (total order on the carried values), so the
    result is stable across partitionings and retries.

    Plan: one union, ONE Exchange on ``on``, one window sort — no join
    operator at all.  See the module docstring for the scale argument.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    on = list(on)
    right_ts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on]
    right_cols = list(right_cols)
    if right_ts not in right_cols:
        right_cols = [right_ts] + right_cols

    out_names = {c: (c + suffix if c in left.columns else c)
                 for c in right_cols}

    # payload struct keeps right_ts first so the tie-break total order
    # prefers later timestamps before comparing other carried values
    payload = F.struct(*[F.col(c).alias(out_names[c]) for c in right_cols])

    l_tag = left.select(
        *[F.col(c) for c in on],
        _axis(left, left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            right.select(payload.alias("_p")).schema["_p"].dataType
        ).alias("_p"),
    )
    r_tag = right.select(
        *[F.col(c) for c in on],
        _axis(right, right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns])
                        .alias("_l")).schema["_l"].dataType).alias("_l"),
        payload.alias("_p"),
    )
    both = l_tag.unionByName(r_tag)

    # sort so that the eligible right rows precede each left row:
    #  backward+exact : right first at equal t  (right sorts before)
    #  backward+strict: right last at equal t   (left sorts before)
    # forward is the time-mirror: order by -t and swap the tie rule.
    t_ord = F.col("_t") if direction == "backward" else -F.col("_t")
    side_first = (F.col("_is_left") if allow_exact
                  else -F.col("_is_left"))
    w = (Window.partitionBy(*on)
         .orderBy(t_ord, side_first, F.col("_p"))
         .rowsBetween(Window.unboundedPreceding, 0))
    matched = (both
               .withColumn("_m", F.last("_p", ignorenulls=True).over(w))
               .filter(F.col("_is_left") == 1))

    if tolerance_s is not None:
        m_ts = F.col(f"_m.{out_names[right_ts]}")
        m_t = (_micros(m_ts).cast("double")
               if _is_time(right, right_ts) else m_ts.cast("double"))
        gap = (F.col("_t") - m_t if direction == "backward"
               else m_t - F.col("_t"))
        tol = float(tolerance_s) * _time_scale(right, right_ts)
        matched = matched.withColumn(
            "_m", F.when(gap <= F.lit(tol), F.col("_m")))

    out = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out += [F.col(f"_m.{out_names[c]}").alias(out_names[c])
            for c in right_cols]
    return matched.select(*out)


def session_intervals(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts", gap_s: int = 1800) -> DataFrame:
    """DataFrame[user, session_id, session_start, session_end] — the
    interval view of :func:`gopie_spark.operators.sessions.sessionize`
    (same shuffle; the rollup is partial-aggregable on the session
    key)."""
    from gopie_spark.operators.sessions import sessionize
    return (sessionize(events, user_col, ts_col, gap_s)
            .groupBy(user_col, "session_id")
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end")))


def _bins(start: Column, end: Column, bin_units: float) -> Column:
    lo = F.floor(start / bin_units).cast("long")
    hi = F.floor(end / bin_units).cast("long")
    return F.sequence(lo, hi)


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          l_start: str, l_end: str,
                          r_start: str, r_end: str,
                          bin_s: int = 3600,
                          keys: Sequence[str] = (),
                          l_prefix: str = "a_", r_prefix: str = "b_",
                          extra_pred: Optional[Column] = None
                          ) -> DataFrame:
    """All (left, right) pairs whose half-open intervals overlap:
    ``l_start < r_end AND r_start < l_end`` (same ``keys`` when given).

    Output columns: left's prefixed ``l_prefix``, right's ``r_prefix``
    (keys unprefixed).  ``extra_pred`` adds a refinement predicate over
    the prefixed columns (e.g. ``F.col("a_user_id") < F.col("b_user_id")``
    for a deduplicated self-join).

    Each qualifying pair appears EXACTLY once regardless of how many
    bins both intervals share: the pair is only emitted from the bin
    containing ``greatest(l_start, r_start)`` — which both sides
    necessarily explode to when they overlap, so no pair is lost and no
    ``distinct`` barrier is paid.  ``bin_s`` trades explode factor
    against per-bin join population; see the module docstring.
    """
    keys = list(keys)
    l_units = bin_s * _time_scale(left, l_start)
    r_units = bin_s * _time_scale(right, r_start)
    lb = left.select(
        *[F.col(c) for c in keys],
        *[F.col(c).alias(l_prefix + c) for c in left.columns
          if c not in keys],
        F.explode(_bins(_axis(left, l_start), _axis(left, l_end),
                        l_units)).alias("_bin"))
    rb = right.select(
        *[F.col(c) for c in keys],
        *[F.col(c).alias(r_prefix + c) for c in right.columns
          if c not in keys],
        F.explode(_bins(_axis(right, r_start), _axis(right, r_end),
                        r_units)).alias("_bin"))
    ls, le = F.col(l_prefix + l_start), F.col(l_prefix + l_end)
    rs, re = F.col(r_prefix + r_start), F.col(r_prefix + r_end)

    def _ax(c: Column, is_time: bool) -> Column:
        return (_micros(c) if is_time else c).cast("double")

    lt, rt = _is_time(left, l_start), _is_time(right, r_start)
    if lt != rt:
        raise ValueError("left and right interval columns must both be "
                         "timestamps or both numeric")
    anchor = F.floor(
        F.greatest(_ax(ls, lt), _ax(rs, rt)) / l_units).cast("long")
    cond = (ls < re) & (rs < le) & (F.col("_bin") == anchor)
    if extra_pred is not None:
        cond = cond & extra_pred
    return lb.join(rb, keys + ["_bin"]).filter(cond).drop("_bin")


def interval_bin_stats(df: DataFrame, start: str, end: str,
                       bin_s: int, keys: Sequence[str] = ()) -> DataFrame:
    """Pre-flight skew report for :func:`interval_overlap_join`: rows
    per (keys, bin) after the explode, descending — the per-bin join
    population whose square bounds that bin's work.  Run this (cheap:
    one explode + count) before committing to a ``bin_s`` at scale,
    exactly like ``lsh_preflight_report`` does for dedup buckets."""
    keys = list(keys)
    units = bin_s * _time_scale(df, start)
    return (df.select(*[F.col(c) for c in keys],
                      F.explode(_bins(_axis(df, start), _axis(df, end),
                                      units)).alias("_bin"))
            .groupBy(*keys, "_bin").agg(F.count("*").alias("n_intervals"))
            .orderBy(F.desc("n_intervals")))
