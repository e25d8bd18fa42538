"""Advised join executor — run the join the advisor planned.

:mod:`plans.advisor` answers the planning questions (broadcast or
shuffle?  how salty?  how many matching keys?) from KB-sized sketch
states.  This module closes the loop: :func:`advised_join` takes that
advice and EXECUTES the equi-join with the three physical levers a
1000-executor job actually pulls, while guaranteeing the output is
multiset-equal to the plain ``left.join(right)``:

- **broadcast**: when the advice says one side's exact payload fits
  the budget, the join gets the ``broadcast()`` hint (Catalyst emits a
  BroadcastHashJoin — zero shuffle of the big side, plan-tested).
- **Bloom semi-join prefilter**: on the shuffle path, when the theta
  set algebra says only a small fraction of the big side's keys have a
  partner (``matching_keys_est / big.distinct_est`` under the
  threshold), a Bloom filter is built over the SMALL side's key column
  (one scan of the small side, two-level mergeable build) and the big
  side is filtered BELOW its shuffle.  Bloom never drops a true member,
  so inner/semi join output is unchanged; non-matching rows — the
  ~(1-frac) majority at 10^12 rows — never enter the exchange.  This
  is Spark's own runtime-filter pattern (SPARK-32268) made explicit,
  sized from the profile (``n = distinct_est`` + its 4-sigma slack)
  instead of a config guess, and reusable across jobs since the filter
  state is an ordinary mergeable blob.
- **bounded-load salting**: when the advice's Misra-Gries bracket says
  the hottest key exceeds ``avg * load_factor``, the skewed side gets
  a uniform salt in ``[0, salt)`` and the other side is replicated
  once per salt, so no reducer sees more than ~``ceil(hot/salt)`` rows
  of the hot key (the reference's ringhash.go bounded-load rule
  applied to shuffle tasks).  Join on ``(key, salt)``; the salt column
  never survives the join.

Decisions are pure functions of the advice (:func:`plan_execution`),
so they are unit-testable with zero Spark and the same advice dict
drives jobs at any scale.  Certified by the driver query
``advised_join_orders`` (result hash-equal to DuckDB's plain join) and
by plan/equality tests in ``tests/test_advised_join.py``.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple, Union

from pyspark.sql import DataFrame, functions as F

_SALT = "_gopie_join_salt"


def _bloom_bytes(n: int, p: float) -> int:
    """Serialized size of a BloomBit filter sized for n keys at FPR p
    (packed bitmap; header is negligible)."""
    from gopie_spark.kernels.bloom import guess
    m, _k = guess(max(int(n), 64), p)
    return m // 8


def plan_execution(advice: dict, *, how: str = "inner",
                   bloom_p: float = 0.01,
                   bloom_max_bytes: int = 64 << 20,
                   prefilter_max_frac: float = 0.5,
                   max_salt: int = 64) -> dict:
    """Pure decision step: advice dict -> execution plan dict.

    Keys of the result:

    - ``path``: ``broadcast_left`` / ``broadcast_right`` / ``shuffle``
      (straight from the advice);
    - ``prefilter_side``: ``"left"``/``"right"``/``None`` — which side
      gets the Bloom prefilter (the side with MORE payload bytes is
      filtered using the other side's keys); only on the shuffle path,
      only for ``inner``/``left_semi``, only when the estimated
      matching fraction of the filtered side's keys is under
      ``prefilter_max_frac`` and the filter fits ``bloom_max_bytes``;
    - ``bloom_n`` / ``bloom_bytes``: the filter sizing (distinct
      estimate of the small side plus its 4-sigma slack);
    - ``salt``: the advice's bounded-load salt (1 = no salting),
      capped at ``max_salt`` — spreading one key over more tasks than
      the cluster can run concurrently buys nothing and multiplies the
      replicated side, so the cap is the useful-parallelism bound; the
      skewed side is the one whose per-side salt is larger;
    - ``salt_side``: ``"left"``/``"right"``/``None``.
    """
    plan = advice["plan"]
    path = plan["strategy"]
    out = {"path": path, "prefilter_side": None, "bloom_n": 0,
           "bloom_bytes": 0, "salt": 1, "salt_side": None,
           "match_frac_est": None,
           "shuffle_partitions": plan["shuffle_partitions"]}
    if path != "shuffle":
        return out

    left, right = advice["left"], advice["right"]
    big, small, big_name = ((left, right, "left")
                            if left["total_bytes"] >= right["total_bytes"]
                            else (right, left, "right"))
    # a left_semi join only ever filters its LEFT (probe) side; skip
    # the prefilter when the big side is the right one
    semi_ok = how == "inner" or (how == "left_semi" and big_name == "left")
    matching = advice["join"]["matching_keys_est"]
    frac = matching / max(big["distinct_est"], 1.0)
    out["match_frac_est"] = frac
    if semi_ok and frac <= prefilter_max_frac:
        slack = 4.0 * small["distinct_rel_err"]
        n = int(small["distinct_est"] * (1.0 + slack)) + 16
        nbytes = _bloom_bytes(n, bloom_p)
        if nbytes <= bloom_max_bytes:
            out.update(prefilter_side=big_name, bloom_n=n,
                       bloom_bytes=nbytes)

    if plan["salt"] > 1 and how == "inner":
        out["salt"] = min(int(plan["salt"]), max_salt)
        out["salt_side"] = ("left" if left["salt"] >= right["salt"]
                            else "right")
    return out


def advised_join(left: DataFrame, right: DataFrame,
                 on: Union[str, Tuple[str, str]], advice: dict, *,
                 how: str = "inner", bloom_p: float = 0.01,
                 bloom_max_bytes: int = 64 << 20,
                 prefilter_max_frac: float = 0.5, max_salt: int = 64,
                 salt_seed: int = 42,
                 report: Optional[Dict] = None) -> DataFrame:
    """Equi-join ``left`` with ``right`` the way the advice says to.

    ``on`` is the key column name (same on both sides) or a
    ``(left_key, right_key)`` pair.  ``how`` is ``inner`` (default) or
    ``left_semi``.  The result is multiset-equal to the plain
    ``left.join(right, cond, how)`` with explicit-condition semantics
    (both key columns survive an inner join) — the Bloom prefilter has
    no false negatives and salting is an exact rewrite, so neither
    lever changes the answer (equality-tested per path).

    Pass a dict as ``report`` to receive the :func:`plan_execution`
    decision actually taken (prefilter side, filter bytes, salt) — the
    jobs surface it in their JSON accounting like ``lsh_preflight``.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"advised_join supports inner/left_semi, got {how!r}")
    lk, rk = (on, on) if isinstance(on, str) else on
    plan = plan_execution(advice, how=how, bloom_p=bloom_p,
                          bloom_max_bytes=bloom_max_bytes,
                          prefilter_max_frac=prefilter_max_frac,
                          max_salt=max_salt)
    if report is not None:
        report.update(plan)

    cond = left[lk] == right[rk]
    if plan["path"] == "broadcast_right":
        return left.join(F.broadcast(right), cond, how)
    if plan["path"] == "broadcast_left":
        # BroadcastHashJoin cannot build on the preserved side of a
        # semi join; Catalyst ignores the hint there, which is fine
        return F.broadcast(left).join(right, cond, how)

    if plan["prefilter_side"]:
        from gopie_spark.operators.sketch_agg import (bloom_build,
                                                      bloom_filter)
        if plan["prefilter_side"] == "left":
            big, big_key, small, small_key = left, lk, right, rk
        else:
            big, big_key, small, small_key = right, rk, left, lk
        bloom, state = bloom_build(small.select(small_key), small_key,
                                   plan["bloom_n"], bloom_p)
        filtered = bloom_filter(big.sparkSession, bloom, state,
                                big, big_key)
        if plan["prefilter_side"] == "left":
            left = filtered
        else:
            right = filtered
        cond = left[lk] == right[rk]

    salt = plan["salt"]
    if salt > 1:
        # uniform per-row salt on the skewed side; the other side is
        # replicated once per salt value so every (key, salt) pair has
        # its partners — an exact rewrite of the equi-join
        replicas = F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        spread = F.floor(F.rand(salt_seed) * salt).cast("int")
        if plan["salt_side"] == "left":
            left = left.withColumn(_SALT, spread)
            right = right.withColumn(_SALT, replicas)
        else:
            left = left.withColumn(_SALT, replicas)
            right = right.withColumn(_SALT, spread)
        cond = (left[lk] == right[rk]) & (left[_SALT] == right[_SALT])
        # plan_execution only salts inner joins, so both sides' salt
        # columns are present in the join output
        return left.join(right, cond, how).drop(left[_SALT],
                                                right[_SALT])

    return left.join(right, cond, how)
