"""Deterministic, mergeable sampling for training-data pipelines.

Every operator keys its randomness on ``md5(seed | row id)`` computed
JVM-side (Catalyst ``md5``/``conv`` — no Python, no RNG state), which
buys three properties a 10^12-row pipeline needs:

- **reproducible**: same (seed, id) -> same decision on any cluster, any
  partitioning, any retry — a re-run or a recovered task cannot change
  the sample;
- **mergeable / partial-aggregable**: top-k by a deterministic key is
  Spark's ``TakeOrderedAndProject`` (per-partition partial top-k, merged
  at the driver) and the stratified form reuses ``latest_n``'s two-level
  salted capped aggregation — no global sort, no per-key window sort;
- **oracle-checkable**: DuckDB computes the identical md5-derived keys,
  so the exact sampled set (not just its size) is verifiable.

Operators:

- :func:`hash_sample` — uniform k-without-replacement (smallest-k keys);
- :func:`hash_sample_fraction` — uniform p-fraction Bernoulli filter
  (consistent across tables: same id always lands the same side — the
  train/val split primitive);
- :func:`stratified_hash_sample` — k per stratum (e.g. per language),
  bounded buffers via ``latest_n``;
- :func:`priority_sample` — weighted sampling without replacement by
  priority ``w / u`` (Duffield-Lund-Thorup priority sampling; take the
  k largest priorities; with threshold ``tau`` = (k+1)-th priority the
  Horvitz-Thompson estimate ``max(w, tau)`` per kept row is unbiased
  for subset sums).

No reference analog (gopie has no corpus sampling); ``subset``-style
deterministic seeding per SURVEY §2.2.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

# 60-bit keys: largest hex-parseable width that cannot overflow a signed
# 64-bit parse in either engine (16 hex chars could reach 2^64-1).
_KEY_HEX_CHARS = 15
_FRACTION_BITS = 32


def sample_key(id_col, seed: int = 0,
               hex_chars: int = _KEY_HEX_CHARS) -> Column:
    """Deterministic uniform 60-bit key: first ``hex_chars`` hex chars of
    ``md5(seed | '|' | id)`` parsed as an integer.  DuckDB mirror:
    ``('0x' || substr(md5(seed || '|' || CAST(id AS VARCHAR)), 1, 15))::BIGINT``."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    digest = F.md5(F.concat_ws("|", F.lit(str(seed)), c.cast("string")))
    return F.conv(F.substring(digest, 1, hex_chars), 16, 10).cast("long")


def uniform01(id_col, seed: int = 0) -> Column:
    """Uniform (0,1) double from the top 32 key bits: ``(k32 + 0.5) /
    2^32`` — k32 < 2^53 so every step is an exact IEEE double in both
    Spark and DuckDB."""
    k32 = sample_key(id_col, seed, hex_chars=8)
    return (k32.cast("double") + F.lit(0.5)) / F.lit(float(1 << 32))


def hash_sample(df: DataFrame, k: int, seed: int = 0,
                id_col: str = "doc_id") -> DataFrame:
    """Uniform k-without-replacement: the k rows with the smallest
    sample keys (ties by id).  Plans as TakeOrderedAndProject — a
    per-partition partial top-k, never a global sort."""
    if k < 1:
        raise ValueError("k must be positive")
    key = sample_key(id_col, seed)
    return (df.withColumn("_skey", key)
            .orderBy(F.col("_skey"), F.col(id_col))
            .limit(k)
            .drop("_skey"))


def hash_sample_fraction(df: DataFrame, fraction: float, seed: int = 0,
                         id_col: str = "doc_id") -> DataFrame:
    """Bernoulli(p) filter on the 32-bit key: keep iff
    ``k32 < floor(p * 2^32)``.  Pure filter — no shuffle, no state; the
    same (seed, id) keeps/drops identically everywhere, which is what
    makes it a consistent train/val splitter."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    threshold = int(fraction * (1 << _FRACTION_BITS))
    k32 = sample_key(id_col, seed, hex_chars=8)
    return df.filter(k32 < F.lit(threshold))


def stratified_hash_sample(df: DataFrame, strata: Sequence[str], k: int,
                           seed: int = 0,
                           id_col: str = "doc_id") -> DataFrame:
    """k rows per stratum (smallest keys within each stratum): reuses
    ``latest_n``'s two-level salted capped aggregation on the negated
    key, so a viral stratum never materializes in one buffer and there
    is no per-stratum window sort.  Returns the original columns."""
    from gopie_spark.streaming.conflate import latest_n
    strata = list(strata)
    key = sample_key(id_col, seed)
    slim = df.select(*strata, F.col(id_col),
                     (-key).alias("_negkey"))
    picked = latest_n(slim, strata, "_negkey", k).select(id_col)
    # sample-sized right side: k rows per stratum value — broadcastable
    # for any realistic (k, #strata); AQE would pick the same plan
    return df.join(F.broadcast(picked), id_col, "semi")


def priority_sample(df: DataFrame, weight_col: str, k: int,
                    seed: int = 0, id_col: str = "doc_id",
                    out_col: str = "priority_e3") -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup, JACM 2007): priority
    ``q_i = w_i / u_i`` with ``u_i`` the deterministic per-id uniform;
    keep the k rows with the largest priorities.  Inclusion probability
    is proportional-ish to weight; with ``tau`` the (k+1)-th priority,
    ``max(w_i, tau)`` is the unbiased Horvitz-Thompson weight.

    ``out_col`` carries the priority scaled to integer milli-units
    (``floor(q * 1000 + 0.5)``) so results compare exactly across
    engines.  Plans as TakeOrderedAndProject."""
    if k < 1:
        raise ValueError("k must be positive")
    w = F.col(weight_col).cast("double")
    q = w / uniform01(id_col, seed)
    return (df.withColumn("_q", q)
            .orderBy(F.desc("_q"), F.col(id_col))
            .limit(k)
            .withColumn(out_col,
                        F.floor(F.col("_q") * 1000 + F.lit(0.5))
                        .cast("long"))
            .drop("_q"))


def priority_threshold(df: DataFrame, weight_col: str, k: int,
                       seed: int = 0, id_col: str = "doc_id") -> float:
    """``tau`` = the (k+1)-th largest priority (0.0 when the input has
    <= k rows) — the Horvitz-Thompson normalizer for
    :func:`priority_sample` estimates."""
    w = F.col(weight_col).cast("double")
    q = w / uniform01(id_col, seed)
    rows = (df.select(q.alias("_q"))
            .orderBy(F.desc("_q"))
            .limit(k + 1)
            .collect())
    if len(rows) <= k:
        return 0.0
    return float(rows[k]["_q"])


def mixture_sample(df: DataFrame, targets: dict, stratum_col: str,
                   seed: int = 0, id_col: str = "doc_id") -> DataFrame:
    """Data-mixing quota sample: take exactly ``targets[s]`` rows from
    each stratum ``s`` (e.g. ``{"en": 3000, "de": 500}`` documents per
    language), deterministically — the mixture-construction step of a
    pretraining-data build.  Strata absent from ``targets`` contribute
    nothing; a stratum smaller than its quota is taken whole.

    Selection is "smallest ``k_s`` hash keys per stratum", computed
    scale-safely in two stages: one pass of ``latest_n``'s two-level
    salted capped aggregation with the LARGEST quota (bounded buffers,
    no per-stratum window sort over the corpus), then an exact
    row_number re-rank over the survivors only — at most
    ``|strata| * max(k_s)`` rows, driver-small — to apply each
    stratum's own quota.  Reproducible across runs, partitionings and
    retries (seeded-hash keys), and oracle-checkable: DuckDB recomputes
    the same keys and ranks.
    """
    from pyspark.sql import Window
    from gopie_spark.streaming.conflate import latest_n
    if not targets:
        raise ValueError("targets must not be empty")
    if any(k < 0 for k in targets.values()):
        raise ValueError("quotas must be >= 0")
    kmax = max(targets.values())
    if kmax == 0:
        return df.filter(F.lit(False))
    spark = df.sparkSession
    key = sample_key(id_col, seed)
    slim = (df.filter(F.col(stratum_col).isin(list(targets)))
            .select(stratum_col, F.col(id_col), (-key).alias("_negkey")))
    pool = latest_n(slim, [stratum_col], "_negkey", kmax)
    # quota frame in the stratum column's NATIVE type (an int bucket id
    # or date stratum must not fail creation or join through implicit
    # casts): build as strings, then cast to the pool's own type
    stratum_type = df.schema[stratum_col].dataType
    quota = (spark.createDataFrame(
        [(str(s), int(k)) for s, k in targets.items()],
        f"{stratum_col} string, _quota int")
        .withColumn(stratum_col, F.col(stratum_col).cast(stratum_type)))
    w = Window.partitionBy(stratum_col).orderBy(
        F.desc("_negkey"), F.desc(id_col))
    picked = (pool.withColumn("_rn", F.row_number().over(w))
              .join(F.broadcast(quota), stratum_col)
              .filter(F.col("_rn") <= F.col("_quota"))
              .select(id_col))
    return df.join(F.broadcast(picked), id_col, "semi")


def token_budget_sample(df: DataFrame, budget: float, weight_col: str,
                        strata: Sequence[str] = (), seed: int = 0,
                        id_col: str = "doc_id") -> DataFrame:
    """Budget-targeted Bernoulli sample: keep each row with probability
    ``min(1, budget / total_weight)`` (per stratum when ``strata`` is
    given) — the "sample ~N tokens [per language]" primitive of a
    pretraining-data build.  The sampled weight concentrates at
    ``budget`` with relative sd ~ ``1/sqrt(rows kept)``.

    Scale shape: one partial-aggregable total per stratum (a tiny
    broadcast), then a pure scan-side filter on the deterministic
    per-id key — no shuffle of the corpus, reproducible across runs /
    partitionings / retries, and consistent: raising the budget only
    ADDS documents (the kept set is a superset, because the keep rule
    is ``key < threshold(budget)``), which lets checkpointed corpus
    cuts nest.  The exact kept set is oracle-checkable (the threshold
    arithmetic is integer-exact in both engines).
    """
    strata = list(strata)
    if budget <= 0:
        raise ValueError("budget must be positive")
    if strata:
        totals = df.groupBy(*strata).agg(F.sum(weight_col).alias("_tot"))
    else:
        totals = df.agg(F.sum(weight_col).alias("_tot"))
    frac = F.least(F.lit(1.0), F.lit(float(budget)) / F.col("_tot"))
    totals = totals.withColumn(
        "_thr",
        F.floor(frac * F.lit(float(1 << _FRACTION_BITS))).cast("long")) \
        .drop("_tot")
    k32 = sample_key(id_col, seed, hex_chars=8)
    if strata:
        # null-safe equi-join: a NULL stratum value is a real group (it
        # got a totals row from groupBy) and must keep its sampling
        # decision — a plain equi-join would silently drop every
        # NULL-stratum row regardless of the keep probability.  The
        # totals side is renamed so the predicate is unambiguous
        # (totals derives from df, and same-name attributes across a
        # self-derived join trip Spark's ambiguity resolution).
        totals = totals.select(
            *[F.col(s).alias(f"_ts_{s}") for s in strata], "_thr")
        cond = None
        for s in strata:
            c = F.col(s).eqNullSafe(F.col(f"_ts_{s}"))
            cond = c if cond is None else cond & c
        joined = df.join(F.broadcast(totals), cond) \
            .drop(*[f"_ts_{s}" for s in strata])
    else:
        joined = df.crossJoin(F.broadcast(totals))
    return joined.filter(k32 < F.col("_thr")).drop("_thr")


def temperature_quotas(counts: dict, total: int,
                       temperature: float = 2.0) -> dict:
    """Integer-exact temperature-scaled quotas (the T5/mT5
    alpha-sampling rule, alpha = 1/T): stratum ``s`` with ``n_s`` rows
    gets ``~ total * n_s^(1/T) / sum_t n_t^(1/T)`` — T=1 preserves the
    natural mixture, T→inf approaches uniform.

    Every step after the single float ``n ** (1/T)`` is 64-bit integer
    arithmetic: weights quantize to ``floor(n^(1/T) * 1000)``, base
    quotas are ``(total * w_s) // W``, and the remaining
    ``total - sum(base)`` seats go to the largest integer remainders
    (ties broken by stratum value) — so for T=2 (an IEEE
    correctly-rounded sqrt) a SQL engine recomputes the IDENTICAL
    quotas, making the whole sample oracle-checkable.  Quotas are NOT
    capped at n_s here; the selection stage takes an exhausted stratum
    whole (mixture semantics), so the realized total can fall short
    when a stratum runs dry — the standard behavior.
    """
    if total < 0:
        raise ValueError("total must be >= 0")
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    if not counts:
        raise ValueError("counts must not be empty")
    import math
    # T=2 goes through math.sqrt — IEEE-754 *correctly rounded* in
    # every engine, unlike libm pow(x, 0.5) which is only guaranteed
    # faithful on some platforms — so the SQL oracle's floor(sqrt(n))
    # matches bit-for-bit; int() truncates == floor for non-negatives
    if temperature == 2.0:
        w = {s: int(math.sqrt(n) * 1000) for s, n in counts.items()}
    else:
        w = {s: int((n ** (1.0 / temperature)) * 1000)
             for s, n in counts.items()}
    W = sum(w.values())
    if W == 0:
        return {s: 0 for s in counts}
    base = {s: (total * w[s]) // W for s in w}
    leftover = total - sum(base.values())
    order = sorted(w, key=lambda s: (-((total * w[s]) % W), str(s)))
    for s in order[:leftover]:
        base[s] += 1
    return base


def temperature_mixture_sample(df: DataFrame, stratum_col: str,
                               total: int, temperature: float = 2.0,
                               seed: int = 0,
                               id_col: str = "doc_id") -> DataFrame:
    """Temperature-scaled mixture sample: quotas from
    :func:`temperature_quotas` over the observed stratum counts (one
    partial-aggregable groupBy — the count table is strata-sized,
    driver-tiny), selection via :func:`mixture_sample`'s salted-capped
    smallest-key rule (no per-stratum window sort over the corpus).
    Deterministic and, at T=2, exactly recomputable by a SQL oracle."""
    counts = {r[0]: r[1] for r in
              df.groupBy(stratum_col).agg(F.count("*").alias("n"))
              .collect()}
    quotas = temperature_quotas(counts, total, temperature)
    quotas = {s: q for s, q in quotas.items() if q > 0}
    if not quotas:
        return df.filter(F.lit(False))
    return mixture_sample(df, quotas, stratum_col, seed=seed,
                          id_col=id_col)
