"""Distributed connected components for near-duplicate clustering.

Near-dup dedup produces *pairs*; turning pairs into keep/drop decisions
needs the transitive closure (A~B, B~C puts A,C in one cluster even when
A~C was never emitted).  The greedy per-pair rule (drop the larger id of
every pair) is one pass but over-drops on chains; this module provides
the real thing as a bounded-iteration Spark job.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014 — public
literature).  Each round is two partial-aggregable groupBys (min over
the neighborhood) + a join; the edge set converges to star graphs whose
centers are the component minima in O(log n) rounds — crucially NOT
O(diameter), so a 1M-long duplicate chain needs ~20 rounds, not 1M.
No driver-side per-row work: the driver only runs the (bounded) round
loop and a tiny convergence checksum per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (u, v) with u < v, distinct."""
    u, v = F.col("_u"), F.col("_v")
    return (edges.filter(u != v)
            .select(F.least(u, v).alias("_u"), F.greatest(u, v).alias("_v"))
            .distinct())


def _star(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star (attach strictly-larger neighbors to the
    neighborhood min) or small-star (attach <= neighbors) round.
    ``min(N(u) u {u})`` is a partial-aggregable min — no neighborhood
    list is ever materialized in an aggregation buffer."""
    nbrs = edges.select(F.col("_u").alias("u"), F.col("_v").alias("v")) \
        .union(edges.select(F.col("_v").alias("u"), F.col("_u").alias("v")))
    mins = nbrs.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m"))
    joined = nbrs.join(mins, "u")
    cond = F.col("v") > F.col("u") if large else F.col("v") <= F.col("u")
    out = joined.filter(cond).select(F.col("v").alias("_u"),
                                     F.col("m").alias("_v"))
    if not large:
        # small-star also links each center u itself to m
        out = out.union(mins.select(F.col("u").alias("_u"),
                                    F.col("m").alias("_v")))
    return _canon(out)


def connected_components(pairs: DataFrame, src: str = "id_a",
                         dst: str = "id_b",
                         max_iter: int = 25) -> DataFrame:
    """DataFrame[id, component] for every vertex appearing in ``pairs``;
    ``component`` is the smallest id in the vertex's component.

    Convergence is detected by a (count, hash-xor) checksum of the
    canonical edge set — one tiny aggregate per round instead of a full
    except-join.  Lineage is cut with ``localCheckpoint`` EVERY round:
    each star round references its input edge set several times (u->v
    plus v->u views, then a join back onto the neighborhood mins), so an
    untruncated plan recomputes the previous round per reference and
    compounds — measured on the sf0.1 chain workload: checkpoint every
    round 8.1 s, every *2* rounds 115 s (14x), plain ``persist`` did not
    finish.  ``max_iter`` rounds handle components of ~2^max_iter
    vertices (log-convergence); hitting the cap raises rather than
    returning a silently-unfinished clustering.
    """
    edges = _canon(pairs.select(F.col(src).alias("_u"),
                                F.col(dst).alias("_v")))
    verts = (edges.select(F.col("_u").alias("id"))
             .union(edges.select(F.col("_v").alias("id"))).distinct())
    prev = None
    for _ in range(max_iter):
        edges = _star(_star(edges, large=True), large=False)
        edges = edges.localCheckpoint(eager=True)
        chk = edges.agg(
            F.count("*").alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("_u", "_v")), F.lit(0))
            .alias("h")).collect()[0]
        cur = (chk["n"], chk["h"])
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components did not converge in "
                           f"{max_iter} rounds")
    # post-convergence: canonical edges are (component-min, member) stars
    labels = edges.select(F.col("_v").alias("id"),
                          F.col("_u").alias("component"))
    return (verts.join(labels, "id", "left")
            .select("id", F.coalesce("component", F.col("id"))
                    .alias("component")))
