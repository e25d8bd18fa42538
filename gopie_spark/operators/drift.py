"""Corpus snapshot drift — sketch-only comparison of two corpora.

"What changed between crawl A and crawl B?" is a question a training-
data pipeline asks before every corpus refresh, and the naive answers
(join the URL sets, full-outer-join the token histograms, sort both
length distributions) each cost a corpus-sized shuffle PER question.
This module answers all of them from the mergeable sketch states the
engine already builds — at 10^12 docs per snapshot the whole report is
ONE sketch pass per snapshot (or ZERO passes when the states were
persisted by ``jobs/build_sketches.py``: every metric here is a pure
function of KB-sized states, so snapshots are compared without ever
re-reading them).  No drift metric joins or shuffles raw corpus rows.

Metrics and their kernels (all certified elsewhere in this repo):

- **URL-set drift** (``kernels/theta.py``, Beyer et al. SIGMOD 2007):
  distinct URLs per side, the overlap ``|A ∩ B|``, the new mass
  ``|B \\ A|``, and Jaccard — REAL set algebra with derived 4-sigma
  bounds, not inclusion–exclusion on three estimates.
- **Token-frequency drift** (``kernels/countsketch.py``, Charikar et
  al. ICALP 2002 + ``kernels/misragries.py``, Misra–Gries / Agarwal
  et al. "Mergeable Summaries" PODS 2012): CountSketch is LINEAR, so
  ``sketch(B) - sketch(A)`` is an unbiased frequency-difference sketch
  with two-sided error ``~ sqrt(F2(B - A) / width)`` — typically far
  tighter than differencing two point estimates, because the
  DIFFERENCE stream's F2 is small when the corpora mostly agree.  The
  Misra–Gries summaries provide the candidate token set (any token
  heavy in either side is retained), so "top movers" needs no exact
  vocabulary pass.
- **Length-distribution drift** (``kernels/kll.py``): a bounded-error
  two-sample Kolmogorov–Smirnov statistic
  ``max_x |F_A(x) - F_B(x)|`` evaluated on the union of the two
  sketches' retained items; each rank is within the KLL rank error
  (eps ~ 0.02 at k=200 per this repo's envelope), so the estimate is
  within ``eps_a + eps_b`` of the true KS distance.

Scale notes (100 TB / 1000 executors): the two build passes are the
standard two-level ``sketch_agg`` plan — map-side partial states, blob
shuffle, tree merge; the token builds ride the JVM wordcount pre-agg
(vocabulary-bounded (token, count) rows cross the Python boundary,
never text).  Everything after the builds is driver-side NumPy over
KB-sized states.  The driver certificate ``corpus_drift``
(``__spark_entry__.py``) anchors every estimate to the exact answer
with the kernel's published bound at sf0.001/0.01/0.1.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from pyspark.sql import DataFrame, functions as F

from gopie_spark.kernels import KLL, CountSketch, MisraGries, Theta
from gopie_spark.operators.sketch_agg import (global_sketch,
                                              tokens_sketch_build)
from gopie_spark.operators.textstats import token_count

# the repo-wide KLL rank-error envelope (operators/split.py uses the
# same figure for range-shard balance bands): eps ~ 4 / k
_KLL_EPS_NUM = 4.0


def kll_eps(k: int) -> float:
    """Rank-error envelope for a KLL with parameter ``k``."""
    return _KLL_EPS_NUM / float(k)


# --------------------------------------------------------------------------
# URL / key-set drift (theta set algebra)
# --------------------------------------------------------------------------

def url_set_drift_from_states(theta: Theta, st_a, st_b) -> Dict[str, float]:
    """Set-drift metrics from two theta states (no data touched)."""
    est_a, est_b = theta.estimate(st_a), theta.estimate(st_b)
    return {
        "n_a_est": est_a,
        "n_b_est": est_b,
        "n_union_est": theta.union_estimate(st_a, st_b),
        "n_common_est": theta.intersect_estimate(st_a, st_b),
        "n_new_b_est": theta.diff_estimate(st_b, st_a),
        "n_gone_a_est": theta.diff_estimate(st_a, st_b),
        "jaccard_est": theta.jaccard_estimate(st_a, st_b),
        "rel_err": theta.rel_err,
        "common_bound": theta.intersect_bound(st_a, st_b),
        "new_b_bound": theta.diff_bound(st_b, st_a),
        "union_bound": theta.union_bound(st_a, st_b),
    }


def url_set_drift(df_a: DataFrame, df_b: DataFrame, url_col: str = "url",
                  k: int = 4096) -> Dict[str, float]:
    """Distinct / overlap / new-mass / Jaccard drift of a key column
    between two snapshots: one theta build per side, algebra on the
    states.  Returns estimates plus the kernel's 4-sigma bounds."""
    theta = Theta(k=k)
    st_a = global_sketch(
        df_a.select(F.col(url_col).cast("string").alias("v")), "v", theta)
    st_b = global_sketch(
        df_b.select(F.col(url_col).cast("string").alias("v")), "v", theta)
    return url_set_drift_from_states(theta, st_a, st_b)


# --------------------------------------------------------------------------
# Token-frequency drift (Misra-Gries candidates + CountSketch difference)
# --------------------------------------------------------------------------

def token_drift_from_states(cs: CountSketch, cs_a, cs_b,
                            mg: MisraGries, mg_a, mg_b,
                            top: int = 20) -> Dict[str, object]:
    """Top token movers from four states (no data touched).

    The candidate set is the union of both sides' Misra-Gries keys
    (any token with frequency > n/k on either side is guaranteed
    retained); each candidate's frequency CHANGE is estimated from the
    linear CountSketch difference ``B - A`` in one vectorized gather.
    """
    cand = np.union1d(mg_a["keys"].astype(str), mg_b["keys"].astype(str))
    diff = cs.subtract({"matrix": cs_b["matrix"].copy(),
                        "count": cs_b["count"].copy()}, cs_a)
    f2_diff = cs.f2_estimate(diff)
    bound = cs.error_bound(f2_diff)
    if cand.size:
        deltas = cs.estimate(diff, cand)
        order = np.lexsort((cand, -np.abs(deltas)))[:top]
        movers = [(str(cand[i]), float(deltas[i])) for i in order]
    else:
        movers = []
    return {"movers": movers, "f2_diff_est": f2_diff,
            "delta_bound": bound, "n_candidates": int(cand.size),
            "diff_state": diff}


def token_drift(df_a: DataFrame, df_b: DataFrame, text_col: str = "text",
                mg_k: int = 256, width: int = 8192, depth: int = 7,
                top: int = 20) -> Dict[str, object]:
    """Top token-frequency movers between two snapshots.

    Two JVM-wordcount-pre-aggregated sketch builds per side (Misra-Gries
    for candidates, CountSketch for unbiased deltas); the report is
    driver-side algebra on the four states.  ``delta_bound`` is the
    3-sigma two-sided band ``3 * sqrt(F2(B - A) / width)`` that every
    reported delta carries.
    """
    cs = CountSketch(width=width, depth=depth)
    mg = MisraGries(k=mg_k)
    cs_a = tokens_sketch_build(df_a, cs, text_col, counts_dtype=np.int64)
    cs_b = tokens_sketch_build(df_b, cs, text_col, counts_dtype=np.int64)
    mg_a = tokens_sketch_build(df_a, mg, text_col, counts_dtype=np.int64)
    mg_b = tokens_sketch_build(df_b, mg, text_col, counts_dtype=np.int64)
    return token_drift_from_states(cs, cs_a, cs_b, mg, mg_a, mg_b, top=top)


# --------------------------------------------------------------------------
# Length-distribution drift (KLL two-sample Kolmogorov-Smirnov)
# --------------------------------------------------------------------------

def ks_from_states(kll: KLL, st_a, st_b) -> float:
    """Bounded-error two-sample KS statistic from two KLL states.

    Evaluates ``|rank_a(x) - rank_b(x)|`` on the union of the two
    sketches' retained items.  The true KS max is attained at a data
    point; between consecutive retained items the true CDFs each move
    by at most their sketch's eps, so the estimate is within
    ``eps_a + eps_b`` of the true statistic (both states here share one
    kernel, so the band is ``2 * kll_eps(k)``).
    """
    items_a, _ = kll._items_weights(st_a)
    items_b, _ = kll._items_weights(st_b)
    grid = np.union1d(items_a, items_b)
    if grid.size == 0:
        return 0.0
    ra = kll.rank(st_a, grid)
    rb = kll.rank(st_b, grid)
    return float(np.max(np.abs(ra - rb)))


def length_drift(df_a: DataFrame, df_b: DataFrame,
                 text_col: str = "text", k: int = 200,
                 quantiles: Sequence[float] = (0.25, 0.5, 0.75, 0.99),
                 ) -> Dict[str, object]:
    """Token-count distribution shift between two snapshots: one KLL
    build per side, then the KS statistic plus per-quantile before/after
    values — all from the two states."""
    kll = KLL(k=k)
    va = df_a.select(token_count(text_col).cast("double").alias("v"))
    vb = df_b.select(token_count(text_col).cast("double").alias("v"))
    st_a = global_sketch(va, "v", kll)
    st_b = global_sketch(vb, "v", kll)
    qs = np.asarray(quantiles, dtype=np.float64)
    qa = kll.quantile(st_a, qs)
    qb = kll.quantile(st_b, qs)
    return {
        "ks_est": ks_from_states(kll, st_a, st_b),
        "ks_band": 2.0 * kll_eps(k),
        "n_a": kll.count(st_a),
        "n_b": kll.count(st_b),
        "quantile_shift": {float(q): (float(a), float(b))
                           for q, a, b in zip(qs, qa, qb)},
    }


# --------------------------------------------------------------------------
# Composed report
# --------------------------------------------------------------------------

def lang_share_drift(df_a: DataFrame, df_b: DataFrame,
                     lang_col: str = "lang") -> Dict[str, object]:
    """Exact language-composition shift: per-lang doc shares and their
    L1 distance.  groupBy(lang).count() is partial-aggregable with a
    language-bounded shuffle, so 'exact' is already the cheap plan at
    any corpus size (no sketch needed)."""
    ca = {r[lang_col]: r["n"] for r in
          df_a.groupBy(lang_col).agg(F.count("*").alias("n")).collect()}
    cb = {r[lang_col]: r["n"] for r in
          df_b.groupBy(lang_col).agg(F.count("*").alias("n")).collect()}
    ta = float(sum(ca.values())) or 1.0
    tb = float(sum(cb.values())) or 1.0
    langs = sorted(set(ca) | set(cb), key=str)
    shares = {str(lg): (ca.get(lg, 0) / ta, cb.get(lg, 0) / tb)
              for lg in langs}
    l1 = sum(abs(a - b) for a, b in shares.values())
    return {"shares": shares, "l1": l1}


def drift_report(df_a: DataFrame, df_b: DataFrame, *,
                 text_col: str = "text", url_col: Optional[str] = None,
                 lang_col: Optional[str] = "lang",
                 theta_k: int = 4096, mg_k: int = 256,
                 cs_width: int = 8192, cs_depth: int = 7,
                 kll_k: int = 200, top: int = 20) -> dict:
    """Full snapshot-diff report (JSON-ready dict): URL-set drift,
    top token movers, length-distribution shift, language-share shift.

    Each section degrades gracefully: URL drift only when ``url_col``
    is given, language shares only when ``lang_col`` exists in both
    frames."""
    report: dict = {}
    if url_col is not None:
        u = url_set_drift(df_a, df_b, url_col=url_col, k=theta_k)
        report["urls"] = {k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in u.items()}
    t = token_drift(df_a, df_b, text_col=text_col, mg_k=mg_k,
                    width=cs_width, depth=cs_depth, top=top)
    report["tokens"] = {
        "movers": [(tok, round(d, 1)) for tok, d in t["movers"]],
        "delta_bound": round(float(t["delta_bound"]), 1),
        "n_candidates": t["n_candidates"],
    }
    ln = length_drift(df_a, df_b, text_col=text_col, k=kll_k)
    report["length"] = {
        "ks_est": round(ln["ks_est"], 4),
        "ks_band": ln["ks_band"],
        "n_a": ln["n_a"], "n_b": ln["n_b"],
        "quantile_shift": {str(q): (round(a, 1), round(b, 1))
                           for q, (a, b) in ln["quantile_shift"].items()},
    }
    if (lang_col is not None and lang_col in df_a.columns
            and lang_col in df_b.columns):
        ls = lang_share_drift(df_a, df_b, lang_col=lang_col)
        report["languages"] = {
            "l1": round(ls["l1"], 4),
            "shares": {lg: (round(a, 4), round(b, 4))
                       for lg, (a, b) in ls["shares"].items()},
        }
    return report
