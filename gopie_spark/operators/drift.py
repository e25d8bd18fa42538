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

Scale notes (100 TB / 1000 executors): the build passes are the
standard two-level ``sketch_agg`` plan — map-side partial states, blob
shuffle, tree merge; the TWO token kernels (CountSketch + Misra-Gries)
ride ONE JVM wordcount pre-agg per snapshot
(``tokens_sketch_build_multi``: vocabulary-bounded (token, count) rows
cross the Python boundary once, never text, never twice), and the URL
theta + token-length KLL co-build on ONE raw scan
(``global_sketch_multi``) — a full snapshot's states cost exactly two
corpus passes.  Everything after the builds is driver-side NumPy over
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
                                              global_sketch_multi,
                                              tokens_sketch_build_multi)
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


def _url_theta_state(df: DataFrame, url_col: str, theta: Theta):
    """Standalone URL-set theta build (:func:`url_set_drift`'s path;
    the composed report / persist paths co-build theta with the KLL in
    one scan via :func:`_raw_sketch_states`)."""
    return global_sketch(
        df.select(F.col(url_col).cast("string").alias("v")), "v", theta)


def url_set_drift(df_a: DataFrame, df_b: DataFrame, url_col: str = "url",
                  k: int = 4096) -> Dict[str, float]:
    """Distinct / overlap / new-mass / Jaccard drift of a key column
    between two snapshots: one theta build per side, algebra on the
    states.  Returns estimates plus the kernel's 4-sigma bounds."""
    theta = Theta(k=k)
    st_a = _url_theta_state(df_a, url_col, theta)
    st_b = _url_theta_state(df_b, url_col, theta)
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


def _raw_sketch_states(df: DataFrame, kll: KLL, text_col: str,
                       theta: Optional[Theta] = None,
                       url_col: Optional[str] = None):
    """The one canonical raw-row build (shared by the live drift path
    and :func:`persist_drift_states`): the token-length KLL and — when a
    URL column exists — the URL-set theta ride ONE corpus scan via
    :func:`global_sketch_multi`.  At 100 TB the scan is the cost, so
    the two per-snapshot raw passes become one.  Returns
    ``(theta_state_or_None, kll_state)``."""
    proj = df.select(
        *([F.col(url_col).cast("string").alias("_u")]
          if url_col is not None else []),
        token_count(text_col).cast("double").alias("_v"))
    if url_col is None:
        return None, global_sketch_multi(proj, [("_v", kll)])[0]
    st_u, st_v = global_sketch_multi(proj, [("_u", theta), ("_v", kll)])
    return st_u, st_v


def _token_sketch_states(df: DataFrame, cs: CountSketch, mg: MisraGries,
                         text_col: str):
    """The one canonical token-frequency build (shared by the live drift
    path and :func:`persist_drift_states`): CountSketch and Misra-Gries
    ride ONE JVM wordcount stream — the corpus is tokenized and the
    vocabulary-bounded (token, count) rows shuffled exactly once per
    snapshot, not once per kernel.  Both kernels are pure functions of
    the counted stream, so the states are the ones two separate builds
    would produce, at half the scan + shuffle cost."""
    return tokens_sketch_build_multi(df, (cs, mg), text_col,
                                     counts_dtype=np.int64)


def token_drift(df_a: DataFrame, df_b: DataFrame, text_col: str = "text",
                mg_k: int = 256, width: int = 8192, depth: int = 7,
                top: int = 20) -> Dict[str, object]:
    """Top token-frequency movers between two snapshots.

    ONE JVM-wordcount-pre-aggregated sketch build per side (Misra-Gries
    for candidates and CountSketch for unbiased deltas share the counted
    token stream); the report is driver-side algebra on the four states.
    ``delta_bound`` is the 3-sigma two-sided band
    ``3 * sqrt(F2(B - A) / width)`` that every reported delta carries.
    """
    cs = CountSketch(width=width, depth=depth)
    mg = MisraGries(k=mg_k)
    cs_a, mg_a = _token_sketch_states(df_a, cs, mg, text_col)
    cs_b, mg_b = _token_sketch_states(df_b, cs, mg, text_col)
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
    if kll.count(st_a) == 0 or kll.count(st_b) == 0:
        # two-sample KS against an empty sample: no mass to compare
        # when both are empty; the full mass moved when only one is
        # (the grouped report's appeared/vanished-group convention)
        return 0.0 if kll.count(st_a) == kll.count(st_b) else 1.0
    items_a, _ = kll._items_weights(st_a)
    items_b, _ = kll._items_weights(st_b)
    grid = np.union1d(items_a, items_b)
    if grid.size == 0:
        return 0.0
    ra = kll.rank(st_a, grid)
    rb = kll.rank(st_b, grid)
    return float(np.max(np.abs(ra - rb)))


def _toklen_kll_state(df: DataFrame, text_col: str, kll: KLL):
    """Standalone token-count KLL build (:func:`length_drift`'s path;
    the composed report / persist paths co-build the KLL with theta in
    one scan via :func:`_raw_sketch_states`)."""
    return global_sketch(
        df.select(token_count(text_col).cast("double").alias("v")),
        "v", kll)


def length_drift_from_states(kll: KLL, st_a, st_b,
                             quantiles: Sequence[float] = (
                                 0.25, 0.5, 0.75, 0.99),
                             ) -> Dict[str, object]:
    """Length-distribution drift from two KLL states (no data touched):
    bounded-error two-sample KS statistic plus per-quantile
    before/after values."""
    qs = np.asarray(quantiles, dtype=np.float64)
    qa = kll.quantile(st_a, qs)
    qb = kll.quantile(st_b, qs)
    return {
        "ks_est": ks_from_states(kll, st_a, st_b),
        "ks_band": 2.0 * kll_eps(kll.k),
        "n_a": kll.count(st_a),
        "n_b": kll.count(st_b),
        "quantile_shift": {float(q): (float(a), float(b))
                           for q, a, b in zip(qs, qa, qb)},
    }


def length_drift(df_a: DataFrame, df_b: DataFrame,
                 text_col: str = "text", k: int = 200,
                 quantiles: Sequence[float] = (0.25, 0.5, 0.75, 0.99),
                 ) -> Dict[str, object]:
    """Token-count distribution shift between two snapshots: one KLL
    build per side, then the KS statistic plus per-quantile before/after
    values — all from the two states."""
    kll = KLL(k=k)
    st_a = _toklen_kll_state(df_a, text_col, kll)
    st_b = _toklen_kll_state(df_b, text_col, kll)
    return length_drift_from_states(kll, st_a, st_b, quantiles=quantiles)


# --------------------------------------------------------------------------
# Composed report
# --------------------------------------------------------------------------

def lang_counts(df: DataFrame, lang_col: str = "lang") -> Dict[str, int]:
    """Exact per-language doc counts (the language vocabulary is tiny,
    so this is a partial-aggregable groupBy with a language-bounded
    shuffle — 'exact' is already the cheap plan at any corpus size)."""
    return {str(r[lang_col]): int(r["n"]) for r in
            df.groupBy(lang_col).agg(F.count("*").alias("n")).collect()}


def lang_share_drift_from_counts(ca: Dict[str, int],
                                 cb: Dict[str, int]) -> Dict[str, object]:
    """Language-composition shift from two per-lang count dicts (no
    data touched): per-lang doc shares and their L1 distance."""
    ta = float(sum(ca.values())) or 1.0
    tb = float(sum(cb.values())) or 1.0
    langs = sorted(set(ca) | set(cb), key=str)
    shares = {str(lg): (ca.get(lg, 0) / ta, cb.get(lg, 0) / tb)
              for lg in langs}
    l1 = sum(abs(a - b) for a, b in shares.values())
    return {"shares": shares, "l1": l1}


def lang_share_drift(df_a: DataFrame, df_b: DataFrame,
                     lang_col: str = "lang") -> Dict[str, object]:
    """Exact language-composition shift between two snapshots."""
    return lang_share_drift_from_counts(lang_counts(df_a, lang_col),
                                        lang_counts(df_b, lang_col))


def _format_report(urls: Optional[dict], tokens: dict, length: dict,
                   langs: Optional[dict]) -> dict:
    """Shared JSON shaping for the live and from-states report paths —
    one formatter so the two cannot drift apart."""
    report: dict = {}
    if urls is not None:
        report["urls"] = {k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in urls.items()}
    report["tokens"] = {
        "movers": [(tok, round(d, 1)) for tok, d in tokens["movers"]],
        "delta_bound": round(float(tokens["delta_bound"]), 1),
        "n_candidates": tokens["n_candidates"],
    }
    report["length"] = {
        "ks_est": round(length["ks_est"], 4),
        "ks_band": length["ks_band"],
        "n_a": length["n_a"], "n_b": length["n_b"],
        "quantile_shift": {str(q): (round(a, 1), round(b, 1))
                           for q, (a, b) in length["quantile_shift"].items()},
    }
    if langs is not None:
        report["languages"] = {
            "l1": round(langs["l1"], 4),
            "shares": {lg: (round(a, 4), round(b, 4))
                       for lg, (a, b) in langs["shares"].items()},
        }
    return report


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
    frames.

    The whole report costs TWO corpus scans per snapshot: one wordcount
    pass co-building CountSketch + Misra-Gries, one raw pass co-building
    the URL theta + the token-length KLL — the same canonical builds
    :func:`persist_drift_states` persists, so the live report and the
    from-states report are identical by construction."""
    theta = Theta(k=theta_k) if url_col is not None else None
    cs = CountSketch(width=cs_width, depth=cs_depth)
    mg = MisraGries(k=mg_k)
    kll = KLL(k=kll_k)
    th_a, kl_a = _raw_sketch_states(df_a, kll, text_col, theta, url_col)
    th_b, kl_b = _raw_sketch_states(df_b, kll, text_col, theta, url_col)
    cs_a, mg_a = _token_sketch_states(df_a, cs, mg, text_col)
    cs_b, mg_b = _token_sketch_states(df_b, cs, mg, text_col)
    urls = (url_set_drift_from_states(theta, th_a, th_b)
            if url_col is not None else None)
    tokens = token_drift_from_states(cs, cs_a, cs_b, mg, mg_a, mg_b,
                                     top=top)
    length = length_drift_from_states(kll, kl_a, kl_b)
    langs = (lang_share_drift(df_a, df_b, lang_col=lang_col)
             if (lang_col is not None and lang_col in df_a.columns
                 and lang_col in df_b.columns) else None)
    return _format_report(urls, tokens, length, langs)


# --------------------------------------------------------------------------
# Grouped drift: the per-language report
# --------------------------------------------------------------------------

def grouped_drift_states(df: DataFrame, group_col: str, *,
                         text_col: str = "text",
                         url_col: Optional[str] = None,
                         theta: Optional[Theta] = None,
                         kll: Optional[KLL] = None) -> Dict:
    """Per-group drift states in ONE corpus scan: for every value of
    ``group_col`` (bounded cardinality — lang, source, split), the
    URL-set theta (when ``url_col`` given) and the token-length KLL
    co-build via ``sketch_agg.keyed_sketch_multi``, the grouped twin of
    the global co-build.  Returns ``{group: (theta_state_or_None,
    kll_state)}``; per-group states are byte-identical to running the
    global build on that group's slice (tested)."""
    from gopie_spark.operators.sketch_agg import keyed_sketch_multi

    kll = kll or KLL(k=200)
    proj = df.select(
        F.col(group_col).alias("_g"),
        *([F.col(url_col).cast("string").alias("_u")]
          if url_col is not None else []),
        token_count(text_col).cast("double").alias("_v"))
    if url_col is None:
        grouped = keyed_sketch_multi(proj, "_g", [("_v", kll)])
        return {g: (None, sts[0]) for g, sts in grouped.items()}
    grouped = keyed_sketch_multi(proj, "_g",
                                 [("_u", theta or Theta()), ("_v", kll)])
    return {g: (sts[0], sts[1]) for g, sts in grouped.items()}


def grouped_drift_report(df_a: DataFrame, df_b: DataFrame, *,
                         group_col: str = "lang",
                         text_col: str = "text",
                         url_col: Optional[str] = None,
                         theta_k: int = 4096, kll_k: int = 200,
                         quantiles: Sequence[float] = (0.25, 0.5, 0.75),
                         ) -> dict:
    """Per-group snapshot drift: for every group present in EITHER
    snapshot, the URL-set drift (theta algebra with bounds, when
    ``url_col`` given) and the length-distribution drift (two-sample KS
    + quantile shift) — "which languages actually moved", the question
    the global :func:`drift_report` averages away.

    Cost: ONE raw scan per snapshot (keyed co-build), then driver-side
    algebra over ``n_groups`` KB-sized state pairs.  A group absent
    from one side compares against the empty state (distinct 0, KS vs
    an empty CDF = that side's full mass).  Token movers stay global —
    per-group CountSketch matrices would multiply state size by the
    group count for a question :func:`token_drift` answers better on
    the group's slice when it matters.
    """
    theta = Theta(k=theta_k) if url_col is not None else None
    kll = KLL(k=kll_k)
    st_a = grouped_drift_states(df_a, group_col, text_col=text_col,
                                url_col=url_col, theta=theta, kll=kll)
    st_b = grouped_drift_states(df_b, group_col, text_col=text_col,
                                url_col=url_col, theta=theta, kll=kll)
    return _grouped_report(theta, kll, st_a, st_b, quantiles)


def _grouped_entry(theta: Optional[Theta], kll: KLL, th_a, kl_a, th_b,
                   kl_b, quantiles: Sequence[float]) -> dict:
    """One group's report entry — shared by the live and from-states
    grouped paths so the two cannot drift apart."""
    entry: dict = {}
    if theta is not None:
        entry["urls"] = {
            k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in
            url_set_drift_from_states(theta, th_a, th_b).items()}
    length = length_drift_from_states(kll, kl_a, kl_b,
                                      quantiles=quantiles)

    def _q(v, n):
        # an empty side has no quantiles — None, not NaN (keeps the
        # report strict-JSON serializable)
        return None if n == 0 else round(v, 1)

    entry["length"] = {
        "ks_est": round(length["ks_est"], 4),
        "ks_band": length["ks_band"],
        "n_a": length["n_a"], "n_b": length["n_b"],
        "quantile_shift": {str(q): (_q(a, length["n_a"]),
                                    _q(b, length["n_b"]))
                           for q, (a, b)
                           in length["quantile_shift"].items()},
    }
    return entry


def _grouped_report(theta: Optional[Theta], kll: KLL, st_a: Dict,
                    st_b: Dict, quantiles: Sequence[float]) -> dict:
    report: dict = {}
    for g in sorted(set(st_a) | set(st_b), key=lambda x: (x is None,
                                                          str(x))):
        th_a, kl_a = st_a.get(g, (None if theta is None else theta.zero(),
                                  kll.zero()))
        th_b, kl_b = st_b.get(g, (None if theta is None else theta.zero(),
                                  kll.zero()))
        report[str(g)] = _grouped_entry(theta, kll, th_a, kl_a, th_b,
                                        kl_b, quantiles)
    return report


# --------------------------------------------------------------------------
# Persisted drift states: build once per snapshot, diff forever after
# --------------------------------------------------------------------------

# file names inside a drift-state directory; every .bin is a
# self-describing TLV blob (kernels.sketch_from_blob reopens it with
# the right kernel and parameters, no out-of-band schema)
_DRIFT_FILES = {
    "theta": "theta_url.bin",
    "cs": "cs_tokens.bin",
    "mg": "mg_tokens.bin",
    "kll": "kll_toklen.bin",
}
_LANG_FILE = "lang_counts.json"
# grouped tier: <dir>/grouped/gNNNN.{theta,kll}.bin + a manifest mapping
# file stems back to group values (index-named files sidestep every
# group-value-in-filename encoding issue, nulls included)
_GROUPED_DIR = "grouped"
_GROUPED_MANIFEST = "groups.json"


def persist_drift_states(df: DataFrame, out_dir: str, *,
                         text_col: str = "text",
                         url_col: Optional[str] = "url",
                         lang_col: Optional[str] = "lang",
                         group_col: Optional[str] = None,
                         theta_k: int = 4096, mg_k: int = 256,
                         cs_width: int = 8192, cs_depth: int = 7,
                         kll_k: int = 200) -> Dict[str, str]:
    """Build and persist one snapshot's drift states (KB-sized blobs).

    Two later snapshots persisted this way are compared by
    ``jobs/snapshot_diff.py`` with ZERO Spark and ZERO corpus reads —
    the whole report is NumPy algebra over these files.  The builds are
    the exact same canonical builds the live :func:`drift_report` path
    runs, so the persisted-states report is identical to the live one
    (tested).  URL / language sections are skipped when their column is
    absent, mirroring :func:`drift_report`'s graceful degradation.

    ``group_col`` additionally persists the per-group tier (one theta +
    KLL pair per group value, built in ONE extra keyed co-build scan —
    :func:`grouped_drift_states`), so the zero-Spark diff also answers
    "which languages moved".
    """
    import json as _json
    import os as _os

    _os.makedirs(out_dir, exist_ok=True)
    written: Dict[str, str] = {}

    def _dump(name: str, kernel, state) -> None:
        path = _os.path.join(out_dir, _DRIFT_FILES[name])
        with open(path, "wb") as fh:
            fh.write(kernel.serialize(state))
        written[name] = path

    have_url = url_col is not None and url_col in df.columns
    theta = Theta(k=theta_k) if have_url else None
    kll = KLL(k=kll_k)
    th_st, kll_st = _raw_sketch_states(df, kll, text_col, theta,
                                       url_col if have_url else None)
    if have_url:
        _dump("theta", theta, th_st)
    cs = CountSketch(width=cs_width, depth=cs_depth)
    mg = MisraGries(k=mg_k)
    cs_st, mg_st = _token_sketch_states(df, cs, mg, text_col)
    _dump("cs", cs, cs_st)
    _dump("mg", mg, mg_st)
    _dump("kll", kll, kll_st)
    if lang_col is not None and lang_col in df.columns:
        path = _os.path.join(out_dir, _LANG_FILE)
        with open(path, "w") as fh:
            # sorted keys: the persisted snapshot is byte-deterministic
            # regardless of collect() row order
            _json.dump(lang_counts(df, lang_col), fh, sort_keys=True)
        written["lang"] = path
    if group_col is not None and group_col in df.columns:
        gdir = _os.path.join(out_dir, _GROUPED_DIR)
        _os.makedirs(gdir, exist_ok=True)
        grouped = grouped_drift_states(
            df, group_col, text_col=text_col,
            url_col=url_col if have_url else None,
            theta=theta, kll=kll)
        manifest = []
        for i, g in enumerate(sorted(grouped,
                                     key=lambda x: (x is None, str(x)))):
            th_st_g, kll_st_g = grouped[g]
            stem = f"g{i:04d}"
            entry = {"group": g, "kll": f"{stem}.kll.bin"}
            with open(_os.path.join(gdir, entry["kll"]), "wb") as fh:
                fh.write(kll.serialize(kll_st_g))
            if have_url:
                entry["theta"] = f"{stem}.theta.bin"
                with open(_os.path.join(gdir, entry["theta"]),
                          "wb") as fh:
                    fh.write(theta.serialize(th_st_g))
            manifest.append(entry)
        mpath = _os.path.join(gdir, _GROUPED_MANIFEST)
        with open(mpath, "w") as fh:
            _json.dump({"group_col": group_col, "groups": manifest},
                       fh, sort_keys=True)
        written["grouped"] = gdir
    return written


def load_drift_states(state_dir: str) -> Dict[str, object]:
    """Reopen a :func:`persist_drift_states` directory — pure file IO
    plus blob decode, no Spark session.  Returns
    ``{"theta"/"cs"/"mg"/"kll": (kernel, state), "lang": counts}`` with
    optional sections absent when their file is."""
    import json as _json
    import os as _os

    from gopie_spark.kernels import sketch_from_blob

    out: Dict[str, object] = {}
    for name, fname in _DRIFT_FILES.items():
        path = _os.path.join(state_dir, fname)
        if name == "theta" and not _os.path.exists(path):
            continue
        with open(path, "rb") as fh:
            blob = fh.read()
        kernel = sketch_from_blob(blob)   # kind tag -> kernel + params
        out[name] = (kernel, kernel.deserialize(blob))
    lang_path = _os.path.join(state_dir, _LANG_FILE)
    if _os.path.exists(lang_path):
        with open(lang_path) as fh:
            out["lang"] = _json.load(fh)
    mpath = _os.path.join(state_dir, _GROUPED_DIR, _GROUPED_MANIFEST)
    if _os.path.exists(mpath):
        with open(mpath) as fh:
            manifest = _json.load(fh)

        def _open(fname):
            with open(_os.path.join(state_dir, _GROUPED_DIR,
                                    fname), "rb") as fh:
                blob = fh.read()
            kernel = sketch_from_blob(blob)
            return kernel, kernel.deserialize(blob)

        grouped = {}
        for entry in manifest["groups"]:
            grouped[entry["group"]] = {
                "kll": _open(entry["kll"]),
                **({"theta": _open(entry["theta"])}
                   if "theta" in entry else {}),
            }
        out["grouped"] = grouped
        out["group_col"] = manifest["group_col"]
    return out


def drift_report_from_states(states_a: Dict[str, object],
                             states_b: Dict[str, object], *,
                             top: int = 20) -> dict:
    """The :func:`drift_report` twin over two loaded state dicts — no
    DataFrames, no Spark session, no corpus reads.  Raises on
    incompatible kernel parameters (states built with different k /
    width / depth do not align)."""
    def _pair(name: str, *params: str):
        ka, sa = states_a[name]
        kb, sb = states_b[name]
        if type(ka) is not type(kb):
            raise ValueError(f"{name}: kernel kind mismatch "
                             f"({type(ka).__name__} vs {type(kb).__name__})")
        for p in params:
            if getattr(ka, p) != getattr(kb, p):
                raise ValueError(
                    f"{name}: {p} mismatch between snapshots "
                    f"({getattr(ka, p)} vs {getattr(kb, p)})")
        return ka, sa, sb

    urls = None
    if "theta" in states_a and "theta" in states_b:
        theta, st_a, st_b = _pair("theta", "k")
        urls = url_set_drift_from_states(theta, st_a, st_b)
    cs, cs_a, cs_b = _pair("cs", "width", "depth")
    mg, mg_a, mg_b = _pair("mg", "k")
    tokens = token_drift_from_states(cs, cs_a, cs_b, mg, mg_a, mg_b,
                                     top=top)
    kll, kl_a, kl_b = _pair("kll", "k")
    length = length_drift_from_states(kll, kl_a, kl_b)
    langs = None
    if "lang" in states_a and "lang" in states_b:
        langs = lang_share_drift_from_counts(states_a["lang"],
                                             states_b["lang"])
    report = _format_report(urls, tokens, length, langs)
    if "grouped" in states_a and "grouped" in states_b:
        report["groups"] = grouped_drift_report_from_states(
            states_a["grouped"], states_b["grouped"])
    return report


def grouped_drift_report_from_states(grouped_a: Dict, grouped_b: Dict, *,
                                     quantiles: Sequence[float] = (
                                         0.25, 0.5, 0.75)) -> dict:
    """Per-group drift from two loaded ``grouped`` sections (see
    :func:`load_drift_states`) — no Spark, no corpus reads; the same
    :func:`_grouped_entry` shaping as the live grouped report.  Raises
    on kernel-parameter mismatches, like the global from-states path."""
    theta = kll = None
    for side in (grouped_a, grouped_b):
        for entry in side.values():
            k = entry["kll"][0]
            if kll is None:
                kll = k
            elif k.k != kll.k:
                raise ValueError("grouped kll k mismatch "
                                 f"({k.k} vs {kll.k})")
            if "theta" in entry:
                t = entry["theta"][0]
                if theta is None:
                    theta = t
                elif t.k != theta.k:
                    raise ValueError("grouped theta k mismatch "
                                     f"({t.k} vs {theta.k})")
    if kll is None:
        return {}

    def _states(side):
        out = {}
        for g, entry in side.items():
            th = (entry["theta"][1] if "theta" in entry
                  else (None if theta is None else theta.zero()))
            out[g] = (th, entry["kll"][1])
        return out

    return _grouped_report(theta, kll, _states(grouped_a),
                           _states(grouped_b), quantiles)
