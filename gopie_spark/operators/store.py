"""SketchStore — serve analytics from persisted sketch states with ZERO
Spark and ZERO corpus reads.

The build side of this library scans a 100 TB pages table ONCE and
persists KB-sized mergeable states (jobs/build_sketches.py writes
per-lang HLL parquet, sharded Bloom parquet, CMS / sliding-HLL /
windowed-CMS blobs; operators/drift.py persists Theta + CountSketch +
Misra-Gries + KLL + exact lang counts).  This module is the QUERY side:
open that directory and answer the north-star question set —

- distinct urls (global, or any lang subset)   -> HLL register-max merge
- distinct urls since any cutoff               -> sliding-HLL suffix
- token frequency (all time / trailing window) -> CMS / windowed CMS
- heavy-hitter tokens                          -> Misra-Gries topk
- membership "have we crawled these urls?"     -> sharded Bloom probe
- token-length quantiles                       -> KLL
- language histogram                           -> exact persisted counts

Every answer carries its published error bound and read provenance
(which artifact, how many bytes) so a caller can audit that the corpus
was never touched.  All estimate paths are pure file IO + NumPy — the
states are self-describing TLV blobs (kernels.sketch_from_blob), the
keyed tables are read with pyarrow.  The one path that touches a
potentially-large artifact — the sharded Bloom probe (1.25 TB of filter
bits at 10^12 keys / p=0.001) — routes each probed url to its shard with
the LOCAL Spark-parity xxhash64 (kernels/hashes.py:xxh64, pinned
byte-equal to `F.xxhash64`) and reads ONLY the row groups whose shard-id
statistics intersect the probed shards: a point lookup into a TB-scale
filter costs a few MB of IO, no cluster.

The reference has no serving layer (its sketches live in process
memory); this is the production shape the north rule's "answering
distinct-url cardinality, per-lang heavy-hitter token frequencies,
membership tests, text-length quantiles" workload implies once states
are built at 10^12-doc scale: build once on the cluster, answer forever
from the store.
"""
from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow.parquet as pq

from gopie_spark.kernels import sketch_from_blob
from gopie_spark.kernels.hashes import spark_shard_of

META_FILE = "_store_meta.json"
STATE_COL = "sketch_state"

# canonical artifact names (the build_sketches.py output contract)
ART_HLL_LANG = "hll_lang_url"
ART_BLOOM_SHARDS = "bloom_url_shards"
ART_CMS = "cms_tokens.bin"
ART_SLIDING_HLL = "sliding_hll_url.bin"
ART_WINDOW_CMS = "window_cms_tokens.bin"
ART_DRIFT = "drift"


class StoreMiss(KeyError):
    """The store holds no state that can answer this question.  Carries
    the build-side remedy so the caller knows which flag/artifact would
    cover it next build."""

    def __init__(self, what: str, remedy: str):
        super().__init__(what)
        self.what = what
        self.remedy = remedy

    def __str__(self) -> str:  # pragma: no cover - cosmetic
        return f"{self.what} (build with {self.remedy})"


@dataclass
class Answer:
    """One served answer: the estimate, its published bound, and read
    provenance (artifact + bytes) for a zero-corpus-access audit."""

    value: object
    kind: str
    source: str
    bytes_read: int
    bound: Optional[float] = None
    bound_kind: Optional[str] = None
    states_merged: int = 1
    detail: Dict = field(default_factory=dict)

    def to_json(self) -> Dict:
        v = self.value
        if isinstance(v, np.generic):
            v = v.item()
        elif isinstance(v, np.ndarray):
            v = v.tolist()
        return {
            "value": v, "kind": self.kind, "source": self.source,
            "bytes_read": int(self.bytes_read), "bound": self.bound,
            "bound_kind": self.bound_kind,
            "states_merged": int(self.states_merged),
            **({"detail": self.detail} if self.detail else {}),
        }


def write_store_bin(store_dir: str, name: str, kernel, state) -> str:
    """Persist one global sketch state as a self-describing blob under
    the store directory; returns the artifact's relative name."""
    os.makedirs(store_dir, exist_ok=True)
    path = os.path.join(store_dir, name)
    with open(path, "wb") as fh:
        fh.write(kernel.serialize(state))
    return name


def update_store_meta(store_dir: str, **fields) -> Dict:
    """Merge ``fields`` into the store's ``_store_meta.json`` (created
    if absent); atomic replace so a killed build never leaves a torn
    meta file.  Returns the merged meta."""
    os.makedirs(store_dir, exist_ok=True)
    path = os.path.join(store_dir, META_FILE)
    meta: Dict = {}
    if os.path.exists(path):
        with open(path) as fh:
            meta = json.load(fh)
    meta.update(fields)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh, sort_keys=True)
    os.replace(tmp, path)
    return meta


class SketchStore:
    """Read-only view over a persisted sketch directory.

    Artifacts are opened lazily and cached; missing artifacts raise
    :class:`StoreMiss` naming the build flag that would produce them.
    No method here creates a SparkSession or reads the corpus.
    """

    def __init__(self, path: str):
        if not os.path.isdir(path):
            raise FileNotFoundError(f"no sketch store at {path}")
        self.path = path
        meta_path = os.path.join(path, META_FILE)
        self.meta: Dict = {}
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                self.meta = json.load(fh)
        self._bin_cache: Dict[str, tuple] = {}
        self._hll_cache: Optional[Dict[str, bytes]] = None

    # -- artifact access ---------------------------------------------------

    def _art(self, name: str) -> str:
        return os.path.join(self.path, name)

    def has(self, name: str) -> bool:
        return os.path.exists(self._art(name))

    def coverage(self) -> Dict[str, Dict]:
        """What the store can answer: artifact -> {present, bytes}."""
        out = {}
        for name in (ART_HLL_LANG, ART_BLOOM_SHARDS, ART_CMS,
                     ART_SLIDING_HLL, ART_WINDOW_CMS, ART_DRIFT):
            p = self._art(name)
            if os.path.isdir(p):
                size = sum(os.path.getsize(os.path.join(dp, f))
                           for dp, _, fs in os.walk(p) for f in fs)
            elif os.path.exists(p):
                size = os.path.getsize(p)
            else:
                out[name] = {"present": False}
                continue
            out[name] = {"present": True, "bytes": int(size)}
        return out

    def _bin(self, name: str, remedy: str):
        """(kernel, state, nbytes) for a blob artifact."""
        if name in self._bin_cache:
            return self._bin_cache[name]
        p = self._art(name)
        if not os.path.exists(p):
            raise StoreMiss(name, remedy)
        with open(p, "rb") as fh:
            blob = fh.read()
        kernel = sketch_from_blob(blob)
        got = (kernel, kernel.deserialize(blob), len(blob))
        self._bin_cache[name] = got
        return got

    def _hll_states(self) -> Dict[str, bytes]:
        """lang -> serialized HLL state, from the per-lang parquet."""
        if self._hll_cache is None:
            p = self._art(ART_HLL_LANG)
            if not os.path.isdir(p):
                raise StoreMiss(ART_HLL_LANG, "jobs/build_sketches.py")
            t = pq.read_table(p)
            key_col = self.meta.get("hll_key_col", "lang")
            keys = t.column(key_col).to_pylist()
            blobs = t.column(STATE_COL).to_pylist()
            self._hll_cache = dict(zip(keys, (bytes(b) for b in blobs)))
        return self._hll_cache

    # -- distinct counts ---------------------------------------------------

    def langs(self) -> List[str]:
        return sorted(self._hll_states())

    def distinct_urls(self, langs: Optional[Sequence[str]] = None) -> Answer:
        """Approximate distinct urls over all langs (default) or any
        lang subset — a register-max merge of the persisted per-lang
        states; relative error within 3 * 1.04/sqrt(m) (3-sigma).

        This is the mergeable-sketch payoff: ANY subset rollup from the
        same one-scan build, no second corpus pass."""
        states = self._hll_states()
        if langs is None:
            langs = sorted(states)
        unknown = [l for l in langs if l not in states]
        if unknown:
            raise KeyError(f"langs not in store: {unknown}; "
                           f"have {sorted(states)}")
        if not langs:
            raise ValueError("empty lang subset")
        kernel = sketch_from_blob(states[langs[0]])
        merged = kernel.deserialize(states[langs[0]])
        nbytes = len(states[langs[0]])
        for lang in langs[1:]:
            merged = kernel.merge(merged, kernel.deserialize(states[lang]))
            nbytes += len(states[lang])
        return Answer(value=int(kernel.count(merged)), kind="hll",
                      source=ART_HLL_LANG, bytes_read=nbytes,
                      bound=3 * kernel.std_err, bound_kind="relative_3sigma",
                      states_merged=len(langs),
                      detail={"langs": list(langs)})

    def distinct_urls_since(self, cutoff_epoch: float) -> Answer:
        """Approximate distinct urls with event time >= cutoff — the
        sliding-HLL suffix query (any cutoff, one persisted state)."""
        kernel, state, nbytes = self._bin(
            ART_SLIDING_HLL, "jobs/build_sketches.py --time-windows")
        return Answer(value=int(kernel.count(state, cutoff=cutoff_epoch)),
                      kind="sliding_hll", source=ART_SLIDING_HLL,
                      bytes_read=nbytes, bound=3 * kernel.std_err,
                      bound_kind="relative_3sigma",
                      detail={"cutoff_epoch": float(cutoff_epoch)})

    # -- token frequencies -------------------------------------------------

    def token_freq(self, tokens: Sequence[str],
                   window_ticks: Optional[int] = None,
                   at_tick: Optional[int] = None) -> Answer:
        """Token frequency estimates.  All-time (CMS: overcount <=
        eps*N at confidence delta) or over a trailing tick window
        ``(at_tick - window_ticks, at_tick]`` (windowed CMS: same bound
        with N = that window's mass; ``at_tick`` None = newest tick)."""
        tokens = list(tokens)
        if window_ticks is None:
            kernel, state, nbytes = self._bin(
                ART_CMS, "jobs/build_sketches.py")
            est = kernel.estimate(state, tokens)
            n = kernel.count(state)
            src = ART_CMS
            kind = "cms"
            detail = {}
        else:
            kernel, state, nbytes = self._bin(
                ART_WINDOW_CMS, "jobs/build_sketches.py --time-windows")
            est = kernel.estimate(state, tokens, window_ticks=window_ticks,
                                  at_tick=at_tick)
            n = kernel.window_total(state, window_ticks=window_ticks,
                                    at_tick=at_tick)
            src = ART_WINDOW_CMS
            kind = "window_cms"
            detail = {"window_ticks": int(window_ticks)}
        return Answer(value={t: int(e) for t, e in zip(tokens, est)},
                      kind=kind, source=src, bytes_read=nbytes,
                      bound=float(kernel.epsilon) * float(n),
                      bound_kind="additive_overcount",
                      detail={"total_mass": int(n),
                              "delta": float(kernel.delta), **detail})

    def top_tokens(self, k: Optional[int] = None,
                   refine: bool = False) -> Answer:
        """Heavy-hitter tokens from the drift Misra-Gries state, with
        its deterministic undercount bound.

        ``refine=True`` composes the two persisted frequency states the
        way the drift tier does: Misra-Gries supplies the CANDIDATE set
        (any token above n/k is guaranteed retained), the linear
        CountSketch supplies UNBIASED estimates for those candidates
        (MG's counts undercount by up to its error bound; CS is
        two-sided ±3·sqrt(F2/w)).  Candidates are re-ranked by the CS
        estimate."""
        kernel, state, nbytes = self._bin(
            os.path.join(ART_DRIFT, "mg_tokens.bin"),
            "jobs/build_sketches.py --drift-states")
        items, counts = kernel.topk(state, n=None if refine else k)
        if not refine:
            return Answer(value={str(t): int(c)
                                 for t, c in zip(items, counts)},
                          kind="misra_gries",
                          source=f"{ART_DRIFT}/mg_tokens.bin",
                          bytes_read=nbytes,
                          bound=float(kernel.error_bound(state)),
                          bound_kind="additive_undercount")
        cs, cs_state, cs_bytes = self._bin(
            os.path.join(ART_DRIFT, "cs_tokens.bin"),
            "jobs/build_sketches.py --drift-states")
        cand = [str(t) for t in items]
        if cand:
            est = cs.estimate(cs_state, cand)
            order = np.lexsort((np.asarray(cand), -est))
            if k is not None:
                order = order[:k]
            value = {cand[i]: float(est[i]) for i in order}
        else:
            value = {}
        return Answer(value=value, kind="mg_candidates+countsketch",
                      source=f"{ART_DRIFT}/mg_tokens.bin"
                             f"+{ART_DRIFT}/cs_tokens.bin",
                      bytes_read=nbytes + cs_bytes, states_merged=2,
                      bound=float(cs.error_bound(cs.f2_estimate(cs_state))),
                      bound_kind="two_sided_3sigma")

    # -- quantiles / histograms ---------------------------------------------

    def token_length_quantiles(self, qs: Sequence[float]) -> Answer:
        """Doc token-length quantiles from the drift KLL state (rank
        error <= eps_k at each q)."""
        kernel, state, nbytes = self._bin(
            os.path.join(ART_DRIFT, "kll_toklen.bin"),
            "jobs/build_sketches.py --drift-states")
        vals = kernel.quantile(state, list(qs))
        return Answer(value={float(q): float(v)
                             for q, v in zip(qs, np.atleast_1d(vals))},
                      kind="kll", source=f"{ART_DRIFT}/kll_toklen.bin",
                      bytes_read=nbytes,
                      bound=_kll_rank_eps(kernel), bound_kind="rank_error")

    def lang_histogram(self) -> Answer:
        """Exact per-lang doc counts (persisted by the drift tier)."""
        p = self._art(os.path.join(ART_DRIFT, "lang_counts.json"))
        if not os.path.exists(p):
            raise StoreMiss("drift/lang_counts.json",
                            "jobs/build_sketches.py --drift-states")
        with open(p) as fh:
            counts = json.load(fh)
        return Answer(value=counts, kind="exact",
                      source=f"{ART_DRIFT}/lang_counts.json",
                      bytes_read=os.path.getsize(p), bound=0.0,
                      bound_kind="exact")

    # -- membership ----------------------------------------------------------

    def maybe_contains_urls(self, urls: Sequence[str]) -> Answer:
        """Probe the sharded Bloom filters: False is definitive ("never
        crawled"), True is "maybe" at the per-shard FPR.

        Scale path: each url routes to its shard with the LOCAL
        Spark-parity xxhash64 — the exact rule `bloom_shards_build`
        shuffled on — and only row groups whose `bloom_shard` statistics
        intersect the probed shard ids are read (pyarrow predicate
        pushdown over parquet min/max).  At 10^12 keys the full shard
        table is ~TB; a point probe reads the few shard states it needs.
        """
        p = self._art(ART_BLOOM_SHARDS)
        if not os.path.isdir(p):
            raise StoreMiss(ART_BLOOM_SHARDS, "jobs/build_sketches.py")
        shards = self.meta.get("bloom_shards")
        if shards is None:
            raise ValueError(
                f"store has no 'bloom_shards' in {META_FILE}; the shard "
                "count is required to route probes (rebuild with "
                "jobs/build_sketches.py, which records it)")
        urls = list(urls)
        sid = spark_shard_of(urls, int(shards))
        want = sorted(set(sid.tolist()))
        t = pq.read_table(p, filters=[("bloom_shard", "in", want)])
        got_ids = np.asarray(t.column("bloom_shard"))
        blobs = t.column(STATE_COL).to_pylist()
        by_shard = {int(s): bytes(b) for s, b in zip(got_ids, blobs)}
        out = np.zeros(len(urls), dtype=bool)
        fpr = 0.0
        for s in want:
            blob = by_shard.get(int(s))
            if blob is None:
                continue  # shard never saw a key -> all probes absent
            kernel = sketch_from_blob(blob)
            state = kernel.deserialize(blob)
            mask = sid == s
            vals = [urls[i] for i in np.nonzero(mask)[0]]
            out[mask] = kernel.exist(state, vals)
            if hasattr(kernel, "false_positive"):
                fpr = max(fpr, float(kernel.false_positive(state)))
        return Answer(value={u: bool(b) for u, b in zip(urls, out)},
                      kind="bloom_shards", source=ART_BLOOM_SHARDS,
                      bytes_read=int(t.nbytes),
                      bound=fpr, bound_kind="false_positive_rate",
                      states_merged=len(by_shard),
                      detail={"shards_probed": len(want),
                              "shards_total": int(shards)})


def _merge_blobs(blob_a: bytes, blob_b: bytes) -> bytes:
    """Merge two self-describing state blobs (kind + params must match —
    the kernels refuse mismatched geometries with ValueError)."""
    kernel = sketch_from_blob(blob_a)
    merged = kernel.merge(kernel.deserialize(blob_a),
                          kernel.deserialize(blob_b))
    return kernel.serialize(merged)


def merge_stores(a_dir: str, b_dir: str, out_dir: str) -> Dict:
    """Merge two sketch stores into one — ZERO Spark, ZERO corpus reads.

    The incremental-crawl shape at the artifact level: build day-2's
    store from day-2's pages only, then fold it into the serving store
    here; day-1 data is never rescanned.  Merge semantics per artifact:

    - per-lang HLL cells: register-max per lang; a lang present on one
      side only passes through (zero state is the identity)
    - sharded Bloom: bit-OR per shard; one-sided shards pass through
      (each blob is self-describing, so mixed fills probe correctly);
      the meta shard COUNT must match or the routing would be wrong
      (refused), and same-shard geometry mismatches are refused by the
      kernel — build both stores with the same sizing to merge
    - CMS / windowed-CMS: counter add — LINEAR, so the merged sketch is
      byte-identical to one built over the union corpus
    - sliding HLL: frontier union (idempotent lattice, byte-identical)
    - drift Theta / CountSketch: min-k union / counter add
    - drift Misra-Gries / KLL: valid merged states with the published
      bounds, but NOT byte-equal to a from-scratch union build (their
      compaction points depend on the split) — documented, tested
    - lang counts: exact integer add

    An artifact present on only ONE side is DROPPED from the merged
    store (a one-sided state is not a truthful state of the union) and
    reported; `rows` in the merged meta is the sum, while `bloom_n`
    keeps the shared shard sizing (geometry is unchanged by a bit-OR
    merge, and mismatched geometries are refused per shard).

    Returns a report dict: {artifact: "merged"|"dropped_one_sided"|
    "absent"}.
    """
    sa, sb = SketchStore(a_dir), SketchStore(b_dir)
    os.makedirs(out_dir, exist_ok=True)
    report: Dict[str, str] = {}

    # keyed HLL cells ------------------------------------------------------
    if sa.has(ART_HLL_LANG) and sb.has(ART_HLL_LANG):
        av, bv = sa._hll_states(), sb._hll_states()
        merged = {}
        for lang in sorted(set(av) | set(bv)):
            if lang in av and lang in bv:
                merged[lang] = _merge_blobs(av[lang], bv[lang])
            else:
                merged[lang] = av.get(lang) or bv[lang]
        import pyarrow as pa
        key_col = sa.meta.get("hll_key_col", "lang")
        t = pa.table({key_col: list(merged),
                      STATE_COL: list(merged.values())})
        os.makedirs(os.path.join(out_dir, ART_HLL_LANG), exist_ok=True)
        pq.write_table(t, os.path.join(out_dir, ART_HLL_LANG,
                                       "part-00000.parquet"))
        report[ART_HLL_LANG] = "merged"
    else:
        report[ART_HLL_LANG] = ("absent" if not (sa.has(ART_HLL_LANG)
                                                 or sb.has(ART_HLL_LANG))
                                else "dropped_one_sided")

    # sharded Bloom --------------------------------------------------------
    if sa.has(ART_BLOOM_SHARDS) and sb.has(ART_BLOOM_SHARDS):
        na = sa.meta.get("bloom_shards")
        nb = sb.meta.get("bloom_shards")
        if na != nb:
            raise ValueError(
                f"bloom shard counts differ ({na} vs {nb}); probes would "
                "route wrong — rebuild with matching sizing to merge")
        import pyarrow as pa
        pa_a, pa_b = sa._art(ART_BLOOM_SHARDS), sb._art(ART_BLOOM_SHARDS)
        ids_a = set(pq.read_table(pa_a, columns=["bloom_shard"])
                    .column(0).to_pylist())
        ids_b = set(pq.read_table(pa_b, columns=["bloom_shard"])
                    .column(0).to_pylist())

        def _shard_blob(path, shard):
            t = pq.read_table(path,
                              filters=[("bloom_shard", "=", shard)])
            return bytes(t.column(STATE_COL)[0].as_py())

        # shard-by-shard: memory stays O(one shard state) — at 10^12
        # keys a shard blob is GBs, the full table is TBs — and each
        # write_table call emits ONE ROW GROUP PER SHARD, so the point
        # probe's row-group pruning survives the merge
        os.makedirs(os.path.join(out_dir, ART_BLOOM_SHARDS), exist_ok=True)
        schema = pa.schema([("bloom_shard", pa.int64()),
                            (STATE_COL, pa.binary())])
        dest = os.path.join(out_dir, ART_BLOOM_SHARDS,
                            "part-00000.parquet")
        with pq.ParquetWriter(dest, schema) as writer:
            for shard in sorted(ids_a | ids_b):
                if shard in ids_a and shard in ids_b:
                    blob = _merge_blobs(_shard_blob(pa_a, shard),
                                        _shard_blob(pa_b, shard))
                elif shard in ids_a:
                    blob = _shard_blob(pa_a, shard)
                else:
                    blob = _shard_blob(pa_b, shard)
                writer.write_table(pa.table(
                    {"bloom_shard": [int(shard)], STATE_COL: [blob]},
                    schema=schema))
        report[ART_BLOOM_SHARDS] = "merged"
    else:
        report[ART_BLOOM_SHARDS] = (
            "absent" if not (sa.has(ART_BLOOM_SHARDS)
                             or sb.has(ART_BLOOM_SHARDS))
            else "dropped_one_sided")

    # global blob artifacts --------------------------------------------------
    drift_bins = [os.path.join(ART_DRIFT, f) for f in
                  ("theta_url.bin", "cs_tokens.bin", "mg_tokens.bin",
                   "kll_toklen.bin")]
    for name in [ART_CMS, ART_SLIDING_HLL, ART_WINDOW_CMS] + drift_bins:
        ina, inb = sa.has(name), sb.has(name)
        if ina and inb:
            with open(sa._art(name), "rb") as fh:
                blob_a = fh.read()
            with open(sb._art(name), "rb") as fh:
                blob_b = fh.read()
            path = os.path.join(out_dir, name)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "wb") as fh:
                fh.write(_merge_blobs(blob_a, blob_b))
            report[name] = "merged"
        else:
            report[name] = ("absent" if not (ina or inb)
                            else "dropped_one_sided")

    # exact lang counts -------------------------------------------------------
    lc = os.path.join(ART_DRIFT, "lang_counts.json")
    if sa.has(lc) and sb.has(lc):
        with open(sa._art(lc)) as fh:
            ca = json.load(fh)
        with open(sb._art(lc)) as fh:
            cb = json.load(fh)
        merged_counts = {k: ca.get(k, 0) + cb.get(k, 0)
                         for k in sorted(set(ca) | set(cb))}
        os.makedirs(os.path.join(out_dir, ART_DRIFT), exist_ok=True)
        with open(os.path.join(out_dir, lc), "w") as fh:
            json.dump(merged_counts, fh, sort_keys=True)
        report[lc] = "merged"
    else:
        report[lc] = ("absent" if not (sa.has(lc) or sb.has(lc))
                      else "dropped_one_sided")

    # grouped drift tier (per-group theta/KLL + manifest) -------------------
    gdir = os.path.join(ART_DRIFT, "grouped")
    gman = os.path.join(gdir, "groups.json")
    if sa.has(gman) and sb.has(gman):
        with open(sa._art(gman)) as fh:
            ma = json.load(fh)
        with open(sb._art(gman)) as fh:
            mb = json.load(fh)
        if ma["group_col"] != mb["group_col"]:
            raise ValueError(
                f"grouped drift group_col differs ({ma['group_col']} vs "
                f"{mb['group_col']}); cannot merge")
        ga = {e["group"]: e for e in ma["groups"]}
        gb = {e["group"]: e for e in mb["groups"]}

        def _gblob(store, entry, kind):
            if entry is None or kind not in entry:
                return None
            with open(store._art(os.path.join(gdir, entry[kind])),
                      "rb") as fh:
                return fh.read()

        os.makedirs(os.path.join(out_dir, gdir), exist_ok=True)
        manifest = []
        for i, g in enumerate(sorted(set(ga) | set(gb),
                                     key=lambda x: (x is None, str(x)))):
            stem = f"g{i:04d}"
            entry = {"group": g}
            for kind in ("kll", "theta"):
                blob_a = _gblob(sa, ga.get(g), kind)
                blob_b = _gblob(sb, gb.get(g), kind)
                if blob_a is None and blob_b is None:
                    continue
                # a group on one side only IS the truthful union state
                # for that group (the other side had no such rows)
                blob = (_merge_blobs(blob_a, blob_b)
                        if blob_a and blob_b else (blob_a or blob_b))
                entry[kind] = f"{stem}.{kind}.bin"
                with open(os.path.join(out_dir, gdir, entry[kind]),
                          "wb") as fh:
                    fh.write(blob)
            manifest.append(entry)
        with open(os.path.join(out_dir, gman), "w") as fh:
            json.dump({"group_col": ma["group_col"], "groups": manifest},
                      fh, sort_keys=True)
        report[gman] = "merged"
    else:
        report[gman] = ("absent" if not (sa.has(gman) or sb.has(gman))
                        else "dropped_one_sided")

    meta = dict(sa.meta)
    for key in ("rows", "bloom_n"):
        ina, inb = key in sa.meta, key in sb.meta
        if ina and inb:
            if key == "bloom_n":
                # bloom_n describes the shard GEOMETRY (from_guess
                # sizing), which a bit-OR merge leaves unchanged — and
                # mismatched-geometry shard blobs are refused by the
                # kernel above, so both sides necessarily share one
                # sizing.  Summing here would make the meta derive the
                # wrong per-shard filter on the next probe.
                meta[key] = max(sa.meta[key], sb.meta[key])
            else:
                meta[key] = sa.meta[key] + sb.meta[key]
        elif ina or inb:
            # a one-sided count would misdescribe the union — drop it
            meta.pop(key, None)
            report[f"meta:{key}"] = "dropped_one_sided"
    update_store_meta(out_dir, **meta)
    return report


def _kll_rank_eps(kernel) -> float:
    """KLL's rank-error constant for k (Karnin-Lang-Liberty 2016:
    eps ~ 2.296/k at 99% confidence for the k-compactor variant)."""
    return 2.296 / float(getattr(kernel, "k", 200))
