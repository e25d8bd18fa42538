"""Deduplication operators for web-scale training-data pipelines.

Four tiers, all designed so the expensive comparison work happens on
*candidate pairs* produced by a cheap blocking stage — the only strategy
that survives 10^12 documents:

- :func:`exact_dedup` — content-hash groupBy (one shuffle on the digest).
- :func:`minhash_lsh_candidates` / :func:`minhash_lsh_dedup` — MinHash
  signatures (vectorized kernel) + banded LSH blocking: docs sharing any
  band bucket become candidates; candidates are verified by estimated
  Jaccard from full signatures.  All post-signature work is JVM-side
  (split/hash/join/zip_with), no Python in the join path.
- :func:`simhash_candidates` / :func:`simhash_dedup` — 64-bit SimHash
  fingerprints; banding the fingerprint into 4 x 16-bit chunks guarantees
  recall for Hamming distance <= 3 (pigeonhole); verification =
  ``bit_count(a XOR b)`` in whole-stage codegen.
- :func:`ngram_jaccard_pairs` — exact shingle-join Jaccard (quadratic in
  shared-shingle frequency; the *oracle* for the approximate tiers, also
  usable directly on small blocks).

Skew note: hot shingles/bands (boilerplate) explode self-joins; both LSH
paths cap bucket width (``max_bucket``; :func:`bucket_cap_stats` reports
how many buckets the cap touched) — at 100 TB you always cap, because a
single viral boilerplate bucket otherwise produces O(n^2) pairs in one
task.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import numpy as np
import pandas as pd

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from gopie_spark.kernels.minhash import MinHash, SimHash
from gopie_spark.kernels.hashes import fnv1_64_values


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def content_digest(text_col: str = "text", normalize: bool = True):
    """The repo's ONE content-digest rule (md5 of whitespace-collapsed
    lowercased text) — exact_dedup, duplicate stats, and the theta
    novelty pre-flight all key on it."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return F.md5(norm if normalize else F.col(text_col))


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", normalize: bool = True,
                keep: str = "min") -> DataFrame:
    """Exact dedup by content digest: keeps one representative per digest
    (the min/max id — deterministic).

    Plan: ``groupBy(digest).agg(min(struct(id, row...)))`` — the struct
    min orders on its leading field, so the representative is the min/max
    id.  Unlike a ``row_number`` window this is *partially aggregable*:
    Catalyst's map-side HashAggregate collapses each partition's
    duplicates before the shuffle, so at 10^12 docs the shuffle carries
    ~one row per distinct digest per partition instead of every row plus
    a per-partition sort.  Digests are uniform so no skew handling
    needed.

    Null safety: a null ``text_col`` yields a null digest, and a plain
    groupBy would collapse EVERY null-text row into one group — silently
    deleting all but one of them on a dirty crawl.  Null-text rows are
    given a per-id sentinel digest instead (single pass, no extra scan),
    so each survives as its own group; quarantine them upstream
    (sources/quality.py) if they should not reach dedup at all."""
    fp = content_digest(text_col, normalize)
    fp = F.coalesce(fp, F.concat(F.lit("\x00null:"),
                                 F.col(id_col).cast("string")))
    cols = df.columns
    others = [c for c in cols if c != id_col]
    rep = F.struct(F.col(id_col), *[F.col(c) for c in others])
    agg = F.min(rep) if keep == "min" else F.max(rep)
    return (df.withColumn("_fp", fp)
            .groupBy("_fp").agg(agg.alias("_rep"))
            .select([F.col(f"_rep.{c}").alias(c) for c in cols]))


def duplicate_stats(df: DataFrame, text_col: str = "text",
                    by: Optional[str] = None) -> DataFrame:
    """(group?, n_docs, n_unique) by normalized content digest —
    SQL-expressible, used as a driver-oracle query."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    keys = [by] if by else []
    return (df.withColumn("_fp", F.md5(norm))
            .groupBy(*keys)
            .agg(F.count("*").alias("n_docs"),
                 F.countDistinct("_fp").alias("n_unique")))


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def _widen(df: DataFrame) -> DataFrame:
    """Repartition up to the session's parallelism when the source has too
    few partitions for a CPU-heavy per-row stage.  Small/single-file inputs
    otherwise serialize the whole signature build into one task; at real
    scale (many input splits) this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _flat_token_hashes(texts: pd.Series):
    """Whitespace-tokenize a batch and FNV-hash every token with NO
    per-document Python: one Arrow split per batch (C++), one vectorized
    FNV pass over the flattened tokens.  Returns (flat uint64 hashes of
    the non-empty tokens, per-doc non-empty token counts) — identical
    token multisets to ``str.split()`` semantics."""
    import pyarrow as pa
    import pyarrow.compute as pc
    arr = pa.Array.from_pandas(texts.fillna(""))
    tok = pc.split_pattern_regex(arr, r"\s+")
    flat = pc.list_flatten(tok)
    lens = pc.list_value_length(tok).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    hashes = fnv1_64_values(flat)[nonempty]
    doc_of = np.repeat(np.arange(len(texts)), lens)
    ne_lens = np.bincount(doc_of[nonempty], minlength=len(texts)) \
        .astype(np.int64)
    return hashes, ne_lens


def add_minhash_signatures(df: DataFrame, text_col: str = "text",
                           k: int = 128, shingle_width: int = 3,
                           out_col: str = "minhash") -> DataFrame:
    """Add an ``array<bigint>`` MinHash signature column (uint64 slots
    viewed as int64).  The whole chain — tokenize, shingle-hash (rolling
    polynomial over token hashes, kernels.minhash.shingle_hashes_flat),
    k-permutation minima — is vectorized across the batch with no
    per-document Python loop."""
    from gopie_spark.kernels.minhash import shingle_hashes_flat
    mh = MinHash(k=k)
    schema = StructType(df.schema.fields +
                        [StructField(out_col, ArrayType(LongType()), False)])
    # the (total_shingles x k) mixed-hash intermediate must stay ~100 MB:
    # ~150 shingles/doc x k x 8 B => chunk of ~1k docs at k=128
    chunk_rows = max(64, (1 << 27) // (max(k, 1) * 8 * 150))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                yield pdf.assign(**{out_col: pd.Series([], dtype=object)})
                continue
            for lo in range(0, len(pdf), chunk_rows):
                chunk = pdf.iloc[lo:lo + chunk_rows]
                tok_h, tok_lens = _flat_token_hashes(chunk[text_col])
                sh_h, sh_lens = shingle_hashes_flat(tok_h, tok_lens,
                                                    shingle_width)
                sigs = mh.batch_signatures_flat(sh_h, sh_lens) \
                    .astype(np.int64)
                out = chunk.copy()
                out[out_col] = list(sigs)
                yield out

    return _widen(df).mapInPandas(fn, schema)


def _bucket_members(exploded: DataFrame, bucket_cols: List[str],
                    max_bucket: int, agg_salts: int = 16) -> DataFrame:
    """DataFrame[bucket_cols..., _ids] — per bucket, the globally
    smallest ``max_bucket`` member ids, collected through the same
    two-level salted capped aggregation as :func:`_bucket_pairs` (no
    aggregation buffer ever holds a viral bucket whole)."""
    salt = F.pmod(F.xxhash64(F.col("_id")), F.lit(agg_salts))
    lvl1 = (exploded.withColumn("_salt", salt)
            .groupBy(*bucket_cols, "_salt")
            .agg(F.slice(F.array_sort(F.collect_set("_id")), 1, max_bucket)
                 .alias("_part")))
    ids = F.slice(F.array_sort(F.flatten(F.collect_list("_part"))),
                  1, max_bucket)
    return lvl1.groupBy(*bucket_cols).agg(ids.alias("_ids"))


def _bucket_pairs(exploded: DataFrame, bucket_cols: List[str],
                  max_bucket: int, agg_salts: int = 16) -> DataFrame:
    """(id_a, id_b) candidate pairs from bucket membership.

    Two-level capped collection, then JVM-side pair expansion inside the
    array (``transform`` x ``transform`` -> flatten -> explode), so
    bucket *work* is bounded by ``max_bucket^2`` regardless of how viral
    a boilerplate bucket gets.  The cap itself is applied in two salted
    levels so no aggregation buffer ever holds a viral bucket whole:

    - level 1 groups by (bucket, xxhash64(id) % agg_salts) and keeps the
      ``max_bucket`` smallest ids per salt — a bucket of M ids costs at
      most M/agg_salts ids in any one buffer (a single-level
      ``collect_set`` would buffer all M before capping);
    - level 2 merges the per-salt survivors (<= agg_salts x max_bucket
      ids, trivially bounded) and re-caps to the global ``max_bucket``
      smallest.

    Because every id in the global smallest-``max_bucket`` set survives
    its own salt's level-1 cap, the result is byte-identical to the
    single-level ``slice(array_sort(collect_set))`` plan.  The extra
    shuffle only carries capped arrays (<= buckets x agg_salts rows).
    Pairs from different buckets dedupe with one final ``distinct``."""
    buckets = _bucket_members(exploded, bucket_cols, max_bucket,
                              agg_salts).filter(F.size("_ids") >= 2)
    pair_structs = F.flatten(F.transform(
        F.col("_ids"),
        lambda x, i: F.transform(
            F.slice(F.col("_ids"), i + 2,
                    F.greatest(F.size("_ids") - i - 1, F.lit(0))),
            lambda y: F.struct(x.alias("id_a"), y.alias("id_b")))))
    return (buckets.select(F.explode(pair_structs).alias("p"))
            .select(F.col("p.id_a").alias("id_a"),
                    F.col("p.id_b").alias("id_b"))
            .distinct())


def _merge_capped_members(base_hit: DataFrame, fresh_members: DataFrame,
                          bucket_cols: List[str],
                          max_bucket: int) -> DataFrame:
    """Full-outer merge of two capped member relations, re-capped.
    ``slice(array_sort(distinct(a ++ b)), 1, cap)`` is associative with
    :func:`_bucket_members`' own cap (both keep the cap smallest ids),
    so a persisted base merged with a fresh delta equals a from-scratch
    build over base+delta inputs (tested for both index kinds)."""
    empty = F.array().cast(base_hit.schema["_ids"].dataType)
    cap_merge = F.slice(
        F.array_sort(F.array_distinct(F.concat(
            F.coalesce(F.col("b._ids"), empty),
            F.coalesce(F.col("f._ids"), empty)))),
        1, max_bucket).alias("_ids")
    return (base_hit.alias("b")
            .join(fresh_members.alias("f"), list(bucket_cols),
                  "full_outer")
            .select(*bucket_cols, cap_merge))


def _check_batch_label(label: str) -> str:
    """Refuse ``store_partition`` labels that Spark partition-type
    inference would re-type and read back under a DIFFERENT string
    (e.g. ``'2026-8-1'`` -> date ``2026-08-01``, ``'007'`` -> int
    ``7``): every covered/delta/own-batch comparison in the
    incremental stores is a string compare against the label, so a
    non-round-tripping label would silently turn idempotent re-runs
    into data loss (the own partition fails its exclusion and vetoes
    the batch's keys)."""
    import datetime
    import re
    if not isinstance(label, str) \
            or not re.fullmatch(r"[A-Za-z0-9._-]+", label):
        raise ValueError(
            f"store_partition {label!r} must be a non-empty "
            "[A-Za-z0-9._-]+ string")
    if re.fullmatch(r"-?\d+", label):
        # canonical integers round-trip ('7' -> int 7 -> '7');
        # non-canonical ones do not ('007' -> int 7 -> '7', verified
        # empirically in test_pk_index)
        if str(int(label)) != label:
            raise ValueError(
                f"store_partition {label!r} would be read back as the "
                f"integer {int(label)} by partition-type inference — "
                "use a label that round-trips (no leading zeros / "
                "leading '-')")
    else:
        # anything Python can parse as a float is fair game for the
        # numeric inference tiers ('1.50' -> double 1.5, '2e3' ->
        # decimal 2000 — both verified empirically); non-canonical
        # forms read back different, so refuse the whole class
        try:
            float(label)
        except ValueError:
            pass  # e.g. 'v1.2.3', '1-2-3-4' — stay strings
        else:
            raise ValueError(
                f"store_partition {label!r} parses as a number — "
                "partition-type inference may re-type it; use a "
                "non-numeric or canonical-integer label")
        if re.fullmatch(r"\d{4,6}-\d{1,2}(-\d{1,2})?", label):
            # conservative cross-version stance: this Spark's partition
            # inference only date-types the strict yyyy-MM-dd form
            # (which round-trips), but lenient date casts exist
            # elsewhere in the engine — require the canonical form
            parts = [int(p) for p in label.split("-")]
            while len(parts) < 3:
                parts.append(1)
            try:
                d = datetime.date(*parts)
            except ValueError:
                d = None  # month/day out of range -> stays a string
            if d is not None and d.isoformat() != label:
                raise ValueError(
                    f"store_partition {label!r} is a non-canonical "
                    f"date form (reads as {d.isoformat()} under a "
                    "lenient date cast) — use yyyy-mm-dd")
    return label


def _list_batch_partitions(spark, store_path: str) -> List[str]:
    """The store's ``batch=`` partition labels from an O(#partitions)
    directory listing (Hadoop FS — file://, hdfs://, s3a:// alike)
    instead of a full-store DISTINCT scan: partition discovery over a
    10^12-row store must not cost a corpus-wide job per daily probe,
    and the literal directory names are immune to partition-type
    inference re-typing the values.

    A ``batch=`` directory with no committed data file (a crashed
    write leaves only ``_temporary/``) is NOT a partition — Spark's
    own discovery ignores it, and counting it would both record a
    phantom label in an index's ``covered_batches`` and wedge the
    documented crashed-day re-run behind the already-folded refusal."""
    sc = spark.sparkContext
    path = sc._jvm.org.apache.hadoop.fs.Path(store_path)
    fs = path.getFileSystem(sc._jsc.hadoopConfiguration())
    out = []
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("batch=")):
            continue
        committed = any(
            not c.getPath().getName().startswith(("_", "."))
            for c in fs.listStatus(st.getPath()))
        if committed:
            out.append(name.split("=", 1)[1])
    return sorted(out)


def _open_incremental_store(spark, path: str, cols: List[str],
                            store_partition: Optional[str],
                            update_store: bool, what: str):
    """Shared store-open contract for the three incremental dedup
    stores: returns ``(raw, stored, have_store, store_is_partitioned)``.
    Only a missing or empty path reads as "first batch" — any other
    failure surfaces (a corrupt store treated as empty would skip all
    history dedup and overwrite the store in append mode) — and a
    layout-mixing update is refused BEFORE anything is written
    (partition discovery silently drops root-level files on later
    reads of a mixed store)."""
    # existence pre-check (Hadoop FS, so remote stores work): a first
    # batch's missing path would otherwise surface as an analyzer
    # PATH_NOT_FOUND — handled below, but Spark logs the full stack at
    # ERROR before we catch it, polluting every first-day run's output
    sc = spark.sparkContext
    jpath = sc._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return None, None, False, store_partition is not None
    try:
        raw = spark.read.parquet(path)
        part = "batch" in raw.columns
        stored = raw.select(*cols)
        have = True
    except AnalysisException as e:
        if ("PATH_NOT_FOUND" not in str(e)
                and "UNABLE_TO_INFER_SCHEMA" not in str(e)):
            raise
        raw = None
        stored = None
        have = False
        part = store_partition is not None
    if update_store and have and part != (store_partition is not None):
        raise ValueError(
            f"{what} store {path} is "
            f"{'day-partitioned' if part else 'plain'} "
            f"but this update is "
            f"{'plain' if store_partition is None else 'partitioned'} "
            "(store_partition) — mixing the layouts silently drops the "
            "root-level history on later reads; use one layout "
            "consistently per store")
    return raw, stored, have, part


def _check_index_dir(index_dir: str) -> None:
    """Refuse a remote-URI ``index_dir``: the index lifecycle (meta
    writes, version GC, meta loads) is plain-``os`` local I/O, unlike
    the store partition listing which speaks the Hadoop FS API — a
    remote dir would fail on ``open()`` or silently leak superseded
    version dirs.  Called at the TOP of every index build (before the
    expensive bucketed writes) and again at the meta write for direct
    callers.  See :func:`build_band_index`'s operational contract."""
    import re as _re
    if _re.match(r"^[a-z][a-z0-9+.-]*://", index_dir):
        raise ValueError(
            f"index_dir {index_dir!r} is a URI; the index lifecycle "
            "uses local filesystem I/O — pass a plain local or "
            "locally-mounted path (the partitioned STORE may be "
            "remote, the index may not)")


def _write_index_meta(index_dir: str, meta: dict) -> dict:
    """Atomic ``_index_meta.json`` write shared by the index builders."""
    import json as _json
    import os as _os
    _check_index_dir(index_dir)
    _os.makedirs(index_dir, exist_ok=True)
    tmp = _os.path.join(index_dir, "_index_meta.json.tmp")
    with open(tmp, "w") as fh:
        _json.dump(meta, fh, sort_keys=True)
    _os.replace(tmp, _os.path.join(index_dir, "_index_meta.json"))
    return meta


def _new_index_version() -> str:
    """Token for one index build's data dirs and table names: each
    (re)build writes a NEW version and commits it only by the atomic
    meta swap, so an in-place rebuild that crashes mid-write leaves
    the previous version fully intact (the half-written dirs are
    orphans the commit of the next successful build collects)."""
    import binascii
    import os as _os
    return binascii.hexlify(_os.urandom(4)).decode()


def _commit_index_meta(spark, index_dir: str, meta: dict) -> dict:
    """Publish a new index version: swap in the new
    ``_index_meta.json`` (atomic — this IS the commit point), then
    best-effort drop every superseded version's catalog entries and
    data dirs, including half-written orphans from crashed builds.  A
    crash before the swap leaves the previous version untouched; a
    crash after it only leaves orphans for the next commit."""
    import json as _json
    import os as _os
    import re as _re
    import shutil as _shutil
    import hashlib as _hashlib
    mp = _os.path.join(index_dir, "_index_meta.json")
    old = None
    if _os.path.exists(mp):
        with open(mp) as fh:
            old = _json.load(fh)
    _write_index_meta(index_dir, meta)
    new_tables = {meta.get(k) for k in ("table", "sig_table", "fp_table")
                  if meta.get(k)}
    new_paths = {meta.get(k) for k in ("data_path", "sig_path", "fp_path")}
    # drop EVERY superseded catalog entry for this index dir — not just
    # the immediately-previous meta's: crashed builds register their
    # tables before the (never-reached) meta swap, and those entries
    # would dangle forever in a persistent metastore once their data
    # dirs are collected below.  All this dir's tables share the
    # directory-hash infix, so the sweep cannot touch another index.
    infix = _hashlib.md5(
        _os.path.abspath(index_dir).encode()).hexdigest()[:10]
    try:
        stale = [t.name for t in spark.catalog.listTables()
                 if (f"_{infix}_" in t.name          # versioned names
                     or t.name.endswith(f"_{infix}"))  # pre-versioned
                 and t.name not in new_tables]
    except Exception:
        stale = [old.get(k) for k in ("table", "sig_table", "fp_table")
                 if old and old.get(k)
                 and old.get(k) not in new_tables]
    for t in stale:
        try:
            spark.sql(f"DROP TABLE IF EXISTS `{t}`")
        except Exception:
            pass
    keep = {_os.path.basename(p) for p in new_paths if p}
    for name in _os.listdir(index_dir):
        if _re.fullmatch(r"(data|sigs|fps)(-[0-9a-f]+)?", name) \
                and name not in keep:
            _shutil.rmtree(_os.path.join(index_dir, name),
                           ignore_errors=True)
    return meta


def bucket_cap_stats(exploded: DataFrame, bucket_cols: List[str],
                     max_bucket: int) -> DataFrame:
    """Observability for the blocking stage: one row with
    ``(n_buckets, n_capped, max_bucket_size)`` — how many buckets exist,
    how many exceeded ``max_bucket`` (and therefore lost candidate
    pairs to the cap), and the largest bucket seen.  Run it on the same
    exploded (id, bucket) frame the pair expansion consumes when tuning
    ``max_bucket``: a rising ``n_capped`` means boilerplate is eating
    recall; a huge ``max_bucket_size`` confirms the cap is earning its
    keep."""
    sizes = exploded.groupBy(*bucket_cols).agg(F.count("*").alias("_sz"))
    return sizes.agg(
        F.count("*").alias("n_buckets"),
        F.sum((F.col("_sz") > max_bucket).cast("long")).alias("n_capped"),
        F.max("_sz").alias("max_bucket_size"))


def _band_explode(sigs: DataFrame, sig_col: str, k: int,
                  bands: int) -> DataFrame:
    """DataFrame[_id, band, bh]: one row per (doc, band) with the band's
    slot-slice hash — the LSH blocking key (all JVM-side)."""
    rows = k // bands
    band_cols = [
        F.struct(F.lit(b).alias("band"),
                 F.hash(F.slice(F.col(sig_col), b * rows + 1, rows))
                 .alias("bh"))
        for b in range(bands)
    ]
    return (sigs.select("_id", F.explode(F.array(*band_cols)).alias("bk"))
            .select("_id", F.col("bk.band").alias("band"),
                    F.col("bk.bh").alias("bh")))


def minhash_signature_table(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", k: int = 128,
                            shingle_width: int = 3,
                            sig_col: str = "minhash",
                            sig_path: Optional[str] = None) -> DataFrame:
    """The materialized ``(_id, sig)`` signature table — the k-linear
    stage, built ONCE and shared by :func:`lsh_preflight_report` and
    :func:`minhash_lsh_candidates` (pass it as ``sigs=``): parquet at
    ``sig_path`` when given (survives executor loss, reusable across
    runs), Spark cache otherwise."""
    sigs = add_minhash_signatures(df, text_col, k=k,
                                  shingle_width=shingle_width,
                                  out_col=sig_col) \
        .select(F.col(id_col).alias("_id"), sig_col)
    if sig_path is not None:
        sigs.write.mode("overwrite").parquet(sig_path)
        return df.sparkSession.read.parquet(sig_path)
    return sigs.cache()


def lsh_preflight_report(sigs: DataFrame, k: int = 128, bands: int = 32,
                         max_bucket: int = 64,
                         sig_col: str = "minhash") -> dict:
    """Pre-flight skew report for the LSH pair expansion — run on the
    materialized signature table BEFORE the quadratic stage so
    ``max_bucket`` is chosen from evidence, not blind:

    - ``n_buckets`` / ``max_bucket_size``: band-bucket histogram — a
      viral boilerplate bucket shows up as max >> total/n;
    - ``n_capped``: buckets above ``max_bucket`` (each loses candidate
      pairs to the cap — rising n_capped means boilerplate is eating
      recall);
    - ``est_candidate_pairs``: pairs the capped expansion WILL emit
      (sum of C(min(sz, max_bucket), 2));
    - ``uncapped_pair_work``: what an uncapped expansion would cost
      (sum of C(sz, 2)) — the ratio is what the cap saves.

    Cost: one partial-aggregable groupBy over the (id, band, bh) keys —
    no pairs materialize.  The jobs embed this dict in their JSON
    accounting."""
    exploded = _band_explode(sigs, sig_col, k, bands)
    sizes = exploded.groupBy("band", "bh").agg(F.count("*").alias("_sz"))
    capped = F.least(F.col("_sz"), F.lit(max_bucket))
    r = sizes.agg(
        F.count("*").alias("n_buckets"),
        F.max("_sz").alias("max_bucket_size"),
        F.sum((F.col("_sz") > max_bucket).cast("long")).alias("n_capped"),
        F.sum(capped * (capped - 1) / 2).cast("long")
        .alias("est_candidate_pairs"),
        F.sum(F.col("_sz") * (F.col("_sz") - 1) / 2).cast("long")
        .alias("uncapped_pair_work")).collect()[0]
    out = {kk: int(r[kk] or 0) for kk in r.asDict()}
    out["max_bucket"] = max_bucket
    return out


def minhash_lsh_candidates(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", k: int = 128,
                           bands: int = 32, shingle_width: int = 3,
                           max_bucket: int = 64,
                           sig_col: str = "minhash",
                           sig_path: Optional[str] = None,
                           sigs: Optional[DataFrame] = None,
                           bbit: Optional[int] = None) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    Returns DataFrame[id_a, id_b, est_jaccard] with id_a < id_b.
    Two docs collide if any of ``bands`` bands (k/bands rows each) matches
    exactly; est_jaccard = matching-slot fraction of the full signatures.

    ``bbit`` (1/2/4/8): verify candidates from b-bit packed signatures
    instead of the full ones — the verification join then shuffles
    ``k*b/64`` words per side instead of ``k`` (64x less at b=1), at
    the cost of estimator noise sqrt(p(1-p)/k)/(1-2^-b) instead of
    sqrt(J(1-J)/k); ``est_jaccard`` becomes the unbiased b-bit estimate
    (slightly negative possible for dissimilar pairs).  Thresholds on
    it should widen their slack accordingly (see kernels.minhash
    ``bbit_sigma``).  Blocking (bands) is unchanged — recall of the
    candidate stage is identical; only verification precision differs.

    The signature table is consumed three times (band explode + both
    sides of the verification join).  By default it is persisted with
    Spark's MEMORY_AND_DISK DataFrame cache; pass ``sig_path`` to
    materialize it to parquet instead — at corpus scale (10^12 docs x
    k x 8 B of signatures) an explicit parquet materialization is
    preferable: it survives executor loss without recomputing the
    (k-linear, most expensive) signature stage, and later runs /
    incremental dedup can reuse it.  Pass a pre-built table via
    ``sigs`` (:func:`minhash_signature_table` — e.g. after a
    :func:`lsh_preflight_report` pass) to skip the build entirely."""
    if k % bands:
        raise ValueError("bands must divide k")
    rows = k // bands
    if sigs is None:
        sigs = minhash_signature_table(df, id_col, text_col, k=k,
                                       shingle_width=shingle_width,
                                       sig_col=sig_col, sig_path=sig_path)

    exploded = _band_explode(sigs, sig_col, k, bands)
    pairs = _bucket_pairs(exploded, ["band", "bh"], max_bucket)
    if bbit is not None:
        # b-bit verification: shuffle k*b/64 packed words per side
        # instead of k full slots (64x smaller at b=1, k=128).
        packed = pack_bbit_column(sigs, sig_col=sig_col, k=k, b=bbit,
                                  out_col="_pk")
        sa = packed.select(F.col("_id").alias("id_a"),
                           F.col("_pk").alias("_pk_a"))
        sb = packed.select(F.col("_id").alias("id_b"),
                           F.col("_pk").alias("_pk_b"))
        est = bbit_est_jaccard(F.col("_pk_a"), F.col("_pk_b"),
                               k=k, b=bbit)
        return (pairs.join(sa, "id_a").join(sb, "id_b")
                .withColumn("est_jaccard", est)
                .drop("_pk_a", "_pk_b"))
    sa = sigs.select(F.col("_id").alias("id_a"),
                     F.col(sig_col).alias("_sig_a"))
    sb = sigs.select(F.col("_id").alias("id_b"),
                     F.col(sig_col).alias("_sig_b"))
    est = F.aggregate(
        F.zip_with("_sig_a", "_sig_b",
                   lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0), lambda acc, v: acc + v) / F.lit(k)
    return (pairs.join(sa, "id_a").join(sb, "id_b")
            .withColumn("est_jaccard", est.cast("double"))
            .drop("_sig_a", "_sig_b"))


# --------------------------------------------------------------------------
# b-bit minwise hashing (Li & Koenig, CACM 2011): the verification join
# is the stage that shuffles a signature per surviving candidate, twice.
# Packing the low b bits of each of the k minima into k*b/64 uint64 words
# cuts that shuffle 64/b-fold (k=128, b=1: 1 KiB -> 16 B per side) while
# keeping an unbiased Jaccard estimator J^ = (p^ - 2^-b)/(1 - 2^-b) with
# sigma = sqrt(p(1-p)/k)/(1-2^-b).  Everything below is pure Catalyst
# (element_at / shiftleft / xor / bit_count in whole-stage codegen) —
# no Python in the pack or the match path.  NumPy twins with the same
# bit layout live in kernels/minhash.py (pack_bbit / bbit_match_counts)
# and are parity-tested word-for-word against these expressions.
# --------------------------------------------------------------------------

def _bbit_words(k: int, b: int) -> int:
    if b not in (1, 2, 4, 8):
        raise ValueError("b must be one of 1, 2, 4, 8")
    if (k * b) % 64:
        raise ValueError("k*b must be a multiple of 64")
    return (k * b) // 64


def pack_bbit_column(sigs: DataFrame, sig_col: str = "minhash",
                     k: int = 128, b: int = 1,
                     out_col: str = "minhash_bbit") -> DataFrame:
    """Add an ``array<bigint>`` of ``k*b/64`` packed words holding the
    low ``b`` bits of each signature slot (slot ``j`` occupies bits
    ``[j*b, (j+1)*b)`` of word ``j // (64/b)`` — identical layout to
    :func:`gopie_spark.kernels.minhash.pack_bbit`).  JVM-side: one
    ``element_at & mask << shift`` chain per word, folded with OR —
    runs in whole-stage codegen next to the scan, so packing costs no
    extra stage and the packed table can be written beside the
    signature store for reuse."""
    words = _bbit_words(k, b)
    lanes = 64 // b
    mask = (1 << b) - 1

    def word(w: int):
        acc = None
        for lane in range(lanes):
            t = F.shiftleft(
                F.element_at(F.col(sig_col), w * lanes + lane + 1)
                .bitwiseAND(F.lit(mask)), lane * b)
            acc = t if acc is None else acc.bitwiseOR(t)
        return acc

    return sigs.withColumn(out_col, F.array(*[word(w) for w in range(words)]))


def bbit_match_count(col_a, col_b, k: int = 128, b: int = 1):
    """Catalyst expression: number of matching b-bit lanes between two
    packed-signature columns (``array<bigint>`` from
    :func:`pack_bbit_column`).  ``xor`` per word, fold each lane's b
    bits onto its LSB, mask, ``bit_count`` = mismatching lanes."""
    words = _bbit_words(k, b)  # validates (k, b)
    del words
    lanes = 64 // b

    def lane_mism(x, y):
        v = x.bitwiseXOR(y)
        if b == 1:
            return F.bit_count(v)
        fold = v
        for i in range(1, b):
            fold = fold.bitwiseOR(F.shiftrightunsigned(v, i))
        lane_mask = sum(1 << (j * b) for j in range(lanes))
        return F.bit_count(fold.bitwiseAND(F.lit(lane_mask)))

    mism = F.aggregate(F.zip_with(col_a, col_b, lane_mism),
                       F.lit(0), lambda acc, v: acc + v)
    return F.lit(k) - mism


def bbit_est_jaccard(col_a, col_b, k: int = 128, b: int = 1):
    """Unbiased sparse-universe Jaccard estimate from packed columns:
    ``(match_fraction - 2^-b) / (1 - 2^-b)`` (can go slightly negative
    for dissimilar pairs — unbiased, not clamped)."""
    c = 2.0 ** -b
    frac = bbit_match_count(col_a, col_b, k=k, b=b).cast("double") \
        / F.lit(float(k))
    return (frac - F.lit(c)) / F.lit(1.0 - c)


def minhash_lsh_dedup(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", threshold: float = 0.8,
                      strategy: str = "greedy", **kw) -> DataFrame:
    """Drop near-duplicates found by MinHash-LSH.  Two strategies:

    - ``greedy`` (default): for every verified pair above ``threshold``
      the larger id is removed.  One pass, no iteration — but on a chain
      A~B~C (A<B<C) it drops BOTH B and C even when A~C is below the
      threshold, i.e. it over-drops by treating pair edges as if they
      were transitive.  Fine when near-dup clusters are cliques (the
      common web-boilerplate case), documented here because it is a
      *choice*, not an accident.
    - ``cc``: real transitive closure via
      :func:`gopie_spark.operators.graph.connected_components`
      (log-convergent large-star/small-star, bounded rounds): each
      duplicate *cluster* keeps exactly its smallest id.  On the A~B~C
      chain it keeps A and drops B, C — same ids dropped here, but on
      A~B, C~D with B~C absent it correctly keeps A and C where greedy
      also keeps A and C; the semantic difference is that cc never
      drops a doc that is in no cluster with a smaller survivor.
    """
    pairs = minhash_lsh_candidates(df, id_col, text_col, **kw) \
        .filter(F.col("est_jaccard") >= threshold)
    if strategy == "cc":
        from gopie_spark.operators.graph import connected_components
        comp = connected_components(pairs)
        losers = (comp.filter(F.col("id") != F.col("component"))
                  .select(F.col("id").alias(id_col)))
    elif strategy == "greedy":
        losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    else:
        raise ValueError(f"unknown dedup strategy: {strategy!r}")
    return df.join(losers, id_col, "left_anti")


def build_band_index(spark, sig_store: str, index_dir: str, *,
                     k: int = 128, bands: int = 32,
                     max_bucket: int = 64,
                     index_buckets: int = 64,
                     bbit: Optional[int] = None) -> dict:
    """Compact the signature store's LSH blocking structure into a
    PERSISTED, bucketed member index — the base of the LSM shape that
    keeps daily incremental dedup from re-shuffling all of history.

    Without an index, every :func:`incremental_minhash_dedup` call
    band-explodes the WHOLE store and re-aggregates its buckets: at a
    10^12-doc corpus that is an O(corpus x bands) shuffle per day.
    The index persists the finished ``(band, bh) -> capped member ids``
    relation ONCE, written bucketed+sorted on the probe's join key
    (sources/bucketed.py), so a daily probe joins against it with ZERO
    index-side Exchange — the day's only O(history) cost is a bucketed
    columnar scan, no shuffle, no aggregation.

    Days folded into the store AFTER the index build are handled as
    DELTAS at probe time (their partitions are exploded fresh and
    merged bucket-wise under the same cap — associative, so the merged
    members equal a from-scratch build).  Rebuild the index
    periodically (``jobs/rebuild_store.py --band-index``) to re-absorb
    the deltas — classic base+delta compaction.

    A SECOND layout is written alongside: the covered signatures
    bucketed+sorted on ``_id`` (``<index_dir>/sigs``).  The probe's
    signature fetch (every candidate pair needs the stored minhash of
    the bucket-mate) semi-joins its candidate-id set against these
    at-rest buckets — zero store-side Exchange — instead of shuffling
    the whole store by ``_id`` per day.

    Requires the day-partitioned store layout (``store_partition=``),
    which is what makes deltas identifiable.  Returns the meta dict
    (also written to ``<index_dir>/_index_meta.json``).

    Operational contract: ``index_dir`` must be a LOCAL (or
    locally-mounted) path — the meta write, version GC, and loaders
    use plain ``os``/``open``/``shutil``, unlike the store partition
    listing which goes through the Hadoop FS API; a remote
    ``hdfs://``/``s3a://`` index_dir fails on ``open()`` or leaks
    superseded version dirs.  Index commits assume a SINGLE WRITER
    and no concurrent reader mid-probe: ``_commit_index_meta``
    collects the superseded version's data dirs immediately after the
    meta swap, so an overlapping probe on the old version would read
    files that vanish under it.  Serialize rebuilds against probes
    (the daily loop does — ``maybe_reindex`` runs after the day's
    commit, within the same single-process run).
    """
    _check_index_dir(index_dir)
    import hashlib
    import os as _os
    from gopie_spark.sources.bucketed import write_bucketed

    raw = spark.read.parquet(sig_store)
    if "batch" not in raw.columns:
        raise ValueError(
            "band index requires the day-partitioned signature store "
            "layout (batch=<date> partitions, store_partition=...): a "
            "plain store gives deltas no identity")
    covered = _list_batch_partitions(spark, sig_store)
    sig_col = "minhash"
    expl = _band_explode(raw.select("_id", sig_col), sig_col, k, bands)
    members = _bucket_members(expl, ["band", "bh"], max_bucket)
    suffix = hashlib.md5(
        _os.path.abspath(index_dir).encode()).hexdigest()[:10]
    ver = _new_index_version()
    table = f"gopie_band_index_{suffix}_{ver}"
    data_path = _os.path.join(index_dir, f"data-{ver}")
    write_bucketed(members, table, ["band", "bh"],
                   n_buckets=index_buckets, path=data_path)
    # second layout over the SAME covered batches: the signatures
    # themselves, bucketed+sorted on _id — the candidate signature
    # fetch (pairs need the stored minhash of every bucket-mate) then
    # semi-joins the day's candidate-id set against an at-rest layout
    # instead of shuffling the whole store by _id every day
    sig_table = f"gopie_sig_index_{suffix}_{ver}"
    sig_path = _os.path.join(index_dir, f"sigs-{ver}")
    sig_rows = raw.select("_id", sig_col)
    if bbit is not None:
        # b-bit verification diet (Li & Koenig, CACM 2011): persist the
        # packed words ALONGSIDE the full signatures in the same
        # bucketed layout, so an incremental probe with bbit= fetches
        # k*b/64 words per candidate instead of k slots (64x smaller at
        # b=1, k=128) — at the 10^12-doc tier the fetch reduction
        # matters most exactly here.  Pure column addition: the full
        # signatures stay for bbit-less probes and future rebuilds.
        sig_rows = pack_bbit_column(sig_rows, sig_col=sig_col, k=k,
                                    b=bbit, out_col="minhash_bbit")
    write_bucketed(sig_rows, sig_table, ["_id"],
                   n_buckets=index_buckets, path=sig_path)
    return _commit_index_meta(spark, index_dir, {
        "k": k, "bands": bands, "max_bucket": max_bucket,
        "index_buckets": index_buckets, "table": table,
        "data_path": data_path, "sig_table": sig_table,
        "sig_path": sig_path, "bbit": bbit,
        "covered_batches": covered})


def load_band_index(spark, index_dir: str):
    """(members DataFrame, meta) for a persisted band index,
    re-registering the bucketed catalog entry when this session does
    not have it (the files carry the layout; the catalog entry is what
    lets Spark trust it — sources/bucketed.py)."""
    import json as _json
    import os as _os
    from gopie_spark.sources.bucketed import (read_bucketed,
                                              register_bucketed)

    with open(_os.path.join(index_dir, "_index_meta.json")) as fh:
        meta = _json.load(fh)
    if not spark.catalog.tableExists(meta["table"]):
        register_bucketed(spark, meta["table"], meta["data_path"],
                          ["band", "bh"], meta["index_buckets"])
    # indexes built before the _id-bucketed signature layout existed
    # have no sig_table — probes fall back to fetching signatures from
    # the raw store (correct, just shuffles the store by _id)
    if meta.get("sig_table") and \
            not spark.catalog.tableExists(meta["sig_table"]):
        register_bucketed(spark, meta["sig_table"], meta["sig_path"],
                          ["_id"], meta["index_buckets"])
    return read_bucketed(spark, meta["table"]), meta


def incremental_minhash_dedup(new_docs: DataFrame, sig_store: str,
                              id_col: str = "doc_id",
                              text_col: str = "text",
                              threshold: float = 0.8, k: int = 128,
                              bands: int = 32, shingle_width: int = 3,
                              max_bucket: int = 64,
                              strategy: str = "cc",
                              update_store: bool = True,
                              store_partition: Optional[str] = None,
                              band_index: Optional[str] = None,
                              bbit: Optional[int] = None,
                              new_sigs: Optional[DataFrame] = None
                              ) -> DataFrame:
    """Near-dup-dedup a batch of NEW documents against an existing
    corpus represented ONLY by its MinHash signature store — the
    daily-crawl-vs-history workflow: the historical corpus's text is
    never re-read and its pairs are never re-expanded; only its
    (already-computed) signatures participate, as band-bucket arrays
    the new batch probes.

    ``sig_store`` is a parquet dir of (_id, minhash) rows — the same
    layout ``minhash_lsh_candidates(sig_path=...)`` writes, and this
    function appends the survivors' signatures back (``update_store``)
    so the store stays the signature set of the deduped corpus.
    First call on a missing/empty store is a plain self-dedup.

    ``store_partition`` (e.g. the crawl date) makes the store update
    IDEMPOTENT: survivors' signatures are written with ``overwrite``
    to ``<sig_store>/batch=<store_partition>/`` instead of appended to
    the root, so re-running a crashed batch replaces its own partition
    instead of duplicating rows (duplicates would burn ``max_bucket``
    slots on every later batch).  The survivor set itself is already
    re-run-stable: a doc's own stored signature is excluded by id, and
    stored cluster winners beat their losers again.  All updates to
    one store must consistently use partitions or consistently not —
    a mixed layout would make partition discovery silently drop the
    root-level history, so the mismatching update is refused
    (ValueError) before anything is written.

    ``band_index`` (a :func:`build_band_index` directory) replaces the
    per-call explode+aggregate of the WHOLE store with a zero-shuffle
    bucketed scan of the persisted member index; store partitions
    newer than the index's ``covered_batches`` are exploded fresh and
    merged bucket-wise under the same cap, so the result is identical
    to the index-free path (tested).  Index k/bands/max_bucket must
    match this call's.  When the index carries the ``sigs`` layout
    (signatures bucketed on ``_id`` — all indexes built since it was
    added), the candidate signature FETCH also goes through the index:
    the day's candidate-id set semi-joins the at-rest ``_id`` buckets
    with zero store-side Exchange, instead of shuffling the whole
    store by ``_id`` per call — this was the last O(corpus) shuffle in
    the daily loop.

    Work shape at scale: new signatures build k-linearly over the new
    batch only; the store side is one band-explode + the two-level
    capped member collection (bounded buffers); candidate expansion is
    new-in-bucket x capped members, i.e. O(|new| x bands x max_bucket)
    worst case — NEVER store x store.

    ``bbit`` (1/2/4/8): the b-bit verification diet — candidates are
    verified from packed b-bit words instead of full signatures, so
    the per-candidate signature fetch carries ``k*b/64`` words per
    side instead of ``k`` slots (64x smaller at b=1, k=128).  When the
    band index's sigs layout was built with the same ``bbit``
    (:func:`build_band_index`), the packed column is read AT REST from
    the bucketed layout — the fetch reduction with zero extra work;
    otherwise (no index, or an index without packed words) the fetched
    full signatures are packed post-fetch, which keeps the estimator
    semantics identical but forgoes the shuffle saving.  The estimate
    becomes the unbiased b-bit Jaccard (sigma sqrt(p(1-p)/k)/(1-2^-b)
    instead of sqrt(J(1-J)/k)) — exact duplicates still estimate 1.0
    exactly, and ``threshold`` should carry the wider slack for
    borderline pairs (see kernels.minhash ``bbit_sigma``).

    Semantics: a new doc is dropped when its estimated Jaccard >=
    ``threshold`` against any STORED doc (history is immutable — it is
    never dropped, even when a new doc would merge two historical
    clusters); under ``strategy='cc'`` a new-new cluster transitively
    containing such a doc drops entirely (its true minimum is the
    historical doc — matches a full-batch cc rerun), and clean
    new-only clusters keep their smallest id; ``'greedy'`` drops the
    larger id of every clean new-new pair, with the same over-drop
    caveat as :func:`minhash_lsh_dedup`.  With store ids smaller than
    new ids, (history + survivors) equals the full-batch cc rerun
    except for the documented merge-through-new-doc case.

    ``new_sigs``: a pre-built day signature table (``(_id, minhash)``
    rows matching this call's ``k``/``shingle_width`` — e.g. the one a
    :func:`lsh_preflight_report` pass or an earlier probe over the
    SAME batch already computed) skips the k-linear signature build,
    the most expensive new-batch stage.  Caller keeps ownership of its
    caching/persistence.

    Returns the surviving new docs (original columns).
    """
    if k % bands:
        raise ValueError("bands must divide k")
    if store_partition is not None:
        _check_batch_label(store_partition)
    spark = new_docs.sparkSession
    sig_col = "minhash"
    caller_sigs = new_sigs is not None
    if caller_sigs:
        missing = {"_id", sig_col} - set(new_sigs.columns)
        if missing:
            raise ValueError(
                f"new_sigs is missing column(s) {sorted(missing)} — "
                "expected the (_id, minhash) layout of "
                "add_minhash_signatures / minhash_signature_table")
        new_sigs = new_sigs.select("_id", sig_col)
    else:
        new_sigs = add_minhash_signatures(new_docs, text_col, k=k,
                                          shingle_width=shingle_width,
                                          out_col=sig_col) \
            .select(F.col(id_col).alias("_id"), sig_col)
        new_sigs.cache()
    raw, stored, have_store, store_is_partitioned = \
        _open_incremental_store(spark, sig_store, ["_id", sig_col],
                                store_partition, update_store,
                                "signature")

    new_expl = _band_explode(new_sigs, sig_col, k, bands)
    imeta = None
    delta_sigs = None
    if band_index is not None and stored is not None:
        if not store_is_partitioned:
            raise ValueError(
                "band_index requires the day-partitioned store layout "
                "(store_partition=...) so post-index deltas are "
                "identifiable")
        base, imeta = load_band_index(spark, band_index)
        if (imeta["k"], imeta["bands"], imeta["max_bucket"]) != \
                (k, bands, max_bucket):
            raise ValueError(
                f"band index {band_index} was built with "
                f"k={imeta['k']} bands={imeta['bands']} "
                f"max_bucket={imeta['max_bucket']} but this call uses "
                f"k={k} bands={bands} max_bucket={max_bucket} — "
                "rebuild the index or match its parameters")
        covered = set(imeta["covered_batches"])
        if update_store and store_partition in covered:
            raise ValueError(
                f"batch {store_partition!r} is already folded into "
                f"band index {band_index} — overwriting its store "
                "partition would desynchronize the persisted index "
                "layouts from the store (the stale signatures stay in "
                "the base, never probed as a delta); rebuild the index "
                "without this batch first")
        batches = _list_batch_partitions(spark, sig_store)
        delta = [b for b in batches if b not in covered]
        # fresh side: the new batch + any store partitions folded after
        # the index build (partition-pruned read)
        fresh_expl = new_expl
        if delta:
            delta_sigs = raw.filter(F.col("batch").isin(delta)) \
                .select("_id", sig_col)  # partition-pruned read
            fresh_expl = fresh_expl.unionByName(
                _band_explode(delta_sigs, sig_col, k, bands))
        fresh_members = _bucket_members(fresh_expl, ["band", "bh"],
                                        max_bucket)
        # only buckets the new batch probes matter; the semi-join is
        # the zero-index-side-Exchange bucketed join — the index is
        # SCANNED (columnar, no shuffle, no aggregation), never
        # re-exploded or re-aggregated
        base_hit = base.join(new_expl.select("band", "bh").distinct(),
                             ["band", "bh"], "left_semi")
        members = _merge_capped_members(base_hit, fresh_members,
                                        ["band", "bh"], max_bucket)
    else:
        combined_expl = new_expl if stored is None else \
            new_expl.unionByName(_band_explode(stored, sig_col, k, bands))
        members = _bucket_members(combined_expl, ["band", "bh"],
                                  max_bucket)
    cand = (new_expl.join(members, ["band", "bh"])
            .select(F.col("_id").alias("id_new"),
                    F.explode("_ids").alias("id_other"))
            .filter(F.col("id_new") != F.col("id_other"))
            .distinct())
    cand_cached = False
    pk_col = "minhash_bbit"

    def _as_verify(sigs_df, from_packed=False):
        # project a signature frame to the verification columns: the
        # packed words under bbit (packing post-fetch when the source
        # has no at-rest packed column), the full signature otherwise
        if bbit is None:
            return sigs_df.select("_id", sig_col)
        if from_packed:
            return sigs_df.select("_id", F.col(pk_col).alias("_pk"))
        return pack_bbit_column(sigs_df.select("_id", sig_col),
                                sig_col=sig_col, k=k, b=bbit,
                                out_col="_pk").select("_id", "_pk")

    new_verify = _as_verify(new_sigs)
    if imeta is not None and imeta.get("sig_table"):
        # signature fetch from the index's SECOND layout — signatures
        # bucketed on _id: semi-joining the (day-sized) candidate-id
        # set against the at-rest buckets leaves the store side with
        # ZERO Exchange (plan-tested), where the raw-store fallback
        # below shuffles the whole store by _id every call.  Semi-
        # filtering before the pair join fetches the same rows, so the
        # result is identical to the fallback (tested).  Under bbit
        # with a matching index, only the packed column is READ —
        # column pruning keeps the full signatures on disk.
        from gopie_spark.sources.bucketed import read_bucketed
        cand = cand.persist()
        cand_cached = True
        other_ids = cand.select(F.col("id_other").alias("_id")) \
            .distinct()
        at_rest = read_bucketed(spark, imeta["sig_table"])
        packed_at_rest = bbit is not None and imeta.get("bbit") == bbit
        if packed_at_rest:
            at_rest = at_rest.select("_id", pk_col)
        store_fetch = _as_verify(
            at_rest.join(other_ids, "_id", "left_semi"),
            from_packed=packed_at_rest)
        if delta_sigs is not None:
            store_fetch = store_fetch.unionByName(_as_verify(
                delta_sigs.join(other_ids, "_id", "left_semi")))
        all_verify = new_verify.unionByName(store_fetch)
    else:
        all_verify = new_verify if stored is None else \
            new_verify.unionByName(_as_verify(stored))
    if bbit is not None:
        sa = new_verify.select(F.col("_id").alias("id_new"),
                               F.col("_pk").alias("_pk_a"))
        sb = all_verify.select(F.col("_id").alias("id_other"),
                               F.col("_pk").alias("_pk_b"))
        est = bbit_est_jaccard(F.col("_pk_a"), F.col("_pk_b"),
                               k=k, b=bbit)
    else:
        sa = new_verify.select(F.col("_id").alias("id_new"),
                               F.col(sig_col).alias("_sig_a"))
        sb = all_verify.select(F.col("_id").alias("id_other"),
                               F.col(sig_col).alias("_sig_b"))
        est = F.aggregate(
            F.zip_with("_sig_a", "_sig_b",
                       lambda x, y: F.when(x == y, 1).otherwise(0)),
            F.lit(0), lambda acc, v: acc + v) / F.lit(k)
    pairs = (cand.join(sa, "id_new").join(sb, "id_other")
             .withColumn("est_jaccard", est.cast("double"))
             .filter(F.col("est_jaccard") >= threshold)
             .select("id_new", "id_other"))
    new_ids = new_sigs.select(F.col("_id").alias("id_new"))
    # 1) new docs similar to HISTORY are dropped outright
    vs_stored = pairs.join(new_ids.select(F.col("id_new")
                                          .alias("id_other")),
                           "id_other", "left_anti") \
        .select("id_new").distinct()
    # 2) new-new pairs: clusters keep their smallest id; under 'cc' a
    #    cluster with ANY member similar to history drops entirely (its
    #    true minimum is the historical doc — matches a full-batch cc
    #    rerun), transitively through the new-new edges
    nn = (pairs.join(new_ids.select(F.col("id_new").alias("id_other")),
                     "id_other", "left_semi")
          .select(F.least("id_new", "id_other").alias("id_a"),
                  F.greatest("id_new", "id_other").alias("id_b")))
    if strategy == "cc":
        from gopie_spark.operators.graph import connected_components
        comp = connected_components(nn)
        touched = (comp.join(vs_stored.select(F.col("id_new").alias("id")),
                             "id", "left_semi")
                   .select("component").distinct())
        in_touched = (comp.join(touched, "component", "left_semi")
                      .select(F.col("id").alias("id_new")))
        nn_losers = (comp.filter(F.col("id") != F.col("component"))
                     .select(F.col("id").alias("id_new"))
                     .unionByName(in_touched).distinct())
    elif strategy == "greedy":
        nn_losers = nn.select(F.col("id_b").alias("id_new")).distinct()
    else:
        raise ValueError(f"unknown dedup strategy: {strategy!r}")
    # materialize the (new-batch-sized) loser set so the returned frame
    # and the store write never recompute the k-linear signature stage
    # after the cache below is released
    losers = vs_stored.unionByName(nn_losers).distinct() \
        .select(F.col("id_new").alias(id_col)) \
        .localCheckpoint(eager=True)
    if cand_cached:
        cand.unpersist()
    survivors = new_docs.join(losers, id_col, "left_anti")
    if update_store:
        keep_sigs = new_sigs.join(
            losers.select(F.col(id_col).alias("_id")), "_id", "left_anti")
        if store_partition is not None:
            keep_sigs.write.mode("overwrite").parquet(
                f"{sig_store}/batch={store_partition}")
        else:
            keep_sigs.write.mode("append" if have_store else "overwrite") \
                .parquet(sig_store)
    if not caller_sigs:
        new_sigs.unpersist()
    return survivors


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def add_simhash(df: DataFrame, text_col: str = "text",
                out_col: str = "simhash") -> DataFrame:
    """Add an int64 SimHash fingerprint column (uint64 viewed as int64)."""
    sh = SimHash()
    schema = StructType(df.schema.fields +
                        [StructField(out_col, LongType(), False)])

    chunk_rows = 4096  # per-chunk flat token buffer stays cache-sized

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                yield pdf.assign(**{out_col: pd.Series([], dtype="int64")})
                continue
            for lo in range(0, len(pdf), chunk_rows):
                chunk = pdf.iloc[lo:lo + chunk_rows]
                tok_h, tok_lens = _flat_token_hashes(chunk[text_col])
                fps = sh.batch_fingerprints_flat(tok_h, tok_lens)
                out = chunk.copy()
                out[out_col] = fps.astype(np.int64)
                yield out

    return _widen(df).mapInPandas(fn, schema)


def _chunk_explode(fps: DataFrame) -> DataFrame:
    """DataFrame[_id, chunk, cv]: one row per (doc, 16-bit fingerprint
    chunk) — the SimHash pigeonhole blocking key."""
    chunk_cols = [
        F.struct(F.lit(c).alias("chunk"),
                 F.shiftrightunsigned("simhash", 16 * c)
                 .bitwiseAND(F.lit(0xFFFF)).alias("cv"))
        for c in range(4)
    ]
    return (fps.select("_id", F.explode(F.array(*chunk_cols)).alias("ck"))
            .select("_id", F.col("ck.chunk").alias("chunk"),
                    F.col("ck.cv").alias("cv")))


def simhash_candidates(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", max_hamming: int = 3,
                       max_bucket: int = 256) -> DataFrame:
    """Near-dup pairs by SimHash: 4x16-bit chunk blocking guarantees full
    recall for Hamming distance <= 3; verify with bit_count(xor)."""
    fps = add_simhash(df, text_col).select(
        F.col(id_col).alias("_id"), "simhash")
    fps.cache()
    pairs = _bucket_pairs(_chunk_explode(fps), ["chunk", "cv"],
                          max_bucket)
    fa = fps.select(F.col("_id").alias("id_a"), F.col("simhash").alias("_fa"))
    fb = fps.select(F.col("_id").alias("id_b"), F.col("simhash").alias("_fb"))
    ham = F.bit_count(F.col("_fa").bitwiseXOR(F.col("_fb")))
    return (pairs.join(fa, "id_a").join(fb, "id_b")
            .withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .drop("_fa", "_fb"))


def build_chunk_index(spark, fp_store: str, index_dir: str, *,
                      max_bucket: int = 256,
                      index_buckets: int = 64) -> dict:
    """SimHash twin of :func:`build_band_index`: persist the 4x16-bit
    pigeonhole blocking structure of a day-partitioned fingerprint
    store as a bucketed ``(chunk, cv) -> capped member ids`` index,
    plus a second layout — the fingerprints bucketed+sorted on ``_id``
    (``<index_dir>/fps``) for the candidate fingerprint fetch.

    Without it every :func:`incremental_simhash_dedup` call chunk-
    explodes the WHOLE store (O(corpus x 4) shuffle rows per day) and
    shuffles the whole store by ``_id`` for the fetch.  Store
    partitions folded after the build are probed as deltas and merged
    bucket-wise under the same cap (associative — tested).  Rebuild
    periodically to re-absorb deltas, same base+delta compaction as
    the band index.  Returns the meta dict (also written to
    ``<index_dir>/_index_meta.json``).
    """
    _check_index_dir(index_dir)
    import hashlib
    import os as _os
    from gopie_spark.sources.bucketed import write_bucketed

    raw = spark.read.parquet(fp_store)
    if "batch" not in raw.columns:
        raise ValueError(
            "chunk index requires the day-partitioned fingerprint "
            "store layout (batch=<date> partitions, "
            "store_partition=...): a plain store gives deltas no "
            "identity")
    covered = _list_batch_partitions(spark, fp_store)
    fps = raw.select("_id", "simhash")
    members = _bucket_members(_chunk_explode(fps), ["chunk", "cv"],
                              max_bucket)
    suffix = hashlib.md5(
        _os.path.abspath(index_dir).encode()).hexdigest()[:10]
    ver = _new_index_version()
    table = f"gopie_chunk_index_{suffix}_{ver}"
    data_path = _os.path.join(index_dir, f"data-{ver}")
    write_bucketed(members, table, ["chunk", "cv"],
                   n_buckets=index_buckets, path=data_path)
    fp_table = f"gopie_fp_index_{suffix}_{ver}"
    fp_path = _os.path.join(index_dir, f"fps-{ver}")
    write_bucketed(fps, fp_table, ["_id"],
                   n_buckets=index_buckets, path=fp_path)
    return _commit_index_meta(spark, index_dir, {
        "max_bucket": max_bucket, "index_buckets": index_buckets,
        "table": table, "data_path": data_path,
        "fp_table": fp_table, "fp_path": fp_path,
        "covered_batches": covered})


def load_chunk_index(spark, index_dir: str):
    """(members DataFrame, meta) for a persisted chunk index, re-
    registering both bucketed catalog entries when this session lacks
    them (same durability contract as :func:`load_band_index`)."""
    import json as _json
    import os as _os
    from gopie_spark.sources.bucketed import (read_bucketed,
                                              register_bucketed)

    with open(_os.path.join(index_dir, "_index_meta.json")) as fh:
        meta = _json.load(fh)
    if not spark.catalog.tableExists(meta["table"]):
        register_bucketed(spark, meta["table"], meta["data_path"],
                          ["chunk", "cv"], meta["index_buckets"])
    if not spark.catalog.tableExists(meta["fp_table"]):
        register_bucketed(spark, meta["fp_table"], meta["fp_path"],
                          ["_id"], meta["index_buckets"])
    return read_bucketed(spark, meta["table"]), meta


def incremental_simhash_dedup(new_docs: DataFrame, fp_store: str,
                              id_col: str = "doc_id",
                              text_col: str = "text",
                              max_hamming: int = 3,
                              max_bucket: int = 256,
                              strategy: str = "cc",
                              update_store: bool = True,
                              store_partition: Optional[str] = None,
                              chunk_index: Optional[str] = None
                              ) -> DataFrame:
    """SimHash twin of :func:`incremental_minhash_dedup`: dedup a NEW
    batch against an existing corpus represented only by its 64-bit
    fingerprint store (parquet of (_id, simhash) — 8 bytes per
    historical doc, even cheaper at rest than the MinHash store).

    Candidates come from the 4x16-bit pigeonhole blocking (full recall
    for Hamming <= 3) over new-chunk x capped-combined-bucket members;
    verification is ``bit_count(xor) <= max_hamming`` in codegen.
    History is immutable; under ``'cc'`` a new-new cluster transitively
    touching history drops entirely, clean clusters keep their smallest
    id — same semantics, caps, and store-update contract as the MinHash
    variant.  Returns the surviving new docs.

    ``store_partition`` / ``chunk_index`` mirror the MinHash variant's
    ``store_partition`` / ``band_index`` exactly: idempotent
    ``batch=<date>`` overwrites (layout mixing refused before any
    write), and a :func:`build_chunk_index` directory that replaces
    the per-call whole-store chunk explode AND the whole-store
    fingerprint fetch with bucketed scans of the persisted layouts —
    post-index partitions probed as deltas, result identical to the
    index-free path (tested)."""
    if store_partition is not None:
        _check_batch_label(store_partition)
    spark = new_docs.sparkSession
    new_fps = add_simhash(new_docs, text_col).select(
        F.col(id_col).alias("_id"), "simhash")
    new_fps.cache()
    raw, stored, have_store, store_is_partitioned = \
        _open_incremental_store(spark, fp_store, ["_id", "simhash"],
                                store_partition, update_store,
                                "fingerprint")

    new_expl = _chunk_explode(new_fps)
    imeta = None
    delta_fps = None
    if chunk_index is not None and stored is not None:
        if not store_is_partitioned:
            raise ValueError(
                "chunk_index requires the day-partitioned store layout "
                "(store_partition=...) so post-index deltas are "
                "identifiable")
        base, imeta = load_chunk_index(spark, chunk_index)
        if imeta["max_bucket"] != max_bucket:
            raise ValueError(
                f"chunk index {chunk_index} was built with "
                f"max_bucket={imeta['max_bucket']} but this call uses "
                f"max_bucket={max_bucket} — rebuild the index or "
                "match its parameters")
        covered = set(imeta["covered_batches"])
        if update_store and store_partition in covered:
            raise ValueError(
                f"batch {store_partition!r} is already folded into "
                f"chunk index {chunk_index} — overwriting its store "
                "partition would desynchronize the persisted index "
                "layouts from the store (the stale fingerprints stay "
                "in the base, never probed as a delta); rebuild the "
                "index without this batch first")
        batches = _list_batch_partitions(spark, fp_store)
        delta = [b for b in batches if b not in covered]
        fresh_expl = new_expl
        if delta:
            delta_fps = raw.filter(F.col("batch").isin(delta)) \
                .select("_id", "simhash")  # partition-pruned read
            fresh_expl = fresh_expl.unionByName(_chunk_explode(delta_fps))
        fresh_members = _bucket_members(fresh_expl, ["chunk", "cv"],
                                        max_bucket)
        base_hit = base.join(new_expl.select("chunk", "cv").distinct(),
                             ["chunk", "cv"], "left_semi")
        members = _merge_capped_members(base_hit, fresh_members,
                                        ["chunk", "cv"], max_bucket)
    else:
        combined_expl = new_expl if stored is None else \
            new_expl.unionByName(_chunk_explode(stored))
        members = _bucket_members(combined_expl, ["chunk", "cv"],
                                  max_bucket)
    cand = (new_expl.join(members, ["chunk", "cv"])
            .select(F.col("_id").alias("id_new"),
                    F.explode("_ids").alias("id_other"))
            .filter(F.col("id_new") != F.col("id_other"))
            .distinct())
    cand_cached = False
    if imeta is not None:
        # fingerprint fetch from the index's _id-bucketed layout —
        # zero store-side Exchange, same shape as the MinHash variant
        from gopie_spark.sources.bucketed import read_bucketed
        cand = cand.persist()
        cand_cached = True
        other_ids = cand.select(F.col("id_other").alias("_id")) \
            .distinct()
        store_fetch = read_bucketed(spark, imeta["fp_table"]) \
            .join(other_ids, "_id", "left_semi")
        if delta_fps is not None:
            store_fetch = store_fetch.unionByName(
                delta_fps.join(other_ids, "_id", "left_semi"))
        all_fps = new_fps.unionByName(store_fetch)
    else:
        all_fps = new_fps if stored is None else \
            new_fps.unionByName(stored)
    fa = new_fps.select(F.col("_id").alias("id_new"),
                        F.col("simhash").alias("_fa"))
    fb = all_fps.select(F.col("_id").alias("id_other"),
                        F.col("simhash").alias("_fb"))
    ham = F.bit_count(F.col("_fa").bitwiseXOR(F.col("_fb")))
    pairs = (cand.join(fa, "id_new").join(fb, "id_other")
             .filter(ham.cast("int") <= max_hamming)
             .select("id_new", "id_other"))
    new_ids = new_fps.select(F.col("_id").alias("id_new"))
    vs_stored = pairs.join(new_ids.select(F.col("id_new")
                                          .alias("id_other")),
                           "id_other", "left_anti") \
        .select("id_new").distinct()
    nn = (pairs.join(new_ids.select(F.col("id_new").alias("id_other")),
                     "id_other", "left_semi")
          .select(F.least("id_new", "id_other").alias("id_a"),
                  F.greatest("id_new", "id_other").alias("id_b")))
    if strategy == "cc":
        from gopie_spark.operators.graph import connected_components
        comp = connected_components(nn)
        touched = (comp.join(vs_stored.select(F.col("id_new").alias("id")),
                             "id", "left_semi")
                   .select("component").distinct())
        in_touched = (comp.join(touched, "component", "left_semi")
                      .select(F.col("id").alias("id_new")))
        nn_losers = (comp.filter(F.col("id") != F.col("component"))
                     .select(F.col("id").alias("id_new"))
                     .unionByName(in_touched).distinct())
    elif strategy == "greedy":
        nn_losers = nn.select(F.col("id_b").alias("id_new")).distinct()
    else:
        raise ValueError(f"unknown dedup strategy: {strategy!r}")
    losers = vs_stored.unionByName(nn_losers).distinct() \
        .select(F.col("id_new").alias(id_col)) \
        .localCheckpoint(eager=True)
    if cand_cached:
        cand.unpersist()
    survivors = new_docs.join(losers, id_col, "left_anti")
    if update_store:
        keep = new_fps.join(losers.select(F.col(id_col).alias("_id")),
                            "_id", "left_anti")
        if store_partition is not None:
            keep.write.mode("overwrite").parquet(
                f"{fp_store}/batch={store_partition}")
        else:
            keep.write.mode("append" if have_store else "overwrite") \
                .parquet(fp_store)
    new_fps.unpersist()
    return survivors


# --------------------------------------------------------------------------
# exact n-gram Jaccard (oracle tier)
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", width: int = 3,
                        threshold: float = 0.5,
                        max_shingle_freq: int = 1000) -> DataFrame:
    """Exact Jaccard over word-``width``-gram sets via shingle self-join.

    DataFrame[id_a, id_b, jaccard] with id_a < id_b and jaccard >=
    threshold.  ``max_shingle_freq`` drops ubiquitous shingles (exact-dup
    boilerplate) from the *blocking* join — with the standard caveat that
    a dropped shingle can only lower recall for pairs already sharing
    rarer shingles.  SQL-expressible; serves as the LSH oracle.
    """
    shared, sizes = _shingle_shared_counts(df, id_col, text_col, width,
                                           max_shingle_freq)
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("n").alias("nb"))
    jac = F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
    return (shared.join(sa, "id_a").join(sb, "id_b")
            .withColumn("jaccard", jac.cast("double"))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def _shingle_shared_counts(df: DataFrame, id_col: str, text_col: str,
                           width: int, max_shingle_freq: int):
    """Shared skeleton of the exact set-similarity tiers: distinct
    word-``width``-gram shingles per doc, per-doc set sizes, and the
    freq-capped shingle self-join's shared counts (pairs with id_a <
    id_b).  Returns ``(shared, sizes)``."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    shingles = F.when(
        F.size("_t") >= width,
        F.transform(F.sequence(F.lit(0), F.size("_t") - width),
                    lambda i: F.concat_ws(" ", F.slice("_t", i + 1, width)))
    ).otherwise(F.array(F.concat_ws(" ", F.col("_t"))))
    sh = (df.select(F.col(id_col).alias("_id"), toks.alias("_t"))
          .select("_id", F.explode(shingles).alias("shingle"))
          .distinct())
    sizes = sh.groupBy("_id").agg(F.count("*").alias("n"))
    freq = sh.groupBy("shingle").agg(F.count("*").alias("f"))
    sh2 = sh.join(freq.filter(F.col("f") <= max_shingle_freq), "shingle")
    a, b = sh2.alias("a"), sh2.alias("b")
    shared = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                     & (F.col("a._id") < F.col("b._id")))
              .groupBy(F.col("a._id").alias("id_a"),
                       F.col("b._id").alias("id_b"))
              .agg(F.count("*").alias("shared")))
    return shared, sizes


def ngram_containment_pairs(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", width: int = 3,
                            threshold: float = 0.8,
                            max_shingle_freq: int = 1000) -> DataFrame:
    """Exact shingle-set CONTAINMENT pairs: ``containment =
    |A ∩ B| / min(|A|, |B|)`` — the asymmetric near-subsumption
    measure (a short doc quoted whole inside a long one scores ~1.0
    here while symmetric Jaccard dilutes toward |A|/|B|), i.e. the
    Broder containment coefficient taken in whichever direction is
    stronger.

    DataFrame[id_a, id_b, containment] with ``id_a < id_b`` and
    ``containment >= threshold``.  Same freq-capped shingle self-join
    skeleton (and the same capped-blocking caveat) as
    :func:`ngram_jaccard_pairs`; SQL-expressible, so the exact pair
    set is oracle-checkable.  Scale note: like the Jaccard tier this
    is the *oracle/small-block* form — at corpus scale block first
    (MinHash-LSH buckets catch high-containment pairs of comparable
    size; containment of a SMALL doc in a large one needs the
    freq-capped shingle join itself, which is why this tier keys work
    to shingle frequency, not doc pairs)."""
    shared, sizes = _shingle_shared_counts(df, id_col, text_col, width,
                                           max_shingle_freq)
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("n").alias("nb"))
    cont = F.col("shared") / F.least(F.col("na"), F.col("nb"))
    return (shared.join(sa, "id_a").join(sb, "id_b")
            .withColumn("containment", cont.cast("double"))
            .filter(F.col("containment") >= threshold)
            .select("id_a", "id_b", "containment"))

# --------------------------------------------------------------------------
# paragraph-level dedup (keep first occurrence corpus-wide)
# --------------------------------------------------------------------------

def dedup_paragraphs_exploded(paras: DataFrame, id_col: str = "doc_id",
                              idx_col: str = "para_idx",
                              text_col: str = "para",
                              hash_keys: bool = True) -> DataFrame:
    """Corpus-wide keep-FIRST-occurrence paragraph dedup over an already-
    exploded paragraph table (CCNet-style: the unit of dedup is the
    paragraph, not the document — boilerplate paragraphs repeated across
    pages keep exactly one copy, at their earliest ``(id, idx)``).

    Input: ``DataFrame[id_col, idx_col, text_col, ...]`` — one row per
    paragraph occurrence.  Output: the input rows filtered to first
    occurrences (all columns preserved).  "First" = the lexicographic
    minimum of ``(id_col, idx_col)`` over the paragraph's occurrences,
    so the result is a pure function of the table (partitioning- and
    run-independent).

    Plan shape (the 10^12-paragraph design): one partial-aggregable
    ``groupBy(key).agg(min(struct(id, idx)))`` — map-side combine
    collapses each partition's repeats before the shuffle — then one
    sort-merge join of the occurrence stream back against the winner
    set on the same key.  No window (a ``row_number`` over paragraph
    groups would shuffle every occurrence *and* sort each group), no
    driver-side state.

    ``hash_keys=True`` (default, the 100-TB shape) keys both the
    aggregation and the join on ``xxhash64(text)`` — 8-byte shuffle
    rows instead of whole paragraphs, the same tier
    ``remove_duplicate_spans(hash_grams=True)`` uses, with the same
    2^-64-collision caveat (two distinct paragraphs colliding would
    drop the later one as if it were a repeat; at 10^12 paragraphs the
    expected number of colliding pairs is ~0.03).  ``hash_keys=False``
    shuffles the raw paragraph strings (byte-identical result,
    pytest-pinned equal).
    """
    key = (F.xxhash64(F.col(text_col)) if hash_keys
           else F.col(text_col)).alias("_pk")
    occ = paras.select(key, F.col(id_col).alias("_pid"),
                       F.col(idx_col).alias("_pidx"))
    winners = (occ.groupBy("_pk")
               .agg(F.min(F.struct(F.col("_pid"), F.col("_pidx")))
                    .alias("_w"))
               .select("_pk", F.col("_w._pid").alias("_pid"),
                       F.col("_w._pidx").alias("_pidx")))
    return (paras.join(winners,
                       (key == winners["_pk"])
                       & (paras[id_col] == winners["_pid"])
                       & (paras[idx_col] == winners["_pidx"]))
            .select(*[paras[c] for c in paras.columns]))


def dedup_paragraphs(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", delim: str = r"\n+",
                     joiner: str = "\n", out_col: str = "clean_text",
                     hash_keys: bool = True) -> DataFrame:
    """Document-level wrapper over :func:`dedup_paragraphs_exploded`:
    split each document on ``delim``, keep only the corpus-wide first
    occurrence of every paragraph, and rebuild ``out_col`` by joining
    the surviving paragraphs (original order) with ``joiner``.  Adds
    ``n_paras`` / ``n_paras_kept`` accounting columns; a document whose
    every paragraph appeared earlier elsewhere rebuilds to the empty
    string (the CCNet convention — drop or keep such docs downstream).

    The split/explode is per-row Catalyst (zero shuffle); the only
    shuffles are the two 8-byte-keyed ones inside the exploded dedup
    plus the final per-doc rebuild aggregation."""
    paras_arr = _paras_arr_expr(text_col, delim)
    exploded = (df.select(F.col(id_col),
                          F.posexplode(paras_arr).alias("_idx", "_para")))
    kept = dedup_paragraphs_exploded(exploded, id_col, "_idx", "_para",
                                     hash_keys=hash_keys)
    return _rebuild_docs(df, kept, id_col, paras_arr, joiner, out_col)


def _paras_arr_expr(text_col: str, delim: str):
    """``array<string>`` of trimmed non-empty paragraphs.  NB: the trim
    callback must be a 1-arg lambda — a bare ``F.trim`` accepts an
    optional second parameter, so ``transform`` would feed it the
    element INDEX as the trim character set."""
    return F.filter(
        F.transform(F.split(F.col(text_col), delim),
                    lambda p: F.trim(p)),
        lambda p: p != "")


def _sents_arr_expr(text_col: str):
    """``array<string>`` of trimmed non-empty sentences (the shared
    boundary rule from textstats — marker replace then split, since
    RE2-portable patterns exclude lookbehind)."""
    from .textstats import SENTENCE_BOUNDARY_RE, _SENT_SEP
    marked = F.regexp_replace(F.col(text_col), SENTENCE_BOUNDARY_RE,
                              "$1" + _SENT_SEP)
    return F.filter(
        F.transform(F.split(marked, _SENT_SEP), lambda p: F.trim(p)),
        lambda p: p != "")


def _rebuild_docs(df: DataFrame, kept: DataFrame, id_col: str,
                  paras_arr, joiner: str, out_col: str) -> DataFrame:
    """Rejoin surviving ``(id, _idx, _para)`` rows into per-doc text in
    original order, with ``n_paras`` / ``n_paras_kept`` accounting."""
    rebuilt = (kept.groupBy(id_col)
               .agg(F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct(F.col("_idx"), F.col("_para")))),
                            lambda s: s["_para"]),
                        joiner).alias(out_col),
                    F.count("*").alias("n_paras_kept")))
    # size(NULL) is NULL post-legacy — a null-text doc has zero paragraphs
    counts = (df.select(F.col(id_col),
                        F.coalesce(F.size(paras_arr).cast("long"),
                                   F.lit(0)).alias("n_paras")))
    return (df.join(counts, id_col)
            .join(rebuilt, id_col, "left")
            .withColumn(out_col, F.coalesce(F.col(out_col), F.lit("")))
            .withColumn("n_paras_kept",
                        F.coalesce("n_paras_kept", F.lit(0))
                        .cast("long")))


def dedup_sentences(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", joiner: str = " ",
                    out_col: str = "clean_text",
                    hash_keys: bool = True) -> DataFrame:
    """Sentence-granularity keep-first dedup: split each doc into
    sentences (``textstats.split_sentences``'s boundary rule), keep
    only the corpus-wide FIRST occurrence of every exact sentence, and
    rebuild ``out_col`` in original order — the C4-lineage cut for
    repeated disclaimers/footers that survive paragraph-level dedup
    because their surrounding paragraph differs page to page.

    Same machinery and scale shape as :func:`dedup_paragraphs`
    (zero-shuffle split, 8-byte-hash-keyed exploded dedup, per-doc
    rebuild); output adds ``n_sents`` / ``n_sents_kept``.  Fully
    SQL-expressible, so the driver cert recomputes the whole chain
    exactly."""
    sents_arr = _sents_arr_expr(text_col)
    exploded = (df.select(F.col(id_col),
                          F.posexplode(sents_arr).alias("_idx", "_para")))
    kept = dedup_paragraphs_exploded(exploded, id_col, "_idx", "_para",
                                     hash_keys=hash_keys)
    out = _rebuild_docs(df, kept, id_col, sents_arr, joiner, out_col)
    return (out.withColumnRenamed("n_paras", "n_sents")
            .withColumnRenamed("n_paras_kept", "n_sents_kept"))


def build_pk_index(spark, pk_store: str, index_dir: str, *,
                   index_buckets: int = 64) -> dict:
    """Span-key twin of :func:`build_band_index`: persist a
    day-partitioned paragraph/sentence key store as ONE bucketed+sorted
    ``_pk`` layout, so the daily anti-join probes history as an at-rest
    bucketed scan (zero store-side Exchange, plan-tested) instead of
    shuffling every historical key by ``_pk`` per day.  Store
    partitions folded after the build are probed as deltas (a second,
    day-sized anti-join — sequential anti-joins equal an anti-join
    against the union).  Returns the meta dict (also written to
    ``<index_dir>/_index_meta.json``)."""
    _check_index_dir(index_dir)
    import hashlib
    import os as _os
    from gopie_spark.sources.bucketed import write_bucketed

    raw = spark.read.parquet(pk_store)
    if "batch" not in raw.columns:
        raise ValueError(
            "pk index requires the day-partitioned key store layout "
            "(batch=<date> partitions, store_partition=...): a plain "
            "store gives deltas no identity")
    covered = _list_batch_partitions(spark, pk_store)
    suffix = hashlib.md5(
        _os.path.abspath(index_dir).encode()).hexdigest()[:10]
    ver = _new_index_version()
    table = f"gopie_pk_index_{suffix}_{ver}"
    data_path = _os.path.join(index_dir, f"data-{ver}")
    write_bucketed(raw.select("_pk"), table, ["_pk"],
                   n_buckets=index_buckets, path=data_path)
    return _commit_index_meta(spark, index_dir, {
        "index_buckets": index_buckets, "table": table,
        "data_path": data_path,
        "pk_type": raw.schema["_pk"].dataType.simpleString(),
        "covered_batches": covered})


def load_pk_index(spark, index_dir: str):
    """(keys DataFrame, meta) for a persisted pk index, re-registering
    the bucketed catalog entry when this session lacks it."""
    import json as _json
    import os as _os
    from gopie_spark.sources.bucketed import (read_bucketed,
                                              register_bucketed)

    with open(_os.path.join(index_dir, "_index_meta.json")) as fh:
        meta = _json.load(fh)
    if not spark.catalog.tableExists(meta["table"]):
        register_bucketed(spark, meta["table"], meta["data_path"],
                          ["_pk"], meta["index_buckets"])
    return read_bucketed(spark, meta["table"]), meta


def incremental_paragraph_dedup(new_docs: DataFrame, para_store: str,
                                id_col: str = "doc_id",
                                text_col: str = "text",
                                delim: str = r"\n+", joiner: str = "\n",
                                out_col: str = "clean_text",
                                hash_keys: bool = True,
                                update_store: bool = True,
                                unit: str = "paragraph",
                                store_partition: Optional[str] = None,
                                pk_index: Optional[str] = None
                                ) -> DataFrame:
    """Paragraph-dedup a batch of NEW documents against a corpus
    represented ONLY by its paragraph-key store — the daily-crawl
    workflow for :func:`dedup_paragraphs`: history's text is never
    re-read; a new paragraph drops when its key is in the store OR an
    earlier ``(id, idx)`` occurrence exists within the batch, and the
    surviving keys are appended back so the store stays the set of
    every paragraph ever kept (each distinct paragraph appears exactly
    once, at its first-ever occurrence).

    ``para_store`` is a parquet dir of ``_pk`` rows (``xxhash64`` longs
    under ``hash_keys``, raw paragraph strings otherwise — the two
    tiers must not be mixed in one store).  First call on a
    missing/empty store is a plain batch self-dedup.

    Work shape at scale: within-batch dedup is the usual two
    8-byte-keyed shuffles over the BATCH only; the store participates
    in exactly one anti-join keyed on ``_pk`` — never store x store,
    and never the store's text.

    Equivalence (pytest-pinned): when every stored doc id precedes
    every new id (the crawl ordering), (history survivors + this
    output) == :func:`dedup_paragraphs` over the full concatenated
    corpus — paragraph keep-first has no cross-batch merge subtleties,
    so the incremental result is EXACTLY the full-batch one restricted
    to the new docs.

    Returns the new docs with ``out_col`` / ``n_paras`` /
    ``n_paras_kept`` — the same shape as :func:`dedup_paragraphs`.

    ``store_partition`` / ``pk_index`` mirror the MinHash variant's
    ``store_partition`` / ``band_index``: idempotent ``batch=<date>``
    overwrites — the probe excludes the batch's OWN partition, so a
    crashed-then-re-run day neither vetoes its own keys nor appends
    duplicates (layout mixing refused before any write) — and a
    :func:`build_pk_index` directory that turns the history anti-join
    into a bucketed at-rest scan with post-index partitions probed as
    deltas.  Re-running a batch the index already covers is refused
    (its keys sit in the base, where they cannot be excluded — rebuild
    the index first).
    """
    spark = new_docs.sparkSession
    if unit == "sentence":
        paras_arr = _sents_arr_expr(text_col)
    elif unit == "paragraph":
        paras_arr = _paras_arr_expr(text_col, delim)
    else:
        raise ValueError(f"unknown unit: {unit}")
    exploded = (new_docs.select(F.col(id_col),
                                F.posexplode(paras_arr)
                                .alias("_idx", "_para")))
    kept_batch = dedup_paragraphs_exploded(exploded, id_col, "_idx",
                                           "_para", hash_keys=hash_keys)
    if store_partition is not None:
        _check_batch_label(store_partition)
    raw, stored, have_store, store_is_partitioned = \
        _open_incremental_store(spark, para_store, ["_pk"],
                                store_partition, update_store, "key")
    if store_is_partitioned and store_partition is not None \
            and have_store:
        # a crashed batch's own partial write must not veto its keys
        # on re-run (content keys carry no id to self-exclude by)
        stored = raw.filter(F.col("batch") != F.lit(store_partition)) \
            .select("_pk")
    key = (F.xxhash64(F.col("_para")) if hash_keys
           else F.col("_para")).alias("_pk")
    keyed = kept_batch.select(F.col(id_col), "_idx", "_para", key)
    if pk_index is not None and stored is not None:
        if not store_is_partitioned:
            raise ValueError(
                "pk_index requires the day-partitioned store layout "
                "(store_partition=...) so post-index deltas are "
                "identifiable")
        base, imeta = load_pk_index(spark, pk_index)
        want = "bigint" if hash_keys else "string"
        if imeta["pk_type"] != want:
            raise ValueError(
                f"pk index {pk_index} holds {imeta['pk_type']} keys "
                f"but this call produces {want} keys (hash_keys="
                f"{hash_keys}) — the two tiers must not mix")
        covered = set(imeta["covered_batches"])
        if store_partition is not None and store_partition in covered:
            # unlike the minhash/simhash twins, even a READ-ONLY probe
            # of a covered batch diverges here: content keys carry no
            # id, so the batch's own keys in the bucketed base cannot
            # be excluded and would veto every paragraph
            raise ValueError(
                f"batch {store_partition!r} is already folded into pk "
                f"index {pk_index} — its keys sit in the base where "
                "neither a re-run nor a probe can exclude them; "
                "rebuild the index without this batch")
        batches = _list_batch_partitions(spark, para_store)
        delta = [b for b in batches
                 if b not in covered and b != store_partition]
        # history anti-join against the at-rest bucketed base: zero
        # store-side Exchange (plan-tested); sequential anti-joins on
        # base then deltas equal one anti-join on their union
        keyed = keyed.join(base, "_pk", "left_anti")
        if delta:
            keyed = keyed.join(
                raw.filter(F.col("batch").isin(delta)).select("_pk"),
                "_pk", "left_anti")  # partition-pruned read
    elif stored is not None:
        keyed = keyed.join(stored, "_pk", "left_anti")
    # one materialization feeds BOTH the store append and the returned
    # frame (the rebuild would otherwise recompute the batch dedup
    # after the write); batch-survivor-sized
    keyed = keyed.localCheckpoint(eager=True)
    if update_store:
        if store_partition is not None:
            keyed.select("_pk").write.mode("overwrite").parquet(
                f"{para_store}/batch={store_partition}")
        else:
            keyed.select("_pk").write \
                .mode("append" if have_store else "overwrite") \
                .parquet(para_store)
    return _rebuild_docs(new_docs, keyed.drop("_pk"), id_col, paras_arr,
                         joiner, out_col)


def incremental_sentence_dedup(new_docs: DataFrame, sent_store: str,
                               id_col: str = "doc_id",
                               text_col: str = "text",
                               out_col: str = "clean_text",
                               hash_keys: bool = True,
                               update_store: bool = True,
                               store_partition: Optional[str] = None,
                               pk_index: Optional[str] = None
                               ) -> DataFrame:
    """Sentence-granularity :func:`incremental_paragraph_dedup`: dedup
    a NEW batch's sentences against a corpus represented only by its
    sentence-key store (keys must not be mixed with a paragraph
    store).  Same store contract, work shape, full-batch equivalence,
    and ``store_partition`` / ``pk_index`` scale path; output renames
    accounting to ``n_sents`` / ``n_sents_kept`` (matching
    :func:`dedup_sentences`)."""
    out = incremental_paragraph_dedup(
        new_docs, sent_store, id_col=id_col, text_col=text_col,
        joiner=" ", out_col=out_col, hash_keys=hash_keys,
        update_store=update_store, unit="sentence",
        store_partition=store_partition, pk_index=pk_index)
    return (out.withColumnRenamed("n_paras", "n_sents")
            .withColumnRenamed("n_paras_kept", "n_sents_kept"))


def add_wminhash_signatures(df: DataFrame, text_col: str = "text",
                            k: int = 128,
                            feat_col: str = "wmh_feat",
                            t_col: str = "wmh_t") -> DataFrame:
    """Add the ICWS weighted-MinHash signature of each document's token
    MULTISET (kernels/wminhash.py: Ioffe, ICDM 2010) as two
    ``array<bigint>`` columns — slot sample features and their ``t``
    integers; two docs' weighted Jaccard is estimated by the fraction
    of slots where BOTH match.

    Weights are the token multiplicities, so a doc and the same doc
    with every sentence pasted twice (identical token SET — invisible
    to plain MinHash) estimate J_w = 1/2 here.  The whole chain —
    Arrow regex tokenize, vectorized FNV token hashes, one-lexsort
    per-doc bagging, per-slot activity argmin — runs flat over each
    batch with no per-document Python (same contract as
    :func:`add_minhash_signatures`)."""
    from gopie_spark.kernels.wminhash import (WeightedMinHash,
                                              weighted_counts_flat)
    wmh = WeightedMinHash(k=k)
    schema = StructType(df.schema.fields + [
        StructField(feat_col, ArrayType(LongType()), False),
        StructField(t_col, ArrayType(LongType()), False),
    ])
    # per-slot pass allocates O(distinct tokens in chunk) doubles; cap
    # the chunk so ~10 work arrays stay ~64 MB at ~200 distinct/doc
    chunk_rows = max(64, (1 << 26) // (8 * 10 * 200))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                yield pdf.assign(**{feat_col: pd.Series([], dtype=object),
                                    t_col: pd.Series([], dtype=object)})
                continue
            for lo in range(0, len(pdf), chunk_rows):
                chunk = pdf.iloc[lo:lo + chunk_rows]
                tok_h, tok_lens = _flat_token_hashes(chunk[text_col])
                uniq, counts, pair_lens = weighted_counts_flat(
                    tok_h, tok_lens)
                feat, t = wmh.batch_signatures_flat(uniq, counts,
                                                    pair_lens)
                out = chunk.copy()
                out[feat_col] = list(feat.astype(np.int64))
                out[t_col] = list(t)
                yield out

    return _widen(df).mapInPandas(fn, schema)


def weighted_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text",
                           threshold: float = 0.5,
                           max_token_freq: int = 10000) -> DataFrame:
    """EXACT weighted Jaccard over token multisets via token self-join:
    ``J_w = sum_t min(c_a, c_b) / sum_t max(c_a, c_b)`` with c = the
    token's per-doc count.  DataFrame[id_a, id_b, jaccard] with
    id_a < id_b and jaccard >= threshold.

    The oracle tier for :func:`add_wminhash_signatures` — quadratic by
    design (like :func:`ngram_jaccard_pairs`), kept safe by the
    ``max_token_freq`` doc-frequency cap on the blocking join (dropping
    a ubiquitous token can only LOWER a pair's computed overlap, and
    sum-max in the denominator is reconstructed from per-doc totals, so
    the estimate errs conservative).  SQL-expressible."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda t: t != "")
    tc = (df.select(F.col(id_col).alias("_id"), F.explode(toks).alias("t"))
          .groupBy("_id", "t").agg(F.count("*").alias("c")))
    totals = tc.groupBy("_id").agg(F.sum("c").alias("tot"))
    freq = tc.groupBy("t").agg(F.count("*").alias("df"))
    tc2 = tc.join(freq.filter(F.col("df") <= max_token_freq), "t")
    a, b = tc2.alias("a"), tc2.alias("b")
    summin = (a.join(b, (F.col("a.t") == F.col("b.t"))
                     & (F.col("a._id") < F.col("b._id")))
              .groupBy(F.col("a._id").alias("id_a"),
                       F.col("b._id").alias("id_b"))
              .agg(F.sum(F.least("a.c", "b.c")).alias("summin")))
    ta = totals.select(F.col("_id").alias("id_a"), F.col("tot").alias("tota"))
    tb = totals.select(F.col("_id").alias("id_b"), F.col("tot").alias("totb"))
    jac = (F.col("summin") /
           (F.col("tota") + F.col("totb") - F.col("summin")))
    return (summin.join(ta, "id_a").join(tb, "id_b")
            .withColumn("jaccard", jac.cast("double"))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))
