"""Similarity search over embedding columns (``array<float>``).

Three tiers:

- :func:`brute_force_topk` — exact cosine top-k of every query against the
  corpus.  Queries are broadcast as one NumPy matrix; each Arrow batch of
  corpus vectors does ONE BLAS matmul against all queries (mapInArrow,
  vectors loaded straight from the Arrow values buffer), emits its
  per-batch top-k, and a final per-query reduce keeps the global top-k.
  Work is embarrassingly parallel over corpus partitions; shuffle volume
  is O(n_queries x k x partitions) candidate rows, never the corpus.
- :func:`lsh_topk` — approximate: random-hyperplane signatures bucket the
  corpus; queries probe their own bucket plus ``multiprobe`` bit flips,
  exact-rescore within probed buckets.  Recall tunable by H/multiprobe.
- :func:`ivf_topk` — approximate: spherical k-means++ codebook (trained on
  a deterministic hash-sample), corpus assigned to nearest-centroid
  cells, queries probe their ``nprobe`` nearest cells.

Both approximate tiers salt their probe join (``bucket_salts``) so a hot
bucket/cell's rescoring spreads across tasks instead of landing in one.
Also :func:`cosine_dedup_pairs` — embedding near-dup blocking via the
LSH buckets with exact cosine verification (capped buckets).
"""

from __future__ import annotations

import math
from typing import Iterator, Optional

import numpy as np

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.types import (BinaryType, DoubleType, LongType,
                               StructField, StructType)


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _collect_queries(df: DataFrame, id_col: str, vec_col: str):
    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = _normalize(np.array([r[1] for r in rows], dtype=np.float64))
    return ids, mat


def brute_force_topk(spark: SparkSession, corpus: DataFrame,
                     queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: DataFrame[query_id, match_id, cosine, rank].

    Ties broken by match_id ascending for determinism.  The query set must
    fit in executor memory (broadcast) — that's the contract of a top-k
    *lookup*, not a join of two corpora.
    """
    import pyarrow as pa

    q_ids, q_mat = _collect_queries(queries, id_col, vec_col)
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    out_schema = StructType([
        StructField("query_id", LongType(), False),
        StructField("match_id", LongType(), False),
        StructField("cosine", DoubleType(), False),
    ])

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        # mapInArrow: the embedding matrix comes from the Arrow list
        # values buffer (flatten + reshape), never through per-cell
        # Python objects — this is the full-corpus scan, the one stage
        # that touches every byte at 10^12 rows
        ids, qm = bc.value
        for rb in batches:
            if rb.num_rows == 0:
                continue
            c_ids = np.asarray(rb.column(0), dtype=np.int64)
            vec = rb.column(1)
            flat = np.asarray(vec.flatten(), dtype=np.float64)
            c_mat = _normalize(flat.reshape(len(c_ids), -1))
            sims = qm @ c_mat.T  # (n_queries, batch)
            take = min(k, sims.shape[1])
            # per-query batch top-k (argpartition then exact sort)
            part = np.argpartition(-sims, take - 1, axis=1)[:, :take]
            rows_q = np.repeat(ids, take)
            rows_m = c_ids[part].ravel()
            rows_s = np.take_along_axis(sims, part, axis=1).ravel()
            yield pa.RecordBatch.from_arrays(
                [pa.array(rows_q, type=pa.int64()),
                 pa.array(rows_m, type=pa.int64()),
                 pa.array(rows_s, type=pa.float64())],
                names=["query_id", "match_id", "cosine"])

    candidates = corpus.select(id_col, vec_col).mapInArrow(fn, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("match_id"))
    return (candidates.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


_PLANE_SEED = 0xC0FFEE


def _planes(dim: int, n_planes: int) -> np.ndarray:
    rng = np.random.default_rng(_PLANE_SEED)
    return rng.standard_normal((n_planes, dim))


def _batch_matrix(rb, vec_idx: int) -> np.ndarray:
    """(rows, dim) float64 matrix from an Arrow list column's values
    buffer — flatten + reshape, no per-cell Python objects."""
    vec = rb.column(vec_idx)
    flat = np.asarray(vec.flatten(), dtype=np.float64)
    return flat.reshape(rb.num_rows, -1)


def add_hyperplane_bucket(df: DataFrame, vec_col: str = "embedding",
                          n_planes: int = 12,
                          out_col: str = "lsh_bucket",
                          dim: Optional[int] = None) -> DataFrame:
    """Random-hyperplane LSH bucket id (int64) per vector — deterministic
    fixed-seed planes so buckets are stable across jobs/runs.  mapInArrow:
    the embedding matrix comes straight from the Arrow values buffer
    (one reshape + one BLAS matmul per batch).

    The vector dimension is learned lazily from each task's first Arrow
    batch (the fixed seed makes every task derive identical planes), so
    building the expression schedules NO extra Spark job — pass ``dim``
    only to pin it explicitly (e.g. schema metadata already knows it)."""
    import pyarrow as pa

    schema = StructType(df.schema.fields +
                        [StructField(out_col, LongType(), False)])
    vec_idx = df.columns.index(vec_col)
    weights = (1 << np.arange(n_planes, dtype=np.int64))
    pinned = _planes(dim, n_planes) if dim is not None else None

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        planes = pinned
        for rb in batches:
            if rb.num_rows == 0:
                continue
            mat = _batch_matrix(rb, vec_idx)
            if planes is None:
                planes = _planes(mat.shape[1], n_planes)
            bits = (mat @ planes.T) > 0
            bucket = bits @ weights
            yield pa.RecordBatch.from_arrays(
                list(rb.columns) + [pa.array(bucket, type=pa.int64())],
                names=list(rb.schema.names) + [out_col])

    return df.mapInArrow(fn, schema)


def _salted_probe_join(probes: DataFrame, corpus_b: DataFrame,
                       bucket_col: str, id_col: str,
                       bucket_salts: int) -> DataFrame:
    """Join query probes to a bucketed corpus, salted against hot buckets.

    A plain join on the bucket id puts an entire bucket's candidates into
    ONE task — with clustered embeddings a viral bucket holds a large
    corpus fraction, so that task does O(|bucket| x queries_in_bucket)
    rescoring work.  Salting splits every bucket across ``bucket_salts``
    join keys: each corpus row gets a deterministic salt from its id, and
    each (cheap, tiny) probe row is replicated across all salts, so the
    per-task work is bounded by |bucket| / bucket_salts regardless of
    skew.  Result set is byte-identical to the unsalted join (each corpus
    row keeps exactly one salt)."""
    if bucket_salts <= 1:
        return probes.join(corpus_b, bucket_col)
    salted = corpus_b.withColumn(
        "_bsalt",
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(bucket_salts)).cast("int"))
    p_salted = probes.withColumn(
        "_bsalt", F.explode(F.sequence(F.lit(0), F.lit(bucket_salts - 1))))
    return p_salted.join(salted, [bucket_col, "_bsalt"]).drop("_bsalt")


def _rescore_topk(joined: DataFrame, k: int,
                  qvec: str = "_qvec", cvec: str = "_cvec") -> DataFrame:
    """Exact cosine rescoring + per-query top-k over a candidate join —
    all JVM-side (zip_with/aggregate in codegen, then one window)."""
    dot = F.aggregate(F.zip_with(qvec, cvec,
                                 lambda a, b: a.cast("double") * b),
                      F.lit(0.0), lambda acc, v: acc + v)
    nq = F.sqrt(F.aggregate(F.transform(qvec,
                                        lambda a: a.cast("double") * a),
                            F.lit(0.0), lambda acc, v: acc + v))
    nc = F.sqrt(F.aggregate(F.transform(cvec,
                                        lambda a: a.cast("double") * a),
                            F.lit(0.0), lambda acc, v: acc + v))
    scored = (joined.withColumn("cosine", dot / (nq * nc))
              .select("query_id", "match_id", "cosine").distinct())
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("match_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def lsh_topk(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
             k: int = 10, n_planes: int = 10, multiprobe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             bucket_salts: int = 8) -> DataFrame:
    """Approximate cosine top-k: probe the query's bucket and every
    single-bit-flip bucket up to ``multiprobe`` planes, exact-rescore
    within probed buckets only.  The probe join is salted
    (``bucket_salts``) so a hot bucket's rescoring spreads across tasks
    instead of landing in one."""
    bucketed = add_hyperplane_bucket(corpus, vec_col, n_planes)
    qb = add_hyperplane_bucket(queries, vec_col, n_planes) \
        .select(F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("_qvec"), F.col("lsh_bucket"))
    # multiprobe = max Hamming radius of probed buckets (0 = own bucket,
    # 1 = +single-bit flips, 2 = +double-bit flips)
    q_probes = _lsh_probe_buckets(qb, n_planes, multiprobe)
    joined = _salted_probe_join(
        q_probes,
        bucketed.select(F.col(id_col).alias("match_id"),
                        F.col(vec_col).alias("_cvec"), "lsh_bucket"),
        "lsh_bucket", "match_id", bucket_salts)
    return _rescore_topk(joined, k)


def _hash_sample_matrix(corpus: DataFrame, sample_rows: int,
                        vec_col: str, id_col: str) -> np.ndarray:
    """Value-deterministic pseudo-random vector sample as a float64
    matrix: rows where ``xxhash64(id) % ceil(n/sample_rows) == 0``,
    tie-ordered by the hash — unbiased and byte-stable across runs and
    repartitionings (unlike ``limit()``); the sizing ``count()`` on a
    parquet source reads footer metadata only."""
    n = corpus.count()
    modulus = max(1, int(math.ceil(n / max(sample_rows, 1))))
    hashed = corpus.select(F.col(id_col).alias("_id"),
                           F.col(vec_col).alias("_v"),
                           F.xxhash64(F.col(id_col)).alias("_h"))
    if modulus > 1:
        hashed = hashed.filter(F.pmod(F.col("_h"), F.lit(modulus)) == 0)
    return np.array(
        [r["_v"] for r in
         hashed.orderBy("_h", "_id").limit(sample_rows).collect()],
        dtype=np.float64)


def train_ivf_centroids(corpus: DataFrame, n_centroids: int = 64,
                        sample_rows: int = 100_000, iters: int = 10,
                        vec_col: str = "embedding",
                        seed: int = 0xA11CE,
                        id_col: str = "vec_id") -> np.ndarray:
    """Deterministic IVF codebook: k-means (cosine / spherical) on a
    bounded corpus sample, trained driver-side.

    This is the standard IVF recipe at any scale — the codebook is tiny
    (centroids x dim) and training on a ~100k sample is statistically
    sufficient regardless of corpus size, so the 10^12-row table only
    ever streams through the *assignment* stage, never the trainer.

    The sample is a value-deterministic pseudo-random subset: rows where
    ``xxhash64(id) % ceil(n / sample_rows) == 0``, tie-ordered by the
    hash.  Unlike ``limit()`` (which takes whichever partitions respond
    first — both unstable across runs and biased toward the files that
    sort first, fatal when the corpus is written clustered), this draws
    uniformly from the whole corpus and is byte-stable across runs and
    repartitionings.  The sizing ``count()`` on a parquet source is
    answered from footer metadata, not a data scan.  Fixed seed + fixed
    iteration count => byte-stable cells across runs (same property as
    the fixed LSH planes)."""
    sample = _normalize(_hash_sample_matrix(corpus, sample_rows,
                                            vec_col, id_col))
    rng = np.random.default_rng(seed)
    n_centroids = min(n_centroids, len(sample))
    # k-means++ seeding (cosine distance), vectorized: spreads the
    # initial centers instead of risking several seeds in one dense
    # cluster — same determinism (fixed rng), markedly better cell
    # balance on clustered corpora
    first = int(rng.integers(len(sample)))
    cents = np.empty((n_centroids, sample.shape[1]))
    cents[0] = sample[first]
    d2 = 1.0 - sample @ cents[0]
    np.maximum(d2, 0.0, out=d2)
    for c in range(1, n_centroids):
        tot = d2.sum()
        if tot <= 0:
            cents[c:] = sample[rng.integers(0, len(sample),
                                            n_centroids - c)]
            break
        nxt = int(np.searchsorted(np.cumsum(d2), rng.random() * tot))
        cents[c] = sample[min(nxt, len(sample) - 1)]
        np.minimum(d2, 1.0 - sample @ cents[c], out=d2)
        np.maximum(d2, 0.0, out=d2)
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(n_centroids):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def add_ivf_cell(df: DataFrame, centroids: np.ndarray,
                 vec_col: str = "embedding", out_col: str = "ivf_cell",
                 nprobe: int = 1) -> DataFrame:
    """Assign each vector its nearest-centroid cell (``nprobe=1``) or
    explode to its ``nprobe`` nearest cells (query-side multiprobe).
    One BLAS matmul per Arrow batch against the broadcast codebook."""
    import pyarrow as pa
    import pyarrow.compute as pc

    bc = df.sparkSession.sparkContext.broadcast(centroids)
    schema = StructType(df.schema.fields +
                        [StructField(out_col, LongType(), False)])
    vec_idx = df.columns.index(vec_col)

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        cents = bc.value
        for rb in batches:
            if rb.num_rows == 0:
                continue
            sims = _normalize(_batch_matrix(rb, vec_idx)) @ cents.T
            p = min(nprobe, sims.shape[1])
            if p == 1:
                cells = np.argmax(sims, axis=1).astype(np.int64)
                cols = list(rb.columns)
            else:
                cells = np.argsort(-sims, axis=1)[:, :p].ravel() \
                    .astype(np.int64)
                idx = pa.array(np.repeat(np.arange(rb.num_rows), p))
                cols = [pc.take(c, idx) for c in rb.columns]
            yield pa.RecordBatch.from_arrays(
                cols + [pa.array(cells, type=pa.int64())],
                names=list(rb.schema.names) + [out_col])

    return df.mapInArrow(fn, schema)


def ivf_topk(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
             k: int = 10, n_centroids: int = 64, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroids: Optional[np.ndarray] = None,
             bucket_salts: int = 8) -> DataFrame:
    """IVF-bucketed approximate cosine top-k (the second scale path next
    to :func:`lsh_topk`): corpus partitioned into centroid cells, queries
    probe their ``nprobe`` nearest cells, exact rescoring only within
    probed cells.  Scanned fraction ~ nprobe/n_centroids of the corpus;
    recall tunable by nprobe.  The cell join is salted (``bucket_salts``)
    so a skewed cell's rescoring spreads across tasks."""
    if centroids is None:
        centroids = train_ivf_centroids(corpus, n_centroids,
                                        vec_col=vec_col, id_col=id_col)
    cells = add_ivf_cell(corpus, centroids, vec_col) \
        .select(F.col(id_col).alias("match_id"),
                F.col(vec_col).alias("_cvec"), "ivf_cell")
    q_cells = add_ivf_cell(queries, centroids, vec_col, nprobe=nprobe) \
        .select(F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("_qvec"), "ivf_cell")
    joined = _salted_probe_join(q_cells, cells, "ivf_cell", "match_id",
                                bucket_salts)
    return _rescore_topk(joined, k)


def _lsh_probe_buckets(qb: DataFrame, n_planes: int,
                       multiprobe: int) -> DataFrame:
    """Explode each query row to its probed bucket ids (own bucket +
    bit flips up to Hamming radius ``multiprobe``)."""
    probes = [F.col("lsh_bucket")]
    if multiprobe >= 1:
        probes += [F.col("lsh_bucket").bitwiseXOR(F.lit(1 << b))
                   for b in range(n_planes)]
    if multiprobe >= 2:
        probes += [F.col("lsh_bucket").bitwiseXOR(F.lit((1 << i) | (1 << j)))
                   for i in range(n_planes) for j in range(i + 1, n_planes)]
    return (qb.select("query_id", "_qvec",
                      F.explode(F.array(*probes)).alias("lsh_bucket")))


def build_lsh_index(corpus: DataFrame, out_dir: str, n_planes: int = 10,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> None:
    """Persist an LSH index: the corpus written
    ``partitionBy(lsh_bucket)`` under ``<out_dir>/buckets`` (the planes
    are the fixed-seed family, so no codebook file is needed — only
    ``n_planes`` must match at probe time, recorded as a one-row
    parquet at ``<out_dir>/meta``, which :func:`lsh_topk_indexed`
    reads).  Keep ``n_planes`` <= ~12: the layout creates 2^H
    directories, and probing prunes statically to the probed ones
    (~probes/2^H of the bytes read)."""
    if n_planes > 14:
        raise ValueError("n_planes > 14 creates >16k partition dirs; "
                         "use IVF for finer partitioning")
    bucketed = add_hyperplane_bucket(corpus, vec_col, n_planes)
    bucketed.write.mode("overwrite").partitionBy("lsh_bucket") \
        .parquet(f"{out_dir}/buckets")
    # record the plane count as a one-row parquet under <out_dir>/meta
    corpus.sparkSession.createDataFrame([(n_planes,)], "n_planes int") \
        .coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/meta")


def lsh_topk_indexed(spark: SparkSession, index_dir: str,
                     queries: DataFrame, k: int = 10, multiprobe: int = 2,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     bucket_salts: int = 8) -> DataFrame:
    """Approximate cosine top-k against a persisted
    :func:`build_lsh_index`: the probed bucket set statically prunes
    the partitioned corpus scan.  Same results as :func:`lsh_topk` with
    the same ``n_planes``/``multiprobe``."""
    n_planes = spark.read.parquet(f"{index_dir}/meta") \
        .collect()[0]["n_planes"]
    qb = add_hyperplane_bucket(queries, vec_col, n_planes) \
        .select(F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("_qvec"), "lsh_bucket")
    # the probe set is query-sized: localCheckpoint materializes it once
    # (for the distinct-collect AND the join) without leaving a cached
    # frame registered for the rest of a long-lived session
    q_probes = _lsh_probe_buckets(qb, n_planes, multiprobe) \
        .localCheckpoint(eager=False)
    probed = sorted({r["lsh_bucket"] for r in
                     q_probes.select("lsh_bucket").distinct().collect()})
    corpus = (spark.read.parquet(f"{index_dir}/buckets")
              .filter(F.col("lsh_bucket").isin(probed))
              .select(F.col(id_col).alias("match_id"),
                      F.col(vec_col).alias("_cvec"), "lsh_bucket"))
    joined = _salted_probe_join(q_probes, corpus, "lsh_bucket",
                                "match_id", bucket_salts)
    return _rescore_topk(joined, k)


def build_ivf_index(corpus: DataFrame, out_dir: str,
                    n_centroids: int = 64,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    **train_kw) -> np.ndarray:
    """Persist an IVF index: ``<out_dir>/codebook`` (cell -> centroid)
    and ``<out_dir>/cells`` — the corpus written ``partitionBy(ivf_cell)``.

    Partitioning by cell is what makes IVF pay at rest: a later probe
    reads ONLY its ``nprobe`` cell directories (static partition pruning
    — verified by plan test), i.e. ~nprobe/n_centroids of the bytes,
    with no index structure beyond parquet layout.  Returns the trained
    codebook (also persisted, so :func:`ivf_topk_indexed` needs only
    ``out_dir``)."""
    spark = corpus.sparkSession
    cents = train_ivf_centroids(corpus, n_centroids, vec_col=vec_col,
                                id_col=id_col, **train_kw)
    codebook = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "ivf_cell long, centroid array<double>")
    codebook.coalesce(1).write.mode("overwrite") \
        .parquet(f"{out_dir}/codebook")
    add_ivf_cell(corpus, cents, vec_col).write.mode("overwrite") \
        .partitionBy("ivf_cell").parquet(f"{out_dir}/cells")
    return cents


def ivf_topk_indexed(spark: SparkSession, index_dir: str,
                     queries: DataFrame, k: int = 10, nprobe: int = 4,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     bucket_salts: int = 8) -> DataFrame:
    """Approximate cosine top-k against a persisted
    :func:`build_ivf_index`: queries are assigned their ``nprobe``
    nearest cells from the stored codebook, the probed cell set (tiny —
    queries are a lookup set) prunes the partitioned corpus scan
    *statically*, and rescoring runs only over the read cells.  Same
    result contract as :func:`ivf_topk` with the same codebook."""
    cb = spark.read.parquet(f"{index_dir}/codebook") \
        .orderBy("ivf_cell").collect()
    cents = np.array([r["centroid"] for r in cb], dtype=np.float64)
    q_cells = add_ivf_cell(queries, cents, vec_col, nprobe=nprobe) \
        .select(F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("_qvec"), "ivf_cell")
    # query-sized; localCheckpoint instead of persist so nothing stays
    # registered in the session cache after the probe returns
    q_cells = q_cells.localCheckpoint(eager=False)
    probed = sorted({r["ivf_cell"] for r in
                     q_cells.select("ivf_cell").distinct().collect()})
    corpus = (spark.read.parquet(f"{index_dir}/cells")
              .filter(F.col("ivf_cell").isin(probed))
              .select(F.col(id_col).alias("match_id"),
                      F.col(vec_col).alias("_cvec"), "ivf_cell"))
    joined = _salted_probe_join(q_cells, corpus, "ivf_cell", "match_id",
                                bucket_salts)
    out = _rescore_topk(joined, k)
    return out


def cosine_dedup_pairs(spark: SparkSession, df: DataFrame,
                       threshold: float = 0.95, n_planes: int = 10,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       max_bucket: int = 512) -> DataFrame:
    """Embedding near-duplicate pairs: LSH-bucket blocking + exact cosine
    verify.  DataFrame[id_a, id_b, cosine] with id_a < id_b.  Candidate
    pairs come from the single-shuffle capped-bucket expansion
    (operators.dedup._bucket_pairs — no window sort, bucket work bounded
    by max_bucket^2); vectors join back onto the (small) pair set."""
    from gopie_spark.operators.dedup import _bucket_pairs
    bucketed = add_hyperplane_bucket(df, vec_col, n_planes) \
        .select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
                "lsh_bucket")
    ids = _bucket_pairs(bucketed.select("_id", "lsh_bucket"),
                        ["lsh_bucket"], max_bucket)
    va = bucketed.select(F.col("_id").alias("id_a"),
                         F.col("_v").alias("_va"))
    vb = bucketed.select(F.col("_id").alias("id_b"),
                         F.col("_v").alias("_vb"))
    pairs = ids.join(va, "id_a").join(vb, "id_b")
    return (_add_pair_cosine(pairs)
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine").distinct())


def _add_pair_cosine(pairs: DataFrame) -> DataFrame:
    """Exact cosine over a candidate-pair frame carrying ``_va``/``_vb``
    vector columns — JVM-side zip_with/aggregate, no Python."""
    dot = F.aggregate(F.zip_with("_va", "_vb",
                                 lambda x, y: x.cast("double") * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform("_va", lambda x: x.cast("double") * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform("_vb", lambda x: x.cast("double") * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    return pairs.withColumn("cosine", dot / (na * nb))


def _drop_pair_losers(df: DataFrame, pairs: DataFrame, id_col: str,
                      strategy: str) -> DataFrame:
    """Shared keep/drop tier over a verified near-dup pair frame: each
    near-dup cluster keeps its smallest id (``'cc'``: true transitive
    closure via connected_components; ``'greedy'``: drop the larger id
    of every pair, over-dropping on chains).  Returns the surviving
    rows of ``df`` unchanged."""
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


def cosine_dedup(spark: SparkSession, df: DataFrame,
                 threshold: float = 0.95, n_planes: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 max_bucket: int = 512,
                 strategy: str = "cc") -> DataFrame:
    """Drop embedding near-duplicates: the keep/drop tier over
    :func:`cosine_dedup_pairs`, mirroring the text side's
    ``minhash_lsh_dedup`` — each near-dup cluster keeps its smallest
    id (``strategy='cc'``: true transitive closure via
    connected_components; ``'greedy'``: drop the larger id of every
    pair, over-dropping on chains).  Returns the surviving rows of
    ``df`` unchanged."""
    pairs = cosine_dedup_pairs(spark, df, threshold, n_planes,
                               id_col, vec_col, max_bucket)
    return _drop_pair_losers(df, pairs, id_col, strategy)


def semantic_dedup_pairs(spark: SparkSession, df: DataFrame,
                         threshold: float = 0.95, n_centroids: int = 64,
                         spill: int = 2, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         max_bucket: int = 512,
                         centroids: Optional[np.ndarray] = None
                         ) -> DataFrame:
    """Embedding near-duplicate pairs with SemDeDup-style blocking
    (Abbas et al. 2023 "SemDeDup"): k-means cells instead of random
    hyperplanes — the cluster structure of a real embedding corpus is
    what the coarse quantizer learns, so candidates concentrate where
    the near-dups are.  ``DataFrame[id_a, id_b, cosine]`` with
    ``id_a < id_b``, exact-cosine-verified (so precision is exact; the
    blocking only affects recall).

    ``spill`` assigns each vector to its ``spill`` nearest cells
    (the corpus-side analog of query multiprobe): near-dup pairs
    straddling a cell boundary meet in a shared spill cell.  Measured
    on the near-uniform synthetic embeddings (hardest case for a
    data-adaptive quantizer), k=8/spill=3 recalls ~0.95 of exact
    pairs; on genuinely clustered corpora spill=2 typically suffices.
    Candidate work is bounded by ``max_bucket``² per cell (the same
    two-level salted cap as the MinHash tier); cost scales
    ~``spill²/n_centroids`` of all-pairs.
    """
    from gopie_spark.operators.dedup import _bucket_pairs
    if centroids is None:
        centroids = train_ivf_centroids(df, n_centroids,
                                        vec_col=vec_col, id_col=id_col)
    bucketed = add_ivf_cell(
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")),
        centroids, "_v", nprobe=max(spill, 1))
    # a pair sharing several spill cells is generated once per shared
    # cell — dedup the (small) id-pair set BEFORE the vector join
    ids = _bucket_pairs(bucketed.select("_id", "ivf_cell"),
                        ["ivf_cell"], max_bucket).distinct()
    va = df.select(F.col(id_col).alias("id_a"),
                   F.col(vec_col).alias("_va"))
    vb = df.select(F.col(id_col).alias("id_b"),
                   F.col(vec_col).alias("_vb"))
    pairs = ids.join(va, "id_a").join(vb, "id_b")
    return (_add_pair_cosine(pairs)
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def semantic_preflight_report(df: DataFrame, n_centroids: int = 64,
                              spill: int = 2, id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              max_bucket: int = 512,
                              centroids: Optional[np.ndarray] = None
                              ) -> dict:
    """Pre-flight skew report for :func:`semantic_dedup_pairs` — the
    embedding-tier twin of ``dedup.lsh_preflight_report``: run it on
    the (cheap) cell assignment BEFORE the quadratic pair expansion so
    ``max_bucket`` / ``n_centroids`` / ``spill`` are chosen from
    evidence:

    - ``n_cells`` / ``max_cell_size``: spilled cell histogram (a
      megacluster shows up as max >> rows*spill/n_cells);
    - ``n_capped``: cells above ``max_bucket`` (each trades candidate
      recall for skew safety);
    - ``est_candidate_pairs`` vs ``uncapped_pair_work``: what the
      capped expansion WILL emit vs what uncapped would cost.

    Cost: one assignment scan + one partial-aggregable groupBy — no
    pairs materialize."""
    if centroids is None:
        centroids = train_ivf_centroids(df, n_centroids,
                                        vec_col=vec_col, id_col=id_col)
    cells = add_ivf_cell(
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")),
        centroids, "_v", nprobe=max(spill, 1))
    sizes = cells.groupBy("ivf_cell").agg(F.count("*").alias("_sz"))
    capped = F.least(F.col("_sz"), F.lit(max_bucket))
    r = sizes.agg(
        F.count("*").alias("n_cells"),
        F.max("_sz").alias("max_cell_size"),
        F.sum((F.col("_sz") > max_bucket).cast("long")).alias("n_capped"),
        F.sum(capped * (capped - 1) / 2).cast("long")
        .alias("est_candidate_pairs"),
        F.sum(F.col("_sz") * (F.col("_sz") - 1) / 2).cast("long")
        .alias("uncapped_pair_work")).collect()[0]
    out = {kk: int(r[kk] or 0) for kk in r.asDict()}
    out["max_bucket"] = max_bucket
    out["spill"] = spill
    return out


def semantic_dedup(spark: SparkSession, df: DataFrame,
                   threshold: float = 0.95, n_centroids: int = 64,
                   spill: int = 2, id_col: str = "vec_id",
                   vec_col: str = "embedding", max_bucket: int = 512,
                   centroids: Optional[np.ndarray] = None,
                   strategy: str = "cc") -> DataFrame:
    """Drop semantic near-duplicates: the keep/drop tier over
    :func:`semantic_dedup_pairs` (each near-dup cluster keeps its
    smallest id).  Returns the surviving rows of ``df`` unchanged."""
    pairs = semantic_dedup_pairs(spark, df, threshold, n_centroids,
                                 spill, id_col, vec_col, max_bucket,
                                 centroids)
    return _drop_pair_losers(df, pairs, id_col, strategy)


def probe_work_stats(corpus_bucketed: DataFrame, probes: DataFrame,
                     bucket_col: str,
                     bucket_salts: int = 8) -> DataFrame:
    """Skew observability for the ANN probe join — the similarity-tier
    twin of the dedup tier's ``bucket_cap_stats``: ONE row with

    - ``n_cells`` / ``max_cell_size`` / ``total_rows``: corpus bucket
      histogram (a viral cell shows up as max_cell_size >> total/n);
    - ``n_probed_cells``: how many cells this probe set actually hits;
    - ``rescore_rows``: total candidate rows the exact-rescoring stage
      will score (sum over cells of |cell| x probes-in-cell);
    - ``max_task_rescore_rows``: the largest per-task share AFTER
      salting (max over cells of ceil(|cell| / bucket_salts) x probes)
      — the number that decides whether one straggler task burns a day
      at 100 TB.  If it is >> rescore_rows / tasks, raise
      ``bucket_salts`` (or n_planes / n_centroids) BEFORE running the
      probe, not after.

    Feed it the same frames the probe join consumes:
    ``add_hyperplane_bucket(corpus)`` + the exploded query probes for
    LSH, or ``add_ivf_cell(corpus, cents)`` + ``add_ivf_cell(queries,
    cents, nprobe=...)`` for IVF.  Cost: two partial-aggregable
    groupBys, no join against the corpus rows themselves."""
    sizes = corpus_bucketed.groupBy(bucket_col) \
        .agg(F.count("*").alias("_sz"))
    per_probe = probes.groupBy(bucket_col) \
        .agg(F.count("*").alias("_np"))
    j = sizes.join(per_probe, bucket_col, "left") \
        .withColumn("_np", F.coalesce("_np", F.lit(0)))
    task_rows = (F.ceil(F.col("_sz") / F.lit(max(bucket_salts, 1)))
                 * F.col("_np"))
    return j.agg(
        F.count("*").alias("n_cells"),
        F.max("_sz").alias("max_cell_size"),
        F.sum("_sz").alias("total_rows"),
        F.sum((F.col("_np") > 0).cast("long")).alias("n_probed_cells"),
        F.sum(F.col("_sz") * F.col("_np")).alias("rescore_rows"),
        F.max(task_rows).alias("max_task_rescore_rows"))


def lsh_probe_stats(corpus: DataFrame, queries: DataFrame,
                    n_planes: int = 10, multiprobe: int = 2,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    bucket_salts: int = 8) -> DataFrame:
    """:func:`probe_work_stats` for the exact frames :func:`lsh_topk`
    would join with these parameters."""
    bucketed = add_hyperplane_bucket(corpus, vec_col, n_planes)
    qb = add_hyperplane_bucket(queries, vec_col, n_planes) \
        .select(F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("_qvec"), "lsh_bucket")
    q_probes = _lsh_probe_buckets(qb, n_planes, multiprobe)
    return probe_work_stats(bucketed, q_probes, "lsh_bucket",
                            bucket_salts)


def ivf_probe_stats(corpus: DataFrame, queries: DataFrame,
                    centroids: np.ndarray, nprobe: int = 4,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    bucket_salts: int = 8) -> DataFrame:
    """:func:`probe_work_stats` for the exact frames :func:`ivf_topk`
    would join with this codebook."""
    cells = add_ivf_cell(corpus, centroids, vec_col)
    q_cells = add_ivf_cell(queries, centroids, vec_col, nprobe=nprobe)
    return probe_work_stats(cells, q_cells, "ivf_cell", bucket_salts)


def ivfpq_probe_stats(corpus: DataFrame, queries: DataFrame,
                      centroids: np.ndarray, nprobe: int = 4,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """:func:`probe_work_stats` for the IVF x PQ tier: the corpus cell
    histogram against the exploded query probe set :func:`ivfpq_topk`
    would consume with this codebook.  ``rescore_rows`` here counts ADC
    scoring work (code rows x probing queries); the composed tier has
    no probe join to salt, so ``bucket_salts`` is reported at 1 and
    ``max_task_rescore_rows`` is the per-cell bound (one cell directory
    = one scan split at rest)."""
    cells = add_ivf_cell(corpus, centroids, vec_col)
    q_cells = add_ivf_cell(queries, centroids, vec_col, nprobe=nprobe)
    return probe_work_stats(cells, q_cells, "ivf_cell", bucket_salts=1)


# -- product quantization (IVF-PQ-style compressed scan) ----------------------

def train_pq_codebooks(corpus: DataFrame, m: int = 8, n_codes: int = 16,
                       sample_rows: int = 100_000, iters: int = 12,
                       vec_col: str = "embedding", id_col: str = "vec_id",
                       seed: int = 0x5051) -> np.ndarray:
    """Deterministic product-quantization codebooks (Jegou et al. 2011):
    the (L2-normalized) vector is split into ``m`` contiguous subspaces;
    each subspace gets its own ``n_codes``-center k-means codebook
    trained driver-side on the deterministic hash-sample (same sampling
    contract as :func:`train_ivf_centroids` — the 10^12-row corpus only
    streams through *encoding*, never training).

    Returns ``(m, n_codes, dim//m)`` float64.  Fixed rng + fixed
    iterations => byte-stable codes across runs.
    """
    sample = _normalize(_hash_sample_matrix(corpus, sample_rows,
                                            vec_col, id_col))
    return _train_pq_on_matrix(sample, m, n_codes, iters, seed)


def _train_pq_on_matrix(sample: np.ndarray, m: int, n_codes: int,
                        iters: int, seed: int) -> np.ndarray:
    """Subspace k-means over an in-memory (n, dim) training matrix —
    shared by :func:`train_pq_codebooks` (raw normalized vectors) and
    the residual-encoding IVF-PQ trainer (vector minus its cell
    centroid)."""
    dim = sample.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    if n_codes > 256:
        # codes are stored uint8 (the whole point of PQ's 1-byte-per-
        # subspace footprint); a larger codebook would silently wrap
        # in pq_encode's argmin cast and corrupt every ADC score
        raise ValueError(f"n_codes={n_codes} > 256 does not fit uint8 "
                         "codes; use more subspaces (m) instead")
    rng = np.random.default_rng(seed)
    n_codes = min(n_codes, len(sample))
    books = np.empty((m, n_codes, sub))
    for j in range(m):
        x = sample[:, j * sub:(j + 1) * sub]
        # k-means++ seeding in the subspace (L2)
        cents = np.empty((n_codes, sub))
        cents[0] = x[int(rng.integers(len(x)))]
        d2 = ((x - cents[0]) ** 2).sum(axis=1)
        for c in range(1, n_codes):
            tot = d2.sum()
            if tot <= 0:
                cents[c:] = x[rng.integers(0, len(x), n_codes - c)]
                break
            nxt = int(np.searchsorted(np.cumsum(d2), rng.random() * tot))
            cents[c] = x[min(nxt, len(x) - 1)]
            np.minimum(d2, ((x - cents[c]) ** 2).sum(axis=1), out=d2)
        for _ in range(iters):
            # one (n, n_codes) distance matrix per subspace — small
            d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for c in range(n_codes):
                members = x[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[j] = cents
    return books


def pq_encode(df: DataFrame, codebooks: np.ndarray,
              vec_col: str = "embedding",
              out_col: str = "pq_code") -> DataFrame:
    """Encode each (normalized) vector to its ``m``-byte PQ code
    (nearest subspace center per block) — one broadcast codebook, one
    vectorized distance computation per Arrow batch.  ``m`` bytes
    replace ``4*dim`` — a 32x compression at dim=64/m=8, which is what
    lets a 10^12-row index stay memory-resident for the ADC scan."""
    import pyarrow as pa

    if codebooks.shape[1] > 256:
        # argmin indices are cast to uint8 below; >256 centers would
        # wrap silently and every wrapped code would point at the
        # wrong centroid (train_pq_codebooks enforces the same cap)
        raise ValueError(f"codebook has {codebooks.shape[1]} centers; "
                         "uint8 PQ codes support at most 256")
    bc = df.sparkSession.sparkContext.broadcast(codebooks)
    schema = StructType(df.schema.fields +
                        [StructField(out_col, BinaryType(), False)])
    vec_idx = df.columns.index(vec_col)

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        books = bc.value
        m, _, sub = books.shape
        for rb in batches:
            if rb.num_rows == 0:
                continue
            mat = _normalize(_batch_matrix(rb, vec_idx))
            codes = np.empty((rb.num_rows, m), dtype=np.uint8)
            for j in range(m):
                x = mat[:, j * sub:(j + 1) * sub]
                # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin over c
                # drops the ||x||^2 term
                d = (books[j] ** 2).sum(axis=1)[None, :] - 2.0 * (x @ books[j].T)
                codes[:, j] = d.argmin(axis=1).astype(np.uint8)
            # vectorized variable-binary column: one values buffer
            # (codes.tobytes()) + an arithmetic offsets buffer
            offs = np.arange(0, (rb.num_rows + 1) * m, m, dtype=np.int32)
            code_arr = pa.BinaryArray.from_buffers(
                pa.binary(), rb.num_rows,
                [None, pa.py_buffer(offs.tobytes()),
                 pa.py_buffer(codes.tobytes())])
            yield pa.RecordBatch.from_arrays(
                list(rb.columns) + [code_arr],
                names=list(rb.schema.names) + [out_col])

    return df.mapInArrow(fn, schema)


def pq_topk(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
            k: int = 10, m: int = 8, n_codes: int = 16, refine: int = 4,
            id_col: str = "vec_id", vec_col: str = "embedding",
            codebooks: Optional[np.ndarray] = None) -> DataFrame:
    """PQ asymmetric-distance (ADC) approximate cosine top-k with exact
    refinement — the compressed-scan tier next to lsh/ivf:

    1. encode the corpus to ``m``-byte codes (scan-shaped, 32x smaller
       than the vectors);
    2. per Arrow batch, score ALL queries against the codes via each
       query's ``(m, n_codes)`` inner-product lookup table — a gather +
       sum per subspace, no per-row Python — and keep the batch-local
       top ``refine*k`` per query.  Shuffle volume is
       O(q x refine*k x partitions) candidate ids, never the corpus;
    3. exact-rescore only the surviving candidates (broadcast candidate
       ids joined back to the corpus vectors) and keep the true top-k.

    At cluster scale step 2 reads the m-byte code column only (column
    pruning keeps the vectors unscanned), step 3 re-reads O(q x
    refine*k) vector rows.  Compose with IVF cells for very large q.
    """
    if codebooks is None:
        codebooks = train_pq_codebooks(corpus, m=m, n_codes=n_codes,
                                       vec_col=vec_col, id_col=id_col)
    encoded = pq_encode(corpus, codebooks, vec_col) \
        .select(F.col(id_col).alias("match_id"), "pq_code")
    return _pq_adc_topk(spark, encoded, corpus, queries, codebooks, k,
                        refine, id_col, vec_col)


def _pq_adc_topk(spark: SparkSession, encoded: DataFrame,
                 corpus: DataFrame, queries: DataFrame,
                 codebooks: np.ndarray, k: int, refine: int,
                 id_col: str, vec_col: str) -> DataFrame:
    """Shared ADC scan + exact-refine core for :func:`pq_topk` (inline
    encode) and :func:`pq_topk_indexed` (persisted codes).  ``encoded``
    must have columns (match_id, pq_code)."""
    import pyarrow as pa

    q_ids, q_mat = _collect_queries(queries, id_col, vec_col)
    bc = spark.sparkContext.broadcast((codebooks, q_ids, q_mat))
    n_cand = max(refine * k, k)
    out_schema = StructType([StructField("query_id", LongType(), False),
                             StructField("match_id", LongType(), False),
                             StructField("adc", DoubleType(), False)])

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        books, ids, qm = bc.value
        mm, n_c, sub = books.shape
        # per-query LUT of subspace inner products: (q, m, n_codes)
        lut = np.einsum('qmd,mcd->qmc', qm.reshape(len(qm), mm, sub),
                        books)
        for rb in batches:
            if rb.num_rows == 0:
                continue
            code_col = rb.column(rb.schema.get_field_index("pq_code"))
            # vectorized decode from the Arrow binary buffers (every
            # value is exactly mm bytes)
            bufs = code_col.buffers()
            offs = np.frombuffer(bufs[1], dtype=np.int32)[
                code_col.offset:code_col.offset + rb.num_rows + 1]
            data = np.frombuffer(bufs[2], dtype=np.uint8)
            codes = data[offs[0]:offs[-1]].reshape(rb.num_rows, mm)
            mid = rb.column(rb.schema.get_field_index("match_id")) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            # ADC scores: sum_j lut[q, j, codes[:, j]] -> (q, rows)
            scores = np.zeros((len(ids), rb.num_rows))
            for j in range(mm):
                scores += lut[:, j, codes[:, j]]
            take = min(n_cand, rb.num_rows)
            top = np.argpartition(-scores, take - 1, axis=1)[:, :take]
            q_rep = np.repeat(ids, take)
            m_out = mid[top.ravel()]
            s_out = np.take_along_axis(scores, top, axis=1).ravel()
            yield pa.RecordBatch.from_arrays(
                [pa.array(q_rep, type=pa.int64()),
                 pa.array(m_out, type=pa.int64()),
                 pa.array(s_out, type=pa.float64())],
                names=["query_id", "match_id", "adc"])

    cands = encoded.mapInArrow(fn, out_schema)
    return _adc_exact_refine(cands, corpus, queries, k, n_cand,
                             id_col, vec_col)


def _adc_exact_refine(cands: DataFrame, corpus: DataFrame,
                      queries: DataFrame, k: int, n_cand: int,
                      id_col: str, vec_col: str) -> DataFrame:
    """Global ADC top ``n_cand`` per query, then exact rescore of just
    those candidates (broadcast candidate-id join back to the corpus
    vectors — O(q x n_cand) vector rows re-read, never the corpus)."""
    w = Window.partitionBy("query_id").orderBy(F.desc("adc"),
                                               F.asc("match_id"))
    survivors = (cands.withColumn("_r", F.row_number().over(w))
                 .filter(F.col("_r") <= n_cand)
                 .select("query_id", "match_id"))
    corpus_vecs = corpus.select(F.col(id_col).alias("match_id"),
                                F.col(vec_col).alias("_cvec"))
    joined = (corpus_vecs.join(F.broadcast(survivors), "match_id")
              .join(F.broadcast(queries.select(
                  F.col(id_col).alias("query_id"),
                  F.col(vec_col).alias("_qvec"))), "query_id"))
    return _rescore_topk(joined, k)


def build_pq_index(corpus: DataFrame, out_dir: str, m: int = 8,
                   n_codes: int = 16, id_col: str = "vec_id",
                   vec_col: str = "embedding", **train_kw) -> np.ndarray:
    """Persist a PQ index: ``<out_dir>/codebooks`` (one row per
    (subspace, code) center) and ``<out_dir>/codes`` — (id, m-byte
    code) only, WITHOUT the vectors.

    The codes table is ~m bytes/row — at 10^12 rows x m=8 that is
    ~8 TB vs ~256 TB of float32 vectors, which is what lets the whole
    ADC scan stay on fast storage (or in memory) while the vector
    table is read only for the refine step's candidate ids.  Returns
    the trained codebooks."""
    spark = corpus.sparkSession
    books = train_pq_codebooks(corpus, m=m, n_codes=n_codes,
                               vec_col=vec_col, id_col=id_col, **train_kw)
    rows = [(j, c, [float(x) for x in books[j, c]])
            for j in range(books.shape[0]) for c in range(books.shape[1])]
    spark.createDataFrame(
        rows, "subspace long, code long, center array<double>") \
        .coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/codebooks")
    pq_encode(corpus, books, vec_col) \
        .select(F.col(id_col).alias("match_id"), "pq_code") \
        .write.mode("overwrite").parquet(f"{out_dir}/codes")
    return books


def load_pq_codebooks(spark: SparkSession, index_dir: str) -> np.ndarray:
    rows = spark.read.parquet(f"{index_dir}/codebooks") \
        .orderBy("subspace", "code").collect()
    m = max(r["subspace"] for r in rows) + 1
    n_codes = max(r["code"] for r in rows) + 1
    sub = len(rows[0]["center"])
    books = np.empty((m, n_codes, sub))
    for r in rows:
        books[r["subspace"], r["code"]] = r["center"]
    return books


def pq_topk_indexed(spark: SparkSession, index_dir: str,
                    corpus: DataFrame, queries: DataFrame, k: int = 10,
                    refine: int = 4, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """ADC top-k against a persisted :func:`build_pq_index`: the scan
    reads the m-byte codes table only; ``corpus`` supplies vectors just
    for the refine step (broadcast candidate-id join — O(q x refine*k)
    vector rows).  Same result contract as :func:`pq_topk` with the
    same codebooks."""
    books = load_pq_codebooks(spark, index_dir)
    encoded = spark.read.parquet(f"{index_dir}/codes")
    return _pq_adc_topk(spark, encoded, corpus, queries, books, k,
                        refine, id_col, vec_col)


# -- IVF x PQ composition (pruned compressed scan) ----------------------------

def _assign_query_cells(q_mat: np.ndarray, centroids: np.ndarray,
                        nprobe: int) -> np.ndarray:
    """(n_queries, nprobe) nearest-centroid cells per normalized query
    vector — driver-side (queries are a lookup set, already collected)."""
    sims = q_mat @ centroids.T
    p = min(nprobe, centroids.shape[0])
    return np.argsort(-sims, axis=1)[:, :p]


def train_ivfpq_residual_codebooks(corpus: DataFrame,
                                   centroids: np.ndarray, m: int = 8,
                                   n_codes: int = 16,
                                   sample_rows: int = 100_000,
                                   iters: int = 12,
                                   vec_col: str = "embedding",
                                   id_col: str = "vec_id",
                                   seed: int = 0x5051) -> np.ndarray:
    """PQ codebooks trained on RESIDUALS (normalized vector minus its
    nearest IVF centroid) — the canonical IVFADC recipe (Jegou et al.
    2011): residuals have far less variance than raw vectors once the
    coarse quantizer has absorbed the cell structure, so the same
    m-byte budget quantizes them more finely.  Same deterministic
    hash-sample / fixed-seed contract as :func:`train_pq_codebooks`."""
    sample = _normalize(_hash_sample_matrix(corpus, sample_rows,
                                            vec_col, id_col))
    assign = np.argmax(sample @ centroids.T, axis=1)
    return _train_pq_on_matrix(sample - centroids[assign], m, n_codes,
                               iters, seed)


def ivfpq_encode(df: DataFrame, centroids: np.ndarray,
                 codebooks: np.ndarray, vec_col: str = "embedding",
                 id_col: str = "vec_id",
                 residual: bool = True) -> DataFrame:
    """Fused IVF-assign + PQ-encode scan: one mapInArrow pass emitting
    ``(match_id, pq_code, ivf_cell)``.  With ``residual=True`` the code
    quantizes ``normalize(x) - centroid[cell]`` (IVFADC); with
    ``False`` it quantizes the normalized vector itself (then the
    output equals ``add_ivf_cell(pq_encode(df))`` in one pass)."""
    import pyarrow as pa

    if codebooks.shape[1] > 256:
        raise ValueError(f"codebook has {codebooks.shape[1]} centers; "
                         "uint8 PQ codes support at most 256")
    bc = df.sparkSession.sparkContext.broadcast((centroids, codebooks))
    schema = StructType([StructField("match_id", LongType(), False),
                         StructField("pq_code", BinaryType(), False),
                         StructField("ivf_cell", LongType(), False)])
    vec_idx = df.columns.index(vec_col)
    id_idx = df.columns.index(id_col)

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        cents, books = bc.value
        m, _, sub = books.shape
        for rb in batches:
            if rb.num_rows == 0:
                continue
            ids = np.asarray(rb.column(id_idx), dtype=np.int64)
            mat = _normalize(_batch_matrix(rb, vec_idx))
            cells = np.argmax(mat @ cents.T, axis=1)
            target = mat - cents[cells] if residual else mat
            codes = np.empty((rb.num_rows, m), dtype=np.uint8)
            for j in range(m):
                x = target[:, j * sub:(j + 1) * sub]
                d = (books[j] ** 2).sum(axis=1)[None, :] \
                    - 2.0 * (x @ books[j].T)
                codes[:, j] = d.argmin(axis=1).astype(np.uint8)
            offs = np.arange(0, (rb.num_rows + 1) * m, m, dtype=np.int32)
            code_arr = pa.BinaryArray.from_buffers(
                pa.binary(), rb.num_rows,
                [None, pa.py_buffer(offs.tobytes()),
                 pa.py_buffer(codes.tobytes())])
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()), code_arr,
                 pa.array(cells.astype(np.int64), type=pa.int64())],
                names=["match_id", "pq_code", "ivf_cell"])

    return df.select(*df.columns).mapInArrow(fn, schema)


def _pq_adc_topk_cells(spark: SparkSession, encoded: DataFrame,
                       corpus: DataFrame, queries: DataFrame,
                       codebooks: np.ndarray, q_cells: np.ndarray,
                       k: int, refine: int, id_col: str,
                       vec_col: str, centroids: Optional[np.ndarray] = None,
                       residual: bool = False) -> DataFrame:
    """Cell-aware ADC scan for the IVF x PQ composition: ``encoded``
    carries (match_id, pq_code, ivf_cell) rows of the PROBED cells only
    (the caller prunes), and within each Arrow batch every code row is
    scored ONLY against the queries probing its cell — so total ADC
    work is sum over probed cells of |cell| x queries-probing-it, the
    IVF work model, instead of |scan| x |queries|.

    With ``residual=True`` the codes quantize cell residuals (IVFADC):
    the ADC estimate becomes ``q . centroid[cell] + q . residual_hat``
    — the same per-query LUT over the residual codebooks plus one
    per-(query, cell) constant (``centroids`` required)."""
    import pyarrow as pa

    if residual and centroids is None:
        raise ValueError("residual ADC needs the IVF centroids")
    q_ids, q_mat = _collect_queries(queries, id_col, vec_col)
    cell2q: dict = {}
    for qi, cells in enumerate(q_cells):
        for c in cells:
            cell2q.setdefault(int(c), []).append(qi)
    cell2q = {c: np.array(v, dtype=np.int64) for c, v in cell2q.items()}
    bc = spark.sparkContext.broadcast(
        (codebooks, q_ids, q_mat, cell2q, centroids if residual else None))
    n_cand = max(refine * k, k)
    out_schema = StructType([StructField("query_id", LongType(), False),
                             StructField("match_id", LongType(), False),
                             StructField("adc", DoubleType(), False)])

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        books, ids, qm, c2q, cents = bc.value
        mm, n_c, sub = books.shape
        lut = np.einsum('qmd,mcd->qmc', qm.reshape(len(qm), mm, sub),
                        books)
        for rb in batches:
            if rb.num_rows == 0:
                continue
            code_col = rb.column(rb.schema.get_field_index("pq_code"))
            bufs = code_col.buffers()
            offs = np.frombuffer(bufs[1], dtype=np.int32)[
                code_col.offset:code_col.offset + rb.num_rows + 1]
            data = np.frombuffer(bufs[2], dtype=np.uint8)
            codes = data[offs[0]:offs[-1]].reshape(rb.num_rows, mm)
            mid = rb.column(rb.schema.get_field_index("match_id")) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            cells = rb.column(rb.schema.get_field_index("ivf_cell")) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            # a batch from a partitionBy(ivf_cell) layout is single-cell;
            # the loop handles mixed batches (inline tier) too
            for c in np.unique(cells):
                qidx = c2q.get(int(c))
                if qidx is None:
                    continue
                rmask = np.nonzero(cells == c)[0]
                scores = np.zeros((len(qidx), len(rmask)))
                sub_codes = codes[rmask]
                sub_lut = lut[qidx]
                for j in range(mm):
                    scores += sub_lut[:, j, sub_codes[:, j]]
                if cents is not None:
                    # residual ADC: q . centroid[cell] completes
                    # q . (centroid + residual_hat)
                    scores += (qm[qidx] @ cents[c])[:, None]
                take = min(n_cand, len(rmask))
                top = np.argpartition(-scores, take - 1, axis=1)[:, :take]
                q_rep = np.repeat(ids[qidx], take)
                m_out = mid[rmask][top.ravel()]
                s_out = np.take_along_axis(scores, top, axis=1).ravel()
                yield pa.RecordBatch.from_arrays(
                    [pa.array(q_rep, type=pa.int64()),
                     pa.array(m_out, type=pa.int64()),
                     pa.array(s_out, type=pa.float64())],
                    names=["query_id", "match_id", "adc"])

    cands = encoded.mapInArrow(fn, out_schema)
    return _adc_exact_refine(cands, corpus, queries, k, n_cand,
                             id_col, vec_col)


def ivfpq_topk(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
               k: int = 10, n_centroids: int = 64, nprobe: int = 4,
               m: int = 8, n_codes: int = 16, refine: int = 4,
               id_col: str = "vec_id", vec_col: str = "embedding",
               centroids: Optional[np.ndarray] = None,
               codebooks: Optional[np.ndarray] = None,
               residual: bool = False) -> DataFrame:
    """IVF x PQ approximate cosine top-k — the composed tier the two
    building blocks exist for (Jegou et al. 2011 IVFADC): the corpus is
    bucketed into IVF cells AND compressed to m-byte PQ codes; a query
    ADC-scans only the codes of its ``nprobe`` nearest cells, then the
    global ADC survivors are exact-rescored.

    Work model per query wave: ~(nprobe / n_centroids) of the code
    bytes, i.e. at 10^12 rows / m=8 / nprobe=4-of-64 ≈ 0.5 TB scanned
    instead of the 8 TB of the flat :func:`pq_topk` scan — and the
    inline tier already skips ADC scoring (not just emission) for
    unprobed cells.  For the at-rest form with *static partition
    pruning* (only probed cell directories read at all) use
    :func:`build_ivfpq_index` + :func:`ivfpq_topk_indexed`.
    """
    if centroids is None:
        centroids = train_ivf_centroids(corpus, n_centroids,
                                        vec_col=vec_col, id_col=id_col)
    if codebooks is None:
        if residual:
            codebooks = train_ivfpq_residual_codebooks(
                corpus, centroids, m=m, n_codes=n_codes,
                vec_col=vec_col, id_col=id_col)
        else:
            codebooks = train_pq_codebooks(corpus, m=m, n_codes=n_codes,
                                           vec_col=vec_col, id_col=id_col)
    _, q_mat = _collect_queries(queries, id_col, vec_col)
    q_cells = _assign_query_cells(q_mat, centroids, nprobe)
    probed = sorted({int(c) for c in q_cells.ravel()})
    encoded = (ivfpq_encode(corpus, centroids, codebooks, vec_col,
                            id_col, residual=residual)
               .filter(F.col("ivf_cell").isin(probed)))
    return _pq_adc_topk_cells(spark, encoded, corpus, queries, codebooks,
                              q_cells, k, refine, id_col, vec_col,
                              centroids=centroids, residual=residual)


def build_ivfpq_index(corpus: DataFrame, out_dir: str,
                      n_centroids: int = 64, m: int = 8,
                      n_codes: int = 16, id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      residual: bool = False, **train_kw):
    """Persist an IVF x PQ index: ``<out_dir>/codebook`` (IVF centroids,
    same layout as :func:`build_ivf_index`), ``<out_dir>/codebooks``
    (PQ subspace centers, same layout as :func:`build_pq_index`) and
    ``<out_dir>/codes`` — (match_id, pq_code) WITHOUT the vectors,
    written ``partitionBy(ivf_cell)``.

    This is the at-rest layout that fixes the flat PQ index's one scale
    weakness: the codes table is ~m bytes/row AND a probe reads only
    its ``nprobe`` cell directories (static partition pruning), so a
    query wave touches ~(nprobe/n_centroids) x m/(4*dim) of the vector
    bytes.  ``residual=True`` stores IVFADC residual codes (finer
    quantization per byte; recorded in ``<out_dir>/meta`` so the probe
    side scores them correctly).  Returns ``(centroids, codebooks)``."""
    spark = corpus.sparkSession
    cents = train_ivf_centroids(corpus, n_centroids, vec_col=vec_col,
                                id_col=id_col, **train_kw)
    if residual:
        books = train_ivfpq_residual_codebooks(
            corpus, cents, m=m, n_codes=n_codes, vec_col=vec_col,
            id_col=id_col, **train_kw)
    else:
        books = train_pq_codebooks(corpus, m=m, n_codes=n_codes,
                                   vec_col=vec_col, id_col=id_col,
                                   **train_kw)
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "ivf_cell long, centroid array<double>") \
        .coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/codebook")
    rows = [(j, c, [float(x) for x in books[j, c]])
            for j in range(books.shape[0]) for c in range(books.shape[1])]
    spark.createDataFrame(
        rows, "subspace long, code long, center array<double>") \
        .coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/codebooks")
    spark.createDataFrame([(bool(residual),)], "residual boolean") \
        .coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/meta")
    ivfpq_encode(corpus, cents, books, vec_col, id_col,
                 residual=residual) \
        .write.mode("overwrite").partitionBy("ivf_cell") \
        .parquet(f"{out_dir}/codes")
    return cents, books


def ivfpq_topk_indexed(spark: SparkSession, index_dir: str,
                       corpus: DataFrame, queries: DataFrame, k: int = 10,
                       nprobe: int = 4, refine: int = 4,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """ADC top-k against a persisted :func:`build_ivfpq_index`: queries
    are assigned their ``nprobe`` cells from the stored IVF codebook
    driver-side, the probed cell set statically prunes the partitioned
    codes scan (only those directories are read — plan-tested), the
    cell-aware ADC scores each code row only against the queries
    probing its cell, and ``corpus`` supplies vectors for the exact
    refine of O(q x refine*k) candidate ids.  Residual indexes (see
    :func:`build_ivfpq_index`) are detected from ``<index_dir>/meta``
    and scored with the per-(query, cell) centroid term."""
    cb = spark.read.parquet(f"{index_dir}/codebook") \
        .orderBy("ivf_cell").collect()
    cents = np.array([r["centroid"] for r in cb], dtype=np.float64)
    books = load_pq_codebooks(spark, index_dir)
    residual = bool(spark.read.parquet(f"{index_dir}/meta")
                    .collect()[0]["residual"])
    _, q_mat = _collect_queries(queries, id_col, vec_col)
    q_cells = _assign_query_cells(q_mat, cents, nprobe)
    probed = sorted({int(c) for c in q_cells.ravel()})
    encoded = (spark.read.parquet(f"{index_dir}/codes")
               .filter(F.col("ivf_cell").isin(probed))
               .select("match_id", "pq_code",
                       F.col("ivf_cell").cast("long").alias("ivf_cell")))
    return _pq_adc_topk_cells(spark, encoded, corpus, queries, books,
                              q_cells, k, refine, id_col, vec_col,
                              centroids=cents, residual=residual)
