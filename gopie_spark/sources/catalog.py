"""Table-format-pluggable source layer (Iceberg / parquet).

The north rule targets **Iceberg tables** of Common-Crawl-style pages.
Everything in this engine consumes a plain ``DataFrame``, so the format
is a pure source-layer concern: Catalyst pushes the same column pruning
and predicate filters into either scan, and the sketch/dedup operators
are unchanged.  This module is the one place that knows about formats.

The sandbox ships no Iceberg runtime jar (and installing is out of
scope), so the Iceberg path is feature-gated on the class actually being
loadable in the JVM and exercised as configuration + dispatch logic; on
a real cluster, launch with

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \\
        --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \\
        --conf spark.sql.catalog.lake.type=hadoop \\
        --conf spark.sql.catalog.lake.warehouse=<warehouse-uri> ...

and pass ``--format iceberg --input lake.db.pages`` to the jobs.

Iceberg specifics the engine relies on (and why they matter at 10^12
rows): hidden partitioning (``days(warc_ts)``, ``bucket(N, url)``) keeps
partition pruning independent of query text; snapshot ids give the
checkpoint/resume lineage a stable input identity (we record
``snapshot-id`` instead of a file-list hash when available); and
metadata tables (``<table>.files``) replace the driver-side file listing
in the work-bucket planner.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

ICEBERG_SOURCE_CLASS = "org.apache.iceberg.spark.source.IcebergSource"


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg runtime jar is on the session's JVM classpath."""
    try:
        jvm = spark._jvm  # noqa: SLF001 — capability probe needs the JVM
        jvm.java.lang.Class.forName(ICEBERG_SOURCE_CLASS)
        return True
    except Exception:
        return False


def _metadata_rows(spark: SparkSession, ref: str, kind: str,
                   columns: str, order: str = "") -> list:
    """Rows from an Iceberg metadata table (``<ref>.files``,
    ``<ref>.snapshots``...).  The single seam between the engine's
    guard/lineage logic and the Iceberg runtime — contract tests inject
    fixture rows here to exercise the logic JVM-jar-free, and a real
    deployment hits the actual metadata tables (a metadata read, never
    a data scan)."""
    sql = f"SELECT {columns} FROM {ref}.{kind}"
    if order:
        sql += f" ORDER BY {order}"
    return spark.sql(sql).collect()


def load_table(spark: SparkSession, ref: str,
               fmt: Optional[str] = None) -> DataFrame:
    """Load a table by reference with an explicit or inferred format.

    - ``fmt='iceberg'``: catalog table name (``catalog.db.table``) via
      ``spark.table`` / path via ``format('iceberg').load`` — requires the
      runtime jar (raises a clear error otherwise);
    - ``fmt='parquet'`` (or None with a path-like ref): plain parquet dir.
    """
    fmt = (fmt or "parquet").lower()
    if fmt == "iceberg":
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath; launch via "
                "spark-submit --packages org.apache.iceberg:"
                "iceberg-spark-runtime-... (see sources/catalog.py)")
        if "/" in ref:
            return spark.read.format("iceberg").load(ref)
        return spark.table(ref)
    if fmt == "parquet":
        return spark.read.parquet(ref)
    if fmt == "warc":
        # raw crawl archives -> pages-shaped rows with extracted text
        # (sources/warc.py: one task per archive, streamed records)
        from gopie_spark.sources.pages import with_extracted_text
        from gopie_spark.sources.warc import read_warc
        return with_extracted_text(read_warc(spark, ref),
                                   html_col="html", out_col="text")
    if fmt == "csv":
        # header on; schema inference costs an extra pass — acceptable
        # for ad-hoc loads, pass an explicit-schema DataFrame upstream
        # for the 100-TB path
        return spark.read.option("header", "true") \
            .option("inferSchema", "true").csv(ref)
    if fmt in ("json", "jsonl"):
        return spark.read.json(ref)
    if fmt == "orc":
        return spark.read.orc(ref)
    return spark.read.format(fmt).load(ref)


def list_data_files(spark: SparkSession, ref: str,
                    fmt: Optional[str] = None) -> list:
    """Data-file paths backing a table — the work-unit listing for the
    checkpoint/resume bucket planner (plans/checkpoint.py).

    - parquet: driver-side glob of ``<ref>/*.parquet``;
    - iceberg: the ``<table>.files`` metadata table (no file-system
      listing at all — the scan is a metadata read).  Raises if the
      current snapshot carries row-level delete files (content != 0):
      the resumable builder reads data files directly as parquet, which
      is only sound for append-only tables.
    """
    fmt = (fmt or "parquet").lower()
    if fmt == "iceberg":
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath; launch via "
                "spark-submit --packages org.apache.iceberg:"
                "iceberg-spark-runtime-... (see sources/catalog.py)")
        if "/" in ref:
            raise ValueError(
                "checkpointed builds need a catalog table name "
                "(catalog.db.table) so the .files metadata table is "
                "addressable; path-based Iceberg refs are not supported")
        rows = _metadata_rows(spark, ref, "files", "file_path, content")
        bad = [r["file_path"] for r in rows if r["content"] != 0]
        if bad:
            raise ValueError(
                f"{ref} has {len(bad)} row-level delete files; the "
                "file-bucketed resumable build is only sound for "
                "append-only tables — compact the table first")
        return sorted(r["file_path"] for r in rows)
    import glob
    import os
    if os.path.isfile(ref):
        return [ref]
    files = [f for f in glob.glob(os.path.join(ref, "*.parquet"))
             if not os.path.basename(f).startswith(("_", "."))]
    # one level of hive partition dirs (day=.../part.parquet) so
    # partitioned tables stay checkpoint-resumable; mirror Spark's rule
    # of hiding any path component that starts with '_' or '.'
    # (e.g. curated/_quarantine_<date>/ next to curated/day=<date>/)
    for sub in glob.glob(os.path.join(ref, "*", "*.parquet")):
        rel = os.path.relpath(sub, ref)
        if not any(p.startswith(("_", "."))
                   for p in rel.split(os.sep)):
            files.append(sub)
    return sorted(files)


def snapshot_identity(spark: SparkSession, ref: str,
                      fmt: Optional[str] = None) -> Optional[str]:
    """Stable input identity for checkpoint lineage: the current Iceberg
    snapshot id when available, else None (caller falls back to the
    file-list hash)."""
    if (fmt or "").lower() != "iceberg" or not iceberg_available(spark):
        return None
    rows = _metadata_rows(spark, ref, "snapshots", "snapshot_id",
                          order="committed_at DESC LIMIT 1")
    return str(rows[0][0]) if rows else None
