"""Bucketed-table co-location: shuffle-free joins for repeated keys.

A corpus pipeline joins the same keyed artifacts over and over — the
signature store against new batches, per-doc features against the doc
table, survivor id sets against the corpus.  At 10^12 rows every such
join costs a full shuffle of the big side UNLESS the tables are written
bucketed on the join key with the same bucket count: Spark then plans a
SortMergeJoin with ZERO Exchange (each bucket pairs 1:1), and
aggregations keyed on the bucket columns skip their shuffle too.

This module is the thin, tested wrapper that makes the pattern a
one-liner and pins the plan property.  Bucketed tables live in the
session catalog (works with the default in-memory catalog; on a real
cluster use a shared metastore / Iceberg bucket transform — the
``sources/catalog.py`` Iceberg branch carries the same idea via
``bucket(N, col)`` partition transforms).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: Sequence[str],
                   n_buckets: int = 64, path: str | None = None,
                   mode: str = "overwrite") -> None:
    """Write ``df`` as a parquet table bucketed (and sorted) on
    ``bucket_cols`` — the at-rest layout that makes every later join or
    aggregation on those columns shuffle-free.

    ``n_buckets`` must match between tables that will join; sorting
    within buckets lets the join skip its per-task sort as well.
    """
    bucket_cols = list(bucket_cols)
    if not bucket_cols:
        raise ValueError("bucket_cols must not be empty")
    if n_buckets < 1:
        raise ValueError("n_buckets must be positive")
    w = (df.write.mode(mode)
         .bucketBy(n_buckets, *bucket_cols)
         .sortBy(*bucket_cols)
         .format("parquet"))
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (``spark.table`` — the catalog carries the
    bucket spec; a plain ``spark.read.parquet(path)`` would lose it)."""
    return spark.table(table)


def co_located_join(spark: SparkSession, left_table: str,
                    right_table: str, on: Sequence[str],
                    how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket columns.

    With both sides bucketed on ``on`` with equal bucket counts the
    executed plan contains no Exchange (plan-tested) — the join cost is
    a per-bucket streamed merge, independent of cluster-wide shuffle
    capacity.  This is the layout to keep a 10^12-row signature store
    joinable against daily batches without re-shuffling history every
    run.
    """
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), list(on), how)


def register_bucketed(spark: SparkSession, table: str, path: str,
                      bucket_cols: Sequence[str], n_buckets: int) -> None:
    """(Re)register an existing bucketed-parquet path in the session
    catalog — the step that makes a bucketed layout durable across
    sessions when only the default in-memory catalog is available: the
    files carry the bucket layout, but Spark trusts it only through a
    catalog entry (``CREATE TABLE ... CLUSTERED BY``).  The schema is
    read from the parquet footers; the table is external, so dropping
    it never touches the data."""
    cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in spark.read.parquet(path).schema.fields)
    bc = ", ".join(f"`{c}`" for c in bucket_cols)
    spark.sql(f"DROP TABLE IF EXISTS `{table}`")
    spark.sql(
        f"CREATE TABLE `{table}` ({cols}) USING PARQUET "
        f"CLUSTERED BY ({bc}) SORTED BY ({bc}) "
        f"INTO {int(n_buckets)} BUCKETS LOCATION '{path}'")
