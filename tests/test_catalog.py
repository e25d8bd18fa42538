"""Format-pluggable source layer (sources/catalog.py).

The sandbox has no Iceberg runtime jar, so the Iceberg branch is
exercised as capability-probe + dispatch + error contract; the parquet
branch is exercised for real.
"""

import pytest

from gopie_spark.sources.catalog import (iceberg_available, load_table,
                                         snapshot_identity)

SF = "/root/testdata/sf0.01"


def test_parquet_load(spark):
    df = load_table(spark, f"{SF}/documents.parquet")
    assert df.count() > 0
    assert "doc_id" in df.columns


def test_iceberg_probe_is_honest(spark):
    # this environment ships no Iceberg jar; the probe must say so
    # (on a real cluster with the jar this flips to True and load_table
    # dispatches to the iceberg reader)
    assert iceberg_available(spark) is False


def test_iceberg_without_runtime_raises_clear_error(spark):
    if iceberg_available(spark):
        pytest.skip("Iceberg runtime present")
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        load_table(spark, "lake.db.pages", fmt="iceberg")


def test_snapshot_identity_fallback(spark):
    # non-iceberg input -> no snapshot identity; checkpoint lineage then
    # uses the file-list hash (plans/checkpoint.py)
    assert snapshot_identity(spark, f"{SF}/documents.parquet") is None
    assert snapshot_identity(spark, "lake.db.pages", "iceberg") is None
