"""Format-pluggable source layer (sources/catalog.py).

The sandbox has no Iceberg runtime jar, so the Iceberg branch is
exercised as capability-probe + dispatch + error contract; the parquet
branch is exercised for real.
"""

import os

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


# -- Iceberg metadata contract (JVM-jar-free) --------------------------------
# The runtime jar is absent in this sandbox, so the guard/lineage logic
# is exercised by injecting fixture rows at the _metadata_rows seam —
# the exact rows a real `<table>.files` / `<table>.snapshots` metadata
# table returns.

class _Row(dict):
    def __getitem__(self, k):
        return dict.__getitem__(self, k) if isinstance(k, str) \
            else list(self.values())[k]


def _force_iceberg(monkeypatch, rows_by_kind):
    from gopie_spark.sources import catalog

    monkeypatch.setattr(catalog, "iceberg_available", lambda spark: True)

    def fake_meta(spark, ref, kind, columns, order=""):
        return rows_by_kind[kind]

    monkeypatch.setattr(catalog, "_metadata_rows", fake_meta)


def test_iceberg_files_listing_append_only(spark, monkeypatch):
    """Append-only snapshot (content == 0 for all files): the planner
    gets the sorted data-file list straight from table metadata."""
    from gopie_spark.sources.catalog import list_data_files
    _force_iceberg(monkeypatch, {"files": [
        _Row(file_path="s3://w/d/b.parquet", content=0),
        _Row(file_path="s3://w/d/a.parquet", content=0),
    ]})
    got = list_data_files(spark, "lake.db.pages", "iceberg")
    assert got == ["s3://w/d/a.parquet", "s3://w/d/b.parquet"]


def test_iceberg_files_listing_rejects_row_level_deletes(spark,
                                                         monkeypatch):
    """A snapshot carrying delete files (content != 0) must be refused:
    the resumable builder reads data files directly as parquet, which
    silently resurrects deleted rows on merge-on-read tables."""
    from gopie_spark.sources.catalog import list_data_files
    _force_iceberg(monkeypatch, {"files": [
        _Row(file_path="s3://w/d/a.parquet", content=0),
        _Row(file_path="s3://w/d/del-1.parquet", content=1),
    ]})
    with pytest.raises(ValueError, match="row-level delete"):
        list_data_files(spark, "lake.db.pages", "iceberg")


def test_iceberg_files_listing_requires_catalog_ref(spark, monkeypatch):
    """Path-based Iceberg refs cannot address the .files metadata table;
    the checkpointed build must refuse them up front."""
    from gopie_spark.sources.catalog import list_data_files
    _force_iceberg(monkeypatch, {"files": []})
    with pytest.raises(ValueError, match="catalog table name"):
        list_data_files(spark, "/warehouse/db/pages", "iceberg")


def test_iceberg_snapshot_identity_from_metadata(spark, monkeypatch):
    """Checkpoint lineage records the newest snapshot id when the
    metadata table has one, and falls back to None on an empty table."""
    from gopie_spark.sources.catalog import snapshot_identity
    _force_iceberg(monkeypatch, {"snapshots": [_Row(snapshot_id=987654)]})
    assert snapshot_identity(spark, "lake.db.pages", "iceberg") == "987654"
    _force_iceberg(monkeypatch, {"snapshots": []})
    assert snapshot_identity(spark, "lake.db.pages", "iceberg") is None


def test_checkpointed_build_via_iceberg_metadata(spark, monkeypatch,
                                                 tmp_path):
    """End-to-end `--format iceberg` resumable build, jar-free: the
    .files metadata seam returns the real data-file paths of a local
    corpus (append-only snapshot), and the full plan-buckets ->
    build-partials -> merge -> finalize pipeline must produce states
    byte-identical to the plain-parquet build of the same files."""
    import glob as _glob
    from gopie_spark.kernels import HLL
    from gopie_spark.operators.sketch_agg import STATE_COL, sketch_agg
    from gopie_spark.plans.checkpoint import SketchCheckpoint
    from gopie_spark.sources import catalog
    from gopie_spark.sources.pages import generate_pages

    pages_dir = generate_pages(str(tmp_path / "pages"), 1000, n_files=4,
                               seed=7)
    data_files = sorted(_glob.glob(os.path.join(pages_dir, "*.parquet")))
    assert len(data_files) == 4
    _force_iceberg(monkeypatch, {
        "files": [_Row(file_path=f, content=0) for f in data_files],
        "snapshots": [_Row(snapshot_id=42)],
    })

    hll = HLL(p=12)
    want = {tuple(r[k] for k in ("lang",)): bytes(r[STATE_COL])
            for r in sketch_agg(spark.read.parquet(pages_dir)
                                .select("lang", "url"),
                                ["lang"], "url", hll).collect()}
    ckpt = SketchCheckpoint(str(tmp_path / "ck"), hll, ["lang"], "url",
                            n_buckets=4)
    ckpt.run_until_complete(spark, "lake.db.pages", fmt="iceberg")
    got = {tuple(r[k] for k in ("lang",)): bytes(r[STATE_COL])
           for r in ckpt.finalize(spark).collect()}
    assert got == want


def test_load_table_text_formats_roundtrip(spark, sf_dir, tmp_path):
    """csv / json / orc branches of load_table round-trip the events
    table (csv via header+inference; orc/json native)."""
    from gopie_spark.sources.catalog import load_table
    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .select("event_id", "user_id", "event_type", "value")
    want = sorted(map(tuple, ev.collect()))
    for fmt, writer in (
            ("csv", lambda d, p: d.write.option("header", "true").csv(p)),
            ("json", lambda d, p: d.write.json(p)),
            ("orc", lambda d, p: d.write.orc(p))):
        p = str(tmp_path / fmt)
        writer(ev, p)
        back = load_table(spark, p, fmt) \
            .select("event_id", "user_id", "event_type", "value")
        assert sorted(map(tuple, back.collect())) == want, fmt
