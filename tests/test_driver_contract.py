"""Local replica of the driver's DuckDB-oracle correctness pass.

Runs every ``queries()`` entry at sf0.01 Spark-side, the matching
``oracle_sql()`` through DuckDB on the same parquet files, and compares
row count, column names, and order-insensitive values — the same contract
the driver's CORRECTNESS_r{N}.json records.
"""

import datetime
import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(spark, ddb, name):
    df = QUERIES[name](spark, SF_DIR)
    spark_rows = df.collect()
    spark_cols = df.columns
    assert len(spark_rows) >= 0  # smoke: runs
    if name not in ORACLES:
        # rows-only contract: non-empty unless genuinely empty-by-design
        return
    tbl = ddb.execute(ORACLES[name]).arrow()
    ddb_cols = tbl.column_names
    ddb_rows = [tuple(r.values()) for r in tbl.to_pylist()]
    # STRICT type-pair guard (the r4 repetition_stats hash-fail class,
    # generalized past decimals): the driver's value hash is
    # type-sensitive, so every Spark column type must map to its exact
    # DuckDB-Arrow twin — int32 vs int64 and float columns are
    # mismatches waiting to happen even when values compare equal here.
    _PAIRS = {("LongType()", "int64"), ("StringType()", "string"),
              ("BooleanType()", "bool"), ("DoubleType()", "double"),
              ("IntegerType()", "int32"), ("BinaryType()", "binary"),
              ("TimestampType()", "timestamp[us]"),
              ("TimestampNTZType()", "timestamp[us]"),
              ("DateType()", "date32[day]")}
    stypes = {f.name: str(f.dataType) for f in df.schema.fields}
    dtypes = {f.name: str(f.type) for f in tbl.schema}
    bad = [(c, stypes[c], dtypes.get(c, "MISSING")) for c in stypes
           if (stypes[c], dtypes.get(c, "MISSING")) not in _PAIRS]
    assert not bad, f"{name}: spark/oracle type mismatch {bad}"
    s_cols, s_vals = _canon(spark_cols, [tuple(r) for r in spark_rows])
    d_cols, d_vals = _canon(ddb_cols, ddb_rows)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_vals) == len(d_vals), \
        f"{name}: row count {len(s_vals)} vs {len(d_vals)}"
    mism = [i for i, (a, b) in enumerate(zip(s_vals, d_vals)) if a != b]
    assert not mism, (f"{name}: {len(mism)} mismatched rows; first: "
                      f"{s_vals[mism[0]]} vs {d_vals[mism[0]]}")


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_arrow_schema_has_no_decimals(ddb, name):
    """Driver-hash regression guard for the r4 ``repetition_stats`` failure.

    DuckDB ``sum()`` over integers returns HUGEINT, which surfaces through
    Arrow as ``decimal128(38,0)`` while Spark emits int64 — numerically
    equal values, different driver hash.  Every oracle must therefore cast
    integer sums to BIGINT; this test fails on any decimal column in the
    oracle's Arrow output schema.
    """
    tbl = ddb.execute(ORACLES[name]).arrow()
    import pyarrow.types as pat
    bad = [f.name for f in tbl.schema if pat.is_decimal(f.type)]
    assert not bad, (f"{name}: decimal (HUGEINT) columns {bad} — add "
                     f"CAST(... AS BIGINT) in the oracle SQL")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"lang", "approx_distinct"}


# Opt-in heavyweight replica at sf0.1 (the bench scale): same contract,
# bigger tables.  Run explicitly with SPARK_GRAFT_SF01_CONTRACT=1 —
# evidence runs are recorded in BENCH/ROUND4_NOTES.md.
import os

SF01 = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def ddb01():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF01}/{t}.parquet')")
    yield con
    con.close()


@pytest.mark.skipif(os.environ.get("SPARK_GRAFT_SF01_CONTRACT") != "1",
                    reason="heavyweight sf0.1 replica is opt-in")
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle_sf01(spark, ddb01, name):
    df = QUERIES[name](spark, SF01)
    spark_rows = df.collect()
    cur = ddb01.execute(ORACLES[name])
    ddb_cols = [d[0] for d in cur.description]
    ddb_rows = cur.fetchall()
    s_cols, s_vals = _canon(df.columns, [tuple(r) for r in spark_rows])
    d_cols, d_vals = _canon(ddb_cols, ddb_rows)
    assert s_cols == d_cols, f"{name}: column mismatch"
    assert len(s_vals) == len(d_vals), \
        f"{name}: row count {len(s_vals)} vs {len(d_vals)}"
    assert s_vals == d_vals, f"{name}: value mismatch"
