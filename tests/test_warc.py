"""WARC source: pure-stdlib parser + one-task-per-archive Spark read.

Fixtures are self-written archives (write_warc_file — the CC layout:
one gzip member per record, HTTP envelope around the body), so the
roundtrip pins both directions of the format handling.
"""
import gzip

import pytest
from pyspark.sql import functions as F

from gopie_spark.sources.warc import (parse_warc, read_warc,
                                      write_warc_file)

RECORDS = [
    {"url": f"https://h{i % 5}.example.com/p/{i}",
     "date": f"2026-01-0{1 + i % 9}T0{i % 10}:00:00Z",
     "body": (f"<html><head><title>T{i}</title></head>"
              f"<body><p>doc {i} body text</p></body></html>"
              ).encode()}
    for i in range(20)
]


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    write_warc_file(str(d / "a.warc.gz"), RECORDS[:12])
    write_warc_file(str(d / "b.warc"), RECORDS[12:],
                    gzip_per_record=False)
    return str(d)


def test_parse_roundtrip_gzip_members(warc_dir):
    raw = open(f"{warc_dir}/a.warc.gz", "rb").read()
    recs = list(parse_warc(raw))
    assert [r["url"] for r in recs] == [r["url"] for r in RECORDS[:12]]
    # HTTP envelope stripped: payload is exactly the original body
    assert [r["html"] for r in recs] == [r["body"] for r in RECORDS[:12]]
    assert recs[0]["warc_ts"].year == 2026
    assert all(r["record_type"] == "response" for r in recs)


def test_parse_plain_and_type_filter(warc_dir):
    raw = open(f"{warc_dir}/b.warc", "rb").read()
    assert [r["html"] for r in parse_warc(raw)] == \
        [r["body"] for r in RECORDS[12:]]
    # request records are skipped by default, kept when asked
    import io
    extra = RECORDS[0] | {"record_type": "request"}
    buf = io.BytesIO()
    write_warc_file("/tmp/_req.warc", [extra], gzip_per_record=False)
    raw2 = open("/tmp/_req.warc", "rb").read()
    assert list(parse_warc(raw2)) == []
    assert len(list(parse_warc(raw2, record_types=("request",)))) == 1


def test_parse_rejects_garbage():
    with pytest.raises(ValueError):
        list(parse_warc(b"NOT-A-WARC\r\n\r\npayload"))


def test_read_warc_spark(spark, warc_dir):
    df = read_warc(spark, warc_dir + "/*")
    rows = df.orderBy("url").collect()
    assert len(rows) == 20
    assert df.columns == ["url", "warc_ts", "record_type",
                          "content_type", "html", "warc_path"]
    want = sorted(RECORDS, key=lambda r: r["url"])
    assert [r["url"] for r in rows] == [r["url"] for r in want]
    assert [bytes(r["html"]) for r in rows] == [r["body"] for r in want]
    # one input task per archive: binaryFile scan, no shuffle
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_read_warc_feeds_pages_pipeline(spark, warc_dir):
    """WARC → pages schema → byte-identical extract_text per url (the
    north-rule invariant applied to the ingestion path)."""
    from gopie_spark.sources.pages import extract_text, with_extracted_text
    df = with_extracted_text(read_warc(spark, warc_dir + "/*"),
                             html_col="html", out_col="text")
    got = {r["url"]: r["text"] for r in df.collect()}
    want = {r["url"]: extract_text(r["body"]) for r in RECORDS}
    assert got == want


def test_load_table_warc_format(spark, warc_dir, tmp_path):
    """catalog.load_table(fmt='warc') returns pages-shaped rows with
    extracted text — jobs ingest raw archives via --format warc."""
    from gopie_spark.sources.catalog import load_table
    df = load_table(spark, warc_dir + "/*", "warc")
    assert {"url", "warc_ts", "html", "text"} <= set(df.columns)
    assert df.count() == 20
    assert df.filter(F.col("text").contains("body text")).count() == 20


def test_stream_warc_incremental_exactly_once(spark, tmp_path):
    """Archives landing in a directory stream through exactly once per
    archive across query restarts (file-source checkpoint): run 1 sees
    archive A's records; after B lands, run 2 from the same checkpoint
    emits ONLY B's records."""
    from gopie_spark.sources.warc import stream_warc, write_warc_file
    land = tmp_path / "landing"
    land.mkdir()
    ckpt = str(tmp_path / "ckpt")
    write_warc_file(str(land / "a.warc.gz"), RECORDS[:7])

    got_batches = []

    def _run():
        batch_urls = []
        q = (stream_warc(spark, str(land))
             .writeStream.trigger(availableNow=True)
             .option("checkpointLocation", ckpt)
             .foreachBatch(lambda df, _i: batch_urls.extend(
                 r["url"] for r in df.select("url").collect()))
             .start())
        q.awaitTermination(120)
        return sorted(batch_urls)

    got_batches.append(_run())
    write_warc_file(str(land / "b.warc.gz"), RECORDS[7:12])
    got_batches.append(_run())
    assert got_batches[0] == sorted(r["url"] for r in RECORDS[:7])
    assert got_batches[1] == sorted(r["url"] for r in RECORDS[7:12])


def test_stream_warc_feeds_streaming_sketch(spark, tmp_path):
    """The full north-star ingest path in one piece: WARC archives
    landing in a directory -> streaming records -> per-host streaming
    HLL state, byte-equal to the one-shot batch sketch over the same
    pages after both archives land."""
    from gopie_spark.kernels.hll import HLL
    from gopie_spark.operators.hoststats import extract_host
    from gopie_spark.operators.sketch_agg import STATE_COL, sketch_agg
    from gopie_spark.sources.warc import (read_warc, stream_warc,
                                          write_warc_file)
    from gopie_spark.streaming import StreamingSketch

    land = tmp_path / "land"
    land.mkdir()
    write_warc_file(str(land / "a.warc.gz"), RECORDS[:12])
    hll = HLL(p=12)
    ss = StreamingSketch(spark, hll, ["host"], "url",
                         str(tmp_path / "state"))
    pages = stream_warc(spark, str(land)) \
        .withColumn("host", extract_host("url")) \
        .select("host", "url")
    ckpt = str(tmp_path / "ckpt")

    q = ss.attach(pages, checkpoint_dir=ckpt)
    q.awaitTermination(120)
    write_warc_file(str(land / "b.warc.gz"), RECORDS[12:])
    q = ss.attach(stream_warc(spark, str(land))
                  .withColumn("host", extract_host("url"))
                  .select("host", "url"), checkpoint_dir=ckpt)
    q.awaitTermination(120)

    got = {r["host"]: bytes(r[STATE_COL])
           for r in ss.current_states().collect()}
    batch = read_warc(spark, str(land) + "/*") \
        .withColumn("host", extract_host("url")).select("host", "url")
    want = {r["host"]: bytes(r[STATE_COL])
            for r in sketch_agg(batch, ["host"], "url", hll).collect()}
    assert got == want and len(got) == 5


def test_parse_warc_property_adversarial_bodies():
    """Property: roundtrip survives arbitrary binary bodies — including
    ones embedding CRLFCRLF and fake 'WARC/1.0' headers — because
    records are length-prefixed, never delimiter-scanned."""
    from hypothesis import given, settings, strategies as st

    body = st.binary(min_size=0, max_size=400).map(
        lambda b: b + b"\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n")

    @settings(max_examples=25, deadline=None)
    @given(st.lists(body, min_size=1, max_size=6),
           st.booleans())
    def check(bodies, gz):
        recs = [{"url": f"https://x.example.com/{i}",
                 "date": "2026-03-04T05:06:07Z", "body": b,
                 "http": False,
                 "content_type": "application/octet-stream"}
                for i, b in enumerate(bodies)]
        import io
        write_warc_file("/tmp/_prop.warc", recs, gzip_per_record=gz)
        out = list(parse_warc(open("/tmp/_prop.warc", "rb").read()))
        assert [r["html"] for r in out] == bodies
        assert [r["url"] for r in out] == \
            [r["url"] for r in recs]

    check()
