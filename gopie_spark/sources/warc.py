"""WARC (Web ARChive) source: read Common-Crawl-style ``.warc`` /
``.warc.gz`` archives into the north-rule pages schema.

The reference (andy2046/gopie) has no ingestion layer; the north rule's
input is "Common-Crawl-style web pages", and Common Crawl ships WARC.
This is a pure-stdlib parser (``gzip`` + byte slicing — the sandbox has
no warcio) wired into Spark the scale-correct way:

- ``spark.read.format("binaryFile")`` gives ONE TASK PER ARCHIVE, the
  natural unit: CC archives are ~1 GB compressed and must be read
  sequentially anyway (gzip members chain).  A 100-TB crawl is ~10^5
  archives → ~10^5 embarrassingly-parallel tasks, no shuffle.
- Record extraction runs inside ``mapInPandas`` (Arrow-batched; the
  per-record Python work is unavoidable here — WARC is a byte-stream
  format no Catalyst expression parses — but it happens once per
  ARCHIVE, streaming records out as batched rows, never per-row UDF
  calls from the plan).
- Memory: ``binaryFile`` holds one archive's COMPRESSED bytes per task
  (~1 GB for CC); decompression + record extraction then stream, so
  the decompressed side peaks at O(largest record), never O(archive
  decompressed).  Budget executor memory for compressed-archive-size
  x concurrent tasks; archives above ``spark.sql.sources.binaryFile.
  maxLength`` (2 GiB default) are rejected by Spark, not truncated.

WARC specifics handled: WARC/1.0 and 1.1 headers, one-gzip-member-per-
record archives (the CC layout) as well as plain concatenated records,
``WARC-Type: response`` filtering, stripping the HTTP envelope
(status line + headers) off ``application/http`` payloads, and
``WARC-Date`` (ISO-8601) → timestamp.
"""
from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone
from typing import Iterable, Iterator

__all__ = ["parse_warc", "read_warc", "stream_warc",
           "write_warc_file", "warc_schema"]

_CRLF2 = b"\r\n\r\n"


def warc_schema() -> str:
    return ("url string, warc_ts timestamp, record_type string, "
            "content_type string, html binary, warc_path string")


def _read_headers(buf: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in buf.split(b"\r\n"):
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = \
                v.strip().decode("latin-1")
    return headers


def _iter_records(stream: io.BufferedIOBase) -> Iterator[tuple[dict, bytes]]:
    """Yield (headers, payload) for each WARC record on a decompressed
    byte stream.  Records: version line + headers, CRLFCRLF, exactly
    Content-Length payload bytes, CRLFCRLF separator."""
    buf = b""
    while True:
        # accumulate until we hold a full header block
        while _CRLF2 not in buf:
            chunk = stream.read(65536)
            if not chunk:
                return
            buf += chunk
        head, _, buf = buf.partition(_CRLF2)
        if not head.strip():
            continue
        first = head.split(b"\r\n", 1)[0]
        if not first.startswith(b"WARC/"):
            raise ValueError(
                f"not a WARC record header: {first[:40]!r}")
        headers = _read_headers(head)
        length = int(headers.get("content-length", "0"))
        while len(buf) < length:
            chunk = stream.read(max(65536, length - len(buf)))
            if not chunk:
                raise ValueError("truncated WARC record payload")
            buf += chunk
        payload, buf = buf[:length], buf[length:]
        # skip the inter-record CRLFCRLF separator (tolerate missing
        # trailing separator at EOF)
        if buf[:4] == _CRLF2:
            buf = buf[4:]
        elif buf[:2] == b"\r\n":
            buf = buf[2:]
        yield headers, payload


def _strip_http_envelope(payload: bytes, content_type: str) -> bytes:
    """Response records carry the HTTP message (status line + headers +
    body); the body is what a pipeline wants."""
    if content_type.startswith("application/http"):
        _, sep, body = payload.partition(_CRLF2)
        if sep:
            return body
    return payload


def _parse_warc_date(v: str | None) -> datetime | None:
    if not v:
        return None
    try:
        return (datetime.fromisoformat(v.replace("Z", "+00:00"))
                .astimezone(timezone.utc).replace(tzinfo=None))
    except ValueError:
        return None


def parse_warc(raw: bytes, record_types: tuple[str, ...] = ("response",)
               ) -> Iterator[dict]:
    """Parse one archive's bytes (gzipped or plain) into record dicts
    ``{url, warc_ts, record_type, content_type, html}``.  Gzip is
    detected by magic; multi-member (per-record) gzip streams read
    seamlessly (``gzip.GzipFile`` chains members)."""
    stream: io.BufferedIOBase
    if raw[:2] == b"\x1f\x8b":
        stream = gzip.GzipFile(fileobj=io.BytesIO(raw))  # type: ignore[assignment]
    else:
        stream = io.BytesIO(raw)
    for headers, payload in _iter_records(stream):
        rtype = headers.get("warc-type", "")
        if record_types and rtype not in record_types:
            continue
        ctype = headers.get("content-type", "")
        yield {
            "url": headers.get("warc-target-uri"),
            "warc_ts": _parse_warc_date(headers.get("warc-date")),
            "record_type": rtype,
            "content_type": ctype,
            "html": _strip_http_envelope(payload, ctype),
        }


def read_warc(spark, path: str,
              record_types: tuple[str, ...] = ("response",)):
    """DataFrame of WARC records under ``path`` (glob ok): one input
    task per archive file via ``binaryFile``, records streamed out
    through ``mapInPandas``.  Columns: :func:`warc_schema`."""
    import pandas as pd

    files = (spark.read.format("binaryFile").load(path)
             .select("path", "content"))

    def _explode(batches: Iterable["pd.DataFrame"]
                 ) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for path_, content in zip(pdf["path"], pdf["content"]):
                rows = [{**rec, "warc_path": path_}
                        for rec in parse_warc(bytes(content),
                                              record_types)]
                if rows:
                    yield pd.DataFrame(rows)[
                        ["url", "warc_ts", "record_type",
                         "content_type", "html", "warc_path"]]

    return files.mapInPandas(_explode, schema=warc_schema())


def write_warc_file(path: str, records: list[dict],
                    gzip_per_record: bool = True) -> None:
    """Write a minimal WARC/1.0 archive (test fixtures + roundtrip
    checks; one gzip member per record = the Common-Crawl layout).
    Each record dict: ``url``, ``date`` (ISO string), ``body`` bytes,
    optional ``record_type`` / ``content_type`` / ``http`` (when true,
    wrap body in an HTTP 200 envelope like real crawl output)."""
    out = io.BytesIO()
    for rec in records:
        body: bytes = rec["body"]
        ctype = rec.get("content_type", "application/http; msgtype=response")
        if rec.get("http", True):
            body = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                    b"Content-Length: " + str(len(body)).encode() +
                    _CRLF2 + body)
        head = (
            f"WARC/1.0\r\n"
            f"WARC-Type: {rec.get('record_type', 'response')}\r\n"
            f"WARC-Target-URI: {rec['url']}\r\n"
            f"WARC-Date: {rec['date']}\r\n"
            f"Content-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n"
        ).encode("latin-1")
        record = head + b"\r\n" + body + _CRLF2
        out.write(gzip.compress(record) if gzip_per_record else record)
    with open(path, "wb") as fh:
        fh.write(out.getvalue())


def stream_warc(spark, path: str,
                record_types: tuple[str, ...] = ("response",)):
    """Streaming variant of :func:`read_warc`: archives LANDING in
    ``path`` stream through as record rows — the continuous-ingest
    shape (a crawler drops ``.warc.gz`` files; downstream streaming
    dedup/sketches consume records).  File-source semantics give
    exactly-once per archive across restarts from the query's own
    checkpoint; per-archive work is identical to the batch path."""
    import pandas as pd

    files = (spark.readStream.format("binaryFile")
             .schema("path string, modificationTime timestamp, "
                     "length long, content binary")
             .load(path)
             .select("path", "content"))

    def _explode(batches):
        for pdf in batches:
            for path_, content in zip(pdf["path"], pdf["content"]):
                rows = [{**rec, "warc_path": path_}
                        for rec in parse_warc(bytes(content),
                                              record_types)]
                if rows:
                    yield pd.DataFrame(rows)[
                        ["url", "warc_ts", "record_type",
                         "content_type", "html", "warc_path"]]

    return files.mapInPandas(_explode, schema=warc_schema())
