"""TLV-style versioned blob codec for sketch state.

Precedent: the reference's TLV record framing (pkg/tlv/tlv.go:52-130 —
type byte + big-endian length + payload).  Our variant is a single
self-describing blob per sketch state so states can travel through Spark
``BinaryType`` columns and parquet checkpoints:

    magic  b"GSK1"           (4 bytes)
    kind   uint8             (sketch type tag)
    nfield uint8             (number of TLV fields)
    fields nfield x [tag uint8 | len uint32 BE | payload]

Field payloads are raw little-endian numpy buffers or packed struct
scalars; each sketch module owns its tag meanings.  Versioning = bump the
magic; shape checks happen in each sketch's ``merge`` (mirroring the
reference's merge-time shape validation, hyperloglog.go:91-93,
countmin.go:119-125).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

MAGIC = b"GSK1"

KIND_HLL = 1
KIND_CMS = 2
KIND_BLOOM_COUNTING = 3
KIND_BLOOM_BIT = 4
KIND_BLOOM_SCALABLE = 5
KIND_TDIGEST = 6
KIND_KLL = 7
KIND_MINHASH = 8
KIND_SIMHASH = 9
KIND_MISRAGRIES = 10
KIND_AMS = 11
KIND_THETA = 12
KIND_FREQDIR = 13
KIND_DDSKETCH = 14
KIND_WMINHASH = 15
KIND_COUNTSKETCH = 16
KIND_CUCKOO = 17
KIND_SLIDING_HLL = 18
KIND_WINDOW_CMS = 19
KIND_EXACTSTATS = 20


def pack(kind: int, fields: List[Tuple[int, bytes]]) -> bytes:
    out = [MAGIC, struct.pack(">BB", kind, len(fields))]
    for tag, payload in fields:
        out.append(struct.pack(">BI", tag, len(payload)))
        out.append(payload)
    return b"".join(out)


def unpack(blob: bytes) -> Tuple[int, Dict[int, bytes]]:
    if blob[:4] != MAGIC:
        raise ValueError("not a gopie_spark sketch blob (bad magic)")
    kind, nfield = struct.unpack_from(">BB", blob, 4)
    pos = 6
    fields: Dict[int, bytes] = {}
    for _ in range(nfield):
        tag, ln = struct.unpack_from(">BI", blob, pos)
        pos += 5
        fields[tag] = blob[pos:pos + ln]
        pos += ln
    return kind, fields


def expect_kind(blob: bytes, kind: int) -> Dict[int, bytes]:
    k, fields = unpack(blob)
    if k != kind:
        raise ValueError(f"sketch kind mismatch: got {k}, want {kind}")
    return fields
