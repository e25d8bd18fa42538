"""Vectorized hash kernels with byte-exact parity to the reference semantics.

The reference sketches are keyed by three hash functions (see SURVEY.md §2.4):

- FNV-1 32-bit  — HyperLogLog      (reference: pkg/hyperloglog/hyperloglog.go:40,114-119,
                  Go stdlib ``hash/fnv.New32`` = FNV-1: h = h*prime ^ byte)
- FNV-1 64-bit  — Count-Min sketch (reference: pkg/countminsketch/countmin.go:39,147-152)
- SipHash-2-4   — Bloom filters, fixed 128-bit key ``"0123456789ABCDEF"``
                  (reference: pkg/bloom/siphash.go:13-22)

All kernels here are NumPy-vectorized over *batches* of variable-length byte
strings: input is a flat ``uint8`` data buffer plus int64 offsets (exactly the
Arrow binary-array layout, so pandas/Arrow columns convert with zero copies of
the payload).  The per-byte / per-block loops run over the *maximum* element
length with an active-row mask — column-parallel, never row-at-a-time Python.

uint64 wrap semantics: NumPy integer *array* arithmetic wraps silently (C
semantics), which is exactly Go's behavior.  We never mix Python ints into
array expressions without an explicit ``np.uint64``/``np.uint32`` cast, to
avoid NumPy's int→float64 promotion trap.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import numpy as np
import pyarrow as pa

U8 = np.uint8
U32 = np.uint32
U64 = np.uint64

FNV1_32_OFFSET = np.uint32(2166136261)
FNV1_32_PRIME = np.uint32(16777619)
FNV1_64_OFFSET = np.uint64(14695981039346656037)
FNV1_64_PRIME = np.uint64(1099511628211)

# SipHash-2-4 constants; key is the reference's fixed key "0123456789ABCDEF"
# (pkg/bloom/siphash.go:15), interpreted little-endian as two uint64 halves.
_SIP_KEY = b"0123456789ABCDEF"
SIP_K0 = np.uint64(int.from_bytes(_SIP_KEY[:8], "little"))
SIP_K1 = np.uint64(int.from_bytes(_SIP_KEY[8:], "little"))
_SIP_IV0 = np.uint64(0x736F6D6570736575)
_SIP_IV1 = np.uint64(0x646F72616E646F6D)
_SIP_IV2 = np.uint64(0x6C7967656E657261)
_SIP_IV3 = np.uint64(0x7465646279746573)


def to_buffer(values) -> Tuple[np.ndarray, np.ndarray]:
    """Convert a batch of strings/bytes to (flat uint8 data, int64 offsets).

    Accepts a pandas Series, pyarrow Array, numpy array, or any iterable of
    ``str`` (UTF-8 encoded) / ``bytes``.  Returns the Arrow binary layout:
    ``data`` flat buffer and ``offsets`` of length n+1.
    """
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if not isinstance(values, pa.Array):
        values = pa.array(values)
    t = values.type
    if not pa.types.is_large_binary(t):
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            values = values.cast(pa.large_string()).cast(pa.large_binary())
        elif pa.types.is_binary(t):
            values = values.cast(pa.large_binary())
        else:
            values = pa.array([None if v is None else
                               (v if isinstance(v, bytes) else str(v).encode())
                               for v in values.to_pylist()],
                              type=pa.large_binary())
    if values.null_count:
        values = values.fill_null(b"")
    # large_binary: buffers() = [validity, offsets(int64), data]
    offsets = np.frombuffer(values.buffers()[1], dtype=np.int64,
                            count=len(values) + 1, offset=values.offset * 8)
    buf = values.buffers()[2]
    data = (np.frombuffer(buf, dtype=np.uint8) if buf is not None
            else np.empty(0, dtype=np.uint8))
    return data, offsets


def _lengths(offsets: np.ndarray) -> np.ndarray:
    return offsets[1:] - offsets[:-1]


def fnv1_32(data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """FNV-1 32-bit over each element; returns uint32[n].

    Parity target: Go ``hash/fnv.New32`` as used by the reference HLL
    (pkg/hyperloglog/hyperloglog.go:114-119).
    """
    n = len(offsets) - 1
    h = np.full(n, FNV1_32_OFFSET, dtype=U32)
    if n == 0:
        return h
    lens = _lengths(offsets)
    starts = offsets[:-1]
    maxlen = int(lens.max()) if n else 0
    active_idx = np.arange(n)
    for j in range(maxlen):
        alive = lens[active_idx] > j
        active_idx = active_idx[alive]
        if active_idx.size == 0:
            break
        b = data[starts[active_idx] + j].astype(U32)
        h[active_idx] = (h[active_idx] * FNV1_32_PRIME) ^ b
    return h


def fnv1_64(data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """FNV-1 64-bit over each element; returns uint64[n].

    Parity target: Go ``hash/fnv.New64`` as used by the reference CMS
    (pkg/countminsketch/countmin.go:147-152).
    """
    n = len(offsets) - 1
    h = np.full(n, FNV1_64_OFFSET, dtype=U64)
    if n == 0:
        return h
    lens = _lengths(offsets)
    starts = offsets[:-1]
    maxlen = int(lens.max()) if n else 0
    active_idx = np.arange(n)
    for j in range(maxlen):
        alive = lens[active_idx] > j
        active_idx = active_idx[alive]
        if active_idx.size == 0:
            break
        b = data[starts[active_idx] + j].astype(U64)
        h[active_idx] = (h[active_idx] * FNV1_64_PRIME) ^ b
    return h


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r64 = np.uint64(r)
    inv = np.uint64(64 - r)
    return (x << r64) | (x >> inv)


def _sip_round(v0, v1, v2, v3):
    v0 = v0 + v1
    v1 = _rotl(v1, 13)
    v1 ^= v0
    v0 = _rotl(v0, 32)
    v2 = v2 + v3
    v3 = _rotl(v3, 16)
    v3 ^= v2
    v0 = v0 + v3
    v3 = _rotl(v3, 21)
    v3 ^= v0
    v2 = v2 + v1
    v1 = _rotl(v1, 17)
    v1 ^= v2
    v2 = _rotl(v2, 32)
    return v0, v1, v2, v3


_BYTE_SHIFTS = (np.arange(8, dtype=U64) * np.uint64(8))


def siphash24(data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """SipHash-2-4 (key "0123456789ABCDEF") over each element; uint64[n].

    Parity target: reference Bloom hash (pkg/bloom/siphash.go:26-228 —
    standard SipHash-2-4, little-endian blocks, length byte in the top
    byte of the final block).
    """
    n = len(offsets) - 1
    out = np.empty(n, dtype=U64)
    if n == 0:
        return out
    lens = _lengths(offsets).astype(np.int64)
    starts = offsets[:-1]

    v0 = np.full(n, SIP_K0 ^ _SIP_IV0, dtype=U64)
    v1 = np.full(n, SIP_K1 ^ _SIP_IV1, dtype=U64)
    v2 = np.full(n, SIP_K0 ^ _SIP_IV2, dtype=U64)
    v3 = np.full(n, SIP_K1 ^ _SIP_IV3, dtype=U64)
    t = lens.astype(U64) << np.uint64(56)

    nblocks = lens // 8
    maxblocks = int(nblocks.max()) if n else 0
    for blk in range(maxblocks):
        act = np.nonzero(nblocks > blk)[0]
        if act.size == 0:
            break
        s = starts[act] + 8 * blk
        chunk = data[s[:, None] + np.arange(8)].astype(U64)
        m = (chunk << _BYTE_SHIFTS).sum(axis=1, dtype=U64)
        a0, a1, a2, a3 = v0[act], v1[act], v2[act], v3[act]
        a3 = a3 ^ m
        a0, a1, a2, a3 = _sip_round(a0, a1, a2, a3)
        a0, a1, a2, a3 = _sip_round(a0, a1, a2, a3)
        a0 = a0 ^ m
        v0[act], v1[act], v2[act], v3[act] = a0, a1, a2, a3

    # tail bytes into t (little-endian, below the length byte)
    rem = lens - nblocks * 8
    tail_start = starts + nblocks * 8
    for i in range(7):
        sel = np.nonzero(rem > i)[0]
        if sel.size == 0:
            break
        t[sel] |= data[tail_start[sel] + i].astype(U64) << np.uint64(8 * i)

    v3 ^= t
    v0, v1, v2, v3 = _sip_round(v0, v1, v2, v3)
    v0, v1, v2, v3 = _sip_round(v0, v1, v2, v3)
    v0 ^= t
    v2 ^= np.uint64(0xFF)
    for _ in range(4):
        v0, v1, v2, v3 = _sip_round(v0, v1, v2, v3)
    np.bitwise_xor(v0 ^ v1, v2 ^ v3, out=out)
    return out


def fnv1_32_values(values) -> np.ndarray:
    data, offsets = to_buffer(values)
    return fnv1_32(data, offsets)


def fnv1_64_values(values) -> np.ndarray:
    data, offsets = to_buffer(values)
    return fnv1_64(data, offsets)


def siphash24_values(values) -> np.ndarray:
    data, offsets = to_buffer(values)
    return siphash24(data, offsets)


# ---------------------------------------------------------------------------
# XXH64 — parity target: Spark's `xxhash64` SQL expression (XXH64.java in
# Catalyst is a faithful implementation of Cyan4973/xxHash XXH64, verified
# there against the upstream test vectors; default seed 42).  Having the
# SAME hash locally lets driver-side code reproduce any routing decision a
# Spark plan made with `F.xxhash64` — e.g. which bloom shard holds a url
# (operators/membership._shard_expr) — so a persisted shard table can be
# point-probed with row-group pruning and ZERO Spark (operators/store.py).
# ---------------------------------------------------------------------------
XXH64_SPARK_SEED = 42

_XXP1 = np.uint64(0x9E3779B185EBCA87)
_XXP2 = np.uint64(0xC2B2AE3D27D4EB4F)
_XXP3 = np.uint64(0x165667B19E3779F9)
_XXP4 = np.uint64(0x85EBCA77C2B2AE63)
_XXP5 = np.uint64(0x27D4EB2F165667C5)


def _xx_round(acc: np.ndarray, lane: np.ndarray) -> np.ndarray:
    return _rotl(acc + lane * _XXP2, 31) * _XXP1


def _xx_u64_lanes(data: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Gather one little-endian uint64 lane per element at ``starts``."""
    chunk = data[starts[:, None] + np.arange(8)].astype(U64)
    return (chunk << _BYTE_SHIFTS).sum(axis=1, dtype=U64)


def xxh64(data: np.ndarray, offsets: np.ndarray,
          seed: int = XXH64_SPARK_SEED) -> np.ndarray:
    """XXH64 over each element; returns uint64[n] (reinterpret as int64
    for Spark's signed `xxhash64` value).

    Vectorized like :func:`siphash24`: stripe/word/byte loops run over
    the maximum element length with active-row masks.  Byte-exact parity
    with `F.xxhash64(col)` on string columns is pinned in
    tests/test_hashes parity suites (seed 42 = Spark's fixed seed).
    """
    n = len(offsets) - 1
    out = np.empty(n, dtype=U64)
    if n == 0:
        return out
    mask = (1 << 64) - 1
    s_int = seed & mask
    lens = _lengths(offsets).astype(np.int64)
    starts = offsets[:-1]

    h = np.full(n, np.uint64((s_int + int(_XXP5)) & mask), dtype=U64)
    long_sel = np.nonzero(lens >= 32)[0]
    if long_sel.size:
        a1 = np.full(long_sel.size,
                     np.uint64((s_int + int(_XXP1) + int(_XXP2)) & mask),
                     dtype=U64)
        a2 = np.full(long_sel.size,
                     np.uint64((s_int + int(_XXP2)) & mask), dtype=U64)
        a3 = np.full(long_sel.size, np.uint64(s_int), dtype=U64)
        a4 = np.full(long_sel.size,
                     np.uint64((s_int - int(_XXP1)) & mask), dtype=U64)
        nstripes = lens[long_sel] // 32
        for stripe in range(int(nstripes.max())):
            act = np.nonzero(nstripes > stripe)[0]
            base = starts[long_sel[act]] + 32 * stripe
            a1[act] = _xx_round(a1[act], _xx_u64_lanes(data, base))
            a2[act] = _xx_round(a2[act], _xx_u64_lanes(data, base + 8))
            a3[act] = _xx_round(a3[act], _xx_u64_lanes(data, base + 16))
            a4[act] = _xx_round(a4[act], _xx_u64_lanes(data, base + 24))
        hl = _rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)
        for acc in (a1, a2, a3, a4):
            hl = (hl ^ _xx_round(np.zeros_like(acc), acc)) * _XXP1 + _XXP4
        h[long_sel] = hl

    h += lens.astype(U64)

    # tail: whole 8-byte words after the 32-byte stripes
    done = np.where(lens >= 32, (lens // 32) * 32, 0)
    nwords = (lens - done) // 8
    for w in range(int(nwords.max()) if n else 0):
        act = np.nonzero(nwords > w)[0]
        if act.size == 0:
            break
        lane = _xx_u64_lanes(data, starts[act] + done[act] + 8 * w)
        h[act] = _rotl(h[act] ^ _xx_round(np.zeros_like(lane), lane),
                       27) * _XXP1 + _XXP4
    done = done + nwords * 8

    # one 4-byte word
    sel4 = np.nonzero(lens - done >= 4)[0]
    if sel4.size:
        chunk = data[(starts[sel4] + done[sel4])[:, None]
                     + np.arange(4)].astype(U64)
        lane = (chunk << _BYTE_SHIFTS[:4]).sum(axis=1, dtype=U64)
        h[sel4] = _rotl(h[sel4] ^ (lane * _XXP1), 23) * _XXP2 + _XXP3
        done[sel4] += 4

    # remaining single bytes (at most 3)
    rem = lens - done
    for i in range(3):
        sel = np.nonzero(rem > i)[0]
        if sel.size == 0:
            break
        b = data[starts[sel] + done[sel] + i].astype(U64)
        h[sel] = _rotl(h[sel] ^ (b * _XXP5), 11) * _XXP1

    h ^= h >> np.uint64(33)
    h *= _XXP2
    h ^= h >> np.uint64(29)
    h *= _XXP3
    h ^= h >> np.uint64(32)
    return h


def xxh64_values(values, seed: int = XXH64_SPARK_SEED) -> np.ndarray:
    """XXH64 of a batch of strings/bytes (nulls hash as empty string —
    callers that must mirror Spark's null semantics filter nulls first,
    since `F.xxhash64(NULL)` passes the seed through unchanged)."""
    data, offsets = to_buffer(values)
    return xxh64(data, offsets, seed=seed)


def spark_shard_of(values, shards: int) -> np.ndarray:
    """The shard each value routes to under membership._shard_expr —
    ``pmod(xxhash64(v), shards)`` reproduced locally.  NumPy's int64
    ``%`` is floor-mod, which equals Spark's `pmod` for positive
    divisors, so the signed reinterpretation is the only subtlety."""
    return (xxh64_values(values).view(np.int64) % np.int64(shards)) \
        .astype(np.int64)


def mix64(x: np.ndarray) -> np.ndarray:
    """Cheap stateless uint64 mixer (splitmix64 finalizer) for derived
    hash families (MinHash permutations, salting, jump-hash string keys)."""
    x = x.astype(U64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x
