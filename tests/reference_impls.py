"""Serial, scalar reference implementations used as oracles in tests.

These are independent pure-Python re-statements of the published hash
algorithms (FNV-1 from the FNV spec; SipHash-2-4 from the SipHash paper),
NOT translations of the Go files — they exist so the vectorized NumPy
kernels can be checked element-by-element, and so SipHash can be validated
against the official test vectors.
"""

from __future__ import annotations

MASK32 = 0xFFFFFFFF
MASK64 = 0xFFFFFFFFFFFFFFFF


def fnv1_32(data: bytes) -> int:
    h = 2166136261
    for b in data:
        h = ((h * 16777619) & MASK32) ^ b
    return h


def fnv1_64(data: bytes) -> int:
    h = 14695981039346656037
    for b in data:
        h = ((h * 1099511628211) & MASK64) ^ b
    return h


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def siphash24(key: bytes, data: bytes) -> int:
    assert len(key) == 16
    k0 = int.from_bytes(key[:8], "little")
    k1 = int.from_bytes(key[8:], "little")
    v0 = k0 ^ 0x736F6D6570736575
    v1 = k1 ^ 0x646F72616E646F6D
    v2 = k0 ^ 0x6C7967656E657261
    v3 = k1 ^ 0x7465646279746573

    def sipround(v0, v1, v2, v3):
        v0 = (v0 + v1) & MASK64
        v1 = _rotl(v1, 13)
        v1 ^= v0
        v0 = _rotl(v0, 32)
        v2 = (v2 + v3) & MASK64
        v3 = _rotl(v3, 16)
        v3 ^= v2
        v0 = (v0 + v3) & MASK64
        v3 = _rotl(v3, 21)
        v3 ^= v0
        v2 = (v2 + v1) & MASK64
        v1 = _rotl(v1, 17)
        v1 ^= v2
        v2 = _rotl(v2, 32)
        return v0, v1, v2, v3

    b = len(data) & 0xFF
    off = 0
    while len(data) - off >= 8:
        m = int.from_bytes(data[off:off + 8], "little")
        v3 ^= m
        v0, v1, v2, v3 = sipround(v0, v1, v2, v3)
        v0, v1, v2, v3 = sipround(v0, v1, v2, v3)
        v0 ^= m
        off += 8
    t = (b << 56) & MASK64
    tail = data[off:]
    for i, byte in enumerate(tail):
        t |= byte << (8 * i)
    v3 ^= t
    v0, v1, v2, v3 = sipround(v0, v1, v2, v3)
    v0, v1, v2, v3 = sipround(v0, v1, v2, v3)
    v0 ^= t
    v2 ^= 0xFF
    for _ in range(4):
        v0, v1, v2, v3 = sipround(v0, v1, v2, v3)
    return v0 ^ v1 ^ v2 ^ v3


GOPIE_SIP_KEY = b"0123456789ABCDEF"
