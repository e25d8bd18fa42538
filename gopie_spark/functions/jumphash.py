"""Jump consistent hash, vectorized — stable bucket assignment.

Capability parity with the reference (pkg/jumphash/jumphash.go:16-39):
Lamport & Veach's jump consistent hash maps a uint64 key to a bucket in
[0, n) with minimal movement when n changes.  We use it for
*deterministic partition identity* in checkpoints (bucket ids independent
of executor count / Spark partition numbering — SURVEY.md §7 hard part 6).

String keys are keyed by FNV-1 64 (the reference uses CRC-64/ECMA; the
choice isn't load-bearing — any stable 64-bit key works — and FNV keeps
one hash family in the engine; documented deviation).
"""

from __future__ import annotations

import numpy as np

from gopie_spark.kernels.hashes import fnv1_64_values

U64 = np.uint64
_LCG = np.uint64(2862933555777941757)
_DENOM_SHIFT = np.uint64(33)


def jump_hash(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    """Vectorized jump consistent hash: uint64 keys -> int32 buckets."""
    if num_buckets <= 0:
        raise ValueError("num_buckets must be positive")
    k = np.asarray(keys, dtype=U64).copy()
    b = np.full(k.shape, -1, dtype=np.int64)
    j = np.zeros(k.shape, dtype=np.int64)
    active = np.ones(k.shape, dtype=bool)
    while active.any():
        b[active] = j[active]
        k[active] = k[active] * _LCG + U64(1)
        denom = ((k[active] >> _DENOM_SHIFT) + U64(1)).astype(np.float64)
        j[active] = ((b[active] + 1).astype(np.float64)
                     * (float(1 << 31) / denom)).astype(np.int64)
        active = active & (j < num_buckets)
    return b.astype(np.int32)


def jump_hash_str(keys, num_buckets: int) -> np.ndarray:
    """Jump hash for string keys (FNV-1 64 keying)."""
    return jump_hash(fnv1_64_values(keys), num_buckets)
