"""HyperLogLog kernel — vectorized, mergeable, estimate-parity with the reference.

Semantics matched to /root/reference/pkg/hyperloglog/hyperloglog.go:
- FNV-1 32-bit element hash (``:40,114-119``);
- register index j = top ``b`` bits of the hash (``:56``);
- rank r = position of the rightmost 1-bit of the hash, capped at
  ``32-b+1`` (``:55,137-144`` — note the reference counts trailing zeros
  of the *full* hash, not of the low ``32-b`` bits; r = min(tz+1, 32-b+1));
- register update = element-wise max (``:59-61``), merge = register max
  (``:95-99``);
- estimator = alpha*m^2 / sum(2^-reg), small-range linear counting when
  E <= 2.5m and empty registers exist, large-range 32-bit correction
  (``:65-87``); alpha table (``:121-134``); NewGuess sizing
  m = 2^ceil(log2((1.04/stdErr)^2)) (``:45-48``).

The error bound asserted in tests mirrors the reference's own tolerance
test (hyperloglog_test.go:426-438): relative error <= 1.04/sqrt(m) scaled.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from gopie_spark.kernels import codec
from gopie_spark.kernels.hashes import fnv1_32_values, fnv1_64_values, mix64

U8 = np.uint8
U32 = np.uint32

_EXP32 = 4294967296.0


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def params_from_std_err(std_err: float) -> int:
    """Return p (register exponent) for a target standard error
    (reference NewGuess, hyperloglog.go:45-48)."""
    m = (1.04 / std_err) ** 2
    return max(4, int(math.ceil(math.log2(m))))


@dataclass(frozen=True)
class HLL:
    """HyperLogLog with m = 2^p dense uint8 registers.

    ``hash_name`` selects the element hash (the reference's SetHash
    equivalent, hyperloglog.go:110-112):

    - ``"mix64"`` (default): FNV-1 64 followed by a splitmix64 finalizer,
      truncated to 32 bits.  FNV-1's final-byte xor only perturbs the low
      8 bits, so keys differing only in trailing characters (sequential
      ids, URLs) collide in the top register-index bits and HLL badly
      undercounts; the finalizer restores avalanche while staying
      deterministic and vectorized.
    - ``"fnv1_32"``: raw FNV-1 32 — byte/index parity with the reference
      default (hyperloglog.go:40,114-119); used by the parity tests.
    """

    p: int = 14
    hash_name: str = "mix64"

    @property
    def m(self) -> int:
        return 1 << self.p

    @property
    def std_err(self) -> float:
        return 1.04 / math.sqrt(self.m)

    # -- lifecycle ---------------------------------------------------------
    def zero(self) -> np.ndarray:
        return np.zeros(self.m, dtype=U8)

    def hash_values(self, values) -> np.ndarray:
        if self.hash_name == "fnv1_32":
            return fnv1_32_values(values)
        if self.hash_name == "mix64":
            return (mix64(fnv1_64_values(values)) >> np.uint64(32)).astype(U32)
        raise ValueError(f"unknown hash {self.hash_name!r}")

    def update(self, state: np.ndarray, values) -> np.ndarray:
        """Add a batch of string/bytes values (vectorized)."""
        return self.update_hashes(state, self.hash_values(values))

    def index_rank(self, h: np.ndarray):
        """Per-hash ``(register index, rank)`` — the one place the
        reference rule lives (index = top p bits; rank =
        min(trailing_zeros + 1, k + 1), h == 0 -> k + 1).  Shared with
        the sliding variant (kernels/slidinghll.py) so the register
        semantics cannot diverge."""
        k = np.uint32(32 - self.p)
        j = (h >> k).astype(np.int64)
        low = h & (~h + U32(1))  # isolate lowest set bit (0 if h == 0)
        tz = np.zeros(h.shape, dtype=np.float64)
        nz = low != 0
        tz[nz] = np.log2(low[nz].astype(np.float64))  # exact for powers of 2
        r = np.minimum(tz + 1.0, float(int(k) + 1)).astype(U8)
        r[~nz] = U8(int(k) + 1)
        return j, r

    def update_hashes(self, state: np.ndarray, h: np.ndarray) -> np.ndarray:
        j, r = self.index_rank(h)
        np.maximum.at(state, j, r)
        return state

    def merge(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        if a.shape != b.shape:
            raise ValueError("registers bucket number must match")
        return np.maximum(a, b)

    def fold(self, state: np.ndarray, p_new: int) -> np.ndarray:
        """Registers folded down to precision ``p_new`` <= p, usable by
        ``HLL(p=p_new, hash_name=...)`` — the bridge for unioning
        sketches built at different precisions (fold the finer one,
        then ``merge``).

        Exactness: the index is the hash's top p bits and the rank its
        trailing-zero count + 1 (independent of p), so the fold is a
        plain max over each group of 2^(p-p_new) registers and equals
        building directly at ``p_new`` — except registers saturated at
        the old cap ``(32-p)+1`` (the hash's low 32-p bits were all
        zero, probability 2^-(32-p) per value): the true trailing-zero
        count is unknown past the cap, so the fold keeps the cap value
        as a LOWER bound (estimates stay conservative, never
        inflated)."""
        if not 4 <= p_new <= self.p:
            raise ValueError(f"cannot fold p={self.p} registers to "
                             f"p={p_new}")
        if p_new == self.p:
            return state.copy()
        g = self.p - p_new
        return state.reshape(1 << p_new, 1 << g).max(axis=1)

    # -- finalizers ---------------------------------------------------------
    def count(self, state: np.ndarray) -> int:
        m = float(self.m)
        sum_inv = np.exp2(-state.astype(np.float64)).sum()
        estimate = _alpha(self.m) * m * m / sum_inv
        if estimate <= 2.5 * m:
            v = int(np.count_nonzero(state == 0))
            if v > 0:
                estimate = m * math.log(m / v)
        elif estimate > _EXP32 / 30.0:
            estimate = -_EXP32 * math.log(1.0 - estimate / _EXP32)
        return int(estimate)

    # -- codec ---------------------------------------------------------------
    def serialize(self, state: np.ndarray) -> bytes:
        """Adaptive dense/sparse encoding (HLL++-style sparse mode,
        public literature): when few registers are set — the norm for
        PARTIAL states under high-group-cardinality aggregation, e.g.
        per-window sketches where each (partition, window) partial saw
        ~hundreds of values against 2^p registers — emit (index, rank)
        entries packed ``idx << 6 | rank`` in one uint32 each, instead
        of the full 2^p register array.  At p=14 a 150-value partial is
        ~0.6 KB sparse vs 16.4 KB dense (~25x fewer shuffle bytes; the
        partial-blob shuffle is THE cost of grouped sketch aggregation
        at cluster scale).  Chosen per state by whichever is smaller,
        so the encoding is a pure function of the registers — equal
        states serialize byte-equal regardless of build path — and
        ``deserialize`` reads both (old dense blobs stay valid)."""
        regs = np.ascontiguousarray(state)
        nz = np.flatnonzero(regs)
        fields = [(1, np.uint32(self.p).tobytes())]
        if 4 * len(nz) < self.m:
            packed = (nz.astype(np.uint32) << np.uint32(6)) \
                | regs[nz].astype(np.uint32)
            fields.append((4, packed.tobytes()))
        else:
            fields.append((2, regs.tobytes()))
        fields.append((3, self.hash_name.encode()))
        return codec.pack(codec.KIND_HLL, fields)

    def union_count(self, a: np.ndarray, b: np.ndarray) -> int:
        """Distinct count of the union — exact sketch algebra (register
        max IS the union sketch; no approximation beyond HLL itself)."""
        return self.count(self.merge(a, b))

    def intersection_estimate(self, a: np.ndarray, b: np.ndarray) -> int:
        """Inclusion-exclusion intersection estimate
        |A ∩ B| ~= |A| + |B| − |A ∪ B|.  Relative error is against the
        UNION size, so small intersections of large sets are noisy —
        standard HLL caveat, documented rather than hidden."""
        est = self.count(a) + self.count(b) - self.union_count(a, b)
        return max(0, int(est))

    @classmethod
    def from_blob(cls, blob: bytes) -> "HLL":
        """Reconstruct a correctly-parameterized sketch from a state blob
        (the blob header carries p and the hash name)."""
        fields = codec.expect_kind(blob, codec.KIND_HLL)
        p = int(np.frombuffer(fields[1], dtype=U32)[0])
        hname = fields.get(3, b"").decode() or "mix64"
        return cls(p=p, hash_name=hname)

    def deserialize(self, blob: bytes) -> np.ndarray:
        fields = codec.expect_kind(blob, codec.KIND_HLL)
        p = int(np.frombuffer(fields[1], dtype=U32)[0])
        if p != self.p:
            raise ValueError(f"HLL p mismatch: blob {p}, sketch {self.p}")
        hname = fields.get(3, b"").decode()
        if hname and hname != self.hash_name:
            raise ValueError(f"HLL hash mismatch: blob {hname}, sketch {self.hash_name}")
        if 2 in fields:
            regs = np.frombuffer(fields[2], dtype=U8)
            if len(regs) != self.m:
                raise ValueError(
                    f"HLL register count mismatch: blob {len(regs)}, "
                    f"sketch {self.m}")
            return regs.copy()
        if 4 not in fields:
            raise ValueError("HLL blob has neither dense nor sparse "
                             "registers")
        packed = np.frombuffer(fields[4], dtype=U32)
        regs = np.zeros(self.m, dtype=U8)
        idx = (packed >> U32(6)).astype(np.int64)
        if len(idx) and idx.max() >= self.m:
            raise ValueError("HLL sparse entry index out of range")
        regs[idx] = (packed & U32(0x3F)).astype(U8)
        return regs
