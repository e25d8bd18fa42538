"""Bloom filter kernels (counting / bit / scalable) — vectorized, mergeable.

Semantics matched to /root/reference/pkg/bloom/:
- element hash = SipHash-2-4 with fixed key "0123456789ABCDEF"
  (siphash.go:13-22) — reimplemented vectorized in hashes.py for
  byte-identical indices;
- size m rounded up to a power of two, min 512, max 2^37; ``shift`` =
  64 - exponent; stored mask = m-1 (bloom.go:49-57,168-178);
- k indices per element: h = hash >> shift, l = low bits, index_i =
  (h + i*l) & mask — one hash, k indices (bloom.go:76-81);
- counting variant: uint16 counters saturating at 65535 (bloom.go:82-86);
  Remove decrements only when all k counters are non-zero (bloom.go:94-114);
- bit variant: packed bitmap (bloombit.go); fill-ratio estimate
  1 - e^(-n/ceil(mask/k)) (bloombit.go:102-104);
- scalable variant: list of bit filters; when the last filter's estimated
  fill ratio >= 0.5 a new filter is appended with tightened FPR p*r^level,
  r = 0.8 (bloomscale.go:56-72); Exist = OR over filters (:78-85);
  compound FPR = 1 - prod(1 - FP_i) (:91-105);
- sizing Guess(n, p): m = ceil(-n ln p / ln^2 2), k = ceil(ln2 * m / n)
  (bloom.go:68-73);
- FPR formulas use the stored mask in the float math, exactly like the
  reference (bloom.go:139-147 uses bf.m which holds m-1) — kept for parity.

Merges are *our addition* (the reference Bloom has no Merge): bit = OR,
counting = saturating add, scalable = level-wise OR (levels of equal
geometry are derived deterministically from the construction params, so
level-wise merge is associative, commutative, and byte-stable).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from gopie_spark.kernels import codec
from gopie_spark.kernels.hashes import siphash24_values

U16 = np.uint16
U64 = np.uint64

LN2 = math.log(2)
MAX_M = 1 << 37


def guess(n: int, p: float) -> Tuple[int, int]:
    """(m, k) from expected elements n and target FPR p (bloom.go:68-73)."""
    m = math.ceil(-1.0 * float(n) * math.log(p) / (LN2 ** 2))
    k = math.ceil(LN2 * m / float(n))
    return int(m), int(k)


def adjust_m(x: int) -> Tuple[int, int]:
    """Round m up to a power of two (min 512, max 2^37); returns
    (m, exponent) (bloom.go:168-178)."""
    if x < 512:
        x = 512
    m, exponent = 1, 0
    while m < x and m < MAX_M:
        m <<= 1
        exponent += 1
    return m, exponent


def _geometry(m: int, k: int) -> Tuple[int, int, int]:
    mm, exponent = adjust_m(m)
    return mm - 1, k, 64 - exponent  # (mask, k, shift)


def _indices(values, mask: int, k: int, shift: int) -> np.ndarray:
    """Index matrix shape (k, n): (h + i*l) & mask per element."""
    hsh = siphash24_values(values)
    sh = np.uint64(shift)
    h = hsh >> sh
    l = (hsh << sh) >> sh
    i = np.arange(k, dtype=U64)[:, None]
    return (h[None, :] + i * l[None, :]) & U64(mask)


@dataclass(frozen=True)
class BloomCounting:
    """Counting Bloom filter: uint16 counters, supports Remove."""

    m: int = 1 << 20
    k: int = 7

    @classmethod
    def from_guess(cls, n: int, p: float) -> "BloomCounting":
        m, k = guess(n, p)
        return cls(m=m, k=k)

    @property
    def geometry(self) -> Tuple[int, int, int]:
        return _geometry(self.m, self.k)

    def zero(self) -> Dict[str, np.ndarray]:
        mask, _, _ = self.geometry
        return {"counters": np.zeros(mask + 1, dtype=U16),
                "n": np.zeros(1, dtype=U64)}

    def update(self, state, values):
        mask, k, shift = self.geometry
        idx = _indices(values, mask, k, shift).ravel().astype(np.int64)
        wide = state["counters"].astype(U64)
        np.add.at(wide, idx, U64(1))
        np.minimum(wide, U64(65535), out=wide)
        state["counters"] = wide.astype(U16)
        state["n"][0] += U64(idx.size // k)
        return state

    def remove(self, state, values):
        """Remove each value: only decrements when all k counters are
        non-zero (bloom.go:94-114).  Sequential per element because each
        removal can change the next element's pre-check."""
        mask, k, shift = self.geometry
        idx = _indices(values, mask, k, shift).astype(np.int64)
        counters = state["counters"]
        for col in range(idx.shape[1]):
            cells = idx[:, col]
            if (counters[cells] == 0).any():
                continue
            np.subtract.at(counters, cells, U16(1))
            state["n"][0] -= U64(1)
        return state

    def exist(self, state, values) -> np.ndarray:
        mask, k, shift = self.geometry
        idx = _indices(values, mask, k, shift).astype(np.int64)
        return (state["counters"][idx] != 0).all(axis=0)

    def merge(self, a, b):
        if a["counters"].shape != b["counters"].shape:
            raise ValueError("bloom filter size must match")
        wide = a["counters"].astype(U64) + b["counters"].astype(U64)
        np.minimum(wide, U64(65535), out=wide)
        a["counters"] = wide.astype(U16)
        a["n"] += b["n"]
        return a

    def subtract(self, a, b):
        """Distributed batch remove: counter-wise ``a - b`` where ``b`` is
        a counting state built (possibly distributed, then merged) over
        the removal batch.

        Equivalent to applying sequential :meth:`remove` (bloom.go:94-114)
        for every element of the removal batch, PROVIDED the batch is a
        sub-multiset of what was added into ``a`` and no counter of ``a``
        saturated — then every per-element all-nonzero pre-check would
        have passed, and decrements commute into one subtraction.  Raises
        when any counter would underflow (a removal that was never added,
        or saturation occurred): order-dependent skip semantics cannot be
        reproduced associatively, so we refuse rather than guess."""
        if a["counters"].shape != b["counters"].shape:
            raise ValueError("bloom filter size must match")
        if (a["counters"] == U16(65535)).any():
            raise ValueError("counting bloom saturated; batch remove "
                             "is not order-independent")
        if (b["counters"] > a["counters"]).any():
            raise ValueError("removal batch is not a sub-multiset of "
                             "the filter's additions")
        a["counters"] = (a["counters"] - b["counters"]).astype(U16)
        a["n"] -= b["n"]
        return a

    def false_positive(self, state) -> float:
        mask, k, _ = self.geometry
        return (1 - math.exp(-float(k * int(state["n"][0])) / mask)) ** k

    def guess_false_positive(self, n: int) -> float:
        mask, k, _ = self.geometry
        return (1 - math.exp(-float(k * n) / mask)) ** k

    def M(self) -> int:
        return self.geometry[0] + 1

    def K(self) -> int:
        return self.k

    def N(self, state) -> int:
        return int(state["n"][0])

    def serialize(self, state) -> bytes:
        """Adaptive dense/sparse counter encoding — see CMS.serialize
        for the rationale (partial-state shuffle bytes should track the
        data the partial actually saw, not the configured capacity).
        Sparse entries are (index u32, count u16); chosen per state by
        size, deserialize reads both."""
        counters = np.ascontiguousarray(state["counters"])
        nz = np.flatnonzero(counters)
        fields = [
            (1, np.array([self.m, self.k], dtype=U64).tobytes()),
            (2, state["n"].tobytes()),
        ]
        if counters.size < (1 << 32) and 6 * len(nz) < 2 * counters.size:
            fields.append((4, nz.astype(np.uint32).tobytes()))
            fields.append((5, counters[nz].tobytes()))
        else:
            fields.append((3, counters.tobytes()))
        return codec.pack(codec.KIND_BLOOM_COUNTING, fields)

    @classmethod
    def from_blob(cls, blob: bytes) -> "BloomCounting":
        """Reconstruct a correctly-sized filter from a state blob."""
        fields = codec.expect_kind(blob, codec.KIND_BLOOM_COUNTING)
        m, k = np.frombuffer(fields[1], dtype=U64)
        return cls(m=int(m), k=int(k))

    def deserialize(self, blob: bytes):
        fields = codec.expect_kind(blob, codec.KIND_BLOOM_COUNTING)
        m, k = np.frombuffer(fields[1], dtype=U64)
        if (int(m), int(k)) != (self.m, self.k):
            raise ValueError("bloom params mismatch")
        n_counters = self.geometry[0] + 1
        if 3 in fields:
            counters = np.frombuffer(fields[3], dtype=U16).copy()
        elif 4 in fields and 5 in fields:
            idx = np.frombuffer(fields[4], dtype=np.uint32) \
                .astype(np.int64)
            if len(idx) and idx.max() >= n_counters:
                raise ValueError("counting-bloom sparse index out of "
                                 "range")
            counters = np.zeros(n_counters, dtype=U16)
            counters[idx] = np.frombuffer(fields[5], dtype=U16)
        else:
            raise ValueError("counting-bloom blob has neither dense nor "
                             "sparse counters")
        return {"counters": counters,
                "n": np.frombuffer(fields[2], dtype=U64).copy()}


@dataclass(frozen=True)
class BloomBit:
    """Standard Bloom filter on a packed uint64 bitmap; merge = bit-OR."""

    m: int = 1 << 20
    k: int = 7

    @classmethod
    def from_guess(cls, n: int, p: float) -> "BloomBit":
        m, k = guess(n, p)
        return cls(m=m, k=k)

    @property
    def geometry(self) -> Tuple[int, int, int]:
        return _geometry(self.m, self.k)

    def zero(self) -> Dict[str, np.ndarray]:
        mask, _, _ = self.geometry
        return {"words": np.zeros((mask + 1) // 64, dtype=U64),
                "n": np.zeros(1, dtype=U64)}

    def update(self, state, values):
        mask, k, shift = self.geometry
        idx = _indices(values, mask, k, shift).ravel()
        words = state["words"]
        np.bitwise_or.at(words, (idx >> U64(6)).astype(np.int64),
                         U64(1) << (idx & U64(63)))
        state["n"][0] += U64(idx.size // k)
        return state

    def exist(self, state, values) -> np.ndarray:
        mask, k, shift = self.geometry
        idx = _indices(values, mask, k, shift)
        words = state["words"]
        bits = (words[(idx >> U64(6)).astype(np.int64)]
                >> (idx & U64(63))) & U64(1)
        return (bits != 0).all(axis=0)

    def merge(self, a, b):
        if a["words"].shape != b["words"].shape:
            raise ValueError("bloom filter size must match")
        np.bitwise_or(a["words"], b["words"], out=a["words"])
        a["n"] += b["n"]
        return a

    def false_positive(self, state) -> float:
        mask, k, _ = self.geometry
        return (1 - math.exp(-float(k * int(state["n"][0])) / mask)) ** k

    def guess_false_positive(self, n: int) -> float:
        mask, k, _ = self.geometry
        return (1 - math.exp(-float(k * n) / mask)) ** k

    def estimated_fill_ratio(self, state) -> float:
        mask, k, _ = self.geometry
        return 1.0 - math.exp(-float(int(state["n"][0])) / math.ceil(mask / k))

    def M(self) -> int:
        return self.geometry[0] + 1

    def K(self) -> int:
        return self.k

    def N(self, state) -> int:
        return int(state["n"][0])

    def serialize(self, state) -> bytes:
        """Adaptive dense/sparse bitmap encoding: sparse form stores the
        NONZERO WORDS as (word-index u32, word u64) pairs — a partial
        filter that saw few keys against a capacity-sized bitmap is
        mostly zero words, and the partial shuffle then carries ~12 B
        per set bit instead of m/8 bytes of mostly-zero bitmap.  Chosen
        per state by size; deserialize reads both formats."""
        words = np.ascontiguousarray(state["words"])
        nz = np.flatnonzero(words)
        fields = [
            (1, np.array([self.m, self.k], dtype=U64).tobytes()),
            (2, state["n"].tobytes()),
        ]
        if words.size < (1 << 32) and 12 * len(nz) < 8 * words.size:
            fields.append((4, nz.astype(np.uint32).tobytes()))
            fields.append((5, words[nz].tobytes()))
        else:
            fields.append((3, words.tobytes()))
        return codec.pack(codec.KIND_BLOOM_BIT, fields)

    @classmethod
    def from_blob(cls, blob: bytes) -> "BloomBit":
        """Reconstruct a correctly-sized filter from a state blob."""
        fields = codec.expect_kind(blob, codec.KIND_BLOOM_BIT)
        m, k = np.frombuffer(fields[1], dtype=U64)
        return cls(m=int(m), k=int(k))

    def deserialize(self, blob: bytes):
        fields = codec.expect_kind(blob, codec.KIND_BLOOM_BIT)
        m, k = np.frombuffer(fields[1], dtype=U64)
        if (int(m), int(k)) != (self.m, self.k):
            raise ValueError("bloom params mismatch")
        n_words = (self.geometry[0] + 1) // 64
        if 3 in fields:
            words = np.frombuffer(fields[3], dtype=U64).copy()
        elif 4 in fields and 5 in fields:
            idx = np.frombuffer(fields[4], dtype=np.uint32) \
                .astype(np.int64)
            if len(idx) and idx.max() >= n_words:
                raise ValueError("bloom sparse word index out of range")
            words = np.zeros(n_words, dtype=U64)
            words[idx] = np.frombuffer(fields[5], dtype=U64)
        else:
            raise ValueError("bloom blob has neither dense nor sparse "
                             "words")
        return {"words": words,
                "n": np.frombuffer(fields[2], dtype=U64).copy()}


@dataclass(frozen=True)
class BloomScalable:
    """Scalable Bloom filter: list of bit filters with tightened FPRs.

    Level geometry is a pure function of (n0, p, r): level 0 sized from
    Guess(n0, p), level i >= 1 from Guess(n0, p * r^i) — matching the
    reference's growth rule (bloomscale.go:56-72).  Because geometry is
    deterministic, two states merge level-by-level with bit-OR, which
    keeps merge associative/commutative (the reference has no merge).
    """

    n0: int = 10000
    p: float = 0.001
    r: float = 0.8
    fill_ratio: float = 0.5

    def level_geometry(self, level: int) -> Tuple[int, int, int]:
        fp = self.p if level == 0 else self.p * (self.r ** level)
        m, k = guess(self.n0, fp)
        return _geometry(m, k)

    def zero(self) -> Dict[str, object]:
        return {"levels": [], "count": np.zeros(1, dtype=U64)}

    def _ensure_level(self, state, level: int):
        while len(state["levels"]) <= level:
            mask, _, _ = self.level_geometry(len(state["levels"]))
            state["levels"].append({
                "words": np.zeros((mask + 1) // 64, dtype=U64),
                "n": np.zeros(1, dtype=U64),
            })

    def _level_capacity(self, level: int, n: int) -> int:
        """How many more adds the filter at ``level`` accepts before the
        pre-add fill-ratio check (bloomscale.go:58) trips.  The check uses
        1 - e^(-n/ceil(mask/k)) >= 0.5 with the value of n *before* each
        add, so adds t = 0..cap-1 are accepted iff fill(n + cap - 1) < 0.5."""
        mask, k, _ = self.level_geometry(level)
        c = math.ceil(mask / k)
        if 1.0 - math.exp(-float(n) / c) >= self.fill_ratio:
            return 0
        cap = max(1, int(math.ceil(c * LN2 - n)))
        while cap > 0 and 1.0 - math.exp(-float(n + cap - 1) / c) >= self.fill_ratio:
            cap -= 1
        while 1.0 - math.exp(-float(n + cap) / c) < self.fill_ratio:
            cap += 1
        return cap

    def update(self, state, values):
        import pyarrow as pa
        arr = values if isinstance(values, pa.Array) else pa.array(
            [v if isinstance(v, bytes) else str(v) for v in list(values)])
        n_total = len(arr)
        pos = 0
        self._ensure_level(state, 0)
        while pos < n_total:
            level = len(state["levels"]) - 1
            lv = state["levels"][level]
            cap = self._level_capacity(level, int(lv["n"][0]))
            if cap == 0:
                self._ensure_level(state, level + 1)
                continue
            take = min(cap, n_total - pos)
            chunk = arr.slice(pos, take)
            mask, k, shift = self.level_geometry(level)
            idx = _indices(chunk, mask, k, shift).ravel()
            np.bitwise_or.at(lv["words"], (idx >> U64(6)).astype(np.int64),
                             U64(1) << (idx & U64(63)))
            lv["n"][0] += U64(take)
            state["count"][0] += U64(take)
            pos += take
        return state

    def exist(self, state, values) -> np.ndarray:
        out: Optional[np.ndarray] = None
        for level, lv in enumerate(state["levels"]):
            mask, k, shift = self.level_geometry(level)
            idx = _indices(values, mask, k, shift)
            bits = (lv["words"][(idx >> U64(6)).astype(np.int64)]
                    >> (idx & U64(63))) & U64(1)
            hit = (bits != 0).all(axis=0)
            out = hit if out is None else (out | hit)
        if out is None:
            import pyarrow as pa
            n = len(values) if hasattr(values, "__len__") else len(pa.array(values))
            return np.zeros(n, dtype=bool)
        return out

    def merge(self, a, b):
        for level, lv_b in enumerate(b["levels"]):
            self._ensure_level(a, level)
            lv_a = a["levels"][level]
            np.bitwise_or(lv_a["words"], lv_b["words"], out=lv_a["words"])
            lv_a["n"] += lv_b["n"]
        a["count"] += b["count"]
        return a

    def false_positive(self, state) -> float:
        rez = 1.0
        for level, lv in enumerate(state["levels"]):
            mask, k, _ = self.level_geometry(level)
            fp = (1 - math.exp(-float(k * int(lv["n"][0])) / mask)) ** k
            rez *= (1.0 - fp)
        return 1.0 - rez

    def guess_false_positive(self, state, n: int) -> float:
        """Compound projected FPR over current levels (bloomscale.go:99-105)."""
        rez = 1.0
        for level in range(max(1, len(state["levels"]))):
            mask, k, _ = self.level_geometry(level)
            fp = (1 - math.exp(-float(k * n) / mask)) ** k
            rez *= (1.0 - fp)
        return 1.0 - rez

    def N(self, state) -> int:
        return int(state["count"][0])

    def serialize(self, state) -> bytes:
        fields: List[Tuple[int, bytes]] = [
            (1, np.array([self.n0], dtype=U64).tobytes()
             + np.array([self.p, self.r, self.fill_ratio], dtype=np.float64).tobytes()),
            (2, state["count"].tobytes()),
            (3, np.array([len(state["levels"])], dtype=U64).tobytes()),
            (4, np.array([int(lv["n"][0]) for lv in state["levels"]],
                         dtype=U64).tobytes()),
        ]
        for i, lv in enumerate(state["levels"]):
            fields.append((10 + i, np.ascontiguousarray(lv["words"]).tobytes()))
        return codec.pack(codec.KIND_BLOOM_SCALABLE, fields)

    @classmethod
    def from_blob(cls, blob: bytes) -> "BloomScalable":
        """Reconstruct the growth parameters from a state blob (level
        geometry is a pure function of (n0, p, r), all in the header)."""
        fields = codec.expect_kind(blob, codec.KIND_BLOOM_SCALABLE)
        n0 = int(np.frombuffer(fields[1][:8], dtype=U64)[0])
        p, r, fill = np.frombuffer(fields[1][8:], dtype=np.float64)
        return cls(n0=n0, p=float(p), r=float(r), fill_ratio=float(fill))

    def deserialize(self, blob: bytes):
        fields = codec.expect_kind(blob, codec.KIND_BLOOM_SCALABLE)
        nlevels = int(np.frombuffer(fields[3], dtype=U64)[0])
        ns = np.frombuffer(fields[4], dtype=U64) if nlevels else np.empty(0, U64)
        levels = []
        for i in range(nlevels):
            levels.append({
                "words": np.frombuffer(fields[10 + i], dtype=U64).copy(),
                "n": np.array([ns[i]], dtype=U64),
            })
        return {"levels": levels,
                "count": np.frombuffer(fields[2], dtype=U64).copy()}
