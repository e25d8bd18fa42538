"""Cuckoo filter kernel — deletable approximate membership, mergeable.

Completes the membership family next to the Bloom tiers
(`kernels/bloom.py`, reference /root/reference/pkg/bloom/): a cuckoo
filter (Fan, Andersen, Kaminsky, Mitzenmacher — "Cuckoo Filter:
Practically Better Than Bloom", CoNEXT 2014) supports DELETE like the
reference's counting Bloom (bloom.go:94-114) but at ~1/8 the space
(fbits per entry vs a uint16 counter x k positions), and lookups touch
exactly two buckets instead of k scattered words.

Standard partial-key cuckoo hashing:

- ``m`` buckets (power of two), ``b=4`` slots per bucket, ``fbits``-bit
  fingerprints stored in an (m, b) table; fingerprint 0 is the empty
  sentinel (fingerprints are remapped 0 -> 1).
- element hash = SipHash-2-4 with the fixed reference key (exactly the
  Bloom element hash, hashes.py): i1 = high bits & (m-1), fingerprint
  f = low ``fbits`` bits, i2 = i1 XOR (mix64(f) & (m-1)).  XOR makes
  the pair involutive: either bucket recovers the other from f alone.
- FPR <= 1 - (1 - 2^-fbits)^(2b)  ~=  2b / 2^fbits.

Distribution design (ours — cuckoo tables themselves do not merge):
the TRANSPORT / MERGE encoding is the canonical entry multiset — the
sorted array of (canonical bucket = min(i1, i2), fingerprint) pairs —
and the kicked (m, b) table is a deterministic LOCAL FINALIZE of that
multiset.  Merge = sorted multiset union, which is associative,
commutative, and byte-stable under any partition split (the same gates
every other kernel here passes); placement happens once, wherever the
filter is probed.  This mirrors the sparse Bloom partial encoding
(bloom.py serialize): partials carry ~6 B per inserted key, never the
capacity-sized table.

Placement (``place``) is deterministic given the sorted multiset:
phase 1 fills canonical buckets, phase 2 fills alternates, and only
entries whose BOTH buckets are full enter the classic kick loop — at
the sized load (<= 0.95 * m * b with b=4) that remainder is a handful
of entries, so the kernel stays flat-batch vectorized.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np

from gopie_spark.kernels import codec
from gopie_spark.kernels.hashes import mix64, siphash24_values

U32 = np.uint32
U64 = np.uint64

MAX_KICKS = 500
SLOTS = 4           # b: slots per bucket (the paper's sweet spot)
MAX_LOAD = 0.95     # achievable occupancy at b=4 (Fan et al., table 2)


def _fp_dtype(fbits: int):
    if fbits <= 8:
        return np.uint8
    if fbits <= 16:
        return np.uint16
    if fbits <= 32:
        return U32
    raise ValueError("fbits must be <= 32")


@dataclass(frozen=True)
class CuckooFilter:
    """Partial-key cuckoo filter; state = canonical entry multiset."""

    m: int = 1 << 16        # buckets (power of two)
    fbits: int = 16         # fingerprint bits (FPR ~= 8 / 2^fbits)

    @classmethod
    def from_guess(cls, n: int, p: float) -> "CuckooFilter":
        """Size for n elements at target FPR p: fbits >= log2(2b/p),
        buckets >= n / (b * MAX_LOAD) rounded up to a power of two."""
        fbits = max(4, math.ceil(math.log2(2 * SLOTS / p)))
        if fbits > 32:
            raise ValueError(f"target FPR {p} needs >32 fingerprint bits")
        want = max(1, math.ceil(n / (SLOTS * MAX_LOAD)))
        m = 1
        while m < want:
            m <<= 1
        return cls(m=max(m, 64), fbits=fbits)

    # -- state ------------------------------------------------------------

    def zero(self) -> Dict[str, np.ndarray]:
        return {"buckets": np.zeros(0, dtype=U32),
                "fps": np.zeros(0, dtype=_fp_dtype(self.fbits))}

    def capacity(self) -> int:
        return int(self.m * SLOTS * MAX_LOAD)

    def n(self, state) -> int:
        return int(state["buckets"].size)

    # -- hashing ----------------------------------------------------------

    def _entry_parts(self, values) -> Tuple[np.ndarray, np.ndarray]:
        """(canonical bucket u32, fingerprint) per element, vectorized."""
        h = siphash24_values(values)
        mask = U64(self.m - 1)
        i1 = (h >> U64(32)) & mask
        f = (h & U64((1 << self.fbits) - 1)).astype(U64)
        f[f == 0] = U64(1)                    # 0 is the empty sentinel
        i2 = i1 ^ (mix64(f) & mask)
        canon = np.minimum(i1, i2).astype(U32)
        return canon, f.astype(_fp_dtype(self.fbits))

    def _alt(self, bucket: np.ndarray, fps: np.ndarray) -> np.ndarray:
        mask = U64(self.m - 1)
        return (bucket.astype(U64) ^ (mix64(fps.astype(U64)) & mask)) \
            .astype(U32)

    @staticmethod
    def _canonical(state) -> Dict[str, np.ndarray]:
        """Sort entries by (bucket, fingerprint) — the canonical form all
        boundaries (serialize / remove / place) normalize to, so updates
        stay O(batch) append-only."""
        order = np.lexsort((state["fps"], state["buckets"]))
        return {"buckets": state["buckets"][order],
                "fps": state["fps"][order]}

    # -- update / remove --------------------------------------------------

    def update(self, state, values):
        canon, f = self._entry_parts(values)
        buckets = np.concatenate([state["buckets"], canon])
        fps = np.concatenate([state["fps"], f])
        if buckets.size > self.m * SLOTS:
            raise ValueError(
                f"cuckoo filter over capacity: {buckets.size} entries "
                f"> {self.m * SLOTS} slots — size with from_guess(n, p)")
        return {"buckets": buckets, "fps": fps}

    def remove(self, state, values):
        """Delete ONE stored copy per requested occurrence (standard
        cuckoo delete — only safe for previously-inserted items; keys
        not present are ignored, matching the counting Bloom's
        all-counters-set guard in spirit)."""
        canon, f = self._entry_parts(values)
        del_key, del_cnt = np.unique(
            canon.astype(U64) << U64(32) | f.astype(U64),
            return_counts=True)
        return self._drop(state, del_key, del_cnt, strict=False)

    def subtract(self, a, b):
        """Distributed remove: b's entry multiset (built with the same
        geometry, e.g. via sketch_agg over the removal keys) is deleted
        from a.  RAISES unless b is a sub-multiset of a — removals must
        have been inserted (mirrors BloomCounting.subtract's guard)."""
        b = self._canonical(b)
        bkey = b["buckets"].astype(U64) << U64(32) | b["fps"].astype(U64)
        del_key, del_cnt = np.unique(bkey, return_counts=True)
        return self._drop(a, del_key, del_cnt, strict=True)

    def _drop(self, state, del_key: np.ndarray, del_cnt: np.ndarray,
              strict: bool):
        state = self._canonical(state)
        have_key = state["buckets"].astype(U64) << U64(32) \
            | state["fps"].astype(U64)
        # state keys are sorted (canonical form) => positions via bsearch
        lo = np.searchsorted(have_key, del_key, side="left")
        hi = np.searchsorted(have_key, del_key, side="right")
        take = np.minimum(hi - lo, del_cnt)       # copies to drop per key
        if strict and (take < del_cnt).any():
            raise ValueError("cuckoo subtract: removal multiset is not "
                             "a sub-multiset of the filter's entries")
        drop = np.zeros(have_key.size + 1, dtype=np.int64)
        valid = take > 0
        np.add.at(drop, lo[valid], take[valid])
        np.subtract.at(drop, lo[valid] + take[valid], take[valid])
        keep = np.cumsum(drop[:-1]) == 0
        return {"buckets": state["buckets"][keep], "fps": state["fps"][keep]}

    def merge(self, a, b):
        for st in (a, b):
            if st["buckets"].size and int(st["buckets"].max()) >= self.m:
                raise ValueError("cuckoo merge: entry bucket index out of "
                                 "range — state built with a different "
                                 "geometry")
            if st["fps"].dtype != _fp_dtype(self.fbits):
                raise ValueError("cuckoo merge: fingerprint width mismatch")
        buckets = np.concatenate([a["buckets"], b["buckets"]])
        fps = np.concatenate([a["fps"], b["fps"]])
        if buckets.size > self.m * SLOTS:
            raise ValueError("cuckoo filter merge exceeds capacity")
        return {"buckets": buckets, "fps": fps}

    # -- placement (local finalize) ----------------------------------------

    def place(self, state) -> np.ndarray:
        """Deterministic kicked placement of the canonical multiset into
        the (m, SLOTS) fingerprint table.  Raises if the multiset cannot
        be placed (over MAX_LOAD the classic failure mode)."""
        state = self._canonical(state)
        buckets = state["buckets"].astype(np.int64)
        fps = state["fps"]
        if buckets.size > self.capacity():
            raise ValueError(
                f"cuckoo filter over capacity: {buckets.size} > "
                f"{self.capacity()} (= {MAX_LOAD} * {self.m} * {SLOTS})")
        table = np.zeros((self.m, SLOTS), dtype=_fp_dtype(self.fbits))
        fill = np.zeros(self.m, dtype=np.int64)

        def bulk(bkt: np.ndarray, fp: np.ndarray):
            """Place entries into free slots of their buckets (input
            sorted by bkt); returns the boolean mask of leftovers."""
            if bkt.size == 0:
                return np.zeros(0, dtype=bool)
            first = np.concatenate([[True], bkt[1:] != bkt[:-1]])
            grp_start = np.flatnonzero(first)
            rank = np.arange(bkt.size) - np.repeat(grp_start,
                                                   np.diff(np.append(
                                                       grp_start, bkt.size)))
            slot = fill[bkt] + rank
            ok = slot < SLOTS
            table[bkt[ok], slot[ok]] = fp[ok]
            placed_per = np.minimum(
                np.diff(np.append(grp_start, bkt.size)),
                SLOTS - fill[bkt[grp_start]])
            fill[bkt[grp_start]] += np.maximum(placed_per, 0)
            return ~ok

        # phase 1: canonical buckets (already sorted)
        left = bulk(buckets, fps)
        # phase 2: alternates of the leftovers
        if left.any():
            ab = self._alt(buckets[left].astype(U32), fps[left]) \
                .astype(np.int64)
            af = fps[left]
            order = np.lexsort((af, ab))
            left2 = bulk(ab[order], af[order])
            rb, rf = ab[order][left2], af[order][left2]
        else:
            rb = np.zeros(0, dtype=np.int64)
            rf = fps[:0]
        # phase 3: classic kick loop for the rare both-full remainder
        for start, f in zip(rb.tolist(), rf.tolist()):
            cur_b, cur_f = int(start), f
            placed = False
            for kick in range(MAX_KICKS):
                if fill[cur_b] < SLOTS:
                    table[cur_b, fill[cur_b]] = cur_f
                    fill[cur_b] += 1
                    placed = True
                    break
                victim = kick % SLOTS
                cur_f, table[cur_b, victim] = int(table[cur_b, victim]), cur_f
                cur_b = int(self._alt(np.array([cur_b], dtype=U32),
                                      np.array([cur_f],
                                               dtype=_fp_dtype(self.fbits))
                                      )[0])
            if not placed:
                raise ValueError("cuckoo placement failed (filter too "
                                 "full) — resize with from_guess")
        return table

    # -- probe --------------------------------------------------------------

    def exist(self, state, values) -> np.ndarray:
        """Authentic two-bucket probe against the kicked table (placed
        lazily once per state, cached under a non-serialized key)."""
        table = state.get("_table")
        if table is None or state.get("_table_n") != state["buckets"].size:
            table = self.place(state)
            state["_table"] = table
            state["_table_n"] = state["buckets"].size
        canon, f = self._entry_parts(values)
        alt = self._alt(canon, f)
        hit1 = (table[canon.astype(np.int64)] == f[:, None]).any(axis=1)
        hit2 = (table[alt.astype(np.int64)] == f[:, None]).any(axis=1)
        return hit1 | hit2

    # -- error bounds --------------------------------------------------------

    def guess_false_positive(self, n: int = 0) -> float:
        return 1.0 - (1.0 - 2.0 ** -self.fbits) ** (2 * SLOTS)

    def false_positive(self, state) -> float:
        return self.guess_false_positive(self.n(state))

    # -- codec ----------------------------------------------------------------

    def serialize(self, state) -> bytes:
        state = self._canonical(state)     # byte-stable canonical encoding
        fields = [
            (1, np.array([self.m, SLOTS, self.fbits], dtype=U64).tobytes()),
            (2, np.ascontiguousarray(state["buckets"]).tobytes()),
            (3, np.ascontiguousarray(state["fps"]).tobytes()),
        ]
        return codec.pack(codec.KIND_CUCKOO, fields)

    @classmethod
    def from_blob(cls, blob: bytes) -> "CuckooFilter":
        fields = codec.expect_kind(blob, codec.KIND_CUCKOO)
        m, slots, fbits = np.frombuffer(fields[1], dtype=U64)
        if int(slots) != SLOTS:
            raise ValueError("cuckoo blob slots-per-bucket mismatch")
        return cls(m=int(m), fbits=int(fbits))

    def deserialize(self, blob: bytes):
        fields = codec.expect_kind(blob, codec.KIND_CUCKOO)
        m, slots, fbits = np.frombuffer(fields[1], dtype=U64)
        if (int(m), int(slots), int(fbits)) != (self.m, SLOTS, self.fbits):
            raise ValueError("cuckoo params mismatch")
        buckets = np.frombuffer(fields[2], dtype=U32).copy()
        fps = np.frombuffer(fields[3], dtype=_fp_dtype(self.fbits)).copy()
        if buckets.size != fps.size:
            raise ValueError("cuckoo blob bucket/fingerprint length skew")
        if buckets.size and int(buckets.max()) >= self.m:
            raise ValueError("cuckoo blob bucket index out of range")
        return {"buckets": buckets, "fps": fps}
