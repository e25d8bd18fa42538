"""Sliding HyperLogLog — distinct counts over ANY suffix time window,
one pass, bounded mergeable state.

Chabchoub & Hébrail, "Sliding HyperLogLog: Estimating cardinality in a
data stream over a sliding window" (ICDM workshops 2010), on top of the
register semantics of `kernels/hll.py` (which mirrors the reference
/root/reference/pkg/hyperloglog/hyperloglog.go — same element hash,
index = top p bits, rank = trailing zeros + 1 capped):

instead of ONE max rank per register, each register keeps its list of
*future possible maxima* (LFPM) — the Pareto frontier of (timestamp,
rank) pairs where a pair survives iff NO newer pair has rank >= it.
Then for any cutoff ``c`` <= now, the register value of the window
[c, now] is the max rank among pairs with t >= c, and the standard
HLL estimator (alpha, small/large-range corrections — reused verbatim
from HLL.count) answers COUNT(DISTINCT) over that window with the same
1.04/sqrt(m) error.  Expected frontier size is O(ln n) pairs per
register, so state is ~m * ln(n/m) entries regardless of stream length
(and ``expire`` prunes everything older than a retention horizon).

Distribution design: the frontier-union is associative, commutative,
and idempotent, and the canonical encoding (entries lexsorted by
(register, -t, -rank), frontier-pruned) is byte-stable under any
partition split — the same merge gates as every kernel here.  The
flat-batch update turns a whole Arrow batch into (register, t, rank)
triples and prunes once per batch (one lexsort + one segmented
running-max), no per-element Python.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np

from gopie_spark.kernels import codec, timed
from gopie_spark.kernels.hll import HLL, U8, U32

F64 = np.float64
I64 = np.int64


@dataclass(frozen=True)
class SlidingHLL:
    """HLL whose registers remember WHEN each rank was achievable."""

    p: int = 14
    hash_name: str = "mix64"

    @property
    def m(self) -> int:
        return 1 << self.p

    @property
    def std_err(self) -> float:
        return 1.04 / math.sqrt(self.m)

    def _hll(self) -> HLL:
        return HLL(p=self.p, hash_name=self.hash_name)

    # -- state ----------------------------------------------------------------

    def zero(self) -> Dict[str, np.ndarray]:
        return {"reg": np.zeros(0, dtype=U32),
                "ts": np.zeros(0, dtype=F64),
                "rank": np.zeros(0, dtype=U8)}

    def n_entries(self, state) -> int:
        return int(state["reg"].size)

    # -- frontier maintenance ---------------------------------------------------

    def _prune(self, reg, ts, rank) -> Dict[str, np.ndarray]:
        """Keep the Pareto frontier per register: sort (reg asc, t desc,
        rank desc); a pair survives iff its rank strictly exceeds every
        NEWER surviving pair's rank (ties collapse — idempotent)."""
        if reg.size == 0:
            return {"reg": reg.astype(U32), "ts": ts.astype(F64),
                    "rank": rank.astype(U8)}
        order = np.lexsort((-rank.astype(I64), -ts, reg))
        reg, ts, rank = reg[order], ts[order], rank[order]
        first = np.empty(reg.size, dtype=bool)
        first[0] = True
        np.not_equal(reg[1:], reg[:-1], out=first[1:])
        seg = np.cumsum(first) - 1
        # segmented inclusive running max via banded accumulate
        band = seg.astype(I64) * 64 + rank.astype(I64)
        incl = np.maximum.accumulate(band) - seg.astype(I64) * 64
        excl = np.empty_like(incl)
        excl[0] = -1
        excl[1:] = incl[:-1]
        excl[first] = -1
        keep = rank.astype(I64) > excl
        return {"reg": reg[keep].astype(U32), "ts": ts[keep].astype(F64),
                "rank": rank[keep].astype(U8)}

    # -- update / merge -----------------------------------------------------------

    def update(self, state, values):
        vals, ts = timed.struct_parts(values)
        # a null value or missing timestamp contributes nothing
        vals, ts = timed.drop_invalid(vals, ts)
        hll = self._hll()
        # the register index/rank rule is HLL's OWN (kernels/hll.py),
        # so the tested "full-window registers == plain HLL" byte
        # equality is structural, not coincidental
        j, r = hll.index_rank(hll.hash_values(vals))
        return self._prune(
            np.concatenate([state["reg"], j.astype(U32)]),
            np.concatenate([state["ts"], ts]),
            np.concatenate([state["rank"], r]))

    def merge(self, a, b):
        return self._prune(
            np.concatenate([a["reg"], b["reg"]]),
            np.concatenate([a["ts"], b["ts"]]),
            np.concatenate([a["rank"], b["rank"]]))

    def expire(self, state, min_ts: float):
        """Drop frontier entries older than the retention horizon —
        queries with cutoff >= min_ts are unaffected (each register's
        max over [cutoff, now] only involves entries with t >= cutoff)."""
        keep = state["ts"] >= float(min_ts)
        return {"reg": state["reg"][keep], "ts": state["ts"][keep],
                "rank": state["rank"][keep]}

    # -- finalizers -----------------------------------------------------------------

    def registers(self, state, cutoff: Optional[float] = None) -> np.ndarray:
        """Dense uint8 registers of the suffix window [cutoff, now]
        (cutoff None = everything) — a plain HLL state."""
        regs = np.zeros(self.m, dtype=U8)
        if cutoff is None:
            live = slice(None)
        else:
            live = state["ts"] >= float(cutoff)
        np.maximum.at(regs, state["reg"][live].astype(I64),
                      state["rank"][live])
        return regs

    def count(self, state, cutoff: Optional[float] = None) -> int:
        """COUNT(DISTINCT) estimate over the suffix window [cutoff, now]
        — the standard HLL estimator (alpha + small/large-range
        corrections) on the window's registers."""
        return self._hll().count(self.registers(state, cutoff))

    # -- codec ---------------------------------------------------------------------

    def serialize(self, state) -> bytes:
        st = self._prune(state["reg"], state["ts"], state["rank"])
        fields = [
            (1, np.array([self.p], dtype=U32).tobytes()),
            (2, st["reg"].tobytes()),
            (3, st["ts"].tobytes()),
            (4, st["rank"].tobytes()),
            (5, self.hash_name.encode()),
        ]
        return codec.pack(codec.KIND_SLIDING_HLL, fields)

    @classmethod
    def from_blob(cls, blob: bytes) -> "SlidingHLL":
        fields = codec.expect_kind(blob, codec.KIND_SLIDING_HLL)
        p = int(np.frombuffer(fields[1], dtype=U32)[0])
        return cls(p=p, hash_name=fields[5].decode())

    def deserialize(self, blob: bytes):
        fields = codec.expect_kind(blob, codec.KIND_SLIDING_HLL)
        p = int(np.frombuffer(fields[1], dtype=U32)[0])
        if p != self.p or fields[5].decode() != self.hash_name:
            raise ValueError("sliding-hll params mismatch")
        reg = np.frombuffer(fields[2], dtype=U32).copy()
        ts = np.frombuffer(fields[3], dtype=F64).copy()
        rank = np.frombuffer(fields[4], dtype=U8).copy()
        if not (reg.size == ts.size == rank.size):
            raise ValueError("sliding-hll blob length skew")
        if reg.size and int(reg.max()) >= self.m:
            raise ValueError("sliding-hll register index out of range")
        return {"reg": reg, "ts": ts, "rank": rank}
