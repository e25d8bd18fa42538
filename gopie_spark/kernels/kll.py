"""KLL kernel — mergeable rank/quantile sketch (Karnin–Lamport–Liberty).

Not present in the reference (closest capability: quickselect + sorts,
pkg/quickselect/quickselect.go); required by the north rule.  Background:
the KLL paper (FOCS 2016) and "Relative Error Streaming Quantiles"
(PODS 2021, see PAPERS.md).

Structure: a list of compactors; items at level h carry weight 2^h.
Level capacities shrink geometrically (c = 2/3) from ``k`` at the top.
Compaction sorts a level and promotes every other item (alternating the
starting offset deterministically — no RNG, so states are reproducible
given the same sequence of updates/merges).  Merge = level-wise concat
followed by compaction to capacity; rank error is O(1/k) with the usual
KLL guarantees (deterministic offset alternation preserves the same
worst-case envelope in practice and keeps the pipeline replayable).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List

import numpy as np

from gopie_spark.kernels import codec

F8 = np.float64
C = 2.0 / 3.0


@dataclass(frozen=True)
class KLL:
    k: int = 200

    # -- lifecycle ---------------------------------------------------------
    def zero(self) -> Dict[str, object]:
        return {
            "levels": [np.empty(0, dtype=F8)],
            "n": np.zeros(1, dtype=np.int64),
            "minmax": np.array([np.inf, -np.inf], dtype=F8),
            "coin": np.zeros(1, dtype=np.int64),
        }

    def _capacity(self, h: int, num_levels: int) -> int:
        # top level gets k, lower levels shrink by factor c
        depth = num_levels - 1 - h
        return max(2, int(math.ceil(self.k * (C ** depth))))

    def _total_capacity(self, num_levels: int) -> int:
        return sum(self._capacity(h, num_levels) for h in range(num_levels))

    def _size(self, levels: List[np.ndarray]) -> int:
        return sum(lv.size for lv in levels)

    def _compact(self, state):
        levels: List[np.ndarray] = state["levels"]
        while self._size(levels) > self._total_capacity(len(levels)):
            for h in range(len(levels)):
                if levels[h].size > self._capacity(h, len(levels)):
                    lv = np.sort(levels[h], kind="stable")
                    if lv.size % 2 == 1:
                        # keep one item at this level so weights stay exact
                        keep, lv = lv[-1:], lv[:-1]
                    else:
                        keep = np.empty(0, dtype=F8)
                    offset = int(state["coin"][0]) & 1
                    state["coin"][0] += 1
                    promoted = lv[offset::2]
                    levels[h] = keep
                    if h + 1 == len(levels):
                        levels.append(np.empty(0, dtype=F8))
                    levels[h + 1] = np.concatenate([levels[h + 1], promoted])
                    break
            else:
                break

    def update(self, state, values):
        x = np.asarray(values, dtype=F8)
        x = x[~np.isnan(x)]
        if x.size == 0:
            return state
        state["levels"][0] = np.concatenate([state["levels"][0], x])
        state["n"][0] += x.size
        state["minmax"][0] = min(state["minmax"][0], float(x.min()))
        state["minmax"][1] = max(state["minmax"][1], float(x.max()))
        self._compact(state)
        return state

    def merge(self, a, b):
        for h in range(len(b["levels"])):
            if h == len(a["levels"]):
                a["levels"].append(np.empty(0, dtype=F8))
            a["levels"][h] = np.concatenate([a["levels"][h], b["levels"][h]])
        a["n"] += b["n"]
        a["minmax"][0] = min(a["minmax"][0], b["minmax"][0])
        a["minmax"][1] = max(a["minmax"][1], b["minmax"][1])
        a["coin"] += b["coin"]
        self._compact(a)
        return a

    # -- finalizers ---------------------------------------------------------
    def _items_weights(self, state):
        items, weights = [], []
        for h, lv in enumerate(state["levels"]):
            if lv.size:
                items.append(lv)
                weights.append(np.full(lv.size, 2 ** h, dtype=F8))
        if not items:
            return np.empty(0, F8), np.empty(0, F8)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], wt[order]

    def quantile(self, state, q) -> np.ndarray:
        qs = np.atleast_1d(np.asarray(q, dtype=F8))
        items, weights = self._items_weights(state)
        out = np.full(qs.shape, np.nan, dtype=F8)
        if items.size == 0:
            return out
        cum = np.cumsum(weights)
        total = cum[-1]
        targets = np.clip(qs, 0.0, 1.0) * total
        pos = np.searchsorted(cum, targets, side="left")
        pos = np.minimum(pos, items.size - 1)
        out[:] = items[pos]
        out[qs <= 0.0] = state["minmax"][0]
        out[qs >= 1.0] = state["minmax"][1]
        return out

    def rank(self, state, values) -> np.ndarray:
        """Estimated normalized rank of each value in [0,1]."""
        items, weights = self._items_weights(state)
        x = np.asarray(values, dtype=F8)
        if items.size == 0:
            return np.full(x.shape, np.nan, dtype=F8)
        cum = np.concatenate([[0.0], np.cumsum(weights)])
        pos = np.searchsorted(items, x, side="right")
        return cum[pos] / cum[-1]

    def count(self, state) -> int:
        return int(state["n"][0])

    # -- codec ---------------------------------------------------------------
    def serialize(self, state) -> bytes:
        levels: List[np.ndarray] = state["levels"]
        fields = [
            (1, np.array([self.k, len(levels)], dtype=np.int64).tobytes()),
            (2, state["n"].tobytes()),
            (3, state["minmax"].tobytes()),
            (4, state["coin"].tobytes()),
        ]
        for h, lv in enumerate(levels):
            fields.append((10 + h, np.ascontiguousarray(lv).tobytes()))
        return codec.pack(codec.KIND_KLL, fields)

    @classmethod
    def from_blob(cls, blob: bytes) -> "KLL":
        """Reconstruct a correctly-parameterized sketch from a state blob."""
        fields = codec.expect_kind(blob, codec.KIND_KLL)
        k, _ = np.frombuffer(fields[1], dtype=np.int64)
        return cls(k=int(k))

    def deserialize(self, blob: bytes):
        fields = codec.expect_kind(blob, codec.KIND_KLL)
        k, nlevels = np.frombuffer(fields[1], dtype=np.int64)
        if int(k) != self.k:
            raise ValueError("KLL k mismatch")
        return {
            "levels": [np.frombuffer(fields[10 + h], dtype=F8).copy()
                       for h in range(int(nlevels))],
            "n": np.frombuffer(fields[2], dtype=np.int64).copy(),
            "minmax": np.frombuffer(fields[3], dtype=F8).copy(),
            "coin": np.frombuffer(fields[4], dtype=np.int64).copy(),
        }
