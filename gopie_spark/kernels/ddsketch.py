"""DDSketch kernel — mergeable quantile sketch with RELATIVE-error
guarantee (Masson, Rim, Lee — "DDSketch: a fast and fully-mergeable
quantile sketch with relative-error guarantees", VLDB 2019; PAPERS.md).

Not present in the reference (closest capability: quickselect + sorts,
pkg/quickselect/quickselect.go); added under the north rule's quantile
tier alongside t-digest (rank-error, centroid-based) and KLL
(rank-error, compactor-based).  DDSketch differs in two ways that
matter at corpus scale:

1. the guarantee is *relative*: the returned estimate ``e`` for the
   rank-``k`` item ``x_k`` satisfies ``|e - x_k| <= alpha * x_k`` —
   tails of heavy-tailed web distributions (doc lengths, latencies)
   keep full precision where rank-error sketches blur them;
2. the bucket index is a closed-form function of the value
   (``ceil(log_gamma x)`` with ``gamma = (1+alpha)/(1-alpha)``), so a
   distributed build needs NO sketch object at all — it is a plain
   ``groupBy(bucket).count()`` (see operators/sketch_agg.py
   ``ddsketch_quantiles``, the fully-Catalyst build path).  This kernel
   is the protocol twin for streaming state, checkpoint blobs and the
   merge-associativity suite.

Stores: positive buckets, mirrored negative buckets, and an exact zero
counter (values in ``(-min_value, min_value)`` count as zero — the
paper's ``key(x)`` domain guard).  Memory is bounded by ``max_bins``
per store via the paper's collapsing scheme: the LOWEST-indexed buckets
(values nearest zero, where relative error is least interesting) fold
into the lowest kept bucket, so the guarantee degrades only below a
data-dependent floor and never at the tail.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict

import numpy as np

from gopie_spark.kernels import codec

F8 = np.float64
I8 = np.int64


@dataclass(frozen=True)
class DDSketch:
    alpha: float = 0.01
    max_bins: int = 2048
    min_value: float = 1e-9   # |x| below this counts as exactly zero

    @property
    def gamma(self) -> float:
        return (1.0 + self.alpha) / (1.0 - self.alpha)

    # -- bucket mapping ------------------------------------------------------
    def bucket(self, x) -> np.ndarray:
        """``ceil(log_gamma |x|)`` for ``|x| >= min_value`` (callers split
        sign/zero).  Vectorized; the same closed form the Catalyst build
        path evaluates JVM-side."""
        a = np.asarray(x, dtype=F8)
        return np.ceil(np.log(a) / math.log(self.gamma)).astype(I8)

    def value(self, b) -> np.ndarray:
        """Representative value of bucket ``b``: the midpoint
        ``2*gamma^b/(gamma+1)``, within ``alpha`` relative error of every
        value the bucket covers."""
        g = self.gamma
        return 2.0 * np.power(g, np.asarray(b, dtype=F8)) / (g + 1.0)

    # -- lifecycle -----------------------------------------------------------
    def zero(self) -> Dict[str, object]:
        return {
            "pos_b": np.empty(0, dtype=I8), "pos_c": np.empty(0, dtype=I8),
            "neg_b": np.empty(0, dtype=I8), "neg_c": np.empty(0, dtype=I8),
            "zero": np.zeros(1, dtype=I8),
            "minmax": np.array([np.inf, -np.inf], dtype=F8),
        }

    def _fold(self, b: np.ndarray, c: np.ndarray, nb: np.ndarray,
              nc: np.ndarray):
        """Merge (bucket, count) runs, keeping buckets sorted unique, then
        collapse the lowest buckets if over ``max_bins``."""
        ab = np.concatenate([b, nb])
        ac = np.concatenate([c, nc])
        ub, inv = np.unique(ab, return_inverse=True)
        uc = np.zeros(ub.size, dtype=I8)
        np.add.at(uc, inv, ac)
        if ub.size > self.max_bins:
            cut = ub.size - self.max_bins
            # collapse buckets [0, cut] into index `cut` (lowest kept)
            uc[cut] += uc[:cut].sum()
            ub, uc = ub[cut:], uc[cut:]
        return ub, uc

    def update(self, state, values):
        x = np.asarray(values, dtype=F8)
        x = x[~np.isnan(x)]
        if x.size == 0:
            return state
        state["minmax"][0] = min(state["minmax"][0], float(x.min()))
        state["minmax"][1] = max(state["minmax"][1], float(x.max()))
        az = np.abs(x) < self.min_value
        state["zero"][0] += int(az.sum())
        pos = x[(~az) & (x > 0)]
        neg = x[(~az) & (x < 0)]
        if pos.size:
            pb, pc = np.unique(self.bucket(pos), return_counts=True)
            state["pos_b"], state["pos_c"] = self._fold(
                state["pos_b"], state["pos_c"], pb, pc.astype(I8))
        if neg.size:
            nb, nc = np.unique(self.bucket(-neg), return_counts=True)
            state["neg_b"], state["neg_c"] = self._fold(
                state["neg_b"], state["neg_c"], nb, nc.astype(I8))
        return state

    def merge(self, a, b):
        a["pos_b"], a["pos_c"] = self._fold(a["pos_b"], a["pos_c"],
                                            b["pos_b"], b["pos_c"])
        a["neg_b"], a["neg_c"] = self._fold(a["neg_b"], a["neg_c"],
                                            b["neg_b"], b["neg_c"])
        a["zero"] += b["zero"]
        a["minmax"][0] = min(a["minmax"][0], b["minmax"][0])
        a["minmax"][1] = max(a["minmax"][1], b["minmax"][1])
        return a

    # -- finalizers ------------------------------------------------------------
    def _walk(self, state):
        """(values, counts) in ascending value order: negatives by
        descending |bucket| (most negative first), the zero bin, then
        positives by ascending bucket."""
        vals = [-self.value(state["neg_b"][::-1]),
                np.zeros(1 if state["zero"][0] else 0, dtype=F8),
                self.value(state["pos_b"])]
        cnts = [state["neg_c"][::-1].astype(F8),
                state["zero"][:1].astype(F8) if state["zero"][0]
                else np.empty(0, F8),
                state["pos_c"].astype(F8)]
        return np.concatenate(vals), np.concatenate(cnts)

    def quantile(self, state, q) -> np.ndarray:
        """Lower-quantile estimate: the representative value of the bucket
        holding the 1-indexed rank ``floor(q*(n-1)) + 1`` item."""
        qs = np.atleast_1d(np.asarray(q, dtype=F8))
        vals, cnts = self._walk(state)
        out = np.full(qs.shape, np.nan, dtype=F8)
        if vals.size == 0:
            return out
        cum = np.cumsum(cnts)
        n = cum[-1]
        ranks = np.floor(np.clip(qs, 0.0, 1.0) * (n - 1)) + 1.0
        pos = np.searchsorted(cum, ranks, side="left")
        pos = np.minimum(pos, vals.size - 1)
        out[:] = vals[pos]
        out[qs <= 0.0] = state["minmax"][0]
        out[qs >= 1.0] = state["minmax"][1]
        return out

    def count(self, state) -> int:
        return int(state["pos_c"].sum() + state["neg_c"].sum()
                   + state["zero"][0])

    # -- codec -----------------------------------------------------------------
    def serialize(self, state) -> bytes:
        params = np.array([self.alpha, float(self.max_bins),
                           self.min_value], dtype=F8)
        return codec.pack(codec.KIND_DDSKETCH, [
            (1, params.tobytes()),
            (2, state["zero"].tobytes()),
            (3, state["minmax"].tobytes()),
            (4, np.ascontiguousarray(state["pos_b"]).tobytes()),
            (5, np.ascontiguousarray(state["pos_c"]).tobytes()),
            (6, np.ascontiguousarray(state["neg_b"]).tobytes()),
            (7, np.ascontiguousarray(state["neg_c"]).tobytes()),
        ])

    @classmethod
    def from_blob(cls, blob: bytes) -> "DDSketch":
        fields = codec.expect_kind(blob, codec.KIND_DDSKETCH)
        alpha, max_bins, min_value = np.frombuffer(fields[1], dtype=F8)
        return cls(alpha=float(alpha), max_bins=int(max_bins),
                   min_value=float(min_value))

    def deserialize(self, blob: bytes):
        fields = codec.expect_kind(blob, codec.KIND_DDSKETCH)
        alpha, max_bins, _mv = np.frombuffer(fields[1], dtype=F8)
        if abs(float(alpha) - self.alpha) > 1e-12 \
                or int(max_bins) != self.max_bins:
            raise ValueError("DDSketch parameter mismatch")
        return {
            "zero": np.frombuffer(fields[2], dtype=I8).copy(),
            "minmax": np.frombuffer(fields[3], dtype=F8).copy(),
            "pos_b": np.frombuffer(fields[4], dtype=I8).copy(),
            "pos_c": np.frombuffer(fields[5], dtype=I8).copy(),
            "neg_b": np.frombuffer(fields[6], dtype=I8).copy(),
            "neg_c": np.frombuffer(fields[7], dtype=I8).copy(),
        }
