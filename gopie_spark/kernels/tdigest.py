"""t-digest kernel — mergeable quantile sketch (Dunning's merging digest).

Not present in the reference (its order-statistics capability is
quickselect, pkg/quickselect/quickselect.go:5-62, and full sorts); required
by the north rule (BASELINE.json) as the mergeable/distributed
generalization.  Design follows the published merging t-digest algorithm
(Dunning & Ertl, "Computing Extremely Accurate Quantiles Using t-Digests")
with the k1 scale function k(q) = delta/(2*pi) * asin(2q - 1).

Vectorized compression: after sorting centroids by mean, each centroid is
assigned the integer bucket floor(k(q_mid)) of its midpoint quantile and
buckets are reduced with ``np.add.reduceat`` — no per-centroid Python loop.
Bucket k-width is <= 1, preserving the t-digest size/accuracy bound, and
compression is a pure function of the sorted centroid multiset, which makes
merge results canonical (order-insensitive) whenever compression triggers
at the same points.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict

import numpy as np

from gopie_spark.kernels import codec

F8 = np.float64


@dataclass(frozen=True)
class TDigest:
    delta: float = 100.0          # compression: ~delta+1 centroids after compress
    compress_threshold: int = 2048  # compress when centroid count exceeds this

    # -- lifecycle ---------------------------------------------------------
    def zero(self) -> Dict[str, np.ndarray]:
        return {
            "means": np.empty(0, dtype=F8),
            "weights": np.empty(0, dtype=F8),
            "minmax": np.array([np.inf, -np.inf], dtype=F8),
            "n": np.zeros(1, dtype=F8),
        }

    def update(self, state, values) -> Dict[str, np.ndarray]:
        x = np.asarray(values, dtype=F8)
        x = x[~np.isnan(x)]
        if x.size == 0:
            return state
        state["means"] = np.concatenate([state["means"], x])
        state["weights"] = np.concatenate([state["weights"],
                                           np.ones(x.size, dtype=F8)])
        state["minmax"][0] = min(state["minmax"][0], float(x.min()))
        state["minmax"][1] = max(state["minmax"][1], float(x.max()))
        state["n"][0] += x.size
        if state["means"].size > self.compress_threshold:
            self._compress(state)
        return state

    def merge(self, a, b):
        a["means"] = np.concatenate([a["means"], b["means"]])
        a["weights"] = np.concatenate([a["weights"], b["weights"]])
        a["minmax"][0] = min(a["minmax"][0], b["minmax"][0])
        a["minmax"][1] = max(a["minmax"][1], b["minmax"][1])
        a["n"] += b["n"]
        if a["means"].size > self.compress_threshold:
            self._compress(a)
        return a

    def _compress(self, state):
        means, weights = state["means"], state["weights"]
        if means.size <= 1:
            return
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        cum = np.cumsum(weights)
        q_mid = (cum - weights / 2.0) / total
        # k1 scale function bucket; clip q strictly inside (0, 1)
        q_mid = np.clip(q_mid, 1e-12, 1.0 - 1e-12)
        kq = self.delta / (2.0 * math.pi) * np.arcsin(2.0 * q_mid - 1.0)
        bucket = np.floor(kq)
        starts = np.nonzero(np.concatenate([[True], bucket[1:] != bucket[:-1]]))[0]
        w_new = np.add.reduceat(weights, starts)
        m_new = np.add.reduceat(means * weights, starts) / w_new
        state["means"], state["weights"] = m_new, w_new

    # -- finalizers ---------------------------------------------------------
    def canonical(self, state):
        """Force a final canonical compression (used before serialization of
        final results so equal multisets yield byte-equal states)."""
        self._compress(state)
        return state

    def quantile(self, state, q) -> np.ndarray:
        """Estimate quantile(s) q in [0,1]; returns float64 array."""
        qs = np.atleast_1d(np.asarray(q, dtype=F8))
        means, weights = state["means"], state["weights"]
        out = np.full(qs.shape, np.nan, dtype=F8)
        if means.size == 0:
            return out
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        lo, hi = state["minmax"][0], state["minmax"][1]
        if means.size == 1:
            out[:] = means[0]
            return out
        cum = np.cumsum(weights)
        mid = cum - weights / 2.0  # midpoint rank of each centroid
        targets = qs * total
        for i, t in enumerate(targets):
            if t <= mid[0]:
                # interpolate between min and first centroid midpoint
                frac = t / mid[0] if mid[0] > 0 else 1.0
                out[i] = lo + frac * (means[0] - lo)
            elif t >= mid[-1]:
                span = total - mid[-1]
                frac = (t - mid[-1]) / span if span > 0 else 1.0
                out[i] = means[-1] + frac * (hi - means[-1])
            else:
                j = np.searchsorted(mid, t, side="right")
                frac = (t - mid[j - 1]) / (mid[j] - mid[j - 1])
                out[i] = means[j - 1] + frac * (means[j] - means[j - 1])
        return out

    def rank(self, state, values) -> np.ndarray:
        """Estimated CDF: normalized rank of each value in [0,1]
        (piecewise-linear between centroid midpoints — the inverse of
        :meth:`quantile`)."""
        x = np.atleast_1d(np.asarray(values, dtype=F8))
        means, weights = state["means"], state["weights"]
        out = np.full(x.shape, np.nan, dtype=F8)
        if means.size == 0:
            return out
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        lo, hi = state["minmax"][0], state["minmax"][1]
        if means.size == 1:
            out[:] = np.where(x < means[0], 0.0,
                              np.where(x > means[0], 1.0, 0.5))
            return out
        cum = np.cumsum(weights)
        mid = cum - weights / 2.0
        for i, v in enumerate(x):
            if v <= lo:
                out[i] = 0.0
            elif v >= hi:
                out[i] = 1.0
            elif v <= means[0]:
                span = means[0] - lo
                out[i] = (mid[0] * ((v - lo) / span if span > 0 else 1.0)) \
                    / total
            elif v >= means[-1]:
                span = hi - means[-1]
                frac = (v - means[-1]) / span if span > 0 else 0.0
                out[i] = (mid[-1] + frac * (total - mid[-1])) / total
            else:
                j = np.searchsorted(means, v, side="right")
                frac = (v - means[j - 1]) / (means[j] - means[j - 1])
                out[i] = (mid[j - 1] + frac * (mid[j] - mid[j - 1])) / total
        return out

    def count(self, state) -> int:
        return int(state["n"][0])

    # -- codec ---------------------------------------------------------------
    def serialize(self, state) -> bytes:
        return codec.pack(codec.KIND_TDIGEST, [
            (1, np.array([self.delta, float(self.compress_threshold)],
                         dtype=F8).tobytes()),
            (2, state["n"].tobytes()),
            (3, state["minmax"].tobytes()),
            (4, np.ascontiguousarray(state["means"]).tobytes()),
            (5, np.ascontiguousarray(state["weights"]).tobytes()),
        ])

    @classmethod
    def from_blob(cls, blob: bytes) -> "TDigest":
        """Reconstruct a correctly-parameterized digest from a state blob
        (delta and compression threshold ride in the header)."""
        fields = codec.expect_kind(blob, codec.KIND_TDIGEST)
        delta, thresh = np.frombuffer(fields[1], dtype=F8)
        return cls(delta=float(delta), compress_threshold=int(thresh))

    def deserialize(self, blob: bytes):
        fields = codec.expect_kind(blob, codec.KIND_TDIGEST)
        return {
            "means": np.frombuffer(fields[4], dtype=F8).copy(),
            "weights": np.frombuffer(fields[5], dtype=F8).copy(),
            "minmax": np.frombuffer(fields[3], dtype=F8).copy(),
            "n": np.frombuffer(fields[2], dtype=F8).copy(),
        }
