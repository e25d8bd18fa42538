"""CountSketch kernel — UNBIASED frequency estimation (signed counters).

Charikar, Chen, Farach-Colton, "Finding frequent items in data
streams" (ICALP 2002) — the signed sibling of Count-Min: each row
hashes the element to a column AND a ±1 sign, the estimate is the
MEDIAN over rows of ``sign * cell``.  Versus the reference's Count-Min
(pkg/countminsketch, always an overcount, error ~ N/w) CountSketch is
unbiased with error ~ sqrt(F2/w) — far tighter on skewed token streams
whose F2 is dominated by a few heavy hitters, at the price of allowing
underestimates.  Public literature, not a reference port; completes
the frequency-sketch family (CMS point upper bound, Misra-Gries
deterministic top-k, AMS F2, CountSketch unbiased point estimate).

Guarantee: per row, Var[sign*cell - f_x] = (F2 - f_x^2) / w, so the
median over ``depth`` rows lands within ``3 * sqrt((F2 - f^2)/w)`` of
the true count except with probability ~ (failure of a majority of
independent 1/9-failure rows) <= exp(-depth/4.5).  ``f2_estimate``
(median over rows of the row's sum of squares) is the AMS F2 estimator
riding the same state for free.

Lifecycle: zero / update(values, counts) / merge (= counter ADD — the
signed cells are linear, so the sketch is also a linear projection:
A - B sketches the frequency DIFFERENCE of two streams) / serialize
with the same adaptive dense/sparse partial encoding as the CMS.
Hash family: one FNV-1 64 element hash, then per-row splitmix64 mixes
— byte-stable everywhere.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np

from gopie_spark.kernels import codec
from gopie_spark.kernels.hashes import fnv1_64_values, mix64

U64 = np.uint64
I64 = np.int64


def params_from_guess(epsilon: float, delta: float) -> Tuple[int, int]:
    """(width, depth) such that the estimate is within
    ``3 * epsilon * sqrt(F2)`` with confidence ``delta``:
    w = ceil(1/epsilon^2), d = ceil(4.5 * ln(1/(1-delta))) rounded to
    odd (an odd depth keeps the median a single cell)."""
    if not 0 < epsilon < 1:
        raise ValueError("epsilon must be in range (0, 1)")
    if not 0 < delta < 1:
        raise ValueError("delta must be in range (0, 1)")
    width = int(math.ceil(1.0 / (epsilon * epsilon)))
    depth = int(math.ceil(4.5 * math.log(1.0 / (1.0 - delta))))
    if depth % 2 == 0:
        depth += 1
    return width, max(depth, 1)


@dataclass(frozen=True)
class CountSketch:
    """CountSketch with a depth x width SIGNED int64 counter matrix."""

    width: int = 2048
    depth: int = 7

    @classmethod
    def from_guess(cls, epsilon: float, delta: float) -> "CountSketch":
        w, d = params_from_guess(epsilon, delta)
        return cls(width=w, depth=d)

    # -- lifecycle ---------------------------------------------------------
    def zero(self) -> Dict[str, np.ndarray]:
        return {"matrix": np.zeros((self.depth, self.width), dtype=I64),
                "count": np.zeros(1, dtype=I64)}

    def _pos_sign(self, values) -> Tuple[np.ndarray, np.ndarray]:
        """(positions int64[d, n], signs int64[d, n])."""
        h = fnv1_64_values(values)
        seeds = mix64(np.arange(1, self.depth + 1, dtype=U64) *
                      U64(0x9E3779B97F4A7C15))
        mixed = mix64(h[None, :] ^ seeds[:, None])
        pos = (mixed % U64(self.width)).astype(I64)
        sign = 1 - 2 * ((mixed >> U64(63)).astype(I64))
        return pos, sign

    def update(self, state, values,
               counts: Optional[np.ndarray] = None):
        """Add a batch of values with optional per-value counts (the
        scalable path is pre-aggregated distinct values, exactly like
        the CMS update)."""
        pos, sign = self._pos_sign(values)
        n = pos.shape[1]
        cnt = (np.ones(n, dtype=I64) if counts is None
               else np.asarray(counts).astype(I64))
        matrix = state["matrix"]
        for i in range(self.depth):
            np.add.at(matrix[i], pos[i], sign[i] * cnt)
        state["count"][0] += cnt.sum(dtype=I64)
        return state

    def merge(self, a, b):
        if a["matrix"].shape != b["matrix"].shape:
            raise ValueError("matrix depth/width must match")
        a["matrix"] += b["matrix"]
        a["count"] += b["count"]
        return a

    def subtract(self, a, b):
        """a - b in place (linearity made explicit): the result sketches
        the frequency DIFFERENCE of the two streams, so
        ``estimate(subtract(A, B), x)`` is an unbiased estimate of
        ``f_A(x) - f_B(x)`` and ``f2_estimate`` of the difference sketch
        estimates ``sum_x (f_A(x) - f_B(x))^2`` — the drift-report
        primitive (operators/drift.py).  Requires identical params (same
        hash family/dims) or the cells don't align."""
        if a["matrix"].shape != b["matrix"].shape:
            raise ValueError("matrix depth/width must match")
        a["matrix"] -= b["matrix"]
        a["count"] -= b["count"]
        return a

    # -- finalizers ---------------------------------------------------------
    def estimate(self, state, values) -> np.ndarray:
        """Unbiased point estimates, float64[n] (median over rows of
        the signed cells; may be negative for absent/rare values)."""
        pos, sign = self._pos_sign(values)
        matrix = state["matrix"]
        per_row = np.empty((self.depth, pos.shape[1]), dtype=np.float64)
        for i in range(self.depth):
            per_row[i] = sign[i] * matrix[i][pos[i]]
        return np.median(per_row, axis=0)

    def f2_estimate(self, state) -> float:
        """AMS-style F2 (sum of squared frequencies) estimate: median
        over rows of the row's sum of squared cells."""
        m = state["matrix"].astype(np.float64)
        return float(np.median((m * m).sum(axis=1)))

    def count(self, state) -> int:
        return int(state["count"][0])

    def error_bound(self, f2: float, f: float = 0.0) -> float:
        """3-sigma band around the true count given (exact or
        estimated) F2: ``3 * sqrt((F2 - f^2) / width)``."""
        return 3.0 * math.sqrt(max(f2 - f * f, 0.0) / self.width)

    # -- codec ---------------------------------------------------------------
    def serialize(self, state) -> bytes:
        """Same adaptive dense/sparse partial encoding as the CMS codec
        (cms.py:serialize): partial states from one partition slice
        touch few cells, and the partial-blob shuffle dominates grouped
        aggregation cost at scale."""
        mat = np.ascontiguousarray(state["matrix"])
        flat = mat.ravel()
        nz = np.flatnonzero(flat)
        fields = [
            (1, np.array([self.depth, self.width],
                         dtype=np.uint32).tobytes()),
            (2, state["count"].tobytes()),
        ]
        if flat.size < (1 << 32) and 12 * len(nz) < 8 * flat.size:
            fields.append((4, nz.astype(np.uint32).tobytes()))
            fields.append((5, flat[nz].tobytes()))
        else:
            fields.append((3, flat.tobytes()))
        return codec.pack(codec.KIND_COUNTSKETCH, fields)

    def deserialize(self, blob: bytes):
        fields = codec.expect_kind(blob, codec.KIND_COUNTSKETCH)
        d, w = np.frombuffer(fields[1], dtype=np.uint32)
        if (int(d), int(w)) != (self.depth, self.width):
            raise ValueError("countsketch depth/width mismatch")
        st = self.zero()
        st["count"][:] = np.frombuffer(fields[2], dtype=I64)
        if 3 in fields:
            st["matrix"][:] = np.frombuffer(
                fields[3], dtype=I64).reshape(self.depth, self.width)
        else:
            flat = st["matrix"].ravel()
            idx = np.frombuffer(fields[4], dtype=np.uint32)
            flat[idx.astype(np.int64)] = np.frombuffer(fields[5],
                                                       dtype=I64)
        return st

    @classmethod
    def from_blob(cls, blob: bytes) -> "CountSketch":
        fields = codec.expect_kind(blob, codec.KIND_COUNTSKETCH)
        d, w = np.frombuffer(fields[1], dtype=np.uint32)
        return cls(width=int(w), depth=int(d))
