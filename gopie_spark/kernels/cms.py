"""Count-Min sketch kernel — vectorized, mergeable, estimate-parity with the reference.

Semantics matched to /root/reference/pkg/countminsketch/countmin.go:
- FNV-1 64-bit element hash; the big-endian digest is split into
  ``lower`` = low 32 bits and ``upper`` = high 32 bits (``:147-152``);
- Kirsch–Mitzenmacher double hashing: row i uses column
  ``(lower + upper*i) mod w`` computed in 64-bit arithmetic (``:70-73``);
- Add increments every row's cell by ``count`` and the total N (``:64-77``);
- Estimate = min over rows (``:85-99``);
- Merge = element-wise counter add + total add, shapes must match
  (``:118-135``; uint64 wrap-around semantics preserved and documented);
- NewGuess sizing w = ceil(e/epsilon), d = ceil(log(1-delta)/log(0.5))
  (``:44-56``); published bound: error <= 2N/w with prob >= 1-(1/2)^d
  (``:21-22``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np

from gopie_spark.kernels import codec
from gopie_spark.kernels.hashes import fnv1_64_values

U64 = np.uint64


def params_from_guess(epsilon: float, delta: float) -> Tuple[int, int]:
    """(width, depth) from error rate epsilon and confidence delta
    (reference NewGuess, countmin.go:44-56)."""
    if not 0 < epsilon < 1:
        raise ValueError("epsilon must be in range (0, 1)")
    if not 0 < delta < 1:
        raise ValueError("delta must be in range (0, 1)")
    width = int(math.ceil(math.e / epsilon))
    depth = int(math.ceil(math.log(1 - delta) / math.log(0.5)))
    return width, depth


@dataclass(frozen=True)
class CMS:
    """Count-Min sketch with a depth x width uint64 counter matrix.

    State is a dict {"matrix": uint64[d, w], "count": uint64[1]} — the
    count rides in a 1-element array so updates mutate in place.
    """

    width: int = 2719   # NewGuess(0.001, 0.99) per reference sizing
    depth: int = 7

    @classmethod
    def from_guess(cls, epsilon: float, delta: float) -> "CMS":
        w, d = params_from_guess(epsilon, delta)
        return cls(width=w, depth=d)

    # -- lifecycle ---------------------------------------------------------
    def zero(self) -> Dict[str, np.ndarray]:
        return {
            "matrix": np.zeros((self.depth, self.width), dtype=U64),
            "count": np.zeros(1, dtype=U64),
        }

    def _indices(self, values) -> np.ndarray:
        """Column index per (row, element): shape (depth, n)."""
        h = fnv1_64_values(values)
        lower = h & U64(0xFFFFFFFF)
        upper = h >> U64(32)
        i = np.arange(self.depth, dtype=U64)[:, None]
        return ((lower[None, :] + upper[None, :] * i) % U64(self.width))

    def update(self, state, values, counts: Optional[np.ndarray] = None):
        """Add a batch of values with optional per-value counts.

        The scalable path is pre-aggregation: callers pass distinct values
        with exact counts (one hash per distinct key instead of per row).
        """
        idx = self._indices(values)
        n = idx.shape[1]
        if counts is None:
            cnt = np.ones(n, dtype=U64)
        else:
            cnt = np.asarray(counts).astype(U64)
        matrix = state["matrix"]
        for i in range(self.depth):
            np.add.at(matrix[i], idx[i].astype(np.int64), cnt)
        state["count"][0] += cnt.sum(dtype=U64)
        return state

    def merge(self, a, b):
        if a["matrix"].shape != b["matrix"].shape:
            raise ValueError("matrix depth/width must match")
        a["matrix"] += b["matrix"]
        a["count"] += b["count"]
        return a

    # -- finalizers ---------------------------------------------------------
    def estimate(self, state, values) -> np.ndarray:
        """Point-query a batch of values; returns uint64[n] (min over rows)."""
        idx = self._indices(values)
        matrix = state["matrix"]
        est = matrix[0][idx[0].astype(np.int64)]
        for i in range(1, self.depth):
            est = np.minimum(est, matrix[i][idx[i].astype(np.int64)])
        return est

    def count(self, state) -> int:
        return int(state["count"][0])

    @property
    def epsilon(self) -> float:
        return math.e / self.width

    @property
    def delta(self) -> float:
        return 1.0 - 0.5 ** self.depth

    # -- codec ---------------------------------------------------------------
    def serialize(self, state) -> bytes:
        """Adaptive dense/sparse counter encoding: a PARTIAL state built
        from a slice of one partition's rows usually touches a small
        fraction of the d x w counters, and the partial-blob shuffle is
        the dominant cost of grouped sketch aggregation at cluster
        scale — emit (flat-index u32, count u64) entries when that is
        smaller than the dense matrix.  Chosen purely from the counter
        contents (equal states serialize byte-equal); ``deserialize``
        reads both formats, so old dense blobs stay valid."""
        mat = np.ascontiguousarray(state["matrix"])
        flat = mat.ravel()
        nz = np.flatnonzero(flat)
        fields = [
            (1, np.array([self.depth, self.width], dtype=np.uint32).tobytes()),
            (2, state["count"].tobytes()),
        ]
        if flat.size < (1 << 32) and 12 * len(nz) < 8 * flat.size:
            fields.append((4, nz.astype(np.uint32).tobytes()))
            fields.append((5, flat[nz].tobytes()))
        else:
            fields.append((3, mat.tobytes()))
        return codec.pack(codec.KIND_CMS, fields)

    @classmethod
    def from_blob(cls, blob: bytes) -> "CMS":
        """Reconstruct a correctly-shaped sketch from a state blob."""
        fields = codec.expect_kind(blob, codec.KIND_CMS)
        d, w = np.frombuffer(fields[1], dtype=np.uint32)
        return cls(width=int(w), depth=int(d))

    def deserialize(self, blob: bytes):
        fields = codec.expect_kind(blob, codec.KIND_CMS)
        d, w = np.frombuffer(fields[1], dtype=np.uint32)
        if (int(d), int(w)) != (self.depth, self.width):
            raise ValueError("CMS shape mismatch")
        if 3 in fields:
            mat = np.frombuffer(fields[3], dtype=U64) \
                .reshape(self.depth, self.width).copy()
        elif 4 in fields and 5 in fields:
            idx = np.frombuffer(fields[4], dtype=np.uint32) \
                .astype(np.int64)
            if len(idx) and idx.max() >= self.depth * self.width:
                raise ValueError("CMS sparse entry index out of range")
            flat = np.zeros(self.depth * self.width, dtype=U64)
            flat[idx] = np.frombuffer(fields[5], dtype=U64)
            mat = flat.reshape(self.depth, self.width)
        else:
            raise ValueError("CMS blob has neither dense nor sparse "
                             "counters")
        return {
            "matrix": mat,
            "count": np.frombuffer(fields[2], dtype=U64).copy(),
        }
