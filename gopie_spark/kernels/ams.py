"""AMS (Alon–Matias–Szegedy) F2 sketch — vectorized, mergeable.

Second frequency moment F2 = Σ_x f_x² — the self-join size of a
column, THE statistic a query planner wants before picking a join
strategy, and a repetition-mass measure for a corpus (how concentrated
the frequency distribution is).  The reference has no F2 sketch; this
is a north-rule sketch-tier addition built from the published
algorithm (Alon, Matias, Szegedy, "The space complexity of
approximating the frequency moments", STOC 1996) on the repo's own
hash kernels — NOT a port of any implementation.

Estimator: k = n_medians × n_means independent ±1 four-wise-ish sign
hashes s_j(x) (bit 63 of ``mix64(fnv1_64(x) ^ seed_j)``); the state
keeps z_j = Σ_x f_x·s_j(x).  E[z_j²] = F2 and Var(z_j²) ≤ 2·F2², so the
mean of ``n_means`` estimators has relative standard error
≤ sqrt(2/n_means) and the median of ``n_medians`` such means
concentrates exponentially — the classic median-of-means bound.  The
certificate gate uses 4·sqrt(2/n_means) (≈4σ of one mean; the median
only tightens it).

Mergeability: z vectors ADD under disjoint-multiset union (each z_j is
a linear function of the frequency vector) — associative, commutative,
byte-stable, so the sketch drops straight into ``sketch_agg``'s
partial/merge machinery.  Updates take pre-aggregated (value, count)
batches: one hash per DISTINCT value, like the CMS path.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np

from gopie_spark.kernels import codec
from gopie_spark.kernels.hashes import fnv1_64_values, mix64

U64 = np.uint64
# distinct, arbitrary odd constants decorrelate the per-estimator hash
# streams off one base hash (splitmix-style sequence stepping)
_SEED_STEP = U64(0x9E3779B97F4A7C15)


@dataclass(frozen=True)
class AMS:
    """AMS F2 sketch with ``n_medians`` × ``n_means`` sign counters."""

    n_means: int = 64
    n_medians: int = 5

    @property
    def k(self) -> int:
        return self.n_means * self.n_medians

    # -- lifecycle ---------------------------------------------------------
    def zero(self) -> Dict[str, np.ndarray]:
        return {
            "z": np.zeros(self.k, dtype=np.int64),
            "count": np.zeros(1, dtype=U64),
        }

    def _signs(self, values) -> np.ndarray:
        """±1 int8 matrix of shape (k, n)."""
        h = fnv1_64_values(values)  # uint64[n]
        seeds = (np.arange(1, self.k + 1, dtype=U64) * _SEED_STEP)
        g = mix64(h[None, :] ^ seeds[:, None])
        return np.where((g >> U64(63)).astype(bool),
                        np.int8(1), np.int8(-1))

    def update(self, state, values, counts: Optional[np.ndarray] = None):
        """Add a batch; scalable path is pre-aggregated distinct values
        with exact counts (one hash per distinct key)."""
        s = self._signs(values)
        n = s.shape[1]
        if n == 0:
            return state
        if counts is None:
            cnt = np.ones(n, dtype=np.int64)
        else:
            cnt = np.asarray(counts).astype(np.int64)
        state["z"] += s.astype(np.int64) @ cnt
        state["count"][0] += U64(int(cnt.sum()))
        return state

    def merge(self, a, b):
        if a["z"].shape != b["z"].shape:
            raise ValueError("AMS estimator counts must match")
        a["z"] += b["z"]
        a["count"] += b["count"]
        return a

    # -- finalizers ---------------------------------------------------------
    def estimate(self, state) -> float:
        """F2 estimate: median over ``n_medians`` groups of the mean of
        ``n_means`` squared counters."""
        z = state["z"].astype(np.float64)
        sq = z * z
        means = sq.reshape(self.n_medians, self.n_means).mean(axis=1)
        return float(np.median(means))

    def count(self, state) -> int:
        return int(state["count"][0])

    def inner_product(self, a, b) -> float:
        """JOIN-SIZE estimate between two columns sketched with the
        SAME AMS params (shared sign functions): E[z_a_j * z_b_j] =
        sum_x f_a(x) f_b(x) — the equi-join cardinality (Alon, Gibbons,
        Matias, Szegedy, PODS 1999 'Tracking Join and Self-Join Sizes
        in Limited Storage').  Median-of-means over the products."""
        if a["z"].shape != b["z"].shape:
            raise ValueError("AMS estimator counts must match")
        prod = a["z"].astype(np.float64) * b["z"].astype(np.float64)
        means = prod.reshape(self.n_medians, self.n_means).mean(axis=1)
        return float(np.median(means))

    def inner_product_bound(self, a, b) -> float:
        """Conservative 4-sigma absolute bound for inner_product:
        Var[z_a z_b] <= 2 F2(a) F2(b), so sigma of one mean group is
        sqrt(2 F2a F2b / n_means) — evaluated on the sketch's own F2
        estimates (+1 slack for the zero corner)."""
        f2a, f2b = max(self.estimate(a), 0.0), max(self.estimate(b), 0.0)
        return 4.0 * float(np.sqrt(2.0 * f2a * f2b / self.n_means)) + 1.0

    @property
    def rel_err(self) -> float:
        """Relative standard error of one mean group: sqrt(2/n_means)."""
        return float(np.sqrt(2.0 / self.n_means))

    # -- codec ---------------------------------------------------------------
    def serialize(self, state) -> bytes:
        return codec.pack(codec.KIND_AMS, [
            (1, np.uint32(self.n_means).tobytes()),
            (2, np.uint32(self.n_medians).tobytes()),
            (3, np.ascontiguousarray(state["z"]).tobytes()),
            (4, np.ascontiguousarray(state["count"]).tobytes()),
        ])

    def deserialize(self, blob: bytes):
        kind, fields = codec.unpack(blob)
        if kind != codec.KIND_AMS:
            raise ValueError(f"not an AMS blob (kind={kind})")
        m = int(np.frombuffer(fields[1], dtype=np.uint32)[0])
        d = int(np.frombuffer(fields[2], dtype=np.uint32)[0])
        if (m, d) != (self.n_means, self.n_medians):
            raise ValueError("AMS estimator counts must match")
        return {
            "z": np.frombuffer(fields[3], dtype=np.int64).copy(),
            "count": np.frombuffer(fields[4], dtype=U64).copy(),
        }

    @classmethod
    def from_blob(cls, blob: bytes) -> "AMS":
        kind, fields = codec.unpack(blob)
        if kind != codec.KIND_AMS:
            raise ValueError(f"not an AMS blob (kind={kind})")
        return cls(
            n_means=int(np.frombuffer(fields[1], dtype=np.uint32)[0]),
            n_medians=int(np.frombuffer(fields[2], dtype=np.uint32)[0]))
