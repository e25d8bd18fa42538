"""Theta/KMV distinct-count sketch with set algebra — vectorized, mergeable.

K-Minimum-Values sketch (Bar-Yossef et al. 2002; the unbiased estimator
and multiset set-operation estimators are from Beyer, Haas, Reinwald,
Sismanis, Gemulla, "On Synopses for Distinct-Value Estimation Under
Multiset Operations", SIGMOD 2007; the same sample-below-theta idea is
the Theta-Sketch Framework of Dasgupta, Lang, Malkin, Rhodes, Thaler,
PODS 2016).  The reference has no theta sketch — this is a north-rule
sketch-tier addition next to HLL: it trades HLL's smaller state for
REAL set algebra (intersection / difference estimates with published
error, not inclusion-exclusion on three estimates).

State: the ``k`` smallest distinct 64-bit hash values of the inputs,
kept as a sorted unique ``uint64`` array.  Hash = splitmix-mixed FNV-1
64 over the value bytes (the repo's own hash kernels).

Estimator (Beyer et al. 2007 §3, unbiased):

- ``len(S) < k``      -> exact: every distinct hash was retained, so
  the estimate IS the distinct count (modulo 64-bit hash collisions,
  P ~ n^2 / 2^65 — negligible at any realistic n).
- ``len(S) == k``     -> ``(k - 1) / U_(k)`` where ``U_(k)`` is the
  k-th smallest hash mapped to (0, 1].  Relative standard error
  ``1 / sqrt(k - 2)``.

Merge = k smallest of the union of the retained sets.  min-k of a set
union is associative, commutative, and idempotent, and the sorted
unique array makes states BYTE-EQUAL across arbitrary partition splits
and merge orders — the strongest form of this repo's merge gate (HLL
register-max has the same property; theta keeps it while also
supporting intersections).

Set algebra over merged sketches (Beyer et al. 2007 §5): with
``U = merge(A, B)`` (at its trim threshold theta = U_(k)), every
retained union hash below theta is checked for membership in both
sides' retained sets — valid because each side's own threshold is
>= U's.  ``rho = |{h in U : h in A and h in B}|`` gives the Jaccard
estimate ``rho / K`` (K = retained union size), and
``|A n B| ~= (rho / K) * est(U)``.  Difference:
``|A \\ B| = est(U) - est(B)``.  Conservative 4-sigma bounds for the
certificates combine the binomial deviation of rho/K with the union
estimator's RSE — see :meth:`intersect_bound` / :meth:`diff_bound`.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np

from gopie_spark.kernels import codec
from gopie_spark.kernels.hashes import fnv1_64_values, mix64

U64 = np.uint64
_TWO64 = float(2 ** 64)


@dataclass(frozen=True)
class Theta:
    """KMV/theta sketch keeping the ``k`` smallest distinct hashes."""

    k: int = 4096

    # -- lifecycle ---------------------------------------------------------
    def zero(self) -> Dict[str, np.ndarray]:
        return {"hashes": np.empty(0, dtype=U64)}

    def _hash(self, values) -> np.ndarray:
        return mix64(fnv1_64_values(values))

    def update(self, state, values, counts: Optional[np.ndarray] = None):
        """Add a batch of values.  ``counts`` is accepted for protocol
        compatibility and ignored — distinct counting is multiplicity
        blind, so pre-aggregated (value, count) batches cost one hash
        per distinct key, same as the CMS/AMS path."""
        h = self._hash(values)
        if h.size == 0:
            return state
        merged = np.union1d(state["hashes"], h)  # sorted + deduped
        state["hashes"] = merged[: self.k]
        return state

    def merge(self, a, b):
        merged = np.union1d(a["hashes"], b["hashes"])
        a["hashes"] = merged[: self.k]
        return a

    # -- finalizers ----------------------------------------------------------
    def _theta(self, state) -> float:
        """Trim threshold as a fraction of the hash space, (0, 1]."""
        h = state["hashes"]
        if h.size < self.k:
            return 1.0
        # U_(k): k-th smallest hash mapped to (0,1] (the +1 avoids a
        # zero threshold on the measure-zero h==0 corner)
        return (float(h[self.k - 1]) + 1.0) / _TWO64

    def estimate(self, state) -> float:
        h = state["hashes"]
        if h.size < self.k:
            return float(h.size)  # exact tier
        return (self.k - 1) / self._theta(state)

    @property
    def rel_err(self) -> float:
        """RSE of the theta-tier estimator (Beyer et al. 2007 Thm 1)."""
        return 1.0 / float(np.sqrt(self.k - 2))

    # -- set algebra -----------------------------------------------------------
    def union_estimate(self, a, b) -> float:
        u = self.merge({"hashes": a["hashes"].copy()},
                       {"hashes": b["hashes"].copy()})
        return self.estimate(u)

    def _rho(self, a, b) -> Tuple[int, int, float]:
        """(rho, K, est_union): intersection survivors among the union
        sketch's retained hashes, the retained union size, and the
        union estimate."""
        u = self.merge({"hashes": a["hashes"].copy()},
                       {"hashes": b["hashes"].copy()})
        uh = u["hashes"]
        both = np.isin(uh, a["hashes"]) & np.isin(uh, b["hashes"])
        return int(both.sum()), int(uh.size), self.estimate(u)

    def jaccard_estimate(self, a, b) -> float:
        rho, kk, _ = self._rho(a, b)
        return rho / kk if kk else 0.0

    def intersect_estimate(self, a, b) -> float:
        rho, kk, est_u = self._rho(a, b)
        return (rho / kk) * est_u if kk else 0.0

    def diff_estimate(self, a, b) -> float:
        """Estimate of ``|A \\ B|`` (elements of A not in B)."""
        _, _, est_u = self._rho(a, b)
        return max(est_u - self.estimate(b), 0.0)

    # -- certificate bounds (4-sigma, conservative) -----------------------------
    def intersect_bound(self, a, b) -> float:
        """Absolute 4-sigma bound for :meth:`intersect_estimate`.

        est = jhat * est_u with jhat = rho/K.  Below-threshold retention
        is (conditionally on theta) uniform, so rho ~ Binomial-like with
        sigma(jhat) <= sqrt(jhat(1-jhat)/K); est_u carries its own RSE.
        First-order: sigma(est) <= sigma(jhat)*est_u + jhat*est_u*rse.
        (+1 absolute slack so a zero-variance corner never gates at 0.)
        """
        rho, kk, est_u = self._rho(a, b)
        if kk == 0:
            return 1.0
        j = rho / kk
        sig_j = float(np.sqrt(max(j * (1.0 - j), 1.0 / kk) / kk))
        return 4.0 * (sig_j * est_u + j * est_u * self.rel_err) + 1.0

    def diff_bound(self, a, b) -> float:
        """Absolute 4-sigma bound for :meth:`diff_estimate`:
        sigma <= (est_u + est_b) * rse, estimators positively correlated
        so this sum is conservative."""
        _, _, est_u = self._rho(a, b)
        return 4.0 * (est_u + self.estimate(b)) * self.rel_err + 1.0

    def union_bound(self, a, b) -> float:
        return 4.0 * self.union_estimate(a, b) * self.rel_err + 1.0

    # -- codec -------------------------------------------------------------------
    def serialize(self, state) -> bytes:
        return codec.pack(codec.KIND_THETA, [
            (1, np.uint32(self.k).tobytes()),
            (2, np.ascontiguousarray(state["hashes"]).tobytes()),
        ])

    def deserialize(self, blob: bytes):
        fields = codec.expect_kind(blob, codec.KIND_THETA)
        k = int(np.frombuffer(fields[1], dtype=np.uint32)[0])
        if k != self.k:
            raise ValueError(f"theta k mismatch: blob {k}, sketch {self.k}")
        return {"hashes": np.frombuffer(fields[2], dtype=U64).copy()}

    @classmethod
    def from_blob(cls, blob: bytes) -> "Theta":
        fields = codec.expect_kind(blob, codec.KIND_THETA)
        return cls(k=int(np.frombuffer(fields[1], dtype=np.uint32)[0]))
