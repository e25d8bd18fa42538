"""Weighted MinHash — Improved Consistent Weighted Sampling (ICWS).

Estimates the WEIGHTED Jaccard similarity of two weighted sets,

    J_w(A, B) = sum_f min(w_A(f), w_B(f)) / sum_f max(w_A(f), w_B(f)),

the natural near-dup measure over token *multisets* (plain MinHash sees
only the token set — a doc and the same doc with every sentence pasted
twice look identical to it; weighted Jaccard does not).  Algorithm:
Ioffe, "Improved Consistent Sampling, Weighted Minhash and L1
Sketching", ICDM 2010 — public literature, not a reference port (the
reference has no similarity tier at all; this extends the MinHash
family of kernels/minhash.py per the build brief).

Per slot i and feature f with weight w > 0, with fixed per-(f, i)
randoms r, c ~ Gamma(2,1) and b ~ U(0,1):

    t  = floor(ln w / r + b)
    ln y = r * (t - b)
    ln a = ln c - ln y - r        (the "activity"; smaller wins)

The slot's sample is ``(f, t)`` of the feature minimizing ``ln a``;
P[slot matches between A and B] = J_w(A, B) exactly, so the matching
fraction over k slots is an unbiased estimator with
sd = sqrt(J(1-J)/k).

All randoms derive deterministically from mix64 chains over
``f XOR seed_i`` — byte-stable across runs/machines, no RNG state.
Gamma(2,1) is sampled EXACTLY as the sum of two exponentials
(``-ln u1 - ln u2``), no approximation.

Mergeability: for fixed (f, i) randoms, ``ln a`` is non-increasing in
``w`` (t, hence y, is non-decreasing), so the element-wise min-activity
merge of two states is EXACTLY the state of the pointwise-MAX weight
union — the associative/commutative/idempotent merge this repo's sketch
lifecycle requires.  (For SUM-of-weights semantics, aggregate each
document's weights before updating — the document is the atomic unit,
exactly like every other per-doc signature here.)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Sequence, Tuple

import numpy as np

from gopie_spark.kernels import codec
from gopie_spark.kernels.hashes import mix64

U64 = np.uint64
I64 = np.int64
F8 = np.float64

# independent stream tweaks (odd 64-bit constants, splitmix64-style)
_C1 = U64(0x9E3779B97F4A7C15)
_C2 = U64(0xBF58476D1CE4E5B9)
_C3 = U64(0x94D049BB133111EB)
_C4 = U64(0xD6E8FEB86659FD93)
_C5 = U64(0xA5A5A5A5A5A5A5A5)


def _seeds(k: int) -> np.ndarray:
    return mix64(np.arange(101, 101 + k, dtype=U64))


def _unif(h: np.ndarray) -> np.ndarray:
    # (0, 1): top 53 bits + half-ulp offset — never 0, safe to log
    return ((h >> np.uint64(11)).astype(F8) + 0.5) * (2.0 ** -53)


def _activities(feats: np.ndarray, log_w: np.ndarray,
                seed: np.uint64) -> Tuple[np.ndarray, np.ndarray]:
    """(ln_a, t) for every feature under slot ``seed`` — one vectorized
    pass, 5 mix64 calls + 4 logs over the feature array."""
    h = feats ^ seed
    u1 = _unif(mix64(h ^ _C1))
    u2 = _unif(mix64(h ^ _C2))
    u3 = _unif(mix64(h ^ _C3))
    u4 = _unif(mix64(h ^ _C4))
    b = _unif(mix64(h ^ _C5))
    r = -(np.log(u1) + np.log(u2))
    ln_c = np.log(-(np.log(u3) + np.log(u4)))
    t = np.floor(log_w / r + b)
    ln_a = ln_c - r * (t - b) - r
    return ln_a, t.astype(I64)


@dataclass(frozen=True)
class WeightedMinHash:
    """Mergeable ICWS sketch over (uint64 feature, positive weight)."""

    k: int = 128

    # -- lifecycle ---------------------------------------------------------
    def zero(self) -> Dict[str, np.ndarray]:
        return {
            "feat": np.zeros(self.k, dtype=U64),
            "t": np.zeros(self.k, dtype=I64),
            "la": np.full(self.k, np.inf, dtype=F8),
        }

    def update_weighted(self, state, feats, weights):
        """Fold (feature, weight) pairs into the state.  Weights must be
        positive; zero/negative weights are rejected (a zero-weight
        feature is simply absent from the set)."""
        feats = np.ascontiguousarray(feats, dtype=U64)
        weights = np.ascontiguousarray(weights, dtype=F8)
        if feats.shape != weights.shape:
            raise ValueError("feats and weights must align")
        if feats.size == 0:
            return state
        if not (weights > 0).all():
            raise ValueError("weights must be > 0")
        log_w = np.log(weights)
        seeds = _seeds(self.k)
        for i in range(self.k):
            ln_a, t = _activities(feats, log_w, seeds[i])
            j = int(np.argmin(ln_a))
            if ln_a[j] < state["la"][i]:
                state["la"][i] = ln_a[j]
                state["feat"][i] = feats[j]
                state["t"][i] = t[j]
        return state

    def merge(self, a, b):
        if a["la"].shape != b["la"].shape:
            raise ValueError("weighted-minhash k must match")
        take_b = b["la"] < a["la"]
        return {
            "feat": np.where(take_b, b["feat"], a["feat"]),
            "t": np.where(take_b, b["t"], a["t"]),
            "la": np.where(take_b, b["la"], a["la"]),
        }

    # -- batch signatures (the Arrow path) ----------------------------------
    def batch_signatures_flat(self, flat_feats: np.ndarray,
                              flat_weights: np.ndarray,
                              lens: np.ndarray
                              ) -> Tuple[np.ndarray, np.ndarray]:
        """Signatures for a batch of documents from flat (feature,
        weight) arrays + per-document pair counts: returns
        ``(feat[n, k] uint64, t[n, k] int64)``.  Empty documents get the
        all-zero empty signature.  Fully vectorized: per slot, one
        activity pass over the whole flat array + a segmented argmin
        (masked-position reduceat) — no per-document Python."""
        lens = np.asarray(lens, dtype=np.int64)
        n = lens.size
        feat_out = np.zeros((n, self.k), dtype=U64)
        t_out = np.zeros((n, self.k), dtype=I64)
        nonempty = np.nonzero(lens > 0)[0]
        if nonempty.size == 0:
            return feat_out, t_out
        flat_feats = np.ascontiguousarray(flat_feats, dtype=U64)
        flat_weights = np.ascontiguousarray(flat_weights, dtype=F8)
        if not (flat_weights > 0).all():
            raise ValueError("weights must be > 0")
        log_w = np.log(flat_weights)
        m = flat_feats.size
        starts = np.concatenate([[0], np.cumsum(lens[nonempty])[:-1]])
        seg_lens = lens[nonempty]
        pos = np.arange(m, dtype=np.int64)
        seeds = _seeds(self.k)
        for i in range(self.k):
            ln_a, t = _activities(flat_feats, log_w, seeds[i])
            seg_min = np.minimum.reduceat(ln_a, starts)
            # first position attaining the segment min (deterministic)
            is_min = ln_a == np.repeat(seg_min, seg_lens)
            first = np.minimum.reduceat(np.where(is_min, pos, m), starts)
            feat_out[nonempty, i] = flat_feats[first]
            t_out[nonempty, i] = t[first]
        return feat_out, t_out

    # -- estimation ----------------------------------------------------------
    @staticmethod
    def estimate(sig_a: Tuple[np.ndarray, np.ndarray],
                 sig_b: Tuple[np.ndarray, np.ndarray]) -> float:
        fa, ta = sig_a
        fb, tb = sig_b
        return float(((fa == fb) & (ta == tb)).mean())

    @property
    def std_err(self) -> float:
        # worst case over J (J = 1/2)
        return 0.5 / float(np.sqrt(self.k))

    # -- codec ---------------------------------------------------------------
    def serialize(self, state) -> bytes:
        return codec.pack(codec.KIND_WMINHASH, [
            (1, np.array([self.k], dtype=I64).tobytes()),
            (2, np.ascontiguousarray(state["feat"]).tobytes()),
            (3, np.ascontiguousarray(state["t"]).tobytes()),
            (4, np.ascontiguousarray(state["la"]).tobytes()),
        ])

    def deserialize(self, blob: bytes):
        fields = codec.expect_kind(blob, codec.KIND_WMINHASH)
        if int(np.frombuffer(fields[1], dtype=I64)[0]) != self.k:
            raise ValueError("weighted-minhash k mismatch")
        return {
            "feat": np.frombuffer(fields[2], dtype=U64).copy(),
            "t": np.frombuffer(fields[3], dtype=I64).copy(),
            "la": np.frombuffer(fields[4], dtype=F8).copy(),
        }

    @classmethod
    def from_blob(cls, blob: bytes) -> "WeightedMinHash":
        fields = codec.expect_kind(blob, codec.KIND_WMINHASH)
        return cls(k=int(np.frombuffer(fields[1], dtype=I64)[0]))


def weighted_counts_flat(flat_feats: np.ndarray, lens: np.ndarray
                         ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Collapse per-document flat feature streams into per-document
    (unique feature, multiplicity) pairs — the tokenize→bag step before
    :meth:`WeightedMinHash.batch_signatures_flat`, vectorized over the
    whole batch (one lexsort, no per-document Python).

    Returns ``(uniq_feats, counts, pair_lens)`` where ``pair_lens[d]``
    is document d's number of distinct features."""
    lens = np.asarray(lens, dtype=np.int64)
    flat_feats = np.ascontiguousarray(flat_feats, dtype=U64)
    if flat_feats.size == 0:
        return (np.empty(0, dtype=U64), np.empty(0, dtype=F8),
                np.zeros(lens.size, dtype=np.int64))
    doc_of = np.repeat(np.arange(lens.size, dtype=np.int64), lens)
    order = np.lexsort((flat_feats, doc_of))
    sf, sd = flat_feats[order], doc_of[order]
    new = np.empty(sf.size, dtype=bool)
    new[0] = True
    new[1:] = (sf[1:] != sf[:-1]) | (sd[1:] != sd[:-1])
    idx = np.nonzero(new)[0]
    counts = np.diff(np.concatenate([idx, [sf.size]])).astype(F8)
    uniq, udoc = sf[idx], sd[idx]
    pair_lens = np.bincount(udoc, minlength=lens.size).astype(np.int64)
    return uniq, counts, pair_lens
