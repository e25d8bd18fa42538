"""Frequent Directions matrix sketch — deterministic, mergeable
low-rank covariance summary of an embedding matrix.

Algorithm: Liberty, "Simple and Deterministic Matrix Sketching", KDD
2013; mergeability and the tightened bound from Ghashami, Liberty,
Phillips, Woodruff, "Frequent Directions: Simple and Deterministic
Matrix Sketching", SICOMP 2016 — public literature; the reference has
no matrix sketch.  This is the embedding-analytics counterpart of the
item sketches: ONE pass over 10^12 embedding rows yields an ell x d
sketch B (KBs) whose Gram matrix approximates the full covariance:

    0 <= x'(A'A)x - x'(B'B)x <= ||A||_F^2 / ell     for all unit x
    i.e.  ||A'A - B'B||_2 <= ||A||_F^2 / ell

(the KDD'13 Thm 1.1 form for sketch size ell with a 2*ell-row buffer,
shrinking by delta = sigma_ell^2, which is what this implementation
does).  Merging two sketches (stack + shrink) keeps the SAME bound
with the Frobenius masses added (SICOMP'16 §3) — so per-partition
sketches tree-merge exactly like the item sketches, and the bound
certificate needs only ell and the accumulated ||A||_F^2 (tracked in
the state).

What it answers over a web-corpus embedding table: top singular
directions (topic/PCA axes) for drift monitoring, covariance for
whitening, effective-rank / spectral-mass reports — without ever
materializing the d x d Gram of 10^12 rows.

Protocol note: update() consumes (n, d) float64 ROW BATCHES, not a
scalar series, so it rides operators/matrix.py's mapInArrow partials
rather than the scalar sketch_agg path; merge/serialize plug into
merge_partials unchanged.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import numpy as np

from gopie_spark.kernels import codec

_F64 = np.float64


@dataclass(frozen=True)
class FreqDir:
    """FD sketch: ell retained directions over dimension d (buffer is
    2*ell rows; shrink halves it back via SVD)."""

    ell: int = 64
    d: int = 64

    # -- lifecycle ---------------------------------------------------------
    def zero(self) -> Dict[str, np.ndarray]:
        return {
            "B": np.zeros((2 * self.ell, self.d), dtype=_F64),
            "n": np.zeros(1, dtype=np.int64),       # filled buffer rows
            "fro2": np.zeros(1, dtype=_F64),        # accumulated ||A||_F^2
            "rows": np.zeros(1, dtype=np.int64),    # rows processed
        }

    def _shrink(self, state) -> None:
        """SVD the full buffer, subtract sigma_ell^2, keep ell rows."""
        try:
            _, s, vt = np.linalg.svd(state["B"], full_matrices=False)
        except np.linalg.LinAlgError:
            # gesdd very rarely fails to converge; scipy's gesvd driver
            # is the standard robust fallback when available, else fall
            # back to the eigendecomposition of B'B (symmetric — always
            # converges; fine here because only s and vt are needed)
            try:
                from scipy.linalg import svd as _ssvd
                _, s, vt = _ssvd(state["B"], full_matrices=False,
                                 lapack_driver="gesvd")
            except ImportError:
                w, v = np.linalg.eigh(state["B"].T @ state["B"])
                order = np.argsort(w)[::-1]
                s = np.sqrt(np.maximum(w[order], 0.0))
                vt = v[:, order].T
        delta = s[self.ell - 1] ** 2 if len(s) >= self.ell else 0.0
        s2 = np.sqrt(np.maximum(s * s - delta, 0.0))
        k = min(self.ell, len(s2))
        state["B"][:] = 0.0
        state["B"][:k] = s2[:k, None] * vt[:k]
        state["n"][0] = k

    def update(self, state, rows: np.ndarray):
        """Append an (n, d) float64 batch, shrinking whenever the
        buffer fills."""
        rows = np.asarray(rows, dtype=_F64)
        if rows.ndim != 2 or rows.shape[1] != self.d:
            raise ValueError(
                f"FreqDir d={self.d}: batch shape {rows.shape}")
        state["fro2"][0] += float((rows * rows).sum())
        state["rows"][0] += rows.shape[0]
        cap = 2 * self.ell
        i = 0
        while i < rows.shape[0]:
            n = int(state["n"][0])
            take = min(cap - n, rows.shape[0] - i)
            state["B"][n:n + take] = rows[i:i + take]
            state["n"][0] = n + take
            i += take
            if state["n"][0] == cap:
                self._shrink(state)
        return state

    def merge(self, a, b):
        """Stack b's filled rows into a (re-using update's buffering);
        masses add.  Bound-preserving per SICOMP'16 §3."""
        if a["B"].shape != b["B"].shape:
            raise ValueError("FreqDir shapes must match")
        nb = int(b["n"][0])
        if nb:
            # update() adds fro2 of the appended rows = ||B_b||_F^2,
            # but the merged mass must be a.fro2 + b.fro2 (the RAW
            # masses): correct by the difference.
            raw = float(b["fro2"][0])
            rows_b = int(b["rows"][0])
            self.update(a, b["B"][:nb])
            a["fro2"][0] += raw - float((b["B"][:nb] ** 2).sum())
            a["rows"][0] += rows_b - nb
        else:
            a["fro2"][0] += float(b["fro2"][0])
            a["rows"][0] += int(b["rows"][0])
        return a

    # -- finalizers ---------------------------------------------------------
    def gram(self, state) -> np.ndarray:
        """B'B — the (d, d) covariance approximation."""
        n = int(state["n"][0])
        B = state["B"][:n]
        return B.T @ B

    def singular_values(self, state) -> np.ndarray:
        n = int(state["n"][0])
        return np.linalg.svd(state["B"][:n], compute_uv=False)

    def top_directions(self, state, k: int) -> np.ndarray:
        """(k, d) leading right-singular vectors (principal axes)."""
        n = int(state["n"][0])
        _, _, vt = np.linalg.svd(state["B"][:n], full_matrices=False)
        return vt[:k]

    def spectral_bound(self, state) -> float:
        """Published guarantee: ||A'A - B'B||_2 <= fro2 / ell."""
        return float(state["fro2"][0]) / self.ell

    def fro2(self, state) -> float:
        return float(state["fro2"][0])

    def count(self, state) -> int:
        return int(state["rows"][0])

    # -- codec -------------------------------------------------------------
    def serialize(self, state) -> bytes:
        n = int(state["n"][0])
        return codec.pack(codec.KIND_FREQDIR, [
            (1, np.uint32(self.ell).tobytes()),
            (2, np.uint32(self.d).tobytes()),
            (3, np.uint32(n).tobytes()),
            (4, np.ascontiguousarray(state["B"][:n]).tobytes()),
            (5, np.ascontiguousarray(state["fro2"]).tobytes()),
            (6, np.ascontiguousarray(state["rows"]).tobytes()),
        ])

    def deserialize(self, blob: bytes):
        fields = codec.expect_kind(blob, codec.KIND_FREQDIR)
        ell = int(np.frombuffer(fields[1], dtype=np.uint32)[0])
        d = int(np.frombuffer(fields[2], dtype=np.uint32)[0])
        if (ell, d) != (self.ell, self.d):
            raise ValueError(f"FreqDir (ell,d) mismatch: blob "
                             f"({ell},{d}), sketch ({self.ell},{self.d})")
        n = int(np.frombuffer(fields[3], dtype=np.uint32)[0])
        st = self.zero()
        st["B"][:n] = np.frombuffer(
            fields[4], dtype=_F64).reshape(n, d)
        st["n"][0] = n
        st["fro2"][:] = np.frombuffer(fields[5], dtype=_F64)
        st["rows"][:] = np.frombuffer(fields[6], dtype=np.int64)
        return st

    @classmethod
    def from_blob(cls, blob: bytes) -> "FreqDir":
        fields = codec.expect_kind(blob, codec.KIND_FREQDIR)
        return cls(ell=int(np.frombuffer(fields[1], dtype=np.uint32)[0]),
                   d=int(np.frombuffer(fields[2], dtype=np.uint32)[0]))
