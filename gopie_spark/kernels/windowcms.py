"""Windowed Count-Min sketch — point frequencies over ANY trailing
time window, one pass, bounded mergeable state.

The time-dimension twin of ``kernels/slidinghll.py``: where plain CMS
(`kernels/cms.py`, matching /root/reference/pkg/countminsketch) keeps
one d x w counter matrix for all time, this keeps one matrix PER TIME
TICK (``tick = floor(epoch / resolution)``) over a bounded retention
horizon of ``n_ticks`` ticks.  A query then sums the matrices of the
ticks inside [at - window + 1, at] and takes the usual min-over-rows —
a CMS of exactly the window's substream, so the published bound
(overcount <= e/width * N_window with prob >= 1 - (1/2)^depth) holds
per window.  Windows are chosen at QUERY time; boundaries are
tick-aligned by construction (the deterministic bucketing rule shared
with the DuckDB oracle).

This is the bounded-exact sibling of ECM-sketch-style windowed sketches
(Papapetrou, Garofalakis, Deligiannakis, VLDB 2012): per-cell exponential
histograms buy a longer horizon at O(log) space but approximate counts;
per-tick integer matrices keep counts exact within the horizon, and the
horizon prune (drop ticks <= max_tick - n_ticks) composes exactly, so
merge stays associative/commutative and byte-stable under any partition
split — the same merge gates as every kernel here.

State size: at most n_ticks * depth * width counters dense, but the
adaptive sparse codec (shared rule with CMS) keeps PARTIAL blobs — the
dominant shuffle cost at cluster scale — proportional to the counters
actually touched by that partition's rows.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np

from gopie_spark.kernels import codec, timed
from gopie_spark.kernels.cms import CMS, params_from_guess

U64 = np.uint64
I64 = np.int64
U32 = np.uint32
F64 = np.float64


@dataclass(frozen=True)
class WindowCMS:
    """CMS whose counters remember WHICH time tick they were earned in.

    Mutation convention (same as CMS): ``update``/``update_ticked`` may
    add IN PLACE into the passed state's arrays when every batch tick is
    already materialized (the steady state of an accumulator fold) —
    always rebind to the return value and never alias a state you still
    need; ``merge`` and ``deserialize`` always return fresh arrays."""

    width: int = 2719
    depth: int = 7
    resolution: float = 3600.0   # seconds per tick
    n_ticks: int = 168           # retention horizon (ticks)

    @classmethod
    def from_guess(cls, epsilon: float, delta: float,
                   resolution: float = 3600.0,
                   n_ticks: int = 168) -> "WindowCMS":
        w, d = params_from_guess(epsilon, delta)
        return cls(width=w, depth=d, resolution=resolution,
                   n_ticks=n_ticks)

    def __post_init__(self):
        if self.resolution <= 0:
            raise ValueError("resolution must be > 0")
        if self.n_ticks < 1:
            raise ValueError("n_ticks must be >= 1")

    @property
    def epsilon(self) -> float:
        return math.e / self.width

    @property
    def delta(self) -> float:
        return 1.0 - 0.5 ** self.depth

    def _cms(self) -> CMS:
        return CMS(width=self.width, depth=self.depth)

    def tick_of(self, epochs) -> np.ndarray:
        """The deterministic bucketing rule (mirror in any oracle):
        tick = floor(epoch_seconds / resolution)."""
        return np.floor(np.asarray(epochs, dtype=F64)
                        / self.resolution).astype(I64)

    # -- state ----------------------------------------------------------------

    def zero(self) -> Dict[str, np.ndarray]:
        return {"ticks": np.zeros(0, dtype=I64),
                "mats": np.zeros((0, self.depth, self.width), dtype=U64),
                "counts": np.zeros(0, dtype=U64)}

    def _prune(self, state) -> Dict[str, np.ndarray]:
        """Drop ticks outside the retention horizon of the NEWEST tick.
        Truncation-to-global-max composes exactly — dropping below
        max1 then below max2 equals dropping below max(max1, max2) —
        which is what keeps merge associative and byte-stable."""
        if state["ticks"].size == 0:
            return state
        keep = state["ticks"] > state["ticks"].max() - self.n_ticks
        if keep.all():
            return state
        return {"ticks": state["ticks"][keep],
                "mats": state["mats"][keep],
                "counts": state["counts"][keep]}

    # -- update / merge -----------------------------------------------------------

    def update(self, state, values, epochs=None,
               counts: Optional[np.ndarray] = None):
        """Add a batch: ``update(st, values, epochs[, counts])`` or
        ``update(st, struct_or_pair)`` (value+ts in one argument).  The
        scalable path is pre-aggregation — pass distinct (value, tick)
        rows with exact counts so hashing is per distinct key."""
        if epochs is None:
            values, epochs = timed.struct_parts(values)
        vals = values
        ts = np.asarray(epochs, dtype=F64)
        if counts is not None:
            vals, ts, counts = timed.drop_invalid(vals, ts, counts)
        else:
            vals, ts = timed.drop_invalid(vals, ts)
        n = len(ts)
        if n == 0:
            return state
        cnt = (np.ones(n, dtype=U64) if counts is None
               else np.asarray(counts).astype(U64))
        return self.update_ticked(state, vals, self.tick_of(ts), cnt)

    def update_ticked(self, state, vals, ticks, cnt):
        """Pre-bucketed update: callers that already computed the tick
        (e.g. the JVM wordcount pre-agg, which groups by (value, tick)
        and passes exact counts) skip the epoch cast entirely."""
        bt = np.asarray(ticks, dtype=I64)
        cnt = np.asarray(cnt).astype(U64)
        # union of retained + batch ticks, then locate each element.
        # Fast path: when every batch tick is already materialized
        # (the steady state after the first batch of a partition),
        # add in place — no O(horizon * d * w) reallocation per batch.
        pos = np.searchsorted(state["ticks"], bt)
        if (state["ticks"].size and pos.size
                and (pos < state["ticks"].size).all()
                and (state["ticks"][np.minimum(
                    pos, state["ticks"].size - 1)] == bt).all()):
            all_ticks, mats, tot = (state["ticks"], state["mats"],
                                    state["counts"])
        else:
            all_ticks = np.union1d(state["ticks"], bt)
            mats = np.zeros((all_ticks.size, self.depth, self.width),
                            dtype=U64)
            tot = np.zeros(all_ticks.size, dtype=U64)
            old = np.searchsorted(all_ticks, state["ticks"])
            mats[old] = state["mats"]
            tot[old] = state["counts"]
        slot = np.searchsorted(all_ticks, bt)
        idx = self._cms()._indices(vals)          # (depth, n) columns
        dw = self.depth * self.width
        flat = mats.reshape(-1)
        for i in range(self.depth):
            np.add.at(flat,
                      slot * dw + i * self.width + idx[i].astype(I64),
                      cnt)
        np.add.at(tot, slot, cnt)
        return self._prune({"ticks": all_ticks,
                            "mats": flat.reshape(mats.shape),
                            "counts": tot})

    def merge(self, a, b):
        if a["mats"].shape[1:] != b["mats"].shape[1:]:
            raise ValueError("windowed CMS depth/width must match")
        ticks = np.union1d(a["ticks"], b["ticks"])
        mats = np.zeros((ticks.size, self.depth, self.width), dtype=U64)
        tot = np.zeros(ticks.size, dtype=U64)
        for st in (a, b):
            pos = np.searchsorted(ticks, st["ticks"])
            mats[pos] += st["mats"]
            tot[pos] += st["counts"]
        return self._prune({"ticks": ticks, "mats": mats, "counts": tot})

    def expire(self, state, min_tick: int):
        """Explicit retention prune: queries whose window lies at or
        past ``min_tick`` are unaffected."""
        keep = state["ticks"] >= int(min_tick)
        return {"ticks": state["ticks"][keep],
                "mats": state["mats"][keep],
                "counts": state["counts"][keep]}

    # -- finalizers -----------------------------------------------------------------

    def _window_matrix(self, state, window_ticks: Optional[int],
                       at_tick: Optional[int]):
        if state["ticks"].size == 0:
            return np.zeros((self.depth, self.width), dtype=U64), 0
        at = int(state["ticks"].max()) if at_tick is None else int(at_tick)
        if window_ticks is None:
            live = state["ticks"] <= at
        else:
            live = ((state["ticks"] <= at)
                    & (state["ticks"] > at - int(window_ticks)))
        return (state["mats"][live].sum(axis=0, dtype=U64),
                int(state["counts"][live].sum(dtype=U64)))

    def estimate(self, state, values, window_ticks: Optional[int] = None,
                 at_tick: Optional[int] = None) -> np.ndarray:
        """Point-query a batch over the trailing window
        ``(at - window, at]`` in ticks (window None = whole retained
        horizon; at None = newest retained tick).  min over rows of the
        window's summed matrix — a CMS of the window's substream."""
        mat, _ = self._window_matrix(state, window_ticks, at_tick)
        idx = self._cms()._indices(values)
        est = mat[0][idx[0].astype(I64)]
        for i in range(1, self.depth):
            est = np.minimum(est, mat[i][idx[i].astype(I64)])
        return est

    def window_total(self, state, window_ticks: Optional[int] = None,
                     at_tick: Optional[int] = None) -> int:
        """Total items in the window — the N of the published bound
        (overcount <= epsilon * N_window with prob >= 1 - (1/2)^depth)."""
        return self._window_matrix(state, window_ticks, at_tick)[1]

    # -- codec ---------------------------------------------------------------------

    def serialize(self, state) -> bytes:
        st = self._prune(state)
        mats = np.ascontiguousarray(st["mats"])
        flat = mats.reshape(-1)
        nz = np.flatnonzero(flat)
        fields = [
            (1, np.array([self.depth, self.width, self.n_ticks],
                         dtype=U32).tobytes()),
            (2, np.array([self.resolution], dtype=F64).tobytes()),
            (3, st["ticks"].tobytes()),
            (4, st["counts"].tobytes()),
        ]
        # adaptive dense/sparse, same rule as CMS: sparse iff smaller
        if flat.size < (1 << 32) and 12 * len(nz) < 8 * flat.size:
            fields.append((6, nz.astype(U32).tobytes()))
            fields.append((7, flat[nz].tobytes()))
        else:
            fields.append((5, flat.tobytes()))
        return codec.pack(codec.KIND_WINDOW_CMS, fields)

    @classmethod
    def from_blob(cls, blob: bytes) -> "WindowCMS":
        fields = codec.expect_kind(blob, codec.KIND_WINDOW_CMS)
        d, w, b = np.frombuffer(fields[1], dtype=U32)
        res = float(np.frombuffer(fields[2], dtype=F64)[0])
        return cls(width=int(w), depth=int(d), resolution=res,
                   n_ticks=int(b))

    def deserialize(self, blob: bytes):
        fields = codec.expect_kind(blob, codec.KIND_WINDOW_CMS)
        d, w, b = np.frombuffer(fields[1], dtype=U32)
        res = float(np.frombuffer(fields[2], dtype=F64)[0])
        if (int(d), int(w), int(b), res) != (self.depth, self.width,
                                             self.n_ticks,
                                             self.resolution):
            raise ValueError("windowed CMS params mismatch")
        ticks = np.frombuffer(fields[3], dtype=I64).copy()
        counts = np.frombuffer(fields[4], dtype=U64).copy()
        if ticks.size != counts.size:
            raise ValueError("windowed CMS blob length skew")
        size = ticks.size * self.depth * self.width
        if 5 in fields:
            flat = np.frombuffer(fields[5], dtype=U64).copy()
            if flat.size != size:
                raise ValueError("windowed CMS dense counter skew")
        elif 6 in fields and 7 in fields:
            idx = np.frombuffer(fields[6], dtype=U32).astype(I64)
            if idx.size and idx.max() >= size:
                raise ValueError("windowed CMS sparse index out of range")
            flat = np.zeros(size, dtype=U64)
            flat[idx] = np.frombuffer(fields[7], dtype=U64)
        else:
            raise ValueError("windowed CMS blob has neither dense nor "
                             "sparse counters")
        return {"ticks": ticks,
                "mats": flat.reshape(ticks.size, self.depth, self.width),
                "counts": counts}
