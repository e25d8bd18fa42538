"""Misra–Gries heavy-hitters kernel — mergeable top-k frequency summary.

Complements the CMS heavy-hitter path (SURVEY.md §2.1): CMS answers point
queries but needs a *candidate set* from an exact pre-aggregation; a
Misra–Gries summary finds the candidates itself in one pass with O(k)
state.  Mergeable per Agarwal, Cormode, Huang, Phillips, Wei, Yi,
"Mergeable Summaries" (PODS 2012): merge = counter-wise add, then subtract
the (k+1)-th largest counter from all and drop non-positives.  Guarantees
after any merge tree over a stream of N items:

- every item with true count > err is tracked, where ``err`` (carried in
  the state) is the cumulative subtracted amount, err <= N/(k+1);
- for tracked items:  est <= true <= est + err  (under-estimates only).

Update path is batch-vectorized: per-batch exact counts via Arrow/NumPy
``unique`` + ``add.at`` combine with the current counters — no per-row
Python.  Keys are UTF-8 strings (byte-string elements, like every gopie
sketch — reference consumes ``[]byte``).

State: {"keys": np.ndarray[object], "counts": int64[], "n": int64[1],
"err": int64[1]}.  Serialization: TLV blob with a length-prefixed UTF-8
key block (codec precedent: kernels/codec.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import numpy as np

from gopie_spark.kernels import codec

I64 = np.int64


def _combine(keys_a, counts_a, keys_b, counts_b):
    """Sum counts of the union key set (vectorized groupby-sum)."""
    keys = np.concatenate([keys_a, keys_b])
    counts = np.concatenate([counts_a, counts_b]).astype(I64)
    uniq, inv = np.unique(keys, return_inverse=True)
    out = np.zeros(uniq.size, dtype=I64)
    np.add.at(out, inv, counts)
    return uniq, out


@dataclass(frozen=True)
class MisraGries:
    """Mergeable Misra–Gries summary tracking at most ``k`` keys."""

    k: int = 256

    def zero(self) -> Dict[str, np.ndarray]:
        return {"keys": np.empty(0, dtype=object),
                "counts": np.empty(0, dtype=I64),
                "n": np.zeros(1, dtype=I64),
                "err": np.zeros(1, dtype=I64)}

    def _trim(self, state):
        keys, counts = state["keys"], state["counts"]
        if keys.size <= self.k:
            return state
        # subtract the (k+1)-th largest count from everything
        t = np.partition(counts, counts.size - self.k - 1)[
            counts.size - self.k - 1]
        counts = counts - t
        keep = counts > 0
        state["keys"] = keys[keep]
        state["counts"] = counts[keep]
        state["err"][0] += int(t)
        return state

    def update(self, state, values, counts=None):
        """Add a batch of string values (optionally pre-counted)."""
        import pyarrow as pa
        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            arr = values
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            vals = np.asarray(arr.to_pandas(), dtype=object)
        else:
            vals = np.asarray(list(values), dtype=object)
        if counts is None:
            bk, inv = np.unique(vals, return_inverse=True)
            bc = np.zeros(bk.size, dtype=I64)
            np.add.at(bc, inv, 1)
        else:
            bk, bc = vals, np.asarray(counts, dtype=I64)
        state["n"][0] += int(bc.sum())
        state["keys"], state["counts"] = _combine(
            state["keys"], state["counts"], bk, bc)
        return self._trim(state)

    def merge(self, a, b):
        keys, counts = _combine(a["keys"], a["counts"],
                                b["keys"], b["counts"])
        out = {"keys": keys, "counts": counts,
               "n": a["n"] + b["n"], "err": a["err"] + b["err"]}
        return self._trim(out)

    def estimate(self, state, values) -> np.ndarray:
        """Lower-bound count per queried value (0 if untracked); true
        count is within +state['err'] of the estimate."""
        lookup = {k: int(c) for k, c in zip(state["keys"], state["counts"])}
        return np.array([lookup.get(v, 0) for v in values], dtype=I64)

    def topk(self, state, n=None):
        """(keys, counts) sorted by count desc then key asc."""
        order = np.lexsort((state["keys"].astype(str),
                            -state["counts"]))
        if n is not None:
            order = order[:n]
        return state["keys"][order], state["counts"][order]

    def count(self, state) -> int:
        return int(state["n"][0])

    def error_bound(self, state) -> int:
        """Max undercount of any tracked (or dropped) key."""
        return int(state["err"][0])

    # -- codec ---------------------------------------------------------------
    def serialize(self, state) -> bytes:
        enc = [str(k).encode() for k in state["keys"]]
        lens = np.array([len(e) for e in enc], dtype=I64)
        return codec.pack(codec.KIND_MISRAGRIES, [
            (1, np.array([self.k], dtype=I64).tobytes()),
            (2, state["n"].tobytes()),
            (3, state["err"].tobytes()),
            (4, np.ascontiguousarray(state["counts"]).tobytes()),
            (5, lens.tobytes()),
            (6, b"".join(enc)),
        ])

    def deserialize(self, blob: bytes):
        fields = codec.expect_kind(blob, codec.KIND_MISRAGRIES)
        if int(np.frombuffer(fields[1], dtype=I64)[0]) != self.k:
            raise ValueError("MisraGries k mismatch")
        lens = np.frombuffer(fields[5], dtype=I64)
        block = fields[6]
        keys, pos = [], 0
        for ln in lens:
            keys.append(block[pos:pos + ln].decode())
            pos += int(ln)
        return {"keys": np.array(keys, dtype=object),
                "counts": np.frombuffer(fields[4], dtype=I64).copy(),
                "n": np.frombuffer(fields[2], dtype=I64).copy(),
                "err": np.frombuffer(fields[3], dtype=I64).copy()}

    @classmethod
    def from_blob(cls, blob: bytes) -> "MisraGries":
        fields = codec.expect_kind(blob, codec.KIND_MISRAGRIES)
        return cls(k=int(np.frombuffer(fields[1], dtype=I64)[0]))
