"""Exact row-count + byte-sum "sketch" — the trivial mergeable kernel.

A (count, sum) pair conforms to the same kernel protocol as the real
sketches (zero/update/merge/serialize + self-describing blob), so the
exact table statistics a planner needs — row count and payload bytes —
can RIDE the same single corpus scan that co-builds the probabilistic
states (``operators.sketch_agg.global_sketch_multi``) instead of
paying a second pass.  ``plans/advisor.py`` uses it to anchor its
broadcast / salting / partition-count advice in exact sizes while the
distinct-count, skew, and join-cardinality inputs come from the theta
/ Misra-Gries / AMS states built in the same scan.

Update consumes an int64-castable Arrow array (the caller projects a
JVM-computed byte-size column); count += batch length, total += batch
sum.  Both fields are plain sums, so merge is addition — associative,
commutative, order-independent, byte-stable.

No reference analog (gopie has no planner statistics); protocol per
this repo's kernel conventions.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import numpy as np

from gopie_spark.kernels import codec

I64 = np.int64


@dataclass(frozen=True)
class ExactStats:
    """Exact (n_rows, total) pair with the mergeable-kernel protocol."""

    def zero(self) -> Dict[str, np.ndarray]:
        return {"n": np.zeros(1, dtype=I64),
                "total": np.zeros(1, dtype=I64)}

    def update(self, state, values, counts=None):
        """Add a batch of int64-castable values (an Arrow array or any
        numpy-coercible sequence); ``counts`` weights each value when
        given (the pre-aggregated path)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            arr = values.cast(pa.int64())
            if arr.null_count:
                # null values count as rows of 0 bytes (Arrow nulls
                # would otherwise round-trip to NaN through NumPy)
                arr = pc.fill_null(arr, 0)
            vals = np.asarray(arr, dtype=I64)
        else:
            vals = np.asarray(values, dtype=I64)
        if vals.size == 0:
            return state
        if counts is None:
            state["n"][0] += int(vals.size)
            state["total"][0] += int(vals.sum())
        else:
            cnt = np.asarray(counts, dtype=I64)
            state["n"][0] += int(cnt.sum())
            state["total"][0] += int((vals * cnt).sum())
        return state

    def merge(self, a, b):
        a["n"] += b["n"]
        a["total"] += b["total"]
        return a

    # -- finalizers ----------------------------------------------------------
    def count(self, state) -> int:
        return int(state["n"][0])

    def total(self, state) -> int:
        return int(state["total"][0])

    # -- codec ---------------------------------------------------------------
    def serialize(self, state) -> bytes:
        return codec.pack(codec.KIND_EXACTSTATS, [
            (1, state["n"].tobytes()),
            (2, state["total"].tobytes()),
        ])

    def deserialize(self, blob: bytes):
        fields = codec.expect_kind(blob, codec.KIND_EXACTSTATS)
        return {"n": np.frombuffer(fields[1], dtype=I64).copy(),
                "total": np.frombuffer(fields[2], dtype=I64).copy()}

    @classmethod
    def from_blob(cls, blob: bytes) -> "ExactStats":
        codec.expect_kind(blob, codec.KIND_EXACTSTATS)
        return cls()
