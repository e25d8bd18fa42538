"""Matrix-sketch plumbing: per-partition Frequent-Directions partials
over an embedding column, tree-merged like every other sketch.

The scalar sketch_agg path consumes one value per row; embeddings are
(n, d) row batches, so stage A here is a dedicated mapInArrow that
lifts each Arrow batch's list-column values buffer into a float64
matrix (one reshape, no per-cell Python — same pattern as
operators/similarity.py) and folds it into a per-partition FreqDir
state.  Stage B reuses merge_partials([]) unchanged — FreqDir.merge
is the stack-and-shrink of SICOMP 2016 §3, so the global state's
spectral-error bound fro2/ell survives the tree.

At 10^12 rows: stage A reads only the vector column (column pruning),
emits ONE ~2*ell*d*8-byte state per partition; the merge shuffles
states, never vectors.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql.types import BinaryType, StructField, StructType

from gopie_spark.kernels.freqdir import FreqDir
from gopie_spark.operators.sketch_agg import STATE_COL, merge_partials


def _dense_matrix(rb, col_idx: int, d: int = None) -> np.ndarray:
    """(rows, d) float64 from an Arrow list column, refusing nulls and
    jagged rows (flatten() silently DROPS null entries, which would
    misalign the reshape — a wrong Gram with no error)."""
    vec = rb.column(col_idx)
    if vec.null_count:
        raise ValueError(
            "matrix sketch: null embedding rows — filter them upstream")
    flat = np.asarray(vec.flatten(), dtype=np.float64)
    if rb.num_rows == 0:
        return flat.reshape(0, d if d else 0)
    if flat.size % rb.num_rows:
        raise ValueError(
            f"matrix sketch: jagged embedding lengths in batch "
            f"({flat.size} values / {rb.num_rows} rows)")
    out = flat.reshape(rb.num_rows, -1)
    if d is not None and out.shape[1] != d:
        raise ValueError(
            f"matrix sketch: embedding dim {out.shape[1]} != {d}")
    return out


def freqdir_partials(df: DataFrame, vec_col: str, fd: FreqDir,
                     keys: Sequence[str] = ()) -> DataFrame:
    """Stage A: one FD state per input partition (per key set when
    ``keys`` given — then one state per key per partition)."""
    import pyarrow as pa

    keys = list(keys)
    cols = keys + [vec_col]
    src = df.select(*cols)
    key_fields = [src.schema[k] for k in keys]
    out_schema = StructType(key_fields +
                            [StructField(STATE_COL, BinaryType(), False)])

    def fn(batches):
        states = {}
        key_types = [None] * len(keys)
        for rb in batches:
            if rb.num_rows == 0:
                continue
            for i in range(len(keys)):
                key_types[i] = rb.schema.field(i).type
            mat = _dense_matrix(rb, len(keys), fd.d)
            if keys:
                keymat = list(zip(*(rb.column(i).to_pylist()
                                    for i in range(len(keys)))))
                order = {}
                for j, kt in enumerate(keymat):
                    order.setdefault(kt, []).append(j)
                for kt, idx in order.items():
                    st = states.get(kt)
                    if st is None:
                        st = states[kt] = fd.zero()
                    fd.update(st, mat[idx])
            else:
                st = states.get(())
                if st is None:
                    st = states[()] = fd.zero()
                fd.update(st, mat)
        if not states:
            return
        arrays = []
        for i in range(len(keys)):
            arrays.append(pa.array([kt[i] for kt in states],
                                   type=key_types[i]))
        arrays.append(pa.array([fd.serialize(st)
                                for st in states.values()],
                               type=pa.binary()))
        yield pa.record_batch(arrays, names=keys + [STATE_COL])

    return src.mapInArrow(fn, out_schema)


def freqdir_sketch(df: DataFrame, vec_col: str, fd: FreqDir,
                   keys: Sequence[str] = ()) -> DataFrame:
    """Stage A + B: DataFrame[keys..., sketch_state]."""
    return merge_partials(freqdir_partials(df, vec_col, fd, keys),
                          list(keys), fd)


def exact_gram(df: DataFrame, vec_col: str) -> np.ndarray:
    """Exact A'A in one pass: per-partition d x d partial Grams
    (mapInArrow, one BLAS syrk-shape matmul per batch), summed on the
    driver — O(d^2) driver bytes regardless of row count, so this is
    scale-safe for embedding dims and doubles as the oracle side of
    the FreqDir certificate."""
    import pyarrow as pa

    schema = StructType([StructField("g", BinaryType(), False)])

    def fn(batches):
        acc = None
        for rb in batches:
            if rb.num_rows == 0:
                continue
            mat = _dense_matrix(rb, 0)
            g = mat.T @ mat
            acc = g if acc is None else acc + g
        if acc is not None:
            yield pa.record_batch(
                [pa.array([acc.tobytes()], type=pa.binary())],
                names=["g"])

    parts = [np.frombuffer(bytes(r["g"]), dtype=np.float64)
             for r in df.select(vec_col).mapInArrow(fn, schema).collect()]
    if not parts:
        return np.zeros((0, 0))
    d = int(round(len(parts[0]) ** 0.5))
    return sum(parts).reshape(d, d)


def freqdir_global(df: DataFrame, vec_col: str, fd: FreqDir):
    """Driver-side deserialized global state."""
    rows = freqdir_sketch(df, vec_col, fd).collect()
    if not rows:
        return fd.zero()
    return fd.deserialize(bytes(rows[0][STATE_COL]))
