"""Shared plumbing for the timed-value kernels (SlidingHLL, WindowCMS):
splitting the (value, ts) Arrow struct transport column and dropping
null values / NaN timestamps before they reach a frontier or a tick.

The outer struct column is non-null even when its fields are, so the
generic ``drop_null`` in ``build_partials`` cannot catch these — and a
NaN timestamp would poison frontier sort order / tick bucketing."""

from __future__ import annotations

import numpy as np

F64 = np.float64


def struct_parts(values):
    """(values, ts) from an Arrow StructArray (fields: value, ts) or a
    (values, ts) pair — flat-batch, zero per-element Python."""
    try:
        import pyarrow as pa
        if isinstance(values, (pa.StructArray, pa.ChunkedArray)):
            if isinstance(values, pa.ChunkedArray):
                values = values.combine_chunks()
            return values.field(0), np.asarray(
                values.field(1).cast(pa.float64()), dtype=F64)
    except ImportError:
        pass
    vals, ts = values
    return vals, np.asarray(ts, dtype=F64)


def drop_invalid(vals, ts, counts=None):
    """Filter out rows whose value is null or whose timestamp is NaN.
    ``vals`` may be an Arrow array, a numpy array, or a plain Python
    sequence; returns ``(vals, ts[, counts])`` with the same kind."""
    try:
        import pyarrow as pa
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        if isinstance(vals, pa.Array):
            null_v = vals.is_null().to_numpy(zero_copy_only=False)
        else:
            null_v = np.array([v is None for v in vals], dtype=bool)
    except ImportError:
        pa = None
        null_v = np.array([v is None for v in vals], dtype=bool)
    valid = ~null_v & ~np.isnan(ts)
    if not valid.all():
        if pa is not None and isinstance(vals, pa.Array):
            vals = vals.filter(pa.array(valid))
        elif isinstance(vals, np.ndarray):
            vals = vals[valid]
        else:
            vals = [v for v, ok in zip(vals, valid) if ok]
        ts = ts[valid]
        if counts is not None:
            counts = np.asarray(counts)[valid]
    if counts is not None:
        return vals, ts, counts
    return vals, ts
