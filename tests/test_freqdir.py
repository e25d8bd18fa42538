"""Frequent Directions (kernels/freqdir.py + operators/matrix.py).

Gates: spectral-norm error ||A'A - B'B||_2 within the published
fro2/ell bound — serial, split-and-merged (any split), and through the
Spark mapInArrow + tree-merge path over the real embeddings table;
top-direction quality on planted low-rank data; codec roundtrip and
shape refusals; plan gate (vector column pruned scan, states-only
shuffle).
"""
import numpy as np
import pytest
from pyspark.sql import functions as F

from gopie_spark.kernels import FreqDir, sketch_from_blob
from gopie_spark.operators.sketch_agg import STATE_COL


def _spec_err(A, state, fd):
    G = A.T @ A - fd.gram(state)
    return float(np.linalg.norm(G, 2))


def _planted(n=3000, d=48, rank=5, seed=3):
    rng = np.random.default_rng(seed)
    U = rng.standard_normal((n, rank))
    V = np.linalg.qr(rng.standard_normal((d, rank)))[0]
    scales = np.array([30.0, 20.0, 12.0, 8.0, 5.0])[:rank]
    return U * scales @ V.T + 0.1 * rng.standard_normal((n, d))


def test_freqdir_serial_bound():
    A = _planted()
    fd = FreqDir(ell=16, d=A.shape[1])
    st = fd.zero()
    for chunk in np.array_split(A, 11):
        fd.update(st, chunk)
    assert fd.count(st) == A.shape[0]
    assert abs(fd.fro2(st) - (A * A).sum()) < 1e-6 * (A * A).sum()
    assert _spec_err(A, st, fd) <= fd.spectral_bound(st)


@pytest.mark.parametrize("n_parts", [2, 5, 16])
def test_freqdir_merge_keeps_bound(n_parts):
    """Merged per-split sketches keep the bound (SICOMP'16 §3) for
    round-robin and contiguous splits, any merge order."""
    A = _planted(seed=8)
    fd = FreqDir(ell=16, d=A.shape[1])
    for mode in ("contig", "rr"):
        parts = (np.array_split(A, n_parts) if mode == "contig"
                 else [A[i::n_parts] for i in range(n_parts)])
        states = []
        for p in parts:
            st = fd.zero()
            fd.update(st, p)
            states.append(st)
        merged = states[0]
        for s in states[1:]:
            merged = fd.merge(merged, s)
        assert fd.count(merged) == A.shape[0]
        assert abs(fd.fro2(merged) - (A * A).sum()) \
            <= 1e-6 * (A * A).sum()
        assert _spec_err(A, merged, fd) <= fd.spectral_bound(merged), \
            (mode, n_parts)


def test_freqdir_top_directions_recover_planted_axes():
    """On rank-5-dominant data the top FD directions align with the
    exact top singular directions (|cos| >= 0.9 for the top 3)."""
    A = _planted(seed=21)
    fd = FreqDir(ell=24, d=A.shape[1])
    st = fd.update(fd.zero(), A)
    got = fd.top_directions(st, 3)
    _, _, vt = np.linalg.svd(A, full_matrices=False)
    for i in range(3):
        assert abs(float(got[i] @ vt[i])) >= 0.9, i


def test_freqdir_codec_and_refusals():
    A = _planted(n=500, seed=4)
    fd = FreqDir(ell=8, d=A.shape[1])
    st = fd.update(fd.zero(), A)
    blob = fd.serialize(st)
    rt = fd.deserialize(blob)
    assert np.allclose(fd.gram(rt), fd.gram(st))
    assert fd.fro2(rt) == fd.fro2(st) and fd.count(rt) == fd.count(st)
    back = sketch_from_blob(blob)
    assert type(back).__name__ == "FreqDir" and back.ell == 8
    with pytest.raises(ValueError):
        FreqDir(ell=9, d=A.shape[1]).deserialize(blob)
    with pytest.raises(ValueError):
        fd.update(fd.zero(), np.zeros((3, 7)))  # wrong d
    with pytest.raises(ValueError):
        fd.merge(fd.zero(), FreqDir(ell=4, d=A.shape[1]).zero())


def test_freqdir_spark_global_bound(spark, sf_dir):
    """mapInArrow partials + tree merge over the real embeddings table:
    bound holds vs the exact Gram; row count and Frobenius mass exact."""
    from gopie_spark.operators.matrix import freqdir_global
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    d = len(emb.select("embedding").first()[0])
    fd = FreqDir(ell=16, d=d)
    st = freqdir_global(emb, "embedding", fd)
    A = np.array(
        [r["embedding"] for r in emb.select("embedding").collect()],
        dtype=np.float64)
    assert fd.count(st) == A.shape[0]
    assert abs(fd.fro2(st) - (A * A).sum()) <= 1e-6 * (A * A).sum()
    assert _spec_err(A, st, fd) <= fd.spectral_bound(st)


def test_freqdir_grouped_by_label(spark, sf_dir):
    """Keyed partials: one sketch per label, each within its own bound."""
    from gopie_spark.operators.matrix import freqdir_sketch
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    d = len(emb.select("embedding").first()[0])
    fd = FreqDir(ell=12, d=d)
    states = {r["label"]: fd.deserialize(bytes(r[STATE_COL])) for r in
              freqdir_sketch(emb, "embedding", fd, keys=["label"])
              .collect()}
    for label, st in states.items():
        rows = emb.filter(F.col("label") == label) \
            .select("embedding").collect()
        A = np.array([r["embedding"] for r in rows], dtype=np.float64)
        assert fd.count(st) == A.shape[0], label
        assert _spec_err(A, st, fd) <= fd.spectral_bound(st), label


def test_freqdir_plan_prunes_columns(spark, sf_dir):
    """Stage A must read ONLY the vector (+key) columns."""
    from gopie_spark.operators.matrix import freqdir_partials
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    fd = FreqDir(ell=8, d=64)
    plan = freqdir_partials(emb, "embedding", fd)._jdf \
        .queryExecution().executedPlan().toString()
    scan = plan[plan.index("Scan parquet"):]
    rs = [ln for ln in scan.splitlines() if "ReadSchema" in ln][0]
    assert "embedding" in rs and "vec_id" not in rs and "label" not in rs
