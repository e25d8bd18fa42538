"""b-bit minwise hashing (Li & Koenig, CACM 2011 / WWW 2010).

Covers the NumPy kernel (pack_bbit / bbit_match_counts / bbit_jaccard /
bbit_sigma, kernels/minhash.py), its Catalyst twins (pack_bbit_column /
bbit_match_count / bbit_est_jaccard, operators/dedup.py) word-for-word
parity, the estimator's statistical calibration, and the ``bbit``
verification tier of minhash_lsh_candidates (same candidate recall,
64x smaller verification shuffle).

Reference provenance: the full-width MinHash these pack derives from
gopie's Jaccard-style set sketching; b-bit packing itself is public
literature (cited above) — the reference has no analogue, this is a
scale addition for the 10^12-doc verification join.
"""

import numpy as np
import pytest

from pyspark.sql import functions as F

from gopie_spark.kernels import minhash as mh
from gopie_spark.operators.dedup import (bbit_est_jaccard,
                                         bbit_match_count,
                                         minhash_lsh_candidates,
                                         pack_bbit_column)

K = 128


def _rand_sigs(n, k=K, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**64, size=(n, k), dtype=np.uint64)


def _sig_rows(sigs):
    return [(i, [int(x) for x in row.view(np.int64)])
            for i, row in enumerate(sigs)]


# -- kernel ------------------------------------------------------------------

@pytest.mark.parametrize("b", [1, 2, 4, 8])
def test_pack_layout_matches_direct_extraction(b):
    sigs = _rand_sigs(8)
    packed = mh.pack_bbit(sigs, b)
    assert packed.shape == (8, K * b // 64) and packed.dtype == np.uint64
    lanes = 64 // b
    for i in range(8):
        for j in range(K):
            w, lane = divmod(j, lanes)
            got = (int(packed[i, w]) >> (lane * b)) & ((1 << b) - 1)
            assert got == int(sigs[i, j]) & ((1 << b) - 1)


@pytest.mark.parametrize("b", [1, 2, 4, 8])
def test_match_counts_equal_direct_low_bit_comparison(b):
    sigs = _rand_sigs(10, seed=11)
    packed = mh.pack_bbit(sigs, b)
    mask = (1 << b) - 1
    for i in range(9):
        want = int(((sigs[i] & mask) == (sigs[i + 1] & mask)).sum())
        got = int(mh.bbit_match_counts(packed[i], packed[i + 1], b))
        assert got == want
    # identical packs match on every lane
    assert int(mh.bbit_match_counts(packed[0], packed[0], b)) == K
    assert float(mh.bbit_jaccard(1.0, b)) == 1.0


def test_match_counts_batched_axis():
    sigs = _rand_sigs(6, seed=3)
    p = mh.pack_bbit(sigs, 2)
    batch = mh.bbit_match_counts(p[:3], p[3:], 2)
    single = [int(mh.bbit_match_counts(p[i], p[i + 3], 2)) for i in range(3)]
    assert list(batch) == single


def test_pack_validates_b_and_k():
    sigs = _rand_sigs(2)
    with pytest.raises(ValueError):
        mh.pack_bbit(sigs, 3)
    with pytest.raises(ValueError):
        mh.pack_bbit(sigs[:, :100], 1)  # k*b not a multiple of 64


@pytest.mark.parametrize("b", [1, 2])
def test_estimator_calibration_within_4_sigma(b):
    """Simulate signature agreement at known Jaccard J: a J-fraction of
    slots equal, the rest independent uniform.  The unbiased estimate
    must land within 4*bbit_sigma of J (fixed seed => deterministic)."""
    rng = np.random.default_rng(1234)
    for j_true in (0.9, 0.7, 0.5):
        a = rng.integers(0, 2**64, size=K, dtype=np.uint64)
        bvec = a.copy()
        diff = rng.random(K) >= j_true
        bvec[diff] = rng.integers(0, 2**64, size=int(diff.sum()),
                                  dtype=np.uint64)
        pa, pb = mh.pack_bbit(a, b), mh.pack_bbit(bvec, b)
        frac = int(mh.bbit_match_counts(pa, pb, b)) / K
        est = float(mh.bbit_jaccard(frac, b))
        # the simulated signature itself has binomial noise in how many
        # slots actually differ; fold both noise sources into the gate
        sig = mh.bbit_sigma(j_true, K, b) + np.sqrt(j_true * (1 - j_true) / K)
        assert abs(est - j_true) <= 4 * sig, (b, j_true, est)


# -- Catalyst twins ------------------------------------------------------------

@pytest.mark.parametrize("b", [1, 2])
def test_catalyst_pack_matches_kernel(spark, b):
    sigs = _rand_sigs(12, seed=21)
    df = spark.createDataFrame(_sig_rows(sigs),
                               "id long, minhash array<bigint>")
    got = {r["id"]: r["_pk"]
           for r in pack_bbit_column(df, "minhash", k=K, b=b,
                                     out_col="_pk").collect()}
    want = mh.pack_bbit(sigs, b).view(np.int64)
    for i in range(12):
        assert got[i] == [int(x) for x in want[i]], (b, i)


@pytest.mark.parametrize("b", [1, 2])
def test_catalyst_match_and_estimate_match_kernel(spark, b):
    sigs = _rand_sigs(10, seed=33)
    df = pack_bbit_column(
        spark.createDataFrame(_sig_rows(sigs),
                              "id long, minhash array<bigint>"),
        "minhash", k=K, b=b, out_col="_pk").select("id", "_pk")
    a = df.select(F.col("id").alias("i"), F.col("_pk").alias("pa"))
    bb = df.select((F.col("id") - 1).alias("i"), F.col("_pk").alias("pb"))
    rows = (a.join(bb, "i")
            .select("i",
                    bbit_match_count(F.col("pa"), F.col("pb"), K, b)
                    .alias("m"),
                    bbit_est_jaccard(F.col("pa"), F.col("pb"), K, b)
                    .alias("e"))
            .collect())
    packed = mh.pack_bbit(sigs, b)
    assert len(rows) == 9
    for r in rows:
        i = r["i"]
        want_m = int(mh.bbit_match_counts(packed[i], packed[i + 1], b))
        assert r["m"] == want_m
        assert abs(r["e"] - float(mh.bbit_jaccard(want_m / K, b))) < 1e-12


def test_catalyst_pack_validates():
    import pyspark.sql  # noqa: F401  (spark not needed — fails before plan)
    with pytest.raises(ValueError):
        bbit_match_count(F.col("a"), F.col("b"), K, 3)


def test_bbit_path_is_python_free(spark):
    """From a materialized signature table the pack + verification join
    must run entirely JVM-side: no Arrow/Batch Python eval nodes and no
    cartesian product in the physical plan."""
    sigs = _rand_sigs(16, seed=5)
    df = spark.createDataFrame(_sig_rows(sigs),
                               "id long, minhash array<bigint>")
    p = pack_bbit_column(df, "minhash", k=K, b=1, out_col="_pk") \
        .select("id", "_pk")
    a = p.select(F.col("id").alias("i"), F.col("_pk").alias("pa"))
    bq = p.select((F.col("id") - 1).alias("i"), F.col("_pk").alias("pb"))
    out = a.join(bq, "i").select(
        bbit_est_jaccard(F.col("pa"), F.col("pb"), K, 1).alias("e"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


# -- verification tier in the LSH pipeline -------------------------------------

def test_lsh_bbit_verification_same_pairs_sane_estimates(spark):
    """bbit=1 changes only the verification estimate: candidate pair set
    identical to the full-signature run; near-dup pairs keep estimates
    above threshold minus 4-sigma slack; exact duplicates estimate 1.0."""
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark woods tonight forever")
    alt = base.replace("lazy", "sleepy")
    docs = [(1, base), (2, base), (3, alt),
            (4, "completely different content about spark shuffles and "
                "partition pruning at terabyte scale with bloom filters"),
            (5, "yet another unrelated document mentioning neither foxes "
                "nor dogs nor woods just plain filler text for the test")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    full = minhash_lsh_candidates(df, k=K, bands=32)
    bb = minhash_lsh_candidates(df, k=K, bands=32, bbit=1)
    fp = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in full.collect()}
    bp = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in bb.collect()}
    assert set(fp) == set(bp)
    assert (1, 2) in bp and bp[(1, 2)] == pytest.approx(1.0)
    slack = 4 * mh.bbit_sigma(0.8, K, 1)
    if (1, 3) in bp:  # near-dup pair (J ~ 0.85 at width-3 shingles)
        assert bp[(1, 3)] >= 0.8 - slack
    # packed column is 64x smaller than the signature it came from
    packed = pack_bbit_column(df.sparkSession.createDataFrame(
        _sig_rows(_rand_sigs(1)), "id long, minhash array<bigint>"),
        "minhash", k=K, b=1, out_col="_pk")
    row = packed.select(F.size("_pk").alias("w"),
                        F.size("minhash").alias("k")).first()
    assert row["w"] * 64 == row["k"]
