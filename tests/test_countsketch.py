"""CountSketch (kernels/countsketch.py + countsketch_tokens_build).

Gates: heavy-hitter estimates land within the 3-sigma sqrt(F2/w) band
on a Zipf stream; the estimator is empirically unbiased; merge is the
counter ADD (split == whole, byte-equal — and linearity gives the
frequency-DIFFERENCE sketch); pre-aggregated counts equal row-at-a-time
updates; codec round-trips (dense AND sparse-partial encodings) and
refuses mismatched shapes / wrong kinds; the distributed build equals
the serial kernel byte-for-byte at several partitionings."""
import numpy as np
import pytest

from gopie_spark.kernels import CountSketch
from gopie_spark.kernels.countsketch import params_from_guess


def _zipf_counts(rng, n=20000, cap=5000):
    from collections import Counter
    cnt = Counter(f"tok{i}" for i in rng.zipf(1.3, n) if i < cap)
    keys = sorted(cnt)
    return keys, np.array([cnt[k] for k in keys], dtype=np.int64)


def test_heavy_hitters_within_3_sigma_band():
    rng = np.random.default_rng(1)
    cs = CountSketch(width=4096, depth=7)
    keys, counts = _zipf_counts(rng)
    st = cs.update(cs.zero(), keys, counts)
    f2 = float((counts.astype(float) ** 2).sum())
    order = np.argsort(-counts)[:20]
    est = cs.estimate(st, [keys[i] for i in order])
    for e, i in zip(est, order):
        assert abs(e - counts[i]) <= cs.error_bound(f2, float(counts[i]))
    assert abs(cs.f2_estimate(st) - f2) / f2 < 0.05


def test_estimator_is_unbiased_across_rows():
    # E[sign * cell] = f exactly, per row: the mean of the 41
    # independent per-row estimates must straddle the truth within
    # 3 * empirical-sd / sqrt(rows) (the median is what estimate()
    # returns; this checks the unbiasedness of the underlying cells)
    rng = np.random.default_rng(2)
    keys, counts = _zipf_counts(rng, n=8000)
    target = keys[int(np.argmax(counts))]
    truth = counts[int(np.argmax(counts))]
    cs = CountSketch(width=512, depth=41)
    st = cs.update(cs.zero(), keys, counts)
    pos, sign = cs._pos_sign([target])
    per_row = np.array([sign[i, 0] * st["matrix"][i, pos[i, 0]]
                        for i in range(cs.depth)], dtype=float)
    assert per_row.min() < truth < per_row.max()  # both-sided scatter
    err = per_row.mean() - truth
    assert abs(err) <= 3 * per_row.std() / np.sqrt(cs.depth) + 1e-9


def test_merge_is_add_and_linear():
    rng = np.random.default_rng(3)
    cs = CountSketch(width=1024, depth=5)
    keys, counts = _zipf_counts(rng, n=5000)
    half = len(keys) // 2
    whole = cs.update(cs.zero(), keys, counts)
    a = cs.update(cs.zero(), keys[:half], counts[:half])
    b = cs.update(cs.zero(), keys[half:], counts[half:])
    a_copy = cs.deserialize(cs.serialize(a))
    m = cs.merge(a, b)
    assert (m["matrix"] == whole["matrix"]).all()
    assert m["count"][0] == whole["count"][0]
    # linearity: whole + (-b) == a (frequency difference of two streams)
    neg_b = {"matrix": -b["matrix"], "count": -b["count"]}
    diff = cs.merge(cs.deserialize(cs.serialize(whole)), neg_b)
    assert (diff["matrix"] == a_copy["matrix"]).all()


def test_preagg_equals_row_at_a_time():
    rng = np.random.default_rng(4)
    cs = CountSketch(width=256, depth=3)
    keys = [f"k{i}" for i in range(50)]
    counts = rng.integers(1, 20, 50)
    st1 = cs.update(cs.zero(), keys, counts)
    st2 = cs.zero()
    for k, c in zip(keys, counts):
        for _ in range(int(c)):
            cs.update(st2, [k])
    assert (st1["matrix"] == st2["matrix"]).all()


def test_codec_roundtrip_sparse_and_dense_and_refusals():
    cs = CountSketch(width=512, depth=3)
    sparse = cs.update(cs.zero(), ["a", "b"], np.array([1, 2]))
    blob_sparse = cs.serialize(sparse)
    assert len(blob_sparse) < 512 * 3 * 8 // 4
    assert (cs.deserialize(blob_sparse)["matrix"] ==
            sparse["matrix"]).all()
    rng = np.random.default_rng(5)
    keys, counts = _zipf_counts(rng, n=40000, cap=100000)
    dense = cs.update(cs.zero(), keys, counts)
    assert (cs.deserialize(cs.serialize(dense))["matrix"] ==
            dense["matrix"]).all()
    from gopie_spark.kernels import sketch_from_blob
    again = sketch_from_blob(blob_sparse)
    assert isinstance(again, CountSketch)
    assert (again.width, again.depth) == (512, 3)
    with pytest.raises(ValueError):
        CountSketch(width=256, depth=3).deserialize(blob_sparse)
    with pytest.raises(ValueError):
        cs.merge(sparse, CountSketch(width=256, depth=3).zero())
    from gopie_spark.kernels import KLL
    with pytest.raises(ValueError):
        cs.deserialize(KLL().serialize(KLL().zero()))


def test_params_from_guess():
    w, d = params_from_guess(0.03, 0.99)
    assert w >= 1 / 0.03 ** 2 and d % 2 == 1
    with pytest.raises(ValueError):
        params_from_guess(0.0, 0.5)
    with pytest.raises(ValueError):
        params_from_guess(0.1, 1.0)


@pytest.mark.parametrize("parts", [1, 3, 8])
def test_distributed_build_equals_serial(spark, sf_dir, parts):
    from gopie_spark.operators import countsketch_tokens_build
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("text").repartition(parts))
    cs, state = countsketch_tokens_build(docs, "text",
                                         width=512, depth=5)
    # serial kernel over the exact wordcount
    from collections import Counter
    cnt = Counter()
    for r in docs.collect():
        for t in (r["text"] or "").split():
            cnt[t] += 1
    keys = sorted(cnt)
    serial = cs.update(cs.zero(), keys,
                       np.array([cnt[k] for k in keys], dtype=np.int64))
    assert (state["matrix"] == serial["matrix"]).all()
    assert state["count"][0] == serial["count"][0]
