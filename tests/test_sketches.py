"""Golden-value and bound tests for the sketch kernels.

Mirrors the reference's own test strategy (SURVEY.md §5 / FIXTURES.md):
exact golden values on tiny deterministic inputs, statistical tolerance on
a fixed corpus, membership truth tables, analytic-bound assertions, and an
approximate-vs-exact oracle for quantiles.
"""

import math

import numpy as np
import pytest

from gopie_spark.kernels import (CMS, HLL, KLL, BloomBit, BloomCounting,
                                 BloomScalable, MinHash, SimHash, TDigest)
from gopie_spark.kernels import bloom as bloom_mod
from gopie_spark.kernels import cms as cms_mod
from gopie_spark.kernels import hll as hll_mod


# --------------------------------------------------------------------------
# Count-Min sketch: golden fixtures from countmin_test.go:8-99 (F2)
# --------------------------------------------------------------------------

def test_cms_guess_sizing():
    w, d = cms_mod.params_from_guess(0.001, 0.99)
    assert w == 2719 and d == 7


def test_cms_estimate_golden():
    cms = CMS.from_guess(0.001, 0.99)
    st = cms.zero()
    cms.update(st, ["a", "b", "c", "b"])
    got = cms.estimate(st, ["a", "b", "c", "x"])
    assert got.tolist() == [1, 2, 1, 0]
    assert cms.count(st) == 4


def test_cms_preaggregated_counts_equal_per_row_adds():
    cms = CMS.from_guess(0.001, 0.99)
    st1 = cms.zero()
    cms.update(st1, ["a", "b", "c", "b"])
    st2 = cms.zero()
    cms.update(st2, ["a", "b", "c"], counts=np.array([1, 2, 1]))
    assert np.array_equal(st1["matrix"], st2["matrix"])
    assert cms.count(st1) == cms.count(st2)


def test_cms_merge_golden():
    cms = CMS.from_guess(0.001, 0.99)
    s1 = cms.zero()
    cms.update(s1, ["a", "b", "c", "b", "d"])
    s2 = cms.zero()
    cms.update(s2, ["b", "c", "b"])
    cms.merge(s1, s2)
    got = cms.estimate(s1, ["a", "b", "c", "d", "x"])
    assert got.tolist() == [1, 4, 2, 1, 0]
    assert cms.count(s1) == 8


def test_cms_count_100():
    cms = CMS.from_guess(0.001, 0.99)
    st = cms.zero()
    cms.update(st, [str(i) for i in range(100)])
    assert cms.count(st) == 100


def test_cms_roundtrip_serialize():
    cms = CMS.from_guess(0.001, 0.99)
    st = cms.zero()
    cms.update(st, ["a", "b", "c", "b"])
    st2 = cms.deserialize(cms.serialize(st))
    assert np.array_equal(st["matrix"], st2["matrix"])
    assert np.array_equal(st["count"], st2["count"])


def test_cms_error_bound():
    # published bound (countmin.go:21-22): err <= 2N/w with prob >= 1-(1/2)^d
    rng = np.random.default_rng(42)
    vocab = np.array([f"tok{i}" for i in range(5000)])
    zipf_ids = rng.zipf(1.3, size=50000) % 5000
    tokens = vocab[zipf_ids]
    uniq, exact = np.unique(tokens, return_counts=True)
    cms = CMS.from_guess(0.001, 0.99)
    st = cms.zero()
    cms.update(st, uniq, counts=exact)
    est = cms.estimate(st, uniq)
    n = exact.sum()
    over = est.astype(np.int64) - exact
    assert (over >= 0).all()  # CMS never undercounts
    bound = 2.0 * n / cms.width
    assert (over <= bound).mean() >= 0.99


# --------------------------------------------------------------------------
# HyperLogLog: tolerance + golden behavior (F1 analog)
# --------------------------------------------------------------------------

def test_hll_guess_sizing():
    # NewGuess(0.001): m = (1.04/0.001)^2 -> 2^21 (hyperloglog.go:45-48)
    assert hll_mod.params_from_std_err(0.001) == 21


def test_hll_word_corpus_tolerance_fnv_parity():
    # F1 analog: deterministic ~1340-word corpus, NewGuess(0.001) sizing,
    # relative error <= 0.07 with the reference's FNV-1 32 hash (mirrors
    # hyperloglog_test.go:426-438; we generate an English-like corpus with
    # leading variation rather than copying the reference's word list —
    # FNV-1's final-byte xor means trailing-only variation is degenerate,
    # see HLL.hash_name docstring).
    rng = np.random.default_rng(42)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    words = ["".join(alphabet[j] for j in rng.integers(0, 26, size=ln))
             for ln in rng.integers(3, 10, size=1340)]
    words += words[:2]  # duplicates, like the reference list ("mark","turkey")
    hll = HLL(p=21, hash_name="fnv1_32")
    st = hll.zero()
    hll.update(st, words)
    distinct = len(set(words))
    err = abs(hll.count(st) - distinct) / distinct
    assert err <= 0.07


def test_hll_mix64_handles_sequential_keys():
    # the engine-default hash must not collapse on trailing-digit keys
    words = [f"word-{i:05d}" for i in range(1340)]
    hll = HLL(p=21)
    st = hll.zero()
    hll.update(st, words)
    err = abs(hll.count(st) - 1340) / 1340
    assert err <= 0.07


def test_hll_accuracy_at_p14():
    hll = HLL(p=14)
    st = hll.zero()
    n = 100_000
    values = [f"url-{i}" for i in range(n)]
    for i in range(0, n, 10_000):  # batch updates
        hll.update(st, values[i:i + 10_000])
    err = abs(hll.count(st) - n) / n
    assert err <= 3 * hll.std_err


def test_hll_small_range_exact_behavior():
    hll = HLL(p=14)
    st = hll.zero()
    hll.update(st, [f"v{i}" for i in range(10)])
    # linear counting regime: should be very close at tiny cardinality
    assert abs(hll.count(st) - 10) <= 1


def test_hll_merge_equals_serial():
    hll = HLL(p=12)
    vals = [f"item-{i}" for i in range(5000)]
    serial = hll.zero()
    hll.update(serial, vals)
    a, b, c = hll.zero(), hll.zero(), hll.zero()
    hll.update(a, vals[:1000])
    hll.update(b, vals[1000:3500])
    hll.update(c, vals[3500:])
    merged = hll.merge(hll.merge(a.copy(), b), c)
    assert np.array_equal(merged, serial)
    # associativity: (a+b)+c == a+(b+c), byte-equal
    m2 = hll.merge(a.copy(), hll.merge(b.copy(), c))
    assert np.array_equal(merged, m2)


def test_hll_roundtrip_serialize():
    hll = HLL(p=10)
    st = hll.zero()
    hll.update(st, ["x", "y", "z"])
    assert np.array_equal(hll.deserialize(hll.serialize(st)), st)


# --------------------------------------------------------------------------
# Bloom filters: truth tables + sizing + FPR bound (F3)
# --------------------------------------------------------------------------

def _uint32_be(vals):
    return [int(v).to_bytes(4, "big") for v in vals]


@pytest.mark.parametrize("factory", [
    lambda: BloomCounting(m=1000, k=4),
    lambda: BloomBit(m=1000, k=4),
])
def test_bloom_basic_truth_table(factory):
    bf = factory()
    st = bf.zero()
    bf.update(st, ["Boss", "Joke"])
    assert bf.exist(st, ["Boss", "Joke", "Emotion"]).tolist() == [True, True, False]


def test_bloom_counting_remove():
    bf = BloomCounting(m=1000, k=4)
    st = bf.zero()
    bf.update(st, ["Boss", "Joke"])
    bf.remove(st, ["Joke"])
    assert bf.exist(st, ["Boss", "Joke"]).tolist() == [True, False]
    # removing an absent key is a no-op (all-k-nonzero pre-check)
    before = st["counters"].copy()
    bf.remove(st, ["Emotion"])
    assert np.array_equal(st["counters"], before)


def test_bloom_uint_keys():
    bf = BloomCounting(m=1000, k=4)
    st = bf.zero()
    bf.update(st, _uint32_be([100, 101, 102]))
    got = bf.exist(st, _uint32_be([100, 101, 102, 103]))
    assert got.tolist() == [True, True, True, False]


def test_bloom_sizing():
    # New(1000, 4): m rounds to 1024, k preserved (bloom_test.go:125-137)
    bf = BloomCounting(m=1000, k=4)
    assert bf.M() == 1024 and bf.K() == 4
    # min size 512
    assert BloomBit(m=10, k=2).M() == 512


def test_bloom_guess_fpr_bound():
    # n=100000, p=0.001 -> projected FPR <= p (bloom_test.go:114-123)
    bf = BloomCounting.from_guess(100_000, 0.001)
    assert bf.guess_false_positive(100_000) <= 0.001


def test_bloom_no_false_negatives_and_fpr():
    n, p = 20_000, 0.001
    bf = BloomBit.from_guess(n, p)
    st = bf.zero()
    members = [f"member-{i}" for i in range(n)]
    bf.update(st, members)
    assert bf.exist(st, members).all()  # zero false negatives
    outsiders = [f"outsider-{i}" for i in range(50_000)]
    fpr = bf.exist(st, outsiders).mean()
    assert fpr <= 3 * bf.guess_false_positive(n) + 1e-4


def test_bloom_bit_merge_equals_serial():
    bf = BloomBit.from_guess(5000, 0.01)
    vals = [f"k{i}" for i in range(5000)]
    serial = bf.zero()
    bf.update(serial, vals)
    a, b = bf.zero(), bf.zero()
    bf.update(a, vals[:2000])
    bf.update(b, vals[2000:])
    merged = bf.merge(a, b)
    assert np.array_equal(merged["words"], serial["words"])
    assert merged["n"][0] == serial["n"][0]


def test_bloom_scalable_growth_and_truth():
    bf = BloomScalable(n0=500, p=0.01)
    st = bf.zero()
    vals = [f"s{i}" for i in range(5000)]
    bf.update(st, vals)
    assert len(st["levels"]) > 1  # grew past the first filter
    assert bf.exist(st, vals).all()
    assert bf.N(st) == 5000
    fpr = bf.exist(st, [f"absent-{i}" for i in range(20_000)]).mean()
    assert fpr <= 0.05  # compound FPR stays near target


def test_bloom_scalable_merge_is_commutative():
    bf = BloomScalable(n0=500, p=0.01)
    a, b = bf.zero(), bf.zero()
    bf.update(a, [f"a{i}" for i in range(1200)])
    bf.update(b, [f"b{i}" for i in range(800)])
    ab = bf.merge(bf.deserialize(bf.serialize(a)), b)
    ba = bf.merge(bf.deserialize(bf.serialize(b)), a)
    assert len(ab["levels"]) == len(ba["levels"])
    for la, lb in zip(ab["levels"], ba["levels"]):
        assert np.array_equal(la["words"], lb["words"])
    assert bf.exist(ab, [f"a{i}" for i in range(1200)]).all()
    assert bf.exist(ab, [f"b{i}" for i in range(800)]).all()


@pytest.mark.parametrize("cls", [BloomCounting, BloomBit])
def test_bloom_roundtrip_serialize(cls):
    bf = cls(m=2048, k=5)
    st = bf.zero()
    bf.update(st, ["p", "q", "r"])
    st2 = bf.deserialize(bf.serialize(st))
    key = "counters" if cls is BloomCounting else "words"
    assert np.array_equal(st[key], st2[key])


def test_bloom_scalable_roundtrip_serialize():
    bf = BloomScalable(n0=300, p=0.01)
    st = bf.zero()
    bf.update(st, [f"x{i}" for i in range(2000)])
    st2 = bf.deserialize(bf.serialize(st))
    assert len(st2["levels"]) == len(st["levels"])
    for la, lb in zip(st["levels"], st2["levels"]):
        assert np.array_equal(la["words"], lb["words"])


# --------------------------------------------------------------------------
# t-digest / KLL: approximate-vs-exact oracle (F4)
# --------------------------------------------------------------------------

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _rank_error(data, estimates, qs):
    data = np.sort(data)
    errs = []
    for q, est in zip(qs, estimates):
        actual_rank = np.searchsorted(data, est, side="right") / len(data)
        errs.append(abs(actual_rank - q))
    return max(errs)


@pytest.mark.parametrize("dist", ["uniform", "lognormal", "ints"])
def test_tdigest_rank_error(dist):
    rng = np.random.default_rng(42)
    n = 100_000
    data = {"uniform": rng.uniform(0, 1, n),
            "lognormal": rng.lognormal(5, 1.2, n),
            "ints": rng.integers(0, 500, n).astype(float)}[dist]
    td = TDigest(delta=100)
    st = td.zero()
    for i in range(0, n, 10_000):
        td.update(st, data[i:i + 10_000])
    est = td.quantile(st, QS)
    assert _rank_error(data, est, QS) <= 0.02


def test_tdigest_merge_rank_error():
    rng = np.random.default_rng(7)
    n = 60_000
    data = rng.lognormal(4, 1.0, n)
    td = TDigest(delta=100)
    parts = np.array_split(data, 7)
    states = []
    for p in parts:
        st = td.zero()
        td.update(st, p)
        states.append(st)
    merged = states[0]
    for s in states[1:]:
        merged = td.merge(merged, s)
    est = td.quantile(merged, QS)
    assert _rank_error(data, est, QS) <= 0.02
    assert td.count(merged) == n


def test_tdigest_extremes_exact():
    td = TDigest()
    st = td.zero()
    data = np.arange(1000, dtype=float)
    td.update(st, data)
    assert td.quantile(st, [0.0])[0] == 0.0
    assert td.quantile(st, [1.0])[0] == 999.0


def test_tdigest_roundtrip_serialize():
    td = TDigest()
    st = td.zero()
    td.update(st, np.arange(5000, dtype=float))
    st2 = td.deserialize(td.serialize(st))
    assert np.array_equal(st["means"], st2["means"])
    assert np.array_equal(st["weights"], st2["weights"])


@pytest.mark.parametrize("dist", ["uniform", "lognormal"])
def test_kll_rank_error(dist):
    rng = np.random.default_rng(42)
    n = 100_000
    data = {"uniform": rng.uniform(0, 1, n),
            "lognormal": rng.lognormal(5, 1.2, n)}[dist]
    kll = KLL(k=200)
    st = kll.zero()
    for i in range(0, n, 10_000):
        kll.update(st, data[i:i + 10_000])
    est = kll.quantile(st, QS)
    assert _rank_error(data, est, QS) <= 0.025


def test_kll_merge_rank_error():
    rng = np.random.default_rng(3)
    n = 80_000
    data = rng.normal(0, 1, n)
    kll = KLL(k=200)
    states = []
    for p in np.array_split(data, 9):
        st = kll.zero()
        kll.update(st, p)
        states.append(st)
    merged = states[0]
    for s in states[1:]:
        merged = kll.merge(merged, s)
    assert kll.count(merged) == n
    est = kll.quantile(merged, QS)
    assert _rank_error(data, est, QS) <= 0.03


def test_kll_roundtrip_serialize():
    kll = KLL(k=128)
    st = kll.zero()
    kll.update(st, np.random.default_rng(1).uniform(0, 1, 10_000))
    st2 = kll.deserialize(kll.serialize(st))
    assert len(st["levels"]) == len(st2["levels"])
    for a, b in zip(st["levels"], st2["levels"]):
        assert np.array_equal(a, b)
    assert kll.quantile(st, [0.5])[0] == kll.quantile(st2, [0.5])[0]


# --------------------------------------------------------------------------
# MinHash / SimHash
# --------------------------------------------------------------------------

def test_minhash_jaccard_estimate():
    from gopie_spark.kernels.hashes import fnv1_64_values
    mh = MinHash(k=256)
    a = [f"sh{i}" for i in range(1000)]
    b = [f"sh{i}" for i in range(500, 1500)]  # true J = 500/1500 = 1/3
    sig_a = mh.signature_of(fnv1_64_values(a))
    sig_b = mh.signature_of(fnv1_64_values(b))
    j = MinHash.jaccard(sig_a, sig_b)
    assert abs(j - 1 / 3) < 0.1


def test_minhash_merge_is_set_union():
    from gopie_spark.kernels.hashes import fnv1_64_values
    mh = MinHash(k=64)
    a, b = mh.zero(), mh.zero()
    mh.update(a, [f"x{i}" for i in range(100)])
    mh.update(b, [f"x{i}" for i in range(50, 200)])
    union = mh.zero()
    mh.update(union, [f"x{i}" for i in range(200)])
    assert np.array_equal(mh.merge(a.copy(), b), union)


def test_minhash_batch_signatures_match_single():
    from gopie_spark.kernels.hashes import fnv1_64_values
    mh = MinHash(k=32)
    docs = [fnv1_64_values([f"d{d}t{t}" for t in range(20)]) for d in range(5)]
    docs.append(np.empty(0, dtype=np.uint64))  # empty doc
    batch = mh.batch_signatures(docs)
    for i, d in enumerate(docs[:-1]):
        assert np.array_equal(batch[i], mh.signature_of(d))
    assert (batch[-1] == np.iinfo(np.uint64).max).all()


def test_simhash_near_duplicates_close():
    from gopie_spark.kernels.hashes import fnv1_64_values
    sh = SimHash()
    base = [f"token{i}" for i in range(200)]
    near = base[:195] + [f"changed{i}" for i in range(5)]
    far = [f"other{i}" for i in range(200)]
    fps = sh.batch_fingerprints([fnv1_64_values(d) for d in (base, near, far)])
    d_near = SimHash.hamming(fps[0:1], fps[1:2])[0]
    d_far = SimHash.hamming(fps[0:1], fps[2:3])[0]
    assert d_near <= 12
    assert d_far >= 20


def test_simhash_merge_matches_serial():
    from gopie_spark.kernels.hashes import fnv1_64_values
    sh = SimHash()
    toks = [f"t{i}" for i in range(500)]
    serial = sh.zero()
    sh.update(serial, toks)
    a, b = sh.zero(), sh.zero()
    sh.update(a, toks[:200])
    sh.update(b, toks[200:])
    assert np.array_equal(sh.merge(a, b), serial)


def test_tdigest_rank_inverts_quantile():
    import numpy as np
    from gopie_spark.kernels import TDigest
    rng = np.random.default_rng(3)
    xs = rng.lognormal(3.0, 1.0, 20000)
    td = TDigest(delta=100.0)
    st = td.zero()
    td.update(st, xs)
    for q in (0.1, 0.25, 0.5, 0.75, 0.9):
        v = td.quantile(st, [q])[0]
        r = td.rank(st, [v])[0]
        assert abs(r - q) < 0.02
    assert td.rank(st, [xs.min() - 1])[0] == 0.0
    assert td.rank(st, [xs.max() + 1])[0] == 1.0


def test_hll_union_and_intersection_estimates():
    import numpy as np
    from gopie_spark.kernels import HLL
    hll = HLL(p=14)
    a, b = hll.zero(), hll.zero()
    hll.update(a, [f"a{i}" for i in range(6000)] +
               [f"s{i}" for i in range(2000)])
    hll.update(b, [f"b{i}" for i in range(4000)] +
               [f"s{i}" for i in range(2000)])
    union = hll.union_count(a, b)
    inter = hll.intersection_estimate(a, b)
    assert abs(union - 12000) <= 3 * hll.std_err * 12000 + 5
    # intersection error scales with the union size (documented caveat)
    assert abs(inter - 2000) <= 3 * hll.std_err * 12000 + 5


def test_misra_gries_exact_when_capacity_sufficient():
    import numpy as np
    from gopie_spark.kernels import MisraGries
    mg = MisraGries(k=16)
    st = mg.zero()
    vals = ["a"] * 5 + ["b"] * 3 + ["c"] * 2
    mg.update(st, vals)
    assert mg.error_bound(st) == 0
    assert mg.count(st) == 10
    keys, counts = mg.topk(st)
    assert list(keys) == ["a", "b", "c"]
    assert list(counts) == [5, 3, 2]
    # roundtrip + k-mismatch + from_blob
    blob = mg.serialize(st)
    st2 = mg.deserialize(blob)
    assert list(st2["keys"]) == list(st["keys"])
    assert MisraGries.from_blob(blob).k == 16
    import pytest as _pytest
    with _pytest.raises(ValueError):
        MisraGries(k=8).deserialize(blob)


def test_misra_gries_heavy_hitter_guarantee_zipf():
    import numpy as np
    from gopie_spark.kernels import MisraGries
    rng = np.random.default_rng(11)
    stream = [f"t{z}" for z in (rng.zipf(1.3, size=40000) % 2000)]
    import collections
    true = collections.Counter(stream)
    n = len(stream)
    k = 64
    mg = MisraGries(k=k)
    st = mg.zero()
    for lo in range(0, n, 4096):  # batched updates
        mg.update(st, stream[lo:lo + 4096])
    err = mg.error_bound(st)
    assert err <= n // (k + 1) + 1
    tracked = set(st["keys"])
    est = {kk: int(c) for kk, c in zip(st["keys"], st["counts"])}
    for key, cnt in true.items():
        if cnt > err:
            assert key in tracked, (key, cnt, err)
        if key in est:
            assert est[key] <= cnt <= est[key] + err


def test_misra_gries_merge_preserves_guarantee():
    import numpy as np
    from gopie_spark.kernels import MisraGries
    rng = np.random.default_rng(12)
    stream = [f"t{z}" for z in (rng.zipf(1.4, size=30000) % 500)]
    import collections
    true = collections.Counter(stream)
    n = len(stream)
    mg = MisraGries(k=48)
    parts = [stream[i::7] for i in range(7)]  # arbitrary split
    states = []
    for p in parts:
        st = mg.zero()
        mg.update(st, p)
        states.append(st)
    merged = states[0]
    for st in states[1:]:
        merged = mg.merge(merged, st)
    err = mg.error_bound(merged)
    assert mg.count(merged) == n
    assert err <= n // 49 + 1
    est = {kk: int(c) for kk, c in zip(merged["keys"], merged["counts"])}
    for key, cnt in true.items():
        if cnt > err:
            assert key in est
        if key in est:
            assert est[key] <= cnt <= est[key] + err
