"""Property-based kernel tests (hypothesis).

The reference's tests are example-based; these generalize the load-bearing
invariants over arbitrary inputs:

- vectorized hashes == scalar references on arbitrary byte strings;
- split/merge invariance: any partitioning of any input yields the serial
  state byte-for-byte (HLL/CMS/Bloom/MinHash/SimHash);
- CMS never undercounts; Bloom never false-negatives;
- quantile sketches respect rank-error bounds on arbitrary floats.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from gopie_spark.kernels import (CMS, HLL, KLL, BloomBit, MinHash, SimHash,
                                 TDigest)
from gopie_spark.kernels import hashes
from tests import reference_impls as ref

byte_strings = st.lists(st.binary(min_size=0, max_size=64),
                        min_size=1, max_size=50)
tokens = st.lists(st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789",
                          min_size=1, max_size=12),
                  min_size=1, max_size=200)


@settings(max_examples=50, deadline=None)
@given(byte_strings)
def test_fnv32_matches_scalar(data):
    assert hashes.fnv1_32_values(data).tolist() == \
        [ref.fnv1_32(b) for b in data]


@settings(max_examples=50, deadline=None)
@given(byte_strings)
def test_fnv64_matches_scalar(data):
    assert hashes.fnv1_64_values(data).tolist() == \
        [ref.fnv1_64(b) for b in data]


@settings(max_examples=50, deadline=None)
@given(byte_strings)
def test_siphash_matches_scalar(data):
    assert hashes.siphash24_values(data).tolist() == \
        [ref.siphash24(ref.GOPIE_SIP_KEY, b) for b in data]


def _split(values, cut_points):
    cuts = sorted({c % (len(values) + 1) for c in cut_points})
    parts, prev = [], 0
    for c in cuts + [len(values)]:
        parts.append(values[prev:c])
        prev = c
    return parts


@settings(max_examples=25, deadline=None)
@given(tokens, st.lists(st.integers(0, 10_000), min_size=1, max_size=5))
def test_sketch_split_merge_invariance(toks, cuts):
    for sketch in (HLL(p=8), CMS(width=64, depth=3),
                   BloomBit(m=512, k=3), MinHash(k=16), SimHash()):
        serial = sketch.zero()
        sketch.update(serial, toks)
        merged = None
        for part in _split(toks, cuts):
            stp = sketch.zero()
            if part:
                sketch.update(stp, part)
            merged = stp if merged is None else sketch.merge(merged, stp)
        assert sketch.serialize(merged) == sketch.serialize(serial), \
            type(sketch).__name__


@settings(max_examples=25, deadline=None)
@given(tokens)
def test_cms_never_undercounts(toks):
    cms = CMS(width=32, depth=3)  # deliberately tiny: collisions guaranteed
    st_ = cms.zero()
    cms.update(st_, toks)
    uniq, counts = np.unique(toks, return_counts=True)
    est = cms.estimate(st_, list(uniq))
    assert (est.astype(np.int64) >= counts).all()
    assert cms.count(st_) == len(toks)


@settings(max_examples=25, deadline=None)
@given(tokens)
def test_bloom_no_false_negatives(toks):
    bf = BloomBit(m=512, k=3)
    st_ = bf.zero()
    bf.update(st_, toks)
    assert bf.exist(st_, toks).all()


@settings(max_examples=20, deadline=None)
@given(st.lists(st.floats(min_value=-1e9, max_value=1e9,
                          allow_nan=False, allow_infinity=False),
                min_size=20, max_size=2000))
def test_quantile_sketches_rank_bounds(xs):
    data = np.asarray(xs, dtype=np.float64)
    n = len(data)
    srt = np.sort(data)
    for sk, eps in ((TDigest(delta=100), 0.05), (KLL(k=200), 0.05)):
        st_ = sk.zero()
        sk.update(st_, data)
        for q in (0.1, 0.5, 0.9):
            est = float(sk.quantile(st_, [q])[0])
            lo = np.searchsorted(srt, est, side="left") / n
            hi = np.searchsorted(srt, est, side="right") / n
            assert lo - eps <= q <= hi + eps, (type(sk).__name__, q, est)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.lists(st.integers(0, 2**63 - 1), min_size=0, max_size=400),
                min_size=1, max_size=12))
def test_minhash_batch_equals_per_doc(hash_lists):
    """The seed-chunked batch_signatures sweep must be bit-identical to
    the single-document signature_of path for every document, including
    empty ones (all-max signature)."""
    mh = MinHash(k=64)
    arrays = [np.array(sorted(set(h)), dtype=np.uint64) for h in hash_lists]
    batch = mh.batch_signatures(arrays)
    for i, a in enumerate(arrays):
        want = mh.signature_of(a) if a.size else mh.zero()
        assert np.array_equal(batch[i], want)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.lists(st.integers(0, 2**63 - 1), min_size=0, max_size=30),
                min_size=1, max_size=8),
       st.integers(1, 4))
def test_shingle_hashes_flat_matches_scalar(docs, width):
    """Vectorized rolling-polynomial shingle hashing must match a scalar
    per-window reference, including boundary masking (no shingle spans
    two docs) and the one-shingle short-doc convention."""
    from gopie_spark.kernels.minhash import _SHINGLE_PRIME, shingle_hashes_flat
    from gopie_spark.kernels.hashes import mix64
    arrays = [np.array(d, dtype=np.uint64) for d in docs]
    flat = np.concatenate(arrays) if arrays else np.empty(0, dtype=np.uint64)
    lens = np.array([a.size for a in arrays], dtype=np.int64)
    got, got_lens = shingle_hashes_flat(flat, lens, width)
    exp, exp_lens = [], []
    for a in arrays:
        if a.size == 0:
            exp_lens.append(0)
            continue
        n_sh = a.size - width + 1 if a.size >= width else 1
        exp_lens.append(n_sh)
        for i in range(n_sh):
            win = a[i:i + width] if a.size >= width else a
            c = int(win[0])
            for x in win[1:]:
                c = ((c * int(_SHINGLE_PRIME)) & 0xFFFFFFFFFFFFFFFF) ^ int(x)
            exp.append(int(mix64(np.array([c], dtype=np.uint64))[0]))
    assert got_lens.tolist() == exp_lens
    assert got.tolist() == exp


# -- round 2: counting-Bloom subtract == sequential remove --------------------

@given(st.lists(st.integers(0, 60), min_size=1, max_size=120, unique=True),
       st.data())
@settings(max_examples=25, deadline=None)
def test_bloom_subtract_matches_sequential_remove(keys, data):
    """For any keyset, any sub-multiset of removals, and any 2-way
    partition split of the additions: distributed build + counter
    subtract == sequential per-element Remove."""
    import numpy as np
    from gopie_spark.kernels import BloomCounting
    bf = BloomCounting.from_guess(max(len(keys), 16), 1e-6)
    ks = [f"k{k}" for k in keys]
    rm = [k for k in ks if data.draw(st.booleans())]
    cut = data.draw(st.integers(0, len(ks)))

    seq = bf.zero()
    bf.update(seq, ks)
    bf.remove(seq, rm)

    a, b, r = bf.zero(), bf.zero(), bf.zero()
    if ks[:cut]:
        bf.update(a, ks[:cut])
    if ks[cut:]:
        bf.update(b, ks[cut:])
    merged = bf.merge(a, b)
    if rm:
        bf.update(r, rm)
    got = bf.subtract(merged, r)
    assert np.array_equal(got["counters"], seq["counters"])
    assert got["n"][0] == seq["n"][0]


# -- round 2: connected components == union-find oracle -----------------------

def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


@given(st.lists(st.tuples(st.integers(0, 40), st.integers(0, 40)),
                min_size=1, max_size=80))
@settings(max_examples=10, deadline=None)
def test_cc_matches_union_find(spark, pairs):
    """Large-star/small-star CC == a driver-side union-find oracle on
    arbitrary random graphs (self-loops and duplicate edges included)."""
    from gopie_spark.operators.graph import connected_components
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    # local_threshold=0 forces the distributed star rounds (the default
    # small-graph endgame IS a union-find, which would test nothing)
    got = {r["id"]: r["component"]
           for r in connected_components(df, local_threshold=0).collect()}
    want = _uf_components([(a, b) for a, b in pairs if a != b])
    assert got == want
    got_local = {r["id"]: r["component"]
                 for r in connected_components(df).collect()}
    assert got_local == want


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=1, max_value=5000))
def test_sparse_dense_boundary_roundtrip(n):
    """Adaptive sparse/dense serialization round-trips to identical
    state at every load level, including right at the size-choice
    boundary, for all three sparse-capable kernels."""
    vals = [f"k{i}" for i in range(n)]
    hll = HLL(p=10)
    sh = hll.update(hll.zero(), vals)
    assert np.array_equal(hll.deserialize(hll.serialize(sh)), sh)
    cms = CMS(width=256, depth=4)
    sc = cms.update(cms.zero(), vals)
    rt = cms.deserialize(cms.serialize(sc))
    assert np.array_equal(rt["matrix"], sc["matrix"])
    assert np.array_equal(rt["count"], sc["count"])
    bb = BloomBit(m=1 << 14, k=5)
    sb = bb.update(bb.zero(), vals)
    rtb = bb.deserialize(bb.serialize(sb))
    assert np.array_equal(rtb["words"], sb["words"])
    assert np.array_equal(rtb["n"], sb["n"])


def test_sparse_blob_with_missing_pair_field_raises():
    """A sparse index field without its value field (or vice versa) is
    a malformed blob, not a silent zero state."""
    import pytest
    from gopie_spark.kernels import codec
    cms = CMS(width=64, depth=3)
    half = codec.pack(codec.KIND_CMS, [
        (1, np.array([3, 64], dtype=np.uint32).tobytes()),
        (2, np.zeros(1, dtype=np.uint64).tobytes()),
        (4, np.array([1], dtype=np.uint32).tobytes()),  # idx, no counts
    ])
    with pytest.raises(ValueError, match="neither dense nor sparse"):
        cms.deserialize(half)
    bb = BloomBit(m=1 << 10, k=3)
    halfb = codec.pack(codec.KIND_BLOOM_BIT, [
        (1, np.array([1 << 10, 3], dtype=np.uint64).tobytes()),
        (2, np.zeros(1, dtype=np.uint64).tobytes()),
        (5, np.array([7], dtype=np.uint64).tobytes()),  # words, no idx
    ])
    with pytest.raises(ValueError, match="neither dense nor sparse"):
        bb.deserialize(halfb)
