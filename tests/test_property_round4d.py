"""Hypothesis property tests for the round-4d kernels/operators.

Pure-kernel (no Spark) invariants: Theta split-merge == serial
byte-equal and exact-below-k on ARBITRARY inputs; BPE encode is
lossless and learner/encoder agree with the independent reference on
arbitrary word histograms; FreqDir bound holds under arbitrary splits
of random matrices; grouped-topk prune fold never loses a true
top-k row.
"""
import numpy as np
from hypothesis import given, settings, strategies as st

from gopie_spark.kernels import FreqDir, Theta

tokens = st.lists(st.text(alphabet="abcdef0123456789", min_size=1,
                          max_size=12), min_size=0, max_size=300)


@settings(max_examples=40, deadline=None)
@given(tokens, st.integers(2, 5))
def test_theta_split_merge_byte_equal(vals, n_parts):
    t = Theta(k=64)
    serial = t.zero()
    if vals:
        t.update(serial, vals)
    parts = [vals[i::n_parts] for i in range(n_parts)]
    merged = t.zero()
    for p in parts:
        st_p = t.zero()
        if p:
            t.update(st_p, p)
        merged = t.merge(merged, st_p)
    assert t.serialize(merged) == t.serialize(serial)


@settings(max_examples=40, deadline=None)
@given(tokens)
def test_theta_exact_below_k(vals):
    t = Theta(k=1 << 14)  # always above the distinct count here
    s = t.zero()
    if vals:
        t.update(s, vals)
    assert t.estimate(s) == float(len(set(vals)))


words = st.dictionaries(st.text(alphabet="abcxyz", min_size=1,
                                max_size=8),
                        st.integers(1, 50), min_size=0, max_size=30)


@settings(max_examples=30, deadline=None)
@given(words, st.integers(0, 20))
def test_bpe_learner_matches_reference_and_lossless(wf, n_merges):
    from gopie_spark.operators.bpe import encode_word, learn_bpe_from_freqs
    from tests.test_bpe import _ref_encode, _ref_learn

    merges = learn_bpe_from_freqs(list(wf.items()), n_merges)
    assert merges == _ref_learn(dict(wf), n_merges)
    ranks = {m: i for i, m in enumerate(merges)}
    for w in wf:
        enc = encode_word(w, ranks)
        assert "".join(enc) == w
        assert enc == _ref_encode(w, merges)


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 10_000), st.integers(2, 4))
def test_freqdir_bound_random_matrices(seed, n_parts):
    rng = np.random.default_rng(seed)
    n, d = int(rng.integers(1, 400)), int(rng.integers(4, 24))
    A = rng.standard_normal((n, d)) * rng.exponential(2.0)
    fd = FreqDir(ell=8, d=d)
    states = []
    for p in np.array_split(A, n_parts):
        s = fd.zero()
        if len(p):
            fd.update(s, p)
        states.append(s)
    merged = states[0]
    for s in states[1:]:
        merged = fd.merge(merged, s)
    err = np.linalg.norm(A.T @ A - fd.gram(merged), 2)
    assert err <= fd.spectral_bound(merged) + 1e-9
    assert fd.count(merged) == n


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(st.sampled_from("pq"),
                          st.integers(0, 1000),
                          st.floats(-100, 100, allow_nan=False)),
                min_size=0, max_size=200),
       st.integers(1, 5), st.integers(1, 4))
def test_topk_prune_fold_preserves_topk(rows, k, n_chunks):
    """The mapInPandas fold (arbitrary batch boundaries) keeps every
    true top-k row per key."""
    import pandas as pd
    from gopie_spark.operators.topk import _prune_iter
    df = pd.DataFrame(rows, columns=["key", "id", "v"]) \
        .drop_duplicates("id")
    fn = _prune_iter(["key"], "v", "id", k)
    chunks = np.array_split(df, n_chunks)
    out = list(fn(iter([c for c in chunks if len(c)])))
    got = pd.concat(out) if out else pd.DataFrame(columns=df.columns)
    for key, g in df.groupby("key"):
        want = g.sort_values(["v", "id"], ascending=[False, True]) \
            .head(k)
        sub = got[got["key"] == key] if len(got) else got
        assert set(want["id"]) <= set(sub["id"]), key
