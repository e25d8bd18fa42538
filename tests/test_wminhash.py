"""Weighted MinHash / ICWS (kernels/wminhash.py, dedup operators).

Gates: the slot-match estimator lands within 3 sigma of exact weighted
Jaccard; merge is EXACTLY the pointwise-max-weight union (the CWS
consistency property, byte-equal); the flat-batch path equals the
per-doc loop; a doubled document estimates J_w ~ 1/2 while plain
MinHash sees 1 (the whole point of the weighted variant); codec
round-trips and rejects mismatched k / wrong kinds; the Spark operator
agrees with the NumPy kernel per doc."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from gopie_spark.kernels.wminhash import (WeightedMinHash,
                                          weighted_counts_flat)


def _exact_jw(da, db):
    keys = set(da) | set(db)
    smin = sum(min(da.get(f, 0.0), db.get(f, 0.0)) for f in keys)
    smax = sum(max(da.get(f, 0.0), db.get(f, 0.0)) for f in keys)
    return smin / smax


def _rand_pair(rng, n=40, extra=10):
    feats = rng.integers(1, 2 ** 63, n).astype(np.uint64)
    wa = dict(zip(feats.tolist(), rng.uniform(0.5, 5, n)))
    wb = {f: w * rng.uniform(0.6, 1.4)
          for f, w in wa.items() if rng.random() < 0.7}
    for f in rng.integers(1, 2 ** 63, extra).astype(np.uint64):
        wb[int(f)] = rng.uniform(0.5, 5)
    return wa, wb


def _sig(wmh, d):
    st = wmh.update_weighted(
        wmh.zero(),
        np.array(list(d), dtype=np.uint64),
        np.array(list(d.values()), dtype=np.float64))
    return st


def test_estimator_within_3_sigma():
    rng = np.random.default_rng(3)
    wmh = WeightedMinHash(k=256)
    for _ in range(8):
        wa, wb = _rand_pair(rng)
        sa, sb = _sig(wmh, wa), _sig(wmh, wb)
        est = wmh.estimate((sa["feat"], sa["t"]), (sb["feat"], sb["t"]))
        j = _exact_jw(wa, wb)
        assert abs(est - j) <= 3 * np.sqrt(j * (1 - j) / 256) + 1e-9


def test_merge_is_pointwise_max_union():
    rng = np.random.default_rng(5)
    wmh = WeightedMinHash(k=128)
    feats = rng.integers(1, 2 ** 63, 30).astype(np.uint64)
    w1, w2 = rng.uniform(0.5, 4, 30), rng.uniform(0.5, 4, 30)
    m = wmh.merge(wmh.update_weighted(wmh.zero(), feats, w1),
                  wmh.update_weighted(wmh.zero(), feats, w2))
    direct = wmh.update_weighted(wmh.zero(), feats, np.maximum(w1, w2))
    assert (m["feat"] == direct["feat"]).all()
    assert (m["t"] == direct["t"]).all()
    assert np.allclose(m["la"], direct["la"])


def test_merge_associative_commutative_idempotent():
    rng = np.random.default_rng(7)
    wmh = WeightedMinHash(k=64)
    sts = [_sig(wmh, dict(zip(
        rng.integers(1, 2 ** 63, 20).astype(np.uint64).tolist(),
        rng.uniform(0.5, 3, 20)))) for _ in range(3)]
    ab_c = wmh.merge(wmh.merge(sts[0], sts[1]), sts[2])
    a_bc = wmh.merge(sts[0], wmh.merge(sts[1], sts[2]))
    ba_c = wmh.merge(wmh.merge(sts[1], sts[0]), sts[2])
    aa = wmh.merge(sts[0], sts[0])
    for x, y in [(ab_c, a_bc), (ab_c, ba_c), (aa, sts[0])]:
        assert (x["feat"] == y["feat"]).all() and (x["t"] == y["t"]).all()


def test_flat_batch_equals_loop_and_empty_docs():
    rng = np.random.default_rng(11)
    wmh = WeightedMinHash(k=64)
    docs = [rng.integers(1, 2 ** 63, int(rng.integers(1, 50)))
            .astype(np.uint64) for _ in range(15)]
    docs.insert(4, np.empty(0, dtype=np.uint64))
    flat = np.concatenate(docs)
    lens = np.array([d.size for d in docs])
    uniq, counts, pair_lens = weighted_counts_flat(flat, lens)
    fo, to = wmh.batch_signatures_flat(uniq, counts, pair_lens)
    for i, d in enumerate(docs):
        if d.size == 0:
            assert (fo[i] == 0).all()
            continue
        vals, cs = np.unique(d, return_counts=True)
        st = wmh.update_weighted(wmh.zero(), vals, cs.astype(float))
        assert (fo[i] == st["feat"]).all() and (to[i] == st["t"]).all()


def test_doubled_doc_is_half_similar():
    # token SET identical, multiset doubled: J_w = 1/2 — plain MinHash
    # (set semantics) calls these exact duplicates
    rng = np.random.default_rng(13)
    wmh = WeightedMinHash(k=512)
    feats = rng.integers(1, 2 ** 63, 60).astype(np.uint64)
    w = rng.uniform(1, 3, 60)
    sa = wmh.update_weighted(wmh.zero(), feats, w)
    sb = wmh.update_weighted(wmh.zero(), feats, 2 * w)
    est = wmh.estimate((sa["feat"], sa["t"]), (sb["feat"], sb["t"]))
    assert abs(est - 0.5) <= 3 * np.sqrt(0.25 / 512)


def test_codec_roundtrip_and_refusals():
    rng = np.random.default_rng(17)
    wmh = WeightedMinHash(k=32)
    st = _sig(wmh, {int(f): 1.0 + i for i, f in enumerate(
        rng.integers(1, 2 ** 63, 10).astype(np.uint64))})
    rt = wmh.deserialize(wmh.serialize(st))
    assert (rt["feat"] == st["feat"]).all()
    assert np.allclose(rt["la"], st["la"])
    from gopie_spark.kernels import sketch_from_blob
    again = sketch_from_blob(wmh.serialize(st))
    assert isinstance(again, WeightedMinHash) and again.k == 32
    with pytest.raises(ValueError):
        WeightedMinHash(k=64).deserialize(wmh.serialize(st))
    with pytest.raises(ValueError):
        wmh.merge(st, WeightedMinHash(k=64).zero())
    from gopie_spark.kernels import KLL
    with pytest.raises(ValueError):
        wmh.deserialize(KLL().serialize(KLL().zero()))
    with pytest.raises(ValueError):
        wmh.update_weighted(wmh.zero(),
                            np.array([1], dtype=np.uint64),
                            np.array([0.0]))


def test_spark_operator_matches_kernel(spark, sf_dir):
    from gopie_spark.kernels.hashes import fnv1_64_values
    from gopie_spark.operators.dedup import add_wminhash_signatures
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("doc_id") < 40).select("doc_id", "text"))
    got = {r["doc_id"]: (np.array(r["wmh_feat"], dtype=np.int64),
                         np.array(r["wmh_t"], dtype=np.int64))
           for r in add_wminhash_signatures(docs, k=32).collect()}
    wmh = WeightedMinHash(k=32)
    for r in docs.collect():
        # _flat_token_hashes splits the raw text (no case folding),
        # matching the plain-MinHash signature convention
        toks = [t for t in (r["text"] or "").split() if t]
        vals, cs = np.unique(fnv1_64_values(toks), return_counts=True)
        st = wmh.update_weighted(wmh.zero(), vals, cs.astype(float))
        assert (got[r["doc_id"]][0] ==
                st["feat"].astype(np.int64)).all()
        assert (got[r["doc_id"]][1] == st["t"]).all()


def test_exact_weighted_jaccard_pairs(spark, sf_dir):
    from gopie_spark.operators.dedup import weighted_jaccard_pairs
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("doc_id") < 60))
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in weighted_jaccard_pairs(docs, threshold=0.3).collect()}
    # brute force on the driver
    bags = {}
    for r in docs.select("doc_id", "text").collect():
        toks = [t for t in (r["text"] or "").lower().split() if t]
        bag = {}
        for t in toks:
            bag[t] = bag.get(t, 0) + 1
        bags[r["doc_id"]] = bag
    ids = sorted(bags)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if not bags[a] or not bags[b]:
                continue
            j = _exact_jw(bags[a], bags[b])
            if j >= 0.3:
                want[(a, b)] = j
    assert set(got) == set(want)
    for k_ in got:
        assert abs(got[k_] - want[k_]) < 1e-12
