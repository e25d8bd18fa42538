"""Cuckoo filter (kernels/cuckoo.py + operators cuckoo_build).

Gates: no false negatives after insert; FPR within 3x the published
2b/2^fbits bound on 100k non-member probes; delete removes exactly the
requested copies (and the strict distributed subtract raises on
non-sub-multisets); merge is the canonical multiset union — associative,
commutative, byte-stable under any split; the kicked placement is a
REAL cuckoo table (every fingerprint sits in one of its two buckets,
bucket occupancy <= SLOTS, 93% load places); codec round-trips and
refuses wrong kinds / params / corrupt lengths; the distributed
two-level build equals the serial kernel byte-for-byte."""
import math

import numpy as np
import pytest

from gopie_spark.kernels import CuckooFilter
from gopie_spark.kernels.cuckoo import MAX_LOAD, SLOTS


def _keys(prefix, n):
    return np.array([f"{prefix}{i}" for i in range(n)], dtype=object)


def test_no_false_negatives_and_fpr_bound():
    cf = CuckooFilter.from_guess(20000, 1e-4)
    vals = _keys("user", 20000)
    st = cf.update(cf.zero(), vals)
    assert cf.exist(st, vals).all()
    probes = _keys("ghost", 100000)
    fpr = float(cf.exist(st, probes).mean())
    assert fpr <= 3 * cf.guess_false_positive() + 1e-12


def test_sizing_honors_target():
    cf = CuckooFilter.from_guess(10000, 1e-8)
    assert cf.guess_false_positive() <= 1e-8
    assert cf.m * SLOTS * MAX_LOAD >= 10000
    assert (cf.m & (cf.m - 1)) == 0
    with pytest.raises(ValueError):
        CuckooFilter.from_guess(100, 1e-12)   # >32 fingerprint bits


def test_delete_removes_requested_copies_only():
    cf = CuckooFilter.from_guess(5000, 1e-8)
    vals = _keys("k", 5000)
    st = cf.update(cf.zero(), vals)
    st = cf.remove(st, vals[:2000])
    assert cf.n(st) == 3000
    assert cf.exist(st, vals[2000:]).all()          # survivors intact
    assert cf.exist(st, vals[:2000]).sum() == 0     # fbits=30: no FP here
    # duplicate inserts are a multiset: one delete leaves one copy
    st2 = cf.update(cf.update(cf.zero(), vals[:10]), vals[:10])
    st2 = cf.remove(st2, vals[:10])
    assert cf.n(st2) == 10
    assert cf.exist(st2, vals[:10]).all()
    # removing a non-member is ignored (non-strict path)
    st3 = cf.remove(st, _keys("ghost", 50))
    assert cf.n(st3) == 3000


def test_subtract_is_strict():
    cf = CuckooFilter.from_guess(1000, 1e-8)
    a = cf.update(cf.zero(), _keys("k", 1000))
    b = cf.update(cf.zero(), _keys("k", 400))
    out = cf.subtract(a, b)
    assert cf.n(out) == 600
    ghost = cf.update(cf.zero(), _keys("ghost", 5))
    with pytest.raises(ValueError, match="sub-multiset"):
        cf.subtract(a, ghost)


def test_merge_associative_commutative_byte_stable():
    cf = CuckooFilter.from_guess(9000, 1e-6)
    vals = _keys("k", 9000)
    parts = [cf.update(cf.zero(), vals[i::3]) for i in range(3)]
    s1 = cf.serialize(cf.merge(cf.merge(parts[0], parts[1]), parts[2]))
    s2 = cf.serialize(cf.merge(parts[2], cf.merge(parts[1], parts[0])))
    serial = cf.serialize(cf.update(cf.zero(), vals))
    assert s1 == s2 == serial


def test_placement_is_a_real_cuckoo_table():
    cf = CuckooFilter(m=1024, fbits=16)
    n = int(1024 * SLOTS * 0.93)
    st = cf.update(cf.zero(), _keys("k", n))
    table = cf.place(st)
    assert table.shape == (cf.m, SLOTS)
    assert int((table != 0).sum()) == cf.n(st)  # every entry placed once
    # every stored fingerprint is findable in one of ITS two buckets:
    # rebuild the multiset from the table and compare to the state
    rows, _ = np.nonzero(table)
    fps = table[table != 0]
    alt = cf._alt(rows.astype(np.uint32), fps)
    canon = np.minimum(rows.astype(np.uint32), alt)
    got = np.lexsort((fps, canon))
    want = cf._canonical(st)
    assert (canon[got] == want["buckets"]).all()
    assert (fps[got] == want["fps"]).all()


def test_over_capacity_raises():
    cf = CuckooFilter(m=64, fbits=16)
    with pytest.raises(ValueError, match="capacity"):
        st = cf.update(cf.zero(), _keys("k", 64 * SLOTS + 1))
    st = cf.update(cf.zero(), _keys("k", 64 * SLOTS))  # fits the slots...
    with pytest.raises(ValueError, match="capacity"):
        cf.place(st)                                   # ...but not the load


def test_codec_roundtrip_and_refusals():
    from gopie_spark.kernels import codec, sketch_from_blob
    cf = CuckooFilter.from_guess(1000, 1e-6)
    st = cf.update(cf.zero(), _keys("k", 1000))
    blob = cf.serialize(st)
    rt = cf.deserialize(blob)
    assert (rt["buckets"] == cf._canonical(st)["buckets"]).all()
    assert (rt["fps"] == cf._canonical(st)["fps"]).all()
    # registry dispatch reconstructs the right geometry
    cf2 = sketch_from_blob(blob)
    assert (cf2.m, cf2.fbits) == (cf.m, cf.fbits)
    with pytest.raises(ValueError):
        CuckooFilter(m=cf.m * 2, fbits=cf.fbits).deserialize(blob)
    with pytest.raises(ValueError):
        cf.deserialize(codec.pack(codec.KIND_HLL, [(1, b"x")]))
    # corrupt: bucket index out of range
    bad = {"buckets": np.array([cf.m + 7], dtype=np.uint32),
           "fps": np.array([3], dtype=rt["fps"].dtype)}
    with pytest.raises(ValueError, match="out of range"):
        cf.deserialize(cf.serialize(bad))


def test_fpr_formula_matches_paper():
    cf = CuckooFilter(m=256, fbits=12)
    want = 1 - (1 - 2.0 ** -12) ** (2 * SLOTS)
    assert math.isclose(cf.guess_false_positive(), want)


@pytest.mark.parametrize("parts", [1, 3, 8])
def test_distributed_build_equals_serial(spark, sf_dir, parts):
    from gopie_spark.operators import cuckoo_build
    import pyspark.sql.functions as F
    events = (spark.read.parquet(f"{sf_dir}/events.parquet")
              .select(F.col("event_id").cast("string").alias("e"))
              .repartition(parts))
    n = events.count()
    cf, state = cuckoo_build(events, "e", n=n, p=1e-6)
    vals = np.array([r["e"] for r in events.collect()], dtype=object)
    serial = cf.update(cf.zero(), vals)
    assert cf.serialize(state) == cf.serialize(serial)
    assert cf.exist(state, vals).all()


def test_sharded_cuckoo_build_subtract_probe(spark, sf_dir):
    """The 10^12-key deletable tier: sharded cuckoo states built after
    one hash shuffle, removals subtracted shard-locally on
    co-partitioned blobs (never broadcast, never concentrated), probe
    == the exact surviving set."""
    import pyspark.sql.functions as F
    from gopie_spark.kernels import CuckooFilter
    from gopie_spark.operators.membership import (bloom_shards_build,
                                                  bloom_shards_filter,
                                                  shards_subtract)
    events = (spark.read.parquet(f"{sf_dir}/events.parquet")
              .select(F.col("event_id").cast("string").alias("e"),
                      "user_id"))
    n = events.count()
    removed_rows = events.filter(F.pmod(F.col("user_id"), F.lit(3)) == 0) \
        .select("e")
    kw = dict(n=n, p=1e-6, shards=8, filter_cls=CuckooFilter)
    added = bloom_shards_build(events.select("e"), "e", **kw)
    removed = bloom_shards_build(removed_rows, "e", **kw)
    after = shards_subtract(added, removed, n=n, p=1e-6, shards=8)
    hits = bloom_shards_filter(spark, after, events.select("e"), "e", **kw)
    got = sorted(int(r["e"]) for r in hits.collect())
    want = sorted(int(r["e"]) for r in events
                  .filter(F.pmod(F.col("user_id"), F.lit(3)) != 0)
                  .select("e").collect())
    assert got == want
    # shard-count sanity: one state row per non-empty shard
    assert added.count() <= 8


def test_shards_subtract_strict_raises(spark, sf_dir):
    """Subtracting keys never added must raise (per-shard kernel
    strictness surfaces through the cogroup)."""
    import pyspark.sql.functions as F
    from gopie_spark.kernels import CuckooFilter
    from gopie_spark.operators.membership import (bloom_shards_build,
                                                  shards_subtract)
    events = (spark.read.parquet(f"{sf_dir}/events.parquet")
              .select(F.col("event_id").cast("string").alias("e")))
    n = events.count()
    kw = dict(n=n, p=1e-6, shards=4, filter_cls=CuckooFilter)
    added = bloom_shards_build(events.limit(50), "e", **kw)
    ghosts = bloom_shards_build(
        events.select(F.concat(F.lit("ghost"), F.col("e")).alias("e"))
        .limit(20), "e", **kw)
    bad = shards_subtract(added, ghosts, n=n, p=1e-6, shards=4)
    with pytest.raises(Exception, match="sub-multiset|subtract"):
        bad.collect()
