"""Sketch cube (operators/cube.py): scan-once, merge-only rollups.

Gates: rollup state == direct-build state BYTE-EQUAL at every grain
(register-max / min-k mergeability is grain-free); persisted cube is
self-describing (kernel + params reopen from the blob alone); a
partition-dim predicate statically prunes cube files; refusals.
"""
import numpy as np
import pytest
from pyspark.sql import functions as F

from gopie_spark.kernels import HLL, Theta, sketch_from_blob
from gopie_spark.operators.cube import (build_sketch_cube,
                                        load_sketch_cube, rollup,
                                        rollup_estimates)
from gopie_spark.operators.sketch_agg import STATE_COL, sketch_agg


def _events_with_day(spark, sf_dir):
    return (spark.read.parquet(f"{sf_dir}/events.parquet")
            .withColumn("day", F.to_date("ts")))


def _states(df, keys):
    return {tuple(r[k] for k in keys) if keys else (): bytes(r[STATE_COL])
            for r in df.collect()}


@pytest.mark.parametrize("sketch", [HLL(p=12), Theta(k=256)],
                         ids=["hll", "theta"])
def test_rollup_byte_equal_to_direct_build(spark, sf_dir, sketch):
    """(event_type, day) cube rolled up to event_type / day / global is
    byte-identical to building each grain directly from the raw rows —
    the lossless-precomputation property the cube exists for."""
    ev = _events_with_day(spark, sf_dir)
    cube = build_sketch_cube(ev, ["event_type", "day"], "user_id", sketch)
    cube = cube.localCheckpoint()  # build once, roll up three ways
    for keep in (["event_type"], ["day"], []):
        got = _states(rollup(cube, keep, sketch), keep)
        want = _states(
            sketch_agg(ev.select(*keep, F.col("user_id").alias("v")),
                       keep, "v", sketch), keep)
        assert got == want, keep


def test_rollup_estimates_and_filter(spark, sf_dir):
    """Day-range rollup: filter cells, merge, estimate — matches the
    exact distinct over the same raw slice within the HLL bound."""
    hll = HLL(p=14)
    ev = _events_with_day(spark, sf_dir)
    cube = build_sketch_cube(ev, ["event_type", "day"], "user_id", hll)
    days = sorted(r["day"] for r in ev.select("day").distinct().collect())
    keep_days = days[: max(1, len(days) // 2)]
    est = {r["event_type"]: r["estimate"] for r in rollup_estimates(
        cube, ["event_type"], hll,
        where=F.col("day").isin(keep_days)).collect()}
    exact = {r["event_type"]: r["n"] for r in
             ev.filter(F.col("day").isin(keep_days))
             .groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    bound = 3 * 1.04 / np.sqrt(2 ** 14)
    assert set(est) == set(exact)
    for k, e in est.items():
        assert abs(e - exact[k]) <= max(bound * exact[k], 1.0), k


def test_persisted_cube_self_describing(spark, sf_dir, tmp_path):
    """Write with partitionBy(day); reopen WITHOUT naming the kernel —
    sketch_from_blob reconstructs Theta(k=128) from the meta blob; a
    day predicate lands in the scan's partition filters (static file
    pruning on the cube read)."""
    t = Theta(k=128)
    ev = _events_with_day(spark, sf_dir)
    path = str(tmp_path / "cube")
    build_sketch_cube(ev, ["event_type", "day"], "user_id", t,
                      path=path, partition_dim="day")
    cells, sketch2, dims = load_sketch_cube(spark, path)
    assert dims == ["event_type", "day"]
    assert type(sketch2).__name__ == "Theta" and sketch2.k == 128
    day0 = ev.agg(F.min("day")).collect()[0][0]
    pruned = rollup(cells, ["event_type"], sketch2,
                    where=F.col("day") == day0)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.index("Scan parquet"):]
    assert "PartitionFilters" in scan
    pf = [ln for ln in scan.splitlines() if "PartitionFilters" in ln][0]
    assert "day" in pf
    # and the pruned rollup equals a direct build over the same slice
    want = _states(sketch_agg(
        ev.filter(F.col("day") == day0)
        .select("event_type", F.col("user_id").alias("v")),
        ["event_type"], "v", sketch2), ["event_type"])
    assert _states(pruned, ["event_type"]) == want


def test_tdigest_cube_rollup_quantiles(spark, sf_dir):
    """Quantile sketches compose with the cube too: per-(type, day)
    t-digest cells rolled up per type answer value quantiles within the
    digest's rank tolerance vs exact — precision survives the rollup
    (centroid merge is the same op the direct build uses)."""
    from gopie_spark.kernels import TDigest
    td = TDigest()
    ev = _events_with_day(spark, sf_dir)
    cube = build_sketch_cube(ev, ["event_type", "day"], "value", td)
    rolled = {r["event_type"]: td.deserialize(bytes(r[STATE_COL]))
              for r in rollup(cube, ["event_type"], td).collect()}
    vals = {}
    for r in ev.select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    for et, st in rolled.items():
        xs = np.sort(np.array(vals[et]))
        for q in (0.1, 0.5, 0.9):
            got = td.quantile(st, [q])[0]
            # rank tolerance: where does the estimate fall in the
            # exact distribution?
            rank = np.searchsorted(xs, got) / len(xs)
            assert abs(rank - q) <= 0.05, (et, q, rank)


def test_streaming_states_equal_cube_cells(spark, sf_dir, tmp_path):
    """The cube is the batch sibling of StreamingSketch: keyed states
    maintained by micro-batch merges == cube cells from one batch
    build, byte-equal (HLL register-max)."""
    from gopie_spark.streaming import StreamingSketch
    hll = HLL(p=12)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "evstream")
    ev.repartition(3).write.parquet(src)
    df_all = spark.read.parquet(src)
    ss = StreamingSketch(spark, hll, ["event_type"], "v",
                         str(tmp_path / "st"))
    q = ss.attach(spark.readStream.schema(df_all.schema).parquet(src)
                  .select("event_type",
                          F.col("user_id").cast("string").alias("v")))
    q.awaitTermination(120)
    stream_states = {r["event_type"]: bytes(r[STATE_COL])
                     for r in ss.current_states().collect()}
    cube = build_sketch_cube(
        ev.select("event_type",
                  F.col("user_id").cast("string").alias("uid")),
        ["event_type"], "uid", hll)
    cube_states = _states(cube, ["event_type"])
    assert stream_states == {k[0]: v for k, v in cube_states.items()}


def test_incremental_cube_merge_equals_full_build(spark, sf_dir):
    """cube(first half) ⊎ cube(second half) == cube(everything),
    byte-equal — the daily-crawl increment never rescans history."""
    from gopie_spark.operators.cube import merge_cubes
    hll = HLL(p=12)
    ev = _events_with_day(spark, sf_dir)
    dims = ["event_type", "day"]
    old = ev.filter(F.col("event_id") % 2 == 0)
    new = ev.filter(F.col("event_id") % 2 == 1)
    merged = merge_cubes(
        build_sketch_cube(old, dims, "user_id", hll),
        build_sketch_cube(new, dims, "user_id", hll), dims, hll)
    full = build_sketch_cube(ev, dims, "user_id", hll)
    assert _states(merged, dims) == _states(full, dims)


def test_cube_refusals(spark, sf_dir):
    ev = _events_with_day(spark, sf_dir)
    hll = HLL(p=12)
    with pytest.raises(ValueError):
        build_sketch_cube(ev, ["event_type"], "user_id", hll,
                          path=None, partition_dim="day")
    cube = build_sketch_cube(ev, ["event_type"], "user_id", hll)
    with pytest.raises(ValueError):
        rollup(cube, ["nope"], hll)


def test_sketch_cube_job_incremental(spark, sf_dir, tmp_path):
    """jobs/sketch_cube.py: base build + incremental --merge-into run
    over the other half == one full build, byte-equal; kernel-mismatch
    merge refused."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "jobs"))
    from sketch_cube import parse_sketch, run_cube

    hll = parse_sketch("hll:p=12")
    ev = _events_with_day(spark, sf_dir)
    dims = ["event_type", "day"]
    base, inc, full = (str(tmp_path / n) for n in ("base", "inc", "full"))
    r1 = run_cube(spark, ev.filter(F.col("event_id") % 2 == 0), dims,
                  "user_id", hll, base, partition_dim="day")
    r2 = run_cube(spark, ev.filter(F.col("event_id") % 2 == 1), dims,
                  "user_id", hll, inc, partition_dim="day",
                  merge_into=base)
    assert r2["incremental"] and r1["cells"] > 0
    run_cube(spark, ev, dims, "user_id", hll, full, partition_dim="day")
    inc_cells, k1, d1 = load_sketch_cube(spark, inc)
    full_cells, k2, d2 = load_sketch_cube(spark, full)
    assert d1 == d2 == dims and k1.p == k2.p == 12
    assert _states(inc_cells, dims) == _states(full_cells, dims)
    with pytest.raises(SystemExit):
        run_cube(spark, ev, dims, "user_id", parse_sketch("theta:k=64"),
                 str(tmp_path / "bad"), merge_into=base)
    # query mode: merge-only rollup over the persisted full cube, with
    # a cell predicate; estimates == exact (150 users/type < 2^12 HLL
    # small-range regime is NOT exact, so compare within the bound)
    from sketch_cube import run_rollup
    rows = run_rollup(spark, full, ["event_type"])
    exact = {r["event_type"]: r["n"] for r in
             ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert {r["event_type"] for r in rows} == set(exact)
    for r in rows:
        ex = exact[r["event_type"]]
        assert abs(r["estimate"] - ex) <= max(3 * 1.04 /
                                              np.sqrt(2 ** 12) * ex, 2.0)
    with pytest.raises(SystemExit):
        run_rollup(spark, full, ["nope"])


def test_cube_checkpointed_build_resumes_byte_equal(spark, tmp_path):
    """Kill-after-partial-stage resume: a checkpointed cube build
    interrupted after some buckets, then resumed by a fresh job
    invocation, finalizes cells BYTE-identical to an uninterrupted
    direct build (merge associativity + file-bucket lineage)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "jobs"))
    from sketch_cube import run_cube_checkpointed

    from gopie_spark.plans.checkpoint import SketchCheckpoint
    from gopie_spark.sources.pages import generate_pages

    src = str(tmp_path / "pages")
    generate_pages(src, 3000, n_files=6, seed=9)
    hll = HLL(p=12)
    dims = ["lang", "day"]

    def transform(d):
        return d.withColumn("day", F.to_date("warc_ts"))

    # simulate the kill: process only 2 buckets, then abandon
    ck = str(tmp_path / "ckpt")
    partial = SketchCheckpoint(ck, hll, dims, "url", transform=transform)
    assert partial.run_partials(spark, src, max_buckets=2) == 2

    # fresh invocation with the same checkpoint resumes and finalizes
    out = str(tmp_path / "cube")
    rep = run_cube_checkpointed(spark, src, dims, "url", hll, out, ck,
                                transform=transform,
                                partition_dim="day")
    assert rep["checkpointed"] and rep["runs"] >= 2

    cells, kern, d2 = load_sketch_cube(spark, out)
    assert d2 == dims and kern.p == 12
    direct = build_sketch_cube(
        transform(spark.read.parquet(src)), dims, "url", hll)
    assert _states(cells, dims) == _states(direct, dims)


def test_sketch_from_blob_dispatch():
    """Every kernel's state blob reopens as the right kernel with the
    right parameters."""
    from gopie_spark.kernels import (AMS, CMS, KLL, BloomBit,
                                     BloomCounting, MinHash, MisraGries,
                                     SimHash, TDigest)
    kernels = [HLL(p=11), CMS(width=101, depth=4), BloomBit(m=1 << 10, k=3),
               BloomCounting(m=1 << 10, k=3), TDigest(), KLL(),
               MinHash(k=32), SimHash(), MisraGries(k=10),
               AMS(n_means=16, n_medians=3), Theta(k=64)]
    for kern in kernels:
        blob = kern.serialize(kern.zero())
        back = sketch_from_blob(blob)
        assert type(back) is type(kern), kern
        # parameterized kernels must round-trip their params
        for attr in ("p", "k", "width", "depth", "n_means"):
            if hasattr(kern, attr):
                assert getattr(back, attr) == getattr(kern, attr), \
                    (kern, attr)
    with pytest.raises(ValueError):
        sketch_from_blob(b"\x00junk")


def test_local_rollup_zero_spark_byte_equal(spark, sf_dir, tmp_path):
    """The serving path: local_rollup (pyarrow + NumPy, no Spark) must
    reproduce the Spark rollup BYTE-equal — global, per-dim, and with a
    partition-dim filter (file-level pruning on the hive layout)."""
    from gopie_spark.operators.cube import local_rollup

    hll = HLL(p=11)
    ev = _events_with_day(spark, sf_dir)
    path = str(tmp_path / "cube")
    build_sketch_cube(ev, ["event_type", "day"], "user_id", hll,
                      path=path, partition_dim="day")
    cells, kern, _dims = load_sketch_cube(spark, path)

    # global
    want = _states(rollup(cells, [], kern), [])
    lk, got = local_rollup(path, [])
    assert type(lk).__name__ == "HLL" and lk.p == 11
    assert {(): lk.serialize(got[()])} == want

    # per event_type
    want = _states(rollup(cells, ["event_type"], kern), ["event_type"])
    _, got = local_rollup(path, ["event_type"])
    assert {k: lk.serialize(v) for k, v in got.items()} == want

    # day-filtered (partition pruning in the pyarrow read)
    day0 = ev.agg(F.min("day")).collect()[0][0]
    want = _states(rollup(cells, ["event_type"], kern,
                          where=F.col("day") == day0), ["event_type"])
    _, got = local_rollup(path, ["event_type"],
                          filters=[("day", "=", str(day0))])
    assert {(str(k[0]),): lk.serialize(v) for k, v in got.items()} \
        == {(str(k[0]),): v for k, v in want.items()}

    with pytest.raises(ValueError, match="keep_dims"):
        local_rollup(path, ["nope"])


def test_sketch_cube_local_rollup_cli(spark, sf_dir, tmp_path):
    """--rollup --local serves the same estimates as the Spark rollup
    path, without creating a SparkSession (spark-submit not needed to
    QUERY a cube)."""
    import json as _json
    import subprocess
    import sys as _sys

    hll = HLL(p=11)
    ev = _events_with_day(spark, sf_dir)
    path = str(tmp_path / "cube")
    build_sketch_cube(ev, ["event_type", "day"], "user_id", hll,
                      path=path, partition_dim="day")
    day0 = str(ev.agg(F.min("day")).collect()[0][0])

    def cli(*extra):
        r = subprocess.run(
            [_sys.executable, "jobs/sketch_cube.py", "--cube", path,
             "--rollup", "event_type", *extra],
            capture_output=True, text=True, cwd="/root/repo", timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        return _json.loads(r.stdout.strip().splitlines()[-1])

    spark_rows = {c["event_type"]: c["estimate"]
                  for c in cli()["cells"]}
    local = cli("--local")
    assert local["local"] is True
    local_rows = {c["event_type"]: c["estimate"]
                  for c in local["cells"]}
    assert local_rows == spark_rows

    filt = cli("--local", "--where", f"day = '{day0}'")
    cells, kern, _ = load_sketch_cube(spark, path)
    want = {r["event_type"]: float(kern.count(
        kern.deserialize(bytes(r[STATE_COL])))) for r in
        rollup(cells, ["event_type"], kern,
               where=F.col("day") == day0).collect()}
    got = {c["event_type"]: c["estimate"] for c in filt["cells"]}
    assert got == want


def test_sketch_cube_local_rollup_int_partition_dim(spark, sf_dir,
                                                    tmp_path):
    """--local --where must coerce the predicate value to the dim's
    hive-inferred type (int partition dirs like hour=13)."""
    import json as _json
    import subprocess
    import sys as _sys

    hll = HLL(p=11)
    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .withColumn("hour", F.hour("ts")))
    path = str(tmp_path / "cube")
    build_sketch_cube(ev, ["event_type", "hour"], "user_id", hll,
                      path=path, partition_dim="hour")
    h0 = int(ev.agg(F.min("hour")).collect()[0][0])
    r = subprocess.run(
        [_sys.executable, "jobs/sketch_cube.py", "--cube", path,
         "--rollup", "event_type", "--local",
         "--where", f"hour = {h0}"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    got = {c["event_type"]: c["estimate"] for c in
           _json.loads(r.stdout.strip().splitlines()[-1])["cells"]}
    cells, kern, _ = load_sketch_cube(spark, path)
    want = {r2["event_type"]: float(kern.count(
        kern.deserialize(bytes(r2[STATE_COL])))) for r2 in
        rollup(cells, ["event_type"], kern,
               where=F.col("hour") == h0).collect()}
    assert got == want


def test_register_cube_view_sql_rollup(spark, sf_dir, tmp_path):
    """A persisted cube queried through plain SQL (register_cube_view +
    gopie_sketch_merge) gives states byte-equal to the operator rollup,
    and a partition-dim predicate prunes the scan to the matching
    hive partitions."""
    from gopie_spark.operators.cube import register_cube_view
    hll = HLL(p=12)
    ev = _events_with_day(spark, sf_dir)
    path = str(tmp_path / "cube")
    build_sketch_cube(ev, ["event_type", "day"], "user_id", hll,
                      path=path, partition_dim="day")
    sketch, dims = register_cube_view(spark, path, "cube_v")
    assert dims == ["event_type", "day"]
    assert type(sketch).__name__ == "HLL"

    got = {r["event_type"]: bytes(r["state"]) for r in spark.sql(
        "SELECT event_type, gopie_sketch_merge(sketch_state) AS state "
        "FROM cube_v GROUP BY event_type").collect()}
    cells, k, _ = load_sketch_cube(spark, path)
    want = _states(rollup(cells, ["event_type"], k), ["event_type"])
    assert got == {k2[0]: v for k2, v in want.items()}

    # range rollup with estimate, vs exact over the same slice
    days = sorted(r["day"] for r in ev.select("day").distinct().collect())
    cut = days[len(days) // 2]
    est = spark.sql(
        "SELECT gopie_hll_estimate(gopie_sketch_merge(sketch_state)) AS n"
        f" FROM cube_v WHERE day >= '{cut}'").collect()[0]["n"]
    exact = (ev.where(F.col("day") >= F.lit(cut))
             .agg(F.countDistinct("user_id")).collect()[0][0])
    assert abs(est - exact) <= 4 * 1.04 / (2 ** 6) * exact + 5

    # the partition-dim predicate reaches the scan as partition filters
    plan = spark.sql(
        f"SELECT sketch_state FROM cube_v WHERE day >= '{cut}'"
    )._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "day" in plan.split(
        "PartitionFilters:")[1][:200]
