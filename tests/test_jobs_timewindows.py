"""jobs/build_sketches.py --time-windows as a black box: the production
job also persists the query-time-window states (sliding-HLL distinct
urls, windowed-CMS token frequencies), byte-equal to direct builds."""
import json
import os
import subprocess
import sys


def test_build_sketches_time_windows(spark, tmp_path):
    from gopie_spark.kernels import SlidingHLL, WindowCMS
    from gopie_spark.operators import (sliding_hll_build,
                                       window_cms_tokens_build)
    from gopie_spark.sources.pages import generate_pages

    src = str(tmp_path / "pages")
    generate_pages(src, 800, n_files=3, seed=17)
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    env = dict(os.environ, SPARK_GRAFT_CPUS="8", PYTHONPATH="/root/repo")

    r = subprocess.run(
        [sys.executable, "jobs/build_sketches.py", "--input", src,
         "--checkpoint", ckpt, "--output", out, "--hll-p", "11",
         "--n-buckets", "8", "--time-windows",
         "--window-resolution", "21600", "--window-horizon", "64"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=500)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert "sliding_hll_url.bin" in rep["outputs"]
    assert "window_cms_tokens.bin" in rep["outputs"]

    pages = spark.read.parquet(src)
    with open(f"{out}/sliding_hll_url.bin", "rb") as fh:
        blob = fh.read()
    sh = SlidingHLL.from_blob(blob)
    assert sh.p == 11
    _, direct = sliding_hll_build(pages, "url", "warc_ts", p=11)
    assert blob == sh.serialize(direct)

    with open(f"{out}/window_cms_tokens.bin", "rb") as fh:
        blob = fh.read()
    wc = WindowCMS.from_blob(blob)
    assert (wc.resolution, wc.n_ticks) == (21600.0, 64)
    _, direct = window_cms_tokens_build(
        pages, text_col="text", ts_col="warc_ts",
        resolution=21600.0, n_ticks=64)
    assert blob == wc.serialize(direct)
