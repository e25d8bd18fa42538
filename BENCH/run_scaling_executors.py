#!/usr/bin/env python
"""Multi-EXECUTOR scaling evidence: N vs 4N real executor JVMs.

The north rule asks for throughput scaling efficiency >= 0.8 from N to
4N *executors*, run via ``spark-submit --py-files``.  The CPU-pinned
``run_scaling.py`` proxy scales cores inside ONE JVM; this harness
scales the thing the rule names: it launches the same sketch-suite job
(``BENCH/scaling_job.py``) through ``spark-submit --py-files
gopie_spark.zip`` against Spark's standalone ``local-cluster[N,c,mem]``
master, which forks N REAL executor JVMs (separate heaps, separate
Python worker pools, shuffle over the block-transfer service — the
full multi-executor execution path, minus only the physical network).

Levels: 1 executor x 2 cores vs 4 executors x 2 cores (the 2 -> 8
total-core pair sits inside this VM's measured linear memory-bandwidth
region — see run_scaling.py's methodology notes; the >16-vCPU collapse
is a virtualization artifact that would otherwise contaminate a
4x8-core level).  Each level is CPU-pinned to (2*N + 2) vCPUs: 2 per
executor plus a constant 2-core driver allowance, matching a real
cluster where the driver does not grow with the fleet.

Fastest of SPARK_GRAFT_SCALING_RUNS (default 2) attempts per level;
every attempt printed.  Writes BENCH/scaling_executors_summary.json and
BENCH/BASELINE_EXECUTORS.md.
"""

import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAGES_DIR = os.environ.get("SPARK_GRAFT_PAGES_DIR", "/tmp/gopie_pages_4m")
N_ROWS = int(os.environ.get("SPARK_GRAFT_PAGES_ROWS", "4000000"))
RUNS_PER_LEVEL = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "2"))
CORES_PER_EXEC = 2
EXEC_MEM_MB = 4096
LEVELS = (1, 4)
ZIP_PATH = "/tmp/gopie_spark.zip"


def ensure_pages() -> None:
    sys.path.insert(0, REPO)
    from gopie_spark.sources.pages import generate_pages
    print(f"# ensuring pages table ({N_ROWS} rows) at {PAGES_DIR}",
          file=sys.stderr)
    generate_pages(PAGES_DIR, N_ROWS, n_files=64, seed=42)


def build_zip() -> None:
    """Package gopie_spark for --py-files (the north-rule deploy unit)."""
    pkg = os.path.join(REPO, "gopie_spark")
    with zipfile.ZipFile(ZIP_PATH, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    print(f"# packaged {ZIP_PATH}", file=sys.stderr)


def run_level(n_exec: int) -> dict:
    total_cores = n_exec * CORES_PER_EXEC
    cpus = total_cores + 2  # constant driver allowance
    master = f"local-cluster[{n_exec},{CORES_PER_EXEC},{EXEC_MEM_MB}]"
    env = dict(os.environ,
               SPARK_GRAFT_MASTER=master,
               SPARK_EXECUTOR_MEMORY=f"{EXEC_MEM_MB - 512}m",
               SPARK_DRIVER_MEMORY="6g")
    best = None
    for attempt in range(RUNS_PER_LEVEL):
        cmd = ["taskset", "-c", f"0-{cpus - 1}", "spark-submit",
               "--master", master, "--py-files", ZIP_PATH,
               os.path.join(REPO, "BENCH", "scaling_job.py"),
               str(total_cores), PAGES_DIR]
        out = subprocess.run(cmd, capture_output=True, text=True,
                             cwd=REPO, env=env, check=True)
        res = json.loads(out.stdout.strip().splitlines()[-1])
        print(f"# {master} attempt {attempt + 1}/{RUNS_PER_LEVEL}: "
              f"steady {res['seconds']}s ({res['docs_per_sec']} docs/s), "
              f"cold {res['cold_seconds']}s", file=sys.stderr)
        if best is None or res["seconds"] < best["seconds"]:
            best = res
    best["n_executors"] = n_exec
    return best


def main() -> None:
    ensure_pages()
    build_zip()
    results = {n: run_level(n) for n in LEVELS}
    r1, r4 = results[1], results[4]
    eff = (r4["docs_per_sec"] / r1["docs_per_sec"]) / (LEVELS[1] / LEVELS[0])
    summary = {
        "mode": "local-cluster multi-executor (spark-submit --py-files)",
        "pages_rows": r1["rows"],
        "cores_per_executor": CORES_PER_EXEC,
        "levels": {str(n): {"executors": n,
                            "sec": results[n]["seconds"],
                            "docs_per_sec": results[n]["docs_per_sec"],
                            "timings": results[n]["timings"]}
                   for n in LEVELS},
        "scaling_efficiency_1_to_4_executors": round(eff, 3),
        "gate": ">= 0.8 (N -> 4N executors)",
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary))
    with open(os.path.join(REPO, "BENCH",
                           "scaling_executors_summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)

    def row(n):
        r = results[n]
        t = r["timings"]
        return (f"| {n} x {CORES_PER_EXEC} cores | {r['seconds']} | "
                f"{r['docs_per_sec']:,} | {t['hll_per_lang_url']} | "
                f"{t['cms_tokens']} | {t['kll_token_counts']} | "
                f"{t['bloom_urls_sharded']} |")

    md = f"""# BENCH/BASELINE_EXECUTORS — N -> 4N EXECUTOR scaling

Same job, same input, two REAL executor counts: ``spark-submit
--py-files gopie_spark.zip`` against ``local-cluster[N,2,{EXEC_MEM_MB}]``
(Spark's standalone multi-executor test master: N separate executor
JVMs with their own heaps and Python worker pools, shuffle over the
block-transfer service).  This is the north rule's own deployment mode
— the CPU-pinned core proxy in BASELINE.md remains as the
fine-grained 3-level series.  Workload identical to BASELINE.md
(sketch suite over the {r1['rows']:,}-row pages table); steady-state
pass, fastest of {RUNS_PER_LEVEL} attempts, each level pinned to
2N + 2 vCPUs (constant 2-core driver allowance).

| executors | wall (s) | docs/sec | hll (s) | cms (s) | kll (s) | bloom (s) |
|---|---|---|---|---|---|---|
{row(1)}
{row(4)}

**Scaling efficiency 1 -> 4 executors: {eff:.3f}** — gate >= 0.8:
{"PASS" if eff >= 0.8 else "FAIL"}
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE_EXECUTORS.md"),
              "w") as fh:
        fh.write(md)
    print("# wrote BENCH/BASELINE_EXECUTORS.md", file=sys.stderr)


if __name__ == "__main__":
    main()
