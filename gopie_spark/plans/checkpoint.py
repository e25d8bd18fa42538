"""Checkpoint/resume for sketch builds with per-bucket lineage + metrics.

North-rule requirement (BASELINE.json): "resumable from checkpoint with
per-partition lineage + metrics".  Design (SURVEY.md §4.2.4, §7 hard
part 6):

- **Stable work units.** Input files are assigned to ``n_buckets`` work
  buckets by jump consistent hash of the file *path*
  (functions/jumphash.py — the reference's jumphash capability,
  pkg/jumphash/jumphash.go:16-29).  Bucket identity depends only on the
  input listing — never on executor count or Spark partition ids — so a
  resume on a different cluster size processes exactly the missing work.
- **Stage A (resumable).** For each *pending* bucket, partial sketch
  states per (bucket, key) are built with the two-level aggregation and
  written to ``<dir>/partials/run=<id>/`` as parquet.  A run id is
  appended to ``<dir>/MANIFEST`` only after the Spark job commits, so a
  crash mid-run leaves the manifest unchanged and the whole run is
  re-done (bucket-exclusive => no double counting).
- **Lineage + metrics.** Each run writes ``lineage/run=<id>.json``
  (bucket -> files, row counts) and appends ``metrics.jsonl``
  (run id, buckets, rows, seconds, state bytes).
- **Finalize.** Reads every manifested partial, merges per key (bucket
  column dropped) — pure kernel merges, so an interrupted+resumed build
  is byte-identical to an uninterrupted one (asserted in tests).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType

from gopie_spark.functions.jumphash import jump_hash_str
from gopie_spark.operators.sketch_agg import (STATE_COL, build_partials,
                                              merge_partials)


class SketchCheckpoint:
    def __init__(self, checkpoint_dir: str, sketch,
                 keys: Sequence[str], value_col: str,
                 n_buckets: int = 64, transform=None):
        self.dir = checkpoint_dir
        self.sketch = sketch
        self.keys = list(keys)
        self.value_col = value_col
        self.n_buckets = n_buckets
        # optional DataFrame -> DataFrame hook applied after the raw
        # read (derive key columns, e.g. day from a timestamp); runs
        # before bucketing so resume identity stays file-based
        self.transform = transform
        os.makedirs(os.path.join(self.dir, "partials"), exist_ok=True)
        os.makedirs(os.path.join(self.dir, "lineage"), exist_ok=True)

    # -- manifest -----------------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.dir, "MANIFEST")

    def _manifested_runs(self) -> List[str]:
        if not os.path.exists(self._manifest_path):
            return []
        with open(self._manifest_path) as fh:
            return [ln.strip() for ln in fh if ln.strip()]

    def _commit_run(self, run_id: str) -> None:
        with open(self._manifest_path, "a") as fh:
            fh.write(run_id + "\n")

    # -- bucket planning -----------------------------------------------------
    def bucket_of_files(self, files: Sequence[str]) -> Dict[str, int]:
        buckets = jump_hash_str([os.path.basename(f) for f in files],
                                self.n_buckets)
        return {f: int(b) for f, b in zip(files, buckets)}

    def done_buckets(self, spark: SparkSession) -> set:
        done = set()
        for run_id in self._manifested_runs():
            lineage = os.path.join(self.dir, "lineage", f"run={run_id}.json")
            with open(lineage) as fh:
                done.update(int(b) for b in json.load(fh)["buckets"])
        return done

    def _manifested_files(self) -> set:
        files = set()
        for run_id in self._manifested_runs():
            lineage = os.path.join(self.dir, "lineage", f"run={run_id}.json")
            with open(lineage) as fh:
                files.update(json.load(fh)["files"])
        return files

    def _validate_input(self, files: Sequence[str],
                        fb: Dict[str, int], done: set) -> None:
        """Refuse to resume over an input that changed under the
        checkpoint.  Bucket identity is file-name based, so a rewritten
        input directory (new part-file names) would land new files on
        'done' bucket ids — their rows silently skipped — while the
        committed partials still carry the old files' rows (double
        count at finalize).  Both directions are detected from the
        lineage records and refused with the remedy."""
        if not done:
            return
        seen = self._manifested_files()
        gone = seen - set(files)
        skipped = [f for f, b in fb.items() if b in done and f not in seen]
        if gone or skipped:
            raise ValueError(
                f"checkpoint {self.dir} was built over a different input "
                f"listing ({len(gone)} manifested file(s) no longer "
                f"present, {len(skipped)} new file(s) hashing to already-"
                "done buckets); resuming would double-count/skip rows — "
                "use a fresh --checkpoint dir (or delete this one) after "
                "rewriting the input")

    # -- stage A --------------------------------------------------------------
    def run_partials(self, spark: SparkSession, input_dir: str,
                     max_buckets: Optional[int] = None,
                     fmt: str = "parquet") -> int:
        """Build + persist partial states for pending buckets.  Returns the
        number of buckets processed (0 = nothing pending).  ``max_buckets``
        lets tests simulate an interrupted run.

        ``fmt='iceberg'`` plans buckets from the table's ``.files``
        metadata table instead of a filesystem glob (``input_dir`` is then
        a catalog table name); data files are still read as parquet, which
        sources/catalog.py verifies is sound (append-only snapshot)."""
        from gopie_spark.sources.catalog import list_data_files
        files = list_data_files(spark, input_dir, fmt)
        if not files:
            raise ValueError(f"no data files under {input_dir}")
        fb = self.bucket_of_files(files)
        done = self.done_buckets(spark)
        self._validate_input(files, fb, done)
        pending = sorted({b for b in fb.values() if b not in done})
        if max_buckets is not None:
            pending = pending[:max_buckets]
        if not pending:
            return 0
        pend_files = [f for f, b in fb.items() if b in set(pending)]

        run_id = uuid.uuid4().hex[:12]
        t0 = time.perf_counter()
        df = spark.read.parquet(*pend_files)
        if self.transform is not None:
            df = self.transform(df)
        base_names = {os.path.basename(f): b for f, b in fb.items()}

        @F.pandas_udf(LongType())
        def to_bucket(fnames: pd.Series) -> pd.Series:
            return fnames.map(
                lambda p: base_names[os.path.basename(p)]).astype("int64")

        df = df.withColumn("_bucket", to_bucket(F.input_file_name()))
        n_rows = df.count()

        partials = build_partials(df, ["_bucket"] + self.keys,
                                  self.value_col, self.sketch)
        merged = merge_partials(partials, ["_bucket"] + self.keys, self.sketch)
        out_dir = os.path.join(self.dir, "partials", f"run={run_id}")
        merged.write.mode("overwrite").parquet(out_dir)
        dt = time.perf_counter() - t0

        lineage = {
            "run_id": run_id,
            "buckets": pending,
            "files": {f: fb[f] for f in pend_files},
            "rows": n_rows,
            "seconds": round(dt, 3),
        }
        with open(os.path.join(self.dir, "lineage", f"run={run_id}.json"),
                  "w") as fh:
            json.dump(lineage, fh, indent=1)
        with open(os.path.join(self.dir, "metrics.jsonl"), "a") as fh:
            fh.write(json.dumps({
                "run_id": run_id, "n_buckets": len(pending),
                "rows": n_rows, "seconds": round(dt, 3),
            }) + "\n")
        self._commit_run(run_id)
        return len(pending)

    def run_until_complete(self, spark: SparkSession, input_dir: str,
                           fmt: str = "parquet") -> None:
        while self.run_partials(spark, input_dir, fmt=fmt) > 0:
            pass

    # -- finalize --------------------------------------------------------------
    def finalize(self, spark: SparkSession, salt: int = 0) -> DataFrame:
        """Merge all manifested partials per key: DataFrame[keys..., state].

        ``salt`` bounds a hot key's merge fan-in (partials from every
        bucket land on one task otherwise); associativity guarantees the
        salted result is identical."""
        runs = self._manifested_runs()
        if not runs:
            raise ValueError("no committed runs to finalize")
        paths = [os.path.join(self.dir, "partials", f"run={r}") for r in runs]
        partials = spark.read.parquet(*paths).drop("_bucket")
        return merge_partials(partials, self.keys, self.sketch, salt=salt)
