"""SparkSession builder with the engine's tuned defaults.

Defaults are chosen for the sketch workload profile: Arrow transfer on,
AQE on (partition coalescing + skew split for the exact-side queries),
modest shuffle partitioning (the sketch shuffles carry blobs, not rows).
All knobs overridable via ``extra``.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

from pyspark.sql import SparkSession


def get_spark(app_name: str = "gopie_spark",
              cores: Optional[int] = None,
              shuffle_partitions: Optional[int] = None,
              extra: Optional[Dict[str, str]] = None,
              master: Optional[str] = None) -> SparkSession:
    # explicit master (arg or SPARK_GRAFT_MASTER) wins — lets the same
    # job scripts run under spark-submit against a real cluster /
    # local-cluster[N,c,mem] multi-executor harness instead of the
    # in-process local[cores] default (BENCH/run_scaling_executors.py)
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER")
    if master is None:
        if cores is None:
            env = os.environ.get("SPARK_GRAFT_CPUS")
            master = f"local[{env}]" if env else "local[*]"
        else:
            master = f"local[{cores}]"
    builder = (
        SparkSession.builder.master(master).appName(app_name)
        .config("spark.sql.shuffle.partitions",
                str(shuffle_partitions or 32))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 16k rows/batch: on wide text columns the JVM->Python Arrow pipe
        # pipelines far better than the 64k default (measured 1.5x on the
        # 4M-row pages scan); still plenty for vectorized kernels
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # pre-size the heap: incremental heap growth under the first big
        # Arrow transfer costs tens of seconds of full GCs (measured 2x
        # on the 1M-row pages scan)
        .config("spark.driver.extraJavaOptions",
                "-Xms" + os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    # only meaningful off local[*] (separate executor JVMs); harmless
    # otherwise — lets the multi-executor harness size its workers
    if os.environ.get("SPARK_EXECUTOR_MEMORY"):
        builder = builder.config("spark.executor.memory",
                                 os.environ["SPARK_EXECUTOR_MEMORY"])
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
