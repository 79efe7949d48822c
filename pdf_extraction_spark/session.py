"""SparkSession factory with scale-oriented defaults.

Designed for a multi-executor cluster (the settings below are the ones that
matter at 100 TB: AQE with skew-join handling, Arrow batching for the one
grouped-map UDF, partition sizing); tests/bench run the same config on
``local[k]``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pdf-extraction-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        # one shuffle partition per core locally; on a real cluster this is
        # left to AQE coalescing from a higher initial number
        shuffle_partitions = max(cores, 8)

    # one Spark task == one core: pyarrow/numpy must not each spin up a
    # machine-wide thread pool inside every python worker (n_workers *
    # n_cpus threads thrash badly at local[32])
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    os.environ.setdefault("ARROW_IO_THREADS", "2")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
