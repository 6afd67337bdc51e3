"""SparkSession factory with the engine's tuned configuration.

Settings chosen for the 100 TB posture (values are local-mode defaults; on a
real cluster shuffle partitions and maxPartitionBytes scale with executors):

* AQE on (runtime coalesce + skew-join splitting),
* Arrow transport on for the pandas/mapInPandas kernels, with a bounded
  records-per-batch so a batch of pixel rows stays well under Python worker
  memory (one media row ≈ 64·width bytes — SURVEY.md §7 R4),
* UTC session timezone so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "granulate-char-ocr-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus if cpus != "*" else 32)
    return (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # runtime row-level join pruning: build a Bloom filter on the small
        # side and push it into the big side's scan — at 100 TB this skips
        # most of a fact scan when the dim filter is selective
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # pixel rows are ~60 KB each; 256/batch keeps an Arrow batch ≈ 15 MB
        # so 32 concurrent Python workers stay far from memory pressure
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.session.timeZone", "UTC")
        # local mode: the driver JVM is also the executor; size the heap for
        # 16-32 concurrent pixel-bearing Arrow batches (box has 128 GiB)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        # static conf: needed for bucketed saveAsTable in local/test runs;
        # real deployments override via spark-submit
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/gcos_spark_warehouse"),
        )
        .getOrCreate()
    )
