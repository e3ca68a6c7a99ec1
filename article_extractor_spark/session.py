"""SparkSession factory with scale-oriented defaults.

One place to encode the engine's Spark configuration so tests, bench,
the spark-submit job, and the driver entry all run the same plan:

- AQE on (runtime shuffle coalescing + skew-join splitting),
- Arrow execution on with a small ``maxRecordsPerBatch`` — each corpus
  row carries a whole document, so giant-doc rows must not blow the
  Python worker's batch memory (SURVEY.md §4 item 1),
- shuffle partitions sized to the local core count (on a real cluster
  AQE coalesces; locally this avoids 200-partition overhead).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Rows per Arrow batch entering mapInPandas.  Documents average tens of
# KB (golden corpus raw.html up to ~400 KB); 256 rows ≈ tens of MB per
# batch, safely inside executor-python memory even with skewed docs.
ARROW_BATCH_ROWS = 256


def build_session(
    app_name: str = "article-extractor-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (
            os.cpu_count() or 8
        )
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_BATCH_ROWS),
        )
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("AES_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
