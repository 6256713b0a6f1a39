"""SparkSession factory tuned for this engine.

Used by ``bench.py``, the tests, and any standalone run.  The driver may
hand us its own session instead — query functions only rely on *runtime*
confs which ``catalog._prepare`` (re)sets per call.

Scale posture (100 TB / 1000-executor design, tested on local[N]):
- AQE on: runtime join-strategy switches, skew-join splitting, shuffle
  partition coalescing — the knobs that keep a static plan from falling
  over at 1000x data.
- Shuffle partitions sized for the local test harness; on a real cluster
  AQE's coalescing makes the initial number a ceiling, not a fixed cost.
- Arrow enabled so every pandas-UDF operator pays batch (not row) transfer.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "satellite-data-ingestion-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
