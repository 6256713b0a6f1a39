"""Partitioned file sink (SURVEY.md §2.1, `sink_partitioned`).

The reference writes per-layer/per-band/per-date GeoTIFFs into a layer-
partitioned directory tree, creating directories on demand
(``sources/meteosat.py:159,174-185``).  The Spark form is
``write.partitionBy(...).parquet`` — directory layout and atomic task
commit come from the FileOutputCommitter, the analog of the reference's
temp-file + rename discipline (``utils/fs.py:21-48``).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


def write_partitioned(df: DataFrame, out_dir: str, partition_cols: list[str]) -> None:
    """Partitioned parquet write, overwrite mode (idempotent re-runs —
    the batch analog of the reference's replace-on-success state commit)."""
    df.write.partitionBy(*partition_cols).mode("overwrite").parquet(out_dir)


@register(
    "sink_partitioned",
    oracle="""
SELECT l_returnflag, l_linestatus,
       count(*)                 AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through a partitioned sink: write lineitem partitioned
    by (returnflag, linestatus), read the tree back, aggregate per
    partition.  Matching the oracle (computed on the ORIGINAL table)
    proves the sink is lossless, the partition columns survive the
    directory encoding, and partition pruning stays available for readers.
    """
    li = table(spark, sf_dir, "lineitem")
    out = os.path.join(
        tempfile.gettempdir(), f"sdis_sink_partitioned_{os.getpid()}"
    )
    try:
        write_partitioned(li, out, ["l_returnflag", "l_linestatus"])
        back = spark.read.parquet(out)
        result = (
            back.groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            )
        )
        # Materialize before the temp dir vanishes.
        result = spark.createDataFrame(result.collect(), result.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return result


@register(
    "sink_upsert_partition",
    oracle="""
SELECT l_returnflag, count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def sink_upsert_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-level upsert via dynamic partition overwrite — the
    idempotent re-ingest pattern: reprocessing one slot replaces exactly
    that slot's partition, leaving the rest untouched (the reference's
    one-slot-per-run re-run contract, sources/meteosat.py:88-93,187-188).

    Sequence under test: (1) write all partitions, with the 'R' partition
    deliberately CORRUPTED (rows doubled); (2) re-write ONLY the correct
    'R' slice with partitionOverwriteMode=dynamic — static mode would
    wipe the other partitions; a doubled append would inflate counts.
    The read-back matching the clean oracle proves surgical replacement.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity"
    )
    out = os.path.join(
        tempfile.gettempdir(), f"sdis_sink_upsert_{os.getpid()}"
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        corrupted = li.union(li.filter(F.col("l_returnflag") == "R"))
        corrupted.write.partitionBy("l_returnflag").mode("overwrite").parquet(out)

        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        li.filter(F.col("l_returnflag") == "R").write.partitionBy(
            "l_returnflag"
        ).mode("overwrite").parquet(out)

        back = spark.read.parquet(out)
        result = back.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        result = spark.createDataFrame(result.collect(), result.schema)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        shutil.rmtree(out, ignore_errors=True)
    return result


@register(
    "sink_compact",
    oracle="""
SELECT CAST(4 AS INT) AS n_files,
       count(*) AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
""",
)
def sink_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the table-maintenance op every streaming
    or per-slot ingest eventually needs (the reference writes one file
    per band per tick forever, ``sources/meteosat.py:174-185``; at 100 TB
    that's millions of KB-sized files whose per-file open/footer cost
    dominates scans).

    Sequence under test: (1) scatter lineitem into 50 deliberately tiny
    files; (2) compact by rewriting to 4 right-sized files (repartition →
    overwrite of a SEPARATE dir + atomic swap is the production shape;
    here the rewrite lands in a fresh dir read back directly).  The
    census matching the oracle proves the rewrite is lossless, and the
    file count is pinned IN the result row so a silent no-op compaction
    hash-mismatches.

    LOCAL-MODE assumption (like ``scan_merge_schema``): the scratch dirs
    live under the driver's ``tempfile.gettempdir()`` and the file count
    comes from driver-side ``os.listdir`` — valid only when driver and
    executors share a filesystem (local[N], as here).  Distributed, the
    output root must be a shared/staging location (object store, HDFS)
    and the count must come from the filesystem client, not os."""
    li = table(spark, sf_dir, "lineitem").select("l_quantity")
    scatter = os.path.join(tempfile.gettempdir(), f"sdis_scatter_{os.getpid()}")
    compact = os.path.join(tempfile.gettempdir(), f"sdis_compact_{os.getpid()}")
    try:
        li.repartition(50).write.mode("overwrite").parquet(scatter)
        small = spark.read.parquet(scatter)
        # Production sizing: ceil(total_bytes / target_file_bytes); the
        # corpus slice is small so the target count is pinned at 4.
        small.repartition(4).write.mode("overwrite").parquet(compact)
        n_files = len(
            [f for f in os.listdir(compact) if f.endswith(".parquet")]
        )
        back = spark.read.parquet(compact)
        result = back.agg(
            F.lit(n_files).alias("n_files"),
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        result = spark.createDataFrame(result.collect(), result.schema)
    finally:
        shutil.rmtree(scatter, ignore_errors=True)
        shutil.rmtree(compact, ignore_errors=True)
    return result
