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


@register(
    "pipeline_partition_reconcile",
    oracle="""
WITH e AS (
  SELECT 'd' || strftime(date_trunc('day', ts), '%Y%m%d') AS day,
         day(date_trunc('day', ts)) AS dom,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT day, n AS expected_rows,
       CAST(CASE WHEN dom % 3 <> 0 THEN n ELSE 0 END AS BIGINT) AS sunk_rows,
       CASE WHEN dom % 3 <> 0 THEN 'ok' ELSE 'missing' END AS status
FROM e ORDER BY day
""",
)
def pipeline_partition_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION RECONCILIATION audit — the batch twin of the
    reference's availability check (is the next 15-minute slot present
    in the catalog but absent from local state?  sources/meteosat.py:
    105-122): compare the day partitions a sink SHOULD hold (every day
    present in the source) against what it DOES hold, and emit the
    backfill worklist.  A deterministic gap (days-of-month divisible by
    3 are withheld) simulates the failed-ticks case; the op round-trips
    the kept days through a REAL partitioned parquet sink and derives
    "materialized" from the files read back, so a partition lost in the
    directory encoding would surface as a spurious 'missing'.

    Scale shape: both sides reduce to the day grain before comparing —
    the reconcile join is |days| rows regardless of corpus size, which
    is what makes nightly reconciliation affordable on a 100 TB lake
    (never diff row-level, diff the partition manifests; the row COUNT
    per partition rides along as the cheap corruption check)."""
    ev = table(spark, sf_dir, "events")
    # 'd'-prefixed day key keeps the partition value a STRING through the
    # directory round-trip (a bare yyyy-MM-dd is type-inferred to DATE on
    # read-back, which would silently change the output schema).
    day = F.concat(
        F.lit("d"), F.date_format(F.date_trunc("day", "ts"), "yyyyMMdd")
    )
    rows = ev.select(
        day.alias("day"),
        F.dayofmonth(F.date_trunc("day", "ts")).alias("dom"),
        "event_id",
    )
    expected = rows.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("expected_rows")
    )
    out = os.path.join(
        tempfile.gettempdir(), f"sdis_partition_reconcile_{os.getpid()}"
    )
    try:
        rows.filter(F.col("dom") % 3 != 0).select("day", "event_id").write.mode(
            "overwrite"
        ).partitionBy("day").parquet(out)
        sunk = (
            spark.read.parquet(out)
            .groupBy("day")
            .agg(F.count(F.lit(1)).cast("long").alias("sunk_rows"))
        )
        recon = (
            expected.join(sunk, "day", "left")
            .select(
                "day",
                "expected_rows",
                F.coalesce(F.col("sunk_rows"), F.lit(0)).cast("long").alias("sunk_rows"),
                F.when(F.col("sunk_rows").isNotNull(), "ok")
                .otherwise("missing")
                .alias("status"),
            )
            .orderBy("day")
        )
        result = spark.createDataFrame(recon.collect(), recon.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return result
