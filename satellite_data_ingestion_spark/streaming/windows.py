"""Streaming window semantics (SURVEY.md §2.8).

The reference's scheduler processes one 15-minute slot per tick
(``sources/meteosat.py:88-93``) with a ±30-min availability search
(``sources/meteosat.py:106-107``) — i.e. tumbling 15-min windows with a
sliding search overlay.  These queries give the *batch-checkable* window
semantics (identical aggregation logic batch vs stream — Spark reuses the
same window expressions in Structured Streaming); the stateful/
watermarked live-stream forms are in ``streaming/state.py``.

Window starts are surfaced as integer epoch seconds (slot_epoch) — exact
on both engines, no timezone/precision ambiguity in the oracle hash.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import _prepare, table
from ..registry import register
from .state import _few_shuffle_partitions, _stage_events

_SLOT_SEC = 900  # the reference's 15-minute slot (config/base.py:14)
_SESSION_GAP_SEC = 1800


@register(
    "stream_tumbling",
    oracle=f"""
SELECT CAST(floor(epoch(ts) / {_SLOT_SEC}) AS BIGINT) * {_SLOT_SEC} AS slot_epoch,
       count(*)             AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1
""",
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 15-minute window aggregate — the reference's slot
    granularity (sources/meteosat.py:90).  Uses Spark's window() exactly
    as a streaming query would; epoch-aligned starts are exported as
    integer seconds."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", f"{_SLOT_SEC} seconds").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("slot_epoch"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "stream_sliding",
    oracle=f"""
SELECT (CAST(floor(epoch(ts) / {_SLOT_SEC}) AS BIGINT) - i) * {_SLOT_SEC} AS win_epoch,
       count(*)             AS n_events,
       round(sum(value), 2) AS sum_value
FROM events, generate_series(0, 3) AS g(i)
GROUP BY 1
""",
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 60-minute length, 15-minute slide — the ±30-min
    availability search around each slot (sources/meteosat.py:106-107).
    Every event lands in exactly 4 windows; the oracle states that
    expansion explicitly via generate_series."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "3600 seconds", f"{_SLOT_SEC} seconds").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("win_epoch"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "stream_session",
    oracle=f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts) >= {_SESSION_GAP_SEC} * 1000000
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
), sess AS (
  SELECT user_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id,
       epoch_us(min(ts))                                  AS session_start_us,
       epoch_us(max(ts)) + {_SESSION_GAP_SEC} * 1000000   AS session_end_us,
       count(*)                                           AS n_events
FROM sess
GROUP BY user_id, session_id
""",
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) per user.

    Spark side uses the native session_window operator (the same state
    merge Structured Streaming runs incrementally); the oracle states the
    identical semantics via lag-based sessionization.  A session's id is
    its 1-based rank per user so both sides name sessions identically;
    bounds exported as integer microseconds.
    """
    ev = table(spark, sf_dir, "events")
    sess = (
        ev.groupBy("user_id", F.session_window("ts", f"{_SESSION_GAP_SEC} seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
        )
    )
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy("session_start_us")
    )
    return sess.withColumn("session_id", rn.cast("long")).select(
        "user_id", "session_id", "session_start_us", "session_end_us", "n_events"
    )


@register(
    "stream_complete_mode",
    oracle="""
SELECT event_type, count(*) AS n_events
FROM events
GROUP BY event_type
""",
)
def stream_complete_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete-output-mode streaming aggregate: every trigger re-emits
    the FULL aggregate state (vs append's finalized-only, update's
    changed-only) — the mode for live dashboards over small keyed state.
    After the availableNow drain the memory sink holds exactly the batch
    group-by (the SQL oracle); complete mode is why no dedup of partial
    emissions is needed."""
    _prepare(spark)
    staging = _stage_events(spark, sf_dir, 2, "cmode")
    schema = spark.read.parquet(staging).schema
    sink = f"cmode_sink_{os.getpid()}"
    with _few_shuffle_partitions(spark):
        q = (
            spark.readStream.schema(schema)
            .parquet(staging)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(staging, "_checkpoint"))
            .start()
        )
        q.awaitTermination(120)
    out = spark.table(sink)
    # Bounded collect: memory-sink output is AGGREGATED micro-batch results
    # (windows/groups, not raw events) — materialized once so the driver gets
    # a plain batch DataFrame to hash; never a hot-path/full-corpus collect.
    result = spark.createDataFrame(out.collect(), out.schema)
    shutil.rmtree(staging, ignore_errors=True)
    return result
