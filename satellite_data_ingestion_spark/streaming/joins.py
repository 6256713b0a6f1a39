"""Streaming joins (SURVEY.md §2.8 extension of §2.3's join surface).

Two shapes Structured Streaming supports that the batch §2.3 operators
don't cover:

- ``stream_join_static``  stream ⋈ static dimension: each micro-batch
                          joins against a (broadcast-able) batch DataFrame
                          — the enrich-on-ingest pattern; stateless, so
                          no watermark needed.
- ``stream_join_stream``  stream ⋈ stream inner join with watermarks on
                          both sides and a time-range join condition; the
                          state store buffers each side only within the
                          watermark+range bound, which is what makes the
                          join feasible on unbounded inputs.
- ``stream_join_outer``   stream ⋈ stream LEFT OUTER join: same bounds,
                          plus null-row emission for unmatched left rows
                          at state eviction — outer joins are the reason
                          the watermark+range bound is REQUIRED, not just
                          an optimization.

Both drain under ``Trigger.AvailableNow``, so their output equals the
batch join on the same data — full SQL oracles, not rows-only: a dropped
or duplicated match would hash-mismatch.

Reference analog: the availability check joins the desired slot stream
against the catalog listing within ±30 minutes
(``sources/meteosat.py:105-122``) — here the catalog side is (a) a static
dim and (b) a second stream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import _prepare, table
from ..registry import register
from .state import _drain_to_files, _few_shuffle_partitions, _stage_events


@register(
    "stream_join_static",
    oracle="""
WITH user_stats AS (
  SELECT user_id, count(*) AS n_user_events, round(sum(value), 4) AS user_value
  FROM events GROUP BY user_id
)
SELECT e.event_id, e.user_id, e.event_type, u.n_user_events, u.user_value
FROM events e JOIN user_stats u ON e.user_id = u.user_id
""",
)
def stream_join_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the event stream joins a static
    per-user dimension inside every micro-batch.  The static side is a
    plain batch DataFrame — Catalyst broadcasts it per batch, no state
    store involved.  The drained output must equal the batch join
    (the SQL oracle) row-for-row."""
    _prepare(spark)
    staging = _stage_events(spark, sf_dir, 2, "sjoin")
    schema = spark.read.parquet(staging).schema
    user_stats = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_user_events"),
            F.round(F.sum("value"), 4).alias("user_value"),
        )
    )
    with _few_shuffle_partitions(spark):
        enriched = (
            spark.readStream.schema(schema)
            .parquet(staging)
            .join(F.broadcast(user_stats), "user_id")
            .select("event_id", "user_id", "event_type", "n_user_events", "user_value")
        )
        # Output is one row per input event — row-proportional, so it drains
        # through a parallel file sink, never the driver.
        return _drain_to_files(spark, enriched, staging)


_RANGE_MIN = 30


@register(
    "stream_join_stream",
    oracle=f"""
SELECT a.user_id,
       a.event_id AS signup_event,
       b.event_id AS purchase_event,
       CAST(floor(epoch(b.ts)) AS BIGINT)
           - CAST(floor(epoch(a.ts)) AS BIGINT) AS lag_sec
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts
 AND b.ts <= a.ts + INTERVAL {_RANGE_MIN} MINUTE
WHERE a.event_type = 'signup' AND b.event_type = 'purchase'
""",
)
def stream_join_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: signups joined to purchases by the same
    user within 30 minutes.  Both sides carry watermarks and the join
    condition carries the time-range bound — together they let the state
    store evict buffered rows once no future match is possible, the
    property that keeps stream-stream joins bounded on unbounded input.
    Drained output equals the batch interval join (the SQL oracle)."""
    _prepare(spark)
    staging = _stage_events(spark, sf_dir, 2, "ssjoin")
    schema = spark.read.parquet(staging).schema

    signups = (
        spark.readStream.schema(schema)
        .parquet(staging)
        .filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id").alias("a_user"),
            F.col("event_id").alias("signup_event"),
            F.col("ts").alias("a_ts"),
        )
        .withWatermark("a_ts", "1 hour")
    )
    purchases = (
        spark.readStream.schema(schema)
        .parquet(staging)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("b_user"),
            F.col("event_id").alias("purchase_event"),
            F.col("ts").alias("b_ts"),
        )
        .withWatermark("b_ts", "1 hour")
    )
    joined = signups.join(
        purchases,
        (F.col("a_user") == F.col("b_user"))
        & (F.col("b_ts") >= F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr(f"INTERVAL {_RANGE_MIN} MINUTES")),
    ).select(
        F.col("a_user").alias("user_id"),
        "signup_event",
        "purchase_event",
        (F.unix_timestamp("b_ts") - F.unix_timestamp("a_ts")).alias("lag_sec"),
    )

    with _few_shuffle_partitions(spark):
        # One row per matched (signup, purchase) pair — row-proportional
        # output, so it drains through a parallel file sink, not the driver.
        return _drain_to_files(spark, joined, staging, timeout=180)


# Oracle: the final frame IS deterministic — matched pairs emit eagerly
# for every signup, and null rows emit exactly for unmatched signups whose
# match window closed strictly before the FINAL global watermark
# (min(max signup ts, max purchase ts) - 1h; the closing no-data batch
# flushes evictions below it).  Both populations stated relationally;
# lag truncates each timestamp to seconds like Spark's unix_timestamp.
@register(
    "stream_join_outer",
    oracle=f"""
WITH m AS (
  SELECT max(CASE WHEN event_type = 'signup' THEN ts END) AS ma,
         max(CASE WHEN event_type = 'purchase' THEN ts END) AS mb
  FROM events
),
wm AS (SELECT least(ma, mb) - INTERVAL 1 HOUR AS w FROM m),
s AS (SELECT user_id, event_id AS signup_event, ts AS a_ts
      FROM events WHERE event_type = 'signup'),
p AS (SELECT user_id, event_id AS purchase_event, ts AS b_ts
      FROM events WHERE event_type = 'purchase'),
matched AS (
  SELECT s.user_id, s.signup_event, p.purchase_event,
         CAST(floor(epoch(p.b_ts)) - floor(epoch(s.a_ts)) AS BIGINT) AS lag_sec
  FROM s JOIN p ON s.user_id = p.user_id
       AND p.b_ts >= s.a_ts AND p.b_ts <= s.a_ts + INTERVAL {_RANGE_MIN} MINUTE
)
SELECT * FROM matched
UNION ALL
SELECT s.user_id, s.signup_event, NULL, NULL
FROM s, wm
WHERE s.a_ts + INTERVAL {_RANGE_MIN} MINUTE < wm.w
  AND NOT EXISTS (SELECT 1 FROM matched m2
                  WHERE m2.signup_event = s.signup_event)
""",
)
def stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join: every signup emits — matched with
    its purchases inside the 30-minute window, or ONCE with nulls when
    the watermark passes the end of its match window and the state store
    evicts it (the abandoned-cart shape; inner results emit eagerly,
    null results only at eviction, which is why outer joins REQUIRE the
    watermark + time-range bound that the inner variant merely exploits).

    Drained under AvailableNow: the closing no-data micro-batch advances
    the watermark to min(max_a, max_b) - delay and flushes evictions
    strictly below it, so signups whose window closed before that final
    watermark have emitted their null row; signups still inside it
    remain buffered at shutdown and are withheld — exactly the semantics
    a restart would resume, and a DETERMINISTIC boundary the oracle
    states as a predicate on the final watermark.  The pytest side also
    pins both populations against the batch join (matched rows equal the
    inner join, null rows are exactly the evicted unmatched signups)."""
    _prepare(spark)
    staging = _stage_events(spark, sf_dir, 2, "sojoin")
    schema = spark.read.parquet(staging).schema

    signups = (
        spark.readStream.schema(schema)
        .parquet(staging)
        .filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id").alias("a_user"),
            F.col("event_id").alias("signup_event"),
            F.col("ts").alias("a_ts"),
        )
        .withWatermark("a_ts", "1 hour")
    )
    purchases = (
        spark.readStream.schema(schema)
        .parquet(staging)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("b_user"),
            F.col("event_id").alias("purchase_event"),
            F.col("ts").alias("b_ts"),
        )
        .withWatermark("b_ts", "1 hour")
    )
    joined = signups.join(
        purchases,
        (F.col("a_user") == F.col("b_user"))
        & (F.col("b_ts") >= F.col("a_ts"))
        & (
            F.col("b_ts")
            <= F.col("a_ts") + F.expr(f"INTERVAL {_RANGE_MIN} MINUTES")
        ),
        "left_outer",
    ).select(
        F.col("a_user").alias("user_id"),
        "signup_event",
        "purchase_event",
        (F.unix_timestamp("b_ts") - F.unix_timestamp("a_ts")).alias("lag_sec"),
    )

    with _few_shuffle_partitions(spark):
        return _drain_to_files(spark, joined, staging, timeout=180)
