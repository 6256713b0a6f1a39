"""Window-function operators (SURVEY.md §2.5).

The reference's product-per-slot selection (``sources/meteosat.py:115-120``)
is a rank-1-per-partition; its state advance ``prev + 15 min``
(``sources/meteosat.py:90``) is a lag; the ±30-min availability window
(``sources/meteosat.py:106-107``) is a range frame.

Scale notes: every window here shuffles once on its partition key and
sorts within partitions.  Partition keys are chosen with bounded
cardinality per group (orders per customer, events per user) so no single
partition explodes; for skewed keys the salting pattern in
``llm/dedup.py`` applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


@register(
    "win_rank",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn = 1
""",
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1 per group via row_number — "latest product per slot"
    (sources/meteosat.py:115-120) as rank-then-filter, with a key
    tie-break for determinism."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "win_lag_lead",
    oracle="""
SELECT event_id, user_id, ts,
       epoch_us(ts) - lag(epoch_us(ts)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id) AS gap_us,
       lead(event_id) OVER (
         PARTITION BY user_id ORDER BY ts, event_id) AS next_event
FROM events
""",
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag/lead analytics — the state advance `prev_date + 15 min`
    (sources/meteosat.py:90) generalized to gap detection.  Gaps are
    computed in integer microseconds (unix_micros) on both engines —
    exact, no float truncation mismatches."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (us - F.lag(us).over(w)).alias("gap_us"),
        F.lead("event_id").over(w).alias("next_event"),
    )


@register(
    "win_running",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey
         ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
       count(*) OVER (
         PARTITION BY o_custkey
         ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
FROM orders
""",
)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) frame aggregate per customer over order time."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


@register(
    "win_range_frame",
    oracle="""
SELECT event_id, user_id, ts,
       count(*) OVER (
         PARTITION BY user_id
         ORDER BY epoch_us(ts)
         RANGE BETWEEN 1800000000 PRECEDING AND 1800000000 FOLLOWING
       ) AS n_neighbors
FROM events
""",
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """±30-minute range frame — the availability search window of
    sources/meteosat.py:106-107 as a sliding value-range count, ordered on
    integer microseconds so the frame bounds are exact on both engines."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-1_800_000_000, 1_800_000_000)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_neighbors"),
    )


@register(
    "win_ntile_dist",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice,
       ntile(4)       OVER w AS price_quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist()    OVER w, 6) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
""",
)
def win_ntile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — ntile bucketing, percent_rank,
    cume_dist — per order status.  One shuffle on the partition key, one
    in-partition sort serves all three functions (single Window node).
    The ntile quartile is the standard price-band feature; percent_rank /
    cume_dist are the normalized forms robust to group size."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.ntile(4).over(w).alias("price_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


_SESSION_GAP_SEC = 1800


@register(
    "win_sessionize",
    oracle=f"""
SELECT event_id, user_id, session_id,
       count(*) OVER (PARTITION BY user_id, session_id) AS session_events
FROM (
  SELECT event_id, user_id,
         CAST(sum(is_new) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM (
    SELECT event_id, user_id, ts,
           CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                     - lag(CAST(floor(epoch(ts)) AS BIGINT), 1,
                           CAST(floor(epoch(ts)) AS BIGINT) - {_SESSION_GAP_SEC} - 1)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > {_SESSION_GAP_SEC}
                THEN 1 ELSE 0 END AS is_new
    FROM events
  )
)
""",
)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: a new session starts when the gap to the
    previous event of the same user exceeds 30 minutes; session_id is the
    running count of session starts — the lag + cumulative-sum idiom,
    the batch twin of streaming's session_window (stream_session).
    One shuffle on user_id; both window passes share the same partitioning
    and sort, so the second adds no exchange."""
    ev = table(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = epoch - F.lag(epoch, 1, None).over(w)
    is_new = F.when(gap.isNull() | (gap > _SESSION_GAP_SEC), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessioned = ev.select(
        "event_id",
        "user_id",
        F.sum(is_new).over(run).alias("session_id"),
    )
    return sessioned.withColumn(
        "session_events",
        F.count(F.lit(1)).over(Window.partitionBy("user_id", "session_id")),
    )


@register(
    "win_first_last",
    oracle="""
SELECT event_id, user_id,
       first_value(event_id) OVER w AS first_event,
       last_value(event_id)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND UNBOUNDED FOLLOWING) AS last_event,
       nth_value(event_id, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND UNBOUNDED FOLLOWING) AS second_event
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value per user timeline.  The frame
    matters: last/nth need the FULL frame (unbounded both ways) or they
    silently mean 'last so far'; the default growing frame is one of the
    classic window-function bugs — pinned explicitly here and checked by
    the oracle."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(full).alias("last_event"),
        F.nth_value("event_id", 2).over(full).alias("second_event"),
    )


@register(
    "win_distribution",
    oracle="""
SELECT event_id, event_type,
       ntile(4)       OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist()    OVER w, 6) AS cume
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
""",
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions per group: quartile bucketing
    (ntile), percent_rank, cume_dist over event values — the ranking
    trio behind percentile-based quality cuts (e.g. 'drop the bottom
    quartile by quality score').  One partition-key shuffle serves all
    three; the key tie-break pins determinism."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.asc("value"), F.asc("event_id"))
    return ev.select(
        "event_id",
        "event_type",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )
