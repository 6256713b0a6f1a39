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


_FUNNEL_WINDOW_US = 21_600_000_000  # 6-hour stage deadline (µs)


@register(
    "win_funnel",
    oracle="""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS t FROM events
),
v AS (
  SELECT user_id, min(t) AS vt FROM e
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.t) AS ct
  FROM e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.t > v.vt
    AND e.t <= v.vt + 21600000000
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.t) AS pt
  FROM e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.t > c.ct
    AND e.t <= c.ct + 21600000000
  GROUP BY e.user_id
)
SELECT v.user_id,
       v.vt AS first_view_us,
       c.ct AS first_click_us,
       p.pt AS first_purchase_us,
       CAST(1 + CASE WHEN c.ct IS NOT NULL THEN 1 ELSE 0 END
              + CASE WHEN p.pt IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         AS reached_stage
FROM v
LEFT JOIN c ON v.user_id = c.user_id
LEFT JOIN p ON v.user_id = p.user_id
""",
)
def win_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel (view → click → purchase): per user, the
    first view, the first click within 6 hours AFTER that view, and
    the first purchase within 6 hours after that click (strict
    ordering + a stage deadline) — the product-analytics staple
    whose ordering constraint defeats plain conditional aggregation
    (each stage's window starts where the previous stage landed).

    Execution: three chained projections over ONE user-partitioned
    window — stage k's conditional min references stage k-1's window
    column, and because all three Window nodes share the partitioning,
    Catalyst plans a SINGLE exchange; the per-user dedup reuses it.  At
    100 TB this is one shuffle of (user, type, t) triples, no joins, no
    self-scans — compare the oracle's three-join relational phrasing.
    Timestamps compare as integer MICROS (engine-stable)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("t")
    )
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "vt",
            F.min(F.when(F.col("event_type") == "view", F.col("t"))).over(w),
        )
        .withColumn(
            "ct",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("t") > F.col("vt"))
                    & (F.col("t") <= F.col("vt") + _FUNNEL_WINDOW_US),
                    F.col("t"),
                )
            ).over(w),
        )
        .withColumn(
            "pt",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("t") > F.col("ct"))
                    & (F.col("t") <= F.col("ct") + _FUNNEL_WINDOW_US),
                    F.col("t"),
                )
            ).over(w),
        )
    )
    return (
        staged.filter(F.col("vt").isNotNull())
        .groupBy("user_id")
        .agg(
            F.min("vt").alias("first_view_us"),
            F.min("ct").alias("first_click_us"),
            F.min("pt").alias("first_purchase_us"),
            (
                F.lit(1)
                + F.min("ct").isNotNull().cast("int")
                + F.min("pt").isNotNull().cast("int")
            )
            .cast("long")
            .alias("reached_stage"),
        )
    )


# Shared with the streaming CEP twin (streaming/custom_state.py's
# stream_pattern_match): the stream is pinned exactly equal to this
# batch operator, so one relational recomputation verifies both.
PATTERN_ORACLE = """
SELECT user_id,
       e2 AS view_event,
       e1 AS click_event,
       event_id AS purchase_event,
       epoch_us(ts) - epoch_us(ts2) AS span_us
FROM (
  SELECT user_id, event_id, event_type, ts,
         lag(event_type, 1) OVER w AS t1,
         lag(event_type, 2) OVER w AS t2,
         lag(event_id, 1)   OVER w AS e1,
         lag(event_id, 2)   OVER w AS e2,
         lag(ts, 2)         OVER w AS ts2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
WHERE event_type = 'purchase' AND t1 = 'click' AND t2 = 'view'
"""


@register("win_pattern_match", oracle=PATTERN_ORACLE)
def win_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern matching over event sequences — the MATCH_RECOGNIZE
    capability (``PATTERN (view click purchase)`` over CONSECUTIVE rows
    of a user's timeline) expressed as a lag-chain: a row matches when
    it is a purchase whose two immediately preceding events (by ts,
    event_id) are a click preceded by a view.  Adjacency is what
    distinguishes this from win_funnel (any-gap ordered stages): an
    intervening error event breaks the pattern here.

    Execution: one shuffle on user_id; the three lags share a single
    window sort, the pattern predicate is a post-window filter, and at
    100 TB the state per partition is the lag buffer (2 rows), not the
    user's history.  A k-step pattern is k-1 lags over the same sort —
    cost grows in columns, never in exchanges."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("t_us"),
        F.lag("event_type", 1).over(w).alias("t1"),
        F.lag("event_type", 2).over(w).alias("t2"),
        F.lag("event_id", 1).over(w).alias("e1"),
        F.lag("event_id", 2).over(w).alias("e2"),
        F.lag(F.unix_micros("ts"), 2).over(w).alias("ts2_us"),
    )
    return lagged.filter(
        (F.col("event_type") == "purchase")
        & (F.col("t1") == "click")
        & (F.col("t2") == "view")
    ).select(
        "user_id",
        F.col("e2").alias("view_event"),
        F.col("e1").alias("click_event"),
        F.col("event_id").alias("purchase_event"),
        (F.col("t_us") - F.col("ts2_us")).alias("span_us"),
    )


_RUN_MIN_LEN = 3


@register(
    "win_runs",
    oracle=f"""
SELECT user_id,
       min(event_id)                     AS run_start_event,
       max(event_id)                     AS run_end_event,
       CAST(count(*) AS BIGINT)          AS run_len,
       round(max(value) - min(value), 6) AS value_gain
FROM (
  SELECT user_id, event_id, value,
         CAST(sum(brk) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_id
  FROM (
    SELECT user_id, event_id, ts, value,
           CASE WHEN value <= lag(value, 1, value + 1)
                              OVER (PARTITION BY user_id ORDER BY ts, event_id)
                THEN 1 ELSE 0 END AS brk
    FROM events
  )
)
GROUP BY user_id, run_id
HAVING count(*) >= {_RUN_MIN_LEN}
""",
)
def win_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of STRICTLY INCREASING event
    values per user timeline, kept at length >= 3.  A run breaks when
    the value fails to increase; the break flag's running sum is the
    island id — the same lag + cumulative-sum idiom as win_sessionize,
    applied to VALUE monotonicity instead of time gaps (together they
    cover the two classic islands variants).

    Within a run, ``ts``-order and ``value``-order coincide (that is
    what a strictly increasing run means), so run_start/run_end are
    min/max event_id and the gain is max-min value — keeping the
    aggregate ORDER-FREE and the oracle dialect-neutral.

    Execution: both window passes share one (user_id) exchange and one
    sort; the final groupBy re-uses the shuffle's partitioning (child
    output partitioning satisfies the aggregate's requirement), so the
    whole operator is a single exchange at any scale."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value", 1).over(w)
    brk = F.when(prev.isNull() | (F.col("value") <= prev), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    islands = ev.select(
        "user_id",
        "event_id",
        "value",
        F.sum(brk).over(run).alias("run_id"),
    )
    return (
        islands.groupBy("user_id", "run_id")
        .agg(
            F.min("event_id").alias("run_start_event"),
            F.max("event_id").alias("run_end_event"),
            F.count(F.lit(1)).alias("run_len"),
            F.round(F.max("value") - F.min("value"), 6).alias("value_gain"),
        )
        .filter(F.col("run_len") >= _RUN_MIN_LEN)
        .drop("run_id")
    )


_ATTR_WINDOW_US = 21_600_000_000  # 6-hour attribution lookback (µs)


@register(
    "win_attribution",
    oracle=f"""
SELECT event_id AS purchase_event, user_id,
       lt.touch_event AS touch_event,
       lt.touch_type  AS touch_type,
       epoch_us(ts) - lt.t AS gap_us
FROM (
  SELECT user_id, event_id, event_type, ts,
         last_value(CASE WHEN event_type IN ('view', 'click')
                         THEN struct_pack(
                                t := epoch_us(ts),
                                touch_event := event_id,
                                touch_type := event_type)
                    END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
  FROM events
)
WHERE event_type = 'purchase' AND lt IS NOT NULL
  AND epoch_us(ts) - lt.t <= {_ATTR_WINDOW_US}
""",
)
def win_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH attribution: each purchase is credited to the user's
    most recent preceding view or click within a 6-hour lookback — the
    marketing-analytics staple, and the window-native form of a per-row
    as-of join (``join_asof`` matches two tables; attribution matches a
    row against earlier rows of its OWN partition, so a join would
    self-scan the table while a window pays one sort).

    The idiom: wrap the touch candidates in a struct and take
    ``last(..., ignorenulls=True)`` over the growing frame that ends
    one row back — intervening purchases/errors pass through as nulls
    without resetting the carried touch.  One user_id exchange, state
    is a single struct per partition scan position, linear at any
    scale."""
    ev = table(spark, sf_dir, "events")
    t_us = F.unix_micros("ts")
    touch = F.when(
        F.col("event_type").isin("view", "click"),
        F.struct(
            t_us.alias("t"),
            F.col("event_id").alias("touch_event"),
            F.col("event_type").alias("touch_type"),
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lagged = ev.select(
        "user_id",
        "event_id",
        "event_type",
        t_us.alias("t_us"),
        F.last(touch, ignorenulls=True).over(w).alias("lt"),
    )
    return lagged.filter(
        (F.col("event_type") == "purchase")
        & F.col("lt").isNotNull()
        & (F.col("t_us") - F.col("lt.t") <= _ATTR_WINDOW_US)
    ).select(
        F.col("event_id").alias("purchase_event"),
        "user_id",
        F.col("lt.touch_event").alias("touch_event"),
        F.col("lt.touch_type").alias("touch_type"),
        (F.col("t_us") - F.col("lt.t")).alias("gap_us"),
    )


_COVER_WINDOW_US = 1_800_000_000  # each event covers [ts, ts + 30 min)


@register(
    "win_interval_coverage",
    oracle=f"""
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + {_COVER_WINDOW_US} AS e,
         event_id
  FROM events
), w AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max_e
  FROM iv
)
SELECT user_id,
       CAST(sum(greatest(0, e - greatest(s, coalesce(prev_max_e, s))))
            AS BIGINT)        AS covered_us,
       CAST(count(*) FILTER (WHERE prev_max_e IS NULL OR s > prev_max_e)
            AS BIGINT)        AS n_spans
FROM w
GROUP BY user_id
""",
)
def win_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL UNION COVERAGE per key — the utilization metric (how
    much wall-clock did this user's activity windows actually cover,
    counting overlaps once) via the sweep-line-as-window idiom: order
    intervals by start, carry the running max end over the PRECEDING
    frame, and each interval contributes only the part past that
    high-water mark; rows whose start clears it open a new disjoint
    span (counted as ``n_spans``).

    This is the classic problem a naive ``sum(e - s)`` double-counts
    and a self-join solves quadratically; the window form is one
    exchange + one sort with O(1) state, exact at any overlap depth.
    Interval bounds are integer microseconds — no float drift."""
    ev = table(spark, sf_dir, "events")
    s = F.unix_micros("ts")
    iv = ev.select(
        "user_id",
        "event_id",
        s.alias("s"),
        (s + _COVER_WINDOW_US).alias("e"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.withColumn("prev_max_e", F.max("e").over(w))
    contrib = F.greatest(
        F.lit(0),
        F.col("e") - F.greatest(F.col("s"), F.coalesce("prev_max_e", "s")),
    )
    new_span = F.col("prev_max_e").isNull() | (
        F.col("s") > F.col("prev_max_e")
    )
    return marked.groupBy("user_id").agg(
        F.sum(contrib).alias("covered_us"),
        F.count(F.when(new_span, 1)).alias("n_spans"),
    )


@register(
    "win_drawdown",
    oracle="""
WITH r AS (
  SELECT event_type, value, ts, event_id,
         max(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run_max
  FROM events
)
SELECT event_type,
       round(min(CASE WHEN run_max > 0 THEN value / run_max - 1 END), 6)
         AS max_drawdown,
       round(max(run_max), 6) AS peak
FROM r
GROUP BY event_type
""",
)
def win_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMUM DRAWDOWN per series — the canonical composition of a
    cumulative extreme with a global one (largest peak-to-trough drop
    of ``value`` along each type's timeline), the risk/degradation
    metric for anything monitored over time (model quality, throughput,
    portfolio value).  Running max over the ordered frame, relative
    drop per row, global min per group; zero-peak rows null out rather
    than divide (CASE guard on both engines).

    One exchange serves the running-max window AND the final aggregate
    (same partition key); drawdown state is two scalars per group —
    O(1) memory at any series length, where the naive formulation
    (min over all later troughs per peak) is quadratic."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = ev.select(
        "event_type",
        "value",
        F.max("value").over(w).alias("run_max"),
    )
    dd = F.when(F.col("run_max") > 0, F.col("value") / F.col("run_max") - 1)
    return r.groupBy("event_type").agg(
        F.round(F.min(dd), 6).alias("max_drawdown"),
        F.round(F.max("run_max"), 6).alias("peak"),
    )


@register(
    "win_period_over_period",
    oracle="""
WITH m AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         o_orderpriority,
         round(sum(o_totalprice), 2) AS revenue
  FROM orders GROUP BY 1, 2
)
SELECT month, o_orderpriority, revenue,
       round(revenue - lag(revenue) OVER w, 2)      AS mom_delta,
       round(100.0 * (revenue - lag(revenue) OVER w)
             / lag(revenue) OVER w, 4)              AS mom_pct
FROM m
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY month)
""",
)
def win_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERIOD-OVER-PERIOD deltas — the BI dashboard staple (month-over-
    month revenue change per priority class): aggregate to the period
    grain FIRST, then lag over the aggregated series.  Ordering the
    window on the aggregated month string is what makes this scale-
    different from win_lag_lead: the window operates on
    period-cardinality rows (months x groups), not raw facts, so the
    sort after the aggregate is over a tiny frame no matter how many
    orders fed it; the aggregate's shuffle dominates and is map-side
    combined.  First period of each group reports null deltas, as BI
    semantics demand (no fabricated baseline)."""
    o = table(spark, sf_dir, "orders")
    m = (
        o.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            "o_orderpriority",
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.partitionBy("o_orderpriority").orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        "o_orderpriority",
        "revenue",
        F.round(F.col("revenue") - prev, 2).alias("mom_delta"),
        F.round(100.0 * (F.col("revenue") - prev) / prev, 4).alias("mom_pct"),
    )


@register(
    "ext_event_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type AS cur_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
), pairs AS (
  SELECT cur_type, next_type, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT cur_type, next_type, n,
       round(CAST(n AS DOUBLE)
             / sum(n) OVER (PARTITION BY cur_type), 6) AS p
FROM pairs
""",
)
def ext_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order MARKOV transition matrix over per-user event
    sequences: P(next_type | cur_type) with raw pair counts — the
    sequence-statistics primitive behind next-event prediction features,
    funnel leak analysis, and bot detection (improbable transition
    chains).  Consecutive pairs come from ONE lead() over the per-user
    timeline (deterministic (ts, event_id) order), so no self-join.

    Scale shape: one exchange on user_id for the lag window (the same
    partitioning every sequence op here reuses), then a
    map-side-combined groupBy to |types|^2 rows; the row-normalization
    runs on that 25-row aggregate, never on the fact table."""
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("cur_type"),
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    pairs = seq.groupBy("cur_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = Window.partitionBy("cur_type")
    return pairs.select(
        "cur_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(tot), 6).alias("p"),
    )


_GAP_TH_SEC = 300  # report gaps longer than 5 minutes


@register(
    "win_gap_report",
    oracle=f"""
WITH g AS (
  SELECT event_type,
         CAST(date_diff('second',
              lag(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id),
              ts) AS BIGINT) AS gap_sec
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(sum(CASE WHEN gap_sec > {_GAP_TH_SEC} THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
       CAST(max(gap_sec) AS BIGINT) AS max_gap_sec,
       CAST(sum(CASE WHEN gap_sec > {_GAP_TH_SEC} THEN gap_sec ELSE 0 END) AS BIGINT) AS downtime_sec
FROM g WHERE gap_sec IS NOT NULL
GROUP BY 1
""",
)
def win_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAP / DOWNTIME report per series: inter-arrival gaps over the
    per-type timeline, counting and totaling the ones beyond the SLA
    threshold — the uptime-monitoring twin of ``ext_gap_fill`` (that one
    REPAIRS the holes, this one REPORTS them; the reference's 15-minute
    cadence makes a missed slot exactly such a gap,
    sources/meteosat.py:88-93).

    One lag() over the per-type timeline (single exchange), then a
    map-side-combined aggregate; gap arithmetic in whole integer seconds
    so the report is float-free."""
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gap = (
        F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    ).cast("long")
    g = events.select("event_type", gap.alias("gap_sec")).filter(
        F.col("gap_sec").isNotNull()
    )
    over = F.col("gap_sec") > _GAP_TH_SEC
    return g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum(F.when(over, 1).otherwise(0)).cast("long").alias("n_gaps"),
        F.max("gap_sec").cast("long").alias("max_gap_sec"),
        F.sum(F.when(over, F.col("gap_sec")).otherwise(0))
        .cast("long")
        .alias("downtime_sec"),
    )


@register(
    "agg_new_vs_returning",
    oracle="""
WITH firsts AS (
  SELECT o_custkey, min(o_orderdate) AS first_dt FROM orders GROUP BY 1
), tagged AS (
  SELECT strftime(CAST(o.o_orderdate AS DATE), '%Y-%m') AS month,
         CASE WHEN o.o_orderdate = f.first_dt THEN 1 ELSE 0 END AS is_new
  FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
)
SELECT month,
       CAST(sum(is_new) AS BIGINT) AS n_new,
       CAST(sum(1 - is_new) AS BIGINT) AS n_returning,
       floor((CAST(sum(1 - is_new) AS DOUBLE) / count(*)) * 1000000 + 0.5)
         / 1000000.0 AS returning_frac
FROM tagged GROUP BY month
""",
)
def agg_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEW vs RETURNING decomposition per month — the growth-accounting
    split every subscription/commerce dashboard leads with (rising
    volume from a shrinking new-share is a very different business than
    the same volume from acquisition): an order is 'new' iff it falls on
    its customer's first order date.

    One window (or aggregate-join, as here: min-date per customer is a
    |customers|-row aggregate joined back on the key) tags each order;
    monthly rollup is map-side combined.  Cohort retention
    (``agg_cohort_retention``) is the month×month matrix refinement of
    this 1-D split."""
    o = table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("first_dt"))
    tagged = o.join(firsts, "o_custkey").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.when(F.col("o_orderdate") == F.col("first_dt"), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    return tagged.groupBy("month").agg(
        F.sum("is_new").cast("long").alias("n_new"),
        F.sum(1 - F.col("is_new")).cast("long").alias("n_returning"),
        (
            F.floor(
                (F.sum(1 - F.col("is_new")).cast("double") / F.count(F.lit(1)))
                * 1000000
                + 0.5
            )
            / 1000000.0
        ).alias("returning_frac"),
    )


@register(
    "win_vwap",
    oracle="""
WITH x AS (
  SELECT l_returnflag, l_shipdate, l_orderkey, l_linenumber,
         CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(l_quantity AS BIGINT) AS pv_cents,
         CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem
), w AS (
  SELECT l_returnflag, l_orderkey, l_linenumber,
         CAST(sum(pv_cents) OVER win AS BIGINT) AS cum_pv,
         CAST(sum(qty) OVER win AS BIGINT) AS cum_qty
  FROM x
  WINDOW win AS (PARTITION BY l_returnflag
                 ORDER BY l_shipdate, l_orderkey, l_linenumber, qty, pv_cents
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT l_orderkey, l_linenumber, l_returnflag,
       floor(((CAST(cum_pv AS DOUBLE) / 100.0) / cum_qty) * 10000 + 0.5)
         / 10000.0 AS vwap
FROM w
""",
)
def win_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running VWAP (volume-weighted average price) per flag class —
    the execution-quality benchmark of every trading/market pipeline,
    and the canonical weighted running ratio: cum(price x qty)/cum(qty)
    over the ship-date timeline.

    Both cumulative sums accumulate EXACT integers (price-cents x
    integral qty), so the sequential window is bit-stable and only the
    final division is floating point (one op, identical operands both
    engines, explicit half-up round).  One exchange on the partition
    key; per-row output is intentional — VWAP is consumed as a running
    column, not a summary."""
    li = table(spark, sf_dir, "lineitem")
    pv = (F.round(F.col("l_extendedprice") * 100).cast("long")
          * F.col("l_quantity").cast("long"))
    qty = F.col("l_quantity").cast("long")
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", qty, pv)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    x = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.sum(pv).over(w).cast("long").alias("cum_pv"),
        F.sum(qty).over(w).cast("long").alias("cum_qty"),
    )
    return x.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        (
            F.floor(
                ((F.col("cum_pv").cast("double") / 100.0) / F.col("cum_qty"))
                * 10000
                + 0.5
            )
            / 10000.0
        ).alias("vwap"),
    )


@register(
    "win_index_rebase",
    oracle="""
WITH m AS (
  SELECT o_orderpriority,
         strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, month,
       floor((CAST(rev_cents AS DOUBLE) / 100.0) * 100 + 0.5) / 100.0 AS revenue,
       floor((100.0 * rev_cents
              / first_value(rev_cents) OVER (
                  PARTITION BY o_orderpriority ORDER BY month)) * 10000 + 0.5)
         / 10000.0 AS index_100
FROM m
""",
)
def win_index_rebase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INDEX REBASING (first period = 100) per series — how economists
    and BI dashboards compare growth across series of different
    magnitudes (a CPI-style index): each month's revenue expressed
    relative to the series' first month.  Completes the trend trio with
    ``win_period_over_period`` (deltas) and ``win_drawdown`` (peaks).

    The window runs over the month-grain AGGREGATE (≤ |priorities| x
    |months| rows), never facts; exact-cent sums, one float ratio."""
    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    m = o.groupBy(
        "o_orderpriority",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    ).agg(F.sum(cents).cast("long").alias("rev_cents"))
    w = Window.partitionBy("o_orderpriority").orderBy("month")
    return m.select(
        "o_orderpriority",
        "month",
        (F.floor((F.col("rev_cents").cast("double") / 100.0) * 100 + 0.5) / 100.0)
        .alias("revenue"),
        (
            F.floor(
                (100.0 * F.col("rev_cents") / F.first("rev_cents").over(w))
                * 10000
                + 0.5
            )
            / 10000.0
        ).alias("index_100"),
    )


@register(
    "agg_cohort_ltv",
    oracle="""
WITH firsts AS (
  SELECT o_custkey, strftime(min(o_orderdate), '%Y-%m') AS cohort,
         CAST(min(CAST(strftime(o_orderdate, '%Y') AS BIGINT) * 12
                  + CAST(strftime(o_orderdate, '%m') AS BIGINT)) AS BIGINT) AS m0
  FROM orders GROUP BY 1
), facts AS (
  SELECT f.cohort,
         CAST(strftime(o.o_orderdate, '%Y') AS BIGINT) * 12
              + CAST(strftime(o.o_orderdate, '%m') AS BIGINT) - f.m0 AS age,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
), sizes AS (
  SELECT cohort, CAST(count(*) AS BIGINT) AS n_cust FROM firsts GROUP BY 1
), by_age AS (
  SELECT cohort, age, CAST(sum(cents) AS BIGINT) AS rev
  FROM facts GROUP BY 1, 2
)
SELECT b.cohort, b.age, s.n_cust,
       floor(((CAST(sum(b.rev) OVER (PARTITION BY b.cohort ORDER BY b.age
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
              / 100.0) / s.n_cust) * 100 + 0.5) / 100.0 AS cum_ltv_per_cust
FROM by_age b JOIN sizes s ON b.cohort = s.cohort
""",
)
def agg_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LIFETIME-VALUE curves: cumulative revenue per customer by
    cohort age in months — the number that says whether newer cohorts
    monetize faster (the revenue refinement of ``agg_cohort_retention``'s
    activity matrix; payback-period decisions read straight off it).
    Month arithmetic is integer (year*12+month), so cohort age is exact
    and timezone-free.

    Facts aggregate once to (cohort, age) grain; the cumulative window
    and the per-customer normalization run on that small matrix joined
    against the cohort-size census — facts are touched once."""
    o = table(spark, sf_dir, "orders")
    mnum = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("long")
    firsts = o.groupBy("o_custkey").agg(
        F.date_format(F.min("o_orderdate"), "yyyy-MM").alias("cohort"),
        F.min(mnum).cast("long").alias("m0"),
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    facts = o.join(firsts, "o_custkey").select(
        "cohort",
        (mnum - F.col("m0")).cast("long").alias("age"),
        cents.alias("cents"),
    )
    sizes = firsts.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n_cust")
    )
    by_age = facts.groupBy("cohort", "age").agg(
        F.sum("cents").cast("long").alias("rev")
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        by_age.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "age",
            "n_cust",
            (
                F.floor(
                    (
                        (F.sum("rev").over(w).cast("double") / 100.0)
                        / F.col("n_cust")
                    )
                    * 100
                    + 0.5
                )
                / 100.0
            ).alias("cum_ltv_per_cust"),
        )
    )


@register(
    "win_interpurchase",
    oracle="""
WITH gaps AS (
  SELECT o_custkey,
         CAST(date_diff('day',
              lag(o_orderdate) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey),
              o_orderdate) AS BIGINT) AS gap_days
  FROM orders
)
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n_gaps,
       floor((CAST(sum(gap_days) AS DOUBLE) / count(*)) * 100 + 0.5) / 100.0 AS avg_gap_days,
       CAST(max(gap_days) AS BIGINT) AS max_gap_days
FROM gaps WHERE gap_days IS NOT NULL
GROUP BY 1
""",
)
def win_interpurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTER-PURCHASE intervals per customer (average and maximum days
    between consecutive orders) — the churn-model feature and the
    empirical basis of RFM's recency threshold (a customer 3x past
    their OWN average gap is lapsing; a global cutoff misses that).

    One lag() over each customer's order timeline (single exchange,
    (date, orderkey) tiebreak), integer day arithmetic, one float
    division half-up rounded."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gap = F.datediff("o_orderdate", F.lag("o_orderdate").over(w)).cast("long")
    g = o.select("o_custkey", gap.alias("gap_days")).filter(
        F.col("gap_days").isNotNull()
    )
    return g.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        (
            F.floor(
                (F.sum("gap_days").cast("double") / F.count(F.lit(1))) * 100 + 0.5
            )
            / 100.0
        ).alias("avg_gap_days"),
        F.max("gap_days").cast("long").alias("max_gap_days"),
    )


@register(
    "win_fulfillment_latency",
    oracle="""
WITH lat AS (
  SELECT o.o_orderpriority,
         CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT) AS days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       floor((CAST(sum(days) AS DOUBLE) / count(*)) * 100 + 0.5) / 100.0 AS avg_days,
       round(quantile_cont(CAST(days AS DOUBLE), 0.50), 4) AS p50_days,
       round(quantile_cont(CAST(days AS DOUBLE), 0.95), 4) AS p95_days,
       CAST(max(days) AS BIGINT) AS max_days
FROM lat GROUP BY 1
""",
)
def win_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULFILLMENT LATENCY SLA report: order-to-ship days per priority
    class with mean / p50 / p95 / max — the ops dashboard that answers
    'does URGENT actually ship faster?'.  Exact interpolated percentiles
    (the ``agg_quantile``-pinned Spark percentile == DuckDB
    quantile_cont equivalence); integer day arithmetic everywhere else.

    One key join (orderkey) and one aggregate; at 100 TB the exact
    percentile's per-group value vector swaps for approx_percentile —
    the shape is unchanged."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").cast("long").alias("days"),
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (
            F.floor((F.sum("days").cast("double") / F.count(F.lit(1))) * 100 + 0.5)
            / 100.0
        ).alias("avg_days"),
        F.round(F.expr("percentile(cast(days as double), 0.50)"), 4).alias(
            "p50_days"
        ),
        F.round(F.expr("percentile(cast(days as double), 0.95)"), 4).alias(
            "p95_days"
        ),
        F.max("days").cast("long").alias("max_days"),
    )


@register(
    "win_bounce_rate",
    oracle=f"""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                   - lag(CAST(floor(epoch(ts)) AS BIGINT), 1,
                         CAST(floor(epoch(ts)) AS BIGINT) - {1800} - 1)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > {1800}
              THEN 1 ELSE 0 END AS is_new
  FROM events
), sess AS (
  SELECT user_id,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
  FROM marked
), sizes AS (
  SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_events
  FROM sess GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
       floor((CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
              / count(*)) * 1000000 + 0.5) / 1000000.0 AS bounce_rate,
       floor((CAST(sum(n_events) AS DOUBLE) / count(*)) * 10000 + 0.5)
         / 10000.0 AS avg_events_per_session
FROM sizes
""",
)
def win_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION KPI rollup: bounce rate (single-event sessions / all
    sessions) and average session depth — the two numbers a web
    dashboard leads with, derived from the same 30-minute-gap
    sessionization ``win_sessionize`` constructs (this op aggregates
    where that one assigns ids).

    The running is_new sum over the per-user timeline assigns session
    ids exactly as win_sessionize does; one user_id exchange serves the
    lag and the running sum, and the KPIs are a 1-row reduction."""
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.floor(F.unix_timestamp("ts")).cast("long")
    gap = epoch - F.lag(epoch, 1, None).over(w)
    is_new = F.when(
        gap.isNull() | (gap > _SESSION_GAP_SEC), 1
    ).otherwise(0)
    marked = events.select(
        "user_id",
        "ts",
        "event_id",
        is_new.alias("is_new"),
    )
    sid = F.sum("is_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sizes = (
        marked.select("user_id", sid.alias("sid"))
        .groupBy("user_id", "sid")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    bounce = F.when(F.col("n_events") == 1, 1).otherwise(0)
    return sizes.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(bounce).cast("long").alias("n_bounces"),
        (
            F.floor(
                (F.sum(bounce).cast("double") / F.count(F.lit(1))) * 1000000 + 0.5
            )
            / 1000000.0
        ).alias("bounce_rate"),
        (
            F.floor(
                (F.sum("n_events").cast("double") / F.count(F.lit(1))) * 10000
                + 0.5
            )
            / 10000.0
        ).alias("avg_events_per_session"),
    )


_JOURNEY_LEN = 5
_JOURNEY_TOP_K = 20


@register(
    "ext_top_journeys",
    oracle=f"""
WITH j AS (
  SELECT user_id,
         array_to_string(
           (list(event_type ORDER BY ts, event_id))[1:{_JOURNEY_LEN}], '>')
           AS journey
  FROM events GROUP BY 1
)
SELECT journey, CAST(count(*) AS BIGINT) AS n_users
FROM j GROUP BY 1
ORDER BY n_users DESC, journey
LIMIT {_JOURNEY_TOP_K}
""",
)
def ext_top_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP USER JOURNEYS: the {k} most common first-{n}-event type
    sequences — the product-analytics path report (``win_funnel`` tests
    ONE hypothesized path; this surfaces which paths actually happen,
    and ``ext_event_transitions`` is its order-1 Markov summary).

    Per-user sequences build as ONE sorted struct collect inside the
    user aggregate (deterministic (ts, event_id) order — never a
    per-row window), sliced to {n} and joined to a string; the journey
    groupBy is map-side combined and the top-{k} is a
    TakeOrderedAndProject heap.  Per-user state is bounded by the
    slice, output by the heap."""
    ev = table(spark, sf_dir, "events")
    j = ev.groupBy("user_id").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s.getField("event_type"),
                ),
                1,
                _JOURNEY_LEN,
            ),
            ">",
        ).alias("journey")
    )
    return (
        j.groupBy("journey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy(F.desc("n_users"), "journey")
        .limit(_JOURNEY_TOP_K)
    )


ext_top_journeys.__doc__ = ext_top_journeys.__doc__.format(
    k=_JOURNEY_TOP_K, n=_JOURNEY_LEN
)


@register(
    "win_activity_streak",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
isl AS (
  SELECT user_id,
         d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                  AS INTEGER) AS island
  FROM days
),
streaks AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS len
  FROM isl GROUP BY user_id, island
),
longest AS (
  SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak
  FROM streaks GROUP BY 1
)
SELECT longest_streak, CAST(count(*) AS BIGINT) AS n_users
FROM longest GROUP BY 1 ORDER BY 1
""",
)
def win_activity_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LONGEST ACTIVITY STREAK census: consecutive-active-day runs per
    user via GAPS-AND-ISLANDS (date minus per-user day rank is constant
    within a run), reported as the longest-streak histogram — the
    engagement metric behind every "N-day streak" product surface and
    the DAU-quality cut a flat DAU count hides.

    Scale shape: the per-user window runs on the DISTINCT (user, day)
    grain — rows per user bounded by the calendar span, never by event
    volume — then two map-side-combined aggregates collapse islands to
    streaks to the |distinct-lengths|-row census."""
    ev = table(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.select(
        "user_id",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("island"),
    )
    streaks = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).cast("long").alias("len")
    )
    longest = streaks.groupBy("user_id").agg(
        F.max("len").cast("long").alias("longest_streak")
    )
    return (
        longest.groupBy("longest_streak")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("longest_streak")
    )
