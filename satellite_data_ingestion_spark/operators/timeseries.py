"""Cadence gap-fill: the reference's 15-minute slot timeline as analytics.

The reference advances a slot clock in fixed 15-minute steps and records
one product per slot (``sources/meteosat.py:88-93``); a missing catalog
hit leaves a silent hole in the timeline.  The analytical form of that
contract: materialize the FULL slot grid, mark the holes, and carry the
last observation forward — the standard time-series densification every
monitoring/training-feature pipeline needs.

Scale shape: the grid is generated per key with ``sequence`` + ``explode``
(shuffle-free generate — never a driver-side loop or a cartesian node),
observations aggregate with one (key, slot) shuffle, and the forward fill
is one window over the same key, ordered by slot.  Grid size is
(keys × slots), independent of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_DAY_LO = "2024-01-02 00:00:00"
_DAY_HI = "2024-01-03 00:00:00"  # exclusive
_LAST_SLOT = "2024-01-02 23:45:00"
_SLOT_SEC = 900  # 15 minutes, the reference's cadence


@register(
    "ext_gap_fill",
    oracle=f"""
WITH ev AS (
  SELECT event_type, time_bucket(INTERVAL 15 MINUTE, ts) AS slot, value
  FROM events
  WHERE ts >= TIMESTAMP '{_DAY_LO}' AND ts < TIMESTAMP '{_DAY_HI}'
),
observed AS (
  SELECT event_type, slot, count(*) AS cnt, avg(value) AS avg_value
  FROM ev GROUP BY event_type, slot
),
grid AS (
  SELECT t.event_type, g.slot
  FROM (SELECT DISTINCT event_type FROM ev) t
  CROSS JOIN (
    SELECT unnest(generate_series(TIMESTAMP '{_DAY_LO}',
                                  TIMESTAMP '{_LAST_SLOT}',
                                  INTERVAL 15 MINUTE)) AS slot
  ) g
)
SELECT g.event_type, g.slot,
       CAST(coalesce(o.cnt, 0) AS BIGINT) AS n_events,
       round(last_value(o.avg_value IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.slot
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS filled_value,
       (o.cnt IS NULL) AS is_gap
FROM grid g LEFT JOIN observed o USING (event_type, slot)
ORDER BY event_type, slot
""",
)
def ext_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One day of events densified onto the 15-minute slot grid per
    event type: every slot present, holes flagged, last observed value
    carried forward.

    The slot key is epoch-floored (``floor(epoch/900)*900`` — integer
    math, identical to DuckDB's ``time_bucket`` since both origins sit on
    a 15-minute boundary).  The grid is ``explode(sequence(...))`` per
    key — a generate, not a cartesian — and the fill is
    ``last(ignorenulls)`` over (key, slot-order) with an unbounded-
    preceding frame."""
    ev = (
        table(spark, sf_dir, "events")
        .filter(
            (F.col("ts") >= F.to_timestamp(F.lit(_DAY_LO)))
            & (F.col("ts") < F.to_timestamp(F.lit(_DAY_HI)))
        )
        .select(
            "event_type",
            F.timestamp_seconds(
                F.floor(F.unix_timestamp("ts") / _SLOT_SEC) * _SLOT_SEC
            ).alias("slot"),
            "value",
        )
    )
    observed = ev.groupBy("event_type", "slot").agg(
        F.count(F.lit(1)).alias("cnt"), F.avg("value").alias("avg_value")
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(
                F.sequence(
                    F.to_timestamp(F.lit(_DAY_LO)),
                    F.to_timestamp(F.lit(_LAST_SLOT)),
                    F.expr("INTERVAL 15 MINUTES"),
                )
            ).alias("slot"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(observed, ["event_type", "slot"], "left")
        .select(
            "event_type",
            "slot",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("n_events"),
            F.round(F.last("avg_value", ignorenulls=True).over(w), 6).alias(
                "filled_value"
            ),
            F.col("cnt").isNull().alias("is_gap"),
        )
        .orderBy("event_type", "slot")
    )
