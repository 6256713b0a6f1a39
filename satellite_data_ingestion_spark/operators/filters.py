"""Projection / filter / predicate operators (SURVEY.md §2.2).

Each query re-expresses one predicate shape from the reference pipeline:
time-window containment (``sources/meteosat.py:106-109``), normalized-key
equality (``sources/meteosat.py:111-120``), spatial bbox clip
(``utils/conversion.py:22-37``), null/existence guards
(``sources/meteosat.py:98-103``), result caps (``utils/eumdacapi.py:36``)
and time ordering (``utils/eumdacapi.py:37``).

All predicates are plain Catalyst expressions → pushed into the parquet
scan (visible as PushedFilters in .explain), so at 100 TB they prune
row groups before any bytes are decoded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import events_in_range, table
from ..registry import register

# Africa bounding box from the reference (sources/meteosat.py:36).
_BBOX = (-25.36, -34.82, 63.50, 37.34)  # xmin, ymin, xmax, ymax


@register(
    "project_bands",
    oracle="""
SELECT vec_id,
       CAST(embedding[1] AS DOUBLE) AS band1,
       CAST(embedding[2] AS DOUBLE) AS band2,
       CAST(embedding[3] AS DOUBLE) AS band3,
       label
FROM embeddings
""",
)
def project_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band selection: project declared channels out of an array column.

    Mirrors the reference exporting only `export_bands` per composite
    (sources/meteosat.py:180-185); `element_at` on an array column is a
    pure projection — no shuffle, column-pruned at the scan.
    """
    emb = table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("band1"),
        F.element_at("embedding", 2).cast("double").alias("band2"),
        F.element_at("embedding", 3).cast("double").alias("band3"),
        "label",
    )


@register(
    "project_compute",
    oracle="""
SELECT o_orderkey,
       'band1_' || o_orderstatus || '_' || strftime(o_orderdate, '%Y-%m-%d') AS out_name,
       round(o_totalprice * 0.8, 2) AS discounted
FROM orders
""",
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed projection: derived filename/date-string columns, the
    relational form of the reference's output-name construction
    (sources/meteosat.py:161-165,182)."""
    orders = table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.concat(
            F.lit("band1_"),
            F.col("o_orderstatus"),
            F.lit("_"),
            F.date_format("o_orderdate", "yyyy-MM-dd"),
        ).alias("out_name"),
        F.round(F.col("o_totalprice") * 0.8, 2).alias("discounted"),
    )


@register(
    "filter_time_window",
    oracle="""
SELECT event_id, ts, user_id, event_type, value
FROM events
WHERE ts BETWEEN TIMESTAMP '2024-01-15 11:30:00' AND TIMESTAMP '2024-01-15 12:30:00'
""",
)
def filter_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """±30 min interval-containment predicate around a target slot — the
    catalog availability window (sources/meteosat.py:106-109).  Routed
    through :func:`events_in_range` so the bounds land on the raw nanos
    column and reach the parquet scan (PushedFilters) → row-group pruning
    on ts statistics at scale."""
    ev = events_in_range(
        spark, sf_dir, "2024-01-15 11:30:00", "2024-01-15 12:30:00"
    )
    return ev.select("event_id", "ts", "user_id", "event_type", "value")


@register(
    "filter_exact_ts",
    oracle="""
SELECT event_id, user_id, value
FROM events
WHERE date_trunc('minute', ts) =
      (SELECT date_trunc('minute', min(ts)) FROM events)
""",
)
def filter_exact_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point predicate on a minute-normalized key: the reference picks the
    one product whose minute-truncated date equals the target slot
    (sources/meteosat.py:111-120; normalization utils/eumdacapi.py:56-58).
    The 1-row target side is broadcast — no shuffle of the probe side."""
    ev = table(spark, sf_dir, "events")
    target = ev.agg(F.date_trunc("minute", F.min("ts")).alias("target_min"))
    return (
        ev.join(
            F.broadcast(target),
            F.date_trunc("minute", F.col("ts")) == F.col("target_min"),
        )
        .select("event_id", "user_id", "value")
    )


@register(
    "filter_bbox",
    oracle=f"""
SELECT l_orderkey, l_linenumber,
       CAST((l_partkey % 360) - 180.0 AS DOUBLE) AS lon,
       CAST((l_suppkey % 180) - 90.0 AS DOUBLE)  AS lat
FROM lineitem
WHERE CAST((l_partkey % 360) - 180.0 AS DOUBLE) BETWEEN {_BBOX[0]} AND {_BBOX[2]}
  AND CAST((l_suppkey % 180) - 90.0 AS DOUBLE)  BETWEEN {_BBOX[1]} AND {_BBOX[3]}
""",
)
def filter_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D spatial range predicate — the Africa bbox clip
    (utils/conversion.py:22-37, extent sources/meteosat.py:36) on a
    long-form grid.  Unlike the reference (which resamples the whole world
    then crops), the filter sits below any aggregation in the plan —
    Catalyst keeps it at the scan."""
    li = table(spark, sf_dir, "lineitem")
    lon = (F.col("l_partkey") % 360) - F.lit(180.0)
    lat = (F.col("l_suppkey") % 180) - F.lit(90.0)
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            lon.alias("lon"),
            lat.alias("lat"),
        )
        .filter(
            F.col("lon").between(_BBOX[0], _BBOX[2])
            & F.col("lat").between(_BBOX[1], _BBOX[3])
        )
    )


@register(
    "filter_null_skip",
    oracle="""
SELECT event_id, event_type, value
FROM events
WHERE nullif(event_type, 'error') IS NOT NULL AND value IS NOT NULL
""",
)
def filter_null_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence/null guard — the reference's skip-when-absent branches
    (sources/meteosat.py:98-103,180)."""
    ev = table(spark, sf_dir, "events")
    return ev.select("event_id", "event_type", "value").filter(
        F.expr("nullif(event_type, 'error')").isNotNull()
        & F.col("value").isNotNull()
    )


@register(
    "limit_topn",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic top-N (total order with key tie-break) — the catalog
    page cap `c=100` + first-match early exit (utils/eumdacapi.py:36,
    sources/meteosat.py:116-120).  Spark plans TakeOrderedAndProject:
    per-partition heaps, no global sort."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "sort_by_time",
    oracle="""
SELECT event_id, ts
FROM events
ORDER BY ts, event_id
LIMIT 100
""",
)
def sort_by_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-ordered scan (server-side `sort=start,time,0`,
    utils/eumdacapi.py:37), capped so the ordering is observable in the
    order-insensitive hash."""
    ev = table(spark, sf_dir, "events")
    return ev.select("event_id", "ts").orderBy("ts", "event_id").limit(100)
