"""Aggregation operators (SURVEY.md §2.4).

The reference's only aggregation is the resample of source pixels onto a
0.035° lat/lon grid (``utils/conversion.py:15-17`` — every pixel is bucketed
into a target cell).  ``agg_grid_resample`` re-expresses that as a cell-key
``groupBy``; the rest of the family is the general hash-aggregate surface a
100 TB engine needs (partial/map-side combine comes free from Catalyst).

Scale notes: all groupBys here shuffle on low-cardinality keys with
map-side partial aggregation, so shuffled bytes ≈ (#groups × #partitions),
independent of input row count.  ``approx_count_distinct`` (HLL++) is the
100 TB path for distinct counts — fixed-size sketches merge without
holding the key set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

# Flagship: TPC-H-Q1-shaped pricing summary.  Exercises scan → filter
# (pushed to parquet) → project → hash agg (partial+final) → sort in one
# query; the time predicate mirrors the reference's interval-bounded
# catalog search (sources/meteosat.py:106-109).
_Q1_CUTOFF = "1998-09-02 00:00:00"


@register(
    "agg_hash_group",
    oracle=f"""
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2)                                        AS sum_qty,
  round(sum(l_extendedprice), 2)                                   AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
  round(avg(l_quantity), 4)                                        AS avg_qty,
  round(avg(l_extendedprice), 4)                                   AS avg_price,
  round(avg(l_discount), 4)                                        AS avg_disc,
  count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
""",
)
def agg_hash_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key hash aggregate (flagship pricing summary).

    Catalyst plans this as parquet scan (filter + column pruning pushed
    down) → partial hash agg → single shuffle on 2 low-cardinality keys →
    final hash agg.  At 100 TB the shuffle carries only #groups rows per
    map task.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit(_Q1_CUTOFF)))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# The reference's resample: bucket every (lon, lat) source pixel into a
# 0.035° grid cell and aggregate per cell (utils/conversion.py:15-17).
# Synthetic long-form grid derived from lineitem numerics; the bbox-clip
# analog (sources/meteosat.py:36) composes with filter_bbox.
_GRID_RES = 0.035


@register(
    "agg_grid_resample",
    oracle=f"""
SELECT
  CAST(floor(((l_extendedprice % 360.0) - 180.0 + 180.0) / {_GRID_RES}) AS BIGINT) AS cell_x,
  CAST(floor(((l_quantity * 3.5) % 180.0 - 90.0 + 90.0) / {_GRID_RES}) AS BIGINT)  AS cell_y,
  count(*)                        AS n_px,
  round(avg(l_discount), 4)       AS mean_val
FROM lineitem
GROUP BY 1, 2
""",
)
def agg_grid_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid binning — the Spark form of the reference's kd-tree resample.

    Exact nearest-neighbor resampling is not a groupBy; the oracle-checkable
    form is cell binning: derive a cell key with floor((coord+off)/res) and
    aggregate per cell.  One shuffle on the composite cell key; at 100 TB
    the grid has a bounded ~53M cells (10286×5143) so the reduce side is
    fixed-size regardless of input rows.
    """
    li = table(spark, sf_dir, "lineitem")
    lon = (F.col("l_extendedprice") % F.lit(360.0)) - F.lit(180.0)
    lat = (F.col("l_quantity") * F.lit(3.5)) % F.lit(180.0) - F.lit(90.0)
    return (
        li.select(
            F.floor((lon + F.lit(180.0)) / F.lit(_GRID_RES)).alias("cell_x"),
            F.floor((lat + F.lit(90.0)) / F.lit(_GRID_RES)).alias("cell_y"),
            "l_discount",
        )
        .groupBy("cell_x", "cell_y")
        .agg(
            F.count(F.lit(1)).alias("n_px"),
            F.round(F.avg("l_discount"), 4).alias("mean_val"),
        )
    )


@register(
    "agg_distinct",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expands to a two-phase agg under AQE)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@register("agg_approx_distinct")  # approximate → rows-only check
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate count-distinct — the 100 TB distinct-count path.

    Fixed-size sketch per group merges associatively across partitions; no
    key-set shuffle.  Approximate by construction → no SQL oracle
    (BASELINE.json's 100 TB mandate; rsd 1%).
    """
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_rollup_cube",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*)                  AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def agg_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical grouping-sets aggregate (rollup)."""
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_collect",
    oracle="""
SELECT o_orderstatus,
       array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities
FROM orders
GROUP BY o_orderstatus
""",
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set collection per group — analog of the reference's per-composite
    band lists (sources/meteosat.py:20-23).  Normalized with sort_array +
    array_join so the result is order-stable for the hash oracle.
    """
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderpriority")), ",").alias("priorities")
    )
