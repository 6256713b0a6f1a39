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

from pyspark.sql import DataFrame, SparkSession, Window
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


_NN_RES = 0.5      # target cell size (deg)
_NN_BBOX = 10.0    # clip region [0, 10) x [0, 10)
_NN_TILE = 2.5     # spatial tile per applyInPandas group — 16 tiles, so the
                   # kernel parallelizes; tile size trades task count against
                   # halo replication (~(1 + 2*halo/tile)^2 copies per point)
_NN_HALO = 2.0     # halo width: must exceed the max NN distance (measured
                   # 0.845 at sf0.001, 0.282 at sf0.01 — 2.0 is >2x margin)
_NN_CELLS = int(_NN_BBOX / _NN_RES)
_NN_TILES = int(_NN_BBOX / _NN_TILE)
_CELLS_PER_TILE = int(_NN_TILE / _NN_RES)


@register(
    "agg_grid_resample_nn",
    oracle=f"""
WITH pts AS (
  SELECT l_orderkey * 100 + l_linenumber AS pt_id,
         l_discount AS val,
         l_extendedprice % 60.0 AS px,
         (l_quantity * 3.5) % 40.0 AS py
  FROM lineitem
  WHERE l_extendedprice % 60.0 < {_NN_BBOX}
    AND (l_quantity * 3.5) % 40.0 < {_NN_BBOX}
),
cells AS (
  SELECT gx.g AS cell_x, gy.g AS cell_y,
         (gx.g + 0.5) * {_NN_RES} AS cx, (gy.g + 0.5) * {_NN_RES} AS cy
  FROM generate_series(0, {_NN_CELLS - 1}) gx(g),
       generate_series(0, {_NN_CELLS - 1}) gy(g)
)
SELECT cell_x, cell_y, pt_id AS nn_pt, val AS nn_val
FROM (
  SELECT c.cell_x, c.cell_y, p.pt_id, p.val,
         row_number() OVER (
           PARTITION BY c.cell_x, c.cell_y
           ORDER BY (c.cx - p.px) * (c.cx - p.px)
                  + (c.cy - p.py) * (c.cy - p.py),
                    p.pt_id) AS rn
  FROM cells c, pts p
)
WHERE rn = 1
""",
)
def agg_grid_resample_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT nearest-neighbor grid resample — the kd-tree semantics of the
    reference (utils/conversion.py:17), distributed via spatial tiling +
    halo replication (the pandas_udf variant promised in SURVEY.md §4).

    Each point lands in its own 5-degree tile plus any tile within the
    2-degree halo (explode over the covered tile range); each tile's
    applyInPandas kernel brute-forces NN from its OWNED 0.5-degree cell
    centers to its local+halo points with vectorized numpy.  Results are
    exact whenever every cell's true NN lies within the halo — guaranteed
    here by measured density (max NN dist 0.845 << 2.0), and tunable:
    at production density the halo shrinks with the expected NN radius.
    Scale: work per tile is |cells/tile| x |local points|; no global
    shuffle beyond the one tile-key exchange; kernel cost is Arrow-batched
    numpy, not per-row Python.  Clip-before-resample (the bbox filter
    precedes everything) — strictly better than the reference's
    resample-then-clip (SURVEY.md §4)."""
    import numpy as np
    import pandas as pd

    li = table(spark, sf_dir, "lineitem")
    px = F.col("l_extendedprice") % F.lit(60.0)
    py = (F.col("l_quantity") * F.lit(3.5)) % F.lit(40.0)
    pts = li.select(
        (F.col("l_orderkey") * 100 + F.col("l_linenumber")).alias("pt_id"),
        F.col("l_discount").alias("val"),
        px.alias("px"),
        py.alias("py"),
    ).filter((F.col("px") < _NN_BBOX) & (F.col("py") < _NN_BBOX))

    def tile_range(coord):
        lo = F.greatest(
            F.lit(0), F.floor((coord - _NN_HALO) / _NN_TILE).cast("int")
        )
        hi = F.least(
            F.lit(_NN_TILES - 1), F.floor((coord + _NN_HALO) / _NN_TILE).cast("int")
        )
        return F.sequence(lo, hi)

    replicated = (
        pts.withColumn("tx", F.explode(tile_range(F.col("px"))))
        .withColumn("ty", F.explode(tile_range(F.col("py"))))
    )

    def nn_kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = key
        pdf = pdf.sort_values("pt_id")  # argmin tie-break = lowest pt_id
        pxs = pdf["px"].to_numpy(dtype=np.float64)
        pys = pdf["py"].to_numpy(dtype=np.float64)
        gx0, gy0 = tx * _CELLS_PER_TILE, ty * _CELLS_PER_TILE
        gx = np.arange(gx0, gx0 + _CELLS_PER_TILE)
        gy = np.arange(gy0, gy0 + _CELLS_PER_TILE)
        cell_x, cell_y = [g.ravel() for g in np.meshgrid(gx, gy, indexing="ij")]
        cx = (cell_x + 0.5) * _NN_RES
        cy = (cell_y + 0.5) * _NN_RES
        dx = cx[:, None] - pxs[None, :]
        dy = cy[:, None] - pys[None, :]
        idx = np.argmin(dx * dx + dy * dy, axis=1)
        return pd.DataFrame(
            {
                "cell_x": cell_x,
                "cell_y": cell_y,
                "nn_pt": pdf["pt_id"].to_numpy()[idx],
                "nn_val": pdf["val"].to_numpy()[idx],
            }
        )

    return replicated.groupBy("tx", "ty").applyInPandas(
        nn_kernel, schema="cell_x long, cell_y long, nn_pt long, nn_val double"
    )


@register("agg_hll_merge")  # sketch estimates are approximate → rows-only
def agg_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-day HLL sketches of distinct users,
    union-merged into a running total WITHOUT rescanning history — the
    datasketches pattern that makes incremental distinct-count rollups
    possible at 100 TB (store tiny daily sketches, merge on demand;
    never re-aggregate raw events).  Emits per-day exact vs sketch
    estimates plus the merged all-time estimate on every row for
    self-check."""
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.withColumn("day", F.to_date("ts"))
        .groupBy("day")
        .agg(
            F.hll_sketch_agg("user_id").alias("sketch"),
            F.countDistinct("user_id").alias("exact_distinct"),
        )
    )
    merged = daily.agg(
        F.round(F.hll_sketch_estimate(F.hll_union_agg("sketch"))).alias(
            "alltime_estimate"
        )
    )
    return (
        daily.select(
            "day",
            "exact_distinct",
            F.round(F.hll_sketch_estimate("sketch")).alias("day_estimate"),
        )
        .join(F.broadcast(merged))
        .orderBy("day")
    )


_PIVOT_TYPES = ["signup", "purchase", "error", "click", "view"]


@register(
    "agg_pivot",
    oracle="""
SELECT user_id,
       count(*) FILTER (event_type = 'signup')   AS signup,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'error')    AS error,
       count(*) FILTER (event_type = 'click')    AS click,
       count(*) FILTER (event_type = 'view')     AS view
FROM events
GROUP BY user_id
""",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): per-user event counts, one column per event
    type.  The pivot values are DECLARED, not discovered — passing the
    list skips the extra distinct-scan Spark otherwise runs, and at 100 TB
    an undeclared pivot on a high-cardinality column is a schema
    explosion.  Plans as a single hash aggregate with one count per
    declared value (same shape as the oracle's FILTER clauses)."""
    ev = table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", _PIVOT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _PIVOT_TYPES)
    )
    return out


@register(
    "agg_min_max_by",
    oracle="""
SELECT o_orderstatus,
       min_by(o_orderkey, o_totalprice) AS cheapest_order,
       max_by(o_orderkey, o_totalprice) AS priciest_order,
       round(min(o_totalprice), 2)      AS min_price,
       round(max(o_totalprice), 2)      AS max_price
FROM orders
GROUP BY o_orderstatus
""",
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmin/argmax aggregation (min_by / max_by): the order carrying the
    extreme price per status, in ONE aggregation pass — the pattern that
    replaces a window-rank + filter when only the extreme row's key is
    needed (one shuffle, no sort).  o_totalprice values are distinct reals
    in this corpus, so the argmin/argmax are well-defined for the oracle."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@register(
    "agg_stats",
    oracle="""
SELECT l_returnflag,
       round(stddev_samp(l_extendedprice), 4) AS price_stddev,
       round(var_samp(l_quantity), 4)         AS qty_var,
       round(corr(l_quantity, l_extendedprice), 6)      AS qty_price_corr,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per group: sample stddev/variance and
    correlation/covariance between quantity and price.  All four are
    single-pass mergeable moments (sum, sum-of-squares, co-moments) —
    the same partial/final shape as sum/avg, so one shuffle regardless
    of group size; no sort, no second pass."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covar"
        ),
    )


_HIST_BINS = 10
_HIST_LO, _HIST_HI = 0.0, 100.0


@register(
    "agg_histogram",
    oracle=f"""
SELECT CASE WHEN value < {_HIST_LO} THEN 0
            WHEN value >= {_HIST_HI} THEN {_HIST_BINS + 1}
            ELSE CAST(floor((value - {_HIST_LO})
                            / (({_HIST_HI} - {_HIST_LO}) / {_HIST_BINS})) AS BIGINT) + 1
       END AS bucket,
       count(*) AS n,
       round(min(value), 4) AS lo,
       round(max(value), 4) AS hi
FROM events
GROUP BY 1
""",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin histogram via width_bucket: 10 equal bins over [0, 100)
    with underflow (0) and overflow (11) buckets.  Binning is a scan-side
    projection; the aggregate shuffles only #buckets rows per partition —
    the constant-memory distribution sketch for dashboards at any scale
    (vs exact quantiles, which need the value multiset)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.select(
            F.width_bucket("value", F.lit(_HIST_LO), F.lit(_HIST_HI), F.lit(_HIST_BINS))
            .cast("long")
            .alias("bucket"),
            "value",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
        )
    )


@register(
    "agg_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY gid, l_returnflag, l_linestatus
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — arbitrary set lists, not just the
    rollup/cube lattices (`agg_rollup_cube`): here each dimension alone
    plus the grand total, skipping the (flag, status) cross.  One
    Expand + single aggregation pass (rows are replicated per set
    map-side, so the shuffle is sets × rows but still one exchange);
    grouping_id disambiguates which set produced each row — same bit
    convention both engines."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n_rows")
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


@register(
    "agg_mode",
    oracle="""
SELECT user_bucket, event_type AS mode_type, cnt AS mode_count
FROM (
  SELECT user_bucket, event_type, cnt,
         row_number() OVER (PARTITION BY user_bucket
                            ORDER BY cnt DESC, event_type) AS rn
  FROM (
    SELECT CAST(user_id % 20 AS BIGINT) AS user_bucket, event_type,
           count(*) AS cnt
    FROM events
    GROUP BY user_id % 20, event_type
  )
)
WHERE rn = 1
ORDER BY user_bucket
""",
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode (most frequent value) with a DETERMINISTIC tie-break
    (higher count, then lexicographic value) — the built-in `mode()` of
    either engine leaves ties unspecified, so it can never hash-match
    across engines; the explicit count → rank → filter form can.

    Scale shape: count aggregate shuffles once on (group, value); the
    rank-then-filter plans a WindowGroupLimit over groups whose
    cardinality is |values| per group, not row count."""
    ev = table(spark, sf_dir, "events")
    counted = (
        ev.groupBy(
            (F.col("user_id") % 20).cast("long").alias("user_bucket"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("user_bucket").orderBy(
        F.desc("cnt"), F.asc("event_type")
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_bucket",
            F.col("event_type").alias("mode_type"),
            F.col("cnt").alias("mode_count"),
        )
        .orderBy("user_bucket")
    )


@register(
    "agg_stats_moments",
    oracle="""
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6)        AS qty_price_corr,
       round(covar_samp(l_quantity, l_extendedprice), 2)  AS qty_price_covar,
       round(stddev_samp(l_quantity), 6)                  AS qty_stddev,
       round(var_samp(l_extendedprice), 2)                AS price_var
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-moment aggregates per group: Pearson correlation,
    sample covariance, sample stddev/variance — the data-profiling
    bundle (feature QA, drift checks) over the fact table.

    All four are single-pass algebraic aggregates in Spark (Welford-style
    partial moments merged associatively), so the shuffle carries one
    fixed-width moment tuple per (partition, group) — the same map-side
    partial shape as sum/count, scale-safe by construction.  Values hash
    against DuckDB's identical sample-moment definitions, rounded to
    absorb summation-order float noise."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_corr"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "qty_price_covar"
        ),
        F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
        F.round(F.var_samp("l_extendedprice"), 2).alias("price_var"),
    )


@register(
    "agg_conditional",
    oracle="""
SELECT l_returnflag,
       CAST(count_if(l_quantity >= 25) AS BIGINT)       AS n_bulk,
       CAST(count_if(l_discount = 0) AS BIGINT)         AS n_undiscounted,
       bool_and(l_quantity > 0)                         AS all_positive,
       bool_or(l_tax > 0.07)                            AS any_high_tax,
       round(sum(CASE WHEN l_discount >= 0.05
                      THEN l_extendedprice END), 2)     AS discounted_revenue
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregate bundle per group: count_if, bool_and /
    bool_or (the every/any quantifiers), and a filtered sum — the
    assert-style data-quality checks ("all rows positive?", "any
    outlier?") expressed as one aggregation pass.  All algebraic:
    fixed-width partial state per (partition, group), map-side
    combined, one key shuffle."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_quantity") >= 25).alias("n_bulk"),
        F.count_if(F.col("l_discount") == 0).alias("n_undiscounted"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
        F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
        F.round(
            F.sum(
                F.when(F.col("l_discount") >= 0.05, F.col("l_extendedprice"))
            ),
            2,
        ).alias("discounted_revenue"),
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
SELECT strftime(ts, '%Y-%m-%d')          AS day,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY strftime(ts, '%Y-%m-%d')
UNION ALL
SELECT 'TOTAL' AS day,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
""",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counts via bitmap aggregates — the
    rollup-friendly alternative to approx HLL when ids fit an integer
    domain: per (day, bitmap bucket) a ``bitmap_construct_agg`` packs
    the day's user ids into a 4 KB bitmap, per-day counts sum
    ``bitmap_count`` over buckets, and the ALL-TIME distinct comes from
    ``bitmap_or_agg`` MERGING the stored day bitmaps — no rescan of
    history, and unlike HLL the answer is exact.  Bucketing by
    ``bitmap_bucket_number`` is what keeps it exact: positions repeat
    across buckets, so the bucket id must be part of the merge key.

    At 100 TB: daily bitmap segments live beside the fact table
    (bytes per active-id-range per day); the total/backfill rollup is a
    bucket-keyed OR over segments — the same maintenance shape as
    ``agg_hll_merge`` with exactness instead of a 2% error bar."""
    ev = table(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    )
    segments = ev.groupBy(
        "day", F.expr("bitmap_bucket_number(user_id)").alias("bucket")
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm")
    )
    per_day = (
        segments.groupBy("day", "bucket")
        .agg(F.expr("bitmap_count(bitmap_or_agg(bm))").alias("c"))
        .groupBy("day")
        .agg(F.sum("c").cast("long").alias("n_users"))
    )
    total = (
        segments.groupBy("bucket")
        .agg(F.expr("bitmap_count(bitmap_or_agg(bm))").alias("c"))
        .agg(
            F.lit("TOTAL").alias("day"),
            F.sum("c").cast("long").alias("n_users"),
        )
    )
    return per_day.unionByName(total)


@register(
    "agg_cohort_retention",
    oracle="""
WITH fs AS (
  SELECT user_id, date_trunc('week', min(ts)) AS w0
  FROM events GROUP BY user_id
),
act AS (
  SELECT DISTINCT e.user_id, fs.w0, date_trunc('week', e.ts) AS w
  FROM events e JOIN fs USING (user_id)
)
SELECT CAST(w0 AS DATE) AS cohort_week,
       CAST(floor(date_diff('day', w0, w) / 7) AS BIGINT) AS week_offset,
       count(*) AS n_active
FROM act GROUP BY 1, 2
""",
)
def agg_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen week, one
    cell per (cohort_week, week_offset) counting members active that
    week — the standard growth-analytics readout.

    Two map-side-combinable aggregations and one join: the first-seen
    pass reduces events to one row per user (the small side — broadcast
    at this scale, shuffle-join on user_id at 100 TB where both sides
    are user-keyed and co-partition), and the distinct activity pass is
    keyed by (user, week) so the triangle itself is tiny (cohorts ×
    offsets).  No window functions — retention is pure aggregation."""
    ev = table(spark, sf_dir, "events").select("user_id", "ts")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("w0")
    )
    act = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id", "w0", F.date_trunc("week", F.col("ts")).alias("w")
        )
        .distinct()
    )
    return act.groupBy(
        F.to_date("w0").alias("cohort_week"),
        (F.datediff(F.to_date("w"), F.to_date("w0")) / 7)
        .cast("long")
        .alias("week_offset"),
    ).agg(F.count(F.lit(1)).alias("n_active"))


@register(
    "agg_rolling_distinct",
    oracle="""
WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
SELECT day,
       (SELECT count(DISTINCT user_id) FROM events e
        WHERE CAST(e.ts AS DATE) = d.day)                    AS dau,
       (SELECT count(DISTINCT user_id) FROM events e
        WHERE CAST(e.ts AS DATE) BETWEEN d.day - 6 AND d.day) AS dau7
FROM d
""",
)
def agg_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING DISTINCT counts (daily actives + trailing-7-day actives)
    — the retention-dashboard staple that plain windows cannot express
    (COUNT(DISTINCT) is not a supported window function, and
    collect_set-over-window buffers every member).  Exact, via the
    mergeable-bitmap idiom: per (day, user-bucket) 64-bit bitmaps from
    one grouped aggregate, densified onto the day x bucket grid, then a
    RANGE window ORs each bucket's trailing week and bitmap_count sums
    per day.

    Scale shape: the events table shuffles ONCE (to day x bucket
    bitmaps — output bounded by the grid, not by events); everything
    after operates on grid-sized bitmap rows (days x users/64), which
    is the same state HLL sketches would hold but EXACT, and the
    rolling union never rescans history (``agg_bitmap_distinct``'s
    maintenance argument, extended to sliding windows).  Densification
    matters for correctness: a bucket silent on day d still owes day d
    its earlier-window members — the left join carries them (undercount
    otherwise, caught in development at sf0.01)."""
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
        )
        .selectExpr("day", "user_id div 64 as b", "pmod(user_id, 64) as pos")
        .groupBy("day", "b")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    grid = daily.select("day").distinct().crossJoin(
        daily.select("b").distinct()
    )
    dense = grid.join(daily, ["day", "b"], "left")
    w = (
        Window.partitionBy("b")
        .orderBy(F.col("day").cast("timestamp").cast("long"))
        .rangeBetween(-6 * 86400, 0)
    )
    rolled = dense.withColumn("bm7", F.expr("bitmap_or_agg(bm)").over(w))
    return rolled.groupBy("day").agg(
        F.sum(
            F.coalesce(F.expr("bitmap_count(bm)"), F.lit(0))
        ).alias("dau"),
        F.sum(
            F.coalesce(F.expr("bitmap_count(bm7)"), F.lit(0))
        ).alias("dau7"),
    )


_CI_Z = 1.959963984540054  # two-sided 95% normal quantile


@register(
    "agg_ratio_ci",
    oracle=f"""
WITH g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) FILTER (WHERE value >= 50) AS BIGINT) AS k
  FROM events GROUP BY event_type
)
SELECT event_type, n, k,
       round(CAST(k AS DOUBLE) / n, 6) AS rate,
       round((k / CAST(n AS DOUBLE) + {_CI_Z} * {_CI_Z} / (2 * n)
              - {_CI_Z} * sqrt((k / CAST(n AS DOUBLE)) * (1 - k / CAST(n AS DOUBLE)) / n
                               + {_CI_Z} * {_CI_Z} / (4.0 * n * n)))
             / (1 + {_CI_Z} * {_CI_Z} / n), 6) AS ci_lo,
       round((k / CAST(n AS DOUBLE) + {_CI_Z} * {_CI_Z} / (2 * n)
              + {_CI_Z} * sqrt((k / CAST(n AS DOUBLE)) * (1 - k / CAST(n AS DOUBLE)) / n
                               + {_CI_Z} * {_CI_Z} / (4.0 * n * n)))
             / (1 + {_CI_Z} * {_CI_Z} / n), 6) AS ci_hi
FROM g
""",
)
def agg_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RATE WITH WILSON 95% CONFIDENCE INTERVAL per group — the A/B /
    data-quality staple (the Wald interval collapses at extreme rates
    or small n; Wilson stays inside [0, 1] and is the standard
    recommendation).  Conversion here = events with value >= 50.

    One grouped aggregate (count + conditional count — map-side
    combined), then the closed-form interval as a codegen projection
    over the group-cardinality-sized result: statistics cost nothing
    beyond the count pass at any scale.  Both engines evaluate the
    identical double expression; the 6-decimal round masks libm sqrt
    ulp differences (the fn_haversine stance)."""
    ev = table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("value") >= 50, 1)).alias("k"),
    )
    z = _CI_Z
    p = F.col("k") / F.col("n").cast("double")
    n = F.col("n").cast("double")
    center = p + z * z / (2 * n)
    margin = z * F.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))
    denom = 1 + z * z / n
    return g.select(
        "event_type",
        "n",
        "k",
        F.round(p, 6).alias("rate"),
        F.round((center - margin) / denom, 6).alias("ci_lo"),
        F.round((center + margin) / denom, 6).alias("ci_hi"),
    )


@register(
    "agg_gini",
    oracle="""
WITH r AS (
  SELECT o_orderpriority, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS rk,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
)
SELECT o_orderpriority,
       CAST(max(n) AS BIGINT) AS n_orders,
       round(2.0 * sum(rk * o_totalprice)
             / (max(n) * sum(o_totalprice))
             - (max(n) + 1.0) / max(n), 6) AS gini
FROM r
GROUP BY o_orderpriority
""",
)
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GINI COEFFICIENT of order value per priority class — the
    inequality/concentration measure behind revenue-concentration and
    data-mixture-balance audits, via the rank formula
    ``G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n`` over ascending values.
    Ties are rank-order-insensitive (equal values commute inside the
    weighted sum), so the row_number tie-break affects nothing — the
    formula is hash-stable by construction.

    One partition-key exchange serves the ranking window and the final
    aggregate (same key); per-group state is the sort, spillable at
    any group size."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    r = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("o_orderpriority")).alias("n"),
    )
    return r.groupBy("o_orderpriority").agg(
        F.max("n").alias("n_orders"),
        F.round(
            2.0 * F.sum(F.col("rk") * F.col("o_totalprice"))
            / (F.max("n") * F.sum("o_totalprice"))
            - (F.max("n") + 1.0) / F.max("n"),
            6,
        ).alias("gini"),
    )


@register(
    "agg_entropy",
    oracle="""
WITH c AS (
  SELECT user_id, event_type, CAST(count(*) AS DOUBLE) AS cnt
  FROM events GROUP BY user_id, event_type
), t AS (
  SELECT user_id, sum(cnt) AS total, count(*) AS n_types FROM c GROUP BY user_id
)
SELECT c.user_id,
       CAST(max(t.n_types) AS BIGINT) AS n_types,
       round(-sum((c.cnt / t.total) * ln(c.cnt / t.total)), 6) AS entropy
FROM c JOIN t USING (user_id)
GROUP BY c.user_id
""",
)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHANNON ENTROPY of each user's event-type distribution — the
    behavioral-diversity feature (bots spike one type → entropy ~0;
    uniform browsers approach ln(k)), and the same statistic quality
    pipelines compute over token/language distributions.

    Two chained aggregates on the SAME leading key (user_id): counts
    per (user, type), totals per user, then the plug-in estimator
    ``-sum(p ln p)`` as a codegen projection — the second shuffle
    carries only group-cardinality rows.  Natural log on both engines;
    6-decimal rounding masks libm ulps (the fn_haversine stance)."""
    ev = table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("double").alias("cnt")
    )
    t = c.groupBy("user_id").agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_types")
    )
    p = F.col("cnt") / F.col("total")
    return (
        c.join(t, "user_id")
        .groupBy("user_id")
        .agg(
            F.max("n_types").alias("n_types"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
        )
    )


@register(
    "agg_ab_test",
    oracle="""
WITH g AS (
  SELECT event_type, CAST(user_id % 2 AS BIGINT) AS cohort,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv,
         CAST(sum(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS ssq
  FROM events GROUP BY 1, 2
), w AS (
  SELECT a.event_type,
         a.n AS n_a, b.n AS n_b,
         (CAST(a.sv AS DOUBLE) / 100.0) / a.n AS m_a,
         (CAST(b.sv AS DOUBLE) / 100.0) / b.n AS m_b,
         (CAST(a.ssq AS DOUBLE) / 10000.0
          - a.n * (((CAST(a.sv AS DOUBLE) / 100.0) / a.n)
                   * ((CAST(a.sv AS DOUBLE) / 100.0) / a.n))) / (a.n - 1) AS v_a,
         (CAST(b.ssq AS DOUBLE) / 10000.0
          - b.n * (((CAST(b.sv AS DOUBLE) / 100.0) / b.n)
                   * ((CAST(b.sv AS DOUBLE) / 100.0) / b.n))) / (b.n - 1) AS v_b
  FROM g a JOIN g b ON a.event_type = b.event_type
  WHERE a.cohort = 0 AND b.cohort = 1
)
SELECT event_type, n_a, n_b,
       floor(m_a * 10000 + 0.5) / 10000.0 AS mean_a,
       floor(m_b * 10000 + 0.5) / 10000.0 AS mean_b,
       floor(((m_a - m_b) / sqrt(v_a / n_a + v_b / n_b)) * 10000 + 0.5)
         / 10000.0 AS z_stat,
       abs((m_a - m_b) / sqrt(v_a / n_a + v_b / n_b)) > 1.96 AS significant
FROM w
""",
)
def agg_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample A/B significance per metric (Welch's z on per-cohort
    means — the experimentation-platform primitive): users split into
    cohorts by ``user_id % 2`` (a deterministic hash bucket in real
    deployments), per-event-type means compared with the unequal-variance
    z statistic and a 5% two-sided gate.

    Determinism discipline: count / sum / sum-of-squares accumulate EXACT
    integer cents (squares of <=2e4-cent values stay far inside int64 at
    these row counts; at 100 TB promote ssq to double or sum in two
    tiers), so both engines derive identical doubles; the z arithmetic is
    written in one shared operation order and rounded half-up explicitly.

    Scale shape: ONE map-side-combined aggregate to |types| x 2 rows;
    the self-join that pairs cohorts runs on that tiny frame, never on
    the fact table.  Null-variance degenerate groups (n = 1) would
    propagate null z — the events table guarantees n >> 1 per cell."""
    events = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    g = events.groupBy(
        "event_type", (F.col("user_id") % 2).cast("long").alias("cohort")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(cents).cast("long").alias("sv"),
        F.sum(cents * cents).cast("long").alias("ssq"),
    )
    a = g.filter(F.col("cohort") == 0).select(
        "event_type",
        F.col("n").alias("n_a"),
        F.col("sv").alias("sv_a"),
        F.col("ssq").alias("ssq_a"),
    )
    b = g.filter(F.col("cohort") == 1).select(
        "event_type",
        F.col("n").alias("n_b"),
        F.col("sv").alias("sv_b"),
        F.col("ssq").alias("ssq_b"),
    )

    def mean(sv, n):
        return (sv.cast("double") / 100.0) / n

    def var(ssq, sv, n):
        m = mean(sv, n)
        return (ssq.cast("double") / 10000.0 - n * (m * m)) / (n - 1)

    j = a.join(b, "event_type")
    m_a = mean(F.col("sv_a"), F.col("n_a"))
    m_b = mean(F.col("sv_b"), F.col("n_b"))
    v_a = var(F.col("ssq_a"), F.col("sv_a"), F.col("n_a"))
    v_b = var(F.col("ssq_b"), F.col("sv_b"), F.col("n_b"))
    z = (m_a - m_b) / F.sqrt(v_a / F.col("n_a") + v_b / F.col("n_b"))

    def r4(x):
        return F.floor(x * 10000 + 0.5) / 10000.0

    return j.select(
        "event_type",
        "n_a",
        "n_b",
        r4(m_a).alias("mean_a"),
        r4(m_b).alias("mean_b"),
        r4(z).alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant"),
    )


@register(
    "agg_benford",
    oracle="""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders WHERE o_totalprice > 0
), c AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM d GROUP BY 1
), n AS (
  SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM c
)
SELECT c.digit, c.n_obs,
       floor((CAST(c.n_obs AS DOUBLE) / n.n_total) * 1000000 + 0.5) / 1000000.0 AS obs_frac,
       floor((ln(1 + 1.0 / c.digit) / ln(10.0)) * 1000000 + 0.5) / 1000000.0 AS exp_frac,
       floor(((CAST(c.n_obs AS DOUBLE) - n.n_total * (ln(1 + 1.0 / c.digit) / ln(10.0)))
              * (CAST(c.n_obs AS DOUBLE) - n.n_total * (ln(1 + 1.0 / c.digit) / ln(10.0)))
              / (n.n_total * (ln(1 + 1.0 / c.digit) / ln(10.0)))) * 10000 + 0.5) / 10000.0 AS chi2_term
FROM c CROSS JOIN n
""",
)
def agg_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENFORD'S LAW audit on order totals: observed vs expected
    leading-digit frequencies (P(d) = log10(1 + 1/d)) with per-digit
    chi-square contributions — the forensic-accounting screen for
    fabricated or systematically-generated numbers (synthetic TPC-H
    prices are exactly such a population, so the deviations here are
    the point, not a bug).

    Determinism: the leading digit comes from the INTEGER part's string
    (floor → bigint → first char) — never from floor(log10(x)), whose
    libm rounding at exact powers of ten differs across engines.  All
    per-digit terms are functions of exact integer counts; no
    cross-digit float sum exists in the output.

    Scale shape: one map-side-combined 9-group aggregate + a 1-row
    total broadcast."""
    orders = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digit = F.substring(
        F.floor("o_totalprice").cast("long").cast("string"), 1, 1
    ).cast("long")
    c = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs")
    )
    n = c.agg(F.sum("n_obs").cast("long").alias("n_total"))
    exp_p = F.log(1 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    dev = F.col("n_obs").cast("double") - F.col("n_total") * exp_p

    def r(x, scale):
        return F.floor(x * scale + 0.5) / float(scale)

    return c.join(F.broadcast(n)).select(
        "digit",
        "n_obs",
        r(F.col("n_obs").cast("double") / F.col("n_total"), 1000000).alias(
            "obs_frac"
        ),
        r(exp_p, 1000000).alias("exp_frac"),
        r(dev * dev / (F.col("n_total") * exp_p), 10000).alias("chi2_term"),
    )


_UNPIVOT_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@register(
    "agg_unpivot",
    oracle="\nUNION ALL\n".join(
        f"""
SELECT '{m}' AS measure,
       CAST(count({m}) AS BIGINT) AS n,
       CAST(sum(CAST(round({m} * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       round(min({m}), 2) AS lo,
       round(max({m}), 2) AS hi
FROM lineitem"""
        for m in _UNPIVOT_MEASURES
    ),
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long, the inverse of ``agg_pivot``): the four
    lineitem measure columns melt into (measure, val) rows, then one
    aggregate summarizes each measure — the reshape every
    metrics-warehouse ingestion does when a source delivers one column
    per KPI.  Uses the native ``DataFrame.unpivot`` (Spark's melt), which
    plans as an Expand node — each input row fans out to |measures| rows
    IN the scan stage, no join, no shuffle before the aggregate.

    Exact integer-cent sums (the float-sum-order discipline); the
    oracle states the same per-measure aggregates directly — value
    equality proves the melt lost nothing."""
    li = table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=_UNPIVOT_MEASURES,
        variableColumnName="measure",
        valueColumnName="val",
    )
    return long.groupBy("measure").agg(
        F.count("val").cast("long").alias("n"),
        F.sum(F.round(F.col("val") * 100).cast("long")).cast("long").alias("sum_cents"),
        F.round(F.min("val"), 2).alias("lo"),
        F.round(F.max("val"), 2).alias("hi"),
    )


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@register(
    "agg_corr_matrix",
    oracle="\nUNION ALL\n".join(
        f"""
SELECT '{a}' AS col_a, '{b}' AS col_b,
       round(corr({a}, {b}), 6) AS r
FROM lineitem"""
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1:]
    ),
)
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise CORRELATION MATRIX over the lineitem measures (the
    feature-engineering screen for redundant columns before a model or
    a compression decision) — extends the single-pair
    ``agg_stats_moments`` to the full upper triangle.

    All six correlations compute in ONE aggregate pass (Spark evaluates
    the six corr() accumulators side by side in a single
    map-side-combined HashAggregate — one scan, not six); the result is
    a 6-row reshape of a 1-row frame.  Same cross-engine float posture
    agg_stats_moments pinned: corr's normalized ratio is stable to 6
    decimals across accumulation orders."""
    li = table(spark, sf_dir, "lineitem")
    pairs = [
        (a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1:]
    ]
    one = li.agg(
        *[
            F.round(F.corr(a, b), 6).alias(f"r_{i}")
            for i, (a, b) in enumerate(pairs)
        ]
    )
    stack_expr = "stack({}, {}) as (col_a, col_b, r)".format(
        len(pairs),
        ", ".join(f"'{a}', '{b}', r_{i}" for i, (a, b) in enumerate(pairs)),
    )
    return one.select(F.expr(stack_expr))


@register(
    "agg_weighted_median",
    oracle="""
WITH w AS (
  SELECT l_returnflag, l_extendedprice AS v,
         CAST(l_quantity AS DOUBLE) AS wt,
         sum(l_quantity) OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
         sum(l_quantity) OVER (PARTITION BY l_returnflag) AS totw
  FROM lineitem
)
SELECT l_returnflag,
       round(min(v), 2) AS weighted_median,
       round(CAST(min(totw) AS DOUBLE), 1) AS total_weight
FROM w
WHERE cumw >= totw / 2
GROUP BY l_returnflag
""",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED median per group — the first value whose cumulative
    weight crosses half the group total (here: the quantity-weighted
    median price — 'the price at which half the UNITS, not half the
    ROWS, trade').  Spark has no built-in weighted percentile; the
    window-cumulative formulation IS the standard distributed algorithm.

    One exchange on the group key serves the ordered cumulative-weight
    window and the total; the crossing row is an aggregate (min over
    the qualifying suffix), not a second window.  Deterministic
    ordering ties broken by (orderkey, linenumber); quantities are
    integral doubles, so the cumulative sums are exact."""
    li = table(spark, sf_dir, "lineitem")
    ord_w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    w = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.sum("l_quantity")
        .over(ord_w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cumw"),
        F.sum("l_quantity")
        .over(Window.partitionBy("l_returnflag"))
        .alias("totw"),
    )
    return (
        w.filter(F.col("cumw") >= F.col("totw") / 2)
        .groupBy("l_returnflag")
        .agg(
            F.round(F.min("v"), 2).alias("weighted_median"),
            F.round(F.min("totw").cast("double"), 1).alias("total_weight"),
        )
    )


@register(
    "agg_share_of_parent",
    oracle="""
WITH n AS (
  SELECT r.r_name, n.n_name,
         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
)
SELECT r_name, n_name,
       floor((CAST(rev_cents AS DOUBLE) / 100.0) * 100 + 0.5) / 100.0 AS revenue,
       floor((CAST(rev_cents AS DOUBLE)
              / sum(rev_cents) OVER (PARTITION BY r_name)) * 1000000 + 0.5)
         / 1000000.0 AS share_of_region,
       floor((CAST(rev_cents AS DOUBLE)
              / sum(rev_cents) OVER ()) * 1000000 + 0.5)
         / 1000000.0 AS share_of_total
FROM n
""",
)
def agg_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHARE-OF-PARENT hierarchy ratios (the drill-down every OLAP
    dashboard renders): each nation's revenue as a fraction of its
    region and of the world — two window normalizations over the SAME
    nation-grain aggregate, so the hierarchy math costs nothing beyond
    the base rollup.  Exact-cent sums; the global-share window runs on
    the |nations|-row aggregate (25 rows), where an unpartitioned window
    is harmless — never on facts."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(cents).cast("long").alias("rev_cents"))
    )
    region_w = Window.partitionBy("r_name")
    total_w = Window.partitionBy()

    def rr(x, scale):
        return F.floor(x * scale + 0.5) / float(scale)

    return base.select(
        "r_name",
        "n_name",
        rr(F.col("rev_cents").cast("double") / 100.0, 100).alias("revenue"),
        rr(
            F.col("rev_cents").cast("double") / F.sum("rev_cents").over(region_w),
            1000000,
        ).alias("share_of_region"),
        rr(
            F.col("rev_cents").cast("double") / F.sum("rev_cents").over(total_w),
            1000000,
        ).alias("share_of_total"),
    )


_RFM_REF_EPOCH = 1009843200  # 2002-01-01 UTC — fixed "now" for recency


@register(
    "agg_rfm_segments",
    oracle=f"""
WITH rfm AS (
  SELECT o_custkey,
         CAST({_RFM_REF_EPOCH} - epoch(max(o_orderdate)) AS BIGINT) AS recency_sec,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
  FROM orders GROUP BY 1
), scored AS (
  SELECT o_custkey, recency_sec, frequency, monetary_cents,
         CAST(6 - ntile(5) OVER (ORDER BY recency_sec, o_custkey) AS BIGINT) AS r_score,
         CAST(ntile(5) OVER (ORDER BY frequency, o_custkey) AS BIGINT) AS f_score,
         CAST(ntile(5) OVER (ORDER BY monetary_cents, o_custkey) AS BIGINT) AS m_score
  FROM rfm
)
SELECT r_score, f_score, m_score,
       CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
            WHEN r_score >= 4 AND f_score <= 2 THEN 'new'
            WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
            WHEN r_score <= 2 AND m_score <= 2 THEN 'hibernating'
            ELSE 'regular' END AS segment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(monetary_cents) AS BIGINT) AS segment_value_cents
FROM scored
GROUP BY 1, 2, 3, 4
""",
)
def agg_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM SEGMENTATION (recency / frequency / monetary — the classic
    customer-value taxonomy): per-customer metrics quintile-scored with
    deterministic ntile (custkey tiebreak, fixed reference date — no
    now()), then bucketed into named segments with per-segment value.

    Scale shape: one groupBy to customer grain, then three DISTRIBUTED
    exact ntile passes over the |customers|-row aggregate — a bare
    ``ntile(5) OVER (ORDER BY ...)`` would be a single-task WindowExec,
    so each score uses ``ranking.distributed_rank`` (range-partitioned
    local ranks + broadcast prefix offsets) with the SQL-standard ntile
    computed from the exact global rank.  Output is
    |segment-combination|-sized."""
    from .ranking import distributed_rank, ntile_from_rank

    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    rfm = o.groupBy("o_custkey").agg(
        (F.lit(_RFM_REF_EPOCH) - F.unix_timestamp(F.max("o_orderdate")))
        .cast("long")
        .alias("recency_sec"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(cents).cast("long").alias("monetary_cents"),
    )

    def ntile5(metric: str, out: str) -> DataFrame:
        rk = distributed_rank(rfm.select("o_custkey", metric), [metric, "o_custkey"])
        return rk.select(
            "o_custkey",
            ntile_from_rank(5, F.col("_rk"), F.col("_n_total")).alias(out),
        )

    scored = (
        rfm.select("o_custkey", "monetary_cents")
        .join(ntile5("recency_sec", "r_raw"), "o_custkey")
        .join(ntile5("frequency", "f_score"), "o_custkey")
        .join(ntile5("monetary_cents", "m_score"), "o_custkey")
        .select(
            "monetary_cents",
            (6 - F.col("r_raw")).cast("long").alias("r_score"),
            "f_score",
            "m_score",
        )
    )
    seg = (
        F.when(
            (F.col("r_score") >= 4) & (F.col("f_score") >= 4) & (F.col("m_score") >= 4),
            "champion",
        )
        .when((F.col("r_score") >= 4) & (F.col("f_score") <= 2), "new")
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 4), "at_risk")
        .when((F.col("r_score") <= 2) & (F.col("m_score") <= 2), "hibernating")
        .otherwise("regular")
    )
    return (
        scored.withColumn("segment", seg)
        .groupBy("r_score", "f_score", "m_score", "segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("monetary_cents").cast("long").alias("segment_value_cents"),
        )
    )


_RULE_MIN_SUPPORT = 10
_RULE_TOP_K = 50


@register(
    "agg_association_rules",
    oracle=f"""
WITH b AS (
  SELECT DISTINCT l_orderkey, l_partkey % 100 AS item
  FROM lineitem
), n AS (
  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_baskets FROM b
), item_n AS (
  SELECT item, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1
), pair_n AS (
  SELECT x.item AS item_a, y.item AS item_b, CAST(count(*) AS BIGINT) AS both_cnt
  FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey AND x.item < y.item
  GROUP BY 1, 2
)
SELECT item_a, item_b, both_cnt,
       floor((CAST(p.both_cnt AS DOUBLE) / ia.cnt) * 1000000 + 0.5) / 1000000.0 AS confidence,
       floor(((CAST(p.both_cnt AS DOUBLE) * n.n_baskets)
              / (CAST(ia.cnt AS DOUBLE) * ib.cnt)) * 1000000 + 0.5) / 1000000.0 AS lift
FROM pair_n p
JOIN item_n ia ON p.item_a = ia.item
JOIN item_n ib ON p.item_b = ib.item
CROSS JOIN n
WHERE p.both_cnt >= {_RULE_MIN_SUPPORT}
ORDER BY floor(((CAST(p.both_cnt AS DOUBLE) * n.n_baskets)
              / (CAST(ia.cnt AS DOUBLE) * ib.cnt)) * 1000000 + 0.5) / 1000000.0 DESC,
         item_a, item_b
LIMIT {_RULE_TOP_K}
""",
)
def agg_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MARKET-BASKET association rules (Apriori's scoring stage):
    support / confidence / lift for item pairs co-occurring in an order
    — items bucketed to part%100 classes so baskets hold comparable
    item sets.  Lift > 1 = genuinely associated, the
    recommendation-rule screen.

    Scale discipline: pairs generate ONLY inside a basket (orders hold
    ~4 lines → ≤6 pairs each — transaction-bounded, never catalog²),
    the DISTINCT rail stops line-multiplicity inflation, item marginals
    broadcast onto the pair table, and the top-k by lift is
    TakeOrderedAndProject.  Exact integer counts; one explicit half-up
    rounded ratio per score."""
    li = table(spark, sf_dir, "lineitem")
    b = li.select(
        "l_orderkey", (F.col("l_partkey") % 100).alias("item")
    ).distinct()
    n = b.agg(F.countDistinct("l_orderkey").cast("long").alias("n_baskets"))
    item_n = b.groupBy("item").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    x = b.select("l_orderkey", F.col("item").alias("item_a"))
    y = b.select("l_orderkey", F.col("item").alias("item_b"))
    pair_n = (
        x.join(y, "l_orderkey")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("both_cnt"))
        .filter(F.col("both_cnt") >= _RULE_MIN_SUPPORT)
    )
    ia = item_n.select(F.col("item").alias("item_a"), F.col("cnt").alias("cnt_a"))
    ib = item_n.select(F.col("item").alias("item_b"), F.col("cnt").alias("cnt_b"))

    def r6(xcol):
        return F.floor(xcol * 1000000 + 0.5) / 1000000.0

    conf = F.col("both_cnt").cast("double") / F.col("cnt_a")
    lift = (F.col("both_cnt").cast("double") * F.col("n_baskets")) / (
        F.col("cnt_a").cast("double") * F.col("cnt_b")
    )
    return (
        pair_n.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .join(F.broadcast(n))
        .select(
            "item_a",
            "item_b",
            "both_cnt",
            r6(conf).alias("confidence"),
            r6(lift).alias("lift"),
        )
        .orderBy(F.desc("lift"), "item_a", "item_b")
        .limit(_RULE_TOP_K)
    )


@register(
    "agg_pareto",
    oracle="""
WITH cust AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
  FROM orders GROUP BY 1
), ranked AS (
  SELECT o_custkey, rev,
         CAST(row_number() OVER (ORDER BY rev DESC, o_custkey) AS BIGINT) AS rk,
         CAST(sum(rev) OVER (ORDER BY rev DESC, o_custkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(sum(rev) OVER () AS BIGINT) AS tot,
         CAST(count(*) OVER () AS BIGINT) AS n_cust
FROM cust
)
SELECT CAST(min(CASE WHEN cum >= tot * 0.8 THEN rk END) AS BIGINT) AS n_for_80pct,
       CAST(min(n_cust) AS BIGINT) AS n_customers,
       floor((CAST(min(CASE WHEN cum >= tot * 0.8 THEN rk END) AS DOUBLE)
              / min(n_cust)) * 1000000 + 0.5) / 1000000.0 AS frac_for_80pct,
       floor((CAST(max(CASE WHEN rk * 10 <= n_cust THEN cum END) AS DOUBLE)
              / min(tot)) * 1000000 + 0.5) / 1000000.0 AS top_decile_share
FROM ranked
""",
)
def agg_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARETO concentration analysis (the 80/20 audit): how many
    customers cover 80% of revenue, what fraction of the base that is,
    and the top decile's revenue share — the concentration numbers
    behind account tiering and risk reviews (its statistical twin
    ``agg_gini`` reports the same inequality as one coefficient).

    One groupBy to customer grain, then the revenue-descending rank AND
    cumulative sum come from ``ranking.distributed_rank`` over the
    |customers|-row aggregate — range-partitioned local ranks/cumsums
    plus broadcast prefix offsets, never a single-task unpartitioned
    window (|customers| is unbounded at 100 TB).  Exact-cent integers
    until the two final ratios."""
    from .ranking import distributed_rank

    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    cust = o.groupBy("o_custkey").agg(F.sum(cents).cast("long").alias("rev"))
    ranked = distributed_rank(
        cust, [F.desc("rev"), "o_custkey"], sum_cols=("rev",)
    ).select(
        F.col("_rk").alias("rk"),
        F.col("_cum_rev").cast("long").alias("cum"),
        F.col("_tot_rev").cast("long").alias("tot"),
        F.col("_n_total").alias("n_cust"),
    )

    def r6(x):
        return F.floor(x * 1000000 + 0.5) / 1000000.0

    return ranked.agg(
        F.min(F.when(F.col("cum") >= F.col("tot") * 0.8, F.col("rk")))
        .cast("long")
        .alias("n_for_80pct"),
        F.min("n_cust").cast("long").alias("n_customers"),
        r6(
            F.min(
                F.when(F.col("cum") >= F.col("tot") * 0.8, F.col("rk"))
            ).cast("double")
            / F.min("n_cust")
        ).alias("frac_for_80pct"),
        r6(
            F.max(
                F.when(F.col("rk") * 10 <= F.col("n_cust"), F.col("cum"))
            ).cast("double")
            / F.min("tot")
        ).alias("top_decile_share"),
    )


@register(
    "agg_chi2_independence",
    oracle="""
WITH obs AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS o FROM documents GROUP BY 1, 2
), rm AS (
  SELECT lang, CAST(sum(o) AS BIGINT) AS rn FROM obs GROUP BY 1
), cm AS (
  SELECT source, CAST(sum(o) AS BIGINT) AS cn FROM obs GROUP BY 1
), n AS (
  SELECT CAST(sum(o) AS BIGINT) AS tot FROM obs
)
SELECT obs.lang, obs.source, obs.o,
       floor(((CAST(rm.rn AS DOUBLE) * cm.cn) / n.tot) * 10000 + 0.5) / 10000.0 AS expected,
       floor(((CAST(obs.o AS DOUBLE) - (CAST(rm.rn AS DOUBLE) * cm.cn) / n.tot)
              * (CAST(obs.o AS DOUBLE) - (CAST(rm.rn AS DOUBLE) * cm.cn) / n.tot)
              / ((CAST(rm.rn AS DOUBLE) * cm.cn) / n.tot)) * 1000000 + 0.5)
         / 1000000.0 AS chi2_term
FROM obs JOIN rm ON obs.lang = rm.lang
JOIN cm ON obs.source = cm.source
CROSS JOIN n
""",
)
def agg_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHI-SQUARE INDEPENDENCE test cells for the lang × source
    contingency table: observed counts, independence-expected counts
    (row·col/total), and per-cell chi-square contributions — the EDA
    screen for 'is language correlated with source?' (a skewed cell =
    a scraping or labeling artifact worth investigating before mixture
    weights are chosen).  Per-cell output keeps the statistic
    float-sum-free: the total chi2 and dof are one trivial reduction
    the consumer can do, while each cell's term is a pure function of
    exact integer counts.

    One map-side-combined groupBy on the pair; marginals derive from
    that same aggregate and broadcast back onto the |langs|×|sources|
    cell table."""
    docs = table(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("o")
        # Lazy localCheckpoint, not persist(): no unpersist site exists in
        # a lazily-returned frame, and the CacheManager would pin the
        # blocks for the whole session (the ext_kl_divergence pattern).
    ).localCheckpoint(eager=False)
    rm = obs.groupBy("lang").agg(F.sum("o").cast("long").alias("rn"))
    cm = obs.groupBy("source").agg(F.sum("o").cast("long").alias("cn"))
    n = obs.agg(F.sum("o").cast("long").alias("tot"))
    exp = (F.col("rn").cast("double") * F.col("cn")) / F.col("tot")
    dev = F.col("o").cast("double") - exp

    def r(x, scale):
        return F.floor(x * scale + 0.5) / float(scale)

    return (
        obs.join(F.broadcast(rm), "lang")
        .join(F.broadcast(cm), "source")
        .join(F.broadcast(n))
        .select(
            "lang",
            "source",
            "o",
            r(exp, 10000).alias("expected"),
            r(dev * dev / exp, 1000000).alias("chi2_term"),
        )
    )


@register(
    "agg_abc_analysis",
    oracle="""
WITH part_rev AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev
  FROM lineitem GROUP BY 1
), ranked AS (
  SELECT l_partkey, rev,
         CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(sum(rev) OVER () AS BIGINT) AS tot
  FROM part_rev
), classed AS (
  SELECT l_partkey, rev,
         CASE WHEN cum <= tot * 0.8 THEN 'A'
              WHEN cum <= tot * 0.95 THEN 'B'
              ELSE 'C' END AS abc_class
  FROM ranked
)
SELECT abc_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(rev) AS BIGINT) AS class_rev_cents,
       floor((CAST(sum(rev) AS DOUBLE) / min(t.tot)) * 1000000 + 0.5)
         / 1000000.0 AS rev_share
FROM classed CROSS JOIN (SELECT CAST(sum(rev) AS BIGINT) AS tot FROM part_rev) t
GROUP BY abc_class
""",
)
def agg_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC INVENTORY CLASSIFICATION (the operational form of the Pareto
    audit ``agg_pareto``): parts bucketed by cumulative revenue share —
    A carries the first 80%, B to 95%, C the tail — with per-class
    counts and shares, the stock-policy segmentation every supply chain
    runs.

    The cumulative sum runs over the part-grain aggregate (catalog-
    sized, never facts) via ``ranking.distributed_rank`` — |parts| is
    still millions at 100 TB, so no single-task unpartitioned window;
    exact-cent integers until the single share ratio."""
    from .ranking import distributed_rank

    li = table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    part_rev = li.groupBy("l_partkey").agg(F.sum(cents).cast("long").alias("rev"))
    ranked = distributed_rank(
        part_rev, [F.desc("rev"), "l_partkey"], sum_cols=("rev",)
    ).select(
        "l_partkey",
        "rev",
        F.col("_cum_rev").cast("long").alias("cum"),
        F.col("_tot_rev").cast("long").alias("tot"),
    )
    abc = (
        F.when(F.col("cum") <= F.col("tot") * 0.8, "A")
        .when(F.col("cum") <= F.col("tot") * 0.95, "B")
        .otherwise("C")
    )
    return (
        ranked.withColumn("abc_class", abc)
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("rev").cast("long").alias("class_rev_cents"),
            (
                F.floor(
                    (F.sum("rev").cast("double") / F.min("tot")) * 1000000 + 0.5
                )
                / 1000000.0
            ).alias("rev_share"),
        )
    )


@register(
    "agg_histogram_log10",
    oracle="""
WITH b AS (
  SELECT length(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)) AS digits,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_totalprice > 0
)
SELECT CAST(digits AS BIGINT) AS digits,
       CAST(count(*) AS BIGINT) AS n,
       floor((CAST(min(cents) AS DOUBLE) / 100.0) * 100 + 0.5) / 100.0 AS lo,
       floor((CAST(max(cents) AS DOUBLE) / 100.0) * 100 + 0.5) / 100.0 AS hi
FROM b GROUP BY 1
""",
)
def agg_histogram_log10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOG-SCALE (order-of-magnitude) histogram for heavy-tailed values:
    bucket = decimal digit count of the integer cents — power-of-ten
    bins where the linear ``agg_histogram`` wastes all its buckets on
    the head and ``agg_histogram_equidepth`` hides the tail's SHAPE.
    The digit count is INTEGER-EXACT in both engines (string length of
    an exact int), dodging the floor(log10(x)) libm edge that
    ``agg_benford`` documents.

    One projection + one map-side-combined ≤19-group aggregate."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    b = o.select(
        F.length(cents.cast("string")).cast("long").alias("digits"),
        cents.alias("cents"),
    )

    def r2(x):
        return F.floor(x * 100 + 0.5) / 100.0

    return b.groupBy("digits").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        r2(F.min("cents").cast("double") / 100.0).alias("lo"),
        r2(F.max("cents").cast("double") / 100.0).alias("hi"),
    )


@register(
    "agg_hhi",
    oracle="""
WITH m AS (
  SELECT CAST(p_partkey % 50 AS BIGINT) AS market,
         l_suppkey,
         CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
), s AS (
  SELECT market,
         CAST(sum(cnt * cnt) AS BIGINT) AS ssq,
         CAST(sum(cnt) AS BIGINT) AS tot,
         CAST(count(*) AS BIGINT) AS n_suppliers
  FROM m GROUP BY 1
)
SELECT market, n_suppliers,
       floor((10000.0 * ssq / (CAST(tot AS DOUBLE) * tot)) * 100 + 0.5) / 100.0 AS hhi
FROM s
""",
)
def agg_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HERFINDAHL-HIRSCHMAN concentration INDEX per market (part
    class): HHI = 10000 · Σ share² — the antitrust/market-structure
    metric completing the inequality family (``agg_gini`` = dispersion,
    ``agg_pareto`` = cumulative concentration, HHI = the regulator's
    single number; >2500 = highly concentrated).

    Fully integer-exact until one final division: Σ cnt² and (Σ cnt)²
    are exact int64 sums over supplier line counts, so the index is
    deterministic with no float-sum hazard.  Two map-side-combined
    aggregates, output |markets| rows."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    m = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            (F.col("p_partkey") % 50).cast("long").alias("market"),
            "l_suppkey",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    s = m.groupBy("market").agg(
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("ssq"),
        F.sum("cnt").cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
    )
    return s.select(
        "market",
        "n_suppliers",
        (
            F.floor(
                (10000.0 * F.col("ssq") / (F.col("tot").cast("double") * F.col("tot")))
                * 100
                + 0.5
            )
            / 100.0
        ).alias("hhi"),
    )


@register(
    "agg_cramers_v",
    oracle="""
WITH obs AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS o FROM documents GROUP BY 1, 2
), rm AS (
  SELECT lang, CAST(sum(o) AS BIGINT) AS rn FROM obs GROUP BY 1
), cm AS (
  SELECT source, CAST(sum(o) AS BIGINT) AS cn FROM obs GROUP BY 1
), n AS (
  SELECT CAST(sum(o) AS BIGINT) AS tot FROM obs
), terms AS (
  SELECT obs.lang, obs.source,
         (CAST(obs.o AS DOUBLE) - (CAST(rm.rn AS DOUBLE) * cm.cn) / n.tot)
         * (CAST(obs.o AS DOUBLE) - (CAST(rm.rn AS DOUBLE) * cm.cn) / n.tot)
         / ((CAST(rm.rn AS DOUBLE) * cm.cn) / n.tot) AS t
  FROM obs JOIN rm ON obs.lang = rm.lang
  JOIN cm ON obs.source = cm.source CROSS JOIN n
), chi AS (
  SELECT list_reduce(list_prepend(0.0, list(t ORDER BY lang, source)),
                     (acc, x) -> acc + x) AS chi2
  FROM terms
), dims AS (
  SELECT CAST((SELECT count(*) FROM rm) AS BIGINT) AS r,
         CAST((SELECT count(*) FROM cm) AS BIGINT) AS c,
         (SELECT tot FROM n) AS tot
)
SELECT dims.r AS n_rows_dim, dims.c AS n_cols_dim,
       floor(chi.chi2 * 10000 + 0.5) / 10000.0 AS chi2,
       floor(sqrt(chi.chi2 / (dims.tot * least(dims.r - 1, dims.c - 1)))
             * 1000000 + 0.5) / 1000000.0 AS cramers_v
FROM chi CROSS JOIN dims
""",
)
def agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRAMÉR'S V effect size for the lang × source association — the
    normalized [0,1] summary of ``agg_chi2_independence``'s cell table
    (chi-square alone grows with n; V answers 'how strongly associated',
    the number mixture decisions actually compare across corpora).

    The chi-square total is a float SUM over ~|langs|×|sources| cells,
    so it folds SEQUENTIALLY over the (lang, source)-sorted term list
    (the ext_kl_divergence discipline) — bit-identical across engines;
    V is one formula from it and exact dimension counts."""
    docs = table(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("o")
        # Lazy localCheckpoint, not persist(): no unpersist site exists in
        # a lazily-returned frame, and the CacheManager would pin the
        # blocks for the whole session (the ext_kl_divergence pattern).
    ).localCheckpoint(eager=False)
    rm = obs.groupBy("lang").agg(F.sum("o").cast("long").alias("rn"))
    cm = obs.groupBy("source").agg(F.sum("o").cast("long").alias("cn"))
    n = obs.agg(F.sum("o").cast("long").alias("tot"))
    exp = (F.col("rn").cast("double") * F.col("cn")) / F.col("tot")
    dev = F.col("o").cast("double") - exp
    terms = (
        obs.join(F.broadcast(rm), "lang")
        .join(F.broadcast(cm), "source")
        .join(F.broadcast(n))
        .select("lang", "source", (dev * dev / exp).alias("t"))
    )
    chi = terms.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("lang", "source", "t"))),
                lambda s: s.getField("t"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("chi2")
    )
    dims = (
        rm.agg(F.count(F.lit(1)).cast("long").alias("r"))
        .crossJoin(cm.agg(F.count(F.lit(1)).cast("long").alias("c")))
        .crossJoin(n)
    )
    return chi.crossJoin(F.broadcast(dims)).select(
        F.col("r").alias("n_rows_dim"),
        F.col("c").alias("n_cols_dim"),
        (F.floor(F.col("chi2") * 10000 + 0.5) / 10000.0).alias("chi2"),
        (
            F.floor(
                F.sqrt(
                    F.col("chi2")
                    / (F.col("tot") * F.least(F.col("r") - 1, F.col("c") - 1))
                )
                * 1000000
                + 0.5
            )
            / 1000000.0
        ).alias("cramers_v"),
    )


@register(
    "agg_mutual_information",
    oracle="""
WITH obs AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS o FROM documents GROUP BY 1, 2
), rm AS (
  SELECT lang, CAST(sum(o) AS BIGINT) AS rn FROM obs GROUP BY 1
), cm AS (
  SELECT source, CAST(sum(o) AS BIGINT) AS cn FROM obs GROUP BY 1
), n AS (
  SELECT CAST(sum(o) AS BIGINT) AS tot FROM obs
), terms AS (
  SELECT obs.lang, obs.source,
         (CAST(obs.o AS DOUBLE) / n.tot)
         * ln((CAST(obs.o AS DOUBLE) * n.tot)
              / (CAST(rm.rn AS DOUBLE) * cm.cn)) AS t
  FROM obs JOIN rm ON obs.lang = rm.lang
  JOIN cm ON obs.source = cm.source CROSS JOIN n
), folded AS (
  SELECT list_reduce(
           list_prepend(0.0, list(t ORDER BY lang, source)),
           (acc, x) -> acc + x) AS mi
  FROM terms
)
SELECT CAST((SELECT count(*) FROM terms) AS BIGINT) AS n_cells,
       floor(mi * 1000000 + 0.5) / 1000000.0 AS mi_nats
FROM folded
""",
)
def agg_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MUTUAL INFORMATION I(lang; source) in nats — the one-number
    information-theoretic summary of the contingency table whose cells
    ``agg_chi2_independence`` reports and whose effect size
    ``agg_cramers_v`` normalizes: MI = Σ p(l,s)·ln(p(l,s)/(p(l)p(s))),
    zero iff independent, and directly comparable to the entropy
    battery (``agg_entropy``, ``ext_kl_divergence`` — MI is the KL of
    the joint from the product).

    Same float discipline as its siblings: exact integer counts in, the
    ln-term sum folds SEQUENTIALLY over the (lang, source)-sorted cell
    list (Spark aggregate HOF == DuckDB list_reduce), one half-up round
    out.  One map-side-combined groupBy; marginals derive from the same
    checkpointed aggregate and broadcast back; the fold array is
    |langs|×|sources| cells."""
    docs = table(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("o")
        # Lazy localCheckpoint (the ext_kl_divergence pattern): four
        # consumers, no unpersist site in a lazily-returned frame.
    ).localCheckpoint(eager=False)
    rm = obs.groupBy("lang").agg(F.sum("o").cast("long").alias("rn"))
    cm = obs.groupBy("source").agg(F.sum("o").cast("long").alias("cn"))
    n = obs.agg(F.sum("o").cast("long").alias("tot"))
    terms = (
        obs.join(F.broadcast(rm), "lang")
        .join(F.broadcast(cm), "source")
        .join(F.broadcast(n))
        .select(
            "lang",
            "source",
            (
                (F.col("o").cast("double") / F.col("tot"))
                * F.log(
                    (F.col("o").cast("double") * F.col("tot"))
                    / (F.col("rn").cast("double") * F.col("cn"))
                )
            ).alias("t"),
        )
    )
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        (
            F.floor(
                F.aggregate(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("lang", "source", "t"))),
                        lambda s: s.getField("t"),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                * 1000000
                + 0.5
            )
            / 1000000.0
        ).alias("mi_nats"),
    )


@register(
    "ext_audience_overlap",
    oracle="""
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
), m AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_users FROM ut GROUP BY 1
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS n_both
  FROM ut a JOIN ut b ON a.user_id = b.user_id
  WHERE a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, ma.n_users AS n_a, mb.n_users AS n_b, n_both,
       floor(CAST(n_both AS DOUBLE)
             / (ma.n_users + mb.n_users - n_both) * 1000000 + 0.5)
         / 1000000.0 AS jaccard
FROM pairs
JOIN m ma ON ma.event_type = pairs.type_a
JOIN m mb ON mb.event_type = pairs.type_b
""",
)
def ext_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIENCE OVERLAP matrix: for every event-type pair, the exact
    user-set intersection and Jaccard — the segment-overlap report
    behind campaign targeting and feature-adoption analysis (its
    sketch-scale sibling is ``ext_kmv_intersection``: exact here
    because |types|² is tiny; KMV when the segments are billions).

    The self-join runs on the DISTINCT (user, type) frame keyed by
    user — each user contributes ≤ |types|² pair rows, so volume is
    |users|·|types|², never events²; marginals broadcast onto the
    |types|²/2-row pair frame.  All integers until the one Jaccard
    ratio."""
    ev = table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    m = ut.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    ma = m.select(F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a"))
    mb = m.select(F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b"))
    return (
        pairs.join(F.broadcast(ma), "type_a")
        .join(F.broadcast(mb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            (
                F.floor(
                    F.col("n_both").cast("double")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_both"))
                    * 1000000
                    + 0.5
                )
                / 1000000.0
            ).alias("jaccard"),
        )
    )


@register(
    "agg_trend_ols",
    oracle="""
WITH base AS (
  SELECT event_type,
         CAST(date_diff('hour',
              (SELECT date_trunc('hour', min(ts)) FROM events),
              date_trunc('hour', ts)) AS BIGINT) AS x,
         CAST(round(value * 100) AS BIGINT) AS y
  FROM events
),
m AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM base GROUP BY 1
)
SELECT event_type, n,
       floor((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
             / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
             * 10000 + 0.5) / 10000.0 AS slope_cents_per_hour,
       floor((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
             * (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
             / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy))
             * 1000000 + 0.5) / 1000000.0 AS r2
FROM m ORDER BY event_type
""",
)
def agg_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-SEGMENT TREND: ordinary-least-squares slope of value on time
    (cents/hour) with R² per event type — the "is this KPI actually
    going up, and is the line real" readout behind every dashboard
    trend arrow (complements ``win_ma_crossover``'s regime triggers and
    ``ext_ts_seasonal``'s cycle profile with the secular component).

    Exactness: x rebases to integer HOURS since the corpus start (one
    1-row aggregate, scalar-subqueried) and y to integer cents, so all
    five OLS moments are exact int64 sums (magnitudes bounded by
    span²·rows — decimal-sum is the documented swap past ~1e16); slope
    and R² are single double expressions evaluated in the same op order
    both engines, half-up quantized.  One scan, one map-side-combined
    aggregate, |types| output rows."""
    ev = table(spark, sf_dir, "events")
    t0 = ev.agg(F.date_trunc("hour", F.min("ts")).alias("t0"))
    base = ev.crossJoin(F.broadcast(t0)).select(
        "event_type",
        F.expr("timestampdiff(HOUR, t0, date_trunc('hour', ts))")
        .cast("long")
        .alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    m = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = F.col("n") * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy")
    denx = F.col("n") * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx")
    deny = F.col("n") * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy")
    return m.select(
        "event_type",
        "n",
        (F.floor(num / denx * 10000 + 0.5) / 10000.0).alias("slope_cents_per_hour"),
        (F.floor(num * num / (denx * deny) * 1000000 + 0.5) / 1000000.0).alias("r2"),
    ).orderBy("event_type")


@register(
    "agg_mix_shift",
    oracle="""
WITH p AS (
  SELECT event_type,
         CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16' THEN 1 ELSE 2 END
           AS period,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type,
         CAST(max(CASE WHEN period = 1 THEN n END) AS BIGINT) AS n1,
         CAST(max(CASE WHEN period = 2 THEN n END) AS BIGINT) AS n2,
         CAST(max(CASE WHEN period = 1 THEN sv END) AS BIGINT) AS sv1,
         CAST(max(CASE WHEN period = 2 THEN sv END) AS BIGINT) AS sv2
  FROM p GROUP BY 1
)
SELECT event_type, n1, n2,
       floor((CAST(sv2 AS DOUBLE) - sv1) / 100 * 100 + 0.5) / 100
         AS delta_total,
       floor((n2 - n1) * (CAST(sv1 AS DOUBLE) / n1) / 100 * 100 + 0.5) / 100
         AS volume_effect,
       floor(n2 * (CAST(sv2 AS DOUBLE) / n2 - CAST(sv1 AS DOUBLE) / n1)
             / 100 * 100 + 0.5) / 100 AS rate_effect
FROM w ORDER BY event_type
""",
)
def agg_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VOLUME/RATE DECOMPOSITION (the FP&A mix-shift bridge): the
    first-half vs second-half revenue change per event type split into
    a VOLUME effect ((n2−n1)·r1 — more events at the old rate) and a
    RATE effect (n2·(r2−r1) — the new volume at the rate change), which
    sum EXACTLY to the total change — the "why did revenue move"
    decomposition behind every variance bridge chart
    (``win_period_over_period`` reports THAT it moved; this says WHY).

    Exact integer counts and cent sums feed double effects evaluated in
    the same op order both engines, half-up quantized to cents; the
    additivity (volume + rate = delta) is algebraic, not approximate.
    One scan, one (type, period) map-side-combined aggregate, one
    |types|-row pivot."""
    ev = table(spark, sf_dir, "events")
    p = ev.groupBy(
        "event_type",
        F.when(F.col("ts").cast("date") < F.lit("2024-01-16").cast("date"), 1)
        .otherwise(2)
        .alias("period"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("sv"),
    )
    w = p.groupBy("event_type").agg(
        F.max(F.when(F.col("period") == 1, F.col("n"))).cast("long").alias("n1"),
        F.max(F.when(F.col("period") == 2, F.col("n"))).cast("long").alias("n2"),
        F.max(F.when(F.col("period") == 1, F.col("sv"))).cast("long").alias("sv1"),
        F.max(F.when(F.col("period") == 2, F.col("sv"))).cast("long").alias("sv2"),
    )
    r1 = F.col("sv1").cast("double") / F.col("n1")
    r2 = F.col("sv2").cast("double") / F.col("n2")
    c2 = lambda x: F.floor(x / 100 * 100 + 0.5) / 100  # noqa: E731
    return w.select(
        "event_type",
        "n1",
        "n2",
        c2(F.col("sv2").cast("double") - F.col("sv1")).alias("delta_total"),
        c2((F.col("n2") - F.col("n1")) * r1).alias("volume_effect"),
        c2(F.col("n2") * (r2 - r1)).alias("rate_effect"),
    ).orderBy("event_type")


@register(
    "agg_chi2_residuals",
    oracle="""
WITH obs AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS o FROM documents GROUP BY 1, 2
), rm AS (
  SELECT lang, CAST(sum(o) AS BIGINT) AS rn FROM obs GROUP BY 1
), cm AS (
  SELECT source, CAST(sum(o) AS BIGINT) AS cn FROM obs GROUP BY 1
), n AS (
  SELECT CAST(sum(o) AS BIGINT) AS tot FROM obs
), cells AS (
  SELECT obs.lang, obs.source, obs.o,
         (CAST(rm.rn AS DOUBLE) * cm.cn) / n.tot AS e,
         (CAST(obs.o AS DOUBLE) - (CAST(rm.rn AS DOUBLE) * cm.cn) / n.tot)
           / sqrt(((CAST(rm.rn AS DOUBLE) * cm.cn) / n.tot)
                  * (1 - CAST(rm.rn AS DOUBLE) / n.tot)
                  * (1 - CAST(cm.cn AS DOUBLE) / n.tot)) AS r_adj
  FROM obs JOIN rm ON obs.lang = rm.lang
  JOIN cm ON obs.source = cm.source
  CROSS JOIN n
)
SELECT lang, source, o,
       floor(e * 10000 + 0.5) / 10000.0 AS expected,
       floor(r_adj * 1000000 + 0.5) / 1000000.0 AS std_residual,
       abs(r_adj) > 1.96 AS significant
FROM cells ORDER BY lang, source
""",
)
def agg_chi2_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADJUSTED STANDARDIZED RESIDUALS for the lang × source
    contingency table: (O−E)/√(E(1−r/n)(1−c/n)) per cell with a
    |r| > 1.96 flag — the "WHICH cells drive the dependence" readout
    ``agg_chi2_independence``'s omnibus statistic cannot give (a
    significant chi-square with residuals flat everywhere except one
    cell is a very different story from uniform drift; Agresti's
    standard follow-up).

    Exactness: observed/marginal/total counts are exact int64; E and
    the residual are fixed-order double expressions; the significance
    flag compares identical doubles to the same 1.96 literal.

    Scale shape: one groupBy to the bounded cell grain, two
    marginal-keyed joins (category-sized, broadcastable), one 1-row
    total."""
    docs = table(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    rm = obs.groupBy("lang").agg(F.sum("o").cast("long").alias("rn"))
    cm = obs.groupBy("source").agg(F.sum("o").cast("long").alias("cn"))
    n = obs.agg(F.sum("o").cast("long").alias("tot"))
    cells = (
        obs.join(F.broadcast(rm), "lang")
        .join(F.broadcast(cm), "source")
        .crossJoin(F.broadcast(n))
    )
    e = F.col("rn").cast("double") * F.col("cn") / F.col("tot")
    r_adj = (F.col("o").cast("double") - e) / F.sqrt(
        e
        * (1 - F.col("rn").cast("double") / F.col("tot"))
        * (1 - F.col("cn").cast("double") / F.col("tot"))
    )
    return cells.select(
        "lang",
        "source",
        "o",
        (F.floor(e * 10000 + 0.5) / 10000.0).alias("expected"),
        (F.floor(r_adj * 1000000 + 0.5) / 1000000.0).alias("std_residual"),
        (F.abs(r_adj) > 1.96).alias("significant"),
    ).orderBy("lang", "source")
