"""Materialized-view build + query rewrite — the classic OLAP
acceleration story: precompute a fine-grained aggregate ONCE, answer
coarser queries FROM the MV instead of the fact table.

``plan_mv_rewrite`` builds a daily revenue MV (one shuffle over orders,
written as parquet — the materialization), then answers the monthly
query by re-aggregating the MV: correct because SUM composes over a
partition of its input (day ⊂ month), the algebraic-rollup property a
real MV matcher checks before rewriting.  The monthly plan scans the
DAY-grain MV (365 rows/year/priority), not the fact table — at 100 TB
the difference between a dashboard refresh that reads 2 KB and one that
reads 2 TB.  ``pipeline_ivm``/``stream_ivm`` (plans/ivm.py) are the
MAINTENANCE half of the same story (keeping the MV fresh
incrementally); this is the CONSUMPTION half.

Reference analog: none (the reference recomputes everything per tick);
[EXT] OLAP-engineering territory.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


@register(
    "plan_mv_rewrite",
    oracle="""
SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
       o_orderpriority,
       round(sum(o_totalprice), 2) AS revenue,
       CAST(count(*) AS BIGINT)    AS n_orders
FROM orders
GROUP BY 1, 2
""",
)
def plan_mv_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the day-grain MV, then answer the MONTH query from it.
    The oracle aggregates the BASE table directly — the rewrite is only
    correct if rolling the MV up to months is value-identical to
    aggregating the facts, which is exactly what the hash compare
    proves.  Revenue stays un-rounded in the MV and rounds ONCE at the
    month grain (rounding per-day then summing would drift)."""
    orders = table(spark, sf_dir, "orders")
    mv_dir = os.path.join(
        tempfile.gettempdir(), f"sdis_mv_{os.getpid()}"
    )
    shutil.rmtree(mv_dir, ignore_errors=True)
    (
        orders.groupBy(
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
            "o_orderpriority",
        )
        .agg(
            F.sum("o_totalprice").alias("revenue_raw"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
        .write.mode("overwrite")
        .parquet(mv_dir)
    )
    mv = spark.read.parquet(mv_dir)
    return (
        mv.groupBy(
            F.substring("day", 1, 7).alias("month"), "o_orderpriority"
        )
        .agg(
            F.round(F.sum("revenue_raw"), 2).alias("revenue"),
            F.sum("n_orders").cast("long").alias("n_orders"),
        )
    )
