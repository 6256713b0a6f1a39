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
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS revenue,
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
    proves.  The MV stores EXACT INTEGER CENTS (the repo's float-sum
    discipline): raw double sums would accumulate in a different order
    in the MV path than in the oracle's direct fact scan, and a
    round(x, 2) sitting on an x.xx5 boundary can flip between engines —
    integer cents compose exactly over any partition of the input, so
    day→month rollup is value-identical to fact-grain aggregation at
    every scale and partitioning."""
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
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("revenue_cents"),
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
            (F.sum("revenue_cents").cast("double") / 100.0).alias("revenue"),
            F.sum("n_orders").cast("long").alias("n_orders"),
        )
    )
