"""Set operations (SURVEY.md §2.6) — all [EXT], none in the reference."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


@register(
    "setop_union",
    oracle="""
SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
UNION ALL
SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 1000.0
""",
)
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics, by-name resolution; overlapping slices keep
    duplicates).  Union is a zero-shuffle plan merge in Spark."""
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_mktsegment")
    b = c.filter(F.col("c_acctbal") > 1000.0).select("c_custkey", "c_mktsegment")
    return a.unionByName(b)


@register(
    "setop_intersect",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) — customers having both open and
    finished orders.  Planned as an aggregate + semi-join shuffle on the key."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


@register(
    "setop_except",
    oracle="""
SELECT c_custkey FROM customer
EXCEPT ALL
SELECT o_custkey AS c_custkey FROM orders
""",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference): customer keys minus one occurrence per
    order — surfaces customers with no orders plus multiplicity semantics."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.exceptAll(o)


@register(
    "setop_union_byname",
    oracle="""
SELECT o_orderkey AS record_key, o_totalprice AS amount, o_orderstatus AS status,
       NULL AS linenumber
FROM orders
WHERE o_totalprice > 400000
UNION ALL BY NAME
SELECT l_orderkey AS record_key, l_extendedprice AS amount,
       l_linenumber AS linenumber, NULL AS status
FROM lineitem
WHERE l_extendedprice > 90000
""",
)
def setop_union_byname(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two sources with overlapping-but-different
    schemas combined by COLUMN NAME with missing columns null-filled
    (unionByName + allowMissingColumns) — how a pipeline appends a new
    file generation that gained/lost columns without rewriting history.
    Positional union would silently misalign; by-name is the contract."""
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(
            F.col("o_orderkey").alias("record_key"),
            F.col("o_totalprice").alias("amount"),
            F.col("o_orderstatus").alias("status"),
        )
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_extendedprice") > 90000)
        .select(
            F.col("l_orderkey").alias("record_key"),
            F.col("l_extendedprice").alias("amount"),
            F.col("l_linenumber").alias("linenumber"),
        )
    )
    return o.unionByName(li, allowMissingColumns=True)


@register(
    "setop_intersect_all",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): each customer key survives
    min(open-count, finished-count) times — completing the §2.6 bag/set
    matrix alongside EXCEPT ALL.  Plans as a partial-count aggregate per
    side then a min; one key shuffle, no row explosion."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersectAll(b)
