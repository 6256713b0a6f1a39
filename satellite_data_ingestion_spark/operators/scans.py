"""Scan operators (SURVEY.md §2.1, table-scan side).

The reference scans three shapes of input: the parquet-analog catalog rows
(``utils/eumdacapi.py:49-66``), binary product blobs
(``sources/meteosat.py:131-144`` — see ``sources/binary.py``), and its JSON
state file.  Here: the plain columnar table scan, fully declarative so
Catalyst prunes columns and pushes predicates into the parquet reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..registry import register


@register(
    "scan_parquet",
    oracle="""
SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
       l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
       l_shipdate
FROM lineitem
""",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full columnar scan of the fact table.

    At 100 TB this is a splittable parquet scan: one task per row-group
    chunk (`spark.sql.files.maxPartitionBytes`), no shuffle, and the
    explicit column list keeps ReadSchema exact even if the table gains
    columns.
    """
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    )
