"""Table catalog: loading the driver's parquet corpus.

All queries read through here so scan behavior is uniform: session timezone
pinned to UTC (the reference's key domain is minute-truncated UTC
timestamps, ``sources/meteosat.py:74,111`` / ``utils/eumdacapi.py:56-58``),
and reads stay fully declarative so Catalyst can push filters/projections
into the parquet scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _prepare(spark: SparkSession) -> None:
    """Pin runtime confs that affect value semantics (idempotent, cheap).

    UTC session timezone keeps Spark's reading of naive parquet timestamps
    aligned with DuckDB's (the oracle); Arrow speeds every pandas-UDF path.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")


def path(sf_dir: str, name: str) -> str:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return os.path.join(sf_dir, f"{name}.parquet")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one corpus table as a DataFrame (lazy parquet scan)."""
    _prepare(spark)
    return spark.read.parquet(path(sf_dir, name))
