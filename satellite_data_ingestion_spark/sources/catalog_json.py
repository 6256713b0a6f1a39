"""Semi-structured catalog scan (SURVEY.md §2.1, `scan_catalog_json`).

The reference parses an OpenSearch GeoJSON response: take
``features[].properties`` and project ``{identifier, date}`` with the date
normalized to the minute (``utils/eumdacapi.py:49-66``).  Re-expressed over
the `events` table: its ``props`` column is the semi-structured payload and
the (identifier, minute-date) projection is built with JSON access +
timestamp normalization — all JVM-side expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


@register(
    "scan_catalog_json",
    oracle="""
SELECT CAST(event_id AS VARCHAR)                       AS identifier,
       CAST(date_trunc('minute', ts) AS TIMESTAMP)     AS date,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
FROM events
""",
)
def scan_catalog_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-entry projection from a semi-structured source: id + minute-
    normalized date (utils/eumdacapi.py:53-58) + one JSON property."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").cast("string").alias("identifier"),
        F.date_trunc("minute", "ts").alias("date"),
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    )
