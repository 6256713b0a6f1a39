"""Binary product scan (SURVEY.md §2.1, `scan_binary`).

The reference streams a product zip to disk and unzips it to a ``.nat``
blob (``utils/eumdacapi.py:73-87``, ``sources/meteosat.py:131-144``).  The
Spark form is the ``binaryFile`` source: (path, modificationTime, length,
content) rows, splittable across executors, with decompression/decoding
downstream in ``mapInPandas`` (see ``llm/multimodal.py`` and
``plans/pipeline.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import _prepare
from ..registry import register


# Oracle: DuckDB's read_blob over the same directory.  Its md5() only takes
# VARCHAR (and BLOB→VARCHAR casting escapes non-printables), so both engines
# digest the UPPERCASE HEX encoding of the bytes — identical hex on both
# sides, still computed distributed JVM-side in Spark.
#
# The only oracle whose input is a DIRECTORY, not a registered view, so the
# path must be baked into the SQL string at import time.  The driver's
# contract fixes verification at sf=0.01, hence that default; a different
# install location or scale factor sets SPARK_GRAFT_ORACLE_SF_DIR before
# import (tests/test_oracle_parity.py pins this query to the driver's sf via
# _DRIVER_SF_ONLY — comparing it at any other sf is a harness error, not a
# query error).
import os as _os

_ORACLE_SF_DIR = _os.environ.get(
    "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
).rstrip("/")


@register(
    "scan_binary",
    oracle=f"""
SELECT regexp_extract(filename, '[^/]+$') AS file_name,
       CAST(size AS BIGINT) AS n_bytes,
       md5(hex(content)) AS digest
FROM read_blob('{_ORACLE_SF_DIR}/*.parquet')
""",
)
def scan_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binaryFile scan over the corpus directory: one row per blob with
    name/size plus a content digest (computed distributed, JVM-side).
    Demonstrates the ingest-stage scan; file contents never move to the
    driver.  At 100 TB: binaryFile splits by file, so parallelism = file
    count — pack blobs into few-hundred-MB archives upstream."""
    _prepare(spark)
    return (
        spark.read.format("binaryFile")
        .load(f"{sf_dir.rstrip('/')}/*.parquet")
        .select(
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.col("length").alias("n_bytes"),
            F.md5(F.hex("content")).alias("digest"),
        )
        .orderBy("file_name")
    )
