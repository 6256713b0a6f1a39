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
import atexit as _atexit
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


_META_TABLES = (("orders", "o_orderkey"), ("lineitem", "l_orderkey"))


@register(
    "scan_parquet_metadata",
    oracle="\nUNION ALL\n".join(
        f"""
SELECT regexp_extract(file_name, '[^/]+$') AS file_name,
       CAST(row_group_id AS BIGINT) AS row_group_id,
       CAST(row_group_num_rows AS BIGINT) AS num_rows,
       path_in_schema AS key_col,
       stats_min_value AS min_val,
       stats_max_value AS max_val
FROM parquet_metadata('{_ORACLE_SF_DIR}/{t}.parquet')
WHERE path_in_schema = '{k}'"""
        for t, k in _META_TABLES
    ),
)
def scan_parquet_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARQUET FOOTER SCAN — metadata as a queryable table: per row
    group, the row count and the key column's min/max statistics, parsed
    from the real footers executor-side.  This is the primitive beneath
    every file-skipping story (the Delta layer's add-action stats,
    sources/delta_log.py `_file_stats`, are these values hoisted into
    the log): a query planner prunes row groups by exactly this table.

    Scale shape: the FILE LIST is the dataframe; footers are read with
    pyarrow inside ``mapInPandas`` (one footer per file — bytes read is
    KB per file regardless of data size), so a 100k-file lake's metadata
    scan is a distributed job over file names, never a data scan.  The
    oracle is DuckDB's ``parquet_metadata`` over the same files — two
    independent footer parsers must agree byte-for-byte.  Path-bearing
    oracle ⇒ sf-pinned like ``scan_binary`` (_DRIVER_SF_ONLY)."""
    import os as _os2
    from collections.abc import Iterator as _It

    import pandas as _pd

    _prepare(spark)
    rows = [
        (f"{sf_dir.rstrip('/')}/{t}.parquet", k) for t, k in _META_TABLES
    ]
    files = spark.createDataFrame(rows, "path string, key string").repartition(2)

    def read_meta(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        import pyarrow.parquet as _pq

        for pdfb in batches:
            out = []
            for path, key in zip(pdfb["path"], pdfb["key"]):
                md = _pq.ParquetFile(path).metadata
                for rg in range(md.num_row_groups):
                    rgm = md.row_group(rg)
                    for c in range(rgm.num_columns):
                        col = rgm.column(c)
                        if col.path_in_schema == key:
                            st = col.statistics
                            out.append(
                                (
                                    _os2.path.basename(path),
                                    rg,
                                    rgm.num_rows,
                                    key,
                                    str(st.min),
                                    str(st.max),
                                )
                            )
            yield _pd.DataFrame(
                out,
                columns=[
                    "file_name",
                    "row_group_id",
                    "num_rows",
                    "key_col",
                    "min_val",
                    "max_val",
                ],
            )

    return files.mapInPandas(
        read_meta,
        schema=(
            "file_name string, row_group_id long, num_rows long, "
            "key_col string, min_val string, max_val string"
        ),
    )


_FW_WIDTHS = (12, 2, 10, 1)  # orderkey, linenumber, quantity-cents, returnflag
_FW_CACHE: dict = {}


def _fw_cleanup() -> None:
    """Session-end rmtree of the fixed-width staging dirs (they live under
    tempfile.mkdtemp and are cached per (appId, sf) for the session)."""
    import shutil as _shutil

    for path in _FW_CACHE.values():
        _shutil.rmtree(_os.path.dirname(path), ignore_errors=True)
    _FW_CACHE.clear()


_atexit.register(_fw_cleanup)


def _fw_fixed(col, width: int):
    """lpad that REFUSES to truncate: F.lpad silently chops any value wider
    than *width* (an orderkey past 12 digits at very large SF would corrupt
    the staged file and surface only as a downstream hash mismatch), so
    overflow raises at write time instead."""
    s = col.cast("string")
    return F.when(
        F.length(s) > width,
        F.raise_error(
            F.concat(F.lit(f"fixed-width overflow (width {width}): "), s)
        ),
    ).otherwise(F.lpad(s, width, "0"))


@register(
    "scan_fixed_width",
    oracle="""
SELECT l_returnflag AS flag,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
FROM lineitem
GROUP BY 1
""",
)
def scan_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIXED-WIDTH text ingestion — the mainframe/COBOL export format
    every enterprise lake still receives and Spark has no native reader
    for: stage lineitem as fixed-width records ONCE per (session, sf),
    then parse with pure ``substring`` projections over ``spark.read
    .text`` and aggregate.  The result must hash-match the oracle
    computed on the ORIGINAL table — a full write→parse round-trip
    proof (the ``scan_binary`` posture, with the oracle on the view so
    it holds at any SF).

    Scale shape: text files split by line ranges, so parallelism is
    data-proportional; the parse is whole-stage-codegen substring/cast
    arithmetic — no regex, no UDF, no shuffle before the aggregate.
    Exact integer cents ride through the round-trip."""
    import os
    import shutil
    import tempfile

    _prepare(spark)
    key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"))
    if key not in _FW_CACHE:
        root = tempfile.mkdtemp(prefix="sdis_fixedwidth_")
        li = (
            spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
            .select(
                F.concat(
                    _fw_fixed(F.col("l_orderkey"), _FW_WIDTHS[0]),
                    _fw_fixed(F.col("l_linenumber"), _FW_WIDTHS[1]),
                    _fw_fixed(
                        F.round(F.col("l_quantity") * 100).cast("long"), _FW_WIDTHS[2]
                    ),
                    F.col("l_returnflag"),
                ).alias("value")
            )
        )
        out = os.path.join(root, "lineitem_fw")
        li.write.mode("overwrite").text(out)
        _FW_CACHE[key] = out
    path = _FW_CACHE[key]
    w = _FW_WIDTHS
    o0, o1, o2 = 1, 1 + w[0], 1 + w[0] + w[1]
    o3 = o2 + w[2]
    rec = spark.read.text(path)
    parsed = rec.select(
        F.substring("value", o0, w[0]).cast("long").alias("l_orderkey"),
        F.substring("value", o1, w[1]).cast("int").alias("l_linenumber"),
        F.substring("value", o2, w[2]).cast("long").alias("qty_cents"),
        F.substring("value", o3, w[3]).alias("flag"),
    )
    return parsed.groupBy("flag").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("qty_cents").cast("long").alias("qty_cents"),
    )
