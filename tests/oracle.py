"""Local mirror of the driver's DuckDB oracle comparison.

Runs a registered Spark query and its oracle SQL side by side and compares
row count, column names, and (column-name-sorted, row-sorted) values with a
small float tolerance — strictly stricter discipline than the driver's
order-insensitive value hash, so passing here predicts passing there.
"""

from __future__ import annotations

import datetime
import math
import os

import duckdb

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


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _sort_key(row):
    return tuple(str(v) for v in row)


# DuckDB result types with no Spark equivalent. The driver's value hash is
# type-sensitive, so an oracle column of e.g. HUGEINT (DuckDB's default for
# windowed/aggregated integer SUMs) hash-mismatches a Spark BIGINT even when
# every value is identical — cast such expressions to BIGINT in the oracle.
_NON_SPARK_TYPES = ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT")


def _check_duck_types(con, sql: str) -> list[str]:
    errs = []
    rel = con.sql(sql)
    for name, t in zip(rel.columns, rel.types):
        ts = str(t).upper()
        if any(bad in ts for bad in _NON_SPARK_TYPES):
            errs.append(
                f"oracle col {name} has non-Spark-representable DuckDB type {ts}; "
                "add an explicit CAST in the oracle SQL"
            )
    return errs


def _check_spark_types(spark_df) -> list[str]:
    """The driver canonicalizes results with a pandas ``sort_values`` over
    every column; array/map/struct cells arrive as ndarrays/dicts, which are
    unhashable and crash the driver with ERR (seen twice in round 10).
    Reject them here so no registered query can ship a non-scalar column."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    errs = []
    for f in spark_df.schema.fields:
        if isinstance(f.dataType, (ArrayType, MapType, StructType)):
            errs.append(
                f"spark col {f.name} has non-scalar type {f.dataType.simpleString()}; "
                "the driver's pandas canonicalizer cannot sort it — serialize "
                "(array_join / to_json) before returning"
            )
    return errs


_DUCK_INTEGRAL = ("TINYINT", "SMALLINT", "INTEGER", "BIGINT")
_DUCK_FLOATING = ("FLOAT", "DOUBLE", "REAL")


def _check_dtype_class(spark_df, con, sql: str) -> list[str]:
    """The driver's value hash is dtype-sensitive: a Spark BIGINT column vs
    a DuckDB DOUBLE oracle column hash-mismatches even when every value is
    identical (round 11's ``ext_kmv_intersection``: bare ``floor()`` is
    DOUBLE in DuckDB, BIGINT via ``F.floor``).  The numeric coercion below
    in ``compare`` hid that class, so reject integral-vs-floating column
    pairs outright — same discipline as the HUGEINT guard above."""
    from pyspark.sql.types import ByteType, DoubleType, FloatType, IntegerType, LongType, ShortType

    spark_types = {f.name: f.dataType for f in spark_df.schema.fields}
    rel = con.sql(sql)
    errs = []
    for name, t in zip(rel.columns, rel.types):
        st = spark_types.get(name)
        if st is None:
            continue  # column-name mismatch is reported by compare() itself
        ts = str(t).upper()
        duck_int = any(ts == d or ts.startswith(d) for d in _DUCK_INTEGRAL) and "DECIMAL" not in ts
        duck_float = any(d in ts for d in _DUCK_FLOATING)
        spark_int = isinstance(st, (ByteType, ShortType, IntegerType, LongType))
        spark_float = isinstance(st, (FloatType, DoubleType))
        if (spark_int and duck_float) or (spark_float and duck_int):
            errs.append(
                f"dtype class differs for col {name}: spark={st.simpleString()} "
                f"duck={ts}; the driver hash is dtype-sensitive — CAST one side"
            )
    return errs


def compare(spark_df, con, sql: str, float_tol: float = 1e-9) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    errs: list[str] = []
    errs.extend(_check_duck_types(con, sql))
    errs.extend(_check_spark_types(spark_df))
    errs.extend(_check_dtype_class(spark_df, con, sql))
    if errs:
        return errs
    spark_cols = list(spark_df.columns)
    spark_rows = [tuple(r) for r in spark_df.collect()]

    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    if sorted(spark_cols) != sorted(duck_cols):
        errs.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return errs
    if len(spark_rows) != len(duck_rows):
        errs.append(f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}")

    # Reorder both to column-name-sorted order (driver behavior).
    order_s = [spark_cols.index(c) for c in sorted(spark_cols)]
    order_d = [duck_cols.index(c) for c in sorted(duck_cols)]
    s_rows = sorted(
        (tuple(_norm(r[i]) for i in order_s) for r in spark_rows), key=_sort_key
    )
    d_rows = sorted(
        (tuple(_norm(r[i]) for i in order_d) for r in duck_rows), key=_sort_key
    )
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        if sr == dr:
            continue
        for c, (sv, dv) in zip(sorted(spark_cols), zip(sr, dr)):
            if sv == dv:
                continue
            if (
                isinstance(sv, float)
                and isinstance(dv, float)
                and math.isclose(sv, dv, rel_tol=float_tol, abs_tol=float_tol)
            ):
                continue
            errs.append(f"row {i} col {c}: spark={sv!r} duck={dv!r}")
            if len(errs) > 10:
                return errs
    return errs
