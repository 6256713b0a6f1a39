"""External-process script transform — the engine's ``pipe()`` boundary.

The reference forks an external binary per band file (``gdal_translate``,
``sources/meteosat.py:184-185``): a script-transform stage where records
leave the engine, pass through a child process, and come back.  Spark's
low-level analog is ``RDD.pipe()`` — row-at-a-time text with no schema.
This operator keeps the DataFrame boundary instead: Arrow batch → TSV
lines on the child's stdin → TSV lines on stdout → typed columns.

Scale shape: ONE fork/exec per Arrow batch (default ~10k rows), not per
row, and the child runs wherever the partition lives — on a 1000-executor
cluster the subprocess cost is per-(core × batch) and fully parallel; no
payload ever crosses the driver.  The child sees a bounded batch, so its
memory is capped by ``spark.sql.execution.arrow.maxRecordsPerBatch``
regardless of table size.

Protocol: values are tab-joined; callers must pre-escape tab/newline out
of free-text columns (a projection in the same scan stage — see
``ext_pipe_transform``).  Output lines are split on tab and cast to the
declared result schema.
"""

from __future__ import annotations

import shutil
import subprocess

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructType,
)

from ..catalog import table
from ..registry import register

# Spark output type → pandas dtype for the parsed TSV columns.  Kept to
# the types a text protocol can round-trip exactly (ints, utf-8 strings,
# and doubles the child prints verbatim).
_PD_DTYPE = {
    LongType: "int64",
    DoubleType: "float64",
    StringType: "object",
}


def pipe_transform(df: DataFrame, argv: list[str], schema: str) -> DataFrame:
    """Run every row of ``df`` through the external command ``argv``.

    Each Arrow batch is rendered as tab-separated lines, fed to one child
    process via stdin, and the child's stdout is parsed back as
    tab-separated lines typed by ``schema`` (a DDL string).  The child
    must emit exactly as many fields per line as ``schema`` has columns;
    it may emit any number of lines (filtering and expanding transforms
    are legal, as with ``RDD.pipe``).

    Protocol contract on the INPUT side: cells are serialized with
    ``str(v)``, so input columns must be non-null and free of tabs and
    newlines — a null would reach the child as the literal string
    ``'None'``, and an embedded separator would shift every following
    field.  Callers coalesce nulls and strip separators in the scan
    projection first (see ``ext_pipe_transform``); map None to '' there
    explicitly if empty-string semantics are wanted.
    """
    out_schema = StructType.fromDDL(schema)
    names = [f.name for f in out_schema.fields]
    dtypes = {
        f.name: _PD_DTYPE.get(type(f.dataType), "object") for f in out_schema.fields
    }

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            text = (
                "\n".join(
                    "\t".join(str(v) for v in row)
                    for row in pdf.itertuples(index=False, name=None)
                )
                + "\n"
            )
            proc = subprocess.run(
                argv,
                input=text.encode("utf-8"),
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
            if proc.returncode != 0:
                raise RuntimeError(
                    f"pipe command {argv!r} exited {proc.returncode}: "
                    f"{proc.stderr.decode('utf-8', 'replace')[:500]}"
                )
            rows = [
                line.split("\t")
                for line in proc.stdout.decode("utf-8").splitlines()
                if line
            ]
            out = pd.DataFrame(rows, columns=names)
            yield out.astype(dtypes)

    return df.mapInPandas(run, schema=out_schema)


# awk field-splitting note: ``split($2, parts, " ")`` with a single-space
# separator is awk's special whitespace mode — leading/trailing runs are
# stripped and the count for an empty string is 0, which is exactly the
# token-count semantics the oracle mirrors with trim + regexp_split.
_AWK_TOKEN_COUNT = r'{ n = split($2, parts, " "); print $1 "\t" n }'


@register(
    "ext_pipe_transform",
    oracle="""
SELECT doc_id,
       CAST(CASE WHEN t = '' THEN 0
                 ELSE len(regexp_split_to_array(t, ' +')) END AS BIGINT)
         AS pipe_tokens
FROM (
  SELECT doc_id,
         trim(regexp_replace(coalesce(text, ''), '[\t\n\r]', ' ', 'g')) AS t
  FROM documents
)
ORDER BY doc_id
""",
)
def ext_pipe_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Script-transform boundary: documents piped through an external awk
    token counter (stand-in for the reference's per-file ``gdal_translate``
    fork, ``sources/meteosat.py:184-185``).

    The text is escaped TSV-safe (tab/newline → space) in the same scan
    projection, so the child sees one line per document; awk prints
    ``doc_id \\t token_count`` and the result is re-typed by the declared
    schema.  The oracle recomputes the count in SQL on the identically
    escaped text.
    """
    if shutil.which("awk") is None:
        # Fail fast in the driver with a clear message instead of a
        # mid-job executor subprocess error on minimal images.
        raise RuntimeError(
            "ext_pipe_transform needs a POSIX awk on PATH (checked on the "
            "driver; executors must match)"
        )
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.trim(
            F.regexp_replace(F.coalesce(F.col("text"), F.lit("")), "[\\t\\n\\r]", " ")
        ).alias("t"),
    )
    piped = pipe_transform(
        docs,
        ["awk", "-F", "\t", _AWK_TOKEN_COUNT],
        "doc_id bigint, pipe_tokens bigint",
    )
    return piped.orderBy("doc_id")
