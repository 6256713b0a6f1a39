"""UDF / UDAF / UDTF surface (SURVEY.md §2.9).

The reference's "UDFs" are library calls a relational engine can't express:
satpy composite math (``utils/conversion.py:11-13``), per-scene processing
loops (``sources/meteosat.py:150-185``), and the 1-response→N-products
explode (``utils/eumdacapi.py:53-65``).  Spark forms, in preference order:

1. built-in expressions (always first choice — see every other module),
2. Arrow-vectorized ``pandas_udf`` for scalar math over batches,
3. ``applyInPandas`` for whole-group transforms,
4. ``explode``/UDTF for row-generating functions.

Each query's oracle restates the same math in SQL, proving the
UDF path is value-identical to the relational path — the guarantee that
lets the engine swap a slow Python kernel for a builtin when one appears.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from ..catalog import table
from ..registry import register


@register(
    "udf_pandas_scalar",
    oracle="""
SELECT vec_id,
       round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                          x -> x * x))), 4) AS l2_norm
FROM embeddings
""",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar transform: L2 norm of the embedding column via an
    Arrow-batched pandas UDF — the band-math analog of the reference's
    composite generation (utils/conversion.py:13).  Arrow moves whole
    columns; numpy reduces each batch without a Python row loop."""

    @F.pandas_udf(DoubleType())
    def l2_norm(embs: pd.Series) -> pd.Series:
        import numpy as np

        return embs.map(
            lambda v: round(float(np.sqrt(np.sum(np.asarray(v, dtype=np.float64) ** 2))), 4)
        )

    emb = table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", l2_norm("embedding").alias("l2_norm"))


@register(
    "udf_grouped_map",
    oracle="""
SELECT doc_id, lang,
       round(n_chars - avg(n_chars) OVER (PARTITION BY lang), 4) AS chars_delta
FROM documents
""",
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group DataFrame transform via applyInPandas: demean n_chars
    within each language — the per-scene processing loop of
    sources/meteosat.py:150-185 as a grouped-map kernel.  One shuffle on
    the group key; each group arrives as a single pandas frame, so group
    cardinality must bound memory (languages, scenes — not user ids)."""

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["doc_id", "lang"]].copy()
        out["chars_delta"] = (pdf["n_chars"] - pdf["n_chars"].mean()).round(4)
        return out

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return docs.groupBy("lang").applyInPandas(
        demean, schema="doc_id long, lang string, chars_delta double"
    )


@register(
    "udtf_explode_products",
    oracle="""
SELECT p_partkey, u.word AS word
FROM part, unnest(str_split(p_name, ' ')) AS u(word)
""",
)
def udtf_explode_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-generating transform (1 → N): explode the name tokens — the
    shape of parsing one catalog response into N product rows
    (utils/eumdacapi.py:53-65).  Built-in explode keeps it JVM-side; a
    Python UDTF would only be warranted for imperative parsing."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey", F.explode(F.split("p_name", " ")).alias("word")
    )


@register(
    "udtf_python_parse",
    oracle="""
SELECT event_id, k AS prop_key,
       json_extract_string(props, '$.' || k) AS prop_value
FROM (SELECT event_id, props, unnest(json_keys(props)) AS k FROM events)
""",
)
def udtf_python_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Python UDTF (Spark 4 @udtf): imperatively parse each event's
    JSON props string into (key, value) rows — the 1-response→N-rows
    catalog parse (utils/eumdacapi.py:53-65) where the parsing logic is
    genuinely imperative.  The UDTF runs lateral per input row; contrast
    with udtf_explode_products where built-in explode suffices.  Use a
    UDTF only when the row-generation needs Python — it is Arrow-batched
    but still off the codegen path."""
    import json

    from pyspark.sql.functions import udtf

    @udtf(returnType="event_id bigint, prop_key string, prop_value string")
    class ParseProps:
        def eval(self, event_id, props):
            for k, v in json.loads(props).items():
                yield event_id, k, str(v)

    spark.udtf.register("parse_props", ParseProps)
    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("sdis_events_for_udtf")
    return spark.sql(
        """
        SELECT p.event_id, p.prop_key, p.prop_value
        FROM sdis_events_for_udtf e,
             LATERAL parse_props(e.event_id, e.props) p
        """
    )


@register(
    "udf_grouped_agg",
    oracle="""
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       round(avg(value), 4) AS trimmed_mean,
       CAST(count(*) AS BIGINT) AS n_kept
FROM r
WHERE rn > CAST(floor(n * 0.1) AS BIGINT)
  AND rn <= n - CAST(floor(n * 0.1) AS BIGINT)
GROUP BY event_type
""",
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate (UDAF) via a GROUPED_AGG pandas UDF: the
    10%-trimmed mean per event type — a reduction no single builtin
    expresses (robust location estimate for heavy-tailed quality
    metrics; the UDAF slot of §2.9's surface, completing scalar /
    grouped-map / table-function).

    Each group's values arrive as ONE Arrow-batched pandas Series and
    reduce to a scalar in numpy — group-size-bounded memory, one
    shuffle on the group key, exactly the contract of a JVM
    UntypedAggregate.  Trimming cuts floor(n/10) rows from each end of
    the VALUE order; ties make the cut position order-ambiguous but the
    trimmed multiset identical, so the mean is deterministic and the
    window-based SQL oracle replays it."""
    import numpy as np

    @F.pandas_udf("double")
    def trimmed_mean(v: pd.Series) -> float:
        s = np.sort(v.to_numpy(dtype=np.float64))
        k = int(len(s) // 10)
        kept = s[k : len(s) - k] if len(s) > 2 * k else s
        return float(np.mean(kept))

    @F.pandas_udf("long")
    def trimmed_count(v: pd.Series) -> int:
        n = len(v)
        return int(n - 2 * (n // 10))

    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(trimmed_mean("value"), 4).alias("trimmed_mean"),
        trimmed_count("value").alias("n_kept"),
    )


@register(
    "udtf_dynamic_schema",
    oracle="""
SELECT p_partkey,
       str_split(p_name, ' ')[1] AS c0,
       str_split(p_name, ' ')[2] AS c1
FROM part
""",
)
def udtf_dynamic_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze()`` static method):
    the output schema is COMPUTED AT PLAN TIME from a literal argument
    (here: how many delimited fields to split out) — the API for
    generic parse/pivot helpers whose shape depends on configuration,
    not a hardcoded returnType (``udtf_python_parse`` is the fixed-
    schema form).  ``analyze`` receives the literal, returns the
    AnalyzeResult schema, and Catalyst plans the lateral join against
    it like any other relation.

    The parse itself stays deterministic (plain split), so the result
    hash-matches a declarative twin.  UDTFs are Arrow-batched but off
    the codegen path — the point here is the ANALYZE surface, not
    performance; production use reserves it for imperative parsers."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType

    class SplitN:
        @staticmethod
        def analyze(row, n):
            from pyspark.sql.udtf import AnalyzeResult

            schema = StructType()
            for i in range(n.value):
                schema = schema.add(f"c{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, row, n):
            parts = (row or "").split(" ")
            yield tuple(parts[i] if i < len(parts) else None for i in range(n))

    u = udtf(SplitN)
    spark.udtf.register("sdis_split_n", u)
    p = table(spark, sf_dir, "part")
    p.createOrReplaceTempView("sdis_part_for_udtf")
    return spark.sql(
        """
        SELECT e.p_partkey, s.c0, s.c1
        FROM sdis_part_for_udtf e,
             LATERAL sdis_split_n(e.p_name, 2) s
        """
    )


@register(
    "udf_arrow_batch",
    oracle="""
SELECT doc_id,
       CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents ORDER BY doc_id
""",
)
def udf_arrow_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARROW-NATIVE BATCH TRANSFORM via ``mapInArrow`` — the zero-copy
    rung below the pandas UDFs (``udf_pandas_scalar`` round-trips
    through pandas Series; this touches the Arrow buffers directly with
    ``pyarrow.compute`` kernels, no pandas materialization), the right
    tool when the per-batch work is itself a columnar kernel (token
    counts here; at scale: tokenizers and feature extractors that
    consume Arrow).

    Engine parity is exact by construction: split-on-space token counts
    equal spaces+1 in both pyarrow ``split_pattern`` and DuckDB
    ``str_split``, and ``utf8_length`` counts characters like DuckDB
    ``length``.  One scan, a pure batch projection — Arrow batches
    stream through Python with whole-stage pipelining intact."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")

    def counts(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            toks = pc.split_pattern(batch.column("text"), " ")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.list_value_length(toks), pa.int64()),
                    pc.cast(pc.utf8_length(batch.column("text")), pa.int64()),
                ],
                ["doc_id", "n_tokens", "n_chars"],
            )

    return docs.mapInArrow(
        counts, schema="doc_id long, n_tokens long, n_chars long"
    ).orderBy("doc_id")
