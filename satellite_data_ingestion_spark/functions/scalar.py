"""Scalar function surface (SURVEY.md §2.7).

One registered query per scalar-function family the reference exercises:
timestamp truncation/format/parse/arithmetic (``sources/meteosat.py:74,90,
106-107,111,161``), string building and splitting (``sources/meteosat.py:
127,153,163,182``, ``utils/eumdacapi.py:56``), regex capture
(``utils/eumdacapi.py:70-71,81-83``), URL encoding (``utils/eumdacapi.py:75``),
JSON field access (``utils/eumdacapi.py:49-61``), map lookup with default
(``sources/meteosat.py:85-86,177``), array ops (``sources/meteosat.py:21-22,
180-181``) and grid math (``utils/conversion.py:15``).

Everything here is a built-in Catalyst expression — whole-stage-codegen'd,
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


@register(
    "fn_date_trunc",
    oracle="""
SELECT event_id,
       CAST(date_trunc('minute', ts) AS TIMESTAMP) AS ts_minute,
       CAST(date_trunc('hour', ts) AS TIMESTAMP)   AS ts_hour,
       CAST(date_trunc('day', ts) AS TIMESTAMP)    AS ts_day
FROM events
""",
)
def fn_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp truncation — the reference's minute-normalization of every
    key timestamp (sources/meteosat.py:74,111; utils/eumdacapi.py:58)."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_trunc("minute", "ts").alias("ts_minute"),
        F.date_trunc("hour", "ts").alias("ts_hour"),
        F.date_trunc("day", "ts").alias("ts_day"),
    )


@register(
    "fn_date_format",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ')     AS iso_z,
       strftime(o_orderdate, '%Y-%m-%dT%H:%M:00.000Z') AS iso_ms
FROM orders
""",
)
def fn_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """strftime-style formatting with the reference's two exact patterns
    (sources/meteosat.py:74,111,117 and :161)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("iso_z"),
        F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:'00.000Z'").alias("iso_ms"),
    )


@register(
    "fn_date_parse",
    oracle="""
SELECT o_orderkey,
       strptime(strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ'),
                '%Y-%m-%dT%H:%M:%SZ') AS parsed_ts
FROM orders
""",
)
def fn_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-8601 round-trip: format then parse back (the reference parses
    ISO strings everywhere: sources/meteosat.py:90, utils/eumdacapi.py:56,62)."""
    o = table(spark, sf_dir, "orders")
    iso = F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss'Z'")
    return o.select(
        "o_orderkey",
        F.to_timestamp(iso, "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("parsed_ts"),
    )


@register(
    "fn_ts_arith",
    oracle="""
SELECT o_orderkey,
       o_orderdate + INTERVAL 15 MINUTE AS next_slot,
       o_orderdate - INTERVAL 45 MINUTE AS lookback,
       o_orderdate + INTERVAL 90 DAY    AS horizon
FROM orders
""",
)
def fn_ts_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp ± interval — the slot advance (+15 min), bootstrap
    lookback (−45 min) and window arithmetic of sources/meteosat.py:90,93,
    106-107."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 15 MINUTES")).alias("next_slot"),
        (F.col("o_orderdate") - F.expr("INTERVAL 45 MINUTES")).alias("lookback"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("horizon"),
    )


@register(
    "fn_str_concat_fmt",
    oracle="""
SELECT l_orderkey, l_linenumber,
       'band' || CAST(l_linenumber AS VARCHAR) || '_' || l_returnflag || '_' ||
       strftime(l_shipdate, '%Y-%m-%d') || '.tif' AS file_name
FROM lineitem
""",
)
def fn_str_concat_fmt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filename construction via concatenation — the f-string building of
    sources/meteosat.py:127,153,163,182."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.concat(
            F.lit("band"),
            F.col("l_linenumber").cast("string"),
            F.lit("_"),
            F.col("l_returnflag"),
            F.lit("_"),
            F.date_format("l_shipdate", "yyyy-MM-dd"),
            F.lit(".tif"),
        ).alias("file_name"),
    )


@register(
    "fn_str_split",
    oracle="""
SELECT p_partkey,
       split_part(p_name, ' ', 1) AS first_word,
       split_part(p_name, ' ', 2) AS second_word
FROM part
""",
)
def fn_str_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-and-take — `props["date"].split("/")[0]`
    (utils/eumdacapi.py:56)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.split("p_name", " ").getItem(1).alias("second_word"),
    )


@register(
    "fn_regex_extract",
    oracle="""
SELECT p_partkey,
       regexp_extract('attachment; filename="' || p_name || '.zip"',
                      'filename="(.*?)"', 1) AS file_name
FROM part
""",
)
def fn_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lazy-group regex capture — the Content-Disposition filename
    extraction (utils/eumdacapi.py:70-71,81-83)."""
    p = table(spark, sf_dir, "part")
    header = F.concat(F.lit('attachment; filename="'), F.col("p_name"), F.lit('.zip"'))
    return p.select(
        "p_partkey",
        F.regexp_extract(header, r'filename="(.*?)"', 1).alias("file_name"),
    )


@register(
    "fn_urlencode",
    oracle="""
SELECT p_partkey,
       replace(replace(replace(p_brand || '/' || p_name,
                               '#', '%23'),
                       '/', '%2F'),
               ' ', '+') AS encoded
FROM part
""",
)
def fn_urlencode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL form-encoding (utils/eumdacapi.py:75) via Spark's built-in
    url_encode (JVM-side java.net.URLEncoder semantics: space → '+',
    reserved bytes → %XX).  DuckDB has no url_encode, but the input's
    non-alphanumeric charset is exactly {#, /, space} (pinned by
    tests/test_components.py::test_urlencode_oracle_charset_assumption),
    so a three-step replace chain IS the exact oracle; if the corpus ever
    grows new reserved characters the charset test fails before the hash
    does."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.url_encode(F.concat(F.col("p_brand"), F.lit("/"), F.col("p_name"))).alias(
            "encoded"
        ),
    )


@register(
    "fn_json_get",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
       json_extract_string(props, '$.missing')           AS prop_missing
FROM events
""",
)
def fn_json_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field access on a string column — response/props parsing
    (utils/eumdacapi.py:49,54-61; state JSON sources/meteosat.py:64-69).
    Missing keys yield NULL on both engines."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
        F.get_json_object("props", "$.missing").alias("prop_missing"),
    )


@register(
    "fn_map_get_default",
    oracle="""
SELECT event_id, event_type,
       CASE event_type
         WHEN 'purchase' THEN 10
         WHEN 'signup'   THEN 5
         WHEN 'error'    THEN -1
         ELSE 0
       END AS type_weight
FROM events
""",
)
def fn_map_get_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map lookup with a default — the `.get(key, default)` chains of
    sources/meteosat.py:85-86,177, done as a literal MapType lookup +
    coalesce (JVM-side; the oracle states the same function as CASE)."""
    ev = table(spark, sf_dir, "events")
    weights = F.create_map(
        F.lit("purchase"), F.lit(10),
        F.lit("signup"), F.lit(5),
        F.lit("error"), F.lit(-1),
    )
    return ev.select(
        "event_id",
        "event_type",
        F.coalesce(F.element_at(weights, F.col("event_type")), F.lit(0)).alias(
            "type_weight"
        ),
    )


@register(
    "fn_array_ops",
    oracle="""
SELECT vec_id,
       len(embedding)                                   AS dim,
       CAST(embedding[1] AS DOUBLE)                     AS first_elem,
       CAST(embedding[len(embedding)] AS DOUBLE)        AS last_elem,
       round(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                     x -> x * 2.0)), 4) AS sum_doubled
FROM embeddings
""",
)
def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array literal/iteration surface — size, element access, transform,
    fold (the reference iterates band lists, sources/meteosat.py:180-181)."""
    emb = table(spark, sf_dir, "embeddings")
    doubled = F.transform(
        F.col("embedding").cast("array<double>"), lambda x: x * F.lit(2.0)
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_elem"),
        F.element_at("embedding", -1).cast("double").alias("last_elem"),
        F.round(
            F.aggregate(doubled, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("sum_doubled"),
    )


@register(
    "fn_math_grid",
    oracle="""
SELECT event_id,
       CAST(floor((value + 180.0) / 0.035) AS BIGINT) AS cell,
       round(value, 2)                                AS val_round,
       abs(value - 50.0)                              AS val_dist,
       CAST(ceil(value) AS BIGINT)                    AS val_ceil,
       value % 7.0                                    AS val_mod
FROM events
""",
)
def fn_math_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-cell math: floor/scale at the reference's 0.035° resolution
    (utils/conversion.py:15) plus round/abs/ceil/mod."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.floor((F.col("value") + 180.0) / 0.035).alias("cell"),
        F.round("value", 2).alias("val_round"),
        F.abs(F.col("value") - 50.0).alias("val_dist"),
        F.ceil("value").cast("long").alias("val_ceil"),
        (F.col("value") % 7.0).alias("val_mod"),
    )


@register(
    "fn_str_distance",
    oracle="""
SELECT d.doc_id,
       levenshtein(d.source, 'src1') AS lev_to_src1,
       CASE WHEN d.source = 'src1' THEN 0.0
            ELSE round(1.0 - CAST(levenshtein(d.source, 'src1') AS DOUBLE)
                       / greatest(length(d.source), 4), 4) END AS similarity
FROM documents d
""",
)
def fn_str_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance scalar: levenshtein against a probe string plus the
    normalized similarity used for fuzzy key matching — entity resolution
    and near-key joins do this before resorting to pairwise dedup."""
    docs = table(spark, sf_dir, "documents")
    lev = F.levenshtein("source", F.lit("src1"))
    return docs.select(
        "doc_id",
        lev.alias("lev_to_src1"),
        F.when(F.col("source") == "src1", F.lit(0.0))
        .otherwise(
            F.round(
                1.0 - lev.cast("double") / F.greatest(F.length("source"), F.lit(4)),
                4,
            )
        )
        .alias("similarity"),
    )


@register(
    "fn_hash_ids",
    oracle="""
SELECT o_orderkey,
       md5(CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus) AS row_md5,
       sha256(CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus) AS row_sha256
FROM orders
""",
)
def fn_hash_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-derived row IDs: md5 / sha-256 over a
    delimited key projection — the stable surrogate-key pattern for
    cross-system record matching (both digests are engine-independent,
    unlike xxhash64, which is Spark-specific and kept for internal
    bucketing only)."""
    o = table(spark, sf_dir, "orders")
    keyed = F.concat_ws("|", F.col("o_orderkey").cast("string"), "o_orderstatus")
    return o.select(
        "o_orderkey",
        F.md5(keyed).alias("row_md5"),
        F.sha2(keyed, 256).alias("row_sha256"),
    )


@register(
    "fn_conditional",
    oracle="""
SELECT event_id,
       CASE WHEN value >= 66 THEN 'high' WHEN value >= 33 THEN 'mid'
            ELSE 'low' END                              AS band,
       coalesce(nullif(event_type, 'error'), 'masked')  AS type_masked,
       least(value, 50.0)                               AS capped,
       greatest(value, 50.0)                            AS floored,
       CASE WHEN value = 0 THEN NULL ELSE round(100.0 / value, 6) END AS inv_pct
FROM events
""",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/null-safe scalar battery: CASE banding, nullif+coalesce
    masking, least/greatest clamping, and division guarded against zero
    (the try_divide pattern written portably).  All fold into one codegen
    projection — branchy row logic does NOT need a UDF."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("value") >= 66, "high")
        .when(F.col("value") >= 33, "mid")
        .otherwise("low")
        .alias("band"),
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("masked")).alias(
            "type_masked"
        ),
        F.least("value", F.lit(50.0)).alias("capped"),
        F.greatest("value", F.lit(50.0)).alias("floored"),
        F.when(F.col("value") == 0, F.lit(None)).otherwise(
            F.round(100.0 / F.col("value"), 6)
        ).alias("inv_pct"),
    )


@register(
    "fn_datetime_extract",
    oracle="""
SELECT event_id,
       CAST(year(ts) AS INT)      AS y,
       CAST(month(ts) AS INT)     AS mo,
       CAST(day(ts) AS INT)       AS d,
       CAST(hour(ts) AS INT)      AS h,
       CAST(minute(ts) AS INT)    AS mi,
       CAST(isodow(ts) AS INT)    AS iso_dow,
       CAST(weekofyear(ts) AS INT) AS iso_week,
       CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
FROM events
""",
)
def fn_datetime_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime field extraction battery: calendar parts, ISO day-of-week
    and week number, epoch seconds.  All codegen'd; note dayofweek() is
    Sunday=1 in Spark, so ISO semantics need weekday()+1 — pinned by the
    oracle against DuckDB's isodow."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        (F.weekday("ts") + 1).cast("int").alias("iso_dow"),
        F.weekofyear("ts").alias("iso_week"),
        F.unix_timestamp("ts").alias("epoch_s"),
    )


@register(
    "fn_haversine",
    oracle="""
SELECT event_id,
       round(2 * 6371.0 * asin(sqrt(
         sin(radians(((user_id % 60) - 30.0) - ((value % 60.0) - 30.0)) / 2)
           * sin(radians(((user_id % 60) - 30.0) - ((value % 60.0) - 30.0)) / 2)
         + cos(radians((value % 60.0) - 30.0)) * cos(radians((user_id % 60) - 30.0))
           * sin(radians(((event_id % 360) - 180.0) - ((value % 360.0) - 180.0)) / 2)
           * sin(radians(((event_id % 360) - 180.0) - ((value % 360.0) - 180.0)) / 2)
       )), 4) AS dist_km
FROM events
""",
)
def fn_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle (haversine) distance battery — the geo scalar a
    satellite-data engine needs beyond bbox filters (reference clips to
    a lat/lon extent, sources/meteosat.py:36; distance-to-target is the
    next question users ask).  Coordinates are derived deterministically
    from event columns (value/user_id/event_id modular arithmetic, the
    same synthetic-coordinate trick the resample operators use); the
    whole expression is one codegen projection — no UDF, no shuffle.
    Rounded to 4 decimals so the engines' last-ulp libm differences
    cannot surface."""
    ev = table(spark, sf_dir, "events")
    lat1 = (F.col("value") % 60.0) - 30.0
    lat2 = ((F.col("user_id") % 60).cast("double")) - 30.0
    lon1 = (F.col("value") % 360.0) - 180.0
    lon2 = ((F.col("event_id") % 360).cast("double")) - 180.0
    dphi = F.radians(lat2 - lat1) / 2
    dlmb = F.radians(lon2 - lon1) / 2
    h = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlmb) * F.sin(dlmb)
    )
    return ev.select(
        "event_id",
        F.round(2 * 6371.0 * F.asin(F.sqrt(h)), 4).alias("dist_km"),
    )


@register(
    "fn_observe_metrics",
    oracle="""
SELECT CAST(count(*) AS BIGINT)                        AS n_rows,
       CAST(count_if(value IS NULL) AS BIGINT)         AS n_null_value,
       CAST(count_if(value > 0.9) AS BIGINT)           AS n_high,
       round(sum(coalesce(value, 0)), 4)               AS sum_value
FROM events
""",
)
def fn_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline OBSERVABILITY via ``df.observe()``: named metrics ride
    along with a real pass over the data and surface on the driver after
    the action — row counts, null counts, threshold counts, checksums —
    WITHOUT a second scan.  This is how a 100 TB ingest job emits its
    data-quality counters: the metrics are accumulator-style (computed
    inside the same tasks that do the real work), so auditing costs
    nothing beyond the expressions themselves.  Here the observed batch
    is written through a noop-equivalent count and the observation dict
    is returned as the result row; the oracle recomputes every metric
    relationally — a drifted counter (lost task, double-counted retry)
    hash-mismatches."""
    from pyspark.sql import Observation

    ev = table(spark, sf_dir, "events")
    obs = Observation("ingest_metrics")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("value").isNull()).alias("n_null_value"),
        F.count_if(F.col("value") > 0.9).alias("n_high"),
        F.round(F.sum(F.coalesce(F.col("value"), F.lit(0.0))), 4).alias(
            "sum_value"
        ),
    )
    observed.write.format("noop").mode("overwrite").save()  # the real pass
    m = obs.get
    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                int(m["n_null_value"]),
                int(m["n_high"]),
                float(m["sum_value"]),
            )
        ],
        "n_rows long, n_null_value long, n_high long, sum_value double",
    )


@register(
    "fn_variant",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       CAST(count(*) AS BIGINT)                               AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT)                                        AS sum_k
FROM events
GROUP BY CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
""",
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VARIANT type (Spark 4 / the open-lakehouse semi-structured
    story): ``parse_json`` parses each payload ONCE into the binary
    variant encoding, and ``variant_get`` extracts typed fields without
    re-parsing — the difference from ``fn_json_get``'s per-extraction
    string parsing that dominates at many-fields-per-row scale.  The
    extraction, bucketing, and aggregate all hash-match a plain JSON
    oracle, proving the encoded round-trip is lossless."""
    ev = table(spark, sf_dir, "events").select(
        F.parse_json("props").alias("v")
    )
    k = F.expr('variant_get(v, "$.k", "bigint")')
    return (
        ev.select((k % 10).alias("k_bucket"), k.alias("kval"))
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("kval").cast("long").alias("sum_k"),
        )
    )


# Geohash geometry: 15 bits per axis -> 30-bit cell -> 6 base32 chars.
# SEMANTIC constants (baked into the oracle).
_GH_BITS = 15
_GH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _gh_interleave(lon_q: str, lat_q: str, dialect: str) -> str:
    """30-bit geohash cell id: longitude bits on the even stream
    positions (the geohash convention — lon bit j lands at weight
    2^(2j+1), lat bit j at 2^(2j)).  Same integer arithmetic in both
    dialects, only the shift spelling differs."""
    terms = []
    for j in range(_GH_BITS):
        if dialect == "spark":
            terms.append(f"shiftleft(shiftright({lon_q}, {j}) & 1, {2 * j + 1})")
            terms.append(f"shiftleft(shiftright({lat_q}, {j}) & 1, {2 * j})")
        else:
            terms.append(f"((({lon_q} >> {j}) & 1) << {2 * j + 1})")
            terms.append(f"((({lat_q} >> {j}) & 1) << {2 * j})")
    return "(" + " + ".join(terms) + ")"


def _gh_chars(zval: str, dialect: str) -> str:
    """6-char base32 rendering of a 30-bit cell id (5 bits per char,
    most significant first)."""
    fn = "substring" if dialect == "spark" else "substr"
    parts = [
        f"{fn}('{_GH_ALPHABET}', cast((({zval} >> {25 - 5 * j}) & 31) + 1 as int), 1)"
        if dialect == "duckdb"
        else f"{fn}('{_GH_ALPHABET}', cast(shiftright({zval}, {25 - 5 * j}) & 31 as int) + 1, 1)"
        for j in range(6)
    ]
    return "concat(" + ", ".join(parts) + ")"


@register(
    "fn_geohash",
    oracle=f"""
WITH q AS (
  SELECT event_id,
         ((event_id % 360 - 180 + 180) * {1 << _GH_BITS}) // 360 AS lon_q,
         ((user_id % 180 - 90 + 90) * {1 << _GH_BITS}) // 180  AS lat_q
  FROM events
), z AS (
  SELECT event_id,
         {_gh_interleave("lon_q", "lat_q", "duckdb")} AS cell_id
  FROM q
)
SELECT event_id, cell_id, {_gh_chars("cell_id", "duckdb")} AS geohash
FROM z
""",
)
def fn_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEOHASH encoding (precision 6) — the standard spatial bucketing
    key for distributing geo workloads: prefix-truncating a geohash
    coarsens the cell, so geohash prefixes serve as shuffle/partition
    keys for proximity joins and as Hive partition values for spatial
    pruning (the reference clips to a lat/lon extent,
    ``sources/meteosat.py:36``; a geohash-partitioned layout makes that
    clip a partition filter).

    Coordinates derive from integer columns, so quantization is EXACT
    integer arithmetic (``(deg + offset) * 2^15 div range``) — no float
    boundary risk — and the bit interleave + base32 rendering is the
    same expression tree in Spark and DuckDB.  The whole encoder is one
    codegen projection: no UDF, no shuffle, linear scan at any scale.
    The component test pins equality with the classic bisection
    algorithm."""
    ev = table(spark, sf_dir, "events")
    staged = ev.selectExpr(
        "event_id",
        f"((event_id % 360 - 180 + 180) * {1 << _GH_BITS}) div 360 as lon_q",
        f"((user_id % 180 - 90 + 90) * {1 << _GH_BITS}) div 180 as lat_q",
    ).selectExpr(
        "event_id",
        _gh_interleave("lon_q", "lat_q", "spark") + " as cell_id",
    )
    return staged.selectExpr(
        "event_id", "cell_id", _gh_chars("cell_id", "spark") + " as geohash"
    )


@register(
    "fn_base64",
    oracle="""
SELECT n_nationkey,
       base64(encode(n_name))                       AS b64,
       decode(from_base64(base64(encode(n_name))))  AS roundtrip,
       CAST(octet_length(encode(n_name)) AS BIGINT) AS n_bytes
FROM nation
""",
)
def fn_base64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base64 encode/decode round-trip battery — the wire-format codec
    binary payloads cross system boundaries in (webhook bodies, JSON-
    embedded blobs).  Both engines implement RFC 4648 standard base64,
    so the encoded text itself hash-matches, and the decoded round-trip
    must equal the source byte-for-byte.  Pure codegen projection."""
    n = table(spark, sf_dir, "nation")
    enc = F.base64(F.encode("n_name", "utf-8"))
    return n.select(
        "n_nationkey",
        enc.alias("b64"),
        F.decode(F.unbase64(enc), "utf-8").alias("roundtrip"),
        F.octet_length("n_name").cast("long").alias("n_bytes"),
    )


# Fixed survey polygon for the point-in-polygon test: a CONCAVE pentagon
# (vertex 4 pulled inward) with non-round coordinates so the synthetic
# modular points never land exactly on an edge.
_PIP_POLY = [(1.3, 1.1), (8.7, 0.9), (9.1, 6.3), (5.0, 3.7), (2.2, 7.9)]


def _pip_terms_sql() -> str:
    """DuckDB ray-casting crossing terms for the fixed polygon."""
    terms = []
    v = _PIP_POLY
    for i in range(len(v)):
        x1, y1 = v[i]
        x2, y2 = v[(i + 1) % len(v)]
        terms.append(
            f"CASE WHEN (({y1} > py) <> ({y2} > py)) AND "
            f"(px < ({x2} - {x1}) * (py - {y1}) / ({y2} - {y1}) + {x1}) "
            f"THEN 1 ELSE 0 END"
        )
    return " + ".join(terms)


@register(
    "fn_point_in_polygon",
    oracle=f"""
SELECT pt_id, round(px, 6) AS px, round(py, 6) AS py,
       (({_pip_terms_sql()}) % 2 = 1) AS inside
FROM (
  SELECT l_orderkey * 100 + l_linenumber AS pt_id,
         l_extendedprice % 10.0 AS px,
         (l_quantity * 1.7) % 10.0 AS py
  FROM lineitem
)
""",
)
def fn_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon test (ray casting / even-odd rule) against a
    fixed CONCAVE survey polygon — the geofencing primitive of the
    spatial family (fn_haversine = distance, filter_bbox = rectangle,
    join_spatial_nearest = NN; this one is arbitrary-shape containment,
    e.g. the reference's Africa clip extent as a true polygon instead of
    its bbox, sources/meteosat.py:36).

    The polygon is FIXED, so the even-odd crossing count unrolls into V
    codegen CASE terms — a pure projection, no UDF, no join, no shuffle;
    both engines evaluate the identical double arithmetic so the
    booleans hash-match.  At 100 TB: for polygon SETS, band the plane
    (the join_interval_overlap bucketing) and broadcast per-band edge
    lists; the per-point cost stays O(edges in band)."""
    li = table(spark, sf_dir, "lineitem")
    px = F.col("l_extendedprice") % 10.0
    py = (F.col("l_quantity") * 1.7) % 10.0
    pts = li.select(
        (F.col("l_orderkey") * 100 + F.col("l_linenumber")).alias("pt_id"),
        px.alias("px"),
        py.alias("py"),
    )
    crossings = None
    v = _PIP_POLY
    for i in range(len(v)):
        x1, y1 = v[i]
        x2, y2 = v[(i + 1) % len(v)]
        cond = (
            (F.lit(y1) > F.col("py")) != (F.lit(y2) > F.col("py"))
        ) & (
            F.col("px")
            < (F.lit(x2) - F.lit(x1))
            * (F.col("py") - F.lit(y1))
            / (F.lit(y2) - F.lit(y1))
            + F.lit(x1)
        )
        term = F.when(cond, 1).otherwise(0)
        crossings = term if crossings is None else crossings + term
    return pts.select(
        "pt_id",
        F.round("px", 6).alias("px"),
        F.round("py", 6).alias("py"),
        ((crossings % 2) == 1).alias("inside"),
    )


@register(
    "fn_ip_parse",
    oracle="""
WITH ips AS (
  SELECT event_id,
         (CASE CAST(event_id % 4 AS INT)
            WHEN 0 THEN 10 WHEN 1 THEN 172 WHEN 2 THEN 192
            ELSE CAST(event_id % 223 AS INT) + 1 END)
         || '.' || CAST(event_id % 256 AS BIGINT)
         || '.' || CAST((event_id // 7) % 256 AS BIGINT)
         || '.' || CAST((event_id // 11) % 256 AS BIGINT) AS ip
  FROM events
), parsed AS (
  SELECT event_id, ip,
         CAST(string_split(ip, '.')[1] AS BIGINT) AS a,
         CAST(string_split(ip, '.')[2] AS BIGINT) AS b,
         CAST(string_split(ip, '.')[3] AS BIGINT) AS c,
         CAST(string_split(ip, '.')[4] AS BIGINT) AS d
  FROM ips
)
SELECT event_id, ip,
       CAST(a * 16777216 + b * 65536 + c * 256 + d AS BIGINT) AS ip_num,
       (a = 10 OR (a = 172 AND b BETWEEN 16 AND 31)
               OR (a = 192 AND b = 168)) AS is_private,
       ((a * 16777216 + b * 65536 + c * 256 + d) // 65536
          = 10 * 256 + 40) AS in_subnet_10_40
FROM parsed
""",
)
def fn_ip_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 anatomy: dotted-quad → 32-bit integer, RFC 1918 private-range
    classification, and CIDR-block membership (10.40.0.0/16 as the probe
    block) — the telemetry/security-log enrichment battery.  IPs are
    synthesized deterministically from event_id (the corpus carries no
    address column — the URL-battery posture), mixing all three private
    ranges with public space; the Spark side must PARSE the string back.

    Execution: pure projection — split + arithmetic in whole-stage
    codegen, CIDR membership is one integer divide (prefix compare), no
    UDF, no shuffle.  At 100 TB: a blocklist of CIDR ranges joins the
    same way the URL blocklist does — broadcast range table, prefix-int
    equality per mask length."""
    events = table(spark, sf_dir, "events")
    eid = F.col("event_id")
    a_oct = (
        F.when(eid % 4 == 0, F.lit(10))
        .when(eid % 4 == 1, F.lit(172))
        .when(eid % 4 == 2, F.lit(192))
        .otherwise((eid % 223).cast("int") + 1)
    )
    ip = F.concat_ws(
        ".",
        a_oct.cast("string"),
        (eid % 256).cast("long").cast("string"),
        (F.floor(eid / 7) % 256).cast("long").cast("string"),
        (F.floor(eid / 11) % 256).cast("long").cast("string"),
    )
    ips = events.select("event_id", ip.alias("ip"))
    parts = F.split("ip", r"\.")
    a = F.element_at(parts, 1).cast("long")
    b = F.element_at(parts, 2).cast("long")
    c = F.element_at(parts, 3).cast("long")
    d = F.element_at(parts, 4).cast("long")
    ip_num = (a * 16777216 + b * 65536 + c * 256 + d).cast("long")
    return ips.select(
        "event_id",
        "ip",
        ip_num.alias("ip_num"),
        (
            (a == 10)
            | ((a == 172) & b.between(16, 31))
            | ((a == 192) & (b == 168))
        ).alias("is_private"),
        (F.floor(ip_num / 65536) == 10 * 256 + 40).alias("in_subnet_10_40"),
    )


_UA_BROWSERS = ["Chrome/120.0", "Firefox/121.0", "Safari/17.2", "curl/8.4"]
_UA_OSES = ["Windows NT 10.0", "Macintosh", "X11; Linux x86_64"]


@register(
    "fn_user_agent_parse",
    oracle=f"""
WITH uas AS (
  SELECT event_id,
         CASE WHEN event_id % 11 = 0
              THEN 'Googlebot/2.1 (+http://www.google.com/bot.html)'
              ELSE 'Mozilla/5.0 ('
                   || (['Windows NT 10.0','Macintosh','X11; Linux x86_64'])[CAST(event_id % 3 AS INT) + 1]
                   || ') '
                   || (['Chrome/120.0','Firefox/121.0','Safari/17.2','curl/8.4'])[CAST(event_id % 4 AS INT) + 1]
         END AS ua
  FROM events
)
SELECT event_id, ua,
       CASE WHEN contains(lower(ua), 'bot') THEN 'bot'
            ELSE regexp_extract(ua, '([A-Za-z]+)/[0-9][0-9.]*[^ ]*$', 1) END AS browser,
       CASE WHEN contains(lower(ua), 'bot') THEN ''
            ELSE regexp_extract(ua, '/([0-9][0-9.]*)[^ ]*$', 1) END AS version,
       CASE WHEN contains(ua, 'Windows') THEN 'windows'
            WHEN contains(ua, 'Macintosh') THEN 'macos'
            WHEN contains(ua, 'Linux') THEN 'linux'
            ELSE 'other' END AS os,
       contains(lower(ua), 'bot') OR contains(ua, 'curl') AS is_bot
FROM uas
""",
)
def fn_user_agent_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-agent anatomy: browser family + version, OS family, and a
    bot/automation flag — the third member of the telemetry-enrichment
    trio (fn_ip_parse, ext_url_parse).  UA strings are synthesized
    deterministically from event_id (browser x OS grid with a Googlebot
    slice every 11th event); the Spark side must parse the STRING —
    trailing product/version token for the browser, marker substrings
    for OS and bot-ness.

    Execution: pure regexp/contains projection in whole-stage codegen —
    no UDF, no shuffle; the classic UA-parser libraries are regex tables
    at heart, and a broadcast rule table is the 100 TB extension."""
    events = table(spark, sf_dir, "events")
    eid = F.col("event_id")
    os_arr = F.array(*[F.lit(o) for o in _UA_OSES])
    br_arr = F.array(*[F.lit(b) for b in _UA_BROWSERS])
    ua = F.when(
        eid % 11 == 0, F.lit("Googlebot/2.1 (+http://www.google.com/bot.html)")
    ).otherwise(
        F.concat(
            F.lit("Mozilla/5.0 ("),
            F.element_at(os_arr, (eid % 3).cast("int") + 1),
            F.lit(") "),
            F.element_at(br_arr, (eid % 4).cast("int") + 1),
        )
    )
    uas = events.select("event_id", ua.alias("ua"))
    is_bot_marker = F.lower(F.col("ua")).contains("bot")
    return uas.select(
        "event_id",
        "ua",
        F.when(is_bot_marker, F.lit("bot"))
        .otherwise(F.regexp_extract("ua", r"([A-Za-z]+)/[0-9][0-9.]*[^ ]*$", 1))
        .alias("browser"),
        F.when(is_bot_marker, F.lit(""))
        .otherwise(F.regexp_extract("ua", r"/([0-9][0-9.]*)[^ ]*$", 1))
        .alias("version"),
        F.when(F.col("ua").contains("Windows"), F.lit("windows"))
        .when(F.col("ua").contains("Macintosh"), F.lit("macos"))
        .when(F.col("ua").contains("Linux"), F.lit("linux"))
        .otherwise(F.lit("other"))
        .alias("os"),
        (is_bot_marker | F.col("ua").contains("curl")).alias("is_bot"),
    )


@register(
    "fn_business_day",
    oracle="""
SELECT event_id,
       CAST(ts AS DATE) AS d,
       CAST((date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 4) % 7 AS BIGINT) AS dow,
       ((date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 4) % 7) IN (5, 6) AS is_weekend,
       CAST(ts AS DATE) + CAST(
         CASE (date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 4) % 7
           WHEN 4 THEN 3 WHEN 5 THEN 2 ELSE 1 END AS INT) AS next_business_day
FROM events
""",
)
def fn_business_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUSINESS-DAY calendar math: day-of-week, weekend flag, and the
    next business day per event — the settlement/SLA-deadline primitive.
    Day-of-week comes from EPOCH-DAY ARITHMETIC ((days + 4) % 7 with
    Monday = 0; 1970-01-01 was a Thursday), NOT from each engine's
    dayofweek() — their numbering conventions differ (Spark 1 = Sunday,
    DuckDB 0 = Sunday), which is exactly the cross-system bug this
    formulation removes.  Friday jumps 3 days, Saturday 2, else 1.

    Pure projection, integer date math, no timezone surface (the
    session pins UTC and the arithmetic never leaves DATE grain)."""
    events = table(spark, sf_dir, "events")
    d = F.to_date("ts")
    days = F.datediff(d, F.lit("1970-01-01"))
    dow = ((days + 4) % 7).cast("long")
    jump = (
        F.when(dow == 4, 3).when(dow == 5, 2).otherwise(1)
    ).cast("int")
    return events.select(
        "event_id",
        d.alias("d"),
        dow.alias("dow"),
        dow.isin(5, 6).alias("is_weekend"),
        F.date_add(d, jump).alias("next_business_day"),
    )


@register(
    "fn_csv_render",
    oracle="""
SELECT o_orderkey,
       o_orderkey
       || ',' ||
       CASE WHEN contains(o_orderpriority, ',') OR contains(o_orderpriority, '"')
                 OR contains(o_orderpriority, chr(10))
            THEN '"' || replace(o_orderpriority, '"', '""') || '"'
            ELSE o_orderpriority END
       || ',' ||
       CASE WHEN contains(o_orderstatus || '-' || o_orderpriority, ',')
                 OR contains(o_orderstatus || '-' || o_orderpriority, '"')
            THEN '"' || replace(o_orderstatus || '-' || o_orderpriority, '"', '""') || '"'
            ELSE o_orderstatus || '-' || o_orderpriority END AS csv_line
FROM orders
""",
)
def fn_csv_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC-4180 CSV RENDERING — the write-side twin of
    ``scan_csv_corrupt``'s parse side: fields containing commas, quotes,
    or newlines are quoted with doubled inner quotes (the priority
    column's '1-URGENT, etc.' values genuinely trigger it).  A hand-
    rolled exporter that skips these rules produces files the PERMISSIVE
    reader then quarantines — the two ops close the loop.

    Pure codegen string projection; identical escape logic stated in
    both engines, so every quoting decision is hash-checked."""
    o = table(spark, sf_dir, "orders")

    def esc(col):
        needs = (
            col.contains(",") | col.contains('"') | col.contains("\n")
        )
        return F.when(
            needs,
            F.concat(
                F.lit('"'), F.regexp_replace(col, '"', '""'), F.lit('"')
            ),
        ).otherwise(col)

    combo = F.concat(F.col("o_orderstatus"), F.lit("-"), F.col("o_orderpriority"))
    line = F.concat(
        F.col("o_orderkey").cast("string"),
        F.lit(","),
        esc(F.col("o_orderpriority")),
        F.lit(","),
        esc(combo),
    )
    return o.select("o_orderkey", line.alias("csv_line"))


@register(
    "fn_try_arith",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(floor(l_extendedprice / nullif(l_quantity, 0)) AS BIGINT)
         AS unit_price_floor,
       TRY_CAST(CASE WHEN l_orderkey % 2 = 0
                     THEN CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)
                     ELSE l_returnflag END AS BIGINT) AS mixed_as_number,
       CASE WHEN l_quantity > 0
            THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                 // CAST(l_quantity AS BIGINT)
       END AS cents_per_unit
FROM lineitem
WHERE l_linenumber = 1
""",
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-SAFE arithmetic battery: Spark 4 runs with
    ``spark.sql.ansi.enabled`` defaulting TRUE, so a division by zero
    or a bad cast KILLS the query unless the ``try_*`` family guards it
    — this operator pins the production error-handling semantics
    (try_divide → NULL on zero, try_cast → NULL on malformed input,
    guarded integral division) against DuckDB's nullif/TRY_CAST twins.
    The difference matters at 100 TB: one corrupt row must yield one
    NULL, not a dead 6-hour job (the batch-format version of what
    ``scan_csv_corrupt``/``scan_jsonl_corrupt`` pin for sources).

    Pure whole-stage-codegen projections; no shuffle."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor(F.try_divide(F.col("l_extendedprice"), F.nullif("l_quantity", F.lit(0))))
        .cast("long")
        .alias("unit_price_floor"),
        # A mixed numeric/alpha string: the even half parses, the flag
        # half yields NULL instead of an ANSI CAST_INVALID_INPUT error.
        F.try_to_number(
            F.when(
                F.col("l_orderkey") % 2 == 0,
                F.col("l_quantity").cast("long").cast("string"),
            ).otherwise(F.col("l_returnflag")),
            F.lit("999999"),
        )
        .cast("long")
        .alias("mixed_as_number"),
        F.when(
            F.col("l_quantity") > 0,
            F.try_divide(
                F.round(F.col("l_extendedprice") * 100).cast("long"),
                F.col("l_quantity").cast("long"),
            ).cast("long"),
        ).alias("cents_per_unit"),
    )


@register(
    "fn_xml_extract",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_orderpriority AS prio,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 100 = 0
)
SELECT prio, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       CAST(max(o_orderkey) AS BIGINT) AS max_key
FROM base GROUP BY 1 ORDER BY 1
""",
)
def fn_xml_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ROUND-TRIP: render each order as an XML fragment (attribute +
    entity-escaped text nodes — '&' exercised via a synthetic
    ``prio & status`` field) and recover every value through Spark's
    ``xpath_string``/``xpath_long`` before aggregating.  Pins the XML
    ingestion surface (feeds/config payloads riding a string column —
    the XML sibling of ``fn_json_get``): entity escaping must invert
    exactly, attributes and text nodes both reachable.  The oracle
    aggregates the SAME figures from the base columns, so any
    escape/parse defect breaks the value hash.

    xpath_* are per-row JVM expressions (no UDF, no shuffle); the
    census groupBy is map-side combined.  The %100 gate keeps the
    output grain constant across SFs."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    esc = F.expr(
        "replace(replace(replace(concat(o_orderpriority, ' & ', o_orderstatus),"
        " '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
    )
    xml = F.format_string(
        '<order id="%s"><note>%s</note><prio>%s</prio><cents>%s</cents></order>',
        F.col("o_orderkey"),
        esc,
        F.col("o_orderpriority"),
        F.round(F.col("o_totalprice") * 100).cast("long"),
    )
    parsed = o.select(xml.alias("x")).select(
        F.expr("xpath_long(x, '/order/@id')").alias("okey"),
        F.expr("xpath_string(x, '/order/note')").alias("note"),
        F.expr("xpath_string(x, '/order/prio')").alias("prio"),
        F.expr("xpath_long(x, '/order/cents')").alias("cents"),
    )
    # The decoded note must start with the raw prio — a parse-time
    # assertion folded into the plan (rows failing it would change the
    # aggregate and break the oracle hash).
    checked = parsed.filter(F.col("note").startswith(F.col("prio")))
    return (
        checked.groupBy("prio")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("sum_cents"),
            F.max("okey").cast("long").alias("max_key"),
        )
        .orderBy("prio")
    )


@register(
    "agg_bitmap_flags",
    oracle="""
WITH tix AS (
  SELECT event_type,
         CAST(row_number() OVER (ORDER BY event_type) - 1 AS BIGINT) AS idx
  FROM (SELECT DISTINCT event_type FROM events)
),
flags AS (
  SELECT e.user_id,
         CAST(sum(DISTINCT (1::BIGINT << tix.idx)) AS BIGINT) AS mask
  FROM events e JOIN tix USING (event_type)
  GROUP BY 1
)
SELECT mask, CAST(count(*) AS BIGINT) AS n_users,
       CAST(bit_count(mask) AS BIGINT) AS n_types
FROM flags GROUP BY 1 ORDER BY mask
""",
)
def agg_bitmap_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITMAP FLAG ROLLUP: per-user event-type set packed into one int64
    bitmask (bit index = rank of the type in sorted order), then the
    mask census with popcounts — the feature-flag / segment-membership
    encoding that turns set-containment questions into integer AND
    masks (the exact-small-domain sibling of the bloom/HLL sketches).

    A |types|-row ranked index joins onto events (unhinted — AQE
    broadcasts the tiny build side), the per-user OR-fold is
    ``bit_or(1 << idx)`` — map-side combinable, one user exchange —
    and the census is a second combinable groupBy.  DuckDB lacks a
    bitwise-or aggregate over the same name, so the oracle folds
    ``sum(DISTINCT 1 << idx)`` — identical because the per-user set of
    single-bit values is distinct by construction."""
    ev = table(spark, sf_dir, "events")
    from pyspark.sql import Window

    tix = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            (F.row_number().over(Window.orderBy("event_type")) - 1)
            .cast("long")
            .alias("idx"),
        )
    )
    flags = (
        ev.join(tix, "event_type")
        .groupBy("user_id")
        .agg(F.expr("bit_or(shiftleft(1L, cast(idx AS INT)))").alias("mask"))
    )
    return (
        flags.groupBy("mask")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.bit_count("mask").cast("long").alias("n_types"),
        )
        .orderBy("mask")
    )


@register(
    "fn_recursive_cte",
    oracle="""
WITH RECURSIVE bounds AS (
  SELECT date_trunc('month', min(o_orderdate)) AS lo,
         date_trunc('month', max(o_orderdate)) AS hi
  FROM orders
),
spine(m) AS (
  SELECT lo FROM bounds
  UNION ALL
  SELECT m + INTERVAL 1 MONTH FROM spine WHERE m < (SELECT hi FROM bounds)
),
cnt AS (
  SELECT date_trunc('month', o_orderdate) AS m, CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
)
SELECT CAST(spine.m AS DATE) AS month, coalesce(cnt.n, 0) AS n_orders,
       (cnt.m IS NULL) AS is_gap
FROM spine LEFT JOIN cnt ON spine.m = cnt.m
ORDER BY month
""",
)
def fn_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE (Spark 4 ``WITH RECURSIVE``): generate the complete
    month CALENDAR SPINE between the first and last order date and left-
    join the monthly counts — the gap-visible time grid every reporting
    layer needs (a bare GROUP BY silently drops empty months; the spine
    makes them explicit rows).  Pins the recursive-query surface against
    DuckDB's identical WITH RECURSIVE semantics.

    The date bounds collect ONCE (a 1-row aggregate — the bounded-driver
    -state posture) and the recursion runs over LITERALS: a recursive
    step that references a non-trivial CTE re-evaluates it per step in
    Spark's iterative union execution, turning an O(span) spine into
    O(span) scans of orders — measured 28.8 s -> 2 s on this corpus,
    the DataFrame twin of the AS MATERIALIZED oracle lesson.  The spine
    is |months| rows; the join against the map-side-combined census is
    the only data-proportional work."""
    o = table(spark, sf_dir, "orders")
    lo, hi = o.agg(
        F.date_trunc("MONTH", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("MONTH", F.max("o_orderdate")).alias("hi"),
    ).collect()[0]
    o.createOrReplaceTempView("sdis_orders_for_rcte")
    return spark.sql(
        f"""
        WITH RECURSIVE spine(m) AS (
          SELECT TIMESTAMP '{lo}'
          UNION ALL
          SELECT m + INTERVAL 1 MONTH FROM spine
          WHERE m < TIMESTAMP '{hi}'
        ),
        cnt AS (
          SELECT date_trunc('MONTH', o_orderdate) AS m,
                 CAST(count(*) AS BIGINT) AS n
          FROM sdis_orders_for_rcte GROUP BY 1
        )
        SELECT CAST(spine.m AS DATE) AS month,
               coalesce(cnt.n, 0L) AS n_orders,
               (cnt.m IS NULL) AS is_gap
        FROM spine LEFT JOIN cnt ON spine.m = cnt.m
        ORDER BY month
        """
    )


@register(
    "fn_luhn",
    oracle="""
WITH pans AS (
  SELECT o_orderkey, lpad(CAST(o_orderkey AS VARCHAR), 16, '3') AS pan
  FROM orders
),
digits AS (
  SELECT o_orderkey, pan,
         CAST(sum(CASE WHEN (16 - i) % 2 = 1
                       THEN CASE WHEN 2 * CAST(pan[i] AS INTEGER) > 9
                                 THEN 2 * CAST(pan[i] AS INTEGER) - 9
                                 ELSE 2 * CAST(pan[i] AS INTEGER) END
                       ELSE CAST(pan[i] AS INTEGER) END) AS BIGINT) AS s
  FROM pans, unnest(generate_series(1, 16)) AS u(i)
  GROUP BY 1, 2
)
SELECT o_orderkey, pan, s % 10 = 0 AS luhn_valid
FROM digits
ORDER BY o_orderkey
""",
)
def fn_luhn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LUHN (mod-10) checksum validation — the PAN/IMEI/account-number
    integrity check every PII scrubber and payments ingest runs (a
    16-digit string that fails Luhn is NOT a card number, which is how
    ``ext_pii_mask``-class detectors cut false positives).  Each order
    key is zero-padded into a synthetic 16-digit PAN; the checksum
    (double every second digit from the right, subtract 9 past 9, sum
    mod 10) evaluates INSIDE the token array via a transform over the
    digit positions — one whole-stage-codegen projection, integer
    arithmetic only, no UDF."""
    o = table(spark, sf_dir, "orders")
    pan = F.lpad(F.col("o_orderkey").cast("string"), 16, "3")
    d = lambda i: F.substring(pan, i, 1).cast("int")  # noqa: E731
    term = lambda i: F.when(  # noqa: E731
        ((16 - i) % 2) == 1,
        F.when(2 * d(i) > 9, 2 * d(i) - 9).otherwise(2 * d(i)),
    ).otherwise(d(i))
    total = sum(term(F.lit(i)) for i in range(1, 17))
    return o.select(
        "o_orderkey",
        pan.alias("pan"),
        ((total % 10) == 0).alias("luhn_valid"),
    ).orderBy("o_orderkey")
