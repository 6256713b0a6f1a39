"""End-to-end ingestion pipeline parity (SURVEY.md §7, milestone 5).

The reference's full tick (EP1-EP3): binary product in → decode →
composite → resample onto a 0.035° grid → clip to the Africa bbox →
project declared bands → partitioned write (``sources/meteosat.py:
124-197``, ``utils/conversion.py:9-37``).

``pipeline_ingest`` composes the Spark forms of every stage into ONE lazy
plan: binary payload column → Arrow-batched decode (``llm/multimodal``
kernel) → derived coordinates → bbox filter → grid-cell aggregation.
Crucially the clip sits BELOW the grid aggregation in this plan — the
optimization the reference misses (it resamples the whole world, then
crops; SURVEY.md §4) — and Catalyst keeps it pushed down.  The oracle
restates the whole chain in SQL, so the composition is hash-checked
end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from ..catalog import table
from ..llm.multimodal import decoded_features
from ..llm.shaping import _MIX_EVEN_RATE, _MIX_ODD_RATE, _rate_hex
from ..registry import register

_RES = 0.35  # coarser grid than the raster's 0.035° — feature space is smaller
_BBOX = (-25.36, -34.82, 63.50, 37.34)  # sources/meteosat.py:36


@register(
    "pipeline_ingest",
    oracle=f"""
WITH decoded AS (
  SELECT doc_id,
         octet_length(encode(text))       AS n_bytes,
         octet_length(encode(text)) % 640 AS width,
         octet_length(encode(text)) % 480 AS height
  FROM documents
), located AS (
  SELECT doc_id, n_bytes,
         CAST(width  AS DOUBLE) * 360.0 / 640.0 - 180.0 AS lon,
         CAST(height AS DOUBLE) * 180.0 / 480.0 - 90.0  AS lat
  FROM decoded
)
SELECT CAST(floor((lon + 180.0) / {_RES}) AS BIGINT) AS cell_x,
       CAST(floor((lat + 90.0) / {_RES}) AS BIGINT)  AS cell_y,
       count(*)                                      AS n_obs,
       round(avg(n_bytes), 4)                        AS mean_bytes
FROM located
WHERE lon BETWEEN {_BBOX[0]} AND {_BBOX[2]}
  AND lat BETWEEN {_BBOX[1]} AND {_BBOX[3]}
GROUP BY 1, 2
""",
)
def pipeline_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ingestion-pipeline composition as one lazy Spark plan:

    binary scan → mapInPandas decode → coordinate projection → bbox clip
    (filter BEFORE the aggregation — the pushdown the reference's eager
    pipeline can't do) → 0.35° grid binning.

    At 100 TB: decode is embarrassingly parallel per Arrow batch; the only
    shuffle is the final bounded-cardinality cell groupBy; the bbox filter
    cuts shuffle input before it happens.
    """
    docs = table(spark, sf_dir, "documents")
    blobs = docs.select(
        "doc_id", F.encode("text", "utf-8").cast(BinaryType()).alias("payload")
    )
    decoded = decoded_features(blobs)
    located = decoded.select(
        "doc_id",
        "n_bytes",
        (F.col("width").cast("double") * 360.0 / 640.0 - 180.0).alias("lon"),
        (F.col("height").cast("double") * 180.0 / 480.0 - 90.0).alias("lat"),
    )
    clipped = located.filter(
        F.col("lon").between(_BBOX[0], _BBOX[2])
        & F.col("lat").between(_BBOX[1], _BBOX[3])
    )
    return (
        clipped.select(
            F.floor((F.col("lon") + 180.0) / _RES).alias("cell_x"),
            F.floor((F.col("lat") + 90.0) / _RES).alias("cell_y"),
            "n_bytes",
        )
        .groupBy("cell_x", "cell_y")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.round(F.avg("n_bytes"), 4).alias("mean_bytes"),
        )
    )


@register(
    "pipeline_training_data",
    oracle="""
WITH canon AS (
  SELECT doc_id, lang,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                             ' +', ' ', 'g')) AS canonical,
         len(str_split(text, ' ')) AS n_tokens
  FROM documents
),
kept AS (
  SELECT * FROM canon WHERE n_tokens >= 5
),
deduped AS (
  SELECT canonical, lang, min(doc_id) AS keep_id, count(*) AS n_copies
  FROM kept
  GROUP BY canonical, lang
)
SELECT CASE WHEN keep_id % 10 < 8 THEN 'train'
            WHEN keep_id % 10 = 8 THEN 'valid'
            ELSE 'test' END AS split,
       lang,
       count(*)        AS n_docs,
       CAST(sum(n_copies - 1) AS BIGINT) AS n_dupes_removed
FROM deduped
GROUP BY 1, 2
""",
)
def pipeline_training_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data pipeline in ONE lazy plan: canonicalize →
    quality gate → canonical-key dedup (keep min doc_id, count removed
    copies) → deterministic train/valid/test split → per-split census.

    The whole chain is a single Catalyst plan: the canonicalization and
    gate fuse into the scan projection, dedup is the only wide shuffle,
    and the split census reuses the dedup output — at 100 TB this runs
    as scan → one shuffle → small agg, which is the minimum any dedup
    pipeline can do.

    The dedup shuffle is keyed on the 16-byte ``unhex(md5(canonical))``,
    NOT the canonical string: the census output never needs the string,
    so hashing first cuts the only wide exchange's payload from the full
    canonicalized corpus to fixed-width keys.  128-bit keys keep this
    exact in practice (collision odds < 2^-64 even at 10^12 docs — a
    64-bit key would not survive 100 TB); the oracle groups on the string
    and derives identical censuses."""
    docs = table(spark, sf_dir, "documents")
    canonical = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    kept = docs.select(
        "doc_id",
        "lang",
        F.unhex(F.md5(canonical)).alias("canon_key"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    ).filter(F.col("n_tokens") >= 5)
    deduped = kept.groupBy("canon_key", "lang").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    split = (
        F.when(F.col("keep_id") % 10 < 8, "train")
        .when(F.col("keep_id") % 10 == 8, "valid")
        .otherwise("test")
    )
    return (
        deduped.select(split.alias("split"), "lang", "n_copies")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_copies") - 1).alias("n_dupes_removed"),
        )
    )


_SH_MAX_DUP_RATIO = 0.5   # repetition gate: drop docs over 50% duplicate tokens
_SH_PACK_BUDGET = 256
_SH_SHARDS = 4


@register(
    "pipeline_shaping",
    oracle=f"""
WITH gated AS (
  SELECT doc_id, source,
         len(str_split(text, ' ')) AS n_tokens
  FROM documents
  WHERE 1.0 - CAST(len(list_distinct(str_split(text, ' '))) AS DOUBLE)
              / len(str_split(text, ' ')) <= {_SH_MAX_DUP_RATIO}
    AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
        CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
             THEN '{_rate_hex(_MIX_EVEN_RATE)}' ELSE '{_rate_hex(_MIX_ODD_RATE)}' END
),
packed AS (
  SELECT doc_id, source, n_tokens,
         CAST(floor(coalesce(sum(n_tokens) OVER (
             PARTITION BY source, doc_id % {_SH_SHARDS} ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           / {_SH_PACK_BUDGET}.0) AS BIGINT) AS bin_id
  FROM gated
)
SELECT source,
       count(*)                       AS n_docs_kept,
       CAST(sum(n_tokens) AS BIGINT)  AS n_tokens_total,
       count(DISTINCT (doc_id % {_SH_SHARDS}, bin_id)) AS n_bins
FROM packed
GROUP BY source
""",
)
def pipeline_shaping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus→batches shaping pipeline in ONE lazy plan: repetition gate
    (Gopher dup-token screen) → deterministic mixture sampling (even
    sources kept, odd downsampled to 25% via md5 threshold) → sharded
    sequence packing → per-source census (docs kept, tokens, bins).

    Composition story: the gate and the sample are scan-side projections
    that fuse into the parquet read; the ONLY wide stage is the packing
    window keyed on (source, shard); the census aggregates its output.
    scan → one shuffle → small agg — the minimum shape for a pipeline
    that must order documents within packing windows."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    dup_ratio = 1.0 - F.size(F.array_distinct(toks)).cast("double") / n
    rate_hex = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 0,
        F.lit(_rate_hex(_MIX_EVEN_RATE)),
    ).otherwise(F.lit(_rate_hex(_MIX_ODD_RATE)))
    kept = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4) < rate_hex
    gated = docs.filter((dup_ratio <= _SH_MAX_DUP_RATIO) & kept).select(
        "doc_id", "source", n.alias("n_tokens")
    )

    from pyspark.sql import Window

    shard = F.col("doc_id") % _SH_SHARDS
    w = (
        Window.partitionBy("source", shard)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    packed = gated.select(
        "doc_id",
        "source",
        "n_tokens",
        shard.alias("shard"),
        F.floor(cum_before / float(_SH_PACK_BUDGET)).cast("bigint").alias("bin_id"),
    )
    return packed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").alias("n_tokens_total"),
        F.countDistinct("shard", "bin_id").alias("n_bins"),
    )
