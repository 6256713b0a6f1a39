"""Deterministic corpus sampling & ordering for training-data assembly.

Training pipelines need three sampling shapes beyond per-source rate
gating (``ext_mix_sample``): cap each group at N examples (balancing),
draw one global uniform N-sample (eval/holdout carve-outs), and assign a
deterministic global shuffle order with contiguous example indices
(epoch-stable batch assembly).  All three use content hashes as the
randomness source — engine-independent, reproducible, and joinable back
to provenance — never ``rand()`` (non-deterministic across engines, so
unverifiable against an oracle).

Reference analog: the reference pipeline processes whatever the catalog
returns in slot order (``sources/meteosat.py:105-122``); sampling/
balancing has no counterpart there — these are the [EXT] training-data
operators SURVEY §2.10 claims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import settings
from ..catalog import table
from ..registry import register

_GROUP_CAP = 50
_SAMPLE_N = 200
_SHUFFLE_PARTITIONS = settings.SHUFFLE_PARTITIONS


@register(
    "ext_group_sample",
    oracle=f"""
SELECT source, doc_id, rk
FROM (
  SELECT source, doc_id,
         CAST(row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
  FROM documents
)
WHERE rk <= {_GROUP_CAP}
ORDER BY source, rk
""",
)
def ext_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap every source at _GROUP_CAP (= 50) documents, chosen by
    content-hash order (a deterministic uniform draw within each group).

    Scale shape: one shuffle on the group key, then a per-partition
    window — and because the predicate is ``row_number <= N``, Spark
    plans a WindowGroupLimit (per-partition top-N heaps before the
    shuffle), so the exchange carries at most N rows per group, not the
    whole corpus."""
    docs = table(spark, sf_dir, "documents")
    key = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(key, F.col("doc_id"))
    return (
        docs.select("source", "doc_id")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _GROUP_CAP)
        .orderBy("source", "rk")
    )


@register(
    "ext_corpus_sample",
    oracle=f"""
SELECT doc_id, source, n_chars
FROM documents
ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
LIMIT {_SAMPLE_N}
""",
)
def ext_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One global uniform _SAMPLE_N (= 200) document sample, drawn by
    content hash — the deterministic replacement for reservoir sampling.

    Scale shape: ORDER BY hash LIMIT N plans as TakeOrderedAndProject —
    per-partition N-element heaps merged on the driver; no global sort,
    no full-corpus shuffle, memory O(N) per task regardless of corpus
    size."""
    docs = table(spark, sf_dir, "documents")
    key = F.md5(F.col("doc_id").cast("string"))
    return (
        docs.select("doc_id", "source", "n_chars")
        .orderBy(key, F.col("doc_id"))
        .limit(_SAMPLE_N)
    )


@register(
    "ext_shuffle_index",
    oracle="""
SELECT doc_id,
       CAST(row_number() OVER (
         ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT)
         AS example_idx
FROM documents
ORDER BY example_idx
""",
)
def ext_shuffle_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle order with contiguous example
    indices (0..N-1) — epoch-stable batch assembly.

    The naive expression is ``row_number() OVER (ORDER BY hash)`` — a
    GLOBAL window, which Spark executes in a single partition: the whole
    corpus funnels through one task, the canonical 100-TB scale-killer.
    Instead: range-repartition on the hash key, sort within partitions,
    count rows per partition (a tiny aggregate), turn the counts into
    per-partition start offsets on the driver (bounded by the partition
    count, not the data), and add ``offset + local position`` in one
    mapInPandas pass.  The output order is identical whatever range
    boundaries the sampler picks, because offsets follow partition order
    and the key order is total (hash, doc_id)."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    keyed = docs.withColumn("_k", F.md5(F.col("doc_id").cast("string")))
    parts = keyed.repartitionByRange(
        _SHUFFLE_PARTITIONS, F.col("_k"), F.col("doc_id")
    ).sortWithinPartitions("_k", "doc_id")
    # The counts job and the indexing job are separate actions; each
    # would otherwise re-execute the range exchange, whose boundary
    # sampling is not guaranteed identical across compilations — offsets
    # measured on one set of boundaries must never be applied to
    # another.  localCheckpoint pins ONE materialization (narrow: 8-byte
    # id + 32-byte key per row) that both jobs read.  Tradeoffs, stated
    # honestly: the blocks live in executor storage (not fault-tolerant
    # — a production 100-TB run stages this projection to durable
    # parquet instead, same two-job shape) and are freed by the
    # ContextCleaner when the frame becomes unreferenced (explicit
    # unpersist is a no-op on checkpoint blocks, see llm/dedup.py's
    # label-propagation note).
    parts = parts.localCheckpoint(eager=True)

    counts = (
        parts.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()  # bounded: one row per partition, never per data row
    )
    sizes = {r["pid"]: r["count"] for r in counts}
    offsets = {}
    acc = 0
    for pid in range(_SHUFFLE_PARTITIONS):
        offsets[pid] = acc
        acc += sizes.get(pid, 0)

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("example_idx", T.LongType()),
        ]
    )

    def index_partition(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        pos = offsets.get(pid, 0)
        for pdf in batches:
            n = len(pdf)
            out = pdf[["doc_id"]].copy()
            out["example_idx"] = range(pos, pos + n)
            pos += n
            yield out

    return parts.mapInPandas(index_partition, schema=out_schema).orderBy(
        "example_idx"
    )
