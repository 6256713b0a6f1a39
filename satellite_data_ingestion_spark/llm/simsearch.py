"""Vector similarity search over embedding columns.

- ``ext_sim_cosine``      brute-force cosine top-k against one query
                          vector (the correctness baseline; SQL oracle via
                          DuckDB list_cosine_similarity).
- ``ext_sim_lsh``         random-hyperplane LSH bucketed ANN — the scale
                          path: candidates share a sign-bit bucket, so the
                          per-query work is bucket-sized, not corpus-sized.
- ``ext_dedup_embedding`` embedding-cosine near-dup pairs with an equality
                          prune (label), the vector analog of
                          ``ext_ngram_jaccard``.

All vector math is JVM-side (`zip_with` + `aggregate` fold over
array<double>) — no Python in the scoring loop.  At 100 TB the brute-force
variant is a broadcast of the query vector over a full scan (embarrassingly
parallel, one pass); the LSH variant cuts the scan to matching buckets.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_QUERY_VEC_ID = 0
_TOP_K = 10


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<double> columns, JVM-side."""
    return _dot(a, b) / (_norm(a) * _norm(b))


@register(
    "ext_sim_cosine",
    oracle=f"""
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
  WHERE vec_id = {_QUERY_VEC_ID}
)
SELECT e.vec_id, e.label,
       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS cos_sim
FROM embeddings e, q
WHERE e.vec_id <> {_QUERY_VEC_ID}
ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) DESC,
         e.vec_id
LIMIT {_TOP_K}
""",
)
def ext_sim_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the 1-row query side over the
    corpus scan, fold dot/norm JVM-side, TakeOrderedAndProject for top-k
    (per-partition heaps — no global sort).  Ordering is on the rounded
    score + vec_id tie-break so the result is engine-stable."""
    emb = table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    q = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select(vec.alias("qv"))
    cos = F.round(cosine(vec, F.col("qv")), 6)
    return (
        emb.filter(F.col("vec_id") != _QUERY_VEC_ID)
        .join(F.broadcast(q))
        .select("vec_id", "label", cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(_TOP_K)
    )


_N_PLANES = 8
_LSH_SEED = 42


def _hyperplanes(dim: int = 64) -> list[list[float]]:
    """Deterministic random hyperplanes (fixed seed) for sign-bit LSH."""
    rng = np.random.default_rng(_LSH_SEED)
    return rng.standard_normal((_N_PLANES, dim)).tolist()


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Pack sign(v·p) over the hyperplanes into an integer bucket id."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        proj = _dot(vec, F.array(*[F.lit(float(x)) for x in p]))
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


@register("ext_sim_lsh")  # approximate by construction → rows-only
def ext_sim_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate nearest neighbors for the query vector.

    Sign-random-projection: 8 fixed hyperplanes → 256 buckets; candidates
    are vectors whose bucket is within hamming distance 1 of the query's
    (probing 9 of 256 buckets ≈ 3.5% of the corpus on average).  Exact
    cosine re-ranks the candidates.  Approximate recall → rows-only check;
    the brute-force twin above is the accuracy baseline.
    """
    planes = _hyperplanes()
    emb = table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    bucketed = emb.select("vec_id", "label", vec.alias("v"), lsh_bucket(vec, planes).alias("bucket"))

    q = bucketed.filter(F.col("vec_id") == _QUERY_VEC_ID).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qbucket")
    )
    # multi-probe: exact bucket or any single-bit flip
    probe = F.bit_count(
        F.col("bucket").bitwiseXOR(F.col("qbucket"))
    ) <= 1
    cos = F.round(cosine(F.col("v"), F.col("qv")), 6)
    return (
        bucketed.filter(F.col("vec_id") != _QUERY_VEC_ID)
        .join(F.broadcast(q))
        .filter(probe)
        .select("vec_id", "label", cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(_TOP_K)
    )


_NEAR_DUP_COS = 0.3


@register(
    "ext_dedup_embedding",
    oracle=f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= {_NEAR_DUP_COS}
""",
)
def ext_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, pruned by label equality before any
    pairwise math — the vector analog of keyed Jaccard dedup.  For unkeyed
    corpora, bucket with ``lsh_bucket`` first (same shape as
    ext_dedup_minhash's banded join)."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    a = emb.alias("a")
    b = emb.alias("b")
    cos = cosine(F.col("a.v"), F.col("b.v"))
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= _NEAR_DUP_COS)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            F.round(cos, 6).alias("cos_sim"),
        )
    )
