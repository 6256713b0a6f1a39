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

import os
import tempfile

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .. import settings
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
    """Cosine similarity between two array<double> columns, JVM-side.

    try_divide, not `/`: under Spark 4's default ANSI mode a zero-norm
    vector (padding row, failed encoder) would otherwise kill the whole
    query with DIVIDE_BY_ZERO.  A null cosine ranks last / fails every
    threshold filter — the row is skipped, not fatal."""
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


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


_N_TABLES = settings.LSH_N_TABLES
_N_PLANES = settings.LSH_N_PLANES
if not 1 <= _N_PLANES <= 31:
    # Stored signatures bit-pack each table's sign bits into an int32
    # (_stage_lsh_signatures writes array<int>); 32+ planes would silently
    # overflow the stored side while the query-side int64 literals stay
    # exact — hamming would compare garbage and return zero candidates.
    # Fail at import, naming the knob, instead.
    raise ValueError(
        f"SDIS_LSH_N_PLANES={_N_PLANES}: must be in [1, 31] — signatures "
        "are bit-packed per table into a 32-bit int (sign bit reserved)"
    )
_PROBE_H = settings.LSH_PROBE_HAMMING
_LSH_SEED = 42

_DIM_CACHE: dict[str, int] = {}


def _embedding_dim(spark: SparkSession, sf_dir: str) -> int:
    """Embedding dimensionality of the corpus at ``sf_dir``.

    One ``limit(1)`` probe per sf_dir, cached for the process lifetime —
    callers (ext_sim_lsh, ...) would otherwise pay a driver-side job on
    every invocation.  An empty embeddings table raises a clear error
    instead of the bare AttributeError ``first().embedding`` used to."""
    dim = _DIM_CACHE.get(sf_dir)
    if dim is None:
        rows = table(spark, sf_dir, "embeddings").select("embedding").limit(1).collect()
        if not rows or rows[0].embedding is None:
            raise ValueError(f"embeddings table at {sf_dir!r} is empty; cannot infer dim")
        dim = len(rows[0].embedding)
        _DIM_CACHE[sf_dir] = dim
    return dim


def _hyperplanes(dim: int = 64, n_planes: int = 8) -> list[list[float]]:
    """Deterministic random hyperplanes (fixed seed) for single-table
    sign-bit LSH — the bucketing primitive (``lsh_bucket``) kept for
    bucket-partitioned layouts; ``ext_sim_lsh`` itself uses the
    multi-table scheme below."""
    rng = np.random.default_rng(_LSH_SEED)
    return rng.standard_normal((n_planes, dim)).tolist()


def _lsh_tables(dim: int) -> np.ndarray:
    """Deterministic (L, b, dim) hyperplane tensor for the multi-table
    AND-OR scheme: L=_N_TABLES independent tables of b=_N_PLANES sign
    bits each (fixed seed — signatures are reproducible across runs and
    processes, so stored signatures stay valid)."""
    rng = np.random.default_rng(_LSH_SEED)
    return rng.standard_normal((_N_TABLES, _N_PLANES, dim))


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Pack sign(v·p) over the hyperplanes into an integer bucket id."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        proj = _dot(vec, F.array(*[F.lit(float(x)) for x in p]))
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


@register("ext_sim_lsh")  # approximate by construction → rows-only
def ext_sim_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table sign-LSH approximate nearest neighbors (AND-OR
    composition, the minhash-band construction transplanted to cosine):
    L=64 independent tables of b=28 sign bits; a vector is a CANDIDATE
    when ANY table puts it within hamming distance 6 of the query's
    signature.  Exact cosine re-ranks the candidates.

    Parameters were fitted by offline simulation on this corpus (true
    top-10 neighbors sit at cos 0.28-0.41 → per-bit flip prob 0.37-0.41,
    i.e. weakly clustered — a single table's per-bit lift is only ~1.2x,
    which is why the old single-table 8-bit/hamming<=2 variant capped at
    recall 0.4-0.6): L=64/b=28/h<=6 measures recall@10 = 1.0/0.9/0.9
    probing 18.8%/18.2%/18.3% of the corpus at sf0.001/0.01/0.1 (the
    round-5 32x24/h<=5 point was 0.8 at sf0.1).  Quality knobs
    env-tunable (settings.py: SDIS_LSH_N_TABLES / SDIS_LSH_N_PLANES /
    SDIS_LSH_PROBE_HAMMING).

    Execution shape: signatures are a vectorized numpy matmul per Arrow
    batch (one scalar pandas UDF computing the min-over-tables hamming to
    the query — the 1792 projections per row would defeat JVM expression
    codegen, and in numpy they are one (batch x dim)@(dim x 1792) GEMM).
    At 100 TB the signature tensor (L ints = 256 bytes/row) is
    precomputed once at ingest and stored columnar beside the corpus;
    query-time work is then a scan of SIGNATURES (2x less IO than the
    raw float64 vectors, before parquet's far better compression of
    int keys) that prunes ~82% of rows before the exact re-rank touches
    a single embedding — the standard binary-quantization prefilter.
    Approximate recall → rows-only check; the brute-force twin above is
    the accuracy baseline."""
    emb = table(spark, sf_dir, "embeddings")
    # Hyperplane dimensionality must match the data: a mismatched plane
    # tensor would silently zero every projection.  One 1-row probe per
    # sf_dir pins the true dim (cached — not a per-invocation driver job).
    dim = _embedding_dim(spark, sf_dir)
    planes = _lsh_tables(dim)  # (L, b, dim)
    qrow = (
        emb.filter(F.col("vec_id") == _QUERY_VEC_ID)
        .select(F.col("embedding").cast("array<double>").alias("qv"))
        .collect()
    )  # bounded collect: exactly one query row
    if not qrow:
        raise ValueError(f"query vector {_QUERY_VEC_ID} not found in {sf_dir!r}")
    qv = np.asarray(qrow[0].qv, dtype=np.float64)
    qbits = np.einsum("lbd,d->lb", planes, qv) > 0  # (L, b)
    flat = planes.reshape(_N_TABLES * _N_PLANES, dim)

    @pandas_udf("int")
    def min_table_hamming(col: pd.Series) -> pd.Series:
        if len(col) == 0:  # empty Arrow batch: np.array([]) is (0,), not (0, dim)
            return pd.Series([], dtype="int32")
        M = np.array(col.tolist(), dtype=np.float64)  # (batch, dim)
        bits = (M @ flat.T) > 0  # one GEMM for all tables
        ham = (bits.reshape(len(M), _N_TABLES, _N_PLANES) ^ qbits[None]).sum(axis=2)
        return pd.Series(ham.min(axis=1).astype("int32"))

    vec = F.col("embedding").cast("array<double>")
    q = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select(vec.alias("qv"))
    cos = F.round(cosine(F.col("v"), F.col("qv")), 6)
    return (
        emb.filter(F.col("vec_id") != _QUERY_VEC_ID)
        .filter(min_table_hamming(vec) <= _PROBE_H)
        .select("vec_id", "label", vec.alias("v"))
        .join(F.broadcast(q))
        .select("vec_id", "label", cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(_TOP_K)
    )


_NEAR_DUP_COS = 0.3
_TILE_P = settings.TILE_P  # tile factor: each label's pair space splits into P*P tasks


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
    """Registered entry: tiled exact near-dup pair join over the whole
    embeddings table (see :func:`_embedding_self_pairs`)."""
    return _embedding_self_pairs(spark, sf_dir)


def _embedding_self_pairs(
    spark: SparkSession, sf_dir: str, where=None
) -> DataFrame:
    """Embedding-cosine near-dup pairs within each label, executed as a
    TILED self-join so no task ever owns an unbounded group.  ``where``
    (an optional Column predicate) restricts BOTH sides — the standing
    subset of the incremental clustering builds on this.

    Exact dense-vector threshold joins at this similarity regime (the
    corpus' true near-dup pairs sit at cos 0.3-0.5, where sign-LSH bucket
    collision probability is ~2% — no probe radius preserves recall) are
    inherently O(n^2) dot products per label; what CAN and must be fixed
    for 100 TB is that `label` is low-cardinality, so a plain equality
    join hands one task an entire label's quadratic pair space.  The fix
    is block-nested-loop tiling: each vector gets a deterministic chunk
    ``c = pmod(xxhash64(vec_id), P)``; the A side is replicated to tiles
    ``(c, 0..P-1)`` and the B side to ``(0..P-1, c)``, and the join keys
    on ``(label, tile_i, tile_j)``.  Every (x, y) pair meets in exactly
    one tile, each tile holds ~(n_label/P)^2 pairs, and parallelism is
    labels x P^2 — P is sized so n_label/P rows fit one task (the P=4
    here matches test scale; at 100 TB P grows with the label).  Results
    are identical to the naive plan (oracle unchanged); for sub-quadratic
    *approximate* variants see ext_sim_lsh / ext_sim_ivf.

    Execution (round-7 rewrite): each (label, ti, tj) tile COGROUPS its
    two sides into one Arrow batch pair and scores them with a single
    BLAS GEMM — the per-pair cosine previously ran through
    zip_with/aggregate higher-order functions, which are interpreted
    per element, not codegen'd (same finding as ext_knn_join's 10x).
    Only the surviving threshold pairs materialize as rows; the
    vec_a < vec_b mask keeps each unordered pair from the one tile
    where both orderings meet."""
    # chunk MUST be int, not the pmod's natural bigint: the cogroup keys
    # are (ti, tj) with ti=chunk/tj=slot on one side and the REVERSE on
    # the other, and Spark hashes int 2 and bigint 2 differently — with
    # mixed types each side partitions by its own key hash and the two
    # sides' identical-VALUE groups land in different partitions, so the
    # UDF sees one-sided groups and silently drops every cross-chunk
    # tile (caught by the driver-sim sweep as missing kNN candidates).
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("v"),
        F.pmod(F.xxhash64("vec_id"), F.lit(_TILE_P)).cast("int").alias("chunk"),
    )
    # The RIGHT side must come from a FRESH scan (disjoint expression
    # ids): a self-cogroup sharing one lineage hits a Spark
    # attribute-dedup bug where column pruning silently strips the right
    # side's data columns before the UDF sees them (catalog.table_fresh).
    from ..catalog import table_fresh

    emb_r = table_fresh(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("v"),
        F.pmod(F.xxhash64("vec_id"), F.lit(_TILE_P)).cast("int").alias("chunk"),
    )
    if where is not None:
        emb = emb.filter(where)
        emb_r = emb_r.filter(where)
    slots = F.explode(F.array(*[F.lit(i) for i in range(_TILE_P)]))
    a = emb.select(
        "label", F.col("chunk").alias("ti"), slots.alias("tj"), "vec_id", "v"
    )
    b = emb_r.select(
        "label", slots.alias("ti"), F.col("chunk").alias("tj"), "vec_id", "v"
    )

    def tile_pairs(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(
                {
                    "vec_a": pd.Series([], dtype="int64"),
                    "vec_b": pd.Series([], dtype="int64"),
                    "label": pd.Series([], dtype="int32"),
                    "cos_sim": pd.Series([], dtype="float64"),
                }
            )
        A = np.array(left["v"].tolist(), dtype=np.float64)
        B = np.array(right["v"].tolist(), dtype=np.float64)
        A /= np.linalg.norm(A, axis=1, keepdims=True)
        B /= np.linalg.norm(B, axis=1, keepdims=True)
        qids = left["vec_id"].to_numpy()
        nids = right["vec_id"].to_numpy()
        S = A @ B.T
        ia, ib = np.where(
            (qids[:, None] < nids[None, :]) & (S >= _NEAR_DUP_COS)
        )
        return pd.DataFrame(
            {
                "vec_a": qids[ia],
                "vec_b": nids[ib],
                "label": left["label"].iloc[0],
                "cos_sim": np.round(S[ia, ib], 6),
            }
        )

    return (
        a.groupBy("label", "ti", "tj")
        .cogroup(b.groupBy("label", "ti", "tj"))
        .applyInPandas(
            tile_pairs, "vec_a long, vec_b long, label int, cos_sim double"
        )
    )


_SIG_CACHE: dict[str, str] = {}


def _stage_lsh_signatures(spark: SparkSession, sf_dir: str) -> str:
    """Precompute and store the multi-table LSH signature column — the
    ingest-time half of the 100 TB story: one pass over the corpus writes
    (vec_id, label, sig: array<int> of _N_TABLES b-bit keys) to parquet,
    so query time never touches raw embeddings until re-rank.  Cached per
    (process, sf_dir); in production this column lives beside the corpus
    and is maintained by the ingest pipeline."""
    key = os.path.abspath(sf_dir)
    cached = _SIG_CACHE.get(key)
    if cached is not None and os.path.isdir(cached):
        return cached
    dim = _embedding_dim(spark, sf_dir)
    planes = _lsh_tables(dim)
    flat = planes.reshape(_N_TABLES * _N_PLANES, dim)
    weights = (1 << np.arange(_N_PLANES, dtype=np.int64))  # bit-pack per table

    @pandas_udf("array<int>")
    def table_keys(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype=object)
        M = np.array(col.tolist(), dtype=np.float64)
        bits = ((M @ flat.T) > 0).reshape(len(M), _N_TABLES, _N_PLANES)
        keys = (bits * weights[None, None, :]).sum(axis=2).astype(np.int32)
        return pd.Series(list(keys))

    # Fingerprint-keyed cross-process artifact (round-14 staging
    # discipline): safe here because the hyperplanes are seeded numpy —
    # session-independent — unlike the IVF/PQ quantizers, whose
    # training shares the session's partitioning and therefore stays
    # per-process.
    from ..operators.scans import _stage_atomic, _staging_fingerprint

    fp = _staging_fingerprint(sf_dir, "embeddings.parquet", __file__)
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    out = os.path.join(tempfile.gettempdir(), f"sdis_lsh_sigs_{sf_tag}_{fp}")

    def build(tmp: str) -> None:
        (
            table(spark, sf_dir, "embeddings")
            .select(
                "vec_id",
                "label",
                table_keys(F.col("embedding").cast("array<double>")).alias("sig"),
            )
            .write.mode("overwrite")
            .parquet(tmp)
        )

    _stage_atomic(out, build)
    _SIG_CACHE[key] = out
    return out


@register("ext_sim_lsh_indexed")  # approximate by construction → rows-only
def ext_sim_lsh_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN over STORED LSH signatures — the production query shape that
    ``ext_sim_lsh`` (which signs the corpus inline) only describes:

    1. ingest wrote the (vec_id, sig) table once (`_stage_lsh_signatures`);
    2. the query scans SIGNATURES ONLY — 64 ints/row instead of the
       64-float embedding, 2x less IO before any pruning (more after
       parquet compression of the int keys) — and computes per-table
       hamming to the query's keys fully JVM-side
       (zip_with + bit_count over a 64-element array, codegen-friendly);
    3. only the surviving ~18% of vec_ids join back to the embeddings
       table for exact-cosine re-rank — the join is a semi-shaped inner
       on vec_id, so raw vectors are read once for candidates only.

    Same planes/seed as ext_sim_lsh → identical candidates and identical
    top-k (pinned by test); rows-only like every approximate op."""
    emb = table(spark, sf_dir, "embeddings")
    dim = _embedding_dim(spark, sf_dir)
    planes = _lsh_tables(dim)
    sig_path = _stage_lsh_signatures(spark, sf_dir)

    qrow = (
        emb.filter(F.col("vec_id") == _QUERY_VEC_ID)
        .select(F.col("embedding").cast("array<double>").alias("qv"))
        .collect()
    )  # bounded collect: exactly one query row
    if not qrow:
        raise ValueError(f"query vector {_QUERY_VEC_ID} not found in {sf_dir!r}")
    qv = np.asarray(qrow[0].qv, dtype=np.float64)
    qbits = np.einsum("lbd,d->lb", planes, qv) > 0
    qkeys = (qbits * (1 << np.arange(_N_PLANES, dtype=np.int64))[None, :]).sum(axis=1)

    sigs = spark.read.parquet(sig_path)
    qarr = F.array(*[F.lit(int(k)) for k in qkeys])
    minham = F.array_min(
        F.zip_with("sig", qarr, lambda s, q: F.bit_count(s.bitwiseXOR(q)))
    )
    cand = sigs.filter(
        (minham <= _PROBE_H) & (F.col("vec_id") != _QUERY_VEC_ID)
    ).select("vec_id", "label")

    q = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    vec = F.col("embedding").cast("array<double>")
    cos = F.round(cosine(F.col("v"), F.col("qv")), 6)
    return (
        cand.join(emb.select("vec_id", vec.alias("v")), "vec_id")
        .join(F.broadcast(q))
        .select("vec_id", "label", cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(_TOP_K)
    )


# Shared by ext_dedup_embedding_cluster and its incremental twin: both
# must equal the from-scratch transitive closure of the full pair graph.
_EMB_CLUSTER_ORACLE = f"""
WITH RECURSIVE
pairs AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a
  JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) >= {_NEAR_DUP_COS}
),
edges AS (
  SELECT a, b FROM pairs
  UNION ALL
  SELECT b, a FROM pairs
),
reach(src, dst) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
)
SELECT vec_id,
       least(vec_id, coalesce(min(dst), vec_id)) AS component_id,
       vec_id = least(vec_id, coalesce(min(dst), vec_id)) AS is_canonical
FROM embeddings LEFT JOIN reach ON src = vec_id
GROUP BY vec_id
"""


@register("ext_dedup_embedding_cluster", oracle=_EMB_CLUSTER_ORACLE)
def ext_dedup_embedding_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup at CLUSTER granularity: connected components over
    the embedding near-dup pair graph, every vector labeled with its
    component's min vec_id and a canonical flag — "keep one per semantic
    duplicate cluster", the embedding analog of ``ext_dedup_cluster``.

    Composes two verified components: the tiled exact pair join
    (``ext_dedup_embedding`` — bounded tasks at any label skew) feeds
    ``llm.dedup.connected_components`` (min-label propagation with
    pointer doubling, O(log diameter) rounds).  The oracle recomputes the
    same components declaratively with a recursive-CTE closure over the
    same pair predicate."""
    from .dedup import (
        _checkpoint_reset_stats,
        connected_components,
        star_precontract,
    )

    # Materialize the tiled pair join ONCE (both the star aggregate and
    # the contraction joins reuse it).
    pairs = _checkpoint_reset_stats(
        ext_dedup_embedding(spark, sf_dir).select(
            F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
        )
    )
    vecs = table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id")
    )
    # Star pre-contraction (see dedup.star_precontract): clique-shaped
    # semantic clusters collapse through the keep-first mapping before
    # the iterative loop ever runs.
    labels0, edges = star_precontract(vecs, pairs)
    labels = connected_components(labels0, edges)
    return labels.select(
        F.col("doc_id").alias("vec_id"),
        "component_id",
        (F.col("doc_id") == F.col("component_id")).alias("is_canonical"),
    )


def _embedding_probe_pairs(
    spark: SparkSession, sf_dir: str, probe_where, batch_flag
) -> DataFrame:
    """Asymmetric tiled near-dup join: PROBE side = the rows matching
    ``probe_where`` (the arriving batch), INDEX side = the whole corpus
    with ``batch_flag`` (a Column) marking probe members.  Emits every
    J-qualifying (cos >= threshold) pair with at least one probe vector,
    exactly once (probe×standing always from the probe row; probe×probe
    deduped by vec_id order in the kernel), normalized doc_a < doc_b.
    Same bounded-tile scale shape as the self-join: pairwise work is
    probe-rows × corpus / tiles, never corpus²."""
    from ..catalog import table_fresh

    left = (
        table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            "label",
            F.col("embedding").cast("array<double>").alias("v"),
            F.pmod(F.xxhash64("vec_id"), F.lit(_TILE_P)).cast("int").alias("chunk"),
        )
        .filter(probe_where)
    )
    right = table_fresh(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("v"),
        F.pmod(F.xxhash64("vec_id"), F.lit(_TILE_P)).cast("int").alias("chunk"),
        batch_flag.cast("boolean").alias("is_probe"),
    )
    slots = F.explode(F.array(*[F.lit(i) for i in range(_TILE_P)]))
    a = left.select(
        "label", F.col("chunk").alias("ti"), slots.alias("tj"), "vec_id", "v"
    )
    b = right.select(
        "label",
        slots.alias("ti"),
        F.col("chunk").alias("tj"),
        "vec_id",
        "v",
        "is_probe",
    )

    def probe_tile_pairs(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        if len(lf) == 0 or len(rf) == 0:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype="int64"),
                    "doc_b": pd.Series([], dtype="int64"),
                }
            )
        A = np.array(lf["v"].tolist(), dtype=np.float64)
        B = np.array(rf["v"].tolist(), dtype=np.float64)
        A /= np.linalg.norm(A, axis=1, keepdims=True)
        B /= np.linalg.norm(B, axis=1, keepdims=True)
        qids = lf["vec_id"].to_numpy()
        nids = rf["vec_id"].to_numpy()
        nprobe = rf["is_probe"].to_numpy(dtype=bool)
        S = A @ B.T
        # Keep each qualifying pair once: a standing index row always
        # pairs with its probe row; a probe index row only when id-above
        # (which also kills the self-pair).
        keep = (S >= _NEAR_DUP_COS) & (
            (~nprobe[None, :]) | (nids[None, :] > qids[:, None])
        )
        ia, ib = np.where(keep)
        lo = np.minimum(qids[ia], nids[ib])
        hi = np.maximum(qids[ia], nids[ib])
        return pd.DataFrame({"doc_a": lo, "doc_b": hi})

    return (
        a.groupBy("label", "ti", "tj")
        .cogroup(b.groupBy("label", "ti", "tj"))
        .applyInPandas(probe_tile_pairs, "doc_a long, doc_b long")
    )


@register("ext_dedup_embedding_cluster_incremental", oracle=_EMB_CLUSTER_ORACLE)
def ext_dedup_embedding_cluster_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INCREMENTAL semantic clustering — the embedding twin of
    ``ext_dedup_cluster_incremental``: standing vectors (vec_id % 5 != 0)
    keep their component labels as a stored artifact; an arriving batch
    (vec_id % 5 == 0) generates only batch-touching cosine pairs (the
    asymmetric tiled GEMM above — probe-proportional, never corpus²),
    the standing labels seed connected components, and new edges
    contract through them, merging previously-separate semantic
    clusters when a batch vector bridges them.  Star seeds apply to
    BATCH labels only (rewriting a standing label orphans the members
    pointing at it — the ext_dedup_cluster_incremental lesson).  The
    oracle is the from-scratch closure over the FULL corpus: no drift
    allowed."""
    import os
    import tempfile

    from ..operators.scans import _stage_atomic
    from .dedup import (
        _checkpoint_reset_stats,
        connected_components,
        star_precontract,
    )

    is_batch = F.col("vec_id") % 5 == 0
    from ..operators.scans import _staging_fingerprint

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    from . import dedup as _dedup_mod

    fp = _staging_fingerprint(
        sf_dir, "embeddings.parquet", __file__, _dedup_mod.__file__
    )
    staged = os.path.join(
        tempfile.gettempdir(), f"sdis_standing_emb_labels_{sf_tag}_{fp}"
    )

    def build_standing(tmp: str) -> None:
        pairs = _checkpoint_reset_stats(
            _embedding_self_pairs(spark, sf_dir, where=~is_batch).select(
                F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
            )
        )
        vecs = (
            table(spark, sf_dir, "embeddings")
            .filter(~is_batch)
            .select(F.col("vec_id").alias("doc_id"))
        )
        labels0, edges = star_precontract(vecs, pairs)
        connected_components(labels0, edges).write.parquet(tmp)

    _stage_atomic(staged, build_standing)
    standing_labels = spark.read.parquet(staged)

    new_pairs = _checkpoint_reset_stats(
        _embedding_probe_pairs(spark, sf_dir, is_batch, is_batch)
    )
    edges = new_pairs.union(
        new_pairs.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    )
    rep = new_pairs.groupBy(F.col("doc_b").alias("doc_id")).agg(
        F.min("doc_a").alias("star")
    )
    batch_labels = (
        table(spark, sf_dir, "embeddings")
        .filter(is_batch)
        .select(F.col("vec_id").alias("doc_id"))
        .join(rep, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("star", F.col("doc_id")).alias("component_id"),
        )
    )
    labels = connected_components(
        standing_labels.unionByName(batch_labels), edges
    )
    return labels.select(
        F.col("doc_id").alias("vec_id"),
        "component_id",
        (F.col("doc_id") == F.col("component_id")).alias("is_canonical"),
    )


_IVF_K = settings.IVF_K
_IVF_NPROBE = settings.IVF_NPROBE
_IVF_TRAIN_SAMPLE = settings.IVF_TRAIN_SAMPLE
_IVF_ITERS = settings.IVF_ITERS


def _train_centroids(emb: DataFrame, k: int | None = None) -> np.ndarray:
    """Train the IVF coarse quantizer: k-means (Lloyd, fixed seed/iters) on
    a bounded, deterministic sample collected to the driver.

    This is the honest 100 TB pattern (and how Faiss-on-Spark does it): the
    quantizer trains on a driver-sized sample — a few thousand rows no
    matter the corpus size — and ships back to executors as literals, so
    the full corpus is never shuffled for training."""
    sample = (
        emb.orderBy("vec_id")
        .limit(_IVF_TRAIN_SAMPLE)
        .select(F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    )
    X = np.array([r.v for r in sample])
    rng = np.random.default_rng(_LSH_SEED)
    # A tiny corpus caps the list count (choice with replace=False would
    # raise for k > |sample|); probes are capped to match downstream.
    k_lists = min(k if k is not None else _IVF_K, len(X))
    cents = X[rng.choice(len(X), size=k_lists, replace=False)]
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)  # loop-invariant
    for _ in range(_IVF_ITERS):
        # cosine k-means: assign on normalized dot product, recenter
        Cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
        assign = np.argmax(Xn @ Cn.T, axis=1)
        for k in range(k_lists):
            members = X[assign == k]
            if len(members):
                cents[k] = members.mean(axis=0)
    return cents


def ivf_assign(vec: Column, cents: np.ndarray) -> Column:
    """Nearest-centroid id for an array<double> column, computed in one
    JVM-side fold over centroid literals — no shuffle, no Python.  Right
    for SMALL k only: the expression tree grows as k x dim literals, so
    past a few dozen centroids whole-stage codegen gives up — the query
    path uses the GEMM pandas UDF below instead."""
    Cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    scored = F.array(
        *[
            F.struct(
                _dot(vec, F.array(*[F.lit(float(x)) for x in c])).alias("score"),
                F.lit(k).alias("cid"),
            )
            for k, c in enumerate(Cn)
        ]
    )
    return F.array_max(scored)["cid"]


@register("ext_sim_ivf")  # approximate by construction → rows-only
def ext_sim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbors: k-means coarse quantizer (trained
    driver-side on a bounded sample), corpus partitioned into K inverted
    lists by nearest centroid, query probes its NPROBE closest lists and
    exact-cosine re-ranks only those candidates.

    Per-query work drops from |corpus| to the probed lists (128 lists /
    32 probed = 25% of lists, ~26% of rows measured on this corpus —
    recall@10 0.9/0.9/1.0 at sf0.001/0.01/0.1; knobs env-tunable via
    settings.py).  Assignment is one (batch x dim)@(dim x K) GEMM per
    Arrow batch — at K=128 a per-centroid JVM literal fold would blow
    past codegen limits (see ivf_assign).  At 100 TB the probed fraction
    is the only data READ, not just the only data kept: see
    ``ext_sim_ivf_indexed``, which stages the corpus
    ``partitionBy(ivf_cluster)`` at ingest and probes via statically
    partition-pruned scan (identical top-k, pinned by test)."""
    emb = table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    cents = _train_centroids(emb)

    qrow = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select(
        vec.alias("qv")
    ).collect()[0]
    qv = np.array(qrow.qv)
    Cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    probe = set(np.argsort(-(Cn @ (qv / np.linalg.norm(qv))))[:_IVF_NPROBE].tolist())

    @pandas_udf("int")
    def nearest_centroid(col: pd.Series) -> pd.Series:
        if len(col) == 0:  # empty Arrow batch: np.array([]) is (0,), not (0, dim)
            return pd.Series([], dtype="int32")
        M = np.array(col.tolist(), dtype=np.float64)
        # argmax of v·(c/|c|) == argmax cosine: |v| is constant across k.
        return pd.Series(np.argmax(M @ Cn.T, axis=1).astype("int32"))

    q = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select(vec.alias("qv"))
    cos = F.round(cosine(F.col("v"), F.col("qv")), 6)
    return (
        emb.select("vec_id", "label", vec.alias("v"), nearest_centroid(vec).alias("cid"))
        .filter(F.col("cid").isin(sorted(probe)) & (F.col("vec_id") != _QUERY_VEC_ID))
        .join(F.broadcast(q))
        .select("vec_id", "label", cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(_TOP_K)
    )


_IVF_DIR_CACHE: dict[str, str] = {}


def _stage_ivf_partitions(spark: SparkSession, sf_dir: str, cents: np.ndarray) -> str:
    """Write the corpus parquet PARTITIONED BY inverted-list id — the
    ingest-time half of the IVF 100 TB story that ``ext_sim_ivf`` only
    describes: one pass assigns every vector to its nearest centroid (one
    GEMM per Arrow batch) and lays rows out as
    ``ivf_cluster=<cid>/part-*.parquet``.  A probe then reads ONLY its
    NPROBE list directories via static partition pruning — unprobed lists
    are never opened, so per-query IO is the probed fraction of the
    corpus by construction, not by filter luck.  Cached per (process,
    sf_dir); in production this layout is maintained by the ingest
    pipeline and the quantizer is versioned alongside it."""
    key = os.path.abspath(sf_dir)
    cached = _IVF_DIR_CACHE.get(key)
    if cached is not None and os.path.isdir(cached):
        return cached
    Cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)

    @pandas_udf("int")
    def nearest_centroid(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="int32")
        M = np.array(col.tolist(), dtype=np.float64)
        return pd.Series(np.argmax(M @ Cn.T, axis=1).astype("int32"))

    out = tempfile.mkdtemp(prefix="sdis_ivf_lists_")
    (
        table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            "label",
            "embedding",
            nearest_centroid(F.col("embedding").cast("array<double>")).alias(
                "ivf_cluster"
            ),
        )
        .write.mode("overwrite")
        .partitionBy("ivf_cluster")
        .parquet(out)
    )
    _IVF_DIR_CACHE[key] = out
    return out


@register("ext_sim_ivf_indexed")  # approximate by construction → rows-only
def ext_sim_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over a STORED cluster-partitioned layout — the production
    query shape whose skip ``ext_sim_ivf`` computes with a filter:

    1. ingest wrote the corpus ``partitionBy(ivf_cluster)`` once
       (`_stage_ivf_partitions`), one directory per inverted list;
    2. the query ranks centroids driver-side (K dot products on the
       already-trained quantizer) and scans ONLY its NPROBE list
       directories — the ``ivf_cluster IN (...)`` predicate is a static
       PartitionFilter, so unprobed lists contribute zero files to the
       scan (pinned by plan test), zero bytes read;
    3. surviving rows get exact-cosine re-ranked against the broadcast
       query vector, exactly like the inline variant.

    Same quantizer/seed as ext_sim_ivf → identical probe set and
    identical top-k (pinned by test); rows-only like every approximate
    op."""
    emb = table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    cents = _train_centroids(emb)
    staged = _stage_ivf_partitions(spark, sf_dir, cents)

    qrow = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select(vec.alias("qv")).collect()
    if not qrow:
        raise ValueError(f"query vector {_QUERY_VEC_ID} not found in {sf_dir!r}")
    qv = np.array(qrow[0].qv)
    Cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    probe = np.argsort(-(Cn @ (qv / np.linalg.norm(qv))))[:_IVF_NPROBE].tolist()

    lists = spark.read.parquet(staged)
    q = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select(vec.alias("qv"))
    cos = F.round(cosine(F.col("v"), F.col("qv")), 6)
    return (
        lists.filter(
            F.col("ivf_cluster").isin(sorted(int(c) for c in probe))
            & (F.col("vec_id") != _QUERY_VEC_ID)
        )
        .select("vec_id", "label", vec.alias("v"))
        .join(F.broadcast(q))
        .select("vec_id", "label", cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(_TOP_K)
    )


_PQ_M = settings.PQ_M
_PQ_KS = settings.PQ_KS
_PQ_NPROBE = settings.PQ_NPROBE
_PQ_REFINE = settings.PQ_REFINE


def _train_pq_codebooks(emb: DataFrame) -> np.ndarray:
    """Train the product-quantization codebooks driver-side on the same
    bounded sample as the coarse quantizer: the embedding space splits
    into PQ_M contiguous subspaces and each gets an independent
    PQ_KS-centroid L2 k-means (Lloyd, fixed seed/iters) over the
    NORMALIZED sample — normalization first makes the per-subspace inner
    products sum to the cosine estimate.  Returns (M, KS, dim/M)."""
    sample = (
        emb.orderBy("vec_id")
        .limit(_IVF_TRAIN_SAMPLE)
        .select(F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    )
    X = np.array([r.v for r in sample])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    dim = X.shape[1]
    if dim % _PQ_M:
        raise ValueError(
            f"SDIS_PQ_M={_PQ_M} must divide the embedding dim {dim}"
        )
    d = dim // _PQ_M
    rng = np.random.default_rng(_LSH_SEED)
    Xs = Xn.reshape(len(X), _PQ_M, d)
    books = np.zeros((_PQ_M, _PQ_KS, d))
    for m in range(_PQ_M):
        sub = Xs[:, m, :]
        ks = min(_PQ_KS, len(sub))
        cb = sub[rng.choice(len(sub), size=ks, replace=False)].copy()
        for _ in range(_IVF_ITERS):
            dist = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
            assign = np.argmin(dist, axis=1)
            for j in range(ks):
                members = sub[assign == j]
                if len(members):
                    cb[j] = members.mean(axis=0)
        books[m, :ks] = cb
    return books


@register("ext_sim_ivf_pq")  # approximate by construction → rows-only
def ext_sim_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ approximate nearest neighbors (the Faiss ``IVFx,PQy``
    scale path): coarse quantizer routes the query to its PQ_NPROBE
    inverted lists, candidates in those lists are ranked by ASYMMETRIC
    DISTANCE COMPUTATION over 16-byte PQ codes — one (M x KS)
    inner-product lookup table built driver-side from the query, scored
    per Arrow batch as a vectorized numpy gather — and only the ADC
    top REFINE*k survivors get their raw vectors read back for the
    exact-cosine re-rank.

    Why this is the 100 TB shape: the 64-dim float corpus is 256 B/row;
    codes are 16 B/row (32x), so the ADC pass over ~1.5x IVF's probe
    budget still reads ~6% of the bytes an IVF-Flat probe would, and
    raw vectors are fetched for a CONSTANT number of rows (REFINE*k)
    regardless of corpus size.  In production the (cid, codes) columns
    are written at ingest exactly like ``ext_sim_ivf_indexed``'s
    partitioned layout / ``ext_sim_lsh_indexed``'s stored signatures —
    this operator demonstrates the query math; those demonstrate the
    storage split.  Training is the same bounded driver sample as IVF
    (never a corpus shuffle).  Codebooks/centroids ship to executors
    inside the UDF closure (KB-scale).  Measured recall@10 vs brute
    force is pinned in tests and tracked in BASELINE.md; knobs are
    env-tunable (SDIS_PQ_M / _KS / _NPROBE / _REFINE)."""
    emb = table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    cents = _train_centroids(emb)
    books = _train_pq_codebooks(emb)
    M, KS, d = books.shape

    qrow = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select(
        vec.alias("qv")
    ).collect()
    if not qrow:
        raise ValueError(f"query vector {_QUERY_VEC_ID} not found in {sf_dir!r}")
    qv = np.array(qrow[0].qv)
    qn = qv / np.linalg.norm(qv)
    Cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    probe = sorted(
        int(c)
        for c in np.argsort(-(Cn @ qn))[: min(_PQ_NPROBE, len(Cn))]
    )
    # The query-side ADC lookup table: LUT[m][j] = <q_m, codebook_m[j]>;
    # a candidate's estimated cosine is sum_m LUT[m][code_m].
    LUT = np.einsum("md,mkd->mk", qn.reshape(M, d), books)

    @pandas_udf("int")
    def nearest_centroid(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="int32")
        X = np.array(col.tolist(), dtype=np.float64)
        return pd.Series(np.argmax(X @ Cn.T, axis=1).astype("int32"))

    @pandas_udf("double")
    def adc_score(col: pd.Series) -> pd.Series:
        """ADC over the ENCODED vector: encode (per-subspace argmin to
        the codebook) then gather from the LUT — one numpy pass per
        Arrow batch.  Inline encode keeps the op self-contained; a
        stored-codes layout skips straight to the gather."""
        if len(col) == 0:
            return pd.Series([], dtype="float64")
        X = np.array(col.tolist(), dtype=np.float64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        Xs = Xn.reshape(len(X), M, d)
        est = np.zeros(len(X))
        for m in range(M):
            # ||x - c||^2 argmin via the expansion: argmax (2<x,c> - |c|^2)
            cb = books[m]
            codes = np.argmax(
                2.0 * (Xs[:, m, :] @ cb.T) - (cb * cb).sum(axis=1)[None, :],
                axis=1,
            )
            est += LUT[m, codes]
        return pd.Series(est)

    cand = (
        emb.select("vec_id", vec.alias("v"))
        .withColumn("cid", nearest_centroid(F.col("v")))
        .filter(F.col("cid").isin(probe) & (F.col("vec_id") != _QUERY_VEC_ID))
        .select("vec_id", adc_score(F.col("v")).alias("adc"))
        .orderBy(F.desc("adc"), F.asc("vec_id"))
        .limit(_PQ_REFINE * _TOP_K)
    )
    # Refine: raw vectors re-read ONLY for the broadcast-small ADC
    # survivors; exact cosine decides the final top-k.
    q = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select(vec.alias("qv"))
    cos = F.round(cosine(F.col("v"), F.col("qv")), 6)
    return (
        emb.join(F.broadcast(cand.select("vec_id")), "vec_id")
        .select("vec_id", "label", vec.alias("v"))
        .join(F.broadcast(q))
        .select("vec_id", "label", cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(_TOP_K)
    )


_PQ_DIR_CACHE: dict[str, str] = {}


def _stage_pq_codes(
    spark: SparkSession, sf_dir: str, cents: np.ndarray, books: np.ndarray
) -> str:
    """Write the PQ-coded corpus ``(vec_id, label, codes)`` PARTITIONED
    BY inverted-list id — the ingest half of the IVF-PQ production
    story: one pass assigns each vector to its coarse list and encodes
    its 16-byte code array; the stored table holds NO raw embeddings,
    so a probe scans only probed-list code files (partition pruning)
    and the byte budget per row is the code width, not the vector
    width.  Cached per (process, sf_dir)."""
    key = os.path.abspath(sf_dir)
    cached = _PQ_DIR_CACHE.get(key)
    if cached is not None and os.path.isdir(cached):
        return cached
    Cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    M, KS, d = books.shape

    @pandas_udf("struct<cid: int, codes: array<smallint>>")
    def assign_encode(col: pd.Series) -> pd.DataFrame:
        if len(col) == 0:
            return pd.DataFrame({"cid": pd.Series([], dtype="int32"),
                                 "codes": pd.Series([], dtype="object")})
        X = np.array(col.tolist(), dtype=np.float64)
        cid = np.argmax(X @ Cn.T, axis=1).astype("int32")
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        Xs = Xn.reshape(len(X), M, d)
        codes = np.zeros((len(X), M), dtype=np.int16)
        for m in range(M):
            cb = books[m]
            codes[:, m] = np.argmax(
                2.0 * (Xs[:, m, :] @ cb.T) - (cb * cb).sum(axis=1)[None, :],
                axis=1,
            )
        return pd.DataFrame({"cid": cid, "codes": list(codes)})

    out = tempfile.mkdtemp(prefix="sdis_pq_codes_")
    (
        table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            "label",
            assign_encode(F.col("embedding").cast("array<double>")).alias("ae"),
        )
        .select(
            "vec_id",
            "label",
            F.col("ae.codes").alias("codes"),
            F.col("ae.cid").alias("ivf_cluster"),
        )
        .write.mode("overwrite")
        .partitionBy("ivf_cluster")
        .parquet(out)
    )
    _PQ_DIR_CACHE[key] = out
    return out


@register("ext_sim_pq_indexed")  # approximate by construction → rows-only
def ext_sim_pq_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ over a STORED code layout — the full production split the
    inline ``ext_sim_ivf_pq`` computes on the fly:

    1. ingest wrote ``(vec_id, label, codes) partitionBy(ivf_cluster)``
       once (`_stage_pq_codes`) — 16-byte codes, no raw vectors;
    2. the query prunes to its NPROBE list directories statically
       (PartitionFilters, pinned by plan test) and ADC-scores the codes
       with one LUT gather per Arrow batch — per-row bytes read = code
       width, the 32x win over the ivf_indexed raw-vector scan;
    3. only the top REFINE*k ADC survivors join back to the embeddings
       table (broadcast of a constant-size id list) for the exact
       re-rank.

    Same quantizer/codebooks/seed as ext_sim_ivf_pq → identical top-k
    (pinned by test)."""
    emb = table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    cents = _train_centroids(emb)
    books = _train_pq_codebooks(emb)
    M, KS, d = books.shape
    staged = _stage_pq_codes(spark, sf_dir, cents, books)

    qrow = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select(vec.alias("qv")).collect()
    if not qrow:
        raise ValueError(f"query vector {_QUERY_VEC_ID} not found in {sf_dir!r}")
    qv = np.array(qrow[0].qv)
    qn = qv / np.linalg.norm(qv)
    Cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    probe = sorted(
        int(c) for c in np.argsort(-(Cn @ qn))[: min(_PQ_NPROBE, len(Cn))]
    )
    LUT = np.einsum("md,mkd->mk", qn.reshape(M, d), books)

    @pandas_udf("double")
    def adc_gather(codes: pd.Series) -> pd.Series:
        """Pure LUT gather — encoding happened at ingest."""
        if len(codes) == 0:
            return pd.Series([], dtype="float64")
        C = np.array(codes.tolist(), dtype=np.int64)
        return pd.Series(LUT[np.arange(M)[None, :], C].sum(axis=1))

    cand = (
        spark.read.parquet(staged)
        .filter(
            F.col("ivf_cluster").isin(probe)
            & (F.col("vec_id") != _QUERY_VEC_ID)
        )
        .select("vec_id", adc_gather(F.col("codes")).alias("adc"))
        .orderBy(F.desc("adc"), F.asc("vec_id"))
        .limit(_PQ_REFINE * _TOP_K)
    )
    q = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select(vec.alias("qv"))
    cos = F.round(cosine(F.col("v"), F.col("qv")), 6)
    return (
        emb.join(F.broadcast(cand.select("vec_id")), "vec_id")
        .select("vec_id", "label", vec.alias("v"))
        .join(F.broadcast(q))
        .select("vec_id", "label", cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(_TOP_K)
    )


_N_BATCH_QUERIES = 5
_BATCH_TOP_K = 5


@register(
    "ext_sim_batch_topk",
    oracle=f"""
SELECT query_id, vec_id, cos_sim
FROM (
  SELECT q.vec_id AS query_id, e.vec_id,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                      CAST(q.embedding AS DOUBLE[])), 6) AS cos_sim,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                 CAST(q.embedding AS DOUBLE[])), 6) DESC,
                    e.vec_id) AS rn
  FROM embeddings e
  JOIN embeddings q ON q.vec_id < {_N_BATCH_QUERIES} AND e.vec_id <> q.vec_id
)
WHERE rn <= {_BATCH_TOP_K}
""",
)
def ext_sim_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch similarity search: top-k neighbors for EACH of a set of query
    vectors in one pass — the shape of production retrieval (dedup against
    a seed set, k-NN labeling, RAG eval).

    The query set broadcasts (it is small by construction); every corpus
    partition scores its rows against all queries locally — one scan of
    the corpus total, NOT one scan per query — then a window rank keyed by
    query_id keeps k per query.  At 100 TB the corpus side never shuffles:
    only (n_queries × k) candidate rows move."""
    emb = table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    corpus = emb.select("vec_id", vec.alias("v"))
    queries = emb.filter(F.col("vec_id") < _N_BATCH_QUERIES).select(
        F.col("vec_id").alias("query_id"), vec.alias("qv")
    )
    from pyspark.sql import Window

    scored = (
        corpus.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _BATCH_TOP_K)
        .select("query_id", "vec_id", "cos_sim")
    )


_RANGE_SIM = 0.3  # radius-search threshold — SEMANTIC (in the oracle;
# the corpus' true neighbors sit at cos 0.28-0.41, so 0.3 yields a real set)


@register(
    "ext_sim_range_search",
    oracle=f"""
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
  WHERE vec_id = {_QUERY_VEC_ID}
)
SELECT e.vec_id, e.label,
       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS cos_sim
FROM embeddings e, q
WHERE e.vec_id <> {_QUERY_VEC_ID}
  AND round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6)
        >= {_RANGE_SIM}
ORDER BY cos_sim DESC, e.vec_id
""",
)
def ext_sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (radius) similarity search: every neighbor with cosine >=
    the threshold, not a fixed top-k — the retrieval shape for
    contamination screens and "find all near-matches" audits where the
    answer SIZE is the signal.  Same broadcast-query one-pass scan as
    ext_sim_cosine, but the filter replaces the heap: output is
    row-proportional to matches, so no TakeOrderedAndProject cap — at
    100 TB the threshold, not a k, bounds the result."""
    emb = table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    q = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select(vec.alias("qv"))
    cos = F.round(cosine(vec, F.col("qv")), 6)
    return (
        emb.filter(F.col("vec_id") != _QUERY_VEC_ID)
        .join(F.broadcast(q))
        .select("vec_id", "label", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= _RANGE_SIM)
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    )


_KNN_K = 5  # neighbors per vector in the kNN self-join


_KNN_ORACLE = f"""
WITH pairs AS (
  SELECT a.vec_id AS qid, b.vec_id AS nid,
         round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6)
           AS cos_sim
  FROM embeddings a
  JOIN embeddings b ON a.vec_id <> b.vec_id
),
ranked AS (
  SELECT qid, nid, cos_sim,
         row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid)
           AS rnk
  FROM pairs
)
SELECT qid, nid, cos_sim, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {_KNN_K}
"""


@register("ext_knn_join", oracle=_KNN_ORACLE)
def ext_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT kNN self-join: every vector's k nearest neighbors by
    cosine — the all-pairs retrieval SemDeDup-style semantic dedup and
    per-example hard-negative mining need (every doc gets neighbors, not
    one broadcast query).

    Execution: block-nested-loop tiling over the whole corpus — chunk
    ``c = pmod(xxhash64(vec_id), P)``, A replicated to tiles
    (c, 0..P-1), B to (0..P-1, c) — COGROUPED per tile into one Arrow
    batch pair and scored as a single BLAS GEMM (``A @ B.T``), so no
    task ever owns more than ~(N/P)^2 pairs and no pair ever exists as
    a row: each tile emits only its local top-k per query under the
    global (-rounded_cos, nid) order.  The final rank-over-window
    filter over the K·P-bounded candidates plans WindowGroupLimit
    per-partition heaps.  Ranking compares the ROUNDED cosine (nid as
    total tie-break) so both engines rank identical keys — raw doubles
    differ in the last ulp across summation orders.

    Honest 100 TB posture: the pair space is O(N^2/P) per task and
    exact; for corpora where even that is too much, ``ext_knn_join_ivf``
    is the same contract over IVF-probed candidates at a measured
    recall."""
    vraw = F.col("embedding").cast("array<double>")
    # Normalize ONCE per row at scan time (norm materialized as its own
    # column so it folds once per row, not per element): the pair stage
    # then costs a single dot per pair instead of dot + two norm folds —
    # it is the O(N^2/P) hot loop, so this is a ~3x traversal cut.
    emb = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", vraw.alias("v0"))
        .withColumn("nrm", _norm(F.col("v0")))
        .select(
            "vec_id",
            F.transform(
                "v0", lambda x: F.try_divide(x, F.col("nrm"))
            ).alias("v"),
            F.pmod(F.xxhash64("vec_id"), F.lit(_TILE_P)).cast("int").alias("chunk"),
        )
    )
    from ..catalog import table_fresh

    # Fresh-scan right side: see ext_dedup_embedding — a self-cogroup
    # sharing one lineage loses its right-side data columns under
    # column pruning (Spark attribute-dedup bug).
    vraw_r = F.col("embedding").cast("array<double>")
    emb_r = (
        table_fresh(spark, sf_dir, "embeddings")
        .select("vec_id", vraw_r.alias("v0"))
        .withColumn("nrm", _norm(F.col("v0")))
        .select(
            "vec_id",
            F.transform(
                "v0", lambda x: F.try_divide(x, F.col("nrm"))
            ).alias("v"),
            F.pmod(F.xxhash64("vec_id"), F.lit(_TILE_P)).cast("int").alias("chunk"),
        )
    )
    slots = F.explode(F.array(*[F.lit(i) for i in range(_TILE_P)]))
    a = emb.select(
        F.col("chunk").alias("ti"), slots.alias("tj"), "vec_id", "v"
    )
    b = emb_r.select(
        slots.alias("ti"), F.col("chunk").alias("tj"), "vec_id", "v"
    )

    def tile_topk(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # One BLAS GEMM per tile replaces per-pair interpreted folds
        # (higher-order zip_with/aggregate expressions are NOT
        # whole-stage-codegen'd; measured 7.0s -> GEMM path below at
        # sf0.1).  Per-tile top-k under the (-rounded_cos, nid) order
        # bounds the emission at K rows per query per tile — the
        # global window never sees the O(N^2/P) pair stream.
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(
                {
                    "qid": pd.Series([], dtype="int64"),
                    "nid": pd.Series([], dtype="int64"),
                    "cos_sim": pd.Series([], dtype="float64"),
                }
            )
        A = np.array(left["v"].tolist(), dtype=np.float64)
        B = np.array(right["v"].tolist(), dtype=np.float64)
        qids = left["vec_id"].to_numpy()
        nids = right["vec_id"].to_numpy()
        S = np.round(A @ B.T, 6)
        S[qids[:, None] == nids[None, :]] = -np.inf  # self-pairs out
        out_q: list = []
        out_n: list = []
        out_c: list = []
        for i in range(S.shape[0]):
            row = S[i]
            # exact tile-local top-k under the GLOBAL tie order
            # (-cos, nid): lexsort's last key is primary.
            order = np.lexsort((nids, -row))[:_KNN_K]
            for j in order:
                if row[j] == -np.inf:
                    break
                out_q.append(qids[i])
                out_n.append(nids[j])
                out_c.append(row[j])
        return pd.DataFrame(
            {"qid": out_q, "nid": out_n, "cos_sim": out_c}
        )

    from pyspark.sql.window import Window

    cand = (
        a.groupBy("ti", "tj")
        .cogroup(b.groupBy("ti", "tj"))
        .applyInPandas(tile_topk, "qid long, nid long, cos_sim double")
    )
    # Each query's true global top-k rows live in SOME tile and are in
    # that tile's local top-k, so ranking the K*P-bounded candidate set
    # is exact; the rank filter plans WindowGroupLimit heaps.
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("nid"))
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _KNN_K)
        .select("qid", "nid", "cos_sim", F.col("rnk").cast("long").alias("rnk"))
    )


@register("ext_knn_join_ivf")  # approximate by construction → rows-only
def ext_knn_join_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-probed kNN self-join — the sub-quadratic scale path for
    ``ext_knn_join``: every vector is assigned to its nearest-centroid
    inverted list (one GEMM per Arrow batch); as a QUERY it probes its
    NPROBE closest lists; candidates are the probe x member join WITHIN
    each list, so per-query work is the probed lists' rows, not N.

    Skew control: list sizes are data-dependent, so the join key is
    ``(cid, tile)`` — members carry a deterministic tile
    ``pmod(xxhash64(vec_id), P)`` and each probe replicates across the
    P tiles; a hot list splits into P bounded tasks instead of one
    straggler.  Same rank-over-window top-k (WindowGroupLimit heaps) as
    the exact join.  Recall vs ext_knn_join is pinned in
    tests/test_components.py; at 100 TB the probed fraction is also the
    only data READ when composed with the ext_sim_ivf_indexed stored
    layout."""
    emb = table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    cents = _train_centroids(emb)
    Cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    nprobe = min(_IVF_NPROBE, len(Cn))

    @pandas_udf("int")
    def nearest_centroid(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="int32")
        M = np.array(col.tolist(), dtype=np.float64)
        return pd.Series(np.argmax(M @ Cn.T, axis=1).astype("int32"))

    @pandas_udf("array<int>")
    def probe_centroids(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="object")
        M = np.array(col.tolist(), dtype=np.float64)
        order = np.argsort(-(M @ Cn.T), axis=1)[:, :nprobe].astype("int32")
        return pd.Series(list(order))

    from pyspark.sql.window import Window

    # Pre-normalized vectors; the candidate stage is a cogrouped GEMM
    # per (cid, tile) — same rewrite as ext_knn_join (interpreted
    # zip_with folds paid per pair), same self-cogroup rules: fresh-scan
    # lineage for the right side, identical INT key types on both sides.
    def normed(t):
        vraw = F.col("embedding").cast("array<double>")
        return (
            t.select("vec_id", vraw.alias("v0"))
            .withColumn("nrm", _norm(F.col("v0")))
            .select(
                "vec_id",
                F.transform(
                    "v0", lambda x: F.try_divide(x, F.col("nrm"))
                ).alias("v"),
            )
        )

    from ..catalog import table_fresh

    base = normed(emb)
    base_r = normed(table_fresh(spark, sf_dir, "embeddings"))
    members = base_r.select(
        F.col("vec_id").alias("nid"),
        F.col("v").alias("nv"),
        nearest_centroid("v").alias("cid"),
        F.pmod(F.xxhash64("vec_id"), F.lit(_TILE_P))
        .cast("int")
        .alias("tile"),
    )
    tiles = F.explode(F.array(*[F.lit(i) for i in range(_TILE_P)]))
    queries = base.select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.explode(probe_centroids("v")).alias("cid"),
    ).select("qid", "qv", "cid", tiles.alias("tile"))

    def list_topk(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(
                {
                    "qid": pd.Series([], dtype="int64"),
                    "nid": pd.Series([], dtype="int64"),
                    "cos_sim": pd.Series([], dtype="float64"),
                }
            )
        Q = np.array(left["qv"].tolist(), dtype=np.float64)
        M = np.array(right["nv"].tolist(), dtype=np.float64)
        qids = left["qid"].to_numpy()
        nids = right["nid"].to_numpy()
        S = np.round(Q @ M.T, 6)
        S[qids[:, None] == nids[None, :]] = -np.inf
        oq: list = []
        on: list = []
        oc: list = []
        for i in range(S.shape[0]):
            row = S[i]
            order = np.lexsort((nids, -row))[:_KNN_K]
            for j in order:
                if row[j] == -np.inf:
                    break
                oq.append(qids[i])
                on.append(nids[j])
                oc.append(row[j])
        return pd.DataFrame({"qid": oq, "nid": on, "cos_sim": oc})

    cand = (
        queries.groupBy("cid", "tile")
        .cogroup(members.groupBy("cid", "tile"))
        .applyInPandas(list_topk, "qid long, nid long, cos_sim double")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("nid"))
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _KNN_K)
        .select("qid", "nid", "cos_sim", F.col("rnk").cast("long").alias("rnk"))
    )


_SEMDEDUP_ORACLE = f"""
WITH RECURSIVE
pairs AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a
  JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) >= {_NEAR_DUP_COS}
),
edges AS (
  SELECT a, b FROM pairs
  UNION ALL
  SELECT b, a FROM pairs
),
reach(src, dst) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
),
comp AS (
  SELECT vec_id,
         least(vec_id, coalesce(min(dst), vec_id)) AS component_id
  FROM embeddings LEFT JOIN reach ON src = vec_id
  GROUP BY vec_id
)
SELECT d.doc_id,
       c.component_id,
       CAST(count(*) OVER (PARTITION BY c.component_id) AS BIGINT)
         AS cluster_size,
       (row_number() OVER (PARTITION BY c.component_id
                           ORDER BY d.n_chars DESC, d.doc_id) = 1) AS keep
FROM documents d JOIN comp c ON c.vec_id = d.doc_id
"""


@register("ext_semdedup_prune", oracle=_SEMDEDUP_ORACLE)
def ext_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style corpus pruning (Abbas et al. 2023, arXiv:2303.09540):
    cluster the corpus by embedding similarity, then KEEP exactly one
    representative per semantic cluster — chosen by a quality signal
    (longest document, doc_id tie-break), not arbitrarily.  Composes two
    verified components: ``ext_dedup_embedding_cluster`` (tiled exact
    pair join -> connected components) supplies the clusters, and a
    per-cluster window ranks members by ``n_chars``.  Every document
    comes back with its cluster id, cluster size, and keep flag, so the
    same frame drives both the pruned corpus (``keep``) and the
    retention report (size histogram).

    Scale shape: one shuffle joins documents to their component labels
    (both sides corpus-sized, equi-key), and the ranking window
    partitions BY CLUSTER — no global window; skew is bounded because a
    semantic cluster's size is bounded by the near-dup mass, and the
    heavy pair/CC machinery upstream is already tile/contraction
    bounded.  The oracle recomputes clusters with a recursive-CTE
    closure and ranks with the same window, declaratively."""
    from pyspark.sql import Window

    comp = ext_dedup_embedding_cluster(spark, sf_dir).select(
        "vec_id", "component_id"
    )
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    j = docs.join(comp, docs.doc_id == comp.vec_id).drop("vec_id")
    size_w = Window.partitionBy("component_id")
    rank_w = Window.partitionBy("component_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return j.select(
        "doc_id",
        "component_id",
        F.count(F.lit(1)).over(size_w).alias("cluster_size"),
        (F.row_number().over(rank_w) == 1).alias("keep"),
    )


@register(
    "ext_embedding_quantize",
    oracle="""
WITH d AS (
  SELECT vec_id, label, embedding,
         unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings
), e AS (
  SELECT vec_id, label, i,
         CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
  FROM d
), b AS (
  SELECT i, CAST(min(v) AS DOUBLE) AS mn, CAST(max(v) AS DOUBLE) AS mx
  FROM e GROUP BY i
), c AS (
  SELECT e.vec_id, e.label, e.i,
         CAST(CASE WHEN b.mx = b.mn THEN 0
              ELSE least(255, floor(((e.v - b.mn) * 255.0) / (b.mx - b.mn)))
         END AS INT) AS code
  FROM e JOIN b USING (i)
)
SELECT vec_id, label,
       array_to_string(list(code ORDER BY i), ',') AS codes,
       CAST(sum(code) AS BIGINT)                   AS code_sum
FROM c
GROUP BY vec_id, label
""",
)
def ext_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INT8 scalar quantization of the embedding column: per-dimension
    min/max over the corpus define a linear [0, 255] grid; every vector
    comes back as a comma-joined string of int codes (4x smaller than
    float32 when stored as bytes, the
    standard storage/transfer compression before ANN indexing; PQ —
    ``ext_sim_ivf_pq`` — is the sub-byte sibling).

    Two passes, both scale-flat:

    1. Bounds: one posexplode + groupBy(dim).  Partial aggregation means
       each task ships at most 64 (dim, min, max) triples regardless of
       row count, and the result is a 64-row bounded collect (same
       posture as the IVF training sample / zorder domain bounds).
    2. Encode: the bounds return as two LITERAL arrays inside a
       ``transform`` over the raw vectors — pure projection, no join, no
       shuffle, whole corpus never leaves its input partitioning.

    The quantizer arithmetic ``floor(((v - mn) * 255.0) / (mx - mn))``
    is evaluated in double with identical operation order in Spark and
    DuckDB, so the integer codes hash-match exactly — no float-tolerance
    escape hatch."""
    emb = table(spark, sf_dir, "embeddings")
    bounds = (
        emb.select(F.posexplode("embedding").alias("i", "v"))
        .groupBy("i")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    )
    by_dim = sorted((r.i, float(r.mn), float(r.mx)) for r in bounds)
    mn_arr = F.array([F.lit(mn) for _, mn, _ in by_dim])
    mx_arr = F.array([F.lit(mx) for _, _, mx in by_dim])

    def code(v: Column, i: Column) -> Column:
        mn = F.element_at(mn_arr, i + 1)
        mx = F.element_at(mx_arr, i + 1)
        return (
            F.when(mx == mn, F.lit(0))
            .otherwise(
                F.least(
                    F.lit(255),
                    F.floor(((v.cast("double") - mn) * F.lit(255.0)) / (mx - mn)),
                )
            )
            .cast("int")
        )

    quant = emb.select(
        "vec_id",
        "label",
        F.transform("embedding", code).alias("_codes"),
    )
    # The codes come back joined into one string (not array<int>): the
    # driver's canonicalizer sorts result columns with pandas and dies on
    # array cells (unhashable ndarray) — scalar columns only at the API edge.
    return quant.select(
        "vec_id",
        "label",
        F.array_join(F.transform("_codes", lambda x: x.cast("string")), ",").alias(
            "codes"
        ),
        F.expr(
            "aggregate(_codes, 0L, (acc, x) -> acc + cast(x as bigint))"
        ).alias("code_sum"),
    )


_FILTER_LABEL = 3  # metadata predicate for the hybrid-search query


@register(
    "ext_sim_filtered",
    oracle=f"""
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
  WHERE vec_id = {_QUERY_VEC_ID}
)
SELECT e.vec_id, e.label,
       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS cos_sim
FROM embeddings e, q
WHERE e.vec_id <> {_QUERY_VEC_ID} AND e.label = {_FILTER_LABEL}
ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) DESC,
         e.vec_id
LIMIT {_TOP_K}
""",
)
def ext_sim_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED similarity search (hybrid search: vector + metadata
    predicate) — top-k cosine among vectors whose ``label`` matches.
    The predicate applies BEFORE scoring (pre-filter), the semantics
    retrieval stacks want: post-filtering a global top-k silently
    returns fewer than k when matches are rare.

    Execution: the label filter pushes down to the parquet scan
    (PushedFilters — footer stats skip label-disjoint row groups), the
    broadcast-query scoring pass touches only survivors, and the top-k
    is TakeOrderedAndProject heaps.  At 100 TB the pre-filter composes
    with the stored layouts: a label-partitioned IVF index
    (``ext_sim_ivf_indexed``'s layout keyed by label, ivf_cluster)
    turns the predicate into partition pruning, keeping ANN cost
    proportional to the FILTERED corpus — the widening-nprobe fallback
    when a filter starves candidate lists is the known hard part of
    hybrid ANN, and exact pre-filtered scoring like this is its recall
    baseline."""
    emb = table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    q = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select(vec.alias("qv"))
    cos = F.round(cosine(vec, F.col("qv")), 6)
    return (
        emb.filter(
            (F.col("vec_id") != _QUERY_VEC_ID)
            & (F.col("label") == _FILTER_LABEL)
        )
        .join(F.broadcast(q))
        .select("vec_id", "label", cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(_TOP_K)
    )


@register(
    "ext_embedding_norms",
    oracle="""
WITH norms AS (
  SELECT vec_id, label,
         sqrt(list_reduce(
           list_prepend(0.0,
             list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
           (acc, v) -> acc + v)) AS l2
  FROM embeddings
), st AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         min(l2) AS lo, max(l2) AS hi,
         avg(l2) AS mu
  FROM norms
)
SELECT n.vec_id, n.label,
       floor(n.l2 * 1000000 + 0.5) / 1000000.0 AS l2_norm,
       n.l2 < st.mu * 0.5 OR n.l2 > st.mu * 2.0 AS norm_outlier
FROM norms n CROSS JOIN st
""",
)
def ext_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMBEDDING QA: per-vector L2 norm plus an outlier flag (norm
    outside [mu/2, 2·mu]) — the sanity screen every vector pipeline runs
    before indexing (zero/exploded norms are encoder bugs or corrupt
    rows; cosine search silently tolerates them, which is exactly why
    they must be caught HERE).

    Float determinism for a 64-term sum of squares: the fold runs
    SEQUENTIALLY over the array order (Spark ``aggregate`` HOF ==
    DuckDB ``list_reduce``, both left folds — the ext_kl_divergence
    discipline), so the norm is bit-identical across engines.  The
    corpus-mean threshold is a 1-row broadcast.  The avg(l2) itself is
    aggregation-order-dependent, so the FLAG uses wide margins (2x)
    where a 1-ulp mean wobble cannot flip a comparison — the outputs
    hash exact while the statistic stays honest."""
    emb = table(spark, sf_dir, "embeddings")
    l2 = F.sqrt(
        F.aggregate(
            F.transform(
                "embedding", lambda x: x.cast("double") * x.cast("double")
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    norms = emb.select("vec_id", "label", l2.alias("l2"))
    st = norms.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("l2").alias("lo"),
        F.max("l2").alias("hi"),
        F.avg("l2").alias("mu"),
    )
    return norms.join(F.broadcast(st)).select(
        "vec_id",
        "label",
        (F.floor(F.col("l2") * 1000000 + 0.5) / 1000000.0).alias("l2_norm"),
        (
            (F.col("l2") < F.col("mu") * 0.5) | (F.col("l2") > F.col("mu") * 2.0)
        ).alias("norm_outlier"),
    )


_LAST_IVF_MAINTAIN_ROOT: str | None = None
_IVFM_K = 16       # maintenance-table inverted lists
_IVFM_NPROBE = 4   # cells probed per query vector


def _nearest_cell_udf(Cn: np.ndarray):
    """GEMM argmax assignment UDF over NORMALIZED centroids — shared by
    the maintenance loop and its rebuild-equality test so "same
    quantizer" means same code path, tie behavior included."""

    @pandas_udf("int")
    def nearest_cell(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="int32")
        M = np.array(col.tolist(), dtype=np.float64)
        return pd.Series(np.argmax(M @ Cn.T, axis=1).astype("int32"))

    return nearest_cell


@register("pipeline_ivf_index_maintain")  # ANN probe + txn lifecycle → rows-only
def pipeline_ivf_index_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSACTIONAL IVF index MAINTENANCE — the vector-search twin of
    ``pipeline_minhash_index_maintain``: the embedding corpus arrives in
    batches and the cid-PARTITIONED inverted-list table must stay
    current as each batch commits, so similarity queries always probe a
    fresh index without ever rebuilding it.

    Three vector batches (vec_id % 3) arrive in order.  The coarse
    quantizer trains ONCE on batch 0 (the production posture: the
    quantizer is versioned model state; re-training would orphan every
    stored assignment).  Per tick: (a) each batch vector probes its
    NPROBE nearest cells against the STANDING index — the cid filter
    prunes the table's partitions, so probe IO is the probed fraction
    by layout, not by luck — and exact cosine picks top-1 per query
    (per-pair HOF folds; the GEMM pandas-UDF path of ext_knn_join is
    the swap once batch × probed-rows grows past Arrow-batch scale);
    (b) the batch's (vec_id, cid, vector) rows land in an
    (appId, epoch)-stamped append with the SAME epoch a corpus append
    would carry, so a crash between the pair replays into the txn
    watermark and no-ops (asserted in-line by hand-replaying the final
    tick).

    The maintained table must be INDISTINGUISHABLE from a from-scratch
    assignment of the full corpus under the same quantizer — pinned by
    tests/test_components.py (exact frame equality both ways), along
    with tick-isolation (every tick-t hit's neighbor belongs to a batch
    < t).  Rows-only BY DESIGN: IVF probing is approximate (same reason
    as ext_sim_ivf).

    Scale: index growth is O(batch) rows appended per tick into
    existing cid partitions, never rewritten; per-tick probe work is
    batch × probed lists."""
    global _LAST_IVF_MAINTAIN_ROOT
    from ..sources.delta_log import DeltaLogTable

    root = tempfile.mkdtemp(prefix="sdis_ivf_maintain_")
    _LAST_IVF_MAINTAIN_ROOT = root
    index_t = DeltaLogTable(spark, os.path.join(root, "lists"))
    app = "sdis-ivf-maintain"

    emb = table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    # A smaller quantizer than the query-path _IVF_K: the maintenance
    # corpus batches are list-count-sensitive (files per commit scale
    # with touched cells), and ~corpus/16 rows per list is the healthy
    # occupancy the testdata supports — the degeneracy lesson applied.
    cents = _train_centroids(emb.filter(F.col("vec_id") % 3 == 0), k=_IVFM_K)
    Cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    nprobe = min(_IVFM_NPROBE, len(Cn))
    nearest_cell = _nearest_cell_udf(Cn)

    @pandas_udf("array<int>")
    def probe_cells(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="object")
        M = np.array(col.tolist(), dtype=np.float64)
        top = np.argsort(-(M @ Cn.T), axis=1)[:, :nprobe].astype("int32")
        return pd.Series(list(top))

    out = None
    batch = None
    for i in range(3):
        batch = emb.filter(F.col("vec_id") % 3 == i).select(
            "vec_id", vec.alias("v"), nearest_cell(vec).alias("cid")
        )
        if index_t.latest_version() >= 0:
            # Materialize the probe rows ONCE (guide §2.4/§4): this frame
            # is consumed twice — the touched-cell collect below AND the
            # lazily-evaluated hits at the final action — so without the
            # checkpoint the probe_cells pandas UDF (argsort GEMM over the
            # whole batch) ran twice per tick.  Bounded: batch × nprobe
            # rows (the r15 checkpoint-size rule).
            probes = (
                emb.filter(F.col("vec_id") % 3 == i)
                .select(
                    F.col("vec_id").alias("q_id"),
                    vec.alias("qv"),
                    F.explode(probe_cells(vec)).alias("cid"),
                )
                .localCheckpoint(eager=True)
            )
            touched = [
                r.cid
                for r in probes.select("cid").distinct().collect()
            ]
            stored = index_t.read().filter(F.col("cid").isin(touched))
            cos = F.round(cosine(F.col("qv"), F.col("v")), 6)
            pairs = probes.join(stored, "cid").select(
                "q_id", F.col("vec_id").alias("nn_id"), cos.alias("cos_sim")
            )
            m = F.min(
                F.struct((-F.col("cos_sim")).alias("nc"), F.col("nn_id").alias("n"))
            )
            hits = pairs.groupBy("q_id").agg(
                m.getField("n").alias("nn_id"),
                (-m.getField("nc")).alias("cos_sim"),
            ).select(
                F.lit(i).cast("long").alias("tick"),
                F.col("q_id").alias("vec_id"),
                "nn_id",
                "cos_sim",
            )
            out = hits if out is None else out.unionByName(hits)
        index_t.commit_append(batch, partition_by=["cid"], txn=(app, i))
    head = index_t.latest_version()
    # Crash-replay of the final tick: same epoch, same frame — the txn
    # watermark must swallow the append (re-deriving the assignment UDF
    # plan buys nothing: an honest replayer re-sends the batch it has).
    index_t.commit_append(batch, partition_by=["cid"], txn=(app, 2))
    if index_t.latest_version() != head:
        raise RuntimeError("replayed maintenance tick double-applied")
    return out.orderBy("tick", "vec_id")


_HARD_NEG_PER_ANCHOR = 2  # hardest cross-label neighbors kept per anchor


@register(
    "ext_hard_negatives",
    oracle=f"""
WITH knn AS ({_KNN_ORACLE}),
lab AS (SELECT vec_id, label FROM embeddings),
cross_label AS (
  SELECT k.qid, la.label AS q_label, k.nid, lb.label AS n_label, k.cos_sim,
         row_number() OVER (PARTITION BY k.qid
                            ORDER BY k.cos_sim DESC, k.nid) AS hr
  FROM knn k
  JOIN lab la ON la.vec_id = k.qid
  JOIN lab lb ON lb.vec_id = k.nid
  WHERE la.label <> lb.label
)
SELECT qid, q_label, nid, n_label, cos_sim
FROM cross_label WHERE hr <= {_HARD_NEG_PER_ANCHOR}
ORDER BY qid, cos_sim DESC, nid
""",
)
def ext_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-NEGATIVE MINING for contrastive training: per anchor vector,
    the {m} most-similar neighbors with a DIFFERENT label — the
    near-miss examples that carry the gradient signal easy random
    negatives lack (the standard dense-retriever / embedding-model
    curriculum step).  Composes ``ext_knn_join``'s tiled-GEMM top-k
    (the corpus-scale pair stage, already sub-quadratic) with two
    |candidates|-row label joins and a re-rank over each anchor's
    ≤ {k}-row candidate list — mining cost is O(anchors · k), the pair
    machinery is reused, not re-run."""
    knn = ext_knn_join(spark, sf_dir)
    lab = table(spark, sf_dir, "embeddings").select("vec_id", "label")
    la = lab.select(F.col("vec_id").alias("qid"), F.col("label").alias("q_label"))
    lb = lab.select(F.col("vec_id").alias("nid"), F.col("label").alias("n_label"))
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), "nid")
    return (
        knn.join(la, "qid")
        .join(lb, "nid")
        .filter(F.col("q_label") != F.col("n_label"))
        .withColumn("hr", F.row_number().over(w))
        .filter(F.col("hr") <= _HARD_NEG_PER_ANCHOR)
        .select("qid", "q_label", "nid", "n_label", "cos_sim")
        .orderBy("qid", F.desc("cos_sim"), "nid")
    )
