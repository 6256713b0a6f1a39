"""Distributed k-means clustering over the ``embeddings`` table — the
semantic-clustering primitive behind corpus curation (cluster-balanced
sampling, SemDeDup-style pruning, topic-stratified eval splits).

Lloyd's algorithm in its canonical cluster shape: centroids are a k×d
frame — BOUNDED model state, the one thing that legitimately lives on the
driver and broadcasts into each pass (same posture as ``ext_bpe_train``'s
merge table and ``ext_lm_score``'s model) — while every data-proportional
step stays distributed:

- ASSIGNMENT is a pure projection: the k centroid vectors become literal
  arrays and each row folds ``sum((x-c)^2)`` per centroid via a zip_with/
  aggregate HOF, argmin via ``array_min`` over (dist, j) structs
  (lexicographic → deterministic smallest-j tie-break, the
  ``join_spatial_nearest`` pattern).  NO shuffle, no UDF.
- UPDATE is one posexplode + groupBy (cluster, pos) per iteration —
  map-side combined to k·d rows per input partition before the exchange,
  then a k·d-row collect refreshes the literals.  At 100 TB the exchange
  moves k·d·|partitions| rows, never the corpus.

Cross-engine float discipline (the llm/embedding_stats.py posture):
vectors quantize to integer MICRO-units up front, so every distance is an
EXACT integer and every updated centroid is ``floor(sum/n + 0.5)`` of an
exact integer sum — bit-identical in Spark, DuckDB, and the driver-side
Python that carries centroids between iterations.  Determinism therefore
needs no seed: init is the k smallest vec_ids, and ITERS is fixed.

The DuckDB oracles unroll the iterations as MATERIALIZED CTE chains (the
graph_hits recipe — inline re-expansion is exponential).

Reference analog: none (19-file satellite ETL cron has no ML surface);
[EXT] mandate territory like llm/simsearch.py / llm/embedding_stats.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_K = 4  # clusters
_ITERS = 3  # fixed Lloyd iterations (assignment reported after the last)
_DIM = 64  # driver corpus embedding dimensionality (all SFs)
_SAMPLE_PER_CLUSTER = 10  # cluster-balanced sample size

_MICRO = "CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings with ``xm`` = integer micro-unit vector (exact longs)."""
    emb = table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.expr(f"transform(embedding, v -> {_MICRO})").alias("xm"),
    )


def _assign_expr(cents: dict[int, list[int]]):
    """(cl, d) struct column: argmin_j sum((xm-c_j)^2) with smallest-j
    tie-break via lexicographic struct array_min.  Pure projection —
    integer HOF folds over literal centroid arrays, no shuffle."""
    scored = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col("xm"),
                        F.array(*[F.lit(v) for v in c]),
                        lambda x, y: (x - y) * (x - y),
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, t: acc + t,
                ).alias("d"),
                F.lit(j).cast("int").alias("j"),
            )
            for j, c in sorted(cents.items())
        ]
    )
    return F.array_min(scored)


def _lloyd_model(spark: SparkSession, sf_dir: str) -> dict[int, list[int]]:
    """The trained model: centroids after the last Lloyd update (the
    ones the final assignment scores against)."""
    q = _quantized(spark, sf_dir)
    init = q.orderBy("vec_id").limit(_K).select("xm").collect()
    cents = {j: list(r.xm) for j, r in enumerate(init)}
    for _ in range(_ITERS - 1):
        m = _assign_expr(cents)
        asg = q.select("xm", m.getField("j").alias("cl"))
        # k·d-row bounded collect: the Lloyd model refresh.  floor(s/c+0.5)
        # on exact ints < 2^53 is bit-identical to the oracle's
        # CAST(floor(CAST(sum AS DOUBLE)/count + 0.5) AS BIGINT).
        rows = (
            asg.select("cl", F.posexplode("xm").alias("pos", "v"))
            .groupBy("cl", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        cents = {}
        for r in rows:
            cents.setdefault(r.cl, [0] * _DIM)[r.pos] = math.floor(r.s / r.n + 0.5)
    return cents


def _lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final-iteration assignment frame (vec_id, label, cl, d)."""
    q = _quantized(spark, sf_dir)
    m = _assign_expr(_lloyd_model(spark, sf_dir))
    return q.select(
        "vec_id", "label", m.getField("j").alias("cl"), m.getField("d").alias("d")
    )


# ---------------------------------------------------------------------------
# Shared oracle chain: quantize -> explode -> init -> ITERS x (assign,update)
# ---------------------------------------------------------------------------


def _o_assign(a: str, c: str) -> str:
    return f"""
{a} AS MATERIALIZED (
  SELECT vec_id, (m).j AS cl, (m).d AS d FROM (
    SELECT vec_id, min(struct_pack(d := dd, j := j)) AS m FROM (
      SELECT x.vec_id, {c}.j, CAST(sum((x.v - {c}.c) * (x.v - {c}.c)) AS BIGINT) AS dd
      FROM x JOIN {c} USING (pos) GROUP BY 1, 2
    ) GROUP BY 1
  )
)"""


def _o_update(cn: str, a: str) -> str:
    return f"""
{cn} AS MATERIALIZED (
  SELECT a.cl AS j, x.pos,
         CAST(floor(CAST(sum(x.v) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS c
  FROM {a} a JOIN x USING (vec_id) GROUP BY 1, 2
)"""


def _km_chain() -> str:
    parts = [
        f"""
WITH e AS MATERIALIZED (
  SELECT vec_id, label,
         list_transform(embedding, v -> {_MICRO}) AS xm
  FROM embeddings
),
x AS MATERIALIZED (
  SELECT vec_id, p.pos, xm[p.pos + 1] AS v
  FROM e CROSS JOIN (SELECT unnest(generate_series(0, {_DIM - 1})) AS pos) p
),
c0 AS MATERIALIZED (
  SELECT s.j, x.pos, x.v AS c
  FROM (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS j
        FROM e ORDER BY vec_id LIMIT {_K}) s
  JOIN x USING (vec_id)
)"""
    ]
    for it in range(1, _ITERS + 1):
        parts.append(_o_assign(f"a{it}", f"c{it - 1}"))
        if it < _ITERS:
            parts.append(_o_update(f"c{it}", f"a{it}"))
    return ",".join(parts)


_FINAL = f"a{_ITERS}"


@register(
    "ext_kmeans",
    oracle=_km_chain()
    + f"""
SELECT cl AS cluster, CAST(count(*) AS BIGINT) AS n_vecs, CAST(sum(d) AS BIGINT) AS ssd
FROM {_FINAL} GROUP BY 1 ORDER BY 1
""",
)
def ext_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-MEANS cluster report: per-cluster size and exact integer SSD
    (micro²-unit inertia) after {iters} Lloyd iterations, k={k}."""
    asg = _lloyd(spark, sf_dir)
    return (
        asg.groupBy(F.col("cl").alias("cluster"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("d").cast("long").alias("ssd"),
        )
        .orderBy("cluster")
    )


@register(
    "ext_kmeans_purity",
    oracle=_km_chain()
    + f"""
, cnt AS (
  SELECT a.cl, e.label, CAST(count(*) AS BIGINT) AS n
  FROM {_FINAL} a JOIN e USING (vec_id) GROUP BY 1, 2
)
SELECT cl AS cluster, CAST(sum(n) AS BIGINT) AS n_vecs,
       (min(struct_pack(nc := -n, l := label))).l AS top_label,
       CAST(-(min(struct_pack(nc := -n, l := label))).nc AS BIGINT) AS top_n,
       floor(CAST(-(min(struct_pack(nc := -n, l := label))).nc AS DOUBLE)
             / sum(n) * 1000000 + 0.5) / 1000000.0 AS purity
FROM cnt GROUP BY 1 ORDER BY 1
""",
)
def ext_kmeans_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER PURITY vs the ground-truth ``label`` column: majority
    label, its count, and purity share per cluster — the standard
    external-validation readout for an unsupervised partition (did the
    clustering recover the labeled structure?).  One count aggregate on
    the assignment, argmax via the same lexicographic struct-min
    ((-count, label) → largest count, smallest label on ties)."""
    asg = _lloyd(spark, sf_dir)
    cnt = asg.groupBy("cl", "label").agg(F.count(F.lit(1)).cast("long").alias("n"))
    m = F.min(F.struct((-F.col("n")).alias("nc"), F.col("label").alias("l")))
    return (
        cnt.groupBy(F.col("cl").alias("cluster"))
        .agg(
            F.sum("n").cast("long").alias("n_vecs"),
            m.getField("l").alias("top_label"),
            (-m.getField("nc")).cast("long").alias("top_n"),
            (
                F.floor(
                    (-m.getField("nc")).cast("double") / F.sum("n") * 1000000 + 0.5
                )
                / 1000000.0
            ).alias("purity"),
        )
        .orderBy("cluster")
    )


@register(
    "ext_kmeans_balanced_sample",
    oracle=_km_chain()
    + f"""
SELECT cl AS cluster, vec_id
FROM (SELECT cl, vec_id, row_number() OVER (PARTITION BY cl ORDER BY vec_id) AS rk
      FROM {_FINAL})
WHERE rk <= {_SAMPLE_PER_CLUSTER}
ORDER BY cluster, vec_id
""",
)
def ext_kmeans_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER-BALANCED SAMPLE: {m} vectors per k-means cluster — the
    diversity-preserving curation draw (uniform sampling over-represents
    dense modes; per-cluster quotas cover the embedding space).  The
    rank<=m predicate plans as WindowGroupLimit on both sides of the
    cluster exchange, so a hot cluster clips to m rows per input
    partition before anything ships (the ext_domain_volume_cap shape)."""
    asg = _lloyd(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("cl").orderBy("vec_id")
    return (
        asg.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _SAMPLE_PER_CLUSTER)
        .select(F.col("cl").alias("cluster"), "vec_id")
        .orderBy("cluster", "vec_id")
    )


ext_kmeans.__doc__ = ext_kmeans.__doc__.format(iters=_ITERS, k=_K)
ext_kmeans_balanced_sample.__doc__ = ext_kmeans_balanced_sample.__doc__.format(
    m=_SAMPLE_PER_CLUSTER
)


@register(
    "ext_kmeans_ari",
    oracle=_km_chain()
    + f"""
, ct AS (
  SELECT a.cl, e.label, CAST(count(*) AS BIGINT) AS nij
  FROM {_FINAL} a JOIN e USING (vec_id) GROUP BY 1, 2
),
m AS (
  SELECT CAST(sum(nij * (nij - 1) // 2) AS BIGINT) AS s,
         CAST(sum(nij) AS BIGINT) AS n
  FROM ct
),
ra AS (
  SELECT CAST(sum(ai * (ai - 1) // 2) AS BIGINT) AS a FROM (
    SELECT CAST(sum(nij) AS BIGINT) AS ai FROM ct GROUP BY cl)
),
rb AS (
  SELECT CAST(sum(bj * (bj - 1) // 2) AS BIGINT) AS b FROM (
    SELECT CAST(sum(nij) AS BIGINT) AS bj FROM ct GROUP BY label)
)
SELECT m.n,
       floor((CAST(m.s AS DOUBLE)
              - CAST(ra.a AS DOUBLE) * rb.b / (m.n * (m.n - 1) // 2))
             / ((CAST(ra.a AS DOUBLE) + rb.b) / 2.0
                - CAST(ra.a AS DOUBLE) * rb.b / (m.n * (m.n - 1) // 2))
             * 1000000 + 0.5) / 1000000.0 AS ari
FROM m, ra, rb
""",
)
def ext_kmeans_ari(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADJUSTED RAND INDEX of the k-means partition vs the ground-truth
    labels (Hubert & Arabie 1985) — the chance-corrected agreement
    score that completes the external-validation pair with
    ``ext_kmeans_purity`` (purity rewards many tiny clusters; ARI does
    not).  Every ingredient is an exact integer pair count — Σ C(n_ij,2)
    over the contingency table, Σ C(a_i,2), Σ C(b_j,2), C(n,2) — via
    integer ``div`` (n·(n−1) is even, so the halving is exact in both
    engines); the ARI ratio is ONE double expression evaluated in the
    same op order.  Contingency table = one groupBy on the assignment;
    everything after is |k|·|labels| rows."""
    asg = _lloyd(spark, sf_dir)
    ct = asg.groupBy("cl", "label").agg(F.count(F.lit(1)).cast("long").alias("nij"))
    pairs = lambda c: F.expr(f"({c} * ({c} - 1)) div 2")  # noqa: E731
    m = ct.agg(
        F.sum(pairs("nij")).cast("long").alias("s"),
        F.sum("nij").cast("long").alias("n"),
    )
    ra = (
        ct.groupBy("cl")
        .agg(F.sum("nij").cast("long").alias("ai"))
        .agg(F.sum(pairs("ai")).cast("long").alias("a"))
    )
    rb = (
        ct.groupBy("label")
        .agg(F.sum("nij").cast("long").alias("bj"))
        .agg(F.sum(pairs("bj")).cast("long").alias("b"))
    )
    j = m.crossJoin(F.broadcast(ra)).crossJoin(F.broadcast(rb))
    t = F.expr("(n * (n - 1)) div 2")
    exp = F.col("a").cast("double") * F.col("b") / t
    ari = (F.col("s").cast("double") - exp) / (
        (F.col("a").cast("double") + F.col("b")) / 2.0 - exp
    )
    return j.select(
        "n", (F.floor(ari * 1000000 + 0.5) / 1000000.0).alias("ari")
    )


_SCORE_BATCHES = 3  # micro-batches in the scoring drain


@register(
    "stream_kmeans_score",
    oracle=_km_chain()
    + f"""
SELECT CAST(vec_id % {_SCORE_BATCHES} AS BIGINT) AS batch_id,
       cl AS cluster, CAST(count(*) AS BIGINT) AS n_vecs
FROM {_FINAL} GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def stream_kmeans_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODEL-IN-STREAM SCORING: the batch-trained k-means model scores
    arriving embedding micro-batches inside ``foreachBatch`` — the
    standard online-serving split (train offline, hold the k·d model as
    driver state, score each tick as a pure projection).  Because the
    model is FROZEN and the batches are deterministic (vec_id % {b}
    staged files), the whole streaming run has an exact SQL oracle: the
    per-batch cluster census must equal the batch-mode final assignment
    grouped by batch — streaming the corpus through the model changes
    NOTHING about the answer, which is precisely the property worth
    pinning.

    Per tick: one assignment projection (integer HOF folds over
    centroid literals — no shuffle) + one k-row count collect; the
    drain is availableNow with maxFilesPerTrigger=1."""
    import glob as _glob
    import os
    import shutil
    import tempfile

    cents = _lloyd_model(spark, sf_dir)

    staging = os.path.join(
        tempfile.gettempdir(), f"sdis_staging_kmscore_{os.getpid()}"
    )
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)
    emb = table(spark, sf_dir, "embeddings")
    tmp = staging + "_tmp"
    base = int(os.path.getmtime(staging))
    for i in range(_SCORE_BATCHES):
        (
            emb.filter(F.pmod("vec_id", F.lit(_SCORE_BATCHES)) == i)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dest = os.path.join(staging, f"{i:05d}.parquet")
        os.replace(part, dest)
        os.utime(dest, (base + 10 * i, base + 10 * i))
    shutil.rmtree(tmp, ignore_errors=True)

    schema = spark.read.parquet(staging).schema
    out: list[tuple[int, int, int]] = []

    def score(df: DataFrame, batch_id: int) -> None:
        q = df.select(
            F.expr(f"transform(embedding, v -> {_MICRO})").alias("xm")
        )
        m = _assign_expr(cents)
        rows = (
            q.select(m.getField("j").alias("cl"))
            .groupBy("cl")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .collect()
        )
        for r in rows:
            out.append((batch_id, r.cl, r.n))

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
        .writeStream.foreachBatch(score)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(staging, "_checkpoint"))
        .start()
    )
    q.awaitTermination(120)
    shutil.rmtree(staging, ignore_errors=True)
    return (
        spark.createDataFrame(
            sorted(out), "batch_id long, cluster int, n_vecs long"
        )
        .orderBy("batch_id", "cluster")
    )


_KEYWORDS_PER_CLUSTER = 3


@register(
    "ext_cluster_keywords",
    oracle=_km_chain()
    + f"""
, dt AS MATERIALIZED (
  SELECT doc_id, unnest(list_distinct(str_split(text, ' '))) AS tok
  FROM documents
),
ct AS (
  SELECT a.cl, dt.tok, CAST(count(*) AS BIGINT) AS n_ct
  FROM {_FINAL} a JOIN dt ON dt.doc_id = a.vec_id GROUP BY 1, 2
),
cm AS (SELECT cl, CAST(count(*) AS BIGINT) AS n_c FROM {_FINAL} GROUP BY 1),
tm AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_t FROM dt GROUP BY 1),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM {_FINAL}),
scored AS (
  SELECT ct.cl, ct.tok, ct.n_ct,
         floor(CAST(ct.n_ct AS DOUBLE) * nn.n / (cm.n_c * tm.n_t)
               * 1000000 + 0.5) / 1000000.0 AS lift
  FROM ct JOIN cm USING (cl) JOIN tm USING (tok) CROSS JOIN nn
)
SELECT cl AS cluster, tok, n_ct, lift
FROM (SELECT *, row_number() OVER (PARTITION BY cl
                                   ORDER BY lift DESC, tok) AS rk
      FROM scored)
WHERE rk <= {_KEYWORDS_PER_CLUSTER}
ORDER BY cluster, lift DESC, tok
""",
)
def ext_cluster_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER LABELING: the {kw} most DISTINCTIVE tokens per k-means
    cluster by lift — P(token | cluster) / P(token) — the "what IS this
    cluster" step that turns an opaque partition into a browsable corpus
    map (the SemDeDup/Gopher-style curation loop reads exactly this
    report before deciding which clusters to prune or upsample).

    Composes the k-means assignment (vec_id == doc_id in this corpus)
    with one doc-distinct token explode: counts are one shuffle at the
    (cluster, token) grain, marginals are two smaller aggregates of the
    SAME exploded frame, lift is exact-integer cross-multiplication with
    ONE division, top-{kw} per cluster is a WindowGroupLimit."""
    asg = _lloyd(spark, sf_dir).select(F.col("vec_id").alias("doc_id"), "cl")
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    dt = docs.join(asg, "doc_id")
    ct = dt.groupBy("cl", "tok").agg(F.count(F.lit(1)).cast("long").alias("n_ct"))
    cm = asg.groupBy("cl").agg(F.count(F.lit(1)).cast("long").alias("n_c"))
    tm = docs.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("n_t"))
    nn = asg.agg(F.count(F.lit(1)).cast("long").alias("n"))
    scored = (
        ct.join(cm, "cl")
        .join(tm, "tok")
        .crossJoin(F.broadcast(nn))
        .select(
            "cl",
            "tok",
            "n_ct",
            (
                F.floor(
                    F.col("n_ct").cast("double")
                    * F.col("n")
                    / (F.col("n_c") * F.col("n_t"))
                    * 1000000
                    + 0.5
                )
                / 1000000.0
            ).alias("lift"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cl").orderBy(F.desc("lift"), "tok")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _KEYWORDS_PER_CLUSTER)
        .select(F.col("cl").alias("cluster"), "tok", "n_ct", "lift")
        .orderBy("cluster", F.desc("lift"), "tok")
    )


ext_cluster_keywords.__doc__ = ext_cluster_keywords.__doc__.format(
    kw=_KEYWORDS_PER_CLUSTER
)


_SPLIT_TEST_PCT = 20  # held-out share per cluster, percent


@register(
    "ext_cluster_stratified_split",
    oracle=_km_chain()
    + f"""
SELECT cl AS cluster, split, CAST(count(*) AS BIGINT) AS n_vecs
FROM (
  SELECT cl,
         CASE WHEN CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))
                   AS BIGINT) % 100 < {_SPLIT_TEST_PCT}
              THEN 'test' ELSE 'train' END AS split
  FROM {_FINAL}
) GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def ext_cluster_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER-STRATIFIED train/test split: the {p}% holdout drawn
    INSIDE each k-means cluster by deterministic hash, so the test set
    covers every semantic mode — a uniform split under-samples small
    clusters and the eval silently stops measuring them
    (``ext_stratified_split`` stratifies on a LABEL column; this is the
    unsupervised version for unlabeled corpora, the split SemDeDup-style
    curation feeds).  Census output; the hash-gate is the shared md5
    recipe so membership is engine-reproducible row by row, not just
    in aggregate."""
    asg = _lloyd(spark, sf_dir)
    gate = (
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    return (
        asg.select(
            F.col("cl").alias("cluster"),
            F.when(gate < _SPLIT_TEST_PCT, "test").otherwise("train").alias("split"),
        )
        .groupBy("cluster", "split")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))
        .orderBy("cluster", "split")
    )


ext_cluster_stratified_split.__doc__ = ext_cluster_stratified_split.__doc__.format(
    p=_SPLIT_TEST_PCT
)
