"""Embedding-space label statistics — centroids, mislabel screening, and
label-confusion geometry over the ``embeddings`` table.

The production uses: per-label CENTROIDS are the free by-product every
vector pipeline materializes (seed vectors for IVF training, class
prototypes for nearest-centroid labeling); distance-to-own-centroid is
the standard MISLABEL/outlier screen run before a labeled set is trusted;
and the label×label centroid-cosine matrix is the confusion-geometry map
that says which classes an embedding model cannot separate.

Cross-engine float discipline (this module's whole game):

- Raw per-dim MEANS are aggregation-order-dependent doubles, so vectors
  are first quantized to exact integer MICRO-UNITS (round(v·1e6) — the
  ``ext_embedding_quantize`` posture): dimension sums become exact longs,
  and the centroid's micro value ``floor(sum/n + 0.5)`` is an exact
  integer both engines derive identically.
- Every multi-term double sum (distance², dot products, norms) folds
  SEQUENTIALLY over the dimension order (Spark ``aggregate`` HOF ==
  DuckDB ``list_reduce``, both left folds — the ext_kl_divergence
  recipe), so results are bit-identical and fully SQL-oracled.

Scale shape: one posexplode pass to the (label, pos) grain (|labels|×64
rows out), everything after is centroid-sized; the outlier screen joins
the 64-row-per-label centroid back as a broadcast and folds per vector —
no pairwise stage anywhere.

Reference analog: none; [EXT] mandate territory like llm/simsearch.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_EMB_DIM = 64  # driver corpus embedding dimensionality (all SFs)
_OUTLIER_TOP_K = 5  # farthest-from-centroid vectors reported per label

# Shared oracle CTE: per-(label, pos) exact integer micro-unit sums and
# the rounded centroid micro value.  DuckDB arrays are 1-indexed.
_CENTROID_CTE = f"""
pv AS (
  SELECT vec_id, label, g.i AS pos,
         CAST(round(CAST(embedding[g.i + 1] AS DOUBLE) * 1000000) AS BIGINT) AS q,
         CAST(embedding[g.i + 1] AS DOUBLE) AS v
  FROM embeddings, (SELECT unnest(generate_series(0, {_EMB_DIM - 1})) AS i) g
), cent AS (
  SELECT label, pos,
         CAST(count(*) AS BIGINT) AS n,
         CAST(floor(CAST(sum(q) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS c_micro
  FROM pv GROUP BY 1, 2
)"""


def _pv(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", "label", F.posexplode(F.col("embedding").cast("array<double>"))
    ).select(
        "vec_id",
        "label",
        F.col("pos").cast("long").alias("pos"),
        F.round(F.col("col") * 1000000).cast("long").alias("q"),
        F.col("col").alias("v"),
    )


def _centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(label, pos, n, c_micro): exact integer micro-unit centroid."""
    return _pv(spark, sf_dir).groupBy("label", "pos").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.floor(F.sum("q").cast("double") / F.count(F.lit(1)) + 0.5)
        .cast("long")
        .alias("c_micro"),
    )


def _fold_by_pos(term, acc_init=0.0):
    """Sequential left fold of ``term`` over pos order (collected per
    group) — the cross-engine deterministic sum."""
    return F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("pos"), term.alias("t")))),
            lambda s: s.getField("t"),
        ),
        F.lit(acc_init),
        lambda acc, x: acc + x,
    )


@register(
    "ext_embedding_centroids",
    oracle=f"""
WITH {_CENTROID_CTE}
SELECT label, CAST(max(n) AS BIGINT) AS n,
       array_to_string(list(CAST(c_micro AS VARCHAR) ORDER BY pos), ',')
         AS centroid_micro
FROM cent GROUP BY label
""",
)
def ext_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label CLASS CENTROIDS in exact integer micro-units — the
    class prototypes (serialized, scalar-column output per the driver
    contract; consumers split/cast back to vectors).  See the module
    docstring for the quantize-then-sum determinism argument."""
    cent = _centroids(spark, sf_dir)
    return cent.groupBy("label").agg(
        F.max("n").cast("long").alias("n"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c_micro"))),
                lambda s: s.getField("c_micro").cast("string"),
            ),
            ",",
        ).alias("centroid_micro"),
    )


@register(
    "ext_embedding_outliers",
    oracle=f"""
WITH {_CENTROID_CTE},
terms AS (
  SELECT pv.vec_id, pv.label, pv.pos,
         (pv.v - CAST(cent.c_micro AS DOUBLE) / 1000000.0)
         * (pv.v - CAST(cent.c_micro AS DOUBLE) / 1000000.0) AS t
  FROM pv JOIN cent ON pv.label = cent.label AND pv.pos = cent.pos
), d AS (
  SELECT vec_id, label,
         sqrt(list_reduce(list_prepend(0.0, list(t ORDER BY pos)),
                          (acc, x) -> acc + x)) AS dist
  FROM terms GROUP BY 1, 2
), ranked AS (
  SELECT label, vec_id,
         floor(dist * 1000000 + 0.5) / 1000000.0 AS dist,
         row_number() OVER (
           PARTITION BY label
           ORDER BY floor(dist * 1000000 + 0.5) / 1000000.0 DESC, vec_id
         ) AS rn
  FROM d
)
SELECT label, vec_id, dist FROM ranked WHERE rn <= {_OUTLIER_TOP_K}
""",
)
def ext_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MISLABEL SCREEN: the top-{k} vectors FARTHEST (L2) from their own
    label's centroid, per label — the standard "audit these first"
    list for a labeled embedding set (its set-level sibling is
    ``ext_embedding_norms``' global norm screen; this one is
    class-conditional).

    The distance² folds sequentially over the dimension order against
    the exact micro-unit centroid (both engines derive the identical
    double from the identical integer), so the ranking — rounded dist
    desc, vec_id tiebreak — is engine-identical and fully oracled.
    Scale: centroids broadcast (|labels|×{dim} rows); one fold pass per
    vector; top-k per label is a window over the label partition."""
    cent = _centroids(spark, sf_dir)
    terms = (
        _pv(spark, sf_dir)
        .join(F.broadcast(cent), ["label", "pos"])
        .select(
            "vec_id",
            "label",
            "pos",
            (
                (F.col("v") - F.col("c_micro").cast("double") / 1000000.0)
                * (F.col("v") - F.col("c_micro").cast("double") / 1000000.0)
            ).alias("t"),
        )
    )
    d = terms.groupBy("vec_id", "label").agg(
        F.sqrt(_fold_by_pos(F.col("t"))).alias("dist_raw")
    )
    ranked = d.select(
        "label",
        "vec_id",
        (F.floor(F.col("dist_raw") * 1000000 + 0.5) / 1000000.0).alias("dist"),
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("label").orderBy(F.desc("dist"), F.asc("vec_id"))
        ),
    )
    return ranked.filter(F.col("rn") <= _OUTLIER_TOP_K).select(
        "label", "vec_id", "dist"
    )


ext_embedding_outliers.__doc__ = ext_embedding_outliers.__doc__.format(
    k=_OUTLIER_TOP_K, dim=_EMB_DIM
)


@register(
    "ext_label_centroid_sim",
    oracle=f"""
WITH {_CENTROID_CTE},
cv AS (
  SELECT label, pos, CAST(c_micro AS DOUBLE) / 1000000.0 AS c FROM cent
), nrm AS (
  SELECT label,
         sqrt(list_reduce(list_prepend(0.0, list(c * c ORDER BY pos)),
                          (acc, x) -> acc + x)) AS l2
  FROM cv GROUP BY 1
), dots AS (
  SELECT a.label AS label_a, b.label AS label_b,
         list_reduce(list_prepend(0.0, list(a.c * b.c ORDER BY a.pos)),
                     (acc, x) -> acc + x) AS dot
  FROM cv a JOIN cv b ON a.pos = b.pos AND a.label < b.label
  GROUP BY 1, 2
)
SELECT label_a, label_b,
       floor((dot / (na.l2 * nb.l2)) * 1000000 + 0.5) / 1000000.0 AS cos_sim
FROM dots
JOIN nrm na ON na.label = dots.label_a
JOIN nrm nb ON nb.label = dots.label_b
""",
)
def ext_label_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LABEL CONFUSION GEOMETRY: the cosine between every pair of label
    centroids — near-parallel centroids mark classes the embedding
    model cannot separate (the geometric early warning before a
    nearest-centroid or kNN labeler is trusted; ``ext_semdedup_prune``
    uses the same centroid geometry for pruning).

    All |labels|²/2 pairs over |labels|×{dim} centroid rows — a
    bounded frame by construction, never the corpus; dot products and
    norms fold sequentially by dimension (deterministic), cosine is
    one double expression."""
    cv = _centroids(spark, sf_dir).select(
        "label", "pos", (F.col("c_micro").cast("double") / 1000000.0).alias("c")
    )
    nrm = cv.groupBy("label").agg(
        F.sqrt(_fold_by_pos(F.col("c") * F.col("c"))).alias("l2")
    )
    a = cv.select(F.col("label").alias("label_a"), "pos", F.col("c").alias("ca"))
    b = cv.select(F.col("label").alias("label_b"), "pos", F.col("c").alias("cb"))
    dots = (
        a.join(b, "pos")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(_fold_by_pos(F.col("ca") * F.col("cb")).alias("dot"))
    )
    na = nrm.select(F.col("label").alias("label_a"), F.col("l2").alias("na"))
    nb = nrm.select(F.col("label").alias("label_b"), F.col("l2").alias("nb"))
    return (
        dots.join(F.broadcast(na), "label_a")
        .join(F.broadcast(nb), "label_b")
        .select(
            "label_a",
            "label_b",
            (
                F.floor((F.col("dot") / (F.col("na") * F.col("nb"))) * 1000000 + 0.5)
                / 1000000.0
            ).alias("cos_sim"),
        )
    )


ext_label_centroid_sim.__doc__ = ext_label_centroid_sim.__doc__.format(dim=_EMB_DIM)


_PCA_COMPONENTS = 2


@register("ext_embedding_pca")  # driver-side eigen on the exact Gram → rows-only
def ext_embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA of the embedding cloud, Spark-first: the top-{k}
    principal coordinates per vector — THE inspection projection every
    embedding QA notebook draws, and the whitening/compression basis
    (``ext_embedding_quantize`` compresses per-dim ranges; PCA rotates
    into the variance basis first).

    Shape — the classic one-pass Gram decomposition: ``mapInPandas``
    emits ONE partial per Arrow batch (count, Σq, and the {d}×{d} upper
    Gram Σqqᵀ as int64 on micro-quantized vectors — numpy GEMM per
    batch, exact integer arithmetic so partial-merge ORDER cannot
    perturb the spectrum); the driver merges #partitions bounded rows,
    eigendecomposes the {d}×{d} covariance (O(d³) on 64 dims — driver
    work independent of corpus size), fixes each eigenvector's sign by
    its largest-|loading| entry, and the projection pass broadcasts the
    {k}×{d} basis back through a second vectorized numpy pass.  At
    100 TB exactly two corpus scans, zero shuffles, driver state 4 KB.

    ROWS-ONLY BY DESIGN: eigendecomposition is not SQL-expressible — a
    DuckDB oracle would be numpy checking itself.  Pinned instead by
    exact parity vs an independent single-machine PCA (same quantized
    Gram → identical spectrum) and basis-invariant properties
    (orthonormality, variance ordering) in tests/test_components.py."""
    import numpy as np
    import pandas as pd

    emb = table(spark, sf_dir, "embeddings")

    def gram_partials(batches):
        for pdf in batches:
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            q = np.rint(m * 1e6).astype(np.int64)
            g = q.T @ q  # exact: |q| <= ~3e5, 64 dims, int64 headroom
            yield pd.DataFrame(
                {
                    "n": [len(q)],
                    "s": [q.sum(axis=0).tolist()],
                    "g": [g.reshape(-1).tolist()],
                }
            )

    parts = (
        emb.select("embedding")
        .mapInPandas(gram_partials, "n long, s array<long>, g array<long>")
        .collect()
    )  # bounded: one row per Arrow batch
    n = sum(r.n for r in parts)
    dim = len(parts[0].s)
    s = np.zeros(dim, dtype=object)
    g = np.zeros(dim * dim, dtype=object)
    for r in parts:  # python-int accumulation: exact at any scale
        s += np.array(r.s, dtype=object)
        g += np.array(r.g, dtype=object)
    s = s.astype(np.float64) / 1e6
    g = g.astype(np.float64).reshape(dim, dim) / 1e12
    mu = s / n
    cov = g / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:_PCA_COMPONENTS]
    comps = vecs[:, order].T  # (k, d)
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:  # deterministic sign convention
            comps[i] = -comps[i]
    b_comps = comps.tolist()
    b_mu = mu.tolist()

    def project(batches):
        c = np.array(b_comps)
        m0 = np.array(b_mu)
        for pdf in batches:
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            pc = (m - m0) @ c.T
            out = {"vec_id": pdf["vec_id"], "label": pdf["label"]}
            for i in range(c.shape[0]):
                out[f"pc{i + 1}"] = np.floor(pc[:, i] * 1e6 + 0.5) / 1e6
            yield pd.DataFrame(out)

    schema = "vec_id long, label int, " + ", ".join(
        f"pc{i + 1} double" for i in range(_PCA_COMPONENTS)
    )
    return emb.select("vec_id", "label", "embedding").mapInPandas(project, schema)


ext_embedding_pca.__doc__ = ext_embedding_pca.__doc__.format(
    k=_PCA_COMPONENTS, d=_EMB_DIM
)


_MRL_DIMS = (8, 16, 32, 64)  # prefix-dim budgets; last = full dim
_MRL_QUERIES = 8
_MRL_K = 10


@register(
    "ext_matryoshka_recall",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < {_MRL_QUERIES}
), dims AS (
  SELECT unnest([{", ".join(str(d) for d in _MRL_DIMS)}]) AS d
), c AS (
  SELECT dims.d, q.qid, e.vec_id,
         round(list_cosine_similarity(
           CAST(e.embedding AS DOUBLE[])[1:dims.d], q.qv[1:dims.d]), 6) AS cs
  FROM embeddings e, q, dims WHERE e.vec_id <> q.qid
), topk AS (
  SELECT d, qid, vec_id FROM (
    SELECT d, qid, vec_id,
           row_number() OVER (PARTITION BY d, qid
                              ORDER BY cs DESC, vec_id) AS rk
    FROM c
  ) WHERE rk <= {_MRL_K}
), fullk AS (
  SELECT qid, vec_id FROM topk WHERE d = {_MRL_DIMS[-1]}
), nq AS (
  SELECT CAST(count(DISTINCT qid) AS BIGINT) AS nq FROM fullk
)
SELECT CAST(t.d AS BIGINT) AS dim,
       CAST(sum(CASE WHEN f.qid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS hits,
       floor(CAST(sum(CASE WHEN f.qid IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / (nq.nq * {_MRL_K}) * 1000000 + 0.5)
         / 1000000.0 AS recall_at_k
FROM topk t
LEFT JOIN fullk f ON t.qid = f.qid AND t.vec_id = f.vec_id
CROSS JOIN nq
GROUP BY t.d, nq.nq
ORDER BY dim
""",
)
def ext_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATRYOSHKA TRUNCATION-RECALL curve: for each prefix-dimension
    budget {dims}, the recall@{k} of cosine retrieval using only the
    first d dimensions against the full-dim top-{k} — the evaluation
    behind Matryoshka Representation Learning deployments (Kusupati
    2022: serve a truncated prefix when the index must shrink; this
    curve is the evidence for HOW MUCH you may truncate).  Completes
    the embedding-QA family: ``ext_embedding_pca`` asks where variance
    lives, this asks what truncation does to RETRIEVAL.

    Cosine re-normalizes per budget, so no re-scaling is needed; scores
    round to 6dp before ranking (the ext_sim_cosine recipe) and the
    per-(budget, query) rank <= {k} plans as WindowGroupLimit over ONE
    broadcast-query scored scan (the corpus is read once; budgets and
    queries are a {nd}x{m}-way broadcast multiplier, never a reshuffle).
    The full-dim row doubles as the sanity anchor (recall 1.0)."""
    from .simsearch import cosine

    emb = table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    q = emb.filter(F.col("vec_id") < _MRL_QUERIES).select(
        F.col("vec_id").alias("qid"), vec.alias("qv")
    )
    dims = spark.createDataFrame([(d,) for d in _MRL_DIMS], "d int")
    c = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .crossJoin(F.broadcast(dims))
        .select(
            "d",
            "qid",
            "vec_id",
            F.round(
                cosine(
                    F.slice(vec, 1, F.col("d")), F.slice(F.col("qv"), 1, F.col("d"))
                ),
                6,
            ).alias("cs"),
        )
    )
    w = Window.partitionBy("d", "qid").orderBy(F.desc("cs"), "vec_id")
    topk = c.select(
        "d", "qid", "vec_id", F.row_number().over(w).alias("rk")
    ).filter(F.col("rk") <= _MRL_K)
    fullk = topk.filter(F.col("d") == _MRL_DIMS[-1]).select(
        F.col("qid").alias("fqid"), F.col("vec_id").alias("fvid")
    )
    nq = fullk.agg(F.countDistinct("fqid").cast("long").alias("nq"))
    # LEFT join: a budget whose top-k shares NOTHING with the full-dim
    # top-k must report recall 0, not silently drop its row (found live
    # at twin-sf1, where the 8-dim prefix of 20k gaussians misses the
    # full top-10 entirely).
    hits = (
        topk.join(
            fullk,
            (F.col("qid") == F.col("fqid")) & (F.col("vec_id") == F.col("fvid")),
            "left",
        )
        .groupBy("d")
        .agg(
            F.sum(F.when(F.col("fqid").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("hits")
        )
        .crossJoin(F.broadcast(nq))
    )
    return hits.select(
        F.col("d").cast("long").alias("dim"),
        "hits",
        (
            F.floor(F.col("hits").cast("double") / (F.col("nq") * _MRL_K) * 1000000 + 0.5)
            / 1000000.0
        ).alias("recall_at_k"),
    ).orderBy("dim")


ext_matryoshka_recall.__doc__ = ext_matryoshka_recall.__doc__.format(
    dims=_MRL_DIMS, k=_MRL_K, nd=len(_MRL_DIMS), m=_MRL_QUERIES
)


@register(
    "ext_embedding_whitening",
    oracle=f"""
WITH {_CENTROID_CTE},
dm AS (
  SELECT pos, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(q) AS BIGINT) AS sq,
         CAST(sum(q * q) AS BIGINT) AS sqq,
         CAST(min(q) AS BIGINT) AS qmin,
         CAST(max(q) AS BIGINT) AS qmax
  FROM pv GROUP BY 1
),
st AS (
  SELECT pos, n, sq, qmin, qmax,
         sqrt((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq / n) / (n - 1))
           AS sd_micro
  FROM dm
)
SELECT pos, n,
       floor((CAST(sq AS DOUBLE) / n) / 1000000.0 * 1000000 + 0.5) / 1000000.0
         AS mean,
       floor(sd_micro / 1000000.0 * 1000000 + 0.5) / 1000000.0 AS std,
       floor((CAST(qmin AS DOUBLE) - CAST(sq AS DOUBLE) / n) / sd_micro
             * 1000000 + 0.5) / 1000000.0 AS w_min,
       floor((CAST(qmax AS DOUBLE) - CAST(sq AS DOUBLE) / n) / sd_micro
             * 1000000 + 0.5) / 1000000.0 AS w_max
FROM st
ORDER BY pos
""",
)
def ext_embedding_whitening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-DIMENSION WHITENING REPORT (mean/std + standardized
    extremes): the fit step of embedding whitening — the per-dim
    affine parameters that center and unit-scale the space — plus the
    whitened min/max per dimension, the instant screen for dead
    dimensions (std ~ 0) and spike dimensions (|w| >> 4) that break
    cosine geometry and PQ codebooks downstream.

    Dimension moments are EXACT int64 over the micro-unit grid (sum q^2
    <= ~2e18 at 2M vectors — documented bound), so mean/std/extremes
    are pinned double closed forms both engines derive identically; no
    fold is needed anywhere.  Scale: one posexplode pass to the 64-row
    dimension grain; the report is dimension-sized."""
    dm = _pv(spark, sf_dir).groupBy("pos").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("q").cast("long").alias("sq"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("sqq"),
        F.min("q").cast("long").alias("qmin"),
        F.max("q").cast("long").alias("qmax"),
    )
    n = F.col("n")
    sd_micro = F.sqrt(
        (F.col("sqq").cast("double") - F.col("sq").cast("double") * F.col("sq") / n)
        / (n - 1)
    )
    st = dm.select("pos", "n", "sq", "qmin", "qmax", sd_micro.alias("sd_micro"))
    mean_micro = F.col("sq").cast("double") / F.col("n")
    r6 = lambda c: F.floor(c * 1000000 + 0.5) / 1000000.0  # noqa: E731
    return st.select(
        "pos",
        "n",
        r6(mean_micro / 1000000.0).alias("mean"),
        r6(F.col("sd_micro") / 1000000.0).alias("std"),
        r6((F.col("qmin").cast("double") - mean_micro) / F.col("sd_micro")).alias(
            "w_min"
        ),
        r6((F.col("qmax").cast("double") - mean_micro) / F.col("sd_micro")).alias(
            "w_max"
        ),
    ).orderBy("pos")


@register(
    "ext_embedding_isotropy",
    oracle=f"""
WITH {_CENTROID_CTE},
nr AS (
  SELECT vec_id,
         sqrt(list_reduce(list_prepend(0.0, list(v * v ORDER BY pos)),
                          (acc, x) -> acc + x)) AS nrm
  FROM pv GROUP BY vec_id
),
uq AS (
  SELECT pv.vec_id, pv.pos,
         CAST(round(pv.v / nr.nrm * 1000000) AS BIGINT) AS u
  FROM pv JOIN nr USING (vec_id)
),
ds AS (SELECT pos, CAST(sum(u) AS BIGINT) AS s FROM uq GROUP BY 1),
ss AS (
  SELECT list_reduce(list_prepend(0.0, list(CAST(s AS DOUBLE) * s ORDER BY pos)),
                     (acc, x) -> acc + x) AS ss2
  FROM ds
),
r2 AS (SELECT CAST(sum(u * u) AS BIGINT) AS r2,
              CAST(count(DISTINCT vec_id) AS BIGINT) AS n
       FROM uq)
SELECT n, CAST({_EMB_DIM} AS BIGINT) AS dim,
       floor(((ss2 - r2) / (CAST(n AS DOUBLE) * (n - 1))) / 1000000000000.0
             * 1000000 + 0.5) / 1000000.0 AS avg_pairwise_cos,
       floor(sqrt(ss2) / n / 1000000.0 * 1000000 + 0.5) / 1000000.0
         AS resultant_norm
FROM ss, r2
""",
)
def ext_embedding_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMBEDDING-SPACE ISOTROPY: the average pairwise cosine between
    all n(n-1) normalized vectors and the mean-resultant-length — the
    two standard "is this embedding space collapsed?" numbers (an
    isotropic space has avg-cos ~ 0; anisotropic/cone-shaped spaces,
    the classic contextual-embedding pathology, sit far above).

    NO pairwise stage: avg_cos = (||sum u||^2 - sum ||u||^2) / n(n-1),
    the resultant-vector identity, so one pass computes what a naive
    plan would need n^2 dot products for — the 100 TB shape.  Unit
    vectors are quantized to exact micro-ints after a per-vector
    dimension-ordered norm fold (both engines derive the identical
    double, the module's centroid discipline); per-dim resultant sums
    are then EXACT int64, and the two reported numbers are pinned
    double algebra (sum u^2 ~ 1e12/vector -> ~2e18 at 2M vectors;
    S_pos^2 crosses int64 so it folds as double in pos order)."""
    pv = _pv(spark, sf_dir)
    nr = pv.groupBy("vec_id").agg(
        F.sqrt(_fold_by_pos(F.col("v") * F.col("v"))).alias("nrm")
    )
    uq = pv.join(nr, "vec_id").select(
        "vec_id",
        "pos",
        F.round(F.col("v") / F.col("nrm") * 1000000).cast("long").alias("u"),
    )
    ds = uq.groupBy("pos").agg(F.sum("u").cast("long").alias("s"))
    ss = ds.agg(
        _fold_by_pos(F.col("s").cast("double") * F.col("s")).alias("ss2")
    )
    r2 = uq.agg(
        F.sum(F.col("u") * F.col("u")).cast("long").alias("r2"),
        F.countDistinct("vec_id").cast("long").alias("n"),
    )
    st = ss.crossJoin(F.broadcast(r2))
    n = F.col("n")
    r6 = lambda c: F.floor(c * 1000000 + 0.5) / 1000000.0  # noqa: E731
    return st.select(
        "n",
        F.lit(_EMB_DIM).cast("long").alias("dim"),
        r6(
            ((F.col("ss2") - F.col("r2")) / (n.cast("double") * (n - 1)))
            / 1000000000000.0
        ).alias("avg_pairwise_cos"),
        r6(F.sqrt(F.col("ss2")) / n / 1000000.0).alias("resultant_norm"),
    )


_HAMMING_TOP_K = 10


@register(
    "ext_sim_hamming",
    oracle=f"""
WITH {_CENTROID_CTE},
dm AS (
  SELECT pos, CAST(count(*) AS BIGINT) AS n, CAST(sum(q) AS BIGINT) AS sq
  FROM pv GROUP BY 1
),
bits AS (
  SELECT pv.vec_id, pv.label, pv.pos,
         CASE WHEN pv.q * dm.n > dm.sq THEN 1 ELSE 0 END AS b
  FROM pv JOIN dm USING (pos)
),
qid AS (SELECT CAST(min(vec_id) AS BIGINT) AS qv FROM pv),
qb AS (SELECT pos, b AS bq FROM bits, qid WHERE vec_id = qv),
hd AS (
  SELECT bits.vec_id, bits.label,
         CAST(sum(CASE WHEN bits.b <> qb.bq THEN 1 ELSE 0 END) AS BIGINT)
           AS hamming
  FROM bits JOIN qb USING (pos)
  GROUP BY 1, 2
)
SELECT vec_id, label, hamming
FROM hd, qid WHERE vec_id <> qv
ORDER BY hamming, vec_id
LIMIT {_HAMMING_TOP_K}
""",
)
def ext_sim_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIGN-BINARIZED HAMMING SEARCH: quantize every embedding to one
    BIT per dimension (above/below the per-dim corpus mean) and return
    the top-{k} nearest neighbors of the pinned query (min vec_id) by
    Hamming distance — the 64x-compression ANN pre-filter (binary
    quantization) that makes a 100 TB vector corpus scannable: 64 dims
    become one machine word, distance becomes popcount, and the
    rerank-with-float-cosine step only touches the shortlist.

    EVERYTHING is exact integer: the sign threshold compares q*n > sum(q)
    (no division), distances are bit-count sums, and the top-k orders by
    (hamming, vec_id) — a fully-oracled deterministic ANN variant,
    unlike the probabilistic LSH/IVF family.  Scale: bits are one
    posexplode + broadcast-join projection; the query row broadcasts;
    the shortlist is a {k}-row WindowGroupLimit-free ORDER BY LIMIT."""
    pv = _pv(spark, sf_dir)
    dm = pv.groupBy("pos").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("q").cast("long").alias("sq"),
    )
    bits = pv.join(F.broadcast(dm), "pos").select(
        "vec_id",
        "label",
        "pos",
        F.when(F.col("q") * F.col("n") > F.col("sq"), 1).otherwise(0).alias("b"),
    )
    qid = pv.agg(F.min("vec_id").cast("long").alias("qv"))
    qb = (
        bits.crossJoin(F.broadcast(qid))
        .filter(F.col("vec_id") == F.col("qv"))
        .select("pos", F.col("b").alias("bq"))
    )
    hd = (
        bits.join(F.broadcast(qb), "pos")
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.when(F.col("b") != F.col("bq"), 1).otherwise(0))
            .cast("long")
            .alias("hamming")
        )
    )
    return (
        hd.crossJoin(F.broadcast(qid))
        .filter(F.col("vec_id") != F.col("qv"))
        .orderBy("hamming", "vec_id")
        .limit(_HAMMING_TOP_K)
        .select("vec_id", "label", "hamming")
    )


ext_sim_hamming.__doc__ = ext_sim_hamming.__doc__.format(k=_HAMMING_TOP_K)


@register(
    "ext_embedding_effective_dim",
    oracle=f"""
WITH {_CENTROID_CTE},
dm AS (
  SELECT pos, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(q) AS BIGINT) AS sq,
         CAST(sum(q * q) AS BIGINT) AS sqq
  FROM pv GROUP BY 1
),
vr AS (
  SELECT pos,
         (CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq / n) / (n - 1) AS v
  FROM dm
),
tot AS (
  SELECT list_reduce(list_prepend(0.0, list(v ORDER BY pos)),
                     (a, b) -> a + b) AS sv,
         list_reduce(list_prepend(0.0, list(v * v ORDER BY pos)),
                     (a, b) -> a + b) AS sv2,
         CAST(count(*) AS BIGINT) AS dim
  FROM vr
),
ent AS (
  SELECT dim, sv, sv2,
         list_reduce(list_prepend(0.0, list(
             (v / sv) * ln(sv / v) ORDER BY pos)), (a, b) -> a + b) AS h
  FROM vr, tot GROUP BY dim, sv, sv2
)
SELECT dim,
       floor(exp(h) * 1000000 + 0.5) / 1000000.0 AS effective_dim,
       floor((sv * sv / sv2) * 1000000 + 0.5) / 1000000.0
         AS participation_ratio,
       floor(exp(h) / dim * 1000000 + 0.5) / 1000000.0 AS dim_utilization
FROM ent
""",
)
def ext_embedding_effective_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EFFECTIVE DIMENSIONALITY of the embedding space from its per-dim
    variance spectrum: exp(H(p)) with p = var_i / sum(var) (the
    entropy-based effective rank, diagonal form) and the participation
    ratio (sum var)^2 / sum(var^2) — the two "how many dimensions is
    this 64-dim space REALLY using" numbers that catch dimensional
    collapse (the contrastive-learning failure mode) before a retrieval
    index inherits it.  utilization = effective/nominal.

    Per-dim variances are pinned closed forms of the EXACT micro-int
    moments (the whitening discipline); the spectrum folds (sum, sum of
    squares, entropy) run in dimension order — 64 terms.  Scale: one
    posexplode combine; everything after is dimension-sized."""
    dm = _pv(spark, sf_dir).groupBy("pos").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("q").cast("long").alias("sq"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("sqq"),
    )
    vr = dm.select(
        "pos",
        (
            (F.col("sqq").cast("double") - F.col("sq").cast("double") * F.col("sq") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("v"),
    )
    tot = vr.agg(
        _fold_by_pos(F.col("v")).alias("sv"),
        _fold_by_pos(F.col("v") * F.col("v")).alias("sv2"),
        F.count(F.lit(1)).cast("long").alias("dim"),
    )
    ent = (
        vr.crossJoin(F.broadcast(tot))
        .groupBy("dim", "sv", "sv2")
        .agg(
            _fold_by_pos(
                (F.col("v") / F.col("sv")) * F.log(F.col("sv") / F.col("v"))
            ).alias("h")
        )
    )
    r6 = lambda c: F.floor(c * 1000000 + 0.5) / 1000000.0  # noqa: E731
    return ent.select(
        "dim",
        r6(F.exp(F.col("h"))).alias("effective_dim"),
        r6(F.col("sv") * F.col("sv") / F.col("sv2")).alias("participation_ratio"),
        r6(F.exp(F.col("h")) / F.col("dim")).alias("dim_utilization"),
    )
