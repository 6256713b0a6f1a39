"""Lexical retrieval scoring — the BM25 companion to the vector stack.

Production retrieval is hybrid: an ANN pass over embeddings
(``llm/simsearch.py``) fused with a lexical BM25 pass over the raw
tokens (Robertson & Zaragoza 2009, "The Probabilistic Relevance
Framework: BM25 and Beyond").  This module provides the lexical half
over the ``documents`` table.

Reference analog: none — the reference pipeline has no search surface;
this is [EXT] mandate territory like ``llm/simsearch.py``.

Scale shape: for a QUERY-DRIVEN scorer the fixed handful of query terms
lets per-document term frequencies be computed as a PROJECTION (array
filter per term — no tokenize-explode shuffle at all); the corpus
statistics BM25 needs (N, avgdl, per-term document frequencies) reduce
to ONE 1-row aggregate that broadcasts back (the house pattern — every
crossJoin in this package is a broadcast 1-row aggregate), and the
top-k is a TakeOrderedAndProject heap.  Net: scan → project → 1-row
agg broadcast → project → heap.  No shuffle touches the corpus, which
is exactly what makes a scoring pass viable at 100 TB; a general
inverted-index build (every term, every doc) is the write-side twin and
would shuffle (doc, term) pairs — that path exists as ``ext_tfidf``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_BM25_TERMS = ["spark", "merge", "window"]
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOP_K = 20

# k1*(1-b) and k1*b pre-folded so both engines evaluate the identical
# double expression in the identical order (the float-oracle recipe).
_K1P1 = _BM25_K1 + 1.0          # 2.2
_K1_1MB = _BM25_K1 * (1.0 - _BM25_B)   # 0.3
_K1_B = _BM25_K1 * _BM25_B      # 0.9


def _duck_contrib(i: int, t: str) -> str:
    return f"""
    CASE WHEN tf{i} > 0 THEN
      ln(1 + (n_docs - df{i} + 0.5) / (df{i} + 0.5))
      * ((tf{i} * {_K1P1}) / (tf{i} + ({_K1_1MB} + {_K1_B} * (CAST(dl AS DOUBLE) / avgdl))))
    ELSE 0.0 END"""


_DUCK_TFS = ",\n         ".join(
    f"CAST(len(list_filter(string_split(text, ' '), x -> x = '{t}')) AS BIGINT) AS tf{i}"
    for i, t in enumerate(_BM25_TERMS)
)


@register(
    "ext_bm25_search",
    oracle=f"""
WITH tf AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
         {_DUCK_TFS}
  FROM documents
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         avg(dl) AS avgdl,
         {", ".join(f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}" for i in range(len(_BM25_TERMS)))}
  FROM tf
)
SELECT doc_id,
       round({" + ".join(_duck_contrib(i, t) for i, t in enumerate(_BM25_TERMS))}, 6) AS bm25
FROM tf CROSS JOIN stats
WHERE {" + ".join(f"tf{i}" for i in range(len(_BM25_TERMS)))} > 0
ORDER BY round({" + ".join(_duck_contrib(i, t) for i, t in enumerate(_BM25_TERMS))}, 6) DESC,
         doc_id
LIMIT {_BM25_TOP_K}
""",
)
def ext_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k lexical search for a fixed query ({terms}) with
    k1={k1}, b={b} — Robertson/Zaragoza scoring with the standard
    ln(1 + (N-df+0.5)/(df+0.5)) idf.

    Per-document term frequencies are ARRAY-FILTER projections (the
    query is a handful of terms, so no tokenize-explode shuffle
    exists); N / avgdl / df fold into ONE 1-row aggregate broadcast
    back; the score is a plain double expression evaluated in the same
    operation order as the DuckDB oracle, so the rounded values
    hash-match exactly; top-k is TakeOrderedAndProject heaps."""
    scored = _bm25_scored(table(spark, sf_dir, "documents"))
    return scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(_BM25_TOP_K)


def _bm25_scored(docs: DataFrame) -> DataFrame:
    """The shared BM25 scorer frame (doc_id, bm25) over every document
    matching at least one query term — consumed by ``ext_bm25_search``
    (top-k heap) and ``ext_hybrid_rrf`` (rank fusion pool)."""
    toks = F.split("text", " ")

    def eq(term):
        # single-arg lambda factory: a two-parameter lambda would be
        # interpreted by F.filter as (element, index) and silently
        # compare against the position column
        return lambda x: x == F.lit(term)

    proj = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("dl"),
        *[
            F.size(F.filter(toks, eq(t))).cast("long").alias(f"tf{i}")
            for i, t in enumerate(_BM25_TERMS)
        ],
    )
    stats = proj.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0))
            .cast("long")
            .alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )

    def contrib(i: int):
        tf = F.col(f"tf{i}")
        idf = F.log(
            1 + (F.col("n_docs") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5)
        )
        norm = F.lit(_K1_1MB) + F.lit(_K1_B) * (
            F.col("dl").cast("double") / F.col("avgdl")
        )
        return F.when(
            tf > 0, idf * ((tf * F.lit(_K1P1)) / (tf + norm))
        ).otherwise(F.lit(0.0))

    return (
        proj.join(F.broadcast(stats))
        .filter(sum(F.col(f"tf{i}") for i in range(len(_BM25_TERMS))) > 0)
        .select(
            "doc_id",
            F.round(
                sum(contrib(i) for i in range(len(_BM25_TERMS))), 6
            ).alias("bm25"),
        )
    )


ext_bm25_search.__doc__ = ext_bm25_search.__doc__.format(
    terms=", ".join(_BM25_TERMS), k1=_BM25_K1, b=_BM25_B
)


_RRF_K = 60          # the standard RRF dampening constant (Cormack 2009)
_RRF_POOL = 50       # per-ranker candidate list depth
_RRF_TOP_K = 20      # fused results returned
_RRF_QUERY_VEC = 7   # the semantic query: embedding of doc 7

_RRF_DUCK_TFS = ",\n         ".join(
    f"CAST(len(list_filter(string_split(text, ' '), x -> x = '{t}')) AS BIGINT) AS tf{i}"
    for i, t in enumerate(_BM25_TERMS)
)


_RRF_ORACLE = f"""
WITH tf AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
         {_RRF_DUCK_TFS}
  FROM documents
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         avg(dl) AS avgdl,
         {", ".join(f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}" for i in range(len(_BM25_TERMS)))}
  FROM tf
), lex AS (
  SELECT doc_id, r_lex FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY s DESC, doc_id) AS r_lex
    FROM (
      SELECT doc_id,
             round({" + ".join(_duck_contrib(i, t) for i, t in enumerate(_BM25_TERMS))}, 6) AS s
      FROM tf CROSS JOIN stats
      WHERE {" + ".join(f"tf{i}" for i in range(len(_BM25_TERMS)))} > 0
    )
  ) WHERE r_lex <= {_RRF_POOL}
), q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
  WHERE vec_id = {_RRF_QUERY_VEC}
), sem AS (
  SELECT doc_id, r_sem FROM (
    SELECT e.vec_id AS doc_id,
           row_number() OVER (
             ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) DESC,
                      e.vec_id) AS r_sem
    FROM embeddings e, q
    WHERE e.vec_id <> {_RRF_QUERY_VEC}
  ) WHERE r_sem <= {_RRF_POOL}
)
SELECT doc_id,
       CAST(r_lex AS BIGINT) AS r_lex,
       CAST(r_sem AS BIGINT) AS r_sem,
       floor((coalesce(1.0 / ({_RRF_K} + r_lex), 0.0)
              + coalesce(1.0 / ({_RRF_K} + r_sem), 0.0)) * 1000000 + 0.5)
         / 1000000.0 AS rrf
FROM lex FULL JOIN sem USING (doc_id)
ORDER BY rrf DESC, doc_id
LIMIT {_RRF_TOP_K}
"""


@register("ext_hybrid_rrf", oracle=_RRF_ORACLE)
def ext_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID RETRIEVAL FUSION via Reciprocal Rank Fusion (Cormack,
    Clarke & Buettcher 2009): the production RAG retrieval shape — a
    lexical BM25 top-{pool} list and a semantic cosine top-{pool} list,
    fused by rrf(d) = Σ_r 1/({k} + rank_r(d)) and re-ranked.  RRF works
    on RANKS, not scores, so the two incomparable score scales (BM25
    log-idf vs cosine) never need calibration — which is exactly why
    production systems use it over score interpolation.

    Scale shape: each ranker keeps its own optimal plan — BM25 is the
    shuffle-free projection+heap of ``ext_bm25_search``, cosine is the
    broadcast-query one-pass scan of ``ext_sim_cosine`` — and only the
    two {pool}-row candidate lists ever meet: ranks come from a window
    over each BOUNDED pool (the one place an unpartitioned window is
    safe by construction), the fusion is a {pool}+{pool}-row full outer
    join, and the final sort is {top}-row.  At 100 TB the corpus cost
    is the two scans; fusion cost is O(pool).

    The fused score is 1/(k+rank) sums over EXACT integer ranks — two
    doubles added in the same order in both engines, half-up rounded
    once (the float-oracle discipline)."""
    from pyspark.sql import Window

    from .simsearch import cosine

    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")

    # Lexical pool: TakeOrderedAndProject keeps the heap distributed;
    # the rank window then runs over the bounded _RRF_POOL-row frame.
    lex_pool = (
        _bm25_scored(docs)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(_RRF_POOL)
    )
    lex = lex_pool.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .cast("long")
        .alias("r_lex"),
    )

    vec = F.col("embedding").cast("array<double>")
    q = emb.filter(F.col("vec_id") == _RRF_QUERY_VEC).select(vec.alias("qv"))
    sem_pool = (
        emb.filter(F.col("vec_id") != _RRF_QUERY_VEC)
        .join(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(vec, F.col("qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("doc_id"))
        .limit(_RRF_POOL)
    )
    sem = sem_pool.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("cos_sim"), F.asc("doc_id")))
        .cast("long")
        .alias("r_sem"),
    )

    term = lambda c: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(_RRF_K) + F.col(c)), F.lit(0.0)
    )
    rrf = F.floor((term("r_lex") + term("r_sem")) * 1000000 + 0.5) / 1000000.0
    return (
        lex.join(sem, "doc_id", "full_outer")
        .select("doc_id", "r_lex", "r_sem", rrf.alias("rrf"))
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(_RRF_TOP_K)
    )


ext_hybrid_rrf.__doc__ = ext_hybrid_rrf.__doc__.format(
    pool=_RRF_POOL, k=_RRF_K, top=_RRF_TOP_K
)


_PACK_BUDGET = 400  # context token budget


@register(
    "ext_rag_context_pack",
    oracle=f"""
WITH fused AS ({_RRF_ORACLE}),
toks AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
packed AS (
  SELECT f.doc_id, f.rrf, t.n_tokens,
         CAST(row_number() OVER (ORDER BY f.rrf DESC, f.doc_id) AS BIGINT)
           AS slot,
         CAST(sum(t.n_tokens) OVER (ORDER BY f.rrf DESC, f.doc_id) AS BIGINT)
           AS cum_tokens
  FROM fused f JOIN toks t USING (doc_id)
)
SELECT slot, doc_id, n_tokens, cum_tokens, rrf
FROM packed WHERE cum_tokens <= {_PACK_BUDGET}
ORDER BY slot
""",
)
def ext_rag_context_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG CONTEXT PACKING: the fused retrieval ranking becomes an actual
    prompt context — documents admitted in fusion order while the running
    token total stays inside a {budget}-token budget (strict prefix
    packing: rank order IS the relevance order, so the first overflow
    ends the context — the assembly step between retrieval and the
    prompt that every RAG serving stack runs per request).

    Composes ``ext_hybrid_rrf`` (the fused top-{top}) with per-doc token
    counts: the corpus-side cost is the fusion's two scans plus one
    token-count projection JOINED ON THE {top}-ROW LIST (the join prunes
    to the candidate ids — at 100 TB the packing stage touches {top}
    documents, not the corpus); the cumulative window runs over the
    bounded fused frame.  All integer token arithmetic."""
    from pyspark.sql import Window

    fused = ext_hybrid_rrf(spark, sf_dir)
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    w = Window.orderBy(F.desc("rrf"), F.asc("doc_id"))
    packed = fused.join(docs, "doc_id").select(
        F.row_number().over(w).cast("long").alias("slot"),
        "doc_id",
        "n_tokens",
        F.sum("n_tokens")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("cum_tokens"),
        "rrf",
    )
    return packed.filter(F.col("cum_tokens") <= _PACK_BUDGET).orderBy("slot")


ext_rag_context_pack.__doc__ = ext_rag_context_pack.__doc__.format(
    budget=_PACK_BUDGET, top=_RRF_TOP_K
)


_NDCG_QUERIES = 8  # query vectors: vec_id 0..7
_NDCG_K = 10

# Ideal-DCG cumulative table: icum[i] = sum_{j<=i} 1/log2(j+1), summed in
# ascending j both here and in the oracle's window — identical doubles.
_IDCG = []
for _i in range(1, _NDCG_K + 1):
    import math as _math

    _IDCG.append((_IDCG[-1] if _IDCG else 0.0) + 1.0 / _math.log2(_i + 1))


@register(
    "ext_ndcg",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS qid, label AS qlabel,
         CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < {_NDCG_QUERIES}
), c AS (
  SELECT q.qid,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6)
           AS cs,
         e.vec_id,
         CASE WHEN e.label = q.qlabel THEN 1 ELSE 0 END AS rel
  FROM embeddings e, q WHERE e.vec_id <> q.qid
), ranked AS (
  SELECT qid, rel,
         row_number() OVER (PARTITION BY qid ORDER BY cs DESC, vec_id) AS rk
  FROM c
), rtot AS (
  SELECT qid, CAST(sum(rel) AS BIGINT) AS n_relevant FROM c GROUP BY 1
), dcg AS (
  SELECT qid,
         CAST(sum(rel) AS BIGINT) AS hits_at_k,
         list_reduce(
           list_prepend(CAST(0 AS DOUBLE),
                        list(CASE WHEN rel = 1
                                  THEN 1.0 / log2(CAST(rk AS DOUBLE) + 1)
                                  ELSE CAST(0 AS DOUBLE) END ORDER BY rk)),
           (a, b) -> a + b) AS dcg
  FROM ranked WHERE rk <= {_NDCG_K} GROUP BY qid
), ideal AS (
  SELECT i, sum(1.0 / log2(CAST(i AS DOUBLE) + 1)) OVER (ORDER BY i) AS icum
  FROM (SELECT unnest(generate_series(1, {_NDCG_K})) AS i)
)
SELECT d.qid AS query_vec, t.n_relevant, d.hits_at_k,
       -- LEFT join + explicit zero: a query with NO relevant candidate
       -- has least(R, k) = 0, which an inner join to the 1..k ideal
       -- table silently DROPPED (the matryoshka zero-overlap bug class);
       -- NDCG is defined as 0 there.
       CASE WHEN t.n_relevant = 0 THEN 0.0
            ELSE floor(d.dcg / ideal.icum * 1000000 + 0.5) / 1000000.0
       END AS ndcg_at_k
FROM dcg d JOIN rtot t USING (qid)
LEFT JOIN ideal ON ideal.i = least(t.n_relevant, {_NDCG_K})
ORDER BY query_vec
""",
)
def ext_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@{k} of label-match retrieval for {m} query vectors — the
    RANK-QUALITY metric the retrieval family was missing
    (``ext_brier_score``/``ext_classifier_confusion`` score
    classification, ``ext_kmeans_purity`` clustering; nothing scored
    the ORDER a ranker returns): relevance = same-label, ranking =
    rounded cosine with vec_id tiebreak, DCG with the standard
    1/log2(rank+1) discount, normalized by the ideal DCG at
    min(R, k).

    Float discipline: cosines round to 6dp before ranking (the
    ext_sim_cosine recipe, stable cross-engine order); the <= {k}
    discount terms fold rank-sorted (list_reduce == F.aggregate); the
    ideal-DCG table is a k-row constant accumulated ascending in both
    engines.  Scale shape: the per-query rank <= {k} filter plans as
    WindowGroupLimit over the one broadcast-query scored scan; per-
    query output is 1 row.  Brute-force scoring is the documented
    eval-time shape (evals run over a sampled query set; the serving
    path is the IVF/LSH family)."""
    from pyspark.sql import Window

    from .simsearch import cosine

    emb = table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    q = emb.filter(F.col("vec_id") < _NDCG_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        vec.alias("qv"),
    )
    c = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.round(cosine(vec, F.col("qv")), 6).alias("cs"),
            "vec_id",
            F.when(F.col("label") == F.col("qlabel"), 1).otherwise(0).alias("rel"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cs"), "vec_id")
    ranked = c.select(
        "qid", "rel", F.row_number().over(w).alias("rk")
    ).filter(F.col("rk") <= _NDCG_K)
    rtot = c.groupBy("qid").agg(F.sum("rel").cast("long").alias("n_relevant"))
    term = F.when(
        F.col("rel") == 1, F.lit(1.0) / F.log2(F.col("rk").cast("double") + 1)
    ).otherwise(F.lit(0.0))
    dcg = ranked.groupBy("qid").agg(
        F.sum("rel").cast("long").alias("hits_at_k"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("rk"), term.alias("t")))
                ),
                lambda s: s.getField("t"),
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("dcg"),
    )
    ideal = spark.createDataFrame(
        [(i + 1, _IDCG[i]) for i in range(_NDCG_K)], "i long, icum double"
    )
    # LEFT join + explicit zero for R = 0 queries (the matryoshka
    # zero-overlap bug class: least(0, k) = 0 has no ideal row and an
    # inner join silently dropped the query).  NDCG := 0 there.
    out = (
        dcg.join(rtot, "qid")
        .join(
            F.broadcast(ideal),
            F.col("i") == F.least(F.col("n_relevant"), F.lit(_NDCG_K)),
            "left",
        )
        .select(
            F.col("qid").alias("query_vec"),
            "n_relevant",
            "hits_at_k",
            F.when(F.col("n_relevant") == 0, F.lit(0.0))
            .otherwise(
                F.floor(F.col("dcg") / F.col("icum") * 1000000 + 0.5) / 1000000.0
            )
            .alias("ndcg_at_k"),
        )
        .orderBy("query_vec")
    )
    return out


ext_ndcg.__doc__ = ext_ndcg.__doc__.format(k=_NDCG_K, m=_NDCG_QUERIES)


_MMR_QID = 0        # query vector
_MMR_POOL = 20      # candidate pool: brute-force top-20 by cosine
_MMR_K = 8          # reranked picks
_MMR_LAMBDA = 0.7   # relevance weight; 1-lambda penalizes redundancy


def _mmr_steps_sql() -> str:
    """Unrolled MMR selection steps s1..s{k} (the graph_betweenness
    unrolled-CTE trick — no recursion restrictions on correlated
    subqueries): each step appends the argmax of
    round(l*qsim - (1-l)*max_sim_to_picked, 6) with vec_id tiebreak."""
    steps = ["s0 AS (SELECT CAST([] AS BIGINT[]) AS picked)"]
    for i in range(1, _MMR_K + 1):
        steps.append(f"""s{i} AS (
  SELECT list_append(prev.picked, (
    SELECT sc.vec_id FROM (
      SELECT c.vec_id,
             floor(({_MMR_LAMBDA} * c.qsim - {round(1 - _MMR_LAMBDA, 10)}
                    * coalesce((SELECT max(p.sim) FROM pairs p
                                WHERE p.a = c.vec_id
                                  AND list_contains(prev.picked, p.b)),
                               CAST(0 AS DOUBLE))) * 1000000 + 0.5)
               / 1000000.0 AS score
      FROM pool c WHERE NOT list_contains(prev.picked, c.vec_id)
    ) sc ORDER BY sc.score DESC, sc.vec_id LIMIT 1)) AS picked
  FROM s{i-1} prev
)""")
    return ",\n".join(steps)


@register(
    "ext_mmr_rerank",
    oracle=f"""
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
  WHERE vec_id = {_MMR_QID}
), pool AS (
  SELECT e.vec_id,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6)
           AS qsim,
         CAST(e.embedding AS DOUBLE[]) AS v
  FROM embeddings e, q WHERE e.vec_id <> {_MMR_QID}
  ORDER BY qsim DESC, e.vec_id LIMIT {_MMR_POOL}
), pairs AS (
  SELECT a.vec_id AS a, b.vec_id AS b,
         round(list_cosine_similarity(a.v, b.v), 6) AS sim
  FROM pool a, pool b WHERE a.vec_id <> b.vec_id
),
{{steps}}
SELECT x.i AS rank, pool.vec_id, pool.qsim
FROM (
  SELECT t.i, s{_MMR_K}.picked[t.i] AS pid
  FROM s{_MMR_K}, (SELECT unnest(generate_series(1, {_MMR_K})) AS i) t
) x JOIN pool ON pool.vec_id = x.pid
ORDER BY rank
""".replace("{steps}", _mmr_steps_sql()),
)
def ext_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMAL MARGINAL RELEVANCE rerank (Carbonell & Goldstein 1998) of
    the query's top-{pool} cosine candidates: greedily pick {k} results
    maximizing l*sim(q,d) - (1-l)*max_(s in picked) sim(d,s), l={l} —
    the diversity-aware selection a RAG context builder runs between
    retrieval (``ext_sim_cosine``/``ext_hybrid_rrf``) and packing
    (``ext_rag_context_pack``): near-duplicate passages waste context
    budget, so redundancy is penalized against the already-picked set.

    Cross-engine: BOTH the query sims and the {pool}x{pool} pairwise
    sims are engine-computed and rounded to 6dp before the greedy
    (the ext_sim_cosine discipline), so the argmax sequence is
    identical; the oracle UNROLLS the {k} greedy steps as chained CTEs
    (the graph_betweenness trick), each appending the per-step argmax
    with vec_id tiebreak.  Scale shape: the corpus contributes ONE
    broadcast-query top-{pool} scan (TakeOrdered per-partition heaps);
    the greedy itself runs on the bounded pool (pairs = {pool}^2 rows
    collected driver-side — parameter-sized, the ext_ts_dtw
    query-collect precedent)."""
    from .simsearch import cosine

    emb = table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    q = emb.filter(F.col("vec_id") == _MMR_QID).select(vec.alias("qv"))
    pool = (
        emb.filter(F.col("vec_id") != _MMR_QID)
        .join(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine(vec, F.col("qv")), 6).alias("qsim"),
            vec.alias("v"),
        )
        .orderBy(F.desc("qsim"), F.asc("vec_id"))
        .limit(_MMR_POOL)
    )
    pool = pool.localCheckpoint(eager=True)  # score the pool once, reuse twice
    a = pool.select(F.col("vec_id").alias("a"), F.col("v").alias("va"))
    b = pool.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"))
    pairs = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("a") != F.col("b"))
        .select("a", "b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("sim"))
    )
    qsims = {r.vec_id: r.qsim for r in pool.select("vec_id", "qsim").collect()}
    sim = {(r.a, r.b): r.sim for r in pairs.collect()}  # POOL^2 rows, bounded
    picked: list[int] = []
    lam, mu = _MMR_LAMBDA, round(1 - _MMR_LAMBDA, 10)
    import math

    while len(picked) < _MMR_K and len(picked) < len(qsims):
        best = None
        for cid in sorted(qsims):
            if cid in picked:
                continue
            pen = max((sim[(cid, p)] for p in picked), default=0.0)
            score = math.floor((lam * qsims[cid] - mu * pen) * 1e6 + 0.5) / 1e6
            if best is None or score > best[0]:
                best = (score, cid)
        picked.append(best[1])
    rows = [(i + 1, vid, qsims[vid]) for i, vid in enumerate(picked)]
    return spark.createDataFrame(rows, "rank long, vec_id long, qsim double")


_RBO_K = 15      # evaluation depth
_RBO_P = 0.9     # persistence (top-weightedness) parameter
# Depth weights (1-p) * p^(d-1) / d as Python literals spliced into BOTH
# engines (the ts_ewma constant discipline — no cross-engine pow()).
_RBO_W = [(1.0 - _RBO_P) * _RBO_P ** (d - 1) / d for d in range(1, _RBO_K + 1)]


@register(
    "ext_rank_biased_overlap",
    oracle=f"""
WITH li AS (
  SELECT l_orderkey, CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(date_diff('day', DATE '1970-01-01', date_trunc('day', l_shipdate))
              AS BIGINT) AS d
  FROM lineitem
),
sp AS (SELECT min(d) AS mn, max(d) AS mx FROM li),
h AS (
  SELECT cu.c_nationkey AS nk,
         CASE WHEN 2 * (li.d - mn) < (mx - mn) THEN 0 ELSE 1 END AS half,
         li.cents
  FROM li JOIN orders o ON li.l_orderkey = o.o_orderkey
  JOIN customer cu ON o.o_custkey = cu.c_custkey, sp
),
s AS (SELECT half, nk, CAST(sum(cents) AS BIGINT) AS rev FROM h GROUP BY 1, 2),
r AS (
  SELECT half, nk,
         CAST(row_number() OVER (PARTITION BY half ORDER BY rev DESC, nk)
              AS BIGINT) AS rk
  FROM s
),
mh AS (
  SELECT a.nk, greatest(a.rk, b.rk) AS m
  FROM (SELECT nk, rk FROM r WHERE half = 0 AND rk <= {_RBO_K}) a
  JOIN (SELECT nk, rk FROM r WHERE half = 1 AND rk <= {_RBO_K}) b
    ON a.nk = b.nk
),
xd AS (
  SELECT g.d, CAST(count(mh.m) AS BIGINT) AS x
  FROM (SELECT unnest(generate_series(1, {_RBO_K})) AS d) g
  LEFT JOIN mh ON mh.m <= g.d
  GROUP BY g.d
),
fold AS (
  SELECT list_reduce(list_prepend(0.0, list(
             x * (CASE d {" ".join(f"WHEN {i + 1} THEN {w!r}" for i, w in enumerate(_RBO_W))} END)
             ORDER BY d)), (p, q) -> p + q) AS rbo,
         max(CASE WHEN d = {_RBO_K} THEN x END) AS overlap_k
  FROM xd
)
SELECT CAST({_RBO_K} AS BIGINT) AS k,
       CAST({_RBO_P!r} AS DOUBLE) AS p,
       floor(rbo * 1000000 + 0.5) / 1000000.0 AS rbo,
       CAST(overlap_k AS BIGINT) AS overlap_at_k,
       floor(CAST(overlap_k AS DOUBLE) / (2 * {_RBO_K} - overlap_k)
             * 1000000 + 0.5) / 1000000.0 AS jaccard_at_k
FROM fold
""",
)
def ext_rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK-BIASED OVERLAP (Webber et al.) between the top-{k}
    nation-revenue rankings of the window's two halves: how STABLE is
    the leaderboard, weighted so the top ranks dominate (p = {p})?
    RBO is the ranking-drift metric that NDCG cannot provide (NDCG
    needs relevance labels; RBO compares two rankings directly) — the
    monitoring companion every "top sellers" dashboard needs, and the
    same statistic retrieval teams use to compare ranker versions.

    RBO@k = sum_d (1-p) p^(d-1) X_d / d with X_d = |prefix_d(A) n
    prefix_d(B)|.  X_d comes from the histogram of m = max(rank_A,
    rank_B) joined against the 1..k depth grid (k^2 bounded pairs, no
    per-depth set intersection); the depth weights are Python literals
    spliced into both engines; the fold runs in depth order.  Ranks are
    exact-revenue ordered with nation tiebreak.  Scale: everything past
    the (half, nation) combine is k-sized."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.datediff(
            F.date_trunc("day", "l_shipdate"), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("d"),
    )
    sp = li.agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    h = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(cu, o["o_custkey"] == cu["c_custkey"])
        .crossJoin(F.broadcast(sp))
        .select(
            F.col("c_nationkey").alias("nk"),
            F.when(2 * (F.col("d") - F.col("mn")) < (F.col("mx") - F.col("mn")), 0)
            .otherwise(1)
            .alias("half"),
            "cents",
        )
    )
    s = h.groupBy("half", "nk").agg(F.sum("cents").cast("long").alias("rev"))
    from pyspark.sql import Window

    w = Window.partitionBy("half").orderBy(F.desc("rev"), "nk")
    r = s.select("half", "nk", F.row_number().over(w).cast("long").alias("rk"))
    a = r.filter((F.col("half") == 0) & (F.col("rk") <= _RBO_K)).select(
        "nk", F.col("rk").alias("ra")
    )
    b = r.filter((F.col("half") == 1) & (F.col("rk") <= _RBO_K)).select(
        F.col("nk").alias("nkb"), F.col("rk").alias("rb")
    )
    mh = a.join(F.broadcast(b), F.col("nk") == F.col("nkb")).select(
        F.greatest("ra", "rb").alias("m")
    )
    grid = spark.range(1, _RBO_K + 1).select(F.col("id").alias("d"))
    xd = (
        grid.join(F.broadcast(mh), F.col("m") <= F.col("d"), "left")
        .groupBy("d")
        .agg(F.count("m").cast("long").alias("x"))
    )
    weight = None
    for i, wt in enumerate(_RBO_W):
        t = F.when(F.col("d") == i + 1, F.lit(wt))
        weight = t if weight is None else weight.when(F.col("d") == i + 1, F.lit(wt))
    from ..operators.monitoring import _ordfold

    fold = xd.agg(
        _ordfold(F.col("d"), F.col("x") * weight).alias("rbo"),
        F.max(F.when(F.col("d") == _RBO_K, F.col("x"))).cast("long").alias(
            "overlap_k"
        ),
    )
    q6 = lambda x: F.floor(x * 1000000 + 0.5) / 1000000.0  # noqa: E731
    return fold.select(
        F.lit(_RBO_K).cast("long").alias("k"),
        F.lit(_RBO_P).alias("p"),
        q6(F.col("rbo")).alias("rbo"),
        F.col("overlap_k").alias("overlap_at_k"),
        q6(
            F.col("overlap_k").cast("double") / (2 * _RBO_K - F.col("overlap_k"))
        ).alias("jaccard_at_k"),
    )
