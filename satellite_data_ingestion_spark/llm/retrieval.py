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
