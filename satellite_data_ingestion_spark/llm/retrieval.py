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
    docs = table(spark, sf_dir, "documents")
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

    scored = (
        proj.join(F.broadcast(stats))
        .filter(sum(F.col(f"tf{i}") for i in range(len(_BM25_TERMS))) > 0)
        .select(
            "doc_id",
            F.round(
                sum(contrib(i) for i in range(len(_BM25_TERMS))), 6
            ).alias("bm25"),
        )
    )
    return scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(_BM25_TOP_K)


ext_bm25_search.__doc__ = ext_bm25_search.__doc__.format(
    terms=", ".join(_BM25_TERMS), k1=_BM25_K1, b=_BM25_B
)
