"""Statistical n-gram language model — train + perplexity scoring, the
CCNet / Wenzek et al. 2020 quality-filtering pattern (a small LM scores
every candidate document; low-perplexity ≈ fluent text survives).

Two operators, decomposed 100-TB-first:

- ``ext_ngram_lm_train``  add-k-smoothed BIGRAM model.  The only
  corpus-sized stage is one (w1, w2) count shuffle with map-side
  combine; everything downstream lives on the VOCAB² grain (bounded —
  at web scale the model is capped to the top-V vocabulary exactly like
  ``ext_bpe_train``'s histogram, and V² conditional rows never approach
  corpus size).  Log-probs are single ``ln()`` calls on exact integer
  count ratios, so the released table hash-matches the DuckDB twin.

- ``ext_ngram_lm_score``  per-document perplexity under that model.
  Document bigrams join the model table (vocab²-bounded → broadcastable
  at any corpus size); the per-doc log-prob sum folds SEQUENTIALLY over
  the position-sorted array (``F.aggregate`` == DuckDB ``list_reduce``,
  the engine's standard float-determinism discipline — doc-length
  bounded, never a corpus-wide float sum); the CCNet keep/drop gate
  rides the output.

The reference repo has no text analytics; this extends the SURVEY §2.10
LLM-data surface next to ``ext_lm_score`` (character-level heuristic) —
this pair is the REAL trained-model path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_LM_K = 0.5  # add-k smoothing mass
_PPL_KEEP = 40.0  # CCNet-style keep threshold (perplexity at or below)
_BOS = "<s>"  # beginning-of-document sentinel


def _tok_arr():
    return F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), " ")


@register(
    "ext_ngram_lm_train",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, list_prepend('{_BOS}', str_split(lower(text), ' ')) AS t
  FROM documents
),
bg AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks)
),
pair_n AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY 1, 2
),
ctx_n AS (
  SELECT w1, CAST(sum(n) AS BIGINT) AS c1 FROM pair_n GROUP BY 1
),
v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS vsz FROM pair_n)
SELECT p.w1, p.w2, p.n,
       floor(ln((p.n + CAST({_LM_K} AS DOUBLE)) / (c.c1 + CAST({_LM_K} AS DOUBLE) * v.vsz)) * 1000000
             - 0.5) / 1000000.0 AS logprob
FROM pair_n p JOIN ctx_n c USING (w1) CROSS JOIN v
ORDER BY p.w1, p.w2
""",
)
def ext_ngram_lm_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the add-{k} bigram LM on the document corpus: one (w1, w2)
    count shuffle (map-side combined), conditional log-probs
    ``ln((n + k) / (c(w1) + k·V))`` on the vocab² grain.  ``{bos}``
    prepends every document so first-token probabilities are modeled.
    Released log-probs are floor-quantized at 1e-6 (toward -inf — they
    are negative, so the quantizer is ``floor(x·1e6 − 0.5)/1e6``, the
    half-away-from-zero form both engines share)."""
    docs = table(spark, sf_dir, "documents")
    # Bind the token array ONCE per row before the lambda: an inline
    # split() referenced via element_at inside transform re-tokenizes per
    # ELEMENT ACCESS (O(len^2) splits/doc — the ext_bigram_freq lesson).
    toks = docs.select(
        F.concat(F.array(F.lit(_BOS)), _tok_arr()).alias("t")
    )
    t = F.col("t")
    bg = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.struct(
                    F.element_at(t, i).alias("w1"),
                    F.element_at(t, i + 1).alias("w2"),
                ),
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    pair_n = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("n"))
    ctx_n = pair_n.groupBy("w1").agg(F.sum("n").cast("long").alias("c1"))
    vsz = pair_n.agg(F.countDistinct("w2").cast("long").alias("vsz"))
    lp = F.log(
        (F.col("n") + F.lit(_LM_K))
        / (F.col("c1") + F.lit(_LM_K) * F.col("vsz"))
    )
    return (
        pair_n.join(ctx_n, "w1")
        .crossJoin(F.broadcast(vsz))
        .select(
            "w1",
            "w2",
            "n",
            (F.floor(lp * 1000000 - 0.5) / 1000000.0).alias("logprob"),
        )
        .orderBy("w1", "w2")
    )


ext_ngram_lm_train.__doc__ = ext_ngram_lm_train.__doc__.format(
    k=_LM_K, bos=_BOS
)


@register(
    "ext_ngram_lm_score",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, list_prepend('{_BOS}', str_split(lower(text), ' ')) AS t
  FROM documents
),
bg AS (
  SELECT doc_id, i AS pos, t[i] AS w1, t[i + 1] AS w2
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
        FROM toks)
),
pair_n AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY 1, 2
),
ctx_n AS (SELECT w1, CAST(sum(n) AS BIGINT) AS c1 FROM pair_n GROUP BY 1),
v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS vsz FROM pair_n),
lm AS (
  SELECT p.w1, p.w2,
         ln((p.n + CAST({_LM_K} AS DOUBLE)) / (c.c1 + CAST({_LM_K} AS DOUBLE) * v.vsz)) AS lp
  FROM pair_n p JOIN ctx_n c USING (w1) CROSS JOIN v
),
folded AS (
  SELECT b.doc_id,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                  list(lm.lp ORDER BY b.pos)),
                     (a, x) -> a + x) AS ll
  FROM bg b JOIN lm ON b.w1 = lm.w1 AND b.w2 = lm.w2
  GROUP BY b.doc_id
)
SELECT doc_id, n_bigrams,
       floor(exp(-ll / n_bigrams) * 10000 + 0.5) / 10000.0 AS ppl,
       exp(-ll / n_bigrams) <= CAST({_PPL_KEEP} AS DOUBLE) AS keep
FROM folded
ORDER BY doc_id
""",
)
def ext_ngram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document's PERPLEXITY under the corpus-trained add-k
    bigram LM and apply the CCNet keep gate (ppl <= {th}) — the
    fluency-based quality filter that runs ahead of dedup in production
    pipelines (Wenzek et al. 2020).

    Float discipline: the per-doc log-likelihood folds SEQUENTIALLY over
    the position-sorted bigram log-probs (collect_list → array_sort →
    ``F.aggregate`` left fold == DuckDB ``list(... ORDER BY pos)`` →
    ``list_reduce``), so the one order-sensitive double sum is
    deterministic and doc-length-bounded.  Scoring the training corpus
    itself means every bigram hits the model (inner join is total);
    scoring UNSEEN text in production adds a coalesce to the unseen-pair
    mass ``ln(k / (c(w1) + k·V))`` — same plan, one more join.

    Scale shape: the model is vocab²-bounded (broadcastable); the corpus
    side is one explode + one join + one per-doc aggregate."""
    docs = table(spark, sf_dir, "documents")
    # Token array bound once per row (see ext_ngram_lm_train).
    toks = docs.select(
        "doc_id", F.concat(F.array(F.lit(_BOS)), _tok_arr()).alias("t")
    )
    t = F.col("t")
    bg = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.element_at(t, i).alias("w1"),
                    F.element_at(t, i + 1).alias("w2"),
                ),
            )
        ).alias("b"),
    ).select("doc_id", "b.pos", "b.w1", "b.w2")
    pair_n = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("n"))
    ctx_n = pair_n.groupBy("w1").agg(F.sum("n").cast("long").alias("c1"))
    vsz = pair_n.agg(F.countDistinct("w2").cast("long").alias("vsz"))
    lm = (
        pair_n.join(ctx_n, "w1")
        .crossJoin(F.broadcast(vsz))
        .select(
            "w1",
            "w2",
            F.log(
                (F.col("n") + F.lit(_LM_K))
                / (F.col("c1") + F.lit(_LM_K) * F.col("vsz"))
            ).alias("lp"),
        )
    )
    folded = (
        bg.join(F.broadcast(lm), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("lp")))
                    ),
                    lambda s: s.getField("lp"),
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("ll"),
        )
    )
    ppl = F.exp(-F.col("ll") / F.col("n_bigrams"))
    return folded.select(
        "doc_id",
        "n_bigrams",
        (F.floor(ppl * 10000 + 0.5) / 10000.0).alias("ppl"),
        (ppl <= F.lit(_PPL_KEEP)).alias("keep"),
    ).orderBy("doc_id")


ext_ngram_lm_score.__doc__ = ext_ngram_lm_score.__doc__.format(th=_PPL_KEEP)


_DRW_ETA = 0.5  # exponentiated-gradient step on normalized excess loss


@register(
    "ext_domain_reweight",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, list_prepend('{_BOS}', str_split(lower(text), ' ')) AS t
  FROM documents
),
bg AS (
  SELECT doc_id, i AS pos, t[i] AS w1, t[i + 1] AS w2
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
        FROM toks)
),
pair_n AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY 1, 2
),
ctx_n AS (SELECT w1, CAST(sum(n) AS BIGINT) AS c1 FROM pair_n GROUP BY 1),
v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS vsz FROM pair_n),
lm AS (
  SELECT p.w1, p.w2,
         ln((p.n + CAST({_LM_K} AS DOUBLE))
            / (c.c1 + CAST({_LM_K} AS DOUBLE) * v.vsz)) AS lp
  FROM pair_n p JOIN ctx_n c USING (w1) CROSS JOIN v
),
doc_ppl AS (
  SELECT b.doc_id,
         CAST(floor(exp(-list_reduce(
                 list_prepend(CAST(0 AS DOUBLE), list(lm.lp ORDER BY b.pos)),
                 (a, x) -> a + x) / count(*)) * 10000 + 0.5) AS BIGINT)
           AS ppl4
  FROM bg b JOIN lm ON b.w1 = lm.w1 AND b.w2 = lm.w2
  GROUP BY b.doc_id
),
dom AS (
  SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(p.ppl4) AS BIGINT) AS sp4
  FROM documents d JOIN doc_ppl p USING (doc_id)
  GROUP BY 1
),
scored AS (
  SELECT source, n_docs,
         CAST(sp4 AS DOUBLE) / n_docs / 10000 AS mean_ppl,
         CAST(n_docs AS DOUBLE)
           / (SELECT sum(n_docs) FROM dom) AS base_share,
         (CAST(sp4 AS DOUBLE) / n_docs
          - (SELECT min(CAST(sp4 AS DOUBLE) / n_docs) FROM dom)) / 10000
           AS excess
  FROM dom
),
unnorm AS (
  SELECT source, n_docs, mean_ppl, base_share,
         base_share * exp(CAST({_DRW_ETA} AS DOUBLE) * excess) AS uw
  FROM scored
),
z AS (
  SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                  list(uw ORDER BY source)),
                     (a, x) -> a + x) AS z
  FROM unnorm
)
SELECT u.source, u.n_docs,
       floor(u.mean_ppl * 10000 + 0.5) / 10000.0 AS mean_ppl,
       floor(u.base_share * 1000000 + 0.5) / 1000000.0 AS base_share,
       floor(u.uw / z.z * 1000000 + 0.5) / 1000000.0 AS weight
FROM unnorm u CROSS JOIN z
ORDER BY u.source
""",
)
def ext_domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOMAIN REWEIGHTING, DoReMi-style (Xie et al. 2023, simplified to
    one exponentiated-gradient round on a static proxy loss): each
    source's mixture weight is its base share scaled by
    ``exp(η · excess_loss)`` — domains the proxy LM finds HARD
    (high perplexity under ``ext_ngram_lm_train``'s bigram model, the
    excess over the easiest domain) get upweighted, the
    harder-data-deserves-more-epochs principle behind trained mixture
    weights (``ext_mix_temperature`` is the count-only heuristic this
    replaces).

    Per-doc perplexities are quantized to integer 1e-4 units FIRST, so
    the per-source aggregation is an exact integer sum at any corpus
    size (no corpus-sized float fold); the |domains|-row normalizer
    folds in source order.  One corpus bigram pass + one broadcast LM
    join + two bounded aggregates."""
    docs = table(spark, sf_dir, "documents")
    # Token array bound once per row (see ext_ngram_lm_train).
    toks = docs.select(
        "doc_id", F.concat(F.array(F.lit(_BOS)), _tok_arr()).alias("t")
    )
    t = F.col("t")
    bg = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.element_at(t, i).alias("w1"),
                    F.element_at(t, i + 1).alias("w2"),
                ),
            )
        ).alias("b"),
    ).select("doc_id", "b.pos", "b.w1", "b.w2")
    pair_n = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("n"))
    ctx_n = pair_n.groupBy("w1").agg(F.sum("n").cast("long").alias("c1"))
    vsz = pair_n.agg(F.countDistinct("w2").cast("long").alias("vsz"))
    lm = (
        pair_n.join(ctx_n, "w1")
        .crossJoin(F.broadcast(vsz))
        .select(
            "w1",
            "w2",
            F.log(
                (F.col("n") + F.lit(_LM_K))
                / (F.col("c1") + F.lit(_LM_K) * F.col("vsz"))
            ).alias("lp"),
        )
    )
    ll = F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col("lp")))),
            lambda s: s.getField("lp"),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    doc_ppl = (
        bg.join(F.broadcast(lm), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.floor(
                F.exp(-ll / F.count(F.lit(1))) * 10000 + 0.5
            ).cast("long").alias("ppl4")
        )
    )
    dom = (
        docs.select("doc_id", "source")
        .join(doc_ppl, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("ppl4").cast("long").alias("sp4"),
        )
    )
    tots = dom.agg(
        F.sum("n_docs").cast("long").alias("nt"),
        F.min(F.col("sp4").cast("double") / F.col("n_docs")).alias("min_mp4"),
    )
    scored = dom.crossJoin(F.broadcast(tots)).select(
        "source",
        "n_docs",
        (F.col("sp4").cast("double") / F.col("n_docs") / 10000).alias("mean_ppl"),
        (F.col("n_docs").cast("double") / F.col("nt")).alias("base_share"),
        (
            (F.col("sp4").cast("double") / F.col("n_docs") - F.col("min_mp4"))
            / 10000
        ).alias("excess"),
    )
    unnorm = scored.select(
        "source",
        "n_docs",
        "mean_ppl",
        "base_share",
        (F.col("base_share") * F.exp(F.lit(_DRW_ETA) * F.col("excess"))).alias("uw"),
    )
    z = unnorm.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("source"), F.col("uw").alias("u")))),
                lambda s: s.getField("u"),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("z")
    )

    def q6(x):
        return F.floor(x * 1000000 + 0.5) / 1000000.0

    return (
        unnorm.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            (F.floor(F.col("mean_ppl") * 10000 + 0.5) / 10000.0).alias("mean_ppl"),
            q6(F.col("base_share")).alias("base_share"),
            q6(F.col("uw") / F.col("z")).alias("weight"),
        )
        .orderBy("source")
    )


_KN_D = 0.75      # absolute-discount mass
_KN_TOP = 20      # report the top-N bigrams by count


@register(
    "ext_ngram_kneser_ney",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, str_split(text, ' ') AS ts FROM documents
), bi AS (
  SELECT unnest(list_transform(range(1, len(ts)),
                               i -> [ts[i], ts[i + 1]])) AS pair
  FROM toks WHERE len(ts) >= 2
), bc AS (
  SELECT pair[1] AS v, pair[2] AS w, CAST(count(*) AS BIGINT) AS c
  FROM bi GROUP BY 1, 2
), uv AS (
  SELECT v, CAST(sum(c) AS BIGINT) AS cv,
         CAST(count(*) AS BIGINT) AS n1plus_fwd
  FROM bc GROUP BY 1
), cont AS (
  SELECT w, CAST(count(*) AS BIGINT) AS n1plus_bwd FROM bc GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_bigram_types FROM bc
)
SELECT bc.v, bc.w, bc.c AS c_bigram, uv.cv AS c_context,
       floor((greatest(CAST(bc.c AS DOUBLE) - {_KN_D}, 0.0) / uv.cv
              + {_KN_D} * uv.n1plus_fwd / uv.cv
                * (CAST(cont.n1plus_bwd AS DOUBLE) / tot.n_bigram_types))
             * 1000000 + 0.5) / 1000000.0 AS p_kn
FROM bc JOIN uv USING (v) JOIN cont USING (w) CROSS JOIN tot
ORDER BY c_bigram DESC, v, w
LIMIT {_KN_TOP}
""",
)
def ext_ngram_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KNESER-NEY SMOOTHED BIGRAM probabilities (absolute discount
    d={d}) for the corpus's top-{top} bigrams: P_KN(w|v) =
    max(c(vw)-d, 0)/c(v) + d·N1+(v·)/c(v) · N1+(·w)/|bigram types| —
    the interpolated-KN formulation (Kneser & Ney 1995; Chen & Goodman
    1999's winner), whose CONTINUATION probability fixes the add-k
    smoothing ``ext_ngram_lm_train`` ships ("Francisco" is frequent but
    only ever follows "San"; KN scores it by how many contexts it
    completes, not how often it occurs).

    Every ingredient is an exact int64 count over three vocabulary-
    grain aggregates (bigram counts, per-context totals + fan-out,
    per-word fan-in), and P_KN is one closed-form double in identical
    order both engines.  The fan-in/fan-out frames are vocab-sized so
    they broadcast back onto the bigram grain — the corpus is scanned
    once and never reshuffled."""
    docs = table(spark, sf_dir, "documents")
    ts = F.split("text", " ")
    bi = docs.select(ts.alias("ts")).filter(F.size("ts") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ts") - 1),
                lambda i: F.array(F.element_at("ts", i), F.element_at("ts", i + 1)),
            )
        ).alias("pair")
    )
    bc = bi.select(
        F.element_at("pair", 1).alias("v"), F.element_at("pair", 2).alias("w")
    ).groupBy("v", "w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    uv = bc.groupBy("v").agg(
        F.sum("c").cast("long").alias("cv"),
        F.count(F.lit(1)).cast("long").alias("n1plus_fwd"),
    )
    cont = bc.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("n1plus_bwd"))
    tot = bc.agg(F.count(F.lit(1)).cast("long").alias("n_bigram_types"))
    j = (
        bc.join(uv, "v")
        .join(cont, "w")
        .crossJoin(F.broadcast(tot))
    )
    p_kn = (
        F.greatest(F.col("c").cast("double") - _KN_D, F.lit(0.0)) / F.col("cv")
        + F.lit(_KN_D) * F.col("n1plus_fwd") / F.col("cv")
        * (F.col("n1plus_bwd").cast("double") / F.col("n_bigram_types"))
    )
    return (
        j.select(
            "v",
            "w",
            F.col("c").alias("c_bigram"),
            F.col("cv").alias("c_context"),
            (F.floor(p_kn * 1000000 + 0.5) / 1000000.0).alias("p_kn"),
        )
        .orderBy(F.desc("c_bigram"), "v", "w")
        .limit(_KN_TOP)
    )


ext_ngram_kneser_ney.__doc__ = ext_ngram_kneser_ney.__doc__.format(
    d=_KN_D, top=_KN_TOP
)


@register(
    "ext_perplexity_buckets",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang, w AS word
  FROM (SELECT doc_id, lang,
               unnest(regexp_split_to_array(lower(coalesce(text, '')), '\\s+'))
                 AS w
        FROM documents)
  WHERE w <> ''
),
gv AS (SELECT word, CAST(count(*) AS BIGINT) AS cw FROM toks GROUP BY 1),
nw AS (SELECT CAST(sum(cw) AS BIGINT) AS tw FROM gv),
dw AS (SELECT doc_id, lang, word, CAST(count(*) AS BIGINT) AS cs
       FROM toks GROUP BY 1, 2, 3),
dl AS (
  SELECT dw.doc_id, dw.lang, CAST(sum(dw.cs) AS BIGINT) AS wrds,
         list_reduce(list_prepend(0.0, list(
             dw.cs * ln(CAST(tw AS DOUBLE) / gv.cw) ORDER BY dw.word)),
           (p, q) -> p + q) AS sloss
  FROM dw JOIN gv USING (word), nw
  GROUP BY 1, 2
),
sp AS (
  SELECT doc_id, lang,
         CAST(floor(sloss / wrds * 1000000 + 0.5) AS BIGINT) AS spm
  FROM dl WHERE wrds > 0
),
rk AS (
  SELECT lang, spm,
         row_number() OVER (PARTITION BY lang ORDER BY spm, doc_id) AS rk,
         count(*) OVER (PARTITION BY lang) AS nd
  FROM sp
),
bk AS (
  SELECT lang,
         CASE WHEN rk * 3 <= nd THEN 'head'
              WHEN rk * 3 <= 2 * nd THEN 'middle'
              ELSE 'tail' END AS bucket,
         spm
  FROM rk
)
SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
       floor(CAST(min(spm) AS DOUBLE) / 1000000.0 * 1000000 + 0.5) / 1000000.0
         AS min_surprisal,
       floor(CAST(max(spm) AS DOUBLE) / 1000000.0 * 1000000 + 0.5) / 1000000.0
         AS max_surprisal,
       floor(CAST(sum(spm) AS DOUBLE) / count(*) / 1000000.0 * 1000000 + 0.5)
         / 1000000.0 AS avg_surprisal
FROM bk GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def ext_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNET-STYLE PERPLEXITY BUCKETS: per language, rank documents by
    per-word surprisal under the corpus unigram LM and cut into
    head / middle / tail thirds — the CCNet (Wenzek et al.) curation
    split where "head" (lowest perplexity = most fluent under the
    reference model) feeds pretraining first and "tail" gets audited.
    Reports each bucket's size and surprisal envelope per language.

    Per-document surprisal folds over the document's BOUNDED word
    vocabulary in word order (exact counts x identical ln terms), is
    micro-quantized to an exact int BEFORE ranking (so the per-lang
    (surprisal, doc_id) order is engine-identical), and the bucket cut
    is pure integer rank algebra (rk*3 vs n).  Bucket aggregates are
    then exact integer sums — no unordered double accumulation at the
    corpus grain anywhere.  Scale: two (doc, word) combines + one
    lang-partitioned rank; per-doc state bounded by the vocabulary."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
        ).alias("word"),
    ).filter(F.col("word") != "")
    gv = toks.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("cw"))
    nw = gv.agg(F.sum("cw").cast("long").alias("tw"))
    dw = toks.groupBy("doc_id", "lang", "word").agg(
        F.count(F.lit(1)).cast("long").alias("cs")
    )
    from ..operators.monitoring import _ordfold

    term = F.col("cs") * F.log(F.col("tw").cast("double") / F.col("cw"))
    dl = (
        dw.join(F.broadcast(gv), "word")
        .crossJoin(F.broadcast(nw))
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("cs").cast("long").alias("wrds"),
            _ordfold(F.col("word"), term).alias("sloss"),
        )
    )
    sp = dl.filter(F.col("wrds") > 0).select(
        "doc_id",
        "lang",
        F.floor(F.col("sloss") / F.col("wrds") * 1000000 + 0.5)
        .cast("long")
        .alias("spm"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy("spm", "doc_id")
    wc = Window.partitionBy("lang")
    rk = sp.select(
        "lang",
        "spm",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wc).alias("nd"),
    )
    bk = rk.select(
        "lang",
        F.when(F.col("rk") * 3 <= F.col("nd"), "head")
        .when(F.col("rk") * 3 <= 2 * F.col("nd"), "middle")
        .otherwise("tail")
        .alias("bucket"),
        "spm",
    )
    q6 = lambda x: F.floor(x * 1000000 + 0.5) / 1000000.0  # noqa: E731
    return (
        bk.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            q6(F.min("spm").cast("double") / 1000000.0).alias("min_surprisal"),
            q6(F.max("spm").cast("double") / 1000000.0).alias("max_surprisal"),
            q6(
                F.sum("spm").cast("double") / F.count(F.lit(1)) / 1000000.0
            ).alias("avg_surprisal"),
        )
        .orderBy("lang", "bucket")
    )
