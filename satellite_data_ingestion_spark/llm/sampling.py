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


# DSIR (Xie et al. 2023): hashed-feature importance resampling toward a
# target distribution.  B buckets bound the model size; K docs selected.
_DSIR_BUCKETS = 512
_DSIR_K = 100
_DSIR_TARGET_LANG = "en"


@register(
    "ext_dsir_sample",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang,
         CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT)
           % {_DSIR_BUCKETS} AS b
  FROM (SELECT doc_id, lang, unnest(str_split(text, ' ')) AS tok
        FROM documents)
),
raw AS (SELECT b, count(*) AS r FROM toks GROUP BY b),
tgt AS (SELECT b, count(*) AS t FROM toks
        WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY b),
tot AS (SELECT (SELECT count(*) FROM toks) AS nr,
               (SELECT count(*) FROM toks
                WHERE lang = '{_DSIR_TARGET_LANG}') AS nt),
model AS (
  SELECT raw.b,
         ln((coalesce(t, 0) + 1) / (nt + {_DSIR_BUCKETS}.0))
           - ln((r + 1) / (nr + {_DSIR_BUCKETS}.0)) AS ratio
  FROM raw LEFT JOIN tgt ON raw.b = tgt.b, tot
),
scored AS (
  SELECT doc_id, lang, round(sum(ratio), 4) AS dsir_weight
  FROM toks JOIN model USING (b)
  GROUP BY doc_id, lang
)
SELECT doc_id, lang, dsir_weight,
       row_number() OVER (ORDER BY dsir_weight DESC, doc_id)
         <= {_DSIR_K} AS selected
FROM scored
""",
)
def ext_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (Xie et al., NeurIPS 2023 — the
    published recipe for tilting a raw crawl toward a target domain):
    hashed unigram features into B buckets, a bag-of-buckets model for
    the target slice (here ``lang = 'en'``) and the raw corpus, and a
    per-document importance weight ``sum_tokens[ln p_target(b) −
    ln p_raw(b)]`` (Laplace-smoothed); the top-K by weight are the
    selected training subset.

    Scale shape (mirrors ext_lm_score): ONE token-histogram shuffle
    builds both bucket models, the B-row model (B = {_DSIR_BUCKETS})
    broadcasts back onto the token stream so the corpus never
    reshuffles for scoring, and selection avoids a single-partition
    global window: the K-th (weight, doc_id) threshold comes from a
    TakeOrderedAndProject heap (bounded K-row collect) and the selected
    flag is a broadcast comparison — at 100 TB nothing global ever
    sorts.  md5-derived buckets keep the features engine-independent;
    the weight rounds to 4 decimals before ranking so both engines rank
    identical keys."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split("text", " ")).alias("tok"),
    ).withColumn(
        "b",
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
        % _DSIR_BUCKETS,
    )
    raw = toks.groupBy("b").agg(F.count(F.lit(1)).alias("r"))
    tgt = (
        toks.filter(F.col("lang") == _DSIR_TARGET_LANG)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    tot = toks.agg(
        F.count(F.lit(1)).alias("nr"),
        F.count(
            F.when(F.col("lang") == _DSIR_TARGET_LANG, 1)
        ).alias("nt"),
    )
    model = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("t"), F.lit(0)) + 1)
                    / (F.col("nt") + float(_DSIR_BUCKETS))
                )
                - F.log(
                    (F.col("r") + 1) / (F.col("nr") + float(_DSIR_BUCKETS))
                )
            ).alias("ratio"),
        )
    )
    scored = (
        toks.join(F.broadcast(model), "b")
        .groupBy("doc_id", "lang")
        .agg(F.round(F.sum("ratio"), 4).alias("dsir_weight"))
    )
    # K-th (weight desc, doc_id asc) threshold via TakeOrderedAndProject
    # heaps — bounded K-row collect, no single-partition window.
    kth = scored.orderBy(
        F.desc("dsir_weight"), F.asc("doc_id")
    ).limit(_DSIR_K).collect()[-1]
    selected = (F.col("dsir_weight") > kth.dsir_weight) | (
        (F.col("dsir_weight") == kth.dsir_weight)
        & (F.col("doc_id") <= kth.doc_id)
    )
    return scored.select(
        "doc_id", "lang", "dsir_weight", selected.alias("selected")
    )


_TEMP_ALPHA_SQRT = True  # alpha = 0.5 rendered as sqrt (engine-identical)
_TEMP_KEEP = 200


@register(
    "ext_mix_temperature",
    oracle=f"""
WITH census AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
), denom AS (
  SELECT sum(sqrt(CAST(n_docs AS DOUBLE))) AS denom FROM census
), targets AS (
  SELECT lang,
         CAST(floor({_TEMP_KEEP}.0 * (sqrt(CAST(n_docs AS DOUBLE)) / denom)) AS BIGINT) AS take
  FROM census CROSS JOIN denom
), ranked AS (
  SELECT lang, doc_id,
         CAST(row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
  FROM documents
)
SELECT r.lang, r.doc_id, r.rk
FROM ranked r JOIN targets t ON r.lang = t.lang
WHERE r.rk <= t.take
""",
)
def ext_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-scaled mixture sampling (alpha = 0.5): per-language
    target counts proportional to n_lang^alpha instead of n_lang — the
    multilingual-pretraining rebalance (mBERT/XLM-R exponential
    smoothing; also the T=2 mixture of PaLM) that keeps high-resource
    languages from drowning the tail.  The corpus's lang distribution is
    genuinely skewed (en ~41%, others ~14-15% each), so the flattening
    is visible: en's share of the sample drops toward sqrt-proportional.

    Per-language take = floor(KEEP * sqrt(n_lang) / sum(sqrt(n_lang)));
    selection inside each language is content-hash order (deterministic,
    engine-independent — the ext_group_sample discipline).

    Scale shape: the census is one map-side-combined aggregate
    (|langs| rows), its sqrt-sum a 1-row broadcast, so targets never
    touch the corpus; the corpus itself makes ONE exchange on lang where
    a LITERAL rank <= KEEP predicate plans as WindowGroupLimit
    (per-partition top-KEEP heaps — the skew clip), and the dynamic
    per-language take applies AFTER the broadcast-join against targets.
    Without that literal pre-clip the dominant language's whole corpus
    would stream through one window task at 100 TB."""
    docs = table(spark, sf_dir, "documents")
    census = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    denom = census.agg(
        F.sum(F.sqrt(F.col("n_docs").cast("double"))).alias("denom")
    )
    targets = (
        census.join(F.broadcast(denom))
        .select(
            "lang",
            F.floor(
                F.lit(float(_TEMP_KEEP))
                * (F.sqrt(F.col("n_docs").cast("double")) / F.col("denom"))
            )
            .cast("long")
            .alias("take"),
        )
    )
    key = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(key, F.col("doc_id"))
    ranked = (
        docs.select("lang", "doc_id")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _TEMP_KEEP)  # literal → WindowGroupLimit
    )
    return (
        ranked.join(F.broadcast(targets), "lang")
        .filter(F.col("rk") <= F.col("take"))
        .select("lang", "doc_id", "rk")
    )


_STRAT_TRAIN = 0.8
_STRAT_VALID = 0.1


@register(
    "ext_stratified_split",
    oracle=f"""
WITH ranked AS (
  SELECT lang, doc_id,
         CAST(row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk,
         CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n_lang
  FROM documents
), assigned AS (
  SELECT lang, doc_id,
         CASE WHEN rk <= CAST(floor(n_lang * {_STRAT_TRAIN}) AS BIGINT) THEN 'train'
              WHEN rk <= CAST(floor(n_lang * {_STRAT_TRAIN}) AS BIGINT)
                       + CAST(floor(n_lang * {_STRAT_VALID}) AS BIGINT) THEN 'valid'
              ELSE 'test' END AS split
  FROM ranked
)
SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS min_id,
       CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM assigned GROUP BY 1, 2
""",
)
def ext_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRATIFIED train/valid/test split: every LANGUAGE is split at
    exactly floor(n·0.8)/floor(n·0.1)/rest — the guarantee the
    modulo-hash split (``ext_dataset_split``) does NOT make (a global
    hash split leaves small strata over- or under-represented by
    binomial noise, which for a 1%-share language can swing its eval
    set by double digits).  Membership inside a stratum is content-hash
    order — deterministic, engine-independent, no RNG state.

    Returns the (lang, split) census plus id-checksums so the oracle
    pins the ASSIGNMENT, not just the counts.

    Scale shape: one exchange on lang; the literal global rank is per
    stratum, so WindowGroupLimit does not apply (every row gets a rank),
    but the rank window and the stratum-size window share the single
    exchange.  For a dominant stratum at 100 TB, pre-aggregate sizes
    (census broadcast) and assign by hash-bucket quantile instead —
    ext_mix_temperature's shape."""
    docs = table(spark, sf_dir, "documents")
    key = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(key, F.col("doc_id"))
    sized = docs.select(
        "lang",
        "doc_id",
        F.row_number().over(w).cast("long").alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("lang"))
        .cast("long")
        .alias("n_lang"),
    )
    n_train = F.floor(F.col("n_lang") * _STRAT_TRAIN).cast("long")
    n_valid = F.floor(F.col("n_lang") * _STRAT_VALID).cast("long")
    assigned = sized.select(
        "lang",
        "doc_id",
        F.when(F.col("rk") <= n_train, "train")
        .when(F.col("rk") <= n_train + n_valid, "valid")
        .otherwise("test")
        .alias("split"),
    )
    return assigned.groupBy("lang", "split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("doc_id").cast("long").alias("min_id"),
        F.sum("doc_id").cast("long").alias("id_sum"),
    )


_WS_K = 100


@register(
    "ext_weighted_sample",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
         ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1.0)
            / 4294967296.0) / n_chars AS k
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, weight,
       floor(k * 1000000 + 0.5) / 1000000.0 AS sample_key
FROM keyed
ORDER BY k DESC, doc_id
LIMIT {_WS_K}
""",
)
def ext_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED sampling without replacement (Efraimidis & Spirakis
    2006): each item draws key u^(1/w) — here ranked by the monotone
    equivalent ln(u)/w — and the global top-K IS an exact weighted
    sample; long documents (weight = n_chars) are proportionally more
    likely, the standard size-biased corpus draw.  The uniform u is the
    engine-shared md5-prefix hash (+1 to dodge ln(0)), so the "random"
    draw is deterministic, reproducible, and hash-checkable — the
    no-rand() discipline of every sampler here.

    One projection + TakeOrderedAndProject heaps: no shuffle, no sort of
    the corpus — the distributed weighted-reservoir algorithm verbatim
    (each partition keeps K candidates, the driver merges heaps)."""
    docs = table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.expr(
            "cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)"
        )
        + 1.0
    ) / 4294967296.0
    k = F.log(u) / F.col("n_chars")
    keyed = docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("weight"),
        k.alias("k"),
    )
    return (
        keyed.orderBy(F.desc("k"), "doc_id")
        .limit(_WS_K)
        .select(
            "doc_id",
            "weight",
            (F.floor(F.col("k") * 1000000 + 0.5) / 1000000.0).alias("sample_key"),
        )
    )


@register(
    "ext_psi_split_drift",
    oracle="""
WITH tagged AS (
  SELECT lang, CASE WHEN doc_id % 10 < 8 THEN 'train' ELSE 'heldout' END AS split
  FROM documents
), c AS (
  SELECT lang,
         CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
         CAST(sum(CASE WHEN split = 'heldout' THEN 1 ELSE 0 END) AS BIGINT) AS n_held
  FROM tagged GROUP BY 1
), t AS (
  SELECT CAST(sum(n_train) AS BIGINT) AS tot_train,
         CAST(sum(n_held) AS BIGINT) AS tot_held
  FROM c
), terms AS (
  SELECT c.lang,
         ((CAST(c.n_train AS DOUBLE) / t.tot_train)
          - (CAST(c.n_held AS DOUBLE) / t.tot_held))
         * ln((CAST(c.n_train AS DOUBLE) / t.tot_train)
              / (CAST(c.n_held AS DOUBLE) / t.tot_held)) AS psi_term
  FROM c CROSS JOIN t
)
SELECT CAST((SELECT count(*) FROM c) AS BIGINT) AS n_buckets,
       floor(list_reduce(list_prepend(0.0, list(psi_term ORDER BY lang)),
                         (acc, x) -> acc + x) * 1000000 + 0.5)
         / 1000000.0 AS psi
FROM terms
""",
)
def ext_psi_split_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POPULATION STABILITY INDEX between the train and heldout splits
    over the language distribution — the ML-ops drift metric (PSI < 0.1
    = stable, > 0.25 = the split is NOT exchangeable and eval numbers
    will mislead): exactly the audit ``ext_stratified_split`` makes
    unnecessary by construction, run HERE against the modulo split
    (``ext_dataset_split``) to quantify its binomial wobble.

    PSI is a float sum over buckets, so the terms fold SEQUENTIALLY
    over the lang-sorted list (the ext_kl_divergence discipline);
    counts are exact ints, ratios identical doubles both engines."""
    docs = table(spark, sf_dir, "documents")
    split = F.when(F.col("doc_id") % 10 < 8, "train").otherwise("heldout")
    c = docs.select("lang", split.alias("split")).groupBy("lang").agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
        .cast("long")
        .alias("n_train"),
        F.sum(F.when(F.col("split") == "heldout", 1).otherwise(0))
        .cast("long")
        .alias("n_held"),
    )
    t = c.agg(
        F.sum("n_train").cast("long").alias("tot_train"),
        F.sum("n_held").cast("long").alias("tot_held"),
    )
    p = F.col("n_train").cast("double") / F.col("tot_train")
    q = F.col("n_held").cast("double") / F.col("tot_held")
    terms = c.join(F.broadcast(t)).select(
        "lang", ((p - q) * F.log(p / q)).alias("psi_term")
    )
    folded = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("lang", "psi_term"))),
                lambda s: s.getField("psi_term"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("psi_raw"),
    )
    return folded.select(
        "n_buckets",
        (F.floor(F.col("psi_raw") * 1000000 + 0.5) / 1000000.0).alias("psi"),
    )


_NEG_OFFSETS = (1, 2)  # hash-ring hops per anchor (k=2 negatives)


@register(
    "ext_negative_sampling",
    oracle=f"""
WITH r AS (
  SELECT doc_id, lang,
         CAST(row_number() OVER (
           ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT), doc_id) AS BIGINT) AS rk,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM documents
)
SELECT a.doc_id, CAST(s.s AS BIGINT) AS hop, b.doc_id AS neg_id,
       (a.lang = b.lang) AS same_lang
FROM r a
CROSS JOIN (SELECT unnest([{", ".join(str(s) for s in _NEG_OFFSETS)}]) AS s) s
JOIN r b ON b.rk = ((a.rk - 1 + s.s) % a.n) + 1
ORDER BY a.doc_id, hop
""",
)
def ext_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEGATIVE SAMPLING for contrastive training: {k} pseudo-random
    negatives per document via the HASH RING — rank every doc by
    md5(doc_id) (the shared cross-engine hash recipe) and take the next
    {k} docs on the ring.  Hash order decorrelates ring neighbors from
    any data order, every doc appears as a negative exactly {k} times
    (a perfect derangement — no coupon-collector variance), and the
    draw is reproducible across engines and runs with NO seed state;
    the complement of ``ext_hard_negatives`` (uniform easies vs
    near-miss hards — contrastive batches want both).

    Scale shape: the global hash rank comes from distributed_rank
    (range-partition + broadcast offsets, never a single-task window);
    the ring hop is an equi self-join on the shifted rank — one
    co-partitioned join per corpus, volume exactly {k}·N rows."""
    from ..operators.ranking import distributed_rank

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    r = distributed_rank(docs.withColumn("h", h), ["h", "doc_id"]).select(
        "doc_id", "lang", F.col("_rk").alias("rk"), F.col("_n_total").alias("n")
    )
    a = r.select(
        "doc_id",
        "lang",
        "rk",
        "n",
        F.explode(F.array(*[F.lit(s) for s in _NEG_OFFSETS])).alias("hop"),
    ).withColumn("nrk", (F.col("rk") - 1 + F.col("hop")) % F.col("n") + 1)
    b = r.select(
        F.col("rk").alias("nrk"),
        F.col("doc_id").alias("neg_id"),
        F.col("lang").alias("neg_lang"),
    )
    return (
        a.join(b, "nrk")
        .select(
            "doc_id",
            F.col("hop").cast("long").alias("hop"),
            "neg_id",
            (F.col("lang") == F.col("neg_lang")).alias("same_lang"),
        )
        .orderBy("doc_id", "hop")
    )


ext_negative_sampling.__doc__ = ext_negative_sampling.__doc__.format(
    k=len(_NEG_OFFSETS)
)


_CV_FOLDS = 5


@register(
    "ext_crossval_folds",
    oracle=f"""
WITH d AS (
  SELECT doc_id % {_CV_FOLDS} AS fold,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS en
  FROM documents
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_all,
         CAST(sum(en) AS BIGINT) AS en_all
  FROM d
)
SELECT CAST(fold AS BIGINT) AS fold,
       CAST(count(*) AS BIGINT) AS n_val,
       CAST(tot.n_all - count(*) AS BIGINT) AS n_train,
       floor(CAST(sum(en) AS DOUBLE) / count(*) * 1000000 + 0.5)
         / 1000000.0 AS val_en_rate,
       floor(CAST(tot.en_all - sum(en) AS DOUBLE) / (tot.n_all - count(*))
             * 1000000 + 0.5) / 1000000.0 AS train_en_rate
FROM d CROSS JOIN tot
GROUP BY fold, tot.n_all, tot.en_all
ORDER BY fold
""",
)
def ext_crossval_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-FOLD CROSS-VALIDATION assignment ({k} folds keyed on doc_id —
    deterministic, no RNG state, every doc in exactly one validation
    fold) with the per-fold balance audit: validation size, implied
    train size, and the en-share of each side — the leakage-free
    evaluation layout beside ``ext_dataset_split`` (one split) and
    ``ext_cluster_stratified_split`` (leakage-safe grouping); a fold
    whose val_en_rate drifts from its train_en_rate flags an unlucky
    key-based partition before any model trains on it.

    The fold column is a pure projection (downstream readers filter
    scan-side, k passes over the same data, never a copy per fold);
    the audit itself is one k-row aggregate + a broadcast 1-row total."""
    docs = table(spark, sf_dir, "documents")
    d = docs.select(
        (F.col("doc_id") % _CV_FOLDS).alias("fold"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("en"),
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_all"),
        F.sum("en").cast("long").alias("en_all"),
    )
    g = d.crossJoin(F.broadcast(tot)).groupBy("fold", "n_all", "en_all").agg(
        F.count(F.lit(1)).cast("long").alias("n_val"),
        F.sum("en").cast("long").alias("en_val"),
    )
    r6l = lambda x: F.floor(x * 1000000 + 0.5) / 1000000.0  # noqa: E731
    return g.select(
        F.col("fold").cast("long").alias("fold"),
        "n_val",
        (F.col("n_all") - F.col("n_val")).cast("long").alias("n_train"),
        r6l(F.col("en_val").cast("double") / F.col("n_val")).alias("val_en_rate"),
        r6l(
            (F.col("en_all") - F.col("en_val")).cast("double")
            / (F.col("n_all") - F.col("n_val"))
        ).alias("train_en_rate"),
    ).orderBy("fold")


ext_crossval_folds.__doc__ = ext_crossval_folds.__doc__.format(k=_CV_FOLDS)


_DOREMI_ETA = 0.5  # mirror-ascent step size (DoReMi's eta)


@register(
    "ext_domain_mixture_doremi",
    oracle=f"""
WITH toks AS (
  SELECT source, w AS word
  FROM (SELECT source,
               unnest(regexp_split_to_array(lower(coalesce(text, '')), '\\s+'))
                 AS w
        FROM documents)
  WHERE w <> ''
),
gv AS (SELECT word, CAST(count(*) AS BIGINT) AS cw FROM toks GROUP BY 1),
nw AS (SELECT CAST(sum(cw) AS BIGINT) AS tw FROM gv),
docs AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
         FROM documents GROUP BY 1),
sv AS (SELECT source, word, CAST(count(*) AS BIGINT) AS cs
       FROM toks GROUP BY 1, 2),
dl AS (
  SELECT sv.source,
         CAST(sum(sv.cs) AS BIGINT) AS wrds,
         list_reduce(list_prepend(0.0, list(
             sv.cs * ln(CAST(tw AS DOUBLE) / gv.cw) ORDER BY sv.word)),
           (p, q) -> p + q) AS sloss
  FROM sv JOIN gv USING (word), nw
  GROUP BY sv.source
),
gl AS (
  SELECT list_reduce(list_prepend(0.0, list(
             cw * ln(CAST(tw AS DOUBLE) / cw) ORDER BY word)),
           (p, q) -> p + q) / tw AS lbar
  FROM gv, nw GROUP BY tw
),
ex AS (
  SELECT dl.source, docs.n_docs, dl.wrds,
         CAST(dl.wrds AS DOUBLE) / tw AS w0,
         dl.sloss / dl.wrds AS surprisal,
         dl.sloss / dl.wrds - lbar AS excess,
         (CAST(dl.wrds AS DOUBLE) / tw)
           * exp({_DOREMI_ETA} * (dl.sloss / dl.wrds - lbar)) AS w_un
  FROM dl JOIN docs USING (source), nw, gl
),
z AS (
  SELECT list_reduce(list_prepend(0.0, list(w_un ORDER BY source)),
                     (p, q) -> p + q) AS z
  FROM ex
)
SELECT source, n_docs,
       floor(w0 * 1000000 + 0.5) / 1000000.0 AS w0,
       floor(surprisal * 1000000 + 0.5) / 1000000.0 AS surprisal,
       floor(excess * 1000000 + 0.5) / 1000000.0 AS excess,
       floor(w_un / z * 1000000 + 0.5) / 1000000.0 AS w1
FROM ex, z
ORDER BY source
""",
)
def ext_domain_mixture_doremi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE DoReMi MIRROR-ASCENT STEP on the domain mixture: reweight
    each source by exp(eta * excess-loss) around its token-share prior
    — the Group-DRO update DoReMi (Xie et al. 2023) iterates to find
    pretraining domain weights.  Domains whose text is HARDER than the
    corpus average under the reference model (here: the corpus unigram
    LM, the engine's standing proxy reference) gain weight; easy
    domains shed it.  Reports prior w0, per-word surprisal, excess vs
    the corpus mean, and the normalized next-step weight w1.

    The corpus vocabulary is BOUNDED (31 words), so per-domain
    surprisal sums fold over word order (exact int counts * identical
    ln terms), the corpus baseline is one fold, and the softmax-style
    normalizer folds over source order — everything past the two
    (source, word) combines is |domains|-sized.  eta = 0.5 literal in
    both engines."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(
            F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
        ).alias("word"),
    ).filter(F.col("word") != "")
    gv = toks.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("cw"))
    nw = gv.agg(F.sum("cw").cast("long").alias("tw"))
    census = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    sv = toks.groupBy("source", "word").agg(
        F.count(F.lit(1)).cast("long").alias("cs")
    )
    from ..operators.monitoring import _ordfold

    term = F.col("cs") * F.log(F.col("tw").cast("double") / F.col("cw"))
    dl = (
        sv.join(F.broadcast(gv), "word")
        .crossJoin(F.broadcast(nw))
        .groupBy("source")
        .agg(
            F.sum("cs").cast("long").alias("wrds"),
            _ordfold(F.col("word"), term).alias("sloss"),
        )
    )
    gl = gv.crossJoin(F.broadcast(nw)).agg(
        (
            _ordfold(
                F.col("word"),
                F.col("cw") * F.log(F.col("tw").cast("double") / F.col("cw")),
            )
            / F.first("tw")
        ).alias("lbar")
    )
    ex = (
        dl.join(F.broadcast(census), "source")
        .crossJoin(F.broadcast(nw))
        .crossJoin(F.broadcast(gl))
        .select(
            "source",
            "n_docs",
            "wrds",
            (F.col("wrds").cast("double") / F.col("tw")).alias("w0"),
            (F.col("sloss") / F.col("wrds")).alias("surprisal"),
            (F.col("sloss") / F.col("wrds") - F.col("lbar")).alias("excess"),
            (
                (F.col("wrds").cast("double") / F.col("tw"))
                * F.exp(
                    _DOREMI_ETA * (F.col("sloss") / F.col("wrds") - F.col("lbar"))
                )
            ).alias("w_un"),
        )
    )
    z = ex.agg(_ordfold(F.col("source"), F.col("w_un")).alias("z"))
    q6 = lambda x: F.floor(x * 1000000 + 0.5) / 1000000.0  # noqa: E731
    return (
        ex.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            q6(F.col("w0")).alias("w0"),
            q6(F.col("surprisal")).alias("surprisal"),
            q6(F.col("excess")).alias("excess"),
            q6(F.col("w_un") / F.col("z")).alias("w1"),
        )
        .orderBy("source")
    )
