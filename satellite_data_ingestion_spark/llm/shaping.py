"""Dataset-shaping operators: the steps between "filtered corpus" and
"training batches" in a large-scale LLM data pipeline.

- ``ext_repetition_score``  Gopher-style intra-document repetition
                            signals (duplicate-token ratio, top-bigram
                            dominance) — the quality gate that catches
                            boilerplate/spam that inter-doc dedup misses.
- ``ext_doc_chunk``         overlapping fixed-size token windows per
                            document (context-length chunking for
                            training/embedding).
- ``ext_seq_pack``          contiguous sequence packing: deterministic
                            running-sum binning of documents into fixed
                            token budgets per source.
- ``ext_mix_sample``        deterministic mixture sampling: per-source
                            keep rates applied via an engine-independent
                            md5 threshold (no RNG state to ship).

All four are pure DataFrame plans with DuckDB oracles; every ratio is
rounded identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.hypothesis import q4  # shared half-up 4-decimal rounding
from ..registry import register

_CHUNK_SIZE = 32
_CHUNK_STRIDE = 24
_PACK_BUDGET = 256
# Mixture weights: per-source keep probability, applied deterministically.
_MIX_EVEN_RATE = 1.0   # src0, src2, ... (kept fully)
_MIX_ODD_RATE = 0.25   # src1, src3, ... (downsampled 4x)

# The quarter-valued quality composite as ONE shared SQL sum: three oracles
# score with it (preference pairs, best-of-n, length-bias audit) and a
# hand-copied variant drifting from ext_quality_score's thresholds would be
# the hardest parity break to localize (round-14 review).
_QUALITY_SUM_SQL = """(CASE WHEN len(str_split(text, ' ')) >= 5 THEN 0.25 ELSE 0 END)
             + (CASE WHEN list_sum(list_transform(str_split(text, ' '),
                        t -> CAST(length(t) AS DOUBLE)))
                     / len(str_split(text, ' ')) <= 12.0 THEN 0.25 ELSE 0 END)
             + (CASE WHEN CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))
                        AS DOUBLE) / length(text) <= 0.2 THEN 0.25 ELSE 0 END)
             + (CASE WHEN CAST(len(list_distinct(str_split(text, ' ')))
                        AS DOUBLE) / len(str_split(text, ' ')) >= 0.3
                THEN 0.25 ELSE 0 END)"""


@register(
    "ext_repetition_score",
    oracle="""
WITH d AS (
  SELECT doc_id, str_split(text, ' ') AS toks, len(str_split(text, ' ')) AS n
  FROM documents
),
bi AS (
  SELECT doc_id, max(c) AS top_bigram_n
  FROM (
    SELECT doc_id, bigram, count(*) AS c
    FROM (
      SELECT doc_id,
             unnest(list_transform(range(1, n), i -> toks[i] || ' ' || toks[i + 1])) AS bigram
      FROM d
    )
    GROUP BY doc_id, bigram
  )
  GROUP BY doc_id
)
SELECT d.doc_id,
       d.n AS n_tokens,
       round(1.0 - CAST(len(list_distinct(d.toks)) AS DOUBLE) / d.n, 6) AS dup_token_ratio,
       CASE WHEN d.n < 2 THEN NULL
            ELSE round(CAST(bi.top_bigram_n AS DOUBLE) / (d.n - 1), 6) END AS top_bigram_ratio
FROM d LEFT JOIN bi ON d.doc_id = bi.doc_id
""",
)
def ext_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition signals (the Gopher repetition rules'
    Spark shape): duplicate-token ratio (1 - distinct/total) and the
    dominance of the single most frequent bigram.  High values flag
    boilerplate, keyword spam and template text that document-level
    dedup cannot catch because each copy is unique.

    Plan shape: the token ratios are pure projections; the bigram
    dominance explodes bigrams and takes two hash aggregates keyed on
    doc_id — linear, map-side-combinable, no self-join anywhere."""
    docs = table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.split("text", " ").alias("toks"),
        F.size(F.split("text", " ")).alias("n"),
    )
    return repetition_scores(d)


def repetition_scores(d: DataFrame) -> DataFrame:
    """Repetition signals over any (doc_id, toks, n) frame — see
    :func:`ext_repetition_score` for semantics."""
    # Guard n >= 2 BEFORE generating bigram indices: Spark's
    # sequence(1, 0) auto-steps DOWN to [1, 0] and element_at(toks, 0)
    # throws — a single-token document would crash the query (the
    # oracle's range(1, 1) is just empty).
    bigrams = d.filter(F.col("n") >= 2).select(
        "doc_id",
        "n",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
            )
        ).alias("bigram"),
    )
    top_bi = (
        bigrams.groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_n"))
    )
    return (
        d.join(top_bi, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            F.round(
                1.0 - F.size(F.array_distinct("toks")).cast("double") / F.col("n"), 6
            ).alias("dup_token_ratio"),
            F.when(F.col("n") < 2, F.lit(None).cast("double"))
            .otherwise(
                F.round(F.col("top_bigram_n").cast("double") / (F.col("n") - 1), 6)
            )
            .alias("top_bigram_ratio"),
        )
    )


@register(
    "ext_doc_chunk",
    oracle=f"""
SELECT doc_id,
       CAST((s - 1) / {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       array_to_string(list_slice(toks, s, s + {_CHUNK_SIZE} - 1), ' ') AS chunk_text,
       len(list_slice(toks, s, s + {_CHUNK_SIZE} - 1)) AS n_tokens
FROM (
  SELECT doc_id, toks, unnest(range(1, len(toks) + 1, {_CHUNK_STRIDE})) AS s
  FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents)
)
""",
)
def ext_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking: every document becomes
    ceil(n/stride) windows of up to {size} tokens starting every
    {stride} tokens (size > stride → consecutive chunks overlap, the
    standard context-window prep for embedding / training readers).

    One generate-explode projection — no shuffle at all; chunk count
    scales with corpus token count, not document count, and each chunk
    row carries its provenance (doc_id, chunk_idx)."""
    docs = table(spark, sf_dir, "documents")
    d = docs.select("doc_id", F.split("text", " ").alias("toks"))
    # starts are 1-based so Spark slice() and DuckDB list_slice() agree.
    starts = F.explode(
        F.sequence(F.lit(1), F.size("toks"), F.lit(_CHUNK_STRIDE))
    ).alias("s")
    chunk = F.slice("toks", F.col("s"), F.lit(_CHUNK_SIZE))
    return (
        d.select("doc_id", "toks", starts)
        .select(
            "doc_id",
            ((F.col("s") - 1) / _CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
            F.size(chunk).alias("n_tokens"),
        )
    )


_PACK_SHARDS = 4


@register(
    "ext_seq_pack",
    oracle=f"""
SELECT doc_id, source, shard, n_tokens,
       CAST(floor(coalesce(cum_before, 0) / {_PACK_BUDGET}.0) AS BIGINT) AS bin_id,
       CAST(coalesce(cum_before, 0) - CAST(floor(coalesce(cum_before, 0) / {_PACK_BUDGET}.0) AS BIGINT) * {_PACK_BUDGET} AS BIGINT) AS offset_in_bin
FROM (
  SELECT doc_id, source, doc_id % {_PACK_SHARDS} AS shard,
         len(str_split(text, ' ')) AS n_tokens,
         sum(len(str_split(text, ' '))) OVER (
           PARTITION BY source, doc_id % {_PACK_SHARDS} ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cum_before
  FROM documents
)
""",
)
def ext_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous sequence packing: assign documents (in deterministic
    doc_id order) to fixed token-budget bins via an exclusive running
    token sum — the shuffle-light form of training-batch packing.  A
    document whose tokens straddle a budget boundary stays in the bin
    its first token falls in (bins can overflow by at most one document;
    readers that need hard budgets split the straddler with
    ext_doc_chunk).

    Scale: `source` alone is low-cardinality, so the window key is
    sub-sharded with an engine-independent deterministic shard
    (doc_id % P) — each (source, shard) window is 1/P of a source and P
    scales with corpus size; bins namespace by (source, shard), which
    packing semantics permit (bins never needed to span shards)."""
    docs = table(spark, sf_dir, "documents")
    n = F.size(F.split("text", " "))
    shard = F.col("doc_id") % _PACK_SHARDS
    w = (
        Window.partitionBy("source", shard)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(n).over(w), F.lit(0))
    bin_id = F.floor(cum_before / float(_PACK_BUDGET)).cast("bigint")
    return docs.select(
        "doc_id",
        "source",
        shard.alias("shard"),
        n.alias("n_tokens"),
        bin_id.alias("bin_id"),
        (cum_before - bin_id * _PACK_BUDGET).alias("offset_in_bin"),
    )


def _rate_hex(rate: float) -> str:
    """Keep threshold string; md5 4-hex prefixes strictly below it are
    kept.  Lowercase hex compares identically in Spark and DuckDB, so
    the sample is engine-independent and reproducible with no RNG.
    rate >= 1.0 → 'g', which every hex string sorts below (keep all);
    otherwise the rate maps onto the 65536 4-digit prefixes."""
    if rate >= 1.0:
        return "g"
    return format(int(rate * 65536), "04x")


@register(
    "ext_mix_sample",
    oracle=f"""
SELECT source,
       count(*) AS n_total,
       count(*) FILTER (
         WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
               CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                    THEN '{_rate_hex(_MIX_EVEN_RATE)}' ELSE '{_rate_hex(_MIX_ODD_RATE)}' END
       ) AS n_kept
FROM documents
GROUP BY source
""",
)
def ext_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture sampling: each source gets a keep rate
    (here: even-numbered sources 100%, odd 25% — the up/down-weighting
    step that turns a raw crawl into a training mixture), applied by
    comparing an md5 prefix of the stable doc key against the rate's
    hex threshold.  Engine-independent (md5, not xxhash64), stateless,
    reproducible, and a pure scan-side projection — the filter costs
    one hash per row and no shuffle; the census here is one aggregate.
    """
    docs = table(spark, sf_dir, "documents")
    rate_hex = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 0, F.lit(_rate_hex(_MIX_EVEN_RATE))
    ).otherwise(F.lit(_rate_hex(_MIX_ODD_RATE)))
    kept = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4) < rate_hex
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(kept, 1)).alias("n_kept"),
    )


_SFT_SYSTEM = "You are a helpful assistant."
_SFT_PROMPT_CHARS = 100


@register(
    "ext_instruction_format",
    oracle=f"""
SELECT doc_id,
       '<|im_start|>system\n{_SFT_SYSTEM}<|im_end|>\n<|im_start|>user\n'
         || substr(text, 1, {_SFT_PROMPT_CHARS})
         || '<|im_end|>\n<|im_start|>assistant\n'
         || substr(text, {_SFT_PROMPT_CHARS} + 1)
         || '<|im_end|>' AS rendered,
       CAST(length('<|im_start|>system\n{_SFT_SYSTEM}<|im_end|>\n<|im_start|>user\n')
            + length(substr(text, 1, {_SFT_PROMPT_CHARS}))
            + length('<|im_end|>\n<|im_start|>assistant\n') AS BIGINT) AS prompt_len,
       CAST(length(substr(text, {_SFT_PROMPT_CHARS} + 1)) + length('<|im_end|>') AS BIGINT) AS completion_len,
       round(CAST(length(substr(text, {_SFT_PROMPT_CHARS} + 1)) + length('<|im_end|>') AS DOUBLE)
             / (length('<|im_start|>system\n{_SFT_SYSTEM}<|im_end|>\n<|im_start|>user\n')
                + length(substr(text, 1, {_SFT_PROMPT_CHARS}))
                + length('<|im_end|>\n<|im_start|>assistant\n')
                + length(substr(text, {_SFT_PROMPT_CHARS} + 1)) + length('<|im_end|>')), 6) AS loss_frac
FROM documents
""",
)
def ext_instruction_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSTRUCTION-TUNING formatter: render each document into the
    chat-markup template (system / user / assistant turns with
    <|im_start|> sentinels — the ChatML shape) and report the
    LOSS-MASKING split: ``prompt_len`` characters train with loss
    masked, ``completion_len`` characters carry gradient, ``loss_frac``
    is the effective-token fraction — the numbers an SFT pipeline
    budgets by.  The first {chars} chars play the user turn, the
    remainder the assistant turn (stand-in for a real pair schema; the
    template mechanics are what matters).

    Pure string-concat projection (codegen, no shuffle) — at 100 TB
    formatting runs at scan speed; composes upstream of ``ext_doc_chunk``
    / ``ext_seq_pack`` exactly like a real SFT assembly line."""
    docs = table(spark, sf_dir, "documents")
    head = F.substring("text", 1, _SFT_PROMPT_CHARS)
    tail = F.expr(f"substring(text, {_SFT_PROMPT_CHARS} + 1)")
    pre = f"<|im_start|>system\n{_SFT_SYSTEM}<|im_end|>\n<|im_start|>user\n"
    mid = "<|im_end|>\n<|im_start|>assistant\n"
    end = "<|im_end|>"
    prompt_len = (F.lit(len(pre)) + F.length(head) + F.lit(len(mid))).cast("long")
    completion_len = (F.length(tail) + F.lit(len(end))).cast("long")
    return docs.select(
        "doc_id",
        F.concat(F.lit(pre), head, F.lit(mid), tail, F.lit(end)).alias("rendered"),
        prompt_len.alias("prompt_len"),
        completion_len.alias("completion_len"),
        F.round(
            completion_len.cast("double") / (prompt_len + completion_len), 6
        ).alias("loss_frac"),
    )


ext_instruction_format.__doc__ = ext_instruction_format.__doc__.format(
    chars=_SFT_PROMPT_CHARS
)


_PREF_PAIRS_PER_LANG = 5


@register(
    "ext_preference_pairs",
    oracle=f"""
WITH q AS (
  SELECT doc_id, lang,
         round({_QUALITY_SUM_SQL}, 2) AS quality
  FROM documents
),
top AS (
  SELECT lang, doc_id AS chosen_doc, quality AS chosen_q,
         row_number() OVER (PARTITION BY lang
                            ORDER BY quality DESC, doc_id) AS rk
  FROM q
),
bot AS (
  SELECT lang, doc_id AS rejected_doc, quality AS rejected_q,
         row_number() OVER (PARTITION BY lang
                            ORDER BY quality ASC, doc_id) AS rk
  FROM q
)
SELECT lang, CAST(top.rk AS BIGINT) AS pair_rank,
       chosen_doc, chosen_q, rejected_doc, rejected_q,
       round(chosen_q - rejected_q, 2) AS gap
FROM top JOIN bot USING (lang, rk)
WHERE top.rk <= {_PREF_PAIRS_PER_LANG}
ORDER BY lang, pair_rank
""",
)
def ext_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PREFERENCE-PAIR CONSTRUCTION (the DPO/RLHF reward-data shape):
    per language, the top-{k} quality documents paired positionally
    with the bottom-{k} — (chosen, rejected, gap) rows ready for a
    preference loss, built from the same composite quality signal
    ``ext_quality_score`` gates on (heuristic-quality pairing is the
    standard cold-start before a learned reward model exists).

    Both rank<={k} predicates plan as WindowGroupLimit per language;
    the positional pairing is a {k}-row-per-lang equi join — pair
    volume is 2k·|langs| regardless of corpus size.  Quality is
    quarter-valued (exact doubles), so the gap subtraction is exact."""
    from .textstats import ext_quality_score

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    q = ext_quality_score(spark, sf_dir).join(docs, "doc_id")
    wt = Window.partitionBy("lang").orderBy(F.desc("quality"), "doc_id")
    wb = Window.partitionBy("lang").orderBy(F.asc("quality"), "doc_id")
    top = q.select(
        "lang",
        F.col("doc_id").alias("chosen_doc"),
        F.col("quality").alias("chosen_q"),
        F.row_number().over(wt).alias("rk"),
    ).filter(F.col("rk") <= _PREF_PAIRS_PER_LANG)
    bot = q.select(
        "lang",
        F.col("doc_id").alias("rejected_doc"),
        F.col("quality").alias("rejected_q"),
        F.row_number().over(wb).alias("rk"),
    ).filter(F.col("rk") <= _PREF_PAIRS_PER_LANG)
    return (
        top.join(bot, ["lang", "rk"])
        .select(
            "lang",
            F.col("rk").cast("long").alias("pair_rank"),
            "chosen_doc",
            "chosen_q",
            "rejected_doc",
            "rejected_q",
            F.round(F.col("chosen_q") - F.col("rejected_q"), 2).alias("gap"),
        )
        .orderBy("lang", "pair_rank")
    )


ext_preference_pairs.__doc__ = ext_preference_pairs.__doc__.format(
    k=_PREF_PAIRS_PER_LANG
)


_CURATE_LANG_CAP = 1000  # max docs kept per language
_CURATE_TEST_PCT = 10    # holdout share, percent


@register(
    "pipeline_corpus_curation",
    oracle=f"""
WITH d0 AS (SELECT doc_id, text, lang FROM documents),
d1 AS (
  SELECT doc_id, text, lang FROM d0
  WHERE len(str_split(text, ' ')) >= 5
    AND list_sum(list_transform(str_split(text, ' '),
          t -> CAST(length(t) AS DOUBLE))) / len(str_split(text, ' ')) <= 12.0
    AND CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
        / length(text) <= 0.2
    AND CAST(len(list_distinct(str_split(text, ' '))) AS DOUBLE)
        / len(str_split(text, ' ')) >= 0.3
),
d2 AS (
  SELECT doc_id, lang FROM (
    SELECT doc_id, lang,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM d1) WHERE rn = 1
),
d3 AS (
  SELECT doc_id, lang FROM (
    SELECT doc_id, lang,
           row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
    FROM d2) WHERE rn <= {_CURATE_LANG_CAP}
),
d4 AS (
  SELECT doc_id FROM d3
  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        % 100 >= {_CURATE_TEST_PCT}
)
SELECT * FROM (
  SELECT 0 AS stage, 'raw' AS name, CAST((SELECT count(*) FROM d0) AS BIGINT) AS n_rows
  UNION ALL SELECT 1, 'quality_gate', CAST((SELECT count(*) FROM d1) AS BIGINT)
  UNION ALL SELECT 2, 'exact_dedup', CAST((SELECT count(*) FROM d2) AS BIGINT)
  UNION ALL SELECT 3, 'lang_cap', CAST((SELECT count(*) FROM d3) AS BIGINT)
  UNION ALL SELECT 4, 'train_split', CAST((SELECT count(*) FROM d4) AS BIGINT)
) ORDER BY stage
""",
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END CORPUS CURATION as ONE declarative plan — the funnel
    report every data team publishes with a corpus release: raw →
    quality gate → exact dedup → per-language volume cap → train split,
    with surviving row counts per stage.  Each stage is an existing
    kernel (``ext_quality_score``'s gate, the md5-key dedup rail,
    ``ext_domain_volume_cap``'s WindowGroupLimit shape, the shared
    md5 split gate) COMPOSED lazily, so Catalyst sees the whole funnel
    at once — filters fuse, the scan happens once per counted branch,
    and nothing materializes between stages.

    Stage counts are the contract: the judge of a curation run is
    "where did my documents go", and this is that answer as a query.
    At 100 TB each stage stays one exchange (dedup keyed on the 16-byte
    text hash, cap on the lang key), and the census is five 1-row
    aggregates unioned."""
    from .textstats import ext_quality_score
    from pyspark.sql import Window

    d0 = table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    keep = ext_quality_score(spark, sf_dir).filter("keep").select("doc_id")
    d1 = d0.join(keep, "doc_id")
    w_dup = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    d2 = (
        d1.withColumn("rn", F.row_number().over(w_dup))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang")
    )
    w_cap = Window.partitionBy("lang").orderBy("doc_id")
    d3 = (
        d2.withColumn("rn", F.row_number().over(w_cap))
        .filter(F.col("rn") <= _CURATE_LANG_CAP)
        .select("doc_id", "lang")
    )
    gate = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    d4 = d3.filter(gate >= _CURATE_TEST_PCT).select("doc_id")

    def census(df: DataFrame, stage: int, name: str) -> DataFrame:
        return df.agg(
            F.lit(stage).cast("int").alias("stage"),
            F.lit(name).alias("name"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )

    out = (
        census(d0, 0, "raw")
        .unionByName(census(d1, 1, "quality_gate"))
        .unionByName(census(d2, 2, "exact_dedup"))
        .unionByName(census(d3, 3, "lang_cap"))
        .unionByName(census(d4, 4, "train_split"))
    )
    return out.orderBy("stage")


# ---------------------------------------------------------------------------
# Round 13: span corruption, curriculum ordering, reward normalization
# ---------------------------------------------------------------------------

_SPAN_MOD = 5  # ~20% of token positions seed a corruption mask


@register(
    "ext_span_corruption",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, str_split(text, ' ') AS t FROM documents
),
pos AS (
  SELECT doc_id, i, t[i] AS tok,
         CAST(('0x' || substr(md5(doc_id || ':' || i), 1, 8)) AS BIGINT)
           % {_SPAN_MOD} = 0 AS msk
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM toks)
),
starts AS (
  SELECT doc_id, i, tok, msk,
         msk AND NOT coalesce(
           lag(msk) OVER (PARTITION BY doc_id ORDER BY i), FALSE)
           AS span_start
  FROM pos
),
spans AS (
  SELECT doc_id, i, tok, msk, span_start,
         CAST(sum(CASE WHEN span_start THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY i) AS BIGINT) AS span_id
  FROM starts
)
SELECT doc_id,
       CAST(coalesce(max(CASE WHEN msk THEN span_id END), 0) AS BIGINT)
         AS n_spans,
       coalesce(string_agg(
         CASE WHEN NOT msk THEN tok
              WHEN span_start THEN '<extra_id_' || (span_id - 1) || '>'
         END, ' ' ORDER BY i), '') AS input_text,
       coalesce(string_agg(
         CASE WHEN span_start THEN '<extra_id_' || (span_id - 1) || '> ' || tok
              WHEN msk THEN tok
         END, ' ' ORDER BY i), '') AS target_text
FROM spans
GROUP BY doc_id
ORDER BY doc_id
""",
)
def ext_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-STYLE SPAN CORRUPTION (Raffel et al. 2020): deterministically
    mask ~{pct}% of token positions per document, merge adjacent masked
    positions into spans, and emit the (input, target) pair — input with
    each span replaced by its ``<extra_id_k>`` sentinel, target carrying
    sentinel + original span tokens.  The denoising-objective example
    generator of an LLM data pipeline, as a pure DataFrame plan.

    The mask is the engine's md5 micro-grid draw on (doc_id, position) —
    engine-independent, resumable, no RNG state to ship.  Span ids come
    from the classic run-start running count (one window PARTITIONED BY
    doc — doc-length-bounded tasks); both output strings assemble with
    order-pinned aggregation (``string_agg ORDER BY`` == sorted
    collect_list + array_join).  Output is one row per document."""
    docs = table(spark, sf_dir, "documents")
    # Bind the split array once per row (the ext_bigram_freq lesson:
    # an inline split() inside the lambda re-tokenizes per element).
    bound = docs.select("doc_id", F.split("text", " ").alias("t"))
    t = F.col("t")
    pos = bound.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(t)),
                lambda i: F.struct(i.alias("i"), F.element_at(t, i).alias("tok")),
            )
        ).alias("p"),
    ).select(
        "doc_id",
        "p.i",
        "p.tok",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("doc_id"), F.col("p.i"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % _SPAN_MOD
            == 0
        ).alias("msk"),
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    spans = pos.select(
        "doc_id",
        "i",
        "tok",
        "msk",
        (F.col("msk") & ~F.coalesce(F.lag("msk").over(w), F.lit(False))).alias(
            "span_start"
        ),
    ).withColumn(
        "span_id",
        F.sum(F.when(F.col("span_start"), 1).otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )
    sent = F.concat(F.lit("<extra_id_"), (F.col("span_id") - 1).cast("string"), F.lit(">"))
    in_piece = F.when(~F.col("msk"), F.col("tok")).when(F.col("span_start"), sent)
    tgt_piece = F.when(
        F.col("span_start"), F.concat(sent, F.lit(" "), F.col("tok"))
    ).when(F.col("msk"), F.col("tok"))

    def assemble(piece):
        return F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(piece.isNotNull(), F.struct(F.col("i"), piece.alias("x")))
                    )
                ),
                lambda s: s.getField("x"),
            ),
            " ",
        )

    return (
        spans.groupBy("doc_id")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("msk"), F.col("span_id"))), F.lit(0)
            ).cast("long").alias("n_spans"),
            assemble(in_piece).alias("input_text"),
            assemble(tgt_piece).alias("target_text"),
        )
        .orderBy("doc_id")
    )


ext_span_corruption.__doc__ = ext_span_corruption.__doc__.format(
    pct=100 // _SPAN_MOD
)


_CURR_STAGES = 3  # curriculum stages (short/medium/long documents)


@register(
    "ext_curriculum_order",
    oracle=f"""
WITH d AS (
  SELECT doc_id, CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           AS h
  FROM documents
),
staged AS (
  SELECT doc_id, n_tokens, h,
         CAST(ntile({_CURR_STAGES}) OVER (ORDER BY n_tokens, doc_id)
              AS BIGINT) AS stage
  FROM d
)
SELECT doc_id, n_tokens, stage,
       CAST(row_number() OVER (ORDER BY stage, h, doc_id) AS BIGINT)
         AS position
FROM staged
ORDER BY position
""",
)
def ext_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CURRICULUM ORDERING: assign every document a global training
    position — {k} difficulty stages by token count (short documents
    first, the classic length curriculum), deterministically shuffled
    WITHIN each stage via the md5 draw (so a stage is not accidentally
    ordered by source or id).  The output (doc_id → position) is the
    read order a curriculum-aware loader consumes.

    Both global ranks come from ``distributed_rank`` (range partition +
    local windows + broadcast offsets): the stage tercile via
    ``ntile_from_rank`` over the (n_tokens, doc_id) order, the final
    position over (stage, h, doc_id) — no single-task window anywhere,
    so the ordering scales to corpus-sized frames."""
    from ..operators.ranking import distributed_rank, ntile_from_rank

    docs = table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long").alias("h"),
    )
    staged = distributed_rank(d, ["n_tokens", "doc_id"]).select(
        "doc_id",
        "n_tokens",
        "h",
        ntile_from_rank(_CURR_STAGES, F.col("_rk"), F.col("_n_total")).alias(
            "stage"
        ),
    )
    return (
        distributed_rank(staged, ["stage", "h", "doc_id"])
        .select("doc_id", "n_tokens", "stage", F.col("_rk").alias("position"))
        .orderBy("position")
    )


ext_curriculum_order.__doc__ = ext_curriculum_order.__doc__.format(
    k=_CURR_STAGES
)


_RW_PROMPTS = 50  # candidate grouping: doc_id % _RW_PROMPTS plays the prompt


@register(
    "ext_reward_normalize",
    oracle=f"""
WITH c AS (
  SELECT CAST(doc_id % {_RW_PROMPTS} AS BIGINT) AS prompt_id, doc_id,
         n_chars AS score
  FROM documents
),
m AS (
  SELECT prompt_id,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(score) AS BIGINT) AS s,
         CAST(sum(score * score) AS BIGINT) AS ss
  FROM c GROUP BY 1
)
SELECT c.prompt_id, c.doc_id, CAST(c.score AS BIGINT) AS score,
       floor(CASE WHEN m.n > 1 AND m.ss * m.n > m.s * m.s
                  THEN (c.score - CAST(m.s AS DOUBLE) / m.n)
                       / sqrt((m.ss - CAST(m.s AS DOUBLE) * m.s / m.n)
                              / (m.n - 1))
                  ELSE 0.0 END * 1000000 + 0.5) / 1000000.0 AS z,
       row_number() OVER (PARTITION BY c.prompt_id
                          ORDER BY c.score DESC, c.doc_id) = 1 AS is_best
FROM c JOIN m USING (prompt_id)
ORDER BY c.prompt_id, c.doc_id
""",
)
def ext_reward_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REWARD-SCORE NORMALIZATION for preference data: per-prompt
    z-scores of candidate scores plus the argmax flag — the step between
    raw reward-model outputs and DPO/RLHF pair construction
    (``ext_preference_pairs`` consumes the ranking this op normalizes;
    reward scales drift per prompt, so cross-prompt comparability needs
    the within-group standardization).

    Documents play candidates, ``doc_id % {m}`` the prompt group, and
    the integer ``n_chars`` the raw score, so every moment is an EXACT
    integer sum — mean/variance/z are then identical double expressions
    in both engines (the engine's stats discipline).  Degenerate groups
    (n <= 1 or zero variance) release z = 0.  One group aggregate + one
    broadcastable join + one group-bounded window."""
    docs = table(spark, sf_dir, "documents")
    c = docs.select(
        (F.col("doc_id") % _RW_PROMPTS).cast("long").alias("prompt_id"),
        "doc_id",
        F.col("n_chars").cast("long").alias("score"),
    )
    m = c.groupBy("prompt_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("score").cast("long").alias("s"),
        F.sum(F.col("score") * F.col("score")).cast("long").alias("ss"),
    )
    z = F.when(
        (F.col("n") > 1)
        & (F.col("ss") * F.col("n") > F.col("s") * F.col("s")),
        (F.col("score") - F.col("s").cast("double") / F.col("n"))
        / F.sqrt(
            (F.col("ss") - F.col("s").cast("double") * F.col("s") / F.col("n"))
            / (F.col("n") - 1)
        ),
    ).otherwise(F.lit(0.0))
    w = Window.partitionBy("prompt_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        c.join(F.broadcast(m), "prompt_id")
        .select(
            "prompt_id",
            "doc_id",
            "score",
            (F.floor(z * 1000000 + 0.5) / 1000000.0).alias("z"),
            (F.row_number().over(w) == 1).alias("is_best"),
        )
        .orderBy("prompt_id", "doc_id")
    )


ext_reward_normalize.__doc__ = ext_reward_normalize.__doc__.format(
    m=_RW_PROMPTS
)


_BON_PROMPTS = 32  # candidate pool count: doc_id % 32


@register(
    "ext_best_of_n",
    oracle=f"""
WITH q AS (
  SELECT doc_id, doc_id % {_BON_PROMPTS} AS prompt_id,
         round({_QUALITY_SUM_SQL}, 2) AS reward
  FROM documents
), r AS (
  SELECT prompt_id, doc_id, reward,
         row_number() OVER (PARTITION BY prompt_id
                            ORDER BY reward DESC, doc_id) AS rk,
         CAST(count(*) OVER (PARTITION BY prompt_id) AS BIGINT)
           AS n_candidates
  FROM q
)
SELECT prompt_id, max(n_candidates) AS n_candidates,
       max(CASE WHEN rk = 1 THEN doc_id END) AS best_doc,
       max(CASE WHEN rk = 1 THEN reward END) AS best_reward,
       round(coalesce(max(CASE WHEN rk = 1 THEN reward END)
                      - max(CASE WHEN rk = 2 THEN reward END),
                      max(CASE WHEN rk = 1 THEN reward END)), 2) AS margin
FROM r WHERE rk <= 2
GROUP BY prompt_id
ORDER BY prompt_id
""",
)
def ext_best_of_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BEST-OF-N REJECTION SAMPLING (the RLHF/RFT inference-time shape):
    documents grouped into {m} candidate pools (prompt_id = doc_id %
    {m}), the highest-reward candidate selected per pool with a
    deterministic tiebreak, plus the MARGIN over the runner-up — the
    selection readout ``ext_preference_pairs`` (pairs for training) and
    ``ext_reward_normalize`` (reward whitening) sit beside: this is the
    serving-side pick, and a small margin flags pools where the reward
    model cannot separate candidates.

    Reward is the shared quarter-valued quality composite (exact
    doubles, so the margin subtraction is exact).  Both the rank and
    the runner-up come from ONE per-pool window pass that plans as
    WindowGroupLimit (rank <= 2 pushes the top-2 selection into the
    sort), and the pool census rides the same window — per-pool output
    is 1 row regardless of corpus size, so the post-window frame is
    {m} rows at any scale."""
    from .textstats import ext_quality_score

    q = ext_quality_score(spark, sf_dir).select(
        "doc_id",
        (F.col("doc_id") % _BON_PROMPTS).alias("prompt_id"),
        F.col("quality").alias("reward"),
    )
    # Census as its own pool-grain aggregate (NOT a count window sharing
    # the rank's partition): an unbounded count window above the rank
    # filter blocks the WindowGroupLimit rewrite, turning the top-2
    # selection into a full per-pool sort materialization at scale.
    census = q.groupBy("prompt_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates")
    )
    w = Window.partitionBy("prompt_id").orderBy(F.desc("reward"), "doc_id")
    r = q.select(
        "prompt_id",
        "doc_id",
        "reward",
        F.row_number().over(w).alias("rk"),
    ).filter(F.col("rk") <= 2)
    best = F.max(F.when(F.col("rk") == 1, F.col("reward")))
    second = F.max(F.when(F.col("rk") == 2, F.col("reward")))
    return (
        r.groupBy("prompt_id")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("doc_id"))).alias("best_doc"),
            best.alias("best_reward"),
            F.round(F.coalesce(best - second, best), 2).alias("margin"),
        )
        .join(census, "prompt_id")
        .select(
            "prompt_id", "n_candidates", "best_doc", "best_reward", "margin"
        )
        .orderBy("prompt_id")
    )


ext_best_of_n.__doc__ = ext_best_of_n.__doc__.format(m=_BON_PROMPTS)


@register(
    "ext_reward_length_bias",
    oracle=f"""
WITH q AS (
  SELECT len(str_split(text, ' ')) AS toks,
         CAST(round(({_QUALITY_SUM_SQL}) * 4) AS BIGINT) AS r4
  FROM documents
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(toks) AS BIGINT) AS st,
         CAST(sum(r4) AS BIGINT) AS sr,
         CAST(sum(toks * toks) AS BIGINT) AS stt,
         CAST(sum(r4 * r4) AS BIGINT) AS srr,
         CAST(sum(toks * r4) AS BIGINT) AS str_
  FROM q
)
SELECT n,
       floor((CAST(sr AS DOUBLE) / n / 4.0) * 1000000 + 0.5) / 1000000.0
         AS mean_reward,
       floor((CAST(st AS DOUBLE) / n) * 1000000 + 0.5) / 1000000.0
         AS mean_tokens,
       floor(((n * CAST(str_ AS DOUBLE) - CAST(st AS DOUBLE) * sr)
              / sqrt((n * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st)
                     * (n * CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) * sr)))
             * 1000000 + 0.5) / 1000000.0 AS corr_reward_tokens,
       floor(((n * CAST(str_ AS DOUBLE) - CAST(st AS DOUBLE) * sr)
              / (n * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st)
              / 4.0 * 100.0) * 1000000 + 0.5) / 1000000.0
         AS reward_slope_per_100_tokens
FROM m
""",
)
def ext_reward_length_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REWARD LENGTH-BIAS AUDIT: Pearson correlation and OLS slope of
    the quality reward against document token count — the standard
    RLHF sanity check (length-hacked reward models prefer longer
    outputs regardless of quality; Singhal 2023): a strong positive
    correlation here says the gate ``ext_quality_score`` feeds
    (``ext_best_of_n``, ``ext_preference_pairs``) is partly selecting
    on LENGTH, and ``ext_reward_normalize`` alone won't fix it.

    Exactness: reward is quarter-valued so r4 = 4*reward is an exact
    int; token counts exact ints; all five moments come from ONE 1-row
    map-side-combined aggregate and the corr/slope are the
    ``agg_partial_corr`` closed forms.  One scan, zero extra shuffles."""
    from .textstats import ext_quality_score

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("toks")
    )
    q = (
        ext_quality_score(spark, sf_dir)
        .select("doc_id", F.round(F.col("quality") * 4).cast("long").alias("r4"))
        .join(docs, "doc_id")
    )
    m = q.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("toks").cast("long").alias("st"),
        F.sum("r4").cast("long").alias("sr"),
        F.sum(F.col("toks") * F.col("toks")).cast("long").alias("stt"),
        F.sum(F.col("r4") * F.col("r4")).cast("long").alias("srr"),
        F.sum(F.col("toks") * F.col("r4")).cast("long").alias("str_"),
    )
    n = F.col("n")
    cov = n * F.col("str_").cast("double") - F.col("st").cast("double") * F.col("sr")
    vart = n * F.col("stt").cast("double") - F.col("st").cast("double") * F.col("st")
    varr = n * F.col("srr").cast("double") - F.col("sr").cast("double") * F.col("sr")
    r6l = lambda x: F.floor(x * 1000000 + 0.5) / 1000000.0  # noqa: E731
    return m.select(
        "n",
        r6l(F.col("sr").cast("double") / n / 4.0).alias("mean_reward"),
        r6l(F.col("st").cast("double") / n).alias("mean_tokens"),
        r6l(cov / F.sqrt(vart * varr)).alias("corr_reward_tokens"),
        r6l(cov / vart / 4.0 * 100.0).alias("reward_slope_per_100_tokens"),
    )


_BT_RANKS = 40  # duels per language pair: rank-r champion vs rank-r champion
_BT_ITERS = 20  # fixed MM iterations (Hunter 2004), unrolled identically


def _bt_oracle() -> str:
    return f"""
WITH RECURSIVE q AS (
  SELECT doc_id, lang, round({_QUALITY_SUM_SQL}, 2) AS quality
  FROM documents
),
ranked AS (
  SELECT lang, quality, rk FROM (
    SELECT lang, quality,
           row_number() OVER (PARTITION BY lang
                              ORDER BY quality DESC, doc_id) AS rk
    FROM q)
  WHERE rk <= {_BT_RANKS}
),
duels AS (
  SELECT a.lang AS la, b.lang AS lb,
         CASE WHEN a.quality > b.quality THEN 1 ELSE 0 END AS wa,
         CASE WHEN b.quality > a.quality THEN 1 ELSE 0 END AS wb
  FROM ranked a JOIN ranked b ON a.rk = b.rk AND a.lang < b.lang
  WHERE a.quality <> b.quality
),
wcnt AS (
  SELECT la, lb, CAST(sum(wa) AS BIGINT) AS wa, CAST(sum(wb) AS BIGINT) AS wb
  FROM duels GROUP BY 1, 2
),
langs AS (
  SELECT lang, CAST(row_number() OVER (ORDER BY lang) AS INT) AS li
  FROM (SELECT DISTINCT lang FROM documents)
),
kk AS (SELECT CAST(count(*) AS INT) AS k FROM langs),
sym AS (
  SELECT la AS x, lb AS y, wa AS w FROM wcnt
  UNION ALL SELECT lb, la, wb FROM wcnt
),
cells AS (
  SELECT i.li AS i, j.li AS j,
         CASE WHEN i.li = j.li THEN 0.0
              ELSE coalesce(s.w, 0) + 0.5 END AS w,
         CASE WHEN i.li = j.li THEN 0.0
              ELSE coalesce(s.w, 0) + coalesce(s2.w, 0) + 1.0 END AS nn,
         CASE WHEN i.li = j.li THEN 0 ELSE coalesce(s.w, 0) END AS wraw
  FROM langs i CROSS JOIN langs j
  LEFT JOIN sym s ON s.x = i.lang AND s.y = j.lang
  LEFT JOIN sym s2 ON s2.x = j.lang AND s2.y = i.lang
),
rowa AS (
  SELECT i AS li, list(nn ORDER BY j) AS nrow,
         list_reduce(list_prepend(0.0, list(w ORDER BY j)),
                     (a, b) -> a + b) AS wtot,
         CAST(sum(wraw) AS BIGINT) AS wins
  FROM cells GROUP BY i
),
bt AS (
  SELECT 0 AS step, li, nrow, wtot, wins, 1.0 / kk.k AS p FROM rowa, kk
  UNION ALL
  SELECT step + 1, li, nrow, wtot, wins,
         wtot / list_reduce(list_prepend(0.0,
             list_transform(generate_series(1, len(parr)), j ->
               CASE WHEN j = li THEN 0.0
                    ELSE nrow[j] / (p + parr[j]) END)),
             (a, b) -> a + b)
  FROM (SELECT step, li, nrow, wtot, wins, p,
               -- window aggregates cannot carry ORDER BY in DuckDB: collect
               -- (li, p) pairs and sort after (li is unique, so the sorted
               -- second components are p in li order)
               list_transform(
                 list_sort(list([CAST(li AS DOUBLE), p]) OVER ()),
                 x -> x[2]) AS parr
        FROM bt WHERE step < {_BT_ITERS})
),
fin AS (SELECT li, wins, p FROM bt WHERE step = {_BT_ITERS}),
norm AS (
  SELECT list_reduce(list_prepend(0.0, list(p ORDER BY li)),
                     (a, b) -> a + b) AS s
  FROM fin
)
SELECT l.lang, f.wins,
       floor(f.p / norm.s * 1000000 + 0.5) / 1000000.0 AS strength,
       CAST(row_number() OVER (ORDER BY f.p / norm.s DESC, l.lang) AS INT)
         AS rank
FROM fin f JOIN langs l ON l.li = f.li CROSS JOIN norm
ORDER BY rank
"""


@register("ext_bradley_terry", oracle=_bt_oracle())
def ext_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BRADLEY-TERRY STRENGTHS for the per-language quality tracks — the
    arena-leaderboard machinery (Chatbot-Arena-style): rank-r document
    of language A duels rank-r of language B on the composite quality
    score (ties abstain), pairwise win counts feed the Bradley-Terry
    model, and strengths come from {it} fixed minorization-maximization
    iterations (Hunter 2004) — p_i <- W_i / sum_j n_ij / (p_i + p_j) —
    with a half-win Laplace duel per pair so zero-win items stay
    positive.  This is the aggregation step every LLM-judge /
    preference-data pipeline needs between ``ext_preference_pairs``
    (raw pairwise outcomes) and a training mixture decision.

    Scale shape: duels are rank-bounded ({r} per language pair) and the
    win matrix is |langs|^2 — the MM loop runs driver-side on that
    bounded matrix (the ext_bpe_train bounded-collect discipline), with
    every order-sensitive float fold in sorted-index order so the
    unrolled recursive-CTE oracle reproduces it bit-for-bit;
    normalization happens ONCE at release (per-iteration scale drift
    cancels in the ratios, so skipping it keeps the fold identical in
    both engines without a second pass per step)."""
    from .textstats import ext_quality_score

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    q = ext_quality_score(spark, sf_dir).join(docs, "doc_id")
    w = Window.partitionBy("lang").orderBy(F.desc("quality"), "doc_id")
    ranked = (
        q.select("lang", "quality", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= _BT_RANKS)
    )
    a = ranked.select(
        F.col("lang").alias("la"), F.col("quality").alias("qa"), "rk"
    )
    b = ranked.select(
        F.col("lang").alias("lb"), F.col("quality").alias("qb"), "rk"
    )
    wcnt = (
        a.join(b, "rk")
        .filter((F.col("la") < F.col("lb")) & (F.col("qa") != F.col("qb")))
        .groupBy("la", "lb")
        .agg(
            F.sum(F.when(F.col("qa") > F.col("qb"), 1).otherwise(0))
            .cast("long")
            .alias("wa"),
            F.sum(F.when(F.col("qb") > F.col("qa"), 1).otherwise(0))
            .cast("long")
            .alias("wb"),
        )
    )
    # Bounded collects: |langs| and |langs|^2/2 rows by construction.
    langs = sorted(
        r.lang for r in docs.select("lang").distinct().collect()
    )
    k = len(langs)
    idx = {g: i for i, g in enumerate(langs)}
    wm = [[0 for _ in range(k)] for _ in range(k)]
    for r in wcnt.collect():
        wm[idx[r.la]][idx[r.lb]] = r.wa
        wm[idx[r.lb]][idx[r.la]] = r.wb
    # smoothed duel matrices, j-sorted folds — the oracle's exact algebra
    wprime = [
        [0.0 if i == j else wm[i][j] + 0.5 for j in range(k)] for i in range(k)
    ]
    nprime = [
        [0.0 if i == j else wm[i][j] + wm[j][i] + 1.0 for j in range(k)]
        for i in range(k)
    ]
    wtot = []
    for i in range(k):
        acc = 0.0
        for j in range(k):
            acc = acc + wprime[i][j]
        wtot.append(acc)
    p = [1.0 / k] * k
    for _ in range(_BT_ITERS):
        new = []
        for i in range(k):
            den = 0.0
            for j in range(k):
                den = den + (0.0 if j == i else nprime[i][j] / (p[i] + p[j]))
            new.append(wtot[i] / den)
        p = new
    s = 0.0
    for i in range(k):
        s = s + p[i]
    import math as _m

    # rank on the UNROUNDED ratio (the oracle's row_number key), release
    # the half-up 6-decimal strength
    unrounded = {langs[i]: p[i] / s for i in range(k)}
    rows = sorted(
        (
            (langs[i], int(sum(wm[i])), _m.floor(p[i] / s * 1e6 + 0.5) / 1e6)
            for i in range(k)
        ),
        key=lambda t: (-unrounded[t[0]], t[0]),
    )
    return spark.createDataFrame(
        [(g, wins, st, rk + 1) for rk, (g, wins, st) in enumerate(rows)],
        "lang string, wins long, strength double, rank int",
    )


ext_bradley_terry.__doc__ = ext_bradley_terry.__doc__.format(
    it=_BT_ITERS, r=_BT_RANKS
)


_ELO_K = 32.0  # classic K-factor
_ELO_START = 1000.0


def _elo_oracle() -> str:
    return f"""
WITH q AS (
  SELECT doc_id, lang, round({_QUALITY_SUM_SQL}, 2) AS quality
  FROM documents
),
ranked AS (
  SELECT lang, quality, rk FROM (
    SELECT lang, quality,
           row_number() OVER (PARTITION BY lang
                              ORDER BY quality DESC, doc_id) AS rk
    FROM q)
  WHERE rk <= {_BT_RANKS}
),
langs AS (
  SELECT lang, CAST(row_number() OVER (ORDER BY lang) AS INT) AS li
  FROM (SELECT DISTINCT lang FROM documents)
),
kk AS (SELECT CAST(count(*) AS INT) AS k FROM langs),
duels AS (
  SELECT a.rk, la.li AS ia, lb.li AS ib,
         CASE WHEN a.quality > b.quality THEN 1.0
              WHEN a.quality < b.quality THEN 0.0
              ELSE 0.5 END AS sa
  FROM ranked a
  JOIN ranked b ON a.rk = b.rk AND a.lang < b.lang
  JOIN langs la ON la.lang = a.lang
  JOIN langs lb ON lb.lang = b.lang
),
games AS (
  SELECT list_sort(list([CAST(rk AS DOUBLE), CAST(ia AS DOUBLE),
                         CAST(ib AS DOUBLE), sa])) AS gs
  FROM duels
),
gcnt AS (
  SELECT li, CAST(count(*) AS BIGINT) AS n_games FROM (
    SELECT ia AS li FROM duels UNION ALL SELECT ib FROM duels
  ) GROUP BY 1
),
fold AS (
  SELECT list_reduce(
           list_prepend(
             list_transform(generate_series(1, kk.k),
                            i -> {_ELO_START}),
             gs),
           (acc, g) -> list_transform(
             generate_series(1, len(acc)), i ->
               CASE WHEN i = CAST(g[2] AS INT)
                      THEN acc[i] + {_ELO_K} * (g[4]
                           - 1.0 / (1.0 + pow(10.0,
                               (acc[CAST(g[3] AS INT)] - acc[i]) / 400.0)))
                    WHEN i = CAST(g[3] AS INT)
                      THEN acc[i] + {_ELO_K} * ((1.0 - g[4])
                           - (1.0 - 1.0 / (1.0 + pow(10.0,
                               (acc[i] - acc[CAST(g[2] AS INT)]) / 400.0))))
                    ELSE acc[i] END)) AS r
  FROM games, kk
)
SELECT l.lang, coalesce(g.n_games, 0) AS n_games,
       floor(f.r[l.li] * 10000 + 0.5) / 10000.0 AS elo,
       CAST(row_number() OVER (ORDER BY f.r[l.li] DESC, l.lang) AS INT)
         AS rank
FROM langs l CROSS JOIN fold f LEFT JOIN gcnt g ON g.li = l.li
ORDER BY rank
"""


@register("ext_elo_online", oracle=_elo_oracle())
def ext_elo_online(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE ELO RATINGS for the per-language quality tracks — the
    SEQUENTIAL companion to ``ext_bradley_terry``'s batch MM: the same
    rank-r duels (ties score 0.5 here — Elo handles draws natively)
    replay in deterministic (rank, index) order through the classic
    update R_a += K (S_a - E_a), E_a = 1 / (1 + 10^((R_b - R_a)/400)),
    K={k}, start {s} — the streaming-shaped estimator an arena uses
    BETWEEN batch refits (each new judge verdict adjusts two ratings in
    O(1), no refit).

    Fully in-plan: duels are rank-bounded, the game log collects onto
    one row (|langs|^2 x {r} entries max), and the fold updates a
    |langs|-slot rating array per game — both engines run the identical
    left-to-right fold, so the oracle hash-matches bit-for-bit (pow and
    the division chain are the same libm calls in the same order)."""
    from .textstats import ext_quality_score

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    q = ext_quality_score(spark, sf_dir).join(docs, "doc_id")
    w = Window.partitionBy("lang").orderBy(F.desc("quality"), "doc_id")
    ranked = (
        q.select("lang", "quality", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= _BT_RANKS)
    )
    wl = Window.orderBy("lang")  # |langs| rows: the bounded window case
    langs = (
        docs.select("lang")
        .distinct()
        .select("lang", F.row_number().over(wl).cast("int").alias("li"))
    )
    kk = langs.agg(F.count(F.lit(1)).cast("int").alias("k"))
    a = ranked.select(
        F.col("lang").alias("la"), F.col("quality").alias("qa"), "rk"
    )
    b = ranked.select(
        F.col("lang").alias("lb"), F.col("quality").alias("qb"), "rk"
    )
    duels = (
        a.join(b, "rk")
        .filter(F.col("la") < F.col("lb"))
        .join(
            F.broadcast(langs.select(F.col("lang").alias("la"), F.col("li").alias("ia"))),
            "la",
        )
        .join(
            F.broadcast(langs.select(F.col("lang").alias("lb"), F.col("li").alias("ib"))),
            "lb",
        )
        .select(
            "rk",
            "ia",
            "ib",
            F.when(F.col("qa") > F.col("qb"), 1.0)
            .when(F.col("qa") < F.col("qb"), 0.0)
            .otherwise(0.5)
            .alias("sa"),
        )
    )
    games = duels.agg(
        F.array_sort(
            F.collect_list(
                F.array(
                    F.col("rk").cast("double"),
                    F.col("ia").cast("double"),
                    F.col("ib").cast("double"),
                    F.col("sa"),
                )
            )
        ).alias("gs")
    )
    gcnt = (
        duels.select(F.col("ia").alias("li"))
        .unionAll(duels.select(F.col("ib").alias("li")))
        .groupBy("li")
        .agg(F.count(F.lit(1)).cast("long").alias("n_games"))
    )

    def step(acc, g):
        ia = g[1].cast("int")
        ib = g[2].cast("int")
        ra = F.element_at(acc, ia)
        rb = F.element_at(acc, ib)
        ea = 1.0 / (1.0 + F.pow(F.lit(10.0), (rb - ra) / 400.0))
        return F.transform(
            F.sequence(F.lit(1), F.size(acc)),
            lambda i: F.when(i == ia, ra + _ELO_K * (g[3] - ea))
            .when(
                i == ib,
                rb
                + _ELO_K
                * (
                    (1.0 - g[3])
                    - (1.0 - 1.0 / (1.0 + F.pow(F.lit(10.0), (ra - rb) / 400.0)))
                ),
            )
            .otherwise(F.element_at(acc, i)),
        )

    fold = games.crossJoin(F.broadcast(kk)).select(
        F.aggregate(
            F.col("gs"),
            F.transform(
                F.sequence(F.lit(1), F.col("k")), lambda _: F.lit(_ELO_START)
            ),
            step,
        ).alias("r")
    )
    return (
        langs.crossJoin(F.broadcast(fold))
        .join(F.broadcast(gcnt), "li", "left")
        .select(
            "lang",
            F.coalesce(F.col("n_games"), F.lit(0)).cast("long").alias("n_games"),
            q4(F.element_at(F.col("r"), F.col("li"))).alias("elo"),
            F.row_number()
            .over(
                Window.orderBy(
                    F.element_at(F.col("r"), F.col("li")).desc(), F.col("lang")
                )
            )
            .cast("int")
            .alias("rank"),
        )
        .orderBy("rank")
    )
