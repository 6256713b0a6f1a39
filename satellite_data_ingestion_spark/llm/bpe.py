"""Byte-pair-encoding tokenizer training and application — the
vocabulary-building step of a training-data pipeline.

The scalable shape (how GPT-2-era BPE/sentencepiece trainers handle
web-scale corpora) splits the work by data volume:

- ``ext_bpe_train``     the ONLY corpus-sized pass is a distributed
                        word-frequency count (one shuffle of compact
                        (word, count) pairs with map-side combine);
                        merge learning then runs driver-side over the
                        bounded word HISTOGRAM — vocab-sized, not
                        corpus-sized — so 100 TB of text trains on the
                        same few-MB histogram as 100 MB of text does.
- ``ext_bpe_tokenize``  applies the learned merge table distributively:
                        the rank dict broadcasts inside a pandas-UDF
                        closure, each Arrow batch tokenizes its
                        documents with a per-batch word→tokens memo (web
                        text repeats words heavily, so the greedy merge
                        loop runs once per DISTINCT word per batch).

DuckDB-ORACLED since round 14: the merge-learning fixpoint IS
expressible as a HISTOGRAM-sized recursive-CTE fold (``_bpe_learn_sql``
— candidate-pair counting with nested lambdas, TAB-serialized
tie-break, list_reduce word rewrites), and application as a second
recursive CTE running the exact ``tokenize_word`` loop — so the whole
family (train / tokenize / fertility) hash-matches the driver gate.
The pytest side additionally pins the algorithm against an
independently-written reference implementation and hand-computed merges
on a synthetic corpus, plus the tokenizer's lossless round-trip
(concatenating a word's tokens reproduces the word).

Capability mapping: the reference repo has no tokenizer; this extends
the SURVEY §2.10 LLM-data surface alongside ext_token_count
(llm/textstats.py), whose regex heuristic this replaces with a real
learned vocabulary.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .. import settings
from ..catalog import table
from ..registry import register

_N_MERGES = settings.BPE_N_MERGES
_MAX_WORDS = settings.BPE_MAX_WORDS
_END = "</w>"  # end-of-word sentinel: merges cannot cross word ends


def _bpe_learn_sql() -> str:
    """The learned-BPE oracle prelude (VERDICT r13 task 5, round 14):
    merge LEARNING as a recursive CTE — the word histogram folds through
    ``BPE_N_MERGES`` steps carrying (symbol-lists, freqs, merges); per
    step the candidate adjacent pairs are counted with nested lambdas
    (overlapping occurrences included, matching ``learn_merges``), the
    (max count, lexicographically-smallest pair) winner is appended
    (pairs serialize as ``a<TAB>b`` — TAB sorts below every symbol
    char, so string order equals tuple order), and every word rewrites
    its non-overlapping occurrences through a ``list_reduce`` fold.
    Exactly reproduces ``learn_merges`` (pinned by the ext_bpe_train
    oracle MATCH).  The recursion is HISTOGRAM-sized (top BPE_MAX_WORDS
    words), corpus-independent — the same scale shape as the engine.

    ``apply`` then re-tokenizes every DISTINCT corpus word with the
    learned table: one merge per step, leftmost lowest rank — the exact
    ``tokenize_word`` loop — with rank lookup via ``list_position`` on
    the learned pair list."""
    return rf"""
WITH RECURSIVE hist AS MATERIALIZED (
  SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(regexp_split_to_array(lower(coalesce(text, '')), '\s+')) AS w
        FROM documents)
  WHERE w <> '' GROUP BY w ORDER BY freq DESC, w LIMIT {_MAX_WORDS}
), init AS (
  SELECT list(list_append(list_transform(generate_series(1, length(word)), i -> word[i]), '{_END}')
              ORDER BY freq DESC, word) AS syms,
         list(freq ORDER BY freq DESC, word) AS freqs
  FROM hist
), learn AS (
  SELECT 0 AS step, syms, freqs, CAST([] AS VARCHAR[]) AS merges FROM init
  UNION ALL
  SELECT step + 1,
         list_transform(syms, s -> CASE WHEN len(s) < 2 THEN s ELSE
           list_reduce(
             list_concat([[s[1]]],
                         list_transform(generate_series(2, len(s)), i -> [s[i]])),
             (acc, x) -> CASE WHEN acc[len(acc)] = bl AND x[1] = br
               THEN list_append(list_slice(acc, 1, len(acc) - 1), bl || br)
               ELSE list_append(acc, x[1]) END)
           END),
         freqs,
         list_append(merges, best)
  FROM (
    SELECT step, syms, freqs, merges, best,
           string_split(best, chr(9))[1] AS bl,
           string_split(best, chr(9))[2] AS br
    FROM (
      SELECT step, syms, freqs, merges,
             list_min(list_transform(
               list_filter(generate_series(1, len(cands)), i -> cnts[i] = list_max(cnts)),
               i -> cands[i])) AS best
      FROM (
        SELECT step, syms, freqs, merges, cands,
               list_transform(cands, c ->
                 list_sum(list_transform(generate_series(1, len(syms)), wi ->
                   freqs[wi] * len(list_filter(generate_series(1, len(syms[wi]) - 1),
                     p -> syms[wi][p] || chr(9) || syms[wi][p + 1] = c))))) AS cnts
        FROM (
          SELECT step, syms, freqs, merges,
                 list_distinct(flatten(list_transform(syms, s ->
                   list_transform(generate_series(1, len(s) - 1),
                     p -> s[p] || chr(9) || s[p + 1])))) AS cands
          FROM learn
        )
      ) WHERE len(cands) > 0 AND step < {_N_MERGES}
    )
  )
), mtab AS MATERIALIZED (
  SELECT merges FROM learn ORDER BY step DESC LIMIT 1
), toks AS MATERIALIZED (
  SELECT doc_id, lang, length(coalesce(text, '')) AS n_chars, w AS word
  FROM (SELECT doc_id, lang, text,
               unnest(regexp_split_to_array(lower(coalesce(text, '')), '\s+')) AS w
        FROM documents)
  WHERE w <> ''
), wapply AS (
  SELECT w.word,
         list_append(list_transform(generate_series(1, length(w.word)),
                                    i -> w.word[i]), '{_END}') AS sym,
         0 AS step, m.merges AS ml
  FROM (SELECT DISTINCT word FROM toks) w, mtab m
  UNION ALL
  SELECT word,
         list_concat(list_concat(list_slice(sym, 1, best - 1),
                                 [sym[best] || sym[best + 1]]),
                     list_slice(sym, best + 2, len(sym))),
         step + 1, ml
  FROM (
    SELECT word, sym, step, ml,
           CASE WHEN list_min(ranks) = 999999 THEN NULL
                ELSE list_position(ranks, list_min(ranks)) END AS best
    FROM (
      SELECT word, sym, step, ml,
             list_transform(generate_series(1, len(sym) - 1),
               p -> coalesce(nullif(list_position(ml, sym[p] || chr(9) || sym[p + 1]), 0),
                             999999)) AS ranks
      FROM wapply)
  ) WHERE best IS NOT NULL AND step < 64
), wfinal AS MATERIALIZED (
  SELECT word, len(sym) AS nt
  FROM (SELECT word, sym, row_number() OVER (PARTITION BY word ORDER BY step DESC) AS rn
        FROM wapply)
  WHERE rn = 1
)"""




def _word_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed word-frequency count over ``documents.text`` — the
    one corpus-sized stage.  Lowercased whitespace words; the shuffle
    carries (word, partial_count) after map-side combine, so bytes
    exchanged scale with DISTINCT words per partition, not corpus rows."""
    return (
        table(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def learn_merges(
    histogram: list[tuple[str, int]], n_merges: int = _N_MERGES
) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a (word, freq) histogram: start
    from character symbols (plus the end-of-word sentinel), repeatedly
    merge the most frequent adjacent symbol pair.  Ties break
    lexicographically so the learned vocabulary is deterministic.
    Cost is O(n_merges * distinct_words * avg_word_len) — independent
    of corpus size, which is the point."""
    words: dict[tuple[str, ...], int] = {}
    for word, freq in histogram:
        sym = tuple(word) + (_END,)
        words[sym] = words.get(sym, 0) + freq
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, freq in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        # deterministic tie-break: highest count, then lexicographically
        # smallest pair
        top = max(pairs.values())
        best_pair = min(p for p, c in pairs.items() if c == top)
        merges.append(best_pair)
        merged = "".join(best_pair)
        out: dict[tuple[str, ...], int] = {}
        for sym, freq in words.items():
            i, new = 0, []
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and (sym[i], sym[i + 1]) == best_pair
                ):
                    new.append(merged)
                    i += 2
                else:
                    new.append(sym[i])
                    i += 1
            key = tuple(new)
            out[key] = out.get(key, 0) + freq
        words = out
    return merges


def tokenize_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE apply: repeatedly merge the adjacent pair with the
    lowest learned rank until none applies — the standard inference
    loop (identical to the training merge order by construction)."""
    sym = list(word) + [_END]
    while len(sym) > 1:
        ranked = [
            (ranks.get((a, b)), i)
            for i, (a, b) in enumerate(zip(sym, sym[1:]))
            if (a, b) in ranks
        ]
        if not ranked:
            break
        _, i = min(ranked)
        sym[i : i + 2] = [sym[i] + sym[i + 1]]
    return sym


@register(
    "ext_bpe_train",
    oracle=_bpe_learn_sql() + """
SELECT CAST(i - 1 AS INT) AS rank,
       string_split(pair, chr(9))[1] AS left,
       string_split(pair, chr(9))[2] AS right,
       string_split(pair, chr(9))[1] || string_split(pair, chr(9))[2] AS merged
FROM (SELECT unnest(merges) AS pair, generate_subscripts(merges, 1) AS i
      FROM mtab)
ORDER BY rank
""",
)  # DuckDB-oracled since r14: the learning fixpoint IS expressible as a
# histogram-sized recursive-CTE fold (see _bpe_learn_sql)
def ext_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a BPE merge table on the document corpus: distributed word
    histogram (the only corpus pass), driver-side merge learning on the
    top-``BPE_MAX_WORDS`` histogram rows (bounded collect — vocab-sized
    by construction; the cap plus deterministic (freq desc, word asc)
    ordering keeps the collect identical at any corpus size), returning
    one row per learned merge: (rank, left, right, merged).

    Output is vocab-sized (``BPE_N_MERGES`` rows), so this IS the
    pattern for 100 TB: one word-count shuffle, a few-MB driver
    histogram, a broadcastable merge table out."""
    # Bounded collect: top MAX_WORDS histogram rows, deterministic order.
    hist = [
        (r.word, r.freq)
        for r in _word_histogram(spark, sf_dir)
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(_MAX_WORDS)
        .collect()
    ]
    merges = learn_merges(hist)
    return spark.createDataFrame(
        [
            (rank, left, right, left + right)
            for rank, (left, right) in enumerate(merges)
        ],
        "rank int, left string, right string, merged string",
    )


@register(
    "ext_bpe_tokenize",
    oracle=_bpe_learn_sql() + """
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(f.nt) AS BIGINT) AS n_tokens,
       CAST(max(t.n_chars) AS BIGINT) AS n_chars
FROM toks t JOIN wfinal f USING (word)
GROUP BY t.doc_id
ORDER BY t.doc_id
""",
)  # DuckDB-oracled since r14: learned merges re-derived in-oracle, then the
# exact tokenize_word loop (one merge per step, leftmost lowest rank) runs as
# a second recursive CTE over DISTINCT words
def ext_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize every document with the corpus-trained BPE vocabulary
    and report per-document (n_words, n_tokens, n_chars) — the token
    accounting that sizes a training run.

    The merge-rank dict rides the pandas-UDF closure (vocab-sized, KB);
    each Arrow batch keeps a word→tokens memo so the greedy merge loop
    runs once per DISTINCT word per batch — web text's Zipfian repeat
    structure makes this the dominant saving.  One narrow projection
    pass over the corpus, no shuffle."""
    train = ext_bpe_train(spark, sf_dir)
    # Bounded collect: the vocab-sized merge table.
    ranks = {
        (r.left, r.right): r.rank for r in train.collect()
    }

    @pandas_udf("struct<n_words: long, n_tokens: long>")
    def counts(texts: pd.Series) -> pd.DataFrame:
        memo: dict[str, int] = {}

        def doc_counts(text):
            words = [w for w in (text or "").lower().split() if w]
            total = 0
            for w in words:
                n = memo.get(w)
                if n is None:
                    n = len(tokenize_word(w, ranks))
                    memo[w] = n
                total += n
            return len(words), total

        out = [doc_counts(t) for t in texts]
        return pd.DataFrame(out, columns=["n_words", "n_tokens"])

    return (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.length(F.coalesce(F.col("text"), F.lit(""))).alias("n_chars"),
            counts(F.col("text")).alias("c"),
        )
        .select("doc_id", "c.n_words", "c.n_tokens", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "ext_tokenizer_fertility",
    oracle=_bpe_learn_sql() + """
, per_doc AS (
  SELECT t.doc_id, t.lang, max(t.n_chars) AS n_chars,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(f.nt) AS BIGINT) AS n_tokens
  FROM toks t JOIN wfinal f USING (word)
  GROUP BY 1, 2
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS tokens,
       floor(CAST(sum(n_tokens) AS DOUBLE) / sum(n_words) * 1000000 + 0.5)
         / 1000000.0 AS fertility,
       floor(CAST(sum(n_chars) AS DOUBLE) / sum(n_tokens) * 1000000 + 0.5)
         / 1000000.0 AS bytes_per_token
FROM per_doc GROUP BY lang ORDER BY lang
""",
)  # DuckDB-oracled since r14 via the shared learned-BPE oracle prelude
def ext_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKENIZER FERTILITY by language: tokens/word and bytes/token for
    the corpus-trained BPE vocabulary, per lang tag — the multilingual
    token-budget report (a language with high fertility pays more
    context window and more training FLOPs per word; the number that
    drives vocab-size and data-mixture decisions, cf. the fertility
    tables in the XLM-R / NLLB papers).

    Composes ``ext_bpe_tokenize``'s per-doc exact counts with the lang
    tag: per-lang sums are exact integer aggregates, fertility and
    bytes/token are ONE division each, half-up micro-quantized.
    Rows-only BY DESIGN (inherits the learned-merges dependency); the
    per-doc counts underneath are parity-pinned by the BPE tests."""
    counts = ext_bpe_tokenize(spark, sf_dir)
    langs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    j = counts.join(langs, "doc_id")
    agg = j.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("words"),
        F.sum("n_tokens").cast("long").alias("tokens"),
        F.sum("n_chars").cast("long").alias("chars"),
    )
    q6 = lambda x: F.floor(x * 1000000 + 0.5) / 1000000.0  # noqa: E731
    return agg.select(
        "lang",
        "n_docs",
        "tokens",
        q6(F.col("tokens").cast("double") / F.col("words")).alias("fertility"),
        q6(F.col("chars").cast("double") / F.col("tokens")).alias("bytes_per_token"),
    ).orderBy("lang")


# FROZEN merge table (VERDICT r13 task 5, delivered round 14): the 24
# merges BPE learning produces over the corpus's FIXED 30-word vocabulary
# under UNIFORM weights — corpus-independent constants (re-derivable from
# learn_merges(VOCAB x 1) by anyone), so tokenizer APPLICATION becomes
# SQL-oracle-able: the learned-merges ops stay rows-only because training
# is an iterative fixpoint, but application with a frozen vocabulary is a
# deterministic greedy loop both engines can express.
FROZEN_MERGES: list[tuple[str, str]] = [
    ("e", "</w>"), ("e", "r"), ("er", "</w>"), ("i", "n"), ("o", "r"),
    ("o", "w"), ("ow", "</w>"), ("s", "t"), ("a", "</w>"), ("a", "l"),
    ("a", "r"), ("a", "t"), ("g", "</w>"), ("h", "</w>"), ("n", "</w>"),
    ("p", "ar"), ("t", "</w>"), ("y", "</w>"), ("a", "b"), ("a", "g"),
    ("a", "m"), ("a", "n</w>"), ("a", "s"), ("a", "st"),
]
_FROZEN_RANKS = {pair: i for i, pair in enumerate(FROZEN_MERGES)}

_FROZEN_CASE = "CASE " + " ".join(
    f"WHEN sym[p] = '{left}' AND sym[p + 1] = '{right}' THEN {i}"
    for i, (left, right) in enumerate(FROZEN_MERGES)
) + " ELSE 999 END"


@register(
    "ext_tokenizer_fertility_frozen",
    oracle=f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, lang, length(text) AS n_chars, w AS word
  FROM (SELECT doc_id, lang, text,
               unnest(regexp_split_to_array(lower(coalesce(text, '')), '\\s+')) AS w
        FROM documents)
  WHERE w <> ''
), words AS (SELECT DISTINCT word FROM toks),
init AS (
  SELECT word,
         list_append(list_transform(generate_series(1, length(word)),
                                    i -> word[i]), '</w>') AS sym,
         0 AS step
  FROM words
), steps AS (
  SELECT word, sym, step FROM init
  UNION ALL
  SELECT word,
         list_concat(list_concat(list_slice(sym, 1, best - 1),
                                 [sym[best] || sym[best + 1]]),
                     list_slice(sym, best + 2, len(sym))),
         step + 1
  FROM (
    SELECT word, sym, step,
           CASE WHEN list_min(ranks) = 999 THEN NULL
                ELSE list_position(ranks, list_min(ranks)) END AS best
    FROM (
      SELECT word, sym, step,
             list_transform(generate_series(1, len(sym) - 1),
                            p -> {_FROZEN_CASE}) AS ranks
      FROM steps)
  ) WHERE best IS NOT NULL AND step < 64
), final AS (
  SELECT word, len(sym) AS nt
  FROM (SELECT word, sym, row_number() OVER (PARTITION BY word ORDER BY step DESC) AS rn
        FROM steps)
  WHERE rn = 1
), per_doc AS (
  SELECT t.doc_id, t.lang, max(t.n_chars) AS n_chars,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(f.nt) AS BIGINT) AS n_tokens
  FROM toks t JOIN final f USING (word)
  GROUP BY 1, 2
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS tokens,
       floor(CAST(sum(n_tokens) AS DOUBLE) / sum(n_words) * 1000000 + 0.5)
         / 1000000.0 AS fertility,
       floor(CAST(sum(n_chars) AS DOUBLE) / sum(n_tokens) * 1000000 + 0.5)
         / 1000000.0 AS bytes_per_token
FROM per_doc GROUP BY lang ORDER BY lang
""",
)
def ext_tokenizer_fertility_frozen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKENIZER FERTILITY by language under the FROZEN reference
    vocabulary — the SQL-ORACLED twin of ``ext_tokenizer_fertility``
    (which applies the CORPUS-LEARNED merges and is rows-only because
    training is an iterative fixpoint).  The frozen table is what BPE
    learning produces over the fixed 30-word vocabulary at uniform
    weights — corpus-independent constants — so the greedy merge APPLY
    is deterministic in both engines: the oracle runs it as a recursive
    CTE over distinct words (leftmost-lowest-rank merge per step, the
    exact ``tokenize_word`` tie-break) with a generated rank CASE
    chain; DISTINCT-word grain keeps the recursion vocabulary-sized,
    not corpus-sized, in both engines.

    Spark shape: identical to ``ext_bpe_tokenize`` — ranks ride the
    pandas-UDF closure, per-batch word memo, one narrow corpus pass,
    then the vocabulary-sized per-lang aggregate."""
    docs = table(spark, sf_dir, "documents")

    @pandas_udf("struct<n_words: long, n_tokens: long>")
    def counts(texts: pd.Series) -> pd.DataFrame:
        memo: dict[str, int] = {}

        def doc_counts(text):
            words = [w for w in (text or "").lower().split() if w]
            total = 0
            for w in words:
                n = memo.get(w)
                if n is None:
                    n = len(tokenize_word(w, _FROZEN_RANKS))
                    memo[w] = n
                total += n
            return len(words), total

        out = [doc_counts(t) for t in texts]
        return pd.DataFrame(out, columns=["n_words", "n_tokens"])

    per_doc = docs.select(
        "doc_id",
        "lang",
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("n_chars"),
        counts(F.col("text")).alias("c"),
    ).select("doc_id", "lang", "n_chars", "c.n_words", "c.n_tokens")
    q6 = lambda x: F.floor(x * 1000000 + 0.5) / 1000000.0  # noqa: E731
    agg = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("words"),
        F.sum("n_tokens").cast("long").alias("tokens"),
        F.sum("n_chars").cast("long").alias("chars"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "tokens",
        q6(F.col("tokens").cast("double") / F.col("words")).alias("fertility"),
        q6(F.col("chars").cast("double") / F.col("tokens")).alias("bytes_per_token"),
    ).orderBy("lang")
