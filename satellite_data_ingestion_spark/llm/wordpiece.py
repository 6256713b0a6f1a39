"""WordPiece tokenization (round 15): greedy LONGEST-MATCH-FIRST
subword segmentation with a FROZEN vocabulary — the third tokenizer
family next to BPE (llm/bpe.py, iterative merge application) and
unigram-LM (llm/unigram.py, Viterbi) that a training-data pipeline has
to account tokens with (BERT-style models tokenize exactly this way).

Unlike BPE's merge loop, WordPiece application is a single greedy scan:
at each position take the LONGEST vocabulary piece that matches (word-
initial pieces at position 1, ``##`` continuation pieces after), and if
no piece matches the whole word becomes one [UNK] token.  With a frozen
vocabulary that loop is a deterministic integer state machine, so the
op is FULLY SQL-oracled: a recursive CTE advances (word, pos, n_tokens)
one piece per step, taking max(piece_len) over the matching pieces —
the ``ext_tokenizer_fertility_frozen`` discipline (llm/bpe.py).

The frozen vocabulary is a corpus-independent constant published below
(the ``FROZEN_MERGES`` posture): all 26 single letters in both start
and continuation form (so pure-alpha words never hit [UNK] — the
fallback path stays exercised via the per-word unk counter), the
highest-frequency corpus words as whole pieces, and prefix/suffix
pieces that give the remaining vocabulary a realistic 2-3 token split.

Scale shape: the piece dict rides the pandas-UDF closure (KB); each
Arrow batch keeps a word→(tokens, unk) memo so the greedy loop runs
once per DISTINCT word per batch; one narrow projection pass over the
corpus, no shuffle (the ext_bpe_tokenize shape).

Reference analog: none — [EXT] LLM-pipeline mandate territory
(BASELINE.json:6), like llm/bpe.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..catalog import table
from ..registry import register

_ALPHA = "abcdefghijklmnopqrstuvwxyz"

# Word-initial pieces: every single letter + whole-word pieces for the
# highest-frequency corpus words + prefix pieces for the rest.
WP_START: tuple[str, ...] = tuple(_ALPHA) + (
    "the", "scan", "hash", "join", "key", "row", "data", "agg", "dup", "big",
    "filt", "bat", "cust", "mer", "str", "col", "val", "tab", "ord", "qu",
    "gro", "lin", "sma", "slo", "sor", "spa", "vec", "win", "fas", "par",
)
# Continuation pieces (the ## forms): every single letter + the suffix
# pieces that close out the corpus words in one hop.
WP_CONT: tuple[str, ...] = tuple(_ALPHA) + (
    "er", "ch", "omer", "ge", "eam", "umn", "ue", "le", "ery", "up",
    "ll", "rt", "st", "ark", "dow", "tor", "ine", "ter",
)
_WP_MAXLEN = 4

_START_SET = frozenset(WP_START)
_CONT_SET = frozenset(WP_CONT)


def wordpiece_counts(word: str) -> tuple[int, int]:
    """(n_tokens, is_unk) for one word under the frozen vocabulary —
    the greedy longest-match-first WordPiece loop."""
    n, p, ln = 0, 0, len(word)
    while p < ln:
        vocab = _START_SET if p == 0 else _CONT_SET
        for size in range(min(_WP_MAXLEN, ln - p), 0, -1):
            if word[p : p + size] in vocab:
                n += 1
                p += size
                break
        else:
            return 1, 1  # no piece matches: the whole word is one [UNK]
    return n, 0


def _pieces_values() -> str:
    rows = [f"('{pc}', {len(pc)}, 0)" for pc in WP_START] + [
        f"('{pc}', {len(pc)}, 1)" for pc in WP_CONT
    ]
    return ", ".join(rows)


@register(
    "ext_wordpiece_tokenize",
    oracle=f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, length(coalesce(text, '')) AS n_chars, w AS word
  FROM (SELECT doc_id, text,
               unnest(regexp_split_to_array(lower(coalesce(text, '')), '\\s+'))
                 AS w
        FROM documents)
  WHERE w <> ''
),
pieces(pc, plen, cont) AS (VALUES {_pieces_values()}),
words0 AS (SELECT DISTINCT word FROM toks),
st AS (
  SELECT word, CAST(length(word) AS BIGINT) AS wlen, CAST(1 AS BIGINT) AS p,
         CAST(0 AS BIGINT) AS ntok, 0 AS unk
  FROM words0
  UNION ALL
  SELECT s.word, s.wlen,
         CASE WHEN max(v.plen) IS NULL THEN s.wlen + 1
              ELSE s.p + max(v.plen) END,
         CASE WHEN max(v.plen) IS NULL THEN CAST(1 AS BIGINT)
              ELSE s.ntok + 1 END,
         CASE WHEN max(v.plen) IS NULL THEN 1 ELSE 0 END
  FROM st s
  LEFT JOIN pieces v
    ON v.cont = (CASE WHEN s.p = 1 THEN 0 ELSE 1 END)
   AND v.plen <= s.wlen - s.p + 1
   AND substr(s.word, CAST(s.p AS INT), v.plen) = v.pc
  WHERE s.p <= s.wlen AND s.unk = 0
  GROUP BY s.word, s.wlen, s.p, s.ntok, s.unk
),
wfinal AS (SELECT word, ntok, unk FROM st WHERE p = wlen + 1)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(f.ntok) AS BIGINT) AS n_tokens,
       CAST(sum(f.unk) AS BIGINT) AS n_unk_words,
       CAST(max(t.n_chars) AS BIGINT) AS n_chars
FROM toks t JOIN wfinal f USING (word)
GROUP BY t.doc_id
ORDER BY t.doc_id
""",
)
def ext_wordpiece_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize every document with the FROZEN WordPiece vocabulary and
    report per-document (n_words, n_tokens, n_unk_words, n_chars) — the
    BERT-style token accounting next to ``ext_bpe_tokenize``'s merge
    loop and ``ext_unigram_tokenize``'s Viterbi, with the [UNK]
    fallback surfaced as its own counter (the number a curation team
    watches: rising UNK share means the corpus drifted off-vocabulary).

    Greedy longest-match-first per word; the oracle replays the
    identical loop as a recursive-CTE state machine over DISTINCT words
    (max piece length per step == the greedy choice), so every count is
    an exact integer hash-match.  Scale: KB vocab in the UDF closure,
    per-batch word memo, one projection pass, no shuffle."""

    @pandas_udf("struct<n_words: long, n_tokens: long, n_unk_words: long>")
    def counts(texts: pd.Series) -> pd.DataFrame:
        memo: dict[str, tuple[int, int]] = {}

        def doc_counts(text):
            words = [w for w in (text or "").lower().split() if w]
            ntok = nunk = 0
            for w in words:
                r = memo.get(w)
                if r is None:
                    r = wordpiece_counts(w)
                    memo[w] = r
                ntok += r[0]
                nunk += r[1]
            return len(words), ntok, nunk

        out = [doc_counts(t) for t in texts]
        return pd.DataFrame(out, columns=["n_words", "n_tokens", "n_unk_words"])

    return (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.length(F.coalesce(F.col("text"), F.lit(""))).alias("n_chars"),
            counts(F.col("text")).alias("c"),
        )
        .select("doc_id", "c.n_words", "c.n_tokens", "c.n_unk_words", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "ext_wordpiece_fertility",
    oracle=f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, lang, length(coalesce(text, '')) AS n_chars, w AS word
  FROM (SELECT doc_id, lang, text,
               unnest(regexp_split_to_array(lower(coalesce(text, '')), '\\s+'))
                 AS w
        FROM documents)
  WHERE w <> ''
),
pieces(pc, plen, cont) AS (VALUES {_pieces_values()}),
words0 AS (SELECT DISTINCT word FROM toks),
st AS (
  SELECT word, CAST(length(word) AS BIGINT) AS wlen, CAST(1 AS BIGINT) AS p,
         CAST(0 AS BIGINT) AS ntok, 0 AS unk
  FROM words0
  UNION ALL
  SELECT s.word, s.wlen,
         CASE WHEN max(v.plen) IS NULL THEN s.wlen + 1
              ELSE s.p + max(v.plen) END,
         CASE WHEN max(v.plen) IS NULL THEN CAST(1 AS BIGINT)
              ELSE s.ntok + 1 END,
         CASE WHEN max(v.plen) IS NULL THEN 1 ELSE 0 END
  FROM st s
  LEFT JOIN pieces v
    ON v.cont = (CASE WHEN s.p = 1 THEN 0 ELSE 1 END)
   AND v.plen <= s.wlen - s.p + 1
   AND substr(s.word, CAST(s.p AS INT), v.plen) = v.pc
  WHERE s.p <= s.wlen AND s.unk = 0
  GROUP BY s.word, s.wlen, s.p, s.ntok, s.unk
),
wfinal AS (SELECT word, ntok, unk FROM st WHERE p = wlen + 1),
per_doc AS (
  SELECT t.doc_id, t.lang, max(t.n_chars) AS n_chars,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(f.ntok) AS BIGINT) AS n_tokens,
         CAST(sum(f.unk) AS BIGINT) AS n_unk
  FROM toks t JOIN wfinal f USING (word)
  GROUP BY 1, 2
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS tokens,
       floor(CAST(sum(n_tokens) AS DOUBLE) / sum(n_words) * 1000000 + 0.5)
         / 1000000.0 AS fertility,
       floor(CAST(sum(n_chars) AS DOUBLE) / sum(n_tokens) * 1000000 + 0.5)
         / 1000000.0 AS bytes_per_token,
       floor(CAST(sum(n_unk) AS DOUBLE) / sum(n_words) * 1000000 + 0.5)
         / 1000000.0 AS unk_rate
FROM per_doc GROUP BY lang ORDER BY lang
""",
)
def ext_wordpiece_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WORDPIECE FERTILITY by language: tokens/word, bytes/token, and
    the [UNK] word rate for the frozen vocabulary, per lang tag — the
    BERT-family counterpart of ``ext_tokenizer_fertility_frozen``
    (BPE), and the table that tells a multilingual curation team which
    languages this vocabulary under-serves (high fertility or nonzero
    UNK = wasted context window / lost text).

    Composes ``ext_wordpiece_tokenize``'s exact per-doc counts with the
    lang tag; per-lang sums are exact integers, the three ratios one
    pinned division each.  Fully hash-oracled (the frozen-vocab oracle
    prelude is shared verbatim).  Scale: same single projection pass,
    then a |langs|-row aggregate."""
    counts = ext_wordpiece_tokenize(spark, sf_dir)
    langs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    j = counts.join(langs, "doc_id")
    agg = j.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("words"),
        F.sum("n_tokens").cast("long").alias("tokens"),
        F.sum("n_unk_words").cast("long").alias("unks"),
        F.sum("n_chars").cast("long").alias("chars"),
    )
    q6 = lambda x: F.floor(x * 1000000 + 0.5) / 1000000.0  # noqa: E731
    return agg.select(
        "lang",
        "n_docs",
        "tokens",
        q6(F.col("tokens").cast("double") / F.col("words")).alias("fertility"),
        q6(F.col("chars").cast("double") / F.col("tokens")).alias("bytes_per_token"),
        q6(F.col("unks").cast("double") / F.col("words")).alias("unk_rate"),
    ).orderBy("lang")
