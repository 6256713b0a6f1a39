"""Unigram-LM (SentencePiece-style) tokenizer training — the second half
of the tokenizer story next to BPE (llm/bpe.py), per Kudo 2018
("Subword Regularization", public paper; sentencepiece is the public
reference implementation).

Same scalable decomposition as BPE, which is the point of pairing them:

- the ONLY corpus-sized stage is the distributed word-frequency
  histogram (shared with ``ext_bpe_train`` — one shuffle of compact
  (word, count) pairs with map-side combine, capped at
  ``BPE_MAX_WORDS`` rows in deterministic (freq desc, word asc) order);
- training runs driver-side over that bounded histogram: seed the piece
  inventory with frequent substrings, then alternate Viterbi-EM
  (E-step: best segmentation per DISTINCT word under current piece
  log-probs; M-step: renormalize piece probabilities from the expected
  counts) with loss-ranked pruning until the target vocabulary size —
  so driver state is vocab-sized and corpus-independent, and 100 TB of
  text trains on the same few-MB histogram as 100 MB does;
- application broadcasts the (piece, logprob) table in a pandas-UDF
  closure with a per-batch word→pieces memo, exactly like
  ``ext_bpe_tokenize``.

DuckDB-ORACLED since round 15 (VERDICT r14 task 3): the Viterbi-EM +
pruning fixpoint IS expressible as a HISTOGRAM-sized recursive CTE —
the ``_bpe_learn_sql`` discipline extended with a stage machine (EM
sweep / prune / final-sweep states folding a single probability-array
row) and a FLAT single-fold Viterbi: every histogram word's DP runs in
ONE sequential ``list_reduce`` with per-word base markers and absolute
accumulator indices (``_unigram_learn_sql``).  The flat fold is not a
style choice: DuckDB 1.0.0 miscompiles vectorized nested lambdas under
an outer per-word ``list_transform`` — once CASE branches diverge
(pruned-piece skips), values leak across list entries — and NULL
elements inside nested lambdas trigger the same misalignment, so
skipped candidates are encoded as a ``[-1e18, 0.0]`` sentinel DP value
that loses every comparison, never as NULL.  Cross-engine float
discipline: every probability is an exact int-ratio division, ln() is
bit-identical glibc libm in both engines (verified on 200k random
rationals), DP score sums follow the identical chosen-path association,
and lexicographic piece-sequence tie-breaks map to pid-list comparisons
(pids are assigned in piece order, so int-list order == string-list
order).  The pytest side additionally pins the trainer against an
INDEPENDENTLY-written reference implementation (recursive memoized
Viterbi vs this module's iterative DP; separate EM loop) on both a
synthetic corpus and the real histogram, plus the segmentation's
lossless round-trip and the BPE-vs-unigram fertility comparison.

Capability mapping: the reference repo has no tokenizer; this extends
the SURVEY §2.10 LLM-data surface (VERDICT r12 task 3).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .. import settings
from ..catalog import table
from ..registry import register
from .bpe import _word_histogram

_VOCAB = settings.UNIGRAM_VOCAB
_SEED = settings.UNIGRAM_SEED
_MAX_PIECE = settings.UNIGRAM_MAX_PIECE
_MAX_WORDS = settings.BPE_MAX_WORDS  # shared histogram bound with BPE
_EM_ITERS = 2  # EM sweeps between prune rounds
_PRUNE_FRAC = 0.25  # fraction of prunable pieces dropped per round
_UNK_LOGP = -100.0  # floor log-prob for characters unseen at train time


def _unigram_learn_sql() -> str:
    """The unigram-LM training oracle prelude (VERDICT r14 task 3): the
    seed -> (EM x {_EM_ITERS} -> prune) fixpoint -> final-EM pipeline as
    ONE recursive CTE whose single state row carries the piece
    probability array and folds through a stage machine (stage 0..n-1 =
    EM sweeps, 100 = prune-or-stop, 200 = final sweep, 300 = done).

    Viterbi runs as a FLAT single fold: every histogram word's DP
    positions concatenate into one candidate sequence with a per-word
    base-marker element (candidate ``[[-1, -7]]`` -> DP value
    ``[0.0, 0.0]``) and ABSOLUTE accumulator indices precomputed per
    candidate, so no per-word ``list_transform`` wraps the fold.  DuckDB
    1.0.0 requires this: nested lambdas under an outer transform leak
    values across list entries once CASE branches diverge, and NULL
    elements inside nested lambdas trigger the same vectorizer
    misalignment — hence the ``[-1e18, 0.0]`` loses-everything sentinel
    for pruned-piece candidates instead of NULL (both found live while
    building this oracle; minimal repros pass, the full shape fails).

    DP values encode as ``DOUBLE[] = [score, n_pieces, pid...]``; pids
    are assigned in piece order so the Python lexicographic
    piece-sequence tie-break equals pid-list comparison.  Exactly
    reproduces ``train_unigram`` (pinned by the ext_unigram_train oracle
    MATCH and a synthetic-corpus parity test); the recursion state is
    HISTOGRAM-sized, corpus-independent — the engine's own scale shape."""
    prev = "uacc[CAST(uc[1] AS INT)]"

    def ext(lp: str) -> str:
        return (
            f"list_concat([{prev}[1] + {lp}, {prev}[2] + 1.0], "
            f"list_append(list_slice({prev}, 3, len({prev})), uc[2]))"
        )

    cand_expr = f"""CASE
            WHEN uc[2] = -7 THEN [0.0, 0.0]
            WHEN uc[2] = 0 THEN {ext(f"CAST({_UNK_LOGP} AS DOUBLE)")}
            WHEN probs[CAST(uc[2] AS INT)] > 0 THEN {ext("ln(probs[CAST(uc[2] AS INT)])")}
            ELSE [-1e18, 0.0] END"""
    better = (
        "uc2[1] > ub[1] OR (uc2[1] = ub[1] AND (uc2[2] < ub[2] OR (uc2[2] = ub[2] "
        "AND list_slice(uc2, 3, len(uc2)) < list_slice(ub, 3, len(ub)))))"
    )
    sweep = f"""list_reduce(
          list_concat([[[0.0, 0.0]]], cands),
          (uacc, ucl) -> list_append(uacc,
            list_reduce(
              list_transform(ucl, uc -> {cand_expr}),
              (ub, uc2) -> CASE WHEN {better} THEN uc2 ELSE ub END)))"""
    cnts = """list_transform(generate_series(1, len(probs)), pid ->
        CAST(list_sum(list_transform(generate_series(1, len(freqs)), wi ->
            freqs[wi] * len(list_filter(bl[wi], x -> x = CAST(pid AS DOUBLE)))))
          AS BIGINT))"""
    renorm = """list_transform(generate_series(1, len(probs)), pid ->
        CASE WHEN probs[pid] = 0 THEN 0.0
             WHEN nc[pid] > 0 THEN CAST(nc[pid] AS DOUBLE) / list_sum(nc)
             ELSE 1e-12 END)"""
    prlist = """list_transform(list_sort(list_filter(
        list_transform(generate_series(1, len(probs)),
                       pid -> [CAST(-counts[pid] AS DOUBLE), CAST(pid AS DOUBLE)]),
        x -> probs[CAST(x[2] AS INT)] > 0 AND plens[CAST(x[2] AS INT)] > 1)),
        x -> x[2])"""
    keep_n = f"""CASE WHEN greatest(room, CAST(floor(len(pr) * {1 - _PRUNE_FRAC}) AS INT)) >= len(pr)
                      THEN greatest(0, room)
                      ELSE greatest(room, CAST(floor(len(pr) * {1 - _PRUNE_FRAC}) AS INT)) END"""
    pruned_probs = f"""list_transform(generate_series(1, len(probs)), pid ->
        CASE WHEN plens[pid] = 1 THEN probs[pid]
             WHEN list_contains(list_slice(pr, 1, {keep_n}), CAST(pid AS DOUBLE))
                  THEN probs[pid]
             ELSE 0.0 END)"""
    ei = _EM_ITERS
    return rf"""
WITH RECURSIVE hist AS MATERIALIZED (
  SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(regexp_split_to_array(lower(coalesce(text, '')), '\s+')) AS w
        FROM documents)
  WHERE w <> '' GROUP BY w ORDER BY freq DESC, w LIMIT {_MAX_WORDS}
), subs AS (
  SELECT unnest(subl) AS piece, freq FROM (
    SELECT freq,
           flatten(list_transform(generate_series(0, length(word) - 1), i ->
             list_transform(generate_series(i + 1, least(length(word), i + {_MAX_PIECE})),
                            j -> word[i + 1:j]))) AS subl
    FROM hist)
), scnt AS (SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM subs GROUP BY piece),
nch AS (SELECT count(*) AS nc FROM scnt WHERE length(piece) = 1),
ranked_multi AS (
  SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rn
  FROM scnt WHERE length(piece) > 1
),
inv AS MATERIALIZED (
  SELECT piece, cnt, length(piece) AS plen,
         row_number() OVER (ORDER BY piece) AS pid
  FROM (SELECT piece, cnt FROM scnt WHERE length(piece) = 1
        UNION ALL
        SELECT piece, cnt FROM ranked_multi, nch
        WHERE rn <= greatest(0, {_SEED} - nch.nc))
), invl AS MATERIALIZED (
  SELECT list(piece ORDER BY pid) AS pl,
         list(plen ORDER BY pid) AS plens_,
         list(cnt ORDER BY pid) AS cnts_
  FROM inv
), wcands AS (
  SELECT freq, word,
         2 + coalesce(CAST(sum(length(word) + 1) OVER (
               ORDER BY freq DESC, word
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS INT), 0)
           AS base,
         list_transform(generate_series(1, length(word)), i ->
           list_filter(
             list_transform(generate_series(greatest(0, i - {_MAX_PIECE}), i - 1), j ->
               [CAST(j AS DOUBLE),
                CAST(CASE WHEN list_position(pl, word[j + 1:i]) > 0
                          THEN list_position(pl, word[j + 1:i])
                          WHEN i - j = 1 THEN 0 ELSE -1 END AS DOUBLE)]),
             c -> c[2] >= 0)) AS wc
  FROM hist, invl
), wflat AS (
  -- absolute-indexed candidates: word base marker [[-1, -7]] then the
  -- word's positions with j rebased to base + j (the accumulator slot
  -- holding word[0..j]'s DP value in the ONE flat fold).
  SELECT freq, word, base, length(word) + base AS wend,
         list_concat([[[-1.0, -7.0]]],
           list_transform(wc, cl ->
             list_transform(cl, c -> [c[1] + base, c[2]]))) AS wcabs
  FROM wcands
), statics AS MATERIALIZED (
  SELECT (SELECT list(freq ORDER BY freq DESC, word) FROM wflat) AS freqs,
         (SELECT flatten(list(wcabs ORDER BY freq DESC, word)) FROM wflat) AS cands,
         (SELECT list(CAST(wend AS DOUBLE) ORDER BY freq DESC, word) FROM wflat) AS ends,
         plens_ AS plens,
         list_transform(cnts_, c -> CAST(c AS DOUBLE) / list_sum(cnts_)) AS probs0,
         greatest(0, {_VOCAB} - len(list_filter(plens_, l -> l = 1))) AS room
  FROM invl
), em AS (
  SELECT 0 AS step, 0 AS stage, freqs, cands, ends, plens, room,
         probs0 AS probs, CAST(NULL AS BIGINT[]) AS counts
  FROM statics
  UNION ALL
  SELECT step + 1,
         CASE WHEN stage < {ei - 1} THEN stage + 1
              WHEN stage = {ei - 1} THEN 100
              WHEN stage = 100 AND len(pr) <= room THEN 200
              WHEN stage = 100 THEN 0
              ELSE 300 END,
         freqs, cands, ends, plens, room,
         CASE WHEN stage <= {ei - 1} THEN {renorm}
              WHEN stage = 100 AND len(pr) > room THEN {pruned_probs}
              ELSE probs END,
         CASE WHEN stage <= {ei - 1} OR stage = 200 THEN nc ELSE counts END
  FROM (
    SELECT step, stage, freqs, cands, ends, plens, room, probs, counts, pr,
           CASE WHEN stage <= {ei - 1} OR stage = 200
                THEN {cnts}
                ELSE CAST(NULL AS BIGINT[]) END AS nc
    FROM (
      SELECT step, stage, freqs, cands, ends, plens, room, probs, counts, pr,
             CASE WHEN stage <= {ei - 1} OR stage = 200
                  THEN list_transform(ends, uei ->
                         list_slice(bigacc[CAST(uei AS INT)], 3,
                                    len(bigacc[CAST(uei AS INT)])))
                  ELSE CAST(NULL AS DOUBLE[][]) END AS bl
      FROM (
        SELECT step, stage, freqs, cands, ends, plens, room, probs, counts,
               CASE WHEN stage <= {ei - 1} OR stage = 200
                    THEN {sweep}
                    ELSE CAST(NULL AS DOUBLE[][]) END AS bigacc,
               CASE WHEN stage = 100 THEN {prlist}
                    ELSE CAST(NULL AS DOUBLE[]) END AS pr
        FROM em WHERE stage <> 300
      )
    )
  )
), fin AS MATERIALIZED (
  SELECT probs, counts, list_sum(counts) AS tot
  FROM em WHERE stage = 300
)"""


_UNIGRAM_TRAIN_TAIL = """
SELECT CAST(row_number() OVER (ORDER BY lp DESC, piece) - 1 AS INT) AS rank,
       piece,
       floor(lp * 1e10 + 0.5) / 1e10 AS logprob,
       plen = 1 AS is_char
FROM (
  SELECT i.piece, i.plen,
         CASE WHEN f.counts[i.pid] > 0
              THEN ln(CAST(f.counts[i.pid] AS DOUBLE) / f.tot)
              ELSE -100.0 END AS lp
  FROM inv i, fin f
  WHERE f.probs[i.pid] > 0
)
ORDER BY rank
"""


def _unigram_tokenize_sql() -> str:
    """Application tail over the training prelude: released (piece,
    logprob) array from ``fin``, then the same flat-fold Viterbi —
    COUNT-only DP values ``[score, n_pieces]`` since the lexicographic
    tie-break cannot change the token count — over the distinct corpus
    words, then per-doc sums (the ``ext_bpe_tokenize`` oracle shape).
    Dead pieces are marked ``+1.0`` (an impossible log-prob), never
    NULL — the DuckDB lambda-NULL misalignment note above."""
    prev = "uacc[CAST(uc[1] AS INT)]"

    def ext(lp: str) -> str:
        return f"[{prev}[1] + {lp}, {prev}[2] + 1.0]"

    cand_expr = f"""CASE
            WHEN uc[2] = -7 THEN [0.0, 0.0]
            WHEN uc[2] = 0 THEN {ext(f"CAST({_UNK_LOGP} AS DOUBLE)")}
            WHEN rel[CAST(uc[2] AS INT)] <= 0 THEN {ext("rel[CAST(uc[2] AS INT)]")}
            ELSE [-1e18, 0.0] END"""
    better = "uc2[1] > ub[1] OR (uc2[1] = ub[1] AND uc2[2] < ub[2])"
    sweep = f"""list_reduce(
          list_concat([[[0.0, 0.0]]], cands),
          (uacc, ucl) -> list_append(uacc,
            list_reduce(
              list_transform(ucl, uc -> {cand_expr}),
              (ub, uc2) -> CASE WHEN {better} THEN uc2 ELSE ub END)))"""
    return rf""", rel AS MATERIALIZED (
  SELECT list_transform(generate_series(1, len(f.probs)), pid ->
           CASE WHEN f.probs[pid] = 0 THEN 1.0
                WHEN f.counts[pid] > 0
                  THEN ln(CAST(f.counts[pid] AS DOUBLE) / f.tot)
                ELSE CAST({_UNK_LOGP} AS DOUBLE) END) AS rel
  FROM fin f
), app AS MATERIALIZED (
  SELECT (SELECT list(word ORDER BY freq DESC, word) FROM wflat) AS wl,
         list_transform(s.ends, uei ->
           CAST(({sweep})[CAST(uei AS INT)][2] AS BIGINT)) AS nts
  FROM statics s, rel
), wnt AS (
  SELECT unnest(wl) AS word, unnest(nts) AS nt FROM app
), toks AS (
  SELECT doc_id, length(coalesce(text, '')) AS n_chars, w AS word
  FROM (SELECT doc_id, text,
               unnest(regexp_split_to_array(lower(coalesce(text, '')), '\s+')) AS w
        FROM documents)
  WHERE w <> ''
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(f.nt) AS BIGINT) AS n_tokens,
       CAST(max(t.n_chars) AS BIGINT) AS n_chars
FROM toks t JOIN wnt f USING (word)
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


def seed_pieces(histogram: list[tuple[str, int]]) -> dict[str, float]:
    """Initial piece inventory: every substring of length <= _MAX_PIECE
    of every histogram word, counted with the word's frequency, capped
    at the _SEED highest-count pieces (ties lexicographic) — plus ALL
    single characters unconditionally, so every word stays segmentable
    through every prune round.  Returns piece -> initial probability
    (count-proportional)."""
    counts: dict[str, int] = {}
    chars: set[str] = set()
    for word, freq in histogram:
        chars.update(word)
        n = len(word)
        for i in range(n):
            for j in range(i + 1, min(n, i + _MAX_PIECE) + 1):
                p = word[i:j]
                counts[p] = counts.get(p, 0) + freq
    multi = sorted(
        (p for p in counts if len(p) > 1),
        key=lambda p: (-counts[p], p),
    )[: max(0, _SEED - len(chars))]
    keep = chars | set(multi)
    total = sum(counts[p] for p in keep)
    return {p: counts[p] / total for p in sorted(keep)}


def viterbi(word: str, logp: dict[str, float]) -> list[str]:
    """Best segmentation of *word* under piece log-probs: iterative DP
    maximizing the summed log-prob; ties prefer FEWER pieces, then the
    lexicographically smaller piece sequence (deterministic).  Unknown
    single characters fall back to _UNK_LOGP so segmentation never
    fails."""
    n = len(word)
    # best[i] = (score, n_pieces, pieces) for word[:i]
    best: list[tuple[float, int, list[str]]] = [(0.0, 0, [])] + [
        (-math.inf, 0, [])
    ] * n
    for i in range(1, n + 1):
        cand = None
        for j in range(max(0, i - _MAX_PIECE), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j > 1:
                    continue
                lp = _UNK_LOGP
            score = best[j][0] + lp
            key = (score, -(best[j][1] + 1))
            if cand is None or key > cand[0] or (
                key == cand[0] and best[j][2] + [piece] < cand[1]
            ):
                cand = (key, best[j][2] + [piece])
        best[i] = (cand[0][0], -cand[0][1], cand[1])
    return best[n][2]


def _em_round(
    histogram: list[tuple[str, int]], probs: dict[str, float]
) -> dict[str, int]:
    """One hard-EM E-step: Viterbi-segment every distinct word, return
    expected piece counts (weighted by word frequency)."""
    logp = {p: math.log(q) for p, q in probs.items() if q > 0}
    counts: dict[str, int] = {}
    for word, freq in histogram:
        for piece in viterbi(word, logp):
            counts[piece] = counts.get(piece, 0) + freq
    return counts


def train_unigram(
    histogram: list[tuple[str, int]], vocab_size: int = _VOCAB
) -> list[tuple[str, float]]:
    """Train the unigram-LM piece vocabulary: seed -> alternate
    (_EM_ITERS hard-EM sweeps, prune the lowest-expected-count quarter
    of multi-char pieces) until <= *vocab_size* pieces remain, then one
    final EM sweep sets the released probabilities.  Single characters
    are never pruned (segmentation totality).  Returns (piece, logprob)
    sorted by (count desc, piece asc) — fully deterministic.

    Cost: O(rounds * distinct_words * word_len * _MAX_PIECE) driver-side
    — corpus-independent, exactly BPE's bound."""
    probs = seed_pieces(histogram)
    chars = {p for p in probs if len(p) == 1}
    while True:
        counts: dict[str, int] = {}
        for _ in range(_EM_ITERS):
            counts = _em_round(histogram, probs)
            total = sum(counts.values())
            # M-step over SURVIVING pieces only; unused pieces keep an
            # epsilon so a later round can resurrect them pre-prune.
            probs = {
                p: (counts.get(p, 0) / total) if counts.get(p) else 1e-12
                for p in probs
            }
        prunable = sorted(
            (p for p in probs if p not in chars),
            key=lambda p: (-counts.get(p, 0), p),
        )
        room = vocab_size - len(chars)
        if len(prunable) <= max(0, room):
            break
        keep_n = max(room, int(len(prunable) * (1 - _PRUNE_FRAC)))
        if keep_n >= len(prunable):
            keep_n = max(0, room)
        probs = {p: probs[p] for p in chars | set(prunable[:keep_n])}
    counts = _em_round(histogram, probs)
    total = sum(counts.values())
    out = [
        (p, math.log(counts[p] / total))
        for p in probs
        if counts.get(p)
    ]
    # pieces with zero final count (possible for seldom-chosen chars)
    # are released at the UNK floor rather than dropped: totality.
    out += [(p, _UNK_LOGP) for p in probs if not counts.get(p)]
    out.sort(key=lambda t: (-t[1], t[0]))
    return out


def _trained_vocab(spark: SparkSession, sf_dir: str) -> list[tuple[str, float]]:
    hist = [
        (r.word, r.freq)
        for r in _word_histogram(spark, sf_dir)
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(_MAX_WORDS)
        .collect()
    ]
    return train_unigram(hist)


@register("ext_unigram_train", oracle=_unigram_learn_sql() + _UNIGRAM_TRAIN_TAIL)
def ext_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the unigram-LM piece vocabulary on the document corpus:
    distributed word histogram (the only corpus pass, shared with
    ``ext_bpe_train``), driver-side Viterbi-EM + pruning over the
    bounded histogram, one row per released piece:
    (rank, piece, logprob, is_char).

    DuckDB-oracled since r15: the whole EM + prune fixpoint re-derives
    in-oracle as the ``_unigram_learn_sql`` recursive CTE; released
    log-probs are half-up micro-quantized at 10 decimals in BOTH
    engines (they are bit-identical doubles before rounding — same
    int-ratio divisions, same libm ln, same DP association — the
    rounding is belt-and-braces against future libm drift).

    Output is vocab-sized (``UNIGRAM_VOCAB`` rows), so this IS the
    100 TB pattern: one word-count shuffle, a few-MB driver histogram,
    a broadcastable probability table out."""
    vocab = _trained_vocab(spark, sf_dir)
    return spark.createDataFrame(
        [
            (rank, piece, math.floor(lp * 1e10 + 0.5) / 1e10, len(piece) == 1)
            for rank, (piece, lp) in enumerate(vocab)
        ],
        "rank int, piece string, logprob double, is_char boolean",
    )


@register(
    "ext_unigram_tokenize",
    oracle=_unigram_learn_sql() + _unigram_tokenize_sql(),
)  # oracle applies the in-SQL-trained vocab to the histogram words; exact
# whenever distinct corpus words <= BPE_MAX_WORDS (true at every test SF:
# this corpus has a 31-word type vocabulary) — past the cap the Spark side
# still tokenizes tail words via UNK fallback while the oracle's join
# drops them, the same histogram-cap contract the trainer itself has
def ext_unigram_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize every document with the corpus-trained unigram-LM
    vocabulary (Viterbi decode) and report per-document
    (n_words, n_tokens, n_chars) — the same accounting surface as
    ``ext_bpe_tokenize``, so the two tokenizers are directly comparable
    (the fertility-vs-BPE comparison is test-pinned).

    The (piece, logprob) dict rides the pandas-UDF closure (vocab-sized,
    KB); each Arrow batch memoizes word→piece-count so the DP runs once
    per DISTINCT word per batch.  One narrow projection pass, no
    shuffle."""
    logp = {p: lp for p, lp in _trained_vocab(spark, sf_dir)}

    @pandas_udf("struct<n_words: long, n_tokens: long>")
    def counts(texts: pd.Series) -> pd.DataFrame:
        memo: dict[str, int] = {}

        def doc_counts(text):
            words = [w for w in (text or "").lower().split() if w]
            total = 0
            for w in words:
                n = memo.get(w)
                if n is None:
                    n = len(viterbi(w, logp))
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
