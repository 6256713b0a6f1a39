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

Registered rows-only: EM + pruning is an iterative fixpoint no SQL
oracle can express.  The pytest side pins the trainer against an
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


@register("ext_unigram_train")  # iterative EM fixpoint → rows-only
def ext_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the unigram-LM piece vocabulary on the document corpus:
    distributed word histogram (the only corpus pass, shared with
    ``ext_bpe_train``), driver-side Viterbi-EM + pruning over the
    bounded histogram, one row per released piece:
    (rank, piece, logprob, is_char).

    Output is vocab-sized (``UNIGRAM_VOCAB`` rows), so this IS the
    100 TB pattern: one word-count shuffle, a few-MB driver histogram,
    a broadcastable probability table out."""
    vocab = _trained_vocab(spark, sf_dir)
    return spark.createDataFrame(
        [
            (rank, piece, round(lp, 10), len(piece) == 1)
            for rank, (piece, lp) in enumerate(vocab)
        ],
        "rank int, piece string, logprob double, is_char boolean",
    )


@register("ext_unigram_tokenize")  # depends on trained vocab → rows-only
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
