"""Independent-reference pins for the frozen-vocab WordPiece tokenizer
(llm/wordpiece.py).  The reference implementation below segments with
an EXPLICIT all-segmentations search (pick the lexicographically-first
segmentation under the greedy order) rather than the operator's
positional loop, plus hand-derived splits for known corpus words."""

from __future__ import annotations

from satellite_data_ingestion_spark import registry
from satellite_data_ingestion_spark.catalog import table
from satellite_data_ingestion_spark.llm.wordpiece import (
    WP_CONT,
    WP_START,
    _WP_MAXLEN,
    wordpiece_counts,
)

SF = "/root/testdata/sf0.001"


def _ref_tokens(word: str):
    """Reference greedy segmentation returning the actual pieces (the
    operator only counts) — written independently, recursive descent."""

    def rec(pos):
        if pos == len(word):
            return []
        vocab = set(WP_START) if pos == 0 else set(WP_CONT)
        for size in range(_WP_MAXLEN, 0, -1):
            piece = word[pos : pos + size]
            if len(piece) == size and piece in vocab:
                rest = rec(pos + size)
                if rest is None:
                    return None
                return [piece] + rest
        return None

    return rec(0)


def test_known_corpus_word_splits():
    expected = {
        "the": 1, "scan": 1, "a": 1, "agg": 1, "dup": 1, "big": 1,
        "filter": 2, "batch": 2, "customer": 2, "merge": 2, "stream": 2,
        "column": 2, "value": 2, "table": 2, "order": 2, "query": 2,
        "group": 2, "line": 2, "small": 2, "slow": 2, "sort": 2,
        "vector": 2, "window": 2, "fast": 2, "part": 2,
        "spark": 3,  # spa + ##r + ##k: no ##rk piece, letter fallback
    }
    for w, n in expected.items():
        ntok, unk = wordpiece_counts(w)
        assert (ntok, unk) == (n, 0), (w, ntok, unk)
        ref = _ref_tokens(w)
        assert ref is not None and len(ref) == n, (w, ref)


def test_unk_fallback():
    # a character outside the frozen alphabet makes the WHOLE word [UNK]
    assert wordpiece_counts("x9z") == (1, 1)
    assert wordpiece_counts("café") == (1, 1)
    # pure-alpha words can never be UNK (single letters cover both forms)
    assert wordpiece_counts("zzzzzq")[1] == 0


def test_wordpiece_tokenize_matches_reference(spark):
    rows = registry.spec("ext_wordpiece_tokenize").fn(spark, SF).collect()
    docs = {
        int(d.doc_id): (d.text or "")
        for d in table(spark, SF, "documents").select("doc_id", "text").collect()
    }
    assert len(rows) > 0
    for r in rows:
        words = [w for w in docs[r.doc_id].lower().split() if w]
        ntok = nunk = 0
        for w in words:
            ref = _ref_tokens(w)
            if ref is None:
                ntok += 1
                nunk += 1
            else:
                ntok += len(ref)
        assert (r.n_words, r.n_tokens, r.n_unk_words) == (len(words), ntok, nunk)
        assert r.n_chars == len(docs[r.doc_id])


def test_wordpiece_fertility_consistent_with_tokenize(spark):
    fert = registry.spec("ext_wordpiece_fertility").fn(spark, SF).collect()
    counts = registry.spec("ext_wordpiece_tokenize").fn(spark, SF).collect()
    langs = {
        int(d.doc_id): d.lang
        for d in table(spark, SF, "documents").select("doc_id", "lang").collect()
    }
    agg: dict = {}
    for r in counts:
        a = agg.setdefault(langs[r.doc_id], [0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += r.n_words
        a[2] += r.n_tokens
        a[3] += r.n_unk_words
        a[4] += r.n_chars
    assert {f.lang for f in fert} == set(agg)
    for f in fert:
        nd, words, toks, unks, chars = agg[f.lang]
        assert (f.n_docs, f.tokens) == (nd, toks)
        assert abs(f.fertility - toks / words) < 2e-6
        assert abs(f.bytes_per_token - chars / toks) < 2e-6
        assert abs(f.unk_rate - unks / words) < 2e-6
        assert f.fertility >= 1.0  # every word is at least one token
