"""Semantic pins for the dataset-shaping operators (llm/shaping.py)."""

import os

from pyspark.sql import functions as F

from satellite_data_ingestion_spark import registry
from satellite_data_ingestion_spark.llm import shaping

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_chunks_cover_every_token_exactly_where_overlap_says(spark):
    chunks = registry.spec("ext_doc_chunk").fn(spark, SF_DIR)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_tok = docs.select(F.size(F.split("text", " ")).alias("n"), "doc_id")
    joined = (
        chunks.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.max(F.col("chunk_idx")).alias("last_idx"),
            F.sum("n_tokens").alias("tok_in_chunks"),
        )
        .join(n_tok, "doc_id")
        .collect()
    )
    for r in joined:
        # chunk count = number of stride starts below n
        expect_chunks = (r.n + shaping._CHUNK_STRIDE - 1) // shaping._CHUNK_STRIDE
        assert r.n_chunks == expect_chunks
        assert r.last_idx == expect_chunks - 1
        # every token appears at least once (chunks over-cover via overlap)
        assert r.tok_in_chunks >= r.n


def test_pack_offsets_stay_under_budget_and_bins_are_contiguous(spark):
    packed = registry.spec("ext_seq_pack").fn(spark, SF_DIR)
    rows = packed.orderBy("source", "doc_id").collect()
    assert all(0 <= r.offset_in_bin < shaping._PACK_BUDGET for r in rows)
    assert all(r.shard == r.doc_id % shaping._PACK_SHARDS for r in rows)
    by_window: dict[tuple, list] = {}
    for r in rows:
        by_window.setdefault((r.source, r.shard), []).append(r)
    for rs in by_window.values():
        bins = [r.bin_id for r in rs]
        assert bins == sorted(bins), "bin ids must be nondecreasing in doc order"
        assert bins[0] == 0


def test_mix_sample_rates_land_near_targets(spark):
    rows = registry.spec("ext_mix_sample").fn(spark, SF_DIR).collect()
    for r in rows:
        rate = (
            shaping._MIX_EVEN_RATE
            if int(r.source[3:]) % 2 == 0
            else shaping._MIX_ODD_RATE
        )
        if rate >= 1.0:
            assert r.n_kept == r.n_total, r.source
        else:
            # md5 uniformity: binomial tolerance on small per-source counts
            assert abs(r.n_kept / r.n_total - rate) < 0.2, r.source


def test_repetition_score_flags_planted_boilerplate(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),
            (2, "alpha beta gamma delta epsilon zeta"),
        ],
        "doc_id int, text string",
    )
    d = df.select(
        "doc_id",
        F.split("text", " ").alias("toks"),
        F.size(F.split("text", " ")).alias("n"),
    )
    out = {
        r.doc_id: r
        for r in d.select(
            "doc_id",
            F.round(
                1.0 - F.size(F.array_distinct("toks")).cast("double") / F.col("n"), 6
            ).alias("dup_token_ratio"),
        ).collect()
    }
    assert out[1].dup_token_ratio > 0.8
    assert out[2].dup_token_ratio == 0.0


def test_repetition_score_handles_single_token_docs(spark):
    """sequence(1, 0) in Spark auto-steps DOWN — a single-token doc must
    not crash the bigram expansion (regression for the n>=2 guard)."""
    df = spark.createDataFrame(
        [(1, ["only"], 1), (2, ["a", "b", "a", "b"], 4)],
        "doc_id int, toks array<string>, n int",
    )
    rows = {r.doc_id: r for r in shaping.repetition_scores(df).collect()}
    assert rows[1].top_bigram_ratio is None and rows[1].n_tokens == 1
    assert rows[2].top_bigram_ratio == round(2 / 3, 6)
