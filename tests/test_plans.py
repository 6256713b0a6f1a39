"""Physical-plan assertions: the scale properties the engine promises.

Correctness tests prove values; these prove the PLAN — pushdown reaching
the scan, dimensions broadcast, single-shuffle aggregates — so a refactor
that silently de-optimizes a query fails CI even though values still match.
"""

from __future__ import annotations

import re

import pytest

from satellite_data_ingestion_spark import registry
from tests.conftest import SF_SMOKE

registry.load_all()


def formatted_plan(spark, df) -> str:
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(jmode)


def plan_of(spark, name: str) -> str:
    df = registry.spec(name).fn(spark, SF_SMOKE)
    return formatted_plan(spark, df)


def test_time_window_pushdown(spark):
    """The ±30-min bounds must reach the parquet scan on the raw column."""
    plan = plan_of(spark, "filter_time_window")
    pushed = " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
    assert "GreaterThanOrEqual(ts" in pushed and "LessThanOrEqual(ts" in pushed, pushed


def test_q1_filter_pushdown_and_single_shuffle(spark):
    plan = plan_of(spark, "agg_hash_group")
    pushed = " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
    assert "LessThanOrEqual(l_shipdate" in pushed, pushed
    # tree section lists each node once before the details section
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1, tree
    assert "partial_sum" in plan  # map-side combine present


def test_q1_column_pruning(spark):
    plan = plan_of(spark, "agg_hash_group")
    schema = re.search(r"ReadSchema: (\S+)", plan).group(1)
    assert "l_orderkey" not in schema and "l_partkey" not in schema, schema


def test_dimension_joins_broadcast(spark):
    plan = plan_of(spark, "join_broadcast")
    tree = plan.split("\n\n")[0]
    assert tree.count("BroadcastHashJoin") == 2, tree
    assert "SortMergeJoin" not in tree and "CartesianProduct" not in tree


def test_topn_avoids_global_sort(spark):
    plan = plan_of(spark, "limit_topn")
    assert "TakeOrderedAndProject" in plan, plan


@pytest.mark.parametrize(
    "name",
    ["join_equi_inner", "join_semi", "join_anti", "join_range", "win_rank"],
)
def test_no_cartesian_products(spark, name):
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


def test_minhash_no_cartesian(spark):
    """The LSH pipeline must join on bucket keys, never cross-join docs."""
    plan = plan_of(spark, "ext_dedup_minhash")
    assert "CartesianProduct" not in plan


def test_bucketed_join_has_no_exchange(spark):
    """Co-located bucketed join: zero Exchange nodes in the whole plan —
    the join and the keyed aggregate both reuse the bucket partitioning."""
    plan = plan_of(spark, "join_bucketed")
    tree = plan.split("\n\n")[0]
    assert "SortMergeJoin" in tree, tree
    assert "Exchange" not in tree, tree


def test_q6_pushdown_and_pruning(spark):
    """All three Q6 predicates reach the lineitem scan; only the four
    referenced columns are read."""
    plan = plan_of(spark, "q6_forecast_revenue")
    pushed = " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
    for frag in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount",
        "LessThan(l_quantity",
    ):
        assert frag in pushed, pushed
    schema = re.search(r"ReadSchema: (\S+)", plan).group(1)
    assert "l_extendedprice" in schema and "l_orderkey" not in schema, schema


def test_q3_selective_filters_pushed(spark):
    plan = plan_of(spark, "q3_shipping_priority")
    pushed = " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
    assert "EqualTo(c_mktsegment,BUILDING)" in pushed, pushed
    assert "LessThan(o_orderdate" in pushed, pushed
    assert "GreaterThan(l_shipdate" in pushed, pushed
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name,min_broadcasts",
    [
        # Only fixed-cardinality nation/region carry hints; the other
        # dimension broadcasts below come from size stats (at SF_SMOKE) or
        # AQE at runtime — the assertion is that the planner DOES pick
        # broadcast for sub-threshold dims without a forced hint.
        ("q5_local_supplier_volume", 3),  # nation+region hinted, supplier by stats
        ("q14_promo_effect", 1),  # part by stats
        ("q19_discounted_revenue", 1),  # part by stats
    ],
)
def test_composite_dimensions_broadcast(spark, name, min_broadcasts):
    plan = plan_of(spark, name)
    tree = plan.split("\n\n")[0]
    assert tree.count("BroadcastHashJoin") >= min_broadcasts, tree
    assert "CartesianProduct" not in tree


def test_q18_semi_join_for_having_subquery(spark):
    """The IN (… HAVING …) subquery must plan as a semi join, not a
    row-multiplying inner join + distinct."""
    plan = plan_of(spark, "q18_large_volume_customer")
    assert "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan


def test_quality_score_is_shuffle_free(spark):
    """The quality gate is a pure projection: scan → project, no Exchange."""
    plan = plan_of(spark, "ext_quality_score")
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree, tree


def test_ngram_profile_topk_no_global_sort(spark):
    """Corpus bigram top-k must be TakeOrderedAndProject above the count
    aggregate — per-partition heaps, not a full sort of the census."""
    plan = plan_of(spark, "ext_ngram_profile")
    assert "TakeOrderedAndProject" in plan, plan


@pytest.mark.parametrize("name", ["ext_pii_mask", "ext_dataset_split", "fn_str_distance"])
def test_text_ops_scan_shaped(spark, name):
    """Text projections stay shuffle-free (dataset_split's single exchange
    is its census aggregate); none may plan a join or cartesian."""
    plan = plan_of(spark, name)
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree and "Join" not in tree, tree
    max_exchanges = 1 if name == "ext_dataset_split" else 0
    assert tree.count("Exchange") <= max_exchanges, tree


def test_static_partition_pruning(spark):
    """The day-range filter must become PartitionFilters on the staged
    day-partitioned scan — pruned directories are never listed."""
    df = registry.spec("scan_partition_pruned").fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "day" in plan, plan


def test_dynamic_partition_pruning(spark):
    """The runtime dim filter must inject a dynamicpruning subquery into
    the fact scan's partition listing."""
    df = registry.spec("join_dpp").fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan


def test_prefix_filter_join_keys_on_tokens_not_source(spark):
    """ext_ngram_jaccard's only pairwise stage must be an equi-join keyed
    on prefix tokens (rare by df-ordering) — no cartesian, no join keyed
    solely on a low-cardinality column."""
    plan = plan_of(spark, "ext_ngram_jaccard")
    assert "CartesianProduct" not in plan
    assert "ptok" in plan  # candidate join carries the prefix-token key


def test_tiled_embedding_join_keys_include_tiles(spark):
    """ext_dedup_embedding must join on (label, ti, tj) — the bounded
    tile key — never on label alone."""
    plan = plan_of(spark, "ext_dedup_embedding")
    assert "CartesianProduct" not in plan
    assert "ti" in plan and "tj" in plan


def test_tfidf_is_single_job_with_broadcasts(spark):
    """Corpus count must be folded into the plan (broadcast 1-row agg),
    and the vocabulary side must broadcast onto the tf rows."""
    plan = plan_of(spark, "ext_tfidf")
    tree = plan.split("\n\n")[0]
    assert tree.count("BroadcastExchange") >= 2, tree


def test_doc_chunk_is_shuffle_free(spark):
    tree = plan_of(spark, "ext_doc_chunk").split("\n\n")[0]
    assert "Exchange" not in tree, tree


def test_seq_pack_single_shuffle(spark):
    """One window over source: exactly one exchange, no join."""
    tree = plan_of(spark, "ext_seq_pack").split("\n\n")[0]
    assert tree.count("Exchange") == 1, tree


def test_mix_sample_single_aggregate(spark):
    tree = plan_of(spark, "ext_mix_sample").split("\n\n")[0]
    assert tree.count("Exchange") == 1, tree
    assert "partial_count" in plan_of(spark, "ext_mix_sample")


@pytest.mark.parametrize(
    "name",
    ["ext_sim_batch_topk", "win_rank", "ext_knn_join", "ext_knn_join_ivf"],
)
def test_topk_windows_get_partial_group_limit(spark, name):
    """rank-filtered windows must plan a Partial WindowGroupLimit below
    the exchange (Spark 3.5+): only k rows per group per input partition
    reach the shuffle — the property that keeps batch top-k from
    shuffling the whole scored corpus."""
    df = registry.spec(name).fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    assert "Partial" in plan.split("Exchange", 1)[-1], plan


def test_runtime_bloom_filter_injects(spark):
    """Under the op's confs, the optimized plan must carry a bloom-filter
    aggregate on the creation side and a might_contain probe on the
    application side."""
    from satellite_data_ingestion_spark.catalog import table as _table

    import pyspark.sql.functions as F

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = _table(spark, SF_SMOKE, "lineitem")
        o = _table(spark, SF_SMOKE, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, plan
        assert "might_contain" in plan, plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_tpch2_q1_single_shuffle_with_pushdown(spark):
    """Q1: scan → partial agg → ONE hash exchange → final agg (the final
    orderBy's range exchange is separate); shipdate pushed."""
    plan = plan_of(spark, "q1_pricing_summary")
    pushed = " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
    assert "LessThanOrEqual(l_shipdate" in pushed, pushed
    # the simple plan string inlines each exchange's partitioning
    # (formatted mode's tree section lists bare node names only)
    df = registry.spec("q1_pricing_summary").fn(spark, SF_SMOKE)
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert simple.count("Exchange hashpartitioning") == 1, simple
    assert simple.count("Exchange rangepartitioning") <= 1, simple
    # the aggregate itself must be map-side combined
    assert "partial_" in plan, plan


def test_tpch2_q2_window_min_not_reaggregation_join(spark):
    """Q2's correlated min is a window over the partkey partition — the
    plan must carry a Window node, not a second aggregate joined back."""
    plan = plan_of(spark, "q2_min_cost_supplier")
    assert "Window" in plan, plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "q9_product_type_profit",
        "q13_customer_distribution",
        "q16_parts_supplier_relation",
        "q17_small_qty_revenue",
        "q20_potential_promotion",
        "q21_waiting_supplier",
        "q22_sales_opportunity",
    ],
)
def test_tpch2_no_cartesian(spark, name):
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


def test_tpch2_q21_semi_and_anti_joins(spark):
    """Q21's EXISTS/NOT EXISTS double correlation must plan as one semi
    and one anti join (both keyed on l_orderkey), never row-multiplying
    inner joins + distinct."""
    plan = plan_of(spark, "q21_waiting_supplier")
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan


def test_tpch2_q22_anti_join_and_broadcast_scalar(spark):
    """Q22: NOT-EXISTS → anti join; the scalar average arrives as a
    broadcast 1-row join, so no per-row subquery execution."""
    plan = plan_of(spark, "q22_sales_opportunity")
    assert "LeftAnti" in plan, plan
    assert "Broadcast" in plan, plan


def test_pipe_transform_prunes_to_piped_columns(spark):
    """The pipe stage needs only (doc_id, text); the parquet scan must not
    read the other document columns."""
    plan = plan_of(spark, "ext_pipe_transform")
    schema = re.search(r"ReadSchema: (\S+)", plan).group(1)
    assert "text" in schema, schema
    assert "lang" not in schema and "source" not in schema, schema
    assert "MapInPandas" in plan, plan


def test_group_sample_uses_window_group_limit(spark):
    """The per-group cap must plan WindowGroupLimit (per-partition top-N
    heaps before the shuffle), so the exchange carries at most N rows per
    group — and nothing may funnel through a single partition."""
    df = registry.spec("ext_group_sample").fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_corpus_sample_is_heap_topk(spark):
    """The global hash-ordered sample must be TakeOrderedAndProject —
    per-partition heaps, no full sort, no single-partition exchange."""
    df = registry.spec("ext_corpus_sample").fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_shuffle_index_avoids_global_window(spark):
    """Global example indices must come from range partitioning + offset
    arithmetic, never a row_number over an empty-partition window (which
    executes in ONE task).  The range exchange itself hides behind the
    checkpoint in the final plan, so the real assertions are behavioral:
    no single-partition funnel anywhere, and the offsets produce exactly
    the contiguous 0..N-1 sequence."""
    df = registry.spec("ext_shuffle_index").fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan
    assert "SinglePartition" not in plan, plan
    idxs = [r.example_idx for r in df.select("example_idx").collect()]
    assert idxs == list(range(len(idxs))), idxs[:10]


def test_q2_single_exchange_shared_by_agg_and_window(spark):
    """q2 hash-partitions lineitem on l_partkey once; the (partkey,
    suppkey) groupBy and the partkey window must BOTH reuse it — exactly
    one hashpartitioning exchange in the whole plan."""
    df = registry.spec("q2_min_cost_supplier").fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_q9_derived_cost_via_window_not_second_scan(spark):
    """q9's supply cost comes from a window over the fact table — the
    plan must read lineitem ONCE (an agg-and-join-back would scan twice)."""
    df = registry.spec("q9_product_type_profit").fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("lineitem.parquet") == 1, plan
    assert "Window" in plan, plan


def test_q17_threshold_via_window_not_join(spark):
    """q17's correlated average attaches as a window — one lineitem scan,
    no aggregate joined back."""
    df = registry.spec("q17_small_qty_revenue").fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("lineitem.parquet") == 1, plan
    assert "Window" in plan, plan


def test_gap_fill_generates_grid_without_cartesian(spark):
    """The slot grid comes from explode(sequence(...)) per key — a
    Generate node — never a cartesian product; the fill is one window."""
    df = registry.spec("ext_gap_fill").fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "Generate" in plan, plan
    assert "Window" in plan, plan


def test_interval_overlap_joins_on_buckets_not_cartesian(spark):
    """The interval-overlap join must be an equi hash/merge join on
    (event_type, hour bucket) with the overlap predicate as a filter —
    never a cartesian or nested-loop over the interval sets."""
    df = registry.spec("join_interval_overlap").fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
    assert "Generate" in plan, plan  # the bucket explode


def test_minhash_single_signature_pipeline(spark):
    """The 16-minhash aggregate must appear ONCE in the physical plan
    (map-side candidate generation) — the bucket-self-join shape computed
    it three times and paid three band exchanges."""
    df = registry.spec("ext_dedup_minhash").fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_pipelines = len(re.findall(r"partial_min\(xxhash64\(h", plan)) // 16
    assert n_pipelines == 1, plan
    assert plan.count("hashpartitioning(band_id") == 1, plan


def test_simhash_single_signature_compute(spark):
    """The Arrow-batched simhash vote fold must execute at most once:
    either one ArrowEvalPython node (pre-materialization) or references
    to the already-checkpointed signature RDD — never multiple live UDF
    evaluations, and exactly one band exchange."""
    df = registry.spec("ext_dedup_simhash").fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") <= 1, plan
    assert plan.count("hashpartitioning(band_id") == 1, plan


def test_dedup_exact_exchange_keyed_on_fixed_width_hash(spark):
    """ext_dedup_exact's dedup shuffle must hash-partition on the 16-byte
    md5 key, never on the raw text column."""
    df = registry.spec("ext_dedup_exact").fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert parts, plan
    for p in parts:
        assert "_k" in p, plan
        assert not p.startswith("text"), plan


def test_training_pipeline_exchange_keyed_on_fixed_width_hash(spark):
    """pipeline_training_data's only wide shuffle must carry the 16-byte
    canon_key (+ lang), not the canonicalized document string."""
    df = registry.spec("pipeline_training_data").fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert parts, plan
    assert any("canon_key" in p for p in parts), plan
    assert "canonical" not in plan, plan


def test_grouping_sets_single_expand_single_exchange(spark):
    """GROUPING SETS plans one Expand + one aggregation exchange — not a
    union of per-set aggregates re-scanning the fact table."""
    df = registry.spec("agg_grouping_sets").fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") >= 1, plan
    assert plan.count("lineitem.parquet") == 1, plan


def test_ivf_indexed_partition_pruning(spark):
    """ext_sim_ivf_indexed's probe must reach the staged layout as a
    static PartitionFilter on ivf_cluster, with the file index actually
    pruned: the scan reads at most NPROBE of the K list directories."""
    import re as _re

    from satellite_data_ingestion_spark import settings

    df = registry.spec("ext_sim_ivf_indexed").fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cluster" in plan, plan
    # The scan node reports how many partition directories survived
    # pruning; it must be <= the probe budget, not the full list count.
    m = _re.search(r"partition count: (\d+)", plan)
    if m:  # format differs across Spark versions; the filter assert holds regardless
        assert int(m.group(1)) <= settings.IVF_NPROBE, plan


def test_zorder_box_filters_pushed_to_staged_scan(spark):
    """The z-order box predicates must reach the staged parquet scan as
    pushed range filters on BOTH bucket columns — with the Morton-sorted
    layout these are exactly the filters row-group stats can satisfy."""
    plan = plan_of(spark, "ext_zorder_layout")
    pushed = " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
    for col in ("xb", "yb"):
        assert f"GreaterThanOrEqual({col}" in pushed, pushed
        assert f"LessThanOrEqual({col}" in pushed, pushed


def test_segment_dedup_two_exchanges(spark):
    """ext_segment_dedup's contract: JVM-side chunking (no shuffle), ONE
    fixed-width chunk-hash window exchange, ONE doc_id reassembly
    exchange — nothing else."""
    plan = plan_of(spark, "ext_segment_dedup")
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 2, tree
    assert "Window" in tree, tree


def test_ts_subseq_search_shape(spark):
    """ext_ts_subseq_search: one series exchange feeding the bounded
    window frame, global top-k as a TakeOrderedAndProject heap — never a
    global sort."""
    plan = plan_of(spark, "ext_ts_subseq_search")
    tree = plan.split("\n\n")[0]
    assert "TakeOrderedAndProject" in tree, tree
    assert tree.count("Exchange") == 1, tree


def test_pq_indexed_partition_pruning_and_code_scan(spark):
    """ext_sim_pq_indexed must probe via a static PartitionFilter on the
    stored code layout, and the candidate scan must read CODES, never
    raw embeddings (the 32x byte win is the point of the layout)."""
    import re as _re

    from satellite_data_ingestion_spark import settings

    df = registry.spec("ext_sim_pq_indexed").fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cluster" in plan, plan
    m = _re.search(r"partition count: (\d+)", plan)
    if m:
        assert int(m.group(1)) <= settings.PQ_NPROBE, plan
    # the staged-layout scan projects codes, not embeddings
    staged_scans = [
        seg for seg in plan.split("FileScan") if "sdis_pq_codes_" in seg
    ]
    assert staged_scans, plan
    for seg in staged_scans:
        head = seg.split("PushedFilters")[0]
        assert "codes" in head and "embedding" not in head, seg[:400]


def test_lm_score_broadcasts_model_never_reshuffles_corpus(spark):
    """The vocabulary-sized count table and the 1-row (N, V) totals must
    both BROADCAST onto the token stream — the corpus is shuffled once
    to build the model (token groupBy) and once for the per-doc
    aggregate, never for the scoring join."""
    plan = plan_of(spark, "ext_lm_score")
    tree = plan.split("\n\n")[0]
    assert tree.count("BroadcastExchange") >= 2, tree
    assert "SortMergeJoin" not in tree, tree


def test_orc_scan_pushdown_and_pruning(spark):
    """The quantity predicate must push into the ORC scan and only the
    referenced columns may materialize — parquet's pruning contract,
    format-agnostic."""
    plan = plan_of(spark, "scan_orc")
    pushed = " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
    assert "GreaterThanOrEqual(l_quantity" in pushed, plan
    read = " ".join(re.findall(r"ReadSchema: (.*)", plan))
    assert "l_orderkey" not in read, read  # unreferenced column pruned
    assert "l_extendedprice" in read and "l_returnflag" in read, read


def test_spatial_nearest_is_shuffle_free(spark):
    """The nearest-station argmin must be a pure projection: stations
    ride as literals, so the plan has no Exchange and no Join node."""
    plan = plan_of(spark, "join_spatial_nearest")
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree, tree
    assert "Join" not in tree and "CartesianProduct" not in tree, tree


def test_funnel_single_exchange(spark):
    """The three chained stage windows share one user partitioning and
    the dedup aggregate reuses it: exactly one Exchange, no Join."""
    plan = plan_of(spark, "win_funnel")
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1, tree
    assert "Join" not in tree, tree


def test_bloom_incremental_broadcasts_probe_sides(spark):
    """The relational bloom dedup must never shuffle corpus text: the
    positions table and the verified-hash set ride BroadcastExchanges
    (>= 3 broadcasts: bits onto the batch probe, candidates onto the
    corpus verify scan, verified hashes onto the batch), and no
    cartesian anywhere."""
    plan = plan_of(spark, "ext_dedup_bloom_incremental")
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in plan
    assert tree.count("BroadcastExchange") >= 3, tree


def test_geohash_and_quantize_encode_shuffle_free(spark):
    """Pure-projection encoders must stay shuffle-free: the geohash plan
    and the int8-quantize ENCODE plan (bounds ride as literals after the
    one bounded collect) may contain no Exchange."""
    tree = plan_of(spark, "fn_geohash").split("\n\n")[0]
    assert "Exchange" not in tree, tree
    tree = plan_of(spark, "ext_embedding_quantize").split("\n\n")[0]
    assert "Exchange" not in tree, tree


def test_heavy_hitters_sketch_broadcasts(spark):
    """The 3072-cell sketch and the 1-row total must broadcast back onto
    the probe side — a sort-merge join against the sketch would mean
    Catalyst lost the size information."""
    tree = plan_of(spark, "ext_heavy_hitters").split("\n\n")[0]
    assert tree.count("BroadcastExchange") >= 2, tree
    assert "CartesianProduct" not in tree


def test_attribution_single_exchange(spark):
    """Window-native as-of self-match: one user_id exchange serves the
    whole operator — a join formulation would add a second scan."""
    tree = plan_of(spark, "win_attribution").split("\n\n")[0]
    assert tree.count("Exchange") == 1, tree
    assert "Join" not in tree, tree


def test_fuzzy_join_master_broadcasts(spark):
    """The master-name vocabulary side must broadcast (vocabulary-sized);
    the dirty side must never shuffle for the join itself."""
    plan = plan_of(spark, "join_fuzzy")
    tree = plan.split("\n\n")[0]
    assert "BroadcastExchange" in tree, tree
    assert "CartesianProduct" not in plan


def test_pattern_match_lags_share_one_window_sort(spark):
    """All three lags of the pattern chain ride a single user_id window:
    exactly one exchange in the plan."""
    tree = plan_of(spark, "win_pattern_match").split("\n\n")[0]
    assert tree.count("Exchange") == 1, tree


def test_url_parse_shuffle_free(spark):
    """URL anatomy is a pure projection: regexp/string ops in whole-stage
    codegen, no Exchange, no UDF — at 100 TB it rides the scan."""
    tree = plan_of(spark, "ext_url_parse").split("\n\n")[0]
    assert "Exchange" not in tree, tree
    assert "Python" not in tree, tree


def test_url_blocklist_broadcast_anti_join(spark):
    """The curated blocklist must broadcast into a LeftAnti hash join —
    the corpus never shuffles for a provenance gate."""
    tree = plan_of(spark, "ext_url_blocklist").split("\n\n")[0]
    assert "BroadcastHashJoin LeftAnti" in tree, tree
    assert "Exchange hashpartitioning" not in tree, tree


def test_domain_volume_cap_window_group_limit(spark):
    """The rank<=K predicate must plan as WindowGroupLimit on BOTH sides
    of the exchange — the partial limit is what clips a hot domain to K
    rows per input partition before anything ships."""
    tree = plan_of(spark, "ext_domain_volume_cap").split("\n\n")[0]
    assert tree.count("WindowGroupLimit") == 2, tree
    assert tree.count("Exchange") == 1, tree


def test_bm25_no_corpus_shuffle(spark):
    """BM25's only exchange is the 1-row stats aggregate; the corpus side
    feeds TakeOrderedAndProject heaps directly — no shuffle, no window."""
    tree = plan_of(spark, "ext_bm25_search").split("\n\n")[0]
    assert "TakeOrderedAndProject" in tree, tree
    assert "Exchange hashpartitioning" not in tree, tree
    assert tree.count("BroadcastExchange") == 1, tree


def test_equidepth_histogram_range_partitioned_rank(spark):
    """The exact global rank must come from distributed_rank's
    range-partition + local-window decomposition: a rangepartitioning
    Exchange feeds BOTH branches (local ranks and per-partition counts,
    ReuseExchange), and the fact-table window is partitioned by _pid —
    the only unpartitioned window runs on the |partitions|-row counts
    frame, which rides a BroadcastExchange back onto the ranked rows.
    A bare Window.orderBy over the fact table (single-task WindowExec)
    would show NO rangepartitioning exchange.  (Exchange reuse between
    the two branches happens at runtime under AQE — the static plan
    shows both subtrees.)"""
    plan = plan_of(spark, "agg_histogram_equidepth")
    tree = plan.split("\n\n")[0]
    _rank_decomposed(plan)
    assert tree.count("BroadcastExchange") == 1, tree
    assert "CartesianProduct" not in tree, tree


def test_top_journeys_two_exchanges_and_heap(spark):
    """Per-user journey assembly is ONE user exchange (sorted struct
    collect inside the aggregate — no per-row window), the journey count
    is a second map-side-combined exchange, and the top-k is a
    TakeOrderedAndProject heap, never a global sort."""
    plan = plan_of(spark, "ext_top_journeys")
    tree = plan.split("\n\n")[0]
    assert "TakeOrderedAndProject" in tree, tree
    assert tree.count("Exchange") == 2, tree
    assert "Window" not in tree, tree


def test_audience_overlap_user_join_marginals_broadcast(spark):
    """The pair frame must build from a user-keyed equi self-join of the
    distinct (user, type) frame — never a cartesian — and the two
    |types|-row marginal frames must broadcast onto it (at smoke scale
    the self-join side may ALSO measure broadcastable, so >= 2)."""
    plan = plan_of(spark, "ext_audience_overlap")
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in plan, tree
    assert tree.count("BroadcastHashJoin") >= 2, tree


def test_lateral_topn_decorrelates_to_window_group_limit(spark):
    """The correlated LATERAL LIMIT must decorrelate into partitioned
    WindowGroupLimit heaps (partial on both sides of the exchange), not
    a per-outer-row re-scan or a cartesian."""
    tree = plan_of(spark, "join_lateral_topn").split("\n\n")[0]
    assert tree.count("WindowGroupLimit") >= 2, tree
    assert "CartesianProduct" not in tree, tree


def test_kmeans_assignment_is_projection(spark):
    """The k-means final report must be: scan -> assignment PROJECTION
    (JVM HOF folds over centroid literals — no Python, no join) ->
    one count/sum exchange -> sort.  Any Join/Cartesian/PythonUDF in
    the plan means the assignment stopped being a projection."""
    plan = plan_of(spark, "ext_kmeans")
    tree = plan.split("\n\n")[0]
    assert "Join" not in tree and "CartesianProduct" not in tree, tree
    assert "Python" not in tree, tree
    assert tree.count("Exchange") <= 2, tree


def test_item_cf_basket_keyed_and_group_limited(spark):
    """Item-item CF pairs must come from a basket-keyed equi self-join
    (never a cartesian) and the top-k must plan as WindowGroupLimit
    heaps on both sides of the item exchange."""
    plan = plan_of(spark, "ext_item_cf")
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in plan, tree
    assert tree.count("WindowGroupLimit") >= 2, tree


def test_negative_sampling_range_partitioned_rank(spark):
    """The hash-ring rank must come from distributed_rank (a
    rangepartitioning exchange), never a single-task global window, and
    the ring hop must be an equi join."""
    plan = plan_of(spark, "ext_negative_sampling")
    tree = plan.split("\n\n")[0]
    assert "rangepartitioning" in plan, plan[:2000]
    assert "CartesianProduct" not in tree, tree


def test_skyline_prefilter_before_dominance_window(spark):
    """The skyline must plan exactly THREE windows — the |buckets|-row
    running threshold, the _pid-partitioned LOCAL dominance sweep, and
    the |partitions|-row carry-in prefix max — with a rangepartitioning
    exchange feeding the sweep (distributed_prev_max: the dominance
    pass is bounded by construction, since an adversarial distribution
    defeats the candidate prune), and never a cartesian.  The threshold
    window appears twice in the STATIC plan because the candidate subtree
    feeds both sweep branches (ReuseExchange merges them at runtime), so
    the static count is 4."""
    plan = plan_of(spark, "win_skyline_2d")
    tree = plan.split("\n\n")[0]
    # The candidate/threshold subtree now materializes inside the rank
    # helper's pinned checkpoint, so the LIVE plan carries the two sweep
    # windows (local dominance + |partitions|-row carry-in); the
    # threshold window ran in the checkpoint job.
    assert tree.count("Window") == 2, tree
    _rank_decomposed(plan)
    assert "rangepartitioning" in plan, plan[:2000]
    assert "CartesianProduct" not in tree, tree


def test_gap_fill_spine_generated_not_scanned(spark):
    """The dense grid must come from a sequence-explode (Generate node)
    over the bounded bounds×types frame — one LOCF window on the grid,
    no cartesian; the 1-row bounds ride a broadcast."""
    tree = plan_of(spark, "win_gap_fill_locf").split("\n\n")[0]
    assert tree.count("Generate") == 1, tree
    assert tree.count("Window") == 1, tree
    assert "CartesianProduct" not in tree, tree


def test_time_weighted_avg_one_window_one_agg(spark):
    """TWA is one lead window per type partition plus one map-side
    combined aggregate — two exchanges total, nothing else."""
    tree = plan_of(spark, "win_time_weighted_avg").split("\n\n")[0]
    assert tree.count("Window") == 1, tree
    assert tree.count("Exchange") == 2, tree


def _rank_decomposed(plan: str) -> None:
    """The distributed_rank signature in a physical plan.  Since the
    helper pins its range shuffle with a localCheckpoint (round 14: the
    two branches must read ONE materialized exchange or a nondeterministic
    join-grain upstream corrupts _pid), the ranged frame appears as a
    `Scan ExistingRDD` and the rangepartitioning itself runs inside the
    checkpoint job — so accept either form, and require the local windows
    to be _pid-partitioned (never a bare data-grain Window.orderBy)."""
    assert "rangepartitioning" in plan or "ExistingRDD" in plan, plan[:2000]
    assert re.search(r"windowspecdefinition\(_pid", plan), plan[:2000]


def _vocab_window_partitioned(plan: str) -> None:
    """Shared assertion for vocab-grain rank swaps (VERDICT r12 task 1):
    the global rank must come from distributed_rank — a rangepartitioning
    exchange feeding _pid-partitioned local windows — and the ONLY
    unpartitioned window allowed is the |partitions|-row offsets frame
    (which rides a BroadcastExchange back onto the ranked rows)."""
    tree = plan.split("\n\n")[0]
    _rank_decomposed(plan)
    assert "BroadcastExchange" in tree, tree
    assert "CartesianProduct" not in tree, tree


def test_zipf_fit_range_partitioned_rank(spark):
    """ext_zipf_fit's vocabulary rank must never be one WindowExec task:
    web-scale vocab is 1e7-1e8 types (llm/textstats.py ext_zipf_fit)."""
    _vocab_window_partitioned(plan_of(spark, "ext_zipf_fit"))


def test_vocab_coverage_range_partitioned_rank(spark):
    """ext_vocab_coverage's rank+cumsum must come from distributed_rank
    (range partition + local windows + broadcast prefix offsets)."""
    _vocab_window_partitioned(plan_of(spark, "ext_vocab_coverage"))


def test_interp_lookup_broadcast_equi_join(spark):
    """The interpolation join must land as a broadcast EQUI join on the
    densified day grid — never a BroadcastNestedLoop range probe or a
    cartesian (the whole point of densify-then-equi-join)."""
    tree = plan_of(spark, "join_interp_lookup").split("\n\n")[0]
    assert "BroadcastHashJoin" in tree, tree
    assert "BroadcastNestedLoopJoin" not in tree, tree
    assert "CartesianProduct" not in tree, tree


def test_ngram_lm_score_broadcast_model(spark):
    """The vocab^2-bounded LM table must ride a BroadcastExchange onto
    the corpus bigram stream (the fact side never shuffles for the
    model join); no cartesian anywhere."""
    plan = plan_of(spark, "ext_ngram_lm_score")
    tree = plan.split("\n\n")[0]
    assert "BroadcastHashJoin" in tree, tree
    assert "CartesianProduct" not in tree, tree


def test_cardinality_audit_heap_topk(spark):
    """The heavy-key report must come from a TakeOrderedAndProject heap
    over the key grain, with totals on a broadcast 1-row aggregate —
    never a global sort of all keys."""
    tree = plan_of(spark, "join_cardinality_audit").split("\n\n")[0]
    assert "TakeOrderedAndProject" in tree, tree
    assert "BroadcastExchange" in tree, tree


def test_curriculum_order_double_distributed_rank(spark):
    """Both curriculum ranks (stage tercile + final position) must come
    from distributed_rank: two rangepartitioning exchanges, no
    unpartitioned fact-table window."""
    plan = plan_of(spark, "ext_curriculum_order")
    _rank_decomposed(plan)
    assert "CartesianProduct" not in plan.split("\n\n")[0]


def test_decontaminate_broadcast_bench_index(spark):
    """The benchmark shingle index must broadcast onto the corpus
    position stream (the bench side is eval-suite-sized by definition);
    the streak window partitions by doc."""
    tree = plan_of(spark, "ext_decontaminate_longest_match").split("\n\n")[0]
    assert "BroadcastHashJoin" in tree, tree
    assert "CartesianProduct" not in tree, tree


def test_rake_windows_partitioned_by_doc(spark):
    """ext_keyword_rake's phrase segmentation window must partition BY
    DOC (per-doc running stopword count) — a global Window over the
    token stream would serialize the whole corpus into one task."""
    plan = plan_of(spark, "ext_keyword_rake")
    for m in re.finditer(r"Window \[[^\]]*windowspecdefinition\(([^,]*),", plan):
        assert "doc_id" in m.group(1), m.group(0)[:200]


def test_rsi_single_series_exchange(spark):
    """win_rsi's rank, diff-lag and both rolling sums must ride ONE
    (event_type) hash exchange — re-partitioning per window layer
    would triple the shuffle volume."""
    tree = plan_of(spark, "win_rsi").split("\n\n")[0]
    ex = tree.count("Exchange hashpartitioning")
    # one series exchange + one final groupBy exchange
    assert ex <= 2, tree


def test_bleu_no_cartesian_pair_join(spark):
    """ext_bleu's candidate-reference pairing and clipped-overlap joins
    must stay equi joins (hash/sort-merge on pid / (pid, gram)); the
    only nested-loop nodes allowed are the Cross-type combinators of
    1-row scalar aggregates (the sanctioned bounded-crossJoin shape).
    Since the r15 optimization the pid pairing join runs once inside the
    materialized `pairs` checkpoint (five consumers shared it), so the
    final plan reads the pair RDD and keeps only the (pid, gram)
    clipped-overlap equi joins."""
    tree = plan_of(spark, "ext_bleu").split("\n\n")[0]
    assert "CartesianProduct" not in tree, tree
    assert "BroadcastNestedLoopJoin Inner" not in tree, tree


def test_sax_bucket_grain_aggregates(spark):
    """ext_ts_sax must reduce day->bucket grain with hash aggregates
    (map-side combined), with the z-moments a broadcast 1-row join —
    no window over the full bucket frame."""
    plan = plan_of(spark, "ext_ts_sax")
    tree = plan.split("\n\n")[0]
    assert "partial_sum" in plan
    assert "BroadcastExchange" in tree, tree


def test_clustering_coeff_wedge_join_no_cartesian(spark):
    """graph_clustering_coeff's triangle stage must be the ordered-edge
    wedge equi join (hash/sort-merge on shared endpoints) — a cartesian
    or BNLJ pairing of edges is the quadratic failure mode."""
    tree = plan_of(spark, "graph_clustering_coeff").split("\n\n")[0]
    assert "CartesianProduct" not in tree, tree
    assert "BroadcastNestedLoopJoin" not in tree, tree


def test_info_gain_value_folds_bounded(spark):
    """ext_feature_info_gain's entropy folds must run on the bounded
    per-feature value grain: every Window (if any) partitions, and the
    plan carries partial aggregates for the cell counts."""
    plan = plan_of(spark, "ext_feature_info_gain")
    assert "partial_sum" in plan or "partial_count" in plan
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree, tree


def test_allen_relations_bucket_equi_join(spark):
    """join_allen_relations must pair intervals through the hour-bucket
    EQUI join (the join_interval_overlap recipe) — a type+range-only
    join is a per-type cartesian at scale."""
    tree = plan_of(spark, "join_allen_relations").split("\n\n")[0]
    assert "CartesianProduct" not in tree, tree
    assert "BroadcastNestedLoopJoin" not in tree, tree


def test_gains_curve_distributed_rank(spark):
    """agg_gains_curve's decile cut must come from distributed_rank
    (range partition + local windows) — never a single-task global
    ntile window over the scored corpus."""
    plan = plan_of(spark, "agg_gains_curve")
    for m in re.finditer(r"Window \[[^\]]*windowspecdefinition\(([^,]*),", plan):
        assert "_pid" in m.group(1) or "pid" in m.group(1), m.group(0)[:200]


def test_best_of_n_window_group_limit(spark):
    """ext_best_of_n's top-2-per-pool must plan as WindowGroupLimit (the
    census rides a separate pool-grain aggregate; an unbounded count
    window sharing the rank partition would block the rewrite and
    materialize the full per-pool sort at scale)."""
    plan = plan_of(spark, "ext_best_of_n")
    assert "WindowGroupLimit" in plan, plan[:2000]


def test_heaps_law_windows_partitioned(spark):
    """ext_heaps_law's growth-curve cumulative sums must come from
    distributed_rank's per-partition local windows (plus the bounded
    |partitions|-row offsets frame) — never a single-task window over
    the doc-grain curve."""
    plan = plan_of(spark, "ext_heaps_law")
    for m in re.finditer(
        r"Window \[[^\]]*windowspecdefinition\(([^,]*),", plan
    ):
        assert "_pid" in m.group(1) or "pid" in m.group(1), m.group(0)[:200]


def test_fisher_exact_grid_broadcasts(spark):
    """agg_fisher_exact's lnfact lookups must ride ONE broadcast probe of
    the parameter-sized grid (the r15 optimization collapsed the nine
    per-lookup BroadcastHashJoins, whose nine grid-sized hash-relation
    builds dominated the op, into a single unpivot+probe+pivot — see
    operators/hypothesis.py::_lnf_attach_once); the corpus side still
    contributes only the user-grain aggregate.  Exactly one grid
    broadcast join, and never a re-expansion to nine."""
    plan = plan_of(spark, "agg_fisher_exact")
    n_bhj = len(re.findall(r"BroadcastHashJoin", plan))
    assert 1 <= n_bhj <= 3, plan[:1500]


def test_bayes_ab_grid_single_broadcast(spark):
    """agg_bayes_ab shares _lnf_attach_once: one broadcast probe of the
    1.1M-row lnfact grid instead of nine (each build shipped ~18 MB)."""
    plan = plan_of(spark, "agg_bayes_ab")
    n_bhj = len(re.findall(r"BroadcastHashJoin", plan))
    assert 1 <= n_bhj <= 3, plan[:1500]


def test_wilcoxon_rank_windows_partitioned(spark):
    """agg_wilcoxon_signed_rank's rank offsets must come from
    distributed_rank's per-partition windows, never a single-task
    window over the distinct-|d| grain."""
    plan = plan_of(spark, "agg_wilcoxon_signed_rank")
    for m in re.finditer(
        r"Window \[[^\]]*windowspecdefinition\(([^,]*),", plan
    ):
        assert "_pid" in m.group(1) or "pid" in m.group(1), m.group(0)[:200]


def test_ndcg_window_group_limit(spark):
    """ext_ndcg's per-query top-k must plan as WindowGroupLimit (the
    relevant-total rides a separate aggregate, not a count window)."""
    plan = plan_of(spark, "ext_ndcg")
    assert "WindowGroupLimit" in plan, plan[:1500]


def test_matryoshka_window_group_limit(spark):
    """ext_matryoshka_recall's per-(budget, query) top-k must plan as
    WindowGroupLimit — one scored scan, never a full sort kept."""
    plan = plan_of(spark, "ext_matryoshka_recall")
    assert "WindowGroupLimit" in plan, plan[:1500]


def test_kneser_ney_vocab_side_broadcasts(spark):
    """ext_ngram_kneser_ney's fan-in/fan-out/context frames are
    vocab-grain and must join back onto the bigram grain as broadcasts
    — the corpus-derived bigram frame is never reshuffled for them."""
    plan = plan_of(spark, "ext_ngram_kneser_ney")
    assert len(re.findall(r"BroadcastHashJoin", plan)) >= 2, plan[:1500]


def _all_windows_pid_partitioned(plan: str) -> bool:
    """True iff every window spec in the plan partitions by the
    distributed_rank range-partition key (no global single-task
    window over the value grain)."""
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    return all(spec.lstrip().startswith("_pid") for spec in specs)


def test_cvm_no_single_task_window(spark):
    """The EDF cumulatives must come from distributed_rank's
    range-partitioned local windows, never a global empty-partition
    window over the value grain."""
    plan = plan_of(spark, "agg_cvm_test")
    assert "windowspecdefinition" in plan  # the cumulative pass exists
    assert _all_windows_pid_partitioned(plan), plan[:1500]


def test_ad_2sample_no_single_task_window(spark):
    plan = plan_of(spark, "agg_ad_2sample")
    assert "windowspecdefinition" in plan
    assert _all_windows_pid_partitioned(plan), plan[:1500]


def test_sim_hamming_broadcast_shape(spark):
    """Per-dim thresholds and the query bits broadcast; the corpus side
    never shuffles for the join."""
    plan = plan_of(spark, "ext_sim_hamming")
    tree = plan.split("\n\n")[0]
    assert "BroadcastHashJoin" in tree, tree
    # the top-k is a heap, not a global sort-all
    assert "TakeOrderedAndProject" in tree, tree


def test_pass_at_k_single_exchange(spark):
    """One user-grain combine; the pass@k algebra is projection-only."""
    plan = plan_of(spark, "ext_pass_at_k")
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") <= 2, tree  # user groupBy + final 1-row agg
    assert "partial_count" in plan or "partial_sum" in plan


def test_softdedup_fixed_width_group_key(spark):
    """The duplicate-group key must be the 16-byte unhex(md5), not raw
    text (O(1) exchange compare cost at 100 TB)."""
    plan = plan_of(spark, "ext_softdedup_weights")
    assert "unhex" in plan and "md5" in plan, plan[:2000]


def test_kappa_weighted_broadcast_margins(spark):
    """All margin/cell frames are broadcast — no shuffle joins past the
    customer-grain combine."""
    plan = plan_of(spark, "agg_kappa_weighted")
    tree = plan.split("\n\n")[0]
    assert "BroadcastNestedLoopJoin" in tree or "BroadcastHashJoin" in tree, tree
