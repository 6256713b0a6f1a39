"""Incremental view maintenance (IVM) over the Delta change data feed
(SURVEY.md §2.10 extension: lakehouse aggregate maintenance).

The reference pipeline recomputes its products from scratch every
15-minute slot (``sources/meteosat.py`` slot loop); the lakehouse
equivalent keeps a MATERIALIZED AGGREGATE continuously correct by
folding each commit's row-level changes into it — the classic
delta-propagation rule for distributive aggregates (SUM/COUNT):

    MV ⊕= Σ sign(change) · f(row),   sign = +1 insert/update_postimage,
                                            −1 delete/update_preimage

so a refresh reads O(change volume) from the CDF, never the table.
At 100 TB that is the difference between an aggregate dashboard that
costs a full table scan per refresh and one that costs the trickle of
changed rows since the last poll: the CDF read touches only the
``_change_data`` files (or the commit's add/remove files) of the new
versions, and the merge into the MV is a join on the MV's own group
count — bounded by group cardinality, not data volume.

The registered query drives the full lifecycle — bulk load, a second
append, a MERGE that both updates and inserts, and a range DELETE —
refreshing the MV incrementally after every commit and never reading
the table state for it.  The oracle recomputes the same final aggregate
relationally from the raw table, so any dropped/doubled change row,
wrong sign, or pre/post-image confusion hash-mismatches.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ..sources.delta_log import DeltaLogTable

# Signs per CDF change type: the delta-propagation rule.
_SIGN = {
    "insert": 1,
    "update_postimage": 1,
    "delete": -1,
    "update_preimage": -1,
}


def _apply_changes(mv: DataFrame | None, changes: DataFrame) -> DataFrame:
    """Fold one CDF batch into the materialized aggregate
    ``(o_orderpriority, n_orders, price_sum)``."""
    sign = F.col("_change_type")
    sign_expr = sign.isin("insert", "update_postimage").cast("int") * 2 - 1
    delta = (
        changes.withColumn("_sign", sign_expr)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("_sign").alias("_dn"),
            F.sum(F.col("_sign") * F.col("o_totalprice")).alias("_ds"),
        )
    )
    if mv is None:
        merged = delta.select(
            "o_orderpriority",
            F.col("_dn").alias("n_orders"),
            F.col("_ds").alias("price_sum"),
        )
    else:
        m, d = mv.alias("m"), delta.alias("d")
        merged = m.join(
            d, F.col("m.o_orderpriority") == F.col("d.o_orderpriority"), "full_outer"
        ).select(
            F.coalesce(F.col("m.o_orderpriority"), F.col("d.o_orderpriority")).alias(
                "o_orderpriority"
            ),
            (
                F.coalesce(F.col("m.n_orders"), F.lit(0))
                + F.coalesce(F.col("d._dn"), F.lit(0))
            ).alias("n_orders"),
            (
                F.coalesce(F.col("m.price_sum"), F.lit(0.0))
                + F.coalesce(F.col("d._ds"), F.lit(0.0))
            ).alias("price_sum"),
        )
    # Groups whose count returns to zero leave the view (all their rows
    # were deleted); localCheckpoint keeps the per-refresh plan flat
    # instead of accreting every prior refresh's join into the lineage.
    return merged.filter(F.col("n_orders") > 0).localCheckpoint(eager=True)


@register(
    "pipeline_ivm",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_orderpriority,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1000.0
              ELSE o_totalprice END AS p
  FROM orders WHERE o_orderkey % 3 IN (0, 1)
  UNION ALL
  SELECT o_orderkey, o_orderpriority, o_totalprice AS p
  FROM orders WHERE o_orderkey % 3 = 2
),
fin AS (SELECT * FROM base WHERE o_orderkey NOT BETWEEN 100 AND 3000)
SELECT o_orderpriority,
       count(*)         AS n_orders,
       round(sum(p), 2) AS sum_price
FROM fin GROUP BY o_orderpriority
""",
)
def pipeline_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained SUM/COUNT view over a changing Delta
    table: bulk load → append → MERGE (update + insert) → range DELETE,
    with the view refreshed from ``table_changes`` after every commit
    and NEVER recomputed from table state.  The returned view must
    equal a from-scratch aggregate of the final table — computed
    relationally by the oracle."""
    src = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="sdis_ivm_")
    t = DeltaLogTable(spark, root, change_data_feed=True)

    mv: DataFrame | None = None
    last = -1

    def refresh() -> None:
        nonlocal mv, last
        head = t.latest_version()
        mv = _apply_changes(mv, t.table_changes(last, head))
        last = head

    # v0: bulk load one third of the orders.
    t.commit_append(src.filter(F.col("o_orderkey") % 3 == 0))
    refresh()
    # v1: a second append batch.
    t.commit_append(src.filter(F.col("o_orderkey") % 3 == 1))
    refresh()
    # v2: MERGE — reprice every 7th order already in the table AND
    # insert the remaining third (disjoint keys).
    upd = (
        t.read()
        .filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1000.0)
    )
    ins = src.filter(F.col("o_orderkey") % 3 == 2)
    t.commit_merge(upd.unionByName(ins), keys=["o_orderkey"])
    refresh()
    # v3: retention DELETE of a key band.
    t.commit_delete("o_orderkey", 100, 3000)
    refresh()

    assert mv is not None
    return mv.select(
        "o_orderpriority",
        "n_orders",
        F.round(F.col("price_sum"), 2).alias("sum_price"),
    )


@register(
    "stream_ivm",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_orderpriority,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1000.0
              ELSE o_totalprice END AS p
  FROM orders WHERE o_orderkey % 3 IN (0, 1)
  UNION ALL
  SELECT o_orderkey, o_orderpriority, o_totalprice AS p
  FROM orders WHERE o_orderkey % 3 = 2
),
fin AS (SELECT * FROM base WHERE o_orderkey NOT BETWEEN 100 AND 3000)
SELECT o_orderpriority,
       count(*)         AS n_orders,
       round(sum(p), 2) AS sum_price
FROM fin GROUP BY o_orderpriority
""",
)
def stream_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized view maintaining ITSELF inside a real Structured
    Streaming query: the same bulk-load → append → MERGE → DELETE Delta
    history as ``pipeline_ivm``, but the refresh loop is
    ``readStream.format("sdis_delta_cdf_stream")`` (one commit per
    micro-batch) with ``foreachBatch`` folding each batch's change rows
    into the aggregate — the engine's checkpoint carries the consumer's
    log-version offset, so a restart resumes mid-history instead of
    re-folding (double-applied changes would hash-mismatch).

    This is the production deployment shape of IVM at 100 TB: the MV
    follows an upsert table continuously, each refresh costing O(change
    volume) with state bounded by group cardinality.  The final MV must
    hash-match the oracle's from-scratch relational recompute of the
    table's end state."""
    import os
    import tempfile

    from ..sources.python_source import DeltaCdfStreamSource, _register_sources

    src = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="sdis_stream_ivm_")
    t = DeltaLogTable(spark, root, change_data_feed=True)
    t.commit_append(src.filter(F.col("o_orderkey") % 3 == 0))
    t.commit_append(src.filter(F.col("o_orderkey") % 3 == 1))
    upd = (
        t.read()
        .filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1000.0)
    )
    t.commit_merge(
        upd.unionByName(src.filter(F.col("o_orderkey") % 3 == 2)),
        keys=["o_orderkey"],
    )
    t.commit_delete("o_orderkey", 100, 3000)

    _register_sources(spark)
    spark.dataSource.register(DeltaCdfStreamSource)
    state: dict = {"mv": None}

    def fold(df: DataFrame, batch_id: int) -> None:
        # _apply_changes localCheckpoints the merged MV, so the state
        # carried across batches is a materialized bounded frame (one
        # row per group), never a lazy plan over a finished micro-batch.
        state["mv"] = _apply_changes(
            state["mv"],
            df.select("o_orderpriority", "o_totalprice", "_change_type"),
        )
        state["n_batches"] = state.get("n_batches", 0) + 1

    ckpt = os.path.join(root, "_ivm_checkpoint")
    # Continuous-deployment drain (processingTime + processAllAvailable,
    # the stream_python_datasource pattern): AvailableNow would snapshot
    # latestOffset ONCE at start, collapsing the per-commit cadence this
    # query exists to exercise — with versions_per_batch=1 each commit
    # arrives as its own micro-batch and the MV folds it incrementally.
    from ..sources.python_source import _drain_with_deadline

    q = (
        spark.readStream.format("sdis_delta_cdf_stream")
        .option("path", root)
        .option("versions_per_batch", 1)
        .load()
        .writeStream.foreachBatch(fold)
        .trigger(processingTime="0 seconds")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        _drain_with_deadline(q, 180)
    finally:
        q.stop()
    if q.exception() is not None:
        raise q.exception()
    mv = state["mv"]
    assert mv is not None, "CDF stream delivered no batches"
    if state.get("n_batches", 0) < t.latest_version() + 1:
        raise RuntimeError(
            f"CDF stream folded {state.get('n_batches')} micro-batches for "
            f"{t.latest_version() + 1} commits — per-commit cadence lost"
        )
    return mv.select(
        "o_orderpriority",
        "n_orders",
        F.round(F.col("price_sum"), 2).alias("sum_price"),
    )
