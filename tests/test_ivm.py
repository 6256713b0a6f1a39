"""Incremental view maintenance (plans/ivm.py): the fold rule against a
from-scratch recompute on a tiny controlled table, including the
zero-count group-eviction edge the corpus query never hits."""

import tempfile

from pyspark.sql import functions as F

from satellite_data_ingestion_spark.plans.ivm import _apply_changes
from satellite_data_ingestion_spark.sources.delta_log import DeltaLogTable


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderkey bigint, o_orderpriority string, o_totalprice double"
    )


def test_ivm_matches_recompute_and_evicts_empty_groups(spark):
    t = DeltaLogTable(
        spark, tempfile.mkdtemp(prefix="ivm_unit_"), change_data_feed=True
    )
    mv, last = None, -1

    def refresh():
        nonlocal mv, last
        head = t.latest_version()
        mv = _apply_changes(mv, t.table_changes(last, head))
        last = head

    t.commit_append(
        _mk(spark, [(1, "A", 10.0), (2, "A", 20.0), (3, "B", 5.0)])
    )
    refresh()
    assert {(r.o_orderpriority, r.n_orders, r.price_sum) for r in mv.collect()} == {
        ("A", 2, 30.0),
        ("B", 1, 5.0),
    }

    # MERGE: reprice order 2, insert order 4 in a NEW group C.
    t.commit_merge(
        _mk(spark, [(2, "A", 25.0), (4, "C", 7.0)]), keys=["o_orderkey"]
    )
    refresh()
    assert {(r.o_orderpriority, r.n_orders, r.price_sum) for r in mv.collect()} == {
        ("A", 2, 35.0),
        ("B", 1, 5.0),
        ("C", 1, 7.0),
    }

    # DELETE order 3 — group B's count hits zero and it must LEAVE the
    # view (a stale zero-count row would be a wrong answer for
    # "which groups exist").
    t.commit_delete("o_orderkey", 3, 3)
    refresh()
    got = {(r.o_orderpriority, r.n_orders, r.price_sum) for r in mv.collect()}
    assert got == {("A", 2, 35.0), ("C", 1, 7.0)}

    # Invariant: the incrementally-maintained view equals a full
    # recompute of the final table state.
    full = {
        (r.o_orderpriority, r.n, r.s)
        for r in t.read()
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s"))
        .collect()
    }
    assert got == full
