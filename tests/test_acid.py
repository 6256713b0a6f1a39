"""Write-audit-publish snapshot table: atomicity, isolation, time travel."""

import os

import pytest
from pyspark.sql import functions as F

from satellite_data_ingestion_spark.sources.acid import AuditError, SnapshotTable

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def tbl(spark, tmp_path_factory):
    return SnapshotTable(spark, str(tmp_path_factory.mktemp("acid")))


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x int")


def test_append_commits_accumulate_and_time_travel(spark, tbl):
    v1 = tbl.commit(_df(spark, [1, 2]))
    v2 = tbl.commit(_df(spark, [3]))
    assert (v1, v2) == (1, 2)
    assert sorted(r.x for r in tbl.read().collect()) == [1, 2, 3]
    # time travel: v1 predates the second commit
    assert sorted(r.x for r in tbl.read(version=1).collect()) == [1, 2]


def test_failed_audit_is_invisible_but_leaves_orphans(spark, tbl):
    before = sorted(r.x for r in tbl.read().collect())
    n_dirs_before = len(os.listdir(os.path.join(tbl.root, "data")))
    with pytest.raises(AuditError):
        tbl.commit(_df(spark, [99, 99]), _corrupt_audit_expected=1)
    # reader view unchanged; version pointer unchanged
    assert sorted(r.x for r in tbl.read().collect()) == before
    assert tbl.current_version() == 2
    # the aborted files really are on disk (orphaned), proving the reader
    # isolation comes from the manifest, not from cleanup
    assert len(os.listdir(os.path.join(tbl.root, "data"))) == n_dirs_before + 1


def test_null_audit_rejects(spark, tbl):
    df = spark.createDataFrame([(1,), (None,)], "x int")
    with pytest.raises(AuditError):
        tbl.commit(df, audit_not_null=["x"])


def test_replace_mode_starts_fresh(spark, tbl):
    tbl.commit(_df(spark, [7]), mode="replace")
    assert sorted(r.x for r in tbl.read().collect()) == [7]


def test_registered_query_matches_clean_aggregate(spark):
    from satellite_data_ingestion_spark.catalog import table
    from satellite_data_ingestion_spark.sources.acid import sink_acid_table

    got = {
        (r.l_returnflag): (r.n_rows, r.sum_qty)
        for r in sink_acid_table(spark, SF_DIR).collect()
    }
    li = table(spark, SF_DIR, "lineitem")
    want = {
        r.l_returnflag: (r.n_rows, r.sum_qty)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .collect()
    }
    assert got == want
