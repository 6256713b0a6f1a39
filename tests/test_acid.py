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


def test_concurrent_commits_never_lose_updates(spark, tmp_path_factory):
    """A committer that loses the version-claim race (its target manifest
    already exists) must rebase onto the winner's snapshot and retry, so
    both commits land in the final snapshot."""
    import json as _json

    root = str(tmp_path_factory.mktemp("acid_race"))
    t1 = SnapshotTable(spark, root)
    t2 = SnapshotTable(spark, root)  # separate handle, same table

    t2.commit(_df(spark, [100]))  # claims v1

    # Simulate a racing winner publishing v2 BETWEEN t1 reading the
    # current version and t1 claiming its manifest: wrap t1's version
    # resolution so the conflicting manifest appears mid-commit.
    real_current = t1.current_version
    raced = {"done": False}

    def current_with_race():
        v = real_current()
        if not raced["done"]:
            raced["done"] = True
            m1 = t1._manifest(v)
            with open(t1._manifest_path(v + 1), "x") as fh:
                _json.dump(
                    {"version": v + 1, "files": m1["files"], "row_count": m1["row_count"]},
                    fh,
                )
        return v

    t1.current_version = current_with_race
    v = t1.commit(_df(spark, [200]))  # target v2 taken -> rebases to v3
    t1.current_version = real_current
    assert v == 3
    assert sorted(r.x for r in t1.read().collect()) == [100, 200]
    assert t1.current_version() == t2.current_version() == 3


def test_version_resolves_from_manifest_listing_and_mode_is_validated(
    spark, tmp_path_factory
):
    import os as _os

    root = str(tmp_path_factory.mktemp("acid_ptr"))
    t = SnapshotTable(spark, root)
    t.commit(_df(spark, [1]))
    t.commit(_df(spark, [2]))
    # The manifest listing IS the commit log — stray temp files in the
    # manifests dir (a committer that died mid-write) are invisible.
    with open(_os.path.join(root, "_manifests", "v9.json.tmp-dead"), "w") as fh:
        fh.write("{")
    assert t.current_version() == 2
    assert sorted(r.x for r in t.read().collect()) == [1, 2]
    with pytest.raises(ValueError, match="unknown commit mode"):
        t.commit(_df(spark, [3]), mode="overwrite")
