"""Delta-protocol transaction log (`sources/delta_log.py`): structural
conformance to the public delta.io PROTOCOL.md layout, replay semantics
(append / overwrite tombstones / time travel), and commit-race rebase."""

from __future__ import annotations

import glob
import json
import os

import pytest

from satellite_data_ingestion_spark.sources.delta_log import DeltaLogTable


def _df(spark, xs):
    return spark.createDataFrame([(x,) for x in xs], "x long")


@pytest.fixture()
def tbl(spark, tmp_path_factory):
    return DeltaLogTable(spark, str(tmp_path_factory.mktemp("delta")))


def test_log_layout_matches_public_protocol(spark, tbl):
    """Version files are 20-digit zero-padded newline-JSON under
    _delta_log/; version 0 opens with protocol + metaData carrying the
    parquet format and the Spark schemaString; adds carry the
    spec-required fields."""
    tbl.commit_append(_df(spark, [1, 2, 3]))
    logs = sorted(glob.glob(os.path.join(tbl.log_dir, "*.json")))
    assert [os.path.basename(p) for p in logs] == ["0" * 20 + ".json"]
    all_actions = [json.loads(line) for line in open(logs[0]) if line.strip()]
    # commitInfo (informational) leads the commit, like delta-spark's
    actions = [a for a in all_actions if "commitInfo" not in a]
    assert "commitInfo" in all_actions[0]
    assert actions[0]["protocol"] == {
        "minReaderVersion": 1,
        "minWriterVersion": 2,
    }
    md = actions[1]["metaData"]
    assert md["format"] == {"provider": "parquet", "options": {}}
    schema = json.loads(md["schemaString"])
    assert [f["name"] for f in schema["fields"]] == ["x"]
    assert md["partitionColumns"] == []
    adds = [a["add"] for a in actions if "add" in a]
    assert adds, "v0 must carry the first commit's add actions"
    for add in adds:
        assert add["path"].endswith(".parquet")
        assert add["dataChange"] is True
        assert add["size"] > 0
        assert add["partitionValues"] == {}
        # every added file exists at the table root, readable parquet
        assert os.path.isfile(os.path.join(tbl.root, add["path"]))


def test_append_accumulates_and_time_travels(spark, tbl):
    v0 = tbl.commit_append(_df(spark, [1]))
    v1 = tbl.commit_append(_df(spark, [2, 3]))
    assert (v0, v1) == (0, 1)
    assert sorted(r.x for r in tbl.read().collect()) == [1, 2, 3]
    assert sorted(r.x for r in tbl.read(version=v0).collect()) == [1]


def test_overwrite_tombstones_old_files_and_is_time_travel_safe(spark, tbl):
    tbl.commit_append(_df(spark, [1, 2]))
    v_pre = tbl.commit_append(_df(spark, [3]))
    v_ow = tbl.commit_overwrite(_df(spark, [9]))
    # head sees only the overwrite
    assert sorted(r.x for r in tbl.read().collect()) == [9]
    # the overwritten files are still on disk and still reachable by
    # version — remove actions tombstone, they don't delete
    assert sorted(r.x for r in tbl.read(version=v_pre).collect()) == [1, 2, 3]
    actions = [
        json.loads(line)
        for line in open(tbl._version_path(v_ow))
        if line.strip()
    ]
    removed = {a["remove"]["path"] for a in actions if "remove" in a}
    live_pre, _ = tbl._replay(v_pre)
    assert removed == set(live_pre), "overwrite must tombstone every live file"


def test_commit_race_rebases_to_next_version(spark, tbl):
    """os.link EEXIST = a concurrent committer took the version; the
    loser must land on the NEXT version with its content intact."""
    tbl.commit_append(_df(spark, [1]))
    # simulate a concurrent winner squatting on version 1
    squat = tbl._version_path(1)
    with open(squat, "w") as fh:
        fh.write(json.dumps({"add": {"path": "nonexistent.parquet",
                                     "partitionValues": {}, "size": 1,
                                     "modificationTime": 0,
                                     "dataChange": True}}) + "\n")
    v = tbl.commit_append(_df(spark, [2]))
    assert v == 2
    # replay at head: squatter's phantom file is part of the log; drop it
    live, _ = tbl._replay(2)
    assert any(p != "nonexistent.parquet" for p in live)


def test_empty_after_overwrite_with_empty_frame(spark, tbl):
    tbl.commit_append(_df(spark, [1, 2]))
    tbl.commit_overwrite(_df(spark, []))
    assert tbl.read().count() == 0
    # schema survives through metaData replay
    assert tbl.read().columns == ["x"]


def test_compact_binpacks_without_changing_contents(spark, tbl):
    for i in range(4):
        tbl.commit_append(_df(spark, list(range(i * 10, i * 10 + 10))).repartition(3))
    live_before, _ = tbl._replay(tbl.latest_version())
    assert len(live_before) >= 8
    before = sorted(r.x for r in tbl.read().collect())
    v = tbl.compact()
    live_after, _ = tbl._replay(v)
    assert len(live_after) < len(live_before)
    assert sorted(r.x for r in tbl.read().collect()) == before
    # spec signal: layout-only commits carry dataChange: false on every action
    actions = [
        json.loads(line) for line in open(tbl._version_path(v)) if line.strip()
    ]
    for a in actions:
        body = a.get("add") or a.get("remove")
        if body is not None:  # commitInfo/metaData are not data actions
            assert body["dataChange"] is False


def test_vacuum_deletes_only_unreachable_files(spark, tbl):
    tbl.commit_append(_df(spark, [1, 2, 3]).repartition(2))
    tbl.commit_append(_df(spark, [4]).repartition(2))
    before = sorted(r.x for r in tbl.read().collect())
    tbl.compact()
    on_disk_before = set(glob.glob(os.path.join(tbl.root, "part-*.parquet")))
    deleted = tbl.vacuum()
    assert deleted, "fragments must be vacuumed"
    live, _ = tbl._replay(tbl.latest_version())
    # every live file survived; every deleted file was unreachable
    for p in live:
        assert os.path.isfile(os.path.join(tbl.root, p))
    assert sorted(r.x for r in tbl.read().collect()) == before
    assert set(glob.glob(os.path.join(tbl.root, "part-*.parquet"))) < on_disk_before


def test_partitioned_write_layout_and_pruning(spark, tbl):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (40, "c")], "x long, k string"
    )
    tbl.commit_append(df, partition_by=["k"])
    adds, schema, pcols = tbl._replay_actions(tbl.latest_version())
    assert pcols == ["k"]
    # spec layout: Hive dirs, partitionValues on every add, partition
    # column absent from the data file but present in stats? (stats only
    # cover stored columns)
    for path, add in adds.items():
        assert path.startswith("k=")
        assert add["partitionValues"] == {"k": path.split("=")[1].split("/")[0]}
        stats = json.loads(add["stats"])
        assert "x" in stats["minValues"] and "k" not in stats["minValues"]
        assert stats["numRecords"] >= 1
    # partition pruning from log metadata alone
    pruned = tbl._prune(adds, {"k": "a"})
    assert pruned and all(p.startswith("k=a/") for p in pruned)
    # stats-range pruning on a non-partition column
    pruned = tbl._prune(adds, {"x": (35, 50)})
    assert pruned == [p for p in sorted(adds) if p.startswith("k=c/")]
    # read reconstructs the partition column with the schema type
    out = tbl.read(where={"k": "a"})
    assert sorted((r.x, r.k) for r in out.collect()) == [(1, "a"), (2, "a")]
    assert dict(out.dtypes)["k"] == "string"


def test_partitioned_compact_and_vacuum_preserve_layout(spark, tbl):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(20)], "x long, k string"
    )
    tbl.commit_append(df.repartition(3), partition_by=["k"])
    tbl.commit_append(
        spark.createDataFrame([(100, "a")], "x long, k string"),
        partition_by=["k"],
    )
    before = sorted(r.x for r in tbl.read().collect())
    tbl.compact()
    tbl.vacuum()
    adds, _, pcols = tbl._replay_actions(tbl.latest_version())
    assert pcols == ["k"]
    assert all(p.startswith("k=") for p in adds)
    assert sorted(r.x for r in tbl.read().collect()) == before
    # pruned read still correct post-compaction
    assert sorted(
        r.x for r in tbl.read(where={"k": "b"}).collect()
    ) == [i for i in range(20) if i % 2 == 0]


def test_txn_watermark_makes_appends_idempotent(spark, tbl):
    df1, df2 = _df(spark, [1]), _df(spark, [2])
    v0 = tbl.commit_append(df1, txn=("app", 0))
    v1 = tbl.commit_append(df2, txn=("app", 1))
    assert (v0, v1) == (0, 1)
    assert tbl.last_txn_version("app") == 1
    # replays at or below the watermark are swallowed — no log entry,
    # no files, head unchanged
    assert tbl.commit_append(df2, txn=("app", 1)) == 1
    assert tbl.commit_append(df1, txn=("app", 0)) == 1
    assert tbl.latest_version() == 1
    assert sorted(r.x for r in tbl.read().collect()) == [1, 2]
    # other apps have their own watermark
    assert tbl.last_txn_version("other") == -1
    assert tbl.commit_append(_df(spark, [3]), txn=("other", 0)) == 2


def test_schema_evolution_null_fills_old_files(spark, tbl):
    """Adding a column re-emits metaData (the spec's evolution
    mechanism); readers project OLD files through the latest schema with
    the new column null, and time travel still sees the old schema."""
    tbl.commit_append(_df(spark, [1, 2]))
    v1 = tbl.commit_append(
        spark.createDataFrame([(3, "c")], "x long, tag string")
    )
    out = tbl.read()
    assert set(out.columns) == {"x", "tag"}
    rows = {r.x: r.tag for r in out.collect()}
    assert rows == {1: None, 2: None, 3: "c"}
    # the evolving commit carries a fresh metaData action
    actions = [
        json.loads(line) for line in open(tbl._version_path(v1)) if line.strip()
    ]
    assert any("metaData" in a for a in actions)
    # time travel to v0: original schema
    assert tbl.read(version=0).columns == ["x"]


def test_checkpoint_pointer_and_o1_reopen(spark, tbl):
    """checkpoint() writes <v>.checkpoint.parquet plus _last_checkpoint,
    and after clean_log() deletes every superseded JSON commit the table
    still reads identically — the state was rebuilt from the checkpoint
    alone."""
    for i in range(5):
        tbl.commit_append(_df(spark, [i]))
    before = sorted(r.x for r in tbl.read().collect())
    v = tbl.checkpoint()
    assert v == 4
    assert os.path.exists(tbl._checkpoint_path(4))
    ptr = json.load(open(os.path.join(tbl.log_dir, "_last_checkpoint")))
    assert ptr["version"] == 4
    cleaned = tbl.clean_log()
    assert len(cleaned) == 5
    assert not glob.glob(os.path.join(tbl.log_dir, "*.json"))
    assert tbl.latest_version() == 4
    assert sorted(r.x for r in tbl.read().collect()) == before
    # appends continue from the checkpointed head
    assert tbl.commit_append(_df(spark, [99])) == 5
    assert sorted(r.x for r in tbl.read().collect()) == before + [99]


def test_checkpoint_preserves_tombstones_and_partitions(spark, tbl):
    """Overwrite tombstones and Hive partitionValues round-trip through
    the checkpoint: after cleanup a raw directory listing would
    double-count the overwritten files, so matching the pre-cleanup read
    proves tombstones were replayed from parquet."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "x long, part string"
    )
    tbl.commit_append(df, partition_by=["part"])
    tbl.commit_overwrite(spark.createDataFrame([(9, "a")], "x long, part string"))
    before = sorted((r.x, r.part) for r in tbl.read().collect())
    assert before == [(9, "a")]
    tbl.checkpoint()
    tbl.clean_log()
    assert sorted((r.x, r.part) for r in tbl.read().collect()) == before
    # data files of the overwritten commit are still un-referenced
    assert sorted(
        (r.x, r.part) for r in tbl.read(version=tbl.latest_version()).collect()
    ) == before


def test_time_travel_below_checkpoint_fails_loudly_after_clean(spark, tbl):
    tbl.commit_append(_df(spark, [1]))
    tbl.commit_append(_df(spark, [2]))
    tbl.checkpoint()
    # before cleanup, time travel below the checkpoint still works
    assert sorted(r.x for r in tbl.read(version=0).collect()) == [1]
    tbl.clean_log()
    with pytest.raises(ValueError, match="cleaned"):
        tbl.read(version=0)


def test_txn_watermark_survives_checkpoint_cleanup(spark, tbl):
    """Exactly-once must hold across log cleanup: the checkpoint carries
    one txn row per app, so a replayed epoch is still swallowed after
    every JSON commit that recorded it is gone."""
    tbl.commit_append(_df(spark, [1]), txn=("app", 7))
    tbl.checkpoint()
    tbl.clean_log()
    assert tbl.last_txn_version("app") == 7
    head = tbl.latest_version()
    assert tbl.commit_append(_df(spark, [1]), txn=("app", 7)) == head
    assert tbl.latest_version() == head
    assert tbl.commit_append(_df(spark, [2]), txn=("app", 8)) == head + 1


def test_merge_upserts_and_prunes_by_stats(spark, tbl):
    """MERGE replaces matched rows, inserts unmatched ones, and rewrites
    ONLY the files whose stats key-range overlaps the source keys — the
    disjoint-range file must carry over by path."""
    lo = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    hi = spark.createDataFrame([(100, "x"), (200, "y")], "k long, v string")
    tbl.commit_append(lo.coalesce(1))
    tbl.commit_append(hi.coalesce(1))
    before, _, _ = tbl._replay_actions(tbl.latest_version())
    hi_files = {
        p
        for p, a in before.items()
        if json.loads(a["stats"])["minValues"].get("k", -1) >= 100
    }
    assert hi_files
    source = spark.createDataFrame(
        [(2, "B"), (3, "c")], "k long, v string"  # update k=2, insert k=3
    )
    tbl.commit_merge(source, keys=["k"])
    after, _, _ = tbl._replay_actions(tbl.latest_version())
    assert hi_files <= set(after), "disjoint-range files were rewritten"
    assert not (set(before) - hi_files) & set(after), "overlapping file kept"
    rows = {r.k: r.v for r in tbl.read().collect()}
    assert rows == {1: "a", 2: "B", 3: "c", 100: "x", 200: "y"}


def test_merge_into_empty_table_and_empty_source(spark, tbl):
    source = spark.createDataFrame([(1, "a")], "k long, v string")
    tbl.commit_merge(source, keys=["k"])
    assert {r.k: r.v for r in tbl.read().collect()} == {1: "a"}
    empty = spark.createDataFrame([], "k long, v string")
    tbl.commit_merge(empty, keys=["k"])
    assert {r.k: r.v for r in tbl.read().collect()} == {1: "a"}


def test_merge_on_partitioned_table_raises(spark, tbl):
    df = spark.createDataFrame([(1, "a")], "k long, part string")
    tbl.commit_append(df, partition_by=["part"])
    with pytest.raises(NotImplementedError, match="partition"):
        tbl.commit_merge(df, keys=["k"])


def test_timestamp_time_travel(spark, tbl):
    """timestampAsOf semantics: commit time = log file mtime; a query
    timestamp resolves to the latest commit at or before it."""
    tbl.commit_append(_df(spark, [1]))
    tbl.commit_append(_df(spark, [2]))
    # pin distinct, known commit times
    t0, t1 = 1_700_000_000, 1_700_000_100
    os.utime(tbl._version_path(0), (t0, t0))
    os.utime(tbl._version_path(1), (t1, t1))
    between = (t0 + 50) * 1000
    assert sorted(r.x for r in tbl.read(timestamp_ms=between).collect()) == [1]
    after = (t1 + 50) * 1000
    assert sorted(r.x for r in tbl.read(timestamp_ms=after).collect()) == [1, 2]
    assert tbl.read(timestamp_ms=t1 * 1000).count() == 2  # inclusive
    with pytest.raises(ValueError, match="no commit at or before"):
        tbl.read(timestamp_ms=(t0 - 50) * 1000)
    with pytest.raises(ValueError, match="not both"):
        tbl.read(version=0, timestamp_ms=after)


def test_compact_zorder_tightens_file_stats(spark, tbl):
    """OPTIMIZE ZORDER: after a clustered rewrite each file's stats
    cover a tight key range, so a range predicate prunes files from the
    log; the unsorted appends' stats span everything and prune nothing."""
    import random

    rng = random.Random(7)
    rows = [(rng.randrange(1000),) for _ in range(4000)]
    df = spark.createDataFrame(rows, "k long")
    tbl.commit_append(df.repartition(4))
    live, _, _ = tbl._replay_actions(tbl.latest_version())
    assert len(tbl._prune(live, {"k": (0, 99)})) == len(live), (
        "unsorted appends should not prune"
    )
    tbl.compact(target_file_bytes=8 * 1024, zorder_by=["k"])
    live, _, _ = tbl._replay_actions(tbl.latest_version())
    pruned = tbl._prune(live, {"k": (0, 99)})
    assert len(live) > 1 and len(pruned) < len(live)
    # contents invariant under the clustered rewrite
    assert sorted(r.k for r in tbl.read().collect()) == sorted(
        k for (k,) in rows
    )


def test_delete_prunes_and_removes_only_doomed_rows(spark, tbl):
    lo = spark.createDataFrame([(i, f"v{i}") for i in range(10)], "k long, v string")
    hi = spark.createDataFrame([(i, f"v{i}") for i in range(100, 110)], "k long, v string")
    tbl.commit_append(lo.coalesce(1))
    tbl.commit_append(hi.coalesce(1))
    before, _, _ = tbl._replay_actions(tbl.latest_version())
    tbl.commit_delete("k", 3, 5)
    after, _, _ = tbl._replay_actions(tbl.latest_version())
    # the hi file is disjoint from [3, 5] and must carry over by path
    assert set(before) & set(after)
    assert sorted(r.k for r in tbl.read().collect()) == (
        [0, 1, 2, 6, 7, 8, 9] + list(range(100, 110))
    )
    # deleting everything in a file leaves a pure remove (no empty add)
    tbl.commit_delete("k", 100, 109)
    assert sorted(r.k for r in tbl.read().collect()) == [0, 1, 2, 6, 7, 8, 9]


def test_restore_re_materializes_old_version_as_new_commit(spark, tbl):
    tbl.commit_append(_df(spark, [1, 2]))
    v1 = tbl.commit_append(_df(spark, [3]))
    tbl.commit_overwrite(_df(spark, [9]))
    head = tbl.latest_version()
    v_restore = tbl.restore(v1)
    assert v_restore == head + 1
    assert sorted(r.x for r in tbl.read().collect()) == [1, 2, 3]
    # history preserved: the overwrite state is still reachable
    assert sorted(r.x for r in tbl.read(version=head).collect()) == [9]
    # restore after vacuum of the target's files fails loudly
    tbl.commit_overwrite(_df(spark, [7]))
    tbl.vacuum()
    with pytest.raises(ValueError, match="vacuumed"):
        tbl.restore(v1)


# -- round-7 concurrency + stats-soundness fixes -----------------------


def test_overwrite_race_rederives_tombstones(spark, tbl, monkeypatch):
    """A commit that races with a concurrent append must tombstone the
    racer's files too: the retry used to republish tombstones computed
    against the pre-race head, leaving the racer's rows alive under an
    'overwrite' (round-7 ADVICE finding)."""
    tbl.commit_append(_df(spark, [1, 2]))
    racer = DeltaLogTable(spark, tbl.root)
    orig = DeltaLogTable._stage_files
    raced = {"done": False}

    def stage_with_race(self, df, partition_by=None, bloom_for=None):
        adds = orig(self, df, partition_by, bloom_for=bloom_for)
        if self is tbl and not raced["done"]:
            raced["done"] = True
            racer.commit_append(_df(spark, [99]))  # concurrent winner
        return adds

    monkeypatch.setattr(DeltaLogTable, "_stage_files", stage_with_race)
    tbl.commit_overwrite(_df(spark, [7]))
    assert sorted(r.x for r in tbl.read().collect()) == [7], (
        "the racer's append must not survive the overwrite"
    )


def test_merge_race_rederives_rewrite(spark, tbl, monkeypatch):
    """MERGE racing with an append must keep the racer's rows."""
    tbl.commit_append(_df(spark, [1, 2]))
    racer = DeltaLogTable(spark, tbl.root)
    orig = DeltaLogTable._stage_files
    raced = {"done": False}

    def stage_with_race(self, df, partition_by=None, bloom_for=None):
        adds = orig(self, df, partition_by, bloom_for=bloom_for)
        if self is tbl and not raced["done"]:
            raced["done"] = True
            racer.commit_append(_df(spark, [99]))
        return adds

    monkeypatch.setattr(DeltaLogTable, "_stage_files", stage_with_race)
    tbl.commit_merge(_df(spark, [2]), keys=["x"])
    assert sorted(r.x for r in tbl.read().collect()) == [1, 2, 99]


def test_schema_evolution_keeps_table_id(spark, tbl):
    """The spec keeps the table id stable for the table's lifetime; the
    schema-evolution metaData re-emission must carry it forward, not
    mint a fresh uuid (round-7 ADVICE finding)."""
    tbl.commit_append(_df(spark, [1]))
    v = tbl.commit_append(
        spark.createDataFrame([(2, "b")], "x long, y string")
    )
    ids = {
        a["metaData"]["id"]
        for ver in range(v + 1)
        for a in tbl._actions(ver)
        if "metaData" in a
    }
    assert len(ids) == 1, f"table id changed across schema evolution: {ids}"


def test_file_stats_drop_columns_not_covered_by_every_row_group(tmp_path):
    """A column whose min/max is unusable in ANY row group must be
    absent from the file stats entirely — recording the other row
    groups' range under-covers the file and lets pruning skip rows that
    exist (lost DELETEs / MERGE updates; round-7 ADVICE finding)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "n": pa.array([1, 2, 3, 4], pa.int64()),
            "s": pa.array([b"aa", b"bb", b"\xff\xfe", b"\xff\xff"], pa.binary()),
        }
    )
    path = str(tmp_path / "f.parquet")
    pq.write_table(t, path, row_group_size=2)  # rg0 utf-8, rg1 not
    stats = json.loads(DeltaLogTable._file_stats(path))
    assert stats["numRecords"] == 4
    assert stats["minValues"]["n"] == 1 and stats["maxValues"]["n"] == 4
    assert "s" not in stats["minValues"] and "s" not in stats["maxValues"]


def test_delete_with_timestamp_bounds_prunes_by_iso_stats(spark, tbl):
    """Date/timestamp stats are ISO strings in the log; datetime bounds
    used to raise TypeError in the pruning comparison (round-7 ADVICE
    finding) — they must normalize and delete correctly."""
    from datetime import datetime

    rows = [(i, datetime(2026, 1, 1 + i, 12, 0)) for i in range(4)]
    tbl.commit_append(spark.createDataFrame(rows, "x long, ts timestamp"))
    tbl.commit_delete("ts", datetime(2026, 1, 2), datetime(2026, 1, 3, 23))
    assert sorted(r.x for r in tbl.read().collect()) == [0, 3]


def test_merge_txn_watermark_is_idempotent(spark, tbl):
    """commit_merge with txn=(appId, epoch) must skip an epoch at or
    below the committed watermark — the streaming-CDC exactly-once
    handshake (sink_delta_cdc's replay guard)."""
    tbl.commit_append(_df(spark, [1, 2, 3]))
    src = spark.createDataFrame([(2,)], "x long")
    v1 = tbl.commit_merge(src, keys=["x"], txn=("cdc", 0))
    assert tbl.latest_version() == v1
    # replay of the same epoch: no new commit, same head
    assert tbl.commit_merge(src, keys=["x"], txn=("cdc", 0)) == v1
    assert tbl.latest_version() == v1
    # the next epoch commits normally
    v2 = tbl.commit_merge(spark.createDataFrame([(4,)], "x long"),
                          keys=["x"], txn=("cdc", 1))
    assert v2 == v1 + 1
    assert sorted(r.x for r in tbl.read().collect()) == [1, 2, 3, 4]


def test_commit_info_and_history(spark, tbl):
    """Every command records the spec's commitInfo (first line:
    timestamp + operation); history() surfaces them newest-first."""
    tbl.commit_append(_df(spark, [1, 2]))
    tbl.commit_merge(_df(spark, [2]), keys=["x"])
    tbl.commit_delete("x", 2, 2)
    tbl.compact()
    hist = tbl.history()
    assert [h["version"] for h in hist] == [3, 2, 1, 0]
    assert [h["operation"] for h in hist] == [
        "OPTIMIZE", "DELETE", "MERGE", "WRITE",
    ]
    assert all(isinstance(h["timestamp"], int) for h in hist)
    # commitInfo is the FIRST action line of each commit
    first = json.loads(open(tbl._version_path(0)).readline())
    assert "commitInfo" in first and first["commitInfo"]["operation"] == "WRITE"


def test_vacuum_retention_window_keeps_young_tombstones(spark, tbl):
    """A tombstoned file whose deletionTimestamp is inside the retention
    window must survive vacuum (readers of recent versions may still
    scan it); an expired window deletes it."""
    tbl.commit_append(_df(spark, [1, 2]))
    v0 = tbl.latest_version()
    tbl.commit_overwrite(_df(spark, [9]))
    live_v0, _ = tbl._replay(v0)
    # 1-hour retention: the just-tombstoned files are younger -> kept
    assert tbl.vacuum(retention_ms=3_600_000) == []
    assert sorted(r.x for r in tbl.read(version=v0).collect()) == [1, 2]
    # collapsed window (None) deletes everything not live at head
    deleted = tbl.vacuum()
    assert set(deleted) == set(live_v0)


def _kv(spark, rows):
    return spark.createDataFrame(rows, "x long, v double")


@pytest.fixture()
def cdf_tbl(spark, tmp_path_factory):
    return DeltaLogTable(
        spark, str(tmp_path_factory.mktemp("delta_cdf")), change_data_feed=True
    )


def test_cdf_merge_emits_cdc_not_rewrite_rows(spark, cdf_tbl):
    """MERGE on a CDF table reports exactly the matched rows (pre/post
    image) and the inserted rows — carried-over copy-on-write rewrite
    rows must NOT appear as changes."""
    cdf_tbl.commit_append(_kv(spark, [(1, 1.0), (2, 2.0), (3, 3.0)]))
    cdf_tbl.commit_merge(_kv(spark, [(2, 20.0), (4, 40.0)]), keys=["x"])
    ch = {
        (r["x"], r["v"], r["_change_type"], r["_commit_version"])
        for r in cdf_tbl.table_changes(0).collect()
    }
    assert ch == {
        (2, 2.0, "update_preimage", 1),
        (2, 20.0, "update_postimage", 1),
        (4, 40.0, "insert", 1),
    }
    # the full feed reports rows 1 and 3 only once: their v0 insert
    full = cdf_tbl.table_changes(-1)
    assert [
        r["_change_type"] for r in full.filter("x = 1").collect()
    ] == ["insert"]
    # and the commit carries a real cdc action on disk
    actions = [
        json.loads(line)
        for line in open(cdf_tbl._version_path(1))
        if line.strip()
    ]
    cdcs = [a["cdc"] for a in actions if "cdc" in a]
    assert cdcs and all(c["path"].startswith("_change_data/") for c in cdcs)
    assert all(c["dataChange"] is False for c in cdcs)


def test_cdf_delete_emits_doomed_rows_only(spark, cdf_tbl):
    cdf_tbl.commit_append(_kv(spark, [(i, float(i)) for i in range(1, 6)]))
    cdf_tbl.commit_delete("x", 2, 3)
    ch = {
        (r["x"], r["_change_type"])
        for r in cdf_tbl.table_changes(0).collect()
    }
    assert ch == {(2, "delete"), (3, "delete")}
    assert sorted(r.x for r in cdf_tbl.read().collect()) == [1, 4, 5]


def test_cdf_fallback_appends_and_silent_optimize(spark, cdf_tbl):
    """Append commits need no cdc files: the add-action fallback reports
    them as inserts.  OPTIMIZE (dataChange=false) emits nothing.  An
    overwrite reads as full-file delete + insert through the fallback."""
    cdf_tbl.commit_append(_kv(spark, [(1, 1.0)]))
    cdf_tbl.commit_append(_kv(spark, [(2, 2.0)]))
    cdf_tbl.compact()
    ch = [
        (r["x"], r["_change_type"], r["_commit_version"])
        for r in cdf_tbl.table_changes(-1).orderBy("x").collect()
    ]
    assert ch == [(1, "insert", 0), (2, "insert", 1)]  # nothing from v2
    v = cdf_tbl.commit_overwrite(_kv(spark, [(9, 9.0)]))
    ch2 = {
        (r["x"], r["_change_type"])
        for r in cdf_tbl.table_changes(v - 1, v).collect()
    }
    assert ch2 == {(1, "delete"), (2, "delete"), (9, "insert")}


def test_cdf_metadata_flag_and_vacuum_keeps_referenced_cdc(spark, cdf_tbl):
    cdf_tbl.commit_append(_kv(spark, [(1, 1.0), (2, 2.0)]))
    cdf_tbl.commit_merge(_kv(spark, [(2, 20.0)]), keys=["x"])
    md = json.loads(
        [
            line
            for line in open(cdf_tbl._version_path(0))
            if "metaData" in line
        ][0]
    )["metaData"]
    assert md["configuration"] == {"delta.enableChangeDataFeed": "true"}
    deleted = cdf_tbl.vacuum()  # collapsed window: v0 data file goes
    assert deleted  # the rewritten pre-merge file
    assert not any(p.startswith("_change_data/") for p in deleted)
    # the merge's feed stays consumable from its kept cdc file
    ch = {
        (r["x"], r["_change_type"])
        for r in cdf_tbl.table_changes(0).collect()
    }
    assert ch == {(2, "update_preimage"), (2, "update_postimage")}


def test_check_constraint_enforced_and_protocol_upgraded(spark, tbl):
    """ADD CONSTRAINT stores delta.constraints.* and upgrades the
    protocol to minWriterVersion 3 in the same commit; every data-adding
    command then rejects violating batches whole, leaving the log
    untouched."""
    from satellite_data_ingestion_spark.sources.delta_log import (
        DeltaConstraintViolation,
    )

    tbl.commit_append(_df(spark, [1, 2]))
    v = tbl.add_constraint("x_small", "x < 100")
    actions = [
        json.loads(line) for line in open(tbl._version_path(v)) if line.strip()
    ]
    assert [a["protocol"] for a in actions if "protocol" in a] == [
        {"minReaderVersion": 1, "minWriterVersion": 3}
    ]
    md = [a["metaData"] for a in actions if "metaData" in a][0]
    assert md["configuration"]["delta.constraints.x_small"] == "x < 100"
    tbl.commit_append(_df(spark, [3]))  # valid
    head = tbl.latest_version()
    with pytest.raises(DeltaConstraintViolation):
        tbl.commit_append(_df(spark, [5, 200]))
    assert tbl.latest_version() == head  # whole batch rejected, no commit
    with pytest.raises(DeltaConstraintViolation):
        tbl.commit_merge(_df(spark, [150]), keys=["x"])
    with pytest.raises(DeltaConstraintViolation):
        tbl.commit_overwrite(_df(spark, [500]))
    assert sorted(r.x for r in tbl.read().collect()) == [1, 2, 3]


def test_append_only_blocks_data_changing_removes(spark, tbl):
    """delta.appendOnly=true: overwrite/delete/merge-rewrite/restore all
    raise; appends and layout-only OPTIMIZE stay legal."""
    tbl.commit_append(_df(spark, [1, 2, 3]))
    tbl.set_property("delta.appendOnly", "true")
    for op in (
        lambda: tbl.commit_overwrite(_df(spark, [9])),
        lambda: tbl.commit_delete("x", 1, 1),
        lambda: tbl.commit_merge(_df(spark, [1]), keys=["x"]),
        lambda: tbl.restore(0),
    ):
        with pytest.raises(ValueError, match="appendOnly"):
            op()
    tbl.commit_append(_df(spark, [4]))
    tbl.compact()
    assert sorted(r.x for r in tbl.read().collect()) == [1, 2, 3, 4]


def test_column_mapping_rename_drop_metadata_only(spark, tbl):
    """enable/rename/drop touch no data files; the protocol rises to
    (2, 5); old files read through the renamed logical schema; rewrite
    commands on a mapped table refuse loudly."""
    df = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)],
                               "x long, y string, z double")
    tbl.commit_append(df)
    files_v0, _ = tbl._replay(tbl.latest_version())
    tbl.enable_column_mapping()
    tbl.rename_column("y", "label")
    tbl.drop_column("z")
    files_now, _ = tbl._replay(tbl.latest_version())
    assert files_now == files_v0  # metaData-only commits
    st = tbl._state(tbl.latest_version())
    assert st["protocol"] == {"minReaderVersion": 2, "minWriterVersion": 5}
    cfg = st["metaData"]["configuration"]
    assert cfg["delta.columnMapping.mode"] == "name"
    fields = json.loads(st["metaData"]["schemaString"])["fields"]
    assert [f["name"] for f in fields] == ["x", "label"]
    assert [
        f["metadata"]["delta.columnMapping.physicalName"] for f in fields
    ] == ["x", "y"]  # physical names never change
    assert [f["metadata"]["delta.columnMapping.id"] for f in fields] == [1, 2]
    # appends use the NEW logical name; reads see one coherent schema
    tbl.commit_append(
        spark.createDataFrame([(3, "c")], "x long, label string")
    )
    out = tbl.read()
    assert out.columns == ["x", "label"]
    assert sorted((r.x, r.label) for r in out.collect()) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]
    # time travel BEFORE enablement keeps the original schema
    old = tbl.read(version=0)
    assert old.columns == ["x", "y", "z"]
    # rewrite commands are out of scope on mapped tables: refuse loudly
    with pytest.raises(NotImplementedError):
        tbl.commit_delete("x", 1, 1)
    with pytest.raises(NotImplementedError):
        tbl.compact()
    # appends must supply exactly the logical columns
    with pytest.raises(ValueError, match="logical columns"):
        tbl.commit_append(spark.createDataFrame([(9, "d", 9.0)],
                                                "x long, y string, z double"))


def test_fsck_tombstones_missing_files(spark, tbl):
    """FSCK: a live add whose file vanished from storage gets a remove
    tombstone so reads recover; dry_run only reports; healthy tables
    commit nothing."""
    tbl.commit_append(_df(spark, [1, 2]))
    tbl.commit_append(_df(spark, [3]))
    assert tbl.fsck() == []  # healthy: no commit
    head = tbl.latest_version()
    live, _ = tbl._replay(head)
    victim = live[0]
    os.unlink(os.path.join(tbl.root, victim))
    assert tbl.fsck(dry_run=True) == [victim]
    assert tbl.latest_version() == head  # dry run commits nothing
    assert tbl.fsck() == [victim]
    assert tbl.latest_version() == head + 1
    survivors = {
        r.x for r in tbl.read().collect()
    }
    # the surviving rows are exactly the other files' contents
    assert survivors and survivors <= {1, 2, 3}
    ops = [h["operation"] for h in tbl.history()]
    assert ops[0] == "FSCK"


def test_in_commit_timestamps_and_table_features(spark, tbl):
    """ICT enablement upgrades the protocol to the table-features form
    (minWriterVersion 7, writerFeatures listing implied legacy features
    + inCommitTimestamp); every later commit's commitInfo carries a
    STRICTLY monotonic inCommitTimestamp, and timestampAsOf resolves by
    ICT — immune to log-file mtime perturbation."""
    tbl.commit_append(_df(spark, [1]))
    v_on = tbl.enable_in_commit_timestamps()
    st = tbl._state(tbl.latest_version())
    proto = st["protocol"]
    assert proto["minWriterVersion"] == 7
    assert "inCommitTimestamp" in proto["writerFeatures"]
    assert {"appendOnly", "invariants"} <= set(proto["writerFeatures"])
    cfg = st["metaData"]["configuration"]
    assert cfg["delta.enableInCommitTimestamps"] == "true"
    assert cfg["delta.inCommitTimestampEnablementVersion"] == str(v_on)
    tbl.commit_append(_df(spark, [2]))
    tbl.commit_append(_df(spark, [3]))
    icts = [
        tbl._commit_timestamp(v) for v in range(v_on, tbl.latest_version() + 1)
    ]
    assert all(t is not None for t in icts)
    assert all(b > a for a, b in zip(icts, icts[1:])), icts  # strict
    # timestampAsOf resolves by ICT even if the log files' mtimes are
    # scrambled (file copy / restore) — the whole point of the feature.
    head = tbl.latest_version()
    for v in range(head + 1):
        os.utime(tbl._version_path(v), (1, 1))  # mtime nonsense
    mid_ict = tbl._commit_timestamp(head - 1)
    assert tbl.version_at_timestamp(mid_ict) == head - 1
    assert sorted(
        r.x for r in tbl.read(timestamp_ms=mid_ict).collect()
    ) == [1, 2]
    assert tbl.history()[0]["timestamp"] == tbl._commit_timestamp(head)


def test_checkpoint_preserves_table_features(spark, tbl):
    """The table-features protocol (writer 7 + feature lists) must
    survive checkpoint + clean_log: a dropped writerFeatures list would
    silently downgrade the table's contract for post-checkpoint
    readers, and ICT commits must keep flowing after the round-trip."""
    tbl.commit_append(_df(spark, [1]))
    tbl.enable_in_commit_timestamps()
    tbl.commit_append(_df(spark, [2]))
    tbl.checkpoint()
    tbl.clean_log()
    st = tbl._state(tbl.latest_version())
    assert st["protocol"]["minWriterVersion"] == 7
    assert "inCommitTimestamp" in st["protocol"]["writerFeatures"]
    assert (
        st["metaData"]["configuration"]["delta.enableInCommitTimestamps"]
        == "true"
    )
    v = tbl.commit_append(_df(spark, [3]))  # post-checkpoint commit
    assert tbl._commit_timestamp(v) is not None  # ICT still recorded
    assert sorted(r.x for r in tbl.read().collect()) == [1, 2, 3]


def test_replicate_to_ships_incrementally_and_idempotently(
    spark, tbl, tmp_path_factory
):
    """Log shipping: each sync moves only the new commits; a replica is
    independently openable at every synced version; re-shipping a synced
    range is a no-op; deletes/merges replicate exactly."""
    replica_root = str(tmp_path_factory.mktemp("replica"))
    tbl.commit_append(_df(spark, [1, 2, 3]))
    wm = tbl.replicate_to(replica_root, -1)
    assert wm == 0
    replica = DeltaLogTable(spark, replica_root)
    assert sorted(r.x for r in replica.read().collect()) == [1, 2, 3]

    # Source advances; replica (not yet synced) still serves v0.
    tbl.commit_append(_df(spark, [4, 5]))
    tbl.commit_delete("x", 2, 4)
    assert sorted(r.x for r in replica.read().collect()) == [1, 2, 3]

    wm = tbl.replicate_to(replica_root, wm)
    assert wm == 2
    assert sorted(r.x for r in DeltaLogTable(spark, replica_root).read().collect()) == [1, 5]
    # Time travel on the replica: the shipped log carries full history.
    assert sorted(
        r.x for r in DeltaLogTable(spark, replica_root).read(version=1).collect()
    ) == [1, 2, 3, 4, 5]

    # Idempotent re-ship of the whole range.
    assert tbl.replicate_to(replica_root, -1) == 2
    assert sorted(r.x for r in DeltaLogTable(spark, replica_root).read().collect()) == [1, 5]


def test_replicate_refuses_cleaned_history(spark, tbl, tmp_path_factory):
    """Commits below a cleaned checkpoint cannot be log-shipped — the
    sync must raise, not silently produce a hole in the replica."""
    replica_root = str(tmp_path_factory.mktemp("replica2"))
    tbl.commit_append(_df(spark, [1]))
    tbl.commit_append(_df(spark, [2]))
    tbl.checkpoint()
    tbl.clean_log()
    with pytest.raises(ValueError, match="cleaned|missing"):
        tbl.replicate_to(replica_root, -1)


def test_shallow_clone_is_metadata_only_and_pinned(spark, tbl, tmp_path_factory):
    """clone_to forks the table with ONE commit of absolute-path adds:
    no data file is copied, reads agree at clone time, and later
    source commits never become visible in the clone."""
    tbl.commit_append(_df(spark, [1, 2, 3]))
    tbl.commit_append(_df(spark, [4, 5]))
    clone_root = str(tmp_path_factory.mktemp("clone"))
    clone = tbl.clone_to(clone_root)
    # zero copy: nothing but the log under the clone root
    data = [
        p
        for p in glob.glob(os.path.join(clone_root, "**", "*.parquet"), recursive=True)
        if os.sep + "_delta_log" + os.sep not in p
    ]
    assert data == []
    # one commit, absolute borrowed paths, stats carried over
    assert clone.latest_version() == 0
    live, _, _ = clone._replay_actions(0)
    assert live and all(os.path.isabs(p) for p in live)
    assert all("stats" in a for a in live.values())
    assert sorted(r.x for r in clone.read().collect()) == [1, 2, 3, 4, 5]
    # pinned: a later source append is invisible to the clone
    tbl.commit_append(_df(spark, [6]))
    assert sorted(r.x for r in clone.read().collect()) == [1, 2, 3, 4, 5]
    assert sorted(r.x for r in tbl.read().collect()) == [1, 2, 3, 4, 5, 6]


def test_clone_diverges_without_touching_source(spark, tbl, tmp_path_factory):
    """Clone-side writes land under the clone root; the source's files
    and contents are untouched by clone appends and deletes."""
    tbl.commit_append(_df(spark, [1, 2, 3, 4, 5]))
    clone = tbl.clone_to(str(tmp_path_factory.mktemp("clone")))
    clone.commit_append(_df(spark, [10]))
    clone.commit_delete("x", 2, 3)
    assert sorted(r.x for r in clone.read().collect()) == [1, 4, 5, 10]
    assert sorted(r.x for r in tbl.read().collect()) == [1, 2, 3, 4, 5]
    # the delete's rewrite landed clone-local: every borrowed source
    # file it tombstoned still exists on disk for the source's readers
    src_live, _, _ = tbl._replay_actions(tbl.latest_version())
    for p in src_live:
        assert os.path.isfile(os.path.join(tbl.root, p))


def test_clone_carries_table_properties_and_guards(spark, tbl, tmp_path_factory):
    """Source configuration lands in the clone's version-0 metaData;
    non-empty targets and DV-carrying sources are refused."""
    tbl.commit_append(_df(spark, [1, 2]))
    tbl.set_property("delta.appendOnly", "false")
    tbl.set_property("team", "ingest")
    clone_root = str(tmp_path_factory.mktemp("clone"))
    clone = tbl.clone_to(clone_root)
    md = clone._state(0)["metaData"]
    assert md["configuration"].get("team") == "ingest"
    # non-empty target refused
    with pytest.raises(ValueError, match="already has a Delta log"):
        tbl.clone_to(clone_root)
    # DV-carrying source refused (descriptors resolve against the
    # source root; purge first)
    tbl.commit_overwrite(_df(spark, [1, 2, 3, 4]).repartition(1))
    tbl.enable_deletion_vectors()
    tbl.delete_rows_dv("x", 1, 2)
    live, _, _ = tbl._replay_actions(tbl.latest_version())
    assert any(a.get("deletionVector") for a in live.values())
    with pytest.raises(NotImplementedError, match="deletion vectors"):
        tbl.clone_to(str(tmp_path_factory.mktemp("clone2")))


def test_clone_of_cdf_table_emits_cdc(spark, tmp_path_factory):
    """A clone of a CDF table must BEHAVE like one, not just advertise it:
    the seeded delta.enableChangeDataFeed property flips the clone's flag,
    so clone-side DELETEs write real cdc actions and table_changes reports
    the deleted rows — not the copy-on-write carried-over rewrites."""
    from satellite_data_ingestion_spark.sources.delta_log import DeltaLogTable

    src = DeltaLogTable(
        spark, str(tmp_path_factory.mktemp("cdfsrc")), change_data_feed=True
    )
    src.commit_append(_df(spark, [1, 2, 3, 4]))
    clone = src.clone_to(str(tmp_path_factory.mktemp("cdfclone")))
    assert clone.change_data_feed is True
    clone.commit_delete("x", 2, 3)
    v = clone.latest_version()
    assert any("cdc" in a for a in clone._actions(v)), (
        "CDF clone's delete wrote no cdc action"
    )
    feed = {
        (r["x"], r["_change_type"])
        for r in clone.table_changes(v - 1, v).collect()
    }
    assert feed == {(2, "delete"), (3, "delete")}


def test_generated_columns_survive_schema_evolution(spark, tbl):
    """An append whose column set evolves (extra column) on a
    generated-columns table must carry delta.generationExpression into
    the evolved schema — a plain schema re-emission silently erases it
    and later appends stop computing/validating the column."""
    tbl.commit_append(
        spark.createDataFrame([(1,)], "x long"), generated={"x2": "x * 2"}
    )
    # widen: new column 'tag' rides along; x2 is computed for the batch
    tbl.commit_append(
        spark.createDataFrame([(5, "a")], "x long, tag string")
    )
    assert tbl._generated_at(tbl.latest_version()) == {"x2": "x * 2"}
    rows = {(r.x, r.x2) for r in tbl.read().collect()}
    assert (5, 10) in rows
    # and the NEXT append still computes the generated column
    tbl.commit_append(spark.createDataFrame([(7, "b")], "x long, tag string"))
    assert (7, 14) in {(r.x, r.x2) for r in tbl.read().collect()}


def test_clone_at_version_pins_historic_contents(spark, tbl, tmp_path_factory):
    """clone_to(version=) forks the table AS OF that version."""
    tbl.commit_append(_df(spark, [1, 2]))
    tbl.commit_append(_df(spark, [3]))
    clone = tbl.clone_to(str(tmp_path_factory.mktemp("clone")), version=0)
    assert sorted(r.x for r in clone.read().collect()) == [1, 2]


def test_merge_schema_evolution_widens_and_keeps_values(spark, tbl):
    """A wider MERGE source evolves the schema in the same commit:
    source rows keep their new-column values, carried-over target rows
    read null, and a narrower follow-up source inserts null there."""
    df = spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double")
    tbl.commit_append(df)
    wide = spark.createDataFrame(
        [(2, 21.0, "b2"), (4, 40.0, "b2")], "k long, v double, batch string"
    )
    tbl.commit_merge(wide, keys=["k"])
    rows = {r.k: (r.v, r.batch) for r in tbl.read().collect()}
    assert rows == {
        1: (10.0, None),
        2: (21.0, "b2"),
        3: (30.0, None),
        4: (40.0, "b2"),
    }
    # narrower source after evolution: missing column inserts as null
    narrow = spark.createDataFrame([(5, 50.0)], "k long, v double")
    tbl.commit_merge(narrow, keys=["k"])
    rows = {r.k: (r.v, r.batch) for r in tbl.read().collect()}
    assert rows[5] == (50.0, None) and rows[2] == (21.0, "b2")
    # time travel below the evolution sees the narrow schema
    assert "batch" not in tbl.read(version=0).columns


def test_bloom_index_prunes_point_lookups_and_roundtrips_checkpoint(spark, tbl):
    """Per-file bloom (engineBloom extension): no false negatives for
    present keys, definite misses prune files that stats keep, and the
    filter survives the checkpoint + clean_log round-trip."""
    import pyarrow.parquet as pq

    df = spark.createDataFrame([(i, i % 7) for i in range(200)], "k long, g long")
    tbl.commit_append(df.repartition(4, "k"), bloom_for=["k"])
    adds, _, _ = tbl._replay_actions(tbl.latest_version())
    assert all("engineBloom" in a for a in adds.values())
    # no false negatives: every key passes its own file's bloom
    owners = {}
    for path, a in adds.items():
        ks = pq.read_table(os.path.join(tbl.root, path), columns=["k"])["k"].to_pylist()
        owners[path] = set(ks)
        for k in ks:
            assert tbl._bloom_maybe_contains(a["engineBloom"]["k"], k)
    # point lookup of a present key: bloom pruning keeps the owning
    # file and (hash-distributed layout) strictly beats stats pruning
    stats_only = {
        p: {k: v for k, v in a.items() if k != "engineBloom"}
        for p, a in adds.items()
    }
    probe = 123
    kept = tbl._prune(adds, {"k": probe})
    assert any(probe in owners[p] for p in kept)
    assert len(kept) < len(tbl._prune(stats_only, {"k": probe}))
    out = sorted(r.k for r in tbl.read(where={"k": probe}).collect() if r.k == probe)
    assert out == [probe]
    # checkpoint round-trip keeps the bloom byte-for-byte
    tbl.checkpoint()
    tbl.clean_log()
    adds2, _, _ = tbl._replay_actions(tbl.latest_version())
    assert {p: a["engineBloom"] for p, a in adds2.items()} == {
        p: a["engineBloom"] for p, a in adds.items()
    }
    assert tbl._prune(adds2, {"k": probe}) == kept


def test_bloom_canon_collapses_type_renderings(spark, tbl):
    """A probe whose Python type renders differently from the written
    values (5.0 vs 5, Decimal('5'), b'x' vs 'x', midnight datetime vs
    date) must NOT bloom-false-negative — that silently drops matching
    files from the scan instead of erring loud."""
    import datetime
    from decimal import Decimal

    df = spark.createDataFrame([(i, float(i)) for i in range(50)], "k long, v double")
    tbl.commit_append(df.repartition(2, "k"), bloom_for=["k", "v"])
    adds, _, _ = tbl._replay_actions(tbl.latest_version())
    hit_int = [p for p, a in adds.items()
               if tbl._bloom_maybe_contains(a["engineBloom"]["k"], 7)]
    # int-written column probed with float / Decimal: same files answer
    for probe in (7.0, Decimal("7"), Decimal("7.0")):
        assert [p for p, a in adds.items()
                if tbl._bloom_maybe_contains(a["engineBloom"]["k"], probe)] == hit_int
    # float-written column probed with int
    hit_f = [p for p, a in adds.items()
             if tbl._bloom_maybe_contains(a["engineBloom"]["v"], 7.0)]
    assert [p for p, a in adds.items()
            if tbl._bloom_maybe_contains(a["engineBloom"]["v"], 7)] == hit_f
    assert hit_f, "true value must stay a bloom hit"
    # the where= read path returns the right rows for a float probe of k
    out = sorted(r.k for r in tbl.read(where={"k": 7.0}).collect() if r.k == 7)
    assert out == [7]
    # pure-canon cases that need no table
    canon = tbl._bloom_canon
    assert canon(b"abc") == canon(bytearray(b"abc"))
    assert canon(datetime.datetime(2024, 3, 1)) == canon(datetime.date(2024, 3, 1))
    assert canon(True) != canon(1)  # bool is not int 1 in a typed column


def test_generated_columns_compute_validate_and_persist(spark, tbl):
    """Generated columns: declared on the first commit, computed when
    omitted, validated when provided, and their expressions survive
    later appends (no metadata-erasing schema re-emission)."""
    from satellite_data_ingestion_spark.sources.delta_log import (
        DeltaConstraintViolation,
    )

    df = spark.createDataFrame([(1,), (25,)], "x long")
    tbl.commit_append(df, generated={"x2": "x * 2"})
    assert tbl._generated_at(tbl.latest_version()) == {"x2": "x * 2"}
    assert sorted((r.x, r.x2) for r in tbl.read().collect()) == [(1, 2), (25, 50)]
    # omitted -> computed
    tbl.commit_append(spark.createDataFrame([(3,)], "x long"))
    assert (3, 6) in {(r.x, r.x2) for r in tbl.read().collect()}
    # provided-and-correct -> accepted; expressions still stored
    tbl.commit_append(spark.createDataFrame([(4, 8)], "x long, x2 long"))
    assert tbl._generated_at(tbl.latest_version()) == {"x2": "x * 2"}
    # provided-and-wrong -> refused
    with pytest.raises(DeltaConstraintViolation, match="generated column"):
        tbl.commit_append(spark.createDataFrame([(5, 11)], "x long, x2 long"))
    # declaring on a non-empty table is refused
    with pytest.raises(ValueError, match="FIRST commit"):
        tbl.commit_append(df, generated={"x3": "x * 3"})


def test_row_tracking_ids_survive_rewrite_and_never_reuse(spark, tbl):
    """The row-tracking contract: (a) enablement backfills ids for
    pre-existing rows; (b) OPTIMIZE preserves every (row, id, commit
    version) triple exactly via materialization; (c) later appends
    continue from the high-water mark — no id is ever reissued, even
    after a rewrite assigned fresh spans to compacted files; (d) the
    protocol carries the rowTracking + domainMetadata writer features;
    (e) the domain-held high-water mark SURVIVES checkpoint + clean_log
    (round 14: domainMetadata rides the checkpoint schema), so ids still
    never reissue after the JSON commits are gone."""
    import pytest as _pytest

    tbl.commit_append(_df(spark, [10, 20, 30]).coalesce(1).sortWithinPartitions("x"))
    tbl.enable_row_tracking()
    assert tbl.enable_row_tracking() == tbl.latest_version()  # idempotent
    tbl.append_tracked(_df(spark, [40, 50]).coalesce(1).sortWithinPartitions("x"))

    before = {
        (r.x, r.row_id, r.row_commit_version)
        for r in tbl.read_with_row_ids().collect()
    }
    assert {x for x, _, _ in before} == {10, 20, 30, 40, 50}
    assert sorted(i for _, i, _ in before) == [0, 1, 2, 3, 4]
    assert {cv for x, _, cv in before if x in (10, 20, 30)} == {1}
    assert {cv for x, _, cv in before if x in (40, 50)} == {2}

    tbl.compact_tracked()
    after = {
        (r.x, r.row_id, r.row_commit_version)
        for r in tbl.read_with_row_ids().collect()
    }
    assert after == before  # (b): the rewrite changed nothing logical
    # plain read hides the materialized physical columns
    assert set(tbl.read().columns) == {"x"}

    # (c): fresh ids continue above the compaction's fresh spans
    tbl.append_tracked(_df(spark, [60]).coalesce(1))
    final = tbl.read_with_row_ids().collect()
    ids = [r.row_id for r in final]
    assert len(ids) == len(set(ids))
    new_id = next(r.row_id for r in final if r.x == 60)
    assert new_id >= 10  # backfill 0-4, compaction spans 5-9, then fresh

    # (d): protocol surface
    state = tbl._state(tbl.latest_version())
    proto = state["protocol"]
    assert proto["minWriterVersion"] == 7
    assert {"rowTracking", "domainMetadata"} <= set(proto["writerFeatures"])
    cfg = state["metaData"]["configuration"]
    assert cfg["delta.enableRowTracking"] == "true"

    # (e): the high-water mark survives checkpoint + cleanup — ids
    # continue above it instead of reissuing
    hwm_before = tbl._row_id_hwm(tbl.latest_version())
    tbl.checkpoint()
    tbl.clean_log()
    assert tbl._row_id_hwm(tbl.latest_version()) == hwm_before
    before_ids = {(r.x, r.row_id) for r in tbl.read_with_row_ids().collect()}
    tbl.append_tracked(_df(spark, [70]).coalesce(1))
    rows = tbl.read_with_row_ids().collect()
    assert {(r.x, r.row_id) for r in rows if r.x != 70} == before_ids
    assert next(r.row_id for r in rows if r.x == 70) == hwm_before + 1
    assert len({r.row_id for r in rows}) == len(rows)  # still no reuse
    _ = _pytest  # retained import


def test_liquid_clustering_prunes_from_log_stats(spark):
    """After the Hilbert-key OPTIMIZE, the box predicate must skip a
    majority of files using ADD-ACTION stats alone, while the
    pre-OPTIMIZE arrival-order table cannot skip (every append batch
    spans the full key space); and the rewrite must not change table
    contents."""
    from satellite_data_ingestion_spark.operators.layout import (
        _X_HI,
        _X_LO,
        _Y_HI,
        _Y_LO,
    )
    from satellite_data_ingestion_spark.sources.delta_log import (
        _build_liquid,
    )

    sf = "/root/testdata/sf0.001"
    t = _build_liquid(spark, sf, target_file_bytes=16 * 1024)
    head = t.latest_version()
    box = {"xb": (_X_LO, _X_HI), "yb": (_Y_LO, _Y_HI)}

    live_after, _, _ = t._replay_actions(head)
    pruned_after = t._prune(live_after, box)
    assert len(live_after) >= 4, "compaction produced too few files to test"
    assert len(pruned_after) / len(live_after) <= 0.5, (
        f"liquid layout pruned too little: {len(pruned_after)}/{len(live_after)}"
    )

    # pre-OPTIMIZE (version 2 = after the three appends): arrival-order
    # files all intersect the box
    live_before, _, _ = t._replay_actions(2)
    pruned_before = t._prune(live_before, box)
    assert len(pruned_before) == len(live_before)

    # contents invariant across the rewrite
    a = t.read(version=2).groupBy("l_returnflag").count().collect()
    b = t.read(version=head).groupBy("l_returnflag").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_row_tracking_time_travel_and_liquid_recluster(spark):
    """Two claimed-but-unpinned behaviors: (a) read_with_row_ids at an
    OLD version reproduces that version's id assignment (time travel
    composes with row tracking); (b) the liquid-clustering maintenance
    loop — new arrival-order appends degrade log-stat pruning, a second
    OPTIMIZE on the Hilbert key restores it."""
    import pyspark.sql.functions as F

    from satellite_data_ingestion_spark.operators.layout import (
        _X_HI,
        _X_LO,
        _Y_HI,
        _Y_LO,
        hilbert_key,
    )
    from satellite_data_ingestion_spark.sources.delta_log import (
        _build_liquid,
    )

    # (a) row-id time travel
    tbl = DeltaLogTable(spark, str(__import__("tempfile").mkdtemp(prefix="rt_tt_")))
    tbl.commit_append(_df(spark, [1, 2]).coalesce(1).sortWithinPartitions("x"))
    v_enable = tbl.enable_row_tracking()
    tbl.append_tracked(_df(spark, [3]).coalesce(1))
    at_enable = {
        (r.x, r.row_id) for r in tbl.read_with_row_ids(version=v_enable).collect()
    }
    assert at_enable == {(1, 0), (2, 1)}
    head_ids = {(r.x, r.row_id) for r in tbl.read_with_row_ids().collect()}
    assert head_ids == {(1, 0), (2, 1), (3, 2)}

    # (b) liquid maintenance loop
    sf = "/root/testdata/sf0.001"
    t = _build_liquid(spark, sf, target_file_bytes=16 * 1024)
    box = {"xb": (_X_LO, _X_HI), "yb": (_Y_LO, _Y_HI)}

    def prune_frac(version):
        live, _, _ = t._replay_actions(version)
        return len(t._prune(live, box)) / len(live)

    clustered_frac = prune_frac(t.latest_version())
    assert clustered_frac <= 0.5

    # three more arrival-order appends: spatially unclustered files land
    extra = t.read().filter(F.col("l_orderkey") % 5 == 0)
    for _ in range(3):
        t.commit_append(extra.repartition(2))
    degraded_frac = prune_frac(t.latest_version())
    assert degraded_frac > clustered_frac

    # re-OPTIMIZE on the same key: pruning restored, contents invariant
    before = t.read().groupBy("l_returnflag").count().collect()
    t.compact(target_file_bytes=16 * 1024, zorder_by=["hval"])
    after = t.read().groupBy("l_returnflag").count().collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))
    assert prune_frac(t.latest_version()) <= 0.5


def test_two_writer_appends_commute_and_rebase(spark, tbl, monkeypatch):
    """OCC classification, commuting case (VERDICT r12 task 5): a plain
    append racing another writer's plain append rebases onto the next
    version and BOTH row sets survive — data-only winners commute."""
    tbl.commit_append(_df(spark, [1]))
    racer = DeltaLogTable(spark, tbl.root)
    orig = DeltaLogTable._stage_files
    raced = {"done": False}

    def stage_with_race(self, df, partition_by=None, bloom_for=None):
        adds = orig(self, df, partition_by, bloom_for=bloom_for)
        if self is tbl and not raced["done"]:
            raced["done"] = True
            racer.commit_append(_df(spark, [99]))  # wins the race
        return adds

    monkeypatch.setattr(DeltaLogTable, "_stage_files", stage_with_race)
    v = tbl.commit_append(_df(spark, [2]))
    assert v == 2  # v0 = seed, v1 = racer (won), v2 = ours (rebased)
    assert sorted(r.x for r in tbl.read().collect()) == [1, 2, 99]


def test_two_writer_append_vs_metadata_change_conflicts(spark, tbl, monkeypatch):
    """OCC classification, conflicting case (VERDICT r12 task 5): an
    append whose constraint checks / schema were validated at stage time
    must RAISE when a concurrent winner changed the table metaData
    (schema evolution) — never silently replay onto the new metadata."""
    from satellite_data_ingestion_spark.sources.delta_log import (
        DeltaConcurrentModification,
    )

    tbl.commit_append(_df(spark, [1]))
    racer = DeltaLogTable(spark, tbl.root)
    orig = DeltaLogTable._stage_files
    raced = {"done": False}

    def stage_with_race(self, df, partition_by=None, bloom_for=None):
        adds = orig(self, df, partition_by, bloom_for=bloom_for)
        if self is tbl and not raced["done"]:
            raced["done"] = True
            # schema evolution re-emits metaData in the winner's commit
            racer.commit_append(
                spark.createDataFrame([(5, "v")], "x long, extra string")
            )
        return adds

    monkeypatch.setattr(DeltaLogTable, "_stage_files", stage_with_race)
    with pytest.raises(DeltaConcurrentModification, match="metaData"):
        tbl.commit_append(_df(spark, [2]))


def test_two_writer_same_app_txn_race_is_idempotent(spark, tbl, monkeypatch):
    """Same-app streaming race: two instances committing the SAME txn
    epoch — the loser must re-check the watermark on rebase and SKIP,
    leaving exactly one txn commit for the epoch (exactly-once)."""
    racer = DeltaLogTable(spark, tbl.root)
    tbl.commit_append(_df(spark, [0]))
    orig = DeltaLogTable._stage_files
    raced = {"done": False}

    def stage_with_race(self, df, partition_by=None, bloom_for=None):
        adds = orig(self, df, partition_by, bloom_for=bloom_for)
        if self is tbl and not raced["done"]:
            raced["done"] = True
            racer.commit_append(_df(spark, [99]), txn=("app", 5))
        return adds

    monkeypatch.setattr(DeltaLogTable, "_stage_files", stage_with_race)
    tbl.commit_append(_df(spark, [2]), txn=("app", 5))
    # idempotence wins: the loser's epoch-5 rows must NOT be in the table
    assert sorted(r.x for r in tbl.read().collect()) == [0, 99]
    assert tbl.last_txn_version("app") == 5


def test_generate_manifest_partitioned_and_dv_guard(spark, tbl):
    """Manifest export: a partitioned table gets one manifest per
    partition directory, each listing only LIVE absolute paths (the
    compacted-away fragment must not appear); a table with a deletion
    vector refuses loudly (plain paths cannot represent masked rows)."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b")], "x long, p string"
    )
    tbl.commit_append(df, partition_by=["p"])
    manifests = tbl.generate_manifest()
    assert len(manifests) == 2
    assert all(os.path.basename(m) == "manifest" for m in manifests)
    listed = []
    for m in manifests:
        with open(m) as fh:
            listed.extend(line.strip() for line in fh if line.strip())
    live, _ = tbl._replay(tbl.latest_version())
    assert sorted(listed) == sorted(
        os.path.abspath(os.path.join(tbl.root, p)) for p in live
    )
    assert all(os.path.exists(p) for p in listed)
    # DV guard: fake a deletion vector on one live add action
    from satellite_data_ingestion_spark.sources.delta_log import (
        DeltaLogTable,
    )

    t2 = DeltaLogTable(spark, tbl.root + "_dv")
    t2.commit_append(spark.createDataFrame([(1,)], "x long"))
    head = t2.latest_version()
    live2, _, _ = t2._replay_actions(head)
    path = next(iter(live2))
    t2._publish(
        [
            {"remove": {"path": path, "deletionTimestamp": 0, "dataChange": True}},
            {
                "add": {
                    "path": path,
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 0,
                    "dataChange": True,
                    "deletionVector": {"storageType": "u", "pathOrInlineDv": "x",
                                       "offset": 1, "sizeInBytes": 1,
                                       "cardinality": 1},
                }
            },
        ]
    )
    with pytest.raises(NotImplementedError, match="deletion vector"):
        t2.generate_manifest()


def test_v2_checkpoint_manifest_sidecars_and_o1_reopen(spark, tbl):
    """VERDICT r13 task 4: checkpoint_v2() writes file actions into
    _sidecars/ parquet files referenced by sidecar actions in a
    <v>.checkpoint.<uniqueId>.parquet manifest (exactly one
    checkpointMetadata action, no add/remove in the manifest), repoints
    _last_checkpoint, and after clean_log() the table reads identically
    from the manifest + sidecars alone."""
    import pyarrow.parquet as pq

    for i in range(5):
        tbl.commit_append(_df(spark, [i]))
    before = sorted(r.x for r in tbl.read().collect())
    tbl.enable_v2_checkpoints()
    head = tbl.latest_version()
    v = tbl.checkpoint_v2()
    assert v == head
    manifests = glob.glob(
        os.path.join(tbl.log_dir, f"{head:020d}.checkpoint.*.parquet")
    )
    assert len(manifests) == 1
    rows = pq.read_table(manifests[0]).to_pylist()
    cms = [r["checkpointMetadata"] for r in rows if r.get("checkpointMetadata")]
    assert len(cms) == 1 and cms[0]["version"] == head
    assert "add" not in pq.read_table(manifests[0]).schema.names or all(
        r.get("add") is None and r.get("remove") is None for r in rows
    )
    sidecars = [r["sidecar"] for r in rows if r.get("sidecar")]
    assert sidecars, "manifest must reference at least one sidecar"
    for sc in sidecars:
        sp = os.path.join(tbl.log_dir, "_sidecars", sc["path"])
        assert os.path.isfile(sp)
        assert sc["sizeInBytes"] == os.stat(sp).st_size
    ptr = json.load(open(os.path.join(tbl.log_dir, "_last_checkpoint")))
    assert ptr["version"] == head and ptr["sidecarFiles"] == len(sidecars)
    cleaned = tbl.clean_log()
    assert len(cleaned) == head + 1
    assert tbl.latest_version() == head
    assert sorted(r.x for r in tbl.read().collect()) == before
    assert tbl.commit_append(_df(spark, [99])) == head + 1
    assert sorted(r.x for r in tbl.read().collect()) == before + [99]


def test_v2_checkpoint_multi_sidecar_tombstones_and_txn_survival(spark, tbl):
    """Sidecar chunking (max_sidecar_actions=1 forces one action per
    sidecar), overwrite tombstones, and per-app txn watermarks must all
    survive the v2 checkpoint + clean_log round-trip — the same
    contracts the classic checkpoint tests pin."""
    tbl.commit_append(_df(spark, [1, 2]), txn=("app", 7))
    tbl.commit_overwrite(_df(spark, [9]))
    tbl.enable_v2_checkpoints()
    before = sorted(r.x for r in tbl.read().collect())
    assert before == [9]
    tbl.checkpoint_v2(max_sidecar_actions=1)
    manifests = glob.glob(os.path.join(tbl.log_dir, "*.checkpoint.*.parquet"))
    import pyarrow.parquet as pq

    rows = pq.read_table(manifests[0]).to_pylist()
    sidecars = [r["sidecar"] for r in rows if r.get("sidecar")]
    assert len(sidecars) >= 2, "tombstones + live adds must split across sidecars"
    tbl.clean_log()
    assert sorted(r.x for r in tbl.read().collect()) == before
    # tombstone survived: overwritten files are not resurrected
    assert tbl.last_txn_version("app") == 7
    head = tbl.latest_version()
    assert tbl.commit_append(_df(spark, [1]), txn=("app", 7)) == head  # swallowed


def test_v2_checkpoint_requires_feature(spark, tbl):
    """Per the spec's writer requirement, writing a v2 checkpoint on a
    table without the v2Checkpoint feature must refuse loudly."""
    tbl.commit_append(_df(spark, [1]))
    with pytest.raises(ValueError, match="v2Checkpoint"):
        tbl.checkpoint_v2()
    # classic checkpoints remain available on the same table
    assert tbl.checkpoint() == tbl.latest_version()


def test_v2_checkpoint_incremental_sidecar_reuse(spark, tbl):
    """Content-addressed sidecars make incremental v2 checkpoints cheap:
    a second checkpoint after one small commit must REUSE (not rewrite)
    every bucket shard the commit did not touch — the shared shard
    files appear in both manifests with identical names — and the table
    still reads correctly from the second checkpoint after clean_log."""
    import pyarrow.parquet as pq

    for i in range(8):
        tbl.commit_append(_df(spark, [i]))
    tbl.enable_v2_checkpoints()
    tbl.checkpoint_v2(max_sidecar_actions=2)  # force multiple buckets

    def manifest_sidecars(version):
        (mf,) = glob.glob(
            os.path.join(tbl.log_dir, f"{version:020d}.checkpoint.*.parquet")
        )
        return {
            r["sidecar"]["path"]
            for r in pq.read_table(mf).to_pylist()
            if r.get("sidecar")
        }

    first = manifest_sidecars(tbl.latest_version())
    # Buckets are crc32(path) % n_buckets over RANDOM part names, and
    # content-addressing collapses identical (all-empty) buckets to one
    # file — so a FIXED distinct-name bound flaked (>= 4 failed when two
    # buckets landed empty under load; >= 2 was near-trivial).  Instead
    # compute the EXACT expected count by replaying the bucketing over
    # the actual staged part names: distinct non-empty buckets are
    # pairwise content-distinct (different paths), and all empty buckets
    # collapse to exactly one shared shard.
    import zlib as _zlib

    state = tbl._state(tbl.latest_version())
    file_rows = [
        r for r in tbl._cp_rows(state) if "add" in r or "remove" in r
    ]
    paths = [(r.get("add") or r.get("remove"))["path"] for r in file_rows]
    n_buckets = 1
    while n_buckets * 2 < len(paths):  # max_sidecar_actions=2 above
        n_buckets *= 2
    occupied = {_zlib.crc32(p.encode()) % n_buckets for p in paths}
    expected = len(occupied) + (1 if len(occupied) < n_buckets else 0)
    assert n_buckets >= 4, "fixture must force multi-bucket sharding"
    assert len(first) == expected
    before_mtimes = {
        p: os.stat(os.path.join(tbl.log_dir, "_sidecars", p)).st_mtime_ns
        for p in first
    }
    tbl.commit_append(_df(spark, [99]))
    tbl.checkpoint_v2(max_sidecar_actions=2)
    second = manifest_sidecars(tbl.latest_version())
    shared = first & second
    assert shared, "no sidecar shard was reused across checkpoints"
    # reused shards were NOT rewritten (same inode mtime)
    for p in shared:
        assert (
            os.stat(os.path.join(tbl.log_dir, "_sidecars", p)).st_mtime_ns
            == before_mtimes[p]
        )
    before = sorted(r.x for r in tbl.read().collect())
    tbl.clean_log()
    assert sorted(r.x for r in tbl.read().collect()) == before


def test_version_checksum_written_validated_and_detects_corruption(spark, tbl):
    """Every committed version gets a <v>.crc summary (live-file count /
    byte total / tombstones / txns); validate_checksum() recomputes from
    replay and passes; a hand-edited crc raises loudly; clean_log drops
    below-checkpoint crc files but keeps the head's, which still
    validates after cleanup."""
    tbl.commit_append(_df(spark, [1, 2]), txn=("app", 1))
    tbl.commit_overwrite(_df(spark, [9]))
    head = tbl.latest_version()
    for v in range(head + 1):
        assert os.path.exists(tbl._crc_path(v)), f"missing crc for {v}"
    summary = tbl.validate_checksum()
    assert summary["numFiles"] >= 1
    assert summary["numTombstones"] >= 1
    assert summary["numTransactions"] == 1
    assert summary["tableSizeBytes"] > 0
    # corruption detection
    with open(tbl._crc_path(head)) as fh:
        stored = json.load(fh)
    stored["numFiles"] += 1
    with open(tbl._crc_path(head), "w") as fh:
        json.dump(stored, fh)
    with pytest.raises(ValueError, match="checksum mismatch"):
        tbl.validate_checksum(head)
    # restore, checkpoint, clean: old crc files go, head's stays valid
    with open(tbl._crc_path(head), "w") as fh:
        json.dump(tbl._checksum_of_state(head), fh)
    tbl.checkpoint()
    tbl.clean_log()
    for v in range(head):
        assert not os.path.exists(tbl._crc_path(v))
    assert os.path.exists(tbl._crc_path(head))
    assert tbl.validate_checksum(head)["numFiles"] == summary["numFiles"]
