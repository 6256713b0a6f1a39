"""Conformance of the hand-rolled Delta log to the PUBLIC delta.io
PROTOCOL.md, validated against the SPEC TEXT — not against the module's
own reader.

delta-spark / delta-rs are not installable in this container, so "any
standard Delta reader could open the table" (delta_log.py's claim) cannot
be demonstrated by a second implementation.  This suite is the
substitute: every check below reads the raw bytes the sink wrote (JSON
commits, checkpoint parquet, ``_last_checkpoint``) and validates field
names, types, and encodings against a checklist transcribed from the
public spec.  If the on-disk format drifts from PROTOCOL.md, these fail
even if ``DeltaLogTable``'s own reader still round-trips.

Checklist sources (delta.io PROTOCOL.md, public):
- "Delta Log Entries": ``_delta_log/<version as %020d>.json``,
  newline-delimited JSON, each line a single action object.
- "Protocol Evolution": ``protocol`` carries integer
  minReaderVersion / minWriterVersion.
- "Change Metadata": ``metaData`` carries id, format{provider,options},
  schemaString, partitionColumns, configuration.
- "Add File and Remove File": required fields and types; ``stats`` is a
  JSON *string* holding numRecords/minValues/maxValues;
  ``partitionValues`` is a string→string map.
- "Transaction Identifiers": ``txn`` carries appId (string) +
  version (long).
- "Checkpoints": parquet file with one column per action type, one
  non-null action per row; ``_last_checkpoint`` JSON carries
  version + size.
"""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

from satellite_data_ingestion_spark.sources.delta_log import DeltaLogTable

_ACTION_KEYS = {
    "protocol", "metaData", "add", "remove", "txn", "commitInfo", "cdc",
}


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, day string")


@pytest.fixture(scope="module")
def conformance_table(spark, tmp_path_factory):
    """One table exercising every action type this sink emits: a
    partitioned append, a txn-stamped append, an overwrite (removes),
    a checkpoint, and a schema-evolving append."""
    tbl = DeltaLogTable(spark, str(tmp_path_factory.mktemp("delta_conf")))
    tbl.commit_append(
        _df(spark, [(1, "2026-01-01"), (2, "2026-01-02")]), partition_by=["day"]
    )
    tbl.commit_append(
        _df(spark, [(3, "2026-01-02")]), partition_by=["day"],
        txn=("conformance-app", 7),
    )
    tbl.commit_overwrite(_df(spark, [(9, "2026-01-03")]))
    tbl.checkpoint()
    tbl.commit_append(
        spark.createDataFrame([(10, "2026-01-04", "x")], "k long, day string, note string")
    )
    return tbl


def _raw_actions(tbl):
    """Every (version, action dict) parsed straight from the JSON bytes."""
    out = []
    for path in sorted(glob.glob(os.path.join(tbl.log_dir, "*.json"))):
        base = os.path.basename(path)
        if base == "_last_checkpoint":
            continue
        version = int(base.split(".")[0])
        with open(path, "rb") as fh:
            payload = fh.read()
        # spec: newline-delimited JSON, UTF-8
        for line in payload.decode("utf-8").splitlines():
            if line.strip():
                out.append((version, json.loads(line)))
    return out


def test_commit_file_naming_is_20_digit_zero_padded(conformance_table):
    names = [
        os.path.basename(p)
        for p in glob.glob(os.path.join(conformance_table.log_dir, "*.json"))
    ]
    assert names, "no commit files written"
    for name in names:
        assert re.fullmatch(r"\d{20}\.json", name), name


def test_every_line_is_a_single_action_object(conformance_table):
    for version, action in _raw_actions(conformance_table):
        assert isinstance(action, dict)
        keys = set(action) & _ACTION_KEYS
        assert len(keys) == 1, f"v{version}: not exactly one action: {action}"


def test_protocol_action_fields_and_types(conformance_table):
    protos = [a["protocol"] for _, a in _raw_actions(conformance_table) if "protocol" in a]
    assert protos, "version 0 must declare protocol"
    for p in protos:
        assert set(p) >= {"minReaderVersion", "minWriterVersion"}
        assert isinstance(p["minReaderVersion"], int) and not isinstance(p["minReaderVersion"], bool)
        assert isinstance(p["minWriterVersion"], int) and not isinstance(p["minWriterVersion"], bool)


def test_metadata_action_fields_types_and_schema_string(conformance_table):
    mds = [a["metaData"] for _, a in _raw_actions(conformance_table) if "metaData" in a]
    assert mds, "metaData action missing"
    for md in mds:
        assert set(md) >= {
            "id", "format", "schemaString", "partitionColumns", "configuration",
        }
        assert isinstance(md["id"], str) and md["id"]
        assert md["format"]["provider"] == "parquet"
        assert isinstance(md["format"].get("options", {}), dict)
        # schemaString is a JSON-SERIALIZED string (not an inline object)
        assert isinstance(md["schemaString"], str)
        schema = json.loads(md["schemaString"])
        assert schema["type"] == "struct" and isinstance(schema["fields"], list)
        for f in schema["fields"]:
            assert set(f) >= {"name", "type", "nullable", "metadata"}
        assert isinstance(md["partitionColumns"], list)
        assert all(isinstance(c, str) for c in md["partitionColumns"])
        assert isinstance(md["configuration"], dict)


def test_add_action_fields_types_and_paths(conformance_table):
    adds = [a["add"] for _, a in _raw_actions(conformance_table) if "add" in a]
    assert adds
    for add in adds:
        assert set(add) >= {
            "path", "partitionValues", "size", "modificationTime", "dataChange",
        }
        assert isinstance(add["path"], str)
        assert not add["path"].startswith("/"), "spec: path is RELATIVE to table root"
        assert not add["path"].startswith("file:"), "spec: no scheme on relative paths"
        assert isinstance(add["size"], int) and add["size"] > 0
        assert isinstance(add["modificationTime"], int)
        assert isinstance(add["dataChange"], bool)
        # partitionValues: map[string, string] — values STRING-ENCODED
        assert isinstance(add["partitionValues"], dict)
        for k, v in add["partitionValues"].items():
            assert isinstance(k, str) and isinstance(v, str)
        # stats, when present, is a JSON STRING with the spec's keys
        if "stats" in add:
            assert isinstance(add["stats"], str)
            stats = json.loads(add["stats"])
            assert set(stats) >= {"numRecords", "minValues", "maxValues"}
            assert isinstance(stats["numRecords"], int)
            assert set(stats["minValues"]) == set(stats["maxValues"])


def test_partitioned_add_paths_are_hive_encoded_and_match_partition_values(
    conformance_table,
):
    adds = [
        a["add"]
        for _, a in _raw_actions(conformance_table)
        if "add" in a and a["add"]["partitionValues"]
    ]
    assert adds, "the partitioned append must produce partitionValues"
    for add in adds:
        for col, val in add["partitionValues"].items():
            assert f"{col}={val}" in add["path"].split("/"), (
                "Hive-style dir segment must encode the partition value"
            )


def test_remove_action_fields_and_types(conformance_table):
    removes = [a["remove"] for _, a in _raw_actions(conformance_table) if "remove" in a]
    assert removes, "the overwrite must emit remove tombstones"
    for rm in removes:
        assert isinstance(rm["path"], str) and not rm["path"].startswith("/")
        assert isinstance(rm["dataChange"], bool)


def test_txn_action_fields_and_types(conformance_table):
    txns = [a["txn"] for _, a in _raw_actions(conformance_table) if "txn" in a]
    assert txns, "the txn-stamped append must emit a txn action"
    for t in txns:
        assert isinstance(t["appId"], str) and t["appId"]
        assert isinstance(t["version"], int) and not isinstance(t["version"], bool)


def test_checkpoint_parquet_schema_and_one_action_per_row(conformance_table):
    import pyarrow.parquet as pq

    cps = glob.glob(os.path.join(conformance_table.log_dir, "*.checkpoint.parquet"))
    assert cps, "checkpoint() must write <v>.checkpoint.parquet"
    t = pq.read_table(cps[0])
    # spec: one column per action type, struct-typed
    assert {"protocol", "metaData", "add", "remove", "txn"} <= set(t.column_names)
    rows = t.to_pylist()
    for row in rows:
        non_null = [k for k, v in row.items() if v is not None and k in _ACTION_KEYS]
        assert len(non_null) == 1, f"checkpoint row must hold exactly one action: {row}"
    # required state present: protocol, metaData, at least one add
    kinds = {k for row in rows for k, v in row.items() if v is not None}
    assert {"protocol", "metaData", "add"} <= kinds
    # txn watermarks survive the checkpoint (spec: Transaction Identifiers)
    txn_rows = [row["txn"] for row in rows if row["txn"] is not None]
    assert any(t["appId"] == "conformance-app" and t["version"] == 7 for t in txn_rows)


def test_last_checkpoint_pointer_shape(conformance_table):
    path = os.path.join(conformance_table.log_dir, "_last_checkpoint")
    assert os.path.isfile(path)
    with open(path) as fh:
        lc = json.load(fh)
    assert set(lc) >= {"version", "size"}
    assert isinstance(lc["version"], int) and isinstance(lc["size"], int)
    # the pointer names an existing checkpoint of exactly `size` rows
    import pyarrow.parquet as pq

    cp = conformance_table._checkpoint_path(lc["version"])
    assert os.path.isfile(cp)
    assert pq.read_table(cp).num_rows == lc["size"]


def test_table_id_stable_across_all_metadata_actions(conformance_table):
    """Spec: the table id identifies the table for its LIFETIME — JSON
    commits (incl. the schema-evolving re-emission) and the checkpoint's
    metaData row must all carry the same id."""
    import pyarrow.parquet as pq

    ids = {a["metaData"]["id"] for _, a in _raw_actions(conformance_table) if "metaData" in a}
    cps = glob.glob(os.path.join(conformance_table.log_dir, "*.checkpoint.parquet"))
    for row in pq.read_table(cps[0]).to_pylist():
        if row["metaData"] is not None:
            ids.add(row["metaData"]["id"])
    assert len(ids) == 1, f"table id not stable: {ids}"


def test_data_files_exist_and_are_parquet(conformance_table):
    import pyarrow.parquet as pq

    for _, a in _raw_actions(conformance_table):
        if "add" in a:
            p = os.path.join(conformance_table.root, a["add"]["path"])
            assert os.path.isfile(p)
            assert pq.ParquetFile(p).metadata.num_rows > 0


def test_commit_info_fields_and_types(conformance_table):
    infos = [
        a["commitInfo"]
        for _, a in _raw_actions(conformance_table)
        if "commitInfo" in a
    ]
    assert infos, "commits must record commitInfo"
    for ci in infos:
        assert isinstance(ci["timestamp"], int) and ci["timestamp"] > 0
        assert isinstance(ci["operation"], str) and ci["operation"]


def test_remove_deletion_timestamp_is_millis(conformance_table):
    removes = [
        a["remove"] for _, a in _raw_actions(conformance_table) if "remove" in a
    ]
    assert removes
    for rm in removes:
        ts = rm.get("deletionTimestamp")
        assert isinstance(ts, int) and ts > 1_000_000_000_000, (
            "spec: deletionTimestamp is epoch milliseconds"
        )


def test_cdc_action_fields_and_types(spark, tmp_path_factory):
    """Add CDC File action per PROTOCOL.md: path (relative, under
    _change_data/), partitionValues (object), size (bytes), dataChange
    false; the referenced file is real parquet carrying _change_type."""
    t = DeltaLogTable(
        spark, str(tmp_path_factory.mktemp("delta_cdc_conf")),
        change_data_feed=True,
    )
    t.commit_append(_df(spark, [(1, "2026-01-01"), (2, "2026-01-02")]))
    t.commit_merge(
        spark.createDataFrame([(2, "2026-02-02")], "k long, day string"),
        keys=["k"],
    )
    import pyarrow.parquet as pq

    cdcs = [a["cdc"] for _, a in _raw_actions(t) if "cdc" in a]
    assert cdcs, "CDF merge must record cdc actions"
    for c in cdcs:
        assert c["path"].startswith("_change_data/")
        assert not os.path.isabs(c["path"])
        assert isinstance(c["partitionValues"], dict)
        assert isinstance(c["size"], int) and c["size"] > 0
        assert c["dataChange"] is False
        f = pq.ParquetFile(os.path.join(t.root, c["path"]))
        assert "_change_type" in f.schema_arrow.names
        assert f.metadata.num_rows > 0
