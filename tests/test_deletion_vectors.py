"""Deletion vectors: codec fixtures + merge-on-read DELETE semantics.

Codec layer is pinned against the PUBLIC format specs (ZeroMQ 32/Z85
test vector; RoaringFormatSpec container layouts), so conformance is
anchored to spec text, not to this repo's own reader — the same
discipline test_delta_conformance.py applies to the log format.
"""

import json
import os
import struct
import tempfile

import pytest
from pyspark.sql import functions as F

from satellite_data_ingestion_spark.sources.delta_log import DeltaLogTable
from satellite_data_ingestion_spark.sources.dv_bitmap import (
    DV_MAGIC,
    dv_descriptor,
    dv_positions,
    dv_serialize,
    dv_union,
    roaring32_deserialize,
    roaring32_serialize,
    z85_decode,
    z85_encode,
)

# ---------------------------------------------------------------- codec


def test_z85_spec_vector():
    """The ZeroMQ 32/Z85 spec's reference test case."""
    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert z85_encode(raw) == "HelloWorld"
    assert z85_decode("HelloWorld") == raw


def test_z85_rejects_bad_input():
    with pytest.raises(ValueError):
        z85_encode(b"abc")  # not 4-aligned
    with pytest.raises(ValueError):
        z85_decode("abcd")  # not 5-aligned
    with pytest.raises(ValueError):
        z85_decode("abc~d")  # ~ not in the alphabet


def test_roaring32_empty_layout():
    """Byte-level fixture: empty bitmap = cookie 12346 + size 0 only."""
    assert roaring32_serialize([]) == struct.pack("<II", 12346, 0)


def test_roaring32_array_container_layout():
    """Byte-level fixture for a two-container array serialization,
    hand-assembled from the RoaringFormatSpec: cookie, container count,
    (key, card-1) pairs, offset header, sorted uint16 payloads."""
    vals = [1, 5, (3 << 16) | 7]
    ser = roaring32_serialize(vals)
    expected = (
        struct.pack("<II", 12346, 2)  # cookie, 2 containers
        + struct.pack("<HH", 0, 1)  # key 0, cardinality-1 = 1
        + struct.pack("<HH", 3, 0)  # key 3, cardinality-1 = 0
        + struct.pack("<II", 24, 28)  # payload offsets from stream start
        + struct.pack("<HH", 1, 5)  # container 0: [1, 5]
        + struct.pack("<H", 7)  # container 3: [7]
    )
    assert ser == expected
    assert roaring32_deserialize(ser) == (vals, len(ser))


def test_roaring32_bitmap_container_roundtrip():
    """>4096 values in one 2^16 block switches to a bitmap container."""
    vals = list(range(0, 10000, 2)) + [70000]
    ser = roaring32_serialize(vals)
    # container 0 payload must be the fixed 8 KiB bitset
    assert len(ser) == 8 + 2 * 4 + 2 * 4 + 8192 + 2
    out, used = roaring32_deserialize(ser)
    assert used == len(ser) and out == vals


def test_roaring32_rejects_run_cookie():
    with pytest.raises(ValueError, match="run containers"):
        roaring32_deserialize(struct.pack("<I", 12347))


def test_dv_payload_magic_and_roundtrip():
    payload = dv_serialize([3, 1, 3])
    assert struct.unpack_from("<I", payload)[0] == DV_MAGIC
    desc = dv_descriptor([0, 9, (1 << 32) + 4])
    assert desc["storageType"] == "i"
    assert desc["cardinality"] == 3
    assert len(desc["pathOrInlineDv"]) % 5 == 0
    assert dv_positions(desc) == [0, 9, (1 << 32) + 4]


def test_dv_union_and_tamper_detection():
    a = dv_descriptor([1, 2, 3])
    b = dv_descriptor([3, 4])
    assert dv_positions(dv_union(a, b)) == [1, 2, 3, 4]
    assert dv_positions(dv_union(None, a)) == [1, 2, 3]
    bad = dict(a, cardinality=99)
    with pytest.raises(ValueError, match="cardinality"):
        dv_positions(bad)


# ----------------------------------------------------------- table layer


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _make_table(spark, tmpdir, cdf=False):
    t = DeltaLogTable(spark, tmpdir, change_data_feed=cdf)
    t.commit_append(_df(spark, [(i, f"a{i}") for i in range(10)]).coalesce(1))
    t.commit_append(
        _df(spark, [(i, f"b{i}") for i in range(10, 20)]).coalesce(1)
    )
    t.enable_deletion_vectors()
    return t


def test_dv_delete_no_rewrite_and_parity(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _make_table(spark, d)
        live0, _, _ = t._replay_actions(t.latest_version())
        v = t.delete_rows_dv("k", 3, 12)
        live1, _, _ = t._replay_actions(v)
        # merge-on-read: identical live paths, zero files rewritten
        assert set(live1) == set(live0)
        dvs = {p: a["deletionVector"] for p, a in live1.items()
               if a.get("deletionVector")}
        assert len(dvs) == 2  # both files intersect [3, 12]
        assert sum(dv["cardinality"] for dv in dvs.values()) == 10
        got = sorted(r["k"] for r in t.read().collect())
        assert got == [0, 1, 2] + list(range(13, 20))
        # physical files untouched: raw parquet still holds all 20 rows
        raw = spark.read.parquet(
            *[os.path.join(d, p) for p in live1]
        ).count()
        assert raw == 20


def test_dv_requires_enablement(spark):
    with tempfile.TemporaryDirectory() as d:
        t = DeltaLogTable(spark, d)
        t.commit_append(_df(spark, [(1, "x")]))
        with pytest.raises(ValueError, match="enableDeletionVectors"):
            t.delete_rows_dv("k", 0, 5)


def test_dv_protocol_feature_lists(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _make_table(spark, d)
        proto = t._state(t.latest_version())["protocol"]
        assert proto["minReaderVersion"] == 3
        assert proto["minWriterVersion"] == 7
        assert "deletionVectors" in proto["readerFeatures"]
        assert "deletionVectors" in proto["writerFeatures"]
        # legacy writer features implied by the pre-upgrade version
        assert "appendOnly" in proto["writerFeatures"]


def test_dv_second_delete_unions_bitmaps(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _make_table(spark, d)
        t.delete_rows_dv("k", 3, 5)
        v = t.delete_rows_dv("k", 5, 7)
        live, _, _ = t._replay_actions(v)
        dv = live[
            next(p for p, a in live.items() if a.get("deletionVector"))
        ]["deletionVector"]
        assert dv["cardinality"] == 5  # {3,4,5,6,7}, 5 counted once
        got = sorted(r["k"] for r in t.read().collect())
        assert got == [0, 1, 2] + list(range(8, 20))


def test_dv_whole_file_dead_is_pure_remove(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _make_table(spark, d)
        v = t.delete_rows_dv("k", 0, 9)  # kills file 1 entirely
        live, _, _ = t._replay_actions(v)
        assert len(live) == 1  # the dead file is removed, not DV'd
        assert not live[next(iter(live))].get("deletionVector")
        assert t.read().count() == 10


def test_dv_checkpoint_roundtrip_and_clean_log(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _make_table(spark, d)
        t.delete_rows_dv("k", 3, 12)
        before = sorted(r["k"] for r in t.read().collect())
        t.checkpoint()
        t.clean_log()
        t2 = DeltaLogTable(spark, d)
        after = sorted(r["k"] for r in t2.read().collect())
        assert after == before
        live, _, _ = t2._replay_actions(t2.latest_version())
        dv = next(
            a["deletionVector"]
            for a in live.values()
            if a.get("deletionVector")
        )
        assert dv_positions(dv)  # descriptor survived the parquet trip


def test_dv_guards_copy_on_write_commands(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _make_table(spark, d)
        t.delete_rows_dv("k", 3, 4)
        with pytest.raises(NotImplementedError, match="compact"):
            t.commit_delete("k", 5, 6)
        with pytest.raises(NotImplementedError, match="compact"):
            t.commit_merge(_df(spark, [(1, "z")]), ["k"])


def test_dv_compact_purges(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _make_table(spark, d)
        t.delete_rows_dv("k", 3, 12)
        v = t.compact(target_file_bytes=1 << 20)
        live, _, _ = t._replay_actions(v)
        assert all(not a.get("deletionVector") for a in live.values())
        # rewrite physically dropped the dead rows
        raw = spark.read.parquet(
            *[os.path.join(d, p) for p in live]
        ).count()
        assert raw == 10
        assert sorted(r["k"] for r in t.read().collect()) == [
            0, 1, 2] + list(range(13, 20))


def test_dv_cdf_emits_only_fresh_deletes(spark):
    with tempfile.TemporaryDirectory() as d:
        t = DeltaLogTable(spark, d, change_data_feed=True)
        t.commit_append(
            _df(spark, [(i, f"a{i}") for i in range(10)]).coalesce(1)
        )
        t.enable_deletion_vectors()
        v1 = t.delete_rows_dv("k", 2, 4)
        v2 = t.delete_rows_dv("k", 3, 6)  # 3, 4 already dead
        feed = t.table_changes(v1 - 1).filter(
            F.col("_change_type") == "delete"
        )
        rows = [(r["k"], r["_commit_version"]) for r in feed.collect()]
        assert sorted(rows) == [
            (2, v1), (3, v1), (4, v1), (5, v2), (6, v2)
        ]


def test_dv_time_travel_reads_pre_delete_state(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _make_table(spark, d)
        v_before = t.latest_version()
        t.delete_rows_dv("k", 0, 18)
        assert t.read(version=v_before).count() == 20
        assert t.read().count() == 1


def test_dv_stats_pruning_skips_disjoint_files(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _make_table(spark, d)
        v = t.delete_rows_dv("k", 0, 2)  # only file 1's range
        live, _, _ = t._replay_actions(v)
        with_dv = [p for p, a in live.items() if a.get("deletionVector")]
        assert len(with_dv) == 1  # file 2 ([10,20)) untouched by stats


def test_dv_purge_rewrites_and_drops_vectors(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _make_table(spark, d)  # two files: k in [0,10) and [10,20)
        t.delete_rows_dv("k", 2, 4)
        before = sorted(r["k"] for r in t.read().collect())
        v = t.purge_dvs()
        live, _, _ = t._replay_actions(v)
        assert not any(a.get("deletionVector") for a in live.values())
        # content invariant, and the purged rows are physically gone:
        assert sorted(r["k"] for r in t.read().collect()) == before
        paths = [p for p in live]
        raw = spark.read.parquet(*[os.path.join(d, p) for p in paths]).count()
        assert raw == len(before)
        # a second purge is a no-op version-wise
        assert t.purge_dvs() == v


def test_dv_purge_threshold_spares_light_files(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _make_table(spark, d)
        t.delete_rows_dv("k", 0, 7)   # file 1: 8/10 rows dead (0.8)
        t.delete_rows_dv("k", 10, 11)  # file 2: 2/10 rows dead (0.2)
        v = t.purge_dvs(min_dv_fraction=0.5)
        live, _, _ = t._replay_actions(v)
        dv_left = [p for p, a in live.items() if a.get("deletionVector")]
        assert len(dv_left) == 1  # only the lightly-vectored file remains
        assert t.read().count() == 10


def test_dv_purge_commit_is_invisible_to_consumers(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _make_table(spark, d)
        t.delete_rows_dv("k", 2, 4)
        v = t.purge_dvs()
        for action in t._actions(v):
            payload = action.get("add") or action.get("remove")
            if payload is not None:
                assert payload.get("dataChange", True) is False


def test_partitioned_dv_delete_rewrites_nothing_and_refuses_partition_preds(spark):
    """Merge-on-read DELETE on a partitioned table: (a) no data file is
    rewritten — the live path set is unchanged, affected files just gain
    DV descriptors; (b) reads rebuild partition columns and subtract
    doomed rows; (c) a predicate on the PARTITION column refuses the DV
    path (tombstoning directories is the metadata-only answer)."""
    import tempfile

    import pyspark.sql.functions as F
    import pytest as _pytest

    from satellite_data_ingestion_spark.sources.delta_log import (
        DeltaLogTable,
    )

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(40)], "x long, k string"
    )
    t = DeltaLogTable(spark, tempfile.mkdtemp(prefix="dvpart_"))
    t.commit_append(df.repartition(2), partition_by=["k"])
    t.enable_deletion_vectors()
    live_before, _, _ = t._replay_actions(t.latest_version())

    t.delete_rows_dv("x", 10, 19)
    live_after, _, _ = t._replay_actions(t.latest_version())
    assert set(live_after) == set(live_before), "DV delete must not rewrite"
    assert any(a.get("deletionVector") for a in live_after.values())

    got = sorted((r.x, r.k) for r in t.read().collect())
    want = sorted((i, "a" if i % 2 else "b") for i in range(40) if not 10 <= i <= 19)
    assert got == want

    # second delete: union path on already-DV'd files
    t.delete_rows_dv("x", 15, 25)
    got2 = sorted(r.x for r in t.read().collect())
    assert got2 == [i for i in range(40) if not 10 <= i <= 25]

    # where-pruned read still works over DV'd partitioned files
    assert sorted(
        r.x for r in t.read(where={"k": "b"}).collect()
    ) == [i for i in range(40) if i % 2 == 0 and not 10 <= i <= 25]

    with _pytest.raises(ValueError, match="PARTITION column"):
        t.delete_rows_dv("k", "a", "a")

    # OPTIMIZE composes: the rewrite purges every DV, keeps the Hive
    # layout, and leaves contents invariant — the partitioned form of
    # the dv_purge lifecycle.
    before = sorted(r.x for r in t.read().collect())
    t.compact(target_file_bytes=1 << 20)
    live_c, _, _ = t._replay_actions(t.latest_version())
    assert not any(a.get("deletionVector") for a in live_c.values())
    assert all(p.startswith("k=") for p in live_c)
    assert sorted(r.x for r in t.read().collect()) == before


def test_dv_bitmap_roundtrip_properties():
    """Property-based conformance for the DV byte formats: for arbitrary
    position sets — including container-boundary values around k*2^16
    and dense runs that push the roaring encoder across its array /
    bitmap / run container choices — descriptor round-trips are exact
    and dv_union is set union.  Pure Python, no Spark."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from satellite_data_ingestion_spark.sources.dv_bitmap import (
        dv_descriptor,
        dv_positions,
        dv_union,
        z85_decode,
        z85_encode,
    )

    boundary = st.builds(
        lambda k, off: k * 65536 + off,
        st.integers(min_value=0, max_value=3),
        st.sampled_from([0, 1, 65534, 65535]),
    )
    anywhere = st.integers(min_value=0, max_value=1 << 20)
    dense_run = st.builds(
        lambda start, n: list(range(start, start + n)),
        st.integers(min_value=0, max_value=200_000),
        st.integers(min_value=1, max_value=5000),
    )
    position_sets = st.one_of(
        st.sets(st.one_of(anywhere, boundary), max_size=400),
        dense_run.map(set),
    )

    @settings(max_examples=150, deadline=None)
    @given(a=position_sets, b=position_sets)
    def check(a: set, b: set) -> None:
        da, db = dv_descriptor(a), dv_descriptor(b)
        assert dv_positions(da) == sorted(a)
        assert dv_positions(db) == sorted(b)
        assert dv_positions(dv_union(da, db)) == sorted(a | b)

    check()

    # Z85 is spec-defined for 4-byte multiples only (and the DV format
    # always feeds it padded words); other lengths must refuse loudly.
    @settings(max_examples=150, deadline=None)
    @given(st.binary(min_size=0, max_size=256).map(lambda b: b[: len(b) - len(b) % 4]))
    def z85_roundtrip(data: bytes) -> None:
        assert z85_decode(z85_encode(data)) == data

    z85_roundtrip()

    import pytest as _pytest

    with _pytest.raises(ValueError, match="multiple of 4"):
        z85_encode(b"\x00")
