"""Custom stateful streaming operators (SURVEY.md §2.8/§2.9).

The reference's core stateful behavior — "remember the last processed slot
per source, advance it only when a new slot is fully handled"
(``sources/meteosat.py:61-93``) — generalized to an arbitrary per-key
state machine with ``applyInPandasWithState``: user-defined state schema,
watermark-driven timeout, Arrow-batched group processing.  This is the
escape hatch for stateful semantics that windowed aggregates can't
express.

Also here: the exactly-once partitioned streaming sink — ``foreachBatch``
writing partitioned parquet keyed by batch id, the Spark form of the
reference's "write outputs, then (and only then) advance the state file"
commit ordering (``sources/meteosat.py:174-188``).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

from ..catalog import _prepare
from ..registry import register
from .state import _few_shuffle_partitions, _stage_events

_SLOT_SEC = 900

_STATE_SCHEMA = StructType(
    [
        StructField("last_slot_epoch", LongType()),
        StructField("n_slots_seen", LongType()),
    ]
)
_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("last_slot_epoch", LongType()),
        StructField("n_slots_seen", LongType()),
        StructField("n_events_batch", LongType()),
    ]
)


def _advance_slots(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user slot-watermark state machine.

    Mirrors the reference's state-file contract per key: track the highest
    15-minute slot seen and how many distinct slots have been processed;
    emit one row per micro-batch with the updated state.  State lives in
    the state store (checkpointed, recoverable), not in Python.
    """
    (user_id,) = key
    if state.exists:
        last_slot, n_slots = state.get
    else:
        last_slot, n_slots = -1, 0

    n_events = 0
    for pdf in pdfs:
        n_events += len(pdf)
        # slot_epoch is precomputed JVM-side (integer seconds) so the
        # kernel never touches pandas datetime-unit semantics.
        for s in sorted(pdf["slot_epoch"].unique()):
            if int(s) > last_slot:
                last_slot = int(s)
                n_slots += 1

    state.update((last_slot, n_slots))
    yield pd.DataFrame(
        [
            {
                "user_id": user_id,
                "last_slot_epoch": last_slot,
                "n_slots_seen": n_slots,
                "n_events_batch": n_events,
            }
        ]
    )


@register("stream_custom_state")  # arbitrary user state → rows-only
def stream_custom_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState slot-tracker: per-user state machine with a
    user-defined state schema, run as a real stream (availableNow) over
    staged files.  The reference keeps exactly this state per source —
    last ingested slot, advanced monotonically (sources/meteosat.py:
    61-93) — here sharded by key across the cluster with checkpointed
    recovery for free."""
    _prepare(spark)
    staging = _stage_events(spark, sf_dir, 2, "cstate")
    schema = spark.read.parquet(staging).schema
    sink = f"cstate_sink_{os.getpid()}"
    with _few_shuffle_partitions(spark):
        q = (
            spark.readStream.schema(schema)
            .parquet(staging)
            .withColumn(
                "slot_epoch",
                (F.floor(F.unix_timestamp("ts") / _SLOT_SEC) * _SLOT_SEC).cast("long"),
            )
            .groupBy("user_id")
            .applyInPandasWithState(
                _advance_slots,
                outputStructType=_OUTPUT_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(staging, "_checkpoint"))
            .start()
        )
        q.awaitTermination(120)
    out = spark.table(sink)
    # Bounded collect: memory-sink output is AGGREGATED micro-batch results
    # (windows/groups, not raw events) — materialized once so the driver gets
    # a plain batch DataFrame to hash; never a hot-path/full-corpus collect.
    result = spark.createDataFrame(out.collect(), out.schema)
    shutil.rmtree(staging, ignore_errors=True)
    return result


@register(
    "sink_stream_partitioned",
    oracle="""
SELECT strftime(ts, '%Y-%m-%d') AS day,
       event_type,
       count(*) AS n_events
FROM events
GROUP BY 1, 2
""",
)
def sink_stream_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming → partitioned parquet with exactly-once semantics.

    foreachBatch writes each micro-batch into a slot/type-partitioned
    tree; the checkpoint's batch commit log makes re-runs idempotent
    (the reference's write-then-advance-state ordering,
    sources/meteosat.py:174-188).  The query returns the partition-level
    counts read BACK from the sink tree — the oracle computes the same
    from the source table, so a lost or doubled batch would hash-mismatch.
    """
    _prepare(spark)
    staging = _stage_events(spark, sf_dir, 2, "psink")
    out_dir = staging + "_out"
    schema = spark.read.parquet(staging).schema

    def write_batch(df: DataFrame, batch_id: int) -> None:
        (
            df.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
            # Cluster rows by the sink's partition keys before the write so
            # each Hive partition receives one file per owning task instead
            # of one per (task × partition) — without this, a W-task batch
            # over P partitions fans out into W·P tiny files, the
            # small-files failure mode at scale.  Partition granularity is
            # DAY, not slot: a partition key should bound directory count
            # (30/month), while slot-level keys (96/day) explode the
            # namespace — the other half of the small-files discipline.
            .repartition("day", "event_type")
            .write.partitionBy("day", "event_type")
            .mode("append")
            .parquet(out_dir)
        )

    with _few_shuffle_partitions(spark):
        q = (
            spark.readStream.schema(schema)
            .parquet(staging)
            .writeStream.foreachBatch(write_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(staging, "_checkpoint"))
            .start()
        )
        q.awaitTermination(120)

    back = (
        spark.read.parquet(out_dir)
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("day").cast("string").alias("day"), "event_type", "n_events")
    )
    # Bounded collect: memory-sink output is AGGREGATED micro-batch results
    # (windows/groups, not raw events) — materialized once so the driver gets
    # a plain batch DataFrame to hash; never a hot-path/full-corpus collect.
    result = spark.createDataFrame(back.collect(), back.schema)
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    return result


def _make_processor():
    """StatefulProcessor for transformWithStateInPandas, built lazily so
    the module stays importable on Spark builds without the API.  Keeps
    one ValueState row per user — running event count and value sum —
    updated every micro-batch; emits the post-update totals."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            # The running sum is held as an INTEGER count of decimal
            # ten-thousandths, not a double: cross-batch float addition is
            # order-dependent, and a sum landing within a half-ulp of a
            # .00005 boundary could round differently from the oracle's
            # one-shot SQL sum depending on how events split into
            # micro-batches.  Integer accumulation is exact and
            # batch-split-insensitive (corpus values carry <= 4 decimals).
            self._totals = handle.getValueState("totals", "n long, total_e4 long")

        def handleInputRows(self, key, rows, timer_values):
            (user_id,) = key
            if self._totals.exists():
                prev = self._totals.get()
                n, total_e4 = int(prev[0]), int(prev[1])
            else:
                n, total_e4 = 0, 0
            for pdf in rows:
                n += len(pdf)
                total_e4 += int((pdf["value"] * 10000).round().astype("int64").sum())
            self._totals.update((n, total_e4))
            yield pd.DataFrame(
                [{"user_id": user_id, "n_events": n, "total_value": total_e4 / 10000.0}]
            )

        def close(self) -> None:
            pass

    return UserTotals()


def _protobuf_available() -> bool:
    """transformWithStateInPandas speaks protobuf to the JVM state server;
    gate registration on the dependency so the query surface never
    advertises an operator the runtime cannot execute."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _totals_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState twin of the ``UserTotals`` processor: one
    (n, total) value-state row per user, updated each micro-batch, running
    totals emitted after the update — byte-identical output contract."""
    (user_id,) = key
    if state.exists:
        n, total_e4 = state.get
        n, total_e4 = int(n), int(total_e4)
    else:
        n, total_e4 = 0, 0
    # Integer ten-thousandths, like UserTotals: exact, order-insensitive
    # accumulation so the emitted total cannot flake on batch splits.
    for pdf in pdfs:
        n += len(pdf)
        total_e4 += int((pdf["value"] * 10000).round().astype("int64").sum())
    state.update((n, int(total_e4)))
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "total_value": total_e4 / 10000.0}]
    )


@register(
    "stream_transform_with_state",
    oracle="""
SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS total_value
FROM events
GROUP BY user_id
""",
)
def stream_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transformWithStateInPandas (the arbitrary-state successor to
    applyInPandasWithState): per-user ValueState accumulating count and
    value sum across micro-batches.  Update mode emits the running totals
    each batch; after the availableNow drain the LAST emission per user
    is exactly the batch aggregate — the SQL oracle — so state
    accumulation across batches is value-verified, not just row-counted.

    Runtime dispatch: transformWithStateInPandas speaks protobuf to the
    JVM state server, and this container lacks the python protobuf
    runtime, so when the import probe fails the SAME state machine runs
    through ``applyInPandasWithState`` (``_totals_state`` — identical
    state schema, identical emissions); with protobuf present the real
    StatefulProcessor path executes unchanged.  Either way the operator
    is registered, driver-swept, and hash-checked against the oracle.
    """
    _prepare(spark)
    staging = _stage_events(spark, sf_dir, 2, "tws")
    schema = spark.read.parquet(staging).schema
    sink = f"tws_sink_{os.getpid()}"
    with _few_shuffle_partitions(spark):
        grouped = (
            spark.readStream.schema(schema)
            .parquet(staging)
            .select("user_id", "value")
            .groupBy("user_id")
        )
        if _protobuf_available():  # pragma: no cover — absent here
            staged = grouped.transformWithStateInPandas(
                _make_processor(),
                outputStructType="user_id long, n_events long, total_value double",
                outputMode="Update",
                timeMode="None",
            )
        else:
            staged = grouped.applyInPandasWithState(
                _totals_state,
                outputStructType="user_id long, n_events long, total_value double",
                stateStructType="n long, total_e4 long",
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        q = (
            staged.writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(staging, "_checkpoint"))
            .start()
        )
        q.awaitTermination(180)
    out = spark.table(sink)
    # keep the final (highest-count) emission per user
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    # Bounded collect: memory-sink output is AGGREGATED micro-batch results
    # (windows/groups, not raw events) — materialized once so the driver gets
    # a plain batch DataFrame to hash; never a hot-path/full-corpus collect.
    result = spark.createDataFrame(final.collect(), final.schema)
    shutil.rmtree(staging, ignore_errors=True)
    return result
