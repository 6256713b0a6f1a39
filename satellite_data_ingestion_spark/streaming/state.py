"""Stateful streaming surface: incremental source, watermark, dedup state,
checkpoint recovery, atomic state commit (SURVEY.md §2.1, §2.8).

These run REAL Structured Streaming queries (file source → transformations
→ memory/foreachBatch sink) under ``Trigger.AvailableNow`` so they are
deterministic and finite in tests, while exercising the production code
path: offsets, state store, watermark bookkeeping, commit log.

Reference mapping:
- scheduler tick, one slot per run           → maxFilesPerTrigger=1
  (``main.py:28-29``, ``sources/meteosat.py:88-93``)
- JSON state file advanced only on success   → checkpointLocation +
  idempotent sink (``sources/meteosat.py:61-80,187-188``)
- atomic temp-write + fsync + rename         → Spark's checkpoint commit
  protocol; batch analog below keeps the same replace-on-success contract
  (``utils/fs.py:21-48``)
- 45-min bootstrap lookback                  → watermark delay
  (``sources/meteosat.py:93``)
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import _prepare, table
from ..registry import register

_SLOT_SEC = 900


def atomic_write_json(payload: dict, dest: str) -> None:
    """Atomic small-state commit: write to a temp file in the destination
    directory, flush+fsync, then rename over the target.  Readers see the
    old state or the new state, never a torn write — the same contract the
    reference's state file keeps (utils/fs.py:21-48), used here for
    driver-side high-watermark records outside streaming checkpoints."""
    d = os.path.dirname(dest) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, dest)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


@register(
    "sink_atomic_state",
    oracle=f"""
SELECT CAST(floor(epoch(max(ts)) / {_SLOT_SEC}) AS BIGINT) * {_SLOT_SEC} AS last_slot_epoch,
       count(*) AS n_ingested
FROM events
""",
)
def sink_atomic_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-watermark state record: the last complete 15-minute slot seen
    plus the ingested row count — what the reference persists to its JSON
    state file after each successful run (sources/meteosat.py:71-80).
    The record round-trips through :func:`atomic_write_json` so the
    commit path itself is exercised."""
    ev = table(spark, sf_dir, "events")
    state = ev.agg(
        (
            F.floor(F.unix_timestamp(F.max("ts")) / _SLOT_SEC).cast("long") * _SLOT_SEC
        ).alias("last_slot_epoch"),
        F.count(F.lit(1)).alias("n_ingested"),
    )
    row = state.collect()[0]
    dest = os.path.join(tempfile.gettempdir(), f"sdis_state_{os.getpid()}.json")
    atomic_write_json({"last_slot_epoch": row[0], "n_ingested": row[1]}, dest)
    with open(dest) as f:
        persisted = json.load(f)
    os.unlink(dest)
    return spark.createDataFrame([persisted], schema=state.schema)


class _few_shuffle_partitions:
    """Temporarily cap spark.sql.shuffle.partitions for a stateful stream.

    A stateful streaming query materializes one state store per shuffle
    partition and pins the count into its checkpoint; with a default of
    200 that is 200 state stores for a test-scale stream.  Production
    sizing belongs in the session config — this scopes a sane small value
    to the self-contained staged streams below.
    """

    def __init__(self, spark: SparkSession, n: int = 8):
        self.spark = spark
        self.n = n
        self.prev: str | None = None

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))
        return self

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)
        return False


def _stage_events(spark: SparkSession, sf_dir: str, n_files: int, tag: str) -> str:
    """Copy events into a temp staging dir as n_files parquet files — the
    'slot files arriving' fixture for file-source streaming."""
    staging = os.path.join(
        tempfile.gettempdir(), f"sdis_staging_{tag}_{os.getpid()}"
    )
    shutil.rmtree(staging, ignore_errors=True)
    table(spark, sf_dir, "events").repartition(n_files).write.mode("overwrite").parquet(staging)
    return staging


def _stage_events_bucketed(
    spark: SparkSession, sf_dir: str, n_files: int, tag: str
) -> str:
    """Stage events as ``n_files`` parquet files with DETERMINISTIC
    contents — file i holds exactly the rows with ``event_id % n_files ==
    i`` — and strictly increasing mtimes, so a ``maxFilesPerTrigger=1``
    drain ingests bucket i as micro-batch i.  Round-robin ``repartition``
    file contents depend on input split layout (environment-dependent);
    this keys each file relationally so the per-batch ingestion log has a
    SQL oracle.  Driver work is one bounded loop over n_files writes."""
    import glob as _glob

    staging = os.path.join(
        tempfile.gettempdir(), f"sdis_staging_{tag}_{os.getpid()}"
    )
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)
    ev = table(spark, sf_dir, "events")
    tmp = staging + "_tmp"
    base = int(os.path.getmtime(staging))
    for i in range(n_files):
        (
            ev.filter(F.pmod("event_id", F.lit(n_files)) == i)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dest = os.path.join(staging, f"{i:05d}.parquet")
        os.replace(part, dest)
        os.utime(dest, (base + 10 * i, base + 10 * i))
    shutil.rmtree(tmp, ignore_errors=True)
    return staging


def _drain_to_files(
    spark: SparkSession, stream_df: DataFrame, staging: str, timeout: int = 120
) -> DataFrame:
    """Drain a finite (AvailableNow) stream through a parquet file sink and
    read the sink back lazily.

    This is the scale-safe materialization for row-proportional streaming
    output: executors write the sink in parallel and the returned DataFrame
    reads it distributed — nothing ever moves through the driver.  (A memory
    sink + collect, the previous shape here, buffers the whole output in
    driver memory — fine for aggregated/bounded results, a scale-killer for
    per-event output.)  The sink dir lives next to the staging dir and is
    left in place because the returned DataFrame reads it lazily.
    """
    out_dir = staging + "_out"
    # A rerun in the same process reuses the staging path (pid-keyed); a
    # stale sink from the previous run would double rows under append mode.
    shutil.rmtree(out_dir, ignore_errors=True)

    def write_batch(df: DataFrame, batch_id: int) -> None:
        df.write.mode("append").parquet(out_dir)

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(staging, "_checkpoint"))
        .start()
    )
    if not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(f"stream drain exceeded {timeout}s (sink: {out_dir})")
    if not os.path.isdir(out_dir):  # zero batches delivered → empty result
        return spark.createDataFrame([], stream_df.schema)
    return spark.read.parquet(out_dir).select(*stream_df.columns)


# Oracle: batch i ingests exactly the event_id % 4 == i bucket (staging is
# bucketed with mtime-ordered files; maxFilesPerTrigger=1 → one file per
# micro-batch in mtime order), so the ingestion log is the bucket histogram.
@register(
    "source_rate_incremental",
    oracle="""
SELECT CAST(event_id % 4 AS BIGINT) AS batch_id,
       CAST(count(*) AS BIGINT) AS n_rows
FROM events GROUP BY 1
""",
)
def source_rate_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slot-at-a-time incremental file source: maxFilesPerTrigger=1 makes
    each micro-batch ingest exactly one staged file — the Spark form of
    'advance one 15-minute slot per scheduler tick' (main.py:28-29,
    sources/meteosat.py:88-93).  Returns the per-batch ingestion log the
    file-source offsets produced."""
    _prepare(spark)
    staging = _stage_events_bucketed(spark, sf_dir, 4, "incr")
    schema = spark.read.parquet(staging).schema
    batches: list[tuple[int, int]] = []

    def log_batch(df: DataFrame, batch_id: int) -> None:
        batches.append((batch_id, df.count()))

    with _few_shuffle_partitions(spark):
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staging)
            .writeStream.foreachBatch(log_batch)
            .trigger(availableNow=True)
            .option(
                "checkpointLocation",
                os.path.join(staging, "_checkpoint"),
            )
            .start()
        )
        q.awaitTermination(120)
    shutil.rmtree(staging, ignore_errors=True)
    return spark.createDataFrame(
        [(b, n) for b, n in sorted(batches)], "batch_id long, n_rows long"
    )


# Oracle: AvailableNow with 2 staged files (below the file-source
# per-trigger limit) drains in exactly one micro-batch, and a stateless
# sink gets no trailing no-data batch — so the ingestion log is the single
# row (batch 0, total row count).
@register(
    "stream_trigger",
    oracle="""
SELECT CAST(0 AS BIGINT) AS batch_id, CAST(count(*) AS BIGINT) AS n_rows
FROM events
""",
)
def stream_trigger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Micro-batch trigger cadence: the production query runs
    trigger(processingTime='15 minutes') (the reference's scheduler
    interval, main.py:28-29); here AvailableNow drains the same plan
    deterministically and reports rows ingested per trigger."""
    _prepare(spark)
    staging = _stage_events(spark, sf_dir, 2, "trig")
    schema = spark.read.parquet(staging).schema
    batches: list[tuple[int, int]] = []

    def log_batch(df: DataFrame, batch_id: int) -> None:
        batches.append((batch_id, df.count()))

    with _few_shuffle_partitions(spark):
        q = (
            spark.readStream.schema(schema)
            .parquet(staging)
            .writeStream.foreachBatch(log_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(staging, "_checkpoint"))
            .start()
        )
        q.awaitTermination(120)
    shutil.rmtree(staging, ignore_errors=True)
    return spark.createDataFrame(
        [(b, n) for b, n in sorted(batches)], "batch_id long, n_rows long"
    )


# Oracle: append-mode windows emit once the final watermark (max event time
# minus the 45-minute delay, advanced by the closing no-data batch) passes
# their end; windows still inside the watermark stay buffered and are
# withheld — exactly the HAVING bound below.
@register(
    "stream_watermark",
    oracle="""
WITH m AS (SELECT max(ts) - INTERVAL 45 MINUTE AS wm FROM events)
SELECT CAST(epoch(time_bucket(INTERVAL 15 MINUTE, ts)) AS BIGINT) AS slot_epoch,
       CAST(count(*) AS BIGINT) AS n_events
FROM events, m
WHERE time_bucket(INTERVAL 15 MINUTE, ts) + INTERVAL 15 MINUTE <= m.wm
GROUP BY 1
""",
)
def stream_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling aggregate as a real stream: 45-minute late-data
    bound (the reference's bootstrap lookback, sources/meteosat.py:93) on
    15-minute windows.  State for windows older than the watermark is
    dropped — bounded memory at any scale; AvailableNow drains the staged
    files through the stateful operator."""
    _prepare(spark)
    staging = _stage_events(spark, sf_dir, 2, "wm")
    schema = spark.read.parquet(staging).schema
    with _few_shuffle_partitions(spark):
        windowed = (
            spark.readStream.schema(schema)
            .parquet(staging)
            .withWatermark("ts", "45 minutes")
            .groupBy(F.window("ts", "15 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.unix_timestamp(F.col("w.start")).alias("slot_epoch"), "n_events"
            )
        )
        return _drain_to_files(spark, windowed, staging)


# Oracle: the stateful dedup emits exactly one row per distinct
# (user_id, minute-slot) key.  The output projects the KEY columns only —
# WHICH duplicate row survives is arrival-order-dependent (a real cluster
# property, not a defect), so carrying e.g. event_id would make the frame
# nondeterministic; the key set itself is exact and hash-stable.
@register(
    "stream_dedup_state",
    oracle="""
SELECT DISTINCT user_id,
       CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS slot_epoch
FROM events
""",
)
def stream_dedup_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful exactly-once dedup: dropDuplicatesWithinWatermark on the
    (user_id, minute-slot) key — the streaming form of the reference's
    'skip a slot already in the state file' (sources/meteosat.py:71-80,
    188).  Watermark bounds the dedup state exactly like the state file
    bounds reprocessing."""
    _prepare(spark)
    staging = _stage_events(spark, sf_dir, 2, "dedup")
    schema = spark.read.parquet(staging).schema
    with _few_shuffle_partitions(spark):
        deduped = (
            spark.readStream.schema(schema)
            .parquet(staging)
            .withColumn("slot", F.date_trunc("minute", "ts"))
            .withWatermark("slot", "45 minutes")
            .dropDuplicatesWithinWatermark(["user_id", "slot"])
            .select("user_id", F.unix_timestamp("slot").alias("slot_epoch"))
        )
        return _drain_to_files(spark, deduped, staging)


# Oracle: run 1 ingests the whole staged corpus; run 2 restarts over the
# same checkpoint and must ingest zero rows (offsets committed) — the
# idempotence contract stated relationally.
@register(
    "stream_recovery",
    oracle="""
SELECT CAST(1 AS BIGINT) AS run_id, CAST(count(*) AS BIGINT) AS n_rows FROM events
UNION ALL
SELECT CAST(2 AS BIGINT), CAST(0 AS BIGINT)
""",
)
def stream_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crash-consistency contract: run a checkpointed stream to completion,
    then start it AGAIN over the same checkpoint — the second run must
    ingest zero new rows (offsets committed), mirroring 'state only
    advances after a successful write, failed slots are retried'
    (sources/meteosat.py:187-197, atomic rename utils/fs.py:42).
    Returns (run_id, rows_ingested) — run 2 proving idempotence."""
    _prepare(spark)
    staging = _stage_events(spark, sf_dir, 2, "recov")
    schema = spark.read.parquet(staging).schema
    checkpoint = os.path.join(staging, "_checkpoint")
    runs: list[tuple[int, int]] = []

    with _few_shuffle_partitions(spark):
        for run_id in (1, 2):
            ingested = {"n": 0}

            def log_batch(df: DataFrame, batch_id: int) -> None:
                ingested["n"] += df.count()

            q = (
                spark.readStream.schema(schema)
                .parquet(staging)
                .writeStream.foreachBatch(log_batch)
                .trigger(availableNow=True)
                .option("checkpointLocation", checkpoint)
                .start()
            )
            q.awaitTermination(120)
            runs.append((run_id, ingested["n"]))

    shutil.rmtree(staging, ignore_errors=True)
    return spark.createDataFrame(runs, "run_id long, n_rows long")


_EXPECT_TYPES = ("error", "view", "click", "signup", "purchase")
_EXPECT_RANGE_TH = 0.01


@register(
    "stream_expectations",
    oracle=f"""
WITH b AS (
  SELECT CAST(event_id % 3 AS BIGINT) AS batch_id,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN value < 0 OR value > 400 THEN 1 ELSE 0 END) AS BIGINT) AS oob,
         CAST(sum(CASE WHEN event_type NOT IN
             ({", ".join(f"'{t}'" for t in _EXPECT_TYPES)}) THEN 1 ELSE 0 END) AS BIGINT) AS bad_type
  FROM events GROUP BY 1
)
SELECT batch_id, rule, round(metric, 6) AS metric, passed FROM (
  SELECT batch_id, 'rows.nonempty' AS rule,
         CAST(n AS DOUBLE) AS metric, n > 0 AS passed FROM b
  UNION ALL
  SELECT batch_id, 'value.range_0_400',
         CAST(oob AS DOUBLE) / n, CAST(oob AS DOUBLE) / n <= {_EXPECT_RANGE_TH} FROM b
  UNION ALL
  SELECT batch_id, 'event_type.domain',
         CAST(bad_type AS DOUBLE) / n, bad_type = 0 FROM b
)
""",
)
def stream_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING data-quality gate: the per-commit twin of the batch
    ``ext_data_expectations`` — every micro-batch is scored against the
    expectation suite BEFORE it lands (the foreachBatch pattern real
    pipelines use to quarantine a bad batch instead of poisoning the
    table; Delta's per-commit CHECK constraints are the storage-side
    version, sources/delta_log.py).

    Each staged slot file arrives as its own micro-batch
    (maxFilesPerTrigger=1 over the deterministic event_id%3 bucketing, so
    the per-batch metrics have an exact SQL oracle); the per-batch rule
    evaluation is ONE executor-side aggregate per batch — the driver sees
    |rules| numbers per commit, never rows.  At 100 TB cadence the gate
    adds one map-side-combined pass per micro-batch."""
    _prepare(spark)
    staging = _stage_events_bucketed(spark, sf_dir, 3, "expect")
    schema = spark.read.parquet(staging).schema
    rows: list[tuple[int, str, float, bool]] = []

    def gate(df: DataFrame, batch_id: int) -> None:
        m = df.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when((F.col("value") < 0) | (F.col("value") > 400), 1).otherwise(0)
            ).cast("long").alias("oob"),
            F.sum(
                F.when(~F.col("event_type").isin(*_EXPECT_TYPES), 1).otherwise(0)
            ).cast("long").alias("bad_type"),
        ).collect()[0]
        if m.n == 0:
            # A no-data retrigger (e.g. after checkpoint recovery) carries
            # nothing to score: log-and-skip rather than emit rows — the
            # oracle's batch spine is data-derived (event_id%3 groups), so
            # synthetic n=0 rows could never match it, and a gate row about
            # zero rows gates nothing.  The alert channel is the log line.
            print(f"stream_expectations: empty micro-batch {batch_id} (skipped)")
            return
        rows.append((batch_id, "rows.nonempty", float(m.n), True))
        rows.append(
            (batch_id, "value.range_0_400", m.oob / m.n, m.oob / m.n <= _EXPECT_RANGE_TH)
        )
        rows.append(
            (batch_id, "event_type.domain", m.bad_type / m.n, m.bad_type == 0)
        )

    with _few_shuffle_partitions(spark):
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staging)
            .writeStream.foreachBatch(gate)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(staging, "_checkpoint"))
            .start()
        )
        q.awaitTermination(120)
    shutil.rmtree(staging, ignore_errors=True)
    out = spark.createDataFrame(
        sorted(rows), "batch_id long, rule string, metric double, passed boolean"
    )
    return out.select(
        "batch_id", "rule", F.round("metric", 6).alias("metric"), "passed"
    )


_DRIFT_TH_CENTS = 500.0  # |batch mean - running baseline| alert bound, cents


@register(
    "stream_drift_monitor",
    oracle=f"""
WITH b AS (
  SELECT CAST(event_id % 4 AS BIGINT) AS batch_id,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv
  FROM events GROUP BY 1
), w AS (
  SELECT batch_id, n,
         CAST(sv AS DOUBLE) / n AS mean_cents,
         CAST(sum(sv) OVER (ORDER BY batch_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS DOUBLE)
           / sum(n) OVER (ORDER BY batch_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS baseline_cents
  FROM b
)
SELECT batch_id, n,
       floor(mean_cents * 100 + 0.5) / 100.0 AS batch_mean_cents,
       floor(baseline_cents * 100 + 0.5) / 100.0 AS baseline_mean_cents,
       CASE WHEN baseline_cents IS NULL THEN FALSE
            ELSE abs(mean_cents - baseline_cents) > {_DRIFT_TH_CENTS} END AS drift
FROM w
""",
)
def stream_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING DRIFT MONITOR: each micro-batch's mean is compared to
    the running baseline of all PRIOR batches — the online
    data-distribution-shift alarm every production ingest runs (the
    streaming sibling of ``ext_ts_changepoint``'s offline CUSUM; a
    drifting upstream schema/unit change fires here first).

    State is two numbers (running n, running sum in exact integer
    cents) carried across micro-batches driver-side; each batch costs
    one executor-side aggregate.  The staged files arrive as
    deterministic event_id%4 micro-batches, so the whole monitor run
    has an exact SQL oracle (prior-batch window over the bucketed
    groups)."""
    _prepare(spark)
    staging = _stage_events_bucketed(spark, sf_dir, 4, "drift")
    schema = spark.read.parquet(staging).schema
    state = {"n": 0, "sv": 0}
    out: list[tuple[int, int, float, float | None, bool]] = []

    def monitor(df: DataFrame, batch_id: int) -> None:
        m = df.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("sv"),
        ).collect()[0]
        if m.n == 0:
            # Empty micro-batch: no mean to compare and nothing to fold
            # into the baseline — log-and-skip (the oracle's batch spine is
            # data-derived, so an n=0 row could never hash-match, and a
            # 0.0 "mean" would misreport a mean that does not exist).
            print(f"stream_drift_monitor: empty micro-batch {batch_id} (skipped)")
            return
        mean = m.sv / m.n
        if state["n"] == 0:
            baseline, drift = None, False
        else:
            baseline = state["sv"] / state["n"]
            drift = abs(mean - baseline) > _DRIFT_TH_CENTS
        out.append((batch_id, m.n, mean, baseline, drift))
        state["n"] += m.n
        state["sv"] += m.sv

    with _few_shuffle_partitions(spark):
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staging)
            .writeStream.foreachBatch(monitor)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(staging, "_checkpoint"))
            .start()
        )
        q.awaitTermination(120)
    shutil.rmtree(staging, ignore_errors=True)
    res = spark.createDataFrame(
        sorted(out),
        "batch_id long, n long, mean_c double, baseline_c double, drift boolean",
    )

    def r2(x):
        return F.floor(x * 100 + 0.5) / 100.0

    return res.select(
        "batch_id",
        "n",
        r2(F.col("mean_c")).alias("batch_mean_cents"),
        r2(F.col("baseline_c")).alias("baseline_mean_cents"),
        "drift",
    )


_SSPRT_P0 = 0.18  # null purchase-conversion rate (shared with agg_sprt)
_SSPRT_P1 = 0.22
_SSPRT_ALPHA = 0.05
_SSPRT_BUCKETS = 5


@register(
    "stream_sprt",
    oracle=f"""
WITH b AS (
  SELECT CAST(event_id % {_SSPRT_BUCKETS} AS BIGINT) AS batch_id,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS x
  FROM events GROUP BY 1
),
walk AS (
  SELECT batch_id, n, x,
         CAST(sum(n) OVER (ORDER BY batch_id) AS BIGINT) AS cum_n,
         CAST(sum(x) OVER (ORDER BY batch_id) AS BIGINT) AS cum_x
  FROM b
)
SELECT batch_id, cum_n, cum_x,
       floor((cum_x * ln(CAST({_SSPRT_P1} AS DOUBLE) / {_SSPRT_P0})
              + (cum_n - cum_x)
                * ln((1.0 - CAST({_SSPRT_P1} AS DOUBLE))
                     / (1.0 - CAST({_SSPRT_P0} AS DOUBLE))))
             * 1000000 + 0.5) / 1000000.0 AS llr,
       CASE WHEN cum_x * ln(CAST({_SSPRT_P1} AS DOUBLE) / {_SSPRT_P0})
                 + (cum_n - cum_x)
                   * ln((1.0 - CAST({_SSPRT_P1} AS DOUBLE))
                        / (1.0 - CAST({_SSPRT_P0} AS DOUBLE)))
                 >= ln((1.0 - CAST({_SSPRT_ALPHA} AS DOUBLE))
                       / {_SSPRT_ALPHA})
            THEN 'accept_h1'
            WHEN cum_x * ln(CAST({_SSPRT_P1} AS DOUBLE) / {_SSPRT_P0})
                 + (cum_n - cum_x)
                   * ln((1.0 - CAST({_SSPRT_P1} AS DOUBLE))
                        / (1.0 - CAST({_SSPRT_P0} AS DOUBLE)))
                 <= -ln((1.0 - CAST({_SSPRT_ALPHA} AS DOUBLE))
                        / {_SSPRT_ALPHA})
            THEN 'accept_h0'
            ELSE 'continue' END AS verdict
FROM walk
ORDER BY batch_id
""",
)
def stream_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING SPRT: ``agg_sprt``'s sequential A/B monitor run the way
    production runs it — one log-likelihood-ratio update per arriving
    MICRO-BATCH, with the decision available after every commit instead
    of at day grain (the whole point of a sequential test is stopping
    the moment the boundary is crossed; a batch recompute can only stop
    at its own cadence).

    State carried across batches is TWO integers (cum_n, cum_x) — the
    llr is reconstructed per batch from exact integer prefixes, the
    ``agg_sprt`` float discipline; each batch costs one executor-side
    aggregate (the driver sees two numbers per commit).  The staged
    event_id%{k} bucketing gives the run an exact SQL oracle over the
    batch spine."""
    import math as _math

    _prepare(spark)
    staging = _stage_events_bucketed(spark, sf_dir, _SSPRT_BUCKETS, "sprt")
    schema = spark.read.parquet(staging).schema
    state = {"n": 0, "x": 0}
    out: list[tuple[int, int, int]] = []

    def monitor(df: DataFrame, batch_id: int) -> None:
        m = df.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("x"),
        ).collect()[0]
        if m.n == 0:
            # no-data retrigger: nothing to fold, nothing the oracle's
            # data-derived batch spine could match — log-and-skip.
            print(f"stream_sprt: empty micro-batch {batch_id} (skipped)")
            return
        state["n"] += m.n
        state["x"] += m.x
        out.append((batch_id, state["n"], state["x"]))

    with _few_shuffle_partitions(spark):
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staging)
            .writeStream.foreachBatch(monitor)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(staging, "_checkpoint"))
            .start()
        )
        q.awaitTermination(120)
    shutil.rmtree(staging, ignore_errors=True)
    res = spark.createDataFrame(
        sorted(out), "batch_id long, cum_n long, cum_x long"
    )
    l1 = F.log(F.lit(_SSPRT_P1) / F.lit(_SSPRT_P0))
    l0 = F.log((1.0 - F.lit(_SSPRT_P1)) / (1.0 - F.lit(_SSPRT_P0)))
    llr = F.col("cum_x") * l1 + (F.col("cum_n") - F.col("cum_x")) * l0
    bound = F.log((1.0 - F.lit(_SSPRT_ALPHA)) / F.lit(_SSPRT_ALPHA))
    return res.select(
        "batch_id",
        "cum_n",
        "cum_x",
        (F.floor(llr * 1000000 + 0.5) / 1000000.0).alias("llr"),
        F.when(llr >= bound, "accept_h1")
        .when(llr <= -bound, "accept_h0")
        .otherwise("continue")
        .alias("verdict"),
    ).orderBy("batch_id")


_QG_BATCHES = 3  # doc_id % 3 buckets: batches 1,2 are the train slice


@register(
    "stream_quality_gate",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang, str_split(text, ' ') AS tt FROM documents
), grams AS (
  SELECT doc_id, lang, unnest(tt) AS g FROM toks
  UNION ALL
  SELECT doc_id, lang,
         tt[CAST(i AS INT)] || ' ' || tt[CAST(i AS INT) + 1] AS g
  FROM (SELECT doc_id, lang, tt, unnest(generate_series(1, len(tt) - 1)) AS i
        FROM toks)
), feat AS (
  SELECT doc_id, lang,
         CAST(concat('0x', substr(md5(g), 1, 8)) AS BIGINT) % 256 AS b
  FROM grams
), model AS (
  SELECT b,
         CAST(sum(CASE WHEN doc_id % 3 > 0 AND lang = 'en'
                  THEN 1 ELSE 0 END) AS BIGINT) AS p,
         CAST(sum(CASE WHEN doc_id % 3 > 0 AND lang <> 'en'
                  THEN 1 ELSE 0 END) AS BIGINT) AS q
  FROM feat GROUP BY 1
), tot AS (
  SELECT sum(p) AS pt, sum(q) AS qt FROM model
), bias AS (
  SELECT ln(1 + sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END))
         - ln(1 + sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END)) AS b0
  FROM documents WHERE doc_id % 3 > 0
), w AS (
  SELECT b, ln(p + 1) - ln(pt + 256.0)
            - ln(q + 1) + ln(qt + 256.0) AS w
  FROM model, tot
), scored AS (
  SELECT f.doc_id, round(b0 + sum(w.w), 4) AS logit
  FROM feat f JOIN w USING (b), bias
  GROUP BY f.doc_id, b0
)
SELECT CAST(doc_id % 3 AS BIGINT) AS batch_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN logit > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       floor(CAST(sum(CASE WHEN logit > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) * 1000000 + 0.5) / 1000000.0 AS kept_rate,
       floor(avg(logit) * 10000 + 0.5) / 10000.0 AS mean_logit
FROM scored GROUP BY 1 ORDER BY 1
""",
)
def stream_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING MODEL-BASED QUALITY GATE: every ingest micro-batch is
    scored by the fastText-shape classifier (``ext_quality_classifier``
    in llm/textstats.py) BEFORE it lands — the per-commit curation gate
    a continuously-fed corpus runs, composing the round's two families:
    the model fits ONCE on the standing train slice (doc_id % 3 > 0),
    its 256-row weight table + 1-row bias broadcast into every
    foreachBatch call, and each arriving batch pays one gram scan + one
    broadcast join + a map-side-combined summary — the driver sees one
    summary row per commit, never documents.  Batch 0 is exactly the
    classifier's HELD-OUT slice, so the stream also demonstrates
    out-of-sample gating.

    Each staged slot file arrives as its own micro-batch
    (maxFilesPerTrigger=1 over deterministic doc_id % {b} buckets), so
    the per-batch gate report has an exact SQL oracle.  At 100 TB
    cadence: the model refit is periodic and histogram-sized; scoring
    per micro-batch is batch-proportional with no corpus reshuffle."""
    from ..llm.textstats import _QC_BUCKETS, _QC_SPLIT, _QC_TARGET_LANG

    _prepare(spark)
    docs = table(spark, sf_dir, "documents")

    # --- fit once on the standing train slice (the batch-side model) ---
    tt = F.split("text", " ")
    bigrams = F.when(
        F.size("tt") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("tt") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(F.col("tt"), i), F.element_at(F.col("tt"), i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))

    def featurize(df: DataFrame) -> DataFrame:
        return (
            df.select("doc_id", "lang", tt.alias("tt"))
            .select(
                "doc_id", "lang", F.explode(F.concat(F.col("tt"), bigrams)).alias("g")
            )
            .select(
                "doc_id",
                "lang",
                (
                    F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("long")
                    % _QC_BUCKETS
                ).alias("b"),
            )
        )

    feat = featurize(docs)
    is_train = F.col("doc_id") % _QC_SPLIT > 0
    is_pos = F.col("lang") == _QC_TARGET_LANG
    model = feat.groupBy("b").agg(
        F.sum(F.when(is_train & is_pos, 1).otherwise(0)).cast("long").alias("p"),
        F.sum(F.when(is_train & ~is_pos, 1).otherwise(0)).cast("long").alias("q"),
    )
    tot = model.agg(F.sum("p").alias("pt"), F.sum("q").alias("qt"))
    w = (
        model.crossJoin(F.broadcast(tot))
        .select(
            "b",
            (
                F.log(F.col("p") + 1)
                - F.log(F.col("pt") + float(_QC_BUCKETS))
                - F.log(F.col("q") + 1)
                + F.log(F.col("qt") + float(_QC_BUCKETS))
            ).alias("w"),
        )
        .localCheckpoint(eager=True)  # model-sized; freeze before the stream
    )
    (b0,) = (
        docs.filter(is_train)
        .agg(
            (
                F.log(1 + F.sum(F.when(is_pos, 1).otherwise(0)))
                - F.log(1 + F.sum(F.when(~is_pos, 1).otherwise(0)))
            ).alias("b0")
        )
        .collect()[0]
    )

    # --- stage doc buckets as slot files; score per micro-batch --------
    import glob as _glob

    staging = os.path.join(
        tempfile.gettempdir(), f"sdis_staging_qgate_{os.getpid()}"
    )
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)
    tmp = staging + "_tmp"
    base = int(os.path.getmtime(staging))
    for i in range(_QG_BATCHES):
        (
            docs.filter(F.pmod("doc_id", F.lit(_QG_BATCHES)) == i)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        (part,) = _glob.glob(os.path.join(tmp, "part-*.parquet"))
        dest = os.path.join(staging, f"slot_{i}.parquet")
        os.replace(part, dest)
        os.utime(dest, (base + i, base + i))
    shutil.rmtree(tmp, ignore_errors=True)

    schema = spark.read.parquet(os.path.join(staging, "slot_0.parquet")).schema
    rows: list[tuple] = []

    def gate(df: DataFrame, batch_id: int) -> None:
        scored = (
            featurize(df)
            .join(F.broadcast(w), "b")
            .groupBy("doc_id")
            .agg(F.round(F.lit(b0) + F.sum("w"), 4).alias("logit"))
        )
        m = scored.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("logit") > 0, 1).otherwise(0))
            .cast("long")
            .alias("kept"),
            F.avg("logit").alias("ml"),
        ).collect()[0]
        if m.n == 0:
            print(f"stream_quality_gate: empty micro-batch {batch_id} (skipped)")
            return
        rows.append((int(m.n), int(m.kept), float(m.ml)))

    with _few_shuffle_partitions(spark):
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staging)
            .writeStream.foreachBatch(gate)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(staging, "_checkpoint"))
            .start()
        )
        q.awaitTermination(120)
    shutil.rmtree(staging, ignore_errors=True)
    out = spark.createDataFrame(
        [(i, n, kept, ml) for i, (n, kept, ml) in enumerate(rows)],
        "batch_id long, n_docs long, n_kept long, ml double",
    )
    return out.select(
        "batch_id",
        "n_docs",
        "n_kept",
        (
            F.floor(F.col("n_kept").cast("double") / F.col("n_docs") * 1000000 + 0.5)
            / 1000000.0
        ).alias("kept_rate"),
        (F.floor(F.col("ml") * 10000 + 0.5) / 10000.0).alias("mean_logit"),
    ).orderBy("batch_id")


stream_quality_gate.__doc__ = stream_quality_gate.__doc__.format(b=_QG_BATCHES)
