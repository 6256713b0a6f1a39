"""Cadence gap-fill: the reference's 15-minute slot timeline as analytics.

The reference advances a slot clock in fixed 15-minute steps and records
one product per slot (``sources/meteosat.py:88-93``); a missing catalog
hit leaves a silent hole in the timeline.  The analytical form of that
contract: materialize the FULL slot grid, mark the holes, and carry the
last observation forward — the standard time-series densification every
monitoring/training-feature pipeline needs.

Scale shape: the grid is generated per key with ``sequence`` + ``explode``
(shuffle-free generate — never a driver-side loop or a cartesian node),
observations aggregate with one (key, slot) shuffle, and the forward fill
is one window over the same key, ordered by slot.  Grid size is
(keys × slots), independent of event volume.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_DAY_LO = "2024-01-02 00:00:00"
_DAY_HI = "2024-01-03 00:00:00"  # exclusive
_LAST_SLOT = "2024-01-02 23:45:00"
_SLOT_SEC = 900  # 15 minutes, the reference's cadence


@register(
    "ext_gap_fill",
    oracle=f"""
WITH ev AS (
  SELECT event_type, time_bucket(INTERVAL 15 MINUTE, ts) AS slot, value
  FROM events
  WHERE ts >= TIMESTAMP '{_DAY_LO}' AND ts < TIMESTAMP '{_DAY_HI}'
),
observed AS (
  SELECT event_type, slot, count(*) AS cnt, avg(value) AS avg_value
  FROM ev GROUP BY event_type, slot
),
grid AS (
  SELECT t.event_type, g.slot
  FROM (SELECT DISTINCT event_type FROM ev) t
  CROSS JOIN (
    SELECT unnest(generate_series(TIMESTAMP '{_DAY_LO}',
                                  TIMESTAMP '{_LAST_SLOT}',
                                  INTERVAL 15 MINUTE)) AS slot
  ) g
)
SELECT g.event_type, g.slot,
       CAST(coalesce(o.cnt, 0) AS BIGINT) AS n_events,
       round(last_value(o.avg_value IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.slot
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS filled_value,
       (o.cnt IS NULL) AS is_gap
FROM grid g LEFT JOIN observed o USING (event_type, slot)
ORDER BY event_type, slot
""",
)
def ext_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One day of events densified onto the 15-minute slot grid per
    event type: every slot present, holes flagged, last observed value
    carried forward.

    The slot key is epoch-floored (``floor(epoch/900)*900`` — integer
    math, identical to DuckDB's ``time_bucket`` since both origins sit on
    a 15-minute boundary).  The grid is ``explode(sequence(...))`` per
    key — a generate, not a cartesian — and the fill is
    ``last(ignorenulls)`` over (key, slot-order) with an unbounded-
    preceding frame."""
    ev = (
        table(spark, sf_dir, "events")
        .filter(
            (F.col("ts") >= F.to_timestamp(F.lit(_DAY_LO)))
            & (F.col("ts") < F.to_timestamp(F.lit(_DAY_HI)))
        )
        .select(
            "event_type",
            F.timestamp_seconds(
                F.floor(F.unix_timestamp("ts") / _SLOT_SEC) * _SLOT_SEC
            ).alias("slot"),
            "value",
        )
    )
    observed = ev.groupBy("event_type", "slot").agg(
        F.count(F.lit(1)).alias("cnt"), F.avg("value").alias("avg_value")
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(
                F.sequence(
                    F.to_timestamp(F.lit(_DAY_LO)),
                    F.to_timestamp(F.lit(_LAST_SLOT)),
                    F.expr("INTERVAL 15 MINUTES"),
                )
            ).alias("slot"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(observed, ["event_type", "slot"], "left")
        .select(
            "event_type",
            "slot",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("n_events"),
            F.round(F.last("avg_value", ignorenulls=True).over(w), 6).alias(
                "filled_value"
            ),
            F.col("cnt").isNull().alias("is_gap"),
        )
        .orderBy("event_type", "slot")
    )


# Subsequence-search constants — SEMANTIC (baked into the oracle).
_TS_M = 16  # query/window length, in points
_TS_K = 10  # top-k windows returned
_TS_QUERY_TYPE = "click"  # the series whose first _TS_M points are the query

# Oracle for the STREAMING subsequence search (stream_ts_subseq): the final
# per-series state frame — (n_points, n_windows, best-window distance and
# position) — recomputed relationally over the whole series.  Ties on dist
# break toward the smaller start index, exactly the kernel's rule.
SUBSEQ_STATE_ORACLE = f"""
WITH s AS (
  SELECT event_type,
         array_agg(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS arr
  FROM events GROUP BY event_type
),
q AS (SELECT arr[1:{_TS_M}] AS qv FROM s WHERE event_type = '{_TS_QUERY_TYPE}'),
qs AS (
  SELECT qv,
         list_aggregate(qv, 'sum') / {_TS_M} AS mq,
         sqrt(greatest(
           list_aggregate([x * x FOR x IN qv], 'sum') / {_TS_M}
             - (list_aggregate(qv, 'sum') / {_TS_M})
               * (list_aggregate(qv, 'sum') / {_TS_M}),
           0)) AS sq
  FROM q
),
w AS (
  SELECT event_type, i AS start_idx, arr[i + 1 : i + {_TS_M}] AS wv
  FROM s, UNNEST(range(len(arr) - {_TS_M} + 1)) AS t(i)
),
d AS (
  SELECT event_type, start_idx,
         round(sqrt(greatest(2 * {_TS_M} * (1 - CASE
           WHEN sqrt(greatest(sw2 - mw * mw, 0)) * sq = 0 THEN 0
           ELSE (dotm - mw * mq) / (sqrt(greatest(sw2 - mw * mw, 0)) * sq)
         END), 0)), 6) AS dist
  FROM (
    SELECT event_type, start_idx,
           list_aggregate(wv, 'sum') / {_TS_M}                  AS mw,
           list_aggregate([x * x FOR x IN wv], 'sum') / {_TS_M} AS sw2,
           list_inner_product(wv, qs.qv) / {_TS_M}              AS dotm,
           qs.mq, qs.sq
    FROM w, qs
  )
),
best AS (
  SELECT event_type, dist AS min_dist, start_idx AS min_start
  FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY dist, start_idx) AS rn FROM d)
  WHERE rn = 1
)
SELECT s.event_type,
       CAST(len(s.arr) AS BIGINT) AS n_points,
       CAST(greatest(len(s.arr) - {_TS_M} + 1, 0) AS BIGINT) AS n_windows,
       b.min_dist,
       CAST(b.min_start AS BIGINT) AS min_start
FROM s LEFT JOIN best b USING (event_type)
"""


@register(
    "ext_ts_subseq_search",
    oracle=f"""
WITH s AS (
  SELECT event_type,
         array_agg(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS arr
  FROM events GROUP BY event_type
),
q AS (SELECT arr[1:{_TS_M}] AS qv FROM s WHERE event_type = '{_TS_QUERY_TYPE}'),
qs AS (
  SELECT qv,
         list_aggregate(qv, 'sum') / {_TS_M} AS mq,
         sqrt(greatest(
           list_aggregate([x * x FOR x IN qv], 'sum') / {_TS_M}
             - (list_aggregate(qv, 'sum') / {_TS_M})
               * (list_aggregate(qv, 'sum') / {_TS_M}),
           0)) AS sq
  FROM q
),
w AS (
  SELECT event_type, i AS start_idx, arr[i + 1 : i + {_TS_M}] AS wv
  FROM s, UNNEST(range(len(arr) - {_TS_M} + 1)) AS t(i)
),
d AS (
  SELECT event_type, start_idx,
         list_aggregate(wv, 'sum') / {_TS_M}            AS mw,
         list_aggregate([x * x FOR x IN wv], 'sum') / {_TS_M} AS sw2,
         list_inner_product(wv, qs.qv) / {_TS_M}        AS dotm,
         qs.mq, qs.sq
  FROM w, qs
)
SELECT event_type, start_idx,
       round(sqrt(greatest(2 * {_TS_M} * (1 - CASE
         WHEN sqrt(greatest(sw2 - mw * mw, 0)) * sq = 0 THEN 0
         ELSE (dotm - mw * mq) / (sqrt(greatest(sw2 - mw * mw, 0)) * sq)
       END), 0)), 6) AS dist
FROM d
ORDER BY dist, event_type, start_idx
LIMIT {_TS_K}
""",
)
def ext_ts_subseq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series subsequence similarity search (UCR-style): find the
    top-k sliding windows, across every per-type value series, most
    similar to a fixed query pattern under Z-NORMALIZED Euclidean
    distance — the primitive behind pattern matching / motif query over
    telemetry (cf. the distributed streaming-similarity line of work in
    PAPERS.md; public knowledge).

    Both engines compute the identical algebra via the correlation
    identity ``dist^2 = 2m(1 - rho)`` with population moments — one pass
    of sums per window, no per-element normalization arrays — so the
    DuckDB oracle hash-matches the JVM fold exactly; flat windows
    (zero variance) define rho = 0.

    Scale shape: one exchange partitions each series (at 100 TB: by
    series id); windows materialize per-row via a BOUNDED window frame
    (m values of state), the distance is whole-stage-codegen arithmetic
    on that array, and the global top-k is a TakeOrderedAndProject heap
    — no quadratic stage, no driver loop.  The m-point query vector is
    the only collect (bounded).  The matrix-profile all-pairs variant
    would bucket windows the way the ANN ops bucket vectors."""
    ev = table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", F.col("value").cast("double").alias("v")
    )
    order = ["ts", "event_id"]
    w_ord = Window.partitionBy("event_type").orderBy(*order)
    frame = w_ord.rowsBetween(Window.currentRow, _TS_M - 1)
    wins = (
        ev.withColumn("start_idx", (F.row_number().over(w_ord) - 1).cast("long"))
        .withColumn("wv", F.collect_list("v").over(frame))
        .filter(F.size("wv") == _TS_M)
    )
    # Bounded collect: the m-point query pattern (first m clicks).
    qv = [
        r.v
        for r in ev.filter(F.col("event_type") == _TS_QUERY_TYPE)
        .orderBy(*order)
        .limit(_TS_M)
        .collect()
    ]
    m = float(_TS_M)
    mq = sum(qv) / m  # sequential IEEE adds — same fold as the oracle
    sq_var = sum(x * x for x in qv) / m - mq * mq
    sq = max(sq_var, 0.0) ** 0.5
    q_arr = F.array(*[F.lit(x) for x in qv])
    dotm = (
        F.aggregate(
            F.zip_with("wv", q_arr, lambda x, y: x * y),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        / m
    )
    mw = F.aggregate("wv", F.lit(0.0), lambda a, x: a + x) / m
    sw2 = (
        F.aggregate(
            F.transform("wv", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
        / m
    )
    sw = F.sqrt(F.greatest(sw2 - mw * mw, F.lit(0.0)))
    rho = F.when(sw * F.lit(sq) == 0, F.lit(0.0)).otherwise(
        (dotm - mw * F.lit(mq)) / (sw * F.lit(sq))
    )
    dist = F.round(
        F.sqrt(F.greatest(F.lit(2.0 * m) * (1 - rho), F.lit(0.0))), 6
    )
    return (
        wins.select("event_type", "start_idx", dist.alias("dist"))
        .orderBy("dist", "event_type", "start_idx")
        .limit(_TS_K)
    )


_ANOM_WIN = 20  # trailing baseline width, in points
_ANOM_Z = 3.0  # |z| flag threshold

# Shared with the streaming twin: stream_ts_anomaly is pinned exactly equal
# to the batch operator (tests/test_components.py), so the same relational
# oracle verifies both.
ANOM_ORACLE = f"""
SELECT event_id, event_type, round(z, 6) AS zscore
FROM (
  SELECT event_id, event_type,
         (value - avg(value) OVER w) / NULLIF(stddev_samp(value) OVER w, 0) AS z,
         count(*) OVER w AS n_base
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN {_ANOM_WIN} PRECEDING AND 1 PRECEDING)
)
WHERE n_base >= {_ANOM_WIN} AND abs(z) > {_ANOM_Z}
"""


@register("ext_ts_anomaly", oracle=ANOM_ORACLE)
def ext_ts_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection per series: each point scores
    against the mean/stddev of its TRAILING {win}-point baseline (the
    point itself excluded — a spike must not dampen its own baseline),
    flagging |z| > {z}; warm-up points with short baselines are skipped.

    One partition-key shuffle serves both window aggregates (same frame,
    shared sort); per-row state is the fixed-width rolling frame, so the
    scan streams at any series length — the standard telemetry/quality
    anomaly gate in front of a training-data pipeline.  NULLIF guards
    constant baselines (stddev 0)."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-_ANOM_WIN, -1)
    )
    z = (F.col("value") - F.avg("value").over(w)) / F.nullif(
        F.stddev_samp("value").over(w), F.lit(0)
    )
    return (
        ev.select(
            "event_id",
            "event_type",
            z.alias("z"),
            F.count(F.lit(1)).over(w).alias("n_base"),
        )
        .filter((F.col("n_base") >= _ANOM_WIN) & (F.abs("z") > _ANOM_Z))
        .select("event_id", "event_type", F.round("z", 6).alias("zscore"))
    )


@register(
    "ext_ts_interp",
    oracle=f"""
WITH ev AS (
  SELECT event_type, time_bucket(INTERVAL 15 MINUTE, ts) AS slot, value
  FROM events
  WHERE ts >= TIMESTAMP '{_DAY_LO}' AND ts < TIMESTAMP '{_DAY_HI}'
),
observed AS (
  SELECT event_type, slot, avg(value) AS avg_value
  FROM ev GROUP BY event_type, slot
),
grid AS (
  SELECT t.event_type, g.slot
  FROM (SELECT DISTINCT event_type FROM ev) t
  CROSS JOIN (
    SELECT unnest(generate_series(TIMESTAMP '{_DAY_LO}',
                                  TIMESTAMP '{_LAST_SLOT}',
                                  INTERVAL 15 MINUTE)) AS slot
  ) g
),
nb AS (
  SELECT g.event_type, g.slot, o.avg_value,
         last_value(o.avg_value IGNORE NULLS) OVER wp AS prev_val,
         last_value(CASE WHEN o.avg_value IS NOT NULL THEN g.slot END
                    IGNORE NULLS) OVER wp AS prev_slot,
         first_value(o.avg_value IGNORE NULLS) OVER wf AS next_val,
         first_value(CASE WHEN o.avg_value IS NOT NULL THEN g.slot END
                     IGNORE NULLS) OVER wf AS next_slot
  FROM grid g LEFT JOIN observed o USING (event_type, slot)
  WINDOW wp AS (PARTITION BY g.event_type ORDER BY g.slot
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY g.event_type ORDER BY g.slot
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, slot,
       round(CASE
         WHEN avg_value IS NOT NULL THEN avg_value
         WHEN prev_val IS NOT NULL AND next_val IS NOT NULL THEN
           prev_val + (next_val - prev_val)
             * (epoch(slot) - epoch(prev_slot))
             / (epoch(next_slot) - epoch(prev_slot))
         ELSE coalesce(prev_val, next_val)
       END, 6) AS interp_value,
       (avg_value IS NULL) AS is_interpolated
FROM nb
ORDER BY event_type, slot
""",
)
def ext_ts_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap fill on the 15-minute slot grid: missing
    slots take the time-weighted blend of the nearest observed slot
    averages on either side (edges clamp to the single available
    neighbor) — the resampling step before any fixed-cadence model
    input, upgrading ``ext_gap_fill``'s step-function carry-forward.

    Two window passes over the SAME (key, slot-order) sort — Catalyst
    plans one exchange + one sort, the forward frame reuses them — and
    the grid is a generate per key, never a cartesian."""
    ev = (
        table(spark, sf_dir, "events")
        .filter(
            (F.col("ts") >= F.to_timestamp(F.lit(_DAY_LO)))
            & (F.col("ts") < F.to_timestamp(F.lit(_DAY_HI)))
        )
        .select(
            "event_type",
            F.timestamp_seconds(
                F.floor(F.unix_timestamp("ts") / _SLOT_SEC) * _SLOT_SEC
            ).alias("slot"),
            "value",
        )
    )
    observed = ev.groupBy("event_type", "slot").agg(
        F.avg("value").alias("avg_value")
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(
                F.sequence(
                    F.to_timestamp(F.lit(_DAY_LO)),
                    F.to_timestamp(F.lit(_LAST_SLOT)),
                    F.expr("INTERVAL 15 MINUTES"),
                )
            ).alias("slot"),
        )
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("slot")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_slot = F.when(F.col("avg_value").isNotNull(), F.col("slot"))
    nb = grid.join(observed, ["event_type", "slot"], "left").select(
        "event_type",
        "slot",
        "avg_value",
        F.last("avg_value", ignorenulls=True).over(wp).alias("prev_val"),
        F.last(obs_slot, ignorenulls=True).over(wp).alias("prev_slot"),
        F.first("avg_value", ignorenulls=True).over(wf).alias("next_val"),
        F.first(obs_slot, ignorenulls=True).over(wf).alias("next_slot"),
    )
    frac = (
        F.unix_timestamp("slot") - F.unix_timestamp("prev_slot")
    ) / (F.unix_timestamp("next_slot") - F.unix_timestamp("prev_slot"))
    interp = (
        F.when(F.col("avg_value").isNotNull(), F.col("avg_value"))
        .when(
            F.col("prev_val").isNotNull() & F.col("next_val").isNotNull(),
            F.col("prev_val") + (F.col("next_val") - F.col("prev_val")) * frac,
        )
        .otherwise(F.coalesce("prev_val", "next_val"))
    )
    return nb.select(
        "event_type",
        "slot",
        F.round(interp, 6).alias("interp_value"),
        F.col("avg_value").isNull().alias("is_interpolated"),
    ).orderBy("event_type", "slot")


_EWMA_ALPHA = 0.2   # decay: weight (1-alpha)^i on the i-th lag
_EWMA_K = 8         # bounded kernel length (current row + 7 lags)
# Identical double literals on both engines: the weights are computed
# ONCE here and spliced verbatim into the Spark expression and the
# DuckDB oracle, so both sides run the same IEEE constants in the same
# left-associated order and round() agrees bit-for-bit.
_EWMA_W = [(1.0 - _EWMA_ALPHA) ** i for i in range(_EWMA_K)]


def _ewma_oracle() -> str:
    num = " + ".join(
        f"coalesce(lag(value, {i}) OVER w * {w!r}, 0.0)"
        for i, w in enumerate(_EWMA_W)
    )
    den = " + ".join(
        f"CASE WHEN lag(value, {i}) OVER w IS NOT NULL THEN {w!r} ELSE 0.0 END"
        for i, w in enumerate(_EWMA_W)
    )
    return f"""
SELECT event_id, event_type, round(({num}) / ({den}), 6) AS ewma
FROM events
WHERE value IS NOT NULL
WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
"""


@register("ext_ts_ewma", oracle=_ewma_oracle())
def ext_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per series — the standard
    telemetry smoother — with a BOUNDED 8-lag kernel, weights
    ``(1-alpha)^i`` renormalized over the lags actually present (series
    warm-up rows average over what exists instead of emitting NULL).

    The kernel is deliberately finite: the textbook recursive EWMA
    ``e_t = a*x_t + (1-a)*e_{t-1}`` is a sequential fold — on any
    engine that means a per-series serial scan, and declaratively it
    needs ``(1-a)^(-t)`` rescaling that overflows on long series.  The
    8-term kernel captures >83% of the recursive form's mass (1-0.8^8)
    and becomes a pure projection over ROWS-frame lags: one
    partition-key shuffle for the shared window sort, then
    whole-stage-codegen'd arithmetic — same scale shape as
    ``ext_ts_anomaly``'s rolling frame, state bounded at 8 values per
    row regardless of series length.  The weight doubles are spliced
    verbatim into BOTH engines' expressions (same constants, same
    left-associated order), so the rounded outputs agree exactly."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy(F.asc("ts"), F.asc("event_id"))
    lags = [F.lag("value", i).over(w) for i in range(_EWMA_K)]
    num = None
    den = None
    for lg, wt in zip(lags, _EWMA_W):
        term = F.coalesce(lg * F.lit(wt), F.lit(0.0))
        mask = F.when(lg.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = mask if den is None else den + mask
    return ev.select(
        "event_id",
        "event_type",
        F.round(num / den, 6).alias("ewma"),
    )


# Robust-outlier constants: the classic modified-z gate (Iglewicz &
# Hoaglin), 0.6745 = Phi^-1(0.75) so MAD estimates sigma under normality.
_MAD_K = 0.6745
_MAD_Z = 3.5


@register(
    "ext_outlier_mad",
    oracle=f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type
)
SELECT e.event_id, e.event_type,
       round({_MAD_K} * (e.value - m.med) / d.mad, 6) AS robust_z
FROM events e
JOIN med m USING (event_type)
JOIN mad d USING (event_type)
WHERE d.mad > 0
  AND abs({_MAD_K} * (e.value - m.med) / d.mad) > {_MAD_Z}
""",
)
def ext_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROBUST outlier detection per group: the modified z-score
    ``0.6745 * (v - median) / MAD`` with the classic 3.5 gate — the
    quality-filter companion to ``ext_ts_anomaly``'s rolling mean/std
    z-score.  Mean and stddev are themselves dragged by the outliers
    they hunt (masking); median and median-absolute-deviation have a
    50% breakdown point, which is why data-quality cuts on heavy-tailed
    corpus statistics (document lengths, perplexities) use MAD.

    Execution: two exact-percentile aggregates over the same grouping
    (median, then MAD of residuals against the BROADCAST medians), then
    one broadcast join back onto the stream — the corpus shuffles once
    per aggregate on the group key and the per-group state is the
    interpolation multiset (bounded groups here; the GK-sketch variant
    in ``agg_approx_quantile`` is the unbounded-cardinality path).
    Spark ``percentile`` and DuckDB ``quantile_cont`` share exact
    interpolation semantics, so the oracle replays verbatim."""
    ev = table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(F.percentile(F.abs(F.col("value") - F.col("med")), 0.5).alias("mad"))
    )
    z = F.lit(_MAD_K) * (F.col("value") - F.col("med")) / F.col("mad")
    return (
        ev.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .filter((F.col("mad") > 0) & (F.abs(z) > _MAD_Z))
        .select("event_id", "event_type", F.round(z, 6).alias("robust_z"))
    )


_DECAY_HALF_DAYS = 30.0  # decay scale (days) — SEMANTIC constant


@register(
    "agg_decay",
    oracle=f"""
WITH mx AS (SELECT max(ts) AS m FROM events)
SELECT event_type,
       round(sum(value * exp(-(epoch_us(m) - epoch_us(ts))
                             / 86400.0e6 / {_DECAY_HALF_DAYS})), 4)
         AS decayed_sum,
       count(*) AS n_events
FROM events, mx
GROUP BY event_type
""",
)
def agg_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-DECAYED aggregation: each observation's weight decays
    exponentially with its age against the corpus horizon
    (``exp(-age_days / 30)``) — the recency-weighted rollup behind
    trend scores and freshness-weighted quality metrics, computed
    WITHOUT a window: the horizon is a 1-row broadcast aggregate and
    the decay is a plain codegen expression inside one grouped
    aggregate (map-side partial sums), so the whole operator is one
    shuffle of (type, partial sum) pairs at any scale.

    Ages are integer microseconds (``unix_micros``, exact on both
    engines) before the double division; the 4-decimal round masks
    engine libm/summation-order ulp differences, same stance as
    ``fn_haversine``."""
    ev = table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("m"))
    age_days = (
        (F.unix_micros("m") - F.unix_micros("ts")) / 86400.0e6
    )
    return (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("event_type")
        .agg(
            F.round(
                F.sum(F.col("value") * F.exp(-age_days / _DECAY_HALF_DAYS)), 4
            ).alias("decayed_sum"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


_MED_WIN = 20  # trailing window width (rows) — SEMANTIC constant


@register(
    "ext_ts_median_smooth",
    oracle=f"""
SELECT event_id, event_type,
       round(quantile_cont(value, 0.5) OVER (
         PARTITION BY event_type ORDER BY ts, event_id
         ROWS BETWEEN {_MED_WIN - 1} PRECEDING AND CURRENT ROW), 6)
         AS median_smooth
FROM events
""",
)
def ext_ts_median_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING-MEDIAN smoothing per series: the robust companion to
    ``ext_ts_ewma`` (mean-based kernels chase the spikes a median
    ignores — median filtering is the standard despiking pass before
    gradient/anomaly analysis on sensor feeds like the reference's
    slot series).  Exact interpolated percentile over a trailing
    20-row frame; Spark ``percentile`` and DuckDB ``quantile_cont``
    share interpolation semantics, so the oracle replays verbatim.

    One partition-key exchange + one sort; the frame state is the
    20-value multiset per position — constant memory per series
    regardless of stream length."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_MED_WIN - 1), Window.currentRow)
    )
    return ev.select(
        "event_id",
        "event_type",
        F.round(F.percentile("value", 0.5).over(w), 6).alias("median_smooth"),
    )


@register(
    "ext_ts_seasonal",
    oracle="""
WITH hourly AS (
  SELECT event_type,
         CAST(hour(ts) AS BIGINT) AS hh,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv_cents
  FROM events
  GROUP BY 1, 2
), gl AS (
  SELECT event_type,
         CAST(sum(n_events) AS BIGINT) AS ng,
         CAST(sum(sv_cents) AS BIGINT) AS svg_cents
  FROM hourly GROUP BY 1
)
SELECT h.event_type, h.hh, h.n_events,
       floor(((CAST(h.sv_cents AS DOUBLE) / 100.0) / h.n_events) * 10000 + 0.5) / 10000.0 AS seasonal_mean,
       floor((((CAST(h.sv_cents AS DOUBLE) / 100.0) / h.n_events)
             / ((CAST(g.svg_cents AS DOUBLE) / 100.0) / g.ng)) * 10000 + 0.5) / 10000.0 AS seasonal_idx
FROM hourly h JOIN gl g ON h.event_type = g.event_type
""",
)
def ext_ts_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEASONAL PROFILE extraction (the seasonal component of a classic
    decomposition at hour-of-day grain): per (event_type, hour) mean
    value plus the seasonal INDEX — that hour's mean relative to the
    series' global mean (index 1.0 = no seasonality; load curves, diurnal
    traffic, cron-spike detection all read straight off it).  Companion
    to ``ext_ts_ewma`` (trend) and ``ext_ts_anomaly`` (residual): this is
    the S in an STL-style S+T+R split, re-expressed relationally.

    Scale shape: ONE map-side-combined aggregate over the events table
    to |types|x24 rows; the per-type global mean derives from that
    SAME aggregate (no second corpus scan) and broadcasts back onto the
    120-row profile.  Hour extraction runs in UTC (catalog._prepare pins
    the session timezone), so the profile is timezone-stable."""
    events = table(spark, sf_dir, "events")
    # Sums accumulate EXACT integer cents (round(value*100) per row), not
    # raw doubles: a float sum's value depends on partial-aggregation
    # order, and one boundary cell (x.xxxx5) rounded differently across
    # engines in testing.  One double division at the end is
    # order-independent.
    hourly = events.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hh")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("sv_cents"),
    )
    glob = hourly.groupBy("event_type").agg(
        F.sum("n_events").cast("long").alias("ng"),
        F.sum("sv_cents").cast("long").alias("svg_cents"),
    )
    mean = (F.col("sv_cents").cast("double") / 100.0) / F.col("n_events")
    gmean = (F.col("svg_cents").cast("double") / 100.0) / F.col("ng")

    def r4(x):
        # floor(x*1e4 + 0.5): explicit HALF-UP on the identical double in
        # both engines — round() tie semantics differ across engines at
        # exact .00005 midpoints (hit in testing: 68.92875)
        return F.floor(x * 10000 + 0.5) / 10000.0

    return (
        hourly.join(F.broadcast(glob), "event_type")
        .select(
            "event_type",
            "hh",
            "n_events",
            r4(mean).alias("seasonal_mean"),
            r4(mean / gmean).alias("seasonal_idx"),
        )
    )


@register(
    "ext_ts_changepoint",
    oracle="""
WITH seq AS (
  SELECT event_type, ts,
         CAST(row_number() OVER w AS BIGINT) AS rn,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rs_cents
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), tot AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv_cents
  FROM events GROUP BY 1
), scored AS (
  SELECT s.event_type, s.ts, s.rn, t.n,
         abs(CAST(s.rs_cents AS DOUBLE)
             - s.rn * (CAST(t.sv_cents AS DOUBLE) / t.n)) AS dev_cents
  FROM seq s JOIN tot t ON s.event_type = t.event_type
)
SELECT event_type, n, rn AS cp_rn, ts AS cp_ts,
       floor((dev_cents / 100.0) * 10000 + 0.5) / 10000.0 AS max_dev
FROM (
  SELECT *,
         row_number() OVER (
           PARTITION BY event_type ORDER BY dev_cents DESC, rn) AS pick
  FROM scored
)
WHERE pick = 1
""",
)
def ext_ts_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per series: the cumulative sum of
    deviations from the series mean, S_i = sum(x_j - mean), peaks in
    magnitude AT the change point (Page 1954; the standard
    mean-shift detector).  Returns each series' argmax |S_i| — its
    position, timestamp, and deviation magnitude.

    Determinism discipline: the running sum accumulates EXACT integer
    cents in the (ts, event_id) window order, the mean enters once as
    n * (sv/n) subtracted at the end, and the output rounds half-up
    explicitly — so both engines walk identical doubles and the argmax
    (smallest-rn tiebreak) is hash-stable.

    Scale shape: ONE exchange on event_type serves both the running
    window and the argmax window; per-series totals come from a
    broadcast |types|-row aggregate.  Series order is a per-partition
    sort — no global sort exists."""
    events = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = events.select(
        "event_type",
        "ts",
        F.row_number().over(w).cast("long").alias("rn"),
        F.sum(cents)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("rs_cents"),
    )
    tot = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(cents).cast("long").alias("sv_cents"),
    )
    scored = seq.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "ts",
        "rn",
        "n",
        F.abs(
            F.col("rs_cents").cast("double")
            - F.col("rn") * (F.col("sv_cents").cast("double") / F.col("n"))
        ).alias("dev_cents"),
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.desc("dev_cents"), F.asc("rn")
    )
    return (
        scored.withColumn("pick", F.row_number().over(pick))
        .filter(F.col("pick") == 1)
        .select(
            "event_type",
            "n",
            F.col("rn").alias("cp_rn"),
            F.col("ts").alias("cp_ts"),
            (
                F.floor((F.col("dev_cents") / 100.0) * 10000 + 0.5) / 10000.0
            ).alias("max_dev"),
        )
    )


_TRAJ_QUERY_USER = 7
_TRAJ_DECIM = 8       # keep every 8th track point (deterministic decimation)
_TRAJ_TOP_K = 10


@register(
    "ext_trajectory_hausdorff",
    oracle=f"""
WITH pts AS (
  SELECT user_id,
         CAST(row_number() OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn,
         (value * 1.3) % 50.0 AS px,
         (value * 2.7 + user_id) % 50.0 AS py
  FROM events
), track AS (
  SELECT user_id, rn / {_TRAJ_DECIM} AS idx, px, py
  FROM pts WHERE rn % {_TRAJ_DECIM} = 0
), q AS (
  SELECT idx AS q_idx, px AS qx, py AS qy FROM track
  WHERE user_id = {_TRAJ_QUERY_USER}
), d AS (
  SELECT t.user_id, t.idx, q.q_idx,
         (t.px - q.qx) * (t.px - q.qx) + (t.py - q.qy) * (t.py - q.qy) AS d2
  FROM track t CROSS JOIN q
  WHERE t.user_id <> {_TRAJ_QUERY_USER}
), fwd AS (
  SELECT user_id, max(mind) AS h1 FROM (
    SELECT user_id, idx, min(d2) AS mind FROM d GROUP BY 1, 2) GROUP BY 1
), bwd AS (
  SELECT user_id, max(mind) AS h2 FROM (
    SELECT user_id, q_idx, min(d2) AS mind FROM d GROUP BY 1, 2) GROUP BY 1
)
SELECT f.user_id,
       floor(sqrt(greatest(f.h1, b.h2)) * 10000 + 0.5) / 10000.0 AS hausdorff
FROM fwd f JOIN bwd b ON f.user_id = b.user_id
ORDER BY floor(sqrt(greatest(f.h1, b.h2)) * 10000 + 0.5) / 10000.0, f.user_id
LIMIT {_TRAJ_TOP_K}
""",
)
def ext_trajectory_hausdorff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAJECTORY similarity search: top-k users whose movement track is
    closest to a query user's track under the symmetric HAUSDORFF
    distance (max over points of nearest-neighbor distance, both
    directions) — the spatial-track analog of ``ext_ts_subseq_search``
    (REPOSE, ICDE 2021, solves the same shape with reference-point
    tries; the relational form is a bounded candidate cross-product).

    Scale controls: tracks are DECIMATED deterministically (every
    {decim}-th point in (ts, event_id) order — identical in both
    engines), the query track is a broadcast side, and BOTH Hausdorff
    directions fall out of ONE distance-pair table grouped two ways —
    no second pass.  Distances stay SQUARED until the final sqrt, so
    min/max comparisons are exact.  At 100 TB the decimation factor and
    a coarse-cell prefilter (the fn_geohash bucketing) bound the pair
    table; the per-user group is track-length-sized, never corpus-sized.
    """
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pts = events.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("rn"),
        ((F.col("value") * 1.3) % 50.0).alias("px"),
        ((F.col("value") * 2.7 + F.col("user_id")) % 50.0).alias("py"),
    )
    track = pts.filter(F.col("rn") % _TRAJ_DECIM == 0).select(
        "user_id", (F.col("rn") / _TRAJ_DECIM).alias("idx"), "px", "py"
    )
    q = (
        track.filter(F.col("user_id") == _TRAJ_QUERY_USER)
        .select(
            F.col("idx").alias("q_idx"),
            F.col("px").alias("qx"),
            F.col("py").alias("qy"),
        )
    )
    d = (
        track.filter(F.col("user_id") != _TRAJ_QUERY_USER)
        .crossJoin(F.broadcast(q))
        .select(
            "user_id",
            "idx",
            "q_idx",
            (
                (F.col("px") - F.col("qx")) * (F.col("px") - F.col("qx"))
                + (F.col("py") - F.col("qy")) * (F.col("py") - F.col("qy"))
            ).alias("d2"),
        )
    )
    fwd = (
        d.groupBy("user_id", "idx")
        .agg(F.min("d2").alias("mind"))
        .groupBy("user_id")
        .agg(F.max("mind").alias("h1"))
    )
    bwd = (
        d.groupBy("user_id", "q_idx")
        .agg(F.min("d2").alias("mind"))
        .groupBy("user_id")
        .agg(F.max("mind").alias("h2"))
    )
    h = F.floor(F.sqrt(F.greatest("h1", "h2")) * 10000 + 0.5) / 10000.0
    return (
        # Both sides are |users|-sized (unbounded at scale) and already
        # partitioned by user_id from their groupBys — no broadcast hint;
        # AQE may still pick one when the measured size is small.
        fwd.join(bwd, "user_id")
        .select("user_id", h.alias("hausdorff"))
        .orderBy("hausdorff", "user_id")
        .limit(_TRAJ_TOP_K)
    )


ext_trajectory_hausdorff.__doc__ = ext_trajectory_hausdorff.__doc__.format(
    decim=_TRAJ_DECIM
)


_DTW_QUERY_USER = 7
_DTW_DECIM = 8      # every 8th point, capped — keeps the DP band bounded
_DTW_MAX_RN = 512   # ≤ 64 points per series after decimation
_DTW_TOP_K = 10


def _dtw_series(spark: SparkSession, sf_dir: str):
    """Deterministically decimated per-user value series (cents)."""
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            "user_id",
            F.row_number().over(w).cast("long").alias("rn"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .filter((F.col("rn") % _DTW_DECIM == 0) & (F.col("rn") <= _DTW_MAX_RN))
    )


@register(
    "ext_ts_dtw",
    # VERDICT r13 task 5 follow-through (round 14): formerly rows-only,
    # now DuckDB-oracled.  The same-row sequential dependency cur[j-1]
    # that blocks a window/prefix-max form IS expressible as a LIST FOLD:
    # list_reduce's 2-arg form seeds the accumulator with the first
    # element ([1e18] = the cur[0]=INF boundary) and appends
    # cost + least(prev[j+1], prev[j], acc[last]) per j — the exact
    # Sakoe-Chiba recurrence — inside a recursive CTE over i carrying the
    # DP row as a list (the ext_rouge_l recursion shape).  Independent
    # nested-loop parity stays pinned in tests.
    oracle=f"""
WITH RECURSIVE decim AS (
  SELECT user_id, rn, CAST(round(value * 100) AS BIGINT) AS cents
  FROM (SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events)
  WHERE rn % {_DTW_DECIM} = 0 AND rn <= {_DTW_MAX_RN}
), q AS (
  SELECT list(cents ORDER BY rn) AS qv FROM decim WHERE user_id = {_DTW_QUERY_USER}
), cand AS (
  SELECT user_id, list(cents ORDER BY rn) AS sv
  FROM decim WHERE user_id <> {_DTW_QUERY_USER} GROUP BY 1
), dims AS (
  SELECT user_id, sv, qv, len(qv) AS m, len(sv) AS n FROM cand, q
), dp AS (
  SELECT user_id, sv, qv, m, n, 0 AS i,
         list_concat([CAST(0 AS DOUBLE)],
                     list_transform(generate_series(1, n), x -> 1e18)) AS row
  FROM dims
  UNION ALL
  SELECT user_id, sv, qv, m, n, i + 1,
         list_reduce(
           list_concat([[CAST(1e18 AS DOUBLE)]],
                       list_transform(generate_series(1, n),
                                      j -> [CAST(j AS DOUBLE)])),
           (acc, x) -> list_append(acc,
             abs(CAST(qv[i + 1] AS DOUBLE) - sv[CAST(x[1] AS INT)])
             + least(row[CAST(x[1] AS INT) + 1],
                     row[CAST(x[1] AS INT)],
                     acc[len(acc)]))
         ) AS row
  FROM dp WHERE i < m
)
SELECT user_id, CAST(n AS BIGINT) AS n_pts,
       floor(row[n + 1] * 100 + 0.5) / 100.0 AS dtw
FROM dp WHERE i = m
ORDER BY dtw, user_id LIMIT {_DTW_TOP_K}
""",
)
def ext_ts_dtw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC TIME WARPING similarity search: top-k users whose value
    series is closest to the query user's under DTW — the
    elastic-alignment distance Euclidean/Hausdorff cannot express
    (shifted-in-time but same-shape series match; the classic
    time-series-mining primitive, Sakoe & Chiba 1978).  Completes the
    TS battery: subsequence search (``ext_ts_subseq_search``) is
    rigid-alignment, trajectory Hausdorff is order-free, DTW is
    order-aware-elastic.

    DuckDB-ORACLED since round 14: the O(mn) DP recurrence
    dp[i][j] = c + min(dp[i-1][j], dp[i][j-1], dp[i-1][j-1]) carries a
    same-row sequential dependency no window/prefix form expresses, but
    a LIST FOLD does — the oracle's recursive CTE carries the DP row
    and folds each row left-to-right with ``list_reduce``, so the hash
    gate now checks every candidate's distance; the INDEPENDENT
    nested-loop reimplementation stays pinned in tests (exact equality
    — the DP over integer-cent costs is deterministic).

    Scale shape: series are decimated deterministically to ≤64 points
    (the DP is quadratic in series length — the decimation factor IS
    the cost dial, same discipline as ext_trajectory_hausdorff), the
    query series broadcasts via closure, and each user's DP runs inside
    one ``applyInPandas`` group — embarrassingly parallel across users,
    no shuffle beyond the one user_id exchange."""
    import numpy as np
    import pandas as pd

    series = _dtw_series(spark, sf_dir)
    q_rows = sorted(
        (r.rn, r.cents)
        for r in series.filter(F.col("user_id") == _DTW_QUERY_USER).collect()
    )
    q = np.array([c for _, c in q_rows], dtype=np.float64)

    def dtw_group(pdf: pd.DataFrame) -> pd.DataFrame:
        uid = int(pdf["user_id"].iloc[0])
        s = pdf.sort_values("rn")["cents"].to_numpy(dtype=np.float64)
        m, n = len(q), len(s)
        if m == 0 or n == 0:
            return pd.DataFrame(
                {"user_id": [uid], "n_pts": [n], "dtw": [float("inf")]}
            )
        INF = float("inf")
        prev = np.full(n + 1, INF)
        prev[0] = 0.0
        for i in range(1, m + 1):
            cur = np.full(n + 1, INF)
            cost = np.abs(q[i - 1] - s)  # vectorized |q_i - s_j| row
            for j in range(1, n + 1):
                cur[j] = cost[j - 1] + min(prev[j], prev[j - 1], cur[j - 1])
            prev = cur
        return pd.DataFrame({"user_id": [uid], "n_pts": [n], "dtw": [prev[n]]})

    out = (
        series.filter(F.col("user_id") != _DTW_QUERY_USER)
        .groupBy("user_id")
        .applyInPandas(dtw_group, schema="user_id long, n_pts long, dtw double")
    )
    return (
        out.select(
            "user_id",
            "n_pts",
            (F.floor(F.col("dtw") * 100 + 0.5) / 100.0).alias("dtw"),
        )
        .orderBy("dtw", "user_id")
        .limit(_DTW_TOP_K)
    )


@register(
    "win_control_chart",
    oracle="""
WITH seq AS (
  SELECT event_type,
         CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(abs(CAST(round(value * 100) AS BIGINT)
              - lag(CAST(round(value * 100) AS BIGINT)) OVER w) AS BIGINT) AS mr
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), stats AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS sv,
         CAST(sum(mr) AS BIGINT) AS smr,
         CAST(count(mr) AS BIGINT) AS nmr
  FROM seq GROUP BY 1
)
SELECT s.event_type, s.n,
       floor(((CAST(s.sv AS DOUBLE) / s.n) / 100.0) * 10000 + 0.5) / 10000.0 AS center,
       floor((((CAST(s.sv AS DOUBLE) / s.n)
               + 2.66 * (CAST(s.smr AS DOUBLE) / s.nmr)) / 100.0) * 10000 + 0.5)
         / 10000.0 AS ucl,
       floor((((CAST(s.sv AS DOUBLE) / s.n)
               - 2.66 * (CAST(s.smr AS DOUBLE) / s.nmr)) / 100.0) * 10000 + 0.5)
         / 10000.0 AS lcl,
       CAST((SELECT sum(CASE WHEN q.cents > (CAST(s.sv AS DOUBLE) / s.n)
                                + 2.66 * (CAST(s.smr AS DOUBLE) / s.nmr)
                          OR q.cents < (CAST(s.sv AS DOUBLE) / s.n)
                                - 2.66 * (CAST(s.smr AS DOUBLE) / s.nmr)
                    THEN 1 ELSE 0 END)
             FROM seq q WHERE q.event_type = s.event_type) AS BIGINT) AS n_out_of_control
FROM stats s
""",
)
def win_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XmR CONTROL CHART (individuals + moving range, the SPC staple):
    per series, center line = mean, control limits = mean ± 2.66 × mean
    moving range (the Shewhart constant for n=2 subgroups), and the
    out-of-control point count — the monitoring view that separates
    common-cause noise from assignable shifts, complementing
    ``ext_ts_changepoint`` (where) and ``stream_drift_monitor`` (when).

    One (ts, event_id)-ordered lag window per series computes the
    moving ranges; ONE aggregate yields mean and mean-MR; the
    out-of-control scoring joins the |types|-row limits back as a
    broadcast.  Exact integer cents throughout; explicit half-up
    rounding."""
    events = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = events.select(
        "event_type",
        cents.alias("cents"),
        F.abs(cents - F.lag(cents).over(w)).cast("long").alias("mr"),
    )
    stats = seq.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("sv"),
        F.sum("mr").cast("long").alias("smr"),
        F.count("mr").cast("long").alias("nmr"),
    )
    mean_c = F.col("sv").cast("double") / F.col("n")
    mr_bar = F.col("smr").cast("double") / F.col("nmr")
    ucl_c = mean_c + 2.66 * mr_bar
    lcl_c = mean_c - 2.66 * mr_bar
    flagged = (
        seq.join(F.broadcast(stats), "event_type")
        .filter((F.col("cents") > ucl_c) | (F.col("cents") < lcl_c))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_out_of_control"))
    )

    def r4(x):
        return F.floor(x * 10000 + 0.5) / 10000.0

    return (
        stats.join(flagged, "event_type", "left")
        .select(
            "event_type",
            "n",
            r4(mean_c / 100.0).alias("center"),
            r4(ucl_c / 100.0).alias("ucl"),
            r4(lcl_c / 100.0).alias("lcl"),
            F.coalesce(F.col("n_out_of_control"), F.lit(0))
            .cast("long")
            .alias("n_out_of_control"),
        )
    )


@register(
    "ext_seasonality_strength",
    oracle="""
WITH hourly AS (
  SELECT event_type,
         CAST(hour(ts) AS BIGINT) AS hh,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS nt,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS svt,
         CAST(sum(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS ssqt
  FROM events GROUP BY 1
), comp AS (
  SELECT h.event_type,
         sum(h.n * ((CAST(h.sv AS DOUBLE) / h.n) - (CAST(t.svt AS DOUBLE) / t.nt))
                 * ((CAST(h.sv AS DOUBLE) / h.n) - (CAST(t.svt AS DOUBLE) / t.nt))) AS ss_between,
         min(CAST(t.ssqt AS DOUBLE)
             - t.nt * ((CAST(t.svt AS DOUBLE) / t.nt)
                       * (CAST(t.svt AS DOUBLE) / t.nt))) AS ss_total
  FROM hourly h JOIN tot t ON h.event_type = t.event_type
  GROUP BY h.event_type
)
SELECT event_type,
       floor((ss_between / ss_total) * 1000000 + 0.5) / 1000000.0 AS strength
FROM comp
""",
)
def ext_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEASONALITY STRENGTH per series: the fraction of total variance
    explained by the hour-of-day profile (the eta-squared / ANOVA
    between-group share; ~0 = no diurnal pattern, →1 = the clock IS the
    signal) — the one-number summary of ``ext_ts_seasonal``'s full
    profile, the screen that decides whether seasonal adjustment is
    worth running at all.

    Float discipline: between-group and total sums of squares both
    derive from EXACT integer cent sums (hourly sv, global sv/ssq);
    the per-term double arithmetic is identical order in both engines.
    The hourly sum-of-squares join runs at |types|x24 grain."""
    events = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    hourly = events.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hh")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(cents).cast("long").alias("sv"),
    )
    tot = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("nt"),
        F.sum(cents).cast("long").alias("svt"),
        F.sum(cents * cents).cast("long").alias("ssqt"),
    )
    gmean = F.col("svt").cast("double") / F.col("nt")
    hmean = F.col("sv").cast("double") / F.col("n")
    joined = hourly.join(F.broadcast(tot), "event_type")
    comp = joined.groupBy("event_type").agg(
        F.sum(F.col("n") * (hmean - gmean) * (hmean - gmean)).alias("ss_between"),
        F.min(
            F.col("ssqt").cast("double") - F.col("nt") * (gmean * gmean)
        ).alias("ss_total"),
    )
    return comp.select(
        "event_type",
        (
            F.floor((F.col("ss_between") / F.col("ss_total")) * 1000000 + 0.5)
            / 1000000.0
        ).alias("strength"),
    )


_MA_FAST = 5
_MA_SLOW = 20


@register(
    "win_ma_crossover",
    oracle=f"""
WITH seq AS (
  SELECT event_type, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(row_number() OVER w AS BIGINT) AS rn
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), ma AS (
  SELECT event_type, rn,
         CAST(sum(cents) OVER (PARTITION BY event_type ORDER BY rn
              ROWS BETWEEN {_MA_FAST - 1} PRECEDING AND CURRENT ROW) AS DOUBLE)
           / {_MA_FAST}.0 AS fast,
         CAST(sum(cents) OVER (PARTITION BY event_type ORDER BY rn
              ROWS BETWEEN {_MA_SLOW - 1} PRECEDING AND CURRENT ROW) AS DOUBLE)
           / {_MA_SLOW}.0 AS slow
  FROM seq
), sig AS (
  SELECT event_type, rn,
         CASE WHEN fast > slow THEN 1 ELSE 0 END AS above,
         lag(CASE WHEN fast > slow THEN 1 ELSE 0 END) OVER (
           PARTITION BY event_type ORDER BY rn) AS prev_above
  FROM ma WHERE rn >= {_MA_SLOW}
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_signals,
       CAST(sum(CASE WHEN above = 1 AND prev_above = 0 THEN 1 ELSE 0 END) AS BIGINT) AS golden_crosses,
       CAST(sum(CASE WHEN above = 0 AND prev_above = 1 THEN 1 ELSE 0 END) AS BIGINT) AS death_crosses,
       CAST(max(CASE WHEN (above = 1 AND prev_above = 0)
                       OR (above = 0 AND prev_above = 1) THEN rn END) AS BIGINT) AS last_cross_rn
FROM sig WHERE prev_above IS NOT NULL
GROUP BY 1
""",
)
def win_ma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOVING-AVERAGE CROSSOVER detection (fast {f} / slow {s} — the
    golden/death cross of technical analysis, equally the classic
    regime-shift trigger for any KPI stream): count the sign changes of
    fast-vs-slow and the last crossover position per series.

    The rolling means are EXACT: integer-cent window sums divided by
    constant window lengths — identical doubles both engines, so the
    crossing booleans are bit-stable (no epsilon-at-the-crossing
    hazard).  Rows before the slow window fills are excluded — partial
    windows produce phantom crossings.  One (ts, event_id) exchange
    serves ranks, both rolling sums, and the lag."""
    events = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = events.select(
        "event_type",
        cents.alias("cents"),
        F.row_number().over(w).cast("long").alias("rn"),
    )
    wr = Window.partitionBy("event_type").orderBy("rn")
    fast = (
        F.sum("cents").over(wr.rowsBetween(-(_MA_FAST - 1), 0)).cast("double")
        / float(_MA_FAST)
    )
    slow = (
        F.sum("cents").over(wr.rowsBetween(-(_MA_SLOW - 1), 0)).cast("double")
        / float(_MA_SLOW)
    )
    ma = seq.select(
        "event_type", "rn", fast.alias("fast"), slow.alias("slow")
    ).filter(F.col("rn") >= _MA_SLOW)
    above = F.when(F.col("fast") > F.col("slow"), 1).otherwise(0)
    sig = ma.select(
        "event_type",
        "rn",
        above.alias("above"),
        F.lag(above).over(wr).alias("prev_above"),
    ).filter(F.col("prev_above").isNotNull())
    golden = (F.col("above") == 1) & (F.col("prev_above") == 0)
    death = (F.col("above") == 0) & (F.col("prev_above") == 1)
    return sig.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_signals"),
        F.sum(F.when(golden, 1).otherwise(0)).cast("long").alias("golden_crosses"),
        F.sum(F.when(death, 1).otherwise(0)).cast("long").alias("death_crosses"),
        F.max(F.when(golden | death, F.col("rn"))).cast("long").alias("last_cross_rn"),
    )


win_ma_crossover.__doc__ = win_ma_crossover.__doc__.format(
    f=_MA_FAST, s=_MA_SLOW
)


@register(
    "agg_runs_test",
    oracle="""
WITH tot AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS nt,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS svt
  FROM events GROUP BY 1
), seq AS (
  SELECT e.event_type,
         CASE WHEN CAST(round(e.value * 100) AS BIGINT) * t.nt > t.svt
              THEN 1 ELSE 0 END AS sgn,
         row_number() OVER (PARTITION BY e.event_type ORDER BY e.ts, e.event_id) AS rn
  FROM events e JOIN tot t ON e.event_type = t.event_type
), runs AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(sgn) AS BIGINT) AS n_pos,
         CAST(sum(CASE WHEN prev IS NULL OR sgn <> prev THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
  FROM (SELECT event_type, sgn,
               lag(sgn) OVER (PARTITION BY event_type ORDER BY rn) AS prev
        FROM seq)
  GROUP BY 1
)
SELECT event_type, n, n_pos, n_runs,
       floor(((CAST(n_runs AS DOUBLE)
               - (2.0 * n_pos * (n - n_pos) / n + 1))
              / sqrt(2.0 * n_pos * (n - n_pos)
                     * (2.0 * n_pos * (n - n_pos) - n)
                     / (CAST(n AS DOUBLE) * n * (n - 1)))) * 10000 + 0.5)
         / 10000.0 AS z_stat
FROM runs
""",
)
def agg_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WALD-WOLFOWITZ RUNS TEST per series: is the above/below-mean sign
    sequence random, trending (too few runs), or oscillating (too
    many)?  The classic residual-randomness check run AFTER a model or
    seasonal adjustment — ``ext_ts_changepoint`` finds where structure
    is, this says whether structure remains at all.

    Determinism discipline: the above-mean comparison is INTEGER-EXACT
    (cents·n > sum — no division, no float), signs and run counts are
    exact ints, and the z statistic is one double formula from them,
    half-up rounded."""
    events = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    tot = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("nt"),
        F.sum(cents).cast("long").alias("svt"),
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    # integer-exact above-mean test: cents > svt/nt  <=>  cents*nt > svt
    seq = (
        events.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            F.when(cents * F.col("nt") > F.col("svt"), 1)
            .otherwise(0)
            .alias("sgn"),
            F.row_number().over(w).alias("rn"),
        )
    )
    w2 = Window.partitionBy("event_type").orderBy("rn")
    runs = (
        seq.select(
            "event_type", "sgn", F.lag("sgn").over(w2).alias("prev")
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("sgn").cast("long").alias("n_pos"),
            F.sum(
                F.when(
                    F.col("prev").isNull() | (F.col("sgn") != F.col("prev")), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_runs"),
        )
    )
    n = F.col("n").cast("double")
    npos = F.col("n_pos").cast("double")
    nneg = n - npos
    exp_runs = 2.0 * npos * nneg / n + 1
    var_runs = (
        2.0 * npos * nneg * (2.0 * npos * nneg - n) / (n * n * (n - 1))
    )
    z = (F.col("n_runs") - exp_runs) / F.sqrt(var_runs)
    return runs.select(
        "event_type",
        "n",
        "n_pos",
        "n_runs",
        (F.floor(z * 10000 + 0.5) / 10000.0).alias("z_stat"),
    )


_ACF_LAGS = 3


@register(
    "ext_ts_acf",
    oracle=f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), s AS (
  SELECT event_type, x,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY hr) AS BIGINT) AS t
  FROM hourly
), m AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS q
  FROM s GROUP BY 1
), p AS (
  SELECT a.event_type, lag.k,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(a.x * b.x) AS BIGINT) AS pk,
         CAST(sum(a.x) AS BIGINT) AS ak,
         CAST(sum(b.x) AS BIGINT) AS bk
  FROM s a
  JOIN (SELECT unnest(generate_series(1, {_ACF_LAGS})) AS k) lag ON TRUE
  JOIN s b ON b.event_type = a.event_type AND b.t = a.t - lag.k
  GROUP BY 1, 2
)
SELECT p.event_type, CAST(p.k AS BIGINT) AS lag, m.n,
       floor(((CAST(pk AS DOUBLE)
               - (CAST(sx AS DOUBLE) / n) * (CAST(ak AS DOUBLE) + bk)
               + n_pairs * ((CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)))
              / (CAST(q AS DOUBLE) - n * ((CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))))
             * 1000000 + 0.5) / 1000000.0 AS acf
FROM p JOIN m ON p.event_type = m.event_type
""",
)
def ext_ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUTOCORRELATION FUNCTION (lags 1..{lags}) of each event type's
    hourly value series — the diagnostic under every seasonality /
    forecasting decision (``ext_ts_seasonal`` asserts a daily profile
    exists; ACF is how you FIND the cycle length and whether an EWMA
    (``ext_ts_ewma``) or a seasonal model fits).

    Estimator: the standard biased ACF r_k = Σ(x_t - x̄)(x_{{t-k}} - x̄)
    / Σ(x_t - x̄)², expanded so every aggregate is an EXACT integer
    (Σx_t·x_{{t-k}}, Σx, Σx² over integer cents — the float-sum
    discipline applied to a lag statistic); the mean-cross terms fold in
    as one closed-form double expression evaluated in the identical
    order both engines.

    Scale shape: one map-side-combined groupBy to the (type, hour)
    grain; series position t is a window PARTITIONED by event_type (per
    -key series, never a global sort); the lag join explodes {lags}
    fixed lags and self-joins on (type, t-k) — co-partitioned on the
    series key, output |types|×|lags| rows."""
    ev = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.sum(cents).cast("long").alias("x"))
    w = Window.partitionBy("event_type").orderBy("hr")
    s = hourly.select(
        "event_type", "x", F.row_number().over(w).cast("long").alias("t")
    )
    m = s.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q"),
    )
    a = s.select("event_type", F.col("x").alias("xa"), "t").withColumn(
        "k", F.explode(F.array(*[F.lit(k) for k in range(1, _ACF_LAGS + 1)]))
    )
    b = s.select(
        F.col("event_type").alias("et_b"),
        F.col("x").alias("xb"),
        F.col("t").alias("tb"),
    )
    p = (
        a.join(
            b,
            (F.col("et_b") == F.col("event_type"))
            & (F.col("tb") == F.col("t") - F.col("k")),
        )
        .groupBy("event_type", "k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("xa") * F.col("xb")).cast("long").alias("pk"),
            F.sum("xa").cast("long").alias("ak"),
            F.sum("xb").cast("long").alias("bk"),
        )
    )
    mean = F.col("sx").cast("double") / F.col("n")
    num = (
        F.col("pk").cast("double")
        - mean * (F.col("ak").cast("double") + F.col("bk"))
        + F.col("n_pairs") * (mean * mean)
    )
    den = F.col("q").cast("double") - F.col("n") * (mean * mean)
    return p.join(m, "event_type").select(
        "event_type",
        F.col("k").cast("long").alias("lag"),
        "n",
        (F.floor((num / den) * 1000000 + 0.5) / 1000000.0).alias("acf"),
    )


ext_ts_acf.__doc__ = ext_ts_acf.__doc__.format(lags=_ACF_LAGS)


@register(
    "ext_ts_ohlc",
    oracle="""
WITH pts AS (
  SELECT event_type, date_trunc('day', ts) AS day, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
), rn AS (
  SELECT event_type, day, c,
         row_number() OVER (PARTITION BY event_type, day
                            ORDER BY ts, event_id) AS r_open,
         row_number() OVER (PARTITION BY event_type, day
                            ORDER BY ts DESC, event_id DESC) AS r_close
  FROM pts
), agg AS (
  SELECT event_type, day,
         CAST(count(*) AS BIGINT) AS volume,
         CAST(max(c) AS BIGINT) AS hi_c, CAST(min(c) AS BIGINT) AS lo_c,
         CAST(max(CASE WHEN r_open = 1 THEN c END) AS BIGINT) AS open_c,
         CAST(max(CASE WHEN r_close = 1 THEN c END) AS BIGINT) AS close_c
  FROM rn GROUP BY 1, 2
)
SELECT event_type, CAST(day AS DATE) AS day, volume,
       CAST(open_c AS DOUBLE) / 100.0  AS open,
       CAST(hi_c AS DOUBLE) / 100.0    AS high,
       CAST(lo_c AS DOUBLE) / 100.0    AS low,
       CAST(close_c AS DOUBLE) / 100.0 AS close
FROM agg
""",
)
def ext_ts_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC RESAMPLING (candlestick bars): per event type per day, the
    open / high / low / close of the value stream plus volume — the
    canonical downsample every metrics store and market-data pipeline
    materializes (``agg_grid_resample``'s mean-per-cell sibling keeps
    averages; OHLC keeps the path extremes a mean erases).

    Open/close are the FIRST/LAST observation under the deterministic
    (ts, event_id) total order — expressed as row_number over the
    (type, day) partition in both engines, so ties break identically.
    Exact integer cents until the final /100 projection.

    Scale shape: the two row_numbers share ONE (type, day) hash
    exchange (same partition key, opposite sort — Spark sorts twice,
    shuffles once); the bar aggregate is map-side combinable; output is
    |types|×|days| rows."""
    ev = table(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    wp = Window.partitionBy("event_type", "day")
    rn = pts.select(
        "event_type",
        "day",
        "c",
        F.row_number().over(wp.orderBy("ts", "event_id")).alias("r_open"),
        F.row_number()
        .over(wp.orderBy(F.desc("ts"), F.desc("event_id")))
        .alias("r_close"),
    )
    agg = rn.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("volume"),
        F.max("c").cast("long").alias("hi_c"),
        F.min("c").cast("long").alias("lo_c"),
        F.max(F.when(F.col("r_open") == 1, F.col("c"))).cast("long").alias("open_c"),
        F.max(F.when(F.col("r_close") == 1, F.col("c"))).cast("long").alias("close_c"),
    )
    return agg.select(
        "event_type",
        F.col("day").cast("date").alias("day"),
        "volume",
        (F.col("open_c").cast("double") / 100.0).alias("open"),
        (F.col("hi_c").cast("double") / 100.0).alias("high"),
        (F.col("lo_c").cast("double") / 100.0).alias("low"),
        (F.col("close_c").cast("double") / 100.0).alias("close"),
    )


_RC_A, _RC_B = "click", "view"
_RC_HOURS = 24  # rolling window, in hour buckets


@register(
    "win_rolling_corr",
    oracle=f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hr,
         CAST(sum(CASE WHEN event_type = '{_RC_A}'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN event_type = '{_RC_B}'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
  FROM events
  WHERE event_type IN ('{_RC_A}', '{_RC_B}')
  GROUP BY 1
), w AS (
  SELECT hr,
    CAST(count(*) OVER win AS BIGINT) AS n,
    CAST(sum(x) OVER win AS BIGINT) AS sx,
    CAST(sum(y) OVER win AS BIGINT) AS sy,
    CAST(sum(x * y) OVER win AS BIGINT) AS sxy,
    CAST(sum(x * x) OVER win AS BIGINT) AS sxx,
    CAST(sum(y * y) OVER win AS BIGINT) AS syy
  FROM hourly
  WINDOW win AS (ORDER BY hr ROWS BETWEEN {_RC_HOURS - 1} PRECEDING AND CURRENT ROW)
)
SELECT hr, n,
  CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0 THEN
    floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
          / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
          * 1000000 + 0.5) / 1000000.0
  END AS rolling_corr
FROM w
""",
)
def win_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING {h}-hour Pearson correlation between the '{a}' and '{b}'
    hourly value series — the co-movement monitor (a correlation break
    between coupled metrics is an incident signal before either series
    alone alarms; the windowed sibling of ``agg_corr_matrix``'s static
    matrix).

    Every windowed moment (n, Σx, Σy, Σxy, Σx², Σy²) is an EXACT
    integer sum of cents over the ROWS frame, so the correlation is a
    pure deterministic double formula per row — no float accumulation
    crosses the engines.  Degenerate windows (zero variance) yield
    NULL via the same guard in both engines.

    Scale note: the window runs over the HOURLY grid, whose size is
    CALENDAR-bounded, not data-bounded — 720 rows/month, ~8.8e4/decade,
    so a single ordered task holds ~1e5 rows at maximum realistic
    retention regardless of fact-table volume.  That bound is the whole
    safety argument: if this op is generalized to MANY series pairs,
    the window must gain ``partitionBy(series_a, series_b)`` (each
    partition stays calendar-bounded and the pairs parallelize); a
    multi-year single-series span can also re-grain to days or
    partition by month with a {h}-row frame overlap."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_RC_A, _RC_B)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.sum(F.when(F.col("event_type") == _RC_A, cents).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == _RC_B, cents).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    win = (
        Window.orderBy("hr").rowsBetween(-(_RC_HOURS - 1), Window.currentRow)
    )
    w = hourly.select(
        "hr",
        F.count(F.lit(1)).over(win).cast("long").alias("n"),
        F.sum("x").over(win).cast("long").alias("sx"),
        F.sum("y").over(win).cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(win).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(win).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(win).cast("long").alias("syy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = (
        F.col("n").cast("double") * F.col("sxy")
        - F.col("sx").cast("double") * F.col("sy")
    )
    den = F.sqrt(
        (F.col("n").cast("double") * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (F.col("n").cast("double") * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    return w.select(
        "hr",
        "n",
        F.when((vx > 0) & (vy > 0), F.floor(num / den * 1000000 + 0.5) / 1000000.0)
        .alias("rolling_corr"),
    )


win_rolling_corr.__doc__ = win_rolling_corr.__doc__.format(
    h=_RC_HOURS, a=_RC_A, b=_RC_B
)


_FC_SEASON = 24  # seasonal-naive lag, hours


@register(
    "ext_ts_forecast_eval",
    oracle=f"""
WITH hourly AS MATERIALIZED (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
fc AS MATERIALIZED (
  SELECT event_type, h, cents,
         lag(cents, {_FC_SEASON}) OVER (PARTITION BY event_type ORDER BY h)
           AS f24,
         lag(cents, 1) OVER (PARTITION BY event_type ORDER BY h) AS f1
  FROM hourly
),
e AS (
  SELECT event_type,
         abs(cents - f24) AS ae24,
         abs(cents - f1) AS ae1,
         CAST(floor(CAST(abs(cents - f24) AS DOUBLE) / cents * 1000000 + 0.5)
              AS BIGINT) AS ape_u,
         CAST(floor(2.0 * abs(cents - f24) / (cents + f24) * 1000000 + 0.5)
              AS BIGINT) AS sape_u
  FROM fc WHERE f24 IS NOT NULL AND f1 IS NOT NULL AND cents > 0
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_points,
       floor(CAST(sum(ae24) AS DOUBLE) / count(*) / 100 * 100 + 0.5) / 100
         AS mae,
       floor(CAST(sum(ape_u) AS DOUBLE) / count(*) / 100 + 0.5) / 10000.0
         AS mape,
       floor(CAST(sum(sape_u) AS DOUBLE) / count(*) / 100 + 0.5) / 10000.0
         AS smape,
       floor(CAST(sum(ae24) AS DOUBLE) / sum(ae1) * 10000 + 0.5) / 10000.0
         AS mase
FROM e GROUP BY 1 ORDER BY 1
""",
)
def ext_ts_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORECAST BASELINE EVALUATION: seasonal-naive (value {s} hours ago)
    per event type, scored with the four standard error metrics — MAE,
    MAPE, sMAPE, and MASE (MAE relative to the naive lag-1 forecast,
    Hyndman & Koehler 2006: scale-free and defined where MAPE degenerates).
    Any real model must beat THIS row before it earns deployment — the
    evaluation harness is the capability; the naive forecast is the
    canonical yardstick inside it.

    Float discipline: the hourly series is exact integer cents; each
    per-point RATIO (APE, sAPE) quantizes to a micro-unit integer before
    the mean, so every aggregate is an exact integer sum with one final
    division — no order-dependent double accumulation.  The per-type
    hourly frame is time-grain bounded (hours in range, never corpus
    rows), so the lag windows run on the compressed grain."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents"))
    w = Window.partitionBy("event_type").orderBy("h")
    fc = hourly.select(
        "event_type",
        "cents",
        F.lag("cents", _FC_SEASON).over(w).alias("f24"),
        F.lag("cents", 1).over(w).alias("f1"),
    ).filter(F.col("f24").isNotNull() & F.col("f1").isNotNull() & (F.col("cents") > 0))
    ae24 = F.abs(F.col("cents") - F.col("f24"))
    ae1 = F.abs(F.col("cents") - F.col("f1"))
    e = fc.select(
        "event_type",
        ae24.alias("ae24"),
        ae1.alias("ae1"),
        F.floor(ae24.cast("double") / F.col("cents") * 1000000 + 0.5)
        .cast("long")
        .alias("ape_u"),
        F.floor(2.0 * ae24 / (F.col("cents") + F.col("f24")) * 1000000 + 0.5)
        .cast("long")
        .alias("sape_u"),
    )
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            (
                F.floor(F.sum("ae24").cast("double") / F.count(F.lit(1)) / 100 * 100 + 0.5)
                / 100
            ).alias("mae"),
            (
                F.floor(F.sum("ape_u").cast("double") / F.count(F.lit(1)) / 100 + 0.5)
                / 10000.0
            ).alias("mape"),
            (
                F.floor(F.sum("sape_u").cast("double") / F.count(F.lit(1)) / 100 + 0.5)
                / 10000.0
            ).alias("smape"),
            (
                F.floor(F.sum("ae24").cast("double") / F.sum("ae1") * 10000 + 0.5)
                / 10000.0
            ).alias("mase"),
        )
        .orderBy("event_type")
    )


@register(
    "win_time_weighted_avg",
    oracle="""
WITH s AS (
  SELECT event_type, epoch_us(ts) AS t,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events
),
iv AS (
  SELECT event_type, v,
         lead(t) OVER (PARTITION BY event_type ORDER BY t, v) - t AS dt
  FROM s
)
SELECT event_type,
       CAST(count(dt) AS BIGINT) AS n_intervals,
       CAST(sum(dt) // 1000000 AS BIGINT) AS span_sec,
       floor(CAST(sum(v * dt) AS DOUBLE) / sum(dt) / 100 * 10000 + 0.5)
         / 10000.0 AS twa
FROM iv WHERE dt IS NOT NULL
GROUP BY 1 ORDER BY 1
""",
)
def win_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-WEIGHTED AVERAGE over irregular samples — each observation
    weighted by how long it REMAINED the current value (Σ v·Δt / Σ Δt):
    the correct mean for unevenly-sampled gauges, where the arithmetic
    mean over-weights bursts (TimescaleDB's time_weight('LOCF')
    signature aggregate, re-expressed relationally).

    Exactness: timestamps as integer MICROSECONDS (unix_micros ==
    epoch_us — both exact int64, no truncate-vs-round cast hazard),
    values as integer cents, so Σ v·Δt is an exact int64 sum (bounded
    by span_us · max_cents per type — the DECIMAL(38,0) swap applies
    past ~1e18) with ONE final division.  One lead window per type
    partition, one map-side-combined aggregate."""
    ev = table(spark, sf_dir, "events")
    s = ev.select(
        "event_type",
        F.unix_micros("ts").alias("t"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    w = Window.partitionBy("event_type").orderBy("t", "v")
    iv = s.select(
        "event_type", "v", (F.lead("t").over(w) - F.col("t")).alias("dt")
    ).filter(F.col("dt").isNotNull())
    return (
        iv.groupBy("event_type")
        .agg(
            F.count("dt").cast("long").alias("n_intervals"),
            F.expr("sum(dt) div 1000000").cast("long").alias("span_sec"),
            (
                F.floor(
                    F.sum(F.col("v") * F.col("dt")).cast("double")
                    / F.sum("dt")
                    / 100
                    * 10000
                    + 0.5
                )
                / 10000.0
            ).alias("twa"),
        )
        .orderBy("event_type")
    )


@register(
    "win_gap_fill_locf",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT min(h) AS lo, max(h) AS hi FROM hourly
),
spine AS (
  SELECT t.event_type, g.h
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM bounds),
                                            (SELECT hi FROM bounds),
                                            INTERVAL 1 HOUR)) AS h) g
),
filled AS (
  SELECT s.event_type, s.h, hourly.cents,
         last_value(hourly.cents IGNORE NULLS) OVER (
           PARTITION BY s.event_type ORDER BY s.h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf
  FROM spine s LEFT JOIN hourly USING (event_type, h)
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_hours,
       CAST(count(cents) AS BIGINT) AS n_observed,
       CAST(count(*) - count(cents) AS BIGINT) AS n_filled,
       CAST(sum(coalesce(locf, 0)) AS BIGINT) AS filled_sum_cents
FROM filled GROUP BY 1 ORDER BY 1
""",
)
def win_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAP-FILL + LOCF interpolation: the complete hourly grid per event
    type (every type × every hour in range), missing slots carried
    forward from the last observation — the time_bucket_gapfill/locf
    hypertable primitive that turns sparse irregular series into the
    dense grid downstream models and dashboards require.  Reported as a
    per-type census (slots / observed / filled) plus the exact
    filled-series checksum, so the LOCF VALUES are pinned, not just the
    fill count.

    The spine is |types| × |hours-in-range| (time-grain bounded, built
    from a sequence() explode — never from the fact table); the LOCF is
    one last-ignore-nulls window per type over that bounded grid; the
    observed aggregate is map-side combined at the (type, hour) grain."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents"))
    bounds = hourly.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = spine.join(hourly, ["event_type", "h"], "left").select(
        "event_type",
        "cents",
        F.last("cents", ignorenulls=True).over(w).alias("locf"),
    )
    return (
        filled.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hours"),
            F.count("cents").cast("long").alias("n_observed"),
            (F.count(F.lit(1)) - F.count("cents")).cast("long").alias("n_filled"),
            F.sum(F.coalesce("locf", F.lit(0))).cast("long").alias("filled_sum_cents"),
        )
        .orderBy("event_type")
    )


_BURN_ALERT = 2.0  # hourly burn-rate multiple that pages


@register(
    "agg_error_burn_rate",
    oracle=f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_err
  FROM events GROUP BY 1
),
base AS (
  SELECT CAST(sum(n) AS BIGINT) AS tot,
         CAST(sum(n_err) AS BIGINT) AS tot_err
  FROM hourly
)
SELECT h, n, n_err,
       floor(CAST(n_err AS DOUBLE) / n * 1000000 + 0.5) / 1000000.0
         AS err_ratio,
       floor(CAST(n_err AS DOUBLE) / n
             / (CAST(tot_err AS DOUBLE) / tot) * 10000 + 0.5) / 10000.0
         AS burn_rate,
       (CAST(n_err AS DOUBLE) / n
        / (CAST(tot_err AS DOUBLE) / tot)) > {_BURN_ALERT} AS alert
FROM hourly CROSS JOIN base
ORDER BY h
""",
)
def agg_error_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ERROR-BUDGET BURN RATE (the SRE multi-window alert primitive,
    Google SRE workbook ch.5): each hour's error ratio relative to the
    period baseline — burn 1.0 = spending budget exactly on schedule,
    > {a} = paging territory.  The alert column is the exact predicate a
    monitor would page on; ``stream_drift_monitor`` is this op's online
    sibling for means, this one is the RATIO/SLO form.

    All counts exact ints; ratio and burn are single same-order double
    expressions (baseline via one 1-row broadcast aggregate).  One scan,
    one hour-grain map-side-combined aggregate, |hours| output rows."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("n_err"),
    )
    base = hourly.agg(
        F.sum("n").cast("long").alias("tot"),
        F.sum("n_err").cast("long").alias("tot_err"),
    )
    ratio = F.col("n_err").cast("double") / F.col("n")
    burn = ratio / (F.col("tot_err").cast("double") / F.col("tot"))
    return (
        hourly.crossJoin(F.broadcast(base))
        .select(
            "h",
            "n",
            "n_err",
            (F.floor(ratio * 1000000 + 0.5) / 1000000.0).alias("err_ratio"),
            (F.floor(burn * 10000 + 0.5) / 10000.0).alias("burn_rate"),
            (burn > _BURN_ALERT).alias("alert"),
        )
        .orderBy("h")
    )


agg_error_burn_rate.__doc__ = agg_error_burn_rate.__doc__.format(a=_BURN_ALERT)


# Prominence factor 3/2 kept as an integer ratio so the threshold test
# (den*cents*tcnt > num*tsum) stays in exact BIGINT arithmetic in BOTH
# engines -- Spark .cast("long") truncates while DuckDB CAST(.. AS BIGINT)
# rounds, so any float-then-cast form diverges by 1 whenever num*tsum/den
# is fractional.
_PEAK_NUM = 3   # peak must exceed _PEAK_NUM/_PEAK_DEN x the trailing mean
_PEAK_DEN = 2
_PEAK_FACTOR = _PEAK_NUM / _PEAK_DEN  # display-only (docstring)
_PEAK_TRAIL = 6     # trailing-mean window, hours


@register(
    "win_peak_detection",
    oracle=f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, h, cents,
         lag(cents) OVER (PARTITION BY event_type ORDER BY h) AS prv,
         lead(cents) OVER (PARTITION BY event_type ORDER BY h) AS nxt,
         CAST(sum(cents) OVER (PARTITION BY event_type ORDER BY h
              ROWS BETWEEN {_PEAK_TRAIL} PRECEDING AND 1 PRECEDING) AS BIGINT)
           AS tsum,
         CAST(count(*) OVER (PARTITION BY event_type ORDER BY h
              ROWS BETWEEN {_PEAK_TRAIL} PRECEDING AND 1 PRECEDING) AS BIGINT)
           AS tcnt
  FROM hourly
)
SELECT event_type, h, CAST(cents AS DOUBLE) / 100 AS value,
       floor(CAST(cents AS DOUBLE) * tcnt / tsum * 10000 + 0.5) / 10000.0
         AS vs_trailing
FROM w
WHERE prv IS NOT NULL AND nxt IS NOT NULL AND tcnt = {_PEAK_TRAIL}
  AND cents > prv AND cents > nxt
  AND {_PEAK_DEN} * cents * tcnt > {_PEAK_NUM} * tsum
ORDER BY event_type, h
""",
)
def win_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PEAK DETECTION on the hourly series: strict local maxima that also
    exceed {f}× the {t}-hour trailing mean — the spike-alert primitive
    (a local max alone fires on noise; the trailing-mean prominence
    gate is what scipy find_peaks' ``prominence`` approximates) that
    completes the anomaly set: ``win_control_chart`` finds level shifts,
    ``ext_ts_changepoint`` finds regime breaks, this finds SPIKES.

    The prominence comparison stays in integers — cents·count > 1.5·sum
    cross-multiplied, no division until the reported ratio — and edge
    rows (no neighbor, short trailing window) are excluded identically
    in both engines.  Windows run on the hour grain (time-bounded)."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents"))
    w = Window.partitionBy("event_type").orderBy("h")
    wt = w.rowsBetween(-_PEAK_TRAIL, -1)
    x = hourly.select(
        "event_type",
        "h",
        "cents",
        F.lag("cents").over(w).alias("prv"),
        F.lead("cents").over(w).alias("nxt"),
        F.sum("cents").over(wt).cast("long").alias("tsum"),
        F.count(F.lit(1)).over(wt).cast("long").alias("tcnt"),
    )
    return (
        x.filter(
            F.col("prv").isNotNull()
            & F.col("nxt").isNotNull()
            & (F.col("tcnt") == _PEAK_TRAIL)
            & (F.col("cents") > F.col("prv"))
            & (F.col("cents") > F.col("nxt"))
            & (
                F.lit(_PEAK_DEN) * F.col("cents") * F.col("tcnt")
                > F.lit(_PEAK_NUM) * F.col("tsum")
            )
        )
        .select(
            "event_type",
            "h",
            (F.col("cents").cast("double") / 100).alias("value"),
            (
                F.floor(
                    F.col("cents").cast("double") * F.col("tcnt") / F.col("tsum") * 10000
                    + 0.5
                )
                / 10000.0
            ).alias("vs_trailing"),
        )
        .orderBy("event_type", "h")
    )


win_peak_detection.__doc__ = win_peak_detection.__doc__.format(
    f=_PEAK_FACTOR, t=_PEAK_TRAIL
)


@register(
    "win_gap_fill_interp",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM hourly),
spine AS (
  SELECT t.event_type, g.h
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM bounds),
                                            (SELECT hi FROM bounds),
                                            INTERVAL 1 HOUR)) AS h) g
),
j AS (
  SELECT s.event_type, s.h, hourly.cents,
         last_value(hourly.cents IGNORE NULLS) OVER w_prev AS pv,
         last_value(CASE WHEN hourly.cents IS NOT NULL THEN s.h END
                    IGNORE NULLS) OVER w_prev AS ph,
         first_value(hourly.cents IGNORE NULLS) OVER w_next AS nv,
         first_value(CASE WHEN hourly.cents IS NOT NULL THEN s.h END
                     IGNORE NULLS) OVER w_next AS nh
  FROM spine s LEFT JOIN hourly USING (event_type, h)
  WINDOW
    w_prev AS (PARTITION BY s.event_type ORDER BY s.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_next AS (PARTITION BY s.event_type ORDER BY s.h
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
),
f AS (
  SELECT event_type, h, cents,
         CASE WHEN cents IS NOT NULL THEN cents
              WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                pv + CAST(floor(CAST((nv - pv) AS DOUBLE)
                     * date_diff('hour', ph, h)
                     / date_diff('hour', ph, nh) + 0.5) AS BIGINT)
              ELSE NULL END AS filled
  FROM j
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_hours,
       CAST(count(cents) AS BIGINT) AS n_observed,
       CAST(sum(CASE WHEN cents IS NULL AND filled IS NOT NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_interpolated,
       CAST(sum(CASE WHEN filled IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unfillable,
       CAST(sum(coalesce(filled, 0)) AS BIGINT) AS filled_sum_cents
FROM f GROUP BY 1 ORDER BY 1
""",
)
def win_gap_fill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAP-FILL with LINEAR INTERPOLATION — missing hourly slots take
    the straight line between their bracketing observations (the other
    hypertable fill mode next to ``win_gap_fill_locf``: LOCF asserts
    "nothing changed", interpolation asserts "it moved smoothly" —
    gauges want the latter, event counts the former).  Edge slots with
    no bracket on one side stay null and are counted, not invented.

    Same bounded spine as the LOCF op; the bracketing observation and
    its TIMESTAMP come from last/first-ignore-nulls windows in both
    directions, the interpolated value is integer cents with ONE
    half-up rounding per slot (hour offsets are exact ints), and the
    filled-series checksum pins every interpolated value."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents"))
    bounds = hourly.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h"),
        )
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("cents").isNotNull(), F.col("h"))
    j = spine.join(hourly, ["event_type", "h"], "left").select(
        "event_type",
        "h",
        "cents",
        F.last("cents", ignorenulls=True).over(wp).alias("pv"),
        F.last(obs_h, ignorenulls=True).over(wp).alias("ph"),
        F.first("cents", ignorenulls=True).over(wn).alias("nv"),
        F.first(obs_h, ignorenulls=True).over(wn).alias("nh"),
    )
    hours = lambda a, b: F.expr(f"timestampdiff(HOUR, {a}, {b})")  # noqa: E731
    interp = F.col("pv") + F.floor(
        (F.col("nv") - F.col("pv")).cast("double")
        * hours("ph", "h")
        / hours("ph", "nh")
        + 0.5
    ).cast("long")
    filled = F.when(F.col("cents").isNotNull(), F.col("cents")).otherwise(
        F.when(F.col("pv").isNotNull() & F.col("nv").isNotNull(), interp)
    )
    f = j.select("event_type", "cents", filled.alias("filled"))
    return (
        f.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hours"),
            F.count("cents").cast("long").alias("n_observed"),
            F.sum(
                F.when(F.col("cents").isNull() & F.col("filled").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_interpolated"),
            F.sum(F.when(F.col("filled").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_unfillable"),
            F.sum(F.coalesce("filled", F.lit(0))).cast("long").alias("filled_sum_cents"),
        )
        .orderBy("event_type")
    )


_CCF_MAX_LAG = 3  # cross-correlation lags, hours (both directions)
_CCF_A, _CCF_B = "click", "view"  # the coupled pair win_rolling_corr monitors


@register(
    "ext_ts_crosscorr",
    oracle=f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events WHERE event_type IN ('{_CCF_A}', '{_CCF_B}') GROUP BY 1, 2
),
xs AS (
  SELECT hr, CAST(row_number() OVER (ORDER BY hr) AS BIGINT) AS t, c AS x
  FROM hourly WHERE event_type = '{_CCF_A}'
),
ys AS (
  SELECT hr, CAST(row_number() OVER (ORDER BY hr) AS BIGINT) AS t, c AS y
  FROM hourly WHERE event_type = '{_CCF_B}'
),
p AS (
  SELECT lag.k,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(a.x) AS BIGINT) AS sx, CAST(sum(b.y) AS BIGINT) AS sy,
         CAST(sum(a.x * a.x) AS BIGINT) AS sxx,
         CAST(sum(b.y * b.y) AS BIGINT) AS syy,
         CAST(sum(a.x * b.y) AS BIGINT) AS sxy
  FROM xs a
  JOIN (SELECT unnest(generate_series(-{_CCF_MAX_LAG}, {_CCF_MAX_LAG})) AS k)
    lag ON TRUE
  JOIN ys b ON b.t = a.t + lag.k
  GROUP BY 1
)
SELECT CAST(k AS BIGINT) AS lag, n,
       floor((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
             / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                    * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy))
             * 1000000 + 0.5) / 1000000.0 AS ccf
FROM p
ORDER BY lag
""",
)
def ext_ts_crosscorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-CORRELATION FUNCTION between the '{a}' and '{b}' hourly
    series at lags −{k}..+{k}: which series LEADS?  The peak lag of the
    CCF is the standard lead/lag diagnostic behind ``win_rolling_corr``
    (that op watches co-movement at lag 0; a correlation that lives at
    lag +2 means '{a}' predicts '{b}' two hours out — an upstream/
    downstream incident-propagation signature).

    All moments are exact integer sums per lag over the PAIRED hour
    grid; the Pearson formula is one shared double expression.  The lag
    join runs on the hourly row-number grain — calendar-bounded (the
    ``win_rolling_corr`` bound: ~1e5 rows/decade), 2·{k}+1 lags."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_CCF_A, _CCF_B)
    )
    hourly = ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hr")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("c")
    )
    w = W.partitionBy("event_type").orderBy("hr")
    s = hourly.select(
        "event_type", F.row_number().over(w).cast("long").alias("t"), "c"
    )
    xs = s.filter(F.col("event_type") == _CCF_A).select(
        "t", F.col("c").alias("x")
    )
    ys = s.filter(F.col("event_type") == _CCF_B).select(
        F.col("t").alias("ty"), F.col("c").alias("y")
    )
    lags = spark.range(-_CCF_MAX_LAG, _CCF_MAX_LAG + 1).select(
        F.col("id").cast("long").alias("k")
    )
    p = (
        xs.crossJoin(F.broadcast(lags))
        .join(ys, F.col("ty") == F.col("t") + F.col("k"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        )
    )
    num = F.col("n") * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx"))
        * (F.col("n") * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy"))
    )
    return p.select(
        F.col("k").alias("lag"),
        "n",
        (F.floor(num / den * 1000000 + 0.5) / 1000000.0).alias("ccf"),
    ).orderBy("lag")


ext_ts_crosscorr.__doc__ = ext_ts_crosscorr.__doc__.format(
    a=_CCF_A, b=_CCF_B, k=_CCF_MAX_LAG
)


_HOLT_ALPHA = 0.5  # level smoothing
_HOLT_BETA = 0.3  # trend smoothing


@register(
    "ext_ts_holt",
    oracle=f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS d,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
arr AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         list(CAST(cents AS DOUBLE) ORDER BY d) AS ys
  FROM daily GROUP BY 1
),
folded AS (
  -- state rides a [l, b, sse] LIST, not a struct: DuckDB 1.0 struct_pack
  -- inside a lambda rebinds already-assigned field names sequentially
  -- (a.l after "l :=" resolves to the NEW l), which silently corrupts
  -- any fold whose fields cross-reference; positional list access has
  -- no names to shadow.
  SELECT event_type, n,
         list_reduce(
           list_prepend(
             [ys[2], ys[2] - ys[1], CAST(0 AS DOUBLE)],
             list_transform(ys[3:],
                            e -> [e, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)])),
           (a, x) -> [
             CAST({_HOLT_ALPHA} AS DOUBLE) * x[1]
               + (1.0 - CAST({_HOLT_ALPHA} AS DOUBLE)) * (a[1] + a[2]),
             CAST({_HOLT_BETA} AS DOUBLE)
               * ((CAST({_HOLT_ALPHA} AS DOUBLE) * x[1]
                   + (1.0 - CAST({_HOLT_ALPHA} AS DOUBLE)) * (a[1] + a[2]))
                  - a[1])
               + (1.0 - CAST({_HOLT_BETA} AS DOUBLE)) * a[2],
             a[3] + (x[1] - (a[1] + a[2])) * (x[1] - (a[1] + a[2]))
           ]
         ) AS st
  FROM arr WHERE n >= 3
)
SELECT event_type, n,
       floor(st[1] * 10000 + 0.5) / 10000.0 AS level_cents,
       floor(st[2] * 10000 + 0.5) / 10000.0 AS trend_cents,
       floor((st[1] + st[2]) * 10000 + 0.5) / 10000.0 AS forecast_cents,
       floor(sqrt(st[3] / (n - 2)) * 10000 + 0.5) / 10000.0 AS rmse_cents
FROM folded
ORDER BY event_type
""",
)
def ext_ts_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOLT'S LINEAR TREND (double exponential smoothing, α={a} β={b})
    over each event type's daily revenue series: final level/trend
    state, the one-step-ahead forecast, and the in-sample one-step RMSE
    — the workhorse short-horizon forecaster one rung above
    ``ext_ts_ewma`` (which has no trend term); ``ext_ts_forecast_eval``
    is the scoring harness such forecasts feed.

    The recursion is inherently SEQUENTIAL, so it runs as a per-series
    left fold with a struct state {{l, b, sse}} (``F.aggregate`` ==
    DuckDB ``list_reduce`` + ``struct_pack``, identical arithmetic and
    op order — the engine's float-determinism discipline), initialized
    the standard way (l₂ = y₂, b₂ = y₂−y₁, fold from t=3).  Series are
    CALENDAR-bounded (days in retention) so the per-group array is safe
    by construction; series parallelize across the groupBy."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.date_trunc("day", "ts").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents")
    )
    arr = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("d"), F.col("cents").cast("double").alias("y")))
            ),
            lambda s: s.getField("y"),
        ).alias("ys"),
    ).filter(F.col("n") >= 3)
    A, B = float(_HOLT_ALPHA), float(_HOLT_BETA)

    def step(acc, y):
        f = acc.getField("l") + acc.getField("b")
        l_new = F.lit(A) * y + (1.0 - F.lit(A)) * f
        return F.struct(
            l_new.alias("l"),
            (F.lit(B) * (l_new - acc.getField("l")) + (1.0 - F.lit(B)) * acc.getField("b")).alias("b"),
            (acc.getField("sse") + (y - f) * (y - f)).alias("sse"),
        )

    init = F.struct(
        F.element_at("ys", 2).alias("l"),
        (F.element_at("ys", 2) - F.element_at("ys", 1)).alias("b"),
        F.lit(0.0).alias("sse"),
    )
    st = F.aggregate(F.slice("ys", 3, F.size("ys") - 2), init, step)

    def q4(x):
        return F.floor(x * 10000 + 0.5) / 10000.0

    folded = arr.select("event_type", "n", st.alias("st"))
    return folded.select(
        "event_type",
        "n",
        q4(F.col("st.l")).alias("level_cents"),
        q4(F.col("st.b")).alias("trend_cents"),
        q4(F.col("st.l") + F.col("st.b")).alias("forecast_cents"),
        q4(F.sqrt(F.col("st.sse") / (F.col("n") - 2))).alias("rmse_cents"),
    ).orderBy("event_type")


ext_ts_holt.__doc__ = ext_ts_holt.__doc__.format(a=_HOLT_ALPHA, b=_HOLT_BETA)


_PGRAM_MAX_K = 7  # harmonics evaluated (k cycles over the observed span)


@register(
    "ext_ts_periodogram",
    oracle=f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS d,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
),
s AS (
  SELECT CAST(row_number() OVER (ORDER BY d) - 1 AS BIGINT) AS t,
         CAST(cents AS DOUBLE) AS y,
         CAST(count(*) OVER () AS BIGINT) AS n,
         CAST(sum(cents) OVER () AS BIGINT) AS tot
  FROM daily
),
k AS (SELECT unnest(generate_series(1, {_PGRAM_MAX_K})) AS k),
terms AS (
  SELECT k.k, s.t,
         (s.y - CAST(s.tot AS DOUBLE) / s.n)
           * cos(2 * pi() * k.k * s.t / s.n) AS c_term,
         (s.y - CAST(s.tot AS DOUBLE) / s.n)
           * sin(2 * pi() * k.k * s.t / s.n) AS s_term,
         s.n
  FROM s CROSS JOIN k
),
folded AS (
  SELECT k, max(n) AS n,
         list_reduce(list_prepend(CAST(0 AS DOUBLE), list(c_term ORDER BY t)),
                     (a, x) -> a + x) AS ck,
         list_reduce(list_prepend(CAST(0 AS DOUBLE), list(s_term ORDER BY t)),
                     (a, x) -> a + x) AS sk
  FROM terms GROUP BY k
)
SELECT CAST(k AS BIGINT) AS k, n,
       floor((ck * ck + sk * sk) / n * 10000 + 0.5) / 10000.0 AS power
FROM folded
ORDER BY k
""",
)
def ext_ts_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERIODOGRAM of the daily revenue series — spectral power at the
    first {k} harmonics via the direct DFT, the frequency-domain
    periodicity detector behind ``ext_ts_seasonal``'s fixed weekly
    profile (the profile assumes period 7; the periodogram FINDS the
    period, and its peak harmonic is what ``ext_seasonality_strength``
    should be pointed at).

    Mean-centered cosine/sine projections; the per-harmonic sums fold
    SEQUENTIALLY over the time-ordered term arrays (the engine's float
    discipline — cos/sin of identical double arguments are identical,
    only the accumulation order needed pinning).  The series grain is
    calendar-bounded; harmonics are a {k}-row broadcast."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents")
    )
    w = W.orderBy("d")  # calendar-bounded frame
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    s = daily.select(
        (F.row_number().over(w) - 1).cast("long").alias("t"),
        F.col("cents").cast("double").alias("y"),
        F.count(F.lit(1)).over(wall).cast("long").alias("n"),
        F.sum("cents").over(wall).cast("long").alias("tot"),
    )
    ks = spark.range(1, _PGRAM_MAX_K + 1).select(F.col("id").cast("long").alias("k"))
    ang = 2 * F.lit(math.pi) * F.col("k") * F.col("t") / F.col("n")
    dev = F.col("y") - F.col("tot").cast("double") / F.col("n")
    terms = s.crossJoin(F.broadcast(ks)).select(
        "k",
        "t",
        "n",
        (dev * F.cos(ang)).alias("c_term"),
        (dev * F.sin(ang)).alias("s_term"),
    )

    def fold(col):
        return F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("t"), col.alias("v")))),
                lambda st: st.getField("v"),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )

    folded = terms.groupBy("k").agg(
        F.max("n").cast("long").alias("n"),
        fold(F.col("c_term")).alias("ck"),
        fold(F.col("s_term")).alias("sk"),
    )
    power = (F.col("ck") * F.col("ck") + F.col("sk") * F.col("sk")) / F.col("n")
    return folded.select(
        "k", "n", (F.floor(power * 10000 + 0.5) / 10000.0).alias("power")
    ).orderBy("k")


ext_ts_periodogram.__doc__ = ext_ts_periodogram.__doc__.format(k=_PGRAM_MAX_K)


_DECOMP_MA = 7  # centered moving-average window (days), must be odd


@register(
    "ext_ts_decompose",
    oracle=f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', date_trunc('day', ts))
              AS BIGINT) AS d,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
),
ma AS (
  SELECT d, cents,
         CAST(sum(cents) OVER (ORDER BY d
              ROWS BETWEEN {_DECOMP_MA // 2} PRECEDING
              AND {_DECOMP_MA // 2} FOLLOWING) AS BIGINT) AS s7,
         CAST(count(*) OVER (ORDER BY d
              ROWS BETWEEN {_DECOMP_MA // 2} PRECEDING
              AND {_DECOMP_MA // 2} FOLLOWING) AS BIGINT) AS c7
  FROM daily
),
det AS (
  SELECT d, cents, s7,
         CAST({_DECOMP_MA} * cents - s7 AS BIGINT) AS det7,
         CAST(d % 7 AS BIGINT) AS dow
  FROM ma WHERE c7 = {_DECOMP_MA}
),
seas AS (
  SELECT dow,
         CAST(sum(det7) AS BIGINT) AS sdet,
         CAST(count(*) AS BIGINT) AS n
  FROM det GROUP BY 1
)
SELECT det.d, det.cents,
       floor(CAST(det.s7 AS DOUBLE) / {_DECOMP_MA} * 10000 + 0.5) / 10000.0
         AS trend,
       floor(CAST(seas.sdet AS DOUBLE) / seas.n / {_DECOMP_MA} * 10000 + 0.5)
         / 10000.0 AS seasonal,
       floor((CAST(det.det7 AS DOUBLE) / {_DECOMP_MA}
              - CAST(seas.sdet AS DOUBLE) / seas.n / {_DECOMP_MA})
             * 10000 + 0.5) / 10000.0 AS remainder
FROM det JOIN seas USING (dow)
ORDER BY det.d
""",
)
def ext_ts_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLASSICAL ADDITIVE DECOMPOSITION of the daily revenue series:
    trend = centered {m}-day moving average (full windows only),
    seasonal = the per-weekday mean of the detrended series, remainder =
    what's left — the trend/seasonal/remainder triptych
    (``ext_ts_seasonal`` reports the weekly profile alone;
    ``ext_seasonality_strength`` scores it; this op RETURNS all three
    components per day, the decomposition the other two summarize).

    Exactness: everything is scaled by {m} so the detrended series
    ``{m}·y − Σ₇`` stays an exact integer; weekday means divide once;
    weekday = epoch-day mod 7 (engine-neutral — Spark and DuckDB number
    calendar weekdays differently).  Windows run on the calendar-bounded
    day grain."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents")
    )
    half = _DECOMP_MA // 2
    w = W.orderBy("d").rowsBetween(-half, half)  # calendar-bounded frame
    ma = daily.select(
        "d",
        "cents",
        F.sum("cents").over(w).cast("long").alias("s7"),
        F.count(F.lit(1)).over(w).cast("long").alias("c7"),
    )
    det = ma.filter(F.col("c7") == _DECOMP_MA).select(
        "d",
        "cents",
        "s7",
        (F.lit(_DECOMP_MA) * F.col("cents") - F.col("s7")).cast("long").alias("det7"),
        (F.col("d") % 7).cast("long").alias("dow"),
    )
    seas = det.groupBy("dow").agg(
        F.sum("det7").cast("long").alias("sdet"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )

    def q4(x):
        return F.floor(x * 10000 + 0.5) / 10000.0

    seasonal = F.col("sdet").cast("double") / F.col("n") / _DECOMP_MA
    return (
        det.join(F.broadcast(seas), "dow")
        .select(
            "d",
            "cents",
            q4(F.col("s7").cast("double") / _DECOMP_MA).alias("trend"),
            q4(seasonal).alias("seasonal"),
            q4(F.col("det7").cast("double") / _DECOMP_MA - seasonal).alias(
                "remainder"
            ),
        )
        .orderBy("d")
    )


ext_ts_decompose.__doc__ = ext_ts_decompose.__doc__.format(m=_DECOMP_MA)


_RSI_P = 14  # Cutler's RSI lookback (simple-average variant)


@register(
    "win_rsi",
    oracle=f"""
WITH seq AS (
  SELECT event_type,
         CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
              AS BIGINT) AS rn
  FROM events
), d AS (
  SELECT event_type, rn,
         cents - lag(cents) OVER (PARTITION BY event_type ORDER BY rn) AS diff
  FROM seq
), gl AS (
  SELECT event_type, rn,
         CAST(sum(greatest(diff, 0)) OVER w AS BIGINT) AS sg,
         CAST(sum(greatest(-diff, 0)) OVER w AS BIGINT) AS sl
  FROM d WHERE diff IS NOT NULL
  WINDOW w AS (PARTITION BY event_type ORDER BY rn
               ROWS BETWEEN {_RSI_P - 1} PRECEDING AND CURRENT ROW)
), rsi AS (
  SELECT event_type, rn,
         CASE WHEN sg + sl = 0 THEN 50.0
              ELSE 100.0 * sg / (sg + sl) END AS rsi
  FROM gl WHERE rn >= {_RSI_P + 1}
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_obs,
       CAST(sum(CASE WHEN rsi > 70 THEN 1 ELSE 0 END) AS BIGINT) AS n_overbought,
       CAST(sum(CASE WHEN rsi < 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_oversold,
       floor(arg_max(rsi, rn) * 1000000 + 0.5) / 1000000.0 AS last_rsi
FROM rsi GROUP BY 1 ORDER BY 1
""",
)
def win_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RELATIVE STRENGTH INDEX (Cutler's simple-average variant, period
    {p}) per event-type series, summarized as overbought (>70) /
    oversold (<30) observation counts plus the latest reading — the
    bounded-oscillator momentum view next to ``win_ma_crossover``'s
    regime triggers and ``win_drawdown``'s loss view.  Cutler's SMA
    form is used deliberately: Wilder's recursive smoothing is a
    sequential fold (the ``ext_ts_ewma`` shape), while the SMA form is
    pure rolling-window algebra — RSI = 100·ΣG/(ΣG+ΣL) over the last
    {p} integer-cent diffs, so every per-row value is a ratio of exact
    int64 sums and the threshold booleans are bit-stable cross-engine
    (flat-window rows pin RSI = 50 identically both sides).

    Scale shape: ONE (event_type | ts, event_id) range exchange serves
    the rank, the diff lag, and both rolling sums; the summary is a
    map-side-combined groupBy to |types| rows.  Nothing unpartitioned,
    nothing wider than the {p}-row frame."""
    events = table(spark, sf_dir, "events")
    w0 = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = events.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.row_number().over(w0).cast("long").alias("rn"),
    )
    wr = Window.partitionBy("event_type").orderBy("rn")
    d = seq.select(
        "event_type",
        "rn",
        (F.col("cents") - F.lag("cents").over(wr)).alias("diff"),
    ).filter(F.col("diff").isNotNull())
    wf = wr.rowsBetween(-(_RSI_P - 1), 0)
    gl = d.select(
        "event_type",
        "rn",
        F.sum(F.greatest(F.col("diff"), F.lit(0))).over(wf).cast("long").alias("sg"),
        F.sum(F.greatest(-F.col("diff"), F.lit(0))).over(wf).cast("long").alias("sl"),
    ).filter(F.col("rn") >= _RSI_P + 1)
    rsi = gl.select(
        "event_type",
        "rn",
        F.when(F.col("sg") + F.col("sl") == 0, F.lit(50.0))
        .otherwise(F.lit(100.0) * F.col("sg") / (F.col("sg") + F.col("sl")))
        .alias("rsi"),
    )
    return (
        rsi.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            F.sum(F.when(F.col("rsi") > 70, 1).otherwise(0))
            .cast("long")
            .alias("n_overbought"),
            F.sum(F.when(F.col("rsi") < 30, 1).otherwise(0))
            .cast("long")
            .alias("n_oversold"),
            (F.floor(F.max_by("rsi", "rn") * 1000000 + 0.5) / 1000000.0).alias(
                "last_rsi"
            ),
        )
        .orderBy("event_type")
    )


win_rsi.__doc__ = win_rsi.__doc__.format(p=_RSI_P)


_SAX_W = 5  # days per PAA bucket
# Standard-normal quartile breakpoints for a 4-symbol alphabet (a<b<c<d).
_SAX_BP = 0.6745


@register(
    "ext_ts_sax",
    oracle=f"""
WITH daily AS (
  SELECT CAST(date_diff('day',
              (SELECT min(date_trunc('day', l_shipdate)) FROM lineitem),
              date_trunc('day', l_shipdate)) AS BIGINT) AS x,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM lineitem GROUP BY 1
), paa AS (
  SELECT CAST(floor(x / {_SAX_W}) AS BIGINT) AS bucket,
         CAST(sum(y) AS BIGINT) AS s,
         CAST(floor(sum(y) / 1000.0) AS BIGINT) AS ks
  FROM daily GROUP BY 1 HAVING count(*) = {_SAX_W}
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(ks) AS BIGINT) AS ss, CAST(sum(ks * ks) AS BIGINT) AS sq
  FROM paa
), z AS (
  SELECT bucket, s,
         (ks - CAST(ss AS DOUBLE) / n)
           / sqrt(CAST(sq AS DOUBLE) / n
                  - (CAST(ss AS DOUBLE) / n) * (CAST(ss AS DOUBLE) / n)) AS zv
  FROM paa CROSS JOIN m
)
SELECT bucket, s AS paa_cents,
       CASE WHEN zv < -{_SAX_BP} THEN 'a'
            WHEN zv < 0 THEN 'b'
            WHEN zv < {_SAX_BP} THEN 'c'
            ELSE 'd' END AS symbol
FROM z ORDER BY bucket
""",
)
def ext_ts_sax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX (Symbolic Aggregate approXimation) of the daily-revenue
    series: {w}-day PAA buckets, z-normalized, mapped to a 4-symbol
    alphabet at the standard-normal quartile breakpoints (Lin &
    Keogh's discretization) — the representation that turns numeric
    series into strings so motif mining / anomaly grep /
    ``ext_ts_subseq_search``-style indexing can run with TEXT
    machinery (``ext_fingerprint`` shingles, suffix joins) instead of
    distance scans.

    Exactness order matters and is deliberately inverted from the
    textbook: PAA aggregates the exact INTEGER cent sums first, and
    z-normalization runs on the bucket sums using moments that are
    themselves exact int64 — so the only doubles are the final z
    values, computed in one identical expression both engines, and the
    breakpoint comparisons are bit-stable.  Partial trailing buckets
    are excluded (a {w}-day PAA mean over fewer days is a different
    statistic).

    Scale shape: two map-side-combined groupBys (day grain → bucket
    grain, both calendar-bounded) and a broadcast 1-row moment join;
    output is |buckets| rows."""
    li = table(spark, sf_dir, "lineitem")
    t0 = li.agg(F.min(F.date_trunc("day", "l_shipdate")).alias("t0"))
    daily = (
        li.crossJoin(F.broadcast(t0))
        .groupBy(
            F.datediff(F.date_trunc("day", "l_shipdate"), "t0").cast("long").alias("x")
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("y")
        )
    )
    paa = (
        daily.groupBy(F.floor(F.col("x") / _SAX_W).cast("long").alias("bucket"))
        .agg(F.sum("y").cast("long").alias("s"), F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") == _SAX_W)
        .select(
            "bucket",
            "s",
            # z-moments run on KILOCENT bucket sums so Σks² stays inside
            # int64 through ~sf1 (decimal sums are the documented swap past
            # that); z on a constant rescale is the same statistic.
            F.floor(F.col("s") / 1000.0).cast("long").alias("ks"),
        )
    )
    m = paa.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("ks").cast("long").alias("ss"),
        F.sum(F.col("ks") * F.col("ks")).cast("long").alias("sq"),
    )
    mu = F.col("ss").cast("double") / F.col("n")
    sd = F.sqrt(F.col("sq").cast("double") / F.col("n") - mu * mu)
    z = paa.crossJoin(F.broadcast(m)).select(
        "bucket", "s", ((F.col("ks") - mu) / sd).alias("zv")
    )
    sym = (
        F.when(F.col("zv") < -_SAX_BP, "a")
        .when(F.col("zv") < 0, "b")
        .when(F.col("zv") < _SAX_BP, "c")
        .otherwise("d")
    )
    return z.select(
        "bucket", F.col("s").alias("paa_cents"), sym.alias("symbol")
    ).orderBy("bucket")


_HURST_SCALES = (1, 2, 4, 8)  # increment lags (days) for the structure function


@register(
    "agg_hurst",
    oracle=f"""
WITH daily AS (
  SELECT CAST(date_diff('day',
              (SELECT min(date_trunc('day', l_shipdate)) FROM lineitem),
              date_trunc('day', l_shipdate)) AS BIGINT) AS x,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM lineitem GROUP BY 1
), d AS (
  SELECT x, y,
         CAST(floor((y - lag(y, 1) OVER w) / 1000.0) AS BIGINT) AS d1,
         CAST(floor((y - lag(y, 2) OVER w) / 1000.0) AS BIGINT) AS d2,
         CAST(floor((y - lag(y, 4) OVER w) / 1000.0) AS BIGINT) AS d4,
         CAST(floor((y - lag(y, 8) OVER w) / 1000.0) AS BIGINT) AS d8
  FROM daily WINDOW w AS (ORDER BY x)
), v AS (
  SELECT
    CAST(count(*) AS BIGINT) AS n_days,
    CAST(sum(d1*d1) AS DOUBLE) / count(d1) - (CAST(sum(d1) AS DOUBLE)/count(d1)) * (CAST(sum(d1) AS DOUBLE)/count(d1)) AS v1,
    CAST(sum(d2*d2) AS DOUBLE) / count(d2) - (CAST(sum(d2) AS DOUBLE)/count(d2)) * (CAST(sum(d2) AS DOUBLE)/count(d2)) AS v2,
    CAST(sum(d4*d4) AS DOUBLE) / count(d4) - (CAST(sum(d4) AS DOUBLE)/count(d4)) * (CAST(sum(d4) AS DOUBLE)/count(d4)) AS v4,
    CAST(sum(d8*d8) AS DOUBLE) / count(d8) - (CAST(sum(d8) AS DOUBLE)/count(d8)) * (CAST(sum(d8) AS DOUBLE)/count(d8)) AS v8
  FROM d
), f AS (
  SELECT n_days, v1, v2, v4, v8,
         (ln(v1) + ln(v2) + ln(v4) + ln(v8)) / 4 AS ybar,
         (ln(1.0) + ln(2.0) + ln(4.0) + ln(8.0)) / 4 AS xbar
  FROM v
)
SELECT n_days,
       floor(v1 * 1000000 + 0.5) / 1000000.0 AS v1,
       floor(v8 * 1000000 + 0.5) / 1000000.0 AS v8,
       floor((((ln(1.0) - xbar) * (ln(v1) - ybar) + (ln(2.0) - xbar) * (ln(v2) - ybar)
               + (ln(4.0) - xbar) * (ln(v4) - ybar) + (ln(8.0) - xbar) * (ln(v8) - ybar))
              / ((ln(1.0) - xbar) * (ln(1.0) - xbar) + (ln(2.0) - xbar) * (ln(2.0) - xbar)
                 + (ln(4.0) - xbar) * (ln(4.0) - xbar) + (ln(8.0) - xbar) * (ln(8.0) - xbar))
              / 2) * 1000000 + 0.5) / 1000000.0 AS hurst
FROM f
""",
)
def agg_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HURST EXPONENT of the daily-revenue series by the structure-
    function (k-step increment variance) method: Var(y_(t+k) − y_t)
    scales as k^2H for a self-similar process, so H is half the OLS
    slope of ln Var over ln k at k ∈ {s} — the long-range-dependence
    readout (H ≈ 0.5 random walk increments, > 0.5 persistent/trending,
    < 0.5 mean-reverting) that decides whether ``ext_ts_holt``-style
    extrapolation is even defensible, next to ``ext_ts_acf``'s
    short-lag view.

    Exactness: increments are exact integer KILOCENT diffs (floor is
    toward −∞ in both engines, so negative diffs agree; Σd² stays
    inside int64 through ~sf1 — decimal sums are the documented swap),
    each variance is closed-form from two integer sums, and the 4-point
    OLS is a fixed-order expression — full value oracle despite the
    logs.

    Scale shape: one map-side-combined groupBy to the calendar-bounded
    day grain, then ONE ordered spine window serving all four lags
    (the win_rolling_corr hour-spine bound: ~10⁵ rows at a decade of
    daily retention; partition-by-series is the multi-series swap),
    and a 1-row moment aggregate."""
    li = table(spark, sf_dir, "lineitem")
    t0 = li.agg(F.min(F.date_trunc("day", "l_shipdate")).alias("t0"))
    daily = (
        li.crossJoin(F.broadcast(t0))
        .groupBy(
            F.datediff(F.date_trunc("day", "l_shipdate"), "t0").cast("long").alias("x")
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("y")
        )
    )
    w = Window.orderBy("x")
    d = daily.select(
        "x",
        *[
            F.floor((F.col("y") - F.lag("y", k).over(w)) / 1000.0)
            .cast("long")
            .alias(f"d{k}")
            for k in _HURST_SCALES
        ],
    )

    def var_of(k):
        c = F.count(F.col(f"d{k}"))
        s = F.sum(F.col(f"d{k}")).cast("double")
        sq = F.sum(F.col(f"d{k}") * F.col(f"d{k}")).cast("double")
        return (sq / c - (s / c) * (s / c)).alias(f"v{k}")

    v = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        *[var_of(k) for k in _HURST_SCALES],
    )
    lnks = [math.log(float(k)) for k in _HURST_SCALES]
    xbar = sum(lnks) / 4  # compile-time constant, same literal both engines
    ybar = (
        F.log(F.col("v1")) + F.log(F.col("v2")) + F.log(F.col("v4")) + F.log(F.col("v8"))
    ) / 4
    num = sum(
        ((F.lit(lnks[i]) - F.lit(xbar)) * (F.log(F.col(f"v{k}")) - ybar))
        for i, k in enumerate(_HURST_SCALES)
    )
    den = sum(((lnks[i] - xbar) * (lnks[i] - xbar)) for i in range(4))
    return v.select(
        "n_days",
        (F.floor(F.col("v1") * 1000000 + 0.5) / 1000000.0).alias("v1"),
        (F.floor(F.col("v8") * 1000000 + 0.5) / 1000000.0).alias("v8"),
        (F.floor(num / F.lit(den) / 2 * 1000000 + 0.5) / 1000000.0).alias("hurst"),
    )


agg_hurst.__doc__ = agg_hurst.__doc__.format(s=list(_HURST_SCALES))


_ITS_CUTOFF = "1998-01-01"  # intervention date for the segmented regression


@register(
    "agg_its_segmented",
    oracle=f"""
WITH daily AS (
  SELECT CAST(date_diff('day',
              (SELECT min(date_trunc('day', l_shipdate)) FROM lineitem),
              date_trunc('day', l_shipdate)) AS BIGINT) AS x,
         CASE WHEN date_trunc('day', l_shipdate) < TIMESTAMP '{_ITS_CUTOFF} 00:00:00'
              THEN 0 ELSE 1 END AS seg,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM lineitem GROUP BY 1, 2
), m AS (
  SELECT seg, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
  FROM daily GROUP BY 1
), fit AS (
  SELECT seg, n,
         (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
           / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) AS b,
         sx, sy
  FROM m
), fit2 AS (
  SELECT seg, n, b, (CAST(sy AS DOUBLE) - b * sx) / n AS a FROM fit
), cut AS (
  SELECT CAST(date_diff('day',
              (SELECT min(date_trunc('day', l_shipdate)) FROM lineitem),
              TIMESTAMP '{_ITS_CUTOFF} 00:00:00') AS BIGINT) AS x0
), w AS (
  SELECT
    max(CASE WHEN seg = 0 THEN n END) AS n_pre,
    max(CASE WHEN seg = 1 THEN n END) AS n_post,
    max(CASE WHEN seg = 0 THEN b END) AS b_pre,
    max(CASE WHEN seg = 1 THEN b END) AS b_post,
    max(CASE WHEN seg = 0 THEN a END) AS a_pre,
    max(CASE WHEN seg = 1 THEN a END) AS a_post
  FROM fit2
)
SELECT n_pre, n_post,
       floor(b_pre * 10000 + 0.5) / 10000.0 AS slope_pre,
       floor(b_post * 10000 + 0.5) / 10000.0 AS slope_post,
       floor((b_post - b_pre) * 10000 + 0.5) / 10000.0 AS slope_change,
       floor(((a_post + b_post * x0) - (a_pre + b_pre * x0)) * 10000 + 0.5)
         / 10000.0 AS level_jump_cents
FROM w CROSS JOIN cut
""",
)
def agg_its_segmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERRUPTED-TIME-SERIES segmented regression of daily revenue at
    the {c} intervention date: independent OLS fits on the pre and
    post segments, reporting the slope change and the level jump (post
    prediction minus pre prediction AT the cutoff) — the standard
    policy-change / launch-impact estimator when there is no control
    group at all (``agg_did`` needs one; ITS borrows the pre-period
    trend as its own counterfactual).

    Exactness: both segments' OLS moments are exact int64 on the day
    grain (the agg_trend_ols recipe, one extra GROUP BY seg); slopes,
    intercepts, the jump and the change are fixed-order closed-form
    doubles; the cutoff's day index is the same integer both engines.

    Scale shape: one map-side-combined groupBy to (day, segment), one
    2-row moment aggregate, projection algebra after — the ITS
    machinery costs exactly one scan more than nothing."""
    li = table(spark, sf_dir, "lineitem")
    t0 = li.agg(F.min(F.date_trunc("day", "l_shipdate")).alias("t0"))
    cutoff = F.lit(_ITS_CUTOFF + " 00:00:00").cast("timestamp")
    daily = (
        li.crossJoin(F.broadcast(t0))
        .groupBy(
            F.datediff(F.date_trunc("day", "l_shipdate"), "t0").cast("long").alias("x"),
            F.when(F.date_trunc("day", "l_shipdate") < cutoff, 0).otherwise(1).alias("seg"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("y")
        )
    )
    m = daily.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    b = (
        F.col("n") * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n") * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx")
    )
    fit = m.select("seg", "n", b.alias("b"), "sx", "sy").select(
        "seg",
        "n",
        "b",
        ((F.col("sy").cast("double") - F.col("b") * F.col("sx")) / F.col("n")).alias("a"),
    )
    x0 = t0.select(
        F.datediff(F.lit(_ITS_CUTOFF).cast("date"), F.col("t0").cast("date"))
        .cast("long")
        .alias("x0")
    )

    def seg(s, expr):
        return F.max(F.when(F.col("seg") == s, expr))

    w = fit.agg(
        seg(0, F.col("n")).alias("n_pre"),
        seg(1, F.col("n")).alias("n_post"),
        seg(0, F.col("b")).alias("b_pre"),
        seg(1, F.col("b")).alias("b_post"),
        seg(0, F.col("a")).alias("a_pre"),
        seg(1, F.col("a")).alias("a_post"),
    ).crossJoin(F.broadcast(x0))
    jump = (F.col("a_post") + F.col("b_post") * F.col("x0")) - (
        F.col("a_pre") + F.col("b_pre") * F.col("x0")
    )
    q4 = lambda c: F.floor(c * 10000 + 0.5) / 10000.0
    return w.select(
        "n_pre",
        "n_post",
        q4(F.col("b_pre")).alias("slope_pre"),
        q4(F.col("b_post")).alias("slope_post"),
        q4(F.col("b_post") - F.col("b_pre")).alias("slope_change"),
        q4(jump).alias("level_jump_cents"),
    )


agg_its_segmented.__doc__ = agg_its_segmented.__doc__.format(c=_ITS_CUTOFF)


_HW_ALPHA, _HW_BETA, _HW_GAMMA = 0.3, 0.1, 0.2
_HW_M = 7  # season length (weekly)


def _hw_sql():
    """DuckDB fold step for Holt-Winters: state = 9-double LIST
    [l, b, s_oldest..s_newest] (positional — the struct_pack-rebinding
    hazard documented on ext_ts_holt), element x = [y, 0 x8]."""
    A, B, G = _HW_ALPHA, _HW_BETA, _HW_GAMMA
    lp = (
        f"(CAST({A} AS DOUBLE) * (x[1] - a[3])"
        f" + (1.0 - CAST({A} AS DOUBLE)) * (a[1] + a[2]))"
    )
    bp = (
        f"(CAST({B} AS DOUBLE) * ({lp} - a[1])"
        f" + (1.0 - CAST({B} AS DOUBLE)) * a[2])"
    )
    sp = (
        f"(CAST({G} AS DOUBLE) * (x[1] - {lp})"
        f" + (1.0 - CAST({G} AS DOUBLE)) * a[3])"
    )
    return f"[{lp}, {bp}, a[4], a[5], a[6], a[7], a[8], a[9], {sp}]"


@register(
    "ext_ts_holt_winters",
    oracle=f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS d,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
arr AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         list(CAST(cents AS DOUBLE) ORDER BY d) AS ys
  FROM daily GROUP BY 1 HAVING count(*) >= 2 * {_HW_M} + 1
),
init AS (
  SELECT event_type, n, ys,
         list_reduce(ys[1:{_HW_M}], (p, q) -> p + q) / {_HW_M}.0 AS l0,
         (list_reduce(ys[{_HW_M} + 1:2 * {_HW_M}], (p, q) -> p + q) / {_HW_M}.0
          - list_reduce(ys[1:{_HW_M}], (p, q) -> p + q) / {_HW_M}.0)
           / {_HW_M}.0 AS b0
  FROM arr
),
folded AS (
  SELECT event_type, n,
         list_reduce(
           list_prepend(
             list_concat([l0, b0],
               list_transform(ys[1:{_HW_M}],
                 e -> e - l0)),
             list_transform(ys[{_HW_M} + 1:],
               e -> [e, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
                     CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
                     CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)])),
           (a, x) -> {_hw_sql()}) AS st
  FROM init
)
SELECT event_type, CAST(h AS BIGINT) AS h,
       floor((st[1] + h * st[2] + st[2 + h]) * 10000 + 0.5) / 10000.0
         AS forecast_cents
FROM folded, (SELECT unnest(generate_series(1, {_HW_M})) AS h)
ORDER BY event_type, h
""",
)
def ext_ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOLT-WINTERS ADDITIVE seasonal forecasting (α={a} β={b} γ={g},
    weekly season m={m}) over each event type's daily revenue series:
    level + trend + a rotating {m}-slot seasonal queue, folded
    sequentially, emitting the {m}-day-ahead forecast curve — the
    seasonal completion of the family (``ext_ts_ewma`` level-only,
    ``ext_ts_holt`` level+trend, this adds the component
    ``ext_ts_seasonal``/``ext_ts_decompose`` only MEASURE).

    The recursion is inherently sequential, so it runs as a per-series
    left fold whose state is a POSITIONAL 9-double list
    [l, b, s_oldest..s_newest] — a list, not a struct, because DuckDB
    1.0's struct_pack inside a lambda rebinds already-assigned field
    names (the ext_ts_holt hazard) — with the season handled as a
    ROTATING QUEUE (read slot 3, append the refreshed value) so no
    indexed list write ever happens.  Init is the textbook first-season
    mean / season-mean-difference trend / first-season deviations;
    both engines run the identical arithmetic in identical order.

    Scale shape: one map-side-combined groupBy to the day grain, one
    per-series bounded array (days in retention — the documented
    spine bound), series parallel across the groupBy; output is
    |series|×{m} rows."""
    A, B, G = _HW_ALPHA, _HW_BETA, _HW_GAMMA
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.date_trunc("day", "ts").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents")
    )
    arr = (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "cents"))),
                lambda s: s.getField("cents").cast("double"),
            ).alias("ys"),
        )
        .filter(F.col("n") >= 2 * _HW_M + 1)
    )
    season_sum = F.aggregate(
        F.slice(F.col("ys"), 1, _HW_M), F.lit(0.0), lambda p, q: p + q
    )
    season2_sum = F.aggregate(
        F.slice(F.col("ys"), _HW_M + 1, _HW_M), F.lit(0.0), lambda p, q: p + q
    )
    # DuckDB's list_reduce has no init; its first-season fold starts from
    # ys[1], i.e. computes y1+y2+...+y7 left-to-right.  F.aggregate's 0.0
    # init prepends one exact +0.0 — IEEE-identical for finite doubles.
    init = arr.select(
        "event_type",
        "n",
        "ys",
        (season_sum / float(_HW_M)).alias("l0"),
        ((season2_sum / float(_HW_M) - season_sum / float(_HW_M)) / float(_HW_M)).alias(
            "b0"
        ),
    )
    state0 = F.concat(
        F.array(F.col("l0"), F.col("b0")),
        F.transform(F.slice(F.col("ys"), 1, _HW_M), lambda e: e - F.col("l0")),
    )

    def step(a, x):
        y = F.element_at(x, 1)
        lp = F.lit(A) * (y - F.element_at(a, 3)) + F.lit(1.0 - A) * (
            F.element_at(a, 1) + F.element_at(a, 2)
        )
        bp = F.lit(B) * (lp - F.element_at(a, 1)) + F.lit(1.0 - B) * F.element_at(a, 2)
        sp = F.lit(G) * (y - lp) + F.lit(1.0 - G) * F.element_at(a, 3)
        return F.concat(
            F.array(lp, bp),
            F.slice(a, 4, 6),
            F.array(sp),
        )

    tail = F.transform(
        F.slice(F.col("ys"), _HW_M + 1, F.size("ys") - _HW_M),
        lambda e: F.concat(F.array(e), F.array_repeat(F.lit(0.0), 8)),
    )
    folded = init.select(
        "event_type",
        "n",
        F.aggregate(tail, state0, step).alias("st"),
    )
    hs = folded.select(
        "event_type",
        "st",
        F.explode(F.sequence(F.lit(1), F.lit(_HW_M))).alias("h"),
    )
    fc = (
        F.element_at(F.col("st"), 1)
        + F.col("h") * F.element_at(F.col("st"), 2)
        + F.element_at(F.col("st"), F.col("h") + 2)
    )
    return hs.select(
        "event_type",
        F.col("h").cast("long").alias("h"),
        (F.floor(fc * 10000 + 0.5) / 10000.0).alias("forecast_cents"),
    ).orderBy("event_type", "h")


ext_ts_holt_winters.__doc__ = ext_ts_holt_winters.__doc__.format(
    a=_HW_ALPHA, b=_HW_BETA, g=_HW_GAMMA, m=_HW_M
)


_THETA_ALPHA = 0.3  # SES coefficient for the theta=2 line
_THETA_H = 7  # forecast horizon (days)


@register(
    "ext_ts_theta",
    oracle=f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS d,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
), seq AS (
  SELECT event_type, cents,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY d) AS BIGINT) AS t
  FROM daily
), m AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(t) AS BIGINT) AS st, CAST(sum(cents) AS BIGINT) AS sy,
         CAST(sum(t * cents) AS BIGINT) AS sty, CAST(sum(t * t) AS BIGINT) AS stt
  FROM seq GROUP BY 1 HAVING count(*) >= 3
), fit AS (
  SELECT event_type, n,
         (n * CAST(sty AS DOUBLE) - CAST(st AS DOUBLE) * sy)
           / (n * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st) AS b,
         st, sy
  FROM m
), fit2 AS (
  SELECT event_type, n, b, (CAST(sy AS DOUBLE) - b * st) / n AS a FROM fit
), z AS (
  SELECT s.event_type, f.n, f.a, f.b,
         list(2.0 * s.cents - (f.a + f.b * s.t) ORDER BY s.t) AS zs
  FROM seq s JOIN fit2 f ON s.event_type = f.event_type
  GROUP BY 1, 2, 3, 4
), ses AS (
  SELECT event_type, n, a, b,
         list_reduce(zs,
           (acc, x) -> CAST({_THETA_ALPHA} AS DOUBLE) * x
                       + (1.0 - CAST({_THETA_ALPHA} AS DOUBLE)) * acc) AS lvl
  FROM z
)
SELECT event_type, CAST(h AS BIGINT) AS h,
       floor(0.5 * ((a + b * (n + h)) + lvl) * 10000 + 0.5) / 10000.0
         AS forecast_cents
FROM ses, (SELECT unnest(generate_series(1, {_THETA_H})) AS h)
ORDER BY event_type, h
""",
)
def ext_ts_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THETA-METHOD forecast (Assimakopoulos & Nikolopoulos 2000, the
    M3-competition winner; θ = 2): decompose each event type's daily
    series into the θ=0 line (the OLS trend, extrapolated linearly)
    and the θ=2 line (2y − trend, double local curvature, smoothed by
    SES α={a}) and average the two {h}-day-ahead forecasts — the
    strong simple baseline every fancier forecaster must beat, closing
    the family ``ext_ts_ewma`` → ``ext_ts_holt`` →
    ``ext_ts_holt_winters``.

    Exactness: the OLS moments are exact int64 on the per-series
    (t, cents) grain; the θ=2 line is a per-row double expression; its
    SES is a sequential fold over the t-sorted bounded array whose
    init is the FIRST element on both engines (DuckDB list_reduce's
    natural start == Spark's element_at(zs,1) init over the tail);
    the combination is one closed-form double.

    Scale shape: day-grain groupBy, per-series rank window (calendar-
    bounded), a 1-row-per-series moment aggregate joined back, one
    bounded fold; output |series|×{h} rows."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.date_trunc("day", "ts").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents")
    )
    wt = Window.partitionBy("event_type").orderBy("d")
    seq = daily.select(
        "event_type", "cents", F.row_number().over(wt).cast("long").alias("t")
    )
    m = (
        seq.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("t").cast("long").alias("st"),
            F.sum("cents").cast("long").alias("sy"),
            F.sum(F.col("t") * F.col("cents")).cast("long").alias("sty"),
            F.sum(F.col("t") * F.col("t")).cast("long").alias("stt"),
        )
        .filter(F.col("n") >= 3)
    )
    b = (
        F.col("n") * F.col("sty").cast("double") - F.col("st").cast("double") * F.col("sy")
    ) / (
        F.col("n") * F.col("stt").cast("double") - F.col("st").cast("double") * F.col("st")
    )
    fit = m.select("event_type", "n", b.alias("b"), "st", "sy").select(
        "event_type",
        "n",
        "b",
        ((F.col("sy").cast("double") - F.col("b") * F.col("st")) / F.col("n")).alias("a"),
    )
    z = (
        seq.join(fit, "event_type")
        .select(
            "event_type",
            "n",
            "a",
            "b",
            "t",
            (2.0 * F.col("cents") - (F.col("a") + F.col("b") * F.col("t"))).alias("zv"),
        )
        .groupBy("event_type", "n", "a", "b")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("t", "zv"))),
                lambda s: s.getField("zv"),
            ).alias("zs")
        )
    )
    A = _THETA_ALPHA
    lvl = F.aggregate(
        F.slice(F.col("zs"), 2, F.greatest(F.size("zs") - 1, F.lit(0))),
        F.element_at(F.col("zs"), 1),
        lambda acc, x: F.lit(A) * x + F.lit(1.0 - A) * acc,
    )
    ses = z.select("event_type", "n", "a", "b", lvl.alias("lvl"))
    hs = ses.select(
        "event_type",
        "n",
        "a",
        "b",
        "lvl",
        F.explode(F.sequence(F.lit(1), F.lit(_THETA_H))).alias("h"),
    )
    fc = 0.5 * ((F.col("a") + F.col("b") * (F.col("n") + F.col("h"))) + F.col("lvl"))
    return hs.select(
        "event_type",
        F.col("h").cast("long").alias("h"),
        (F.floor(fc * 10000 + 0.5) / 10000.0).alias("forecast_cents"),
    ).orderBy("event_type", "h")


ext_ts_theta.__doc__ = ext_ts_theta.__doc__.format(a=_THETA_ALPHA, h=_THETA_H)


_KF_Q = 1.0e7  # process variance (cents^2): how fast the level may drift
_KF_R = 1.0e8  # observation variance (cents^2): day-total noise


@register(
    "ext_ts_kalman",
    oracle=f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS d,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
arr AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         list(CAST(cents AS DOUBLE) ORDER BY d) AS ys
  FROM daily GROUP BY 1
),
folded AS (
  -- state is a positional [m, p, sse] list (the ext_ts_holt discipline:
  -- struct_pack in a lambda rebinds already-assigned names)
  SELECT event_type, n,
         list_reduce(
           list_prepend([ys[1], CAST({_KF_R} AS DOUBLE), CAST(0 AS DOUBLE)],
                        list_transform(ys[2:],
                                       e -> [e, CAST(0 AS DOUBLE),
                                             CAST(0 AS DOUBLE)])),
           (a, x) -> [
             a[1] + ((a[2] + {_KF_Q}) / ((a[2] + {_KF_Q}) + {_KF_R}))
                     * (x[1] - a[1]),
             (1.0 - ((a[2] + {_KF_Q}) / ((a[2] + {_KF_Q}) + {_KF_R})))
               * (a[2] + {_KF_Q}),
             a[3] + (x[1] - a[1]) * (x[1] - a[1])
           ]
         ) AS st
  FROM arr WHERE n >= 2
)
SELECT event_type, n,
       floor(st[1] * 10000 + 0.5) / 10000.0 AS level_cents,
       floor(st[2] * 10000 + 0.5) / 10000.0 AS level_var,
       floor(((st[2] + {_KF_Q}) / ((st[2] + {_KF_Q}) + {_KF_R}))
             * 1000000 + 0.5) / 1000000.0 AS gain_next,
       floor(sqrt(st[3] / (n - 1)) * 10000 + 0.5) / 10000.0
         AS innovation_rmse
FROM folded
ORDER BY event_type
""",
)
def ext_ts_kalman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCAL-LEVEL KALMAN FILTER over each event type's daily revenue
    series (random-walk state + observation noise, fixed Q/R): final
    filtered level and its posterior variance, the steady-state-ish
    next-step gain, and the one-step innovation RMSE — the optimal
    recursive state estimator next to the fixed-alpha smoothers
    (``ext_ts_ewma`` / ``ext_ts_holt``): the gain ADAPTS to the
    accumulated uncertainty instead of being a constant.

    Recursion per observation: p_pred = p + Q; k = p_pred / (p_pred +
    R); m += k (y - m); p = (1 - k) p_pred — inherently SEQUENTIAL, so
    it runs as the same per-series left fold as ``ext_ts_holt``
    (``F.aggregate`` == DuckDB ``list_reduce``, positional [m, p, sse]
    list state, identical arithmetic order both engines — the float-
    determinism discipline), initialized m = y1, p = R.  Series are
    CALENDAR-bounded (days in retention); series parallelize across
    the groupBy; one corpus scan total."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.date_trunc("day", "ts").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents")
    )
    arr = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("d"), F.col("cents").cast("double").alias("y"))
                )
            ),
            lambda s: s.getField("y"),
        ).alias("ys"),
    ).filter(F.col("n") >= 2)
    Q, R = float(_KF_Q), float(_KF_R)

    def step(acc, y):
        m, p, sse = acc.getField("m"), acc.getField("p"), acc.getField("sse")
        k = (p + Q) / ((p + Q) + R)
        return F.struct(
            (m + k * (y - m)).alias("m"),
            ((F.lit(1.0) - k) * (p + Q)).alias("p"),
            (sse + (y - m) * (y - m)).alias("sse"),
        )

    init = F.struct(
        F.element_at("ys", 1).alias("m"),
        F.lit(R).alias("p"),
        F.lit(0.0).alias("sse"),
    )
    st = F.aggregate(F.slice("ys", 2, F.size("ys") - 1), init, step)

    def q4(x):
        return F.floor(x * 10000 + 0.5) / 10000.0

    folded = arr.select("event_type", "n", st.alias("st"))
    gain_next = (F.col("st.p") + Q) / ((F.col("st.p") + Q) + R)
    return folded.select(
        "event_type",
        "n",
        q4(F.col("st.m")).alias("level_cents"),
        q4(F.col("st.p")).alias("level_var"),
        (F.floor(gain_next * 1000000 + 0.5) / 1000000.0).alias("gain_next"),
        q4(F.sqrt(F.col("st.sse") / (F.col("n") - 1))).alias("innovation_rmse"),
    ).orderBy("event_type")


# Granger daily series in whole DOLLARS / raw counts so every moment
# product stays exact int64 far past sf1 (daily purchase dollars ~1.7e6
# at sf1; squared ~2.8e12; day-count-bounded sums << 2^63).
_GRANGER_SQL_DAILY = """
  SELECT date_trunc('day', ts) AS d,
         CAST(floor(sum(CASE WHEN event_type = 'purchase'
                             THEN CAST(round(value * 100) AS BIGINT)
                             ELSE 0 END) / 100.0) AS BIGINT) AS pd,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS ck
  FROM events GROUP BY 1
"""


@register(
    "ext_ts_granger",
    oracle=f"""
WITH daily AS ({_GRANGER_SQL_DAILY}
), lagged AS (
  SELECT pd, ck,
         lag(pd) OVER (ORDER BY d) AS pl,
         lag(ck) OVER (ORDER BY d) AS cl
  FROM daily
), pts AS (
  SELECT * FROM (
    SELECT 'clicks->purchases' AS direction, pd AS y, pl AS yl, cl AS xl
    FROM lagged WHERE pl IS NOT NULL
    UNION ALL
    SELECT 'purchases->clicks' AS direction, ck AS y, cl AS yl, pl AS xl
    FROM lagged WHERE pl IS NOT NULL
  )
), m AS (
  SELECT direction, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS sy, CAST(sum(yl) AS BIGINT) AS s1,
         CAST(sum(xl) AS BIGINT) AS s2,
         CAST(sum(yl * yl) AS BIGINT) AS s11,
         CAST(sum(xl * xl) AS BIGINT) AS s22,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(yl * xl) AS BIGINT) AS s12,
         CAST(sum(yl * y) AS BIGINT) AS s1y,
         CAST(sum(xl * y) AS BIGINT) AS s2y
  FROM pts GROUP BY 1
), c AS (
  SELECT direction, n,
         CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n AS c11,
         CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n AS c22,
         CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n AS cyy,
         CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * s2 / n AS c12,
         CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * sy / n AS c1y,
         CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * sy / n AS c2y
  FROM m
), f AS (
  SELECT direction, n, cyy, c1y, c2y,
         cyy - c1y * c1y / c11 AS rss_r,
         ((c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12)) AS b1,
         ((c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12)) AS b2
  FROM c
)
SELECT direction, n,
       floor(b2 * 1000000 + 0.5) / 1000000.0 AS beta_cross,
       floor((rss_r - (cyy - (b1 * c1y + b2 * c2y)))
             / ((cyy - (b1 * c1y + b2 * c2y)) / (n - 3))
             * 1000000 + 0.5) / 1000000.0 AS f_granger
FROM f
ORDER BY direction
""",
)
def ext_ts_granger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRANGER CAUSALITY (lag-1, both directions) between the daily
    click-count and daily purchase-dollars series: does yesterday's X
    improve today's Y prediction beyond yesterday's Y?  F = (RSS_r -
    RSS_u) / (RSS_u / (n-3)) comparing the restricted AR(1) against
    the unrestricted y_t ~ y_(t-1) + x_(t-1) — the directional
    lead-lag test ``ext_ts_crosscorr``'s symmetric CCF cannot give
    (correlation at lag k says "moves together", Granger says "adds
    predictive information").

    Both regressions are CLOSED-FORM over centered moments (the
    ``agg_ols_multi`` 2x2 Cramer solve; restricted RSS = Syy -
    S1y^2/S11) from exact int64 sums — daily dollars/counts keep every
    product far inside int64 past sf1.  The day spine is CALENDAR-
    bounded, so the one unpartitioned lag window is bounded by
    construction (the hour-spine discipline of win_gap_fill_locf);
    the corpus contributes one day-grain combine."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.floor(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("long"),
                ).otherwise(0)
            )
            / 100.0
        )
        .cast("long")
        .alias("pd"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("ck"),
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "pd",
        "ck",
        F.lag("pd").over(w).alias("pl"),
        F.lag("ck").over(w).alias("cl"),
    ).filter(F.col("pl").isNotNull())
    pts = lagged.select(
        F.lit("clicks->purchases").alias("direction"),
        F.col("pd").alias("y"),
        F.col("pl").alias("yl"),
        F.col("cl").alias("xl"),
    ).unionAll(
        lagged.select(
            F.lit("purchases->clicks").alias("direction"),
            F.col("ck").alias("y"),
            F.col("cl").alias("yl"),
            F.col("pl").alias("xl"),
        )
    )
    m = pts.groupBy("direction").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("yl").cast("long").alias("s1"),
        F.sum("xl").cast("long").alias("s2"),
        F.sum(F.col("yl") * F.col("yl")).cast("long").alias("s11"),
        F.sum(F.col("xl") * F.col("xl")).cast("long").alias("s22"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("yl") * F.col("xl")).cast("long").alias("s12"),
        F.sum(F.col("yl") * F.col("y")).cast("long").alias("s1y"),
        F.sum(F.col("xl") * F.col("y")).cast("long").alias("s2y"),
    )
    n = F.col("n")
    c = m.select(
        "direction",
        "n",
        (F.col("s11").cast("double") - F.col("s1").cast("double") * F.col("s1") / n).alias("c11"),
        (F.col("s22").cast("double") - F.col("s2").cast("double") * F.col("s2") / n).alias("c22"),
        (F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / n).alias("cyy"),
        (F.col("s12").cast("double") - F.col("s1").cast("double") * F.col("s2") / n).alias("c12"),
        (F.col("s1y").cast("double") - F.col("s1").cast("double") * F.col("sy") / n).alias("c1y"),
        (F.col("s2y").cast("double") - F.col("s2").cast("double") * F.col("sy") / n).alias("c2y"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    f = c.select(
        "direction",
        "n",
        "cyy",
        "c1y",
        "c2y",
        (F.col("cyy") - F.col("c1y") * F.col("c1y") / F.col("c11")).alias("rss_r"),
        ((F.col("c1y") * F.col("c22") - F.col("c2y") * F.col("c12")) / det).alias("b1"),
        ((F.col("c2y") * F.col("c11") - F.col("c1y") * F.col("c12")) / det).alias("b2"),
    )
    rss_u = F.col("cyy") - (F.col("b1") * F.col("c1y") + F.col("b2") * F.col("c2y"))
    r6l = lambda x: F.floor(x * 1000000 + 0.5) / 1000000.0  # noqa: E731
    return f.select(
        "direction",
        "n",
        r6l(F.col("b2")).alias("beta_cross"),
        r6l((F.col("rss_r") - rss_u) / (rss_u / (F.col("n") - 3))).alias("f_granger"),
    ).orderBy("direction")


@register(
    "ext_ts_ar2",
    oracle=f"""
WITH daily AS ({_GRANGER_SQL_DAILY}
), lagged AS (
  SELECT d, pd,
         lag(pd, 1) OVER (ORDER BY d) AS l1,
         lag(pd, 2) OVER (ORDER BY d) AS l2
  FROM daily
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS t,
         CAST(sum(pd) AS BIGINT) AS sy,
         CAST(sum(pd * pd) AS BIGINT) AS syy,
         CAST(sum(CASE WHEN l1 IS NOT NULL THEN pd * l1 ELSE 0 END)
              AS BIGINT) AS p1,
         CAST(sum(CASE WHEN l1 IS NOT NULL THEN pd ELSE 0 END)
              AS BIGINT) AS h1,
         CAST(sum(CASE WHEN l1 IS NOT NULL THEN l1 ELSE 0 END)
              AS BIGINT) AS t1,
         CAST(sum(CASE WHEN l1 IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS k1,
         CAST(sum(CASE WHEN l2 IS NOT NULL THEN pd * l2 ELSE 0 END)
              AS BIGINT) AS p2,
         CAST(sum(CASE WHEN l2 IS NOT NULL THEN pd ELSE 0 END)
              AS BIGINT) AS h2,
         CAST(sum(CASE WHEN l2 IS NOT NULL THEN l2 ELSE 0 END)
              AS BIGINT) AS t2,
         CAST(sum(CASE WHEN l2 IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS k2,
         CAST(max_by(pd, d) AS BIGINT) AS y_t,
         CAST(max_by(coalesce(l1, 0), d) AS BIGINT) AS y_t1
  FROM lagged
), c AS (
  SELECT t, y_t, y_t1,
         CAST(sy AS DOUBLE) / t AS mu,
         (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / t) / t AS c0,
         (CAST(p1 AS DOUBLE) - (CAST(sy AS DOUBLE) / t) * (h1 + t1)
          + k1 * ((CAST(sy AS DOUBLE) / t) * (CAST(sy AS DOUBLE) / t))) / t
           AS c1,
         (CAST(p2 AS DOUBLE) - (CAST(sy AS DOUBLE) / t) * (h2 + t2)
          + k2 * ((CAST(sy AS DOUBLE) / t) * (CAST(sy AS DOUBLE) / t))) / t
           AS c2
  FROM m
), r AS (
  SELECT t, y_t, y_t1, mu, c0, c1 / c0 AS r1, c2 / c0 AS r2 FROM c
), phi AS (
  SELECT t, y_t, y_t1, mu, c0, r1, r2,
         r1 * (1 - r2) / (1 - r1 * r1) AS phi1,
         (r2 - r1 * r1) / (1 - r1 * r1) AS phi2
  FROM r
)
SELECT t AS n_days,
       floor(r1 * 1000000 + 0.5) / 1000000.0 AS acf1,
       floor(r2 * 1000000 + 0.5) / 1000000.0 AS acf2,
       floor(phi1 * 1000000 + 0.5) / 1000000.0 AS phi1,
       floor(phi2 * 1000000 + 0.5) / 1000000.0 AS phi2,
       floor((mu + phi1 * (y_t - mu) + phi2 * (y_t1 - mu)) * 10000 + 0.5)
         / 10000.0 AS forecast_dollars,
       floor(c0 * (1 - phi1 * r1 - phi2 * r2) * 10000 + 0.5) / 10000.0
         AS innovation_var
FROM phi
""",
)
def ext_ts_ar2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(2) MODEL of the daily purchase-dollars series via YULE-WALKER:
    sample autocorrelations r1/r2, the closed-form coefficients phi1 =
    r1(1-r2)/(1-r1^2), phi2 = (r2-r1^2)/(1-r1^2), the one-step
    forecast, and the innovation variance c0(1 - phi1 r1 - phi2 r2) —
    the autoregressive member of the forecasting family (EWMA has no
    memory structure, Holt has trend, Holt-Winters has season; AR(2)
    captures OSCILLATORY short-memory, e.g. day-over-day rebound).

    Exactness: each biased autocovariance c_k expands to a CLOSED FORM
    over exact int64 sums (sum y_t*y_(t-k), the head/tail partial sums
    and the pair count — no per-row centered doubles), evaluated in
    identical order both engines; last/second-to-last observations come
    from max_by on the day spine.  The day grain is CALENDAR-bounded
    (the ext_ts_granger lag-window discipline); the corpus contributes
    one day-grain combine."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.floor(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("long"),
                ).otherwise(0)
            )
            / 100.0
        )
        .cast("long")
        .alias("pd")
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "d",
        "pd",
        F.lag("pd", 1).over(w).alias("l1"),
        F.lag("pd", 2).over(w).alias("l2"),
    )

    def part(prod, lagc, tag):
        has = F.col(lagc).isNotNull()
        return [
            F.sum(F.when(has, prod).otherwise(0)).cast("long").alias(f"p{tag}"),
            F.sum(F.when(has, F.col("pd")).otherwise(0)).cast("long").alias(f"h{tag}"),
            F.sum(F.when(has, F.col(lagc)).otherwise(0)).cast("long").alias(f"t{tag}"),
            F.sum(F.when(has, 1).otherwise(0)).cast("long").alias(f"k{tag}"),
        ]

    m = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum("pd").cast("long").alias("sy"),
        F.sum(F.col("pd") * F.col("pd")).cast("long").alias("syy"),
        *part(F.col("pd") * F.col("l1"), "l1", "1"),
        *part(F.col("pd") * F.col("l2"), "l2", "2"),
        F.max_by("pd", "d").cast("long").alias("y_t"),
        F.max_by(F.coalesce(F.col("l1"), F.lit(0)), "d").cast("long").alias("y_t1"),
    )
    t = F.col("t")
    mu = F.col("sy").cast("double") / t

    def ck(tag):
        return (
            F.col(f"p{tag}").cast("double")
            - mu * (F.col(f"h{tag}") + F.col(f"t{tag}"))
            + F.col(f"k{tag}") * (mu * mu)
        ) / t

    c = m.select(
        "t",
        "y_t",
        "y_t1",
        mu.alias("mu"),
        ((F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / t) / t).alias("c0"),
        ck("1").alias("c1"),
        ck("2").alias("c2"),
    )
    r = c.select(
        "t",
        "y_t",
        "y_t1",
        "mu",
        "c0",
        (F.col("c1") / F.col("c0")).alias("r1"),
        (F.col("c2") / F.col("c0")).alias("r2"),
    )
    phi1 = F.col("r1") * (1 - F.col("r2")) / (1 - F.col("r1") * F.col("r1"))
    phi2 = (F.col("r2") - F.col("r1") * F.col("r1")) / (1 - F.col("r1") * F.col("r1"))
    p = r.select("t", "y_t", "y_t1", "mu", "c0", "r1", "r2", phi1.alias("phi1"), phi2.alias("phi2"))
    r6l = lambda x: F.floor(x * 1000000 + 0.5) / 1000000.0  # noqa: E731
    q4 = lambda x: F.floor(x * 10000 + 0.5) / 10000.0  # noqa: E731
    return p.select(
        F.col("t").alias("n_days"),
        r6l(F.col("r1")).alias("acf1"),
        r6l(F.col("r2")).alias("acf2"),
        r6l(F.col("phi1")).alias("phi1"),
        r6l(F.col("phi2")).alias("phi2"),
        q4(
            F.col("mu")
            + F.col("phi1") * (F.col("y_t") - F.col("mu"))
            + F.col("phi2") * (F.col("y_t1") - F.col("mu"))
        ).alias("forecast_dollars"),
        q4(
            F.col("c0")
            * (1 - F.col("phi1") * F.col("r1") - F.col("phi2") * F.col("r2"))
        ).alias("innovation_var"),
    )



_LB_LAGS = 7  # Ljung-Box lags tested
# Wilson-Hilferty chi2(m) -> N(0,1) constants, Python-computed once and
# injected as the SAME literals into both engines' expressions.
_LB_WH_A = 1.0 - 2.0 / (9.0 * _LB_LAGS)
_LB_WH_B = math.sqrt(2.0 / (9.0 * _LB_LAGS))
_LB_THIRD = 1.0 / 3.0


def _lb_oracle() -> str:
    from .hypothesis import _norm_cdf_sql

    z = (
        f"(pow(q_lb / {_LB_LAGS}, {_LB_THIRD!r}) - {_LB_WH_A!r}) / {_LB_WH_B!r}"
    )
    return f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hr,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1
), s AS (
  SELECT x, CAST(row_number() OVER (ORDER BY hr) AS BIGINT) AS t
  FROM hourly
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS q
  FROM s
), p AS (
  SELECT lag.k,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(a.x * b.x) AS BIGINT) AS pk,
         CAST(sum(a.x) AS BIGINT) AS ak,
         CAST(sum(b.x) AS BIGINT) AS bk
  FROM s a
  JOIN (SELECT unnest(generate_series(1, {_LB_LAGS})) AS k) lag ON TRUE
  JOIN s b ON b.t = a.t - lag.k
  GROUP BY 1
), r AS (
  SELECT p.k, m.n,
         ((CAST(pk AS DOUBLE)
           - (CAST(sx AS DOUBLE) / n) * (CAST(ak AS DOUBLE) + bk)
           + n_pairs * ((CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)))
          / (CAST(q AS DOUBLE)
             - n * ((CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))))
           AS rk
  FROM p CROSS JOIN m
), qsum AS (
  SELECT CAST(max(n) AS BIGINT) AS n,
         max(n) * (max(n) + 2.0)
           * list_reduce(list(rk * rk / (n - k) ORDER BY k), (a, b) -> a + b)
           AS q_lb
  FROM r
)
SELECT n, CAST({_LB_LAGS} AS BIGINT) AS lags,
       floor(q_lb * 1000000 + 0.5) / 1000000.0 AS q_lb,
       floor((1.0 - {_norm_cdf_sql(z)}) * 1000000 + 0.5) / 1000000.0
         AS p_white
FROM qsum
"""


@register("ext_ts_ljung_box", oracle=_lb_oracle())
def ext_ts_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LJUNG-BOX PORTMANTEAU TEST (lags 1..{m}) on the hourly total
    revenue series: Q = n(n+2) sum r_k^2/(n-k), with an approximate
    p-value via the Wilson-Hilferty chi-square-to-normal transform and
    the shared A&S Phi polynomial — the is-it-white-noise gate in front
    of the forecasting family (fitting Holt/AR(2) to white noise reads
    structure into luck; LB on model RESIDUALS is the standard adequacy
    check, demonstrated here on the raw series).

    Exactness: each r_k uses the ext_ts_acf expansion (every aggregate
    an exact int64; mean-cross terms one closed-form double); the
    {m}-term Q sum is order-sensitive so it folds k-sorted
    (list_reduce == F.aggregate); WH constants are Python literals
    injected identically into both engines.  Scale: one hour-grain
    combine + a {m}-pair lag join on the bounded hour spine."""
    from .hypothesis import _norm_cdf

    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("x")
    )
    w = Window.orderBy("hr")
    s = hourly.select("x", F.row_number().over(w).cast("long").alias("t"))
    m = s.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q"),
    )
    lags = spark.range(1, _LB_LAGS + 1).select(F.col("id").alias("k"))
    a = s.select(F.col("x").alias("xa"), F.col("t").alias("ta"))
    b = s.select(F.col("x").alias("xb"), F.col("t").alias("tb"))
    p = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("tb") == F.col("ta") - F.col("k"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("xa") * F.col("xb")).cast("long").alias("pk"),
            F.sum("xa").cast("long").alias("ak"),
            F.sum("xb").cast("long").alias("bk"),
        )
    )
    j = p.crossJoin(F.broadcast(m))
    mu = F.col("sx").cast("double") / F.col("n")
    rk = (
        F.col("pk").cast("double")
        - mu * (F.col("ak").cast("double") + F.col("bk"))
        + F.col("n_pairs") * (mu * mu)
    ) / (F.col("q").cast("double") - F.col("n") * (mu * mu))
    r = j.select("k", "n", rk.alias("rk"))
    qsum = r.groupBy().agg(
        F.max("n").cast("long").alias("n"),
        (
            F.max("n") * (F.max("n") + 2.0)
            * F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("k"),
                                (F.col("rk") * F.col("rk") / (F.col("n") - F.col("k"))).alias("v"),
                            )
                        )
                    ),
                    lambda st: st.getField("v"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("q_lb"),
    )
    z = (
        F.pow(F.col("q_lb") / _LB_LAGS, F.lit(_LB_THIRD)) - F.lit(_LB_WH_A)
    ) / F.lit(_LB_WH_B)
    r6l = lambda x: F.floor(x * 1000000 + 0.5) / 1000000.0  # noqa: E731
    return qsum.select(
        "n",
        F.lit(_LB_LAGS).cast("long").alias("lags"),
        r6l(F.col("q_lb")).alias("q_lb"),
        r6l(F.lit(1.0) - _norm_cdf(z)).alias("p_white"),
    )


ext_ts_ljung_box.__doc__ = ext_ts_ljung_box.__doc__.format(m=_LB_LAGS)


# ---------------------------------------------------------------------------
# Financial-indicator trio over the OHLC bar grain (round 15, wave G).
# Shared discipline: bars are EXACT integer cents at the (type, day)
# calendar grain; every multi-term double sum is an EXPLICIT lag chain
# (left-associated identically in both engines), never a window
# aggregate over doubles whose association an engine may re-tree.
# ---------------------------------------------------------------------------

_BARS_SQL = """pts AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
), rn AS (
  SELECT event_type, day, c,
         row_number() OVER (PARTITION BY event_type, day
                            ORDER BY ts DESC, event_id DESC) AS r_close
  FROM pts
), bars AS (
  SELECT event_type, day,
         CAST(max(c) AS BIGINT) AS hi, CAST(min(c) AS BIGINT) AS lo,
         CAST(max(CASE WHEN r_close = 1 THEN c END) AS BIGINT) AS cl
  FROM rn GROUP BY 1, 2
)"""


def _bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, day, hi, lo, cl): exact integer-cent daily bars with
    the deterministic (ts, event_id)-ordered close."""
    ev = table(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    w_close = Window.partitionBy("event_type", "day").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    rn = pts.withColumn("r_close", F.row_number().over(w_close))
    return rn.groupBy("event_type", "day").agg(
        F.max("c").cast("long").alias("hi"),
        F.min("c").cast("long").alias("lo"),
        F.max(F.when(F.col("r_close") == 1, F.col("c"))).cast("long").alias("cl"),
    )


_ATR_N = 14


@register(
    "win_atr",
    oracle=f"""
WITH {_BARS_SQL},
tr AS (
  SELECT event_type, day, hi, lo,
         lag(cl) OVER (PARTITION BY event_type ORDER BY day) AS pc
  FROM bars
),
trv AS (
  SELECT event_type, day,
         CASE WHEN pc IS NULL THEN hi - lo
              ELSE greatest(hi - lo, abs(hi - pc), abs(lo - pc)) END AS tr
  FROM tr
),
atr AS (
  SELECT event_type, day, tr,
         CAST(sum(tr) OVER w14 AS BIGINT) AS s14,
         CAST(count(*) OVER w14 AS BIGINT) AS c14
  FROM trv
  WINDOW w14 AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN {_ATR_N - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_type, day,
       floor(CAST(tr AS DOUBLE) / 100.0 * 10000 + 0.5) / 10000.0 AS true_range,
       floor(CAST(s14 AS DOUBLE) / c14 / 100.0 * 1000000 + 0.5) / 1000000.0
         AS atr
FROM atr ORDER BY event_type, day
""",
)
def win_atr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVERAGE TRUE RANGE (n = {n}) per event type over the daily OHLC
    bars: TR = max(high-low, |high-prev_close|, |low-prev_close|) — the
    gap-aware volatility unit every alerting threshold in the
    ``win_bollinger``/``win_rsi`` family should be denominated in (a
    range that ignores overnight gaps understates risk; TR does not).
    ATR here is the rolling {n}-bar simple mean (warm-up rows average
    what exists).

    TR is EXACT integer cents (greatest/abs of int differences), so the
    rolling sum/count window aggregates integers — order-free — and the
    single division is pinned.  Scale: the bar frame is calendar x
    type bounded; one partition-key shuffle for the window sort."""
    bars = _bars(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day")
    tr = bars.withColumn("pc", F.lag("cl").over(w))
    trv = tr.select(
        "event_type",
        "day",
        F.when(F.col("pc").isNull(), F.col("hi") - F.col("lo"))
        .otherwise(
            F.greatest(
                F.col("hi") - F.col("lo"),
                F.abs(F.col("hi") - F.col("pc")),
                F.abs(F.col("lo") - F.col("pc")),
            )
        )
        .alias("tr"),
    )
    w14 = w.rowsBetween(-(_ATR_N - 1), Window.currentRow)
    atr = trv.select(
        "event_type",
        "day",
        "tr",
        F.sum("tr").over(w14).cast("long").alias("s14"),
        F.count(F.lit(1)).over(w14).cast("long").alias("c14"),
    )
    return atr.select(
        "event_type",
        "day",
        (F.floor(F.col("tr").cast("double") / 100.0 * 10000 + 0.5) / 10000.0).alias(
            "true_range"
        ),
        (
            F.floor(
                F.col("s14").cast("double") / F.col("c14") / 100.0 * 1000000 + 0.5
            )
            / 1000000.0
        ).alias("atr"),
    ).orderBy("event_type", "day")


win_atr.__doc__ = win_atr.__doc__.format(n=_ATR_N)

# Bounded-kernel EMA weights (the ext_ts_ewma discipline): 8 lags, the
# literal doubles spliced verbatim into BOTH engines' expressions.
_MACD_K = 8
_MACD_W12 = [(1.0 - 2.0 / 13.0) ** i for i in range(_MACD_K)]
_MACD_W26 = [(1.0 - 2.0 / 27.0) ** i for i in range(_MACD_K)]
_MACD_W9 = [(1.0 - 2.0 / 10.0) ** i for i in range(_MACD_K)]


def _kernel_sql(col: str, weights: list[float], win: str) -> str:
    num = " + ".join(
        f"coalesce(lag({col}, {i}) OVER {win} * {w!r}, 0.0)"
        for i, w in enumerate(weights)
    )
    den = " + ".join(
        f"CASE WHEN lag({col}, {i}) OVER {win} IS NOT NULL THEN {w!r} ELSE 0.0 END"
        for i, w in enumerate(weights)
    )
    return f"(({num}) / ({den}))"


def _kernel_col(col, weights: list[float], win) -> "F.Column":
    num = None
    den = None
    for i, wt in enumerate(weights):
        lg = F.lag(col, i).over(win)
        term = F.coalesce(lg * F.lit(wt), F.lit(0.0))
        mask = F.when(lg.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = mask if den is None else den + mask
    return num / den


@register(
    "win_macd",
    oracle=f"""
WITH {_BARS_SQL},
m AS (
  SELECT event_type, day,
         {_kernel_sql("CAST(cl AS DOUBLE)", _MACD_W12, "w")}
         - {_kernel_sql("CAST(cl AS DOUBLE)", _MACD_W26, "w")} AS macd_c
  FROM bars
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
s AS (
  SELECT event_type, day, macd_c,
         {_kernel_sql("macd_c", _MACD_W9, "w")} AS signal_c
  FROM m
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
)
SELECT event_type, day,
       floor(macd_c / 100.0 * 1000000 + 0.5) / 1000000.0 AS macd,
       floor(signal_c / 100.0 * 1000000 + 0.5) / 1000000.0 AS signal,
       floor((macd_c - signal_c) / 100.0 * 1000000 + 0.5) / 1000000.0
         AS histogram
FROM s ORDER BY event_type, day
""",
)
def win_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACD (moving-average convergence/divergence) per event type on
    the daily close: fast EMA(12) minus slow EMA(26), its EMA(9) signal
    line, and the histogram — the momentum-crossover panel that
    completes ``win_ma_crossover``/``win_rsi`` (crossover says WHICH
    side; MACD's histogram says how hard momentum is turning).

    All three EMAs use the engine's bounded 8-lag kernel (the
    ``ext_ts_ewma`` discipline: the recursive form is a serial scan;
    the kernel is a pure lag projection with the weight doubles spliced
    verbatim into both engines, renormalized over warm-up).  The signal
    line is a SECOND kernel pass over the unrounded macd column — both
    engines derive bit-identical inputs, so the nesting is safe.
    Scale: two window passes over the calendar-bounded bar frame."""
    bars = _bars(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day")
    cld = F.col("cl").cast("double")
    m = bars.select(
        "event_type",
        "day",
        (
            _kernel_col(cld, _MACD_W12, w) - _kernel_col(cld, _MACD_W26, w)
        ).alias("macd_c"),
    )
    s = m.select(
        "event_type",
        "day",
        "macd_c",
        _kernel_col(F.col("macd_c"), _MACD_W9, w).alias("signal_c"),
    )
    r6d = lambda c: F.floor(c / 100.0 * 1000000 + 0.5) / 1000000.0  # noqa: E731
    return s.select(
        "event_type",
        "day",
        r6d(F.col("macd_c")).alias("macd"),
        r6d(F.col("signal_c")).alias("signal"),
        r6d(F.col("macd_c") - F.col("signal_c")).alias("histogram"),
    ).orderBy("event_type", "day")


_STOCH_N = 14


@register(
    "win_stochastic_osc",
    oracle=f"""
WITH {_BARS_SQL},
hl AS (
  SELECT event_type, day, cl,
         CAST(max(hi) OVER w14 AS BIGINT) AS hh,
         CAST(min(lo) OVER w14 AS BIGINT) AS ll
  FROM bars
  WINDOW w14 AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN {_STOCH_N - 1} PRECEDING AND CURRENT ROW)
),
k AS (
  SELECT event_type, day,
         CASE WHEN hh = ll THEN 50.0
              ELSE 100.0 * (cl - ll) / (hh - ll) END AS pct_k
  FROM hl
),
d AS (
  SELECT event_type, day, pct_k,
         (pct_k + coalesce(lag(pct_k, 1) OVER w, 0.0)
                + coalesce(lag(pct_k, 2) OVER w, 0.0))
         / (1.0 + CASE WHEN lag(pct_k, 1) OVER w IS NOT NULL
                       THEN 1.0 ELSE 0.0 END
                + CASE WHEN lag(pct_k, 2) OVER w IS NOT NULL
                       THEN 1.0 ELSE 0.0 END) AS pct_d
  FROM k
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
)
SELECT event_type, day,
       floor(pct_k * 1000000 + 0.5) / 1000000.0 AS pct_k,
       floor(pct_d * 1000000 + 0.5) / 1000000.0 AS pct_d
FROM d ORDER BY event_type, day
""",
)
def win_stochastic_osc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STOCHASTIC OSCILLATOR (%K period {n}, %D = 3-bar mean) per event
    type: where does today's close sit inside the rolling {n}-bar
    high-low envelope (0 = at the low, 100 = at the high)?  The
    mean-reversion trigger of the indicator panel — overbought/oversold
    readings that ``win_rsi`` confirms from deltas, this one reads from
    range position.

    The envelope aggregates (max/min) are over exact integer cents —
    order-free; %K is one pinned double expression with the flat-window
    (hh = ll) case fixed at 50; %D is an EXPLICIT left-associated
    3-lag chain over the unrounded %K (never a window aggregate over
    doubles — engines may re-associate those), renormalized over
    warm-up.  Scale: calendar-bounded bar frame, one window sort."""
    bars = _bars(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day")
    w14 = w.rowsBetween(-(_STOCH_N - 1), Window.currentRow)
    hl = bars.select(
        "event_type",
        "day",
        "cl",
        F.max("hi").over(w14).cast("long").alias("hh"),
        F.min("lo").over(w14).cast("long").alias("ll"),
    )
    k = hl.select(
        "event_type",
        "day",
        F.when(F.col("hh") == F.col("ll"), F.lit(50.0))
        .otherwise(
            100.0 * (F.col("cl") - F.col("ll")) / (F.col("hh") - F.col("ll"))
        )
        .alias("pct_k"),
    )
    l1 = F.lag("pct_k", 1).over(w)
    l2 = F.lag("pct_k", 2).over(w)
    d = k.select(
        "event_type",
        "day",
        "pct_k",
        (
            (F.col("pct_k") + F.coalesce(l1, F.lit(0.0)) + F.coalesce(l2, F.lit(0.0)))
            / (
                1.0
                + F.when(l1.isNotNull(), 1.0).otherwise(0.0)
                + F.when(l2.isNotNull(), 1.0).otherwise(0.0)
            )
        ).alias("pct_d"),
    )
    r6l = lambda c: F.floor(c * 1000000 + 0.5) / 1000000.0  # noqa: E731
    return d.select(
        "event_type",
        "day",
        r6l(F.col("pct_k")).alias("pct_k"),
        r6l(F.col("pct_d")).alias("pct_d"),
    ).orderBy("event_type", "day")


win_stochastic_osc.__doc__ = win_stochastic_osc.__doc__.format(n=_STOCH_N)


@register(
    "ext_lis_trend",
    oracle="""
WITH RECURSIVE daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01', date_trunc('day', ts))
              AS BIGINT) AS d,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
              AS BIGINT) AS i,
         y
  FROM daily
),
pr AS (
  SELECT a.event_type, a.i AS i, b.i AS j
  FROM idx a JOIN idx b
    ON a.event_type = b.event_type AND a.i < b.i AND a.y < b.y
),
lis(event_type, i, len) AS (
  SELECT event_type, i, CAST(1 AS BIGINT) FROM idx
  UNION
  SELECT pr.event_type, pr.j, l.len + 1
  FROM lis l JOIN pr ON pr.event_type = l.event_type AND pr.i = l.i
),
agg AS (
  SELECT event_type, CAST(max(i) AS BIGINT) AS n_days,
         CAST(max(len) AS BIGINT) AS lis_len
  FROM lis GROUP BY 1
)
SELECT event_type, n_days, lis_len,
       floor(CAST(lis_len AS DOUBLE) / n_days * 1000000 + 0.5) / 1000000.0
         AS persistence
FROM agg ORDER BY event_type
""",
)
def ext_lis_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LONGEST INCREASING SUBSEQUENCE of each event type's daily
    revenue: the maximum number of days you can pick, in order, with
    strictly rising revenue — the TREND-PERSISTENCE length that is
    immune to any single crash day (one bad day costs an up-trend at
    most one element, where runs (``win_runs``) and drawdowns reset
    entirely).  persistence = LIS/n ~ 1 means a near-monotone month;
    ~0.5 is what an i.i.d. shuffle gives.

    The per-type sequence is CALENDAR-BOUNDED (<= the corpus's day
    count), so the classic patience DP runs as ONE in-plan
    ``F.aggregate`` fold over the day-ordered revenue array — for each
    y, replace the first patience tail >= y (index = #tails < y, the
    tails stay sorted) or append when none — giving the LIS length in
    a single map-side-combined aggregate with zero iterative rounds
    (guide §1.2: the round-15 optimization pass replaced the original
    29-round distributed frontier iteration, whose per-round join +
    checkpoint + isEmpty overhead dominated a <=150-row DP; the
    regression test pins this fold against a reference DP).  The
    oracle keeps the declarative recursive-CTE fixpoint, so the fold
    is value-checked against an independent formulation.  Float
    discipline: everything is exact integers until the final
    persistence ratio."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("y"))
    ys = F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("d").alias("d"), F.col("y").alias("y")))),
        lambda s: s["y"],
    )
    tails = F.aggregate(
        ys,
        F.array().cast("array<long>"),
        lambda acc, y: F.when(
            F.size(F.filter(acc, lambda t: t < y)) == F.size(acc),
            F.concat(acc, F.array(y)),
        ).otherwise(
            F.transform(
                acc,
                lambda t, i: F.when(
                    i == F.size(F.filter(acc, lambda t2: t2 < y)), y
                ).otherwise(t),
            )
        ),
    )
    agg = daily.groupBy(F.col("event_type").alias("et")).agg(
        F.size(ys).cast("long").alias("n_days"),
        F.size(tails).cast("long").alias("lis_len"),
    )
    return agg.select(
        F.col("et").alias("event_type"),
        "n_days",
        "lis_len",
        (
            F.floor(
                F.col("lis_len").cast("double") / F.col("n_days") * 1000000 + 0.5
            )
            / 1000000.0
        ).alias("persistence"),
    ).orderBy("event_type")


from .monitoring import _wh_p as _arch_wh_p  # noqa: E402
from .monitoring import _wh_p_sql as _arch_wh_p_sql  # noqa: E402


@register(
    "ext_ts_arch_test",
    oracle=f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hr,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1
),
idx AS (
  SELECT x, CAST(row_number() OVER (ORDER BY hr) AS BIGINT) AS t FROM hourly
),
mu AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx
       FROM idx),
u AS (
  SELECT t,
         CAST(floor((CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / n)
                    * (CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / n)
                    / 100000000.0 + 0.5) AS BIGINT) AS uq
  FROM idx, mu
),
pr AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(a.uq) AS BIGINT) AS sa,
         CAST(sum(b.uq) AS BIGINT) AS sb,
         CAST(sum(a.uq * a.uq) AS BIGINT) AS saa,
         CAST(sum(b.uq * b.uq) AS BIGINT) AS sbb,
         CAST(sum(a.uq * b.uq) AS BIGINT) AS sab
  FROM u a JOIN u b ON b.t = a.t - 1
),
rr AS (
  SELECT m,
         (CAST(m AS DOUBLE) * sab - CAST(sa AS DOUBLE) * sb)
           / sqrt((CAST(m AS DOUBLE) * saa - CAST(sa AS DOUBLE) * sa)
                  * (CAST(m AS DOUBLE) * sbb - CAST(sb AS DOUBLE) * sb)) AS r1
  FROM pr
),
lm AS (SELECT m, r1, m * (r1 * r1) AS lmstat FROM rr)
SELECT m + 1 AS n_hours,
       floor(r1 * 1000000 + 0.5) / 1000000.0 AS r1_squares,
       floor(lmstat * 1000000 + 0.5) / 1000000.0 AS lm,
       floor({_arch_wh_p_sql("lmstat", "1.0")} * 1000000 + 0.5) / 1000000.0
         AS p,
       CASE WHEN {_arch_wh_p_sql("lmstat", "1.0")} < 0.05
            THEN 'arch_effects' ELSE 'no_arch' END AS verdict
FROM lm
""",
)
def ext_ts_arch_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENGLE'S ARCH LM TEST (1 lag) on hourly revenue: does VOLATILITY
    cluster — is this hour's squared deviation predictable from the
    last hour's?  Mean-watching detectors assume it is not; if LM
    rejects, every fixed-sigma threshold in the monitoring battery
    (CUSUM, EWMA bands, Bollinger) is mis-calibrated in bursts and
    should move to a conditional-volatility scale.  LM = m * r1^2 of
    the demeaned-squares series, chi2(1) under the null via the shared
    Wilson-Hilferty + Phi.

    The squared deviations quantize at 1e-8 of a cent^2 (one identical
    floor in both engines — the quantize-then-sum stance, keeping every
    later moment an exact int64 through the sf1 twin); r1 is the plain
    Pearson closed form over the lag-1 pair join on the bounded hourly
    spine."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("x")
    )
    w = Window.orderBy("hr")
    idx = hourly.select("x", F.row_number().over(w).cast("long").alias("t"))
    mu = idx.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
    )
    dev = F.col("x").cast("double") - F.col("sx").cast("double") / F.col("n")
    u = idx.crossJoin(F.broadcast(mu)).select(
        "t",
        F.floor(dev * dev / 100000000.0 + 0.5).cast("long").alias("uq"),
    )
    a = u.select(F.col("t").alias("ta"), F.col("uq").alias("ua"))
    b = u.select(F.col("t").alias("tb"), F.col("uq").alias("ub"))
    pr = a.join(b, F.col("tb") == F.col("ta") - 1).agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("ua").cast("long").alias("sa"),
        F.sum("ub").cast("long").alias("sb"),
        F.sum(F.col("ua") * F.col("ua")).cast("long").alias("saa"),
        F.sum(F.col("ub") * F.col("ub")).cast("long").alias("sbb"),
        F.sum(F.col("ua") * F.col("ub")).cast("long").alias("sab"),
    )
    m = F.col("m").cast("double")
    r1 = (m * F.col("sab") - F.col("sa").cast("double") * F.col("sb")) / F.sqrt(
        (m * F.col("saa") - F.col("sa").cast("double") * F.col("sa"))
        * (m * F.col("sbb") - F.col("sb").cast("double") * F.col("sb"))
    )
    rr = pr.select("m", r1.alias("r1"))
    lm = rr.select("m", "r1", (F.col("m") * (F.col("r1") * F.col("r1"))).alias("lmstat"))
    pv = _arch_wh_p(F.col("lmstat"), F.lit(1.0))
    r6l = lambda c: F.floor(c * 1000000 + 0.5) / 1000000.0  # noqa: E731
    return lm.select(
        (F.col("m") + 1).alias("n_hours"),
        r6l(F.col("r1")).alias("r1_squares"),
        r6l(F.col("lmstat")).alias("lm"),
        r6l(pv).alias("p"),
        F.when(pv < 0.05, "arch_effects").otherwise("no_arch").alias("verdict"),
    )
