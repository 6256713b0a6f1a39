"""Scale-pattern operators: the techniques that keep joins and aggregates
alive at 100 TB (SURVEY.md §2.3 scale notes, BASELINE.json's 100 TB
mandate).

- ``join_salted``    key-salting for skewed join keys: replicate the small
                     side N ways, split each hot key of the big side across
                     N shuffle partitions.  The manual form of what AQE's
                     skew-join does for sort-merge joins — needed when the
                     small side is broadcast-sized but a single key floods
                     one task.
- ``join_bucketed``  co-located join on pre-bucketed tables: both sides
                     bucketed by the join key into the same bucket count →
                     the join runs with NO Exchange (asserted in
                     tests/test_plans.py).  The amortize-one-shuffle-
                     forever pattern for repeatedly-joined fact tables.
- ``agg_quantile``   exact interpolated percentiles (matches DuckDB
                     quantile_cont).
- ``agg_approx_quantile`` GK-sketch percentiles — fixed memory, mergeable,
                     the 100 TB path (approximate → rows-only).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import settings
from ..catalog import table
from ..registry import register

_N_SALT = settings.N_SALT


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_source: Column,
    n_salt: int = _N_SALT,
) -> DataFrame:
    """Inner equi-join with key salting.

    big rows get a deterministic salt in [0, n_salt) derived from
    ``salt_source`` (any well-distributed column — NOT the join key);
    small rows replicate across all salts.  A key holding X% of the big
    side now spreads over n_salt tasks instead of one.  Costs: small side
    × n_salt (bounded — it's small), join key widens by one int.
    """
    big_s = big.withColumn("_salt", F.pmod(F.xxhash64(salt_source), F.lit(n_salt)))
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    joined = big_s.join(small_s, [key, "_salt"]).drop("_salt")
    return joined


@register(
    "join_salted",
    oracle="""
WITH user_stats AS (
  SELECT user_id, count(*) AS n_user_events
  FROM events GROUP BY user_id
)
SELECT e.event_id, e.user_id, u.n_user_events
FROM events e JOIN user_stats u ON e.user_id = u.user_id
""",
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-to-dim join on the (deliberately low-cardinality, i.e.
    skew-shaped) user_id key.  The oracle is the UNSALTED join — value
    equality proves salting is a pure execution-strategy change."""
    ev = table(spark, sf_dir, "events")
    user_stats = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_user_events")
    )
    out = salted_join(
        ev.select("event_id", "user_id"),
        user_stats,
        key="user_id",
        salt_source=F.col("event_id"),
    )
    return out.select("event_id", "user_id", "n_user_events")


@register(
    "join_bucketed",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice, count(l.l_linenumber) AS n_items
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey, o.o_totalprice
""",
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exchange-free co-located join via bucketing.

    Both tables are written once bucketed by the join key (8 buckets,
    sorted); the subsequent join needs no shuffle on either side — the
    physical plan contains zero Exchange nodes below the aggregate's.
    At 100 TB this converts every future orders⋈lineitem from two
    full-table shuffles into a free zip of co-located buckets.
    """
    warehouse = os.path.join(tempfile.gettempdir(), f"sdis_buckets_{os.getpid()}")
    o_name = "sdis_orders_b"
    l_name = "sdis_lineitem_b"
    for name, tbl, key in ((o_name, "orders", "o_orderkey"), (l_name, "lineitem", "l_orderkey")):
        if not spark.catalog.tableExists(name):
            (
                table(spark, sf_dir, tbl)
                .write.bucketBy(8, key)
                .sortBy(key)
                .option("path", os.path.join(warehouse, name))
                .mode("overwrite")
                .saveAsTable(name)
            )
    o = spark.table(o_name)
    li = spark.table(l_name)
    # hint("merge"): at corpus scale Catalyst would broadcast the small
    # side, hiding the property under test; at 100 TB both sides are far
    # past broadcast size and sort-merge is what bucketing accelerates.
    return (
        o.hint("merge")
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.count("l_linenumber").alias("n_items"))
    )


@register(
    "agg_quantile",
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.25), 4) AS p25,
       round(quantile_cont(value, 0.50), 4) AS p50,
       round(quantile_cont(value, 0.75), 4) AS p75
FROM events
GROUP BY event_type
""",
)
def agg_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont` semantics).  Exact quantiles need the full
    value multiset per group — fine for bounded groups; the sketch
    variant below is the unbounded-cardinality path."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.25), 4).alias("p25"),
        F.round(F.percentile("value", 0.50), 4).alias("p50"),
        F.round(F.percentile("value", 0.75), 4).alias("p75"),
    )


@register("agg_approx_quantile")  # sketch-based → rows-only
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via the Greenwald-Khanna sketch
    (percentile_approx): fixed memory per group, associative merge across
    partitions — the only quantile that scales to 100 TB groups."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("approx_p50"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "join_runtime_filter",
    oracle="""
SELECT o.o_orderpriority, count(*) AS n_items, round(sum(l.l_quantity), 2) AS sum_qty
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY o.o_orderpriority
""",
)
def join_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter semi-join reduction (Catalyst
    InjectRuntimeFilter): the selective orders side builds a bloom filter
    of its join keys at runtime, and the lineitem scan applies
    `might_contain` BEFORE the shuffle — at 100 TB this is the difference
    between shuffling the whole fact table and shuffling only rows that
    can possibly match.  Spark's default thresholds target production
    sizes (application side >= 10 GB); they are lowered here only so the
    optimization fires at test scale, and restored after the bounded
    materialization so no other query inherits them.  Oracle = the plain
    join (pure execution-strategy change, like join_salted)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    plan = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # shuffle join, so the filter applies
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # Bounded collect: one row per order priority (here: exactly 1) —
        # executed WHILE the runtime-filter confs are active.
        rows = plan.collect()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    return spark.createDataFrame(rows, plan.schema)


# Count-min sketch geometry.  SEMANTIC constants (baked into the oracle):
# depth 3 independent md5-derived hash rows, width 1024 cells, and a
# heavy-hitter threshold of 0.1% of the stream (est * 1000 >= total).
_CMS_DEPTH = 3
_CMS_WIDTH = 1024


def _cms_bucket(col: str, i, dialect: str) -> str:
    """Shared Spark/DuckDB bucket hash: the first 8 hex chars of
    ``md5(key || '#' || row)`` as an integer, mod the sketch width.
    Engine-portable (unlike xxhash64) and uniform enough for CMS."""
    if dialect == "spark":
        return (
            f"cast(conv(substr(md5(concat({col}, '#', cast({i} as string))), 1, 8),"
            f" 16, 10) as bigint) % {_CMS_WIDTH}"
        )
    return (
        f"CAST(('0x' || substr(md5({col} || '#' || CAST({i} AS VARCHAR)), 1, 8))"
        f" AS BIGINT) % {_CMS_WIDTH}"
    )


# Shared with the streaming twin (stream_heavy_hitters below): the
# stream's final complete-mode sketch is pinned exactly equal to the
# batch sketch, so one relational replay verifies both.
HH_ORACLE = f"""
WITH k AS (SELECT CAST(l_partkey AS VARCHAR) AS k FROM lineitem),
tot AS (SELECT count(*) AS total FROM k),
h AS (
  SELECT k, i, {_cms_bucket("k", "i", "duckdb")} AS bucket
  FROM k, UNNEST([1, 2, 3]) AS t(i)
),
sk AS (SELECT i, bucket, CAST(count(*) AS BIGINT) AS c FROM h GROUP BY i, bucket),
cand AS (SELECT DISTINCT k, i, bucket FROM h),
est AS (
  SELECT cand.k, min(sk.c) AS est_count
  FROM cand JOIN sk USING (i, bucket) GROUP BY cand.k
),
ex AS (SELECT k, CAST(count(*) AS BIGINT) AS exact_count FROM k GROUP BY k)
SELECT CAST(est.k AS BIGINT) AS l_partkey, est.est_count, ex.exact_count
FROM est JOIN ex USING (k), tot
WHERE est.est_count * 1000 >= tot.total
"""


@register("ext_heavy_hitters", oracle=HH_ORACLE)
def ext_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOT-KEY detection via a count-min sketch — the measurement half
    of the skew toolkit (``join_salted`` is the mitigation half): keys
    whose estimated frequency clears 0.1% of the stream are the ones
    that flood a shuffle partition.  Depth-3 width-1024 CMS with
    engine-portable md5 bucket hashes; the sketch never underestimates,
    so every true heavy hitter survives (the classic one-sided bound),
    and with fixed hashes the estimates are DETERMINISTIC — the oracle
    replays the identical sketch relationally.

    Scale shape: the sketch build is one groupBy over at most
    depth x width = 3072 cells — partial aggregation means each task
    emits <= 3072 rows no matter how many billions flow through, and
    the finished sketch is broadcast back (Catalyst picks broadcast for
    the 3072-row side) to score candidate keys.  The exact_count column
    is the verification twin (one extra key-shuffle); production skew
    probes skip it and pay only the sketch.  Mergeability (cell-wise
    sum) is what makes CMS the 100 TB choice: per-executor sketches
    combine without ever shuffling keys."""
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("string").alias("k")
    )
    # Everything below derives from the per-key exact counts (domain-
    # bounded: |parts|, ~20k at sf0.1), so compute them ONCE and pin the
    # one corpus scan (guide §2.3 "aggregate before you shuffle" / §2.4):
    # the old plan exploded the raw stream x depth TWICE (sketch build +
    # candidate distinct — 2x3 md5s per fact row plus a data-grain
    # distinct shuffle) and re-scanned lineitem twice more for total and
    # exact counts.  A CMS cell count is exactly the sum of the counts of
    # the keys hashing into it, so the sketch, the candidate set, the
    # stream total AND the exact twin are all algebra on this one frame.
    kc = (
        li.groupBy("k")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .localCheckpoint(eager=True)
    )
    total = kc.agg(F.sum("exact_count").alias("total"))
    h = kc.select(
        "k",
        "exact_count",
        F.explode(F.array(*[F.lit(i) for i in range(1, _CMS_DEPTH + 1)])).alias("i"),
    ).selectExpr("k", "exact_count", "i", _cms_bucket("k", "i", "spark") + " as bucket")
    sketch = h.groupBy("i", "bucket").agg(F.sum("exact_count").alias("c"))
    est = (
        h.join(F.broadcast(sketch), ["i", "bucket"])
        .groupBy("k")
        .agg(F.min("c").alias("est_count"))
    )
    return (
        est.join(kc, "k")
        .crossJoin(F.broadcast(total))
        .filter(F.col("est_count") * 1000 >= F.col("total"))
        .select(
            F.col("k").cast("bigint").alias("l_partkey"),
            "est_count",
            "exact_count",
        )
    )


@register("stream_heavy_hitters", oracle=HH_ORACLE)
def stream_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING sketch maintenance: the count-min sketch as a
    complete-mode streaming aggregate.  The key stream arrives as three
    files (``maxFilesPerTrigger=1``); each micro-batch folds its
    arrivals into the (i, bucket) counts in the state store — the state
    IS the sketch, bounded at depth x width = 3072 cells no matter how
    long the stream runs, which is exactly why mergeable sketches are
    the streaming-analytics workhorse (a windowed exact distinct would
    grow state with cardinality).  After the drain, candidate keys are
    scored batch-side against the FINAL sketch precisely as the batch
    twin does, so the batch oracle verifies the incremental build —
    any double-count or lost micro-batch changes estimates and fails
    the hash.

    At 100 TB-scale streams: per-trigger shuffle carries only that
    batch's arrivals (map-side partial aggregation down to <= 3072
    cells per task), the complete-mode output is sketch-sized, and the
    scoring join broadcasts the sketch — the corpus-sized exact twin
    below exists only for verification."""
    import os
    import shutil
    import tempfile

    staging = os.path.join(
        tempfile.gettempdir(), f"sdis_staging_shh_{os.getpid()}"
    )
    shutil.rmtree(staging, ignore_errors=True)
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("string").alias("k")
    )
    li.repartition(3).write.mode("overwrite").parquet(staging)

    pos = F.explode(
        F.array(*[F.lit(i) for i in range(1, _CMS_DEPTH + 1)])
    ).alias("i")
    sink = f"shh_sink_{os.getpid()}"
    # Cap shuffle partitions for the stateful drain: the state is 3072
    # cells total, but every micro-batch materializes one state store
    # per shuffle partition — at the session default that is 32 stores
    # x 3 triggers of pure scheduling overhead for KB of state.
    from ..streaming.state import _few_shuffle_partitions

    with _few_shuffle_partitions(spark):
        q = (
            spark.readStream.schema("k string")
            .option("maxFilesPerTrigger", 1)
            .parquet(staging)
            .select("k", pos)
            .selectExpr("k", "i", _cms_bucket("k", "i", "spark") + " as bucket")
            .groupBy("i", "bucket")
            .agg(F.count(F.lit(1)).alias("c"))
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(staging, "_checkpoint"))
            .start()
        )
        q.awaitTermination(180)
    sketch = spark.table(sink)

    # Batch-side scoring of the streamed sketch: same per-key-counts
    # restructure as ext_heavy_hitters (one corpus scan pinned once;
    # candidates, totals and the exact twin are all domain-bounded
    # algebra on it — the stream drain above is untouched).
    kc = (
        li.groupBy("k")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .localCheckpoint(eager=True)
    )
    total = kc.agg(F.sum("exact_count").alias("total"))
    cand = kc.select("k", pos).selectExpr(
        "k", "i", _cms_bucket("k", "i", "spark") + " as bucket"
    )
    est = (
        cand.join(F.broadcast(sketch), ["i", "bucket"])
        .groupBy("k")
        .agg(F.min("c").alias("est_count"))
    )
    out = (
        est.join(kc, "k")
        .crossJoin(F.broadcast(total))
        .filter(F.col("est_count") * 1000 >= F.col("total"))
        .select(
            F.col("k").cast("bigint").alias("l_partkey"),
            "est_count",
            "exact_count",
        )
    )
    # Bounded collect: heavy hitters are a small fraction of keys by
    # definition of the threshold; materialized so staging can be
    # removed before the driver hashes the frame.
    result = spark.createDataFrame(out.collect(), out.schema)
    shutil.rmtree(staging, ignore_errors=True)
    return result


_KMV_K = 64


@register(
    "ext_kmv_intersection",
    oracle=f"""
WITH a AS (
  SELECT DISTINCT CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) AS h
  FROM lineitem WHERE l_quantity < 10
), b AS (
  SELECT DISTINCT CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) AS h
  FROM lineitem WHERE l_quantity > 40
), ka AS (SELECT h FROM a ORDER BY h LIMIT {_KMV_K}),
kb AS (SELECT h FROM b ORDER BY h LIMIT {_KMV_K}),
ku AS (SELECT h FROM (SELECT h FROM a UNION SELECT h FROM b) ORDER BY h LIMIT {_KMV_K}),
est AS (
  SELECT
    ({_KMV_K} - 1) / (CAST((SELECT max(h) FROM ka) AS DOUBLE) / 4294967296.0) AS est_a,
    ({_KMV_K} - 1) / (CAST((SELECT max(h) FROM kb) AS DOUBLE) / 4294967296.0) AS est_b,
    ({_KMV_K} - 1) / (CAST((SELECT max(h) FROM ku) AS DOUBLE) / 4294967296.0) AS est_union,
    CAST((SELECT count(*) FROM ku
          WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)) AS DOUBLE)
      / {_KMV_K} AS rho
), ex AS (
  SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS exact_a,
         CAST((SELECT count(*) FROM b) AS BIGINT) AS exact_b,
         CAST((SELECT count(*) FROM a JOIN b USING (h)) AS BIGINT) AS exact_intersection
)
SELECT CAST(floor(est_a + 0.5) AS BIGINT)           AS est_a,
       CAST(floor(est_b + 0.5) AS BIGINT)           AS est_b,
       CAST(floor(est_union + 0.5) AS BIGINT)       AS est_union,
       CAST(floor(rho * est_union + 0.5) AS BIGINT) AS est_intersection,
       exact_a, exact_b, exact_intersection
FROM est CROSS JOIN ex
""",
)
def ext_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) SKETCH SET ALGEBRA — the theta-sketch
    estimate of |A|, |B|, |A∪B| and |A∩B| that HLL cannot do
    (HLL unions losslessly but cannot intersect; Dasgupta et al. 2016,
    "Theta sketch framework").  Sets: order keys with any sub-10-quantity
    line vs any over-40-quantity line — genuinely partial overlap.

    Estimator: with u_k = the k-th smallest normalized hash of a set,
    est|S| = (k-1)/u_k; intersection via the union sketch's inclusion
    fraction rho = |K(A∪B) ∩ A ∩ B| / k, est|A∩B| = rho * est|A∪B|.
    The hash is the engine-shared md5-prefix recipe, so the SKETCH
    ITSELF is deterministic and the estimates hash-match the oracle
    exactly — an approximate operator with an EXACT correctness gate
    (same posture as ext_heavy_hitters' verification twin).

    Scale shape: per set, distinct 8-byte hashes (map-side combined)
    feed TakeOrderedAndProject heaps — k rows survive per set, every
    downstream step is k-sized and broadcast; the exact twins (the
    verification columns) are one distinct-count pass per set plus one
    key-only join.  At 100 TB only the exact twins grow; drop them and
    the sketch path's post-scan traffic is k rows per partition."""
    li = table(spark, sf_dir, "lineitem")
    h = F.expr(
        "cast(conv(substr(md5(cast(l_orderkey as string)), 1, 8), 16, 10) as bigint)"
    ).alias("h")
    a = li.filter(F.col("l_quantity") < 10).select(h).distinct()
    b = li.filter(F.col("l_quantity") > 40).select(h).distinct()
    ka = a.orderBy("h").limit(_KMV_K)
    kb = b.orderBy("h").limit(_KMV_K)
    ku = a.union(b).distinct().orderBy("h").limit(_KMV_K)

    def kth(df):  # 1-row frame: the k-th smallest normalized hash
        return df.agg((F.max("h").cast("double") / 4294967296.0).alias("u"))

    rho = (
        ku.join(ka.withColumnRenamed("h", "ha"), F.col("h") == F.col("ha"), "left_semi")
        .join(kb.withColumnRenamed("h", "hb"), F.col("h") == F.col("hb"), "left_semi")
        .agg((F.count(F.lit(1)).cast("double") / _KMV_K).alias("rho"))
    )
    est = (
        kth(ka).withColumnRenamed("u", "ua")
        .crossJoin(kth(kb).withColumnRenamed("u", "ub"))
        .crossJoin(kth(ku).withColumnRenamed("u", "uu"))
        .crossJoin(rho)
    )
    exact = (
        a.agg(F.count(F.lit(1)).cast("long").alias("exact_a"))
        .crossJoin(b.agg(F.count(F.lit(1)).cast("long").alias("exact_b")))
        .crossJoin(
            a.join(b, "h").agg(
                F.count(F.lit(1)).cast("long").alias("exact_intersection")
            )
        )
    )
    k1 = float(_KMV_K - 1)
    return est.crossJoin(exact).select(
        F.floor(F.lit(k1) / F.col("ua") + 0.5).alias("est_a"),
        F.floor(F.lit(k1) / F.col("ub") + 0.5).alias("est_b"),
        F.floor(F.lit(k1) / F.col("uu") + 0.5).alias("est_union"),
        F.floor(F.col("rho") * (F.lit(k1) / F.col("uu")) + 0.5).alias(
            "est_intersection"
        ),
        "exact_a",
        "exact_b",
        "exact_intersection",
    )


@register(
    "ext_winsorize",
    oracle="""
WITH bounds AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS lo,
         quantile_cont(value, 0.95) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       round(CASE WHEN e.value < b.lo THEN b.lo
                  WHEN e.value > b.hi THEN b.hi
                  ELSE e.value END, 4) AS winsorized,
       (e.value < b.lo OR e.value > b.hi) AS clipped
FROM events e JOIN bounds b ON e.event_type = b.event_type
""",
)
def ext_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINSORIZATION: clip each value into its group's [p05, p95] —
    the standard outlier-robust feature-engineering transform (tail
    values get pinned to the fences, never dropped — unlike the MAD
    filter ``ext_outlier_mad`` which flags, this one repairs).

    Two passes, both scale-flat: exact interpolated percentiles per
    group (Spark ``percentile`` == DuckDB ``quantile_cont``, the
    equivalence ``agg_quantile`` pins) reduce to |groups| rows that
    BROADCAST back onto the facts; the clip itself is a codegen
    projection.  At 100 TB swap the exact percentile for
    ``approx_percentile`` (the ``agg_approx_quantile`` path) — the
    broadcast-back shape is unchanged."""
    events = table(spark, sf_dir, "events")
    bounds = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    clipped = (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))
    return events.join(F.broadcast(bounds), "event_type").select(
        "event_id",
        "event_type",
        F.round(
            F.when(F.col("value") < F.col("lo"), F.col("lo"))
            .when(F.col("value") > F.col("hi"), F.col("hi"))
            .otherwise(F.col("value")),
            4,
        ).alias("winsorized"),
        clipped.alias("clipped"),
    )


def _skew_sql(col: str) -> str:
    return f"""
  SELECT '{col}' AS key_col,
         CAST(sum(c) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(max(c) AS BIGINT) AS max_per_key,
         round(quantile_cont(CAST(c AS DOUBLE), 0.99), 4) AS p99_per_key,
         floor((CAST(max(c) AS DOUBLE) / (CAST(sum(c) AS DOUBLE) / count(*)))
               * 10000 + 0.5) / 10000.0 AS skew_factor
  FROM (SELECT {col}, CAST(count(*) AS BIGINT) AS c FROM lineitem GROUP BY 1)"""


@register(
    "ext_skew_report",
    oracle="SELECT * FROM (\n"
    + "\nUNION ALL\n".join(
        _skew_sql(c) for c in ("l_orderkey", "l_partkey", "l_suppkey")
    )
    + "\n)",
)
def ext_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-KEY SKEW diagnostic — the pre-flight report that decides
    whether a planned join needs salting (``join_salted``), AQE skew
    splitting, or nothing: per candidate key, row count, distinct keys,
    the heaviest key's row count, the p99 per-key count, and the skew
    factor (max/mean).  Run it BEFORE the 100 TB join, not after the
    straggler task appears.

    Scale shape: one map-side-combined groupBy per candidate key, then
    a 1-row aggregate over the per-key counts (the exact p99 needs the
    count vector, which is |distinct keys|-sized, not row-sized; at
    extreme key cardinality swap in approx_percentile — the
    agg_approx_quantile path).  The report is |candidate keys| rows."""
    li = table(spark, sf_dir, "lineitem")
    frames = []
    for col in ("l_orderkey", "l_partkey", "l_suppkey"):
        cnts = li.groupBy(col).agg(F.count(F.lit(1)).cast("long").alias("c"))
        frames.append(
            cnts.agg(
                F.lit(col).alias("key_col"),
                F.sum("c").cast("long").alias("n_rows"),
                F.count(F.lit(1)).cast("long").alias("n_distinct"),
                F.max("c").cast("long").alias("max_per_key"),
                F.round(
                    F.expr("percentile(cast(c as double), 0.99)"), 4
                ).alias("p99_per_key"),
                (
                    F.floor(
                        (
                            F.max("c").cast("double")
                            / (F.sum("c").cast("double") / F.count(F.lit(1)))
                        )
                        * 10000
                        + 0.5
                    )
                    / 10000.0
                ).alias("skew_factor"),
            )
        )
    out = frames[0]
    for f2 in frames[1:]:
        out = out.unionByName(f2)
    return out


_EQUIDEPTH_BUCKETS = 8


@register(
    "agg_histogram_equidepth",
    oracle=f"""
WITH b AS (
  SELECT CAST(least(floor(percent_rank() OVER (ORDER BY value, event_id)
                    * {_EQUIDEPTH_BUCKETS}), {_EQUIDEPTH_BUCKETS - 1}) AS BIGINT) AS bucket,
         value
  FROM events
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n,
       round(min(value), 2) AS lo,
       round(max(value), 2) AS hi
FROM b GROUP BY 1
""",
)
def agg_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUI-DEPTH histogram (quantile bucketing): every bucket holds the
    same row count and the BOUNDARIES move with the data — the histogram
    query optimizers actually keep (equi-WIDTH, ``agg_histogram``, lies
    under skew; equi-depth bounds per-bucket selectivity error by 1/k).
    Deterministic bucketing via the exact global rank with an event_id
    tiebreak, so both engines assign identical rows to identical buckets.

    Scale shape: a bare ``Window.orderBy`` (no PARTITION BY) would
    coalesce ALL rows into ONE WindowExec task — a single-task
    bottleneck, not a distributed sort.  Instead the exact global rank
    comes from ``ranking.distributed_rank`` (range-partitioned local
    row_numbers + broadcast prefix offsets over the bounded
    per-partition-count frame), then percent_rank = (rk-1)/(n-1) is a
    projection and the 8-group aggregate is map-side combined.
    approx_percentile boundaries (the agg_approx_quantile path) remain
    the cheap substitute."""
    from .ranking import distributed_rank

    events = table(spark, sf_dir, "events")
    ranked = distributed_rank(
        events.select("value", "event_id"), ["value", "event_id"]
    )
    b = ranked.select(
        "value",
        F.least(
            F.floor(
                (F.col("_rk") - 1).cast("double")
                / (F.col("_n_total") - 1).cast("double")
                * _EQUIDEPTH_BUCKETS
            ),
            F.lit(_EQUIDEPTH_BUCKETS - 1),
        )
        .cast("long")
        .alias("bucket"),
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.min("value"), 2).alias("lo"),
        F.round(F.max("value"), 2).alias("hi"),
    )


@register(
    "ext_zscore_normalize",
    oracle="""
WITH s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv,
         CAST(sum(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS ssq
  FROM events GROUP BY 1
)
SELECT e.event_id, e.event_type,
       floor(((CAST(round(e.value * 100) AS BIGINT)
               - (CAST(s.sv AS DOUBLE) / s.n))
              / sqrt((CAST(s.ssq AS DOUBLE)
                      - s.n * ((CAST(s.sv AS DOUBLE) / s.n)
                               * (CAST(s.sv AS DOUBLE) / s.n))) / (s.n - 1)))
             * 10000 + 0.5) / 10000.0 AS zscore
FROM events e JOIN s ON e.event_type = s.event_type
""",
)
def ext_zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Z-SCORE standardization — the feature transform every
    model-input pipeline applies ((x - mean) / stddev per group; the
    repair sibling of ``ext_outlier_mad``'s robust flagging and
    ``ext_winsorize``'s clipping).

    Group moments come from ONE map-side-combined aggregate (exact
    integer-cent sums — the float-order discipline) that BROADCASTS back
    onto the facts; the normalization itself is a codegen projection.
    Identical double arithmetic both engines, explicit half-up round."""
    events = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    s = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(cents).cast("long").alias("sv"),
        F.sum(cents * cents).cast("long").alias("ssq"),
    )
    mean = F.col("sv").cast("double") / F.col("n")
    var = (F.col("ssq").cast("double") - F.col("n") * (mean * mean)) / (
        F.col("n") - 1
    )
    z = (cents - mean) / F.sqrt(var)
    return events.join(F.broadcast(s), "event_type").select(
        "event_id",
        "event_type",
        (F.floor(z * 10000 + 0.5) / 10000.0).alias("zscore"),
    )


@register(
    "agg_boxplot",
    oracle="""
WITH g AS MATERIALIZED (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
cum AS MATERIALIZED (
  SELECT event_type, cents, c,
         sum(c) OVER (PARTITION BY event_type ORDER BY cents) AS cm,
         sum(c) OVER (PARTITION BY event_type) AS n
  FROM g
),
q AS MATERIALIZED (
  SELECT event_type, CAST(max(n) AS BIGINT) AS n,
         CAST(min(CASE WHEN cm >= ceil(0.25 * n) THEN cents END) AS BIGINT) AS q1,
         CAST(min(CASE WHEN cm >= ceil(0.50 * n) THEN cents END) AS BIGINT) AS med,
         CAST(min(CASE WHEN cm >= ceil(0.75 * n) THEN cents END) AS BIGINT) AS q3
  FROM cum GROUP BY 1
)
SELECT g.event_type, q.n,
       CAST(q.q1 AS DOUBLE) / 100 AS q1,
       CAST(q.med AS DOUBLE) / 100 AS median,
       CAST(q.q3 AS DOUBLE) / 100 AS q3,
       CAST(min(CASE WHEN 2 * g.cents >= 2 * q.q1 - 3 * (q.q3 - q.q1)
                     THEN g.cents END) AS DOUBLE) / 100 AS whisker_lo,
       CAST(max(CASE WHEN 2 * g.cents <= 2 * q.q3 + 3 * (q.q3 - q.q1)
                     THEN g.cents END) AS DOUBLE) / 100 AS whisker_hi,
       CAST(sum(CASE WHEN 2 * g.cents < 2 * q.q1 - 3 * (q.q3 - q.q1)
                     THEN g.c ELSE 0 END) AS BIGINT) AS n_low_outliers,
       CAST(sum(CASE WHEN 2 * g.cents > 2 * q.q3 + 3 * (q.q3 - q.q1)
                     THEN g.c ELSE 0 END) AS BIGINT) AS n_high_outliers
FROM g JOIN q USING (event_type)
GROUP BY 1, 2, 3, 4, 5
ORDER BY 1
""",
)
def agg_boxplot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT five-number BOXPLOT per event type — quartiles (percentile_disc
    semantics: smallest value whose cumulative count reaches ceil(p·n)),
    Tukey 1.5·IQR whiskers clamped to actual data points, and outlier
    counts each side — the distribution report a metrics dashboard draws
    per segment.

    Scale discipline (the agg_ks_test ECDF pattern): quantiles compute on
    the DISTINCT-VALUE grain — one map-side-combined (type, cents) count,
    then the cumulative window runs over the COMPRESSED frame (6.6k
    distinct cents here vs 60k rows; bounded by the value domain, not the
    corpus), so no per-row window ever sees the fact table.  The 1.5·IQR
    comparisons stay in integer half-cents (2·cents vs 2·q1 − 3·IQR) —
    no float boundary anywhere until the final /100 display division.
    approx_percentile is the documented cheap substitute when exactness
    isn't required."""
    ev = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    g = ev.groupBy(
        "event_type", cents.alias("cents")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cum = g.select(
        "event_type",
        "cents",
        "c",
        F.sum("c").over(w_cum).alias("cm"),
        F.sum("c").over(w_all).alias("n"),
    )
    q = cum.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.min(F.when(F.col("cm") >= F.ceil(0.25 * F.col("n")), F.col("cents")))
        .cast("long")
        .alias("q1"),
        F.min(F.when(F.col("cm") >= F.ceil(0.50 * F.col("n")), F.col("cents")))
        .cast("long")
        .alias("med"),
        F.min(F.when(F.col("cm") >= F.ceil(0.75 * F.col("n")), F.col("cents")))
        .cast("long")
        .alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    lo_ok = 2 * F.col("cents") >= 2 * F.col("q1") - 3 * iqr
    hi_ok = 2 * F.col("cents") <= 2 * F.col("q3") + 3 * iqr
    j = g.join(q, "event_type")
    return (
        j.groupBy("event_type", "n", "q1", "med", "q3")
        .agg(
            (F.min(F.when(lo_ok, F.col("cents"))).cast("double") / 100).alias(
                "whisker_lo"
            ),
            (F.max(F.when(hi_ok, F.col("cents"))).cast("double") / 100).alias(
                "whisker_hi"
            ),
            F.sum(F.when(~lo_ok, F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_low_outliers"),
            F.sum(F.when(~hi_ok, F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_high_outliers"),
        )
        .select(
            "event_type",
            "n",
            (F.col("q1").cast("double") / 100).alias("q1"),
            (F.col("med").cast("double") / 100).alias("median"),
            (F.col("q3").cast("double") / 100).alias("q3"),
            "whisker_lo",
            "whisker_hi",
            "n_low_outliers",
            "n_high_outliers",
        )
        .orderBy("event_type")
    )


@register("agg_hll_sketch_rollup")  # DataSketches binary → rows-only
def agg_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE-SKETCH ROLLUP: per-nation HLL sketches of the customer
    population, UNIONED up to region grain and estimated — the
    pre-aggregation pattern that makes distinct counts roll up at
    100 TB (exact NDV does not compose: you cannot add nation NDVs into
    a region NDV; sketches union losslessly, so the cube stores one
    sketch per cell and ANY ad-hoc grain is a merge away, never a
    re-scan — the agg_approx_distinct story extended to REUSE).

    Rows-only BY DESIGN: the sketch bytes are Apache DataSketches
    implementation state with no DuckDB twin; correctness is pinned
    IN-ROW instead — each region row carries the exact NDV (computed
    here at test scale for the pin; the 100 TB deployment would drop
    it) and the relative error, asserted < 5% by
    tests/test_components.py and visible in the output."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    j = c.join(n, c.c_nationkey == n.n_nationkey).select(
        "n_regionkey", "n_nationkey", "c_custkey"
    )
    sk = j.groupBy("n_regionkey", "n_nationkey").agg(
        F.expr("hll_sketch_agg(c_custkey)").alias("sk"),
        F.countDistinct("c_custkey").cast("long").alias("exact_nation"),
    )
    rolled = sk.groupBy("n_regionkey").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").cast("long").alias("est_ndv"),
        F.sum("exact_nation").cast("long").alias("exact_ndv"),
        F.count(F.lit(1)).cast("long").alias("n_sketches"),
    )
    rel = F.abs(F.col("est_ndv") - F.col("exact_ndv")).cast("double") / F.col(
        "exact_ndv"
    )
    return rolled.select(
        F.col("n_regionkey").cast("long").alias("region_key"),
        "n_sketches",
        "exact_ndv",
        "est_ndv",
        (F.floor(rel * 10000 + 0.5) / 10000.0).alias("rel_err"),
        (rel < 0.05).alias("within_5pct"),
    ).orderBy("region_key")


_SKY_BUCKET_CENTS = 100000  # $1000 price buckets for the dominance pre-filter


@register(
    "win_skyline_2d",
    oracle=f"""
WITH pts AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
         CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem
),
bmax AS (
  SELECT price_c // {_SKY_BUCKET_CENTS} AS b, CAST(max(qty) AS BIGINT) AS mq
  FROM pts GROUP BY 1
),
thr AS (
  SELECT b, coalesce(max(mq) OVER (ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) AS t
  FROM bmax
),
cand AS (
  SELECT p.price_c, p.qty
  FROM pts p JOIN thr ON p.price_c // {_SKY_BUCKET_CENTS} = thr.b
  WHERE p.qty > thr.t
),
sky AS (
  SELECT price_c, qty,
         coalesce(max(qty) OVER (ORDER BY price_c ASC, qty DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) AS smax
  FROM cand
)
SELECT CAST(price_c AS DOUBLE) / 100 AS price, qty
FROM sky WHERE qty > smax
ORDER BY price
""",
)
def win_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE (Pareto-frontier) query, Börzsönyi et al. 2001: the
    non-dominated (minimize price, maximize quantity) line items — the
    multi-objective shortlist operator ("no cheaper row buys at least
    as much") behind supplier selection and any price/quality tradeoff
    report.

    Scale discipline — the naive phrasing is one unpartitioned window
    over the fact table (single task).  Instead: (1) a $1000-bucket
    max-qty pre-filter — per-bucket maxes are map-side combined, the
    running threshold is a |buckets|-row bounded window, and a row
    survives only if it beats every strictly-cheaper bucket's best —
    provably a SUPERSET of the skyline (dominance is transitive, so a
    maximal dominator is always a candidate); (2) the exact dominance
    sweep then runs over the pruned candidates (60k → ~1k here) via
    ``distributed_prev_max`` — range-partitioned local running max +
    broadcast per-partition carry-ins, NEVER one unpartitioned window.
    (2) matters because the candidate bound is DATA-DEPENDENT: on an
    adversarial distribution where qty rises monotonically with price,
    nothing dominates anything, the true skyline IS the whole table,
    and the prune keeps everything — the sweep input must therefore be
    bounded by construction, not by TPC-H's shape (pinned in
    tests/test_components.py::test_skyline_adversarial_monotone).
    Integer cents/qty throughout; ties resolved by the (price asc,
    qty desc) order both engines share."""
    li = table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    b = F.expr(f"price_c div {_SKY_BUCKET_CENTS}")
    bmax = pts.groupBy(b.alias("b")).agg(F.max("qty").cast("long").alias("mq"))
    w_thr = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    thr = bmax.select(
        "b", F.coalesce(F.max("mq").over(w_thr), F.lit(-1)).alias("t")
    )
    cand = (
        pts.join(thr, b == thr.b)
        .filter(F.col("qty") > F.col("t"))
        .select("price_c", "qty")
    )
    from .ranking import distributed_prev_max

    sky = distributed_prev_max(
        cand, [F.asc("price_c"), F.desc("qty")], "qty"
    ).withColumn("smax", F.coalesce("_prevmax", F.lit(-1)))
    return (
        sky.filter(F.col("qty") > F.col("smax"))
        .select(
            (F.col("price_c").cast("double") / 100).alias("price"), "qty"
        )
        .orderBy("price")
    )


@register("pipeline_stats_maintain")  # HLL sketch state + txn lifecycle → rows-only
def pipeline_stats_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL TABLE-STATS MAINTENANCE — the third maintenance loop
    (MinHash index, IVF lists, now ANALYZE): per arriving batch, one
    stats row (count / min / max / exact cent sum / HLL user sketch)
    lands in a txn-stamped append, and the optimizer-facing stats are
    the MERGE of the stored rows — count/min/max/sum compose exactly,
    NDV composes through sketch union (``agg_hll_sketch_rollup``'s
    point, applied over TIME instead of space).  A 100 TB table never
    re-ANALYZEs: each ingest tick pays O(batch) and the merged stats
    stay current forever.

    Asserted IN-OP: merged exact stats == one-shot full-scan stats
    (hard equality — a RuntimeError, not a report row), crash-replay of
    the final tick no-ops into the txn watermark, and the merged-NDV
    relative error rides the output with its < 5% bound."""
    import os
    import tempfile

    from ..sources.delta_log import DeltaLogTable

    root = tempfile.mkdtemp(prefix="sdis_stats_maintain_")
    stats_t = DeltaLogTable(spark, os.path.join(root, "stats"))
    app = "sdis-stats-maintain"
    ev = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")

    def batch_stats(df: DataFrame, tick: int) -> DataFrame:
        return df.agg(
            F.lit(tick).cast("long").alias("tick"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min(cents).alias("mn"),
            F.max(cents).alias("mx"),
            F.sum(cents).cast("long").alias("sv"),
            F.expr("hll_sketch_agg(user_id)").alias("sk"),
        )

    for i in range(3):
        stats_t.commit_append(
            batch_stats(ev.filter(F.col("event_id") % 3 == i), i), txn=(app, i)
        )
    head = stats_t.latest_version()
    stats_t.commit_append(
        batch_stats(ev.filter(F.col("event_id") % 3 == 2), 2), txn=(app, 2)
    )
    if stats_t.latest_version() != head:
        raise RuntimeError("replayed stats tick double-applied")

    merged = stats_t.read().agg(
        F.sum("n").cast("long").alias("n"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
        F.sum("sv").cast("long").alias("sv"),
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").cast("long").alias("ndv_est"),
    )
    full = ev.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min(cents).alias("mn"),
        F.max(cents).alias("mx"),
        F.sum(cents).cast("long").alias("sv"),
        F.countDistinct("user_id").cast("long").alias("ndv_exact"),
    )
    m, f = merged.collect()[0], full.collect()[0]
    if (m.n, m.mn, m.mx, m.sv) != (f.n, f.mn, f.mx, f.sv):
        raise RuntimeError(f"merged stats diverge from full scan: {m} vs {f}")
    rel = abs(m.ndv_est - f.ndv_exact) / f.ndv_exact
    return spark.createDataFrame(
        [
            (
                m.n,
                float(m.mn) / 100,
                float(m.mx) / 100,
                float(m.sv) / 100,
                m.ndv_est,
                f.ndv_exact,
                round(rel, 4),
                rel < 0.05,
            )
        ],
        "n long, min_value double, max_value double, sum_value double, "
        "ndv_est long, ndv_exact long, rel_err double, within_5pct boolean",
    )


_GAINS_DECILES = 10
_GAINS_HASH = 2654435761  # Knuth multiplicative constant (public)


@register(
    "agg_gains_curve",
    oracle=f"""
WITH scored AS (
  SELECT o_orderkey,
         (o_orderkey * {_GAINS_HASH}) % 1000
           + CASE WHEN o_orderstatus = 'F' THEN 300 ELSE 0 END AS score,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS lbl
  FROM orders
), ranked AS (
  SELECT lbl,
         ntile({_GAINS_DECILES}) OVER (ORDER BY score DESC, o_orderkey) AS decile
  FROM scored
), t AS (
  SELECT CAST(sum(lbl) AS BIGINT) AS tot_pos, CAST(count(*) AS BIGINT) AS n
  FROM scored
), d AS (
  SELECT CAST(decile AS BIGINT) AS decile,
         CAST(count(*) AS BIGINT) AS n_d,
         CAST(sum(lbl) AS BIGINT) AS pos_d
  FROM ranked GROUP BY 1
), c AS (
  SELECT decile, n_d, pos_d,
         CAST(sum(pos_d) OVER (ORDER BY decile
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos
  FROM d
)
SELECT decile, n_d, pos_d,
       floor(CAST(cum_pos AS DOUBLE) / t.tot_pos * 1000000 + 0.5)
         / 1000000.0 AS cum_gain,
       floor((CAST(pos_d AS DOUBLE) / n_d)
             / (CAST(t.tot_pos AS DOUBLE) / t.n) * 1000000 + 0.5)
         / 1000000.0 AS lift
FROM c CROSS JOIN t ORDER BY decile
""",
)
def agg_gains_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUMULATIVE GAINS / LIFT table by score decile: rank orders by a
    deterministic label-correlated score (Knuth-hash noise + a label
    boost — a stand-in with the exact shape of a model score column),
    cut into {d} deciles, and report each decile's capture share and
    lift over base rate — THE campaign-targeting / classifier-triage
    readout ("mail decile 1, reach 28% of responders at 2.8× lift"),
    the supervised sibling of ``agg_lorenz_curve``'s concentration
    view and the threshold-free summary next to
    ``ext_calibration_bins``.

    Exactness: scores and labels are exact integers; the decile cut is
    SQL-standard ntile reproduced WITHOUT a single-task window —
    global rank + cumulative positives come from ONE
    ``distributed_rank`` pass (sum_cols), deciles from
    ``ntile_from_rank`` (SQL-standard distribution, engine-portable),
    and the decile cumulative runs over the bounded {d}-row frame.
    Gains/lift are exact-int ratios.

    Scale shape: one range exchange for the rank, one map-side
    groupBy to {d} rows; no corpus-sized window anywhere."""
    from .ranking import distributed_rank, ntile_from_rank

    o = table(spark, sf_dir, "orders")
    lbl = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    scored = o.select(
        "o_orderkey",
        (
            (F.col("o_orderkey") * _GAINS_HASH) % 1000
            + F.when(F.col("o_orderstatus") == "F", 300).otherwise(0)
        ).alias("score"),
        lbl.alias("lbl"),
    )
    r = distributed_rank(scored, [F.desc("score"), F.asc("o_orderkey")], sum_cols=("lbl",))
    d = (
        r.select(
            ntile_from_rank(_GAINS_DECILES, F.col("_rk"), F.col("_n_total")).alias(
                "decile"
            ),
            "lbl",
            "_cum_lbl",
            "_tot_lbl",
            "_n_total",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_d"),
            F.sum("lbl").cast("long").alias("pos_d"),
            F.max("_cum_lbl").cast("long").alias("cum_pos"),
            F.max("_tot_lbl").cast("long").alias("tot_pos"),
            F.max("_n_total").cast("long").alias("n"),
        )
    )
    return d.select(
        "decile",
        "n_d",
        "pos_d",
        (
            F.floor(F.col("cum_pos").cast("double") / F.col("tot_pos") * 1000000 + 0.5)
            / 1000000.0
        ).alias("cum_gain"),
        (
            F.floor(
                (F.col("pos_d").cast("double") / F.col("n_d"))
                / (F.col("tot_pos").cast("double") / F.col("n"))
                * 1000000
                + 0.5
            )
            / 1000000.0
        ).alias("lift"),
    ).orderBy("decile")


agg_gains_curve.__doc__ = agg_gains_curve.__doc__.format(d=_GAINS_DECILES)
