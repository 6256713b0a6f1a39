"""Join operators (SURVEY.md §2.3).

The reference's one true join is matching the desired slot timestamp
against the catalog product list on a minute-normalized key — a
nested-loop equi-join with early exit (``sources/meteosat.py:111-120``).
Its "no product → skip" branch is the anti-join side
(``sources/meteosat.py:101-103``) and "is there a product?" is the
semi-join (``sources/meteosat.py:105-122``).  The rest generalizes that
surface for the star-schema corpus.

Scale notes: dimension sides (region/nation/one-row targets) are
explicitly ``broadcast()`` — zero shuffle of the fact side.  Large-large
joins shuffle both sides on the key; AQE converts to broadcast at runtime
when a side turns out small and splits skewed partitions.  The as-of join
is the union+window formulation — one shuffle on the partition key, no
pairwise range explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


@register(
    "join_equi_inner",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
""",
)
def join_equi_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join on the foreign key (general form of the slot-vs-
    catalog match, sources/meteosat.py:117-118).  Catalyst picks broadcast
    vs sort-merge from statistics; AQE re-plans at runtime."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@register(
    "join_broadcast",
    oracle="""
SELECT c.c_custkey, n.n_name, r.r_name
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
""",
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema dimension joins with explicit broadcast hints: the
    25-row nation and 5-row region tables replicate to every executor —
    the fact side never shuffles.  This is the 100 TB pattern for any
    dimension under spark.sql.autoBroadcastJoinThreshold."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )


@register(
    "join_left_outer",
    oracle="""
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
FROM customer c
LEFT JOIN orders o ON c.c_custkey = o.o_custkey
""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join — keep unmatched build rows with NULL payload
    (the relational form of the reference's skip-vs-process branching)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: existence check, the direct relational form of
    check_should_update — "is there a product for this slot?"
    (sources/meteosat.py:105-122).  Probe rows emit at most once; the
    right side reduces to its distinct keys before shuffling."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: "slots with no product" — the skip branch of
    sources/meteosat.py:101-103 as an operator."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_range",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber, o.o_orderdate, l.l_shipdate
FROM lineitem l
JOIN orders o
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate BETWEEN o.o_orderdate AND o.o_orderdate + INTERVAL 90 DAY
""",
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + interval-containment join — "product date within the ±window
    of the target" (sources/meteosat.py:106-107) generalized to a join
    predicate.  The equi key carries the shuffle; the range predicate is
    evaluated post-match, so there is no quadratic pair blow-up."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & li.l_shipdate.between(
                o.o_orderdate, o.o_orderdate + F.expr("INTERVAL 90 DAYS")
            ),
        )
        .select("l_orderkey", "l_linenumber", "o_orderdate", "l_shipdate")
    )


@register(
    "join_asof",
    oracle="""
WITH u AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'purchase' THEN event_id END AS purchase_id,
         CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS side
  FROM events
  WHERE event_type IN ('purchase', 'error')
), w AS (
  SELECT *,
         last_value(purchase_id IGNORE NULLS) OVER (
           PARTITION BY user_id
           ORDER BY ts, side, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS matched_purchase
  FROM u
)
SELECT event_id, user_id, ts, matched_purchase
FROM w WHERE side = 1
""",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (nearest-earlier match) — the generalization of "pick the
    product for this slot".

    Implemented scale-first as the union+ordered-window formulation: tag
    both streams, union, and carry the last non-null left key forward per
    partition.  One shuffle on user_id + one sort — no range-pair
    explosion, unlike a naive (ts <= ts') theta join whose worst case is
    |A|x|B| per key.  Ties (purchase at the same ts as the error) match,
    ordered purchase-before-error with event_id as final tie-break.
    """
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "error")
    )
    u = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", F.col("event_id")).alias(
            "purchase_id"
        ),
        F.when(F.col("event_type") == "purchase", F.lit(0)).otherwise(1).alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("matched_purchase", F.last("purchase_id", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select("event_id", "user_id", "ts", "matched_purchase")
    )


@register(
    "join_asof_tolerance",
    oracle="""
WITH u AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'purchase' THEN event_id END AS purchase_id,
         CASE WHEN event_type = 'purchase' THEN ts END AS purchase_ts,
         CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS side
  FROM events
  WHERE event_type IN ('purchase', 'error')
), w AS (
  SELECT *,
         last_value(purchase_id IGNORE NULLS) OVER (
           PARTITION BY user_id
           ORDER BY ts, side, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cand_purchase,
         last_value(purchase_ts IGNORE NULLS) OVER (
           PARTITION BY user_id
           ORDER BY ts, side, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cand_ts
  FROM u
)
SELECT event_id, user_id, ts,
       CASE WHEN cand_ts >= ts - INTERVAL 30 MINUTE THEN cand_purchase END
         AS matched_purchase,
       CASE WHEN cand_ts >= ts - INTERVAL 30 MINUTE
            THEN CAST(floor(epoch(ts)) AS BIGINT)
               - CAST(floor(epoch(cand_ts)) AS BIGINT) END AS gap_sec
FROM w WHERE side = 1
""",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a match tolerance (pandas ``merge_asof(...,
    tolerance=30min)`` semantics): each error event matches the nearest
    earlier purchase by the same user ONLY if it happened within the
    last 30 minutes; staler candidates yield a null match.

    Same scale shape as join_asof — union + one ordered window per key,
    carrying the candidate's event time alongside its id so the
    tolerance is a post-window projection, not a second join.  The gap
    column makes the tolerance auditable row-by-row."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "error")
    )
    u = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", F.col("event_id")).alias(
            "purchase_id"
        ),
        F.when(F.col("event_type") == "purchase", F.col("ts")).alias("purchase_ts"),
        F.when(F.col("event_type") == "purchase", F.lit(0)).otherwise(1).alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_tol = F.col("cand_ts") >= F.col("ts") - F.expr("INTERVAL 30 MINUTES")
    return (
        u.withColumn("cand_purchase", F.last("purchase_id", ignorenulls=True).over(w))
        .withColumn("cand_ts", F.last("purchase_ts", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(in_tol, F.col("cand_purchase")).alias("matched_purchase"),
            F.when(
                in_tol,
                F.unix_timestamp("ts") - F.unix_timestamp("cand_ts"),
            ).alias("gap_sec"),
        )
    )


@register(
    "join_full_outer",
    oracle="""
SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
       c.n_customers, s.n_suppliers
FROM (SELECT c_nationkey, count(*) AS n_customers FROM customer GROUP BY 1) c
FULL OUTER JOIN
     (SELECT s_nationkey, count(*) AS n_suppliers FROM supplier GROUP BY 1) s
  ON c.c_nationkey = s.s_nationkey
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: nations that have customers, suppliers, or both —
    unmatched sides null-fill.  Full outer forces a shuffle join (no
    broadcast variant exists: both sides must see all keys), so at scale
    the pre-aggregation here is what keeps the shuffled sides small."""
    c = (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return c.join(s, c.c_nationkey == s.s_nationkey, "full_outer").select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        "n_customers",
        "n_suppliers",
    )


@register(
    "join_interval_overlap",
    oracle="""
WITH a AS (
  SELECT event_type, event_id AS a_id,
         ts AS a_lo, ts + INTERVAL 30 MINUTE AS a_hi
  FROM events WHERE event_id % 11 = 0
),
b AS (
  SELECT event_type, event_id AS b_id,
         ts AS b_lo, ts + INTERVAL 45 MINUTE AS b_hi
  FROM events WHERE event_id % 13 = 1
)
SELECT a.a_id, b.b_id
FROM a JOIN b ON a.event_type = b.event_type
           AND a.a_lo <= b.b_hi AND b.b_lo <= a.a_hi
ORDER BY a_id, b_id
""",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (interval × interval), the sibling of
    `join_range` (point × interval): two derived interval sets match when
    they share an event type and their [lo, hi] spans intersect.

    Scale shape: a naive inequality-only join is a per-type cartesian.
    Instead each interval EXPLODES to the hour buckets it covers (≤ 2
    here — bounded by interval length / bucket width), the join is EQUI
    on (event_type, hour bucket) with the exact overlap predicate as a
    post-filter, and `distinct` collapses pairs that met in two buckets.
    Bucket width is the tuning knob: candidates per task stay bounded by
    per-bucket density, never by table size."""
    ev = table(spark, sf_dir, "events")

    def intervals(mod: int, rem: int, minutes: int, prefix: str) -> DataFrame:
        iv = ev.filter(F.col("event_id") % mod == rem).select(
            "event_type",
            F.col("event_id").alias(f"{prefix}_id"),
            F.col("ts").alias(f"{prefix}_lo"),
            (F.col("ts") + F.expr(f"INTERVAL {minutes} MINUTES")).alias(
                f"{prefix}_hi"
            ),
        )
        return iv.withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.date_trunc("hour", F.col(f"{prefix}_lo")),
                    F.date_trunc("hour", F.col(f"{prefix}_hi")),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ),
        )

    a = intervals(11, 0, 30, "a")
    b = intervals(13, 1, 45, "b")
    return (
        a.join(b, ["event_type", "bucket"])
        .filter(
            (F.col("a_lo") <= F.col("b_hi")) & (F.col("b_lo") <= F.col("a_hi"))
        )
        .select("a_id", "b_id")
        .distinct()
        .orderBy("a_id", "b_id")
    )


_N_STATIONS = 50  # stations come from supplier keys <= this bound


@register(
    "join_spatial_nearest",
    oracle=f"""
WITH obs AS (
  SELECT event_id,
         (event_id % 360) - 180.0 AS lon,
         (event_id % 170) - 85.0  AS lat
  FROM events
),
st AS (
  SELECT s_suppkey,
         ((s_suppkey * 37) % 360) - 180.0 AS slon,
         ((s_suppkey * 53) % 170) - 85.0  AS slat
  FROM supplier WHERE s_suppkey <= {_N_STATIONS}
),
pairs AS (
  SELECT event_id, s_suppkey,
         round(2 * 6371.0 * asin(sqrt(
           sin(radians(slat - lat) / 2) * sin(radians(slat - lat) / 2)
           + cos(radians(lat)) * cos(radians(slat))
             * sin(radians(slon - lon) / 2) * sin(radians(slon - lon) / 2)
         )), 4) AS dist_km
  FROM obs, st
)
SELECT event_id, s_suppkey AS nearest_station, dist_km
FROM (SELECT *, row_number() OVER (
        PARTITION BY event_id ORDER BY dist_km, s_suppkey) AS rn
      FROM pairs)
WHERE rn = 1
""",
)
def join_spatial_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-station spatial join — the geo lookup a satellite pipeline
    runs constantly (which ground station / grid anchor is closest to
    each observation).  The station dimension is SMALL by nature, so the
    scale-correct plan is not a join at all: the stations ship to every
    task as an array literal (a bounded station-count collect — the
    broadcast-variable pattern) and each observation computes its argmin
    in ONE codegen projection fold — zero shuffle, zero join, cost
    O(rows x stations) map-side.  ``array_min`` over (rounded_dist,
    station_id) structs gives the deterministic lexicographic argmin
    both engines agree on; distances round to 4 decimals so libm ulp
    differences cannot flip a winner.  The plan's no-Exchange/no-Join
    shape is pinned in tests/test_plans.py."""
    stations = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") <= _N_STATIONS)
        .select(
            "s_suppkey",
            (((F.col("s_suppkey") * 37) % 360) - 180.0).alias("slon"),
            (((F.col("s_suppkey") * 53) % 170) - 85.0).alias("slat"),
        )
        .collect()  # bounded: the station dim is <= _N_STATIONS rows
    )
    ev = table(spark, sf_dir, "events")
    lon = (F.col("event_id") % 360) - 180.0
    lat = (F.col("event_id") % 170) - 85.0

    def hav(slat: float, slon: float):
        dphi = F.radians(F.lit(slat) - lat) / 2
        dlmb = F.radians(F.lit(slon) - lon) / 2
        h = (
            F.sin(dphi) * F.sin(dphi)
            + F.cos(F.radians(lat))
            * F.cos(F.radians(F.lit(slat)))
            * F.sin(dlmb)
            * F.sin(dlmb)
        )
        return F.round(2 * 6371.0 * F.asin(F.sqrt(h)), 4)

    scored = F.array(
        *[
            F.struct(
                hav(s.slat, s.slon).alias("dist_km"),
                F.lit(s.s_suppkey).alias("k"),
            )
            for s in sorted(stations, key=lambda s: s.s_suppkey)
        ]
    )
    best = F.array_min(scored)
    return ev.select(
        "event_id",
        best["k"].alias("nearest_station"),
        best["dist_km"].alias("dist_km"),
    )


@register(
    "join_fuzzy",
    oracle="""
WITH master AS (
  SELECT DISTINCT p_name FROM part
),
dirty AS (
  SELECT p_partkey,
         substring(p_name, 1, 1) || substring(p_name, 3) AS dirty_name
  FROM part WHERE p_partkey % 7 = 0
),
cand AS (
  SELECT d.p_partkey, d.dirty_name, m.p_name,
         CAST(levenshtein(d.dirty_name, m.p_name) AS INTEGER) AS edit_dist
  FROM dirty d JOIN master m
    ON substring(d.dirty_name, 1, 1) = substring(m.p_name, 1, 1)
   AND abs(length(d.dirty_name) - length(m.p_name)) <= 2
  WHERE levenshtein(d.dirty_name, m.p_name) <= 2
)
SELECT p_partkey, dirty_name, p_name AS matched_name, edit_dist
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY p_partkey ORDER BY edit_dist, p_name) AS rn
  FROM cand
)
WHERE rn = 1
""",
)
def join_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (edit-distance) join — the record-linkage primitive in its
    production shape: DIRTY records (every 7th part's name with its 2nd
    character deleted, a deterministic single-edit corruption) are
    matched back against the CANONICAL name master list, best match per
    record by (edit distance, name) within levenshtein 2.

    Why this shape (changed after the first bench signal — 42.7 s at
    sf0.1): the earlier part×part self-join was degenerate on this
    corpus — all 3.1M emitted pairs were ED-0 identical-name pairs
    (64 distinct names over 20k parts) and no two DISTINCT names are
    within ED 2, so the quadratic paid for nothing a groupBy wouldn't
    find.  Linking dirty records to a master list is what fuzzy joins
    are FOR, and its cost profile is honest: candidates = dirty rows ×
    per-block master names.

    Execution: the master (distinct names — vocabulary-sized, not
    corpus-sized) BROADCASTS; blocking is first-char equality (sound
    for the deletion-at-position>=2 error model — the recall/cost dial
    every blocking scheme tunes to its error model) plus the ED length
    filter; survivors pay a codegen levenshtein verify and a
    per-record top-1 window.  The dirty side never shuffles for the
    join — at 100 TB the corpus streams map-side past a broadcast
    vocabulary, and only the (record, best-match) output exchanges for
    the window (or drops to a groupBy min_by at extreme widths)."""
    p = table(spark, sf_dir, "part")
    master = (
        p.select("p_name")
        .distinct()
        .select(
            "p_name",
            F.substring("p_name", 1, 1).alias("mblk"),
            F.length("p_name").alias("mln"),
        )
    )
    dirty = p.filter(F.col("p_partkey") % 7 == 0).select(
        "p_partkey",
        F.concat(
            F.substring("p_name", 1, 1), F.expr("substring(p_name, 3)")
        ).alias("dirty_name"),
    )
    cand = dirty.join(
        F.broadcast(master),
        (F.substring("dirty_name", 1, 1) == F.col("mblk"))
        & (F.abs(F.length("dirty_name") - F.col("mln")) <= 2),
    ).select(
        "p_partkey",
        "dirty_name",
        "p_name",
        F.levenshtein("dirty_name", "p_name").alias("edit_dist"),
    ).filter(F.col("edit_dist") <= 2)
    w = Window.partitionBy("p_partkey").orderBy("edit_dist", "p_name")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey",
            "dirty_name",
            F.col("p_name").alias("matched_name"),
            "edit_dist",
        )
    )


@register(
    "join_asof_nearest",
    oracle="""
WITH u AS (
  SELECT user_id, ts, event_id, epoch_us(ts) AS t_us,
         CASE WHEN event_type = 'purchase' THEN event_id END AS purchase_id,
         CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END AS purchase_us,
         CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS side
  FROM events
  WHERE event_type IN ('purchase', 'error')
), w AS (
  SELECT *,
         last_value(purchase_id IGNORE NULLS) OVER wb AS back_id,
         last_value(purchase_us IGNORE NULLS) OVER wb AS back_us,
         first_value(purchase_id IGNORE NULLS) OVER wf AS fwd_id,
         first_value(purchase_us IGNORE NULLS) OVER wf AS fwd_us
  FROM u
  WINDOW wb AS (PARTITION BY user_id ORDER BY ts, side, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY user_id ORDER BY ts, side, event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_id, user_id,
       CASE WHEN back_id IS NOT NULL AND (fwd_id IS NULL
                  OR t_us - back_us <= fwd_us - t_us)
            THEN back_id ELSE fwd_id END AS matched_purchase,
       CASE WHEN back_id IS NOT NULL AND (fwd_id IS NULL
                  OR t_us - back_us <= fwd_us - t_us)
            THEN t_us - back_us ELSE fwd_us - t_us END AS gap_us
FROM w WHERE side = 1
""",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, NEAREST direction (pandas ``merge_asof
    direction='nearest'`` semantics; ties prefer the backward match) —
    completing the as-of family: backward (``join_asof``), backward
    with tolerance (``join_asof_tolerance``), nearest.  Each error
    event matches the closest purchase in EITHER direction on its
    user's timeline.

    Same scale-first union+window formulation: tag both streams, union,
    and carry the last backward candidate AND the first forward
    candidate over ONE user_id sort (two frames, same partitioning —
    Catalyst plans a single exchange).  No range-pair explosion; the
    naive |ts - ts'| argmin theta-join is |A|x|B| per key."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "error")
    )
    is_p = F.col("event_type") == "purchase"
    u = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.unix_micros("ts").alias("t_us"),
        F.when(is_p, F.col("event_id")).alias("purchase_id"),
        F.when(is_p, F.unix_micros("ts")).alias("purchase_us"),
        F.when(is_p, F.lit(0)).otherwise(1).alias("side"),
    )
    order = ["ts", "side", "event_id"]
    wb = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    w = (
        u.withColumn("back_id", F.last("purchase_id", ignorenulls=True).over(wb))
        .withColumn("back_us", F.last("purchase_us", ignorenulls=True).over(wb))
        .withColumn("fwd_id", F.first("purchase_id", ignorenulls=True).over(wf))
        .withColumn("fwd_us", F.first("purchase_us", ignorenulls=True).over(wf))
    )
    take_back = F.col("back_id").isNotNull() & (
        F.col("fwd_id").isNull()
        | (F.col("t_us") - F.col("back_us") <= F.col("fwd_us") - F.col("t_us"))
    )
    return w.filter(F.col("side") == 1).select(
        "event_id",
        "user_id",
        F.when(take_back, F.col("back_id")).otherwise(F.col("fwd_id")).alias(
            "matched_purchase"
        ),
        F.when(take_back, F.col("t_us") - F.col("back_us"))
        .otherwise(F.col("fwd_us") - F.col("t_us"))
        .alias("gap_us"),
    )


@register(
    "join_pit_features",
    oracle="""
WITH u AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'view'  THEN value END AS view_value,
         CASE WHEN event_type = 'error' THEN value END AS error_value,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS side
  FROM events
  WHERE event_type IN ('purchase', 'view', 'error')
), w AS (
  SELECT *,
         last_value(view_value IGNORE NULLS) OVER pit AS f_view,
         last_value(error_value IGNORE NULLS) OVER pit AS f_error
  FROM u
  WINDOW pit AS (
    PARTITION BY user_id ORDER BY ts, side, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id AS obs_id, user_id, ts AS obs_ts, f_view, f_error
FROM w WHERE side = 1
""",
)
def join_pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME feature join — the feature-store primitive: for
    every observation (purchase), attach the latest value of EACH
    feature stream (views, errors) as of the observation timestamp.
    PIT-correctness is what prevents train/serve skew: a feature row
    from the observation's future would leak the label.

    The multi-table trick: instead of one as-of join per feature table
    (N shuffles), UNION all feature streams with the spine and carry one
    last-non-null column PER FEATURE over a single user-ordered window —
    N features cost ONE shuffle + ONE sort, and adding a feature stream
    is one more carried column, not another join.  Same-ts feature rows
    order BEFORE the spine row (side tiebreak), so as-of includes the
    boundary instant.  At 100 TB this is the difference between a
    feature-store backfill that runs and one that dies in shuffle."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view", "error")
    )
    u = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "view", F.col("value")).alias("view_value"),
        F.when(F.col("event_type") == "error", F.col("value")).alias("error_value"),
        F.when(F.col("event_type") == "purchase", F.lit(1)).otherwise(0).alias("side"),
    )
    pit = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w = u.select(
        "user_id",
        "ts",
        "event_id",
        "side",
        F.last("view_value", ignorenulls=True).over(pit).alias("f_view"),
        F.last("error_value", ignorenulls=True).over(pit).alias("f_error"),
    )
    return w.filter(F.col("side") == 1).select(
        F.col("event_id").alias("obs_id"),
        "user_id",
        F.col("ts").alias("obs_ts"),
        "f_view",
        "f_error",
    )


@register(
    "join_lateral_topn",
    oracle="""
SELECT n_name, c_name, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
FROM nation n,
     LATERAL (SELECT c_name, c_acctbal
              FROM customer c
              WHERE c.c_nationkey = n.n_nationkey
              ORDER BY c_acctbal DESC, c_name
              LIMIT 2) t
ORDER BY n_name, bal_cents DESC, c_name
""",
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORRELATED LATERAL subquery (SQL:2016 LATERAL, Spark 4 surface):
    per nation, the top-2 customers by account balance — the canonical
    top-n-per-group phrased as the correlated form analysts write,
    pinned against DuckDB's identical LATERAL semantics.

    Spark DECORRELATES the lateral limit into a partitioned window
    (DomainJoin rewrite), so the executed plan is the same
    WindowGroupLimit shape as ``ext_domain_volume_cap`` — per-group
    heaps both sides of one exchange, never a per-outer-row re-scan.
    The declarative payoff: the user writes the correlated query, the
    optimizer runs the scalable one."""
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    n.createOrReplaceTempView("sdis_nation_lateral")
    c.createOrReplaceTempView("sdis_customer_lateral")
    return spark.sql(
        """
        SELECT n_name, c_name,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        FROM sdis_nation_lateral n,
             LATERAL (SELECT c_name, c_acctbal
                      FROM sdis_customer_lateral c
                      WHERE c.c_nationkey = n.n_nationkey
                      ORDER BY c_acctbal DESC, c_name
                      LIMIT 2) t
        ORDER BY n_name, bal_cents DESC, c_name
        """
    )


@register(
    "join_interp_lookup",
    oracle="""
WITH kf AS (
  SELECT date_trunc('month', l_shipdate) AS d,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS v
  FROM lineitem GROUP BY 1
),
seg AS (
  SELECT d AS d_lo, v AS v_lo,
         lead(d) OVER (ORDER BY d) AS d_hi,
         lead(v) OVER (ORDER BY d) AS v_hi
  FROM kf
),
grid AS (
  SELECT CAST(d_lo + to_days(CAST(i AS INTEGER)) AS DATE) AS day,
         v_lo + (CAST(v_hi AS DOUBLE) - v_lo)
              * i / date_diff('day', d_lo, d_hi) AS v
  FROM seg, unnest(generate_series(0, date_diff('day', d_lo, d_hi) - 1))
       AS u(i)
  WHERE d_hi IS NOT NULL
)
SELECT o.o_orderkey, o.o_orderdate,
       floor(g.v / 100 * 10000 + 0.5) / 10000.0 AS curve_value
FROM orders o JOIN grid g ON o.o_orderdate = g.day
ORDER BY o.o_orderkey
""",
)
def join_interp_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIECEWISE-LINEAR INTERPOLATION JOIN — the calibration-curve /
    fx-rate lookup: probes (orders, by order date) read a sparse
    keyframe series (monthly shipped-revenue curve) at their exact
    position, linearly interpolated between the bracketing keyframes.

    The scalable phrasing is NOT a range join: the keyframe series is
    DENSIFIED first (lead() pairs consecutive keyframes — a
    |keyframes|-bounded window — then a sequence-explode emits one
    pre-interpolated value per day, the ``win_gap_fill_interp``
    machinery), and the probe side lands with a plain broadcast EQUI
    join on the day — no per-probe binary search, no
    BroadcastNestedLoop range predicate, fact side never shuffles.
    The dense grid is calendar-bounded (~2.6k days here, ~3.65k/decade)
    regardless of fact volume.  Probes outside the keyframe span drop
    (inner join) — the documented contract; LOCF tails are one
    ``win_gap_fill_locf`` away.  Exact integer cents in the keyframes;
    the lerp is one shared double expression."""
    li = table(spark, sf_dir, "lineitem")
    kf = li.groupBy(F.date_trunc("month", "l_shipdate").alias("d")).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("v")
    )
    w = Window.orderBy("d")  # |keyframes|-bounded: months in retention
    seg = kf.select(
        F.col("d").alias("d_lo"),
        F.col("v").alias("v_lo"),
        F.lead("d").over(w).alias("d_hi"),
        F.lead("v").over(w).alias("v_hi"),
    ).filter(F.col("d_hi").isNotNull())
    span = F.datediff(F.col("d_hi"), F.col("d_lo"))
    grid = seg.select(
        F.explode(F.sequence(F.lit(0), span - 1)).alias("i"),
        "d_lo",
        "v_lo",
        "v_hi",
        span.alias("len"),
    ).select(
        F.date_add(F.col("d_lo").cast("date"), F.col("i").cast("int")).alias("day"),
        (
            F.col("v_lo")
            + (F.col("v_hi").cast("double") - F.col("v_lo"))
            * F.col("i")
            / F.col("len")
        ).alias("v"),
    )
    o = table(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(grid), o.o_orderdate == F.col("day"))
        .select(
            "o_orderkey",
            "o_orderdate",
            (F.floor(F.col("v") / 100 * 10000 + 0.5) / 10000.0).alias(
                "curve_value"
            ),
        )
        .orderBy("o_orderkey")
    )


_JCA_TOPK = 10  # heaviest keys reported


@register(
    "join_cardinality_audit",
    oracle=f"""
WITH k AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt FROM lineitem GROUP BY 1
),
tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(cnt * cnt) AS BIGINT) AS join_rows,
         CAST(max(cnt) AS BIGINT) AS max_cnt
  FROM k
),
top AS (
  SELECT l_partkey, cnt FROM k
  ORDER BY cnt DESC, l_partkey LIMIT {_JCA_TOPK}
)
SELECT t.l_partkey, t.cnt,
       CAST(t.cnt * t.cnt AS BIGINT) AS self_join_rows,
       tot.join_rows AS total_join_rows,
       floor(CAST(t.cnt AS DOUBLE) * tot.n_keys / tot.n_rows * 10000 + 0.5)
         / 10000.0 AS skew_vs_avg
FROM top t CROSS JOIN tot
ORDER BY t.cnt DESC, t.l_partkey
""",
)
def join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-CARDINALITY AUDIT before a key-equi self-join: per-key counts
    on the join key (l_partkey), the EXACT output cardinality a
    self-join would produce (Σ cnt² — the number that decides between a
    plain shuffle join and ``join_salted``), and the {k} heaviest keys
    with their skew ratio vs the average key.  This is the planning
    diagnostic run BEFORE the expensive join, not after it OOMs: the
    audit costs one map-side-combined groupBy over the key column only.

    The top-k is a TakeOrderedAndProject heap (global limit over the
    key-grain frame — no full sort materializes); totals ride a
    broadcast 1-row aggregate."""
    li = table(spark, sf_dir, "lineitem")
    k = li.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    tot = k.agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("join_rows"),
    )
    top = k.orderBy(F.desc("cnt"), F.asc("l_partkey")).limit(_JCA_TOPK)
    return (
        top.crossJoin(F.broadcast(tot))
        .select(
            "l_partkey",
            "cnt",
            (F.col("cnt") * F.col("cnt")).cast("long").alias("self_join_rows"),
            F.col("join_rows").alias("total_join_rows"),
            (
                F.floor(
                    F.col("cnt").cast("double") * F.col("n_keys") / F.col("n_rows") * 10000
                    + 0.5
                )
                / 10000.0
            ).alias("skew_vs_avg"),
        )
        .orderBy(F.desc("cnt"), F.asc("l_partkey"))
    )


join_cardinality_audit.__doc__ = join_cardinality_audit.__doc__.format(
    k=_JCA_TOPK
)


@register(
    "join_allen_relations",
    oracle="""
WITH a AS (
  SELECT event_type, event_id AS a_id,
         ts AS a_lo, ts + INTERVAL 30 MINUTE AS a_hi
  FROM events WHERE event_id % 11 = 0
),
b AS (
  SELECT event_type, event_id AS b_id,
         ts AS b_lo, ts + INTERVAL 45 MINUTE AS b_hi
  FROM events WHERE event_id % 13 = 1
),
pairs AS (
  SELECT a_id, b_id,
         CASE
           WHEN a_hi < b_lo THEN 'before'
           WHEN b_hi < a_lo THEN 'after'
           WHEN a_hi = b_lo THEN 'meets'
           WHEN b_hi = a_lo THEN 'met_by'
           WHEN a_lo = b_lo AND a_hi = b_hi THEN 'equals'
           WHEN a_lo = b_lo AND a_hi < b_hi THEN 'starts'
           WHEN a_lo = b_lo AND a_hi > b_hi THEN 'started_by'
           WHEN a_hi = b_hi AND a_lo > b_lo THEN 'finishes'
           WHEN a_hi = b_hi AND a_lo < b_lo THEN 'finished_by'
           WHEN a_lo > b_lo AND a_hi < b_hi THEN 'during'
           WHEN a_lo < b_lo AND a_hi > b_hi THEN 'contains'
           WHEN a_lo < b_lo THEN 'overlaps'
           ELSE 'overlapped_by'
         END AS rel
  FROM a JOIN b ON a.event_type = b.event_type
             AND a_lo <= b_hi + INTERVAL 60 MINUTE
             AND b_lo <= a_hi + INTERVAL 60 MINUTE
)
SELECT rel, CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY rel ORDER BY rel
""",
)
def join_allen_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALLEN'S INTERVAL ALGEBRA census: classify same-type interval
    pairs (the join_interval_overlap derivation, widened by a ±60-min
    proximity band so the disjoint relations are observable) into the
    13 mutually-exclusive Allen relations — before/after, meets/met_by,
    equals, starts/started_by, finishes/finished_by, during/contains,
    overlaps/overlapped_by.  This is the full temporal-relationship
    vocabulary of which ``join_interval_overlap`` tests one disjunct
    and ``join_asof`` picks one representative; the census is the
    profiling step before choosing which relation a temporal join
    should enforce.

    Exactness: timestamps are exact microsecond instants, interval
    arithmetic is exact, every CASE arm is an equality/order test —
    the classification is discrete.  The CASE arms are ordered
    identically in both engines (first match wins, so arm order IS
    the semantics).

    Scale shape: the join_interval_overlap recipe — each BAND-PADDED
    span explodes to the hour buckets it covers (bounded by span/bucket
    width), the join is EQUI on (event_type, bucket) with the exact
    band predicate as a post-filter, and pairs that met in several
    buckets collapse via distinct before the census groupBy (≤13
    rows).  A type+range-only join would be a per-type cartesian."""
    ev = table(spark, sf_dir, "events")

    def intervals(mod, rem, minutes, prefix):
        iv = ev.filter(F.col("event_id") % mod == rem).select(
            "event_type",
            F.col("event_id").alias(f"{prefix}_id"),
            F.col("ts").alias(f"{prefix}_lo"),
            (F.col("ts") + F.expr(f"INTERVAL {minutes} MINUTES")).alias(f"{prefix}_hi"),
        )
        # pad by the ±60-min band so disjoint-but-near pairs share a bucket
        return iv.withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.date_trunc("hour", F.col(f"{prefix}_lo") - F.expr("INTERVAL 60 MINUTES")),
                    F.date_trunc("hour", F.col(f"{prefix}_hi") + F.expr("INTERVAL 60 MINUTES")),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ),
        )

    a = intervals(11, 0, 30, "a")
    b = intervals(13, 1, 45, "b").withColumnRenamed("event_type", "bt").withColumnRenamed(
        "bucket", "bbucket"
    )
    band = F.expr("INTERVAL 60 MINUTES")
    pairs = (
        a.join(
            b,
            (F.col("event_type") == F.col("bt")) & (F.col("bucket") == F.col("bbucket")),
        )
        .filter(
            (F.col("a_lo") <= F.col("b_hi") + band)
            & (F.col("b_lo") <= F.col("a_hi") + band)
        )
        .select("a_id", "b_id", "a_lo", "a_hi", "b_lo", "b_hi")
        .distinct()
    )
    rel = (
        F.when(F.col("a_hi") < F.col("b_lo"), "before")
        .when(F.col("b_hi") < F.col("a_lo"), "after")
        .when(F.col("a_hi") == F.col("b_lo"), "meets")
        .when(F.col("b_hi") == F.col("a_lo"), "met_by")
        .when((F.col("a_lo") == F.col("b_lo")) & (F.col("a_hi") == F.col("b_hi")), "equals")
        .when((F.col("a_lo") == F.col("b_lo")) & (F.col("a_hi") < F.col("b_hi")), "starts")
        .when(
            (F.col("a_lo") == F.col("b_lo")) & (F.col("a_hi") > F.col("b_hi")),
            "started_by",
        )
        .when(
            (F.col("a_hi") == F.col("b_hi")) & (F.col("a_lo") > F.col("b_lo")), "finishes"
        )
        .when(
            (F.col("a_hi") == F.col("b_hi")) & (F.col("a_lo") < F.col("b_lo")),
            "finished_by",
        )
        .when((F.col("a_lo") > F.col("b_lo")) & (F.col("a_hi") < F.col("b_hi")), "during")
        .when((F.col("a_lo") < F.col("b_lo")) & (F.col("a_hi") > F.col("b_hi")), "contains")
        .when(F.col("a_lo") < F.col("b_lo"), "overlaps")
        .otherwise("overlapped_by")
    )
    return (
        pairs.select(rel.alias("rel"))
        .groupBy("rel")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy("rel")
    )
