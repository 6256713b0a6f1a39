"""Distributed exact global ranking — the shared decomposition that keeps
total-order analytics (equi-depth histograms, ntile scoring, Pareto
cumulative shares) off the single-task WindowExec.

A bare ``Window.orderBy(...)`` with no PARTITION BY coalesces EVERY row
into ONE task in Spark — fine on a 25-row nation table, an OOM/bottleneck
on a fact or entity table at 100 TB.  The classic fix (Goetz Graefe's
"parallel rank" / the same trick RDD ``zipWithIndex`` uses) is:

1. ``repartitionByRange`` on the sort key → non-overlapping sorted ranges;
2. per-partition LOCAL ``row_number`` (and local prefix sums), windowed by
   ``spark_partition_id`` — parallel across all partitions;
3. a prefix sum over the per-partition count/sum frame — |partitions| rows,
   the ONE place an unpartitioned window is legitimately bounded — broadcast
   back as offsets: ``global = offset + local``.

The result is EXACT and independent of where the sampled range boundaries
fall (any non-overlapping ordered split works).  Both branches consume the
SAME range Exchange inside one query, so Spark's ReuseExchange guarantees
``spark_partition_id`` is consistent between the local-rank branch and the
counts branch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["distributed_rank", "distributed_prev_max", "ntile_from_rank"]


def distributed_rank(
    df: DataFrame,
    order_cols: list,
    sum_cols: tuple[str, ...] = (),
    num_partitions: int = 32,
    keep_pid: bool = False,
) -> DataFrame:
    """Append exact global ``_rk`` (row_number over *order_cols*) and
    ``_n_total`` to *df* without a single-task window; for each name in
    *sum_cols* also append the inclusive running sum ``_cum_<c>`` and the
    grand total ``_tot_<c>``.

    *order_cols* must be a deterministic total order (append a unique key
    as the final tiebreak).  Accepts names or Column sort expressions
    (``F.desc("rev")``).

    With ``keep_pid=True`` the range-partition id column ``_pid`` is
    retained: ``_rk`` is contiguous within each ``_pid`` and ``_pid``
    ascends with ``_rk``, so callers can run ADJACENT-ROW logic (lag /
    lead) partition-locally and stitch only the ``num_partitions - 1``
    boundary pairs from a bounded per-partition edge aggregate.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    # MATERIALIZE the ranged frame before fanning out to the two branches.
    # Without this, each branch re-executes the range exchange with its
    # OWN boundary-sampling job over the upstream; when the upstream's row
    # order is nondeterministic (found live in round 14: the sort-merge /
    # AQE-replanned join feeding agg_xi_correlation), the two samplings
    # pick different boundaries, the branches disagree on _pid, and the
    # offsets misalign — _rk silently stops being a 1..n bijection (2-3%
    # duplicate ranks, varying run to run).  One localCheckpoint pins a
    # single shuffle + sampling whose persisted partitions BOTH branches
    # read; deterministic scan-grain inputs (the prior invariant test's
    # domain) never exposed this, join-grain inputs require it.
    #
    # Fault-tolerance tradeoff (deliberate): eager localCheckpoint runs a
    # Spark job at DataFrame-CONSTRUCTION time for every caller (plan
    # inspection triggers execution) and truncates lineage onto executor
    # local disk, so on a real cluster an executor loss fails the query
    # instead of recomputing the lost partitions.  That is the right trade
    # here — the pinned frame is one shuffle wide and cheap to re-run at
    # the query level — but deployments where mid-query executor loss must
    # be survivable should swap this for persist(DISK_ONLY) + count()
    # (lineage kept, same single-sampling pin, slower first touch).
    loc = (
        df.repartitionByRange(num_partitions, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_loc = Window.partitionBy("_pid").orderBy(*cols)
    w_run = w_loc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = loc.withColumn("_lrk", F.row_number().over(w_loc))
    for c in sum_cols:
        local = local.withColumn(f"_lcum_{c}", F.sum(c).over(w_run))

    counts = loc.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("_cnt"),
        *[F.sum(c).alias(f"_s_{c}") for c in sum_cols],
    )
    # |num_partitions| rows — the bounded case where an unpartitioned
    # window is correct by construction.
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    w_tot = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_cnt").over(w_tot).cast("long").alias("_n_total"),
        *[
            F.coalesce(F.sum(f"_s_{c}").over(w_off), F.lit(0)).alias(f"_off_{c}")
            for c in sum_cols
        ],
        *[F.sum(f"_s_{c}").over(w_tot).alias(f"_tot_{c}") for c in sum_cols],
    )
    out = local.join(F.broadcast(offsets), "_pid").withColumn(
        "_rk", (F.col("_lrk") + F.col("_off")).cast("long")
    )
    for c in sum_cols:
        out = out.withColumn(f"_cum_{c}", F.col(f"_lcum_{c}") + F.col(f"_off_{c}"))
    drop = (["_pid"] if not keep_pid else []) + ["_lrk", "_off"] + [
        n for c in sum_cols for n in (f"_lcum_{c}", f"_off_{c}")
    ]
    return out.drop(*drop)


def ntile_from_rank(k: int, rk: Column, n: Column) -> Column:
    """SQL-standard ``ntile(k)`` from an exact 1-based rank *rk* over *n*
    rows: the first ``n % k`` buckets get ``floor(n/k) + 1`` rows, the rest
    ``floor(n/k)`` — the same distribution Spark and DuckDB implement, so
    the result is engine-portable without the single-task ntile window.

    Floor-of-double is exact below 2^52 rows; the else-branch division is
    only evaluated (CaseWhen is lazy per-row) for ranks past the big
    buckets, which implies ``floor(n/k) > 0``.
    """
    q = F.floor(n / k).cast("long")  # small-bucket size
    r = (n - q * k).cast("long")  # number of (q+1)-sized buckets
    cutoff = r * (q + 1)
    return (
        F.when(rk <= cutoff, F.ceil(rk / (q + 1)))
        .otherwise(r + F.ceil((rk - cutoff) / q))
        .cast("long")
    )


def distributed_prev_max(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    num_partitions: int = 32,
) -> DataFrame:
    """Append ``_prevmax`` — the running max of *value_col* over all
    STRICTLY PRIOR rows in the *order_cols* total order (the exclusive
    ``ROWS UNBOUNDED PRECEDING TO 1 PRECEDING`` frame) — without a
    single-task window; NULL when no prior row exists.

    Same decomposition as :func:`distributed_rank` (running max is
    associative, so the prefix-combine trick carries over verbatim):
    range-partition on the order, per-partition LOCAL exclusive running
    max, then a |partitions|-row prefix max broadcast back as the carry-in:
    ``global_prevmax = greatest(partition_carry_in, local_prevmax)``
    (``greatest`` skips NULLs in Spark, which is exactly the identity
    element the combine needs).  This is what keeps sweep-line operators
    (2D skyline dominance, record-to-date) bounded by construction even
    when their input is the whole fact table — e.g. a skyline-hostile
    distribution where no row dominates any other and every candidate
    survives pruning."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    # Same two-consumer materialization as distributed_rank (see the
    # comment there): both branches must read ONE pinned range shuffle.
    loc = (
        df.repartitionByRange(num_partitions, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_loc = Window.partitionBy("_pid").orderBy(*cols).rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = loc.withColumn("_lmax", F.max(value_col).over(w_loc))
    pmax = loc.groupBy("_pid").agg(F.max(value_col).alias("_pm"))
    # |num_partitions| rows — the bounded case where an unpartitioned
    # window is correct by construction (same as distributed_rank).
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = pmax.select("_pid", F.max("_pm").over(w_off).alias("_carry"))
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("_prevmax", F.greatest("_lmax", "_carry"))
        .drop("_pid", "_lmax", "_carry")
    )
