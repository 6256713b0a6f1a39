"""Rank-based nonparametric hypothesis statistics — the distribution-free
A/B toolkit (two-sample KS, Mann-Whitney U, Spearman rank correlation)
that data-quality and experimentation pipelines run when values are
skewed/heavy-tailed and a t-test's normality assumption is wrong.

All three are RANK statistics, which makes them the natural clients of
``operators.ranking.distributed_rank``: every cumulative count / rank sum
comes from range-partitioned local windows plus broadcast prefix offsets
— never a single-task unpartitioned WindowExec — and every statistic is
a pure function of EXACT integer counts (tie-group average ranks are
integers-over-2, rank products integers-over-4, all < 2^53), so the
final doubles are bit-identical across engines and each operator carries
a full DuckDB value oracle despite being "statistics".

Reference analog: none (the reference computes no statistics); [EXT]
mandate territory like operators/aggregates.py's chi2/Cramers-V cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from .ranking import distributed_rank


def r6(x):
    """Shared explicit half-up rounding (the cross-engine tie recipe)."""
    return F.floor(x * 1000000 + 0.5) / 1000000.0


def q4(x):
    """Shared 4-decimal half-up rounding (cents-scale outputs)."""
    return F.floor(x * 10000 + 0.5) / 10000.0


@register(
    "agg_ks_test",
    oracle="""
WITH pts AS (
  SELECT value, CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS in_a
  FROM events
), g AS (
  SELECT value,
         CAST(sum(in_a) AS BIGINT) AS ca,
         CAST(sum(1 - in_a) AS BIGINT) AS cb
  FROM pts GROUP BY 1
), n AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb FROM g
), c AS (
  SELECT CAST(sum(ca) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_a,
         CAST(sum(cb) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_b
  FROM g
)
SELECT n.na, n.nb,
       floor(max(abs(CAST(cum_a AS DOUBLE) / n.na
                     - CAST(cum_b AS DOUBLE) / n.nb)) * 1000000 + 0.5)
         / 1000000.0 AS ks_d
FROM c CROSS JOIN n
GROUP BY n.na, n.nb
""",
)
def agg_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-SAMPLE KOLMOGOROV-SMIRNOV statistic D = max_x |F_A(x) -
    F_B(x)| between the even- and odd-event_id halves of the events
    value distribution — the distribution-free "did this split change
    the distribution?" test (the CDF-distance sibling of
    ``ext_psi_split_drift``'s binned divergence; KS needs no binning
    choice).  Ties handled exactly: the ECDF steps AFTER absorbing a
    tie group, so the sup runs over distinct values.

    Scale shape: one map-side-combined groupBy to the distinct-value
    grain, then BOTH cumulative counts come from ONE
    ``distributed_rank`` pass (sum_cols) — range-partitioned local
    cumsums + broadcast prefix offsets, no single-task window — and a
    1-row max-reduce.  D is |int/na - int/nb|: two exact divisions and
    one subtraction in the same order both engines."""
    ev = table(spark, sf_dir, "events")
    g = (
        ev.select(
            "value",
            F.when(F.col("event_id") % 2 == 0, 1).otherwise(0).alias("in_a"),
        )
        .groupBy("value")
        .agg(
            F.sum("in_a").cast("long").alias("ca"),
            F.sum(1 - F.col("in_a")).cast("long").alias("cb"),
        )
    )
    c = distributed_rank(g, ["value"], sum_cols=("ca", "cb"))
    d = F.abs(
        F.col("_cum_ca").cast("double") / F.col("_tot_ca")
        - F.col("_cum_cb").cast("double") / F.col("_tot_cb")
    )
    return (
        c.select(
            F.col("_tot_ca").cast("long").alias("na"),
            F.col("_tot_cb").cast("long").alias("nb"),
            d.alias("d"),
        )
        .groupBy("na", "nb")
        .agg(r6(F.max("d")).alias("ks_d"))
    )


@register(
    "agg_mann_whitney",
    oracle="""
WITH pts AS (
  SELECT value, CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS in_a
  FROM events
), g AS (
  SELECT value,
         CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(in_a) AS BIGINT) AS ca
  FROM pts GROUP BY 1
), c AS (
  SELECT cnt, ca,
         CAST(coalesce(sum(cnt) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
  FROM g
), n AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na,
         CAST(sum(cnt) - sum(ca) AS BIGINT) AS nb
  FROM g
), rs AS (
  -- tie-group average rank = off + (cnt+1)/2, an exact half-integer;
  -- ca of them belong to sample A
  SELECT sum(ca * (off + (CAST(cnt AS DOUBLE) + 1) / 2)) AS ra FROM c
)
SELECT n.na, n.nb,
       rs.ra AS rank_sum_a,
       rs.ra - CAST(n.na AS DOUBLE) * (n.na + 1) / 2 AS u_a,
       floor(((rs.ra - CAST(n.na AS DOUBLE) * (n.na + 1) / 2)
              / (CAST(n.na AS DOUBLE) * n.nb)) * 1000000 + 0.5)
         / 1000000.0 AS auc
FROM n CROSS JOIN rs
""",
)
def agg_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-WHITNEY U between the even/odd event_id halves of the events
    values, with the standard midrank (average-rank) tie treatment —
    the nonparametric "is one split stochastically larger?" test, and
    U/(na·nb) is exactly the AUC of separating the two samples (the
    experiment readout A/B platforms actually report).

    Ranks never materialize per row: one groupBy to the distinct-value
    grain, ONE ``distributed_rank`` pass for the exclusive cumulative
    count (= the rank offset of each tie group), then the rank sum is a
    single dot product Σ ca·(off + (cnt+1)/2) — every term an exact
    half-integer, so the float sum is exact below 2^52 and the U and
    AUC formulas are engine-identical."""
    ev = table(spark, sf_dir, "events")
    g = (
        ev.select(
            "value",
            F.when(F.col("event_id") % 2 == 0, 1).otherwise(0).alias("in_a"),
        )
        .groupBy("value")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("in_a").cast("long").alias("ca"),
        )
    )
    c = distributed_rank(g, ["value"], sum_cols=("cnt",))
    c = c.select(
        "cnt",
        "ca",
        (F.col("_cum_cnt") - F.col("cnt")).cast("long").alias("off"),
        F.col("_tot_cnt").cast("long").alias("n_all"),
    )
    agg = c.agg(
        F.sum(
            F.col("ca")
            * (F.col("off") + (F.col("cnt").cast("double") + 1) / 2)
        ).alias("ra"),
        F.sum("ca").cast("long").alias("na"),
        (F.max("n_all") - F.sum("ca")).cast("long").alias("nb"),
    )
    u = F.col("ra") - F.col("na").cast("double") * (F.col("na") + 1) / 2
    return agg.select(
        "na",
        "nb",
        F.col("ra").alias("rank_sum_a"),
        u.alias("u_a"),
        r6(u / (F.col("na").cast("double") * F.col("nb"))).alias("auc"),
    )


@register(
    "agg_spearman_corr",
    oracle="""
WITH cust AS (
  SELECT o_custkey,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS mon
  FROM orders GROUP BY 1
), gx AS (
  SELECT freq, CAST(count(*) AS BIGINT) AS cnt,
         CAST(coalesce(sum(count(*)) OVER (ORDER BY freq
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
  FROM cust GROUP BY freq
), gy AS (
  SELECT mon, CAST(count(*) AS BIGINT) AS cnt,
         CAST(coalesce(sum(count(*)) OVER (ORDER BY mon
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
  FROM cust GROUP BY mon
), ranked AS (
  SELECT (gx.off + (CAST(gx.cnt AS DOUBLE) + 1) / 2) AS rx,
         (gy.off + (CAST(gy.cnt AS DOUBLE) + 1) / 2) AS ry
  FROM cust JOIN gx USING (freq) JOIN gy USING (mon)
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(rx) AS sx, sum(ry) AS sy,
         sum(rx * ry) AS sxy, sum(rx * rx) AS sxx, sum(ry * ry) AS syy
  FROM ranked
)
SELECT n,
       floor(((n * sxy - sx * sy)
              / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
             * 1000000 + 0.5) / 1000000.0 AS spearman_rho
FROM m
""",
)
def agg_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPEARMAN RANK CORRELATION between per-customer order frequency
    and monetary value — Pearson over midranks, the robust monotonic-
    association measure that survives the heavy-tailed spend
    distribution a raw Pearson (``agg_corr_matrix``) gets dragged by.

    Midranks come from the tie-group decomposition (exclusive
    cumulative count + (cnt+1)/2), each an exact half-integer, so every
    Pearson moment over them (Σrx, Σrxry, ...) is an exact multiple of
    1/4 summed below 2^52 — order-independent and engine-identical —
    and rho is one deterministic double formula.  Scale shape: customer
    -grain aggregate, two tie-group aggregates joined back (broadcast-
    sized only if the value domains are; no hint), one 1-row moment
    reduce.  The tie-group offsets use ``distributed_rank``'s bounded
    prefix frame, never a per-row global window."""
    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    cust = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum(cents).cast("long").alias("mon"),
    )

    def midranks(col: str) -> DataFrame:
        g = cust.groupBy(col).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        c = distributed_rank(g, [col], sum_cols=("cnt",))
        return c.select(
            col,
            (
                (F.col("_cum_cnt") - F.col("cnt")).cast("double")
                + (F.col("cnt").cast("double") + 1) / 2
            ).alias(f"r_{col}"),
        )

    ranked = (
        cust.join(midranks("freq"), "freq")
        .join(midranks("mon"), "mon")
        .select(F.col("r_freq").alias("rx"), F.col("r_mon").alias("ry"))
    )
    m = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select("n", r6(num / den).alias("spearman_rho"))


@register(
    "agg_welch_t",
    oracle="""
WITH g AS (
  SELECT CASE WHEN event_id % 2 = 0 THEN 'a' ELSE 'b' END AS grp,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv,
         CAST(sum(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sq
  FROM events GROUP BY 1
), w AS (
  SELECT
    max(CASE WHEN grp = 'a' THEN n END) AS na,
    max(CASE WHEN grp = 'b' THEN n END) AS nb,
    CAST(max(CASE WHEN grp = 'a' THEN sv END) AS DOUBLE)
      / max(CASE WHEN grp = 'a' THEN n END) AS ma,
    CAST(max(CASE WHEN grp = 'b' THEN sv END) AS DOUBLE)
      / max(CASE WHEN grp = 'b' THEN n END) AS mb,
    (CAST(max(CASE WHEN grp = 'a' THEN sq END) AS DOUBLE)
     - max(CASE WHEN grp = 'a' THEN n END)
       * ((CAST(max(CASE WHEN grp = 'a' THEN sv END) AS DOUBLE)
           / max(CASE WHEN grp = 'a' THEN n END))
          * (CAST(max(CASE WHEN grp = 'a' THEN sv END) AS DOUBLE)
             / max(CASE WHEN grp = 'a' THEN n END))))
      / (max(CASE WHEN grp = 'a' THEN n END) - 1) AS va,
    (CAST(max(CASE WHEN grp = 'b' THEN sq END) AS DOUBLE)
     - max(CASE WHEN grp = 'b' THEN n END)
       * ((CAST(max(CASE WHEN grp = 'b' THEN sv END) AS DOUBLE)
           / max(CASE WHEN grp = 'b' THEN n END))
          * (CAST(max(CASE WHEN grp = 'b' THEN sv END) AS DOUBLE)
             / max(CASE WHEN grp = 'b' THEN n END))))
      / (max(CASE WHEN grp = 'b' THEN n END) - 1) AS vb
  FROM g
)
SELECT na, nb,
       floor((ma - mb) / sqrt(va / na + vb / nb) * 1000000 + 0.5)
         / 1000000.0 AS t_stat,
       floor(((va / na + vb / nb) * (va / na + vb / nb))
             / ((va / na) * (va / na) / (na - 1)
                + (vb / nb) * (vb / nb) / (nb - 1)) * 10000 + 0.5)
         / 10000.0 AS welch_df
FROM w
""",
)
def agg_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WELCH'S UNEQUAL-VARIANCE t-TEST between the even/odd event_id
    halves of the events values — the parametric partner of
    ``agg_mann_whitney`` (that one asks "stochastically larger?", this
    one "different MEAN?", valid under unequal variances), plus the
    Welch-Satterthwaite effective degrees of freedom.

    Every moment (n, Σcents, Σcents²) is an exact integer from ONE
    map-side-combined aggregate; means, variances, t and df are closed
    -form double expressions evaluated in the identical order both
    engines (cents discipline + explicit half-up rounding).  Scale:
    one scan, one 2-row aggregate, a 1-row report."""
    ev = table(spark, sf_dir, "events")
    c = F.round(F.col("value") * 100).cast("long")
    g = ev.groupBy(
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias("grp")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(c).cast("long").alias("sv"),
        F.sum(c * c).cast("long").alias("sq"),
    )

    def pick(col):
        return {
            k: F.max(F.when(F.col("grp") == k, F.col(col))) for k in ("a", "b")
        }

    n_, sv_, sq_ = pick("n"), pick("sv"), pick("sq")
    w = g.agg(
        n_["a"].alias("na"),
        n_["b"].alias("nb"),
        (sv_["a"].cast("double") / n_["a"]).alias("ma"),
        (sv_["b"].cast("double") / n_["b"]).alias("mb"),
        (
            (
                sq_["a"].cast("double")
                - n_["a"]
                * ((sv_["a"].cast("double") / n_["a"]) * (sv_["a"].cast("double") / n_["a"]))
            )
            / (n_["a"] - 1)
        ).alias("va"),
        (
            (
                sq_["b"].cast("double")
                - n_["b"]
                * ((sv_["b"].cast("double") / n_["b"]) * (sv_["b"].cast("double") / n_["b"]))
            )
            / (n_["b"] - 1)
        ).alias("vb"),
    )
    se2 = F.col("va") / F.col("na") + F.col("vb") / F.col("nb")
    t = (F.col("ma") - F.col("mb")) / F.sqrt(se2)
    df = (se2 * se2) / (
        (F.col("va") / F.col("na")) * (F.col("va") / F.col("na")) / (F.col("na") - 1)
        + (F.col("vb") / F.col("nb")) * (F.col("vb") / F.col("nb")) / (F.col("nb") - 1)
    )
    return w.select(
        "na",
        "nb",
        (F.floor(t * 1000000 + 0.5) / 1000000.0).alias("t_stat"),
        (F.floor(df * 10000 + 0.5) / 10000.0).alias("welch_df"),
    )


_LORENZ_BUCKETS = 10


@register(
    "agg_lorenz_curve",
    oracle=f"""
WITH cust AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
  FROM orders GROUP BY 1
), ranked AS (
  SELECT rev, ntile({_LORENZ_BUCKETS}) OVER (ORDER BY rev, o_custkey) AS decile
  FROM cust
), d AS (
  SELECT CAST(decile AS BIGINT) AS decile,
         CAST(count(*) AS BIGINT) AS n_customers,
         CAST(sum(rev) AS BIGINT) AS decile_rev_cents
  FROM ranked GROUP BY 1
), c AS (
  SELECT decile, n_customers, decile_rev_cents,
         CAST(sum(decile_rev_cents) OVER (ORDER BY decile
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(sum(decile_rev_cents) OVER () AS BIGINT) AS tot
  FROM d
)
SELECT decile, n_customers, decile_rev_cents,
       floor(CAST(cum AS DOUBLE) / tot * 1000000 + 0.5) / 1000000.0
         AS cum_rev_share
FROM c
""",
)
def agg_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LORENZ CURVE decile table of customer revenue concentration —
    the plottable companion of ``agg_gini``'s single coefficient and
    ``agg_pareto``'s 80/20 readout: per ascending-revenue decile, the
    customer count, exact-cent revenue, and cumulative revenue share.

    Deciles come from the exact global rank (``distributed_rank`` +
    the SQL-standard ``ntile_from_rank`` — never a single-task ntile
    window over the |customers| aggregate); the cumulative share runs
    over the BOUNDED {b}-row decile frame, the one place an
    unpartitioned window is safe by construction."""
    from pyspark.sql import Window

    from .ranking import ntile_from_rank

    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    cust = o.groupBy("o_custkey").agg(F.sum(cents).cast("long").alias("rev"))
    ranked = distributed_rank(cust, ["rev", "o_custkey"])
    d = (
        ranked.select(
            "rev",
            ntile_from_rank(
                _LORENZ_BUCKETS, F.col("_rk"), F.col("_n_total")
            ).alias("decile"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("rev").cast("long").alias("decile_rev_cents"),
        )
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    w_tot = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return d.select(
        "decile",
        "n_customers",
        "decile_rev_cents",
        (
            F.floor(
                F.sum("decile_rev_cents").over(w_cum).cast("double")
                / F.sum("decile_rev_cents").over(w_tot)
                * 1000000
                + 0.5
            )
            / 1000000.0
        ).alias("cum_rev_share"),
    )


agg_lorenz_curve.__doc__ = agg_lorenz_curve.__doc__.format(b=_LORENZ_BUCKETS)


_KM_CENSOR_DAYS = 7  # users active within this window of corpus end are censored


@register(
    "agg_kaplan_meier",
    oracle=f"""
WITH horizon AS (
  SELECT max(ts) - INTERVAL {_KM_CENSOR_DAYS} DAY AS cutoff FROM events
), u AS (
  SELECT user_id,
         CAST(date_diff('day', min(ts), max(ts)) AS BIGINT) AS duration,
         max(ts) < (SELECT cutoff FROM horizon) AS churned
  FROM events GROUP BY 1
), g AS (
  SELECT duration,
         CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(sum(CASE WHEN churned THEN 0 ELSE 1 END) AS BIGINT) AS c,
         CAST(count(*) AS BIGINT) AS n_dur
  FROM u GROUP BY 1
), r AS (
  SELECT duration, d, c,
         CAST((SELECT count(*) FROM u) AS BIGINT)
           - CAST(coalesce(sum(n_dur) OVER (ORDER BY duration
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS n_risk
  FROM g
), s AS (
  SELECT duration, d, c, n_risk,
         list_reduce(
           list_prepend(1.0,
             list(1.0 - CAST(d AS DOUBLE) / n_risk)
               OVER (ORDER BY duration
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
           (acc, x) -> acc * x) AS surv
  FROM r
)
SELECT duration, n_risk, d AS n_churned, c AS n_censored,
       floor(surv * 1000000 + 0.5) / 1000000.0 AS survival
FROM s
WHERE d > 0
""",
)
def agg_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN-MEIER survival curve of user lifetime (days between first
    and last event), right-censoring users still active within
    {cd} days of the corpus end — THE retention statistic (the
    censoring-aware upgrade of ``agg_cohort_retention``'s naive
    percentages: a user who simply hasn't churned YET must not count
    as churned).  S(t) = Π_{{t_i ≤ t}} (1 − d_i/n_i) over event times.

    Exactness: d_i and the at-risk counts n_i are exact integers (the
    risk set is total − exclusive-prefix of duration counts, from ONE
    ``distributed_rank`` pass); the survival PRODUCT folds
    SEQUENTIALLY over the duration-sorted factor list — the
    multiplicative twin of the ext_kl_divergence additive fold, over
    the BOUNDED distinct-duration frame — so both engines multiply the
    identical doubles in the identical order.

    Scale: one user-grain aggregate, one duration-grain aggregate,
    one bounded fold; output is |distinct churn durations| rows."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    horizon = ev.agg(
        (F.max("ts") - F.expr(f"INTERVAL {_KM_CENSOR_DAYS} DAYS")).alias("cutoff")
    )
    u = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
        .crossJoin(F.broadcast(horizon))
        .select(
            F.datediff("last_ts", "first_ts").cast("long").alias("duration"),
            (F.col("last_ts") < F.col("cutoff")).alias("churned"),
        )
    )
    g = u.groupBy("duration").agg(
        F.sum(F.when(F.col("churned"), 1).otherwise(0)).cast("long").alias("d"),
        F.sum(F.when(F.col("churned"), 0).otherwise(1)).cast("long").alias("c"),
        F.count(F.lit(1)).cast("long").alias("n_dur"),
    )
    r = distributed_rank(g, ["duration"], sum_cols=("n_dur",)).select(
        "duration",
        "d",
        "c",
        (F.col("_tot_n_dur") - (F.col("_cum_n_dur") - F.col("n_dur")))
        .cast("long")
        .alias("n_risk"),
    )
    # Bounded fold: the cumulative product over the distinct-duration
    # frame (≤ the corpus day span) — collected once, folded in order.
    w_cum = Window.orderBy("duration").rowsBetween(Window.unboundedPreceding, 0)
    factors = F.collect_list(
        F.struct("duration", (1.0 - F.col("d").cast("double") / F.col("n_risk")).alias("f"))
    ).over(w_cum)
    s = r.select(
        "duration",
        "n_risk",
        F.col("d").alias("n_churned"),
        F.col("c").alias("n_censored"),
        F.aggregate(
            F.transform(F.array_sort(factors), lambda x: x.getField("f")),
            F.lit(1.0),
            lambda acc, x: acc * x,
        ).alias("surv"),
        "d",
    )
    return s.filter(F.col("d") > 0).select(
        "duration",
        "n_risk",
        "n_churned",
        "n_censored",
        (F.floor(F.col("surv") * 1000000 + 0.5) / 1000000.0).alias("survival"),
    )


agg_kaplan_meier.__doc__ = agg_kaplan_meier.__doc__.format(cd=_KM_CENSOR_DAYS)


@register(
    "agg_kruskal_wallis",
    oracle="""
WITH gv AS (
  SELECT value, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1
),
c AS (
  SELECT value, cnt,
         CAST(coalesce(sum(cnt) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS off
  FROM gv
),
ge AS (
  SELECT value, event_type, CAST(count(*) AS BIGINT) AS cge
  FROM events GROUP BY 1, 2
),
per_type AS (
  SELECT ge.event_type,
         CAST(sum(ge.cge) AS BIGINT) AS n_i,
         sum(ge.cge * (c.off + (CAST(c.cnt AS DOUBLE) + 1) / 2)) AS r_i
  FROM ge JOIN c USING (value)
  GROUP BY 1
),
ties AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n,
         CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tsum
  FROM gv
),
terms AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                  list(r_i * r_i / n_i ORDER BY event_type)),
                     (a, x) -> a + x) AS s
  FROM per_type
)
SELECT t.n, terms.k,
       floor((12.0 / (CAST(t.n AS DOUBLE) * (t.n + 1)) * terms.s
              - 3.0 * (t.n + 1))
             / (1.0 - CAST(t.tsum AS DOUBLE)
                      / (CAST(t.n AS DOUBLE) * t.n * t.n - t.n))
             * 1000000 + 0.5) / 1000000.0 AS h_corrected
FROM ties t CROSS JOIN terms
""",
)
def agg_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KRUSKAL-WALLIS H across the k event-type groups of the events
    values — the k-group extension of ``agg_mann_whitney`` (one-way
    ANOVA on ranks), with midrank ties and the standard tie correction
    ``C = 1 − Σ(t³−t)/(N³−N)``.

    Same decomposition as MW: ranks never materialize per row — the
    value grain gets exclusive cumulative counts from
    ``distributed_rank``, per-type rank sums are dot products of exact
    half-integers, and the k per-type terms R_i²/n_i fold SEQUENTIALLY
    in event_type order (k-bounded array) so the one order-sensitive
    double sum is deterministic."""
    ev = table(spark, sf_dir, "events")
    gv = ev.groupBy("value").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    c = distributed_rank(gv, ["value"], sum_cols=("cnt",)).select(
        "value",
        "cnt",
        (F.col("_cum_cnt") - F.col("cnt")).cast("long").alias("off"),
    )
    ge = ev.groupBy("value", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("cge")
    )
    per_type = (
        ge.join(c, "value")
        .groupBy("event_type")
        .agg(
            F.sum("cge").cast("long").alias("n_i"),
            F.sum(
                F.col("cge")
                * (F.col("off") + (F.col("cnt").cast("double") + 1) / 2)
            ).alias("r_i"),
        )
    )
    ties = gv.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).cast("long").alias("tsum"),
    )
    terms = per_type.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("event_type"),
                            (F.col("r_i") * F.col("r_i") / F.col("n_i")).alias(
                                "t"
                            ),
                        )
                    )
                ),
                lambda s: s.getField("t"),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("s"),
    )
    n = F.col("n").cast("double")
    h = 12.0 / (n * (F.col("n") + 1)) * F.col("s") - 3.0 * (F.col("n") + 1)
    corr = 1.0 - F.col("tsum").cast("double") / (n * F.col("n") * F.col("n") - F.col("n"))
    return (
        ties.crossJoin(F.broadcast(terms))
        .select("n", "k", r6(h / corr).alias("h_corrected"))
    )


@register(
    "agg_theil_sen",
    oracle="""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', date_trunc('day', ts))
              AS BIGINT) AS d,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
),
pairs AS (
  SELECT (CAST(b.cents AS DOUBLE) - a.cents) / (b.d - a.d) AS slope
  FROM daily a JOIN daily b ON a.d < b.d
),
ranked AS (
  SELECT slope,
         row_number() OVER (ORDER BY slope) AS rk,
         count(*) OVER () AS n
  FROM pairs
)
SELECT CAST(max(n) AS BIGINT) AS n_pairs,
       floor(avg(slope) * 1000000 + 0.5) / 1000000.0 AS slope_cents_per_day
FROM ranked
WHERE rk IN ((n + 1) // 2, (n + 2) // 2)
""",
)
def agg_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL-SEN robust trend estimate of the daily revenue series:
    the MEDIAN of all pairwise slopes (cents/day) — breakdown point
    29%, the outlier-proof alternative to ``agg_trend_ols`` (one bad
    day moves OLS arbitrarily, moves Theil-Sen not at all).

    The pair join runs on the DAY grain — calendar-bounded (30 days
    here, ~3.65k/decade → ≤ ~6.7M pairs at a decade of retention,
    independent of fact-table volume).  Exact integer cents and integer
    day deltas make every slope the same double in both engines; the
    median is the standard lower/upper-middle average over the slope
    order with (slope) ties broken irrelevantly (equal values)."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents")
    )
    a = daily.select(F.col("d").alias("da"), F.col("cents").alias("ca"))
    b = daily.select(F.col("d").alias("db"), F.col("cents").alias("cb"))
    pairs = a.join(b, F.col("da") < F.col("db")).select(
        ((F.col("cb").cast("double") - F.col("ca")) / (F.col("db") - F.col("da"))).alias(
            "slope"
        )
    )
    ranked = distributed_rank(pairs, ["slope"])
    mid = ranked.filter(
        (F.col("_rk") == F.floor((F.col("_n_total") + 1) / 2))
        | (F.col("_rk") == F.floor((F.col("_n_total") + 2) / 2))
    )
    return mid.agg(
        F.max("_n_total").cast("long").alias("n_pairs"),
        r6(F.avg("slope")).alias("slope_cents_per_day"),
    )


@register(
    "agg_kendall_tau",
    oracle="""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', date_trunc('day', ts))
              AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS x,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1
),
p AS (
  SELECT CAST(sum(CASE WHEN (b.x - a.x) * (b.y - a.y) > 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS nc,
         CAST(sum(CASE WHEN (b.x - a.x) * (b.y - a.y) < 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS nd,
         CAST(sum(CASE WHEN a.x = b.x AND a.y <> b.y THEN 1 ELSE 0 END)
              AS BIGINT) AS tx,
         CAST(sum(CASE WHEN a.y = b.y AND a.x <> b.x THEN 1 ELSE 0 END)
              AS BIGINT) AS ty,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM daily a JOIN daily b ON a.d < b.d
)
SELECT n_pairs, nc, nd,
       floor((CAST(nc AS DOUBLE) - nd)
             / sqrt((CAST(n_pairs AS DOUBLE) - tx) * (n_pairs - ty))
             * 1000000 + 0.5) / 1000000.0 AS tau_b
FROM p
""",
)
def agg_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KENDALL'S τ-b between daily event VOLUME and daily revenue —
    the concordance rank correlation (is a busier day a richer day,
    judged pairwise?), with the standard tie corrections in the
    denominator.  Complements ``agg_spearman_corr`` (same question,
    rank-difference form): τ is the one with the direct probabilistic
    reading P(concordant) − P(discordant).

    Pairwise by construction, so it runs on the calendar-bounded DAY
    grain (30 days → 435 pairs; a decade → ~6.7M — independent of fact
    volume).  Concordance tests are pure integer sign checks; the final
    τ is one shared double expression."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("x"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("y"),
    )
    a = daily.select(F.col("d").alias("da"), F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = daily.select(F.col("d").alias("db"), F.col("x").alias("xb"), F.col("y").alias("yb"))
    dx = F.col("xb") - F.col("xa")
    dy = F.col("yb") - F.col("ya")
    p = a.join(b, F.col("da") < F.col("db")).agg(
        F.sum(F.when(dx * dy > 0, 1).otherwise(0)).cast("long").alias("nc"),
        F.sum(F.when(dx * dy < 0, 1).otherwise(0)).cast("long").alias("nd"),
        F.sum(F.when((dx == 0) & (dy != 0), 1).otherwise(0)).cast("long").alias("tx"),
        F.sum(F.when((dy == 0) & (dx != 0), 1).otherwise(0)).cast("long").alias("ty"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    tau = (F.col("nc").cast("double") - F.col("nd")) / F.sqrt(
        (F.col("n_pairs").cast("double") - F.col("tx"))
        * (F.col("n_pairs") - F.col("ty"))
    )
    return p.select("n_pairs", "nc", "nd", r6(tau).alias("tau_b"))


_BOOT_B = 20  # Poisson-bootstrap replicas
# Cumulative Poisson(1) thresholds for the inverse-CDF draw (k = 0..5);
# the SAME literals are formatted into the Spark plan and the oracle, so
# the branch taken is engine-identical for every (row, replica).
_POIS_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
)


def _pois_case_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {c!r} THEN {k}" for k, c in enumerate(_POIS_CDF)
    )
    return f"CASE {branches} ELSE 6 END"


@register(
    "agg_bootstrap_ci",
    oracle=f"""
WITH reps AS (SELECT unnest(generate_series(1, {_BOOT_B})) AS b),
drawn AS (
  SELECT r.b,
         CAST(round(e.value * 100) AS BIGINT) AS cents,
         {_pois_case_sql(
             "(CAST(('0x' || substr(md5(e.event_id || ':' || r.b), 1, 8)) "
             "AS BIGINT) % 1000000 + 0.5) / 1000000.0"
         )} AS k
  FROM events e CROSS JOIN reps r
),
means AS (
  SELECT b,
         CAST(sum(k * cents) AS DOUBLE) / sum(k) AS m
  FROM drawn GROUP BY b HAVING sum(k) > 0
),
ranked AS (
  SELECT m, row_number() OVER (ORDER BY m, b) AS rk, count(*) OVER () AS nb
  FROM means
),
pt AS (
  SELECT CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
           / count(*) AS mean_cents
  FROM events
)
SELECT CAST({_BOOT_B} AS BIGINT) AS n_replicas,
       floor(pt.mean_cents * 10000 + 0.5) / 10000.0 AS mean_cents,
       floor((SELECT m FROM ranked WHERE rk = 2) * 10000 + 0.5) / 10000.0
         AS ci_lo_cents,
       floor((SELECT m FROM ranked WHERE rk = nb - 1) * 10000 + 0.5) / 10000.0
         AS ci_hi_cents
FROM pt
""",
)
def agg_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON-BOOTSTRAP confidence interval for the mean event value —
    THE bootstrap that works at 100 TB (Chamandy et al. 2012, "Estimating
    uncertainty for massive data streams"): instead of drawing n-out-of-n
    resamples (which needs global coordination), each row's multiplicity
    in replica b is an independent Poisson(1) draw — here the
    deterministic md5 inverse-CDF draw on (event_id, b), so the whole
    resampling plan is ONE projection + ONE groupBy, no RNG state, no
    shuffle of the data itself, and it hash-matches across engines.

    Replica means use exact integer (Σk·cents, Σk) sums; the 90% CI is
    the 2nd / (B−1)th order statistic of the B replica means (B = {b}).
    Replica count is a constant — the scan cost is B× one pass, which at
    scale is run as one pass emitting B (b, k) pairs per row (this exact
    plan after Catalyst pushes the crossJoin into the projection)."""
    ev = table(spark, sf_dir, "events")
    reps = spark.range(1, _BOOT_B + 1).select(F.col("id").alias("b"))
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("event_id"), F.col("b"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 1000000
        + 0.5
    ) / 1000000.0
    k = F.when(u < _POIS_CDF[0], 0)
    for i, c in enumerate(_POIS_CDF[1:], start=1):
        k = k.when(u < c, i)
    k = k.otherwise(6)
    drawn = ev.crossJoin(F.broadcast(reps)).select(
        "b",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        k.alias("k"),
    )
    means = (
        drawn.groupBy("b")
        .agg(
            F.sum(F.col("k") * F.col("cents")).cast("long").alias("skc"),
            F.sum("k").cast("long").alias("sk"),
        )
        .filter(F.col("sk") > 0)
        .select("b", (F.col("skc").cast("double") / F.col("sk")).alias("m"))
    )
    w = Window.orderBy("m", "b")  # B-row frame: bounded by construction
    ranked = means.select(
        "m",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("nb"),
    )
    pt = ev.agg(
        (
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_cents")
    )

    lo = ranked.filter(F.col("rk") == 2).select(q4(F.col("m")).alias("ci_lo_cents"))
    hi = ranked.filter(F.col("rk") == F.col("nb") - 1).select(
        q4(F.col("m")).alias("ci_hi_cents")
    )
    return (
        pt.select(
            F.lit(_BOOT_B).cast("long").alias("n_replicas"),
            q4(F.col("mean_cents")).alias("mean_cents"),
        )
        .crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
    )


agg_bootstrap_ci.__doc__ = agg_bootstrap_ci.__doc__.format(b=_BOOT_B)


@register(
    "agg_mcnemar",
    oracle="""
WITH y94 AS (
  SELECT DISTINCT o_custkey AS c FROM orders
  WHERE o_orderdate >= DATE '1994-01-01' AND o_orderdate < DATE '1995-01-01'
),
y95 AS (
  SELECT DISTINCT o_custkey AS c FROM orders
  WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
),
u AS (
  SELECT coalesce(a.c, b.c) AS c,
         a.c IS NOT NULL AS in94, b.c IS NOT NULL AS in95
  FROM y94 a FULL OUTER JOIN y95 b ON a.c = b.c
),
cells AS (
  SELECT CAST(sum(CASE WHEN in94 AND in95 THEN 1 ELSE 0 END) AS BIGINT) AS both_y,
         CAST(sum(CASE WHEN in94 AND NOT in95 THEN 1 ELSE 0 END) AS BIGINT) AS churned,
         CAST(sum(CASE WHEN NOT in94 AND in95 THEN 1 ELSE 0 END) AS BIGINT) AS acquired
  FROM u
)
SELECT both_y, churned, acquired,
       floor((CAST(churned AS DOUBLE) - acquired) * (churned - acquired)
             / (churned + acquired) * 1000000 + 0.5) / 1000000.0
         AS mcnemar_chi2
FROM cells
""",
)
def agg_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNEMAR'S TEST on paired customer activity (ordered in 1994 vs
    1995): the chi² statistic (b−c)²/(b+c) over the DISCORDANT cells
    only — the correct paired test for "did the same population's
    behavior change?" (a plain two-proportion z-test double-counts the
    customers present in both years; ``agg_ab_test`` covers the
    unpaired design).

    Two distinct-key projections, one full outer join on the customer
    key, one map-side-combined cell count — each side is
    |active customers|, never order-rows."""
    o = table(spark, sf_dir, "orders")

    def active(y: int) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("date"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("date"))
            )
            .select(F.col("o_custkey").alias("c"))
            .distinct()
        )

    a = active(1994).withColumn("in94", F.lit(True))
    b = active(1995).withColumn("in95", F.lit(True))
    u = a.join(b, "c", "full").select(
        F.coalesce("in94", F.lit(False)).alias("in94"),
        F.coalesce("in95", F.lit(False)).alias("in95"),
    )
    cells = u.agg(
        F.sum(F.when(F.col("in94") & F.col("in95"), 1).otherwise(0))
        .cast("long")
        .alias("both_y"),
        F.sum(F.when(F.col("in94") & ~F.col("in95"), 1).otherwise(0))
        .cast("long")
        .alias("churned"),
        F.sum(F.when(~F.col("in94") & F.col("in95"), 1).otherwise(0))
        .cast("long")
        .alias("acquired"),
    )
    chi2 = (
        (F.col("churned").cast("double") - F.col("acquired"))
        * (F.col("churned") - F.col("acquired"))
        / (F.col("churned") + F.col("acquired"))
    )
    return cells.select(
        "both_y",
        "churned",
        "acquired",
        (F.floor(chi2 * 1000000 + 0.5) / 1000000.0).alias("mcnemar_chi2"),
    )


_SPRT_P0 = 0.18  # null conversion rate
_SPRT_P1 = 0.22  # alternative conversion rate
_SPRT_ALPHA = 0.05  # == beta; boundaries ±ln((1-a)/a) = ±ln(19)


@register(
    "agg_sprt",
    oracle=f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS d,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS x
  FROM events GROUP BY 1
),
walk AS (
  SELECT d, n, x,
         CAST(sum(n) OVER (ORDER BY d) AS BIGINT) AS cum_n,
         CAST(sum(x) OVER (ORDER BY d) AS BIGINT) AS cum_x
  FROM daily
)
SELECT d, cum_n, cum_x,
       floor((cum_x * ln(CAST({_SPRT_P1} AS DOUBLE) / {_SPRT_P0})
              + (cum_n - cum_x)
                * ln((1.0 - CAST({_SPRT_P1} AS DOUBLE))
                     / (1.0 - CAST({_SPRT_P0} AS DOUBLE))))
             * 1000000 + 0.5) / 1000000.0 AS llr,
       CASE WHEN cum_x * ln(CAST({_SPRT_P1} AS DOUBLE) / {_SPRT_P0})
                 + (cum_n - cum_x)
                   * ln((1.0 - CAST({_SPRT_P1} AS DOUBLE))
                        / (1.0 - CAST({_SPRT_P0} AS DOUBLE)))
                 >= ln((1.0 - CAST({_SPRT_ALPHA} AS DOUBLE)) / {_SPRT_ALPHA})
            THEN 'accept_h1'
            WHEN cum_x * ln(CAST({_SPRT_P1} AS DOUBLE) / {_SPRT_P0})
                 + (cum_n - cum_x)
                   * ln((1.0 - CAST({_SPRT_P1} AS DOUBLE))
                        / (1.0 - CAST({_SPRT_P0} AS DOUBLE)))
                 <= -ln((1.0 - CAST({_SPRT_ALPHA} AS DOUBLE)) / {_SPRT_ALPHA})
            THEN 'accept_h0'
            ELSE 'continue' END AS verdict
FROM walk
ORDER BY d
""",
)
def agg_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENTIAL PROBABILITY RATIO TEST (Wald 1945) on the daily
    purchase-conversion walk: H0 p={p0} vs H1 p={p1}, boundaries
    ±ln((1−α)/α) at α=β={a} — the always-valid sequential A/B monitor
    that may STOP EARLY (the fixed-horizon tests ``agg_ab_test`` /
    ``agg_welch_t`` must wait for their full sample; peeking at them
    inflates false positives, peeking at SPRT is the design).

    Float discipline: the log-likelihood-ratio walk is NOT a running sum
    of doubles — the cumulative llr is reconstructed per day from EXACT
    integer prefix counts (``cum_x·L1 + (cum_n−cum_x)·L0``), so no
    float accumulation exists to diverge (running double windows use
    engine-specific tree aggregation; integer prefixes do not).  The
    walk grain is calendar-bounded."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("x"),
    )
    w = Window.orderBy("d")  # calendar-bounded frame (days in retention)
    walk = daily.select(
        "d",
        F.sum("n").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long").alias("cum_n"),
        F.sum("x").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long").alias("cum_x"),
    )
    l1 = F.log(F.lit(_SPRT_P1) / F.lit(_SPRT_P0))
    l0 = F.log((1.0 - F.lit(_SPRT_P1)) / (1.0 - F.lit(_SPRT_P0)))
    llr = F.col("cum_x") * l1 + (F.col("cum_n") - F.col("cum_x")) * l0
    bound = F.log((1.0 - F.lit(_SPRT_ALPHA)) / F.lit(_SPRT_ALPHA))
    return walk.select(
        "d",
        "cum_n",
        "cum_x",
        (F.floor(llr * 1000000 + 0.5) / 1000000.0).alias("llr"),
        F.when(llr >= bound, "accept_h1")
        .when(llr <= -bound, "accept_h0")
        .otherwise("continue")
        .alias("verdict"),
    ).orderBy("d")


agg_sprt.__doc__ = agg_sprt.__doc__.format(
    p0=_SPRT_P0, p1=_SPRT_P1, a=_SPRT_ALPHA
)


@register(
    "agg_cuped",
    oracle="""
WITH pre AS (
  SELECT o_custkey AS c,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS p
  FROM orders
  WHERE o_orderdate >= DATE '1994-01-01' AND o_orderdate < DATE '1995-01-01'
  GROUP BY 1
),
post AS (
  SELECT o_custkey AS c,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM orders
  WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
  GROUP BY 1
),
units AS (
  SELECT pre.c, CAST(pre.c % 2 AS BIGINT) AS arm, pre.p,
         coalesce(post.y, 0) AS y
  FROM pre LEFT JOIN post USING (c)
),
g AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(p) AS BIGINT) AS sp, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(p * p) AS BIGINT) AS spp,
         CAST(sum(p * y) AS BIGINT) AS spy
  FROM units
),
theta AS (
  SELECT (CAST(spy AS DOUBLE) - CAST(sp AS DOUBLE) * sy / n)
         / (CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * sp / n) AS th,
         CAST(sp AS DOUBLE) / n AS mu_p
  FROM g
),
arms AS (
  SELECT arm,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(p) AS BIGINT) AS sp, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(p * p) AS BIGINT) AS spp,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(p * y) AS BIGINT) AS spy
  FROM units GROUP BY 1
)
SELECT a.arm, a.n,
       floor(CAST(a.sy AS DOUBLE) / a.n * 10000 + 0.5) / 10000.0
         AS mean_post_cents,
       floor((CAST(a.sy AS DOUBLE) / a.n
              - t.th * (CAST(a.sp AS DOUBLE) / a.n - t.mu_p))
             * 10000 + 0.5) / 10000.0 AS mean_cuped_cents,
       floor(((CAST(a.syy AS DOUBLE) - CAST(a.sy AS DOUBLE) * a.sy / a.n)
              / (a.n - 1)) * 10000 + 0.5) / 10000.0 AS var_post,
       floor((((CAST(a.syy AS DOUBLE) - CAST(a.sy AS DOUBLE) * a.sy / a.n)
               + t.th * t.th
                 * (CAST(a.spp AS DOUBLE) - CAST(a.sp AS DOUBLE) * a.sp / a.n)
               - 2.0 * t.th
                 * (CAST(a.spy AS DOUBLE) - CAST(a.sp AS DOUBLE) * a.sy / a.n))
              / (a.n - 1)) * 10000 + 0.5) / 10000.0 AS var_cuped
FROM arms a CROSS JOIN theta t
ORDER BY a.arm
""",
)
def agg_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013 — the industry-standard
    A/B sensitivity boost): adjust each unit's experiment-period metric
    by its PRE-period covariate, ``ŷ = y − θ(p − μ_p)`` with
    ``θ = cov(p,y)/var(p)`` pooled across arms, and report per-arm
    post vs CUPED-adjusted means and variances — the var_cuped/var_post
    ratio IS the sample-size saving.

    Units are customers active in the 1994 pre-period (arm =
    c_custkey % 2, post = 1995 spend, 0 when absent).  Every moment
    (Σp, Σy, Σp², Σy², Σpy) is an exact integer-cents sum; θ and the
    adjusted means/variances are closed-form shared double expressions.
    Two filtered aggregates + one join on the customer grain, one
    5-number global aggregate, |arms| output rows."""
    o = table(spark, sf_dir, "orders")

    def spend(y: int):
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("date"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("date"))
            )
            .groupBy(F.col("o_custkey").alias("c"))
            .agg(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                .cast("long")
                .alias("v")
            )
        )

    units = (
        spend(1994)
        .withColumnRenamed("v", "p")
        .join(spend(1995).withColumnRenamed("v", "y"), "c", "left")
        .select(
            (F.col("c") % 2).cast("long").alias("arm"),
            "p",
            F.coalesce("y", F.lit(0)).cast("long").alias("y"),
        )
    )
    g = units.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("p").cast("long").alias("sp"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("p") * F.col("p")).cast("long").alias("spp"),
        F.sum(F.col("p") * F.col("y")).cast("long").alias("spy"),
    ).select(
        (
            (F.col("spy").cast("double") - F.col("sp").cast("double") * F.col("sy") / F.col("n"))
            / (F.col("spp").cast("double") - F.col("sp").cast("double") * F.col("sp") / F.col("n"))
        ).alias("th"),
        (F.col("sp").cast("double") / F.col("n")).alias("mu_p"),
    )
    arms = units.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("p").cast("long").alias("sp"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("p") * F.col("p")).cast("long").alias("spp"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("p") * F.col("y")).cast("long").alias("spy"),
    )

    css_y = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / F.col("n")
    css_p = F.col("spp").cast("double") - F.col("sp").cast("double") * F.col("sp") / F.col("n")
    ccs_py = F.col("spy").cast("double") - F.col("sp").cast("double") * F.col("sy") / F.col("n")
    return (
        arms.crossJoin(F.broadcast(g))
        .select(
            "arm",
            "n",
            q4(F.col("sy").cast("double") / F.col("n")).alias("mean_post_cents"),
            q4(
                F.col("sy").cast("double") / F.col("n")
                - F.col("th")
                * (F.col("sp").cast("double") / F.col("n") - F.col("mu_p"))
            ).alias("mean_cuped_cents"),
            q4(css_y / (F.col("n") - 1)).alias("var_post"),
            q4(
                (
                    css_y
                    + F.col("th") * F.col("th") * css_p
                    - 2.0 * F.col("th") * ccs_py
                )
                / (F.col("n") - 1)
            ).alias("var_cuped"),
        )
        .orderBy("arm")
    )


@register(
    "agg_nelson_aalen",
    oracle=f"""
WITH horizon AS (
  SELECT max(ts) - INTERVAL {_KM_CENSOR_DAYS} DAY AS cutoff FROM events
), u AS (
  SELECT user_id,
         CAST(date_diff('day', min(ts), max(ts)) AS BIGINT) AS duration,
         max(ts) < (SELECT cutoff FROM horizon) AS churned
  FROM events GROUP BY 1
), g AS (
  SELECT duration,
         CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS n_dur
  FROM u GROUP BY 1
), r AS (
  SELECT duration, d,
         CAST((SELECT count(*) FROM u) AS BIGINT)
           - CAST(coalesce(sum(n_dur) OVER (ORDER BY duration
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n_risk
  FROM g
), h AS (
  SELECT duration, d, n_risk,
         list_reduce(
           list_prepend(CAST(0 AS DOUBLE),
             list(CAST(d AS DOUBLE) / n_risk)
               OVER (ORDER BY duration
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
           (acc, x) -> acc + x) AS haz
  FROM r
)
SELECT duration, n_risk, d AS n_churned,
       floor(haz * 1000000 + 0.5) / 1000000.0 AS cum_hazard
FROM h
WHERE d > 0
""",
)
def agg_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NELSON-AALEN cumulative hazard of user lifetime — the additive
    sibling of ``agg_kaplan_meier``'s multiplicative survival curve:
    ``H(t) = Σ_(t_i <= t) d_i/n_i``, the estimator whose slope READS as
    the instantaneous churn rate (flat = stable cohort, steepening =
    accelerating churn; KM answers "how many survive", NA answers "how
    hard does the hazard bite and when").  Same right-censoring rule.

    Same decomposition too: exact integer event/at-risk counts from one
    ``distributed_rank`` pass over the bounded distinct-duration grain,
    then the hazard SUM folds sequentially over the duration-sorted
    terms (the additive twin of KM's product fold) so both engines
    accumulate identical doubles in identical order."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    horizon = ev.agg(
        (F.max("ts") - F.expr(f"INTERVAL {_KM_CENSOR_DAYS} DAYS")).alias("cutoff")
    )
    u = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
        .crossJoin(F.broadcast(horizon))
        .select(
            F.datediff("last_ts", "first_ts").cast("long").alias("duration"),
            (F.col("last_ts") < F.col("cutoff")).alias("churned"),
        )
    )
    g = u.groupBy("duration").agg(
        F.sum(F.when(F.col("churned"), 1).otherwise(0)).cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("n_dur"),
    )
    r = distributed_rank(g, ["duration"], sum_cols=("n_dur",)).select(
        "duration",
        "d",
        (F.col("_tot_n_dur") - (F.col("_cum_n_dur") - F.col("n_dur")))
        .cast("long")
        .alias("n_risk"),
    )
    # Bounded fold over the distinct-duration frame (the KM recipe).
    w = Window.orderBy("duration").rowsBetween(Window.unboundedPreceding, 0)
    h = r.select(
        "duration",
        "d",
        "n_risk",
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("duration"),
                            (F.col("d").cast("double") / F.col("n_risk")).alias("f"),
                        )
                    ).over(w)
                ),
                lambda s: s.getField("f"),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("haz"),
    )
    return (
        h.filter(F.col("d") > 0)
        .select(
            "duration",
            "n_risk",
            F.col("d").alias("n_churned"),
            (F.floor(F.col("haz") * 1000000 + 0.5) / 1000000.0).alias("cum_hazard"),
        )
        .orderBy("duration")
    )


# ---------------------------------------------------------------------------
# Parametric / classical inference battery (round 13).  Same exactness
# contract as the rank battery above: every sufficient statistic is an
# exact int64 sum (quantities / cents), every order-sensitive double
# reduction folds sequentially over an explicitly sorted BOUNDED frame
# (|groups| or calendar days), and the final statistic is one closed-form
# double expression evaluated in the same operation order both engines.
# ---------------------------------------------------------------------------


@register(
    "agg_anova_f",
    oracle="""
WITH g AS (
  SELECT l_returnflag AS flag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS s,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)
                  * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS ssq
  FROM lineitem GROUP BY 1
), f AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n) AS BIGINT) AS n_total,
         CAST(sum(s) AS BIGINT) AS s_total,
         CAST(sum(ssq) AS BIGINT) AS ssq_total,
         list_reduce(
           list_prepend(CAST(0 AS DOUBLE),
                        list(CAST(s AS DOUBLE) * s / n ORDER BY flag)),
           (a, x) -> a + x) AS sg
  FROM g
)
SELECT k, n_total,
       floor(((sg - CAST(s_total AS DOUBLE) * s_total / n_total) / (k - 1))
             / ((ssq_total - sg) / (n_total - k)) * 1000000 + 0.5)
         / 1000000.0 AS f_stat,
       floor((sg - CAST(s_total AS DOUBLE) * s_total / n_total)
             / (ssq_total - CAST(s_total AS DOUBLE) * s_total / n_total)
             * 1000000 + 0.5) / 1000000.0 AS eta_sq
FROM f
""",
)
def agg_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-WAY ANOVA F of order quantity across return-flag groups —
    the parametric "do the group means differ" test next to
    ``agg_kruskal_wallis``'s rank version (KW survives outliers; the F
    test is the textbook readout when values are well-behaved, and the
    pair disagreeing is itself a skew diagnostic).  Also reports eta²
    (SSB/SST), the effect-size share of variance explained by group.

    Exactness: quantities are integral, so per-group n/Σy/Σy² are exact
    int64; the one order-sensitive reduction, Σ_g s_g²/n_g over k
    groups, folds sequentially over the flag-sorted k-row array (Spark
    ``aggregate`` HOF == DuckDB ``list_reduce`` with a prepended 0.0
    init — the agg_nelson_aalen recipe); F and eta² are single double
    expressions in the same op order both engines.

    Scale shape: one map-side-combined groupBy to |groups| rows, then a
    1-row fold over that bounded frame.  Nothing is corpus-sized past
    the first exchange."""
    li = table(spark, sf_dir, "lineitem")
    y = F.round("l_quantity").cast("long")
    g = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(y).cast("long").alias("s"),
        F.sum(y * y).cast("long").alias("ssq"),
    )
    f = g.select(
        "flag",
        "n",
        "s",
        "ssq",
        (F.col("s").cast("double") * F.col("s") / F.col("n")).alias("term"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("n_total"),
        F.sum("s").cast("long").alias("s_total"),
        F.sum("ssq").cast("long").alias("ssq_total"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("flag"), F.col("term")))),
                lambda st: st.getField("term"),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("sg"),
    )
    ssb = F.col("sg") - F.col("s_total").cast("double") * F.col("s_total") / F.col("n_total")
    ssw = F.col("ssq_total") - F.col("sg")
    sst = F.col("ssq_total") - F.col("s_total").cast("double") * F.col("s_total") / F.col("n_total")
    return f.select(
        "k",
        "n_total",
        r6((ssb / (F.col("k") - 1)) / (ssw / (F.col("n_total") - F.col("k")))).alias("f_stat"),
        r6(ssb / sst).alias("eta_sq"),
    )


@register(
    "agg_levene_bf",
    oracle="""
WITH med AS (
  SELECT l_returnflag AS flag,
         CAST(round(2 * median(CAST(round(l_quantity) AS BIGINT))) AS BIGINT)
           AS med2
  FROM lineitem GROUP BY 1
), z AS (
  SELECT l.l_returnflag AS flag,
         abs(2 * CAST(round(l.l_quantity) AS BIGINT) - m.med2) AS z
  FROM lineitem l JOIN med m ON l.l_returnflag = m.flag
), g AS (
  SELECT flag, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(z) AS BIGINT) AS s,
         CAST(sum(z * z) AS BIGINT) AS ssq
  FROM z GROUP BY 1
), f AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n) AS BIGINT) AS n_total,
         CAST(sum(s) AS BIGINT) AS s_total,
         CAST(sum(ssq) AS BIGINT) AS ssq_total,
         list_reduce(
           list_prepend(CAST(0 AS DOUBLE),
                        list(CAST(s AS DOUBLE) * s / n ORDER BY flag)),
           (a, x) -> a + x) AS sg
  FROM g
)
SELECT k, n_total,
       floor(((sg - CAST(s_total AS DOUBLE) * s_total / n_total) / (k - 1))
             / ((ssq_total - sg) / (n_total - k)) * 1000000 + 0.5)
         / 1000000.0 AS f_bf
FROM f
""",
)
def agg_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BROWN-FORSYTHE (median-based Levene) test of variance
    homogeneity across return-flag groups — the gate in front of
    ``agg_anova_f``/``agg_welch_t``: ANOVA assumes equal group
    variances, and BF is the robust way to check (mean-based Levene
    inherits the outlier fragility it is supposed to detect).  The
    statistic is a one-way F on z = |y − median_g|.

    Exactness: group medians of integral quantities are halves, so
    z doubles to the exact integer |2y − 2·med| (both engines
    interpolate even-count medians identically — Spark ``percentile``
    == DuckDB ``median``); from there the machinery and discipline are
    agg_anova_f's verbatim (int64 moments, k-row sequential fold).

    Scale shape: two passes over lineitem (medians, then moments), each
    one map-side-combined groupBy; the |groups|-row median frame joins
    back via broadcast."""
    li = table(spark, sf_dir, "lineitem")
    y = F.round("l_quantity").cast("long")
    med = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.round(2 * F.expr("percentile(CAST(round(l_quantity) AS BIGINT), 0.5D)"))
        .cast("long")
        .alias("med2")
    )
    z = li.join(
        F.broadcast(med), li["l_returnflag"] == med["flag"]
    ).select("flag", F.abs(2 * y - F.col("med2")).alias("z"))
    g = z.groupBy("flag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("z").cast("long").alias("s"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("ssq"),
    )
    f = g.select(
        "flag",
        "n",
        "s",
        "ssq",
        (F.col("s").cast("double") * F.col("s") / F.col("n")).alias("term"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("n_total"),
        F.sum("s").cast("long").alias("s_total"),
        F.sum("ssq").cast("long").alias("ssq_total"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("flag"), F.col("term")))),
                lambda st: st.getField("term"),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("sg"),
    )
    ssb = F.col("sg") - F.col("s_total").cast("double") * F.col("s_total") / F.col("n_total")
    ssw = F.col("ssq_total") - F.col("sg")
    return f.select(
        "k",
        "n_total",
        r6((ssb / (F.col("k") - 1)) / (ssw / (F.col("n_total") - F.col("k")))).alias("f_bf"),
    )


@register(
    "agg_jarque_bera",
    oracle="""
WITH m AS (
  SELECT l_returnflag AS flag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS s1,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)
                  * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS s2,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)
                  * CAST(round(l_quantity) AS BIGINT)
                  * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS s3,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)
                  * CAST(round(l_quantity) AS BIGINT)
                  * CAST(round(l_quantity) AS BIGINT)
                  * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS s4
  FROM lineitem GROUP BY 1
), c AS (
  SELECT flag, n,
         CAST(s1 AS DOUBLE) / n AS mu,
         CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m2,
         CAST(s3 AS DOUBLE) / n
           - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
           + 2 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m3,
         CAST(s4 AS DOUBLE) / n
           - 4 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
           + 6 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
           - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
               * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m4
  FROM m
)
SELECT flag, n,
       floor(m3 / pow(m2, 1.5) * 1000000 + 0.5) / 1000000.0 AS skewness,
       floor(m4 / (m2 * m2) * 1000000 + 0.5) / 1000000.0 AS kurtosis,
       floor(n / 6.0 * ((m3 / pow(m2, 1.5)) * (m3 / pow(m2, 1.5))
                        + (m4 / (m2 * m2) - 3) * (m4 / (m2 * m2) - 3) / 4)
             * 1000000 + 0.5) / 1000000.0 AS jb_stat
FROM c ORDER BY flag
""",
)
def agg_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JARQUE-BERA normality statistic per return-flag group — the
    moment-based "is this distribution even close to normal" check
    that decides whether ``agg_anova_f``/``agg_welch_t`` are the right
    tools or the rank battery (``agg_kruskal_wallis``/
    ``agg_mann_whitney``) should run instead: JB = n/6·(S² + (K−3)²/4)
    from sample skewness S and kurtosis K.

    Exactness: integral quantities make all four raw power sums exact
    int64 (50⁴·|rows| ≈ 4e13 at sf1 — decimal sums are the documented
    swap past ~1e18); central moments expand from raw moments in the
    SAME double expression both engines (no subtract-mean second pass,
    so no order-sensitive reduction exists at all).

    Scale shape: ONE map-side-combined groupBy; |groups| output rows;
    per-group algebra is projection-only."""
    li = table(spark, sf_dir, "lineitem")
    y = F.round("l_quantity").cast("long")
    m = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(y).cast("long").alias("s1"),
        F.sum(y * y).cast("long").alias("s2"),
        F.sum(y * y * y).cast("long").alias("s3"),
        F.sum(y * y * y * y).cast("long").alias("s4"),
    )
    mu = F.col("s1").cast("double") / F.col("n")
    r2m = F.col("s2").cast("double") / F.col("n")
    r3m = F.col("s3").cast("double") / F.col("n")
    r4m = F.col("s4").cast("double") / F.col("n")
    m2 = r2m - mu * mu
    m3 = r3m - 3 * mu * r2m + 2 * mu * mu * mu
    m4 = r4m - 4 * mu * r3m + 6 * mu * mu * r2m - 3 * mu * mu * mu * mu
    skew = m3 / F.pow(m2, F.lit(1.5))
    kurt = m4 / (m2 * m2)
    return m.select(
        "flag",
        "n",
        r6(skew).alias("skewness"),
        r6(kurt).alias("kurtosis"),
        r6(F.col("n") / F.lit(6.0) * (skew * skew + (kurt - 3) * (kurt - 3) / 4)).alias(
            "jb_stat"
        ),
    ).orderBy("flag")


@register(
    "agg_odds_ratio",
    oracle="""
WITH t AS (
  SELECT CAST(sum(CASE WHEN o_orderpriority LIKE '1%' AND o_orderstatus = 'F'
                       THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN o_orderpriority LIKE '1%' AND o_orderstatus <> 'F'
                       THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(sum(CASE WHEN o_orderpriority NOT LIKE '1%' AND o_orderstatus = 'F'
                       THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(sum(CASE WHEN o_orderpriority NOT LIKE '1%' AND o_orderstatus <> 'F'
                       THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM orders
)
SELECT a, b, c, d,
       floor(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c) * 1000000 + 0.5)
         / 1000000.0 AS odds_ratio,
       floor(exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                 - 1.96 * sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d))
             * 1000000 + 0.5) / 1000000.0 AS ci_lo,
       floor(exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                 + 1.96 * sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d))
             * 1000000 + 0.5) / 1000000.0 AS ci_hi
FROM t
""",
)
def agg_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2×2 ODDS RATIO with Woolf's logit confidence interval: exposure
    = urgent order priority, outcome = fully-shipped status — the
    epidemiology/experimentation workhorse for "does exposure move the
    odds", with the CI that ``agg_ab_test``'s difference-of-rates view
    does not give (OR is the effect measure that stays estimable under
    case-control sampling).  CI = exp(ln OR ± 1.96·√(1/a+1/b+1/c+1/d)).

    Exactness: the 2×2 cells are one conditional-sum pass (exact
    int64); OR and both bounds are single closed-form double
    expressions (ln/exp/sqrt of exact-int ratios) in the same op order
    both engines.  Scale shape: one scan, one 1-row aggregate — no
    shuffle beyond the partial-agg combine."""
    o = table(spark, sf_dir, "orders")
    exp_ = F.col("o_orderpriority").startswith("1")
    out_ = F.col("o_orderstatus") == "F"
    t = o.agg(
        F.sum(F.when(exp_ & out_, 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(exp_ & ~out_, 1).otherwise(0)).cast("long").alias("b"),
        F.sum(F.when(~exp_ & out_, 1).otherwise(0)).cast("long").alias("c"),
        F.sum(F.when(~exp_ & ~out_, 1).otherwise(0)).cast("long").alias("d"),
    )
    orr = F.col("a").cast("double") * F.col("d") / (F.col("b").cast("double") * F.col("c"))
    se = F.sqrt(
        1.0 / F.col("a") + 1.0 / F.col("b") + 1.0 / F.col("c") + 1.0 / F.col("d")
    )
    return t.select(
        "a",
        "b",
        "c",
        "d",
        r6(orr).alias("odds_ratio"),
        r6(F.exp(F.log(orr) - 1.96 * se)).alias("ci_lo"),
        r6(F.exp(F.log(orr) + 1.96 * se)).alias("ci_hi"),
    )


@register(
    "agg_durbin_watson",
    oracle="""
WITH d AS (
  SELECT CAST(date_diff('day',
              (SELECT min(date_trunc('day', l_shipdate)) FROM lineitem),
              date_trunc('day', l_shipdate)) AS BIGINT) AS x,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM lineitem GROUP BY 1
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
  FROM d
), p AS (
  SELECT n,
         (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
           / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) AS b,
         sx, sy
  FROM m
), p2 AS (
  SELECT n, b, (CAST(sy AS DOUBLE) - b * sx) / n AS a FROM p
), f AS (
  SELECT p2.n AS n_days, p2.b AS b,
         list_reduce(
           list_prepend({e: CAST(NULL AS DOUBLE), sn: CAST(0 AS DOUBLE),
                         sd: CAST(0 AS DOUBLE)},
             list({e: CAST(y AS DOUBLE) - a - b * x,
                   sn: CAST(0 AS DOUBLE), sd: CAST(0 AS DOUBLE)} ORDER BY x)),
           (acc, v) -> {e: v.e,
                        sn: acc.sn + coalesce((v.e - acc.e) * (v.e - acc.e),
                                              CAST(0 AS DOUBLE)),
                        sd: acc.sd + v.e * v.e}) AS st
  FROM d CROSS JOIN p2
  GROUP BY p2.n, p2.b, a
)
SELECT n_days,
       floor(b * 10000 + 0.5) / 10000.0 AS slope_cents_per_day,
       floor(st.sn / st.sd * 1000000 + 0.5) / 1000000.0 AS dw_stat
FROM f
""",
)
def agg_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DURBIN-WATSON autocorrelation test on the residuals of the daily
    -revenue-vs-time OLS line: DW = Σ(e_t − e_{t−1})² / Σe_t² — the
    "is the trend line hiding serial structure" diagnostic that decides
    whether ``agg_trend_ols``'s R² can be believed (DW ≈ 2 means
    independent residuals; → 0 positive autocorrelation, → 4 negative).

    Exactness: the day-grain series has exact int64 x (days since
    corpus start) and y (revenue cents), the OLS moments are exact
    int64 sums, and the one order-sensitive reduction — the residual
    difference/square sums — folds sequentially over the day-sorted
    array with a struct accumulator (prev, Σdiff², Σe²); both engines
    run the identical fold (Spark ``aggregate`` HOF == DuckDB
    ``list_reduce`` with a prepended NULL-prev init, first diff
    coalesced to 0).

    Scale shape: map-side-combined groupBy to the calendar-bounded day
    grain (~2.5k days over the TPC-H span, ~10⁵ at a decade of hourly
    retention — the win_rolling_corr spine bound), 1-row moment
    aggregate broadcast back, then one fold over the bounded day
    array.  Per-series partitioning is the multi-series swap."""
    li = table(spark, sf_dir, "lineitem")
    t0 = li.agg(F.min(F.date_trunc("day", "l_shipdate")).alias("t0"))
    d = (
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
    m = d.agg(
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
    p = m.select("n", b.alias("b"), "sx", "sy").select(
        "n", "b", ((F.col("sy").cast("double") - F.col("b") * F.col("sx")) / F.col("n")).alias("a")
    )
    e = d.crossJoin(F.broadcast(p)).select(
        "n",
        "b",
        "x",
        (F.col("y").cast("double") - F.col("a") - F.col("b") * F.col("x")).alias("e"),
    )
    init = F.struct(
        F.lit(None).cast("double").alias("prev"),
        F.lit(0.0).alias("sn"),
        F.lit(0.0).alias("sd"),
    )
    st = F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("x"), F.col("e")))),
            lambda s: s.getField("e"),
        ),
        init,
        lambda acc, v: F.struct(
            v.alias("prev"),
            (
                acc.getField("sn")
                + F.coalesce(
                    (v - acc.getField("prev")) * (v - acc.getField("prev")), F.lit(0.0)
                )
            ).alias("sn"),
            (acc.getField("sd") + v * v).alias("sd"),
        ),
    )
    f = e.groupBy("n", "b").agg(st.alias("st"))
    return f.select(
        F.col("n").alias("n_days"),
        (F.floor(F.col("b") * 10000 + 0.5) / 10000.0).alias("slope_cents_per_day"),
        r6(F.col("st").getField("sn") / F.col("st").getField("sd")).alias("dw_stat"),
    )


@register(
    "agg_cohens_kappa",
    oracle="""
WITH cells AS (
  SELECT CAST(round(l_quantity) AS BIGINT) % 3 AS ra,
         l_partkey % 3 AS rb,
         CAST(count(*) AS BIGINT) AS c
  FROM lineitem GROUP BY 1, 2
), marg AS (
  SELECT r.cat, r.r_i, c.c_i FROM
    (SELECT ra AS cat, CAST(sum(c) AS BIGINT) AS r_i FROM cells GROUP BY 1) r
    JOIN
    (SELECT rb AS cat, CAST(sum(c) AS BIGINT) AS c_i FROM cells GROUP BY 1) c
    USING (cat)
), t AS (
  SELECT (SELECT CAST(sum(c) AS BIGINT) FROM cells) AS n,
         (SELECT CAST(sum(c) AS BIGINT) FROM cells WHERE ra = rb) AS diag,
         (SELECT CAST(sum(r_i * c_i) AS BIGINT) FROM marg) AS rc
)
SELECT n,
       floor(CAST(diag AS DOUBLE) / n * 1000000 + 0.5) / 1000000.0 AS po,
       floor(CAST(rc AS DOUBLE) / n / n * 1000000 + 0.5) / 1000000.0 AS pe,
       floor((CAST(diag AS DOUBLE) / n - CAST(rc AS DOUBLE) / n / n)
             / (1 - CAST(rc AS DOUBLE) / n / n) * 1000000 + 0.5)
         / 1000000.0 AS kappa
FROM t
""",
)
def agg_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHEN'S KAPPA chance-corrected agreement between two categorical
    labelings of the same rows (here the two deterministic 3-way
    hash-labelings quantity%3 and partkey%3 — by construction nearly
    independent, so kappa ≈ 0 is the expected readout and any drift is
    a data-quality signal).  The standard metric for "do two annotators
    / two classifier versions / human-vs-LLM labels agree beyond
    chance" in labeling pipelines (``ext_classifier_confusion`` gives
    the raw matrix; kappa is its chance-corrected summary).

    Exactness: the |A|×|B| contingency cells, both marginals, the
    diagonal, and Σ r_i·c_i are all exact int64; po/pe/kappa are single
    double expressions in the same op order both engines.

    Scale shape: one map-side-combined groupBy to the bounded category
    -pair grain, then category-sized joins — nothing row-proportional
    leaves the first exchange."""
    li = table(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        (F.round("l_quantity").cast("long") % 3).alias("ra"),
        (F.col("l_partkey") % 3).alias("rb"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    r = cells.groupBy(F.col("ra").alias("cat")).agg(F.sum("c").cast("long").alias("r_i"))
    c = cells.groupBy(F.col("rb").alias("cat")).agg(F.sum("c").cast("long").alias("c_i"))
    rc = (
        r.join(c, "cat")
        .agg(F.sum(F.col("r_i") * F.col("c_i")).cast("long").alias("rc"))
    )
    tot = cells.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.when(F.col("ra") == F.col("rb"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("diag"),
    )
    t = tot.crossJoin(F.broadcast(rc))
    po = F.col("diag").cast("double") / F.col("n")
    pe = F.col("rc").cast("double") / F.col("n") / F.col("n")
    return t.select(
        "n",
        r6(po).alias("po"),
        r6(pe).alias("pe"),
        r6((po - pe) / (1 - pe)).alias("kappa"),
    )


@register(
    "agg_fleiss_kappa",
    oracle="""
WITH sized AS (
  SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING count(*) = 4
), cells AS (
  SELECT l.l_orderkey, l.l_returnflag AS cat,
         CAST(count(*) AS BIGINT) AS nij
  FROM lineitem l JOIN sized s ON l.l_orderkey = s.l_orderkey
  GROUP BY 1, 2
), t AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM sized) AS n_items,
         (SELECT CAST(sum(nij * nij) AS BIGINT) FROM cells) AS t1,
         (SELECT CAST(sum(sj * sj) AS BIGINT) FROM
            (SELECT CAST(sum(nij) AS BIGINT) AS sj FROM cells GROUP BY cat)) AS s2
)
SELECT n_items,
       floor((CAST(t1 AS DOUBLE) - n_items * 4) / (n_items * 4 * 3)
             * 1000000 + 0.5) / 1000000.0 AS p_bar,
       floor(CAST(s2 AS DOUBLE) / (CAST(n_items AS DOUBLE) * 4 * n_items * 4)
             * 1000000 + 0.5) / 1000000.0 AS pe_bar,
       floor(((CAST(t1 AS DOUBLE) - n_items * 4) / (n_items * 4 * 3)
              - CAST(s2 AS DOUBLE) / (CAST(n_items AS DOUBLE) * 4 * n_items * 4))
             / (1 - CAST(s2 AS DOUBLE) / (CAST(n_items AS DOUBLE) * 4 * n_items * 4))
             * 1000000 + 0.5) / 1000000.0 AS kappa
FROM t
""",
)
def agg_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLEISS' KAPPA multi-rater agreement: items = orders with exactly
    r = 4 lineitems, raters = those 4 lineitems, category = return
    flag — "do the r raters of each item agree beyond chance", the
    generalization of ``agg_cohens_kappa`` from 2 raters to r (the
    standard QA statistic for multi-annotator labeling batches and
    self-consistency sampling of LLM judges).

    Exactness: P̄ = (Σ_ij n_ij² − N·r)/(N·r(r−1)) and P̄e = Σ_j S_j²/
    (N·r)² are both pure functions of exact int64 sums (no per-item
    double averaging pass — the rational algebra collapses to two
    integer totals), so kappa is one closed-form double expression.

    Scale shape: item filter and cells are map-side-combined groupBys
    on the orderkey grain; category totals are |cats| rows; three
    1-row scalar aggregates combine at the end."""
    li = table(spark, sf_dir, "lineitem")
    sized = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("cnt")).filter(
        F.col("cnt") == 4
    )
    cells = (
        li.join(sized.select("l_orderkey"), "l_orderkey")
        .groupBy("l_orderkey", F.col("l_returnflag").alias("cat"))
        .agg(F.count(F.lit(1)).cast("long").alias("nij"))
    )
    n_items = sized.agg(F.count(F.lit(1)).cast("long").alias("n_items"))
    t1 = cells.agg(F.sum(F.col("nij") * F.col("nij")).cast("long").alias("t1"))
    s2 = (
        cells.groupBy("cat")
        .agg(F.sum("nij").cast("long").alias("sj"))
        .agg(F.sum(F.col("sj") * F.col("sj")).cast("long").alias("s2"))
    )
    t = n_items.crossJoin(F.broadcast(t1)).crossJoin(F.broadcast(s2))
    pbar = (F.col("t1").cast("double") - F.col("n_items") * 4) / (F.col("n_items") * 4 * 3)
    pe = F.col("s2").cast("double") / (
        F.col("n_items").cast("double") * 4 * F.col("n_items") * 4
    )
    return t.select(
        "n_items",
        r6(pbar).alias("p_bar"),
        r6(pe).alias("pe_bar"),
        r6((pbar - pe) / (1 - pe)).alias("kappa"),
    )


@register(
    "agg_cronbach_alpha",
    oracle="""
WITH base AS (
  SELECT CAST(round(l_quantity) AS BIGINT) AS y1,
         CAST(round(l_discount * 100) AS BIGINT) AS y2,
         CAST(round(l_tax * 100) AS BIGINT) AS y3
  FROM lineitem
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y1) AS BIGINT) AS a1, CAST(sum(y1 * y1) AS BIGINT) AS q1,
         CAST(sum(y2) AS BIGINT) AS a2, CAST(sum(y2 * y2) AS BIGINT) AS q2,
         CAST(sum(y3) AS BIGINT) AS a3, CAST(sum(y3 * y3) AS BIGINT) AS q3,
         CAST(sum(y1 + y2 + y3) AS BIGINT) AS at,
         CAST(sum((y1 + y2 + y3) * (y1 + y2 + y3)) AS BIGINT) AS qt
  FROM base
)
SELECT n,
       floor((3.0 / 2.0) * (1 -
         ((q1 - CAST(a1 AS DOUBLE) * a1 / n)
          + (q2 - CAST(a2 AS DOUBLE) * a2 / n)
          + (q3 - CAST(a3 AS DOUBLE) * a3 / n))
         / (qt - CAST(at AS DOUBLE) * at / n))
         * 1000000 + 0.5) / 1000000.0 AS alpha
FROM m
""",
)
def agg_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRONBACH'S ALPHA internal-consistency reliability over the k = 3
    item columns (quantity, discount-cents, tax-cents): α = k/(k−1) ·
    (1 − Σvar_item / var_total) — the survey/score-battery reliability
    coefficient (here the items are deliberately unrelated operational
    columns, so α near 0/negative is the expected readout; feature
    batteries that should co-move use the same call).

    Exactness: every variance term reduces to (Σy² − (Σy)²/n) from
    exact int64 sums — n−1 denominators cancel between numerator and
    denominator, so they are omitted on BOTH sides identically — and
    the k = 3 item-variance sum is written as one fixed-order three-
    term expression (no fold needed for a compile-time-bounded k).

    Scale shape: ONE scan, ONE 1-row aggregate (9 integer sums); alpha
    is projection algebra."""
    li = table(spark, sf_dir, "lineitem")
    y1 = F.round("l_quantity").cast("long")
    y2 = F.round(F.col("l_discount") * 100).cast("long")
    y3 = F.round(F.col("l_tax") * 100).cast("long")
    t = y1 + y2 + y3
    m = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(y1).cast("long").alias("a1"),
        F.sum(y1 * y1).cast("long").alias("q1"),
        F.sum(y2).cast("long").alias("a2"),
        F.sum(y2 * y2).cast("long").alias("q2"),
        F.sum(y3).cast("long").alias("a3"),
        F.sum(y3 * y3).cast("long").alias("q3"),
        F.sum(t).cast("long").alias("at"),
        F.sum(t * t).cast("long").alias("qt"),
    )

    def sv(a, q):
        return F.col(q) - F.col(a).cast("double") * F.col(a) / F.col("n")

    alpha = (F.lit(3.0) / F.lit(2.0)) * (
        1 - (sv("a1", "q1") + sv("a2", "q2") + sv("a3", "q3")) / sv("at", "qt")
    )
    return m.select("n", r6(alpha).alias("alpha"))


@register(
    "agg_friedman",
    oracle="""
WITH cell AS (
  SELECT o_custkey % 20 AS blk, o_orderpriority AS trt,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
  FROM orders GROUP BY 1, 2
), full_blk AS (
  SELECT blk FROM cell GROUP BY 1 HAVING count(*) = 5
), ranked AS (
  SELECT c.trt,
         2 * rank() OVER (PARTITION BY c.blk ORDER BY c.v)
           + CAST(count(*) OVER (PARTITION BY c.blk, c.v) AS BIGINT) - 1 AS ar2
  FROM cell c JOIN full_blk b ON c.blk = b.blk
), rj AS (
  SELECT trt, CAST(sum(ar2) AS BIGINT) AS sar2 FROM ranked GROUP BY 1
), t AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM full_blk) AS n_blocks,
         (SELECT CAST(sum(sar2 * sar2) AS BIGINT) FROM rj) AS s
)
SELECT n_blocks, CAST(5 AS BIGINT) AS k,
       floor((3.0 * s / (CAST(n_blocks AS DOUBLE) * 5 * 6) - 3.0 * n_blocks * 6)
             * 1000000 + 0.5) / 1000000.0 AS chi2_f
FROM t
""",
)
def agg_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FRIEDMAN rank test across k = 5 order-priority "treatments"
    blocked by customer bucket (custkey%20): ranks each block's k cell
    totals within the block, then asks whether the rank sums differ
    across treatments — the repeated-measures cousin of
    ``agg_kruskal_wallis`` (KW assumes independent groups; Friedman
    removes between-block variation first, the right shape for
    per-cohort / per-segment treatment comparisons).  Blocks missing a
    treatment are excluded (complete-block design).

    Exactness: cell values are exact cent sums, so within-block
    ordering is integer comparison; tie-averaged ranks enter as the
    INTEGER 2·rank + ties − 1, making Σ_j(Σ_blocks 2R)² exact int64 and
    χ²_F = 3·Σ(2R_j)²/(Nk(k+1)) − 3N(k+1) one closed-form double.

    Scale shape: one groupBy to the block×treatment grain; the rank
    window partitions BY BLOCK (k rows per partition — never a global
    window); rank sums are a |treatments|-row aggregate."""
    o = table(spark, sf_dir, "orders")
    cell = o.groupBy(
        (F.col("o_custkey") % 20).alias("blk"),
        F.col("o_orderpriority").alias("trt"),
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("v"))
    full_blk = cell.groupBy("blk").agg(F.count(F.lit(1)).alias("cnt")).filter(
        F.col("cnt") == 5
    )
    w_rank = Window.partitionBy("blk").orderBy("v")
    w_tie = Window.partitionBy("blk", "v")
    ranked = cell.join(full_blk.select("blk"), "blk").select(
        "trt",
        (
            2 * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_tie).cast("long") - 1
        ).alias("ar2"),
    )
    rj = ranked.groupBy("trt").agg(F.sum("ar2").cast("long").alias("sar2"))
    s = rj.agg(F.sum(F.col("sar2") * F.col("sar2")).cast("long").alias("s"))
    n = full_blk.agg(F.count(F.lit(1)).cast("long").alias("n_blocks"))
    t = n.crossJoin(F.broadcast(s))
    chi2 = (
        F.lit(3.0) * F.col("s") / (F.col("n_blocks").cast("double") * 5 * 6)
        - F.lit(3.0) * F.col("n_blocks") * 6
    )
    return t.select("n_blocks", F.lit(5).cast("long").alias("k"), r6(chi2).alias("chi2_f"))


@register(
    "agg_logrank",
    oracle=f"""
WITH horizon AS (
  SELECT max(ts) - INTERVAL {_KM_CENSOR_DAYS} DAY AS cutoff FROM events
), u AS (
  SELECT user_id,
         CAST(date_diff('day', min(ts), max(ts)) AS BIGINT) AS duration,
         max(ts) < (SELECT cutoff FROM horizon) AS churned,
         user_id % 2 AS grp
  FROM events GROUP BY user_id
), g AS (
  SELECT duration,
         CAST(sum(CASE WHEN churned AND grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
         CAST(sum(CASE WHEN churned AND grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
         CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM u GROUP BY 1
), r AS (
  SELECT duration, d1, d2,
         (SELECT CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) FROM u)
           - CAST(coalesce(sum(c1) OVER (ORDER BY duration
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS n1,
         (SELECT CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) FROM u)
           - CAST(coalesce(sum(c2) OVER (ORDER BY duration
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS n2
  FROM g
), ev AS (
  SELECT duration, d1, d2, n1, n2, d1 + d2 AS d, n1 + n2 AS n
  FROM r WHERE d1 + d2 > 0
), f AS (
  SELECT CAST(sum(d1) AS BIGINT) AS o1,
         list_reduce(
           list_prepend({{se: CAST(0 AS DOUBLE), sv: CAST(0 AS DOUBLE)}},
             list({{se: CAST(d AS DOUBLE) * n1 / n,
                   sv: CASE WHEN n > 1
                       THEN (CAST(d AS DOUBLE) * n1 / n) * (CAST(n2 AS DOUBLE) / n)
                            * (n - d) / (n - 1)
                       ELSE CAST(0 AS DOUBLE) END}} ORDER BY duration)),
           (acc, x) -> {{se: acc.se + x.se, sv: acc.sv + x.sv}}) AS st
  FROM ev
)
SELECT o1,
       floor(st.se * 1000000 + 0.5) / 1000000.0 AS e1,
       floor((o1 - st.se) * (o1 - st.se) / st.sv * 1000000 + 0.5)
         / 1000000.0 AS chi2_logrank
FROM f
""",
)
def agg_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-GROUP LOG-RANK test on user survival (even vs odd user_id):
    at each distinct churn time, observed group-0 churns vs those
    expected under a pooled hazard, χ² = (O₁−E₁)²/V — the standard
    "do these two cohorts churn at different rates" test that reads
    the WHOLE curve (``agg_kaplan_meier``/``agg_nelson_aalen`` plot it;
    log-rank says whether the separation is real).  Same 7-day
    right-censoring rule as KM.

    Exactness: per-duration churn and at-risk counts per group come
    exact int64 from one ``distributed_rank`` pass (sum_cols) over the
    bounded distinct-duration grain; the order-sensitive E₁/V sums fold
    sequentially over the duration-sorted event array with a two-field
    struct accumulator (Spark ``aggregate`` == DuckDB ``list_reduce``
    with a zero-struct init); χ² is one closed-form double.

    Scale shape: user groupBy → duration groupBy (both map-side
    combined), one distributed_rank pass, one bounded fold."""
    ev = table(spark, sf_dir, "events")
    horizon = ev.agg(
        (F.max("ts") - F.expr(f"INTERVAL {_KM_CENSOR_DAYS} DAYS")).alias("cutoff")
    )
    u = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
        .crossJoin(F.broadcast(horizon))
        .select(
            F.datediff("last_ts", "first_ts").cast("long").alias("duration"),
            (F.col("last_ts") < F.col("cutoff")).alias("churned"),
            (F.col("user_id") % 2).alias("grp"),
        )
    )
    g = u.groupBy("duration").agg(
        F.sum(F.when(F.col("churned") & (F.col("grp") == 0), 1).otherwise(0))
        .cast("long")
        .alias("d1"),
        F.sum(F.when(F.col("churned") & (F.col("grp") == 1), 1).otherwise(0))
        .cast("long")
        .alias("d2"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("long").alias("c2"),
    )
    r = distributed_rank(g, ["duration"], sum_cols=("c1", "c2")).select(
        "duration",
        "d1",
        "d2",
        (F.col("_tot_c1") - (F.col("_cum_c1") - F.col("c1"))).cast("long").alias("n1"),
        (F.col("_tot_c2") - (F.col("_cum_c2") - F.col("c2"))).cast("long").alias("n2"),
    )
    evd = r.filter(F.col("d1") + F.col("d2") > 0).select(
        "duration",
        "d1",
        (F.col("d1") + F.col("d2")).alias("d"),
        "n1",
        "n2",
        (F.col("n1") + F.col("n2")).alias("n"),
    )
    se_term = F.col("d").cast("double") * F.col("n1") / F.col("n")
    sv_term = F.when(
        F.col("n") > 1,
        (F.col("d").cast("double") * F.col("n1") / F.col("n"))
        * (F.col("n2").cast("double") / F.col("n"))
        * (F.col("n") - F.col("d"))
        / (F.col("n") - 1),
    ).otherwise(F.lit(0.0))
    init = F.struct(F.lit(0.0).alias("se"), F.lit(0.0).alias("sv"))
    f = evd.select(
        "duration", "d1", se_term.alias("se_t"), sv_term.alias("sv_t")
    ).agg(
        F.sum("d1").cast("long").alias("o1"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("duration"), F.col("se_t"), F.col("sv_t")))
            ),
            init,
            lambda acc, x: F.struct(
                (acc.getField("se") + x.getField("se_t")).alias("se"),
                (acc.getField("sv") + x.getField("sv_t")).alias("sv"),
            ),
        ).alias("st"),
    )
    e1 = F.col("st").getField("se")
    v = F.col("st").getField("sv")
    return f.select(
        "o1",
        r6(e1).alias("e1"),
        r6((F.col("o1") - e1) * (F.col("o1") - e1) / v).alias("chi2_logrank"),
    )


@register(
    "agg_standardized_rate",
    oracle="""
WITH cells AS (
  SELECT o_custkey % 2 AS grp, o_orderpriority AS stratum,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2
), std AS (
  SELECT stratum, CAST(sum(n) AS BIGINT) AS ns FROM cells GROUP BY 1
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nt FROM cells
), t AS (
  SELECT c.grp,
         CAST(sum(c.a) AS BIGINT) AS a_g, CAST(sum(c.n) AS BIGINT) AS n_g,
         list_reduce(
           list_prepend(CAST(0 AS DOUBLE),
             list((CAST(s.ns AS DOUBLE) / tot.nt) * (CAST(c.a AS DOUBLE) / c.n)
                  ORDER BY c.stratum)),
           (x, y) -> x + y) AS std_rate
  FROM cells c JOIN std s ON c.stratum = s.stratum CROSS JOIN tot
  GROUP BY c.grp
)
SELECT grp, a_g, n_g,
       floor(CAST(a_g AS DOUBLE) / n_g * 1000000 + 0.5) / 1000000.0 AS crude_rate,
       floor(std_rate * 1000000 + 0.5) / 1000000.0 AS std_rate
FROM t ORDER BY grp
""",
)
def agg_standardized_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIRECTLY STANDARDIZED RATE: fully-shipped rate per customer-
    parity group, reweighted to the POOLED order-priority mix —
    the epidemiologist's confounder control (if group 1 looks worse
    only because it gets more urgent orders, standardization removes
    exactly that): std_g = Σ_s (N_s/N)·(a_gs/n_gs) next to the crude
    a_g/n_g, and the crude-vs-standardized gap IS the mix effect
    (the within-group twin of ``agg_mix_shift``'s period decomposition).

    Exactness: all cell/stratum/total counts are exact int64; the
    |strata|-term weighted sum folds sequentially over the stratum-
    sorted array per group (the agg_anova_f recipe), so both engines
    accumulate identical doubles in identical order.

    Scale shape: one groupBy to the group×stratum grain, a broadcast
    stratum-weight join, and a |groups|-row fold aggregate."""
    o = table(spark, sf_dir, "orders")
    cells = o.groupBy(
        (F.col("o_custkey") % 2).alias("grp"),
        F.col("o_orderpriority").alias("stratum"),
    ).agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    std = cells.groupBy("stratum").agg(F.sum("n").cast("long").alias("ns"))
    tot = cells.agg(F.sum("n").cast("long").alias("nt"))
    term = (F.col("ns").cast("double") / F.col("nt")) * (
        F.col("a").cast("double") / F.col("n")
    )
    t = (
        cells.join(F.broadcast(std), "stratum")
        .crossJoin(F.broadcast(tot))
        .select("grp", "stratum", "a", "n", term.alias("term"))
        .groupBy("grp")
        .agg(
            F.sum("a").cast("long").alias("a_g"),
            F.sum("n").cast("long").alias("n_g"),
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("stratum"), F.col("term")))),
                    lambda s: s.getField("term"),
                ),
                F.lit(0.0),
                lambda x, y: x + y,
            ).alias("std_rate"),
        )
    )
    return t.select(
        "grp",
        "a_g",
        "n_g",
        r6(F.col("a_g").cast("double") / F.col("n_g")).alias("crude_rate"),
        r6(F.col("std_rate")).alias("std_rate"),
    ).orderBy("grp")


# Fixed design constants for the power analysis: alpha = 0.05 two-sided
# (z = 1.959964), power = 0.80 (z = 0.841621), MDE = 2% of the mean.
_SS_Z_ALPHA = 1.959964
_SS_Z_BETA = 0.841621
_SS_MDE_FRAC = 0.02


@register(
    "agg_sample_size",
    oracle=f"""
WITH m AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(sum(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sq
  FROM events GROUP BY 1
), c AS (
  SELECT event_type, n,
         CAST(sq AS DOUBLE) / n - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)
           AS var_cents,
         {_SS_MDE_FRAC} * (CAST(s AS DOUBLE) / n) AS delta
  FROM m
)
SELECT event_type, n,
       floor(var_cents * 1000000 + 0.5) / 1000000.0 AS var_cents,
       CAST(ceil(2 * ({_SS_Z_ALPHA} + {_SS_Z_BETA}) * ({_SS_Z_ALPHA} + {_SS_Z_BETA})
                 * var_cents / (delta * delta)) AS BIGINT) AS n_per_arm
FROM c ORDER BY event_type
""",
)
def agg_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B TEST SAMPLE-SIZE (power) CALCULATOR per event type: the
    two-sample normal-approximation formula n/arm = 2(z_α/2+z_β)²σ²/δ²
    at α = 0.05, power = 0.80, MDE = 2% of the current mean — the
    pre-experiment sibling of ``agg_ab_test``/``agg_welch_t`` (those
    judge a finished experiment; this one says how long to run the
    next one, fed by the SAME variance the pipeline already measures).

    Exactness: σ² comes from exact int64 cent moments, δ from the
    exact-int mean, z constants are shared literals, and the one
    rounding (ceil to whole users) happens identically both engines.

    Scale shape: one map-side-combined groupBy; |types| output rows;
    everything after the moment sums is projection algebra."""
    ev = table(spark, sf_dir, "events")
    y = F.round(F.col("value") * 100).cast("long")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(y).cast("long").alias("s"),
        F.sum(y * y).cast("long").alias("sq"),
    )
    mu = F.col("s").cast("double") / F.col("n")
    var = F.col("sq").cast("double") / F.col("n") - mu * mu
    delta = F.lit(_SS_MDE_FRAC) * mu
    z2 = (_SS_Z_ALPHA + _SS_Z_BETA) ** 2
    return m.select(
        "event_type",
        "n",
        (F.floor(var * 1000000 + 0.5) / 1000000.0).alias("var_cents"),
        F.ceil(F.lit(2.0) * F.lit(z2) * var / (delta * delta))
        .cast("long")
        .alias("n_per_arm"),
    ).orderBy("event_type")


_DID_SPLIT = "2024-01-16"  # the agg_mix_shift period boundary, reused


@register(
    "agg_did",
    oracle=f"""
WITH cells AS (
  SELECT user_id % 2 AS grp,
         CASE WHEN CAST(ts AS DATE) < DATE '{_DID_SPLIT}' THEN 0 ELSE 1 END AS period,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(sum(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sq
  FROM events GROUP BY 1, 2
), w AS (
  SELECT
    CAST(sum(n) AS BIGINT) AS n_total,
    max(CASE WHEN grp = 1 AND period = 1 THEN CAST(s AS DOUBLE) / n END) AS m11,
    max(CASE WHEN grp = 1 AND period = 0 THEN CAST(s AS DOUBLE) / n END) AS m10,
    max(CASE WHEN grp = 0 AND period = 1 THEN CAST(s AS DOUBLE) / n END) AS m01,
    max(CASE WHEN grp = 0 AND period = 0 THEN CAST(s AS DOUBLE) / n END) AS m00,
    max(CASE WHEN grp = 1 AND period = 1 THEN
        (CAST(sq AS DOUBLE) / n - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) / n END) AS v11,
    max(CASE WHEN grp = 1 AND period = 0 THEN
        (CAST(sq AS DOUBLE) / n - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) / n END) AS v10,
    max(CASE WHEN grp = 0 AND period = 1 THEN
        (CAST(sq AS DOUBLE) / n - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) / n END) AS v01,
    max(CASE WHEN grp = 0 AND period = 0 THEN
        (CAST(sq AS DOUBLE) / n - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) / n END) AS v00
  FROM cells
)
SELECT n_total,
       floor(((m11 - m10) - (m01 - m00)) * 1000000 + 0.5) / 1000000.0 AS did_cents,
       floor((((m11 - m10) - (m01 - m00))
              - 1.96 * sqrt(v11 + v10 + v01 + v00)) * 1000000 + 0.5)
         / 1000000.0 AS ci_lo,
       floor((((m11 - m10) - (m01 - m00))
              + 1.96 * sqrt(v11 + v10 + v01 + v00)) * 1000000 + 0.5)
         / 1000000.0 AS ci_hi
FROM w
""",
)
def agg_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES estimate of the treatment effect:
    (treated post − treated pre) − (control post − control pre) over
    the user-parity groups and the mix-shift period boundary — the
    workhorse quasi-experimental estimator when randomization wasn't
    available (``agg_ab_test``/``agg_cuped`` assume it was; DiD removes
    time-invariant group differences AND group-invariant time shocks),
    with the large-sample normal CI from the four cell variances.

    Exactness: the four cells' n/Σ/Σ² are exact int64 from ONE
    conditional-aggregate pass; means, variances, the DiD contrast and
    the CI are a fixed-order closed-form double expression (the 4-term
    variance sum is written out, no fold needed for compile-time k).

    Scale shape: one map-side-combined groupBy to 4 rows, then a 1-row
    pivot aggregate.  Nothing row-proportional past the first
    exchange."""
    ev = table(spark, sf_dir, "events")
    y = F.round(F.col("value") * 100).cast("long")
    cells = ev.groupBy(
        (F.col("user_id") % 2).alias("grp"),
        F.when(F.col("ts").cast("date") < F.lit(_DID_SPLIT).cast("date"), 0)
        .otherwise(1)
        .alias("period"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(y).cast("long").alias("s"),
        F.sum(y * y).cast("long").alias("sq"),
    )

    def cell(g, p, expr):
        return F.max(F.when((F.col("grp") == g) & (F.col("period") == p), expr))

    mean = F.col("s").cast("double") / F.col("n")
    vexp = (F.col("sq").cast("double") / F.col("n") - mean * mean) / F.col("n")
    w = cells.agg(
        F.sum("n").cast("long").alias("n_total"),
        cell(1, 1, mean).alias("m11"),
        cell(1, 0, mean).alias("m10"),
        cell(0, 1, mean).alias("m01"),
        cell(0, 0, mean).alias("m00"),
        cell(1, 1, vexp).alias("v11"),
        cell(1, 0, vexp).alias("v10"),
        cell(0, 1, vexp).alias("v01"),
        cell(0, 0, vexp).alias("v00"),
    )
    did = (F.col("m11") - F.col("m10")) - (F.col("m01") - F.col("m00"))
    se = F.sqrt(F.col("v11") + F.col("v10") + F.col("v01") + F.col("v00"))
    return w.select(
        "n_total",
        r6(did).alias("did_cents"),
        r6(did - 1.96 * se).alias("ci_lo"),
        r6(did + 1.96 * se).alias("ci_hi"),
    )


_ES_ANCHOR_TYPE = "purchase"
_ES_WINDOW_DAYS = 7


@register(
    "win_event_study",
    oracle=f"""
WITH anchor AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS a_day
  FROM events WHERE event_type = '{_ES_ANCHOR_TYPE}' GROUP BY 1
), rel AS (
  SELECT date_diff('day', a.a_day, CAST(e.ts AS DATE)) AS rel_day,
         CAST(round(e.value * 100) AS BIGINT) AS cents
  FROM events e JOIN anchor a ON e.user_id = a.user_id
  WHERE date_diff('day', a.a_day, CAST(e.ts AS DATE))
        BETWEEN -{_ES_WINDOW_DAYS} AND {_ES_WINDOW_DAYS}
)
SELECT CAST(rel_day AS BIGINT) AS rel_day,
       CAST(count(*) AS BIGINT) AS n_obs,
       floor((CAST(sum(cents) AS DOUBLE) / count(*)) * 1000000 + 0.5)
         / 1000000.0 AS mean_cents
FROM rel GROUP BY 1 ORDER BY 1
""",
)
def win_event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVENT STUDY around each user's first '{t}' event: mean activity
    value by day relative to the anchor (±{w} days) — the
    visual-inspection estimator behind every "what changed when users
    converted" question, and the parallel-trends audit that decides
    whether ``agg_did``'s identifying assumption is even plausible
    (pre-anchor days flat ⇒ credible).

    Exactness: the anchor is a per-user min-date aggregate, relative
    days are integer date arithmetic, and each output row is an
    exact-int mean — one double division per row.

    Scale shape: anchor frame is one user-keyed groupBy; the alignment
    join is user-keyed (broadcastable when the anchored cohort is
    small); the final rollup is a map-side-combined groupBy to the
    2·{w}+1-row grain."""
    ev = table(spark, sf_dir, "events")
    anchor = (
        ev.filter(F.col("event_type") == _ES_ANCHOR_TYPE)
        .groupBy("user_id")
        .agg(F.min(F.col("ts").cast("date")).alias("a_day"))
    )
    rel = (
        ev.join(anchor, "user_id")
        .select(
            F.datediff(F.col("ts").cast("date"), "a_day").cast("long").alias("rel_day"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .filter(
            (F.col("rel_day") >= -_ES_WINDOW_DAYS) & (F.col("rel_day") <= _ES_WINDOW_DAYS)
        )
    )
    return (
        rel.groupBy("rel_day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            r6(F.sum("cents").cast("double") / F.count(F.lit(1))).alias("mean_cents"),
        )
        .orderBy("rel_day")
    )


win_event_study.__doc__ = win_event_study.__doc__.format(
    t=_ES_ANCHOR_TYPE, w=_ES_WINDOW_DAYS
)


@register(
    "agg_yuen_trimmed_t",
    oracle="""
WITH pts AS (
  SELECT event_id % 2 AS grp, CAST(round(value * 100) AS BIGINT) AS y, event_id
  FROM events
), r AS (
  SELECT grp, y,
         CAST(row_number() OVER (PARTITION BY grp ORDER BY y, event_id) AS BIGINT)
           AS wr,
         CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS n
  FROM pts
), s AS (
  SELECT grp, n, CAST(floor(n / 5) AS BIGINT) AS k FROM r GROUP BY 1, 2
), agg AS (
  SELECT r.grp, s.n, s.k,
         CAST(sum(CASE WHEN r.wr > s.k AND r.wr <= s.n - s.k THEN r.y ELSE 0 END)
              AS BIGINT) AS tsum,
         CAST(max(CASE WHEN r.wr = s.k + 1 THEN r.y END) AS BIGINT) AS lo,
         CAST(max(CASE WHEN r.wr = s.n - s.k THEN r.y END) AS BIGINT) AS hi,
         CAST(sum(CASE WHEN r.wr > s.k AND r.wr <= s.n - s.k THEN r.y * r.y ELSE 0 END)
              AS BIGINT) AS tsq
  FROM r JOIN s ON r.grp = s.grp
  GROUP BY 1, 2, 3
), st AS (
  SELECT grp, n, k, n - 2 * k AS h,
         CAST(tsum AS DOUBLE) / (n - 2 * k) AS tm,
         ((tsq + k * lo * lo + k * hi * hi)
          - CAST(tsum + k * lo + k * hi AS DOUBLE)
            * (tsum + k * lo + k * hi) / n) / (n - 1) AS wv
  FROM agg
), d AS (
  SELECT grp, n, h, tm, wv * (n - 1) / (CAST(h AS DOUBLE) * (h - 1)) AS dq
  FROM st
), w AS (
  SELECT max(CASE WHEN grp = 0 THEN tm END) AS tm0,
         max(CASE WHEN grp = 1 THEN tm END) AS tm1,
         max(CASE WHEN grp = 0 THEN dq END) AS d0,
         max(CASE WHEN grp = 1 THEN dq END) AS d1,
         CAST(max(CASE WHEN grp = 0 THEN h END) AS BIGINT) AS h0,
         CAST(max(CASE WHEN grp = 1 THEN h END) AS BIGINT) AS h1
  FROM d
)
SELECT h0, h1,
       floor((tm0 - tm1) * 1000000 + 0.5) / 1000000.0 AS trim_mean_diff,
       floor((tm0 - tm1) / sqrt(d0 + d1) * 1000000 + 0.5) / 1000000.0 AS t_yuen,
       floor((d0 + d1) * (d0 + d1)
             / (d0 * d0 / (h0 - 1) + d1 * d1 / (h1 - 1))
             * 1000000 + 0.5) / 1000000.0 AS dof
FROM w
""",
)
def agg_yuen_trimmed_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """YUEN'S TRIMMED-MEAN t-test (20% trim) between the even/odd
    event-id halves: compares 20%-trimmed means with Winsorized
    variances and a Welch-Satterthwaite dof — the robust middle ground
    between ``agg_welch_t`` (means; outlier-fragile) and
    ``agg_mann_whitney`` (ranks only; discards magnitude), the
    recommended default for heavy-tailed metrics in the robust-
    statistics literature (Yuen 1974, Wilcox).

    Exactness: within-group ranks come from ONE ``distributed_rank``
    pass over (grp, value, event_id) — within-group rank = global rank
    minus the group's start offset, both exact — so trimmed sums,
    boundary order statistics (the Winsorizing values) and Winsorized
    squares are all exact int64 conditional sums; t and dof are
    fixed-order closed-form doubles.

    Scale shape: one range exchange serves both groups' ranks (no
    per-group re-sort); the conditional aggregate is map-side
    combined; the final contrast is a 1-row pivot."""
    ev = table(spark, sf_dir, "events")
    pts = ev.select(
        (F.col("event_id") % 2).alias("grp"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
        "event_id",
    )
    r = distributed_rank(pts, ["grp", "y", "event_id"])
    grp_off = r.groupBy("grp").agg(
        F.min("_rk").alias("off"), F.count(F.lit(1)).cast("long").alias("n")
    )
    rr = r.join(F.broadcast(grp_off), "grp").select(
        "grp",
        "y",
        (F.col("_rk") - F.col("off") + 1).alias("wr"),
        "n",
        F.floor(F.col("n") / 5).cast("long").alias("k"),
    )
    inner = (F.col("wr") > F.col("k")) & (F.col("wr") <= F.col("n") - F.col("k"))
    agg = rr.groupBy("grp", "n", "k").agg(
        F.sum(F.when(inner, F.col("y")).otherwise(0)).cast("long").alias("tsum"),
        F.max(F.when(F.col("wr") == F.col("k") + 1, F.col("y"))).cast("long").alias("lo"),
        F.max(F.when(F.col("wr") == F.col("n") - F.col("k"), F.col("y")))
        .cast("long")
        .alias("hi"),
        F.sum(F.when(inner, F.col("y") * F.col("y")).otherwise(0))
        .cast("long")
        .alias("tsq"),
    )
    h = F.col("n") - 2 * F.col("k")
    tm = F.col("tsum").cast("double") / h
    wsum = F.col("tsum") + F.col("k") * F.col("lo") + F.col("k") * F.col("hi")
    wsq = F.col("tsq") + F.col("k") * F.col("lo") * F.col("lo") + F.col("k") * F.col(
        "hi"
    ) * F.col("hi")
    wv = (wsq - wsum.cast("double") * wsum / F.col("n")) / (F.col("n") - 1)
    d = agg.select(
        "grp",
        "n",
        h.alias("h"),
        tm.alias("tm"),
        (wv * (F.col("n") - 1) / (h.cast("double") * (h - 1))).alias("dq"),
    )

    def g(gi, expr):
        return F.max(F.when(F.col("grp") == gi, expr))

    w = d.agg(
        g(0, F.col("tm")).alias("tm0"),
        g(1, F.col("tm")).alias("tm1"),
        g(0, F.col("dq")).alias("d0"),
        g(1, F.col("dq")).alias("d1"),
        g(0, F.col("h")).cast("long").alias("h0"),
        g(1, F.col("h")).cast("long").alias("h1"),
    )
    diff = F.col("tm0") - F.col("tm1")
    dsum = F.col("d0") + F.col("d1")
    return w.select(
        "h0",
        "h1",
        r6(diff).alias("trim_mean_diff"),
        r6(diff / F.sqrt(dsum)).alias("t_yuen"),
        r6(
            dsum
            * dsum
            / (
                F.col("d0") * F.col("d0") / (F.col("h0") - 1)
                + F.col("d1") * F.col("d1") / (F.col("h1") - 1)
            )
        ).alias("dof"),
    )


# ---------------------------------------------------------------------------
# Normal-CDF closure (round 13): the Abramowitz & Stegun 26.2.17 polynomial
# (|error| < 7.5e-8) gives both engines the SAME closed-form Phi(z), which
# unlocks p-values — and therefore multiple-testing and equivalence
# procedures — for the whole battery without any engine-native erf().
# ---------------------------------------------------------------------------

_AS_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_AS_T = 0.2316419
_INV_SQRT_2PI = 0.3989422804014327


def _norm_cdf(z):
    """Spark column Phi(z) via A&S 26.2.17 — fixed Horner order, mirrored
    for negative z, bit-identical to the SQL twin below."""
    x = F.abs(z)
    t = 1.0 / (1.0 + _AS_T * x)
    poly = t * (
        _AS_B[0]
        + t * (_AS_B[1] + t * (_AS_B[2] + t * (_AS_B[3] + t * _AS_B[4])))
    )
    core = F.lit(_INV_SQRT_2PI) * F.exp(-x * x / 2) * poly
    return F.when(z >= 0, 1.0 - core).otherwise(core)


def _norm_cdf_sql(expr: str) -> str:
    """The identical polynomial as DuckDB SQL over *expr*."""
    b = _AS_B
    return f"""(CASE WHEN ({expr}) >= 0
  THEN 1.0 - {_INV_SQRT_2PI} * exp(-abs({expr}) * abs({expr}) / 2)
        * ((1.0 / (1.0 + {_AS_T} * abs({expr})))
           * ({b[0]} + (1.0 / (1.0 + {_AS_T} * abs({expr})))
              * ({b[1]} + (1.0 / (1.0 + {_AS_T} * abs({expr})))
                 * ({b[2]} + (1.0 / (1.0 + {_AS_T} * abs({expr})))
                    * ({b[3]} + (1.0 / (1.0 + {_AS_T} * abs({expr}))) * {b[4]})))))
  ELSE {_INV_SQRT_2PI} * exp(-abs({expr}) * abs({expr}) / 2)
        * ((1.0 / (1.0 + {_AS_T} * abs({expr})))
           * ({b[0]} + (1.0 / (1.0 + {_AS_T} * abs({expr})))
              * ({b[1]} + (1.0 / (1.0 + {_AS_T} * abs({expr})))
                 * ({b[2]} + (1.0 / (1.0 + {_AS_T} * abs({expr})))
                    * ({b[3]} + (1.0 / (1.0 + {_AS_T} * abs({expr}))) * {b[4]})))))
  END)"""


@register(
    "fn_normal_cdf",
    oracle=f"""
SELECT CAST(i AS BIGINT) AS i,
       floor((i / 10.0) * 1000000 + 0.5) / 1000000.0 AS z,
       floor({_norm_cdf_sql("i / 10.0")} * 1000000 + 0.5) / 1000000.0 AS phi
FROM (SELECT unnest(generate_series(-40, 40)) AS i)
ORDER BY i
""",
)
def fn_normal_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STANDARD NORMAL CDF Phi(z) on the z ∈ [−4, 4] grid (step 0.1)
    via the Abramowitz & Stegun 26.2.17 polynomial (|error| < 7.5e-8) —
    the p-value primitive the engine otherwise lacks (no native erf in
    either engine), evaluated as ONE fixed-Horner-order double
    expression so Spark and DuckDB produce identical bits; mirrored
    for negative z through Phi(−z) = 1 − Phi(z).  Consumers:
    ``agg_multiple_testing_bh`` (p-values + BH), ``agg_tost_equivalence``
    (one-sided bounds) — and any z-statistic in the battery.

    Scale shape: a generated 81-row grid, pure projection — the
    fn_math_grid contract (prove the scalar kernel, zero data
    movement)."""
    grid = spark.range(-40, 41).select(F.col("id").cast("long").alias("i"))
    z = F.col("i") / 10.0
    return grid.select(
        "i",
        r6(z).alias("z"),
        r6(_norm_cdf(z)).alias("phi"),
    ).orderBy("i")


_BH_ALPHA = 0.05
_BH_BUCKETS = 8  # user buckets per event type -> 5 x 8 = 40 hypotheses


@register(
    "agg_multiple_testing_bh",
    oracle=f"""
WITH cells AS (
  SELECT event_type, user_id % {_BH_BUCKETS} AS bucket, user_id % 2 AS arm,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(sum(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sq
  FROM events GROUP BY 1, 2, 3
), seg AS (
  SELECT event_type, bucket,
         max(CASE WHEN arm = 0 THEN CAST(s AS DOUBLE) / n END) AS m0,
         max(CASE WHEN arm = 1 THEN CAST(s AS DOUBLE) / n END) AS m1,
         max(CASE WHEN arm = 0 THEN
             (CAST(sq AS DOUBLE) / n - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
             / n END) AS v0,
         max(CASE WHEN arm = 1 THEN
             (CAST(sq AS DOUBLE) / n - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
             / n END) AS v1
  FROM cells GROUP BY 1, 2
  HAVING count(*) = 2
), pz AS (
  SELECT event_type, bucket,
         (m1 - m0) / sqrt(v0 + v1) AS z,
         2 * (1 - {_norm_cdf_sql("abs((m1 - m0) / sqrt(v0 + v1))")}) AS p
  FROM seg
), ranked AS (
  SELECT event_type, bucket, z, p,
         CAST(row_number() OVER (ORDER BY p, event_type, bucket) AS BIGINT) AS rk,
         CAST(count(*) OVER () AS BIGINT) AS m
  FROM pz
), cut AS (
  SELECT coalesce(max(CASE WHEN p <= {_BH_ALPHA} * rk / m THEN rk END), 0) AS k
  FROM ranked
)
SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
       floor(z * 1000000 + 0.5) / 1000000.0 AS z,
       floor(p * 1000000 + 0.5) / 1000000.0 AS p,
       rk <= (SELECT k FROM cut) AS rejected
FROM ranked ORDER BY event_type, bucket
""",
)
def agg_multiple_testing_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENJAMINI-HOCHBERG FDR control over the 5×{b}-segment two-arm
    z-test battery (per event type × user bucket, even/odd arms): each
    segment's Welch z becomes a two-sided p through the shared A&S
    normal CDF, then BH's step-up rule rejects the k smallest p-values
    where p_(i) ≤ α·i/m — THE guardrail against the "run 40 segment
    tests, celebrate the 2 that hit p<0.05" trap that per-test α
    invites (``agg_ab_test`` judges one test; this one judges the
    family).

    Exactness: segment moments are exact int64; z, p, the rank order
    (identical doubles ⇒ identical ordering, segment tiebreak), the
    step-up cut and the reject flags are all engine-identical.  The
    rank window runs on the BOUNDED hypothesis frame (m = segments,
    compile-time bounded — the legitimate unpartitioned-window case;
    ``distributed_rank`` is the swap if m ever became data-scaled).

    Scale shape: one map-side-combined groupBy to segment×arm cells,
    a segment-grain pivot, and m-row rank/cut algebra."""
    ev = table(spark, sf_dir, "events")
    y = F.round(F.col("value") * 100).cast("long")
    cells = ev.groupBy(
        "event_type",
        (F.col("user_id") % _BH_BUCKETS).alias("bucket"),
        (F.col("user_id") % 2).alias("arm"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(y).cast("long").alias("s"),
        F.sum(y * y).cast("long").alias("sq"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    vexp = (F.col("sq").cast("double") / F.col("n") - mean * mean) / F.col("n")
    seg = (
        cells.groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_arms"),
            F.max(F.when(F.col("arm") == 0, mean)).alias("m0"),
            F.max(F.when(F.col("arm") == 1, mean)).alias("m1"),
            F.max(F.when(F.col("arm") == 0, vexp)).alias("v0"),
            F.max(F.when(F.col("arm") == 1, vexp)).alias("v1"),
        )
        .filter(F.col("n_arms") == 2)
    )
    z = (F.col("m1") - F.col("m0")) / F.sqrt(F.col("v0") + F.col("v1"))
    pz = seg.select(
        "event_type",
        "bucket",
        z.alias("z"),
        (2 * (1 - _norm_cdf(F.abs(z)))).alias("p"),
    )
    w_rank = Window.orderBy("p", "event_type", "bucket")
    w_all = Window.partitionBy()
    ranked = pz.select(
        "event_type",
        "bucket",
        "z",
        "p",
        F.row_number().over(w_rank).cast("long").alias("rk"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("m"),
    )
    cut = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("p") <= _BH_ALPHA * F.col("rk") / F.col("m"), F.col("rk"))),
            F.lit(0),
        ).alias("k")
    )
    return (
        ranked.crossJoin(F.broadcast(cut))
        .select(
            "event_type",
            F.col("bucket").cast("long").alias("bucket"),
            r6(F.col("z")).alias("z"),
            r6(F.col("p")).alias("p"),
            (F.col("rk") <= F.col("k")).alias("rejected"),
        )
        .orderBy("event_type", "bucket")
    )


agg_multiple_testing_bh.__doc__ = agg_multiple_testing_bh.__doc__.format(b=_BH_BUCKETS)


_TOST_DELTA_FRAC = 0.01  # equivalence margin: ±1% of the pooled mean


@register(
    "agg_tost_equivalence",
    oracle=f"""
WITH cells AS (
  SELECT user_id % 2 AS arm,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(sum(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sq
  FROM events GROUP BY 1
), w AS (
  SELECT
    CAST(sum(n) AS BIGINT) AS n_total,
    max(CASE WHEN arm = 1 THEN CAST(s AS DOUBLE) / n END)
      - max(CASE WHEN arm = 0 THEN CAST(s AS DOUBLE) / n END) AS diff,
    {_TOST_DELTA_FRAC} * (CAST(sum(s) AS DOUBLE) / sum(n)) AS delta,
    sqrt(max(CASE WHEN arm = 0 THEN
          (CAST(sq AS DOUBLE) / n - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) / n END)
       + max(CASE WHEN arm = 1 THEN
          (CAST(sq AS DOUBLE) / n - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) / n END))
      AS se
  FROM cells
), t AS (
  SELECT n_total, diff, delta,
         (diff + delta) / se AS z_lo, (delta - diff) / se AS z_hi
  FROM w
)
SELECT n_total,
       floor(diff * 1000000 + 0.5) / 1000000.0 AS diff_cents,
       floor(delta * 1000000 + 0.5) / 1000000.0 AS delta_cents,
       floor(greatest(1 - {_norm_cdf_sql("z_lo")}, 1 - {_norm_cdf_sql("z_hi")})
             * 1000000 + 0.5) / 1000000.0 AS p_tost,
       greatest(1 - {_norm_cdf_sql("z_lo")}, 1 - {_norm_cdf_sql("z_hi")}) < 0.05
         AS equivalent
FROM t
""",
)
def agg_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST EQUIVALENCE test (two one-sided tests) between the user-
    parity arms at a ±{d}-of-mean margin: "are these two arms the
    SAME, within δ" — the question a non-significant ``agg_ab_test``
    cannot answer (absence of evidence ≠ evidence of absence; TOST
    rejects non-equivalence only when BOTH one-sided bounds clear),
    the standard gate for no-regression launches and A/A validation.
    p_TOST = max of the two one-sided p-values via the shared A&S
    normal CDF.

    Exactness: arm moments are exact int64; diff, margin, both z's and
    the CDF polynomial are fixed-order double expressions — the flag
    compares identical doubles against the same 0.05 literal.

    Scale shape: one 2-row conditional aggregate, then projection."""
    ev = table(spark, sf_dir, "events")
    y = F.round(F.col("value") * 100).cast("long")
    cells = ev.groupBy((F.col("user_id") % 2).alias("arm")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(y).cast("long").alias("s"),
        F.sum(y * y).cast("long").alias("sq"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    vexp = (F.col("sq").cast("double") / F.col("n") - mean * mean) / F.col("n")

    def arm(a, expr):
        return F.max(F.when(F.col("arm") == a, expr))

    w = cells.agg(
        F.sum("n").cast("long").alias("n_total"),
        (arm(1, mean) - arm(0, mean)).alias("diff"),
        (F.lit(_TOST_DELTA_FRAC) * (F.sum("s").cast("double") / F.sum("n"))).alias(
            "delta"
        ),
        F.sqrt(arm(0, vexp) + arm(1, vexp)).alias("se"),
    )
    t = w.select(
        "n_total",
        "diff",
        "delta",
        ((F.col("diff") + F.col("delta")) / F.col("se")).alias("z_lo"),
        ((F.col("delta") - F.col("diff")) / F.col("se")).alias("z_hi"),
    )
    p = F.greatest(1 - _norm_cdf(F.col("z_lo")), 1 - _norm_cdf(F.col("z_hi")))
    return t.select(
        "n_total",
        r6(F.col("diff")).alias("diff_cents"),
        r6(F.col("delta")).alias("delta_cents"),
        r6(p).alias("p_tost"),
        (p < 0.05).alias("equivalent"),
    )


agg_tost_equivalence.__doc__ = agg_tost_equivalence.__doc__.format(
    d=f"{_TOST_DELTA_FRAC:.0%}"
)


@register(
    "agg_cochran_armitage",
    oracle="""
WITH g AS (
  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS a
  FROM orders GROUP BY 1
), t AS (
  SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(a) AS BIGINT) AS at,
         CAST(sum(w * a) AS BIGINT) AS swa, CAST(sum(w * n) AS BIGINT) AS swn,
         CAST(sum(w * w * n) AS BIGINT) AS sw2n
  FROM g
), s AS (
  SELECT nt, at,
         swa - (CAST(at AS DOUBLE) / nt) * swn AS num,
         (CAST(at AS DOUBLE) / nt) * (1 - CAST(at AS DOUBLE) / nt)
           * (sw2n - CAST(swn AS DOUBLE) * swn / nt) AS den
  FROM t
)
SELECT nt AS n, at AS n_pos,
       floor(num / sqrt(den) * 1000000 + 0.5) / 1000000.0 AS z_trend,
       floor(num * num / den * 1000000 + 0.5) / 1000000.0 AS chi2_trend
FROM s
""",
)
def agg_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COCHRAN-ARMITAGE TREND test: does the fully-shipped proportion
    rise or fall MONOTONICALLY with order-priority dose (the leading
    digit 1..5 as the ordinal score)?  The 2×k ordered-categories test
    that ``agg_chi2_independence`` cannot express — chi-square spends
    its power on ANY deviation; CA concentrates it on the linear
    trend, the standard dose-response / severity-gradient check.

    Exactness: all five sufficient statistics (N, A, Σwa, Σwn, Σw²n)
    are exact int64 from ONE conditional-aggregate pass; z and χ² are
    fixed-order closed-form doubles — no fold even needed, the
    rational algebra collapses before any per-stratum division.

    Scale shape: one map-side-combined groupBy to k ≤ 5 rows, then a
    1-row reduction."""
    o = table(spark, sf_dir, "orders")
    g = o.groupBy(
        F.substring("o_orderpriority", 1, 1).cast("long").alias("w")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("long")
        .alias("a"),
    )
    t = g.agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum("a").cast("long").alias("at"),
        F.sum(F.col("w") * F.col("a")).cast("long").alias("swa"),
        F.sum(F.col("w") * F.col("n")).cast("long").alias("swn"),
        F.sum(F.col("w") * F.col("w") * F.col("n")).cast("long").alias("sw2n"),
    )
    pbar = F.col("at").cast("double") / F.col("nt")
    num = F.col("swa") - pbar * F.col("swn")
    den = pbar * (1 - pbar) * (
        F.col("sw2n") - F.col("swn").cast("double") * F.col("swn") / F.col("nt")
    )
    return t.select(
        F.col("nt").alias("n"),
        F.col("at").alias("n_pos"),
        r6(num / F.sqrt(den)).alias("z_trend"),
        r6(num * num / den).alias("chi2_trend"),
    )


@register(
    "agg_mantel_haenszel",
    oracle="""
WITH cells AS (
  SELECT o_orderpriority AS stratum,
         CAST(sum(CASE WHEN o_custkey % 2 = 1 AND o_orderstatus = 'F'
                       THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN o_custkey % 2 = 1 AND o_orderstatus <> 'F'
                       THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(sum(CASE WHEN o_custkey % 2 = 0 AND o_orderstatus = 'F'
                       THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(sum(CASE WHEN o_custkey % 2 = 0 AND o_orderstatus <> 'F'
                       THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
), f AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         list_reduce(
           list_prepend(CAST(0 AS DOUBLE),
             list(CAST(a AS DOUBLE) * d / n ORDER BY stratum)),
           (p, q) -> p + q) AS num,
         list_reduce(
           list_prepend(CAST(0 AS DOUBLE),
             list(CAST(b AS DOUBLE) * c / n ORDER BY stratum)),
           (p, q) -> p + q) AS den
  FROM cells
)
SELECT k,
       floor(num / den * 1000000 + 0.5) / 1000000.0 AS or_mh,
       floor(ln(num / den) * 1000000 + 0.5) / 1000000.0 AS ln_or_mh
FROM f
""",
)
def agg_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANTEL-HAENSZEL pooled odds ratio across order-priority strata
    (exposure = odd customer key, outcome = fully shipped): OR_MH =
    Σ(a_s d_s/n_s) / Σ(b_s c_s/n_s) — the stratified upgrade of
    ``agg_odds_ratio`` that controls the confounder
    ``agg_standardized_rate`` adjusts rates for, and the crude-vs-MH
    gap IS Simpson's paradox when it flips sign.

    Exactness: every stratum's 2×2 cells are exact int64 from one
    conditional pass; the two |strata|-term rational sums fold
    sequentially over the stratum-sorted array (the agg_anova_f
    recipe); the ratio and its log are single closed-form doubles.

    Scale shape: one map-side-combined groupBy to |strata| rows, one
    bounded fold."""
    o = table(spark, sf_dir, "orders")
    exp_ = F.col("o_custkey") % 2 == 1
    out_ = F.col("o_orderstatus") == "F"
    cells = o.groupBy(F.col("o_orderpriority").alias("stratum")).agg(
        F.sum(F.when(exp_ & out_, 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(exp_ & ~out_, 1).otherwise(0)).cast("long").alias("b"),
        F.sum(F.when(~exp_ & out_, 1).otherwise(0)).cast("long").alias("c"),
        F.sum(F.when(~exp_ & ~out_, 1).otherwise(0)).cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    terms = cells.select(
        "stratum",
        (F.col("a").cast("double") * F.col("d") / F.col("n")).alias("tnum"),
        (F.col("b").cast("double") * F.col("c") / F.col("n")).alias("tden"),
    )

    def fold(field):
        return F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("stratum"), F.col(field)))),
                lambda s: s.getField(field),
            ),
            F.lit(0.0),
            lambda p, q: p + q,
        )

    f = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        fold("tnum").alias("num"),
        fold("tden").alias("den"),
    )
    return f.select(
        "k",
        r6(F.col("num") / F.col("den")).alias("or_mh"),
        r6(F.log(F.col("num") / F.col("den"))).alias("ln_or_mh"),
    )


@register(
    "agg_rate_ratio",
    oracle=f"""
WITH arms AS (
  SELECT user_id % 2 AS arm,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
  FROM events GROUP BY 1
), w AS (
  SELECT
    max(CASE WHEN arm = 1 THEN a END) AS a1,
    max(CASE WHEN arm = 0 THEN a END) AS a0,
    max(CASE WHEN arm = 1 THEN n_users END) AS n1,
    max(CASE WHEN arm = 0 THEN n_users END) AS n0
  FROM arms
), t AS (
  SELECT a1, a0, n1, n0,
         ln((CAST(a1 AS DOUBLE) / n1) / (CAST(a0 AS DOUBLE) / n0))
           / sqrt(1.0 / a1 + 1.0 / a0) AS z
  FROM w
)
SELECT a1, a0, n1, n0,
       floor((CAST(a1 AS DOUBLE) / n1) / (CAST(a0 AS DOUBLE) / n0)
             * 1000000 + 0.5) / 1000000.0 AS rate_ratio,
       floor(z * 1000000 + 0.5) / 1000000.0 AS z,
       floor(2 * (1 - {_norm_cdf_sql("abs(z)")}) * 1000000 + 0.5)
         / 1000000.0 AS p
FROM t
""",
)
def agg_rate_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON RATE-RATIO test: purchases per user between the parity
    arms, RR with the log-rate-ratio z (SE = √(1/a₁+1/a₀)) and a
    two-sided p through the shared A&S normal CDF — the count-outcome
    sibling of ``agg_ab_test``'s value comparison and ``agg_did``'s
    panel contrast (conversions, errors, tickets: anything Poisson-ish
    per exposure unit).

    Exactness: event counts and distinct-user exposures are exact
    int64 from one pass; RR, z and p are fixed-order closed-form
    doubles through the engine-identical CDF polynomial.

    Scale shape: one groupBy to 2 rows (the distinct-user count is the
    one shuffle-bearing aggregate; approx_count_distinct is the
    documented 100 TB swap), then projection."""
    ev = table(spark, sf_dir, "events")
    arms = ev.groupBy((F.col("user_id") % 2).alias("arm")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )

    def arm(x, expr):
        return F.max(F.when(F.col("arm") == x, expr))

    w = arms.agg(
        arm(1, F.col("a")).alias("a1"),
        arm(0, F.col("a")).alias("a0"),
        arm(1, F.col("n_users")).alias("n1"),
        arm(0, F.col("n_users")).alias("n0"),
    )
    rr = (F.col("a1").cast("double") / F.col("n1")) / (
        F.col("a0").cast("double") / F.col("n0")
    )
    z = F.log(rr) / F.sqrt(1.0 / F.col("a1") + 1.0 / F.col("a0"))
    t = w.select("a1", "a0", "n1", "n0", z.alias("z"), rr.alias("rr"))
    return t.select(
        "a1",
        "a0",
        "n1",
        "n0",
        r6(F.col("rr")).alias("rate_ratio"),
        r6(F.col("z")).alias("z"),
        r6(2 * (1 - _norm_cdf(F.abs(F.col("z"))))).alias("p"),
    )


@register(
    "agg_overdispersion",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS k
  FROM events GROUP BY 1
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(k) AS BIGINT) AS s, CAST(sum(k * k) AS BIGINT) AS sq
  FROM per_user
), t AS (
  SELECT n,
         (CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)
           / (CAST(s AS DOUBLE) / n) AS d
  FROM m
)
SELECT n,
       floor(d * 1000000 + 0.5) / 1000000.0 AS dispersion,
       floor((d - 1) * sqrt((n - 1) / 2.0) * 1000000 + 0.5) / 1000000.0 AS z,
       d > 1.5 AS overdispersed
FROM t
""",
)
def agg_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON OVERDISPERSION check on per-user purchase counts: the
    dispersion index D = s²/x̄ with its normal-approximation z
    ((D−1)·√((n−1)/2)) — the assumption audit in front of
    ``agg_rate_ratio`` (a Poisson rate test under-states uncertainty
    exactly when D ≫ 1, the usual web reality of a few power users; a
    flagged D says use the negative-binomial/bootstrap path, i.e.
    ``agg_bootstrap_ci``).

    Exactness: per-user counts, n, Σk, Σk² are exact int64; D and z
    are fixed-order closed-form doubles; the flag compares identical
    doubles to the same literal.

    Scale shape: one user-keyed groupBy (map-side combined), one 1-row
    moment aggregate, projection."""
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("k")
    )
    m = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("k").cast("long").alias("s"),
        F.sum(F.col("k") * F.col("k")).cast("long").alias("sq"),
    )
    d = (
        (F.col("sq").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n"))
        / (F.col("n") - 1)
        / (F.col("s").cast("double") / F.col("n"))
    )
    t = m.select("n", d.alias("d"))
    return t.select(
        "n",
        r6(F.col("d")).alias("dispersion"),
        r6((F.col("d") - 1) * F.sqrt((F.col("n") - 1) / F.lit(2.0))).alias("z"),
        (F.col("d") > 1.5).alias("overdispersed"),
    )


@register(
    "agg_capture_recapture",
    oracle="""
WITH s1 AS (
  SELECT DISTINCT user_id FROM events WHERE event_id % 7 = 0
), s2 AS (
  SELECT DISTINCT user_id FROM events WHERE event_id % 11 = 0
), t AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n1,
         (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n2,
         (SELECT CAST(count(*) AS BIGINT)
          FROM s1 JOIN s2 ON s1.user_id = s2.user_id) AS m,
         (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events) AS true_n
)
SELECT n1, n2, m, true_n,
       CAST(floor(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1) - 1) AS BIGINT)
         AS chapman_estimate,
       floor((CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1) - 1)
             / true_n * 1000000 + 0.5) / 1000000.0 AS estimate_ratio
FROM t
""",
)
def agg_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPTURE-RECAPTURE (Chapman) population estimate: two
    deterministic event samples "capture" user sets, and the overlap
    estimates the TOTAL distinct-user population as
    N̂ = (n₁+1)(n₂+1)/(m+1) − 1 — the ecology estimator that doubles as
    a dedup/cardinality audit (how many distinct entities exist when a
    full scan is unaffordable — estimate from two cheap overlapping
    samples; ``agg_approx_distinct``/``ext_kmv_intersection`` sketch
    the same question from the data itself, Chapman answers it from
    SAMPLING overlap, and the ratio column scores it against the true
    count here).

    Exactness: sample sizes, the overlap (a user-keyed semi-ish join)
    and the true count are exact int64; the estimate is one closed-
    form double floored identically both engines.

    Scale shape: two distinct-projections + one key join + one exact
    distinct (documented approx_count_distinct swap); all 1-row
    combines are broadcasts."""
    ev = table(spark, sf_dir, "events")
    s1 = ev.filter(F.col("event_id") % 7 == 0).select("user_id").distinct()
    s2 = ev.filter(F.col("event_id") % 11 == 0).select("user_id").distinct()
    n1 = s1.agg(F.count(F.lit(1)).cast("long").alias("n1"))
    n2 = s2.agg(F.count(F.lit(1)).cast("long").alias("n2"))
    m = s1.join(s2, "user_id").agg(F.count(F.lit(1)).cast("long").alias("m"))
    true_n = ev.agg(F.countDistinct("user_id").cast("long").alias("true_n"))
    t = (
        n1.crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(true_n))
    )
    est = (F.col("n1") + 1).cast("double") * (F.col("n2") + 1) / (F.col("m") + 1) - 1
    return t.select(
        "n1",
        "n2",
        "m",
        "true_n",
        F.floor(est).cast("long").alias("chapman_estimate"),
        r6(est / F.col("true_n")).alias("estimate_ratio"),
    )


@register(
    "agg_effect_size",
    oracle="""
WITH g AS (
  SELECT event_type AS grp,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv,
         CAST(sum(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sq
  FROM events WHERE event_type IN ('purchase', 'view') GROUP BY 1
), w AS (
  SELECT
    max(CASE WHEN grp = 'purchase' THEN n END) AS na,
    max(CASE WHEN grp = 'view' THEN n END) AS nb,
    CAST(max(CASE WHEN grp = 'purchase' THEN sv END) AS DOUBLE)
      / max(CASE WHEN grp = 'purchase' THEN n END) AS ma,
    CAST(max(CASE WHEN grp = 'view' THEN sv END) AS DOUBLE)
      / max(CASE WHEN grp = 'view' THEN n END) AS mb,
    (CAST(max(CASE WHEN grp = 'purchase' THEN sq END) AS DOUBLE)
     - max(CASE WHEN grp = 'purchase' THEN n END)
       * ((CAST(max(CASE WHEN grp = 'purchase' THEN sv END) AS DOUBLE)
           / max(CASE WHEN grp = 'purchase' THEN n END))
          * (CAST(max(CASE WHEN grp = 'purchase' THEN sv END) AS DOUBLE)
             / max(CASE WHEN grp = 'purchase' THEN n END))))
      / (max(CASE WHEN grp = 'purchase' THEN n END) - 1) AS va,
    (CAST(max(CASE WHEN grp = 'view' THEN sq END) AS DOUBLE)
     - max(CASE WHEN grp = 'view' THEN n END)
       * ((CAST(max(CASE WHEN grp = 'view' THEN sv END) AS DOUBLE)
           / max(CASE WHEN grp = 'view' THEN n END))
          * (CAST(max(CASE WHEN grp = 'view' THEN sv END) AS DOUBLE)
             / max(CASE WHEN grp = 'view' THEN n END))))
      / (max(CASE WHEN grp = 'view' THEN n END) - 1) AS vb
  FROM g
)
SELECT na, nb,
       floor((ma - mb)
             / sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2))
             * 1000000 + 0.5) / 1000000.0 AS cohens_d,
       floor((ma - mb)
             / sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2))
             * (1.0 - 3.0 / (4.0 * (na + nb) - 9.0))
             * 1000000 + 0.5) / 1000000.0 AS hedges_g,
       floor((ma - mb) / sqrt(vb) * 1000000 + 0.5) / 1000000.0
         AS glass_delta
FROM w
""",
)
def agg_effect_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STANDARDIZED EFFECT SIZES between purchase and view event values
    — the magnitude report the test battery (``agg_welch_t`` /
    ``agg_yuen_trimmed_t`` / ``agg_tost_equivalence``) needs beside its
    p-values (Cohen 1988: significance says "not noise", effect size
    says "how much"): Cohen's d on the pooled SD, Hedges' g with the
    small-sample bias correction 1 - 3/(4N - 9) (Hedges 1981), and
    Glass's delta on the control (view) SD for when variances differ by
    treatment.

    Same discipline as ``agg_welch_t``: every moment is an exact
    integer cents sum from ONE map-side-combined aggregate (cents
    cancel in mean-difference / SD, so the ratios are unit-free by
    construction); the three ratios are closed-form doubles evaluated
    in identical order both engines.  One scan, a 2-row aggregate, a
    1-row report at any corpus size."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    c = F.round(F.col("value") * 100).cast("long")
    g = ev.groupBy(F.col("event_type").alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(c).cast("long").alias("sv"),
        F.sum(c * c).cast("long").alias("sq"),
    )

    def pick(col):
        return {
            k: F.max(F.when(F.col("grp") == k, F.col(col)))
            for k in ("purchase", "view")
        }

    n_, sv_, sq_ = pick("n"), pick("sv"), pick("sq")

    def var(k):
        mean = sv_[k].cast("double") / n_[k]
        return (sq_[k].cast("double") - n_[k] * (mean * mean)) / (n_[k] - 1)

    w = g.agg(
        n_["purchase"].alias("na"),
        n_["view"].alias("nb"),
        (sv_["purchase"].cast("double") / n_["purchase"]).alias("ma"),
        (sv_["view"].cast("double") / n_["view"]).alias("mb"),
        var("purchase").alias("va"),
        var("view").alias("vb"),
    )
    pooled = F.sqrt(
        ((F.col("na") - 1) * F.col("va") + (F.col("nb") - 1) * F.col("vb"))
        / (F.col("na") + F.col("nb") - 2)
    )
    d = (F.col("ma") - F.col("mb")) / pooled
    corr = F.lit(1.0) - 3.0 / (4.0 * (F.col("na") + F.col("nb")) - 9.0)
    glass = (F.col("ma") - F.col("mb")) / F.sqrt(F.col("vb"))
    q6 = lambda x: F.floor(x * 1000000 + 0.5) / 1000000.0  # noqa: E731
    return w.select(
        "na",
        "nb",
        q6(d).alias("cohens_d"),
        q6(d * corr).alias("hedges_g"),
        q6(glass).alias("glass_delta"),
    )


def _lnf_attach_once(t: DataFrame, lfx: DataFrame, lookups: dict) -> DataFrame:
    """Attach every ln-factorial lookup with ONE broadcast join instead of
    one join per lookup (guide §2.4 "remove shuffles outright" / §3.1 —
    nine separate BroadcastHashJoins each rebuilt and re-shipped the full
    grid-sized hash relation, which dominated agg_bayes_ab once the grid
    grew to cover sf1): unpivot the lookup indices to (term-row, which, k)
    rows, probe the broadcast grid once, and pivot back to the named
    columns with max(when(...)) so the downstream ``lnt`` expression tree
    — and therefore every double — is unchanged.  Whenever the overflow
    guard passed, every index lies in [0, grid], so the single inner probe
    matches each unpivoted row exactly as the per-lookup inner joins did
    (and an out-of-grid index still yields the guarded abort, not a
    silent truncation, because the guard column is part of *t*)."""
    names = list(lookups)
    base_cols = list(t.columns)
    wk = F.explode(
        F.array(
            *[
                F.struct(F.lit(i).alias("w"), expr.cast("long").alias("k"))
                for i, expr in enumerate(lookups.values())
            ]
        )
    ).alias("wk")
    e = t.select(*base_cols, wk).join(
        F.broadcast(lfx.select(F.col("k").alias("_lnf_k"), "lnf")),
        F.col("wk.k") == F.col("_lnf_k"),
    )
    return e.groupBy(*base_cols).agg(
        *[
            F.max(F.when(F.col("wk.w") == i, F.col("lnf"))).alias(name)
            for i, name in enumerate(names)
        ]
    )


_BAYES_GRID = 1_100_000  # lnfact grid bound.  The largest lgamma argument
# is alpha_a + alpha_b + beta_a + beta_b - 2 = total events + 2, so this
# covers sf<=1 (1M events) with headroom; beyond it BOTH engines raise
# loudly (see the guards below) instead of silently dropping sum terms —
# found live: the 250k grid's guard correctly killed an sf1 bench attempt,
# and the grid itself costs one parameter-sized cumulative-sum pass.


@register(
    "agg_bayes_ab",
    oracle=f"""
WITH g AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS grp,
         CAST(count(*) AS BIGINT) AS trials,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS conv
  FROM events GROUP BY 1
), p AS (
  SELECT max(CASE WHEN grp = 'a' THEN conv END) + 1 AS aa,
         max(CASE WHEN grp = 'a' THEN trials - conv END) + 1 AS ba,
         max(CASE WHEN grp = 'b' THEN conv END) + 1 AS ab,
         max(CASE WHEN grp = 'b' THEN trials - conv END) + 1 AS bb
  FROM g
), lf AS (
  SELECT k, sum(ln(CAST(k AS DOUBLE))) OVER (ORDER BY k) AS lnf
  FROM (SELECT unnest(generate_series(1, {_BAYES_GRID})) AS k)
), lfx AS (SELECT k, lnf FROM lf UNION ALL SELECT 0, 0.0),
terms AS (
  SELECT p.aa, p.ba, p.ab, p.bb, i.i,
         (l1.lnf + l2.lnf - l3.lnf)                  -- lnB(aa+i, ba+bb)
         - ln(CAST(p.bb + i.i AS DOUBLE))
         - (l4.lnf + l5.lnf - l6.lnf)                -- lnB(1+i, bb)
         - (l7.lnf + l8.lnf - l9.lnf) AS lnt         -- lnB(aa, ba)
  FROM p,
       (SELECT unnest(generate_series(0, {_BAYES_GRID})) AS i) i,
       lfx l1, lfx l2, lfx l3, lfx l4, lfx l5, lfx l6, lfx l7, lfx l8, lfx l9
  WHERE i.i < p.ab
    AND l1.k = p.aa + i.i - 1 AND l2.k = p.ba + p.bb - 1
    AND l3.k = p.aa + i.i + p.ba + p.bb - 1
    AND l4.k = i.i AND l5.k = p.bb - 1 AND l6.k = i.i + p.bb
    AND l7.k = p.aa - 1 AND l8.k = p.ba - 1 AND l9.k = p.aa + p.ba - 1
)
SELECT CAST(aa AS BIGINT) AS alpha_posterior_a,
       CAST(ba AS BIGINT) AS beta_posterior_a,
       CAST(ab AS BIGINT) AS alpha_posterior_b,
       CAST(bb AS BIGINT) AS beta_posterior_b,
       floor(sum(exp(lnt)) * 10000 + 0.5) / 10000.0 AS prob_b_beats_a
FROM terms GROUP BY 1, 2, 3, 4
UNION ALL
-- Reachable overflow guard (round-14 review): a guard INSIDE the main
-- SELECT can never fire — past the grid the large-index lnfact equality
-- joins drop rows, so that SELECT aggregates an empty-or-partial `terms`
-- (when aa+ab+ba+bb-2 only slightly exceeds the grid, the small-i rows
-- still join and the sum is silently TRUNCATED, not empty).  Either way
-- this UNION ALL branch evaluates error() whenever the posterior
-- outgrows the grid, aborting the whole query before the main branch's
-- empty/truncated result can be returned.
SELECT error('agg_bayes_ab: lnfact grid too small for this corpus — raise _BAYES_GRID'),
       CAST(ba AS BIGINT), CAST(ab AS BIGINT), CAST(bb AS BIGINT), 0.0
FROM p WHERE aa + ab + ba + bb - 2 > {_BAYES_GRID}
""",
)
def agg_bayes_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT BAYESIAN A/B PROBABILITY P(p_B > p_A | data) for the
    purchase-conversion rates of the even/odd user halves, under
    independent Beta(1,1) priors — the closed-form sum
    ``Σ_{{i=0}}^{{α_B−1}} B(α_A+i, β_A+β_B) / ((β_B+i)·B(1+i, β_B)·
    B(α_A, β_A))`` (the standard exact evaluation of the Beta-Binomial
    posterior comparison; e.g. Cook's derivation of
    ``P(X>Y)`` for Beta variables).  The Bayesian partner of
    ``agg_ab_test``: a posterior probability you can act on instead of
    a p-value.

    Cross-engine float discipline: every Gamma-function value comes
    from ONE shared ln-factorial grid — ``lgamma(n) = Σ_{{k<n}} ln k``
    as a window cumulative sum over k = 1..{g}, evaluated in the
    identical ascending order in both engines — so the log-Beta terms
    are identical expression trees, and the final Σ exp(·) rounds to
    4 decimals (the ext_dsir_sample discipline).  The grid and the
    term list are PARAMETER-sized (posterior α, not corpus rows): the
    corpus contributes only one map-side-combined count aggregate; the
    single-partition window on the grid is bounded at {g} rows at any
    corpus size."""
    ev = table(spark, sf_dir, "events")
    g = ev.groupBy(
        F.when(F.col("user_id") % 2 == 0, "a").otherwise("b").alias("grp")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("trials"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).cast("long").alias("conv"),
    )
    p0 = g.agg(
        (F.max(F.when(F.col("grp") == "a", F.col("conv"))) + 1).alias("aa"),
        (
            F.max(F.when(F.col("grp") == "a", F.col("trials") - F.col("conv")))
            + 1
        ).alias("ba"),
        (F.max(F.when(F.col("grp") == "b", F.col("conv"))) + 1).alias("ab"),
        (
            F.max(F.when(F.col("grp") == "b", F.col("trials") - F.col("conv")))
            + 1
        ).alias("bb"),
    )
    # Loud overflow guard (both engines have one): a silent grid miss
    # would DROP sum terms and underestimate the probability.
    p = p0.select(
        "aa",
        "ba",
        "ab",
        F.when(
            F.col("aa") + F.col("ab") + F.col("ba") + F.col("bb") - 2
            > _BAYES_GRID,
            F.raise_error(
                "agg_bayes_ab: lnfact grid too small for this corpus — "
                "raise _BAYES_GRID"
            ).cast("long"),
        ).otherwise(F.col("bb")).alias("bb"),
    )
    lf = (
        spark.range(1, _BAYES_GRID + 1)
        .select(
            F.col("id").alias("k"),
            F.sum(F.log(F.col("id").cast("double"))).over(
                Window.orderBy("id").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ).alias("lnf"),
        )
    )
    lfx = lf.unionAll(
        spark.createDataFrame([(0, 0.0)], "k long, lnf double")
    )

    grid = spark.range(0, _BAYES_GRID + 1).select(F.col("id").alias("i"))
    t = grid.crossJoin(F.broadcast(p)).filter(F.col("i") < F.col("ab"))
    lookups = {
        "l1": F.col("aa") + F.col("i") - 1,
        "l2": F.col("ba") + F.col("bb") - 1,
        "l3": F.col("aa") + F.col("i") + F.col("ba") + F.col("bb") - 1,
        "l4": F.col("i"),
        "l5": F.col("bb") - 1,
        "l6": F.col("i") + F.col("bb"),
        "l7": F.col("aa") - 1,
        "l8": F.col("ba") - 1,
        "l9": F.col("aa") + F.col("ba") - 1,
    }
    # ONE broadcast join for all nine lookups (was nine grid-sized
    # broadcast builds — see _lnf_attach_once); the lfx localCheckpoint
    # went with them: a single consumer evaluates the grid window once
    # inside the one broadcast build.
    t = _lnf_attach_once(t, lfx, lookups)
    lnt = (
        (F.col("l1") + F.col("l2") - F.col("l3"))
        - F.log((F.col("bb") + F.col("i")).cast("double"))
        - (F.col("l4") + F.col("l5") - F.col("l6"))
        - (F.col("l7") + F.col("l8") - F.col("l9"))
    )
    return (
        t.select("aa", "ba", "ab", "bb", F.exp(lnt).alias("term"))
        .groupBy("aa", "ba", "ab", "bb")
        .agg((F.floor(F.sum("term") * 10000 + 0.5) / 10000.0).alias("prob_b_beats_a"))
        .select(
            F.col("aa").cast("long").alias("alpha_posterior_a"),
            F.col("ba").cast("long").alias("beta_posterior_a"),
            F.col("ab").cast("long").alias("alpha_posterior_b"),
            F.col("bb").cast("long").alias("beta_posterior_b"),
            "prob_b_beats_a",
        )
    )


agg_bayes_ab.__doc__ = agg_bayes_ab.__doc__.format(g=_BAYES_GRID)


@register(
    "agg_anova_two_way",
    oracle="""
WITH cells AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END AS fa,
         CASE WHEN hour(ts) < 12 THEN 1 ELSE -1 END AS fb,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv,
         CAST(sum(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sq
  FROM events WHERE event_type IN ('purchase', 'view') GROUP BY 1, 2
), w AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_total,
         sum(CAST(sq AS DOUBLE)
             - CAST(sv AS DOUBLE) * sv / n) AS ssw,
         sum(fa * (CAST(sv AS DOUBLE) / n)) AS psi_a,
         sum(fb * (CAST(sv AS DOUBLE) / n)) AS psi_b,
         sum(fa * fb * (CAST(sv AS DOUBLE) / n)) AS psi_ab,
         sum(1.0 / n) AS inv_n
  FROM cells
)
SELECT n_total,
       floor((psi_a * psi_a / inv_n) / (ssw / (n_total - 4))
             * 1000000 + 0.5) / 1000000.0 AS f_type,
       floor((psi_b * psi_b / inv_n) / (ssw / (n_total - 4))
             * 1000000 + 0.5) / 1000000.0 AS f_ampm,
       floor((psi_ab * psi_ab / inv_n) / (ssw / (n_total - 4))
             * 1000000 + 0.5) / 1000000.0 AS f_interaction
FROM w
""",
)
def agg_anova_two_way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-WAY ANOVA (2x2, Type III via single-df cell-mean contrasts)
    on event value: factor A = event_type (purchase vs view), factor
    B = time of day (AM vs PM) — main effects AND the interaction the
    one-way battery (``agg_anova_f``) cannot see (does the purchase
    premium itself change between AM and PM?).

    For a 2x2 design every Type III effect is a single-df contrast
    psi = sum c_ij * mean_ij with c in {+1,-1}, whose exact sum of
    squares is psi^2 / sum(c_ij^2 / n_ij) = psi^2 / sum(1/n_ij) — the
    textbook cell-means formulation that stays CLOSED-FORM under
    unbalanced cells (where the classical balanced SS formulas break).
    F = SS_effect / (SSW / (N - 4)).

    Exactness: cell moments are exact integer cents from ONE 4-row
    map-side-combined aggregate; psi / SSW / the three F ratios are
    closed-form doubles evaluated in identical order both engines.
    One scan, a 4-row combine, a 1-row report at any corpus size."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    c = F.round(F.col("value") * 100).cast("long")
    cells = ev.groupBy(
        F.when(F.col("event_type") == "purchase", 1).otherwise(-1).alias("fa"),
        F.when(F.hour("ts") < 12, 1).otherwise(-1).alias("fb"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(c).cast("long").alias("sv"),
        F.sum(c * c).cast("long").alias("sq"),
    )
    mean = F.col("sv").cast("double") / F.col("n")
    w = cells.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.sum(
            F.col("sq").cast("double")
            - F.col("sv").cast("double") * F.col("sv") / F.col("n")
        ).alias("ssw"),
        F.sum(F.col("fa") * mean).alias("psi_a"),
        F.sum(F.col("fb") * mean).alias("psi_b"),
        F.sum(F.col("fa") * F.col("fb") * mean).alias("psi_ab"),
        F.sum(F.lit(1.0) / F.col("n")).alias("inv_n"),
    )
    msw = F.col("ssw") / (F.col("n_total") - 4)

    def f_of(psi):
        return r6((psi * psi / F.col("inv_n")) / msw)

    return w.select(
        "n_total",
        f_of(F.col("psi_a")).alias("f_type"),
        f_of(F.col("psi_b")).alias("f_ampm"),
        f_of(F.col("psi_ab")).alias("f_interaction"),
    )


@register(
    "agg_tukey_hsd",
    oracle="""
WITH g AS (
  SELECT event_type AS grp,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv,
         CAST(sum(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sq
  FROM events GROUP BY 1
), m AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_total,
         CAST(count(*) AS BIGINT) AS k,
         sum(CAST(sq AS DOUBLE) - CAST(sv AS DOUBLE) * sv / n)
           / (sum(n) - count(*)) AS msw
  FROM g
)
SELECT a.grp AS grp_a, b.grp AS grp_b, a.n AS na, b.n AS nb,
       floor((CAST(a.sv AS DOUBLE) / a.n - CAST(b.sv AS DOUBLE) / b.n)
             * 1000000 + 0.5) / 1000000.0 AS mean_diff_cents,
       floor(abs(CAST(a.sv AS DOUBLE) / a.n - CAST(b.sv AS DOUBLE) / b.n)
             / sqrt(m.msw / 2 * (1.0 / a.n + 1.0 / b.n))
             * 1000000 + 0.5) / 1000000.0 AS q_stat
FROM g a JOIN g b ON a.grp < b.grp CROSS JOIN m
ORDER BY grp_a, grp_b
""",
)
def agg_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TUKEY-KRAMER HSD pairwise comparisons across ALL event types —
    the post-hoc step after ``agg_anova_f`` rejects: for each of the
    k(k-1)/2 type pairs, the mean difference and the studentized-range
    statistic q = |m_a - m_b| / sqrt(MSW/2 * (1/n_a + 1/n_b)) (the
    Kramer form for unbalanced groups), so WHICH pairs differ is
    answerable, not just "something differs".

    Exactness: group moments are exact integer cents from one k-row
    aggregate; MSW is the pooled within variance from the same exact
    sums; each pair's q is a closed-form double in identical order both
    engines.  The pair join is k x k over a k-row frame (broadcast,
    k = |event types|); one corpus scan total."""
    ev = table(spark, sf_dir, "events")
    c = F.round(F.col("value") * 100).cast("long")
    # k-row group-moment frame with three consumers (MSW + both pair
    # sides) — one corpus scan, materialized once (guide §2.4).
    g = (
        ev.groupBy(F.col("event_type").alias("grp"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(c).cast("long").alias("sv"),
            F.sum(c * c).cast("long").alias("sq"),
        )
        .localCheckpoint(eager=True)
    )
    m = g.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("k"),
        (
            F.sum(
                F.col("sq").cast("double")
                - F.col("sv").cast("double") * F.col("sv") / F.col("n")
            )
            / (F.sum("n") - F.count(F.lit(1)))
        ).alias("msw"),
    )
    a = g.select(
        F.col("grp").alias("grp_a"),
        F.col("n").alias("na"),
        F.col("sv").alias("sva"),
    )
    b = g.select(
        F.col("grp").alias("grp_b"),
        F.col("n").alias("nb"),
        F.col("sv").alias("svb"),
    )
    pairs = (
        a.join(F.broadcast(b), F.col("grp_a") < F.col("grp_b"))
        .crossJoin(F.broadcast(m))
    )
    ma = F.col("sva").cast("double") / F.col("na")
    mb = F.col("svb").cast("double") / F.col("nb")
    q = F.abs(ma - mb) / F.sqrt(
        F.col("msw") / 2 * (F.lit(1.0) / F.col("na") + F.lit(1.0) / F.col("nb"))
    )
    return pairs.select(
        "grp_a",
        "grp_b",
        "na",
        "nb",
        r6(ma - mb).alias("mean_diff_cents"),
        r6(q).alias("q_stat"),
    ).orderBy("grp_a", "grp_b")


# Shared moment CTE for the lineitem regression pair below: x1 = quantity
# (integer 1..50 by construction), x2 = discount in whole percent
# (round(l_discount*100), integer 0..10), y = extendedprice in whole
# dollars (round(l_extendedprice), <= ~105k) — dollars, not cents, so the
# int64 second moments hold headroom far past sf1 (y^2 <= ~1.2e10, times
# 6e6 rows at sf1 = ~7e16 << 2^63).
_REG_MOMENTS_SQL = """
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx1,
         CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS sx2,
         CAST(sum(CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT) AS sy,
         CAST(sum(CAST(l_quantity AS BIGINT)
                  * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx1x1,
         CAST(sum(CAST(round(l_discount * 100) AS BIGINT)
                  * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS sx2x2,
         CAST(sum(CAST(round(l_extendedprice) AS BIGINT)
                  * CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT) AS syy,
         CAST(sum(CAST(l_quantity AS BIGINT)
                  * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS sx1x2,
         CAST(sum(CAST(l_quantity AS BIGINT)
                  * CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT) AS sx1y,
         CAST(sum(CAST(round(l_discount * 100) AS BIGINT)
                  * CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT) AS sx2y
  FROM lineitem
"""


def _reg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark twin of ``_REG_MOMENTS_SQL``: one map-side-combined
    1-row aggregate of every first/second moment of (quantity,
    discount-pct, price-dollars), all exact int64."""
    li = table(spark, sf_dir, "lineitem")
    x1 = F.col("l_quantity").cast("long")
    x2 = F.round(F.col("l_discount") * 100).cast("long")
    y = F.round(F.col("l_extendedprice")).cast("long")
    return li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x1).cast("long").alias("sx1"),
        F.sum(x2).cast("long").alias("sx2"),
        F.sum(y).cast("long").alias("sy"),
        F.sum(x1 * x1).cast("long").alias("sx1x1"),
        F.sum(x2 * x2).cast("long").alias("sx2x2"),
        F.sum(y * y).cast("long").alias("syy"),
        F.sum(x1 * x2).cast("long").alias("sx1x2"),
        F.sum(x1 * y).cast("long").alias("sx1y"),
        F.sum(x2 * y).cast("long").alias("sx2y"),
    )


@register(
    "agg_partial_corr",
    oracle=f"""
WITH m AS ({_REG_MOMENTS_SQL}
), r AS (
  SELECT n,
         (n * CAST(sx1y AS DOUBLE) - CAST(sx1 AS DOUBLE) * sy)
           / sqrt((n * CAST(sx1x1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * sx1)
                  * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)) AS r_xy,
         (n * CAST(sx1x2 AS DOUBLE) - CAST(sx1 AS DOUBLE) * sx2)
           / sqrt((n * CAST(sx1x1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * sx1)
                  * (n * CAST(sx2x2 AS DOUBLE) - CAST(sx2 AS DOUBLE) * sx2)) AS r_xz,
         (n * CAST(sx2y AS DOUBLE) - CAST(sx2 AS DOUBLE) * sy)
           / sqrt((n * CAST(sx2x2 AS DOUBLE) - CAST(sx2 AS DOUBLE) * sx2)
                  * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)) AS r_zy
  FROM m
)
SELECT n,
       floor(r_xy * 1000000 + 0.5) / 1000000.0 AS r_qty_price,
       floor(r_xz * 1000000 + 0.5) / 1000000.0 AS r_qty_disc,
       floor(r_zy * 1000000 + 0.5) / 1000000.0 AS r_disc_price,
       floor((r_xy - r_xz * r_zy)
             / sqrt((1 - r_xz * r_xz) * (1 - r_zy * r_zy))
             * 1000000 + 0.5) / 1000000.0 AS partial_r_qty_price
FROM r
""",
)
def agg_partial_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST-ORDER PARTIAL CORRELATION r(quantity, price | discount) on
    lineitem — the quantity-price association with the discount channel
    partialled out via the classic recursion r_xy.z = (r_xy - r_xz
    r_zy) / sqrt((1-r_xz^2)(1-r_zy^2)) — the confounder-adjusted
    readout ``agg_corr_matrix``'s raw pairwise cells cannot give (a
    shared driver inflates/deflates raw r).

    Exactness: all nine first/second moments are exact int64 from ONE
    1-row map-side-combined aggregate (quantity and discount-pct are
    small integers by construction; price in whole dollars keeps y^2
    sums inside int64 past sf1); the three Pearson r's and the partial
    recursion are closed-form doubles in identical order both engines.
    One scan, zero shuffles beyond the 1-row combine."""
    m = _reg_moments(spark, sf_dir)
    n = F.col("n")

    def pearson(sab, sa, sb, saa, sbb):
        return (n * F.col(sab).cast("double") - F.col(sa).cast("double") * F.col(sb)) / F.sqrt(
            (n * F.col(saa).cast("double") - F.col(sa).cast("double") * F.col(sa))
            * (n * F.col(sbb).cast("double") - F.col(sb).cast("double") * F.col(sb))
        )

    r = m.select(
        "n",
        pearson("sx1y", "sx1", "sy", "sx1x1", "syy").alias("r_xy"),
        pearson("sx1x2", "sx1", "sx2", "sx1x1", "sx2x2").alias("r_xz"),
        pearson("sx2y", "sx2", "sy", "sx2x2", "syy").alias("r_zy"),
    )
    partial = (F.col("r_xy") - F.col("r_xz") * F.col("r_zy")) / F.sqrt(
        (1 - F.col("r_xz") * F.col("r_xz")) * (1 - F.col("r_zy") * F.col("r_zy"))
    )
    return r.select(
        "n",
        r6(F.col("r_xy")).alias("r_qty_price"),
        r6(F.col("r_xz")).alias("r_qty_disc"),
        r6(F.col("r_zy")).alias("r_disc_price"),
        r6(partial).alias("partial_r_qty_price"),
    )


@register(
    "agg_ols_multi",
    oracle=f"""
WITH m AS ({_REG_MOMENTS_SQL}
), c AS (
  SELECT n,
         CAST(sx1 AS DOUBLE) / n AS mx1,
         CAST(sx2 AS DOUBLE) / n AS mx2,
         CAST(sy AS DOUBLE) / n AS my,
         CAST(sx1x1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * sx1 / n AS s11,
         CAST(sx2x2 AS DOUBLE) - CAST(sx2 AS DOUBLE) * sx2 / n AS s22,
         CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n AS syy_c,
         CAST(sx1x2 AS DOUBLE) - CAST(sx1 AS DOUBLE) * sx2 / n AS s12,
         CAST(sx1y AS DOUBLE) - CAST(sx1 AS DOUBLE) * sy / n AS s1y,
         CAST(sx2y AS DOUBLE) - CAST(sx2 AS DOUBLE) * sy / n AS s2y
  FROM m
), b AS (
  SELECT n, mx1, mx2, my, syy_c, s1y, s2y,
         (s1y * s22 - s2y * s12) / (s11 * s22 - s12 * s12) AS b1,
         (s2y * s11 - s1y * s12) / (s11 * s22 - s12 * s12) AS b2
  FROM c
)
SELECT n,
       floor((my - b1 * mx1 - b2 * mx2) * 1000000 + 0.5) / 1000000.0
         AS beta0,
       floor(b1 * 1000000 + 0.5) / 1000000.0 AS beta_qty,
       floor(b2 * 1000000 + 0.5) / 1000000.0 AS beta_disc,
       floor((b1 * s1y + b2 * s2y) / syy_c * 1000000 + 0.5) / 1000000.0
         AS r2,
       floor(((b1 * s1y + b2 * s2y) / 2)
             / ((syy_c - (b1 * s1y + b2 * s2y)) / (n - 3))
             * 1000000 + 0.5) / 1000000.0 AS f_stat
FROM b
""",
)
def agg_ols_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTIPLE LINEAR REGRESSION (two regressors, closed-form normal
    equations): price-dollars ~ quantity + discount-pct on lineitem —
    betas via the 2x2 Cramer solve over centered moments, R^2, and the
    overall F — the multi-predictor step past ``agg_trend_ols`` (one
    regressor), giving each predictor's effect HOLDING THE OTHER FIXED
    (the regression twin of ``agg_partial_corr``).

    b = S^-1 s: b1 = (S1y S22 - S2y S12)/det, b2 = (S2y S11 - S1y
    S12)/det, b0 = mean residual; SSR = b1 S1y + b2 S2y; F = (SSR/2) /
    ((SST-SSR)/(n-3)).  Same moment discipline as ``agg_partial_corr``
    (shared exact-int64 1-row aggregate); all derived quantities are
    closed-form doubles in identical order both engines.  One scan,
    zero shuffles beyond the 1-row combine — at 100 TB this is the
    map-side-combine ideal."""
    m = _reg_moments(spark, sf_dir)
    n = F.col("n")
    c = m.select(
        "n",
        (F.col("sx1").cast("double") / n).alias("mx1"),
        (F.col("sx2").cast("double") / n).alias("mx2"),
        (F.col("sy").cast("double") / n).alias("my"),
        (F.col("sx1x1").cast("double") - F.col("sx1").cast("double") * F.col("sx1") / n).alias("s11"),
        (F.col("sx2x2").cast("double") - F.col("sx2").cast("double") * F.col("sx2") / n).alias("s22"),
        (F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / n).alias("syy_c"),
        (F.col("sx1x2").cast("double") - F.col("sx1").cast("double") * F.col("sx2") / n).alias("s12"),
        (F.col("sx1y").cast("double") - F.col("sx1").cast("double") * F.col("sy") / n).alias("s1y"),
        (F.col("sx2y").cast("double") - F.col("sx2").cast("double") * F.col("sy") / n).alias("s2y"),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    b = c.select(
        "n",
        "mx1",
        "mx2",
        "my",
        "syy_c",
        "s1y",
        "s2y",
        ((F.col("s1y") * F.col("s22") - F.col("s2y") * F.col("s12")) / det).alias("b1"),
        ((F.col("s2y") * F.col("s11") - F.col("s1y") * F.col("s12")) / det).alias("b2"),
    )
    ssr = F.col("b1") * F.col("s1y") + F.col("b2") * F.col("s2y")
    return b.select(
        "n",
        r6(F.col("my") - F.col("b1") * F.col("mx1") - F.col("b2") * F.col("mx2")).alias("beta0"),
        r6(F.col("b1")).alias("beta_qty"),
        r6(F.col("b2")).alias("beta_disc"),
        r6(ssr / F.col("syy_c")).alias("r2"),
        r6((ssr / 2) / ((F.col("syy_c") - ssr) / (n - 3))).alias("f_stat"),
    )


@register(
    "agg_wilcoxon_signed_rank",
    oracle="""
WITH pairs AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS pc,
         CAST(sum(CASE WHEN event_type = 'view'
                       THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS vc,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS np,
         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS nv
  FROM events GROUP BY 1
), d AS (
  SELECT pc - vc AS diff, abs(pc - vc) AS ad
  FROM pairs WHERE np > 0 AND nv > 0 AND pc <> vc
), g AS (
  SELECT ad,
         CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT) AS pos
  FROM d GROUP BY 1
), c AS (
  SELECT cnt, pos,
         CAST(coalesce(sum(cnt) OVER (ORDER BY ad
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS off
  FROM g
), s AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n,
         sum(pos * (off + (CAST(cnt AS DOUBLE) + 1) / 2)) AS w_plus,
         sum(CAST(cnt AS DOUBLE) * cnt * cnt - cnt) AS tie_cubes
  FROM c
)
SELECT n, w_plus,
       floor((w_plus - CAST(n AS DOUBLE) * (n + 1) / 4)
             / sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24
                    - tie_cubes / 48)
             * 1000000 + 0.5) / 1000000.0 AS z_stat
FROM s
""",
)
def agg_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WILCOXON SIGNED-RANK test of paired per-user purchase vs view
    revenue (total cents per user, users with both event types; zero
    differences dropped per the standard treatment) — the PAIRED
    nonparametric test the battery was missing: ``agg_mann_whitney``
    compares independent samples, Friedman needs >=3 treatments, this
    is the two-treatment matched-pairs case (Wilcoxon 1945).

    W+ = sum of midranks of |d| over positive differences; z uses the
    normal approximation with the standard tie correction
    sqrt(n(n+1)(2n+1)/24 - sum(t^3 - t)/48).  Ranks never materialize
    per pair: the tie-group decomposition (group by |d|, exclusive
    cumulative count = rank offset) makes every midrank an exact
    half-integer, the same discipline as ``agg_mann_whitney``; tie
    cubes stay < 2^53.  Two shuffles total (user grain, then the
    bounded distinct-|d| grain via distributed_rank)."""
    ev = table(spark, sf_dir, "events")
    c = F.round(F.col("value") * 100).cast("long")
    pairs = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", c).otherwise(0))
        .cast("long")
        .alias("pc"),
        F.sum(F.when(F.col("event_type") == "view", c).otherwise(0))
        .cast("long")
        .alias("vc"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("np"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("nv"),
    )
    d = pairs.filter(
        (F.col("np") > 0) & (F.col("nv") > 0) & (F.col("pc") != F.col("vc"))
    ).select(
        (F.col("pc") - F.col("vc")).alias("diff"),
        F.abs(F.col("pc") - F.col("vc")).alias("ad"),
    )
    g = d.groupBy("ad").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(F.when(F.col("diff") > 0, 1).otherwise(0)).cast("long").alias("pos"),
    )
    ranked = distributed_rank(g, ["ad"], sum_cols=("cnt",))
    cgrid = ranked.select(
        "cnt",
        "pos",
        (F.col("_cum_cnt") - F.col("cnt")).cast("long").alias("off"),
    )
    s = cgrid.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(
            F.col("pos") * (F.col("off") + (F.col("cnt").cast("double") + 1) / 2)
        ).alias("w_plus"),
        F.sum(
            F.col("cnt").cast("double") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).alias("tie_cubes"),
    )
    n = F.col("n").cast("double")
    z = (F.col("w_plus") - n * (F.col("n") + 1) / 4) / F.sqrt(
        n * (F.col("n") + 1) * (2 * F.col("n") + 1) / 24 - F.col("tie_cubes") / 48
    )
    return s.select("n", "w_plus", r6(z).alias("z_stat"))


_FISHER_GRID = 200_000  # lnfact grid bound; the largest lgamma argument is
# the USER population N (the 2x2 is user-grain), ~15k at sf1 — 200k covers
# sf>=10 with headroom, and both engines raise loudly past it (the
# agg_bayes_ab guard discipline) instead of silently dropping tail terms.


@register(
    "agg_fisher_exact",
    oracle=f"""
WITH u AS (
  SELECT user_id,
         CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS in_a,
         CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0
              THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY user_id
), cells AS (
  SELECT CAST(sum(in_a * conv) AS BIGINT) AS a,
         CAST(sum(in_a) AS BIGINT) AS ka,
         CAST(sum(conv) AS BIGINT) AS n1,
         CAST(count(*) AS BIGINT) AS nn
  FROM u
), lf AS (
  SELECT k, sum(ln(CAST(k AS DOUBLE))) OVER (ORDER BY k) AS lnf
  FROM (SELECT unnest(generate_series(1, {_FISHER_GRID})) AS k)
), lfx AS (SELECT k, lnf FROM lf UNION ALL SELECT 0, 0.0),
terms AS (
  SELECT cells.a, cells.ka, cells.n1, cells.nn, i.i,
         (lka.lnf - lk.lnf - lkak.lnf)
         + (lnka.lnf - lnk.lnf - lrest.lnf)
         - (lnn.lnf - ln1.lnf - lnn1.lnf) AS lnt
  FROM cells,
       (SELECT unnest(generate_series(0, {_FISHER_GRID})) AS i) i,
       lfx lka, lfx lk, lfx lkak, lfx lnka, lfx lnk, lfx lrest,
       lfx lnn, lfx ln1, lfx lnn1
  WHERE i.i >= cells.a AND i.i <= least(cells.ka, cells.n1)
    AND lka.k = cells.ka AND lk.k = i.i AND lkak.k = cells.ka - i.i
    AND lnka.k = cells.nn - cells.ka AND lnk.k = cells.n1 - i.i
    AND lrest.k = cells.nn - cells.ka - cells.n1 + i.i
    AND lnn.k = cells.nn AND ln1.k = cells.n1 AND lnn1.k = cells.nn - cells.n1
)
SELECT a, ka AS n_group_a, n1 AS n_converted, nn AS n_users,
       floor(sum(exp(lnt)) * 1000000 + 0.5) / 1000000.0 AS p_greater
FROM terms GROUP BY 1, 2, 3, 4
UNION ALL
-- Reachable overflow guard: past the grid the equality joins above match
-- NOTHING (terms is empty), so a guard inside that SELECT never fires; this
-- branch evaluates error() exactly when the population outgrows the grid.
SELECT error('agg_fisher_exact: lnfact grid too small — raise _FISHER_GRID'),
       ka, n1, nn, 0.0
FROM cells WHERE nn > {_FISHER_GRID}
""",
)
def agg_fisher_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FISHER'S EXACT TEST (one-sided, greater) on the user-grain 2x2:
    even/odd user split x converted (has >=1 purchase) — the exact
    small-sample partner of ``agg_ab_test``'s normal approximation and
    ``agg_chi2_independence``'s asymptotics: p = sum over the
    hypergeometric tail P(X >= a | margins), each term
    C(K,k) C(N-K, n-k) / C(N,n).

    Cross-engine float discipline: every binomial coefficient comes
    from ONE shared ln-factorial grid (cumulative sum of ln k in
    identical ascending order both engines — the ``agg_bayes_ab``
    recipe), the tail is <= min(K,n) terms joined against the grid
    (parameter-sized, not corpus-sized), and both engines raise loudly
    if the population outgrows the grid.  The corpus contributes one
    user-grain aggregate + one 1-row combine."""
    ev = table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)).alias("in_a"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    cells0 = u.agg(
        F.sum(F.col("in_a") * F.col("conv")).cast("long").alias("a"),
        F.sum("in_a").cast("long").alias("ka"),
        F.sum("conv").cast("long").alias("n1"),
        F.count(F.lit(1)).cast("long").alias("nn"),
    )
    cells = cells0.select(
        "a",
        "ka",
        "n1",
        F.when(
            F.col("nn") > _FISHER_GRID,
            F.raise_error(
                "agg_fisher_exact: lnfact grid too small — raise _FISHER_GRID"
            ).cast("long"),
        ).otherwise(F.col("nn")).alias("nn"),
    )
    lf = spark.range(1, _FISHER_GRID + 1).select(
        F.col("id").alias("k"),
        F.sum(F.log(F.col("id").cast("double"))).over(
            Window.orderBy("id").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ).alias("lnf"),
    )
    lfx = lf.unionAll(
        spark.createDataFrame([(0, 0.0)], "k long, lnf double")
    )

    grid = spark.range(0, _FISHER_GRID + 1).select(F.col("id").alias("i"))
    t = grid.crossJoin(F.broadcast(cells)).filter(
        (F.col("i") >= F.col("a"))
        & (F.col("i") <= F.least(F.col("ka"), F.col("n1")))
    )
    lookups = {
        "lka": F.col("ka"),
        "lk": F.col("i"),
        "lkak": F.col("ka") - F.col("i"),
        "lnka": F.col("nn") - F.col("ka"),
        "lnk": F.col("n1") - F.col("i"),
        "lrest": F.col("nn") - F.col("ka") - F.col("n1") + F.col("i"),
        "lnn": F.col("nn"),
        "ln1": F.col("n1"),
        "lnn1": F.col("nn") - F.col("n1"),
    }
    # ONE broadcast join for all nine lookups (the agg_bayes_ab fix —
    # see _lnf_attach_once); same reasoning drops the lfx checkpoint.
    t = _lnf_attach_once(t, lfx, lookups)
    lnt = (
        (F.col("lka") - F.col("lk") - F.col("lkak"))
        + (F.col("lnka") - F.col("lnk") - F.col("lrest"))
        - (F.col("lnn") - F.col("ln1") - F.col("lnn1"))
    )
    return (
        t.select("a", "ka", "n1", "nn", F.exp(lnt).alias("term"))
        .groupBy("a", "ka", "n1", "nn")
        .agg((F.floor(F.sum("term") * 1000000 + 0.5) / 1000000.0).alias("p_greater"))
        .select(
            "a",
            F.col("ka").alias("n_group_a"),
            F.col("n1").alias("n_converted"),
            F.col("nn").alias("n_users"),
            "p_greater",
        )
    )


@register(
    "agg_ks_normality",
    oracle=f"""
WITH pts AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(c) AS BIGINT) AS sv,
         CAST(sum(c * c) AS BIGINT) AS sq
  FROM pts
), s AS (
  SELECT n,
         CAST(sv AS DOUBLE) / n AS mu,
         sqrt((CAST(sq AS DOUBLE) - CAST(sv AS DOUBLE) * sv / n) / (n - 1))
           AS sd
  FROM m
), g AS (
  SELECT c, CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(count(*)) OVER (ORDER BY c) AS BIGINT) AS cum
  FROM pts GROUP BY 1
)
SELECT s.n,
       floor(s.mu * 10000 + 0.5) / 10000.0 AS mean_cents,
       floor(s.sd * 10000 + 0.5) / 10000.0 AS sd_cents,
       floor(max(greatest(
           CAST(g.cum AS DOUBLE) / s.n
             - {_norm_cdf_sql("(g.c - s.mu) / s.sd")},
           {_norm_cdf_sql("(g.c - s.mu) / s.sd")}
             - (CAST(g.cum AS DOUBLE) - g.cnt) / s.n))
         * 1000000 + 0.5) / 1000000.0 AS ks_d
FROM g CROSS JOIN s
GROUP BY 1, 2, 3
""",
)
def agg_ks_normality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-SAMPLE KS NORMALITY statistic (Lilliefors form: mean and SD
    estimated from the data) over event value cents: D = sup |ECDF -
    Phi((x - m)/s)| — the goodness-of-fit readout that says whether the
    parametric battery (t/ANOVA/effect sizes) is even admissible;
    complements ``agg_ks_test`` (two-sample) and ``agg_jarque_bera``
    (moment-based normality).

    Both one-sided deviations are evaluated at every distinct value
    (the ECDF's jump points): D+ uses the inclusive cumulative count,
    D- the exclusive one — the exact sup over the step function.  Phi
    comes from the shared A&S 26.2.17 polynomial, identical fixed-
    Horner order both engines; moments/counts are exact int64.  Scale:
    one moment combine + one distinct-value-grain pass via
    ``distributed_rank`` (never a single-task window), 1-row report."""
    ev = table(spark, sf_dir, "events")
    c = F.round(F.col("value") * 100).cast("long")
    pts = ev.select(c.alias("c"))
    m = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("sv"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sq"),
    )
    s = m.select(
        "n",
        (F.col("sv").cast("double") / F.col("n")).alias("mu"),
        F.sqrt(
            (F.col("sq").cast("double") - F.col("sv").cast("double") * F.col("sv") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("sd"),
    )
    g0 = pts.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    g = distributed_rank(g0, ["c"], sum_cols=("cnt",)).select(
        "c", "cnt", F.col("_cum_cnt").cast("long").alias("cum")
    )
    j = g.crossJoin(F.broadcast(s))
    phi = _norm_cdf((F.col("c") - F.col("mu")) / F.col("sd"))
    dev = F.greatest(
        F.col("cum").cast("double") / F.col("n") - phi,
        phi - (F.col("cum").cast("double") - F.col("cnt")) / F.col("n"),
    )
    return (
        j.groupBy("n", q4(F.col("mu")).alias("mean_cents"), q4(F.col("sd")).alias("sd_cents"))
        .agg(r6(F.max(dev)).alias("ks_d"))
    )


@register(
    "agg_grubbs_test",
    oracle="""
WITH m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv,
         CAST(sum(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sq,
         CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS mx,
         CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS mn
  FROM events
), s AS (
  SELECT n, mx, mn,
         CAST(sv AS DOUBLE) / n AS mu,
         sqrt((CAST(sq AS DOUBLE) - CAST(sv AS DOUBLE) * sv / n) / (n - 1))
           AS sd
  FROM m
)
SELECT n, mx AS max_cents, mn AS min_cents,
       floor(mu * 10000 + 0.5) / 10000.0 AS mean_cents,
       floor(greatest(mx - mu, mu - mn) / sd * 1000000 + 0.5) / 1000000.0
         AS g_stat,
       CASE WHEN mx - mu >= mu - mn THEN 'max' ELSE 'min' END AS suspect_side
FROM s
""",
)
def agg_grubbs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRUBBS' OUTLIER statistic G = max|x - mean| / sd over event value
    cents, with the suspect side — the classic parametric single-
    outlier test beside the robust ``ext_outlier_mad`` (MAD flags many;
    Grubbs scores THE most extreme point against a normal null, the
    first question a monitoring pipeline asks of a spike).

    max|x - mean| = max(max - mean, mean - min), so the whole statistic
    is closed-form over five exact int64 accumulators from ONE
    map-side-combined pass — no per-row deviation materializes; the
    ratio and the tie rule (>= prefers the max side) are identical both
    engines.  One scan, a 1-row report at any corpus size."""
    ev = table(spark, sf_dir, "events")
    c = F.round(F.col("value") * 100).cast("long")
    m = ev.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(c).cast("long").alias("sv"),
        F.sum(c * c).cast("long").alias("sq"),
        F.max(c).cast("long").alias("mx"),
        F.min(c).cast("long").alias("mn"),
    )
    mu = F.col("sv").cast("double") / F.col("n")
    sd = F.sqrt(
        (F.col("sq").cast("double") - F.col("sv").cast("double") * F.col("sv") / F.col("n"))
        / (F.col("n") - 1)
    )
    s = m.select("n", "mx", "mn", mu.alias("mu"), sd.alias("sd"))
    g = F.greatest(F.col("mx") - F.col("mu"), F.col("mu") - F.col("mn")) / F.col("sd")
    return s.select(
        "n",
        F.col("mx").alias("max_cents"),
        F.col("mn").alias("min_cents"),
        q4(F.col("mu")).alias("mean_cents"),
        r6(g).alias("g_stat"),
        F.when(
            F.col("mx") - F.col("mu") >= F.col("mu") - F.col("mn"), "max"
        ).otherwise("min").alias("suspect_side"),
    )


@register(
    "agg_james_stein",
    oracle="""
WITH g AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nation,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sv,
         CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)
                  * CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sq
  FROM customer GROUP BY 1
), pooled AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n) AS BIGINT) AS nn,
         sum(CAST(sq AS DOUBLE) - CAST(sv AS DOUBLE) * sv / n)
           / (sum(n) - count(*)) AS s2,
         list_reduce(list(CAST(sv AS DOUBLE) / n ORDER BY nation),
                     (a, b) -> a + b) / count(*) AS mbar
  FROM g
), spread AS (
  SELECT k, nn, s2, mbar,
         list_reduce(
           (SELECT list((CAST(sv AS DOUBLE) / n - mbar)
                        * (CAST(sv AS DOUBLE) / n - mbar) ORDER BY nation)
            FROM g),
           (a, b) -> a + b) AS ss
  FROM pooled
)
SELECT g.nation, g.n,
       floor((CAST(g.sv AS DOUBLE) / g.n) * 10000 + 0.5) / 10000.0
         AS mean_cents,
       floor(greatest(1.0 - (sp.k - 3) * (sp.s2 / g.n) / sp.ss, 0.0)
             * 1000000 + 0.5) / 1000000.0 AS shrink_b,
       floor((sp.mbar + greatest(1.0 - (sp.k - 3) * (sp.s2 / g.n) / sp.ss, 0.0)
                        * (CAST(g.sv AS DOUBLE) / g.n - sp.mbar))
             * 10000 + 0.5) / 10000.0 AS shrunk_cents
FROM g CROSS JOIN spread sp
ORDER BY g.nation
""",
)
def agg_james_stein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POSITIVE-PART JAMES-STEIN / EMPIRICAL-BAYES SHRINKAGE of the
    per-nation customer balance means toward the grand mean of means
    (Efron & Morris 1975): B_i = max(0, 1 - (k-3)(s^2/n_i)/S) with S =
    sum (m_i - mbar)^2 — the hierarchical smoothing every per-entity
    scorecard needs (a 3-customer nation's raw mean is mostly noise;
    the JS estimate dominates raw means in total squared error for
    k >= 4).  The shrinkage partner of ``agg_cuped`` (variance
    reduction) and ``agg_standardized_rate`` (composition adjustment).

    Float discipline: group moments are exact integer cents; mbar and
    S are order-sensitive double sums, so both fold SEQUENTIALLY over
    the nation-sorted group array (Spark ``aggregate`` HOF == DuckDB
    ``list_reduce`` — the ext_zipf_fit recipe, k-sized).  One scan,
    one k-row combine, a k-row report at any corpus size."""
    cust = table(spark, sf_dir, "customer")
    c = F.round(F.col("c_acctbal") * 100).cast("long")
    g = cust.groupBy(F.col("c_nationkey").cast("long").alias("nation")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(c).cast("long").alias("sv"),
        F.sum(c * c).cast("long").alias("sq"),
    )
    mean = F.col("sv").cast("double") / F.col("n")

    def fold_sorted(value_col):
        return F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("nation"), value_col.alias("v")))
                ),
                lambda s: s.getField("v"),
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        )

    pooled = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        (
            F.sum(
                F.col("sq").cast("double")
                - F.col("sv").cast("double") * F.col("sv") / F.col("n")
            )
            / (F.sum("n") - F.count(F.lit(1)))
        ).alias("s2"),
        (fold_sorted(mean) / F.count(F.lit(1))).alias("mbar"),
    )
    spread = (
        g.crossJoin(F.broadcast(pooled))
        .groupBy("k", "nn", "s2", "mbar")
        .agg(fold_sorted((mean - F.col("mbar")) * (mean - F.col("mbar"))).alias("ss"))
    )
    j = g.crossJoin(F.broadcast(spread))
    b = F.greatest(
        F.lit(1.0) - (F.col("k") - 3) * (F.col("s2") / F.col("n")) / F.col("ss"),
        F.lit(0.0),
    )
    return j.select(
        "nation",
        "n",
        q4(mean).alias("mean_cents"),
        r6(b).alias("shrink_b"),
        q4(F.col("mbar") + b * (mean - F.col("mbar"))).alias("shrunk_cents"),
    ).orderBy("nation")


@register(
    "agg_beta_binomial_smooth",
    oracle="""
WITH u AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS trials,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS conv
  FROM events GROUP BY 1
), pm AS (
  SELECT user_id, trials, conv,
         CAST(floor(conv * 1000000.0 / trials) AS BIGINT) AS p
  FROM u
), mom AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(p) AS BIGINT) AS sp,
         CAST(sum(p * p) AS BIGINT) AS spp
  FROM pm
), prior AS (
  SELECT k,
         CAST(sp AS DOUBLE) / k AS pbar,
         (CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * sp / k) / (k - 1) AS v
  FROM mom
), m AS (
  SELECT k, pbar, v,
         CASE WHEN v <= 0 THEN 1000000.0
              ELSE greatest((pbar * (1000000.0 - pbar) - v) / v, 1.0)
         END AS strength
  FROM prior
)
SELECT pm.user_id, pm.trials, pm.conv,
       floor(CAST(pm.conv AS DOUBLE) / pm.trials * 1000000 + 0.5)
         / 1000000.0 AS raw_rate,
       floor(m.strength * 10000 + 0.5) / 10000.0 AS prior_strength,
       floor((pm.conv + m.strength * (m.pbar / 1000000.0))
             / (pm.trials + m.strength) * 1000000 + 0.5) / 1000000.0
         AS smoothed_rate
FROM pm CROSS JOIN m
ORDER BY pm.user_id
""",
)
def agg_beta_binomial_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMPIRICAL-BAYES BETA-BINOMIAL SMOOTHING of per-user purchase
    rates: a method-of-moments Beta prior fit from the population of
    per-user rates (prior strength M = (pbar(1-pbar) - v)/v, floored at
    1; pure-noise populations where v <= 0 get M = 1e6 ~= the pooled
    rate), then every user's rate shrunk as (c + M*pbar)/(t + M) — the
    rate-smoothing twin of ``agg_james_stein`` (means) and the standard
    CTR/conversion smoothing before ranking sparse entities.

    Float discipline: per-user rates quantize to exact micro-ints
    (floor(c*1e6/t)), so the MoM moments are exact int64 sums — NO
    order-sensitive double sum exists; prior and posterior are closed-
    form doubles in identical order both engines.  Two shuffles (user
    grain, 1-row combine broadcast back); user-grain output."""
    ev = table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("trials"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("conv"),
    )
    pm = u.select(
        "user_id",
        "trials",
        "conv",
        F.floor(F.col("conv") * 1000000.0 / F.col("trials")).cast("long").alias("p"),
    )
    mom = pm.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("p").cast("long").alias("sp"),
        F.sum(F.col("p") * F.col("p")).cast("long").alias("spp"),
    )
    prior = mom.select(
        "k",
        (F.col("sp").cast("double") / F.col("k")).alias("pbar"),
        (
            (F.col("spp").cast("double") - F.col("sp").cast("double") * F.col("sp") / F.col("k"))
            / (F.col("k") - 1)
        ).alias("v"),
    )
    m = prior.select(
        "k",
        "pbar",
        "v",
        F.when(F.col("v") <= 0, F.lit(1000000.0))
        .otherwise(
            F.greatest(
                (F.col("pbar") * (F.lit(1000000.0) - F.col("pbar")) - F.col("v"))
                / F.col("v"),
                F.lit(1.0),
            )
        )
        .alias("strength"),
    )
    j = pm.crossJoin(F.broadcast(m))
    return j.select(
        "user_id",
        "trials",
        "conv",
        r6(F.col("conv").cast("double") / F.col("trials")).alias("raw_rate"),
        q4(F.col("strength")).alias("prior_strength"),
        r6(
            (F.col("conv") + F.col("strength") * (F.col("pbar") / 1000000.0))
            / (F.col("trials") + F.col("strength"))
        ).alias("smoothed_rate"),
    ).orderBy("user_id")


import math as _math

_PGOF_CAP = 30  # count cells 0..CAP-1 + pooled tail at CAP
# ln k! literals, Python-computed once, injected identically into both
# engines (k is bounded by the cell cap, so no grid machinery needed).
_PGOF_LNF = [0.0]
for _k in range(1, _PGOF_CAP):
    _PGOF_LNF.append(_PGOF_LNF[-1] + _math.log(_k))
_PGOF_DF = _PGOF_CAP + 1 - 2  # cells - 1 - one estimated parameter
_PGOF_WH_A = 1.0 - 2.0 / (9.0 * _PGOF_DF)
_PGOF_WH_B = _math.sqrt(2.0 / (9.0 * _PGOF_DF))
_PGOF_THIRD = 1.0 / 3.0


def _pgof_oracle() -> str:
    lnf_rows = ", ".join(f"({k}, {_PGOF_LNF[k]!r})" for k in range(_PGOF_CAP))
    z = (
        f"(pow(chi2 / {_PGOF_DF}, {_PGOF_THIRD!r}) - {_PGOF_WH_A!r})"
        f" / {_PGOF_WH_B!r}"
    )
    return f"""
WITH u AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS c
  FROM events GROUP BY 1
), lam AS (
  SELECT CAST(count(*) AS BIGINT) AS nu,
         CAST(sum(c) AS DOUBLE) / count(*) AS lam
  FROM u
), o AS (
  SELECT least(c, {_PGOF_CAP}) AS cell, CAST(count(*) AS BIGINT) AS obs
  FROM u GROUP BY 1
), lnf(k, lnf) AS (VALUES {lnf_rows}),
e AS (
  SELECT lnf.k AS cell,
         lam.nu * exp(lnf.k * ln(lam.lam) - lam.lam - lnf.lnf) AS exp_n
  FROM lnf CROSS JOIN lam
), etail AS (
  SELECT CAST({_PGOF_CAP} AS BIGINT) AS cell,
         lam.nu - (SELECT list_reduce(list(exp_n ORDER BY cell),
                                      (a, b) -> a + b) FROM e) AS exp_n
  FROM lam
), cells AS (
  SELECT e2.cell, coalesce(o.obs, 0) AS obs, e2.exp_n
  FROM (SELECT * FROM e UNION ALL SELECT * FROM etail) e2
  LEFT JOIN o ON o.cell = e2.cell
), chi AS (
  SELECT list_reduce(
           list((obs - exp_n) * (obs - exp_n) / exp_n ORDER BY cell),
           (a, b) -> a + b) AS chi2
  FROM cells
)
SELECT lam.nu AS n_users,
       floor(lam.lam * 1000000 + 0.5) / 1000000.0 AS lambda_hat,
       CAST({_PGOF_DF} AS BIGINT) AS df,
       floor(chi.chi2 * 10000 + 0.5) / 10000.0 AS chi2,
       floor((1.0 - {{phi}}) * 1000000 + 0.5) / 1000000.0 AS p_poisson
FROM chi CROSS JOIN lam
""".replace("{phi}", _norm_cdf_sql(z))


@register("agg_poisson_gof", oracle=_pgof_oracle())
def agg_poisson_gof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHI-SQUARE GOODNESS-OF-FIT of per-user purchase counts against a
    fitted Poisson(lambda-hat): observed count cells 0..{cap}-1 plus a
    pooled tail, expected cells N e^-lam lam^k / k!, chi2 with df =
    cells - 2, and an approximate p via Wilson-Hilferty + the shared
    A&S Phi — the DISTRIBUTIONAL verdict behind ``agg_overdispersion``
    (its index says "variance too big"; this says whether the Poisson
    model holds at all, cell by cell).

    Exactness: observed cells are exact int64; ln k! values are
    Python-computed literals injected identically into both engines (k
    is bounded by the cap, no grid machinery); the expected-mass and
    chi-square sums are order-sensitive so both fold cell-sorted
    (list_reduce == F.aggregate).  Scale: one user-grain combine, a
    {cap}-row cell frame, a 1-row report."""
    ev = table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("c")
    )
    lam = u.agg(
        F.count(F.lit(1)).cast("long").alias("nu"),
        (F.sum("c").cast("double") / F.count(F.lit(1))).alias("lam"),
    )
    o = u.groupBy(
        F.least(F.col("c"), F.lit(_PGOF_CAP)).alias("cell")
    ).agg(F.count(F.lit(1)).cast("long").alias("obs"))
    lnf = spark.createDataFrame(
        [(k, _PGOF_LNF[k]) for k in range(_PGOF_CAP)], "k long, lnf double"
    )
    e = lnf.crossJoin(F.broadcast(lam)).select(
        F.col("k").alias("cell"),
        (
            F.col("nu")
            * F.exp(F.col("k") * F.log(F.col("lam")) - F.col("lam") - F.col("lnf"))
        ).alias("exp_n"),
    )

    def fold_cells(df, value_col):
        return F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("cell"), value_col.alias("v")))
                ),
                lambda s: s.getField("v"),
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        )

    emass = e.agg(fold_cells(e, F.col("exp_n")).alias("mass"))
    etail = lam.crossJoin(F.broadcast(emass)).select(
        F.lit(_PGOF_CAP).cast("long").alias("cell"),
        (F.col("nu") - F.col("mass")).alias("exp_n"),
    )
    cells = (
        e.unionAll(etail)
        .join(o, "cell", "left")
        .select(
            "cell",
            F.coalesce(F.col("obs"), F.lit(0)).cast("long").alias("obs"),
            "exp_n",
        )
    )
    term = (F.col("obs") - F.col("exp_n")) * (F.col("obs") - F.col("exp_n")) / F.col("exp_n")
    chi = cells.agg(fold_cells(cells, term).alias("chi2"))
    z = (
        F.pow(F.col("chi2") / _PGOF_DF, F.lit(_PGOF_THIRD)) - F.lit(_PGOF_WH_A)
    ) / F.lit(_PGOF_WH_B)
    out = chi.crossJoin(F.broadcast(lam))
    return out.select(
        F.col("nu").alias("n_users"),
        r6(F.col("lam")).alias("lambda_hat"),
        F.lit(_PGOF_DF).cast("long").alias("df"),
        q4(F.col("chi2")).alias("chi2"),
        r6(F.lit(1.0) - _norm_cdf(z)).alias("p_poisson"),
    )


agg_poisson_gof.__doc__ = agg_poisson_gof.__doc__.format(cap=_PGOF_CAP)


# Shared per-(stratifier, stratum) purchase/view moment CTE: three
# candidate confounders, each binary, each a pure projection.
_SIMPSON_DIMS_SQL = """
  SELECT dim, stratum,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS np,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS sp,
         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS nv,
         CAST(sum(CASE WHEN event_type = 'view'
                       THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS sv
  FROM (
    SELECT event_type, value, 'ampm' AS dim,
           CASE WHEN hour(ts) < 12 THEN 0 ELSE 1 END AS stratum
    FROM events WHERE event_type IN ('purchase', 'view')
    UNION ALL
    SELECT event_type, value, 'dom_parity' AS dim,
           CAST(day(date_trunc('day', ts)) % 2 AS INT) AS stratum
    FROM events WHERE event_type IN ('purchase', 'view')
    UNION ALL
    SELECT event_type, value, 'user_parity' AS dim,
           CAST(user_id % 2 AS INT) AS stratum
    FROM events WHERE event_type IN ('purchase', 'view')
  ) GROUP BY 1, 2
"""


@register(
    "agg_simpson_scan",
    oracle=f"""
WITH g AS ({_SIMPSON_DIMS_SQL}
), d AS (
  SELECT dim,
         max(CASE WHEN stratum = 0 THEN np END) AS np0,
         max(CASE WHEN stratum = 0 THEN sp END) AS sp0,
         max(CASE WHEN stratum = 0 THEN nv END) AS nv0,
         max(CASE WHEN stratum = 0 THEN sv END) AS sv0,
         max(CASE WHEN stratum = 1 THEN np END) AS np1,
         max(CASE WHEN stratum = 1 THEN sp END) AS sp1,
         max(CASE WHEN stratum = 1 THEN nv END) AS nv1,
         max(CASE WHEN stratum = 1 THEN sv END) AS sv1
  FROM g GROUP BY 1
), e AS (
  SELECT dim,
         CAST(sp0 + sp1 AS DOUBLE) / (np0 + np1)
           - CAST(sv0 + sv1 AS DOUBLE) / (nv0 + nv1) AS pooled,
         (CAST(np0 + nv0 AS DOUBLE) / (np0 + nv0 + np1 + nv1))
           * (CAST(sp0 AS DOUBLE) / np0 - CAST(sv0 AS DOUBLE) / nv0)
         + (CAST(np1 + nv1 AS DOUBLE) / (np0 + nv0 + np1 + nv1))
           * (CAST(sp1 AS DOUBLE) / np1 - CAST(sv1 AS DOUBLE) / nv1)
           AS adjusted
  FROM d
)
SELECT dim AS stratifier,
       floor(pooled * 1000000 + 0.5) / 1000000.0 AS pooled_diff_cents,
       floor(adjusted * 1000000 + 0.5) / 1000000.0 AS adjusted_diff_cents,
       (pooled > 0) <> (adjusted > 0) AS sign_reversal
FROM e ORDER BY stratifier
""",
)
def agg_simpson_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIMPSON'S-PARADOX SCAN: the purchase-vs-view mean-value gap,
    pooled versus stratification-adjusted (stratum-size-weighted
    within-stratum gaps), across three candidate binary confounders
    (AM/PM, day-of-month parity, user parity) — automating the
    crude-vs-adjusted comparison ``agg_mantel_haenszel`` makes for ONE
    stratification of one 2x2: a `sign_reversal` row is a metric whose
    headline direction flips once the confounder is controlled, the
    classic dashboard trap (Simpson 1951).

    Exactness: per-(dim, stratum) moments are exact int64 from one
    unioned projection + combine; pooled and adjusted gaps are two-term
    closed forms written stratum-0-then-stratum-1 in both engines (no
    order-sensitive sum).  The stratifier frame is 3 dims x 2 strata at
    any corpus size."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    c = F.round(F.col("value") * 100).cast("long")

    def proj(dim, stratum):
        return ev.select(
            F.lit(dim).alias("dim"),
            stratum.cast("int").alias("stratum"),
            "event_type",
            c.alias("cents"),
        )

    u = (
        proj("ampm", F.when(F.hour("ts") < 12, 0).otherwise(1))
        .unionAll(proj("dom_parity", F.dayofmonth(F.date_trunc("day", "ts")) % 2))
        .unionAll(proj("user_parity", F.col("user_id") % 2))
    )
    g = u.groupBy("dim", "stratum").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("np"),
        F.sum(F.when(F.col("event_type") == "purchase", F.col("cents")).otherwise(0))
        .cast("long")
        .alias("sp"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("nv"),
        F.sum(F.when(F.col("event_type") == "view", F.col("cents")).otherwise(0))
        .cast("long")
        .alias("sv"),
    )

    def pick(col):
        return {
            s: F.max(F.when(F.col("stratum") == s, F.col(col))) for s in (0, 1)
        }

    np_, sp_, nv_, sv_ = pick("np"), pick("sp"), pick("nv"), pick("sv")
    d = g.groupBy("dim").agg(
        np_[0].alias("np0"), sp_[0].alias("sp0"),
        nv_[0].alias("nv0"), sv_[0].alias("sv0"),
        np_[1].alias("np1"), sp_[1].alias("sp1"),
        nv_[1].alias("nv1"), sv_[1].alias("sv1"),
    )
    pooled = (
        (F.col("sp0") + F.col("sp1")).cast("double") / (F.col("np0") + F.col("np1"))
        - (F.col("sv0") + F.col("sv1")).cast("double") / (F.col("nv0") + F.col("nv1"))
    )
    ntot = F.col("np0") + F.col("nv0") + F.col("np1") + F.col("nv1")
    adjusted = (
        ((F.col("np0") + F.col("nv0")).cast("double") / ntot)
        * (F.col("sp0").cast("double") / F.col("np0") - F.col("sv0").cast("double") / F.col("nv0"))
        + ((F.col("np1") + F.col("nv1")).cast("double") / ntot)
        * (F.col("sp1").cast("double") / F.col("np1") - F.col("sv1").cast("double") / F.col("nv1"))
    )
    e = d.select("dim", pooled.alias("pooled"), adjusted.alias("adjusted"))
    return e.select(
        F.col("dim").alias("stratifier"),
        r6(F.col("pooled")).alias("pooled_diff_cents"),
        r6(F.col("adjusted")).alias("adjusted_diff_cents"),
        ((F.col("pooled") > 0) != (F.col("adjusted") > 0)).alias("sign_reversal"),
    ).orderBy("stratifier")


@register(
    "agg_icc",
    oracle="""
WITH g AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nation,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sv,
         CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)
                  * CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sq
  FROM customer GROUP BY 1
), gm AS (
  SELECT CAST(sum(sv) AS DOUBLE) / sum(n) AS grand FROM g
), t AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n) AS BIGINT) AS nn,
         sum(CAST(sq AS DOUBLE) - CAST(sv AS DOUBLE) * sv / n)
           / (sum(n) - count(*)) AS msw,
         list_reduce(
           list(n * ((CAST(sv AS DOUBLE) / n - gm.grand)
                     * (CAST(sv AS DOUBLE) / n - gm.grand))
                ORDER BY nation),
           (a, b) -> a + b) / (count(*) - 1) AS msb,
         (sum(n) - list_reduce(list(CAST(n AS DOUBLE) * n ORDER BY nation),
                               (a, b) -> a + b) / sum(n))
           / (count(*) - 1) AS k0
  FROM g CROSS JOIN gm GROUP BY gm.grand
)
SELECT k, nn AS n,
       floor(msb * 10000 + 0.5) / 10000.0 AS ms_between,
       floor(msw * 10000 + 0.5) / 10000.0 AS ms_within,
       floor((msb - msw) / (msb + (k0 - 1) * msw) * 1000000 + 0.5)
         / 1000000.0 AS icc1
FROM t
""",
)
def agg_icc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTRACLASS CORRELATION ICC(1,1) of customer balances within
    nations (one-way random effects, Shrout & Fleiss 1979; unbalanced
    group-size correction k0 = (N - sum n_i^2/N)/(k-1)): how much of
    the balance variance is BETWEEN nations — the clustering-strength
    readout behind ``agg_james_stein`` (shrinkage pays off exactly when
    ICC is low) and the reliability statistic beside
    ``agg_cronbach_alpha``.

    Exactness: group moments exact int64; MSB's k-term sum and the
    sum-of-squared-sizes are order-sensitive so both fold nation-sorted
    (the agg_james_stein recipe); ICC is one closed-form double.  One
    scan, one k-row combine, a 1-row report."""
    cust = table(spark, sf_dir, "customer")
    c = F.round(F.col("c_acctbal") * 100).cast("long")
    g = cust.groupBy(F.col("c_nationkey").cast("long").alias("nation")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(c).cast("long").alias("sv"),
        F.sum(c * c).cast("long").alias("sq"),
    )

    def fold_sorted(value_col):
        return F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("nation"), value_col.alias("v")))
                ),
                lambda s: s.getField("v"),
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        )

    from pyspark.sql import Window as _Win

    wall = _Win.rowsBetween(_Win.unboundedPreceding, _Win.unboundedFollowing)
    grand = F.sum("sv").over(wall).cast("double") / F.sum("n").over(wall)
    dev = F.col("sv").cast("double") / F.col("n") - grand
    t = g.select("nation", "n", "sv", "sq", (F.col("n") * (dev * dev)).alias("bterm")).agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        (
            F.sum(
                F.col("sq").cast("double")
                - F.col("sv").cast("double") * F.col("sv") / F.col("n")
            )
            / (F.sum("n") - F.count(F.lit(1)))
        ).alias("msw"),
        (fold_sorted(F.col("bterm")) / (F.count(F.lit(1)) - 1)).alias("msb"),
        (
            (
                F.sum("n")
                - fold_sorted(F.col("n").cast("double") * F.col("n")) / F.sum("n")
            )
            / (F.count(F.lit(1)) - 1)
        ).alias("k0"),
    )
    return t.select(
        "k",
        F.col("nn").alias("n"),
        q4(F.col("msb")).alias("ms_between"),
        q4(F.col("msw")).alias("ms_within"),
        r6(
            (F.col("msb") - F.col("msw"))
            / (F.col("msb") + (F.col("k0") - 1) * F.col("msw"))
        ).alias("icc1"),
    )


@register(
    "agg_xi_correlation",
    oracle="""
WITH pts AS (
  SELECT CAST(l_quantity AS BIGINT) AS x,
         CAST(round(l_extendedprice) AS BIGINT) AS y,
         l_orderkey, l_linenumber
  FROM lineitem
), yg AS (
  SELECT y, CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(count(*)) OVER (ORDER BY y) AS BIGINT) AS cum
  FROM pts GROUP BY 1
), nt AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n_all FROM yg
), ranked AS (
  SELECT p.x, p.l_orderkey, p.l_linenumber, p.y, nt.n_all,
         yg.cum AS r,
         nt.n_all - (yg.cum - yg.cnt) AS l
  FROM pts p JOIN yg ON p.y = yg.y CROSS JOIN nt
), seq AS (
  -- (orderkey, linenumber) is NOT unique in this corpus (the win_vwap
  -- finding): append y so any remaining ties are rank-equal and their
  -- internal order cannot change sum |r_(t+1) - r_t|.
  SELECT r, l, n_all,
         row_number() OVER (ORDER BY x, l_orderkey, l_linenumber, y) AS t
  FROM ranked
), s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(abs(r - lead_r) AS BIGINT)) AS BIGINT) AS num,
         CAST(sum(CAST(l AS HUGEINT) * (n_all - l)) AS HUGEINT) AS den
  FROM (SELECT r, l, n_all, lead(r) OVER (ORDER BY t) AS lead_r FROM seq)
)
SELECT n,
       floor((1.0 - CAST(n AS DOUBLE) * num / (2.0 * CAST(den AS DOUBLE)))
             * 1000000 + 0.5) / 1000000.0 AS xi
FROM s
""",
)
def agg_xi_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHATTERJEE'S XI CORRELATION (2020) of lineitem price against
    quantity — the new-generation dependence coefficient: ~0 iff
    independent, ~1 iff y is a measurable FUNCTION of x, detecting
    non-monotone dependence Pearson (``agg_corr_matrix``) and Spearman
    (``agg_spearman_corr``) both miss.  Ties version: xi = 1 - n
    sum_t |r_(t+1) - r_t| / (2 sum_i l_i (n - l_i)) with r_i = #{{y_j
    <= y_i}}, l_i = #{{y_j >= y_i}}, rows ordered by x (deterministic
    key tiebreak, the paper's random tie-break made reproducible).

    Every ingredient is an EXACT integer: r and l come from one
    tie-group cumulative pass over the distinct-y grain — DOMAIN-bounded,
    not data-grain: y = round(l_extendedprice) and extendedprice =
    quantity(≤50) × retailprice(≤~2099) caps the distinct values at
    ~105k at ANY corpus size, the bounded case where a single-task
    window is correct by construction — the consecutive-rank
    differences from a partition-local lead over the range-pinned
    x-ordered sequence plus a |partitions|-row boundary stitch (never a
    single-task data-grain window), and the denominator sums l(n-l) as
    exact 128-bit/decimal products.  One final double expression."""
    li = table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice")).cast("long").alias("y"),
        "l_orderkey",
        "l_linenumber",
    )
    yg = pts.groupBy("y").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w_y = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("y").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    yr = yg.select(
        "y",
        "cnt",
        F.sum("cnt").over(w_y).cast("long").alias("cum"),
        F.sum("cnt").over(w_all).cast("long").alias("n_all"),
    )
    # yr is price-domain-sized (≤ ~105k rows, a few MB) — broadcast it so
    # the data-grain side never shuffles for this join.
    ranked = pts.join(F.broadcast(yr), "y").select(
        "x",
        "l_orderkey",
        "l_linenumber",
        "y",
        "n_all",
        F.col("cum").alias("r"),
        (F.col("n_all") - (F.col("cum") - F.col("cnt"))).alias("l"),
    )
    # Consecutive |r_(t+1) - r_t| without a data-grain self-join OR a
    # global rank: only ADJACENT pairs in the (x, key, y) total order are
    # needed, so range-partition once on the sort key, pin the shuffle
    # (same nondeterministic-sampling hazard distributed_rank documents),
    # and lead(r) partition-locally — that covers every adjacent pair
    # except the num_partitions-1 partition boundaries, which a bounded
    # per-partition edge aggregate (first/last row of each _pid, paired
    # on the |partitions|-row frame) stitches exactly.
    # (orderkey, linenumber) is NOT unique here (the win_vwap finding):
    # append y so residual ties are rank-equal and order-irrelevant.
    sort_cols = ["x", "l_orderkey", "l_linenumber", "y"]
    seq = (
        ranked.repartitionByRange(32, *sort_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    key = F.struct(*sort_cols)
    w_pid = Window.partitionBy("_pid").orderBy(*sort_cols)
    inner = seq.withColumn("r_next", F.lead("r").over(w_pid)).agg(
        F.coalesce(
            F.sum(F.abs(F.col("r") - F.col("r_next"))), F.lit(0)
        ).cast("long").alias("num_in")
    )
    edges = seq.groupBy("_pid").agg(
        F.min(key.withField("r", F.col("r"))).alias("lo"),
        F.max(key.withField("r", F.col("r"))).alias("hi"),
    )
    # |num_partitions| rows — the bounded case where an unpartitioned
    # window is correct by construction (the distributed_rank offsets
    # discipline).
    w_edge = Window.orderBy(F.col("lo.x"), F.col("lo.l_orderkey"),
                            F.col("lo.l_linenumber"), F.col("lo.y"))
    boundary = edges.withColumn(
        "next_first_r", F.lead("lo.r").over(w_edge)
    ).agg(
        F.coalesce(
            F.sum(F.abs(F.col("next_first_r") - F.col("hi.r"))), F.lit(0)
        ).cast("long").alias("num_edge")
    )
    num = inner.crossJoin(F.broadcast(boundary)).select(
        (F.col("num_in") + F.col("num_edge")).alias("num")
    )
    den = seq.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.col("l").cast("decimal(38,0)") * (F.col("n_all") - F.col("l"))
        ).cast("decimal(38,0)").alias("den"),
    )
    j = den.crossJoin(F.broadcast(num))
    xi = 1.0 - F.col("n").cast("double") * F.col("num") / (
        2.0 * F.col("den").cast("double")
    )
    return j.select("n", r6(xi).alias("xi"))


_MCI_Z = 1.959963984540054  # two-sided 95% normal quantile (literal both engines)


@register(
    "agg_median_ci",
    oracle=f"""
WITH pts AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events
), g AS (
  SELECT c, CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(count(*)) OVER (ORDER BY c) AS BIGINT) AS cum
  FROM pts GROUP BY 1
), n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM g
), ranks AS (
  SELECT 'ci_low' AS which,
         greatest(CAST(floor((n - {_MCI_Z} * sqrt(CAST(n AS DOUBLE))) / 2)
                       AS BIGINT), 1) AS k FROM n
  UNION ALL
  SELECT 'med_lo', CAST(floor((n + 1) / 2.0) AS BIGINT) FROM n
  UNION ALL
  SELECT 'med_hi', CAST(ceil((n + 1) / 2.0) AS BIGINT) FROM n
  UNION ALL
  SELECT 'ci_high',
         least(CAST(ceil(1 + (n + {_MCI_Z} * sqrt(CAST(n AS DOUBLE))) / 2)
                    AS BIGINT), n) FROM n
), os AS (
  SELECT r.which, g.c
  FROM ranks r JOIN g ON g.cum >= r.k AND g.cum - g.cnt < r.k
)
SELECT n.n,
       max(CASE WHEN which = 'ci_low' THEN c END) AS ci_low_cents,
       floor((CAST(max(CASE WHEN which = 'med_lo' THEN c END) AS DOUBLE)
              + max(CASE WHEN which = 'med_hi' THEN c END)) / 2 * 100 + 0.5)
         / 100.0 AS median_cents,
       max(CASE WHEN which = 'ci_high' THEN c END) AS ci_high_cents
FROM os CROSS JOIN n GROUP BY n.n
""",
)
def agg_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEDIAN WITH A DISTRIBUTION-FREE 95% CONFIDENCE INTERVAL from
    order statistics: the classic binomial-rank interval (L at rank
    floor((n - z sqrt(n))/2), U at rank ceil(1 + (n + z sqrt(n))/2),
    exact coverage by the sign-test duality; Conover) — the missing
    UNCERTAINTY readout beside the point quantiles
    (``agg_quantile``/``agg_weighted_median``) and the nonparametric
    answer to "is the median really above X?" without bootstrap
    machinery (``agg_bootstrap_ci`` resamples; this is closed-form).

    Order statistics never materialize per row: the distinct-value
    tie-group frame (exact cumulative counts via ``distributed_rank``)
    is range-joined against the FOUR target ranks (a broadcast of a
    4-row frame), so the corpus contributes one combine at the
    distinct-value grain.  All rank arithmetic is identical literal
    z both engines."""
    ev = table(spark, sf_dir, "events")
    c = F.round(F.col("value") * 100).cast("long")
    g0 = ev.select(c.alias("c")).groupBy("c").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    g = distributed_rank(g0, ["c"], sum_cols=("cnt",)).select(
        "c",
        "cnt",
        F.col("_cum_cnt").cast("long").alias("cum"),
        F.col("_tot_cnt").cast("long").alias("n"),
    )
    n1 = g.agg(F.max("n").alias("n"))
    nd = F.col("n").cast("double")
    ranks = (
        n1.select(
            F.lit("ci_low").alias("which"),
            F.greatest(
                F.floor((F.col("n") - _MCI_Z * F.sqrt(nd)) / 2).cast("long"),
                F.lit(1),
            ).alias("k"),
        )
        .unionAll(
            n1.select(
                F.lit("med_lo"),
                F.floor((F.col("n") + 1) / 2.0).cast("long"),
            )
        )
        .unionAll(
            n1.select(
                F.lit("med_hi"),
                F.ceil((F.col("n") + 1) / 2.0).cast("long"),
            )
        )
        .unionAll(
            n1.select(
                F.lit("ci_high"),
                F.least(
                    F.ceil(1 + (F.col("n") + _MCI_Z * F.sqrt(nd)) / 2).cast("long"),
                    F.col("n"),
                ),
            )
        )
    )
    os_ = g.join(
        F.broadcast(ranks),
        (F.col("cum") >= F.col("k")) & (F.col("cum") - F.col("cnt") < F.col("k")),
    )
    pick = lambda w: F.max(F.when(F.col("which") == w, F.col("c")))  # noqa: E731
    return (
        os_.groupBy("n")
        .agg(
            pick("ci_low").alias("ci_low_cents"),
            (
                F.floor(
                    (pick("med_lo").cast("double") + pick("med_hi")) / 2 * 100 + 0.5
                )
                / 100.0
            ).alias("median_cents"),
            pick("ci_high").alias("ci_high_cents"),
        )
        .select("n", "ci_low_cents", "median_cents", "ci_high_cents")
    )


_HILL_K = 100  # tail order statistics used


@register(
    "agg_hill_tail",
    oracle=f"""
WITH pts AS (
  SELECT CAST(round(o_totalprice) AS BIGINT) AS x, o_orderkey
  FROM orders WHERE o_totalprice > 0
), topk AS (
  SELECT x, row_number() OVER (ORDER BY x DESC, o_orderkey) AS rk
  FROM pts QUALIFY rk <= {_HILL_K} + 1
), thr AS (
  SELECT CAST(x AS DOUBLE) AS x_k1 FROM topk WHERE rk = {_HILL_K} + 1
), s AS (
  SELECT list_reduce(
           (SELECT list(ln(CAST(topk.x AS DOUBLE) / thr.x_k1) ORDER BY rk)
            FROM topk, thr WHERE rk <= {_HILL_K}),
           (a, b) -> a + b) AS lnsum
  FROM thr
), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pts)
SELECT nn.n, CAST({_HILL_K} AS BIGINT) AS k,
       floor(thr.x_k1 * 100 + 0.5) / 100.0 AS threshold_dollars,
       floor(s.lnsum / {_HILL_K} * 1000000 + 0.5) / 1000000.0 AS hill_xi,
       floor({_HILL_K} / s.lnsum * 1000000 + 0.5) / 1000000.0 AS tail_alpha
FROM s CROSS JOIN thr CROSS JOIN nn
""",
)
def agg_hill_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HILL TAIL-INDEX estimator over the top-{k} order totals: xi-hat =
    (1/k) sum ln(x_(i) / x_(k+1)) and the implied power-law exponent
    alpha = 1/xi (Hill 1975) — the RIGOROUS tail statistic behind the
    distribution-shape family (``ext_zipf_fit`` regresses the whole
    log-log curve; ``agg_pareto`` reports the 80/20 share; Hill
    estimates the tail exponent from extreme order statistics only,
    which is what reinsurance/capacity planning actually needs).

    The top-(k+1) selection is a TakeOrdered (per-partition heaps,
    deterministic orderkey tiebreak — never a global sort); the k log
    ratios are order-sensitive doubles so they fold rank-sorted
    (list_reduce == F.aggregate).  One scan, a (k+1)-row frame, a
    1-row report at any corpus size."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    pts = o.select(
        F.round(F.col("o_totalprice")).cast("long").alias("x"), "o_orderkey"
    )
    topk = (
        pts.orderBy(F.desc("x"), F.asc("o_orderkey"))
        .limit(_HILL_K + 1)
        .select(
            "x",
            F.row_number()
            .over(Window.orderBy(F.desc("x"), F.asc("o_orderkey")))
            .alias("rk"),
        )
    )
    thr = topk.filter(F.col("rk") == _HILL_K + 1).select(
        F.col("x").cast("double").alias("x_k1")
    )
    terms = topk.filter(F.col("rk") <= _HILL_K).crossJoin(F.broadcast(thr))
    lnsum = terms.agg(
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("rk"),
                            F.log(F.col("x").cast("double") / F.col("x_k1")).alias("v"),
                        )
                    )
                ),
                lambda st: st.getField("v"),
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("lnsum")
    )
    nn = pts.agg(F.count(F.lit(1)).cast("long").alias("n"))
    j = lnsum.crossJoin(F.broadcast(thr)).crossJoin(F.broadcast(nn))
    return j.select(
        "n",
        F.lit(_HILL_K).cast("long").alias("k"),
        (F.floor(F.col("x_k1") * 100 + 0.5) / 100.0).alias("threshold_dollars"),
        r6(F.col("lnsum") / _HILL_K).alias("hill_xi"),
        r6(F.lit(float(_HILL_K)) / F.col("lnsum")).alias("tail_alpha"),
    )


agg_hill_tail.__doc__ = agg_hill_tail.__doc__.format(k=_HILL_K)


@register(
    "agg_bland_altman",
    oracle="""
WITH pairs AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS a,
         CAST(sum(CASE WHEN event_type = 'click'
                       THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS b,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS na,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS nb
  FROM events GROUP BY 1
), d AS (
  SELECT a - b AS diff FROM pairs WHERE na > 0 AND nb > 0
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(diff) AS BIGINT) AS sd_,
         CAST(sum(diff * diff) AS BIGINT) AS sq
  FROM d
)
SELECT n,
       floor((CAST(sd_ AS DOUBLE) / n) * 10000 + 0.5) / 10000.0 AS bias_cents,
       floor(sqrt((CAST(sq AS DOUBLE) - CAST(sd_ AS DOUBLE) * sd_ / n)
                  / (n - 1)) * 10000 + 0.5) / 10000.0 AS sd_cents,
       floor((CAST(sd_ AS DOUBLE) / n
              - 1.96 * sqrt((CAST(sq AS DOUBLE) - CAST(sd_ AS DOUBLE) * sd_ / n)
                            / (n - 1))) * 10000 + 0.5) / 10000.0 AS loa_low,
       floor((CAST(sd_ AS DOUBLE) / n
              + 1.96 * sqrt((CAST(sq AS DOUBLE) - CAST(sd_ AS DOUBLE) * sd_ / n)
                            / (n - 1))) * 10000 + 0.5) / 10000.0 AS loa_high
FROM m
""",
)
def agg_bland_altman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLAND-ALTMAN AGREEMENT ANALYSIS (1986) between two per-user
    measurements (purchase vs click revenue totals, users with both):
    mean difference (bias) and the 95% limits of agreement bias ±
    1.96·SD — the method-comparison readout correlation can't give
    (two methods can correlate at 0.99 and still disagree by a constant
    or proportional bias; BA quantifies the DISAGREEMENT), completing
    the agreement family beside ``agg_cohens_kappa`` (categorical) and
    ``agg_icc`` (variance-decomposition).

    Exactness: per-user paired totals and both difference moments are
    exact int64 from one user-grain combine; bias/SD/limits are
    closed-form doubles in identical order both engines (1.96 literal).
    Two shuffles total, a 1-row report at any corpus size."""
    ev = table(spark, sf_dir, "events")
    c = F.round(F.col("value") * 100).cast("long")
    pairs = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", c).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("event_type") == "click", c).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("na"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("nb"),
    )
    d = pairs.filter((F.col("na") > 0) & (F.col("nb") > 0)).select(
        (F.col("a") - F.col("b")).alias("diff")
    )
    m = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("diff").cast("long").alias("sd_"),
        F.sum(F.col("diff") * F.col("diff")).cast("long").alias("sq"),
    )
    bias = F.col("sd_").cast("double") / F.col("n")
    sd = F.sqrt(
        (F.col("sq").cast("double") - F.col("sd_").cast("double") * F.col("sd_") / F.col("n"))
        / (F.col("n") - 1)
    )
    return m.select(
        "n",
        q4(bias).alias("bias_cents"),
        q4(sd).alias("sd_cents"),
        q4(bias - 1.96 * sd).alias("loa_low"),
        q4(bias + 1.96 * sd).alias("loa_high"),
    )


_MAHA_TOP = 10  # most-outlying rows reported


@register(
    "agg_mahalanobis_2d",
    oracle=f"""
WITH pts AS (
  SELECT l_orderkey, l_linenumber,
         CAST(l_quantity AS BIGINT) AS x,
         CAST(round(l_extendedprice) AS BIGINT) AS y
  FROM lineitem
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM pts
), c AS (
  SELECT n,
         CAST(sx AS DOUBLE) / n AS mx, CAST(sy AS DOUBLE) / n AS my,
         (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1) AS vx,
         (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / (n - 1) AS vy,
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) / (n - 1) AS cxy
  FROM m
)
SELECT p.l_orderkey, p.l_linenumber, p.x AS qty, p.y AS price_dollars,
       floor(((p.x - c.mx) * (p.x - c.mx) * c.vy
              - 2 * (p.x - c.mx) * (p.y - c.my) * c.cxy
              + (p.y - c.my) * (p.y - c.my) * c.vx)
             / (c.vx * c.vy - c.cxy * c.cxy) * 10000 + 0.5) / 10000.0
         AS d2
FROM pts p CROSS JOIN c
ORDER BY d2 DESC, p.l_orderkey, p.l_linenumber
LIMIT {_MAHA_TOP}
""",
)
def agg_mahalanobis_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAHALANOBIS OUTLIERS in the (quantity, price) plane: the top-{t}
    rows by squared Mahalanobis distance d2 = z' S^-1 z with the 2x2
    covariance inverted in CLOSED FORM — the multivariate outlier
    detector the univariate family (``ext_outlier_mad`` robust,
    ``agg_grubbs_test`` parametric) cannot express: a (50-unit, cheap)
    row is unremarkable on either margin but extreme JOINTLY.

    Exactness: all five moments are exact int64 from one 1-row combine
    (price in whole dollars — the ``agg_partial_corr`` headroom
    discipline); each row's d2 is one closed-form double (the expanded
    2x2 inverse), broadcast back over the scan; the top-{t} is a
    TakeOrdered with deterministic key tiebreak.  One scan + one
    broadcast; no shuffle of the fact table."""
    li = table(spark, sf_dir, "lineitem")
    pts = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice")).cast("long").alias("y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    n = F.col("n")
    c = m.select(
        "n",
        (F.col("sx").cast("double") / n).alias("mx"),
        (F.col("sy").cast("double") / n).alias("my"),
        ((F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / n) / (n - 1)).alias("vx"),
        ((F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / n) / (n - 1)).alias("vy"),
        ((F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy") / n) / (n - 1)).alias("cxy"),
    )
    j = pts.crossJoin(F.broadcast(c))
    dx = F.col("x") - F.col("mx")
    dy = F.col("y") - F.col("my")
    d2 = (
        dx * dx * F.col("vy") - 2 * dx * dy * F.col("cxy") + dy * dy * F.col("vx")
    ) / (F.col("vx") * F.col("vy") - F.col("cxy") * F.col("cxy"))
    return (
        j.select(
            "l_orderkey",
            "l_linenumber",
            F.col("x").alias("qty"),
            F.col("y").alias("price_dollars"),
            q4(d2).alias("d2"),
        )
        .orderBy(F.desc("d2"), "l_orderkey", "l_linenumber")
        .limit(_MAHA_TOP)
    )


agg_mahalanobis_2d.__doc__ = agg_mahalanobis_2d.__doc__.format(t=_MAHA_TOP)


@register(
    "agg_pca_2x2",
    oracle="""
WITH m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
         CAST(sum(CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT) AS sy,
         CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
              AS BIGINT) AS sxx,
         CAST(sum(CAST(round(l_extendedprice) AS BIGINT)
                  * CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT) AS syy,
         CAST(sum(CAST(l_quantity AS BIGINT)
                  * CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT) AS sxy
  FROM lineitem
), c AS (
  SELECT n,
         (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1) AS vx,
         (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / (n - 1) AS vy,
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) / (n - 1) AS cxy
  FROM m
), e AS (
  SELECT n, vx, vy, cxy,
         (vx + vy) / 2 + sqrt(((vx - vy) / 2) * ((vx - vy) / 2) + cxy * cxy)
           AS l1,
         (vx + vy) / 2 - sqrt(((vx - vy) / 2) * ((vx - vy) / 2) + cxy * cxy)
           AS l2
  FROM c
)
SELECT n,
       floor(l1 * 10000 + 0.5) / 10000.0 AS eigval_1,
       floor(l2 * 10000 + 0.5) / 10000.0 AS eigval_2,
       floor(l1 / (l1 + l2) * 1000000 + 0.5) / 1000000.0
         AS var_explained_1,
       floor(atan2(l1 - vx, cxy) * 1000000 + 0.5) / 1000000.0
         AS principal_angle
FROM e
""",
)
def agg_pca_2x2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 2x2 PCA of (quantity, price-dollars): eigenvalues of the
    sample covariance in CLOSED FORM (lambda = tr/2 ± sqrt((dx/2)^2 +
    c^2)), the explained-variance share, and the principal-axis angle
    atan2(lambda1 - vx, cxy) — the fully SQL-ORACLED counterpart of
    ``ext_embedding_pca`` (64-d, numpy-parity rows-only by necessity):
    for TWO variables the spectral decomposition needs no iteration,
    so the hash gate checks the entire answer.

    Exactness: the five covariance moments are exact int64 from one
    1-row combine; eigenvalues/angle are closed-form doubles in
    identical order both engines (atan2 is IEEE-correctly-rounded in
    both).  One scan, zero extra shuffles — the map-side-combine
    ideal."""
    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = F.round(F.col("l_extendedprice")).cast("long")
    m = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).cast("long").alias("sx"),
        F.sum(y).cast("long").alias("sy"),
        F.sum(x * x).cast("long").alias("sxx"),
        F.sum(y * y).cast("long").alias("syy"),
        F.sum(x * y).cast("long").alias("sxy"),
    )
    n = F.col("n")
    c = m.select(
        "n",
        ((F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / n) / (n - 1)).alias("vx"),
        ((F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / n) / (n - 1)).alias("vy"),
        ((F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy") / n) / (n - 1)).alias("cxy"),
    )
    half_tr = (F.col("vx") + F.col("vy")) / 2
    root = F.sqrt(
        ((F.col("vx") - F.col("vy")) / 2) * ((F.col("vx") - F.col("vy")) / 2)
        + F.col("cxy") * F.col("cxy")
    )
    e = c.select(
        "n",
        "vx",
        "cxy",
        (half_tr + root).alias("l1"),
        (half_tr - root).alias("l2"),
    )
    return e.select(
        "n",
        q4(F.col("l1")).alias("eigval_1"),
        q4(F.col("l2")).alias("eigval_2"),
        r6(F.col("l1") / (F.col("l1") + F.col("l2"))).alias("var_explained_1"),
        r6(F.atan2(F.col("l1") - F.col("vx"), F.col("cxy"))).alias("principal_angle"),
    )


# ---------------------------------------------------------------------------
# Two-sample EDF tests beyond KS (round 15, wave K).  Shared float
# discipline: per-distinct-value terms are PINNED doubles of exact-int
# cumulative counts, then PICO-QUANTIZED (floor(term * 1e12 + 0.5)) and
# summed as exact int64 — order-free at ANY value cardinality (the
# centroid quantize-then-sum argument taken to the data-grain sum; the
# int sum stays < ~2e18 at the sf1 twin, and both engines derive the
# identical quantized integer per value, so the hash matches no matter
# what the true real-valued tail digits are).
# ---------------------------------------------------------------------------


@register(
    "agg_cvm_test",
    oracle="""
WITH pts AS (
  SELECT value, CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS in_a
  FROM events
), g AS (
  SELECT value,
         CAST(sum(in_a) AS BIGINT) AS ca,
         CAST(sum(1 - in_a) AS BIGINT) AS cb
  FROM pts GROUP BY 1
), n AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb FROM g
), c AS (
  SELECT ca, cb,
         CAST(sum(ca) OVER w AS BIGINT) AS cum_a,
         CAST(sum(cb) OVER w AS BIGINT) AS cum_b
  FROM g
  WINDOW w AS (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
), s AS (
  SELECT CAST(sum(CAST(floor(
           (ca + cb) * (((CAST(cum_a AS DOUBLE) * nb - CAST(cum_b AS DOUBLE) * na)
                         / (CAST(na AS DOUBLE) * nb))
                        * ((CAST(cum_a AS DOUBLE) * nb - CAST(cum_b AS DOUBLE) * na)
                           / (CAST(na AS DOUBLE) * nb)))
           * 1000000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sp
  FROM c, n
)
SELECT n.na, n.nb,
       floor((CAST(na AS DOUBLE) * nb / ((na + nb) * (CAST(na AS DOUBLE) + nb)))
             * (CAST(sp AS DOUBLE) / 1000000000000.0) * 1000000 + 0.5)
         / 1000000.0 AS cvm_t,
       floor((1.0 + 1.0 / (na + nb)) / 6.0 * 1000000 + 0.5) / 1000000.0
         AS e_t,
       CASE WHEN (CAST(na AS DOUBLE) * nb / ((na + nb) * (CAST(na AS DOUBLE) + nb)))
                 * (CAST(sp AS DOUBLE) / 1000000000000.0) > 0.461
            THEN 'distributions_differ' ELSE 'no_difference' END AS verdict
FROM s, n
""",
)
def agg_cvm_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-SAMPLE CRAMER-VON MISES: T = (na*nb/N^2) * sum over pooled
    points of (F_A - F_B)^2 between the even/odd event_id halves — the
    INTEGRATED companion to ``agg_ks_test``'s supremum (KS sees only
    the single worst gap; CvM accumulates every gap, so many small
    persistent deviations that KS misses move T).  Reports T, its null
    mean (1 + 1/N)/6, and the verdict vs the 5% asymptotic critical
    value 0.461 (Anderson & Darling 1952 — literal in both engines).

    Tie-exact: the ECDF gap is constant within a tie group, so the sum
    weights each distinct value by its pooled count.  The per-value
    term is a pinned double of exact cumulative counts, PICO-QUANTIZED
    and summed as int64 (order-free at any value cardinality — see the
    wave-K banner above); the Spark side reuses the KS machinery's
    single distributed_rank pass (no single-task window)."""
    ev = table(spark, sf_dir, "events")
    g = (
        ev.select(
            "value",
            F.when(F.col("event_id") % 2 == 0, 1).otherwise(0).alias("in_a"),
        )
        .groupBy("value")
        .agg(
            F.sum("in_a").cast("long").alias("ca"),
            F.sum(1 - F.col("in_a")).cast("long").alias("cb"),
        )
    )
    c = distributed_rank(g, ["value"], sum_cols=("ca", "cb"))
    na, nb = F.col("_tot_ca"), F.col("_tot_cb")
    gap = (
        F.col("_cum_ca").cast("double") * nb - F.col("_cum_cb").cast("double") * na
    ) / (na.cast("double") * nb)
    term = (F.col("ca") + F.col("cb")) * (gap * gap)
    s = c.select(
        na.alias("na"),
        nb.alias("nb"),
        F.floor(term * 1000000000000.0 + 0.5).cast("long").alias("tq"),
    ).groupBy("na", "nb").agg(F.sum("tq").cast("long").alias("sp"))
    nn = F.col("na") + F.col("nb")
    t = (
        F.col("na").cast("double")
        * F.col("nb")
        / (nn * (F.col("na").cast("double") + F.col("nb")))
    ) * (F.col("sp").cast("double") / 1000000000000.0)
    return s.select(
        "na",
        "nb",
        r6(t).alias("cvm_t"),
        r6((1.0 + 1.0 / nn) / 6.0).alias("e_t"),
        F.when(t > 0.461, "distributions_differ")
        .otherwise("no_difference")
        .alias("verdict"),
    )


@register(
    "agg_ad_2sample",
    oracle="""
WITH pts AS (
  SELECT value, CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS in_a
  FROM events
), g AS (
  SELECT value,
         CAST(sum(in_a) AS BIGINT) AS ca,
         CAST(sum(1 - in_a) AS BIGINT) AS cb
  FROM pts GROUP BY 1
), n AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb FROM g
), c AS (
  SELECT ca, cb,
         CAST(sum(ca) OVER w AS BIGINT) AS cum_a,
         CAST(sum(cb) OVER w AS BIGINT) AS cum_b
  FROM g
  WINDOW w AS (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
), s AS (
  SELECT CAST(sum(CASE WHEN cum_a + cum_b < na + nb THEN
           CAST(floor(
             (ca + cb)
             * (((CAST(na + nb AS DOUBLE) * cum_a - CAST(na AS DOUBLE) * (cum_a + cum_b))
                 * (CAST(na + nb AS DOUBLE) * cum_a - CAST(na AS DOUBLE) * (cum_a + cum_b)))
                / (CAST(cum_a + cum_b AS DOUBLE)
                   * ((na + nb) - (cum_a + cum_b))))
             * 1000000.0 + 0.5) AS BIGINT)
           ELSE 0 END) AS BIGINT) AS sq
  FROM c, n
)
SELECT n.na, n.nb,
       floor(((1.0 / na + 1.0 / nb)
              * (CAST(sq AS DOUBLE) / 1000000.0) / (na + nb))
             * 1000000 + 0.5) / 1000000.0 AS ad_stat,
       CASE WHEN ((1.0 / na + 1.0 / nb)
                  * (CAST(sq AS DOUBLE) / 1000000.0) / (na + nb)) > 2.492
            THEN 'distributions_differ' ELSE 'no_difference' END AS verdict
FROM s, n
""",
)
def agg_ad_2sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-SAMPLE ANDERSON-DARLING (Scholz-Stephens A2_kN, k = 2,
    right-continuous-ECDF form): the tail-weighted EDF test — the
    1/(H(1-H)) weight makes deviations in the DISTRIBUTION TAILS count
    where CvM weighs uniformly and KS sees one point, so this is the
    member of the EDF trio that catches tail-only drift (exactly the
    failure mode of heavy-tailed value corpora).  For k = 2 the two
    sample terms coincide algebraically, so A2 = (1/na + 1/nb)/N *
    sum_v t_v (N cumA - na cum)^2 / (cum (N - cum)) over values below
    the pooled maximum.  Verdict vs the 5% asymptotic critical value
    2.492 (Scholz-Stephens Table 1, literal).

    Same pico/micro-quantize-then-int-sum discipline as
    ``agg_cvm_test`` (micro here — the weighted terms are O(t_v), so
    1e6 keeps the int sum < 2^63 at the sf1 twin while both engines
    still derive the identical quantized integer per value); one
    distributed_rank pass, no single-task window."""
    ev = table(spark, sf_dir, "events")
    g = (
        ev.select(
            "value",
            F.when(F.col("event_id") % 2 == 0, 1).otherwise(0).alias("in_a"),
        )
        .groupBy("value")
        .agg(
            F.sum("in_a").cast("long").alias("ca"),
            F.sum(1 - F.col("in_a")).cast("long").alias("cb"),
        )
    )
    c = distributed_rank(g, ["value"], sum_cols=("ca", "cb"))
    na, nb = F.col("_tot_ca"), F.col("_tot_cb")
    nn = na + nb
    cum = F.col("_cum_ca") + F.col("_cum_cb")
    d = (
        nn.cast("double") * F.col("_cum_ca")
        - na.cast("double") * cum
    )
    term = (F.col("ca") + F.col("cb")) * (
        (d * d) / (cum.cast("double") * (nn - cum))
    )
    s = (
        c.select(
            na.alias("na"),
            nb.alias("nb"),
            F.when(cum < nn, F.floor(term * 1000000.0 + 0.5).cast("long"))
            .otherwise(F.lit(0))
            .alias("tq"),
        )
        .groupBy("na", "nb")
        .agg(F.sum("tq").cast("long").alias("sq"))
    )
    ad = (
        (1.0 / F.col("na") + 1.0 / F.col("nb"))
        * (F.col("sq").cast("double") / 1000000.0)
        / (F.col("na") + F.col("nb"))
    )
    return s.select(
        "na",
        "nb",
        r6(ad).alias("ad_stat"),
        F.when(ad > 2.492, "distributions_differ")
        .otherwise("no_difference")
        .alias("verdict"),
    )


@register(
    "agg_quade_test",
    oracle="""
WITH cell AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', date_trunc('day', ts))
              AS BIGINT) AS b,
         event_type AS tr,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
r2 AS (
  SELECT a.b, a.tr,
         2 * CAST(sum(CASE WHEN x.y < a.y THEN 1 ELSE 0 END) AS BIGINT)
         + CAST(sum(CASE WHEN x.y = a.y THEN 1 ELSE 0 END) AS BIGINT) + 1
           AS rr2
  FROM cell a JOIN cell x ON x.b = a.b
  GROUP BY a.b, a.tr
),
kk AS (SELECT CAST(count(DISTINCT tr) AS BIGINT) AS k,
              CAST(count(DISTINCT b) AS BIGINT) AS nb FROM cell),
rng AS (
  SELECT b, CAST(max(y) - min(y) AS BIGINT) AS w FROM cell GROUP BY 1
),
q2 AS (
  SELECT a.b,
         2 * CAST(sum(CASE WHEN x.w < a.w THEN 1 ELSE 0 END) AS BIGINT)
         + CAST(sum(CASE WHEN x.w = a.w THEN 1 ELSE 0 END) AS BIGINT) + 1
           AS qq2
  FROM rng a JOIN rng x ON 1 = 1
  GROUP BY a.b, a.w
),
s4 AS (
  SELECT r2.b, r2.tr, q2.qq2 * (r2.rr2 - (kk.k + 1)) AS s
  FROM r2 JOIN q2 ON r2.b = q2.b, kk
),
tot AS (
  SELECT CAST(sum(s * s) AS BIGINT) AS a24 FROM s4
),
tj AS (
  SELECT tr, CAST(sum(s) AS BIGINT) AS sj FROM s4 GROUP BY 1
),
bb AS (SELECT CAST(sum(sj * sj) AS BIGINT) AS sb4 FROM tj)
SELECT nb AS n_blocks, k AS n_treatments,
       floor(CAST((nb - 1) AS DOUBLE) * sb4 / (CAST(nb AS DOUBLE) * a24 - sb4)
             * 1000000 + 0.5) / 1000000.0 AS f_stat,
       CAST(k - 1 AS BIGINT) AS df1,
       CAST((nb - 1) * (k - 1) AS BIGINT) AS df2
FROM kk, tot, bb
""",
)
def agg_quade_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUADE TEST: the range-weighted Friedman — do the event types
    differ in daily revenue when each DAY is its own block, with days
    that show a WIDER spread counting more?  Friedman
    (``agg_friedman``) throws away how big each block's differences
    are; Quade weights each block by the rank of its range, recovering
    most of the parametric F test's power on well-behaved data while
    staying rank-based.  F = (b-1) B / (A - B), reported with its
    (k-1, (b-1)(k-1)) dfs — statistic + df, no p (the anova_f
    convention for F outputs).

    EVERYTHING is exact int64: within-block midranks (k = 5 values) and
    block-range midranks (b days) come from bounded self-joins in
    doubled form; the weighted centered scores S = Q2*(r2 - (k+1)) are
    quadrupled-scale ints whose scaling cancels in F, which evaluates
    as the exact ratio (b-1)*sum(Sj^2) / (b*sum(S^2) - sum(Sj^2)) with
    one pinned double division.  Scale: day x type bounded cells."""
    ev = table(spark, sf_dir, "events")
    cell = ev.groupBy(
        F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("b"),
        F.col("event_type").alias("tr"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("y"))
    a = cell.select(F.col("b").alias("ba"), F.col("tr").alias("tra"), F.col("y").alias("ya"))
    x = cell.select(F.col("b").alias("bx"), F.col("y").alias("yx"))
    r2 = (
        a.join(F.broadcast(x), F.col("bx") == F.col("ba"))
        .groupBy("ba", "tra")
        .agg(
            (
                2 * F.sum(F.when(F.col("yx") < F.col("ya"), 1).otherwise(0))
                + F.sum(F.when(F.col("yx") == F.col("ya"), 1).otherwise(0))
                + 1
            )
            .cast("long")
            .alias("rr2")
        )
    )
    kk = cell.agg(
        F.countDistinct("tr").cast("long").alias("k"),
        F.countDistinct("b").cast("long").alias("nb"),
    )
    rng = cell.groupBy("b").agg((F.max("y") - F.min("y")).cast("long").alias("w"))
    ra = rng.select(F.col("b").alias("rb"), F.col("w").alias("wa"))
    rx = rng.select(F.col("w").alias("wx"))
    q2 = (
        ra.crossJoin(F.broadcast(rx))
        .groupBy("rb", "wa")
        .agg(
            (
                2 * F.sum(F.when(F.col("wx") < F.col("wa"), 1).otherwise(0))
                + F.sum(F.when(F.col("wx") == F.col("wa"), 1).otherwise(0))
                + 1
            )
            .cast("long")
            .alias("qq2")
        )
        .select(F.col("rb").alias("b"), "qq2")
    )
    s4 = (
        r2.select(F.col("ba").alias("b"), F.col("tra").alias("tr"), "rr2")
        .join(F.broadcast(q2), "b")
        .crossJoin(F.broadcast(kk))
        .select(
            "b",
            "tr",
            (F.col("qq2") * (F.col("rr2") - (F.col("k") + 1))).alias("s"),
        )
    )
    tot = s4.agg(F.sum(F.col("s") * F.col("s")).cast("long").alias("a24"))
    tj = s4.groupBy("tr").agg(F.sum("s").cast("long").alias("sj"))
    bb = tj.agg(F.sum(F.col("sj") * F.col("sj")).cast("long").alias("sb4"))
    out = kk.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(bb))
    return out.select(
        F.col("nb").alias("n_blocks"),
        F.col("k").alias("n_treatments"),
        r6(
            (F.col("nb") - 1).cast("double")
            * F.col("sb4")
            / (F.col("nb").cast("double") * F.col("a24") - F.col("sb4"))
        ).alias("f_stat"),
        (F.col("k") - 1).cast("long").alias("df1"),
        ((F.col("nb") - 1) * (F.col("k") - 1)).cast("long").alias("df2"),
    )
