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

    def q4(x):
        return F.floor(x * 10000 + 0.5) / 10000.0

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

    def q4(x):
        return F.floor(x * 10000 + 0.5) / 10000.0

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
