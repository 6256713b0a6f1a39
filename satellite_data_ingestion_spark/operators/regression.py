"""Regression-diagnostics / econometrics battery (round 15, wave 3):
the checks an analytics team runs on the DAILY series once a trend OLS
(``agg_trend_ols``) exists — is the residual variance stable
(Breusch-Pagan), did the relationship BREAK mid-window (Chow), which
days drive the fit (Cook's distance / leverage), is the series a random
walk or mean-reverting (Lo-MacKinlay variance ratio), and do two
event-type revenue series share a common stochastic trend
(Engle-Granger cointegration).

Scale shape shared by the whole battery: ONE map-side-combined pass
over the fact table to the CALENDAR-BOUNDED daily grain (dense 30-day
grid in the corpus; never fact volume), then every regression moment,
residual, and fold runs on that bounded frame.  The only data-grain
work at 100 TB is the first combine.

Float discipline (BASELINE.md, operators/hypothesis.py): daily revenue
is exact int64 cents and the day index an exact small int, so raw
moments (sums of x, x^2, y, xy, y^2) are exact int64 within documented
bounds (y^2 sums ~3e18 at the sf1 twin — inside int64; the n*syy-style
centered products would NOT be, so centering happens in double in the
IDENTICAL algebraic order both engines); residuals are pinned double
expressions of those moments; order-sensitive residual sums fold over
the day-sorted array (``_ordfold`` == DuckDB ``list_reduce(list(v
ORDER BY x))``); chi-square p via Wilson-Hilferty + shared Phi (F-stat
ops report the statistic + effect decomposition, no p — the
``agg_anova_f`` convention); outputs half-up micro-quantize.

Capability mapping: extends SURVEY §2's aggregate/trend battery
(`agg_trend_ols`, `agg_its_segmented`, `agg_durbin_watson`) with the
post-fit diagnostics; the reference repo (a 454-line ingestion
scheduler) has no statistical layer — this is engine-native analytics
over the landed corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from .hypothesis import _norm_cdf, _norm_cdf_sql, q4, r6
from .monitoring import _ordfold, _wh_p, _wh_p_sql

_CENTS = "CAST(round(value * 100) AS BIGINT)"

# Daily total-revenue series with a dense 0-based day index x: the shared
# base CTE of the battery (one combine to the calendar grain).
_BASE_SQL = f"""daily AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', date_trunc('day', ts))
              AS BIGINT) AS dd,
         CAST(sum({_CENTS}) AS BIGINT) AS y
  FROM events GROUP BY 1
),
base AS (SELECT dd - (SELECT min(dd) FROM daily) AS x, y FROM daily),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM base
),
ols AS (
  SELECT n, sx, sxx, sy, sxy,
         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS b
  FROM mom
),
ols2 AS (SELECT *, (CAST(sy AS DOUBLE) - b * sx) / n AS a FROM ols),
res AS (SELECT x, (CAST(y AS DOUBLE) - (a + b * x)) AS e FROM base, ols2)"""


def _daily_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(x, y): dense 0-based day index x, exact int64 daily cents y."""
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("dd")
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("y"))
        # Calendar-bounded (~30 rows) and consumed several times by every
        # caller (min-day rebase here; moments / lag self-joins / ends
        # downstream) — materialize the one corpus scan once (guide §2.4;
        # the wave-N tiny-histogram discipline).
        .localCheckpoint(eager=True)
    )
    mn = daily.agg(F.min("dd").alias("mn"))
    return daily.crossJoin(F.broadcast(mn)).select(
        (F.col("dd") - F.col("mn")).alias("x"), "y"
    )


def _ols2(base: DataFrame) -> DataFrame:
    """One row (n, sx, sxx, sy, sxy, b, a) — the Spark twin of the
    ols2 CTE, identical operation order."""
    mom = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    b = (
        F.col("n").cast("double") * F.col("sxy")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n").cast("double") * F.col("sxx")
        - F.col("sx").cast("double") * F.col("sx")
    )
    ols = mom.withColumn("b", b)
    return ols.withColumn(
        "a", (F.col("sy").cast("double") - F.col("b") * F.col("sx")) / F.col("n")
    )


def _res(base: DataFrame, ols2: DataFrame) -> DataFrame:
    """(x, e): pinned-double residuals of the daily OLS."""
    return base.crossJoin(F.broadcast(ols2)).select(
        "x",
        (
            F.col("y").cast("double") - (F.col("a") + F.col("b") * F.col("x"))
        ).alias("e"),
    )


@register(
    "agg_breusch_pagan",
    oracle=f"""
WITH {_BASE_SQL},
f AS (
  SELECT list_reduce(list_prepend(0.0, list(e * e ORDER BY x)),
                     (p, q) -> p + q) AS se2,
         list_reduce(list_prepend(0.0, list(x * (e * e) ORDER BY x)),
                     (p, q) -> p + q) AS sxe2,
         list_reduce(list_prepend(0.0, list((e * e) * (e * e) ORDER BY x)),
                     (p, q) -> p + q) AS se4
  FROM res
),
lm AS (
  SELECT n, b,
         (CAST(n AS DOUBLE) * sxe2 - CAST(sx AS DOUBLE) * se2) AS num,
         (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS dx,
         (CAST(n AS DOUBLE) * se4 - se2 * se2) AS de
  FROM f, ols2
),
st AS (SELECT n, b, CAST(n AS DOUBLE) * (num * num / (dx * de)) AS lm FROM lm)
SELECT n AS n_days,
       floor(b * 10000 + 0.5) / 10000.0 AS slope,
       floor(lm * 1000000 + 0.5) / 1000000.0 AS lm,
       floor({_wh_p_sql("lm", "1.0")} * 1000000 + 0.5) / 1000000.0 AS p
FROM st
""",
)
def agg_breusch_pagan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BREUSCH-PAGAN heteroskedasticity test (Koenker's studentized
    form) on the daily-revenue trend OLS: does residual VARIANCE grow
    or shrink along the window?  Heteroskedastic residuals mean the
    trend's standard errors are lies — this is the check that gates
    every downstream CI on ``agg_trend_ols``.  LM = n * R^2 of the
    auxiliary regression e^2 ~ x, which reduces to one pinned double
    expression of the centered moments; LM ~ chi2(1) under the null,
    p via the engine's Wilson-Hilferty + shared-Phi convention.

    Raw OLS moments are exact int64 at the daily grain; the three
    residual sums (e^2, x e^2, e^4) fold day-ordered.  Scale: one
    combine to the 30-row calendar frame; everything else is bounded."""
    base = _daily_base(spark, sf_dir)
    o = _ols2(base)
    res = _res(base, o)
    e2 = F.col("e") * F.col("e")
    f = res.agg(
        _ordfold(F.col("x"), e2).alias("se2"),
        _ordfold(F.col("x"), F.col("x") * e2).alias("sxe2"),
        _ordfold(F.col("x"), e2 * e2).alias("se4"),
    )
    lm = f.crossJoin(F.broadcast(o)).select(
        "n",
        "b",
        (
            F.col("n").cast("double") * F.col("sxe2")
            - F.col("sx").cast("double") * F.col("se2")
        ).alias("num"),
        (
            F.col("n").cast("double") * F.col("sxx")
            - F.col("sx").cast("double") * F.col("sx")
        ).alias("dx"),
        (F.col("n").cast("double") * F.col("se4") - F.col("se2") * F.col("se2")).alias(
            "de"
        ),
    )
    st = lm.select(
        "n",
        "b",
        (
            F.col("n").cast("double")
            * (F.col("num") * F.col("num") / (F.col("dx") * F.col("de")))
        ).alias("lm"),
    )
    return st.select(
        F.col("n").alias("n_days"),
        q4(F.col("b")).alias("slope"),
        r6(F.col("lm")).alias("lm"),
        r6(_wh_p(F.col("lm"), F.lit(1.0))).alias("p"),
    )


@register(
    "agg_chow_test",
    oracle=f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', date_trunc('day', ts))
              AS BIGINT) AS dd,
         CAST(sum({_CENTS}) AS BIGINT) AS y
  FROM events GROUP BY 1
),
base AS (SELECT dd - (SELECT min(dd) FROM daily) AS x, y FROM daily),
sp AS (SELECT CAST(max(x) AS BIGINT) AS mx FROM base),
rg AS (SELECT CASE WHEN 2 * x < mx THEN 0 ELSE 1 END AS h, x, y FROM base, sp),
rm AS (
  SELECT h, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM rg GROUP BY 1
),
ssr AS (
  SELECT h, n,
         ((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
          - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
            * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
            / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) / n AS s
  FROM rm
),
pool AS (
  SELECT CAST(sum(n) AS BIGINT) AS n,
         CAST(sum(sx) AS BIGINT) AS sx, CAST(sum(sxx) AS BIGINT) AS sxx,
         CAST(sum(sy) AS BIGINT) AS sy, CAST(sum(sxy) AS BIGINT) AS sxy,
         CAST(sum(syy) AS BIGINT) AS syy
  FROM rm
),
pssr AS (
  SELECT n,
         ((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
          - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
            * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
            / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) / n AS s
  FROM pool
),
st AS (
  SELECT pssr.n,
         (SELECT CAST(n AS BIGINT) FROM ssr WHERE h = 0) AS n1,
         (SELECT CAST(n AS BIGINT) FROM ssr WHERE h = 1) AS n2,
         pssr.s AS ssr_pooled,
         (SELECT s FROM ssr WHERE h = 0) AS ssr1,
         (SELECT s FROM ssr WHERE h = 1) AS ssr2
  FROM pssr
)
SELECT n AS n_days, n1, n2,
       floor(ssr_pooled * 10000 + 0.5) / 10000.0 AS ssr_pooled,
       floor((ssr1 + ssr2) * 10000 + 0.5) / 10000.0 AS ssr_split,
       floor(((ssr_pooled - (ssr1 + ssr2)) / 2.0)
             / ((ssr1 + ssr2) / (CAST(n AS DOUBLE) - 4)) * 1000000 + 0.5)
         / 1000000.0 AS f_stat
FROM st
""",
)
def agg_chow_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHOW STRUCTURAL-BREAK TEST at the window midpoint: does ONE
    daily-revenue trend line fit the whole month, or did slope/intercept
    BREAK halfway?  F = ((SSR_pooled - SSR_1 - SSR_2)/k) /
    ((SSR_1 + SSR_2)/(n - 2k)) with k = 2 parameters per regime — the
    statistic behind every "did the deploy change the trend" question;
    reports the F and both SSR readouts (statistic + decomposition, no
    p — the ``agg_anova_f`` convention for F tests).

    The midpoint split is pure integer algebra (2x < max(x)); per-regime
    raw moments are exact int64 (sum y^2 ~3e18 at the sf1 twin —
    documented bound); each SSR is the centered-moment closed form
    evaluated in identical double order (the n*syy centering would
    overflow int64, so it is double in BOTH engines).  Scale: one
    combine to the calendar frame, then 2-row algebra."""
    base = _daily_base(spark, sf_dir)
    sp = base.agg(F.max("x").cast("long").alias("mx"))
    rg = base.crossJoin(F.broadcast(sp)).select(
        F.when(2 * F.col("x") < F.col("mx"), 0).otherwise(1).alias("h"), "x", "y"
    )
    rm = rg.groupBy("h").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )

    def ssr_col():
        n = F.col("n").cast("double")
        dyy = n * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
        dxy = n * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
        dx = n * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
        return (dyy - dxy * dxy / dx) / F.col("n")

    ssr = rm.select("h", "n", ssr_col().alias("s"))
    pool = rm.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("sx").cast("long").alias("sx"),
        F.sum("sxx").cast("long").alias("sxx"),
        F.sum("sy").cast("long").alias("sy"),
        F.sum("sxy").cast("long").alias("sxy"),
        F.sum("syy").cast("long").alias("syy"),
    )
    pssr = pool.select("n", ssr_col().alias("s"))
    s0 = ssr.filter(F.col("h") == 0).select(
        F.col("n").alias("n1"), F.col("s").alias("ssr1")
    )
    s1 = ssr.filter(F.col("h") == 1).select(
        F.col("n").alias("n2"), F.col("s").alias("ssr2")
    )
    st = pssr.crossJoin(F.broadcast(s0)).crossJoin(F.broadcast(s1))
    split = F.col("ssr1") + F.col("ssr2")
    return st.select(
        F.col("n").alias("n_days"),
        "n1",
        "n2",
        q4(F.col("s")).alias("ssr_pooled"),
        q4(split).alias("ssr_split"),
        r6(
            ((F.col("s") - split) / 2.0) / (split / (F.col("n").cast("double") - 4))
        ).alias("f_stat"),
    )


@register(
    "agg_cooks_distance",
    oracle=f"""
WITH {_BASE_SQL},
se AS (
  SELECT list_reduce(list_prepend(0.0, list(e * e ORDER BY x)),
                     (p, q) -> p + q) AS se2
  FROM res
),
dg AS (
  SELECT res.x, res.e,
         1.0 / n + (res.x - CAST(sx AS DOUBLE) / n)
                   * (res.x - CAST(sx AS DOUBLE) / n)
                   / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) AS h,
         se2 / (n - 2) AS s2
  FROM res, ols2, se
),
ck AS (
  SELECT x, e, h,
         e * e * h / (2.0 * s2 * ((1.0 - h) * (1.0 - h))) AS cd
  FROM dg
)
SELECT x AS day_index,
       floor(e * 10000 + 0.5) / 10000.0 AS resid,
       floor(h * 1000000 + 0.5) / 1000000.0 AS leverage,
       floor(cd * 1000000 + 0.5) / 1000000.0 AS cooks_d
FROM ck
ORDER BY cd DESC, x
LIMIT 10
""",
)
def agg_cooks_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COOK'S DISTANCE + leverage for the daily-revenue trend OLS: the
    10 days that most move the fitted line — the influence diagnostic
    that turns "the trend is significant" into "the trend is three
    spike days".  For simple OLS both are closed forms: h_i = 1/n +
    (x - xbar)^2/Sxx and D_i = e_i^2 h_i / (p s^2 (1-h_i)^2) with
    p = 2, s^2 = SSR/(n-2) — one pinned double expression per day from
    the shared exact moments; the single order-sensitive sum (SSR)
    folds day-ordered.

    The top-10 sort runs on the UNROUNDED D (bit-identical in both
    engines by pinned algebra) with the day index as tiebreak — the
    bradley_terry sort discipline.  Scale: calendar-bounded frame."""
    base = _daily_base(spark, sf_dir)
    o = _ols2(base)
    res = _res(base, o)
    se = res.agg(_ordfold(F.col("x"), F.col("e") * F.col("e")).alias("se2"))
    dg = res.crossJoin(F.broadcast(o)).crossJoin(F.broadcast(se))
    n = F.col("n")
    h = (
        1.0 / n
        + (F.col("x") - F.col("sx").cast("double") / n)
        * (F.col("x") - F.col("sx").cast("double") / n)
        / (F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / n)
    )
    dg = dg.select(
        "x", "e", h.alias("h"), (F.col("se2") / (n - 2)).alias("s2")
    )
    ck = dg.select(
        "x",
        "e",
        "h",
        (
            F.col("e")
            * F.col("e")
            * F.col("h")
            / (2.0 * F.col("s2") * ((1.0 - F.col("h")) * (1.0 - F.col("h"))))
        ).alias("cd"),
    )
    return (
        ck.orderBy(F.desc("cd"), "x")
        .limit(10)
        .select(
            F.col("x").alias("day_index"),
            q4(F.col("e")).alias("resid"),
            r6(F.col("h")).alias("leverage"),
            r6(F.col("cd")).alias("cooks_d"),
        )
    )


_VR_Q = 5


@register(
    "ext_ts_variance_ratio",
    oracle=f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', date_trunc('day', ts))
              AS BIGINT) AS dd,
         CAST(sum({_CENTS}) AS BIGINT) AS y
  FROM events GROUP BY 1
),
base AS (SELECT dd - (SELECT min(dd) FROM daily) AS x, y FROM daily),
ends AS (
  SELECT CAST(count(*) AS BIGINT) - 1 AS tt,
         (SELECT y FROM base ORDER BY x LIMIT 1) AS y0,
         (SELECT y FROM base ORDER BY x DESC LIMIT 1) AS y1
  FROM base
),
mu AS (SELECT tt, (CAST(y1 AS DOUBLE) - y0) / tt AS mu FROM ends),
d1 AS (
  SELECT list_reduce(list_prepend(0.0, list(
           (CAST(a.y - b.y AS DOUBLE) - mu) * (CAST(a.y - b.y AS DOUBLE) - mu)
           ORDER BY a.x)), (p, q) -> p + q) AS sa
  FROM base a JOIN base b ON b.x = a.x - 1, mu
),
dq AS (
  SELECT list_reduce(list_prepend(0.0, list(
           (CAST(a.y - b.y AS DOUBLE) - {_VR_Q} * mu)
           * (CAST(a.y - b.y AS DOUBLE) - {_VR_Q} * mu)
           ORDER BY a.x)), (p, q) -> p + q) AS sq
  FROM base a JOIN base b ON b.x = a.x - {_VR_Q}, mu
),
st AS (
  SELECT tt,
         (sq / ({_VR_Q} * (tt - {_VR_Q} + 1)
                * (1.0 - CAST({_VR_Q} AS DOUBLE) / tt)))
           / (sa / (tt - 1)) AS vr
  FROM d1, dq, mu
),
zz AS (
  SELECT tt, vr,
         (vr - 1.0) / sqrt(2.0 * (2 * {_VR_Q} - 1) * ({_VR_Q} - 1)
                           / (3.0 * {_VR_Q} * tt)) AS z
  FROM st
)
SELECT tt + 1 AS n_days, CAST({_VR_Q} AS BIGINT) AS q,
       floor(vr * 1000000 + 0.5) / 1000000.0 AS vr,
       floor(z * 1000000 + 0.5) / 1000000.0 AS z,
       floor(2.0 * (1.0 - {_norm_cdf_sql("abs(z)")}) * 1000000 + 0.5)
         / 1000000.0 AS p,
       CASE WHEN z > 1.959963984540054 THEN 'trending'
            WHEN z < -1.959963984540054 THEN 'mean_reverting'
            ELSE 'random_walk' END AS verdict
FROM zz
""",
)
def ext_ts_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LO-MACKINLAY VARIANCE RATIO VR(q=5) on daily revenue: is the
    series a random walk (VR ~ 1), trending / positively autocorrelated
    (VR > 1), or mean-reverting (VR < 1)?  The workhorse random-walk
    test — variance of q-day changes should be exactly q times the
    variance of 1-day changes under the null.

    Both change variances come from exact-int day-offset self-joins on
    the DENSE calendar grid (never a window over fact rows); the
    overlapping q-difference sum uses Lo-MacKinlay's unbiased
    denominator q(T-q+1)(1-q/T); each squared-deviation sum folds
    day-ordered; z uses the homoskedastic asymptotic variance
    2(2q-1)(q-1)/(3qT) and the shared Phi (1.96 literal = the exact
    two-sided 5% normal quantile, identical in both engines)."""
    base = _daily_base(spark, sf_dir)
    ends = base.agg(
        (F.count(F.lit(1)).cast("long") - 1).alias("tt"),
        F.min_by("y", "x").alias("y0"),
        F.max_by("y", "x").alias("y1"),
    )
    mu = ends.select(
        "tt", ((F.col("y1").cast("double") - F.col("y0")) / F.col("tt")).alias("mu")
    )
    a = base.select(F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = base.select(F.col("x").alias("xb"), F.col("y").alias("yb"))

    def diff_fold(lag: int, scale):
        d = (F.col("ya") - F.col("yb")).cast("double") - scale * F.col("mu")
        return (
            a.join(F.broadcast(b), F.col("xb") == F.col("xa") - lag)
            .crossJoin(F.broadcast(mu))
            .agg(_ordfold(F.col("xa"), d * d).alias("s"))
        )

    d1 = diff_fold(1, F.lit(1)).withColumnRenamed("s", "sa")
    dq = diff_fold(_VR_Q, F.lit(_VR_Q)).withColumnRenamed("s", "sq")
    st = (
        d1.crossJoin(F.broadcast(dq))
        .crossJoin(F.broadcast(mu))
        .select(
            "tt",
            (
                (
                    F.col("sq")
                    / (
                        _VR_Q
                        * (F.col("tt") - _VR_Q + 1)
                        * (1.0 - F.lit(float(_VR_Q)) / F.col("tt"))
                    )
                )
                / (F.col("sa") / (F.col("tt") - 1))
            ).alias("vr"),
        )
    )
    zz = st.select(
        "tt",
        "vr",
        (
            (F.col("vr") - 1.0)
            / F.sqrt(2.0 * (2 * _VR_Q - 1) * (_VR_Q - 1) / (3.0 * _VR_Q * F.col("tt")))
        ).alias("z"),
    )
    crit = 1.959963984540054
    return zz.select(
        (F.col("tt") + 1).alias("n_days"),
        F.lit(_VR_Q).cast("long").alias("q"),
        r6(F.col("vr")).alias("vr"),
        r6(F.col("z")).alias("z"),
        r6(2.0 * (1.0 - _norm_cdf(F.abs(F.col("z"))))).alias("p"),
        F.when(F.col("z") > crit, "trending")
        .when(F.col("z") < -crit, "mean_reverting")
        .otherwise("random_walk")
        .alias("verdict"),
    )


# Engle-Granger 5% critical value for the residual ADF (two variables,
# constant in the cointegrating regression, asymptotic; MacKinnon 1991).
_EG_CRIT_5PCT = -3.37


@register(
    "ext_ts_engle_granger",
    oracle=f"""
WITH cv AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', date_trunc('day', ts))
              AS BIGINT) AS dd,
         CAST(sum(CASE WHEN event_type = 'click' THEN {_CENTS} ELSE 0 END)
              AS BIGINT) AS c,
         CAST(sum(CASE WHEN event_type = 'view' THEN {_CENTS} ELSE 0 END)
              AS BIGINT) AS v
  FROM events GROUP BY 1
),
base AS (SELECT dd - (SELECT min(dd) FROM cv) AS x, c, v FROM cv),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(c) AS BIGINT) AS sc,
         CAST(sum(c * c) AS BIGINT) AS scc,
         CAST(sum(v) AS BIGINT) AS sv,
         CAST(sum(c * v) AS BIGINT) AS scv
  FROM base
),
ols AS (
  SELECT n,
         (CAST(n AS DOUBLE) * scv - CAST(sc AS DOUBLE) * sv)
           / (CAST(n AS DOUBLE) * scc - CAST(sc AS DOUBLE) * sc) AS beta,
         sc, sv
  FROM mom
),
ols2 AS (SELECT n, beta, (CAST(sv AS DOUBLE) - beta * sc) / n AS alpha FROM ols),
res AS (
  SELECT x, (CAST(v AS DOUBLE) - (alpha + beta * c)) AS e FROM base, ols2
),
adf AS (
  SELECT list_reduce(list_prepend(0.0, list(b.e * (a.e - b.e) ORDER BY a.x)),
                     (p, q) -> p + q) AS num,
         list_reduce(list_prepend(0.0, list(b.e * b.e ORDER BY a.x)),
                     (p, q) -> p + q) AS den
  FROM res a JOIN res b ON b.x = a.x - 1
),
rho AS (SELECT num / den AS rho, den FROM adf),
s2 AS (
  SELECT rho, den,
         list_reduce(list_prepend(0.0, list(
             ((a.e - b.e) - rho * b.e) * ((a.e - b.e) - rho * b.e)
             ORDER BY a.x)), (p, q) -> p + q) AS sse,
         CAST(count(*) AS BIGINT) AS m
  FROM res a JOIN res b ON b.x = a.x - 1, rho
  GROUP BY rho, den
),
st AS (
  SELECT rho, rho / sqrt((sse / (m - 1)) / den) AS adf_t FROM s2
)
SELECT (SELECT CAST(n AS BIGINT) FROM ols2) AS n_days,
       floor((SELECT beta FROM ols2) * 1000000 + 0.5) / 1000000.0 AS beta,
       floor((SELECT alpha FROM ols2) * 10000 + 0.5) / 10000.0 AS alpha,
       floor(rho * 1000000 + 0.5) / 1000000.0 AS rho,
       floor(adf_t * 1000000 + 0.5) / 1000000.0 AS adf_t,
       CASE WHEN adf_t < {_EG_CRIT_5PCT} THEN 'cointegrated'
            ELSE 'not_cointegrated' END AS verdict
FROM st
""",
)
def ext_ts_engle_granger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENGLE-GRANGER COINTEGRATION between the click and view daily
    revenue series: regress view ~ click (exact-int moments, pinned
    double closed form), then run a no-constant ADF(0) Dickey-Fuller
    regression on the residuals — if the residual drifts back (adf_t
    below the MacKinnon 5% critical value -3.37), the two
    series share a common stochastic trend and spread-based monitoring
    is valid; if not, any click/view "ratio alarm" is statistically
    unfounded.

    Both series come from ONE conditional-aggregation pass (no second
    scan); the lag-1 products fold day-ordered over the dense calendar
    grid's exact-int self-join; rho, its t-stat, and the verdict are
    pinned double algebra.  Scale: calendar-bounded past the first
    combine."""
    ev = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    cv = ev.groupBy(
        F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("dd")
    ).agg(
        F.sum(F.when(F.col("event_type") == "click", cents).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(F.when(F.col("event_type") == "view", cents).otherwise(0))
        .cast("long")
        .alias("v"),
    )
    mn = cv.agg(F.min("dd").alias("mn"))
    base = cv.crossJoin(F.broadcast(mn)).select(
        (F.col("dd") - F.col("mn")).alias("x"), "c", "v"
    )
    mom = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("scc"),
        F.sum("v").cast("long").alias("sv"),
        F.sum(F.col("c") * F.col("v")).cast("long").alias("scv"),
    )
    beta = (
        F.col("n").cast("double") * F.col("scv")
        - F.col("sc").cast("double") * F.col("sv")
    ) / (
        F.col("n").cast("double") * F.col("scc")
        - F.col("sc").cast("double") * F.col("sc")
    )
    o = mom.withColumn("beta", beta).withColumn(
        "alpha", (F.col("sv").cast("double") - F.col("beta") * F.col("sc")) / F.col("n")
    )
    res = base.crossJoin(F.broadcast(o.select("n", "beta", "alpha"))).select(
        "x",
        (
            F.col("v").cast("double") - (F.col("alpha") + F.col("beta") * F.col("c"))
        ).alias("e"),
    )
    a = res.select(F.col("x").alias("xa"), F.col("e").alias("ea"))
    b = res.select(F.col("x").alias("xb"), F.col("e").alias("eb"))
    lag = a.join(F.broadcast(b), F.col("xb") == F.col("xa") - 1)
    adf = lag.agg(
        _ordfold(F.col("xa"), F.col("eb") * (F.col("ea") - F.col("eb"))).alias("num"),
        _ordfold(F.col("xa"), F.col("eb") * F.col("eb")).alias("den"),
    )
    rho = adf.select((F.col("num") / F.col("den")).alias("rho"), "den")
    s2 = lag.crossJoin(F.broadcast(rho)).agg(
        F.first("rho").alias("rho"),
        F.first("den").alias("den"),
        _ordfold(
            F.col("xa"),
            ((F.col("ea") - F.col("eb")) - F.col("rho") * F.col("eb"))
            * ((F.col("ea") - F.col("eb")) - F.col("rho") * F.col("eb")),
        ).alias("sse"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    st = s2.select(
        "rho",
        (
            F.col("rho")
            / F.sqrt((F.col("sse") / (F.col("m") - 1)) / F.col("den"))
        ).alias("adf_t"),
    )
    out = (
        o.select("n", "beta", "alpha")
        .crossJoin(F.broadcast(st))
    )
    return out.select(
        F.col("n").alias("n_days"),
        r6(F.col("beta")).alias("beta"),
        q4(F.col("alpha")).alias("alpha"),
        r6(F.col("rho")).alias("rho"),
        r6(F.col("adf_t")).alias("adf_t"),
        F.when(F.col("adf_t") < _EG_CRIT_5PCT, "cointegrated")
        .otherwise("not_cointegrated")
        .alias("verdict"),
    )


@register(
    "agg_price_elasticity",
    oracle="""
WITH pts AS (
  SELECT CAST(floor(ln(l_extendedprice / l_quantity) * 10000 + 0.5)
              AS BIGINT) AS x,
         CAST(floor(ln(l_quantity) * 10000 + 0.5) AS BIGINT) AS y
  FROM lineitem
),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM pts
),
cen AS (
  SELECT n,
         CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS dxx,
         CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS dyy,
         CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy AS dxy,
         CAST(sx AS DOUBLE) / n / 10000.0 AS mx,
         CAST(sy AS DOUBLE) / n / 10000.0 AS my
  FROM mom
)
SELECT n,
       floor(dxy / dxx * 1000000 + 0.5) / 1000000.0 AS elasticity,
       floor((my - dxy / dxx * mx) * 10000 + 0.5) / 10000.0 AS intercept,
       floor(dxy / sqrt(dxx * dyy) * (dxy / sqrt(dxx * dyy))
             * 1000000 + 0.5) / 1000000.0 AS r2,
       floor(exp(mx) * 10000 + 0.5) / 10000.0 AS geomean_unit_price
FROM cen
""",
)
def agg_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRICE ELASTICITY OF DEMAND: the log-log OLS slope of quantity on
    unit price (l_extendedprice / l_quantity) across all line items —
    the canonical demand-curve readout (elasticity < -1 = elastic,
    -1..0 = inelastic), with R^2 and the geometric-mean unit price for
    context.  The engine's first corpus-grain LOG regression: both log
    coordinates are QUANTIZED to exact 1e-4 ints at the row level (one
    identical floor in both engines — the quantize-then-sum stance), so
    every OLS moment is an exact int64 sum with map-side combine
    (sum x^2 ~7e16 at the sf1 twin, inside int64) and the slope /
    R^2 / intercept are pinned double closed forms of those moments —
    no data-grain float accumulation anywhere.  Scale: one combine."""
    li = table(spark, sf_dir, "lineitem")
    x = F.floor(
        F.log(F.col("l_extendedprice") / F.col("l_quantity")) * 10000 + 0.5
    ).cast("long")
    y = F.floor(F.log("l_quantity") * 10000 + 0.5).cast("long")
    pts = li.select(x.alias("x"), y.alias("y"))
    mom = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    n = F.col("n").cast("double")
    cen = mom.select(
        "n",
        (n * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")).alias("dxx"),
        (n * F.col("syy") - F.col("sy").cast("double") * F.col("sy")).alias("dyy"),
        (n * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")).alias("dxy"),
        (F.col("sx").cast("double") / F.col("n") / 10000.0).alias("mx"),
        (F.col("sy").cast("double") / F.col("n") / 10000.0).alias("my"),
    )
    slope = F.col("dxy") / F.col("dxx")
    rr = F.col("dxy") / F.sqrt(F.col("dxx") * F.col("dyy"))
    return cen.select(
        "n",
        r6(slope).alias("elasticity"),
        q4(F.col("my") - slope * F.col("mx")).alias("intercept"),
        r6(rr * rr).alias("r2"),
        q4(F.exp(F.col("mx"))).alias("geomean_unit_price"),
    )
