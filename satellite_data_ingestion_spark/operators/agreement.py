"""Agreement & stratified-effect battery (round 15, wave 5): the
statistics that answer "do two measurements / raters / segments AGREE,
and is an effect HOMOGENEOUS across strata" — weighted Cohen's kappa on
the first-vs-last priority transition (ordinal rater agreement), Lin's
concordance correlation and Deming regression between the click and
view daily revenue series (method comparison: identity-line agreement,
errors-in-both-variables fit), Woolf's test for odds-ratio homogeneity
across order-status strata (the companion that tells you whether
``agg_mantel_haenszel``-style pooling is even licensed), and the
rank-based two-sample pair Brunner-Munzel (stochastic dominance under
unequal variances) and Ansari-Bradley (scale/dispersion shift).

Scale shape: every op is ONE map-side-combined pass to a BOUNDED frame
(5x5 transition cells, calendar days, 3 strata 2x2s, 2x|values| rank
histograms), then cell/moment algebra.  The rank tests never rank data
rows: global and within-group midranks come from value-histogram
self-joins on <= 50 distinct values.

Float discipline (BASELINE.md): exact int64 wherever bounds allow
(documented per site), pinned-order doubles past int64 (IEEE determinism
under equal operation order), ``_ordfold`` for every order-sensitive
multi-term sum, shared A&S Phi / Wilson-Hilferty for p-values, stat+df
with no p for t-family outputs (the ``agg_welch_t`` convention),
half-up micro-quantized outputs.

Capability mapping: extends SURVEY §2's hypothesis battery
(`agg_cohens_kappa`, `agg_mantel_haenszel`, `agg_mann_whitney`,
`agg_bland_altman`); the reference repo (454-line ingestion scheduler)
has no statistical layer — engine-native analytics over the landed
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from .association import _FL_CELLS_SQL, first_last_priority_cells
from .hypothesis import _norm_cdf, _norm_cdf_sql, q4, r6
from .monitoring import _ordfold, _wh_p, _wh_p_sql

_CENTS = "CAST(round(value * 100) AS BIGINT)"

# Daily click (x) / view (y) revenue-cents series + exact int64 moments:
# shared by the method-comparison pair (Lin CCC, Deming).
_CV_MOM_SQL = f"""cv AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', date_trunc('day', ts))
              AS BIGINT) AS dd,
         CAST(sum(CASE WHEN event_type = 'click' THEN {_CENTS} ELSE 0 END)
              AS BIGINT) AS x,
         CAST(sum(CASE WHEN event_type = 'view' THEN {_CENTS} ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY 1
),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM cv
),
cen AS (
  SELECT n, sx, sy,
         CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS dxx,
         CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS dyy,
         CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy AS dxy
  FROM mom
)"""


def _cv_cen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row (n, sx, sy, dxx, dyy, dxy): the Spark twin of the cen
    CTE — exact int64 raw moments, double-pinned centered products."""
    ev = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    cv = ev.groupBy(
        F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("dd")
    ).agg(
        F.sum(F.when(F.col("event_type") == "click", cents).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "view", cents).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    mom = cv.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    n = F.col("n").cast("double")
    return mom.select(
        "n",
        "sx",
        "sy",
        (n * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")).alias("dxx"),
        (n * F.col("syy") - F.col("sy").cast("double") * F.col("sy")).alias("dyy"),
        (n * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")).alias("dxy"),
    )


@register(
    "agg_kappa_weighted",
    oracle=f"""
WITH {_FL_CELLS_SQL},
mm AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
rm AS (SELECT fi AS i, CAST(sum(c) AS BIGINT) AS r FROM cells GROUP BY 1),
cm AS (SELECT li AS j, CAST(sum(c) AS BIGINT) AS cc FROM cells GROUP BY 1),
obs AS (
  SELECT CAST(sum(CASE WHEN fi = li THEN c ELSE 0 END) AS BIGINT) AS diag,
         CAST(sum(abs(fi - li) * c) AS BIGINT) AS wl,
         CAST(sum((fi - li) * (fi - li) * c) AS BIGINT) AS wq
  FROM cells
),
exp_ AS (
  SELECT CAST(sum(rm.r * cm.cc * CASE WHEN rm.i = cm.j THEN 1 ELSE 0 END)
              AS BIGINT) AS rc,
         CAST(sum(rm.r * cm.cc * abs(rm.i - cm.j)) AS BIGINT) AS wrl,
         CAST(sum(rm.r * cm.cc * (rm.i - cm.j) * (rm.i - cm.j)) AS BIGINT)
           AS wrq
  FROM rm, cm
)
SELECT n,
       floor(CAST(diag AS DOUBLE) / n * 1000000 + 0.5) / 1000000.0 AS po,
       floor((CAST(diag AS DOUBLE) * n - rc) / (CAST(n AS DOUBLE) * n - rc)
             * 1000000 + 0.5) / 1000000.0 AS kappa,
       floor((1.0 - CAST(wl AS DOUBLE) * n / wrl) * 1000000 + 0.5)
         / 1000000.0 AS kappa_linear,
       floor((1.0 - CAST(wq AS DOUBLE) * n / wrq) * 1000000 + 0.5)
         / 1000000.0 AS kappa_quadratic
FROM mm, obs, exp_
""",
)
def agg_kappa_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED COHEN'S KAPPA on the first-vs-last order-priority
    transition: chance-corrected agreement between a customer's first
    and last priority, with LINEAR (|i-j|) and QUADRATIC ((i-j)^2)
    disagreement weights — the ordinal upgrade over plain kappa (a
    1-step priority drift should cost less than URGENT->LOW), and the
    quadratic form is the ICC-equivalent the agreement literature
    reports.  Also reports raw observed agreement and unweighted kappa.

    Everything is exact int64 cell/margin algebra on the 5x5 transition
    matrix (weighted chance terms are margin cross-products, <= 25
    rows); each kappa is one pinned double expression — e.g.
    kappa_w = 1 - N * sum(w*n_ij) / sum(w*r_i*c_j).  Scale: constant
    past the customer-grain combine (association.py's shared cells)."""
    cells = first_last_priority_cells(spark, sf_dir)
    mm = cells.agg(F.sum("c").cast("long").alias("n"))
    rm = cells.groupBy(F.col("fi").alias("i")).agg(
        F.sum("c").cast("long").alias("r")
    )
    cm = cells.groupBy(F.col("li").alias("j")).agg(
        F.sum("c").cast("long").alias("cc")
    )
    obs = cells.agg(
        F.sum(F.when(F.col("fi") == F.col("li"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("diag"),
        F.sum(F.abs(F.col("fi") - F.col("li")) * F.col("c"))
        .cast("long")
        .alias("wl"),
        F.sum((F.col("fi") - F.col("li")) * (F.col("fi") - F.col("li")) * F.col("c"))
        .cast("long")
        .alias("wq"),
    )
    ex = rm.crossJoin(F.broadcast(cm)).agg(
        F.sum(
            F.col("r") * F.col("cc") * F.when(F.col("i") == F.col("j"), 1).otherwise(0)
        )
        .cast("long")
        .alias("rc"),
        F.sum(F.col("r") * F.col("cc") * F.abs(F.col("i") - F.col("j")))
        .cast("long")
        .alias("wrl"),
        F.sum(
            F.col("r") * F.col("cc") * (F.col("i") - F.col("j")) * (F.col("i") - F.col("j"))
        )
        .cast("long")
        .alias("wrq"),
    )
    st = mm.crossJoin(F.broadcast(obs)).crossJoin(F.broadcast(ex))
    n = F.col("n")
    return st.select(
        "n",
        r6(F.col("diag").cast("double") / n).alias("po"),
        r6(
            (F.col("diag").cast("double") * n - F.col("rc"))
            / (n.cast("double") * n - F.col("rc"))
        ).alias("kappa"),
        r6(1.0 - F.col("wl").cast("double") * n / F.col("wrl")).alias("kappa_linear"),
        r6(1.0 - F.col("wq").cast("double") * n / F.col("wrq")).alias(
            "kappa_quadratic"
        ),
    )


@register(
    "agg_lin_ccc",
    oracle=f"""
WITH {_CV_MOM_SQL}
SELECT n AS n_days,
       floor(dxy / sqrt(dxx * dyy) * 1000000 + 0.5) / 1000000.0 AS pearson_r,
       floor(2.0 * dxy / (dxx + dyy + CAST(sx - sy AS DOUBLE) * (sx - sy))
             * 1000000 + 0.5) / 1000000.0 AS ccc,
       floor((2.0 * dxy / (dxx + dyy + CAST(sx - sy AS DOUBLE) * (sx - sy)))
             / (dxy / sqrt(dxx * dyy)) * 1000000 + 0.5) / 1000000.0 AS c_b,
       floor((CAST(sx - sy AS DOUBLE) / n) / 100.0 * 10000 + 0.5) / 10000.0
         AS mean_diff_dollars
FROM cen
""",
)
def agg_lin_ccc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIN'S CONCORDANCE CORRELATION between the click and view daily
    revenue series: how well do the two series agree with the IDENTITY
    line y = x — not just correlate?  ccc = 2 s_xy / (s_x^2 + s_y^2 +
    (xbar - ybar)^2); the bias-correction factor C_b = ccc / r isolates
    how much of the disagreement is location/scale shift vs scatter —
    the method-comparison panel next to ``agg_bland_altman``.

    All moments are exact int64 at the calendar grain; numerator and
    denominator are evaluated at the common n^2 scale (centered products
    double-pinned — (sx-sy)^2 crosses int64 at sf1) so no rescaling
    divides intervene.  Scale: one combine, 1-row algebra."""
    cen = _cv_cen(spark, sf_dir)
    sd = F.col("sx") - F.col("sy")
    ccc = 2.0 * F.col("dxy") / (
        F.col("dxx") + F.col("dyy") + sd.cast("double") * sd
    )
    r = F.col("dxy") / F.sqrt(F.col("dxx") * F.col("dyy"))
    return cen.select(
        F.col("n").alias("n_days"),
        r6(r).alias("pearson_r"),
        r6(ccc).alias("ccc"),
        r6(ccc / r).alias("c_b"),
        q4((sd.cast("double") / F.col("n")) / 100.0).alias("mean_diff_dollars"),
    )


@register(
    "agg_deming_regression",
    oracle=f"""
WITH {_CV_MOM_SQL},
fit AS (
  SELECT n, sx, sy, dxy, dxx, dyy,
         (dyy - dxx + sqrt((dyy - dxx) * (dyy - dxx) + 4 * dxy * dxy))
           / (2 * dxy) AS slope
  FROM cen
)
SELECT n AS n_days,
       floor(slope * 1000000 + 0.5) / 1000000.0 AS slope,
       floor((CAST(sy AS DOUBLE) - slope * sx) / n * 10000 + 0.5) / 10000.0
         AS intercept_cents,
       floor(dxy / dxx * 1000000 + 0.5) / 1000000.0 AS ols_slope
FROM fit
""",
)
def agg_deming_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEMING REGRESSION (errors in BOTH variables, lambda = 1) of view
    on click daily revenue: when both series are noisy measurements of
    the same latent activity, OLS attenuates the slope toward zero —
    Deming's orthogonal fit is the method-comparison standard.  Reports
    the Deming slope/intercept next to the OLS slope so the attenuation
    is visible.

    slope = (Syy - Sxx + sqrt((Syy - Sxx)^2 + 4 Sxy^2)) / (2 Sxy) on the
    n^2-scaled centered moments (scale-invariant, so the pinned double
    products feed it directly); intercept = ybar - slope * xbar in
    cents.  Scale: one combine, 1-row closed form."""
    cen = _cv_cen(spark, sf_dir)
    slope = (
        F.col("dyy")
        - F.col("dxx")
        + F.sqrt(
            (F.col("dyy") - F.col("dxx")) * (F.col("dyy") - F.col("dxx"))
            + 4 * F.col("dxy") * F.col("dxy")
        )
    ) / (2 * F.col("dxy"))
    fit = cen.withColumn("slope", slope)
    return fit.select(
        F.col("n").alias("n_days"),
        r6(F.col("slope")).alias("slope"),
        q4(
            (F.col("sy").cast("double") - F.col("slope") * F.col("sx")) / F.col("n")
        ).alias("intercept_cents"),
        r6(F.col("dxy") / F.col("dxx")).alias("ols_slope"),
    )


@register(
    "agg_woolf_homogeneity",
    oracle=f"""
WITH deg AS (
  SELECT l_orderkey, CASE WHEN count(*) > 4 THEN 1 ELSE 0 END AS big
  FROM lineitem GROUP BY 1
),
tab AS (
  SELECT o_orderstatus AS k,
         CAST(sum(CASE WHEN substr(o_orderpriority, 1, 1) IN ('1', '2')
                        AND big = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN substr(o_orderpriority, 1, 1) IN ('1', '2')
                        AND big = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(sum(CASE WHEN substr(o_orderpriority, 1, 1) NOT IN ('1', '2')
                        AND big = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(sum(CASE WHEN substr(o_orderpriority, 1, 1) NOT IN ('1', '2')
                        AND big = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM orders JOIN deg ON o_orderkey = l_orderkey
  GROUP BY 1
),
lw AS (
  SELECT k,
         ln((a + 0.5) * (d + 0.5) / ((b + 0.5) * (c + 0.5))) AS lor,
         1.0 / (1.0 / (a + 0.5) + 1.0 / (b + 0.5)
                + 1.0 / (c + 0.5) + 1.0 / (d + 0.5)) AS w
  FROM tab
),
fold AS (
  SELECT CAST(count(*) AS BIGINT) AS n_strata,
         list_reduce(list_prepend(0.0, list(w ORDER BY k)),
                     (p, q) -> p + q) AS sw,
         list_reduce(list_prepend(0.0, list(w * lor ORDER BY k)),
                     (p, q) -> p + q) AS swl,
         list_reduce(list_prepend(0.0, list(w * lor * lor ORDER BY k)),
                     (p, q) -> p + q) AS swl2
  FROM lw
),
st AS (SELECT n_strata, sw, swl, swl2 - swl * swl / sw AS chi2 FROM fold)
SELECT n_strata,
       floor(chi2 * 10000 + 0.5) / 10000.0 AS chi2,
       CAST(n_strata - 1 AS BIGINT) AS df,
       floor({_wh_p_sql("chi2", "CAST(n_strata - 1 AS DOUBLE)")}
             * 1000000 + 0.5) / 1000000.0 AS p,
       floor(exp(swl / sw) * 1000000 + 0.5) / 1000000.0 AS or_pooled
FROM st
""",
)
def agg_woolf_homogeneity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WOOLF'S TEST for odds-ratio HOMOGENEITY across order-status
    strata: is the (high priority -> big basket) odds ratio the SAME in
    F/O/P orders?  This is the license check for pooling — a pooled
    Mantel-Haenszel OR (``agg_mantel_haenszel``) is only meaningful if
    Woolf cannot reject homogeneity.  chi2 = sum w_k (lnOR_k - lnOR_pool)^2
    with inverse-variance weights, Haldane +0.5 in every cell.

    Per-stratum 2x2 counts are exact int64 from ONE orderkey-keyed join
    + combine; lnORs/weights are pinned doubles; the three weight folds
    run in stratum order; Wilson-Hilferty + shared Phi for the p, and
    the inverse-variance-pooled OR is reported alongside.  Scale:
    3-row algebra past the combine."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    deg = li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.when(F.count(F.lit(1)) > 4, 1).otherwise(0).alias("big")
    )
    hi = F.substring("o_orderpriority", 1, 1).isin("1", "2")
    tab = (
        o.join(deg, o["o_orderkey"] == deg["okey"])
        .groupBy(F.col("o_orderstatus").alias("k"))
        .agg(
            F.sum(F.when(hi & (F.col("big") == 1), 1).otherwise(0))
            .cast("long")
            .alias("a"),
            F.sum(F.when(hi & (F.col("big") == 0), 1).otherwise(0))
            .cast("long")
            .alias("b"),
            F.sum(F.when(~hi & (F.col("big") == 1), 1).otherwise(0))
            .cast("long")
            .alias("c"),
            F.sum(F.when(~hi & (F.col("big") == 0), 1).otherwise(0))
            .cast("long")
            .alias("d"),
        )
    )
    ah, bh, ch, dh = (F.col(x) + 0.5 for x in "abcd")
    lw = tab.select(
        "k",
        F.log(ah * dh / (bh * ch)).alias("lor"),
        (1.0 / (1.0 / ah + 1.0 / bh + 1.0 / ch + 1.0 / dh)).alias("w"),
    )
    fold = lw.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        _ordfold(F.col("k"), F.col("w")).alias("sw"),
        _ordfold(F.col("k"), F.col("w") * F.col("lor")).alias("swl"),
        _ordfold(F.col("k"), F.col("w") * F.col("lor") * F.col("lor")).alias("swl2"),
    )
    st = fold.select(
        "n_strata",
        "sw",
        "swl",
        (F.col("swl2") - F.col("swl") * F.col("swl") / F.col("sw")).alias("chi2"),
    )
    return st.select(
        "n_strata",
        q4(F.col("chi2")).alias("chi2"),
        (F.col("n_strata") - 1).cast("long").alias("df"),
        r6(_wh_p(F.col("chi2"), (F.col("n_strata") - 1).cast("double"))).alias("p"),
        r6(F.exp(F.col("swl") / F.col("sw"))).alias("or_pooled"),
    )


@register(
    "agg_brunner_munzel",
    oracle="""
WITH cells AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g,
         CAST(l_quantity AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS t
  FROM lineitem GROUP BY 1, 2
),
vh AS (SELECT v, CAST(sum(t) AS BIGINT) AS tv FROM cells GROUP BY 1),
gm AS (
  SELECT a.v, 2 * CAST(coalesce(sum(b.tv), 0) AS BIGINT) + a.tv + 1 AS m2
  FROM vh a LEFT JOIN vh b ON b.v < a.v GROUP BY a.v, a.tv
),
wm AS (
  SELECT a.g, a.v, a.t,
         2 * CAST(coalesce(sum(b.t), 0) AS BIGINT) + a.t + 1 AS w2
  FROM cells a LEFT JOIN cells b ON b.g = a.g AND b.v < a.v
  GROUP BY a.g, a.v, a.t
),
pc AS (
  SELECT wm.g, wm.v, wm.t, gm.m2, gm.m2 - wm.w2 AS d2
  FROM wm JOIN gm ON wm.v = gm.v
),
gs AS (
  SELECT g, CAST(sum(t) AS BIGINT) AS ng,
         CAST(sum(t * m2) AS BIGINT) AS srm,
         CAST(sum(t * d2) AS BIGINT) AS sp,
         list_reduce(list_prepend(0.0, list(CAST(t AS DOUBLE) * d2 * d2
                                            ORDER BY v)),
                     (p, q) -> p + q) AS spp
  FROM pc GROUP BY g
),
gs2 AS (
  SELECT g, ng, srm,
         (spp - CAST(sp AS DOUBLE) * sp / ng) / (ng - 1) AS s2
  FROM gs
),
pv AS (
  SELECT max(CASE WHEN g = 0 THEN ng END) AS nx,
         max(CASE WHEN g = 1 THEN ng END) AS ny,
         max(CASE WHEN g = 0 THEN CAST(srm AS DOUBLE) / ng END) AS rbx,
         max(CASE WHEN g = 1 THEN CAST(srm AS DOUBLE) / ng END) AS rby,
         max(CASE WHEN g = 0 THEN ng * s2 END) AS ax,
         max(CASE WHEN g = 1 THEN ng * s2 END) AS ay
  FROM gs2
),
zz AS (
  SELECT nx, ny,
         (rby - (ny + 1)) / (2.0 * nx) AS p_hat,
         CAST(nx AS DOUBLE) * ny * (rby - rbx) / (nx + ny) / sqrt(ax + ay)
           AS w_stat,
         (ax + ay) * (ax + ay)
           / (ax * ax / (nx - 1) + ay * ay / (ny - 1)) AS df
  FROM pv
)
SELECT nx AS n_other, ny AS n_returned,
       floor(p_hat * 1000000 + 0.5) / 1000000.0 AS p_hat,
       floor(w_stat * 1000000 + 0.5) / 1000000.0 AS w_stat,
       floor(df * 10000 + 0.5) / 10000.0 AS df
FROM zz
""",
)
def agg_brunner_munzel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BRUNNER-MUNZEL TEST (the nonparametric Behrens-Fisher problem):
    are RETURNED line items stochastically larger in quantity than kept
    ones, WITHOUT assuming the two groups share a variance or shape?
    The modern replacement for Mann-Whitney when dispersions differ;
    reports the relative effect p_hat = P(X < Y) + 0.5 P(X = Y), the W
    statistic, and the Satterthwaite df (stat + df, no p — the
    ``agg_welch_t`` convention for t-family outputs).

    NO data-grain ranking: global and within-group midranks come from
    the <= 50-value quantity histogram's ordered self-joins (doubled
    midranks stay exact int64); per-member placements d2 = M2 - w2 are
    cell constants, so the placement variances need only cell sums —
    the single super-int64 term (sum t * d2^2) folds as double in value
    order.  Scale: everything past the (group, value) combine is
    histogram-sized."""
    li = table(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("g"),
        F.col("l_quantity").cast("long").alias("v"),
    ).agg(F.count(F.lit(1)).cast("long").alias("t"))
    vh = cells.groupBy("v").agg(F.sum("t").cast("long").alias("tv"))
    va = vh.select(F.col("v").alias("va"), F.col("tv").alias("ta"))
    vb = vh.select(F.col("v").alias("vb"), F.col("tv").alias("tb"))
    gm = (
        va.join(F.broadcast(vb), F.col("vb") < F.col("va"), "left")
        .groupBy("va", "ta")
        .agg(
            (2 * F.coalesce(F.sum("tb"), F.lit(0)).cast("long") + F.col("ta") + 1)
            .alias("m2")
        )
        .select(F.col("va").alias("v"), "m2")
    )
    ca = cells.select(
        F.col("g").alias("ga"), F.col("v").alias("cva"), F.col("t").alias("cta")
    )
    cb = cells.select(
        F.col("g").alias("gb"), F.col("v").alias("cvb"), F.col("t").alias("ctb")
    )
    wm = (
        ca.join(
            F.broadcast(cb),
            (F.col("gb") == F.col("ga")) & (F.col("cvb") < F.col("cva")),
            "left",
        )
        .groupBy("ga", "cva", "cta")
        .agg(
            (2 * F.coalesce(F.sum("ctb"), F.lit(0)).cast("long") + F.col("cta") + 1)
            .alias("w2")
        )
        .select(
            F.col("ga").alias("g"), F.col("cva").alias("v"), F.col("cta").alias("t"), "w2"
        )
    )
    pc = wm.join(F.broadcast(gm), "v").select(
        "g", "v", "t", "m2", (F.col("m2") - F.col("w2")).alias("d2")
    )
    gs = pc.groupBy("g").agg(
        F.sum("t").cast("long").alias("ng"),
        F.sum(F.col("t") * F.col("m2")).cast("long").alias("srm"),
        F.sum(F.col("t") * F.col("d2")).cast("long").alias("sp"),
        _ordfold(
            F.col("v"), F.col("t").cast("double") * F.col("d2") * F.col("d2")
        ).alias("spp"),
    )
    gs2 = gs.select(
        "g",
        "ng",
        "srm",
        (
            (F.col("spp") - F.col("sp").cast("double") * F.col("sp") / F.col("ng"))
            / (F.col("ng") - 1)
        ).alias("s2"),
    )
    pv = gs2.agg(
        F.max(F.when(F.col("g") == 0, F.col("ng"))).alias("nx"),
        F.max(F.when(F.col("g") == 1, F.col("ng"))).alias("ny"),
        F.max(
            F.when(F.col("g") == 0, F.col("srm").cast("double") / F.col("ng"))
        ).alias("rbx"),
        F.max(
            F.when(F.col("g") == 1, F.col("srm").cast("double") / F.col("ng"))
        ).alias("rby"),
        F.max(F.when(F.col("g") == 0, F.col("ng") * F.col("s2"))).alias("ax"),
        F.max(F.when(F.col("g") == 1, F.col("ng") * F.col("s2"))).alias("ay"),
    )
    nx, ny, ax, ay = F.col("nx"), F.col("ny"), F.col("ax"), F.col("ay")
    zz = pv.select(
        nx,
        ny,
        ((F.col("rby") - (ny + 1)) / (2.0 * nx)).alias("p_hat"),
        (
            nx.cast("double")
            * ny
            * (F.col("rby") - F.col("rbx"))
            / (nx + ny)
            / F.sqrt(ax + ay)
        ).alias("w_stat"),
        (
            (ax + ay) * (ax + ay) / (ax * ax / (nx - 1) + ay * ay / (ny - 1))
        ).alias("df"),
    )
    return zz.select(
        F.col("nx").alias("n_other"),
        F.col("ny").alias("n_returned"),
        r6(F.col("p_hat")).alias("p_hat"),
        r6(F.col("w_stat")).alias("w_stat"),
        q4(F.col("df")).alias("df"),
    )


@register(
    "agg_ansari_bradley",
    oracle=f"""
WITH cells AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g,
         CAST(l_quantity AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS t
  FROM lineitem GROUP BY 1, 2
),
vh AS (SELECT v, CAST(sum(t) AS BIGINT) AS tv FROM cells GROUP BY 1),
nn AS (SELECT CAST(sum(tv) AS BIGINT) AS n FROM vh),
blocks AS (
  SELECT a.v, a.tv,
         CAST(coalesce(sum(b.tv), 0) AS BIGINT) + 1 AS a1,
         CAST(coalesce(sum(b.tv), 0) AS BIGINT) + a.tv AS b1
  FROM vh a LEFT JOIN vh b ON b.v < a.v GROUP BY a.v, a.tv
),
sc AS (
  SELECT v, tv,
         tv * (n + 1)
         - (CASE WHEN least(b1, CAST(floor(n / 2) AS BIGINT)) - a1 + 1 > 0
                 THEN (n + 1) * (least(b1, CAST(floor(n / 2) AS BIGINT)) - a1 + 1)
                      - (a1 + least(b1, CAST(floor(n / 2) AS BIGINT)))
                        * (least(b1, CAST(floor(n / 2) AS BIGINT)) - a1 + 1)
                 ELSE 0 END
            + CASE WHEN b1 - greatest(a1, CAST(floor(n / 2) AS BIGINT) + 1) + 1 > 0
                   THEN (greatest(a1, CAST(floor(n / 2) AS BIGINT) + 1) + b1)
                        * (b1 - greatest(a1, CAST(floor(n / 2) AS BIGINT) + 1) + 1)
                        - (n + 1)
                          * (b1 - greatest(a1, CAST(floor(n / 2) AS BIGINT) + 1) + 1)
                   ELSE 0 END) AS block2
  FROM blocks, nn
),
tots AS (
  SELECT CAST(sum(block2) AS BIGINT) AS stot2,
         list_reduce(list_prepend(0.0, list(
             tv * ((CAST(block2 AS DOUBLE) / tv) * (CAST(block2 AS DOUBLE) / tv))
             ORDER BY v)), (p, q) -> p + q) AS ssq4
  FROM sc
),
g1 AS (
  SELECT CAST(sum(c.t) AS BIGINT) AS n1,
         list_reduce(list_prepend(0.0, list(
             c.t * (CAST(sc.block2 AS DOUBLE) / sc.tv) ORDER BY c.v)),
           (p, q) -> p + q) AS ab2
  FROM cells c JOIN sc ON c.v = sc.v WHERE c.g = 1
),
st AS (
  SELECT n, n1, n - n1 AS n2, ab2,
         CAST(n1 AS DOUBLE) * stot2 / n AS e2,
         CAST(n1 AS DOUBLE) * (n - n1)
           * (n * ssq4 - CAST(stot2 AS DOUBLE) * stot2)
           / (CAST(n AS DOUBLE) * n * (n - 1)) AS var2
  FROM nn, tots, g1
),
zz AS (
  SELECT n1, n2, ab2, (ab2 - e2) / sqrt(var2) AS z FROM st
)
SELECT n1 AS n_returned, n2 AS n_other,
       floor(ab2 / 2 * 10000 + 0.5) / 10000.0 AS ab_score,
       floor(z * 1000000 + 0.5) / 1000000.0 AS z,
       floor(2.0 * (1.0 - {_norm_cdf_sql("abs(z)")}) * 1000000 + 0.5)
         / 1000000.0 AS p,
       CASE WHEN 2.0 * (1.0 - {_norm_cdf_sql("abs(z)")}) < 0.05 AND z < 0
              THEN 'returned_more_dispersed'
            WHEN 2.0 * (1.0 - {_norm_cdf_sql("abs(z)")}) < 0.05 AND z > 0
              THEN 'returned_less_dispersed'
            ELSE 'no_scale_difference' END AS verdict
FROM zz
""",
)
def agg_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSARI-BRADLEY SCALE TEST: do returned and kept line items have
    the same quantity DISPERSION (spread), median shift aside?  AB
    scores rank from both ends inward (score = min(rank, N+1-rank), tie
    blocks share their average), so a group concentrated mid-range
    scores HIGH = less dispersed — the rank dual of Levene
    (``agg_levene_bf``) that needs no moments at all.

    The per-tie-block score sum has a CLOSED FORM: with doubled scores
    2*min(r, N+1-r) = (N+1) - |2r - (N+1)|, the block sum over ranks
    [a1, b1] is two arithmetic series split at floor(N/2) — pure exact
    int64 algebra on the 50-row histogram (bounds ~N^2 ~ 3.6e13 at
    sf1).  The null mean/variance are the exact finite-population
    subset moments of the realized scores (automatically tie-correct);
    per-block averages fold as pinned doubles in value order; shared
    Phi two-sided p.  Scale: histogram-sized past the one combine."""
    li = table(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("g"),
        F.col("l_quantity").cast("long").alias("v"),
    ).agg(F.count(F.lit(1)).cast("long").alias("t"))
    vh = cells.groupBy("v").agg(F.sum("t").cast("long").alias("tv"))
    nn = vh.agg(F.sum("tv").cast("long").alias("n"))
    va = vh.select(F.col("v").alias("va"), F.col("tv").alias("ta"))
    vb = vh.select(F.col("v").alias("vb"), F.col("tv").alias("tb"))
    blocks = (
        va.join(F.broadcast(vb), F.col("vb") < F.col("va"), "left")
        .groupBy("va", "ta")
        .agg(
            (F.coalesce(F.sum("tb"), F.lit(0)).cast("long") + 1).alias("a1"),
            (F.coalesce(F.sum("tb"), F.lit(0)).cast("long") + F.col("ta")).alias("b1"),
        )
        .select(F.col("va").alias("v"), F.col("ta").alias("tv"), "a1", "b1")
    )
    bn = blocks.crossJoin(F.broadcast(nn))
    half = F.floor(F.col("n") / 2).cast("long")
    m = F.least(F.col("b1"), half)
    cnt1 = m - F.col("a1") + 1
    s1 = (F.col("n") + 1) * cnt1 - (F.col("a1") + m) * cnt1
    a2 = F.greatest(F.col("a1"), half + 1)
    cnt2 = F.col("b1") - a2 + 1
    s2 = (a2 + F.col("b1")) * cnt2 - (F.col("n") + 1) * cnt2
    block2 = F.col("tv") * (F.col("n") + 1) - (
        F.when(cnt1 > 0, s1).otherwise(F.lit(0))
        + F.when(cnt2 > 0, s2).otherwise(F.lit(0))
    )
    sc = bn.select("v", "tv", block2.alias("block2"))
    sbar2 = F.col("block2").cast("double") / F.col("tv")
    tots = sc.agg(
        F.sum("block2").cast("long").alias("stot2"),
        _ordfold(F.col("v"), F.col("tv") * (sbar2 * sbar2)).alias("ssq4"),
    )
    g1 = (
        cells.filter(F.col("g") == 1)
        .join(F.broadcast(sc), "v")
        .agg(
            F.sum("t").cast("long").alias("n1"),
            _ordfold(
                F.col("v"), F.col("t") * (F.col("block2").cast("double") / F.col("tv"))
            ).alias("ab2"),
        )
    )
    st = nn.crossJoin(F.broadcast(tots)).crossJoin(F.broadcast(g1))
    n, n1 = F.col("n"), F.col("n1")
    st = st.select(
        n,
        n1,
        (n - n1).alias("n2"),
        "ab2",
        (n1.cast("double") * F.col("stot2") / n).alias("e2"),
        (
            n1.cast("double")
            * (n - n1)
            * (n * F.col("ssq4") - F.col("stot2").cast("double") * F.col("stot2"))
            / (n.cast("double") * n * (n - 1))
        ).alias("var2"),
    )
    zz = st.select(
        "n1",
        "n2",
        "ab2",
        ((F.col("ab2") - F.col("e2")) / F.sqrt(F.col("var2"))).alias("z"),
    )
    pv = 2.0 * (1.0 - _norm_cdf(F.abs(F.col("z"))))
    return zz.select(
        F.col("n1").alias("n_returned"),
        F.col("n2").alias("n_other"),
        q4(F.col("ab2") / 2).alias("ab_score"),
        r6(F.col("z")).alias("z"),
        r6(pv).alias("p"),
        F.when((pv < 0.05) & (F.col("z") < 0), "returned_more_dispersed")
        .when((pv < 0.05) & (F.col("z") > 0), "returned_less_dispersed")
        .otherwise("no_scale_difference")
        .alias("verdict"),
    )
