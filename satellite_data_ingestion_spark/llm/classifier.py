"""Classifier-evaluation pair (round 15, wave H): DeLong's AUC with an
analytic confidence interval, and Platt scaling (logistic calibration)
fit by unrolled Newton steps — the two numbers a quality-classifier
pipeline (``ext_quality_classifier``, ``ext_calibration_ece``) needs
before its scores gate a corpus: does the score RANK positives above
negatives (AUC +/- CI), and what monotone map turns the raw score into
a calibrated probability (Platt's sigmoid)?

The running example scores events by VALUE and labels purchases
positive — "is spend a ranker for conversion" — chosen because the
label/score grain is corpus-sized while every statistic reduces to the
BOUNDED (label, dollar-bucket) histogram.

Scale + float discipline (BASELINE.md): both ops are ONE map-side
combine to <= 2 x 561 histogram cells; midrank/placement algebra is
exact int64 (the ``agg_brunner_munzel`` machinery — DeLong's V10/V01
structural components ARE the doubled placements / 2n); Newton's
gradient/Hessian folds run in value order over the bounded cells;
sigmoids/logs are identical pinned expressions in both engines; outputs
half-up micro-quantize.

Reference analog: none — [EXT] LLM-pipeline mandate (BASELINE.json:6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.monitoring import _ordfold
from ..registry import register

_Z95 = 1.959963984540054  # exact two-sided 5% normal quantile literal


def _q6(x):
    """Module-shared half-up micro-quantize (the hypothesis.r6 form)."""
    return F.floor(x * 1000000 + 0.5) / 1000000.0


@register(
    "ext_auc_delong",
    oracle=f"""
WITH cells AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g,
         CAST(round(value) AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS t
  FROM events GROUP BY 1, 2
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
  SELECT max(CASE WHEN g = 0 THEN ng END) AS n0,
         max(CASE WHEN g = 1 THEN ng END) AS n1,
         max(CASE WHEN g = 1 THEN CAST(srm AS DOUBLE) / ng END) AS rb1,
         max(CASE WHEN g = 0 THEN s2 END) AS s20,
         max(CASE WHEN g = 1 THEN s2 END) AS s21
  FROM gs2
),
zz AS (
  SELECT n0, n1,
         (rb1 - (n1 + 1)) / (2.0 * n0) AS auc,
         sqrt(s21 / (4.0 * (CAST(n0 AS DOUBLE) * n0) * n1)
              + s20 / (4.0 * (CAST(n1 AS DOUBLE) * n1) * n0)) AS se
  FROM pv
)
SELECT n1 AS n_pos, n0 AS n_neg,
       floor(auc * 1000000 + 0.5) / 1000000.0 AS auc,
       floor(se * 1000000 + 0.5) / 1000000.0 AS se,
       floor(greatest(0.0, auc - {_Z95} * se) * 1000000 + 0.5) / 1000000.0
         AS ci_lo,
       floor(least(1.0, auc + {_Z95} * se) * 1000000 + 0.5) / 1000000.0
         AS ci_hi
FROM zz
""",
)
def ext_auc_delong(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC WITH DeLONG CONFIDENCE INTERVAL: does event VALUE rank
    purchases above non-purchases?  AUC is the midrank Mann-Whitney
    estimate P(score_pos > score_neg) + 0.5 P(=); DeLong's variance is
    the two-sample variance of the placement components V10/V01 —
    which are EXACTLY the doubled placements d2/(2n) the engine's
    Brunner-Munzel machinery already derives from the (label, bucket)
    histogram, so no per-observation pass exists anywhere.

    All midranks/placements exact int64 from <= 561-value histogram
    self-joins; the one super-int64 moment folds in value order; the
    CI is auc +/- 1.96 se clamped to [0, 1] (1.96 literal = the exact
    normal quantile in both engines)."""
    ev = table(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("g"),
        F.round("value").cast("long").alias("v"),
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
            F.col("ga").alias("g"),
            F.col("cva").alias("v"),
            F.col("cta").alias("t"),
            "w2",
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
        F.max(F.when(F.col("g") == 0, F.col("ng"))).alias("n0"),
        F.max(F.when(F.col("g") == 1, F.col("ng"))).alias("n1"),
        F.max(
            F.when(F.col("g") == 1, F.col("srm").cast("double") / F.col("ng"))
        ).alias("rb1"),
        F.max(F.when(F.col("g") == 0, F.col("s2"))).alias("s20"),
        F.max(F.when(F.col("g") == 1, F.col("s2"))).alias("s21"),
    )
    n0, n1 = F.col("n0"), F.col("n1")
    zz = pv.select(
        n0,
        n1,
        ((F.col("rb1") - (n1 + 1)) / (2.0 * n0)).alias("auc"),
        F.sqrt(
            F.col("s21") / (4.0 * (n0.cast("double") * n0) * n1)
            + F.col("s20") / (4.0 * (n1.cast("double") * n1) * n0)
        ).alias("se"),
    )
    return zz.select(
        F.col("n1").alias("n_pos"),
        F.col("n0").alias("n_neg"),
        _q6(F.col("auc")).alias("auc"),
        _q6(F.col("se")).alias("se"),
        _q6(F.greatest(F.lit(0.0), F.col("auc") - _Z95 * F.col("se"))).alias("ci_lo"),
        _q6(F.least(F.lit(1.0), F.col("auc") + _Z95 * F.col("se"))).alias("ci_hi"),
    )


_PLATT_ITERS = 3


def _mu_sql(a: str, b: str) -> str:
    return f"(1.0 / (1.0 + exp(-(({a}) * v + ({b})))))"


def _fold_sql(expr: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list({expr} ORDER BY v)), "
        f"(p, q) -> p + q)"
    )


def _platt_prelude() -> str:
    """Shared oracle prelude: score cells + the unrolled Newton chain
    ending at it{N} — consumed by ext_platt_scaling and the
    Spiegelhalter calibration test."""
    mu = _mu_sql
    fold = _fold_sql
    parts = [
        """WITH cells AS (
  SELECT CAST(round(value) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS np
  FROM events GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(np) AS BIGINT) AS npos
        FROM cells),
it0 AS (
  SELECT CAST(0.0 AS DOUBLE) AS a,
         ln(CAST(npos AS DOUBLE) / (nn - npos)) AS b
  FROM tot
)"""
    ]
    for j in range(1, _PLATT_ITERS + 1):
        m = mu("a", "b")
        parts.append(
            f""",
f{j} AS (
  SELECT a, b,
         {fold(f"(np - n * {m}) * v")} AS g1,
         {fold(f"(np - n * {m})")} AS g2,
         {fold(f"n * {m} * (1.0 - {m}) * v * v")} AS h11,
         {fold(f"n * {m} * (1.0 - {m}) * v")} AS h12,
         {fold(f"n * {m} * (1.0 - {m})")} AS h22
  FROM cells, it{j - 1}
  GROUP BY a, b
),
it{j} AS (
  SELECT a + (h22 * g1 - h12 * g2) / (h11 * h22 - h12 * h12) AS a,
         b + (h11 * g2 - h12 * g1) / (h11 * h22 - h12 * h12) AS b
  FROM f{j}
)"""
        )
    return "".join(parts)


def _platt_oracle() -> str:
    mu = _mu_sql
    fold = _fold_sql
    parts = [_platt_prelude()]
    m = mu("a", "b")
    parts.append(
        f""",
loss AS (
  SELECT a, b,
         {fold(f"-(np * ln({m}) + (n - np) * ln(1.0 - {m}))")} AS nll
  FROM cells, it{_PLATT_ITERS}
  GROUP BY a, b
)
SELECT (SELECT nn FROM tot) AS n, (SELECT npos FROM tot) AS n_pos,
       floor(a * 1000000 + 0.5) / 1000000.0 AS slope,
       floor(b * 1000000 + 0.5) / 1000000.0 AS intercept,
       floor(nll / (SELECT nn FROM tot) * 1000000 + 0.5) / 1000000.0
         AS log_loss
FROM loss"""
    )
    return "".join(parts)


def _score_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(v, n, np): dollar-bucket histogram with positive counts."""
    ev = table(spark, sf_dir, "events")
    # Bounded (~500-row) histogram consumed by every unrolled Newton
    # iteration plus totals and the final score pass — one corpus scan,
    # materialized once (guide §2.4; wave-N tiny-histogram discipline).
    return (
        ev.groupBy(F.round("value").cast("long").alias("v"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("np"),
        )
        .localCheckpoint(eager=True)
    )


def _platt_mu():
    return 1.0 / (1.0 + F.exp(-(F.col("a") * F.col("v") + F.col("b"))))


def _platt_ab(cells: DataFrame) -> DataFrame:
    """One row (a, b): the unrolled Newton fit — the Spark twin of the
    oracle prelude's it{N} CTE."""
    tot = cells.agg(
        F.sum("n").cast("long").alias("nn"), F.sum("np").cast("long").alias("npos")
    )
    ab = tot.select(
        F.lit(0.0).alias("a"),
        F.log(F.col("npos").cast("double") / (F.col("nn") - F.col("npos"))).alias(
            "b"
        ),
    )
    for _ in range(_PLATT_ITERS):
        j = cells.crossJoin(F.broadcast(ab))
        m = _platt_mu()
        f = j.groupBy("a", "b").agg(
            _ordfold(F.col("v"), (F.col("np") - F.col("n") * m) * F.col("v")).alias(
                "g1"
            ),
            _ordfold(F.col("v"), F.col("np") - F.col("n") * m).alias("g2"),
            _ordfold(
                F.col("v"), F.col("n") * m * (1.0 - m) * F.col("v") * F.col("v")
            ).alias("h11"),
            _ordfold(F.col("v"), F.col("n") * m * (1.0 - m) * F.col("v")).alias(
                "h12"
            ),
            _ordfold(F.col("v"), F.col("n") * m * (1.0 - m)).alias("h22"),
        )
        det = F.col("h11") * F.col("h22") - F.col("h12") * F.col("h12")
        ab = f.select(
            (F.col("a") + (F.col("h22") * F.col("g1") - F.col("h12") * F.col("g2")) / det).alias("a"),
            (F.col("b") + (F.col("h11") * F.col("g2") - F.col("h12") * F.col("g1")) / det).alias("b"),
        )
    return ab


@register("ext_platt_scaling", oracle=_platt_oracle())
def ext_platt_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PLATT SCALING: fit P(purchase | value) = sigmoid(a*value + b) by
    {it} unrolled Newton-Raphson steps — the parametric calibration map
    next to ``ext_isotonic_calibration``'s monotone-step fit (Platt
    gives a smooth two-parameter sigmoid; isotonic gives a free-form
    staircase), reporting the fitted slope/intercept and the final
    mean log-loss.

    The 2x2 Newton system has a closed-form inverse, so each step is
    five value-ordered folds (gradient + Hessian) over the BOUNDED
    dollar-bucket histogram plus pinned double algebra — no
    optimization loop touches the corpus, and 3 steps from the
    log-odds-prior start are quadratically convergent for this 1-D
    feature.  The oracle unrolls the identical three steps as chained
    CTEs; sigmoids/logs are the same pinned expressions in both
    engines."""
    cells = _score_cells(spark, sf_dir)
    tot = cells.agg(
        F.sum("n").cast("long").alias("nn"), F.sum("np").cast("long").alias("npos")
    )
    ab = _platt_ab(cells)
    j = cells.crossJoin(F.broadcast(ab))
    m = _platt_mu()
    loss = j.groupBy("a", "b").agg(
        _ordfold(
            F.col("v"),
            -(F.col("np") * F.log(m) + (F.col("n") - F.col("np")) * F.log(1.0 - m)),
        ).alias("nll")
    )
    out = loss.crossJoin(F.broadcast(tot))
    return out.select(
        F.col("nn").alias("n"),
        F.col("npos").alias("n_pos"),
        _q6(F.col("a")).alias("slope"),
        _q6(F.col("b")).alias("intercept"),
        _q6(F.col("nll") / F.col("nn")).alias("log_loss"),
    )


ext_platt_scaling.__doc__ = ext_platt_scaling.__doc__.format(it=_PLATT_ITERS)


_MCC_THRESHOLD = 100  # dollars: predict "purchase" when value > this


@register(
    "ext_classifier_mcc",
    oracle=f"""
WITH cm AS (
  SELECT CAST(sum(CASE WHEN value > {_MCC_THRESHOLD} AND event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN value > {_MCC_THRESHOLD} AND event_type <> 'purchase'
                       THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(sum(CASE WHEN value <= {_MCC_THRESHOLD} AND event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         CAST(sum(CASE WHEN value <= {_MCC_THRESHOLD} AND event_type <> 'purchase'
                       THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM events
)
SELECT tp, fp, fn, tn,
       floor((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
             / sqrt((CAST(tp + fp AS DOUBLE)) * (tp + fn) * (tn + fp)
                    * (tn + fn))
             * 1000000 + 0.5) / 1000000.0 AS mcc,
       floor(2.0 * tp / (2.0 * tp + fp + fn) * 1000000 + 0.5) / 1000000.0
         AS f1,
       floor((CAST(tp AS DOUBLE) / (tp + fn)
              + CAST(tn AS DOUBLE) / (tn + fp)) / 2.0 * 1000000 + 0.5)
         / 1000000.0 AS balanced_accuracy
FROM cm
""",
)
def ext_classifier_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MCC / F1 / BALANCED ACCURACY at a fixed operating point (predict
    purchase when value > {th}): the single-threshold confusion panel
    that complements ``ext_auc_delong``'s threshold-free ranking view
    and ``ext_quality_threshold_sweep``'s curve — MCC because it is the
    one single-number summary that survives the 4:1 class imbalance
    here (accuracy and even F1 reward the majority class; MCC is the
    2x2 Pearson phi and does not).

    The confusion matrix is ONE conditional aggregate of exact int64
    counts; each metric is a pinned double closed form (the MCC
    denominator product crosses int64 at sf1, hence double in identical
    order).  Scale: one map-side-combined corpus pass, 1-row output."""
    ev = table(spark, sf_dir, "events")
    pred = F.col("value") > _MCC_THRESHOLD
    pos = F.col("event_type") == "purchase"
    cm = ev.agg(
        F.sum(F.when(pred & pos, 1).otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when(pred & ~pos, 1).otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when(~pred & pos, 1).otherwise(0)).cast("long").alias("fn"),
        F.sum(F.when(~pred & ~pos, 1).otherwise(0)).cast("long").alias("tn"),
    )
    tp, fp, fn, tn = (F.col(x) for x in ("tp", "fp", "fn", "tn"))
    return cm.select(
        "tp",
        "fp",
        "fn",
        "tn",
        _q6(
            (tp.cast("double") * tn - fp.cast("double") * fn)
            / F.sqrt(
                (tp + fp).cast("double") * (tp + fn) * (tn + fp) * (tn + fn)
            )
        ).alias("mcc"),
        _q6(2.0 * tp / (2.0 * tp + fp + fn)).alias("f1"),
        _q6(
            (tp.cast("double") / (tp + fn) + tn.cast("double") / (tn + fp)) / 2.0
        ).alias("balanced_accuracy"),
    )


ext_classifier_mcc.__doc__ = ext_classifier_mcc.__doc__.format(th=_MCC_THRESHOLD)


_PASS_K = 5
_PASS_SUCCESS = 200  # dollars: an attempt "passes" when value > this


def _passk_prod_sql(k: int) -> str:
    """Unrolled unbiased pass@k product Pi_i max(n-c-i,0)/(n-i)."""
    return " * ".join(
        f"(CAST(greatest(n - c - {i}, 0) AS DOUBLE) / (n - {i}))"
        for i in range(k)
    )


@register(
    "ext_pass_at_k",
    oracle=f"""
WITH att AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN value > {_PASS_SUCCESS} THEN 1 ELSE 0 END)
              AS BIGINT) AS c
  FROM events GROUP BY 1
),
el AS (SELECT user_id, n, c FROM att WHERE n >= {_PASS_K}),
pq AS (
  SELECT CAST(floor((1.0 - CAST(n - c AS DOUBLE) / n) * 1000000 + 0.5)
              AS BIGINT) AS p1q,
         CAST(floor((1.0 - {_passk_prod_sql(_PASS_K)}) * 1000000 + 0.5)
              AS BIGINT) AS pkq,
         n, c
  FROM el
)
SELECT CAST(count(*) AS BIGINT) AS n_problems,
       CAST(sum(n) AS BIGINT) AS n_attempts,
       CAST(sum(c) AS BIGINT) AS n_successes,
       floor(CAST(sum(p1q) AS DOUBLE) / count(*) / 1000000.0 * 1000000 + 0.5)
         / 1000000.0 AS pass_at_1,
       floor(CAST(sum(pkq) AS DOUBLE) / count(*) / 1000000.0 * 1000000 + 0.5)
         / 1000000.0 AS pass_at_{_PASS_K}
FROM pq
""",
)
def ext_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PASS@K (Chen et al., HumanEval): treating each user as a
    "problem" and their events as attempts (success = value > {th}),
    the unbiased estimator pass@k = 1 - C(n-c, k)/C(n, k) averaged over
    problems — THE metric for sampled-generation eval, computed with
    the numerically-stable product form Pi_i (n-c-i)/(n-i) (the
    binomial-ratio form overflows; the product never does), zero-
    clamped so any exhausted factor collapses the product exactly.
    Problems with fewer than k attempts are excluded (the estimator is
    undefined there); attempt/success totals are reported so the
    exclusion is auditable.

    Per-problem estimates are pinned doubles of exact counts,
    MICRO-QUANTIZED then exact-int summed across problems (order-free
    at any problem count — the corpus-grain discipline).  Scale: one
    user-grain combine, then a 1-row reduce."""
    ev = table(spark, sf_dir, "events")
    att = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("value") > _PASS_SUCCESS, 1).otherwise(0))
        .cast("long")
        .alias("c"),
    )
    el = att.filter(F.col("n") >= _PASS_K)
    prod = None
    for i in range(_PASS_K):
        f = F.greatest(F.col("n") - F.col("c") - i, F.lit(0)).cast("double") / (
            F.col("n") - i
        )
        prod = f if prod is None else prod * f
    pq = el.select(
        "n",
        "c",
        F.floor((1.0 - (F.col("n") - F.col("c")).cast("double") / F.col("n")) * 1000000 + 0.5)
        .cast("long")
        .alias("p1q"),
        F.floor((1.0 - prod) * 1000000 + 0.5).cast("long").alias("pkq"),
    )
    out = pq.agg(
        F.count(F.lit(1)).cast("long").alias("n_problems"),
        F.sum("n").cast("long").alias("n_attempts"),
        F.sum("c").cast("long").alias("n_successes"),
        (
            F.floor(
                F.sum("p1q").cast("double") / F.count(F.lit(1)) / 1000000.0 * 1000000
                + 0.5
            )
            / 1000000.0
        ).alias("pass_at_1"),
        (
            F.floor(
                F.sum("pkq").cast("double") / F.count(F.lit(1)) / 1000000.0 * 1000000
                + 0.5
            )
            / 1000000.0
        ).alias(f"pass_at_{_PASS_K}"),
    )
    return out


ext_pass_at_k.__doc__ = ext_pass_at_k.__doc__.format(th=_PASS_SUCCESS)


def _spiegelhalter_oracle() -> str:
    mu = _mu_sql("a", "b")
    parts = [_platt_prelude()]
    parts.append(
        f""",
zf AS (
  SELECT a, b,
         {_fold_sql(f"(np - n * {mu}) * (1.0 - 2.0 * {mu})")} AS num,
         {_fold_sql(f"n * ((1.0 - 2.0 * {mu}) * (1.0 - 2.0 * {mu})) * ({mu} * (1.0 - {mu}))")} AS den
  FROM cells, it{_PLATT_ITERS}
  GROUP BY a, b
),
zz AS (SELECT num / sqrt(den) AS z FROM zf)
SELECT (SELECT nn FROM tot) AS n, (SELECT npos FROM tot) AS n_pos,
       floor(z * 1000000 + 0.5) / 1000000.0 AS z,
       floor(2.0 * (1.0 - {_norm_cdf_sql_import("abs(z)")}) * 1000000 + 0.5)
         / 1000000.0 AS p,
       CASE WHEN 2.0 * (1.0 - {_norm_cdf_sql_import("abs(z)")}) < 0.05
            THEN 'miscalibrated' ELSE 'calibrated' END AS verdict
FROM zz"""
    )
    return "".join(parts)


from ..operators.hypothesis import _norm_cdf as _norm_cdf_import  # noqa: E402
from ..operators.hypothesis import _norm_cdf_sql as _norm_cdf_sql_import  # noqa: E402


@register("ext_calibration_spiegelhalter", oracle=_spiegelhalter_oracle())
def ext_calibration_spiegelhalter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPIEGELHALTER'S Z TEST on the Platt-calibrated probabilities:
    after fitting P(purchase | value) = sigmoid(a*value + b)
    (``ext_platt_scaling``'s exact Newton fit, shared code), is the
    REMAINING miscalibration more than chance?  Z = sum (y - p)(1 - 2p)
    / sqrt(sum (1-2p)^2 p(1-p)) — the decomposition-based test that
    completes the calibration battery (ECE/MCE bin the error;
    isotonic/Platt fix it; Spiegelhalter TESTS whether anything
    fixable remains), with the shared-Phi two-sided p.

    Per-bucket terms are pinned sigmoid expressions of the shared
    (a, b) over exact counts, folded in value order; the oracle reuses
    the Platt prelude's unrolled Newton chain verbatim.  Scale: bounded
    dollar-bucket histogram throughout."""
    cells = _score_cells(spark, sf_dir)
    tot = cells.agg(
        F.sum("n").cast("long").alias("nn"), F.sum("np").cast("long").alias("npos")
    )
    ab = _platt_ab(cells)
    j = cells.crossJoin(F.broadcast(ab))
    m = _platt_mu()
    zf = j.groupBy("a", "b").agg(
        _ordfold(
            F.col("v"), (F.col("np") - F.col("n") * m) * (1.0 - 2.0 * m)
        ).alias("num"),
        _ordfold(
            F.col("v"),
            F.col("n") * ((1.0 - 2.0 * m) * (1.0 - 2.0 * m)) * (m * (1.0 - m)),
        ).alias("den"),
    )
    zz = zf.select((F.col("num") / F.sqrt(F.col("den"))).alias("z"))
    pv = 2.0 * (1.0 - _norm_cdf_import(F.abs(F.col("z"))))
    out = zz.crossJoin(F.broadcast(tot))
    return out.select(
        F.col("nn").alias("n"),
        F.col("npos").alias("n_pos"),
        _q6(F.col("z")).alias("z"),
        _q6(pv).alias("p"),
        F.when(pv < 0.05, "miscalibrated").otherwise("calibrated").alias("verdict"),
    )


@register(
    "ext_otsu_threshold",
    oracle="""
WITH vh AS (
  SELECT CAST(round(value) AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS t,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sc
  FROM events GROUP BY 1
),
tot AS (SELECT CAST(sum(t) AS BIGINT) AS n, CAST(sum(sc) AS BIGINT) AS s
        FROM vh),
cum AS (
  SELECT a.v,
         CAST(sum(b.t) AS BIGINT) AS w0,
         CAST(sum(b.sc) AS BIGINT) AS s0
  FROM vh a JOIN vh b ON b.v <= a.v GROUP BY a.v
),
sc_ AS (
  SELECT v, w0, s0,
         (CAST(s0 AS DOUBLE) * (n - w0) - CAST(s - s0 AS DOUBLE) * w0)
         * (CAST(s0 AS DOUBLE) * (n - w0) - CAST(s - s0 AS DOUBLE) * w0)
         / (CAST(w0 AS DOUBLE) * (n - w0)) AS crit
  FROM cum, tot WHERE w0 > 0 AND w0 < n
),
best AS (SELECT v, crit FROM sc_ ORDER BY crit DESC, v LIMIT 1)
SELECT (SELECT n FROM tot) AS n,
       v AS threshold_dollars,
       floor(crit / 10000.0 / (SELECT CAST(n AS DOUBLE) * n FROM tot)
             * 10000 + 0.5) / 10000.0 AS between_var
FROM best
""",
)
def ext_otsu_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OTSU'S THRESHOLD on the event-value histogram: the cut that
    MAXIMIZES between-class variance — the unsupervised operating-point
    picker (image binarization's workhorse, equally standard for
    auto-thresholding quality scores when no labels exist; the
    label-free complement to ``ext_classifier_mcc``'s fixed cut and
    ``ext_quality_threshold_sweep``'s labeled curve).

    Between-class variance w0 w1 (mu0 - mu1)^2 is evaluated in the
    cross-multiplied form (s0(n-w0) - (s-s0)w0)^2 / (w0(n-w0)) so every
    ingredient is an exact int64 cumulative (cents sums ~1e10 at the
    sf1 twin; the one squared product rides double in identical order);
    the argmax ties break on the threshold value.  Scale: one combine
    to the <= 561-dollar histogram, then histogram^2-bounded cumsums."""
    ev = table(spark, sf_dir, "events")
    # The tiny histogram feeds four consumers (a, b, tot, the argmax
    # lineage) — materialize ONCE so the corpus is scanned once, not 4x.
    vh = ev.groupBy(F.round("value").cast("long").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("sc"),
    ).localCheckpoint(eager=True)
    tot = vh.agg(
        F.sum("t").cast("long").alias("n"), F.sum("sc").cast("long").alias("s")
    )
    a = vh.select(F.col("v").alias("va"))
    b = vh.select(F.col("v").alias("vb"), "t", "sc")
    cum = (
        a.join(F.broadcast(b), F.col("vb") <= F.col("va"))
        .groupBy("va")
        .agg(
            F.sum("t").cast("long").alias("w0"),
            F.sum("sc").cast("long").alias("s0"),
        )
    )
    j = cum.crossJoin(F.broadcast(tot)).filter(
        (F.col("w0") > 0) & (F.col("w0") < F.col("n"))
    )
    num = F.col("s0").cast("double") * (F.col("n") - F.col("w0")) - (
        F.col("s") - F.col("s0")
    ).cast("double") * F.col("w0")
    crit = num * num / (F.col("w0").cast("double") * (F.col("n") - F.col("w0")))
    sc_ = j.select(F.col("va").alias("v"), "w0", "s0", crit.alias("crit"))
    best = sc_.orderBy(F.desc("crit"), "v").limit(1)
    out = best.crossJoin(F.broadcast(tot))
    return out.select(
        "n",
        F.col("v").alias("threshold_dollars"),
        (
            F.floor(
                F.col("crit")
                / 10000.0
                / (F.col("n").cast("double") * F.col("n"))
                * 10000
                + 0.5
            )
            / 10000.0
        ).alias("between_var"),
    )


_KNEE_GRID = 100  # normalized-curve evaluation points


@register(
    "ext_knee_point",
    oracle="""
WITH vh AS (
  SELECT CAST(round(value) AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS t
  FROM events GROUP BY 1
),
tot AS (SELECT CAST(sum(t) AS BIGINT) AS n,
               CAST(min(v) AS BIGINT) AS vmin,
               CAST(max(v) AS BIGINT) AS vmax FROM vh),
cum AS (
  SELECT a.v, CAST(sum(b.t) AS BIGINT) AS c
  FROM vh a JOIN vh b ON b.v <= a.v GROUP BY a.v
),
norm AS (
  SELECT v, c,
         CAST(v - vmin AS DOUBLE) / (vmax - vmin) AS x,
         CAST(c AS DOUBLE) / n AS y
  FROM cum, tot
),
dist AS (SELECT v, c, y - x AS d FROM norm),
best AS (SELECT v, c, d FROM dist ORDER BY d DESC, v LIMIT 1)
SELECT (SELECT n FROM tot) AS n,
       v AS knee_dollars,
       c AS docs_below,
       floor(d * 1000000 + 0.5) / 1000000.0 AS chord_distance,
       floor(CAST(c AS DOUBLE) / (SELECT n FROM tot) * 1000000 + 0.5)
         / 1000000.0 AS mass_below
FROM best
""",
)
def ext_knee_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KNEE/ELBOW DETECTION (Kneedle, chord form) on the event-value
    CDF: normalize the (value, cumulative-mass) curve to the unit
    square and return the point FARTHEST ABOVE the corner-to-corner
    chord — the "diminishing returns start here" cutoff used to pick
    retention thresholds from a score distribution without labels (the
    curve-geometry sibling of ``ext_otsu_threshold``'s variance
    criterion; the two disagreeing flags a multi-modal distribution).

    For a concave CDF the chord distance is (y - x) up to the constant
    sqrt(2) factor, so the argmax needs one pinned subtraction per
    histogram bucket over exact int cumulatives; ties break on the
    value.  Scale: histogram-bounded."""
    ev = table(spark, sf_dir, "events")
    vh = ev.groupBy(F.round("value").cast("long").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("t")
    ).localCheckpoint(eager=True)  # one corpus scan for the three consumers
    tot = vh.agg(
        F.sum("t").cast("long").alias("n"),
        F.min("v").cast("long").alias("vmin"),
        F.max("v").cast("long").alias("vmax"),
    )
    a = vh.select(F.col("v").alias("va"))
    b = vh.select(F.col("v").alias("vb"), "t")
    cum = (
        a.join(F.broadcast(b), F.col("vb") <= F.col("va"))
        .groupBy("va")
        .agg(F.sum("t").cast("long").alias("c"))
    )
    norm = cum.crossJoin(F.broadcast(tot)).select(
        F.col("va").alias("v"),
        "c",
        (
            (F.col("va") - F.col("vmin")).cast("double")
            / (F.col("vmax") - F.col("vmin"))
        ).alias("x"),
        (F.col("c").cast("double") / F.col("n")).alias("y"),
    )
    dist = norm.select("v", "c", (F.col("y") - F.col("x")).alias("d"))
    best = dist.orderBy(F.desc("d"), "v").limit(1)
    out = best.crossJoin(F.broadcast(tot))
    return out.select(
        "n",
        F.col("v").alias("knee_dollars"),
        F.col("c").alias("docs_below"),
        (F.floor(F.col("d") * 1000000 + 0.5) / 1000000.0).alias("chord_distance"),
        (
            F.floor(F.col("c").cast("double") / F.col("n") * 1000000 + 0.5)
            / 1000000.0
        ).alias("mass_below"),
    )
