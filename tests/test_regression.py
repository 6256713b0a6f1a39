"""Independent-reference pins for the regression-diagnostics battery
(operators/regression.py).  Each test recomputes the statistic from the
raw collected rows with a SEPARATELY-written pure-Python implementation
(numpy-free textbook formulas; math.erf where a normal CDF is needed),
plus qualitative contracts (leverage bounds, verdict labels)."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from satellite_data_ingestion_spark import registry
from satellite_data_ingestion_spark.catalog import table

SF = "/root/testdata/sf0.001"


def _phi(z: float) -> float:
    return 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))


def _daily(spark):
    ev = table(spark, SF, "events")
    d = ev.groupBy(
        F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"))
    rows = sorted((r.d, r.s) for r in d.collect())
    mn = rows[0][0]
    return [(d - mn, s) for d, s in rows]


def _ols(pts):
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    return n, sx, sxx, a, b


def test_breusch_pagan_matches_reference(spark):
    (r,) = registry.spec("agg_breusch_pagan").fn(spark, SF).collect()
    pts = _daily(spark)
    n, sx, sxx, a, b = _ols(pts)
    e2 = [(x, (y - a - b * x) ** 2) for x, y in pts]
    se2 = sum(v for _, v in e2)
    sxe2 = sum(x * v for x, v in e2)
    se4 = sum(v * v for _, v in e2)
    num = n * sxe2 - sx * se2
    dx = n * sxx - sx * sx
    de = n * se4 - se2 * se2
    lm = n * (num * num / (dx * de))
    assert r.n_days == n
    assert abs(r.slope - b) < 6e-5 + 1e-9 * abs(b)
    assert abs(r.lm - lm) < 2e-6 + 1e-9 * lm
    assert 0.0 <= r.p <= 1.0


def test_chow_matches_reference(spark):
    (r,) = registry.spec("agg_chow_test").fn(spark, SF).collect()
    pts = _daily(spark)
    mx = max(x for x, _ in pts)

    def ssr(sub):
        n = len(sub)
        sx = sum(x for x, _ in sub)
        sy = sum(y for _, y in sub)
        sxx = sum(x * x for x, _ in sub)
        sxy = sum(x * y for x, y in sub)
        syy = sum(y * y for _, y in sub)
        dyy = n * syy - sy * sy
        dxy = n * sxy - sx * sy
        dx = n * sxx - sx * sx
        return (dyy - dxy * dxy / dx) / n

    r1 = [(x, y) for x, y in pts if 2 * x < mx]
    r2 = [(x, y) for x, y in pts if 2 * x >= mx]
    sp, s1, s2 = ssr(pts), ssr(r1), ssr(r2)
    n = len(pts)
    f = ((sp - (s1 + s2)) / 2.0) / ((s1 + s2) / (n - 4))
    assert (r.n_days, r.n1, r.n2) == (n, len(r1), len(r2))
    assert abs(r.ssr_pooled - sp) < 6e-5 + 1e-9 * sp
    assert abs(r.ssr_split - (s1 + s2)) < 6e-5 + 1e-9 * (s1 + s2)
    assert abs(r.f_stat - f) < 2e-6 + 1e-9 * abs(f)


def test_cooks_distance_matches_reference(spark):
    rows = registry.spec("agg_cooks_distance").fn(spark, SF).collect()
    pts = _daily(spark)
    n, sx, sxx, a, b = _ols(pts)
    xb = sx / n
    sxxc = sxx - sx * sx / n
    res = {x: y - a - b * x for x, y in pts}
    se2 = sum(v * v for v in res.values())
    s2 = se2 / (n - 2)
    cd = {}
    lev = {}
    for x in res:
        h = 1.0 / n + (x - xb) ** 2 / sxxc
        lev[x] = h
        cd[x] = res[x] ** 2 * h / (2.0 * s2 * (1.0 - h) ** 2)
    top = sorted(cd, key=lambda x: (-cd[x], x))[:10]
    assert [r.day_index for r in rows] == top
    for r in rows:
        assert abs(r.resid - res[r.day_index]) < 6e-5 + 1e-9 * abs(res[r.day_index])
        assert abs(r.leverage - lev[r.day_index]) < 2e-6
        assert abs(r.cooks_d - cd[r.day_index]) < 2e-6 + 1e-9 * cd[r.day_index]
        # simple-OLS leverage is bounded by 1/n and 1
        assert 1.0 / len(pts) <= r.leverage < 1.0


def test_variance_ratio_matches_reference(spark):
    (r,) = registry.spec("ext_ts_variance_ratio").fn(spark, SF).collect()
    pts = _daily(spark)
    y = dict(pts)
    tt = len(pts) - 1
    q = 5
    mu = (y[tt] - y[0]) / tt
    sa = sum((y[x] - y[x - 1] - mu) ** 2 for x in range(1, tt + 1))
    sq = sum((y[x] - y[x - q] - q * mu) ** 2 for x in range(q, tt + 1))
    m = q * (tt - q + 1) * (1.0 - q / tt)
    vr = (sq / m) / (sa / (tt - 1))
    z = (vr - 1.0) / math.sqrt(2.0 * (2 * q - 1) * (q - 1) / (3.0 * q * tt))
    assert (r.n_days, r.q) == (tt + 1, q)
    assert abs(r.vr - vr) < 2e-6
    assert abs(r.z - z) < 2e-6 + 1e-9 * abs(z)
    assert abs(r.p - 2.0 * (1.0 - _phi(abs(z)))) < 1e-5
    assert r.verdict in ("trending", "mean_reverting", "random_walk")


def test_engle_granger_matches_reference(spark):
    (r,) = registry.spec("ext_ts_engle_granger").fn(spark, SF).collect()
    ev = table(spark, SF, "events").select(
        F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).collect()
    acc = defaultdict(lambda: [0, 0])
    for x in ev:
        if x.event_type == "click":
            acc[x.d][0] += x.cents
        elif x.event_type == "view":
            acc[x.d][1] += x.cents
    mn = min(acc)
    pts = sorted((d - mn, c, v) for d, (c, v) in acc.items())
    n = len(pts)
    sc = sum(c for _, c, _ in pts)
    sv = sum(v for _, _, v in pts)
    scc = sum(c * c for _, c, _ in pts)
    scv = sum(c * v for _, c, v in pts)
    beta = (n * scv - sc * sv) / (n * scc - sc * sc)
    alpha = (sv - beta * sc) / n
    e = {x: v - alpha - beta * c for x, c, v in pts}
    num = sum(e[x - 1] * (e[x] - e[x - 1]) for x in range(1, n))
    den = sum(e[x - 1] ** 2 for x in range(1, n))
    rho = num / den
    sse = sum(((e[x] - e[x - 1]) - rho * e[x - 1]) ** 2 for x in range(1, n))
    t = rho / math.sqrt((sse / (n - 2)) / den)
    assert r.n_days == n
    assert abs(r.beta - beta) < 2e-6
    assert abs(r.alpha - alpha) < 6e-5 + 1e-9 * abs(alpha)
    assert abs(r.rho - rho) < 2e-6
    assert abs(r.adf_t - t) < 2e-6 + 1e-9 * abs(t)
    assert r.verdict in ("cointegrated", "not_cointegrated")
    assert r.verdict == ("cointegrated" if t < -3.37 else "not_cointegrated")
