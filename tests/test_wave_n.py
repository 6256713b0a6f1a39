"""Independent-reference pins for wave N: Otsu's threshold, the Kneedle
knee point, and log-log price elasticity."""

from __future__ import annotations

import math
from collections import Counter

from satellite_data_ingestion_spark import registry
from satellite_data_ingestion_spark.catalog import table

SF = "/root/testdata/sf0.001"


def _hist(spark):
    rows = table(spark, SF, "events").select("value").collect()
    vals = [math.floor(r.value + 0.5) for r in rows]
    cents = [round(r.value * 100) for r in rows]
    return rows, vals, cents


def test_otsu_matches_bruteforce(spark):
    (r,) = registry.spec("ext_otsu_threshold").fn(spark, SF).collect()
    rows, vals, cents = _hist(spark)
    pairs = sorted(zip(vals, cents))
    n = len(pairs)
    best = None
    for thr in sorted(set(vals)):
        lo = [(v, c) for v, c in pairs if v <= thr]
        w0 = len(lo)
        if w0 == 0 or w0 == n:
            continue
        s0 = sum(c for _, c in lo)
        s = sum(c for _, c in pairs)
        num = s0 * (n - w0) - (s - s0) * w0
        crit = num * num / (w0 * (n - w0))
        if best is None or crit > best[1] or (crit == best[1] and thr < best[0]):
            if best is None or crit > best[1]:
                best = (thr, crit)
    assert r.n == n
    assert r.threshold_dollars == best[0]
    # cross-check the reported between-class variance (dollars^2 units)
    expect = best[1] / 1e4 / (n * n)
    assert abs(r.between_var - expect) < 6e-5 + 1e-6 * expect
    # Otsu threshold must separate two non-empty classes
    assert min(vals) <= r.threshold_dollars < max(vals)


def test_knee_point_matches_bruteforce(spark):
    (r,) = registry.spec("ext_knee_point").fn(spark, SF).collect()
    _, vals, _ = _hist(spark)
    n = len(vals)
    c = Counter(vals)
    vmin, vmax = min(vals), max(vals)
    cum = 0
    best = None
    for v in sorted(c):
        cum += c[v]
        x = (v - vmin) / (vmax - vmin)
        y = cum / n
        d = y - x
        if best is None or d > best[2]:
            best = (v, cum, d)
    assert r.n == n
    assert (r.knee_dollars, r.docs_below) == (best[0], best[1])
    assert abs(r.chord_distance - best[2]) < 2e-6
    assert abs(r.mass_below - best[1] / n) < 2e-6
    # the knee lies strictly inside the curve for a concave CDF
    assert 0.0 < r.mass_below <= 1.0


def test_price_elasticity_matches_reference(spark):
    (r,) = registry.spec("agg_price_elasticity").fn(spark, SF).collect()
    li = table(spark, SF, "lineitem").select("l_extendedprice", "l_quantity").collect()
    pts = [
        (
            math.floor(math.log(x.l_extendedprice / x.l_quantity) * 1e4 + 0.5),
            math.floor(math.log(x.l_quantity) * 1e4 + 0.5),
        )
        for x in li
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    dxx = n * sxx - sx * sx
    dyy = n * syy - sy * sy
    dxy = n * sxy - sx * sy
    slope = dxy / dxx
    rr = dxy / math.sqrt(dxx * dyy)
    mx, my = sx / n / 1e4, sy / n / 1e4
    assert r.n == n
    assert abs(r.elasticity - slope) < 2e-6
    assert abs(r.r2 - rr * rr) < 2e-6
    assert abs(r.intercept - (my - slope * mx)) < 6e-5
    assert abs(r.geomean_unit_price - math.exp(mx)) < 6e-5 + 1e-6 * math.exp(mx)
    # demand curves slope down: higher unit price, fewer units
    assert r.elasticity < 0
