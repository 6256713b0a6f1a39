"""Independent-reference pins for wave M: the turning-point randomness
test and Spiegelhalter's calibration Z over the shared Platt fit."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from satellite_data_ingestion_spark import registry
from satellite_data_ingestion_spark.catalog import table

SF = "/root/testdata/sf0.001"


def _phi(z: float) -> float:
    return 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))


def test_turning_points_matches_reference(spark):
    (r,) = registry.spec("agg_turning_points").fn(spark, SF).collect()
    ev = table(spark, SF, "events")
    d = ev.groupBy(
        F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"))
    ys = [s for _, s in sorted((x.d, x.s) for x in d.collect())]
    n = len(ys)
    t = sum(
        1
        for i in range(1, n - 1)
        if (ys[i] > ys[i - 1] and ys[i] > ys[i + 1])
        or (ys[i] < ys[i - 1] and ys[i] < ys[i + 1])
    )
    e = 2 * (n - 2) / 3
    var = (16 * n - 29) / 90
    z = (t - e) / math.sqrt(var)
    assert (r.n_days, r.turning_points) == (n, t)
    assert abs(r.expected - e) < 6e-5
    assert abs(r.z - z) < 2e-6
    assert abs(r.p - 2 * (1 - _phi(abs(z)))) < 1e-5
    assert r.verdict in ("too_smooth", "too_oscillatory", "random")


def test_spiegelhalter_matches_reference(spark):
    (r,) = registry.spec("ext_calibration_spiegelhalter").fn(spark, SF).collect()
    rows = table(spark, SF, "events").select("event_type", "value").collect()
    cells: dict = {}
    for x in rows:
        v = math.floor(x.value + 0.5)
        n, np_ = cells.get(v, (0, 0))
        cells[v] = (n + 1, np_ + (1 if x.event_type == "purchase" else 0))
    nn = sum(n for n, _ in cells.values())
    npos = sum(c for _, c in cells.values())
    a, b = 0.0, math.log(npos / (nn - npos))
    for _ in range(3):
        g1 = g2 = h11 = h12 = h22 = 0.0
        for v in sorted(cells):
            n, np_ = cells[v]
            mu = 1.0 / (1.0 + math.exp(-(a * v + b)))
            g1 += (np_ - n * mu) * v
            g2 += np_ - n * mu
            w = n * mu * (1 - mu)
            h11 += w * v * v
            h12 += w * v
            h22 += w
        det = h11 * h22 - h12 * h12
        a, b = a + (h22 * g1 - h12 * g2) / det, b + (h11 * g2 - h12 * g1) / det
    num = den = 0.0
    for v in sorted(cells):
        n, np_ = cells[v]
        mu = 1.0 / (1.0 + math.exp(-(a * v + b)))
        num += (np_ - n * mu) * (1 - 2 * mu)
        den += n * (1 - 2 * mu) ** 2 * mu * (1 - mu)
    z = num / math.sqrt(den)
    assert (r.n, r.n_pos) == (nn, npos)
    assert abs(r.z - z) < 2e-6 + 1e-9 * abs(z)
    assert abs(r.p - 2 * (1 - _phi(abs(z)))) < 1e-5
    assert r.verdict in ("miscalibrated", "calibrated")
    # after a fresh in-sample Platt fit, gross miscalibration is gone:
    # the score's z must be far below the raw-prior baseline's
    assert abs(r.z) < 10.0
