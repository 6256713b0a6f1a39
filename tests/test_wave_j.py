"""Independent-reference pins for wave J: Hodges-Lehmann location,
Rousseeuw-Croux Qn scale, and the CUSUM-of-squares variance check —
each recomputed by brute force over the raw collected values."""

from __future__ import annotations

import statistics

from pyspark.sql import functions as F

from satellite_data_ingestion_spark import registry
from satellite_data_ingestion_spark.catalog import table

SF = "/root/testdata/sf0.001"


def _quantities(spark):
    return [
        int(x.l_quantity)
        for x in table(spark, SF, "lineitem").select("l_quantity").collect()
    ]


def test_hodges_lehmann_matches_bruteforce(spark):
    (r,) = registry.spec("agg_hodges_lehmann").fn(spark, SF).collect()
    q = _quantities(spark)
    n = len(q)
    walsh = []
    qs = sorted(q)
    for i in range(n):
        for j in range(i, n):
            walsh.append(qs[i] + qs[j])
    walsh.sort()
    hl = statistics.median(walsh) / 2
    assert r.n == n and r.n_pairs == n * (n + 1) // 2 == len(walsh)
    assert abs(r.hl_estimate - hl) < 2e-6
    assert abs(r.mean - sum(q) / n) < 2e-6
    # robust location must land inside the data range
    assert min(q) <= r.hl_estimate <= max(q)


def test_qn_scale_matches_bruteforce(spark):
    (r,) = registry.spec("agg_qn_scale").fn(spark, SF).collect()
    q = _quantities(spark)
    n = len(q)
    diffs = []
    for i in range(n):
        for j in range(i + 1, n):
            diffs.append(abs(q[i] - q[j]))
    diffs.sort()
    h = n // 2 + 1
    k = h * (h - 1) // 2
    raw = diffs[k - 1]
    assert (r.n, r.k, r.qn_raw) == (n, k, raw)
    assert abs(r.qn - 2.21914446598508 * raw) < 2e-6
    assert r.qn > 0


def test_cusum_squares_matches_reference(spark):
    (r,) = registry.spec("ext_cusum_squares").fn(spark, SF).collect()
    ev = table(spark, SF, "events")
    d = ev.groupBy(
        F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"))
    daily = dict(sorted((x.d, x.s) for x in d.collect()))
    days = sorted(daily)
    rets = [
        (days[i], daily[days[i]] - daily[days[i - 1]])
        for i in range(1, len(days))
    ]
    sr2 = sum(x * x for _, x in rets)
    best = None
    c2 = 0
    for i, (day, x) in enumerate(rets, 1):
        c2 += x * x
        dev = abs(c2 / sr2 - i / len(rets))
        if best is None or dev > best[1] + 1e-15 or (
            abs(dev - best[1]) <= 1e-15 and day < best[0]
        ):
            if best is None or dev > best[1]:
                best = (day, dev)
    assert r.n_returns == len(rets)
    assert r.at_day == best[0]
    assert abs(r.max_dev - best[1]) < 2e-6
    assert 0.0 < r.max_dev < 1.0


def test_lis_trend_matches_bruteforce(spark):
    rows = {
        r.event_type: r
        for r in registry.spec("ext_lis_trend").fn(spark, SF).collect()
    }
    ev = table(spark, SF, "events")
    d = ev.groupBy(
        "event_type",
        F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"))
    series: dict = {}
    for x in d.collect():
        series.setdefault(x.event_type, []).append((x.d, x.s))
    assert set(rows) == set(series)
    for et, pts in series.items():
        ys = [y for _, y in sorted(pts)]
        n = len(ys)
        dp = [1] * n
        for j in range(n):
            for i in range(j):
                if ys[i] < ys[j]:
                    dp[j] = max(dp[j], dp[i] + 1)
        lis = max(dp)
        r = rows[et]
        assert (r.n_days, r.lis_len) == (n, lis)
        assert abs(r.persistence - lis / n) < 2e-6
        assert 1 <= r.lis_len <= r.n_days
