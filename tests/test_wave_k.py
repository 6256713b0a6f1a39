"""Independent-reference pins for wave K: the two-sample EDF pair
(Cramer-von Mises, Anderson-Darling k=2) and Quade's range-weighted
Friedman — brute-force recomputation from raw collected values against
the published formulas (Anderson 1962; Scholz & Stephens 1987 eq. 6;
Quade 1979)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from satellite_data_ingestion_spark import registry
from satellite_data_ingestion_spark.catalog import table

SF = "/root/testdata/sf0.001"


def _halves(spark):
    rows = table(spark, SF, "events").select("event_id", "value").collect()
    a = sorted(r.value for r in rows if r.event_id % 2 == 0)
    b = sorted(r.value for r in rows if r.event_id % 2 != 0)
    return a, b


def _ecdf_steps(a, b):
    """Per distinct pooled value: (t, cum_a, cum_b)."""
    from collections import Counter

    ca, cb = Counter(a), Counter(b)
    cum_a = cum_b = 0
    for v in sorted(set(a) | set(b)):
        cum_a += ca.get(v, 0)
        cum_b += cb.get(v, 0)
        yield ca.get(v, 0) + cb.get(v, 0), cum_a, cum_b


def test_cvm_matches_reference(spark):
    (r,) = registry.spec("agg_cvm_test").fn(spark, SF).collect()
    a, b = _halves(spark)
    na, nb = len(a), len(b)
    nn = na + nb
    s = 0.0
    for t, cum_a, cum_b in _ecdf_steps(a, b):
        gap = cum_a / na - cum_b / nb
        s += t * gap * gap
    t_stat = na * nb / (nn * nn) * s
    assert (r.na, r.nb) == (na, nb)
    assert abs(r.cvm_t - t_stat) < 2e-6
    assert abs(r.e_t - (1 + 1 / nn) / 6) < 2e-6
    assert r.verdict == (
        "distributions_differ" if t_stat > 0.461 else "no_difference"
    )


def test_ad_2sample_matches_reference(spark):
    (r,) = registry.spec("agg_ad_2sample").fn(spark, SF).collect()
    a, b = _halves(spark)
    na, nb = len(a), len(b)
    nn = na + nb
    s = 0.0
    for t, cum_a, cum_b in _ecdf_steps(a, b):
        cum = cum_a + cum_b
        if cum >= nn:
            continue
        d = nn * cum_a - na * cum
        s += t * (d * d) / (cum * (nn - cum))
    ad = (1 / na + 1 / nb) * s / nn
    assert (r.na, r.nb) == (na, nb)
    assert abs(r.ad_stat - ad) < 2e-6
    assert r.verdict == (
        "distributions_differ" if ad > 2.492 else "no_difference"
    )
    # AD's tail weights make it at least as large as plain CvM's sum scale
    assert r.ad_stat > 0


def test_quade_matches_reference(spark):
    (r,) = registry.spec("agg_quade_test").fn(spark, SF).collect()
    ev = table(spark, SF, "events")
    d = ev.groupBy(
        F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("b"),
        "event_type",
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("y"))
    cells: dict = defaultdict(dict)
    for x in d.collect():
        cells[x.b][x.event_type] = x.y

    def midranks(vals):
        out = {}
        sv = sorted(vals)
        for i, v in enumerate(vals):
            lo = sum(1 for u in sv if u < v)
            eq = sum(1 for u in sv if u == v)
            out[i] = lo + (eq + 1) / 2
        return out

    blocks = sorted(cells)
    treatments = sorted({t for bb in cells.values() for t in bb})
    k, nb = len(treatments), len(blocks)
    ranges = [max(cells[bb].values()) - min(cells[bb].values()) for bb in blocks]
    qr = midranks(ranges)
    s_bt: dict = {}
    for i, bb in enumerate(blocks):
        vals = [cells[bb][t] for t in treatments]
        rr = midranks(vals)
        for j, t in enumerate(treatments):
            s_bt[(bb, t)] = qr[i] * (rr[j] - (k + 1) / 2)
    a2 = sum(v * v for v in s_bt.values())
    sj = {t: sum(s_bt[(bb, t)] for bb in blocks) for t in treatments}
    bstat = sum(v * v for v in sj.values()) / nb
    f = (nb - 1) * bstat / (a2 - bstat)
    assert (r.n_blocks, r.n_treatments) == (nb, k)
    assert (r.df1, r.df2) == (k - 1, (nb - 1) * (k - 1))
    assert abs(r.f_stat - f) < 2e-6 + 1e-9 * abs(f)
