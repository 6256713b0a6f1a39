"""Independent-reference pins for wave H: generalized-ESD outliers,
rank-biased overlap, DeLong AUC, and Platt scaling."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from satellite_data_ingestion_spark import registry
from satellite_data_ingestion_spark.catalog import table

SF = "/root/testdata/sf0.001"


def _daily_cents(spark):
    ev = table(spark, SF, "events")
    d = ev.groupBy(
        F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"))
    return dict(sorted((r.d, r.s) for r in d.collect()))


def test_esd_outliers_match_reference(spark):
    rows = registry.spec("agg_esd_outliers").fn(spark, SF).collect()
    data = _daily_cents(spark)
    remaining = dict(data)
    for j, r in enumerate(sorted(rows, key=lambda x: x.round), 1):
        assert r.round == j
        n = len(remaining)
        mean = sum(remaining.values()) / n
        sd = math.sqrt(
            sum((y - mean) ** 2 for y in remaining.values()) / (n - 1)
        )
        scored = {d: abs(y - mean) / sd for d, y in remaining.items()}
        top = min(scored, key=lambda d: (-scored[d], d))
        assert r.day_index == top
        assert abs(r.value_dollars - remaining[top] / 100) < 6e-5
        assert abs(r.r_stat - scored[top]) < 2e-6
        del remaining[top]
    # statistics are non-increasing is NOT guaranteed, but all positive
    assert all(r.r_stat > 0 for r in rows)


def test_rank_biased_overlap_matches_reference(spark):
    (r,) = registry.spec("ext_rank_biased_overlap").fn(spark, SF).collect()
    li = table(spark, SF, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.datediff(
            F.date_trunc("day", "l_shipdate"), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("d"),
    ).collect()
    orders = {
        int(o.o_orderkey): int(o.o_custkey)
        for o in table(spark, SF, "orders").collect()
    }
    nation = {
        int(c.c_custkey): int(c.c_nationkey)
        for c in table(spark, SF, "customer").collect()
    }
    mn = min(x.d for x in li)
    mx = max(x.d for x in li)
    rev: dict = defaultdict(lambda: defaultdict(int))
    for x in li:
        ck = orders.get(int(x.l_orderkey))
        if ck is None or ck not in nation:
            continue
        half = 0 if 2 * (x.d - mn) < (mx - mn) else 1
        rev[half][nation[ck]] += x.cents

    def topk(h):
        return [
            nk
            for nk, _ in sorted(rev[h].items(), key=lambda kv: (-kv[1], kv[0]))
        ][:15]

    a, b = topk(0), topk(1)
    p = 0.9
    rbo = 0.0
    for d in range(1, 16):
        x = len(set(a[:d]) & set(b[:d]))
        rbo += (1 - p) * p ** (d - 1) * x / d
    overlap = len(set(a) & set(b))
    assert (r.k, r.p) == (15, 0.9)
    assert r.overlap_at_k == overlap
    assert abs(r.rbo - rbo) < 2e-6
    assert abs(r.jaccard_at_k - overlap / (30 - overlap)) < 2e-6
    assert 0.0 <= r.rbo <= 1.0


def _scores(spark):
    rows = table(spark, SF, "events").select("event_type", "value").collect()
    # half-up like both engines' round() — Python round() is banker's
    pos = [math.floor(r.value + 0.5) for r in rows if r.event_type == "purchase"]
    neg = [math.floor(r.value + 0.5) for r in rows if r.event_type != "purchase"]
    return pos, neg


def test_auc_delong_matches_reference(spark):
    (r,) = registry.spec("ext_auc_delong").fn(spark, SF).collect()
    pos, neg = _scores(spark)
    n1, n0 = len(pos), len(neg)
    # direct O(n1*n0)-free AUC via counters
    cneg = Counter(neg)
    below = {}
    run = 0
    for v in sorted(cneg):
        below[v] = run
        run += cneg[v]
    v10 = []
    for s in pos:
        lt = sum(c for v, c in cneg.items() if v < s)
        eq = cneg.get(s, 0)
        v10.append((lt + 0.5 * eq) / n0)
    cpos = Counter(pos)
    v01 = []
    for s in neg:
        lt = sum(c for v, c in cpos.items() if v > s)
        eq = cpos.get(s, 0)
        v01.append((lt + 0.5 * eq) / n1)
    auc = sum(v10) / n1
    assert abs(sum(v01) / n0 - auc) < 1e-12  # identity check on the reference
    s10 = sum((x - auc) ** 2 for x in v10) / (n1 - 1)
    s01 = sum((x - auc) ** 2 for x in v01) / (n0 - 1)
    se = math.sqrt(s10 / n1 + s01 / n0)
    assert (r.n_pos, r.n_neg) == (n1, n0)
    assert abs(r.auc - auc) < 2e-6
    assert abs(r.se - se) < 2e-6
    assert abs(r.ci_lo - max(0.0, auc - 1.959963984540054 * se)) < 2e-6
    assert abs(r.ci_hi - min(1.0, auc + 1.959963984540054 * se)) < 2e-6
    assert r.ci_lo <= r.auc <= r.ci_hi


def test_platt_scaling_matches_reference(spark):
    (r,) = registry.spec("ext_platt_scaling").fn(spark, SF).collect()
    pos, neg = _scores(spark)
    cells: dict = defaultdict(lambda: [0, 0])
    for s in pos:
        cells[s][0] += 1
        cells[s][1] += 1
    for s in neg:
        cells[s][0] += 1
    nn = len(pos) + len(neg)
    a, b = 0.0, math.log(len(pos) / len(neg))
    for _ in range(3):
        g1 = g2 = h11 = h12 = h22 = 0.0
        for v in sorted(cells):
            n, np_ = cells[v]
            mu = 1.0 / (1.0 + math.exp(-(a * v + b)))
            g1 += (np_ - n * mu) * v
            g2 += np_ - n * mu
            w = n * mu * (1.0 - mu)
            h11 += w * v * v
            h12 += w * v
            h22 += w
        det = h11 * h22 - h12 * h12
        a, b = a + (h22 * g1 - h12 * g2) / det, b + (h11 * g2 - h12 * g1) / det
    nll = 0.0
    for v in sorted(cells):
        n, np_ = cells[v]
        mu = 1.0 / (1.0 + math.exp(-(a * v + b)))
        nll += -(np_ * math.log(mu) + (n - np_) * math.log(1.0 - mu))
    assert (r.n, r.n_pos) == (nn, len(pos))
    assert abs(r.slope - a) < 2e-6
    assert abs(r.intercept - b) < 2e-6
    assert abs(r.log_loss - nll / nn) < 2e-6
    # a calibrated fit cannot lose to the constant-prior baseline
    p0 = len(pos) / nn
    base = -(p0 * math.log(p0) + (1 - p0) * math.log(1 - p0))
    assert r.log_loss <= base + 1e-9


def test_stream_page_hinkley_matches_batch_twin(spark):
    sr = registry.spec("stream_page_hinkley").fn(spark, SF).collect()
    br = registry.spec("agg_page_hinkley").fn(spark, SF).collect()
    assert len(sr) == len(br) == 1
    s, b = sr[0], br[0]
    # the streaming build must land on the exact batch state
    assert (s.n_days, s.alarm_day) == (b.n_days, b.alarm_day)
    assert abs(s.delta - b.delta) < 1e-9
    assert abs(s.ph_stat - b.ph_stat) < 1e-9


def test_classifier_mcc_matches_reference(spark):
    (r,) = registry.spec("ext_classifier_mcc").fn(spark, SF).collect()
    rows = table(spark, SF, "events").select("event_type", "value").collect()
    tp = sum(1 for x in rows if x.value > 100 and x.event_type == "purchase")
    fp = sum(1 for x in rows if x.value > 100 and x.event_type != "purchase")
    fn = sum(1 for x in rows if x.value <= 100 and x.event_type == "purchase")
    tn = sum(1 for x in rows if x.value <= 100 and x.event_type != "purchase")
    assert (r.tp, r.fp, r.fn, r.tn) == (tp, fp, fn, tn)
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert abs(r.mcc - mcc) < 2e-6
    assert abs(r.f1 - 2 * tp / (2 * tp + fp + fn)) < 2e-6
    assert abs(r.balanced_accuracy - (tp / (tp + fn) + tn / (tn + fp)) / 2) < 2e-6
    assert -1.0 <= r.mcc <= 1.0
