"""Independent-reference pins for wave P: the Rayleigh circular test,
second-digit Benford, and first-order Markov transitions."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from satellite_data_ingestion_spark import registry
from satellite_data_ingestion_spark.catalog import table

SF = "/root/testdata/sf0.001"


def test_rayleigh_matches_reference(spark):
    (r,) = registry.spec("agg_rayleigh_test").fn(spark, SF).collect()
    hours = [
        int(x.h)
        for x in table(spark, SF, "events").select(F.hour("ts").alias("h")).collect()
    ]
    n = len(hours)
    sc = sum(math.cos(2 * math.pi * h / 24) for h in hours)
    ss = sum(math.sin(2 * math.pi * h / 24) for h in hours)
    rbar = math.sqrt(sc * sc + ss * ss) / n
    theta = math.atan2(ss, sc)
    if theta < 0:
        theta += 2 * math.pi
    z = n * rbar * rbar
    p = math.exp(-z) * (1 + (2 * z - z * z) / (4 * n))
    assert r.n == n
    assert abs(r.mean_hour - theta / (2 * math.pi) * 24) < 1e-3
    assert abs(r.resultant - rbar) < 2e-6
    assert abs(r.rayleigh_z - z) < 2e-6 + 1e-9 * z
    assert abs(r.p - p) < 1e-5
    assert 0.0 <= r.mean_hour < 24.0 and 0.0 <= r.resultant <= 1.0


def test_benford_2digit_matches_reference(spark):
    (r,) = registry.spec("agg_benford_2digit").fn(spark, SF).collect()
    cents = [
        round(x.value * 100)
        for x in table(spark, SF, "events").select("value").collect()
    ]
    digits = Counter()
    for c in cents:
        if c >= 10:
            s = str(c)
            digits[int(s[1])] += 1
    n = sum(digits.values())
    exp = [
        sum(math.log10(1 + 1 / (10 * d1 + d2)) for d1 in range(1, 10))
        for d2 in range(10)
    ]
    chi2 = sum(
        (digits.get(d, 0) - n * exp[d]) ** 2 / (n * exp[d]) for d in range(10)
    )
    assert r.n == n and r.df == 9
    assert abs(r.chi2 - chi2) < 6e-5 + 1e-9 * chi2
    assert 0.0 <= r.p <= 1.0
    assert r.verdict in ("deviates", "conforms")


def test_markov_transitions_match_reference(spark):
    rows = {
        r.state: r
        for r in registry.spec("ext_markov_transitions").fn(spark, SF).collect()
    }
    ev = table(spark, SF, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    seqs: dict = defaultdict(list)
    for x in ev:
        seqs[int(x.user_id)].append((x.ts, int(x.event_id), x.event_type))
    cells: Counter = Counter()
    for s in seqs.values():
        s.sort()
        for i in range(1, len(s)):
            cells[(s[i - 1][2], s[i][2])] += 1
    states = sorted({a for a, _ in cells})
    na = {a: sum(c for (x, _), c in cells.items() if x == a) for a in states}
    p = {(a, b): c / na[a] for (a, b), c in cells.items()}
    pi = {s: 1.0 / len(states) for s in states}
    for _ in range(5):
        nxt = {}
        for b in states:
            nxt[b] = sum(pi[a] * p.get((a, b), 0.0) for a in sorted(states))
        pi = nxt
    assert set(rows) == set(states)
    for s in states:
        r = rows[s]
        assert r.n_out == na[s]
        assert abs(r.pi_stationary - pi[s]) < 2e-6
        assert abs(r.self_prob - p.get((s, s), 0.0)) < 2e-6
    # a probability distribution after 5 iterations still sums to ~1
    assert abs(sum(r.pi_stationary for r in rows.values()) - 1.0) < 1e-4
