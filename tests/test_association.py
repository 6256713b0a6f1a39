"""Independent-reference pins for the ordinal-association battery
(operators/association.py).  Each test recomputes the statistic from the
raw collected rows with a SEPARATELY-written pure-Python implementation
(brute-force O(n^2) pair loops where the operator uses cell algebra;
math.erf where a normal CDF is needed — deliberately NOT the engine's
A&S polynomial, so the polynomial is under test too within its 7.5e-8
bound)."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from satellite_data_ingestion_spark import registry
from satellite_data_ingestion_spark.catalog import table

SF = "/root/testdata/sf0.001"


def _phi(z: float) -> float:
    return 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))


def _wh_p(chi2: float, df: float) -> float:
    z = ((chi2 / df) ** (1.0 / 3.0) - (1.0 - 2.0 / (9.0 * df))) / math.sqrt(
        2.0 / (9.0 * df)
    )
    return 1.0 - _phi(z)


def _li_pairs(spark):
    rows = [
        (int(r.l_linenumber), int(r.l_quantity))
        for r in table(spark, SF, "lineitem").select("l_linenumber", "l_quantity").collect()
    ]
    conc = disc = tx2 = ty2 = 0
    n = len(rows)
    cx = Counter(x for x, _ in rows)
    cy = Counter(y for _, y in rows)
    tx2 = sum(c * (c - 1) for c in cx.values())
    ty2 = sum(c * (c - 1) for c in cy.values())
    for i in range(n):
        xi, yi = rows[i]
        for j in range(i + 1, n):
            xj, yj = rows[j]
            if xi == xj or yi == yj:
                continue
            if (xi < xj) == (yi < yj):
                conc += 1
            else:
                disc += 1
    return rows, n, conc, disc, tx2, ty2, len(cx), len(cy)


def test_goodman_kruskal_gamma_matches_bruteforce(spark):
    (r,) = registry.spec("agg_goodman_kruskal_gamma").fn(spark, SF).collect()
    rows, n, conc, disc, tx2, ty2, kx, ky = _li_pairs(spark)
    assert (r.n, r.kx, r.ky, r.conc, r.disc) == (n, kx, ky, conc, disc)
    gamma = (conc - disc) / (conc + disc)
    tau_b = (conc - disc) * 2.0 / math.sqrt(
        (n * (n - 1) - tx2) * (n * (n - 1) - ty2)
    )
    m = min(kx, ky)
    tau_c = (conc - disc) * 2.0 * m / (n * n * (m - 1))
    assert abs(r.gamma - gamma) < 2e-6
    assert abs(r.tau_b - tau_b) < 2e-6
    assert abs(r.tau_c - tau_c) < 2e-6


def test_somers_d_matches_bruteforce(spark):
    (r,) = registry.spec("agg_somers_d").fn(spark, SF).collect()
    deg = Counter(
        int(x.l_orderkey)
        for x in table(spark, SF, "lineitem").select("l_orderkey").collect()
    )
    pts = [
        (int(o.o_orderpriority[0]), deg[int(o.o_orderkey)])
        for o in table(spark, SF, "orders")
        .select("o_orderkey", "o_orderpriority")
        .collect()
        if int(o.o_orderkey) in deg
    ]
    n = len(pts)
    conc = disc = 0
    cx = Counter(x for x, _ in pts)
    cy = Counter(y for _, y in pts)
    for i in range(n):
        xi, yi = pts[i]
        for j in range(i + 1, n):
            xj, yj = pts[j]
            if xi == xj or yi == yj:
                continue
            if (xi < xj) == (yi < yj):
                conc += 1
            else:
                disc += 1
    tx2 = sum(c * (c - 1) for c in cx.values())
    ty2 = sum(c * (c - 1) for c in cy.values())
    assert (r.n, r.conc, r.disc) == (n, conc, disc)
    assert abs(r.d_yx - (conc - disc) * 2.0 / (n * (n - 1) - tx2)) < 2e-6
    assert abs(r.d_xy - (conc - disc) * 2.0 / (n * (n - 1) - ty2)) < 2e-6


def test_bowker_matches_direct_transitions(spark):
    (r,) = registry.spec("agg_bowker_test").fn(spark, SF).collect()
    orders = table(spark, SF, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority", "o_orderdate"
    ).collect()
    by_cust: dict = {}
    for o in orders:
        by_cust.setdefault(int(o.o_custkey), []).append(
            (o.o_orderdate, int(o.o_orderkey), int(o.o_orderpriority[0]))
        )
    cells: Counter = Counter()
    for seq in by_cust.values():
        seq.sort()
        cells[(seq[0][2], seq[-1][2])] += 1
    chi2 = 0.0
    df = 0
    for i in range(1, 6):
        for j in range(i + 1, 6):
            u, v = cells.get((i, j), 0), cells.get((j, i), 0)
            if u + v > 0:
                df += 1
                chi2 += (u - v) ** 2 / (u + v)
    assert r.n_customers == len(by_cust) and r.df == df
    assert abs(r.chi2 - chi2) < 6e-5
    if df > 0:
        assert abs(r.p - _wh_p(chi2, df)) < 1e-5
    assert 0.0 <= r.p <= 1.0


def test_theil_u_matches_direct_entropies(spark):
    (r,) = registry.spec("agg_theil_u").fn(spark, SF).collect()
    rows = [
        (int(x.h), x.event_type)
        for x in table(spark, SF, "events")
        .select(F.hour("ts").alias("h"), "event_type")
        .collect()
    ]
    n = len(rows)
    cx = Counter(h for h, _ in rows)
    cy = Counter(t for _, t in rows)
    cxy = Counter(rows)

    def ent(c: Counter) -> float:
        return sum((v / n) * math.log(n / v) for v in c.values())

    hx, hy, hxy = ent(cx), ent(cy), ent(cxy)
    mi = hx + hy - hxy
    assert r.n == n
    assert abs(r.h_x - hx) < 2e-6 and abs(r.h_y - hy) < 2e-6
    assert abs(r.h_xy - hxy) < 2e-6
    assert abs(r.u_y_given_x - mi / hy) < 2e-6
    assert abs(r.u_x_given_y - mi / hx) < 2e-6
    assert abs(r.u_sym - 2 * mi / (hx + hy)) < 2e-6
    # uncertainty coefficients live in [0, 1]
    assert 0.0 <= r.u_y_given_x <= 1.0 and 0.0 <= r.u_x_given_y <= 1.0


def test_jonckheere_terpstra_matches_bruteforce(spark):
    (r,) = registry.spec("agg_jonckheere_terpstra").fn(spark, SF).collect()
    rows = [
        (int(x.l_linenumber), int(x.l_quantity))
        for x in table(spark, SF, "lineitem").select("l_linenumber", "l_quantity").collect()
    ]
    n = len(rows)
    jt2 = 0
    for i in range(n):
        gi, vi = rows[i]
        for j in range(n):
            gj, vj = rows[j]
            if gi < gj:
                if vi < vj:
                    jt2 += 2
                elif vi == vj:
                    jt2 += 1
    cg = Counter(g for g, _ in rows)
    cv = Counter(v for _, v in rows)
    mean = (n * n - sum(c * c for c in cg.values())) / 4
    g1 = sum(c * (c - 1) * (2 * c + 5) for c in cg.values())
    t1 = sum(c * (c - 1) * (2 * c + 5) for c in cv.values())
    g2 = sum(c * (c - 1) * (c - 2) for c in cg.values())
    t2_ = sum(c * (c - 1) * (c - 2) for c in cv.values())
    g3 = sum(c * (c - 1) for c in cg.values())
    t3 = sum(c * (c - 1) for c in cv.values())
    var = (
        (n * (n - 1) * (2 * n + 5) - g1 - t1) / 72.0
        + g2 * t2_ / (36.0 * n * (n - 1) * (n - 2))
        + g3 * t3 / (8.0 * n * (n - 1))
    )
    z = (jt2 / 2 - mean) / math.sqrt(var)
    assert (r.n, r.jt2) == (n, jt2)
    assert abs(r.mean_jt - mean) < 6e-5
    assert abs(r.var_jt - var) < 6e-5 + 1e-9 * var
    assert abs(r.z - z) < 2e-6
    assert abs(r.p - 2.0 * (1.0 - _phi(abs(z)))) < 1e-5


def test_cuzick_trend_matches_midrank_reference(spark):
    (r,) = registry.spec("agg_cuzick_trend").fn(spark, SF).collect()
    rows = [
        (int(x.l_linenumber), int(round(x.l_discount * 100)))
        for x in table(spark, SF, "lineitem").select("l_linenumber", "l_discount").collect()
    ]
    n = len(rows)
    cv = Counter(v for _, v in rows)
    # midranks from the sorted value histogram
    mid = {}
    below = 0
    for v in sorted(cv):
        mid[v] = below + (cv[v] + 1) / 2
        below += cv[v]
    t_stat = sum(s * mid[v] for s, v in rows)
    ss1 = sum(s for s, _ in rows)
    ss2 = sum(s * s for s, _ in rows)
    e_t = (n + 1) / 2 * ss1
    phi_tie = 1.0 - sum(c**3 - c for c in cv.values()) / (n**3 - n)
    var_t = phi_tie * (n + 1) * (n * ss2 - ss1 * ss1) / 12.0
    z = (t_stat - e_t) / math.sqrt(var_t)
    assert r.n == n and r.t2 == int(round(2 * t_stat)) and r.e_t2 == (n + 1) * ss1
    assert abs(r.var_t - var_t) < 6e-5 + 1e-9 * var_t
    assert abs(r.z - z) < 2e-6
    assert abs(r.p - 2.0 * (1.0 - _phi(abs(z)))) < 1e-5
    assert r.trend in ("increasing", "decreasing", "no trend")
