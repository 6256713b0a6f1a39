"""Independent-reference pins for wave L: embedding effective
dimensionality, term burstiness, Engle's ARCH LM, and pass@k."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from itertools import combinations

from pyspark.sql import functions as F

from satellite_data_ingestion_spark import registry
from satellite_data_ingestion_spark.catalog import table

SF = "/root/testdata/sf0.001"


def test_effective_dim_matches_reference(spark):
    (r,) = registry.spec("ext_embedding_effective_dim").fn(spark, SF).collect()
    vecs = [
        [round(float(x) * 1e6) for x in v.embedding]
        for v in table(spark, SF, "embeddings").select("embedding").collect()
    ]
    n, dim = len(vecs), len(vecs[0])
    var = []
    for p in range(dim):
        col = [v[p] for v in vecs]
        m = sum(col) / n
        var.append(sum((x - m) ** 2 for x in col) / (n - 1))
    sv = sum(var)
    h = sum((v / sv) * math.log(sv / v) for v in var)
    eff = math.exp(h)
    pr = sv * sv / sum(v * v for v in var)
    assert r.dim == dim
    assert abs(r.effective_dim - eff) < 1e-4 + 1e-6 * eff
    assert abs(r.participation_ratio - pr) < 1e-4 + 1e-6 * pr
    assert abs(r.dim_utilization - eff / dim) < 1e-5
    # both effective-rank notions live in (0, dim]
    assert 0 < r.effective_dim <= dim and 0 < r.participation_ratio <= dim


def test_term_burstiness_matches_reference(spark):
    rows = {
        r.word: r
        for r in registry.spec("ext_term_burstiness").fn(spark, SF).collect()
    }
    docs = table(spark, SF, "documents").select("text").collect()
    nd = len(docs)
    per_doc = [Counter((d.text or "").lower().split()) for d in docs]
    vocab = set().union(*per_doc)
    assert set(rows) == vocab
    for w in vocab:
        counts = [c.get(w, 0) for c in per_doc]
        cf = sum(counts)
        df = sum(1 for c in counts if c > 0)
        mean = cf / nd
        var = sum((c - mean) ** 2 for c in counts) / (nd - 1)
        r = rows[w]
        assert (r.df, r.cf) == (df, cf)
        assert abs(r.burstiness - var / mean) < 2e-6 + 1e-9 * (var / mean)
        assert abs(r.adaptation - cf / df) < 2e-6
        assert abs(r.idf - math.log(nd / df)) < 2e-6
        # adaptation >= 1 by construction (a present word appears >= once)
        assert r.adaptation >= 1.0 - 1e-9


def test_arch_test_matches_reference(spark):
    (r,) = registry.spec("ext_ts_arch_test").fn(spark, SF).collect()
    ev = table(spark, SF, "events")
    h = ev.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("x")
    )
    xs = [x.x for x in h.orderBy("hr").collect()]
    n = len(xs)
    mu = sum(xs) / n
    u = [math.floor((x - mu) ** 2 / 1e8 + 0.5) for x in xs]
    a, b = u[1:], u[:-1]
    m = len(a)
    sa, sb = sum(a), sum(b)
    sab = sum(x * y for x, y in zip(a, b))
    saa = sum(x * x for x in a)
    sbb = sum(x * x for x in b)
    r1 = (m * sab - sa * sb) / math.sqrt(
        (m * saa - sa * sa) * (m * sbb - sb * sb)
    )
    lm = m * r1 * r1
    assert r.n_hours == n
    assert abs(r.r1_squares - r1) < 2e-6
    assert abs(r.lm - lm) < 2e-6 + 1e-9 * lm
    assert 0.0 <= r.p <= 1.0
    assert r.verdict in ("arch_effects", "no_arch")


def test_pass_at_k_matches_reference(spark):
    (r,) = registry.spec("ext_pass_at_k").fn(spark, SF).collect()
    ev = table(spark, SF, "events").select("user_id", "value").collect()
    acc: dict = defaultdict(lambda: [0, 0])
    for x in ev:
        acc[x.user_id][0] += 1
        if x.value > 200:
            acc[x.user_id][1] += 1
    el = {u: (n, c) for u, (n, c) in acc.items() if n >= 5}

    def pass_at(n, c, k):
        # exact combinatorial reference (math.comb), not the product form
        if n - c < k:
            return 1.0
        return 1.0 - math.comb(n - c, k) / math.comb(n, k)

    p1 = [pass_at(n, c, 1) for n, c in el.values()]
    p5 = [pass_at(n, c, 5) for n, c in el.values()]
    assert r.n_problems == len(el)
    assert r.n_attempts == sum(n for n, _ in el.values())
    assert r.n_successes == sum(c for _, c in el.values())
    assert abs(r.pass_at_1 - sum(p1) / len(p1)) < 2e-6
    assert abs(r.pass_at_5 - sum(p5) / len(p5)) < 2e-6
    # monotone in k
    assert r.pass_at_5 >= r.pass_at_1 - 1e-9
