"""Independent-reference pins for the round-15 embedding-stats wave
(llm/embedding_stats.py: whitening, isotropy, sign-bit Hamming search).
Value-level oracle parity is covered by test_oracle_parity.py; these
recompute each statistic from the raw collected vectors with a
separately-written pure-Python implementation, plus the brute-force
O(n^2) check of the isotropy identity that the operator's one-pass plan
deliberately avoids."""

from __future__ import annotations

import math

from satellite_data_ingestion_spark import registry
from satellite_data_ingestion_spark.catalog import table

SF = "/root/testdata/sf0.001"


def _vectors(spark):
    rows = table(spark, SF, "embeddings").select("vec_id", "label", "embedding").collect()
    return {int(r.vec_id): (int(r.label), [float(x) for x in r.embedding]) for r in rows}


def test_whitening_matches_reference(spark):
    out = {r.pos: r for r in registry.spec("ext_embedding_whitening").fn(spark, SF).collect()}
    vecs = _vectors(spark)
    dim = len(next(iter(vecs.values()))[1])
    assert set(out) == set(range(dim))
    n = len(vecs)
    for pos in range(dim):
        q = [round(v[pos] * 1e6) for _, v in vecs.values()]
        mean_micro = sum(q) / n
        sd_micro = math.sqrt((sum(x * x for x in q) - sum(q) ** 2 / n) / (n - 1))
        r = out[pos]
        assert r.n == n
        assert abs(r.mean - mean_micro / 1e6) < 2e-6
        assert abs(r.std - sd_micro / 1e6) < 2e-6
        assert abs(r.w_min - (min(q) - mean_micro) / sd_micro) < 2e-6
        assert abs(r.w_max - (max(q) - mean_micro) / sd_micro) < 2e-6
        assert r.w_min < 0.0 < r.w_max


def test_isotropy_matches_bruteforce_pairwise(spark):
    (r,) = registry.spec("ext_embedding_isotropy").fn(spark, SF).collect()
    vecs = _vectors(spark)
    n = len(vecs)
    us = []
    for vid in sorted(vecs):
        v = vecs[vid][1]
        nrm = math.sqrt(sum(x * x for x in v))
        us.append([round(x / nrm * 1e6) for x in v])
    # identity recompute (what the operator evaluates)
    dim = len(us[0])
    s = [sum(u[p] for u in us) for p in range(dim)]
    ss2 = sum(float(x) * x for x in s)
    r2 = sum(x * x for u in us for x in u)
    ident = ((ss2 - r2) / (n * (n - 1))) / 1e12
    assert r.n == n and r.dim == dim
    assert abs(r.avg_pairwise_cos - ident) < 2e-6
    assert abs(r.resultant_norm - math.sqrt(ss2) / n / 1e6) < 2e-6
    # brute-force O(n^2) average pairwise cosine of the quantized units
    tot = 0.0
    for i in range(n):
        for j in range(i + 1, n):
            tot += sum(a * b for a, b in zip(us[i], us[j])) / 1e12
    brute = 2.0 * tot / (n * (n - 1))
    assert abs(ident - brute) < 1e-9  # the resultant identity is exact


def test_sim_hamming_matches_bruteforce(spark):
    rows = registry.spec("ext_sim_hamming").fn(spark, SF).collect()
    vecs = _vectors(spark)
    n = len(vecs)
    dim = len(next(iter(vecs.values()))[1])
    sq = [sum(round(vecs[vid][1][p] * 1e6) for vid in vecs) for p in range(dim)]
    bits = {
        vid: [1 if round(v[p] * 1e6) * n > sq[p] else 0 for p in range(dim)]
        for vid, (_, v) in vecs.items()
    }
    qv = min(vecs)
    hd = {
        vid: sum(a != b for a, b in zip(bits[vid], bits[qv]))
        for vid in vecs
        if vid != qv
    }
    top = sorted(hd, key=lambda x: (hd[x], x))[:10]
    assert [r.vec_id for r in rows] == top
    for r in rows:
        assert r.hamming == hd[r.vec_id]
        assert r.label == vecs[r.vec_id][0]
        assert 0 <= r.hamming <= dim
