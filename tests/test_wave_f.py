"""Independent-reference pins for the round-15 wave-F operators:
graph link-prediction/centrality additions (Jaccard, closeness),
WordPiece fertility, the DoReMi mixture step, Benjamini-Yekutieli, and
the entropy-family inequality indices."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from satellite_data_ingestion_spark import registry
from satellite_data_ingestion_spark.catalog import table

SF = "/root/testdata/sf0.001"


def _bipartite(spark):
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_partkey").collect()
    orders = {
        int(o.o_orderkey): int(o.o_custkey)
        for o in table(spark, SF, "orders").collect()
    }
    nb = defaultdict(set)
    for r in li:
        c = orders.get(int(r.l_orderkey))
        if c is not None:
            nb[c].add(int(r.l_partkey))
    return nb


def test_jaccard_links_matches_bruteforce(spark):
    rows = registry.spec("graph_jaccard_links").fn(spark, SF).collect()
    nb = _bipartite(spark)
    custs = sorted(nb)
    scores = {}
    for i, c1 in enumerate(custs):
        for c2 in custs[i + 1 :]:
            common = len(nb[c1] & nb[c2])
            if common:
                union = len(nb[c1] | nb[c2])
                scores[(c1, c2)] = (
                    common,
                    union,
                    math.floor(1e6 * common / union + 0.5),
                )
    top = sorted(scores, key=lambda p: (-scores[p][2], p))[:50]
    assert [(r.c1, r.c2) for r in rows] == top
    for r in rows:
        common, union, jm = scores[(r.c1, r.c2)]
        assert (r.common, r.unions, r.jac_micro) == (common, union, jm)


def test_closeness_matches_python_bfs(spark):
    from satellite_data_ingestion_spark.operators.graph import (
        _CLOSENESS_HOPS,
        _CLOSENESS_PIVOTS,
        _copurchase_edges,
    )

    edges = [
        (int(r.x), int(r.y)) for r in _copurchase_edges(spark, SF).collect()
    ]
    adj = defaultdict(set)
    for x, y in edges:
        adj[x].add(y)
        adj[y].add(x)
    pivots = sorted(adj)[:_CLOSENESS_PIVOTS]
    out = {
        int(r.part_key): r
        for r in registry.spec("graph_closeness").fn(spark, SF).collect()
    }
    assert set(out) == set(pivots)
    for src in pivots:
        dist = {src: 0}
        frontier = [src]
        for k in range(1, _CLOSENESS_HOPS + 1):
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = k
                        nxt.append(v)
            if not nxt:
                break
            frontier = nxt
        reached = len(dist) - 1
        td = sum(dist.values())
        harm = sum(math.floor(1e6 / d + 0.5) for d in dist.values() if d > 0)
        r = out[src]
        assert (r.reached, r.total_dist, r.harmonic_micro) == (reached, td, harm)
        assert abs(r.closeness - reached / td) < 2e-6


def test_doremi_matches_reference(spark):
    rows = registry.spec("ext_domain_mixture_doremi").fn(spark, SF).collect()
    docs = table(spark, SF, "documents").select("source", "text").collect()
    words = defaultdict(Counter)
    for d in docs:
        for w in (d.text or "").lower().split():
            if w:
                words[d.source][w] += 1
    gv = Counter()
    for c in words.values():
        gv.update(c)
    tw = sum(gv.values())
    lbar = sum(c * math.log(tw / c) for c in gv.values()) / tw
    stats = {}
    for src, c in words.items():
        wrds = sum(c.values())
        sl = sum(k * math.log(tw / gv[w]) for w, k in c.items())
        ex = sl / wrds - lbar
        stats[src] = (wrds / tw, sl / wrds, ex, (wrds / tw) * math.exp(0.5 * ex))
    z = sum(v[3] for v in stats.values())
    assert len(rows) == len(stats)
    for r in rows:
        w0, sp, ex, wun = stats[r.source]
        assert abs(r.w0 - w0) < 2e-6
        assert abs(r.surprisal - sp) < 2e-6
        assert abs(r.excess - ex) < 2e-6
        assert abs(r.w1 - wun / z) < 2e-6
    # weights renormalize to 1 and harder-than-average domains gain
    assert abs(sum(r.w1 for r in rows) - 1.0) < 1e-4
    for r in rows:
        if r.excess > 1e-9:
            assert r.w1 > r.w0 - 1e-9


def test_benjamini_yekutieli_dominates_bh(spark):
    by = {
        r.event_type: r
        for r in registry.spec("agg_benjamini_yekutieli").fn(spark, SF).collect()
    }
    bh = {
        r.event_type: r
        for r in registry.spec("agg_benjamini_hochberg").fn(spark, SF).collect()
    }
    assert set(by) == set(bh)
    k = len(by)
    harm = sum(1.0 / i for i in range(1, k + 1))
    for t in by:
        # identical underlying tests
        assert abs(by[t].z - bh[t].z) < 1e-9
        assert abs(by[t].p - bh[t].p) < 1e-9
        # BY inflates by c(k) then caps at 1
        expect = min(1.0, bh[t].p_adj * harm)
        assert abs(by[t].p_adj - expect) < 2e-6
        assert by[t].p_adj >= bh[t].p_adj - 1e-9


def test_inequality_indices_match_reference(spark):
    (r,) = registry.spec("agg_inequality_indices").fn(spark, SF).collect()
    qs = [
        int(x.l_quantity)
        for x in table(spark, SF, "lineitem").select("l_quantity").collect()
    ]
    n = len(qs)
    mu = sum(qs) / n
    theil_t = sum((q / mu) * math.log(q / mu) for q in qs) / n
    theil_l = sum(math.log(mu / q) for q in qs) / n
    atk = 1.0 - math.exp(sum(math.log(q) for q in qs) / n) / mu
    assert r.n == n
    assert abs(r.mean_qty - mu) < 2e-6
    assert abs(r.theil_t - theil_t) < 2e-6
    assert abs(r.theil_l - theil_l) < 2e-6
    assert abs(r.atkinson_1 - atk) < 2e-6
    # all three are nonnegative and zero only under perfect equality
    assert r.theil_t > 0 and r.theil_l > 0 and 0 < r.atkinson_1 < 1
