"""Structural invariants of the graph family (operators/graph.py).

Value-level correctness is covered by the DuckDB oracle parity suite
(test_oracle_parity.py picks the new IDs up automatically); these tests
pin the graph-theoretic invariants that an oracle built from the same
edge definition cannot independently witness.
"""

import math

import pytest
from pyspark.sql import functions as F

from satellite_data_ingestion_spark.operators.graph import (
    _MIN_COPURCHASES,
    _copurchase_edges,
    graph_degree_dist,
    graph_pagerank,
    graph_triangles,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def edges(spark):
    return _copurchase_edges(spark, SF_DIR).cache()


def test_edges_are_ordered_supported_and_unique(edges):
    rows = edges.collect()
    assert rows, "support-filtered graph is empty at sf0.001"
    assert all(r.x < r.y for r in rows)
    assert all(r.w >= _MIN_COPURCHASES for r in rows)
    assert len({(r.x, r.y) for r in rows}) == len(rows)


def test_degree_dist_accounts_for_every_node(spark, edges):
    dist = graph_degree_dist(spark, SF_DIR).collect()
    n_nodes = edges.select(
        F.explode(F.array("x", "y")).alias("n")
    ).distinct().count()
    assert sum(r.n_nodes for r in dist) == n_nodes
    # Handshake lemma: sum(degree * count) = 2 * |E|.
    assert sum(r.degree * r.n_nodes for r in dist) == 2 * edges.count()


def test_pagerank_mass_conservation_and_positivity(spark, edges):
    ranks = graph_pagerank(spark, SF_DIR).collect()
    n_nodes = edges.select(
        F.explode(F.array("x", "y")).alias("n")
    ).distinct().count()
    assert len(ranks) == n_nodes
    assert all(r.pagerank > 0 for r in ranks)
    # The symmetrized graph has no dangling nodes, so rank mass is
    # conserved exactly (up to the published rounding).
    assert math.isclose(
        sum(r.pagerank for r in ranks), 1.0, abs_tol=n_nodes * 1e-7
    )


def test_triangle_counts_bounded_by_wedges(spark, edges):
    tri = {r.part_key: r.n_triangles for r in graph_triangles(spark, SF_DIR).collect()}
    deg = {
        r.n: r.d
        for r in edges.select(F.explode(F.array("x", "y")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
        .collect()
    }
    assert tri, "no triangles at sf0.001 — fixture drifted"
    for node, t in tri.items():
        # A node participates in at most C(deg, 2) triangles.
        d = deg[node]
        assert t <= d * (d - 1) // 2
    # Total membership divides by 3 (each triangle contributes 3 rows).
    assert sum(tri.values()) % 3 == 0


def test_leakage_safe_split_keeps_pairs_together(spark):
    """The property the split exists for: no verified near-dup pair
    straddles two splits (a plain per-doc hash split violates this)."""
    from satellite_data_ingestion_spark.llm.dedup import (
        ext_ngram_jaccard,
        ext_split_leakage_safe,
    )

    split = ext_split_leakage_safe(spark, SF_DIR).select("doc_id", "split")
    pairs = ext_ngram_jaccard(spark, SF_DIR).select("doc_a", "doc_b")
    a = split.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("split", "sa")
    b = split.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("split", "sb")
    joined = pairs.join(a, "doc_a").join(b, "doc_b")
    assert joined.count() > 0, "no near-dup pairs at sf0.001 — fixture drifted"
    assert joined.filter(F.col("sa") != F.col("sb")).count() == 0
    # All three splits exist and budgets are sane (train dominates).
    census = {r.split: r.n for r in split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(census) == {"train", "valid", "test"}
    assert census["train"] > census["valid"] and census["train"] > census["test"]


def test_mst_matches_kruskal(spark):
    """graph_mst's distributed Borůvka must produce the EXACT unique
    minimum spanning forest (edge total order (w, x, y)) that an
    independent driver-side Kruskal computes on the same edge list."""
    from tests.conftest import SF_SMOKE

    from satellite_data_ingestion_spark import registry
    from satellite_data_ingestion_spark.operators.graph import _copurchase_edges

    got = {
        (r.x, r.y, r.w)
        for r in registry.spec("graph_mst").fn(spark, SF_SMOKE).collect()
    }
    edges = sorted(
        (r.w, r.x, r.y) for r in _copurchase_edges(spark, SF_SMOKE).collect()
    )

    parent = {}

    def find(a):
        while parent.get(a, a) != a:
            parent[a] = parent.get(parent[a], parent[a])
            a = parent[a]
        return a

    expect = set()
    for w, x, y in edges:
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
            expect.add((x, y, w))
    assert got == expect, (
        f"forest mismatch: {len(got)} got vs {len(expect)} expected; "
        f"extra={sorted(got - expect)[:5]} missing={sorted(expect - got)[:5]}"
    )


def test_betweenness_matches_reference_brandes(spark):
    """graph_betweenness's distributed multi-source BFS + level-wise
    dependency accumulation must equal the textbook Brandes (2001)
    single-source loop run independently over the same deterministic
    pivots (smallest _BC_SOURCES node ids), halved for the undirected
    double-count, to the 1e-6 quantization."""
    import math
    from collections import defaultdict, deque

    from tests.conftest import SF_SMOKE

    from satellite_data_ingestion_spark import registry
    from satellite_data_ingestion_spark.operators.graph import (
        _BC_SOURCES,
        _copurchase_edges,
    )

    edges = [
        (int(r.x), int(r.y))
        for r in _copurchase_edges(spark, SF_SMOKE).collect()
    ]
    adj = defaultdict(set)
    for x, y in edges:
        adj[x].add(y)
        adj[y].add(x)
    srcs = sorted(adj)[:_BC_SOURCES]
    bc = defaultdict(float)
    for s in srcs:
        # Brandes 2001: BFS with path counts, then reverse-order
        # dependency accumulation over the predecessor DAG.
        dist = {s: 0}
        sigma = defaultdict(int)
        sigma[s] = 1
        preds = defaultdict(list)
        order = []
        dq = deque([s])
        while dq:
            v = dq.popleft()
            order.append(v)
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    dq.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = defaultdict(float)
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]

    rows = registry.spec("graph_betweenness").fn(spark, SF_SMOKE).collect()
    got = {int(r.node): r.betweenness for r in rows}
    expect = {
        v: math.floor(b / 2.0 * 1e6 + 0.5) / 1e6 for v, b in bc.items()
    }
    expect = {v: b for v, b in expect.items() if v in got or b != 0.0}
    # every node the engine scored must match the reference exactly
    for v, b in got.items():
        assert abs(b - expect.get(v, 0.0)) < 1e-9, (v, b, expect.get(v))
    missing = {v: b for v, b in expect.items() if v not in got and b > 0}
    assert not missing, f"reference found betweenness the engine missed: {missing}"


def test_katz_matches_python_replay(spark):
    from satellite_data_ingestion_spark.operators.graph import (
        _KATZ_ALPHA,
        _KATZ_ITERS,
        graph_katz,
    )

    edges = [
        (int(r.x), int(r.y)) for r in _copurchase_edges(spark, SF_DIR).collect()
    ]
    adj: dict = {}
    for x, y in edges:
        adj.setdefault(x, []).append(y)
        adj.setdefault(y, []).append(x)
    kz = {v: 1.0 for v in adj}
    for _ in range(_KATZ_ITERS):
        kz = {v: 1.0 + _KATZ_ALPHA * sum(kz[u] for u in adj[v]) for v in adj}
    out = {int(r.part_key): r.katz for r in graph_katz(spark, SF_DIR).collect()}
    assert set(out) == set(adj)
    for v in adj:
        assert abs(out[v] - kz[v]) < 1e-6
    # every node counts at least its own unit weight, hubs strictly more
    assert all(k >= 1.0 for k in out.values())
    top = max(out, key=lambda v: (out[v], -v))
    assert len(adj[top]) == max(len(a) for a in adj.values())
