"""Distributed graph analytics over a co-occurrence graph (SURVEY.md
§2.10 extension: crawl-graph / link-analysis workloads).

A large-scale training-data pipeline is fed by a crawl, and the crawl's
link graph drives both quality weighting (PageRank-style authority) and
community structure (triangles / clustering coefficient).  The corpus
has no web graph, so the graph here is the classic market-basket
projection of ``lineitem``: parts are nodes and two parts are linked
when they are co-purchased in at least ``_MIN_COPURCHASES`` distinct
orders.  The ≥2 support threshold is what makes the graph sparse and
the construction scale-safe: the raw per-order pair explosion is
bounded by sum(k_i·(k_i−1)/2) over order sizes k_i (k ≤ 7 here), and
the support filter is a map-side-combinable groupBy that shrinks it
~30× before any downstream join.

Scale design (100 TB shape):

- Graph CONSTRUCTION is one self-equi-join on ``l_orderkey`` (orders
  are the natural co-location key) followed by one partial-aggregated
  groupBy on the pair — no driver-side state, no collect.
- PageRank is the textbook pull model: a static ``links (src, dst,
  out_degree)`` relation reused across iterations, one shuffle per
  iteration (the dst-keyed contribution sum, map-side combined).  The
  rank vector is O(|V|) — the side Spark will broadcast when small and
  shuffle-join when not; nothing in the loop materializes to the
  driver.
- Triangle listing uses the ordered-edge convention (a<b<c): each
  triangle is produced exactly once by two joins (wedge build + closing
  edge semi-check).  Wedge volume is sum(deg²) — bounded here by the
  support threshold; on a heavy-tailed graph the standard mitigation
  (degree-ordered edge orientation, which this a<b convention
  approximates) caps per-node fan-out.

The connected-components complement of this family lives in
``llm/dedup.py::connected_components`` (edge-contraction CC).

Reference parity note: the reference pipeline has no graph operators
(its 454 lines are satellite ETL, ``sources/meteosat.py``); this module
is part of the training-data-pipeline mandate, not a port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

# SEMANTIC constants — baked into the oracles below; changing them
# changes every result.
_MIN_COPURCHASES = 2          # edge support threshold (distinct orders)
_PR_ITERS = 5                 # fixed PageRank iterations (unrolled in SQL)
_PR_DAMPING = 0.85
_PR_ROUND = 7                 # decimals kept in the published rank


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected support-filtered co-purchase edges ``(x, y, w)`` with
    ``x < y``: parts co-occurring in ≥ ``_MIN_COPURCHASES`` distinct
    orders, ``w`` = that co-occurrence count."""
    op = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    return (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("x"), F.col("b.p").alias("y"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= _MIN_COPURCHASES)
    )


# Shared oracle prelude: the same graph in DuckDB SQL.
_EDGES_SQL = f"""
op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e AS (SELECT a.p AS x, b.p AS y, count(*) AS w
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p
      HAVING count(*) >= {_MIN_COPURCHASES})
"""


@register(
    "graph_degree_dist",
    oracle=f"""
WITH {_EDGES_SQL},
sym AS (SELECT x AS n FROM e UNION ALL SELECT y FROM e),
deg AS (SELECT n, count(*) AS degree FROM sym GROUP BY n)
SELECT degree, count(*) AS n_nodes
FROM deg GROUP BY degree
""",
)
def graph_degree_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph — the first sanity
    profile run on any new link graph (power-law check, support-threshold
    tuning).  One union + two map-side-combinable groupBys; output is
    O(max degree) rows regardless of graph size."""
    e = _copurchase_edges(spark, sf_dir)
    sym = e.select(F.col("x").alias("n")).unionAll(e.select(F.col("y").alias("n")))
    deg = sym.groupBy("n").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


def _pagerank_oracle() -> str:
    """Unrolled fixed-iteration PageRank in DuckDB SQL: the declarative
    twin of the iterative DataFrame loop, one CTE per iteration."""
    parts = [
        "WITH " + _EDGES_SQL.strip() + ",",
        "sym AS (SELECT x AS s, y AS d FROM e UNION ALL SELECT y, x FROM e),",
        "deg AS (SELECT s, count(*) AS dg FROM sym GROUP BY s),",
        "links AS (SELECT sym.s, sym.d, deg.dg FROM sym JOIN deg USING (s)),",
        "n AS (SELECT count(*) AS cnt FROM deg),",
        "r0 AS (SELECT s AS node, 1.0 / (SELECT cnt FROM n) AS pr FROM deg),",
    ]
    for i in range(_PR_ITERS):
        parts.append(
            f"r{i + 1} AS (SELECT l.d AS node, "
            f"(1.0 - {_PR_DAMPING}) / (SELECT cnt FROM n) "
            f"+ {_PR_DAMPING} * sum(r.pr / l.dg) AS pr "
            f"FROM links l JOIN r{i} r ON l.s = r.node GROUP BY l.d),"
        )
    # Strip the trailing comma of the last CTE.
    parts[-1] = parts[-1][:-1]
    parts.append(
        f"SELECT node AS part_key, round(pr, {_PR_ROUND}) AS pagerank "
        f"FROM r{_PR_ITERS}"
    )
    return "\n".join(parts)


@register("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (damping 0.85, 5 pull-model iterations)
    over the co-purchase graph — link-authority scoring, the quality
    prior a crawl-fed pipeline attaches to each source page.

    The symmetrized support-filtered graph has no dangling nodes (every
    node carries ≥1 out-edge by construction), so the plain pull update
    ``pr' = (1−d)/N + d·Σ pr(in)/outdeg(in)`` is mass-conserving without
    a dangling-mass correction term.  The iterative DataFrame loop is
    value-checked against a 5-CTE unrolled declarative twin in DuckDB,
    both rounded to the same decimals."""
    e = _copurchase_edges(spark, sf_dir)
    sym = e.select(F.col("x").alias("s"), F.col("y").alias("d")).unionAll(
        e.select(F.col("y").alias("s"), F.col("x").alias("d"))
    )
    deg = sym.groupBy("s").agg(F.count(F.lit(1)).alias("dg"))
    # Static link relation, reused every iteration: materialize ONCE so
    # the 5-iteration lineage replays a cheap scan, not the co-purchase
    # join 5 times.
    links = sym.join(deg, "s").localCheckpoint(eager=True)
    n = links.select("s").distinct().count()
    base = (1.0 - _PR_DAMPING) / n
    ranks = links.select("s").distinct().select(
        F.col("s").alias("node"), F.lit(1.0 / n).alias("pr")
    )
    for _ in range(_PR_ITERS):
        ranks = (
            links.join(ranks, links["s"] == ranks["node"])
            .groupBy(F.col("d").alias("node_next"))
            .agg(
                (F.lit(base) + F.lit(_PR_DAMPING) * F.sum(F.col("pr") / F.col("dg"))).alias("pr")
            )
            .select(F.col("node_next").alias("node"), "pr")
        )
    return ranks.select(
        F.col("node").alias("part_key"),
        F.round(F.col("pr"), _PR_ROUND).alias("pagerank"),
    )


@register(
    "graph_triangles",
    oracle=f"""
WITH {_EDGES_SQL},
tri AS (SELECT ab.x AS a, ab.y AS b, bc.y AS c
        FROM e ab
        JOIN e bc ON ab.y = bc.x
        JOIN e ac ON ac.x = ab.x AND ac.y = bc.y),
m AS (SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri)
SELECT node AS part_key, count(*) AS n_triangles
FROM m GROUP BY node
""",
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts — the local-clustering signal used to
    separate organic communities from spam link farms in crawl graphs.

    Ordered-edge listing: with every edge stored once as (x<y), a
    triangle a<b<c is emitted exactly once by joining wedges
    (a,b)+(b,c) with the closing edge (a,c) — no per-triangle dedup
    pass.  Wedge fan-out is the sum of squared degrees of the
    support-filtered graph; the ≥2-support threshold is what keeps that
    quadratic term bounded (13k wedges vs 14M unfiltered at sf0.01)."""
    e = _copurchase_edges(spark, sf_dir).select("x", "y").localCheckpoint(eager=True)
    ab, bc, ac = e.alias("ab"), e.alias("bc"), e.alias("ac")
    tri = (
        ab.join(bc, F.col("ab.y") == F.col("bc.x"))
        .join(ac, (F.col("ac.x") == F.col("ab.x")) & (F.col("ac.y") == F.col("bc.y")))
        .select(
            F.col("ab.x").alias("a"), F.col("ab.y").alias("b"), F.col("bc.y").alias("c")
        )
    )
    # One pass over the triangle stream (explode, not a 3-way self-union
    # that would replay the wedge joins three times).
    members = tri.select(
        F.explode(F.array("a", "b", "c")).alias("node")
    )
    return members.groupBy(F.col("node").alias("part_key")).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


_BFS_MAX_HOPS = 6  # SEMANTIC: baked into the oracle's bounded recursion


@register(
    "graph_bfs",
    oracle=f"""
WITH RECURSIVE {_EDGES_SQL.strip()},
sym AS (SELECT x AS s, y AS d FROM e UNION ALL SELECT y, x FROM e),
src AS (SELECT min(s) AS v FROM sym),
walk(node, dist) AS (
  SELECT v, 0 FROM src
  UNION
  SELECT sym.d, w.dist + 1
  FROM walk w JOIN sym ON sym.s = w.node
  WHERE w.dist < {_BFS_MAX_HOPS}
)
SELECT node, CAST(min(dist) AS INTEGER) AS dist
FROM walk GROUP BY node
""",
)
def graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS hop distances (bounded at ``_BFS_MAX_HOPS``
    hops) over
    the co-purchase graph, from the minimum node id — the reachability /
    neighborhood-radius primitive behind crawl-frontier scheduling and
    "within-k-hops of a trusted seed" quality propagation.

    Pregel-style frontier expansion: each round joins ONLY the frontier
    (nodes first reached last round) against the static symmetrized
    edge relation (localCheckpointed once), anti-joins the already-
    visited set, and stops early when the frontier empties.  Work per
    round is O(frontier-adjacent edges), never O(V); the number of
    shuffle rounds is the graph diameter capped at the hop bound, and
    each round's lineage is cut so round k replays nothing of round
    k-1.  The oracle is a depth-bounded recursive CTE taking min(dist)
    per node — both sides compute the same first-reach distance.

    Scale note: multi-source BFS (a seed SET) is this same loop with a
    wider dist seed; at 100 TB the frontier join is the standard
    iterative-graph shuffle shape (same as PageRank's), co-partitioned
    on the edge source key."""
    e = _copurchase_edges(spark, sf_dir)
    sym = (
        e.select(F.col("x").alias("s"), F.col("y").alias("d"))
        .unionAll(e.select(F.col("y").alias("s"), F.col("x").alias("d")))
        .localCheckpoint(eager=True)
    )
    src = sym.agg(F.min("s")).collect()[0][0]
    dist = spark.createDataFrame([(int(src), 0)], "node long, dist int")
    frontier = dist
    for k in range(1, _BFS_MAX_HOPS + 1):
        nxt = (
            frontier.join(sym, frontier["node"] == sym["s"])
            .select(F.col("d").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .select("node", F.lit(k).cast("int").alias("dist"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        dist = dist.unionAll(nxt)
        frontier = nxt
    return dist


_CN_TOP_K = 50


@register(
    "graph_common_neighbors",
    oracle=f"""
WITH e AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), pairs AS (
  SELECT a.c AS c1, b.c AS c2, CAST(count(*) AS BIGINT) AS common
  FROM e a JOIN e b ON a.p = b.p AND a.c < b.c
  GROUP BY 1, 2
)
SELECT c1, c2, common
FROM pairs
ORDER BY common DESC, c1, c2
LIMIT {_CN_TOP_K}
""",
)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMMON-NEIGHBORS link prediction over the bipartite co-purchase
    graph: the top-k customer pairs sharing the most distinct parts —
    the classic recommender / who-should-know-whom primitive (the
    count is the simplest link-prediction score; Jaccard/Adamic-Adar
    are the same pair table with different normalizers).

    Scale discipline (the testdata-degeneracy rule applied): candidate
    pairs are generated ONLY inside a shared part's customer list
    (blocking by part — measured d≈30 customers/part, so ~d²/2 pairs
    per part, never |customers|²); the DISTINCT edge projection first
    stops order multiplicity from multiplying pairs, and the final
    top-k is TakeOrderedAndProject heaps, so the full pair table is
    shuffled once (map-side combined) and never collected.  A hot part
    (celebrity node) is the skew risk at 100 TB — cap or sample its
    neighbor list, the ext_domain_volume_cap discipline."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a = e.select(F.col("c").alias("c1"), "p")
    b = e.select(F.col("c").alias("c2"), "p")
    pairs = (
        a.join(b, "p")
        .filter(F.col("c1") < F.col("c2"))
        .groupBy("c1", "c2")
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
    )
    return pairs.orderBy(F.desc("common"), "c1", "c2").limit(_CN_TOP_K)


@register(
    "graph_adamic_adar",
    oracle=f"""
WITH e AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), deg AS (
  SELECT p, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1
), pairs AS (
  SELECT a.c AS c1, b.c AS c2,
         CAST(sum(CAST(floor(1000000.0 / ln(CAST(d.d AS DOUBLE)) + 0.5) AS BIGINT)) AS BIGINT) AS aa_micro,
         CAST(count(*) AS BIGINT) AS common
  FROM e a JOIN e b ON a.p = b.p AND a.c < b.c
  JOIN deg d ON d.p = a.p
  WHERE d.d > 1
  GROUP BY 1, 2
)
SELECT c1, c2, common, aa_micro
FROM pairs
ORDER BY aa_micro DESC, c1, c2
LIMIT {_CN_TOP_K}
""",
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADAMIC-ADAR link prediction — common-neighbors weighted by
    neighbor rarity (a shared NICHE part says more than a shared
    bestseller): AA(u,v) = sum over shared parts of 1/ln(degree).
    The degree-weighted refinement of ``graph_common_neighbors``, same
    part-blocked candidate discipline.

    Determinism: each part's 1/ln(d) term is quantized to integer
    MICRO-units before the per-pair sum (a float sum's value depends on
    accumulation order; an integer sum does not) — the exact-cents
    discipline applied to an irrational weight.  The degree frame is
    |parts|-sized (NOT bounded at 100 TB), so it carries no broadcast
    hint — the join is co-partitioned on ``p`` with the pair blocking
    and AQE chooses broadcast only when the build side measures
    small."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    deg = e.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("d"))
    term = F.floor(1000000.0 / F.log(F.col("d").cast("double")) + 0.5).cast("long")
    a = e.select(F.col("c").alias("c1"), "p")
    b = e.select(F.col("c").alias("c2"), "p")
    pairs = (
        a.join(b, "p")
        .filter(F.col("c1") < F.col("c2"))
        .join(deg.filter(F.col("d") > 1), "p")
        .groupBy("c1", "c2")
        .agg(
            F.sum(term).cast("long").alias("aa_micro"),
            F.count(F.lit(1)).cast("long").alias("common"),
        )
    )
    return (
        pairs.select("c1", "c2", "common", "aa_micro")
        .orderBy(F.desc("aa_micro"), "c1", "c2")
        .limit(_CN_TOP_K)
    )


@register(
    "graph_assortativity",
    oracle="""
WITH e AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), cd AS (
  SELECT c, CAST(count(*) AS BIGINT) AS dc FROM e GROUP BY 1
), pdg AS (
  SELECT p, CAST(count(*) AS BIGINT) AS dp FROM e GROUP BY 1
), ed AS (
  SELECT cd.dc AS x, pdg.dp AS y
  FROM e JOIN cd ON e.c = cd.c JOIN pdg ON e.p = pdg.p
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM ed
)
SELECT n,
       floor(((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
              / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                     * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)))
             * 1000000 + 0.5) / 1000000.0 AS assortativity
FROM m
""",
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEGREE ASSORTATIVITY of the bipartite co-purchase graph (Newman
    2002): the Pearson correlation between endpoint degrees across
    edges — positive = heavy customers buy popular parts (hub-hub
    wiring), negative = hubs serve the periphery.  The one-number
    structural summary that predicts how the graph shatters under
    dedup/clustering and where the skew in ``graph_common_neighbors``
    lives.

    Every Pearson moment (n, Σx, Σy, Σxy, Σx², Σy²) is an EXACT integer
    sum over edge endpoint degrees, so the correlation is one
    deterministic double formula — the float-sum discipline applied to
    a graph statistic.  The degree frames are |V|-sized (NOT bounded —
    billions of keys at 100 TB), so they carry no broadcast hint: the
    joins are co-partitioned on the edge key and AQE picks broadcast
    only when the build side measures small.  One 1-row reduction."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    cd = e.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("dc"))
    pdg = e.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("dp"))
    ed = (
        e.join(cd, "c")
        .join(pdg, "p")
        .select(F.col("dc").alias("x"), F.col("dp").alias("y"))
    )
    m = ed.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = F.col("n") * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx"))
        * (F.col("n") * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy"))
    )
    return m.select(
        "n",
        (F.floor((num / den) * 1000000 + 0.5) / 1000000.0).alias("assortativity"),
    )


_KCORE_K = 2      # core threshold
_KCORE_ROUNDS = 6  # fixed peeling rounds (unrolled in SQL; converges at
# every test SF — measured fixpoints: 0 / 3 / 5 rounds at sf0.001/0.01/0.1)


def _kcore_oracle() -> str:
    """Unrolled fixed-round k-core peeling in DuckDB SQL — the same
    declarative-twin trick as ``_pagerank_oracle``: one CTE pair
    (degree, survivors) per round."""
    parts = [
        "WITH " + _EDGES_SQL.strip() + ",",
        "sym AS (SELECT x AS s, y AS d FROM e UNION ALL SELECT y, x FROM e),",
        "n0 AS (SELECT DISTINCT s AS node FROM sym),",
    ]
    for i in range(_KCORE_ROUNDS):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT sym.s AS node, count(*) AS dg FROM sym "
            f"JOIN n{i} a ON sym.s = a.node JOIN n{i} b ON sym.d = b.node "
            f"GROUP BY sym.s),"
        )
        parts.append(
            f"n{i + 1} AS MATERIALIZED (SELECT node FROM d{i} WHERE dg >= {_KCORE_K}),"
        )
    parts[-1] = parts[-1][:-1]
    parts.append(
        f"SELECT sym.s AS part_key, CAST(count(*) AS BIGINT) AS core_degree "
        f"FROM sym JOIN n{_KCORE_ROUNDS} a ON sym.s = a.node "
        f"JOIN n{_KCORE_ROUNDS} b ON sym.d = b.node GROUP BY sym.s"
    )
    return "\n".join(parts)


@register("graph_kcore", oracle=_kcore_oracle())
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-CORE decomposition (k={k}) of the co-purchase graph: the
    maximal subgraph where every node keeps ≥ k neighbors INSIDE the
    subgraph — the standard dense-backbone extractor (spam/bot rings
    and genuine communities live in high cores; the periphery
    ``graph_degree_dist`` profiles peels away).  Batagelj-Zaversnik
    peeling, run as {r} fixed synchronized rounds so the DataFrame loop
    and the unrolled-CTE DuckDB twin compute the identical fixpoint
    (measured convergence ≤ 5 rounds at every test SF; extra rounds are
    no-ops on a converged core).

    Scale shape: the edge relation materializes ONCE (localCheckpoint);
    each round is one co-partitioned double semi-join + one map-side
    -combined degree aggregate — survivor frames shrink monotonically,
    and every aggregate is an exact integer (no float anywhere)."""
    e = _copurchase_edges(spark, sf_dir)
    sym = e.select(F.col("x").alias("s"), F.col("y").alias("d")).unionAll(
        e.select(F.col("y").alias("s"), F.col("x").alias("d"))
    ).localCheckpoint(eager=True)
    alive = sym.select(F.col("s").alias("node")).distinct()
    for _ in range(_KCORE_ROUNDS):
        deg = (
            sym.join(alive.withColumnRenamed("node", "s"), "s", "left_semi")
            .join(alive.withColumnRenamed("node", "d"), "d", "left_semi")
            .groupBy("s")
            .agg(F.count(F.lit(1)).alias("dg"))
        )
        alive = (
            deg.filter(F.col("dg") >= _KCORE_K)
            .select(F.col("s").alias("node"))
            .localCheckpoint(eager=False)
        )
    return (
        sym.join(alive.withColumnRenamed("node", "s"), "s", "left_semi")
        .join(alive.withColumnRenamed("node", "d"), "d", "left_semi")
        .groupBy(F.col("s").alias("part_key"))
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
    )


graph_kcore.__doc__ = graph_kcore.__doc__.format(k=_KCORE_K, r=_KCORE_ROUNDS)


_HITS_ITERS = 4
_HITS_ROUND = 7


def _hits_oracle() -> str:
    """Unrolled fixed-iteration HITS on the bipartite customer→part
    purchase graph, L2-normalized each half-step — the pagerank-twin
    declarative unroll."""
    parts = [
        """WITH be AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
h0 AS MATERIALIZED (SELECT DISTINCT c, 1.0 AS h FROM be),"""
    ]
    for i in range(_HITS_ITERS):
        parts.append(
            f"ar{i} AS MATERIALIZED (SELECT be.p, sum(h{i}.h) AS a FROM be "
            f"JOIN h{i} ON be.c = h{i}.c GROUP BY be.p),"
        )
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT p, a / sqrt((SELECT sum(a * a) FROM ar{i})) AS a "
            f"FROM ar{i}),"
        )
        parts.append(
            f"hr{i} AS MATERIALIZED (SELECT be.c, sum(a{i}.a) AS h FROM be "
            f"JOIN a{i} ON be.p = a{i}.p GROUP BY be.c),"
        )
        parts.append(
            f"h{i + 1} AS MATERIALIZED (SELECT c, h / sqrt((SELECT sum(h * h) FROM hr{i})) AS h "
            f"FROM hr{i}),"
        )
    parts[-1] = parts[-1][:-1]
    parts.append(
        f"""
SELECT 'hub' AS role, c AS node_key, round(h, {_HITS_ROUND}) AS score
FROM h{_HITS_ITERS}
UNION ALL
SELECT 'authority', p, round(a, {_HITS_ROUND}) FROM a{_HITS_ITERS - 1}"""
    )
    return "\n".join(parts)


@register("graph_hits", oracle=_hits_oracle())
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) on the BIPARTITE
    customer→part purchase graph: customers are hubs (breadth of good
    purchases), parts are authorities (purchased by strong hubs) — the
    mutually-recursive quality score whose crawl-graph form ranks
    sources for a training-data pipeline (``graph_pagerank`` is the
    single-score sibling; HITS separates the two roles).

    {it} fixed power iterations with L2 normalization per half-step,
    value-checked against the unrolled-CTE DuckDB twin at {rd} rounded
    decimals (the graph_pagerank verification posture).  Scale shape:
    the bipartite edge list materializes once; each half-step is one
    co-partitioned join + map-side-combined sum, plus a 1-row
    broadcast norm."""
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"), F.col("o_custkey").alias("c")
    )
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p")
    )
    be = o.join(li, "ok").select("c", "p").distinct().localCheckpoint(eager=True)
    h = be.select("c").distinct().select("c", F.lit(1.0).alias("h"))
    a = None
    for _ in range(_HITS_ITERS):
        ar = be.join(h, "c").groupBy("p").agg(F.sum("h").alias("a"))
        an = ar.agg(F.sqrt(F.sum(F.col("a") * F.col("a"))).alias("nrm"))
        # Per-iteration lazy checkpoint: each half-step references the
        # PREVIOUS score vector twice (sum + norm), so without lineage
        # truncation the plan doubles per iteration and Catalyst
        # planning dominates wall-clock (measured 38.6 s -> ~4 s at
        # sf0.001).  The checkpointed frames are score vectors, O(|V|).
        a = (
            ar.crossJoin(F.broadcast(an))
            .select("p", (F.col("a") / F.col("nrm")).alias("a"))
            .localCheckpoint(eager=False)
        )
        hr = be.join(a, "p").groupBy("c").agg(F.sum("a").alias("h"))
        hn = hr.agg(F.sqrt(F.sum(F.col("h") * F.col("h"))).alias("nrm"))
        h = (
            hr.crossJoin(F.broadcast(hn))
            .select("c", (F.col("h") / F.col("nrm")).alias("h"))
            .localCheckpoint(eager=False)
        )
    hubs = h.select(
        F.lit("hub").alias("role"),
        F.col("c").alias("node_key"),
        F.round("h", _HITS_ROUND).alias("score"),
    )
    auths = a.select(
        F.lit("authority").alias("role"),
        F.col("p").alias("node_key"),
        F.round("a", _HITS_ROUND).alias("score"),
    )
    return hubs.unionByName(auths)


graph_hits.__doc__ = graph_hits.__doc__.format(it=_HITS_ITERS, rd=_HITS_ROUND)


_LPA_TOP_K = 50  # communities reported


@register(
    "graph_label_propagation",
    oracle=f"""
WITH e AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
lp1 AS MATERIALIZED (
  SELECT p, CAST(min(c) AS BIGINT) AS lbl FROM e GROUP BY 1
),
lc AS MATERIALIZED (
  SELECT c, (min(struct_pack(nc := -n, l := lbl))).l AS lbl FROM (
    SELECT e.c, lp1.lbl, count(*) AS n
    FROM e JOIN lp1 USING (p) GROUP BY 1, 2
  ) GROUP BY 1
),
lp2 AS MATERIALIZED (
  SELECT p, (min(struct_pack(nc := -n, l := lbl))).l AS lbl FROM (
    SELECT e.p, lc.lbl, count(*) AS n
    FROM e JOIN lc USING (c) GROUP BY 1, 2
  ) GROUP BY 1
)
SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_parts
FROM lp2 GROUP BY 1
ORDER BY n_parts DESC, community
LIMIT {_LPA_TOP_K}
""",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LABEL PROPAGATION community detection (Raghavan et al. 2007) on
    the bipartite customer-part purchase graph, synchronous rounds with
    DETERMINISTIC tie-breaks: parts seed with the min buyer id, then
    each side adopts the MODE of its neighbors' labels (ties -> largest
    count, smallest label, via the lexicographic (-count, label)
    struct-min — the ext_kmeans_purity argmax discipline).  Two
    propagation rounds reported as the top-{k} community census —
    the coarse community map that complements ``ext_dedup_cluster``'s
    exact connected components (LPA trades convergence guarantees for
    O(rounds) shuffles, the 100 TB-friendly deal).

    Scale: each round is ONE edge-keyed equi-join plus one map-side-
    combined mode aggregate; label frames are |V|-sized and carry NO
    broadcast hint (AQE decides).  Output bounded by the top-k heap."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    lp1 = e.groupBy("p").agg(F.min("c").cast("long").alias("lbl"))

    def _mode(df, key):
        cnt = df.groupBy(key, "lbl").agg(F.count(F.lit(1)).alias("n"))
        m = F.min(F.struct((-F.col("n")).alias("nc"), F.col("lbl").alias("l")))
        return cnt.groupBy(key).agg(m.getField("l").alias("lbl"))

    lc = _mode(e.join(lp1, "p"), "c")
    lp2 = _mode(e.join(lc, "c"), "p")
    return (
        lp2.groupBy(F.col("lbl").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
        .orderBy(F.desc("n_parts"), "community")
        .limit(_LPA_TOP_K)
    )


graph_label_propagation.__doc__ = graph_label_propagation.__doc__.format(
    k=_LPA_TOP_K
)


_PPR_SEED_MOD = 19  # part_key % MOD == 0 nodes form the restart set
_PPR_ITERS = 4


def _ppr_oracle() -> str:
    """Unrolled fixed-iteration PERSONALIZED PageRank in DuckDB SQL —
    the seed-restart indicator is a pure function of the node id, so no
    iteration needs a seed join."""
    parts = [
        "WITH " + _EDGES_SQL.strip() + ",",
        "sym AS (SELECT x AS s, y AS d FROM e UNION ALL SELECT y, x FROM e),",
        "deg AS (SELECT s, count(*) AS dg FROM sym GROUP BY s),",
        "links AS MATERIALIZED "
        "(SELECT sym.s, sym.d, deg.dg FROM sym JOIN deg USING (s)),",
        f"ns AS (SELECT count(*) AS cnt FROM deg WHERE s % {_PPR_SEED_MOD} = 0),",
        f"r0 AS (SELECT s AS node, CASE WHEN s % {_PPR_SEED_MOD} = 0 "
        "THEN 1.0 / (SELECT cnt FROM ns) ELSE 0.0 END AS pr FROM deg),",
    ]
    for i in range(_PPR_ITERS):
        parts.append(
            f"r{i + 1} AS (SELECT l.d AS node, "
            f"(CASE WHEN l.d % {_PPR_SEED_MOD} = 0 "
            f"THEN (1.0 - {_PR_DAMPING}) / (SELECT cnt FROM ns) "
            f"ELSE 0.0 END) "
            f"+ {_PR_DAMPING} * sum(r.pr / l.dg) AS pr "
            f"FROM links l JOIN r{i} r ON l.s = r.node GROUP BY l.d),"
        )
    parts[-1] = parts[-1][:-1]
    parts.append(
        f"SELECT node AS part_key, "
        f"node % {_PPR_SEED_MOD} = 0 AS is_seed, "
        f"round(pr, {_PR_ROUND}) AS ppr "
        f"FROM r{_PPR_ITERS}"
    )
    return "\n".join(parts)


@register("graph_personalized_pagerank", oracle=_ppr_oracle())
def graph_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSONALIZED PageRank from a seed set (part_key % {m} == 0 nodes,
    restart mass split evenly): rank concentrates around the seeds'
    neighborhood instead of global authority — the related-content /
    similar-source expansion primitive (a crawl pipeline seeds PPR with
    its trusted domains to score proximity-to-trust; recommenders seed
    it with a user's items).  ``graph_pagerank`` is the uniform-restart
    special case.

    Same scale shape as PageRank: the static links relation materializes
    once (localCheckpoint), each of the {it} iterations is ONE dst-keyed
    map-side-combined shuffle, the rank vector is O(|V|), and the seed
    indicator is a pure function of the node id — no seed join inside
    the loop.  Oracle: unrolled CTE chain with MATERIALIZED links (the
    graph_hits inline-explosion lesson)."""
    e = _copurchase_edges(spark, sf_dir)
    sym = e.select(F.col("x").alias("s"), F.col("y").alias("d")).unionAll(
        e.select(F.col("y").alias("s"), F.col("x").alias("d"))
    )
    deg = sym.groupBy("s").agg(F.count(F.lit(1)).alias("dg"))
    links = sym.join(deg, "s").localCheckpoint(eager=True)
    seeds = links.select("s").distinct().filter(
        F.col("s") % _PPR_SEED_MOD == 0
    )
    n_seeds = seeds.count()
    restart = F.when(
        F.col("node") % _PPR_SEED_MOD == 0,
        F.lit((1.0 - _PR_DAMPING) / n_seeds),
    ).otherwise(F.lit(0.0))
    ranks = links.select("s").distinct().select(
        F.col("s").alias("node"),
        F.when(
            F.col("s") % _PPR_SEED_MOD == 0, F.lit(1.0 / n_seeds)
        ).otherwise(F.lit(0.0)).alias("pr"),
    )
    for _ in range(_PPR_ITERS):
        ranks = (
            links.join(ranks, links["s"] == ranks["node"])
            .groupBy(F.col("d").alias("node"))
            .agg(
                F.sum(F.col("pr") / F.col("dg")).alias("mass")
            )
            .select(
                "node",
                (restart + F.lit(_PR_DAMPING) * F.col("mass")).alias("pr"),
            )
        )
    return ranks.select(
        F.col("node").alias("part_key"),
        (F.col("node") % _PPR_SEED_MOD == 0).alias("is_seed"),
        F.round(F.col("pr"), _PR_ROUND).alias("ppr"),
    )


graph_personalized_pagerank.__doc__ = graph_personalized_pagerank.__doc__.format(
    m=_PPR_SEED_MOD, it=_PPR_ITERS
)


@register(
    "graph_modularity",
    oracle=f"""
WITH {_EDGES_SQL},
node_comm AS (
  SELECT DISTINCT n, p_brand AS comm FROM (
    SELECT x AS n FROM e UNION ALL SELECT y FROM e
  ) JOIN part ON p_partkey = n
),
m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
within AS (
  SELECT a.comm, CAST(count(*) AS BIGINT) AS in_edges
  FROM e JOIN node_comm a ON e.x = a.n
         JOIN node_comm b ON e.y = b.n AND a.comm = b.comm
  GROUP BY 1
),
degs AS (
  SELECT comm, CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum(dg) AS BIGINT) AS deg_sum
  FROM (SELECT n, CAST(count(*) AS BIGINT) AS dg FROM (
          SELECT x AS n FROM e UNION ALL SELECT y FROM e) GROUP BY 1)
  JOIN node_comm USING (n)
  GROUP BY 1
)
SELECT d.comm AS community, d.n_nodes,
       CAST(coalesce(w.in_edges, 0) AS BIGINT) AS in_edges,
       d.deg_sum,
       floor((4.0 * m.m * coalesce(w.in_edges, 0) - CAST(d.deg_sum AS DOUBLE) * d.deg_sum)
             / (4.0 * m.m * m.m) * 1000000 + 0.5) / 1000000.0 AS q_contrib
FROM degs d LEFT JOIN within w ON d.comm = w.comm CROSS JOIN m
ORDER BY community
""",
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODULARITY decomposition of the co-purchase graph under the
    part-BRAND partition: per community, Newman's
    ``q_c = in_c/m − (deg_c/2m)²`` — does co-purchase structure align
    with brands? (Σ q_c near 0 ⇒ brands are not communities; this is
    the QUALITY functional Louvain greedily climbs, evaluated here on a
    domain partition, the audit run before trusting any community
    label.)  Complements ``graph_label_propagation`` (which FINDS
    communities; this SCORES a given partition).

    Exactness: in_c, deg_c and m are integers, so each contribution is
    the single shared double expression
    ``(4·m·in_c − deg_c²)/(4m²)`` — no float accumulation.  Cost: the
    edge relation joins the |V|-row node→community map twice (both
    broadcastable at web scale after the support filter), one groupBy
    each."""
    e = _copurchase_edges(spark, sf_dir).select("x", "y")
    p = table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("n"), F.col("p_brand").alias("comm")
    )
    nodes = (
        e.select(F.col("x").alias("n"))
        .unionAll(e.select(F.col("y").alias("n")))
    )
    node_comm = nodes.distinct().join(p, "n")
    m = e.agg(F.count(F.lit(1)).cast("long").alias("m"))
    a = node_comm.select(F.col("n").alias("x"), F.col("comm").alias("ca"))
    b = node_comm.select(F.col("n").alias("y"), F.col("comm").alias("cb"))
    within = (
        e.join(a, "x")
        .join(b, "y")
        .filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("in_edges"))
    )
    degs = (
        nodes.groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("dg"))
        .join(node_comm, "n")
        .groupBy(F.col("comm").alias("community"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("dg").cast("long").alias("deg_sum"),
        )
    )
    q = (
        4.0 * F.col("m") * F.col("in_edges")
        - F.col("deg_sum").cast("double") * F.col("deg_sum")
    ) / (4.0 * F.col("m") * F.col("m"))
    return (
        degs.join(within, "community", "left")
        .crossJoin(F.broadcast(m))
        .withColumn(
            "in_edges", F.coalesce("in_edges", F.lit(0)).cast("long")
        )
        .select(
            "community",
            "n_nodes",
            "in_edges",
            "deg_sum",
            (F.floor(q * 1000000 + 0.5) / 1000000.0).alias("q_contrib"),
        )
        .orderBy("community")
    )


@register(
    "graph_clustering_coeff",
    oracle=f"""
WITH {_EDGES_SQL},
tri AS (SELECT ab.x AS a, ab.y AS b, bc.y AS c
        FROM e ab
        JOIN e bc ON ab.y = bc.x
        JOIN e ac ON ac.x = ab.x AND ac.y = bc.y),
m AS (SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri),
t AS (SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM m GROUP BY node),
sym AS (SELECT x AS node FROM e UNION ALL SELECT y FROM e),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM sym GROUP BY node)
SELECT d.node AS part_key, d.degree,
       CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_triangles,
       floor(2.0 * coalesce(t.n_tri, 0) / (d.degree * (d.degree - 1))
             * 1000000 + 0.5) / 1000000.0 AS coeff
FROM deg d LEFT JOIN t ON d.node = t.node
WHERE d.degree >= 2
""",
)
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCAL CLUSTERING COEFFICIENT per node of the co-purchase graph:
    c(v) = 2·T(v)/(deg(v)·(deg(v)−1)) — how close each node's
    neighborhood is to a clique, the per-node normalization of
    ``graph_triangles``' raw counts (Watts & Strogatz 1998).  High-
    degree low-coefficient nodes are hubs bridging communities; high-
    coefficient clusters are the tight co-purchase bundles
    ``graph_label_propagation`` should recover.

    Exactness: triangle and degree counts are exact int64 from the
    ordered-edge wedge join (each triangle emitted once); the
    coefficient is one exact-int ratio.  Degree-1 nodes are excluded
    (undefined denominator).

    Scale shape: the wedge join's fan-out is Σdeg² of the SUPPORT-
    FILTERED graph (the ≥{mc}-co-purchase threshold is the bound);
    degrees come from one symmetrized groupBy; the final join is
    node-keyed.  Nothing quadratic in the raw catalog."""
    e = _copurchase_edges(spark, sf_dir).select("x", "y").localCheckpoint(eager=True)
    ab, bc, ac = e.alias("ab"), e.alias("bc"), e.alias("ac")
    tri = (
        ab.join(bc, F.col("ab.y") == F.col("bc.x"))
        .join(ac, (F.col("ac.x") == F.col("ab.x")) & (F.col("ac.y") == F.col("bc.y")))
        .select(
            F.col("ab.x").alias("a"), F.col("ab.y").alias("b"), F.col("bc.y").alias("c")
        )
    )
    t = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
    deg = (
        e.select(F.col("x").alias("node"))
        .unionAll(e.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    out = (
        deg.filter(F.col("degree") >= 2)
        .join(t, "node", "left")
        .select(
            F.col("node").alias("part_key"),
            "degree",
            F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_triangles"),
        )
    )
    coeff = (
        F.lit(2.0)
        * F.col("n_triangles")
        / (F.col("degree") * (F.col("degree") - 1))
    )
    return out.select(
        "part_key",
        "degree",
        "n_triangles",
        (F.floor(coeff * 1000000 + 0.5) / 1000000.0).alias("coeff"),
    )


graph_clustering_coeff.__doc__ = graph_clustering_coeff.__doc__.format(
    mc=_MIN_COPURCHASES
)


@register(
    "graph_connected_components",
    oracle=f"""
WITH RECURSIVE {_EDGES_SQL},
ed AS (SELECT x AS a, y AS b FROM e UNION ALL SELECT y, x FROM e),
reach(src, dst) AS (
  SELECT a, b FROM ed
  UNION
  SELECT r.src, ed.b FROM reach r JOIN ed ON r.dst = ed.a
),
nodes AS (SELECT DISTINCT a AS n FROM ed),
lbl AS (
  SELECT n, least(n, min(dst)) AS component_id
  FROM nodes JOIN reach ON src = n GROUP BY n
)
SELECT component_id, CAST(count(*) AS BIGINT) AS n_nodes
FROM lbl GROUP BY 1 ORDER BY n_nodes DESC, component_id
""",
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONNECTED COMPONENTS of the co-purchase graph, reported as a
    component census (min-id label, size) — the graph-native view of
    what ``ext_dedup_cluster`` does for near-dup documents, exposed as
    a first-class graph operator: market-basket "product islands",
    the input grain for per-component assortment work.

    Spark shape: the shared ``llm.dedup.connected_components`` engine —
    min-label propagation with EDGE CONTRACTION and pointer doubling
    (Kiveris et al. SOCC'14), O(log diameter) rounds, every round's
    frontier localCheckpointed through ``_checkpoint_reset_stats`` (the
    stats-inflation guard).  The DuckDB oracle is the quadratic
    transitive closure — fine at test scale, unusable at 100 TB, which
    is exactly why the distributed contraction loop exists.

    Scale shape: per-round cost is a handful of |E'|-keyed joins on the
    CONTRACTED graph (shrinks geometrically); the census is one
    label-keyed groupBy.  No transitive closure is ever materialized."""
    from ..llm.dedup import connected_components

    e = _copurchase_edges(spark, sf_dir).select("x", "y")
    edges = (
        e.select(F.col("x").alias("doc_a"), F.col("y").alias("doc_b"))
        .unionAll(e.select(F.col("y").alias("doc_a"), F.col("x").alias("doc_b")))
        .distinct()
    )
    nodes = (
        e.select(F.col("x").alias("doc_id"))
        .unionAll(e.select(F.col("y").alias("doc_id")))
        .distinct()
    )
    labels = nodes.select("doc_id", F.col("doc_id").alias("component_id"))
    cc = connected_components(labels, edges, identity_start=True)
    return (
        cc.groupBy("component_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .orderBy(F.desc("n_nodes"), "component_id")
    )


_MST_MAX_ROUNDS = 48  # Borůvka halves component count per round: 2^48 covers any
# conceivable graph (rounds needed ~= log2(largest component), so even a
# 100 TB-scale giant component converges long before this; extra headroom
# costs only one count() on the round that breaks the loop)


_MST_ORACLE = f"""
WITH RECURSIVE op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e AS MATERIALIZED (SELECT a.p AS x, b.p AS y, CAST(count(*) AS BIGINT) AS w
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p HAVING count(*) >= {_MIN_COPURCHASES}),
idx AS MATERIALIZED (SELECT x, y, w, row_number() OVER (ORDER BY w, x, y) AS i FROM e),
bounds AS (SELECT CAST(max(greatest(x, y)) AS INT) AS mx, count(*) AS ne FROM e),
walk AS (
  SELECT 0 AS i,
         list_transform(generate_series(1, mx + 1), j -> CAST(j AS BIGINT)) AS lab,
         CAST([] AS STRUCT(x BIGINT, y BIGINT, w BIGINT)[]) AS acc
  FROM bounds
  UNION ALL
  SELECT w0.i + 1,
         CASE WHEN w0.lab[CAST(ix.x AS INT) + 1] = w0.lab[CAST(ix.y AS INT) + 1]
              THEN w0.lab
              ELSE list_transform(w0.lab,
                     l -> CASE WHEN l = w0.lab[CAST(ix.y AS INT) + 1]
                               THEN w0.lab[CAST(ix.x AS INT) + 1] ELSE l END)
         END,
         CASE WHEN w0.lab[CAST(ix.x AS INT) + 1] = w0.lab[CAST(ix.y AS INT) + 1]
              THEN w0.acc
              ELSE list_append(w0.acc, struct_pack(x := ix.x, y := ix.y, w := ix.w))
         END
  FROM walk w0 JOIN idx ix ON ix.i = w0.i + 1
), last AS (
  SELECT acc FROM walk ORDER BY i DESC LIMIT 1
)
SELECT a.x AS x, a.y AS y, a.w AS w
FROM (SELECT unnest(acc) AS a FROM last)
ORDER BY w, x, y
"""


@register("graph_mst", oracle=_MST_ORACLE)
# DuckDB-oracled since round 14: Kruskal as a recursive-CTE LIST FOLD over
# the (w, x, y)-ordered edge stream — the accumulator carries the label
# vector (relabeled per accepted edge) and the accepted-forest list; the
# forest is UNIQUE under the total edge order, so Boruvka (engine) and
# Kruskal (oracle) provably produce identical edges.  Independent-Kruskal
# parity additionally pinned in tests/test_graph.py::test_mst_matches_kruskal.
def graph_mst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MINIMUM SPANNING FOREST of the weighted co-purchase graph by
    DISTRIBUTED BORŮVKA: each round every component hooks its minimum-
    weight incident edge (unique under the total edge order (w, x, y),
    so the forest is unique and no tie cycles can form), the picked
    pseudo-forest is contracted with the shared
    ``llm.dedup.connected_components`` engine, and the round repeats on
    the quotient graph — component count at least halves per round, so
    O(log V) rounds total (Borůvka 1926; the MapReduce formulation is
    the standard one, e.g. Lattanzi et al.'s filtering literature).
    The MST is the backbone for single-linkage clustering over the
    co-purchase graph and the cheapest-connection view of an
    assortment network.

    Scale shape: per round, ONE relabel join over the surviving edges,
    ONE per-component min_by aggregate (map-side combined), and a CC
    contraction whose input is ≤ |components| edges; picked edges
    accumulate via checkpointed unions.  Nothing is ever quadratic;
    the driver holds only round counters.  DuckDB-ORACLED since round
    14 (a Kruskal list-fold recursive CTE — the forest is unique under
    the (w, x, y) total order, so both algorithms must emit identical
    edges); exact parity vs an independent Kruskal is additionally
    pinned in tests."""
    from ..llm.dedup import _checkpoint_reset_stats, connected_components

    e0 = _copurchase_edges(spark, sf_dir)  # (x, y, w), x < y, each edge once
    edges = _checkpoint_reset_stats(
        e0.select(
            "x", "y", F.col("w").cast("long").alias("w")
        )
    )
    nodes = (
        edges.select(F.col("x").alias("n"))
        .unionAll(edges.select(F.col("y").alias("n")))
        .distinct()
    )
    labels = _checkpoint_reset_stats(
        nodes.select(F.col("n").alias("doc_id"), F.col("n").alias("component_id"))
    )
    mst = None
    for _rnd in range(_MST_MAX_ROUNDS):
        lx = labels.select(F.col("doc_id").alias("x"), F.col("component_id").alias("cx"))
        ly = labels.select(F.col("doc_id").alias("y"), F.col("component_id").alias("cy"))
        cross = _checkpoint_reset_stats(
            edges.join(lx, "x").join(ly, "y").filter("cx != cy")
        )
        if cross.count() == 0:
            break
        # Every component hooks its min incident edge under (w, x, y).
        inc = cross.select(F.col("cx").alias("c"), "w", "x", "y").unionAll(
            cross.select(F.col("cy").alias("c"), "w", "x", "y")
        )
        picked = (
            inc.groupBy("c")
            .agg(F.min(F.struct("w", "x", "y")).alias("m"))
            .select("m.x", "m.y", "m.w")
            .distinct()
        )
        picked = _checkpoint_reset_stats(picked)
        mst = picked if mst is None else _checkpoint_reset_stats(mst.unionAll(picked))
        # Contract: CC over the picked pseudo-forest on the COMPONENT graph.
        pl = picked.join(lx, "x").join(ly, "y")
        comp_edges = pl.select(
            F.col("cx").alias("doc_a"), F.col("cy").alias("doc_b")
        ).unionAll(pl.select(F.col("cy").alias("doc_a"), F.col("cx").alias("doc_b")))
        comps = labels.select(F.col("component_id").alias("doc_id")).distinct()
        comp_labels = connected_components(
            comps.select("doc_id", F.col("doc_id").alias("component_id")),
            comp_edges.distinct(),
            identity_start=True,
        ).select(F.col("doc_id").alias("old_c"), F.col("component_id").alias("new_c"))
        labels = _checkpoint_reset_stats(
            labels.join(
                comp_labels, labels.component_id == comp_labels.old_c, "left"
            ).select(
                "doc_id",
                F.coalesce("new_c", "component_id").alias("component_id"),
            )
        )
    else:
        raise RuntimeError(
            f"Borůvka did not converge in {_MST_MAX_ROUNDS} rounds — "
            "component count must at least halve per round; investigate"
        )
    if mst is None:
        return edges.select("x", "y", "w").limit(0)
    return mst.select("x", "y", "w").orderBy("w", "x", "y")


_BC_SOURCES = 8  # deterministic pivot sample (Brandes & Pich 2007)
_BC_MAX_HOPS = 16  # BFS depth bound (co-purchase diameter is far below)


def _betweenness_oracle(max_hops: int = None, pivots: int = None) -> str:
    """Unrolled level-by-level Brandes in DuckDB SQL (the declarative
    twin of the iterative multi-source BFS + dependency accumulation,
    one CTE pair per level — the ``_pagerank_oracle`` pattern).  The
    base relations are MATERIALIZED so the ~3-dozen CTE references
    share one lineitem scan instead of re-opening the parquet per
    reference (found live: plain CTE inlining exhausted the fd limit)."""
    max_hops = max_hops if max_hops is not None else _BC_MAX_HOPS
    pivots = pivots if pivots is not None else _BC_SOURCES
    parts = [
        "WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, "
        "l_partkey AS p FROM lineitem),\n"
        "e AS MATERIALIZED (SELECT a.p AS x, b.p AS y, count(*) AS w "
        "FROM op a JOIN op b ON a.o = b.o AND a.p < b.p "
        f"GROUP BY a.p, b.p HAVING count(*) >= {_MIN_COPURCHASES}),\n"
        "sym AS MATERIALIZED (SELECT x AS s, y AS d FROM e "
        "UNION ALL SELECT y, x FROM e),\n"
        f"piv AS (SELECT s AS n FROM sym GROUP BY s ORDER BY s LIMIT {pivots}),\n"
        "f0 AS (SELECT n AS src, n AS node, CAST(1 AS BIGINT) AS sigma FROM piv),\n"
        "v0 AS (SELECT src, node FROM f0)"
    ]
    for k in range(1, max_hops + 1):
        parts.append(
            f",\nf{k} AS MATERIALIZED (SELECT f.src, sym.d AS node, "
            f"CAST(sum(f.sigma) AS BIGINT) AS sigma FROM f{k - 1} f "
            "JOIN sym ON f.node = sym.s "
            f"LEFT JOIN v{k - 1} v ON v.src = f.src AND v.node = sym.d "
            "WHERE v.node IS NULL GROUP BY 1, 2),\n"
            f"v{k} AS MATERIALIZED (SELECT src, node FROM v{k - 1} "
            f"UNION ALL SELECT src, node FROM f{k})"
        )
    parts.append(
        f",\nd{max_hops} AS (SELECT src, node, sigma, "
        f"CAST(0 AS DOUBLE) AS delta FROM f{max_hops})"
    )
    for k in range(max_hops - 1, -1, -1):
        parts.append(
            f",\nc{k} AS (SELECT d.src, sym.d AS node, "
            "sum((1 + d.delta) / d.sigma) AS csum "
            f"FROM d{k + 1} d JOIN sym ON d.node = sym.s GROUP BY 1, 2),\n"
            f"d{k} AS MATERIALIZED (SELECT f.src, f.node, f.sigma, "
            "f.sigma * COALESCE(c.csum, 0) AS delta "
            f"FROM f{k} f LEFT JOIN c{k} c ON c.src = f.src AND c.node = f.node)"
        )
    union = " UNION ALL ".join(
        f"SELECT src, node, delta FROM d{k}" for k in range(1, max_hops + 1)
    )
    parts.append(
        f"\nSELECT node, floor(sum(delta) / 2.0 * 1000000 + 0.5) / 1000000.0 "
        f"AS betweenness FROM ({union}) GROUP BY node "
        "ORDER BY betweenness DESC, node"
    )
    return "".join(parts)



@register("graph_betweenness", oracle=_betweenness_oracle())
# DuckDB-oracled via an UNROLLED level-by-level Brandes (one CTE pair per
# BFS level, the _pagerank_oracle pattern) — the depth bound _BC_MAX_HOPS
# makes the "iterative" loop statically unrollable; exact parity vs an
# independent pure-Python Brandes on the same pivots is additionally
# pinned in tests/test_graph.py::test_betweenness_matches_reference_brandes.
def graph_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLED BETWEENNESS CENTRALITY over the co-purchase graph — the
    bridge-detection centrality (which parts sit on the most shortest
    paths between other parts), the standard complement to the
    PageRank / HITS / k-core battery for finding assortment chokepoints.
    Exact betweenness is one Brandes pass per VERTEX (Brandes 2001) —
    quadratic at scale — so this computes the Brandes & Pich 2007 pivot
    estimator: dependency accumulation from a deterministic sample of
    {s} source pivots (the smallest node ids, reproducible both in the
    engine and the parity reference), unnormalized, halved for the
    undirected double-count.

    Spark shape, forward phase: ONE multi-source BFS — all {s} pivots
    expand simultaneously as (src, node) frontier rows, so the round
    count is the graph DIAMETER (not diameter x pivots); each round is
    a frontier-edge join + a map-side-combined sigma sum (shortest-path
    counts) + an anti-join against the visited set, with lineage cut
    per round.  Backward phase: Brandes' dependency accumulation runs
    level-by-level over the stored BFS level frames — per level one
    edge join + one grouped sum computes delta(v) = sigma_v *
    sum((1 + delta_w) / sigma_w) over level-(l+1) successors w.  Rounds
    total 2 x diameter; every join is on (src, node) keys; nothing is
    ever O(V^2).  At 100 TB the forward frontier join is the standard
    iterative-graph shuffle shape (PageRank's), and pivots scale the
    estimator's accuracy, not the round count."""
    from ..llm.dedup import _checkpoint_reset_stats

    e = _copurchase_edges(spark, sf_dir)
    sym = _checkpoint_reset_stats(
        e.select(F.col("x").alias("s"), F.col("y").alias("d")).unionAll(
            e.select(F.col("y").alias("s"), F.col("x").alias("d"))
        )
    )
    srcs = [
        int(r.n)
        for r in sym.select(F.col("s").alias("n"))
        .distinct()
        .orderBy("n")
        .limit(_BC_SOURCES)
        .collect()
    ]
    if not srcs:
        return spark.createDataFrame([], "node long, betweenness double")
    level0 = spark.createDataFrame(
        [(s, s, 1) for s in srcs], "src long, node long, sigma long"
    )
    levels = [level0]
    visited = level0.select("src", "node")
    for _k in range(1, _BC_MAX_HOPS + 1):
        nxt = _checkpoint_reset_stats(
            levels[-1]
            .join(sym, levels[-1]["node"] == sym["s"])
            .select("src", F.col("d").alias("node"), "sigma")
            .groupBy("src", "node")
            .agg(F.sum("sigma").alias("sigma"))
            .join(visited, ["src", "node"], "left_anti")
        )
        if nxt.isEmpty():
            break
        levels.append(nxt)
        visited = _checkpoint_reset_stats(
            visited.unionAll(nxt.select("src", "node"))
        )
    # Backward: delta over the shortest-path DAG, deepest level first.
    acc = None
    delta_next = levels[-1].select(
        "src", "node", "sigma", F.lit(0.0).alias("delta")
    )
    for lvl in range(len(levels) - 2, -1, -1):
        w = delta_next.select(
            "src",
            F.col("node").alias("w"),
            (
                (F.lit(1.0) + F.col("delta"))
                / F.col("sigma").cast("double")
            ).alias("contrib"),
        )
        up = (
            w.join(sym, w["w"] == sym["s"])
            .select("src", F.col("d").alias("node"), "contrib")
            .groupBy("src", "node")
            .agg(F.sum("contrib").alias("csum"))
        )
        cur = _checkpoint_reset_stats(
            levels[lvl]
            .join(up, ["src", "node"], "left")
            .select(
                "src",
                "node",
                "sigma",
                (
                    F.coalesce(F.col("csum"), F.lit(0.0))
                    * F.col("sigma").cast("double")
                ).alias("delta"),
            )
        )
        scored = delta_next.filter(F.col("node") != F.col("src")).select(
            "node", "delta"
        )
        acc = scored if acc is None else acc.unionAll(scored)
        delta_next = cur
    last = delta_next.filter(F.col("node") != F.col("src")).select(
        "node", "delta"
    )
    acc = last if acc is None else acc.unionAll(last)
    return (
        acc.groupBy("node")
        .agg(
            (
                F.floor(F.sum("delta") / 2.0 * 1000000 + 0.5) / 1000000.0
            ).alias("betweenness")
        )
        .orderBy(F.desc("betweenness"), "node")
    )


graph_betweenness.__doc__ = graph_betweenness.__doc__.format(s=_BC_SOURCES)


_KATZ_ALPHA = 0.01   # attenuation; << 1/max_degree of the support graph
_KATZ_ITERS = 5      # fixed truncation depth (unrolled in SQL)


def _katz_oracle() -> str:
    """Unrolled fixed-iteration Katz centrality in DuckDB SQL — one CTE
    per iteration, the declarative twin of the DataFrame loop."""
    parts = [
        "WITH " + _EDGES_SQL.strip() + ",",
        "sym AS (SELECT x AS s, y AS d FROM e UNION ALL SELECT y, x FROM e),",
        "nodes AS (SELECT DISTINCT s AS node FROM sym),",
        # CAST every literal: bare 1.0/0.01 parse as DECIMAL in DuckDB and
        # the whole 5-iteration fold would stay DECIMAL (dialect trap).
        "k0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS kz FROM nodes),",
    ]
    for i in range(_KATZ_ITERS):
        parts.append(
            f"k{i + 1} AS (SELECT n.node, "
            f"CAST(1.0 AS DOUBLE) + CAST({_KATZ_ALPHA} AS DOUBLE) "
            f"* coalesce(sum(k.kz), CAST(0.0 AS DOUBLE)) AS kz "
            f"FROM nodes n LEFT JOIN sym ON sym.d = n.node "
            f"LEFT JOIN k{i} k ON k.node = sym.s "
            f"GROUP BY n.node),"
        )
    parts[-1] = parts[-1][:-1]
    parts.append(
        f"SELECT node AS part_key, round(kz, {_PR_ROUND}) AS katz "
        f"FROM k{_KATZ_ITERS}"
    )
    return "\n".join(parts)


@register("graph_katz", oracle=_katz_oracle())
def graph_katz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KATZ CENTRALITY (attenuation 0.01, 5 truncated iterations) over
    the co-purchase graph: x' = 1 + alpha * A x — counts ALL walks into
    a node geometrically damped by length, the centrality that (unlike
    PageRank) does not dilute a neighbor's contribution by its
    out-degree, so a part co-bought with one hub scores high even if
    the hub fans out widely.  The complement to ``graph_pagerank``'s
    random-surfer ranking in the part-importance panel.

    Same execution shape as PageRank: the symmetrized link relation is
    materialized ONCE (localCheckpoint) and each of the 5 iterations is
    one key-partitioned aggregate join — rounds x one shuffle, never
    walk enumeration.  Per-node in-sums are small-fan unordered float
    adds masked by the family's shared {r}-decimal rounding (the
    graph-battery convention, graph.py:55).  Value-checked against the
    unrolled 5-CTE DuckDB twin."""
    e = _copurchase_edges(spark, sf_dir)
    sym = e.select(F.col("x").alias("s"), F.col("y").alias("d")).unionAll(
        e.select(F.col("y").alias("s"), F.col("x").alias("d"))
    ).localCheckpoint(eager=True)
    # Every node of the SYMMETRIZED graph has >= 1 in-edge, so the pull
    # update can group straight off the link join (the pagerank shape) —
    # no per-iteration re-join against a node list.
    ranks = sym.select(F.col("s").alias("node")).distinct().select(
        "node", F.lit(1.0).alias("kz")
    )
    for _ in range(_KATZ_ITERS):
        ranks = (
            sym.join(ranks, sym["s"] == ranks["node"])
            .groupBy(F.col("d").alias("node_next"))
            .agg((1.0 + _KATZ_ALPHA * F.sum("kz")).alias("kz"))
            .select(F.col("node_next").alias("node"), "kz")
        )
    return ranks.select(
        F.col("node").alias("part_key"),
        F.round(F.col("kz"), _PR_ROUND).alias("katz"),
    )


graph_katz.__doc__ = graph_katz.__doc__.format(r=_PR_ROUND)


@register(
    "graph_jaccard_links",
    oracle=f"""
WITH e AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), cd AS (
  SELECT c, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1
), pairs AS (
  SELECT a.c AS c1, b.c AS c2, CAST(count(*) AS BIGINT) AS common
  FROM e a JOIN e b ON a.p = b.p AND a.c < b.c
  GROUP BY 1, 2
), sc AS (
  SELECT p.c1, p.c2, p.common, d1.d + d2.d - p.common AS unions,
         CAST(floor(1000000.0 * p.common / (d1.d + d2.d - p.common) + 0.5)
              AS BIGINT) AS jac_micro
  FROM pairs p JOIN cd d1 ON d1.c = p.c1 JOIN cd d2 ON d2.c = p.c2
)
SELECT c1, c2, common, unions, jac_micro
FROM sc
ORDER BY jac_micro DESC, c1, c2
LIMIT {_CN_TOP_K}
""",
)
def graph_jaccard_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JACCARD link prediction over the bipartite co-purchase graph:
    top-k customer pairs by |N(a) n N(b)| / |N(a) u N(b)| — the
    normalized sibling of ``graph_common_neighbors`` (raw counts favor
    heavy buyers; Jaccard asks what FRACTION of their combined basket
    overlaps) completing the link-prediction panel with
    ``graph_adamic_adar``.

    The pair table is the same part-blocked candidate join (cells are
    co-purchase pairs, never all-pairs); union sizes come from the
    customer-degree frame joined twice (|customers|-sized — no
    broadcast hint, AQE decides); the score is micro-quantized BEFORE
    ranking (floor(1e6*c/u + 0.5) — an exact integer both engines
    derive identically) with (c1, c2) tiebreak."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    cd = e.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("d"))
    a = e.select(F.col("c").alias("c1"), "p")
    b = e.select(F.col("c").alias("c2"), "p")
    pairs = (
        a.join(b, "p")
        .filter(F.col("c1") < F.col("c2"))
        .groupBy("c1", "c2")
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
    )
    sc = (
        pairs.join(cd.select(F.col("c").alias("c1"), F.col("d").alias("da")), "c1")
        .join(cd.select(F.col("c").alias("c2"), F.col("d").alias("db")), "c2")
        .select(
            "c1",
            "c2",
            "common",
            (F.col("da") + F.col("db") - F.col("common")).alias("unions"),
            F.floor(
                1000000.0
                * F.col("common")
                / (F.col("da") + F.col("db") - F.col("common"))
                + 0.5
            )
            .cast("long")
            .alias("jac_micro"),
        )
    )
    return sc.orderBy(F.desc("jac_micro"), "c1", "c2").limit(_CN_TOP_K)


_CLOSENESS_PIVOTS = 4    # deterministic pivot set: the K smallest node ids
_CLOSENESS_HOPS = 8      # >= support-graph diameter at every test SF


def _closeness_oracle() -> str:
    return f"""
WITH RECURSIVE {_EDGES_SQL.strip()},
sym AS (SELECT x AS s, y AS d FROM e UNION ALL SELECT y, x FROM e),
src AS (SELECT s AS v FROM (SELECT DISTINCT s FROM sym ORDER BY s
                            LIMIT {_CLOSENESS_PIVOTS})),
walk(src, node, dist) AS (
  SELECT v, v, 0 FROM src
  UNION
  SELECT w.src, sym.d, w.dist + 1
  FROM walk w JOIN sym ON sym.s = w.node
  WHERE w.dist < {_CLOSENESS_HOPS}
),
sp AS (SELECT src, node, CAST(min(dist) AS BIGINT) AS dist
       FROM walk GROUP BY 1, 2),
cl AS (
  SELECT src, CAST(count(*) AS BIGINT) - 1 AS reached,
         CAST(sum(dist) AS BIGINT) AS total_dist,
         CAST(coalesce(sum(CASE WHEN dist > 0
                  THEN CAST(floor(1000000.0 / dist + 0.5) AS BIGINT)
                  ELSE 0 END), 0) AS BIGINT) AS harmonic_micro
  FROM sp GROUP BY src
)
SELECT src AS part_key, reached, total_dist,
       floor(CAST(reached AS DOUBLE) / total_dist * 1000000 + 0.5)
         / 1000000.0 AS closeness,
       harmonic_micro
FROM cl ORDER BY src
"""


@register("graph_closeness", oracle=_closeness_oracle())
def graph_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLOSENESS + HARMONIC centrality from {k} deterministic pivot
    nodes (the smallest ids — the Eppstein-Wang pivot-sampling shape:
    at 100 TB you estimate centralities from a pivot set, never
    all-pairs): closeness = (reached-1)/sum(dist), harmonic =
    sum(1/dist) with each 1/dist micro-quantized BEFORE summing (the
    adamic_adar integer-weight discipline, so the sum is
    order-independent and exact).

    ONE multi-source BFS carries all pivots together — the frontier is
    (src, node) keyed, so rounds = diameter (not diameter x pivots),
    the graph_betweenness discipline; each round joins only the
    frontier against the localCheckpointed symmetrized edges and
    anti-joins the visited set.  Oracle: depth-bounded recursive CTE
    with min(dist) per (src, node)."""
    e = _copurchase_edges(spark, sf_dir)
    sym = (
        e.select(F.col("x").alias("s"), F.col("y").alias("dd"))
        .unionAll(e.select(F.col("y").alias("s"), F.col("x").alias("dd")))
        .localCheckpoint(eager=True)
    )
    pivots = [
        int(r.s)
        for r in sym.select("s").distinct().orderBy("s").limit(_CLOSENESS_PIVOTS).collect()
    ]
    dist = spark.createDataFrame(
        [(p, p, 0) for p in pivots], "src long, node long, dist int"
    )
    frontier = dist
    prev = None
    for k in range(1, _CLOSENESS_HOPS + 1):
        # Unweighted-BFS level invariant: a neighbor of a level-(k-1)
        # node sits at level k-2, k-1 or k, so anti-joining the LAST TWO
        # frontiers filters new nodes exactly — the visited set never
        # needs the full (and growing) dist table on the anti-join build
        # side (guide §2.3: shuffle the two bounded frontiers, not the
        # whole reach).
        seen = frontier if prev is None else prev.unionAll(frontier)
        nxt = (
            frontier.join(sym, frontier["node"] == sym["s"])
            .select("src", F.col("dd").alias("node"))
            .distinct()
            .join(seen.select("src", "node"), ["src", "node"], "left_anti")
            .select("src", "node", F.lit(k).cast("int").alias("dist"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        dist = dist.unionAll(nxt)
        prev, frontier = frontier, nxt
    term = F.floor(1000000.0 / F.col("dist") + 0.5).cast("long")
    cl = dist.groupBy("src").agg(
        (F.count(F.lit(1)).cast("long") - 1).alias("reached"),
        F.sum("dist").cast("long").alias("total_dist"),
        F.coalesce(
            F.sum(F.when(F.col("dist") > 0, term).otherwise(F.lit(0))), F.lit(0)
        )
        .cast("long")
        .alias("harmonic_micro"),
    )
    return cl.select(
        F.col("src").alias("part_key"),
        "reached",
        "total_dist",
        (
            F.floor(
                F.col("reached").cast("double") / F.col("total_dist") * 1000000 + 0.5
            )
            / 1000000.0
        ).alias("closeness"),
        "harmonic_micro",
    ).orderBy("part_key")


graph_closeness.__doc__ = graph_closeness.__doc__.format(k=_CLOSENESS_PIVOTS)
