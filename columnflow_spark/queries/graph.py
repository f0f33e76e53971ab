"""Iterative graph analytics: PageRank over the customer→supplier trade
graph, on an exact integer grid.

PageRank is the canonical *iterative* distributed computation (repeated
join + aggregate until convergence) and a real training-data tool:
crawl-seed / domain-authority scoring for corpus curation is PageRank
over the host link graph.  The engine's other iterative ops (k-means,
BPE, logreg) keep their model state bounded and driver-side; PageRank's
state is NODE-GRAIN, so each iteration is a genuine distributed
join(edges, ranks) → groupBy(dst) round trip — the shape GraphX/Pregel
schedule, expressed here as plain DataFrame ops.

Exactness across engines: a float PageRank sums per-node double
contributions in engine-dependent order (the knife-edge class the sf1
sweeps kept finding), so this implementation runs ENTIRELY on a scaled
integer grid — ranks are BIGINTs in units of 1e-9, contributions use
floor division by out-degree, and damping is ``(85 * x) // 100``.
Every operation is exact integer arithmetic with identical semantics in
Spark (``div``) and DuckDB (``//`` on non-negatives), so the K-round
oracle replay is bit-identical by construction, not by rounding luck.

Scale notes (the 100 TB story):

- The edge list is built once (orders ⋈ lineitem, distinct) and REUSED
  across iterations — at scale it is the materialized artifact
  (checkpointed / written out), everything else is narrow (node, rank).
- Each iteration shuffles edge-volume rows on ``dst`` with map-side
  partial sums (HashAggregate before the exchange); the dangling-mass
  term is a scalar aggregate, broadcast as one row.
- Rank and degree relations are node-grain and never broadcast (the
  out-degree join rides the same ``src`` shuffle as the contribution
  join).
- The integer grid bounds magnitudes: total mass stays ≈ N * SCALE, so
  the 85× damping multiply needs N * SCALE * 85 < 2^63 — at 1e9 nodes
  drop SCALE to 1e8 (still 8 significant digits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from columnflow_spark.core.state import checkpoint_df

from columnflow_spark.queries import query
from columnflow_spark.sources import load_table, spread

_PR_ITERS = 5
#: rank unit: 1.0 == 1e9 grid steps (9 exact digits)
_PR_SCALE = 1_000_000_000
#: damping 0.85 as an exact integer rational
_PR_D_NUM, _PR_D_DEN = 85, 100


#: per-(session, sf_dir, kind) CHECKPOINTED edge lists — the reused
#: artifact of every iterative op on the same graph (r13, guide §1.2):
#: pagerank/HITS/PPR all start from the trade edges and LPA/triangle/
#: link-prediction from the co-order edges; at 100 TB the edge list is a
#: materialized table built once, so the per-query rebuild (join +
#: DISTINCT over the fact table) was repeated work.  bench.py purges the
#: cache on the FIRST line of each family (pagerank_trade_graph /
#: graph_label_propagation) so the build cost stays measured there, the
#: shared-shingle-table precedent (_GRAMS_CACHE).
_EDGE_CACHE: dict = {}


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customer→supplier edges; node ids namespaced into one
    space (customers even, suppliers odd) since the key ranges overlap.
    Returned CHECKPOINTED and session-cached (see ``_EDGE_CACHE``)."""
    key = (spark.sparkContext.applicationId, sf_dir, "trade")
    edges = _EDGE_CACHE.get(key)
    if edges is None:
        orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
        li = spread(load_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"]))
        edges = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .select(
                (F.col("o_custkey") * 2).alias("src"),
                (F.col("l_suppkey") * 2 + 1).alias("dst"),
            )
            .distinct()
            .transform(checkpoint_df)
        )
        _EDGE_CACHE[key] = edges
    return edges


_PR_EDGES_CTE = """
    edges AS MATERIALIZED (
        SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    nodes AS MATERIALIZED (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ),
    outdeg AS MATERIALIZED (
        SELECT src AS node, count(*) AS deg FROM edges GROUP BY src
    )
"""


def _pr_iter_cte(i: int) -> str:
    """One exact-integer PageRank round as a pair of materialized CTEs."""
    prev = f"r{i - 1}"
    return f"""
    contrib{i} AS MATERIALIZED (
        SELECT e.dst AS node, CAST(sum(p.rank // d.deg) AS BIGINT) AS c
        FROM edges e
        JOIN {prev} p ON p.node = e.src
        JOIN outdeg d ON d.node = e.src
        GROUP BY e.dst
    ),
    r{i} AS MATERIALIZED (
        SELECT n.node,
               (CAST({100 - _PR_D_NUM} AS BIGINT) * {_PR_SCALE}) // {_PR_D_DEN}
               + ({_PR_D_NUM} * (coalesce(c.c, 0) + (
                     SELECT CAST(coalesce(sum(p.rank), 0) AS BIGINT)
                     FROM {prev} p LEFT JOIN outdeg d ON d.node = p.node
                     WHERE d.node IS NULL
                 ) // (SELECT count(*) FROM nodes))) // {_PR_D_DEN} AS rank
        FROM nodes n LEFT JOIN contrib{i} c ON c.node = n.node
    )
    """


def pagerank_round(
    nodes: DataFrame,
    edges: DataFrame,
    outdeg: DataFrame,
    ranks: DataFrame,
    n_nodes: int,
    base: int,
) -> DataFrame:
    """ONE PageRank round, returned PRE-checkpoint so its plan is
    assertable (tests/test_plan_quality.py — the per-round
    ``localCheckpoint()`` truncates lineage, which would otherwise make
    a regression planted inside the loop body invisible to the final
    plan's budget).  Dangling mass is one scalar row, exact integer sum —
    it stays IN the plan (broadcast single-row crossJoin), no
    per-iteration driver sync; the contribution aggregate partial-combines
    map-side before the node-grain shuffle."""
    with_deg = ranks.join(outdeg, "node", "left")
    dang = with_deg.filter(F.col("deg").isNull()).agg(
        F.coalesce(F.sum("rank"), F.lit(0)).cast("long").alias("dm")
    )
    contrib = (
        edges.join(
            with_deg.filter(F.col("deg").isNotNull())
            .select(F.col("node").alias("src"), "rank", "deg"),
            "src",
        )
        .select("dst", F.expr("rank div deg").alias("c"))
        .groupBy(F.col("dst").alias("node"))
        .agg(F.sum("c").cast("long").alias("c"))
    )
    return (
        nodes.join(contrib, "node", "left")
        .crossJoin(F.broadcast(dang))
        .select(
            "node",
            (
                F.lit(base)
                + F.expr(
                    f"({_PR_D_NUM} * (coalesce(c, 0) + dm div {n_nodes}))"
                    f" div {_PR_D_DEN}"
                )
            ).cast("long").alias("rank"),
        )
    )


@query(
    "pagerank_trade_graph",
    oracle=f"""
    WITH {_PR_EDGES_CTE.strip()},
    r0 AS MATERIALIZED (SELECT node, CAST({_PR_SCALE} AS BIGINT) AS rank FROM nodes),
    {",".join(_pr_iter_cte(i) for i in range(1, _PR_ITERS + 1))}
    SELECT node, rank AS rank_q, CAST(rk AS INT) AS rk
    FROM (
        SELECT node, rank,
               row_number() OVER (ORDER BY rank DESC, node) AS rk
        FROM r{_PR_ITERS}
    )
    WHERE rk <= 20
    ORDER BY rk
    """,
)
def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 nodes by exact-integer PageRank after 5 rounds (damping
    0.85, uniform dangling-mass redistribution — suppliers have no
    out-edges, so the dangling term is live, not decorative)."""
    # the reused artifacts: materialized ONCE (checkpointed inside
    # _trade_edges), every iteration reads them
    edges = _trade_edges(spark, sf_dir)
    nodes = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst").alias("node"))
    ).distinct().transform(checkpoint_df)
    # out-degree is round-invariant and referenced by BOTH loop-body
    # branches (contribution join + dangling filter): materialize it once
    # so each round reads node-grain state instead of re-aggregating the
    # edge list twice per round
    outdeg = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .transform(checkpoint_df)
    )

    n_nodes = nodes.count()
    base = (100 - _PR_D_NUM) * _PR_SCALE // _PR_D_DEN

    ranks = nodes.select("node", F.lit(_PR_SCALE).cast("long").alias("rank"))
    for _ in range(_PR_ITERS):
        # keep the lineage flat: each round's state is node-grain and
        # becomes the next round's input (iterative-job checkpointing)
        ranks = pagerank_round(nodes, edges, outdeg, ranks, n_nodes, base).transform(checkpoint_df)

    # distributed top-k first (TakeOrderedAndProject — per-partition heads
    # merged on the driver, never a node-grain single-partition sort); the
    # rank window then runs over the 20 surviving rows only
    top = ranks.orderBy(F.desc("rank"), F.asc("node")).limit(20)
    win = F.row_number().over(W.orderBy(F.desc("rank"), F.asc("node")))
    return (
        top.withColumn("rk", win.cast("int"))
        .select("node", F.col("rank").alias("rank_q"), "rk")
        .orderBy("rk")
    )


# --- part co-order graph: parts are adjacent when they appear in the same
# order (the market-basket graph; for corpus work the same shape is the
# doc-pair near-dup graph).  Unlike the bipartite trade graph it has
# triangles and real community structure, so it carries the triangle-count
# and label-propagation ops.  Both engines build it with the identical
# self-join + DISTINCT.
_COORDER_EDGES_CTE = """
    edges AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
"""


def _coorder_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected part co-order edges, stored once as x < y.
    Returned CHECKPOINTED and session-cached (see ``_EDGE_CACHE``)."""
    key = (spark.sparkContext.applicationId, sf_dir, "coorder")
    edges = _EDGE_CACHE.get(key)
    if edges is None:
        li = spread(load_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"]))
        a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("x"))
        b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("y"))
        edges = (
            a.join(b, "ok")
            .filter(F.col("x") < F.col("y"))
            .select("x", "y")
            .distinct()
            .transform(checkpoint_df)
        )
        _EDGE_CACHE[key] = edges
    return edges


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node incident-triangle counts ``(node, n_tri)`` for an
    undirected edge list ``(x, y)`` with x < y and no duplicates."""
    edges = edges.transform(checkpoint_df)
    deg = (
        edges.select(F.col("x").alias("node"))
        .unionAll(edges.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    dx = deg.select(F.col("node").alias("x"), F.col("deg").alias("degx"))
    dy = deg.select(F.col("node").alias("y"), F.col("deg").alias("degy"))
    x_first = (F.col("degx") < F.col("degy")) | (
        (F.col("degx") == F.col("degy")) & (F.col("x") < F.col("y"))
    )
    oriented = (
        edges.join(dx, "x")
        .join(dy, "y")
        .select(
            F.when(x_first, F.col("x")).otherwise(F.col("y")).alias("src"),
            F.when(x_first, F.col("y")).otherwise(F.col("x")).alias("dst"),
        )
        .transform(checkpoint_df)
    )
    e1 = oriented.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = oriented.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = oriented.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tris = e1.join(e2, "b").join(e3, ["a", "c"])
    # one generator instead of a 3-way self-union: the union form
    # compiled the triangle join (the expensive subtree) once per corner
    # branch — 3 evaluations where one suffices (r13, guide §1.2); the
    # exploded row multiset is identical, and the count aggregate is
    # order-insensitive
    return (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )


def lpa_round(dir_edges: DataFrame, labels: DataFrame) -> DataFrame:
    """ONE synchronous label-propagation round, PRE-checkpoint (plan
    assertable — see :func:`pagerank_round`): one edge-volume shuffle
    (join labels on src, groupBy (dst, lab) with map-side partial counts)
    followed by a node-grain argmax AGGREGATE.

    PRECONDITION (ADVICE r13): labels must be NON-NEGATIVE — the argmax
    tie-break negates ``lab``, so a negative label inverts the tie order
    and ``Long.MIN_VALUE`` would overflow.  Every caller in this engine
    seeds labels from node ids (positive); an external caller with signed
    labels must remap them first.

    The argmax is ``max_by(lab, struct(c, -lab))`` rather than a
    row_number window (r13, guide §2.3 "aggregate before you shuffle"):
    the ordering key ``(c, -lab)`` is unique within each node group
    (``lab`` is distinct per (node, lab) vote row), so the aggregate
    picks exactly the window's (c DESC, lab ASC) head — bit-identical
    results (re-verified against the window form at sf0.1: 0 differing
    rows) — while partial-combining map-side and skipping the per-node
    sort a rank window pays.  ``-lab`` is safe: labels are node ids of
    this engine's graphs (positive keys; negation cannot overflow).
    Measured A/B (3 rounds over the sf0.1 co-order edges, min of 3):
    3.9-4.3 s → 3.3 s."""
    votes = (
        dir_edges.join(labels.select(F.col("node").alias("src"), "lab"), "src")
        .groupBy(F.col("dst").alias("node"), "lab")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return votes.groupBy("node").agg(
        F.expr("max_by(lab, struct(c, -lab))").alias("lab")
    )


def label_propagation(
    dir_edges: DataFrame, iters: int, checkpoint_edges: bool = True
) -> DataFrame:
    """Synchronous min-tie-break label propagation: ``iters`` rounds over a
    DIRECTED edge list ``(src, dst)`` (an undirected graph supplies both
    directions); returns ``(node, lab)`` for every node with in-edges.

    ``checkpoint_edges=False`` skips the eager edge materialization — the
    right call when ``dir_edges`` is already a cheap projection over a
    checkpointed leaf (the engine's co-order path: the both-directions
    union over the session edge checkpoint).  Measured (r14, interleaved
    min-of-3 at sf0.1): materializing the 2x-edges union cost 0.3-0.65 s
    per run over letting the 3 round joins scan the leaf lazily."""
    if checkpoint_edges:
        dir_edges = dir_edges.transform(checkpoint_df)
    labels = dir_edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lab")
    )
    for _ in range(iters):
        labels = lpa_round(dir_edges, labels).transform(checkpoint_df)
    return labels


@query(
    "graph_triangle_count",
    oracle=f"""
    WITH {_COORDER_EDGES_CTE.strip()},
    deg AS MATERIALIZED (
        SELECT node, count(*) AS deg FROM (
            SELECT x AS node, y FROM edges UNION ALL SELECT y, x FROM edges
        ) GROUP BY node
    ),
    oriented AS MATERIALIZED (
        SELECT CASE WHEN (dx.deg, e.x) < (dy.deg, e.y) THEN e.x ELSE e.y END AS src,
               CASE WHEN (dx.deg, e.x) < (dy.deg, e.y) THEN e.y ELSE e.x END AS dst
        FROM edges e
        JOIN deg dx ON dx.node = e.x
        JOIN deg dy ON dy.node = e.y
    ),
    tris AS MATERIALIZED (
        SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM oriented e1
        JOIN oriented e2 ON e2.src = e1.dst
        JOIN oriented e3 ON e3.src = e1.src AND e3.dst = e2.dst
    ),
    per_node AS (
        SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
            SELECT a AS node FROM tris
            UNION ALL SELECT b FROM tris
            UNION ALL SELECT c FROM tris
        ) GROUP BY node
    )
    SELECT node, n_tri, CAST(rk AS INT) AS rk
    FROM (
        SELECT node, n_tri,
               row_number() OVER (ORDER BY n_tri DESC, node) AS rk
        FROM per_node
    )
    WHERE rk <= 20
    ORDER BY rk
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by incident-triangle count in the co-order graph.

    The classic O(m^1.5) distributed algorithm: orient every undirected
    edge from the lower-(degree, id) endpoint to the higher, so each
    triangle is enumerated exactly once and the wedge join's fanout is
    bounded by the oriented out-degree ≤ O(sqrt(m)) — the orientation is
    what keeps the e1⋈e2 intermediate from exploding on hub nodes at
    100 TB.  All three joins are equi-joins on node keys (shuffle,
    map-side combinable); the oriented edge list is materialized once and
    reused by all three legs (at scale: a persisted table; here a local
    checkpoint).
    """
    per_node = triangle_counts(_coorder_edges(spark, sf_dir))
    # distributed top-k first, rank window over the 20 survivors only
    top = per_node.orderBy(F.desc("n_tri"), F.asc("node")).limit(20)
    win = F.row_number().over(W.orderBy(F.desc("n_tri"), F.asc("node")))
    return (
        top.withColumn("rk", win.cast("int"))
        .select("node", "n_tri", "rk")
        .orderBy("rk")
    )


_LPA_ITERS = 3


def _lpa_iter_cte(i: int) -> str:
    """One synchronous label-propagation round: every node adopts the most
    frequent neighbour label, ties broken by the smaller label."""
    prev = f"l{i - 1}"
    return f"""
    votes{i} AS MATERIALIZED (
        SELECT d.dst AS node, p.lab, count(*) AS c
        FROM dir_edges d JOIN {prev} p ON p.node = d.src
        GROUP BY d.dst, p.lab
    ),
    l{i} AS MATERIALIZED (
        SELECT node, lab FROM (
            SELECT node, lab,
                   row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rn
            FROM votes{i}
        ) WHERE rn = 1
    )
    """


@query(
    "graph_label_propagation",
    oracle=f"""
    WITH {_COORDER_EDGES_CTE.strip()},
    dir_edges AS MATERIALIZED (
        SELECT x AS src, y AS dst FROM edges UNION ALL SELECT y, x FROM edges
    ),
    l0 AS MATERIALIZED (
        SELECT DISTINCT src AS node, src AS lab FROM dir_edges
    ),
    {",".join(_lpa_iter_cte(i) for i in range(1, _LPA_ITERS + 1))}
    SELECT community, sz, CAST(rk AS INT) AS rk
    FROM (
        SELECT lab AS community, CAST(count(*) AS BIGINT) AS sz,
               row_number() OVER (ORDER BY count(*) DESC, lab) AS rk
        FROM l{_LPA_ITERS}
        GROUP BY lab
    )
    WHERE rk <= 20
    ORDER BY rk
    """,
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 communities (by size) after 3 synchronous label-propagation
    rounds over the part co-order graph.

    Synchronous LPA with a deterministic vote — most frequent neighbour
    label, smaller label on ties — so the K-round DuckDB replay is exact
    (no float scores at all).  Each round is one edge-volume shuffle
    (join labels on src, groupBy (dst, lab) with map-side partial counts)
    followed by a node-grain argmax window; label state is node-grain and
    checkpointed per round exactly like the PageRank loop above.  This is
    the semi-supervised label-spreading shape used to impute quality or
    domain labels across a near-dup graph at corpus scale.
    """
    edges = _coorder_edges(spark, sf_dir)
    dir_edges = edges.select(F.col("x").alias("src"), F.col("y").alias("dst")).unionAll(
        edges.select(F.col("y").alias("src"), F.col("x").alias("dst"))
    )
    labels = label_propagation(dir_edges, _LPA_ITERS, checkpoint_edges=False)
    sizes = labels.groupBy(F.col("lab").alias("community")).agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    # distributed top-k first, rank window over the 20 survivors only
    top = sizes.orderBy(F.desc("sz"), F.asc("community")).limit(20)
    cwin = F.row_number().over(W.orderBy(F.desc("sz"), F.asc("community")))
    return (
        top.withColumn("rk", cwin.cast("int"))
        .select("community", "sz", "rk")
        .orderBy("rk")
    )


# --- multi-source BFS distances: hop distance from a deterministic seed
# set (the 3 lowest node ids) to every node of the co-order graph.  This
# is the nearest-seed assignment used for graph-partitioned corpus
# sharding (assign every doc of a near-dup graph to its closest curated
# seed) and the building block of landmark/seed-distance features.
# All-integer by construction — no float anywhere, so the K-round DuckDB
# replay is bit-identical.
_BFS_ROUNDS = 3
_BFS_N_SOURCES = 3


def _bfs_iter_cte(i: int) -> str:
    """One BFS round: expand only the previous FRONTIER (nodes settled at
    exactly dist i-1 — unit weights mean settled distances never improve),
    then fold new candidates into the dist map with a min-aggregate."""
    prev = f"d{i - 1}"
    return f"""
    d{i} AS MATERIALIZED (
        SELECT node, min(dist) AS dist FROM (
            SELECT node, dist FROM {prev}
            UNION ALL
            SELECT e.dst AS node, p.dist + 1 AS dist
            FROM dir_edges e JOIN {prev} p
              ON p.node = e.src AND p.dist = {i - 1}
        ) GROUP BY node
    )
    """


def bfs_round(dir_edges: DataFrame, dist: DataFrame, i: int) -> DataFrame:
    """ONE BFS round, PRE-checkpoint (plan assertable — see
    :func:`pagerank_round`): expand only the previous FRONTIER (nodes
    settled at exactly dist ``i - 1``), then fold candidates into the
    dist map with an exact integer min-aggregate (map-side combinable)."""
    frontier = dist.filter(F.col("dist") == i - 1).select(
        F.col("node").alias("src"), "dist"
    )
    cand = dir_edges.join(frontier, "src").select(
        F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist")
    )
    return (
        dist.unionAll(cand)
        .groupBy("node")
        .agg(F.min("dist").cast("int").alias("dist"))
    )


@query(
    "graph_bfs_distances",
    oracle=f"""
    WITH {_COORDER_EDGES_CTE.strip()},
    dir_edges AS MATERIALIZED (
        SELECT x AS src, y AS dst FROM edges UNION ALL SELECT y, x FROM edges
    ),
    nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM dir_edges),
    d0 AS MATERIALIZED (
        SELECT node, 0 AS dist FROM nodes ORDER BY node LIMIT {_BFS_N_SOURCES}
    ),
    {",".join(_bfs_iter_cte(i) for i in range(1, _BFS_ROUNDS + 1))}
    SELECT dist, CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(node) AS BIGINT) AS id_checksum
    FROM (
        SELECT n.node, CAST(coalesce(d.dist, -1) AS INT) AS dist
        FROM nodes n LEFT JOIN d{_BFS_ROUNDS} d USING (node)
    )
    GROUP BY dist ORDER BY dist
    """,
)
def graph_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-distance histogram (with node-id checksums) of a 3-round
    multi-source BFS from the 3 lowest-id nodes of the co-order graph;
    unreached nodes report ``dist = -1``.

    Scale notes: each round joins the edge list against the FRONTIER only
    (nodes settled at exactly the previous distance), not the whole dist
    map — with unit weights a settled distance never improves, so the
    join volume per round is bounded by the frontier's out-edge count,
    the Pregel/GraphX BFS shape.  The dist map is node-grain, merged by
    an exact integer min-aggregate (map-side combinable), and
    checkpointed per round like the PageRank loop above.  Nothing
    data-sized is broadcast; the seed set is |3| by construction.
    """
    edges = _coorder_edges(spark, sf_dir)
    dir_edges = edges.select(F.col("x").alias("src"), F.col("y").alias("dst")).unionAll(
        edges.select(F.col("y").alias("src"), F.col("x").alias("dst"))
    ).transform(checkpoint_df)
    nodes = dir_edges.select(F.col("src").alias("node")).distinct().transform(checkpoint_df)
    dist = (
        nodes.orderBy("node")
        .limit(_BFS_N_SOURCES)
        .select("node", F.lit(0).cast("int").alias("dist"))
    )
    for i in range(1, _BFS_ROUNDS + 1):
        dist = bfs_round(dir_edges, dist, i).transform(checkpoint_df)
    return (
        nodes.join(dist, "node", "left")
        .select("node", F.coalesce("dist", F.lit(-1)).cast("int").alias("dist"))
        .groupBy("dist")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("node").cast("long").alias("id_checksum"),
        )
        .orderBy("dist")
    )


# --- HITS (Kleinberg hubs & authorities) on the same trade graph: the
# OTHER classical link-analysis scorer (crawl frontier quality uses both
# authority and hub signals).  The graph is bipartite by construction
# (customers=src=hubs, suppliers=dst=authorities), so HITS converges to
# the dominant left/right singular vectors of the adjacency matrix.
#
# Exactness: like PageRank, everything runs on an integer grid.  Each
# half-round is contribution-sum -> L1 renormalization to (n_side *
# SCALE) total mass, computed as raw_i * (n_side * SCALE) // sum(raw)
# with the product in 128-bit integers (DECIMAL(38,0) in Spark, HUGEINT
# in DuckDB — both floor-divide positives identically), so no round
# ever overflows BIGINT state: normalized scores are <= n_side * SCALE
# (~1e13 here) and raw sums stay < 2^63 for graphs up to ~1e5 nodes at
# SCALE=1e8; at 1e9 nodes drop SCALE to 1e4 (the PageRank headroom note).
_HITS_ITERS = 3
_HITS_SCALE = 100_000_000


def _hits_norm_expr(total_col: str, n_scale: int) -> str:
    return (
        f"CAST((CAST(raw AS DECIMAL(38,0)) * CAST({n_scale} AS DECIMAL(38,0))) "
        f"div CAST({total_col} AS DECIMAL(38,0)) AS BIGINT)"
    )


def hits_contrib(
    edges: DataFrame, scores: DataFrame, from_col: str, to_col: str
) -> DataFrame:
    """The HITS contribution sum (pre-checkpoint, plan-assertable): the
    edge join shuffles edge-volume rows with map-side partial sums into
    ``(node, raw)`` on the ``to`` side."""
    return (
        edges.join(scores.withColumnRenamed("node", from_col), from_col)
        .groupBy(F.col(to_col).alias("node"))
        .agg(F.sum("s").cast("long").alias("raw"))
    )


def hits_normalize(raw: DataFrame, n_scale) -> DataFrame:
    """L1-renormalize ``(node, raw)`` to total mass ``n_scale`` with an
    exact 128-bit floor division.  The normalizer is ONE scalar row
    broadcast back (no driver sync).  ``n_scale`` is an int literal or a
    ``(one_row_df, column)`` pair — the in-plan form (r13): the target
    mass rides the same broadcast as the normalizer instead of a driver
    ``count()`` round trip."""
    tot = raw.agg(F.sum("raw").cast("long").alias("tot"))
    if isinstance(n_scale, tuple):
        n_df, n_col = n_scale
        tot = tot.crossJoin(F.broadcast(n_df.select(n_col)))
        n_scale = n_col
    return raw.crossJoin(F.broadcast(tot)).select(
        "node", F.expr(_hits_norm_expr("tot", n_scale)).alias("s")
    )


def hits_half_round(
    edges: DataFrame, scores: DataFrame, from_col: str, to_col: str, n_scale
) -> DataFrame:
    """ONE HITS half-round: contribution sum, checkpointed at node grain
    (the scalar normalizer and the score output BOTH read it — without
    the materialization the edge-join aggregate compiles twice per
    half-round), then the broadcast L1 renormalization."""
    raw = hits_contrib(edges, scores, from_col, to_col).transform(checkpoint_df)
    return hits_normalize(raw, n_scale)


def _hits_iter_ctes(i: int, na_scale_sql: str, nh_scale_sql: str) -> str:
    prev_h = f"h{i - 1}"
    return f"""
    a{i}_raw AS MATERIALIZED (
        SELECT e.dst AS node, CAST(sum(p.s) AS BIGINT) AS raw
        FROM edges e JOIN {prev_h} p ON p.node = e.src GROUP BY e.dst
    ),
    a{i} AS MATERIALIZED (
        SELECT node, CAST((raw::HUGEINT * ({na_scale_sql})::HUGEINT)
               // (SELECT sum(raw)::HUGEINT FROM a{i}_raw) AS BIGINT) AS s
        FROM a{i}_raw
    ),
    h{i}_raw AS MATERIALIZED (
        SELECT e.src AS node, CAST(sum(p.s) AS BIGINT) AS raw
        FROM edges e JOIN a{i} p ON p.node = e.dst GROUP BY e.src
    ),
    h{i} AS MATERIALIZED (
        SELECT node, CAST((raw::HUGEINT * ({nh_scale_sql})::HUGEINT)
               // (SELECT sum(raw)::HUGEINT FROM h{i}_raw) AS BIGINT) AS s
        FROM h{i}_raw
    )"""


_HITS_NA = f"(SELECT count(*) FROM (SELECT DISTINCT dst FROM edges)) * {_HITS_SCALE}"
_HITS_NH = f"(SELECT count(*) FROM (SELECT DISTINCT src FROM edges)) * {_HITS_SCALE}"


@query(
    "graph_hits_scores",
    oracle=f"""
    WITH {_PR_EDGES_CTE.strip().rstrip()},
    h0 AS MATERIALIZED (
        SELECT DISTINCT src AS node, CAST({_HITS_SCALE} AS BIGINT) AS s FROM edges
    ),
    {",".join(_hits_iter_ctes(i, _HITS_NA, _HITS_NH) for i in range(1, _HITS_ITERS + 1))},
    topa AS (
        SELECT 'auth' AS side, node, s AS score_q,
               row_number() OVER (ORDER BY s DESC, node) AS rk
        FROM a{_HITS_ITERS}
    ),
    toph AS (
        SELECT 'hub' AS side, node, s AS score_q,
               row_number() OVER (ORDER BY s DESC, node) AS rk
        FROM h{_HITS_ITERS}
    )
    SELECT side, node, score_q, CAST(rk AS INT) AS rk
    FROM (SELECT * FROM topa WHERE rk <= 10 UNION ALL SELECT * FROM toph WHERE rk <= 10)
    ORDER BY side, rk
    """,
)
def graph_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 authorities and top-10 hubs after {K} exact-integer HITS
    rounds on the customer→supplier graph (cites the same edge builder
    as pagerank_trade_graph; reference has no link analysis — this is
    the crawl-curation beyond-parity family)."""
    edges = _trade_edges(spark, sf_dir)
    # both L1 target masses in ONE tiny checkpointed job (r13, guide §5:
    # no driver count() round trips in the query path — the scalars ride
    # the normalize broadcast in-plan; previously two separate counts)
    n_df = edges.agg(
        (F.countDistinct("dst").cast("long") * _HITS_SCALE).alias("na_sc"),
        (F.countDistinct("src").cast("long") * _HITS_SCALE).alias("nh_sc"),
    ).transform(checkpoint_df)
    h = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.lit(_HITS_SCALE).cast("long").alias("s"))
    )
    # no loop-level checkpoint: each half-round already materializes its
    # contribution table (hits_half_round), and the normalization on top
    # of that checkpoint is one narrow broadcast-projection — keeping it
    # lazy halves the per-round materializations (12 -> 6)
    a = None
    for _ in range(_HITS_ITERS):
        a = hits_half_round(edges, h, "src", "dst", (n_df, "na_sc"))
        h = hits_half_round(edges, a, "dst", "src", (n_df, "nh_sc"))

    def topk(scores: DataFrame, side: str) -> DataFrame:
        top = scores.orderBy(F.desc("s"), F.asc("node")).limit(10)
        win = W.orderBy(F.desc("s"), F.asc("node"))
        return top.select(
            F.lit(side).alias("side"),
            "node",
            F.col("s").alias("score_q"),
            F.row_number().over(win).cast("int").alias("rk"),
        )

    return topk(a, "auth").unionAll(topk(h, "hub")).orderBy("side", "rk")


# --- link prediction on the co-order graph: Resource Allocation index
# (Zhou/Lu/Zhang 2009 — the top performer of the classical local
# indices, and EXACT on an integer grid, unlike Adamic-Adar whose
# 1/ln(deg) weights would knife-edge between engines): for a focal
# item, score every distance-2 non-neighbour by sum(1/deg(z)) over the
# common neighbours z.  The corpus analog is "related items" / crawl
# frontier expansion.  Work is bounded by the focal wedge volume, not
# the graph's (the focal predicate pushes into the first adjacency
# scan) — the serving shape of a per-entity recommendation pass.
_RA_FOCAL_MOD = 100
_RA_FOCAL_REM = 7
_RA_SCALE = 1_000_000
_RA_TOPK = 5


@query(
    "link_prediction_ra",
    oracle=f"""
    WITH {_COORDER_EDGES_CTE.strip()},
    adj AS MATERIALIZED (
        SELECT x AS a, y AS b FROM edges UNION ALL SELECT y, x FROM edges
    ),
    deg AS MATERIALIZED (SELECT a AS node, count(*) AS deg FROM adj GROUP BY a),
    wedges AS (
        SELECT fa.a AS f, sb.b AS c, fa.b AS z
        FROM adj fa JOIN adj sb ON sb.a = fa.b
        WHERE fa.a % {_RA_FOCAL_MOD} = {_RA_FOCAL_REM} AND sb.b <> fa.a
    ),
    scored AS (
        SELECT w.f, w.c,
               CAST(sum({_RA_SCALE} // d.deg) AS BIGINT) AS ra_q,
               CAST(count(*) AS BIGINT) AS cn
        FROM wedges w JOIN deg d ON d.node = w.z
        WHERE NOT EXISTS (
            SELECT 1 FROM adj e WHERE e.a = w.f AND e.b = w.c
        )
        GROUP BY w.f, w.c
    )
    SELECT f, c, ra_q, cn, CAST(rk AS INT) AS rk
    FROM (
        SELECT *, row_number() OVER (PARTITION BY f ORDER BY ra_q DESC, c) AS rk
        FROM scored
    )
    WHERE rk <= {_RA_TOPK}
    ORDER BY f, rk
    """,
)
def link_prediction_ra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} predicted links per focal item: ``(f, c, ra_q, cn, rk)``
    — RA score on the 1e-6 integer grid plus the common-neighbour
    count, existing edges anti-joined away."""
    edges = _coorder_edges(spark, sf_dir)
    adj = edges.select(F.col("x").alias("a"), F.col("y").alias("b")).unionAll(
        edges.select(F.col("y").alias("a"), F.col("x").alias("b"))
    )
    deg = adj.groupBy(F.col("a").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    focal = adj.filter(
        F.col("a") % _RA_FOCAL_MOD == _RA_FOCAL_REM
    ).select(F.col("a").alias("f"), F.col("b").alias("z"))
    hop2 = adj.select(F.col("a").alias("z"), F.col("b").alias("c"))
    wedges = focal.join(hop2, "z").filter(F.col("c") != F.col("f"))
    scored = (
        wedges.join(deg.withColumnRenamed("node", "z"), "z")
        .join(
            adj.select(F.col("a").alias("f"), F.col("b").alias("c")),
            ["f", "c"],
            "left_anti",
        )
        .groupBy("f", "c")
        .agg(
            F.sum(F.expr(f"{_RA_SCALE} div deg")).cast("long").alias("ra_q"),
            F.count(F.lit(1)).cast("long").alias("cn"),
        )
    )
    win = W.partitionBy("f").orderBy(F.desc("ra_q"), F.asc("c"))
    return (
        scored.withColumn("rk", F.row_number().over(win).cast("int"))
        .filter(F.col("rk") <= _RA_TOPK)
        .select("f", "c", "ra_q", "cn", "rk")
        .orderBy("f", "rk")
    )


# --- personalized PageRank (the seed-biased variant: crawl-seed
# expansion, trust propagation, "related to THESE domains" scoring).
# Same exact-integer contract as the global PageRank above, with two
# structural differences that matter at scale: (1) the rank state is
# SPARSE — r0 lives only on the seed set and each round's state only on
# reached nodes, so early rounds shuffle frontier-volume rows, not
# graph-volume; (2) the teleport/reset and the dangling mass both
# return to the SEED set, not the whole node table.
_PPR_ITERS = 4
#: seeds = customer nodes with custkey % 50 == 7 (node ids are
#: custkey * 2, so src % 100 == 14) — a bounded, deterministic seed set
_PPR_SEED_SQL = "src % 100 = 14"


def _ppr_iter_cte(i: int) -> str:
    prev = f"p{i - 1}"
    base = (100 - _PR_D_NUM) * _PR_SCALE // _PR_D_DEN
    return f"""
    pc{i} AS MATERIALIZED (
        SELECT e.dst AS node, CAST(sum(p.rank // d.deg) AS BIGINT) AS c
        FROM edges e
        JOIN {prev} p ON p.node = e.src
        JOIN outdeg d ON d.node = e.src
        GROUP BY e.dst
    ),
    pd{i} AS MATERIALIZED (
        SELECT CAST(coalesce(sum(p.rank), 0) AS BIGINT) AS dm
        FROM {prev} p LEFT JOIN outdeg d ON d.node = p.node
        WHERE d.node IS NULL
    ),
    p{i} AS MATERIALIZED (
        SELECT coalesce(c.node, s.node) AS node,
               CAST(CASE WHEN s.node IS NOT NULL
                    THEN {base}
                         + ({_PR_D_NUM} * (coalesce(c.c, 0)
                            + (SELECT dm FROM pd{i}) // (SELECT count(*) FROM seeds)))
                           // {_PR_D_DEN}
                    ELSE ({_PR_D_NUM} * c.c) // {_PR_D_DEN}
               END AS BIGINT) AS rank
        FROM pc{i} c FULL OUTER JOIN seeds s ON s.node = c.node
    )
    """


def ppr_round(
    edges: DataFrame,
    outdeg: DataFrame,
    seeds: DataFrame,
    ranks: DataFrame,
    n_seeds: int,
    base: int,
) -> DataFrame:
    """ONE personalized-PageRank round, pre-checkpoint (plan-assertable).
    The rank state stays SPARSE: the output holds only reached nodes
    (contribution targets) plus the seed set.  Dangling mass is one
    scalar row broadcast back into the seed share; the contribution
    aggregate partial-combines map-side before the node-grain shuffle."""
    with_deg = ranks.join(outdeg, "node", "left")
    dang = with_deg.filter(F.col("deg").isNull()).agg(
        F.coalesce(F.sum("rank"), F.lit(0)).cast("long").alias("dm")
    )
    contrib = (
        edges.join(
            with_deg.filter(F.col("deg").isNotNull())
            .select(F.col("node").alias("src"), "rank", "deg"),
            "src",
        )
        .select("dst", F.expr("rank div deg").alias("c"))
        .groupBy(F.col("dst").alias("node"))
        .agg(F.sum("c").cast("long").alias("c"))
    )
    return (
        contrib.join(seeds.withColumn("is_seed", F.lit(True)), "node", "full_outer")
        .crossJoin(F.broadcast(dang))
        .select(
            "node",
            F.when(
                F.col("is_seed"),
                F.lit(base)
                + F.expr(
                    f"({_PR_D_NUM} * (coalesce(c, 0) + dm div {n_seeds}))"
                    f" div {_PR_D_DEN}"
                ),
            )
            .otherwise(F.expr(f"({_PR_D_NUM} * c) div {_PR_D_DEN}"))
            .cast("long")
            .alias("rank"),
        )
    )


@query(
    "personalized_pagerank",
    oracle=f"""
    WITH edges AS MATERIALIZED (
        SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    outdeg AS MATERIALIZED (
        SELECT src AS node, count(*) AS deg FROM edges GROUP BY src
    ),
    seeds AS MATERIALIZED (
        SELECT DISTINCT src AS node FROM edges WHERE {_PPR_SEED_SQL}
    ),
    p0 AS MATERIALIZED (
        SELECT node, CAST({_PR_SCALE} AS BIGINT) AS rank FROM seeds
    ),
    {",".join(_ppr_iter_cte(i) for i in range(1, _PPR_ITERS + 1))}
    SELECT node, rank AS rank_q, CAST(rk AS INT) AS rk
    FROM (
        SELECT node, rank,
               row_number() OVER (ORDER BY rank DESC, node) AS rk
        FROM p{_PPR_ITERS}
    )
    WHERE rk <= 20
    ORDER BY rk
    """,
)
def personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 nodes by exact-integer personalized PageRank after
    {K} rounds from a bounded customer seed set — teleport and dangling
    mass both return to the seeds (Haveliwala topic-sensitive form)."""
    edges = _trade_edges(spark, sf_dir)
    outdeg = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .transform(checkpoint_df)
    )
    seeds = (
        edges.filter(F.expr(_PPR_SEED_SQL))
        .select(F.col("src").alias("node"))
        .distinct()
        .transform(checkpoint_df)
    )
    n_seeds = seeds.count()
    base = (100 - _PR_D_NUM) * _PR_SCALE // _PR_D_DEN
    ranks = seeds.select("node", F.lit(_PR_SCALE).cast("long").alias("rank"))
    for _ in range(_PPR_ITERS):
        ranks = ppr_round(edges, outdeg, seeds, ranks, n_seeds, base).transform(checkpoint_df)
    top = ranks.orderBy(F.desc("rank"), F.asc("node")).limit(20)
    win = F.row_number().over(W.orderBy(F.desc("rank"), F.asc("node")))
    return (
        top.withColumn("rk", win.cast("int"))
        .select("node", F.col("rank").alias("rank_q"), "rk")
        .orderBy("rk")
    )


# --- bipartite order-part components (r11): the BATCH twin of
# streaming_connected_components — same sparse (order, part) edge set
# (high-quantity lineitems), same recursive min-reachability oracle, so
# the pair pins batch ≡ incremental ≡ oracle the way every other
# maintenance family does.  Solve is the shared components_from_edges
# (driver union-find on the sparse graph, distributed min-label loop
# above the cap). ---
from columnflow_spark.queries.streaming import (  # noqa: E402
    _SCC_PART_OFF,
    _SCC_QTY_MIN,
)


@query(
    "order_part_components",
    oracle=f"""
    WITH RECURSIVE
    e AS (
        SELECT DISTINCT l_orderkey AS a, l_partkey + {_SCC_PART_OFF} AS b
        FROM lineitem WHERE l_quantity >= {_SCC_QTY_MIN}
    ),
    sym AS (SELECT a AS s, b AS t FROM e UNION ALL SELECT b AS s, a AS t FROM e),
    nodes AS (SELECT DISTINCT s AS n FROM sym),
    reach AS (
        SELECT n AS src, n AS node FROM nodes
        UNION
        SELECT r.src, sym.t AS node FROM reach r JOIN sym ON sym.s = r.node
    ),
    comp AS (SELECT src, min(node) AS c FROM reach GROUP BY src)
    SELECT o.o_orderkey AS order_id,
           CAST(coalesce(c.c, o.o_orderkey) AS BIGINT) AS component
    FROM orders o LEFT JOIN comp c ON c.src = o.o_orderkey
    ORDER BY order_id
    """,
)
def order_part_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the sparse bipartite (order, part) graph:
    orders cluster through shared high-quantity parts — per-order
    component = min node id reachable (orders dominate the min: part
    node ids are offset above every order key)."""
    from columnflow_spark.queries.mmdata import components_from_edges

    edges = (
        spread(load_table(
            spark, sf_dir, "lineitem", columns=["l_orderkey", "l_partkey", "l_quantity"]
        ))
        .filter(F.col("l_quantity") >= _SCC_QTY_MIN)
        .select(
            F.col("l_orderkey").alias("d1"),
            (F.col("l_partkey") + _SCC_PART_OFF).alias("d2"),
        )
        .distinct()
        .transform(checkpoint_df)
    )
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey"]).select(
        F.col("o_orderkey").alias("doc_id")
    )
    comp = components_from_edges(orders, edges)
    return comp.select(
        F.col("doc_id").alias("order_id"),
        F.col("component").cast("long").alias("component"),
    ).orderBy("order_id")
