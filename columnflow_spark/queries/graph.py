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

from columnflow_spark.queries import query
from columnflow_spark.sources import load_table, spread

_PR_ITERS = 5
#: rank unit: 1.0 == 1e9 grid steps (9 exact digits)
_PR_SCALE = 1_000_000_000
#: damping 0.85 as an exact integer rational
_PR_D_NUM, _PR_D_DEN = 85, 100


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customer→supplier edges; node ids namespaced into one
    space (customers even, suppliers odd) since the key ranges overlap."""
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = spread(load_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"]))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )


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
    edges = _trade_edges(spark, sf_dir)
    # the reused artifacts: materialize ONCE, every iteration reads them
    # (at scale: a persisted table; here: a local checkpoint)
    edges = edges.localCheckpoint()
    nodes = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst").alias("node"))
    ).distinct().localCheckpoint()
    outdeg = edges.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))

    n_nodes = nodes.count()
    base = (100 - _PR_D_NUM) * _PR_SCALE // _PR_D_DEN

    ranks = nodes.select("node", F.lit(_PR_SCALE).cast("long").alias("rank"))
    for _ in range(_PR_ITERS):
        with_deg = ranks.join(outdeg, "node", "left")
        # dangling mass: one scalar row, exact integer sum — stays IN the
        # plan (broadcast single-row crossJoin), no per-iteration driver
        # sync
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
        ranks = (
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
        # keep the lineage flat: each round's state is node-grain and
        # becomes the next round's input (iterative-job checkpointing)
        ranks = ranks.localCheckpoint()

    win = F.row_number().over(W.orderBy(F.desc("rank"), F.asc("node")))
    return (
        ranks.withColumn("rk", win.cast("int"))
        .filter(F.col("rk") <= 20)
        .select("node", F.col("rank").alias("rank_q"), "rk")
        .orderBy("rk")
    )
