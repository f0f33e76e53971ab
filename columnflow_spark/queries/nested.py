"""Nested-collection operators (SURVEY §2.2/2.3/2.6: object masks, sorts,
leading-object selection, within-event reductions and combinatorics).

Each query runs on the nested event table (orders + items array built by
:func:`columnflow_spark.pipeline_demo.build_nested_events`) using
higher-order array functions — the Spark-native form of awkward's jagged
ops — while the oracle computes the same semantics with flat SQL over the
raw tables.  Matching results prove the nested re-expression is faithful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnflow_spark.core.routes import EMPTY_FLOAT, Route
from columnflow_spark.functions import arrays as A
from columnflow_spark.pipeline_demo import build_nested_events
from columnflow_spark.queries import query


# --- within-event reductions: ak.sum/ak.num analogs (reference
# production/example.py:35 ht; selection/example.py:37 ak.num) ---
@query(
    "nested_ht_per_event",
    oracle="""
    SELECT
        o.o_orderkey AS okey,
        coalesce(cnt.n_items, 0) AS n_items,
        round(coalesce(cnt.ht, 0.0), 4) AS ht,
        round(coalesce(cnt.max_price, -99999.0), 4) AS max_price
    FROM orders o
    LEFT JOIN (
        SELECT
            l_orderkey,
            count(*) AS n_items,
            sum(l_extendedprice) AS ht,
            max(l_extendedprice) AS max_price
        FROM lineitem
        GROUP BY l_orderkey
    ) cnt ON cnt.l_orderkey = o.o_orderkey
    """,
)
def nested_ht_per_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = build_nested_events(spark, sf_dir)
    return events.select(
        F.col("o_orderkey").alias("okey"),
        A.num(F.col("items")).alias("n_items"),
        F.round(A.asum(F.col("items.price")), 4).alias("ht"),
        F.round(F.coalesce(A.amax(F.col("items.price")), F.lit(EMPTY_FLOAT)), 4).alias("max_price"),
    )


# --- leading-object selection via object sort + Route index with null fill
# (reference Route slicing columnar_util.py:499; sorted_indices columnar_util.py:1134) ---
@query(
    "nested_leading_prices",
    oracle="""
    WITH ranked AS (
        SELECT
            l_orderkey,
            l_extendedprice,
            row_number() OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC) AS rn
        FROM lineitem
    )
    SELECT
        o.o_orderkey AS okey,
        round(coalesce(r1.l_extendedprice, -99999.0), 4) AS price1,
        round(coalesce(r2.l_extendedprice, -99999.0), 4) AS price2,
        round(coalesce(top2.s, 0.0), 4) AS sum_top2
    FROM orders o
    LEFT JOIN ranked r1 ON r1.l_orderkey = o.o_orderkey AND r1.rn = 1
    LEFT JOIN ranked r2 ON r2.l_orderkey = o.o_orderkey AND r2.rn = 2
    LEFT JOIN (
        SELECT l_orderkey, sum(l_extendedprice) AS s FROM ranked WHERE rn <= 2 GROUP BY l_orderkey
    ) top2 ON top2.l_orderkey = o.o_orderkey
    """,
)
def nested_leading_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = build_nested_events(spark, sf_dir)
    sorted_prices = F.array_sort(F.col("items.price"), lambda a, b: F.when(a > b, -1).when(a < b, 1).otherwise(0))
    events = events.withColumn("price_sorted", sorted_prices)
    return events.select(
        F.col("o_orderkey").alias("okey"),
        F.round(Route("price_sorted[:, 0]").apply(null_value=EMPTY_FLOAT), 4).alias("price1"),
        F.round(Route("price_sorted[:, 1]").apply(null_value=EMPTY_FLOAT), 4).alias("price2"),
        F.round(A.asum(Route("price_sorted[:, :2]").apply()), 4).alias("sum_top2"),
    )


# --- object mask -> sub-collection (reference create_collections_from_masks,
# reduction/util.py:55) ---
@query(
    "nested_object_masks",
    oracle="""
    SELECT
        o.o_orderkey AS okey,
        coalesce(s.n_big, 0) AS n_big,
        round(coalesce(s.big_value, 0.0), 4) AS big_value,
        coalesce(s.has_discounted, FALSE) AS has_discounted
    FROM orders o
    LEFT JOIN (
        SELECT
            l_orderkey,
            count(*) FILTER (WHERE l_quantity >= 25) AS n_big,
            sum(l_extendedprice) FILTER (WHERE l_quantity >= 25) AS big_value,
            bool_or(l_discount > 0.05) AS has_discounted
        FROM lineitem
        GROUP BY l_orderkey
    ) s ON s.l_orderkey = o.o_orderkey
    """,
)
def nested_object_masks(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = build_nested_events(spark, sf_dir)
    big = F.filter("items", lambda x: x["qty"] >= 25)
    return events.select(
        F.col("o_orderkey").alias("okey"),
        F.size(big).alias("n_big"),
        F.round(F.aggregate(big, F.lit(0.0), lambda a, x: a + x["price"]), 4).alias("big_value"),
        F.exists("items", lambda x: x["discount"] > 0.05).alias("has_discounted"),
    )


# --- within-event combinatorics: closest pair (ΔR-matching analog in 1-D:
# sort + adjacent diff replaces the O(n²) metric table, reference
# production/util.py:124 delta_r_match) ---
@query(
    "nested_closest_pair_gap",
    oracle="""
    WITH ranked AS (
        SELECT
            l_orderkey,
            l_extendedprice,
            row_number() OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice) AS rn
        FROM lineitem
    )
    SELECT a.l_orderkey AS okey, round(min(b.l_extendedprice - a.l_extendedprice), 4) AS min_gap
    FROM ranked a
    JOIN ranked b ON a.l_orderkey = b.l_orderkey AND b.rn = a.rn + 1
    GROUP BY a.l_orderkey
    """,
)
def nested_closest_pair_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = build_nested_events(spark, sf_dir)
    prices = F.array_sort(F.col("items.price"))
    tail = F.slice(prices, 2, F.greatest(F.array_size(prices) - 1, F.lit(0)))
    gaps = F.zip_with(prices, tail, lambda a, b: b - a)
    return (
        events.filter(A.num(F.col("items")) >= 2)
        .select(
            F.col("o_orderkey").alias("okey"),
            F.round(F.array_min(gaps), 4).alias("min_gap"),
        )
    )


# --- within-event cartesian product of two sub-collections (reference
# ak.cartesian multi-jagged fills, hist_util.py:111-127) ---
@query(
    "nested_cartesian_pairs",
    oracle="""
    SELECT
        a.l_orderkey AS okey,
        count(*) AS n_pairs,
        round(sum(a.l_extendedprice * b.l_extendedprice), 4) AS sum_prod
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey
     AND a.l_quantity >= 25 AND b.l_quantity < 25
    GROUP BY a.l_orderkey
    """,
)
def nested_cartesian_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = build_nested_events(spark, sf_dir)
    big = F.filter("items", lambda x: x["qty"] >= 25)
    small = F.filter("items", lambda x: x["qty"] < 25)
    pair_prods = F.flatten(
        F.transform(big, lambda a: F.transform(small, lambda b: a["price"] * b["price"]))
    )
    return (
        events.withColumn("pair_prods", pair_prods)
        .filter(F.size("pair_prods") > 0)
        .select(
            F.col("o_orderkey").alias("okey"),
            F.size("pair_prods").alias("n_pairs"),
            F.round(A.asum(F.col("pair_prods")), 4).alias("sum_prod"),
        )
    )


# --- index-following self-lookup within event (reference gen-particle
# parent chains, production/cms/gen_particles.py:51: element_at(coll, idx)) ---
@query(
    "nested_index_lookup",
    oracle="""
    WITH ordered AS (
        SELECT l_orderkey, l_quantity, l_extendedprice,
               row_number() OVER (
                   PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_quantity, l_extendedprice, l_discount, l_returnflag
               ) AS pos,
               count(*) OVER (PARTITION BY l_orderkey) AS n
        FROM lineitem
    )
    SELECT
        cur.l_orderkey AS okey,
        count(*) AS n_with_parent,
        round(sum(par.l_extendedprice), 4) AS parent_price_sum
    FROM ordered cur
    JOIN ordered par ON par.l_orderkey = cur.l_orderkey AND par.pos = cur.pos - 1
    GROUP BY cur.l_orderkey
    """,
)
def nested_index_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # "parent" of object i is object i-1 in the (deterministically sorted)
    # collection; follow the index with try_element_at like GenPart chains
    events = build_nested_events(spark, sf_dir).filter(F.size("items") >= 2)
    # 0-based local index i; parent is i-1, i.e. 1-based index i — follow
    # only valid chains (i >= 1) so every lookup hits
    parent_idx = F.filter(A.local_index(F.col("items")), lambda i: i >= 1)
    parents = F.transform(parent_idx, lambda i: F.element_at(F.col("items"), i))
    return events.select(
        F.col("o_orderkey").alias("okey"),
        (F.size("items") - 1).alias("n_with_parent"),
        F.round(F.aggregate(parents, F.lit(0.0), lambda a, x: a + x["price"]), 4).alias("parent_price_sum"),
    )


# --- greedy match-without-replacement (reference production/util.py:169
# delta_r_match_multiple: sequentially pair each object with its closest
# unused partner).  Inherently sequential per event (SURVEY §7.4 "hard
# parts"), so the Spark form is an Arrow-batched mapInPandas over the
# pre-grouped collection — one shuffle to build the collection, then pure
# per-row Python on ~7-element arrays; never a relational self-join.  The
# oracle unrolls the greedy rounds (max 7 objects -> <= 3 pairs) as
# window-ranked SQL. ---
def _greedy_rounds_sql(rounds: int) -> str:
    """Unroll greedy selection as ``rounds`` window-ranked CTE rounds:
    round r picks the min-(d, la, lb) pair per event among pairs disjoint
    from all earlier picks.  Sequential greedy == iterated min-of-disjoint,
    so this is exact whenever ``rounds >= max matches per event``."""
    ctes = [
        """items AS MATERIALIZED (
        SELECT l_orderkey AS k,
               row_number() OVER (
                   PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice
               ) AS ln,
               l_extendedprice AS p
        FROM lineitem
    )""",
        """p1 AS MATERIALIZED (
        SELECT a.k, a.ln AS la, b.ln AS lb, abs(a.p - b.p) AS d
        FROM items a JOIN items b ON a.k = b.k AND a.ln < b.ln
    )""",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""r{r} AS MATERIALIZED (
        SELECT k, la, lb, d FROM (
            SELECT *, row_number() OVER (PARTITION BY k ORDER BY d, la, lb) AS rn FROM p{r}
        ) WHERE rn = 1
    )"""
        )
        if r < rounds:
            ctes.append(
                f"""p{r + 1} AS MATERIALIZED (
        SELECT p.* FROM p{r} p JOIN r{r} ON p.k = r{r}.k
        WHERE p.la NOT IN (r{r}.la, r{r}.lb) AND p.lb NOT IN (r{r}.la, r{r}.lb)
    )"""
            )
    union = " UNION ALL ".join(f"SELECT * FROM r{r}" for r in range(1, rounds + 1))
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT k AS o_orderkey, la AS ln_a, lb AS ln_b, round(d, 4) AS gap FROM ({union})"
    )


#: 10 rounds cover events with up to 21 objects (sf0.01 max is 13)
_GREEDY_ROUNDS_SQL = _greedy_rounds_sql(10)


@query("greedy_match_pairs", oracle=_GREEDY_ROUNDS_SQL)
def greedy_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnflow_spark.sources import load_table
    from columnflow_spark.sources.tables import spread

    li = load_table(
        spark, sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_extendedprice"]
    )
    # hash-spread on the group key: the groupBy reuses this exchange and the
    # per-event greedy pandas UDF then runs at full core count instead of on
    # a handful of AQE-coalesced post-shuffle partitions
    li = spread(li, "l_orderkey")
    ev = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(F.col("l_linenumber").alias("ln"), F.col("l_extendedprice").alias("p"))
        ).alias("items")
    )

    def gen(batches):
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            kk, aa, bb, dd = [], [], [], []
            for k, items in zip(pdf["l_orderkey"], pdf["items"]):
                # positional object ids: l_linenumber is not unique within
                # an order, so identity is the rank under (ln, price)
                arr = [
                    (pos, p)
                    for pos, (_ln, p) in enumerate(
                        sorted((int(it["ln"]), float(it["p"])) for it in items), start=1
                    )
                ]
                if len(arr) < 2:
                    continue
                cand = sorted(
                    (abs(pa - pb), la, lb)
                    for i, (la, pa) in enumerate(arr)
                    for lb, pb in arr[i + 1:]
                )
                used: set[int] = set()
                for d, la, lb in cand:
                    if la not in used and lb not in used:
                        used.update((la, lb))
                        kk.append(k)
                        aa.append(la)
                        bb.append(lb)
                        dd.append(d)
            yield pd.DataFrame({"o_orderkey": kk, "ln_a": aa, "ln_b": bb, "gap": dd})

    out = ev.mapInPandas(gen, "o_orderkey bigint, ln_a int, ln_b int, gap double")
    return out.withColumn("gap", F.round("gap", 4))


# --- ΔR nearest-neighbour match, relational form (SURVEY §2.4: explode
# both collections -> theta-join on the event key with ΔR < r_max ->
# rank 1 per source object).  The within-row HOF form is
# nested_closest_pair_gap; this is the form that scales when collections
# are large enough that the per-event cartesian must shuffle.  Synthetic
# (eta, phi) coordinates derive from qty/discount so the wrap-around
# delta_phi path is exercised. ---
_DR_MAX = 1.5
_TWO_PI = 6.283185307179586
_PI = 3.141592653589793


@query(
    "delta_r_match_relational",
    oracle=f"""
    WITH src AS (
        SELECT l_orderkey AS k,
               row_number() OVER (
                   PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_quantity, l_extendedprice, l_discount
               ) AS src_idx,
               l_quantity / 10.0 AS eta, l_discount * 50.0 AS phi
        FROM lineitem WHERE l_returnflag = 'R'
    ),
    dst AS (
        SELECT l_orderkey AS k,
               row_number() OVER (
                   PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_quantity, l_extendedprice, l_discount
               ) AS dst_idx,
               l_quantity / 10.0 AS eta, l_discount * 50.0 AS phi
        FROM lineitem WHERE l_returnflag = 'A'
    ),
    pairs AS (
        SELECT s.k, s.src_idx, d.dst_idx,
               sqrt(pow(s.eta - d.eta, 2)
                    + pow(fmod(fmod(s.phi - d.phi + {_PI}, {_TWO_PI}) + {_TWO_PI}, {_TWO_PI}) - {_PI}, 2)) AS dr
        FROM src s JOIN dst d ON s.k = d.k
    )
    SELECT k AS o_orderkey, src_idx, dst_idx, round(dr, 4) AS dr
    FROM (
        SELECT *, row_number() OVER (PARTITION BY k, src_idx ORDER BY dr, dst_idx) AS rk
        FROM pairs WHERE dr < {_DR_MAX}
    ) WHERE rk = 1
    """,
)
def delta_r_match_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from columnflow_spark.functions.math import delta_r
    from columnflow_spark.sources import load_table

    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_returnflag"],
    )
    order = [F.col(c) for c in ("l_linenumber", "l_quantity", "l_extendedprice", "l_discount")]

    def side(flag: str, idx_name: str) -> DataFrame:
        w = W.partitionBy("l_orderkey").orderBy(*order)
        return (
            li.filter(F.col("l_returnflag") == flag)
            .select(
                F.col("l_orderkey").alias("k"),
                F.row_number().over(w).alias(idx_name),
                (F.col("l_quantity") / 10.0).alias(f"eta_{idx_name}"),
                (F.col("l_discount") * 50.0).alias(f"phi_{idx_name}"),
            )
        )

    src, dst = side("R", "src_idx"), side("A", "dst_idx")
    dr = delta_r(
        F.col("eta_src_idx"), F.col("phi_src_idx"), F.col("eta_dst_idx"), F.col("phi_dst_idx")
    )
    pairs = src.join(dst, "k").withColumn("dr", dr).filter(F.col("dr") < _DR_MAX)
    # argmin via min_by, not a window rank: the join output is already
    # hash-partitioned on k, which satisfies the (k, src_idx) grouping
    # (subset rule), so this is a shuffle-free local aggregation with NO
    # per-partition sort; ties break on dst_idx via lexicographic struct
    best = pairs.groupBy("k", "src_idx").agg(
        F.min_by(
            F.struct("dst_idx", "dr"), F.struct(F.col("dr"), F.col("dst_idx"))
        ).alias("b")
    )
    return best.select(
        F.col("k").alias("o_orderkey"),
        "src_idx",
        F.col("b.dst_idx").alias("dst_idx"),
        F.round("b.dr", 4).alias("dr"),
    )


# --- masked scatter-update: embed_with_mask / fill_at / mask_from_indices
# (reference columnar_util.py:1189,1255,1162) — indices selected per event
# (top-2 by price), values updated at exactly those positions, everything
# else untouched.  Spark form: indices via array_sort on (key, idx) structs,
# scatter via transform-with-index + array_contains — all JVM codegen, no
# shuffle beyond the nested table's own event-key exchange. ---
@query(
    "masked_scatter_update",
    oracle="""
    WITH ranked AS (
        SELECT
            l_orderkey,
            l_extendedprice,
            l_discount,
            row_number() OVER (
                PARTITION BY l_orderkey
                ORDER BY l_extendedprice DESC,
                         l_linenumber, l_quantity, l_discount, l_returnflag
            ) AS rn
        FROM lineitem
    ),
    upd AS (
        SELECT
            l_orderkey,
            count(*) FILTER (WHERE rn <= 2) AS n_updated,
            sum(CASE WHEN rn <= 2 THEN l_extendedprice * (1 - l_discount)
                     ELSE l_extendedprice END) AS ht_updated
        FROM ranked
        GROUP BY l_orderkey
    )
    SELECT
        o.o_orderkey AS okey,
        coalesce(u.n_updated, 0) AS n_updated,
        round(coalesce(u.ht_updated, 0.0), 4) AS ht_updated
    FROM orders o
    LEFT JOIN upd u ON u.l_orderkey = o.o_orderkey
    """,
)
def masked_scatter_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = build_nested_events(spark, sf_dir)
    # mask_from_indices: positions of the top-2 items by price (idx asc tiebreak)
    keyed = F.transform(
        "items", lambda x, i: F.struct(x["price"].alias("price"), i.alias("idx"))
    )
    by_price = F.array_sort(
        keyed,
        lambda a, b: (
            F.when(a["price"] > b["price"], -1)
            .when(a["price"] < b["price"], 1)
            .when(a["idx"] < b["idx"], -1)
            .when(a["idx"] > b["idx"], 1)
            .otherwise(0)
        ),
    )
    idxs = F.transform(F.slice(by_price, 1, 2), lambda s: s["idx"])
    events = events.withColumn("upd_idxs", idxs)
    # fill_at / embed_with_mask: scatter-update prices at those indices
    updated = F.transform(
        "items",
        lambda x, i: F.when(
            F.array_contains(F.col("upd_idxs"), i), x["price"] * (1 - x["discount"])
        ).otherwise(x["price"]),
    )
    return events.select(
        F.col("o_orderkey").alias("okey"),
        F.size("upd_idxs").alias("n_updated"),
        F.round(A.asum(updated), 4).alias("ht_updated"),
    )


# --- index-following ancestor-chain walk (reference gen-particle mother
# chains, production/cms/gen_particles.py:51-350): each object stores a
# parent *index* into its own event's collection; walking the chain is
# repeated element_at indexing — an intra-row self-"join" with zero shuffle,
# exactly how genPartIdxMother traversal should run at 100 TB.  Parent
# topology here is the deterministic heap rule parent(p) = (p-1) // 2. ---
@query(
    "ancestor_chain_walk",
    oracle="""
    WITH RECURSIVE items AS (
        SELECT
            l_orderkey AS okey,
            row_number() OVER (
                PARTITION BY l_orderkey
                ORDER BY l_linenumber, l_quantity, l_extendedprice, l_discount, l_returnflag
            ) - 1 AS pos,
            l_extendedprice AS price
        FROM lineitem
    ),
    walk AS (
        SELECT okey, pos AS start_pos, pos AS cur, price, 0 AS d FROM items
        UNION ALL
        SELECT w.okey, w.start_pos, i.pos, i.price, w.d + 1
        FROM walk w
        JOIN items i ON i.okey = w.okey AND i.pos = (w.cur - 1) // 2
        WHERE w.cur > 0
    )
    SELECT
        okey,
        start_pos AS pos,
        round(sum(price), 4) AS chain_sum,
        max(d) AS depth
    FROM walk
    GROUP BY okey, start_pos
    """,
)
def ancestor_chain_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = build_nested_events(spark, sf_dir)
    # items are linenumber-sorted, so array position == pos in the oracle
    flat = events.select(
        F.col("o_orderkey").alias("okey"),
        F.col("items.price").alias("prices"),
        F.posexplode("items").alias("pos", "item"),
    )
    # unrolled chain walk: TPC-H orders hold <= 7 items (depth <= 2); the
    # unroll to 5 levels covers collections up to 63 objects — for deeper
    # chains this expands the same way with more terms, still shuffle-free
    cur = F.col("pos")
    total = F.col("item")["price"]
    depth = F.lit(0)
    for _ in range(5):
        cur = F.when(cur > 0, F.floor((cur - 1) / 2).cast("int")).otherwise(F.lit(-1))
        hit = cur >= 0
        total = total + F.when(hit, F.element_at("prices", cur + 1)).otherwise(F.lit(0.0))
        depth = depth + F.when(hit, 1).otherwise(0)
    return flat.select(
        "okey",
        "pos",
        F.round(total, 4).alias("chain_sum"),
        depth.alias("depth"),
    )
