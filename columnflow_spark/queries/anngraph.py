"""Graph-based ANN serving — the DiskANN / HNSW shape (VERDICT r9 next
#2): a persisted bounded-degree neighbor graph plus a seeded,
fully-deterministic best-first beam search.

Why this exists next to IVF/PQ/OPQ: at billions of vectors a routed
graph probe reads far fewer vectors than cell probing at equal recall —
the industry-default serving index (Malkov & Yashunin 2018 HNSW;
Subramanya et al. 2019 DiskANN).  This implementation re-expresses the
shape Spark-first and keeps every decision on an exact integer grid so
the whole walk replays in the DuckDB oracle:

- **similarity** is the dot product of grid-quantized components
  (``round(x * 1000)`` → BIGINT; the corpus embeddings are
  unit-normalized, so grid dot IS grid cosine up to a constant) — every
  comparison is exact-integer with ``vec_id`` tie-breaks; no float
  knife edges anywhere in build or search.
- **build**: multi-band hyperplane-LSH candidate pairs (4 bands x 5
  sign bits — the sub-quadratic candidate generator, same trade as
  ``dedup_embedding_cosine_lsh``), per-node top-``R`` out-edges by grid
  dot, symmetrized and re-capped at ``DEG_CAP`` (the NSW
  symmetrization).  All window ranks partition on ``src`` —
  corpus-cardinality keys, never a catalog-bounded funnel.
- **pages**: each node's row carries its grid vector AND its neighbor
  ids — the DiskANN page layout, so one fetch per visited node serves
  both scoring and expansion.
- **search**: entry points are the frozen IVF centroid nodes (every
  64th vector — the same routing layer the IVF family uses); the beam
  then runs ``ROUNDS`` synchronous best-first steps: score the
  entrants' pages, keep the top-``W`` visited per query, expand the
  neighbors of nodes newly in the beam.  A node can only enter the beam
  the round it is scored (visited only grows, so ranks only worsen),
  which makes the per-round state bounded by |queries| x W x DEG_CAP
  and the whole walk expressible as one chain of materialized CTEs.
- **store**: pages persist under the engine's partitioned-store
  contract (``gb=<hash bucket>/batch=``, ``_BUILT`` marker,
  content-addressed path — annindex.py's layout) and each beam round
  reads ONLY the entrant buckets (partition-pruned ``IN`` filter +
  broadcast id semi-join), so serve IO is (queries x beam) pages, not
  the index.  The entry (routing) layer persists as a ``_centroids``
  sidecar written at build time (the semdedup-store pattern,
  dedupstore.py) — routing reads the 1/64-sized sidecar, NEVER the
  corpus-sized page store; sidecars survive ``replace_store``
  compaction by contract (sinks.py).
- **deletes**: bounded tombstones anti-joined at the final ranking —
  deleted nodes still ROUTE (their edges keep the graph navigable, the
  DiskANN deletion semantics) but never surface as results; the oracle
  replays the identical walk with the final exclusion.  Physical purge
  is deliberately NOT a tombstone-drop compaction: removing a page
  changes every walk that routed through it, so vacuum here means
  re-linking each deleted node's in-neighbors to its out-neighbors
  (the DiskANN repair) or a rebuild — like the KMV/quantile sketches,
  the limit is documented rather than faked with a wrong-result purge.

Scale notes (100 TB): the band width (5 bits) should grow ~log2(n) to
hold per-bucket volume flat — at this corpus' scale the literal-plane
form is exact-replayable and the bucket join is the same Σ|bucket|²
envelope the LSH dedup family documents.  Beam serve never shuffles the
corpus: pages are fetched by pruned reads, queries broadcast, and every
rank window partitions on ``query_id`` over checkpoint-bounded rows.

Reference parity: the reference has no ANN engine (nearest-neighbour
there is the per-event ΔR matching, reference columnflow/util.py); this
family is beyond-parity LLM-pipeline surface like IVF+PQ/OPQ.
"""

from __future__ import annotations

import os
import random
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from columnflow_spark.core.state import checkpoint_df, checkpoint_df_lazy
from columnflow_spark.functions.similarity import chunked_self_pairs, hyperplane_signs
from columnflow_spark.queries import query
from columnflow_spark.queries.annindex import content_tag, scratch_root
from columnflow_spark.sources import load_table, spread
from columnflow_spark.sources.sinks import (
    anti_tombstones,
    ensure_store,
    upsert_partitions,
    upsert_tombstones,
)
from columnflow_spark.sources.tables import table_path

_G_GRID = 1000  # component quantization step (the PQ family's grid)
_G_DIM = 64
_G_BANDS = 4  # LSH band sets for candidate generation
_G_BITS = 5  # sign bits per band (32 buckets/band at this scale;
# production widens bits ~log2(n) to hold per-bucket volume flat)
_G_R_OUT = 12  # directed out-degree before symmetrization
_G_DEG_CAP = 16  # degree cap after symmetrization
_G_SEEDS = 8  # entry points per query (top centroids)
_G_BEAM_W = 16  # beam width
_G_ROUNDS = 4  # fixed synchronous expansion rounds
# (constants tuned on the exact algorithm replica: recall@5 vs brute
# force 0.88 at n=500 / 0.76 at n=2000 — 2-3x the IVF+PQ arm at a
# visited set of ~300-450 exact-scored vectors per query)
_G_TOPK = 5
#: LEGACY/default gb= bucket count — the serve-side fallback for stores
#: written before the ``_BUCKETS`` metadata sidecar existed.  New stores
#: derive their bucket count from corpus size at creation (r13, guide
#: §2: make partitioning scale-adaptive — a constant bucket count makes
#: every "pruned" read a constant 1/16 of the store instead of O(pages
#: touched); see :func:`_derive_store_buckets`).
_G_STORE_BUCKETS = 16
#: target pages per gb= bucket at store creation: the per-bucket read
#: stays ~this many rows no matter the corpus size
_G_BUCKET_TARGET_PAGES = 1024
_G_ENTRY_MOD = 64  # every 64th vector is an entry (routing) node
_G_FORMAT = 2  # v2: _centroids routing sidecar (pre-sidecar stores rebuild)
#: deletion workload for the tombstone twin (10 of 500 at sf0.01)
_G_DELETE_MOD, _G_DELETE_REM = 50, 3


def _band_planes() -> list[list[list[float]]]:
    """One seeded 6-plane set per band — driver-side literals, identical
    in the oracle's replay (the ``_lsh_planes`` recipe per band)."""
    out = []
    for b in range(_G_BANDS):
        rng = random.Random(1000 + b)
        out.append([[rng.gauss(0, 1) for _ in range(_G_DIM)] for _ in range(_G_BITS)])
    return out


def _grid(col: Column) -> Column:
    return F.transform(col, lambda x: F.round(x.cast("double") * _G_GRID, 0).cast("long"))


def _gdot(a: Column, b: Column) -> Column:
    """Exact-integer grid dot product (sequential fold, same order as the
    oracle's list_aggregate)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda s, v: s + v
    )


def _grid_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"]))
    return emb.select("vec_id", _grid(F.col("embedding")).alias("g"))


_G_ADJ_CACHE: dict = {}

#: per-(session, sf_dir) combined build frame — see :func:`_corpus_frame`
_G_CF_CACHE: dict = {}

#: per-(session, sf_dir) corpus row count — one tiny job over the
#: already-checkpointed corpus frame, reused wherever a build needs the
#: corpus size (trained-entry k sizing) instead of a fresh parquet scan.
#: NOTE (r13, measured): a size-derived ``coalesce`` of the checkpointed
#: serve artifacts (pages / repaired adjacency) down to O(rows/65536)
#: partitions was tried here and REVERTED — the beam's per-round cost is
#: the lazy entrant-chain replay (windows/anti-joins over the visited
#: union), whose map sides the coalesce serializes: insert/sharded
#: serves measured +2-4 s with 1-partition artifacts at sf0.1.
_G_N_CACHE: dict = {}


def _corpus_rows(spark: SparkSession, sf_dir: str) -> int:
    key = (spark.sparkContext.applicationId, sf_dir)
    n = _G_N_CACHE.get(key)
    if n is None:
        n = _corpus_frame(spark, sf_dir).count()
        _G_N_CACHE[key] = n
    return n


def _corpus_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``(vec_id, g, bk0..bk{B-1})`` — ONE checkpointed corpus pass
    serving BOTH the banded bucket join and exact grid scoring (r13
    optimization, guide §1.2: the build previously paid separate
    checkpointed passes for the bucket frame and the grid frame — at
    100 TB that is two full corpus scans where one suffices, since the
    sign bits and the grid quantization read the same embedding column).
    Cached per (session, sf_dir) like the dedup family's shared shingle
    table (``_GRAMS_CACHE``), so the full/base/sharded build variants
    share the scan; bench cold-lines that must pay it purge this cache
    (bench.py ``cold_first``)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cf = _G_CF_CACHE.get(key)
    if cf is None:
        emb = spread(load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"]))
        bands = _band_planes()
        cf = emb.select(
            "vec_id",
            _grid(F.col("embedding")).alias("g"),
            *[
                hyperplane_signs(F.col("embedding"), bands[b]).alias(f"bk{b}")
                for b in range(_G_BANDS)
            ],
        ).transform(checkpoint_df)
        _G_CF_CACHE[key] = cf
    return cf


#: per-(session, sf_dir) checkpointed FULL-corpus scored candidate pairs
#: ``(v1 < v2, d)`` — the expensive half of every adjacency build (banded
#: LSH candidate join + grid-dot scoring).  r14 (VERDICT r13 next #4):
#: the insert twin's base build re-ran this identical join over the 95 %
#: non-inserted subset even though candidate collision is a PAIRWISE
#: property — the base candidate set is exactly the full set restricted
#: to base endpoints — so one session artifact serves the full build,
#: the base build (endpoint filter) and every downstream consumer of the
#: cached adjacency (vacuum/trained-entry/delete stores), one candidate
#: join per session instead of two.  LAZY checkpoint: the first
#: consumer's action materializes the blocks.  bench.py purges this on
#: the ann_graph_store_topk build split so ann_graph_index_build pays
#: the join COLD.
_G_SCORED_CACHE: dict = {}


def _scored_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    sp = _G_SCORED_CACHE.get(key)
    if sp is None:
        cf = _corpus_frame(spark, sf_dir)
        sp = _score_pairs(_within_pairs(cf), cf.select("vec_id", "g")).transform(
            checkpoint_df_lazy
        )
        _G_SCORED_CACHE[key] = sp
    return sp


def build_graph_adjacency(
    spark: SparkSession, sf_dir: str, node_pred=None, tag: str = "full"
) -> DataFrame:
    """``(src, dst, d)`` — the bounded-degree navigable graph: banded LSH
    candidates → per-node top-R by grid dot → symmetrize → cap.
    ``node_pred`` restricts which vectors become nodes (the incremental
    insert builds its base graph on the non-inserted subset); pass it as
    a CALLABLE over the id column (e.g. ``lambda c: ~_insert_pred(c)``)
    so the build can derive its candidates from the session's scored
    pair artifact by endpoint restriction (r14 — candidate collision is
    pairwise, so filtering the full scored pairs to pred(v1) & pred(v2)
    yields exactly the subset build's candidate set; proven edge-for-edge
    in tests/test_ann_graph.py).  A plain Column predicate is still
    accepted and falls back to the direct subset join.

    The combined build frame (:func:`_corpus_frame`) is checkpointed so
    the whole build reads the corpus exactly ONCE (bucket bits + grid
    quantization in the same pass — r13; previously one bucket pass plus
    one grid pass); the scored pair frame (:func:`_scored_pairs`) is
    likewise a session artifact (r14), so the candidate join itself runs
    once per session no matter how many build variants consume it.
    Cached per (session, sf_dir, tag) since every serving form starts
    from it.
    A ``node_pred`` REQUIRES a non-default tag — the cache is keyed by
    tag, and a predicated build under tag='full' would poison the
    full-graph adjacency for the whole session."""
    if node_pred is not None and tag == "full":
        raise ValueError(
            "build_graph_adjacency: node_pred requires a distinct tag "
            "(tag='full' is reserved for the unpredicated graph)"
        )
    key = (spark.sparkContext.applicationId, sf_dir, tag)
    if key in _G_ADJ_CACHE:
        return _G_ADJ_CACHE[key]
    if node_pred is None:
        adj = _adjacency_rank(_scored_pairs(spark, sf_dir))
    elif callable(node_pred):
        scored = _scored_pairs(spark, sf_dir).filter(
            node_pred(F.col("v1")) & node_pred(F.col("v2"))
        )
        adj = _adjacency_rank(scored)
    else:
        # legacy Column predicate: cannot be rebound to pair endpoints —
        # run the direct subset candidate join (result-identical)
        cf = _corpus_frame(spark, sf_dir)
        adj = _adjacency_from_pairs(
            _within_pairs(cf.filter(node_pred)), cf.select("vec_id", "g")
        )
    _G_ADJ_CACHE[key] = adj
    return adj


def _stacked_bands(bucketed: DataFrame, vcol: str) -> DataFrame:
    """``(band, bkt, <vcol>)`` — the bucketed frame unpivoted to one row
    per (vector, band), so all four band joins collapse into ONE join
    keyed on ``(band, bkt)`` (r13, guide §2.4: four per-band self-joins
    compiled eight scans of the corpus checkpoint and eight exchanges
    where one stacked join needs two)."""
    return bucketed.select(
        F.posexplode(F.array(*[F.col(f"bk{b}") for b in range(_G_BANDS)])).alias(
            "band", "bkt"
        ),
        F.col("vec_id").alias(vcol),
    )


#: per-task candidate bound for the stacked (band, bkt) self-join: a
#: bucket over this many members is split into hash chunks so no single
#: join task generates more than ~cap² pairs (VERDICT r13 what's-wrong
#: #5: collapsing the per-band joins into one stacked join concentrates
#: any hot LSH bucket into a single join key — fine at sf0.1, one
#: straggler task at 100 TB).  All test-SF buckets sit far below the
#: cap, where chunked_self_pairs degenerates to the plain self-join
#: (m = 1, no replication).
_G_BUCKET_CAP = 1024


def _within_pairs(bucketed: DataFrame, chunked: bool = True) -> DataFrame:
    """Distinct candidate pairs ``(v1 < v2)`` sharing a bucket in any
    band — ONE stacked (band, bkt) self-join of the bucketed frame; the
    pair set is identical to the per-band join union (a pair shares a
    bucket in some band iff the stacked keys collide for that band).

    With ``chunked`` (the default — the session-artifact candidate join,
    :func:`_scored_pairs`) the self-join runs through
    :func:`chunked_self_pairs` (r14): EXACT all-pairs semantics — the
    adjacency stays bit-identical, asserted edge-for-edge in
    tests/test_ann_graph.py — with hot buckets split into chunk-pair
    tasks bounded by ``_G_BUCKET_CAP``² candidates.  The sharded build
    passes ``chunked=False``: its per-shard buckets are half-sized and
    the guard's fixed cost (one bucket-count aggregate + broadcast per
    join, ×3 joins) measured +1.0 s on the deliberately-cold
    ann_graph_sharded_topk line (interleaved A/B min-of-3: 7.0/7.5 →
    8.0/8.2 s) for no local benefit — see OPTIMIZATION_r14.md."""
    if not chunked:
        x = _stacked_bands(bucketed, "v1")
        y = _stacked_bands(bucketed, "v2")
        return (
            x.join(y, ["band", "bkt"])
            .filter(F.col("v1") < F.col("v2"))
            .select("v1", "v2")
            .distinct()
        )
    st = _stacked_bands(bucketed, "v").select(
        F.struct("band", "bkt").alias("k"), "v"
    )
    pairs = chunked_self_pairs(st, "k", "v", cap=_G_BUCKET_CAP)
    return (
        pairs.select(F.col("v").alias("v1"), F.col("v_b").alias("v2"))
        .distinct()
    )


def _cross_pairs(ba: DataFrame, bb: DataFrame) -> DataFrame:
    """Distinct cross-shard candidate pairs: the stacked (band, bkt)
    join BETWEEN two shards' bucketed frames (normalized to ``v1 < v2``
    so the union with the within-shard pairs dedups under one
    convention)."""
    x = _stacked_bands(ba, "va")
    y = _stacked_bands(bb, "vb")
    return (
        x.join(y, ["band", "bkt"])
        .select(F.least("va", "vb").alias("v1"), F.greatest("va", "vb").alias("v2"))
        .distinct()
    )


def _both_directions(df: DataFrame, a: str, b: str) -> DataFrame:
    """``(src, dst, d)`` with every edge emitted in BOTH directions via
    one generator — the exact row multiset of
    ``df.select(a→src, b→dst, d) UNION ALL df.select(b→src, a→dst, d)``,
    but the input subtree is evaluated ONCE instead of once per union
    branch (r13, guide §1.2: Spark compiles each branch of a self-union
    as its own copy of the upstream plan — for the build that re-ran the
    whole candidate join / ranking window per direction)."""
    return df.select(
        F.explode(
            F.array(
                F.struct(F.col(a).alias("src"), F.col(b).alias("dst"), F.col("d")),
                F.struct(F.col(b).alias("src"), F.col(a).alias("dst"), F.col("d")),
            )
        ).alias("e")
    ).select("e.src", "e.dst", "e.d")


def _score_pairs(cand: DataFrame, ge: DataFrame) -> DataFrame:
    """Candidate pairs joined to their grid vectors and scored:
    ``(v1, v2, d)`` with the exact-integer grid dot."""
    return (
        cand.join(ge.select(F.col("vec_id").alias("v1"), F.col("g").alias("g1")), "v1")
        .join(ge.select(F.col("vec_id").alias("v2"), F.col("g").alias("g2")), "v2")
        .select("v1", "v2", _gdot(F.col("g1"), F.col("g2")).alias("d"))
    )


def _adjacency_from_pairs(cand: DataFrame, ge: DataFrame) -> DataFrame:
    """Candidate pairs → scored → per-node top-R → symmetrize → degree
    cap: the merge phase — identical no matter how the candidate set was
    generated (one-shot or per-shard + cross)."""
    return _adjacency_rank(_score_pairs(cand, ge))


def _adjacency_rank(scored: DataFrame) -> DataFrame:
    """Scored pairs ``(v1, v2, d)`` → per-node top-R → symmetrize →
    degree cap — the rank phase, split out (r14) so builds over the
    session's checkpointed scored-pair artifact skip the candidate
    join."""
    directed = _both_directions(scored, "v1", "v2")
    w = W.partitionBy("src").orderBy(F.desc("d"), F.asc("dst"))
    adj0 = directed.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= _G_R_OUT
    ).drop("rk")
    sym = _both_directions(adj0, "src", "dst").distinct()
    return sym.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= _G_DEG_CAP
    ).drop("rk")


def build_graph_adjacency_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-parallel build + merge (VERDICT r11 missing #2 — the
    DiskANN merge): two half-corpus shard builds generate their own
    banded candidates INDEPENDENTLY (at 100 TB each shard is its own
    job over its own slice — bounded memory, data locality, shards can
    arrive incrementally), then the merge adds the cross-shard bucket
    join and runs ONE global top-R → symmetrize → re-cap pass.

    The merged adjacency is EXACTLY the one-shot build's, by candidate-
    set equality: a pair shares a band bucket iff both endpoints hash
    there, so within-A ∪ within-B ∪ cross(A,B) IS the one-shot candidate
    set, and scores/rank tie-breaks are identical expressions — asserted
    edge-for-edge in tests/test_ann_graph.py, and the serve shares
    ``ann_graph_beam_topk``'s oracle verbatim."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _G_SHARD_CACHE:
        return _G_SHARD_CACHE[key]
    # one combined corpus pass serves both shards' bucket slices and the
    # grid scoring (r13 — previously two per-shard bucket passes plus a
    # grid pass; the shard split is a filter on the shared checkpointed
    # frame, which at cluster scale maps to each shard job reading its
    # own slice of the same columns)
    cf = _corpus_frame(spark, sf_dir)
    ba = cf.filter(F.col("vec_id") % 2 == 0)
    bb = cf.filter(F.col("vec_id") % 2 == 1)
    # no outer distinct (r13): the three branches are each internally
    # distinct AND mutually disjoint by construction — within(A) pairs
    # have two even ids, within(B) two odd, cross exactly one of each —
    # so the union IS a set and the extra exchange was pure cost
    cand = (
        _within_pairs(ba, chunked=False)
        .unionAll(_within_pairs(bb, chunked=False))
        .unionAll(_cross_pairs(ba, bb))
    )
    adj = _adjacency_from_pairs(cand, cf.select("vec_id", "g"))
    _G_SHARD_CACHE[key] = adj
    return adj


_G_SHARD_CACHE: dict = {}


def _pages_from_adj(
    spark: SparkSession, sf_dir: str, adj: DataFrame, node_pred=None
) -> DataFrame:
    """``(vec_id, g, nbrs)`` pages for an arbitrary adjacency frame;
    ``node_pred`` (callable over the id column, or a plain Column) limits
    which vectors get pages (base-graph pages must not include
    not-yet-inserted vectors)."""
    nbrs = adj.groupBy(F.col("src").alias("vec_id")).agg(
        F.sort_array(F.collect_list("dst")).alias("nbrs")
    )
    # pages are always built downstream of an adjacency build, so the
    # checkpointed corpus frame exists — read grid vectors from it
    # instead of a fresh parquet scan + spread shuffle (r13)
    ge = _corpus_frame(spark, sf_dir).select("vec_id", "g")
    if node_pred is not None:
        ge = ge.filter(node_pred(F.col("vec_id")) if callable(node_pred) else node_pred)
    return ge.join(nbrs, "vec_id", "left").select(
        "vec_id",
        "g",
        F.coalesce("nbrs", F.array().cast("array<bigint>")).alias("nbrs"),
    )


def _pages_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``(vec_id, g, nbrs)`` — the DiskANN page layout: vector + neighbor
    ids in one row; isolated nodes get an empty adjacency."""
    return _pages_from_adj(spark, sf_dir, build_graph_adjacency(spark, sf_dir))


#: per-(session, sf_dir) checkpointed query-vector frame (~n/100 rows).
#: Every beam ROUND broadcast-joins qv, so a lazy qv re-scanned the
#: embeddings parquet in every round job of every serve; one tiny
#: checkpoint per session makes each round read a materialized leaf
#: instead (r13, guide §1.2: don't re-read what a prior pass produced).
_G_QV_CACHE: dict = {}


def _query_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    qv = _G_QV_CACHE.get(key)
    if qv is None:
        qv = (
            _grid_emb(spark, sf_dir)
            .filter(F.col("vec_id") % 100 == 7)
            .select(F.col("vec_id").alias("query_id"), F.col("g").alias("gq"))
            .transform(checkpoint_df)
        )
        _G_QV_CACHE[key] = qv
    return qv


def _topw(df: DataFrame, k: int) -> DataFrame:
    w = W.partitionBy("query_id").orderBy(F.desc("d"), F.asc("vec_id"))
    return df.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k).drop("rk")


def _graph_beam(
    spark: SparkSession, qv: DataFrame, pages_of, beam_w: int = _G_BEAM_W
) -> DataFrame:
    """The deterministic beam: returns the full visited set
    ``(query_id, vec_id, d)`` after the fixed round count.

    ``pages_of(pairs_df)`` fetches pages for a bounded entrant frame —
    ``pairs_df`` is ``(query_id, vec_id)`` and the fetch returns those
    pairs joined to their pages ``(query_id, vec_id, g, nbrs)``;
    ``pages_of(None, centroids=True)`` returns the centroid layer
    ``(vec_id, g)`` for entry routing.  ``beam_w`` widens the walk —
    the filtered-search accuracy knob (post-filtering a fixed-width
    beam loses recall as predicate selectivity drops; widening restores
    it at a proportional page-read budget).

    Per-round materialization (r13 optimization, guide §1.2/§2.4): the
    ONE eagerly checkpointed frame per round is the round's ``scored``
    pages — it carries both the new visited rows AND the ``nbrs`` the
    expansion needs.  The growing visited set stays a LAZY union of
    those bounded checkpointed round frames (≤ seeds + W × DEG_CAP rows
    per query per round, each a materialized leaf), and the entrant
    frame is a lazy window/join chain over them — so each round runs
    one eager job instead of the previous three (visited checkpoint +
    entrant checkpoint + fetch), which at serve time is the difference
    between ~16 and ~7 scheduled jobs per walk with identical dataflow
    and bit-identical results.

    Two further r13 cuts inside each round's job, both result-identical:

    - the fetch takes the entrant PAIRS and the scored frame reuses the
      fetch output directly, so the entrant chain (windows/joins over
      the visited leaves) is compiled ONCE per round — the previous
      ``ids``-shaped fetch re-joined ``entr`` against the fetched pages,
      which evaluated the same chain a second time in the round's job
      (and a third time in the id-distinct broadcast);
    - ``new_in_beam`` is ``beam ∩ vis_new`` (a join against the round's
      checkpointed leaf) instead of a second ranking window over the
      PREVIOUS round's visited union + anti-join.  Equality is beam
      monotonicity: rank over a superset is never smaller, so a
      previously-visited row in this round's top-W was in the previous
      round's top-W too — the rows new in the beam are exactly the new
      visits that entered it.
    """
    cents = pages_of(None, centroids=True)
    seed_sc = cents.join(F.broadcast(qv)).select(
        "query_id", "vec_id", _gdot(F.col("gq"), F.col("g")).alias("d")
    )
    entr = _topw(seed_sc, _G_SEEDS).select("query_id", "vec_id")
    visited = None
    for t in range(_G_ROUNDS + 1):
        scored = (
            pages_of(entr)
            .join(F.broadcast(qv), "query_id")
            .select("query_id", "vec_id", _gdot(F.col("gq"), F.col("g")).alias("d"), "nbrs")
            # bounded state: <= seeds + W * DEG_CAP rows per query per round
            .transform(checkpoint_df)
        )
        vis_new = scored.select("query_id", "vec_id", "d")
        visited = vis_new if visited is None else visited.unionAll(vis_new)
        if t < _G_ROUNDS:
            new_in_beam = _topw(visited, beam_w).join(
                vis_new.select("query_id", "vec_id"), ["query_id", "vec_id"]
            )
            entr = (
                new_in_beam.select("query_id", "vec_id")
                .join(scored.select("query_id", "vec_id", "nbrs"), ["query_id", "vec_id"])
                .select("query_id", F.explode("nbrs").alias("vec_id"))
                .distinct()
                .join(visited.select("query_id", "vec_id"), ["query_id", "vec_id"], "left_anti")
            )
    return visited


def _final_topk(visited: DataFrame, tombstone_path: str | None = None) -> DataFrame:
    out = visited.filter(F.col("vec_id") != F.col("query_id"))
    if tombstone_path is not None:
        # collapse the per-round union before the tombstone anti-join so
        # the join is not pushed into every union branch (r13)
        out = anti_tombstones(out.transform(checkpoint_df), tombstone_path, id_col="vec_id")
    w = W.partitionBy("query_id").orderBy(F.desc("d"), F.asc("vec_id"))
    return (
        out.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _G_TOPK)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("d").cast("long").alias("d"),
            F.col("rk").cast("int").alias("rk"),
        )
        .orderBy("query_id", "rk")
    )


def _fetcher_over(pages: DataFrame):
    """In-session page provider over a checkpointed pages frame: the
    bounded entrant frame (id-only or ``(query_id, vec_id)`` pairs —
    any extra columns ride along) broadcasts into ONE scan of the
    pages leaf."""

    def fetch(ids: DataFrame | None, centroids: bool = False) -> DataFrame:
        if centroids:
            return pages.filter(F.col("vec_id") % _G_ENTRY_MOD == 0).select("vec_id", "g")
        return pages.join(F.broadcast(ids), "vec_id")

    return fetch


#: per-(session, sf_dir) checkpointed full pages frame — built once per
#: session and shared by every in-session serve (beam/filtered/trained
#: entry), the ``_G_UPD_CACHE`` pages precedent: repeated serves measure
#: the beam, not a per-call page rematerialization (r13)
_G_PAGES_CACHE: dict = {}


def _session_pages_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    pages = _G_PAGES_CACHE.get(key)
    if pages is None:
        pages = (
            _pages_frame(spark, sf_dir)
            
            .transform(checkpoint_df)
        )
        _G_PAGES_CACHE[key] = pages
    return pages


def _session_pages(spark: SparkSession, sf_dir: str):
    return _fetcher_over(_session_pages_frame(spark, sf_dir))


# --- persisted page store (the annindex.py contract) ---


def graph_index_path(sf_dir: str) -> str:
    tag = content_tag(table_path(sf_dir, "embeddings"), f"gann{_G_FORMAT}")
    return os.path.join(scratch_root(), "graph_index", tag)


def _centroids_path(path: str) -> str:
    return os.path.join(path, "_centroids")


def _derive_store_buckets(n_rows: int) -> int:
    """Corpus-scaled power-of-two gb= bucket count: ~:data:`_G_BUCKET_TARGET_PAGES`
    pages per bucket (floor 4, cap 2^20), so bucket pruning approximates
    id pruning at ANY store size — the 100 TB fix for the constant-
    fraction prune (a fixed 16 buckets reads 1/16 of the store per
    touched bucket regardless of how few pages the serve needs)."""
    b = 4
    while b * _G_BUCKET_TARGET_PAGES < n_rows and b < (1 << 20):
        b *= 2
    return b


def _write_store_buckets(path: str, buckets: int) -> None:
    """Record the store's bucket modulus as the ``_BUCKETS`` metadata
    sidecar (underscore-prefixed → carried through ``replace_store``
    compaction by the sinks contract) so every later reader/writer uses
    the modulus the store was PARTITIONED with."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "_BUCKETS"), "w") as f:
        f.write(f"{int(buckets)}\n")


def _read_store_buckets(path: str) -> int:
    """The store's recorded bucket modulus; pre-metadata stores fall back
    to the legacy constant they were written with."""
    try:
        with open(os.path.join(path, "_BUCKETS")) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return _G_STORE_BUCKETS


def _mark_built(path: str) -> None:
    # explicit completeness marker: dynamic partition overwrite emits no
    # root _SUCCESS (the annindex.py store lesson)
    with open(os.path.join(path, "_BUILT"), "w") as f:
        f.write(f"format={_G_FORMAT}\n")


def build_graph_index(
    spark: SparkSession,
    sf_dir: str,
    path: str | None = None,
    node_pred=None,
    tag: str = "full",
    mark: bool = True,
    buckets: int | None = None,
) -> str:
    """Persist the page store plus its ``_centroids`` routing sidecar.

    ``mark=False`` defers the ``_BUILT`` completeness marker so a caller
    can finish multi-step store setup (e.g. the tombstone slice of the
    delete twin) BEFORE declaring the store complete — a crash between
    build and that extra step must fail closed (no marker → rebuild),
    never serve a half-initialized store."""
    path = path or graph_index_path(sf_dir)
    # scale-adaptive bucket count (r13): derived from corpus size at
    # creation and recorded in store metadata so serves/ingests/compactions
    # read the same modulus back — per-bucket reads stay O(target pages)
    # instead of a constant fraction of the store
    if buckets is None:
        # session-cached count of the checkpointed corpus frame — not a
        # fresh count job per store build (r13; insert/vacuum/delete twins
        # all route through here)
        buckets = _derive_store_buckets(_corpus_rows(spark, sf_dir))
    _write_store_buckets(path, buckets)
    pages = _pages_from_adj(
        spark,
        sf_dir,
        build_graph_adjacency(spark, sf_dir, node_pred=node_pred, tag=tag),
        node_pred=node_pred,
    ).select(
        "vec_id",
        "g",
        "nbrs",
        F.pmod(F.xxhash64("vec_id"), F.lit(buckets)).alias("gb"),
        F.lit(0).alias("batch"),
    )
    upsert_partitions(pages, path, partition_by=["gb", "batch"])
    # routing sidecar: the entry layer is 1/64 of the corpus — persisted
    # once at build so serve-time routing never scans the page store
    # (centroid nodes hash-scatter across ALL gb= buckets; a modulus
    # predicate prunes nothing).  batch=-sliced so an incremental insert
    # upserts only its own slice (idempotent, the store contract).
    ge = _corpus_frame(spark, sf_dir).select("vec_id", "g")
    if node_pred is not None:
        ge = ge.filter(node_pred(F.col("vec_id")) if callable(node_pred) else node_pred)
    cents = ge.filter(F.col("vec_id") % _G_ENTRY_MOD == 0).select(
        "vec_id", "g", F.lit(0).alias("batch")
    )
    upsert_partitions(cents, _centroids_path(path), partition_by=["batch"])
    if mark:
        _mark_built(path)
    return path


def _ensure_graph_index(spark: SparkSession, sf_dir: str) -> str:
    return ensure_store(
        graph_index_path(sf_dir), lambda p: build_graph_index(spark, sf_dir, p)
    )


def store_page_fetcher(spark: SparkSession, path: str, max_batch: int | None = None):
    """Page provider over the persisted store: each fetch prunes to the
    entrant ids' ``gb=`` buckets (planning-time PartitionFilters — the
    probe-pruned IO contract, asserted in tests/test_ann_graph.py).

    ``max_batch`` fences the read at a batch horizon (partition-pruned):
    ``max_batch=0`` serves the BASE graph regardless of later ingest
    slices, and a REPLAYED streaming micro-batch fenced at its own id
    never sees its previous write — the idempotence rule every
    streaming store twin follows."""
    buckets = _read_store_buckets(path)

    def fence(rows: DataFrame) -> DataFrame:
        return rows if max_batch is None else rows.filter(F.col("batch") <= max_batch)

    def latest(rows: DataFrame, keys: list[str]) -> DataFrame:
        # latest-batch-wins page resolution (the annindex compaction
        # rule): an incremental insert shadows a rewritten base page
        # with a higher batch= slice; the dedup runs over the BOUNDED
        # fetched rows, never the store.  ``keys`` are the requesting
        # frame's columns (id-only or (query_id, vec_id) pairs), so
        # every requested row resolves to ITS latest page.
        w = W.partitionBy(*keys).orderBy(F.desc("batch"))
        return rows.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)

    def fetch(ids: DataFrame | None, centroids: bool = False) -> DataFrame:
        if centroids:
            # routing reads the 1/64-sized sidecar, never the page store
            # (was the r10 perf demerit: a modulus filter over the full
            # store read the ENTIRE index per serve call); latest-wins
            # per vec_id like the page path — the store contract must
            # hold for ANY batch layout, even one that re-slices an
            # entry node (the dedup runs over sidecar-sized rows)
            cpath = _centroids_path(path)
            if not os.path.exists(cpath):
                # crash recovery (ADVICE r12): a vacuum that died between
                # the sidecar rmtree and rename leaves a marker-complete
                # store with NO _centroids and no _deleted to trigger a
                # re-vacuum.  The sidecar is definitionally the modulus
                # entry rows of the store's own pages — serve from them
                # (one full-store read, paid only until the next
                # compaction rewrites the sidecar) instead of raising.
                rows = fence(spark.read.parquet(path)).filter(
                    F.col("vec_id") % _G_ENTRY_MOD == 0
                )
                return latest(rows, ["vec_id"]).select("vec_id", "g")
            return latest(fence(spark.read.parquet(cpath)), ["vec_id"]).select(
                "vec_id", "g"
            )
        # the requesting frame may be id-only (ingest repair reads, already
        # checkpointed by their callers) or the beam's (query_id, vec_id)
        # entrant pairs; either way the bucket set collected for
        # planning-time partition pruning is bounded by the store's
        # modulus, and the pairs broadcast into ONE pruned store read
        # (r13 — the previous ids-shaped fetch made the beam re-join the
        # entrant frame against the fetched pages, compiling the same
        # entrant chain twice per round job).  Entrant PAIRS are
        # checkpointed first: the bucket collect and the broadcast would
        # otherwise each replay the full entrant chain (windows/joins over
        # the visited leaves) — one bounded materialization, then a
        # leaf-sized collect and a leaf-sized broadcast.
        keys = list(ids.columns)
        if len(keys) > 1:
            ids = checkpoint_df(ids)
        bkts = sorted(
            r[0]
            for r in ids.select(
                F.pmod(F.xxhash64("vec_id"), F.lit(buckets)).alias("gb")
            )
            .distinct()
            .collect()
        )
        return latest(
            fence(spark.read.parquet(path))
            .filter(F.col("gb").isin(bkts))
            .join(F.broadcast(ids), "vec_id"),
            keys,
        ).select(*keys, "g", "nbrs")

    return fetch


# --- deletion twin: a store copy with a tombstone slice ---


def _deleted_graph_path(sf_dir: str) -> str:
    tag = content_tag(table_path(sf_dir, "embeddings"), f"gann-del{_G_FORMAT}")
    return os.path.join(scratch_root(), "graph_index", tag)


def _delete_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _grid_emb(spark, sf_dir)
        .filter(F.col("vec_id") % _G_DELETE_MOD == _G_DELETE_REM)
        .select("vec_id")
    )


def _ensure_deleted_graph_index(spark: SparkSession, sf_dir: str) -> str:
    # the tombstone slice lands BEFORE the completeness marker: a crash
    # in between leaves no marker, so the next session rebuilds — never
    # a marker-complete store whose missing _deleted slice silently
    # serves tombstoned vectors
    def build(p: str) -> None:
        build_graph_index(spark, sf_dir, p, mark=False)
        upsert_tombstones(_delete_ids(spark, sf_dir), p, batch=0, id_col="vec_id")
        _mark_built(p)

    return ensure_store(_deleted_graph_path(sf_dir), build)


# --- oracle builders: the full build + walk replayed as materialized
# CTE chains (the logreg/PageRank iterative-oracle recipe) ---


def _g_bucket_sql(planes: list[list[float]]) -> str:
    terms = []
    for i, plane in enumerate(planes):
        lits = ", ".join(repr(w) for w in plane)
        dot = (
            f"list_aggregate(list_transform(range(1, {_G_DIM + 1}), "
            f"j -> embedding[j] * ([{lits}])[j]), 'sum')"
        )
        terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << i} ELSE 0 END)")
    return " + ".join(terms)


def _g_dot_sql(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(range(1, {_G_DIM + 1}), "
        f"j -> {a}[j] * {b}[j]), 'sum')"
    )


def _g_build_ctes(where: str = "") -> str:
    """Build-CTE chain ``ge``(all vectors) → ``adj``; ``where`` filters
    which vectors become graph NODES (the incremental-insert oracle
    builds the base graph on the non-inserted subset while ``ge`` keeps
    every vector addressable for scoring)."""
    bands = _band_planes()
    bucket_cols = ", ".join(
        f"CAST({_g_bucket_sql(bands[b])} AS BIGINT) AS bk{b}" for b in range(_G_BANDS)
    )
    band_joins = "\n            UNION ALL ".join(
        f"SELECT x.vec_id AS v1, y.vec_id AS v2 FROM bk x "
        f"JOIN bk y ON x.bk{b} = y.bk{b} AND x.vec_id < y.vec_id"
        for b in range(_G_BANDS)
    )
    return f"""
    ge AS MATERIALIZED (
        SELECT vec_id,
               list_transform(range(1, {_G_DIM + 1}),
                   j -> CAST(round(embedding[j]::DOUBLE * {_G_GRID}) AS BIGINT)) AS g
        FROM embeddings
    ),
    bk AS MATERIALIZED (SELECT vec_id, embedding, {bucket_cols} FROM embeddings {where}),
    cand AS MATERIALIZED (SELECT DISTINCT v1, v2 FROM ({band_joins})),
    sedge AS MATERIALIZED (
        SELECT c.v1, c.v2, {_g_dot_sql('g1.g', 'g2.g')} AS d
        FROM cand c JOIN ge g1 ON g1.vec_id = c.v1 JOIN ge g2 ON g2.vec_id = c.v2
    ),
    dedge AS MATERIALIZED (
        SELECT v1 AS src, v2 AS dst, d FROM sedge
        UNION ALL SELECT v2 AS src, v1 AS dst, d FROM sedge
    ),
    adj0 AS MATERIALIZED (
        SELECT src, dst, d FROM (
            SELECT *, row_number() OVER (PARTITION BY src ORDER BY d DESC, dst) AS rk
            FROM dedge
        ) WHERE rk <= {_G_R_OUT}
    ),
    sym AS MATERIALIZED (
        SELECT DISTINCT src, dst, d FROM (
            SELECT src, dst, d FROM adj0
            UNION ALL SELECT dst AS src, src AS dst, d FROM adj0
        )
    ),
    adj AS MATERIALIZED (
        SELECT src, dst, d FROM (
            SELECT *, row_number() OVER (PARTITION BY src ORDER BY d DESC, dst) AS rk
            FROM sym
        ) WHERE rk <= {_G_DEG_CAP}
    )"""


def _g_beam_ctes(
    pfx: str = "",
    qv_where: str = "vec_id % 100 = 7",
    adj_rel: str = "adj",
    seed_where: str = f"vec_id % {_G_ENTRY_MOD} = 0",
    beam_w: int = _G_BEAM_W,
) -> str:
    """Beam-CTE chain ``{pfx}qv`` → ``{pfx}v{ROUNDS}`` over adjacency
    relation ``adj_rel`` — prefixable so the incremental-insert oracle
    can run TWO walks in one query (the insert beams over the base
    graph, then the serve beams over the repaired graph);
    ``seed_where`` picks the entry layer (the vacuum twin drops purged
    entry nodes from routing)."""
    parts = [f"""
    {pfx}qv AS MATERIALIZED (SELECT vec_id AS query_id, g AS gq FROM ge WHERE {qv_where}),
    {pfx}gseed AS MATERIALIZED (
        SELECT q.query_id, c.vec_id, {_g_dot_sql('q.gq', 'c.g')} AS d
        FROM {pfx}qv q, (SELECT vec_id, g FROM ge WHERE {seed_where}) c
    ),
    {pfx}v0 AS MATERIALIZED (
        SELECT query_id, vec_id, d FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY d DESC, vec_id) AS rk
            FROM {pfx}gseed
        ) WHERE rk <= {_G_SEEDS}
    ),
    {pfx}b0 AS MATERIALIZED (
        SELECT query_id, vec_id, d FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY d DESC, vec_id) AS rk
            FROM {pfx}v0
        ) WHERE rk <= {beam_w}
    ),
    {pfx}e0 AS MATERIALIZED (SELECT query_id, vec_id FROM {pfx}b0)"""]
    for t in range(1, _G_ROUNDS + 1):
        p = t - 1
        parts.append(f"""
    {pfx}cand{t} AS MATERIALIZED (
        SELECT DISTINCT e.query_id, a.dst AS vec_id
        FROM {pfx}e{p} e JOIN {adj_rel} a ON a.src = e.vec_id
        WHERE NOT EXISTS (
            SELECT 1 FROM {pfx}v{p} v WHERE v.query_id = e.query_id AND v.vec_id = a.dst
        )
    ),
    {pfx}sc{t} AS MATERIALIZED (
        SELECT c.query_id, c.vec_id, {_g_dot_sql('q.gq', 'g.g')} AS d
        FROM {pfx}cand{t} c
        JOIN ge g ON g.vec_id = c.vec_id
        JOIN {pfx}qv q ON q.query_id = c.query_id
    ),
    {pfx}v{t} AS MATERIALIZED (
        SELECT query_id, vec_id, d FROM {pfx}v{p}
        UNION ALL SELECT query_id, vec_id, d FROM {pfx}sc{t}
    ),
    {pfx}b{t} AS MATERIALIZED (
        SELECT query_id, vec_id, d FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY d DESC, vec_id) AS rk
            FROM {pfx}v{t}
        ) WHERE rk <= {beam_w}
    ),
    {pfx}e{t} AS MATERIALIZED (
        SELECT query_id, vec_id FROM {pfx}b{t} b
        WHERE NOT EXISTS (
            SELECT 1 FROM {pfx}b{p} p WHERE p.query_id = b.query_id AND p.vec_id = b.vec_id
        )
    )""")
    return ",".join(parts)


def _g_final_sql(extra_pred: str = "", pfx: str = "") -> str:
    return f"""
    SELECT query_id, vec_id AS neighbor_id, CAST(d AS BIGINT) AS d, CAST(rk AS INT) AS rk
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY d DESC, vec_id) AS rk
        FROM {pfx}v{_G_ROUNDS} WHERE vec_id <> query_id{extra_pred}
    )
    WHERE rk <= {_G_TOPK}
    ORDER BY query_id, rk
    """


GRAPH_BEAM_ORACLE = f"WITH {_g_build_ctes()},{_g_beam_ctes()}{_g_final_sql()}"

_GRAPH_DELETE_ORACLE = (
    f"WITH {_g_build_ctes()},{_g_beam_ctes()}"
    f"{_g_final_sql(f' AND vec_id % {_G_DELETE_MOD} <> {_G_DELETE_REM}')}"
)


@query(
    "ann_graph_adjacency_stats",
    oracle=f"""
    WITH {_g_build_ctes()}
    SELECT out_deg, CAST(count(*) AS BIGINT) AS n_nodes, CAST(sum(src) AS BIGINT) AS id_checksum
    FROM (SELECT src, CAST(count(*) AS INT) AS out_deg FROM adj GROUP BY src)
    GROUP BY out_deg ORDER BY out_deg
    """,
)
def ann_graph_adjacency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram (with id checksums) of the navigable graph —
    pins the banded build + symmetrize + cap exactly."""
    adj = build_graph_adjacency(spark, sf_dir)
    return (
        adj.groupBy("src")
        .agg(F.count(F.lit(1)).cast("int").alias("out_deg"))
        .groupBy("out_deg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("src").cast("long").alias("id_checksum"),
        )
        .orderBy("out_deg")
    )


@query("ann_graph_beam_topk", oracle=GRAPH_BEAM_ORACLE)
def ann_graph_beam_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-session graph build + deterministic beam: top-5 grid-dot
    neighbors per query after the fixed best-first walk."""
    qv = _query_vectors(spark, sf_dir)
    visited = _graph_beam(spark, qv, _session_pages(spark, sf_dir))
    return _final_topk(visited)


@query("ann_graph_sharded_topk", oracle=GRAPH_BEAM_ORACLE)
def ann_graph_sharded_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve over the SHARD-BUILT + MERGED graph: candidate-set equality
    makes the merged adjacency identical to the one-shot build, so this
    shares the beam oracle verbatim — the hash equality IS the merge
    correctness proof (the 100 TB build story: per-shard subgraph jobs +
    one cross-shard merge pass)."""
    pages = (
        _pages_from_adj(spark, sf_dir, build_graph_adjacency_sharded(spark, sf_dir))
        
        .transform(checkpoint_df)
    )
    qv = _query_vectors(spark, sf_dir)
    return _final_topk(_graph_beam(spark, qv, _fetcher_over(pages)))


@query("ann_graph_store_topk", oracle=GRAPH_BEAM_ORACLE)
def ann_graph_store_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same walk served from the persisted page store with
    partition-pruned fetches — bit-identical to the in-session twin
    (shared oracle)."""
    path = _ensure_graph_index(spark, sf_dir)
    qv = _query_vectors(spark, sf_dir)
    visited = _graph_beam(spark, qv, store_page_fetcher(spark, path))
    return _final_topk(visited)


@query("ann_graph_delete_topk", oracle=_GRAPH_DELETE_ORACLE)
def ann_graph_delete_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Store serve after a vector deletion: the tombstone slice is
    anti-joined at the final ranking (deleted nodes still route — the
    DiskANN delete semantics — but never surface); the oracle replays
    the identical walk over the full graph with the final exclusion."""
    path = _ensure_deleted_graph_index(spark, sf_dir)
    qv = _query_vectors(spark, sf_dir)
    visited = _graph_beam(spark, qv, store_page_fetcher(spark, path))
    return _final_topk(visited, tombstone_path=path)


# --- incremental insert with neighborhood repair (the other half of
# the DiskANN maintenance story next to tombstone deletes): a new batch
# of vectors joins a BUILT graph without a rebuild.  Each new vector
# runs the standard deterministic beam over the BASE graph; its top-R
# visited nodes become its out-edges; the affected base nodes gain the
# reverse edge and re-cap their adjacency at DEG_CAP (the repair) —
# work is (batch x beam) page reads plus rewrites of the touched
# pages, never corpus-proportional.  Batch-internal edges are
# deliberately excluded (new nodes link through the base graph only),
# which keeps the whole insert a pure function of (base graph, batch)
# and hence exactly replayable: the oracle runs the insert beams and
# the repair as one CTE chain, then serves the standard query workload
# over the repaired graph.
_G_INSERT_MOD, _G_INSERT_REM = 20, 11  # 5% of vectors arrive late


def _insert_pred(c: Column | None = None):
    """Membership predicate of the late-arriving insert batch; ``c``
    rebinds it to another id column (pair endpoints v1/v2 — r14)."""
    return F.pmod(F.col("vec_id") if c is None else c, F.lit(_G_INSERT_MOD)) == _G_INSERT_REM


def _base_node_pred(c: Column | None = None):
    """The base (non-inserted) subset as a CALLABLE node predicate — the
    form the predicated builds take so their candidates derive from the
    session's scored-pair artifact by endpoint restriction (r14)."""
    return ~_insert_pred(c)


_G_UPD_CACHE: dict = {}


def updated_graph_adjacency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``(src, dst, d)`` after inserting the late batch into the base
    graph (insert beams → new out-edges → reverse edges → re-cap)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _G_UPD_CACHE:
        return _G_UPD_CACHE[key]
    # checkpoint the base adjacency ONCE: both downstream consumers
    # (the base pages the insert beams walk, and the repair union below)
    # otherwise re-evaluate the entire base build — candidates + ranking
    # windows — a full second build pass at 100 TB (r13, guide §1.2)
    base_adj = build_graph_adjacency(
        spark, sf_dir, node_pred=_base_node_pred, tag="base"
    ).transform(checkpoint_df)
    base_pages = (
        _pages_from_adj(spark, sf_dir, base_adj, node_pred=_base_node_pred)

        .transform(checkpoint_df)
    )
    qv_new = (
        _corpus_frame(spark, sf_dir)
        .filter(_insert_pred())
        .select(F.col("vec_id").alias("query_id"), F.col("g").alias("gq"))
    )
    visited = _graph_beam(spark, qv_new, _fetcher_over(base_pages))
    # single consumer: the both-directions generator evaluates this
    # ranking window exactly once inside the repair checkpoint below, so
    # no extra materialization is needed (ingest_graph_batch keeps its
    # checkpointed twin because THERE the frame feeds three consumers)
    new_edges = _topw(visited, _G_R_OUT).select(
        F.col("query_id").alias("src"), F.col("vec_id").alias("dst"), "d"
    )
    upd0 = base_adj.unionAll(_both_directions(new_edges, "src", "dst"))
    w = W.partitionBy("src").orderBy(F.desc("d"), F.asc("dst"))
    upd = (
        upd0.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _G_DEG_CAP)
        .drop("rk")
        
        .transform(checkpoint_df)
    )
    _G_UPD_CACHE[key] = upd
    return upd


def updated_graph_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed pages of the repaired graph — part of the insert
    artifact (cached with the adjacency), so repeated serves measure
    the beam, not a per-call page rematerialization."""
    key = ("pages", spark.sparkContext.applicationId, sf_dir)
    pages = _G_UPD_CACHE.get(key)
    if pages is None:
        pages = (
            _pages_from_adj(spark, sf_dir, updated_graph_adjacency(spark, sf_dir))
            
            .transform(checkpoint_df)
        )
        _G_UPD_CACHE[key] = pages
    return pages


def update_graph_index(spark: SparkSession, sf_dir: str, path: str) -> str:
    """Propagate the insert into a BASE-graph page store: new nodes'
    pages plus rewritten pages of base nodes whose adjacency changed,
    all as a ``batch=1`` slice (latest-batch-wins at read — the
    annindex compaction rule); untouched gb partitions are never
    rewritten."""
    upd = updated_graph_adjacency(spark, sf_dir)
    inserted_ids = _corpus_frame(spark, sf_dir).filter(_insert_pred()).select("vec_id")
    new_edges_dsts = (
        upd.join(inserted_ids.select(F.col("vec_id").alias("src")), "src")
        .select(F.col("dst").alias("vec_id"))
        .distinct()
    )
    changed = new_edges_dsts.unionAll(inserted_ids).distinct()
    pages = (
        _pages_from_adj(spark, sf_dir, upd)
        .join(F.broadcast(changed), "vec_id")
        .select(
            "vec_id",
            "g",
            "nbrs",
            F.pmod(F.xxhash64("vec_id"), F.lit(_read_store_buckets(path))).alias("gb"),
            F.lit(1).alias("batch"),
        )
    )
    upsert_partitions(pages, path, partition_by=["gb", "batch"])
    # routing-sidecar maintenance: inserted vectors that are entry nodes
    # join the _centroids layer as the batch=1 slice (none in this
    # workload — insert ids are odd, entry ids even — but the store
    # contract must hold for any batch)
    new_cents = (
        _corpus_frame(spark, sf_dir)
        .filter(_insert_pred() & (F.col("vec_id") % _G_ENTRY_MOD == 0))
        .select("vec_id", "g", F.lit(1).alias("batch"))
    )
    if not new_cents.isEmpty():
        upsert_partitions(new_cents, _centroids_path(path), partition_by=["batch"])
    return path


def _graph_insert_oracle(final_extra: str = "") -> str:
    """The base-build → insert-beams → repair → serve chain;
    ``final_extra`` narrows the FINAL ranking (the streaming CDC twin
    excludes in-stream-tombstoned vectors there — the DiskANN delete
    semantics: deleted nodes still route, never surface)."""
    return (
        "WITH "
        + _g_build_ctes(where=f"WHERE vec_id % {_G_INSERT_MOD} <> {_G_INSERT_REM}")
        + ","
        + _g_beam_ctes(pfx="i", qv_where=f"vec_id % {_G_INSERT_MOD} = {_G_INSERT_REM}")
        + _GRAPH_INSERT_REPAIR_CTES
        + _g_beam_ctes(pfx="s", adj_rel="uadj")
        + _g_final_sql(extra_pred=final_extra, pfx="s")
    )


_GRAPH_INSERT_REPAIR_CTES = (
    f""",
    inew AS MATERIALIZED (
        SELECT query_id AS src, vec_id AS dst, d FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY d DESC, vec_id) AS rk
            FROM iv{_G_ROUNDS}
        ) WHERE rk <= {_G_R_OUT}
    ),
    upd0 AS MATERIALIZED (
        SELECT src, dst, d FROM adj
        UNION ALL SELECT src, dst, d FROM inew
        UNION ALL SELECT dst AS src, src AS dst, d FROM inew
    ),
    uadj AS MATERIALIZED (
        SELECT src, dst, d FROM (
            SELECT *, row_number() OVER (PARTITION BY src ORDER BY d DESC, dst) AS rk
            FROM upd0
        ) WHERE rk <= {_G_DEG_CAP}
    ),"""
)

_GRAPH_INSERT_ORACLE = _graph_insert_oracle()


@query("ann_graph_insert_topk", oracle=_GRAPH_INSERT_ORACLE)
def ann_graph_insert_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve the standard query workload over the INCREMENTALLY
    UPDATED graph (late 5% batch inserted via beams + repair, no
    rebuild): newly inserted vectors are reachable and rankable; the
    oracle replays base build → insert beams → repair → serve beams as
    one chain."""
    qv = _query_vectors(spark, sf_dir)
    visited = _graph_beam(spark, qv, _fetcher_over(updated_graph_pages(spark, sf_dir)))
    return _final_topk(visited)


# --- trained entry layer (VERDICT r10 next #5): route from kmeans
# centroids instead of the every-64th-vector modulus layer.  The
# spherical-Lloyd centroids (functions/similarity.py kmeans_fit — the
# trained-IVF family's frozen, fully deterministic trainer) are mapped
# to their nearest GRAPH NODES by exact grid dot (lowest vec_id on
# ties), and those nodes seed the standard beam.  Entry count matches
# the modulus layer (k = n/64) at test scales → identical routing
# budget, so the recall comparison in tests/test_ann_graph.py is
# apples-to-apples; at corpus scale k is CAPPED at a constant
# (_G_TRAINED_ENTRY_K_CAP — DiskANN uses a small fixed entry set), so
# the model stays bounded: every driver-side collect in training is
# O(k x dim) model rows, never corpus-proportional, and the
# centroid→node mapping stays IN-PLAN as a checkpointed DataFrame
# (the VERDICT r11 perf-weak #1 fix — no n/64-row driver round-trip).
# Rows-only for the driver (float Lloyd means have no exact SQL twin —
# the ann_ivf_trained_topk precedent); the walk downstream of the entry
# set is the same oracle-pinned beam machinery. ---

_G_TRAINED_ENTRY_K_CAP = 4096  # constant entry budget at corpus scale

_G_ENTRY_CACHE: dict = {}


def trained_entry_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``(vec_id, g)`` of the trained entry layer: one graph node per
    Lloyd centroid (build-time cost — the corpus x k assignment is the
    standard IVF training scan, never paid at serve).  The mapping is a
    checkpointed DataFrame, cached per (app, sf_dir) — entry ids never
    round-trip through the driver."""
    from columnflow_spark.functions.similarity import kmeans_fit

    key = (spark.sparkContext.applicationId, sf_dir)
    mapped = _G_ENTRY_CACHE.get(key)
    if mapped is None:
        emb = spread(load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"]))
        # corpus size from the shared checkpointed frame's cached count —
        # not a fresh full parquet scan (r13)
        n = _corpus_rows(spark, sf_dir)
        k = max(2, min(_G_TRAINED_ENTRY_K_CAP, (n + _G_ENTRY_MOD - 1) // _G_ENTRY_MOD))
        cents, _info = kmeans_fit(emb, k=k, iters=3)
        cents_df = spark.createDataFrame(
            [(int(cid), [float(x) for x in vec]) for cid, vec in cents],
            "cid long, ce array<double>",
        ).select("cid", _grid(F.col("ce")).alias("gc"))
        ge = _corpus_frame(spark, sf_dir).select("vec_id", "g")
        w = W.partitionBy("cid").orderBy(F.desc("d"), F.asc("vec_id"))
        mapped = (
            ge.join(F.broadcast(cents_df))
            .select("cid", "vec_id", _gdot(F.col("g"), F.col("gc")).alias("d"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("vec_id")
            .distinct()
            .transform(checkpoint_df)
        )
        _G_ENTRY_CACHE[key] = mapped
    # k is capped constant → the entry-id set is model-sized; broadcast
    # keeps the serve join shuffle-free (grid vectors from the shared
    # checkpointed corpus frame — no per-call parquet rescan, r13)
    return (
        _corpus_frame(spark, sf_dir)
        .join(F.broadcast(mapped), "vec_id")
        .select("vec_id", "g")
    )


@query("ann_graph_trained_entry_topk")
def ann_graph_trained_entry_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard beam routed from the TRAINED entry layer — recall
    vs the modulus entry pinned at equal vectors-read budget in
    tests/test_ann_graph.py (rows-only for the driver: Lloyd means have
    no exact SQL twin, the trained-IVF precedent)."""
    pages = _session_pages_frame(spark, sf_dir)
    entry = trained_entry_nodes(spark, sf_dir).transform(checkpoint_df)

    def fetch(ids: DataFrame | None, centroids: bool = False) -> DataFrame:
        if centroids:
            return entry
        return pages.join(F.broadcast(ids), "vec_id")

    qv = _query_vectors(spark, sf_dir)
    return _final_topk(_graph_beam(spark, qv, fetch))


# --- streaming ingest (the 11th streaming index-maintenance member,
# VERDICT r10 next #3): micro-batches of late vectors join a BUILT base
# page store via foreachBatch — insert beams + neighborhood repair +
# page upsert per batch.  The at-rest store is ingest-order- and
# batch-boundary-INVARIANT because it inherits the batch twin's
# contract: new nodes link through the BASE graph only (insert beams
# read the batch=0 slice), and the per-src degree re-cap is sequentially
# consistent — recap(recap(base ∪ e1) ∪ e2) = recap(base ∪ e1 ∪ e2)
# for a fixed total (d DESC, dst) order, since an edge evicted by an
# earlier cap would rank strictly below 16 kept edges in the one-shot
# union too.  So N micro-batches land the SAME pages as one batch
# insert, and the streaming serve shares ann_graph_insert_topk's
# oracle. ---


def ingest_graph_batch(
    spark: SparkSession, batch_df: DataFrame, store: str, batch_id: int
) -> None:
    """One streaming micro-batch of ``(vec_id, embedding)`` inserts:
    beam over the base slice, splice reverse edges into the touched
    nodes' current adjacency (fenced at ``batch <= batch_id`` so a
    replayed micro-batch never sees its own previous write), re-cap,
    upsert touched + new pages as the ``batch_id + 1`` slice.  Work is
    (batch x beam) page reads + rewrites of the touched pages — never
    store-proportional."""
    if batch_df.isEmpty():
        return
    qv = (
        batch_df.select(
            F.col("vec_id").alias("query_id"), _grid(F.col("embedding")).alias("gq")
        )
        .transform(checkpoint_df)
    )
    visited = _graph_beam(spark, qv, store_page_fetcher(spark, store, max_batch=0))
    new_edges = (
        _topw(visited, _G_R_OUT)
        .select(F.col("query_id").alias("src"), F.col("vec_id").alias("dst"), "d")
        .transform(checkpoint_df)
    )
    new_nbrs = new_edges.groupBy(F.col("src").alias("vec_id")).agg(
        F.sort_array(F.collect_list("dst")).alias("nbrs")
    )
    new_pages = (
        qv.select(F.col("query_id").alias("vec_id"), F.col("gq").alias("g"))
        .join(new_nbrs, "vec_id", "left")
        .select(
            "vec_id",
            "g",
            F.coalesce("nbrs", F.array().cast("array<bigint>")).alias("nbrs"),
        )
    )
    # touched base-side nodes: current (fenced) adjacency + this batch's
    # reverse edges, re-capped.  d is recomputed from the grid vectors —
    # the same exact integers the build stored, so recap order is
    # identical to the batch twin's.
    fenced = store_page_fetcher(spark, store, max_batch=int(batch_id))
    touched = new_edges.select(F.col("dst").alias("vec_id")).distinct().transform(checkpoint_df)
    tpages = fenced(touched).transform(checkpoint_df)
    need_g = (
        touched.unionAll(tpages.select(F.explode("nbrs").alias("vec_id")))
        .distinct()
        .transform(checkpoint_df)
    )
    gall = fenced(need_g).select("vec_id", "g")
    cur = (
        tpages.select(F.col("vec_id").alias("src"), F.explode("nbrs").alias("dst"))
        .join(gall.select(F.col("vec_id").alias("src"), F.col("g").alias("gs")), "src")
        .join(gall.select(F.col("vec_id").alias("dst"), F.col("g").alias("gd")), "dst")
        .select("src", "dst", _gdot(F.col("gs"), F.col("gd")).alias("d"))
    )
    w = W.partitionBy("src").orderBy(F.desc("d"), F.asc("dst"))
    upd = (
        cur.unionAll(
            new_edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "d")
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _G_DEG_CAP)
        .drop("rk")
    )
    tnbrs = upd.groupBy(F.col("src").alias("vec_id")).agg(
        F.sort_array(F.collect_list("dst")).alias("nbrs")
    )
    tpages_new = tpages.select("vec_id", "g").join(tnbrs, "vec_id", "left").select(
        "vec_id",
        "g",
        F.coalesce("nbrs", F.array().cast("array<bigint>")).alias("nbrs"),
    )
    pages = new_pages.unionAll(tpages_new).select(
        "vec_id",
        "g",
        "nbrs",
        F.pmod(F.xxhash64("vec_id"), F.lit(_read_store_buckets(store))).alias("gb"),
        F.lit(int(batch_id) + 1).alias("batch"),
    )
    upsert_partitions(pages, store, partition_by=["gb", "batch"])
    new_cents = new_pages.filter(F.col("vec_id") % _G_ENTRY_MOD == 0).select(
        "vec_id", "g", F.lit(int(batch_id) + 1).alias("batch")
    )
    if not new_cents.isEmpty():
        upsert_partitions(new_cents, _centroids_path(store), partition_by=["batch"])


# --- delete vacuum: the DiskANN consolidate-deletes repair (VERDICT r10
# next #2).  Tombstoned nodes stop ROUTING only once the graph is
# repaired around them: every in-neighbor of a deleted node gains edges
# to that node's out-neighbors (the bridge that keeps the region
# navigable), adjacencies re-cap at DEG_CAP, and the compaction rewrite
# physically drops the deleted pages + their tombstones.  The repair is
# a pure function of (stored graph, tombstone set) — bridge candidates
# are bounded by |deleted| x DEG_CAP² — so the whole vacuum replays as
# one CTE chain in the oracle (NOT a rebuild-on-reduced-corpus: the
# repaired graph keeps the survivors' original edges and only splices
# bridges where routes died). ---


def _store_pages_latest(spark: SparkSession, path: str) -> DataFrame:
    """All latest-batch pages of a store — the corpus-proportional read
    that only COMPACTION is allowed to do (serve paths stay pruned)."""
    w = W.partitionBy("vec_id").orderBy(F.desc("batch"))
    return (
        spark.read.parquet(path)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "g", "nbrs")
    )


def _repaired_adjacency(pages: DataFrame, del_ids: DataFrame) -> DataFrame:
    """``(src, dst, d)`` after splicing bridges around the deleted set:
    kept edges minus any touching a deleted node, plus in→out bridges
    scored by the same grid dot, re-capped at DEG_CAP.  ``del_ids`` is a
    compliance-batch-sized frame — broadcast everywhere."""
    dset = F.broadcast(del_ids.select("vec_id").distinct())
    ge = pages.select("vec_id", "g")
    edges = pages.select(
        F.col("vec_id").alias("src"), F.explode("nbrs").alias("dst")
    )
    # materialized once (bounded: n x DEG_CAP id/score rows — compaction
    # is the one path allowed store-proportional work): the in-edge,
    # out-edge and kept-edge branches below each consume it, and lazily
    # they would re-run the explode + two grid joins per branch (r13,
    # guide §1.2)
    scored = (
        edges.join(ge.select(F.col("vec_id").alias("src"), F.col("g").alias("gs")), "src")
        .join(ge.select(F.col("vec_id").alias("dst"), F.col("g").alias("gd")), "dst")
        .select("src", "dst", _gdot(F.col("gs"), F.col("gd")).alias("d"))
        .transform(checkpoint_df)
    )
    inn = (
        scored.join(dset.select(F.col("vec_id").alias("dst")), "dst", "left_semi")
        .join(dset.select(F.col("vec_id").alias("src")), "src", "left_anti")
        .select("src", F.col("dst").alias("mid"))
    )
    out = (
        scored.join(dset.select(F.col("vec_id").alias("src")), "src", "left_semi")
        .join(dset.select(F.col("vec_id").alias("dst")), "dst", "left_anti")
        .select(F.col("src").alias("mid"), "dst")
    )
    bridge = (
        inn.join(out, "mid")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    bridge_d = (
        bridge.join(ge.select(F.col("vec_id").alias("src"), F.col("g").alias("gs")), "src")
        .join(ge.select(F.col("vec_id").alias("dst"), F.col("g").alias("gd")), "dst")
        .select("src", "dst", _gdot(F.col("gs"), F.col("gd")).alias("d"))
    )
    kept = (
        scored.join(dset.select(F.col("vec_id").alias("src")), "src", "left_anti")
        .join(dset.select(F.col("vec_id").alias("dst")), "dst", "left_anti")
        # USING-column joins move the key to the FRONT (dst, src, d) —
        # re-project before the POSITIONAL union or every kept edge
        # enters it swapped (passed at sf0.01 where the graph is near-
        # symmetric; caught by the r11 sf1 sweep on asymmetric edges)
        .select("src", "dst", "d")
    )
    w = W.partitionBy("src").orderBy(F.desc("d"), F.asc("dst"))
    return (
        kept.unionAll(bridge_d)
        .distinct()
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _G_DEG_CAP)
        .drop("rk")
    )


def compact_graph_index(spark: SparkSession, path: str) -> str:
    """Physical delete purge (the DiskANN consolidate): repair the graph
    around the store's tombstoned nodes, rewrite surviving pages as one
    ``batch=0`` layout, drop deleted pages + centroids + tombstones.

    Crash-safe and idempotent: the page rewrite is ``replace_store``'s
    atomic tmp+swap; the ``_deleted`` slice (carried through the swap as
    a sidecar) is cleared LAST, so an interrupted vacuum re-runs — a
    re-vacuum over already-purged ids finds no edges touching them and
    rewrites the identical store."""
    from columnflow_spark.sources.sinks import (
        clear_tombstones,
        read_tombstones,
        replace_store,
    )

    del_ids = read_tombstones(spark, path, id_col="vec_id")
    if del_ids is None:
        # no tombstones -> pure slice-fold compaction (the
        # compact_ivfpq_index shape): an insert-heavy store grows one
        # batch= slice per ingest forever; fold latest-wins pages back
        # into one batch=0 layout so serve-time latest-wins dedup sees
        # one row per page again (repair with an empty delete set is
        # the identity on an already-capped adjacency).  Serve
        # equality re-proven in tests/test_ann_graph.py.
        del_ids = spark.createDataFrame([], "vec_id long")
    del_ids = del_ids.transform(checkpoint_df)
    pages = _store_pages_latest(spark, path).transform(checkpoint_df)
    radj = _repaired_adjacency(pages, del_ids)
    nbrs = radj.groupBy(F.col("src").alias("vec_id")).agg(
        F.sort_array(F.collect_list("dst")).alias("nbrs")
    )
    survivors = pages.join(F.broadcast(del_ids), "vec_id", "left_anti")
    new_pages = (
        survivors.select("vec_id", "g")
        .join(nbrs, "vec_id", "left")
        .select(
            "vec_id",
            "g",
            F.coalesce("nbrs", F.array().cast("array<bigint>")).alias("nbrs"),
            # keep the store's recorded modulus (the _BUCKETS sidecar is
            # carried through replace_store's swap like every sidecar)
            F.pmod(F.xxhash64("vec_id"), F.lit(_read_store_buckets(path))).alias("gb"),
            F.lit(0).alias("batch"),
        )
        .transform(checkpoint_df)  # fully resolved BEFORE the in-place rewrite
    )
    # new routing sidecar staged to a sibling first (same fail-closed
    # shape as replace_store's tmp): purged entry nodes must leave routing
    cents_tmp = path + ".centroids-tmp"
    cpath = _centroids_path(path)
    if os.path.exists(cpath):
        cents_src = spark.read.parquet(cpath)
    else:
        # crash-recovery: a previous vacuum that died between the sidecar
        # rmtree and rename leaves a marker-complete store with no
        # _centroids — the sidecar is definitionally the modulus entry
        # rows of the store's own pages (build writes ge%MOD, ingest
        # upserts its batch's %MOD slice), so rebuild it from them
        cents_src = pages.filter(F.col("vec_id") % _G_ENTRY_MOD == 0).select(
            "vec_id", "g", F.lit(0).alias("batch")
        )
    cents_new = (
        cents_src.join(F.broadcast(del_ids), "vec_id", "left_anti")
        .select("vec_id", "g", F.lit(0).alias("batch"))
    )
    # hive-partitioned by batch= exactly like the build/ingest writes, so
    # a post-vacuum incremental insert that upserts its own slice keeps
    # ONE consistent partition layout in the sidecar directory
    # cluster by the partition column before the write (the write_events
    # REBALANCE rule, guide §6) so the sidecar is a few files, not
    # files-per-task x batch
    cents_new.hint("rebalance", "batch").write.mode("overwrite").partitionBy(
        "batch"
    ).parquet(cents_tmp)
    replace_store(
        new_pages,
        path,
        partition_by=["gb", "batch"],
        marker_text=f"format={_G_FORMAT}\n",
    )
    shutil.rmtree(cpath, ignore_errors=True)
    os.rename(cents_tmp, cpath)
    clear_tombstones(path)
    return path


#: vacuum-path revision — bump when the REPAIR code changes semantics,
#: so content-addressed vacuumed stores built by older code rebuild
#: (r2: the kept-edge direction-swap fix; _BUILT gating otherwise
#: happily serves a store the old code produced)
_G_VAC_REV = 2


def _vacuumed_graph_path(sf_dir: str) -> str:
    tag = content_tag(
        table_path(sf_dir, "embeddings"), f"gann-vac{_G_FORMAT}.{_G_VAC_REV}"
    )
    return os.path.join(scratch_root(), "graph_index", tag)


def _ensure_vacuumed_graph_index(spark: SparkSession, sf_dir: str) -> str:
    def build(p: str) -> None:
        build_graph_index(spark, sf_dir, p, mark=False)
        upsert_tombstones(_delete_ids(spark, sf_dir), p, batch=0, id_col="vec_id")
        _mark_built(p)

    path = ensure_store(_vacuumed_graph_path(sf_dir), build)
    if os.path.exists(os.path.join(path, "_deleted")):
        # pending tombstones → (re-)vacuum; idempotent on crash-resume
        compact_graph_index(spark, path)
    return path


def _g_repair_ctes(adj_rel: str = "adj") -> str:
    """Repair-CTE chain ``{adj_rel}`` → ``vadj`` (mirrors
    :func:`_repaired_adjacency` exactly: kept ∪ scored bridges, distinct,
    re-cap); ``adj_rel`` lets the CDC-vacuum oracle repair the
    INSERT-UPDATED graph (``uadj``) instead of the base build."""
    return f"""
    gdel AS MATERIALIZED (
        SELECT vec_id FROM ge WHERE vec_id % {_G_DELETE_MOD} = {_G_DELETE_REM}
    ),
    ginn AS MATERIALIZED (
        SELECT a.src, a.dst AS mid FROM {adj_rel} a
        WHERE a.dst IN (SELECT vec_id FROM gdel)
          AND a.src NOT IN (SELECT vec_id FROM gdel)
    ),
    gout AS MATERIALIZED (
        SELECT a.src AS mid, a.dst FROM {adj_rel} a
        WHERE a.src IN (SELECT vec_id FROM gdel)
          AND a.dst NOT IN (SELECT vec_id FROM gdel)
    ),
    gbr AS MATERIALIZED (
        SELECT DISTINCT i.src, o.dst FROM ginn i JOIN gout o ON i.mid = o.mid
        WHERE i.src <> o.dst
    ),
    gbrd AS MATERIALIZED (
        SELECT b.src, b.dst, {_g_dot_sql('g1.g', 'g2.g')} AS d
        FROM gbr b JOIN ge g1 ON g1.vec_id = b.src JOIN ge g2 ON g2.vec_id = b.dst
    ),
    vkept AS MATERIALIZED (
        SELECT src, dst, d FROM {adj_rel}
        WHERE src NOT IN (SELECT vec_id FROM gdel)
          AND dst NOT IN (SELECT vec_id FROM gdel)
    ),
    vadj AS MATERIALIZED (
        SELECT src, dst, d FROM (
            SELECT *, row_number() OVER (PARTITION BY src ORDER BY d DESC, dst) AS rk
            FROM (SELECT DISTINCT src, dst, d FROM (
                SELECT src, dst, d FROM vkept
                UNION ALL SELECT src, dst, d FROM gbrd
            ))
        ) WHERE rk <= {_G_DEG_CAP}
    )"""


_GRAPH_VACUUM_ORACLE = (
    f"WITH {_g_build_ctes()},{_g_repair_ctes()},"
    + _g_beam_ctes(
        pfx="x",
        adj_rel="vadj",
        seed_where=(
            f"vec_id % {_G_ENTRY_MOD} = 0 "
            f"AND vec_id % {_G_DELETE_MOD} <> {_G_DELETE_REM}"
        ),
    )
    + _g_final_sql(pfx="x")
)


@query(
    "ann_graph_vacuum_stats",
    oracle=f"""
    WITH {_g_build_ctes()},{_g_repair_ctes()}
    SELECT out_deg, CAST(count(*) AS BIGINT) AS n_nodes, CAST(sum(src) AS BIGINT) AS id_checksum
    FROM (SELECT src, CAST(count(*) AS INT) AS out_deg FROM vadj GROUP BY src)
    GROUP BY out_deg ORDER BY out_deg
    """,
)
def ann_graph_vacuum_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram (with id checksums) of the REPAIRED graph — pins
    the in→out bridge splice + re-cap semantics exactly (no deleted node
    may survive as a source, survivors stay ≤ DEG_CAP)."""
    path = _ensure_vacuumed_graph_index(spark, sf_dir)
    pages = _store_pages_latest(spark, path)
    return (
        pages.select(F.col("vec_id").alias("src"), F.size("nbrs").alias("out_deg"))
        .filter(F.col("out_deg") > 0)
        .groupBy(F.col("out_deg").cast("int").alias("out_deg"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("src").cast("long").alias("id_checksum"),
        )
        .orderBy("out_deg")
    )


@query("ann_graph_vacuum_topk", oracle=_GRAPH_VACUUM_ORACLE)
def ann_graph_vacuum_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve after the PHYSICAL delete purge: the beam walks the
    repaired graph (deleted nodes neither route nor surface — compare
    ``ann_graph_delete_topk`` where they still route); the oracle
    replays build → repair → walk as one chain."""
    path = _ensure_vacuumed_graph_index(spark, sf_dir)
    qv = _query_vectors(spark, sf_dir)
    visited = _graph_beam(spark, qv, store_page_fetcher(spark, path))
    return _final_topk(visited)
