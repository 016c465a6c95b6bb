"""[EXT] Link-graph analytics: PageRank for crawl-frontier priority.

A 100 TB crawl pipeline ranks its frontier by link authority before
spending fetch budget (the original use of PageRank; Page et al. 1999).
This is the iterative-join form of the repo's graph family (connected
components live in ``operators/dedup.py``): rank state joins the edge
list, contributions partial-aggregate map-side on dst, and
``localCheckpoint`` truncates lineage each round so N iterations cost
O(1) plan depth, exactly like ``dedup.connected_components``.

All arithmetic is SCALED-INTEGER (ranks as BIGINT in units of 1e-12):
``div`` floor-division and integer multiplication are bit-identical in
Spark and DuckDB, so a fixed-iteration run is exactly oracle-checkable
— no float summation-order drift, no decimal-rounding-mode mismatch.
The residue the damping division drops (< 100 units per node per
round) is far below any ranking-relevant difference.

Docstring convention (round-9 verdict item 7): operator functions take
edge lists plus PRECOMPUTED sizes (``n_nodes`` / ``n_seeds`` ints) and
never trigger Spark actions at plan-build — sizing counts belong to
the query wrapper (where a demo graph is being synthesized) or to the
caller's catalog stats (where a real edge list arrives). The one
sanctioned action in this module is ``pagerank_until``'s per-round
convergence probe, which is the operator's semantics, not sizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.operators.fixpoint import iterate
from shippai_knowledge_etl_spark.tables import (
    _parse_bytes_conf,
    estimated_input_bytes,
)

SCALE = 1_000_000_000_000  # ranks in units of 1e-12


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_iters: int = 3,
    damping_pct: int = 85,
    checkpoint_every: int = 1,
    *,
    n_nodes: int,
) -> DataFrame:
    """Fixed-iteration PageRank over (``nodes``: col ``id``;
    ``edges``: cols ``src``, ``dst``), returning (id, rank_scaled).

    Per round: rank/outdeg contribution per edge (integer ``div``),
    sum by dst (map-side partial agg — the only wide shuffle, keyed
    the same every round so AQE reuses the partitioning), then
    rank' = (reset * (100-d)) div 100 + (d * inflow) div 100 against
    the full node universe (left join + coalesce keeps zero-inbound
    nodes, which a bare groupBy(dst) would silently drop). Dangling
    nodes (outdeg 0 after self-loop removal) simply emit nothing —
    the standard simplification, documented rather than hidden.

    Scale: state is 2 longs per node; edges never materialize
    anything wider than (dst, contrib) into the shuffle. localCheckpoint
    every ``checkpoint_every`` rounds keeps lineage O(1) like the CC
    operators; convergence beyond ``n_iters`` is the caller's loop.
    """
    edges = edges.filter(F.col("src") != F.col("dst"))
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    n = n_nodes  # caller-supplied: operators never trigger sizing actions
    if n == 0:
        return nodes.select("id", F.lit(0).cast("long").alias("rank_scaled"))
    base = SCALE // n
    reset = (base * (100 - damping_pct)) // 100
    ranks = nodes.select("id", F.lit(base).alias("rank_scaled"))
    # persist: every iteration re-joins this; without it each round
    # would re-run the edge scan + outdegree agg from source (the same
    # reason dedup.connected_components persists its edge list)
    deg_edges = edges.join(outdeg, "src").persist()

    def step(state: DataFrame, _i: int) -> DataFrame:
        contribs = (
            deg_edges.join(state.withColumnRenamed("id", "src"), "src")
            .select(
                "dst",
                F.expr("rank_scaled div outdeg").alias("contrib"),
            )
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inflow"))
        )
        return nodes.join(
            contribs.withColumnRenamed("dst", "id"), "id", "left"
        ).select(
            "id",
            (
                F.lit(reset)
                + F.expr(f"({damping_pct} * coalesce(inflow, 0)) div 100")
            ).alias("rank_scaled"),
        )

    # eager final checkpoint: materializes the state (and any pending
    # lazy checkpoints) so the cached edge list can be released now
    ranks, _, _ = iterate(
        ranks, step, n_iters,
        checkpoint_every=checkpoint_every, eager_final=True,
    )
    deg_edges.unpersist()
    return ranks


def pagerank_until(
    nodes: DataFrame,
    edges: DataFrame,
    tol_scaled: int = 1_000_000,  # 1e-6 in rank units
    max_iters: int = 50,
    damping_pct: int = 85,
    *,
    n_nodes: int,
) -> DataFrame:
    """Convergence-terminated PageRank: iterate single rounds (each via
    :func:`pagerank` with the shared integer arithmetic) until the max
    per-node rank change falls below ``tol_scaled`` or ``max_iters`` is
    hit — raising if it never converges, the same loud-failure contract
    as ``dedup.connected_components``.

    The convergence probe is a 1-row driver collect per round (join old
    vs new on id, global max of |delta| — a map-side-combined agg), the
    documented legitimate collect pattern. Fixed-iteration callers who
    need oracle checkability use :func:`pagerank` directly; this form
    is for production runs where iteration count is data-dependent.
    """
    n = n_nodes  # caller-supplied (module docstring convention)
    if n == 0:
        return nodes.select("id", F.lit(0).cast("long").alias("rank_scaled"))
    ranks = nodes.select(
        "id", F.lit(SCALE // n).alias("rank_scaled")
    ).localCheckpoint(eager=True)
    edges = edges.filter(F.col("src") != F.col("dst"))
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    deg_edges = edges.join(outdeg, "src").persist()
    reset = ((SCALE // n) * (100 - damping_pct)) // 100
    try:
        for _ in range(max_iters):
            contribs = (
                deg_edges.join(ranks.withColumnRenamed("id", "src"), "src")
                .select(
                    "dst", F.expr("rank_scaled div outdeg").alias("contrib")
                )
                .groupBy("dst")
                .agg(F.sum("contrib").alias("inflow"))
            )
            new_ranks = (
                nodes.join(contribs.withColumnRenamed("dst", "id"), "id", "left")
                .select(
                    "id",
                    (
                        F.lit(reset)
                        + F.expr(
                            f"({damping_pct} * coalesce(inflow, 0)) div 100"
                        )
                    ).alias("rank_scaled"),
                )
                .localCheckpoint(eager=True)
            )
            delta = (
                new_ranks.alias("n")
                .join(ranks.alias("o"), "id")
                .agg(
                    F.max(
                        F.abs(
                            F.col("n.rank_scaled") - F.col("o.rank_scaled")
                        )
                    ).alias("d")
                )
                .collect()[0]["d"]
            )
            ranks = new_ranks
            if delta is not None and delta <= tol_scaled:
                return ranks
    finally:
        deg_edges.unpersist()
    raise RuntimeError(
        f"pagerank_until: no convergence to {tol_scaled} within "
        f"{max_iters} iterations"
    )


def label_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    n_iters: int = 3,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Semi-supervised label propagation (Zhu & Ghahramani 2002 /
    Raghavan et al. 2007, clamped-seed variant) over (``nodes``: cols
    ``id``, ``label`` nullable, ``is_seed``; ``edges``: cols ``src``,
    ``dst`` — pass both directions for an undirected graph). Returns
    (id, label, is_seed) after ``n_iters`` synchronous rounds.

    Per round every non-seed node adopts the MAJORITY label among its
    labeled in-neighbors (parallel edges count multiply), keeping its
    previous label when no neighbor is labeled; seeds never change.
    Ties break toward the SMALLEST label via one integer
    ``min(struct(-cnt, label))`` aggregate — the whole update is
    integer arithmetic on integer labels, so a fixed-iteration run is
    exactly oracle-checkable, the ``pagerank`` discipline.

    The corpus-curation use: propagate scarce trusted quality/topic
    tags (human-rated seed documents) across a similarity or link
    graph to label the whole crawl without a model.

    Scale shape: per-round state is (id, label, is_seed) — ~17 bytes a
    node; the vote is one (dst, label)-keyed shuffle whose counts
    partial-aggregate map-side, followed by a dst-keyed argmin that
    AQE serves from the same partitioning; the full-universe left join
    keeps isolated nodes. ``localCheckpoint`` every
    ``checkpoint_every`` rounds truncates lineage exactly like
    ``pagerank`` / ``dedup.connected_components``.
    """
    edges = edges.filter(F.col("src") != F.col("dst")).persist()

    def step(state: DataFrame, _i: int) -> DataFrame:
        votes = (
            edges.join(
                state.filter(F.col("label").isNotNull()).select(
                    F.col("id").alias("src"), F.col("label").alias("nlbl")
                ),
                "src",
            )
            .groupBy("dst", "nlbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        best = votes.groupBy("dst").agg(
            F.min(
                F.struct(
                    (-F.col("cnt")).alias("neg_cnt"),
                    F.col("nlbl").alias("lbl"),
                )
            )["lbl"].alias("maj")
        )
        return state.join(
            best.withColumnRenamed("dst", "id"), "id", "left"
        ).select(
            "id",
            F.when(F.col("is_seed"), F.col("label"))
            .otherwise(F.coalesce(F.col("maj"), F.col("label")))
            .alias("label"),
            "is_seed",
        )

    state, _, _ = iterate(
        nodes.select("id", "label", "is_seed"), step, n_iters,
        checkpoint_every=checkpoint_every, eager_final=True,
    )
    edges.unpersist()
    return state


HITS_SCALE = 1_000_000  # hub/auth mass in units of 1e-6


def hits(
    nodes: DataFrame,
    edges: DataFrame,
    n_iters: int = 2,
    checkpoint_every: int = 1,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over (``nodes``: col
    ``id``; ``edges``: cols ``src``, ``dst``), returning
    (id, auth_scaled, hub_scaled) after ``n_iters`` rounds.

    Each round: raw authority = Σ hub over in-edges (one dst-keyed
    shuffle, map-side partial sums), L1-normalized back to
    ``HITS_SCALE`` total by integer floor division against the 1-row
    global total (broadcast cross join — the sketch-merge-class tiny
    BNLJ); then raw hub = Σ of the NEW authority over out-edges,
    normalized the same way. All arithmetic is BIGINT: with L1 mass
    pinned at 1e6 the worst intermediate is raw·SCALE ≈ maxdeg·1e12,
    far inside the long range, and floor division is bit-identical in
    Spark and DuckDB — a fixed-iteration run is exactly
    oracle-checkable (the ``pagerank`` discipline; L1 replaces the
    classical L2 norm precisely because sqrt of a sum of squares is
    NOT integer-exact; rankings are norm-invariant).

    The crawl-pipeline use: hub scores find link-directory pages
    (fetch-priority DOWN-weighting), authority scores find
    canonical-content pages (priority up-weighting) — the complement
    of ``pagerank``'s single score.

    Scale shape: state is 3 longs per node; two key-keyed shuffles
    per round (dst then src), each partial-aggregated map-side; the
    edge list is persisted once; ``localCheckpoint`` every
    ``checkpoint_every`` rounds truncates lineage.
    """
    edges = edges.filter(F.col("src") != F.col("dst")).persist()

    def step(state, _i):
        raw_a = (
            edges.join(
                state.select(
                    F.col("id").alias("src"), F.col("hub_scaled").alias("h")
                ),
                "src",
            )
            .groupBy("dst")
            .agg(F.sum("h").alias("ra"))
        )
        tot_a = raw_a.agg(F.sum("ra").alias("t"))
        auth = (
            nodes.join(raw_a.withColumnRenamed("dst", "id"), "id", "left")
            .crossJoin(F.broadcast(tot_a))
            .select(
                "id",
                F.coalesce(
                    F.expr(f"(ra * {HITS_SCALE}) div t"), F.lit(0)
                ).alias("auth_scaled"),
            )
        )
        raw_h = (
            edges.join(
                auth.select(
                    F.col("id").alias("dst"), F.col("auth_scaled").alias("a")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.sum("a").alias("rh"))
        )
        tot_h = raw_h.agg(F.sum("rh").alias("t"))
        return (
            auth.join(raw_h.withColumnRenamed("src", "id"), "id", "left")
            .crossJoin(F.broadcast(tot_h))
            .select(
                "id",
                "auth_scaled",
                F.coalesce(
                    F.expr(f"(rh * {HITS_SCALE}) div t"), F.lit(0)
                ).alias("hub_scaled"),
            )
        )

    state, _, _ = iterate(
        nodes.select(
            "id",
            F.lit(0).cast("long").alias("auth_scaled"),
            F.lit(HITS_SCALE).cast("long").alias("hub_scaled"),
        ),
        step,
        n_iters,
        checkpoint_every=checkpoint_every,
        eager_final=True,
    )
    edges.unpersist()
    return state


def triangle_counts(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Exact per-node triangle counts + local clustering coefficient
    over an undirected simple graph (``nodes``: col ``id``; ``edges``:
    cols ``src``, ``dst`` — direction ignored, self-loops and parallel
    edges dropped here). Returns (id, degree, n_triangles, clustering).

    Algorithm: degree-ordered edge orientation (Schank 2007's
    *forward* algorithm; the MapReduce formulation is Suri &
    Vassilvitskii, WWW 2011). Every edge is directed from its
    lower-(degree, id) endpoint to the higher one, so each triangle
    has exactly one *pivot* node with two out-edges and is counted
    once: enumerate out-wedges (a→b, a→c with (deg,id)(b) <
    (deg,id)(c)) and hash-probe the closing oriented edge (b→c).

    Scale: orientation bounds every out-degree by O(sqrt(m)) — a
    celebrity node with 10^6 inlinks contributes NO wedges from its
    own fan-in, because its edges point *toward* it. The wedge join is
    the only superlinear step (Σ outdeg² ≤ m^{3/2} worst case,
    far less on power-law graphs); both joins are equi-joins on edge
    keys, map-side partial counts everywhere, no driver collect.
    Clustering = 2·tri / (deg·(deg−1)) — integer operands, ONE double
    division per node, round 6 dp.
    """
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("id"))
        .unionAll(und.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e = und.join(
        deg.select(F.col("id").alias("u"), F.col("deg").alias("du")), "u"
    ).join(
        deg.select(F.col("id").alias("v"), F.col("deg").alias("dv")), "v"
    )
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    ori = e.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    )
    # wedges share the pivot a; (deg,id) order on (b, c) de-duplicates
    # the pair, and the closing edge is oriented b→c by construction
    w1, w2 = ori.alias("w1"), ori.alias("w2")
    wedges = w1.join(
        w2,
        (F.col("w1.a") == F.col("w2.a"))
        & (
            (F.col("w1.db") < F.col("w2.db"))
            | (
                (F.col("w1.db") == F.col("w2.db"))
                & (F.col("w1.b") < F.col("w2.b"))
            )
        ),
    ).select(
        F.col("w1.a").alias("x"),
        F.col("w1.b").alias("y"),
        F.col("w2.b").alias("z"),
    )
    closing = ori.select(F.col("a").alias("y"), F.col("b").alias("z"))
    tri = wedges.join(closing, ["y", "z"])
    per_node = (
        tri.select(F.col("x").alias("id"))
        .unionAll(tri.select(F.col("y").alias("id")))
        .unionAll(tri.select(F.col("z").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("tri"))
    )
    degc = F.coalesce(F.col("deg"), F.lit(0))
    tric = F.coalesce(F.col("tri"), F.lit(0))
    return (
        nodes.join(deg, "id", "left")
        .join(per_node, "id", "left")
        .select(
            "id",
            degc.cast("long").alias("degree"),
            tric.cast("long").alias("n_triangles"),
            F.when(
                degc >= 2,
                F.round(
                    (2 * tric).cast("double")
                    / (F.col("deg") * (F.col("deg") - 1)),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering"),
        )
    )


def k_core(
    nodes: DataFrame,
    edges: DataFrame,
    k: int,
    n_iters: int = 3,
    checkpoint_every: int = 1,
) -> DataFrame:
    """``n_iters`` rounds of k-core peeling (Seidman 1983; the
    distributed peel loop is Montresor et al. 2013) over an undirected
    simple graph: each round drops every surviving node whose degree
    AMONG SURVIVORS is < ``k``; removals cascade, so the fixpoint is
    the k-core. Returns (id, in_core, core_degree) — ``in_core`` =
    survived all rounds, ``core_degree`` = degree within the final
    survivor set (0 when peeled). A fixed ``n_iters`` is exactly
    oracle-unrollable (the PageRank/HITS convention); production runs
    the caller's loop to convergence — cascades longer than
    ``n_iters`` hops are cut short, identically in both engines.

    Scale shape: per round, two survivor semi-joins on the adjacency
    (node-keyed equi-joins) + one map-side-partial degree count; state
    is one id per surviving node, lineage truncated by localCheckpoint
    like the other iterative graph ops. Directions/parallel edges/
    self-loops are canonicalized away up front.
    """
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )
    adj = und.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
        und.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    adj = adj.persist()

    def step(surv, _i):
        deg = (
            adj.join(surv.withColumnRenamed("id", "a"), "a")
            .join(surv.withColumnRenamed("id", "b"), "b")
            .groupBy("a")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        return deg.filter(F.col("deg") >= k).select(F.col("a").alias("id"))

    surv, _, _ = iterate(
        nodes.select("id"), step, n_iters,
        checkpoint_every=checkpoint_every,
    )
    final_deg = (
        adj.join(surv.withColumnRenamed("id", "a"), "a")
        .join(surv.withColumnRenamed("id", "b"), "b")
        .groupBy("a")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    out = (
        nodes.join(surv.withColumn("in_core", F.lit(True)), "id", "left")
        .join(final_deg.withColumnRenamed("a", "id"), "id", "left")
        .select(
            "id",
            F.coalesce(F.col("in_core"), F.lit(False)).alias("in_core"),
            F.coalesce(F.col("deg"), F.lit(0))
            .cast("long")
            .alias("core_degree"),
        )
    )
    adj.unpersist()
    return out


def assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity (Newman 2002) of the undirected simple
    graph induced by ``edges`` (direction/self-loops/parallels
    canonicalized away): Pearson correlation of endpoint degrees over
    both orientations of every edge. Returns one row
    (n_endpoints, assortativity).

    Scale: one node-keyed degree count, two id equi-joins onto the
    edge list, one 6-column aggregate with map-side partials — no
    windows, no collects. Every sum is an exact integer; only the
    final closed-form correlation runs in double (sqrt is
    IEEE-exactly-rounded in both engines)."""
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("id"))
        .unionAll(und.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    j = und.join(
        deg.select(F.col("id").alias("u"), F.col("deg").alias("du")), "u"
    ).join(
        deg.select(F.col("id").alias("v"), F.col("deg").alias("dv")), "v"
    )
    pairs = j.select(
        F.col("du").alias("x"), F.col("dv").alias("y")
    ).unionAll(j.select(F.col("dv").alias("x"), F.col("du").alias("y")))
    s = pairs.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    ) * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    return s.select(
        F.col("n").cast("long").alias("n_endpoints"),
        F.round(num / den, 6).alias("assortativity"),
    )


def negative_edges(
    nodes: DataFrame,
    edges: DataFrame,
    k: int = 2,
    salt: str = "negedge",
    *,
    n_nodes: int,
) -> DataFrame:
    """Link-prediction training pairs: every observed (undirected,
    canonicalized) edge labeled 1, plus up to ``k`` DETERMINISTIC
    non-edges per edge labeled 0 — corrupt the dst endpoint with an
    md5 hash draw over the node-count range (the standard corrupted-
    negative recipe of TransE/GNN pipelines), then anti-join the real
    edge set so no false negative survives. Hash draws make the
    sample a pure function of (edge, salt): reproducible across runs,
    engines, partitionings — the auditable-sampling discipline of
    ``curate.mix_sample``.

    Returns (src, dst, label). Candidates that collide with a real
    edge or a self-loop are DROPPED, not resampled (documented: the
    negative ratio is ≤ k:1, slightly under on dense neighborhoods —
    resampling loops are not expressible as one pass and the bias is
    measurable by the caller from the label counts).

    Scale: negatives derive from the edge list by a narrow map
    (explode ×k + hash mod n); the false-negative filter is one
    anti-join on the canonical edge key; no node-side shuffle at all
    when ``n_nodes`` comes in as a literal — and it always does: the
    caller supplies the node count (module docstring convention), so
    this operator plans zero actions and no node-side shuffle."""
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )
    pos = und.select(
        F.col("u").alias("src"), F.col("v").alias("dst"),
        F.lit(1).alias("label"),
    )
    cand = und.withColumn(
        "i", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
    ).select(
        "u",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("u").cast("string"),
                        F.lit(":"),
                        F.col("v").cast("string"),
                        F.lit(f":{salt}:"),
                        F.col("i").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long").alias("draw"),
    )
    neg0 = cand.select(
        "u", (F.col("draw") % n_nodes).alias("w")
    ).filter(F.col("u") != F.col("w"))
    neg_key = neg0.select(
        F.least("u", "w").alias("u"), F.greatest("u", "w").alias("v")
    )
    neg = neg_key.join(und, ["u", "v"], "left_anti").select(
        F.col("u").alias("src"), F.col("v").alias("dst"),
        F.lit(0).alias("label"),
    )
    return pos.unionAll(neg)


def link_prediction_scores(edges: DataFrame) -> DataFrame:
    """Classical neighborhood link-prediction scores (Liben-Nowell &
    Kleinberg 2003) for every node pair sharing ≥1 common neighbor in
    an undirected simple graph: common-neighbor count, Adamic–Adar
    (Σ_z 1/ln deg z), neighbor-set Jaccard, plus an ``is_edge`` flag so
    the caller can rank the non-edges (the actual prediction set)
    without a second pass.

    Shape: candidate pairs are generated AT the shared neighbor — one
    z-keyed self-join of the adjacency list (i < j halves the fan-out)
    — never an all-pairs product; fan-out is Σ_z deg(z)², the same
    wedge budget as triangle counting, and a production run caps hub
    degrees exactly like jaccard_pairs' ``max_df`` (a celebrity z adds
    ~zero Adamic–Adar signal anyway: 1/ln deg → 0). Per-wedge AA terms
    are round(1/ln deg, 6) DECIMAL(18,6) so the pair-level sum is
    order-independent (the dsir/mixture-KL discipline); the Jaccard
    division happens once per output row.
    """
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )
    adj = und.select(F.col("u").alias("z"), F.col("v").alias("nb")).unionAll(
        und.select(F.col("v").alias("z"), F.col("u").alias("nb"))
    )
    deg = adj.groupBy("z").agg(F.count(F.lit(1)).alias("deg"))
    a1 = adj.join(deg, "z").alias("a1")
    a2 = adj.alias("a2")
    aa_term = F.round(F.lit(1.0) / F.log(F.col("a1.deg")), 6).cast(
        "decimal(18,6)"
    )
    pairs = a1.join(
        a2,
        (F.col("a1.z") == F.col("a2.z")) & (F.col("a1.nb") < F.col("a2.nb")),
    ).select(
        F.col("a1.nb").alias("i"),
        F.col("a2.nb").alias("j"),
        aa_term.alias("aa_term"),
    )
    sc = pairs.groupBy("i", "j").agg(
        F.count(F.lit(1)).alias("common_neighbors"),
        F.sum("aa_term").alias("aa"),
    )
    di = deg.select(F.col("z").alias("i"), F.col("deg").alias("di"))
    dj = deg.select(F.col("z").alias("j"), F.col("deg").alias("dj"))
    edge_flag = und.select(
        F.col("u").alias("i"), F.col("v").alias("j"), F.lit(True).alias("ef")
    )
    cn = F.col("common_neighbors")
    return (
        sc.join(di, "i")
        .join(dj, "j")
        .join(edge_flag, ["i", "j"], "left")
        .select(
            "i",
            "j",
            cn.cast("long").alias("common_neighbors"),
            F.round(F.col("aa").cast("double"), 6).alias("adamic_adar"),
            F.round(
                cn.cast("double") / (F.col("di") + F.col("dj") - cn), 6
            ).alias("jaccard"),
            F.coalesce(F.col("ef"), F.lit(False)).alias("is_edge"),
        )
    )


def personalized_pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    n_iters: int = 3,
    damping_pct: int = 85,
    checkpoint_every: int = 1,
    *,
    n_seeds: int,
) -> DataFrame:
    """Personalized (topic-sensitive) PageRank (Haveliwala 2002): the
    teleport mass returns ONLY to the seed set instead of the whole
    node universe, so ranks measure proximity-to-seeds rather than
    global centrality — the recommendation / related-items /
    crawl-focus variant. Same scaled-integer floor arithmetic as
    :func:`pagerank` (exactly oracle-checkable): rank0 = SCALE/|S| on
    seeds else 0; per round rank' = seed_reset + d*inflow/100 where
    seed_reset = (SCALE/|S|)*(100-d)/100 on seeds else 0.

    Scale shape identical to :func:`pagerank`: 2 longs of state per
    node, one dst-keyed shuffle per round (same key every round — AQE
    reuses the partitioning), localCheckpoint lineage truncation; the
    seed membership rides a broadcast semi-join flag, never a second
    shuffle."""
    edges = edges.filter(F.col("src") != F.col("dst"))
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    s = n_seeds  # caller-supplied: operators never trigger sizing actions
    if s == 0:
        return nodes.select("id", F.lit(0).cast("long").alias("rank_scaled"))
    base = SCALE // s
    reset = (base * (100 - damping_pct)) // 100
    seed_flag = seeds.select(F.col("id"), F.lit(1).alias("_is_seed"))
    marked = nodes.join(F.broadcast(seed_flag), "id", "left").select(
        "id", F.coalesce("_is_seed", F.lit(0)).alias("is_seed")
    )
    ranks = marked.select(
        "id",
        (F.col("is_seed") * base).cast("long").alias("rank_scaled"),
    )
    deg_edges = edges.join(outdeg, "src").persist()

    def step(state, _i):
        contribs = (
            deg_edges.join(state.withColumnRenamed("id", "src"), "src")
            .select(
                "dst",
                F.expr("rank_scaled div outdeg").alias("contrib"),
            )
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inflow"))
        )
        return marked.join(
            contribs.withColumnRenamed("dst", "id"), "id", "left"
        ).select(
            "id",
            (
                F.col("is_seed") * reset
                + F.expr(
                    f"({damping_pct} * coalesce(inflow, 0)) div 100"
                )
            )
            .cast("long")
            .alias("rank_scaled"),
        )

    ranks, _, _ = iterate(
        ranks, step, n_iters,
        checkpoint_every=checkpoint_every, eager_final=True,
    )
    deg_edges.unpersist()
    return ranks


def multi_source_bfs(
    edges: DataFrame,
    seeds: DataFrame,
    n_rounds: int = 3,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Exact shortest-path distances from every seed, bounded at
    ``n_rounds`` hops, over the UNDIRECTED simple graph induced by
    ``edges`` (cols ``src``, ``dst``; parallel edges and self-loops
    dropped). ``seeds``: col ``seed``. Returns (seed, node, dist) for
    every (seed, node) pair within the horizon — the landmark/seed
    BFS that underlies closeness & harmonic centrality sampling
    (Eppstein–Wang 2004 approximate-centrality estimators use exactly
    this: distances from a small landmark sample stand in for the
    all-pairs matrix no 100 TB graph can afford).

    Level-synchronous min-dist iteration: each round unions the
    frontier's neighbors at dist+1 into the state and re-minimizes per
    (seed, node) — the relational BFS whose unrolled form is CTE-exact
    (the pagerank/k-core oracle convention). Distances are small
    integers; no floats anywhere.

    Scale shape: state is (seed, node, dist) — |seeds| bounds the
    multiplier, so landmark counts are chosen O(1) vs the graph; each
    round is ONE node-keyed join against the adjacency (Catalyst
    reuses the adjacency's partitioning across rounds once persisted)
    plus a (seed, node)-keyed min with map-side partials;
    ``localCheckpoint`` truncates lineage so round N doesn't replay
    rounds 1..N-1.
    """
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )
    adj = und.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
        und.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    adj = adj.persist()

    def step(state, i):
        # frontier expansion (round-12, guide §2.3): only pairs FIRST
        # reached last round (dist == i at 0-based round i) can mint a
        # new minimum — a pair at dist d < i already contributed its
        # d+1 neighbors in round d+1, so re-expanding it reproduces
        # rows the min already absorbed. Per-round states are
        # bit-identical to the full-expansion form; the join volume
        # drops from the whole reached set to the newest ring.
        frontier = state.filter(F.col("dist") == i)
        expanded = frontier.join(adj, frontier["node"] == adj["a"]).select(
            frontier["seed"], adj["b"].alias("node"),
            (frontier["dist"] + 1).alias("dist"),
        )
        return (
            state.unionAll(expanded)
            .groupBy("seed", "node")
            .agg(F.min("dist").alias("dist"))
        )

    state, _, _ = iterate(
        seeds.select(
            "seed", F.col("seed").alias("node"), F.lit(0).alias("dist")
        ),
        step,
        n_rounds,
        checkpoint_every=checkpoint_every,
        eager_final=True,
    )
    adj.unpersist()
    return state


INF_DIST = 10**15  # unreachable sentinel: far above any real path sum


def shortest_paths(
    nodes: DataFrame,
    edges_w: DataFrame,
    seeds: DataFrame,
    n_rounds: int,
    checkpoint_every: int = 1,
    converge: bool = True,
) -> tuple[DataFrame, int]:
    """Multi-source weighted shortest paths (Bellman-Ford relaxation,
    round 12) — the first operator built ON the generic fixpoint loop
    (``operators/fixpoint.py:iterate``): state is (id, dist) with
    dist 0 at seeds and the INF sentinel elsewhere; each round relaxes
    dist'(v) = min(dist(v), min over edges (u,v,w) of dist(u)+w), a
    monotone non-increasing map whose fixpoint is the true distance.

    ``converge=True`` early-exits via the frontier-empty probe; because
    relaxation is monotone, a converged run equals the fixed-budget
    run of ANY budget ≥ the convergence round — which is exactly why
    an early-exiting Spark loop can hash-match an oracle that unrolls
    all ``n_rounds`` as chained CTEs (``graph_sssp``'s gate). Returns
    ``(state, rounds_run)``.

    Scale shape (round-12 optimization — guide §2.4/§2.3, measured
    9.6 s → see OPTIMIZATION_r12.md): the state carries a ``changed``
    flag and only the FRONTIER (rows whose dist improved last round)
    joins the edge list each round — classic frontier Bellman-Ford.
    Exact by induction: a node u whose dist did not change in round i
    contributed dist(u)+w to every out-neighbor in the round after u
    last changed, and that value is already folded into the
    neighbor's dist, so re-contributing it cannot lower anything;
    per-round states are therefore bit-identical to the full-relax
    form. Convergence is "frontier empty" — a limit(1) scan of the
    already-checkpointed state — replacing the generic ``unchanged``
    exceptAll probe, which cost two extra shuffles over BOTH state
    copies every round. At 100 TB the frontier shrinks geometrically
    after the graph's effective diameter, so late rounds join
    near-empty frontiers instead of the full reachable set.
    Weights must be non-negative (Bellman-Ford with negative edges
    needs |V|-1 rounds and a cycle check — out of scope, raise).

    Round-13 (guide §2.4/§3, VERDICT r12 item 4, with a measured
    correction): the edge list is PRE-PARTITIONED on ``src`` before
    the persist ONLY when its estimated input size exceeds the
    session's broadcast threshold. Below it the planner broadcasts
    the persisted edges (the round-step plan shows
    BroadcastHashJoin BuildLeft — zero edge-side exchange to save),
    and an unconditional repartition was measured 2x SLOWER at sf0.1:
    it inflates the cached relation from its scan partition count to
    defaultParallelism partitions, and every round's broadcast
    rebuild then collects 32 tiny partitions instead of 2. Above the
    threshold the join is SMJ/SHJ and the cached HashPartitioning(src)
    is what lets every round reuse ONE edge partitioning instead of
    re-exchanging the dominant side per round. Unknown size (remote
    storage) is treated as large — the production default. Partition
    count derives from the environment, not a local constant."""
    spark = edges_w.sparkSession
    thresh = _parse_bytes_conf(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    )
    est = estimated_input_bytes(edges_w)
    ew = edges_w.filter(F.col("src") != F.col("dst"))
    if est is None or est > thresh:
        ew = ew.repartition(spark.sparkContext.defaultParallelism, "src")
    ew = ew.persist()
    state0 = (
        nodes.join(
            seeds.select(F.col("id").alias("id"), F.lit(0).alias("d0")),
            "id",
            "left",
        )
        .select(
            "id",
            F.coalesce(F.col("d0"), F.lit(INF_DIST))
            .cast("long")
            .alias("dist"),
        )
        # round-0 frontier = the seeds (the only rows that "changed"
        # relative to the all-INF prior state)
        .withColumn("changed", F.col("dist") < INF_DIST)
    )

    def step(state: DataFrame, _i: int) -> DataFrame:
        frontier = state.filter(F.col("changed")).select(
            F.col("id").alias("src"), "dist"
        )
        relax = (
            ew.join(frontier, "src")
            .groupBy("dst")
            .agg(F.min(F.col("dist") + F.col("w")).alias("relax"))
        )
        return state.join(
            relax.withColumnRenamed("dst", "id"), "id", "left"
        ).select(
            "id",
            F.least(
                F.col("dist"), F.coalesce(F.col("relax"), F.lit(INF_DIST))
            ).alias("dist"),
            (F.coalesce(F.col("relax"), F.lit(INF_DIST)) < F.col("dist"))
            .alias("changed"),
        )

    def frontier_empty(_prev: DataFrame, new: DataFrame) -> bool:
        # `new` is already eagerly checkpointed by iterate() when a
        # probe is present: this is a limit-1 scan of materialized
        # rows, never a recomputation of the round
        return new.filter(F.col("changed")).limit(1).count() == 0

    # NOTE (round-12, measured): probing/checkpointing on a sparser
    # 2-round cadence was tried and REVERTED — the step references
    # ``state`` twice (frontier filter + final join), so an
    # un-checkpointed round is recomputed per reference inside the
    # next round's job and the loop got ~3x slower, not faster.
    # Every-round eager checkpoints are load-bearing here.
    out, rounds, _ = iterate(
        state0,
        step,
        n_rounds,
        checkpoint_every=checkpoint_every,
        eager_final=True,
        stop_when=frontier_empty if converge else None,
    )
    ew.unpersist()
    return out.select("id", "dist"), rounds
