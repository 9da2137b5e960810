"""Distributed graph primitives over edge DataFrames.

No reference twin: the reference (a 549-line Databricks notebook ETL,
/root/reference/main.py) has no graph operators. These extend
SURVEY.md §2.12's training-pipeline surface — web-graph quality
signals (PageRank-style authority, triangle/wedge density) are
standard corpus-curation features for large-scale training data.

Everything here is integer-exact: ranks are fixed-point BIGINT/
DECIMAL, damping is an exact rational, and division is integer floor
division — so results are bit-identical across engines, data layouts,
and task-retry schedules (no float accumulation order-dependence),
which is what lets the DuckDB oracles hash-match.

Scale posture: each PageRank iteration is one shuffle-on-dst
aggregation over the edge list (the same join shape GraphX/Pregel
lowers to); the per-source degree join is computed once and reused.
Triangle counting joins the canonical (lo < hi) edge list to itself
on the shared middle vertex, then closes wedges with a semi join —
never materialising anything bigger than the wedge set, which is the
standard distributed algorithm (node-iterator join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: fixed-point scale for integer PageRank: rank 1.0 == 10^9 units.
RANK_SCALE = 10**9


def pagerank_integer(
    edges: DataFrame,
    iters: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    init_rank: int = RANK_SCALE,
    every_node_has_inflow: bool = False,
    weight_col: str | None = None,
    dangling: str = "error",
    validate: bool = True,
    assume_distinct: bool = False,
) -> DataFrame:
    """Fixed-iteration integer PageRank over directed ``(src, dst)``.

    ``rank_{i+1}(v) = base + (d_num * sum_{u->v} (rank_i(u) div deg(u)))
    div d_den`` with ``base = ((d_den - d_num) * init) div d_den`` —
    all BIGINT floor arithmetic, so the result is exactly reproducible
    (the small mass lost to flooring is the documented fixed-point
    trade; relative ordering of authorities is what the score is for).

    Nodes are the union of edge endpoints. ``dangling`` controls nodes
    with no out-edge:

    - ``"error"`` (default): an input-validation aggregate counts them
      and raises ``ValueError`` — a general-graph caller never silently
      loses rank mass.
    - ``"drop"``: their mass is not propagated (the classic simplified
      recurrence; exactly mirrors oracles/tests that model inflow from
      out-edge owners only).
    - ``"redistribute"``: per round the total dangling rank ``D`` is
      spread evenly — every node's inflow gains ``D div n_nodes``
      (floor) before damping. Still pure BIGINT arithmetic, still
      bit-reproducible.

    ``every_node_has_inflow=True`` skips the per-iteration nodes-side
    left join (one fewer shuffle per round) AND the dangling check —
    ONLY safe for graphs where every node has both in- and out-edges,
    e.g. a symmetrised (undirected) graph, where dangling nodes are
    structurally impossible.

    ``weight_col`` names a positive BIGINT edge-weight column: a
    source's rank then splits proportionally, each edge receiving
    ``(rank · w) div W_src`` (W_src = the source's total out-weight)
    — still pure floor arithmetic, so still bit-reproducible. None
    (default) is the unweighted equal-split. With weights the caller
    must pass unique (src, dst) pairs (no distinct is applied) and
    rank·w must stay under 2^63; ``validate=True`` (default) enforces
    both with one aggregate over the weighted edge list (duplicate
    pairs → ValueError; conservative overflow bound
    ``max_w · 2·n_edges · init < 2^63`` → ValueError). Trusted callers
    that construct unique pairs structurally (e.g. via groupBy) may
    pass ``validate=False`` to skip that one job.

    Returns (node, rank) with rank BIGINT in ``init_rank`` units.
    """
    if dangling not in ("error", "drop", "redistribute"):
        raise ValueError(f"dangling must be error|drop|redistribute, got {dangling!r}")
    if every_node_has_inflow and dangling == "redistribute":
        raise ValueError(
            "every_node_has_inflow asserts the graph has no dangling nodes "
            "(so there is no mass to redistribute) — drop one of the two flags"
        )
    if weight_col is None:
        # assume_distinct: caller guarantees unique (src, dst) pairs
        # structurally (e.g. distinct canonical pairs + a parity-keyed
        # symmetrising union) — skips one full edge-sized shuffle.
        edges = edges.select("src", "dst")
        if not assume_distinct:
            edges = edges.distinct()
        edges = edges.withColumn("__w", F.lit(1).cast("long"))
    else:
        edges = edges.select(
            "src", "dst", F.col(weight_col).cast("long").alias("__w")
        )
    # distinct/weighted edges persist: the edge-degree build and
    # (general path) the nodes union re-read this
    edges = edges.persist()

    if weight_col is not None and validate:
        chk = edges.agg(
            F.count(F.lit(1)).alias("ne"),
            F.count_distinct(F.struct("src", "dst")).alias("nd"),
            F.max("__w").alias("mw"),
        ).first()
        if chk["ne"] and chk["nd"] != chk["ne"]:
            edges.unpersist()
            raise ValueError(
                f"weighted PageRank requires unique (src, dst) pairs: "
                f"{chk['ne'] - chk['nd']} duplicate edge(s) found"
            )
        # rank(v) <= sum(ranks) <= n_nodes*init <= 2*n_edges*init, so
        # rank*w stays in BIGINT if max_w * 2*ne * init < 2^63.
        if chk["mw"] is not None and chk["mw"] * 2 * chk["ne"] * init_rank >= 2**63:
            edges.unpersist()
            raise ValueError(
                "weighted PageRank rank*weight may overflow BIGINT: "
                f"max_w={chk['mw']}, n_edges={chk['ne']}, init={init_rank} — "
                "rescale weights or init_rank, or cast the rank chain to decimal"
            )

    # Built once, reused by every iteration — pre-hashed on src so the
    # per-iteration rank join only shuffles the (small) rank side: the
    # cached InMemoryRelation's HashPartitioning(src) satisfies the
    # join's distribution requirement, so no edge re-shuffle per round.
    # Degree attaches via a src-partitioned window over the SAME
    # exchange (measured round-10, hash-identical): the former
    # groupBy+join+repartition build cost two edge-sized exchanges —
    # and at cluster scale the degree side of that join is node-sized,
    # NOT broadcastable, so it would shuffle too; one exchange + an
    # in-partition sort replaces all of it.
    from pyspark.sql import Window as _W

    edges_deg = (
        edges.repartition(F.col("src"))
        .withColumn("deg", F.sum("__w").over(_W.partitionBy("src")))
        .persist()
    )

    dangling_nodes = None
    n_nodes = None
    if every_node_has_inflow:
        # symmetrised contract: src set == dst set == node set, so the
        # out-edge owners ARE the nodes and dangling is impossible.
        nodes = edges_deg.select(F.col("src").alias("node")).distinct()
    else:
        nodes = (
            # both endpoints in one pass over the edge cache (r14)
            edges.select(F.explode(F.array("src", "dst")).alias("node"))
            .distinct()
            .persist()
        )
        dangling_nodes = nodes.join(
            edges_deg.select(F.col("src").alias("node")), "node", "left_anti"
        ).persist()
        if dangling != "drop":
            n_dangling = dangling_nodes.count()
            if n_dangling and dangling == "error":
                for df in (edges, edges_deg, nodes, dangling_nodes):
                    df.unpersist()
                raise ValueError(
                    f"{n_dangling} node(s) have no out-edge; their rank mass "
                    "would be lost. Pass dangling='drop' to accept that, "
                    "dangling='redistribute' for exact even redistribution, "
                    "or symmetrise the graph."
                )
            if dangling == "redistribute":
                n_nodes = nodes.count()

    base = ((damping_den - damping_num) * init_rank) // damping_den
    ranks = nodes.withColumn("rank", F.lit(init_rank).cast("long"))
    redistribute = (
        dangling == "redistribute" and dangling_nodes is not None and n_nodes
    )
    for it in range(iters):
        if it == 0:
            # ROUND 1 collapses algebraically (r13): every node's rank
            # is the init constant, so the rank join is a no-op —
            # inline the constant instead of shuffling the node-sized
            # rank frame. Same floor arithmetic, bit-identical.
            contrib = (
                edges_deg.select(
                    F.col("dst").alias("node"),
                    F.expr(
                        f"(CAST({init_rank} AS BIGINT) * __w) div deg"
                    ).alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").alias("inflow"))
            )
        else:
            r = ranks.select(
                F.col("node").alias("__rn"), F.col("rank").alias("__rr")
            )
            contrib = (
                edges_deg.join(r, edges_deg["src"] == r["__rn"])
                .select(
                    F.col("dst").alias("node"),
                    F.expr("(__rr * __w) div deg").alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").alias("inflow"))
            )
        damped = (
            F.lit(base)
            + F.expr(f"({damping_num} * coalesce(inflow, 0L)) div {damping_den}")
        ).cast("long")
        if every_node_has_inflow:
            ranks = contrib.select("node", damped.alias("rank"))
        elif redistribute:
            # total dangling rank this round, spread evenly: one tiny
            # aggregate (dangling set is persisted) broadcast to all.
            share = ranks.join(dangling_nodes, "node", "left_semi").agg(
                F.expr(f"coalesce(sum(rank), 0L) div {n_nodes}").alias("__share")
            )
            ranks = (
                nodes.join(contrib, "node", "left")
                .crossJoin(F.broadcast(share))
                .select(
                    "node",
                    (
                        F.lit(base)
                        + F.expr(
                            f"({damping_num} * (coalesce(inflow, 0L) + __share)) "
                            f"div {damping_den}"
                        )
                    ).cast("long").alias("rank"),
                )
            )
        else:
            ranks = nodes.join(contrib, "node", "left").select(
                "node", damped.alias("rank")
            )
        if redistribute:
            # share + next round's contrib each re-read ranks: without
            # a per-round materialisation the lineage doubles per
            # iteration (2^iters re-evaluation). Lazy — the next
            # round's share broadcast materializes it (r13).
            ranks = ranks.localCheckpoint(eager=False)
    # Materialise the result and release every interned cache so a
    # long-lived session doesn't accumulate executor storage (the
    # returned frame's lineage is truncated, so it no longer needs
    # them).
    out = ranks.localCheckpoint(eager=True)
    edges.unpersist()
    edges_deg.unpersist()
    if not every_node_has_inflow:
        nodes.unpersist()
    if dangling_nodes is not None:
        dangling_nodes.unpersist()
    return out


def label_propagation(
    edges: DataFrame, rounds: int = 3, assume_distinct: bool = False
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007) in a DETERMINISTIC variant: every node starts with its
    own id as label; each round it adopts the most frequent label
    among its neighbors, ties broken toward the LARGEST label —
    (count, label) is a total order, so fixed rounds are
    bit-reproducible and the unrolled-CTE oracle hash-matches (the
    classic random tie-break is what makes textbook LPA
    non-deterministic; any fixed tie order preserves the algorithm).

    Caller contract: ``edges`` is a SYMMETRISED (undirected) edge
    list, so src set == dst set == node set and every node hears from
    at least one neighbor each round.

    Scale shape (the Pregel lowering): per round one join of the
    label frame against the pre-hashed persisted edge list (only the
    label side shuffles) + ONE exchange of the joined votes on dst —
    both keyed aggregations ((node, label) counts, then the per-node
    argmax via one struct-max) run exchange-free on top of it, since
    HashPartitioning(dst) satisfies both groupings. Work per round is
    O(edges), rounds are fixed. (r14: the former two-exchange agg
    chain — partial-agg on (dst, label), exchange, then a second
    exchange on dst — measured 1.3x slower at sf0.1 and 2.2x slower
    at the 10x probe than this single raw-vote exchange; the two
    stage barriers cost more than the partial aggregation saves.)

    ``assume_distinct=True`` skips the defensive ``distinct()`` — ONLY
    safe when the caller constructs unique (src, dst) pairs
    structurally (e.g. a symmetrising union of a distinct canonical
    pair list); duplicates would otherwise double-count votes. Saves
    one full edge-sized shuffle.

    Returns (node, label).
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    edges = edges.select("src", "dst")
    if not assume_distinct:
        edges = edges.distinct()
    edges = edges.repartition(F.col("src")).persist()
    # ROUND 1 collapses algebraically (r13): with identity
    # initialization every neighbor contributes exactly ONE distinct
    # label (its own id) over the distinct edge list — all counts are
    # 1, so argmax-by-(count, label) is simply the LARGEST neighbor
    # id. One max aggregate replaces the join + double aggregation
    # (and the separate node-distinct label init), with bit-identical
    # results — the tie order (count, label) is the total order the
    # docstring pins, and at count==1 it degenerates to max(label).
    labels = edges.groupBy(F.col("dst").alias("node")).agg(
        F.max("src").alias("label")
    )
    for _ in range(rounds - 1):
        lab = labels.select(F.col("node").alias("__n"), F.col("label").alias("__l"))
        labels = (
            edges.join(lab, edges["src"] == lab["__n"])
            # ONE exchange of the raw votes on dst: HashPartitioning(dst)
            # satisfies both downstream groupings, so the (node, label)
            # count and the argmax run exchange-free on top of it (r14 —
            # measured faster than the partial-agg two-exchange chain at
            # x1 AND x10; see the docstring's scale-shape note).
            .repartition(F.col("dst"))
            .groupBy(F.col("dst").alias("node"), F.col("__l").alias("lab"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .groupBy("node")
            .agg(F.max(F.struct(F.col("cnt"), F.col("lab"))).alias("m"))
            .select("node", F.col("m.lab").alias("label"))
        )
    # NOTE (r11): per-round eager localCheckpoint — the cadence that
    # pays off for pagerank/kcore/bfs — was measured SLOWER here
    # (isolated warm floors 5.45 s vs 4.63 s at sf0.1): at 3 rounds
    # the lazy plan is shallow enough that one end-to-end execution
    # beats three materialization barriers. Re-evaluate if rounds
    # ever grows past ~5 (plan depth is 3 stages/round).
    # NOTE (r12, VERDICT r11 #3): a converged-frontier early exit —
    # oracle-safe only at a FIXPOINT (labels_{r+1} == labels_r) — can
    # NEVER fire on the co-purchase graph: synchronous LPA oscillates
    # on (near-)bipartite structure, and the sf0.1 probe
    # (scripts/lpa_convergence_probe.py) measured a CONSTANT 34,999
    # changed labels in every one of 6 rounds — no fixpoint inside or
    # anywhere near the 3-round contract. The per-round changed-count
    # check (a join + count materializing each round) would be pure
    # added cost, so the fixed unroll stands. kcore/ktruss/bfs keep
    # their early exits (their peels/frontiers are monotone; LPA is
    # not).
    out = labels.localCheckpoint(eager=True)
    edges.unpersist()
    return out


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Global triangle census of an undirected graph.

    ``edges`` is any (src, dst) pair list; it is canonicalised to
    distinct ``lo < hi`` pairs (self-loops dropped). Returns one row:
    ``n_nodes, n_edges, n_wedges, n_triangles`` — all BIGINT, so the
    global clustering coefficient ``3*tri / wedges`` can be formed
    downstream without baking a float division into the result.

    All of n_nodes / n_edges / n_wedges fall out of ONE aggregate over
    the degree table (sum(d) == 2·edges; wedges == sum d(d-1)/2), so
    the census costs a single groupBy + scalar agg beyond the triangle
    enumeration itself.
    """
    canon = (
        edges.select(
            F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
        )
        .filter(F.col("lo") < F.col("hi"))
        .distinct()
        .persist()
    )
    deg = (
        # both endpoints in ONE pass over the canon cache (r14): the
        # union-of-two-selects form raced 2x tasks against the unbuilt
        # cache partitions — explode reads each partition once.
        canon.select(F.explode(F.array("lo", "hi")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        .persist()
    )
    census = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.coalesce(F.expr("sum(d) div 2"), F.lit(0).cast("long")).alias("n_edges"),
        F.coalesce(
            F.sum(F.expr("(d * (d - 1)) div 2")), F.lit(0).cast("long")
        ).alias("n_wedges"),
    )
    # Degree-oriented counting (compact-forward): orient every edge
    # from its lower-(degree, id) endpoint to the higher one, then for
    # each oriented edge (u, v) count |N+(u) ∩ N+(v)| by intersecting
    # the two SORTED forward-adjacency arrays — each triangle is
    # counted exactly once, at its lowest-ordered vertex. Max forward
    # degree in this orientation is O(sqrt(m)), so adjacency rows stay
    # bounded under hubs, and the intersection form never materialises
    # the wedge set at all (the wedge-pair join this replaces shuffled
    # ~m^1.5 rows — 41M at sf0.1 — before the closing semi join; the
    # intersection does the same work inside a map-side expression
    # over the m oriented edges).
    dl = deg.select(F.col("node").alias("lo"), F.col("d").alias("dlo"))
    dh = deg.select(F.col("node").alias("hi"), F.col("d").alias("dhi"))
    lo_first = (F.col("dlo") < F.col("dhi")) | (
        (F.col("dlo") == F.col("dhi")) & (F.col("lo") < F.col("hi"))
    )
    oriented = (
        canon.join(dl, "lo")
        .join(dh, "hi")
        .select(
            F.when(lo_first, F.col("lo")).otherwise(F.col("hi")).alias("u"),
            F.when(lo_first, F.col("hi")).otherwise(F.col("lo")).alias("v"),
        )
        # read three times (adjacency build + both join streams) and
        # adj itself feeds two differently-keyed exchanges — without
        # the persists each consumer re-ran the canon⋈deg⋈deg
        # orientation from scratch (r14, measured ~25 task-s of
        # duplicate work at sf0.1).
        .persist()
    )
    adj = (
        oriented.groupBy("u")
        .agg(F.sort_array(F.collect_list("v")).alias("nb"))
        .persist()
    )
    a_u = adj.select(F.col("u").alias("__au"), F.col("nb").alias("__nbu"))
    a_v = adj.select(F.col("u").alias("__av"), F.col("nb").alias("__nbv"))
    closed = (
        # shuffle-hash, not sort-merge: the adjacency side is one
        # bounded-width row per node (build side), while sorting would
        # buffer every edge row WITH its attached O(sqrt m) arrays —
        # that sort buffer is what blows small heaps, and at cluster
        # scale it's pure wasted width through two sorts. Hash build
        # on the per-node side streams the edges untouched.
        oriented.join(a_u.hint("shuffle_hash"), oriented["u"] == a_u["__au"])
        # inner join: an edge whose head has no forward neighbours
        # contributes zero triangles and may drop
        .join(a_v.hint("shuffle_hash"), oriented["v"] == a_v["__av"])
        .select(F.size(F.array_intersect("__nbu", "__nbv")).alias("k"))
    )
    n_tri = closed.agg(
        F.coalesce(F.sum("k"), F.lit(0)).cast("long").alias("n_triangles")
    )
    # One-row result: materialise it and drop the canon/deg/oriented/adj
    # caches so repeated calls in a long-lived session don't leak storage.
    out = census.crossJoin(n_tri).localCheckpoint(eager=True)
    for df in (canon, deg, oriented, adj):
        df.unpersist()
    return out


def triangle_counts_per_node(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts of an undirected graph —
    the node-resolved sibling of :func:`triangle_stats` (round 13),
    feeding local-clustering-coefficient readouts.

    Same compact-forward orientation (orient each edge toward the
    higher-(degree, id) endpoint, forward degree O(sqrt m)): for an
    oriented edge (u, v) the sorted-adjacency intersection
    ``N+(u) ∩ N+(v)`` closes each triangle exactly once, so u and v
    are credited ``|∩|`` and each common neighbor w is credited 1 via
    one explode — total exploded rows == 3·n_triangles, linear in the
    triangle count, never the wedge set.

    Returns ``(node, d, triangles)`` for EVERY node (distinct-neighbor
    degree; triangles 0 when none), eager-checkpointed with the
    canon/deg caches released.
    """
    canon = (
        edges.select(
            F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
        )
        .filter(F.col("lo") < F.col("hi"))
        .distinct()
        .persist()
    )
    deg = (
        # both endpoints in ONE pass over the canon cache (r14; see
        # triangle_stats — same union-races-the-unbuilt-cache fix)
        canon.select(F.explode(F.array("lo", "hi")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        .persist()
    )
    dl = deg.select(F.col("node").alias("lo"), F.col("d").alias("dlo"))
    dh = deg.select(F.col("node").alias("hi"), F.col("d").alias("dhi"))
    lo_first = (F.col("dlo") < F.col("dhi")) | (
        (F.col("dlo") == F.col("dhi")) & (F.col("lo") < F.col("hi"))
    )
    oriented = (
        canon.join(dl, "lo")
        .join(dh, "hi")
        .select(
            F.when(lo_first, F.col("lo")).otherwise(F.col("hi")).alias("u"),
            F.when(lo_first, F.col("hi")).otherwise(F.col("lo")).alias("v"),
        )
        # consumed by the adjacency build AND the join stream; adj by
        # two differently-keyed exchanges — persist both or every
        # consumer re-runs the orientation joins (r14, triangle_stats
        # rationale)
        .persist()
    )
    adj = (
        oriented.groupBy("u")
        .agg(F.sort_array(F.collect_list("v")).alias("nb"))
        .persist()
    )
    a_u = adj.select(F.col("u").alias("__au"), F.col("nb").alias("__nbu"))
    a_v = adj.select(F.col("u").alias("__av"), F.col("nb").alias("__nbv"))
    closed = (
        # shuffle-hash for the same reason triangle_stats documents:
        # the adjacency build side is one bounded-width row per node;
        # sort-merge would buffer edge rows WITH O(sqrt m) arrays.
        oriented.join(a_u.hint("shuffle_hash"), oriented["u"] == a_u["__au"])
        .join(a_v.hint("shuffle_hash"), oriented["v"] == a_v["__av"])
        .select("u", "v", F.array_intersect("__nbu", "__nbv").alias("ws"))
        .filter(F.size("ws") > 0)
    )
    # ONE pass over the closed-edge frame: a union of three selects
    # would recompute the adjacency joins + intersections per branch
    # (measured 8.75x at the 10x probe vs 3.1x for the global census);
    # concat the u/v credits with the per-w credits into a single
    # exploded struct array instead — map-side, joins evaluated once.
    credits = closed.select(
        F.explode(
            F.concat(
                F.array(
                    F.struct(
                        F.col("u").alias("node"), F.size("ws").alias("c")
                    ),
                    F.struct(
                        F.col("v").alias("node"), F.size("ws").alias("c")
                    ),
                ),
                F.transform(
                    "ws",
                    lambda w: F.struct(
                        w.alias("node"), F.lit(1).alias("c")
                    ),
                ),
            )
        ).alias("x")
    ).select(F.col("x.node").alias("node"), F.col("x.c").alias("c"))
    tri = credits.groupBy("node").agg(F.sum("c").cast("long").alias("triangles"))
    out = (
        deg.join(tri, "node", "left")
        .select(
            "node",
            F.col("d").cast("long").alias("d"),
            F.coalesce(F.col("triangles"), F.lit(0).cast("long")).alias(
                "triangles"
            ),
        )
        .localCheckpoint(eager=True)
    )
    for df in (canon, deg, oriented, adj):
        df.unpersist()
    return out


def ktruss_support(
    edges: DataFrame, k: int, rounds: int = 4, stats: dict | None = None
) -> DataFrame:
    """k-truss of an undirected graph (Cohen 2008): the maximal
    subgraph where every edge participates in >= k-2 triangles, found
    by fixed-round support peeling — drop every edge whose current
    triangle support is below k-2, recompute, repeat. The cohesive-
    subgraph step past :func:`kcore_degrees` (every k-truss is inside
    the (k-1)-core but strictly tighter) and the standard community
    scaffold at billion-edge scale (Cohen's original motivation).

    ``edges`` is any (src, dst) pair list; canonicalised to distinct
    ``lo < hi`` pairs (self-loops dropped). Same convergence contract
    as ``kcore_degrees``: early exit the first round with no
    under-support edge; peeling is monotone (removing edges only
    lowers support), so a fixed ``rounds``-deep SQL unroll computes
    the SAME fixpoint whenever convergence happens within ``rounds``
    — which is what lets the oracle mirror the computation
    CTE-for-CTE. If the loop exhausts ``rounds`` unconverged, raise —
    a caller can never mistake a partial peel for the truss.

    Scale shape: per round, support comes from degree-ORIENTED
    triangle enumeration (the triangle_stats orientation — forward
    adjacency bounded O(sqrt m) under hubs, so wedge work is O(m^1.5)
    not sum-of-degree-squares), each found triangle exploding to its
    3 member edges and sum-reducing on the canonical edge key; the
    peel is one left join + filter. Survivors are eagerly
    checkpointed per round (the round reads its predecessor many
    times). Integer-only, bit-reproducible.

    Returns (lo, hi, sup): every truss edge with its within-truss
    support (BIGINT). Empty frame if the k-truss is empty.

    ``stats``, when given, receives ``{"rounds": <executed support
    rounds including the converging one>}`` after the peel — probe
    instrumentation only (scripts/ktruss_probe.py), no effect on the
    result.
    """
    if k < 3:
        raise ValueError(f"k must be >= 3, got {k}")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    cur = (
        edges.select(
            F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
        )
        .filter(F.col("lo") < F.col("hi"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sup_frame = None
    converged = False
    executed_rounds = 0
    for _ in range(rounds):
        executed_rounds += 1
        # both directed orientations in ONE pass over the survivor
        # frame (r14 — the union form scanned it twice)
        und = cur.select(
            F.explode(
                F.array(
                    F.struct(F.col("lo").alias("u"), F.col("hi").alias("v")),
                    F.struct(F.col("hi").alias("u"), F.col("lo").alias("v")),
                )
            ).alias("e")
        ).select("e.u", "e.v")
        deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
        ud = (
            und.join(deg, "u")
            .join(
                deg.select(F.col("u").alias("v"), F.col("d").alias("dv")), "v"
            )
        )
        # fwd feeds the adjacency build AND the triangle join stream;
        # adj feeds two differently-keyed exchanges — persist both or
        # each consumer re-runs the degree-orientation joins (r14, the
        # triangle_stats rationale). Released after the round's probe
        # (the materializing action) below.
        fwd = ud.filter(
            (F.col("d") < F.col("dv"))
            | ((F.col("d") == F.col("dv")) & (F.col("u") < F.col("v")))
        ).select("u", "v").persist()
        adj = (
            fwd.groupBy("u")
            .agg(F.array_sort(F.collect_list("v")).alias("nb"))
            .persist()
        )
        # every found triangle (u, v, w ∈ N+(u)∩N+(v)) contributes to
        # its 3 member edges in ONE explode over the closed-edge rows
        # (r14): the former tri-then-3-way-union re-ran the adjacency
        # joins + intersections once per branch.
        contrib = (
            fwd.join(adj.select(F.col("u"), F.col("nb").alias("nb_u")), "u")
            .join(
                adj.select(F.col("u").alias("v"), F.col("nb").alias("nb_v")), "v"
            )
            .select(
                F.explode(
                    F.expr(
                        "flatten(transform(array_intersect(nb_u, nb_v), w ->"
                        " array(struct(least(u, v) AS lo, greatest(u, v) AS hi),"
                        "       struct(least(u, w) AS lo, greatest(u, w) AS hi),"
                        "       struct(least(v, w) AS lo, greatest(v, w) AS hi))))"
                    )
                ).alias("p")
            )
            .select("p.lo", "p.hi")
        )
        s = contrib.groupBy("lo", "hi").agg(F.count(F.lit(1)).alias("sup"))
        e = cur.join(s, ["lo", "hi"], "left").select(
            "lo",
            "hi",
            F.coalesce(F.col("sup"), F.lit(0)).cast("long").alias("sup"),
            # lazy: the under-support probe right below materializes
            # round + checkpoint in ONE job (r13)
        ).localCheckpoint(eager=False)
        sup_frame = e
        n_under = e.filter(F.col("sup") < k - 2).count()
        fwd.unpersist()
        adj.unpersist()
        if n_under == 0:
            converged = True
            break
        # survivors stay lazy too — next round's probe materializes
        # them off e's already-checkpointed partitions
        cur = e.filter(F.col("sup") >= k - 2).select("lo", "hi").localCheckpoint(
            eager=False
        )
    if stats is not None:
        stats["rounds"] = executed_rounds
    if not converged:
        raise ValueError(
            f"k-truss peel did not converge in {rounds} rounds; increase rounds"
        )
    return sup_frame


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 3,
) -> DataFrame:
    """Bounded-depth BFS over directed ``(src, dst)``: minimum hop
    distance (0..max_hops) from any node in ``sources`` (a one-column
    ``node`` frame).

    Pregel-shaped frontier expansion: each round joins ONLY the new
    frontier against the edge list (shuffle keyed on src), then
    anti-joins the visited set — work per round is proportional to the
    frontier, not the graph, and a node is labelled the first round it
    is reached, which IS its minimum distance (no re-visits, no min
    reduction needed). Integer hop counts, so exactly reproducible.

    Returns (node, dist) for every node within ``max_hops``.
    """
    # pre-hashed on src once (r14): each round's frontier join reuses
    # the cache's HashPartitioning(src), so only the (small) frontier
    # side shuffles — the edge list never re-exchanges per round
    edges = edges.select("src", "dst").repartition(F.col("src")).persist()
    visited = sources.select("node").distinct().withColumn(
        "dist", F.lit(0).cast("long")
    )
    frontier = visited.select("node")
    frontiers: list[DataFrame] = []
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(h).cast("long"))
            # each round's frontier is materialised once; without this
            # the visited lineage is re-evaluated 2^h times (it feeds
            # both the anti-join and the union)
            .persist()
        )
        frontiers.append(nxt)
        visited = visited.union(nxt)
        frontier = nxt.select("node")
    # Materialise, then release the per-round frontier caches and the
    # edge cache — the truncated-lineage result no longer needs them,
    # so long-lived sessions don't leak executor storage.
    out = visited.localCheckpoint(eager=True)
    edges.unpersist()
    for f in frontiers:
        f.unpersist()
    return out


def personalized_pagerank_integer(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    init_rank: int = RANK_SCALE,
    symmetric: bool = False,
    assume_distinct: bool = False,
) -> DataFrame:
    """Personalized PageRank: the teleport mass lands ONLY on the seed
    set, so rank measures proximity to the seeds — the corpus-
    expansion primitive (grow a trusted seed cohort outward through
    the interaction graph). ``seeds`` is a one-column ``node`` frame;
    it is intersected with the graph's node set first (a seed with no
    edges can neither receive nor spread mass).

    Same fixed-point BIGINT arithmetic as :func:`pagerank_integer`:
    ``rank_{i+1}(v) = base(v) + (d_num · inflow(v)) div d_den`` with
    ``base(v) = ((d_den−d_num) · init · n_nodes) div (d_den · n_seeds)``
    for seeds and 0 otherwise (total teleport mass matches the uniform
    variant, concentrated on the seeds), starting from rank init on
    seeds / 0 elsewhere. Floor-division mass loss is the documented
    fixed-point trade. Bit-reproducible, so the unrolled-CTE oracle
    hash-matches.

    Scale shape: identical to the general PageRank path — one join
    against pre-hashed cached edges + one shuffle-on-dst aggregation
    per round, plus the nodes-side left join; the seed flag rides as
    a broadcast semi/left join. n_nodes/n_seeds are two bounded
    driver scalars (counts). Dangling nodes are rejected loudly, as
    in the default ``pagerank_integer`` contract; ``symmetric=True``
    skips that validation AND the nodes-side union-distinct (src set
    == node set) — ONLY safe when the caller constructs an
    undirected/symmetrised edge list, where dangling nodes are
    structurally impossible.

    Returns (node, rank), rank BIGINT.
    """
    from pyspark.sql import Window as _W

    edges = edges.select("src", "dst")
    if not assume_distinct:
        edges = edges.distinct()
    edges = edges.persist()
    # Degree attaches via a src-partitioned window over the one
    # pre-hash exchange (round-10; see pagerank_integer — the former
    # groupBy+join+repartition build cost two edge-sized exchanges
    # and a node-sized join side that can't broadcast at scale).
    edges_deg = (
        edges.repartition(F.col("src"))
        .withColumn(
            "deg", F.count(F.lit(1)).over(_W.partitionBy("src")).cast("long")
        )
        .persist()
    )
    if symmetric:
        nodes = edges_deg.select(F.col("src").alias("node")).distinct().persist()
    else:
        nodes = (
            # both endpoints in one pass over the edge cache (r14)
            edges.select(F.explode(F.array("src", "dst")).alias("node"))
            .distinct()
            .persist()
        )
        n_dangling = nodes.join(
            edges_deg.select(F.col("src").alias("node")), "node", "left_anti"
        ).count()
        if n_dangling:
            edges.unpersist()
            edges_deg.unpersist()
            nodes.unpersist()
            raise ValueError(
                f"{n_dangling} node(s) have no out-edge; personalized PageRank "
                "would lose their rank mass — symmetrise the graph or drop sinks"
            )
    seed_distinct = seeds.select("node").distinct()
    seed_nodes = seed_distinct.join(nodes, "node", "left_semi").persist()
    # n_nodes and n_seeds in ONE action (r14): count every node row and
    # count the non-null seed flags of the same broadcast left join —
    # two separate .count() jobs were pure per-query driver latency.
    counts = nodes.join(
        F.broadcast(seed_distinct.withColumn("__s", F.lit(True))), "node", "left"
    ).agg(
        F.count(F.lit(1)).alias("__nn"), F.count("__s").alias("__ns")
    ).first()
    n_nodes, n_seeds = counts["__nn"], counts["__ns"]
    if n_seeds == 0:
        edges.unpersist()
        edges_deg.unpersist()
        nodes.unpersist()
        seed_nodes.unpersist()
        raise ValueError("no seed intersects the graph's node set")
    base_seed = ((damping_den - damping_num) * init_rank * n_nodes) // (
        damping_den * n_seeds
    )
    seed_flag = seed_nodes.withColumn("__is_seed", F.lit(True))
    base = F.when(
        F.coalesce(F.col("__is_seed"), F.lit(False)), F.lit(base_seed)
    ).otherwise(F.lit(0)).cast("long")
    flagged = nodes.join(F.broadcast(seed_flag), "node", "left").persist()
    ranks = flagged.select(
        "node",
        F.when(
            F.coalesce(F.col("__is_seed"), F.lit(False)), F.lit(init_rank)
        ).otherwise(F.lit(0)).cast("long").alias("rank"),
    )
    for it in range(iters):
        if it == 0:
            # ROUND 1 collapses (r13): rank is init on seeds and 0
            # elsewhere, so the node-sized shuffle join degenerates to
            # a BROADCAST left join against the contract-small seed
            # set with the init constant inlined. LEFT (not semi):
            # every dst must keep its contrib row — the symmetric path
            # assigns ranks = contrib, and dropping zero-inflow rows
            # would erase non-seed-adjacent nodes' rank rows (and with
            # them a seed's teleport base next round).
            sflag = seed_nodes.select(
                F.col("node").alias("__rn"), F.lit(True).alias("__s")
            )
            contrib = (
                edges_deg.join(
                    F.broadcast(sflag), edges_deg["src"] == sflag["__rn"], "left"
                )
                .select(
                    F.col("dst").alias("node"),
                    F.when(
                        F.coalesce(F.col("__s"), F.lit(False)),
                        F.expr(f"CAST({init_rank} AS BIGINT) div deg"),
                    )
                    .otherwise(F.lit(0).cast("long"))
                    .alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").alias("inflow"))
            )
        else:
            r = ranks.select(
                F.col("node").alias("__rn"), F.col("rank").alias("__rr")
            )
            contrib = (
                edges_deg.join(r, edges_deg["src"] == r["__rn"])
                .select(F.col("dst").alias("node"), F.expr("__rr div deg").alias("c"))
                .groupBy("node")
                .agg(F.sum("c").alias("inflow"))
            )
        damped = (
            base
            + F.expr(f"({damping_num} * coalesce(inflow, 0L)) div {damping_den}")
        ).cast("long")
        if symmetric:
            # every node has in-edges (src set == dst set == node
            # set) and every node holds a rank row, so contrib covers
            # the full node set each round: the seed flag attaches as
            # a broadcast map-side join — one fewer node-sized
            # shuffle join per round than the general path below.
            ranks = contrib.join(F.broadcast(seed_flag), "node", "left").select(
                "node", damped.alias("rank")
            )
        else:
            ranks = flagged.join(contrib, "node", "left").select(
                "node", damped.alias("rank")
            )
    out = ranks.localCheckpoint(eager=True)
    for df in (edges, nodes, seed_nodes, edges_deg, flagged):
        df.unpersist()
    return out


def kcore_degrees(
    edges: DataFrame,
    k: int,
    rounds: int = 8,
) -> DataFrame:
    """k-core of an undirected graph by fixed-round peeling: repeatedly
    drop every node whose current degree is below ``k`` (with all its
    edges) until no such node remains. Classic corpus/graph quality
    filter — the k-core is the maximal subgraph of minimum degree k.

    ``edges`` is any (src, dst) pair list; it is canonicalised to
    distinct undirected edges (self-loops dropped). At most ``rounds``
    peel rounds run, with an early exit the first round that finds no
    under-degree node (one cheap count per round on the degree
    aggregate the peel needs anyway — at 10x data the post-fixpoint
    rounds were the dominant cost). Peeling is monotone, so a fixed
    ``rounds``-deep SQL unroll computes the SAME fixpoint the early
    exit does whenever convergence happens within ``rounds`` — which
    is what lets the oracle mirror the computation CTE-for-CTE (same
    shape as the unrolled PageRank oracles). If the loop exhausts
    ``rounds`` without converging, a final degree aggregate raises
    ``ValueError`` — a caller can never mistake a partial peel for
    the core.

    Scale shape: each round is one degree aggregation (shuffle on
    node) plus two anti joins removing edges incident to peeled nodes
    — work proportional to the surviving edge set, which shrinks
    monotonically. Each round's survivors are materialised eagerly
    (localCheckpoint): the round reads its predecessor three times
    (degree agg + both anti joins), so an un-truncated logical plan
    would grow 3^rounds — the checkpoint keeps both the plan tree and
    the execution linear in ``rounds``. Integer-only, so
    bit-reproducible.

    Returns (node, core_deg): every k-core node with its within-core
    degree (BIGINT). Empty frame if the k-core is empty.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    canon = (
        edges.select(
            F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
        )
        .filter(F.col("lo") < F.col("hi"))
        .distinct()
    )
    # symmetric directed form: degree(v) == out-degree(v), and removing
    # a node means dropping rows where it appears on EITHER side. Both
    # directions in ONE pass over the canonical list (r14), then
    # pre-hashed on src ONCE: every peel round's degree aggregate
    # reuses the checkpoint's HashPartitioning(src) exchange-free, and
    # the (small) peel sets anti-join as broadcasts that preserve it —
    # so the per-round exchange disappears entirely.
    cur = canon.select(
        F.explode(
            F.array(
                F.struct(F.col("lo").alias("src"), F.col("hi").alias("dst")),
                F.struct(F.col("hi").alias("src"), F.col("lo").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst").repartition(F.col("src")).localCheckpoint(eager=True)
    converged = False
    # The survivor checkpoint is LAZY (r13): the next round's
    # bad.count() — or the final degree aggregate — is the
    # materializing action, so peel + checkpoint run as ONE job per
    # round instead of two. The previous round's `bad` cache must
    # outlive that materialization (the lazy plan anti-joins it), so
    # its unpersist is deferred one round.
    prev_bad = None
    for _ in range(rounds):
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        bad = deg.filter(F.col("d") < k).select(F.col("src").alias("__bad")).persist()
        n_bad = bad.count()  # materializes the pending lazy checkpoint
        if prev_bad is not None:
            prev_bad.unpersist()
            prev_bad = None
        if n_bad == 0:
            bad.unpersist()
            converged = True
            break
        cur = (
            cur.join(bad, cur["src"] == bad["__bad"], "left_anti")
            .join(bad, cur["dst"] == bad["__bad"], "left_anti")
            .localCheckpoint(eager=False)
        )
        prev_bad = bad
    out = cur.groupBy("src").agg(F.count(F.lit(1)).alias("core_deg")).select(
        F.col("src").alias("node"), F.col("core_deg").cast("long").alias("core_deg")
    ).localCheckpoint(eager=True)
    if prev_bad is not None:
        prev_bad.unpersist()
    if not converged:
        low = out.agg(F.min("core_deg").alias("m")).first()["m"]
        if low is not None and low < k:
            raise ValueError(
                f"k-core peel did not converge in {rounds} rounds "
                f"(minimum surviving degree {low} < k={k}); increase rounds"
            )
    return out


def skyline_2d(
    df: DataFrame,
    minimize_col: str,
    maximize_col: str,
) -> DataFrame:
    """Distributed 2-D Pareto frontier: rows where no other row is
    <= on ``minimize_col`` AND >= on ``maximize_col`` with at least
    one strict inequality.

    Collapses to distinct (min_val -> max of max_val) first, then runs
    the classic sort + prefix-max sweep — but two-phase, so no single
    task sees the whole table: range-partition on the minimised
    column, per-partition prefix max within each range, plus a
    broadcast prefix max of earlier partitions' totals (same shape as
    keys.surrogate_keys(mode="distributed")). The kept set is
    invariant to the (sampled, nondeterministic) range boundaries
    because "earlier partition" == "strictly smaller minimise key"
    after the distinct-collapse.
    """
    best = df.groupBy(minimize_col).agg(F.max(maximize_col).alias(maximize_col))
    ranged = best.repartitionByRange(F.col(minimize_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_in = (
        Window.partitionBy("__pid")
        .orderBy(minimize_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pmax = ranged.groupBy("__pid").agg(F.max(maximize_col).alias("__pm"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    # tiny frame: one row per shuffle partition
    prefix = pmax.withColumn("__prev", F.max("__pm").over(w_off)).select("__pid", "__prev")
    swept = (
        ranged.withColumn("__local", F.max(maximize_col).over(w_in))
        .join(F.broadcast(prefix), "__pid")
        .withColumn("__dom", F.greatest(F.col("__local"), F.col("__prev")))
    )
    return (
        swept.filter(F.col("__dom").isNull() | (F.col(maximize_col) > F.col("__dom")))
        .select(minimize_col, maximize_col)
    )


def hits_integer(
    edges: DataFrame,
    iters: int = 2,
    scale: int = RANK_SCALE,
) -> tuple[DataFrame, DataFrame]:
    """Fixed-iteration integer HITS (Kleinberg 1999) over directed
    ``(src, dst)``: hubs live on the src side, authorities on the dst
    side. Per iteration ``a_raw(v) = sum_{u->v} h(u)`` then
    ``h_raw(u) = sum_{u->v} a(v)``, each L1-renormalized to total mass
    ``scale`` in pure integer arithmetic —
    ``x' = (x_raw · scale) div sum(x_raw)`` computed over
    DECIMAL(38,0) so the product never wraps (x_raw <= deg·scale ~
    1e15; times scale ~ 1e24, far inside 38 digits; the BIGINT `div`
    result is <= scale). Floor-division mass loss is the documented
    fixed-point trade (same contract as :func:`pagerank_integer`);
    everything is bit-reproducible, so an unrolled-CTE oracle using
    HUGEINT `//` matches exactly (both are floor-on-positive).

    Classic HITS normalizes by L2 — an inherently float operation; L1
    keeps the eigenvector direction under power iteration while
    staying integer-exact, which is what the hash-parity contract
    needs (any positive rescaling per step preserves the ordering and
    the limit direction).

    Scale shape: per iteration one join of the (node, score) frame
    against a pre-hashed persisted edge copy keyed on the join side
    (only the score side shuffles) + one keyed aggregation + one
    scalar total (tree-aggregated, broadcast back). Raw-score frames
    are eagerly checkpointed because two branches (the total and the
    normalize) read them — without the cut the logical plan doubles
    per iteration.

    Returns ``(authorities, hubs)``: (node, auth) over the dst set and
    (node, hub) over the src set, both BIGINT in ``scale`` units.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    edges = edges.select("src", "dst").distinct().persist()
    e_by_src = edges.repartition(F.col("src")).persist()
    e_by_dst = edges.repartition(F.col("dst")).persist()

    def _normalize(raw: DataFrame) -> DataFrame:
        # read by total AND join; lazy — the total's broadcast build
        # is the materializing action, one job instead of two (r13)
        raw = raw.localCheckpoint(eager=False)
        tot = raw.agg(
            F.sum(F.col("raw").cast("decimal(38,0)")).alias("__tot")
        )
        return raw.crossJoin(F.broadcast(tot)).select(
            "node",
            F.expr(
                f"CAST((CAST(raw AS DECIMAL(38,0)) * {scale}) div __tot AS BIGINT)"
            ).alias("score"),
        )

    hubs = e_by_src.select(F.col("src").alias("node")).distinct().withColumn(
        "score", F.lit(scale).cast("long")
    )
    auth = None
    for it in range(iters):
        if it == 0:
            # ROUND 1 collapses (r13): every hub score is the init
            # constant, so sum(__hs) per dst == in-count * scale —
            # skip both the hub-init distinct and the join. Same
            # integer arithmetic, bit-identical.
            auth = _normalize(
                e_by_src.groupBy(F.col("dst").alias("node")).agg(
                    (F.count(F.lit(1)) * F.lit(scale).cast("long")).alias("raw")
                )
            )
        else:
            h = hubs.select(
                F.col("node").alias("__hn"), F.col("score").alias("__hs")
            )
            auth = _normalize(
                e_by_src.join(h, e_by_src["src"] == h["__hn"])
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("__hs").alias("raw"))
            )
        a = auth.select(F.col("node").alias("__an"), F.col("score").alias("__as"))
        hubs = _normalize(
            e_by_dst.join(a, e_by_dst["dst"] == a["__an"])
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("__as").alias("raw"))
        )
    out_a = auth.withColumnRenamed("score", "auth").localCheckpoint(eager=True)
    out_h = hubs.withColumnRenamed("score", "hub").localCheckpoint(eager=True)
    for df in (edges, e_by_src, e_by_dst):
        df.unpersist()
    return out_a, out_h


def multi_source_ball_sizes(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 3,
) -> DataFrame:
    """Exact per-seed neighborhood function: for every seed and hop
    h = 0..max_hops, the number of nodes at distance exactly h — the
    exact small-cohort form of the neighborhood-function estimators
    (ANF/HyperBall) used to read graph reach and effective diameter;
    over a co-purchase graph it is the seed cohort's influence-growth
    curve. ``seeds`` is a one-column ``node`` frame (keep it BOUNDED —
    state is the labeled visited set, Σ_seeds |ball(seed, h)| rows,
    linear in seeds x reach by construction).

    Pregel-shaped labeled BFS on the composite (seed, node) key:
    each round joins ONLY the new frontier against the edge list
    (shuffle keyed on node=src), dedups, then anti-joins the visited
    set on (seed, node) — a node is labeled per seed the first round
    it is reached, which IS its distance from that seed. Integer
    arithmetic only; per-round frontiers are persisted (each feeds
    both the anti join and the union, the bfs_hops discipline).

    Returns (seed, dist, n_nodes), zero rows for hops past exhaustion.
    """
    # pre-hashed on src once (r14; the bfs_hops discipline): only the
    # frontier side shuffles per round
    edges = edges.select("src", "dst").repartition(F.col("src")).persist()
    visited = (
        seeds.select("node")
        .distinct()
        .select(F.col("node").alias("seed"), F.col("node"), F.lit(0).cast("long").alias("dist"))
    )
    frontier = visited.select("seed", "node")
    frontiers: list[DataFrame] = []
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select("seed", F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("seed", "node"), ["seed", "node"], "left_anti")
            .withColumn("dist", F.lit(h).cast("long"))
            .persist()
        )
        frontiers.append(nxt)
        visited = visited.union(nxt)
        frontier = nxt.select("seed", "node")
    out = (
        visited.groupBy("seed", "dist")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .localCheckpoint(eager=True)
    )
    edges.unpersist()
    for f in frontiers:
        f.unpersist()
    return out
