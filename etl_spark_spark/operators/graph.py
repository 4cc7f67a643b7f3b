"""Connected components over pair tables (LLM-data-pipeline extension).

Near-dup detection emits PAIRS; curation needs CLUSTERS — duplicate
groups under transitive closure (a~b, b~c => {a,b,c}), from which one
canonical doc per group survives. This module turns a pair table into
(node, cluster_id) with cluster_id = the component's minimum node id.

Algorithm: distributed min-label propagation. Every node starts
labeled with its own id; each round, a node's label drops to the
minimum label in its closed neighborhood (one join + one hash
aggregate — all DataFrame ops, fully distributed); stop when a round
changes nothing. Converges in O(graph diameter) rounds — near-dup
graphs are dense clusters of mutually-similar docs, so diameter (and
the round count) is tiny in practice.

Scale notes:
- Each round is one shuffle join labels⋈edges + one min-aggregate; the
  edge table never grows (contrast with transitive-closure joins).
- Lineage is truncated every round (``localCheckpoint``) — iterative
  plans otherwise nest one join layer per round and overwhelm the
  optimizer; on a real cluster prefer ``spark.sparkContext.
  setCheckpointDir`` + reliable ``checkpoint`` for fault tolerance.
- For adversarial high-diameter graphs (long chains — NOT the near-dup
  shape) the alternating large-star/small-star algorithm (Kiveris et
  al., "Connected Components in MapReduce", SOCC'14) converges in
  O(log n) rounds with the same per-round join primitive; this
  propagation loop is the simple-and-sufficient form for dedup graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "pagerank_exact"]


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_rounds: int = 25,
) -> DataFrame:
    """Resolve a pair table to (``node``, ``cluster_id``) — every node
    appearing in any pair, labeled by its component's minimum id.

    Deterministic: labels are ids and min() is order-independent, so
    the result does not depend on partitioning or round scheduling.
    Raises if the label propagation has not converged after
    ``max_rounds`` (diameter > max_rounds — not a near-dup-shaped
    graph; raise the limit or switch to large-star/small-star).
    """
    edges = (
        pairs.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(
            pairs.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    ).localCheckpoint()

    def checksum(df: DataFrame):
        # labels only ever DECREASE, so the label sum strictly decreases
        # until the fixpoint — equality means converged. One small
        # aggregate per round instead of a labels⋈labels change join;
        # decimal(38,0) so the sum cannot overflow at any corpus size.
        return df.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    def propagate(lbl: DataFrame) -> DataFrame:
        # min label over the closed neighborhood: neighbors' labels
        # plus the node's own current label
        neighbor = (
            edges.join(lbl, edges["b"] == lbl["node"])
            .select(F.col("a").alias("node"), "label")
        )
        return (
            neighbor.union(lbl.select("node", "label"))
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )

    cur = checksum(labels)
    for _ in range(max_rounds):
        # TWO propagation steps per checkpoint + checksum: the toy-
        # scale wall of this loop is the per-round FIXED cost (an
        # eager localCheckpoint job + a checksum job — measured round
        # 6: ~0.2-0.3 s each at any sf), not the tiny shuffles, so
        # halving the number of materialization points halves the
        # wall without changing a single label (labels still only
        # ever decrease; a converged double-step has an equal
        # checksum exactly like a converged single step did).
        # Round-12 A/B: FOUR steps per round was tried and measured
        # NO faster — convergence detection still needs the final
        # equal-checksum confirming round, so the round count did not
        # drop (2 -> 2 on the fixture) while each round carried two
        # more joins. Two steps stays.
        labels = propagate(propagate(labels)).localCheckpoint()
        new = checksum(labels)
        if new == cur:
            return labels.select("node", F.col("label").alias("cluster_id"))
        cur = new
    raise RuntimeError(
        f"connected_components: no convergence in {2 * max_rounds} steps"
    )


def pagerank_exact(
    edges: DataFrame,
    iters: int = 5,
    damping_pct: int = 85,
    scale: int = 10**12,
    src_col: str = "src",
    dst_col: str = "dst",
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank in EXACT fixed-point integer arithmetic
    — every rank is a long in units of 1/``scale``, so the result is
    bit-identical at any parallelism/partitioning AND reproducible by
    any other engine running the same integer recurrence (the property
    that buys this iterative algorithm a hard SQL oracle; float
    PageRank sums are accumulation-order-dependent).

    Recurrence (all integer ops — ``div`` truncates):

        r0(v)   = scale div N
        r_i(v)  = (15 * (scale div N)) div 100
                  + (85 * sum_{u->v} (r_{i-1}(u) div outdeg(u))) div 100

    Dangling mass and truncation remainders are dropped (ranks are a
    relative ordering signal, not a distribution — documented, and the
    oracle drops them identically).

    Scale shape: per iteration ONE shuffle join (ranks ⋈ edges on src —
    the edge table is static and re-used) + one hash aggregate on dst;
    lineage truncated per round via localCheckpoint. N (node count) is
    a single driver scalar. Returns (node, rank_fp, rank) sorted by
    nothing — rank_fp is the exact long, rank = rank_fp/scale as a
    display double.

    ``init_ranks`` resumes a previous run: pass a (node, rank_fp)
    frame (e.g. this function's output) and ``iters`` MORE iterations
    run from that state. Because the recurrence is exact integer
    arithmetic, resume composes bit-identically —
    ``pagerank(e, 5) == pagerank(e, 2) |> resume 3`` (pinned by test),
    which is what lets a long-running job checkpoint ranks to a table
    and continue after restart."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        # empty graph: empty result with the output schema, not a
        # divide-by-zero at init
        return nodes.select(
            "node",
            F.lit(None).cast("long").alias("rank_fp"),
            F.lit(None).cast("double").alias("rank"),
        )
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ed = e.join(deg, "src").localCheckpoint()  # static: (src, dst, deg)
    init = scale // n
    base = ((100 - damping_pct) * init) // 100
    if init_ranks is None:
        ranks = nodes.withColumn("rank_fp", F.lit(init).cast("long"))
    else:
        ranks = init_ranks.select("node", F.col("rank_fp").cast("long"))
    for _ in range(iters):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_fp div deg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inc"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({damping_pct} * coalesce(inc, 0L)) div 100")
                ).cast("long").alias("rank_fp"),
            )
            .localCheckpoint()
        )
    return ranks.select(
        "node", "rank_fp", (F.col("rank_fp") / scale).alias("rank")
    )


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts on an undirected graph via DEGREE
    ORDERING (the node-iterator++ / Cohen MapReduce scheme): orient
    every edge from the (degree, id)-smaller endpoint to the larger,
    build wedges by self-joining oriented edges on their source, and
    close each wedge against the oriented edge list.

    Scale design: with this orientation every node's out-degree is
    O(sqrt(m)) on any graph (a node keeps only neighbors of larger
    degree), so wedge fanout is bounded by sum(out_deg^2) <= m^1.5 —
    the standard guarantee that makes the self-join survive power-law
    degree distributions where the naive wedge join is quadratic in
    the hub degree. Three hash joins + two aggregates, no iteration.

    Input may list each undirected edge once in either direction;
    self-loops and duplicate edges are removed. Returns
    (node, n_triangles) for every node in >= 1 triangle.
    """
    e = (
        edges.select(
            F.least(src, dst).alias("u"), F.greatest(src, dst).alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        # the canonical edge list feeds SEVEN plan branches (degrees x2,
        # orientation x2, both wedge sides, the closing join); without a
        # checkpoint Catalyst re-derives the whole upstream per branch —
        # a 200+-exchange plan when edges come from a join+aggregate.
        # The edge list is the small artifact here; materialize it once.
        .localCheckpoint()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.withColumnsRenamed({"node": "u", "deg": "deg_u"})
    dv = deg.withColumnsRenamed({"node": "v", "deg": "deg_v"})
    # orient: lower (deg, id) -> higher (deg, id)
    oriented = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("deg_u") < F.col("deg_v"))
                | ((F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))),
                F.col("u"),
            ).otherwise(F.col("v")).alias("lo"),
            F.when(
                (F.col("deg_u") < F.col("deg_v"))
                | ((F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))),
                F.col("v"),
            ).otherwise(F.col("u")).alias("hi"),
        )
        # edge-sized like e; feeds both wedge sides — one materialization
        .localCheckpoint()
    )
    w1 = oriented.withColumnsRenamed({"lo": "pivot", "hi": "b"})
    w2 = oriented.withColumnsRenamed({"lo": "pivot", "hi": "c"})
    wedges = w1.join(w2, "pivot").filter(F.col("b") < F.col("c"))
    # the closing edge (b, c) is oriented too, but not necessarily
    # b -> c: check the canonical undirected pair instead
    closing = e.withColumnsRenamed({"u": "b", "v": "c"})
    tri = wedges.join(closing, ["b", "c"])  # (pivot, b, c) triangles
    per_node = (
        tri.select(F.col("pivot").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    return per_node


def bfs_hops(
    edges: DataFrame,
    source,
    max_hops: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Single-source BFS over an UNDIRECTED edge table: minimum hop
    count from ``source`` for every node within ``max_hops``.

    The reachability primitive behind "blast radius" / influence-reach
    questions on the co-purchase and trade graphs. Deterministic —
    hop distances are unique minima, independent of partitioning or
    visit order — so a bounded-depth recursive-CTE oracle reproduces
    it exactly.

    Scale shape: classic frontier expansion — per hop ONE shuffle join
    (frontier ⋈ edges, frontier is only the newly-discovered nodes,
    never the full visited set) + one left_anti against the visited
    table + a distinct; lineage truncated per hop with localCheckpoint.
    ``max_hops`` bounds the rounds, so the plan depth is fixed. Works
    unchanged on a 1000-executor cluster: the per-hop frontier is the
    only growing state and it lives in executors, not the driver.

    Returns (node, hops) including the source at hops=0.
    """
    spark = edges.sparkSession
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionByName(
            edges.select(
                F.col(dst_col).alias("a"), F.col(src_col).alias("b")
            )
        )
        .distinct()
        .localCheckpoint()
    )
    visited = spark.range(1).select(
        F.lit(source).alias("node"), F.lit(0).cast("int").alias("hops")
    )
    frontier = visited.select("node")
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(und, frontier["node"] == und["a"])
            .select(F.col("b").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(
            nxt.select("node", F.lit(hop).cast("int").alias("hops"))
        ).localCheckpoint()
        frontier = nxt
    return visited


def k_core(
    edges: DataFrame,
    k: int,
    max_iters: int = 16,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """The k-CORE of an undirected graph (``edges`` must carry both
    directions, the same contract as :func:`pagerank_exact`): the
    maximal subgraph where every surviving node keeps degree >= k.
    Classic peeling — drop nodes under degree k, re-count, repeat —
    which converges because each round only removes nodes (monotone);
    extra rounds past the fixpoint are no-ops, which is exactly what
    buys this iterative operator a STATIC unrolled-CTE oracle: the SQL
    unrolls ``max_iters`` rounds, Spark stops at the true fixpoint,
    and the results agree because peeling is idempotent at the
    fixpoint. Raises if the graph hasn't converged within
    ``max_iters`` (so the oracle's unroll depth is a proven bound,
    never a silent truncation).

    Used for community cores / spam-farm detection / graph
    densification before training graph features.

    Scale shape: per round one degree aggregate + two semi-joins to
    restrict the edge list; lineage truncated every round via
    localCheckpoint; one driver count per round for the fixpoint test
    (same discipline as connected_components' checksum loop).

    Input is normalized to a SIMPLE graph up front — duplicate edges
    collapsed (distinct) and self-loops dropped — so degree counts
    distinct neighbors. Without this, count(*) per src would let a
    node with one neighbor listed k times (or a self-loop) survive a
    core it doesn't belong to (ADVICE r10). The SQL mirror applies
    the identical normalization.

    Returns (node, degree) — core members with their within-core
    degree (distinct within-core neighbors).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    cur = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = cur.count()
    for _ in range(max_iters):
        deg = cur.groupBy("src").agg(F.count("*").alias("__deg"))
        keep = deg.filter(F.col("__deg") >= k).select("src")
        nxt = (
            cur.join(keep, "src", "left_semi")
            .join(keep.select(F.col("src").alias("dst")), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
        n_next = nxt.count()
        if n_next == n_edges:
            return nxt.groupBy("src").agg(
                F.count("*").alias("degree")
            ).select(F.col("src").alias("node"), "degree")
        cur, n_edges = nxt, n_next
        if n_edges == 0:
            return cur.groupBy("src").agg(
                F.count("*").alias("degree")
            ).select(F.col("src").alias("node"), "degree")
    raise RuntimeError(
        f"k_core did not converge within max_iters={max_iters}; "
        "raise max_iters (and the oracle's unroll depth with it)"
    )


def k_core_sql(edges_select: str, k: int, rounds: int = 16) -> str:
    """Unrolled-CTE mirror of :func:`k_core`: ``edges_select`` must
    yield (src, dst) with both directions; peels ``rounds`` times
    (no-ops after the fixpoint). Applies the operator's simple-graph
    normalization (DISTINCT, no self-loops) identically. Compose as a
    full SELECT."""
    # AS MATERIALIZED is load-bearing: each round references the
    # previous edge CTE three times, so letting the optimizer inline
    # CTEs expands the plan 3^rounds-fold (measured: "too many open
    # files" from thousands of duplicate parquet scans)
    parts = [
        f"WITH e_raw AS MATERIALIZED ({edges_select}),\n"
        "e0 AS MATERIALIZED ("
        "SELECT DISTINCT src, dst FROM e_raw WHERE src <> dst)"
    ]
    for i in range(1, rounds + 1):
        parts.append(f""",
n{i} AS MATERIALIZED (
  SELECT src FROM e{i-1} GROUP BY src HAVING count(*) >= {k}
),
e{i} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{i-1} e
  JOIN n{i} a ON e.src = a.src
  JOIN n{i} b ON e.dst = b.src
)""")
    parts.append(f"""
SELECT src AS node, count(*) AS degree
FROM e{rounds} GROUP BY src
""")
    return "".join(parts)
