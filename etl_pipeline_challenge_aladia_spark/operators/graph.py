"""Graph analytics over pair frames (near-dup graphs, similarity
graphs) expressed as DataFrame join/agg rounds — the iterative-
algorithm family (the engine's union-find canonicalization lives in
``operators/dedup.py``; this module holds rank/centrality passes).

Reference analog: none (the reference dedups whole rows by key,
SURVEY.md §1.4); north-star LLM-pipeline scope — duplicate-cluster
centrality ranks the representative document to KEEP (the hub a
template family radiates from), and boilerplate hubs to quarantine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 1_000_000_000_000  # fixed-point rank mass (1e12)


def pagerank_fixed_point(
    pairs: DataFrame,
    iterations: int = 3,
    damping_permille: int = 850,
    a_col: str = "doc_id_a",
    b_col: str = "doc_id_b",
) -> DataFrame:
    """EXACT integer fixed-point PageRank over an undirected pair frame
    — power iteration as DataFrame join/agg rounds, no GraphX, no RDDs.

    Arithmetic is all-int64 so cross-engine parity is bit-exact with no
    rounding contract: ranks live at ``PR_SCALE`` (1e12) fixed point,
    each round computes

        rank'(v) = ((1000 - d) * SCALE div 1000) div N
                   + (d * sum_{u in nbr(v)} (rank(u) div deg(u))) div 1000

    with integer `div` throughout (all values non-negative, so Spark's
    truncate-toward-zero and the oracle's floor agree). Truncation dust
    makes total mass drift below SCALE by < N per round — deterministic
    and identical in any engine, which is the point: this is a RANKING,
    not a probability estimate.

    Nodes are the ids appearing in ``pairs`` (isolated documents have no
    edges and rank nothing — callers union them back if needed); every
    node has degree >= 1, so there is no dangling-mass term. Output:
    ``(id, degree, rank_fx)``.

    Scale shape: per round ONE equi-join of the edge list with the
    k-node rank frame plus one dst-keyed sum — shuffle keyed on node id,
    partial aggregation map-side, nothing quadratic. The edge list and
    each round's rank frame are materialized (localCheckpoint), so round
    r's plan is one join/agg, not r chained ones — the same O(rounds)
    plan-size discipline as ``kcenter_select``. Overflow headroom:
    sum-of-shares <= SCALE, so d * sum <= 8.5e14 << int64 max.
    """
    both = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col(a_col).alias("src"), F.col(b_col).alias("dst")),
                F.struct(F.col(b_col).alias("src"), F.col(a_col).alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # LAZY checkpoints throughout: each round's plan is still truncated at
    # the checkpointed RDD (the O(rounds) plan-size discipline), but
    # materialization folds into the next consuming job instead of paying
    # one scheduled job per checkpoint — the whole loop now executes as
    # ONE job at the final action, with every intermediate persisted for
    # its later consumers (same results; checkpointing is physical only)
    edges = both.localCheckpoint(eager=False)
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    nn = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    keep = 1000 - damping_permille
    nodes = (
        deg.crossJoin(F.broadcast(nn))
        .select(
            "id",
            "degree",
            "n_nodes",
            F.expr(f"CAST({PR_SCALE} AS BIGINT) div n_nodes").alias(
                "rank_fx"
            ),
        )
        .localCheckpoint(eager=False)
    )
    for _ in range(iterations):
        contrib = (
            edges.join(
                nodes.select(
                    F.col("id").alias("src"), "degree", "rank_fx"
                ),
                "src",
            )
            .select(
                F.col("dst").alias("id"),
                F.expr("rank_fx div degree").alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").cast("long").alias("s"))
        )
        nodes = (
            nodes.drop("rank_fx")
            .join(contrib, "id", "left")
            .select(
                "id",
                "degree",
                "n_nodes",
                F.expr(
                    f"(({keep} * {PR_SCALE}) div 1000) div n_nodes"
                    f" + ({damping_permille} * coalesce(s, CAST(0 AS BIGINT)))"
                    " div 1000"
                )
                .cast("long")
                .alias("rank_fx"),
            )
            .localCheckpoint(eager=False)
        )
    return nodes.select("id", "degree", "rank_fx")


def triangle_stats(
    pairs: DataFrame,
    a_col: str = "doc_id_a",
    b_col: str = "doc_id_b",
) -> DataFrame:
    """Exact triangle census of an undirected pair graph — one row:
    ``(n_nodes, n_edges, n_wedges, n_triangles,
    clustering_permille)`` with the global clustering coefficient as
    integer permille ``(3 * triangles * 1000) div wedges`` (0 when the
    graph has no wedge). On a near-dup graph this is the cluster-
    cohesion audit: true duplicate clusters are near-cliques
    (coefficient -> 1000), while chains of borderline pairs — the
    transitive-closure failure mode of threshold dedup — score low,
    telling the curator whether cluster canonicalization
    (``doc_canonical_per_cluster``) is collapsing real families or
    daisy-chained accidents.

    Scale shape: the standard DEGREE-ORDERED orientation bound. Every
    edge is oriented from its lower-(degree, id) endpoint to the
    higher one, so each node's out-degree is bounded by its in-graph
    rank and the wedge self-join on the shared LOW endpoint touches
    sum(outdeg^2) pairs — O(E^1.5) total work on any graph (the
    classic compact-forward guarantee), immune to the single hub
    vertex that makes the naive shared-endpoint join quadratic. One
    edge-keyed semi-join closes each wedge. The triangle COUNT is
    orientation-invariant, so the id-ordered DuckDB oracle counts the
    identical set. Wedges come from the undirected degree aggregate:
    sum(deg * (deg - 1) / 2), exact int64.
    """
    und = (
        pairs.select(
            F.least(F.col(a_col), F.col(b_col)).alias("u"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        # LAZY (see pagerank_fixed_point): all four consumers sit in the
        # one final job, which computes the pair detection once into cache
        .localCheckpoint(eager=False)  # pair detection runs once
    )
    deg = (
        und.select(F.col("u").alias("id"))
        .unionByName(und.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    counts = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.expr("deg * (deg - 1) div 2")).cast("long").alias("n_wedges"),
    )
    edge_n = und.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("dv"))
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("src"), F.col("v").alias("dst")),
            )
            .otherwise(
                F.struct(F.col("v").alias("src"), F.col("u").alias("dst"))
            )
            .alias("e")
        )
        .select("e.src", "e.dst")
        .localCheckpoint(eager=False)
    )
    x, y = oriented.alias("x"), oriented.alias("y")
    wedges = x.join(
        y,
        (F.col("x.src") == F.col("y.src"))
        & (F.col("x.dst") < F.col("y.dst")),
    ).select(F.col("x.dst").alias("p"), F.col("y.dst").alias("q"))
    # close the wedge: an oriented edge between p and q (either way)
    closing = oriented.select(
        F.least("src", "dst").alias("p"), F.greatest("src", "dst").alias("q")
    )
    tri = (
        wedges.select(
            F.least("p", "q").alias("p"), F.greatest("p", "q").alias("q")
        )
        .join(closing, ["p", "q"], "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    return (
        counts.crossJoin(F.broadcast(edge_n))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.expr(
                "CASE WHEN n_wedges = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST((3 * n_triangles * 1000) div n_wedges AS BIGINT)"
                " END"
            ).alias("clustering_permille"),
        )
    )


def kcore_peel(
    pairs: DataFrame,
    k: int = 2,
    rounds: int = 4,
    a_col: str = "doc_id_a",
    b_col: str = "doc_id_b",
) -> DataFrame:
    """k-core decomposition by iterative peeling: drop every node whose
    degree is below ``k``, restrict the edge list to surviving endpoints,
    and repeat for ``rounds`` rounds. Output: the surviving nodes as
    ``(id, core_degree)`` with their degree INSIDE the final subgraph.

    On a near-dup graph the 2-core is the cycle-bearing heart of each
    duplicate family: chains of borderline one-off pairs (the transitive
    false-merge failure mode threshold dedup is prone to) peel away
    entirely, while genuine template families — near-cliques — survive
    with high core degree. Peeling is the standard distributed k-core
    algorithm (degree filter + semi-join, the same shape GraphX/Giraph
    run): per round one degree aggregate plus two semi-joins of the edge
    list against the survivor set, everything keyed on node id, nothing
    quadratic. Each round's edge list is materialized (localCheckpoint)
    so round r's plan stays one agg + two joins — the O(rounds)
    plan-size discipline of ``pagerank_fixed_point``.

    ``rounds`` is FIXED, not run-to-convergence: a bounded unrollable
    contract any SQL engine can mirror CTE-for-CTE. Peeling removes at
    least one node per non-converged round, so on graphs whose longest
    sub-k chain is shorter than ``rounds`` the result IS the fixpoint;
    callers needing a certificate compare ``rounds`` vs ``rounds + 1``.
    """
    both = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col(a_col).alias("src"), F.col(b_col).alias("dst")),
                F.struct(F.col(b_col).alias("src"), F.col(a_col).alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # LAZY per-round checkpoints (see pagerank_fixed_point): plan stays
    # O(1) per round, materialization folds into the final consuming job
    edges = both.localCheckpoint(eager=False)
    for _ in range(rounds):
        keep = (
            edges.groupBy(F.col("src").alias("id"))
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select("id")
        )
        edges = (
            edges.join(keep.withColumnRenamed("id", "src"), "src", "leftsemi")
            .join(keep.withColumnRenamed("id", "dst"), "dst", "leftsemi")
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
    return edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("core_degree")
    )
