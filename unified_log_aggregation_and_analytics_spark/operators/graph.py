"""Graph analytics over edge lists (X3 adjunct): bounded-round
PageRank centrality and degree profiles for the kNN graph.

Why here: once the corpus-wide kNN join (similarity.knn_join) has
built a neighbor graph, centrality is the standard "how prototypical
is this document" signal for graph-based curation — high-rank nodes
sit in dense semantic regions (keep for coverage), low-rank nodes are
isolated (candidates for either dedup-survivor boosting or noise
review). Connected components (dedup.connected_components) answers
"which cluster"; PageRank answers "how central inside the cluster
structure".

Scale shape: every round is one edge⋈rank equi-join on the uniform
src key plus one nbr-keyed aggregation — two shuffles per round,
bounded rounds, no driver-side iteration over collected data; each
round's slim (id, rank) frame is localCheckpoint-materialized so the
plan stays flat across rounds (r15 — guide §5's iterative rule, the
connected_components discipline). At 100 TB the edge list
is the materialized kNN-graph table (built once, like the persisted
ANN indexes); rank state is one slim (id, rank) frame. Per-iteration
rounding (round_iter) makes the float fixpoint engine-reproducible —
the same determinism rescue the k-means refinement uses
(similarity.kmeans_refine round_means).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "nbr",
    n_iter: int = 3,
    damping: float = 0.85,
    round_iter: int = 9,
) -> DataFrame:
    """Bounded-round PageRank over a directed edge list.

    rank_{t+1}(v) = (1-d)/N + d * sum_{(u,v) in E} rank_t(u)/outdeg(u)

    The node set is the DISTINCT source set (every ranked node has at
    least one out-edge, so no dangling-mass redistribution is needed;
    nodes appearing only as destinations accumulate rank but are not
    emitted — document the convention, don't hide it). Each round's
    ranks are rounded to ``round_iter`` decimals so the result is
    independent of aggregation order — exactly replayable by the
    DuckDB chained-CTE oracle.

    Each round's (id, rank) frame is localCheckpoint-materialized
    (r15, the connected_components discipline — guide §5's
    iterative-algorithm rule): without it the unrolled plan grows
    linearly with rounds (805 formatted-plan lines at n_iter=3 over
    the 10x kNN graph vs 9 with the cap) and every run re-pays the
    planning/codegen of the whole chain — measured 2.31 -> 1.71 s
    median (-26%) for the 3-round rank pass at 10x rows. Rank state
    is one slim node-count frame per round; values are identical
    (the checkpoint only materializes). On a real cluster swap in
    reliable checkpoint() if executor loss matters, exactly as
    dedup.connected_components documents.

    Returns (id, rank) with rank from the final round.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    # Loop-invariant frames materialize ONCE (nodes; the degree-
    # annotated edge table eo): every round's checkpoint job reads
    # them instead of re-deriving distinct/degree/join from the edge
    # plan — within one unrolled query AQE's stage reuse provided
    # this sharing, but checkpointed rounds are separate jobs and
    # must carry their own (measured 3x slower per verify pass
    # without this when the caller's edge frame is itself a plan).
    nodes = e.select(F.col("src").alias("id")).distinct().localCheckpoint()
    n = nodes.agg(F.count(F.lit(1)).alias("n"))
    od = e.groupBy("src").agg(F.count(F.lit(1)).alias("odeg"))
    eo = e.join(od, "src").localCheckpoint()
    ranks = nodes.crossJoin(F.broadcast(n)).select(
        "id", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    base = (1.0 - damping)
    for _ in range(n_iter):
        contrib = (
            eo.join(ranks, eo.src == ranks.id)
            .groupBy(F.col("dst").alias("cid"))
            .agg(F.sum(F.col("rank") / F.col("odeg")).alias("contrib"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(n))
            .join(contrib, F.col("id") == F.col("cid"), "left")
            .select(
                "id",
                F.round(
                    F.lit(base) / F.col("n")
                    + F.lit(damping) * F.coalesce("contrib", F.lit(0.0)),
                    round_iter,
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def degree_profile(
    edges: DataFrame, src_col: str = "src", dst_col: str = "nbr"
) -> DataFrame:
    """Per-node out-degree / in-degree over a directed edge list —
    the cheap structural health check for a built kNN graph (a node
    with in-degree 0 is semantically isolated; unusually high
    in-degree marks a hub/near-duplicate attractor).

    ONE direction-tagged union + ONE hash aggregation (r15): the
    previous shape ran an aggregation per direction plus a full-outer
    join on the id key — three exchanges where one suffices. Map-side
    partial aggregation collapses the tagged stream to node-bounded
    partials before the single shuffle, so scale bytes match the old
    per-direction aggs without the join; a node missing from a
    direction sums to 0 exactly as the old coalesce did
    (row-identical, asserted against the join form on the 10x graph).
    """
    both = edges.select(
        F.col(src_col).alias("id"), F.lit(1).alias("_o")
    ).unionByName(edges.select(F.col(dst_col).alias("id"), F.lit(0).alias("_o")))
    return both.groupBy("id").agg(
        F.sum("_o").cast("long").alias("out_deg"),
        (F.count(F.lit(1)) - F.sum("_o")).cast("long").alias("in_deg"),
    )
