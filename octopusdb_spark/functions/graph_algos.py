"""Iterate-to-convergence graph algorithms over an edge DataFrame.

The query registry's fixed-iteration variants (`queries/graph.py`) exist so
a DuckDB oracle can check them with unrolled SQL; these are the production
forms: loop until the per-iteration delta drops below tolerance, with
``localCheckpoint`` each round to truncate lineage — without it, iteration
N's plan replays all N-1 predecessors and the DAG (and task-serialization
time) grows quadratically, the classic iterative-algorithm failure on Spark.

Scale shape per iteration is identical to the fixed-depth queries: one
co-partitioned join + one aggregation, both keyed by vertex id. State is
O(vertices); edges are cached once. Convergence checks collect a single
aggregated row (max delta / changed count), never data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 50,
) -> DataFrame:
    """PageRank until max |rank - prev| < tol (or max_iter).

    ``edges``: (src, dst) DataFrame. Dangling nodes keep the (1-d) base
    term, matching `queries/graph.py:q_graph_pagerank`. Returns
    (node, pagerank, n_iter)."""
    nodes = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst").alias("node"))
    ).distinct().cache()
    out_deg = edges.groupBy("src").agg(F.count("*").alias("outd"))
    e = edges.join(out_deg, "src").select("src", "dst", "outd").cache()
    ranks = nodes.select("node", F.lit(1.0).alias("rank")).localCheckpoint()
    iters = 0
    for iters in range(1, max_iter + 1):
        contribs = e.join(ranks, e.src == ranks.node).select(
            F.col("dst").alias("node"), (F.col("rank") / F.col("outd")).alias("c")
        )
        summed = contribs.groupBy("node").agg(F.sum("c").alias("csum"))
        new_ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (
                    F.lit(1 - damping)
                    + F.lit(damping) * F.coalesce("csum", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()  # truncate lineage each round
        )
        delta = (
            new_ranks.alias("n")
            .join(ranks.alias("o"), "node")
            .agg(F.max(F.abs(F.col("n.rank") - F.col("o.rank"))).alias("d"))
            .collect()[0]["d"]
        )
        ranks = new_ranks
        if delta is not None and delta < tol:
            break
    return ranks.select("node", F.col("rank").alias("pagerank"), F.lit(iters).alias("n_iter"))


def connected_components(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """Connected components (undirected) by min-label propagation until no
    label changes. Returns (node, component, converged) — ``converged``
    is False on every row when ``max_iter`` rounds were not enough (label
    propagation needs ~graph-diameter rounds), so a truncated result is
    detectable instead of silently wrong."""
    und = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().cache()
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iter):
        neigh = (
            und.join(labels, und.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        new_labels = (
            labels.join(neigh, "node", "left")
            .select("node", F.least("lbl", F.coalesce("nlbl", "lbl")).alias("lbl"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        # the `changed` count materialized new_labels' (lazy) checkpoint and
        # was the last reader of the previous round's — release those blocks
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    und.unpersist()  # label checkpoints no longer depend on the edge cache
    return labels.select(
        "node", F.col("lbl").alias("component"), F.lit(converged).alias("converged")
    )
