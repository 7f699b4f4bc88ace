"""Graph query surface — the reference's "graph query" capability
(`README.md:2`, adjacency-list-over-KV test `kv/db_test.go:107-179`)
generalized to a real edge-table query set.

Edge derivation (deterministic, same in both engines): each event is a
directed follow edge `user_id -> props.k`, deduplicated. This is exactly the
reference's follower/following adjacency shape, but normalized to an edge
table — the scalable layout (adjacency lists explode into edges anyway for
any distributed traversal).

Scale notes: degree/mutual/k-hop/triangles are all self-joins on the edge
table, shuffled by vertex key; PageRank and connected components are
fixed-iteration DataFrame loops (each iteration one shuffle) — the standard
Pregel-as-joins pattern. No GraphX (Scala-only from PySpark); GraphFrames
unavailable in this container, so DataFrame joins are the primary
implementation, per SURVEY.md §7.4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from octopusdb_spark.queries.common import spread, t

EDGES_SQL = """
WITH edges AS (
  SELECT DISTINCT user_id AS src,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS dst
  FROM events
)
"""


def edges(spark: SparkSession, sf_dir: str, spread_scan: bool = True) -> DataFrame:
    # spread (r16, guide §2.5): the JSON extraction + partial distinct
    # otherwise run single-task over the single-row-group events file.
    # r17 (VERDICT r16 #1): per-caller — the iterative algorithms keep it
    # (khop warm interleave 1.25 s -> 0.92 s; pagerank/scc flat), but a
    # single-pass consumer turns it OFF: the exchange of full-width event
    # rows costs more than the serial JSON parse saves (graph_degrees
    # warm interleave 0.63 s without vs 0.95 s with; single-shot
    # 2.7 s vs 3.6 s — the r16 'edge pass alone' A/B had mis-attributed
    # the win).
    ev = t(spark, sf_dir, "events")
    if spread_scan:
        ev = spread(ev, "user_id")
    return ev.select(
        F.col("user_id").alias("src"),
        F.get_json_object("props", "$.k").cast("bigint").alias("dst"),
    ).distinct()


def aggregate_messages(
    edge_df: DataFrame,
    state: DataFrame | None = None,
    state_on: str = "dst",
    to: str | None = None,
    send=(),
    agg=(),
    group_extra=(),
    base: DataFrame | None = None,
) -> DataFrame:
    """The GraphX ``aggregateMessages`` primitive (README.md:2's graph
    claim) as DataFrame ops — the ONE join+project+reduce shape every
    iterative algorithm in this module repeats:

    1. join the vertex ``state`` frame (keyed by ``node``) onto each edge
       at the ``state_on`` endpoint (skipped when ``state`` is None — the
       message then reads edge columns alone, e.g. degree counting);
    2. emit one message per edge addressed to the OPPOSITE endpoint
       (``to`` defaults to the other end; each message = the ``send``
       column expressions evaluated on the joined triplet);
    3. reduce messages per receiving vertex with the ``agg`` columns —
       ``group_extra`` adds message fields to the grouping key (LPA's
       label histogram, multi-landmark BFS), ``base`` unions extra
       message rows BEFORE the reduce (pagerank's dangling-vertex zero
       rows — keeps the round at ONE agg shuffle instead of agg + node
       left-join).

    Plan shape: one shuffle join (state side; skew-safe — AQE splits hot
    vertices) + one partial-aggregated shuffle (the reduce). This is
    exactly the per-superstep cost Pregel promises, so an algorithm
    written on this primitive inherits the 100-TB story: per-round
    traffic bounded by messages, map-side combine on the reduce, no
    driver involvement. Callers own the loop discipline (localCheckpoint
    lineage truncation + cache of loop-invariant frames)."""
    if to is None:
        to = {"dst": "src", "src": "dst"}[state_on]
    tri = (
        edge_df
        if state is None
        else edge_df.join(state, edge_df[state_on] == state["node"]).drop(
            state["node"]
        )
    )
    msgs = tri.select(F.col(to).alias("node"), *send)
    if base is not None:
        msgs = msgs.unionByName(base)
    return msgs.groupBy("node", *group_extra).agg(*agg)


def q_graph_degrees(spark, sf_dir):
    """In/out degree per node — the follower/following counts of the
    reference's User payload (`kv/db_test.go:107-112`)."""
    e = edges(spark, sf_dir, spread_scan=False)  # single-pass: see edges()
    out_deg = e.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("out_degree"))
    in_deg = e.groupBy(F.col("dst").alias("node")).agg(F.count("*").alias("in_degree"))
    return (
        out_deg.join(in_deg, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
        .orderBy("node")
    )


def q_graph_mutual_follows(spark, sf_dir):
    """Mutual-follow pairs: a→b and b→a (a < b) — the reciprocal-edge
    self-join."""
    e = edges(spark, sf_dir)
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return (
        e.intersect(rev)
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .orderBy("a", "b")
    )


def q_graph_two_hop(spark, sf_dir):
    """2-hop reachability for a seed set: distinct nodes reachable in exactly
    two hops (double explode-join, the k-hop building block)."""
    e = edges(spark, sf_dir)
    seeds = e.filter(F.col("src") < 10)
    hop2 = (
        seeds.alias("e1")
        .join(e.alias("e2"), F.col("e1.dst") == F.col("e2.src"))
        .select(F.col("e1.src").alias("origin"), F.col("e2.dst").alias("reached"))
        .distinct()
    )
    return (
        hop2.groupBy("origin")
        .agg(F.count("*").alias("n_two_hop"))
        .orderBy("origin")
    )


def q_graph_triangles(spark, sf_dir):
    """Triangle count over the undirected graph — the classic 3-way
    edge self-join with a<b<c canonical ordering (shuffle-bound; at scale
    this is the degree-ordered variant's baseline)."""
    e = edges(spark, sf_dir)
    und = (
        e.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e1 = und.alias("e1")
    e2 = und.alias("e2")
    e3 = und.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(e3, (F.col("e2.b") == F.col("e3.b")) & (F.col("e1.a") == F.col("e3.a")))
        .select(F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z"))
    )
    return tri.agg(F.count("*").alias("n_triangles"))


def q_graph_pagerank(spark, sf_dir):
    """PageRank, 3 fixed iterations, damping 0.85 — Pregel-as-joins.
    Contributions are decimal-accumulated so the result is bit-deterministic
    (and matches the oracle's unrolled SQL). Dangling nodes keep rank via
    the (1-d) base term only, same as the oracle."""
    # Loop-invariant state is cached once: edges⋈outdeg and the node list
    # are reused every iteration (otherwise the lineage re-scans the source
    # 3× per join — the classic iterative-algorithm pitfall).
    # The edge frame itself is checkpointed FIRST (r16, guide §1.2): the
    # node list, the out-degree agg and the edge⋈outdeg join otherwise
    # each re-run the events scan + JSON extraction + distinct (measured
    # 1.7 s -> 1.5 s warm end-to-end).
    e = edges(spark, sf_dir).localCheckpoint(eager=True)
    nodes = e.select(F.col("src").alias("node")).union(e.select("dst")).distinct().cache()
    out_deg = e.groupBy("src").agg(F.count("*").alias("outd"))
    e_outd = e.join(out_deg, "src").select("src", "dst", "outd").cache()
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    zero = nodes.select("node", F.lit(0.0).alias("c"))  # dangling-node base rows
    for _ in range(3):
        # One aggregate_messages superstep: rank/outd to each out-neighbor,
        # decimal-sum per receiver. The `base` zero row per node (instead
        # of left-joining the node list after the aggregate) keeps every
        # node (dangling included) in the groupBy at ONE agg shuffle —
        # zero rows are exact under the decimal sum.
        summed = aggregate_messages(
            e_outd, state=ranks, state_on="src",
            send=[(F.col("rank") / F.col("outd")).alias("c")],
            base=zero,
            agg=[F.sum(F.col("c").cast("decimal(38,18)")).cast("double").alias("csum")],
        )
        ranks = summed.select(
            "node", (F.lit(0.15) + F.lit(0.85) * F.col("csum")).alias("rank")
        )
        # NOTE: no per-iteration checkpoint here — rank lineage is linear
        # (each round references `ranks` exactly once), so the plan grows
        # linearly and one fused job pipelines better than eager barriers
        # (measured: checkpointing added ~3 s cold at sf0.1).
    return ranks.select("node", F.round("rank", 9).alias("pagerank")).orderBy("node")


def q_graph_components(spark, sf_dir):
    """Connected components by min-label propagation, 4 fixed iterations —
    integer min is order-independent, so results are exactly reproducible.
    (Full convergence loop available in the library; fixed depth keeps the
    oracle expressible.)"""
    e = edges(spark, sf_dir)
    und = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        # cache PRE-PARTITIONED by the superstep join key (r16, guide
        # §2.4): every round joins und.dst == labels.node, so the cached
        # hash(dst) layout is reused and only the label frame moves
        .repartition("dst")
        .cache()  # loop-invariant, joined every iteration
    )
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    prev_ckpt = None
    for _ in range(4):
        # superstep: each node's label to its (undirected) neighbors,
        # min-reduced per receiver
        neighbor_min = aggregate_messages(
            und, state=labels, state_on="dst",
            send=[F.col("label")],
            agg=[F.min("label").alias("nbr_label")],
        ).withColumnRenamed("node", "n2")
        labels = (
            labels.join(neighbor_min, labels.node == F.col("n2"), "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias("label"),
            )
            # `labels` appears twice per round (neighbor agg + left join):
            # truncate lineage each round or the plan doubles per iteration
            .localCheckpoint(eager=True)
        )
        if prev_ckpt is not None:  # release the superseded round's blocks
            prev_ckpt.unpersist()
        prev_ckpt = labels
    und.unpersist()  # final labels are materialized; the edge cache is free
    return (
        labels.groupBy("label")
        .agg(F.count("*").alias("component_size"))
        .orderBy("label")
    )


def q_graph_adjacency(spark, sf_dir):
    """Adjacency-list reconstruction: the reference's User payload shape
    (`kv/db_test.go:107-112` — following[] arrays) rebuilt from the edge
    table, sorted for determinism."""
    e = edges(spark, sf_dir)
    # The adjacency list is emitted as a sorted comma-joined string, not an
    # array: the driver's checker canonicalizes via pandas and crashes on
    # list-typed cells (round-2 "unhashable type: 'list'").
    return (
        e.groupBy(F.col("src").alias("node"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("dst")), lambda x: x.cast("string")
                ),
                ",",
            ).alias("following"),
            F.count("*").alias("n_following"),
        )
        .orderBy("node")
    )


def q_graph_khop(spark, sf_dir):
    """BFS min-distance to 3 hops from seed nodes (src < 5) — the frontier-
    expansion loop (each hop: one join from the current frontier + a min
    agg; BFS guarantees the first time a node is reached is its min
    distance, so the frontier stays small). Oracle: DuckDB recursive CTE.
    At scale this is the standard Pregel frontier pattern — per-hop shuffle
    is bounded by the frontier size, not the graph."""
    # cache pre-partitioned by the per-hop join key (r16, guide §2.4)
    e = edges(spark, sf_dir).repartition("src").cache()
    dist = (
        e.select(F.col("src").alias("node"))
        .filter(F.col("node") < 5)
        .distinct()
        .select("node", F.lit(0).alias("dist"))
    )
    frontier = dist
    initial = dist
    pending = []  # lazy dist checkpoints whose blocks still feed a successor
    for hop in range(1, 4):
        # superstep: constant-hop message from the frontier along out-edges,
        # min-reduced (== the old project+distinct; every message this hop
        # carries the same dist)
        reached = aggregate_messages(
            e, state=frontier, state_on="src",
            send=[F.lit(hop).alias("dist")],
            agg=[F.min("dist").alias("dist")],
        )
        # materialize each (tiny) frontier and truncate its lineage: `dist`
        # is referenced twice per hop (anti-join + union), so an un-truncated
        # plan doubles per hop (~109 exchanges by hop 3 with cache() alone —
        # caches dedupe execution but not planning)
        new_nodes = reached.join(dist, "node", "left_anti").localCheckpoint(eager=True)
        # the eager job above also materialized the PREVIOUS round's lazy
        # dist checkpoint (it reads it), so frames released here are
        # fully baked into persisted blocks
        for f in pending:
            f.unpersist()
        prev_dist, prev_frontier = dist, frontier
        pending = [prev_dist] if prev_dist is not initial else []
        if prev_frontier is not initial and prev_frontier is not prev_dist:
            prev_frontier.unpersist()
        # LAZY union checkpoint (r17, the ANN-training pattern): a fixed
        # hop count means no per-round termination probe, so the union
        # needs no blocking job of its own — it materializes inside the
        # NEXT round's eager frontier job (eager on the final hop so the
        # loop ends fully materialized and `pending` can release)
        dist = dist.unionByName(new_nodes).localCheckpoint(eager=(hop == 3))
        frontier = new_nodes
    for f in pending:
        f.unpersist()
    frontier.unpersist()  # last frontier is subsumed by the final dist
    e.unpersist()
    return dist.orderBy("node")


SP_LANDMARKS = [0, 1, 2]
SP_MAX_HOPS = 4


def q_graph_shortest_paths(spark, sf_dir):
    """GraphX-library parity: ShortestPaths to landmark vertices — hop
    distance from every vertex to each landmark FOLLOWING edge direction,
    computed as one multi-source labeled BFS over REVERSED edges (state =
    (node, landmark, dist); all landmarks expand in the same loop, so the
    per-hop cost is one join + one anti-join regardless of landmark
    count). Fixed 4-hop horizon keeps the oracle a bounded recursive CTE;
    output is the GraphX shape pivoted to one column per landmark (null =
    unreachable within the horizon), rows = vertices whose landmark map
    is non-empty. Same frontier/localCheckpoint discipline as graph_khop:
    per-hop shuffle is bounded by the frontier, not the graph."""
    # cache pre-partitioned by the per-hop (reversed-edge) join key
    # (r16, guide §2.4)
    e = edges(spark, sf_dir).repartition("dst").cache()
    dist = spark.createDataFrame(
        [(lm, lm, 0) for lm in SP_LANDMARKS], "node long, lm long, dist int"
    )
    frontier = dist
    initial = dist
    pending = []  # lazy dist checkpoints whose blocks still feed a successor
    for hop in range(1, SP_MAX_HOPS + 1):
        # superstep over REVERSED edges: (landmark, hop) messages expand
        # the labeled frontier; group_extra keeps one state row per
        # (node, landmark) — all landmarks share the round's single join
        reached = aggregate_messages(
            e, state=frontier, state_on="dst",
            send=[F.col("lm"), F.lit(hop).alias("dist")],
            group_extra=("lm",),
            agg=[F.min("dist").alias("dist")],
        )
        new_nodes = reached.join(
            dist, ["node", "lm"], "left_anti"
        ).localCheckpoint(eager=True)
        # eager job above materialized the previous round's lazy dist;
        # released frames are fully baked into persisted blocks (see
        # q_graph_khop for the pattern)
        for f in pending:
            f.unpersist()
        prev_dist, prev_frontier = dist, frontier
        pending = [prev_dist] if prev_dist is not initial else []
        if prev_frontier is not initial and prev_frontier is not prev_dist:
            prev_frontier.unpersist()
        dist = dist.unionByName(new_nodes).localCheckpoint(
            eager=(hop == SP_MAX_HOPS)
        )
        frontier = new_nodes
    for f in pending:
        f.unpersist()
    frontier.unpersist()
    e.unpersist()
    aggs = [
        F.min(F.when(F.col("lm") == lm, F.col("dist"))).alias(f"d{lm}")
        for lm in SP_LANDMARKS
    ]
    return (
        dist.groupBy("node")
        .agg(*aggs, F.count("*").alias("n_reachable"))
        .orderBy("node")
    )


def q_graph_scc(spark, sf_dir):
    """Strongly connected components — the last classic GraphX-library
    member (CC/k-core/k-hop/pagerank/shortest-paths already exist), run
    to CONVERGENCE so the result is the exact mathematical SCC labeling
    (label = min node id of each component), not a bounded variant.

    Algorithm: FW-BW-Trim coloring (Fleischer et al. divide-and-conquer
    as iterated on Pregel-like systems):

      1. TRIM — peel nodes lacking an in- or out-edge in the live
         subgraph (provably trivial SCCs); repeat until none. A DAG
         dissolves here in <= diameter rounds.
      2. COLOR — forward min-label propagation to fixpoint: color(v) =
         min live node that reaches v. Frontier-driven (only changed
         labels propagate), so per-hop shuffle is bounded by the
         frontier, not the graph.
      3. MARK — from each color root (color(c) == c, which is the
         min id of its SCC), walk REVERSED edges restricted to
         same-colored endpoints: the marked set is exactly SCC(c).
         Assign, peel, repeat from 1 on the residual.

    Every step is an edge-keyed join/agg — no all-pairs products, the
    100 TB shape (the ORACLE brute-forces a transitive closure instead,
    which only needs to hold at oracle scale). Rounds needed = SCC-DAG
    peel depth; a 64-round cap turns pathological inputs into a loud
    error instead of a silent wrong answer. Same localCheckpoint
    discipline as graph_components: each loop body re-reads its own
    output, so lineage is truncated every round."""
    # Checkpoint the edge frame BEFORE deriving nodes/live_edges (r16,
    # guide §1.2): both derivations otherwise re-run the events scan +
    # JSON extraction + edge distinct from source — one materialization
    # serves both (measured init 1.9 s -> 1.2 s warm).
    e0 = (
        edges(spark, sf_dir)
        .filter(F.col("dst").isNotNull())
        .localCheckpoint(eager=True)
    )
    nodes = (
        e0.select(F.col("src").alias("node"))
        .union(e0.select(F.col("dst").alias("node")))
        .distinct()
    )
    live_nodes = nodes.localCheckpoint(eager=True)
    live_edges = (
        e0.filter(F.col("src") != F.col("dst")).localCheckpoint(eager=True)
    )
    # r16 optimization (guide §1.2: fewer passes): the assigned set is
    # accumulated as a python list of frames over FROZEN (checkpointed)
    # inputs and unioned once at the end — the old per-round
    # assigned-union checkpoint was a whole job that materialized nothing
    # new. (A bolder rewrite — lazy anti-join frontiers replacing the
    # improved/new_marks checkpoints — was tried and MEASURED SLOWER:
    # 90 -> 105 jobs, the anti-join isEmpty probes out-cost the
    # checkpoints they replaced; reverted.) Same algorithm, same
    # supersteps, same (unique) SCC labeling.
    assigned_parts: list = []
    for _round in range(64):
        # -- trim trivial SCCs (no in- or no out-edge in the live graph)
        while True:
            cyclic = (
                live_edges.select("src")
                .intersect(live_edges.select(F.col("dst").alias("src")))
                .select(F.col("src").alias("node"))
                .localCheckpoint(eager=True)
            )
            trivial = live_nodes.join(cyclic, "node", "left_anti")
            if trivial.isEmpty():
                break
            # trivial reads two FROZEN frames — safe to defer to the end
            assigned_parts.append(
                trivial.select("node", F.col("node").alias("scc"))
            )
            live_nodes = cyclic
            live_edges = (
                live_edges.join(cyclic, live_edges.src == cyclic.node, "left_semi")
                .join(cyclic, live_edges.dst == cyclic.node, "left_semi")
                .localCheckpoint(eager=True)
            )
        if live_nodes.isEmpty():
            break
        # -- color: forward min-label propagation to fixpoint
        colors = live_nodes.select("node", F.col("node").alias("color"))
        frontier = colors
        while True:
            # superstep: changed colors propagate forward, min-reduced
            candidate = aggregate_messages(
                live_edges, state=frontier, state_on="src",
                send=[F.col("color")],
                agg=[F.min("color").alias("cand")],
            )
            improved = (
                colors.join(candidate, "node")
                .filter(F.col("cand") < F.col("color"))
                .select("node", F.col("cand").alias("color"))
                .localCheckpoint(eager=True)
            )
            if improved.isEmpty():
                break
            colors = (
                colors.join(improved.select("node"), "node", "left_anti")
                .unionByName(improved)
                .localCheckpoint(eager=True)
            )
            frontier = improved
        # -- mark: backward walk from color roots over same-colored edges
        same = (
            live_edges.join(
                colors.select(F.col("node").alias("src"), F.col("color").alias("c_src")),
                "src",
            )
            .join(
                colors.select(F.col("node").alias("dst"), F.col("color").alias("c_dst")),
                "dst",
            )
            .filter(F.col("c_src") == F.col("c_dst"))
            # the eager checkpoint gives this frame fresh attributes, so
            # the superstep joins against `marked` (also colors-derived)
            # can never hit a same-attribute self-join ambiguity
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        marked = colors.filter(F.col("node") == F.col("color")).localCheckpoint(
            eager=True
        )
        mfrontier = marked
        while True:
            # superstep over REVERSED same-colored edges: dst marked with
            # root c => src is in SCC(c) too and inherits the color (a
            # node has ONE color, so the min-reduce is just dedup)
            reached = aggregate_messages(
                same, state=mfrontier, state_on="dst",
                send=[F.col("color")],
                agg=[F.min("color").alias("color")],
            )
            new_marks = reached.join(marked, "node", "left_anti").localCheckpoint(
                eager=True
            )
            if new_marks.isEmpty():
                break
            marked = marked.unionByName(new_marks).localCheckpoint(eager=True)
            mfrontier = new_marks
        assigned_parts.append(marked.select("node", F.col("color").alias("scc")))
        live_nodes = live_nodes.join(marked, "node", "left_anti").localCheckpoint(
            eager=True
        )
        live_edges = (
            live_edges.join(marked, live_edges.src == marked.node, "left_anti")
            .join(marked, live_edges.dst == marked.node, "left_anti")
            .localCheckpoint(eager=True)
        )
        if live_nodes.isEmpty():
            break
    else:
        raise RuntimeError("graph_scc did not converge within 64 peel rounds")
    assigned = spark.createDataFrame([], "node long, scc long")
    for part in assigned_parts:
        assigned = assigned.unionByName(part)
    return assigned.orderBy("node")


LPA_ROUNDS = 4


def q_graph_lpa(spark, sf_dir):
    """Label-propagation community detection — the last GraphX-library
    member without an analog (SCC landed this round; CC/k-core/k-hop/
    pagerank/shortest-paths already exist). SYNCHRONOUS variant with a
    deterministic tie-break: each round every node adopts the most
    frequent label among its (undirected) neighbors, ties broken by the
    smallest label — so unlike the asynchronous coin-flip LPA of the
    original paper, the result is exactly reproducible and the oracle
    can unroll the rounds as CTEs (the `graph_components` discipline).
    Fixed LPA_ROUNDS like the components query: full convergence loops
    exist in the library; fixed depth keeps the oracle expressible.

    Plan per round: one neighbor-label join + one (node, label) count
    agg + one node-keyed rank window (parallelism O(nodes), no task sees
    more than one node's label histogram) + one left join back —
    Pregel-as-joins, same shape as pagerank/CC; localCheckpoint each
    round truncates the doubling lineage."""
    e = edges(spark, sf_dir)
    und = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        # cache PRE-PARTITIONED by the superstep join key (r16, guide
        # §2.4): every round joins und.dst == labels.node, so the cached
        # hash(dst) layout is reused and only the label frame moves
        .repartition("dst")
        .cache()  # loop-invariant, joined every iteration
    )
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    prev_ckpt = None
    for _ in range(LPA_ROUNDS):
        # superstep: each node's label to its neighbors; group_extra turns
        # the reduce into the per-node label HISTOGRAM (GraphX does this
        # with a map-merge — the relational shape is a wider group key)
        freq = aggregate_messages(
            und, state=labels, state_on="dst",
            send=[F.col("label")],
            group_extra=("label",),
            agg=[F.count("*").alias("c")],
        ).withColumnRenamed("node", "n2")
        # histogram argmax via max_by agg, not a row_number window (r16,
        # guide §2.3/§2.4): max over the ordering struct (c, -label) IS
        # the window's (c DESC, label ASC) tie-break — unique winner
        # (one histogram row per (node, label)) — with a map-side partial
        # phase and no sort
        pick = freq.groupBy("n2").agg(
            F.max_by(
                F.col("label"), F.struct(F.col("c"), -F.col("label"))
            ).alias("new_label")
        )
        labels = (
            labels.join(pick, labels.node == F.col("n2"), "left")
            .select(
                "node",
                F.coalesce("new_label", F.col("label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        if prev_ckpt is not None:
            prev_ckpt.unpersist()
        prev_ckpt = labels
    und.unpersist()
    return labels.orderBy("node")


def _lpa_sql() -> str:
    """Unrolled synchronous LPA rounds, mirroring the Spark loop term for
    term (count agg + (DESC count, ASC label) rank window)."""
    sql = EDGES_SQL + """
, und AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges
  )
),
l0 AS (SELECT DISTINCT src AS node, src AS label FROM und)
"""
    for i in range(LPA_ROUNDS):
        sql += f""",
f{i} AS (
  SELECT u.src AS node, l.label, count(*) AS c
  FROM und u JOIN l{i} l ON u.dst = l.node GROUP BY u.src, l.label
),
p{i} AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node ORDER BY c DESC, label ASC) AS rn
    FROM f{i}
  ) WHERE rn = 1
),
l{i + 1} AS (
  SELECT l.node, coalesce(p.label, l.label) AS label
  FROM l{i} l LEFT JOIN p{i} p ON l.node = p.node
)"""
    sql += f"\nSELECT node, label FROM l{LPA_ROUNDS} ORDER BY node"
    return sql


def _scc_sql() -> str:
    """Brute-force oracle: recursive-CTE transitive closure (UNION
    dedup handles cycles), mutual pairs, then label = min mutually
    reachable node. Only needs to hold at oracle scale — the Spark side
    never materializes reachability pairs."""
    return (
        EDGES_SQL
        + """
, e2 AS (SELECT src, dst FROM edges WHERE dst IS NOT NULL),
nodes AS (
  SELECT DISTINCT n AS node FROM (
    SELECT src AS n FROM e2 UNION ALL SELECT dst FROM e2
  )
),
r AS (
  WITH RECURSIVE walk(a, b) AS (
    SELECT src, dst FROM e2
    UNION
    SELECT w.a, e.dst FROM walk w JOIN e2 e ON e.src = w.b
  )
  SELECT a, b FROM walk
),
m AS (
  SELECT r1.a AS v, r1.b AS u
  FROM r r1 JOIN r r2 ON r2.a = r1.b AND r2.b = r1.a
)
SELECT n.node, least(n.node, coalesce(min(m.u), n.node)) AS scc
FROM nodes n LEFT JOIN m ON m.v = n.node
GROUP BY n.node ORDER BY n.node"""
    )


def _shortest_paths_sql() -> str:
    """Per-landmark bounded recursive CTE over reversed edges, unioned and
    pivoted exactly like the Spark aggregation."""
    parts = []
    for lm in SP_LANDMARKS:
        parts.append(f"""
sp{lm} AS (
  WITH RECURSIVE w(node, dist) AS (
    SELECT CAST({lm} AS BIGINT) AS node, 0 AS dist
    UNION ALL
    SELECT e.src, w.dist + 1 FROM w JOIN edges e ON e.dst = w.node
    WHERE w.dist < {SP_MAX_HOPS}
  )
  SELECT node, min(dist) AS dist FROM w GROUP BY node
)""")
    union = " UNION ALL ".join(
        f"SELECT {lm} AS lm, node, dist FROM sp{lm}" for lm in SP_LANDMARKS
    )
    cols = ", ".join(
        f"CAST(min(CASE WHEN lm = {lm} THEN dist END) AS INT) AS d{lm}"
        for lm in SP_LANDMARKS
    )
    return (
        EDGES_SQL
        + ", "
        + ",".join(parts)
        + f"""
SELECT node, {cols}, count(*) AS n_reachable
FROM ({union}) GROUP BY node ORDER BY node"""
    )


# ---------------------------------------------------------------- oracle SQL


def _pagerank_sql() -> str:
    """Unrolled 3-iteration PageRank as chained CTEs, mirroring the Spark
    loop term-for-term (decimal accumulation included)."""
    sql = EDGES_SQL + """
, nodes AS (SELECT DISTINCT n FROM (SELECT src AS n FROM edges UNION ALL SELECT dst FROM edges)),
outd AS (SELECT src, count(*) AS outd FROM edges GROUP BY src),
r0 AS (SELECT n AS node, 1.0::DOUBLE AS rank FROM nodes)
"""
    for i in range(3):
        sql += f""",
c{i} AS (
  SELECT e.dst AS node,
         CAST(SUM(CAST(r.rank / o.outd AS DECIMAL(38,18))) AS DOUBLE) AS csum
  FROM edges e JOIN outd o ON e.src = o.src JOIN r{i} r ON e.src = r.node
  GROUP BY e.dst
),
r{i + 1} AS (
  SELECT n.node, 0.15 + 0.85 * coalesce(c.csum, 0.0) AS rank
  FROM (SELECT n AS node FROM nodes) n LEFT JOIN c{i} c ON n.node = c.node
)"""
    sql += "\nSELECT node, round(rank, 9) AS pagerank FROM r3 ORDER BY node"
    return sql.replace("r0 AS (SELECT n AS node", "r0 AS (SELECT n AS node", 1)


def _components_sql() -> str:
    sql = EDGES_SQL + """
, und AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges
  )
),
l0 AS (SELECT DISTINCT src AS node, src AS label FROM und)
"""
    for i in range(4):
        sql += f""",
nm{i} AS (
  SELECT u.src AS n2, min(l.label) AS nbr_label
  FROM und u JOIN l{i} l ON u.dst = l.node GROUP BY u.src
),
l{i + 1} AS (
  SELECT l.node, least(l.label, coalesce(m.nbr_label, l.label)) AS label
  FROM l{i} l LEFT JOIN nm{i} m ON l.node = m.n2
)"""
    sql += "\nSELECT label, count(*) AS component_size FROM l4 GROUP BY label ORDER BY label"
    return sql


ORACLES = {
    "graph_degrees": EDGES_SQL
    + """
    SELECT coalesce(o.node, i.node) AS node,
           coalesce(o.out_degree, 0) AS out_degree,
           coalesce(i.in_degree, 0) AS in_degree
    FROM (SELECT src AS node, count(*) AS out_degree FROM edges GROUP BY src) o
    FULL OUTER JOIN (SELECT dst AS node, count(*) AS in_degree FROM edges GROUP BY dst) i
      ON o.node = i.node
    ORDER BY node""",
    "graph_mutual_follows": EDGES_SQL
    + """
    SELECT a.src AS a, a.dst AS b
    FROM edges a JOIN edges b ON a.src = b.dst AND a.dst = b.src
    WHERE a.src < a.dst
    ORDER BY a, b""",
    "graph_two_hop": EDGES_SQL
    + """
    SELECT e1.src AS origin, count(DISTINCT e2.dst) AS n_two_hop
    FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
    WHERE e1.src < 10
    GROUP BY e1.src ORDER BY origin""",
    "graph_triangles": EDGES_SQL
    + """
    , und AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM edges WHERE src != dst
    )
    SELECT count(*) AS n_triangles
    FROM und e1 JOIN und e2 ON e1.b = e2.a
                JOIN und e3 ON e2.b = e3.b AND e1.a = e3.a""",
    "graph_pagerank": _pagerank_sql(),
    "graph_components": _components_sql(),
    "graph_khop": EDGES_SQL
    + """
    , bfs AS (
      WITH RECURSIVE walk(node, dist) AS (
        SELECT DISTINCT src AS node, 0 AS dist FROM edges WHERE src < 5
        UNION ALL
        SELECT e.dst, w.dist + 1 FROM walk w JOIN edges e ON e.src = w.node
        WHERE w.dist < 3
      )
      SELECT node, min(dist) AS dist FROM walk GROUP BY node
    )
    SELECT node, CAST(dist AS INT) AS dist FROM bfs ORDER BY node""",
    "graph_adjacency": EDGES_SQL
    + """
    SELECT src AS node,
           array_to_string(array_agg(dst ORDER BY dst), ',') AS following,
           count(*) AS n_following
    FROM edges GROUP BY src ORDER BY node""",
}

def q_graph_kcore(spark, sf_dir):
    """k-core decomposition by iterative peeling: repeatedly remove nodes
    whose degree inside the surviving subgraph falls below k until a
    fixpoint — the standard dense-subgraph / influence-core analytic.
    k adapts to the data as min_degree + 5 (a 1-row scalar broadcast, so
    the query is meaningful at every SF of the synthetic graph). Four
    fixed peel rounds with lineage checkpoints (the graph_components
    pattern — fixed depth keeps the oracle an unrolled CTE chain) plus an
    IN-QUERY convergence assertion: if round 4 still peeled anything the
    query throws and the driver row goes red rather than hashing a
    non-fixpoint. Output: each core member with its degree inside the
    core.

    100 TB shape: each round is one node-keyed semi-join pair + one
    degree agg over the SHRINKING survivor set — no global window, no
    collect (k is a broadcast 1-row min)."""
    e = edges(spark, sf_dir)
    clean = e.filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    ).filter(F.col("src") != F.col("dst"))
    und = (
        clean.union(clean.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .cache()
    )
    try:
        # degree = aggregate_messages with no vertex state: a 1-message per
        # edge, count-reduced at the src endpoint (und is symmetrized)
        deg0 = aggregate_messages(und, to="src", agg=[F.count("*").alias("d")])
        # freeze the 1-row threshold: without the checkpoint each of its
        # broadcast uses (initial filter, 3 rounds, still-count) re-runs
        # the full degree aggregation just to rebuild one number
        kdf = deg0.agg((F.min("d") + F.lit(5)).alias("k")).localCheckpoint(
            eager=True
        )
        nodes = (
            deg0.join(F.broadcast(kdf))
            .filter(F.col("d") >= F.col("k"))
            .select("node")
            .localCheckpoint(eager=True)
        )
        prev_ckpt = nodes
        for _ in range(3):
            within = und.join(
                nodes.select(F.col("node").alias("src")), "src", "left_semi"
            ).join(nodes.select(F.col("node").alias("dst")), "dst", "left_semi")
            deg = aggregate_messages(
                within, to="src", agg=[F.count("*").alias("d")]
            )
            nodes = (
                deg.join(F.broadcast(kdf))
                .filter(F.col("d") >= F.col("k"))
                .select("node")
                .localCheckpoint(eager=True)
            )
            prev_ckpt.unpersist()
            prev_ckpt = nodes
        # one extra peel must be a no-op, else 4 rounds did not reach the
        # fixpoint and the "k-core" below would be a lie. final_deg is
        # checkpointed BEFORE und is released, so the returned frame (and
        # the still-count) never recompute the peel from raw events.
        within = und.join(
            nodes.select(F.col("node").alias("src")), "src", "left_semi"
        ).join(nodes.select(F.col("node").alias("dst")), "dst", "left_semi")
        final_deg = aggregate_messages(
            within, to="src", agg=[F.count("*").alias("core_degree")]
        ).localCheckpoint(eager=True)
        still = (
            final_deg.join(F.broadcast(kdf))
            .filter(F.col("core_degree") < F.col("k"))
            .count()
        )
        if still != 0:
            raise RuntimeError(
                f"k-core peeling did not converge in 4 rounds ({still} under-k nodes)"
            )
    finally:
        und.unpersist()  # red path must not leak the cached edge set
    prev_ckpt.unpersist()  # final_deg is materialized; survivors frame free
    return final_deg.select("node", "core_degree").orderBy("node")


def _kcore_sql() -> str:
    """Unrolled 4-round peel, same k = min_degree + 5 rule."""
    rounds = []
    for i in range(1, 5):
        rounds.append(
            f"""n{i} AS (
              SELECT node FROM {'deg0' if i == 1 else f'd{i-1}'}, kval
              WHERE d >= k
            ),
            e{i} AS (
              SELECT u.src, u.dst FROM und u
              JOIN n{i} a ON u.src = a.node
              JOIN n{i} b ON u.dst = b.node
            ),
            d{i} AS (
              SELECT src AS node, count(*) AS d FROM e{i} GROUP BY src
            )"""
        )
    joined = ",\n".join(rounds)
    # composes the module's shared edge CTE (EDGES_SQL) like every other
    # oracle here, so an edge-derivation change cannot desync this one.
    # No trailing n4 re-join: every e4 endpoint is in n4 by construction.
    return (
        EDGES_SQL
        + f"""
        , und AS (
          SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM edges
             WHERE src IS NOT NULL AND dst IS NOT NULL AND src != dst
            UNION ALL
            SELECT dst AS src, src AS dst FROM edges
             WHERE src IS NOT NULL AND dst IS NOT NULL AND src != dst
          )
        ),
        deg0 AS (SELECT src AS node, count(*) AS d FROM und GROUP BY src),
        kval AS (SELECT min(d) + 5 AS k FROM deg0),
        {joined}
        SELECT node, d AS core_degree FROM d4 ORDER BY node"""
    )


# _kcore_sql is defined below the ORACLES literal; register it here
ORACLES["graph_kcore"] = _kcore_sql()
ORACLES["graph_shortest_paths"] = _shortest_paths_sql()
ORACLES["graph_scc"] = _scc_sql()
ORACLES["graph_lpa"] = _lpa_sql()

QUERIES = {
    "graph_lpa": q_graph_lpa,
    "graph_scc": q_graph_scc,
    "graph_kcore": q_graph_kcore,
    "graph_degrees": q_graph_degrees,
    "graph_mutual_follows": q_graph_mutual_follows,
    "graph_two_hop": q_graph_two_hop,
    "graph_triangles": q_graph_triangles,
    "graph_pagerank": q_graph_pagerank,
    "graph_components": q_graph_components,
    "graph_adjacency": q_graph_adjacency,
    "graph_khop": q_graph_khop,
    "graph_shortest_paths": q_graph_shortest_paths,
}
