"""Convergence-loop graph algorithms vs exact single-machine references:
components against union-find, pagerank against pure-Python power iteration
on the same (small) edge set."""

from __future__ import annotations

from pyspark.sql import functions as F

from octopusdb_spark.functions.graph_algos import connected_components, pagerank
from octopusdb_spark.queries.graph import edges


def _collect_edges(spark, sf_dir):
    return [(r["src"], r["dst"]) for r in edges(spark, sf_dir).collect()]


def test_connected_components_matches_union_find(spark, sf_dir):
    es = _collect_edges(spark, sf_dir)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for s, d in es:
        union(s, d)
    # canonical component = min member
    want = {}
    members: dict = {}
    for v in parent:
        members.setdefault(find(v), []).append(v)
    for root, vs in members.items():
        canon = min(vs + [root])
        for v in vs:
            want[v] = canon
    rows = connected_components(edges(spark, sf_dir)).collect()
    assert all(r["converged"] for r in rows)
    got = {r["node"]: r["component"] for r in rows}
    assert got == want


def test_connected_components_reports_non_convergence(spark):
    # a chain needs ~diameter rounds; 3 rounds on a 12-node path is not enough
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "src long, dst long"
    )
    rows = connected_components(chain, max_iter=3).collect()
    assert rows and all(not r["converged"] for r in rows)
    full = connected_components(chain, max_iter=20).collect()
    assert all(r["converged"] for r in full)
    assert {r["component"] for r in full} == {0}


def test_pagerank_converges_and_matches_power_iteration(spark, sf_dir):
    es = _collect_edges(spark, sf_dir)
    nodes = sorted({v for e in es for v in e})
    outd: dict = {}
    for s, _ in es:
        outd[s] = outd.get(s, 0) + 1
    rank = {v: 1.0 for v in nodes}
    for _ in range(200):
        contrib: dict = {}
        for s, d in es:
            contrib[d] = contrib.get(d, 0.0) + rank[s] / outd[s]
        new = {v: 0.15 + 0.85 * contrib.get(v, 0.0) for v in nodes}
        delta = max(abs(new[v] - rank[v]) for v in nodes)
        rank = new
        if delta < 1e-9:
            break

    out = pagerank(edges(spark, sf_dir), tol=1e-8).collect()
    got = {r["node"]: r["pagerank"] for r in out}
    n_iter = out[0]["n_iter"]
    assert 1 < n_iter < 50  # converged before the cap, after real work
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - rank[v]) < 1e-5, f"node {v}: {got[v]} vs {rank[v]}"


def test_kcore_non_convergence_reddens(spark, monkeypatch):
    """The in-query fixpoint assertion must raise when 4 peel rounds are
    not enough — a crafted onion graph (pendant -> chain of nodes each
    propped up by the previous one + 5 clique anchors) unravels one node
    per round, so the 4-round peel cannot reach the fixpoint and the
    query must redden rather than hash a non-core."""
    import pytest as _pytest

    import octopusdb_spark.queries.graph as g

    edges = []
    clique = list(range(100, 112))  # degree 11 >= k forever
    for i, a in enumerate(clique):
        for b in clique[i + 1 :]:
            edges.append((a, b))
    # chain: v0 pendant (makes min degree 1 -> k = 6); every other vi has
    # degree exactly 6 (prev + next + 4 anchors; the tail gets 5 anchors),
    # so each round's removal drops exactly the next node below k
    chain = list(range(7))
    for i in range(len(chain) - 1):
        edges.append((chain[i], chain[i + 1]))
    for v in chain[1:-1]:
        for c in clique[:4]:
            edges.append((v, c))
    for c in clique[:5]:
        edges.append((chain[-1], c))
    df = spark.createDataFrame(edges, "src long, dst long")
    monkeypatch.setattr(g, "edges", lambda _spark, _sf: df)
    with _pytest.raises(RuntimeError, match="did not converge"):
        g.q_graph_kcore(spark, "unused")


def test_scc_matches_tarjan(spark, monkeypatch):
    """graph_scc (converged FW-BW-Trim coloring) must equal the exact
    SCC labeling (min node id per component) computed by an independent
    iterative Tarjan over a crafted graph that exercises every branch:
    two cycles joined by a one-way bridge (same weak component, distinct
    SCCs), a 2-cycle reachable only through another SCC (multi-round
    peel), a pure DAG tail (trim path), a self-loop, and an isolated
    feeder node."""
    import octopusdb_spark.queries.graph as g

    raw = [
        (1, 2), (2, 3), (3, 1),          # 3-cycle {1,2,3}
        (3, 10), (10, 11), (11, 10),     # bridge into 2-cycle {10,11}
        (11, 40), (40, 41), (41, 40),    # second 2-cycle behind the first
        (20, 1),                         # feeder: trivial SCC {20}
        (30, 30),                        # self-loop: trivial SCC {30}
        (50, 51), (51, 52),              # DAG chain: all trivial
        (52, 40),                        # DAG tail rejoining a cycle
    ]

    def tarjan(edge_list):
        adj: dict = {}
        nodes = set()
        for a, b in edge_list:
            adj.setdefault(a, []).append(b)
            nodes.update((a, b))
        index: dict = {}
        low: dict = {}
        on: set = set()
        stack: list = []
        label: dict = {}
        counter = [0]

        def strongconnect(v):
            # iterative Tarjan (explicit work stack)
            work = [(v, 0)]
            while work:
                node, pi = work.pop()
                if pi == 0:
                    index[node] = low[node] = counter[0]
                    counter[0] += 1
                    stack.append(node)
                    on.add(node)
                recurse = False
                succs = adj.get(node, [])
                for i in range(pi, len(succs)):
                    w = succs[i]
                    if w not in index:
                        work.append((node, i + 1))
                        work.append((w, 0))
                        recurse = True
                        break
                    if w in on:
                        low[node] = min(low[node], index[w])
                if recurse:
                    continue
                if low[node] == index[node]:
                    comp = []
                    while True:
                        w = stack.pop()
                        on.discard(w)
                        comp.append(w)
                        if w == node:
                            break
                    m = min(comp)
                    for w in comp:
                        label[w] = m
                if work:
                    parent = work[-1][0]
                    low[parent] = min(low[parent], low[node])

        for v in sorted(nodes):
            if v not in index:
                strongconnect(v)
        return label

    expected = tarjan(raw)
    df = spark.createDataFrame(raw, "src long, dst long")
    monkeypatch.setattr(g, "edges", lambda _spark, _sf: df)
    got = {r["node"]: r["scc"] for r in g.q_graph_scc(spark, "unused").collect()}
    assert got == expected
    # sanity on the fixture itself: the two 2-cycles stayed separate SCCs
    assert expected[10] == 10 and expected[40] == 40 and expected[52] == 52


def test_lpa_matches_reference_implementation(spark, monkeypatch):
    """graph_lpa must equal an independent pure-Python implementation of
    the same spec (synchronous rounds, most-frequent neighbor label,
    min-label tie-break) on a two-community graph, and the communities
    must actually separate: two 5-cliques joined by one bridge edge end
    with distinct labels on each side."""
    import octopusdb_spark.queries.graph as g
    from octopusdb_spark.queries.graph import LPA_ROUNDS

    a = list(range(5))
    b = list(range(10, 15))
    raw = [(x, y) for i, x in enumerate(a) for y in a[i + 1 :]]
    raw += [(x, y) for i, x in enumerate(b) for y in b[i + 1 :]]
    raw.append((4, 10))  # the bridge

    def reference(edge_list, rounds):
        adj: dict = {}
        for x, y in edge_list:
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
        labels = {v: v for v in adj}
        for _ in range(rounds):
            nxt = {}
            for v in adj:
                freq: dict = {}
                for u in adj[v]:
                    freq[labels[u]] = freq.get(labels[u], 0) + 1
                best = max(freq.items(), key=lambda kv: (kv[1], -kv[0]))
                nxt[v] = best[0]
            labels = nxt
        return labels

    expected = reference(raw, LPA_ROUNDS)
    df = spark.createDataFrame(raw, "src long, dst long")
    monkeypatch.setattr(g, "edges", lambda _spark, _sf: df)
    got = {r["node"]: r["label"] for r in g.q_graph_lpa(spark, "unused").collect()}
    assert got == expected
    # the spec-level outcome: one label per clique, different across them
    assert len({got[v] for v in a}) == 1
    assert len({got[v] for v in b}) == 1
    assert got[0] != got[10]
