"""Biconnected components, articulation points, bridges.

Parity target: reference ``components/BiconnectedComponents.hpp:26``
(241 LoC, Hopcroft-Tarjan low-link DFS).

DFS low-link is inherently sequential (SURVEY §7 risk register), so this
is the documented driver-side fallback: the edge set of each connected
component is collected and a single iterative (stack-based) Tarjan pass
labels its edges. A size guard refuses graphs beyond ``max_edges`` so the
fallback can't silently melt the driver at cluster scale — for 100 TB
graphs biconnectivity is typically run per-community after partitioning,
which is exactly the collected-subgraph shape supported here.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _collect_adj(edges_undirected: DataFrame, max_edges: int):
    e = (
        edges_undirected.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
    )
    cnt = e.count()
    if cnt > max_edges:
        raise ValueError(
            f"biconnected-components driver fallback refuses {cnt} edges "
            f"(max_edges={max_edges}); partition the graph first"
        )
    adj: dict[int, list[int]] = defaultdict(list)
    pairs = []
    for r in e.collect():
        u, v = int(r["u"]), int(r["v"])
        adj[u].append(v)
        adj[v].append(u)
        pairs.append((u, v))
    for k in adj:
        adj[k].sort()  # deterministic traversal order
    return adj, pairs


def _tarjan_bcc(adj):
    """Iterative Hopcroft-Tarjan. Returns (edge→bcc_id dict,
    articulation set, bridge set)."""
    disc: dict[int, int] = {}
    low: dict[int, int] = {}
    comp_of_edge: dict[tuple[int, int], int] = {}
    articulation: set[int] = set()
    bridges: set[tuple[int, int]] = set()
    timer = [0]
    bcc_id = [0]

    for root in sorted(adj):
        if root in disc:
            continue
        estack: list[tuple[int, int]] = []
        # frame: (node, parent, iterator index)
        stack = [(root, -1, 0)]
        disc[root] = low[root] = timer[0]
        timer[0] += 1
        root_children = 0
        while stack:
            u, parent, i = stack[-1]
            if i < len(adj[u]):
                stack[-1] = (u, parent, i + 1)
                w = adj[u][i]
                if w not in disc:
                    if u == root:
                        root_children += 1
                    estack.append((min(u, w), max(u, w)))
                    disc[w] = low[w] = timer[0]
                    timer[0] += 1
                    stack.append((w, u, 0))
                elif w != parent and disc[w] < disc[u]:
                    estack.append((min(u, w), max(u, w)))
                    low[u] = min(low[u], disc[w])
            else:
                stack.pop()
                if stack:
                    p = stack[-1][0]
                    low[p] = min(low[p], low[u])
                    if low[u] >= disc[p]:
                        # p is an articulation point (checked for root below);
                        # pop the component
                        if p != root:
                            articulation.add(p)
                        cid = bcc_id[0]
                        bcc_id[0] += 1
                        edge_pu = (min(p, u), max(p, u))
                        members = 0
                        while estack:
                            ed = estack.pop()
                            comp_of_edge[ed] = cid
                            members += 1
                            if ed == edge_pu:
                                break
                        if members == 1 and low[u] > disc[p]:
                            bridges.add(edge_pu)
        if root_children >= 2:
            articulation.add(root)
    return comp_of_edge, articulation, bridges


def biconnected_components(
    edges_undirected: DataFrame, max_edges: int = 200_000
) -> DataFrame:
    """(u, v, bcc) — biconnected-component id per edge (u < v)."""
    adj, pairs = _collect_adj(edges_undirected, max_edges)
    comp, _, _ = _tarjan_bcc(adj)
    spark = edges_undirected.sparkSession
    rows = [(u, v, comp.get((u, v), -1)) for u, v in sorted(pairs)]
    return spark.createDataFrame(rows, "u long, v long, bcc long")


def articulation_points(
    edges_undirected: DataFrame, max_edges: int = 200_000
) -> DataFrame:
    """(id) — cut vertices."""
    adj, _ = _collect_adj(edges_undirected, max_edges)
    _, arts, _ = _tarjan_bcc(adj)
    spark = edges_undirected.sparkSession
    if not arts:
        return spark.createDataFrame([], "id long")
    return spark.createDataFrame([(a,) for a in sorted(arts)], "id long")


def bridges(edges_undirected: DataFrame, max_edges: int = 200_000) -> DataFrame:
    """(u, v) — cut edges (u < v)."""
    adj, _ = _collect_adj(edges_undirected, max_edges)
    _, _, brs = _tarjan_bcc(adj)
    spark = edges_undirected.sparkSession
    if not brs:
        return spark.createDataFrame([], "u long, v long")
    return spark.createDataFrame(sorted(brs), "u long, v long")
