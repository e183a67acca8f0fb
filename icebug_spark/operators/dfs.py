"""DFS orderings and traversal callbacks.

Parity target: reference ``networkit/traversal.pyx:94-195`` —
``Traversal.DFSfrom`` / ``DFSEdgesFrom`` (node and edge callbacks in
depth-first order).

DFS order is inherently sequential (SURVEY §7 risk register — the stack
discipline admits no frontier parallelism), so this is the documented
driver-fallback shape used by biconnected components and planarity:
collect the (component's) adjacency under a size guard, run an iterative
DFS, return the ordering as a DataFrame. At 100 TB DFS is run
per-community after partitioning — precisely the collected-subgraph
regime this supports. BFS/levels remain the distributed traversal.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _collect_adj(edges: DataFrame, directed: bool, max_edges: int):
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    cnt = e.count()
    if cnt > max_edges:
        raise ValueError(
            f"dfs driver fallback refuses {cnt} edges (max_edges={max_edges}); "
            "partition the graph first"
        )
    adj: dict[int, list[int]] = defaultdict(list)
    for r in e.collect():
        u, v = int(r["src"]), int(r["dst"])
        adj[u].append(v)
        if not directed:
            adj[v].append(u)
    for u in adj:
        adj[u].sort()  # deterministic visit order (reference iterates CSR order)
    return adj


def dfs_ordering(
    edges: DataFrame,
    source: int,
    directed: bool = False,
    max_edges: int = 200_000,
) -> DataFrame:
    """Depth-first orderings from ``source`` →
    (id, preorder, postorder, parent) — parent is NULL at the source;
    unreachable nodes are omitted. Neighbors are visited in ascending id
    (the deterministic analog of the reference's CSR order)."""
    adj = _collect_adj(edges, directed, max_edges)
    pre: dict[int, int] = {}
    post: dict[int, int] = {}
    parent: dict[int, int | None] = {int(source): None}
    ctr_pre = ctr_post = 0
    stack: list[tuple[int, iter]] = [(int(source), iter(adj.get(int(source), [])))]
    pre[int(source)] = ctr_pre
    ctr_pre += 1
    while stack:
        u, it = stack[-1]
        advanced = False
        for w in it:
            if w not in pre:
                parent[w] = u
                pre[w] = ctr_pre
                ctr_pre += 1
                stack.append((w, iter(adj.get(w, []))))
                advanced = True
                break
        if not advanced:
            stack.pop()
            post[u] = ctr_post
            ctr_post += 1
    rows = [(u, pre[u], post[u], parent[u]) for u in pre]
    return edges.sparkSession.createDataFrame(
        rows, "id BIGINT, preorder BIGINT, postorder BIGINT, parent BIGINT"
    )


def dfs_edges(
    edges: DataFrame,
    source: int,
    directed: bool = False,
    max_edges: int = 200_000,
) -> DataFrame:
    """DFS tree edges in visit order → (step, src, dst) — the
    ``DFSEdgesFrom`` callback stream as a DataFrame."""
    ordering = dfs_ordering(edges, source, directed, max_edges)
    return (
        ordering.where(F.col("parent").isNotNull())
        .select(
            (F.col("preorder") - 1).alias("step"),
            F.col("parent").alias("src"),
            F.col("id").alias("dst"),
        )
        .orderBy("step")
    )
