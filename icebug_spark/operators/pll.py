"""Exact pruned landmark labeling (2-hop hub labels) + exact distance
queries over the label table.

Parity target: reference ``distance/PrunedLandmarkLabeling.hpp:12`` and
``DynPrunedLandmarkLabeling.hpp:17`` (Akiba-Iwata-Yoshida, SIGMOD'13).

Label CONSTRUCTION is inherently sequential — root i's pruned BFS prunes
with the labels of roots 0..i-1, which is exactly why the reference is a
single-threaded C++ loop. Following the repo's documented driver-fallback
pattern (SURVEY §7; biconnected components), construction collects the
edge set under a size guard and runs the pruned BFS in pure Python. The
LABEL TABLE and every distance QUERY over it are fully distributed —
hub-label queries are the classic join-aggregate:

    d(u,v) = min over common hubs h of d(u,h) + d(h,v)

which Spark executes as a bucketed equi-join on the hub id. At 100 TB the
production shape is: build labels once per (partitioned) component —
PLL label tables are the artifact you broadcast/bucket, construction is a
preprocessing step, and the approximate ``landmark_labels`` variant in
``operators/distances2.py`` remains the fully-distributed alternative.

The incremental variant (``insert_edge``) implements the
DynPrunedLandmarkLabeling resume-BFS update: after inserting (u, v),
for every hub label (h, d) of u, resume a pruned BFS from v at depth
d+1 (and symmetrically), which restores exactness without rebuilding.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _collect_adj(eu: DataFrame, max_edges: int):
    e = (
        eu.where(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v"))
        .distinct()
    )
    cnt = e.count()
    if cnt > max_edges:
        raise ValueError(
            f"exact-PLL driver construction refuses {cnt} edges "
            f"(max_edges={max_edges}); use distances2.landmark_labels at scale"
        )
    adj: dict[int, list[int]] = defaultdict(list)
    for r in e.collect():
        u, v = int(r["u"]), int(r["v"])
        adj[u].append(v)
        adj[v].append(u)
    return adj


class ExactPLL:
    """Holds the python-side labels (for incremental updates) and exposes
    the distributed label table + query joins."""

    def __init__(self, adj: dict[int, list[int]]):
        self.adj = adj
        # degree-descending order (ties by id) — reference ordering
        self.order = sorted(adj, key=lambda u: (-len(adj[u]), u))
        self.rank = {u: i for i, u in enumerate(self.order)}
        self.labels: dict[int, dict[int, int]] = {u: {} for u in adj}
        for root in self.order:
            self._pruned_bfs(root, {root: 0})

    def _query_py(self, u: int, v: int) -> float:
        lu, lv = self.labels[u], self.labels[v]
        if len(lu) > len(lv):
            lu, lv = lv, lu
        best = float("inf")
        for h, du in lu.items():
            dv = lv.get(h)
            if dv is not None and du + dv < best:
                best = du + dv
        return best

    def _pruned_bfs(self, root: int, frontier: dict[int, int]) -> None:
        """Pruned BFS from ``root`` starting at the given frontier depths;
        a visit at (w, d) is pruned when existing labels already certify
        d(root, w) <= d. Used both at construction (frontier = {root: 0})
        and for the dynamic resume update."""
        rroot = self.rank[root]
        seen = set(frontier)
        cur = frontier
        while cur:
            nxt: dict[int, int] = {}
            for w, d in cur.items():
                # prune: only label w from root if root outranks w's hubs
                if self._query_py(root, w) <= d:
                    continue
                self.labels[w][root] = d
                for x in self.adj[w]:
                    if x not in seen and self.rank.get(x, -1) > rroot:
                        seen.add(x)
                        nxt[x] = d + 1
            cur = nxt

    def insert_edge(self, u: int, v: int) -> None:
        """DynPrunedLandmarkLabeling.insertEdge parity: resume pruned BFS
        from each endpoint for every hub on the other side. New nodes are
        appended at the lowest priority rank and self-labeled."""
        for w in (u, v):
            if w not in self.labels:
                self.adj.setdefault(w, [])
                self.order.append(w)
                self.rank[w] = len(self.order) - 1
                self.labels[w] = {}
                self._pruned_bfs(w, {w: 0})
        self.adj[u].append(v)
        self.adj[v].append(u)
        for a, b in ((u, v), (v, u)):
            for h, d in sorted(self.labels[a].items(), key=lambda t: self.rank[t[0]]):
                self._pruned_bfs(h, {b: d + 1})

    def label_table(self, spark) -> DataFrame:
        rows = [
            (u, h, d) for u, lab in self.labels.items() for h, d in lab.items()
        ]
        return spark.createDataFrame(rows, "id BIGINT, hub BIGINT, dist BIGINT")


def build_exact_pll(eu: DataFrame, max_edges: int = 200_000) -> ExactPLL:
    """Construct exact 2-hop labels (driver-side, size-guarded)."""
    return ExactPLL(_collect_adj(eu, max_edges))


def pll_label_table(eu: DataFrame, max_edges: int = 200_000) -> DataFrame:
    """(id, hub, dist) exact 2-hop label table as a DataFrame."""
    return build_exact_pll(eu, max_edges).label_table(eu.sparkSession)


def pll_distance(labels: DataFrame, pairs: DataFrame) -> DataFrame:
    """EXACT distance for (u, v) pairs via the hub join — unlike
    ``landmark_distance`` this is not an upper bound, because the label
    set is a complete 2-hop cover. Unreachable pairs are omitted."""
    lu = labels.select(F.col("id").alias("u"), "hub", F.col("dist").alias("du"))
    lv = labels.select(F.col("id").alias("v"), "hub", F.col("dist").alias("dv"))
    return (
        pairs.join(lu, "u")
        .join(lv, ["v", "hub"])
        .groupBy("u", "v")
        .agg(F.min(F.col("du") + F.col("dv")).alias("dist"))
    )
