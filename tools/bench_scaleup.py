"""BENCH_SCALEUP — the scale-up evidence artifact (round-9 verdict
item 2): the 100 TB design claims rest on the mirror() broadcast cap
degrading gracefully to shuffle-hash, and on bucketing the
loop-invariant edge table eliding the per-round edge Exchange. This
harness makes the crossover VISIBLE IN NUMBERS instead of plan tests:
R-MAT graphs at three sizes (2^21 / 2^23 / 2^25 directed edges before
dedup; scale 18/20/22, edge factor 8), four iterative kernels
(BFS / connected components / PageRank / k-core), three join modes:

  broadcast    — mirror() state broadcast (cap raised above n)
  shuffle_hash — cap 0: every round joins state via shuffle-hash
  bucketed     — cap 0 + src-bucketed edge tables (Exchange elided)

Expected shape (and what round-8's BENCH_BUCKETED showed at sf0.1):
broadcast wins while the vertex state fits the cap; its margin SHRINKS
as n grows (the broadcast itself becomes the per-round cost), while
bucketed shuffle-hash tracks it within a small constant — evidence the
1e9-node path, where broadcast is impossible, has sane constants.
Writes BENCH_SCALEUP.json at the repo root.

Runtime control: best-of-2 for the short kernels (single-rep iterative
timings proved noisy across identical runs — GC + AQE variance flipped
a 3x on BFS), single rep for k-core (the longest kernel; its ordering
is decided by minutes, not noise); k-core uses k = 2·edge_factor so
the peel converges in a handful of rounds at every size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from icebug_spark.operators.centrality import pagerank  # noqa: E402
from icebug_spark.operators.components import connected_components  # noqa: E402
from icebug_spark.operators.kcore import k_core  # noqa: E402
from icebug_spark.operators.traversal import bfs_distances  # noqa: E402
from icebug_spark.plans.bucketing import write_bucketed_edges  # noqa: E402
from icebug_spark.session import get_spark  # noqa: E402
from icebug_spark.sources.generators import rmat  # noqa: E402

SCALES = [int(s) for s in os.environ.get("SPARK_GRAFT_SCALES", "18,20,22").split(",")]
EDGE_FACTOR = 8
BUCKETS = {18: 8, 20: 16, 22: 32}
MODES = ("broadcast", "shuffle_hash", "bucketed")


def main() -> None:
    spark = get_spark("bench-scaleup")
    out: dict = {
        "metric": "scaleup_iterative_kernels",
        "unit": "sec",
        "edge_factor": EDGE_FACTOR,
        "sizes": {},
    }

    for scale in SCALES:
        n_nodes = 1 << scale
        g = rmat(spark, scale, edge_factor=EDGE_FACTOR, seed=7)
        e = g.edges
        eu = (
            e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
            .distinct()
        )
        buckets = BUCKETS.get(scale, 32)
        for name, df in (("e", e), ("eu", eu)):
            spark.sql(f"DROP TABLE IF EXISTS scaleup_{name}_plain")
            df.write.mode("overwrite").saveAsTable(f"scaleup_{name}_plain")
            write_bucketed_edges(
                spark.table(f"scaleup_{name}_plain"),
                f"scaleup_{name}_bkt",
                buckets=buckets,
                key="src",
            )
        m_edges = spark.table("scaleup_e_plain").count()
        print(f"# scale {scale}: n={n_nodes} m={m_edges}", file=sys.stderr)

        # untimed warmup (codegen + JIT) on the smallest structures
        bfs_distances(spark.table("scaleup_eu_plain"), 0, max_hops=2).count()

        size_res: dict = {"n_nodes": n_nodes, "m_edges": m_edges, "buckets": buckets, "modes": {}}
        try:
            for mode in MODES:
                # drop lingering localCheckpoint blocks from the previous
                # mode: releasing the Python-side DataFrame refs lets the
                # ContextCleaner evict their RDD blocks, so mode N+1 does
                # not pay mode N's storage pressure (observed: identical
                # kernels 3-4x slower late in a session without this)
                import gc as _gc

                _gc.collect()
                spark.sparkContext._jvm.System.gc()
                time.sleep(2)
                spark.conf.set(
                    "spark.icebug.vertexBroadcastRows",
                    "0" if mode != "broadcast" else str(1 << 27),
                )
                suffix = "bkt" if mode == "bucketed" else "plain"
                et = spark.table(f"scaleup_e_{suffix}")
                eut = spark.table(f"scaleup_eu_{suffix}")
                times: dict[str, float] = {}
                for qname, fn, reps in (
                    ("bfs", lambda: bfs_distances(eut, 0, max_hops=8), 2),
                    ("cc", lambda: connected_components(eut), 2),
                    (
                        "pagerank",
                        lambda: pagerank(
                            et, damping=0.85, max_iter=8, distribute_sinks=False
                        ),
                        2,
                    ),
                    ("kcore", lambda: k_core(eut, k=2 * EDGE_FACTOR), 1),
                ):
                    best = None
                    for _rep in range(reps):
                        t0 = time.time()
                        rows = fn().count()
                        dt = time.time() - t0
                        best = dt if best is None else min(best, dt)
                    times[qname] = round(best, 2)
                    print(
                        f"# scale {scale} {mode}/{qname}: {times[qname]}s"
                        f" ({rows} rows)",
                        file=sys.stderr,
                    )
                times["total"] = round(sum(times.values()), 2)
                size_res["modes"][mode] = times
        finally:
            spark.conf.unset("spark.icebug.vertexBroadcastRows")
            for name in ("e", "eu"):
                spark.sql(f"DROP TABLE IF EXISTS scaleup_{name}_plain")
                spark.sql(f"DROP TABLE IF EXISTS scaleup_{name}_bkt")
        b = size_res["modes"]
        size_res["shuffle_vs_broadcast"] = round(
            b["shuffle_hash"]["total"] / b["broadcast"]["total"], 2
        )
        size_res["bucketed_vs_broadcast"] = round(
            b["bucketed"]["total"] / b["broadcast"]["total"], 2
        )
        out["sizes"][f"2^{scale}"] = size_res

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SCALEUP.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
