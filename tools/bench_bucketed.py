"""Scale evidence for the past-broadcast-cap iterative path.

The iterative kernels (BFS / connected components / PageRank) broadcast
their vertex-sized loop state while it fits ``spark.icebug.
vertexBroadcastRows`` and degrade to a shuffle-hash join past the cap —
where, on a cluster, bucketing the loop-invariant edge table by the join
key elides the edge-side Exchange every round
(``plans/bucketing.py``; per-round plan proof in
``tests/test_bucketing.py``). This harness produces the TIMING half of
that claim: the three kernels at ``$SPARK_GRAFT_SF_DIR`` (default
sf0.1) in three configurations:

  broadcast    — default mirror() path (state broadcast), plain tables
  shuffle_hash — vertexBroadcastRows=0, plain parquet tables
  bucketed     — vertexBroadcastRows=0, src-bucketed tables (32 buckets)

Writes ``BENCH_BUCKETED.json`` at the repo root and prints it. The
acceptance bar (VERDICT r03): the bucketed shuffle-hash loops land
within ~2x of broadcast mode at sf0.1 — evidence the 1e9-node path
(where broadcast is impossible) has sane constants.

Bucket-count sizing (the round-4 "bucketed BFS slower than plain
shuffle-hash" anomaly, root-caused by a bucket-count sweep at sf0.1:
plain 3.8s, 8 buckets 2.8s, 32 buckets 3.5s, 128 buckets 5.1s):
a join against a bucketed table PINS its partition count to the bucket
count and AQE cannot coalesce it, so every loop round schedules
``buckets`` tasks even when the round's data is tiny — at toy scale a
20-round BFS is pure task-scheduling floor, while the plain path's AQE
coalesces each round to 1-2 tasks. PageRank, whose per-round shuffle
carries real volume, won under bucketing even at 32. The rule (also in
``plans/bucketing.py``): buckets ≈ edge bytes / ~256 MB on a cluster —
sized to the DATA, never above the useful parallelism for one round's
work. Default here is 8 (≈20 MB edge table at sf0.1); override with
``$SPARK_GRAFT_BUCKETS``. Kernels are timed best-of-2 to keep one GC
pause from deciding a 3-second comparison.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from icebug_spark.catalog import derived_edges, symmetrize  # noqa: E402
from icebug_spark.operators.centrality import pagerank  # noqa: E402
from icebug_spark.operators.components import connected_components  # noqa: E402
from icebug_spark.operators.traversal import bfs_distances  # noqa: E402
from icebug_spark.plans.bucketing import write_bucketed_edges  # noqa: E402
from icebug_spark.session import get_spark  # noqa: E402

BUCKETS = int(os.environ.get("SPARK_GRAFT_BUCKETS", "8"))
MODES = ("broadcast", "shuffle_hash", "bucketed")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark("bench-bucketed")

    # one-time setup, outside all timings: E (directed) and EU
    # (symmetrized) persisted twice — plain and src-bucketed — so every
    # mode reads an identical parquet artifact and only the join
    # strategy differs.
    e = derived_edges(spark, sf_dir)
    eu = symmetrize(e)
    for name, df in (("e", e), ("eu", eu)):
        spark.sql(f"DROP TABLE IF EXISTS bench_{name}_plain")
        df.write.mode("overwrite").saveAsTable(f"bench_{name}_plain")
        write_bucketed_edges(
            spark.table(f"bench_{name}_plain"),
            f"bench_{name}_bkt",
            buckets=BUCKETS,
            key="src",
        )

    # untimed warmup: the first iterative loop in a session pays JVM +
    # whole-stage-codegen compilation; without this the first mode's
    # first kernel absorbs it and skews the comparison.
    bfs_distances(spark.table("bench_eu_plain"), 0, max_hops=3).count()
    pagerank(spark.table("bench_e_plain"), max_iter=2, distribute_sinks=False).count()

    results: dict[str, dict[str, float]] = {}
    try:
        for mode in MODES:
            spark.conf.set(
                "spark.icebug.vertexBroadcastRows",
                "0" if mode != "broadcast" else str(20_000_000),
            )
            suffix = "bkt" if mode == "bucketed" else "plain"
            et = spark.table(f"bench_e_{suffix}")
            eut = spark.table(f"bench_eu_{suffix}")
            times: dict[str, float] = {}
            for qname, fn in (
                ("bfs", lambda: bfs_distances(eut, 0, max_hops=20)),
                ("cc", lambda: connected_components(eut)),
                (
                    "pagerank",
                    lambda: pagerank(
                        et, damping=0.85, max_iter=15, distribute_sinks=False
                    ),
                ),
            ):
                best = None
                for _rep in range(2):
                    t0 = time.time()
                    n = fn().count()
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                times[qname] = round(best, 2)
                print(
                    f"# {mode}/{qname}: {times[qname]}s ({n} rows)",
                    file=sys.stderr,
                )
            times["total"] = round(sum(times.values()), 2)
            results[mode] = times
    finally:
        spark.conf.unset("spark.icebug.vertexBroadcastRows")
        for name in ("e", "eu"):
            spark.sql(f"DROP TABLE IF EXISTS bench_{name}_plain")
            spark.sql(f"DROP TABLE IF EXISTS bench_{name}_bkt")

    ratio = round(results["bucketed"]["total"] / results["broadcast"]["total"], 2)
    out = {
        "metric": "iterative_kernels_past_broadcast_cap",
        "unit": "sec",
        "sf": sf,
        "buckets": BUCKETS,
        "modes": results,
        "bucketed_vs_broadcast_ratio": ratio,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_BUCKETED.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
