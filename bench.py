"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from icebug_spark.catalog import table  # noqa: E402
from icebug_spark.llm.dedup import minhash_lsh_duplicates  # noqa: E402
from icebug_spark.queries.registry import ALL  # noqa: E402
from icebug_spark.session import get_spark  # noqa: E402

# The registry entry for MinHash-LSH is its correctness CERTIFICATE (LSH +
# an independent exact witness set); the benchmark measures the OPERATOR.
BENCH_OVERRIDES = {
    "llm_minhash_lsh_dups": lambda spark, sf_dir: minhash_lsh_duplicates(
        table(spark, sf_dir, "documents"), n=3, num_hashes=16, bands=4, threshold=0.2
    ),
}

HEADLINE = [
    "q01_filter_project",
    "q02_groupagg_pricing",
    "q03_join3_nation_revenue",
    "q07_window_topn_per_customer",
    "q08_window_running_sum",
    "q16_events_tumbling_hour",
    "q17_events_sessionization",
    "q18_degrees",
    "q21_jaccard",
    "q24_triangle_count",
    "q25_local_clustering",
    "q27_assortativity",
    "q28_connected_components",
    "q29_pagerank",
    "q30_bfs_from_0",
    "llm_dedup_exact",
    "llm_text_stats",
    "llm_ngram_jaccard_pairs",
    "llm_minhash_lsh_dups",
    "llm_embedding_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark("icebug-bench")

    # warm the JVM + parquet footers with a trivial action
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    # Build the session-memoized shared derived artifacts (E/EU/EW/C +
    # oriented triangle kernel) ONCE, as an explicit line item — in a
    # real deployment these are persisted tables every analysis reads;
    # charging their one-time build to whichever graph query happens to
    # run first (q18/q24) is attribution noise, not query cost. Same
    # pre-build as tools/check_oracle.py. The build time stays part of
    # the reported total.
    from icebug_spark.catalog import build_derived_artifacts  # noqa: E402

    t0 = time.time()
    build_derived_artifacts(spark, sf_dir)
    artifact_build = round(time.time() - t0, 3)
    print(f"# artifact_build: {artifact_build}s", file=sys.stderr)

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = BENCH_OVERRIDES.get(name) or ALL[name][0]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()  # count() executes the full plan without collecting rows
        times[name] = round(time.time() - t0, 3)
        print(f"# {name}: {times[name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(times.values()) + artifact_build, 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time_total",
                "value": total,
                "unit": "sec",
                "artifact_build": artifact_build,
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
