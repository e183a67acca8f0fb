"""Count Spark JOBS submitted per registry query — the host-independent
evidence for the round-10 loop-fusion work: wall times on the (noisy,
externally loaded) round-10 host swing by 2x, but the number of jobs a
driver-coordinated loop submits is deterministic.

Usage: python tools/count_jobs.py out.json [query ...]
Runs each query inside its own job group (fn() + toPandas(), the sweep
action) and records len(statusTracker.getJobIdsForGroup(group)).
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import os

from icebug_spark.queries.registry import ALL  # noqa: E402
from icebug_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_path = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("icebug-jobcount")
    sc = spark.sparkContext
    from icebug_spark import catalog

    catalog.build_derived_artifacts(spark, sf_dir)
    out = {}
    for name in names:
        fn = ALL[name][0]
        group = f"count-{name}"
        sc.setJobGroup(group, name)
        try:
            fn(spark, sf_dir).toPandas()
        finally:
            sc.setJobGroup(None, None)
        ids = sc._jsc.sc().statusTracker().getJobIdsForGroup(group)
        out[name] = len(ids)
        print(f"{name}: {out[name]} jobs", flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
