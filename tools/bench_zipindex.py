"""Micro-benchmark: the two-pass zipWithIndex helpers vs the naive
single-partition global windows they replaced (plans/zipindex.py).

Both shapes produce identical values; the difference is the Exchange
SinglePartition the naive window plans — ONE task sorts/sums every row,
which is the bottleneck this repo removed from compact_node_ids,
community relabels, edge ids, randomization pairing, RNE scores, the
configuration-model stub shuffle, and the ROC/PR curve sweeps.

Writes BENCH_ZIPINDEX.json: per-shape wall seconds at each N plus the
plan check (the helper must NOT contain SinglePartition; the naive
window must).

Honest crossover: at toy N (~2e6) the naive window WINS — one task
sorting 2M rows is cheap and the two-pass pays ~4 extra jobs
(checkpoint, P-row collect, broadcast join). The two-pass exists for
the regime where one task CANNOT hold the data: at 3e7 rows it is
already ~1.65x faster on local[32], and the gap widens with N while
the naive plan stays single-task-bound (and eventually spills/OOMs).
Callers on provably tiny inputs (sample-capped certificates,
presentation layers) keep the plain window on purpose.

Run: python tools/bench_zipindex.py [n_rows ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window
from pyspark.sql import functions as F

from icebug_spark.plans.zipindex import dense_index, running_sums
from icebug_spark.session import get_spark


def run_one(spark, n: int) -> dict:
    # unique skewed-ish keys: hash-spread, deterministic
    base = (
        spark.range(n)
        .select(
            F.xxhash64("id").alias("k"),
            F.col("id").alias("i"),
            (F.col("id") % 7).alias("a"),
        )
        .localCheckpoint(eager=True)
    )
    _ = base.count()

    results: dict[str, dict] = {}

    t0 = time.time()
    out = dense_index(base, ["k", "i"], out="rn", assume_distinct=True)
    chk1 = out.agg(F.sum("rn")).collect()[0][0]
    results["dense_index_two_pass"] = {"secs": round(time.time() - t0, 2)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    results["dense_index_two_pass"]["single_partition_in_plan"] = (
        "SinglePartition" in plan
    )

    t0 = time.time()
    w = Window.orderBy("k", "i")
    naive = base.withColumn("rn", F.row_number().over(w) - 1)
    chk2 = naive.agg(F.sum("rn")).collect()[0][0]
    results["dense_index_naive_window"] = {"secs": round(time.time() - t0, 2)}
    plan = naive._jdf.queryExecution().executedPlan().toString()
    results["dense_index_naive_window"]["single_partition_in_plan"] = (
        "SinglePartition" in plan
    )
    assert chk1 == chk2, (chk1, chk2)

    t0 = time.time()
    rs = running_sums(base.withColumn("v", F.lit(1)), ["k", "i"], ["v"])
    chk3 = rs.agg(F.sum("v")).collect()[0][0]
    results["running_sums_two_pass"] = {"secs": round(time.time() - t0, 2)}

    t0 = time.time()
    wc = Window.orderBy("k", "i").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    nv = base.withColumn("v", F.lit(1)).withColumn("v", F.sum("v").over(wc))
    chk4 = nv.agg(F.sum("v")).collect()[0][0]
    results["running_sums_naive_window"] = {"secs": round(time.time() - t0, 2)}
    assert chk3 == chk4, (chk3, chk4)
    base.unpersist()
    return results


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [2_000_000, 30_000_000]
    spark = get_spark("bench-zipindex")
    payload = {
        "metric": "two_pass_zipindex_vs_global_window",
        "by_n_rows": {str(n): run_one(spark, n) for n in sizes},
        "unit": "sec",
    }
    with open("BENCH_ZIPINDEX.json", "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
