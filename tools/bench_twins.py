"""Time the DuckDB oracle twins of the bench headline queries.

The reference publishes no absolute numbers (BASELINE.md), so the
per-round performance proxy is the DuckDB twin of each headline query
on the SAME sf0.1 parquet — this tool produces that comparison as a
committed artifact instead of a by-hand measurement: it runs
``bench.py``'s HEADLINE list through ``oracle_sql()`` on DuckDB
(32 threads by default), then pairs each wall with the most recent
Spark bench result.

Usage:  python tools/bench_twins.py [bench_json] > BENCH_TWINS.json
        (default bench_json: run `python bench.py` first and pass its
        output file, or pipe nothing to time DuckDB only)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import HEADLINE
from icebug_spark.catalog import TABLES
from icebug_spark.queries.registry import ALL


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    threads = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    con = duckdb.connect()
    con.sql(f"SET threads={threads}")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark_times = {}
    if len(sys.argv) > 1:
        with open(sys.argv[1]) as f:
            spark_times = json.load(f).get("queries", {})

    rows = {}
    for name in HEADLINE:
        sql = ALL[name][1]
        if sql is None:
            rows[name] = {"duckdb_secs": None, "twin_kind": "none"}
            continue
        # a twin that reads no base table is a CERTIFICATE (constant
        # invariants), not a recomputation of the operator — its wall is
        # meaningless as a baseline, so keep it out of the ratio
        kind = "value" if any(t in sql for t in TABLES) else "certificate"
        t0 = time.time()
        con.sql(sql).fetchall()
        wall = round(time.time() - t0, 3)
        entry = {"duckdb_secs": wall, "twin_kind": kind}
        if name in spark_times:
            entry["spark_secs"] = spark_times[name]
            if kind == "value" and wall > 0:
                entry["ratio_spark_over_duckdb"] = round(
                    spark_times[name] / wall, 2
                )
        rows[name] = entry
        print(f"# {name}: duckdb {wall}s ({kind})", file=sys.stderr)

    value_rows = {k: r for k, r in rows.items() if r.get("twin_kind") == "value"}
    total_duck = round(sum(r["duckdb_secs"] for r in value_rows.values()), 3)
    out = {
        "sf_dir": sf_dir,
        "threads": threads,
        "n_value_twins": len(value_rows),
        "n_certificate_twins": sum(
            1 for r in rows.values() if r.get("twin_kind") == "certificate"
        ),
        "duckdb_total_secs": total_duck,
        "queries": rows,
    }
    if spark_times:
        total_spark = round(
            sum(v for k, v in spark_times.items() if k in value_rows), 3
        )
        out["spark_total_secs"] = total_spark
        if total_duck > 0:
            out["ratio_spark_over_duckdb"] = round(total_spark / total_duck, 3)
    print(json.dumps(out, indent=1, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
