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
            rows[name] = {"duckdb_secs": None, "note": "no SQL twin"}
            continue
        t0 = time.time()
        con.sql(sql).fetchall()
        wall = round(time.time() - t0, 3)
        entry = {"duckdb_secs": wall}
        if name in spark_times:
            entry["spark_secs"] = spark_times[name]
            entry["ratio_spark_over_duckdb"] = round(
                spark_times[name] / wall, 2
            ) if wall > 0 else None
        rows[name] = entry
        print(f"# {name}: duckdb {wall}s", file=sys.stderr)

    total_duck = round(
        sum(r["duckdb_secs"] for r in rows.values() if r.get("duckdb_secs")), 3
    )
    out = {
        "sf_dir": sf_dir,
        "threads": threads,
        "duckdb_total_secs": total_duck,
        "queries": rows,
    }
    if spark_times:
        total_spark = round(
            sum(v for k, v in spark_times.items() if k in rows), 3
        )
        out["spark_total_secs"] = total_spark
        out["ratio_spark_over_duckdb"] = round(total_spark / total_duck, 3)
    print(json.dumps(out, indent=1, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
