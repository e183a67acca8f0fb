"""Local mirror of the driver's t2 correctness gate.

Runs every queries() entry on Spark and its oracle_sql() twin on DuckDB
at a given sf dir, compares row count, column names, and order-insensitive
values. Usage:

    python tools/check_oracle.py [sf_dir] [query_name ...]

A full (unfiltered) sweep also writes ``CORRECTNESS_LOCAL.json`` at the
repo root — per-query status + timing — as rotation insurance: the
driver's per-round gate re-checks a subset, so this artifact is the
committed all-green evidence for the rest of the registry.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

import duckdb
import pandas as pd

from icebug_spark.catalog import TABLES
from icebug_spark.session import get_spark
from icebug_spark.queries.registry import ALL


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), ignore_index=True)
    return df


#: per-query wall budget (seconds). Queries over budget are FLAGGED, not
#: failed — the point is to surface tail regressions in the committed
#: artifact before they can time out a full driver sweep.
BUDGET_SECS = float(os.environ.get("SPARK_GRAFT_QUERY_BUDGET_SECS", "20"))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    results: dict[str, dict] = {}
    n_pass = n_fail = n_rows_only = 0
    t_start = time.time()
    for name, (fn, sql) in ALL.items():
        if only and name not in only:
            continue
        t0 = time.time()

        def record(status: str, detail: str | None = None, rows: int | None = None):
            secs = round(time.time() - t0, 1)
            results[name] = {
                "status": status,
                "rows": rows,
                "secs": secs,
                "over_budget": secs > BUDGET_SECS,
                "detail": detail,
            }
            if secs > BUDGET_SECS:
                print(f"OVER-BUDGET {name}: {secs}s > {BUDGET_SECS}s")

        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            record("fail", f"spark error: {str(exc)[:300]}")
            n_fail += 1
            continue
        if sql is None:
            print(f"rows-only {name}: {len(sdf)} rows  [{time.time()-t0:.1f}s]")
            record("rows_only", rows=len(sdf))
            n_rows_only += 1
            continue
        try:
            odf = con.sql(sql).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {str(exc)[:300]}")
            record("fail", f"duckdb error: {str(exc)[:300]}")
            n_fail += 1
            continue
        s, o = normalize(sdf), normalize(odf)
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}")
            record("fail", f"columns {list(s.columns)} vs {list(o.columns)}")
            n_fail += 1
            continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}")
            record("fail", f"rows {len(s)} vs {len(o)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(
                s, o, check_dtype=False, check_exact=True
            )
            print(f"PASS {name}: {len(s)} rows  [{time.time()-t0:.1f}s]")
            record("pass", rows=len(s))
            n_pass += 1
        except AssertionError as exc:
            print(f"FAIL {name}: value mismatch: {str(exc)[:400]}")
            record("fail", f"value mismatch: {str(exc)[:400]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if not only:  # full sweep → commit-able artifact
        over = sorted(k for k, v in results.items() if v["over_budget"])
        artifact = {
            "sf_dir": sf_dir,
            "total_secs": round(time.time() - t_start, 1),
            "budget_secs": BUDGET_SECS,
            "n_over_budget": len(over),
            "over_budget": over,
            "n_pass": n_pass,
            "n_fail": n_fail,
            "n_rows_only": n_rows_only,
            "n_queries": len(results),
            "queries": results,
        }
        out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "CORRECTNESS_LOCAL.json")
        with open(out, "w") as f:
            json.dump(artifact, f, indent=1, sort_keys=True)
        print(f"wrote {out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
