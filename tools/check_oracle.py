"""Local mirror of the driver's t2 correctness gate.

Runs every queries() entry on Spark and its oracle_sql() twin on DuckDB
at a given sf dir, compares row count, column names, and order-insensitive
values. Usage:

    python tools/check_oracle.py [sf_dir] [query_name ...]

A full (unfiltered) sweep also writes ``CORRECTNESS_LOCAL.json`` at the
repo root — per-query status + timing — as rotation insurance: the
driver's per-round gate re-checks a subset, so this artifact is the
committed all-green evidence for the rest of the registry.

Concurrency: ``SPARK_GRAFT_SWEEP_JOBS`` (default 3) queries run at once.
The registry's iterative graph queries are driver-latency-bound (many
small sequential Spark jobs on tiny sf0.01 partitions), so interleaving
them overlaps job-submission gaps instead of contending for cores —
measured ~2x total wall at jobs=3 with per-query inflation well under
the budget margin. Per-query ``secs`` are wall times UNDER that
concurrency (recorded in the artifact as ``sweep_jobs``); set
SPARK_GRAFT_SWEEP_JOBS=1 for isolated timings.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor

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

SWEEP_JOBS = max(1, int(os.environ.get("SPARK_GRAFT_SWEEP_JOBS", "3")))

_print_lock = threading.Lock()


def _log(msg: str) -> None:
    with _print_lock:
        print(msg)


def run_one(spark, con, sf_dir: str, name: str, fn, sql) -> dict:
    """Run one query + oracle compare; returns the result record.

    ``secs`` is total wall (spark + oracle + compare); ``spark_secs``
    and ``oracle_secs`` are recorded separately and the over-budget
    flag is decided by SPARK time alone — the budget exists to catch
    OUR tail regressions, and at sf0.1 the DuckDB twin can dominate
    (its recursive-CTE connected components runs ~80 s while the Spark
    side takes 3 s; flagging that line would blame the wrong engine)."""
    t0 = time.time()
    timings = {"spark_secs": None, "oracle_secs": None}

    def record(status: str, detail: str | None = None, rows: int | None = None):
        secs = round(time.time() - t0, 1)
        sp = timings["spark_secs"]
        over = sp is not None and sp > BUDGET_SECS
        if over:
            _log(f"OVER-BUDGET {name}: spark {sp}s > {BUDGET_SECS}s")
        return {
            "status": status,
            "rows": rows,
            "secs": secs,
            **timings,
            "over_budget": over,
            "detail": detail,
        }

    try:
        sdf = fn(spark, sf_dir).toPandas()
        timings["spark_secs"] = round(time.time() - t0, 1)
    except Exception as exc:  # noqa: BLE001
        _log(f"FAIL {name}: spark error: {exc}")
        return record("fail", f"spark error: {str(exc)[:300]}")
    if sql is None:
        _log(f"rows-only {name}: {len(sdf)} rows  [{time.time()-t0:.1f}s]")
        return record("rows_only", rows=len(sdf))
    try:
        # cursor() gives this thread its own view of the shared catalog
        t1 = time.time()
        odf = con.cursor().sql(sql).df()
        timings["oracle_secs"] = round(time.time() - t1, 1)
    except Exception as exc:  # noqa: BLE001
        _log(f"FAIL {name}: duckdb error: {str(exc)[:300]}")
        return record("fail", f"duckdb error: {str(exc)[:300]}")
    s, o = normalize(sdf), normalize(odf)
    if list(s.columns) != list(o.columns):
        _log(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}")
        return record("fail", f"columns {list(s.columns)} vs {list(o.columns)}")
    if len(s) != len(o):
        _log(f"FAIL {name}: rows {len(s)} vs {len(o)}")
        return record("fail", f"rows {len(s)} vs {len(o)}")
    try:
        pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)
        _log(f"PASS {name}: {len(s)} rows  [{time.time()-t0:.1f}s]")
        return record("pass", rows=len(s))
    except AssertionError as exc:
        _log(f"FAIL {name}: value mismatch: {str(exc)[:400]}")
        return record("fail", f"value mismatch: {str(exc)[:400]}")


def main() -> int:
    # default matches the driver gate's scale (sf0.01) — the committed
    # CORRECTNESS_LOCAL artifact must certify the same instances the gate
    # re-checks
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    # Pre-build the session-memoized derived artifacts (E/EU/EW/C/
    # triangle kernel) BEFORE dispatching: in a real deployment these
    # are persisted tables built once, and inside the sweep they
    # amortize across ~170 queries anyway — without the warmup their
    # build cost lands on whichever prefix query happens to run first
    # at jobs=3, which is attribution noise in the per-query budget
    # flags (observed: the same sweep flips between 1 and 6 over-budget
    # queries purely by cold-build placement).
    from icebug_spark.catalog import build_derived_artifacts

    t_warm = time.time()
    build_derived_artifacts(spark, sf_dir)
    _log(f"derived-artifact warmup: {time.time() - t_warm:.1f}s")

    todo = [(n, fs) for n, fs in ALL.items() if not only or n in only]
    t_start = time.time()
    results: dict[str, dict] = {}
    if SWEEP_JOBS == 1:
        for name, (fn, sql) in todo:
            results[name] = run_one(spark, con, sf_dir, name, fn, sql)
    else:
        with ThreadPoolExecutor(max_workers=SWEEP_JOBS) as ex:
            futs = {
                name: ex.submit(run_one, spark, con, sf_dir, name, fn, sql)
                for name, (fn, sql) in todo
            }
            for name, fut in futs.items():
                results[name] = fut.result()

    n_pass = sum(1 for v in results.values() if v["status"] == "pass")
    n_fail = sum(1 for v in results.values() if v["status"] == "fail")
    n_rows_only = sum(1 for v in results.values() if v["status"] == "rows_only")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")

    # Over-budget triage: per-query walls under SWEEP_JOBS>1 include
    # contention from the other in-flight queries (deliberately — it
    # halves total sweep time), so a budget breach there is ambiguous.
    # Re-measure each flagged PASSING query ISOLATED (nothing else
    # running) and let the isolated wall decide the flag; both numbers
    # go in the artifact (secs = under-concurrency, isolated_secs = the
    # measured floor). A query that breaches the budget even isolated
    # stays flagged — that is a real regression, not scheduling noise.
    if SWEEP_JOBS > 1:
        flagged = [
            name for name, v in results.items()
            if v["over_budget"] and v["status"] != "fail"
        ]
        for name in flagged:
            fn, sql = ALL[name]
            iso = run_one(spark, con, sf_dir, name, fn, sql)
            iso_spark = iso["spark_secs"] if iso["spark_secs"] is not None else iso["secs"]
            results[name]["isolated_secs"] = iso_spark
            results[name]["over_budget"] = iso_spark > BUDGET_SECS
            _log(
                f"ISOLATED RE-MEASURE {name}: spark {iso_spark}s "
                f"({'still over' if iso_spark > BUDGET_SECS else 'under'} "
                f"budget {BUDGET_SECS}s)"
            )
    # SPARK_GRAFT_ARTIFACT names an artifact to write even for a
    # filtered run — used for the slow FULLSCALE evidence sweep
    forced = os.environ.get("SPARK_GRAFT_ARTIFACT")
    if not only or forced:  # full sweep → commit-able artifact
        over = sorted(k for k, v in results.items() if v["over_budget"])
        artifact = {
            "sf_dir": sf_dir,
            "total_secs": round(time.time() - t_start, 1),
            "budget_secs": BUDGET_SECS,
            "sweep_jobs": SWEEP_JOBS,
            "n_over_budget": len(over),
            "over_budget": over,
            "n_pass": n_pass,
            "n_fail": n_fail,
            "n_rows_only": n_rows_only,
            "n_queries": len(results),
            "queries": results,
        }
        if os.environ.get("SPARK_GRAFT_FULLSCALE") == "1":
            artifact["fullscale"] = True
        # gate-scale (sf0.01) full sweeps own CORRECTNESS_LOCAL.json; a
        # full sweep at any OTHER scale writes a scale-suffixed artifact
        # (cross-scale robustness evidence) instead of clobbering it
        default_name = (
            "CORRECTNESS_LOCAL.json"
            if sf_dir.rstrip("/").endswith("sf0.01")
            else f"CORRECTNESS_{os.path.basename(sf_dir.rstrip('/'))}.json"
        )
        out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           forced or default_name)
        with open(out, "w") as f:
            json.dump(artifact, f, indent=1, sort_keys=True)
        print(f"wrote {out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
