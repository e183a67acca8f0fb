"""Sharded test-suite runner: greedy-pack test files into N pytest
processes and run them concurrently.

A single ``pytest tests/`` run uses ONE SparkSession on local[4]
(conftest pins 4 cores so individual tests stay deterministic and
cheap) — i.e. 4 of the machine's 32 cores, ~30 minutes wall serial.
Sharding the files across ``SUITE_SHARDS`` (default 6) processes keeps
the per-test environment identical (each shard is a plain
``pytest <files>`` with the same conftest) while using ~24 cores:
measured wall ≈ max(shard) ≈ the heaviest file group. Zero coverage
loss — every test file runs exactly once; the run FAILS if any shard
fails or any test file is left unassigned.

Packing weights are MEASURED: every run records per-file wall seconds
through the ``tools/suite_timer.py`` pytest plugin and refreshes
``tools/suite_weights.json`` (committed), so the next run packs by the
last real durations — no hardcoded estimates to rot. Files never seen
before default to 45 s (packing quality only, never coverage).

Each successful run also writes ``SUITE_TIMING.json`` at the repo root:
total wall, per-shard walls/files, per-file seconds, test counts — the
committed evidence artifact for the suite-wall target.

Usage: ``python tools/run_suite.py`` (from the repo root).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
TESTS = ROOT / "tests"
WEIGHTS_FILE = ROOT / "tools" / "suite_weights.json"
DEFAULT_WEIGHT = 45.0


def load_weights() -> dict[str, float]:
    if WEIGHTS_FILE.exists():
        return {
            k: float(v)
            for k, v in json.loads(WEIGHTS_FILE.read_text()).items()
        }
    return {}


def main() -> int:
    shards = int(os.environ.get("SUITE_SHARDS", "6"))
    weights = load_weights()
    files = sorted(p.name for p in TESTS.glob("test_*.py"))
    # greedy LPT packing: heaviest file to the lightest bin
    bins: list[tuple[float, list[str]]] = [(0.0, []) for _ in range(shards)]
    for f in sorted(files, key=lambda f: -weights.get(f, DEFAULT_WEIGHT)):
        w = weights.get(f, DEFAULT_WEIGHT)
        i = min(range(shards), key=lambda j: bins[j][0])
        bins[i] = (bins[i][0] + w, bins[i][1] + [f])
    assigned = [f for _, fs in bins for f in fs]
    assert sorted(assigned) == files, "packing lost a test file"

    t0 = time.time()
    procs = []
    for i, (w, fs) in enumerate(bins):
        if not fs:
            continue
        cmd = [
            sys.executable, "-m", "pytest", "-q", "-p", "suite_timer",
            *[f"tests/{f}" for f in fs],
        ]
        # default = the driver-gate set (pytest.ini deselects the slow
        # marker); SUITE_ALL=1 runs everything incl. tests/slow_tests.txt
        if os.environ.get("SUITE_ALL") == "1":
            cmd += ["-m", "slow or not slow"]
        env = dict(os.environ)
        env["SUITE_TIMER_OUT"] = f"/tmp/suite_timer_{i}.json"
        env["PYTHONPATH"] = (
            f"{ROOT / 'tools'}:{env.get('PYTHONPATH', '')}"
        )
        log = open(f"/tmp/suite_shard_{i}.log", "w")
        procs.append(
            (i, fs, subprocess.Popen(cmd, cwd=ROOT, env=env, stdout=log, stderr=subprocess.STDOUT), log)
        )
        print(f"shard {i}: est {w:.0f}s, {len(fs)} files")
    rc = 0
    shard_walls: dict[int, float] = {}
    shard_files: dict[int, list[str]] = {}
    for i, fs, p, log in procs:
        code = p.wait()
        shard_walls[i] = round(time.time() - t0, 1)
        shard_files[i] = fs
        log.close()
        tail = Path(f"/tmp/suite_shard_{i}.log").read_text().strip().splitlines()
        print(f"shard {i} rc={code} wall={shard_walls[i]}s: {tail[-1] if tail else '(no output)'}")
        if code != 0:
            rc = 1
            print("\n".join(tail[-30:]))
    wall = round(time.time() - t0, 1)
    print(f"suite wall: {wall}s across {shards} shards")

    # merge the measured per-file durations from every shard
    file_secs: dict[str, float] = {}
    file_tests: dict[str, int] = {}
    n_failures = 0
    for i in shard_walls:
        tp = Path(f"/tmp/suite_timer_{i}.json")
        if not tp.exists():
            continue
        d = json.loads(tp.read_text())
        file_secs.update(d.get("file_secs", {}))
        file_tests.update(d.get("file_tests", {}))
        n_failures += sum(d.get("file_failures", {}).values())
    if rc == 0 and file_secs:
        # refresh the committed packing weights with the measured walls
        WEIGHTS_FILE.write_text(
            json.dumps(dict(sorted(file_secs.items())), indent=1) + "\n"
        )
        artifact = {
            "wall_secs": wall,
            "shards": shards,
            "shard_walls": {str(i): shard_walls[i] for i in sorted(shard_walls)},
            "shard_files": {str(i): shard_files[i] for i in sorted(shard_files)},
            "n_tests": sum(file_tests.values()),
            "n_failures": n_failures,
            "n_files": len(files),
            "file_secs": dict(sorted(file_secs.items())),
            "weights_refreshed": True,
        }
        (ROOT / "SUITE_TIMING.json").write_text(
            json.dumps(artifact, indent=1) + "\n"
        )
        print(
            f"wrote SUITE_TIMING.json ({artifact['n_tests']} tests, "
            f"{wall}s wall) and refreshed tools/suite_weights.json"
        )
    return rc


if __name__ == "__main__":
    sys.exit(main())
