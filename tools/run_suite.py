"""Sharded test-suite runner: greedy-pack test files into N pytest
processes and run them concurrently.

A single ``pytest tests/`` run uses ONE SparkSession on local[4]
(conftest pins 4 cores so individual tests stay deterministic and
cheap) — i.e. 4 of the machine's 32 cores, 33 minutes wall (r7
measurement, 388 tests). Sharding the files across ``SUITE_SHARDS``
(default 6) processes keeps the per-test environment identical (each
shard is a plain ``pytest <files>`` with the same conftest) while using
~24 cores: measured wall ≈ max(shard) ≈ the heaviest file group. Zero
coverage loss — every test file runs exactly once; the run FAILS if any
shard fails or any test file is left unassigned.

Weights are the r7 per-file measurements (seconds, single-run); new
files default to 45 s and only affect packing quality, not coverage.

Usage: ``python tools/run_suite.py`` (from the repo root).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
TESTS = ROOT / "tests"

#: measured single-run wall seconds per file (r7, --durations tally);
#: packing hint only
WEIGHTS = {
    "test_numerics2.py": 310,
    "test_dynamic3.py": 180,
    "test_centrality2.py": 130,
    "test_generators3.py": 115,
    "test_streaming_dedup.py": 110,
    "test_numerics3.py": 100,
    "test_numerics.py": 90,
    "test_scd_embedding.py": 80,
    "test_dynamic2.py": 75,
    "test_streaming_ann.py": 70,
    "test_uncovered_ops.py": 95,
    "test_pointtopoint.py": 60,
    "test_community.py": 50,
    "test_sparsify2.py": 45,
    "test_llm_ops.py": 60,
    "test_readers45.py": 40,
    "test_dispatch.py": 55,
    "test_algebraic_flow.py": 60,
    "test_layout.py": 30,
    "test_community3.py": 45,
}
DEFAULT_WEIGHT = 45


def main() -> int:
    shards = int(os.environ.get("SUITE_SHARDS", "6"))
    files = sorted(p.name for p in TESTS.glob("test_*.py"))
    # greedy LPT packing: heaviest file to the lightest bin
    bins: list[tuple[float, list[str]]] = [(0.0, []) for _ in range(shards)]
    for f in sorted(files, key=lambda f: -WEIGHTS.get(f, DEFAULT_WEIGHT)):
        w = WEIGHTS.get(f, DEFAULT_WEIGHT)
        i = min(range(shards), key=lambda j: bins[j][0])
        bins[i] = (bins[i][0] + w, bins[i][1] + [f])
    assigned = [f for _, fs in bins for f in fs]
    assert sorted(assigned) == files, "packing lost a test file"

    t0 = time.time()
    procs = []
    for i, (w, fs) in enumerate(bins):
        if not fs:
            continue
        cmd = [sys.executable, "-m", "pytest", "-q", *[f"tests/{f}" for f in fs]]
        env = dict(os.environ)
        log = open(f"/tmp/suite_shard_{i}.log", "w")
        procs.append(
            (i, fs, subprocess.Popen(cmd, cwd=ROOT, env=env, stdout=log, stderr=subprocess.STDOUT), log)
        )
        print(f"shard {i}: est {w:.0f}s, {len(fs)} files")
    rc = 0
    for i, fs, p, log in procs:
        code = p.wait()
        log.close()
        tail = Path(f"/tmp/suite_shard_{i}.log").read_text().strip().splitlines()
        print(f"shard {i} rc={code}: {tail[-1] if tail else '(no output)'}")
        if code != 0:
            rc = 1
            print("\n".join(tail[-30:]))
    print(f"suite wall: {time.time() - t0:.1f}s across {shards} shards")
    return rc


if __name__ == "__main__":
    sys.exit(main())
