"""Pytest plugin: record per-FILE wall seconds (setup+call+teardown of
every test in the file) and per-file test counts, dumped as JSON to
$SUITE_TIMER_OUT at session end.

Loaded by tools/run_suite.py via ``-p suite_timer`` (tools/ is put on
PYTHONPATH); the merged output feeds ``tools/suite_weights.json`` so the
shard packing always uses the LAST MEASURED durations instead of
hardcoded estimates that silently rot.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict

_durations: dict[str, float] = defaultdict(float)
_counts: dict[str, int] = defaultdict(int)
_outcomes: dict[str, int] = defaultdict(int)
_test_durations: dict[str, float] = defaultdict(float)


def pytest_runtest_logreport(report):
    fname = report.nodeid.split("::")[0].rsplit("/", 1)[-1]
    _durations[fname] += report.duration
    _test_durations[report.nodeid] += report.duration
    if report.when == "call":
        _counts[fname] += 1
        if report.failed:
            _outcomes[fname] += 1


def pytest_sessionfinish(session, exitstatus):
    out = os.environ.get("SUITE_TIMER_OUT")
    if not out:
        return
    with open(out, "w") as fh:
        json.dump(
            {
                "file_secs": {k: round(v, 1) for k, v in _durations.items()},
                "file_tests": dict(_counts),
                "file_failures": dict(_outcomes),
                "test_secs": {
                    k: round(v, 2) for k, v in _test_durations.items()
                },
                "exitstatus": int(exitstatus),
            },
            fh,
        )
