import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_SHUFFLE_PARTITIONS", "4")

# Data-driven slow marking: tests listed in tests/slow_tests.txt (the
# measured >=10s heavyweight parity/replay tests) get @pytest.mark.slow,
# and pytest.ini's default ``-m "not slow"`` keeps them out of the
# default run so the driver's serial verify gate completes. The full
# set still runs sharded via tools/run_suite.py (SUITE_ALL=1) and its
# green evidence is committed each round.
_SLOW_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "slow_tests.txt")


def _slow_ids() -> set[str]:
    if not os.path.exists(_SLOW_FILE):
        return set()
    out = set()
    for line in open(_SLOW_FILE):
        line = line.strip()
        if line and not line.startswith("#"):
            out.add(line)
    return out


def pytest_collection_modifyitems(config, items):
    slow = _slow_ids()
    if not slow:
        return
    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        if not nodeid.startswith("tests/"):
            nodeid = "tests/" + nodeid.split("tests/")[-1]
        if nodeid in slow:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    from icebug_spark.session import get_spark

    s = get_spark("icebug-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
