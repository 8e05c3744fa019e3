import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="also run tests marked slow (multi-minute soaks / "
        "differential codec sweeps / lease-TTL timing tests)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running test (deselected by default so the driver's "
        "verify window fits the whole lane; run with --runslow or "
        "SPARK_GRAFT_SLOW=1, or by node id)",
    )


def pytest_collection_modifyitems(config, items):
    """Default lane excludes @pytest.mark.slow (r16, VERDICT r15 #1: the
    full suite outgrew the driver's verify window — an incomplete gate
    catches nothing).  The slow lane stays runnable three ways:
    ``--runslow``, ``SPARK_GRAFT_SLOW=1``, or naming a test FILE or
    node id directly (an explicit name is a request to run it)."""
    if config.getoption("--runslow") or os.environ.get("SPARK_GRAFT_SLOW") == "1":
        return
    # args that point BELOW the suite root name specific files/tests;
    # bare `tests/`, the repo root, or no path args = the broad lane
    here = Path(__file__).resolve().parent
    broad = {str(here), str(here.parent)}
    explicit = set()
    for a in config.invocation_params.args:
        a = str(a)
        if a.startswith("-"):
            continue
        p = os.path.abspath(a.split("::")[0])
        if p not in broad and (os.path.isfile(p) or os.path.isdir(p)):
            explicit.add(p)
    skip = pytest.mark.skip(reason="slow lane: --runslow / SPARK_GRAFT_SLOW=1")
    for item in items:
        if "slow" not in item.keywords:
            continue
        path = str(item.path)
        if any(path == e or path.startswith(e + os.sep) for e in explicit):
            continue  # named explicitly — run it
        item.add_marker(skip)


@pytest.fixture()
def no_reader_leases(monkeypatch):
    """Disable r13 reader-lease deferral (TTL=0 → every lease is born
    expired).  For tests that assert PROMPT physical reclaim — fold
    gc_pending, VACUUM floors, file-count lifecycles — where the
    deferral window is noise; the lease semantics themselves are
    exercised by tests/test_autocompact_leases.py."""
    from spark_sql_on_hbase_spark.relation import AstroRelation

    monkeypatch.setattr(AstroRelation, "LEASE_TTL_SEC", 0.0)


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    from spark_sql_on_hbase_spark.tuning import local_shuffle_confs

    builder = (
        SparkSession.builder.master("local[4]")
        .appName("spark_sql_on_hbase_spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    for k, v in local_shuffle_confs().items():
        builder = builder.config(k, v)
    s = builder.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
