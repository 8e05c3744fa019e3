import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


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
