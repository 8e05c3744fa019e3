"""Tests for the 'astro' Python DataSource (spark.read/write.format).

Parity target: the reference's data-source entry
``read.format("...HBaseSource").options(...).load`` (SURVEY §3.2,
HBaseRelation.scala:40-78) and append writes.
"""

import pytest
from pyspark.sql import functions as F

from spark_sql_on_hbase_spark.session import AstroSession
from spark_sql_on_hbase_spark.sources import register

DDL = (
    "CREATE TABLE src_t (k1 INT, k2 STRING, a SHORT, b DOUBLE, "
    "PRIMARY KEY (k1, k2)) MAPPED BY (hsrc, COLS=[a=f.a, b=f.b])"
)


@pytest.fixture(scope="module")
def wh(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("src_wh"))
    astro = AstroSession(spark, wh)
    astro.sql(DDL)
    csv = tmp_path_factory.mktemp("src_csv") / "t.csv"
    csv.write_text("".join(f"{i},row{i},{i % 100},{i / 2.0}\n" for i in range(1000)))
    astro.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE src_t")
    register(spark)
    return wh


def _read(spark, wh, table="src_t"):
    return (
        spark.read.format("astro").option("warehouse", wh).option("table", table).load()
    )


def test_read_full_table(spark, wh):
    df = _read(spark, wh)
    assert df.count() == 1000
    assert [f.name for f in df.schema.fields] == ["k1", "k2", "a", "b"]
    r = df.filter(F.col("k1") == 7).collect()[0]
    assert (r.k2, r.a) == ("row7", 7)


def test_read_prunes_on_key_filter(spark, wh):
    df = _read(spark, wh).filter("k1 = 500")
    rows = df.collect()
    assert len(rows) == 1 and rows[0].k2 == "row500"
    # pruning evidence: the scan over a point predicate must touch fewer
    # input partitions than the total region count
    full_parts = _read(spark, wh).rdd.getNumPartitions()
    pruned_parts = df.rdd.getNumPartitions()
    assert pruned_parts <= full_parts


def test_filters_reapplied_for_correctness(spark, wh):
    # non-key filter (not pushed) and range filter (pruned + re-applied)
    assert _read(spark, wh).filter("a = 42").count() == 10
    assert _read(spark, wh).filter("k1 >= 990").count() == 10


def test_write_appends_fragment(spark, wh):
    new = spark.createDataFrame(
        [(2000, "row2000", 5, 2.5)], "k1 int, k2 string, a smallint, b double"
    )
    new.write.format("astro").mode("append").option("warehouse", wh).option(
        "table", "src_t"
    ).save()
    astro = AstroSession(spark, wh)
    assert astro.sql("SELECT count(*) AS n FROM src_t").collect()[0].n == 1001
    r = astro.sql("SELECT * FROM src_t WHERE k1 = 2000").collect()
    assert len(r) == 1 and r[0].k2 == "row2000"


def test_write_upsert_resolves(spark, wh):
    # re-insert key (7, 'row7') with a new value for a
    new = spark.createDataFrame(
        [(7, "row7", 99, 3.5)], "k1 int, k2 string, a smallint, b double"
    )
    new.write.format("astro").mode("append").option("warehouse", wh).option(
        "table", "src_t"
    ).save()
    astro = AstroSession(spark, wh)
    rows = astro.sql("SELECT * FROM src_t WHERE k1 = 7").collect()
    assert len(rows) == 1 and rows[0].a == 99
    # the Python source refuses unresolved upserts instead of returning dups
    with pytest.raises(Exception, match="unresolved upserts"):
        _read(spark, wh).count()
    astro.relation("src_t").compact()
    assert _read(spark, wh).count() == 1001
