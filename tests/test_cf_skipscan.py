"""Port of the reference's skip-scan suite (HBaseCFTestSuite.scala:25-175).

A pure-int 3-part-key table where predicates hit NON-LEADING key
dimensions (k2, k3) and non-key columns — the reference serves these with
its custom SEEK_NEXT_USING_HINT skip-scan filter
(HBaseCustomFilter.scala:43-647); our engine serves them with sorted
parquet row-group skipping plus the CPR pruner, degrading to full scan
where the leading dimension is unconstrained.  Row pattern documented in
FIXTURES.md §8: (i, 100+i, 1000+i, -i, -(100+i)) for i in 1..27 — the
fixture cf.txt re-generated here because its bare-CR line endings are a
Hadoop-TextInputFormat quirk, not engine behavior.
"""

import pytest

from spark_sql_on_hbase_spark.session import AstroSession

DDL = (
    "CREATE TABLE cf (k1 INT, k2 INT, k3 INT, nk1 INT, nk2 INT, "
    "PRIMARY KEY (k1, k2, k3)) MAPPED BY (cf_htable, COLS=[nk1=f.nk1, nk2=f.nk2])"
)

# (name, sql, expected_rows) — HBaseCFTestSuite.scala:109-175
QUERIES = [
    ("q0", "SELECT * FROM cf", 27),
    ("q1", "SELECT * FROM cf WHERE k1 = 1 OR k1 = 10 OR k1 = 20", 3),
    ("q2", "SELECT * FROM cf WHERE k1 < 2 OR k1 = 10 OR k1 > 20", 9),
    ("q3", "SELECT * FROM cf WHERE (k1 = 1 OR k1 = 10 OR k1 = 20) AND "
           "(k2 = 101 OR k2 = 110 OR k2 = 120) AND (k3 = 1001 OR k3 = 1010 OR k3 = 1020)", 3),
    ("q4", "SELECT * FROM cf WHERE (k2 = 101 OR k2 = 110 OR k2 = 120) AND "
           "(k3 = 1001 OR k3 = 1010 OR k3 = 1020)", 3),
    ("q5", "SELECT * FROM cf WHERE (k3 = 1001 OR k3 = 1010 OR k3 = 1020)", 3),
    ("q6", "SELECT * FROM cf WHERE (nk1 = -1 OR nk1 = -10)", 2),
    ("q7", "SELECT * FROM cf WHERE (nk2 = -101 OR nk2 = -110)", 2),
    ("q8", "SELECT * FROM cf WHERE k1 = 10 AND k2 = 110 AND "
           "(k3 = 1001 OR k3 = 1010 OR k3 = 1020)", 1),
    ("q9", "SELECT * FROM cf WHERE k1 = 10 AND k2 = 110 AND k3 = 1010", 1),
    ("q10", "SELECT * FROM cf WHERE k1 = 10 AND k2 = 110 AND k3 = 1010 AND "
            "(nk2 = -101 OR nk2 = -110)", 1),
]


@pytest.fixture(scope="module")
def astro(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("cf_wh")
    a = AstroSession(spark, str(wh))
    a.sql(DDL)
    csv = wh / "cf.txt"
    csv.write_text("".join(f"{i},{100 + i},{1000 + i},{-i},{-(100 + i)}\n" for i in range(1, 28)))
    a.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE cf")
    return a


@pytest.mark.parametrize("name,sql,expected", QUERIES, ids=[q[0] for q in QUERIES])
def test_cf_rowcounts(astro, name, sql, expected):
    assert len(astro.sql(sql).collect()) == expected


def test_leading_dim_disjunction_prunes(astro):
    """k1 IN-style OR on the leading dimension must prune to the regions
    holding those points (reference: multi-Get path,
    HBaseSQLReaderRDD.scala:272-315)."""
    rel = astro.relation("cf")
    meta = astro.catalog.get_table("cf")
    df, res = rel.scan_where("k1 = 1 OR k1 = 10 OR k1 = 20")
    assert df.count() == 3
    if len(meta.regions) > 3:
        assert len(res.files) < len(meta.regions)


def test_point_query_values(astro):
    r = astro.sql("SELECT * FROM cf WHERE k1 = 10 AND k2 = 110 AND k3 = 1010").collect()[0]
    assert (r.nk1, r.nk2) == (-10, -110)
