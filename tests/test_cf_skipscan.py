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


def test_dim2_skipscan_io(spark, tmp_path_factory):
    """A predicate on the SECOND key dimension with the leading dimension
    unconstrained must not materialize the whole file: the bounded-page
    layout (relation.py PAGE_ROW_LIMIT) gives the parquet column index
    seek granularity inside each leading-prefix run — the Spark-native
    SEEK_NEXT_USING_HINT (HBaseCustomFilter.scala:43-647, findNextHint
    :346).  Hard signal: FileSourceScan numOutputRows ≪ table rows.
    """
    from spark_sql_on_hbase_spark.catalog import AstroCatalog, KeyColumn, NonKeyColumn, TableMeta
    from spark_sql_on_hbase_spark.plans.metrics import collect_with_scan_rows
    from spark_sql_on_hbase_spark.relation import AstroRelation

    wh = tmp_path_factory.mktemp("wh_ss")
    catalog = AstroCatalog(str(wh))
    meta = TableMeta(
        name="ss",
        namespace="default",
        physical_table="hss",
        key_columns=[KeyColumn("k1", "int", 0), KeyColumn("k2", "int", 1)],
        nonkey_columns=[NonKeyColumn("v", "int", "f", "v")],
        num_regions=2,
        declared_columns=["k1", "k2", "v"],
    )
    catalog.create_table(meta)
    rel = AstroRelation(catalog, meta, spark)
    n_k1, n_k2 = 6, 20000
    src = spark.range(n_k1 * n_k2).selectExpr(
        f"CAST(id / {n_k2} + 1 AS INT) AS k1",
        f"CAST(id % {n_k2} + 1 AS INT) AS k2",
        "CAST(id AS INT) AS v",
    )
    rel.write(src)
    total = n_k1 * n_k2

    df, _res = rel.scan_where("k2 BETWEEN 2000 AND 2050")
    rows, scanned = collect_with_scan_rows(df)
    assert len(rows) == n_k1 * 51
    assert scanned < total * 0.3, f"no storage-level skipping: scanned {scanned}/{total}"
