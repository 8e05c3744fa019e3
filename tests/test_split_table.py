"""Port of the reference's split-table query battery.

Reference: `TestBaseWithSplitData.scala:34-195` (fixture: table
ta(col1..col7, PRIMARY KEY(col7, col1, col3)) — 14 rows spanning
negative/positive ints around 8 pre-split regions; col1 strings carry
leading/trailing SPACES) + `HBaseBasicOperationSuite.scala:103-199` and
`HBaseAdvancedSQLQuerySuite.scala:29-40` (queries and expected counts).

Stresses the order-preserving codec on negative INT leading keys,
string key components with spaces, SHORT trailing keys, and mixed
key/non-key predicates across region boundaries.
"""

import pytest

from spark_sql_on_hbase_spark.session import AstroSession

DDL = (
    "CREATE TABLE ta (col1 STRING, col2 BYTE, col3 SHORT, col4 INT, col5 LONG, "
    "col6 FLOAT, col7 INT, PRIMARY KEY (col7, col1, col3)) "
    "MAPPED BY (ht_split, COLS=[col2=cf1.cq11, col4=cf1.cq12, col5=cf2.cq21, col6=cf2.cq22])"
)

# TestBaseWithSplitData.scala:127-195 — (col7, col1) key pairs with col3=128,
# col2 = 1..14, col4 = the ± powers-of-2 sequence, col5/col6 constants
KEYS = [-257, -255, -129, -127, -33, -31, -1, 1, 31, 33, 127, 129, 255, 257]
COL4 = [-2048, -1024, -512, -256, -128, -64, -1, 1, 4, 64, 128, 256, 512, 1024]


def _csv_rows():
    rows = []
    for i, (k7, c4) in enumerate(zip(KEYS, COL4), start=1):
        name = f" {'n' if k7 < 0 else 'p'}{abs(k7)} "
        rows.append(f"{name},{i},128,{c4},12345678901234,1234.5678,{k7}")
    return "\n".join(rows) + "\n"


@pytest.fixture(scope="module")
def astro(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("split_wh")
    a = AstroSession(spark, str(wh))
    a.sql(DDL)
    csv = wh / "ta.txt"
    csv.write_text(_csv_rows())
    a.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE ta")
    # tb: second logical table over the same physical store
    # (TestBaseWithSplitData.scala:64-92 many-to-one mapping)
    a.sql(
        "CREATE TABLE tb (col1 STRING, col2 BYTE, col3 SHORT, col4 INT, col5 LONG, "
        "col6 FLOAT, col7 INT, PRIMARY KEY (col7, col1, col3)) "
        "MAPPED BY (ht_split, COLS=[col2=cf1.cq11, col4=cf1.cq12, col5=cf2.cq21, col6=cf2.cq22])"
    )
    return a


# (sql, expected_count) — HBaseBasicOperationSuite.scala:103-151
COUNTS = [
    ("SELECT * FROM ta", 14),
    ("SELECT count(*) AS n FROM ta WHERE col2 < 8", None),  # value-checked below
    ("SELECT * FROM ta WHERE col7 = 255 OR col7 = 127", 2),
    ("SELECT * FROM ta WHERE col7 < 0 AND col4 < -255", 4),
    ("SELECT * FROM ta WHERE col7 > 128", 3),
    ("SELECT * FROM ta WHERE (col7 - 10 > 128) AND col1 = ' p255 '", 1),
    ("SELECT * FROM ta WHERE (col7 > 1) AND (col7 < 1)", 0),
    ("SELECT * FROM ta WHERE (col7 > 1) OR (col7 < 1)", 13),
    ("SELECT * FROM ta WHERE ((col7 = 1) AND (col1 < ' p255 ') AND (col1 > ' p255 ')) "
     "OR ((col7 = 2) AND (col1 < ' p255 ') AND (col1 > ' p255 '))", 0),
    ("SELECT * FROM ta WHERE ((col7 = 1) AND (col3 < 128) AND (col3 > 128)) "
     "OR ((col7 = 2) AND (col3 < 127) AND (col3 > 127))", 0),
]


@pytest.mark.parametrize("sql,expected", [(s, e) for s, e in COUNTS if e is not None])
def test_split_counts(astro, sql, expected):
    assert len(astro.sql(sql).collect()) == expected


def test_count_aggregates(astro):
    # HBaseBasicOperationSuite.scala:107-118
    assert astro.sql("SELECT count(*) AS n FROM ta").collect()[0].n == 14
    assert astro.sql("SELECT count(*) AS n FROM ta WHERE col2 < 8").collect()[0].n == 7
    assert astro.sql("SELECT count(*) AS n FROM ta WHERE col4 < 0").collect()[0].n == 7
    assert astro.sql("SELECT count(1) AS n FROM ta WHERE col2 < 8").collect()[0].n == 7
    assert astro.sql("SELECT count(*) AS n FROM ta WHERE col2 IN (1, 2, 3)").collect()[0].n == 3
    assert astro.sql("SELECT count(*) AS n FROM ta WHERE col4 IN (1, 2, 3)").collect()[0].n == 1


def test_order_by_desc(astro):
    # HBaseBasicOperationSuite.scala:153-160
    vals = [r.col7 for r in astro.sql("SELECT col1, col7 FROM ta ORDER BY col7 DESC").collect()]
    assert vals == sorted(vals, reverse=True)


def test_group_by_key_component(astro):
    # HBaseAdvancedSQLQuerySuite.scala:29-40
    assert len(astro.sql("SELECT col1 FROM ta GROUP BY col1").collect()) == 14


def test_joins_over_shared_store(astro):
    # HBaseBasicOperationSuite.scala:162-168; tb reads the same physical
    # store.  The reference's bare `FULL OUTER JOIN ... WHERE` (Spark 1.4
    # implicit cartesian) is expressed with the explicit ON TRUE modern
    # Spark requires — same observable result.
    assert len(astro.sql("SELECT ta.col2 FROM ta JOIN tb ON ta.col4 = tb.col7").collect()) == 2
    for join in ("FULL OUTER JOIN", "LEFT JOIN", "RIGHT JOIN"):
        n = len(astro.sql(f"SELECT * FROM ta {join} tb ON true WHERE tb.col7 = 1").collect())
        assert n == 14, join


def test_point_aggregate_after_insert_select(astro):
    # HBaseBasicOperationSuite.scala:120-130
    astro.sql(
        "CREATE TABLE tb2 (column2 INT, column1 INT, column4 FLOAT, column3 SHORT, "
        "PRIMARY KEY (column1, column2)) "
        "MAPPED BY (testNamespace_ht0, COLS=[column3=family1.qualifier1, column4=family2.qualifier2])"
    )
    astro.sql("INSERT INTO tb2 SELECT col4, col4, col6, col3 FROM ta")
    r = astro.sql("SELECT count(*) AS n FROM tb2 WHERE column1 = 1 AND column2 = 1").collect()
    assert len(r) == 1 and r[0].n == 1


def test_alter_add_drop_row_width(astro):
    # HBaseBasicOperationSuite.scala:170-177
    assert len(astro.sql("SELECT * FROM ta").collect()[0]) == 7
    astro.sql("ALTER TABLE ta ADD col8 STRING MAPPED BY (cf1.cf13)")
    assert len(astro.sql("SELECT * FROM ta").collect()[0]) == 8
    astro.sql("ALTER TABLE ta DROP col8")
    assert len(astro.sql("SELECT * FROM ta").collect()[0]) == 7


def test_negative_key_region_pruning(astro):
    """Negative leading-key ranges must prune correctly through the
    sign-flipped binary encoding (bytesUtils.scala:179-233 semantics)."""
    rel = astro.relation("ta")
    df, res = rel.scan_where("col7 < 0")
    assert df.count() == 7
    df, res = rel.scan_where("col7 >= 255")
    assert df.count() == 2
    meta = astro.catalog.get_table("ta")
    if len(meta.regions) > 2:
        assert len(res.files) < len(meta.regions)


def test_bulk_load_over_128_regions(spark, tmp_path_factory):
    """>128 regions: the reference switches its region-router from linear
    probe to binary search above 128 regions and pins it with a 131-region
    bulk load (HBasePartitioner.scala:49-57,
    HBaseBulkLoadIntoTableSuite.scala:414).  Our analog: a 131-region
    range layout must still bulk-load correctly, keep per-file key bounds,
    and prune a point lookup to ONE file out of >128."""
    wh = tmp_path_factory.mktemp("wide_wh")
    astro = AstroSession(spark, str(wh))
    astro.sql(
        "CREATE TABLE wide_t (k INT, v INT, PRIMARY KEY (k)) "
        "MAPPED BY (h_wide, COLS=[v=f.v]) OPTIONS (regions=131)"
    )
    csv = wh / "wide.txt"
    csv.write_text("".join(f"{i},{i * 2}\n" for i in range(1, 3001)))
    astro.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE wide_t")
    rel = astro.relation("wide_t")
    assert len(rel.meta.regions) > 128
    df, res = rel.scan_where("k = 1500")
    assert len(res.files) == 1
    assert [(r.k, r.v) for r in df.collect()] == [(1500, 3000)]
    assert astro.sql("SELECT count(*) AS n FROM wide_t").collect()[0].n == 3000
    # range scan touches only the files bracketing the range
    df, res = rel.scan_where("k BETWEEN 1000 AND 1100")
    assert df.count() == 101
    assert len(res.files) <= 8
