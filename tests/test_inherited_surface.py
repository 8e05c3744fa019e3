"""Port of inherited-surface quirks the reference pins over Astro tables
and the classic temp-table fixtures.

Reference: `HBaseSQLQuerySuite.scala` (the reference's port of Spark's
SQLQuerySuite, exercised against HBase-backed + temp tables) and
`HBaseBasicQueriesSuite.scala`.  These behaviors come from Catalyst in
both engines; the tests pin that Astro-backed scans do not disturb them
and that the classic fixture answers hold.
"""

import pytest
from pyspark.sql.utils import AnalysisException

from spark_sql_on_hbase_spark.session import AstroSession


@pytest.fixture(scope="module")
def astro(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("inh_wh")
    a = AstroSession(spark, str(wh))
    a.sql(
        "CREATE TABLE t7 (strcol STRING, bytecol BYTE, shortcol SHORT, intcol INT, "
        "longcol LONG, floatcol FLOAT, doublecol DOUBLE, "
        "PRIMARY KEY (doublecol, strcol, intcol)) "
        "MAPPED BY (ht7, COLS=[bytecol=cf1.b, shortcol=cf1.s, longcol=cf2.l, floatcol=cf2.f])"
    )
    csv = tmp_path_factory.mktemp("inh_csv") / "t.csv"
    csv.write_text(
        "Row2,2,12342,23456782,3456789012342,45657.82,5678912.345682\n"
        "Row4,4,12344,23456784,3456789012344,45657.84,5678912.345684\n"
        "Row5,5,12345,23456785,3456789012345,45657.85,5678912.345685\n"
    )
    a.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE t7")
    # classic fixtures (TestData.scala; FIXTURES.md §11) as temp views
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], ["n", "l"]
    ).createOrReplaceTempView("lowerCaseData")
    spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "C"), (4, "D"), (5, "E"), (6, "F")], ["N", "L"]
    ).createOrReplaceTempView("upperCaseData")
    spark.createDataFrame([([1, 2],), ([3, 4],)], ["dt"]).createOrReplaceTempView("arrayData")
    return a


def test_select_same_column_twice(astro):
    # HBaseBasicQueriesSuite.scala:103-126
    rows = astro.sql(
        "SELECT doublecol AS double1, doublecol AS doublecol FROM t7 "
        "WHERE doublecol > 5678912.345681 AND doublecol < 5678912.345683"
    ).collect()
    assert len(rows) == 1
    assert abs(rows[0].double1 - 5678912.345682) < 1e-6
    assert abs(rows[0].doublecol - 5678912.345682) < 1e-6


def test_union_dedup_and_all(astro, spark):
    # HBaseSQLQuerySuite.scala:521-534
    assert len(spark.sql("SELECT * FROM lowerCaseData UNION SELECT * FROM upperCaseData").collect()) == 10
    assert len(spark.sql("SELECT * FROM lowerCaseData UNION SELECT * FROM lowerCaseData").collect()) == 4
    assert len(spark.sql("SELECT * FROM lowerCaseData UNION ALL SELECT * FROM lowerCaseData").collect()) == 8


def test_union_type_coercion(astro, spark):
    # HBaseSQLQuerySuite.scala:536-550 pins Spark 1.4's lax coercion:
    # INT UNION STRING → STRING.  DOCUMENTED DIVERGENCE: Spark 4 ANSI
    # mode resolves the mismatch the strict way (string side parsed as
    # numeric, runtime error on 'A'); the legacy answer needs an
    # explicit CAST, which we pin instead.
    vals = sorted(r[0] for r in spark.sql(
        "SELECT CAST(n AS STRING) AS c FROM lowerCaseData UNION SELECT L FROM upperCaseData"
    ).collect())
    assert vals == ["1", "2", "3", "4", "A", "B", "C", "D", "E", "F"]
    # incompatible types (array vs int) still refuse at analysis, as the
    # reference pins (:546-549)
    with pytest.raises(AnalysisException):
        spark.sql("SELECT dt FROM arrayData UNION SELECT 1 FROM arrayData").collect()


def test_except_intersect(astro, spark):
    # HBaseSQLQuerySuite.scala:553-574
    assert len(spark.sql("SELECT * FROM lowerCaseData EXCEPT SELECT * FROM upperCaseData").collect()) == 4
    assert spark.sql("SELECT * FROM lowerCaseData EXCEPT SELECT * FROM lowerCaseData").collect() == []
    assert len(spark.sql("SELECT * FROM lowerCaseData INTERSECT SELECT * FROM lowerCaseData").collect()) == 4
    assert spark.sql("SELECT * FROM lowerCaseData INTERSECT SELECT * FROM upperCaseData").collect() == []


def test_mixed_case_keywords_over_astro(astro):
    # HBaseSQLQuerySuite.scala:717-739 analog on an Astro table
    rows = astro.sql(
        "sELEcT strCOL, INTcol fRoM t7 wHeRe intCOL > 23456782 oRdEr bY intcol"
    ).collect()
    assert [r[1] for r in rows] == [23456784, 23456785]


def test_cast_bool_and_numeric(astro):
    # HBaseSQLQuerySuite.scala:810-826 casts
    r = astro.sql(
        "SELECT CAST(1 AS BOOLEAN) AS b1, CAST(bytecol AS STRING) AS s, "
        "CAST(intcol AS DOUBLE) AS d FROM t7 WHERE strcol = 'Row2'"
    ).collect()[0]
    assert r.b1 is True and r.s == "2" and abs(r.d - 23456782.0) < 1e-6
    r = astro.sql("SELECT CAST(true AS STRING) AS bs").collect()[0]
    assert r.bs == "true"


def test_arithmetic_and_unary_over_astro(astro):
    # HBaseSQLQuerySuite.scala:828-909 arithmetic incl. unary minus
    r = astro.sql(
        "SELECT -intcol AS neg, intcol + 1 AS inc, intcol * 2 AS dbl, "
        "intcol % 10 AS m FROM t7 WHERE strcol = 'Row2'"
    ).collect()[0]
    assert (r.neg, r.inc, r.dbl, r.m) == (-23456782, 23456783, 46913564, 2)


def test_self_join_with_aliases(astro):
    # HBaseSQLQuerySuite.scala:321-439 self-join alias resolution
    rows = astro.sql(
        "SELECT x.strcol, y.intcol FROM t7 x JOIN t7 y ON x.intcol = y.intcol "
        "WHERE x.strcol = 'Row4'"
    ).collect()
    assert len(rows) == 1 and rows[0][1] == 23456784


def test_limit_after_subquery_join(astro):
    # HBaseSQLQuerySuite.scala:911-952: join with LIMIT subquery
    rows = astro.sql(
        "SELECT a.strcol FROM (SELECT * FROM t7 ORDER BY intcol LIMIT 2) a "
        "JOIN t7 b ON a.intcol = b.intcol ORDER BY a.strcol"
    ).collect()
    assert [r.strcol for r in rows] == ["Row2", "Row4"]


def test_string_functions_over_astro(astro):
    # HBaseSQLQuerySuite.scala:114-127,485-519
    r = astro.sql(
        "SELECT UPPER(strcol) AS u, LOWER(strcol) AS lo, SUBSTR(strcol, 1, 3) AS s3 "
        "FROM t7 WHERE strcol LIKE 'Row2%'"
    ).collect()[0]
    assert (r.u, r.lo, r.s3) == ("ROW2", "row2", "Row")


def test_conditional_case_if(astro):
    # HBaseSQLQuerySuite.scala:748-758
    rows = astro.sql(
        "SELECT strcol, CASE WHEN intcol > 23456783 THEN 'big' ELSE 'small' END AS sz, "
        "IF(bytecol = 2, 'two', 'other') AS w FROM t7 ORDER BY strcol"
    ).collect()
    assert [(r.sz, r.w) for r in rows] == [("small", "two"), ("big", "other"), ("big", "other")]


def test_json_parquet_temp_tables_join_astro(astro, spark, tmp_path):
    """Reference parity: JSON and parquet temp tables interoperate with
    mapped tables in the same query (joins + UNION ALL)
    (`HBaseAdditionalQuerySuite.scala:97-101,145-159` — insertTestData
    builds JSON/parquet sources and joins them against the HBase table).
    """
    jdir = tmp_path / "j"
    jdir.mkdir()
    (jdir / "rows.json").write_text(
        '{"strcol": "Row2", "tag": "json2"}\n{"strcol": "Row5", "tag": "json5"}\n'
    )
    spark.read.json(str(jdir)).createOrReplaceTempView("jside")
    pdir = str(tmp_path / "p")
    spark.createDataFrame(
        [("Row4", "parq4")], ["strcol", "tag"]
    ).write.parquet(pdir)
    spark.read.parquet(pdir).createOrReplaceTempView("pside")

    rows = astro.sql(
        """
        SELECT t7.strcol, s.tag, t7.intcol FROM t7 JOIN jside s ON t7.strcol = s.strcol
        UNION ALL
        SELECT t7.strcol, s.tag, t7.intcol FROM t7 JOIN pside s ON t7.strcol = s.strcol
        ORDER BY strcol
        """
    ).collect()
    assert [(r.strcol, r.tag, r.intcol) for r in rows] == [
        ("Row2", "json2", 23456782),
        ("Row4", "parq4", 23456784),
        ("Row5", "json5", 23456785),
    ]


def test_column_metadata_propagates_through_plans(astro, spark):
    """Reference parity: column-level metadata survives selects, SQL over
    a temp view, and joins (`HBaseAdvancedSQLQuerySuite.scala:46-67`).
    Catalyst behavior in both engines; pinned over an Astro-backed scan."""
    ta = astro.sql("SELECT strcol, intcol, doublecol FROM t7")
    schema = ta.schema
    meta = {"doc": "first name"}
    fields = [
        schema["strcol"],
        schema["intcol"],
        schema["doublecol"],
    ]
    from pyspark.sql.types import StructField, StructType

    fields[0] = StructField("strcol", fields[0].dataType, fields[0].nullable, meta)
    with_meta = spark.createDataFrame(ta.rdd, StructType(fields))
    with_meta.createOrReplaceTempView("personWithMeta")
    spark.createDataFrame(
        [("Row2", 100), ("Row4", 200)], ["personId", "salary"]
    ).createOrReplaceTempView("salary")

    def check(df):
        assert df.schema["strcol"].metadata.get("doc") == "first name", df.schema

    check(with_meta.select("strcol"))
    check(with_meta.select("intcol", "strcol"))
    check(astro.sql("SELECT * FROM personWithMeta"))
    check(astro.sql("SELECT intcol, strcol FROM personWithMeta"))
    check(astro.sql("SELECT * FROM personWithMeta JOIN salary ON strcol = personId"))
    check(astro.sql("SELECT strcol, salary FROM personWithMeta JOIN salary ON strcol = personId"))
