"""Ports of the two reference suites with no prior cited pytest:

- `HBaseCatalogTestSuite.scala:30-127` — catalog CRUD at the API level
  (create with out-of-order key declarations, get, alter add/drop,
  delete, existence checks).
- `HBaseInsertTableSuite.scala:25-215` — INSERT INTO ... SELECT (full /
  filtered / projected columns) and INSERT INTO ... VALUES incl. NULL
  cells read back as NULL and IS NOT NULL filtering over them.
"""

import pytest

from spark_sql_on_hbase_spark.catalog import (
    AstroCatalog,
    KeyColumn,
    NonKeyColumn,
    TableMeta,
)
from spark_sql_on_hbase_spark.session import AstroSession


# ---------------------------------------------------------------------------
# HBaseCatalogTestSuite
# ---------------------------------------------------------------------------
def _meta():
    # key columns deliberately declared out of order (order 1 before 0)
    # and nonkey out of family order — mirrors the reference fixture
    return TableMeta(
        name="testTable",
        namespace="testNamespace",
        physical_table="hbaseTable",
        key_columns=[
            KeyColumn("column2", "int", 1),
            KeyColumn("column1", "string", 0),
        ],
        nonkey_columns=[
            NonKeyColumn("column4", "float", "family2", "qualifier2"),
            NonKeyColumn("column3", "boolean", "family1", "qualifier1"),
        ],
    )


def test_catalog_create_get_alter_delete(tmp_path):
    cat = AstroCatalog(str(tmp_path / "wh"))

    # Create Table (HBaseCatalogTestSuite.scala:30-61)
    cat.create_table(_meta())
    assert cat.table_exists("testTable", "testNamespace")

    # Get Table (:63-94): identity, counts, POSITION-ordered keys
    t = cat.get_table("testTable", "testNamespace")
    assert t.name == "testTable"
    assert t.namespace == "testNamespace"
    assert t.physical_table == "hbaseTable"
    assert len(t.key_columns) == 2
    assert len(t.nonkey_columns) == 2
    assert len(t.all_columns) == 4
    assert t.key_names == ["column1", "column2"]  # by key order, not declaration
    assert t.key_dtypes == ["string", "int"]
    assert {c.name: c.dtype for c in t.nonkey_columns} == {
        "column3": "boolean",
        "column4": "float",
    }
    assert sorted(c.family for c in t.nonkey_columns) == ["family1", "family2"]

    # Alter Table (:96-112)
    cat.alter_add_column(
        "testTable", NonKeyColumn("column5", "boolean", "family1", "qualifier3"),
        namespace="testNamespace",
    )
    assert len(cat.get_table("testTable", "testNamespace").all_columns) == 5
    cat.alter_drop_column("testTable", "column5", namespace="testNamespace")
    assert len(cat.get_table("testTable", "testNamespace").all_columns) == 4

    # Delete Table (:114-120) + Check Logical Table Exist (:122-127)
    cat.drop_table("testTable", "testNamespace")
    assert not cat.table_exists("testTable", "testNamespace")
    assert not cat.table_exists("non-exist")


# ---------------------------------------------------------------------------
# HBaseInsertTableSuite
# ---------------------------------------------------------------------------
_SRC_ROWS = [
    ("Row0", 0, 12340, 23456780, 3456789012340, 45657.80, 5678912.345680),
    ("Row1", 1, 12341, 23456781, 3456789012341, 45657.81, 5678912.345681),
    ("Row2", 2, 12342, 23456782, 3456789012342, 45657.82, 5678912.345682),
    ("Row3", 3, 12343, 23456783, 3456789012343, 45657.83, 5678912.345683),
    ("Row4", 4, 12344, 23456784, 3456789012344, 45657.84, 5678912.345684),
    ("Row5", 5, 12345, 23456785, 3456789012345, 45657.85, 5678912.345685),
]

_WIDE_DDL = (
    "CREATE TABLE {t} (strcol STRING, bytecol BYTE, shortcol SHORT, intcol INT, "
    "longcol LONG, floatcol FLOAT, doublecol DOUBLE, "
    "PRIMARY KEY (doublecol, strcol, intcol)) "
    "MAPPED BY ({h}, COLS=[bytecol=cf1.hbytecol, shortcol=cf1.hshortcol, "
    "longcol=cf2.hlongcol, floatcol=cf2.hfloatcol])"
)


@pytest.fixture(scope="module")
def astro(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("ins_wh")
    a = AstroSession(spark, str(wh))
    a.sql(_WIDE_DDL.format(t="srcTable", h="hsrcTable"))
    csv = tmp_path_factory.mktemp("ins_csv") / "src.csv"
    csv.write_text(
        "\n".join(",".join(str(v) for v in r) for r in _SRC_ROWS) + "\n"
    )
    a.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE srcTable")
    return a


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_insert_all_rows_from_other_table(astro):
    """HBaseInsertTableSuite.scala:25-48."""
    astro.sql(_WIDE_DDL.format(t="insertTestTable", h="hinsertTestTable"))
    astro.sql("INSERT INTO TABLE insertTestTable SELECT * FROM srcTable")
    got = _rows(astro.sql("SELECT * FROM insertTestTable ORDER BY strcol"))
    want = _rows(astro.sql("SELECT * FROM srcTable ORDER BY strcol"))
    assert len(got) == len(want) == len(_SRC_ROWS)
    assert got == want
    astro.sql("DROP TABLE insertTestTable")


def test_insert_filtered_rows_from_other_table(astro):
    """HBaseInsertTableSuite.scala:50-82 (case-insensitive keywords kept)."""
    astro.sql(_WIDE_DDL.format(t="insertTestTableFilter", h="hinsertTestTableFilter"))
    astro.sql(
        "insert into table insertTestTableFilter select * from srcTable "
        "where doublecol > 5678912.345681"
    )
    got = _rows(astro.sql("select * from insertTestTableFilter order by strcol"))
    want = _rows(
        astro.sql("select * from srcTable where doublecol > 5678912.345681 order by strcol")
    )
    assert len(got) == len(want) == 4
    assert got == want
    astro.sql("Drop Table insertTestTableFilter")


def test_insert_few_columns_from_other_table(astro):
    """HBaseInsertTableSuite.scala:84-109: narrower target schema."""
    astro.sql(
        "CREATE TABLE insertTestTableFewCols (strcol STRING, bytecol BYTE, "
        "shortcol SHORT, intcol INT, PRIMARY KEY (strcol, intcol)) "
        "MAPPED BY (hinsertTestTableFewCols, COLS=[bytecol=cf1.hbytecol, "
        "shortcol=cf1.hshortcol])"
    )
    astro.sql(
        "INSERT INTO TABLE insertTestTableFewCols "
        "SELECT strcol, bytecol, shortcol, intcol FROM srcTable ORDER BY strcol"
    )
    got = _rows(
        astro.sql(
            "SELECT strcol, bytecol, shortcol, intcol FROM insertTestTableFewCols "
            "ORDER BY strcol"
        )
    )
    want = _rows(
        astro.sql("SELECT strcol, bytecol, shortcol, intcol FROM srcTable ORDER BY strcol")
    )
    assert got == want
    astro.sql("DROP TABLE insertTestTableFewCols")


def test_insert_into_values(astro):
    """HBaseInsertTableSuite.scala:111-142."""
    astro.sql(
        "CREATE TABLE insertValuesTest (strcol STRING, bytecol BYTE, "
        "shortcol SHORT, intcol INT, PRIMARY KEY (strcol, intcol)) "
        "MAPPED BY (hinsertValuesTest, COLS=[bytecol=cf1.hbytecol, "
        "shortcol=cf1.hshortcol])"
    )
    astro.sql("INSERT INTO TABLE insertValuesTest VALUES ('Row0', 1, 12340, 23456780)")
    astro.sql("INSERT INTO TABLE insertValuesTest VALUES ('Row1', 2, 12345, 23456789)")
    astro.sql("INSERT INTO TABLE insertValuesTest VALUES ('Row2', 3, 12342, 23456782)")
    got = _rows(astro.sql("SELECT * FROM insertValuesTest ORDER BY strcol"))
    assert got == [
        ("Row0", 1, 12340, 23456780),
        ("Row1", 2, 12345, 23456789),
        ("Row2", 3, 12342, 23456782),
    ]
    astro.sql("DROP TABLE insertValuesTest")


def test_insert_nullable_values(astro):
    """HBaseInsertTableSuite.scala:144-215: NULL cells are absent cells
    that read back as NULL; IS NOT NULL filters across them."""
    astro.sql(
        "CREATE TABLE insertNullValuesTest (strcol STRING, bytecol BYTE, "
        "shortcol SHORT, intcol INT, PRIMARY KEY (strcol)) "
        "MAPPED BY (hinsertNullValuesTest, COLS=[bytecol=cf1.hbytecol, "
        "shortcol=cf1.hshortcol, intcol=cf1.hintcol])"
    )
    astro.sql("INSERT INTO TABLE insertNullValuesTest VALUES ('Row0', null, 12340, 23456780)")
    astro.sql("INSERT INTO TABLE insertNullValuesTest VALUES ('Row1', 2, null, 23456789)")
    astro.sql("INSERT INTO TABLE insertNullValuesTest VALUES ('Row2', 3, 12342, null)")

    got = _rows(astro.sql("SELECT * FROM insertNullValuesTest ORDER BY strcol"))
    assert got == [
        ("Row0", None, 12340, 23456780),
        ("Row1", 2, None, 23456789),
        ("Row2", 3, 12342, None),
    ]

    not_null = _rows(
        astro.sql(
            "SELECT * FROM insertNullValuesTest WHERE intcol IS NOT NULL ORDER BY strcol"
        )
    )
    assert not_null == [
        ("Row0", None, 12340, 23456780),
        ("Row1", 2, None, 23456789),
    ]
    astro.sql("  Drop Table insertNullValuesTest")
