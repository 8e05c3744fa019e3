"""Port of the reference's TPC mini corpus (Queries 0-32).

Reference: `src/test/scala/org/apache/spark/sql/hbase/HBaseTpcMiniTestSuite.scala:146-362`
— 33 queries over a 100-row TPC-DS `store_sales` slice with composite key
(ss_item_sk, ss_ticket_number), pinning point-get, range-scan, IN, IS
NULL/absent-cell, aggregate, limit, and non-sargable-key behavior.

The fixture CSV is read from the read-only reference checkout at test time
(skipped when absent); expected values are the reference suite's published
assertions, independently cross-checked against a DuckDB oracle over the
same CSV so a fixture drift can't silently pass.
"""

import os

import duckdb
import pytest

from spark_sql_on_hbase_spark.session import AstroSession

CSV = "/root/reference/src/test/resources/store_sales.txt"

COLS = [
    ("ss_sold_date_sk", "INT"), ("ss_sold_time_sk", "INT"), ("ss_item_sk", "INT"),
    ("ss_customer_sk", "INT"), ("ss_cdemo_sk", "INT"), ("ss_hdemo_sk", "INT"),
    ("ss_addr_sk", "INT"), ("ss_store_sk", "INT"), ("ss_promo_sk", "INT"),
    ("ss_ticket_number", "INT"), ("ss_quantity", "INT"), ("ss_wholesale_cost", "FLOAT"),
    ("ss_list_price", "FLOAT"), ("ss_sales_price", "FLOAT"), ("ss_ext_discount_amt", "FLOAT"),
    ("ss_ext_sales_price", "FLOAT"), ("ss_ext_wholesale_cost", "FLOAT"),
    ("ss_ext_list_price", "FLOAT"), ("ss_ext_tax", "FLOAT"), ("ss_coupon_amt", "FLOAT"),
    ("ss_net_paid", "FLOAT"), ("ss_net_paid_inc_tax", "FLOAT"), ("ss_net_profit", "FLOAT"),
]

DDL = (
    "CREATE TABLE store_sales ("
    + ", ".join(f"{n} {t}" for n, t in COLS)
    + ", PRIMARY KEY (ss_item_sk, ss_ticket_number)) MAPPED BY (store_sales_htable, COLS=["
    + ", ".join(f"{n}=f.{n}" for n, t in COLS if n not in ("ss_item_sk", "ss_ticket_number"))
    + "])"
)

pytestmark = pytest.mark.skipif(not os.path.exists(CSV), reason="reference fixture unavailable")

# (name, sql, expected_row_count or None) — counts from
# HBaseTpcMiniTestSuite.scala:146-362; value asserts handled separately.
QUERIES = [
    ("q0", "SELECT count(1) AS n FROM store_sales", 1),
    ("q1", "SELECT ss_quantity, ss_wholesale_cost, ss_list_price FROM store_sales "
           "WHERE ss_item_sk = 2744 AND ss_ticket_number = 1", 1),
    ("q2", "SELECT ss_sold_date_sk, ss_sold_time_sk, ss_store_sk FROM store_sales "
           "WHERE ss_item_sk = 2744 AND ss_ticket_number = 1", 1),
    ("q3", "SELECT ss_customer_sk, ss_promo_sk, ss_coupon_amt FROM store_sales "
           "WHERE ss_item_sk = 2744 AND ss_ticket_number = 1", 1),
    ("q4", "SELECT ss_item_sk, count(1) AS n FROM store_sales GROUP BY ss_item_sk", 100),
    ("q5", "SELECT ss_item_sk, ss_ticket_number, count(1) AS n FROM store_sales "
           "WHERE ss_item_sk > 4000 AND ss_item_sk < 5000 GROUP BY ss_item_sk, ss_ticket_number", 5),
    ("q6", "SELECT ss_item_sk, avg(ss_quantity) AS avg_qty, count(ss_quantity) AS cnt_qty "
           "FROM store_sales WHERE ss_item_sk = 2744 GROUP BY ss_item_sk", 1),
    ("q7", "SELECT ss_item_sk, ss_ticket_number, sum(ss_wholesale_cost) AS sum_wholesale_cost "
           "FROM store_sales WHERE ss_item_sk > 4000 AND ss_item_sk <= 5000 "
           "GROUP BY ss_item_sk, ss_ticket_number", 5),
    ("q7_1", "SELECT ss_item_sk, ss_ticket_number, sum(ss_wholesale_cost) AS sum_wholesale_cost "
             "FROM store_sales WHERE ss_item_sk > 17182 AND ss_item_sk <= 17183 "
             "GROUP BY ss_item_sk, ss_ticket_number", 1),
    ("q8", "SELECT ss_item_sk, ss_ticket_number, min(ss_wholesale_cost) AS mn, "
           "max(ss_wholesale_cost) AS mx, avg(ss_wholesale_cost) AS av FROM store_sales "
           "WHERE ss_item_sk > 4000 AND ss_item_sk <= 5000 GROUP BY ss_item_sk, ss_ticket_number", 5),
    ("q9", "SELECT ss_item_sk, count(ss_customer_sk) AS c FROM store_sales "
           "WHERE ss_item_sk > 4000 AND ss_item_sk <= 5000 GROUP BY ss_item_sk", 5),
    ("q10", "SELECT count(*) AS n FROM store_sales WHERE ss_net_profit < 100", 1),
    ("q11", "SELECT count(*) AS n FROM store_sales WHERE ss_coupon_amt < 50 AND "
            "ss_ext_discount_amt < 50 AND ss_net_paid < 50 AND ss_net_paid_inc_tax < 50", 1),
    ("q12", "SELECT count(distinct ss_customer_sk) AS n FROM store_sales", 1),
    ("q13", "SELECT * FROM store_sales LIMIT 100", 100),
    ("q14", "SELECT ss_customer_sk, count(*) AS n FROM store_sales "
            "WHERE ss_item_sk >= 4000 AND ss_item_sk <= 5000 GROUP BY ss_customer_sk", 5),
    ("q15", "SELECT count(ss_customer_sk) AS n FROM store_sales "
            "WHERE ss_customer_sk IN (1,25,50,75,100)", 1),
    ("q16", "SELECT count(ss_customer_sk) AS n FROM store_sales "
            "WHERE ss_customer_sk < 100 AND ss_quantity < 5", 1),
    ("q17", "SELECT count(ss_customer_sk) AS n FROM store_sales WHERE ss_customer_sk > 100", 1),
    ("q18", "SELECT ss_quantity, ss_wholesale_cost, ss_list_price FROM store_sales "
            "WHERE ss_ticket_number = 3", 14),
    ("q19", "SELECT ss_sold_date_sk, ss_sold_time_sk, ss_store_sk FROM store_sales "
            "WHERE ss_ticket_number = 3", 14),
    ("q20", "SELECT ss_customer_sk, ss_promo_sk, ss_coupon_amt FROM store_sales "
            "WHERE ss_ticket_number = 3", 14),
    ("q21", "SELECT ss_item_sk, ss_ticket_number, count(1) AS n FROM store_sales "
            "WHERE ss_ticket_number >= 3 AND ss_ticket_number <= 4 "
            "GROUP BY ss_item_sk, ss_ticket_number", 24),
    ("q22", "SELECT ss_item_sk, ss_ticket_number, SUM(ss_wholesale_cost) AS s FROM store_sales "
            "WHERE ss_ticket_number >= 3 AND ss_ticket_number <= 4 "
            "GROUP BY ss_item_sk, ss_ticket_number", 24),
    ("q23", "SELECT ss_item_sk, ss_ticket_number, min(ss_wholesale_cost) AS mn, "
            "max(ss_wholesale_cost) AS mx, avg(ss_wholesale_cost) AS av FROM store_sales "
            "WHERE ss_ticket_number >= 3 AND ss_ticket_number <= 3 "
            "GROUP BY ss_item_sk, ss_ticket_number", 14),
    ("q24", "SELECT ss_item_sk, ss_ticket_number FROM store_sales "
            "WHERE (ss_item_sk = 186 AND ss_ticket_number > 0)", 1),
    ("q25", "SELECT * FROM store_sales WHERE ss_ticket_number > 6 AND ss_sold_date_sk > 0", 21),
    ("q26", "SELECT * FROM store_sales WHERE ss_ticket_number = 7 AND ss_sold_date_sk > 0", 12),
    ("q27", "SELECT * FROM store_sales WHERE ss_ticket_number + 0 = 3 AND ss_sold_date_sk + 0 > 0", 13),
    ("q28", "SELECT * FROM store_sales WHERE ss_sold_date_sk IS NULL", 5),
    ("q29", "SELECT * FROM store_sales WHERE ss_sold_date_sk IS NOT NULL", 95),
    ("q30", "SELECT * FROM store_sales WHERE ss_sold_date_sk IS NOT NULL AND ss_ticket_number = 3", 13),
    ("q31", "SELECT * FROM store_sales WHERE ss_sold_date_sk IS NULL AND ss_ticket_number = 3", 1),
    ("q32", "SELECT * FROM store_sales WHERE ss_sold_date_sk IS NULL OR ss_ticket_number = 3", 18),
]


@pytest.fixture(scope="module")
def astro(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("tpc_wh")
    a = AstroSession(spark, str(wh))
    a.sql(DDL)
    a.sql(f"LOAD DATA INPATH '{CSV}' INTO TABLE store_sales")
    return a


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    colspec = ", ".join(
        f"'{n}': '{'INTEGER' if t == 'INT' else 'DOUBLE'}'" for n, t in COLS
    )
    con.execute(
        f"CREATE VIEW store_sales AS SELECT * FROM read_csv('{CSV}', header=false, "
        f"columns={{{colspec}}}, nullstr='')"
    )
    return con


@pytest.mark.parametrize("name,sql,expected", QUERIES, ids=[q[0] for q in QUERIES])
def test_tpc_mini_rowcounts(astro, oracle, name, sql, expected):
    rows = astro.sql(sql).collect()
    assert len(rows) == expected, f"{name}: got {len(rows)} rows, reference pins {expected}"
    # independent oracle cross-check on the same CSV
    assert len(oracle.execute(sql).fetchall()) == expected


def test_tpc_mini_values(astro):
    # Value-level pins from the reference suite (file:line cited per query).
    QBY = {name: sql for name, sql, _ in QUERIES}
    r = astro.sql(QBY["q0"]).collect()[0]
    assert r.n == 100  # Query 0 (:147-150)
    r = astro.sql(QBY["q1"]).collect()[0]  # Query 1 (:152-158)
    assert r.ss_quantity == 37
    assert abs(r.ss_wholesale_cost - 63.63) < 1e-4
    assert abs(r.ss_list_price - 101.17) < 1e-4
    r = astro.sql(QBY["q2"]).collect()[0]  # Query 2 (:160-166)
    assert (r.ss_sold_date_sk, r.ss_sold_time_sk, r.ss_store_sk) == (2451813, 65495, 25)
    r = astro.sql(QBY["q3"]).collect()[0]  # Query 3 (:168-174)
    assert (r.ss_customer_sk, r.ss_promo_sk) == (225006, 354)
    assert abs(r.ss_coupon_amt - 46.03) < 1e-4
    r = astro.sql(QBY["q7_1"]).collect()[0]  # Query 7.1 (:215-227)
    assert (r.ss_item_sk, r.ss_ticket_number) == (17183, 6)
    # DOCUMENTED DIVERGENCE: the reference asserts 0.0 here — an artifact of
    # Spark 1.4's zero-initialized partial SumFunction acting as the final
    # aggregate in its one-phase path (HBaseStrategies.scala:42-60).  The
    # row's ss_wholesale_cost field is empty ⇒ NULL (string2KV,
    # HBaseKVHelper.scala:122-131), so ANSI SUM over the all-NULL group is
    # NULL — which modern Spark and the DuckDB oracle both return.  We keep
    # the ANSI answer.
    assert r.sum_wholesale_cost is None
    assert astro.sql(QBY["q11"]).collect()[0].n == 6  # Query 11 (:235-239)
    assert astro.sql(QBY["q12"]).collect()[0].n == 8  # Query 12 (:241-245)
    assert astro.sql(QBY["q15"]).collect()[0].n == 0  # Query 15 (:259-263)
    assert astro.sql(QBY["q16"]).collect()[0].n == 2  # Query 16 (:265-269)
    assert astro.sql(QBY["q17"]).collect()[0].n == 83  # Query 17 (:271-275)
    assert astro.sql(QBY["q10"]).collect()[0].n == 74  # Query 10 (:229-233)


def test_point_query_prunes_to_one_region(astro):
    """Reference semantics: a full-key point query touches ≤1 region
    (HBaseSQLReaderRDD.scala:272-315 batched-Get path)."""
    rel = astro.relation("store_sales")
    meta = astro.catalog.get_table("store_sales")
    df, res = rel.scan_where("ss_item_sk = 2744 AND ss_ticket_number = 1")
    assert df.count() == 1
    if len(meta.regions) > 1:
        assert len(res.files) <= 1
