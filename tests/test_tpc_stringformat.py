"""Port of the reference's stringformat TPC mini corpus.

Reference: `HBaseTpcStringFormatMiniTestSuite.scala:73-124` (DDL) and
`:150-833` (Queries 0-32) — the same store_sales fact stored IN
STRINGFORMAT with a single pre-composed string key `strkey`
("01857000000007"-style zero-padded item+ticket).  Pins schema-on-read
casting (every stored value is a decimal string), predicates and
aggregates on cast columns, string-key range scans, NULL cells, and
non-sargable key arithmetic.  Fixture CSV read from the read-only
reference checkout (10 rows).
"""

import os

import pytest

from spark_sql_on_hbase_spark.session import AstroSession

CSV = "/root/reference/src/test/resources/store_sales_stringformat.txt"

COLS = [("strkey", "STRING")] + [
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
    "CREATE TABLE store_sales_stringformat ("
    + ", ".join(f"{n} {t}" for n, t in COLS)
    + ", PRIMARY KEY (strkey)) MAPPED BY (STORE_SALES_STRINGFORMAT, COLS=["
    + ", ".join(f"{n}=f.{n}" for n, t in COLS[1:])
    + "]) IN STRINGFORMAT"
)

pytestmark = pytest.mark.skipif(not os.path.exists(CSV), reason="reference fixture unavailable")

T = "store_sales_stringformat"

# (name, sql, expected_row_count) — suite line refs :150-833
QUERIES = [
    ("q0", f"SELECT count(1) AS n FROM {T}", 1),
    ("q1", f"SELECT ss_quantity, ss_wholesale_cost, ss_list_price FROM {T} "
           "WHERE ss_item_sk = 574 AND ss_ticket_number = 29", 1),
    ("q2", f"SELECT ss_sold_date_sk, ss_sold_time_sk, ss_store_sk FROM {T} "
           "WHERE ss_item_sk = 3163 AND ss_ticket_number = 7", 1),
    ("q3", f"SELECT ss_customer_sk, ss_promo_sk, ss_coupon_amt, ss_net_profit FROM {T} "
           "WHERE ss_item_sk = 18814 AND ss_ticket_number = 29", 1),
    ("q4", f"SELECT ss_ticket_number, count(1) AS n FROM {T} "
           "GROUP BY ss_ticket_number ORDER BY ss_ticket_number", 5),
    ("q5", f"SELECT ss_item_sk, ss_ticket_number, count(1) AS n FROM {T} "
           "WHERE ss_item_sk > 14000 AND ss_item_sk < 18000 "
           "GROUP BY ss_item_sk, ss_ticket_number", 1),
    ("q6", f"SELECT ss_item_sk, avg(ss_quantity) AS avg_qty, count(ss_quantity) AS cnt_qty "
           f"FROM {T} WHERE ss_item_sk = 707 GROUP BY ss_item_sk ORDER BY ss_item_sk", 1),
    ("q7", f"SELECT ss_item_sk, ss_ticket_number, sum(ss_wholesale_cost) AS s FROM {T} "
           "WHERE ss_item_sk > 9000 AND ss_item_sk < 18000 "
           "GROUP BY ss_item_sk, ss_ticket_number ORDER BY ss_item_sk, ss_ticket_number", 2),
    ("q8", f"SELECT ss_item_sk, ss_ticket_number, min(ss_wholesale_cost) AS mn, "
           f"max(ss_wholesale_cost) AS mx, avg(ss_wholesale_cost) AS av FROM {T} "
           "WHERE ss_item_sk > 1000 AND ss_item_sk < 18000 "
           "GROUP BY ss_item_sk, ss_ticket_number ORDER BY ss_item_sk, ss_ticket_number", 5),
    ("q9", f"SELECT ss_item_sk, count(ss_customer_sk) AS c FROM {T} "
           "WHERE ss_item_sk > 0 AND ss_item_sk <= 18813 GROUP BY ss_item_sk "
           "ORDER BY ss_item_sk", 9),
    ("q10", f"SELECT count(*) AS n FROM {T} WHERE ss_net_profit < 100", 1),
    ("q11", f"SELECT count(*) AS n FROM {T} WHERE ss_coupon_amt < 500 AND "
            "ss_ext_discount_amt < 500 AND ss_net_paid < 500 AND ss_net_paid_inc_tax < 500", 1),
    ("q12", f"SELECT count(distinct ss_customer_sk) AS n FROM {T}", 1),
    ("q13", f"SELECT * FROM {T} LIMIT 5", 5),
    ("q14", f"SELECT ss_customer_sk, count(*) AS n FROM {T} "
            "WHERE ss_item_sk >= 4000 AND ss_item_sk <= 18000 GROUP BY ss_customer_sk "
            "ORDER BY ss_customer_sk", 2),
    ("q15", f"SELECT count(ss_customer_sk) AS n FROM {T} "
            "WHERE ss_customer_sk IN (1,25,50,75937,180451)", 1),
    ("q16", f"SELECT count(ss_customer_sk) AS n FROM {T} "
            "WHERE ss_customer_sk <= 147954 AND ss_quantity < 5000", 1),
    ("q17", f"SELECT count(ss_customer_sk) AS n FROM {T} WHERE ss_customer_sk > 100", 1),
    ("q18", f"SELECT ss_ticket_number, ss_quantity, ss_wholesale_cost, ss_list_price FROM {T} "
            "WHERE ss_ticket_number = 10 OR ss_wholesale_cost < 17.33 "
            "ORDER BY ss_ticket_number, ss_quantity, ss_wholesale_cost, ss_list_price", 3),
    ("q19", f"SELECT ss_ticket_number, ss_sold_date_sk, ss_sold_time_sk, ss_store_sk FROM {T} "
            "WHERE ss_ticket_number = 10 OR ss_sold_date_sk >= 2451966 ORDER BY ss_ticket_number", 5),
    ("q20", f"SELECT ss_ticket_number, ss_sold_date_sk, ss_customer_sk, ss_promo_sk, ss_coupon_amt "
            f"FROM {T} WHERE ss_ticket_number = 10 "
            "OR (ss_sold_date_sk > 2451121 AND ss_sold_date_sk <= 2451966) "
            "ORDER BY ss_ticket_number", 4),
    ("q21", f"SELECT strkey, ss_item_sk, ss_ticket_number, count(1) AS n FROM {T} "
            "WHERE ss_ticket_number >= 10 AND ss_ticket_number <= 20 "
            "GROUP BY strkey, ss_item_sk, ss_ticket_number "
            "ORDER BY strkey, ss_item_sk, ss_ticket_number", 3),
    ("q22", f"SELECT strkey, ss_item_sk, ss_ticket_number, SUM(ss_wholesale_cost) AS s FROM {T} "
            "WHERE ss_ticket_number >= 10 AND ss_ticket_number <= 20 "
            "GROUP BY strkey, ss_item_sk, ss_ticket_number "
            "ORDER BY strkey, ss_item_sk, ss_ticket_number", 3),
    ("q23", f"SELECT ss_item_sk, ss_ticket_number, min(ss_wholesale_cost) AS mn, "
            f"max(ss_wholesale_cost) AS mx, avg(ss_wholesale_cost) AS av FROM {T} "
            "WHERE (ss_ticket_number >= 10 AND ss_ticket_number <= 20) "
            "AND (ss_sold_date_sk > 2451121 AND ss_sold_date_sk <= 2451966) "
            "GROUP BY ss_item_sk, ss_ticket_number ORDER BY ss_item_sk, ss_ticket_number", 2),
    ("q24", f"SELECT ss_item_sk, ss_ticket_number, min(ss_ext_wholesale_cost) AS mn, "
            f"max(ss_ext_wholesale_cost) AS mx, avg(ss_ext_wholesale_cost) AS av FROM {T} "
            "WHERE (ss_ticket_number >= 10 AND ss_ticket_number <= 100) "
            "AND (ss_customer_sk > 0 AND ss_customer_sk <= 147954) "
            "AND (ss_sold_date_sk = 2451121 OR ss_sold_date_sk = 2451390) "
            "GROUP BY ss_item_sk, ss_ticket_number ORDER BY ss_item_sk, ss_ticket_number", 4),
    ("q25", f"SELECT * FROM {T} WHERE strkey > '03163000000007' ORDER BY strkey", 4),
    ("q26", f"SELECT * FROM {T} WHERE ss_wholesale_cost >= 33 AND ss_quantity > 40 "
            "ORDER BY strkey", 3),
    ("q27", f"SELECT * FROM {T} WHERE ss_ticket_number + 0 = 10 AND ss_sold_date_sk + 0 > 0 "
            "ORDER BY strkey", 2),
    ("q28", f"SELECT * FROM {T} WHERE ss_cdemo_sk IS NULL", 1),
    ("q29", f"SELECT * FROM {T} WHERE ss_cdemo_sk IS NOT NULL", 9),
    ("q30", f"SELECT * FROM {T} WHERE ss_cdemo_sk IS NOT NULL AND ss_ticket_number = 29 "
            "ORDER BY strkey", 2),
]


@pytest.fixture(scope="module")
def astro(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("sfmt_wh")
    a = AstroSession(spark, str(wh))
    a.sql(DDL)
    a.sql(f"LOAD DATA INPATH '{CSV}' INTO TABLE {T}")
    return a


@pytest.mark.parametrize("name,sql,expected", QUERIES, ids=[q[0] for q in QUERIES])
def test_stringformat_rowcounts(astro, name, sql, expected):
    assert len(astro.sql(sql).collect()) == expected


def test_stringformat_values(astro):
    QBY = {name: sql for name, sql, _ in QUERIES}
    r = astro.sql(QBY["q0"]).collect()[0]
    assert r.n == 10  # :150-155
    r = astro.sql(QBY["q1"]).collect()[0]  # :157-169
    assert r.ss_quantity == 33
    assert abs(r.ss_wholesale_cost - 68.24) < 1e-4
    assert abs(r.ss_list_price - 116.69) < 1e-4
    r = astro.sql(QBY["q2"]).collect()[0]  # :171-184
    assert (r.ss_sold_date_sk, r.ss_sold_time_sk, r.ss_store_sk) == (2452260, 46712, 19)
    r = astro.sql(QBY["q3"]).collect()[0]  # :186-200 — empty string cells ⇒ NULL
    assert r.ss_customer_sk is None and r.ss_promo_sk is None
    assert abs(r.ss_coupon_amt - 0.0) < 1e-6
    assert abs(r.ss_net_profit - (-4398.98)) < 1e-2
    rows = astro.sql(QBY["q4"]).collect()  # :202-227
    assert [(r.ss_ticket_number, r.n) for r in rows] == [(7, 2), (10, 2), (11, 1), (29, 3), (30, 2)]
    r = astro.sql(QBY["q5"]).collect()[0]  # :229-242
    assert (r.ss_item_sk, r.ss_ticket_number, r.n) == (16335, 10, 1)
    rows = astro.sql(QBY["q7"]).collect()  # :260-279
    assert (rows[0].ss_item_sk, rows[0].ss_ticket_number) == (12919, 30)
    assert abs(rows[0].s - 61.96) < 1e-2
    rows = astro.sql(QBY["q9"]).collect()  # :315-353
    assert [r.ss_item_sk for r in rows] == [7, 574, 707, 1579, 1857, 3163, 12919, 16335, 18669]
    assert all(r.c == 1 for r in rows)
    assert astro.sql(QBY["q10"]).collect()[0].n == 8  # :355-360
    assert astro.sql(QBY["q11"]).collect()[0].n == 2  # :362-371
    assert astro.sql(QBY["q12"]).collect()[0].n == 5  # :373-381
    rows = astro.sql(QBY["q14"]).collect()  # :390-407
    assert [(r.ss_customer_sk, r.n) for r in rows] == [(75937, 1), (180451, 1)]
    assert astro.sql(QBY["q15"]).collect()[0].n == 4  # :409-418
    assert astro.sql(QBY["q16"]).collect()[0].n == 7  # :420-430
    assert astro.sql(QBY["q17"]).collect()[0].n == 9  # :432-441
    rows = astro.sql(QBY["q18"]).collect()  # :443-469
    assert [(r.ss_ticket_number, r.ss_quantity) for r in rows] == [(10, 66), (10, 83), (11, 68)]
    rows = astro.sql(QBY["q21"]).collect()  # :544-570
    assert rows[0].strkey == "00707000000010"
    rows = astro.sql(QBY["q25"]).collect()  # :675-705 — string-key range scan
    assert rows[0].strkey == "12919000000030"
    rows = astro.sql(QBY["q26"]).collect()  # :707-733
    assert rows[0].strkey == "01857000000007"
    assert rows[0].ss_sold_date_sk == 2452260
    assert abs(rows[0].ss_net_profit - 1150.23) < 1e-2
    rows = astro.sql(QBY["q27"]).collect()  # :735-755 — non-sargable key arith
    assert rows[0].strkey == "00707000000010"
    assert rows[0].ss_item_sk == 707
    r = astro.sql(QBY["q28"]).collect()[0]  # :757-771
    assert r.strkey == "18814000000029"
    assert r.ss_item_sk is None or r.ss_item_sk == 18814  # ss_item_sk stored non-key here
