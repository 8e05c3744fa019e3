"""Relational query surface — the SELECT capabilities of the reference,
expressed Spark-first, each with a DuckDB oracle.

Coverage maps to SURVEY.md §2.2 (the reference's inherited Spark SQL 1.4
surface, pinned by its test suites — HBaseSQLQuerySuite / TpcMiniTestSuite /
Basic/Aggregate suites) plus the modern-Spark extensions the reference
lacks (windows, rollup/cube, grouping sets, offset, CTEs) that SURVEY §2.2
directs us to expose.

Design notes
------------
* Each entry is either one ANSI-SQL string both engines run verbatim, or a
  dialect template rendered twice (Spark SQL vs DuckDB) where function
  names diverge, or a DataFrame-DSL callable (to exercise the DataFrame
  API path) paired with an equivalent oracle SQL.
* Floating aggregates are `round(...)`-ed so different summation orders
  across engines can't flip the value hash.
* Timestamps in outputs are projected to epoch seconds (BIGINT) — Spark
  session TZ is pinned to UTC; DuckDB is UTC-naive.
* Integer sums are CAST to BIGINT (DuckDB sums INTEGER into HUGEINT).
* Every LIMIT is preceded by a total ORDER BY with a unique tiebreaker.

Scale notes (100 TB): every query here is pure DataFrame/SQL — Catalyst
plans it with pushed filters, pruned columns, partial aggregation and
(for the dimension joins) broadcast hash joins; nothing materializes on
the driver.  The one deliberately non-sargable predicate
(`pred_non_sargable`) mirrors reference Tpc Query 27 and degrades to a
full scan exactly as the reference does.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Union

from pyspark.sql import DataFrame, SparkSession

from spark_sql_on_hbase_spark.tables import load_tables

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Q:
    """One query: Spark side (SQL string or DataFrame callable) + oracle SQL."""

    spark: Union[str, SparkFn]
    oracle: Optional[str]
    doc: str = ""


# ---------------------------------------------------------------------------
# dialect snippets: name → (spark_renderer, duckdb_renderer)
# ---------------------------------------------------------------------------
class _Dialect:
    def __init__(self, is_spark: bool):
        self.is_spark = is_spark

    def epoch(self, col: str) -> str:
        # NB: DuckDB epoch() yields a DOUBLE for sub-second timestamps and a
        # ::BIGINT cast ROUNDS, while Spark's unix_timestamp() floors — floor
        # explicitly so both engines bucket identically.
        return f"unix_timestamp({col})" if self.is_spark else f"CAST(floor(epoch({col})) AS BIGINT)"

    def json_int(self, col: str, key: str) -> str:
        if self.is_spark:
            return f"CAST(get_json_object({col}, '$.{key}') AS BIGINT)"
        return f"CAST({col}::JSON->>'{key}' AS BIGINT)"

    def xor(self, a: str, b: str) -> str:
        return f"({a} ^ {b})" if self.is_spark else f"xor({a}, {b})"

    def shiftleft(self, a: str, n: int) -> str:
        return f"shiftleft({a}, {n})" if self.is_spark else f"({a} << {n})"

    def shiftright(self, a: str, n: int) -> str:
        return f"shiftright({a}, {n})" if self.is_spark else f"({a} >> {n})"

    def null_safe_eq(self, a: str, b: str) -> str:
        return f"({a} <=> {b})" if self.is_spark else f"({a} IS NOT DISTINCT FROM {b})"

    def arr_get(self, arr: str, i: int) -> str:
        """1-based array element access in both engines."""
        return f"element_at({arr}, {i})" if self.is_spark else f"list_extract({arr}, {i})"

    def arr_len(self, arr: str) -> str:
        return f"size({arr})" if self.is_spark else f"len({arr})"

    def max_by(self, col: str, ord_: str) -> str:
        """Deterministic LAST: value of col at max ord (reference LAST is
        order-dependent, HBaseSQLQuerySuite.scala:275-319; we pin it)."""
        return f"max_by({col}, {ord_})" if self.is_spark else f"arg_max({col}, {ord_})"

    def median(self, col: str) -> str:
        if self.is_spark:
            return f"percentile({col}, 0.5)"
        return f"CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY {col}) AS DOUBLE)"

    def day_diff(self, a: str, b: str) -> str:
        # whole days between timestamps a - b
        return f"datediff({a}, {b})" if self.is_spark else f"date_diff('day', {b}, {a})"

    def split_ws(self, col: str) -> str:
        # whitespace tokenization → array of tokens
        return f"split({col}, '\\\\s+')" if self.is_spark else f"string_split_regex({col}, '\\s+')"

    def hash60(self, expr: str) -> str:
        """Deterministic cross-engine 60-bit hash: first 15 hex chars of md5."""
        if self.is_spark:
            return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"
        return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


SPARK = _Dialect(True)
DUCK = _Dialect(False)


def _both(template: Callable[[_Dialect], str]) -> Q:
    return Q(spark=template(SPARK), oracle=template(DUCK))


# ---------------------------------------------------------------------------
# the battery
# ---------------------------------------------------------------------------
RELATIONAL: dict[str, Q] = {}


def _q(name: str, q: Q) -> None:
    assert name not in RELATIONAL, name
    RELATIONAL[name] = q


# ---- TPC-H-style analytics -------------------------------------------------
_q(
    "q1_pricing_summary",
    Q(
        spark="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                                        AS sum_qty,
               round(sum(l_extendedprice), 2)                                   AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
               round(avg(l_quantity), 4)                                        AS avg_qty,
               round(avg(l_extendedprice), 4)                                   AS avg_price,
               round(avg(l_discount), 6)                                        AS avg_disc,
               count(*)                                                         AS count_order
        FROM lineitem
        WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """,
        oracle=None,  # same text — filled by _selfsame below
        doc="TPC-H Q1 pricing summary over lineitem",
    ),
)

# q3 as a DataFrame-DSL implementation (exercises the DataFrame API path)
def _q3_spark(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import functions as F

    t = load_tables(spark, sf)
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            F.col("l_orderkey"),
            F.unix_timestamp("o_orderdate").alias("o_orderdate_epoch"),
            F.col("revenue"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


_q("q3_shipping_priority", Q(
    spark=_q3_spark,
    oracle="""
        SELECT l_orderkey,
               epoch(o_orderdate)::BIGINT AS o_orderdate_epoch,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < timestamp '1998-03-15 00:00:00'
          AND l_shipdate  > timestamp '1995-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey LIMIT 10
        """,
    doc="TPC-H Q3 shipping priority — DataFrame DSL with broadcast-eligible dims",
))

_q(
    "q5_local_supplier_volume",
    Q(
        spark="""
        SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
          JOIN orders   ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          JOIN nation   ON s_nationkey = n_nationkey
          JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= timestamp '1996-01-01 00:00:00'
          AND o_orderdate <  timestamp '1998-01-01 00:00:00'
        GROUP BY n_name
        """,
        oracle=None,
        doc="TPC-H Q5 six-way join with region filter",
    ),
)

_q(
    "q6_revenue_forecast",
    Q(
        spark="""
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= timestamp '1996-01-01 00:00:00'
          AND l_shipdate <  timestamp '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
        """,
        oracle=None,
        doc="TPC-H Q6 sargable conjunctive filter + global agg",
    ),
)

_q(
    "q10_returned_items",
    Q(
        spark="""
        SELECT c_custkey, c_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               n_name
        FROM customer
          JOIN orders   ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= timestamp '1996-10-01 00:00:00'
          AND o_orderdate <  timestamp '1997-01-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20
        """,
        oracle=None,
        doc="TPC-H Q10 returned-item ranking",
    ),
)

_q(
    "q12_ship_priority_count",
    Q(
        spark="""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
        """,
        oracle=None,
        doc="TPC-H Q4-style EXISTS semi-join + count per priority",
    ),
)

_q(
    "q14_promo_revenue",
    Q(
        spark="""
        SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0.0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= timestamp '1996-06-01 00:00:00'
          AND l_shipdate <  timestamp '1996-07-01 00:00:00'
        """,
        oracle=None,
        doc="TPC-H Q14 conditional aggregation over a join",
    ),
)

_q(
    "q18_large_orders",
    Q(
        spark="""
        SELECT c_custkey, o_orderkey, round(t.sum_qty, 2) AS sum_qty, round(o_totalprice, 2) AS total
        FROM orders
          JOIN customer ON c_custkey = o_custkey
          JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
                FROM lineitem GROUP BY l_orderkey
                HAVING sum(l_quantity) > 150) t
            ON o_orderkey = t.l_orderkey
        ORDER BY total DESC, o_orderkey LIMIT 50
        """,
        oracle=None,
        doc="TPC-H Q18 HAVING subquery join-back",
    ),
)

_q(
    "q19_disjunctive_predicates",
    Q(
        spark="""
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, count(*) AS n
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1  AND l_quantity <= 21)
           OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 30)
           OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 40)
        """,
        oracle=None,
        doc="TPC-H Q19 disjunction-of-conjunctions pushdown (reference OR-distribution analog, ScanPredClassifier.scala:85-105)",
    ),
)

# ---- point / predicate surface (reference TpcMiniTestSuite analogs) -------
_q(
    "point_lookup_full_key",
    Q(
        spark="""
        SELECT l_orderkey, l_linenumber, l_quantity, round(l_extendedprice, 2) AS price
        FROM lineitem WHERE l_orderkey = 42 AND l_linenumber = 1
        """,
        oracle=None,
        doc="Full-composite-key point query (reference Tpc Query 1, HBaseTpcMiniTestSuite.scala:152-158)",
    ),
)

_q(
    "pred_range_scan",
    Q(
        spark="""
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem WHERE l_orderkey BETWEEN 100 AND 120
        """,
        oracle=None,
        doc="Leading-key range scan (region/row-group pruned)",
    ),
)

_q(
    "pred_in_inset",
    Q(
        spark="""
        SELECT l_returnflag, count(*) AS n, CAST(sum(l_linenumber) AS BIGINT) AS sum_ln
        FROM lineitem
        WHERE l_linenumber IN (1, 3, 5, 7) AND l_returnflag IN ('A', 'R')
        GROUP BY l_returnflag
        """,
        oracle=None,
        doc="IN-list / InSet predicates (reference Tpc Queries 14-19)",
    ),
)

_q(
    "pred_like_patterns",
    Q(
        spark="""
        SELECT count(*) AS n_like, CAST(sum(CASE WHEN p_name NOT LIKE '%ivory%' THEN 1 ELSE 0 END) AS BIGINT) AS n_not
        FROM part WHERE p_name LIKE '%al%' OR p_name LIKE 'azure%'
        """,
        oracle=None,
        doc="LIKE / NOT LIKE patterns (HBaseSQLQuerySuite LIKE coverage)",
    ),
)

_q(
    "pred_between_not_between",
    Q(
        spark="""
        SELECT CAST(count(*) AS BIGINT) AS n_between,
               CAST(sum(CASE WHEN p_size NOT BETWEEN 10 AND 40 THEN 1 ELSE 0 END) AS BIGINT) AS n_not_between
        FROM part WHERE p_retailprice BETWEEN 1200 AND 1400
        """,
        oracle=None,
        doc="BETWEEN / NOT BETWEEN",
    ),
)

_q(
    "pred_is_null_semantics",
    Q(
        spark="""
        SELECT count(*) AS n_rows,
               CAST(sum(CASE WHEN nullif(o_orderstatus, 'P') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
               CAST(sum(CASE WHEN nullif(o_orderstatus, 'P') IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_not_null,
               count(nullif(o_orderstatus, 'P')) AS count_skips_nulls
        FROM orders
        """,
        oracle=None,
        doc="IS NULL / IS NOT NULL / agg-null-skipping (reference null-cell semantics, Tpc Queries 28-32)",
    ),
)

_null_safe = lambda d: f"""
        SELECT count(*) AS n_eq
        FROM orders o1 JOIN orders o2 ON o1.o_orderkey = o2.o_orderkey
        WHERE {d.null_safe_eq("nullif(o1.o_orderstatus,'P')", "nullif(o2.o_orderstatus,'P')")}
        """
_q(
    "pred_null_safe_eq",
    Q(spark=_null_safe(SPARK), oracle=_null_safe(DUCK),
      doc="null-safe equality <=> (HBaseSQLQuerySuite.scala:693-708)"),
)

_q(
    "pred_complex_boolean",
    Q(
        spark="""
        SELECT count(*) AS n
        FROM lineitem
        WHERE (l_returnflag = 'A' AND NOT (l_linenumber = 3))
           OR (l_quantity > 45 AND (l_discount < 0.02 OR l_tax > 0.06))
        """,
        oracle=None,
        doc="AND/OR/NOT mix — NotPusher / BooleanSimplification territory (catalyst/NotPusher.scala:26-42)",
    ),
)

_q(
    "pred_non_sargable",
    Q(
        spark="""
        SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_orderkey + 0 = 350
        """,
        oracle=None,
        doc="Non-sargable key predicate degrades to scan (reference Tpc Query 27, HBaseTpcMiniTestSuite.scala:328-332)",
    ),
)

# ---- joins -----------------------------------------------------------------
_q(
    "join_inner_where_syntax",
    Q(
        spark="""
        SELECT n_name, r_name, count(*) AS n_cust
        FROM customer, nation, region
        WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        GROUP BY n_name, r_name
        """,
        oracle=None,
        doc="comma-join + WHERE equi predicates (HBaseSQLQuerySuite.scala:321-439)",
    ),
)

_q(
    "join_left_outer",
    Q(
        spark="""
        SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_totalprice > 400000
        GROUP BY c_custkey
        """,
        oracle=None,
        doc="LEFT OUTER JOIN with join-condition filter (null-extending)",
    ),
)

_q(
    "join_right_outer",
    Q(
        spark="""
        SELECT n_name, count(c_custkey) AS n_cust
        FROM customer RIGHT OUTER JOIN nation ON c_nationkey = n_nationkey AND c_acctbal > 9000
        GROUP BY n_name
        """,
        oracle=None,
        doc="RIGHT OUTER JOIN",
    ),
)

_q(
    "join_full_outer",
    Q(
        spark="""
        SELECT coalesce(a.k, b.k) AS k, a.n AS an, b.n AS bn
        FROM (SELECT l_returnflag AS k, count(*) AS n FROM lineitem WHERE l_linenumber = 1 GROUP BY l_returnflag) a
        FULL OUTER JOIN (SELECT o_orderstatus AS k, count(*) AS n FROM orders GROUP BY o_orderstatus) b
          ON a.k = b.k
        """,
        oracle=None,
        doc="FULL OUTER JOIN over disjoint key domains",
    ),
)

_q(
    "join_left_semi",
    Q(
        spark="""
        SELECT count(*) AS n FROM part
        WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 48)
        """,
        oracle=None,
        doc="LEFT SEMI join via EXISTS",
    ),
)

_q(
    "join_anti",
    Q(
        spark="""
        SELECT count(*) AS n FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        oracle=None,
        doc="LEFT ANTI join via NOT EXISTS",
    ),
)

_q(
    "join_non_equi_semi",
    Q(
        spark="""
        SELECT s_suppkey, s_acctbal FROM supplier s
        WHERE EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_nationkey = s.s_nationkey AND s.s_acctbal >= c.c_acctbal + 2)
        ORDER BY s_suppkey
        """,
        oracle=None,
        doc="non-equi LEFT SEMI (reference HBaseSQLQuerySuite.scala:911-952 x.a >= y.a + 2)",
    ),
)

_q(
    "join_cross",
    Q(
        spark="""
        SELECT r1.r_name AS a, r2.r_name AS b
        FROM region r1 CROSS JOIN region r2 WHERE r1.r_regionkey <> r2.r_regionkey
        """,
        oracle=None,
        doc="CROSS JOIN (small×small)",
    ),
)


def _join_broadcast_spark(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import functions as F

    t = load_tables(spark, sf)
    # explicit broadcast of both dimension tables — at 100 TB the fact side
    # never shuffles for this star join
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), t["customer"].c_nationkey == t["nation"].n_nationkey)
        .join(F.broadcast(t["region"]), t["nation"].n_regionkey == t["region"].r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        )
    )


_q(
    "join_broadcast_star",
    Q(
        spark=_join_broadcast_spark,
        oracle="""
        SELECT r_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        """,
        doc="star join with explicit broadcast() of dims — DataFrame DSL",
    ),
)

# ---- aggregation -----------------------------------------------------------
_q(
    "agg_basic_stats",
    Q(
        spark="""
        SELECT l_returnflag,
               count(*) AS n,
               round(sum(l_quantity), 2) AS sum_q,
               round(avg(l_extendedprice), 4) AS avg_p,
               round(min(l_discount), 2) AS min_d,
               round(max(l_tax), 2) AS max_t
        FROM lineitem GROUP BY l_returnflag
        """,
        oracle=None,
        doc="COUNT/SUM/AVG/MIN/MAX (HBaseAggregateQueriesSuite)",
    ),
)

_q(
    "agg_count_distinct",
    Q(
        spark="""
        SELECT l_returnflag,
               count(DISTINCT l_suppkey) AS nd_supp,
               count(DISTINCT l_partkey * 1000 + l_suppkey) AS nd_pair
        FROM lineitem GROUP BY l_returnflag
        """,
        oracle=None,
        doc="COUNT(DISTINCT), multi-col via keypair encoding (HBaseSQLQuerySuite.scala:275-319)",
    ),
)

# approx: engines use different HLL sketches, so the sketch VALUE has no
# oracle — instead the Spark side emits a deterministic rsd-derived
# tolerance verdict (|apx − exact| ≤ 4·rsd·exact; Spark's HLL++ is
# deterministic) next to the exact count, which DuckDB can hash-check
# (VERDICT r1 next-step #8; reference APPROXIMATE COUNT DISTINCT,
# HBaseTpcMiniTestSuite.scala:188-243 / HBaseSQLQuerySuite.scala:1000-1005)
_q(
    "agg_approx_count_distinct",
    Q(
        spark="""
        SELECT count(DISTINCT l_partkey) AS exact_nd,
               abs(approx_count_distinct(l_partkey, 0.02) - count(DISTINCT l_partkey))
                 <= 0.08 * count(DISTINCT l_partkey) AS within_tolerance
        FROM lineitem
        """,
        oracle="""
        SELECT count(DISTINCT l_partkey) AS exact_nd, TRUE AS within_tolerance
        FROM lineitem
        """,
        doc="APPROXIMATE COUNT DISTINCT graded via rsd tolerance against the exact count",
    ),
)

_q(
    "agg_stats_advanced",
    Q(
        spark="""
        SELECT round(stddev_samp(l_extendedprice), 2) AS sd,
               round(var_samp(l_quantity), 4) AS vr,
               round(corr(l_quantity, l_extendedprice), 6) AS cr,
               round(covar_samp(l_quantity, l_extendedprice), 2) AS cv
        FROM lineitem
        """,
        oracle=None,
        doc="stddev/variance/corr/covar",
    ),
)

_q(
    "agg_median",
    _both(
        lambda d: f"""
        SELECT l_returnflag, round({d.median('l_extendedprice')}, 6) AS med_price
        FROM lineitem GROUP BY l_returnflag
        """
    ),
)

_q(
    "agg_group_by_expr",
    Q(
        spark="""
        SELECT l_linenumber % 3 AS ln_mod, count(*) AS n,
               round(sum(l_quantity), 2) AS sq
        FROM lineitem GROUP BY l_linenumber % 3
        """,
        oracle=None,
        doc="GROUP BY computed expression (HBaseAggregateQueriesSuite.scala:22-93 col1+col3 analog)",
    ),
)

_q(
    "agg_having",
    Q(
        spark="""
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY l_partkey HAVING count(*) >= 45
        """,
        oracle=None,
        doc="HAVING filter on aggregate",
    ),
)

_q(
    "agg_rollup",
    Q(
        spark="""
        SELECT l_returnflag, l_linestatus, grouping(l_returnflag) AS g1, grouping(l_linestatus) AS g2,
               count(*) AS n
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        oracle=None,
        doc="ROLLUP + grouping() — beyond reference surface (SURVEY §2.2 'absent'), native in modern Spark",
    ),
)

_q(
    "agg_cube",
    Q(
        spark="""
        SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS sq
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        """,
        oracle=None,
        doc="CUBE multi-dimensional aggregate",
    ),
)

_q(
    "agg_grouping_sets",
    Q(
        spark="""
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """,
        oracle=None,
        doc="GROUPING SETS",
    ),
)

_q(
    "agg_pivot_conditional",
    Q(
        spark="""
        SELECT l_returnflag,
               CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
               CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
               round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0.0 END), 2) AS q_open
        FROM lineitem GROUP BY l_returnflag
        """,
        oracle=None,
        doc="pivot via conditional aggregation",
    ),
)

# ---- sort / limit / set ops ------------------------------------------------
_q(
    "order_multi_col",
    Q(
        spark="""
        SELECT p_brand, p_size, round(p_retailprice, 2) AS price
        FROM part ORDER BY p_brand ASC, p_size DESC, price ASC, p_partkey LIMIT 30
        """,
        oracle=None,
        doc="multi-column ORDER BY asc/desc + LIMIT (HBaseSQLQuerySuite.scala:205-273)",
    ),
)

_q(
    "limit_offset",
    Q(
        spark="""
        SELECT o_orderkey, round(o_totalprice, 2) AS total
        FROM orders ORDER BY o_orderkey LIMIT 25 OFFSET 100
        """,
        oracle=None,
        doc="LIMIT ... OFFSET (modern-Spark extension)",
    ),
)

_q(
    "setop_union_distinct",
    Q(
        spark="""
        SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9990
        UNION
        SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 9990
        """,
        oracle=None,
        doc="UNION dedupes (HBaseSQLQuerySuite.scala:521-574)",
    ),
)

_q(
    "setop_union_all",
    Q(
        spark="""
        SELECT l_orderkey AS k FROM lineitem WHERE l_quantity > 49
        UNION ALL
        SELECT o_orderkey AS k FROM orders WHERE o_totalprice > 450000
        """,
        oracle=None,
        doc="UNION ALL keeps duplicates",
    ),
)

_q(
    "setop_except",
    Q(
        spark="""
        SELECT c_nationkey AS k FROM customer
        EXCEPT
        SELECT s_nationkey AS k FROM supplier
        """,
        oracle=None,
        doc="EXCEPT (distinct semantics)",
    ),
)

_q(
    "setop_intersect",
    Q(
        spark="""
        SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
        INTERSECT
        SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 9000
        """,
        oracle=None,
        doc="INTERSECT",
    ),
)

# ---- scalar functions ------------------------------------------------------
_q(
    "fn_string_suite",
    Q(
        spark="""
        SELECT p_partkey,
               upper(p_brand) AS up, lower(p_type) AS lo,
               substring(p_name, 1, 5) AS sub,
               length(p_name) AS len,
               trim(concat('  ', p_brand, '  ')) AS trimmed,
               replace(p_brand, 'Brand#', 'B') AS repl,
               reverse(p_type) AS rev,
               lpad(CAST(p_size AS STRING), 4, '0') AS padded
        FROM part WHERE p_partkey <= 200 ORDER BY p_partkey
        """,
        oracle="""
        SELECT p_partkey,
               upper(p_brand) AS up, lower(p_type) AS lo,
               substring(p_name, 1, 5) AS sub,
               length(p_name) AS len,
               trim(concat('  ', p_brand, '  ')) AS trimmed,
               replace(p_brand, 'Brand#', 'B') AS repl,
               reverse(p_type) AS rev,
               lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded
        FROM part WHERE p_partkey <= 200 ORDER BY p_partkey
        """,
        doc="UPPER/LOWER/SUBSTR/LENGTH/TRIM/CONCAT/REPLACE/REVERSE/LPAD",
    ),
)

_q(
    "fn_math_suite",
    Q(
        spark="""
        SELECT l_orderkey, l_linenumber,
               abs(l_quantity - 25)                    AS a,
               floor(sqrt(l_extendedprice) * 1e4)      AS sq,
               floor(l_extendedprice / 100)            AS fl,
               ceil(l_discount * 100)                  AS ce,
               CAST(l_orderkey % 7 AS BIGINT)          AS md,
               floor(power(l_tax + 1, 2) * 1e6)        AS pw,
               floor(ln(l_extendedprice + 1) * 1e4)    AS lg,
               floor(exp(l_discount) * 1e4)            AS ex,
               sign(l_quantity - 25.0)                 AS sg
        FROM lineitem WHERE l_orderkey <= 60 ORDER BY l_orderkey, l_linenumber
        """,
        oracle="""
        SELECT l_orderkey, l_linenumber,
               abs(l_quantity - 25)                    AS a,
               floor(sqrt(l_extendedprice) * 1e4)      AS sq,
               floor(l_extendedprice / 100)            AS fl,
               ceil(l_discount * 100)                  AS ce,
               CAST(l_orderkey % 7 AS BIGINT)          AS md,
               floor(power(l_tax + 1, 2) * 1e6)        AS pw,
               floor(ln(l_extendedprice + 1) * 1e4)    AS lg,
               floor(exp(l_discount) * 1e4)            AS ex,
               CAST(sign(l_quantity - 25.0) AS DOUBLE) AS sg
        FROM lineitem WHERE l_orderkey <= 60 ORDER BY l_orderkey, l_linenumber
        """,
        doc="ABS/SQRT/FLOOR/CEIL/MOD/POWER/LN/EXP/SIGN (HBaseSQLQuerySuite.scala:69-112)",
    ),
)

_q(
    "fn_bitwise",
    _both(
        lambda d: f"""
        SELECT l_orderkey,
               CAST(l_orderkey & 255 AS BIGINT)  AS band,
               CAST(l_orderkey | 16 AS BIGINT)   AS bor,
               CAST({d.xor('l_orderkey', 'l_linenumber')} AS BIGINT) AS bxor,
               CAST(~l_orderkey AS BIGINT)       AS bnot,
               CAST({d.shiftleft('l_linenumber', 3)} AS BIGINT)  AS shl,
               CAST({d.shiftright('l_orderkey', 2)} AS BIGINT)   AS shr
        FROM lineitem WHERE l_orderkey <= 40 ORDER BY l_orderkey, l_linenumber
        """
    ),
)

_q(
    "fn_datetime",
    _both(
        lambda d: f"""
        SELECT o_orderkey,
               year(o_orderdate)    AS y,
               month(o_orderdate)   AS m,
               day(o_orderdate)     AS dd,
               quarter(o_orderdate) AS q,
               {d.epoch("date_trunc('month', o_orderdate)")} AS month_start_epoch,
               {d.day_diff('o_orderdate', "timestamp '1995-01-01 00:00:00'")} AS days_since
        FROM orders WHERE o_orderkey <= 300 ORDER BY o_orderkey
        """
    ),
)

_q(
    "fn_conditional",
    Q(
        spark="""
        SELECT o_orderkey,
               CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'filled' ELSE 'other' END AS status_word,
               CASE WHEN o_totalprice > 300000 THEN 'big' WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket,
               coalesce(nullif(o_orderstatus, 'P'), 'pending') AS coal,
               greatest(o_totalprice, 100000.0) AS gr,
               least(o_custkey, o_orderkey) AS le
        FROM orders WHERE o_orderkey <= 400 ORDER BY o_orderkey
        """,
        oracle=None,
        doc="CASE WHEN (both forms) / COALESCE / NULLIF / GREATEST / LEAST (HBaseSQLQuerySuite.scala:748-758)",
    ),
)

_q(
    "fn_cast",
    Q(
        spark="""
        SELECT l_orderkey,
               CAST(l_quantity AS BIGINT) AS q_int,
               CAST(l_orderkey AS STRING) AS k_str,
               CAST(CAST(l_orderkey AS STRING) AS BIGINT) AS k_back,
               CAST(floor(l_extendedprice) AS BIGINT) AS p_floor,
               CAST(l_returnflag = 'R' AS STRING) AS flag_str
        FROM lineitem WHERE l_orderkey <= 50 ORDER BY l_orderkey, l_linenumber
        """,
        oracle="""
        SELECT l_orderkey,
               CAST(l_quantity AS BIGINT) AS q_int,
               CAST(l_orderkey AS VARCHAR) AS k_str,
               CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) AS k_back,
               CAST(floor(l_extendedprice) AS BIGINT) AS p_floor,
               CAST(l_returnflag = 'R' AS VARCHAR) AS flag_str
        FROM lineitem WHERE l_orderkey <= 50 ORDER BY l_orderkey, l_linenumber
        """,
        doc="explicit casts incl. bool→string (HBaseSQLQuerySuite.scala:710-715,810-826); l_quantity is integral-valued so double→bigint is exact",
    ),
)

# ---- window functions (modern-Spark extension; absent in reference) --------
_q(
    "win_topk_per_group",
    Q(
        spark="""
        SELECT * FROM (
          SELECT l_returnflag, l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price,
                 row_number() OVER (PARTITION BY l_returnflag
                                    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
          FROM lineitem) t
        WHERE rn <= 3
        """,
        oracle=None,
        doc="top-K per group via row_number window",
    ),
)

_q(
    "win_running_sum",
    Q(
        spark="""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               round(sum(l_quantity) OVER (PARTITION BY l_suppkey
                                           ORDER BY l_shipdate, l_orderkey, l_linenumber
                                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
        FROM lineitem WHERE l_suppkey <= 10
        """,
        oracle=None,
        doc="running aggregate window",
    ),
)

_q(
    "win_lag_lead",
    Q(
        spark="""
        SELECT o_custkey, o_orderkey,
               round(o_totalprice - lag(o_totalprice) OVER w, 2)  AS delta_prev,
               round(lead(o_totalprice) OVER w, 2)                AS next_price
        FROM orders WHERE o_custkey <= 40
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        """,
        oracle=None,
        doc="lag/lead with named window",
    ),
)

_q(
    "win_rank_ntile",
    Q(
        spark="""
        SELECT p_brand, p_partkey,
               rank()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rk,
               dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS drk,
               ntile(4)     OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey) AS quartile
        FROM part WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
        """,
        oracle=None,
        doc="rank/dense_rank/ntile",
    ),
)

# ---- subqueries / CTE ------------------------------------------------------
_q(
    "sub_scalar",
    Q(
        spark="""
        SELECT count(*) AS n_above
        FROM orders WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        """,
        oracle=None,
        doc="scalar subquery in WHERE",
    ),
)

_q(
    "sub_in",
    Q(
        spark="""
        SELECT count(*) AS n
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 50)
        """,
        oracle=None,
        doc="IN subquery",
    ),
)

_q(
    "sub_correlated",
    Q(
        spark="""
        SELECT o_custkey, count(*) AS n_big
        FROM orders o
        WHERE o_totalprice > (SELECT 1.5 * avg(o2.o_totalprice) FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
        GROUP BY o_custkey
        """,
        oracle=None,
        doc="correlated scalar subquery",
    ),
)

_q(
    "cte_multi",
    Q(
        spark="""
        WITH big_orders AS (
          SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_totalprice > 350000
        ), cust_nations AS (
          SELECT c_custkey, n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
        )
        SELECT n_name, count(*) AS n, round(sum(o_totalprice), 2) AS vol
        FROM big_orders JOIN cust_nations ON o_custkey = c_custkey
        GROUP BY n_name
        """,
        oracle=None,
        doc="multi-CTE join (CTE stub in reference parser, HBaseSQLParser.scala:63)",
    ),
)

_q(
    "distinct_projection",
    Q(
        spark="""
        SELECT DISTINCT l_returnflag, l_linestatus, l_linenumber FROM lineitem
        """,
        oracle=None,
        doc="SELECT DISTINCT",
    ),
)

# ---- events (time-series) --------------------------------------------------
_q(
    "events_tumbling_window",
    _both(
        lambda d: f"""
        SELECT CAST(floor({d.epoch('ts')} / 300) * 300 AS BIGINT) AS bucket_start,
               event_type,
               count(*) AS n,
               round(sum(value), 2) AS sum_v
        FROM events
        GROUP BY 1, 2
        """
    ),
)

_q(
    "events_sessionize",
    _both(
        lambda d: f"""
        WITH gaps AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN {d.epoch('ts')} - lag({d.epoch('ts')})
                      OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                      THEN 1 ELSE 0 END AS new_sess
          FROM events
        ), sessions AS (
          SELECT user_id,
                 CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
          FROM gaps
        )
        SELECT user_id, sess_id, count(*) AS n_events
        FROM sessions GROUP BY user_id, sess_id
        """
    ),
)

_q(
    "events_json_extract",
    _both(
        lambda d: f"""
        SELECT event_type,
               CAST(sum({d.json_int('props', 'k')}) AS BIGINT) AS sum_k,
               count(*) AS n
        FROM events GROUP BY event_type
        """
    ),
)

_q(
    "events_topk_per_type",
    Q(
        spark="""
        SELECT * FROM (
          SELECT event_type, event_id, user_id, round(value, 4) AS v,
                 row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
          FROM events) t
        WHERE rn <= 5
        """,
        oracle=None,
        doc="top-K events per type",
    ),
)

_q(
    "events_gapfill",
    _both(
        lambda d: f"""
        WITH agg AS (
          SELECT CAST(floor({d.epoch('ts')} / 3600) AS BIGINT) AS hb, event_type,
                 count(*) AS n,
                 sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v_fp
          FROM events GROUP BY 1, 2
        ), bounds AS (
          SELECT min(hb) AS lo, max(hb) AS hi FROM agg
        ), grid AS (
          SELECT {"explode(sequence(lo, hi))" if d.is_spark else "unnest(range(lo, hi + 1))"} AS hb
          FROM bounds
        ), types AS (
          SELECT DISTINCT event_type FROM events
        )
        SELECT g.hb AS bucket, t.event_type,
               coalesce(a.n, 0) AS n,
               coalesce(a.v_fp, 0) AS v_fp,
               CASE WHEN a.n IS NULL THEN 1 ELSE 0 END AS gap
        FROM grid g CROSS JOIN types t
        LEFT JOIN agg a ON a.hb = g.hb AND a.event_type = t.event_type
        """
    ),
)


# ---------------------------------------------------------------------------
# remaining TPC-H-style queries, adapted to the reduced driver schema
# (no partsupp table, no commit/receipt dates, no phone column) — the
# driver's tables are TPC-H-ish; adaptations keep each query's plan
# shape (exists/anti joins, correlated scalar aggs, left-outer count
# distribution, CTE + scalar-subquery max)
# ---------------------------------------------------------------------------
_q(
    "q4_order_priority",
    Q(
        spark="""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        """,
        oracle=None,
        doc="TPC-H Q4 (EXISTS semi-join; late-ship stands in for late-commit)",
    ),
)

_q(
    "q7_volume_shipping",
    Q(
        spark="""
        SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l_shipdate) AS BIGINT) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier, lineitem, orders, customer, nation n1, nation n2
          WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
            AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
            AND c_nationkey = n2.n_nationkey
            AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
              OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
            AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
        """,
        oracle=None,
        doc="TPC-H Q7 bi-national volume (two nation dims, year bucketing)",
    ),
)

_q(
    "q8_market_share",
    Q(
        spark="""
        SELECT o_year,
               round(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)
                     / sum(volume), 4) AS mkt_share
        FROM (
          SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 l_extendedprice * (1 - l_discount) AS volume,
                 n2.n_name AS nation
          FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
          WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
            AND l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
            AND r_name = 'EUROPE' AND s_nationkey = n2.n_nationkey
            AND p_type = 'ECONOMY'
        ) all_nations
        GROUP BY o_year
        """,
        oracle=None,
        doc="TPC-H Q8 market share (8-table join, conditional aggregation)",
    ),
)

_q(
    "q13_customer_distribution",
    Q(
        spark="""
        SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
        """,
        oracle=None,
        doc="TPC-H Q13 order-count distribution (outer join with join-side filter)",
    ),
)

_q(
    "q15_top_supplier",
    Q(
        spark="""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier, revenue
        WHERE s_suppkey = supplier_no
          AND total_revenue = (SELECT max(total_revenue) FROM revenue)
        """,
        oracle=None,
        doc="TPC-H Q15 top supplier (CTE reuse + scalar-subquery max)",
    ),
)

_q(
    "q17_small_qty_revenue",
    Q(
        spark="""
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem, part
        WHERE p_partkey = l_partkey AND p_brand = 'Brand#13'
          AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                            FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        """,
        oracle=None,
        doc="TPC-H Q17 small-quantity revenue (correlated scalar aggregate)",
    ),
)

_q(
    "q21_waiting_suppliers",
    Q(
        spark="""
        SELECT s_name, count(*) AS numwait
        FROM supplier, lineitem l1, orders, nation
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_shipdate = (SELECT max(l2.l_shipdate) FROM lineitem l2
                               WHERE l2.l_orderkey = l1.l_orderkey)
          AND EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
          AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
        GROUP BY s_name
        """,
        oracle=None,
        doc="TPC-H Q21 waiting suppliers (correlated max + EXISTS; last-ship "
        "stands in for late-receipt)",
    ),
)

_q(
    "q22_global_sales",
    Q(
        spark="""
        SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
        FROM (
          SELECT CAST(c_nationkey % 10 AS BIGINT) AS cntrycode, c_acctbal
          FROM customer
          WHERE c_nationkey % 10 IN (1, 3, 5, 7)
            AND c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
            AND NOT EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey
                              AND o_orderpriority = '1-URGENT')
        ) custsale
        GROUP BY cntrycode
        """,
        oracle=None,
        doc="TPC-H Q22 (anti-join + uncorrelated scalar avg; nationkey stands in "
        "for phone country code, no-urgent-orders for never-ordered — the "
        "driver data gives every customer orders)",
    ),
)


# ---- partsupp-family TPC-H queries over a DERIVED partsupp -----------------
# The driver testdata ships no partsupp table; q2/q9/q11/q16/q20 are the
# TPC-H queries that need one.  Both engines derive the SAME deterministic
# partsupp from lineitem's distinct (l_partkey, l_suppkey) pairs — exactly
# the pairs the fact table joins on, so the q9/q20 joins are dense — with
# availqty/supplycost as fixed integer-arithmetic functions of the keys.
# This grades the full query shapes (correlated min-subquery, HAVING vs
# scalar total, NOT IN, nested correlated sum) against DuckDB with zero
# synthetic input files.
_PS_CTE = """partsupp AS (
          SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                 (l_partkey * 7 + l_suppkey * 11) % 9999 + 1 AS ps_availqty,
                 CAST((l_partkey * 31 + l_suppkey * 17) % 100000 AS DOUBLE) / 100.0 + 1.0
                   AS ps_supplycost
          FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
        )"""

_q(
    "q2_min_cost_supplier",
    Q(
        spark=f"""
        WITH {_PS_CTE}
        SELECT s_acctbal, s_name, n_name, p_partkey, ps_supplycost
        FROM part, supplier, partsupp, nation, region
        WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
          AND p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
          AND ps_supplycost = (
            SELECT min(ps2.ps_supplycost)
            FROM partsupp ps2, supplier s2, nation n2, region r2
            WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
              AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
              AND r2.r_name = 'EUROPE')
        """,
        oracle=None,
        doc="TPC-H Q2 minimum-cost supplier (correlated scalar-min subquery "
        "over the derived partsupp; adapted: driver part has no p_mfgr)",
    ),
)

_q(
    "q9_product_type_profit",
    Q(
        spark=f"""
        WITH {_PS_CTE}
        SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
        FROM (
          SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity AS amount
          FROM part, supplier, lineitem, partsupp, orders, nation
          WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
            AND ps_partkey = l_partkey AND p_partkey = l_partkey
            AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
            AND p_name LIKE '%red%'
        ) profit
        GROUP BY nation, o_year
        """,
        oracle=None,
        doc="TPC-H Q9 product-type profit (6-way join through the derived "
        "partsupp on the composite (partkey, suppkey))",
    ),
)

_q(
    "q11_important_stock",
    Q(
        spark=f"""
        WITH {_PS_CTE}
        SELECT ps_partkey, round(sum(ps_supplycost * ps_availqty), 2) AS val
        FROM partsupp, supplier, nation
        WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_name = 'NATION_3'
        GROUP BY ps_partkey
        HAVING sum(ps_supplycost * ps_availqty) > (
          SELECT sum(ps_supplycost * ps_availqty) * 0.001
          FROM partsupp, supplier, nation
          WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
            AND n_name = 'NATION_3')
        """,
        oracle=None,
        doc="TPC-H Q11 important stock (HAVING against an uncorrelated "
        "scalar fraction-of-total subquery)",
    ),
)

_q(
    "q16_supplier_part_count",
    Q(
        spark=f"""
        WITH {_PS_CTE}
        SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
        FROM partsupp, part
        WHERE p_partkey = ps_partkey
          AND p_brand <> 'Brand#1' AND p_type NOT LIKE 'MEDIUM%'
          AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
          AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        """,
        oracle=None,
        doc="TPC-H Q16 supplier-part counts (NOT IN null-safe anti-semantics; "
        "negative acctbal stands in for the complaints filter — driver "
        "supplier has no comment column)",
    ),
)

_q(
    "q20_excess_availability",
    Q(
        spark=f"""
        WITH {_PS_CTE}
        SELECT s_name, n_name
        FROM supplier, nation
        WHERE s_suppkey IN (
            SELECT ps_suppkey FROM partsupp
            WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'b%')
              AND ps_availqty > (
                SELECT 0.5 * sum(l_quantity) FROM lineitem
                WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
                  AND l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1997-01-01'))
          AND s_nationkey = n_nationkey AND n_name = 'NATION_5'
        """,
        oracle=None,
        doc="TPC-H Q20 excess availability (IN-subquery chain with a "
        "doubly-nested correlated sum over the shipping year)",
    ),
)


# complex types: array build/index/size + struct field access over temp
# arrays (reference exercises these on temp tables only,
# HBaseSQLQuerySuite.scala:157-178,612-691)
_q(
    "complex_types_array_struct",
    _both(
        lambda d: f"""
        WITH per_order AS (
          SELECT l_orderkey,
                 {d.arr_get('array_agg_sorted', 1)} AS first_qty,
                 {d.arr_len('array_agg_sorted')} AS n_lines
          FROM (
            SELECT l_orderkey,
                   {'sort_array(collect_list(l_quantity))' if d.is_spark
                    else 'list_sort(list(l_quantity))'} AS array_agg_sorted
            FROM lineitem WHERE l_orderkey <= 1000 GROUP BY l_orderkey
          ) t
        )
        SELECT l_orderkey, round(first_qty, 2) AS first_qty, n_lines
        FROM per_order
        """
    ),
)

# window frame: explicit ROWS frame moving average (modern-Spark surface)
_q(
    "win_frame_moving_avg",
    Q(
        spark="""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               round(avg(l_extendedprice) OVER (PARTITION BY l_suppkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS mov_avg
        FROM lineitem WHERE l_suppkey <= 10
        """,
        oracle=None,
        doc="explicit ROWS window frame",
    ),
)

# reference LAST aggregate (HBaseSQLQuerySuite.scala:275-319) — pinned
# deterministic as value-at-max-order
_q(
    "agg_last",
    _both(
        lambda d: f"""
        SELECT o_custkey,
               {d.max_by('o_orderstatus', 'o_orderkey')} AS last_status,
               {d.max_by('round(o_totalprice, 2)', 'o_orderkey')} AS last_price,
               count(*) AS n
        FROM orders WHERE o_custkey <= 100 GROUP BY o_custkey
        """
    ),
)


def _udf_pandas_score(spark: SparkSession, sf: str) -> DataFrame:
    """UDF surface (reference: udf.register + UDF-in-WHERE evaluated
    client-side, HBaseSQLQuerySuite.scala:741-746): an Arrow-vectorized
    pandas_udf — the modern replacement for row-at-a-time UDFs — whose
    arithmetic the oracle reproduces in SQL."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # functional form: PEP-563 string annotations (module-level
    # `from __future__ import annotations`) break hint inference
    brevity_score = F.pandas_udf(
        lambda text: (100.0 / (1.0 + text.str.len() / 100.0)).round(4),
        T.DoubleType(),
    )

    t = load_tables(spark, sf)
    return (
        t["documents"]
        .select("doc_id", brevity_score(F.col("text")).alias("score"))
        .filter(F.col("score") > 25.0)
    )


_q(
    "udf_pandas_score",
    Q(
        spark=_udf_pandas_score,
        oracle="""
        SELECT doc_id, round(100.0 / (1.0 + length(text) / 100.0), 4) AS score
        FROM documents WHERE round(100.0 / (1.0 + length(text) / 100.0), 4) > 25.0
        """,
        doc="Arrow pandas_udf projection + filter, SQL-reproducible",
    ),
)


# ---------------------------------------------------------------------------
# fill oracle = spark-sql text for the entries written once in ANSI SQL
# ---------------------------------------------------------------------------
for _name, _query in list(RELATIONAL.items()):
    if _query.oracle is None and isinstance(_query.spark, str):
        RELATIONAL[_name] = Q(spark=_query.spark, oracle=_query.spark, doc=_query.doc)
