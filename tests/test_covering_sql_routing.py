"""r15 (VERDICT r14 #6) — covering-index planner integration.

`scan_covering` existed as an API + EXPLAIN SCAN surface, but an
ordinary ``hql("SELECT col, inc FROM t WHERE col = …")`` still took the
main-table path — the engine's own SQL entry point didn't route to its
best access path.  The session's SELECT planner now tries
`AstroRelation.covering_plan` for the conservative shape
``SELECT <bare cols> FROM <bare table> WHERE <pred>`` and serves the
query index-only when the plan is sound; everything else passes through
spark.sql untouched.  Reference analog: the DDL-managed index surface
(HBaseSQLParser.scala:180-232) — an index you must query by hand is
half an index.
"""

import pytest

from spark_sql_on_hbase_spark.session import AstroSession

DDL = (
    "CREATE TABLE csr (k1 INT, status STRING, amt INT, note STRING, "
    "PRIMARY KEY (k1)) "
    "MAPPED BY (csr_ht, COLS=[status=f.s, amt=f.a, note=f.n]) OPTIONS (regions=4)"
)


@pytest.fixture()
def astro(spark, tmp_path):
    a = AstroSession(spark, str(tmp_path / "csr_wh"))
    a.sql(DDL)
    csv = tmp_path / "csr.csv"
    rows = []
    for i in range(300):
        st = "E" if i in (7, 17, 27) else "ABCD"[i % 4]
        rows.append(f"{i},{st},{i * 10},n{i}\n")
    csv.write_text("".join(rows))
    a.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE csr")
    a.sql("CREATE INDEX ON csr (status) INCLUDE (amt)")
    return a


def _index_only(df):
    files = df.inputFiles()
    return len(files) > 0 and all("idx_" in f for f in files)


def test_plain_select_routes_index_only(astro):
    df = astro.sql("SELECT k1, amt FROM csr WHERE status = 'E'")
    assert astro.last_select_route is not None
    assert astro.last_select_route.index_mode == "covering"
    assert _index_only(df), df.inputFiles()
    got = sorted((r.k1, r.amt) for r in df.collect())
    assert got == [(7, 70), (17, 170), (27, 270)]


def test_routed_result_matches_passthrough(astro):
    """Value parity: the routed frame must equal what spark.sql returns
    for the same statement (compound predicate, projection order)."""
    q = "SELECT amt, k1, status FROM csr WHERE status = 'E' AND amt > 100"
    routed = astro.sql(q)
    assert astro.last_select_route is not None
    via_spark = astro.spark.sql(q)
    assert routed.columns == via_spark.columns
    assert sorted(map(tuple, routed.collect())) == sorted(
        map(tuple, via_spark.collect())
    )


def test_routes_under_pending_upserts_via_merge(astro):
    astro.sql("UPDATE csr SET amt = 4242 WHERE k1 = 17")
    rel = astro.relation("csr")
    assert rel.needs_merge()
    df = astro.sql("SELECT k1, amt FROM csr WHERE status = 'E'")
    res = astro.last_select_route
    assert res is not None and res.index_mode == "covering" and res.index_merge
    assert _index_only(df)
    got = sorted((r.k1, r.amt) for r in df.collect())
    assert got == [(7, 70), (17, 4242), (27, 270)]


@pytest.mark.parametrize(
    "q",
    [
        # projection outside the covered set → main path
        "SELECT k1, note FROM csr WHERE status = 'E'",
        # no servable conjunct on the indexed column
        "SELECT k1, amt FROM csr WHERE amt > 100",
        # structural tails must not be swallowed into the predicate
        "SELECT k1, amt FROM csr WHERE status = 'E' ORDER BY k1",
        "SELECT status, amt FROM csr WHERE status = 'E' GROUP BY status, amt",
        "SELECT k1, amt FROM csr WHERE status = 'E' LIMIT 2",
        # star/expressions/aliases/joins are out of shape
        "SELECT * FROM csr WHERE status = 'E'",
        "SELECT k1 + 1 FROM csr WHERE status = 'E'",
        "SELECT a.k1, a.amt FROM csr a WHERE a.status = 'E'",
    ],
)
def test_ineligible_selects_pass_through_with_correct_results(astro, q):
    df = astro.sql(q)
    assert astro.last_select_route is None
    want = astro.spark.sql(q)
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, want.collect()))


def test_unknown_table_and_temp_view_pass_through(astro):
    astro.spark.range(5).selectExpr("id AS k1", "id AS amt").createOrReplaceTempView(
        "notacat"
    )
    df = astro.sql("SELECT k1, amt FROM notacat WHERE k1 > 2")
    assert astro.last_select_route is None
    assert df.count() == 2


def test_explain_scan_shows_same_routing(astro):
    out = astro.sql("EXPLAIN SCAN csr COLUMNS (k1, amt) WHERE status = 'E'")
    text = "\n".join(" ".join(str(c) for c in r) for r in out.collect())
    assert "covering" in text, text


def test_string_literal_with_keywords_still_routes(astro):
    """A predicate value containing 'order by' must not scare the
    router — the shape check is structural, the parser decides."""
    astro.sql("INSERT INTO csr VALUES (900, 'order by limit', 1, 'x')")
    df = astro.sql("SELECT k1, amt FROM csr WHERE status = 'order by limit'")
    assert astro.last_select_route is not None
    assert [(r.k1, r.amt) for r in df.collect()] == [(900, 1)]


def test_user_replaced_view_passes_through(astro):
    """r15 review: a user shadowing the catalog table's temp view must
    get spark.sql semantics — the router declines when the registered
    view no longer reads this table's physical store."""
    q = "SELECT k1, amt FROM csr WHERE status = 'E'"
    routed = astro.sql(q)
    assert astro.last_select_route is not None  # sanity: normally routes
    astro.spark.createDataFrame(
        [(1, 10, "E"), (2, 20, "F")], "k1 int, amt int, status string"
    ).createOrReplaceTempView("csr")
    df = astro.sql(q)
    assert astro.last_select_route is None  # declined → passthrough
    assert sorted((r.k1, r.amt) for r in df.collect()) == [(1, 10)]
    # restoring the catalog view resumes routing
    astro.relation("csr").register_view("csr")
    df = astro.sql(q)
    assert astro.last_select_route is not None
    assert sorted((r.k1, r.amt) for r in df.collect()) == sorted(
        (r.k1, r.amt) for r in routed.collect()
    )
