"""r15 (VERDICT r14 #8) — multi-column composite secondary indexes.

`CREATE INDEX ON t (a, b)` keys the index table (a, b, *main_keys, _g)
— Phoenix multi-column-index parity the scalar surface stopped short
of.  The leading-column machinery generalizes: servable conjuncts on a
route the scan; conjuncts on b prune the index scan's second rowkey
dimension through the ordinary CPR machinery; b-only lookups decline
with a recorded reason (the b values scatter across the index key
space).  Rows unindexable through a DEEPER column (NULL/NUL b with
indexable a) set the sticky ``deep_unindexed`` gate: leading-only
routes then decline until REINDEX re-attests, while queries carrying
null-rejecting conjuncts on every deeper column keep routing.
"""

import pytest

from spark_sql_on_hbase_spark.session import AstroSession

DDL = (
    "CREATE TABLE ci (k INT, a INT, b INT, amt INT, PRIMARY KEY (k)) "
    "MAPPED BY (ci_ht, COLS=[a=f.a, b=f.b, amt=f.m]) OPTIONS (regions=4)"
)


@pytest.fixture()
def astro(spark, tmp_path):
    s = AstroSession(spark, str(tmp_path / "ci_wh"))
    s.sql(DDL)
    csv = tmp_path / "ci.csv"
    csv.write_text(
        "".join(f"{k},{k % 10},{k % 7},{k * 100}\n" for k in range(400))
    )
    s.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE ci")
    s.sql("CREATE INDEX ON ci (a, b)")
    return s


def _expect(astro, where):
    return sorted(
        r.k for r in astro.spark.sql(f"SELECT k FROM ci WHERE {where}").collect()
    )


def test_registration_and_index_table_shape(astro):
    rel = astro.relation("ci")
    assert "a" in rel.meta.indexes
    info = rel.meta.index_info["a"]
    assert info["cols"] == ["a", "b"]
    assert info["deep_unindexed"] is False and info["clean"] is True
    idx = rel._index_relation("a")
    assert [k.name for k in sorted(idx.meta.key_columns, key=lambda k: k.order)] == [
        "a", "b", "k", "_g",
    ]


def test_route_engages_on_both_columns_and_prunes(astro):
    rel = astro.relation("ci")
    df, res = rel.scan_where("a = 3 AND b = 5")
    assert res.index_used == "a" and res.index_mode in ("augment", "semijoin")
    assert sorted(r.k for r in df.collect()) == _expect(astro, "a = 3 AND b = 5")
    # the composite probe (a AND b conjuncts) yields fewer candidates
    # than the leading column alone
    _df1, res1 = rel.scan_where("a = 3")
    assert res.index_candidates < res1.index_candidates


def test_leading_only_route_engages_when_no_deep_nulls(astro):
    rel = astro.relation("ci")
    df, res = rel.scan_where("a = 7")
    assert res.index_used == "a"
    assert sorted(r.k for r in df.collect()) == _expect(astro, "a = 7")


def test_nonleading_only_declines_with_reason(astro):
    rel = astro.relation("ci")
    df, res = rel.scan_where("b = 5")
    assert res.index_used is None
    assert res.index_declined and "non-leading" in res.index_declined
    assert sorted(r.k for r in df.collect()) == _expect(astro, "b = 5")


def test_range_on_deeper_column_composes(astro):
    rel = astro.relation("ci")
    df, res = rel.scan_where("a = 2 AND b >= 3 AND b <= 5")
    assert res.index_used == "a"
    assert sorted(r.k for r in df.collect()) == _expect(
        astro, "a = 2 AND b >= 3 AND b <= 5"
    )


def test_deep_null_gates_leading_only_until_reindex(astro):
    # a row indexable through a but NOT through b
    astro.sql("INSERT INTO ci VALUES (900, 3, NULL, 1)")
    rel = astro.relation("ci")
    info = rel.meta.index_info["a"]
    assert info["deep_unindexed"] is True
    # leading-only: declined (the NULL-b row would be missed), correct
    df, res = rel.scan_where("a = 3")
    assert res.index_used is None
    assert res.index_declined and "unindexable" in res.index_declined
    got = sorted(r.k for r in df.collect())
    assert 900 in got and got == _expect(astro, "a = 3")
    # with a null-rejecting conjunct on b the route stays sound
    df, res = rel.scan_where("a = 3 AND b = 5")
    assert res.index_used == "a"
    assert sorted(r.k for r in df.collect()) == _expect(astro, "a = 3 AND b = 5")
    # purge the bad row, REINDEX re-attests
    astro.sql("DELETE FROM ci WHERE k = 900")
    astro.sql("COMPACT TABLE ci")
    astro.sql("REINDEX TABLE ci")
    rel = astro.relation("ci")
    assert rel.meta.index_info["a"]["deep_unindexed"] is False
    df, res = rel.scan_where("a = 3")
    assert res.index_used == "a"


def test_composite_covering_include(astro, spark, tmp_path):
    s = AstroSession(spark, str(tmp_path / "ci2_wh"))
    s.sql(
        "CREATE TABLE ci2 (k INT, a INT, b INT, amt INT, PRIMARY KEY (k)) "
        "MAPPED BY (ci2_ht, COLS=[a=f.a, b=f.b, amt=f.m]) OPTIONS (regions=4)"
    )
    csv = tmp_path / "ci2.csv"
    csv.write_text(
        "".join(f"{k},{k % 10},{k % 7},{k * 100}\n" for k in range(300))
    )
    s.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE ci2")
    s.sql("CREATE INDEX ON ci2 (a, b) INCLUDE (amt)")
    rel = s.relation("ci2")
    df, res = rel.scan_covering("a = 4 AND b = 2", ["k", "a", "b", "amt"])
    assert res.index_mode == "covering"
    files = df.inputFiles()
    assert files and all("idx_" in f for f in files)
    got = sorted((r.k, r.amt) for r in df.collect())
    want = sorted(
        (r.k, r.amt)
        for r in s.spark.sql("SELECT k, amt FROM ci2 WHERE a = 4 AND b = 2").collect()
    )
    assert got == want
    # merge-on-read over the composite: upsert then covering scan
    s.sql("UPDATE ci2 SET amt = 123456 WHERE k = 42")
    rel = s.relation("ci2")
    assert rel.needs_merge()
    df, res = rel.scan_covering("a = 2 AND b = 0", ["k", "amt"])
    assert res.index_mode == "covering" and res.index_merge
    got = dict((r.k, r.amt) for r in df.collect())
    assert got[42] == 123456
    main = dict(
        (r.k, r.amt)
        for r in rel.scan().filter("a = 2 AND b = 0").select("k", "amt").collect()
    )
    assert got == main


def test_one_index_per_leading_column(astro):
    with pytest.raises(ValueError, match="leading"):
        astro.sql("CREATE INDEX ON ci (a, amt)")
    # a different leading column is fine
    astro.sql("CREATE INDEX ON ci (b, a)")
    rel = astro.relation("ci")
    assert rel.meta.index_info["b"]["cols"] == ["b", "a"]
    df, res = rel.scan_where("b = 6")
    assert res.index_used == "b"
    assert sorted(r.k for r in df.collect()) == _expect(astro, "b = 6")


def test_alter_drop_guards_deeper_and_vector_columns(astro, spark, tmp_path):
    with pytest.raises(ValueError, match="part of the index"):
        astro.sql("ALTER TABLE ci DROP b")  # deeper column of (a, b)
    s = AstroSession(spark, str(tmp_path / "vg_wh"))
    s.sql(
        "CREATE TABLE vg (id LONG, emb ARRAY<DOUBLE>, PRIMARY KEY (id)) "
        "MAPPED BY (vg_ht, COLS=[emb=f.e])"
    )
    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(20)],
        "id long, emb array<double>",
    )
    s.relation("vg").write(df)
    s.sql("CREATE VECTOR INDEX ON vg (emb) USING IVF OPTIONS(ncentroids=4, trained=false)")
    with pytest.raises(ValueError, match="vector index"):
        s.sql("ALTER TABLE vg DROP emb")


def test_gated_lead_falls_back_to_another_servable_index(spark, tmp_path):
    """r15 review: one gated composite lead must not decline the whole
    route while another servable index remains."""
    s = AstroSession(spark, str(tmp_path / "fb_wh"))
    s.sql(
        "CREATE TABLE fb (k INT, d INT, e INT, c INT, PRIMARY KEY (k)) "
        "MAPPED BY (fb_ht, COLS=[d=f.d, e=f.e, c=f.c]) OPTIONS (regions=4)"
    )
    csv = tmp_path / "fb.csv"
    csv.write_text(
        "".join(f"{k},{k % 5},{k % 3},{k % 11}\n" for k in range(200))
    )
    s.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE fb")
    s.sql("CREATE INDEX ON fb (d, e)")  # 'd' sorts after 'c' → tried first
    s.sql("CREATE INDEX ON fb (c)")
    s.sql("INSERT INTO fb VALUES (900, 2, NULL, 3)")  # gates (d, e)
    rel = s.relation("fb")
    assert rel.meta.index_info["d"]["deep_unindexed"] is True
    df, res = rel.scan_where("d = 2 AND c = 3")
    assert res.index_used == "c"  # fell through the gated (d, e) lead
    want = sorted(
        r.k for r in s.spark.sql("SELECT k FROM fb WHERE d = 2 AND c = 3").collect()
    )
    got = sorted(r.k for r in df.collect())
    assert got == want and 900 in got
    # with NO other index, the gate still declines with its reason
    s.sql("DROP INDEX ON fb (c)")
    rel = s.relation("fb")
    df, res = rel.scan_where("d = 2 AND c = 3")
    assert res.index_used is None
    assert res.index_declined and "unindexable" in res.index_declined
    assert sorted(r.k for r in df.collect()) == want
