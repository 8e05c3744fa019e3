"""r13 — distributed secondary-index paths (VERDICT r12 #2).

r12's index routing served only =/IN with a ≤4096-key driver collect;
everything else ignored the index.  r13 extends the router
(relation._index_route):

- RANGE conjuncts (</<=/>/>=/BETWEEN) on a NON-string indexed column
  become an index-side range scan (the index table is keyed
  (col, *main_keys), so the range is its primary prefix) feeding the
  same candidate machinery;
- string ranges BYPASS the index — a string range can contain
  NUL-carrying values which are storable but deliberately unindexed;
- over-cap results become a distributed SEMI-JOIN (Phoenix
  global-index join-path analog): per-dimension min/max bounds (one agg
  row) fold into the pruning predicate, and the distinct key frame
  leftsemi-joins the main scan — candidate keys never visit the driver;
- an unselective key set (> INDEX_SEMIJOIN_MAX_FRAC of the table's
  keys) falls back to the plain scan: shuffling the main frame through
  a join would cost more than the residual filter it replaces.
"""

import pytest

from spark_sql_on_hbase_spark.session import AstroSession

N = 20_000
N_HOT = 4_800  # > INDEX_LOOKUP_CAP (4096), < 25% of N (semi-join engages)

DDL = (
    "CREATE TABLE irs (k1 INT, status STRING, amt INT, PRIMARY KEY (k1)) "
    "MAPPED BY (irs_ht, COLS=[status=f.s, amt=f.a]) OPTIONS (regions=8)"
)


@pytest.fixture(scope="module")
def astro(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("irs")
    a = AstroSession(spark, str(tmp / "irs_wh"))
    a.sql(DDL)
    rows = []
    for i in range(N):
        # 'X' occupies the low-key quarter (clustered → bounds prune);
        # 'Y' covers well over the semi-join selectivity fraction
        st = "X" if i < N_HOT else ("Y" if i < 18_000 else "ABCD"[i % 4])
        rows.append(f"{i},{st},{i * 10}\n")
    csv = tmp / "irs.csv"
    csv.write_text("".join(rows))
    a.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE irs")
    a.sql("CREATE INDEX ON irs (status)")
    a.sql("CREATE INDEX ON irs (amt)")
    return a


def _full(astro, where):
    rel = astro.relation("irs")
    return sorted(r.k1 for r in rel.scan().filter(where).collect())


def test_range_on_numeric_index_prunes(astro):
    rel = astro.relation("irs")
    df, res = rel.scan_where("amt BETWEEN 70 AND 170")
    assert sorted(r.k1 for r in df.collect()) == list(range(7, 18))
    assert res.index_used == "amt"
    assert res.index_mode == "augment"
    assert len(res.files) < res.total, "range index did not prune files"


def test_range_one_sided_and_conjunct(astro):
    rel = astro.relation("irs")
    df, res = rel.scan_where("amt >= 199000 AND amt < 199500")
    assert sorted(r.k1 for r in df.collect()) == list(range(19_900, 19_950))
    assert res.index_used == "amt"
    assert res.index_mode == "augment"
    assert len(res.files) < res.total


def test_string_range_bypasses_index(astro):
    rel = astro.relation("irs")
    assert rel._index_route("status > 'W'") is None
    df, res = rel.scan_where("status > 'W'")
    assert res.index_used is None
    assert sorted(r.k1 for r in df.collect()) == _full(astro, "status > 'W'")


def test_overcap_equality_semijoins(astro):
    rel = astro.relation("irs")
    route = rel._index_route("status = 'X'")
    assert route is not None and route["kind"] == "semijoin"
    assert route["n"] == N_HOT
    df, res = rel.scan_where("status = 'X'")
    assert res.index_used == "status"
    assert res.index_mode == "semijoin"
    assert res.index_candidates == N_HOT
    # bounds pruning: 'X' keys live in [0, 4800) — the low quarter
    assert len(res.files) < res.total, "bounds did not prune files"
    got = sorted(r.k1 for r in df.collect())
    assert got == list(range(N_HOT))


def test_overcap_range_semijoins(astro):
    rel = astro.relation("irs")
    df, res = rel.scan_where("amt < 48000")
    assert res.index_used == "amt"
    assert res.index_mode == "semijoin"
    assert len(res.files) < res.total
    assert sorted(r.k1 for r in df.collect()) == list(range(4_800))


def test_unselective_value_falls_back_to_full_scan(astro):
    rel = astro.relation("irs")
    route = rel._index_route("status = 'Y'")
    assert route is not None and route["kind"] == "none"
    assert "unselective" in route["reason"]
    df, res = rel.scan_where("status = 'Y'")
    assert res.index_used is None
    assert "unselective" in (res.index_declined or "")
    assert df.count() == 18_000 - N_HOT


def test_semijoin_correct_under_update(astro):
    """Superset semantics survive the semi-join path: flip one row out
    of 'X' and one into it; both lookups stay exact."""
    astro.sql("UPDATE irs SET status = 'Q' WHERE k1 = 10")
    astro.sql("UPDATE irs SET status = 'X' WHERE k1 = 19995")
    rel = astro.relation("irs")
    df, res = rel.scan_where("status = 'X'")
    assert res.index_mode == "semijoin"
    got = sorted(r.k1 for r in df.collect())
    expect = [i for i in range(N_HOT) if i != 10] + [19995]
    assert got == expect
    df2, _ = rel.scan_where("status = 'Q'")
    assert [r.k1 for r in df2.collect()] == [10]


def test_equality_preferred_over_range(astro):
    rel = astro.relation("irs")
    route = rel._index_route("amt BETWEEN 0 AND 199990 AND status = 'Z'")
    # status='Z' (absent) wins over the huge amt range → empty proof
    assert route is not None
    assert route["col"] == "status"


def test_explain_scan_reports_mode(astro):
    out = {
        r.property: r.value
        for r in astro.sql("EXPLAIN SCAN irs WHERE status = 'X'").collect()
    }
    assert out["index_used"] == "status"
    assert out["index_mode"].startswith("semijoin")
    assert "candidate keys" in out["index_mode"]
    out2 = {
        r.property: r.value
        for r in astro.sql("EXPLAIN SCAN irs WHERE amt BETWEEN 70 AND 170").collect()
    }
    assert out2["index_mode"].startswith("augment")
