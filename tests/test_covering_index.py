"""r13 — covering indexes (VERDICT r12 #3, Phoenix covered-column
analog): ``CREATE INDEX ON t (col) INCLUDE (c1, ...)`` stores the
covered columns in the index table, and ``scan_covering(where, cols)``
answers queries projecting ⊆ (col ∪ keys ∪ include) from the index
table ALONE — no main-table read.

Soundness is the interesting part: the index is normally a SUPERSET
(stale extras allowed), but an index-only read needs EXACTLY the live
rows.  The ``clean`` flag in TableMeta.index_info tracks that: True
from a whole-table build, preserved by appends (and row-preserving
compacts of merge-free tables), cleared by anything that drops a live
fragment (DELETE/OVERWRITE/fold/restore), re-attested by REINDEX.
Plus: NULL-valued (and NUL-string) rows are unindexed, so the covering
path also requires a null-rejecting servable conjunct on the indexed
column.
"""

import pytest

from spark_sql_on_hbase_spark.session import AstroSession

DDL = (
    "CREATE TABLE cov (k1 INT, status STRING, amt INT, note STRING, "
    "PRIMARY KEY (k1)) "
    "MAPPED BY (cov_ht, COLS=[status=f.s, amt=f.a, note=f.n]) OPTIONS (regions=4)"
)


@pytest.fixture()
def astro(spark, tmp_path):
    a = AstroSession(spark, str(tmp_path / "cov_wh"))
    a.sql(DDL)
    csv = tmp_path / "cov.csv"
    rows = []
    for i in range(400):
        st = "E" if i in (7, 17, 27, 37) else "ABCD"[i % 4]
        rows.append(f"{i},{st},{i * 10},n{i}\n")
    csv.write_text("".join(rows))
    a.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE cov")
    a.sql("CREATE INDEX ON cov (status) INCLUDE (amt)")
    return a


def _is_index_only(df):
    files = df.inputFiles()
    return len(files) > 0 and all("idx_" in f for f in files)


def test_covering_scan_is_index_only(astro):
    rel = astro.relation("cov")
    info = rel.meta.index_info["status"]
    assert info["include"] == ["amt"]
    assert info["clean"] is True and info["merge_exact"] is True
    assert info["cols"] == ["status"] and info["deep_unindexed"] is False
    df, res = rel.scan_covering("status = 'E'", ["k1", "status", "amt"])
    assert res.index_mode == "covering" and res.index_used == "status"
    assert _is_index_only(df), df.inputFiles()
    got = sorted((r.k1, r.status, r.amt) for r in df.collect())
    assert got == [(i, "E", i * 10) for i in (7, 17, 27, 37)]


def test_covering_projection_subsets(astro):
    rel = astro.relation("cov")
    # keys only
    df, res = rel.scan_covering("status = 'E' AND amt > 100", ["k1"])
    assert res.index_mode == "covering"
    assert sorted(r.k1 for r in df.collect()) == [17, 27, 37]
    assert _is_index_only(df)


def test_uncovered_projection_falls_back(astro):
    rel = astro.relation("cov")
    # note is not included → main-table path, values still right
    df, res = rel.scan_covering("status = 'E'", ["k1", "note"])
    assert res.index_mode != "covering"
    assert sorted((r.k1, r.note) for r in df.collect()) == [
        (i, f"n{i}") for i in (7, 17, 27, 37)
    ]


def test_no_servable_conjunct_falls_back(astro):
    rel = astro.relation("cov")
    # IS NULL / no conjunct on status: NULL-valued rows are unindexed,
    # so index-only would be unsound — must fall back even though the
    # projection is covered
    df, res = rel.scan_covering("amt > 3900", ["k1", "status", "amt"])
    assert res.index_mode != "covering"
    assert sorted(r.k1 for r in df.collect()) == list(range(391, 400))
    df, res = rel.scan_covering("status IS NULL AND amt > 0", ["k1", "amt"])
    assert res.index_mode != "covering"
    assert df.count() == 0


def test_append_keeps_clean_delete_clears_it(astro):
    astro.sql("INSERT INTO cov VALUES (1000, 'E', 5, 'x')")
    rel = astro.relation("cov")
    assert rel.meta.index_info["status"]["clean"] is True
    df, res = rel.scan_covering("status = 'E'", ["k1", "amt"])
    assert res.index_mode == "covering"
    assert sorted(r.k1 for r in df.collect()) == [7, 17, 27, 37, 1000]
    # DELETE drops live rows → unclean → fallback (and still correct)
    astro.sql("DELETE FROM cov WHERE k1 = 17")
    rel = astro.relation("cov")
    assert rel.meta.index_info["status"]["clean"] is False
    df, res = rel.scan_covering("status = 'E'", ["k1", "amt"])
    assert res.index_mode != "covering"
    assert sorted(r.k1 for r in df.collect()) == [7, 27, 37, 1000]


def test_reindex_reattests_clean(astro):
    astro.sql("DELETE FROM cov WHERE k1 = 17")
    rel = astro.relation("cov")
    assert rel.meta.index_info["status"]["clean"] is False
    astro.sql("REINDEX TABLE cov")
    rel = astro.relation("cov")
    assert rel.meta.index_info["status"]["clean"] is True
    df, res = rel.scan_covering("status = 'E'", ["k1", "amt"])
    assert res.index_mode == "covering"
    assert sorted(r.k1 for r in df.collect()) == [7, 27, 37]
    assert _is_index_only(df)


def test_upsert_shadow_serves_merge_on_read_then_compact_fast_path(astro):
    """r14 (VERDICT r13 #2): a shadowing upsert no longer kills the
    index-only path — the covering scan resolves newest-wins per main
    key ON THE INDEX SIDE (index_merge=True), stays index-only, and
    returns the post-upsert values; COMPACT + REINDEX later restore the
    merge-free fast path (index_merge falls back to False)."""
    astro.sql("UPDATE cov SET status = 'Z' WHERE k1 = 7")
    rel = astro.relation("cov")
    assert rel.needs_merge()
    df, res = rel.scan_covering("status = 'E'", ["k1", "amt"])
    assert res.index_mode == "covering" and res.index_merge
    assert _is_index_only(df), df.inputFiles()
    assert sorted(r.k1 for r in df.collect()) == [17, 27, 37]
    df, res = rel.scan_covering("status = 'Z'", ["k1"])
    assert res.index_mode == "covering" and res.index_merge
    assert [r.k1 for r in df.collect()] == [7]
    astro.sql("COMPACT TABLE cov")
    astro.sql("REINDEX TABLE cov")
    rel = astro.relation("cov")
    df, res = rel.scan_covering("status = 'E'", ["k1", "amt"])
    assert res.index_mode == "covering" and not res.index_merge
    assert sorted(r.k1 for r in df.collect()) == [17, 27, 37]
    df, res = rel.scan_covering("status = 'Z'", ["k1"])
    assert res.index_mode == "covering"
    assert [r.k1 for r in df.collect()] == [7]


def test_compact_of_mergefree_table_preserves_clean(astro):
    astro.sql("INSERT INTO cov VALUES (2000, 'E', 1, 'y')")  # unique key
    astro.sql("COMPACT TABLE cov")
    rel = astro.relation("cov")
    assert rel.meta.index_info["status"]["clean"] is True
    df, res = rel.scan_covering("status = 'E'", ["k1", "amt"])
    assert res.index_mode == "covering"
    assert sorted(r.k1 for r in df.collect()) == [7, 17, 27, 37, 2000]


def test_overwrite_clears_clean(astro):
    astro.sql("INSERT OVERWRITE cov SELECT k1, 'E' AS status, amt, note FROM cov WHERE k1 < 5")
    rel = astro.relation("cov")
    assert rel.meta.index_info["status"]["clean"] is False
    df, res = rel.scan_covering("status = 'E'", ["k1"])
    assert res.index_mode != "covering"
    assert sorted(r.k1 for r in df.collect()) == [0, 1, 2, 3, 4]


def test_opaque_predicate_falls_back(astro):
    """An unparseable/non-sargable fragment may reference columns the
    coverage test can't see — the covering path must fall back, never
    push a filter the index table can't resolve."""
    rel = astro.relation("cov")
    df, res = rel.scan_covering(
        "status = 'E' AND length(note) > 1", ["k1", "status", "amt"]
    )
    assert res.index_mode != "covering"
    assert sorted(r.k1 for r in df.collect()) == [7, 17, 27, 37]


def test_alter_drop_included_column_refused(astro):
    with pytest.raises(ValueError, match="part of the index"):
        astro.sql("ALTER TABLE cov DROP amt")


def test_include_validation(astro):
    with pytest.raises(ValueError, match="already part of the index key"):
        astro.relation("cov").create_index("amt", include=("k1",))
    with pytest.raises(ValueError):
        astro.relation("cov").create_index("amt", include=("nope",))


def test_legacy_index_never_covering(astro):
    """An index created without INCLUDE (or pre-r13 metadata) serves
    the candidate paths but never index-only for non-key projections."""
    astro.sql("CREATE INDEX ON cov (amt)")
    rel = astro.relation("cov")
    df, res = rel.scan_covering("amt = 70", ["k1", "amt"])
    # amt's index covers {amt} ∪ keys ⊇ projection → it IS covering
    assert res.index_mode == "covering"
    assert [r.k1 for r in df.collect()] == [7]
    # but a projection with status is not covered by amt's index, and
    # status's index has no amt conjunct... status covers amt via
    # INCLUDE — scan_covering picks whichever covers; force the check
    # that pre-r13 metadata (clean=False) is never served: simulate by
    # flipping the flag off
    def unflag():
        rel.meta.index_info["amt"]["clean"] = False
        rel.catalog.persist(rel.meta)

    rel._commit_retry(unflag)
    rel2 = astro.relation("cov")
    df, res = rel2.scan_covering("amt = 70", ["k1", "amt"])
    assert res.index_mode != "covering"
    assert [r.k1 for r in df.collect()] == [7]
