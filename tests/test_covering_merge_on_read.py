"""r14 — covering-index merge-on-read (VERDICT r13 #2).

r13's covering path required a merge-free main table, so one shadowing
upsert disabled index-only reads until COMPACT/REINDEX — exactly when
tables are being written, which is always at 100 TB.  r14 resolves
newest-wins per MAIN key at index-scan time: index entries carry ``_g``
(the main table's generation), so per-column newest-non-null resolution
grouped by main keys reproduces `_merge_latest`'s cell semantics
restricted to the covered columns.

The exactness precondition is the new ``merge_exact`` flag in
index_info: True while no indexed fragment row was DROPPED from the
entry stream (NULL indexed value / NUL-carrying string) while carrying
shadowing or covered information.  Maintained per append batch (free
for numeric no-INCLUDE indexes), re-attested by REINDEX.

Phoenix analog: covered columns staying live under writes
(SURVEY §2.1 row 10's index discussion).
"""

import pytest

from spark_sql_on_hbase_spark.session import AstroSession

DDL = (
    "CREATE TABLE cmr (k1 INT, status STRING, amt INT, note STRING, "
    "PRIMARY KEY (k1)) "
    "MAPPED BY (cmr_ht, COLS=[status=f.s, amt=f.a, note=f.n]) OPTIONS (regions=4)"
)


@pytest.fixture()
def astro(spark, tmp_path):
    a = AstroSession(spark, str(tmp_path / "cmr_wh"))
    a.sql(DDL)
    csv = tmp_path / "cmr.csv"
    rows = []
    for i in range(200):
        st = "E" if i in (7, 17, 27) else "ABCD"[i % 4]
        rows.append(f"{i},{st},{i * 10},n{i}\n")
    csv.write_text("".join(rows))
    a.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE cmr")
    a.sql("CREATE INDEX ON cmr (status) INCLUDE (amt)")
    return a


def _is_index_only(df):
    files = df.inputFiles()
    return len(files) > 0 and all("idx_" in f for f in files)


def _cov(astro, where, cols):
    rel = astro.relation("cmr")
    return rel.scan_covering(where, cols)


def test_value_moves_into_predicate_set(astro):
    """An upsert that moves a key INTO the queried value must surface it
    with its freshest include cell — the newest entry wins both ways."""
    astro.sql("UPDATE cmr SET status = 'E', amt = 4242 WHERE k1 = 50")
    df, res = _cov(astro, "status = 'E'", ["k1", "status", "amt"])
    assert res.index_mode == "covering" and res.index_merge
    assert _is_index_only(df)
    got = sorted((r.k1, r.amt) for r in df.collect())
    assert got == [(7, 70), (17, 170), (27, 270), (50, 4242)]


def test_include_only_update_resolves_newest(astro):
    """UPDATE writes full rows, so an amt-only SET still produces a
    complete entry; the covering read must return the NEW amt."""
    astro.sql("UPDATE cmr SET amt = 999 WHERE k1 = 17")
    df, res = _cov(astro, "status = 'E'", ["k1", "amt"])
    assert res.index_mode == "covering" and res.index_merge
    got = sorted((r.k1, r.amt) for r in df.collect())
    assert got == [(7, 70), (17, 999), (27, 270)]


def test_repeated_upserts_newest_generation_wins(astro):
    for v in (111, 222, 333):
        astro.sql(f"UPDATE cmr SET amt = {v} WHERE k1 = 27")
    df, res = _cov(astro, "status = 'E' AND amt > 100", ["k1", "amt"])
    assert res.index_mode == "covering" and res.index_merge
    got = sorted((r.k1, r.amt) for r in df.collect())
    assert got == [(17, 170), (27, 333)]


def test_merge_result_matches_main_scan(astro):
    """Cross-check: index-side resolution == main-table resolution for
    the covered projection over a mixed batch of upserts."""
    astro.sql("UPDATE cmr SET status = 'E' WHERE k1 IN (100, 101)")
    astro.sql("UPDATE cmr SET amt = 1, status = 'Q' WHERE k1 = 7")
    astro.sql("INSERT INTO cmr VALUES (900, 'E', 9000, 'new')")
    rel = astro.relation("cmr")
    df, res = rel.scan_covering("status = 'E'", ["k1", "status", "amt"])
    assert res.index_mode == "covering" and res.index_merge
    main = rel.scan().filter("status = 'E'").select("k1", "status", "amt")
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, main.collect()))


def test_null_indexed_value_with_include_downgrades(astro):
    """A row the entry stream drops (NULL status) while carrying a
    non-null covered cell makes index-side resolution inexact —
    merge_exact goes False and covering falls back under merge, still
    returning correct values; REINDEX re-attests... but only once the
    offending cells are folded away."""
    astro.sql("INSERT INTO cmr VALUES (901, NULL, 5, 'x')")
    rel = astro.relation("cmr")
    assert rel.meta.index_info["status"]["merge_exact"] is False
    # force a merge state so the gate matters
    astro.sql("UPDATE cmr SET amt = 71 WHERE k1 = 7")
    rel = astro.relation("cmr")
    assert rel.needs_merge()
    df, res = rel.scan_covering("status = 'E'", ["k1", "amt"])
    assert res.index_mode != "covering"
    got = sorted((r.k1, r.amt) for r in df.collect())
    assert got == [(7, 71), (17, 170), (27, 270)]


def test_nul_string_value_downgrades(astro):
    astro.sql("INSERT INTO cmr VALUES (902, 'a\x00b', 5, 'x')")
    rel = astro.relation("cmr")
    assert rel.meta.index_info["status"]["merge_exact"] is False


def test_numeric_index_without_include_never_downgrades(astro):
    """The unviolable class (non-string col, no INCLUDE): no probe runs
    and merge_exact stays True through NULL-valued appends."""
    astro.sql("CREATE INDEX ON cmr (amt)")
    astro.sql("INSERT INTO cmr VALUES (903, 'B', NULL, 'x')")
    rel = astro.relation("cmr")
    assert rel.meta.index_info["amt"]["merge_exact"] is True
    astro.sql("UPDATE cmr SET note = 'upd' WHERE k1 = 3")
    rel = astro.relation("cmr")
    assert rel.needs_merge()
    df, res = rel.scan_covering("amt = 30", ["k1", "amt"])
    assert res.index_mode == "covering" and res.index_merge
    assert [(r.k1, r.amt) for r in df.collect()] == [(3, 30)]


def test_reindex_reattests_merge_exact(astro):
    astro.sql("INSERT INTO cmr VALUES (901, NULL, 5, 'x')")
    rel = astro.relation("cmr")
    assert rel.meta.index_info["status"]["merge_exact"] is False
    # the NULL-status row still exists, so REINDEX must NOT re-attest
    astro.sql("REINDEX TABLE cmr")
    rel = astro.relation("cmr")
    assert rel.meta.index_info["status"]["merge_exact"] is False
    # delete it, compact the history away, REINDEX → exact again
    astro.sql("DELETE FROM cmr WHERE k1 = 901")
    astro.sql("COMPACT TABLE cmr")
    astro.sql("REINDEX TABLE cmr")
    rel = astro.relation("cmr")
    assert rel.meta.index_info["status"]["merge_exact"] is True
    assert rel.meta.index_info["status"]["clean"] is True


def test_reindex_folded_entries_resolve_by_main_generation(astro):
    """REINDEX folds entries from DIFFERENT main generations into ONE
    index generation; the merge path must resolve by `_g` (main
    generation) — not the index table's own seq collapse, whose tie
    between same-(col, key) rows is nondeterministic.  r14 regression:
    phase 2 reads RAW index fragments ordered by struct(_g, _seq)."""
    astro.sql("UPDATE cmr SET amt = 9999 WHERE k1 = 17")  # include-only
    astro.sql("REINDEX TABLE cmr")
    rel = astro.relation("cmr")
    assert rel.needs_merge()
    info = rel.meta.index_info["status"]
    assert info["clean"] and info["merge_exact"]
    # several plans: the pre-fix collapse tie was partial-agg-order
    # dependent, so one lucky pass proves nothing
    for _ in range(3):
        df, res = rel.scan_covering("status = 'E'", ["k1", "amt"])
        assert res.index_mode == "covering" and res.index_merge
        got = sorted((r.k1, r.amt) for r in df.collect())
        assert got == [(7, 70), (17, 9999), (27, 270)], got


def test_explain_scan_reports_merge_on_read(astro):
    astro.sql("UPDATE cmr SET amt = 999 WHERE k1 = 17")
    out = astro.sql("EXPLAIN SCAN cmr COLUMNS (k1, amt) WHERE status = 'E'")
    text = "\n".join(" ".join(str(c) for c in r) for r in out.collect())
    assert "merge-on-read" in text, text
