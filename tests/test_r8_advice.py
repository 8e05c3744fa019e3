"""Round-8 advice regressions: MERGE ON with a top-level OR must not
prune by the equi piece of one disjunct (wrong data — matched rows left
undeleted), escaped quotes must not desync the VERSION AS OF literal
scanner, and an empty generation snapshot keeps the promised rowkey
column.
"""

import pytest

from spark_sql_on_hbase_spark.relation import ROWKEY_COL
from spark_sql_on_hbase_spark.session import AstroSession


@pytest.fixture()
def astro(spark, tmp_path):
    return AstroSession(spark, str(tmp_path / "warehouse"))


def _load_pt(astro, tmp_path, name="pt", n=200, regions=4):
    csv = tmp_path / f"{name}.csv"
    csv.write_text("".join(f"{k},v{k},{k * 10}\n" for k in range(1, n + 1)))
    astro.sql(
        f"CREATE TABLE {name} (k INT, v STRING, n INT, PRIMARY KEY (k)) "
        f"MAPPED BY ({name}_ht) OPTIONS (regions={regions})"
    )
    astro.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE {name}")
    return astro.relation(name)


def test_merge_on_top_level_or_deletes_via_either_disjunct(astro, tmp_path):
    """r7 advice (high): `ON t.k = s.kk AND 1 = 1 OR t.v = s.vv` matches
    rows through EITHER disjunct; the equi piece inside the first
    disjunct is not a binding conjunct, so source-bound pruning must not
    run (it would leave the v-matched row undeleted with no error)."""
    _load_pt(astro, tmp_path)
    # source row: kk=1 matches k=1 via the first disjunct; vv='v150'
    # matches k=150 via the second — 150 is far outside kk's bounds
    astro.sql(
        "MERGE INTO pt t USING (SELECT 1 AS kk, 'v150' AS vv) s "
        "ON t.k = s.kk AND 1 = 1 OR t.v = s.vv WHEN MATCHED THEN DELETE"
    )
    stats = astro.last_write_stats
    # no pruning claim: the full rewrite ran
    assert stats["files_rewritten"] == stats["files_total"]
    rows = astro.sql("SELECT k FROM pt WHERE k IN (1, 150)").collect()
    assert rows == []
    assert astro.sql("SELECT count(*) AS c FROM pt").collect()[0].c == 198


def test_merge_on_parenthesized_or_still_prunes(astro, tmp_path):
    """An OR *inside parens* is below top level — the surrounding equi
    conjunct still binds, so pruning stays available and correct."""
    _load_pt(astro, tmp_path)
    astro.sql(
        "MERGE INTO pt t USING (SELECT 7 AS kk, 'v7' AS vv) s "
        "ON t.k = s.kk AND (s.vv = t.v OR s.vv = 'zzz') "
        "WHEN MATCHED THEN DELETE"
    )
    stats = astro.last_write_stats
    assert stats["files_rewritten"] < stats["files_total"]
    assert astro.sql("SELECT count(*) AS c FROM pt WHERE k = 7").collect()[0].c == 0


def test_merge_update_on_or_does_not_skip_matched_rows(astro, tmp_path):
    """The same unsound bounds fed _merge_update_rewrite: a NULL-assigning
    MERGE UPDATE with an OR in ON must update rows matched via the
    second disjunct too."""
    _load_pt(astro, tmp_path)
    astro.sql(
        "MERGE INTO pt t USING (SELECT 2 AS kk, 'v180' AS vv, "
        "CAST(NULL AS STRING) AS nv) s "
        "ON t.k = s.kk OR t.v = s.vv WHEN MATCHED THEN UPDATE SET v = s.nv"
    )
    rows = astro.sql("SELECT k, v FROM pt WHERE k IN (2, 180) ORDER BY k").collect()
    assert [(r.k, r.v) for r in rows] == [(2, None), (180, None)]


def test_version_asof_after_escaped_quote_literal(astro):
    """r7 advice: a backslash-escaped quote inside a string literal must
    not desync the quote map — a later VERSION AS OF is still rewritten."""
    astro.sql("CREATE TABLE ve (k INT, v STRING, PRIMARY KEY (k)) MAPPED BY (ve_ht)")
    astro.sql("INSERT INTO ve VALUES (1, 'old')")
    astro.sql("INSERT INTO ve VALUES (1, 'new')")
    rows = astro.sql(
        "SELECT 'a\\'b' AS lit, v FROM ve VERSION AS OF 0"
    ).collect()
    assert [(r.lit, r.v) for r in rows] == [("a'b", "old")]
    # and text inside a literal containing the escaped quote is untouched
    r = astro.sql("SELECT 'x\\' ve VERSION AS OF 0' AS s").collect()[0]
    assert r.s == "x' ve VERSION AS OF 0"


def test_empty_snapshot_keeps_rowkey_column(astro):
    """r7 advice: scan(with_rowkey=True, as_of_seq=N) with no fragment at
    seq <= N returns an EMPTY frame that still carries the rowkey column."""
    astro.sql("CREATE TABLE es (k INT, v STRING, PRIMARY KEY (k)) MAPPED BY (es_ht)")
    rel = astro.relation("es")
    empty = rel.scan(with_rowkey=True, as_of_seq=0)  # no fragments at all
    assert ROWKEY_COL in empty.columns
    assert empty.select(ROWKEY_COL).collect() == []  # must not raise
    # sanity: the non-empty snapshot path carries the column too
    astro.sql("INSERT INTO es VALUES (1, 'a')")
    rel = astro.relation("es")
    df = rel.scan(with_rowkey=True, as_of_seq=rel.current_seq())
    assert ROWKEY_COL in df.columns and df.count() == 1
