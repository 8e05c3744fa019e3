"""r12 VERDICT r11 #4 — schema evolution × history semantics, pinned:

The SCHEMA is not versioned; every read — current, VERSION/TIMESTAMP AS
OF, CHANGES, RESTORE — projects the CURRENT declared columns.  An
ALTER ADD column reads as NULL from pre-ALTER fragments (the engine's
absent-cell rule); an ALTER DROP projects the column away everywhere,
including old snapshots.  The ALTER itself is a metadata-only COMMIT:
it consumes a stamped generation, appears in DESCRIBE HISTORY, and the
fileless stamp is pinned so later appends cannot drop it.
"""

import pytest

from spark_sql_on_hbase_spark.session import AstroSession


@pytest.fixture()
def astro(spark, tmp_path):
    return AstroSession(spark, str(tmp_path / "warehouse"))


def _mk(astro, tmp_path, name, retain=True, n=60):
    csv = tmp_path / f"{name}.csv"
    csv.write_text("".join(f"{k},v{k}\n" for k in range(1, n + 1)))
    astro.sql(
        f"CREATE TABLE {name} (k INT, v STRING, PRIMARY KEY (k)) "
        f"MAPPED BY ({name}_ht) OPTIONS (regions=4"
        + (", retain_history=true" if retain else "")
        + ")"
    )
    astro.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE {name}")


def test_alter_add_then_travel_nullfills(astro, tmp_path):
    """alter-then-travel: a pre-ALTER snapshot read under the current
    schema shows the ADDed column as NULL."""
    _mk(astro, tmp_path, "se1")
    rel = astro.relation("se1")
    gen0 = rel.committed_seq()
    astro.sql("ALTER TABLE se1 ADD score INT MAPPED BY (cf.score)")
    astro.sql("INSERT INTO se1 VALUES (1000, 'new', 7)")
    # current read: old rows null-fill, new row carries the value
    cur = {r.k: r.score for r in astro.sql("SELECT k, score FROM se1").collect()}
    assert cur[1] is None and cur[1000] == 7
    # travel to the pre-ALTER generation: current schema, column NULL
    snap = rel.scan(as_of_seq=gen0)
    assert "score" in snap.columns
    assert snap.count() == 60
    assert snap.filter("score IS NOT NULL").count() == 0
    # SQL surface agrees
    rows = astro.sql(
        f"SELECT k, score FROM se1 VERSION AS OF {gen0} WHERE k = 1"
    ).collect()
    assert rows[0].score is None


def test_alter_recorded_in_describe_history(astro, tmp_path):
    _mk(astro, tmp_path, "se2")
    astro.sql("ALTER TABLE se2 ADD w DOUBLE MAPPED BY (cf.w)")
    astro.sql("INSERT INTO se2 VALUES (2000, 'x', 1.5)")
    astro.sql("ALTER TABLE se2 DROP w")
    hist = astro.sql("DESCRIBE HISTORY se2").collect()
    ops = [r.operation for r in hist]  # newest first
    assert ops[0] == "ALTER DROP w"
    assert "ALTER ADD w" in ops
    assert ops[-1] == "LOAD"
    # ALTER rows are fileless commits
    alter_rows = [r for r in hist if r.operation.startswith("ALTER")]
    assert all(r.live_files == 0 and r.retired_files == 0 for r in alter_rows)
    # generations strictly ordered: LOAD < ALTER ADD < INSERT < ALTER DROP
    gens = {r.operation: r.generation for r in hist}
    assert gens["ALTER ADD w"] < gens["INSERT"] < gens["ALTER DROP w"]
    # the pinned fileless stamps survive yet another append
    astro.sql("INSERT INTO se2 VALUES (2001, 'y')")
    ops2 = [r.operation for r in astro.sql("DESCRIBE HISTORY se2").collect()]
    assert "ALTER ADD w" in ops2 and "ALTER DROP w" in ops2


def test_travel_across_alter_drop_projects_away(astro, tmp_path):
    """travel-across-alter: after DROP, the column is gone from every
    snapshot, including ones committed while it existed."""
    _mk(astro, tmp_path, "se3")
    astro.sql("ALTER TABLE se3 ADD tag STRING MAPPED BY (cf.tag)")
    astro.sql("INSERT INTO se3 VALUES (3000, 'z', 'tagged')")
    rel = astro.relation("se3")
    gen_with_tag = rel.committed_seq()
    assert astro.sql(
        "SELECT tag FROM se3 WHERE k = 3000"
    ).collect()[0].tag == "tagged"
    astro.sql("ALTER TABLE se3 DROP tag")
    # current and historical reads both project the column away
    assert "tag" not in astro.sql("SELECT * FROM se3").columns
    snap = rel.scan(as_of_seq=gen_with_tag)
    assert "tag" not in snap.columns
    assert snap.filter("k = 3000").count() == 1  # the ROW survives


def test_changes_window_spanning_alter(astro, tmp_path):
    """changes-window-spanning-alter: the feed carries the current
    schema; pre-ALTER pre-images null-fill the ADDed column."""
    _mk(astro, tmp_path, "se4")
    rel = astro.relation("se4")
    start = rel.committed_seq()
    astro.sql("ALTER TABLE se4 ADD score INT MAPPED BY (cf.score)")
    astro.sql("INSERT INTO se4 VALUES (4000, 'post-alter', 9)")
    astro.sql("DELETE FROM se4 WHERE k = 5")  # retained: delete event
    feed = rel.changes(start, drop_noop=True)
    assert "score" in feed.columns
    by_type = {}
    for r in feed.collect():
        by_type.setdefault(r._change_type, []).append(r)
    ins = [r for r in by_type["insert"] if r.k == 4000]
    assert ins and ins[0].score == 9
    # the delete pre-image predates the ALTER → score null-fills
    dels = by_type.get("delete", [])
    assert [d.k for d in dels] == [5]
    assert dels[0].score is None
    # SQL surface window spanning the ALTER parses and agrees
    n_sql = astro.sql(
        f"SELECT * FROM se4 CHANGES FROM {start} WITH NOOP FILTER"
    ).count()
    assert n_sql == feed.count()


def test_restore_to_pre_alter_generation(astro, tmp_path):
    """restore-to-pre-alter: RESTORE rolls back DATA under the CURRENT
    schema — the ADDed column stays declared (null-filled from the
    restored snapshot), and the restore is itself a history row."""
    _mk(astro, tmp_path, "se5")
    rel = astro.relation("se5")
    gen0 = rel.committed_seq()
    astro.sql("ALTER TABLE se5 ADD score INT MAPPED BY (cf.score)")
    astro.sql("INSERT INTO se5 VALUES (5000, 'post', 3)")
    astro.sql(f"RESTORE TABLE se5 TO VERSION AS OF {gen0}")
    cur = astro.sql("SELECT * FROM se5")
    assert "score" in cur.columns  # schema NOT rolled back
    assert cur.count() == 60  # data IS: the post-alter insert is gone
    assert cur.filter("score IS NOT NULL").count() == 0
    ops = [r.operation for r in astro.sql("DESCRIBE HISTORY se5").collect()]
    assert ops[0] == "RESTORE"
    assert "ALTER ADD score" in ops


def test_alter_on_nonretained_table_and_empty_table(astro, tmp_path):
    """Non-retained tables get the same ALTER history row; an ALTER on a
    never-written table precedes generation 0 and records nothing."""
    _mk(astro, tmp_path, "se6", retain=False)
    astro.sql("ALTER TABLE se6 ADD x INT MAPPED BY (cf.x)")
    ops = [r.operation for r in astro.sql("DESCRIBE HISTORY se6").collect()]
    assert ops[0] == "ALTER ADD x"
    # fresh table: ALTER before any write leaves no phantom generation
    astro.sql(
        "CREATE TABLE se7 (k INT, v STRING, PRIMARY KEY (k)) MAPPED BY (se7_ht)"
    )
    astro.sql("ALTER TABLE se7 ADD y INT MAPPED BY (cf.y)")
    assert astro.catalog.get_table("se7").generation_times == {}
    csv = tmp_path / "se7.csv"
    csv.write_text("1,a,5\n")
    astro.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE se7")
    assert astro.sql("SELECT y FROM se7").collect()[0].y == 5
