"""r11: RESTORE TABLE ... TO VERSION/TIMESTAMP AS OF — the write-side
complement of time travel (Delta RESTORE analog).  On retain_history
tables the restore is itself a versioned commit (undoable); without
retention it folds history to the restored contents.
"""

import time

import pytest

# these tests assert PROMPT physical reclaim; r13 reader-lease
# deferral is exercised in test_autocompact_leases.py
pytestmark = pytest.mark.usefixtures("no_reader_leases")

from spark_sql_on_hbase_spark.session import AstroSession


@pytest.fixture()
def astro(spark, tmp_path):
    return AstroSession(spark, str(tmp_path / "warehouse"))


def _mk(astro, tmp_path, name, retained=True, n=80):
    csv = tmp_path / f"{name}.csv"
    csv.write_text("".join(f"{k},v{k}\n" for k in range(1, n + 1)))
    opts = "regions=4" + (", retain_history=true" if retained else "")
    astro.sql(
        f"CREATE TABLE {name} (k INT, v STRING, PRIMARY KEY (k)) "
        f"MAPPED BY ({name}_ht) OPTIONS ({opts})"
    )
    astro.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE {name}")
    return astro.relation(name)


def _rows(astro, name):
    return {(r.k, r.v) for r in astro.sql(f"SELECT k, v FROM {name}").collect()}


def test_restore_retained_roundtrip_and_undo(astro, tmp_path):
    rel = _mk(astro, tmp_path, "rs1")
    original = _rows(astro, "rs1")
    astro.sql("UPDATE rs1 SET v = NULL WHERE k BETWEEN 10 AND 20")  # gen 1
    astro.sql("DELETE FROM rs1 WHERE k BETWEEN 30 AND 40")  # gen 2
    damaged = _rows(astro, "rs1")
    t_pre_restore = time.time()
    time.sleep(0.05)
    astro.sql("RESTORE TABLE rs1 TO VERSION AS OF 0")
    stats = astro.last_write_stats
    assert stats["history"] == "retained" and stats["restored_to"] == 0
    # the present equals the original snapshot exactly
    assert _rows(astro, "rs1") == original
    # the rolled-back (damaged) state is STILL readable pre-restore
    n = rel.seq_for_timestamp(t_pre_restore)
    snap = {(r.k, r.v) for r in rel.scan(as_of_seq=n).select("k", "v").collect()}
    assert snap == damaged
    # a second RESTORE undoes the first (restore is itself versioned)
    astro.sql(f"RESTORE TABLE rs1 TO VERSION AS OF {n}")
    assert _rows(astro, "rs1") == damaged
    # change feed reports the restore's effect like any other write:
    # feed over the restore window shows the deleted keys reappearing
    feed = rel.changes(n)
    # after the undo, final state == damaged again; just sanity the call
    assert feed.count() >= 0


def test_restore_by_timestamp(astro, tmp_path):
    rel = _mk(astro, tmp_path, "rs2")
    time.sleep(0.05)
    t_good = time.time()
    time.sleep(0.05)
    astro.sql("DELETE FROM rs2 WHERE k <= 50")
    assert astro.sql("SELECT count(*) c FROM rs2").collect()[0].c == 30
    astro.sql(f"RESTORE TABLE rs2 TO TIMESTAMP AS OF {t_good}")
    assert astro.sql("SELECT count(*) c FROM rs2").collect()[0].c == 80
    assert astro.last_write_stats["restored_to"] == 0
    assert rel.meta.retain_history


def test_restore_without_retention_folds(astro, tmp_path):
    _mk(astro, tmp_path, "rs3", retained=False)
    original = _rows(astro, "rs3")
    astro.sql("INSERT INTO rs3 VALUES (500, 'late')")  # gen 1
    astro.sql("RESTORE TABLE rs3 TO VERSION AS OF 0")
    stats = astro.last_write_stats
    assert stats["history"] == "folded" and stats["restored_to"] == 0
    assert _rows(astro, "rs3") == original
    rel = astro.relation("rs3")
    # folded: only the restored present remains (generation 0)
    assert rel.current_seq() == 0


def test_restore_below_floor_refuses(astro, tmp_path):
    rel = _mk(astro, tmp_path, "rs4")
    astro.sql("DELETE FROM rs4 WHERE k <= 10")
    astro.sql("VACUUM TABLE rs4")  # floor rises past the retired snapshot
    with pytest.raises(ValueError, match="history floor"):
        rel.restore(0)


def test_restore_help(astro):
    import io

    from spark_sql_on_hbase_spark.cli import repl

    out = io.StringIO()
    repl(astro, out=out, inp=io.StringIO("HELP RESTORE;\nexit\n"))
    assert "RESTORE TABLE table_name TO VERSION AS OF n" in out.getvalue()
