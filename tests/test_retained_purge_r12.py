"""r12 — the RETAINED per-fragment purge closes the r11 retention cost
cliff for DELETEs: on retain_history tables, key-only and resolved-
key-set DELETEs now rewrite only the intersecting fragments (hit
originals RETIRE at a reserved generation; value-identical survivors
keep their ORIGINAL generation numbers) instead of falling back to a
full-table retained rewrite with a WARN.

Soundness being pinned: a pre-write snapshot reads the retired
originals PLUS the rewritten survivors, and the newest-cell-wins merge
collapses the value-identical duplicates exactly — so every snapshot
keeps the deleted keys, the present drops them, upserted keys keep
their version structure, and the change feed emits PRECISELY the
deleted keys (no survivor re-stamp noise at all, even without
drop_noop).  UPDATEs still refuse (old/new values would collide at one
generation) and keep the r11 WARN + fallback."""

import warnings

import pytest

# these tests assert PROMPT physical reclaim; r13 reader-lease
# deferral is exercised in test_autocompact_leases.py
pytestmark = pytest.mark.usefixtures("no_reader_leases")

from spark_sql_on_hbase_spark.session import AstroSession


@pytest.fixture()
def astro(spark, tmp_path):
    return AstroSession(spark, str(tmp_path / "warehouse"))


def _pruned_retained(st):
    return (
        st is not None
        and st["history"] == "retained"
        and 0 < st["files_rewritten"] < st["files_total"]
    )


def test_keyonly_delete_retained_purge(astro, tmp_path):
    astro.sql(
        "CREATE TABLE rp1 (k INT, v STRING, PRIMARY KEY (k)) "
        "MAPPED BY (rp1_ht) OPTIONS (regions=4, retain_history=true)"
    )
    astro.sql("INSERT INTO rp1 SELECT id, CONCAT('v', id) FROM range(1, 101)")
    astro.sql("INSERT INTO rp1 VALUES (5, 'vB5')")  # gen-1 upsert overlay
    rel = astro.relation("rp1")
    astro.sql("DELETE FROM rp1 WHERE k = 7")
    st = astro.last_write_stats
    assert _pruned_retained(st), st  # partial, not a full-table rewrite
    # present: 7 gone, the upsert still wins for 5
    rows = {r.k: r.v for r in astro.sql("SELECT k, v FROM rp1").collect()}
    assert 7 not in rows and rows[5] == "vB5" and len(rows) == 99
    # pre-delete snapshots keep the deleted key AND dedup exactly (the
    # retired original and the rewritten survivors coexist at gen 0)
    s0 = {r.k: r.v for r in rel.scan(as_of_seq=0).collect()}
    assert len(s0) == 100 and s0[7] == "v7" and s0[5] == "v5"
    s1 = {r.k: r.v for r in rel.scan(as_of_seq=1).collect()}
    assert len(s1) == 100 and s1[7] == "v7" and s1[5] == "vB5"
    # change feed since the upsert: EXACTLY one delete event, zero
    # update noise even WITHOUT drop_noop (survivors kept their
    # generations, so the write-level feed sees no delta rows at all)
    feed = rel.changes(1, drop_noop=False).collect()
    by_type = {}
    for r in feed:
        by_type.setdefault(r._change_type, []).append(r)
    assert [d.k for d in by_type.get("delete", [])] == [7]
    assert by_type.get("delete")[0].v == "v7"  # pre-image
    assert "update" not in by_type and "insert" not in by_type
    # floor untouched; DESCRIBE HISTORY records the statement
    assert astro.catalog.get_table("rp1").history_floor == 0
    ops = {r.generation: r.operation for r in astro.sql("DESCRIBE HISTORY rp1").collect()}
    assert ops[max(ops)] == "DELETE"


def test_keyset_delete_retained_purge_no_warn(astro, tmp_path):
    """Fully-overlapping two-generation state: islands degenerate, so
    the resolved-key-set path is the only pruned plan — r11 WARNED and
    fell back to a full rewrite; r12 purges the 4/8 hit fragments with
    retention intact."""
    astro.sql(
        "CREATE TABLE rp2 (k INT, v STRING, PRIMARY KEY (k)) "
        "MAPPED BY (rp2_ht) OPTIONS (regions=4, retain_history=true)"
    )
    astro.sql("INSERT INTO rp2 SELECT id, CONCAT('v', id) FROM range(1, 101)")
    rel = astro.relation("rp2")
    # ONE full-range gen-1 fragment overlaps every gen-0 file → a single
    # island covering the whole table → the island rewrite returns None
    # and ONLY the keyset plan can prune
    overlay = astro.spark.sql("SELECT CAST(id AS INT) k, CONCAT('w', id) v FROM range(1, 101)")
    rel.append(overlay, fragments=1)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)  # any WARN = fail
        astro.sql("DELETE FROM rp2 WHERE k BETWEEN 40 AND 60 AND v LIKE 'w%'")
    st = astro.last_write_stats
    assert _pruned_retained(st), st
    assert "keyset_refused_prunable" not in st
    rows = {r.k: r.v for r in astro.sql("SELECT k, v FROM rp2").collect()}
    assert len(rows) == 100 - 21 and 50 not in rows and rows[61] == "w61"
    # both pre-delete snapshots replay exactly (deleted keys included,
    # per-generation values intact)
    s0 = {r.k: r.v for r in rel.scan(as_of_seq=0).collect()}
    assert len(s0) == 100 and s0[50] == "v50"
    s1 = {r.k: r.v for r in rel.scan(as_of_seq=1).collect()}
    assert len(s1) == 100 and s1[50] == "w50"
    # delete events carry the RESOLVED pre-image (gen-1 values)
    dels = {
        r.k: r.v
        for r in rel.changes(1).collect()
        if r._change_type == "delete"
    }
    assert set(dels) == set(range(40, 61)) and dels[40] == "w40"


def test_update_keyset_still_refuses_with_warn(astro, tmp_path):
    """UPDATE cannot take the retained purge (old/new values would
    collide at one generation): the r11 WARN + full-rewrite fallback and
    the keyset_refused_prunable stat remain."""
    astro.sql(
        "CREATE TABLE rp3 (k INT, v STRING, PRIMARY KEY (k)) "
        "MAPPED BY (rp3_ht) OPTIONS (regions=4, retain_history=true)"
    )
    astro.sql("INSERT INTO rp3 SELECT id, CONCAT('v', id) FROM range(1, 101)")
    rel3 = astro.relation("rp3")
    overlay = astro.spark.sql("SELECT CAST(id AS INT) k, CONCAT('w', id) v FROM range(1, 101)")
    rel3.append(overlay, fragments=1)  # degenerate single island
    with pytest.warns(RuntimeWarning, match="retain_history refuses"):
        astro.sql("UPDATE rp3 SET v = NULL WHERE k BETWEEN 40 AND 60")
    st = astro.last_write_stats
    assert st["history"] == "retained"
    assert "keyset_refused_prunable" in st
    rows = {r.k: r.v for r in astro.sql("SELECT k, v FROM rp3").collect()}
    assert rows[50] is None and rows[61] == "w61"


def test_retained_purge_then_vacuum_and_compact(astro, tmp_path):
    """Lifecycle: retained purge → bounded VACUUM keeps the snapshot →
    unbounded VACUUM raises the floor → COMPACT folds clean."""
    astro.sql(
        "CREATE TABLE rp4 (k INT, v STRING, PRIMARY KEY (k)) "
        "MAPPED BY (rp4_ht) OPTIONS (regions=4, retain_history=true)"
    )
    astro.sql("INSERT INTO rp4 SELECT id, CONCAT('v', id) FROM range(1, 101)")
    astro.sql("DELETE FROM rp4 WHERE k <= 10")
    rel = astro.relation("rp4")
    del_gen = max(r.retired_at for r in astro.catalog.get_table("rp4").retired_regions)
    rel.vacuum(retain_generations=1000)  # everything inside the window
    assert rel.scan(as_of_seq=del_gen - 1).count() == 100  # snapshot intact
    rel.vacuum()  # unbounded: reclaim, floor rises
    with pytest.raises(ValueError, match="history floor"):
        rel.scan(as_of_seq=del_gen - 1)
    assert astro.sql("SELECT count(*) c FROM rp4").collect()[0].c == 90
    rel.compact()
    assert astro.sql("SELECT count(*) c FROM rp4").collect()[0].c == 90
