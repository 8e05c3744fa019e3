"""r8 (VERDICT r7 #6): TIMESTAMP AS OF time travel — commit wall-clock
recorded per LSM generation in the catalog (metadata only), resolved to
the newest generation <= t, reusing the history_floor guard and the
existing generation snapshot machinery.
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


def _gen_times(astro, name):
    return {int(k): v for k, v in astro.catalog.get_table(name).generation_times.items()}


def test_seq_for_timestamp_resolution(astro):
    astro.sql("CREATE TABLE tt (k INT, v STRING, PRIMARY KEY (k)) MAPPED BY (tt_ht)")
    astro.sql("INSERT INTO tt VALUES (1, 'g0')")      # generation 0
    t_after_g0 = time.time()
    time.sleep(0.02)
    astro.sql("INSERT INTO tt VALUES (1, 'g1')")      # generation 1
    t_after_g1 = time.time()
    time.sleep(0.02)
    astro.sql("INSERT INTO tt VALUES (1, 'g2')")      # generation 2

    rel = astro.relation("tt")
    gt = _gen_times(astro, "tt")
    assert set(gt) == {0, 1, 2}
    assert gt[0] <= gt[1] <= gt[2]

    assert rel.seq_for_timestamp(t_after_g0) == 0
    assert rel.seq_for_timestamp(t_after_g1) == 1
    assert rel.seq_for_timestamp(time.time()) == 2
    with pytest.raises(ValueError, match="no generation"):
        rel.seq_for_timestamp(gt[0] - 100)

    # resolved snapshots carry the generation's content
    assert rel.scan(as_of_seq=rel.seq_for_timestamp(t_after_g0)).collect()[0].v == "g0"
    assert rel.scan(as_of_seq=rel.seq_for_timestamp(t_after_g1)).collect()[0].v == "g1"


def test_timestamp_as_of_sql(astro):
    astro.sql("CREATE TABLE ts (k INT, v STRING, PRIMARY KEY (k)) MAPPED BY (ts_ht)")
    astro.sql("INSERT INTO ts VALUES (1, 'old')")
    t_mid = time.time()
    time.sleep(0.02)
    astro.sql("INSERT INTO ts VALUES (1, 'new')")

    # numeric epoch operand
    r = astro.sql(f"SELECT v FROM ts TIMESTAMP AS OF {t_mid}").collect()[0]
    assert r.v == "old"
    # quoted ISO literal (UTC)
    from datetime import datetime, timezone

    iso = datetime.fromtimestamp(t_mid, tz=timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S.%f"
    )
    r = astro.sql(f"SELECT v FROM ts TIMESTAMP AS OF '{iso}'").collect()[0]
    assert r.v == "old"
    # a future timestamp resolves to the current generation
    r = astro.sql(f"SELECT v FROM ts TIMESTAMP AS OF {time.time() + 3600}").collect()[0]
    assert r.v == "new"
    # the pattern inside a string literal is not rewritten
    r = astro.sql("SELECT 'ts TIMESTAMP AS OF 123' AS s").collect()[0]
    assert r.s == "ts TIMESTAMP AS OF 123"
    # joining a timestamp snapshot with the current state works
    rows = astro.sql(
        f"SELECT cur.v AS now, old.v AS was FROM ts cur "
        f"JOIN (SELECT * FROM ts TIMESTAMP AS OF {t_mid}) old ON cur.k = old.k"
    ).collect()
    assert (rows[0].now, rows[0].was) == ("new", "old")


def test_full_rewrite_folds_timestamp_history(astro):
    """COMPACT / INSERT OVERWRITE fold history to generation 0 stamped at
    rewrite time: a pre-compact timestamp no longer resolves (no
    generation existed at that time in the folded history)."""
    astro.sql("CREATE TABLE tf (k INT, v STRING, PRIMARY KEY (k)) MAPPED BY (tf_ht)")
    astro.sql("INSERT INTO tf VALUES (1, 'a')")
    t_pre = time.time()
    time.sleep(0.02)
    astro.sql("INSERT INTO tf VALUES (1, 'b')")
    astro.sql("COMPACT TABLE tf")
    rel = astro.relation("tf")
    gt = _gen_times(astro, "tf")
    assert set(gt) == {0} and gt[0] >= t_pre  # re-stamped at compact time
    with pytest.raises(ValueError, match="no generation"):
        rel.seq_for_timestamp(t_pre)
    assert rel.seq_for_timestamp(time.time()) == 0


def test_describe_extended_lists_generation_times(astro):
    astro.sql("CREATE TABLE td (k INT, v STRING, PRIMARY KEY (k)) MAPPED BY (td_ht)")
    astro.sql("INSERT INTO td VALUES (1, 'x')")
    astro.sql("INSERT INTO td VALUES (2, 'y')")
    rows = {r.col_name: (r.data_type, r.comment)
            for r in astro.sql("DESCRIBE EXTENDED td").collect()}
    assert "generation_times" in rows
    val, comment = rows["generation_times"]
    assert val.startswith("0: ") and ", 1: " in val
    assert "TIMESTAMP AS OF" in comment


def test_resolved_delete_retains_stamps_above_floor(astro, tmp_path):
    """r9 (VERDICT r8 #3): a RESOLVED pruned DELETE raises the floor but
    RETAINS surviving commit stamps — sound because a DELETE only
    removes rows, so the floor snapshot is the old floor snapshot minus
    the deleted keys (the same retroactive view the key-only purge
    serves).  Timestamps at/after the floor generation's commit resolve
    to the purged present; timestamps mapping below the floor refuse via
    the floor guard instead of history vanishing wholesale."""
    csv = tmp_path / "tp.csv"
    csv.write_text("".join(f"{k},v{k}\n" for k in range(1, 101)))
    astro.sql(
        "CREATE TABLE tp (k INT, v STRING, PRIMARY KEY (k)) "
        "MAPPED BY (tp_ht) OPTIONS (regions=4)"
    )
    astro.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE tp")
    t_g0 = time.time()
    time.sleep(0.05)
    astro.sql("INSERT INTO tp VALUES (500, 'new')")  # gen 1, disjoint key
    time.sleep(0.05)
    t_g1 = time.time()
    time.sleep(0.05)
    # the v-conjunct is residual → resolved island rewrite → floor fold
    astro.sql("DELETE FROM tp WHERE k = 10 AND v = 'v10'")
    rel = astro.relation("tp")
    stats = astro.last_write_stats
    assert 0 < stats["files_rewritten"] < stats["files_total"]
    assert stats["history"] == "folded-purge"
    # a timestamp mapping BELOW the floor refuses — via the floor guard,
    # with the informative message, not a blanket 'no generation'
    assert rel.seq_for_timestamp(t_g0) == 0
    with pytest.raises(ValueError, match="history floor"):
        rel.scan(as_of_seq=0).count()
    # a pre-DELETE timestamp at/after the floor generation's commit
    # resolves — to the PURGED present (retroactive view, never the
    # deleted row)
    n = rel.seq_for_timestamp(t_g1)
    assert n == 1
    got = rel.scan(as_of_seq=n)
    assert got.count() == 100  # 100 - k10 + k500
    assert got.filter("k = 10").count() == 0
    assert rel.seq_for_timestamp(time.time()) == 1
    # single-generation variant: residual delete on a one-generation
    # table — a timestamp between load and delete resolves to gen 0
    # (== floor) and serves the purged view
    astro.sql(
        "CREATE TABLE tq (k INT, v STRING, PRIMARY KEY (k)) "
        "MAPPED BY (tq_ht) OPTIONS (regions=4)"
    )
    csv2 = tmp_path / "tq.csv"
    csv2.write_text("".join(f"{k},v{k}\n" for k in range(1, 51)))
    astro.sql(f"LOAD DATA INPATH '{csv2}' INTO TABLE tq")
    time.sleep(0.05)
    t_mid = time.time()
    time.sleep(0.05)
    astro.sql("DELETE FROM tq WHERE k = 7 AND v = 'v7'")
    rel = astro.relation("tq")
    n = rel.seq_for_timestamp(t_mid)
    assert n == 0
    assert rel.scan(as_of_seq=n).count() == 49
    assert rel.scan(as_of_seq=n).filter("k = 7").count() == 0


def test_resolved_update_still_folds_timestamp_history(astro, tmp_path):
    """UPDATE through the resolved rewrite changes VALUES, so the
    retroactive-stamp retention that is sound for DELETE is NOT applied:
    every pre-rewrite timestamp refuses ('no generation' — all stamps
    re-set at rewrite time) instead of silently serving post-update
    data for a pre-update time (r8 review, preserved for updates)."""
    csv = tmp_path / "tu.csv"
    csv.write_text("".join(f"{k},v{k}\n" for k in range(1, 101)))
    astro.sql(
        "CREATE TABLE tu (k INT, v STRING, PRIMARY KEY (k)) "
        "MAPPED BY (tu_ht) OPTIONS (regions=4)"
    )
    astro.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE tu")
    time.sleep(0.05)
    t_mid = time.time()
    time.sleep(0.05)
    # residual WHERE + NULL-routing SET → resolved island rewrite (the
    # append path cannot represent an erase; non-null SETs append)
    astro.sql("UPDATE tu SET v = NULL WHERE k = 10 AND v = 'v10'")
    rel = astro.relation("tu")
    stats = astro.last_write_stats
    assert 0 < stats["files_rewritten"] < stats["files_total"]
    assert stats["history"] == "folded"
    with pytest.raises(ValueError, match="no generation"):
        rel.seq_for_timestamp(t_mid)
    n = rel.seq_for_timestamp(time.time())
    assert rel.scan(as_of_seq=n).filter("k = 10 AND v IS NULL").count() == 1


def test_keyonly_delete_preserves_timestamp_history_as_purge(astro, tmp_path):
    """r8: a KEY-ONLY delete is a per-fragment retroactive purge —
    commit stamps survive, pre-delete timestamps still resolve, and the
    snapshots they select show their generation MINUS the purged key
    (GDPR-erasure semantics; no post-delete data leaks into pre-delete
    times because the purge touched every generation consistently)."""
    csv = tmp_path / "tk.csv"
    csv.write_text("".join(f"{k},v{k}\n" for k in range(1, 101)))
    astro.sql(
        "CREATE TABLE tk (k INT, v STRING, PRIMARY KEY (k)) "
        "MAPPED BY (tk_ht) OPTIONS (regions=4)"
    )
    astro.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE tk")
    t_g0 = time.time()
    time.sleep(0.02)
    astro.sql("INSERT INTO tk VALUES (500, 'new')")  # gen 1
    astro.sql("DELETE FROM tk WHERE k = 10")  # key-only → purge
    rel = astro.relation("tk")
    assert 0 < astro.last_write_stats["files_rewritten"] < astro.last_write_stats["files_total"]
    n = rel.seq_for_timestamp(t_g0)
    assert n == 0
    snap = rel.scan(as_of_seq=n)
    assert snap.count() == 99  # gen 0 minus the purged key
    assert snap.filter("k = 10").count() == 0
    assert snap.filter("k = 500").count() == 0  # gen-1 row not in gen 0


def test_rewriting_newest_generation_keeps_current_readable(astro, tmp_path):
    """r8 review #2 (second pass): when the island closure rewrites the
    NEWEST generation's fragments (the upsert that made the island), the
    floor must settle at the post-rewrite max — a pre-rewrite-max floor
    would exceed every surviving generation and make ALL versioned reads
    (including TIMESTAMP AS OF now) raise until COMPACT."""
    csv = tmp_path / "tn.csv"
    csv.write_text("".join(f"{k},v{k}\n" for k in range(1, 101)))
    astro.sql(
        "CREATE TABLE tn (k INT, v STRING, PRIMARY KEY (k)) "
        "MAPPED BY (tn_ht) OPTIONS (regions=4)"
    )
    astro.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE tn")
    astro.sql("INSERT INTO tn VALUES (50, 'upd')")  # gen 1, overlaps one island
    astro.sql("DELETE FROM tn WHERE k = 50")  # island rewrite pulls gen 1 in
    rel = astro.relation("tn")
    stats = astro.last_write_stats
    assert 0 < stats["files_rewritten"] < stats["files_total"]
    # every surviving fragment is generation 0 again; current state must
    # stay reachable through BOTH time-travel surfaces
    assert rel.current_seq() == 0
    n = rel.seq_for_timestamp(time.time())
    assert rel.scan(as_of_seq=n).count() == 99
    assert astro.sql("SELECT count(*) AS c FROM tn VERSION AS OF 0").collect()[0].c == 99
    r = astro.sql(
        f"SELECT count(*) AS c FROM tn TIMESTAMP AS OF {time.time() + 60}"
    ).collect()[0]
    assert r.c == 99


def test_legacy_table_backfills_stamps_from_mtimes(astro):
    """r9 (VERDICT r8 #3 + ADVICE r8): a table whose catalog predates
    commit stamping (empty generation_times) backfills per-generation
    stamps from file MTIMES at the next region-freshness check — so
    TIMESTAMP AS OF works without requiring a write first, and the
    backfilled times are the physical commit times, not discovery time."""
    astro.sql("CREATE TABLE tl (k INT, v STRING, PRIMARY KEY (k)) MAPPED BY (tl_ht)")
    astro.sql("INSERT INTO tl VALUES (1, 'g0')")
    time.sleep(0.05)
    t_mid = time.time()
    time.sleep(0.05)
    astro.sql("INSERT INTO tl VALUES (2, 'g1')")
    # simulate legacy metadata: wipe the stamps in the durable catalog
    meta = astro.catalog.get_table("tl")
    meta.generation_times = {}
    astro.catalog.persist(meta)
    t_discover = time.time()
    rel = astro.relation("tl")
    assert rel.seq_for_timestamp(t_mid) == 0          # backfilled, resolves
    assert rel.seq_for_timestamp(time.time()) == 1
    gt = _gen_times(astro, "tl")
    assert set(gt) == {0, 1}
    # stamps are the files' write times, NOT the discovery time
    assert gt[0] < t_mid < gt[1] <= t_discover
    assert rel.scan(as_of_seq=0).count() == 1


# --- r10 (VERDICT r9 #1): MVCC retention for resolved rewrites -------------


def _load_retained(astro, tmp_path, name, n=100):
    csv = tmp_path / f"{name}.csv"
    csv.write_text("".join(f"{k},v{k}\n" for k in range(1, n + 1)))
    astro.sql(
        f"CREATE TABLE {name} (k INT, v STRING, PRIMARY KEY (k)) "
        f"MAPPED BY ({name}_ht) OPTIONS (regions=4, retain_history=true)"
    )
    astro.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE {name}")


def test_retained_update_keeps_pre_update_snapshots(astro, tmp_path):
    """retain_history=true: a NULL-routing UPDATE takes the RETAINED
    island rewrite — replaced fragments are retired at a new generation
    and every pre-update VERSION/TIMESTAMP AS OF still serves the
    pre-update values (the reference's HBase cell-version model,
    doc §23 setTimeRange)."""
    _load_retained(astro, tmp_path, "tr")
    t_g0 = time.time()
    time.sleep(0.05)
    astro.sql("INSERT INTO tr VALUES (500, 'new')")  # gen 1, disjoint key
    time.sleep(0.05)
    t_g1 = time.time()
    time.sleep(0.05)
    astro.sql("UPDATE tr SET v = NULL WHERE k = 10 AND v = 'v10'")
    rel = astro.relation("tr")
    stats = astro.last_write_stats
    assert stats["history"] == "retained"
    assert 0 < stats["files_rewritten"] < stats["files_total"]
    meta = astro.catalog.get_table("tr")
    assert meta.history_floor == 0  # retention: the floor does NOT move
    assert len(meta.retired_regions) == stats["files_rewritten"]
    # pre-update snapshots: both generations keep their original values
    assert rel.seq_for_timestamp(t_g0) == 0
    snap0 = rel.scan(as_of_seq=0)
    assert snap0.count() == 100
    assert snap0.filter("k = 10").collect()[0].v == "v10"
    assert rel.seq_for_timestamp(t_g1) == 1
    snap1 = rel.scan(as_of_seq=1)
    assert snap1.count() == 101
    assert snap1.filter("k = 10").collect()[0].v == "v10"
    # the present (new generation) carries the NULL
    assert rel.seq_for_timestamp(time.time()) == 2
    now = astro.sql("SELECT * FROM tr").collect()
    assert len(now) == 101
    assert [r.v for r in now if r.k == 10] == [None]
    # SQL time travel agrees
    r = astro.sql(f"SELECT v FROM tr TIMESTAMP AS OF {t_g1} WHERE k = 10").collect()
    assert [x.v for x in r] == ["v10"]
    r = astro.sql("SELECT v FROM tr VERSION AS OF 0 WHERE k = 10").collect()
    assert [x.v for x in r] == ["v10"]
    # DESCRIBE EXTENDED surfaces the retention state
    rows = {r.col_name: r.data_type
            for r in astro.sql("DESCRIBE EXTENDED tr").collect()}
    assert rows["retain_history"] == "true"
    assert int(rows["retired_files"]) == stats["files_rewritten"]


def test_retained_delete_keeps_deleted_rows_in_history(astro, tmp_path):
    _load_retained(astro, tmp_path, "trd")
    time.sleep(0.05)
    t_pre = time.time()
    time.sleep(0.05)
    astro.sql("DELETE FROM trd WHERE k = 10")  # key-only, but retention
    rel = astro.relation("trd")
    stats = astro.last_write_stats
    assert stats["history"] == "retained"  # NOT the retroactive purge
    assert 0 < stats["files_rewritten"] < stats["files_total"]
    # pre-delete snapshot still shows the deleted row
    n = rel.seq_for_timestamp(t_pre)
    assert n == 0
    assert rel.scan(as_of_seq=n).filter("k = 10").count() == 1
    # the present does not
    assert astro.sql("SELECT * FROM trd WHERE k = 10").count() == 0
    assert rel.scan(as_of_seq=rel.seq_for_timestamp(time.time())).filter(
        "k = 10"
    ).count() == 0


def test_retained_full_fallback_on_unprunable_update(astro, tmp_path):
    """A WHERE that prunes nothing (non-key column) cannot take the
    island path; under retention the whole table rewrites at a NEW
    generation with every live fragment retired — never a fold."""
    _load_retained(astro, tmp_path, "trf")
    time.sleep(0.05)
    t_pre = time.time()
    time.sleep(0.05)
    astro.sql("UPDATE trf SET v = NULL WHERE v = 'v10'")
    rel = astro.relation("trf")
    stats = astro.last_write_stats
    assert stats["history"] == "retained"
    assert stats["files_rewritten"] == stats["files_total"] > 0
    assert rel.scan(as_of_seq=rel.seq_for_timestamp(t_pre)).filter(
        "k = 10"
    ).collect()[0].v == "v10"
    now = astro.sql("SELECT v FROM trf WHERE k = 10").collect()
    assert [r.v for r in now] == [None]
    # appends after a retained full rewrite take a FRESH generation
    astro.sql("INSERT INTO trf VALUES (600, 'g2')")
    meta = astro.catalog.get_table("trf")
    assert max(r.seq for r in meta.regions) == 2
    assert rel.scan(as_of_seq=0).filter("k = 600").count() == 0


def test_retained_merge_delete(astro, tmp_path):
    _load_retained(astro, tmp_path, "trm")
    astro.sql("CREATE TABLE trm_src (k INT, x STRING, PRIMARY KEY (k)) MAPPED BY (trm_src_ht)")
    astro.sql("INSERT INTO trm_src VALUES (10, 'hit')")
    time.sleep(0.05)
    t_pre = time.time()
    time.sleep(0.05)
    astro.sql(
        "MERGE INTO trm AS t USING trm_src AS s ON t.k = s.k "
        "WHEN MATCHED THEN DELETE"
    )
    rel = astro.relation("trm")
    assert astro.last_write_stats["history"] == "retained"
    assert rel.scan(as_of_seq=rel.seq_for_timestamp(t_pre)).filter(
        "k = 10"
    ).count() == 1
    assert astro.sql("SELECT * FROM trm WHERE k = 10").count() == 0


def test_retained_compact_reclaims(astro, tmp_path):
    """COMPACT is the retention reclaim point: retired fragments are
    physically dropped, metadata cleared, history folds to gen 0."""
    import os

    _load_retained(astro, tmp_path, "trc")
    t_pre = time.time()
    time.sleep(0.05)
    astro.sql("UPDATE trc SET v = NULL WHERE k BETWEEN 10 AND 20")
    meta = astro.catalog.get_table("trc")
    assert meta.retired_regions
    retired_paths = [r.path for r in meta.retired_regions]
    astro.sql("COMPACT TABLE trc")
    meta = astro.catalog.get_table("trc")
    assert meta.retired_regions == []
    from spark_sql_on_hbase_spark.relation import AstroRelation

    for p in retired_paths:
        assert not os.path.exists(AstroRelation._local_path(p))
    rel = astro.relation("trc")
    with pytest.raises(ValueError, match="no generation"):
        rel.seq_for_timestamp(t_pre)
    # present unchanged by the reclaim
    assert astro.sql("SELECT * FROM trc WHERE v IS NULL").count() == 11


def test_vacuum_reclaims_retired_only(astro, tmp_path):
    """VACUUM TABLE (r10): drops ONLY retired fragments — live files
    byte-identical, pre-rewrite snapshots refuse afterwards, the present
    and post-rewrite history stay readable, and `TIMESTAMP AS OF now`
    still resolves (incl. the zero-survivor-rewrite edge where the floor
    generation's stamp lives only through the retired list)."""
    import os

    _load_retained(astro, tmp_path, "tv")
    t_pre = time.time()
    time.sleep(0.05)
    astro.sql("UPDATE tv SET v = NULL WHERE k = 10 AND v = 'v10'")
    rel = astro.relation("tv")
    meta = astro.catalog.get_table("tv")
    retired_paths = [r.path for r in meta.retired_regions]
    live_before = {
        r.path: os.stat(rel._local_path(r.path)).st_ino for r in meta.regions
    }
    assert retired_paths
    astro.sql("VACUUM TABLE tv")
    stats = astro.last_write_stats
    assert stats["retired_files_removed"] == len(retired_paths)
    meta = astro.catalog.get_table("tv")
    assert meta.retired_regions == []
    for p in retired_paths:
        assert not os.path.exists(rel._local_path(p))
    # live fragments untouched (same inode — byte-identical)
    for p, ino in live_before.items():
        assert os.stat(rel._local_path(p)).st_ino == ino
    # pre-rewrite snapshots now refuse via the floor guard
    assert meta.history_floor == 1
    with pytest.raises(ValueError, match="history floor"):
        rel.scan(as_of_seq=0).count()
    # the present stays fully readable through both surfaces
    assert astro.sql("SELECT * FROM tv").count() == 100
    n = rel.seq_for_timestamp(time.time())
    assert n >= 1
    assert rel.scan(as_of_seq=n).filter("k = 10").collect()[0].v is None
    # vacuum of a clean table is a no-op
    astro.sql("VACUUM TABLE tv")
    assert astro.last_write_stats["retired_files_removed"] == 0

    # zero-survivor edge: a retained DELETE that empties its islands
    # leaves the new generation stamped only via the sidecar stamp —
    # vacuum must keep "now" resolvable
    _load_retained(astro, tmp_path, "tv2", n=20)
    astro.sql("DELETE FROM tv2 WHERE k BETWEEN 1 AND 20")  # everything
    rel2 = astro.relation("tv2")
    astro.sql("VACUUM TABLE tv2")
    assert astro.sql("SELECT * FROM tv2").count() == 0
    n2 = rel2.seq_for_timestamp(time.time())
    assert n2 >= rel2.meta.history_floor
    assert rel2.scan(as_of_seq=n2).count() == 0
    with pytest.raises(ValueError, match="no generation"):
        rel2.seq_for_timestamp(t_pre - 10_000)


def test_retention_toggle_on_existing_table(astro, tmp_path):
    """The property can be enabled on an existing table through the
    catalog (the Python API surface); the next resolved rewrite retains."""
    csv = tmp_path / "trt.csv"
    csv.write_text("".join(f"{k},v{k}\n" for k in range(1, 51)))
    astro.sql(
        "CREATE TABLE trt (k INT, v STRING, PRIMARY KEY (k)) "
        "MAPPED BY (trt_ht) OPTIONS (regions=4)"
    )
    astro.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE trt")
    meta = astro.catalog.get_table("trt")
    meta.retain_history = True
    astro.catalog.persist(meta)
    t_pre = time.time()
    time.sleep(0.05)
    astro.sql("UPDATE trt SET v = NULL WHERE k = 5 AND v = 'v5'")
    assert astro.last_write_stats["history"] == "retained"
    rel = astro.relation("trt")
    assert rel.scan(
        as_of_seq=rel.seq_for_timestamp(t_pre)
    ).filter("k = 5").collect()[0].v == "v5"


def test_retention_on_zorder_and_bucketed_layouts(astro, tmp_path):
    """Retention is layout-independent: z-order tables skip the z fast
    path (it reuses the source generation) and take the island path;
    bucketed tables demote to range like every partial rewrite."""
    astro.sql(
        "CREATE TABLE trz (k1 INT, k2 INT, v DOUBLE, PRIMARY KEY (k1, k2)) "
        "MAPPED BY (trz_ht, COLS=[v=f.v]) "
        "OPTIONS(regions=8, layout=zorder, retain_history=true)"
    )
    rel = astro.relation("trz")
    df = rel.spark.range(4000).selectExpr(
        "CAST(pmod(id*7,100) AS INT) k1", "CAST(id/100 AS INT) k2",
        "CAST(id AS DOUBLE) v",
    )
    rel.write(df)
    rel.register_view("trz")
    t_pre = time.time()
    time.sleep(0.05)
    astro.sql("DELETE FROM trz WHERE k1 BETWEEN 10 AND 12")
    assert astro.last_write_stats["history"] == "retained"
    n = rel.seq_for_timestamp(t_pre)
    assert rel.scan(as_of_seq=n).filter("k1 BETWEEN 10 AND 12").count() == 120
    assert astro.sql("SELECT * FROM trz WHERE k1 BETWEEN 10 AND 12").count() == 0

    astro.sql(
        "CREATE TABLE trb (k INT, v STRING, PRIMARY KEY (k)) MAPPED BY (trb_ht) "
        "OPTIONS(regions=4, align=1, retain_history=true)"
    )
    r2 = astro.relation("trb")
    r2.write(
        r2.spark.range(1, 1001).selectExpr("CAST(id AS INT) k", "concat('v', id) v"),
        align_prefix=1,
    )
    r2.register_view("trb")
    t2 = time.time()
    time.sleep(0.05)
    astro.sql("UPDATE trb SET v = NULL WHERE k BETWEEN 100 AND 120")
    st = astro.last_write_stats
    assert st["history"] == "retained" and st["files_rewritten"] < st["files_total"]
    assert r2.meta.layout == "range"  # demoted like every partial rewrite
    assert r2.scan(
        as_of_seq=r2.seq_for_timestamp(t2)
    ).filter("k = 100").collect()[0].v == "v100"
    assert astro.sql("SELECT v FROM trb WHERE k = 100").collect()[0].v is None


def test_retained_metadata_survives_sessions(astro, tmp_path):
    """retired_regions and retain_history round-trip through the JSON
    catalog: a fresh session over the same warehouse serves the same
    snapshots and never re-adopts retired fragments as live."""
    _load_retained(astro, tmp_path, "trs", n=50)
    t_pre = time.time()
    time.sleep(0.05)
    astro.sql("DELETE FROM trs WHERE k = 7")
    rel = astro.relation("trs")
    fresh = AstroSession(rel.spark, astro.catalog.root)
    meta2 = fresh.catalog.get_table("trs")
    assert meta2.retain_history and meta2.retired_regions
    rel2 = fresh.relation("trs")
    assert fresh.sql("SELECT * FROM trs").count() == 49
    n = rel2.seq_for_timestamp(t_pre)
    assert rel2.scan(as_of_seq=n).filter("k = 7").count() == 1


def test_writer_path_stamp_does_not_depend_on_mtime(astro, monkeypatch):
    """r10 (VERDICT r9 #5): the WRITING session stamps the generation it
    just committed directly (it knows the commit wall-clock exactly);
    file mtimes are consulted only for sibling-discovered generations.
    Object stores don't preserve mtime semantics — so with mtime
    reporting garbage, the writer's own stamp must still be exact,
    while a sibling discovering the files later falls back to mtime."""
    import spark_sql_on_hbase_spark.catalog as catmod

    astro.sql("CREATE TABLE tw (k INT, v STRING, PRIMARY KEY (k)) MAPPED BY (tw_ht)")
    astro.sql("INSERT INTO tw VALUES (1, 'g0')")
    # sabotage mtime: every lookup now returns epoch 0
    monkeypatch.setattr(catmod.os.path, "getmtime", lambda p: 0.0)
    t_before = time.time()
    astro.sql("INSERT INTO tw VALUES (2, 'g1')")  # writer-path stamp
    t_after = time.time()
    gt = _gen_times(astro, "tw")
    assert t_before <= gt[1] <= t_after, gt  # NOT 0.0 — no mtime involved
    rel = astro.relation("tw")
    assert rel.seq_for_timestamp(t_after) == 1
    # sibling discovery still uses the (sabotaged) mtime fallback: wipe
    # the stamps and re-discover — gen stamps become 0.0, proving the
    # fallback is the only mtime consumer
    meta = astro.catalog.get_table("tw")
    meta.generation_times = {}
    astro.catalog.persist(meta)
    astro.relation("tw").current_seq()  # freshness check → legacy backfill
    gt = _gen_times(astro, "tw")
    assert gt == {0: 0.0, 1: 0.0}, gt


def test_changes_feed(astro, tmp_path):
    """r10: generation-range change-data feed — newest-version-in-range
    keys resolved at the to-snapshot, tagged insert/update with the
    commit generation; floor-guarded; empty range yields the declared
    schema."""
    csv = tmp_path / "cf.csv"
    csv.write_text("".join(f"{k},v{k}\n" for k in range(1, 51)))
    astro.sql(
        "CREATE TABLE cf (k INT, v STRING, PRIMARY KEY (k)) "
        "MAPPED BY (cf_ht) OPTIONS (regions=4)"
    )
    astro.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE cf")  # gen 0
    rel = astro.relation("cf")
    rel.append(  # gen 1: one update + one insert in ONE generation
        rel.spark.createDataFrame([(10, "upd10"), (60, "new60")], "k int, v string")
    )
    rel.append(  # gen 2
        rel.spark.createDataFrame([(10, "upd10b"), (61, "new61")], "k int, v string")
    )

    ch = {r.k: (r.v, r._change_type, r._commit_seq) for r in rel.changes(0).collect()}
    assert ch == {
        10: ("upd10b", "update", 2),   # resolved at the TO snapshot
        60: ("new60", "insert", 1),
        61: ("new61", "insert", 2),
    }
    # bounded upper end: gen-2 rows invisible, key 10 resolves at gen 1
    ch1 = {r.k: (r.v, r._change_type, r._commit_seq)
           for r in rel.changes(0, 1).collect()}
    assert ch1 == {10: ("upd10", "update", 1), 60: ("new60", "insert", 1)}
    # empty range: declared schema, zero rows
    empty = rel.changes(2)
    assert empty.count() == 0
    assert "_change_type" in empty.columns and "_commit_seq" in empty.columns
    with pytest.raises(ValueError, match="from_seq"):
        rel.changes(5, 1)
    # a folding rewrite raises the floor; a pre-floor feed must refuse
    astro.sql("DELETE FROM cf WHERE k = 20 AND v = 'v20'")  # resolved fold
    assert astro.last_write_stats["history"] == "folded-purge"
    with pytest.raises(ValueError, match="history floor"):
        rel.changes(0)

    # retention interplay: a retained rewrite re-lands its whole island
    # at the new generation — every island key appears in the feed
    # (documented coarseness), with values resolved post-write
    _load_retained(astro, tmp_path, "cfr", n=40)
    astro.sql("UPDATE cfr SET v = NULL WHERE k = 5 AND v = 'v5'")
    rr = astro.relation("cfr")
    feed = {r.k: (r.v, r._change_type) for r in rr.changes(0).collect()}
    assert feed[5] == (None, "update")
    assert all(t == "update" for _v, t in feed.values())
    assert 0 < len(feed) <= 40


def test_sibling_append_stamped_at_commit_not_discovery(astro):
    """ADVICE r8: a sibling writer's append discovered later must carry
    its COMMIT time (file mtime), not the discovery time — otherwise a
    timestamp in the commit..discovery window resolves to the older
    generation."""
    astro.sql("CREATE TABLE ts2 (k INT, v STRING, PRIMARY KEY (k)) MAPPED BY (ts2_ht)")
    astro.sql("INSERT INTO ts2 VALUES (1, 'g0')")
    rel = astro.relation("ts2")
    # sibling session over the same warehouse appends gen 1
    sib = AstroSession(rel.spark, astro.catalog.root)
    sib.sql("INSERT INTO ts2 VALUES (2, 'g1')")
    t_commit = time.time()
    time.sleep(0.2)
    # this session discovers the append only now; the stamp must predate
    # the discovery gap, so a commit-window timestamp resolves to gen 1
    sib_free = astro.relation("ts2")
    assert sib_free.seq_for_timestamp(t_commit + 0.1) == 1
    gt = _gen_times(astro, "ts2")
    assert gt[1] <= t_commit
