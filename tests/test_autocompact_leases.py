"""r13 — main-table auto-compaction (VERDICT r12 #4) and reader leases
(VERDICT r12 #5).

Auto-compaction: OPTIONS(autocompact=K) folds the LSM state back to
num_regions clean files whenever live fragments exceed K×num_regions
after an append commit — a trickle-append table stays bounded without
manual COMPACT, and point lookups stay narrow.  The combination with
retain_history is refused (compaction is the retention tier's reclaim
point).

Reader leases: every planned fragment read registers a TTL lease
(leases.py); a concurrent fold's gc_pending reclaim and VACUUM defer
leased files instead of deleting them, so a slow reader on a PLAIN-tier
table no longer loses files mid-query.  Leases expire crash-safely (a
dead reader just stops refreshing) and VACUUM DRY RUN reports deferred
files.  Runs in both fsops modes.
"""

import time

import pytest

from spark_sql_on_hbase_spark import fsops, leases
from spark_sql_on_hbase_spark.relation import AstroRelation
from spark_sql_on_hbase_spark.session import AstroSession


@pytest.fixture(params=["posix", "copy"])
def mode(request, monkeypatch):
    monkeypatch.setattr(fsops, "_mode", request.param)
    return request.param


# -- auto-compaction ----------------------------------------------------------


@pytest.mark.slow  # r16 (VERDICT r15 #1): soak/fuzz sweep — --runslow lane
def test_trickle_appends_stay_bounded(spark, tmp_path):
    a = AstroSession(spark, str(tmp_path / "ac_wh"))
    a.sql(
        "CREATE TABLE ac (k INT, v INT, PRIMARY KEY (k)) "
        "MAPPED BY (ac_ht, COLS=[v=f.v]) OPTIONS (regions=2, autocompact=3)"
    )
    for i in range(14):
        a.sql(f"INSERT INTO ac VALUES ({i}, {i * 10})")
        n = len(a.relation("ac").meta.regions)
        assert n <= 3 * 2 + 2, f"fragments unbounded: {n} after insert {i}"
    rel = a.relation("ac")
    # the table folded at least once and stayed queryable throughout
    assert len(rel.meta.regions) <= 3 * 2 + 2
    got = sorted((r.k, r.v) for r in rel.scan().collect())
    assert got == [(i, i * 10) for i in range(14)]
    # point lookups stay narrow post-compaction
    df, res = rel.scan_where("k = 3")
    assert [r.v for r in df.collect()] == [30]
    assert len(res.files) <= 2


def test_autocompact_resolves_upserts_too(spark, tmp_path):
    a = AstroSession(spark, str(tmp_path / "ac2_wh"))
    a.sql(
        "CREATE TABLE ac2 (k INT, v INT, PRIMARY KEY (k)) "
        "MAPPED BY (ac2_ht, COLS=[v=f.v]) OPTIONS (regions=2, autocompact=2)"
    )
    for i in range(10):
        a.sql(f"INSERT INTO ac2 VALUES (1, {i}), ({i + 10}, {i})")
    rel = a.relation("ac2")
    assert len(rel.meta.regions) <= 2 * 2 + 2
    # newest upsert value of the contended key won
    assert [r.v for r in rel.scan().filter("k = 1").collect()] == [9]


def test_autocompact_with_retention_refused(spark, tmp_path):
    a = AstroSession(spark, str(tmp_path / "ac3_wh"))
    with pytest.raises(ValueError, match="exclusive"):
        a.sql(
            "CREATE TABLE ac3 (k INT, v INT, PRIMARY KEY (k)) "
            "MAPPED BY (ac3_ht, COLS=[v=f.v]) "
            "OPTIONS (regions=2, autocompact=2, retain_history=true)"
        )


def test_autocompact_off_by_default(spark, tmp_path):
    a = AstroSession(spark, str(tmp_path / "ac4_wh"))
    a.sql(
        "CREATE TABLE ac4 (k INT, v INT, PRIMARY KEY (k)) "
        "MAPPED BY (ac4_ht, COLS=[v=f.v]) OPTIONS (regions=2)"
    )
    for i in range(8):
        a.sql(f"INSERT INTO ac4 VALUES ({i}, {i})")
    assert len(a.relation("ac4").meta.regions) > 2 * 2  # no silent folding


# -- reader leases ------------------------------------------------------------


def test_slow_reader_survives_fold_and_reclaim(spark, tmp_path, mode):
    wh = str(tmp_path / f"lease_wh_{mode}")
    a = AstroSession(spark, wh)
    a.sql(
        "CREATE TABLE lt (k INT, v INT, PRIMARY KEY (k)) "
        "MAPPED BY (lt_ht, COLS=[v=f.v]) OPTIONS (regions=4)"
    )
    csv = tmp_path / f"lt_{mode}.csv"
    csv.write_text("".join(f"{i},{i}\n" for i in range(1000)))
    a.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE lt")
    # the SLOW READER: plan a scan (registers the lease), don't run it
    reader = AstroSession(spark, wh).relation("lt")
    df, _res = reader.scan_where("v >= 0")
    # a sibling session folds (purge DELETE rewrites every region) and
    # its post-commit reclaim runs — leased files must be DEFERRED
    writer = AstroSession(spark, wh)
    writer.sql("DELETE FROM lt WHERE k % 2 = 0")
    # the planned frame still collects — no FileNotFound mid-flight
    assert df.count() == 1000
    # the deferral is visible: the fold's replaced files remain pending
    m = AstroSession(spark, wh).catalog.get_table("lt")
    assert m.gc_pending, "reclaim should have deferred leased files"
    # after the lease expires, the next touch completes the reclaim —
    # force expiry by rewriting lease files with a past expiry
    import glob as _glob
    import json as _json

    for p in _glob.glob(f"{wh}/**/_leases/*.json", recursive=True):
        blob = _json.load(open(p))
        blob["expires_at"] = time.time() - 1
        with open(p, "w") as f:
            _json.dump(blob, f)
    fresh = AstroSession(spark, wh).relation("lt")
    fresh._ensure_fresh_regions()
    m2 = fresh.catalog.get_table("lt")
    assert not m2.gc_pending, "expired leases must unblock the reclaim"
    assert fresh.scan().count() == 500


def test_vacuum_defers_leased_retired_fragments(spark, tmp_path, mode):
    wh = str(tmp_path / f"vlease_wh_{mode}")
    a = AstroSession(spark, wh)
    a.sql(
        "CREATE TABLE vt (k INT, v INT, PRIMARY KEY (k)) "
        "MAPPED BY (vt_ht, COLS=[v=f.v]) "
        "OPTIONS (regions=2, retain_history=true)"
    )
    csv = tmp_path / f"vt_{mode}.csv"
    csv.write_text("".join(f"{i},{i}\n" for i in range(200)))
    a.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE vt")
    a.sql("DELETE FROM vt WHERE k < 100")  # retires fragments
    # a slow reader of the PRE-DELETE snapshot: planning reads the
    # retired fragments → lease covers them
    reader = AstroSession(spark, wh).relation("vt")
    snap = reader.scan(as_of_seq=0)
    n_before = snap.count()  # materializes the plan over retired files
    # DRY RUN names the leased fragments as deferred
    rows = a.sql("VACUUM TABLE vt DRY RUN").collect()
    statuses = {r.status for r in rows}
    assert "deferred (reader lease)" in statuses, rows
    # real vacuum: leased fragments survive on disk
    out = a.sql("VACUUM TABLE vt").collect()[0].result
    assert "deferred by reader leases" in out
    assert snap.count() == n_before  # still readable mid-"vacuum"


def test_freshness_pass_keeps_own_lease_writer_releases(spark, tmp_path):
    """_run_gc releases the instance's own lease ONLY on the rewrite
    commit path: a crash-recovery freshness pass must not drop the lease
    protecting an earlier, still-unconsumed scan from the same
    instance."""
    from spark_sql_on_hbase_spark import leases

    wh = str(tmp_path / "own_wh")
    a = AstroSession(spark, wh)
    a.sql(
        "CREATE TABLE ot (k INT, v INT, PRIMARY KEY (k)) "
        "MAPPED BY (ot_ht, COLS=[v=f.v]) OPTIONS (regions=2)"
    )
    a.sql("INSERT INTO ot SELECT id, id FROM range(0, 200)")
    rel = a.relation("ot")
    df = rel.scan()  # plans a read → lease registered
    data_dir = rel.catalog.data_dir(rel.meta)
    assert leases.live_basenames(data_dir)
    # freshness pass (the crash-recovery caller) keeps the lease
    rel._ensure_fresh_regions()
    assert leases.live_basenames(data_dir), "freshness pass dropped own lease"
    assert df.count() == 200
    # a rewrite on the SAME instance releases it (the source read is
    # complete once the rewrite commits)
    rel.compact()
    import os

    assert not os.path.exists(
        os.path.join(leases.lease_dir(data_dir), f"{rel._lease_id}.json")
    )


def test_lease_module_roundtrip(tmp_path):
    d = str(tmp_path / "dd")
    leases.register(d, "abc", ["/x/part-1.parquet", "/y/part-2.parquet"], ttl=60)
    assert leases.live_basenames(d) == {"part-1.parquet", "part-2.parquet"}
    # refresh replaces, never accumulates
    leases.register(d, "abc", ["/x/part-3.parquet"], ttl=60)
    assert leases.live_basenames(d) == {"part-3.parquet"}
    # expiry reaps the file itself
    leases.register(d, "abc", ["/x/part-3.parquet"], ttl=-1)
    assert leases.live_basenames(d) == set()
    import os

    assert os.listdir(leases.lease_dir(d)) == []
    leases.release(d, "missing")  # no-op, no raise
