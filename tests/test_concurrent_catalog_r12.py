"""r12 VERDICT r11 #1 — optimistic-concurrency catalog commits.

Two AstroSessions over ONE warehouse (separate AstroCatalog instances =
separate metadata caches, i.e. genuinely stale reads) interleave writes
on one table.  Before r12, `catalog._write` was an unconditional
replace: the second committer's read-modify-write silently discarded
the first's retirements / commit stamps / generation ops.  Now every
commit compare-and-swaps on a persisted ``meta_version`` under a
create-if-absent lock; appends and retained rewrites reload + re-apply
on conflict (commutative), folds and conflicting rewrites abort with
``ConcurrentWriteError``.

Runs in BOTH fsops modes (the lock primitive is a conditional put on
object stores; no hard-link/rename dependence).

Reference: HBase's single-row metadata store gives the original this
atomicity for free (HBaseCatalog.scala:253-271); we rebuild it over the
single-object metadata replace.
"""

import pytest

from spark_sql_on_hbase_spark import fsops
from spark_sql_on_hbase_spark.catalog import ConcurrentWriteError
from spark_sql_on_hbase_spark.session import AstroSession


@pytest.fixture(params=["posix", "copy"])
def mode(request, monkeypatch):
    monkeypatch.setattr(fsops, "_mode", request.param)
    return request.param


def _mk_sessions(spark, tmp_path, name, retain=True, n=100):
    wh = str(tmp_path / "warehouse")
    a = AstroSession(spark, wh)
    csv = tmp_path / f"{name}.csv"
    csv.write_text("".join(f"{k},v{k}\n" for k in range(1, n + 1)))
    a.sql(
        f"CREATE TABLE {name} (k INT, v STRING, PRIMARY KEY (k)) "
        f"MAPPED BY ({name}_ht) OPTIONS (regions=4"
        + (", retain_history=true" if retain else "")
        + ")"
    )
    a.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE {name}")
    b = AstroSession(spark, wh)  # separate catalog cache = stale reads
    b.catalog.get_table(name)  # prime B's (soon-stale) cache
    return a, b


def test_append_after_stale_read_keeps_sibling_retirements(spark, tmp_path, mode):
    """Order 1: A retires (retained DELETE) while B holds a stale meta;
    B's append must not lose A's retirements/stamps."""
    a, b = _mk_sessions(spark, tmp_path, "cc1")
    a.sql("DELETE FROM cc1 WHERE k <= 25")  # A: retained rewrite
    meta_a = a.catalog.get_table("cc1")
    retired_paths = {r.path for r in meta_a.retired_regions}
    assert retired_paths
    del_gen = max(r.retired_at for r in meta_a.retired_regions)
    # B appends from its stale cache: the finalize CAS detects A's
    # commit, reloads, re-applies
    b.sql("INSERT INTO cc1 VALUES (500, 'late')")
    # disk truth: A's retirements + stamps survived, B's row landed
    c = AstroSession(spark, a.catalog.root)
    meta = c.catalog.get_table("cc1")
    assert {r.path for r in meta.retired_regions} == retired_paths
    assert str(del_gen) in meta.generation_times
    assert c.sql("SELECT count(*) c FROM cc1 WHERE k = 500").collect()[0].c == 1
    assert c.sql("SELECT count(*) c FROM cc1 WHERE k <= 25").collect()[0].c == 0
    # generation numbers never collided: B's append got a fresh one
    b_gen = max(r.seq for r in meta.regions)
    assert b_gen != del_gen
    # and the pre-delete snapshot still serves through the retirements
    snap = c.relation("cc1").scan(as_of_seq=0)
    assert snap.filter("k <= 25").count() == 25


def test_retained_delete_after_stale_read_keeps_sibling_append(spark, tmp_path, mode):
    """Order 2: B appends first; A (stale) then runs a retained DELETE.
    A's commit must adopt B's new fragments instead of dropping them."""
    a, b = _mk_sessions(spark, tmp_path, "cc2")
    # A primes a relation (and stale cache) BEFORE B's append
    rel_a = a.relation("cc2")
    assert rel_a.committed_seq() == 0
    b.sql("INSERT INTO cc2 VALUES (600, 'from-b')")
    b_gen = max(r.seq for r in b.catalog.get_table("cc2").regions)
    assert b_gen >= 1
    # A's retained delete: freshness probe sees B's version bump → reload
    a.sql("DELETE FROM cc2 WHERE k <= 25")
    c = AstroSession(spark, a.catalog.root)
    assert c.sql("SELECT count(*) c FROM cc2 WHERE k = 600").collect()[0].c == 1
    assert c.sql("SELECT count(*) c FROM cc2 WHERE k <= 25").collect()[0].c == 0
    meta = c.catalog.get_table("cc2")
    assert meta.retired_regions  # the delete retired, didn't fold


def test_forced_conflict_retries_on_append(spark, tmp_path, mode, monkeypatch):
    """Injected stale read at the COMMIT itself: A commits between B's
    file write and B's finalize — B must hit ConcurrentWriteError
    internally and converge (not silently clobber)."""
    a, b = _mk_sessions(spark, tmp_path, "cc3")
    rel_b = b.relation("cc3")
    orig_refresh = type(rel_b)._refresh_region_bounds
    fired = {"n": 0}

    def sneak(self, *args, **kwargs):
        # A's retained delete lands exactly once, after B wrote its
        # fragment files but before B's finalize commit
        if fired["n"] == 0 and self.meta.name == "cc3":
            fired["n"] = 1
            a.sql("DELETE FROM cc3 WHERE k <= 25")
        return orig_refresh(self, *args, **kwargs)

    monkeypatch.setattr(type(rel_b), "_refresh_region_bounds", sneak)
    b.sql("INSERT INTO cc3 VALUES (700, 'race')")
    monkeypatch.setattr(type(rel_b), "_refresh_region_bounds", orig_refresh)
    c = AstroSession(spark, a.catalog.root)
    meta = c.catalog.get_table("cc3")
    assert meta.retired_regions  # A's retirements survived B's commit
    assert c.sql("SELECT count(*) c FROM cc3 WHERE k = 700").collect()[0].c == 1
    assert c.sql("SELECT count(*) c FROM cc3 WHERE k <= 25").collect()[0].c == 0


@pytest.mark.slow  # r16 (VERDICT r15 #1): soak/fuzz sweep — --runslow lane
def test_streaming_sink_races_batch_update(spark, tmp_path, mode):
    """The verdict's named scenario: a streaming sink (micro-batch
    appends) interleaved with a batch UPDATE from a second session —
    every micro-batch and the update must all survive."""
    a, b = _mk_sessions(spark, tmp_path, "cc4", n=40)
    rel_b = b.relation("cc4")
    schema = rel_b.scan().schema
    for i in range(3):  # sink side: trickle appends from B's stale-ish cache
        batch = spark.createDataFrame([(1000 + i, f"s{i}")], schema)
        rel_b.append(batch, fragments=1)
        if i == 1:
            # batch side: A updates mid-stream (upsert append from a
            # second session; generation reserved through the CAS)
            a.sql("UPDATE cc4 SET v = 'patched' WHERE k = 7")
    c = AstroSession(spark, a.catalog.root)
    rows = {r.k: r.v for r in c.sql("SELECT k, v FROM cc4").collect()}
    assert rows[7] == "patched"
    for i in range(3):
        assert rows[1000 + i] == f"s{i}"
    # every commit kept its own stamped generation (reservation prevents
    # number collisions): load + 3 micro-batches + the update
    meta = c.catalog.get_table("cc4")
    assert len(meta.generation_times) >= 5
    seqs = sorted(r.seq for r in meta.regions)
    assert len(set(seqs)) == len(meta.generation_times)


def test_fold_conflict_aborts_cleanly(spark, tmp_path, mode):
    """Non-commutative path: a whole-table fold (COMPACT) racing a
    sibling commit must raise ConcurrentWriteError and leave the table
    exactly as the sibling's commit built it."""
    a, b = _mk_sessions(spark, tmp_path, "cc5", retain=False)
    rel_a = a.relation("cc5")
    df = rel_a.scan().select(*[c for c, _ in rel_a.meta.all_columns])
    df = df.filter("k <= 90")  # the fold's contents, computed pre-race
    # B commits while A's fold is "in flight" (before A's commit)
    b.sql("INSERT INTO cc5 VALUES (800, 'winner')")
    with pytest.raises(ConcurrentWriteError, match="re-run"):
        rel_a._rewrite_with(df, op="OVERWRITE")
    c = AstroSession(spark, a.catalog.root)
    assert c.sql("SELECT count(*) c FROM cc5 WHERE k = 800").collect()[0].c == 1
    assert c.sql("SELECT count(*) c FROM cc5").collect()[0].c == 101


def test_conflicting_fragment_rewrite_aborts(spark, tmp_path, mode):
    """require_live: two retained DELETEs over the SAME fragments from
    two stale sessions — the second must abort (its survivors were
    computed from fragments the first already retired), never
    double-retire."""
    a, b = _mk_sessions(spark, tmp_path, "cc6")
    rel_b = b.relation("cc6")
    rel_b._ensure_fresh_regions()  # B's view is now current…
    a.sql("DELETE FROM cc6 WHERE k <= 25")  # …then A retires first

    # drive B's delete directly through the retained island rewrite with
    # a STALE base (bypassing the session-level freshness probe)
    import pyspark.sql.functions as F

    with pytest.raises(ConcurrentWriteError):
        # patch freshness to a no-op so B genuinely acts on stale state
        orig = type(rel_b)._ensure_fresh_regions
        try:
            type(rel_b)._ensure_fresh_regions = lambda self: None
            rel_b.rewrite_pruned(
                "k <= 25",
                lambda df: df.filter(F.expr("NOT coalesce((k <= 25), false)")),
                preserve_stamps=True,
            )
        finally:
            type(rel_b)._ensure_fresh_regions = orig
    # disk state: A's single delete, applied exactly once
    c = AstroSession(spark, a.catalog.root)
    meta = c.catalog.get_table("cc6")
    paths = [r.path for r in meta.retired_regions]
    assert len(paths) == len(set(paths))  # no double retirement
    assert c.sql("SELECT count(*) c FROM cc6 WHERE k <= 25").collect()[0].c == 0


def test_meta_version_monotonic_and_cas_error_fields(spark, tmp_path, mode):
    a, b = _mk_sessions(spark, tmp_path, "cc7")
    v0 = a.catalog.get_table("cc7").meta_version
    a.sql("INSERT INTO cc7 VALUES (900, 'x')")
    v1 = a.catalog.get_table("cc7").meta_version
    assert v1 > v0 >= 0
    # a raw stale write raises with both versions named
    stale = b.catalog.get_table("cc7")
    assert stale.meta_version < v1
    with pytest.raises(ConcurrentWriteError) as ei:
        b.catalog.persist(stale)
    assert ei.value.expected == stale.meta_version
    assert ei.value.found >= v1
