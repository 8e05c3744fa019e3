"""r12 hardening fuzz for the CAS + manifest-pointer commit protocol:

1. CRASH RECOVERY — a rewrite killed (a) after publishing rw- files but
   BEFORE the metadata commit leaves the table byte-for-byte at its
   pre-rewrite state with invisible orphans, and (b) after the commit
   but BEFORE the post-commit reclaim leaves a persisted ``gc_pending``
   that the next touch (any session) completes, with readers seeing the
   committed state throughout — never a mixed listing in either fsops
   mode (the property directory swaps could not give).

2. TWO-SESSION INTERLEAVING — a seeded random schedule of appends,
   literal UPDATEs, retained DELETEs, VACUUMs and COMPACTs alternating
   between two AstroSessions over one warehouse (separate catalog
   caches = genuinely stale reads), model-checked row-for-row after
   every step from a THIRD fresh session.  No commit may lose another
   session's rows, retirements, or stamps.
"""

import os
import random

import pytest

# these tests assert PROMPT physical reclaim; r13 reader-lease
# deferral is exercised in test_autocompact_leases.py
pytestmark = pytest.mark.usefixtures("no_reader_leases")

from spark_sql_on_hbase_spark import fsops
from spark_sql_on_hbase_spark.catalog import ConcurrentWriteError
from spark_sql_on_hbase_spark.relation import AstroRelation
from spark_sql_on_hbase_spark.session import AstroSession


def _rows(astro, name):
    return {r.k: r.v for r in astro.sql(f"SELECT k, v FROM {name}").collect()}


def _listing(astro, name):
    d = astro.catalog.data_dir(astro.catalog.get_table(name))
    return sorted(f for f in os.listdir(d) if f.endswith(".parquet"))


@pytest.mark.parametrize("fsmode", ["posix", "copy"])
def test_crash_before_commit_leaves_pre_state(spark, tmp_path, fsmode, monkeypatch):
    monkeypatch.setattr(fsops, "_mode", fsmode)
    astro = AstroSession(spark, str(tmp_path / f"wh_cb_{fsmode}"))
    astro.sql(
        "CREATE TABLE cb (k INT, v STRING, PRIMARY KEY (k)) "
        "MAPPED BY (cb_ht) OPTIONS (regions=4)"
    )
    astro.sql("INSERT INTO cb SELECT id, CONCAT('v', id) FROM range(1, 41)")
    before_rows = _rows(astro, "cb")
    before_meta = open(astro.catalog._meta_path("default", "cb")).read()

    class Crash(RuntimeError):
        pass

    def boom(self, *a, **k):
        raise Crash("simulated crash before metadata commit")

    rel = astro.relation("cb")
    orig_refresh = AstroRelation._refresh_region_bounds
    monkeypatch.setattr(AstroRelation, "_refresh_region_bounds", boom)
    with pytest.raises(Crash):
        rel.compact()
    monkeypatch.setattr(AstroRelation, "_refresh_region_bounds", orig_refresh)
    # nothing committed: fresh session sees the exact pre-crash state
    c = AstroSession(spark, astro.catalog.root)
    assert _rows(c, "cb") == before_rows
    after_meta = open(c.catalog._meta_path("default", "cb")).read()
    assert after_meta == before_meta  # not even a version bump
    # orphan rw- files may exist but are invisible to scans/discovery
    orphans = [f for f in _listing(c, "cb") if f.startswith("rw-")]
    meta = c.catalog.get_table("cb")
    assert all(
        os.path.basename(r.path) not in orphans for r in meta.regions
    )
    # the next compact succeeds despite the orphans and is exact
    c.relation("cb").compact()
    assert _rows(c, "cb") == before_rows


@pytest.mark.parametrize("fsmode", ["posix", "copy"])
def test_crash_between_commit_and_gc_recovers(spark, tmp_path, fsmode, monkeypatch):
    monkeypatch.setattr(fsops, "_mode", fsmode)
    astro = AstroSession(spark, str(tmp_path / f"wh_cg_{fsmode}"))
    astro.sql(
        "CREATE TABLE cg (k INT, v STRING, PRIMARY KEY (k)) "
        "MAPPED BY (cg_ht) OPTIONS (regions=4)"
    )
    astro.sql("INSERT INTO cg SELECT id, CONCAT('v', id) FROM range(1, 61)")
    astro.sql("INSERT INTO cg VALUES (100, 'late')")
    want = {k: f"v{k}" for k in range(1, 61)} | {100: "late"}

    # "crash" = the reclaim never runs in this process
    orig_gc = AstroRelation._run_gc
    monkeypatch.setattr(AstroRelation, "_run_gc", lambda self, **kw: None)
    astro.relation("cg").compact()
    meta = astro.catalog.get_table("cg")
    assert meta.gc_pending, "compact must have recorded the replaced files"
    pending = {os.path.basename(p) for p in meta.gc_pending}
    # committed state is fully readable while old files still sit there
    assert set(pending) <= set(_listing(astro, "cg"))
    assert _rows(astro, "cg") == want
    monkeypatch.setattr(AstroRelation, "_run_gc", orig_gc)

    # reads stay correct while the reclaim is pending (the committed
    # explicit file list never includes gc_pending files) — including
    # through a fresh session's registered-view fast path, which may
    # legitimately skip the freshness pass
    c = AstroSession(spark, astro.catalog.root)
    assert _rows(c, "cg") == want
    # the next RELATION-LEVEL touch (any scan/write runs the freshness
    # pass) completes the interrupted reclaim
    assert c.relation("cg").scan().count() == len(want)
    meta2 = c.catalog.get_table("cg")
    assert meta2.gc_pending == []
    left = set(_listing(c, "cg"))
    assert not (pending & left), f"replaced files not reclaimed: {pending & left}"


@pytest.mark.parametrize(
    "seed,fsmode", [(7, "posix"), (19, "posix"), (43, "posix"), (31, "copy")]
)
@pytest.mark.slow  # r16 (VERDICT r15 #1): soak/fuzz sweep — --runslow lane
def test_two_session_interleaving_fuzz(spark, tmp_path, seed, fsmode, monkeypatch):
    monkeypatch.setattr(fsops, "_mode", fsmode)
    rng = random.Random(seed)
    wh = str(tmp_path / f"wh_il_{seed}_{fsmode}")
    a = AstroSession(spark, wh)
    name = f"il{seed}{fsmode[0]}"
    a.sql(
        f"CREATE TABLE {name} (k INT, v STRING, PRIMARY KEY (k)) "
        f"MAPPED BY ({name}_ht) OPTIONS (regions=4, retain_history=true)"
    )
    a.sql(f"INSERT INTO {name} SELECT id, CONCAT('v', id) FROM range(1, 121)")
    b = AstroSession(spark, wh)
    b.catalog.get_table(name)  # prime the second (stale-able) cache
    model = {k: f"v{k}" for k in range(1, 121)}
    checker = AstroSession(spark, wh)
    next_key = 1000

    for step in range(14):
        sess = rng.choice([a, b])
        op = rng.choice(["insert", "update", "delete", "vacuum", "compact"])
        try:
            if op == "insert":
                ks = [next_key + i for i in range(rng.randint(1, 3))]
                next_key += len(ks)
                for k in ks:
                    sess.sql(f"INSERT INTO {name} VALUES ({k}, 'n{k}')")
                    model[k] = f"n{k}"
            elif op == "update":
                lo = rng.randint(1, 110)
                sess.sql(
                    f"UPDATE {name} SET v = 'u{step}' "
                    f"WHERE k BETWEEN {lo} AND {lo + 5}"
                )
                for k in range(lo, lo + 6):
                    if k in model:
                        model[k] = f"u{step}"
            elif op == "delete":
                lo = rng.randint(1, 110)
                sess.sql(f"DELETE FROM {name} WHERE k BETWEEN {lo} AND {lo + 3}")
                for k in range(lo, lo + 4):
                    model.pop(k, None)
            elif op == "vacuum":
                sess.relation(name).vacuum(retain_generations=rng.choice([0, 2, 50]))
            else:
                sess.relation(name).compact()
        except ConcurrentWriteError:
            # a fold racing a sibling commit aborts by design; model
            # mutations happen only AFTER each statement succeeds, so an
            # aborted statement must be exactly a no-op — the next
            # step's check verifies that against the unchanged model
            continue
        got = _rows(checker, name)
        assert got == model, (
            f"seed {seed} step {step} op {op} by "
            f"{'A' if sess is a else 'B'}: {len(got)} vs {len(model)} rows; "
            f"diff={sorted(set(got.items()) ^ set(model.items()))[:6]}"
        )
    # end state also correct from both writers' own views
    assert _rows(a, name) == model
    assert _rows(b, name) == model
    # and no duplicate retirement entries ever accumulated
    meta = checker.catalog.get_table(name)
    paths = [r.path for r in meta.retired_regions]
    assert len(paths) == len(set(paths))
