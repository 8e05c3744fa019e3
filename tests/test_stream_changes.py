"""r11: incremental change-feed consumption with durable offsets
(streaming/changes_source.py) — at-least-once delivery, generation
batching caps, floor-start and from-now starts, retained DELETE
events flowing through, and crash-replay semantics.
"""

import os

import pytest

from spark_sql_on_hbase_spark.session import AstroSession
from spark_sql_on_hbase_spark.streaming import init_offset, load_offset, stream_changes


@pytest.fixture()
def astro(spark, tmp_path):
    return AstroSession(spark, str(tmp_path / "warehouse"))


def _mk(astro, tmp_path, name, retained=False, n=60):
    csv = tmp_path / f"{name}.csv"
    csv.write_text("".join(f"{k},v{k}\n" for k in range(1, n + 1)))
    opts = "regions=4" + (", retain_history=true" if retained else "")
    astro.sql(
        f"CREATE TABLE {name} (k INT, v STRING, PRIMARY KEY (k)) "
        f"MAPPED BY ({name}_ht) OPTIONS ({opts})"
    )
    astro.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE {name}")
    return astro.relation(name)


def test_drain_batches_and_resume(astro, tmp_path):
    rel = _mk(astro, tmp_path, "sc1")
    astro.sql("INSERT INTO sc1 VALUES (100, 'g1')")
    astro.sql("INSERT INTO sc1 VALUES (101, 'g2')")
    astro.sql("INSERT INTO sc1 VALUES (102, 'g3')")
    ckpt = str(tmp_path / "ck" / "offset.json")
    seen = []
    n = stream_changes(
        rel, lambda df, lo, hi: seen.append((lo, hi, {r.k for r in df.collect()})),
        ckpt, batch_generations=1,
    )
    assert n == 3
    assert [(lo, hi) for lo, hi, _ in seen] == [(0, 1), (1, 2), (2, 3)]
    assert [ks for _, _, ks in seen] == [{100}, {101}, {102}]
    assert load_offset(ckpt) == 3
    # resume: nothing new
    assert stream_changes(rel, lambda *a: seen.append("x"), ckpt) == 0
    # a new write is picked up from the committed offset
    astro.sql("INSERT INTO sc1 VALUES (103, 'g4')")
    got = []
    assert stream_changes(
        rel, lambda df, lo, hi: got.append((lo, hi, {r.k for r in df.collect()})), ckpt
    ) == 1
    assert got == [(3, 4, {103})]


def test_batch_generation_cap_vs_one_window(astro, tmp_path):
    rel = _mk(astro, tmp_path, "sc2")
    for g in range(4):
        astro.sql(f"INSERT INTO sc2 VALUES ({200 + g}, 'g')")
    # uncapped: one window covering all four generations
    one = []
    stream_changes(rel, lambda df, lo, hi: one.append((lo, hi, df.count())), str(tmp_path / "a.json"))
    assert one == [(0, 4, 4)]
    # capped at 2: two windows
    two = []
    stream_changes(
        rel, lambda df, lo, hi: two.append((lo, hi, df.count())),
        str(tmp_path / "b.json"), batch_generations=2,
    )
    assert two == [(0, 2, 2), (2, 4, 2)]


def test_retained_deletes_flow_through(astro, tmp_path):
    rel = _mk(astro, tmp_path, "sc3", retained=True)
    astro.sql("DELETE FROM sc3 WHERE k BETWEEN 5 AND 9")
    rows = []
    stream_changes(
        rel,
        lambda df, lo, hi: rows.extend(
            (r.k, r._change_type, r._commit_seq) for r in df.collect()
        ),
        str(tmp_path / "c.json"),
        drop_noop=True,
    )
    assert sorted(rows) == [(k, "delete", 1) for k in range(5, 10)]


def test_crash_replay_is_at_least_once(astro, tmp_path):
    """A callback failure leaves the offset uncommitted: the next drain
    REPLAYS the same window (at-least-once)."""
    rel = _mk(astro, tmp_path, "sc4")
    astro.sql("INSERT INTO sc4 VALUES (300, 'x')")
    ckpt = str(tmp_path / "d.json")
    calls = []

    def boom(df, lo, hi):
        calls.append((lo, hi))
        raise RuntimeError("sink crashed")

    with pytest.raises(RuntimeError):
        stream_changes(rel, boom, ckpt)
    assert load_offset(ckpt) == 0  # floor committed, window NOT
    ok = []
    stream_changes(rel, lambda df, lo, hi: ok.append((lo, hi, df.count())), ckpt)
    assert calls == [(0, 1)] and ok == [(0, 1, 1)]


def test_init_offset_skips_history(astro, tmp_path):
    rel = _mk(astro, tmp_path, "sc5")
    astro.sql("INSERT INTO sc5 VALUES (400, 'old')")
    ckpt = str(tmp_path / "e.json")
    assert init_offset(rel, ckpt) == 1
    astro.sql("INSERT INTO sc5 VALUES (401, 'new')")
    got = []
    stream_changes(rel, lambda df, lo, hi: got.extend(r.k for r in df.collect()), ckpt)
    assert got == [401]  # history before the init point never delivered


def test_poll_loop_bounded_by_max_cycles(astro, tmp_path):
    rel = _mk(astro, tmp_path, "sc6")
    n = stream_changes(
        rel, lambda *a: None, str(tmp_path / "f.json"),
        poll_interval=0.01, max_cycles=3,
    )
    assert n == 0  # nothing to drain, loop exits after 3 cycles

def test_exactly_once_sink_clean_run(astro, tmp_path):
    """r15 (VERDICT r14 #7): changes_exactly_once_sink materializes the
    feed into a journal keyed (source keys, _commit_seq) — one call,
    schema derived from the source."""
    from spark_sql_on_hbase_spark.streaming import changes_exactly_once_sink

    rel = _mk(astro, tmp_path, "eo1", retained=True, n=20)
    astro.sql("INSERT INTO eo1 VALUES (100, 'g1')")
    astro.sql("UPDATE eo1 SET v = 'u5' WHERE k = 5")
    astro.sql("DELETE FROM eo1 WHERE k = 7")
    ckpt = str(tmp_path / "eo1.json")
    n = changes_exactly_once_sink(rel, "eo1_journal", ckpt, drop_noop=True)
    assert n == 1
    sink = astro.relation("eo1_journal")
    rows = {
        (r.k, r._commit_seq): (r._change_type, r.v)
        for r in sink.scan().collect()
    }
    assert rows[(100, 1)] == ("insert", "g1")
    assert rows[(5, 2)] == ("update", "u5")
    assert rows[(7, 3)] == ("delete", "v7")  # pre-image
    # incremental: a later write lands as its own journal generation
    astro.sql("INSERT INTO eo1 VALUES (101, 'g4')")
    assert changes_exactly_once_sink(rel, "eo1_journal", ckpt) == 1
    rows2 = {
        (r.k, r._commit_seq) for r in astro.relation("eo1_journal").scan().collect()
    }
    assert (101, 4) in rows2 and set(rows) <= rows2


def test_exactly_once_sink_crash_replay_zero_duplicate_effects(
    astro, tmp_path, monkeypatch
):
    """The end-to-end exactly-once claim: crash BETWEEN the sink write
    and the offset commit, re-run, and the resolved sink state must be
    IDENTICAL to a clean single run — the replayed batch's rows
    upsert-collapse onto the ones already written."""
    from spark_sql_on_hbase_spark.streaming import changes_exactly_once_sink
    from spark_sql_on_hbase_spark.streaming import changes_source as cs

    rel = _mk(astro, tmp_path, "eo2", retained=True, n=20)
    ref = _mk(astro, tmp_path, "eo2ref", retained=True, n=20)
    for t in ("eo2", "eo2ref"):
        astro.sql(f"INSERT INTO {t} VALUES (200, 'a')")
        astro.sql(f"UPDATE {t} SET v = 'u9' WHERE k = 9")
        astro.sql(f"DELETE FROM {t} WHERE k = 3")
    ckpt = str(tmp_path / "eo2.json")

    real_commit = cs._commit_offset
    crashes = {"armed": True}

    def crashing_commit(path, seq, stamp=None):
        if crashes["armed"] and seq > 0:
            crashes["armed"] = False  # crash once, after the sink write
            raise RuntimeError("crash before offset commit")
        real_commit(path, seq, stamp)

    monkeypatch.setattr(cs, "_commit_offset", crashing_commit)
    with pytest.raises(RuntimeError):
        changes_exactly_once_sink(rel, "eo2_journal", ckpt, drop_noop=True)
    monkeypatch.undo()
    # restart: the whole window REPLAYS (offset never committed)
    assert load_offset(ckpt) == 0
    changes_exactly_once_sink(rel, "eo2_journal", ckpt, drop_noop=True)
    # clean single run on the identical reference table
    changes_exactly_once_sink(
        ref, "eo2_ref_journal", str(tmp_path / "ref.json"), drop_noop=True
    )
    got = sorted(
        map(tuple, astro.relation("eo2_journal").scan().collect())
    )
    want = sorted(
        map(tuple, astro.relation("eo2_ref_journal").scan().collect())
    )
    assert got == want  # zero duplicate effects, value-for-value
    # the crashed run DID write before dying (real at-least-once replay,
    # not a no-op): the journal table holds more than one generation
    assert astro.relation("eo2_journal").committed_seq() >= 1


def test_rebase_after_compact_detected_not_silent(astro, tmp_path):
    """r15: COMPACT rebases every generation to 0 with floor 0 — a
    checkpoint from the old numbering must RAISE (stamp mismatch), not
    silently stop draining or diff a meaningless window once re-appends
    push past it."""
    rel = _mk(astro, tmp_path, "rb1")
    for i in range(3):
        astro.sql(f"INSERT INTO rb1 VALUES ({500 + i}, 'g{i}')")
    ckpt = str(tmp_path / "rb.json")
    seen = []
    stream_changes(rel, lambda df, lo, hi: seen.append((lo, hi)), ckpt)
    assert load_offset(ckpt) == 3
    astro.sql("COMPACT TABLE rb1")  # rebase: everything at generation 0
    # push the new numbering PAST the checkpoint — the silent-wrong case
    for i in range(4):
        astro.sql(f"INSERT INTO rb1 VALUES ({600 + i}, 'h{i}')")
    rel = astro.relation("rb1")
    with pytest.raises(ValueError, match="REBASED"):
        stream_changes(rel, lambda df, lo, hi: None, ckpt)
    # remediation: re-init from now, consumer drains future writes again
    init_offset(rel, ckpt)
    astro.sql("INSERT INTO rb1 VALUES (700, 'after')")
    got = []
    stream_changes(rel, lambda df, lo, hi: got.append(df.count()), ckpt)
    assert got == [1]


def test_pre_r15_checkpoint_without_stamp_still_drains(astro, tmp_path):
    import json as _json

    rel = _mk(astro, tmp_path, "rb2")
    astro.sql("INSERT INTO rb2 VALUES (500, 'x')")
    ckpt = str(tmp_path / "old.json")
    with open(ckpt, "w") as f:
        _json.dump({"last_seq": 0}, f)  # legacy format, no stamp
    got = []
    stream_changes(rel, lambda df, lo, hi: got.append((lo, hi)), ckpt)
    assert got == [(0, 1)]


def test_below_floor_stamped_checkpoint_gets_floor_error_not_rebase(
    astro, tmp_path
):
    """r15 review: a STAMPED checkpoint that falls below the history
    floor after VACUUM pruned its generation's stamp must get the floor
    error (accurate remediation: snapshots reclaimed, RETAIN next time)
    — not the rebase error, which misdiagnoses stamp retention as a
    COMPACT/OVERWRITE and runs first without the floor condition."""
    rel = _mk(astro, tmp_path, "rb3", retained=True)
    astro.sql("INSERT INTO rb3 VALUES (500, 'x')")
    astro.sql("INSERT INTO rb3 VALUES (501, 'y')")
    ckpt = str(tmp_path / "rb3.json")
    stream_changes(rel, lambda df, lo, hi: None, ckpt, batch_generations=1)
    import json as _json

    with open(ckpt) as f:
        ck = _json.load(f)
    assert ck["stamp"] is not None  # a stamped (post-r15) checkpoint
    # rewind the checkpoint to gen 1, stamped with gen 1's REAL stamp
    meta = astro.catalog.get_table("rb3")
    with open(ckpt, "w") as f:
        _json.dump({"last_seq": 1, "stamp": meta.generation_times["1"]}, f)
    # the post-VACUUM state the scenario produces (reclaim raised the
    # floor past gen 1 and stamp retention pruned gen 1's entry) —
    # written through the catalog exactly as vacuum() records it
    meta.history_floor = 2
    meta.generation_times.pop("1", None)
    astro.catalog.persist(meta)
    with pytest.raises(ValueError) as ei:
        stream_changes(astro.relation("rb3"), lambda df, lo, hi: None, ckpt)
    msg = str(ei.value)
    assert "history floor" in msg and "REBASED" not in msg
    assert "RETAIN" in msg  # the accurate remediation
