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