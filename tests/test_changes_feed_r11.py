"""r11 change-data-feed upgrades (VERDICT r10 #1/#3, ADVICE r10 low):
DELETE events on retain_history tables (pre-image + retiring
generation), per-fragment envelope-UNION pruning of the snapshot
probes, and drop_noop filtering of the retained rewrite's over-reported
'update' rows — pinned against a direct snapshot diff.
"""

import random
import time

import pytest
from pyspark.sql import functions as F

from spark_sql_on_hbase_spark.relation import ROWKEY_COL, AstroRelation
from spark_sql_on_hbase_spark.session import AstroSession


@pytest.fixture()
def astro(spark, tmp_path):
    return AstroSession(spark, str(tmp_path / "warehouse"))


def _load(astro, tmp_path, name, n=100, retained=True, regions=4):
    csv = tmp_path / f"{name}.csv"
    csv.write_text("".join(f"{k},v{k}\n" for k in range(1, n + 1)))
    opts = f"regions={regions}" + (", retain_history=true" if retained else "")
    astro.sql(
        f"CREATE TABLE {name} (k INT, v STRING, PRIMARY KEY (k)) "
        f"MAPPED BY ({name}_ht) OPTIONS ({opts})"
    )
    astro.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE {name}")


def _snapshot_diff(rel, from_seq, to_seq):
    """Independent ground truth: the literal diff of the two snapshots."""
    old = {r.k: r.v for r in rel.scan(as_of_seq=from_seq).collect()}
    new = {r.k: r.v for r in rel.scan(as_of_seq=to_seq).collect()}
    inserts = {k: new[k] for k in new.keys() - old.keys()}
    deletes = {k: old[k] for k in old.keys() - new.keys()}
    updates = {k: new[k] for k in new.keys() & old.keys() if new[k] != old[k]}
    return inserts, updates, deletes


def test_delete_events_on_retained_table(astro, tmp_path):
    _load(astro, tmp_path, "cf1")
    astro.sql("DELETE FROM cf1 WHERE k BETWEEN 10 AND 20")  # gen 1 (retained)
    rel = astro.relation("cf1")
    feed = rel.changes(0).collect()
    dels = sorted((r.k, r.v, r._commit_seq) for r in feed if r._change_type == "delete")
    # pre-image values + the retiring generation
    assert dels == [(k, f"v{k}", 1) for k in range(10, 21)]
    # updates reported for the rewritten islands' survivors, no inserts
    assert not [r for r in feed if r._change_type == "insert"]
    # non-deleted keys never appear as deletes
    assert all(10 <= k <= 20 for k, _, _ in dels)


def test_update_then_delete_commit_seq_is_delete_gen(astro, tmp_path):
    """A key updated at gen 1 then deleted at gen 2 must report its
    delete at gen 2 (the retiring generation of its NEWEST version),
    not gen 1 (the retirement of its original fragment)."""
    _load(astro, tmp_path, "cf2")
    astro.sql("UPDATE cf2 SET v = NULL WHERE k = 15 AND v = 'v15'")  # gen 1
    astro.sql("DELETE FROM cf2 WHERE k BETWEEN 14 AND 16")  # gen 2
    rel = astro.relation("cf2")
    feed = rel.changes(0).collect()
    dels = {r.k: (r.v, r._commit_seq) for r in feed if r._change_type == "delete"}
    assert set(dels) == {14, 15, 16}
    assert dels[14] == ("v14", 2) and dels[16] == ("v16", 2)
    # pre-image of k=15 at from_seq=0 is the ORIGINAL value
    assert dels[15] == ("v15", 2)
    # a window starting after the update sees the NULL pre-image
    feed12 = rel.changes(1).collect()
    d15 = [r for r in feed12 if r._change_type == "delete" and r.k == 15]
    assert len(d15) == 1 and d15[0].v is None and d15[0]._commit_seq == 2


def test_non_retained_table_has_no_delete_events(astro, tmp_path):
    """Documented rule: without retain_history the LSM has no tombstones
    and a delete simply vanishes from later snapshots."""
    _load(astro, tmp_path, "cf3", retained=False)
    astro.sql("INSERT INTO cf3 VALUES (500, 'new')")  # gen 1
    astro.sql("DELETE FROM cf3 WHERE k BETWEEN 10 AND 20")
    rel = astro.relation("cf3")
    feed = rel.changes(0).collect()
    assert not [r for r in feed if r._change_type == "delete"]
    assert [r.k for r in feed if r._change_type == "insert"] == [500]


def test_drop_noop_filters_retained_overreport(astro, tmp_path):
    """ADVICE r10 low: the retained island rewrite re-stamps every
    survivor of the hit islands, so the default write-level feed
    over-reports them as updates; drop_noop=True anti-joins the values
    and keeps only genuinely changed rows."""
    _load(astro, tmp_path, "cf4")
    astro.sql("UPDATE cf4 SET v = NULL WHERE k = 30 AND v = 'v30'")  # 1-row update
    rel = astro.relation("cf4")
    raw = rel.changes(0).filter("_change_type = 'update'").count()
    assert raw > 1  # over-reports the island's untouched survivors
    tight = rel.changes(0, drop_noop=True).collect()
    ups = [(r.k, r.v) for r in tight if r._change_type == "update"]
    assert ups == [(30, None)]
    # inserts/deletes unaffected by drop_noop
    assert not [r for r in tight if r._change_type != "update"]


@pytest.mark.slow  # r16 (VERDICT r15 #1): soak/fuzz sweep — --runslow lane
def test_feed_equals_snapshot_diff_randomized(astro, tmp_path):
    """The contract, pinned (VERDICT r10 #1 'done' criterion): for every
    recorded generation pair, changes(a, b, drop_noop=True) equals the
    literal diff of the two snapshots — inserts with to-values, updates
    with to-values, deletes with pre-image values."""
    _load(astro, tmp_path, "cf5", n=80)
    rng = random.Random(17)
    rel = astro.relation("cf5")
    gens = [0]
    for _ in range(4):
        op = rng.choice(["insert", "update", "delete"])
        lo = rng.randint(1, 120)
        hi = lo + rng.randint(0, 15)
        if op == "insert":
            astro.sql(f"INSERT INTO cf5 VALUES ({lo + 200}, 'g{lo}')")
        elif op == "update":
            astro.sql(
                f"UPDATE cf5 SET v = NULL WHERE k BETWEEN {lo} AND {hi} "
                "AND v IS NOT NULL"
            )
        else:
            astro.sql(f"DELETE FROM cf5 WHERE k BETWEEN {lo} AND {hi}")
        g = rel._next_seq() - 1  # newest committed gen incl. fileless
        if g != gens[-1]:
            gens.append(g)
    for a in gens:
        for b in gens:
            if a >= b:
                continue
            ins, ups, dels = _snapshot_diff(rel, a, b)
            feed = rel.changes(a, b, drop_noop=True).collect()
            got_ins = {r.k: r.v for r in feed if r._change_type == "insert"}
            got_ups = {r.k: r.v for r in feed if r._change_type == "update"}
            got_dels = {r.k: r.v for r in feed if r._change_type == "delete"}
            assert got_ins == ins, (a, b, "insert")
            assert got_ups == ups, (a, b, "update")
            assert got_dels == dels, (a, b, "delete")


def test_envelope_union_prunes_distant_islands(astro, tmp_path):
    """VERDICT r10 #3: two small delta islands at opposite ends of the
    keyspace must prune the snapshot probes to O(delta), not to the
    single global [lo, hi] envelope (which spans the whole table)."""
    _load(astro, tmp_path, "cf6", n=1000, retained=False, regions=8)
    astro.sql("INSERT INTO cf6 VALUES (0, 'low')")  # gen 1: far-left key
    astro.sql("INSERT INTO cf6 VALUES (5000, 'high')")  # gen 2: far-right key
    rel = astro.relation("cf6")
    meta = astro.catalog.get_table("cf6")
    delta = [r for r in meta.regions if r.seq > 0]
    ranges = AstroRelation._envelope_union(delta)
    assert len(ranges) == 2  # NOT collapsed to one global span
    bound = AstroRelation._ranges_bound(ranges)
    # the union admits only the delta keys — the global envelope would
    # admit every row of the table (0 <= k <= 5000 spans all 1000)
    base = rel.scan(with_rowkey=True, as_of_seq=0)
    assert base.filter(bound).count() == 0
    lo = bytes.fromhex(min(r.min_rowkey_hex for r in delta))
    hi = bytes.fromhex(max(r.max_rowkey_hex for r in delta))
    glob = F.col(ROWKEY_COL).between(F.lit(lo), F.lit(hi))
    assert base.filter(glob).count() == 1000  # what r10 would have scanned
    # the feed itself stays correct
    feed = rel.changes(0).collect()
    assert sorted((r.k, r._change_type) for r in feed) == [
        (0, "insert"),
        (5000, "insert"),
    ]


def test_envelope_union_merge_and_cap():
    from dataclasses import dataclass

    @dataclass
    class Frag:
        min_rowkey_hex: str
        max_rowkey_hex: str

    # overlap + adjacency coalesce; disjoint stay apart
    u = AstroRelation._envelope_union(
        [Frag("00", "10"), Frag("08", "20"), Frag("80", "90")]
    )
    assert u == [("00", "20"), ("80", "90")]
    # cap: 100 disjoint ranges fold pairwise to <= 32, coverage preserved
    frags = [Frag(f"{i:04x}00", f"{i:04x}ff") for i in range(0, 1000, 10)]
    u = AstroRelation._envelope_union(frags, max_ranges=32)
    assert len(u) <= 32
    assert u[0][0] == frags[0].min_rowkey_hex
    assert u[-1][1] == frags[-1].max_rowkey_hex


def test_changes_sql_surface(astro, tmp_path):
    """r11 (VERDICT r10 #2): `FROM t CHANGES FROM n [TO m] [WITH NOOP
    FILTER]` — the SQL/CLI surface of relation.changes, mirroring the
    VERSION/TIMESTAMP AS OF rewrite."""
    _load(astro, tmp_path, "cs1")
    astro.sql("UPDATE cs1 SET v = NULL WHERE k = 5 AND v = 'v5'")  # gen 1
    astro.sql("DELETE FROM cs1 WHERE k BETWEEN 40 AND 44")  # gen 2
    rows = astro.sql(
        "SELECT k, v, _change_type, _commit_seq FROM cs1 CHANGES FROM 0 "
        "WHERE _change_type = 'delete' ORDER BY k"
    ).collect()
    assert [(r.k, r.v, r._commit_seq) for r in rows] == [
        (k, f"v{k}", 2) for k in range(40, 45)
    ]
    # TO bound: a window ending before the delete has no delete events
    n = astro.sql(
        "SELECT * FROM cs1 CHANGES FROM 0 TO 1 WHERE _change_type = 'delete'"
    ).count()
    assert n == 0
    # WITH NOOP FILTER drops the retained rewrite's unchanged survivors
    tight = astro.sql(
        "SELECT k, v FROM cs1 CHANGES FROM 0 TO 1 WITH NOOP FILTER"
    ).collect()
    assert [(r.k, r.v) for r in tight] == [(5, None)]
    # the pattern inside a string literal is not rewritten
    r = astro.sql("SELECT 'cs1 CHANGES FROM 0' AS s").collect()[0]
    assert r.s == "cs1 CHANGES FROM 0"
    # a feed joined with the current state works (view registration)
    j = astro.sql(
        "SELECT cur.k FROM cs1 cur JOIN "
        "(SELECT k FROM cs1 CHANGES FROM 1 WHERE _change_type = 'delete') d "
        "ON cur.k = d.k"
    ).count()
    assert j == 0  # deleted keys are gone from the present
    # below-floor windows refuse with the documented error
    with pytest.raises(ValueError, match="history floor"):
        astro.relation("cs1").changes(-1)


def test_changes_sql_timestamp_bounds(astro, tmp_path):
    """r11: quoted timestamp operands resolve through the TIMESTAMP AS
    OF machinery — Delta CDF's startingTimestamp analog."""
    _load(astro, tmp_path, "cs2")
    time.sleep(0.05)
    t_mid = time.time()
    time.sleep(0.05)
    astro.sql("DELETE FROM cs2 WHERE k BETWEEN 3 AND 5")  # gen 1
    from datetime import datetime, timezone

    iso = datetime.fromtimestamp(t_mid, tz=timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S.%f"
    )
    rows = astro.sql(
        f"SELECT k, _change_type FROM cs2 CHANGES FROM '{iso}' "
        "WHERE _change_type = 'delete' ORDER BY k"
    ).collect()
    assert [r.k for r in rows] == [3, 4, 5]
    # numeric epoch also accepted as a quoted literal
    rows2 = astro.sql(
        f"SELECT k FROM cs2 CHANGES FROM '{t_mid}' "
        "WHERE _change_type = 'delete'"
    ).count()
    assert rows2 == 3


def test_changes_after_delete_everything(astro, tmp_path):
    """A retained delete-everything commits a FILELESS generation; the
    feed's default to_seq must still reach it and report every row as
    deleted."""
    _load(astro, tmp_path, "cf7", n=40)
    astro.sql("DELETE FROM cf7")
    rel = astro.relation("cf7")
    feed = rel.changes(0).collect()
    assert len(feed) == 40
    assert all(r._change_type == "delete" for r in feed)
    assert sorted(r.k for r in feed) == list(range(1, 41))
