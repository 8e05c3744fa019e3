"""Round-8 (VERDICT r7 #1/#2): the region-pruned partial rewrite now
covers merge-on-read tables (pending upsert fragments) via island
closure, and z-order layouts via one-output-file-per-source-z-file.

The r7 behavior handed BOTH states back to the full-table rewrite —
the exact scale-killer class the pruned rewrite exists to kill: a
streaming-ingested table carries up to 4× regions of unmerged fragments
between auto-compactions, so every key-pruned DELETE was a 100 TB
rewrite.
"""

import os

import pytest

# these tests assert PROMPT physical reclaim; r13 reader-lease
# deferral is exercised in test_autocompact_leases.py
pytestmark = pytest.mark.usefixtures("no_reader_leases")

from spark_sql_on_hbase_spark.session import AstroSession


@pytest.fixture()
def astro(spark, tmp_path):
    return AstroSession(spark, str(tmp_path / "warehouse"))


def _file_idents(astro, rel):
    d = astro.catalog.data_dir(rel.meta)
    out = {}
    for f in os.listdir(d):
        if f.endswith(".parquet"):
            st = os.stat(os.path.join(d, f))
            out[f] = (st.st_ino, st.st_size)
    return out


def _load(astro, tmp_path, name="mt", n=200, regions=8):
    csv = tmp_path / f"{name}.csv"
    csv.write_text("".join(f"{k},v{k},{k * 10}\n" for k in range(1, n + 1)))
    astro.sql(
        f"CREATE TABLE {name} (k INT, v STRING, n INT, PRIMARY KEY (k)) "
        f"MAPPED BY ({name}_ht) OPTIONS (regions={regions})"
    )
    astro.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE {name}")
    return astro.relation(name)


def test_delete_pruned_under_pending_upserts(astro, tmp_path):
    """Upsert-appended table (needs_merge=True): a key-pruned DELETE
    rewrites only the fragments whose island overlaps the key — the rest
    stay inode-identical — and reads stay oracle-exact INCLUDING the
    merge-on-read resolution of untouched upserted keys."""
    rel = _load(astro, tmp_path)
    # upsert a narrow key range: fragment overlaps the original fragment
    # holding keys around 30 → needs_merge
    astro.sql("INSERT INTO mt VALUES (30, 'v30b', 999)")
    astro.sql("INSERT INTO mt VALUES (170, 'v170b', 888)")
    rel = astro.relation("mt")
    assert rel.needs_merge()
    before = _file_idents(astro, rel)
    n_frag = len(before)
    assert n_frag == 10  # 8 regions + 2 upsert fragments

    astro.sql("DELETE FROM mt WHERE k = 30")
    stats = astro.last_write_stats
    # pruned: only the island containing key 30 (original fragment +
    # its overlapping upsert fragment) was rewritten
    assert stats["files_total"] == n_frag
    assert 1 <= stats["files_rewritten"] <= 2
    assert stats["files_rewritten"] < n_frag

    after = _file_idents(astro, astro.relation("mt"))
    kept = set(before) & set(after)
    assert len(kept) == n_frag - stats["files_rewritten"]
    for f in kept:
        assert before[f] == after[f]

    # key 30 gone; key 170's upsert resolution UNTOUCHED (still newest)
    assert astro.sql("SELECT count(*) AS c FROM mt WHERE k = 30").collect()[0].c == 0
    r = astro.sql("SELECT v, n FROM mt WHERE k = 170").collect()[0]
    assert (r.v, r.n) == ("v170b", 888)
    assert astro.sql("SELECT count(*) AS c FROM mt").collect()[0].c == 199


def test_delete_pruned_island_closure_is_version_closed(astro, tmp_path):
    """A key whose versions span two overlapping fragments: a RESIDUAL
    delete (non-key conjunct forces the resolved path) touching a
    NEIGHBOR key in the same island must rewrite the whole island (both
    generations of the upserted key resolve together), never split it."""
    rel = _load(astro, tmp_path, name="ic")
    astro.sql("INSERT INTO ic VALUES (42, 'v42b', 420420)")  # upsert near 40
    rel = astro.relation("ic")
    assert rel.needs_merge()

    # k = 40 prunes; the v-conjunct is residual → island-closure path
    astro.sql("DELETE FROM ic WHERE k = 40 AND v = 'v40'")
    stats = astro.last_write_stats
    assert stats["files_rewritten"] < stats["files_total"]
    # the upserted value survives with its NEWEST version
    r = astro.sql("SELECT v, n FROM ic WHERE k = 42").collect()[0]
    assert (r.v, r.n) == ("v42b", 420420)
    assert astro.sql("SELECT count(*) AS c FROM ic WHERE k = 40").collect()[0].c == 0
    # the rewritten island is now resolved at generation 0: rewriting
    # collapsed 42's two versions into one physical row
    rel = astro.relation("ic")
    total_rows = sum(r.num_rows for r in rel.meta.regions)
    assert total_rows == 199  # 200 - deleted 40; no duplicate versions left


def test_delete_keyonly_purges_without_closure(astro, tmp_path):
    """r8: the same shape with a KEY-ONLY predicate takes the
    per-fragment purge — no resolution, duplicate versions of untouched
    keys REMAIN physically (newest still wins at read time), and history
    stays readable as a retroactive purge."""
    _load(astro, tmp_path, name="ko")
    astro.sql("INSERT INTO ko VALUES (42, 'v42b', 420420)")
    rel = astro.relation("ko")
    assert rel.needs_merge()

    astro.sql("DELETE FROM ko WHERE k = 40")  # key-only → purge path
    stats = astro.last_write_stats
    assert stats["files_rewritten"] < stats["files_total"]
    r = astro.sql("SELECT v, n FROM ko WHERE k = 42").collect()[0]
    assert (r.v, r.n) == ("v42b", 420420)
    assert astro.sql("SELECT count(*) AS c FROM ko WHERE k = 40").collect()[0].c == 0
    rel = astro.relation("ko")
    total_rows = sum(r.num_rows for r in rel.meta.regions)
    assert total_rows == 200  # 201 physical - 1 deleted; 42 keeps 2 versions
    # retroactive purge: the gen-0 snapshot is readable, minus key 40,
    # and without gen-1's upsert
    g0 = rel.scan(as_of_seq=0)
    assert g0.count() == 199
    assert g0.filter("k = 40").count() == 0
    assert g0.filter("k = 42").collect()[0].v == "v42"


def test_update_null_routing_pruned_under_pending_upserts(astro, tmp_path):
    """The NULL-assigning UPDATE (routes through rewrite) also prunes on
    a merge-on-read table."""
    _load(astro, tmp_path, name="un")
    astro.sql("INSERT INTO un VALUES (7, 'v7b', 77)")
    rel = astro.relation("un")
    assert rel.needs_merge()
    before = _file_idents(astro, rel)
    astro.sql("UPDATE un SET v = NULL WHERE k = 7")
    stats = astro.last_write_stats
    assert stats is not None and stats["files_rewritten"] < stats["files_total"]
    after = _file_idents(astro, astro.relation("un"))
    for f in set(before) & set(after):
        assert before[f] == after[f]
    r = astro.sql("SELECT v, n FROM un WHERE k = 7").collect()[0]
    assert (r.v, r.n) == (None, 77)


def test_full_generation_overlay_still_prunes_by_island(astro, tmp_path):
    """A whole-table upsert overlay (INSERT … SELECT FROM itself): the
    appended generation range-partitions into fragments that pair up with
    the originals into per-range islands — a key-pruned DELETE rewrites
    ONE island (both generations of that range), not the table.  This is
    exactly the streaming-sink state the r7 verdict flagged: 2× fragments
    pending compaction must not force a full rewrite."""
    _load(astro, tmp_path, name="ws", n=100, regions=4)
    astro.sql("INSERT INTO ws SELECT k, concat('b', v), n + 1 FROM ws")
    rel = astro.relation("ws")
    assert rel.needs_merge()
    n_frag = len(rel.meta.regions)
    assert n_frag == 8
    astro.sql("DELETE FROM ws WHERE k = 50")
    stats = astro.last_write_stats
    assert stats["files_total"] == 8
    assert stats["files_rewritten"] < 8  # island-local, not full-table
    assert astro.sql("SELECT count(*) AS c FROM ws").collect()[0].c == 99
    r = astro.sql("SELECT v, n FROM ws WHERE k = 1").collect()[0]
    assert (r.v, r.n) == ("bv1", 11)  # untouched islands still resolve newest


def test_single_island_table_keyonly_and_residual_both_prune(astro, tmp_path):
    """With regions=1 every generation overlaps everything → one island.
    r8: a KEY-ONLY delete still prunes (per-fragment purge needs no
    closure — the upsert fragment's envelope excludes the key, so only
    the base file rewrites); a RESIDUAL delete's island closure == table,
    but the resolved-key-set plan prunes on the sargable key part and
    purges only the intersecting file (r8 follow-on — this used to be a
    full rewrite)."""
    _load(astro, tmp_path, name="w1", n=50, regions=1)
    astro.sql("INSERT INTO w1 VALUES (25, 'x25', 0)")
    rel = astro.relation("w1")
    assert rel.needs_merge()
    astro.sql("DELETE FROM w1 WHERE k = 10")  # key-only → purge, 1 of 2 files
    stats = astro.last_write_stats
    assert stats["files_total"] == 2 and stats["files_rewritten"] == 1
    assert astro.sql("SELECT count(*) AS c FROM w1").collect()[0].c == 49
    r = astro.sql("SELECT v FROM w1 WHERE k = 25").collect()[0]
    assert r.v == "x25"
    # residual predicate: closure == whole table, but the key part (k=11)
    # prunes the upsert fragment → resolved-key-set purge of the base file
    astro.sql("DELETE FROM w1 WHERE k = 11 AND v = 'v11'")
    stats = astro.last_write_stats
    assert stats["files_total"] == 2 and stats["files_rewritten"] == 1
    assert astro.sql("SELECT count(*) AS c FROM w1").collect()[0].c == 48
    # the untouched upsert fragment still resolves newest-wins
    r = astro.sql("SELECT v FROM w1 WHERE k = 25").collect()[0]
    assert r.v == "x25"
    # a TRULY unprunable residual (no sargable key part) = full rewrite
    astro.sql("DELETE FROM w1 WHERE v = 'v12'")
    stats = astro.last_write_stats
    assert stats["files_rewritten"] == stats["files_total"]
    assert astro.sql("SELECT count(*) AS c FROM w1").collect()[0].c == 47


def test_zorder_delete_pruned_lifecycle(spark, astro):
    """VERDICT r7 #2: z-order tables get the partial rewrite too —
    untouched z-files stay inode-identical, dim boxes of rewritten files
    only shrink, dim-box pruning still works, and the layout's
    shuffle-free metadata test (single generation, per-file unique keys)
    is preserved."""
    df = spark.range(20_000).selectExpr(
        "CAST(pmod(id * 77, 200) AS INT) k1",   # id*77 mod 200: unique with
        "CAST(floor(id / 200) AS INT) k2",      # floor(id/200) as the pair
        "CAST(id AS DOUBLE) v",
    )
    astro.sql(
        "CREATE TABLE zd (k1 INT, k2 INT, v DOUBLE, PRIMARY KEY (k1, k2)) "
        "MAPPED BY (zd_ht, COLS=[v=f.v]) OPTIONS(regions=16, layout=zorder)"
    )
    rel = astro.relation("zd")
    rel.write(df)
    rel.register_view("zd")
    assert rel.meta.layout == "zorder" and not rel.needs_merge()
    before = _file_idents(astro, rel)
    n_before = spark.sql("SELECT count(*) AS c FROM zd").collect()[0].c
    _, res_pre = rel.scan_where("k2 BETWEEN 40 AND 60")
    assert len(res_pre.files) < 16  # boxes prune on the non-leading dim

    # a non-leading-dim predicate: boxes prune most z-files
    gone = spark.sql("SELECT count(*) AS c FROM zd WHERE k2 = 37").collect()[0].c
    assert gone > 0
    astro.sql("DELETE FROM zd WHERE k2 = 37")
    stats = astro.last_write_stats
    assert stats["files_total"] == 16
    assert 1 <= stats["files_rewritten"] < 16

    rel = astro.relation("zd")
    after = _file_idents(astro, rel)
    kept = set(before) & set(after)
    assert len(kept) == 16 - stats["files_rewritten"]
    for f in kept:
        assert before[f] == after[f]

    # layout intact: still zorder, still merge-free, one generation
    assert rel.meta.layout == "zorder" and not rel.needs_merge()
    assert len({r.seq for r in rel.meta.regions}) == 1

    # data exact
    assert astro.sql("SELECT count(*) AS c FROM zd").collect()[0].c == n_before - gone
    assert astro.sql("SELECT count(*) AS c FROM zd WHERE k2 = 37").collect()[0].c == 0

    # dim-box pruning still prunes, and no worse than pre-delete (each
    # rewritten file's box is a subset of its source's)
    _, res = rel.scan_where("k2 BETWEEN 40 AND 60")
    assert len(res.files) <= len(res_pre.files) < 16
    # and is still sound
    got = sorted(
        (r.k1, r.k2) for r in rel.scan_where("k2 BETWEEN 40 AND 60")[0].collect()
    )
    want = sorted(
        (r.k1, r.k2)
        for r in rel.scan().where("k2 BETWEEN 40 AND 60").collect()
    )
    assert got == want


def test_zorder_delete_second_cycle_and_point_update(spark, astro):
    """Repeated partial rewrites on a z-order table keep working (the
    rewritten files' z-boundaries remain disjoint), and the NULL-UPDATE
    rewrite path works on zorder too."""
    df = spark.range(5_000).selectExpr(
        "CAST(pmod(id * 7, 500) AS INT) k1",  # unique (k1, k2) pairs
        "CAST(floor(id / 500) AS INT) k2",
        "CAST(id AS DOUBLE) v",
    )
    astro.sql(
        "CREATE TABLE z2 (k1 INT, k2 INT, v DOUBLE, PRIMARY KEY (k1, k2)) "
        "MAPPED BY (z2_ht, COLS=[v=f.v]) OPTIONS(regions=8, layout=zorder)"
    )
    rel = astro.relation("z2")
    rel.write(df)
    rel.register_view("z2")
    n0 = astro.sql("SELECT count(*) AS c FROM z2").collect()[0].c

    g1 = astro.sql("SELECT count(*) AS c FROM z2 WHERE k1 < 30").collect()[0].c
    astro.sql("DELETE FROM z2 WHERE k1 < 30")
    s1 = astro.last_write_stats
    g2 = astro.sql("SELECT count(*) AS c FROM z2 WHERE k1 > 470").collect()[0].c
    astro.sql("DELETE FROM z2 WHERE k1 > 470")
    s2 = astro.last_write_stats
    assert s1["files_rewritten"] < 8 and s2["files_rewritten"] < 8
    assert astro.sql("SELECT count(*) AS c FROM z2").collect()[0].c == n0 - g1 - g2
    rel = astro.relation("z2")
    assert rel.meta.layout == "zorder" and not rel.needs_merge()

    # NULL-assigning UPDATE routes through the zorder rewrite
    row = astro.sql("SELECT k1, k2 FROM z2 LIMIT 1").collect()[0]
    astro.sql(f"UPDATE z2 SET v = NULL WHERE k1 = {row.k1} AND k2 = {row.k2}")
    got = astro.sql(
        f"SELECT v FROM z2 WHERE k1 = {row.k1} AND k2 = {row.k2}"
    ).collect()
    assert all(r.v is None for r in got) and got


def test_zorder_multigeneration_keyonly_delete_prunes(spark, astro):
    """r8: z-order table WITH appended generations (the state every
    resolved path refuses) — a key-only DELETE purges per-fragment:
    only envelope-intersecting files rewrite, resolution still works."""
    astro.sql(
        "CREATE TABLE zm (k1 INT, k2 INT, v DOUBLE, PRIMARY KEY (k1, k2)) "
        "MAPPED BY (zm_ht, COLS=[v=f.v]) OPTIONS(regions=8, layout=zorder)"
    )
    rel = astro.relation("zm")
    df = spark.range(4_000).selectExpr(
        "CAST(pmod(id * 7, 200) AS INT) k1",
        "CAST(floor(id / 200) AS INT) k2",
        "CAST(id AS DOUBLE) v",
    )
    rel.write(df)
    rel.register_view("zm")
    # append an upsert generation (rowkey-sorted fragments interleave
    # with z-files → resolved paths must fall back; the purge need not)
    astro.sql("INSERT INTO zm VALUES (7, 1, 777.0)")
    rel = astro.relation("zm")
    assert rel.needs_merge()
    n_frag = len(rel.meta.regions)

    before = _file_idents(astro, rel)
    astro.sql("DELETE FROM zm WHERE k1 = 7 AND k2 = 0")  # key-only point
    stats = astro.last_write_stats
    assert stats["files_total"] == n_frag
    assert 0 < stats["files_rewritten"] < n_frag
    after = _file_idents(astro, astro.relation("zm"))
    for f in set(before) & set(after):
        assert before[f] == after[f]

    assert astro.sql("SELECT count(*) AS c FROM zm WHERE k1 = 7 AND k2 = 0").collect()[0].c == 0
    # the appended upsert still resolves newest-wins
    r = astro.sql("SELECT v FROM zm WHERE k1 = 7 AND k2 = 1").collect()[0]
    assert r.v == 777.0
    assert astro.sql("SELECT count(*) AS c FROM zm").collect()[0].c == 3999


def test_zorder_multigen_residual_delete_resolved_keyset(spark, astro):
    """r8 follow-on: multi-generation z-order + RESIDUAL predicate — the
    one write state that still paid a full rewrite.  The z path declines
    (appends interleave with z-files in key space) and the rowkey-island
    closure degenerates (z-file envelopes chain into one island), but
    the resolved-key-set plan applies: dim boxes prune the hit set, the
    matched rowkeys are computed from the resolved hit fragments, and
    only those fragments are purged — the rest stay inode-identical."""
    astro.sql(
        "CREATE TABLE zr (k1 INT, k2 INT, v DOUBLE, PRIMARY KEY (k1, k2)) "
        "MAPPED BY (zr_ht, COLS=[v=f.v]) OPTIONS(regions=16, layout=zorder)"
    )
    rel = astro.relation("zr")
    df = spark.range(20_000).selectExpr(
        "CAST(pmod(id * 77, 200) AS INT) k1",
        "CAST(floor(id / 200) AS INT) k2",
        "CAST(id AS DOUBLE) v",
    )
    rel.write(df)
    rel.register_view("zr")
    thr = 60  # dim-box-prunable leading-dim bound (k1 spans 0..199)

    # gen-1 append LOCALIZED inside the band (one upsert of an existing
    # key + one brand-new key) — realistic ingest locality
    astro.sql(f"INSERT INTO zr VALUES ({thr}, 5, 111.0)")
    astro.sql(f"INSERT INTO zr VALUES ({thr}, 9999, 222.0)")
    rel = astro.relation("zr")
    assert len({r.seq for r in rel.meta.regions}) >= 2  # multi-generation
    pre_max = rel.current_seq()
    n_frag = len(rel.meta.regions)
    before = _file_idents(astro, rel)
    n_before = astro.sql("SELECT count(*) AS c FROM zr").collect()[0].c
    gone = astro.sql(
        f"SELECT count(*) AS c FROM zr WHERE k1 <= {thr} AND v < 5000"
    ).collect()[0].c
    assert gone > 0

    # RESIDUAL predicate (v is not a key): key-only purge refuses, the
    # z path refuses (multi-gen), islands collapse — the resolved-key-set
    # plan must catch it
    import time

    t_del = time.time() - 1  # stamp clock granularity slack
    astro.sql(f"DELETE FROM zr WHERE k1 <= {thr} AND v < 5000")
    stats = astro.last_write_stats
    assert stats["files_total"] == n_frag
    assert 1 <= stats["files_rewritten"] < n_frag  # never the whole table

    rel = astro.relation("zr")
    after = _file_idents(astro, rel)
    kept = set(before) & set(after)
    assert len(kept) == n_frag - stats["files_rewritten"]
    for f in kept:
        assert before[f] == after[f]

    # data exact: deleted rows gone, everything else intact — INCLUDING
    # merge-on-read resolution of any gen-1 keys that survived
    assert astro.sql("SELECT count(*) AS c FROM zr").collect()[0].c == n_before - gone
    assert astro.sql(
        f"SELECT count(*) AS c FROM zr WHERE k1 <= {thr} AND v < 5000"
    ).collect()[0].c == 0
    # the gen-1 rows (111.0 and 222.0, both < 5000 after resolution) are
    # gone — the upserted key entirely, in every version
    got = astro.sql(
        f"SELECT k1, k2, v FROM zr WHERE k1 = {thr} AND k2 IN (5, 9999)"
    ).collect()
    assert got == []

    # history folded with RETAINED stamps (r9): DELETE only removes
    # rows, so surviving generations keep their original commit times —
    # a pre-delete timestamp at/after the floor generation's commit
    # resolves to the PURGED present (never the deleted rows), and the
    # floor guard refuses anything older
    assert stats["history"] == "folded-purge"
    # floor = max SURVIVING generation (the purge deleted the upserted
    # keys' every version, so newer generations may vanish entirely —
    # a pre-max floor would brick all versioned reads, r8 review #2)
    surviving_max = max(r.seq for r in rel.meta.regions)
    assert rel.meta.history_floor == surviving_max <= pre_max
    # a timestamp just after the newest known commit — i.e. still
    # BEFORE the delete — resolves at/above the floor (r10: stamps of
    # TRAILING vanished generations are retained, so the resolved
    # number may be the vanished generation's; its snapshot is the same
    # purged present, because only files with seq <= N are read and
    # every survivor sits at/below the floor)
    n_asof = rel.seq_for_timestamp(max(rel.meta.generation_times.values()) + 1e-3)
    assert n_asof >= rel.meta.history_floor
    snap = rel.scan(as_of_seq=n_asof)
    assert snap.count() == n_before - gone
    assert snap.filter(f"k1 <= {thr} AND v < 5000").count() == 0
    # dim-box pruning still sound on the purged state
    got2 = sorted(
        (r.k1, r.k2)
        for r in rel.scan_where(f"k1 > {thr} AND k2 BETWEEN 40 AND 60")[0].collect()
    )
    want2 = sorted(
        (r.k1, r.k2)
        for r in rel.scan().where(f"k1 > {thr} AND k2 BETWEEN 40 AND 60").collect()
    )
    assert got2 == want2 and got2

    # a second residual DELETE in a different band still prunes
    astro.sql(f"DELETE FROM zr WHERE k1 > 150 AND v < 3000")
    s2 = astro.last_write_stats
    assert s2["files_rewritten"] < s2["files_total"]
    assert astro.sql(
        "SELECT count(*) AS c FROM zr WHERE k1 > 150 AND v < 3000"
    ).collect()[0].c == 0


def test_single_island_residual_literal_update_keyset(astro, tmp_path):
    """Resolved-key-set UPDATE: a literal SET with a residual predicate
    on a fully-overlapping (regions=1 + upsert) table updates every
    version of the matched keys per-fragment instead of rewriting the
    whole table."""
    _load(astro, tmp_path, name="uk", n=50, regions=1)  # one island
    astro.sql("INSERT INTO uk VALUES (25, 'x25', 0)")
    rel = astro.relation("uk")
    assert rel.needs_merge()
    before = _file_idents(astro, rel)
    # residual (v referenced), all-literal SET: keyset path
    astro.sql("UPDATE uk SET n = 777, v = NULL WHERE k <= 12 AND v = 'v11'")
    stats = astro.last_write_stats
    assert stats is not None and 1 <= stats["files_rewritten"] < stats["files_total"]
    after = _file_idents(astro, astro.relation("uk"))
    for f in set(before) & set(after):
        assert before[f] == after[f]
    r = astro.sql("SELECT v, n FROM uk WHERE k = 11").collect()[0]
    assert (r.v, r.n) == (None, 777)  # NULL beat every version
    # non-matching rows untouched, merge-on-read resolution intact
    r = astro.sql("SELECT v, n FROM uk WHERE k = 12").collect()[0]
    assert (r.v, r.n) == ("v12", 120)
    r = astro.sql("SELECT v, n FROM uk WHERE k = 25").collect()[0]
    assert (r.v, r.n) == ("x25", 0)


def test_keyonly_purge_after_alter_add(astro, tmp_path):
    """Purging fragments written BEFORE an ALTER ADD: the declared-schema
    read null-fills the absent column, the rewrite persists those rows
    with explicit NULLs, and reads stay identical."""
    _load(astro, tmp_path, name="aa", n=60, regions=4)
    astro.sql("ALTER TABLE aa ADD extra STRING MAPPED BY (f.x)")
    astro.sql("INSERT INTO aa VALUES (100, 'v100', 1000, 'has-extra')")
    astro.sql("DELETE FROM aa WHERE k = 20")  # key-only purge over mixed schemas
    stats = astro.last_write_stats
    assert stats["files_rewritten"] < stats["files_total"]
    rows = {r.k: (r.v, r.extra) for r in astro.sql(
        "SELECT k, v, extra FROM aa WHERE k IN (19, 20, 21, 100)"
    ).collect()}
    assert 20 not in rows
    assert rows[19] == ("v19", None) and rows[21] == ("v21", None)
    assert rows[100] == ("v100", "has-extra")


def test_keyonly_literal_update_purge_semantics(astro, tmp_path):
    """r8: `SET <literal> WHERE <key-only>` takes the per-fragment
    rewrite — every version of the matched key gets the constant, the
    resolved read returns it (NULL included), history stays readable
    with the update applied retroactively, and pending upserts elsewhere
    are untouched."""
    _load(astro, tmp_path, name="lu")
    astro.sql("INSERT INTO lu VALUES (30, 'v30b', 999)")  # gen-1 upsert
    rel = astro.relation("lu")
    assert rel.needs_merge()

    before = _file_idents(astro, rel)
    astro.sql("UPDATE lu SET v = NULL, n = 777 WHERE k = 30")
    stats = astro.last_write_stats
    assert stats is not None and 0 < stats["files_rewritten"] < stats["files_total"]
    after = _file_idents(astro, astro.relation("lu"))
    for f in set(before) & set(after):
        assert before[f] == after[f]

    r = astro.sql("SELECT v, n FROM lu WHERE k = 30").collect()[0]
    assert (r.v, r.n) == (None, 777)  # NULL wins over BOTH versions
    # history readable, update applied retroactively in gen 0 too
    rel = astro.relation("lu")
    g0 = rel.scan(as_of_seq=0)
    row0 = g0.filter("k = 30").collect()[0]
    assert (row0.v, row0.n) == (None, 777)
    # neighbors untouched in every generation
    assert g0.filter("k = 29").collect()[0].v == "v29"
    r29 = astro.sql("SELECT v FROM lu WHERE k = 29").collect()[0]
    assert r29.v == "v29"
    # survives COMPACT (the historical append-path bug class)
    astro.sql("COMPACT TABLE lu")
    r = astro.sql("SELECT v, n FROM lu WHERE k = 30").collect()[0]
    assert (r.v, r.n) == (None, 777)
