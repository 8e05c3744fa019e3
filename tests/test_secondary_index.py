"""Secondary indexes (r12 — Phoenix-global-index analog).

The reference engine serves non-key predicates by residual-filtering a
full scan (ScanPredClassifier); at 100 TB an equality on a non-key
column should be an index range scan + verified point gets.  These
tests pin the contract: `CREATE INDEX ON t (col)` builds a derived
astro table keyed (col, *main_keys), every write path maintains it
SUPERSET-style (stale-extra entries allowed, missing live pairs never),
and `scan_where` routes =/IN conjuncts on the indexed column through a
capped candidate-key lookup — with the full predicate re-applied, so
the index is an accelerator, never a correctness dependency.
"""

import pytest

from spark_sql_on_hbase_spark.session import AstroSession

DDL = (
    "CREATE TABLE si (k1 INT, status STRING, amt INT, PRIMARY KEY (k1)) "
    "MAPPED BY (si_ht, COLS=[status=f.s, amt=f.a]) OPTIONS (regions=4)"
)


@pytest.fixture()
def astro(spark, tmp_path):
    a = AstroSession(spark, str(tmp_path / "si_wh"))
    a.sql(DDL)
    csv = tmp_path / "si.csv"
    # statuses A..D cyclic; E is rare AND clustered in region 0
    # (keys 7/17/27/37) so the candidate-key pruning is observable
    rows = []
    for i in range(400):
        st = "E" if i in (7, 17, 27, 37) else "ABCD"[i % 4]
        rows.append(f"{i},{st},{i * 10}\n")
    csv.write_text("".join(rows))
    a.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE si")
    return a


def test_create_index_and_lookup(astro):
    astro.sql("CREATE INDEX ON si (status)")
    rel = astro.relation("si")
    assert rel.meta.indexes == {"status": "si__idx_status"}
    df, res = rel.scan_where("status = 'E'")
    got = sorted(r.k1 for r in df.collect())
    assert got == [7, 17, 27, 37]
    assert res.index_used == "status"
    assert len(res.files) < len(rel.meta.regions), "index did not prune"


@pytest.mark.slow  # r16 (VERDICT r15 #1): soak/fuzz sweep — --runslow lane
def test_index_lookup_matches_full_scan_fuzz(astro):
    astro.sql("CREATE INDEX ON si (status)")
    rel = astro.relation("si")
    for st in ("A", "B", "C", "D", "E", "ZZZ"):
        df, res = rel.scan_where(f"status = '{st}'")
        expect = sorted(
            r.k1 for r in rel.scan().filter(f"status = '{st}'").collect()
        )
        assert sorted(r.k1 for r in df.collect()) == expect, st


def test_index_maintained_on_insert_and_update(astro):
    astro.sql("CREATE INDEX ON si (status)")
    rel = astro.relation("si")
    astro.sql("INSERT INTO si VALUES (1000, 'E', 1), (1001, 'Q', 2)")
    df, res = rel.scan_where("status = 'Q'")
    assert [r.k1 for r in df.collect()] == [1001]
    assert res.index_used == "status"
    # upsert flips k1=1000 E -> A: old index entry goes stale-extra, the
    # new value must be found, and a lookup of the OLD value must not
    # return the flipped row
    astro.sql("UPDATE si SET status = 'A' WHERE k1 = 1000")
    rel = astro.relation("si")
    df, _ = rel.scan_where("status = 'E'")
    got = sorted(r.k1 for r in df.collect())
    assert 1000 not in got and got == [7, 17, 27, 37]
    df, _ = rel.scan_where("status = 'A' AND k1 >= 1000")
    assert [r.k1 for r in df.collect()] == [1000]


def test_index_with_delete(astro):
    astro.sql("CREATE INDEX ON si (status)")
    astro.sql("DELETE FROM si WHERE k1 = 17")
    rel = astro.relation("si")
    df, res = rel.scan_where("status = 'E'")
    assert sorted(r.k1 for r in df.collect()) == [7, 27, 37]
    assert res.index_used == "status"


def test_in_list_and_conjunction(astro):
    astro.sql("CREATE INDEX ON si (status)")
    rel = astro.relation("si")
    astro.sql("INSERT INTO si VALUES (1500, 'Q', 200000)")
    rel = astro.relation("si")
    df, res = rel.scan_where("status IN ('E', 'Q') AND amt > 100")
    assert sorted(r.k1 for r in df.collect()) == [17, 27, 37, 1500]
    assert res.index_used == "status"


def test_absent_value_reads_zero_files(astro):
    astro.sql("CREATE INDEX ON si (status)")
    rel = astro.relation("si")
    df, res = rel.scan_where("status = 'NOPE'")
    assert df.count() == 0
    assert res.index_used == "status"
    assert res.files == []


def test_cap_escalates_to_semijoin_or_full_scan(astro):
    """Over the driver-collect cap the router escalates to the r13
    distributed semi-join when the key set is selective enough, and to
    a plain full scan when it isn't — never a wrong result either way
    (tests/test_index_range_semijoin.py covers both paths at size)."""
    astro.sql("CREATE INDEX ON si (status)")
    rel = astro.relation("si")
    old = rel.INDEX_LOOKUP_CAP
    try:
        rel.INDEX_LOOKUP_CAP = 2  # 'A' has 100 candidates > 2
        df, res = rel.scan_where("status = 'A'")
        # 100 of 400 keys = exactly the 25% selectivity edge → semijoin
        assert res.index_mode == "semijoin" and res.index_used == "status"
        assert df.count() == rel.scan().filter("status = 'A'").count()
        rel.INDEX_LOOKUP_CAP = 2
        # push selectivity past the fraction: A∪B∪C = 300/400 keys
        df, res = rel.scan_where("status IN ('A', 'B', 'C')")
        assert res.index_used is None  # not selective enough — full scan
        assert df.count() == rel.scan().filter("status IN ('A','B','C')").count()
    finally:
        rel.INDEX_LOOKUP_CAP = old


def test_overwrite_leaves_index_correct(astro):
    astro.sql("CREATE INDEX ON si (status)")
    astro.sql(
        "INSERT OVERWRITE si SELECT k1, 'X' AS status, amt FROM si WHERE k1 < 10"
    )
    rel = astro.relation("si")
    # old entries are stale-extra; new content must be fully served
    df, res = rel.scan_where("status = 'X'")
    assert sorted(r.k1 for r in df.collect()) == list(range(10))
    df, _ = rel.scan_where("status = 'E'")
    assert df.count() == 0


def test_drop_index(astro):
    astro.sql("CREATE INDEX ON si (status)")
    astro.sql("DROP INDEX ON si (status)")
    rel = astro.relation("si")
    assert rel.meta.indexes == {}
    assert not astro.catalog.table_exists("si__idx_status")
    df, res = rel.scan_where("status = 'E'")
    assert sorted(r.k1 for r in df.collect()) == [7, 17, 27, 37]
    assert res.index_used is None


def test_alter_drop_indexed_column_refused(astro):
    astro.sql("CREATE INDEX ON si (status)")
    with pytest.raises(ValueError, match="indexed"):
        astro.sql("ALTER TABLE si DROP status")


def test_drop_table_cascades_indexes(astro):
    astro.sql("CREATE INDEX ON si (status)")
    astro.sql("DROP TABLE si")
    assert not astro.catalog.table_exists("si")
    assert not astro.catalog.table_exists("si__idx_status")


def test_key_column_not_indexable(astro):
    with pytest.raises(ValueError, match="key column"):
        astro.sql("CREATE INDEX ON si (k1)")


def test_stringformat_refused(spark, tmp_path):
    a = AstroSession(spark, str(tmp_path / "sf_wh"))
    a.sql(
        "CREATE TABLE sft (k INT, v STRING, PRIMARY KEY (k)) "
        "MAPPED BY (sft_ht, COLS=[v=f.v]) IN stringformat"
    )
    with pytest.raises(ValueError, match="binaryformat"):
        a.sql("CREATE INDEX ON sft (v)")


def test_describe_extended_lists_indexes(astro):
    astro.sql("CREATE INDEX ON si (status)")
    rows = astro.sql("DESCRIBE EXTENDED si").collect()
    kv = {r[0]: r[1] for r in rows}
    # r13: the listing also flags covering-readiness (index-only reads)
    assert kv.get("indexes", "").startswith("(status)->si__idx_status")


def test_null_values_unindexed_but_correct(astro):
    astro.sql("CREATE INDEX ON si (status)")
    astro.sql("INSERT INTO si VALUES (2000, NULL, 5)")
    rel = astro.relation("si")
    # IS NULL never routes through the index (res.index_used None)
    df, res = rel.scan_where("status IS NULL")
    assert [r.k1 for r in df.collect()] == [2000]
    assert res.index_used is None
    # and indexed lookups still exact
    df, _ = rel.scan_where("status = 'E'")
    assert sorted(r.k1 for r in df.collect()) == [7, 17, 27, 37]


def test_streaming_sink_maintains_index(astro, tmp_path):
    """Index maintenance rides the fragment-stat pass, so the streaming
    sink's upsert appends maintain it with no sink-side code."""
    from spark_sql_on_hbase_spark.streaming.sink import write_stream_to_table

    astro.sql("CREATE INDEX ON si (status)")
    spark = astro.spark
    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()
    import json

    with open(src_dir / "b.json", "w") as f:
        for i in (5000, 5001):
            f.write(json.dumps({"k1": i, "status": "S", "amt": i}) + "\n")
    stream = (
        spark.readStream.schema("k1 int, status string, amt int")
        .json(str(src_dir))
    )
    q = write_stream_to_table(
        stream, astro.relation("si"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    rel = astro.relation("si")
    df, res = rel.scan_where("status = 'S'")
    assert sorted(r.k1 for r in df.collect()) == [5000, 5001]
    assert res.index_used == "status"


@pytest.mark.slow  # r16 (VERDICT r15 #1): soak/fuzz sweep — --runslow lane
def test_index_autocompacts_under_trickle(astro):
    """One index fragment per main append would grow without bound
    under trickle ingest; the maintenance hook compacts the index at
    the same 4x-regions threshold the streaming sink uses."""
    astro.sql("CREATE INDEX ON si (status)")
    rel = astro.relation("si")
    idx_regions = rel._index_relation("status").meta.num_regions
    for i in range(4 * idx_regions + 3):
        astro.sql(f"INSERT INTO si VALUES ({9000 + i}, 'T', {i})")
    idx_rel = rel._index_relation("status")
    assert len(idx_rel.meta.regions) <= 4 * idx_regions + 1, "index never compacted"
    df, res = astro.relation("si").scan_where("status = 'T'")
    assert df.count() == 4 * idx_regions + 3
    assert res.index_used == "status"


def test_two_session_appends_both_indexed(astro, spark, tmp_path):
    """Two AstroSessions over one warehouse appending interleaved: the
    CAS on the index table serializes the maintenance appends, and both
    sessions' rows are findable through the index afterwards."""
    wh = astro.catalog.root
    astro.sql("CREATE INDEX ON si (status)")
    other = AstroSession(spark, wh)
    astro.sql("INSERT INTO si VALUES (7000, 'W', 1)")
    other.sql("INSERT INTO si VALUES (7001, 'W', 2)")
    astro.sql("INSERT INTO si VALUES (7002, 'W', 3)")
    rel = AstroSession(spark, wh).relation("si")
    df, res = rel.scan_where("status = 'W'")
    assert sorted(r.k1 for r in df.collect()) == [7000, 7001, 7002]
    assert res.index_used == "status"


def test_reindex_shrinks_stale_index(astro):
    """After INSERT OVERWRITE the superset index is correct but mostly
    stale-extra; REINDEX TABLE rebuilds it minimal from live fragments
    and lookups keep working."""
    astro.sql("CREATE INDEX ON si (status)")
    rel = astro.relation("si")
    before = rel._index_relation("status").scan().count()
    astro.sql(
        "INSERT OVERWRITE si SELECT k1, 'X' AS status, amt FROM si WHERE k1 < 10"
    )
    astro.sql("REINDEX TABLE si")
    rel = astro.relation("si")
    after = rel._index_relation("status").scan().count()
    assert after == 10 < before
    df, res = rel.scan_where("status = 'X'")
    assert sorted(r.k1 for r in df.collect()) == list(range(10))
    assert res.index_used == "status"
    df, res = rel.scan_where("status = 'E'")
    assert df.count() == 0 and res.files == []


def test_explain_scan_reports_decisions(astro):
    """EXPLAIN SCAN surfaces the engine-side plan: files read/pruned,
    index/bloom engagement, pushed-vs-residual split."""
    astro.sql("CREATE INDEX ON si (status)")
    rows = {r.property: r.value for r in astro.sql(
        "EXPLAIN SCAN si WHERE status = 'E'"
    ).collect()}
    assert rows["index_used"] == "status"
    assert int(rows["files_read"]) < int(rows["files_total"])
    assert "status" in rows["residual"]
    # plain Spark EXPLAIN still falls through
    plan = astro.sql("EXPLAIN SELECT 1").collect()
    assert plan  # Spark's own plan output
