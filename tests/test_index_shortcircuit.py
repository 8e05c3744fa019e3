"""r14 — full-key index-probe short-circuit (VERDICT r13 #5).

`scan_where` used to probe the index (an index-side scan + up-to-4097-row
collect at plan time) on EVERY call when any index existed — including
full-key point lookups where CPR pruning + ROW blooms already reach the
1-2 fragments that can hold the key, i.e. the hottest query class paid
the probe for zero read savings.  `_full_key_pinned` now detects the
class (every row-key column pinned by a top-level =/IN conjunct) and
skips `_index_route`, recording the skip in
``PruneResult.index_declined`` so EXPLAIN SCAN reports the index as
deliberately not consulted.
"""

import pytest

from spark_sql_on_hbase_spark.session import AstroSession

DDL = (
    "CREATE TABLE sc (k1 INT, k2 INT, status STRING, amt INT, PRIMARY KEY (k1, k2)) "
    "MAPPED BY (sc_ht, COLS=[status=f.s, amt=f.a]) OPTIONS (regions=8)"
)


@pytest.fixture(scope="module")
def astro(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sc")
    a = AstroSession(spark, str(tmp / "sc_wh"))
    a.sql(DDL)
    rows = [f"{i},{i % 7},{'XY'[i % 2]},{i * 10}\n" for i in range(5000)]
    csv = tmp / "sc.csv"
    csv.write_text("".join(rows))
    a.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE sc")
    a.sql("CREATE INDEX ON sc (amt)")
    return a


def test_fullkey_point_skips_index(astro):
    rel = astro.relation("sc")
    df, res = rel.scan_where("k1 = 42 AND k2 = 0 AND amt = 420")
    assert res.index_used is None
    assert res.index_mode is None
    assert res.index_declined and res.index_declined.startswith("full-key")
    got = [(r.k1, r.k2, r.amt) for r in df.collect()]
    assert got == [(42, 0, 420)]


def test_fullkey_in_skips_index(astro):
    rel = astro.relation("sc")
    df, res = rel.scan_where("k1 IN (10, 20) AND k2 IN (3, 6) AND amt >= 0")
    assert res.index_used is None
    assert res.index_declined and "not consulted" in res.index_declined
    assert sorted(r.k1 for r in df.collect()) == [10, 20]


def test_partial_key_still_routes(astro):
    """k2 unpinned → not full-key → the index must still engage."""
    rel = astro.relation("sc")
    df, res = rel.scan_where("k1 = 42 AND amt = 420")
    assert res.index_used == "amt"
    assert [(r.k1, r.k2) for r in df.collect()] == [(42, 0)]


def test_nonkey_only_still_routes(astro):
    rel = astro.relation("sc")
    df, res = rel.scan_where("amt = 1230")
    assert res.index_used == "amt"
    assert res.index_mode in ("augment", "semijoin")
    assert [(r.k1, r.k2) for r in df.collect()] == [(123, 4)]


def test_or_structure_is_not_fullkey(astro):
    """Keys pinned only inside an OR branch must NOT short-circuit
    (the pin is not a top-level conjunct) — and results stay exact."""
    rel = astro.relation("sc")
    df, res = rel.scan_where("(k1 = 42 AND k2 = 0) OR amt = 1230")
    assert res.index_declined is None or not res.index_declined.startswith(
        "full-key"
    )
    assert sorted((r.k1, r.k2) for r in df.collect()) == [(42, 0), (123, 4)]


def test_explain_scan_reports_not_consulted(astro):
    out = astro.sql("EXPLAIN SCAN sc WHERE k1 = 42 AND k2 = 0 AND amt = 420")
    text = "\n".join(" ".join(str(c) for c in r) for r in out.collect())
    assert "full-key point predicate (index not consulted)" in text
