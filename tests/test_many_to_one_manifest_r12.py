"""r12 — many-to-one logical tables (doc §16.1.1) under the
manifest-pointer commit: sibling discovery still works through the
shared physical directory.

- a sibling APPEND is adopted incrementally (unknown part-* files);
- a sibling's UNCOMMITTED rewrite (rw- files present, old files still
  live) is INVISIBLE — no premature adoption, no double counting;
- a sibling's COMMITTED + reclaimed rewrite (old files gone) recovers
  via the full restat, adopting the committed rw- files (the one
  listing-based path allowed to).
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


def _mk_pair(astro):
    for name in ("ma", "mb"):
        astro.sql(
            f"CREATE TABLE {name} (k INT, v STRING, PRIMARY KEY (k)) "
            f"MAPPED BY (shared_ht, COLS=[v=f.v]) OPTIONS (regions=4)"
        )
    astro.sql("INSERT INTO ma SELECT id, CONCAT('v', id) FROM range(1, 81)")


def _rows(astro, name):
    return {r.k: r.v for r in astro.sql(f"SELECT k, v FROM {name}").collect()}


def test_sibling_append_adopted_incrementally(astro):
    _mk_pair(astro)
    assert len(_rows(astro, "mb")) == 80  # mb sees ma's load
    astro.sql("INSERT INTO mb VALUES (500, 'from-b')")
    got = _rows(astro, "ma")  # ma sees mb's append through the listing
    assert got[500] == "from-b" and len(got) == 81


def test_uncommitted_sibling_rewrite_invisible(astro):
    _mk_pair(astro)
    rel_a = astro.relation("ma")
    d = astro.catalog.data_dir(rel_a.meta)
    # fake an in-progress rewrite: an rw- file sitting in the directory
    # with NO catalog commit (its content = a live fragment, so adopting
    # it would double-count rows)
    src = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
    import shutil

    shutil.copy2(os.path.join(d, src), os.path.join(d, f"rw-ma-deadbeef-{src}"))
    assert len(_rows(astro, "mb")) == 80  # not adopted, not double-counted
    assert len(_rows(astro, "ma")) == 80
    meta = astro.catalog.get_table("mb")
    assert all("rw-ma-deadbeef" not in r.path for r in meta.regions)
    os.unlink(os.path.join(d, f"rw-ma-deadbeef-{src}"))


def test_sibling_compact_recovers_via_full_restat(astro):
    _mk_pair(astro)
    astro.sql("INSERT INTO ma VALUES (200, 'late')")  # 2-gen state
    want = _rows(astro, "mb")
    assert len(want) == 81
    # prime mb's meta at the pre-compact file set
    astro.relation("mb")._ensure_fresh_regions()
    pre = {os.path.basename(r.path) for r in astro.catalog.get_table("mb").regions}
    # ma compacts: committed rw- files replace every old file, old files
    # reclaimed — mb's known set is now entirely GONE
    astro.relation("ma").compact()
    got = _rows(astro, "mb")  # gone-path full restat adopts ma's rw files
    assert got == want
    meta = astro.catalog.get_table("mb")
    post = {os.path.basename(r.path) for r in meta.regions}
    assert post and not (post & pre)
    assert all(f.startswith("rw-ma-") for f in post)
    # and mb can keep writing on top of the adopted layout
    astro.sql("INSERT INTO mb VALUES (600, 'post-compact')")
    assert _rows(astro, "ma")[600] == "post-compact"
