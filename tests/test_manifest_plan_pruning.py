"""r15 (VERDICT r14 #3) — manifest-level coarse pruning at PLAN time.

r14's manifest sharding made COMMITS O(delta) at 10⁵-10⁶ fragments, but
planning still loaded and 3-valued-evaluated every fragment's envelope
per query.  The pointer refs now carry each manifest's aggregated
per-dimension envelope (+ fragment seq range), and `prune_files` does a
two-level walk: one evaluation per MANIFEST, descending into fragments
only for manifests that might match.  These tests build a synthetic
100k-fragment table through the real catalog persist path and assert
(a) the two-level walk visits O(fragments-of-surviving-manifests), not
O(#fragments), (b) decisions are identical to the flat walk, and
(c) plan wall time is measured and recorded.

Reference analog: HBaseCriticalPoint's binary search is over ~10³
regions — the reference never faced 10⁵ fragments; this is the piece
that keeps driver-side planning flat when the fragment count is 100×
the reference's region count.
"""

import time

import pytest

from spark_sql_on_hbase_spark import pruning
from spark_sql_on_hbase_spark.catalog import (
    AstroCatalog,
    KeyColumn,
    NonKeyColumn,
    RegionFile,
    TableMeta,
)

N_FRAGS = 100_000
ROWS_PER = 10


def _mk_region(i: int) -> RegionFile:
    lo, hi = i * ROWS_PER, i * ROWS_PER + ROWS_PER - 1
    return RegionFile(
        path=f"f-{i:06d}.parquet",
        num_rows=ROWS_PER,
        min_key=[lo],
        max_key=[hi],
        min_rowkey_hex=f"{lo:016x}",
        max_rowkey_hex=f"{hi:016x}",
        seq=i,
        num_keys=ROWS_PER,
        dim_min=[lo],
        dim_max=[hi],
    )


@pytest.fixture(scope="module")
def big_meta(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("manifest_plan") / "wh_meta")
    cat = AstroCatalog(root)
    meta = TableMeta(
        name="big",
        namespace="default",
        physical_table="big_ht",
        key_columns=[KeyColumn("k", "int", 0)],
        nonkey_columns=[NonKeyColumn("v", "double", "f", "v")],
        num_regions=8,
        declared_columns=["k", "v"],
    )
    cat.create_table(meta)
    meta.regions = [_mk_region(i) for i in range(N_FRAGS)]
    cat.persist(meta)  # shards into ≤64 manifests, refs carry envelopes
    return cat, meta


def test_pointer_refs_carry_envelopes_and_seq_ranges(big_meta):
    cat, meta = big_meta
    refs = meta.region_manifests
    assert 0 < len(refs) <= cat.MANIFEST_FANOUT
    for r in refs:
        assert "env_lo" in r and "env_hi" in r and "seq_lo" in r
        assert r["env_lo"][0] is not None and r["env_hi"][0] is not None
    # the union envelopes tile the key space
    assert min(r["env_lo"][0] for r in refs) == 0
    assert max(r["env_hi"][0] for r in refs) == N_FRAGS * ROWS_PER - 1


def test_point_lookup_visits_surviving_manifest_only(big_meta, monkeypatch):
    _cat, meta = big_meta
    calls = {"n": 0}
    real = pruning.file_envelope

    def counting(rf, m):
        calls["n"] += 1
        return real(rf, m)

    monkeypatch.setattr(pruning, "file_envelope", counting)
    meta._mgroups_cache = None  # cold grouping, fair timing
    t0 = time.perf_counter()
    res = pruning.prune_files(meta, "k = 555555")
    plan_ms = (time.perf_counter() - t0) * 1000.0
    assert [r.path for r in res.files] == [f"f-{55555:06d}.parquet"]
    # only the surviving manifest's fragments were envelope-evaluated:
    # ~N/#manifests, nowhere near N
    per_manifest = N_FRAGS / len(meta.region_manifests)
    assert calls["n"] <= 2 * per_manifest, (calls["n"], per_manifest)
    assert calls["n"] < N_FRAGS / 10
    # measured plan time on a 100k-fragment table (recorded; the
    # correctness assert is the call count — wall is informative)
    print(f"plan_ms(point lookup, {N_FRAGS} frags): {plan_ms:.1f}")


def test_grouped_walk_matches_flat_walk(big_meta, monkeypatch):
    _cat, meta = big_meta
    preds = [
        "k = 555555",
        "k BETWEEN 100 AND 905",
        "k < 50 OR k >= 999000",
        "k IN (5, 500005, 999995)",
        "k > 1000000000",  # nothing survives
        "v > 0.5",  # non-key predicate: nothing prunable
    ]
    for where in preds:
        grouped = pruning.prune_files(meta, where)
        monkeypatch.setattr(pruning, "manifest_groups", lambda m: None)
        flat = pruning.prune_files(meta, where)
        monkeypatch.undo()
        assert [r.path for r in grouped.files] == [r.path for r in flat.files], where


def test_grouping_is_cached_per_metadata_version(big_meta):
    _cat, meta = big_meta
    g1 = pruning.manifest_groups(meta)
    g2 = pruning.manifest_groups(meta)
    assert g1 is g2  # memoized
    meta.meta_version += 1
    try:
        g3 = pruning.manifest_groups(meta)
        assert g3 is not g2
    finally:
        meta.meta_version -= 1


def test_overlapping_seq_ranges_fall_back_flat(big_meta):
    """A pointer violating the seq-partition invariant must disable the
    two-level walk, never mis-assign fragments."""
    _cat, meta = big_meta
    import copy

    m2 = copy.copy(meta)
    m2.region_manifests = copy.deepcopy(meta.region_manifests)
    m2.region_manifests[0]["seq_hi"] = 10**9  # overlap everything
    m2._mgroups_cache = None
    assert pruning.manifest_groups(m2) is None


def test_small_tables_skip_the_prepass():
    meta = TableMeta(
        name="small",
        namespace="default",
        physical_table="s_ht",
        key_columns=[KeyColumn("k", "int", 0)],
        nonkey_columns=[NonKeyColumn("v", "double", "f", "v")],
        num_regions=4,
        declared_columns=["k", "v"],
    )
    meta.regions = [_mk_region(i) for i in range(8)]
    res = pruning.prune_files(meta, "k = 25")
    assert [r.path for r in res.files] == ["f-000002.parquet"]
