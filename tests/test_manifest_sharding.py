"""r14 — catalog manifest sharding (VERDICT r13 #3, Iceberg-manifest
analog).

Pre-r14 the catalog kept one JSON object per table: every commit
re-serialized the FULL region list, so at 10⁵-10⁶ fragments (real
100 TB trickle ingest) commit cost and the CAS retry window grew
O(#files).  r14 shards the region lists into immutable
content-addressed generation-range manifest files; the CAS'd pointer
holds only refs + stats, and `_write_manifests` reuses byte-identical
manifests from the previous grouping — an append commit writes the new
generation's manifest + the pointer, O(delta) bytes, independent of
table fragment count.

Pure-metadata tests — no Spark session.
"""

import json
import os
import time

import pytest

from spark_sql_on_hbase_spark.catalog import (
    AstroCatalog,
    KeyColumn,
    NonKeyColumn,
    RegionFile,
    TableMeta,
)


def _rf(i: int, seq: int = 0, retired_at: int = -1) -> RegionFile:
    h = f"{i:016x}"
    return RegionFile(
        path=f"file:///data/frag-{i:08d}.parquet",
        num_rows=1000,
        min_key=[i * 10],
        max_key=[i * 10 + 9],
        min_rowkey_hex=h,
        max_rowkey_hex=h + "ff",
        seq=seq,
        num_keys=1000,
        retired_at=retired_at,
    )


def _meta(name: str, frags: list[RegionFile]) -> TableMeta:
    return TableMeta(
        name=name,
        namespace="default",
        physical_table=f"h_{name}",
        key_columns=[KeyColumn("k", "int", 0)],
        nonkey_columns=[NonKeyColumn("v", "double", "f", "v")],
        encoding="binaryformat",
        num_regions=8,
        regions=frags,
        created_at="2026-01-01",
    )


def _mk(tmp_path, name: str, n_frags: int, n_gens: int = 100):
    cat = AstroCatalog(str(tmp_path / f"wh_{name}"))
    frags = [_rf(i, seq=i % n_gens) for i in range(n_frags)]
    meta = _meta(name, frags)
    cat.create_table(meta)
    return cat, meta


def _append_commit(cat, meta):
    new_seq = max((r.seq for r in meta.regions), default=0) + 1
    meta.regions = meta.regions + [_rf(10_000_000 + new_seq, seq=new_seq)]
    cat.persist(meta)
    return cat.last_commit_bytes


@pytest.mark.slow  # r16 (VERDICT r15 #1): soak/fuzz sweep — --runslow lane
def test_append_commit_bytes_independent_of_fragment_count(tmp_path):
    """THE acceptance criterion: an append on a 100k-fragment table
    writes about the same bytes as on a 1k-fragment table."""
    cat_s, meta_s = _mk(tmp_path, "small", 1_000)
    cat_l, meta_l = _mk(tmp_path, "large", 100_000)
    b_small = _append_commit(cat_s, meta_s)
    b_large = _append_commit(cat_l, meta_l)
    # both commits: pointer (~a few KB: 64 refs + gens/stamps) + one
    # single-fragment manifest — NOT the ~40 MB a 100k-fragment inline
    # region list would re-serialize
    assert b_large < 3 * b_small + 4096, (b_small, b_large)
    assert b_large < 200_000, b_large


def test_roundtrip_and_fanout(tmp_path):
    cat, meta = _mk(tmp_path, "rt", 5_000, n_gens=300)
    assert len(meta.region_manifests) <= cat.MANIFEST_FANOUT
    cat._cache.clear()
    got = cat.get_table("rt")
    assert len(got.regions) == 5_000
    assert {r.path for r in got.regions} == {r.path for r in meta.regions}
    # pointer holds refs, never inline region lists
    with open(cat._meta_path("default", "rt")) as f:
        raw = json.load(f)
    assert "regions" not in raw and "retired_regions" not in raw
    assert 0 < len(raw["region_manifests"]) <= cat.MANIFEST_FANOUT


def test_unchanged_commit_reuses_every_manifest(tmp_path):
    cat, meta = _mk(tmp_path, "reuse", 10_000)
    cat.persist(meta)  # no region change at all
    # only the pointer is written; every manifest is content-addressed
    # and already on disk
    ptr = os.path.getsize(cat._meta_path("default", "reuse"))
    assert cat.last_commit_bytes == ptr


@pytest.mark.slow  # r16 (VERDICT r15 #1): soak/fuzz sweep — --runslow lane
def test_steady_state_trickle_stays_o_delta(tmp_path):
    """80 consecutive appends: the TYPICAL commit writes only pointer +
    one tiny manifest; merges (hysteresis folds every ~fanout/4
    commits) rewrite the smallest adjacent manifests, never the whole
    table — so the amortized per-commit bytes stay far under the ~8 MB
    an inline region list would re-serialize EVERY commit."""
    import statistics

    cat, meta = _mk(tmp_path, "trickle", 20_000, n_gens=50)
    bs = [_append_commit(cat, meta) for _ in range(80)]
    inline_rewrite = 20_000 * 400  # ~bytes of one inline region list
    assert statistics.median(bs) < 20_000, statistics.median(bs)
    assert max(bs) < inline_rewrite / 4, max(bs)  # worst merge bounded
    assert sum(bs) / len(bs) < inline_rewrite / 50, sum(bs) / len(bs)
    assert len(meta.region_manifests) <= cat.MANIFEST_FANOUT
    cat._cache.clear()
    assert len(cat.get_table("trickle").regions) == 20_000 + 80


def test_retire_rewrites_only_touched_manifest(tmp_path):
    cat, meta = _mk(tmp_path, "ret", 10_000, n_gens=100)
    # retire one fragment (gen 7) — only gen-7's manifest content moves
    victim = next(r for r in meta.regions if r.seq == 7)
    victim.retired_at = 101
    meta.retired_regions = [victim]
    meta.regions = [r for r in meta.regions if r.path != victim.path]
    cat.persist(meta)
    ptr = os.path.getsize(cat._meta_path("default", "ret"))
    # pointer + ONE rewritten manifest (~100 fragments), not all 10k
    assert cat.last_commit_bytes < ptr + 120_000, cat.last_commit_bytes
    cat._cache.clear()
    got = cat.get_table("ret")
    assert len(got.regions) == 9_999 and len(got.retired_regions) == 1
    assert got.retired_regions[0].retired_at == 101


def test_unchanged_manifest_stats_not_recomputed(tmp_path, monkeypatch):
    """r15 review: the ref-stats pass must be O(changed manifests), not
    O(total live fragments) — an append commit reuses the previous
    pointer's envelope/seq stats for every byte-identical manifest and
    recomputes only the refs whose content moved."""
    import spark_sql_on_hbase_spark.catalog as catmod

    cat, meta = _mk(tmp_path, "stats", 10_000, n_gens=100)
    n_refs = len(meta.region_manifests)
    assert n_refs > 10  # meaningful reuse surface
    calls = []
    real = catmod._manifest_ref_stats

    def counting(live, m):
        calls.append(len(live))
        return real(live, m)

    monkeypatch.setattr(catmod, "_manifest_ref_stats", counting)
    _append_commit(cat, meta)
    # only the new generation's manifest (plus any hysteresis merge)
    # computes stats; the 10k existing fragments are never re-walked
    assert len(calls) <= 3, calls
    assert sum(calls) < 1_000, calls
    # reused refs still CARRY their stats and they match a fresh read
    cat._cache.clear()
    got = cat.get_table("stats")
    with_stats = [r for r in got.region_manifests if "seq_lo" in r]
    assert len(with_stats) == len(got.region_manifests)
    # spot-check one reused ref's envelope against its manifest content
    ref = got.region_manifests[0]
    mdir = os.path.join(cat.root, "default", "stats.manifests")
    with open(os.path.join(mdir, ref["file"])) as f:
        body = json.load(f)
    fresh = real([dict(d) for d in body["live"]], got)
    assert fresh["env_lo"] == ref["env_lo"] and fresh["env_hi"] == ref["env_hi"]
    assert fresh["seq_lo"] == ref["seq_lo"] and fresh["seq_hi"] == ref["seq_hi"]


def test_gc_sweeps_stale_orphans_keeps_fresh(tmp_path):
    cat, meta = _mk(tmp_path, "gc", 1_000)
    mdir = cat._manifest_dir(meta)
    stale = os.path.join(mdir, "m-99999999-deadbeefdead.json")
    fresh = os.path.join(mdir, "m-99999998-cafecafecafe.json")
    for p in (stale, fresh):
        with open(p, "w") as f:
            f.write('{"live": [], "retired": []}')
    old = time.time() - cat.MANIFEST_GC_GRACE_SEC - 5
    os.utime(stale, (old, old))
    cat.persist(meta)
    assert not os.path.exists(stale)
    assert os.path.exists(fresh)  # inside the grace window
    # referenced manifests survive regardless of age
    ref0 = os.path.join(mdir, meta.region_manifests[0]["file"])
    os.utime(ref0, (old, old))
    cat.persist(meta)
    assert os.path.exists(ref0)


def test_drop_table_removes_manifest_dir(tmp_path):
    cat, meta = _mk(tmp_path, "dr", 500)
    mdir = cat._manifest_dir(meta)
    assert os.path.isdir(mdir)
    cat.drop_table("dr")
    assert not os.path.isdir(mdir)


def test_legacy_inline_metadata_still_loads(tmp_path):
    """Pre-r14 pointer files inline the region lists — they must load,
    and their first commit converts them to the manifest format."""
    cat, meta = _mk(tmp_path, "leg", 100)
    path = cat._meta_path("default", "leg")
    with open(path) as f:
        raw = json.load(f)
    # rewrite as the legacy inline format
    from dataclasses import asdict

    raw.pop("region_manifests")
    raw["regions"] = [asdict(r) for r in meta.regions]
    raw["retired_regions"] = []
    with open(path, "w") as f:
        json.dump(raw, f)
    cat._cache.clear()
    got = cat.get_table("leg")
    assert len(got.regions) == 100
    cat.persist(got)  # first commit over legacy → manifest format
    with open(path) as f:
        raw2 = json.load(f)
    assert "regions" not in raw2 and raw2["region_manifests"]


def test_cas_conflict_leaves_orphans_only(tmp_path):
    """A conflicted commit must not corrupt state: manifests written
    before the failed CAS are orphans the next commit GCs."""
    from spark_sql_on_hbase_spark.catalog import ConcurrentWriteError

    cat, meta = _mk(tmp_path, "cas", 1_000)
    stale = cat._load("cas", "default")  # independent snapshot
    _append_commit(cat, meta)  # moves the disk version
    stale.regions = stale.regions + [_rf(999_999, seq=77)]
    with pytest.raises(ConcurrentWriteError):
        cat.persist(stale)
    cat._cache.clear()
    got = cat.get_table("cas")
    assert len(got.regions) == 1_001  # the real commit, nothing else
