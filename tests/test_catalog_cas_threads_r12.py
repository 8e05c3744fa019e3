"""r12: the catalog CAS under TRUE concurrency — many threads doing
read-modify-write loops against one table's metadata (no Spark; the
catalog is plain files + the create-if-absent commit lock).  Every
increment must survive: a lost update means two writers interleaved
through the compare-and-swap, which is exactly what it exists to
prevent.  Also pins lock contention behavior (timeouts retry, stale
locks break) and that reload_into converges a hot loop."""

import threading

import pytest

from spark_sql_on_hbase_spark import fsops
from spark_sql_on_hbase_spark.catalog import (
    AstroCatalog,
    ConcurrentWriteError,
    KeyColumn,
    NonKeyColumn,
    TableMeta,
)


def _mk_table(wh) -> AstroCatalog:
    cat = AstroCatalog(str(wh))
    meta = TableMeta(
        name="t",
        namespace="default",
        physical_table="t_ht",
        key_columns=[KeyColumn("k", "int", 0)],
        nonkey_columns=[NonKeyColumn("v", "string", "f", "v")],
    )
    cat.create_table(meta)
    return cat


@pytest.mark.parametrize("fsmode", ["posix", "copy"])
def test_cas_no_lost_updates_across_threads(tmp_path, fsmode, monkeypatch):
    monkeypatch.setattr(fsops, "_mode", fsmode)
    _mk_table(tmp_path / "wh")
    n_threads, n_ops = 8, 25
    errors: list = []

    def worker(tid: int) -> None:
        # each thread = its own session: own catalog cache, stale reads
        cat = AstroCatalog(str(tmp_path / "wh"))
        for i in range(n_ops):
            for _attempt in range(200):
                meta = cat.get_table("t")
                try:
                    # read-modify-write: claim a unique op slot.  A lost
                    # update would silently drop another thread's slot.
                    meta.generation_ops[f"{tid}:{i}"] = "OP"
                    cat.persist(meta)
                    break
                except ConcurrentWriteError:
                    cat.reload_into(meta)
            else:  # pragma: no cover - would mean livelock
                errors.append(f"thread {tid} op {i} starved")
                return

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    final = AstroCatalog(str(tmp_path / "wh")).get_table("t")
    want = {f"{t}:{i}" for t in range(n_threads) for i in range(n_ops)}
    got = set(final.generation_ops)
    missing = want - got
    assert not missing, f"LOST UPDATES: {sorted(missing)[:10]} (+{len(missing) - 10 if len(missing) > 10 else 0})"
    # version advanced exactly once per successful commit
    assert final.meta_version == n_threads * n_ops


def _proc_worker(args):
    """Module-level for pickling: one PROCESS doing CAS read-modify-write
    loops from its own catalog instance."""
    wh, pid, n_ops = args
    from spark_sql_on_hbase_spark.catalog import AstroCatalog, ConcurrentWriteError

    cat = AstroCatalog(wh)
    for i in range(n_ops):
        for _attempt in range(400):
            meta = cat.get_table("t")
            try:
                meta.generation_ops[f"p{pid}:{i}"] = "OP"
                cat.persist(meta)
                break
            except ConcurrentWriteError:
                cat.reload_into(meta)
        else:
            return f"proc {pid} op {i} starved"
    return None


def test_cas_no_lost_updates_across_processes(tmp_path):
    """The commit lock is O_CREAT|O_EXCL — true inter-PROCESS mutual
    exclusion, not just thread safety: separate interpreters hammering
    one table's metadata must not lose a single update."""
    from multiprocessing import get_context

    wh = str(tmp_path / "whp")
    _mk_table(wh)
    n_procs, n_ops = 4, 10
    with get_context("spawn").Pool(n_procs) as pool:
        errs = pool.map(_proc_worker, [(wh, p, n_ops) for p in range(n_procs)])
    assert all(e is None for e in errs), errs
    final = AstroCatalog(wh).get_table("t")
    want = {f"p{p}:{i}" for p in range(n_procs) for i in range(n_ops)}
    missing = want - set(final.generation_ops)
    assert not missing, f"LOST UPDATES across processes: {sorted(missing)[:10]}"
    assert final.meta_version == n_procs * n_ops


def test_lock_contention_times_out_then_recovers(tmp_path):
    cat = _mk_table(tmp_path / "whl")
    path = cat._meta_path("default", "t")
    lock = fsops.acquire_lock(path)
    meta = cat.get_table("t")
    meta.generation_ops["x"] = "OP"
    # a held lock blocks the commit (bounded wait, clear error) …
    import spark_sql_on_hbase_spark.fsops as fs

    orig = fs.acquire_lock
    try:
        fs.acquire_lock = lambda p, timeout=10.0, stale=60.0: orig(
            p, timeout=0.15, stale=60.0
        )
        with pytest.raises(TimeoutError, match="commit lock"):
            cat.persist(meta)
    finally:
        fs.acquire_lock = orig
    # … and the failed commit left the version honest: retry succeeds
    fsops.release_lock(lock)
    cat.persist(meta)
    assert AstroCatalog(str(tmp_path / "whl")).get_table("t").generation_ops["x"] == "OP"
