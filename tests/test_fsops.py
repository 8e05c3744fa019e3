"""r11 (VERDICT r10 #7): the fs-ops shim — the single place the engine
touches the physical filesystem for links/swaps/deletes, with a POSIX
fast path and a copy-based fallback for mounts without hard links or
atomic directory renames.  The write-lifecycle fuzz runs end-to-end in
copy mode (test_rewrite_lifecycle_fuzz); this file pins the shim's own
semantics.
"""

import os

import pytest

from spark_sql_on_hbase_spark import fsops


@pytest.fixture(autouse=True)
def _restore_mode():
    prev = fsops.get_mode()
    yield
    fsops.set_mode(prev)


def test_mode_validation():
    with pytest.raises(ValueError, match="fsops mode"):
        fsops.set_mode("s3-magic")
    fsops.set_mode("copy")
    assert fsops.get_mode() == "copy"
    fsops.set_mode("posix")
    assert fsops.get_mode() == "posix"


def test_link_posix_is_hard_link(tmp_path):
    src = tmp_path / "a.bin"
    src.write_bytes(b"x" * 100)
    dst = tmp_path / "b.bin"
    fsops.set_mode("posix")
    fsops.link(str(src), str(dst))
    assert os.stat(src).st_ino == os.stat(dst).st_ino  # same inode
    assert dst.read_bytes() == b"x" * 100


def test_link_copy_mode_materializes(tmp_path):
    src = tmp_path / "a.bin"
    src.write_bytes(b"y" * 100)
    dst = tmp_path / "b.bin"
    fsops.set_mode("copy")
    fsops.link(str(src), str(dst))
    assert os.stat(src).st_ino != os.stat(dst).st_ino  # independent copy
    assert dst.read_bytes() == b"y" * 100
    src.write_bytes(b"z")  # mutating the source must not leak through
    assert dst.read_bytes() == b"y" * 100


def test_swap_dirs_removed():
    """r12 manifest-pointer: no code path moves directories anymore —
    the shim must not regrow one silently."""
    assert not hasattr(fsops, "swap_dirs")


def test_lock_mutual_exclusion_and_release(tmp_path):
    target = str(tmp_path / "t.meta.json")
    lock = fsops.acquire_lock(target)
    assert os.path.exists(lock)
    # a second acquirer times out while held
    with pytest.raises(TimeoutError, match="commit lock"):
        fsops.acquire_lock(target, timeout=0.1)
    fsops.release_lock(lock)
    assert not os.path.exists(lock)
    # and succeeds after release
    lock2 = fsops.acquire_lock(target, timeout=0.5)
    fsops.release_lock(lock2)


def test_lock_breaks_stale_holder(tmp_path):
    target = str(tmp_path / "t.meta.json")
    lock = fsops.acquire_lock(target)
    # age the lock past the stale threshold (a crashed holder)
    os.utime(lock, (0, 0))
    lock2 = fsops.acquire_lock(target, timeout=0.5, stale=1.0)
    assert os.path.exists(lock2)
    fsops.release_lock(lock2)


def test_unlink_and_replace(tmp_path):
    f = tmp_path / "x"
    f.write_text("1")
    fsops.unlink(str(f))
    assert not f.exists()
    a, b = tmp_path / "a", tmp_path / "b"
    a.write_text("new")
    b.write_text("old")
    fsops.replace(str(a), str(b))
    assert b.read_text() == "new" and not a.exists()
