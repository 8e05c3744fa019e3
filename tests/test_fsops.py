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


@pytest.mark.parametrize("mode", ["posix", "copy"])
def test_swap_dirs_both_modes(tmp_path, mode):
    real = tmp_path / "data"
    tmp = tmp_path / "data.compact.tmp"
    old = tmp_path / "data.compact.old"
    real.mkdir()
    (real / "live.parquet").write_bytes(b"old-contents")
    tmp.mkdir()
    (tmp / "new.parquet").write_bytes(b"new-contents")
    fsops.set_mode(mode)
    fsops.swap_dirs(str(real), str(tmp), str(old))
    # promoted: the new tree is live, the old one moved aside, tmp gone
    assert sorted(os.listdir(real)) == ["new.parquet"]
    assert (real / "new.parquet").read_bytes() == b"new-contents"
    assert sorted(os.listdir(old)) == ["live.parquet"]
    assert (old / "live.parquet").read_bytes() == b"old-contents"
    assert not tmp.exists()


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
