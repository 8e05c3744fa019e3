"""Reader leases (r13, VERDICT r12 #5) — enforcement for the in-flight
reader vs reclaim hazard on NON-retained tables.

The manifest-pointer design (r12) means a fold's metadata replace is the
only commit and the replaced files are deleted right after
(``gc_pending``).  A query PLANNED before the fold holds the old file
list; on a plain-tier table the reclaim could previously delete those
files mid-flight — the hazard was documented ("use retain_history /
RETAIN windows", relation.py) but not enforced.

r13 enforces it with the same small-object primitive as the CAS lock:

- every driver-side fragment read registers/refreshes ONE lease file
  per relation instance under ``<data_dir>/_leases/<uuid>.json`` —
  a JSON blob of the fragment basenames it resolved plus an expiry
  (atomic tmp+replace in both fsops modes);
- ``gc_pending`` reclaim and ``VACUUM`` skip files under an unexpired
  lease: the entries STAY in gc_pending / retired_regions, so the very
  next touch after lease expiry completes the reclaim — the same
  crash-safe retry the manifest pointer already guarantees;
- leases expire by TTL (no reader-exit hook exists for a lazy
  DataFrame); expired lease files are reaped opportunistically by the
  next ``live_basenames`` pass, so a crashed reader costs one small
  file for one TTL, never a wedged reclaim.

At 100 TB the cost is one ~KB put per planned scan and one list of a
small directory per reclaim — both O(readers), never O(data).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from spark_sql_on_hbase_spark import fsops

LEASE_DIR = "_leases"
DEFAULT_TTL_SEC = 900.0


def lease_dir(data_dir: str) -> str:
    return os.path.join(data_dir, LEASE_DIR)


def register(data_dir: str, lease_id: str, paths, ttl: float) -> None:
    """Write/refresh the lease file for this reader (atomic replace;
    best-effort — a failed lease write must never fail the scan: the
    reader simply runs unprotected, which is the pre-r13 behavior)."""
    d = lease_dir(data_dir)
    tmp = None
    try:
        os.makedirs(d, exist_ok=True)
        dest = os.path.join(d, f"{lease_id}.json")
        tmp = f"{dest}.tmp.{os.getpid()}.{uuid.uuid4().hex[:6]}"
        blob = {
            "expires_at": time.time() + ttl,
            "files": sorted({os.path.basename(p) for p in paths}),
        }
        with open(tmp, "w") as f:
            json.dump(blob, f)
        fsops.replace(tmp, dest)
    except OSError:
        if tmp is not None:
            try:
                os.unlink(tmp)
            except OSError:
                pass


def release(data_dir: str, lease_id: str) -> None:
    """Drop this reader's lease early (explicit release — optional)."""
    try:
        os.unlink(os.path.join(lease_dir(data_dir), f"{lease_id}.json"))
    except OSError:
        pass


def expire_all(root: str) -> int:
    """Force-expire every lease under ``root`` (recursive) — the
    operator escape hatch for a wedged reclaim (and the test harness's
    fast-forward).  Returns the number of leases expired."""
    import glob

    n = 0
    for p in glob.glob(os.path.join(root, "**", LEASE_DIR, "*.json"), recursive=True):
        try:
            with open(p) as f:
                blob = json.load(f)
            blob["expires_at"] = 0.0
            tmp = f"{p}.tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(blob, f)
            fsops.replace(tmp, p)
            n += 1
        except (OSError, ValueError):
            continue
    return n


def live_basenames(data_dir: str, now: float | None = None) -> set:
    """Fragment basenames under some UNEXPIRED lease.  Expired or
    unreadable lease files are reaped in the same pass (crash-safe:
    a reader that died simply stops refreshing and ages out)."""
    d = lease_dir(data_dir)
    now = time.time() if now is None else now
    out: set = set()
    try:
        names = [n for n in os.listdir(d) if n.endswith(".json")]
    except OSError:
        return out
    for n in names:
        p = os.path.join(d, n)
        try:
            with open(p) as f:
                blob = json.load(f)
            if float(blob.get("expires_at", 0)) <= now:
                raise ValueError("expired")
            out.update(blob.get("files", []))
        except (OSError, ValueError, TypeError):
            try:
                os.unlink(p)
            except OSError:
                pass
    return out
