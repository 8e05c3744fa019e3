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
  file for one TTL, never a wedged reclaim;
- r14 (VERDICT r13 #4): a driver-side refresher extends a lease while
  its query is still running — see the refresh section below — so the
  TTL bounds the post-query grace, not the query duration.

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


# ---- r14: mid-query refresh (VERDICT r13 #4) --------------------------------
# r13 registered a lease ONCE at plan time, so a query running longer
# than the TTL re-entered the pre-r13 hazard window.  One driver-side
# daemon thread now refreshes the lease of every tracked relation while
# its query can still be executing: within one TTL of the last plan
# (covers the plan→first-action gap), or while the SparkContext reports
# active jobs (covers long executions; an idle context lets leases lapse
# on schedule).  A refresh horizon bounds the worst case — unrelated
# cluster activity can defer a reclaim for at most
# LEASE_REFRESH_HORIZON_SEC after the lease's last plan, never forever.
# Relations are held by WEAKREF: an unreachable relation stops
# refreshing immediately and its lease ages out within one TTL.

import threading
import weakref

_reg_lock = threading.Lock()
_registry: dict[int, object] = {}  # id(rel) -> weakref.ref(rel)
_thread: threading.Thread | None = None
# track() sets this so a sleeping loop re-paces IMMEDIATELY: a newly
# tracked short-TTL relation must not wait out a long tick computed for
# earlier default-TTL entries
_wake = threading.Event()


def track(rel) -> None:
    """Start refreshing ``rel``'s lease (no-op for TTL <= 0)."""
    global _thread
    if getattr(rel, "LEASE_TTL_SEC", 0) <= 0:
        return
    with _reg_lock:
        _registry[id(rel)] = weakref.ref(rel)
        if _thread is None or not _thread.is_alive():
            _thread = threading.Thread(
                target=_refresh_loop, name="astro-lease-refresh", daemon=True
            )
            _thread.start()
    _wake.set()


def untrack(rel) -> None:
    """Stop refreshing (rewrite commits release their own lease and must
    not have the refresher resurrect it)."""
    with _reg_lock:
        _registry.pop(id(rel), None)


def _refresh_one(rel, now: float) -> bool:
    """Refresh ``rel``'s lease if its query may still be running.
    Returns False when the entry should stop being tracked."""
    ttl = getattr(rel, "LEASE_TTL_SEC", 0)
    paths = getattr(rel, "_lease_paths", None)
    if ttl <= 0 or not paths:
        return False
    last = getattr(rel, "_lease_last_plan", 0.0)
    if now - last > getattr(rel, "LEASE_REFRESH_HORIZON_SEC", 6 * 3600.0):
        return False  # horizon: never refresh forever
    alive = now - last <= ttl  # plan→first-action window
    if not alive:
        try:
            alive = bool(
                rel.spark.sparkContext.statusTracker().getActiveJobsIds()
            )
        except Exception:
            alive = False
    # r15: tolerate ONE idle observation before letting the lease lapse.
    # AQE executes a single query as SEVERAL consecutive driver-paced
    # jobs; a tick landing in the gap between two of them used to drop
    # the entry permanently (nothing re-tracks until the next plan), so
    # the lease could expire with the query still running — the exact
    # hazard the refresher exists to close.  One grace tick keeps the
    # lease unexpired across such a gap (ticks are 0.35×TTL apart, so a
    # skipped refresh alone cannot lapse it); two CONSECUTIVE idle
    # observations (≥0.35×TTL apart) mean the context is genuinely idle
    # and the lease lapses on schedule, one tick later than before.
    if not alive:
        idle = getattr(rel, "_lease_idle_ticks", 0) + 1
        rel._lease_idle_ticks = idle
        if idle >= 2:
            return False  # idle past one TTL — let the lease lapse
    else:
        rel._lease_idle_ticks = 0
    try:
        register(rel.catalog.data_dir(rel.meta), rel._lease_id, paths, ttl)
    except Exception:
        pass  # best-effort, like the plan-time registration
    return True


def _refresh_loop() -> None:
    global _thread
    while True:
        # clear BEFORE snapshotting: a track() landing mid-pass re-sets
        # it and the wait below returns immediately — never lost
        _wake.clear()
        with _reg_lock:
            items = list(_registry.items())
        min_ttl = None
        now = time.monotonic()
        for key, ref in items:
            rel = ref()
            keep = rel is not None and _refresh_one(rel, now)
            if keep:
                ttl = rel.LEASE_TTL_SEC
                min_ttl = ttl if min_ttl is None else min(min_ttl, ttl)
            else:
                with _reg_lock:
                    _registry.pop(key, None)
        with _reg_lock:
            if not _registry:
                _thread = None
                return
        # tick well inside the smallest TTL so a refresh always lands
        # before the previous expiry; a track() wake re-paces instantly
        _wake.wait(timeout=max(0.2, 0.35 * (min_ttl or DEFAULT_TTL_SEC)))


def live_summary(data_dir: str, now: float | None = None) -> tuple[int, float]:
    """(leased-fragment count, max remaining TTL seconds) across the
    unexpired leases — the DESCRIBE EXTENDED surface (r14)."""
    d = lease_dir(data_dir)
    now = time.time() if now is None else now
    files: set = set()
    max_rem = 0.0
    try:
        names = [n for n in os.listdir(d) if n.endswith(".json")]
    except OSError:
        return 0, 0.0
    for n in names:
        try:
            with open(os.path.join(d, n)) as f:
                blob = json.load(f)
            rem = float(blob.get("expires_at", 0)) - now
            if rem > 0:
                files.update(blob.get("files", []))
                max_rem = max(max_rem, rem)
        except (OSError, ValueError, TypeError):
            continue
    return len(files), max_rem


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
