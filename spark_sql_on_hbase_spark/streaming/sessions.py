"""Timeout-driven sessionization via ``applyInPandasWithState`` — the
arbitrary-stateful streaming shape the built-in ``session_window``
aggregation cannot express: emit-on-close with a custom payload, state
evicted by an EVENT-TIME TIMEOUT the moment the watermark passes a
session's gap horizon.  (Beyond-reference surface; the reference engine
has no streaming at all — SURVEY §2.2 modern additions.)

``session_window_agg`` (streaming/events.py) remains the declarative
path; this operator is the escape hatch for custom session logic (here:
one summary row per CLOSED session, exactly once).  Spark 4 also ships
``transformWithStateInPandas`` with explicit timers; its state-server
protocol needs google.protobuf, absent from this container, so the
GroupState timeout API — same state-store mechanics, same watermark
closure rule — is the implementation.

Scale notes: state per key is the list of OPEN session fragments (almost
always one; >1 only while a gap inside the watermark horizon could still
be bridged by a late event — exactly the windows session_window keeps
un-merged in its state store too).  Closed sessions leave state
immediately, so state is bounded by keys active inside the
gap + watermark horizon.  A micro-batch touches only keys with input
rows plus keys whose timeout fired — no full-state sweep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, sum_v double"
)
# open-fragment lists, parallel arrays (start/last ms, count, value sum)
_STATE_SCHEMA = (
    "starts array<bigint>, lasts array<bigint>, ns array<bigint>, svs array<double>"
)

_UNIT_MS = {
    "minute": 60_000,
    "minutes": 60_000,
    "hour": 3_600_000,
    "hours": 3_600_000,
    "second": 1_000,
    "seconds": 1_000,
}


def sessionize_stateful(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Completed-session stream over the events shape (ts, user_id,
    value): one row per closed session — events within ``gap`` of each
    other merge, a session closes once the watermark passes
    ``last_event + gap`` (event-time timeout = the close timer).

    Contract (pinned by tests): an open session emits nothing; a session
    closes exactly once, only when the watermark proves no extension can
    still arrive; closed sessions agree with the built-in
    ``session_window`` groups row for row.  Timeouts fire against the
    watermark as of the start of each micro-batch, so a closure becomes
    visible in the batch AFTER the watermark advances (availableNow runs
    surface it across checkpointed restarts — the rule every watermark
    op follows).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    num, unit = gap.split()
    gap_ms = int(num) * _UNIT_MS[unit]

    def fn(key, pdfs, state: GroupState):
        # pyspark's applyInPandasWithState serializer pads every output
        # batch with an all-NA frame before pd.concat (serializers.py,
        # count-alignment) — ITS concat raises the pandas FutureWarning,
        # not ours; our emitted frames are never empty / all-NA.  Filter
        # in the worker so runs are warning-free.
        import warnings

        warnings.filterwarnings(
            "ignore",
            message="The behavior of DataFrame concatenation with empty or all-NA",
            category=FutureWarning,
        )
        wm = state.getCurrentWatermarkMs()
        frags: list[list] = []
        if state.exists:
            starts, lasts, ns, svs = state.get
            frags = [[s, l, n, v] for s, l, n, v in zip(starts, lasts, ns, svs)]
        for pdf in pdfs:
            if not len(pdf):
                continue
            # normalize to ns BEFORE the int64 view: pandas 2 can surface
            # Arrow timestamps as datetime64[us], and a raw astype("int64")
            # would then be microseconds — ÷1e6 compresses event time
            # 1000× and silently merges all sessions (the read-side twin
            # of the encoding sniff in streaming/events.py)
            ts_ms = (
                pdf["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000
            ).to_numpy()
            for t, v in zip(ts_ms, pdf["value"].to_numpy()):
                frags.append([int(t), int(t), 1, float(v)])
        # merge fragments whose gaps close (sort by start; single pass)
        frags.sort(key=lambda f: f[0])
        merged: list[list] = []
        for f in frags:
            if merged and f[0] <= merged[-1][1] + gap_ms:
                m = merged[-1]
                m[1] = max(m[1], f[1])
                m[2] += f[2]
                m[3] += f[3]
            else:
                merged.append(f)
        # a fragment is CLOSED iff no admissible event can extend it.
        # One convention end-to-end (ADVICE r4): merge at <= gap (events
        # exactly gap apart MERGE — session_window parity, verified
        # empirically), so an on-time event at ts == last + gap can still
        # extend; with ts >= wm admissible, extension is possible iff
        # wm <= last + gap, hence close STRICTLY when wm > last + gap —
        # matching the oracle's `t1 + gap < w`.
        closed = [f for f in merged if f[1] + gap_ms < wm]
        still_open = [f for f in merged if f[1] + gap_ms >= wm]
        if still_open:
            state.update(
                (
                    [f[0] for f in still_open],
                    [f[1] for f in still_open],
                    [f[2] for f in still_open],
                    [f[3] for f in still_open],
                )
            )
            # earliest horizon still pending; clamp to wm + 1 — a
            # fragment at exactly wm == last + gap is still open (close
            # is strict) but Spark rejects timeout timestamps at/behind
            # the watermark, and any future watermark advance re-fires
            # the closure check anyway
            state.setTimeoutTimestamp(
                max(min(f[1] for f in still_open) + gap_ms, wm + 1)
            )
        elif state.exists:
            state.remove()
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "session_start": [pd.Timestamp(f[0], unit="ms") for f in closed],
                    "session_end": [pd.Timestamp(f[1], unit="ms") for f in closed],
                    "n_events": [f[2] for f in closed],
                    "sum_v": [round(f[3], 2) for f in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_OUTPUT_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
