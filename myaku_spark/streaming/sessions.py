"""Custom stateful streaming operator: user sessionization via
``applyInPandasWithState``.

The batch twin is the ``event_sessions`` driver query (30-minute
inactivity gap, sessions ordered by (ts, event_id)); this operator keeps
the OPEN session per user in group state so sessions continue correctly
across micro-batches — the part a stateless windowed aggregation cannot
express. Each batch emits a snapshot row per touched (user, session):
``n_events`` is cumulative and monotone, so the latest emission per key
is the session's current state (update-mode semantics).

At scale the state store is partitioned by user_id (the groupBy key), so
state size is O(open sessions) and each micro-batch shuffles only its
own events — the standard Structured Streaming stateful layout.
"""

from __future__ import annotations

import pandas as pd

SESSION_GAP_SEC = 1800  # 30-min inactivity gap (matches event_sessions)

OUTPUT_SCHEMA = (
    "user_id long, session_no long, n_events long, session_start timestamp"
)
STATE_SCHEMA = "last_ts double, session_no long, n_events long, session_start double"


def _sessionize_group(key, pdf_iter, state, gap_sec: int = SESSION_GAP_SEC):
    """Per-user handler: fold this batch's events (sorted by ts,
    event_id) into the open-session state; emit a snapshot per session
    touched in this batch."""
    (user_id,) = key
    if state.exists:
        last_ts, session_no, n_events, session_start = state.get
    else:
        last_ts, session_no, n_events, session_start = None, 0, 0, None

    batches = list(pdf_iter)
    if not batches:
        return
    pdf = pd.concat(batches, ignore_index=True)
    pdf["_epoch"] = pdf["ts"].astype("int64") / 1e9
    pdf = pdf.sort_values(["_epoch", "event_id"])

    emitted: dict[int, tuple] = {}
    for ts in pdf["_epoch"]:
        ts = float(ts)
        if last_ts is None or ts - last_ts > gap_sec:
            session_no += 1
            n_events = 0
            session_start = ts
        n_events += 1
        last_ts = ts
        emitted[session_no] = (n_events, session_start)

    state.update((last_ts, session_no, n_events, session_start))
    yield pd.DataFrame(
        {
            "user_id": [int(user_id)] * len(emitted),
            "session_no": list(emitted.keys()),
            "n_events": [v[0] for v in emitted.values()],
            "session_start": pd.to_datetime(
                [v[1] for v in emitted.values()], unit="s"
            ),
        }
    )


def sessionize_stream(events_stream, gap_sec: int = SESSION_GAP_SEC):
    """events (user_id, event_id, ts) stream → stateful session snapshots.

    Use output mode 'update'; the latest row per (user_id, session_no)
    is the session's cumulative state."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdf_iter, state):
        return _sessionize_group(key, pdf_iter, state, gap_sec)

    return events_stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
