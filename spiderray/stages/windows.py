"""Windowed aggregates over the events stream (SURVEY.md §2.9 engine
additions; Ray Data has no event-time windows, so windows are expressed as
groupby(key).map_groups over ts-sorted groups — the ordering assumption is
per-key, stated here: events of one key must be groupable in memory).

Tumbling windows live in queries.q_events_hourly (hour bucketing is a plain
column).  This module adds session windows (gap-based) — the shape a crawler
event stream would need."""

from __future__ import annotations

import pandas as pd


def sessionize(ds, key_col: str = "user_id", ts_col: str = "ts", gap_minutes: int = 30):
    """Per-key session windows: a new session starts when the gap to the
    previous event exceeds ``gap_minutes``.  Emits one row per session:
    (key, session_id, n_events, start, end).  Deterministic: ties in ts keep
    input order after a stable sort."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        new_session = g[ts_col].diff() > gap
        session_id = new_session.cumsum()
        out = (
            g.assign(session_id=session_id)
            .groupby("session_id")
            .agg(
                n_events=(ts_col, "size"),
                start=(ts_col, "min"),
                end=(ts_col, "max"),
            )
            .reset_index()
        )
        out[key_col] = g[key_col].iloc[0]
        return out[[key_col, "session_id", "n_events", "start", "end"]]

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")
