"""Event-time window operators: gap-based sessionization and as-of joins.

The reference has no windowing (it is a record-at-a-time connector), but a
streaming-ingest engine needs them; both are expressed as
``groupby(key).map_groups`` with an in-group event-time sort — the
PARTITIONING ASSUMPTION is that one key's events fit one group (keys are
users/entities, so group size is bounded by per-entity activity; salt the
key by time range if an entity's history outgrows a worker).

Both have exact SQL oracles (window functions), so they are value-hash
verified, not just shape-tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def sessionize(
    events: ray.data.Dataset,
    key: str = "user_id",
    ts: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: int = 1800,
) -> ray.data.Dataset:
    """Gap-based session windows per key: a new session starts when the
    time since the previous event exceeds ``gap_seconds``. Returns one row
    per (key, session_id) with n_events and the session time bounds."""

    def _sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts, order_tiebreak])
        t = g[ts].to_numpy()
        # compare at full native resolution — truncating to whole seconds
        # would mis-classify a gap of e.g. 1800.4s as within-session
        gaps_us = np.diff(t).astype("timedelta64[us]").astype(np.int64)
        new_sess = np.concatenate(
            ([0], (gaps_us > gap_seconds * 1_000_000).astype(np.int64))
        )
        sess = np.cumsum(new_sess)
        g = g.assign(session_id=sess)
        out = g.groupby("session_id").agg(
            n_events=(order_tiebreak, "size"),
            session_start=(ts, "min"),
            session_end=(ts, "max"),
        ).reset_index()
        out.insert(0, key, g[key].iloc[0])
        out["session_id"] = out["session_id"].astype(np.int64)
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    _sessions.__name__ = "sessionize"
    return events.groupby(key).map_groups(_sessions, batch_format="pandas")


def trailing_window_counts(
    events: ray.data.Dataset,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    window_seconds: int = 3600,
) -> ray.data.Dataset:
    """Sliding event-time window: for every event, the number of same-key
    events in the trailing ``window_seconds`` (inclusive of the current
    event) — the RANGE-window aggregate, computed per key with a sorted
    two-pointer (searchsorted) instead of an all-pairs range join."""

    def _win(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts, id_col])
        t = g[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        lo = np.searchsorted(t, t - window_seconds * 1_000_000, side="left")
        # SQL RANGE windows include ALL ts-peers of the current row, not
        # just preceding ones — count up to the right edge of the tie group
        hi = np.searchsorted(t, t, side="right")
        n = hi - lo
        return pd.DataFrame(
            {
                key: g[key].to_numpy(),
                id_col: g[id_col].to_numpy(),
                "n_trailing": n.astype(np.int64),
            }
        )

    _win.__name__ = "trailing_window_counts"
    return events.groupby(key).map_groups(_win, batch_format="pandas")


def asof_join_last_value(
    events: ray.data.Dataset,
    key: str = "user_id",
    ts: str = "ts",
    order_tiebreak: str = "event_id",
    type_col: str = "event_type",
    left_type: str = "click",
    right_type: str = "purchase",
    value_col: str = "value",
) -> ray.data.Dataset:
    """Per-key AS-OF join within one stream: each ``left_type`` event is
    joined to the most recent STRICTLY EARLIER ``right_type`` event's value
    (NULL when none precedes it) — the classic trades/quotes as-of pattern,
    done with one in-group sort + backward fill instead of a range join."""

    def _asof(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts, order_tiebreak])
        is_right = (g[type_col] == right_type).to_numpy()
        vals = g[value_col].to_numpy(dtype=np.float64)
        # value of the latest right event STRICTLY BEFORE each row:
        # shift the carried value by one so a row never sees itself
        carried = np.where(is_right, vals, np.nan)
        carried = pd.Series(carried).ffill().shift(1).to_numpy()
        is_left = (g[type_col] == left_type).to_numpy()
        out = g[is_left]
        return pd.DataFrame(
            {
                key: out[key].to_numpy(),
                order_tiebreak: out[order_tiebreak].to_numpy(),
                ts: out[ts].to_numpy(),
                "asof_value": carried[is_left],
            }
        )

    _asof.__name__ = "asof_join_last_value"
    return events.groupby(key).map_groups(_asof, batch_format="pandas")
