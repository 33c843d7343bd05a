"""Event-time window operators: gap-based sessionization, trailing RANGE
windows, and as-of joins.

The reference has no windowing (it is a record-at-a-time connector), but a
streaming-ingest engine needs them; all three are expressed as
``groupby(key).map_groups`` with an in-group event-time sort. The
PARTITIONING ASSUMPTION is that one key's events fit one group (keys are
users/entities, so group size is bounded by per-entity activity). Two
enforcement mechanisms:

- the unsalted path ASSERTS a loud per-group row bound
  (``max_group_rows``) naming the fix, instead of silently OOMing a worker;
- every operator takes ``salt_seconds`` to sub-partition a hot key by
  TIME-CONTIGUOUS buckets (salt = ts // salt_seconds) with an EXACT
  reconstruction pass, so a single entity holding most of the stream still
  spreads across workers:

  * sessionize: per-(key, salt) sub-sessions, then a per-key stitch over
    the (tiny) sub-session summaries — adjacent sub-sessions merge when
    the boundary gap <= gap_seconds. Exact for any salt width.
  * trailing windows: events within ``window_seconds`` of the next
    bucket's start are replicated into it as context-only rows
    (salt_seconds >= window_seconds, asserted), so every event sees its
    full trailing window. Exact.
  * as-of join: per-(key, salt) local pass + per-bucket last-right-value
    summaries; a per-key carry chain over the summaries fills the rows
    with no in-bucket predecessor. Exact (ties share a timestamp, hence a
    bucket, so the (ts, tiebreak) order is preserved).

All three have exact SQL oracles (window functions), so they are
value-hash verified — salted and unsalted paths against the same oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from kafka_connect_jdbc_flatten_ray.util import arrowize

#: loud upper bound for one key's events in the unsalted per-key paths
MAX_GROUP_ROWS = 10_000_000


def _guard_group(g: pd.DataFrame, op: str, limit: int) -> None:
    if len(g) > limit:
        raise ValueError(
            f"{op}: one key's history has {len(g)} rows (> {limit}); "
            "pass salt_seconds=... to sub-partition hot keys by time range"
        )


def _ts_us(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pc.cast(col, pa.timestamp("us")).to_numpy(
        zero_copy_only=False
    ).astype("datetime64[us]").astype(np.int64)


# ---------------------------------------------------------------------------
# sessionize
# ---------------------------------------------------------------------------


def sessionize(
    events: ray.data.Dataset,
    key: str = "user_id",
    ts: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: int = 1800,
    salt_seconds: int | None = None,
    max_group_rows: int = MAX_GROUP_ROWS,
) -> ray.data.Dataset:
    """Gap-based session windows per key: a new session starts when the
    time since the previous event exceeds ``gap_seconds``. Returns one row
    per (key, session_id) with n_events and the session time bounds."""

    def _sessions(g: pd.DataFrame) -> pd.DataFrame:
        _guard_group(g, "sessionize", max_group_rows)
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
        return out[[key, "session_id", "n_events", "session_start", "session_end"]]

    _sessions.__name__ = "sessionize"
    if salt_seconds is None:
        return events.groupby(key).map_groups(arrowize(_sessions), batch_format="pandas")

    s_us = salt_seconds * 1_000_000

    def _salt(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__salt", pa.array(_ts_us(t.column(ts)) // s_us)
        )

    def _sub_sessions(g: pd.DataFrame) -> pd.DataFrame:
        out = _sessions(g.drop(columns="__salt"))
        return out.rename(columns={"session_id": "__sub"})

    def _stitch(g: pd.DataFrame) -> pd.DataFrame:
        # sub-sessions live in disjoint time buckets, so sorting by start
        # also sorts ends; merge adjacent ones whose boundary gap <= gap
        g = g.sort_values(["session_start", "session_end"])
        starts = g["session_start"].to_numpy()
        ends = g["session_end"].to_numpy()
        bgap = (starts[1:] - ends[:-1]).astype("timedelta64[us]").astype(np.int64)
        new_sess = np.concatenate(
            ([0], (bgap > gap_seconds * 1_000_000).astype(np.int64))
        )
        sess = np.cumsum(new_sess)
        g = g.assign(session_id=sess)
        out = g.groupby("session_id").agg(
            n_events=("n_events", "sum"),
            session_start=("session_start", "min"),
            session_end=("session_end", "max"),
        ).reset_index()
        out.insert(0, key, g[key].iloc[0])
        out["session_id"] = out["session_id"].astype(np.int64)
        out["n_events"] = out["n_events"].astype(np.int64)
        return out[[key, "session_id", "n_events", "session_start", "session_end"]]

    _stitch.__name__ = "sessionize_stitch"
    subs = events.map_batches(_salt, batch_format="pyarrow").groupby(
        [key, "__salt"]
    ).map_groups(arrowize(_sub_sessions), batch_format="pandas")
    return subs.groupby(key).map_groups(arrowize(_stitch), batch_format="pandas")


# ---------------------------------------------------------------------------
# trailing RANGE window
# ---------------------------------------------------------------------------


def trailing_window_counts(
    events: ray.data.Dataset,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    window_seconds: int = 3600,
    salt_seconds: int | None = None,
    max_group_rows: int = MAX_GROUP_ROWS,
) -> ray.data.Dataset:
    """Sliding event-time window: for every event, the number of same-key
    events in the trailing ``window_seconds`` (inclusive of the current
    event) — the RANGE-window aggregate, computed per key with a sorted
    two-pointer (searchsorted) instead of an all-pairs range join."""

    def _count(t_us: np.ndarray) -> np.ndarray:
        lo = np.searchsorted(t_us, t_us - window_seconds * 1_000_000, side="left")
        # SQL RANGE windows include ALL ts-peers of the current row, not
        # just preceding ones — count up to the right edge of the tie group
        hi = np.searchsorted(t_us, t_us, side="right")
        return (hi - lo).astype(np.int64)

    def _win(g: pd.DataFrame) -> pd.DataFrame:
        _guard_group(g, "trailing_window_counts", max_group_rows)
        g = g.sort_values([ts, id_col])
        n = _count(g[ts].to_numpy().astype("datetime64[us]").astype(np.int64))
        return pd.DataFrame(
            {
                key: g[key].to_numpy(),
                id_col: g[id_col].to_numpy(),
                "n_trailing": n,
            }
        )

    _win.__name__ = "trailing_window_counts"
    if salt_seconds is None:
        return events.groupby(key).map_groups(arrowize(_win), batch_format="pandas")

    if salt_seconds < window_seconds:
        raise ValueError(
            "salt_seconds must be >= window_seconds so a window never spans "
            "more than one bucket boundary"
        )
    s_us = salt_seconds * 1_000_000
    w_us = window_seconds * 1_000_000

    def _salt(t: pa.Table) -> pa.Table:
        t_us = _ts_us(t.column(ts))
        salt = t_us // s_us
        n = t.num_rows
        own = t.append_column("__salt", pa.array(salt)).append_column(
            "__own", pa.array(np.ones(n, bool))
        )
        # events within `window` of the next bucket's start replicate into
        # it as context-only rows (they contribute counts, emit nothing)
        ctx_mask = t_us >= (salt + 1) * s_us - w_us
        ctx = t.filter(pa.array(ctx_mask)).append_column(
            "__salt", pa.array(salt[ctx_mask] + 1)
        ).append_column(
            "__own", pa.array(np.zeros(int(ctx_mask.sum()), bool))
        )
        return pa.concat_tables([own, ctx])

    def _win_salted(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts, id_col])
        n = _count(g[ts].to_numpy().astype("datetime64[us]").astype(np.int64))
        own = g["__own"].to_numpy()
        return pd.DataFrame(
            {
                key: g[key].to_numpy()[own],
                id_col: g[id_col].to_numpy()[own],
                "n_trailing": n[own],
            }
        )

    _win_salted.__name__ = "trailing_window_counts_salted"
    return events.map_batches(_salt, batch_format="pyarrow").groupby(
        [key, "__salt"]
    ).map_groups(arrowize(_win_salted), batch_format="pandas")


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------


def asof_join_last_value(
    events: ray.data.Dataset,
    key: str = "user_id",
    ts: str = "ts",
    order_tiebreak: str = "event_id",
    type_col: str = "event_type",
    left_type: str = "click",
    right_type: str = "purchase",
    value_col: str = "value",
    salt_seconds: int | None = None,
    max_group_rows: int = MAX_GROUP_ROWS,
) -> ray.data.Dataset:
    """Per-key AS-OF join within one stream: each ``left_type`` event is
    joined to the most recent earlier (in (ts, tiebreak) order)
    ``right_type`` event's value (NULL when none precedes it) — the classic
    trades/quotes as-of pattern, done with one in-group sort + backward
    fill instead of a range join."""

    def _local(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts, order_tiebreak])
        is_right = (g[type_col] == right_type).to_numpy()
        vals = g[value_col].to_numpy(dtype=np.float64)
        # value of the latest right event earlier in order than each row:
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

    def _asof(g: pd.DataFrame) -> pd.DataFrame:
        _guard_group(g, "asof_join_last_value", max_group_rows)
        return _local(g)

    _asof.__name__ = "asof_join_last_value"
    if salt_seconds is None:
        return events.groupby(key).map_groups(arrowize(_asof), batch_format="pandas")

    s_us = salt_seconds * 1_000_000

    def _salt(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__salt", pa.array(_ts_us(t.column(ts)) // s_us)
        )

    def _local_salted(g: pd.DataFrame) -> pd.DataFrame:
        """Local as-of rows (asof_value NaN = needs the carry-in) plus ONE
        summary row per bucket (__kind=1) with the bucket's last right
        value (NaN when the bucket has no right event)."""
        g = g.sort_values([ts, order_tiebreak])
        out = _local(g)
        out["__salt"] = np.int64(g["__salt"].iloc[0])
        out["__kind"] = np.int8(0)
        is_right = (g[type_col] == right_type).to_numpy()
        last_right = (
            float(g[value_col].to_numpy(dtype=np.float64)[is_right][-1])
            if is_right.any() else np.nan
        )
        summary = pd.DataFrame(
            {
                key: [g[key].iloc[0]],
                order_tiebreak: [np.int64(-1)],
                ts: [g[ts].iloc[0]],
                "asof_value": [last_right],
                "__salt": [np.int64(g["__salt"].iloc[0])],
                "__kind": [np.int8(1)],
            }
        )
        return pd.concat([out, summary], ignore_index=True)

    def _carry_chain(g: pd.DataFrame) -> pd.DataFrame:
        """Per key over the (tiny) bucket summaries: carry_in[bucket] =
        last right value of any EARLIER bucket (ffill, shifted)."""
        g = g.sort_values("__salt")
        carried = g["asof_value"].ffill().shift(1).to_numpy()
        return pd.DataFrame(
            {
                key: g[key].to_numpy(),
                "__salt": g["__salt"].to_numpy(),
                "asof_value": carried,
                "__kind": np.full(len(g), np.int8(2)),
                order_tiebreak: np.full(len(g), np.int64(-1)),
                ts: g[ts].to_numpy(),
            }
        )

    def _apply_carry(g: pd.DataFrame) -> pd.DataFrame:
        rows = g[g["__kind"] == 0]
        carry_rows = g[g["__kind"] == 2]
        carry = (
            float(carry_rows["asof_value"].iloc[0])
            if len(carry_rows) and pd.notna(carry_rows["asof_value"].iloc[0])
            else np.nan
        )
        vals = rows["asof_value"].to_numpy(dtype=np.float64)
        vals = np.where(np.isnan(vals), carry, vals)
        return pd.DataFrame(
            {
                key: rows[key].to_numpy(),
                order_tiebreak: rows[order_tiebreak].to_numpy(),
                ts: rows[ts].to_numpy().astype("datetime64[us]"),
                "asof_value": vals,
            }
        )

    _local_salted.__name__ = "asof_local_salted"
    _carry_chain.__name__ = "asof_carry_chain"
    _apply_carry.__name__ = "asof_apply_carry"
    def _only_kind(kind: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t.column("__kind"), kind))

        fn.__name__ = f"only_kind_{kind}"
        return fn

    def _to_arrow(t: pa.Table) -> pa.Table:
        return t  # normalizes block type so the union sides agree

    staged = events.map_batches(_salt, batch_format="pyarrow").groupby(
        [key, "__salt"]
    ).map_groups(arrowize(_local_salted), batch_format="pandas").materialize()
    rows = staged.map_batches(_only_kind(0), batch_format="pyarrow")
    carries = (
        staged.map_batches(_only_kind(1), batch_format="pyarrow")
        .groupby(key)
        .map_groups(arrowize(_carry_chain), batch_format="pandas")
        .map_batches(_to_arrow, batch_format="pyarrow")
    )
    return rows.union(carries).groupby([key, "__salt"]).map_groups(
        arrowize(_apply_carry), batch_format="pandas"
    )
