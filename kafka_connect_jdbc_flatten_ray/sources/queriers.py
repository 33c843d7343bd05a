"""Source-side queriers (S1-S4) over the ``events`` table.

Ray Data analogues of the reference's table queriers:
- bulk scan                S1  BulkTableQuerier.java:82-116
- incrementing tail        S2  TimestampIncrementingTableQuerier.java:115-146
- timestamp window tail    S3  same file; delay :207-214
- timestamp+incrementing   S4  TimestampIncrementingCriteria.java:126-151

Bounds are derived from the data itself (min/max aggregates over the pruned
column read), mirroring how the reference derives its criteria from stored
offsets and ``db_now - delay``.
"""

from __future__ import annotations

import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from kafka_connect_jdbc_flatten_ray.util import read_parquet_clean


def _events_path(sf_dir: str) -> str:
    return f"{sf_dir}/events.parquet"


def _id_bounds(sf_dir: str) -> tuple[int, int]:
    """min/max event_id from Parquet row-group stats (no data read)."""
    md = pq.ParquetFile(_events_path(sf_dir)).metadata
    idx = md.schema.to_arrow_schema().get_field_index("event_id")
    mins, maxs = [], []
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        mins.append(st.min)
        maxs.append(st.max)
    return min(mins), max(maxs)


def _ts_bounds(sf_dir: str):
    md = pq.ParquetFile(_events_path(sf_dir)).metadata
    idx = md.schema.to_arrow_schema().get_field_index("ts")
    mins, maxs = [], []
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        mins.append(st.min)
        maxs.append(st.max)
    return min(mins), max(maxs)


BULK_COLUMNS = ["event_id", "ts", "user_id", "event_type", "value"]


def source_bulk(sf_dir: str) -> ray.data.Dataset:
    """S1: whole-table snapshot scan with column pruning."""
    return read_parquet_clean(_events_path(sf_dir), columns=BULK_COLUMNS)


def source_incrementing(sf_dir: str) -> ray.data.Dataset:
    """S2: strictly-increasing column criterion ``inc > offset`` where the
    stored offset is the midpoint id (row-group filter pushdown)."""
    lo, hi = _id_bounds(sf_dir)
    mid = (lo + hi) // 2
    return read_parquet_clean(
        _events_path(sf_dir),
        columns=BULK_COLUMNS,
        filter=pc.field("event_id") > mid,
    )


def source_timestamp(sf_dir: str) -> ray.data.Dataset:
    """S3: ``ts > begin AND ts <= end`` with end = max_ts - delay (the
    timestamp.delay.interval.ms watermark analogue)."""
    import datetime as dt

    tmin, tmax = _ts_bounds(sf_dir)
    begin = tmin + dt.timedelta(hours=1)
    end = tmax - dt.timedelta(minutes=5)
    return read_parquet_clean(
        _events_path(sf_dir),
        columns=BULK_COLUMNS,
        filter=(pc.field("ts") > begin) & (pc.field("ts") <= end),
    )


def source_timestamp_incrementing(sf_dir: str) -> ray.data.Dataset:
    """S4: composite (ts, inc) total order — rows strictly after the stored
    (T, I) offset pair."""
    lo, hi = _id_bounds(sf_dir)
    mid = (lo + hi) // 2
    # T = max ts among rows with id <= mid (a consistent "stored offset")
    t = (
        read_parquet_clean(
            _events_path(sf_dir), columns=["ts", "event_id"],
            filter=pc.field("event_id") <= mid,
        )
        .max("ts")
    )
    return read_parquet_clean(
        _events_path(sf_dir),
        columns=BULK_COLUMNS,
        filter=(pc.field("ts") > t)
        | ((pc.field("ts") == t) & (pc.field("event_id") > mid)),
    )
