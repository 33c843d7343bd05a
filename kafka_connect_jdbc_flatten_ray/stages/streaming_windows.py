"""Incremental (epoch-at-a-time) sessionization with lake-resident state.

The batch sessionize (stages/windows.py) recomputes every session from the
full history; a streaming-ingest engine should fold ONLY the new epoch's
events into per-key session state, the same way the CDC path folds new
ops into bucket files. State here is a lake table managed by the same
manifest machinery as the ingest lake (epoch lineage, atomic publish,
single-writer CAS):

    session_state/bucket=N/epoch-M.parquet   one OPEN session per key
    session_state/.../epoch-M.closed.parquet sessions closed by epoch M
    session_state/manifest.json              buckets -> current state file,
                                             "deltas" -> append-only closed
                                             files, epochs -> lineage

``sessionize_epoch`` buckets the epoch's events by the engine's stable
key hash, reads each touched bucket's prior state INSIDE the fold task
(no driver materialization), extends/closes sessions, and publishes new
state + closed files under one manifest epoch. ``read_sessions`` returns
closed ∪ open — equal, row for row, to batch sessionize over all events
folded so far.

WATERMARK ASSUMPTION: each key's events may arrive in any order WITHIN an
epoch (the fold sorts), but epochs are per-key time-ordered. The
watermark is the stored open session's END (matching the as-of/trailing
operators): an epoch event at time t >= the stored end folds EXACTLY —
closed ∪ open equals batch sessionize row for row. An event with
t < stored end is LATE (state only keeps the open session's min/max/count,
so the fold cannot reconstruct how the event interleaved with already-
folded history — the same trade every watermark-based streaming
sessionizer makes); ``late_policy`` decides its fate:

- ``"count"``  — fold it anyway (min/max/count absorb it; in-epoch gap
  breaks may then diverge from batch) and report ``late_events``;
- ``"error"``  — refuse the epoch (the claim is released for a rerun);
- ``"quarantine"`` — divert late rows to a per-bucket dead-letter file
  (``epoch-N.late.parquet``, recorded in the manifest epoch stats and
  readable via :func:`read_quarantine`) and fold only the on-time rows,
  keeping the on-time output exactly batch-equivalent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from kafka_connect_jdbc_flatten_ray.state import fs as fsx
from kafka_connect_jdbc_flatten_ray.state.manifest import TableManifest
from kafka_connect_jdbc_flatten_ray.util import pandas_to_arrow, read_parquet_clean

STATE_TABLE = "session_state"

_STATE_SCHEMA_COLS = ["key", "session_id", "n_events",
                      "session_start", "session_end"]

#: loud upper bound for one bucket's epoch rows (same bound as
#: stages/windows.MAX_GROUP_ROWS) — a trip means the bucket count no
#: longer fits the key population; reshard_state is the remedy
MAX_FOLD_ROWS = 10_000_000


def _guard_fold(n: int, op: str, num_buckets: int,
                limit: int | None = None) -> None:
    # `limit` is captured DRIVER-side by each epoch function so the bound
    # travels with the serialized closure into Ray workers (a module-global
    # read in the worker would see the worker's import, not the driver's)
    limit = MAX_FOLD_ROWS if limit is None else limit
    if n > limit:
        raise ValueError(
            f"{op}: one bucket received {n} epoch rows (> {limit}) "
            f"at num_buckets={num_buckets}; reshard_state(...) to more "
            "buckets before folding epochs this large"
        )


def _stored_num_buckets(m: dict | None, num_buckets: int) -> int:
    """Bucket layout is persistent: once the state table exists, its
    recorded num_buckets always wins over the caller's argument — folding
    with a different count would look up each key's prior state in the
    wrong bucket file."""
    part = (m or {}).get("partitioning") or {}
    return int(part.get("num_buckets") or num_buckets)


def _conform_chunk(t: pa.Table, schema: pa.Schema) -> pa.Table:
    """Cast a state chunk to the operator's state schema, adding columns a
    legacy state file predates as nulls."""
    arrays = [
        t.column(f.name).cast(f.type) if f.name in t.schema.names
        else pa.nulls(t.num_rows, f.type)
        for f in schema
    ]
    return pa.Table.from_arrays(arrays, schema=schema)


def _split_prior_state(
    fs, prior_path: str | None, key: str, touched: np.ndarray,
    schema: pa.Schema, staged: str,
):
    """Stream one bucket's prior state: rows for keys touched this epoch
    come back in memory (bounded by the epoch's key count), every other
    row streams row-group-by-row-group straight into the new state file's
    writer — the whole bucket is never materialized on the fold task (at
    100 TB a bucket's key population dwarfs any single epoch's). Returns
    (touched_state pa.Table | None, open ParquetWriter, carried_rows)."""
    writer = pq.ParquetWriter(staged, schema, filesystem=fs)
    if prior_path is None:
        return None, writer, 0
    vs = pa.array(touched)
    parts: list[pa.Table] = []
    carried = 0
    with fs.open_input_file(prior_path) as f:
        pf = pq.ParquetFile(f)
        for i in range(pf.num_row_groups):
            t = _conform_chunk(pf.read_row_group(i), schema)
            mask = pc.is_in(t.column(key), value_set=vs)
            hit = t.filter(mask)
            if hit.num_rows:
                parts.append(hit)
            miss = t.filter(pc.invert(mask))
            if miss.num_rows:
                writer.write_table(miss)
                carried += miss.num_rows
    tbl = pa.concat_tables(parts) if parts else None
    return tbl, writer, carried


def _empty_sessions(key_name: str) -> pd.DataFrame:
    return pd.DataFrame(
        {
            key_name: pd.Series([], dtype="int64"),
            "session_id": pd.Series([], dtype="int64"),
            "n_events": pd.Series([], dtype="int64"),
            "session_start": pd.Series([], dtype="datetime64[us]"),
            "session_end": pd.Series([], dtype="datetime64[us]"),
        }
    )


def _fold_bucket(
    ev: pd.DataFrame, state: pd.DataFrame, key: str, ts: str,
    tiebreak: str, gap_us: int,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """(new open state, closed sessions) after folding one bucket's epoch
    events into its prior open-session state. Vectorized across keys.
    Exact (== batch sessionize) when every event is at or after its key's
    stored session end — late detection/diversion happens in the caller
    (see the module watermark contract). A continuing segment's end is
    max(segment max, stored end) so a late-but-folded event can never
    regress the open session's end."""
    cols = [key, "session_id", "n_events", "session_start", "session_end"]
    if not len(ev):  # every event quarantined: all state carries through
        return state[cols].copy() if len(state) else _empty_sessions(key), \
            _empty_sessions(key)
    ev = ev.sort_values([key, ts, tiebreak], kind="stable")
    k = ev[key].to_numpy()
    t = ev[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
    n = len(ev)
    first_of_key = np.concatenate(([True], k[1:] != k[:-1]))
    gap_break = np.concatenate(([False], (t[1:] - t[:-1]) > gap_us))
    # prior open state lookup for each key's first event
    st = state.set_index(key) if len(state) else state
    kf = k[first_of_key]
    tf = t[first_of_key]
    # vectorized state lookup: reindex the state frame by each key's first
    # event (NaN rows = unseen keys) — no per-key Python loops, so a
    # bucket with millions of keys stays numpy-bound
    if len(state):
        aligned = st.reindex(kf)
        al_end = aligned["session_end"].to_numpy().astype(
            "datetime64[us]").astype(np.float64)
        al_seq = aligned["session_id"].to_numpy().astype(np.float64)
        al_start = aligned["session_start"].to_numpy().astype("datetime64[us]")
        al_nev = aligned["n_events"].to_numpy().astype(np.float64)
        in_state = ~np.isnan(al_seq)
    else:
        al_end = np.full(len(kf), np.nan)
        al_seq = np.full(len(kf), np.nan)
        al_start = np.full(len(kf), np.datetime64("NaT", "us"))
        al_nev = np.full(len(kf), np.nan)
        in_state = np.zeros(len(kf), bool)
    cont_first = in_state & (tf - np.nan_to_num(al_end, nan=-np.inf) <= gap_us)
    # every key's first event opens a segment; later events open one on a
    # gap break. Segments are per-key by construction (first_of_key).
    seg_start_flag = first_of_key | gap_break
    seg_id = np.cumsum(seg_start_flag) - 1
    n_segs = seg_id[-1] + 1 if n else 0
    seg_key = k[seg_start_flag]
    seg_min = np.full(n_segs, np.iinfo(np.int64).max, np.int64)
    seg_max = np.full(n_segs, np.iinfo(np.int64).min, np.int64)
    seg_n = np.zeros(n_segs, np.int64)
    np.minimum.at(seg_min, seg_id, t)
    np.maximum.at(seg_max, seg_id, t)
    np.add.at(seg_n, seg_id, 1)
    # per-key segment ordinal + whether the key's FIRST segment continues
    # the stored open session
    seg_first_of_key = first_of_key[seg_start_flag]
    seg_ord = np.arange(n_segs) - np.maximum.accumulate(
        np.where(seg_first_of_key, np.arange(n_segs), -1)
    )
    seg_cont = np.zeros(n_segs, bool)
    seg_cont[np.flatnonzero(seg_first_of_key)] = cont_first
    # session numbering: base seq per key — the key's stored seq if its
    # first segment continues the open session, stored seq + 1 if the open
    # session closes, 0 for unseen keys. Each key's first-event aligned
    # state row broadcasts to its segments via first_seg_idx (segments of
    # one key are contiguous, and first events and first segments are in
    # the same key order).
    if n_segs:
        first_seg_idx = np.maximum.accumulate(
            np.where(seg_first_of_key, np.arange(n_segs), -1)
        )
        key_cont = seg_cont[first_seg_idx]  # per segment: key continues?
        key_no = np.cumsum(seg_first_of_key) - 1  # per segment: key index
        seq0 = np.nan_to_num(al_seq, nan=-1.0).astype(np.int64)[key_no]
        has_state = in_state[key_no]
        base = np.where(has_state, seq0 + np.where(key_cont, 0, 1), 0)
    else:
        base = np.empty(0, np.int64)
    seq = base + seg_ord
    # merge continuing segments with their stored session (vectorized:
    # continuing segments are exactly the first segments of continuing
    # keys, aligned through key_no)
    starts = seg_min.astype("datetime64[us]")
    nevs = seg_n.copy()
    ends_i = seg_max.copy()
    if n_segs:
        cont_idx = np.flatnonzero(seg_cont)
        if len(cont_idx):
            kidx = (np.cumsum(seg_first_of_key) - 1)[cont_idx]
            starts[cont_idx] = np.minimum(starts[cont_idx], al_start[kidx])
            nevs[cont_idx] += al_nev[kidx].astype(np.int64)
            # stored end wins if the epoch's events are all older than it
            # (late fold): the open session's end must never regress
            ends_i[cont_idx] = np.maximum(
                ends_i[cont_idx], al_end[kidx].astype(np.int64)
            )
    ends = ends_i.astype("datetime64[us]")
    sessions = pd.DataFrame(
        {
            key: seg_key,
            "session_id": seq,
            "n_events": nevs,
            "session_start": starts,
            "session_end": ends,
        }
    )
    # the LAST segment of each key stays open; earlier ones close
    last_of_key = np.concatenate(
        (seg_key[1:] != seg_key[:-1], [True])
    ) if n_segs else np.empty(0, bool)
    new_open = sessions[last_of_key]
    closed = sessions[~last_of_key]
    # stored sessions NOT continued by their key's first event close now
    cols = [key, "session_id", "n_events", "session_start", "session_end"]
    stale_mask = in_state & ~cont_first
    closed_stale = (
        st.loc[kf[stale_mask]].reset_index()[cols]
        if stale_mask.any() else _empty_sessions(key)
    )
    # untouched keys keep their open session (vectorized anti-join)
    if len(state):
        untouched = ~st.index.isin(kf)
        carried = (st.loc[untouched].reset_index()[cols]
                   if untouched.any() else _empty_sessions(key))
    else:
        carried = _empty_sessions(key)
    open_out = pd.concat([new_open, carried], ignore_index=True)
    closed_out = pd.concat([closed, closed_stale], ignore_index=True)
    return open_out, closed_out


def sessionize_epoch(
    events: ray.data.Dataset,
    state_root: str,
    gap_seconds: int = 1800,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    num_buckets: int = 32,
    late_policy: str = "count",
) -> dict:
    """Fold one epoch of events into the lake-resident session state.

    Distributed: events bucket by the engine's stable key hash, one fold
    task per touched bucket streams that bucket's prior state (touched
    keys into memory, the rest straight through to the new state file —
    never the whole bucket in pandas), and the commit is a manifest swap
    whose epoch number was CAS-claimed BEFORE any fold task wrote a data
    file. Buckets without events this epoch keep their previous state
    file untouched. ``num_buckets`` only applies when the state table is
    created; afterwards the manifest's recorded layout wins. Late events
    (older than their key's stored open-session end) follow
    ``late_policy`` — see the module docstring."""
    from kafka_connect_jdbc_flatten_ray.functions.hashing import stable_row_hash

    manifest = TableManifest(state_root, STATE_TABLE)
    m = manifest.load()
    epoch = 0 if not m else int(m["epoch"]) + 1
    num_buckets = _stored_num_buckets(m, num_buckets)
    prior = {int(b): p for b, p in (m or {}).get("buckets", {}).items()}
    fs, root = fsx.resolve(state_root)
    fold_limit = MAX_FOLD_ROWS
    gap_us = gap_seconds * 1_000_000
    st_schema = pa.schema([
        (key, pa.int64()), ("session_id", pa.int64()),
        ("n_events", pa.int64()), ("session_start", pa.timestamp("us")),
        ("session_end", pa.timestamp("us")),
    ])

    def _bucket(t: pa.Table) -> pa.Table:
        h = stable_row_hash(t, (key,))
        return t.append_column(
            "__bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int32))
        )

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        bucket = int(g["__bucket"].iloc[0])
        ev = g.drop(columns="__bucket")
        _guard_fold(len(ev), "sessionize_epoch", num_buckets, fold_limit)
        out_dir = fsx.join(root, STATE_TABLE, f"bucket={bucket:05d}")
        fsx.makedirs(fs, out_dir)
        state_path = fsx.join(out_dir, f"epoch-{epoch:06d}.parquet")
        staged = fsx.staging_path(fs, state_path)
        touched = np.unique(ev[key].to_numpy())
        state, writer, carried_rows = _split_prior_state(
            fs, prior.get(bucket), key, touched, st_schema, staged
        )
        state = _empty_sessions(key) if state is None else state.to_pandas()
        # LATE = older than the key's stored open-session END (per row)
        ev_ts = ev[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        if len(state):
            endmap = pd.Series(
                state["session_end"].to_numpy()
                .astype("datetime64[us]").astype(np.int64),
                index=state[key].to_numpy(), dtype="float64",
            )
            per_row = endmap.reindex(ev[key].to_numpy()).to_numpy()
            late = ev_ts < np.nan_to_num(per_row, nan=-np.inf)
        else:
            late = np.zeros(len(ev), bool)
        n_late = int(late.sum())
        late_path = ""
        if late_policy == "quarantine" and n_late:
            late_path = fsx.join(out_dir, f"epoch-{epoch:06d}.late.parquet")
            lstaged = fsx.staging_path(fs, late_path)
            pq.write_table(
                pandas_to_arrow(ev[late]),
                lstaged, filesystem=fs,
            )
            fsx.publish_file(fs, lstaged, late_path)
            ev = ev[~late]
        open_out, closed_out = _fold_bucket(ev, state, key, ts, tiebreak, gap_us)
        writer.write_table(
            pandas_to_arrow(open_out)
            .select(st_schema.names).cast(st_schema)
        )
        writer.close()
        fsx.publish_file(fs, staged, state_path)
        closed_path = ""
        if len(closed_out):
            closed_path = fsx.join(out_dir, f"epoch-{epoch:06d}.closed.parquet")
            cstaged = fsx.staging_path(fs, closed_path)
            pq.write_table(
                pandas_to_arrow(closed_out),
                cstaged, filesystem=fs,
            )
            fsx.publish_file(fs, cstaged, closed_path)
        return pa.table(
            {
                "bucket": [bucket],
                "state_path": [state_path],
                "closed_path": [closed_path],
                "late_path": [late_path],
                "open_sessions": [len(open_out) + carried_rows],
                "closed_sessions": [len(closed_out)],
                "late_events": [n_late],
            }
        )

    _fold.__name__ = "sessionize_fold"
    nonce = manifest.claim_epoch(epoch)
    try:
        stats = (
            events.map_batches(_bucket, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("__bucket")
            .map_groups(_fold, batch_format="pandas")
            .take_all()
        )
        n_late = int(sum(r["late_events"] for r in stats))
        if late_policy == "error" and n_late:
            raise ValueError(
                f"{n_late} late events violate the per-key cross-epoch "
                "time order (older than a stored open session's end); "
                "rerun with late_policy='quarantine' to dead-letter them "
                "or 'count' to fold them approximately"
            )
    except Exception:
        manifest.abandon_epoch(epoch)  # our claim (nonce held): rerunnable
        raise
    bucket_files = {int(r["bucket"]): r["state_path"] for r in stats}
    closed_files = {
        int(r["bucket"]): r["closed_path"] for r in stats if r["closed_path"]
    }
    late_files = {
        str(r["bucket"]): r["late_path"] for r in stats if r["late_path"]
    }
    manifest.publish(
        epoch, bucket_files,
        {
            "open_sessions": int(sum(r["open_sessions"] for r in stats)),
            "closed_sessions": int(sum(r["closed_sessions"] for r in stats)),
            "late_events": n_late,
            **({"late_files": late_files} if late_files else {}),
        },
        partitioning={"num_buckets": num_buckets, "key_pk_cols": [key],
                      "hash_version": 2},
        delta_files=closed_files,
        claim_nonce=nonce,
    )
    return {
        "epoch": epoch,
        "buckets": len(bucket_files),
        "open_sessions": int(sum(r["open_sessions"] for r in stats)),
        "closed_sessions": int(sum(r["closed_sessions"] for r in stats)),
        "late_events": n_late,
    }


def read_sessions(state_root: str) -> ray.data.Dataset:
    """All sessions so far: closed history ∪ current open sessions —
    row-for-row equal to batch sessionize over every event folded in."""
    from kafka_connect_jdbc_flatten_ray.state import fs as fsx

    manifest = TableManifest(state_root, STATE_TABLE)
    fs, _ = fsx.resolve(state_root)
    files = sorted(manifest.current_files().values())
    for ps in manifest.current_deltas().values():
        files.extend(ps)
    ds = read_parquet_clean(sorted(files), filesystem=fs)
    # bucket=N directories read back as a hive partition column — drop it
    drop = [c for c in ("bucket",) if c in ds.schema().names]
    return ds.drop_columns(drop) if drop else ds


# ---------------------------------------------------------------------------
# incremental as-of join (state: one row per key — latest right value)
# ---------------------------------------------------------------------------

ASOF_TABLE = "asof_state"


def asof_epoch(
    events: ray.data.Dataset,
    state_root: str,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    type_col: str = "event_type",
    left_type: str = "click",
    right_type: str = "purchase",
    value_col: str = "value",
    num_buckets: int = 32,
    late_policy: str = "count",
) -> dict:
    """Fold one epoch into the as-of join: each left event joins the most
    recent earlier right event's value, across epochs via TINY state (one
    row per key: the latest right value seen + a per-key timestamp
    watermark). This epoch's joined left rows append as per-bucket output
    files; the union over epochs equals the batch as-of join under the
    per-key cross-epoch time order assumption. Epoch events OLDER than
    their key's stored watermark are late (they may receive a right value
    from their future): ``late_policy`` is ``"count"`` (fold anyway),
    ``"error"`` (refuse the epoch), or ``"quarantine"`` (dead-letter the
    late rows and fold only on-time rows — see read_quarantine). Same
    manifest/CAS commit shape as sessionize_epoch: the epoch number is
    claimed before any fold task writes, prior state streams (touched
    keys in memory, the rest straight through), and the manifest's
    recorded num_buckets wins once the table exists."""
    from kafka_connect_jdbc_flatten_ray.functions.hashing import stable_row_hash

    manifest = TableManifest(state_root, ASOF_TABLE)
    m = manifest.load()
    epoch = 0 if not m else int(m["epoch"]) + 1
    num_buckets = _stored_num_buckets(m, num_buckets)
    prior = {int(b): p for b, p in (m or {}).get("buckets", {}).items()}
    fs, root = fsx.resolve(state_root)
    fold_limit = MAX_FOLD_ROWS
    st_schema = pa.schema([
        (key, pa.int64()), ("last_value", pa.float64()),
        ("last_ts", pa.timestamp("us")),
    ])

    def _bucket(t: pa.Table) -> pa.Table:
        h = stable_row_hash(t, (key,))
        return t.append_column(
            "__bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int32))
        )

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        bucket = int(g["__bucket"].iloc[0])
        g = g.drop(columns="__bucket")
        _guard_fold(len(g), "asof_epoch", num_buckets, fold_limit)
        out_dir = fsx.join(root, ASOF_TABLE, f"bucket={bucket:05d}")
        fsx.makedirs(fs, out_dir)
        state_path = fsx.join(out_dir, f"epoch-{epoch:06d}.parquet")
        staged = fsx.staging_path(fs, state_path)
        touched = np.unique(g[key].to_numpy())
        state, writer, _carried = _split_prior_state(
            fs, prior.get(bucket), key, touched, st_schema, staged
        )
        if state is None:
            state = pd.DataFrame(
                {key: pd.Series([], dtype="int64"),
                 "last_value": pd.Series([], dtype="float64"),
                 "last_ts": pd.Series([], dtype="datetime64[us]")}
            )
        else:
            state = state.to_pandas()
        carry = dict(zip(state[key].to_numpy(), state["last_value"].to_numpy()))
        wm = dict(zip(
            state[key].to_numpy(),
            state["last_ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
        ))
        g = g.sort_values([key, ts, tiebreak], kind="stable")
        k = g[key].to_numpy()
        t_us = g[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        # late = older than the key's stored watermark (vectorized map)
        wm_s = pd.Series(wm, dtype="float64")
        wm_per_row = wm_s.reindex(k).to_numpy()
        late = t_us < np.nan_to_num(wm_per_row, nan=-np.inf)
        n_late = int(late.sum())
        late_path = ""
        if late_policy == "quarantine" and n_late:
            late_path = fsx.join(out_dir, f"epoch-{epoch:06d}.late.parquet")
            lstaged = fsx.staging_path(fs, late_path)
            pq.write_table(
                pandas_to_arrow(g[late]),
                lstaged, filesystem=fs,
            )
            fsx.publish_file(fs, lstaged, late_path)
            g, k, t_us = g[~late], k[~late], t_us[~late]
        if not len(g):  # every event quarantined: state carries unchanged
            out = pd.DataFrame(
                {key: pd.Series([], dtype="int64"),
                 tiebreak: pd.Series([], dtype="int64"),
                 ts: pd.Series([], dtype="datetime64[us]"),
                 "asof_value": pd.Series([], dtype="float64")}
            )
            writer.write_table(
                pandas_to_arrow(state)
                .select(st_schema.names).cast(st_schema)
            )
            writer.close()
            fsx.publish_file(fs, staged, state_path)
            return pa.table(
                {"bucket": [bucket], "state_path": [state_path],
                 "joined_path": [""], "late_path": [late_path],
                 "joined_rows": [0], "late_events": [n_late]}
            )
        vals = g[value_col].to_numpy(dtype=np.float64)
        is_right = (g[type_col] == right_type).to_numpy()
        # per-key forward-fill of right values, seeded by the carry-in
        first_of_key = np.concatenate(([True], k[1:] != k[:-1]))
        carried = np.where(is_right, vals, np.nan)
        seed = np.array([carry.get(kk, np.nan) for kk in k[first_of_key]])
        # groupwise ffill with a pre-shift so a row never sees itself:
        # prepend each key's seed as a virtual row before its first event
        df = pd.DataFrame({"k": k, "v": carried})
        shifted = df.groupby("k", sort=False)["v"].shift(1)
        seeded = shifted.to_numpy()
        seeded[first_of_key] = seed
        asof = pd.Series(
            np.where(np.isnan(seeded) & ~first_of_key, np.nan, seeded)
        ).groupby(k, sort=False).ffill().to_numpy()
        # NOTE: the two-step above fills from in-epoch rights AND the seed:
        # rows before any in-epoch right fall back to the seed via ffill
        is_left = (g[type_col] == left_type).to_numpy()
        out = pd.DataFrame(
            {
                key: k[is_left],
                tiebreak: g[tiebreak].to_numpy()[is_left],
                ts: g[ts].to_numpy()[is_left].astype("datetime64[us]"),
                "asof_value": asof[is_left],
            }
        )
        # new state: last right value per key (carry-in if none this epoch)
        # — rows are (key, ts)-sorted, so the last right row per key is
        # found with one boundary scan, linear in epoch size
        right_idx = np.flatnonzero(is_right)
        if len(right_idx):
            rk = k[right_idx]
            last_right = np.concatenate((rk[1:] != rk[:-1], [True]))
            carry.update(
                zip(rk[last_right].tolist(),
                    vals[right_idx][last_right].tolist())
            )
        # advance each touched key's watermark to its epoch max ts
        last_of_key = np.concatenate((k[1:] != k[:-1], [True])) if len(k) else np.empty(0, bool)
        for kk, tt in zip(k[last_of_key].tolist(), t_us[last_of_key].tolist()):
            wm[kk] = max(tt, wm.get(kk, -2**62))
        keys_arr = np.fromiter(carry.keys(), np.int64, len(carry))
        all_keys = np.union1d(keys_arr, np.fromiter(wm.keys(), np.int64, len(wm)))
        new_state = pd.DataFrame(
            {key: all_keys,
             "last_value": pd.Series(carry, dtype="float64").reindex(all_keys).to_numpy(),
             "last_ts": pd.Series(
                 {kk: np.datetime64(int(v), "us") for kk, v in wm.items()}
             ).reindex(all_keys).to_numpy().astype("datetime64[us]")}
        )
        writer.write_table(
            pandas_to_arrow(new_state)
            .select(st_schema.names).cast(st_schema)
        )
        writer.close()
        fsx.publish_file(fs, staged, state_path)
        joined_path = ""
        if len(out):
            joined_path = fsx.join(out_dir, f"epoch-{epoch:06d}.joined.parquet")
            jstaged = fsx.staging_path(fs, joined_path)
            pq.write_table(pandas_to_arrow(out),
                           jstaged, filesystem=fs)
            fsx.publish_file(fs, jstaged, joined_path)
        return pa.table(
            {"bucket": [bucket], "state_path": [state_path],
             "joined_path": [joined_path], "late_path": [late_path],
             "joined_rows": [len(out)], "late_events": [n_late]}
        )

    _fold.__name__ = "asof_fold"
    nonce = manifest.claim_epoch(epoch)
    try:
        stats = (
            events.map_batches(_bucket, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("__bucket")
            .map_groups(_fold, batch_format="pandas")
            .take_all()
        )
        n_late = int(sum(r["late_events"] for r in stats))
        if late_policy == "error" and n_late:
            raise ValueError(
                f"{n_late} late events violate the per-key cross-epoch time "
                "order (older than the stored watermark)"
            )
    except Exception:
        manifest.abandon_epoch(epoch)
        raise
    late_files = {
        str(r["bucket"]): r["late_path"] for r in stats if r["late_path"]
    }
    manifest.publish(
        epoch,
        {int(r["bucket"]): r["state_path"] for r in stats},
        {"joined_rows": int(sum(r["joined_rows"] for r in stats)),
         "late_events": n_late,
         **({"late_files": late_files} if late_files else {})},
        partitioning={"num_buckets": num_buckets, "key_pk_cols": [key],
                      "hash_version": 2},
        delta_files={int(r["bucket"]): r["joined_path"]
                     for r in stats if r["joined_path"]},
        claim_nonce=nonce,
    )
    return {"epoch": epoch,
            "joined_rows": int(sum(r["joined_rows"] for r in stats)),
            "late_events": n_late}


def read_asof(state_root: str) -> ray.data.Dataset:
    """All joined left rows folded so far (union over epochs)."""
    from kafka_connect_jdbc_flatten_ray.state import fs as fsx

    manifest = TableManifest(state_root, ASOF_TABLE)
    fs, _ = fsx.resolve(state_root)
    files: list[str] = []
    for ps in manifest.current_deltas().values():
        files.extend(ps)
    ds = read_parquet_clean(sorted(files), filesystem=fs)
    # bucket=N directories read back as a hive partition column — drop it
    drop = [c for c in ("bucket",) if c in ds.schema().names]
    return ds.drop_columns(drop) if drop else ds


# ---------------------------------------------------------------------------
# incremental trailing RANGE window (state: each key's last `window` events)
# ---------------------------------------------------------------------------

TRAILING_TABLE = "trailing_state"


def trailing_epoch(
    events: ray.data.Dataset,
    state_root: str,
    window_seconds: int = 3600,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    num_buckets: int = 32,
    late_policy: str = "count",
) -> dict:
    """Fold one epoch into the trailing RANGE window counts: each epoch
    event's count covers its full trailing window because the state keeps,
    per key, every event within ``window_seconds`` of that key's max
    timestamp — the only history a FUTURE event's window can reach under
    the per-key cross-epoch time order assumption (epoch boundaries must
    also not split a (key, ts) tie group — RANGE windows count ts-peers
    bidirectionally, and an already-emitted count cannot see later peers).
    Late rows (older than their key's stored max timestamp) follow
    ``late_policy`` (count/error/quarantine). Same manifest/CAS commit
    shape as the other incremental operators: epoch claimed before fold
    tasks write, prior state streamed (touched keys in memory, the rest
    straight through), recorded num_buckets wins once the table exists."""
    from kafka_connect_jdbc_flatten_ray.functions.hashing import stable_row_hash

    manifest = TableManifest(state_root, TRAILING_TABLE)
    m = manifest.load()
    epoch = 0 if not m else int(m["epoch"]) + 1
    num_buckets = _stored_num_buckets(m, num_buckets)
    prior = {int(b): p for b, p in (m or {}).get("buckets", {}).items()}
    fs, root = fsx.resolve(state_root)
    fold_limit = MAX_FOLD_ROWS
    w_us = window_seconds * 1_000_000
    st_schema = pa.schema([
        (key, pa.int64()), (id_col, pa.int64()), (ts, pa.timestamp("us")),
    ])

    def _bucket(t: pa.Table) -> pa.Table:
        h = stable_row_hash(t, (key,))
        return t.append_column(
            "__bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int32))
        )

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        bucket = int(g["__bucket"].iloc[0])
        ev0 = g.drop(columns="__bucket")[[key, id_col, ts]]
        _guard_fold(len(ev0), "trailing_epoch", num_buckets, fold_limit)
        out_dir = fsx.join(root, TRAILING_TABLE, f"bucket={bucket:05d}")
        fsx.makedirs(fs, out_dir)
        state_path = fsx.join(out_dir, f"epoch-{epoch:06d}.parquet")
        staged = fsx.staging_path(fs, state_path)
        touched = np.unique(ev0[key].to_numpy())
        state, writer, _carried = _split_prior_state(
            fs, prior.get(bucket), key, touched, st_schema, staged
        )
        if state is None:
            state = pd.DataFrame(
                {key: pd.Series([], dtype="int64"),
                 id_col: pd.Series([], dtype="int64"),
                 ts: pd.Series([], dtype="datetime64[us]")}
            )
        else:
            state = state.to_pandas()
        ev = ev0.assign(__own=True)
        st = state.assign(__own=False)
        # late = epoch events older than their key's stored max timestamp
        # (part of their trailing window may already be discarded)
        if len(st):
            st_max = st.groupby(key)[ts].max()
            st_max_i = pd.Series(
                st_max.to_numpy().astype("datetime64[us]").astype(np.int64),
                index=st_max.index, dtype="float64",
            )
            ev_ts_i = ev[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
            per_row = st_max_i.reindex(ev[key].to_numpy()).to_numpy()
            late = ev_ts_i < np.nan_to_num(per_row, nan=-np.inf)
        else:
            late = np.zeros(len(ev), bool)
        n_late = int(late.sum())
        late_path = ""
        if late_policy == "quarantine" and n_late:
            late_path = fsx.join(out_dir, f"epoch-{epoch:06d}.late.parquet")
            lstaged = fsx.staging_path(fs, late_path)
            pq.write_table(
                pandas_to_arrow(ev0[late]),
                lstaged, filesystem=fs,
            )
            fsx.publish_file(fs, lstaged, late_path)
            ev = ev[~late]
        both = pd.concat([st, ev], ignore_index=True).sort_values(
            [key, ts, id_col], kind="stable"
        )
        k = both[key].to_numpy()
        t_us = both[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        own = both["__own"].to_numpy()
        n = len(both)
        first_of_key = np.concatenate(([True], k[1:] != k[:-1]))
        # one searchsorted across ALL keys: shift each key's timestamps
        # into a disjoint range wider than span + window
        key_idx = np.cumsum(first_of_key) - 1
        t0 = t_us.min() if n else 0
        span = (t_us.max() - t0 + w_us + 2) if n else 1
        assert key_idx[-1] * span < np.iinfo(np.int64).max // 2 if n else True
        t_adj = (t_us - t0) + key_idx * span
        lo = np.searchsorted(t_adj, t_adj - w_us, side="left")
        hi = np.searchsorted(t_adj, t_adj, side="right")
        counts = (hi - lo).astype(np.int64)
        out = pd.DataFrame(
            {
                key: k[own],
                id_col: both[id_col].to_numpy()[own],
                "n_trailing": counts[own],
            }
        )
        # new state: per key, rows within `window` of that key's max ts
        kmax = np.full(n, np.iinfo(np.int64).min, np.int64)
        if n:
            last_of_key = np.concatenate((k[1:] != k[:-1], [True]))
            maxs = t_us[last_of_key]  # sorted per key -> last is max
            kmax = maxs[key_idx]
        keep = t_us >= kmax - w_us
        new_state = pd.DataFrame(
            {
                key: k[keep],
                id_col: both[id_col].to_numpy()[keep],
                ts: both[ts].to_numpy()[keep].astype("datetime64[us]"),
            }
        )
        writer.write_table(
            pandas_to_arrow(new_state)
            .select(st_schema.names).cast(st_schema)
        )
        writer.close()
        fsx.publish_file(fs, staged, state_path)
        counts_path = ""
        if len(out):
            counts_path = fsx.join(out_dir, f"epoch-{epoch:06d}.counts.parquet")
            cstaged = fsx.staging_path(fs, counts_path)
            pq.write_table(pandas_to_arrow(out),
                           cstaged, filesystem=fs)
            fsx.publish_file(fs, cstaged, counts_path)
        return pa.table(
            {"bucket": [bucket], "state_path": [state_path],
             "counts_path": [counts_path], "late_path": [late_path],
             "rows": [len(out)], "late_events": [n_late]}
        )

    _fold.__name__ = "trailing_fold"
    nonce = manifest.claim_epoch(epoch)
    try:
        stats = (
            events.map_batches(_bucket, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("__bucket")
            .map_groups(_fold, batch_format="pandas")
            .take_all()
        )
        n_late = int(sum(r["late_events"] for r in stats))
        if late_policy == "error" and n_late:
            raise ValueError(
                f"{n_late} late events violate the per-key cross-epoch time "
                "order (older than the stored per-key max timestamp)"
            )
    except Exception:
        manifest.abandon_epoch(epoch)
        raise
    late_files = {
        str(r["bucket"]): r["late_path"] for r in stats if r["late_path"]
    }
    manifest.publish(
        epoch,
        {int(r["bucket"]): r["state_path"] for r in stats},
        {"rows": int(sum(r["rows"] for r in stats)), "late_events": n_late,
         **({"late_files": late_files} if late_files else {})},
        partitioning={"num_buckets": num_buckets, "key_pk_cols": [key],
                      "hash_version": 2},
        delta_files={int(r["bucket"]): r["counts_path"]
                     for r in stats if r["counts_path"]},
        claim_nonce=nonce,
    )
    return {"epoch": epoch, "rows": int(sum(r["rows"] for r in stats)),
            "late_events": n_late}


def read_trailing(state_root: str) -> ray.data.Dataset:
    """All trailing-window counts folded so far (union over epochs)."""
    manifest = TableManifest(state_root, TRAILING_TABLE)
    fs, _ = fsx.resolve(state_root)
    files: list[str] = []
    for ps in manifest.current_deltas().values():
        files.extend(ps)
    ds = read_parquet_clean(sorted(files), filesystem=fs)
    drop = [c for c in ("bucket",) if c in ds.schema().names]
    return ds.drop_columns(drop) if drop else ds


# ---------------------------------------------------------------------------
# dead-letter + reshard maintenance shared by the incremental operators
# ---------------------------------------------------------------------------


def read_quarantine(state_root: str, table: str = STATE_TABLE) -> ray.data.Dataset:
    """Dead-lettered late events across epochs (``late_policy='quarantine'``)
    for one incremental state table — inspectable and replayable (an
    operator can re-fold them after widening the watermark upstream)."""
    manifest = TableManifest(state_root, table)
    fs, _ = fsx.resolve(state_root)
    m = manifest.load() or {}
    files: list[str] = []
    for e in m.get("epochs", []):
        files.extend((e.get("late_files") or {}).values())
    if not files:
        return ray.data.from_items([])
    ds = read_parquet_clean(sorted(files), filesystem=fs)
    drop = [c for c in ("bucket",) if c in ds.schema().names]
    return ds.drop_columns(drop) if drop else ds


def reshard_state(
    state_root: str, table: str, new_num_buckets: int, key: str = "user_id"
) -> dict:
    """Re-bucket an incremental state table — the scale path when the key
    population outgrows the layout it was created with (the fold guard
    trips, or keys-per-bucket drifts past memory comfort). Reads the
    current per-bucket state as one Dataset, re-assigns buckets with the
    same stable key hash at the new count, writes one state file per new
    bucket, and publishes them as a manifest epoch that REPLACES the
    bucket map (partitioning records the new count, so subsequent epoch
    folds pick it up automatically). Delta files (closed/joined/counts
    history) are bucket-agnostic on the read path and stay referenced
    unchanged."""
    from kafka_connect_jdbc_flatten_ray.functions.hashing import stable_row_hash

    manifest = TableManifest(state_root, table)
    m = manifest.load()
    if not m:
        raise ValueError(f"state table {table} has no manifest at {state_root}")
    epoch = int(m["epoch"]) + 1
    nonce = manifest.claim_epoch(epoch)
    fs, root = fsx.resolve(state_root)
    files = sorted(manifest.current_files().values())

    def _rebucket(t: pa.Table) -> pa.Table:
        if "bucket" in t.schema.names:  # hive partition col from the read
            t = t.drop_columns(["bucket"])
        h = stable_row_hash(t, (key,))
        return t.append_column(
            "__bucket",
            pa.array((h % np.uint64(new_num_buckets)).astype(np.int32)),
        )

    def _write(t: pa.Table) -> pa.Table:
        bucket = int(t.column("__bucket")[0].as_py())
        out_dir = fsx.join(root, table, f"bucket={bucket:05d}")
        fsx.makedirs(fs, out_dir)
        path = fsx.join(out_dir, f"epoch-{epoch:06d}.parquet")
        staged = fsx.staging_path(fs, path)
        body = t.drop_columns(["__bucket"])
        pq.write_table(body, staged, filesystem=fs)
        fsx.publish_file(fs, staged, path)
        return pa.table({"bucket": pa.array([bucket], pa.int64()),
                         "path": pa.array([path]),
                         "rows": pa.array([body.num_rows], pa.int64())})

    try:
        stats = (
            read_parquet_clean(files, filesystem=fs)
            .map_batches(_rebucket, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("__bucket")
            .map_groups(_write, batch_format="pyarrow")
            .take_all()
        )
    except Exception:
        manifest.abandon_epoch(epoch)
        raise
    part = dict(m.get("partitioning") or {})
    part["num_buckets"] = new_num_buckets
    manifest.publish(
        epoch,
        {int(r["bucket"]): r["path"] for r in stats},
        {"resharded_to": new_num_buckets,
         "rows": int(sum(r["rows"] for r in stats))},
        partitioning=part,
        replace_buckets=True,
        claim_nonce=nonce,
    )
    return {"epoch": epoch, "num_buckets": new_num_buckets,
            "buckets_written": len(stats)}
