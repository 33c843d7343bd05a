"""Vectorized Arrow flatten kernel.

Executes a FlattenPlan over a batch of change events with pure
``pyarrow.compute`` kernels — the batch-vectorized equivalent of the
reference's per-record functional chains
(FlattenTransformation.java:91-131 runtime path, :440-477 container
navigation, :480-560 sub-processing). No per-row Python in this module.

Input batch schema (the engine's change-event envelope; the analogue of a
Kafka SinkRecord stream — FlattenTransformation.java:63-78 reads the same
five coordinates):

    topic: string, partition: int32, offset: int64,
    timestamp: timestamp[ms] (nullable), timestamp_type: string,
    key: struct | primitive (nullable), value: struct (null = tombstone)

Output: ``{final_table_name: envelope pa.Table}`` where the envelope is the
table's flattened data schema plus ``__op`` ('I' insert row, 'M' upsert
clear-marker, 'D' tombstone delete) and ``__part``/``__off`` order columns.
Markers/tombstones carry only key-PK + coordinate values (delete scope is the
record-key PK — BufferedRecords.java:399-415 keyFieldNamesInKey).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from kafka_connect_jdbc_flatten_ray.config import SinkConfig
from kafka_connect_jdbc_flatten_ray.stages.plan import (
    ARRAY,
    MAP,
    OP_DELETE,
    OP_INSERT,
    OP_MARKER,
    STRUCT,
    FlattenPlan,
    TablePlan,
)


def _arr(col) -> pa.Array:
    """Table column -> contiguous Array."""
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def _take(a: pa.Array, idx) -> pa.Array:
    return a if idx is None else a.take(idx)


def _list_explode(cur: pa.Array):
    """(flattened values, parent indices) for a list-typed array.

    ``pc.list_parent_indices`` uses raw offsets and ignores the validity
    bitmap, while ``pc.list_flatten`` respects it — inconsistent when a null
    list slot still spans child values. Deriving parents from
    ``list_value_length`` (null -> 0) keeps the two aligned.
    """
    import numpy as np

    lens = pc.fill_null(pc.list_value_length(cur), 0).to_numpy(zero_copy_only=False)
    par = pa.array(np.repeat(np.arange(len(cur), dtype=np.int64), lens))
    return pc.list_flatten(cur), par


def _explode(tp: TablePlan, value: pa.Array):
    """Navigate the main container path, exploding arrays/maps en route.

    Returns (items, pidx, captures): the exploded main-container values, the
    parent-row indices into the original batch (None = identity), and the
    captured map-key / value-PK arrays aligned with ``items``.
    Mirrors getNextContainer (FlattenTransformation.java:428-477) and the
    final-container explode in getSubProcessingFunction (:480-560).
    """
    cur = value
    pidx = None  # indices into original batch rows; None = 1:1
    caps: dict[str, pa.Array] = {}
    mp = tp.main_path
    for i, cont in enumerate(mp):
        if cont.kind == STRUCT:
            for cap in tp.captures:
                if cap.path_index == i and cap.kind == "value_pk":
                    caps[cap.col] = pc.struct_field(cur, cap.src_field)
            if i + 1 < len(mp):
                cur = pc.struct_field(cur, mp[i + 1].src_name)
        elif cont.kind == ARRAY:
            flat, par = _list_explode(cur)
            pidx = par if pidx is None else pidx.take(par)
            caps = {k: v.take(par) for k, v in caps.items()}
            cur = flat
        elif cont.kind == MAP:
            mtype = cur.type
            lst = cur.cast(pa.list_(pa.struct([mtype.key_field, mtype.item_field])))
            flat, par = _list_explode(lst)
            pidx = par if pidx is None else pidx.take(par)
            caps = {k: v.take(par) for k, v in caps.items()}
            keys = pc.struct_field(flat, mtype.key_field.name)
            if not pa.types.is_string(keys.type):
                keys = pc.cast(keys, pa.string())  # map key -> string (:466-469)
            for cap in tp.captures:
                if cap.path_index == i and cap.kind == "map_key":
                    caps[cap.col] = keys
            cur = pc.struct_field(flat, mtype.item_field.name)

    if mp[-1].kind == STRUCT and len(cur) and cur.null_count:
        # struct main container: one row per present (non-null) value (F6)
        sel = pc.indices_nonzero(pc.is_valid(cur))
        cur = cur.take(sel)
        pidx = sel if pidx is None else pidx.take(sel)
        caps = {k: v.take(sel) for k, v in caps.items()}
    return cur, pidx, caps


def _coord_value(coord: str, batch_cols: dict[str, pa.Array]) -> pa.Array:
    return batch_cols[coord]


def to_wallclock(arr: pa.Array, zone: str) -> pa.Array:
    """Render a naive epoch-UTC timestamp array as wall-clock in ``zone`` —
    the db.timezone calendar-binding analogue (util/DateTimeUtils.java,
    JdbcSinkConfig.java:218-220). Accepts fixed offsets ('+02:00', pure
    arithmetic) and tz-database names ('Europe/Oslo', DST-correct);
    naive in, naive out."""
    import re

    m = re.fullmatch(r"([+-])(\d{2}):(\d{2})", zone)
    if m:
        sign = 1 if m.group(1) == "+" else -1
        seconds = sign * (int(m.group(2)) * 3600 + int(m.group(3)) * 60)
        scale = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}
        unit = arr.type.unit
        return pc.add(arr, pa.scalar(seconds * scale[unit], pa.duration(unit)))
    aware = pc.assume_timezone(arr, "UTC")
    return pc.local_timestamp(pc.cast(aware, pa.timestamp(arr.type.unit, tz=zone)))


def _data_rows(
    tp: TablePlan,
    value: pa.Array,
    batch_cols: dict[str, pa.Array],
    key_arrs: dict[str, pa.Array],
    tz: str = "UTC",
) -> pa.Table:
    items, pidx, caps = _explode(tp, value)
    n = len(items)
    cols: list[pa.Array] = []
    for spec in tp.columns:
        if spec.kind == "leaf":
            if spec.leaf_is_item:
                v = items
            else:
                v = pc.struct_field(items, list(spec.item_steps))
            # logical timestamp leaves are bound in db.timezone too
            # (GenericDatabaseDialect.java:84,142 DateTimeUtils usage)
            if tz and tz != "UTC" and pa.types.is_timestamp(v.type) and v.type.tz is None:
                v = to_wallclock(v, tz)
        elif spec.kind == "capture":
            v = caps[spec.name]
        elif spec.kind == "key_pk":
            v = _take(key_arrs[spec.name], pidx)
        else:  # coord
            v = _take(_coord_value(spec.coord, batch_cols), pidx)
        if v.type != spec.dtype:
            v = pc.cast(v, spec.dtype)
        cols.append(v)
    cols.append(pa.array([OP_INSERT] * n, pa.string()))
    cols.append(pc.cast(_take(batch_cols["partition"], pidx), pa.int32()))
    cols.append(pc.cast(_take(batch_cols["offset"], pidx), pa.int64()))
    return pa.Table.from_arrays(cols, schema=tp.envelope_schema())


def _key_only_rows(
    tp: TablePlan,
    op: str,
    sel: pa.Array | None,
    batch_cols: dict[str, pa.Array],
    key_arrs: dict[str, pa.Array],
    n_batch: int,
) -> pa.Table:
    """Marker/tombstone rows: key-PK + coordinates, all data columns null.

    Upsert markers: FlattenTransformation.java:490,496-497,509,514-515 (one
    per record per target table, emitted even when the container is null).
    Tombstones: JdbcDbWriter.java:130-198 fan-out to every topic table.
    """
    n = n_batch if sel is None else len(sel)
    cols: list[pa.Array] = []
    for spec in tp.columns:
        if spec.kind == "key_pk":
            v = _take(key_arrs[spec.name], sel)
        elif spec.kind == "coord":
            v = _take(_coord_value(spec.coord, batch_cols), sel)
        else:
            v = pa.nulls(n, spec.dtype)
        if v.type != spec.dtype:
            v = pc.cast(v, spec.dtype)
        cols.append(v)
    cols.append(pa.array([op] * n, pa.string()))
    cols.append(pc.cast(_take(batch_cols["partition"], sel), pa.int32()))
    cols.append(pc.cast(_take(batch_cols["offset"], sel), pa.int64()))
    return pa.Table.from_arrays(cols, schema=tp.envelope_schema())


def flatten_event_batch(
    plan: FlattenPlan, cfg: SinkConfig, batch: pa.Table
) -> dict[str, pa.Table]:
    """Flatten one Arrow batch of change events into per-table envelopes.

    Tombstones are detected via the explicit ``op`` column ('D') when
    present, OR a null value struct. The batch is split FIRST and the
    explode runs only on data events — robust against Ray Data's block
    unification, which can promote mixed-schema yields into one block and
    drop a struct column's validity bitmap (leaving tombstone rows looking
    non-null).
    """
    import numpy as np

    n = batch.num_rows
    names = set(batch.column_names)
    value = _arr(batch.column("value"))
    key = _arr(batch.column("key")) if "key" in names else None

    tomb_mask = pc.is_null(value)
    if "op" in names:
        tomb_mask = pc.or_(tomb_mask, pc.equal(_arr(batch.column("op")), "D"))
    n_tomb = pc.sum(tomb_mask).as_py() or 0
    if n_tomb and not cfg.delete_enabled:
        raise ValueError(
            "tombstone (null value / op='D') events require delete_enabled "
            "(JdbcSinkConfig delete.enabled semantics)"
        )

    if n_tomb and value.null_count < n_tomb:
        # op='D' rows whose value struct is NOT null (a Ray block unification
        # can promote mixed-schema yields and drop the struct validity
        # bitmap): rebuild the validity bits, zero-copy children
        keep = pc.and_(pc.is_valid(value), pc.invert(tomb_mask))
        bits = np.packbits(
            keep.to_numpy(zero_copy_only=False), bitorder="little"
        )
        value = pa.StructArray.from_buffers(
            value.type, n, [pa.py_buffer(bits.tobytes())],
            children=[value.field(i) for i in range(value.type.num_fields)],
        )

    batch_cols = {
        "topic": _arr(batch.column("topic")),
        "partition": _arr(batch.column("partition")),
        "offset": _arr(batch.column("offset")),
        "timestamp": _arr(batch.column("timestamp")) if "timestamp" in names
        else pa.nulls(n, pa.timestamp("ms")),
        "timestamp_type": _arr(batch.column("timestamp_type")) if "timestamp_type" in names
        else pa.array(["CreateTime"] * n, pa.string()),
    }
    if plan.db_timezone and plan.db_timezone != "UTC":
        batch_cols["timestamp"] = to_wallclock(
            batch_cols["timestamp"], plan.db_timezone
        )

    key_arrs: dict[str, pa.Array] = {}
    for col, kfield, dtype in plan.key_pks:
        v = key if kfield is None else pc.struct_field(key, kfield)
        if v.type != dtype:
            v = pc.cast(v, dtype)
        key_arrs[col] = v

    tomb_sel = pc.indices_nonzero(tomb_mask) if n_tomb else None
    data_sel = pc.indices_nonzero(pc.invert(tomb_mask)) if n_tomb else None
    n_data = n - n_tomb

    out: dict[str, pa.Table] = {}
    for tp in plan.tables:
        parts = [_data_rows(tp, value, batch_cols, key_arrs, tz=plan.db_timezone)]
        if cfg.insert_mode == "upsert" and n_data:
            parts.append(
                _key_only_rows(tp, OP_MARKER, data_sel, batch_cols, key_arrs, n)
            )
        if n_tomb:
            parts.append(
                _key_only_rows(tp, OP_DELETE, tomb_sel, batch_cols, key_arrs, n)
            )
        out[tp.table] = parts[0] if len(parts) == 1 else pa.concat_tables(parts)
    return out
