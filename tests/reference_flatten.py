"""Slow, obviously-correct per-row reference interpreter of the flatten
semantics (mirrors the reference's functional chains record-at-a-time:
FlattenTransformation.java:91-131, 428-560). Used by the hypothesis
property tests to cross-check the vectorized Arrow kernel."""

from __future__ import annotations

from typing import Any

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


def _nav_main(tp: TablePlan, value: Any):
    """Yield (item, captures) after walking/exploding the main path."""
    mp = tp.main_path

    def step(i: int, obj: Any, caps: dict):
        cont = mp[i]
        if cont.kind == STRUCT:
            caps = dict(caps)
            for cap in tp.captures:
                if cap.path_index == i and cap.kind == "value_pk":
                    caps[cap.col] = None if obj is None else obj.get(cap.src_field)
            if i + 1 < len(mp):
                child = None if obj is None else obj.get(mp[i + 1].src_name)
                yield from step(i + 1, child, caps)
            else:
                if obj is not None:
                    yield obj, caps
        elif cont.kind == ARRAY:
            if obj is None:
                return
            for item in obj:
                if i + 1 < len(mp):
                    yield from step_from_item(i, item, caps)
                else:
                    yield item, caps
        elif cont.kind == MAP:
            if obj is None:
                return
            entries = obj.items() if isinstance(obj, dict) else obj
            for k, v in entries:
                caps2 = dict(caps)
                for cap in tp.captures:
                    if cap.path_index == i and cap.kind == "map_key":
                        caps2[cap.col] = str(k)
                if i + 1 < len(mp):
                    yield from step_from_item(i, v, caps2)
                else:
                    yield v, caps2

    def step_from_item(i: int, item: Any, caps: dict):
        # the container at i+1 is the item itself (struct/array/map reached
        # by exploding); continue from it without a field access
        yield from step(i + 1, item, caps)

    yield from step(0, value, {})


def _leaf_value(item: Any, steps: tuple[str, ...], is_item: bool):
    if is_item:
        return item
    cur = item
    for s in steps:
        if cur is None:
            return None
        cur = cur.get(s)
    return cur


def flatten_reference(plan: FlattenPlan, cfg, event: dict) -> dict[str, list[dict]]:
    """event = {topic, partition, offset, timestamp, timestamp_type, key, value}
    with key/value as plain Python dicts (or None). Returns per-table rows
    including __op/__part/__off."""
    out: dict[str, list[dict]] = {tp.table: [] for tp in plan.tables}
    key = event.get("key")
    key_vals = {}
    for col, kfield, _ in plan.key_pks:
        key_vals[col] = key if kfield is None else (None if key is None else key.get(kfield))

    coords = {
        "topic": event["topic"],
        "partition": event["partition"],
        "offset": event["offset"],
        "timestamp": event.get("timestamp"),
        "timestamp_type": event.get("timestamp_type"),
    }

    def base_row(tp: TablePlan, op: str) -> dict:
        row = {}
        for spec in tp.columns:
            if spec.kind == "key_pk":
                row[spec.name] = key_vals[spec.name]
            elif spec.kind == "coord":
                row[spec.name] = coords[spec.coord]
            else:
                row[spec.name] = None
        row["__op"] = op
        row["__part"] = event["partition"]
        row["__off"] = event["offset"]
        return row

    value = event.get("value")
    if value is None:  # tombstone
        if not cfg.delete_enabled:
            raise ValueError("tombstone without delete_enabled")
        for tp in plan.tables:
            out[tp.table].append(base_row(tp, OP_DELETE))
        return out

    for tp in plan.tables:
        if cfg.insert_mode == "upsert":
            out[tp.table].append(base_row(tp, OP_MARKER))
        for item, caps in _nav_main(tp, value):
            row = base_row(tp, OP_INSERT)
            for spec in tp.columns:
                if spec.kind == "leaf":
                    row[spec.name] = _leaf_value(item, spec.item_steps, spec.leaf_is_item)
                elif spec.kind == "capture":
                    row[spec.name] = caps.get(spec.name)
            out[tp.table].append(row)
    return out


def replay_reference(tables_rows: dict[str, list[dict]], key_cols) -> dict[str, list[dict]]:
    """Naive sequential replay: apply ops in (partition, offset) order."""
    out: dict[str, list[dict]] = {}
    for table, rows in tables_rows.items():
        state: list[dict] = []
        for row in sorted(rows, key=lambda r: (r["__part"], r["__off"])):
            kv = tuple(row.get(c) for c in key_cols)
            if row["__op"] in ("M", "D"):
                state = [r for r in state
                         if tuple(r.get(c) for c in key_cols) != kv]
            else:
                state.append(row)
        out[table] = [
            {k: v for k, v in r.items() if not k.startswith("__")} for r in state
        ]
    return out
