"""Debezium-format change-event adapter (SCALE.md roadmap item 4).

Kafka Connect deployments of the reference typically consume Debezium
binlog/WAL envelopes: ``{"payload": {"before": …, "after": …, "op":
"c|u|r|d", "ts_ms": …, "source": {...}}}``. This adapter parses batches of
such JSON strings into the engine's event schema — (topic, partition,
offset, timestamp, timestamp_type, key, value, op) — so any Debezium topic
dump can feed ``flatten_envelopes``/``run_epoch`` unchanged.

The parse is VECTORIZED: each batch's JSON strings are joined into one
newline-delimited buffer and parsed by Arrow's C++ JSON reader
(``pyarrow.json.read_json``) against an explicit schema — no per-row
``json.loads``. Op mapping: c/u/r -> data event ('U'; r = snapshot read,
the reference's bulk-mode analogue), d -> tombstone ('D', value null).
The record key struct is assembled from configured fields of ``after``
(``before`` for deletes, matching Debezium's delete envelope)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.json as pj


def _payload_schema(value_type: pa.DataType) -> pa.Schema:
    return pa.schema(
        [
            pa.field(
                "payload",
                pa.struct(
                    [
                        pa.field("before", value_type),
                        pa.field("after", value_type),
                        pa.field("op", pa.string()),
                        pa.field("ts_ms", pa.int64()),
                    ]
                ),
            )
        ]
    )


class DebeziumParser:
    """map_batches callable: (topic, partition, offset, json) batches ->
    engine change-event batches. ``key_fields`` name the PK columns of the
    captured table (Debezium's key record fields)."""

    def __init__(self, value_type: pa.DataType, key_fields: tuple[str, ...]):
        self.value_type = value_type
        self.key_fields = tuple(key_fields)
        self.parse_options = pj.ParseOptions(
            explicit_schema=_payload_schema(value_type)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        js = batch.column("json")
        if isinstance(js, pa.ChunkedArray):
            js = js.combine_chunks()
        n = len(js)
        # one newline-delimited buffer -> one vectorized C++ JSON parse
        big = pc.binary_join(
            pa.LargeListArray.from_arrays(
                pa.array([0, n], pa.int64()),
                pc.cast(js, pa.large_string()),
            ),
            pa.scalar("\n", pa.large_string()),
        )
        if isinstance(big, pa.ChunkedArray):
            big = big.combine_chunks()
        parsed = pj.read_json(
            pa.BufferReader(big.buffers()[2]), parse_options=self.parse_options
        )
        payload = parsed.column("payload")
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        if len(payload) != n:
            raise ValueError(
                f"Debezium batch parsed to {len(payload)} payloads for {n} "
                "records — embedded newlines in a JSON value?"
            )
        op_raw = pc.struct_field(payload, "op")
        is_delete = pc.equal(op_raw, "d")
        after = pc.struct_field(payload, "after")
        before = pc.struct_field(payload, "before")
        # value = after for data events, null for deletes (engine tombstone)
        value = pc.if_else(is_delete, pa.nulls(n, self.value_type), after)
        # key source row: after for data events, before for deletes
        key_src = pc.if_else(is_delete, before, after)
        key = pa.StructArray.from_arrays(
            [pc.struct_field(key_src, f) for f in self.key_fields],
            fields=[
                pa.field(f, self.value_type.field(f).type) for f in self.key_fields
            ],
        )
        ts = pc.cast(pc.struct_field(payload, "ts_ms"), pa.timestamp("ms"))
        op = pc.if_else(is_delete, pa.scalar("D"), pa.scalar("U"))
        return pa.table(
            {
                "topic": batch.column("topic"),
                "partition": batch.column("partition"),
                "offset": batch.column("offset"),
                "timestamp": ts,
                "timestamp_type": pa.array(["CreateTime"] * n, pa.string()),
                "key": key,
                "value": value,
                "op": op,
            }
        )
