"""Debezium change-event adapter tests: vectorized JSON envelope parsing
into the engine event schema, including deletes and snapshot reads."""

import json

import pyarrow as pa
import pytest
import ray.data

from kafka_connect_jdbc_flatten_ray.sources.debezium import DebeziumParser

VT = pa.struct([
    pa.field("repo", pa.string()),
    pa.field("path", pa.string()),
    pa.field("version", pa.int32()),
])


def _envelope(op, after=None, before=None, ts_ms=1600000000000):
    return json.dumps({"payload": {"before": before, "after": after,
                                   "op": op, "ts_ms": ts_ms}})


def _batch(payloads):
    return pa.table({
        "topic": pa.array(["t"] * len(payloads)),
        "partition": pa.array([0] * len(payloads), pa.int32()),
        "offset": pa.array(list(range(len(payloads))), pa.int64()),
        "json": pa.array(payloads),
    })


class TestParser:
    def test_create_update_read_delete(self):
        p = DebeziumParser(VT, ("repo", "path"))
        rowA = {"repo": "r1", "path": "a.txt", "version": 0}
        rowA2 = {"repo": "r1", "path": "a.txt", "version": 1}
        out = p(_batch([
            _envelope("c", after=rowA),
            _envelope("u", after=rowA2),
            _envelope("r", after=rowA2),              # snapshot read
            _envelope("d", before=rowA2),             # delete: after is null
        ]))
        ops = out.column("op").to_pylist()
        assert ops == ["U", "U", "U", "D"]
        vals = out.column("value").to_pylist()
        assert vals[0]["version"] == 0 and vals[1]["version"] == 1
        assert vals[3] is None  # tombstone value
        keys = out.column("key").to_pylist()
        assert all(k == {"repo": "r1", "path": "a.txt"} for k in keys)
        assert str(out.column("timestamp")[0]) == "2020-09-13 12:26:40"

    def test_feeds_flatten_and_merge(self, ray_session):
        """Adapter output drives the standard flatten+merge path: the
        delete removes its key, the update wins over the create."""
        from kafka_connect_jdbc_flatten_ray.config import SinkConfig
        from kafka_connect_jdbc_flatten_ray.pipelines.ingest import (
            flatten_envelopes,
            table_state,
        )
        from kafka_connect_jdbc_flatten_ray.stages.plan import build_plan

        rows = [
            _envelope("c", after={"repo": "r1", "path": "a", "version": 0}),
            _envelope("u", after={"repo": "r1", "path": "a", "version": 5}),
            _envelope("c", after={"repo": "r1", "path": "b", "version": 0}),
            _envelope("d", before={"repo": "r1", "path": "b", "version": 0}),
        ]
        ds = ray.data.from_arrow(_batch(rows)).map_batches(
            DebeziumParser(VT, ("repo", "path")), batch_format="pyarrow"
        )
        cfg = SinkConfig(pk_mode="flatten", pk_fields=("key.repo", "key.path"),
                         insert_mode="upsert", delete_enabled=True)
        plan = build_plan(cfg, "t", VT, "change", pa.struct(
            [pa.field("repo", pa.string()), pa.field("path", pa.string())]), "key")
        env = flatten_envelopes(ds, cfg, topic="t", value_schema_name="change",
                                key_schema_name="key")
        final = table_state(env, plan, "t_change").take_all()
        got = {(r["key_repo"], r["key_path"]): r["version"] for r in final}
        assert got == {("r1", "a"): 5}
