"""Edge-case parity tests: pk.mode=kafka in flatten mode, null array items,
nested container whitelists."""

import pyarrow as pa

from kafka_connect_jdbc_flatten_ray.config import SinkConfig
from kafka_connect_jdbc_flatten_ray.stages.kernel import flatten_event_batch
from kafka_connect_jdbc_flatten_ray.stages.plan import build_plan

ADDRESS = pa.struct([pa.field("street", pa.string()), pa.field("number", pa.int8())])
PERSON = pa.struct([pa.field("firstname", pa.string()),
                    pa.field("address", pa.list_(ADDRESS))])


def batch(values, value_type=PERSON, offsets=None):
    n = len(values)
    return pa.table(
        {
            "topic": pa.array(["atopic"] * n),
            "partition": pa.array([1] * n, pa.int32()),
            "offset": pa.array(offsets or [42] * n, pa.int64()),
            "timestamp": pa.array([1_474_661_402_123] * n, pa.timestamp("ms")),
            "timestamp_type": pa.array(["CreateTime"] * n),
            "value": pa.array(values, value_type),
        }
    )


class TestKafkaPkMode:
    # JdbcSinkTaskTestPostgresArray.java:189-256 — flatten with pk.mode=kafka
    # adds __connect_topic/__connect_partition/__connect_offset PK columns
    def test_connect_columns(self):
        cfg = SinkConfig(pk_mode="kafka", insert_mode="insert",
                         delete_enabled=False, flatten_coordinates=False)
        plan = build_plan(cfg, "atopic", PERSON, "com.example.Person")
        root = next(t for t in plan.tables if t.table == "atopic_person")
        assert ("__connect_topic", "__connect_partition", "__connect_offset") == tuple(
            root.pk_cols
        )
        out = flatten_event_batch(
            plan, cfg, batch([{"firstname": "Alex", "address": None}])
        )
        r = [x for x in out["atopic_person"].to_pylist() if x["__op"] == "I"][0]
        assert r["__connect_topic"] == "atopic"
        assert r["__connect_partition"] == 1
        assert r["__connect_offset"] == 42
        assert r["firstname"] == "Alex"


class TestNullArrayItem:
    def test_null_item_becomes_null_row(self):
        # a null element in an array of structs yields a child row with null
        # data columns but coordinates present (the reference's functional
        # chain produces a Struct with only propagated fields —
        # FlattenTransformation.java:594-631 null-safe subcontainer path)
        cfg = SinkConfig(pk_mode="none", insert_mode="insert", delete_enabled=False)
        plan = build_plan(cfg, "atopic", PERSON, "com.example.Person")
        out = flatten_event_batch(
            plan, cfg,
            batch([{"firstname": "x",
                    "address": [{"street": "s", "number": 1}, None]}]),
        )
        child = [r for r in out["atopic_person_address"].to_pylist()
                 if r["__op"] == "I"]
        assert len(child) == 2
        assert child[0]["street"] == "s"
        assert child[1]["street"] is None and child[1]["number"] is None
        assert child[1]["kafkaoffset"] == 42


class TestMultiTopic:
    def test_mixed_topic_batch_routes_per_topic(self):
        from kafka_connect_jdbc_flatten_ray.stages.flatten_stage import (
            FlattenStage,
            deserialize_ipc,
        )

        cfg = SinkConfig(pk_mode="none", insert_mode="insert", delete_enabled=False)
        t = pa.struct([pa.field("v", pa.string())])
        b = pa.table(
            {
                "topic": pa.array(["alpha", "beta", "alpha"]),
                "partition": pa.array([0] * 3, pa.int32()),
                "offset": pa.array([0, 1, 2], pa.int64()),
                "timestamp": pa.array([0] * 3, pa.timestamp("ms")),
                "timestamp_type": pa.array(["CreateTime"] * 3),
                "value": pa.array([{"v": "a1"}, {"v": "b1"}, {"v": "a2"}], t),
            }
        )
        st = FlattenStage(cfg, "alpha", "com.example.Person")
        env = st(b)
        rows_by_table: dict[str, list] = {}
        for r in env.to_pylist():
            tbl = deserialize_ipc(r["payload"])
            rows_by_table.setdefault(r["table"], []).extend(tbl.to_pylist())
        assert set(rows_by_table) == {"alpha_person", "beta_person"}
        assert sorted(x["v"] for x in rows_by_table["alpha_person"]) == ["a1", "a2"]
        assert [x["v"] for x in rows_by_table["beta_person"]] == ["b1"]


class TestNonStructValueRejected:
    def test_clear_error(self):
        from kafka_connect_jdbc_flatten_ray.stages.plan import build_plan as bp
        import pytest as _pytest

        cfg = SinkConfig(pk_mode="none", insert_mode="insert", delete_enabled=False)
        with _pytest.raises(ValueError, match="STRUCT value schema"):
            bp(cfg, "t", pa.string(), None)


class TestNestedWhitelist:
    def test_nested_path_whitelist(self):
        # JdbcSinkTaskTestPostgresArray.java:897-994 — whitelist
        # 'person, person.record2.record2again' keeps root-level leaves and
        # the deep nested struct's leaves; record2's own leaves are dropped
        sub1 = pa.struct([pa.field("firstname", pa.string())])
        sub2 = pa.struct([pa.field("firstname", pa.string()),
                          pa.field("record2again", sub1)])
        t = pa.struct([pa.field("firstname", pa.string()),
                       pa.field("record2", sub2)])
        cfg = SinkConfig(pk_mode="none", insert_mode="insert", delete_enabled=False,
                         whitelist=("person", "person.record2.record2again"))
        plan = build_plan(cfg, "atopic", t, "com.example.Person")
        assert len(plan.tables) == 1
        names = [c.name for c in plan.tables[0].columns if c.kind == "leaf"]
        assert "person_firstname" in names
        assert "person_record2_record2again_firstname" in names
        # record2's direct leaf pruned
        assert "person_record2_firstname" not in names
