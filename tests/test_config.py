"""Config validation (JdbcSinkConfig.java:715-776 rules) and passthrough
pk-mode variants."""

import pyarrow as pa
import pytest

from kafka_connect_jdbc_flatten_ray.config import SinkConfig


class TestValidation:
    def test_invalid_insert_mode(self):
        with pytest.raises(ValueError):
            SinkConfig(insert_mode="replace")

    def test_invalid_pk_mode(self):
        with pytest.raises(ValueError):
            SinkConfig(pk_mode="magic")

    def test_delete_requires_key_capable_pk_mode(self):
        with pytest.raises(ValueError):
            SinkConfig(pk_mode="none", delete_enabled=True, insert_mode="upsert")
        SinkConfig(pk_mode="record_key", delete_enabled=True,
                   insert_mode="upsert", pk_fields=("k",))

    def test_coordinate_names_arity(self):
        with pytest.raises(ValueError):
            SinkConfig(coordinate_names=("a", "b"))

    def test_hashable_for_plan_cache(self):
        c = SinkConfig(rename_fields=(("a.b", "c"),), whitelist=("a",),
                       pk_mode="none", delete_enabled=False, insert_mode="insert")
        assert hash(c) == hash(c)


class TestPassthroughPkModes:
    def make_events(self):
        vt = pa.struct([pa.field("id", pa.int64()), pa.field("name", pa.string())])
        kt = pa.struct([pa.field("id", pa.int64())])
        return pa.table(
            {
                "topic": pa.array(["t"] * 4),
                "partition": pa.array([0, 0, 1, 1], pa.int32()),
                "offset": pa.array([0, 1, 0, 1], pa.int64()),
                "timestamp": pa.array([0] * 4, pa.timestamp("ms")),
                "timestamp_type": pa.array(["CreateTime"] * 4),
                "key": pa.array([{"id": 1}, {"id": 1}, {"id": 2}, {"id": 3}], kt),
                "value": pa.array(
                    [{"id": 1, "name": "a"}, {"id": 1, "name": "a2"},
                     {"id": 2, "name": "b"}, {"id": 3, "name": "c"}], vt),
            }
        )

    def test_record_value_pk_upsert(self, ray_session):
        import ray.data

        from kafka_connect_jdbc_flatten_ray.pipelines.passthrough import passthrough_table

        cfg = SinkConfig(flatten=False, pk_mode="record_value", pk_fields=("id",),
                         insert_mode="upsert", delete_enabled=False)
        out = passthrough_table(ray.data.from_arrow(self.make_events()), cfg).take_all()
        by_id = {r["id"]: r["name"] for r in out}
        assert by_id == {1: "a2", 2: "b", 3: "c"}

    def test_kafka_pk_append(self, ray_session):
        import ray.data

        from kafka_connect_jdbc_flatten_ray.pipelines.passthrough import passthrough_table

        cfg = SinkConfig(flatten=False, pk_mode="kafka",
                         insert_mode="insert", delete_enabled=False)
        out = passthrough_table(ray.data.from_arrow(self.make_events()), cfg).take_all()
        assert len(out) == 4
        assert {r["__connect_offset"] for r in out} == {0, 1}

    def test_container_value_rejected(self, ray_session):
        import ray.data

        from kafka_connect_jdbc_flatten_ray.pipelines.passthrough import passthrough_table

        vt = pa.struct([pa.field("nested", pa.struct([pa.field("x", pa.int64())]))])
        t = pa.table(
            {
                "topic": pa.array(["t"]),
                "partition": pa.array([0], pa.int32()),
                "offset": pa.array([0], pa.int64()),
                "timestamp": pa.array([0], pa.timestamp("ms")),
                "timestamp_type": pa.array(["CreateTime"]),
                "value": pa.array([{"nested": {"x": 1}}], vt),
            }
        )
        cfg = SinkConfig(flatten=False, pk_mode="none",
                         insert_mode="insert", delete_enabled=False)
        with pytest.raises(Exception):
            passthrough_table(ray.data.from_arrow(t), cfg).take_all()


class TestUpdateModeAndValidation:
    """insert.mode=update, fields.whitelist, tombstone/validator semantics
    (JdbcSinkConfig.java:48-51,188-196; RecordValidator.java:45-112)."""

    def _events_with_tombstone(self):
        vt = pa.struct([pa.field("id", pa.int64()), pa.field("name", pa.string())])
        kt = pa.struct([pa.field("id", pa.int64())])
        return pa.table(
            {
                "topic": pa.array(["t"] * 3),
                "partition": pa.array([0, 0, 0], pa.int32()),
                "offset": pa.array([0, 1, 2], pa.int64()),
                "timestamp": pa.array([0] * 3, pa.timestamp("ms")),
                "timestamp_type": pa.array(["CreateTime"] * 3),
                "key": pa.array([{"id": 1}, {"id": 2}, {"id": 1}], kt),
                "value": pa.array(
                    [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}, None], vt
                ),
            }
        )

    def test_update_rejected_with_flatten(self):
        with pytest.raises(ValueError, match="Flatten only supports"):
            SinkConfig(flatten=True, insert_mode="update")

    def test_update_requires_pk(self):
        with pytest.raises(ValueError, match="requires a primary key"):
            SinkConfig(flatten=False, pk_mode="none", insert_mode="update",
                       delete_enabled=False)

    def test_tombstone_deletes_key(self, ray_session):
        import ray.data

        from kafka_connect_jdbc_flatten_ray.pipelines.passthrough import passthrough_table

        cfg = SinkConfig(flatten=False, pk_mode="record_key", pk_fields=("id",),
                         insert_mode="upsert", delete_enabled=True)
        out = passthrough_table(
            ray.data.from_arrow(self._events_with_tombstone()), cfg
        ).take_all()
        assert {r["id"] for r in out} == {2}

    def test_tombstone_skipped_when_delete_disabled(self, ray_session):
        import ray.data

        from kafka_connect_jdbc_flatten_ray.pipelines.passthrough import passthrough_table

        cfg = SinkConfig(flatten=False, pk_mode="record_key", pk_fields=("id",),
                         insert_mode="upsert", delete_enabled=False)
        out = passthrough_table(
            ray.data.from_arrow(self._events_with_tombstone()), cfg
        ).take_all()
        assert {r["id"]: r["name"] for r in out} == {1: "a", 2: "b"}

    def test_tombstone_rejected_record_value_mode(self, ray_session):
        import ray.data

        from kafka_connect_jdbc_flatten_ray.pipelines.passthrough import passthrough_table

        cfg = SinkConfig(flatten=False, pk_mode="record_value", pk_fields=("id",),
                         insert_mode="upsert", delete_enabled=False)
        with pytest.raises(Exception, match="non-null Struct value"):
            passthrough_table(
                ray.data.from_arrow(self._events_with_tombstone()), cfg
            ).take_all()

    def test_fields_whitelist_projects(self, ray_session):
        import ray.data

        from kafka_connect_jdbc_flatten_ray.pipelines.passthrough import passthrough_table

        cfg = SinkConfig(flatten=False, pk_mode="record_key", pk_fields=("id",),
                         insert_mode="upsert", delete_enabled=False,
                         fields_whitelist=("name",))
        ev = self._events_with_tombstone()
        out = passthrough_table(ray.data.from_arrow(ev), cfg).take_all()
        assert set(out[0].keys()) == {"id", "name"}

    def test_update_only_touches_existing_keys(self, ray_session):
        import ray.data

        from kafka_connect_jdbc_flatten_ray.pipelines.passthrough import passthrough_table

        vt = pa.struct([pa.field("id", pa.int64()), pa.field("name", pa.string())])
        kt = pa.struct([pa.field("id", pa.int64())])
        events = pa.table(
            {
                "topic": pa.array(["t"] * 3),
                "partition": pa.array([0, 0, 0], pa.int32()),
                "offset": pa.array([0, 1, 2], pa.int64()),
                "timestamp": pa.array([0] * 3, pa.timestamp("ms")),
                "timestamp_type": pa.array(["CreateTime"] * 3),
                "key": pa.array([{"id": 1}, {"id": 1}, {"id": 9}], kt),
                "value": pa.array(
                    [{"id": 1, "name": "first"}, {"id": 1, "name": "second"},
                     {"id": 9, "name": "ghost"}], vt),
            }
        )
        initial = pa.table({"id": pa.array([1, 2], pa.int64()),
                            "name": pa.array(["init1", "init2"])})
        cfg = SinkConfig(flatten=False, pk_mode="record_key", pk_fields=("id",),
                         insert_mode="update", delete_enabled=False)
        out = passthrough_table(
            ray.data.from_arrow(events), cfg,
            initial=ray.data.from_arrow(initial),
        ).take_all()
        got = {r["id"]: r["name"] for r in out}
        # id 1 updated to the latest event, id 2 untouched, id 9 dropped
        assert got == {1: "second", 2: "init2"}

    def test_update_requires_initial(self, ray_session):
        import ray.data

        from kafka_connect_jdbc_flatten_ray.pipelines.passthrough import passthrough_table

        cfg = SinkConfig(flatten=False, pk_mode="record_key", pk_fields=("id",),
                         insert_mode="update", delete_enabled=False)
        with pytest.raises(ValueError, match="initial table state"):
            passthrough_table(
                ray.data.from_arrow(self._events_with_tombstone()), cfg
            )


class TestTableNameFormat:
    def test_format_expansion_and_error(self):
        from kafka_connect_jdbc_flatten_ray.functions.naming import destination_table

        cfg = SinkConfig(flatten=False, pk_mode="none", insert_mode="insert",
                         delete_enabled=False, table_name_format="kafka_${topic}_v1")
        assert destination_table(cfg, "orders") == "kafka_orders_v1"
        up = SinkConfig(flatten=False, pk_mode="none", insert_mode="insert",
                        delete_enabled=False, uppercase=True)
        assert destination_table(up, "orders") == "ORDERS"
        bad = SinkConfig(flatten=False, pk_mode="none", insert_mode="insert",
                         delete_enabled=False, table_name_format="")
        with pytest.raises(ValueError, match="is empty using the format"):
            destination_table(bad, "orders")

    def test_passthrough_to_lake_writes_named_table(self, ray_session, tmp_path):
        import os

        import ray.data

        from kafka_connect_jdbc_flatten_ray.pipelines.passthrough import (
            passthrough_to_lake,
        )

        vt = pa.struct([pa.field("id", pa.int64()), pa.field("v", pa.string())])
        kt = pa.struct([pa.field("id", pa.int64())])
        events = pa.table({
            "topic": pa.array(["orders"] * 2),
            "partition": pa.array([0, 0], pa.int32()),
            "offset": pa.array([0, 1], pa.int64()),
            "timestamp": pa.array([0, 0], pa.timestamp("ms")),
            "timestamp_type": pa.array(["CreateTime"] * 2),
            "key": pa.array([{"id": 1}, {"id": 1}], kt),
            "value": pa.array([{"id": 1, "v": "a"}, {"id": 1, "v": "b"}], vt),
        })
        cfg = SinkConfig(flatten=False, pk_mode="record_key", pk_fields=("id",),
                         insert_mode="upsert", delete_enabled=False,
                         table_name_format="sink_${topic}")
        name, manifest = passthrough_to_lake(
            ray.data.from_arrow(events), cfg, str(tmp_path), topic="orders")
        assert name == "sink_orders"
        assert manifest["rows"] == 1
        assert os.path.isdir(os.path.join(tmp_path, "sink_orders", "data"))
