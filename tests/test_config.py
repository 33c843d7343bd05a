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
