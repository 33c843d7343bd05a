"""Schema evolution (W5) e2e: new nested paths become new flat columns;
old rows read back with nulls (the ALTER TABLE ADD COLUMN analogue,
DbStructure.java:127-234). Exercises mixed schema generations in ONE
stream — the per-actor plan cache keys on schema fingerprint (ST1)."""

import pyarrow as pa
import pytest
import ray.data

from kafka_connect_jdbc_flatten_ray.config import SinkConfig
from kafka_connect_jdbc_flatten_ray.pipelines import ingest


KEY = pa.struct([pa.field("id", pa.int64())])
V1 = pa.struct([pa.field("name", pa.string()), pa.field("size", pa.int64())])
V2 = pa.struct(
    [
        pa.field("name", pa.string()),
        pa.field("size", pa.int64()),
        pa.field("branch", pa.string()),  # evolved: new leaf
        pa.field("tags", pa.list_(pa.string())),  # evolved: new child table
    ]
)


def events_table(value_type, rows, keys, offsets):
    n = len(rows)
    return pa.table(
        {
            "topic": pa.array(["t"] * n),
            "partition": pa.array([0] * n, pa.int32()),
            "offset": pa.array(offsets, pa.int64()),
            "timestamp": pa.array([1_600_000_000_000] * n, pa.timestamp("ms")),
            "timestamp_type": pa.array(["CreateTime"] * n),
            "key": pa.array(keys, KEY),
            "value": pa.array(rows, value_type),
        }
    )


@pytest.fixture
def cfg():
    return SinkConfig(
        pk_mode="flatten", pk_fields=("filekey.id",), insert_mode="upsert",
        delete_enabled=True,
    )


class TestEvolution:
    def test_new_columns_appear_old_rows_null(self, ray_session, cfg):
        t1 = events_table(
            V1,
            [{"name": "a", "size": 1}, {"name": "b", "size": 2}],
            [{"id": 1}, {"id": 2}],
            [0, 1],
        )
        t2 = events_table(
            V2,
            [{"name": "c2", "size": 30, "branch": "main", "tags": ["x", "y"]}],
            [{"id": 3}],
            [2],
        )
        ds = ray.data.from_arrow([t1, t2])
        env = ingest.flatten_envelopes(
            ds, cfg, topic="t", value_schema_name="com.example.File",
            key_schema_name="com.example.FileKey",
        )
        # plan of the EVOLVED schema defines the table set
        from kafka_connect_jdbc_flatten_ray.stages.plan import build_plan

        plan2 = build_plan(cfg, "t", V2, "com.example.File", KEY, "com.example.FileKey")
        root = ingest.table_state(env, plan2, "t_file").take_all()
        by_id = {r["filekey_id"]: r for r in sorted(root, key=lambda r: r["filekey_id"])}
        assert set(by_id) == {1, 2, 3}
        assert by_id[1]["branch"] is None  # old generation -> null in new col
        assert by_id[3]["branch"] == "main"
        tags = ingest.table_state(env, plan2, "t_file_tags").take_all()
        assert sorted(r["tags"] for r in tags) == ["x", "y"]

    def test_lake_evolution_across_epochs(self, ray_session, cfg, tmp_path):
        # epoch 0: generation-1 schema; epoch 1: a new replica arrives with
        # evolved events -> the lake table gains the 'branch' column, old
        # rows read back as null (prior bucket files merged with promotion)
        from kafka_connect_jdbc_flatten_ray.pipelines import ingest

        sf = "/root/testdata/sf0.001"
        lake = str(tmp_path / "lake_evo")
        ingest.run_epoch(sf, lake, replicate=1)
        ingest.run_epoch(sf, lake, replicate=2, evolve_from=1)
        ds = ingest.read_lake_table(lake, "cdc_filechange")
        names = ds.schema().names
        assert "branch" in names
        rows = ds.take_all()
        old = [r for r in rows if "doc_0." in r["filechangekey_path"]
               or int(r["filechangekey_path"].split("doc_")[1].split(".")[0]) < 10_000_000]
        new = [r for r in rows
               if int(r["filechangekey_path"].split("doc_")[1].split(".")[0]) >= 10_000_000]
        assert new, "evolved replica missing"
        # evolved rows with version >= 1 carry branch='main'
        assert all(r["branch"] == "main" for r in new if r["version"] >= 1)
        assert all(r["branch"] is None for r in old if r["version"] == 0)

    def test_upsert_across_generations(self, ray_session, cfg):
        # same key written in v1 then upserted with v2 -> v2 row wins
        t1 = events_table(V1, [{"name": "a", "size": 1}], [{"id": 1}], [0])
        t2 = events_table(
            V2, [{"name": "a2", "size": 10, "branch": "dev", "tags": []}],
            [{"id": 1}], [1],
        )
        ds = ray.data.from_arrow([t1, t2])
        env = ingest.flatten_envelopes(
            ds, cfg, topic="t", value_schema_name="com.example.File",
            key_schema_name="com.example.FileKey",
        )
        from kafka_connect_jdbc_flatten_ray.stages.plan import build_plan

        plan2 = build_plan(cfg, "t", V2, "com.example.File", KEY, "com.example.FileKey")
        root = ingest.table_state(env, plan2, "t_file").take_all()
        assert len(root) == 1
        assert root[0]["name"] == "a2" and root[0]["branch"] == "dev"
