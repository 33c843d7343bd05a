"""State layer tests: checkpoints (ST5), manifests (ST4), plan cache (ST1)."""

import json
import os

import pyarrow as pa

from kafka_connect_jdbc_flatten_ray.config import SinkConfig
from kafka_connect_jdbc_flatten_ray.sources.cdc_gen import (
    KEY_SCHEMA_NAME,
    TOPIC,
    VALUE_SCHEMA_NAME,
)
from kafka_connect_jdbc_flatten_ray.stages.flatten_stage import FlattenStage
from kafka_connect_jdbc_flatten_ray.state.checkpoints import CheckpointStore
from kafka_connect_jdbc_flatten_ray.state.manifest import TableManifest


class TestCheckpoints:
    def test_roundtrip_and_latest(self, tmp_path):
        ck = CheckpointStore(str(tmp_path))
        assert ck.latest_epoch() is None
        assert ck.load() == {}
        ck.save(0, {0: 10, 1: 20})
        ck.save(1, {0: 15, 1: 20, 2: 5}, metrics={"rows": 100})
        assert ck.latest_epoch() == 1
        assert ck.load() == {0: 15, 1: 20, 2: 5}
        assert ck.load(0) == {0: 10, 1: 20}

    def test_atomic_write_no_tmp_left(self, tmp_path):
        ck = CheckpointStore(str(tmp_path))
        ck.save(0, {0: 1})
        assert not [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]

    def test_v0_protocol_restore(self, tmp_path):
        # a bare {partition: offset} file (the V0 protocol analogue,
        # OffsetProtocols.java:37-59) restores identically to V1
        ck = CheckpointStore(str(tmp_path))
        with open(os.path.join(tmp_path, "checkpoint-000000.json"), "w") as f:
            json.dump({"0": 10, "3": 7}, f)
        assert ck.load() == {0: 10, 3: 7}


class TestManifest:
    def test_publish_merges_buckets_and_keeps_lineage(self, tmp_path):
        m = TableManifest(str(tmp_path), "t1")
        assert m.load() is None and m.current_files() == {}
        m.publish(0, {0: "a0", 1: "b0"}, {"rows_out": 10})
        m.publish(1, {1: "b1"}, {"rows_out": 12})  # bucket 0 untouched
        files = m.current_files()
        assert files == {0: "a0", 1: "b1"}
        doc = m.load()
        assert [e["epoch"] for e in doc["epochs"]] == [0, 1]
        assert doc["epochs"][1]["rows_out"] == 12


class TestPlanCache:
    def _batch(self, vtype):
        return pa.table(
            {
                "topic": pa.array(["cdc"]),
                "partition": pa.array([0], pa.int32()),
                "offset": pa.array([0], pa.int64()),
                "timestamp": pa.array([0], pa.timestamp("ms")),
                "timestamp_type": pa.array(["CreateTime"]),
                "key": pa.array([{"repo": "r", "path": "p"}],
                                pa.struct([pa.field("repo", pa.string()),
                                           pa.field("path", pa.string())])),
                "value": pa.array([{"x": "1"}], vtype),
            }
        )

    def test_lru_eviction(self):
        cfg = SinkConfig(pk_fields=("filechangekey.repo",), instruction_cache_size=2)
        st = FlattenStage(cfg, TOPIC, VALUE_SCHEMA_NAME, KEY_SCHEMA_NAME)
        types = [
            pa.struct([pa.field("x", pa.string())]),
            pa.struct([pa.field("x", pa.string()), pa.field("y", pa.int32())]),
            pa.struct([pa.field("x", pa.string()), pa.field("z", pa.int64())]),
        ]
        for t in types:
            st(self._batch(t))
        assert len(st._plans) == 2  # LRU capped (ST1, cache size config)
        # re-running a cached schema reuses the plan object
        before = list(st._plans.values())[-1]
        st(self._batch(types[-1]))
        assert list(st._plans.values())[-1] is before
