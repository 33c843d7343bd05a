"""More parity/robustness scenarios: map-key coercion, custom delimiter,
hot-key skew, query-path vs lake-path consistency."""

import time

import numpy as np
import pyarrow as pa

from kafka_connect_jdbc_flatten_ray.config import SinkConfig
from kafka_connect_jdbc_flatten_ray.stages.kernel import flatten_event_batch
from kafka_connect_jdbc_flatten_ray.stages.merge import final_columns, last_wins
from kafka_connect_jdbc_flatten_ray.stages.plan import build_plan


def cfg(**kw):
    base = dict(pk_mode="none", pk_fields=(), insert_mode="insert", delete_enabled=False)
    base.update(kw)
    return SinkConfig(**base)


def batch_of(values, value_type, offsets=None, parts=None):
    n = len(values)
    return pa.table(
        {
            "topic": pa.array(["atopic"] * n),
            "partition": pa.array(parts or [0] * n, pa.int32()),
            "offset": pa.array(offsets or list(range(n)), pa.int64()),
            "timestamp": pa.array([0] * n, pa.timestamp("ms")),
            "timestamp_type": pa.array(["CreateTime"] * n),
            "value": pa.array(values, value_type),
        }
    )


class TestMapKeyCoercion:
    def test_int_map_keys_become_strings(self):
        # FlattenTransformation.java:466-469 e.getKey().toString()
        t = pa.struct([pa.field("scores", pa.map_(pa.int32(), pa.string()))])
        c = cfg()
        plan = build_plan(c, "atopic", t, "com.example.Person")
        child = next(tp for tp in plan.tables if tp.table == "atopic_person_scores")
        out = flatten_event_batch(plan, c, batch_of(
            [{"scores": [(7, "seven"), (42, "forty-two")]}], t))
        rows = [r for r in out["atopic_person_scores"].to_pylist() if r["__op"] == "I"]
        assert {(r["person_scores_key"], r["scores"]) for r in rows} == {
            ("7", "seven"), ("42", "forty-two"),
        }
        key_col = next(cc for cc in child.columns if cc.name == "person_scores_key")
        assert key_col.dtype == pa.string()


class TestCustomDelimiter:
    def test_double_underscore_delimiter(self):
        sub = pa.struct([pa.field("firstname", pa.string())])
        t = pa.struct([pa.field("firstname", pa.string()), pa.field("rec", sub)])
        c = cfg(delimiter="__")
        plan = build_plan(c, "a.topic", t, "com.example.Person")
        assert plan.tables[0].table == "a__topic__person"
        names = [cc.name for cc in plan.tables[0].columns if cc.kind == "leaf"]
        assert "person__firstname" in names
        assert "person__rec__firstname" in names


class TestHotKeySkew:
    def test_hot_key_merge_bounded(self):
        # 100k upsert versions of ONE key: the merge must stay fast and the
        # final state must be just the last version's rows (per-key state is
        # bounded by the semantics — see SCALE.md skew section)
        n = 100_000
        t = pa.struct([pa.field("v", pa.int64())])
        c = cfg(pk_mode="flatten", pk_fields=("hotkey.id",),
                insert_mode="upsert", delete_enabled=True)
        key_t = pa.struct([pa.field("id", pa.int64())])
        plan = build_plan(c, "atopic", t, "com.example.Hot", key_t, "com.example.HotKey")
        b = pa.table(
            {
                "topic": pa.array(["atopic"] * n),
                "partition": pa.array([0] * n, pa.int32()),
                "offset": pa.array(np.arange(n), pa.int64()),
                "timestamp": pa.array([0] * n, pa.timestamp("ms")),
                "timestamp_type": pa.array(["CreateTime"] * n),
                "key": pa.array([{"id": 1}] * n, key_t),
                "value": pa.array([{"v": i} for i in range(n)], t),
            }
        )
        t0 = time.perf_counter()
        out = flatten_event_batch(plan, c, b)
        tp = plan.tables[0]
        merged = final_columns(last_wins(out[tp.table], tp.key_pk_cols))
        dt = time.perf_counter() - t0
        assert merged.num_rows == 1
        assert merged.column("v").to_pylist() == [n - 1]
        assert dt < 20.0, f"hot-key merge took {dt:.1f}s"  # noise-tolerant bound


class TestOutOfOrderDelivery:
    def test_shuffled_stream_same_final_state(self, ray_session, sf_dir):
        # events delivered in random order across blocks must merge to the
        # same final state — the replay rule depends only on (partition,
        # offset) ranks, never on arrival order (ST3 analogue)
        from kafka_connect_jdbc_flatten_ray.functions.hashing import dataset_digest
        from kafka_connect_jdbc_flatten_ray.pipelines import ingest

        cfg_ = ingest.default_config()
        plan = ingest.default_plan(cfg_)
        env1 = ingest.flatten_envelopes(ingest.event_stream(sf_dir), cfg_)
        d1 = dataset_digest(ingest.table_state(env1, plan, "cdc_filechange_lines"))
        shuffled = ingest.event_stream(sf_dir).random_shuffle(seed=7)
        env2 = ingest.flatten_envelopes(shuffled, cfg_)
        d2 = dataset_digest(ingest.table_state(env2, plan, "cdc_filechange_lines"))
        assert d1 == d2


class TestPathConsistency:
    def test_query_path_equals_lake_path(self, ray_session, sf_dir, tmp_path):
        from kafka_connect_jdbc_flatten_ray.functions.hashing import dataset_digest
        from kafka_connect_jdbc_flatten_ray.pipelines import ingest

        lake = str(tmp_path / "lake")
        ingest.run_epoch(sf_dir, lake)
        lake_digest = dataset_digest(ingest.read_lake_table(lake, "cdc_filechange"))

        cfg_ = ingest.default_config()
        plan = ingest.default_plan(cfg_)
        env = ingest.flatten_envelopes(ingest.event_stream(sf_dir), cfg_)
        query_digest = dataset_digest(ingest.table_state(env, plan, "cdc_filechange"))
        assert lake_digest == query_digest
