"""Hot-key skew evidence: the within-batch combiner (local_prereduce) and
last-wins semantics bound a hot key's contribution to the merge exchange
at O(final state per batch), not O(updates) — the SCALE.md skew claim,
asserted here rather than just stated."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from kafka_connect_jdbc_flatten_ray.config import SinkConfig
from kafka_connect_jdbc_flatten_ray.pipelines.ingest import (
    flatten_envelopes,
    table_state,
)
from kafka_connect_jdbc_flatten_ray.stages.plan import build_plan

VT = pa.struct([
    pa.field("repo", pa.string()),
    pa.field("path", pa.string()),
    pa.field("version", pa.int32()),
])
KT = pa.struct([pa.field("repo", pa.string()), pa.field("path", pa.string())])


def _hot_key_events(n_updates: int) -> pa.Table:
    """n_updates upsert events, ALL for one (repo, path) key."""
    v = np.arange(n_updates, dtype=np.int32)
    return pa.table(
        {
            "topic": pa.array(["t"] * n_updates),
            "partition": pa.array(np.zeros(n_updates, np.int32)),
            "offset": pa.array(np.arange(n_updates, dtype=np.int64)),
            "timestamp": pa.array(np.arange(n_updates, dtype=np.int64)).cast(
                pa.timestamp("ms")),
            "timestamp_type": pa.array(["CreateTime"] * n_updates),
            "key": pa.array([{"repo": "hot", "path": "p"}] * n_updates, KT),
            "value": pa.array(
                [{"repo": "hot", "path": "p", "version": int(i)} for i in v], VT),
        }
    )


class TestHotKeyBoundedExchange:
    def test_combiner_collapses_hot_key(self, ray_session):
        n = 50_000
        cfg = SinkConfig(pk_mode="flatten", pk_fields=("key.repo", "key.path"),
                         insert_mode="upsert", delete_enabled=True)
        events = ray.data.from_arrow(_hot_key_events(n))
        env = flatten_envelopes(
            events, cfg, topic="t", value_schema_name="change",
            key_schema_name="key",
        )
        rows_per_envelope = [r["rows"] for r in env.take_all()]
        # 50k same-key upserts collapse to O(batches) exchange rows — the
        # max clear + its surviving data row per batch, NOT O(n) rows
        assert sum(rows_per_envelope) <= 4 * len(rows_per_envelope)
        # and the merged state is exactly the last version
        plan = build_plan(cfg, "t", VT, "change", KT, "key")
        final = table_state(env, plan, "t_change").take_all()
        assert len(final) == 1 and final[0]["version"] == n - 1
