"""Join operators: broadcast lookup, and the union+groupby semi-join that
replaces Ray's native hash join inside composed DAGs (the native operator
deadlocks when composed with actor pools under tight CPU budgets)."""

import numpy as np
import pyarrow as pa
import ray.data

from kafka_connect_jdbc_flatten_ray.stages.joins import semi_join_ids


def _large(n=200):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array([f"t{i}" for i in range(n)]),
        "score": pa.array(np.arange(n, dtype=np.float64) / 7),
    }))


class TestSemiJoinIds:
    def test_filters_and_preserves_schema(self, ray_session):
        ids = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([3, 7, 199, 42], pa.int64()),
        }))
        out = semi_join_ids(_large(), ids).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)
        assert list(out["doc_id"]) == [3, 7, 42, 199]
        assert list(out.columns) == ["doc_id", "text", "score"]
        assert out.loc[0, "text"] == "t3"
        assert out.loc[3, "score"] == 199 / 7

    def test_unknown_and_duplicate_ids(self, ray_session):
        ids = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([5, 5, 5, 10_000], pa.int64()),
        }))
        out = semi_join_ids(_large(), ids).to_pandas()
        # duplicates in the id set must not duplicate output rows;
        # ids absent from the large side are ignored
        assert list(out["doc_id"]) == [5]

    def test_empty_id_set(self, ray_session):
        ids = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
        }))
        assert semi_join_ids(_large(), ids).count() == 0
