"""Multi-table tail: round-robin task partitioning, per-table checkpoints,
resume across appended data (JdbcSourceConnector_Flatten.java:137-170,
TimestampIncrementingTableQuerier.java:115-146 analogues)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from kafka_connect_jdbc_flatten_ray.sources.multi_tail import (
    MultiTableTail,
    TableSpec,
    round_robin_assignments,
    tail_tables,
)


class TestAssignments:
    def test_round_robin_matches_reference(self):
        specs = [TableSpec(f"t{i}", f"/p{i}", "id") for i in range(5)]
        groups = round_robin_assignments(specs, 2)
        assert [[s.name for s in g] for g in groups] == [
            ["t0", "t2", "t4"], ["t1", "t3"]
        ]

    def test_more_tasks_than_tables(self):
        specs = [TableSpec("a", "/a", "id")]
        groups = round_robin_assignments(specs, 8)
        assert len(groups) == 1 and groups[0][0].name == "a"

    def test_empty(self):
        assert round_robin_assignments([], 4) == []


@pytest.fixture
def two_tables(tmp_path):
    pa_t1 = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                      "x": pa.array(["a", "b", "c"])})
    pa_t2 = pa.table({"seq": pa.array([10, 20], pa.int64()),
                      "y": pa.array([1.0, 2.0])})
    p1, p2 = str(tmp_path / "t1.parquet"), str(tmp_path / "t2.parquet")
    pq.write_table(pa_t1, p1)
    pq.write_table(pa_t2, p2)
    return [TableSpec("t1", p1, "id"), TableSpec("t2", p2, "seq")], tmp_path


class TestTail:
    def test_initial_poll_reads_everything(self, ray_session, two_tables):
        specs, _ = two_tables
        rows = tail_tables(specs, {}, max_tasks=2).take_all()
        got = {(r["table_name"], r["inc_id"]) for r in rows}
        assert got == {("t1", 1), ("t1", 2), ("t1", 3), ("t2", 10), ("t2", 20)}

    def test_offsets_filter_per_table(self, ray_session, two_tables):
        specs, _ = two_tables
        rows = tail_tables(specs, {"t1": 2, "t2": 20}, max_tasks=2).take_all()
        assert {(r["table_name"], r["inc_id"]) for r in rows} == {("t1", 3)}

    def test_poll_commit_resume(self, ray_session, two_tables):
        specs, tmp_path = two_tables
        tail = MultiTableTail(specs, str(tmp_path / "ck"), max_tasks=2)
        assert len(tail.poll().take_all()) == 5
        tail.commit()
        # nothing new
        assert tail.poll().take_all() == []
        # append rows to t1 only; t2 untouched
        pq.write_table(
            pa.table({"id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                      "x": pa.array(["a", "b", "c", "d", "e"])}),
            specs[0].path,
        )
        rows = tail.poll().take_all()
        assert {(r["table_name"], r["inc_id"]) for r in rows} == {("t1", 4), ("t1", 5)}
        tail.commit()
        assert tail.poll().take_all() == []
        # a NEW tail instance resumes from the stored checkpoint (restart)
        tail2 = MultiTableTail(specs, str(tmp_path / "ck"), max_tasks=2)
        assert tail2.poll().take_all() == []
