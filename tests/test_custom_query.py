"""S5 custom-query source tests (JdbcSourceTask.java:102-111 query mode)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_connect_jdbc_flatten_ray.sources.custom_query import (
    source_query,
    source_query_incrementing,
)


@pytest.fixture
def qdir(tmp_path):
    pq.write_table(
        pa.table({"id": [1, 2, 3, 4], "grp": ["a", "a", "b", "b"],
                  "v": [10.0, 20.0, 30.0, 40.0]}),
        str(tmp_path / "facts.parquet"),
    )
    return str(tmp_path)


class TestCustomQuery:
    def test_arbitrary_sql(self, ray_session, qdir):
        out = source_query(
            "SELECT grp, CAST(SUM(v) AS BIGINT) AS total FROM facts GROUP BY grp",
            qdir,
        ).take_all()
        assert {(r["grp"], r["total"]) for r in out} == {("a", 30), ("b", 70)}

    def test_incrementing_criterion_wraps_query(self, ray_session, qdir):
        out = source_query_incrementing(
            "SELECT id, v FROM facts", qdir, "id", offset=2
        ).take_all()
        assert [r["id"] for r in out] == [3, 4]

    def test_empty_result_keeps_schema(self, ray_session, qdir):
        ds = source_query_incrementing("SELECT id, v FROM facts", qdir, "id", 99)
        assert ds.take_all() == []
        assert set(ds.schema().names) == {"id", "v"}

    def test_streams_blocks_not_one_blob(self, ray_session, qdir):
        # small batch_size -> multiple object-store blocks
        ds = source_query("SELECT * FROM facts", qdir, batch_size=1)
        assert ds.num_blocks() >= 4
