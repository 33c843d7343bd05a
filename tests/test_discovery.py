"""S6 dynamic table discovery tests (TableMonitorThread.java:40-186)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_connect_jdbc_flatten_ray.sources.discovery import (
    TableMonitor,
    discover_tables,
)


def _mk(path, n=3):
    pq.write_table(pa.table({"id": list(range(n))}), str(path))


class TestDiscovery:
    def test_finds_files_and_dirs(self, tmp_path):
        _mk(tmp_path / "events.parquet")
        (tmp_path / "orders").mkdir()
        _mk(tmp_path / "orders" / "part-0.parquet")
        (tmp_path / "_checkpoints").mkdir()  # internal dirs ignored
        got = discover_tables(str(tmp_path))
        assert set(got) == {"events", "orders"}

    def test_duplicate_unqualified_names_raise(self, tmp_path):
        _mk(tmp_path / "events.parquet")
        (tmp_path / "events").mkdir()
        _mk(tmp_path / "events" / "part-0.parquet")
        with pytest.raises(ValueError, match="duplicate unqualified"):
            discover_tables(str(tmp_path))

    def test_monitor_delta_and_reconfiguration_signal(self, tmp_path):
        _mk(tmp_path / "a.parquet")
        mon = TableMonitor(str(tmp_path))
        first = mon.poll()
        assert first["changed"] and first["added"] == ["a"]
        assert not mon.poll()["changed"]  # steady state
        _mk(tmp_path / "b.parquet")
        tick = mon.poll()
        assert tick["changed"] and tick["added"] == ["b"]
        (tmp_path / "a.parquet").unlink()
        tick = mon.poll()
        assert tick["removed"] == ["a"] and set(tick["tables"]) == {"b"}

    def test_whitelist_blacklist(self, tmp_path):
        for n in ("a", "b", "c"):
            _mk(tmp_path / f"{n}.parquet")
        assert set(TableMonitor(str(tmp_path), whitelist=("a", "B")).poll()["tables"]) == {"a", "b"}
        assert set(TableMonitor(str(tmp_path), blacklist=("c",)).poll()["tables"]) == {"a", "b"}
        with pytest.raises(ValueError, match="not both"):
            TableMonitor(str(tmp_path), whitelist=("a",), blacklist=("b",))

    def test_discovered_tables_feed_multi_tail(self, ray_session, tmp_path):
        """End-to-end: discovery output drives a MultiTableTail respec —
        the task-reconfiguration analogue."""
        from kafka_connect_jdbc_flatten_ray.sources.multi_tail import (
            MultiTableTail,
            TableSpec,
        )

        _mk(tmp_path / "t1.parquet", 3)
        mon = TableMonitor(str(tmp_path), blacklist=("ck",))
        tick = mon.poll()
        specs = [TableSpec(n, p, "id") for n, p in tick["tables"].items()]
        tail = MultiTableTail(specs, str(tmp_path / "_ck"))
        assert len(tail.poll().take_all()) == 3
        tail.commit()
        _mk(tmp_path / "t2.parquet", 2)  # table appears between polls
        tick = mon.poll()
        assert tick["added"] == ["t2"]
        specs = [TableSpec(n, p, "id") for n, p in tick["tables"].items()]
        tail = MultiTableTail(specs, str(tmp_path / "_ck"))
        rows = tail.poll().take_all()
        assert {(r["table_name"], r["inc_id"]) for r in rows} == {("t2", 0), ("t2", 1)}
