"""Filesystem abstraction tests: lake/state over pyarrow.fs backends —
mock object store for state primitives, file:// URI end-to-end epoch."""

import pyarrow.fs as pafs
import pytest

from kafka_connect_jdbc_flatten_ray.state import fs as fsx
from kafka_connect_jdbc_flatten_ray.state.checkpoints import CheckpointStore
from kafka_connect_jdbc_flatten_ray.state.manifest import TableManifest


class TestStateOverMockObjectStore:
    def test_checkpoints_roundtrip(self):
        mock = pafs._MockFileSystem()
        ck = CheckpointStore("lake/_ck", filesystem=mock)
        assert ck.latest_epoch() is None and ck.load() == {}
        ck.save(0, {0: 10, 3: 7})
        ck.save(1, {0: 25, 3: 7})
        assert ck.latest_epoch() == 1
        assert ck.load() == {0: 25, 3: 7}
        assert ck.load(0) == {0: 10, 3: 7}

    def test_manifest_swap(self):
        mock = pafs._MockFileSystem()
        m = TableManifest("lake", "t1", filesystem=mock)
        assert m.load() is None
        m.publish(0, {0: "lake/t1/bucket=00000/epoch-000000.parquet"},
                  {"rows_out": 5}, partitioning={"num_buckets": 4,
                                                 "key_pk_cols": ["k"]})
        m.publish(1, {1: "lake/t1/bucket=00001/epoch-000001.parquet"}, {})
        cur = m.current_files()
        assert set(cur) == {0, 1}  # untouched bucket survives the swap
        assert m.load()["partitioning"]["num_buckets"] == 4

    def test_staging_path_modes(self):
        local = pafs.LocalFileSystem()
        mock = pafs._MockFileSystem()

        class FakeS3(pafs.PyFileSystem):
            pass

        assert fsx.staging_path(local, "/a/b").endswith(".tmp")
        # the mock fs supports rename, so it stages like local
        assert fsx.staging_path(mock, "a/b").endswith(".tmp")


class TestLakeOverFileUri:
    def test_epoch_resume_and_vacuum_via_uri(self, ray_session, sf_dir, tmp_path):
        """Full ingest epochs against a file:// URI lake root — exercises
        every fs-abstracted touch point (merge writes, manifest, checkpoint,
        read_lake_table, lake_lookup, vacuum)."""
        from kafka_connect_jdbc_flatten_ray.pipelines import ingest

        lake_uri = f"file://{tmp_path}/lake_uri"
        r0 = ingest.run_epoch(sf_dir, lake_uri)
        assert r0["epoch"] == 0
        # resume: nothing new -> same final state, epoch increments
        r1 = ingest.run_epoch(sf_dir, lake_uri)
        assert r1["epoch"] == 1
        ds = ingest.read_lake_table(lake_uri, "cdc_filechange")
        assert ds.count() == 428  # final upsert state at sf0.001
        rows = ingest.lake_lookup(
            lake_uri, "cdc_filechange",
            {"filechangekey_repo": "repo_1", "filechangekey_path": "src/doc_1.txt"},
        )
        assert len(rows) == 1
        removed = ingest.vacuum(lake_uri, keep_epochs=1)
        assert sum(removed.values()) >= 0  # runs without error over the URI
        assert ingest.read_lake_table(lake_uri, "cdc_filechange").count() == 428
