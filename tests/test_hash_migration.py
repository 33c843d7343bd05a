"""Bucket-hash versioning: hash_version 2 (Arrow-native stable_row_hash)
is the default for new lakes; lakes whose manifests recorded version 1
(legacy pandas hash) keep using it for every later epoch, so each key's
new ops still meet its prior state in the same bucket."""

import numpy as np
import pyarrow as pa

from kafka_connect_jdbc_flatten_ray.functions.hashing import stable_row_hash
from kafka_connect_jdbc_flatten_ray.pipelines import ingest
from kafka_connect_jdbc_flatten_ray.state.manifest import TableManifest


class TestStableRowHash:
    def test_deterministic_and_slice_stable(self):
        t = pa.table({"a": ["x", "y", "x", None], "b": [1, 2, 3, 4]})
        h1 = stable_row_hash(t, ("a", "b"))
        h2 = stable_row_hash(t.slice(1, 2), ("a", "b"))
        np.testing.assert_array_equal(h1[1:3], h2)
        # batch-split independence: hashing rows separately agrees
        h3 = stable_row_hash(t.slice(0, 2), ("a", "b"))
        np.testing.assert_array_equal(h1[:2], h3)

    def test_distinguishes_columns_and_nulls(self):
        t = pa.table({"a": ["x", "y", "x", None], "b": ["y", "x", "x", "x"]})
        h = stable_row_hash(t, ("a", "b"))
        assert len(set(h.tolist())) == 4  # (x,y) != (y,x) != (x,x) != (null,x)

    def test_numeric_types_align_with_lookup(self):
        # writer int32 column vs lookup's python-int int64: same hash
        w = pa.table({"k": pa.array([7, -3], pa.int32())})
        l = pa.table({"k": pa.array([7, -3], pa.int64())})
        np.testing.assert_array_equal(
            stable_row_hash(w, ("k",)), stable_row_hash(l, ("k",))
        )


class TestLakeHashVersioning:
    def test_new_lake_records_v2_and_lookup_prunes(self, ray_session, sf_dir, tmp_path):
        lake = str(tmp_path / "v2")
        ingest.run_epoch(sf_dir, lake)
        m = TableManifest(lake, "cdc_filechange").load()
        assert m["partitioning"]["hash_version"] == 2
        rows = ingest.lake_lookup(
            lake, "cdc_filechange",
            {"filechangekey_repo": "repo_1", "filechangekey_path": "src/doc_1.txt"},
        )
        assert len(rows) == 1 and rows[0]["version"] == 1

    def test_legacy_v1_lake_keeps_v1(self, ray_session, sf_dir, tmp_path):
        """A lake bootstrapped at hash_version=1 must stay v1 for later
        epochs even when the caller passes the default (v2) config, and
        lake_lookup must prune with the pandas hash."""
        lake = str(tmp_path / "v1")
        cfg = ingest.default_config(hash_version=1)
        ingest.run_epoch(sf_dir, lake, cfg=cfg, replicate=1)
        assert TableManifest(lake, "cdc_filechange").load()[
            "partitioning"]["hash_version"] == 1
        # second epoch with DEFAULT config: stored v1 wins
        ingest.run_epoch(sf_dir, lake, replicate=2)
        m = TableManifest(lake, "cdc_filechange").load()
        assert m["partitioning"]["hash_version"] == 1
        # upserts landed on their prior buckets: key count is exact
        n = ingest.read_lake_table(lake, "cdc_filechange").count()
        lake2 = str(tmp_path / "ref")
        ingest.run_epoch(sf_dir, lake2, replicate=2)
        assert n == ingest.read_lake_table(lake2, "cdc_filechange").count()
        rows = ingest.lake_lookup(
            lake, "cdc_filechange",
            {"filechangekey_repo": "repo_1", "filechangekey_path": "src/doc_1.txt"},
        )
        assert len(rows) == 1

    def test_pre_field_manifest_treated_as_v1(self, ray_session, sf_dir, tmp_path):
        """Manifests written before the hash_version field (legacy lakes)
        default to v1 on read."""
        import json

        lake = str(tmp_path / "old")
        cfg = ingest.default_config(hash_version=1)
        ingest.run_epoch(sf_dir, lake, cfg=cfg)
        # strip the field, simulating a round-2 manifest
        for tbl in ("cdc_filechange", "cdc_filechange_lines", "cdc_filechange_attrs"):
            path = f"{lake}/{tbl}/manifest.json"
            m = json.load(open(path))
            m["partitioning"].pop("hash_version")
            json.dump(m, open(path, "w"))
        ingest.run_epoch(sf_dir, lake, replicate=2)
        m = TableManifest(lake, "cdc_filechange").load()
        assert m["partitioning"]["hash_version"] == 1
        assert ingest.read_lake_table(lake, "cdc_filechange").count() > 0
