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


class TestMixedVersionLake:
    def test_table_added_post_upgrade_mixes_versions(
        self, ray_session, sf_dir, tmp_path
    ):
        """A partially migrated lake legitimately mixes hash versions:
        tables bootstrapped at v1 stay v1, while a table (re)created
        after the upgrade records v2 — and neither duplicates keys on
        later upserts (each table probes prior state with ITS OWN hash,
        never a forced global minimum). Pins ingest.py's per-table
        hash_version resolution."""
        import shutil

        lake = str(tmp_path / "mixed")
        cfg = ingest.default_config(hash_version=1)
        ingest.run_epoch(sf_dir, lake, cfg=cfg, replicate=1)
        # simulate "table added post-upgrade": the lines table did not
        # exist before the engine default moved to v2
        shutil.rmtree(f"{lake}/cdc_filechange_lines")
        ingest.run_epoch(sf_dir, lake, replicate=2)  # default cfg (v2)
        root_v = TableManifest(lake, "cdc_filechange").load()[
            "partitioning"]["hash_version"]
        lines_v = TableManifest(lake, "cdc_filechange_lines").load()[
            "partitioning"]["hash_version"]
        assert (root_v, lines_v) == (1, 2)
        # a further epoch keeps each table on its own version
        ingest.run_epoch(sf_dir, lake, replicate=2)
        assert TableManifest(lake, "cdc_filechange").load()[
            "partitioning"]["hash_version"] == 1
        assert TableManifest(lake, "cdc_filechange_lines").load()[
            "partitioning"]["hash_version"] == 2
        # upserts met their prior buckets: full-history tables equal a
        # fresh single-version lake's end state (no duplicated keys)
        ref = str(tmp_path / "ref")
        ingest.run_epoch(sf_dir, ref, replicate=2)
        for tbl in ("cdc_filechange", "cdc_filechange_attrs"):
            assert (ingest.read_lake_table(lake, tbl).count()
                    == ingest.read_lake_table(ref, tbl).count()), tbl
        # the recreated table holds only post-recreation keys (checkpoints
        # skip replayed events) — the v1/v2 hazard would be the SAME key
        # surviving in two buckets, so assert (key, lineno) uniqueness
        lines = ingest.read_lake_table(lake, "cdc_filechange_lines") \
            .to_pandas()
        pk = ["filechangekey_repo", "filechangekey_path", "lineno"]
        assert len(lines) == len(lines.drop_duplicates(pk))
        assert 0 < len(lines) <= ingest.read_lake_table(
            ref, "cdc_filechange_lines").count()
        rows = ingest.lake_lookup(
            lake, "cdc_filechange",
            {"filechangekey_repo": "repo_1",
             "filechangekey_path": "src/doc_1.txt"},
        )
        assert len(rows) == 1
