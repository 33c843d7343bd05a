"""Lake maintenance (vacuum, status) and the insert+tombstone-in-one-batch
netting scenario (JdbcSinkTaskTestPostgresArrayDelete.java:993-1083)."""

import os

import pyarrow as pa
import pytest

from kafka_connect_jdbc_flatten_ray.config import SinkConfig
from kafka_connect_jdbc_flatten_ray.pipelines import ingest
from kafka_connect_jdbc_flatten_ray.stages.kernel import flatten_event_batch
from kafka_connect_jdbc_flatten_ray.stages.merge import final_columns, last_wins
from kafka_connect_jdbc_flatten_ray.stages.plan import build_plan


class TestInsertTombstoneSameBatch:
    def test_nets_to_zero(self):
        # insert for key then tombstone for same key in ONE batch -> 0 rows
        cfg = SinkConfig(pk_mode="flatten", pk_fields=("root.key",),
                         insert_mode="upsert", delete_enabled=True)
        vt = pa.struct([pa.field("v", pa.string())])
        plan = build_plan(cfg, "atopic", vt, None, pa.string(), None)
        batch = pa.table(
            {
                "topic": pa.array(["atopic"] * 2),
                "partition": pa.array([0, 0], pa.int32()),
                "offset": pa.array([5, 6], pa.int64()),
                "timestamp": pa.array([0, 0], pa.timestamp("ms")),
                "timestamp_type": pa.array(["CreateTime"] * 2),
                "key": pa.array(["k1", "k1"], pa.string()),
                "value": pa.array([{"v": "x"}, None], vt),
            }
        )
        out = flatten_event_batch(plan, cfg, batch)
        tp = plan.tables[0]
        assert final_columns(last_wins(out[tp.table], tp.key_pk_cols)).num_rows == 0

    def test_tombstone_then_reinsert_survives(self):
        cfg = SinkConfig(pk_mode="flatten", pk_fields=("root.key",),
                         insert_mode="upsert", delete_enabled=True)
        vt = pa.struct([pa.field("v", pa.string())])
        plan = build_plan(cfg, "atopic", vt, None, pa.string(), None)
        batch = pa.table(
            {
                "topic": pa.array(["atopic"] * 3),
                "partition": pa.array([0] * 3, pa.int32()),
                "offset": pa.array([5, 6, 7], pa.int64()),
                "timestamp": pa.array([0] * 3, pa.timestamp("ms")),
                "timestamp_type": pa.array(["CreateTime"] * 3),
                "key": pa.array(["k1"] * 3, pa.string()),
                "value": pa.array([{"v": "old"}, None, {"v": "new"}], vt),
            }
        )
        out = flatten_event_batch(plan, cfg, batch)
        tp = plan.tables[0]
        rows = final_columns(last_wins(out[tp.table], tp.key_pk_cols)).to_pylist()
        assert [r["v"] for r in rows] == ["new"]


class TestVacuumAndStatus:
    def test_vacuum_keeps_referenced_and_recent(self, ray_session, sf_dir, tmp_path):
        lake = str(tmp_path / "lake")
        for _ in range(3):
            # wipe checkpoints so each run re-replays -> rewrites every bucket
            ingest.run_epoch(sf_dir, lake)
            import shutil

            shutil.rmtree(f"{lake}/_checkpoints", ignore_errors=True)
        status = ingest.lake_status(lake)
        # checkpoint wiped, but the manifest still advances the epoch counter
        # (epochs are allocated from max(checkpoint, manifest)+1 so that
        # compaction epochs are never reused by a later ingest)
        assert status["cdc_filechange"]["epoch"] == 2
        removed = ingest.vacuum(lake, keep_epochs=3)
        # all three epochs retained and the newest referenced -> nothing removed
        assert all(v == 0 for v in removed.values())

    def test_vacuum_removes_old_epochs(self, ray_session, sf_dir, tmp_path):
        lake = str(tmp_path / "lake")
        ingest.run_epoch(sf_dir, lake)  # epoch 0
        ingest.run_epoch(sf_dir, lake, replicate=1)  # epoch 1 (no new events -> no rewrite)
        # force an epoch-2 rewrite of every bucket by replaying the log
        import shutil

        ckdir = f"{lake}/_checkpoints"
        shutil.rmtree(ckdir)
        os.makedirs(ckdir)
        from kafka_connect_jdbc_flatten_ray.state.checkpoints import CheckpointStore

        CheckpointStore(ckdir).save(1, {})  # empty offsets, next epoch = 2
        ingest.run_epoch(sf_dir, lake)
        status = ingest.lake_status(lake)
        assert status["cdc_filechange"]["epoch"] == 2
        removed = ingest.vacuum(lake, keep_epochs=1)
        assert removed["cdc_filechange"] > 0  # epoch-0 files dropped
        # current state still reads fine
        n = ingest.read_lake_table(lake, "cdc_filechange").count()
        assert n == 428


class TestMergeOnRead:
    def test_mor_epochs_match_cow_and_compact(self, ray_session, sf_dir, tmp_path):
        """Two MoR epochs must read back identical to the CoW lake; after
        compaction (deltas folded into fresh bases) the state digest is
        unchanged and the deltas are cleared."""
        from kafka_connect_jdbc_flatten_ray.functions.hashing import dataset_digest
        from kafka_connect_jdbc_flatten_ray.pipelines import ingest
        from kafka_connect_jdbc_flatten_ray.state.manifest import TableManifest

        cow, mor = str(tmp_path / "cow"), str(tmp_path / "mor")
        for lake, mode in ((cow, "cow"), (mor, "mor")):
            ingest.run_epoch(sf_dir, lake, mode=mode)
            ingest.run_epoch(sf_dir, lake, mode=mode)  # idempotent re-epoch
        for table in ("cdc_filechange", "cdc_filechange_lines",
                      "cdc_filechange_attrs"):
            assert TableManifest(mor, table).current_deltas(), table
            d_cow = dataset_digest(ingest.read_lake_table(cow, table))
            d_mor = dataset_digest(ingest.read_lake_table(mor, table))
            assert d_cow == d_mor, table
        # compaction preserves state and clears deltas
        res = ingest.compact(mor, "cdc_filechange")
        assert res["buckets"] > 0
        assert not TableManifest(mor, "cdc_filechange").current_deltas()
        d_after = dataset_digest(ingest.read_lake_table(mor, "cdc_filechange"))
        assert d_after == dataset_digest(ingest.read_lake_table(cow, "cdc_filechange"))


class TestVacuumReclaimsFoldedDeltas:
    def test_deltas_removed_after_compact_and_vacuum(self, ray_session, sf_dir, tmp_path):
        import glob

        from kafka_connect_jdbc_flatten_ray.pipelines import ingest

        lake = str(tmp_path / "morv")
        ingest.run_epoch(sf_dir, lake, mode="mor")
        deltas_before = glob.glob(f"{lake}/cdc_filechange/bucket=*/*.delta.parquet")
        assert deltas_before
        ingest.compact(lake, "cdc_filechange")
        # folded deltas are unreferenced and below the cutoff -> reclaimed
        ingest.vacuum(lake, keep_epochs=1)
        deltas_after = glob.glob(f"{lake}/cdc_filechange/bucket=*/*.delta.parquet")
        assert deltas_after == []
        # state unchanged
        assert ingest.read_lake_table(lake, "cdc_filechange").count() == 428
        # a LIVE (uncompacted) delta is never vacuumed
        lake2 = str(tmp_path / "morv2")
        ingest.run_epoch(sf_dir, lake2, mode="mor")
        ingest.vacuum(lake2, keep_epochs=1)
        assert glob.glob(f"{lake2}/cdc_filechange/bucket=*/*.delta.parquet")
        assert ingest.read_lake_table(lake2, "cdc_filechange").count() == 428


class TestTimeTravelAndMorLookup:
    def test_read_at_epoch(self, ray_session, sf_dir, tmp_path):
        """Epoch 0 = insert-only replica 1; epoch 1 ingests replica 2 (new
        keys). read_lake_table_at(0) must show only epoch-0 state."""
        from kafka_connect_jdbc_flatten_ray.pipelines import ingest

        lake = str(tmp_path / "tt")
        ingest.run_epoch(sf_dir, lake, replicate=1)
        n0 = ingest.read_lake_table(lake, "cdc_filechange").count()
        ingest.run_epoch(sf_dir, lake, replicate=2)  # replica 2 arrives
        n1 = ingest.read_lake_table(lake, "cdc_filechange").count()
        assert n1 > n0  # replica 2's keyspace arrived
        at0 = ingest.read_lake_table_at(lake, "cdc_filechange", 0).count()
        at1 = ingest.read_lake_table_at(lake, "cdc_filechange", 1).count()
        assert at0 == n0 and at1 == n1

    def test_epoch_numbering_survives_compaction(self, ray_session, sf_dir, tmp_path):
        """compact() advances the manifest epoch without a checkpoint entry;
        the NEXT ingest must not reuse that epoch number, or
        read_lake_table_at's `delta epoch > base epoch` filter would
        silently drop the post-compaction delta from as-of reads."""
        from kafka_connect_jdbc_flatten_ray.pipelines import ingest
        from kafka_connect_jdbc_flatten_ray.state.manifest import TableManifest

        lake = str(tmp_path / "epochnum")
        r0 = ingest.run_epoch(sf_dir, lake, mode="mor", replicate=1)
        assert r0["epoch"] == 0
        res = ingest.compact(lake, "cdc_filechange")
        assert res["epoch"] == 1  # compaction took epoch 1
        r1 = ingest.run_epoch(sf_dir, lake, mode="mor", replicate=2)
        assert r1["epoch"] == 2  # NOT 1 — compaction's epoch is not reused
        n_now = ingest.read_lake_table(lake, "cdc_filechange").count()
        n_at = ingest.read_lake_table_at(lake, "cdc_filechange", 2).count()
        assert n_at == n_now  # the post-compaction delta is visible as-of
        m = TableManifest(lake, "cdc_filechange").load()
        assert int(m["epoch"]) == 2

    def test_mor_point_lookup_replays_deltas(self, ray_session, sf_dir, tmp_path):
        from kafka_connect_jdbc_flatten_ray.pipelines import ingest

        lake = str(tmp_path / "morpl")
        ingest.run_epoch(sf_dir, lake, mode="mor")
        rows = ingest.lake_lookup(
            lake, "cdc_filechange",
            {"filechangekey_repo": "repo_1", "filechangekey_path": "src/doc_1.txt"},
        )
        assert len(rows) == 1 and rows[0]["version"] == 1
        # deleted key resolves to nothing through the delta replay
        gone = ingest.lake_lookup(
            lake, "cdc_filechange",
            {"filechangekey_repo": "repo_7", "filechangekey_path": "src/doc_7.txt"},
        )
        assert gone == []


class TestAutoCreateEvolveGates:
    def test_auto_create_disabled_refuses_new_table(self, ray_session, sf_dir, tmp_path):
        from kafka_connect_jdbc_flatten_ray.pipelines import ingest

        cfg = ingest.default_config(auto_create=False)
        with pytest.raises(ValueError, match="auto-creation is disabled"):
            ingest.run_epoch(sf_dir, str(tmp_path / "nc"), cfg=cfg)

    def test_auto_evolve_disabled_refuses_schema_change(self, ray_session, sf_dir, tmp_path):
        from kafka_connect_jdbc_flatten_ray.pipelines import ingest
        from kafka_connect_jdbc_flatten_ray.sources.cdc_gen import (
            KEY_SCHEMA_NAME, KEY_TYPE, VALUE_SCHEMA_NAME, VALUE_TYPE_V2,
        )
        from kafka_connect_jdbc_flatten_ray.stages.plan import build_plan

        lake = str(tmp_path / "ne")
        ingest.run_epoch(sf_dir, lake)  # v1 schema recorded in manifests
        cfg2 = ingest.default_config(auto_evolve=False)
        # simulate an evolved plan arriving: monkey-free — the evolved value
        # schema yields a different root data schema, so the gate fires
        import kafka_connect_jdbc_flatten_ray.pipelines.ingest as ing

        orig = ing.default_plan
        try:
            ing.default_plan = lambda cfg, topic="cdc": build_plan(
                cfg, topic, VALUE_TYPE_V2, VALUE_SCHEMA_NAME, KEY_TYPE, KEY_SCHEMA_NAME
            )
            with pytest.raises(ValueError, match="auto-evolution is disabled"):
                ingest.run_epoch(sf_dir, lake, cfg=cfg2)
        finally:
            ing.default_plan = orig
        # with evolution enabled the same epoch commits
        ingest.run_epoch(sf_dir, lake, cfg=ingest.default_config(),
                         evolve_from=1)

    def test_mor_auto_compaction(self, ray_session, sf_dir, tmp_path):
        from kafka_connect_jdbc_flatten_ray.pipelines import ingest
        from kafka_connect_jdbc_flatten_ray.state.manifest import TableManifest

        lake = str(tmp_path / "ac")
        ingest.run_epoch(sf_dir, lake, replicate=1, mode="mor",
                         compact_after_deltas=1)
        # threshold 1 -> compacted immediately: no deltas remain
        assert not TableManifest(lake, "cdc_filechange").current_deltas()
        assert ingest.read_lake_table(lake, "cdc_filechange").count() == 428
