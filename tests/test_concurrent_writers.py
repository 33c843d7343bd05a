"""Single-writer guard on the lake: epoch publishes are CAS-protected by an
exclusive epoch-claim marker (state/manifest.py), the analogue of the
reference's concurrent-DDL retry contract (DbStructure.java:127-234) — two
writers racing one table lose loudly instead of silently last-write-winning
the manifest swap."""

import posixpath

import pytest

from kafka_connect_jdbc_flatten_ray.state import fs as fsx
from kafka_connect_jdbc_flatten_ray.state.manifest import TableManifest


class TestManifestCAS:
    def test_second_publish_of_same_epoch_loses(self, tmp_path):
        lake = str(tmp_path / "lake")
        m = TableManifest(lake, "t")
        m.publish(0, {0: "f0"}, {"rows_out": 1})
        with pytest.raises(fsx.ConcurrentWriteError):
            TableManifest(lake, "t").publish(0, {0: "f0b"}, {"rows_out": 2})
        # the loser did not clobber the winner's state
        assert TableManifest(lake, "t").current_files() == {0: "f0"}
        # the next epoch number is free
        m.publish(1, {0: "f1"}, {"rows_out": 1})
        assert TableManifest(lake, "t").load()["epoch"] == 1

    def test_abandon_stale_claim(self, tmp_path):
        """A writer that crashed between claim and swap leaves a marker;
        abandon_epoch clears it so the number can be re-claimed — but
        refuses to abandon a COMMITTED epoch."""
        lake = str(tmp_path / "lake")
        m = TableManifest(lake, "t")
        m.publish(0, {0: "f0"}, {})
        # simulate a crashed claim for epoch 1 (marker, no swap)
        marker = posixpath.join(m.dir, "_epochs", "epoch-000001.json")
        fsx.create_exclusive(m.fs, marker, b"{}")
        with pytest.raises(fsx.ConcurrentWriteError):
            m.publish(1, {0: "f1"}, {})
        m.abandon_epoch(1)
        m.publish(1, {0: "f1"}, {})
        assert m.load()["epoch"] == 1
        with pytest.raises(ValueError, match="completed epoch"):
            m.abandon_epoch(1)

    def test_publish_refuses_stale_nonce(self, tmp_path):
        """A writer whose claim was abandoned-and-reclaimed must not commit
        over the new owner: publish verifies the nonce in the marker."""
        lake = str(tmp_path / "lake")
        m = TableManifest(lake, "t")
        stale = m.claim_epoch(0)
        m.abandon_epoch(0)  # operator decides the writer is dead
        fresh = TableManifest(lake, "t").claim_epoch(0)  # new owner
        with pytest.raises(fsx.ConcurrentWriteError):
            m.publish(0, {0: "f-stale"}, {}, claim_nonce=stale)
        TableManifest(lake, "t").publish(0, {0: "f-fresh"}, {},
                                         claim_nonce=fresh)
        assert TableManifest(lake, "t").current_files() == {0: "f-fresh"}

    def test_loser_writes_no_data_files(self, ray_session, sf_dir, tmp_path):
        """Epoch data files live at deterministic paths, so the CAS must be
        won BEFORE any fold task writes: a run_epoch that loses the claim
        race leaves zero epoch data files behind (nothing for the winner
        to have clobbered) and releases the claims it staked on the other
        plan tables."""
        import glob

        from kafka_connect_jdbc_flatten_ray.pipelines import ingest

        lake = str(tmp_path / "lake")
        ingest.run_epoch(sf_dir, lake)  # epoch 0
        m = TableManifest(lake, "cdc_filechange")
        marker = posixpath.join(m.dir, "_epochs", "epoch-000001.json")
        fsx.create_exclusive(m.fs, marker, b"{}")  # rival owns epoch 1
        import shutil

        shutil.rmtree(f"{lake}/_checkpoints")  # force a full re-ingest
        with pytest.raises(fsx.ConcurrentWriteError):
            ingest.run_epoch(sf_dir, lake)
        # the loser never wrote an epoch-1 data file anywhere in the lake
        assert glob.glob(f"{lake}/**/epoch-000001*.parquet",
                         recursive=True) == []
        # claims staked on OTHER tables before the loss were released
        stray = [p for p in glob.glob(f"{lake}/**/epoch-000001.json",
                                      recursive=True) if p != marker
                 and "_epochs" in p]
        assert stray == []

    def test_concurrent_run_epoch_loses_loudly(self, ray_session, sf_dir, tmp_path):
        """Two run_epoch calls racing one lake: the second writer (here: a
        claim planted for the epoch number run_epoch will allocate) fails
        with ConcurrentWriteError instead of corrupting the manifest."""
        from kafka_connect_jdbc_flatten_ray.pipelines import ingest

        lake = str(tmp_path / "lake")
        ingest.run_epoch(sf_dir, lake)  # epoch 0
        m = TableManifest(lake, "cdc_filechange")
        marker = posixpath.join(m.dir, "_epochs", "epoch-000001.json")
        fsx.create_exclusive(m.fs, marker, b"{}")  # rival writer claims 1
        import shutil

        shutil.rmtree(f"{lake}/_checkpoints")  # force a full re-ingest
        with pytest.raises(fsx.ConcurrentWriteError):
            ingest.run_epoch(sf_dir, lake)
        # recovery: abandon the stale claim, replay succeeds
        m.abandon_epoch(1)
        res = ingest.run_epoch(sf_dir, lake)
        assert res["epoch"] >= 1
        assert ingest.read_lake_table(lake, "cdc_filechange").count() == 428
