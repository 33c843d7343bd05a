"""End-to-end Ray Data ingest pipeline tests on sf0.001.

Oracle expectations are derived analytically from the deterministic event
rules in sources/cdc_gen.py (versions = doc_id%3+1, tombstone = doc_id%7==0),
independently of the engine code paths.
"""

import collections

import pyarrow.parquet as pq
import pytest

from kafka_connect_jdbc_flatten_ray.pipelines import ingest


@pytest.fixture(scope="module")
def docs_meta(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return {r["doc_id"]: r["text"] for r in t.to_pylist()}


def expected_live_docs(docs_meta):
    return {d: t for d, t in docs_meta.items() if d % 7 != 0}


class TestTableState:
    def test_root_final_state(self, ray_session, sf_dir, docs_meta):
        cfg = ingest.default_config()
        plan = ingest.default_plan(cfg)
        env = ingest.flatten_envelopes(ingest.event_stream(sf_dir), cfg, concurrency=2)
        out = ingest.table_state(env, plan, "cdc_filechange").take_all()
        live = expected_live_docs(docs_meta)
        assert len(out) == len(live)
        by_path = {r["filechangekey_path"]: r for r in out}
        for d in list(live)[:50]:
            r = by_path[f"src/doc_{d}.txt"]
            assert r["version"] == d % 3  # last version wins
            assert r["kafkaoffset"] == d * 4 + d % 3
            assert r["repo"] == f"repo_{d % 20}"

    def test_lines_final_state(self, ray_session, sf_dir, docs_meta):
        cfg = ingest.default_config()
        plan = ingest.default_plan(cfg)
        env = ingest.flatten_envelopes(ingest.event_stream(sf_dir), cfg, concurrency=2)
        out = ingest.table_state(env, plan, "cdc_filechange_lines").take_all()
        live = expected_live_docs(docs_meta)
        exp_rows = sum(len(t.split("\n")) for t in live.values())
        assert len(out) == exp_rows
        # every surviving line carries the final version prefix
        for r in out[:100]:
            d = int(r["filechangekey_path"].split("doc_")[1].split(".")[0])
            assert r["line"].startswith(f"v{d % 3}:")

    def test_insert_mode_accumulates(self, ray_session, sf_dir, docs_meta):
        cfg = ingest.default_config(insert_mode="insert", delete_enabled=False,
                                    pk_mode="flatten")
        plan = ingest.default_plan(cfg)
        events = ingest.event_stream(sf_dir, include_tombstones=False)
        env = ingest.flatten_envelopes(events, cfg, concurrency=2)
        out = ingest.table_state(env, plan, "cdc_filechange").take_all()
        exp = sum(d % 3 + 1 for d in docs_meta)  # every version appended
        assert len(out) == exp


class TestLakeEpochs:
    def test_run_epoch_and_resume(self, ray_session, sf_dir, docs_meta, tmp_path):
        lake = str(tmp_path / "lake")
        res = ingest.run_epoch(sf_dir, lake, concurrency=2)
        assert res["epoch"] == 0
        live = expected_live_docs(docs_meta)
        root = ingest.read_lake_table(lake, "cdc_filechange").take_all()
        assert len(root) == len(live)

        # second epoch: no new events -> state unchanged, checkpoint advances
        res2 = ingest.run_epoch(sf_dir, lake, concurrency=2)
        assert res2["epoch"] == 1
        root2 = ingest.read_lake_table(lake, "cdc_filechange").take_all()
        assert len(root2) == len(live)
        assert res2["offsets"] == res["offsets"]

    def test_incremental_epoch_with_new_data(self, ray_session, sf_dir, docs_meta, tmp_path):
        # epoch 0 ingests replica 0; epoch 1 sees replicas 0+1 but the
        # checkpoint filter skips replica 0 (already applied) — the lake ends
        # up with both keyspaces and epoch 1 processed only the new tail
        lake = str(tmp_path / "lake_inc")
        ingest.run_epoch(sf_dir, lake, replicate=1, concurrency=2)
        res2 = ingest.run_epoch(sf_dir, lake, replicate=2, concurrency=2)
        live0 = sum(1 for d in docs_meta if d % 7 != 0)
        live1 = sum(1 for d in docs_meta if (d + 10_000_000) % 7 != 0)
        root = ingest.read_lake_table(lake, "cdc_filechange").take_all()
        assert len(root) == live0 + live1
        # epoch 1 only ingested the new replica's events
        assert res2["tables"]["cdc_filechange"]["rows_out"] >= live1

    def test_replay_idempotent(self, ray_session, sf_dir, tmp_path):
        # replaying the full log into an existing lake must not change state
        lake = str(tmp_path / "lake2")
        ingest.run_epoch(sf_dir, lake, concurrency=2)
        state1 = sorted(
            (r["filechangekey_path"], r["version"])
            for r in ingest.read_lake_table(lake, "cdc_filechange").take_all()
        )
        # wipe the checkpoint so the full log replays on top of current state
        import shutil

        shutil.rmtree(f"{lake}/_checkpoints")
        ingest.run_epoch(sf_dir, lake, concurrency=2)
        state2 = sorted(
            (r["filechangekey_path"], r["version"])
            for r in ingest.read_lake_table(lake, "cdc_filechange").take_all()
        )
        assert state1 == state2


class TestStreamingMerge:
    def test_streaming_equals_inmemory(self, ray_session, sf_dir, tmp_path):
        """Forcing the two-pass streaming merge (threshold=0) must produce
        byte-identical final table state to the in-memory merge, across two
        epochs (so the prior-state strict-domination path is exercised)."""
        import pyarrow.compute as pc

        from kafka_connect_jdbc_flatten_ray.pipelines import ingest
        from kafka_connect_jdbc_flatten_ray.stages.merge import MergeToLake

        def run(lake, threshold):
            for _ in range(2):  # two epochs: second merges against prior
                cfg = ingest.default_config()
                plan = ingest.default_plan(cfg)
                key_cols = {tp.table: tp.key_pk_cols for tp in plan.tables}
                from kafka_connect_jdbc_flatten_ray.state.checkpoints import (
                    CheckpointStore,
                )
                from kafka_connect_jdbc_flatten_ray.state.manifest import (
                    TableManifest,
                )

                ck = CheckpointStore(f"{lake}/_checkpoints")
                prev = ck.latest_epoch()
                epoch = 0 if prev is None else prev + 1
                prior_files = {}
                for tp in plan.tables:
                    for b, p in TableManifest(lake, tp.table).current_files().items():
                        prior_files[(tp.table, b)] = p
                events = ingest.event_stream(sf_dir)
                env = ingest.flatten_envelopes(events, cfg)
                stats = env.groupby(["table", "bucket"]).map_groups(
                    MergeToLake(lake, epoch, key_cols, prior_files,
                                stream_threshold_bytes=threshold),
                    batch_format="pyarrow",
                ).take_all()
                bucket_files = {}
                for r in stats:
                    bucket_files.setdefault(r["table"], {})[r["bucket"]] = r["path"]
                for t, files in bucket_files.items():
                    TableManifest(lake, t).publish(epoch, files, {})
                ck.save(epoch, {}, {})

        lake_mem = str(tmp_path / "mem")
        lake_str = str(tmp_path / "str")
        run(lake_mem, 1 << 40)  # always in-memory
        run(lake_str, 0)        # always streaming

        from kafka_connect_jdbc_flatten_ray.functions.hashing import dataset_digest
        from kafka_connect_jdbc_flatten_ray.pipelines.ingest import read_lake_table

        for table in ("cdc_filechange", "cdc_filechange_lines", "cdc_filechange_attrs"):
            a = read_lake_table(lake_mem, table)
            b = read_lake_table(lake_str, table)
            assert dataset_digest(a) == dataset_digest(b), table


class TestStreamingMergeEvolution:
    def test_streaming_equals_inmemory_with_evolved_schemas(self, ray_session, sf_dir, tmp_path):
        """Streaming two-pass merge must promote mixed payload schemas
        (W5) identically to the in-memory concat path."""
        from kafka_connect_jdbc_flatten_ray.functions.hashing import dataset_digest
        from kafka_connect_jdbc_flatten_ray.pipelines import ingest
        from kafka_connect_jdbc_flatten_ray.stages.merge import MergeToLake
        from kafka_connect_jdbc_flatten_ray.state.manifest import TableManifest

        def run(lake, threshold):
            cfg = ingest.default_config()
            plan = ingest.default_plan(cfg)
            key_cols = {tp.table: tp.key_pk_cols for tp in plan.tables}
            events = ingest.event_stream(sf_dir, evolve_from=1)  # mixed schemas
            env = ingest.flatten_envelopes(events, cfg)
            stats = env.groupby(["table", "bucket"]).map_groups(
                MergeToLake(lake, 0, key_cols, {},
                            stream_threshold_bytes=threshold),
                batch_format="pyarrow",
            ).take_all()
            files = {}
            for r in stats:
                files.setdefault(r["table"], {})[r["bucket"]] = r["path"]
            for t, f in files.items():
                TableManifest(lake, t).publish(0, f, {})

        mem, stream = str(tmp_path / "m"), str(tmp_path / "s")
        run(mem, 1 << 40)
        run(stream, 0)
        for table in ("cdc_filechange", "cdc_filechange_lines"):
            assert dataset_digest(ingest.read_lake_table(mem, table)) == \
                dataset_digest(ingest.read_lake_table(stream, table)), table
