"""Corpus export + sequence packing tests."""

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data

from kafka_connect_jdbc_flatten_ray.stages import export


class TestExport:
    def test_export_and_verify(self, ray_session, sf_dir, tmp_path):
        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text", "lang"])
        out = str(tmp_path / "corpus")
        manifest = export.export_corpus(docs, out, min_rows_per_file=200)
        assert manifest["rows"] == 500
        assert len(manifest["files"]) >= 1
        assert export.verify_export(out)

    def test_tamper_detection(self, ray_session, sf_dir, tmp_path):
        import os

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        out = str(tmp_path / "corpus2")
        manifest = export.export_corpus(docs, out)
        path = os.path.join(out, "data", manifest["files"][0])
        t = pq.read_table(path)
        pq.write_table(t.slice(0, t.num_rows - 1), path)  # drop a row
        assert not export.verify_export(out)


class TestPacking:
    def test_token_conservation_and_determinism(self, ray_session, sf_dir):
        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        seqs = export.pack_sequences(docs, seq_len=128, group_size=100).take_all()
        # conservation: sum of real tokens == total whitespace tokens
        total_real = sum(r["n_real"] for r in seqs)
        texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
        total_tokens = sum(len(t.split(" ")) for t in texts.column("text").to_pylist())
        assert total_real == total_tokens
        for r in seqs[:20]:
            toks = np.asarray(r["tokens"])
            assert len(toks) == 128
            assert (toks[: r["n_real"]] != 0).all()
            assert (toks[r["n_real"]:] == 0).all()
        # determinism under different parallelism
        docs2 = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                      columns=["doc_id", "text"],
                                      override_num_blocks=7)
        seqs2 = export.pack_sequences(docs2, seq_len=128, group_size=100).take_all()
        k1 = sorted((r["group"], r["seq_idx"], tuple(r["tokens"])) for r in seqs)
        k2 = sorted((r["group"], r["seq_idx"], tuple(r["tokens"])) for r in seqs2)
        assert k1 == k2


class TestStaleShardExclusion:
    def test_rerun_replaces_stale_shards(self, ray_session, sf_dir, tmp_path):
        """A crashed/previous run's shards in data/ must not pollute the
        manifest: the export stages into a fresh dir and atomically
        replaces data/, so rows and digest reflect exactly this export."""
        import os

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        out = str(tmp_path / "corpus3")
        # simulate leftovers from a previous run
        os.makedirs(os.path.join(out, "data"))
        stale = os.path.join(out, "data", "stale-leftover.parquet")
        pq.write_table(pq.read_table(f"{sf_dir}/documents.parquet").slice(0, 50), stale)
        manifest = export.export_corpus(docs, out, min_rows_per_file=200)
        assert manifest["rows"] == 500  # not 550
        assert "stale-leftover.parquet" not in manifest["files"]
        assert not os.path.exists(stale)
        assert export.verify_export(out)


class TestPartitionedResume:
    def test_skip_finished_partitions(self, ray_session, sf_dir, tmp_path):
        import os

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        out = str(tmp_path / "pcorpus")
        m1 = export.export_corpus_partitioned(docs, out, rows_per_part=100)
        assert m1["rows"] == 500 and len(m1["files"]) == 5
        assert m1["skipped"] == []
        assert export.verify_export(out)
        # crash simulation: one partition lost, manifest gone
        lost = os.path.join(out, "data", m1["files"][2])
        os.remove(lost)
        os.remove(os.path.join(out, "manifest.json"))
        mtimes = {f: os.path.getmtime(os.path.join(out, "data", f))
                  for f in m1["files"] if f != m1["files"][2]}
        m2 = export.export_corpus_partitioned(docs, out, rows_per_part=100)
        assert m2["rows"] == 500
        assert len(m2["skipped"]) == 4  # only the lost partition rewritten
        for f, t in mtimes.items():
            assert os.path.getmtime(os.path.join(out, "data", f)) == t, f
        assert export.verify_export(out)
