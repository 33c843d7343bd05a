"""Generic splitmix reshard: re-bucketing each round-4 state family must
preserve its contents exactly, and post-reshard folds must probe the new
layout (answers stay batch-equal)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from kafka_connect_jdbc_flatten_ray.stages import (
    scrub,
    streaming_dedup as sd,
    streaming_quantiles as sq,
    streaming_scrub as ssc,
)
from kafka_connect_jdbc_flatten_ray.stages.dedup import dedup_embedding_pairs
from kafka_connect_jdbc_flatten_ray.stages.quantiles import quantiles_exact
from kafka_connect_jdbc_flatten_ray.state.manifest import TableManifest


def _vals(seed, n=4_000):
    rng = np.random.RandomState(seed)
    return np.round(rng.randn(n) * 25, 2)


class TestQuantileReshard:
    def test_fold_reshard_fold_equals_batch(self, ray_session, tmp_path):
        root = str(tmp_path / "q")
        a, b = _vals(1), _vals(2)
        sq.value_counts_epoch(
            ray.data.from_arrow(pa.table({"value": a})), root, "value",
            num_buckets=4)
        r = sq.reshard_state(root, 16)
        assert r["num_buckets"] == 16
        part = TableManifest(root, sq.STATE_TABLE).load()["partitioning"]
        assert part["num_buckets"] == 16
        sq.value_counts_epoch(
            ray.data.from_arrow(pa.table({"value": b})), root, "value")
        inc = sq.quantiles_from_state(root)
        batch = quantiles_exact(
            ray.data.from_arrow(pa.table({"value": np.concatenate([a, b])})),
            "value")
        assert inc.equals(batch)


class TestContamReshard:
    def test_fold_reshard_fold_equals_batch(self, ray_session, tmp_path):
        words = [f"w{i}" for i in range(150)]

        def text(seed):
            return " ".join(np.random.default_rng(seed).choice(words, 30))

        docs_t = pa.table({
            "doc_id": pa.array(np.arange(60, dtype=np.int64)),
            "text": pa.array([text(i) for i in range(60)]),
        })
        bench_t = pa.table({
            "doc_id": pa.array(np.arange(20, dtype=np.int64)),
            "text": pa.array([text(500 + i) for i in range(20)]),
        })
        docs = ray.data.from_arrow(docs_t)
        root = str(tmp_path / "c")
        ssc.benchmark_ngrams_epoch(
            ray.data.from_arrow(bench_t.slice(0, 10)), root, n=8,
            num_buckets=4)
        ssc.reshard_state(root, 16)
        ssc.benchmark_ngrams_epoch(
            ray.data.from_arrow(bench_t.slice(10)), root, n=8)
        inc = ssc.contamination_check_incremental(docs, root).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        batch = scrub.contamination_check_distributed(
            docs, ray.data.from_arrow(bench_t), n=8).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert inc.equals(batch)


class TestEmbeddingReshard:
    def test_fold_reshard_fold_equals_batch(self, ray_session, tmp_path):
        dim = 12
        rng = np.random.default_rng(4)
        base = rng.standard_normal((40, dim))
        vecs = np.vstack([base, base[:6] + rng.standard_normal((6, dim)) * 0.02])
        ids = np.arange(len(vecs), dtype=np.int64)

        def tbl(mask):
            sub = vecs[mask]
            return pa.table({
                "vec_id": pa.array(ids[mask]),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(sub.reshape(-1)), dim),
            })

        root = str(tmp_path / "e")
        sd.embedding_pairs_epoch(
            ray.data.from_arrow(tbl(ids % 2 == 0)), root, dim,
            threshold=0.8, num_buckets=4)
        sd.reshard_embedding_state(root, 16)
        sd.embedding_pairs_epoch(
            ray.data.from_arrow(tbl(ids % 2 == 1)), root, dim, threshold=0.8)
        inc = sd.read_embedding_pairs(root).to_pandas() \
            .sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
        batch = dedup_embedding_pairs(
            ray.data.from_arrow(tbl(np.ones(len(ids), bool))), dim,
            threshold=0.8).to_pandas() \
            .sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
        assert batch.equals(inc)

    def test_reshard_without_state_refused(self, ray_session, tmp_path):
        with pytest.raises(ValueError, match="manifest"):
            sd.reshard_embedding_state(str(tmp_path / "none"), 8)


class TestReshardWriteGuard:
    def test_undersized_target_fails_loudly(
        self, ray_session, tmp_path, monkeypatch
    ):
        """Resharding to too few buckets must trip a loud per-destination
        bound (naming reshard_state), never OOM the one write task; the
        claimed epoch is abandoned so a corrected reshard then succeeds."""
        import kafka_connect_jdbc_flatten_ray.stages.streaming_windows as sw

        root = str(tmp_path / "q")
        sq.value_counts_epoch(
            ray.data.from_arrow(pa.table({"value": _vals(9, 500)})), root,
            "value", num_buckets=8)
        monkeypatch.setattr(sw, "MAX_FOLD_ROWS", 100)
        with pytest.raises(Exception, match="reshard_state"):
            sq.reshard_state(root, 1)
        monkeypatch.setattr(sw, "MAX_FOLD_ROWS", 10_000_000)
        r = sq.reshard_state(root, 16)
        assert r["num_buckets"] == 16
