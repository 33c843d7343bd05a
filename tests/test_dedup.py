"""Dedup / ANN operator tests on synthetic corpora with planted duplicates."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from kafka_connect_jdbc_flatten_ray.stages import ann, dedup


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "on the warm mat near the door of the old house"
)


@pytest.fixture
def docs_with_dups(ray_session):
    texts = [
        BASE,
        BASE,  # exact dup of 0
        BASE.replace("lazy", "sleepy"),  # near dup of 0
        "completely different content about database engines and shuffles",
        "another unrelated piece of text mentioning ray data pipelines",
        BASE + " extra tail words here",  # near dup of 0
    ]
    return ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )


class TestExactDedup:
    def test_keeps_min_doc_per_text(self, docs_with_dups):
        kept = sorted(r["doc_id"] for r in dedup.dedup_exact(docs_with_dups).take_all())
        assert kept == [0, 2, 3, 4, 5]  # doc 1 is the exact dup


class TestMinHash:
    def test_finds_planted_near_dups(self, docs_with_dups):
        pairs = dedup.dedup_minhash_pairs(docs_with_dups, threshold=0.5).take_all()
        found = {(r["doc_a"], r["doc_b"]) for r in pairs}
        assert (0, 1) in found  # exact dup: jaccard 1.0
        assert any(b in (2, 5) for (a, b) in found if a == 0)  # near dups
        assert all(b not in (3, 4) for (_, b) in found)  # unrelated not paired

    def test_ngram_variant(self, docs_with_dups):
        pairs = dedup.dedup_ngram_jaccard_pairs(docs_with_dups, threshold=0.5).take_all()
        found = {(r["doc_a"], r["doc_b"]) for r in pairs}
        assert (0, 1) in found


class TestSimHash:
    def test_finds_planted_near_dups(self, docs_with_dups):
        pairs = dedup.dedup_simhash_pairs(docs_with_dups, max_hamming=6).take_all()
        found = {(r["doc_a"], r["doc_b"]) for r in pairs}
        assert (0, 1) in found
        hams = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs}
        assert hams[(0, 1)] == 0


class TestEmbeddingDedup:
    def test_finds_planted_near_dups(self, ray_session):
        rng = np.random.RandomState(7)
        base = rng.standard_normal(32).astype(np.float32)
        near = base + 0.05 * rng.standard_normal(32).astype(np.float32)
        far = rng.standard_normal((6, 32)).astype(np.float32)
        mat = np.vstack([base, near, far])
        emb = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": list(range(len(mat))),
                    "embedding": pa.FixedSizeListArray.from_arrays(
                        pa.array(mat.reshape(-1)), 32
                    ).cast(pa.list_(pa.float32())),
                }
            )
        )
        pairs = dedup.dedup_embedding_pairs(emb, 32, threshold=0.9).take_all()
        found = {(r["vec_a"], r["vec_b"]) for r in pairs}
        assert (0, 1) in found
        assert all({a, b} == {0, 1} for a, b in found)

    def test_hot_bucket_stays_linear(self, ray_session):
        """1k near-identical vectors collapse into one LSH bucket; the
        star-pattern dense path must emit O(b) head-vs-member pairs (all
        anchored on the bucket-min id), never the O(b^2) all-pairs set."""
        rng = np.random.RandomState(11)
        base = rng.standard_normal(32).astype(np.float32)
        mat = base + 1e-4 * rng.standard_normal((1000, 32)).astype(np.float32)
        emb = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": list(range(len(mat))),
                    "embedding": pa.FixedSizeListArray.from_arrays(
                        pa.array(mat.reshape(-1)), 32
                    ).cast(pa.list_(pa.float32())),
                }
            )
        )
        pairs = dedup.dedup_embedding_pairs(emb, 32, threshold=0.99).take_all()
        assert len(pairs) == 999  # star: one pair per non-head member
        assert all(r["vec_a"] == 0 for r in pairs)
        assert {r["vec_b"] for r in pairs} == set(range(1, 1000))


class TestANN:
    def test_brute_force_topk(self, ray_session, sf_dir):
        out = ann.ann_topk(sf_dir, k=3, num_queries=4).take_all()
        assert len(out) == 12
        per_q = {}
        for r in out:
            per_q.setdefault(r["query_id"], []).append(r)
        for q, rows in per_q.items():
            ranks = sorted(r["rank"] for r in rows)
            assert ranks == [1, 2, 3]
            coss = [r["cos"] for r in sorted(rows, key=lambda x: x["rank"])]
            assert coss == sorted(coss, reverse=True)
            assert all(r["vec_id"] != q for r in rows)

    def test_ivf_recall(self, ray_session, sf_dir):
        bf = ann.ann_topk(sf_dir, k=5, num_queries=8).take_all()
        ivf = ann.ann_topk_ivf(sf_dir, k=5, num_queries=8, nprobe=8,
                               num_centroids=8).take_all()
        bfs = {(r["query_id"], r["vec_id"]) for r in bf}
        ivs = {(r["query_id"], r["vec_id"]) for r in ivf}
        # probing all 8 of 8 buckets = exhaustive -> recall 1.0
        assert len(bfs & ivs) == len(bfs)


class TestANNBoundedDriverReads:
    def test_no_full_table_read_on_driver(self, ray_session, sf_dir, monkeypatch):
        """ivf_centroids and load_queries must never read the whole
        embeddings table on the driver: pq.read_table is poisoned; only
        bounded row-group reads / pushed-down dataset filters are allowed."""
        import pyarrow.parquet as pq

        def _boom(*a, **k):
            raise AssertionError("full-table driver read in ANN setup")

        monkeypatch.setattr(pq, "read_table", _boom)
        cents = ann.ivf_centroids(sf_dir, num_centroids=8)
        ids, mat = ann.load_queries(sf_dir, 4)
        monkeypatch.undo()
        assert cents.shape[0] == 8 and len(ids) == 4 and mat.shape[0] == 4

    def test_ivf_still_recalls_after_bounding(self, ray_session, sf_dir):
        bf = ann.ann_topk(sf_dir, k=3, num_queries=4).take_all()
        ivf = ann.ann_topk_ivf(sf_dir, k=3, num_queries=4, nprobe=8,
                               num_centroids=8).take_all()
        bfs = {(r["query_id"], r["vec_id"]) for r in bf}
        ivs = {(r["query_id"], r["vec_id"]) for r in ivf}
        assert len(bfs & ivs) == len(bfs)  # nprobe == all buckets -> recall 1


class TestEmbeddingSlim:
    def test_slim_matches_dense(self, ray_session):
        """The slim (id-only shuffle + vector re-join) variant must produce
        the same verified pairs as the dense variant."""
        rng = np.random.RandomState(7)
        base = rng.standard_normal(32).astype(np.float32)
        near = base + 0.05 * rng.standard_normal(32).astype(np.float32)
        far = rng.standard_normal((6, 32)).astype(np.float32)
        mat = np.vstack([base, near, far])
        emb = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": list(range(len(mat))),
                    "embedding": pa.FixedSizeListArray.from_arrays(
                        pa.array(mat.reshape(-1)), 32
                    ).cast(pa.list_(pa.float32())),
                }
            )
        )
        dense_ds = dedup.dedup_embedding_pairs(emb, 32, 0.9)
        slim_ds = dedup.dedup_embedding_pairs_slim(emb, 32, 0.9)
        dense = {(r["vec_a"], r["vec_b"]): round(r["cos"], 5)
                 for r in dense_ds.take_all()}
        slim = {(r["vec_a"], r["vec_b"]): round(r["cos"], 5)
                for r in slim_ds.take_all()}
        assert dense == slim and (0, 1) in slim
        # the round-3 wrong answer was float64 ids from a pandas promotion;
        # dtypes must match the dense variant exactly, not just values
        sch = slim_ds.schema()
        types = dict(zip(sch.names, sch.types))
        assert types["vec_a"] == pa.int64() and types["vec_b"] == pa.int64()


class TestMinHashSlim:
    def test_slim_matches_dense(self, ray_session, docs_with_dups):
        dense = {(r["doc_a"], r["doc_b"]): round(r["est_jaccard"], 6)
                 for r in dedup.dedup_minhash_pairs(docs_with_dups, 0.5).take_all()}
        slim_ds = dedup.dedup_minhash_pairs_slim(docs_with_dups, 0.5)
        slim = {(r["doc_a"], r["doc_b"]): round(r["est_jaccard"], 6)
                for r in slim_ds.take_all()}
        assert dense == slim and (0, 1) in slim
        sch = slim_ds.schema()
        types = dict(zip(sch.names, sch.types))
        assert types["doc_a"] == pa.int64() and types["doc_b"] == pa.int64()


class TestIVFTrained:
    def test_trained_centroids_full_recall_at_full_probe(self, ray_session, sf_dir):
        bf = ann.ann_topk(sf_dir, k=3, num_queries=4).take_all()
        ivf = ann.ann_topk_ivf(sf_dir, k=3, num_queries=4, nprobe=8,
                               num_centroids=8, train=True).take_all()
        bfs = {(r["query_id"], r["vec_id"]) for r in bf}
        ivs = {(r["query_id"], r["vec_id"]) for r in ivf}
        assert len(bfs & ivs) == len(bfs)


class TestSemanticDedup:
    def test_planted_near_dups_pruned(self, ray_session, tmp_path):
        """Identical vectors collapse to the smallest vec_id; orthogonal
        vectors survive; output matches the min-id-wins anti-join rule."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from kafka_connect_jdbc_flatten_ray.stages.dedup import semantic_dedup_keep

        rng = np.random.RandomState(11)
        base = rng.randn(6, 16).astype(np.float32)
        base[1] = base[0]                  # exact dup of 0
        base[3] = base[2] + 1e-4           # near dup of 2
        vecs = [list(map(float, v)) for v in base]
        t = pa.table({
            "vec_id": pa.array(range(6), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        })
        pq.write_table(t, str(tmp_path / "embeddings.parquet"))
        out = semantic_dedup_keep(str(tmp_path), threshold=0.9, num_centroids=2)
        kept = sorted(r["vec_id"] for r in out.take_all())
        assert 0 in kept and 2 in kept
        assert 1 not in kept and 3 not in kept
        assert len(kept) == 4


class TestSemanticDedupScaleGuard:
    def _write(self, tmp_path, n=6, dim=16, seed=11):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        rng = np.random.RandomState(seed)
        base = rng.randn(n, dim).astype(np.float32)
        t = pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in base],
                                  pa.list_(pa.float32())),
        })
        pq.write_table(t, str(tmp_path / "embeddings.parquet"))

    def test_oversized_cluster_trips_loudly(
        self, ray_session, tmp_path, monkeypatch
    ):
        """A cluster past MAX_CLUSTER_ROWS must raise (naming the
        num_centroids remedy), never silently materialize."""
        import pytest

        from kafka_connect_jdbc_flatten_ray.stages import dedup as dmod

        self._write(tmp_path, n=40)
        monkeypatch.setattr(dmod, "MAX_CLUSTER_ROWS", 8)
        with pytest.raises(Exception, match="num_centroids"):
            dmod.semantic_dedup_keep(
                str(tmp_path), threshold=0.9, num_centroids=2).take_all()

    def test_num_centroids_derived_from_corpus(self, ray_session, tmp_path):
        """num_centroids=None derives C so clusters average
        ~TARGET_CLUSTER_ROWS rows, floor 16; tiny corpora still run."""
        from kafka_connect_jdbc_flatten_ray.stages.dedup import (
            TARGET_CLUSTER_ROWS, derived_num_centroids, semantic_dedup_keep,
        )

        assert derived_num_centroids(0) == 16
        assert derived_num_centroids(100 * TARGET_CLUSTER_ROWS) == 100
        assert derived_num_centroids(100 * TARGET_CLUSTER_ROWS + 1) == 101
        # 10^9 embeddings -> 10k clusters of ~100k rows each
        assert derived_num_centroids(1_000_000_000) == 10_000
        self._write(tmp_path, n=30)
        out = semantic_dedup_keep(str(tmp_path), threshold=0.99)
        assert len(out.take_all()) >= 1  # auto path end-to-end at tiny n


class TestDuplicatedSpans:
    def test_planted_duplicate_spans(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from kafka_connect_jdbc_flatten_ray.stages.dedup import (
            duplicated_spans,
        )

        docs = pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array([
                "a b c d e f",          # shares 'a b c d' with doc 1
                "a b c d x y",
                "p q r s t u",          # unique spans
                "z z z z z",            # within-doc repeat: 'z z z z' x2
            ]),
        })
        out = {r["doc_id"]: r for r in
               duplicated_spans(ray.data.from_arrow(docs),
                                width=4).take_all()}
        # doc 0: spans (abcd, bcde, cdef); only abcd duplicated
        assert (out[0]["n_spans"], out[0]["n_dup_spans"]) == (3, 1)
        assert out[0]["dup_frac"] == round(1 / 3, 6)
        assert (out[1]["n_spans"], out[1]["n_dup_spans"]) == (3, 1)
        assert out[2]["n_dup_spans"] == 0
        # doc 3: spans (zzzz, zzzz) — within-doc repeats count
        assert (out[3]["n_spans"], out[3]["n_dup_spans"]) == (2, 2)

    def test_short_docs_zero_spans(self, ray_session):
        import pyarrow as pa
        import ray.data

        from kafka_connect_jdbc_flatten_ray.stages.dedup import (
            duplicated_spans,
        )

        docs = pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["one two", "a much longer doc here ok"]),
        })
        out = {r["doc_id"]: r for r in
               duplicated_spans(ray.data.from_arrow(docs),
                                width=4).take_all()}
        assert (out[0]["n_spans"], out[0]["dup_frac"]) == (0, 0.0)
        assert out[1]["n_spans"] == 3
