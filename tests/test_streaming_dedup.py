"""Incremental exact dedup: epoch-at-a-time folds into lake-resident
fingerprint state must reproduce batch dedup_exact over the union of all
folded epochs — with NO ordering assumption (min is commutative)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from kafka_connect_jdbc_flatten_ray.stages import streaming_dedup as sd
from kafka_connect_jdbc_flatten_ray.stages.dedup import dedup_exact


def docs(ids, texts):
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
    )


def keepers(ds):
    return sorted(r["doc_id"] for r in ds.take_all())


class TestIncrementalExactDedup:
    def test_three_epochs_equal_batch(self, ray_session, tmp_path):
        """Cross-epoch duplicates collapse to the global min doc_id."""
        root = str(tmp_path / "dd")
        epochs = [
            docs([1, 2, 3], ["aa", "bb", "cc"]),
            docs([4, 5], ["bb", "dd"]),          # 4 dups epoch-1's 'bb'
            docs([6, 7, 8], ["aa", "dd", "aa"]), # 6,8 dup 'aa'; 7 dups 'dd'
        ]
        for e in epochs:
            r = sd.dedup_exact_epoch(ray.data.from_arrow(e), root, num_buckets=4)
            assert r["buckets"] > 0
        want = keepers(dedup_exact(ray.data.from_arrow(pa.concat_tables(epochs))))
        assert keepers(sd.read_keepers(root)) == want == [1, 2, 3, 5]

    def test_epoch_order_does_not_matter(self, ray_session, tmp_path):
        """A LATER epoch carrying a SMALLER doc_id still wins the keeper
        slot — no watermark assumption, unlike the window operators."""
        root = str(tmp_path / "dd")
        sd.dedup_exact_epoch(
            ray.data.from_arrow(docs([10, 11], ["xx", "yy"])), root, num_buckets=4
        )
        sd.dedup_exact_epoch(
            ray.data.from_arrow(docs([2], ["xx"])), root
        )
        assert keepers(sd.read_keepers(root)) == [2, 11]

    def test_idle_bucket_carries_state(self, ray_session, tmp_path):
        """An epoch touching a strict subset of buckets must not lose the
        untouched buckets' fingerprints (manifest keeps their files)."""
        root = str(tmp_path / "dd")
        many = docs(list(range(100)), [f"t{i}" for i in range(100)])
        sd.dedup_exact_epoch(ray.data.from_arrow(many), root, num_buckets=8)
        sd.dedup_exact_epoch(
            ray.data.from_arrow(docs([500], ["t7"])), root
        )
        got = keepers(sd.read_keepers(root))
        assert got == list(range(100))  # 500 is a dup of t7, no keeper lost

    def test_stats_and_manifest_lineage(self, ray_session, tmp_path):
        root = str(tmp_path / "dd")
        r1 = sd.dedup_exact_epoch(
            ray.data.from_arrow(docs([1, 2, 3], ["a", "a", "b"])), root
        )
        assert r1["epoch_docs"] == 3
        assert r1["new_fingerprints"] == 2
        assert r1["dup_docs"] == 1
        r2 = sd.dedup_exact_epoch(
            ray.data.from_arrow(docs([4, 5], ["b", "c"])), root
        )
        assert r2["epoch"] == r1["epoch"] + 1
        assert r2["new_fingerprints"] == 1  # only 'c'
        assert r2["dup_docs"] == 1          # 4 dups 'b'
        assert keepers(sd.read_keepers(root)) == [1, 3, 5]

    def test_stored_num_buckets_wins(self, ray_session, tmp_path):
        """Once created, the state's recorded bucket layout overrides the
        caller's argument — a different count would probe wrong files."""
        root = str(tmp_path / "dd")
        sd.dedup_exact_epoch(
            ray.data.from_arrow(docs([1, 2], ["a", "b"])), root, num_buckets=4
        )
        sd.dedup_exact_epoch(
            ray.data.from_arrow(docs([9], ["a"])), root, num_buckets=32
        )
        from kafka_connect_jdbc_flatten_ray.state.manifest import TableManifest

        m = TableManifest(root, sd.STATE_TABLE).load()
        assert m["partitioning"]["num_buckets"] == 4
        assert keepers(sd.read_keepers(root)) == [1, 2]

    def test_fold_guard_trips_and_claim_released(
        self, ray_session, tmp_path, monkeypatch
    ):
        from kafka_connect_jdbc_flatten_ray.stages import streaming_windows as sw

        monkeypatch.setattr(sw, "MAX_FOLD_ROWS", 10)
        root = str(tmp_path / "dd")
        big = docs(list(range(64)), ["u%d" % i for i in range(64)])
        with pytest.raises(Exception, match="reshard_state|epoch rows"):
            sd.dedup_exact_epoch(ray.data.from_arrow(big), root, num_buckets=1)
        # the abandoned claim must not block a rerun at sane limits
        monkeypatch.setattr(sw, "MAX_FOLD_ROWS", 10_000_000)
        r = sd.dedup_exact_epoch(ray.data.from_arrow(big), root, num_buckets=1)
        assert r["epoch"] == 0 and r["new_fingerprints"] == 64

    def test_matches_batch_on_random_stream(self, ray_session, tmp_path):
        rng = np.random.RandomState(7)
        ids = rng.permutation(400)
        texts = ["doc-%d" % rng.randint(0, 120) for _ in range(400)]
        t = docs(list(ids), texts)
        root = str(tmp_path / "dd")
        cut = [0, 150, 260, 400]
        for i in range(3):
            sd.dedup_exact_epoch(
                ray.data.from_arrow(t.slice(cut[i], cut[i + 1] - cut[i])),
                root, num_buckets=8,
            )
        want = keepers(dedup_exact(ray.data.from_arrow(t)))
        assert keepers(sd.read_keepers(root)) == want

    def test_reshard_then_fold(self, ray_session, tmp_path):
        """Guard-trip remedy: reshard to more buckets, keep every keeper,
        and subsequent folds probe the NEW layout correctly."""
        root = str(tmp_path / "dd")
        sd.dedup_exact_epoch(
            ray.data.from_arrow(
                docs(list(range(60)), [f"r{i % 40}" for i in range(60)])
            ),
            root, num_buckets=2,
        )
        before = keepers(sd.read_keepers(root))
        r = sd.reshard_state(root, 16)
        assert r["num_buckets"] == 16
        assert keepers(sd.read_keepers(root)) == before
        # post-reshard fold must dedup against relocated fingerprints
        sd.dedup_exact_epoch(
            ray.data.from_arrow(docs([900, 901], ["r0", "brand-new"])), root
        )
        got = keepers(sd.read_keepers(root))
        assert 900 not in got and 901 in got
        assert [k for k in got if k < 900] == before


class TestIncrementalMinHash:
    def test_three_epochs_equal_batch(self, ray_session, sf_dir, tmp_path):
        import pyarrow.parquet as pq
        import pandas as pd
        from kafka_connect_jdbc_flatten_ray.stages.dedup import dedup_minhash_pairs

        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        ids = t.column("doc_id").to_numpy()
        root = str(tmp_path / "lsh")
        for part in range(3):
            r = sd.minhash_pairs_epoch(
                ray.data.from_arrow(t.filter(pa.array(ids % 3 == part))),
                root, threshold=0.5,
            )
            assert r["buckets"] > 0
        got = (sd.read_pairs(root).to_pandas()
               .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
        want = (dedup_minhash_pairs(ray.data.from_arrow(t), threshold=0.5)
                .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)

    def test_smaller_doc_id_reanchors_star(self, ray_session, tmp_path):
        """A later epoch introducing a smaller doc_id must re-anchor the
        touched star groups exactly as batch would (pairs are recomputed,
        not appended)."""
        import pandas as pd
        from kafka_connect_jdbc_flatten_ray.stages.dedup import dedup_minhash_pairs

        text = "the quick brown fox jumps over the lazy dog again and again"
        near = text.replace("dog", "cat")
        root = str(tmp_path / "lsh")
        e1 = docs([50, 51], [text, near])
        e2 = docs([3], [text])  # same content, smaller id -> new anchor
        sd.minhash_pairs_epoch(ray.data.from_arrow(e1), root, threshold=0.3)
        sd.minhash_pairs_epoch(ray.data.from_arrow(e2), root, threshold=0.3)
        got = (sd.read_pairs(root).to_pandas()
               .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
        want = (dedup_minhash_pairs(
                    ray.data.from_arrow(pa.concat_tables([e1, e2])),
                    threshold=0.3)
                .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)
        assert (got["doc_a"] == 3).any()  # the new doc anchors its groups

    def test_redelivery_is_idempotent(self, ray_session, tmp_path):
        """Folding the same documents twice changes nothing (members dedup
        on (band, hash, doc))."""
        root = str(tmp_path / "lsh")
        e = docs([1, 2], ["a b c d e f g", "a b c d e f h"])
        r1 = sd.minhash_pairs_epoch(ray.data.from_arrow(e), root, threshold=0.3)
        pairs1 = sorted(map(tuple, sd.read_pairs(root).to_pandas().values.tolist()))
        r2 = sd.minhash_pairs_epoch(ray.data.from_arrow(e), root, threshold=0.3)
        pairs2 = sorted(map(tuple, sd.read_pairs(root).to_pandas().values.tolist()))
        assert pairs1 == pairs2
        assert r2["members"] <= r1["members"] * 1  # no growth on redelivery

    def test_threshold_mismatch_refused(self, ray_session, tmp_path):
        root = str(tmp_path / "lsh")
        sd.minhash_pairs_epoch(
            ray.data.from_arrow(docs([1], ["a b c"])), root, threshold=0.5
        )
        with pytest.raises(ValueError, match="threshold"):
            sd.minhash_pairs_epoch(
                ray.data.from_arrow(docs([2], ["a b d"])), root, threshold=0.4
            )


class TestIncrementalEmbeddingDedup:
    DIM = 16

    def _vecs(self, seed=11, n_base=60, n_dup=8):
        rng = np.random.default_rng(seed)
        base = rng.standard_normal((n_base, self.DIM))
        vecs = np.vstack([base,
                          base[:n_dup] + rng.standard_normal(
                              (n_dup, self.DIM)) * 0.02])
        return vecs, np.arange(len(vecs), dtype=np.int64)

    def _tbl(self, vecs, ids, mask):
        sub = vecs[mask]
        return pa.table({
            "vec_id": pa.array(ids[mask]),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(sub.reshape(-1)), self.DIM),
        })

    def _batch_pairs(self, vecs, ids, threshold=0.8):
        from kafka_connect_jdbc_flatten_ray.stages.dedup import (
            dedup_embedding_pairs,
        )

        full = ray.data.from_arrow(
            self._tbl(vecs, ids, np.ones(len(ids), bool)))
        return dedup_embedding_pairs(full, self.DIM, threshold=threshold) \
            .to_pandas().sort_values(["vec_a", "vec_b"]) \
            .reset_index(drop=True)

    def test_shuffled_epochs_and_redelivery_equal_batch(
        self, ray_session, tmp_path
    ):
        vecs, ids = self._vecs()
        root = str(tmp_path / "emb")
        for p in (2, 0, 1, 0):  # out of order + epoch 0 re-delivered
            sd.embedding_pairs_epoch(
                ray.data.from_arrow(self._tbl(vecs, ids, ids % 3 == p)),
                root, self.DIM, threshold=0.8)
        inc = sd.read_embedding_pairs(root).to_pandas() \
            .sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
        batch = self._batch_pairs(vecs, ids)
        assert batch.equals(inc)
        assert list(inc.dtypes.astype(str)) == ["int64", "int64", "float64"]

    def test_smaller_vec_id_reanchors_star(self, ray_session, tmp_path):
        """A later-arriving smaller vec_id must become the star anchor of
        its bucket, exactly as batch would have made it."""
        vecs, _ = self._vecs(seed=12, n_base=20, n_dup=6)
        ids = np.arange(10, 10 + len(vecs), dtype=np.int64)
        ids[0] = 1  # the future anchor: a LOW id folded LAST
        root = str(tmp_path / "emb")
        late = np.zeros(len(ids), bool)
        late[0] = True
        sd.embedding_pairs_epoch(
            ray.data.from_arrow(self._tbl(vecs, ids, ~late)),
            root, self.DIM, threshold=0.8)
        sd.embedding_pairs_epoch(
            ray.data.from_arrow(self._tbl(vecs, ids, late)),
            root, self.DIM, threshold=0.8)
        inc = sd.read_embedding_pairs(root).to_pandas() \
            .sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
        batch = self._batch_pairs(vecs, ids)
        assert batch.equals(inc)

    def test_param_mismatch_refused(self, ray_session, tmp_path):
        vecs, ids = self._vecs(n_base=10, n_dup=0)
        root = str(tmp_path / "emb")
        ds = ray.data.from_arrow(self._tbl(vecs, ids, ids % 2 == 0))
        sd.embedding_pairs_epoch(ds, root, self.DIM, threshold=0.8)
        with pytest.raises(ValueError, match="threshold"):
            sd.embedding_pairs_epoch(ds, root, self.DIM, threshold=0.5)
        with pytest.raises(ValueError, match="num_planes"):
            sd.embedding_pairs_epoch(ds, root, self.DIM, threshold=0.8,
                                     num_planes=6)

    def test_manifest_lineage(self, ray_session, tmp_path):
        vecs, ids = self._vecs(n_base=12, n_dup=2)
        root = str(tmp_path / "emb")
        r0 = sd.embedding_pairs_epoch(
            ray.data.from_arrow(self._tbl(vecs, ids, ids % 2 == 0)),
            root, self.DIM, threshold=0.8)
        r1 = sd.embedding_pairs_epoch(
            ray.data.from_arrow(self._tbl(vecs, ids, ids % 2 == 1)),
            root, self.DIM, threshold=0.8)
        assert (r0["epoch"], r1["epoch"]) == (0, 1)
        assert r1["members"] >= r0["members"]


class TestIncrementalIVFIndex:
    DIM = 16

    def _emb(self, n=100, seed=3):
        rng = np.random.default_rng(seed)
        vecs = rng.standard_normal((n, self.DIM))
        ids = np.arange(n, dtype=np.int64)
        return vecs, ids

    def _tbl(self, vecs, ids, mask):
        sub = vecs[mask]
        return pa.table({
            "vec_id": pa.array(ids[mask]),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(sub.reshape(-1).astype(np.float64)), self.DIM),
        })

    def _cents(self, vecs):
        from kafka_connect_jdbc_flatten_ray.stages.ann import _unit

        return _unit(vecs[:8].astype(np.float32).astype(np.float64))

    def test_shuffled_epochs_and_redelivery_match_single_fold(
        self, ray_session, tmp_path
    ):
        from kafka_connect_jdbc_flatten_ray.stages import streaming_ann as sa
        from kafka_connect_jdbc_flatten_ray.stages.ann import _unit

        vecs, ids = self._emb()
        cents = self._cents(vecs)
        roots = []
        for name, order in (("a", [(0, 1, 2), None]),
                            ("b", [(2, 0, 1, 0), None])):
            root = str(tmp_path / name)
            for p in order[0]:
                sa.ivf_index_epoch(
                    ray.data.from_arrow(self._tbl(vecs, ids, ids % 3 == p)),
                    root, cents if len(roots) == 0 or p == order[0][0] else None)
            roots.append(root)
        q_ids = ids[:4]
        q_mat = _unit(vecs[:4].astype(np.float32))
        outs = [
            sa.probe_topk(r, q_ids, q_mat, k=3, nprobe=3).to_pandas()
            .sort_values(["query_id", "rank"]).reset_index(drop=True)
            for r in roots
        ]
        assert outs[0].equals(outs[1])
        assert len(outs[0]) == 4 * 3

    def test_centroid_mismatch_refused(self, ray_session, tmp_path):
        from kafka_connect_jdbc_flatten_ray.stages import streaming_ann as sa

        vecs, ids = self._emb(30)
        root = str(tmp_path / "ivf")
        sa.ivf_index_epoch(
            ray.data.from_arrow(self._tbl(vecs, ids, ids % 2 == 0)),
            root, self._cents(vecs))
        other = self._cents(vecs[5:])
        with pytest.raises(ValueError, match="centroids"):
            sa.ivf_index_epoch(
                ray.data.from_arrow(self._tbl(vecs, ids, ids % 2 == 1)),
                root, other)
        with pytest.raises(ValueError, match="required"):
            sa.ivf_index_epoch(
                ray.data.from_arrow(self._tbl(vecs, ids, ids % 2 == 1)),
                str(tmp_path / "fresh"), None)

    def test_probe_reads_only_probed_buckets(self, ray_session, tmp_path):
        from kafka_connect_jdbc_flatten_ray.stages import streaming_ann as sa
        from kafka_connect_jdbc_flatten_ray.stages.ann import _unit
        from kafka_connect_jdbc_flatten_ray.state.manifest import TableManifest

        vecs, ids = self._emb(80)
        cents = self._cents(vecs)
        root = str(tmp_path / "ivf")
        sa.ivf_index_epoch(
            ray.data.from_arrow(self._tbl(vecs, ids, np.ones(len(ids), bool))),
            root, cents)
        files = TableManifest(root, sa.STATE_TABLE).current_files()
        assert len(files) >= 4  # postings spread over several centroids
        q_mat = _unit(vecs[:2].astype(np.float32))
        out = sa.probe_topk(root, ids[:2], q_mat, k=3, nprobe=1).to_pandas()
        # nprobe=1: each query's hits all come from ONE centroid's postings
        probe = (q_mat @ cents.T).argmax(axis=1)
        assign = (_unit(vecs.astype(np.float32)) @ cents.T).argmax(axis=1)
        for qi, q in enumerate(ids[:2]):
            hit_ids = out[out.query_id == q].vec_id.to_numpy()
            assert set(assign[hit_ids]) == {probe[qi]}


class TestStreamingDupSpans:
    def _tbl(self, seed=16, n=40):
        import numpy as np

        rng = np.random.default_rng(seed)
        words = [f"w{i}" for i in range(8)]
        return pa.table({
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array([" ".join(rng.choice(words, 10))
                              for _ in range(n)]),
        })

    def _batch(self, tbl):
        from kafka_connect_jdbc_flatten_ray.stages.dedup import (
            duplicated_spans,
        )

        return duplicated_spans(ray.data.from_arrow(tbl), width=4) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)

    def test_any_order_folds_equal_batch(self, ray_session, tmp_path):
        import numpy as np  # noqa: F401
        import kafka_connect_jdbc_flatten_ray.stages.streaming_dedup as sd

        tbl = self._tbl()
        ids = tbl.column("doc_id").to_numpy()
        batch = self._batch(tbl)
        for name, order in (("a", (0, 1, 2)), ("b", (1, 2, 0))):
            root = str(tmp_path / f"sp_{name}")
            for p in order:
                sd.span_counts_epoch(
                    ray.data.from_arrow(tbl.filter(pa.array(ids % 3 == p))),
                    root, width=4)
            inc = sd.dup_spans_from_state(ray.data.from_arrow(tbl), root) \
                .to_pandas().sort_values("doc_id").reset_index(drop=True)
            assert inc.equals(batch), name

    def test_width_mismatch_refused(self, ray_session, tmp_path):
        import pytest
        import kafka_connect_jdbc_flatten_ray.stages.streaming_dedup as sd

        root = str(tmp_path / "sp")
        sd.span_counts_epoch(ray.data.from_arrow(self._tbl()), root, width=4)
        with pytest.raises(ValueError, match="width"):
            sd.span_counts_epoch(ray.data.from_arrow(self._tbl()), root,
                                 width=5)

    def test_reshard_then_fold_equal_batch(self, ray_session, tmp_path):
        import kafka_connect_jdbc_flatten_ray.stages.streaming_dedup as sd

        tbl = self._tbl(seed=17)
        ids = tbl.column("doc_id").to_numpy()
        root = str(tmp_path / "sp")
        sd.span_counts_epoch(
            ray.data.from_arrow(tbl.filter(pa.array(ids % 2 == 0))), root,
            width=4, num_buckets=4)
        r = sd.reshard_span_state(root, 16)
        assert r["num_buckets"] == 16
        sd.span_counts_epoch(
            ray.data.from_arrow(tbl.filter(pa.array(ids % 2 == 1))), root,
            width=4)
        inc = sd.dup_spans_from_state(ray.data.from_arrow(tbl), root) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert inc.equals(self._batch(tbl))

    def test_unfolded_window_fails_loudly(self, ray_session, tmp_path):
        import pytest
        import kafka_connect_jdbc_flatten_ray.stages.streaming_dedup as sd

        root = str(tmp_path / "sp")
        sd.span_counts_epoch(ray.data.from_arrow(self._tbl()), root, width=4)
        rogue = pa.table({
            "doc_id": pa.array([999], pa.int64()),
            "text": pa.array(["zz qq rr ss tt uu"]),
        })
        with pytest.raises(Exception, match="not in the folded span"):
            sd.dup_spans_from_state(ray.data.from_arrow(rogue), root) \
                .to_pandas()
