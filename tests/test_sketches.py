"""HLL sketch tests: accuracy vs exact distinct, mergeability."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from kafka_connect_jdbc_flatten_ray.stages.sketches import (
    M,
    approx_distinct,
    hll_add,
    hll_estimate,
)


class TestHLL:
    def test_accuracy_direct(self):
        rng = np.random.RandomState(3)
        for n in (100, 5000, 200_000):
            vals = rng.randint(0, 1 << 62, n * 2) % (1 << 62)
            uniq = np.unique(vals)
            h = pd.util.hash_pandas_object(pd.Series(uniq), index=False).to_numpy()
            regs = np.zeros(M, np.uint8)
            hll_add(regs, h)
            est = hll_estimate(regs)
            assert abs(est - len(uniq)) / len(uniq) < 0.05, (n, est, len(uniq))

    def test_merge_equals_union(self):
        rng = np.random.RandomState(4)
        a = rng.randint(0, 1 << 60, 10_000)
        b = rng.randint(0, 1 << 60, 10_000)
        ra, rb, rab = np.zeros(M, np.uint8), np.zeros(M, np.uint8), np.zeros(M, np.uint8)
        ha = pd.util.hash_pandas_object(pd.Series(a), index=False).to_numpy()
        hb = pd.util.hash_pandas_object(pd.Series(b), index=False).to_numpy()
        hll_add(ra, ha)
        hll_add(rb, hb)
        hll_add(rab, np.concatenate([ha, hb]))
        assert np.array_equal(np.maximum(ra, rb), rab)

    def test_dataset_pipeline(self, ray_session, sf_dir):
        ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
        exact = len(set(r["user_id"] for r in ds.take_all()))
        est = approx_distinct(
            ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"]),
            "user_id",
        )["approx_distinct"][0]
        assert abs(est - exact) / exact < 0.05


class TestMinhashKeep:
    def test_exact_dups_collapse(self, ray_session):
        from kafka_connect_jdbc_flatten_ray.stages import dedup

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        texts = [base, base, "unrelated words entirely different content here", base]
        docs = ray.data.from_arrow(
            pa.table({"doc_id": [0, 1, 2, 3], "text": texts})
        )
        kept = sorted(
            r["doc_id"] for r in dedup.dedup_minhash_keep(docs, 0.95).take_all()
        )
        assert kept == [0, 2]

    def test_cluster_assignment(self, ray_session):
        from kafka_connect_jdbc_flatten_ray.stages import dedup

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        texts = [base, base, "unrelated words entirely different content here", base]
        docs = ray.data.from_arrow(
            pa.table({"doc_id": [0, 1, 2, 3], "text": texts})
        )
        got = {r["doc_id"]: r["cluster_id"]
               for r in dedup.dedup_minhash_clusters(docs, 0.9).take_all()}
        assert got == {0: 0, 1: 0, 2: 2, 3: 0}


class TestConnectedComponents:
    def test_chain_converges_multiround(self, ray_session):
        """A 5-node path graph needs several propagation rounds — exercises
        the iterative join/groupby fixpoint, not just the init step."""
        from kafka_connect_jdbc_flatten_ray.stages.dedup import (
            connected_component_labels,
        )

        pairs = ray.data.from_arrow(
            pa.table({"doc_a": [10, 11, 12, 13, 50], "doc_b": [11, 12, 13, 14, 51]})
        )
        labels = connected_component_labels(pairs, num_partitions=4)
        got = {r["node"]: r["lab"] for r in labels.take_all()}
        assert got == {10: 10, 11: 10, 12: 10, 13: 10, 14: 10, 50: 50, 51: 50}

    def test_empty_pairs(self, ray_session):
        from kafka_connect_jdbc_flatten_ray.stages.dedup import (
            connected_component_labels,
        )

        pairs = ray.data.from_arrow(
            pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
        )
        assert connected_component_labels(pairs) is None

    def test_no_driver_materialization(self, ray_session, monkeypatch):
        """Clusters and keep-set must never collect data-dependent row sets
        on the driver: Dataset.take_all / take / to_pandas are poisoned for
        the duration of the computation (the driver sees only scalar
        convergence sums)."""
        from kafka_connect_jdbc_flatten_ray.stages import dedup

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        texts = [base, base, "unrelated words entirely different content here", base]
        docs = ray.data.from_arrow(pa.table({"doc_id": [0, 1, 2, 3], "text": texts}))

        def _boom(self, *a, **k):
            raise AssertionError("driver-side materialization inside dedup op")

        # (Dataset.sum legitimately take(1)s its single aggregate row, so
        # only row-set collection APIs are poisoned)
        monkeypatch.setattr(ray.data.Dataset, "take_all", _boom)
        monkeypatch.setattr(ray.data.Dataset, "to_pandas", _boom)
        clusters = dedup.dedup_minhash_clusters(docs, 0.9).materialize()
        kept = dedup.dedup_minhash_keep(docs, 0.95).materialize()
        monkeypatch.undo()
        got = {r["doc_id"]: r["cluster_id"] for r in clusters.take_all()}
        assert got == {0: 0, 1: 0, 2: 2, 3: 0}
        assert sorted(r["doc_id"] for r in kept.take_all()) == [0, 2]


class TestIncrementalHLL:
    def test_three_epochs_equal_batch(self, ray_session, tmp_path):
        from kafka_connect_jdbc_flatten_ray.stages import sketches

        rng = np.random.RandomState(3)
        vals = rng.randint(0, 5000, 20000).astype(np.int64)
        t = pa.table({"v": vals})
        root = str(tmp_path / "hll")
        for lo, hi in ((0, 7000), (7000, 14000), (14000, 20000)):
            r = sketches.hll_epoch(
                ray.data.from_arrow(t.slice(lo, hi - lo)), root, "v"
            )
        batch = sketches.approx_distinct(ray.data.from_arrow(t), "v")
        got = sketches.read_estimate(root)
        assert got["approx_distinct"].iloc[0] == batch["approx_distinct"].iloc[0]
        assert r["approx_distinct"] == got["approx_distinct"].iloc[0]

    def test_refold_is_idempotent(self, ray_session, tmp_path):
        from kafka_connect_jdbc_flatten_ray.stages import sketches

        t = pa.table({"v": pa.array(list(range(1000)), pa.int64())})
        root = str(tmp_path / "hll")
        sketches.hll_epoch(ray.data.from_arrow(t), root, "v")
        e1 = sketches.read_estimate(root)["approx_distinct"].iloc[0]
        r = sketches.hll_epoch(ray.data.from_arrow(t), root, "v")
        assert r["epoch"] == 1
        assert sketches.read_estimate(root)["approx_distinct"].iloc[0] == e1
