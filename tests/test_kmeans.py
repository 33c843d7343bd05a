"""Distributed k-means tests: convergence on separable clusters, combiner
row bound, and IVF integration."""

import numpy as np
import pyarrow as pa
import ray.data

from kafka_connect_jdbc_flatten_ray.stages.kmeans import kmeans_fit


def _clustered_ds(n_per=200, k=4, dim=16, seed=5):
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((k, dim)) * 3
    pts = np.vstack([c + 0.1 * rng.standard_normal((n_per, dim)) for c in centers])
    return ray.data.from_arrow(pa.table({
        "vec_id": list(range(len(pts))),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(pts.reshape(-1).astype(np.float32)), dim
        ).cast(pa.list_(pa.float32())),
    })), centers


class TestKMeans:
    def test_converges_and_separates(self, ray_session):
        ds, centers = _clustered_ds()
        cents, hist = kmeans_fit(ds, dim=16, k=4, iters=6)
        # mean assigned cosine similarity improves and ends high
        assert hist[-1] > 0.98
        assert hist[-1] >= hist[0] - 1e-9
        # each true center maps to a distinct learned centroid
        tru = centers / np.linalg.norm(centers, axis=1, keepdims=True)
        assign = (tru @ cents.T).argmax(axis=1)
        assert len(set(assign.tolist())) == 4

    def test_partials_are_model_sized(self, ray_session):
        """The driver reduce sees at most k rows per batch — vectors never
        reach the driver."""
        import ray as _ray

        from kafka_connect_jdbc_flatten_ray.stages.kmeans import _AssignPartial

        ds, _ = _clustered_ds(n_per=100)
        cents = np.eye(4, 16)
        out = _AssignPartial(_ray.put(cents))(
            ds.take_batch(400, batch_format="pyarrow")
        )
        assert out.num_rows <= 4
        assert set(out.column_names) == {"cid", "count", "vsum", "sim_sum"}


class TestGroupMeanEmbeddings:
    def test_matches_numpy_reference(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from kafka_connect_jdbc_flatten_ray.stages.kmeans import (
            group_mean_embeddings,
        )

        rng = np.random.default_rng(9)
        dim, n = 8, 200
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        labels = rng.integers(0, 5, n).astype(np.int32)
        tbl = pa.table({
            "label": pa.array(labels),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1)), dim),
        })
        got = group_mean_embeddings(ray.data.from_arrow(tbl)).to_pandas() \
            .sort_values(["label", "dim"]).reset_index(drop=True)
        for lbl in np.unique(labels):
            expect = np.round(
                vecs[labels == lbl].astype(np.float64).mean(axis=0), 6)
            sub = got[got.label == lbl].sort_values("dim")
            assert np.array_equal(sub.mean_val.to_numpy(), expect)
        assert len(got) == 5 * dim
