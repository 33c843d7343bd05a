"""Approximate-nearest-neighbor search over the ``embeddings`` table.

- Brute-force cosine top-k: the query matrix is broadcast once (ray.put)
  and each batch computes a numpy matmul against it, emitting only its
  LOCAL top-k rows per query (a combiner) — the global reduce then sees
  #batches * k rows per query instead of the whole table. This is the
  baseline and the scale path for modest query counts.
- IVF-style variant: vectors are bucketed by nearest of C coarse centroids
  (deterministic seeded sample); queries probe only their nearest buckets.
"""

from __future__ import annotations

import numpy as np

import pyarrow as pa
import ray
import ray.data

from kafka_connect_jdbc_flatten_ray.util import default_pool, fsl_to_numpy, read_parquet_clean


def _mat(emb_col) -> np.ndarray:
    return fsl_to_numpy(emb_col, np.float32)


def _unit(m: np.ndarray) -> np.ndarray:
    # float64 throughout: keeps the cosine values oracle-comparable
    # (DuckDB list_cosine_similarity over DOUBLE[]) after 6-decimal rounding
    m = m.astype(np.float64)
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


class BruteForceTopK:
    """map_batches callable: per-batch partial top-k against the broadcast
    query matrix (queries fetched from the object store once per actor)."""

    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref) if not isinstance(queries_ref, tuple) else queries_ref
        self.q_ids, self.q_mat = q  # (ids, unit matrix [Q, dim])
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        m = _unit(_mat(batch.column("embedding")))
        sims = self.q_mat @ m.T  # [Q, B]
        q_ids = np.asarray(self.q_ids, np.int64)
        nq, nb = sims.shape
        # one argpartition over the whole [Q, B] matrix + a vectorized
        # self-exclusion mask — no per-query / per-hit Python loops, so the
        # stage cost is the matmul even at thousands of queries
        k = min(self.k + 1, nb)
        top = np.argpartition(-sims, k - 1, axis=1)[:, :k]  # [Q, k]
        rows = np.repeat(np.arange(nq), k)
        cols = top.reshape(-1)
        keep = ids[cols] != q_ids[rows]
        return pa.table(
            {
                "query_id": pa.array(q_ids[rows][keep]),
                "vec_id": pa.array(ids[cols][keep].astype(np.int64)),
                "cos": pa.array(sims[rows, cols][keep].astype(np.float64)),
            }
        )


def _global_topk(k: int):
    """Arrow-native per-query top-k: round, sort_indices, slice — no
    pandas hop in the reduce (the partials are already tiny, but the
    conversion cost and schema churn are pure waste)."""
    import pyarrow.compute as pc

    def fn(g: pa.Table) -> pa.Table:
        t = pa.table({
            "query_id": g.column("query_id"),
            "vec_id": g.column("vec_id"),
            "cos": pc.round(g.column("cos"), ndigits=6),
        })
        idx = pc.sort_indices(
            t, sort_keys=[("cos", "descending"), ("vec_id", "ascending")]
        )[:k]
        t = t.take(idx)
        return pa.table({
            "query_id": t.column("query_id"),
            "rank": pa.array(np.arange(1, t.num_rows + 1, dtype=np.int64)),
            "vec_id": t.column("vec_id"),
            "cos": t.column("cos"),
        })

    fn.__name__ = "global_topk"
    return fn


def load_queries(sf_dir: str, num_queries: int):
    """Deterministic query set: the first ``num_queries`` vec_ids.

    The predicate is pushed into the Parquet scan (pyarrow.dataset filter
    -> row-group stats pruning), so the driver materializes only the row
    groups containing the query ids — never the whole table."""
    import pyarrow.dataset as pds

    dset = pds.dataset(f"{sf_dir}/embeddings.parquet")
    t = dset.to_table(
        columns=["vec_id", "embedding"],
        filter=pds.field("vec_id") < num_queries,
    )
    t = t.sort_by("vec_id")
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    mat = _unit(_mat(t.column("embedding")).astype(np.float32))
    return ids, mat


def ann_topk(
    sf_dir: str, k: int = 5, num_queries: int = 8
) -> ray.data.Dataset:
    """Brute-force cosine top-k (rank, vec_id, rounded cos) per query."""
    q = load_queries(sf_dir, num_queries)
    qref = ray.put(q)
    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    partial = ds.map_batches(
        BruteForceTopK,
        fn_constructor_args=(qref, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=default_pool(),
    )
    return partial.groupby("query_id").map_groups(
        _global_topk(k), batch_format="pyarrow")


class IVFAssign:
    """Assign each vector to its nearest coarse centroid (bucket)."""

    def __init__(self, centroids_ref):
        self.centroids = (
            ray.get(centroids_ref) if not isinstance(centroids_ref, np.ndarray)
            else centroids_ref
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _unit(_mat(batch.column("embedding")))
        sims = m @ self.centroids.T
        return batch.append_column(
            "ivf_bucket", pa.array(sims.argmax(axis=1).astype(np.int32))
        )


#: bounded centroid-sample size: `vec_id < SAMPLE_CAP` is pushed into the
#: Parquet scan (row-group pruning), so the driver reads only the row
#: groups containing those ids — never the whole table
SAMPLE_CAP = 1024


def ivf_centroids(sf_dir: str, num_centroids: int = 16) -> np.ndarray:
    """Deterministic coarse centroids from a BOUNDED sample: the vectors
    with ``vec_id < SAMPLE_CAP`` (predicate pushdown -> row-group stats
    pruning; at 100 TB this reads a handful of row groups, never the
    table), sorted by vec_id, every (n // C)-th taken, normalized. The
    sample rule is expressible in SQL, which is what makes the IVF search
    exactly oracle-checkable (pipelines/dedup_oracles.ivf_topk_sql).
    Centroid quality only affects recall (probing more buckets
    compensates); the scale path would k-means a reservoir sample instead
    (ivf_centroids_trained), with the same read-bound contract."""
    import pyarrow.dataset as pds

    dset = pds.dataset(f"{sf_dir}/embeddings.parquet")
    t = dset.to_table(
        columns=["vec_id", "embedding"],
        filter=pds.field("vec_id") < SAMPLE_CAP,
    ).sort_by("vec_id")
    m = _unit(_mat(t.column("embedding")))
    step = max(1, len(m) // num_centroids)
    return m[::step][:num_centroids]


def ivf_centroids_trained(
    sf_dir: str, num_centroids: int = 16, iters: int = 4
) -> np.ndarray:
    """IVF coarse centroids TRAINED with the distributed k-means
    (stages/kmeans.py: broadcast centroids + per-batch partial-sum
    combiner), seeded from the bounded row-group sample."""
    from kafka_connect_jdbc_flatten_ray.stages.kmeans import kmeans_fit

    init = ivf_centroids(sf_dir, num_centroids)
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    cents, _ = kmeans_fit(ds, init.shape[1], num_centroids, iters=iters, init=init)
    return cents


def ann_topk_ivf(
    sf_dir: str, k: int = 5, num_queries: int = 8, num_centroids: int = 16,
    nprobe: int = 4, train: bool = False,
) -> ray.data.Dataset:
    """IVF-bucketed ANN: search only the nprobe buckets nearest each query.
    Approximate — recall measured against the brute-force baseline in tests.
    ``train=True`` fits the coarse centroids with distributed k-means."""
    cents = (
        ivf_centroids_trained(sf_dir, num_centroids)
        if train else ivf_centroids(sf_dir, num_centroids)
    )
    q_ids, q_mat = load_queries(sf_dir, num_queries)
    # stable sort: centroid-id ascending on similarity ties, matching the
    # SQL oracle's (sim DESC, cid ASC) ordering deterministically
    probe = np.argsort(-(q_mat @ cents.T), axis=1, kind="stable")[:, :nprobe]
    cref = ray.put(cents)
    # queries grouped by the buckets they probe
    bucket_to_q: dict[int, list[int]] = {}
    for qi in range(len(q_ids)):
        for b in probe[qi]:
            bucket_to_q.setdefault(int(b), []).append(qi)
    qref = ray.put((q_ids, q_mat, bucket_to_q))

    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    assigned = ds.map_batches(
        IVFAssign, fn_constructor_args=(cref,),
        batch_format="pyarrow", zero_copy_batch=True, concurrency=default_pool(),
    )

    class ProbeTopK:
        def __init__(self):
            self.q_ids, self.q_mat, self.b2q = ray.get(qref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            buckets = batch.column("ivf_bucket").to_numpy(zero_copy_only=False)
            m = _unit(_mat(batch.column("embedding")))
            q_all = np.asarray(self.q_ids, np.int64)
            out_q, out_v, out_c = [], [], []
            # loop over DISTINCT probed buckets only; inside each, one
            # argpartition over the [nq, nb] block + a vectorized
            # self-exclusion mask (no per-query / per-hit Python loops)
            for b in np.unique(buckets):
                qis = self.b2q.get(int(b))
                if not qis:
                    continue
                sel = buckets == b
                sub_ids, sub = ids[sel], m[sel]
                sims = self.q_mat[qis] @ sub.T  # [nq, nb]
                nq, nb = sims.shape
                kk = min(self.k + 1, nb)
                top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
                rows = np.repeat(np.arange(nq), kk)
                cols = top.reshape(-1)
                qarr = q_all[np.asarray(qis)]
                keep = sub_ids[cols] != qarr[rows]
                out_q.append(qarr[rows][keep])
                out_v.append(sub_ids[cols][keep].astype(np.int64))
                out_c.append(sims[rows, cols][keep].astype(np.float64))
            if not out_q:
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "vec_id": pa.array([], pa.int64()),
                        "cos": pa.array([], pa.float64()),
                    }
                )
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q)),
                    "vec_id": pa.array(np.concatenate(out_v)),
                    "cos": pa.array(np.concatenate(out_c)),
                }
            )

    partial = assigned.map_batches(
        ProbeTopK, batch_format="pyarrow", zero_copy_batch=True, concurrency=default_pool()
    )
    return partial.groupby("query_id").map_groups(
        _global_topk(k), batch_format="pyarrow")
